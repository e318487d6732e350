"""Per-key Spark JOB counts for serving paths (VERDICT r16 next #3).

Usage: python tools/count_jobs.py SF_DIR key1 [key2 ...]

For each key: one WARM run (index builds + session memos populate —
the build-once/serve-many contract means steady-state serving is what
the pin protects), then a MEASURED run under a job group, printing
{"key": jobs}. Job counts are machine-independent (scheduler round
trips, not seconds), so a pin on them survives bench weather — the
point of the tool.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]

    from adk_noui_vectordb_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark()
    qs = e.queries()
    sc = spark.sparkContext
    out = {}
    for k in keys:
        qs[k](spark, sf_dir).collect()  # warm: builds + memos
        sc.setJobGroup(f"jobs-{k}", k)
        try:
            qs[k](spark, sf_dir).collect()
        finally:
            sc.setJobGroup(None, None)
        out[k] = len(sc.statusTracker().getJobIdsForGroup(f"jobs-{k}"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
