"""Dump .explain("formatted") for declared keys to plans/<round>/.

Usage: python tools/explain_key.py SUFFIX key1 [key2 ...]

Env: TREE (repo tree to import, default /root/repo), PLANS_ROUND
(output subdir under plans/, default r17).

Writes plans/<round>/<key>_<SUFFIX>.txt for each key (SUFFIX is "before" or
"after" per the optimization-round deliverable contract). Uses the same
session factory as bench.py so the plan matches what the bench times.
"""

from __future__ import annotations

import os
import sys

# tree must be on the path before the package imports below
sys.path.insert(0, os.environ.get("TREE", "/root/repo"))

from adk_noui_vectordb_spark.plans.explain import explain_str  # noqa: E402
from adk_noui_vectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "plans",
        os.environ.get("PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-key")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = explain_str(df)
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(
            f"{key}: {len(plan.splitlines())} lines, Exchange x{n_exchange}, "
            f"SMJ x{plan.count('SortMergeJoin')}, "
            f"BHJ x{plan.count('BroadcastHashJoin')}, "
            f"pyeval x{plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow')}"
            f" -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
