"""Same-session git-archive A/B of specific bench keys.

Usage: python tools/ab_key_bench.py TREE_DIR key1 [key2 ...]

Runs the tree's __spark_entry__ queries() for the named keys, best-of-3
at $SPARK_GRAFT_SF_DIR (default sf0.1), preceded by the bench.py
calibration control workload, and prints one JSON line. Run it once per
tree (old commit exported via `git archive`, and HEAD) in the same
session; compare per-key bests calibration-normalized. This is the r10
gate methodology (BASELINE.md r10-close row) as a reusable tool —
proving whether a cross-round per-key delta is code or session weather.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    keys = sys.argv[2:]
    os.chdir(tree)
    sys.path.insert(0, tree)

    from adk_noui_vectordb_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "spark_entry_ab", os.path.join(tree, "__spark_entry__.py")
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    import bench

    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    warm = spark.range(1000).withColumn("v", F.col("id") * 2)
    warm.join(F.broadcast(spark.range(10)), "id").count()
    cal = bench._calibration_run(spark)
    qs = em.queries()
    out = {"tree": tree, "calibration": round(cal, 3)}
    for k in keys:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[k] = round(best, 3)
        print(f"# {k}: {out[k]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
