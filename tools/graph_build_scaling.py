"""Graph BUILD wall-time scaling on corpora that trigger the hub-mesh
recursion (VERDICT r12 next #8 done-criterion: exponent ≤ 0.6 measured
on recursion-triggering builds).

tools/scaling_exponents.py measures SERVING keys against the driver
testdata, whose hub counts (8–40) never exceed the default all-pairs
gate. This tool measures the BUILD on synthetic clustered corpora big
enough that the recursion fires at every size (``hub_allpairs_max``
pinned low so c = ceil(n/128) > gate everywhere), fits the log-log
slope of cold build time vs n, and prints the level sizes so the run
itself witnesses the no-large-all-pairs invariant.

Every timed build runs against a FRESH corpus dir (content-addressed
roots would otherwise serve the previous build). The slope understates
the asymptote (fixed job-launch overhead flattens small points) — it is
a quadratic-behavior detector: the r12 all-pairs hub mesh would read
super-linear here as n grows c² = (n/128)² pairs.

Usage: python tools/graph_build_scaling.py [sizes...]  default 4000 8000 16000
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from tools.make_clustered_embeddings import make  # noqa: E402

GATE = 16  # recursion fires whenever c = ceil(n/128) > 16, i.e. n > 2048


def run(sizes=(4000, 8000, 16000)) -> None:
    from adk_noui_vectordb_spark.operators import graph_ann as ga

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pts = []
    print("| n | hub levels | cold build s |")
    print("|---|---|---|")
    for n in sizes:
        base = f"/tmp/graph_build_scale_{n}"
        shutil.rmtree(base, ignore_errors=True)
        make(base, n, max(10, n // 200), 0.1)
        t0 = time.perf_counter()
        cur = ga.build_graph_index(spark, base, hub_allpairs_max=GATE)
        dt = time.perf_counter() - t0
        levels = json.load(open(os.path.join(cur, "build_stats.json")))[
            "hub_mesh_levels"
        ]
        assert all(c > GATE for c in levels[:-1]) and levels[-1] <= GATE, levels
        pts.append((n, dt))
        print(f"| {n} | {levels} | {dt:.1f} |")
    xs = [math.log(n) for n, _ in pts]
    ys = [math.log(t) for _, t in pts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    print(f"\nbuild-time exponent: {slope:.2f}")


if __name__ == "__main__":
    sizes = tuple(int(a) for a in sys.argv[1:]) or (4000, 8000, 16000)
    run(sizes)
