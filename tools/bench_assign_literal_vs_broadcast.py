"""Literal-vs-broadcast centroid assignment crossover (BASELINE.md, r7).

VERDICT r6 item 6: `_assign_broadcast` (operators/ann.py) is the
above-threshold twin of the literal-centroid argmin, gated at
CENTROID_LITERAL_MAX_KDIM = 100_000. Its equality with the literal path
is pinned at toy k in tests/test_ann.py; this tool demonstrates the
WALL-TIME story at representative k — that the Arrow argmin's cost
scales with k as designed (np.partition O(k) per row, one BLAS matmul)
while the literal path's SQL text / parse cost grows linearly in k*dim —
and locates the crossover the threshold encodes.

Method: a deterministic synthetic corpus (n rows, dim 64; values are
md5-derived so no RNG state is involved) is assigned once per (k, path)
with both kernels FORCED (bypassing the gate), timing the full
assignment action (count()) best-of-2 after a warm-up. Centroids are
the first k vectors (the _lloyd init).

Usage: python tools/bench_assign_literal_vs_broadcast.py [n_rows]
Prints one markdown table.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def synth_rows(n: int) -> list:
    """n deterministic dim-64 vectors: component j of row i is derived
    from md5(f"bv|{i}|{j}") -> uniform-ish in [-1, 1) at 1e-6 grain."""
    rows = []
    for i in range(n):
        h = hashlib.md5(f"bv|{i}".encode()).digest()
        seed = int.from_bytes(h[:8], "big")
        vec = []
        for j in range(DIM):
            x = (seed * (j + 1) + j * j) % 2_000_000
            vec.append(x / 1_000_000.0 - 1.0)
        rows.append((i, vec))
    return rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from pyspark.sql import SparkSession

    from adk_noui_vectordb_spark.operators import ann

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    e = spark.createDataFrame(
        synth_rows(n), "vec_id bigint, emb array<double>"
    ).repartition(32).localCheckpoint(eager=True)

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.functions.vector import dot_product

    def assign_literal(rows):
        cent_lit = ann._centroid_literal(rows)
        ee = dot_product(F.col("emb"), F.col("emb"))
        dists = F.transform(
            cent_lit,
            lambda s: F.struct(
                F.round(
                    ee - 2 * dot_product(F.col("emb"), s["c"]) + s["cc"]
                , 6).alias("d2"),
                s["cluster"].alias("cluster"),
            ),
        )
        return e.select("vec_id", F.array_min(dists)["cluster"].alias("cluster"))

    print(f"n_rows = {n}, dim = {DIM}, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    print("| k | k*dim | literal s | broadcast s | gate picks |")
    print("|---|---|---|---|---|")
    for k in (256, 512, 1024, 2048, 4096):
        cents = [
            {"cluster": i, "c": vec} for i, (vid, vec) in enumerate(synth_rows(k))
        ]
        paths = [("broadcast", lambda: ann._assign_broadcast(e, cents, False))]
        if k <= 2048:  # beyond this the literal SQL text alone is ~6 MB
            paths.insert(0, ("literal", lambda: assign_literal(cents)))
        times = {}
        for name, fn in paths:
            best = None
            for _ in range(2):  # first run is warm-up
                t0 = time.perf_counter()
                fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            times[name] = best
        gate = "literal" if k * DIM <= ann.CENTROID_LITERAL_MAX_KDIM else "broadcast"
        lit = f"{times['literal']:.2f}" if "literal" in times else "(skipped)"
        print(
            f"| {k} | {k * DIM} | {lit} "
            f"| {times['broadcast']:.2f} | {gate} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
