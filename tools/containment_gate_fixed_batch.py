"""Fixed-batch scaling fit for the containment ingest gate (VERDICT r14
next #5): SCALE.md's earlier 0.69 exponent conflated batch growth with
corpus growth — the driver fixture's batch is corpus-proportional (every
doc_id % 10 == 0 document, twice). This tool holds the batch FIXED at
100 docs (50 re-keyed clones + 50 truncations of the first 50 corpus
docs — the fixture's two shape classes) and fits warm gate latency over
the third_decade corpora (500 / 5,000 / 50,000 docs), isolating the
corpus-side term: Σ df(prefix shingles) candidate volume plus the
partition-pruned probe overhead.

Usage: python tools/containment_gate_fixed_batch.py [--sizes 500,5000,50000]
-> a markdown row for SCALE.md on stdout.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.third_decade import SIZES, make_corpus  # noqa: E402

BATCH_DOCS = 100


def main() -> None:
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_containment_gate_for,
    )
    from adk_noui_vectordb_spark.session import get_spark
    from adk_noui_vectordb_spark.sources.tables import load_table

    sizes = SIZES
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(app_name="containment-fixed-batch")
    spark.sparkContext.setLogLevel("ERROR")

    pts = []
    for n in sizes:
        d = f"/tmp/third_decade_{n}"
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            shutil.rmtree(d, ignore_errors=True)
            make_corpus(d, n)
        docs = load_table(spark, d, "documents")
        # FIXED batch: 50 clones + 50 truncations of the first 50 docs —
        # independent of n, so the fit isolates the corpus-side cost
        first = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
        batch = first.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        ).unionByName(
            first.select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.array_join(
                    F.slice(F.split(F.col("text"), " "), 1, 12), " "
                ).alias("text"),
            )
        )
        dedup_containment_gate_for(spark, d, batch).count()  # build+warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            got = dedup_containment_gate_for(spark, d, batch).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        pts.append((n, best))
        print(
            f"# n={n}: warm best {best:.3f}s ({got} gate rows)",
            file=sys.stderr,
            flush=True,
        )
    lx = [math.log(n) for n, _ in pts]
    ly = [math.log(t) for _, t in pts]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    slope = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / sum(
        (x - mx) ** 2 for x in lx
    )
    series = " / ".join(f"{t:.2f}s" for _, t in pts)
    print(
        f"| `dedup_containment_gate_for` FIXED {BATCH_DOCS}-doc batch "
        f"| {series} over n={'/'.join(str(n) for n, _ in pts)} "
        f"| **{slope:.2f}** |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
