"""Recall-vs-latency sweep for the approximate ANN paths (BASELINE.md).

VERDICT r4 item 10: the isotropic-testdata caveat on IVF/PQ recall was
documented but only single-point-measured. This sweeps the tuning axes —
PQ (m subspaces x codebook size, rerank candidate depth), IVF nprobe,
LSH table count — against exact brute-force cosine top-k at a given SF,
printing one markdown table per family plus per-config steady-state
latency (best of 2 after warm-up), so BASELINE.md can carry curves
instead of points.

Usage: python tools/recall_sweep.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def exact_topk(spark, sf_dir, qid, k):
    from adk_noui_vectordb_spark.operators.knn import (
        knn_topk,
        make_query_from_vec,
    )
    from adk_noui_vectordb_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_topk(emb, make_query_from_vec(emb, qid), k=k)


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / max(1, len(exact_ids))


def timed(fn, runs=2):
    best = None
    out = None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return out, best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    k = 10

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.session import get_spark

    spark = get_spark(app_name="recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qids = list(range(n_queries))
    exact = {q: _ids(exact_topk(spark, sf_dir, q, k)) for q in qids}

    print(f"## ANN recall-vs-latency sweep @ {sf_dir}, k={k}, "
          f"{n_queries} queries (avg recall, best-of-2 latency of last query)")

    print("\n### PQ two-stage rerank: (m, codebook_k) x candidate depth")
    print("| m | k_codes | bits | candidates | recall@10 | latency s |")
    print("|---|---|---|---|---|---|")
    for m, ck in ((4, 8), (4, 16), (8, 16), (8, 64), (16, 256)):
        # build once per (m, ck) so serving latency is steady-state
        ann.build_pq_index(spark, sf_dir, m=m, k=ck, iters=2)
        for cand in (50, 100, 200):
            recs, lat = [], None
            for q in qids:
                ids, lat = timed(
                    lambda q=q: _ids(
                        ann.knn_pq_rerank(
                            spark, sf_dir, query_vec_id=q, k=k,
                            candidates=cand, m=m, codebook_k=ck,
                        )
                    )
                )
                recs.append(recall(ids, exact[q]))
            import math

            bits = m * int(math.log2(ck))
            print(
                f"| {m} | {ck} | {bits} | {cand} "
                f"| {sum(recs)/len(recs):.2f} | {lat:.2f} |",
                flush=True,
            )

    print("\n### IVF: nprobe sweep (10 partitions)")
    print("| nprobe | recall@10 | latency s |")
    print("|---|---|---|")
    for nprobe in (1, 2, 4, 8, 10):
        recs, lat = [], None
        for q in qids:
            ids, lat = timed(
                lambda q=q: _ids(
                    ann.ann_ivf_topk(spark, sf_dir, query_vec_id=q, k=k, nprobe=nprobe)
                )
            )
            recs.append(recall(ids, exact[q]))
        print(f"| {nprobe} | {sum(recs)/len(recs):.2f} | {lat:.2f} |", flush=True)

    print("\n### Residual IVFPQ: nprobe x candidates (10 cells, m=4, k=8)")
    print("| nprobe | candidates | recall@10 (exact-L2 baseline) | latency s |")
    print("|---|---|---|---|")
    from pyspark.sql import functions as FF
    from adk_noui_vectordb_spark.functions.vector import dot_product

    def exact_l2(qid):
        from adk_noui_vectordb_spark.sources.tables import load_table
        e = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", FF.col("embedding").cast("array<double>").alias("emb"))
        qv = e.filter(FF.col("vec_id") == qid).select(FF.col("emb").alias("qe"))
        d2 = (dot_product(FF.col("emb"), FF.col("emb"))
              - 2 * dot_product(FF.col("emb"), FF.col("qe"))
              + dot_product(FF.col("qe"), FF.col("qe")))
        return [r["vec_id"] for r in e.crossJoin(FF.broadcast(qv))
                .filter(FF.col("vec_id") != qid)
                .select("vec_id", d2.alias("d2"))
                .orderBy("d2", "vec_id").limit(k).collect()]

    exact_l2_ids = {q: exact_l2(q) for q in qids}
    for nprobe in (1, 2, 4):
        for cand in (50, 100):
            recs, lat = [], None
            for q in qids:
                ids, lat = timed(
                    lambda q=q: _ids(
                        ann.ann_ivfpq_topk(
                            spark, sf_dir, query_vec_id=q, topk=k,
                            nprobe=nprobe, candidates=cand, n_centroids=10,
                        )
                    )
                )
                recs.append(recall(ids, exact_l2_ids[q]))
            print(
                f"| {nprobe} | {cand} | {sum(recs)/len(recs):.2f} | {lat:.2f} |",
                flush=True,
            )

    print("\n### LSH: recall (8 tables, seed 42)")
    print("| tables | recall@10 | latency s |")
    print("|---|---|---|")
    recs, lat = [], None
    for q in qids:
        ids, lat = timed(
            lambda q=q: _ids(ann.ann_lsh_topk(spark, sf_dir, query_vec_id=q, k=k))
        )
        recs.append(recall(ids, exact[q]))
    print(f"| 8 | {sum(recs)/len(recs):.2f} | {lat:.2f} |", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
