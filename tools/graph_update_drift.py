"""Streamed-insert edge-quality drift for the navigable graph (VERDICT
r12 next #6).

``update_graph_index`` is append-only ADD under frozen coarse structure:
new vectors link to their same-cell top-``degree`` neighbors and every
new edge lands reversed (capped), but EXISTING nodes never re-select
their stored adjacency and the hub mesh never re-forms. So a graph that
grew by streaming differs from a fresh build over the same corpus in
two measurable ways — stale neighbor lists (an old node's true top-8
may now include streamed vectors it only reaches via capped reversals)
and stale hubs (md5-min membership changes as cells grow). hnswlib has
the same asymmetry (insert-time neighbor selection is greedy and never
revisited); its remedy and ours is a periodic rebuild.

This tool measures the actual recall cost: start the index at half the
clustered fixture, stream the rest in equal batches, and at checkpoints
serve the SAME held-out-style queries (stored ids, one per cluster) from
(a) the streamed index and (b) a fresh build over the identical current
corpus, scoring both against exact 4-dp cosine over that corpus. The
printed curve is the rebuild-cadence evidence recorded in BASELINE.md.

Usage: python tools/graph_update_drift.py [n] [k_centers] [sigma] [batches]
       defaults: 1200 10 0.06 8  (the tight fixture regime — the one the
       graph family's recall gates are pinned on)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from tools.make_clustered_embeddings import make  # noqa: E402


def _write_corpus(out_dir: str, ids: np.ndarray, emb: np.ndarray) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in emb],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(len(ids), dtype=np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def _recall(spark, sf_dir, qids, emb_by_id, k=10) -> float:
    from adk_noui_vectordb_spark.operators import graph_ann as ga

    ids = sorted(emb_by_id)  # contiguous 0..m-1 by construction
    mat = np.array([emb_by_id[i] for i in ids], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    hits = tot = 0
    for qid in qids:
        q = np.array(emb_by_id[qid])
        cos = (mat @ q) / (nrm * np.linalg.norm(q))
        truth = set(
            sorted(
                (i for i in ids if i != qid),
                key=lambda i: (-round(float(cos[i]), 4), i),
            )[:k]
        )
        got = {
            r["vec_id"]
            for r in ga.ann_graph_topk(spark, sf_dir, query_vec_id=qid, k=k).collect()
        }
        hits += len(got & truth)
        tot += k
    return hits / tot


def run(n: int = 1200, k_centers: int = 10, sigma: float = 0.06, batches: int = 8):
    from pyspark.sql import functions as F  # noqa: F401

    from adk_noui_vectordb_spark.operators import graph_ann as ga

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/graph_drift_fixture"
    shutil.rmtree(base, ignore_errors=True)
    make(base, n, k_centers, sigma)
    emb = np.array(
        spark.read.parquet(os.path.join(base, "embeddings.parquet"))
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    half = n // 2
    streamed = os.path.join(base, "streamed")
    _write_corpus(streamed, np.arange(half), emb[:half])
    ga.build_graph_index(spark, streamed)
    # queries: one stored id per cluster from the INITIAL half (their
    # neighbor lists are the ones that go stale as the stream arrives)
    qids = [i for i in range(k_centers)]
    step = (n - half) // batches
    print("| streamed fraction | streamed-index recall@10 | fresh-build recall@10 |")
    print("|---|---|---|")
    for b in range(1, batches + 1):
        lo, hi = half + (b - 1) * step, half + b * step
        batch_df = spark.createDataFrame(
            [
                (int(i), [float(x) for x in emb[i]])
                for i in range(lo, hi)
            ],
            "vec_id bigint, emb array<double>",
        )
        ga.update_graph_index(spark, streamed, batch_df)
        if b not in (1, batches // 2, batches):
            continue
        emb_by_id = {i: emb[i] for i in range(hi)}
        r_stream = _recall(spark, streamed, qids, emb_by_id)
        fresh = os.path.join(base, f"fresh_{b}")
        _write_corpus(fresh, np.arange(hi), emb[:hi])
        r_fresh = _recall(spark, fresh, qids, emb_by_id)
        frac = (hi - half) / hi
        print(f"| {frac:.2f} | {r_stream:.2f} | {r_fresh:.2f} |")


if __name__ == "__main__":
    args = [int(a) if a.isdigit() else float(a) for a in sys.argv[1:]]
    run(*args)
