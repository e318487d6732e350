"""Facade end-to-end recall on the clustered fixture (VERDICT r10 #7).

The r10 recall rows cover the RAW RP/IVF/PQ/IVFPQ probes; the path a
reference migrant actually calls is ``Collection.query`` — RP-LSH
multiprobe candidates, exact rerank, then the ``where`` DSL POST-filter.
Post-filtering is the right order for LSH (buckets are metadata-blind),
but a selective filter thins the candidate set BELOW n_results by
construction, so recall vs filter selectivity is the curve a user needs
before trusting a filtered query. This sweep measures it: queries are
held-out points near the fixture's own centers (the realistic "query
looks like the corpus" regime), ground truth is the brute-force cosine
top-k among the rows that PASS the filter, and selectivity comes from a
``grp = vec_id % 10`` metadata column filtered with ``$in``.

Usage: python tools/collection_recall_sweep.py [n] [k_centers] [sigma]
Prints one markdown table row per (selectivity, multiprobe) cell.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from tools.make_clustered_embeddings import DIM, make  # noqa: E402


def run(n: int = 2000, k_centers: int = 20, sigma: float = 0.25) -> None:
    from adk_noui_vectordb_spark.api.collection import Collection

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    base = "/tmp/coll_recall_fixture"
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
    grp = np.arange(n) % 10

    root = os.path.join(base, "coll")
    coll = Collection(spark, root)
    rows = [
        (f"v{i:05d}", [float(x) for x in emb[i]], f"doc {i}", int(grp[i]))
        for i in range(n)
    ]
    coll.add(
        spark.createDataFrame(
            rows, "id string, embedding array<double>, document string, grp int"
        )
    )

    # held-out queries: one per center, same generator family as the
    # fixture (seed differs so no query equals a stored point)
    rng = np.random.RandomState(7)
    centers = np.random.RandomState(42).randn(k_centers, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    queries = centers + sigma * rng.randn(k_centers, DIM)

    nrm = np.linalg.norm(emb, axis=1)
    k = 10
    # arms: multiprobe 0/1 (the LSH path) and the graph strategy — the
    # graph's filter applies at EMISSION on a ~O(beam·degree·rounds)
    # visited pool, so selective filters thin it exactly like they thin
    # single-probe LSH candidates; this sweep quantifies that trade.
    print("| selectivity | arm | recall@10 | mean returned |")
    print("|---|---|---|---|")
    for m_groups in (10, 5, 2, 1):
        sel = m_groups / 10.0
        where = {"grp": {"$in": list(range(m_groups))}} if m_groups < 10 else None
        mask = grp < m_groups
        # "graph" pins expansion OFF (the blind emission-filtered walk);
        # "auto" is the r15 default — the facade's selectivity estimate
        # picks the walk (ACORN below 0.5, blind above)
        arms = ("probe0", "probe1", "graph", "auto", "acorn", "acorn_b16")
        for arm in arms:
            if arm.startswith(("acorn", "auto")) and where is None:
                continue  # predicate expansion needs a predicate
            hits = tot = 0
            n_cands = []
            for qi in range(k_centers):
                q = queries[qi]
                cos = (emb @ q) / (nrm * np.linalg.norm(q))
                cos_r = np.round(cos, 4)
                ids = np.arange(n)[mask]
                order = sorted(ids, key=lambda i: (-cos_r[i], f"v{i:05d}"))
                truth = {f"v{i:05d}" for i in order[:k]}
                if arm == "graph":
                    kwargs = {
                        "filter_strategy": "graph",
                        "graph_predicate_expansion": False,
                    }
                elif arm == "auto":
                    kwargs = {"filter_strategy": "graph"}
                elif arm.startswith("acorn"):
                    # the r13 ACORN opt-in (predicate steers the beam);
                    # _b16 is the raise-ef-for-filters budget variant
                    kwargs = {
                        "filter_strategy": "graph",
                        "graph_predicate_expansion": True,
                    }
                    if arm.endswith("b16"):
                        kwargs["graph_beam"] = 16
                else:
                    kwargs = {"multiprobe_hamming": int(arm[-1])}
                got = coll.query(
                    [float(x) for x in q],
                    n_results=k,
                    where=where,
                    **kwargs,
                ).collect()
                hits += len({r["id"] for r in got} & truth)
                tot += k
                n_cands.append(len(got))
            print(
                f"| {sel:.1f} | {arm} | {hits / tot:.2f} "
                f"| {np.mean(n_cands):.1f}/{k} returned |"
            )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    kc = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sg = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    run(n, kc, sg)
