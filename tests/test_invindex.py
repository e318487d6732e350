"""Inverted-index serving lifecycle (operators/invindex.py).

The lexical twin of the rp/ivf serving tests: build-once/serve-many,
derived-constant parity between the Spark bucket expression and the
client-side Python helper, and ranking equality with the scan-time BM25.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators import hybrid, invindex


def test_term_bucket_expr_matches_python(spark):
    """The build writes tbucket with the Spark expression; the probe
    computes buckets client-side in Python — the two md5 derivations
    must agree on every term or pruning silently drops postings."""
    terms = ["join", "scan", "window", "the", "", "naïve-ütf", "x" * 50]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", invindex.term_bucket_expr(F.col("term")).alias("b")
    )
    got = {r["term"]: r["b"] for r in df.collect()}
    for t in terms:
        assert got[t] == invindex.term_bucket_py(t), t


def test_served_bm25_equals_scan_bm25(spark, sf_dir):
    """Same ranking, same 4-dp scores, same tie-breaks — the index moves
    the postings, not the arithmetic."""
    a = [tuple(r) for r in hybrid.bm25_topk(spark, sf_dir).collect()]
    b = [tuple(r) for r in invindex.bm25_topk_served(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 10


def test_build_is_idempotent_and_memoized_on_disk(spark, sf_dir):
    root1 = invindex.build_text_index(spark, sf_dir)
    assert os.path.exists(os.path.join(root1, "_BUILT"))
    mtime = os.path.getmtime(os.path.join(root1, "_BUILT"))
    root2 = invindex.build_text_index(spark, sf_dir)
    assert root2 == root1
    assert os.path.getmtime(os.path.join(root1, "_BUILT")) == mtime


def test_postings_match_direct_computation(spark, sf_dir):
    """Index content equals a from-scratch tf/dl computation over the
    corpus (the probed subset — the only part a query ever reads)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = F.split(F.col("text"), " ")
    direct = (
        docs.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .filter(F.col("term").isin(list(invindex.QUERY_TERMS)))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in invindex.inverted_postings_rows(spark, sf_dir).collect()
    }
    want = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in direct.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stats_cover_whole_corpus(spark, sf_dir):
    """n_docs/tot_dl in the index equal the corpus totals — every doc
    yields >= 1 posting row (split() never returns an empty array), so
    deriving stats from the written postings loses nothing."""
    root = invindex.build_text_index(spark, sf_dir)
    srow = spark.read.parquet(os.path.join(root, "stats")).head()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    want = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("dl"),
    ).head()
    assert srow["n_docs"] == want["n"]
    assert srow["tot_dl"] == want["dl"]
