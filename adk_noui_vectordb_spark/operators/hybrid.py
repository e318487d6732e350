"""BM25 lexical ranking and BM25+vector hybrid retrieval (RRF fusion).

The reference's retrieval surface is vector-only (ChromaDB
``collection.query``, coding_agent/tools/vector_search_tool.py:33-79).
Production retrieval over a 100 TB corpus is *hybrid*: a lexical BM25
ranking and an embedding ranking fused with Reciprocal Rank Fusion
(Cormack, Clarke & Buettcher, SIGIR 2009: ``score = sum 1/(k + rank)``).
Both rankings and the fusion are pure Catalyst expressions — no UDF, no
driver-side loop.

Plan shape at scale:

    lexical:  explode(tokens) -> filter(term IN query)   -- tiny after filter
              groupBy(doc_id, term) partial-agged        -- one corpus shuffle
              join broadcast(df per term, <= |query| rows)
    vector:   candidates crossJoin broadcast(1-row query) -> cosine
    both:     ORDER BY score LIMIT N  == TakeOrderedAndProject (per-partition
              k-heap, no global sort) -> rank the N survivors -> full-outer
              join the two N-row lists -> RRF -> top-k.

Capping each source at N *before* ranking is the point: the rank window
never sees more than N rows regardless of corpus size, so the fusion cost
is O(N) at 100 TB too.

Determinism contract (SURVEY.md section 5 rounding rules):
- per-term BM25 contributions are combined in FIXED literal term order (one
  conditional aggregate per query term, each over <= 1 non-null value),
  never a float sum whose accumulation order can differ across engines;
- both rankings use the ROUNDED (4 dp) score with id tie-break;
- RRF contributions ``1/(60 + rank)`` are exact-integer-input IEEE
  divisions added in fixed order — bit-identical cross-engine, so the fused
  score is deliberately left unrounded (rounding would only add the .xxx5
  tie hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import whitespace_tokens
from ..functions.vector import cosine_similarity
from ..sources.tables import load_table
from .knn import make_query_from_vec

K1 = 1.2
B = 0.75
RRF_K = 60
QUERY_TERMS = ("join", "scan", "window")


def bm25_scores(
    docs: DataFrame, terms: tuple[str, ...] = QUERY_TERMS
) -> DataFrame:
    """Per-document BM25 score for a fixed query-term tuple.

    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the Lucene/ATIRE variant,
    always positive), ``tf`` part ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.
    Only documents matching >= 1 query term appear (the inverted-index
    semantics — everything else scores 0 and is never materialized).
    """
    words = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("term")
    )
    dl = docs.select(
        "doc_id", F.size(whitespace_tokens(F.col("text"))).alias("dl")
    )
    # Corpus stats enter as a broadcast 1-row join so avgdl is computed by
    # the SAME division (sum/count) on both engines.
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_dl")
    )
    tf = (
        words.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("tot_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    part = (
        idf
        * (F.col("tf") * (K1 + 1.0))
        / (F.col("tf") + K1 * ((1.0 - B) + B * (F.col("dl") / avgdl)))
    )

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", part.alias("part"))
    )
    # Fixed-order combination: one conditional aggregate per literal term
    # (each sums <= 1 non-null value, i.e. exact), then added in literal
    # order — no engine-dependent float accumulation order.
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("part"))).alias(f"_s{i}")
        for i, t in enumerate(terms)
    ]
    agg = scored.groupBy("doc_id").agg(*per_term)
    total = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return agg.select("doc_id", F.round(total, 4).alias("bm25"))


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 — ORDER BY rounded score LIMIT k, which
    Spark executes as TakeOrderedAndProject (no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, terms)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_rrf_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = QUERY_TERMS,
    query_vec_id: int = 0,
    n_candidates: int = 100,
    k: int = 10,
) -> DataFrame:
    """Hybrid retrieval: BM25 top-N and cosine top-N fused with RRF.

    Each source is cut to ``n_candidates`` FIRST (TakeOrderedAndProject),
    so the rank windows and the fusion join see O(N) rows however large the
    corpus — the standard two-tower serving shape. Documents appearing in
    only one list get that list's contribution only (full-outer join).
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex_top = (
        bm25_scores(docs, terms)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(n_candidates)
    )
    lex_ranked = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rank"),
    )

    q = make_query_from_vec(emb, query_vec_id)
    sim = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 4)
    vec_top = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(n_candidates)
    )
    vec_ranked = vec_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
        .alias("vec_rank"),
    )

    fused = lex_ranked.join(vec_ranked, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )
