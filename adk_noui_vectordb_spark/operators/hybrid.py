"""BM25 lexical ranking and BM25+vector hybrid retrieval (RRF fusion).

The reference's retrieval surface is vector-only (ChromaDB
``collection.query``, coding_agent/tools/vector_search_tool.py:33-79).
Production retrieval over a 100 TB corpus is *hybrid*: a lexical BM25
ranking and an embedding ranking fused with Reciprocal Rank Fusion
(Cormack, Clarke & Buettcher, SIGIR 2009: ``score = sum 1/(k + rank)``).
Both rankings and the fusion are pure Catalyst expressions — no UDF, no
driver-side loop.

Plan shape at scale:

    lexical:  ONE narrow pass over documents computing (dl, tf per literal
              query term) with array HOFs — no explode, no shuffle;
              corpus stats (N, total dl, df per term) fold into a SINGLE
              scalar aggregate (map-side partial -> 1 row) that re-enters
              as a broadcast; matching docs filter to a tiny frame.
              ZERO corpus-sized shuffles — the round-2 design joined a
              corpus-wide (doc_id, dl) frame against the term-filtered
              tf frame, which at 100 TB shuffled the whole corpus's dl
              projection (round-2 VERDICT scale note; fixed here).
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

    Shuffle-free shape: ``tf`` per literal term and ``dl`` come from array
    HOFs over the token array in ONE narrow projection (no explode, no
    groupBy on doc_id); ``n_docs``/``tot_dl``/``df`` per term fold into a
    single scalar aggregate (map-side partial -> 1 row) that re-enters as
    a broadcast so ``avgdl`` is computed by the SAME division (sum/count)
    on both engines. The only exchange in the whole ranking is that 1-row
    aggregate — nothing corpus-sized ever shuffles.
    """
    tokens = whitespace_tokens(F.col("text"))

    def count_of(term: str) -> F.Column:
        # NOTE: must be a ONE-arg lambda — pyspark passes (element, index)
        # to two-arg HOF lambdas, so a `t=t` default-capture breaks it.
        return F.size(F.filter(tokens, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        "doc_id",
        F.size(tokens).alias("dl"),
        *[count_of(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("tot_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    matched = F.lit(False)
    for i in range(len(terms)):
        matched = matched | (F.col(f"_tf{i}") > 0)

    avgdl = F.col("tot_dl").cast("double") / F.col("n_docs")

    def part(i: int) -> F.Column:
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
            + 1.0
        )
        contrib = (
            idf
            * (tf * (K1 + 1.0))
            / (tf + K1 * ((1.0 - B) + B * (F.col("dl") / avgdl)))
        )
        return F.when(F.col(f"_tf{i}") > 0, contrib).otherwise(F.lit(0.0))

    # Fixed-order combination: per-term contributions added in literal term
    # order — no engine-dependent float accumulation order.
    total = part(0)
    for i in range(1, len(terms)):
        total = total + part(i)
    return (
        per_doc.filter(matched)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(total, 4).alias("bm25"))
    )


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


def _minmax_norm(pool: DataFrame, score: str, out: str) -> DataFrame:
    """Min-max normalize ``score`` within the bounded candidate pool:
    (x - min) / (max - min), the degenerate all-equal pool mapping to
    1.0 (every candidate is equally best). The 1-row min/max aggregate
    re-enters as a broadcast — the bm25_scores stats discipline; the
    pool is O(n_candidates) rows so nothing corpus-sized is touched."""
    stats = pool.agg(F.min(score).alias("_mn"), F.max(score).alias("_mx"))
    norm = F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0)).otherwise(
        (F.col(score) - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))
    )
    return pool.crossJoin(F.broadcast(stats)).select(
        "doc_id", norm.alias(out)
    )


def hybrid_weighted_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = QUERY_TERMS,
    query_vec_id: int = 0,
    alpha: float = 0.6,
    n_candidates: int = 100,
    k: int = 10,
) -> DataFrame:
    """Convex score fusion — the ``alpha`` hybrid (Weaviate's
    relativeScoreFusion / Pinecone's convex combination, the OTHER
    standard besides RRF): each source's top-N scores are min-max
    normalized WITHIN its candidate pool, then fused as
    ``alpha * vec + (1 - alpha) * lex`` — unlike RRF it preserves score
    MAGNITUDE (a runaway best match dominates; RRF flattens it to rank
    1), at the price of pool-relative calibration.

    Same 100 TB shape as hybrid_rrf_topk: both pools are cut to
    O(n_candidates) by TakeOrderedAndProject before any window/join;
    the min/max stats are 1-row broadcasts. A document absent from one
    pool contributes 0 from that modality (full-outer join). Fixed
    op order ``round(a*v + b*l, 4)`` on 4-dp inputs keeps the fused
    score cross-engine stable."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex_top = (
        bm25_scores(docs, terms)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(n_candidates)
    )
    lex_n = _minmax_norm(lex_top, "bm25", "lex_n")

    q = make_query_from_vec(emb, query_vec_id)
    sim = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 4)
    vec_top = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(n_candidates)
    )
    vec_n = _minmax_norm(vec_top, "sim", "vec_n")

    fused = lex_n.join(vec_n, "doc_id", "full_outer")
    wscore = F.round(
        F.lit(alpha) * F.coalesce(F.col("vec_n"), F.lit(0.0))
        + F.lit(1.0 - alpha) * F.coalesce(F.col("lex_n"), F.lit(0.0)),
        4,
    )
    return (
        fused.select("doc_id", wscore.alias("wscore"))
        .orderBy(F.desc("wscore"), F.asc("doc_id"))
        .limit(k)
    )
