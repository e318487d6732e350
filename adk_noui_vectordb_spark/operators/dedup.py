"""Deduplication operators — exact, MinHash-LSH, SimHash, Jaccard, embedding.

Core LLM-training-pipeline surface (north star). Design for 100 TB:

- exact dedup is one hash-groupBy (map-side partial agg, one shuffle);
- MinHash-LSH never materializes the O(n^2) pair space: signatures are
  banded and candidates come from an equi self-join on (band, band_hash),
  i.e. a shuffle-hash join on a high-cardinality key — the standard
  scalable near-dup plan;
- SimHash reduces each doc to one 16-bit key; candidate pairs come from
  equi-joining on the key (optionally rotated keys for 1-bit tolerance);
- verification (true Jaccard) runs only on candidates.

Everything is built-in expressions (md5 -> conv arithmetic); no Python UDFs,
so the whole pipeline stays in whole-stage codegen. All hash functions are
md5-derived — deterministic AND reproducible in the DuckDB oracle (Spark's
murmur `hash()`/`xxhash64` are engine-private, so they are deliberately NOT
used in any oracle-checked path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens
from ..sources.tables import load_table

# MinHash parameters: k universal-hash permutations h_i(x) = (a_i*x + b_i) mod p
# over p = 2^31 - 1, banded into NUM_BANDS bands of ROWS_PER_BAND rows.
# Fixed (seed-free) constants, shared verbatim with the DuckDB oracle SQL.
# All intermediates stay < 2^62, so bigint arithmetic never overflows
# (ANSI mode would error on overflow) and both engines agree exactly.
MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)
NUM_HASHES = 16
ROWS_PER_BAND = 4
NUM_BANDS = NUM_HASHES // ROWS_PER_BAND
MINHASH_A = [
    1103515245, 1234567891, 987654321, 805306457,
    402653189, 1610612741, 1431655765, 1073741827,
    715827883, 1299709, 15485863, 32452843,
    49979687, 67867967, 86028121, 104395301,
]
MINHASH_B = [
    12345, 67891, 24680, 13579, 97531, 86420, 111111, 222222,
    333333, 444444, 555555, 666666, 777777, 888888, 999999, 101010,
]

SIMHASH_BITS = 16


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint.

    15 hex chars < 2^60 fits signed int64. DuckDB twin:
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_mod_p(c: Column) -> Column:
    """48-bit md5 prefix reduced mod MINHASH_PRIME — the base hash fed to
    the minhash permutations. DuckDB twin:
    ``CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT) % 2147483647``.
    """
    return (
        F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("bigint")
        % F.lit(MINHASH_PRIME)
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep the lowest doc_id per hash group
    (the reference's idempotent content-hash upsert, indexing_agent.py:28-31,350)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as distinct strings."""
    words = whitespace_tokens(text)
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


def minhash_signature_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hash_idx, minhash) rows: min over shingle-hash permutations.

    Exploded scalar shape (not an array column) so the oracle value-hash
    compares plain columns.
    """
    d = load_table(spark, sf_dir, "documents")
    shingled = d.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    base = shingled.select("doc_id", md5_mod_p(F.col("shingle")).alias("h"))
    # One (a*h+b) mod p per permutation, unpivoted via stack.
    perms = base.select(
        "doc_id",
        *[
            (
                (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
                % F.lit(MINHASH_PRIME)
            ).alias(f"p{i}")
            for i in range(NUM_HASHES)
        ],
    )
    stack_expr = "stack({n}, {args}) as (hash_idx, hv)".format(
        n=NUM_HASHES,
        args=", ".join(f"{i}, p{i}" for i in range(NUM_HASHES)),
    )
    long_form = perms.select("doc_id", F.expr(stack_expr))
    return long_form.groupBy("doc_id", "hash_idx").agg(F.min("hv").alias("minhash"))


def minhash_band_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_hash): md5 over the band's concatenated minhashes."""
    sig = minhash_signature_rows(spark, sf_dir)
    banded = sig.withColumn(
        "band", (F.col("hash_idx") / ROWS_PER_BAND).cast("int")
    )
    # Deterministic within-band order via sort on hash_idx.
    per_band = banded.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("hash_idx", "minhash"))),
                lambda s: s["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )
    return per_band.select(
        "doc_id", "band", F.md5("band_key").alias("band_hash")
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing any (band, band_hash) bucket.

    Equi self-join on the bucket key — the scalable plan: no cross join,
    shuffle keyed on band_hash, AQE handles hot buckets. Output is the
    distinct (doc_a < doc_b) candidate edge list.
    """
    bands = minhash_band_rows(spark, sf_dir)
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.2
) -> DataFrame:
    """Verified near-dup pairs: word-set Jaccard over blocked candidates.

    Blocking key = (lang, length band): candidate generation is an equi
    join, never a cross join; Jaccard runs only inside blocks. At scale the
    block key bounds the quadratic term to the largest block.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("int").alias("len_band"),
        F.array_distinct(whitespace_tokens(F.col("text"))).alias("words"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_band") == F.col("b.len_band"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.array_union(F.col("a.words"), F.col("b.words")))
    jac = F.round(inter / union.cast("double"), 4)
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit SimHash over word hashes.

    bit_i(doc) = 1 iff sum over distinct words of (+1 if bit_i(md5_long(w))
    else -1) > 0. Explode -> per-bit signed sum -> recompose. Bounded
    expression width (16 conditional sums), one shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.array_distinct(whitespace_tokens(F.col("text")))).alias("w"),
    )
    hashed = words.select("doc_id", md5_long(F.col("w")).alias("h"))
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("bigint").alias("simhash"))


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold within label blocks.

    Blocking on the cluster label turns the O(n^2) similarity self-join into
    per-block joins (the IVF idea applied to dedup); at 100 TB the label
    comes from a cheap clustering pass and bounds each block's pair count.
    """
    from ..functions.vector import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = F.round(
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")), 4
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
