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

Hashing/banding stays in built-in expressions (md5 -> conv arithmetic)
inside whole-stage codegen; the within-block all-pairs verification kernels
(Jaccard, cosine) run as Arrow-batched ``applyInPandas`` gram-matrix
matmuls — numpy/BLAS per block, one Arrow crossing per row. All hash
functions are md5-derived — deterministic AND reproducible in the DuckDB
oracle (Spark's murmur `hash()`/`xxhash64` are engine-private, so they are
deliberately NOT used in any oracle-checked path).
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

# 60-bit SimHash (the full md5_long prefix width), banded into 4 bands of
# 15 bits. Pigeonhole: two signatures within hamming distance 3 differ in
# at most 3 bands, so they MATCH on at least one band — banded candidate
# generation has exact recall for the hamming <= 3 predicate while each
# band key has 2^15 = 32768 buckets (bounded blocks, real selectivity).
# The previous 16-bit/high-byte scheme had 256 buckets and ~11% pair
# selectivity at sf0.001 — near-quadratic and non-discriminative.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


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


def _shingles(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles as distinct strings.

    ``words`` must be a PRE-PROJECTED split-array COLUMN: an inline
    ``split(text)`` here would re-evaluate once per sequence element —
    expressions inlined into a HOF lambda are outside subexpression
    elimination (the lang_id_ngram O(n^2) finding, SCALE.md r6)."""
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


_WIDE_SCHEMA = "doc_id bigint, " + ", ".join(
    f"m{i} bigint" for i in range(NUM_HASHES)
)


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc with the 16 minhashes as columns m0..m15 — the
    corpus entry point of ``minhash_wide_for`` (same kernel; the split
    exists so the incremental index update signs BATCHES with
    byte-identical arithmetic)."""
    from ..sources.tables import fan_out

    # The documents file scans as ONE task below a row group — the kernel
    # would serialize on a single core. fan_out round-robins the rows to
    # defaultParallelism first: measured at sf0.1/local[32], the ~0.1 s
    # exchange buys back ~2 s of single-threaded shingle+md5 time
    # (2.67 s -> 0.65 s for the wide signatures; SCALE.md r6).
    return minhash_wide_for(
        fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    )


def minhash_wide_for(d: DataFrame) -> DataFrame:
    """The wide-signature kernel over ANY (doc_id, text) frame.

    Computed in a single ``mapInPandas`` pass: shingle -> md5 -> all 16
    permutation minima per doc via one numpy broadcast — NO explode, NO
    shuffle (narrow op; each doc's text is one input row). Measured 2.3x
    faster than the expression pipeline (interpreted HOF lambdas dominate)
    and byte-identical output: the hash arithmetic is the same
    md5-prefix/int64 math the DuckDB oracle runs (int64 never overflows:
    max a_i * h < 2^62). ``_minhash_wide_expr`` keeps the pure-JVM
    formulation; equality of the two is pinned in tests.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    a_col = np.array(MINHASH_A, dtype=np.int64)[:, None]
    b_col = np.array(MINHASH_B, dtype=np.int64)[:, None]

    def batches(it):
        for pdf in it:
            ids, rows = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ")
                k = max(len(words) - 2, 1)
                shingles = {" ".join(words[i : i + 3]) for i in range(k)}
                h = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
                        % MINHASH_PRIME
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                ids.append(doc_id)
                rows.append(((a_col * h + b_col) % MINHASH_PRIME).min(axis=1))
            m = (
                np.stack(rows)
                if rows
                else np.empty((0, NUM_HASHES), dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    **{f"m{i}": m[:, i] for i in range(NUM_HASHES)},
                }
            )

    return d.mapInPandas(batches, _WIDE_SCHEMA)


def _minhash_wide_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM formulation of ``_minhash_wide`` (HOF shingles + md5
    expressions + 16 min aggregates in one groupBy, map-side partial agg).
    Kept as the no-Python-workers alternative; must stay value-identical
    to the Arrow kernel (tested)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", whitespace_tokens(F.col("text")).alias("w")
    )
    shingled = d.select(
        "doc_id", F.explode(_shingles(F.col("w"))).alias("shingle")
    )
    base = shingled.select("doc_id", md5_mod_p(F.col("shingle")).alias("h"))
    return base.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
                % F.lit(MINHASH_PRIME)
            ).alias(f"m{i}")
            for i in range(NUM_HASHES)
        ]
    )


# Session-scoped memo of the CHECKPOINTED wide signature frame (shared
# memo.session_memo — keyed by session + dataset fingerprint, ADVICE r6).
# The signature kernel is the expensive stage of every minhash consumer
# (signature/band rows, candidate pairs, Jaccard estimate, connected
# components); at 100 TB the lifecycle is encode-once/serve-many — write
# the signature table to parquet and join from it (the build_pq_index
# pattern, documented in SCALE.md) — and this memo is the exact
# in-session equivalent: the first caller materializes via
# localCheckpoint, everyone else reuses the materialized blocks.
def _minhash_wide_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..memo import session_memo

    return session_memo(
        spark,
        sf_dir,
        "minhash_wide",
        lambda: _minhash_wide(spark, sf_dir).localCheckpoint(eager=True),
    )


def minhash_signature_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hash_idx, minhash) rows: min over shingle-hash permutations.

    Exploded scalar shape (not an array column) so the oracle value-hash
    compares plain columns. The stack runs AFTER aggregation (16 rows per
    doc, post-shuffle) — cheap.
    """
    wide = _minhash_wide_cached(spark, sf_dir)
    stack_expr = "stack({n}, {args}) as (hash_idx, minhash)".format(
        n=NUM_HASHES,
        args=", ".join(f"{i}, m{i}" for i in range(NUM_HASHES)),
    )
    return wide.select("doc_id", F.expr(stack_expr))


def minhash_band_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_hash): md5 over the band's concatenated minhashes.

    Band keys come straight off the wide signature row (columns m0..m15 are
    already in hash_idx order) — no second shuffle, no collect_list."""
    wide = _minhash_wide_cached(spark, sf_dir)
    hashed = wide.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{i}").cast("string")
                        for i in range(
                            j * ROWS_PER_BAND, (j + 1) * ROWS_PER_BAND
                        )
                    ],
                )
            ).alias(f"bh{j}")
            for j in range(NUM_BANDS)
        ],
    )
    stack_expr = "stack({n}, {args}) as (band, band_hash)".format(
        n=NUM_BANDS,
        args=", ".join(f"{j}, bh{j}" for j in range(NUM_BANDS)),
    )
    return hashed.select("doc_id", F.expr(stack_expr))


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing any (band, band_hash) bucket.

    Equi self-join on the bucket key — the scalable plan: no cross join,
    shuffle keyed on band_hash, AQE handles hot buckets. Output is the
    distinct (doc_a < doc_b) candidate edge list.

    The signature kernel output is MATERIALIZED once (the session-scoped
    ``_minhash_wide_cached`` checkpoint) before the self-join: Spark does
    not share identical narrow subtrees across join sides, so an
    unmaterialized self-join runs the whole scan -> shingle -> md5 ->
    minhash Arrow kernel TWICE (measured ~0.8 s per run at sf0.1 — it was
    most of this query's cost). At 100 TB the same move is writing the
    signature table to parquet once and serving joins from it (the
    build_pq_index lifecycle); the checkpointed memo is the in-session
    equivalent, shared by every minhash consumer. The band projection off
    the checkpoint (md5 over 4 ints per band) is cheap enough to run per
    join side.
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
    spark: SparkSession, sf_dir: str, threshold: float = 0.2,
    block_cap: int = 4096,
) -> DataFrame:
    """Verified near-dup pairs: word-set Jaccard over blocked candidates.

    Blocking key = (lang, length band) bounds the quadratic term to the
    largest block; ``block_cap`` then bounds MEMORY within a block (see
    ``jaccard_pairs_blocked``). Counts are integers, so inter/union is the
    bit-identical double in every engine; the 4-dp rounding happens
    Spark-side (HALF_UP, matching DuckDB).
    """
    # NOT fan_out here (measured r6): the groupBy-block shuffle right after
    # already spreads the work, and the extra exchange showed no gain.
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("int").alias("len_band"),
        F.array_distinct(whitespace_tokens(F.col("text"))).alias("words"),
    )
    return jaccard_pairs_blocked(docs, threshold, block_cap)


def ppjoin_prefix_len(n: Column, threshold: float) -> Column:
    """Exact PPJoin prefix length ``n − ⌈t·n⌉ + 1`` in pure integer
    arithmetic (ADVICE r14 #1: the previous ``floor((1−t)·n)+1`` on the
    inexact double ``1.0−0.8 = 0.19999999999999996`` is one SHORTER than
    the exact bound whenever (1−t)·n is integral — any n divisible by 5
    at t=0.8 — silently dropping a pair whose containment is exactly t;
    the twin embedded the same literal, so parity could never surface
    it). ⌈num·n/den⌉ = floor((num·n + den − 1)/den); the DuckDB twins
    mirror the same rational with integer ``//``.

    num/den come from ``Fraction(threshold).limit_denominator(10**6)``
    (ADVICE r15 #1): a high-precision float like 0.8333333333333333
    would otherwise read as den = 10^16, whose num·n product overflows
    int64 silently under Spark's non-ANSI wrap — the 10^-6 threshold
    grid keeps den (hence num) ≤ 10^6, so num·n is exact far past any
    real shingle count. The reduced fraction yields the same value for
    every n (scaling num/den preserves the rational: ⌈4n/5⌉ ≡ ⌈8n/10⌉,
    so the twins' 8/10 literals stay agreeing). The division itself is
    DECIMAL, not double (ADVICE r15 #3: double floor is only exact
    while num·n + den − 1 < 2^53): decimal(38,0)/int divides exactly
    and rounds HALF_UP at scale ≥ 6, and with den ≤ 10^6 the true
    fraction part is ≤ (10^6−1)/10^6 = 0.999999 — representable, never
    rounded up across the integer boundary — so floor is exact by
    construction for all 38-digit n."""
    from fractions import Fraction

    frac = Fraction(str(threshold)).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    ceil_tn = F.floor(
        (F.lit(num) * n.cast("decimal(38,0)") + F.lit(den - 1)) / F.lit(den)
    ).cast("bigint")
    return n.cast("bigint") - ceil_tn + F.lit(1)


def dedup_containment_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by SHINGLE-set CONTAINMENT — C(A→B) =
    |S(A)∩S(B)| / |S(A)| over distinct 3-gram shingles (Broder's item
    space, the minhash pipeline's `_shingles`) — the subset-duplication
    detector Jaccard structurally misses (a short document quoted
    inside a long one has low Jaccard but containment ≈ 1; cf. the
    verbatim case `dedup_substring_rewrite` handles). Emits unordered
    pairs where EITHER direction reaches ``threshold``, with both 4-dp
    containments.

    Candidates by PREFIX FILTERING (PPJoin, Xiao et al. WWW 2008): order
    each doc's shingles by ascending global document frequency (shingle
    tie-break); if C(A→B) ≥ t then A's |A|−⌈t·|A|⌉+1 RAREST shingles
    (= ⌊(1−t)·|A|⌋+1 for exact reals; computed all-integer, see
    ``ppjoin_prefix_len``) must intersect B (fewer than that many
    misses leaves |A∩B| ≥ t|A|)
    — so candidates come from joining each doc's rare-prefix shingles
    against the full shingle index, never all-pairs. Completeness holds
    per DIRECTION, and the single prefix×index join covers both
    directions at once ((p=A,t=B) and (p=B,t=A) both land on the same
    unordered pair).

    SHINGLES, not words, deliberately: prefix filtering is only as
    selective as the item space — on this testdata's 31-word vocabulary
    the word-set variant degenerates to all-pairs (measured: 12.4M
    candidate pairs at 5,000 docs, OOM), while 3-gram shingles (27k
    distinct, max df 25) cut it to 176k. Real corpora have the same
    skew: function words are universal, word TRIGRAMS are not.

    100 TB shape: the shingle index is the BM25-postings cost class;
    the per-doc prefix ranking is one window over (doc, shingle-df);
    candidate volume is Σ df(prefix shingles) — the PPJoin trade.
    Verification touches candidate pairs only (array_intersect on two
    bounded shingle arrays)."""
    from pyspark.sql.window import Window

    from ..sources.tables import fan_out

    d = load_table(spark, sf_dir, "documents")
    # pre-projected tokens + fan_out: same fix as _doc_gram_keys (r16) —
    # the inline split re-evaluated per _shingles sequence element, and
    # the single-row-group scan shingled on one task. The shingled frame
    # is then materialized ONCE (guide §8 step 1: one derivation pass,
    # reused everywhere): it feeds THREE consumers — the exploded token
    # table and both sides of the verification join — and lazily each
    # re-ran the whole tokenize+shingle kernel (measured ~1.4 s per
    # extra pass at sf0.1, ~2x the whole key). An offline all-pairs job
    # materializing its fingerprint table is the §8 decision-pass shape.
    # OFFLINE-JOB INVARIANT (r17, VERDICT r16 what's-wrong #2):
    # localCheckpoint pins the shingled frame on executor-local storage
    # with NO lineage recovery — acceptable here ONLY because this is a
    # single-session batch job whose action either completes or reruns
    # from the parquet source; a lost executor fails the job, it cannot
    # silently corrupt it. At 100 TB prefer reliable `checkpoint()` to
    # a replicated store (or persist(DISK_ONLY), which keeps lineage)
    # and size executors for ~|corpus shingle arrays| local spill; the
    # SERVING paths never take this branch (gates checkpoint only
    # batch-bounded frames). See SCALE.md "Dedup surface".
    docs = (
        fan_out(d)
        .select("doc_id", whitespace_tokens(F.col("text")).alias("wtok"))
        .select("doc_id", _shingles(F.col("wtok")).alias("words"))
        .localCheckpoint(eager=True)
    )
    tok = docs.select("doc_id", F.explode("words").alias("w"))
    dfc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    sized = docs.select("doc_id", F.size("words").alias("n"))
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("w"))
    prefix = (
        tok.join(dfc, "w")
        .withColumn("rn", F.row_number().over(wdoc))
        .join(sized, "doc_id")
        .filter(F.col("rn") <= ppjoin_prefix_len(F.col("n"), threshold))
        .select("doc_id", "w")
    )
    cand = (
        prefix.alias("p")
        .join(tok.alias("t"), "w")
        .filter(F.col("p.doc_id") != F.col("t.doc_id"))
        .select(
            F.least("p.doc_id", "t.doc_id").alias("doc_a"),
            F.greatest("p.doc_id", "t.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    scored = (
        cand.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("words").alias("wa")
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("words").alias("wb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("wa", "wb"))
                / F.size("wa").cast("double"),
                4,
            ).alias("cont_a_in_b"),
            F.round(
                F.size(F.array_intersect("wa", "wb"))
                / F.size("wb").cast("double"),
                4,
            ).alias("cont_b_in_a"),
        )
    )
    return scored.filter(
        F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold
    ).orderBy("doc_a", "doc_b")


N_GRAM_BUCKETS = 32
CONTAIN_THRESHOLD = 0.8
CONTAINMENT_COMPONENTS = [
    ("post", ["gbucket"]),
    ("dfs", ["gbucket"]),
    ("grams", ["sbucket"]),
    ("sizes", ["sbucket"]),
]


def containment_index_root(sf_dir: str, tag: str = "") -> str:
    from ..memo import index_root

    # the threshold participates: the stored in_prefix flags are a pure
    # function of it (a different gate threshold is a different index).
    # v2: exact-integer prefix bound (ppjoin_prefix_len) — v1 flags were
    # baked with the inexact-double floor and are one short on n % 5 == 0.
    # tag (only-when-set, the graph-root discipline): keys that MUTATE
    # their index (the ingested-gate lifecycle) never share a root with
    # the read-only gate keys
    extra = (tag,) if tag else ()
    return index_root(
        "containment_idx_v2", sf_dir, *extra,
        N_GRAM_BUCKETS, repr(CONTAIN_THRESHOLD),
    )


def _doc_gram_keys(d: DataFrame) -> DataFrame:
    """(doc_id, gk) — each doc's DISTINCT 3-gram shingles as 60-bit md5
    keys (`md5_long`; a 60-bit collision merging two shingles is
    negligible AND mirrored exactly by the twin's identical md5, so
    parity is unconditional).

    r16 (guide §4.1/§2.5): the token array is PRE-PROJECTED before
    ``_shingles`` — the former inline ``whitespace_tokens(text)`` was
    exactly the in-lambda re-evaluation `_shingles`'s own docstring
    forbids (split re-ran per sequence element; measured 1.6x slower) —
    and the input fans out first so a single-row-group corpus scan
    doesn't shingle+hash on one task (another 1.2x; no-op on real
    multi-split inputs)."""
    from ..sources.tables import fan_out

    return (
        fan_out(d)
        .select("doc_id", whitespace_tokens(F.col("text")).alias("w"))
        .select("doc_id", _shingles(F.col("w")).alias("sh"))
        .select("doc_id", F.explode("sh").alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("gk"))
    )


def build_containment_index(
    spark: SparkSession, sf_dir: str, tag: str = ""
) -> str:
    """Materialize the shingle index the CONTAINMENT ingest gate serves
    from (the `build_minhash_index` lifecycle). Components:

    - ``post/gbucket=*/``: (gk, doc_id, in_prefix) — the shingle
      postings, partitioned by gk's md5 bucket so probes prune with
      literal partition filters; ``in_prefix`` marks the rows belonging
      to their doc's PPJoin prefix (the n−⌈t·n⌉+1 rarest-by-corpus-df
      shingles) — the stored half of the two-direction candidate
      theorem (see `dedup_containment_gate_for`);
    - ``dfs/gbucket=*/``: (gk, df) — corpus document frequencies, the
      batch-side prefix ranking's x-axis;
    - ``grams/sbucket=*/``: (doc_id, gk) — the doc-keyed reverse map
      verification reads (candidate old docs' full shingle sets,
      doc-bucket-pruned);
    - ``sizes/sbucket=*/``: (doc_id, n) — containment denominators."""
    import os
    import shutil

    from pyspark.sql.window import Window

    from ..sources import versioning as vn
    from .invindex import doc_bucket_expr

    root = containment_index_root(sf_dir, tag)
    cur = vn.current_dir(root)
    if cur is not None:
        return cur
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, ".__tmp_build__")
    shutil.rmtree(tmp, ignore_errors=True)
    grams = _doc_gram_keys(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).localCheckpoint(eager=True)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfs = grams.groupBy("gk").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gk"))
    post = (
        grams.join(dfs, "gk")
        .withColumn("rn", F.row_number().over(wdoc))
        .join(sizes, "doc_id")
        .select(
            "gk",
            "doc_id",
            (
                F.col("rn")
                <= ppjoin_prefix_len(F.col("n"), CONTAIN_THRESHOLD)
            ).alias("in_prefix"),
            (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("gbucket"),
        )
    )
    post.repartition(F.col("gbucket")).write.mode("overwrite").partitionBy(
        "gbucket"
    ).parquet(os.path.join(tmp, "post"))
    dfs.select(
        "gk", "df", (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("gbucket")
    ).repartition(F.col("gbucket")).write.mode("overwrite").partitionBy(
        "gbucket"
    ).parquet(os.path.join(tmp, "dfs"))
    grams.select(
        "doc_id", "gk", doc_bucket_expr(F.col("doc_id")).alias("sbucket")
    ).repartition(F.col("sbucket")).write.mode("overwrite").partitionBy(
        "sbucket"
    ).parquet(os.path.join(tmp, "grams"))
    sizes.select(
        "doc_id", "n", doc_bucket_expr(F.col("doc_id")).alias("sbucket")
    ).repartition(F.col("sbucket")).write.mode("overwrite").partitionBy(
        "sbucket"
    ).parquet(os.path.join(tmp, "sizes"))
    _write_containment_build_stats(spark, tmp)
    name = vn.next_version_name(root)
    try:
        vn.publish_version(root, tmp, name, expected=None)
    except vn.ConcurrentWriterError:
        return vn.current_dir(root)
    return os.path.join(root, name)


def update_containment_index(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    tag: str = "",
    auto_compact_threshold: int = 16,
) -> str:
    """ADMIT a batch into the containment index — the asymmetric
    sibling of ``update_minhash_index``'s doc-level REPLACE, under the
    frozen-coarse-structure discipline the IVF/graph inserts use:
    ``dfs/`` stays FROZEN at its build-time corpus frequencies (linked
    through), and the batch's stored ``in_prefix`` flags rank by those
    frozen dfs (unseen shingles df 0 = rarest). This is SOUND, not just
    cheap: prefix-filter completeness is ranking-INDEPENDENT — if
    C(A→B) ≥ t then ANY n−⌈t·n⌉+1 items of A intersect B (|A∖B| ≤
    |A|−⌈t·|A|⌉, pigeonhole), so the df order only tunes candidate
    SELECTIVITY; a drifted ranking admits more candidates, never misses
    a pair. ``containment_drift_metrics`` watches probe fatness against
    the frozen ``build_stats.json`` (surfaced as the ``prefix_drift``
    fsck row) and ``rebuild_containment_index`` re-derives dfs over the
    index's own docs when it fires — the centroid-drift discipline.

    Doc-level replace: a re-submitted doc_id's stale ``post/`` rows are
    located through its OWN stored shingles (``grams/`` doubles as the
    reverse map, sbucket-pruned — the minhash sigs/ discipline), and
    only the touched gbucket/sbucket partitions rewrite; pure additions
    append beside hardlinks with zero reads of existing postings.
    Atomic CAS commit on the (optionally tagged) root."""
    import os

    from pyspark.sql.window import Window

    from ..sources import versioning as vn
    from .invindex import doc_bucket_expr

    cur = build_containment_index(spark, sf_dir, tag)
    root = os.path.dirname(cur)

    bg = _doc_gram_keys(
        new_docs.select("doc_id", "text").dropDuplicates(["doc_id"])
    ).localCheckpoint(eager=True)
    if not bg.head(1):
        return cur
    batch_ids = bg.select("doc_id").distinct()
    sbs = sorted(
        r["b"]
        for r in batch_ids.select(
            doc_bucket_expr(F.col("doc_id")).alias("b")
        ).distinct().collect()
    )
    # resubmitted docs' OLD shingles (the reverse map, sbucket-pruned):
    # their scattered post/ rows live exactly in these gks' gbuckets
    old_grams_aff = (
        spark.read.schema("doc_id bigint, gk bigint, sbucket int")
        .parquet(os.path.join(cur, "grams"))
        .filter(F.col("sbucket").isin(sbs))
    )
    resub_grams = old_grams_aff.join(
        batch_ids, "doc_id", "leftsemi"
    ).localCheckpoint(eager=True)
    resub_ids = resub_grams.select("doc_id").distinct()
    rw_gb = sorted(
        r["b"]
        for r in resub_grams.select(
            (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("b")
        ).distinct().collect()
    )
    rw_sb = sorted(
        r["sbucket"]
        for r in resub_grams.select("sbucket").distinct().collect()
    )

    # batch post rows: prefix flags ranked by the FROZEN stored dfs
    bsizes = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    gbs = sorted(
        r["b"]
        for r in bg.select(
            (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("b")
        ).distinct().collect()
    )
    dfs_t = (
        spark.read.schema("gk bigint, df bigint, gbucket int")
        .parquet(os.path.join(cur, "dfs"))
        .filter(F.col("gbucket").isin(gbs))
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gk"))
    new_post = (
        bg.join(dfs_t.select("gk", "df"), "gk", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("rn", F.row_number().over(wdoc))
        .join(bsizes, "doc_id")
        .select(
            "gk",
            "doc_id",
            (
                F.col("rn")
                <= ppjoin_prefix_len(F.col("n"), CONTAIN_THRESHOLD)
            ).alias("in_prefix"),
            (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("gbucket"),
        )
    )
    post_writes = []
    if rw_gb:
        post_writes.append(
            spark.read.schema(
                "gk bigint, doc_id bigint, in_prefix boolean, gbucket int"
            )
            .parquet(os.path.join(cur, "post"))
            .filter(F.col("gbucket").isin(rw_gb))
            .join(resub_ids, "doc_id", "left_anti")
        )
    post_writes.append(new_post)
    gram_writes = []
    size_writes = []
    if rw_sb:
        gram_writes.append(
            spark.read.schema("doc_id bigint, gk bigint, sbucket int")
            .parquet(os.path.join(cur, "grams"))
            .filter(F.col("sbucket").isin(rw_sb))
            .join(resub_ids, "doc_id", "left_anti")
        )
        size_writes.append(
            spark.read.schema("doc_id bigint, n bigint, sbucket int")
            .parquet(os.path.join(cur, "sizes"))
            .filter(F.col("sbucket").isin(rw_sb))
            .join(resub_ids, "doc_id", "left_anti")
        )
    gram_writes.append(
        bg.select(
            "doc_id", "gk", doc_bucket_expr(F.col("doc_id")).alias("sbucket")
        )
    )
    size_writes.append(
        bsizes.select(
            "doc_id", "n", doc_bucket_expr(F.col("doc_id")).alias("sbucket")
        )
    )
    return vn.commit_version(
        spark,
        root,
        [
            vn.Component(
                "post",
                ("gbucket",),
                frozenset(f"gbucket={b}" for b in rw_gb),
                tuple(post_writes),
            ),
            vn.Component("dfs", link_from=os.path.join(cur, "dfs")),
            vn.Component(
                "grams",
                ("sbucket",),
                frozenset(f"sbucket={b}" for b in rw_sb),
                tuple(gram_writes),
            ),
            vn.Component(
                "sizes",
                ("sbucket",),
                frozenset(f"sbucket={b}" for b in rw_sb),
                tuple(size_writes),
            ),
        ],
        expected=os.path.basename(cur),
        compact=CONTAINMENT_COMPONENTS,
        compact_threshold=auto_compact_threshold,
    )


# Drift thresholds for the frozen-dfs admit path (the IVF family's
# discipline: DRIFT_RESIDUAL_THRESHOLD=1.5 growth / DRIFT_SKEW_THRESHOLD
# =3.0 mass, ann.py:1249): probes serve from prefixes ranked by
# BUILD-time dfs, so admitted mass fattens candidates invisibly — the
# metrics below make it visible and point at the rebuild.
CONTAIN_DRIFT_FANOUT_THRESHOLD = 1.5  # mean prefix-row TRUE df vs build
CONTAIN_DRIFT_MASS_THRESHOLD = 3.0  # indexed doc count vs build


def _containment_stats_of_version(spark: SparkSession, ver_dir: str) -> dict:
    """The probe-fatness snapshot drift is measured with: indexed doc
    mass and the mean TRUE document frequency over in_prefix postings
    (TRUE df recomputed from post/ itself — the frozen dfs/ table
    understates reality after admits, which is exactly the decay being
    measured). Two aggregate jobs over the narrow post table plus a
    sizes count."""
    import os

    post = spark.read.schema(
        "gk bigint, doc_id bigint, in_prefix boolean, gbucket int"
    ).parquet(os.path.join(ver_dir, "post"))
    sizes = spark.read.schema("doc_id bigint, n bigint, sbucket int").parquet(
        os.path.join(ver_dir, "sizes")
    )
    n_docs = sizes.count()
    truedf = post.groupBy("gk").agg(F.count(F.lit(1)).alias("tdf"))
    row = (
        post.filter(F.col("in_prefix"))
        .join(truedf, "gk")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.avg("tdf").alias("fanout"),
        )
        .head()
    )
    return {
        "n_docs": int(n_docs),
        "n_prefix_rows": int(row["rows"] or 0),
        "mean_prefix_df": (
            float(row["fanout"]) if row["fanout"] is not None else 0.0
        ),
    }


def _write_containment_build_stats(spark: SparkSession, tmp: str) -> None:
    """Freeze the just-built version's probe-fatness snapshot as
    ``build_stats.json`` (the `_write_build_stats` IVF discipline: the
    commit kernel carries version files forward, so the baseline
    survives every frozen-dfs admit — it describes BUILD time, which is
    what drift is measured against)."""
    import json as _json
    import os

    stats = _containment_stats_of_version(spark, tmp)
    with open(os.path.join(tmp, "build_stats.json"), "w") as f:
        _json.dump(stats, f)


def containment_drift_metrics(
    spark: SparkSession, sf_dir: str, tag: str = ""
) -> dict:
    """Probe-fatness drift detector for the containment admit path
    (VERDICT r15 next #3 — closes the ``update_containment_index``
    docstring's promise): admits keep ``dfs/`` frozen forever (SOUND —
    prefix completeness is ranking-independent), so the only decay mode
    is SELECTIVITY: prefixes ranked by stale dfs probe ever-fatter
    postings. Compares the current version's admitted mass and mean
    in_prefix TRUE df against the build_stats.json frozen at
    (re)build time and fires ``drifted`` when either growth crosses
    its threshold — the signal to run ``rebuild_containment_index``.
    Returns diagnostics; never raises on a legacy version without build
    stats (drifted=None: unknown)."""
    import json as _json
    import os

    cur = build_containment_index(spark, sf_dir, tag)
    now = _containment_stats_of_version(spark, cur)
    out: dict = {"now": now, "built": None, "drifted": None}
    p = os.path.join(cur, "build_stats.json")
    if not os.path.exists(p):
        return out
    with open(p) as f:
        built = _json.load(f)
    out["built"] = built
    mass = now["n_docs"] / built["n_docs"] if built.get("n_docs") else None
    fan = (
        now["mean_prefix_df"] / built["mean_prefix_df"]
        if built.get("mean_prefix_df")
        else None
    )
    out["mass_growth"] = mass
    out["fanout_growth"] = fan
    out["drifted"] = bool(
        (mass is not None and mass > CONTAIN_DRIFT_MASS_THRESHOLD)
        or (fan is not None and fan > CONTAIN_DRIFT_FANOUT_THRESHOLD)
    )
    return out


def rebuild_containment_index(
    spark: SparkSession, sf_dir: str, tag: str = ""
) -> str:
    """Re-derive the frozen coarse structure over the index's OWN docs
    — the ``rebalance_ivf_index`` symmetry for the containment family:
    ``grams/``+``sizes/`` are the corpus of record after admits, so
    fresh dfs come from one groupBy over grams, prefixes re-rank under
    the fresh dfs, and the commit rewrites ``post/`` and ``dfs/`` in
    full while the fat doc-keyed components hardlink (a rebuild never
    moves gram bytes — only the narrow posting/df rows).
    ``build_stats.json`` refreshes atomically with the commit, so the
    drift baseline resets to the rebuild. CAS-committed; returns the
    new current version dir.

    Equality-with-fresh-build (pinned in tests/test_pipeline_ops.py):
    dfs/prefixes are a pure function of the doc set, and grams/sizes
    hold exactly the admitted corpus — so a rebuilt index equals a
    fresh ``build_containment_index`` over the combined corpus, row
    for row, across all four components."""
    import json as _json
    import os

    from pyspark.sql.window import Window

    from ..sources import versioning as vn

    cur = build_containment_index(spark, sf_dir, tag)
    root = os.path.dirname(cur)
    grams = spark.read.schema("doc_id bigint, gk bigint, sbucket int").parquet(
        os.path.join(cur, "grams")
    )
    sizes = spark.read.schema("doc_id bigint, n bigint, sbucket int").parquet(
        os.path.join(cur, "sizes")
    )
    dfs = (
        grams.groupBy("gk")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint(eager=True)
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gk"))
    post = (
        grams.select("doc_id", "gk")
        .join(dfs, "gk")
        .withColumn("rn", F.row_number().over(wdoc))
        .join(sizes.select("doc_id", "n"), "doc_id")
        .select(
            "gk",
            "doc_id",
            (
                F.col("rn")
                <= ppjoin_prefix_len(F.col("n"), CONTAIN_THRESHOLD)
            ).alias("in_prefix"),
            (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("gbucket"),
        )
        .localCheckpoint(eager=True)
    )
    dfs_out = dfs.select(
        "gk", "df", (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("gbucket")
    )
    # post-rebuild the stored dfs ARE the true dfs, so the new baseline
    # derives from the frames about to commit (checkpointed above —
    # stats and writes see the same rows)
    n_docs = sizes.count()
    row = (
        post.filter(F.col("in_prefix"))
        .join(dfs, "gk")
        .agg(F.count(F.lit(1)).alias("rows"), F.avg("df").alias("fanout"))
        .head()
    )
    stats = {
        "n_docs": int(n_docs),
        "n_prefix_rows": int(row["rows"] or 0),
        "mean_prefix_df": (
            float(row["fanout"]) if row["fanout"] is not None else 0.0
        ),
    }

    def _all_parts(comp: str) -> frozenset:
        d = os.path.join(cur, comp)
        return frozenset(
            p for p in os.listdir(d) if p.startswith("gbucket=")
        )

    return vn.commit_version(
        spark,
        root,
        [
            vn.Component("post", ("gbucket",), _all_parts("post"), (post,)),
            vn.Component("dfs", ("gbucket",), _all_parts("dfs"), (dfs_out,)),
            vn.Component("grams", link_from=os.path.join(cur, "grams")),
            vn.Component("sizes", link_from=os.path.join(cur, "sizes")),
        ],
        expected=os.path.basename(cur),
        compact=CONTAINMENT_COMPONENTS,
        extra_files={"build_stats.json": _json.dumps(stats)},
    )


def dedup_containment_gate_for(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    threshold: float = CONTAIN_THRESHOLD,
    tag: str = "",
) -> DataFrame:
    """CONTAINMENT ingest gate: which documents of a NEW batch are
    subset-duplicates of (or contain) anything already indexed —
    answered entirely from the persisted containment index, never a
    corpus scan. The asymmetric sibling of `dedup_gate_for`'s Jaccard
    gate: a crawl re-ingesting a paragraph that lives inside an indexed
    page (or a page that swallowed an indexed paragraph) passes a
    Jaccard gate and is caught here.

    Candidates, complete per direction (PPJoin prefix theorem, both
    sides bounded — never batch × corpus):
    - new ⊂ old: the batch doc's n−⌈t·n⌉+1 rarest shingles (ranked by
      the STORED corpus dfs; unseen shingles get df 0 = rarest) must
      hit the old doc → probe `post/` with the batch PREFIX keys;
    - old ⊂ new: the old doc's stored prefix must hit the batch → probe
      `post/ WHERE in_prefix` with ALL batch keys.
    Verification reads candidate old docs' full shingle sets from the
    doc-bucket-pruned `grams/` reverse map and counts exact
    intersections; containments are exact-integer / exact-integer, 4-dp
    HALF_UP.

    Returns (new_doc_id, dup_of, cont_new_in_old, cont_old_in_new) for
    pairs whose larger direction reaches ``threshold``."""
    import os

    # ADVICE r14 #2: the STORED in_prefix flags are baked at
    # CONTAIN_THRESHOLD — prefix length shrinks as t grows, so stored
    # prefixes stay complete for any t ≥ CONTAIN_THRESHOLD, but a lower
    # t needs LONGER stored prefixes than the index has; candidates in
    # the old-contained-in-new direction would silently go missing
    if threshold < CONTAIN_THRESHOLD:
        raise ValueError(
            f"containment gate threshold {threshold} is below the "
            f"index's build threshold {CONTAIN_THRESHOLD}: the stored "
            f"prefix flags are too short to be complete — rebuild the "
            f"index at the lower threshold instead"
        )
    cur = build_containment_index(spark, sf_dir, tag)
    from pyspark.sql.window import Window

    # prologue actions run with AQE OFF (restored after) — the
    # dedup_gate_for latency fix: these are tiny hand-planned
    # statements, and AQE's per-exchange stage materialization turns
    # each into 2-3 scheduler round-trips (measured 28 jobs / 13 s warm
    # at sf0.1 before this; the returned serving query is untouched)
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bg = _doc_gram_keys(
            new_docs.select("doc_id", "text").dropDuplicates(["doc_id"])
        ).localCheckpoint(eager=True)
        gbs = sorted(
            r["b"]
            for r in bg.select(
                (F.col("gk") % N_GRAM_BUCKETS).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    # r16: memoized component handles (memo.component_df) — version dirs
    # are immutable, so the per-gate relation rebuild + partition-dir
    # listing is paid once per session, not once per query
    from ..memo import component_df

    post = component_df(
        spark,
        cur,
        "post",
        "gk bigint, doc_id bigint, in_prefix boolean, gbucket int",
    ).filter(F.col("gbucket").isin(gbs))
    dfs = component_df(
        spark, cur, "dfs", "gk bigint, df bigint, gbucket int"
    ).filter(F.col("gbucket").isin(gbs))
    bsizes = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_new"))
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gk"))
    branked = (
        bg.join(dfs.select("gk", "df"), "gk", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("rn", F.row_number().over(wdoc))
        .join(bsizes, "doc_id")
    )
    # r17 (VERDICT r16 next #4): the two PPJoin candidate probes share
    # ONE pruned post/ read. bprefix ⊆ bg (a doc's prefix keys are a
    # subset of its keys), so tagging every batch key with its
    # in-prefix flag lets a single broadcast join evaluate both
    # directions at once: a post row is a candidate when the BATCH key
    # is a prefix key (the new ⊂ old probe) OR the stored row itself is
    # a prefix (the old ⊂ new probe). The candidate pairs are collected
    # directly — they are broadcast as build sides below anyway, so
    # driver-side materialization is the same order of memory and saves
    # the checkpoint job plus the separate old_ids collect (prologue
    # eager actions after the bg checkpoint: 3 → 2).
    bkeys = branked.select(
        F.col("doc_id").alias("new_id"),
        "gk",
        (
            F.col("rn") <= ppjoin_prefix_len(F.col("n_new"), threshold)
        ).alias("bpref"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pair_rows = (
            post.select("gk", F.col("doc_id").alias("old_id"), "in_prefix")
            .join(F.broadcast(bkeys), "gk")
            .filter(F.col("bpref") | F.col("in_prefix"))
            .select("new_id", "old_id")
            .distinct()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    old_ids = sorted({r["old_id"] for r in pair_rows})
    if not old_ids:
        return spark.createDataFrame(
            [],
            "new_doc_id bigint, dup_of bigint, cont_new_in_old double,"
            " cont_old_in_new double",
        )
    cand = spark.createDataFrame(
        [(r["new_id"], r["old_id"]) for r in pair_rows],
        "new_id bigint, old_id bigint",
    )
    import hashlib

    from .invindex import N_DOC_BUCKETS

    sbs = sorted(
        {
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % N_DOC_BUCKETS
            for i in old_ids
        }
    )
    # candidate-old restriction: a LITERAL isin pushes down nicely for
    # small sets, but planning a many-thousand-entry In expression costs
    # seconds — large sets restrict via a broadcast semi-join against
    # the (already checkpointed) candidate table instead, keeping the
    # sbucket partition pruning literal either way
    def _restrict(df):
        if len(old_ids) <= 512:
            return df.filter(F.col("doc_id").isin(old_ids))
        return df.join(
            F.broadcast(
                cand.select(F.col("old_id").alias("doc_id")).distinct()
            ),
            "doc_id",
            "leftsemi",
        )

    old_grams = _restrict(
        component_df(
            spark, cur, "grams", "doc_id bigint, gk bigint, sbucket int"
        ).filter(F.col("sbucket").isin(sbs))
    ).select(F.col("doc_id").alias("old_id"), "gk")
    old_sizes = _restrict(
        component_df(
            spark, cur, "sizes", "doc_id bigint, n bigint, sbucket int"
        ).filter(F.col("sbucket").isin(sbs))
    ).select(F.col("doc_id").alias("old_id"), F.col("n").alias("n_old"))
    # r16 (guide §3.1): every frame on the build side of these joins is
    # BATCH- or CANDIDATE-bounded by construction (bg = the ingest
    # batch's gram keys, cand = the prefix-theorem candidate pairs,
    # bsizes = one row per batch doc, old_sizes = one row per candidate
    # old doc) — never corpus-sized — so explicit broadcasts are
    # scale-safe and collapse the serving plan from SMJ exchanges on
    # every join to one streamed pass over the pruned grams/ scan plus
    # a single (new_id, old_id) aggregate exchange (14 AQE stage-jobs
    # -> ~6 measured at sf0.1).
    # ADMIT-BATCH CONTRACT (ADVICE r16): a hinted broadcast is honored
    # regardless of size (AQE never demotes hints), so the caller owns
    # keeping the admit batch driver-sized — gate in bounded batches
    # (the streaming modes' trigger batches are exactly that); a
    # corpus-sized "batch" belongs in dedup_containment_pairs, not here.
    inter = (
        old_grams
        .join(
            F.broadcast(bg.select(F.col("doc_id").alias("new_id"), "gk")),
            "gk",
        )
        .join(F.broadcast(cand), ["new_id", "old_id"], "leftsemi")
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    scored = (
        inter.join(
            F.broadcast(
                bsizes.select(F.col("doc_id").alias("new_id"), "n_new")
            ),
            "new_id",
        )
        .join(F.broadcast(old_sizes), "old_id")
        .select(
            F.col("new_id").alias("new_doc_id"),
            F.col("old_id").alias("dup_of"),
            F.round(F.col("inter") / F.col("n_new"), 4).alias(
                "cont_new_in_old"
            ),
            F.round(F.col("inter") / F.col("n_old"), 4).alias(
                "cont_old_in_new"
            ),
        )
    )
    return scored.filter(
        F.greatest("cont_new_in_old", "cont_old_in_new") >= threshold
    ).orderBy("new_doc_id", "dup_of")


def dedup_containment_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable containment-gate run (the `dedup_gate_against_
    index` fixture shape): every doc_id % 10 == 0 document re-keyed
    +1_000_000 plus a TRUNCATED variant (the doc's first 12 words,
    re-keyed +2_000_000) gated against the corpus index — each clone
    must surface its original at containment 1.0 both ways, and each
    long-enough truncation must surface the original in the
    new-in-old direction only (the pair a Jaccard gate misses).
    Read-only; repeated driver runs are stable."""
    d = load_table(spark, sf_dir, "documents")
    clones = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    truncs = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.array_join(
            F.slice(whitespace_tokens(F.col("text")), 1, 12), " "
        ).alias("text"),
    )
    return dedup_containment_gate_for(
        spark, sf_dir, clones.unionByName(truncs)
    )


def dedup_containment_gate_ingested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-checkable ADMIT→GATE lifecycle on its OWN tagged root
    (never shared with the read-only gate key — the graph "vac"
    discipline): batch A = every doc_id % 7 == 0 document re-keyed
    +3_000_000 is ADMITTED through ``update_containment_index`` (frozen
    dfs, stored prefix flags), then batch B = the same documents'
    12-word truncations re-keyed +4_000_000 is gated. Each long-enough
    truncation is contained in BOTH its original (dup_of = d) and the
    admitted clone (dup_of = 3_000_000 + d) — the second row class
    exists ONLY if the admit actually advanced the index, which is what
    this key verifies end-to-end. Replay-idempotent: a re-run detects
    the fully-admitted batch via one sbucket-pruned sizes probe and
    skips the commit (bounded version count), so repeated driver runs
    serve identical rows."""
    import os

    from .invindex import doc_bucket_expr

    tag = "ing"
    d = load_table(spark, sf_dir, "documents")
    sevens = d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    batch_a = sevens.select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    cur = build_containment_index(spark, sf_dir, tag)
    a_ids = batch_a.select("doc_id")
    sbs = sorted(
        r["b"]
        for r in a_ids.select(
            doc_bucket_expr(F.col("doc_id")).alias("b")
        ).distinct().collect()
    )
    from ..memo import component_df

    present = (
        component_df(
            spark, cur, "sizes", "doc_id bigint, n bigint, sbucket int"
        )
        .filter(F.col("sbucket").isin(sbs))
        .join(a_ids, "doc_id", "leftsemi")
        .count()
    )
    n_a = batch_a.count()
    if present == 0:
        update_containment_index(spark, sf_dir, batch_a, tag)
    elif present != n_a:
        raise ValueError(
            f"ingested-gate root in a mixed state: {present}/{n_a} of "
            f"the admit batch indexed"
        )
    batch_b = sevens.select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        F.array_join(
            F.slice(whitespace_tokens(F.col("text")), 1, 12), " "
        ).alias("text"),
    )
    return dedup_containment_gate_for(spark, sf_dir, batch_b, tag=tag)


def jaccard_pairs_blocked(
    docs: DataFrame, threshold: float = 0.2, block_cap: int = 4096
) -> DataFrame:
    """All-pairs word-set Jaccard >= threshold within (lang, len_band)
    blocks, with per-task memory BOUNDED by ``block_cap``.

    Within a block the all-pairs intersection is ONE integer matmul over
    the doc x vocab incidence matrix (``applyInPandas`` + numpy/BLAS)
    instead of a self-join evaluating array_intersect per pair — same
    shuffle (one pass keyed on the block), ~20x less CPU.

    A popular stratum at 100 TB would make that dense matrix OOM one
    executor, so blocks larger than ``block_cap`` docs are split by a
    deterministic secondary key (doc_id mod n_splits) and every unordered
    sub-block pair (lo, hi) becomes its own task: lo == hi verifies pairs
    within a sub-block, lo < hi verifies the cross pairs. Each doc is
    replicated n_splits times, every pair is examined in EXACTLY one task
    (the (min, max) of the two docs' sub keys), and each task holds at
    most 2 * block_cap docs. When a block fits the cap, n_splits == 1 and
    the plan is identical to the unsplit one.
    """
    import numpy as np
    import pandas as pd

    # Pre-filter slack: keep raw >= threshold - 6e-5 so every pair whose
    # ROUNDED jaccard reaches the threshold survives to the Spark filter.
    slack = threshold - 6e-5

    counts = docs.groupBy("lang", "len_band").agg(
        F.count(F.lit(1)).alias("_block_n")
    )
    n_splits = F.ceil(F.col("_block_n") / F.lit(block_cap)).cast("int")
    split = (
        docs.join(counts, ["lang", "len_band"])
        .withColumn("_splits", n_splits)
        .withColumn("sub", F.pmod(F.col("doc_id"), F.col("_splits")).cast("int"))
        .select(
            "doc_id",
            "lang",
            "len_band",
            "words",
            "sub",
            F.explode(F.sequence(F.lit(0), F.col("_splits") - 1)).alias("other"),
        )
        .select(
            "doc_id",
            "lang",
            "len_band",
            "words",
            "sub",
            F.least("sub", "other").alias("lo"),
            F.greatest("sub", "other").alias("hi"),
        )
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "jac_raw": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "jac_raw": "float64"}
        )
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return empty
        lens = pdf["words"].map(len).to_numpy()
        flat = np.concatenate([np.asarray(w, dtype=object) for w in pdf["words"]])
        codes, _ = pd.factorize(flat)
        x = np.zeros((n, codes.max() + 1), dtype=np.float32)
        x[np.repeat(np.arange(n), lens), codes] = 1.0
        inter = x @ x.T  # exact: integer counts < 2^24 in float32
        sizes = lens.astype(np.float64)
        union = sizes[:, None] + sizes[None, :] - inter
        jac = inter / union
        iu = np.triu_indices(n, 1)
        keep = jac[iu] >= slack
        if int(pdf["lo"].iat[0]) != int(pdf["hi"].iat[0]):
            # cross-split task: only pairs straddling the two sub-blocks
            sub = pdf["sub"].to_numpy()
            keep &= sub[iu[0]] != sub[iu[1]]
        return pd.DataFrame(
            {
                "doc_a": ids[iu[0][keep]],
                "doc_b": ids[iu[1][keep]],
                "jac_raw": jac[iu][keep],
            }
        )

    raw = split.groupBy("lang", "len_band", "lo", "hi").applyInPandas(
        block_pairs, "doc_a bigint, doc_b bigint, jac_raw double"
    )
    return raw.select(
        "doc_a",
        "doc_b",
        F.round(F.col("jac_raw"), 4).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 60-bit SimHash over word-BIGRAM hashes.

    bit_i(doc) = 1 iff sum over distinct bigrams of (+1 if bit_i(md5_long(g))
    else -1) > 0. 60 bits = the md5_long width; the signature stays < 2^60
    so int64 arithmetic never overflows under ANSI mode.

    Bigram features, not unigrams: the corpus vocabulary is small and
    heavily shared, so unigram signatures concentrate (measured: 19% of
    sf0.001 pairs shared a band; hamming<=3 passed 2.5% of all pairs).
    Bigrams have enough entropy to separate near-dups from background —
    measured candidate rate 0.03%, hamming<=3 rate 0.014%, with a clear
    hamming gap (near-dups <=5, background >=17).

    Computed in ONE ``mapInPandas`` pass (shingle -> md5 -> vectorized
    60-bit majority vote per doc) — narrow op, no explode, no shuffle;
    the same kernel-beats-wide-expression trade measured for MinHash
    (explode + 60 conditional sums benched 3.8x slower at sf0.1).
    ``_simhash_signatures_expr`` keeps the pure-JVM formulation;
    equality of the two is pinned in tests.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from ..sources.tables import fan_out

    # same single-row-group serialization as _minhash_wide: the md5-per-
    # bigram kernel is CPU-dense, so spread the scan before it (SCALE.md r6)
    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    shift = np.arange(SIMHASH_BITS, dtype=np.int64)

    def batches(it):
        for pdf in it:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ")
                k = max(len(words) - 1, 1)
                grams = {" ".join(words[i : i + 2]) for i in range(k)}
                h = np.fromiter(
                    (
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
                ones = ((h[:, None] >> shift) & 1).sum(axis=0)
                # signed sum = 2*ones - n; bit set iff sum > 0
                bits = (2 * ones - len(h) > 0).astype(np.int64)
                ids.append(doc_id)
                sigs.append(int((bits << shift).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "simhash": np.array(sigs, dtype=np.int64)}
            )

    return d.mapInPandas(batches, "doc_id bigint, simhash bigint")


def _simhash_signatures_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM formulation of ``simhash_signatures`` (explode bigrams ->
    60 conditional sums -> recompose). Kept as the no-Python-workers
    alternative; must stay value-identical to the Arrow kernel (tested)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", whitespace_tokens(F.col("text")).alias("w")
    )
    grams = d.select(
        "doc_id",
        F.explode(_shingles(F.col("w"), 2)).alias("g"),
    )
    hashed = grams.select("doc_id", md5_long(F.col("g")).alias("h"))
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


def _gram_block_pairs(slack: float):
    """Arrow-batched within-block all-pairs cosine kernel (shared by
    ``dedup_embedding_cosine`` and ``semdedup_prune``).

    One BLAS gram matrix per block — each vector crosses the Arrow boundary
    once, instead of once per pair through an interpreted per-element
    expression. Emits raw cosines above ``slack`` (a hair under the real
    threshold); the caller rounds Spark-side to 4 dp (HALF_UP, matching
    DuckDB round()) and applies the exact threshold on the rounded value.
    Requires ``vec_id`` and ``embedding`` columns in the block.
    """
    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_raw": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_raw": "float64"}
            )
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ m.T) / np.outer(norms, norms)
        iu = np.triu_indices(n, 1)
        keep = sims[iu] >= slack
        return pd.DataFrame(
            {
                "vec_a": ids[iu[0][keep]],
                "vec_b": ids[iu[1][keep]],
                "cos_raw": sims[iu][keep],
            }
        )

    return block_pairs


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold within label blocks.

    Blocking on the cluster label turns the O(n^2) similarity self-join into
    per-block problems (the IVF idea applied to dedup); at 100 TB the label
    comes from a cheap clustering pass and bounds each block's pair count.
    Within a block the all-pairs kernel is ``_gram_block_pairs``.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    raw = e.groupBy("label").applyInPandas(
        _gram_block_pairs(threshold - 6e-5),
        "vec_a bigint, vec_b bigint, cos_raw double",
    )
    return raw.select(
        "vec_a", "vec_b", F.round(F.col("cos_raw"), 4).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def semdedup_prune(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding space, then prune semantic near-duplicates WITHIN each
    cluster — pairwise cosine never crosses cluster boundaries, so the
    O(n^2) similarity problem becomes k independent O((n/k)^2) blocks.

    Deterministic keep-rule: a vector is pruned when a lower-vec_id vector
    in the SAME cluster has round(cosine, 4) >= threshold (the canonical
    copy of every near-dup group is its minimum vec_id). Output is one row
    per vector: (vec_id, cluster, keep) — integer columns only, fully
    oracle-checkable since ``cluster_kmeans`` is itself integer-exact.

    Scale shape: clustering is the broadcast-centroid Lloyd's pass of
    ``cluster_kmeans`` (at 100 TB, k is sized ~sqrt(n) so blocks stay
    small — SemDeDup's published runs use 50k clusters for 5B docs); the
    within-cluster kernel is the same one-Arrow-crossing BLAS gram matrix
    as ``dedup_embedding_cosine``; the final keep-flag is a broadcast
    anti-join of the (small) pruned-id set against the assignment.
    """
    from .ann import cluster_kmeans

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assign = cluster_kmeans(spark, sf_dir, k=k, iters=iters)
    v = assign.join(e, "vec_id")
    raw = v.groupBy("cluster").applyInPandas(
        _gram_block_pairs(threshold - 6e-5),
        "vec_a bigint, vec_b bigint, cos_raw double",
    )
    pruned = (
        raw.filter(F.round(F.col("cos_raw"), 4) >= threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return assign.join(F.broadcast(pruned.withColumn("p", F.lit(1))), "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.when(F.col("p").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


def dedup_connected_components(
    spark: SparkSession, sf_dir: str, max_iterations: int = 20
) -> DataFrame:
    """Duplicate CLUSTERS from the MinHash candidate edges: every doc gets
    the min doc_id of its connected component as cluster_id (that doc is
    the canonical copy to keep).

    Pregel-style iterative min-label propagation over the undirected edge
    list — the standard distributed CC (GraphX/GraphFrames use the same
    shape). Each round is one join + one aggregate (both shuffle on
    doc_id); rounds needed = component diameter, which for near-dup
    clusters is tiny (they are near-cliques). The driver loop only checks
    a scalar convergence count — no row data ever reaches the driver.

    Docs with no candidate edge are their own singleton cluster.
    """
    edges = dedup_minhash_pairs(spark, sf_dir)
    # Undirected: propagate labels both ways.
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    )
    sym = sym.localCheckpoint(eager=True)
    # Iterate ONLY over nodes that have at least one edge — duplicates are
    # rare by construction, so this is a tiny fraction of the corpus;
    # singleton docs join back in closed form at the end. At 100 TB this is
    # the difference between iterating on the corpus and on the dup graph.
    # Seed = the first propagation round computed directly from the edge
    # aggregate (min over self+neighbors, no join): near-dup clusters are
    # near-cliques, so most components converge in this seed and the loop
    # exits after one confirming round.
    # No eager checkpoint on the seed: it is one map-side-combined agg over
    # the (checkpointed) edge list, consumed exactly once by round 1's
    # join — a barrier here would only add a job. Rounds checkpoint their
    # OUTPUT, which is what breaks the iterative lineage.
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.first("src"), F.min("dst")).alias("cluster_id"))
        .select(F.col("src").alias("doc_id"), "cluster_id")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
                (F.coalesce("nbr_min", "cluster_id") < F.col("cluster_id"))
                .cast("int")
                .alias("changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.agg(F.sum("changed")).collect()[0][0] or 0
        labels = updated.select("doc_id", "cluster_id")
        if n_changed == 0:
            break
    d = load_table(spark, sf_dir, "documents")
    singletons = (
        d.select("doc_id")
        .join(labels.select(F.col("doc_id").alias("edge_doc")),
              F.col("doc_id") == F.col("edge_doc"), "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return labels.select("doc_id", "cluster_id").unionByName(singletons)


def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated Jaccard for LSH candidate pairs: fraction of the 16
    minhash permutations that agree — the unbiased MinHash estimator,
    computed WITHOUT touching the documents again.

    Pipeline: candidate pairs from the banded join (cheap), then one join
    against the wide signature row per side. At scale this is the
    verify-cheaply step between candidate generation and exact
    verification: 16 integer comparisons per pair instead of re-tokenizing
    two documents.
    """
    pairs = dedup_minhash_pairs(spark, sf_dir)
    wide = _minhash_wide_cached(spark, sf_dir)
    left = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"la{i}") for i in range(NUM_HASHES)],
    )
    right = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"lb{i}") for i in range(NUM_HASHES)],
    )
    joined = pairs.join(left, "doc_a").join(right, "doc_b")
    matches = None
    for i in range(NUM_HASHES):
        term = (F.col(f"la{i}") == F.col(f"lb{i}")).cast("int")
        matches = term if matches is None else matches + term
    return joined.select(
        "doc_a",
        "doc_b",
        F.round(matches / F.lit(float(NUM_HASHES)), 4).alias("est_jaccard"),
    )


# Session-scoped memo of the CHECKPOINTED simhash signature frame — the
# _minhash_wide_cached lifecycle applied to the simhash kernel (shared
# memo.session_memo, keyed by session + dataset fingerprint).
def _simhash_signatures_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..memo import session_memo

    return session_memo(
        spark,
        sf_dir,
        "simhash_signatures",
        lambda: simhash_signatures(spark, sf_dir).localCheckpoint(eager=True),
    )


def dedup_simhash_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: hamming distance <= max_hamming on the
    60-bit signature, candidates from the 4x15-bit band join.

    Each doc explodes into 4 (band, band_val) keys; candidates are the
    equi self-join on that key — the same bucketed shape as MinHash-LSH
    (shuffle keyed on a 2^15-bucket-per-band key, AQE splits hot
    buckets). Pigeonhole guarantees EXACT recall for hamming <= 3: at
    most 3 differing bits can dirty at most 3 of the 4 bands.
    bit_count(xor) verification stays in codegen on both engines.

    Signatures are MATERIALIZED once before the self-join (same reasoning
    as dedup_minhash_pairs: identical narrow subtrees are not shared
    across join sides, so the signature kernel would run once per side)
    and memoized per (session, sf_dir) like the minhash wide frame —
    encode-once/serve-many.
    """
    sig = _simhash_signatures_cached(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(SIMHASH_BAND_MASK))
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sig_a"),
        "band",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sig_b"),
        F.col("band").alias("band_r"),
        F.col("band_val").alias("band_val_r"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band_r"))
            & (F.col("band_val") == F.col("band_val_r"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: cluster with connected components
    over the MinHash candidate graph, then keep the HIGHEST-QUALITY
    member of each cluster (quality-ranked canonical selection — what a
    real pipeline keeps, rather than blindly taking min doc_id).

    Composition of the engine's own operators: ``dedup_connected_components``
    (Pregel min-label) |x| ``quality_score`` on doc_id, then one ranking
    window per cluster. The rank and the member count share the SAME
    cluster_id partitioning, so Catalyst reuses one shuffle for both
    window functions. Ranking keys are the ROUNDED quality (already
    oracle-stable) with doc_id tie-break — deterministic cross-engine.
    """
    from pyspark.sql.window import Window

    from .textops import quality_score

    cc = dedup_connected_components(spark, sf_dir)
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    wrank = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    wall = Window.partitionBy("cluster_id")
    return (
        cc.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(wrank))
        .withColumn("n_members", F.count(F.lit(1)).over(wall))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc"),
            "n_members",
            F.col("quality").alias("best_quality"),
        )
    )


def dedup_repeated_ngrams(
    spark: SparkSession, sf_dir: str, n: int = 8
) -> DataFrame:
    """Cross-document repeated n-gram analysis — the n-gram-granularity
    form of exact-substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499, which
    removes 50-token substrings occurring more than once; the reference
    has no analog — pure north-star surface). Per document: how many of
    its DISTINCT word n-grams also occur in at least one other document,
    i.e. the memorization-risk mass a substring-dedup pass would target.

    Returns (doc_id, n_ngrams, n_dup_ngrams, dup_per_million) where
    dup_per_million = round(n_dup/n_ngrams * 1e6) computed in EXACT
    integer arithmetic — ``(2*a*1e6 + b) div (2*b)`` is floor(a*1e6/b
    + 1/2) with no float division anywhere, so both engines produce the
    identical bigint (the knn_pq micro-unit discipline applied to a
    ratio; a float `round(a/b, 4)` would hit cross-engine .xxxx5 ties
    whenever b divides 2*10^4).

    Scale shape (100 TB): per-doc distinct n-grams come from the
    ``_shingles`` HOF over a PRE-PROJECTED split array (no shuffle);
    (doc_id, gram) pairs are distinct BY CONSTRUCTION (array_distinct),
    so the shared-gram detector is a plain count(*) >= 2 — a map-side
    combined hash aggregate on the gram key, NEVER count(DISTINCT)
    (which would carry doc_ids through the shuffle). The join back is an
    equi semi-shaped join on the same high-cardinality gram key (AQE
    splits hot boilerplate grams), then one balanced doc_id aggregate.
    Two shuffles total, both on high-cardinality keys.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    grams = d.select(
        "doc_id", F.explode(_shingles(F.col("w"), n)).alias("g")
    )
    shared = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = (
        grams.join(shared, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_ngrams"))
    )
    totals = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    a = F.coalesce(F.col("n_dup_ngrams"), F.lit(0)).cast("bigint")
    b = F.col("n_ngrams").cast("bigint")
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_ngrams").cast("int").alias("n_ngrams"),
            a.cast("int").alias("n_dup_ngrams"),
            F.expr(
                "(2 * coalesce(n_dup_ngrams, 0) * 1000000 + n_ngrams)"
                " div (2 * n_ngrams)"
            ).alias("dup_per_million"),
        )
    )


def dedup_substring_rewrite(
    spark: SparkSession, sf_dir: str, n: int = 8
) -> DataFrame:
    """Exact-substring deduplication as a REWRITE (Lee et al. 2021,
    arXiv:2107.06499 §3: remove every duplicated training substring,
    keeping one occurrence) — the surgical counterpart of
    ``dedup_repeated_ngrams``'s analysis-only view: that key measures
    the memorization-risk mass, this one actually cuts it out of the
    text. The reference has no analog (north-star surface).

    Semantics (deterministic, engine-exact):
    - token positions 1..m from the whitespace split (the house token
      discipline); windows are the m−n+1 positional n-grams (NOT
      per-doc-distinct — a doc self-repeating a span is a duplicate of
      itself, exactly the case Lee et al. call out);
    - a window OCCURRENCE is masked when its gram (md5 of the joined
      window) occurs ≥ 2 times in the corpus and the occurrence is not
      the gram's KEEPER — the md5-min occurrence key (location-blind
      md5 selection, the house discipline; the key embeds doc_id:pos so
      it is unique, with zero-padded doc/pos suffix making the string
      min total even across md5 ties);
    - a token is removed when ANY masked window covers it; the cleaned
      text is the kept tokens rejoined in order.

    Returns (doc_id, n_tokens, n_removed, clean_md5) — the content hash
    of the rewritten doc (the c4_line_filter discipline; emitting the
    full rewritten text would make the correctness hash dominated by
    one fat column).

    Scale shape (100 TB): windows explode map-side from the
    pre-projected split array; the duplicate detector is ONE hash
    aggregate on the gram key carrying (count, min(okey)) — map-side
    combined, never a window function over gram partitions (a hot
    boilerplate gram with 10⁶ occurrences stays one combined row, not
    a 10⁶-row sort partition); the mask join is an equi join back on
    the same key; position expansion is n rows per masked window; the
    final per-doc reassembly sorts each doc's own tokens inside one
    hash-aggregated array (sort_array over collect_list — no global
    sort). Three shuffles, all on high-cardinality keys.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    m = F.size(F.col("w"))
    wins = F.transform(
        F.sequence(F.lit(1), m - (n - 1)),
        lambda p: F.struct(
            p.alias("p"),
            F.md5(F.concat_ws(" ", F.slice(F.col("w"), p, n))).alias("gh"),
        ),
    )
    occ = (
        d.filter(m >= n)
        .select("doc_id", F.explode(wins).alias("o"))
        .select("doc_id", F.col("o.p").alias("p"), F.col("o.gh").alias("gh"))
        .withColumn(
            "okey",
            F.concat_ws(
                ":",
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("p").cast("string"),
                    )
                ),
                F.lpad(F.col("doc_id").cast("string"), 12, "0"),
                F.lpad(F.col("p").cast("string"), 6, "0"),
            ),
        )
    )
    stats = occ.groupBy("gh").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("okey").alias("keeper")
    )
    masked_pos = (
        occ.join(stats, "gh")
        .filter((F.col("cnt") >= 2) & (F.col("okey") != F.col("keeper")))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(n - 1))
            ).alias("q"),
        )
        .distinct()
    )
    toks = d.select(
        "doc_id", F.posexplode(F.col("w")).alias("q0", "tok")
    ).select("doc_id", (F.col("q0") + 1).alias("q"), "tok")
    kept = toks.join(masked_pos, ["doc_id", "q"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("q"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
            )
        ).alias("clean_md5"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    removed = masked_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_removed")
    )
    totals = d.select("doc_id", m.alias("n_tokens"))
    return (
        totals.join(clean, "doc_id", "left")
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("n_removed"), F.lit(0))
            .cast("int")
            .alias("n_removed"),
            # a fully-masked doc keeps zero tokens: hash of the empty
            # string, matching string_agg-absent COALESCE in the twin
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias(
                "clean_md5"
            ),
        )
    )


def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup reporting: the distribution of near-duplicate cluster sizes
    (how much of the corpus is singletons vs small clusters vs big
    boilerplate families) — the summary every dedup run publishes
    before anyone trusts its keep-list.

    Two map-side-combined aggregations over the connected-components
    output (cluster sizes, then size counts) — both shuffles carry one
    row per distinct key per partition; the CC labels themselves come
    from the established Pregel kernel (and its recursive-CTE oracle).
    """
    cc = dedup_connected_components(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


# --- persisted MinHash signature index (r9) -----------------------------
#
# The dedup analog of the RP/IVF/PQ serving story: at 100 TB you sign the
# corpus ONCE, keep the signatures + LSH band table on disk under the
# shared versioned-commit lifecycle (sources/versioning.py), and every
# ingest batch dedups AGAINST the index — never re-signing the corpus.

N_BAND_KBUCKETS = 32
# Gate verification floor: est Jaccard >= GATE_MIN_MATCHES/NUM_HASHES.
# Interpolated into the oracle SQL (shared-source-of-truth, ADVICE r8).
GATE_MIN_MATCHES = 8
MINHASH_BANDS_SCHEMA = "doc_id bigint, band_hash string, band int, kbucket int"
MINHASH_SIGS_SCHEMA = _WIDE_SCHEMA + ", sbucket int"

# compact_index component spec — shared by explicit compaction and the
# update auto-compaction hook (VERDICT r9 next #7).
MINHASH_COMPONENTS = [("bands", ["band", "kbucket"]), ("sigs", ["sbucket"])]


def band_kbucket_expr(band_hash: Column) -> Column:
    """Partition bucket for a band hash — the hash is ALREADY md5 hex,
    so its first 8 hex digits are the house md5-derived bucket key
    without a second hash."""
    return (
        F.conv(F.substring(band_hash, 1, 8), 16, 10).cast("bigint")
        % N_BAND_KBUCKETS
    ).cast("int")


def _minhash_band_cols(wide: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash, kbucket) from a wide signature frame —
    the banding projection shared by build, update, delete and the
    ingest gate (byte-identical band keys everywhere)."""
    hashed = wide.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{i}").cast("string")
                        for i in range(
                            j * ROWS_PER_BAND, (j + 1) * ROWS_PER_BAND
                        )
                    ],
                )
            ).alias(f"bh{j}")
            for j in range(NUM_BANDS)
        ],
    )
    stack_expr = "stack({n}, {args}) as (band, band_hash)".format(
        n=NUM_BANDS,
        args=", ".join(f"{j}, bh{j}" for j in range(NUM_BANDS)),
    )
    rows = hashed.select("doc_id", F.expr(stack_expr))
    return rows.select(
        "doc_id",
        "band_hash",
        F.col("band").cast("int").alias("band"),
        band_kbucket_expr(F.col("band_hash")).alias("kbucket"),
    )


def minhash_index_root(sf_dir: str) -> str:
    from ..memo import index_root

    return index_root(
        "minhash_index_v1", sf_dir, NUM_HASHES, NUM_BANDS, N_BAND_KBUCKETS
    )


def build_minhash_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the MinHash signature index and return the current
    version dir. Components: ``bands/band=*/kbucket=*/`` (doc_id,
    band_hash — the LSH candidate table; the probe's (band, kbucket)
    pairs are literal partition filters) and ``sigs/sbucket=*/`` (the
    wide 16-minhash rows the verification stage and the replace path's
    reverse derivation read). Atomic versioned commit, same lifecycle
    as the text/RP/IVF/PQ indexes."""
    import os
    import shutil

    from ..sources import versioning as vn

    root = minhash_index_root(sf_dir)
    cur = vn.current_dir(root)
    if cur is not None:
        return cur
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, ".__tmp_build__")
    shutil.rmtree(tmp, ignore_errors=True)
    wide = _minhash_wide_cached(spark, sf_dir)
    from .invindex import doc_bucket_expr

    # repartition BY THE PARTITION COLUMNS before the partitioned write
    # (the _compact_locked discipline): without it every signing task
    # writes a part file into every partition dir — measured 4,064
    # 1KB band files / 1,015 sig files at sf0.1, and the gate's probe
    # spent ~3s on file-open scheduling for a 40k-row table. One task
    # per partition dir ⇒ one file per dir (≤128 bands, ≤32 sigs).
    wide.select(
        "*", doc_bucket_expr(F.col("doc_id")).alias("sbucket")
    ).repartition(F.col("sbucket")).write.mode("overwrite").partitionBy(
        "sbucket"
    ).parquet(os.path.join(tmp, "sigs"))
    _minhash_band_cols(wide).repartition(
        F.col("band"), F.col("kbucket")
    ).write.mode("overwrite").partitionBy("band", "kbucket").parquet(
        os.path.join(tmp, "bands")
    )
    name = vn.next_version_name(root)
    try:
        vn.publish_version(root, tmp, name, expected=None)
    except vn.ConcurrentWriterError:
        # an interleaved builder won the race to the initial version —
        # theirs is equivalent (same corpus fingerprint in the root tag)
        return vn.current_dir(root)
    return os.path.join(root, name)


def update_minhash_index(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    auto_compact_threshold: int = 16,
) -> str:
    """Incremental signature maintenance with doc-level REPLACE —
    append-mostly (the r9 discipline): new doc_ids append their sig and
    band rows beside hardlinked partitions with zero reads of existing
    signature data; a re-submitted doc's stale band rows are re-derived
    from its STORED signature (banding is a pure function of the
    signature — ``sigs/`` doubles as the reverse map, pruned by the
    batch's literal sbucket set) and only those partitions rewrite.
    Atomic versioned commit; compaction via ``compact_minhash_index``.
    """
    import os

    from ..sources import versioning as vn
    from ..sources.tables import fan_out
    from .invindex import doc_bucket_expr

    cur = build_minhash_index(spark, sf_dir)
    root = os.path.dirname(cur)

    batch_src = new_docs.select("doc_id", "text").dropDuplicates(["doc_id"])
    batch_wide = minhash_wide_for(fan_out(batch_src)).localCheckpoint(
        eager=True
    )
    batch_ids = batch_wide.select("doc_id")
    sbuckets = sorted(
        r["b"]
        for r in batch_ids.select(
            doc_bucket_expr(F.col("doc_id")).alias("b")
        ).distinct().collect()
    )
    if not sbuckets:
        return cur
    old_sigs_aff = spark.read.schema(MINHASH_SIGS_SCHEMA).parquet(
        os.path.join(cur, "sigs")
    ).filter(F.col("sbucket").isin(sbuckets))
    resub = (
        old_sigs_aff.join(batch_ids, "doc_id", "leftsemi")
        .localCheckpoint(eager=True)
    )
    resub_ids = resub.select("doc_id")
    rw_pairs = {
        (r["band"], r["kbucket"])
        for r in _minhash_band_cols(resub.drop("sbucket"))
        .select("band", "kbucket")
        .distinct()
        .collect()
    }
    rw_sb = sorted(
        r["sbucket"] for r in resub.select("sbucket").distinct().collect()
    )

    band_writes = []
    if rw_pairs:
        from functools import reduce
        from operator import or_

        pred = reduce(
            or_,
            [
                (F.col("band") == b) & (F.col("kbucket") == k)
                for b, k in sorted(rw_pairs)
            ],
        )
        band_writes.append(
            spark.read.schema(MINHASH_BANDS_SCHEMA)
            .parquet(os.path.join(cur, "bands"))
            .filter(pred)
            .join(resub_ids, "doc_id", "left_anti")
            .select("doc_id", "band_hash", "band", "kbucket")
        )
    band_writes.append(_minhash_band_cols(batch_wide))
    sig_writes = []
    if rw_sb:
        sig_writes.append(
            spark.read.schema(MINHASH_SIGS_SCHEMA)
            .parquet(os.path.join(cur, "sigs"))
            .filter(F.col("sbucket").isin(rw_sb))
            .join(resub_ids, "doc_id", "left_anti")
        )
    sig_writes.append(
        batch_wide.select(
            "*", doc_bucket_expr(F.col("doc_id")).alias("sbucket")
        )
    )
    return vn.commit_version(
        spark,
        root,
        [
            vn.Component(
                "bands",
                ("band", "kbucket"),
                frozenset(f"band={b}/kbucket={k}" for b, k in rw_pairs),
                tuple(band_writes),
            ),
            vn.Component(
                "sigs",
                ("sbucket",),
                frozenset(f"sbucket={b}" for b in rw_sb),
                tuple(sig_writes),
            ),
        ],
        expected=os.path.basename(cur),
        compact=MINHASH_COMPONENTS,
        compact_threshold=auto_compact_threshold,
    )


def compact_minhash_index(
    spark: SparkSession, sf_dir: str, threshold: int = 4
) -> str:
    from ..sources import versioning as vn

    build_minhash_index(spark, sf_dir)
    return vn.compact_index(
        spark,
        minhash_index_root(sf_dir),
        MINHASH_COMPONENTS,
        threshold,
    )


def delete_from_minhash_index(
    spark: SparkSession,
    sf_dir: str,
    doc_ids: DataFrame,
    auto_compact_threshold: int = 16,
) -> str:
    """Targeted document deletion from the MinHash signature index —
    completing the delete family (text/RP/IVF/PQ/minhash all deletable;
    the retraction half of the reference's upsert, indexing_agent.py:
    332-361). O(deleted docs + their partitions): victims' stale band
    rows are re-derived from their STORED signatures (banding is a pure
    function of the signature, so ``sigs/`` doubles as the reverse map,
    pruned by the literal sbucket set) and exactly those (band, kbucket)
    partitions rewrite with an anti-join; atomic CAS-checked versioned
    commit via the shared kernel. Deleting an absent doc_id is a no-op.
    Returns the current version dir."""
    import os

    from ..sources import versioning as vn
    from .invindex import doc_bucket_expr

    cur = build_minhash_index(spark, sf_dir)
    root = os.path.dirname(cur)

    ids = doc_ids.select("doc_id").dropDuplicates(["doc_id"])
    sbuckets = sorted(
        r["b"]
        for r in ids.select(doc_bucket_expr(F.col("doc_id")).alias("b"))
        .distinct()
        .collect()
    )
    if not sbuckets:
        return cur
    victims = (
        spark.read.schema(MINHASH_SIGS_SCHEMA)
        .parquet(os.path.join(cur, "sigs"))
        .filter(F.col("sbucket").isin(sbuckets))
        .join(ids, "doc_id", "leftsemi")
        .localCheckpoint(eager=True)
    )
    victim_ids = victims.select("doc_id")
    rw_sb = sorted(
        r["sbucket"] for r in victims.select("sbucket").distinct().collect()
    )
    if not rw_sb:
        return cur
    rw_pairs = {
        (r["band"], r["kbucket"])
        for r in _minhash_band_cols(victims.drop("sbucket"))
        .select("band", "kbucket")
        .distinct()
        .collect()
    }

    band_writes = []
    if rw_pairs:
        from functools import reduce
        from operator import or_

        pred = reduce(
            or_,
            [
                (F.col("band") == b) & (F.col("kbucket") == k)
                for b, k in sorted(rw_pairs)
            ],
        )
        band_writes.append(
            spark.read.schema(MINHASH_BANDS_SCHEMA)
            .parquet(os.path.join(cur, "bands"))
            .filter(pred)
            .join(victim_ids, "doc_id", "left_anti")
            .select("doc_id", "band_hash", "band", "kbucket")
        )
    return vn.commit_version(
        spark,
        root,
        [
            vn.Component(
                "bands",
                ("band", "kbucket"),
                frozenset(f"band={b}/kbucket={k}" for b, k in rw_pairs),
                tuple(band_writes),
            ),
            vn.Component(
                "sigs",
                ("sbucket",),
                frozenset(f"sbucket={b}" for b in rw_sb),
                (
                    spark.read.schema(MINHASH_SIGS_SCHEMA)
                    .parquet(os.path.join(cur, "sigs"))
                    .filter(F.col("sbucket").isin(rw_sb))
                    .join(victim_ids, "doc_id", "left_anti"),
                ),
            ),
        ],
        expected=os.path.basename(cur),
        compact=MINHASH_COMPONENTS,
        compact_threshold=auto_compact_threshold,
    )


def dedup_gate_for(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    est_threshold_num: int = GATE_MIN_MATCHES,
) -> DataFrame:
    """THE ingest-time near-dup gate: which documents of a NEW batch are
    near-duplicates of anything already in the indexed corpus? The
    production question every crawl/ingest pipeline asks before
    admitting data — answered ENTIRELY from the persisted index:

    1. the batch is signed by the shared kernel (never the corpus);
    2. LSH candidates come from the band table, statically pruned to
       the batch's literal (band, kbucket) pairs (≤ NUM_BANDS *
       N_BAND_KBUCKETS = 128 partitions exist — the RP probe contract);
    3. verification compares the 16 stored minhash positions of each
       candidate pair — ``matches/16`` is the unbiased Jaccard estimate
       (Broder 1997), computed wide-row to wide-row with NO corpus or
       shingle reads; pairs with ``2*matches >= est_threshold_num*2``
       — i.e. est >= est_threshold_num/16 — survive.

    Returns (new_doc_id, dup_of, matches, est_sim) — est_sim is exact
    dyadic (k/16) so the 4-dp round is tie-free cross-engine.
    """
    import os

    from ..sources.tables import fan_out

    cur = build_minhash_index(spark, sf_dir)
    # The gate's in-function actions run with AQE OFF (restored after):
    # the signing checkpoint and the <=128-group pair-count aggregate
    # are tiny, fully hand-planned statements, and AQE's per-exchange
    # stage materialization turns each into 2-3 scheduler round-trips —
    # measured 6 jobs -> 2 for this prologue at identical results. The
    # RETURNED serving query is untouched (the caller executes it under
    # its own session conf; its broadcasts are explicit and its pruning
    # literal, so it never depended on AQE either). This is the r12
    # latency fix for the registry's slowest key — scheduler-bound, not
    # data-bound (VERDICT r11 next #5).
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        batch_wide = minhash_wide_for(
            fan_out(new_docs.select("doc_id", "text").dropDuplicates(["doc_id"]))
        ).localCheckpoint(eager=True)
        batch_bands = _minhash_band_cols(batch_wide)
    # ONE auxiliary job between signing and serving (VERDICT r10 next
    # #8 — the r10 shape still ran a count job AND, for small batches, a
    # distinct-pairs job): the per-(band, kbucket) counts of the
    # checkpointed batch bands answer emptiness, probe breadth, AND the
    # static-pruning pair set together. The aggregate map-side-combines
    # n x NUM_BANDS rows into <= NUM_BANDS x N_BAND_KBUCKETS = 128
    # groups — the same single pass the old count already paid, so bulk
    # batches lose nothing and small batches save a whole job. Pruning
    # now keys on the EXACT touched-partition set rather than the old
    # row-count proxy, so a bulk batch of near-identical docs (few
    # touched buckets) prunes too.
        breadth_cap = (NUM_BANDS * N_BAND_KBUCKETS) // 2
        pair_counts = batch_bands.groupBy("band", "kbucket").count().collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    if not pair_counts:
        return spark.createDataFrame(
            [], "new_doc_id bigint, dup_of bigint, matches bigint, est_sim double"
        )
    from ..memo import component_df

    idx_bands = component_df(spark, cur, "bands", MINHASH_BANDS_SCHEMA)
    # Static pruning pays only while the probe is NARROW: a batch
    # touching few of the 128 (band, kbucket) partitions skips the rest
    # with a literal predicate; a diverse batch covers most partitions,
    # where a 100-clause filter costs more than the full (narrow,
    # n x NUM_BANDS-row) table scan it no longer avoids — the
    # multiprobe-breadth trade, applied here.
    if len(pair_counts) <= breadth_cap:
        from functools import reduce
        from operator import or_

        probe_pairs = sorted((r["band"], r["kbucket"]) for r in pair_counts)
        pred = reduce(
            or_,
            [
                (F.col("band") == b) & (F.col("kbucket") == k)
                for b, k in probe_pairs
            ],
        )
        idx_bands = idx_bands.filter(pred)
    # The batch side BROADCASTS (explicitly — VERDICT r9: relying on AQE
    # here meant a planner miss at 10^10 docs would shuffle the full
    # band/sigs stores): batch bands are n x NUM_BANDS rows, so the
    # pruned index scan streams map-side with no Exchange.
    cand = (
        F.broadcast(
            batch_bands.select(
                F.col("doc_id").alias("new_doc_id"),
                "band",
                "kbucket",
                "band_hash",
            )
        )
        .join(idx_bands, ["band", "kbucket", "band_hash"])
        .select("new_doc_id", F.col("doc_id").alias("dup_of"))
        .distinct()
    )
    idx_sigs = component_df(spark, cur, "sigs", MINHASH_SIGS_SCHEMA)
    l = batch_wide.select(
        F.col("doc_id").alias("new_doc_id"),
        *[F.col(f"m{i}").alias(f"l{i}") for i in range(NUM_HASHES)],
    )
    r = idx_sigs.select(
        F.col("doc_id").alias("dup_of"),
        *[F.col(f"m{i}").alias(f"r{i}") for i in range(NUM_HASHES)],
    )
    matches = None
    for i in range(NUM_HASHES):
        eq = F.when(F.col(f"l{i}") == F.col(f"r{i}"), 1).otherwise(0)
        matches = eq if matches is None else matches + eq
    # verification: the (candidate x batch-signature) side broadcasts
    # EXPLICITLY, so the corpus-scale 16-int sigs store joins map-side
    # and is never shuffle-exchanged (VERDICT r9 next #6; plan-pinned in
    # tests/test_plans.py) -- an AQE miss here would shuffle the full
    # sigs table at 10^10 docs.
    return (
        F.broadcast(cand.join(F.broadcast(l), "new_doc_id"))
        .join(r, "dup_of")
        .select(
            "new_doc_id",
            "dup_of",
            matches.cast("bigint").alias("matches"),
        )
        .filter(F.col("matches") >= est_threshold_num)
        .select(
            "new_doc_id",
            "dup_of",
            "matches",
            F.round(F.col("matches") / F.lit(float(NUM_HASHES)), 4).alias(
                "est_sim"
            ),
        )
    )


def intra_batch_dup_decisions(
    spark: SparkSession,
    new_docs: DataFrame,
    est_threshold_num: int = GATE_MIN_MATCHES,
) -> DataFrame:
    """WITHIN-batch near-dup decisions — the optional second arm of the
    streaming ingest gate (VERDICT r9 next #8): among the documents of
    ONE batch, every verified near-dup pair keeps ONE canonical copy and
    rejects the other. Returns (new_doc_id, dup_of, matches, est_sim)
    where new_doc_id is the REJECTED doc and dup_of its canonical twin —
    the dedup_gate_for row shape, so the caller unions the two arms into
    one audit trail.

    Canonical order is (md5(doc_id), doc_id) — a total order, so a
    clique of mutually-duplicate docs admits exactly its md5-min member.
    A doc is rejected iff it has ANY smaller-keyed verified twin, so
    chains (a~b, b~c, a!~c) reject both b and c — the coarse ingest-time
    contract; compaction-time ``dedup_connected_components`` remains the
    exact clustering. Fully deterministic, so at-least-once replays
    decide identically (the stream_gated_ingest recovery requirement).

    Same arithmetic as ``dedup_gate_for``: the shared signing kernel,
    LSH candidates from a band-table self-join (never all-pairs), and
    16-stored-position verification (Broder estimate, dyadic-exact).
    """
    from ..sources.tables import fan_out

    # AQE-scoped signing prologue — the dedup_gate_for discipline
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        batch_wide = minhash_wide_for(
            fan_out(new_docs.select("doc_id", "text").dropDuplicates(["doc_id"]))
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    bands = _minhash_band_cols(batch_wide)
    a = bands.select(
        F.col("doc_id").alias("new_doc_id"), "band", "kbucket", "band_hash"
    )
    b = bands.select(
        F.col("doc_id").alias("dup_of"), "band", "kbucket", "band_hash"
    )
    amd = F.md5(F.col("new_doc_id").cast("string"))
    bmd = F.md5(F.col("dup_of").cast("string"))
    cand = (
        a.join(b, ["band", "kbucket", "band_hash"])
        .filter(
            (amd > bmd)
            | ((amd == bmd) & (F.col("new_doc_id") > F.col("dup_of")))
        )
        .select("new_doc_id", "dup_of")
        .distinct()
    )
    l = batch_wide.select(
        F.col("doc_id").alias("new_doc_id"),
        *[F.col(f"m{i}").alias(f"l{i}") for i in range(NUM_HASHES)],
    )
    r = batch_wide.select(
        F.col("doc_id").alias("dup_of"),
        *[F.col(f"m{i}").alias(f"r{i}") for i in range(NUM_HASHES)],
    )
    matches = None
    for i in range(NUM_HASHES):
        eq = F.when(F.col(f"l{i}") == F.col(f"r{i}"), 1).otherwise(0)
        matches = eq if matches is None else matches + eq
    return (
        cand.join(l, "new_doc_id")
        .join(r, "dup_of")
        .select(
            "new_doc_id",
            "dup_of",
            matches.cast("bigint").alias("matches"),
        )
        .filter(F.col("matches") >= est_threshold_num)
        .select(
            "new_doc_id",
            "dup_of",
            "matches",
            F.round(F.col("matches") / F.lit(float(NUM_HASHES)), 4).alias(
                "est_sim"
            ),
        )
    )


def dedup_gate_against_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable gate run: a deterministic clone batch (every
    doc_id % 10 == 0, re-keyed +1_000_000) gated against the corpus
    index — each clone must surface its original (matches = 16) plus
    any corpus near-dups sharing a band. Read-only (the index is never
    mutated), so repeated driver runs are stable."""
    d = load_table(spark, sf_dir, "documents")
    clones = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return dedup_gate_for(spark, sf_dir, clones)


def dedup_gate_intra_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable WITHIN-batch gate run (the optional second arm
    of the streaming ingest gate, VERDICT r9 next #8): a deterministic
    batch holding every doc_id % 10 == 0 document TWICE — original key
    and a +1_000_000 clone — so each pair is an exact within-batch dup
    (matches = 16) and the md5-canonical order decides which copy is
    rejected. Near-dup pairs among the originals themselves surface
    too. Pure function of the corpus (no index read or mutation), so
    repeated driver runs are stable and the DuckDB oracle replays the
    identical md5/minhash arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    ten = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    batch = ten.unionByName(
        ten.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return intra_batch_dup_decisions(spark, batch)


def fsck_containment_index(
    spark: SparkSession, sf_dir: str, tag: str = ""
) -> list:
    """Semantic integrity check for the containment shingle index: the
    generic versioned-root checks plus the invariants the gate's
    two-direction candidate theorem and the ADMIT path's doc-level
    replace rely on — (post rows) ≡ (grams rows) as (doc, gk) sets,
    sizes ≡ per-doc distinct gram counts, and every doc's stored
    prefix flag count EXACTLY n − ⌈t·n⌉ + 1 (a short prefix breaks
    old-contained-in-new completeness; a long one only fattens
    candidates, but either means a write-path bug). Returns
    (check, ok, detail) tuples; never raises."""
    import os

    from ..sources import versioning as vn

    cur = build_containment_index(spark, sf_dir, tag)
    root = os.path.dirname(cur)
    out = vn.fsck_index(
        spark,
        root,
        [
            ("post", ["gbucket"], "gk bigint, doc_id bigint, in_prefix boolean, gbucket int"),
            ("dfs", ["gbucket"], "gk bigint, df bigint, gbucket int"),
            ("grams", ["sbucket"], "doc_id bigint, gk bigint, sbucket int"),
            ("sizes", ["sbucket"], "doc_id bigint, n bigint, sbucket int"),
        ],
    )
    try:
        post = spark.read.schema(
            "gk bigint, doc_id bigint, in_prefix boolean, gbucket int"
        ).parquet(os.path.join(cur, "post"))
        grams = spark.read.schema(
            "doc_id bigint, gk bigint, sbucket int"
        ).parquet(os.path.join(cur, "grams"))
        sizes = spark.read.schema(
            "doc_id bigint, n bigint, sbucket int"
        ).parquet(os.path.join(cur, "sizes"))
        pg = post.select("doc_id", "gk")
        gg = grams.select("doc_id", "gk")
        only_p = pg.join(gg, ["doc_id", "gk"], "left_anti").count()
        only_g = gg.join(pg, ["doc_id", "gk"], "left_anti").count()
        out.append(
            (
                "post_grams_same_pairs",
                only_p == 0 and only_g == 0,
                f"post_only={only_p} grams_only={only_g}",
            )
        )
        sz_bad = (
            grams.groupBy("doc_id")
            .agg(F.countDistinct("gk").alias("g_n"))
            .join(sizes.select("doc_id", "n"), "doc_id", "full")
            .filter(
                F.col("g_n").isNull()
                | F.col("n").isNull()
                | (F.col("g_n") != F.col("n"))
            )
            .count()
        )
        out.append(("sizes_match_gram_counts", sz_bad == 0, f"bad={sz_bad}"))
        # ADVICE r15 #2: join FROM sizes (left) — a doc with ZERO
        # in_prefix rows (the worst completeness break this check
        # exists for) is absent from the flagged side and must read as
        # flagged = 0, not silently drop out of an inner join
        pf_bad = (
            sizes.select("doc_id", "n")
            .join(
                post.filter(F.col("in_prefix"))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("flagged")),
                "doc_id",
                "left",
            )
            .filter(
                F.coalesce(F.col("flagged"), F.lit(0))
                != ppjoin_prefix_len(F.col("n"), CONTAIN_THRESHOLD)
            )
            .count()
        )
        out.append(
            ("prefix_flags_exact_bound", pf_bad == 0, f"bad_docs={pf_bad}")
        )
        # drift advisory (VERDICT r15 next #3 — the fsck_ivf_index
        # centroid_drift discipline: a drifted index is not corrupt,
        # the row's detail says what to run)
        m = containment_drift_metrics(spark, sf_dir, tag)
        if m["drifted"] is None:
            out.append(
                ("prefix_drift", True, "no build_stats.json (legacy build)")
            )
        else:
            out.append(
                (
                    "prefix_drift",
                    not m["drifted"],
                    f"mass_growth={m['mass_growth'] and round(m['mass_growth'], 3)} "
                    f"fanout_growth={m['fanout_growth'] and round(m['fanout_growth'], 3)}"
                    + (
                        " — run rebuild_containment_index"
                        if m["drifted"]
                        else ""
                    ),
                )
            )
    except Exception as ex:  # noqa: BLE001 — diagnose, don't die
        out.append(("semantic_checks", False, repr(ex)[:200]))
    return out


def fsck_minhash_index(spark: SparkSession, sf_dir: str) -> list:
    """Semantic integrity check for the MinHash signature index: the
    generic versioned-root checks plus the band/signature consistency
    the gate's candidate and verification stages rely on. Returns
    (check, ok, detail) tuples; never raises."""
    import os

    from ..sources import versioning as vn

    cur = build_minhash_index(spark, sf_dir)
    root = os.path.dirname(cur)
    out = vn.fsck_index(
        spark,
        root,
        [
            ("bands", ["band", "kbucket"], MINHASH_BANDS_SCHEMA),
            ("sigs", ["sbucket"], MINHASH_SIGS_SCHEMA),
        ],
    )
    try:
        bands = spark.read.schema(MINHASH_BANDS_SCHEMA).parquet(
            os.path.join(cur, "bands")
        )
        sigs = spark.read.schema(MINHASH_SIGS_SCHEMA).parquet(
            os.path.join(cur, "sigs")
        )
        only_b = bands.select("doc_id").distinct().join(
            sigs.select("doc_id"), "doc_id", "left_anti"
        ).count()
        only_s = sigs.select("doc_id").join(
            bands.select("doc_id").distinct(), "doc_id", "left_anti"
        ).count()
        out.append(
            (
                "doc_sets_consistent",
                only_b == 0 and only_s == 0,
                f"bands_only={only_b} sigs_only={only_s}",
            )
        )
        bad_n = (
            bands.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") != NUM_BANDS)
            .count()
        )
        out.append(
            ("bands_per_doc_exact", bad_n == 0, f"docs_with_wrong_count={bad_n}")
        )
    except Exception as ex:  # noqa: BLE001
        out.append(("semantic_checks", False, type(ex).__name__))
    return out


def fsck_gated_pair(spark: SparkSession, sf_dir: str) -> list:
    """Cross-index consistency check for the gated-ingest pair: the
    MinHash signature index and the lexical text index are maintained
    in lockstep by ``stream_gated_ingest`` (every admitted doc upserts
    into BOTH), so their doc sets must agree — the r9-ADVICE divergence
    scenario (a crash between the two updates replaying into
    self-rejection) made permanent drift a real failure mode; this is
    its detector. Returns (check, ok, detail); never raises."""
    import os

    from .invindex import DOCS_SCHEMA, build_text_index

    cur_mh = build_minhash_index(spark, sf_dir)
    cur_tx = build_text_index(spark, sf_dir)
    out = []
    try:
        sig_docs = (
            spark.read.schema(MINHASH_SIGS_SCHEMA)
            .parquet(os.path.join(cur_mh, "sigs"))
            .select("doc_id")
        )
        txt_docs = (
            spark.read.schema(DOCS_SCHEMA)
            .parquet(os.path.join(cur_tx, "docs"))
            .select("doc_id")
        )
        only_t = txt_docs.join(sig_docs, "doc_id", "left_anti").count()
        # a doc signed but not text-indexed is BENIGN only when its text
        # tokenizes to zero terms (such docs legitimately index nowhere
        # in the lexical index while still carrying a signature) —
        # classified against the corpus; everything else is drift.
        from .textops import doc_term_counts

        docs_src = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        termed = doc_term_counts(docs_src).select("doc_id").distinct()
        zero_term = docs_src.select("doc_id").join(termed, "doc_id", "left_anti")
        mh_only = sig_docs.join(txt_docs, "doc_id", "left_anti")
        benign = mh_only.join(zero_term, "doc_id", "leftsemi").count()
        drift_m = mh_only.count() - benign
        out.append(
            (
                "doc_sets_in_lockstep",
                only_t == 0 and drift_m == 0,
                f"minhash_only_drift={drift_m} (zero_term_benign={benign})"
                f" text_only={only_t}",
            )
        )
    except Exception as ex:  # noqa: BLE001
        out.append(("cross_index_check", False, type(ex).__name__))
    return out
