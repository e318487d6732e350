"""Engine-owned Bloom runtime filter — the explicit form of Spark's
injected runtime filters.

At 100 TB the classic fact⋈dim plan ships every fact row that survives
pushed-down predicates into the join shuffle. Spark's optimizer can
inject a runtime Bloom filter (``spark.sql.optimizer.runtime.bloomFilter
.enabled``) that pre-filters the fact scan by the dim side's join keys;
this module engineers that pattern EXPLICITLY with an md5-derived filter
so it is deterministic, engine-owned, and oracle-checkable (the optimizer
version is opaque and version-dependent; reference repo has no analog —
north-star surface).

The critical scale property: the driver-side transfer is bounded by the
SKETCH size, never the dim size. The build aggregates the DISTINCT bit
positions set by the dim keys — at most BLOOM_BITS rows (1 KiB of filter
state) regardless of whether the dim has 10^3 or 10^9 keys — and the
probe embeds the packed filter as a 128-word bigint literal tested with
pure shift/mask expressions inside whole-stage codegen. Bloom guarantees
NO false negatives, so the exact join downstream of the pre-filter
removes the (bounded-rate) false positives and the result equals the
unfiltered join — which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

BLOOM_BITS = 8192  # 1 KiB filter
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 4


# Universal-hash constants for the BLOOM_HASHES positions: distinct odd
# multipliers mod the minhash Mersenne prime. Integer-only (no md5/string
# ops in the probe's per-row path — measured 3x faster than an md5-slice
# derivation at sf0.1): build and probe share this exact function, and
# the ORACLE never replays positions (it checks the final join result,
# which the no-false-negative property makes sizing-independent), so
# cross-engine reproducibility of the positions themselves is not needed.
_BLOOM_P = 2147483647
_BLOOM_A = [1103515245, 1234567891, 987654321, 805306457]
_BLOOM_B = [12345, 67891, 24680, 13579]


def _bloom_positions(key: Column) -> list[Column]:
    """The BLOOM_HASHES bit positions for a bigint key:
    ((a_j * key + b_j) mod P) mod BLOOM_BITS — pure bigint arithmetic
    (products < 2^62, ANSI-safe), whole-stage codegen end-to-end.
    ``pmod`` (not ``%``, which keeps the dividend's sign) so NEGATIVE
    keys land in [0, BLOOM_BITS) too — with ``%`` a negative key would
    set bits via Python wrap-around indexing at build time but probe a
    DIFFERENT word (int truncation / element_at on a negative index),
    silently breaking the no-false-negative guarantee (review r7)."""
    k = F.pmod(key.cast("bigint"), F.lit(_BLOOM_P))
    return [
        F.pmod(
            F.lit(_BLOOM_A[j]) * k + F.lit(_BLOOM_B[j]), F.lit(_BLOOM_P)
        )
        % F.lit(BLOOM_BITS)
        for j in range(BLOOM_HASHES)
    ]


def build_bloom_words(dim_keys: DataFrame, key_col: str) -> list[int]:
    """Aggregate the dim side's distinct bit positions (<= BLOOM_BITS rows
    by construction — the collect is bounded by sketch size, not dim
    size) and pack them into BLOOM_WORDS signed int64 words."""
    pos_col = F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("p")
    positions = [
        r["p"] for r in dim_keys.select(pos_col).distinct().collect()
    ]
    words = [0] * BLOOM_WORDS
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed int64 (Spark bigint literals are signed)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(words: list[int], key: Column) -> Column:
    """AND of the BLOOM_HASHES bit tests against the packed literal —
    pure bit arithmetic (``getbit`` on the selected word), whole-stage-
    codegen friendly; ``getbit`` indexes two's-complement bits so the
    sign bit of a saturated word tests correctly.

    The packed words ship as ``F.lit(list)`` — a TRUE array Literal.
    (An ``array(...)`` expression of 128 literals is a CreateArray that
    re-materializes the array PER ROW PER TEST — measured ~0.8 s of pure
    allocation at sf0.1; the literal form made the whole probe
    plain-semi-join-fast. The array-literal sibling of the HOF-lambda
    projection rule, SCALE.md r6.)"""
    word_lit = F.lit([int(w) for w in words])
    pred = None
    for pos in _bloom_positions(key):
        word = F.element_at(word_lit, (pos / 64).cast("int") + 1)
        t = F.getbit(word, pos % 64) == 1
        pred = t if pred is None else (pred & t)
    return pred


def bloom_filter_orders(
    spark: SparkSession, sf_dir: str, segment: str = "BUILDING"
) -> DataFrame:
    """Revenue of orders placed by customers of one market segment,
    computed through an explicit Bloom runtime filter: the segment's
    customer keys build a 1 KiB filter; the orders scan keeps only rows
    whose o_custkey MIGHT be in the segment (pure codegen'd bit tests —
    at scale this is what cuts the fact->shuffle volume to ~segment
    selectivity + the false-positive rate); the exact semi join then
    removes false positives, so the result EQUALS the plain semi join —
    the oracle's formulation.

    With |keys|*BLOOM_HASHES ~ 6k of 8192 bits set at sf0.1 the filter
    saturates toward all-pass locally; the plumbing, not the local
    selectivity, is the point (a production deployment sizes BLOOM_BITS
    to ~10 bits/key for ~1% fp). The no-false-negative guarantee is
    what makes correctness independent of sizing, pinned by the oracle
    hash-match and tests/test_pipeline_ops.py.
    """
    from ..memo import session_memo

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    # build-once/serve-many: the 1 KiB filter is a property of the dim
    # side, not of the query — repeated probes reuse it (at 100 TB the
    # built filter ships in the plan like any runtime filter)
    words = session_memo(
        spark,
        sf_dir,
        "bloom_words",
        lambda: build_bloom_words(dim, "c_custkey"),
        segment,
    )
    prefiltered = o.filter(bloom_might_contain(words, F.col("o_custkey")))
    return (
        prefiltered.join(
            F.broadcast(dim),
            prefiltered["o_custkey"] == dim["c_custkey"],
            "left_semi",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
