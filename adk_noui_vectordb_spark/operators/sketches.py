"""Mergeable sketch operators — approximate distinct counts at 100 TB.

Exact count-distinct over a 100 TB fact table shuffles every distinct key;
a DataSketches HLL sketch is a few KB per group, built with map-side
partial aggregation and merged associatively — the standard way to keep
cardinality dashboards cheap. Spark 4 ships the DataSketches HLL family
(`hll_sketch_agg`, `hll_union_agg`, `hll_sketch_estimate`) JVM-side, so
the whole pipeline stays in codegen with no Python in the row path.

Driver contract is rows-only: an approximate estimator cannot hash-match
an exact SQL oracle by construction. The accuracy bound (relative error
vs exact count-distinct) is pinned in tests/test_sketches.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type PLUS the global union —
    computed by MERGING the per-group sketches, not re-scanning events
    (the mergeability that makes sketches work at scale: the fact table
    is read once, the union runs over five ~KB sketch blobs).

    Oracle-checked: a DataSketches HLL in coupon (list/set) mode is an
    EXACT distinct-hash set, and the rounded estimator returns exactly n
    while the coupon-collision correction is < 0.5 (n ≲ 10^4 at
    lgConfigK 21) — far above the test-SF cardinalities (150/1500), so
    the driver hash-matches exact COUNT(DISTINCT). At production
    cardinalities the sketch transitions to dense HLL and degrades to
    its published ~0.4% error at fixed (1.5 MB) size — the scale
    contract; the error bound is pinned in tests/test_sketches.py."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 21)").alias("sk")
    )
    per_est = per.select(
        "event_type",
        F.expr("hll_sketch_estimate(sk)").alias("approx_users"),
    )
    union_est = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_users")
    ).select(F.lit("__all__").alias("event_type"), "approx_users")
    return per_est.unionByName(union_est)


def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per event_type via Spark's
    mergeable quantile sketch (`approx_percentile`, Greenwald-Khanna with
    accuracy 100000 → rank error ≤ 1e-5) — the tail-latency/quantile
    dashboard primitive at 100 TB, where exact percentiles would sort or
    multi-pass the fact table. Map-side partial sketches merge
    associatively like the HLL path; one scan, one small shuffle of
    sketch state per group.

    Oracle-checked: a GK sketch whose accuracy exceeds the group row count
    retains EVERY value, so at the test scale factors (≤ ~20k rows/group
    at sf0.1) the result is exact discrete percentiles — identical to
    DuckDB ``quantile_disc``. Past 100k rows/group the sketch degrades
    gracefully to its 1e-5 rank-error bound with fixed memory, which is
    the scale contract; the bound itself is pinned in
    tests/test_sketches.py.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, array(0.5, 0.95, 0.99), 100000)"
        ).alias("q")
    ).select(
        "event_type",
        F.round(F.col("q")[0], 2).alias("p50"),
        F.round(F.col("q")[1], 2).alias("p95"),
        F.round(F.col("q")[2], 2).alias("p99"),
    )


def sketch_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix from MERGED sketches: for every unordered
    event-type pair, the union / intersection cardinality of their user
    sets and the Jaccard similarity — computed entirely from the per-type
    HLL sketches via inclusion-exclusion
    (``|A ∩ B| = est(A) + est(B) - est(A ∪ B)``), never by re-scanning
    or joining the fact table. This is why mergeable sketches matter at
    100 TB: the events table is read ONCE into #types sketch blobs, and
    every pairwise question afterwards is arithmetic over a few KB
    (DataSketches set-operation practice; Dasgupta et al., "Theta
    sketches" framing).

    Scale shape: one scan + one map-side-combined groupBy builds the
    per-type sketches; the pair frame is a #types² self-join over a
    broadcast-sized table (5 rows here); hll_union merges blobs
    JVM-side. Jaccard is emitted in exact integer micro-units
    (overlap·10⁶ div union) — integer arithmetic over the estimates, no
    float path.

    Oracle-checked under the coupon-mode exactness contract
    (sketch_distinct_users): at test cardinalities every estimate is the
    exact distinct count, so union/overlap/jaccard hash-match the exact
    SQL; past ~10⁴ distincts per pair the sketches go dense and the
    estimates degrade to the published ~0.4% bound at fixed size (the
    drift guard in tests/test_sketches.py fails first if testdata ever
    approaches the threshold; inclusion-exclusion on dense estimates is
    additionally bounded in tests on synthetic overflow data).
    """
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 21)").alias("sk")
    )
    a = per.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = per.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    est_a = F.expr("hll_sketch_estimate(sk_a)")
    est_b = F.expr("hll_sketch_estimate(sk_b)")
    est_u = F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
    return (
        pairs.select(
            "type_a",
            "type_b",
            est_u.alias("approx_union"),
            (est_a + est_b - est_u).alias("approx_overlap"),
        )
        .select(
            "type_a",
            "type_b",
            "approx_union",
            "approx_overlap",
            F.expr("approx_overlap * 1000000 div approx_union").alias(
                "jaccard_micro"
            ),
        )
    )


HH_CAPACITY = 4096  # Misra-Gries counters per partial summary
HH_TOPK = 20


def sketch_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = HH_CAPACITY,
    k: int = HH_TOPK,
) -> DataFrame:
    """Mergeable heavy-hitters (frequent tokens) via Misra-Gries
    summaries — the third mergeable-sketch primitive beside HLL
    (distincts) and GK (quantiles): top-k corpus tokens with a
    deterministic error bound, O(capacity) memory per partial regardless
    of corpus size.

    Kernel (Arrow, per input batch): exact token counts, then — only if
    distinct tokens exceed ``capacity`` — the Misra-Gries compression
    from the mergeable-summaries literature (Agarwal et al., PODS 2012):
    subtract the (capacity+1)-th largest count from every counter and
    drop the non-positive ones; the subtracted value accumulates into the
    partial's error bound. Merging partials = summing counters (one
    map-side-combined groupBy) and summing bounds; every reported count
    is then within [true - err_bound, true].

    Oracle-checked under the same exact-below-threshold contract as the
    other sketches: the testdata vocabulary (31 distinct tokens) sits far
    below ``capacity``, so NO compression fires, err_bound = 0, and the
    result hash-matches exact GROUP BY counts. The drift guard in
    tests/test_sketches.py fails first if testdata vocabulary ever
    approaches the threshold; the MG bound itself is pinned by a unit
    test on synthetic data that DOES overflow the capacity.

    Scale shape: tokenization happens INSIDE the kernel (no explode —
    the corpus-size token stream never hits a shuffle); the only shuffle
    carries <= capacity rows per partial. Top-k is
    TakeOrderedAndProject with the (count desc, token asc) tie-break.
    """
    from ..sources.tables import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents").select("text"))

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            # vectorized token counting: split+explode+value_counts run in
            # pandas C paths, not a per-token Python loop
            counts = (
                pdf["text"].str.split(" ").explode().value_counts()
            )
            err = 0
            if len(counts) > capacity:
                t = int(counts.iloc[capacity])  # (capacity+1)-th largest
                err = t
                counts = (counts - t).loc[lambda s: s > 0]
            yield pd.DataFrame(
                {
                    "token": list(counts.index) + [None],
                    "cnt": [int(v) for v in counts.to_numpy()] + [0],
                    "err": [0] * len(counts) + [err],
                }
            )

    p = d.mapInPandas(partials, "token string, cnt bigint, err bigint")
    merged = (
        p.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("cnt").alias("est_count"))
    )
    bound = p.agg(F.sum("err").alias("err_bound"))
    return (
        merged.crossJoin(F.broadcast(bound))
        .orderBy(F.desc("est_count"), F.asc("token"))
        .limit(k)
    )
