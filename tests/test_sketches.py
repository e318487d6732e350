"""Accuracy bound for the HLL sketch operator — the check an exact SQL
oracle cannot express (approximate by construction, so the driver records
rows-only; this pins the 5% relative-error contract instead)."""

from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators.sketches import sketch_distinct_users
from adk_noui_vectordb_spark.sources.tables import load_table


def test_hll_estimates_within_five_percent_of_exact(spark, sf_dir):
    est = {
        r.event_type: r.approx_users
        for r in sketch_distinct_users(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = e.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= max(1, 0.05 * ex), (k, est[k], ex)


def test_testdata_stays_below_sketch_exactness_thresholds(spark, sf_dir):
    """Drift guard (ADVICE r5): the sketch oracles hash-match exact SQL
    only because the test-SF cardinalities sit far below the regimes where
    the sketches go approximate — HLL coupon mode is an exact hash set
    while distinct-per-group ≲ 10^4 at lgConfigK 21, and a GK sketch at
    accuracy 100000 retains every value while rows-per-group stay well
    under it. If a testdata regeneration (or a Spark minor bump shifting
    the thresholds) pushes cardinalities toward those limits, THIS test
    names the problem before the driver rows silently flip red."""
    e = load_table(spark, sf_dir, "events")
    per_group = {
        r["event_type"]: (r["rows"], r["users"])
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("user_id").alias("users"),
        )
        .collect()
    }
    total_users = e.select("user_id").distinct().count()
    GK_ACCURACY, HLL_EXACT_MAX = 100_000, 10_000
    for etype, (rows, users) in per_group.items():
        assert rows <= GK_ACCURACY / 5, (
            f"{etype}: {rows} rows/group approaches GK accuracy "
            f"{GK_ACCURACY} — quantile oracle would go approximate"
        )
        assert users <= HLL_EXACT_MAX, (
            f"{etype}: {users} distinct users approaches the HLL "
            "coupon-mode exactness bound"
        )
    assert total_users <= HLL_EXACT_MAX, total_users


def test_value_quantile_sketch_error_bound(spark, sf_dir):
    """Sketch percentiles must land within 1% rank error of the exact
    rank-selected values (GK accuracy 100000 is far tighter — exact at
    test SFs; 1% absorbs value-gap amplification on small groups)."""
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators.sketches import (
        sketch_value_quantiles,
    )
    from adk_noui_vectordb_spark.sources.tables import load_table

    got = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in sketch_value_quantiles(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    for etype, (p50, p95, p99) in got.items():
        vals = sorted(
            r["value"]
            for r in e.filter(F.col("event_type") == etype)
            .select("value")
            .collect()
        )
        n = len(vals)
        for q, approx in ((0.5, p50), (0.95, p95), (0.99, p99)):
            # rank error: the approx value must sit within +-1% of the
            # target rank in the sorted sequence
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n))]
            assert lo <= approx <= hi, (etype, q, approx, lo, hi)


def test_heavy_hitters_exact_at_test_scale(spark, sf_dir):
    """Below capacity no MG compression fires: counts equal exact GROUP BY
    counts and err_bound is 0 (the oracle contract)."""
    from adk_noui_vectordb_spark.operators.sketches import (
        sketch_heavy_hitters,
    )

    got = sketch_heavy_hitters(spark, sf_dir).collect()
    assert all(r["err_bound"] == 0 for r in got)
    d = load_table(spark, sf_dir, "documents")
    exact = {
        r["token"]: r["n"]
        for r in d.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in got:
        assert exact[r["token"]] == r["est_count"], r


def test_testdata_vocab_stays_below_hh_capacity(spark, sf_dir):
    """Drift guard for the heavy-hitters exactness contract: if testdata
    vocabulary approaches HH_CAPACITY, this names the problem before the
    driver row flips red."""
    from adk_noui_vectordb_spark.operators.sketches import HH_CAPACITY

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert vocab <= HH_CAPACITY / 4, (
        f"{vocab} distinct tokens approaches MG capacity {HH_CAPACITY}"
    )


def test_misra_gries_bound_when_capacity_overflows(spark):
    """On data that DOES overflow the capacity, every reported count must
    obey the MG contract: true - err_bound <= est <= true, and every
    token with true count > err_bound survives in the summary."""
    import pandas as pd

    from adk_noui_vectordb_spark.operators import sketches

    # 60 tokens with distinct frequencies 1..60 across several batches
    rows = []
    for tok in range(60):
        rows += [f"tok{tok:02d}"] * (tok + 1)
    df = spark.createDataFrame(
        pd.DataFrame({"text": [" ".join(rows)]})
    )

    import unittest.mock as mock

    with mock.patch.object(
        sketches, "load_table", lambda s, d, t: df
    ):
        got = {
            r["token"]: (r["est_count"], r["err_bound"])
            for r in sketches.sketch_heavy_hitters(
                spark, "ignored", capacity=16, k=60
            ).collect()
        }
    true = {f"tok{t:02d}": t + 1 for t in range(60)}
    assert got, "summary empty"
    for tok, (est, err) in got.items():
        assert true[tok] - err <= est <= true[tok], (tok, est, err)
    # the top tokens (true count > err) must be present
    any_err = max(err for _, err in got.values())
    for tok, cnt in true.items():
        if cnt > any_err:
            assert tok in got, (tok, cnt, any_err)


def test_user_overlap_matches_exact_sets(spark, sf_dir):
    """Inclusion-exclusion over merged sketches equals exact set algebra
    at test cardinalities (coupon-mode exactness), for every pair."""
    from adk_noui_vectordb_spark.operators.sketches import sketch_user_overlap

    e = load_table(spark, sf_dir, "events")
    sets = {
        r["event_type"]: set(
            x["user_id"]
            for x in e.filter(F.col("event_type") == r["event_type"])
            .select("user_id")
            .distinct()
            .collect()
        )
        for r in e.select("event_type").distinct().collect()
    }
    rows = sketch_user_overlap(spark, sf_dir).collect()
    types = sorted(sets)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert r["approx_union"] == len(a | b)
        assert r["approx_overlap"] == len(a & b)
        assert r["jaccard_micro"] == len(a & b) * 1_000_000 // len(a | b)


def test_user_overlap_inclusion_exclusion_bound_past_coupon_mode(spark):
    """Past coupon capacity the estimates go dense-HLL approximate;
    inclusion-exclusion compounds the per-sketch error, so pin a 5%
    relative bound on synthetic data big enough to overflow: a 40k-id
    set and a 20k-id set fully contained in it (union 40k, overlap 20k;
    lgConfigK 12 forces dense mode at this size)."""
    df = spark.range(0, 60_000).select(
        F.when(F.col("id") < 40_000, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.when(F.col("id") < 40_000, F.col("id"))
        .otherwise(F.col("id") - 20_000)
        .alias("uid"),
    )
    per = df.groupBy("g").agg(F.expr("hll_sketch_agg(uid, 12)").alias("sk"))
    a = per.filter("g = 'a'").select(F.col("sk").alias("sk_a"))
    b = per.filter("g = 'b'").select(F.col("sk").alias("sk_b"))
    row = (
        a.crossJoin(b)
        .select(
            F.expr("hll_sketch_estimate(sk_a)").alias("ea"),
            F.expr("hll_sketch_estimate(sk_b)").alias("eb"),
            F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))").alias("eu"),
        )
        .head()
    )
    overlap = row["ea"] + row["eb"] - row["eu"]
    assert abs(row["eu"] - 40_000) <= 0.05 * 40_000
    assert abs(overlap - 20_000) <= 0.05 * 40_000  # error scales with union
