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
