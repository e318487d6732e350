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
