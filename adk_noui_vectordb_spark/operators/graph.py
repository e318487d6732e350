"""Iterative graph analytics over relationship graphs derived from the
star schema.

Companion to the Pregel-style connected components in ``dedup.py``
(`dedup.py:540-575`): the same per-round shape (join contributions on the
edge list, aggregate per node, rebind), applied to centrality.

Cross-engine determinism: PageRank mass is carried as FLOOR-SCALED
INTEGERS (nano-units) with integer division at every step — no floating
point anywhere in the iteration, so the fixed-round result hash-matches
an exact SQL oracle bit-for-bit on any engine (the lesson of the sf0.1
rounding-tie failures, see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def pagerank_customer_supplier(
    spark: SparkSession, sf_dir: str, iters: int = 2, scale: int = 10**9
) -> DataFrame:
    """Fixed-round PageRank over the customer-supplier trade graph
    (distinct (customer, supplier) pairs from orders |x| lineitem,
    symmetrized) — "which suppliers sit at the center of the purchase
    network" is the graph-centrality twin of q15's revenue ranking.

    Integer-exact damping: p' = 0.15*scale + floor(0.85 * sum of
    floor(p/deg) over in-neighbors), all in 64-bit integer arithmetic
    (values stay < 2^62 for any graph with total mass N*scale < 2^55).

    Scale shape (per round, the Pregel contract of
    dedup_connected_components):
    - the edge list is built ONCE (one fact-fact shuffle + distinct)
      and reused every round;
    - degrees are node-cardinality (tiny vs edges) and join
      broadcast-style;
    - each round is one shuffle of contributions on dst and one
      map-side-combined sum — O(edges) per round, no driver collect;
    - at production round counts, checkpoint p each round to cut
      lineage (the dedup.py pattern); 2 fixed rounds chain lazily.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    base = 15 * scale // 100
    p = nodes.withColumn("p", F.lit(scale).cast("bigint"))
    for _ in range(iters):
        contrib = (
            edges.join(p, edges.src == p.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("p div deg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        p = nodes.join(summed, "node", "left_outer").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100")
            ).alias("p"),
        )
    return p
