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


def triangle_count_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the nation co-trade graph
    (nations A, B linked when any customer in one bought from a supplier
    in the other) — the clustering-coefficient numerator, and the
    canonical distributed-graph kernel beyond Pregel loops.

    Algorithm: ORDERED edge join-join (node order: nation name asc).
    Every triangle {a < b < c} is found exactly once by joining
    (a,b)⋈(b,c) and semi-checking (a,c) — ordering is what bounds the
    join fan-out: each edge joins only its HIGHER endpoint's adjacency,
    so the intermediate is sum-of-squares of ordered degrees, not
    degrees (the standard MapReduce triangle-counting trick;
    Suri & Vassilvitskii, WWW 2011). At 100 TB the same plan shuffles
    on the join keys; high-degree hubs are mitigated by the ordering
    itself (hubs mostly appear as the LOWER endpoint).

    Integer-exact output (counts only), so the oracle hash-matches.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pairs = (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"),
                                 F.col("n_name").alias("cn"))),
            "c_nationkey",
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("s_nationkey"),
                                 F.col("n_name").alias("sn"))),
            "s_nationkey",
        )
        .select(
            F.least("cn", "sn").alias("u"), F.greatest("cn", "sn").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e1 = pairs.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = pairs.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = pairs.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )
    # explode(array(...)), not a 3-way unionAll: the union triplicates
    # the fact-fact join subtree in the plan (9 scans, recovered only by
    # AQE's ReusedExchange); the explode computes tri ONCE (review r7).
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("n_name")
    )
    return corners.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
