"""Plan-shape assertions: the 100-TB contract (SURVEY.md §4).

Filters must reach the parquet scan, dimension joins must broadcast, exact
top-k must plan as TakeOrderedAndProject (heap-based, no global sort).
Regressions here mean a query silently became a full-scan/shuffle plan.
"""

from adk_noui_vectordb_spark.operators import relational as rel
from adk_noui_vectordb_spark.operators import rollups as roll
from adk_noui_vectordb_spark.operators.knn import knn_topk, make_query_from_vec
from adk_noui_vectordb_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    explain_str,
)
from adk_noui_vectordb_spark.sources.tables import load_table


def test_point_lookup_pushes_filter(spark, sf_dir):
    df = roll.point_lookup(spark, sf_dir)
    assert_pushed_filters(df, "doc_id")


def test_metadata_filter_pushes_to_scan(spark, sf_dir):
    df = roll.filter_by_lang(spark, sf_dir)
    assert_pushed_filters(df, "lang")


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = rel.q5_region_revenue(spark, sf_dir)
    # customer, nation, region all broadcast: >= 3 broadcast joins
    assert_broadcast_join(df, min_count=3)


def test_q5_gate_demotes_customer_broadcast(spark, sf_dir):
    """With the size gate at 0 bytes, customer must NOT be broadcast-hinted:
    the c_custkey join plans as a shuffle join (sort-merge or shuffle-hash),
    while the fixed-size nation/region dims stay broadcast. This is the
    100 TB demotion path — a hinted broadcast is never demoted by AQE.
    Auto-broadcast is disabled to simulate customer being too big for the
    stats-based planner too (at test SF the file is tiny; stats-based
    broadcast is fine because AQE CAN demote that one)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = rel.q5_region_revenue(spark, sf_dir, dim_broadcast_bytes=0)
        plan = explain_str(df, mode="simple")
        # exactly nation + region still broadcast; customer is not
        assert plan.count("BroadcastHashJoin") == 2, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q9_gate_demotes_part_supplier_broadcast(spark, sf_dir):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = rel.q9_brand_profit(spark, sf_dir, dim_broadcast_bytes=0)
        plan = explain_str(df, mode="simple")
        # only nation (fixed-size) still broadcast; part and supplier demoted
        assert plan.count("BroadcastHashJoin") == 1, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_knn_is_take_ordered(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    df = knn_topk(emb, make_query_from_vec(emb, 0), k=5)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_knn_filter_pushes_to_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    df = knn_topk(
        emb, make_query_from_vec(emb, 0), k=5,
        candidate_filter=F.col("label") == 3,
    )
    assert_pushed_filters(df, "label")


def test_q6_predicates_push_to_scan(spark, sf_dir):
    df = rel.q6_revenue_forecast(spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_q1_prunes_columns(spark, sf_dir):
    df = rel.q1_pricing_summary(spark, sf_dir)
    plan = explain_str(df)
    # ReadSchema must not include unused columns like l_orderkey/l_partkey
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "l_partkey" not in read_schema[0], plan


def test_asof_join_is_join_free(spark, sf_dir):
    """The as-of is union+window — no join operator may appear."""
    from adk_noui_vectordb_spark.operators import temporal

    plan = explain_str(temporal.asof_join_purchase_click(spark, sf_dir))
    assert "Join" not in plan, plan


def test_range_join_is_equi_not_cartesian(spark, sf_dir):
    """Bucket banding must turn the interval join into equi joins."""
    from adk_noui_vectordb_spark.operators import temporal

    plan = explain_str(temporal.range_join_bursts(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rollup_is_single_expand_aggregate(spark, sf_dir):
    """ROLLUP = one Expand + one aggregation pass, not 3 groupBys."""
    plan = explain_str(rel.rollup_segment_status(spark, sf_dir))
    assert "Expand" in plan, plan


def test_percentiles_share_one_partitioning(spark, sf_dir):
    """Ranking window and final agg both key on l_returnflag: exactly one
    hash-partitioning exchange in the plan."""
    plan = explain_str(rel.agg_percentiles(spark, sf_dir))
    assert plan.count("- Exchange") == 1, plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """orders |x| lineitem bucketed on the join key: zero exchanges."""
    from adk_noui_vectordb_spark.sources.sinks import write_bucketed
    from adk_noui_vectordb_spark.sources.tables import load_table

    write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b",
        str(tmp_path / "orders_b"), "o_orderkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "lineitem_b",
        str(tmp_path / "lineitem_b"), "l_orderkey",
    )
    try:
        o = spark.table("orders_b").hint("merge")
        l = spark.table("lineitem_b")
        joined = l.join(o, l.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on the partition column becomes a PartitionFilter — the
    scan lists only matching directories, no data IO elsewhere."""
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.sources.sinks import write_partitioned
    from adk_noui_vectordb_spark.sources.tables import load_table

    p = str(tmp_path / "events_by_type")
    write_partitioned(
        load_table(spark, sf_dir, "events").select("event_id", "value", "event_type"),
        p,
        "event_type",
    )
    df = spark.read.parquet(p).filter(F.col("event_type") == "purchase")
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0], plan
    assert df.count() > 0


def test_decontaminate_is_single_narrow_pass(spark, sf_dir):
    """The benchmark shingle set (tiny by definition) is collected and
    broadcast executor-side; the candidate side is ONE narrow Arrow pass —
    no join, no shuffle, no sort anywhere in the plan (the previous
    broadcast-join formulation was replaced in round 5; interpreted HOF
    shingle construction dominated its runtime)."""
    from adk_noui_vectordb_spark.operators import textops

    df = textops.decontaminate_corpus(spark, sf_dir)
    plan = explain_str(df, mode="simple")
    for bad in ("Join", "Exchange", "Sort"):
        assert bad not in plan, plan
    assert "MapInPandas" in plan, plan
    assert df.count() > 0


def test_decontaminate_fallback_matches_collect_path(spark, sf_dir):
    """Above the driver-collect byte budget the operator must switch to
    the fully distributed join formulation (VERDICT r5 item 2) and
    produce IDENTICAL (doc_id, n_hits) rows. Forcing the budget to 0
    exercises the fallback on the same data the collect path runs."""
    from adk_noui_vectordb_spark.operators import textops

    collected = {
        (r["doc_id"], r["n_hits"])
        for r in textops.decontaminate_corpus(spark, sf_dir).collect()
    }
    distributed = {
        (r["doc_id"], r["n_hits"])
        for r in textops.decontaminate_corpus(
            spark, sf_dir, collect_budget_bytes=0
        ).collect()
    }
    assert collected == distributed
    assert len(collected) > 0
    # and the fallback plan must not collect: it is a join + one groupBy
    plan = explain_str(
        textops.decontaminate_corpus(spark, sf_dir, collect_budget_bytes=0),
        mode="simple",
    )
    assert "Join" in plan, plan


def test_cube_is_one_expand_one_shuffle(spark, sf_dir):
    """CUBE must plan as a single Expand feeding one hash aggregate —
    one shuffle covers all four grouping sets (never four groupBys)."""
    from adk_noui_vectordb_spark.operators import relational as rel_mod

    plan = explain_str(rel_mod.cube_status_priority(spark, sf_dir), mode="simple")
    assert "Expand" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_q4_semi_join_and_date_pushdown(spark, sf_dir):
    """EXISTS must plan as a single semi join (lineitem scanned once,
    never materialized per order) with the window pushed into the orders
    scan."""
    df = rel.q4_order_priority(spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "LeftSemi" in plan, plan
    assert_pushed_filters(df, "o_orderdate")


def test_q18_aggregates_before_join(spark, sf_dir):
    """The HAVING-side aggregate must run BEFORE the joins so only
    above-threshold keys flow into them: in the simple plan the lineitem
    aggregate appears below (after, textually) the join operators."""
    plan = explain_str(rel.q18_large_orders(spark, sf_dir), mode="simple")
    first_join = min(
        i for i in (
            plan.find("SortMergeJoin"),
            plan.find("BroadcastHashJoin"),
            plan.find("ShuffledHashJoin"),
        ) if i >= 0
    )
    agg_pos = plan.find("total_qty", first_join)
    assert agg_pos > first_join, plan


def test_q19_no_cartesian(spark, sf_dir):
    """The disjunctive cross-table predicate must not degrade the equi
    join to a nested-loop/cartesian plan."""
    plan = explain_str(rel.q19_disjunctive_revenue(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan, plan


def test_q16_anti_join_broadcast(spark, sf_dir):
    plan = explain_str(rel.q16_supplier_part_counts(spark, sf_dir), mode="simple")
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rp_lsh_probe_prunes_index_partitions(spark, sf_dir):
    """ann_rp_lsh_topk serves from the on-disk band table partitioned by
    (band, band_key): the probe's literal (band, band_key) pairs must be
    PartitionFilters — the scan lists only the probed bucket directories
    (the 100 TB serving contract, VERDICT r6 next #1)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann

    df = ann.ann_rp_lsh_topk(spark, sf_dir)
    plan = explain_str(df)
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan
    head = seg[1].split("\n")[0]
    assert "band" in head and "band_key" in head, plan

    # runtime proof: the probed-bucket listing reads fewer leaf dirs than
    # the index holds (single probe touches RP_BANDS of up to 96 buckets)
    bands_p = ann.build_rp_index(spark, sf_dir)
    n_buckets = sum(
        1
        for band in os.listdir(bands_p)
        if band.startswith("band=")
        for bk in os.listdir(os.path.join(bands_p, band))
        if bk.startswith("band_key=")
    )
    assert n_buckets > ann.RP_BANDS
    probed = (
        spark.read.parquet(bands_p)
        .filter((F.col("band") == 0) & (F.col("band_key") == 0))
    )
    assert "PartitionFilters" in explain_str(probed)


def test_rp_lsh_multiprobe_expands_candidates(spark, sf_dir):
    """Hamming-1 multiprobe must probe a superset of the single-probe
    buckets: its candidate set contains the single-probe candidates."""
    from adk_noui_vectordb_spark.operators import ann

    single = set(
        r["vec_id"] for r in ann.ann_rp_lsh_topk(spark, sf_dir, k=1000).collect()
    )
    multi = set(
        r["vec_id"]
        for r in ann.ann_rp_lsh_topk(
            spark, sf_dir, k=1000, multiprobe_hamming=1
        ).collect()
    )
    assert single <= multi
    assert len(multi) >= len(single)


def test_text_index_probe_prunes_term_buckets(spark, sf_dir):
    """bm25_topk_served reads the on-disk postings partitioned by
    tbucket: the literal query-term buckets must be PartitionFilters on
    every index scan (postings AND termstats) — a query touches only its
    own terms' buckets however large the corpus (the lexical twin of the
    rp/ivf serving contract)."""
    from adk_noui_vectordb_spark.operators import invindex

    df = invindex.bm25_topk_served(spark, sf_dir)
    plan = explain_str(df)
    seg = plan.split("PartitionFilters")
    pruned = [s.split("\n")[0] for s in seg[1:] if "tbucket" in s.split("\n")[0]]
    assert len(pruned) >= 2, plan  # postings scan + termstats scan
    buckets = sorted(
        {invindex.term_bucket_py(t) for t in invindex.QUERY_TERMS}
    )
    assert len(buckets) < invindex.N_TERM_BUCKETS  # probe is a strict subset


def test_ivf_trained_probe_prunes_cell_partitions(spark, sf_dir):
    """ann_ivf_trained_topk serves from the assignment parquet partitioned
    by cluster: the nprobe literal cell ids must be PartitionFilters."""
    from adk_noui_vectordb_spark.operators import ann

    df = ann.ann_ivf_trained_topk(spark, sf_dir)
    plan = explain_str(df)
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan
    assert any(
        "cluster" in s.split("\n")[0] for s in seg[1:]
    ), plan


def test_vecs_store_point_lookup_prunes_vbucket(spark, sf_dir):
    """The r9 index-resident vector stores serve query point lookups
    with STATIC vbucket partition pruning — the scan lists one of
    N_VEC_BUCKETS partition dirs, the text-probe contract applied to
    vectors. Pinned for both the RP and PQ paths."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann

    bands_p = ann.build_rp_index(spark, sf_dir)
    vecs = spark.read.parquet(os.path.join(os.path.dirname(bands_p), "vecs"))
    probe = vecs.filter(
        (F.col("vbucket") == ann.vec_bucket_py(0)) & (F.col("vec_id") == 0)
    )
    plan = explain_str(probe)
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan
    assert "vbucket" in seg[1].split("\n")[0], plan

    codes_p, _ = ann.build_pq_index(spark, sf_dir)
    pq_vecs = spark.read.parquet(
        os.path.join(os.path.dirname(codes_p), "vecs")
    )
    probe2 = pq_vecs.filter(
        (F.col("vbucket") == ann.vec_bucket_py(0)) & (F.col("vec_id") == 0)
    )
    plan2 = explain_str(probe2)
    assert "vbucket" in plan2.split("PartitionFilters")[1].split("\n")[0], plan2


def test_dedup_gate_verification_broadcasts_batch_side(spark, sf_dir):
    """The ingest gate's verification join must BROADCAST the
    (candidate x batch-signature) side so the corpus-scale ``sigs/``
    store is streamed map-side, never shuffle-exchanged (VERDICT r9
    next #6) — and the candidate join must broadcast the batch band
    rows so the pruned band-table scan is likewise exchange-free."""
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup

    batch = spark.createDataFrame(
        [(900000001, "one two three four five six seven")],
        "doc_id bigint, text string",
    )
    df = dedup.dedup_gate_for(spark, sf_dir, batch)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan
    # EVERY join in the gate must be broadcast: a SortMergeJoin or
    # ShuffledHashJoin anywhere means an index store (bands or sigs)
    # got shuffle-exchanged. The only exchanges allowed are the ones
    # under the batch-side distinct/broadcast, which never carry
    # corpus-scale data.
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_dedup_gate_serving_path_job_budget(spark, sf_dir):
    """VERDICT r10 next #8 / r11 next #5: the gate's probe-breadth
    decision, static-pruning pair set, and emptiness check are ONE
    auxiliary job (a <=128-group aggregate on the checkpointed batch
    bands), and the gate PROLOGUE (signing checkpoint + that aggregate)
    runs with AQE off — both statements are tiny and fully hand-planned,
    so AQE's per-exchange stage materialization was pure scheduler
    latency (r10: 14 jobs; r11 fusion: 12; r12 AQE-scoped prologue: 7).
    Pinned via job-group accounting so a regression that sneaks extra
    driver round-trips into the serving path fails here, not in a
    bench."""
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup

    # warm the memoized index so build jobs don't count against the gate
    dedup.build_minhash_index(spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    sc = spark.sparkContext
    sc.setJobGroup("gate-job-budget", "dedup gate serving path")
    try:
        rows = dedup.dedup_gate_for(spark, sf_dir, batch).collect()
    finally:
        sc.setJobGroup(None, None)
    assert rows  # the clone batch always surfaces its originals
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("gate-job-budget"))
    assert n_jobs <= 8, f"gate serving path ran {n_jobs} jobs (budget 8)"


def test_boolean_probe_prunes_term_buckets_and_never_scans_corpus(
    spark, sf_dir
):
    """boolean_topk_served is index-only: the postings scan carries the
    probed terms' tbuckets as PartitionFilters (NOT terms ride the same
    probe — a posting row disqualifies, so negation never rescans the
    corpus), and documents.parquet appears nowhere in the plan."""
    from adk_noui_vectordb_spark.operators import invindex

    df = invindex.boolean_topk_served(
        spark, sf_dir, must_any=("join", "scan"), must_not=("window",)
    )
    plan = explain_str(df)
    assert "documents.parquet" not in plan, plan
    seg = plan.split("PartitionFilters")
    assert any("tbucket" in s.split("\n")[0] for s in seg[1:]), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_phrase_probe_prunes_term_buckets_and_never_scans_corpus(
    spark, sf_dir
):
    """phrase_topk_served reads only the positions store, pruned to the
    phrase terms' tbuckets; the corpus never enters the plan."""
    from adk_noui_vectordb_spark.operators import invindex

    df = invindex.phrase_topk_served(spark, sf_dir)
    plan = explain_str(df)
    assert "documents.parquet" not in plan, plan
    seg = plan.split("PartitionFilters")
    assert any("tbucket" in s.split("\n")[0] for s in seg[1:]), plan


def test_new_serving_ops_prune_and_avoid_corpus(spark, sf_dir):
    """One sweep over the r10b serving layer: proximity, prefix (probe
    phase), highlight and batch-ANN plans never scan the corpus files,
    and every positions/postings/bands scan carries partition filters."""
    from adk_noui_vectordb_spark.operators import ann, invindex

    cases = [
        (
            invindex.proximity_topk_served(spark, sf_dir),
            "documents.parquet",
            "tbucket",
        ),
        (
            invindex.search_highlight_served(spark, sf_dir),
            "documents.parquet",
            "tbucket",
        ),
        (
            ann.ann_rp_lsh_batch_topk(spark, sf_dir),
            "embeddings.parquet",
            "band",
        ),
    ]
    for df, corpus_file, part_col in cases:
        plan = explain_str(df)
        assert corpus_file not in plan, plan
        seg = plan.split("PartitionFilters")
        assert any(part_col in s.split("\n")[0] for s in seg[1:]), plan


def test_collection_serving_plans_are_index_only(spark, sf_dir):
    """The facade's serving plans: the query's band scan carries the
    literal probe pairs as PartitionFilters (static pruning), the meta
    DSL filter reaches its scan's PushedFilters, and neither plan ever
    scans the source documents/embeddings parquet — the collection
    root is the corpus of record."""
    from adk_noui_vectordb_spark.api import collection as capi

    coll = capi.demo_collection(spark, sf_dir)
    q = capi.collection_query_topk(spark, sf_dir)
    plan = explain_str(q)
    segs = plan.split("PartitionFilters")
    assert any(
        "band" in s.split("\n")[0] for s in segs[1:]
    ), plan  # probed (band, band_key) literals prune the bands scan
    assert "documents.parquet" not in plan, plan
    assert "embeddings.parquet" not in plan, plan

    g = coll.get(where={"lang": {"$in": ["en", "de"]}}, limit=5)
    gplan = explain_str(g)
    pushed = [ln for ln in gplan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("lang" in ln for ln in pushed), gplan
    assert "documents.parquet" not in gplan, gplan


def test_collection_keyset_page_pushes_cursor_to_scan(spark, sf_dir):
    """get(after_id=...) must reach the meta parquet scan as a pushed
    filter (the keyset-pagination contract: page depth costs nothing) —
    and the default get() projection must NOT read the vecs store."""
    from adk_noui_vectordb_spark.api.collection import demo_collection

    coll = demo_collection(spark, sf_dir)
    df = coll.get(limit=5, after_id="doc-1")
    plan = explain_str(df)
    assert "PushedFilters" in plan and "doc-1" in plan, plan
    assert "/vecs" not in plan, plan  # docvalues split: no fat column


def test_sampled_ivf_probe_prunes_cells_and_takeordered(spark, sf_dir):
    """The sample-trained index serves with the same probe discipline as
    the full-trained one: literal nprobe cell PartitionFilters on the
    assignment scan, TakeOrderedAndProject for the exact rerank."""
    from adk_noui_vectordb_spark.operators import ann

    df = ann.ann_ivf_sampled_topk(spark, sf_dir)
    plan = explain_str(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l and "cluster" in l]
    assert pf, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_acorn_pass_lookup_prunes_vbucket(spark, sf_dir):
    """VERDICT r13 next #5 + r14 next #1: the corpus ACORN keys'
    scored fetch is ONE scan of the label-carrying vecs component
    (GRAPH_VECS_SCHEMA) with static vbucket PartitionFilters; the
    labels sidecar keeps the same pruned layout (plan-pinned here)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import graph_ann as gann

    cur = gann.build_graph_index(spark, sf_dir)
    vbs = [gann.vec_bucket_py(i) for i in (0, 3)]
    for comp, schema in (
        ("labels", gann.GRAPH_LABELS_SCHEMA),
        ("vecs", gann.GRAPH_VECS_SCHEMA),
    ):
        probe = (
            spark.read.schema(schema)
            .parquet(os.path.join(cur, comp))
            .filter(F.col("vbucket").isin(vbs) & F.col("vec_id").isin([0, 3]))
        )
        plan = explain_str(probe)
        pf = [
            ln
            for ln in plan.splitlines()
            if "PartitionFilters" in ln and "vbucket" in ln
        ]
        assert pf, f"{comp}: no vbucket PartitionFilters\n{plan}"
    # the layout invariant behind the single-scan fetch: on this
    # labeled corpus the vecs FILES physically carry the label, equal
    # to the sidecar's value for the same id (not schema-filled nulls)
    got = (
        spark.read.schema(gann.GRAPH_VECS_SCHEMA)
        .parquet(os.path.join(cur, "vecs"))
        .filter(
            F.col("vbucket").isin(vbs[:1]) & (F.col("vec_id") == F.lit(0))
        )
        .select("label")
        .head()
    )
    want = (
        spark.read.schema(gann.GRAPH_LABELS_SCHEMA)
        .parquet(os.path.join(cur, "labels"))
        .filter(
            F.col("vbucket").isin(vbs[:1]) & (F.col("vec_id") == F.lit(0))
        )
        .select("label")
        .head()
    )
    assert got is not None and want is not None
    assert got["label"] == want["label"] and got["label"] is not None


def test_late_interaction_plan_partial_max_and_take_ordered(spark, sf_dir):
    """The sum-of-MaxSim fold must stay map-side-combinable (partial max
    aggregates before the doc_id exchange) and the final top-k must be
    TakeOrderedAndProject, not a global sort."""
    from adk_noui_vectordb_spark.operators.embed import late_interaction_topk

    plan = explain_str(late_interaction_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    # partial_max in the pre-shuffle HashAggregate (formatted plan shows
    # partial aggregate functions on the map side)
    assert "partial_max" in plan or "partial" in plan.lower(), plan


def test_li_served_probe_prunes_and_take_ordered(spark, sf_dir):
    """late_interaction_topk_served: the band-table probe must be
    static PartitionFilters on (band, band_key) — the scan lists only
    the probed bucket dirs, never the chunk corpus — and the final
    top-k must stay TakeOrderedAndProject with map-side partial maxes
    (the scan key's pinned shape, preserved by the served fold)."""
    from adk_noui_vectordb_spark.operators.embed import (
        late_interaction_topk_served,
    )

    df = late_interaction_topk_served(spark, sf_dir)
    plan = explain_str(df)
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan
    head = seg[1].split("\n")[0]
    assert "band" in head and "band_key" in head, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan


def test_li_filtered_serve_pushes_lang_to_index_scan(spark, sf_dir):
    """late_interaction_filtered_topk_served: the metadata predicate
    must be PushedFilters on the index's own vecs/ scan (the v2 lang
    fold) — a filtered query reads zero corpus rows."""
    from adk_noui_vectordb_spark.operators.embed import (
        late_interaction_filtered_topk_served,
    )

    df = late_interaction_filtered_topk_served(spark, sf_dir)
    plan = explain_str(df)
    assert_pushed_filters(df, "lang")
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan


def test_li_where_serve_narrow_meta_and_semi_join(spark, sf_dir):
    """late_interaction_where_topk_served: the compiled where tree must
    push into the documents scan (PushedFilters mentions a referenced
    field), the metadata projection must stay NARROW (ReadSchema carries
    doc_id + the three referenced fields, never text), and the filter
    enters the rerank as a semi join — non-matching docs never reach
    the maxes."""
    from adk_noui_vectordb_spark.operators.embed import (
        late_interaction_where_topk_served,
    )

    df = late_interaction_where_topk_served(spark, sf_dir)
    plan = explain_str(df)
    # the $gte leaf is a deterministic single-field pushdown candidate
    assert "n_chars" in plan, plan
    doc_scans = [
        seg.split("\n")[0]
        for seg in plan.split("ReadSchema: ")[1:]
        if "doc_id" in seg.split("\n")[0] and "n_chars" in seg.split("\n")[0]
    ]
    assert doc_scans, plan
    assert all("text" not in s for s in doc_scans), doc_scans
    assert "LeftSemi" in plan, plan
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan


def test_funnel_and_retention_plans_stay_partial_no_expand(spark, sf_dir):
    """events_funnel_conversion (r16 single-exchange shape): ONE scan
    of the events parquet, the three dependent stage minima as per-user
    window aggregates over ONE user_id exchange (no event-level joins,
    so no second corpus shuffle), and nothing may degenerate to a
    cartesian product.
    events_retention_cohorts: the distinct-active-users rollup is the
    TWO-STAGE reduction by construction — no Expand node (the
    count_distinct rewrite the docstring forbids) anywhere."""
    from adk_noui_vectordb_spark.operators.relational import (
        events_funnel_conversion,
        events_retention_cohorts,
    )

    import re

    p1 = explain_str(events_funnel_conversion(spark, sf_dir))
    # formatted plans name each node twice (tree + detail section), so
    # count the numbered detail headers only
    assert len(re.findall(r"\(\d+\) Scan parquet", p1)) == 1, p1
    assert "Window" in p1, p1
    # the only shuffles are the user_id window partitioning and the
    # final 1-row rollup — the former 3-scan/3-join shape is gone
    assert len(re.findall(r"\(\d+\) Exchange", p1)) <= 2, p1
    assert "SortMergeJoin" not in p1 and "Cartesian" not in p1, p1
    p2 = explain_str(events_retention_cohorts(spark, sf_dir))
    assert "Expand" not in p2, p2
    assert "Cartesian" not in p2, p2


def test_serving_path_job_budgets(spark, sf_dir):
    """VERDICT r16 next #3: machine-independent pins for the multi-job
    serving families. Seconds are bench weather; Spark JOB counts are
    scheduler round-trips and reproduce anywhere — so the r17 serving
    wins (graph beam fusion halving per-round point reads, the fused
    containment-gate prologue, PQ memo handles) are pinned here as a
    WARM-serve job ceiling per key. Budgets are the measured warm
    counts + 2 slack (sf0.001: graph solo/batch 6, acorn solo/batch 6,
    collection graph 9, containment gate 15, pq_rerank 6, served-LI 4);
    a regression that re-adds a per-round fetch or an eager prologue
    job jumps by >= rounds and fails the pin, not a bench."""
    import __spark_entry__ as entry

    qs = entry.queries()
    budgets = {
        "ann_graph_topk": 8,
        "ann_graph_batch_topk": 8,
        "ann_graph_acorn_topk": 8,
        "ann_graph_acorn_batch_topk": 8,
        "collection_query_graph_topk": 11,
        "dedup_containment_gate": 17,
        "knn_pq_rerank": 8,
        "late_interaction_topk_served": 6,
    }
    sc = spark.sparkContext
    failures = []
    for key, budget in budgets.items():
        qs[key](spark, sf_dir).collect()  # warm: index builds + memos
        group = f"job-budget-{key}"
        sc.setJobGroup(group, key)
        try:
            qs[key](spark, sf_dir).collect()
        finally:
            sc.setJobGroup(None, None)
        n = len(sc.statusTracker().getJobIdsForGroup(group))
        if n > budget:
            failures.append(f"{key}: {n} jobs (budget {budget})")
    assert not failures, "; ".join(failures)
