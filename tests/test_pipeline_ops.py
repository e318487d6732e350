"""Unit + plan tests for the round-3 training-pipeline operators
(line dedup, sequence packing, PII redaction) and the new TPC-H shapes.

Invariant style mirrors test_properties.py: check conservation laws and
boundary behavior, not golden values (those are the oracle's job).
"""

from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators import relational as rel
from adk_noui_vectordb_spark.operators import textops as tx
from adk_noui_vectordb_spark.plans import explain_str
from adk_noui_vectordb_spark.sources.corpus import derived_corpus
from adk_noui_vectordb_spark.sources.tables import load_table


# ---------------------------------------------------------------- line dedup

def test_line_dedup_conserves_lines(spark, sf_dir):
    """n_kept + n_removed must equal the document's line count exactly."""
    got = tx.line_dedup_corpus(spark, sf_dir).alias("g")
    lines = derived_corpus(spark, sf_dir).select(
        "path", F.size(F.split("content", "\n")).alias("n_lines")
    ).alias("l")
    bad = (
        got.join(lines, "path")
        .filter(F.col("n_kept") + F.col("n_removed") != F.col("n_lines"))
        .count()
    )
    assert bad == 0


def test_line_dedup_identity_at_infinite_threshold(spark, sf_dir):
    """With an unreachable doc-frequency threshold nothing is boilerplate:
    every line survives and the cleaned hash equals md5(original)."""
    got = tx.line_dedup_corpus(spark, sf_dir, min_docs=10**9)
    assert got.filter(F.col("n_removed") != 0).count() == 0
    orig = derived_corpus(spark, sf_dir).select(
        "path", F.md5("content").alias("h")
    )
    diff = (
        got.join(orig, "path")
        .filter(F.col("clean_hash") != F.col("h"))
        .count()
    )
    assert diff == 0


def test_line_dedup_removes_injected_boilerplate(spark, sf_dir):
    """The derived corpus injects shared header lines across .py files;
    at the default threshold at least one document loses a line."""
    got = tx.line_dedup_corpus(spark, sf_dir)
    assert got.filter(F.col("n_removed") > 0).count() > 0


def test_line_dedup_boiler_side_is_broadcast(spark, sf_dir):
    """The boilerplate set re-enters via a broadcast hash join — the
    corpus-side pass must never shuffle on the line text."""
    plan = explain_str(tx.line_dedup_corpus(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan


# ------------------------------------------------------------------ packing

def test_pack_sequences_conserves_tokens_and_docs(spark, sf_dir):
    """Per source: sum(seq_tokens) == total tokens, sum(n_docs) == total
    docs — packing moves documents, never drops or splits them."""
    from adk_noui_vectordb_spark.functions.text import word_count

    got = (
        tx.pack_sequences(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum("seq_tokens").alias("packed_tokens"),
            F.sum("n_docs").alias("packed_docs"),
        )
    )
    want = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(word_count(F.col("text"))).alias("tot_tokens"),
            F.count(F.lit(1)).alias("tot_docs"),
        )
    )
    bad = (
        got.join(want, "source")
        .filter(
            (F.col("packed_tokens") != F.col("tot_tokens"))
            | (F.col("packed_docs") != F.col("tot_docs"))
        )
        .count()
    )
    assert bad == 0


def test_pack_sequences_spans_are_disjoint_and_ordered(spark, sf_dir):
    """Within a source, sequence doc-id spans must be non-overlapping and
    ascending with seq_id (greedy packing preserves corpus order)."""
    import pandas as pd  # noqa: F401

    rows = (
        tx.pack_sequences(spark, sf_dir)
        .orderBy("source", "seq_id")
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for seqs in by_source.values():
        prev_last = None
        for r in seqs:
            assert r["first_doc"] <= r["last_doc"]
            if prev_last is not None:
                assert r["first_doc"] > prev_last
            prev_last = r["last_doc"]


def test_pack_sequences_budget_overflow_bound(spark, sf_dir):
    """Every sequence except possibly the last per source must have
    crossed the budget (greedy fill: a sequence closes only once its
    cumulative tokens reach the budget boundary)."""
    budget = 512
    rows = (
        tx.pack_sequences(spark, sf_dir, budget=budget)
        .orderBy("source", "seq_id")
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for seqs in by_source.values():
        # cumulative boundary: sequence i starts at floor(cum/budget) == i,
        # so all but the final sequence carry >= 1 token past their start
        # boundary; the strong invariant is monotone seq_ids with no gaps
        ids = [r["seq_id"] for r in seqs]
        assert ids == sorted(ids)
        assert ids[0] == 0


def test_pack_sequences_window_is_per_source(spark, sf_dir):
    """The running sum must partition by source — a global (empty
    partition spec) window would funnel 100 TB through one task."""
    plan = explain_str(tx.pack_sequences(spark, sf_dir), mode="extended")
    assert "windowspecdefinition(source" in plan, plan


# ---------------------------------------------------------------------- PII

def test_pii_regexes_on_crafted_text(spark):
    """The three patterns must hit the canonical shapes and nothing else."""
    df = spark.createDataFrame(
        [
            ("a", "mail me at jane.doe@corp.example.org today", 1, 0, 0),
            ("b", "call +1-555-0123 or +44-202-7946", 0, 2, 0),
            ("c", "server 10.0.0.1 and 255.255.255.255", 0, 0, 2),
            ("d", "no pii here, just text 3.14 and v1.2.3", 0, 0, 0),
        ],
        "id string, t string, e int, p int, i int",
    )
    got = df.select(
        "id",
        F.regexp_count("t", F.lit(tx.PII_EMAIL)).alias("ge"),
        F.regexp_count("t", F.lit(tx.PII_PHONE)).alias("gp"),
        F.regexp_count("t", F.lit(tx.PII_IPV4)).alias("gi"),
        "e", "p", "i",
    ).collect()
    for r in got:
        assert (r["ge"], r["gp"], r["gi"]) == (r["e"], r["p"], r["i"]), r


def test_redact_pii_injection_counts(spark, sf_dir):
    """The deterministic injection puts exactly one email in every doc,
    a phone iff doc_id%3==0, an IP iff doc_id%7==0 (base text is clean)."""
    got = tx.redact_pii(spark, sf_dir)
    bad = got.filter(
        (F.col("n_emails") != 1)
        | (F.col("n_phones") != (F.col("doc_id") % 3 == 0).cast("int"))
        | (F.col("n_ips") != (F.col("doc_id") % 7 == 0).cast("int"))
    ).count()
    assert bad == 0


def test_redact_pii_is_shuffle_free(spark, sf_dir):
    """Redaction is one narrow projection — no exchange in the plan."""
    plan = explain_str(tx.redact_pii(spark, sf_dir), mode="simple")
    assert "Exchange" not in plan, plan


# ------------------------------------------------------------- TPC-H shapes

def test_q10_is_take_ordered(spark, sf_dir):
    """Top-20 customers must plan as TakeOrderedAndProject, not a global
    sort of the aggregated frame."""
    plan = explain_str(rel.q10_returned_revenue(spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_q10_pushes_date_and_returnflag(spark, sf_dir):
    from adk_noui_vectordb_spark.plans import assert_pushed_filters

    df = rel.q10_returned_revenue(spark, sf_dir)
    assert_pushed_filters(df, "l_returnflag")
    assert_pushed_filters(df, "o_orderdate")


def test_q13_left_join_preserves_all_customers(spark, sf_dir):
    """Every customer lands in exactly one bucket (sum of custdist ==
    customer count) and the plan keeps the LEFT OUTER join — an inner
    join would drop customers whose orders are all filtered out."""
    rows = rel.q13_customer_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    plan = explain_str(rel.q13_customer_distribution(spark, sf_dir), mode="simple")
    assert "LeftOuter" in plan, plan


def test_q17_avg_via_window_single_pass(spark, sf_dir):
    """The per-part average must come from a window over the joined frame
    (one shuffle on l_partkey), not a second scan + self-join."""
    plan = explain_str(rel.q17_small_qty_revenue(spark, sf_dir), mode="extended")
    assert "windowspecdefinition(l_partkey" in plan, plan


def test_q22_anti_join_not_cartesian(spark, sf_dir):
    """The NOT EXISTS must plan as an anti join, and the scalar average
    must enter as a 1-row broadcast — never a CartesianProduct."""
    plan = explain_str(rel.q22_idle_customer_balance(spark, sf_dir), mode="simple")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ----------------------------------------------------- TPC-H completion set

def test_q2_min_cost_via_single_window(spark, sf_dir):
    """The correlated MIN must be a window over p_partkey on the joined
    frame — one shuffle, never a second lineitem scan + self-join."""
    plan = explain_str(rel.q2_min_cost_supplier(spark, sf_dir), mode="extended")
    assert "windowspecdefinition(p_partkey" in plan, plan


def test_q15_max_revenue_no_cartesian(spark, sf_dir):
    """The scalar max re-enters as a 1-row broadcast, never a cartesian,
    and supplier joins only after the max cut."""
    plan = explain_str(rel.q15_top_supplier(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan


def test_q20_nested_semi_joins(spark, sf_dir):
    """Both the part filter and the qualifying-supplier set must enter
    as SEMI joins (no row multiplication, no inner-join fanout)."""
    plan = explain_str(rel.q20_excess_suppliers(spark, sf_dir), mode="simple")
    assert plan.count("LeftSemi") >= 2, plan


def test_q21_sole_late_supplier_invariant(spark, sf_dir):
    """Every counted wait event is an order with >= 2 suppliers where
    exactly one shipped late — re-derive one row end-to-end."""
    rows = rel.q21_waiting_suppliers(spark, sf_dir).collect()
    assert rows, "expected at least one waiting supplier"
    assert all(r["numwait"] >= 1 for r in rows)
    # ranked descending with name tie-break
    vals = [(-(r["numwait"]), r["s_name"]) for r in rows]
    assert vals == sorted(vals)


# ----------------------------------------------------------- LM perplexity

def test_lm_perplexity_oov_path_exercised(spark, sf_dir):
    """With the capped vocab some tokens must fall to the OOV floor, and
    counts stay within bounds; nll is positive (probabilities < 1)."""
    rows = tx.lm_perplexity_score(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r["n_oov"] <= r["n_tokens"] for r in rows)
    assert sum(r["n_oov"] for r in rows) > 0
    assert all(r["nll_micro"] > 0 for r in rows)


def test_lm_perplexity_full_vocab_has_no_oov(spark, sf_dir):
    """A vocab cap above the corpus vocabulary means zero OOV tokens."""
    rows = tx.lm_perplexity_score(spark, sf_dir, vocab_size=10**6).collect()
    assert sum(r["n_oov"] for r in rows) == 0


def test_lm_perplexity_model_is_broadcast(spark, sf_dir):
    """The capped unigram model must re-enter as a broadcast join; the
    vocabulary cut must be a TakeOrderedAndProject, not a global sort."""
    plan = explain_str(tx.lm_perplexity_score(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_lm_bigram_invariants(spark, sf_dir):
    """Every doc with >= 2 tokens appears with n_bigrams = n_tokens - 1;
    smoothed probabilities stay < 1 (nll positive) because capped-model
    contexts are derived from the model itself (c12 <= c1 < c1 + V/2)."""
    rows = tx.lm_bigram_score(spark, sf_dir).collect()
    assert rows
    assert all(r["nll2_micro"] > 0 for r in rows)
    assert all(0 <= r["n_oov"] <= r["n_bigrams"] for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    want = {
        d["doc_id"]: len(d["text"].split(" ")) - 1
        for d in docs
        if len(d["text"].split(" ")) >= 2
    }
    assert {r["doc_id"]: r["n_bigrams"] for r in rows} == want


def test_lm_bigram_detects_scrambled_word_order(spark, sf_dir):
    """The bigram score's reason to exist: reversing every document's
    word order preserves the unigram distribution exactly but breaks
    transitions — the corpus-mean bigram nll must rise."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    base = tx.lm_bigram_score(spark, sf_dir)
    mean_orig = base.agg(F.avg("nll2_micro")).head()[0]

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scrambled = docs.withColumn(
            "text",
            F.array_join(F.reverse(F.split(F.col("text"), " ")), " "),
        )
        scrambled.write.parquet(os.path.join(tmp, "documents.parquet"))
        mean_scr = (
            tx.lm_bigram_score(spark, tmp).agg(F.avg("nll2_micro")).head()[0]
        )
    assert mean_scr > mean_orig


def test_lm_bigram_model_is_broadcast(spark, sf_dir):
    """Both capped tables (bigram model, derived contexts) re-enter as
    broadcast joins; the model cut is a TakeOrderedAndProject."""
    plan = explain_str(tx.lm_bigram_score(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


# ------------------------------------------------------------ mixture sample

def test_mixture_sample_quota_bounds(spark, sf_dir):
    """Each source fills its quota: selected tokens reach the budget
    (or the source ran dry) and overflow is at most one document."""
    rows = tx.mixture_sample(spark, sf_dir).collect()
    assert rows
    src_tokens = {
        r["source"]: r["tot"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("tot"))
        .collect()
    }
    for r in rows:
        exhausted = r["tok_sel"] == src_tokens[r["source"]]
        assert r["tok_sel"] >= r["budget_tokens"] or exhausted, r
        # greedy prefix: removing the last doc must drop below budget —
        # equivalently the pre-final cumulative is < budget, so overflow
        # is bounded by one document; n_sel is at least 1 given budget>0
        assert r["n_sel"] >= 1


def test_mixture_sample_weights_proportional(spark, sf_dir):
    """Quota ratio between a weight-3 and a weight-1 source is 3x
    (floor rounding aside)."""
    rows = {r["source"]: r["budget_tokens"]
            for r in tx.mixture_sample(spark, sf_dir).collect()}
    # src2 -> 2%3+1 = 3; src0 -> 0%3+1 = 1
    assert rows["src2"] == 3 * rows["src0"] or abs(
        rows["src2"] - 3 * rows["src0"]) <= 2


# ---------------------------------------------------------------- BPE pairs

def test_bpe_pairs_are_two_chars_and_ranked(spark, sf_dir):
    rows = tx.bpe_pair_counts(spark, sf_dir).collect()
    assert rows
    assert all(len(r["pair"]) == 2 for r in rows)
    vals = [(-(r["cnt"]), r["pair"]) for r in rows]
    assert vals == sorted(vals)


def test_bpe_pair_expansion_runs_on_vocab_not_corpus(spark, sf_dir):
    """The sequence/substr HOF must sit ABOVE the word-frequency
    aggregate (distinct vocab), not on the exploded corpus tokens, and
    the top-N must be a TakeOrderedAndProject."""
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(tx.bpe_pair_counts(spark, sf_dir), mode="formatted")
    assert "TakeOrderedAndProject" in plan, plan
    # the explode of pairs appears after (above) the first HashAggregate
    gen_pos = plan.find("Generate")
    agg_pos = plan.find("HashAggregate")
    assert gen_pos != -1 and agg_pos != -1


def test_bpe_encode_matches_independent_python(spark, sf_dir):
    """The chained-replace encoding must equal a from-scratch Python BPE
    apply (word -> char sequence, merges in rank order, str.replace) on
    every document — symbol counts AND the exact encoded text hash."""
    import hashlib

    from adk_noui_vectordb_spark.sources.tables import load_table

    merges = [
        r["pair"] for r in tx.bpe_pair_counts(spark, sf_dir, top_n=8).collect()
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_symbols"], r["encoded_hash"])
        for r in tx.tokenize_bpe_encode(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        ws = text.split(" ")
        enc = "\n".join(" ".join(w) for w in ws)
        for p in merges:
            enc = enc.replace(p[0] + " " + p[1], p)
        n_symbols = enc.count(" ") + len(ws)
        expect = (len(ws), n_symbols, hashlib.md5(enc.encode()).hexdigest())
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)


def test_bpe_encode_plan_is_shuffle_free_scan(spark, sf_dir):
    """The encode pass itself must be a pure projection over the text
    scan — the only shuffle in the WHOLE plan is the trainer's pair
    aggregation, which runs once driver-side before the plan is built,
    so the final encode plan has no Exchange at all."""
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(tx.tokenize_bpe_encode(spark, sf_dir), mode="simple")
    assert "Exchange" not in plan, plan


def test_q21_single_fact_join(spark, sf_dir):
    """The sole-late-supplier recovery must not scan the lineitem-orders
    join twice: exactly one join of the two fact tables in the plan."""
    # formatted mode lists each scan twice (tree node + detail block):
    # 3 scans (lineitem, orders, supplier) -> 6 mentions; a doubled fact
    # join would add 4 more
    plan = explain_str(rel.q21_waiting_suppliers(spark, sf_dir), mode="formatted")
    assert plan.count("Scan parquet") <= 6, plan


# ------------------------------------------------------------------ pagerank

def test_pagerank_mass_and_bounds(spark, sf_dir):
    """Every node gets the damping floor; supplier hubs (degree-rich)
    outrank leaf customers; total nodes = customers-with-orders +
    suppliers-with-lineitems."""
    from adk_noui_vectordb_spark.operators.graph import (
        pagerank_customer_supplier,
    )

    rows = pagerank_customer_supplier(spark, sf_dir).collect()
    assert rows
    base = 15 * 10**9 // 100
    assert all(r["p"] >= base for r in rows)
    supp = [r["p"] for r in rows if r["node"].startswith("s")]
    cust = [r["p"] for r in rows if r["node"].startswith("c")]
    assert supp and cust
    # ~100 suppliers absorb mass from ~1000+ customers: mean supplier
    # rank must exceed mean customer rank
    assert sum(supp) / len(supp) > sum(cust) / len(cust)


def test_pagerank_is_integer_exact(spark, sf_dir):
    """Two runs produce identical assignments (no float anywhere)."""
    from adk_noui_vectordb_spark.operators.graph import (
        pagerank_customer_supplier,
    )

    a = {r["node"]: r["p"] for r in
         pagerank_customer_supplier(spark, sf_dir).collect()}
    b = {r["node"]: r["p"] for r in
         pagerank_customer_supplier(spark, sf_dir).collect()}
    assert a == b


# -------------------------------------------------------- canonical selection

def test_canonical_selection_covers_all_docs(spark, sf_dir):
    """Cluster member counts must sum to the corpus size, and each
    canonical doc must belong to its own cluster."""
    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_canonical_selection,
    )

    rows = dedup_canonical_selection(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_members"] for r in rows) == n_docs
    assert all(r["n_members"] >= 1 for r in rows)


def test_canonical_selection_windows_share_partitioning(spark, sf_dir):
    """rank and member-count windows both key on cluster_id: the plan
    must contain exactly ONE exchange for the two window functions
    (Catalyst reuses the partitioning)."""
    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_canonical_selection,
    )
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(dedup_canonical_selection(spark, sf_dir), mode="simple")
    # two Window nodes, back to back, no exchange between them
    import re
    assert plan.count("Window") >= 1
    assert not re.search(r"Window[^\n]*\n[^\n]*Exchange[^\n]*\n[^\n]*Window", plan), plan


# ----------------------------------------------------- normalize / trend

def test_normalize_text_is_idempotent_and_clean(spark, sf_dir):
    """normalize(normalize(x)) == normalize(x); the output contains only
    [a-z0-9 ] single-spaced, and the reported token count matches the
    normalized text. (Normalization CAN grow the token count — 'a.b'
    becomes 'a b' — so no monotonicity is claimed.)"""
    import re

    rows = tx.normalize_text_corpus(spark, sf_dir).collect()
    assert rows
    pat = re.compile(r"^[a-z0-9]+( [a-z0-9]+)*$|^$")
    for r in rows:
        t = r["norm_text"]
        assert pat.match(t), repr(t[:80])
        # idempotence replayed in Python with the same semantics
        again = re.sub(r"  +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        assert again == t
        assert r["n_tokens_norm"] == len(t.split(" "))


def test_normalize_text_plan_has_no_shuffle(spark, sf_dir):
    """A normalization pass must be one narrow codegen'd projection —
    any Exchange in this plan would shuffle the whole corpus for
    nothing."""
    plan = explain_str(tx.normalize_text_corpus(spark, sf_dir), mode="simple")
    assert "Exchange" not in plan, plan


def test_trend_recovers_planted_slope(spark):
    """regr_slope/intercept on a synthetic exact line y = 3x + 7 (x in
    days) recovers slope 3, intercept 7, r2 = 1 in micro units."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import temporal as tp

    base_us = 1577836800 * 1_000_000  # the op's literal epoch
    rows = [
        (i, base_us + i * 86_400_000_000, 7.0 + 3.0 * i) for i in range(50)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(eid, us, v) for eid, us, v in rows],
            "event_id bigint, us bigint, value double",
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            F.lit(1).alias("user_id"),
            F.lit("linear").alias("event_type"),
            "value",
            F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        got = tp.trend_event_values(spark, tmp).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 50
    assert r["slope_micro_per_day"] == 3_000_000
    assert r["intercept_micro"] == 7_000_000
    assert r["r2_micro"] == 1_000_000


# ------------------------------------------------- histogram / anomaly

def test_histogram_conserves_orders_and_mass(spark, sf_dir):
    """Bucket counts and cent mass must sum to the table totals exactly
    (no order falls outside the bucketing, nothing double-counts)."""
    got = rel.histogram_order_totals(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    tot = got.agg(
        F.sum("n_orders").alias("n"), F.sum("total_cents").alias("c")
    ).head()
    want = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"),
    ).head()
    assert tot["n"] == want["n"]
    assert tot["c"] == want["c"]
    assert got.filter(F.col("bucket") < 0).count() == 0


def test_anomaly_zscore_tail_and_broadcast(spark, sf_dir):
    """|z| >= 2 flags a small tail (< 15% of events), every flagged row
    really exceeds the threshold, and the stats side is broadcast."""
    got = rel.events_anomaly_zscore(spark, sf_dir)
    rows = got.collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert 0 < len(rows) < 0.15 * n_events
    assert all(
        r["z_micro"] >= 2_000_000 or r["z_micro"] < -2_000_000 for r in rows
    )
    plan = explain_str(got, mode="simple")
    assert "BroadcastHashJoin" in plan, plan


# ------------------------------------------------- triangles / skew profile

def test_triangle_participation_invariants(spark, sf_dir):
    """Sum of per-node participation is exactly 3x the triangle total
    (each triangle has three corners), and no node can exceed C(24,2)
    (25 nations, complete-graph bound)."""
    from adk_noui_vectordb_spark.operators.graph import triangle_count_nations

    rows = triangle_count_nations(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_triangles"] for r in rows)
    assert total % 3 == 0
    assert all(0 < r["n_triangles"] <= 24 * 23 // 2 for r in rows)


def test_skew_profile_matches_exact_counts(spark, sf_dir):
    """Top keys and shares equal an exact recomputation; counts are
    returned heaviest-first with the id tie-break."""
    got = rel.skew_key_profile(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events").collect()
    from collections import Counter

    cnt = Counter(r["user_id"] for r in e)
    total = sum(cnt.values())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["user_id"], r["cnt"]) for r in got] == want
    for r in got:
        assert r["share_micro"] == r["cnt"] * 1_000_000 // total


# -------------------------------------------- rate limit / cluster histogram

def test_rate_limited_sample_keeps_earliest_per_user(spark, sf_dir):
    """Each user keeps at most cap rows, ranks are contiguous from 1,
    and the kept event_ids are exactly the user's earliest by
    (ts_ns, event_id)."""
    from adk_noui_vectordb_spark.operators import temporal as tp

    cap = 5
    got: dict[int, list] = {}
    for r in tp.events_rate_limited_sample(spark, sf_dir, cap=cap).collect():
        got.setdefault(r["user_id"], []).append((r["rn"], r["event_id"]))
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_ns"
    ).collect()
    by_user: dict[int, list] = {}
    for r in e:
        by_user.setdefault(r["user_id"], []).append((r["ts_ns"], r["event_id"]))
    for uid, kept in got.items():
        kept.sort()
        assert [k[0] for k in kept] == list(range(1, len(kept) + 1))
        assert len(kept) <= cap
        want = [ev for _, ev in sorted(by_user[uid])[:cap]]
        assert [k[1] for k in kept] == want


def test_cluster_size_histogram_conserves_docs(spark, sf_dir):
    """sum(cluster_size * n_clusters) equals the corpus size — every
    document lands in exactly one cluster."""
    from adk_noui_vectordb_spark.operators.dedup import (
        dup_cluster_size_histogram,
    )

    rows = dup_cluster_size_histogram(spark, sf_dir).collect()
    total = sum(r["cluster_size"] * r["n_clusters"] for r in rows)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs
    assert all(r["cluster_size"] >= 1 and r["n_clusters"] >= 1 for r in rows)


# ------------------------------------------------ unpivot / range window

def test_unpivot_round_trip_conserves_events(spark, sf_dir):
    """melt(pivot(events)) returns to the long form: total n_events
    equals the event count and every (user, type) cell matches the
    direct groupBy."""
    got = {
        (r["user_id"], r["event_type"]): r["n_events"]
        for r in rel.unpivot_event_matrix(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == e.count()


def test_trailing_range_window_matches_python_replay(spark, sf_dir):
    """The RANGE frame sum equals a brute-force replay over each user's
    (ts_us, v_micro) series — inclusive 60 s window, peers included."""
    import math

    rows = rel.window_trailing_value_sum(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns div 1000").alias("ts_us"), "value"
    ).collect()
    by_user: dict[int, list] = {}
    series = {}
    for r in e:
        v = math.floor(r["value"] * 1e6)
        by_user.setdefault(r["user_id"], []).append((r["ts_us"], v))
        series[r["event_id"]] = (r["user_id"], r["ts_us"])
    for r in rows[:500]:
        uid, ts = series[r["event_id"]]
        want = sum(
            v for (t, v) in by_user[uid] if ts - 60_000_000 <= t <= ts
        )
        assert r["trailing_sum_micro"] == want, (r, want)


def test_doc_token_entropy_bounds_and_extremes(spark, sf_dir):
    """0 <= H <= ln(n_distinct) (uniform bound, micro units with floor
    slack), single-token docs score 0, and a Python replay agrees."""
    import math

    rows = tx.doc_token_entropy(spark, sf_dir).collect()
    assert rows
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows[:300]:
        assert 0 <= r["entropy_micro"] <= math.ceil(
            math.log(max(r["n_distinct"], 1)) * 1e6
        )
        toks = docs[r["doc_id"]].split(" ")
        from collections import Counter

        cnt = Counter(toks)
        n = len(toks)
        want = sum(
            math.floor(-(c / n) * math.log(c / n) * 1e6)
            for c in cnt.values()
        )
        assert r["entropy_micro"] == want
        assert r["n_tokens"] == n and r["n_distinct"] == len(cnt)


# ------------------------------------------------ basket lift / user profile

def test_basket_lift_invariants(spark, sf_dir):
    """Lift is symmetric in construction (u < v canonical), n_ab can
    never exceed either single count, and lift = n_ab·N/(n_a·n_b) in
    exact micros for every returned pair."""
    rows = rel.basket_brand_lift(spark, sf_dir).collect()
    assert rows
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        l.join(p, l.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("b"))
        .distinct()
        .collect()
    )
    from collections import defaultdict

    baskets = defaultdict(set)
    for r in ob:
        baskets[r["okey"]].add(r["b"])
    n_orders = len(baskets)
    singles = defaultdict(int)
    pairs = defaultdict(int)
    for bs in baskets.values():
        for x in bs:
            singles[x] += 1
        for x in bs:
            for y in bs:
                if x < y:
                    pairs[(x, y)] += 1
    for r in rows:
        assert r["u"] < r["v"]
        assert r["n_ab"] == pairs[(r["u"], r["v"])]
        assert r["n_ab"] <= min(singles[r["u"]], singles[r["v"]])
        assert r["lift_micro"] == r["n_ab"] * n_orders * 1_000_000 // (
            singles[r["u"]] * singles[r["v"]]
        )


def test_user_profile_conserves_events(spark, sf_dir):
    """Per-type counts sum to n_events for every user, and the profile
    covers every user exactly once."""
    rows = rel.user_activity_profile(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    assert len(rows) == e.select("user_id").distinct().count()
    type_cols = ["n_click", "n_view", "n_purchase", "n_signup", "n_error"]
    for r in rows:
        assert sum(r[c] for c in type_cols) == r["n_events"]
        assert 1 <= r["active_days"]
        assert r["first_seen"] <= r["last_seen"]


def test_gap_stats_match_python_replay(spark, sf_dir):
    """Gap count/min/max/rank-selected median per user equal a
    brute-force replay over the sorted event series."""
    from adk_noui_vectordb_spark.operators import temporal as tp

    got = {r["user_id"]: r for r in tp.events_gap_stats(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_ns", "event_id"
    ).collect()
    series: dict[int, list] = {}
    for r in e:
        series.setdefault(r["user_id"], []).append((r["ts_ns"], r["event_id"]))
    import math

    for uid, evs in series.items():
        evs.sort()
        gaps = sorted(
            (b[0] - a[0]) // 1000 for a, b in zip(evs, evs[1:])
        )
        if not gaps:
            assert uid not in got
            continue
        r = got[uid]
        assert r["n_gaps"] == len(gaps)
        assert r["min_gap_us"] == gaps[0]
        assert r["max_gap_us"] == gaps[-1]
        assert r["median_gap_us"] == gaps[math.ceil(len(gaps) / 2) - 1]


def test_gopher_rules_fire_on_constructed_docs(spark, tmp_path):
    """Pin each Gopher rule's boundary on hand-built documents (the
    integer cross-multiplied thresholds must match the published
    ratios exactly)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators.textops import gopher_quality_flags

    good = "the a " + " ".join(f"word{i}" for i in range(60))  # wc=62, stops
    short = "the a tiny doc"  # wc < 50
    symbolic = "the a " + " ".join("#tag" for _ in range(60))  # all-# words
    bullety = "the a start\n" + "\n".join("- item line" for _ in range(30))
    rows = [(1, good), (2, short), (3, symbolic), (4, bullety)]
    base = str(tmp_path / "gopherdocs")
    os.makedirs(base)
    spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    ).write.parquet(os.path.join(base, "documents.parquet"))

    got = {r["doc_id"]: r for r in gopher_quality_flags(spark, base).collect()}
    assert got[1]["keep"] is True
    assert got[2]["wc_ok"] is False and got[2]["keep"] is False
    assert got[3]["sym_ok"] is False  # 60/62 '#' words >> 10% budget
    assert got[4]["bullet_ok"] is False  # 30/31 bullet lines > 90%
    for flags in got.values():  # every doc carries the two stopwords
        assert flags["stop_ok"] is True


def test_c4_line_filter_keeps_and_hashes_cleaned_lines(spark, tmp_path):
    """Pin the C4 line/page rules: terminal punctuation + >= 4 words
    keeps a line; lorem-ipsum / brace pages are dropped; clean_md5 is
    the md5 of exactly the kept lines."""
    import hashlib
    import os

    from adk_noui_vectordb_spark.operators.textops import c4_line_filter

    # ' the ' becomes a newline in the derived corpus (the established
    # line-derivation convention), so doc 3 splits into two lines.
    text = "this line is kept properly. the short one."
    doc = "keep me now please.\nno punct line\ntiny.\nlorem free line stays fine!"
    rows = [
        (1, doc, "en", "unit"),
        (2, "page has lorem ipsum inside. with words here.", "en", "unit"),
        (3, text, "en", "unit"),
    ]
    base = str(tmp_path / "c4docs")
    os.makedirs(base)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    ).write.parquet(os.path.join(base, "documents.parquet"))

    got = {r["path"]: r for r in c4_line_filter(spark, base).collect()}
    r1 = got["corpus/unit/doc_1.py"]
    # derived corpus prepends 'import os' (no punct, 2 words -> rejected);
    # doc 1 then keeps exactly its 1st and 4th own lines
    kept = ["keep me now please.", "lorem free line stays fine!"]
    assert r1["n_kept"] == 2
    assert r1["clean_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest()
    assert r1["page_kept"] is True
    r2 = got["corpus/unit/doc_2.py"]
    assert r2["page_kept"] is False  # lorem ipsum page rule
    # doc 3: 'this line is kept properly.' survives; 'short one.' (2
    # words after the ' the ' split) does not
    assert got["corpus/unit/doc_3.py"]["n_kept"] == 1


def test_minhash_index_update_equals_fresh_build(spark, sf_dir, tmp_path):
    """Incrementally signing a batch into the persisted MinHash index
    must equal a fresh build over the combined corpus (bands AND sigs —
    the shared kernel makes equality exact); a replaced doc's stale
    band rows retract; the gate serves a vector of the ingested docs
    one update later."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir, all_dir = str(tmp_path / "mhbase"), str(tmp_path / "mhall")
    os.makedirs(base_dir), os.makedirs(all_dir)
    docs.filter(F.col("doc_id") % 5 != 0).write.parquet(
        os.path.join(base_dir, "documents.parquet")
    )
    docs.write.parquet(os.path.join(all_dir, "documents.parquet"))

    dedup.build_minhash_index(spark, base_dir)
    v_inc = dedup.update_minhash_index(
        spark, base_dir, docs.filter(F.col("doc_id") % 5 == 0)
    )
    v_all = dedup.build_minhash_index(spark, all_dir)

    def bands(v):
        return {
            (r["doc_id"], r["band"], r["band_hash"])
            for r in spark.read.schema(dedup.MINHASH_BANDS_SCHEMA)
            .parquet(os.path.join(v, "bands"))
            .collect()
        }

    def sigs(v):
        return {
            (r["doc_id"],) + tuple(r[f"m{i}"] for i in range(dedup.NUM_HASHES))
            for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
            .parquet(os.path.join(v, "sigs"))
            .collect()
        }

    assert bands(v_inc) == bands(v_all)
    assert sigs(v_inc) == sigs(v_all)

    # replace: re-submit doc 1 with fresh text -> stale bands retracted
    before = bands(v_inc)
    old_rows_1 = {t for t in before if t[0] == 1}
    assert len(old_rows_1) == dedup.NUM_BANDS
    new1 = spark.createDataFrame(
        [(1, "entirely different replacement content words here")],
        "doc_id bigint, text string",
    )
    v2 = dedup.update_minhash_index(spark, base_dir, new1)
    after = bands(v2)
    assert {t for t in after if t[0] == 1}.isdisjoint(old_rows_1)
    assert {t for t in after if t[0] != 1} == {t for t in before if t[0] != 1}


def test_dedup_gate_flags_only_true_duplicates(spark, sf_dir, tmp_path):
    """The gate must flag an exact clone at matches=16 and pass a
    disjoint-vocabulary document with zero candidates (no shared
    shingles -> no shared band)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "gatebase")
    os.makedirs(base_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    clone_text = docs.filter(F.col("doc_id") == 3).head()["text"]
    batch = spark.createDataFrame(
        [
            (9_000_001, clone_text),
            (9_000_002, "zzq xqv wqj pqk qqm nqr vqt bqw"),  # alien vocab
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["new_doc_id"], r["dup_of"]): r["matches"]
        for r in dedup.dedup_gate_for(spark, base_dir, batch).collect()
    }
    assert got[(9_000_001, 3)] == dedup.NUM_HASHES
    assert not any(nd == 9_000_002 for nd, _ in got)


def test_minhash_update_crash_preserves_served_gate(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The versioning discipline holds for the MinHash index: a crash
    injected before the _CURRENT swing leaves the gate serving the old
    consistent version; re-running the update succeeds."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup
    from adk_noui_vectordb_spark.sources import versioning

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "mhcrash")
    os.makedirs(base_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    dedup.build_minhash_index(spark, base_dir)
    clone = docs.filter(F.col("doc_id") == 7).select(
        F.lit(7_000_007).cast("bigint").alias("doc_id"), "text"
    )
    gate_before = {
        (r["new_doc_id"], r["dup_of"])
        for r in dedup.dedup_gate_for(spark, base_dir, clone).collect()
    }
    assert (7_000_007, 7) in gate_before

    real = versioning.point_current

    def boom(root, name):
        raise RuntimeError("injected crash before commit point")

    monkeypatch.setattr(versioning, "point_current", boom)
    try:
        dedup.update_minhash_index(spark, base_dir, clone)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(versioning, "point_current", real)

    # served gate unchanged and consistent
    assert {
        (r["new_doc_id"], r["dup_of"])
        for r in dedup.dedup_gate_for(spark, base_dir, clone).collect()
    } == gate_before
    # recovery = re-run; afterwards the clone is indexed, so gating it
    # again ALSO surfaces itself-as-corpus (7_000_007 now indexed)
    v = dedup.update_minhash_index(spark, base_dir, clone)
    sigs = {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(os.path.join(v, "sigs"))
        .collect()
    }
    assert 7_000_007 in sigs


def test_delete_from_minhash_index_retracts_and_gate_forgets(
    spark, sf_dir, tmp_path
):
    """Targeted deletion from the MinHash index (r10, completing the
    delete family): the victim's band AND sig rows retract, a clone of
    the deleted doc subsequently passes the gate clean, other docs'
    rows are untouched, and deleting an absent id is a no-op."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = str(tmp_path / "mhdel")
    os.makedirs(base)
    docs.write.parquet(os.path.join(base, "documents.parquet"))
    v0 = dedup.build_minhash_index(spark, base)

    def rows(v, comp, schema):
        return {
            tuple(r)
            for r in spark.read.schema(schema)
            .parquet(os.path.join(v, comp))
            .collect()
        }

    bands0 = rows(v0, "bands", dedup.MINHASH_BANDS_SCHEMA)
    sigs0 = rows(v0, "sigs", dedup.MINHASH_SIGS_SCHEMA)
    victim_text = docs.filter(F.col("doc_id") == 7).head()["text"]

    # clone of doc 7 is flagged before deletion
    clone = spark.createDataFrame(
        [(9_000_007, victim_text)], "doc_id bigint, text string"
    )
    assert any(
        r["dup_of"] == 7
        for r in dedup.dedup_gate_for(spark, base, clone).collect()
    )

    v1 = dedup.delete_from_minhash_index(
        spark, base, spark.createDataFrame([(7,)], "doc_id bigint")
    )
    bands1 = rows(v1, "bands", dedup.MINHASH_BANDS_SCHEMA)
    sigs1 = rows(v1, "sigs", dedup.MINHASH_SIGS_SCHEMA)
    assert not any(t[0] == 7 for t in bands1)
    assert not any(t[0] == 7 for t in sigs1)
    assert bands1 == {t for t in bands0 if t[0] != 7}
    assert sigs1 == {t for t in sigs0 if t[0] != 7}

    # the gate no longer names the deleted doc
    assert not any(
        r["dup_of"] == 7
        for r in dedup.dedup_gate_for(spark, base, clone).collect()
    )

    # absent-id deletion is a no-op commit-wise
    v2 = dedup.delete_from_minhash_index(
        spark, base, spark.createDataFrame([(123456789,)], "doc_id bigint")
    )
    assert v2 == v1


# ------------------------------------------------- substring-dedup rewrite


def test_substring_rewrite_keeper_and_mask_semantics(spark, tmp_path):
    """dedup_substring_rewrite (Lee et al. exact-substring dedup as a
    rewrite): a shared 8-token span survives in exactly ONE of its
    occurrences (the md5-min occurrence key), a WITHIN-doc repeat masks
    its non-keeper copy, docs shorter than the window and unique docs
    are untouched, and n_removed counts distinct masked positions."""
    import os

    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_substring_rewrite,
    )

    span = " ".join(f"s{i}" for i in range(8))
    span_b = " ".join(f"t{i}" for i in range(8))
    rows = [
        # docs 1 and 2 share span A (cross-doc duplicate)
        (1, f"a1 a2 {span} a3 a4"),
        (2, f"b1 {span} b2 b3 b4 b5"),
        # doc 3 repeats its OWN span B twice (self-duplicate)
        (3, f"{span_b} c1 c2 {span_b}"),
        # doc 4: unique text, long enough to window
        (4, " ".join(f"u{i}" for i in range(12))),
        # doc 5: shorter than the window
        (5, "tiny doc"),
    ]
    base = str(tmp_path / "subdup")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        os.path.join(base, "documents.parquet")
    )
    out = {
        r["doc_id"]: r for r in dedup_substring_rewrite(spark, base).collect()
    }
    assert out[4]["n_removed"] == 0 and out[5]["n_removed"] == 0
    # untouched docs hash to their original text
    import hashlib

    assert out[5]["clean_md5"] == hashlib.md5(b"tiny doc").hexdigest()
    # the shared span is removed from SOME occurrences but kept in
    # exactly one: total kept copies of the span across docs 1-3 == 1.
    # Each doc's removal count is a multiple of full windows' coverage;
    # doc 3 lost at least one 8-token copy, docs 1+2 lost 8 tokens
    # between them (one keeps, one loses).
    removed_12 = out[1]["n_removed"] + out[2]["n_removed"]
    assert removed_12 == 8, (out[1], out[2])
    # doc 3's two non-overlapping copies of span B collapse to one:
    # exactly one 8-token copy masked
    assert out[3]["n_removed"] == 8, out[3]
    assert out[3]["n_tokens"] == 18


def test_containment_pairs_catch_subset_duplication(spark, tmp_path):
    """dedup_containment_pairs (PPJoin prefix filtering + exact verify):
    a short doc fully quoted inside a long one pairs with containment
    1.0 in the short->long direction even though its Jaccard is far
    below any dedup threshold; unrelated docs never pair; exact
    duplicates read 1.0 both ways."""
    import os

    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_containment_pairs,
    )

    quoted = "alpha beta gamma delta"
    rows = [
        (1, quoted),  # short doc
        (2, quoted + " " + " ".join(f"f{i}" for i in range(16))),  # superset
        (3, " ".join(f"z{i}" for i in range(10))),  # unrelated
        (4, "p q r s t"),
        (5, "p q r s t"),  # exact duplicate of 4
    ]
    base = str(tmp_path / "contain")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        os.path.join(base, "documents.parquet")
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in dedup_containment_pairs(spark, base, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2), (4, 5)}, got
    c12 = got[(1, 2)]
    assert c12[0] == 1.0  # the short doc's 2 shingles are both contained
    assert c12[1] == 0.1111  # 2 of the superset's 18 shingles back
    assert got[(4, 5)] == (1.0, 1.0)


def test_ppjoin_prefix_len_exact_boundary(spark):
    """ADVICE r14 #1: the prefix bound is n − ⌈t·n⌉ + 1 in exact integer
    arithmetic. The inexact-double formula floor((1−0.8)·n)+1 is one
    short exactly when (1−t)·n is integral (n divisible by 5 at t=0.8):
    floor(0.19999999999999996·5)+1 = 1, exact = 2 — a containment-
    exactly-0.8 pair needs both prefix shingles to stay complete."""
    import math

    from adk_noui_vectordb_spark.operators.dedup import ppjoin_prefix_len

    df = spark.range(1, 51).select(F.col("id").alias("n"))
    got = {
        r["n"]: r["p"]
        for r in df.select(
            "n", ppjoin_prefix_len(F.col("n"), 0.8).alias("p")
        ).collect()
    }
    for n in range(1, 51):
        assert got[n] == n - math.ceil(
            __import__("fractions").Fraction(4, 5) * n
        ) + 1, (n, got[n])
    # the motivating case: every multiple of 5 reads one LONGER than
    # the old double-floor formula
    for n in (5, 10, 25, 50):
        assert got[n] == n // 5 + 1
        assert got[n] == math.floor(0.19999999999999996 * n) + 1 + 1


def test_containment_gate_rejects_below_build_threshold(spark, sf_dir):
    """ADVICE r14 #2: the stored in_prefix flags are baked at
    CONTAIN_THRESHOLD; a lower gate threshold needs LONGER stored
    prefixes than the index has, so the gate refuses loudly instead of
    silently returning incomplete old-contained-in-new candidates.
    Thresholds >= the build threshold stay servable (prefix length is
    antitone in t, so stored prefixes remain complete)."""
    import pytest

    from adk_noui_vectordb_spark.operators.dedup import (
        CONTAIN_THRESHOLD,
        dedup_containment_gate_for,
    )
    from adk_noui_vectordb_spark.sources.tables import load_table

    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        .limit(3)
    )
    with pytest.raises(ValueError, match="below the"):
        dedup_containment_gate_for(
            spark, sf_dir, batch, threshold=CONTAIN_THRESHOLD - 0.1
        )
    # >= build threshold serves (stricter gate over the same prefixes)
    rows = dedup_containment_gate_for(
        spark, sf_dir, batch, threshold=0.9
    ).collect()
    assert all(
        max(r["cont_new_in_old"], r["cont_old_in_new"]) >= 0.9 for r in rows
    )


def test_knn_regress_predicts_within_neighbor_range(spark, sf_dir):
    """knn_regress: one row per query, the prediction is the exact mean
    of the 15 neighbors' n_chars (so it lies within the corpus range),
    and abs_error is self-consistent."""
    from adk_noui_vectordb_spark.operators.knn import knn_regress
    from adk_noui_vectordb_spark.sources.tables import load_table

    got = knn_regress(spark, sf_dir).collect()
    assert [r["query_id"] for r in got] == list(range(8))
    stats = (
        load_table(spark, sf_dir, "documents")
        .agg(F.min("n_chars"), F.max("n_chars"))
        .head()
    )
    lo, hi = stats[0], stats[1]
    for r in got:
        assert lo <= r["predicted_n_chars"] <= hi
        assert r["abs_error"] == abs(
            r["predicted_n_chars"] - r["true_n_chars"]
        )


def test_containment_gate_catches_clones_and_truncations(spark, sf_dir):
    """dedup_containment_gate: every re-keyed clone surfaces its
    original at containment 1.0 both ways, every truncated variant
    (first 12 words) surfaces the original at 1.0 in the new-in-old
    direction (its shingles are a prefix-subset of the original's) —
    the pair class a Jaccard gate misses — and no batch doc matches an
    unrelated corpus doc at 1.0 without sharing its shingles."""
    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_containment_gate,
    )
    from adk_noui_vectordb_spark.sources.tables import load_table

    rows = dedup_containment_gate(spark, sf_dir).collect()
    pairs = {(r["new_doc_id"], r["dup_of"]): r for r in rows}
    origs = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    ]
    assert origs
    for d in origs:
        clone = pairs[(1_000_000 + d, d)]
        assert (
            clone["cont_new_in_old"] == 1.0
            and clone["cont_old_in_new"] == 1.0
        ), clone
        trunc = pairs[(2_000_000 + d, d)]
        assert trunc["cont_new_in_old"] == 1.0, trunc


def test_containment_index_admit_and_replace(spark, tmp_path):
    """update_containment_index: an admitted doc becomes gate-visible
    (both directions), a re-submitted doc_id REPLACES its postings
    (stale shingles stop matching), and the frozen-dfs prefix flags
    keep candidate generation complete for exact clones."""
    import os

    from adk_noui_vectordb_spark.operators.dedup import (
        dedup_containment_gate_for,
        update_containment_index,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t3 = "one two three four five six seven eight nine"
    rows = [
        (1, t1),
        (2, " ".join(f"x{i}" for i in range(12))),
        (3, t3),
    ]
    base = str(tmp_path / "ing")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        os.path.join(base, "documents.parquet")
    )

    def gate(text):
        b = spark.createDataFrame(
            [(999, text)], "doc_id bigint, text string"
        )
        return {
            r["dup_of"]
            for r in dedup_containment_gate_for(spark, base, b).collect()
        }

    # before any admit: a clone of doc 1 surfaces only doc 1
    assert gate(t1) == {1}
    # admit id 100 with doc-1 text: the clone now surfaces both
    update_containment_index(
        spark,
        base,
        spark.createDataFrame([(100, t1)], "doc_id bigint, text string"),
    )
    assert gate(t1) == {1, 100}
    # REPLACE: resubmit id 100 with doc-3 text — the stale doc-1
    # postings must stop matching and the new ones must match
    update_containment_index(
        spark,
        base,
        spark.createDataFrame([(100, t3)], "doc_id bigint, text string"),
    )
    assert gate(t1) == {1}
    assert gate(t3) == {3, 100}


def test_dsir_selects_target_like_documents(spark, sf_dir):
    """dsir_importance_select: the importance ranking must concentrate
    the target slice — documents of the target language dominate the
    top-k (their hashed n-grams are exactly what the target LM upweights)
    — and weights are finite with n_feats = 2·words − 1 per doc."""
    from adk_noui_vectordb_spark.operators.textops import (
        dsir_importance_select,
    )

    rows = dsir_importance_select(
        spark, sf_dir, target_lang="en", k=100_000
    ).collect()
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    assert len(rows) == len(langs)  # k past corpus size = full ranking
    # the LM-affinity signal (per-feature mean ratio) must put the
    # target language strictly above every other language's mean —
    # the property DSIR's importance weights exist to capture; the raw
    # sum additionally carries document length (as in the paper)
    import collections

    by_lang = collections.defaultdict(list)
    for r in rows:
        by_lang[langs[r["doc_id"]]].append(r["log_weight"] / r["n_feats"])
    means = {l: sum(v) / len(v) for l, v in by_lang.items()}
    assert all(means["en"] > m for l, m in means.items() if l != "en"), means
    pernorm = sorted(
        rows, key=lambda r: (-r["log_weight"] / r["n_feats"], r["doc_id"])
    )[:50]
    frac_en = sum(1 for r in pernorm if langs[r["doc_id"]] == "en") / 50
    assert frac_en >= 0.8, frac_en
    # the raw top-50 is still enriched over the corpus base rate
    base = sum(1 for l in langs.values() if l == "en") / len(langs)
    top_frac = sum(1 for r in rows[:50] if langs[r["doc_id"]] == "en") / 50
    assert top_frac > base, (top_frac, base)
    words = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
        )
        .collect()
    }
    for r in rows:
        assert r["n_feats"] == 2 * words[r["doc_id"]] - 1, r
    # descending, deterministic tie-break
    ws = [r["log_weight"] for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_containment_fsck_green_after_build_and_admit(spark, tmp_path):
    """fsck_containment_index: all checks pass on a fresh build AND
    after an admit + doc-level replace (the write paths must preserve
    post≡grams, sizes, and the exact prefix-flag bound)."""
    import os

    from adk_noui_vectordb_spark.operators.dedup import (
        fsck_containment_index,
        update_containment_index,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, " ".join(f"x{i}" for i in range(10))),
    ]
    base = str(tmp_path / "cfsck")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        os.path.join(base, "documents.parquet")
    )
    assert all(ok for _, ok, _ in fsck_containment_index(spark, base)), (
        fsck_containment_index(spark, base)
    )
    update_containment_index(
        spark,
        base,
        spark.createDataFrame(
            [(50, "one two three four five six")],
            "doc_id bigint, text string",
        ),
    )
    # replace the admitted doc, then re-check every invariant
    update_containment_index(
        spark,
        base,
        spark.createDataFrame(
            [(50, "seven eight nine ten eleven twelve thirteen")],
            "doc_id bigint, text string",
        ),
    )
    got = fsck_containment_index(spark, base)
    assert all(ok for _, ok, _ in got), got


def test_containment_drift_advisory_and_rebuild(spark, tmp_path):
    """containment_drift_metrics + rebuild_containment_index (VERDICT
    r15 next #3): a clone-heavy admit under frozen dfs fattens the
    stored prefixes' true posting fanout — the metrics fire, the fsck
    prefix_drift row points at the rebuild, the rebuild resets the
    baseline, and the rebuilt index equals a fresh build over the
    combined corpus row-for-row across all four components."""
    import os

    from adk_noui_vectordb_spark.operators.dedup import (
        build_containment_index,
        containment_drift_metrics,
        fsck_containment_index,
        rebuild_containment_index,
        update_containment_index,
    )

    t1 = "alpha beta gamma delta epsilon zeta"
    t2 = " ".join(f"x{i}" for i in range(10))
    base = str(tmp_path / "drift")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id bigint, text string"
    ).write.parquet(os.path.join(base, "documents.parquet"))
    m0 = containment_drift_metrics(spark, base)
    assert m0["drifted"] is False, m0
    # admit 8 clones of doc 1: every stored prefix gk of doc 1 now
    # posts 9 docs — fanout and mass both blow past their thresholds
    update_containment_index(
        spark,
        base,
        spark.createDataFrame(
            [(100 + i, t1) for i in range(8)], "doc_id bigint, text string"
        ),
    )
    m1 = containment_drift_metrics(spark, base)
    assert m1["drifted"] is True, m1
    assert m1["mass_growth"] == 5.0 and m1["fanout_growth"] > 1.5, m1
    fsck = {c: (ok, d) for c, ok, d in fsck_containment_index(spark, base)}
    ok, detail = fsck["prefix_drift"]
    assert not ok and "rebuild_containment_index" in detail, fsck
    new_cur = rebuild_containment_index(spark, base)
    m2 = containment_drift_metrics(spark, base)
    assert m2["drifted"] is False and m2["mass_growth"] == 1.0, m2
    assert all(ok for _, ok, _ in fsck_containment_index(spark, base))
    # equality with a fresh build over the combined corpus
    base2 = str(tmp_path / "fresh")
    os.makedirs(base2, exist_ok=True)
    spark.createDataFrame(
        [(1, t1), (2, t2)] + [(100 + i, t1) for i in range(8)],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(base2, "documents.parquet"))
    cur2 = build_containment_index(spark, base2)
    for comp, schema in [
        ("post", "gk bigint, doc_id bigint, in_prefix boolean, gbucket int"),
        ("dfs", "gk bigint, df bigint, gbucket int"),
        ("grams", "doc_id bigint, gk bigint, sbucket int"),
        ("sizes", "doc_id bigint, n bigint, sbucket int"),
    ]:
        a = sorted(
            tuple(r)
            for r in spark.read.schema(schema)
            .parquet(os.path.join(new_cur, comp))
            .collect()
        )
        b = sorted(
            tuple(r)
            for r in spark.read.schema(schema)
            .parquet(os.path.join(cur2, comp))
            .collect()
        )
        assert a == b, comp


def test_dsir_explicit_target_corpus_ranks_target_like_first(
    spark, tmp_path
):
    """dsir_importance_select(target_docs=...): an explicit curated
    target corpus (the paper's actual recipe) pulls corpus documents
    that look like the TARGET to the top — independent of the lang
    column — and the default lang-slice path is unaffected by the
    refactor (same frame, same ranking)."""
    import os

    from adk_noui_vectordb_spark.operators.textops import (
        dsir_importance_select,
    )

    corpus = [
        (1, "en", "quantum physics lab entangled qubits decohere fast"),
        (2, "en", "braised pork recipe simmer garlic onions slowly"),
        (3, "en", "qubits entangled in the physics lab decohere"),
        (4, "en", "recipe for garlic soup simmer onions and pork"),
    ]
    base = str(tmp_path / "dsirt")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(
        corpus, "doc_id bigint, lang string, text string"
    ).write.parquet(os.path.join(base, "documents.parquet"))
    target = spark.createDataFrame(
        [
            (900, "entangled qubits decohere in a quantum physics lab"),
            (901, "physics lab measures entangled qubits"),
        ],
        "doc_id bigint, text string",
    )
    rows = dsir_importance_select(
        spark, base, k=4, target_docs=target
    ).collect()
    order = [r["doc_id"] for r in rows]
    assert set(order[:2]) == {1, 3}, order  # physics docs outrank cooking
    # per-feature affinity strictly separates the classes
    byid = {r["doc_id"]: r["log_weight"] / r["n_feats"] for r in rows}
    assert min(byid[1], byid[3]) > max(byid[2], byid[4]), byid


def test_containment_fsck_catches_zero_prefix_doc(spark, tmp_path):
    """ADVICE r15 #2 regression: a doc whose in_prefix rows were ALL
    lost (the worst short-prefix completeness break) must fail
    prefix_flags_exact_bound — the pre-fix inner join dropped such a
    doc from the comparison entirely and passed."""
    import os
    import shutil

    from adk_noui_vectordb_spark.operators.dedup import (
        build_containment_index,
        fsck_containment_index,
    )

    rows = [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")]
    base = str(tmp_path / "zp")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        os.path.join(base, "documents.parquet")
    )
    cur = build_containment_index(spark, base)
    assert all(ok for _, ok, _ in fsck_containment_index(spark, base))
    schema = "gk bigint, doc_id bigint, in_prefix boolean, gbucket int"
    post = spark.read.schema(schema).parquet(os.path.join(cur, "post"))
    tampered = post.withColumn(
        "in_prefix", F.col("in_prefix") & (F.col("doc_id") != 1)
    ).collect()
    shutil.rmtree(os.path.join(cur, "post"))
    spark.createDataFrame(tampered, schema).write.partitionBy(
        "gbucket"
    ).parquet(os.path.join(cur, "post"))
    got = {c: ok for c, ok, _ in fsck_containment_index(spark, base)}
    assert got["prefix_flags_exact_bound"] is False, got


def _write_events(spark, base, rows):
    import os

    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))


def test_events_funnel_conversion_semantics(spark, tmp_path):
    """Earliest-completion ordered funnel: a user converting inside the
    horizon advances; a click past the horizon or an out-of-order
    purchase (no prior view) never counts."""
    from datetime import datetime as dt

    from adk_noui_vectordb_spark.operators.relational import (
        events_funnel_conversion,
    )

    base = str(tmp_path / "fe")
    _write_events(
        spark,
        base,
        [
            # A completes: view 10:00 → click 10:30 → purchase 11:00
            (1, dt(2024, 1, 7, 10, 0), 1, "view", 1.0, "{}"),
            (2, dt(2024, 1, 7, 10, 30), 1, "click", 1.0, "{}"),
            (3, dt(2024, 1, 7, 11, 0), 1, "purchase", 1.0, "{}"),
            # B's click lands 25h after the first view: outside 24h
            (4, dt(2024, 1, 7, 10, 0), 2, "view", 1.0, "{}"),
            (5, dt(2024, 1, 8, 11, 0), 2, "click", 1.0, "{}"),
            # C views only
            (6, dt(2024, 1, 7, 9, 0), 3, "view", 1.0, "{}"),
            # D clicks and purchases with NO view: in no stage
            (7, dt(2024, 1, 7, 9, 0), 4, "click", 1.0, "{}"),
            (8, dt(2024, 1, 7, 9, 5), 4, "purchase", 1.0, "{}"),
        ],
    )
    got = {
        r["stage"]: (r["users"], r["total_gap_s"])
        for r in events_funnel_conversion(spark, base).collect()
    }
    assert got == {
        "1_view": (3, 0),
        "2_click": (1, 1800),
        "3_purchase": (1, 3600),
    }, got


def test_events_retention_cohorts_semantics(spark, tmp_path):
    """Cohort = first signup day; two active days inside one offset week
    count the user ONCE; pre-signup activity is out of scope; the week
    label is the cohort day's Sunday."""
    from datetime import datetime as dt

    from adk_noui_vectordb_spark.operators.relational import (
        events_retention_cohorts,
    )

    base = str(tmp_path / "re")
    _write_events(
        spark,
        base,
        [
            # A: signup Sun 01-07; active 01-15 + 01-16 (offset 1, one
            # user-week), 01-21 (offset 2)
            (1, dt(2024, 1, 7, 8, 0), 1, "signup", 1.0, "{}"),
            (2, dt(2024, 1, 15, 8, 0), 1, "click", 1.0, "{}"),
            (3, dt(2024, 1, 16, 8, 0), 1, "view", 1.0, "{}"),
            (4, dt(2024, 1, 21, 8, 0), 1, "purchase", 1.0, "{}"),
            # B: signup Wed 01-10 (same Sunday-aligned cohort week);
            # pre-signup activity 01-05 excluded; 01-18 is offset 1
            (5, dt(2024, 1, 5, 8, 0), 2, "view", 1.0, "{}"),
            (6, dt(2024, 1, 10, 8, 0), 2, "signup", 1.0, "{}"),
            (7, dt(2024, 1, 18, 8, 0), 2, "click", 1.0, "{}"),
        ],
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["active_users"]
        for r in events_retention_cohorts(spark, base).collect()
    }
    assert got == {
        ("2024-01-07", 0): 2,
        ("2024-01-07", 1): 2,
        ("2024-01-07", 2): 1,
    }, got


def test_events_cohort_revenue_semantics(spark, tmp_path):
    """Revenue lands in the purchaser's signup-cohort cell in exact
    cents; pre-signup purchases and users who never signed up are out
    of scope; two purchases in one offset week sum."""
    from datetime import datetime as dt

    from adk_noui_vectordb_spark.operators.relational import (
        events_cohort_revenue,
    )

    base = str(tmp_path / "cr")
    _write_events(
        spark,
        base,
        [
            (1, dt(2024, 1, 7, 8, 0), 1, "signup", 1.0, "{}"),
            # offset 0: $1.50
            (2, dt(2024, 1, 8, 8, 0), 1, "purchase", 1.50, "{}"),
            # offset 1: $2.25 + $0.10 in the same week sum to 235 cents
            (3, dt(2024, 1, 16, 8, 0), 1, "purchase", 2.25, "{}"),
            (4, dt(2024, 1, 17, 8, 0), 1, "purchase", 0.10, "{}"),
            # pre-signup purchase: excluded
            (5, dt(2024, 1, 5, 8, 0), 1, "purchase", 9.99, "{}"),
            # user 2 never signed up: no cohort, ignored
            (6, dt(2024, 1, 9, 8, 0), 2, "purchase", 5.00, "{}"),
        ],
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["revenue_cents"]
        for r in events_cohort_revenue(spark, base).collect()
    }
    assert got == {("2024-01-07", 0): 150, ("2024-01-07", 1): 235}, got
