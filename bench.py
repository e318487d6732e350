"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized via a count-style action (collect for
small results) after a warm-up of the input scans; times are wall-clock
per query on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

from adk_noui_vectordb_spark.session import get_spark

# A bench run whose fixed control workload exceeds this many seconds ran
# on a contended machine (quiet band 0.9-1.2 s across r10-r14; the r14
# driver run read 4.157) — its JSON gets "weather": true and its per-key
# timings must not move bands. See BASELINE.md's validity rule.
WEATHER_CAL_LIMIT = 2.0

# Headline set: one per operator family, the ones whose plans matter at scale.
BENCH_KEYS = [
    "knn_topk",
    "knn_batch_topk",
    "dedup_minhash_pairs",
    "dedup_gate_against_index",
    "dedup_gate_intra_batch",
    "dedup_connected_components",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "dedup_embedding_cosine",
    "dedup_substring_rewrite",
    "chunk_fixed_words",
    "text_stats",
    "quality_score",
    "late_interaction_topk",
    "late_interaction_topk_served",
    "late_interaction_batch_topk_served",
    "late_interaction_filtered_topk_served",
    "late_interaction_topk_ingested",
    "late_interaction_where_topk_served",
    "late_interaction_explain_served",
    "dsir_importance_select",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "window_topn_orders",
    "events_sessionize",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_cohort_revenue",
    "events_tumbling_counts",
    "asof_join_purchase_click",
    "range_join_bursts",
    "rollup_segment_status",
    "agg_percentiles",
    "curate_corpus",
    "multimodal_features",
    "pivot_event_matrix",
    "q9_brand_profit",
    "retention_day_over_day",
    "chunk_ast_python",
    "quality_repetition",
    "hybrid_rrf_topk",
    "knn_int8_rerank",
    "q18_large_orders",
    "decontaminate_corpus",
    "bm25_topk",
    "bm25_folded_topk_served",
    "chunk_js_elements",
    "line_dedup_corpus",
    "pack_sequences",
    "redact_pii",
    "q10_returned_revenue",
    "lm_perplexity_score",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "pagerank_trade_graph",
    "cluster_kmeans",
    "semdedup_prune",
    "knn_pq_rerank",
    "ann_rp_lsh_topk",
    "ann_ivf_trained_topk",
    "ann_ivfpq_topk",
    "knn_join_ivf_topk",
    "ann_graph_topk",
    "ann_graph_batch_topk",
    "ann_graph_tombstone_topk",
    "ann_graph_vacuumed_topk",
    "ann_graph_filtered_topk",
    "ann_graph_recursive_topk",
    "ann_graph_acorn_topk",
    "ann_graph_acorn_batch_topk",
    "ann_binq_topk",
    "ann_binq_ivf_topk",
    "hybrid_weighted_topk",
    "hybrid_weighted_served_topk",
    "hybrid_weighted_graph_topk",
    # r14 (VERDICT r13 next #7): the r13 cost classes that were not yet
    # bench-visible — MVCC read-pin + rollback pointer swing (the
    # versioning path), content-keyed split, kNN label vote
    "collection_get_snapshot",
    "collection_rollback_get",
    "split_train_holdout",
    "knn_classify",
    # r14 additions
    "knn_regress",
    "dedup_containment_pairs",
    "dedup_containment_gate",
    "dedup_containment_gate_ingested",
    "events_rollup_daily",
    "tokenize_bpe_encode",
    # r7 additions
    "dedup_repeated_ngrams",
    "sketch_heavy_hitters",
    "bloom_filter_orders",
    "zorder_events",
    "scd2_user_state_history",
    "bm25_topk_served",
    # r10: boolean / phrase / truncated-dim serving layer
    "boolean_and_topk",
    "phrase_topk_served",
    "knn_truncated_rerank",
    # r10b: batch serving shapes (M queries, one probe + one pass)
    "bm25_batch_topk_served",
    "ann_rp_lsh_batch_topk",
    "lm_bigram_score",
    "sketch_user_overlap",
    "embed_topvar_project",
    "normalize_text_corpus",
    "trend_event_values",
    "histogram_order_totals",
    "events_anomaly_zscore",
    "hybrid_rrf_served_topk",
    "skew_key_profile",
    "triangle_count_nations",
    "knn_join_topk",
    # r10c: ChromaDB-compatible Collection facade + full where DSL
    "collection_query_topk",
    "collection_query_graph_topk",
    "collection_query_graph_batch_topk",
    "knn_where_dsl_topk",
    "fuzzy_topk_served",
    # r11: sample-trained IVF serving, MMR diversification, keyset page
    "ann_ivf_sampled_topk",
    "ann_ivfpq_sampled_topk",
    "knn_mmr_topk",
    "collection_get_page2",
]


def _bench_files_newest_first() -> "list[str]":
    """BENCH_r*.json paths, newest round first — shared by the per-query
    and calibration history readers."""
    rounds: list[tuple[int, str]] = []
    for p in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    return [p for _, p in sorted(rounds, reverse=True)]


def _previous_bench() -> dict[str, float]:
    """Per-query timings from the newest BENCH_r*.json that has any.

    Walks rounds newest-first so a crashed round (r4: rc=1, no stdout)
    falls back to the last round with real numbers.
    """
    for path in _bench_files_newest_first():
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # Driver files wrap the bench JSON line under "parsed" — which is
        # null (key PRESENT) when the driver's parser failed, so
        # .get("parsed", data) would keep the None and crash (the r4 bug).
        parsed = data.get("parsed") or data
        queries = parsed.get("queries") if isinstance(parsed, dict) else None
        if queries:
            return queries
        # Recover from the driver's raw 2000-char output tail (r3: the
        # JSON line was longer than the tail window, so "parsed" is null
        # but most per-query pairs survive in the tail). Only the queries
        # object — before "runs_per_query" — and only known bench keys.
        head = (data.get("tail") or "").split('"runs_per_query"')[0]
        out: dict[str, float] = {}
        for m in re.finditer(r'"([a-z0-9_]+)"\s*:\s*(\d+(?:\.\d+)?)', head):
            if m.group(1) in BENCH_KEYS and m.group(1) not in out:
                out[m.group(1)] = float(m.group(2))
        if out:
            return out
    return {}


def _previous_calibration() -> "float | None":
    """The newest recorded calibration metric, for machine-drift
    normalization of cross-round totals (VERDICT r7/r8 next: r7 burned
    judge time proving a 1.24x 'slowdown' was environmental)."""
    for path in _bench_files_newest_first():
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = data.get("parsed") or data
        cal = parsed.get("calibration") if isinstance(parsed, dict) else None
        if cal:
            return float(cal)
        m = re.search(r'"calibration"\s*:\s*(\d+(?:\.\d+)?)', data.get("tail") or "")
        if m:
            return float(m.group(1))
    return None


def _calibration_run(spark) -> float:
    """Machine-speed control: a FIXED synthetic workload (hash + two
    aggregates over 20M generated rows, no input data, 32 fixed
    partitions) timed best-of-3 exactly like the real keys. Its runtime
    moves with container CPU weather (documented swings up to 1.4x,
    BASELINE.md), not with this repo's code, so
    total_A / total_B adjusted by calibration_B / calibration_A
    separates machine drift from real regressions in one division."""
    from pyspark.sql import functions as F

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.col("id") % 9973).alias("k"),
                F.md5(F.col("id").cast("string")).alias("h"),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mx"))
            .agg(F.count(F.lit(1)).alias("cells"), F.max("mx").alias("top"))
            .collect()
        )
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _calibration_jobs_run(spark) -> float:
    """Second machine-speed control (VERDICT r12 next #5): a FIXED
    sequence of 20 one-task jobs (tiny range counts — no shuffle, no
    input, nothing to compute). The CPU control above cannot see
    scheduler/FS dimension weather — the gate family's recorded swings
    (BASELINE.md r9d/r10-close/r12) move with JOB-LAUNCH latency, which
    this control isolates: its runtime is ~pure driver→scheduler→
    executor round-trip cost × 20. Attribution rule (BASELINE.md):
    compare CPU-shaped keys against ``calibration`` drift and
    many-small-jobs keys (gate prologues, point-read serving probes)
    against ``calibration_jobs`` drift; a key that regresses on BOTH
    normalizations is a real regression."""
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(20):
            spark.range(i, i + 10, 1, 1).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="adk-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # Warm the JVM once (codegen, broadcast machinery, Python worker pool)
    # so the first timed query doesn't absorb one-time startup cost.
    from pyspark.sql import functions as F

    warm = spark.range(1000).withColumn("v", F.col("id") * 2)
    warm.join(F.broadcast(spark.range(10)), "id").count()
    spark.createDataFrame([(1.0,)], "x double").groupBy().applyInPandas(
        lambda pdf: pdf, "x double"
    ).count()
    # Warm the parquet reader path with the 5-row region table (never a
    # benchmarked input), so the first timed query doesn't absorb it.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    calibration = _calibration_run(spark)
    calibration_jobs = _calibration_jobs_run(spark)
    print(
        f"# calibration: {calibration:.3f}s jobs: {calibration_jobs:.3f}s",
        file=sys.stderr,
        flush=True,
    )

    qs = entrymod.queries()
    prev = _previous_bench()
    timings: dict[str, float] = {}
    # best-of-3: machine load varies runs by up to 2x (BASELINE.md); the
    # min over 3 is the stable steady-state signal for regression deltas
    RUNS = 3
    for key in BENCH_KEYS:
        fn = qs[key]
        best, n = None, 0
        for _ in range(RUNS):
            # Time plan construction + execution together: iterative
            # operators (connected components) do eager work at build time.
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[key] = round(best, 3)
        # progress to stderr — stdout carries ONLY the final JSON line
        delta = (
            f" [prev {prev[key]:.3f}s, {timings[key] - prev[key]:+.3f}]"
            if key in prev
            else ""
        )
        print(
            f"# {key}: {timings[key]:.3f}s ({n} rows){delta}",
            file=sys.stderr,
            flush=True,
        )

    total = round(sum(timings.values()), 3)
    # Delta summary vs the latest BENCH_r*.json goes to STDERR: the driver
    # keeps only the last 2000 chars of output and parses the final JSON
    # line from it, so the stdout line must stay well under 2000 chars —
    # r3's line with embedded deltas exceeded the window and parsed as null.
    if prev:
        prev_total = round(sum(prev[k] for k in timings if k in prev), 3)
        deltas = {k: round(timings[k] - prev[k], 3) for k in timings if k in prev}
        worst = sorted(deltas.items(), key=lambda kv: -kv[1])[:5]
        print(
            f"# prev_total_same_keys={prev_total} worst_deltas={worst}",
            file=sys.stderr,
            flush=True,
        )
        prev_cal = _previous_calibration()
        if prev_cal:
            # machine-drift-normalized comparison: scale the previous
            # total by how much SLOWER/FASTER this machine runs the
            # fixed control workload today than it did then.
            norm_prev = round(prev_total * calibration / prev_cal, 3)
            print(
                f"# prev_calibration={prev_cal} today={calibration} "
                f"drift={calibration / prev_cal:.3f}x -> "
                f"normalized_prev_total={norm_prev}",
                file=sys.stderr,
                flush=True,
            )
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": dict(timings),
        "runs_per_query": RUNS,
        "agg": "min",
        "calibration": calibration,
        "calibration_jobs": calibration_jobs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Validity rule (BASELINE.md r15, motivated by the r14 driver run at
    # calibration 4.157 vs the 0.9-1.2 quiet band): a run whose control
    # workload took > WEATHER_CAL_LIMIT seconds ran on a contended
    # machine — its per-key timings are weather, not code, and MUST NOT
    # move performance bands. The flag rides the JSON so history readers
    # can filter mechanically.
    if calibration > WEATHER_CAL_LIMIT:
        payload["weather"] = True
        print(
            f"# WEATHER: calibration {calibration:.3f}s exceeds the "
            f"{WEATHER_CAL_LIMIT}s validity limit — machine contended; "
            "do not move bands on this run",
            file=sys.stderr,
            flush=True,
        )
    line = json.dumps(payload, separators=(",", ":"))
    # Never crash on length (a crash = zero perf evidence for the round,
    # the r4 failure mode): if the key set outgrows the window, shed the
    # FASTEST queries — the slow ones are the informative ones — and say so.
    while len(line) >= 1900 and payload["queries"]:
        fastest = min(payload["queries"], key=payload["queries"].get)
        payload["queries"].pop(fastest)
        payload["queries_dropped"] = len(timings) - len(payload["queries"])
        line = json.dumps(payload, separators=(",", ":"))
    if "queries_dropped" in payload:
        print(
            f"# WARNING: dropped {payload['queries_dropped']} fastest query "
            "timings to fit the driver's 2000-char output tail",
            file=sys.stderr,
            flush=True,
        )
    # stop() BEFORE the final print: the driver may capture stderr merged
    # with stdout, and JVM shutdown noise after the JSON line could push it
    # out of the 2000-char tail window. But a stop() failure must NOT
    # suppress the result line (that would be the zero-perf-evidence r4
    # failure mode all over again) — swallow it and print regardless.
    try:
        spark.stop()
    except Exception as exc:  # noqa: BLE001 — shutdown noise is non-fatal
        print(f"# spark.stop() failed: {exc!r}", file=sys.stderr, flush=True)
    print(line, flush=True)


if __name__ == "__main__":
    main()
