"""Wall-time scaling exponents across sf0.001/0.01/0.1 (VERDICT r5 item 8).

For each headline key, time the query at every SF (best-of-N) and fit the
log-log slope of wall time against the PRIMARY INPUT's actual row count
(the testdata does not scale every table by sf: documents is 500/500/5000,
embeddings 500/500/2000, so sf alone would understate the step). Slope
~<= 1.2 is the strongest local[32] evidence available that a plan is
O(n log n)-shaped — a banded self-join gone quadratic reads ~2 immediately.
Fixed per-query overhead (JVM job launch, Python worker pool) flattens the
small-SF points, so the slope UNDERSTATES the asymptotic exponent; it is a
quadratic-behavior detector, not a precise model.

Usage: python tools/scaling_exponents.py  -> markdown table on stdout
(paste into BASELINE.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]
RUNS = 2

# key -> primary input table (for the x-axis row counts)
KEYS = {
    "dedup_minhash_pairs": "documents",
    "dedup_connected_components": "documents",
    "ngram_jaccard_pairs": "documents",
    "simhash_signatures": "documents",
    "dedup_embedding_cosine": "embeddings",
    "semdedup_prune": "embeddings",
    "cluster_kmeans": "embeddings",
    "knn_topk": "embeddings",
    "ann_rp_lsh_topk": "embeddings",
    "knn_pq_rerank": "embeddings",
    "curate_corpus": "documents",
    "winnow_fingerprints": "documents",
    "decontaminate_corpus": "documents",
    "q1_pricing_summary": "lineitem",
    "q9_brand_profit": "lineitem",
    "q18_large_orders": "lineitem",
    "q21_waiting_suppliers": "lineitem",
    "events_sessionize": "events",
    "events_funnel_conversion": "events",
    "events_retention_cohorts": "events",
    "events_cohort_revenue": "events",
    "events_tumbling_counts": "events",
    "asof_join_purchase_click": "events",
    "range_join_bursts": "events",
    "pagerank_trade_graph": "lineitem",
    "lang_id_ngram": "documents",
    "tokenize_bpe_encode": "documents",
    "ann_ivf_trained_topk": "embeddings",
    "dedup_simhash_pairs": "documents",
    "dedup_substring_rewrite": "documents",
    # r7b additions
    "bm25_topk_served": "documents",
    "bm25_folded_topk_served": "documents",
    "lm_bigram_score": "documents",
    "embed_topvar_project": "embeddings",
    "sketch_user_overlap": "events",
    "normalize_text_corpus": "documents",
    "trend_event_values": "events",
    "histogram_order_totals": "orders",
    "events_anomaly_zscore": "events",
    "dedup_repeated_ngrams": "documents",
    "sketch_heavy_hitters": "documents",
    "bloom_filter_orders": "orders",
    "zorder_events": "events",
    "scd2_user_state_history": "events",
    # r7c additions
    "knn_join_topk": "embeddings",
    "doc_token_entropy": "documents",
    "unpivot_event_matrix": "events",
    "window_trailing_value_sum": "events",
    "events_rate_limited_sample": "events",
    "dup_cluster_size_histogram": "documents",
    "skew_key_profile": "events",
    "triangle_count_nations": "lineitem",
    "hybrid_rrf_served_topk": "documents",
    "basket_brand_lift": "lineitem",
    "user_activity_profile": "events",
    # r9 additions
    "text_index_doc_map": "documents",
    "rp_index_vec_rows": "embeddings",
    "gopher_quality_flags": "documents",
    "c4_line_filter": "documents",
    # r10 additions
    "dedup_gate_against_index": "documents",
    "dedup_gate_intra_batch": "documents",
    "ann_ivfpq_topk": "embeddings",
    "knn_join_ivf_topk": "embeddings",
    "ann_graph_topk": "embeddings",
    "ann_graph_batch_topk": "embeddings",
    "ann_graph_tombstone_topk": "embeddings",
    "ann_graph_vacuumed_topk": "embeddings",
    "ann_graph_filtered_topk": "embeddings",
    # r13 additions
    "ann_graph_recursive_topk": "embeddings",
    "ann_graph_acorn_topk": "embeddings",
    "ann_graph_acorn_batch_topk": "embeddings",
    "collection_query_graph_acorn_topk": "embeddings",
    "knn_classify": "embeddings",
    "knn_regress": "embeddings",
    "dedup_containment_pairs": "documents",
    "dedup_containment_gate": "documents",
    "split_train_holdout": "documents",
    "binq_hamming_topk": "embeddings",
    "ann_binq_ivf_topk": "embeddings",
    "ann_binq_topk": "embeddings",
    "hybrid_weighted_topk": "documents",
    "hybrid_weighted_served_topk": "documents",
    "hybrid_weighted_graph_topk": "documents",
    "events_rollup_daily": "events",
    "events_rollup_type_daily": "events",
    # r10b additions (query-language + filtered-ANN serving layer)
    "boolean_and_topk": "documents",
    "boolean_or_not_topk": "documents",
    "phrase_topk_served": "documents",
    "prefix_topk_served": "documents",
    "proximity_topk_served": "documents",
    "knn_truncated_rerank": "embeddings",
    "ann_rp_lsh_filtered_topk": "embeddings",
    # r10c additions (where DSL, collection facade, fuzzy, shards)
    "docs_where_dsl_filter": "documents",
    "knn_where_dsl_topk": "embeddings",
    "collection_query_topk": "embeddings",
    "collection_query_graph_topk": "embeddings",
    "collection_query_graph_batch_topk": "embeddings",
    "collection_get_where": "documents",
    "fuzzy_topk_served": "documents",
    "shard_manifest_counts": "documents",
    "chunked_maxsim_topk": "documents",
    "late_interaction_topk": "documents",
    "late_interaction_topk_served": "documents",
    "late_interaction_batch_topk_served": "documents",
    "late_interaction_filtered_topk_served": "documents",
    "late_interaction_topk_ingested": "documents",
    "late_interaction_where_topk_served": "documents",
    "late_interaction_explain_served": "documents",
    "dedup_containment_gate_ingested": "documents",
    "dsir_importance_select": "documents",
    "ann_grouped_topk": "embeddings",
    # r11 additions
    "knn_mmr_topk": "embeddings",
    "ann_ivf_sampled_topk": "embeddings",
    "collection_get_page2": "documents",
    "collection_query_ip_topk": "embeddings",
    "ann_ivfpq_sampled_topk": "embeddings",
}


def main() -> None:
    from adk_noui_vectordb_spark.session import get_spark

    # optional argv key filter: `python tools/scaling_exponents.py key1 key2`
    global KEYS
    if len(sys.argv) > 1:
        KEYS = {k: KEYS[k] for k in sys.argv[1:]}

    spark = get_spark(app_name="scaling-exponents")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    counts: dict[tuple[str, str], int] = {}
    for sf in SFS:
        for t in set(KEYS.values()):
            counts[(sf, t)] = (
                spark.read.parquet(f"/root/testdata/sf{sf}/{t}.parquet").count()
            )
    # warm
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()

    rows_out = []
    for key, table in KEYS.items():
        xs, ys = [], []
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            xs.append(counts[(sf, table)])
            ys.append(best)
        # collapse duplicate x (tables that do not scale between SFs):
        # keep the fastest time per distinct size
        by_n: dict[int, float] = {}
        for n, t in zip(xs, ys):
            by_n[n] = min(t, by_n.get(n, float("inf")))
        pts = sorted(by_n.items())
        if len(pts) < 2:
            slope = float("nan")
        else:
            lx = [math.log(n) for n, _ in pts]
            ly = [math.log(t) for _, t in pts]
            mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
            denom = sum((x - mx) ** 2 for x in lx)
            slope = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / denom
        rows_out.append((key, table, pts, slope))
        print(
            f"# {key}: " + " ".join(f"n={n}:{t:.3f}s" for n, t in pts)
            + f" slope={slope:.2f}",
            file=sys.stderr,
            flush=True,
        )

    print("| key | input | t(n) per distinct size | exponent |")
    print("|---|---|---|---|")
    for key, table, pts, slope in sorted(rows_out, key=lambda r: -r[3]):
        series = ", ".join(f"{n}: {t:.2f}s" for n, t in pts)
        print(f"| `{key}` | {table} | {series} | **{slope:.2f}** |")
    spark.stop()


if __name__ == "__main__":
    main()
