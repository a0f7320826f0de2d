"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to execute fully (count via a noop aggregation
on the result — not collect, so driver memory stays flat) and timed
wall-clock. First a warm-up pass primes the JVM/code-cache so the
numbers reflect steady-state executor throughput, which is what
matters at cluster scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_eamples_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

# headline set: the heaviest / most representative operators
HEADLINE = [
    "metric_groupby_agg",
    "join_time_range",
    "join_star_3way",
    "join_left_outer",
    "window_topk_per_group",
    "window_running_sum",
    "order_limit_topk",
    "metric_grouping_sets",
    "string_chunk",
    "concat_report_rows",
    "join_asof",
    "metric_compiled_star",
    "join_salted_skew",
    "agg_percentiles",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "similarity_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "text_token_stats",
    "text_decontaminate",
    "pack_concat_chunks",
    "doc_fingerprint",
    "doc_winnow_fingerprint",
    "multimodal_features_flat",
    "stream_tumbling_count",
    "stream_session_agg",
    "sessionize_events",
    "join_range_binned",
    "stream_interval_join",
    "embedding_quantize_int8",
    "date_spine",
    "incremental_merge_upsert",
    "text_bm25_search",
    "dq_schema_tests",
    "text_keyword_extract",
    "rfm_segmentation",
    "stream_sliding_count",
    "agg_equi_depth_histogram",
    "agg_trend_slope",
    "dedup_incremental_minhash",
    "sample_quality_weighted",
    "events_funnel",
    "retention_cohort",
    "agg_mode_per_group",
    "events_transition_matrix",
    "agg_zscore_outliers",
    "text_word_entropy",
    # round-3 additions
    "market_basket_pairs",
    "abc_pareto_class",
    "embedding_random_projection",
    "dedup_containment",
    "agg_correlation",
    # round-4 additions
    "events_user_path",
    "ts_gap_fill",
    "text_line_dedup",
    "embedding_pq_encode",
    "text_perplexity_unigram",
    "dedup_semantic_clusters",
    "sample_train_test_split",
    "agg_mad_outliers",
    "events_attribution_last_touch",
    "similarity_pq_topk",
    "embedding_pq_encode_trained",
    "metric_compiled_growth",
    "table_profile",
    "similarity_pq_rerank_topk",
    "text_pii_scan",
    "corpus_quality_filter",
    "events_anomaly_rolling",
    "events_dau_wau_mau",
    "text_ngram_topk",
    "sample_source_temperature",
    "table_diff",
    "agg_weighted_percentile",
    "events_inter_arrival",
    "join_bloom_prefilter",
    "agg_skewness_kurtosis",
    "stream_late_data_metrics",
    "metric_compiled_derived",
    "similarity_knn_graph",
    # round-4 second wave
    "metric_compiled_conversion",
    "agg_kmv_distinct",
    "agg_market_share",
    "orders_backlog_daily",
    "supplier_lead_time_rank",
    "events_type_pmi",
    "events_time_to_convert",
    "agg_gini_revenue",
    "dq_advanced_tests",
    "text_lang_confusion",
    "dq_source_freshness",
    "window_percent_rank_cume",
    "text_zipf_slope",
    "corpus_mix_entropy",
    "ts_resample_ohlc",
    "agg_ship_delay_bands",
    "join_star_local_volume",
    "agg_heavy_hitters_cms",
    "sample_fixed_size_hash",
    "text_normalize_dedup",
    "graph_pagerank_topk",
    # round-5 additions
    "graph_pagerank_weighted",
    "sample_source_temperature_alpha",
    "similarity_ivf_pq_topk",
    "similarity_ivf_pq_residual_topk",
    "sample_fixed_size_per_group",
    "text_bpe_train",
    "text_bpe_tokenize",
    "graph_triangle_count",
    "ts_ewma_smooth",
    "events_markov_stationary",
    "events_changepoint_cusum",
    "ts_seasonal_decompose",
    "events_survival_km",
    "similarity_mmr_topk",
    "similarity_hard_negatives",
    "text_readability",
    "ts_holt_linear",
    "graph_link_prediction",
    "events_cohort_ltv",
    "embedding_centroid_eval",
    "dq_distribution_drift",
    "text_perplexity_bigram",
    "graph_kcore",
    "ts_autocorrelation",
    "dq_benford_digits",
    "agg_small_qty_revenue",
    "agg_skyline_per_brand",
    "events_seasonality_profile",
    "graph_bfs_layers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm-up: JVM JIT + parquet footer caches
    for n in names:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-3 (VERDICT r3 #6): this VM's throughput drifts ±70%
    # run-to-run, which makes single-shot deltas meaningless; the
    # per-query MINIMUM over three timed passes is the noise-floor
    # estimator of the query's actual cost. Raw per-pass totals ship
    # alongside so a reader can see the ambient drift the minima
    # filtered out.
    timings: dict[str, float] = {}
    run_totals: list[float] = []
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for _ in range(n_runs):
        run_total = 0.0
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 4)
            run_total += dt
            timings[n] = min(timings.get(n, dt), dt)
        run_totals.append(round(run_total, 4))

    total = round(sum(timings.values()), 4)
    line = json.dumps(
        {
            "metric": "headline_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "protocol": f"per-query min over {n_runs} runs",
            "raw_run_totals_sec": run_totals,
        }
    )
    # self-contained artifact: the driver's stdout capture truncates
    # long tails (the r4 JSON line got cut mid-object), so the same
    # JSON also lands in a file next to the script.
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_LOCAL.json")
    with open(out, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
