"""Query surface over the ingested tables (SURVEY.md §2.C closure).

Each submodule exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, duckdb_sql]``. Names present in QUERIES but absent
from ORACLES are non-SQL-expressible ops (approx aggregates, LSH, streaming)
and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics, cdc, extended, llm, pipeline, relational, streaming, tpch

_MODULES = (relational, cdc, llm, streaming, extended, pipeline, tpch, analytics)

# Latest round each query name was covered by the driver's 50-entry
# correctness sample (union of CORRECTNESS_r01..r11.json — all 218 names have
# been sampled at least once; all green at latest sample). Names are stable
# across rounds by contract; enumerating oldest-sampled FIRST makes each
# driver sample re-certify the rows that have aged the most through
# refactors, instead of re-checking the same fresh prefix. Queries absent
# from this map (new this round) sort before everything (round 0).
_LAST_SAMPLED_ROUND: dict[str, int] = {
    "agg_approx_distinct": 10, "agg_bitmap_distinct": 10,
    "agg_collect_pivot": 10, "agg_corr_covar": 8, "agg_countif_bool": 9,
    "agg_cube": 10, "agg_decimal_exact": 8, "agg_grouping_id": 9,
    "agg_grouping_sets": 8, "agg_hll_sketch": 11, "agg_listagg": 8,
    "agg_mode_median": 9, "agg_multi_distinct": 9, "agg_percentile_approx": 11,
    "agg_percentiles": 10, "agg_regression": 10, "agg_rollup": 10,
    "agg_skew_kurtosis": 9, "agg_skew_twophase": 9, "agg_stats_events": 10,
    "cdc_apply_deletes": 11, "cdc_asof_join": 11, "cdc_avro_roundtrip": 11,
    "cdc_catalog_sync": 8, "cdc_envelope_roundtrip": 11, "cdc_hot_keys": 9,
    "cdc_incremental_join_view": 11, "cdc_incremental_read": 11,
    "cdc_latest_by_key": 11, "cdc_merge_upsert": 11, "cdc_mor_table": 11,
    "cdc_mor_time_travel": 8, "cdc_scd2_history": 11,
    "cdc_schema_evolution": 11, "cdc_time_travel": 11, "cdc_topic_to_table": 11,
    "distinct_flags": 10, "filter_nullsafe_eq": 8, "filter_predicates": 10,
    "forecast_revenue": 11, "fuzzy_name_pairs": 8, "join_anti": 10,
    "join_cross_small": 10, "join_full_outer": 10, "join_interval_overlap": 8,
    "join_left_outer": 10, "join_nullaware_anti": 9, "join_range_binned": 8,
    "join_right_outer": 10, "join_salted_skew": 8, "join_semi": 10,
    "join_star_revenue": 10, "join_theta_range": 10,
    "llm_bloom_decontaminate": 11, "llm_bpe_apply": 11,
    "llm_bpe_merge_pairs": 11, "llm_bpe_token_count": 11,
    "llm_cluster_canonical": 11, "llm_corpus_clean": 11,
    "llm_corpus_fingerprint": 8, "llm_cosine_ivf": 11, "llm_cosine_lsh": 11,
    "llm_cosine_topk": 11, "llm_decontaminate": 8, "llm_dedup_clusters": 11,
    "llm_dedup_clusters_exact": 11, "llm_domain_cap": 11,
    "llm_embed_neardup": 11, "llm_embed_neardup_lsh": 11,
    "llm_embed_quantize": 8, "llm_embedding_stats": 11, "llm_exact_dedup": 11,
    "llm_filtered_topk": 9, "llm_fingerprint": 7, "llm_graph_triangles": 7,
    "llm_graph_triangles_count": 10, "llm_graph_triangles_exact": 8,
    "llm_heavy_hitters": 8, "llm_index_maintain": 7, "llm_kmeans_clusters": 7,
    "llm_language_id": 8, "llm_length_histogram": 7, "llm_minhash_lsh": 7,
    "llm_ngram_jaccard": 7, "llm_ngram_jaccard_lsh": 7,
    "llm_ngram_novelty": 7, "llm_pack_global": 8, "llm_pack_sequences": 8,
    "llm_pagerank": 7, "llm_pagerank_exact": 7, "llm_perplexity_buckets": 7,
    "llm_quality_langstats": 7, "llm_repetition_score": 7,
    "llm_semantic_decontaminate": 9, "llm_semantic_dedup": 8,
    "llm_simhash": 7, "llm_span_dedup": 8, "llm_stratified_sample": 8,
    "llm_token_stats": 7, "llm_unigram_logprob": 8, "llm_weighted_sample": 8,
    "llm_word_freq": 7, "mm_audio_stats": 9, "mm_decode_codec": 8,
    "mm_decode_stats": 8, "mm_frame_sample": 8, "mm_resize_stats": 9,
    "obs_scan_metrics": 9, "pipe_chunk_documents": 9,
    "pipe_cohort_retention": 9, "pipe_dataset_mix": 8,
    "pipe_epoch_shuffle": 9, "pipe_funnel_conversion": 9,
    "pipe_hash_split": 9, "pipe_incremental_dedup": 8,
    "pipe_ingest_neardup_gate": 9, "pipe_ingest_neardup_gate_exact": 10,
    "pipe_pack_sharded": 9, "pipe_pii_scrub": 9, "pipe_profile_columns": 9,
    "pipe_right_to_forget": 9, "pipe_sessionize": 9,
    "pipe_tfidf_top_terms": 9, "pipe_url_normalize": 10, "pricing_summary": 10,
    "project_cast_drop": 10, "ps_pandas_on_spark": 9, "scalar_array_ops": 8,
    "scalar_bit_ops": 8, "scalar_date_arith": 8, "scalar_dates": 10,
    "scalar_json": 10, "scalar_map_ops": 8, "scalar_math_cond": 10,
    "scalar_posexplode": 8, "scalar_regex": 8, "scalar_strings": 10,
    "scalar_try_ops": 9, "scalar_variant": 9, "set_ops_all": 9,
    "set_ops_nations": 10, "shipping_priority": 10,
    "sink_clustered_readback": 9, "sink_csv_roundtrip": 9,
    "sink_orc_roundtrip": 9, "sink_partitioned_readback": 9,
    "sink_python_format_roundtrip": 9, "sink_xml_roundtrip": 9,
    "sink_zorder_readback": 10, "source_csv_malformed": 10,
    "source_jsonl_roundtrip": 10, "source_python_datasource": 10,
    "sql_lateral_topk": 10, "sql_parameterized": 10, "sql_recursive_cte": 10,
    "sql_subquery_exists": 9, "sql_subquery_in": 9, "sql_subquery_scalar": 9,
    "stream_avro_upsert": 8, "stream_cdc_upsert": 8, "stream_deadletter": 9,
    "stream_dedup_keys": 8, "stream_dedup_within_watermark": 9,
    "stream_join_view": 9, "stream_mor_upsert": 8,
    "stream_python_datasource": 8, "stream_python_sink_roundtrip": 8,
    "stream_rollup_incremental": 8, "stream_rollup_two_level": 8,
    "stream_scd2_fold": 8, "stream_session_windows": 8,
    "stream_sliding_value": 8, "stream_stateful_totals": 9,
    "stream_static_join": 8, "stream_stream_full_join": 9,
    "stream_stream_join": 8, "stream_stream_left_join": 9,
    "stream_temporal_join": 8, "stream_tumbling_counts": 8,
    "stream_window_topk": 9, "table_compact_roundtrip": 7,
    "top_orders_global": 10, "tpch_q10_returned_items": 10,
    "tpch_q11_important_parts": 10, "tpch_q12_late_priority_lines": 11,
    "tpch_q13_order_distribution": 11, "tpch_q14_promo_effect": 10,
    "tpch_q15_top_supplier": 10, "tpch_q16_supplier_part_counts": 11,
    "tpch_q17_small_qty_revenue": 11, "tpch_q18_large_orders": 10,
    "tpch_q19_bracket_revenue": 10, "tpch_q20_promotable_suppliers": 11,
    "tpch_q21_waiting_supplier": 11, "tpch_q22_idle_customers": 10,
    "tpch_q2_min_cost_supplier": 11, "tpch_q4_priority_check": 11,
    "tpch_q5_local_supplier_volume": 11, "tpch_q7_nation_volume": 10,
    "tpch_q8_market_share": 10, "tpch_q9_product_profit": 11, "ts_gap_fill": 10,
    "ts_interpolate": 11, "udf_arrow_batch": 10, "udf_grouped_arrow": 11,
    "udf_grouped_zscore": 9, "udf_pandas_udaf": 11, "udtf_doc_chunks": 10,
    "unpivot_metrics": 9, "window_count_distinct": 10, "window_cume_dist": 9,
    "window_first_last": 9, "window_lag_lead": 11, "window_pattern_match": 11,
    "window_rank_ntile": 11, "window_running_frames": 11,
    "window_time_range": 9, "window_topk_per_group": 11,
}


# Queries fixed after a red driver row that should enumerate before everything
# else so the next sample re-checks them. Round 4 re-sampled all eight prior
# entries green (CORRECTNESS_r04.json), so this is empty going into round 5.
_RESAMPLE_FIRST = frozenset()


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    # Fixed-red queries first, then oldest-sampled-first (never-sampled names
    # default to round 0 so brand-new queries certify immediately); stable
    # name order within each group.
    return dict(
        sorted(
            out.items(),
            key=lambda kv: (
                kv[0] not in _RESAMPLE_FIRST,
                _LAST_SAMPLED_ROUND.get(kv[0], 0),
                kv[0],
            ),
        )
    )


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
