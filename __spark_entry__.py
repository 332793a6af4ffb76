"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented SURVEY §2
operator from :mod:`tigate_spark.catalog` with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from tigate_spark.catalog import get_catalog  # noqa: E402
from tigate_spark.session import ensure_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_confs(spark)
    cat = get_catalog()
    return cat["cdc_pipeline_e2e"].builder(spark, "/root/testdata/sf0.001")


#: Run order for a driver that caps at ~50 entries per round. Round-8
#: rotation: positions 1-4 are the four NEW round-8 entries (batched
#: top-M BPE trainer, multi-changefeed coordinator e2e, the live SQLite
#: writer-loop sink e2e,
#: the splittable-CSV streaming changefeed e2e); next are entries whose
#: engine code or oracle changed in round 8 (splittable CSV source;
#: the mysql-SQL oracles now escape via _json_esc_sql); 7-20 are the
#: state-heaviest entries not re-verified in the r7 window (streaming
#: e2e family + craft/avro binary wire codecs); 21-50 continue the
#: oldest-first re-verification backlog exactly where the r7 window
#: stopped, so every entry's external row stays fresh on the rolling
#: clock (r7 ran 50/50 green; cumulative coverage is 224/224).
_PRIORITY = [
    "bpe_train_merges_batched", "encoder_avro_registry_evolution",
    "dedup_c4_span_excise",
    "engine_multifeed_e2e", "streaming_sqlite_apply_e2e",
    "streaming_csv_replica_e2e", "source_csv_changes", "encoder_mysql_sql",
    "encoder_mysql_sql_safe_mode", "streaming_replica_e2e",
    "streaming_changelog_e2e", "streaming_storage_e2e",
    "streaming_txn_match_e2e", "streaming_minhash_dedup_e2e",
    "streaming_blackhole_e2e", "engine_lifecycle_e2e",
    "streaming_first_seen_e2e", "streaming_window_counts_e2e",
    "streaming_sessions_e2e", "encoder_craft_framed",
    "encoder_avro_confluent_framed", "encoder_craft_batch_framed",
    "encoder_craft_resolved", "apply_incremental_join",
    "dedup_exact_canonical", "dedup_keep_best_quality",
    "text_search_bm25_topk", "embed_pq_encode", "sim_pq_adc_topk",
    "sim_ivfpq_topk", "sim_ann_recall_report", "corpus_bigram_counts",
    "llm_curation_manifest", "encoder_open_resolved", "encoder_open_ddl",
    "sample_source_token_budget", "embed_label_outliers", "cdc_pipeline_e2e",
    "multimodal_resize", "multimodal_resize_box", "apply_scd2_history",
    "apply_incremental_agg", "encoder_debezium", "decoder_debezium",
    "encoder_simple_protocol", "encoder_simple_ddl", "encoder_csv_rows",
    "decoder_csv_rows", "decoder_open_batch", "convert_canal_to_avro",
    "setop_except_keys", "setop_distinct_segments", "join_semi_anti_keys",
    "dedup_substring_spans", "text_lm_score", "bpe_merge_apply",
    "replica_chunk_checksums", "dedup_substring_excise",
    "llm_curation_manifest_v2", "text_gopher_quality_flags",
    "sample_mixture_epochs", "dedup_paragraph_fraction",
    "sink_txn_flush_batches", "bpe_train_merges", "bpe_vocab_apply",
    "convert_debezium_to_open", "streaming_flush_batches_e2e",
    "source_jsonl_changes", "streaming_jsonl_replica_e2e", "pack_sequences",
    "agg_events_per_type_hour", "sample_importance_dsir",
    "decontaminate_fuzzy_minhash", "corpus_shuffle_assign", "seq_gap_resets",
    "streaming_incr_agg_e2e", "decoder_craft_framed",
    "decoder_craft_batch_framed", "decoder_craft_dead_letter",
    "decoder_avro_confluent", "agg_props_json_profile",
    "streaming_filtered_replica_e2e", "claim_check_round_trip",
    "encoder_canal_json_ddl", "encoder_canal_resolved",
    "encoder_canal_handle_key_only", "encoder_canal_claim_check",
    "decoder_canal_large_message", "streaming_syncpoint_e2e",
    "encoder_open_handle_key_only", "encoder_open_claim_check",
    "streaming_window_append_e2e", "decoder_open_wire_frames",
    "decoder_open_ddl_frames", "sample_temperature_mix",
    "decoder_simple_ddl", "multimodal_audio_energy", "embed_pca_project",
    "streaming_ddl_barrier_e2e", "convert_open_to_canal",
    "streaming_time_travel_e2e", "window_ntile_rank",
    "dedup_minhash_signature", "dedup_simhash_pairs",
    "dedup_embedding_exact", "sim_lsh_bucket", "sim_ivf_trained_topk",
    "decontaminate_vs_eval", "text_mask_pii", "text_repetition_score",
    "sample_quality_weighted", "corpus_mix_stats", "embed_dim_stats",
    "corpus_length_histogram", "corpus_dup_rate_summary",
    "tpch_q2_top_supplier_per_part", "tpch_q7_nation_volume",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_priority_by_status",
    "tpch_q15_top_supplier", "tpch_q18_large_volume_orders",
    "tpch_q19_disjunctive_filter", "tpch_q20_part_promotion",
    "tpch_q22_idle_customers", "sink_checkpoint_messages",
    "sink_batch_progress", "text_chunk_documents", "dedup_semantic_semdedup",
    "changes_normalize", "filter_event_type", "filter_ddl_sql_regex",
    "filter_expr_values", "ddl_split_multistatement", "ddl_allowlist",
    "projection_handle_key_only", "projection_type_render",
    "projection_checksum", "dml_ddl_merge", "changefeed_checkpoint",
    "range_scan", "stale_event_drop", "table_progress",
    "encoder_claim_check", "encoder_open_batch", "encoder_open_protocol",
    "txn_match_prewrite_commit", "apply_materialize", "filter_table_rule",
    "projection_update_split", "projection_updated_columns",
    "route_topic_partition", "order_apply_seq", "txn_grouping",
    "schema_asof_join", "apply_merge_to_base", "encoder_canal_json",
    "decoder_canal_json", "window_running_balance", "agg_salted_skew_safe",
    "agg_pivot_event_types", "agg_cube_table_op", "agg_rollup_schema_table",
    "approx_distinct_users", "window_range_1h_sum",
    "window_lag_interarrival", "join_interval_broadcast",
    "gc_eligible_tombstones", "join_skew_split_salted", "corpus_top_tokens",
    "tpch_q8_market_share", "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue", "tpch_q21_waiting_suppliers",
    "encoder_canal_json_typed", "encoder_message_batches",
    "ddl_action_classify_full", "decoder_simple_protocol",
    "embed_int8_quantize", "syncpoint_ticks", "filter_start_ts",
    "encoder_simple_bootstrap", "decoder_simple_bootstrap",
    "encoder_simple_bootstrap_versioned", "encoder_avro_json",
    "decoder_avro_json", "encoder_open_batch_framed",
    "embed_kmeans_clusters", "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier", "tpch_q4_order_priority",
    "window_topn_orders_per_customer", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "sim_cosine_topk", "sim_ann_lsh_topk", "sim_ivf_topk", "text_lang_id",
    "text_quality_score", "text_token_count", "text_fingerprint",
    "multimodal_binary_meta", "multimodal_frame_sample", "llm_clean_corpus",
    "sample_hash_bucket", "sample_stratified_hash",
    "approx_order_value_quantiles", "tpch_q16_supplier_cnt",
    "tpch_q14_promo_revenue", "dedup_duplicate_clusters",
    "projection_column_selector", "decoder_open_protocol",
    "ddl_action_classify", "ddl_barrier_subbatches", "apply_composite_key",
    "force_replicate_rowkey", "schema_evolution_typed_view",
    "partition_table_logical", "agg_session_windows", "agg_unpivot_measures",
    "schema_asof_join_grouped", "audit_image_chain", "decoder_dead_letter",
    "setop_intersect_keys",
]


def _ordered_catalog():
    cat = get_catalog()
    ordered = [n for n in _PRIORITY if n in cat]
    ordered += [n for n in cat if n not in set(ordered)]
    return [(n, cat[n]) for n in ordered]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in _ordered_catalog():
        def make(b):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                ensure_confs(spark)
                return b(spark, sf_dir)

            return run

        out[name] = make(spec.builder)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered_catalog() if spec.oracle}
