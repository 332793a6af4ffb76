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


#: Run order for a driver that caps at ~50 entries per round. Round-9
#: rotation: positions 1-3 are the NEW r9 entries (DDL executed through
#: the live SQLite writer loop; schema evolution through the parquet
#: replica; the leakage-safe cluster-aware train/val/test split); 4-11
#: are entries whose engine code or oracle changed in round 9 (C4
#: keep-first rewritten as the skew-safe min-struct agg; the SQLite
#: apply sink gained the zombie fence + carried-identity columns; the
#: avro registry entry moved to a run-scoped tmpdir; the type-render
#: fixture grew to the full 45-column family breadth; the ReplicaSink
#: merge is schema-evolving now, so the replica-backed e2es re-verify);
#: positions 12+ drain the oldest-first backlog — the entries whose
#: latest external green row still dates from r1/r3 (VERDICT r8 "What's
#: wrong" #3) come first, then everything else freshness-ascending so
#: any window overflow keeps draining oldest-first on the rolling clock.
_PRIORITY = [
    "streaming_sqlite_ddl_apply_e2e", "engine_ddl_barrier_e2e",
    "streaming_bdr_loop_prevention_e2e", "consumer_changelog_apply_e2e",
    "redo_disaster_recovery_e2e",
    "streaming_replica_schema_evolution_e2e", "split_leakage_safe",
    "dedup_lsh_quality_report",
    "dedup_c4_span_excise", "streaming_sqlite_apply_e2e",
    "encoder_avro_registry_evolution", "encoder_avro_registry_http",
    "projection_type_render",
    "streaming_replica_e2e", "engine_multifeed_e2e",
    "streaming_time_travel_e2e", "dedup_duplicate_clusters",
    "filter_event_type", "filter_expr_values", "ddl_allowlist",
    "ddl_split_multistatement", "projection_column_selector",
    "projection_handle_key_only", "projection_checksum", "range_scan",
    "stale_event_drop", "table_progress", "changefeed_checkpoint",
    "dml_ddl_merge", "apply_materialize", "encoder_open_protocol",
    "encoder_claim_check", "txn_match_prewrite_commit",
    "decoder_open_protocol", "ddl_action_classify", "ddl_barrier_subbatches",
    "apply_composite_key", "force_replicate_rowkey", "encoder_open_batch",
    "schema_evolution_typed_view", "partition_table_logical",
    "agg_session_windows", "filter_ddl_sql_regex", "agg_unpivot_measures",
    "schema_asof_join_grouped", "audit_image_chain", "decoder_dead_letter",
    "setop_intersect_keys", "sample_hash_bucket", "sample_stratified_hash",
    "approx_order_value_quantiles", "text_token_count", "text_quality_score",
    "text_lang_id", "text_fingerprint", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "sim_cosine_topk",
    "sim_ann_lsh_topk", "multimodal_binary_meta", "dedup_embedding_cosine",
    "sim_ivf_topk", "multimodal_frame_sample", "llm_clean_corpus",
    "tpch_q1_pricing_summary", "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier", "window_topn_orders_per_customer",
    "tpch_q14_promo_revenue", "tpch_q16_supplier_cnt", "changes_normalize",
    "filter_table_rule", "filter_start_ts", "projection_update_split",
    "route_topic_partition", "order_apply_seq", "txn_grouping",
    "syncpoint_ticks", "schema_asof_join", "apply_merge_to_base",
    "encoder_canal_json", "decoder_canal_json", "encoder_simple_bootstrap",
    "decoder_simple_bootstrap", "encoder_simple_bootstrap_versioned",
    "encoder_avro_json", "decoder_avro_json", "projection_updated_columns",
    "agg_salted_skew_safe", "join_skew_split_salted",
    "encoder_open_batch_framed", "agg_pivot_event_types",
    "agg_cube_table_op", "window_running_balance", "agg_rollup_schema_table",
    "ddl_action_classify_full", "encoder_message_batches",
    "encoder_canal_json_typed", "decoder_simple_protocol",
    "window_lag_interarrival", "window_range_1h_sum",
    "approx_distinct_users", "join_interval_broadcast",
    "gc_eligible_tombstones", "embed_kmeans_clusters", "corpus_top_tokens",
    "embed_int8_quantize", "tpch_q8_market_share",
    "tpch_q13_customer_distribution", "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers", "setop_except_keys", "join_semi_anti_keys",
    "window_ntile_rank", "text_chunk_documents", "dedup_minhash_signature",
    "dedup_simhash_pairs", "dedup_embedding_exact", "sim_lsh_bucket",
    "sim_ivf_trained_topk", "decontaminate_vs_eval", "text_mask_pii",
    "text_repetition_score", "sample_quality_weighted", "corpus_mix_stats",
    "embed_dim_stats", "corpus_length_histogram", "corpus_dup_rate_summary",
    "dedup_semantic_semdedup", "setop_distinct_segments",
    "tpch_q10_returned_items", "tpch_q12_priority_by_status",
    "tpch_q18_large_volume_orders", "tpch_q19_disjunctive_filter",
    "tpch_q22_idle_customers", "tpch_q2_top_supplier_per_part",
    "tpch_q7_nation_volume", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q15_top_supplier",
    "tpch_q20_part_promotion", "sink_checkpoint_messages",
    "sink_batch_progress", "source_jsonl_changes", "seq_gap_resets",
    "replica_chunk_checksums", "convert_open_to_canal",
    "decoder_craft_framed", "decoder_avro_confluent",
    "decoder_craft_dead_letter", "decoder_craft_batch_framed",
    "agg_props_json_profile", "claim_check_round_trip",
    "encoder_canal_json_ddl", "encoder_canal_resolved",
    "encoder_canal_handle_key_only", "encoder_canal_claim_check",
    "decoder_canal_large_message", "encoder_open_handle_key_only",
    "encoder_open_claim_check", "decoder_open_wire_frames",
    "decoder_open_ddl_frames", "decoder_simple_ddl",
    "convert_debezium_to_open", "pack_sequences", "sample_importance_dsir",
    "decontaminate_fuzzy_minhash", "corpus_shuffle_assign",
    "multimodal_audio_energy", "embed_pca_project", "sample_temperature_mix",
    "dedup_substring_spans", "text_lm_score", "bpe_merge_apply",
    "dedup_substring_excise", "llm_curation_manifest_v2",
    "text_gopher_quality_flags", "sample_mixture_epochs",
    "dedup_paragraph_fraction", "bpe_train_merges", "bpe_vocab_apply",
    "agg_events_per_type_hour", "streaming_incr_agg_e2e",
    "streaming_ddl_barrier_e2e", "streaming_filtered_replica_e2e",
    "streaming_syncpoint_e2e", "streaming_window_append_e2e",
    "sink_txn_flush_batches", "streaming_flush_batches_e2e",
    "streaming_jsonl_replica_e2e", "cdc_pipeline_e2e", "source_csv_changes",
    "apply_scd2_history", "apply_incremental_agg", "apply_incremental_join",
    "encoder_debezium", "encoder_simple_protocol", "encoder_simple_ddl",
    "encoder_avro_confluent_framed", "encoder_csv_rows",
    "decoder_open_batch", "convert_canal_to_avro", "encoder_mysql_sql",
    "encoder_mysql_sql_safe_mode", "decoder_debezium", "decoder_csv_rows",
    "encoder_craft_framed", "encoder_craft_batch_framed",
    "encoder_craft_resolved", "encoder_open_ddl", "encoder_open_resolved",
    "multimodal_resize", "sample_source_token_budget",
    "embed_label_outliers", "multimodal_resize_box", "dedup_exact_canonical",
    "dedup_keep_best_quality", "text_search_bm25_topk", "embed_pq_encode",
    "sim_pq_adc_topk", "corpus_bigram_counts", "sim_ivfpq_topk",
    "sim_ann_recall_report", "llm_curation_manifest",
    "bpe_train_merges_batched", "streaming_changelog_e2e",
    "streaming_first_seen_e2e", "streaming_window_counts_e2e",
    "streaming_storage_e2e", "streaming_txn_match_e2e",
    "streaming_sessions_e2e", "streaming_blackhole_e2e",
    "streaming_minhash_dedup_e2e", "engine_lifecycle_e2e",
    "streaming_csv_replica_e2e",
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
