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


#: Run order for a driver that caps at ~50 entries per round. Round-4
#: rotation: (a) the 22 entries that errored in r03 (the ts regression)
#: so the heal shows externally, (b) the 6 streaming e2e runs — never
#: driver-verified in rounds 1-3 — placed early, (c) 22 entries that have
#: never had an external correctness row. The 77-r04 remainder rotates in
#: over subsequent rounds.
_PRIORITY = [
    # flagship canaries (errored in r03 → prove healed)
    "cdc_pipeline_e2e", "changes_normalize",
    # streaming e2e — first-ever external rows
    "streaming_replica_e2e", "streaming_changelog_e2e",
    "streaming_storage_e2e", "streaming_first_seen_e2e",
    "streaming_window_counts_e2e", "streaming_txn_match_e2e",
    "streaming_sessions_e2e",
    # remaining r03-errored entries
    "filter_table_rule", "projection_update_split",
    "projection_updated_columns", "route_topic_partition",
    "order_apply_seq", "txn_grouping", "schema_asof_join",
    "apply_merge_to_base", "encoder_canal_json", "decoder_canal_json",
    "window_running_balance", "agg_salted_skew_safe",
    "agg_pivot_event_types", "agg_cube_table_op", "agg_rollup_schema_table",
    "approx_distinct_users", "window_range_1h_sum",
    "window_lag_interarrival", "join_interval_broadcast",
    "gc_eligible_tombstones",
    # never-externally-verified rotation (r04 slice)
    "join_skew_split_salted", "corpus_top_tokens",
    "tpch_q8_market_share", "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue", "tpch_q21_waiting_suppliers",
    "encoder_mysql_sql", "encoder_canal_json_typed",
    "encoder_message_batches", "ddl_action_classify_full",
    "decoder_simple_protocol",
    "embed_int8_quantize", "syncpoint_ticks", "filter_start_ts",
    "encoder_simple_bootstrap", "decoder_simple_bootstrap",
    "encoder_simple_bootstrap_versioned",
    "encoder_avro_json", "decoder_avro_json",
    "encoder_open_batch_framed",
    "embed_kmeans_clusters", "sim_ivf_trained_topk",
    # r05 rotation continues here (S2/E2 carried r02-green signal; the
    # debezium/csv decoders share the verified decode-path pattern;
    # apply_materialize is exercised by apply_merge_to_base + replica e2e)
    "apply_scd2_history", "apply_incremental_agg", "decoder_open_batch",
    "convert_canal_to_avro", "corpus_dup_rate_summary",
    "decontaminate_vs_eval", "text_mask_pii", "pack_sequences",
    "text_repetition_score", "sample_quality_weighted",
    "corpus_mix_stats", "embed_dim_stats",
    # r05 rotation also starts here
    "corpus_length_histogram", "encoder_simple_ddl",
    "apply_materialize", "decoder_debezium", "decoder_csv_rows",
    "encoder_open_protocol", "txn_match_prewrite_commit",
    "table_progress", "range_scan", "stale_event_drop",
    # previously-green families (r02/r03) follow in registration order.
    "tpch_q1_pricing_summary", "tpch_q6_forecast_revenue",
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
    "tpch_q4_order_priority", "window_topn_orders_per_customer",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "sim_cosine_topk",
    "sim_ann_lsh_topk", "sim_ivf_topk", "text_lang_id",
    "text_quality_score", "text_token_count", "text_fingerprint",
    "multimodal_binary_meta", "multimodal_frame_sample",
    "multimodal_resize", "llm_clean_corpus", "sample_hash_bucket",
    "sample_stratified_hash",
    "approx_order_value_quantiles", "tpch_q16_supplier_cnt",
    "tpch_q14_promo_revenue", "dedup_duplicate_clusters",
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
