"""Plan-shape gates: the properties that decide 100 TB behavior, pinned as
tests so a regression in pushdown / broadcast / codegen fails CI, not the
cluster bill (SURVEY §4).
"""

from __future__ import annotations

import os

import pytest

from tigate_spark.catalog import get_catalog
from tigate_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_python_in_plan,
    assert_pushed_filters,
    assert_shuffle_join,
    count_broadcast_exchanges,
    count_data_exchanges,
    count_exchanges,
)

CATALOG = get_catalog()
SF_DIR = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")


def _df(spark, name):
    return CATALOG[name].builder(spark, SF_DIR)


from contextlib import contextmanager


@contextmanager
def no_auto_broadcast(spark):
    """Disable size-based auto-broadcast so the plan shows its at-scale
    shape: at sf0.001 *everything* fits under the threshold and every
    join degenerates to BHJ, hiding the fact-side shuffle the assertions
    are about. Explicit F.broadcast() hints still broadcast.

    Must wrap the *assertions*, not the build: physical planning is lazy
    (happens at explain time), and building goes through load_table →
    ensure_confs, which re-sets the production threshold."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_count_exchanges_sees_real_shuffles(spark):
    """Self-test for the audit helper: a groupBy over a non-trivial key IS
    a shuffle and must count as one; a SinglePartition final agg and a
    broadcast exchange must not. Guards against the formatted-explain
    rendering drifting out from under the header regex (round-2 ADVICE:
    the old line-prefix match counted 0 on every plan, making every
    shuffle gate vacuous)."""
    import pyspark.sql.functions as F

    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    shuffled = df.groupBy("k").count()
    assert count_exchanges(shuffled) >= 1, shuffled.explain("formatted")
    # global agg coalesces to SinglePartition — not a data shuffle
    assert count_exchanges(df.agg(F.sum("id"))) == 0
    # broadcast join moves dim-sized data only
    dim = F.broadcast(spark.range(7).withColumnRenamed("id", "k"))
    assert count_exchanges(df.join(dim, "k")) == 0


def test_q6_filters_reach_scan(spark):
    """TPC-H Q6 shape: all predicates sit on scan columns → every one
    pushes into the parquet reader; the plan is scan+agg, no data shuffle."""
    df = _df(spark, "tpch_q6_forecast_revenue")
    plan = assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")
    # partial/final agg only — the single exchange carries one row per task
    assert "HashAggregate" in plan


def test_q3_fact_joins_size_decided(spark):
    """Q3: customer is SF-proportional — no broadcast hint anywhere, so
    with auto-broadcast disabled the whole plan co-shuffles; at test SF the
    default (auto-broadcast on) plan still broadcasts it size-decided."""
    df = _df(spark, "tpch_q3_shipping_priority")
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(df) == 0
        assert_shuffle_join(df)
    # fresh df: QueryExecution memoizes the physical plan, so the hinted-off
    # explain above would otherwise be reused under the restored threshold
    assert_broadcast_join(_df(spark, "tpch_q3_shipping_priority"), n_min=1)


def test_q5_star_join_broadcasts_fixed_dims_only(spark):
    """Q5: 6-way star — only the fixed-size dims (nation, region) carry
    broadcast hints; customer/supplier are SF-proportional and stay
    size-decided, facts SMJ."""
    df = _df(spark, "tpch_q5_local_supplier")
    with no_auto_broadcast(spark):
        assert_broadcast_join(df, n_min=2)
        assert count_broadcast_exchanges(df) == 2  # nation + region only
        assert_shuffle_join(df)


def test_q1_column_pruning(spark):
    """Q1 reads 7 of 11 lineitem columns — ReadSchema must not widen."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "tpch_q1_pricing_summary")
    plan = plan_of(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    # pruned: l_orderkey/l_partkey/l_suppkey/l_linenumber must not be read
    for dropped in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert dropped not in read[0], f"{dropped} not pruned: {read[0]}"


def test_cdc_pipeline_stays_jvm_side(spark):
    """The CDC hot path (filters+projection) is pure JVM — no Python."""
    df = _df(spark, "cdc_pipeline_e2e")
    assert_no_python_in_plan(df)


def test_encoders_stay_jvm_side(spark):
    """Encoders are format_string/to_json — whole-stage codegen, no UDF."""
    for name in ("encoder_canal_json", "encoder_open_protocol"):
        assert_no_python_in_plan(_df(spark, name))


def test_replica_apply_single_shuffle(spark):
    """Last-writer-wins apply = exactly one data shuffle (the max_by agg).

    A second exchange would mean the merge re-partitions needlessly —
    at 100 TB that doubles the largest shuffle in the pipeline."""
    df = _df(spark, "apply_materialize")
    assert count_exchanges(df) <= 1, df.explain("formatted")


def test_window_running_balance_single_shuffle(spark):
    """Window ops partition once on (table_id, pk); the frame pass is
    sort-local."""
    df = _df(spark, "window_running_balance")
    assert count_exchanges(df) <= 1


def test_interval_join_is_broadcast_nested_loop(spark):
    """The 6-row interval dim must broadcast — a shuffle range join here
    would be a catastrophic plan at scale."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "join_interval_broadcast")
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_lsh_pairs_bounded_shuffles(spark):
    """MinHash-LSH: fan-out repartition + bucket clustering + pair agg —
    the shuffled payload is (doc, band) rows, never the corpus text twice."""
    df = _df(spark, "dedup_minhash_lsh")
    # repartition + groupBy(band,v) + groupBy(pair) = 3 exchanges max
    assert count_exchanges(df) <= 3


def test_jaccard_pairs_bucket_local(spark):
    """n-gram Jaccard after the df-cap rewrite: posting-list clustering +
    pair agg + sizes agg + 2 size joins — bounded exchanges, and no
    SortMergeJoin of the exploded shingle table against itself (the
    pre-rewrite O(df²) shape)."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "dedup_ngram_jaccard")
    # r18: the combined aggregate is no longer persist()-ed (the cache
    # served warm bench passes — removed as cross-run result caching), so
    # the INITIAL plan renders the shared 3-exchange posting subtree once
    # per consumer branch (inter + the two size joins) = up to 9 headers;
    # at runtime AQE ReusedExchange collapses the identical subtrees, so
    # the executed work is still the single pipeline the old <=7 gate
    # (with InMemoryRelation) pinned.
    assert count_exchanges(df) <= 9
    # pair generation must come from bucket-local combinations (explode of
    # posting-list arrays), not a shingle-equality self-join
    assert "flatten(transform(sequence" in plan_of(df)


def test_embedding_cosine_bucket_local(spark):
    """Embedding near-dup after the cap rewrite: one clustering shuffle +
    combinations — no self-join of the bucketed corpus."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "dedup_embedding_cosine")
    assert count_exchanges(df) <= 2
    plan = plan_of(df)
    assert "flatten(transform(sequence" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name", ["sample_hash_bucket", "sample_stratified_hash"]
)
def test_sampling_no_shuffle(spark, name):
    """Hash-bucket sampling is a pure scan-filter — zero exchanges."""
    assert count_exchanges(_df(spark, name)) == 0


def test_q8_fixed_dims_broadcast_facts_shuffle(spark):
    """Q8: the two nation roles + region broadcast by explicit hint;
    part/orders/customer/supplier joins stay size-decided so they shuffle
    at scale instead of OOMing a forced broadcast."""
    df = _df(spark, "tpch_q8_market_share")
    with no_auto_broadcast(spark):
        assert_broadcast_join(df, n_min=3)
        assert count_broadcast_exchanges(df) == 3  # nc + ns + region
        assert_shuffle_join(df)


# Expected bounded-dim broadcast hints per query (everything else must be
# size-decided): part/customer/supplier/filtered-orders are SF-proportional
# — a hard F.broadcast() on any of them OOMs the executors at the 100 TB
# design point (part ≈ 2.6 B rows). Reference intent: hot-side distribution
# is always size-driven (maintainer/split/write_bytes_splitter.go:30-122).
_BOUNDED_BROADCASTS = {
    "tpch_q2_top_supplier_per_part": 0,
    "tpch_q7_nation_volume": 2,        # two nation roles
    "tpch_q9_product_profit": 1,       # nation
    "tpch_q10_returned_items": 1,      # nation
    "tpch_q14_promo_revenue": 0,
    "tpch_q16_supplier_cnt": 0,
    "tpch_q17_small_quantity_revenue": 0,
    "tpch_q18_large_volume_orders": 0,
    "tpch_q19_disjunctive_filter": 0,
    "tpch_q20_part_promotion": 1,      # nation (filtered to one row)
    "tpch_q22_idle_customers": 1,      # single-row avg_bal scalar
}


@pytest.mark.parametrize("name", sorted(_BOUNDED_BROADCASTS))
def test_no_sf_proportional_broadcast_hints(spark, name):
    """With auto-broadcast disabled, the only BroadcastExchange nodes left
    are explicit hints — and those must all be on fixed-size dims. Exact
    equality both ways: a count above the budget means someone re-added a
    hint on an SF-proportional relation (the round-2 q14/q19/q2/q9/q16/q20
    defect); a count below it means a fixed-dim hint was lost and the join
    will shuffle the fact side at scale."""
    df = _df(spark, name)
    with no_auto_broadcast(spark):
        n = count_broadcast_exchanges(df)
        assert n == _BOUNDED_BROADCASTS[name], (
            f"{name}: {n} broadcast hints, budget "
            f"{_BOUNDED_BROADCASTS[name]} — SF-proportional relation "
            f"force-broadcast, or a fixed-dim hint dropped?"
        )


def test_q17_window_decorrelation_bounded_shuffles(spark):
    """Q17: with auto-broadcast off and no part hint, the two exchanges
    are the lineitem/part sort-merge-join shuffle sides (the window reuses
    the join partitioning); a join-back formulation of the correlated avg
    would add a third exchange of lineitem width."""
    df = _df(spark, "tpch_q17_small_quantity_revenue")
    with no_auto_broadcast(spark):
        assert count_exchanges(df) <= 2


def test_q21_semi_anti_self_joins(spark):
    """Q21: EXISTS/NOT EXISTS compile to LeftSemi/LeftAnti hash joins with
    the supplier-inequality residual — not to a cartesian or a
    row-at-a-time subquery."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "tpch_q21_waiting_suppliers")
    plan = plan_of(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.slow
def test_new_codecs_stay_jvm_side(spark):
    """Every codec added in round 2 — typed canal, mysql SQL text,
    debezium/csv/simple decoders, batching, int8 quantize — is pure
    format_string/from_json/transform: zero Python in the plan."""
    for name in (
        "encoder_canal_json_typed", "encoder_mysql_sql",
        "encoder_message_batches", "decoder_debezium", "decoder_csv_rows",
        "decoder_simple_protocol", "embed_int8_quantize",
    ):
        assert_no_python_in_plan(_df(spark, name))


def test_quantize_zero_shuffle(spark):
    """int8 quantization is array-local — no exchange at any scale."""
    assert count_exchanges(_df(spark, "embed_int8_quantize")) == 0


def test_kmeans_centroid_update_is_partial_agg(spark):
    """Lloyd update must go through posexplode → (cell, dim) partial sums
    (shuffle payload: 64 rows per cell) — never collect_list of whole
    vectors per cell, which would funnel a 100 TB cell through one task.
    Since r07 the trained codebook is localCheckpointed per round (deep-
    lineage fix), so the TRAINING round's plan is audited directly; the
    consumer plan is separately checked to broadcast the codebook."""
    import pyspark.sql.functions as F

    from tigate_spark.functions import similarity as sim
    from tigate_spark.plans.audit import plan_of
    from tigate_spark.sources.batch import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    base = sim.with_quantized(emb).select("vec_id", "q", "norm_sq")
    cents = (
        base.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("cent_id"), F.col("q").alias("cq"))
    )
    round_plan = plan_of(sim._recompute_centroids(
        sim._assign_cells(base, cents)))
    assert "posexplode" in round_plan or "Generate" in round_plan, round_plan
    assert "collect_list(q" not in round_plan
    # consumer side: the materialized codebook must still broadcast to
    # the assignment step — the corpus never shuffles for assignment
    consumer = plan_of(_df(spark, "embed_kmeans_clusters"))
    assert ("BroadcastNestedLoopJoin" in consumer
            or "BroadcastExchange" in consumer), consumer
    assert "collect_list(q" not in consumer


def test_chunking_zero_shuffle(spark):
    """Sliding-window chunking is per-row explode — no exchange; a
    100 TB documents scan chunks map-side."""
    df = _df(spark, "text_chunk_documents")
    assert count_exchanges(df) == 0
    assert_no_python_in_plan(df)


@pytest.mark.slow
def test_craft_encoders_jvm_side_and_lane_bounded(spark):
    """Craft framing (single, batch, resolved) and the avro/open wire
    encoders are pure column expressions; the batch fold shuffles only
    on the lane key."""
    for name in ("encoder_craft_framed", "encoder_craft_batch_framed",
                 "encoder_craft_resolved", "encoder_avro_confluent_framed",
                 "encoder_open_resolved", "encoder_open_ddl"):
        assert_no_python_in_plan(_df(spark, name))


def test_source_budget_single_lane_shuffle(spark):
    """Token-budget sampling: the budget side broadcasts; the corpus
    shuffles once for the per-source window cumsum."""
    df = _df(spark, "sample_source_token_budget")
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(df) >= 1
        assert_no_python_in_plan(df)


def test_label_outliers_broadcast_centroids(spark):
    """Label-outlier audit: centroids/counts broadcast back to the scan;
    the Lloyd-style partial sum goes through posexplode, never
    collect_list of whole vectors per label on the corpus side."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "embed_label_outliers")
    with no_auto_broadcast(spark):
        plan = plan_of(df)
        assert "BroadcastExchange" in plan, plan
        assert_no_python_in_plan(df)


def test_semdedup_chunk_local_pairs(spark):
    """SemDeDup: near-dup pairs come from chunk-local array combinations
    (flatten/transform of collected (cell, chk) runs), never a self-join
    of the assigned corpus; the codebook joins by broadcast."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "dedup_semantic_semdedup")
    with no_auto_broadcast(spark):
        plan = plan_of(df)
        assert "flatten(transform(sequence" in plan
        assert "BroadcastExchange" in plan, plan
        assert_no_python_in_plan(df)


def test_dsir_bucket_table_broadcasts(spark):
    """DSIR importance weights: the 256-row bucket-ratio table broadcasts
    back to the token stream — the corpus is never shuffled for scoring
    (the only exchanges are the two fixed-width bucket aggs + doc agg)."""
    df = _df(spark, "sample_importance_dsir")
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(df) >= 1
        assert_no_python_in_plan(df)


def test_fuzzy_decontaminate_broadcasts_eval_index(spark):
    """Fuzzy MinHash decontamination: the eval band index broadcasts; the
    training corpus takes one signature scan + broadcast join."""
    df = _df(spark, "decontaminate_fuzzy_minhash")
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(df) >= 1
        assert_no_python_in_plan(df)


def test_corpus_shuffle_single_exchange(spark):
    """Global shuffle assignment: exactly the one shard-key exchange you
    must pay to randomize order — no global sort, no second shuffle."""
    df = _df(spark, "corpus_shuffle_assign")
    assert count_exchanges(df) == 1
    assert_no_python_in_plan(df)


def test_encode_is_pure_task_parallelism(spark):
    """E3 (encoder group): the reference runs N concurrent encoders over a
    futures queue (encoder_group.go:42-145); in Spark the per-row encode
    is a zero-exchange map stage, so parallelism IS the input partition
    count — nothing to schedule, no order-restoring queue needed. Pinned:
    the canal-json encode plan has no exchange between scan and output,
    and repartitioning the input multiplies encode tasks with no change
    to the plan shape."""
    from tigate_spark.functions.encoders import encode_canal_json
    from tigate_spark.sources.changes import changes_stream

    # fan_out=False: the r17 adaptive scan fan-out adds its own exchange
    # before normalization on small inputs; this gate pins that the ENCODE
    # itself contributes zero exchanges on top of whatever input it gets
    ch = changes_stream(spark, SF_DIR, with_images=True,
                        fan_out=False).repartition(8)
    enc = encode_canal_json(ch)
    # the only exchange is the explicit fan-out repartition; encode adds none
    assert count_exchanges(enc) == 1
    assert_no_python_in_plan(enc)
    assert enc.rdd.getNumPartitions() == 8


def test_pca_gram_is_maplocal_partial_agg(spark):
    """PCA: the Gram matrix comes from an array-local outer product +
    64²-key partial agg — exactly one exchange beyond the fan-out
    repartition, and never a self-join of the exploded corpus."""
    from tigate_spark.functions.similarity import with_quantized
    from tigate_spark.sources.batch import load_table
    import pyspark.sql.functions as F

    base = with_quantized(load_table(spark, SF_DIR, "embeddings")).select("q")
    prod = F.expr("flatten(transform(q, x -> transform(q, y -> x * y)))")
    g = base.select(F.posexplode(prod).alias("k", "p")).groupBy("k").agg(
        F.sum("p").alias("g")
    )
    from tigate_spark.plans.audit import plan_of

    # fan-out repartition + the agg exchange
    assert count_exchanges(g) <= 2
    plan = plan_of(g)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_pq_training_partial_agg_and_broadcast_codebook(spark):
    """PQ: assignment joins the 8x16-row codebook by broadcast; the Lloyd
    update shuffles (s, cell, dim) partial sums only — never whole
    vectors per cell; encoding stays JVM-side."""
    df = _df(spark, "embed_pq_encode")
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(df) >= 1
        assert_no_python_in_plan(df)


def test_substring_spans_no_pair_generation(spark):
    """Exact substring-span dedup: one agg + one join back on the shingle
    key — no quadratic pair arrays anywhere, no Python in the plan."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "dedup_substring_spans")
    with no_auto_broadcast(spark):
        plan = plan_of(df)
        assert "flatten(transform(sequence" not in plan  # no pair explode
        assert_no_python_in_plan(df)


def test_lm_score_stat_tables_shuffle_joined(spark):
    """Bigram-LM scoring: the count tables scale with vocabulary² so they
    must SHUFFLE-join the bigram stream (broadcasting them is the 100 TB
    trap); per-doc agg stays map-side combined; all JVM-side."""
    df = _df(spark, "text_lm_score")
    with no_auto_broadcast(spark):
        assert_shuffle_join(df)
        assert_no_python_in_plan(df)


def test_bpe_merge_match_is_filter_not_join(spark):
    """BPE merge application: the winning pair is resolved driver-side
    (1-row scale-independent argmax) and pushed into the match scan as a
    literal FILTER — the corpus side must carry no pair-match join at
    all; gaps-and-islands runs per doc with no Python."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "bpe_merge_apply")
    with no_auto_broadcast(spark):
        plan = plan_of(df)
        # exactly one join survives: toks <- merged on doc_id (the
        # formatted detail section prints one "Join type:" per join node)
        assert plan.count("Join type:") == 1, plan
        assert_no_python_in_plan(df)


def test_gopher_flags_zero_shuffle(spark):
    """Gopher quality gate: pure per-row array math — the plan must carry
    NO exchange at all (the flags run inside the scan stage) and no
    Python."""
    df = _df(spark, "text_gopher_quality_flags")
    with no_auto_broadcast(spark):
        assert count_exchanges(df) == 0
        assert_no_python_in_plan(df)


def test_mixture_plan_broadcasts_scalar_stats(spark):
    """Mixture-epoch waterfill: the per-source table and its two scalar
    aggregates are broadcast-sized at any corpus scale — every join in
    the plan must be a broadcast, never a shuffle join of the stats."""
    df = _df(spark, "sample_mixture_epochs")
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(df) >= 3
        assert "SortMergeJoin" not in df._jdf.queryExecution().executedPlan().toString()
        assert_no_python_in_plan(df)


def test_paragraph_fraction_digest_keyed(spark):
    """Paragraph-dedup fraction: shuffle keys are md5 digests, pair
    generation is absent (no flatten/transform pair arrays), and the
    doc-level agg is map-side combined; all JVM-side."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "dedup_paragraph_fraction")
    with no_auto_broadcast(spark):
        plan = plan_of(df)
        assert "flatten(transform(sequence" not in plan
        assert_no_python_in_plan(df)


def test_flush_batches_single_lane_exchange(spark):
    """Flush batching: exactly one hash exchange on the lane key feeds
    the per-lane greedy walk (FlatMapGroupsInPandas IS the operator —
    the lane walk is sequential by the reference's worker semantics, so
    Python here is the declared extension surface, not a leak); the
    upstream txn grouping contributes its one agg exchange."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "sink_txn_flush_batches")
    with no_auto_broadcast(spark):
        plan = plan_of(df)
        # one Arrow-grouped node (appears once in the tree and once in
        # the detail section of the formatted plan), no row-at-a-time
        # Python anywhere
        assert plan.count("FlatMapGroupsInPandas") == 2, plan
        assert "BatchEvalPython" not in plan
        assert count_exchanges(df) <= 3, plan


def test_safe_mode_sql_and_bridge_stay_jvm_side(spark):
    """Round-7 codec additions — the safe-mode SQL renderer (format_string
    + one posexplode) and the debezium->open bridge (from_json +
    format_string) — carry zero Python and zero exchanges."""
    for name in ("encoder_mysql_sql_safe_mode", "convert_debezium_to_open"):
        df = _df(spark, name)
        assert_no_python_in_plan(df)
        # data exchanges only: the adaptive scan fan-out is not dataflow
        assert count_data_exchanges(df) == 0


def test_storage_tree_partition_prunes(spark, tmp_path):
    """The cloud-storage sink's dated tree (schema_name/table_name/dt
    directories) must behave like a partitioned table on read-back: a
    table_name filter becomes a PartitionFilter on the scan — directory
    pruning, zero data files touched for other tables. At 100 TB the
    dated tree IS the replica's query interface, so losing this is
    losing partition pruning on every consumer query."""
    import io
    from contextlib import redirect_stdout

    import pyspark.sql.functions as F

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed
    from tigate_spark.streaming.sinks import read_storage

    cfg = ChangefeedConfig(changefeed_id="prune", sink_uri="file://out")
    cf = Changefeed(spark, cfg, os.path.join(SF_DIR, "events.parquet"),
                    str(tmp_path))
    cf.run_to_completion()
    flt = read_storage(spark, cf.sink.out_dir).filter(
        F.col("table_name") == "t1")
    buf = io.StringIO()
    with redirect_stdout(buf):
        flt.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "table_name" in pf[0], plan


def test_c4_span_shuffle_payload_is_digests(spark):
    """C4 span excision: every hash-partitioned exchange keys on the span
    digest / doc position — document TEXT and token arrays must be pruned
    out before any shuffle (at 100 TB the span text staying in the scan
    stage is the whole scale story). Keep-first must be the skew-safe
    partial-aggregable groupBy(h) min-struct, NOT a window partitioned by
    the digest: a boilerplate span duplicated 10^8x (exactly the data
    this operator exists to remove) would land every occurrence in one
    task under a per-digest window."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "dedup_c4_span_excise")
    plan = plan_of(df)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "tokens#" not in line, line
        # no Window node anywhere on the digest path — keep-first is an agg
        assert "Window" not in line, line
    # digest agg + join back + distinct + 2 per-doc aggs + 2 joins back
    assert count_exchanges(df) <= 8
    # the hot-digest reduction happens map-side: partial min/count before
    # the h-keyed exchange
    assert "partial_min" in plan or "partial min" in plan.lower(), plan


def test_avro_evolution_is_pure_column_expressions(spark):
    """Registry-evolution framing: per-row map over the change scan —
    no Python on the path, no data shuffle (the 1-row boundary agg runs
    at build time, not in the returned plan)."""
    df = _df(spark, "encoder_avro_registry_evolution")
    assert_no_python_in_plan(df)
    assert count_exchanges(df) == 0


def test_bpe_batched_round_uses_broadcast_merge_set(spark):
    """Batched BPE round: the selected-merge set joins against the bigram
    frame via an explicit broadcast (codebook-sized M rows) — a shuffle
    join here would re-partition the full corpus bigram table per round."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from tigate_spark.catalog_llm import _bpe_bigrams
    from tigate_spark.functions import text as tx
    from tigate_spark.plans.audit import count_broadcast_exchanges
    from tigate_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cur = tx.with_tokens(docs).select("doc_id", "tokens")
    bg = _bpe_bigrams(cur)
    sel_df = spark.createDataFrame(
        [("a", "b")],
        StructType([StructField("w1", StringType()),
                    StructField("w2", StringType())]),
    )
    joined = bg.join(F.broadcast(sel_df), ["w1", "w2"])
    with no_auto_broadcast(spark):
        assert count_broadcast_exchanges(joined) >= 1


def test_consumer_decoders_stay_jvm_side(spark):
    """The r10 consumer decode paths (open-protocol key/value, storage
    csv lines) are pure from_json/split column maps — zero Python on the
    hot consume path (the apply loop already pays the writer; the decode
    must stay whole-stage codegen)."""
    from pyspark.sql import functions as F

    from tigate_spark.functions.encoders import (
        decode_csv_for_apply,
        decode_open_for_apply,
        encode_csv_rows,
        encode_open_protocol,
    )
    from tigate_spark.sources.changes import changes_stream

    ch = changes_stream(spark, SF_DIR, with_images=True)
    open_wire = encode_open_protocol(
        ch.withColumn("topic", F.lit("t")).withColumn(
            "partition", F.lit(0)))
    assert_no_python_in_plan(decode_open_for_apply(open_wire))
    csv_wire = encode_csv_rows(ch, out_col="line").select("line")
    assert_no_python_in_plan(decode_csv_for_apply(csv_wire))
    # and decode is exchange-free: reconstruction is row-local (the
    # adaptive scan fan-out on the encode input is not dataflow)
    assert count_data_exchanges(decode_open_for_apply(open_wire)) == 0
    assert count_data_exchanges(decode_csv_for_apply(csv_wire)) == 0


def test_aqe_skew_join_resplits_hot_partition(spark):
    """R9's built-in path: AQE detects a skewed SMJ partition at runtime
    and re-splits it (`skew=true` in the final adaptive plan) — the
    engine's explicit salting ops (operators/skew.py) are the
    deterministic twin for when the optimizer must not be trusted; this
    gate proves the session confs leave the built-in path functional.
    Thresholds are lowered ONLY inside this test so a 400k-row fixture
    exhibits 'skew' — at production sizes the defaults fire the same
    rule."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payloadpayloadpayload"),
                     F.col("id")).alias("v"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k").select(F.length("v").alias("n"))
        j.collect()  # executes THIS dataset's QueryExecution under AQE
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tidb_checksum_zero_exchange_pure_jvm(spark):
    """The byte-exact TiDB row checksum (r11) is one crc32-over-concat
    projection: no Python, no shuffle — at 100 TB it rides inside the
    scan stage like every other integrity column."""
    df = _df(spark, "projection_checksum_tidb")
    assert_no_python_in_plan(df)
    assert count_exchanges(df) == 0


def test_claim_check_fetch_join_broadcasts(spark):
    """The degraded-message consumer's claim-check fetch (r11) joins the
    wire against ONLY the oversized payload store — bounded by the
    large-message fraction, so the fetch must be a broadcast join, never
    a sort-merge over the corpus."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "decoder_open_large_message")
    assert_broadcast_join(df, 1)
    plan = plan_of(df)
    assert "SortMergeJoin" not in plan


def test_compressed_wire_python_is_arrow_batched(spark):
    """Compression is the one genuinely non-SQL step (per-value DEFLATE):
    its Python must be Arrow-batched (ArrowEvalPython), never
    row-at-a-time BatchEvalPython."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "encoder_open_compressed")
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_simple_avro_encode_zero_exchange_pure_jvm(spark):
    """The simple-Avro DML wire (r12) is one generated-expression
    projection: no Python, no shuffle — the encode rides inside the
    scan stage at any scale (file count supplies the parallelism,
    exactly like the TiDB checksum projection)."""
    df = _df(spark, "encoder_simple_avro")
    assert_no_python_in_plan(df)
    assert count_exchanges(df) == 0


def test_simple_avro_checksum_encode_zero_exchange(spark):
    """The checksum-holder variant composes the CRC fold into the same
    projection — still zero-Exchange, still pure JVM."""
    df = _df(spark, "encoder_simple_avro_checksum")
    assert_no_python_in_plan(df)
    # data exchanges only: the adaptive scan fan-out is not dataflow
    assert count_data_exchanges(df) == 0


def test_simple_avro_decoder_is_arrow_mapinpandas(spark):
    """The consumer's independent Avro reader is the documented Python
    extension lane: Arrow mapInPandas over the wire column, no
    row-at-a-time eval, and no shuffle added beyond the encode side."""
    from tigate_spark.plans.audit import plan_of

    df = _df(spark, "decoder_simple_avro")
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert count_exchanges(df) == 0


def test_folded_selector_stays_whole_stage(spark):
    """The wide-rule folded dispatch (auto above FOLD_RULE_THRESHOLD)
    must keep its Projects inside whole-stage codegen — the form exists
    to remove the nested form's ~400-rule analyzer ceiling, so a
    codegen fallback here would silently lose the hot path."""
    import re

    from pyspark.sql import functions as F

    from tigate_spark.config import ColumnSelector
    from tigate_spark.operators.projections import column_selectors

    df = spark.createDataFrame(
        [("app", f"t{i % 4}", i % 4, i % 4, i, i, f"e{i}", i, i)
         for i in range(64)],
        "schema_name string, table_name string, table_id long, "
        "physical_table_id long, commit_ts long, pk long, "
        "event_type string, value_cents long, user_id long")
    rules = [ColumnSelector(matcher=[f"app.t{i % 4}"],
                            columns=["*", "!user_id" if i % 2 else
                                     "!event_type"])
             for i in range(350)]  # above the 300 gate → folded form
    out = column_selectors(df, rules)
    assert out.count() == 64  # must not stack-overflow the analyzer
    plan = out._jdf.queryExecution().executedPlan().toString()
    proj = [ln for ln in plan.splitlines() if "Project" in ln]
    assert proj and all(re.search(r"\*\(\d+\)", ln) for ln in proj), plan
    # and the dispatch is real: rows matching a rule had a column NULLed
    assert out.where(F.col("user_id").isNull()).count() > 0
