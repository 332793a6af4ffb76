"""Physical-plan determinism gate: entries whose implementations use
order-sensitive constructs (F.first on constant-per-group columns,
floating sqrt with integer flooring, driver-side codebook iteration)
must produce IDENTICAL results under different shuffle-partition counts
— partition order must never leak into values."""

from __future__ import annotations

import os

import pytest

#: heavy streaming/e2e tail — excluded from the fast path
pytestmark = pytest.mark.slow

from tigate_spark.catalog import get_catalog

CATALOG = get_catalog()
SF_DIR = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")

SENSITIVE = [
    "embed_pq_encode",
    "embed_pca_project",
    "sample_temperature_mix",
    "dedup_semantic_semdedup",
    "seq_gap_resets",
    "sim_ivfpq_topk",
    # r06: winning-pair argmax (orderBy + limit 1) must tie-break on the
    # pair itself, not arrival order
    "bpe_merge_apply",
    # r06: surprisal join + truncating per-doc average
    "text_lm_score",
    # r07: per-round argmax collect + positional rebuild (sorted structs)
    "bpe_train_merges",
    # r07: per-lane pandas greedy walk must sort inside the group, never
    # rely on arrival order of the grouped batch
    "sink_txn_flush_batches",
    # r08: per-round top-C collect + driver greedy conflict filter — the
    # candidate ranking must tie-break on the pair, not arrival order
    "bpe_train_merges_batched",
    # r08: global keep-first by (doc_id, pos) via row_number per digest;
    # r09: rewritten as min(struct(doc_id, j)) per digest — the
    # lexicographic struct-min must be partition-order independent
    "dedup_c4_span_excise",
    # r09: component fixpoint (iterative min-label propagation) + hash
    # bucket — split assignment must not depend on propagation order
    "split_leakage_safe",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(spark, name):
    spec = CATALOG[name]

    def run(parts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            return sorted(map(tuple, spec.builder(spark, SF_DIR).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    assert run(7) == run(31)
