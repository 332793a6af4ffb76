"""Leakage-safety property for split_leakage_safe: every near-duplicate
pair (the MinHash-LSH edge set the split is built on) must land in ONE
split — the whole point of cluster-aware splitting (Lee et al. 2022:
random splits inflate held-out scores when near-dups straddle them)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_near_dup_pairs_never_straddle_splits(spark, sf_dir):
    from tigate_spark.catalog_llm import split_leakage_safe
    from tigate_spark.functions import dedup as dd
    from tigate_spark.sources.batch import load_table

    split = split_leakage_safe(spark, sf_dir).select("doc_id", "split")
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    n_pairs = pairs.count()
    assert n_pairs > 0, "no LSH pairs at this SF — property is vacuous"
    straddles = (
        pairs.join(split.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("split", "split_a"), "doc_a")
        .join(split.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("split", "split_b"), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddles == 0
    # and the split is total + deterministic over the corpus
    n_docs = docs.count()
    assert split.count() == n_docs
    assert split.select("split").distinct().count() <= 3
