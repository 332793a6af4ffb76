"""The r18 single-bigint LSH bucket key (``band << 62 | v``) must be
injective over the full domain the band values can take, and the packed
pipeline must produce the exact pair set of the unpacked (band, v)
grouping. MINHASH_P bounds both minhashes below 2^31, so v < 2^62 and
band < 4 → 64 bits exactly; the module-level assert in functions/dedup.py
trips if the hash family ever widens."""

from pyspark.sql import functions as F

from tigate_spark.functions import dedup as dd


def test_pack_width_invariant():
    # the assert in dedup.py is the loud guard; restate the arithmetic
    assert dd.MINHASH_P <= (1 << 31) - 1
    v_max = ((dd.MINHASH_P) << 31) + dd.MINHASH_P
    assert v_max < (1 << 62)
    # band << 62 | v is injective in two's-complement int64: distinct
    # (band, v) map to distinct bit patterns
    seen = set()
    for band in range(dd.MINHASH_BANDS):
        for v in (0, 1, dd.MINHASH_P, v_max):
            packed = ((band << 62) + v) & ((1 << 64) - 1)
            assert packed not in seen
            seen.add(packed)


def test_packed_grouping_matches_band_v_grouping(spark, sf_dir):
    from tigate_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = dd.minhash_lsh_pairs(docs)
    # reference: the pre-r18 two-column grouping
    pairs_expr = F.expr(
        "flatten(transform(sequence(0, size(ds) - 2), i -> "
        "transform(sequence(i + 1, size(ds) - 1), j -> "
        "struct(ds[i] as doc_a, ds[j] as doc_b))))"
    )
    ref_buckets = (
        dd.lsh_bands(docs)
        .groupBy("band", "v")
        .agg(F.expr("array_sort(collect_list(doc_id))").alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= dd.LSH_BUCKET_CAP))
    )
    ref = (
        ref_buckets.select(F.explode(pairs_expr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    assert packed.exceptAll(ref).count() == 0
    assert ref.exceptAll(packed).count() == 0
