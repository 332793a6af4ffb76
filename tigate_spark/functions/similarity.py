"""Similarity search over embedding columns (SURVEY §7 M6).

The embedding column is ``array<float>``; all arithmetic runs on a
**quantized integer copy** (``round(x·10⁴)``) so dot products are exact
64-bit integers and the DuckDB oracle reproduces ranking bit-for-bit
(float reduction order would otherwise differ between engines).

Scale design:
- Brute-force top-k broadcasts the (small) query set against the corpus —
  one pass, no shuffle of the corpus, perfectly parallel. This is the
  exact baseline.
- The LSH path (8 deterministic hyperplanes → 256 buckets) prefilters
  candidates to the query's bucket — the 100 TB path where brute force is
  off the table. An IVF variant is the same shape with learned centroids.

Everything is higher-order array functions — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H32 = "cast(conv(substr(md5({e}), 1, 8), 16, 10) as bigint)"

#: integer quantization of the embedding (exact cross-engine arithmetic)
QUANT_EXPR = "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))"

N_PLANES = 8
DIM = 64


def with_quantized(df: DataFrame) -> DataFrame:
    # fan out: a single parquet split would serialize the vector math
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df.withColumn("q", F.expr(QUANT_EXPR)).withColumn(
        "norm_sq", F.expr("aggregate(q, 0L, (acc, x) -> acc + x * x)")
    )


def brute_force_topk(df: DataFrame, n_queries: int = 20, k: int = 10) -> DataFrame:
    """Exact cosine top-k: queries (vec_id < n_queries) × corpus.

    cos = dot / (√|q|·√|c|) on exact integer dot/norms; rank ties broken by
    neighbor id so results are fully deterministic.
    """
    base = with_quantized(df).select("vec_id", "q", "norm_sq")
    queries = F.broadcast(
        base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm_sq").alias("q_norm"),
        )
    )
    joined = base.crossJoin(queries).filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "dot", F.expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    ).withColumn(
        "cos_bp",
        F.expr(
            "cast(round(dot / (sqrt(cast(norm_sq as double)) * sqrt(cast(q_norm as double)))"
            " * 10000) as bigint)"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_bp").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos_bp")
    )


def _plane_coefs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplane coefficients in [-1000, 1000],
    md5-derived — identical to the oracle's inline derivation, but computed
    once at plan time instead of 512 md5 calls per row."""
    from tigate_spark.functions.phash import h32_py

    return [
        [(h32_py(f"pl{p}_{d}") % 2001) - 1000 for d in range(1, dim + 1)]
        for p in range(n_planes)
    ]


def lsh_bucket(df: DataFrame, n_planes: int = N_PLANES, dim: int = DIM) -> DataFrame:
    """Sign-random-projection bucket id (0..2^n_planes-1) per vector."""
    coefs = _plane_coefs(n_planes, dim)
    bucket = None
    for p in range(n_planes):
        arr = "array(" + ", ".join(f"{c}L" for c in coefs[p]) + ")"
        dot_p = f"aggregate(zip_with(q, {arr}, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
        bit = F.when(F.expr(dot_p) > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bit if bucket is None else bucket + bit
    return with_quantized(df).withColumn("bucket", bucket)


def ann_lsh_topk(df: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket —
    the bucket id is the join/shuffle key, so the corpus is scanned once
    and only same-bucket pairs are scored."""
    base = lsh_bucket(df).select("vec_id", "q", "norm_sq", "bucket")
    queries = F.broadcast(
        base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm_sq").alias("q_norm"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    joined = base.join(
        queries,
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.withColumn(
        "dot", F.expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    ).withColumn(
        "cos_bp",
        F.expr(
            "cast(round(dot / (sqrt(cast(norm_sq as double)) * sqrt(cast(q_norm as double)))"
            " * 10000) as bigint)"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_bp").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos_bp")
    )


def embedding_exact_dedup(df: DataFrame) -> DataFrame:
    """Exact embedding dedup on the quantized-vector digest."""
    q = with_quantized(df).withColumn(
        "qhash", F.md5(F.expr("array_join(q, ',')"))
    )
    return q.groupBy("qhash").agg(
        F.min("vec_id").alias("canonical_vec_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
