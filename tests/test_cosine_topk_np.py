"""The numpy brute-force cosine kernel (r17) is row-exact vs the previous
all-JVM expression spelling.

Two pins:

- ``quantize_np`` produces the identical int64 for every adversarial
  double the SQL ``QUANT_EXPR`` sees (binade boundaries around the 0.5
  guard, negatives, zeros, float32-representable corpus values);
- ``brute_force_topk`` (mapInPandas matmul + partition-local top-k)
  returns exactly the rows of the reconstructed JVM crossJoin + fold +
  full-window form on real testdata.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tigate_spark.functions import similarity as sim
from tigate_spark.functions.rounding import round_half_away_sql
from tigate_spark.sources.batch import load_table

# the unique double just below 0.5 (binade boundary halves the ulp) —
# the one point where the unguarded floor form diverges
_EDGE = 0.49999999999999994

ADVERSARIAL = [
    0.0, -0.0, 1.0, -1.0,
    _EDGE / 10000.0, -_EDGE / 10000.0,
    0.5 / 10000.0, -0.5 / 10000.0,
    (0.5 - 1e-18) / 10000.0,
    0.00005, -0.00005, 0.000049999, -0.000049999,
    0.99995, -0.99995, 0.123456789, -0.987654321,
    1.5e-5, 2.5e-5, 3.5e-5, -1.5e-5, -2.5e-5, -3.5e-5,
]


def test_quantize_np_matches_sql_spelling(spark):
    # run every adversarial value through both spellings; the corpus is
    # float32 (array<float>) so cast the probe values the same way
    vals = [float(np.float32(v)) for v in ADVERSARIAL]
    df = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(vals)], "vec_id bigint, embedding array<float>"
    )
    got_sql = [
        r.q[0]
        for r in df.select(F.expr(sim.QUANT_EXPR).alias("q"))
        .orderBy("vec_id" if "vec_id" in df.columns else "q")
        .collect()
    ]
    got_np = sim.quantize_np(
        np.array(vals, dtype=np.float64).reshape(-1, 1)
    )[:, 0].tolist()
    assert got_sql == got_np


def _brute_force_topk_jvm(df, n_queries=20, k=10):
    """The pre-r17 all-JVM spelling, reconstructed verbatim."""
    base = sim.with_quantized(df).select("vec_id", "q", "norm_sq")
    queries = F.broadcast(
        base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm_sq").alias("q_norm"),
        )
    )
    joined = base.crossJoin(queries).filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn("dot", F.expr(sim.dot_sql("q", "qq"))).withColumn(
        "cos_bp",
        F.expr(
            round_half_away_sql(
                "dot / (sqrt(cast(norm_sq as double)) * "
                "sqrt(cast(q_norm as double))) * 10000"
            )
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


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01"])
def test_brute_force_topk_np_matches_jvm_form(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    kernel = sim.brute_force_topk(emb, use_kernel=True)
    jvm = sim.brute_force_topk(emb, use_kernel=False)
    old = _brute_force_topk_jvm(emb)
    # kernel path == in-module JVM path == reconstructed pre-r17 spelling
    assert kernel.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(kernel).count() == 0
    assert jvm.exceptAll(old).count() == 0
    assert old.exceptAll(jvm).count() == 0
    assert kernel.count() == 200  # 20 queries × k=10, non-trivial


def test_brute_force_topk_is_arrow_mapinpandas(spark):
    """The scoring kernel is Arrow-batched (MapInPandas), never
    row-at-a-time Python, and the cross-join + second corpus scan of the
    old spelling are gone (one Scan parquet, no join node)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    plan = (
        sim.brute_force_topk(emb, use_kernel=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_brute_force_topk_scale_gate(spark, monkeypatch):
    """The corpus-rows gate picks the JVM form below the crossover, the
    kernel at/above it, and the kernel when the input cannot be sized."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    nrows = sim._corpus_input_rows(emb)
    # footer row count is exact, not an estimate
    assert nrows == emb.count()
    assert 0 < nrows < sim.KERNEL_MIN_ROWS

    # tiny file input → JVM expression scoring (no Python node)
    plan = sim.brute_force_topk(emb)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "Join" in plan

    # same input with the threshold lowered → kernel
    monkeypatch.setattr(sim, "KERNEL_MIN_ROWS", 1)
    plan = sim.brute_force_topk(emb)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    monkeypatch.undo()

    # non-file input (size unknown) → kernel, the at-scale default
    mem = spark.createDataFrame(
        [(i, [float(i)] * sim.DIM) for i in range(30)],
        "vec_id bigint, embedding array<float>",
    )
    assert sim._corpus_input_rows(mem) is None
    plan = sim.brute_force_topk(mem)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_brute_force_topk_empty_queries(spark):
    emb = spark.createDataFrame(
        [(100 + i, [float(i)] * sim.DIM) for i in range(5)],
        "vec_id bigint, embedding array<float>",
    )
    assert sim.brute_force_topk(emb, use_kernel=True).count() == 0
    assert sim.brute_force_topk(emb, use_kernel=False).count() == 0
