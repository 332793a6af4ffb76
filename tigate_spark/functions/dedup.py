"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (100 TB documents):
- Exact dedup is one hash-aggregate on a digest column (map-side combine).
- Shingle/Jaccard candidates come from an **inverted-index self-join on the
  shingle** (explode → join → count), never an O(n²) cross join; at scale
  the shingle column is the shuffle key, AQE handles skewed (stop-phrase)
  shingles, and 5-token shingles keep the posting lists short.
- MinHash signatures are computed **row-locally** with higher-order array
  functions (no explosion); only the tiny (doc, band) pairs shuffle.
- SimHash is likewise row-local bit arithmetic.

All hashes are md5-derived (``functions.phash``) so the DuckDB oracles in
:mod:`tigate_spark.catalog_llm` reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tigate_spark.functions.text import TOKENS_EXPR

#: MinHash modulus (2^31 - 1, prime); products stay < 2^62 — no overflow.
MINHASH_P = 2_147_483_647
#: number of MinHash functions == number of singleton LSH bands (b=8, r=1)
MINHASH_K = 8

_H32 = "cast(conv(substr(md5({e}), 1, 8), 16, 10) as bigint)"

#: 5-token shingles of the whitespace tokens (empty when < 5 tokens)
SHINGLES_EXPR = (
    "case when size(tokens) >= 5 then "
    "transform(sequence(1, size(tokens) - 4), i -> concat_ws(' ', slice(tokens, i, 5))) "
    "else cast(array() as array<string>) end"
)


def with_shingles(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("tokens", F.expr(TOKENS_EXPR))
        .withColumn("shingles", F.expr(f"array_distinct({SHINGLES_EXPR})"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5-content groups → canonical id + copy count."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(df: DataFrame) -> DataFrame:
    """Candidate near-dup pairs with exact Jaccard over 5-gram shingle sets.

    Inverted-index join: docs sharing ≥1 shingle become candidates; Jaccard
    in basis points = 10000·|∩| / |∪|.
    """
    sh = with_shingles(df).select(
        "doc_id",
        F.expr("cast(size(shingles) as bigint)").alias("n_sh"),
        F.explode("shingles").alias("s"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("union_sz"),
        F.expr("cast(inter * 10000 div (n_a + n_b - inter) as bigint)").alias("jaccard_bp"),
    )


def minhash_signature(df: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Row-local MinHash signature: sig[i] = min over shingles of
    ((a_i·h + b_i) mod p), with a_i/b_i md5-derived per function index.

    Docs with no shingles (<5 tokens) are excluded (degenerate signature).
    """
    p = MINHASH_P
    hs = f"transform(shingles, s -> {_H32.format(e='s')} % {p})"
    a_i = _H32.format(e=f"concat('mh_a', cast(i as string))") + f" % {p}"
    b_i = _H32.format(e=f"concat('mh_b', cast(i as string))") + f" % {p}"
    sig = (
        f"transform(sequence(0, {k - 1}), i -> "
        f"aggregate({hs}, {p}L, (acc, h) -> least(acc, (({a_i}) * h + ({b_i})) % {p})))"
    )
    return (
        with_shingles(df)
        .filter(F.expr("size(shingles) >= 1"))
        .select("doc_id", F.expr(sig).alias("sig"))
    )


def minhash_lsh_pairs(df: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """LSH candidate pairs: b=k singleton bands — docs agreeing on minhash
    function i land in bucket (i, value); pairs count shared bands.

    Only (doc, band) rows shuffle — tiny vs the corpus.
    """
    sigs = minhash_signature(df, k)
    bands = sigs.select(
        "doc_id", F.posexplode("sig").alias("band", "v")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash(df: DataFrame, bits: int = 32) -> DataFrame:
    """Row-local 32-bit SimHash over the distinct-token vocabulary:
    bit b set iff Σ_tokens (±1 by token-hash bit b) > 0."""
    hs = f"transform(array_distinct(tokens), t -> {_H32.format(e='t')})"
    sig = (
        f"aggregate(transform(sequence(0, {bits - 1}), b -> "
        f"case when aggregate({hs}, 0L, (acc, h) -> acc + "
        f"case when (shiftright(h, cast(b as int)) & 1) = 1 then 1 else -1 end) > 0 "
        f"then shiftleft(1L, cast(b as int)) else 0L end), 0L, (acc, x) -> acc + x)"
    )
    return (
        df.withColumn("tokens", F.expr(TOKENS_EXPR))
        .select("doc_id", F.expr(sig).alias("simhash"))
    )


def simhash_near_pairs(df: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share ≥1 of four 8-bit chunks
    (banded LSH on the signature), then exact Hamming filter."""
    sh = simhash(df)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> "
                "struct(c as chunk, shiftright(simhash, cast(c * 8 as int)) & 255 as v))"
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", F.col("ch.chunk").alias("chunk"), F.col("ch.v").alias("v"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
