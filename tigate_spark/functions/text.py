"""Text-analysis operators for the training-data pipeline (SURVEY §7 M6).

Everything is built-in JVM expressions (split / higher-order array
functions / regexp) — no Python in the hot path, so a 100 TB documents
table runs whole-stage-codegen'd with the scan's column pruning intact.

Each helper has a DuckDB-oracle twin in :mod:`tigate_spark.catalog_llm`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: whitespace tokenizer (lowercased, empties dropped)
TOKENS_EXPR = "filter(split(lower(text), ' '), x -> x <> '')"

#: BPE-ish regex token pattern: letter runs, digit runs, single symbols
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
ES_STOPWORDS = ("el", "la", "de", "y", "en", "que", "los", "del", "se", "las")


def _inlist(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def with_tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("tokens", F.expr(TOKENS_EXPR))


def token_counts(df: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting."""
    out = with_tokens(df)
    return out.select(
        "doc_id",
        F.expr("cast(size(tokens) as bigint)").alias("n_tokens"),
        F.expr("cast(size(array_distinct(tokens)) as bigint)").alias("n_distinct_tokens"),
        F.expr(
            f"cast(size(regexp_extract_all(lower(text), '{BPE_PATTERN}', 0)) as bigint)"
        ).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Length / lexical-diversity / stopword-ratio quality signals.

    Ratios are integer basis points so results are engine-exact:
    ``ttr_bp`` = type-token ratio, ``stopword_bp`` = stopword density.
    """
    out = with_tokens(df)
    stop = _inlist(EN_STOPWORDS)
    return out.select(
        "doc_id",
        F.expr("cast(length(text) as bigint)").alias("n_chars"),
        F.expr("cast(size(tokens) as bigint)").alias("n_tokens"),
        F.expr(
            "cast(aggregate(tokens, 0L, (acc, x) -> acc + length(x)) * 100 "
            "div size(tokens) as bigint)"
        ).alias("avg_token_len_x100"),
        F.expr(
            "cast(size(array_distinct(tokens)) * 10000 div size(tokens) as bigint)"
        ).alias("ttr_bp"),
        F.expr(
            f"cast(size(filter(tokens, x -> x in ({stop}))) * 10000 "
            "div size(tokens) as bigint)"
        ).alias("stopword_bp"),
    ).withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 20)
        & (F.col("n_tokens") <= 2000)
        & (F.col("ttr_bp") >= 1000),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic (en vs es; ties → en; none → und)."""
    out = with_tokens(df)
    en = _inlist(EN_STOPWORDS)
    es = _inlist(ES_STOPWORDS)
    out = out.select(
        "doc_id",
        F.expr(f"cast(size(filter(tokens, x -> x in ({en}))) as bigint)").alias("en_hits"),
        F.expr(f"cast(size(filter(tokens, x -> x in ({es}))) as bigint)").alias("es_hits"),
    )
    return out.withColumn(
        "lang_pred",
        F.when(F.col("es_hits") > F.col("en_hits"), "es")
        .when(F.col("en_hits") > 0, "en")
        .otherwise("und"),
    )


def fingerprint(df: DataFrame) -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token vocabulary (robust to token shuffling — a cheap near-dup key)."""
    out = with_tokens(df)
    return out.select(
        "doc_id",
        F.expr("md5(array_join(array_sort(array_distinct(tokens)), ' '))").alias("fingerprint"),
    )


#: chunking defaults: 64-token windows with 16-token overlap (stride 48)
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(df: DataFrame, size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Sliding token-window chunking — the pretraining/RAG shard step:
    each document yields ``ceil(max(n - size, 0) / stride) + 1`` chunks of
    ``size`` whitespace tokens overlapping by ``size - stride``.

    Chunk boundaries are computed per row and exploded JVM-side (one
    ``transform(sequence(...))`` + ``explode`` — no shuffle at all: a
    100 TB documents scan chunks map-side and streams to the writer).
    Empty documents produce one empty chunk (chunk_id 0, end_tok 0) so
    every doc_id survives into the chunk table.
    """
    n_chunks = (
        f"CASE WHEN size(tokens) <= {size} THEN 1 "
        f"ELSE 1 + ((size(tokens) - {size} + {stride} - 1) div {stride}) END"
    )
    out = with_tokens(df).selectExpr(
        "doc_id",
        "size(tokens) AS n",
        "tokens",
        f"explode(sequence(0, {n_chunks} - 1)) AS chunk_id",
    )
    return out.selectExpr(
        "doc_id",
        "cast(chunk_id AS BIGINT) AS chunk_id",
        f"cast(chunk_id * {stride} + 1 AS BIGINT) AS start_tok",
        f"cast(least(chunk_id * {stride} + {size}, n) AS BIGINT) AS end_tok",
        f"cast(size(slice(tokens, chunk_id * {stride} + 1, {size})) AS BIGINT)"
        " AS n_chunk_tokens",
        f"array_join(slice(tokens, chunk_id * {stride} + 1, {size}), ' ')"
        " AS chunk_text",
    )


#: fixed query for the search catalog entry (frequent corpus terms)
SEARCH_TERMS = ("join", "scan", "filter")


def bm25_topk(df: DataFrame, terms: tuple[str, ...] = SEARCH_TERMS,
              k: int = 10) -> DataFrame:
    """Keyword search: BM25-style ranking (Robertson & Zaragoza 2009,
    k1=1.2, b=0.75) in EXACT INTEGER arithmetic so the ranking is
    bit-identical cross-engine:

    - rational idf (log-free variant, documented):
      ``idf_x1e6 = (N - df + 1)·10⁶ div (df + 1)``
    - tf saturation with the algebra cleared of fractions
      (k1 = 6/5, b = 3/4), using the floored milli-token average doc
      length ``A = (1000·TOT) div N`` (TOT = total corpus tokens;
      integer div — consistent across engines, not bit-equal to the
      unfloored rational form):
      ``tf_part_x1000 = 22000·tf·A div (10·tf·A + 3·A + 9000·dl)``
      — tf_part ≤ 2200 by construction, and every intermediate is
      doc-scale, not corpus-scale: the largest term is ``22000·tf·A``,
      which fits int64 whenever ``tf·avgdl < 4.2e11`` (e.g. max per-doc
      term frequency 10⁶ with average doc length 400k tokens) —
      independent of corpus size, unlike a formulation that multiplies
      by the corpus total.
    - doc score = Σ over query terms (integer sum, order-independent).

    Dataflow: the token explode feeds the per-doc length agg and the
    per-(doc, term) tf agg (two passes over the token stream — at lake
    scale the doc-length table would be precomputed corpus metadata);
    the 3-row term-stats table and the 1-row corpus stats broadcast;
    global top-k is a distributed take-ordered (score desc, doc_id) —
    no global sort materialized.
    """
    from pyspark.sql import Window

    toks = with_tokens(df).select("doc_id", F.explode("tokens").alias("t"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("(1000L * sum(dl)) div count(1)").alias("avgdl_x1000"),
    )  # exact integer milli-token average doc length
    term_list = F.array(*[F.lit(t) for t in terms])
    qt = toks.filter(F.array_contains(term_list, F.col("t")))
    df_t = qt.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
    tf = qt.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_t), "t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_x1e6",
            F.expr("((n_docs - df + 1) * 1000000L) div (df + 1)"),
        )
        .withColumn(
            "tf_part_x1000",
            F.expr(
                "(22000L * tf * avgdl_x1000) div "
                "(10L * tf * avgdl_x1000 + 3L * avgdl_x1000 + 9000L * dl)"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("idf_x1e6 * tf_part_x1000")).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "rank", "doc_id", "score", F.col("n_terms_hit").cast("bigint").alias("n_terms_hit")
    )
