"""Pin the r17-optimized shingle machinery to its reference spellings.

Two internals changed for speed in the optimization round, both of which
must stay row-exact with the original forms:

- ``SHINGLES_EXPR`` builds each 5-gram with five direct array lookups
  instead of ``slice(tokens, i, 5)`` (no per-shingle allocation);
- ``MIN5_TOKENS_PRED`` gates on a possessive early-exit regex instead of
  materializing ``split(text, ' ')`` just to count tokens.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tigate_spark.functions import dedup as dd

REF_SHINGLES = (
    "case when size(tokens) >= 5 then "
    "transform(sequence(1, size(tokens) - 4), i -> concat_ws(' ', slice(tokens, i, 5))) "
    "else cast(array() as array<string>) end"
)
REF_PRED = "size(filter(split(text, ' '), x -> x <> '')) >= 5"

ADVERSARIAL = [
    "",
    " ",
    "     ",
    "a",
    "a b c d",
    "a b c d e",
    "a b c d e f",
    " a b c d e",
    "a  b   c d e ",
    "    a b c d e    ",
    "a\tb c d e f",          # tab is NOT a token boundary
    "a\nb c d e f",
    "ab\t\ncd ef gh ij",
    "a b c d\te",            # 4 space-separated runs only
    "a b c d \te",           # 5th run starts with a tab char
    "\t \t a b c d",
    "x" * 10000,             # one giant token
    ("x " * 4) + "y",        # exactly 5
    ("x " * 4),              # trailing space, 4 tokens
    (" " * 100) + "a b c d e",
    "a b c d e" + (" " * 100),
    "ab cd ef gh",
    "ab cd ef gh ",
    "ab cd ef gh i",
    "a b c d e f",      # NBSP inside a token
]


@pytest.fixture(scope="module")
def adversarial_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "doc_id int, text string"
    )


def test_min5_pred_matches_split_count_on_adversarial(adversarial_df):
    bad = adversarial_df.filter(
        F.expr(f"({REF_PRED}) <> ({dd.MIN5_TOKENS_PRED})")
    ).collect()
    assert bad == [], [r.text for r in bad]


def test_min5_pred_matches_split_count_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.filter(F.expr(f"({REF_PRED}) <> ({dd.MIN5_TOKENS_PRED})")).count()
    assert n == 0


def test_indexed_shingles_match_slice_spelling(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.withColumn(
        "tokens", F.expr("filter(split(lower(text), ' '), x -> x <> '')")
    )
    cur = tok.select("doc_id", F.expr(dd.SHINGLES_EXPR).alias("sh"))
    ref = tok.select("doc_id", F.expr(REF_SHINGLES).alias("sh"))
    assert cur.exceptAll(ref).count() == 0
    assert ref.exceptAll(cur).count() == 0


def test_indexed_shingles_match_on_short_and_empty_docs(spark):
    rows = [(0, ""), (1, "a b"), (2, "a b c d"), (3, "a b c d e"),
            (4, "a a a a a a"), (5, "  x  y  z  w  v  u  ")]
    df = spark.createDataFrame(rows, "doc_id int, text string").withColumn(
        "tokens", F.expr("filter(split(lower(text), ' '), x -> x <> '')")
    )
    cur = df.select("doc_id", F.expr(dd.SHINGLES_EXPR).alias("sh"))
    ref = df.select("doc_id", F.expr(REF_SHINGLES).alias("sh"))
    assert sorted(map(tuple, cur.collect())) == sorted(map(tuple, ref.collect()))
