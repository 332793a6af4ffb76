"""Property-based tests: the r06 rewrites vs direct Python models.

1. ``ngram_jaccard_pairs`` (single-pass membership+pair aggregation) must
   agree with a brute-force Python computation of exact Jaccard over the
   kept-shingle universe on adversarial corpora (heavy duplication, short
   docs, stop-shingles crossing the df cap).
2. ``bpe_merge_apply``'s gaps-and-islands merge count must equal a direct
   left-to-right non-overlapping merge simulation.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = ["a", "b", "c", "d"]

doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=14).map(" ".join)


def _shingles(text):
    toks = [t for t in text.lower().split(" ") if t]
    return {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}


def _jaccard_model(texts, df_cap):
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    df: dict[str, int] = {}
    for s_set in sh.values():
        for s in s_set:
            df[s] = df.get(s, 0) + 1
    kept = {i: {s for s in s_set if df_cap is None or df[s] <= df_cap}
            for i, s_set in sh.items()}
    out = {}
    ids = sorted(kept)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(kept[a] & kept[b])
            if inter:
                union = len(kept[a] | kept[b])
                out[(a, b)] = (inter, union, inter * 10000 // union)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
@given(st.lists(doc, min_size=2, max_size=10), st.sampled_from([2, 3, None]))
def test_jaccard_single_pass_matches_model(spark_prop, texts, df_cap):
    from tigate_spark.functions import dedup as dd

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"], r["jaccard_bp"])
        for r in dd.ngram_jaccard_pairs(df, df_cap=df_cap).collect()
    }
    assert got == _jaccard_model(texts, df_cap)


def _ltr_merges(tokens, w1, w2):
    """Direct left-to-right non-overlapping merge simulation."""
    i, merges = 0, 0
    while i < len(tokens) - 1:
        if tokens[i] == w1 and tokens[i + 1] == w2:
            merges += 1
            i += 2
        else:
            i += 1
    return merges


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(["a", "b"]), min_size=0,
                         max_size=12).map(" ".join),
                min_size=1, max_size=8))
@pytest.mark.slow
def test_bpe_merge_count_matches_ltr_simulation(spark_prop, tmp_path_factory, texts):
    import os

    from tigate_spark.catalog import get_catalog

    # materialize the corpus as a documents table the entry can load
    work = tmp_path_factory.mktemp("bpe")
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(os.path.join(str(work), "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in get_catalog()["bpe_merge_apply"].builder(
            spark_prop, str(work)).collect()
    }
    # model: global argmax pair with (count desc, w1, w2) tie-break
    counts: dict[tuple, int] = {}
    toks = {i: [t for t in txt.lower().split(" ") if t]
            for i, txt in enumerate(texts)}
    for ts in toks.values():
        for i in range(len(ts) - 1):
            counts[(ts[i], ts[i + 1])] = counts.get((ts[i], ts[i + 1]), 0) + 1
    if not counts:
        for i, ts in toks.items():
            assert out[i]["n_merges"] == 0
            assert out[i]["merged_pair"] is None
        return
    (w1, w2), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    for i, ts in toks.items():
        exp = _ltr_merges(ts, w1, w2)
        assert out[i]["n_merges"] == exp, (i, ts, (w1, w2), out[i])
        assert out[i]["n_tokens_after"] == len(ts) - exp
        assert out[i]["merged_pair"] == f"{w1} {w2}"


def test_jaccard_accepts_int_doc_ids(spark_prop):
    """ADVICE r06: the membership-marker struct hard-codes bigint doc
    ids; an int (32-bit) doc_id column must be normalized, not fail the
    concat type check at analysis time."""
    from tigate_spark.functions import dedup as dd

    texts = ["the quick brown fox jumps over the lazy dog today",
             "the quick brown fox jumps over the lazy dog today",
             "completely different words fill this other document body"]
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = dd.ngram_jaccard_pairs(df, df_cap=None).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(0, 1)}
    assert rows[0]["jaccard_bp"] == 10000


def _bpe_train_model(texts, rounds):
    """Direct K-round BPE trainer: argmax pair (count desc, lexicographic
    tie-break), LTR non-overlap rewrite, merged symbol = 'w1 w2'."""
    toks = [[t for t in txt.lower().split(" ") if t] for txt in texts]
    out = []
    for r in range(rounds):
        counts: dict[tuple, int] = {}
        for ts in toks:
            for a, b in zip(ts, ts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (w1, w2), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        nxt, total = [], 0
        for ts in toks:
            nt, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == w1 and ts[i + 1] == w2:
                    nt.append(w1 + " " + w2)
                    i += 2
                else:
                    nt.append(ts[i])
                    i += 1
            nxt.append(nt)
            total += len(nt)
        toks = nxt
        out.append((r + 1, w1, w2, c, total))
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c"]), min_size=0,
                         max_size=14).map(" ".join),
                min_size=1, max_size=6))
@pytest.mark.slow
def test_bpe_trainer_matches_direct_simulation(spark_prop, tmp_path_factory,
                                               texts):
    import os

    from tigate_spark.catalog_llm import _BPE_ROUNDS, bpe_train_merges

    work = tmp_path_factory.mktemp("bpetrain")
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(
        os.path.join(str(work), "documents.parquet"))
    got = [
        (r["merge_rank"], r["w1"], r["w2"], r["pair_count"],
         r["corpus_tokens_after"])
        for r in sorted(bpe_train_merges(spark_prop, str(work)).collect(),
                        key=lambda r: r["merge_rank"])
    ]
    assert got == _bpe_train_model(texts, _BPE_ROUNDS)


def test_bpe_vocab_apply_cross_checks_trainer(spark_prop, tmp_path_factory):
    """The apply entry's per-doc totals must equal the trainer's
    corpus_tokens_after at the final rank (the two entries share the
    rewrite machinery — this pins that they stay in lockstep)."""
    import os

    from tigate_spark.catalog_llm import bpe_train_merges, bpe_vocab_apply

    texts = ["a b a b c", "b c b c b c", "a a a a", "c a b"]
    work = tmp_path_factory.mktemp("bpexcheck")
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(
        os.path.join(str(work), "documents.parquet"))
    ranks = sorted(bpe_train_merges(spark_prop, str(work)).collect(),
                   key=lambda r: r["merge_rank"])
    per_doc = bpe_vocab_apply(spark_prop, str(work)).collect()
    assert ranks, "trainer found no pairs on a corpus with repeats"
    assert sum(r["n_tokens_after"] for r in per_doc) == \
        ranks[-1]["corpus_tokens_after"]
    assert all(r["n_tokens_after"] <= r["n_tokens_before"] for r in per_doc)


def test_bpe_vocab_apply_pairless_corpus_matches_oracle(spark_prop,
                                                        tmp_path_factory):
    """Early-break parity: a corpus where round 1 finds NO pair (all docs
    <= 1 token) plus a 0-token doc — the builder must drop the empty doc
    exactly like the oracle's positional rebuild does, and report the
    single-token docs unchanged."""
    import os

    import duckdb

    from tigate_spark.catalog import get_catalog

    texts = ["", "hello", "world"]
    work = tmp_path_factory.mktemp("bpepairless")
    spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(work), "documents.parquet"))
    spec = get_catalog()["bpe_vocab_apply"]
    got = sorted(map(tuple, spec.builder(spark_prop, str(work)).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{work}/documents.parquet/*.parquet'"
    )
    want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))
    con.close()
    assert got == want == [(1, 1, 1, 0), (2, 1, 1, 0)]
