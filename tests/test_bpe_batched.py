"""Batched top-M BPE trainer vs a direct Python reference model.

The reference model below is the sequential spec: per round, rank pairs
(count desc, w1, w2), walk the top-C candidates greedily keeping up to M
symbol-disjoint pairs, then rewrite every document left-to-right applying
all kept merges at once (non-overlapping within a pair; cross-pair
overlap is impossible for symbol-disjoint pairs). The Spark entry and the
DuckDB oracle must both match it token for token.
"""

from __future__ import annotations

import collections

import pytest

from tigate_spark.catalog_llm import (
    _BPE_BATCH_C,
    _BPE_BATCH_M,
    _BPE_BATCH_ROUNDS,
    _bpe_greedy_select,
    bpe_train_merges_batched,
)


def _ref_round(docs, c, m):
    """One batched round over {doc_id: [tokens]}; returns (sel, new_docs)
    where sel = [(w1, w2, count)] in selection order."""
    counts = collections.Counter()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:c]
    sel, syms = [], set()
    for (w1, w2), n in ranked:
        if w1 in syms or w2 in syms:
            continue
        sel.append((w1, w2, n))
        syms.update((w1, w2))
        if len(sel) >= m:
            break
    pairs = {(w1, w2) for w1, w2, _ in sel}
    new_docs = {}
    for d, toks in docs.items():
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) in pairs:
                out.append(toks[i] + " " + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        new_docs[d] = out
    return sel, new_docs


def _ref_train(texts, rounds, c, m):
    docs = {
        i: [t for t in txt.lower().split(" ") if t]
        for i, txt in enumerate(texts)
    }
    rows = []
    for r in range(rounds):
        sel, docs = _ref_round(docs, c, m)
        if not sel:
            break
        n_after = sum(len(t) for t in docs.values())
        for seq, (w1, w2, n) in enumerate(sel, start=1):
            rows.append((r + 1, seq, w1, w2, n, n_after))
    return rows


CORPUS = [
    # run of a repeated symbol: (x, x) islands must merge LTR non-overlap
    "x x x x x b c b c",
    # the top pair ('b','c') conflicts with ('c','b'); greedy must skip
    "b c b c a a q r q r",
    "a a a b c q r s t u",
    "s t s t s t u u",
    "lone",
    "",
]


@pytest.mark.parametrize("m", [1, 3])
@pytest.mark.slow
def test_batched_trainer_matches_reference_model(spark, tmp_path, m,
                                                 monkeypatch):
    import tigate_spark.catalog_llm as cl

    monkeypatch.setattr(cl, "_BPE_BATCH_M", m)
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(CORPUS)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    got = sorted(
        tuple(r) for r in bpe_train_merges_batched(spark, d).collect()
    )
    want = sorted(_ref_train(CORPUS, _BPE_BATCH_ROUNDS, _BPE_BATCH_C, m))
    assert got == want
    assert len(got) > 0


def test_greedy_select_skips_shared_symbols():
    cands = [
        {"w1": "a", "w2": "b", "cnt": 9},
        {"w1": "b", "w2": "c", "cnt": 8},  # shares b -> skipped
        {"w1": "c", "w2": "a", "cnt": 7},  # shares a -> skipped
        {"w1": "d", "w2": "d", "cnt": 6},  # self-pair is fine
        {"w1": "e", "w2": "f", "cnt": 5},
    ]
    sel = _bpe_greedy_select(cands, 3)
    assert [(s["w1"], s["w2"]) for s in sel] == [
        ("a", "b"), ("d", "d"), ("e", "f")
    ]
    assert len(_bpe_greedy_select(cands, 1)) == 1


@pytest.mark.slow
def test_batched_round_trip_count_is_consistent(spark, sf_dir):
    """On real testdata: selection ranks are valid, counts decrease
    within a round, and corpus size shrinks by exactly the applied-merge
    count bound (each merge start removes one token)."""
    rows = bpe_train_merges_batched(spark, sf_dir).collect()
    assert rows, "expected at least one merge on testdata"
    by_round = collections.defaultdict(list)
    for r in rows:
        by_round[r["merge_round"]].append(r)
    sizes = {}
    for rnd, rs in by_round.items():
        seqs = sorted(r["merge_seq"] for r in rs)
        assert seqs == list(range(1, len(rs) + 1))
        cnts = [r["pair_count"] for r in sorted(rs, key=lambda x: x["merge_seq"])]
        assert cnts == sorted(cnts, reverse=True)
        sizes[rnd] = rs[0]["corpus_tokens_after"]
        # symbol-disjoint within a round: no symbol of one selected pair
        # appears in a DIFFERENT selected pair (self-pairs (x,x) allowed)
        pair_syms = [{r["w1"], r["w2"]} for r in rs]
        for i, a in enumerate(pair_syms):
            for b in pair_syms[i + 1:]:
                assert not (a & b)
    rounds = sorted(sizes)
    for a, b in zip(rounds, rounds[1:]):
        assert sizes[b] < sizes[a]
