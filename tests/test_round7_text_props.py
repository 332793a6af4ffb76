"""Property tests for the round-7 text/curation operators against direct
Python models (the test-strategy pattern of SURVEY §5: every nontrivial
operator gets an oracle AND an independent model check)."""

from __future__ import annotations

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.sampled_from(
    ["the", "a", "of", "data", "spark", "table", "scan", "x1", "zz"])
doc = st.lists(word, min_size=1, max_size=80).map(" ".join)


def _corpus_dir(spark, tmp_path_factory, texts, name):
    work = tmp_path_factory.mktemp(name)
    df = spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(
        os.path.join(str(work), "documents.parquet"))
    return str(work)


def _gopher_model(texts):
    stop = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}
    out = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split(" ") if w]
        n = len(toks)
        mean_milli = sum(len(w) for w in toks) * 1000 // max(n, 1)
        alpha_bp = sum(1 for w in toks if any(c.isalpha() and c.islower()
                                              for c in w)) * 10000 // max(n, 1)
        nstop = len(set(toks) & stop)
        f1 = 50 <= n <= 100000
        f2 = 3000 <= mean_milli <= 10000
        f3 = alpha_bp >= 8000
        f4 = nstop >= 2
        out[i] = (n, mean_milli, alpha_bp, nstop,
                  int(f1), int(f2), int(f3), int(f4),
                  int(f1 and f2 and f3 and f4))
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
@given(st.lists(doc, min_size=1, max_size=8))
def test_gopher_flags_match_model(spark_prop, tmp_path_factory, texts):
    from tigate_spark.catalog_llm import text_gopher_quality_flags

    d = _corpus_dir(spark_prop, tmp_path_factory, texts, "gopher")
    got = {
        r["doc_id"]: (r["n_words"], r["mean_word_len_milli"],
                      r["alpha_frac_bp"], r["n_stop_distinct"],
                      r["f_word_count"], r["f_mean_word_len"],
                      r["f_alpha_words"], r["f_stopwords"], r["keep"])
        for r in text_gopher_quality_flags(spark_prop, d).collect()
    }
    assert got == _gopher_model(texts)


def _paragraph_model(texts):
    pars = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split(" ") if w]
        ps = [" ".join(toks[j:j + 32]) for j in range(0, len(toks), 32)]
        pars[i] = ps
    docs_of = {}
    for i, ps in pars.items():
        for p in set(ps):
            docs_of.setdefault(p, set()).add(i)
    out = {}
    for i, ps in pars.items():
        nd = sum(1 for p in ps if len(docs_of[p]) >= 2)
        frac = nd * 10000 // len(ps)
        out[i] = (len(ps), nd, frac, int(frac <= 3000))
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
@given(st.lists(doc, min_size=2, max_size=8))
def test_paragraph_fraction_matches_model(spark_prop, tmp_path_factory,
                                          texts):
    # plant a guaranteed cross-doc duplicate paragraph
    texts = list(texts) + [texts[0], texts[0]]
    from tigate_spark.catalog_llm import dedup_paragraph_fraction

    d = _corpus_dir(spark_prop, tmp_path_factory, texts, "par")
    got = {
        r["doc_id"]: (r["n_paragraphs"], r["n_dup_paragraphs"],
                      r["dup_frac_bp"], r["keep"])
        for r in dedup_paragraph_fraction(spark_prop, d).collect()
    }
    assert got == _paragraph_model(texts)


# --- r08: C4 duplicate-span excision vs direct model ---------------------

def _c4_model(texts, unit=8, win=3):
    """Direct Python spec of dedup_c4_span_excise: fixed-unit segmentation,
    overlapping win-unit spans, global keep-first by (doc_id, position),
    covered-unit excision with distinct-per-doc accounting."""
    import collections

    docs = {i: [w for w in t.lower().split(" ") if w]
            for i, t in enumerate(texts)}
    docs = {i: t for i, t in docs.items() if t}
    spans = []
    for i in sorted(docs):
        toks = docs[i]
        nu = (len(toks) - 1) // unit + 1
        for j in range(1, nu - win + 2):
            key = " ".join(toks[(j - 1) * unit:(j - 1) * unit + unit * win])
            spans.append((i, j, key))
    cnt = collections.Counter(k for _, _, k in spans)
    first = {}
    for i, j, k in sorted(spans):
        first.setdefault(k, (i, j))
    removed = [(i, j) for i, j, k in spans
               if cnt[k] > 1 and first[k] != (i, j)]
    rm_units = collections.defaultdict(set)
    for i, j in removed:
        rm_units[i].update(range(j, j + win))
    out = {}
    for i, toks in docs.items():
        nu = (len(toks) - 1) // unit + 1
        n_rm = sum(1 for a, _ in removed if a == i)
        n_ru = len(rm_units.get(i, ()))
        out[i] = (nu, max(nu - (win - 1), 0), n_rm, n_ru, nu - n_ru)
    return out


#: docs assembled from a small pool of 8-word blocks so 24-token spans
#: genuinely repeat within and across documents
_block = st.lists(word, min_size=8, max_size=8)


@st.composite
def _blocky_corpus(draw):
    pool = draw(st.lists(_block, min_size=2, max_size=4))
    n_docs = draw(st.integers(min_value=1, max_value=6))
    texts = []
    for _ in range(n_docs):
        picks = draw(st.lists(
            st.integers(min_value=0, max_value=len(pool) - 1),
            min_size=1, max_size=6))
        texts.append(" ".join(w for p in picks for w in pool[p]))
    return texts


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
@given(_blocky_corpus())
def test_c4_span_excise_matches_model(spark_prop, tmp_path_factory, texts):
    from tigate_spark.catalog_llm import dedup_c4_span_excise

    d = _corpus_dir(spark_prop, tmp_path_factory, texts, "c4span")
    got = {
        r["doc_id"]: (r["n_units"], r["n_spans"], r["n_removed_spans"],
                      r["n_removed_units"], r["n_kept_units"])
        for r in dedup_c4_span_excise(spark_prop, d).collect()
    }
    assert got == _c4_model(texts)
