"""sample_mixture_epochs: the waterfill cap path on a skewed synthetic
corpus (sf0.01's sources are too uniform to trigger the 4-epoch cap, so
the generic parity gate never exercises it), verified against both a
hand computation and the DuckDB oracle on the same data."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("skewcorpus")
    rows = []
    # 'big': 10 docs x 100 tokens; 'tiny': 1 doc x 10 tokens
    for i in range(10):
        rows.append((i, " ".join(f"w{j}" for j in range(100)), "en", "big", 0))
    rows.append((99, " ".join(f"t{j}" for j in range(10)), "en", "tiny", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_waterfill_cap_and_redistribution(spark, skew_dir):
    from tigate_spark.catalog_llm import sample_mixture_epochs

    got = {r["source"]: r for r in sample_mixture_epochs(spark, skew_dir).collect()}
    # budget = 2*(1000+10) = 2020, n_src = 2, base_target = 1010
    # tiny: cap = 40 < 1010 -> capped at 40; surplus = 970
    # big:  base 1010 + 970*1000//1000 = 1980 (cap 4000 not binding)
    assert got["tiny"]["planned_tokens"] == 40
    assert got["tiny"]["epochs_milli"] == 4000          # exactly the cap
    assert got["big"]["planned_tokens"] == 1980
    assert got["big"]["epochs_milli"] == 1980
    tot = 40 + 1980
    assert got["tiny"]["share_bp"] == 40 * 10000 // tot
    assert got["big"]["share_bp"] == 1980 * 10000 // tot


def test_waterfill_matches_oracle_on_skew(spark, skew_dir):
    from tigate_spark.catalog import get_catalog

    spec = get_catalog()["sample_mixture_epochs"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{skew_dir}/documents.parquet/*.parquet'"
    )
    orows = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    ocols = [d[0] for d in con.description]
    for r in spec.builder(spark, skew_dir).collect():
        o = orows[r["source"]]
        for i, c in enumerate(ocols):
            assert r[c] == o[i], (r["source"], c, r[c], o[i])
    con.close()
