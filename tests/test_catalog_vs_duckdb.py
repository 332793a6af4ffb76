"""Generic parity gate: catalog queries vs their DuckDB oracles.

Mirrors the driver's CORRECTNESS check — row count, schema width, and an
order-insensitive value comparison — so a green run here predicts a green
driver run at sf0.01.

This pytest twin SAMPLES the catalog (default 40 entries, deterministic
md5 ranking — same picks every run) to bound suite growth: the
authoritative full sweep is ``tools/drive_driver.py`` (dtype-strict,
the close gate), and duplicating all ~300 entries here doubled the
slow-path wall for no added coverage (VERDICT r15 task #6). Controls:
``TIGATE_FULL_CATALOG_SWEEP=1`` runs everything;
``TIGATE_CATALOG_SAMPLE=N`` resizes; ``TIGATE_SAMPLE_SALT=x`` rotates
the deterministic pick.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tigate_spark.catalog import get_catalog
from tigate_spark.sources.batch import TABLES

#: heavy streaming/e2e tail — excluded from the fast path
#: (`pytest -m "not slow"`); the close gate runs everything
pytestmark = pytest.mark.slow

CATALOG = get_catalog()
SF_DIR = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sampled_names() -> list[str]:
    names = sorted(CATALOG.keys())
    if os.environ.get("TIGATE_FULL_CATALOG_SWEEP") == "1":
        return names
    n = int(os.environ.get("TIGATE_CATALOG_SAMPLE", "40"))
    if n >= len(names):
        return names
    import hashlib

    salt = os.environ.get("TIGATE_SAMPLE_SALT", "")
    ranked = sorted(
        names,
        key=lambda x: hashlib.md5((salt + x).encode()).hexdigest())
    return sorted(ranked[:n])


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        # typed prefix: a float column must be float on BOTH engines —
        # int-vs-float drift fails even when values are numerically equal
        # (the external driver's hash is dtype-sensitive; note DuckDB
        # HUGEINT arrives as Python int through fetchall, so the windowed-
        # sum drift class is only visible to tools/drive_driver.py's
        # pandas-dtype gate — run that too)
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    try:
        import datetime
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    except Exception:
        pass
    return str(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_norm(row[i]) for i in order))
    out.sort()
    return out


@pytest.mark.parametrize("name", _sampled_names())
def test_query_matches_oracle(spark, name, ddb):
    spec = CATALOG[name]
    sdf = spec.builder(spark, SF_DIR)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    ores = ddb.execute(spec.oracle)
    orows = ores.fetchall()
    ocols = [d[0].lower() for d in ores.description]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ: {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    sc = _canon([tuple(r) for r in srows], scols)
    oc = _canon(orows, ocols)
    mism = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b][:5]
    assert sc == oc, (
        f"{name}: value mismatch at sorted idx {mism}; "
        f"spark={[sc[i] for i in mism]} oracle={[oc[i] for i in mism]}"
    )
