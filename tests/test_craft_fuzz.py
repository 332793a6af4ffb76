"""Fuzz the DuckDB craft-oracle dialect against the independent Python
decoder — no Spark session needed, so this runs wide: random ints
(negative, zero, large), NULL images, and multi-byte unicode strings all
must survive oracle-render → byte-decode. (The Spark dialect is pinned
separately by the golden round-trip tests plus the driver hash match.)"""

from __future__ import annotations

import random

import duckdb
import pytest

from tigate_spark.functions.craft import craft_oracle_suffix
from tigate_spark.functions.craft_decoder import decode_craft

_WORDS = ["a", "Zebra", "应用", "τράπεζα", "naïve", "x" * 40, "日本語テスト", "k-9"]


def _rand_row(rng: random.Random, op: str) -> dict:
    def val():
        return rng.choice(
            [0, 1, -1, 127, 128, -128, 2**31, -(2**31), 999999999999]
        )

    new_img, old_img = op in ("I", "U"), op in ("U", "D")
    return {
        "op": op,
        "schema_name": rng.choice(_WORDS),
        "table_name": rng.choice(_WORDS),
        "commit_ts": rng.randrange(0, 2**50),
        "after_pk": val() if new_img else None,
        "after_event_type": rng.choice(_WORDS + [None]) if new_img else None,
        "after_value_cents": val() if new_img else None,
        "after_user_id": val() if new_img else None,
        "before_pk": val() if old_img else None,
        "before_event_type": rng.choice(_WORDS + [None]) if old_img else None,
        "before_value_cents": val() if old_img else None,
        "before_user_id": val() if old_img else None,
    }


@pytest.mark.parametrize("seed", range(4))
def test_oracle_rendered_craft_decodes_exactly(seed):
    rng = random.Random(seed)
    rows = [_rand_row(rng, op) for op in "IUD" for _ in range(8)]
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE craft_in (
          op VARCHAR, schema_name VARCHAR, table_name VARCHAR,
          commit_ts BIGINT,
          after_pk BIGINT, after_event_type VARCHAR,
          after_value_cents BIGINT, after_user_id BIGINT,
          before_pk BIGINT, before_event_type VARCHAR,
          before_value_cents BIGINT, before_user_id BIGINT)
    """)
    con.executemany(
        "INSERT INTO craft_in VALUES (?,?,?,?,?,?,?,?,?,?,?,?)",
        [[r[k] for k in (
            "op", "schema_name", "table_name", "commit_ts",
            "after_pk", "after_event_type", "after_value_cents",
            "after_user_id", "before_pk", "before_event_type",
            "before_value_cents", "before_user_id")] for r in rows],
    )
    out = con.execute(
        "WITH base AS (SELECT * FROM craft_in)" +
        craft_oracle_suffix().replace("craft_in", "base", 1) +
        " SELECT op, schema_name, table_name, commit_ts,"
        " after_pk, after_event_type, after_value_cents, after_user_id,"
        " before_pk, before_event_type, before_value_cents, before_user_id,"
        " message_hex FROM craft_msg"
    ).fetchall()
    assert len(out) == len(rows)
    for (*fields, hexmsg) in out:
        (op, sch, tbl, ts, apk, aet, avc, auid, bpk, bet, bvc, buid) = fields
        m = decode_craft(bytes.fromhex(hexmsg))
        assert m["ts"] == ts and m["schema"] == sch and m["table"] == tbl
        groups = {"I": {1}, "U": {1, 2}, "D": {2}}[op]
        assert set(m["groups"]) == groups
        for gty, exp in ((1, (apk, aet, avc, auid)), (2, (bpk, bet, bvc, buid))):
            if gty not in m["groups"]:
                continue
            cols = m["groups"][gty]["cols"]
            assert cols["pk"] == exp[0]
            assert cols["event_type"] == exp[1]
            assert cols["value_cents"] == exp[2]
            assert cols["user_id"] == exp[3]
