"""Execute the engine's generated MySQL SQL on a REAL SQL engine.

The sandbox has no MySQL, but SQLite (stdlib) accepts the generated
dialect (backtick quoting, REPLACE INTO, UPDATE/DELETE ... LIMIT 1 when
compiled with the limit extension): replaying the SAFE-MODE statement
stream (`encoder_mysql_sql_safe_mode` — REPLACE + update split, the
idempotent form) in commit order must converge to exactly the engine's
last-writer-wins materialization (`apply_materialize`), row for row.
This is the executable twin of the reference's MySQL apply path
(mysql_writer.go prepareDMLs -> execDML), as close as the environment
allows to a live JDBC round trip."""

from __future__ import annotations

import json
import os
import sqlite3

SF_DIR = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")


def _limit_supported(cur) -> bool:
    try:
        cur.execute("CREATE TEMP TABLE _probe(x INTEGER)")
        cur.execute("UPDATE _probe SET x = 1 LIMIT 1")
        return True
    except sqlite3.OperationalError:
        return False


def test_safe_mode_sql_replays_to_lww_state(spark):
    from pyspark.sql import functions as F

    from tigate_spark.catalog import get_catalog

    cat = get_catalog()
    enc = cat["encoder_mysql_sql_safe_mode"].builder(spark, SF_DIR)
    from tigate_spark.sources.changes import changes_stream

    keys = changes_stream(spark, SF_DIR).select(
        "seq", "commit_ts", "start_ts", "op"
    )
    # replay order = the LWW oracle's tie-break ascending: commit, start,
    # D < U < I on the ORIGINAL op, seq; piece_no orders a split U's
    # delete before its replace
    stmts = (
        enc.join(keys, "seq")
        .withColumn(
            "opr",
            F.expr("case op when 'D' then 1 when 'U' then 2 else 3 end"),
        )
        .orderBy("commit_ts", "start_ts", "opr", "seq", "piece_no")
        .select("sql", "args")
        .collect()
    )
    assert len(stmts) > 1000
    assert all(r["sql"] is not None and r["args"] is not None
               for r in stmts), "NULL statement rendered"

    con = sqlite3.connect(":memory:")
    cur = con.cursor()
    strip_limit = not _limit_supported(cur)
    made: set[tuple[str, str]] = set()
    n_exec = 0
    for r in stmts:
        sql = r["sql"]
        if strip_limit:
            sql = sql.replace(" LIMIT 1", "")
        # `schema`.`table` appears in both statement shapes
        head = sql.split("`")
        schema, table = head[1], head[3]
        if (schema, table) not in made:
            if not any(s == schema for s, _ in made):
                cur.execute(f"ATTACH ':memory:' AS `{schema}`")
            cur.execute(
                f"CREATE TABLE `{schema}`.`{table}` "
                "(pk INTEGER PRIMARY KEY, event_type TEXT, "
                "value_cents INTEGER)"
            )
            made.add((schema, table))
        cur.execute(sql, json.loads(r["args"]))   # no IntegrityError: REPLACE
        n_exec += 1
    assert n_exec == len(stmts)

    want = {
        (m["table_id"], m["pk"]): (m["event_type"], m["value_cents"])
        for m in cat["apply_materialize"].builder(spark, SF_DIR).collect()
    }
    got = {}
    for schema, table in made:
        tid = int(table.lstrip("t"))
        for pk, et, vc in cur.execute(
            f"SELECT pk, event_type, value_cents FROM `{schema}`.`{table}`"
        ):
            got[(tid, pk)] = (et, vc)
    con.close()
    assert got == want


def test_generated_column_skip_executes_on_generated_table(spark):
    """Generated-column DML skip (sql_builder.go:163-166; scenario
    generate_column/): replay the safe-mode statement stream rendered
    with extra_cols=((user_id, stored), (value_dollars, GENERATED))
    onto SQLite tables whose value_dollars is a real GENERATED ALWAYS AS
    column. The statements must never name value_dollars (SQLite — like
    MySQL 3105 — errors on an explicit value for a generated column),
    and the DOWNSTREAM-computed generated values must match the LWW
    materialization's value_cents / 100."""
    from pyspark.sql import functions as F

    from tigate_spark.catalog import get_catalog
    from tigate_spark.functions.encoders import encode_mysql_sql
    from tigate_spark.sources.changes import changes_stream

    ch = changes_stream(spark, SF_DIR).withColumn(
        "value_dollars", F.expr("cast(value_cents div 100 as bigint)"))
    enc = encode_mysql_sql(
        ch, replicating_ts=0, safe_mode_split=True,
        extra_cols=(("user_id", False), ("value_dollars", True)))
    keys = ch.select("seq", "commit_ts", "start_ts", "op")
    stmts = (
        enc.join(keys, "seq")
        .withColumn("opr", F.expr(
            "case op when 'D' then 1 when 'U' then 2 else 3 end"))
        .orderBy("commit_ts", "start_ts", "opr", "seq", "piece_no")
        .select("sql", "args")
        .collect()
    )
    assert len(stmts) > 1000
    assert all("value_dollars" not in r["sql"] for r in stmts), \
        "generated column leaked into rendered DML"

    con = sqlite3.connect(":memory:")
    cur = con.cursor()
    strip_limit = not _limit_supported(cur)
    made: set[tuple[str, str]] = set()
    for r in stmts:
        sql = r["sql"]
        if strip_limit:
            sql = sql.replace(" LIMIT 1", "")
        head = sql.split("`")
        schema, table = head[1], head[3]
        if (schema, table) not in made:
            if not any(s == schema for s, _ in made):
                cur.execute(f"ATTACH ':memory:' AS `{schema}`")
            cur.execute(
                f"CREATE TABLE `{schema}`.`{table}` "
                "(pk INTEGER PRIMARY KEY, event_type TEXT, "
                "value_cents INTEGER, user_id INTEGER, "
                "value_dollars INTEGER GENERATED ALWAYS AS "
                "(value_cents / 100) VIRTUAL)"
            )
            made.add((schema, table))
        cur.execute(sql, json.loads(r["args"]))

    cat = get_catalog()
    want = {}
    for m in cat["apply_materialize"].builder(spark, SF_DIR).collect():
        vc = m["value_cents"]
        want[(m["table_id"], m["pk"])] = (
            m["event_type"], vc, None if vc is None else vc // 100)
    got = {}
    for schema, table in made:
        tid = int(table.lstrip("t"))
        for pk, et, vc, vd in cur.execute(
            f"SELECT pk, event_type, value_cents, value_dollars "
            f"FROM `{schema}`.`{table}`"
        ):
            got[(tid, pk)] = (et, vc, vd)
    con.close()
    assert got == want


def test_args_escape_hostile_event_types(spark):
    """A quote/backslash/newline in event_type must survive the JSON arg
    vector (json_escape on the engine side, mirrored in the oracles) —
    json.loads must round-trip the original string."""
    from tigate_spark.functions.encoders import encode_mysql_sql

    hostile = 'a"b\\c\nd'
    df = spark.createDataFrame(
        [(1, "app", "t0", "I", 10, 20, 7, hostile, 5)],
        "seq long, schema_name string, table_name string, op string, "
        "start_ts long, commit_ts long, pk long, event_type string, "
        "value_cents long",
    )
    r = encode_mysql_sql(df, replicating_ts=0).first()
    assert json.loads(r["args"]) == [7, hostile, 5]
    r2 = [x for x in encode_mysql_sql(
        df, replicating_ts=0, safe_mode_split=True).collect()]
    assert json.loads(r2[0]["args"]) == [7, hostile, 5]


def test_oracle_escape_parity_hostile_event_types(spark):
    """The DuckDB oracles for encoder_mysql_sql / _safe_mode must escape
    event_type EXACTLY like the engine's json_escape — built from the
    double-escaped _json_esc_sql helper, never an inlined chain (Python
    string-escape processing mangles an inline chain into no-op replaces;
    ADVICE r7). Drives both escapes over hostile payloads and compares
    character-for-character."""
    import duckdb
    from pyspark.sql import functions as F

    from tigate_spark.catalog import _json_esc_sql, get_catalog
    from tigate_spark.functions.encoders import json_escape

    hostiles = ['a"b\\c\nd', "tab\there", "cr\rx", "\\n not a newline",
                'end with backslash\\', '"', ""]
    df = spark.createDataFrame([(h,) for h in hostiles],
                               "event_type string")
    engine = [r["e"] for r in
              df.select(json_escape(F.col("event_type")).alias("e"))
              .collect()]
    con = duckdb.connect()
    oracle = [
        con.execute(
            f"SELECT {_json_esc_sql('event_type')} FROM "
            "(SELECT ? AS event_type)", [h]
        ).fetchone()[0]
        for h in hostiles
    ]
    con.close()
    assert engine == oracle

    # and the registered oracles actually embed the helper's chain
    cat = get_catalog()
    chain = _json_esc_sql("event_type")
    assert chain in cat["encoder_mysql_sql"].oracle
    assert chain in cat["encoder_mysql_sql_safe_mode"].oracle
