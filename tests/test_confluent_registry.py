"""FileSchemaRegistry semantics + registry-resolved decode round trip.

The registry must reproduce the Confluent server behaviors the reference
client relies on (confluent_schema_registry.go): global content-dedup'd
ids, per-subject versions, idempotent re-registration, id lookup — and
survive concurrent registrations from separate processes (fcntl lock).
"""

from __future__ import annotations

import json
import multiprocessing
import os

import pytest

from tigate_spark.functions.confluent_registry import (
    EVENTS_KEY_SCHEMA,
    EVENTS_VALUE_V1,
    EVENTS_VALUE_V2,
    EXPECTED_KEY_ID,
    EXPECTED_V1_ID,
    EXPECTED_V2_ID,
    FileSchemaRegistry,
    canonical_schema,
)


@pytest.fixture()
def reg(tmp_path):
    return FileSchemaRegistry(str(tmp_path / "registry.json"))


def test_fresh_allocation_order(reg):
    assert reg.register("events-key", EVENTS_KEY_SCHEMA) == EXPECTED_KEY_ID
    assert reg.register("events-value", EVENTS_VALUE_V1) == EXPECTED_V1_ID
    assert reg.register("events-value", EVENTS_VALUE_V2) == EXPECTED_V2_ID


def test_idempotent_reregistration(reg):
    a = reg.register("s", EVENTS_VALUE_V1)
    b = reg.register("s", EVENTS_VALUE_V1)
    assert a == b
    assert reg.versions("s") == [1]
    # whitespace / key order must not mint a new id (content canonical)
    shuffled = json.dumps(json.loads(EVENTS_VALUE_V1), indent=2)
    assert reg.register("s", shuffled) == a


def test_cross_subject_content_dedup(reg):
    a = reg.register("t1-value", EVENTS_VALUE_V1)
    b = reg.register("t2-value", EVENTS_VALUE_V1)
    assert a == b, "Confluent allocates ids per unique schema, not subject"
    assert reg.versions("t1-value") == [1]
    assert reg.versions("t2-value") == [1]


def test_subject_versions_and_latest(reg):
    reg.register("ev", EVENTS_VALUE_V1)
    vid2 = reg.register("ev", EVENTS_VALUE_V2)
    assert reg.versions("ev") == [1, 2]
    latest = reg.latest("ev")
    assert latest["version"] == 2
    assert latest["schema_id"] == vid2
    assert "props" in latest["schema"]
    assert reg.get_by_id(vid2) == canonical_schema(EVENTS_VALUE_V2)
    with pytest.raises(KeyError):
        reg.get_by_id(999)
    with pytest.raises(KeyError):
        reg.latest("nope")


def _register_batch(args):
    path, proc = args
    reg = FileSchemaRegistry(path)
    out = []
    for k in range(5):
        schema = json.dumps({"type": "record", "name": f"r{proc}_{k}",
                             "fields": []})
        out.append(reg.register(f"sub{proc}", schema))
    return out


def test_concurrent_process_allocation(tmp_path):
    """4 processes x 5 distinct schemas: every id unique, 1..20 with no
    gaps — the fcntl read-modify-write serializes allocation."""
    path = str(tmp_path / "registry.json")
    with multiprocessing.Pool(4) as pool:
        got = pool.map(_register_batch, [(path, p) for p in range(4)])
    ids = sorted(i for batch in got for i in batch)
    assert ids == list(range(1, 21))


@pytest.mark.slow
def test_registry_resolved_decode_round_trip(spark, sf_dir, tmp_path):
    """Consumer side: resolve each framed message's schema id against the
    registry and parse v1 vs v2 accordingly (v2 = trailing union-string
    props). Proves the per-row id actually selects the right body.

    The catalog entry's registry is run-scoped and deleted with the
    builder (a review hardening — no predictable shared /tmp path), so
    the consumer here replays the SAME registrations against a fresh
    twin registry: Confluent id allocation is deterministic for a given
    registration order, which is exactly the property the entry's
    oracle templates (ids 1/2/3)."""
    from tigate_spark.catalog import get_catalog
    from tigate_spark.functions.avro_wire import (
        avro_long,
        avro_string,
        decode_avro_value,
    )
    from tigate_spark.functions.confluent_registry import (
        EVENTS_KEY_SCHEMA,
        EVENTS_VALUE_V1,
        EVENTS_VALUE_V2,
    )

    df = get_catalog()["encoder_avro_registry_evolution"].builder(
        spark, sf_dir
    )
    live = df.filter("value_hex is not null")
    rows = (live.orderBy("schema_id", "seq").limit(100).collect()
            + live.orderBy(live.schema_id.desc(), "seq").limit(100).collect())
    assert rows
    reg = FileSchemaRegistry(str(tmp_path / "registry-twin.json"))
    reg.register("events-key", EVENTS_KEY_SCHEMA)
    reg.register("events-value", EVENTS_VALUE_V1)
    reg.register("events-value", EVENTS_VALUE_V2)
    seen = set()
    for r in rows:
        raw = bytes.fromhex(r["value_hex"])
        sid = int.from_bytes(raw[1:5], "big")
        assert sid == r["schema_id"]
        schema = json.loads(reg.get_by_id(sid))
        has_props = any(f["name"] == "props" for f in schema["fields"])
        seen.add(has_props)
        if not has_props:
            decode_avro_value(raw)  # v1 parser must consume exactly
        else:
            body = raw[5:]
            # v1 prefix: pk, 3 unions, op, commit_ts, phys — then props
            i = 0
            pk, i = avro_long(body, i)
            for _ in range(3):
                br, i = avro_long(body, i)
                assert br == 1
                val, i = (avro_string(body, i) if _ == 0
                          else avro_long(body, i))
            _, i = avro_string(body, i)   # op
            _, i = avro_long(body, i)     # commit_ts
            _, i = avro_long(body, i)     # phys
            br, i = avro_long(body, i)    # props union branch
            if br == 1:
                _, i = avro_string(body, i)
            else:
                assert br == 0
            assert i == len(body), "v2 body must consume exactly"
    assert seen == {True, False}, "expected both schema versions in window"


# --- r9: concurrent multi-feed registration race -------------------------

def _race_worker(args):
    """One 'changefeed driver' process registering an evolving schema
    sequence against the SHARED registry file — its own subject plus a
    contended shared subject."""
    import json as _json

    from tigate_spark.functions.confluent_registry import FileSchemaRegistry

    path, feed, n_schemas = args
    reg = FileSchemaRegistry(path)
    ids = {}
    for k in range(n_schemas):
        schema = _json.dumps({
            "type": "record", "name": f"race_{k}",
            "fields": [{"name": f"f{j}", "type": "long"}
                       for j in range(k + 1)],
        })
        a = reg.register(f"feed{feed}-value", schema)
        b = reg.register("shared-value", schema)
        # re-register must be idempotent even mid-race
        assert reg.register(f"feed{feed}-value", schema) == a
        assert a == b, "same content must get ONE global id"
        ids[k] = a
    return ids


def test_concurrent_feeds_share_one_registry(tmp_path):
    """The fcntl-lock claim, tested ACROSS PROCESSES: four concurrent
    changefeed drivers registering the same evolving schema family
    against ONE registry file must allocate collision-free contiguous
    ids, agree on every content→id mapping, and keep per-subject
    version lists dense — and the framed wire bytes each feed would
    emit (magic 0 + big-endian id) must resolve back to the right
    schema content."""
    import json as _json
    import multiprocessing as mp

    from tigate_spark.functions.confluent_registry import FileSchemaRegistry

    path = str(tmp_path / "registry.json")
    n_feeds, n_schemas = 4, 8
    ctx = mp.get_context("fork")
    with ctx.Pool(n_feeds) as pool:
        results = pool.map(
            _race_worker, [(path, f, n_schemas) for f in range(n_feeds)])

    # every feed agrees on the content→id map
    for r in results[1:]:
        assert r == results[0]
    # ids are exactly 1..n_schemas: no collisions, no gaps, no doubles
    assert sorted(results[0].values()) == list(range(1, n_schemas + 1))

    reg = FileSchemaRegistry(path)
    # per-subject versions stayed dense under contention
    assert reg.versions("shared-value") == list(range(1, n_schemas + 1))
    for f in range(n_feeds):
        assert reg.versions(f"feed{f}-value") == \
            list(range(1, n_schemas + 1))
    # framed-byte correctness: the id each feed would frame resolves to
    # the exact registered content
    for k, sid in results[0].items():
        frame = b"\x00" + sid.to_bytes(4, "big")
        assert int.from_bytes(frame[1:5], "big") == sid
        schema = _json.loads(reg.get_by_id(sid))
        assert len(schema["fields"]) == k + 1


# ---------------------------------------------------------------------------
# HTTP transport: the reference client's actual REST round trip
# (confluent_schema_registry.go:141-154, 219-228, 356-364) over a real
# localhost ThreadingHTTPServer backed by the same file allocator.
# ---------------------------------------------------------------------------


@pytest.fixture()
def http_reg(tmp_path):
    from tigate_spark.functions.registry_http import (
        HTTPSchemaRegistry,
        RegistryHTTPServer,
    )

    with RegistryHTTPServer(str(tmp_path / "registry.json")) as srv:
        yield HTTPSchemaRegistry(srv.base_url)


def test_http_allocation_matches_file_semantics(http_reg):
    """The HTTP round trip allocates exactly what the file client would:
    fresh-order ids, idempotent re-register, cross-subject dedup."""
    assert http_reg.register("events-key", EVENTS_KEY_SCHEMA) == EXPECTED_KEY_ID
    assert http_reg.register("events-value", EVENTS_VALUE_V1) == EXPECTED_V1_ID
    assert http_reg.register("events-value", EVENTS_VALUE_V2) == EXPECTED_V2_ID
    # idempotent POST: same id, version list unchanged
    assert http_reg.register("events-value", EVENTS_VALUE_V1) == EXPECTED_V1_ID
    assert http_reg.versions("events-value") == [1, 2]
    # content dedup across subjects: same schema, same global id
    assert http_reg.register("other-value", EVENTS_VALUE_V1) == EXPECTED_V1_ID
    assert http_reg.subjects() == ["events-key", "events-value", "other-value"]


def test_http_lookup_and_errors(http_reg):
    sid = http_reg.register("s", EVENTS_VALUE_V1)
    assert http_reg.get_by_id(sid) == canonical_schema(EVENTS_VALUE_V1)
    latest = http_reg.latest("s")
    assert latest["schema_id"] == sid and latest["version"] == 1
    # Confluent error mapping: 40403 unknown id, 40401 unknown subject
    with pytest.raises(KeyError):
        http_reg.get_by_id(999)
    with pytest.raises(KeyError):
        http_reg.latest("nope")
    with pytest.raises(KeyError):
        http_reg.versions("nope")


def test_http_delete_subject_keeps_global_ids(http_reg):
    sid = http_reg.register("s", EVENTS_VALUE_V1)
    http_reg.register("s", EVENTS_VALUE_V2)
    assert http_reg.delete_subject("s") == [1, 2]
    assert "s" not in http_reg.subjects()
    with pytest.raises(KeyError):
        http_reg.delete_subject("s")
    # ids are global + content-addressed: re-register returns the SAME id
    assert http_reg.register("s", EVENTS_VALUE_V1) == sid
    assert http_reg.versions("s") == [1]


def test_http_concurrent_registrations(tmp_path):
    """N threads hammer the server with a mix of identical and distinct
    schemas: identical content converges on one id, distinct content gets
    distinct ids, no id is double-allocated (the fcntl-serialized store
    behind the threading server)."""
    import threading

    from tigate_spark.functions.registry_http import (
        HTTPSchemaRegistry,
        RegistryHTTPServer,
    )

    with RegistryHTTPServer(str(tmp_path / "registry.json")) as srv:
        results: dict[int, list[int]] = {}

        def worker(k: int) -> None:
            cli = HTTPSchemaRegistry(srv.base_url)
            ids = []
            for i in range(6):
                schema = json.dumps({
                    "type": "record", "name": f"r{i % 3}",
                    "fields": [{"name": "x", "type": "long"}],
                })
                ids.append(cli.register(f"subj-{k % 2}", schema))
            results[k] = ids

        threads = [threading.Thread(target=worker, args=(k,))
                   for k in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # 3 distinct schema contents overall -> exactly ids {1, 2, 3}
        seen = {i for ids in results.values() for i in ids}
        assert seen == {1, 2, 3}
        # same content -> same id in EVERY thread (i%3 cycle repeats)
        for ids in results.values():
            assert ids[:3] == ids[3:]
        cli = HTTPSchemaRegistry(srv.base_url)
        assert cli.versions("subj-0") == [1, 2, 3]
        assert cli.versions("subj-1") == [1, 2, 3]


def test_http_framing_parity_with_file_path(tmp_path):
    """Confluent wire framing built from HTTP-returned ids is byte-equal
    to framing built from the file client's ids — the transport changes
    nothing about the bytes on the wire."""
    from tigate_spark.functions.registry_http import (
        HTTPSchemaRegistry,
        RegistryHTTPServer,
    )

    file_reg = FileSchemaRegistry(str(tmp_path / "file.json"))
    with RegistryHTTPServer(str(tmp_path / "http.json")) as srv:
        http_reg = HTTPSchemaRegistry(srv.base_url)
        frames = {}
        for name, reg in (("file", file_reg), ("http", http_reg)):
            kid = reg.register("events-key", EVENTS_KEY_SCHEMA)
            vid = reg.register("events-value", EVENTS_VALUE_V1)
            # the 5-byte Confluent frame: magic 0x00 + big-endian id
            frames[name] = (
                b"\x00" + kid.to_bytes(4, "big"),
                b"\x00" + vid.to_bytes(4, "big"),
            )
        assert frames["file"] == frames["http"]


def test_versions_unknown_subject_parity(reg, http_reg):
    """Both clients answer an unknown subject the Confluent way (40401
    -> KeyError) — drop-in parity, no []-vs-raise divergence."""
    with pytest.raises(KeyError):
        reg.versions("nope")
    with pytest.raises(KeyError):
        http_reg.versions("nope")


def test_http_server_answers_malformed_requests(http_reg):
    """Malformed requests get JSON error responses, never a dead handler
    thread that burns the client's retries: non-numeric schema id maps
    to the 40403 class, a body without 'schema' to a 400."""
    with pytest.raises(KeyError):
        http_reg._call("GET", "/schemas/ids/not-a-number")
    with pytest.raises(KeyError):
        http_reg._call("POST", "/subjects/s/versions", {"nope": 1})
    # and the server is still alive afterwards
    sid = http_reg.register("s", EVENTS_VALUE_V1)
    assert http_reg.get_by_id(sid) == canonical_schema(EVENTS_VALUE_V1)
