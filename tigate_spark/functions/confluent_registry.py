"""File-backed Confluent schema-registry client (REST semantics, no HTTP).

Reference: ``pkg/sink/codec/avro/confluent_schema_registry.go`` — the
REST client POSTs ``/subjects/<subject>/versions`` and gets ``{"id": N}``
back, GETs ``/schemas/ids/<id>``, and ``GetCachedOrRegister`` caches
(subject, schema-hash) → id. The sandbox has no network, so the
*server's* allocation semantics live behind the same client API over a
local JSON file:

- **global schema ids**: schemas are canonicalized (JSON key-sorted) and
  deduplicated ACROSS subjects — registering an identical schema under
  any subject returns the existing id (Confluent allocates ids per
  unique schema, not per subject);
- **per-subject versions**: a subject's version list grows 1, 2, …
  each time a schema new to that subject is registered under it;
  re-registering a schema the subject already has is idempotent (same
  id, same version, no state change);
- **lookup**: by global id, and latest-version by subject.

Every mutation is an fcntl-locked read-modify-write, so concurrent
driver processes (multiple changefeeds sharing one registry file)
allocate ids without collisions — the moral equivalent of the registry
server serializing POSTs.
"""

from __future__ import annotations

import fcntl
import json
import os


def canonical_schema(schema: str) -> str:
    """Key-sorted minimal JSON — the content identity ids are allocated
    by (Confluent semantically dedups on the parsed schema, not the
    submitted text)."""
    return json.dumps(json.loads(schema), sort_keys=True,
                      separators=(",", ":"))


class FileSchemaRegistry:
    """Confluent-semantics schema registry over one local JSON file."""

    def __init__(self, path: str):
        self.path = path

    # -- internal ----------------------------------------------------------
    @staticmethod
    def _read(f) -> dict:
        f.seek(0)
        raw = f.read()
        if not raw.strip():
            return {"schemas": {}, "subjects": {}}
        return json.loads(raw)

    def _locked(self):
        f = open(self.path, "a+")
        fcntl.lockf(f, fcntl.LOCK_EX)
        return f

    # -- REST-equivalent surface ------------------------------------------
    def register(self, subject: str, schema: str) -> int:
        """POST /subjects/<subject>/versions → global schema id."""
        can = canonical_schema(schema)
        f = self._locked()
        try:
            state = self._read(f)
            by_content = {v: int(k) for k, v in state["schemas"].items()}
            sid = by_content.get(can)
            if sid is None:
                sid = max((int(k) for k in state["schemas"]), default=0) + 1
                state["schemas"][str(sid)] = can
            versions = state["subjects"].setdefault(subject, [])
            if not any(v["id"] == sid for v in versions):
                versions.append({"version": len(versions) + 1, "id": sid})
            f.seek(0)
            f.truncate()
            json.dump(state, f)
            f.flush()
            return sid
        finally:
            fcntl.lockf(f, fcntl.LOCK_UN)
            f.close()

    def get_by_id(self, schema_id: int) -> str:
        """GET /schemas/ids/<id> → canonical schema text."""
        f = self._locked()
        try:
            state = self._read(f)
        finally:
            fcntl.lockf(f, fcntl.LOCK_UN)
            f.close()
        try:
            return state["schemas"][str(schema_id)]
        except KeyError:
            raise KeyError(f"schema id {schema_id} not registered")

    def latest(self, subject: str) -> dict:
        """GET /subjects/<subject>/versions/latest."""
        f = self._locked()
        try:
            state = self._read(f)
        finally:
            fcntl.lockf(f, fcntl.LOCK_UN)
            f.close()
        versions = state["subjects"].get(subject)
        if not versions:
            raise KeyError(f"subject {subject} not registered")
        v = versions[-1]
        return {
            "subject": subject,
            "version": v["version"],
            "schema_id": v["id"],
            "schema": state["schemas"][str(v["id"])],
        }

    def versions(self, subject: str) -> list[int]:
        """GET /subjects/<subject>/versions. Unknown subject raises
        KeyError — Confluent answers 40401, and the HTTP client surfaces
        that as KeyError, so both clients agree (drop-in parity)."""
        f = self._locked()
        try:
            state = self._read(f)
        finally:
            fcntl.lockf(f, fcntl.LOCK_UN)
            f.close()
        if subject not in state["subjects"]:
            raise KeyError(f"subject {subject} not registered")
        return [v["version"] for v in state["subjects"][subject]]

    def subjects(self) -> list[str]:
        f = self._locked()
        try:
            state = self._read(f)
        finally:
            fcntl.lockf(f, fcntl.LOCK_UN)
            f.close()
        return sorted(state["subjects"])

    def delete_subject(self, subject: str) -> list[int]:
        """DELETE /subjects/<subject> → the deleted version numbers.

        Drops the subject's version list; schema ids stay allocated
        (Confluent keeps ids global and content-addressed, so a
        re-register of the same content after a delete returns the SAME
        id — the reference relies on this when tests recycle subjects,
        ``confluent_schema_registry.go:356-364``)."""
        f = self._locked()
        try:
            state = self._read(f)
            versions = state["subjects"].pop(subject, None)
            if versions is None:
                raise KeyError(f"subject {subject} not registered")
            f.seek(0)
            f.truncate()
            json.dump(state, f)
            f.flush()
            return [v["version"] for v in versions]
        finally:
            fcntl.lockf(f, fcntl.LOCK_UN)
            f.close()


# ---------------------------------------------------------------------------
# The events-table Avro schemas the wire entries register (arvo.go's
# record layout; V2 is the post-DDL evolution adding a nullable column).
# ---------------------------------------------------------------------------
_NULLABLE_STR = ["null", "string"]
_NULLABLE_LONG = ["null", "long"]

EVENTS_KEY_SCHEMA = json.dumps({
    "type": "record", "name": "events_key",
    "fields": [{"name": "pk", "type": "long"}],
})

EVENTS_VALUE_V1 = json.dumps({
    "type": "record", "name": "events_value",
    "fields": [
        {"name": "pk", "type": "long"},
        {"name": "event_type", "type": _NULLABLE_STR, "default": None},
        {"name": "value_cents", "type": _NULLABLE_LONG, "default": None},
        {"name": "user_id", "type": _NULLABLE_LONG, "default": None},
        {"name": "_tidb_op", "type": "string"},
        {"name": "_tidb_commit_ts", "type": "long"},
        {"name": "_tidb_commit_physical_time", "type": "long"},
    ],
})

EVENTS_VALUE_V2 = json.dumps({
    "type": "record", "name": "events_value",
    "fields": json.loads(EVENTS_VALUE_V1)["fields"] + [
        {"name": "props", "type": _NULLABLE_STR, "default": None},
    ],
})

#: The ids a FRESH registry hands this registration order (key, value v1,
#: value v2) — the oracle templates these literals; if the allocator ever
#: drifted, the framed wire bytes would hash-mismatch externally.
EXPECTED_KEY_ID = 1
EXPECTED_V1_ID = 2
EXPECTED_V2_ID = 3
