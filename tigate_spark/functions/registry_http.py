"""Confluent schema-registry REST transport — a REAL localhost HTTP
round trip over the file-backed allocator.

Closes the one unmodeled piece of the registry story: the reference's
client speaks HTTP to a Confluent server
(``pkg/sink/codec/avro/confluent_schema_registry.go:141-154`` POST
``/subjects/<subject>/versions`` with Content-Type
``application/vnd.schemaregistry.v1+json``; ``:219-228`` GET
``/schemas/ids/<id>``; ``:356-364`` DELETE ``/subjects/<subject>``;
``:416+`` bounded retry loop). Here:

- :class:`RegistryHTTPServer` — a stdlib ``ThreadingHTTPServer`` on an
  ephemeral localhost port serving that REST surface, with every
  mutation delegated to :class:`FileSchemaRegistry` (so the ALLOCATION
  semantics — global content-dedup ids, per-subject versions,
  idempotent re-register, fcntl-serialized writes — are exactly the
  ones the wire entries already hash-check);
- :class:`HTTPSchemaRegistry` — a urllib client with the same method
  surface as the file client plus the reference's retry loop, so either
  can back ``GetCachedOrRegister``-style framing code unchanged.

Error mapping follows the Confluent API: unknown schema id → 404
``{"error_code": 40403}``, unknown subject → 404
``{"error_code": 40401}``.

At 100 TB the server is the managed Confluent deployment; only the
``base_url`` changes. Registration traffic is driver-side and
O(schema versions), never per-row.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from tigate_spark.functions.confluent_registry import FileSchemaRegistry

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class _Handler(BaseHTTPRequestHandler):
    # the registry is attached to the server instance
    def log_message(self, *a):  # silence per-request stderr noise
        pass

    def _send(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", CONTENT_TYPE)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self, error_code: int, message: str) -> None:
        self._send(404, {"error_code": error_code, "message": message})

    @property
    def _reg(self) -> "_LockedRegistry":
        return self.server.registry  # type: ignore[attr-defined]

    def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
        parts = [urllib.parse.unquote(p)
                 for p in self.path.strip("/").split("/")]
        try:
            if parts[:2] == ["schemas", "ids"] and len(parts) == 3:
                try:
                    sid = int(parts[2])
                except ValueError:
                    raise KeyError(f"schema id {parts[2]!r} is not a "
                                   "number") from None
                self._send(200, {"schema": self._reg.get_by_id(sid)})
            elif parts == ["subjects"]:
                self._send(200, self._reg.subjects())
            elif (len(parts) == 4 and parts[0] == "subjects"
                  and parts[2] == "versions" and parts[3] == "latest"):
                v = self._reg.latest(parts[1])
                self._send(200, {"subject": v["subject"],
                                 "version": v["version"],
                                 "id": v["schema_id"],
                                 "schema": v["schema"]})
            elif (len(parts) == 3 and parts[0] == "subjects"
                  and parts[2] == "versions"):
                self._send(200, self._reg.versions(parts[1]))
            else:
                self._not_found(404, f"unknown path {self.path}")
        except KeyError as e:
            code = 40403 if parts[:2] == ["schemas", "ids"] else 40401
            self._not_found(code, str(e))
        except Exception as e:  # noqa: BLE001 — a handler must answer
            self._send(500, {"error_code": 500, "message": str(e)})

    def do_POST(self) -> None:  # noqa: N802
        parts = [urllib.parse.unquote(p)
                 for p in self.path.strip("/").split("/")]
        try:
            if not (len(parts) == 3 and parts[0] == "subjects"
                    and parts[2] == "versions"):
                self._not_found(404, f"unknown path {self.path}")
                return
            n = int(self.headers.get("Content-Length", "0"))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
                schema = payload["schema"]
            except (ValueError, KeyError, TypeError):
                self._send(400, {"error_code": 42201,
                                 "message": "body must be JSON with a "
                                            "'schema' field"})
                return
            sid = self._reg.register(parts[1], schema)
            self._send(200, {"id": sid})
        except Exception as e:  # noqa: BLE001 — a handler must answer
            self._send(500, {"error_code": 500, "message": str(e)})

    def do_DELETE(self) -> None:  # noqa: N802
        parts = [urllib.parse.unquote(p)
                 for p in self.path.strip("/").split("/")]
        try:
            if len(parts) == 2 and parts[0] == "subjects":
                self._send(200, self._reg.delete_subject(parts[1]))
            else:
                self._not_found(404, f"unknown path {self.path}")
        except KeyError as e:
            self._not_found(40401, str(e))
        except Exception as e:  # noqa: BLE001 — a handler must answer
            self._send(500, {"error_code": 500, "message": str(e)})


class _LockedRegistry:
    """Thread-serialized facade over FileSchemaRegistry.

    The file store's fcntl lock serializes PROCESSES; requests handled
    by the threading server share one process, where fcntl is a no-op
    between threads — so the server adds the in-process mutex a real
    registry's request serialization provides. Both locks compose:
    processes contend on fcntl, this server's threads on the mutex."""

    def __init__(self, registry: FileSchemaRegistry):
        self._registry = registry
        self._mu = threading.Lock()

    def __getattr__(self, name):
        fn = getattr(self._registry, name)

        def locked(*a, **kw):
            with self._mu:
                return fn(*a, **kw)

        return locked


class RegistryHTTPServer:
    """Localhost Confluent-REST server over a FileSchemaRegistry file."""

    def __init__(self, registry_path: str, host: str = "127.0.0.1"):
        self._srv = ThreadingHTTPServer((host, 0), _Handler)
        self._srv.registry = _LockedRegistry(  # type: ignore[attr-defined]
            FileSchemaRegistry(registry_path))
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> str:
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self.base_url

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "RegistryHTTPServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


class HTTPSchemaRegistry:
    """REST client with the FileSchemaRegistry method surface.

    Mirrors the reference client: POST/GET with the schemaregistry.v1
    content type and a bounded retry loop on transient transport errors
    (``confluent_schema_registry.go:416+`` httpRetry)."""

    def __init__(self, base_url: str, retries: int = 3,
                 backoff_s: float = 0.05):
        self.base_url = base_url.rstrip("/")
        self.retries = retries
        self.backoff_s = backoff_s

    def _call(self, method: str, path: str, payload: dict | None = None):
        body = None if payload is None else json.dumps(payload).encode()
        req = urllib.request.Request(
            self.base_url + path, data=body, method=method,
            headers={"Content-Type": CONTENT_TYPE, "Accept": CONTENT_TYPE},
        )
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return json.loads(resp.read())
            except urllib.error.HTTPError as e:
                raw = e.read() or b""
                try:
                    msg = json.loads(raw).get("message", str(e))
                except ValueError:
                    # proxies / stdlib error pages emit HTML, not JSON
                    msg = f"{e.code} {raw[:200]!r}"
                if e.code >= 500:
                    # server faults are transient to the reference's
                    # httpRetry loop (:416+), not authoritative answers
                    last = RuntimeError(f"registry 5xx: {msg}")
                    time.sleep(self.backoff_s * (attempt + 1))
                    continue
                # 4xx is authoritative (40401/40403 → not registered)
                raise KeyError(msg) from None
            except urllib.error.URLError as e:
                last = e
                time.sleep(self.backoff_s * (attempt + 1))
        raise ConnectionError(f"registry unreachable: {last}")

    # -- same surface as FileSchemaRegistry ---------------------------------
    def register(self, subject: str, schema: str) -> int:
        out = self._call(
            "POST",
            f"/subjects/{urllib.parse.quote(subject, safe='')}/versions",
            {"schema": schema},
        )
        return int(out["id"])

    def get_by_id(self, schema_id: int) -> str:
        return self._call("GET", f"/schemas/ids/{int(schema_id)}")["schema"]

    def latest(self, subject: str) -> dict:
        out = self._call(
            "GET",
            f"/subjects/{urllib.parse.quote(subject, safe='')}"
            "/versions/latest",
        )
        return {"subject": out["subject"], "version": out["version"],
                "schema_id": out["id"], "schema": out["schema"]}

    def versions(self, subject: str) -> list[int]:
        return list(self._call(
            "GET",
            f"/subjects/{urllib.parse.quote(subject, safe='')}/versions",
        ))

    def subjects(self) -> list[str]:
        return list(self._call("GET", "/subjects"))

    def delete_subject(self, subject: str) -> list[int]:
        return list(self._call(
            "DELETE", f"/subjects/{urllib.parse.quote(subject, safe='')}",
        ))
