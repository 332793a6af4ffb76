"""Kafka producer seam — the transport interface the changelog sink
writes through, mirroring the reference's sarama surface:
``pkg/sink/kafka/sarama_factory.go`` (SyncProducer: send + delivery
error), ``pkg/sink/kafka/admin.go`` (ClusterAdminClient: topic
create / partition-count queries) and ``options.go`` (producer tuning;
the idempotent-producer setting is what makes broker-side resend
dedup sound).

The DBAPI-seam pattern (``streaming/dbapi.py``) applied to the one
transport that had none: the sink keeps its default parquet-backed
path (no broker in this sandbox), and a producer object injected on
the sink routes every message through ``produce_partition`` on the
executors instead — with retriable produce errors retried and
resend-without-duplication guaranteed by the broker-side sequence
dedup an idempotent Kafka producer provides.

``FakeWireProducer`` is the test double: a directory-backed "broker"
whose per-(topic, partition) logs are flock-serialized jsonl files,
deduplicating records by sequence number exactly like an idempotent
producer's broker session, plus once-only error injection via
O_EXCL marker files (the fake_mysql precedent) and a real
partition-count admin query. Everything is picklable — the producer
ships to executors inside the foreachPartition closure.
"""

from __future__ import annotations

import json
import os


class ProduceError(Exception):
    """A produce failure with the sarama retriability split
    (retriable: ErrLeaderNotAvailable/ErrNotLeaderForPartition/...;
    unretriable: ErrMessageSizeTooLarge/ErrInvalidTopic/...)."""

    def __init__(self, msg: str, retriable: bool = True):
        super().__init__(msg)
        self.retriable = retriable


class KafkaProducer:
    """Seam interface (duck-typed; subclass or match the methods)."""

    def ensure_topic(self, topic: str, partition_count: int) -> int:
        """admin.CreateTopic-or-get: create the topic with
        ``partition_count`` partitions, or return the EXISTING count
        (the reference queries GetTopicPartitionNum and routes by the
        actual count, options.go/admin.go)."""
        raise NotImplementedError

    def partition_count(self, topic: str) -> int:
        raise NotImplementedError

    def produce_partition(self, topic: str, partition: int,
                          records) -> int:
        """Synchronously deliver ``records`` — an iterable of dicts with
        ``seq`` (the idempotence sequence), ``key``, ``value`` — to one
        partition log. Returns the number of records ACCEPTED (already-
        delivered sequences dedup to no-ops). Raises ProduceError."""
        raise NotImplementedError

    def flush(self) -> None:
        """Barrier: everything produced is durable when this returns."""


class FakeWireProducer(KafkaProducer):
    """Directory-backed broker twin for tests and local runs.

    ``inject``: list of ``(kind, substring)`` — the first
    produce_partition whose "{topic}-{partition}" target contains
    ``substring`` raises; ``kind`` is 'retriable' (raised AFTER the
    records were appended — the delivery-report-lost window, so the
    caller's resend exercises broker dedup) or 'fatal'. Each injection
    fires ONCE globally across executor processes (O_EXCL markers under
    ``broker_dir/_inject``).

    ``compression``: producer TRANSPORT compression (the kafka sink
    URI's `compression` param, sarama.go:79-94 — distinct from the
    codec-level value compression the open protocol applies before
    framing). Like a real client+broker pair, the stored form is
    compressed and ``read_log`` hands consumers the PLAIN value back —
    transport compression is invisible to the application protocol."""

    def __init__(self, broker_dir: str, inject: list | None = None,
                 compression: str = "none", auto_create: bool = True):
        self.broker_dir = broker_dir
        self.inject = list(inject or [])
        self.compression = compression or "none"
        #: auto-create-topic=false (options.go:108): only query; a
        #: missing topic is a create-class error, not a silent create
        self.auto_create = auto_create
        os.makedirs(broker_dir, exist_ok=True)
        os.makedirs(os.path.join(broker_dir, "_inject"), exist_ok=True)

    # -- admin (admin.go ClusterAdminClient) ---------------------------
    def _topic_meta(self, topic: str) -> str:
        return os.path.join(self.broker_dir, f"_topic-{topic}.json")

    def ensure_topic(self, topic: str, partition_count: int) -> int:
        meta = self._topic_meta(topic)
        if not self.auto_create:
            if not os.path.exists(meta):
                raise ProduceError(
                    f"unknown topic {topic!r} and auto-create-topic "
                    f"is false (options.go:108)", retriable=False)
            return self.partition_count(topic)
        try:
            with open(meta, "x") as f:
                json.dump({"partitions": int(partition_count)}, f)
            return int(partition_count)
        except FileExistsError:
            return self.partition_count(topic)

    def partition_count(self, topic: str) -> int:
        with open(self._topic_meta(topic)) as f:
            return int(json.load(f)["partitions"])

    # -- produce (sarama SyncProducer twin) ----------------------------
    def _log_path(self, topic: str, partition: int) -> str:
        return os.path.join(self.broker_dir, f"{topic}-{int(partition)}.jsonl")

    def _maybe_inject(self, target: str, want_kind: str) -> None:
        for i, (kind, sub) in enumerate(self.inject):
            if kind == want_kind and sub in target:
                marker = os.path.join(self.broker_dir, "_inject",
                                      f"{i}-{kind}")
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                except FileExistsError:
                    continue  # already fired
                raise ProduceError(
                    f"injected {kind} produce error on {target}",
                    retriable=(kind == "retriable"))

    def produce_partition(self, topic: str, partition: int, records) -> int:
        import fcntl

        records = list(records)
        path = self._log_path(topic, partition)
        # a fatal rejection (ErrMessageSizeTooLarge class) happens
        # BEFORE anything lands on the log
        self._maybe_inject(f"{topic}-{int(partition)}", "fatal")
        accepted = 0
        with open(path, "a+") as f:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX)
            f.seek(0)
            seen = {json.loads(ln)["seq"] for ln in f if ln.strip()}
            f.seek(0, os.SEEK_END)
            # the delivery-report-lost window: a retriable injection
            # fires AFTER the append below completes (see finally),
            # so the caller retries a batch the broker already has —
            # dedup must absorb the resend
            try:
                for r in records:
                    if r["seq"] in seen:
                        continue  # idempotent-producer broker dedup
                    rec = {"seq": r["seq"], "key": r.get("key")}
                    v = r.get("value")
                    if self.compression != "none" and v is not None:
                        from tigate_spark.functions.compress import (
                            compress_bytes,
                        )

                        rec["vz"] = compress_bytes(
                            self.compression,
                            v.encode("utf-8")).hex()
                        rec["cc"] = self.compression
                    else:
                        rec["value"] = v
                    f.write(json.dumps(rec) + "\n")
                    seen.add(r["seq"])
                    accepted += 1
                f.flush()
            finally:
                fcntl.flock(f.fileno(), fcntl.LOCK_UN)
        self._maybe_inject(f"{topic}-{int(partition)}", "retriable")
        return accepted

    def flush(self) -> None:  # appends are synchronous
        return

    # -- consumer-side read (test surface) -----------------------------
    def read_log(self, topic: str, partition: int) -> list[dict]:
        path = self._log_path(topic, partition)
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for ln in f:
                if not ln.strip():
                    continue
                rec = json.loads(ln)
                if "vz" in rec:  # transport-compressed record: the
                    # consumer client decompresses transparently
                    from tigate_spark.functions.compress import (
                        decompress_bytes,
                    )

                    rec["value"] = decompress_bytes(
                        rec.pop("cc"),
                        bytes.fromhex(rec.pop("vz"))).decode("utf-8")
                out.append(rec)
        return out

    def read_all(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.broker_dir)):
            if fn.startswith("_") or not fn.endswith(".jsonl"):
                continue
            topic, _, part = fn[:-6].rpartition("-")
            for r in self.read_log(topic, int(part)):
                out.append({"topic": topic, "partition": int(part), **r})
        return out


def produce_with_retry(producer, topic: str, partition: int, records,
                       retries: int = 5) -> int:
    """The dml worker's send loop (kafka_dml_worker.go): retriable
    produce errors back off and RESEND the batch — duplication is
    prevented broker-side by the idempotent sequence dedup, never by
    skipping the resend."""
    import time

    last = None
    for attempt in range(retries):
        try:
            return producer.produce_partition(topic, partition, records)
        except ProduceError as e:
            last = e
            if not e.retriable:
                raise
            time.sleep(0.05 * (2 ** attempt))
    raise last
