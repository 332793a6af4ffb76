"""Real-client Kafka adapter behind the producer seam
(:mod:`tigate_spark.streaming.kafka`).

``ConfluentKafkaProducer`` implements the seam's four methods against
the **confluent-kafka** client API surface (``Producer.produce(topic,
value, key, partition, headers, on_delivery)`` + ``poll``/``flush``;
``AdminClient.create_topics([NewTopic])`` futures with
TOPIC_ALREADY_EXISTS, ``list_topics`` metadata) so a production swap is
a URI change: the changelog sink takes any seam object, and this one
binds a real broker. The reference's equivalent knobs
(``pkg/sink/kafka/options.go``: RequiredAcks=WaitForAll, idempotent
producer on, bounded message size) map onto librdkafka config keys in
``DEFAULT_CONFIG``.

The client library is import-gated (not in this container): the class
takes injectable ``client_factory``/``admin_factory`` callables so the
contract suite (``tests/test_transport_adapters.py``) runs the SAME
adapter logic against a mock implementing the confluent-kafka API
shape, and — when the real library and a broker are present — against
them unchanged (skipped-if-absent).

Executor shipping: a live librdkafka handle is not picklable, so the
adapter stores only config and (re)creates clients lazily per process —
``__getstate__`` drops the handles. That is also the correct
production shape (one producer per executor, not one serialized from
the driver).
"""

from __future__ import annotations

from tigate_spark.streaming.kafka import KafkaProducer, ProduceError

#: librdkafka config mirroring the reference's producer tuning
#: (options.go: WaitForAll acks; idempotence → broker-side resend dedup,
#: the property produce_with_retry's blind resend relies on)
DEFAULT_CONFIG = {
    "enable.idempotence": True,
    "acks": "all",
    "compression.type": "none",  # seam-level compression is explicit
}


def _confluent_factories():
    """Import-gated real client factories (confluent-kafka package)."""
    try:
        from confluent_kafka import Producer  # type: ignore
        from confluent_kafka.admin import AdminClient  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "confluent-kafka is not installed: pass client_factory/"
            "admin_factory, or install the client to bind a real "
            "broker") from e
    return (lambda conf: Producer(conf)), (lambda conf: AdminClient(conf))


def _new_topic(topic: str, n: int):
    from confluent_kafka.admin import NewTopic  # type: ignore

    return NewTopic(topic, num_partitions=n)


class ConfluentKafkaProducer(KafkaProducer):
    """Seam implementation over the confluent-kafka API shape.

    ``new_topic`` builds the admin's topic-spec object (defaults to the
    real ``NewTopic``; the mock suite passes its own), keeping this
    class free of a hard import."""

    def __init__(self, bootstrap_servers: str, config: dict | None = None,
                 client_factory=None, admin_factory=None, new_topic=None,
                 flush_timeout: float = 30.0):
        self.conf = {"bootstrap.servers": bootstrap_servers,
                     **DEFAULT_CONFIG, **(config or {})}
        self.flush_timeout = flush_timeout
        self._client_factory = client_factory
        self._admin_factory = admin_factory
        self._new_topic = new_topic
        self._p = None
        self._admin = None

    # -- lazy, per-process client handles --------------------------------
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_p"] = None
        d["_admin"] = None
        return d

    def _producer(self):
        if self._p is None:
            factory = self._client_factory
            if factory is None:
                factory, _ = _confluent_factories()
            self._p = factory(self.conf)
        return self._p

    def _admin_client(self):
        if self._admin is None:
            factory = self._admin_factory
            if factory is None:
                _, factory = _confluent_factories()
            self._admin = factory({"bootstrap.servers":
                                   self.conf["bootstrap.servers"]})
        return self._admin

    # -- admin (admin.go ClusterAdminClient twin) -------------------------
    def ensure_topic(self, topic: str, partition_count: int) -> int:
        admin = self._admin_client()
        spec = (self._new_topic or _new_topic)(topic, int(partition_count))
        fut = admin.create_topics([spec])[topic]
        try:
            fut.result()
            return int(partition_count)
        except Exception as e:  # KafkaException(TOPIC_ALREADY_EXISTS) et al
            if "ALREADY_EXISTS" not in str(e).upper():
                raise
            return self.partition_count(topic)

    def partition_count(self, topic: str) -> int:
        md = self._admin_client().list_topics(topic=topic)
        return len(md.topics[topic].partitions)

    # -- produce (sarama SyncProducer twin) -------------------------------
    @staticmethod
    def _bytes(v) -> bytes | None:
        if v is None:
            return None
        return v if isinstance(v, bytes) else str(v).encode()

    def produce_partition(self, topic: str, partition: int, records) -> int:
        p = self._producer()
        errs: list = []

        def on_delivery(err, _msg):
            if err is not None:
                errs.append(err)

        n = 0
        for r in records:
            p.produce(
                topic, partition=int(partition),
                key=self._bytes(r.get("key")),
                value=self._bytes(r.get("value")),
                # the seam's idempotence sequence rides as a header for
                # consumer-side observability; resend dedup itself is the
                # broker's enable.idempotence contract
                headers=[("x-seq", str(r["seq"]).encode())],
                on_delivery=on_delivery)
            p.poll(0)
            n += 1
        p.flush(self.flush_timeout)
        if errs:
            # sarama retriability split: every failed delivery must be
            # retriable for the batch resend to be sound
            retriable = all(
                getattr(e, "retriable", lambda: False)() for e in errs)
            raise ProduceError(f"delivery failed: {errs[0]}",
                               retriable=retriable)
        return n

    def flush(self) -> None:
        if self._p is not None:
            self._p.flush(self.flush_timeout)
