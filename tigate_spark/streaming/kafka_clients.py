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
#: (options.go: WaitForAll acks; idempotence dedups the CLIENT's
#: internal retries — application-level redelivery is handled by
#: produce_partition's failed-only retry, never a blind batch resend)
DEFAULT_CONFIG = {
    "enable.idempotence": True,
    "acks": "all",
    "compression.type": "none",  # seam-level compression is explicit
}


_GO_DURATION_UNITS = (("ns", 1e-6), ("us", 1e-3), ("µs", 1e-3),
                      ("ms", 1.0), ("s", 1000.0), ("m", 60000.0),
                      ("h", 3600000.0))


def parse_go_duration_ms(text: str) -> int:
    """Go ``time.ParseDuration`` subset → milliseconds (the reference's
    dial/read/write timeouts arrive as '10s'/'2m' strings,
    options.go:109-111). Go edges honored: bare '0' is valid without a
    unit (time.ParseDuration special-cases it); negative durations,
    while parseable in Go, are rejected here because a negative
    millisecond value is never a valid librdkafka timeout."""
    s = text.strip()
    if s in ("0", "+0", "-0"):
        return 0
    total = 0.0
    num = ""
    i = 0
    matched_any = False
    while i < len(s):
        c = s[i]
        # Go allows a sign only at the very start of the string — an
        # interior '-'/'+' (e.g. '1h-30m') is invalid, not a new number
        if c.isdigit() or c == "." or (c in "+-" and i == 0):
            num += c
            i += 1
            continue
        for unit, scale in _GO_DURATION_UNITS:
            if s.startswith(unit, i) and (
                    unit != "m" or not s.startswith("ms", i)):
                if not num:
                    raise ValueError(f"invalid duration {text!r}")
                total += float(num) * scale
                num = ""
                i += len(unit)
                matched_any = True
                break
        else:
            raise ValueError(f"invalid duration {text!r}")
    if num or not matched_any:
        raise ValueError(f"invalid duration {text!r}")
    if total < 0:
        raise ValueError(f"negative duration {text!r} is not a valid "
                         f"timeout")
    return int(total)


#: sasl-mechanism values the reference accepts (security/sasl.go):
#: plain/scram-sha-256/scram-sha-512/gssapi → librdkafka spellings
_SASL_MECHANISMS = {
    "plain": "PLAIN",
    "scram-sha-256": "SCRAM-SHA-256",
    "scram-sha-512": "SCRAM-SHA-512",
    "gssapi": "GSSAPI",
}


def client_config_from_params(params: dict) -> dict:
    """Translate the reference kafka URI's client params
    (options.go:104-128: kafka-client-id, dial/read/write timeouts,
    SASL family, TLS family; kafka-version is accepted and ignored —
    librdkafka negotiates the protocol version sarama had to pin) into
    librdkafka config keys. Raises ValueError on malformed values at
    create time, like every other sink misconfiguration."""
    conf: dict = {}
    if params.get("kafka-client-id"):
        conf["client.id"] = params["kafka-client-id"]
    if params.get("dial-timeout"):
        conf["socket.connection.setup.timeout.ms"] = (
            parse_go_duration_ms(params["dial-timeout"]))
    rw = [parse_go_duration_ms(params[k])
          for k in ("read-timeout", "write-timeout") if params.get(k)]
    if rw:
        # librdkafka has ONE socket.timeout.ms for both directions —
        # take the larger so neither reference bound tightens the other
        conf["socket.timeout.ms"] = max(rw)
    tls = str(params.get("enable-tls", "")).lower() in ("true", "1")
    sasl = bool(params.get("sasl-user") or params.get("sasl-mechanism"))
    if sasl:
        mech = (params.get("sasl-mechanism") or "plain").lower()
        if mech not in _SASL_MECHANISMS:
            raise ValueError(
                f"unknown sasl-mechanism {mech!r} (expected one of "
                f"{sorted(_SASL_MECHANISMS)})")
        conf["sasl.mechanisms"] = _SASL_MECHANISMS[mech]
        if params.get("sasl-user"):
            conf["sasl.username"] = params["sasl-user"]
        if params.get("sasl-password"):
            conf["sasl.password"] = params["sasl-password"]
        if mech == "gssapi":
            if params.get("sasl-gssapi-service-name"):
                conf["sasl.kerberos.service.name"] = (
                    params["sasl-gssapi-service-name"])
            if params.get("sasl-gssapi-keytab-path"):
                conf["sasl.kerberos.keytab"] = (
                    params["sasl-gssapi-keytab-path"])
            if params.get("sasl-gssapi-user"):
                conf["sasl.kerberos.principal"] = (
                    params["sasl-gssapi-user"])
        conf["security.protocol"] = "SASL_SSL" if tls else "SASL_PLAINTEXT"
    elif tls:
        conf["security.protocol"] = "SSL"
    if tls:
        if params.get("ca"):
            conf["ssl.ca.location"] = params["ca"]
        if params.get("cert"):
            conf["ssl.certificate.location"] = params["cert"]
        if params.get("key"):
            conf["ssl.key.location"] = params["key"]
        if str(params.get("insecure-skip-verify", "")).lower() in (
                "true", "1"):
            conf["enable.ssl.certificate.verification"] = False
    return conf


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


def _new_topic(topic: str, n: int, replication: int = 1):
    from confluent_kafka.admin import NewTopic  # type: ignore

    return NewTopic(topic, num_partitions=n,
                    replication_factor=replication)


class ConfluentKafkaProducer(KafkaProducer):
    """Seam implementation over the confluent-kafka API shape.

    ``new_topic`` builds the admin's topic-spec object (defaults to the
    real ``NewTopic``; the mock suite passes its own), keeping this
    class free of a hard import."""

    def __init__(self, bootstrap_servers: str, config: dict | None = None,
                 client_factory=None, admin_factory=None, new_topic=None,
                 flush_timeout: float = 30.0, replication_factor: int = 1,
                 auto_create: bool = True):
        self.conf = {"bootstrap.servers": bootstrap_servers,
                     **DEFAULT_CONFIG, **(config or {})}
        self.flush_timeout = flush_timeout
        #: options.go:103/169 replication-factor (default 1), applied
        #: at topic create (admin.go CreateTopic)
        self.replication_factor = int(replication_factor)
        #: options.go:108 auto-create-topic: False = query-only
        self.auto_create = auto_create
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

    #: producer-only config keys the AdminClient must not receive
    _PRODUCER_ONLY = ("enable.idempotence", "acks", "compression.type",
                      "linger.ms", "batch.size", "transactional.id")

    def _admin_client(self):
        if self._admin is None:
            factory = self._admin_factory
            if factory is None:
                _, factory = _confluent_factories()
            # forward everything EXCEPT producer-only keys — a secured
            # cluster needs the same security.protocol/sasl.*/ssl.*
            # settings on admin requests as on produce
            admin_conf = {k: v for k, v in self.conf.items()
                          if k not in self._PRODUCER_ONLY}
            self._admin = factory(admin_conf)
        return self._admin

    # -- admin (admin.go ClusterAdminClient twin) -------------------------
    def ensure_topic(self, topic: str, partition_count: int) -> int:
        if not self.auto_create:
            # query-only: partition_count raises its unknown-topic
            # class if the broker has no such topic
            return self.partition_count(topic)
        admin = self._admin_client()
        mk = self._new_topic or _new_topic
        try:
            spec = mk(topic, int(partition_count),
                      int(self.replication_factor))
        except TypeError:  # mock new_topic without the replication arg
            spec = mk(topic, int(partition_count))
        fut = admin.create_topics([spec])[topic]
        try:
            fut.result()
            return int(partition_count)
        except Exception as e:  # KafkaException(TOPIC_ALREADY_EXISTS) et al
            if not self._is_topic_exists(e):
                raise
            return self.partition_count(topic)

    @staticmethod
    def _is_topic_exists(e: Exception) -> bool:
        """Classify create_topics failure as topic-already-exists by the
        STRUCTURED librdkafka error code when available (KafkaException
        args carry a KafkaError with .code(); compare against
        KafkaError.TOPIC_ALREADY_EXISTS = 36). The substring match is
        only the fallback for injected mocks without the attribute —
        a raw-text match across client versions would misclassify any
        unrelated error whose message happens to contain the token."""
        err = e.args[0] if e.args else None
        code = getattr(err, "code", None)
        if callable(code):
            try:
                from confluent_kafka import KafkaError  # noqa: PLC0415
                expected = KafkaError.TOPIC_ALREADY_EXISTS
            except ImportError:
                expected = 36  # librdkafka RD_KAFKA_RESP_ERR constant
            return code() == expected
        return "ALREADY_EXISTS" in str(e).upper()

    def partition_count(self, topic: str) -> int:
        md = self._admin_client().list_topics(topic=topic)
        meta = md.topics.get(topic) if hasattr(md.topics, "get") \
            else md.topics[topic]
        n = len(meta.partitions) if meta is not None else 0
        if n == 0:
            # unknown topic (librdkafka returns an errored/empty
            # metadata entry rather than raising)
            raise ProduceError(
                f"unknown topic {topic!r}"
                + ("" if self.auto_create
                   else " and auto-create-topic is false"),
                retriable=False)
        return n

    # -- produce (sarama SyncProducer twin) -------------------------------
    @staticmethod
    def _bytes(v) -> bytes | None:
        if v is None:
            return None
        return v if isinstance(v, bytes) else str(v).encode()

    #: librdkafka Message.status() value for "possibly persisted" — the
    #: in-flight-at-failure state an application-level re-produce could
    #: duplicate (broker idempotence only dedups the CLIENT's internal
    #: retries, never a fresh produce() call)
    _POSSIBLY_PERSISTED = 1
    #: bounded failed-only redelivery passes inside one produce_partition
    delivery_retries = 3

    def produce_partition(self, topic: str, partition: int, records) -> int:
        """Deliver with per-record tracking. Kafka idempotence does NOT
        dedup application-level re-produce calls, so this adapter never
        relies on the seam's blind-resend contract: failures that are
        provably not persisted are re-produced internally (failed
        records ONLY); a possibly-persisted failure or a partial batch
        that cannot be completed fails the feed unretriably (exactly-once
        past that point needs Kafka transactions). A retriable
        ProduceError escapes only when NOTHING was delivered — the one
        case where the caller's full resend cannot duplicate."""
        p = self._producer()
        records = list(records)
        pending = list(range(len(records)))
        delivered: set = set()
        last_err = None
        for _pass in range(self.delivery_retries + 1):
            failed: list = []  # (idx, err, possibly_persisted)

            def mk_cb(i):
                def cb(err, msg):
                    if err is None:
                        delivered.add(i)
                    else:
                        status = getattr(msg, "status", None)
                        possibly = (status is not None and callable(status)
                                    and status() == self._POSSIBLY_PERSISTED)
                        failed.append((i, err, possibly))
                return cb

            for i in pending:
                r = records[i]
                for _ in range(100):
                    try:
                        p.produce(
                            topic, partition=int(partition),
                            key=self._bytes(r.get("key")),
                            value=self._bytes(r.get("value")),
                            # the seam's sequence rides as a header for
                            # consumer-side observability
                            headers=[("x-seq", str(r["seq"]).encode())],
                            on_delivery=mk_cb(i))
                        break
                    except BufferError:
                        # local queue full: drain delivery reports and
                        # re-produce this record (the standard loop)
                        p.poll(0.5)
                else:
                    raise ProduceError(
                        f"local producer queue stayed full on "
                        f"{topic}-{partition}", retriable=False)
                p.poll(0)
            remaining = p.flush(self.flush_timeout)
            if remaining:
                # timed-out messages are in an unknown state — fail the
                # feed rather than silently dropping or duplicating
                raise ProduceError(
                    f"flush timeout: {remaining} messages undelivered on "
                    f"{topic}-{partition}", retriable=False)
            if not failed:
                return len(delivered)
            last_err = failed[0][1]
            # ambiguity first: whatever the error's retriability, a
            # possibly-persisted failure must not be re-produced
            possibly = [e for _i, e, pp in failed if pp]
            if possibly:
                raise ProduceError(
                    f"delivery failed possibly-persisted: {possibly[0]} — "
                    f"a resend could duplicate; exactly-once past this "
                    f"point needs Kafka transactions", retriable=False)
            fatal = [e for _i, e, _p in failed
                     if not getattr(e, "retriable", lambda: False)()]
            if fatal:
                raise ProduceError(f"delivery failed: {fatal[0]}",
                                   retriable=False)
            pending = [i for i, _e, _p in failed]
        if not delivered:
            # nothing committed: the caller's full resend is safe
            raise ProduceError(f"delivery failed: {last_err}",
                               retriable=True)
        raise ProduceError(
            f"partial delivery ({len(delivered)}/{len(records)}) with "
            f"retries exhausted: {last_err} — a blind resend would "
            f"duplicate the delivered prefix", retriable=False)

    def flush(self) -> None:
        if self._p is not None:
            self._p.flush(self.flush_timeout)
