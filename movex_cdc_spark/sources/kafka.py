"""Kafka inbound-queue source — the deployment-boundary twin of the
outbound ``KafkaEnvelopeWriter`` (streaming/sink.py).

The reference's staging queue is an Oracle table the workers SELECT
FOR UPDATE SKIP LOCKED from (transfer_thread.rb:180-222); on a Spark
deployment the queue is a Kafka topic read with the public
``format("kafka")`` structured-streaming source. This module pins the
WIRE CONTRACT and implements both directions as pure column plans, so
the transport hop is testable plan-level (and end-to-end through the
pipeline via a simulated hop) without a broker — the same
lake-as-test-double strategy the outbound writer uses.

Wire contract (one record per Event_Logs row):

  key   = ``msg_key`` UTF-8 bytes; NULL for unkeyed events (S5).
          Broker key-hash partitioning makes the key the per-key
          arrival-order unit — the SAME ordering contract the outbound
          producer declares, so chained engines compose.
  value = JSON object ``{seq, op, payload, ts, txid[, table_name]}``.
          ``ts`` travels as int64 MICROSECONDS since epoch
          (unix_micros): timezone- and format-proof, exact to Spark's
          timestamp precision. ``payload`` is the trigger JSON carried
          as an opaque STRING field (double-encoded BY DESIGN — the
          queue row's payload is a CLOB the transport never parses,
          exactly like the reference; ``parse_payload_events`` parses
          it after dispatch, keeping transport and capture decoupled).
          ``table_name`` appears iff the topic is a multiplexed queue
          (MULTIPLEX_EVENTS_SCHEMA).

Ordering/delivery: Kafka guarantees order per partition; with the key
contract above that is order per msg_key — sufficient because every
downstream operator (LWW, merge, fences) orders by ``seq`` within key
anyway. Delivery into the engine is exactly-once END-TO-END regardless
of broker redelivery: the source checkpoint pins offsets per epoch and
every sink fences (stream_id, epoch_id), so a replayed batch is a
per-table no-op — redelivered records BETWEEN epochs dedup through the
same LWW/seq path that absorbs trigger double-fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .events import MULTIPLEX_EVENTS_SCHEMA, PAYLOAD_EVENTS_SCHEMA

# What spark.readStream.format("kafka").load() yields (public contract
# of the Kafka source) — tests build static frames of this exact shape
# to exercise the parse plan without a broker.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)

_VALUE_FIELDS = ("seq", "op", "payload", "ts", "txid")


def queue_wire_frames(events: DataFrame) -> DataFrame:
    """Event_Logs-shaped frame (PAYLOAD_EVENTS_SCHEMA, optionally with
    the multiplex ``table_name`` tag) -> Kafka producer frame
    ``(key, value)``. Feed to ``writeStream.format("kafka")`` on the
    capture side, or into :func:`parse_queue_wire` in tests.

    ``to_json`` omits null fields; :func:`parse_queue_wire` reads a
    missing field as null, so null payload / txid / ts round-trip.
    """
    value_struct = F.struct(
        F.col("seq"),
        F.col("op"),
        F.col("payload"),
        F.unix_micros(F.col("ts")).alias("ts"),
        F.col("txid"),
        *([F.col("table_name")] if "table_name" in events.columns else []),
    )
    return events.select(
        F.col("msg_key").cast("binary").alias("key"),
        F.to_json(value_struct).alias("value"),
    )


def parse_queue_wire(records: DataFrame, tagged: bool = False) -> DataFrame:
    """Kafka-source-shaped frame -> PAYLOAD_EVENTS_SCHEMA (or the
    tagged MULTIPLEX_EVENTS_SCHEMA with ``tagged=True``).

    One ``json_tuple`` pass over the value (same single-Jackson-pass
    rationale as ``parse_payload_events``); all casts JVM-side. A
    malformed value yields null seq/op -> caught by the downstream
    poison split (ST6), mirroring the reference's
    parse-validate-or-dead-letter flow.
    """
    fields = list(_VALUE_FIELDS) + (["table_name"] if tagged else [])
    out_schema = MULTIPLEX_EVENTS_SCHEMA if tagged else PAYLOAD_EVENTS_SCHEMA
    parsed = records.select(
        F.col("key").cast("string").alias("msg_key"),
        F.json_tuple(F.col("value").cast("string"), *fields).alias(*fields),
    )
    typed = [
        parsed[f.name].cast(f.dataType).alias(f.name)
        if f.name != "ts"
        else F.timestamp_micros(parsed["ts"].cast("long")).alias("ts")
        for f in out_schema.fields
    ]
    return parsed.select(*typed)


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    tagged: bool = False,
) -> DataFrame:
    """Streaming read of the inbound queue topic -> parsed event
    frame, ready to be a ``CdcStreamPipeline(source_df=...)`` /
    ``MultiplexedCdcPipeline(source_df=...)`` source.

    ``maxOffsetsPerTrigger`` is the backpressure knob on this path
    (the file source's maxFilesPerTrigger analog; reference ST7).
    Requires the spark-sql-kafka connector on the deployment
    classpath; everything downstream of ``load()`` is the
    broker-independent :func:`parse_queue_wire` plan the tests pin.
    """
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        if int(max_offsets_per_trigger) <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        r = r.option("maxOffsetsPerTrigger", int(max_offsets_per_trigger))
    return parse_queue_wire(r.load(), tagged=tagged)


def as_kafka_source_frame(wire: DataFrame) -> DataFrame:
    """Coerce a producer frame ``(key, value)`` to the exact Kafka
    SOURCE schema (binary key/value + broker-side metadata columns) —
    what a consumer's ``format("kafka").load()`` would yield for these
    records. Pure projection: works on batch and streaming frames."""
    return wire.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),  # broker metadata; unused downstream
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def simulate_kafka_hop(events: DataFrame, tagged: bool = False) -> DataFrame:
    """Round the frame through the exact wire representation —
    serialize to (key, value), coerce to the Kafka SOURCE schema
    (binary key/value + broker-side metadata columns), parse back.
    Works on batch AND streaming frames (pure projections), so a test
    pipeline can run with the transport hop inline and prove the hop
    lossless end-to-end without a broker."""
    return parse_queue_wire(
        as_kafka_source_frame(queue_wire_frames(events)), tagged=tagged
    )


def hostile_kafka_hop(
    events: DataFrame,
    dup_mod: int = 5,
    tagged: bool = False,
    scramble: bool = True,
) -> DataFrame:
    """``simulate_kafka_hop``'s ADVERSARIAL twin (VERDICT r6 item 1;
    reference KafkaMock redelivery semantics, kafka_mock.rb:49-63): the
    same lossless wire round trip, except the 'broker' exercises its
    full at-least-once license — every ``dup_mod``-th record (by value
    hash, deterministic) is REDELIVERED, and arrival order is scrambled
    wholesale (Kafka only orders per partition/key; a consumer that
    depends on cross-key arrival order is wrong).

    Downstream must converge to the duplicate-free final state anyway:
    exact duplicates collapse in the LWW/max_by stage (same (key, seq)
    → same winner) and replayed epochs fence at every sink — which is
    precisely the engine-side half of the EOS contract this hop exists
    to attack.

    ``scramble=True`` (batch frames only — a global sort is illegal on
    a streaming frame) shuffles arrival order wholesale; on a STREAMING
    source pass ``scramble=False`` — the duplicates still inject, and
    per-micro-batch arrival order is arbitrary at the consumer anyway."""
    wire = queue_wire_frames(events)
    dup = wire.filter(F.pmod(F.xxhash64("value"), F.lit(dup_mod)) == 0)
    hostile = wire.unionAll(dup)
    if scramble:
        hostile = hostile.orderBy(F.xxhash64("value", F.lit(17)))
    return parse_queue_wire(as_kafka_source_frame(hostile), tagged=tagged)


# ------------------------------------------------------------ envelopes
# The OUTBOUND envelope topic's value JSON, as a chained engine's
# inbound contract (streaming/sink.py ENVELOPE_COLS — one source of
# truth for the producer; this tuple pins the consumer's view of it).
ENVELOPE_WIRE_FIELDS = (
    "id",
    "schema_name",
    "table_name",
    "operation",
    "timestamp",
    "transaction_id",
    "new_payload",
    "old_payload",
    "msg_key",
)


def parse_envelope_wire(records: DataFrame) -> DataFrame:
    """Kafka-source-shaped frame of ENVELOPE messages (what
    ``KafkaEnvelopeWriter`` produced) -> typed envelope columns — the
    consumer half of a chained-engine deployment (engine A's envelope
    topic is engine B's inbound queue).

    One ``json_tuple`` pass; ``new_payload`` / ``old_payload`` /
    ``msg_key`` stay OPAQUE JSON strings (the transport never parses
    payloads — same decoupling as the inbound queue wire). A malformed
    value parses all-null and flows to the consumer's poison split."""
    parsed = records.select(
        F.json_tuple(
            F.col("value").cast("string"), *ENVELOPE_WIRE_FIELDS
        ).alias(*ENVELOPE_WIRE_FIELDS)
    )
    return parsed.select(
        F.col("id").cast("long").alias("id"),
        "schema_name",
        "table_name",
        "operation",
        "timestamp",
        F.col("transaction_id").cast("long").alias("transaction_id"),
        "new_payload",
        "old_payload",
        "msg_key",
    )


def adversarial_deliveries(
    wire_epochs: list[DataFrame],
    dup_mod: int = 5,
    replay_tail_s: int = 3600,
    ts_col: str = "__ts",
) -> list[DataFrame]:
    """Turn per-epoch producer wire frames into the delivery batches an
    at-least-once broker hop is ALLOWED to hand a consumer — the
    adversary of the end-to-end EOS proof (reference blackbox analog:
    test_blackbox/run_blackbox_test.sh + kafka_mock.rb:49-63).

    Delivery ``i`` contains, in deterministically SCRAMBLED order:

      * epoch ``i``'s records (every record at least once),
      * every ``dup_mod``-th record of epoch ``i`` AGAIN — in-epoch
        duplicates, including ones adjacent to the epoch boundary,
      * a CROSS-EPOCH REPLAY of epoch ``i-1``'s tail: every record
        whose event time is within ``replay_tail_s`` of that epoch's
        max — the producer-task-retry / offset-rewind shape. The tail
        always contains epoch ``i-1``'s LAST record, so the boundary
        itself is re-crossed by a duplicate every time.

    Each input frame must carry ``ts_col`` (event time) alongside
    ``(key, value)`` — used ONLY to bound the replay window (prompt
    redelivery, the transport contract a watermarked consumer guard
    assumes) and dropped from the deliveries. The epoch max rides a
    broadcast-of-one-row lazy scalar, so nothing executes at build."""
    out = []
    prev: DataFrame | None = None
    for i, w in enumerate(wire_epochs):
        parts = [
            w,
            w.filter(F.pmod(F.xxhash64("value"), F.lit(dup_mod)) == 0),
        ]
        if prev is not None:
            tail = prev.join(
                F.broadcast(prev.agg(F.max(ts_col).alias("__mx"))),
                F.col(ts_col)
                >= F.col("__mx") - F.expr(f"INTERVAL {replay_tail_s} SECOND"),
            ).drop("__mx")
            parts.append(tail)
        delivery = parts[0]
        for p in parts[1:]:
            delivery = delivery.unionAll(p)
        out.append(
            delivery.orderBy(F.xxhash64("value", F.lit(31 + i))).select(
                "key", "value"
            )
        )
        prev = w
    return out
