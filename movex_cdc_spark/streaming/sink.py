"""Outbound envelope sink — the engine's Kafka-producer analog.

The reference's consumers see a stream of JSON envelopes with three
hard invariants, asserted by its test double (kafka_mock.rb:37-141):

  1. every message is valid envelope JSON (schema/table/operation/id/
     timestamp + new/old payload objects),
  2. messages for one key arrive with ascending event ids
     (kafka_mock.rb:49-63),
  3. no message exceeds the broker size cap (~1 MB,
     kafka_mock.rb:80-96; oversized events raise and are dead-lettered).

EnvelopeSink enforces 1 and 3 at emit time as Catalyst predicates
(rows failing are returned for dead-lettering, mirroring the
reference's exception path) and materializes the stream into an
epoch-fenced append log. Invariant 2 is audited over the emitted
stream: within an epoch a key's rows are produced in ascending id
order by construction; across epochs the audit checks the per-key
epoch-to-epoch high-water mark, which is exactly what the reference's
mock asserts across its delivery batches.

Scale shape: emit is append-only (no shuffle beyond the envelope
projection — validity predicates are row-local codegen); the audit is
one groupBy(key, epoch) + one window over per-(key, epoch) aggregates,
O(keys × epochs), not O(events).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movex_cdc_spark.lake.append_log import UnkeyedEventLog
from movex_cdc_spark.operators.apply import with_envelope

ENVELOPE_COLS = [
    "id",
    "schema_name",
    "table_name",
    "operation",
    "timestamp",
    "transaction_id",
    "new_payload",
    "old_payload",
    "msg_key",
]

MAX_MESSAGE_BYTES = 1_000_000  # reference MAX_KAFKA_MESSAGE_SIZE analog

# Per-mode envelope timestamp shape, validated at emit exactly like the
# reference's KafkaMock validates format-per-mode (kafka_mock.rb:98-141:
# nil → dot fraction + tz with colon; TYPE_1 → comma + tz without colon;
# TYPE_2 → comma + tz with colon). Emitted as anchored regexes so a
# format/config mismatch rejects the row instead of shipping a contract
# violation downstream.
# [+-]: a configured negative tz_offset (db west of Greenwich) is a
# legal envelope, not a malformed one. (The reference's mock assumes a
# positive offset — kafka_mock.rb splits on '+' — but that is a test-
# double shortcut, not the producer contract.)
_TS_PATTERNS = {
    None: r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}[+-]\d{2}:\d{2}$",
    "TYPE_1": r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2},\d{6}[+-]\d{4}$",
    "TYPE_2": r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2},\d{6}[+-]\d{2}:\d{2}$",
}


class EnvelopeSink:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema_name: str = "public",
        table_name: str = "repo_files",
        max_bytes: int = MAX_MESSAGE_BYTES,
        cloudevents: bool = False,
        legacy_ts_format: str | None = None,
        tz_offset: str = "+00:00",
        fs=None,
    ):
        if legacy_ts_format not in _TS_PATTERNS:
            raise ValueError(f"Unknown legacy timestamp format {legacy_ts_format!r}")
        self.spark = spark
        self.schema_name = schema_name
        self.table_name = table_name
        self.max_bytes = max_bytes
        self.cloudevents = cloudevents
        self.legacy_ts_format = legacy_ts_format
        self.tz_offset = tz_offset
        from movex_cdc_spark.lake.fs import DEFAULT_FS

        fs = fs or DEFAULT_FS
        try:
            self.log = UnkeyedEventLog.load(spark, path, fs=fs)
        except FileNotFoundError:
            # create only a MISSING log — a dir with data but no _meta is
            # a legacy/foreign store, and corrupt metadata must propagate
            if fs.isdir(path) and any(
                f.endswith(".parquet") for f in fs.listdir(path)
            ):
                raise ValueError(
                    f"{path} holds parquet files but no log metadata — "
                    "not re-initializing over existing emitted messages"
                )
            self.log = UnkeyedEventLog.create(spark, path, fs=fs)

    # ------------------------------------------------------------ emit
    def emit(
        self,
        batch: DataFrame,
        stream_id: str = "default",
        epoch_id: int | None = None,
    ) -> dict[str, Any]:
        """Envelope + validate + fenced append.

        ``batch`` is a validated change-event frame (post condition/
        poison filters, PRE-LWW — every event is delivered, as the
        reference producer does). Returns the lineage record plus
        rejected-row counts; rejected rows (oversized / invalid) are in
        ``lineage['rejected_df']`` for the caller to dead-letter."""
        # optional envelope inputs default to NULL (a minimal source may
        # not carry a transaction id or capture timestamp)
        for opt, typ in (("ts", "timestamp"), ("txid", "long"), ("old_content", "string")):
            if opt not in batch.columns:
                batch = batch.withColumn(opt, F.lit(None).cast(typ))
        env = with_envelope(
            batch,
            schema_name=self.schema_name,
            table_name=self.table_name,
            cloudevents=self.cloudevents,
            legacy_ts_format=self.legacy_ts_format,
            tz_offset=self.tz_offset,
        )
        cols = ENVELOPE_COLS + (
            ["ce_id", "ce_source", "ce_specversion", "ce_type", "ce_time"]
            if self.cloudevents
            else []
        )
        env = env.select(*cols)
        msg = F.to_json(F.struct(*[F.col(c) for c in ENVELOPE_COLS]))
        size_ok = F.octet_length(msg) <= self.max_bytes
        # payload validity: the payload strings must parse back as JSON
        # objects (get_json_object -> null on malformed input)
        json_ok = F.get_json_object(F.col("new_payload"), "$").isNotNull() | (
            F.col("operation") == "DELETE"
        )
        key_ok = F.col("msg_key").isNotNull()
        # format-per-mode timestamp validation (KafkaMock analog). A
        # NULL timestamp is allowed: minimal sources carry no capture
        # ts (the defaulting loop above) — and must stay three-valued-
        # logic-safe: a bare regexp on NULL yields NULL, which silently
        # drops the row from BOTH the good and the rejected slice.
        ts_ok = F.col("timestamp").isNull() | F.col("timestamp").rlike(
            _TS_PATTERNS[self.legacy_ts_format]
        )
        ok = size_ok & json_ok & key_ok & ts_ok
        # the reject count rides the append scan as an Observation (the
        # observe sits UPSTREAM of the validity filter, so the one write
        # job counts the rows it drops) — no second action per epoch
        from pyspark.sql import Observation

        obs = Observation(f"emit_{stream_id}_{epoch_id}")
        observed = env.observe(obs, F.sum(F.when(~ok, 1).otherwise(0)).alias("n_rejected"))
        good = observed.filter(ok).withColumn("message_bytes", F.octet_length(msg))
        rejected = env.filter(~ok).withColumn(
            "error_msg",
            F.when(~size_ok, F.lit("message exceeds size cap"))
            .when(~json_ok, F.lit("invalid payload json"))
            .when(~key_ok, F.lit("null message key"))
            .otherwise(F.lit("malformed envelope timestamp")),
        )
        lineage = self.log.append(good, stream_id=stream_id, epoch_id=epoch_id)
        if not lineage.get("skipped"):
            n_rejected = int(obs.get.get("n_rejected") or 0)
            lineage["n_rejected"] = n_rejected
            lineage["rejected_df"] = rejected if n_rejected else None
        return lineage

    # ------------------------------------------------------------ read
    def read(self) -> DataFrame:
        return self.log.read()

    # ----------------------------------------------------------- audit
    def audit(self) -> dict[str, Any]:
        """Verify the KafkaMock per-key ordering invariant over the
        emitted stream: for each msg_key, epoch high-water marks must
        ascend — epoch e's max id < epoch e'>e's min id. Returns counts;
        violations > 0 means a late event crossed an epoch boundary out
        of order. ONE job: messages/keys/violations all fold out of the
        same per-(key, epoch) aggregate."""
        df = self.read()
        m = self.log.meta()
        if not m["files"]:
            return {"messages": 0, "keys": 0, "violations": 0}
        # epoch attribution: segment dirs are committed per epoch in
        # ascending version order; map file -> commit version (dir name
        # is seg-<version>-<uuid>). Anchored to the uuid suffix + '/':
        # an unanchored 'seg-(\d+)' would match a parent directory named
        # seg-<digits> anywhere in the log path and attribute EVERY file
        # to that one bogus epoch, silently hiding ordering violations.
        seg = F.regexp_extract(
            F.input_file_name(), r"seg-(\d+)-[0-9a-f]{8}/", 1
        ).cast("long")
        per_epoch = (
            df.withColumn("__seg", seg)
            .groupBy("msg_key", "__seg")
            .agg(F.min("id").alias("min_id"), F.max("id").alias("max_id"),
                 F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("msg_key").orderBy("__seg")
        row = (
            per_epoch.withColumn("prev_max", F.lag("max_id").over(w))
            .agg(
                F.sum("n").alias("messages"),
                F.countDistinct("msg_key").alias("keys"),
                F.sum(
                    F.when(
                        F.col("prev_max").isNotNull()
                        & (F.col("min_id") <= F.col("prev_max")),
                        1,
                    ).otherwise(0)
                ).alias("violations"),
            )
            .first()
        )
        return {
            # sums are NULL (not 0) when the committed listing holds only
            # empty segments — e.g. an epoch where every row was rejected
            "messages": int(row["messages"] or 0),
            "keys": int(row["keys"] or 0),
            "violations": int(row["violations"] or 0),
        }
