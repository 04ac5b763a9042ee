"""The streaming shell: checkpointed foreachBatch apply (SURVEY §7.1-3).

One Structured Streaming query per target table — the analog of the
reference's worker pool (thread_handling.rb:18-48), except ordering
and exclusivity come from the key-hash shuffle inside the batch, not
from thread-per-key-slice affinity.

Exactly-once contract (reference ST2, transfer_thread.rb:68-80):
Spark may re-execute a foreachBatch with the same epoch_id after a
crash between the sink commit and the checkpoint commit — precisely
the reference's Kafka-commit-then-DB-delete hazard window
(transfer_thread.rb:171-177). The lake table's epoch fence makes the
re-execution a no-op, so end state is exactly-once; resume is the
checkpoint's offset log (ST11).
"""

from __future__ import annotations

from collections import deque
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import (
    DeadLetterTable,
    _filter_validate_project,
    apply_batch,
    apply_batch_flagged,
    apply_batch_unkeyed,
    flag_dispositions,
)
from movex_cdc_spark.sources.events import (
    PAYLOAD_EVENTS_SCHEMA,
    parse_payload_events,
    read_events_stream,
)
from movex_cdc_spark.streaming.lineage import MetricsTable

#: Driver-side epoch-lineage retention (VERDICT r6 item 4): the
#: in-memory ``epochs`` window is a convenience for tests and the
#: status surface, NOT the durable record (that's MetricsTable). On a
#: long-lived ``processing_time`` trigger an unbounded list is a slow
#: O(epochs) driver leak, so both pipelines keep a bounded deque.
EPOCH_HISTORY = 1024


class CdcStreamPipeline:
    """``table`` is any LakeTable-compatible sink — the eager COW
    LakeTable or a lake.mor.MergeOnReadTable (delta-append epochs +
    amortized compaction; right choice when triggers are small and
    frequent relative to the table)."""

    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        events_dir: str,
        checkpoint_dir: str,
        stream_id: str = "cdc",
        dead_letter_dir: str | None = None,
        metrics_dir: str | None = None,
        condition_sql: str | None = None,
        salted: bool = False,
        max_files_per_trigger: int | None = None,
        payload_format: bool = False,
        config: "object | None" = None,
        table_name: str | None = None,
        unkeyed_log: "object | None" = None,
        envelope_sink: "object | None" = None,
        fs=None,
        source_df: DataFrame | None = None,
    ):
        self.spark = spark
        self.table = table
        self.events_dir = events_dir
        # source_df: a pre-built STREAMING frame in the event schema
        # replaces the file-source read — the seam a Kafka inbound
        # queue plugs into (sources/kafka.read_events_kafka); the
        # file source stays the default/test double. The checkpoint
        # tracks whatever source backs the frame (Kafka offsets /
        # file listings), so exactly-once composes unchanged.
        self.source_df = source_df
        self.checkpoint_dir = checkpoint_dir
        self.stream_id = stream_id
        # fs seam for the quarantine/sink logs this pipeline constructs
        # itself (the lake table carries its own); lets --fs hadoop
        # deployments keep EVERY metadata commit off the local FS
        self.fs = fs
        self.dead_letter = (
            DeadLetterTable(spark, dead_letter_dir, fs=fs) if dead_letter_dir else None
        )
        self.metrics = MetricsTable(spark, metrics_dir) if metrics_dir else None
        self.condition_sql = condition_sql
        self.salted = salted
        self.max_files_per_trigger = max_files_per_trigger
        # payload_format: source rows are Event_Logs-shaped (msg_key +
        # JSON payload); the event parse (from_json) runs first
        self.payload_format = payload_format
        # config-driven capture (reference: triggers compiled from table
        # config, db_trigger_generator_oracle.rb:98-238). `config` is a
        # config.table_config.EngineConfig; it is re-read EVERY batch, so
        # swapping it between micro-batches (set_config) changes the
        # captured columns/conditions/expressions mid-stream — the
        # reference's trigger-regeneration-on-config-change story, with
        # lake-table schema evolution as the ALTER-before-MERGE step.
        self.config = config
        self.table_name = table_name
        # sink for key_handling='N' tables (S5): append-only, no merge
        self.unkeyed_log = unkeyed_log
        # outbound consumer stream (streaming/sink.py EnvelopeSink):
        # every validated event is produced as an envelope, pre-LWW,
        # exactly like the reference's Kafka producer
        self.envelope_sink = envelope_sink
        # bounded lineage window (newest EPOCH_HISTORY records); the
        # durable copy is MetricsTable
        self.epochs: deque[dict[str, Any]] = deque(maxlen=EPOCH_HISTORY)
        self._envelope_dl = None  # lazy; one instance, not one per epoch

    def set_config(self, config) -> None:
        """Swap capture config between micro-batches (S12 import →
        live reconfiguration)."""
        self.config = config

    def _table_cfg(self):
        if self.config is None:
            return None
        name = self.table_name or next(iter(self.config.tables))
        return self.config.tables[name]

    def _apply(self, batch_df, epoch_id: int) -> None:
        from pyspark import StorageLevel

        # NOTE (r8, measured and deliberately NOT adopted): an
        # under-parallel micro-batch (one partition per source file)
        # COULD be hash-repartitioned here before the parse (guide
        # §2.5). In-process A/B at 4×1M-event epochs showed the raw-
        # payload exchange (~200 MB/epoch) costs as much as or more
        # than the added parse parallelism saves on this host (walls
        # 22.4→34.1 s and 19.0→42.7 s ON vs OFF in adjacent runs) —
        # the epoch is bandwidth-bound, not parse-bound. At production
        # scale epochs have >= cores files anyway, so the fan-out
        # would be a no-op exactly where it is safe.
        if self.payload_format:
            batch_df = parse_payload_events(batch_df)
        # Fast path (no envelope sink, no table config): run the whole
        # disposition chain — condition filter, no-op suppression,
        # poison FLAG — inside the cache-building projection and drop
        # old_content before the persist. The JSON parse and the cache
        # write then happen exactly once per micro-batch, the cache
        # loses its biggest column (the old image), and the poison
        # quarantine is a cheap flag-slice of the cache instead of a
        # second full-parse scan. Envelope/config paths keep the full
        # parsed cache: both may read old_content / ts / txid.
        fast = self.envelope_sink is None and self.config is None
        if fast:
            batch_df = flag_dispositions(batch_df, self.condition_sql)
        # MEMORY_AND_DISK: an oversized batch spills instead of
        # GC-thrashing (measured +15% on the 4×1M-epoch bench; a
        # MEMORY_ONLY cache of a 16M-row full backlog measured WORSE in
        # round 1, which is why batch-replay callers of apply_batch on
        # full backlogs do not persist).
        batch_df = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if fast:
                lin = apply_batch_flagged(
                    self.table,
                    batch_df,
                    epoch_id=epoch_id,
                    stream_id=self.stream_id,
                    dead_letter=self.dead_letter,
                    metrics=self.metrics,
                )
                self.epochs.append(lin)
            else:
                self._apply_inner(batch_df, epoch_id)
        finally:
            batch_df.unpersist()

    def _apply_inner(self, batch_df, epoch_id: int) -> None:
        cfg = self._table_cfg()
        if self.envelope_sink is not None:
            valid, _poison = _filter_validate_project(
                batch_df, self.condition_sql, cfg
            )
            sink_lin = self.envelope_sink.emit(
                valid, stream_id=self.stream_id, epoch_id=epoch_id
            )
            # pop UNCONDITIONALLY: with no dead-letter configured the
            # record must not keep the rejected DataFrame (and its plan
            # + checkpointed blocks) alive in driver memory
            rejected_df = sink_lin.pop("rejected_df", None)
            if rejected_df is not None and self.dead_letter is not None:
                # envelope-shaped rejects get their own quarantine dir —
                # mixing them into the event-shaped dead letters would
                # corrupt that table's read schema. Constructed once and
                # cached: per-epoch construction re-read the log
                # metadata on every rejecting micro-batch
                if self._envelope_dl is None:
                    self._envelope_dl = DeadLetterTable(
                        self.spark, self.dead_letter.path + "_envelope", fs=self.fs
                    )
                self._envelope_dl.append(
                    rejected_df,
                    stream_id=f"{self.stream_id}-sink",
                    epoch_id=epoch_id,
                )
        if cfg is not None and cfg.key_handling == "N":
            if self.unkeyed_log is None:
                raise ValueError("key_handling='N' requires an unkeyed_log sink")
            lin = apply_batch_unkeyed(
                self.unkeyed_log,
                batch_df,
                epoch_id=epoch_id,
                stream_id=self.stream_id,
                condition_sql=self.condition_sql,
                table_cfg=cfg,
                dead_letter=self.dead_letter,
            )
        else:
            lin = apply_batch(
                self.table,
                batch_df,
                epoch_id=epoch_id,
                stream_id=self.stream_id,
                condition_sql=self.condition_sql,
                salted=self.salted,
                dead_letter=self.dead_letter,
                metrics=self.metrics,
                table_cfg=cfg,
            )
        self.epochs.append(lin)

    def start(self, available_now: bool = True, processing_time: str | None = None):
        stream = self.source_df
        if stream is None:
            stream = read_events_stream(
                self.spark,
                self.events_dir,
                self.max_files_per_trigger,
                schema=PAYLOAD_EVENTS_SCHEMA if self.payload_format else None,
            )
        w = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"cdc-{self.stream_id}")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        elif processing_time:
            w = w.trigger(processingTime=processing_time)
        return w.start()

    def run_available_now(self, timeout_s: int = 600) -> list[dict[str, Any]]:
        """Drain everything currently in the event dir, then stop —
        Trigger.AvailableNow replay (the 10^10-logical-scale pattern:
        bounded reprocessing of an arbitrarily large backlog in
        maxFilesPerTrigger-sized micro-batches)."""
        q = self.start(available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        if self.metrics is not None:
            self.metrics.flush()  # drain the buffered lineage window
        if q.exception():
            raise q.exception()
        return list(self.epochs)


class MultiplexedCdcPipeline:
    """ONE streaming query serving N configured tables — the
    reference's single Event_Logs queue with per-event Table_ID
    dispatch (transfer_thread.rb:390,566-587), vs. one
    CdcStreamPipeline per table. At a many-table deployment N queries
    pay N× the per-trigger driver cost (offset log, file listing,
    micro-batch planning); one multiplexed query pays it once and
    dispatches inside the batch.

    Source shape: MULTIPLEX_EVENTS_SCHEMA — the payload Event_Logs row
    plus a ``table_name`` tag. Dispatch is a partition-pruning filter
    per configured table over ONE persisted batch (the parse runs only
    on that table's slice), then the table's own config chain
    (conditions / column flags / expressions / key handling) and its
    own sink:

      key_handling != 'N'  → apply_batch MERGE into its LakeTable
      key_handling == 'N'  → apply_batch_unkeyed append into its log

    Exactly-once composes per table: each sink fences (stream_id,
    epoch_id) in ITS OWN metadata, so a crash mid-dispatch replays the
    foreachBatch and already-applied tables skip while the rest apply —
    same contract as the reference's per-table Kafka transactions.

    Scope (north rule): all tables share the repo_files row shape and
    (repo, path) key — the reference analog is N configured tables all
    fed by the same trigger machinery; configs may differ arbitrarily.

    Rows tagged with an UNCONFIGURED table go to the dead-letter
    quarantine (the reference logs-and-skips events whose table config
    vanished mid-flight) instead of poisoning the stream.
    """

    def __init__(
        self,
        spark: SparkSession,
        config,
        sinks: dict[str, Any],
        events_dir: str,
        checkpoint_dir: str,
        stream_id: str = "cdc-mux",
        dead_letter_dir: str | None = None,
        metrics_dir: str | None = None,
        salted: bool = False,
        max_files_per_trigger: int | None = None,
        dispatch_parallelism: int | None = None,
        fs=None,
        source_df: DataFrame | None = None,
    ):
        missing = [n for n in config.tables if n not in sinks]
        if missing:
            raise ValueError(f"no sink for configured tables: {missing}")
        self.spark = spark
        self.config = config
        self.sinks = sinks
        self.events_dir = events_dir
        self.checkpoint_dir = checkpoint_dir
        self.stream_id = stream_id
        self.dead_letter = (
            DeadLetterTable(spark, dead_letter_dir, fs=fs) if dead_letter_dir else None
        )
        self.metrics = MetricsTable(spark, metrics_dir) if metrics_dir else None
        self.salted = salted
        self.max_files_per_trigger = max_files_per_trigger
        # same seam as CdcStreamPipeline.source_df: a pre-built
        # streaming frame in MULTIPLEX_EVENTS_SCHEMA (e.g. a tagged
        # Kafka inbound topic via sources/kafka) replaces the file read
        self.source_df = source_df
        # concurrent per-table dispatch: each table's apply is a chain
        # of INDEPENDENT Spark jobs plus driver-side metadata IO
        # (listing, commit, fence JSON) against ITS OWN sink; running
        # them serially leaves the cluster idle during every metadata
        # round-trip and every small job's tail. Driver-side threads
        # submitting concurrent jobs are the public Spark pattern for
        # this; the shared dead-letter/metrics appends are safe under it
        # (per-table stream ids + optimistic commit retry in
        # UnkeyedEventLog.append). Measured: 8 tables × tiny epochs run
        # ~3× faster dispatched concurrently (bench.py --mux-ab).
        self.dispatch_parallelism = dispatch_parallelism
        # bounded lineage window (newest EPOCH_HISTORY records); the
        # durable copy is MetricsTable
        self.epochs: deque[dict[str, Any]] = deque(maxlen=EPOCH_HISTORY)
        self._fs = fs
        # strays keep their own quarantine dir: they are queue-shaped
        # (payload + table_name), not event-shaped — mixing them into
        # the poison dead letters would corrupt that table's read schema
        self._dispatch_dl = None

    def set_config(self, config) -> None:
        """Live config swap between micro-batches (S12) — adding a
        table requires its sink to already be registered."""
        missing = [n for n in config.tables if n not in self.sinks]
        if missing:
            raise ValueError(f"no sink for configured tables: {missing}")
        self.config = config

    def reprocess_strays(self) -> dict[str, Any]:
        """Operator-initiated requeue of dispatch-quarantined rows
        (reference: POST /server_control/reprocess_final_errors,
        server_control_controller.rb:103-170 — the table-scoped
        requeue). The canonical heal: rows were quarantined because
        their table tag was unconfigured when they arrived; the
        operator registers the table (set_config) and reprocesses —
        rows whose tag is NOW configured re-dispatch through that
        table's normal config chain and sink, the rest (still-stray
        and NULL-tag rows) stay quarantined.

        Exactly-once across a crash between the sink applies and the
        quarantine rewrite: each table's apply fences on
        (stream_id=":reprocess", epoch_id=quarantine-log-version) in
        ITS OWN sink metadata, so a re-run of the same call no-ops the
        already-applied tables and only the rewrite re-runs."""
        from movex_cdc_spark.sources.events import parse_payload_events

        if self._dispatch_dl is None:
            if self.dead_letter is None:
                return {"reprocessed": 0, "remaining": 0, "tables": []}
            self._dispatch_dl = DeadLetterTable(
                self.spark, self.dead_letter.path + "_dispatch", fs=self._fs
            )
        df = self._dispatch_dl.read()
        if df is None:
            return {"reprocessed": 0, "remaining": 0, "tables": []}
        token = int(self._dispatch_dl.log.meta()["version"])
        # bounded probe: distinct tags <= configured tables + strays
        present = {
            r["table_name"] for r in df.select("table_name").distinct().collect()
        }
        healable = sorted(t for t in present if t in self.config.tables and t is not None)
        # one aggregate for all decision counts, taken BEFORE the
        # listing swap below invalidates this read's lineage (same
        # count-before-swap rule as RetryWorker.readmit)
        heal_pred = (
            F.col("table_name").isin(healable) if healable else F.lit(False)
        )
        counts = df.agg(
            F.sum(F.when(heal_pred, 1).otherwise(0)).alias("heal"),
            F.sum(F.when(~F.coalesce(heal_pred, F.lit(False)), 1).otherwise(0)).alias("stay"),
        ).first()
        n_reprocessed = int(counts["heal"] or 0)
        n_remaining = int(counts["stay"] or 0)
        for name in healable:
            cfg = self.config.tables[name]
            sub = parse_payload_events(df.filter(F.col("table_name") == name))
            stream = f"{self.stream_id}:{name}:reprocess"
            if cfg.key_handling == "N":
                apply_batch_unkeyed(
                    self.sinks[name], sub, epoch_id=token, stream_id=stream,
                    table_cfg=cfg, dead_letter=self.dead_letter,
                )
            else:
                apply_batch(
                    self.sinks[name], sub, epoch_id=token, stream_id=stream,
                    salted=self.salted, dead_letter=self.dead_letter,
                    metrics=self.metrics, table_cfg=cfg,
                )
        # NULL-tag rows must survive the rewrite: NULL.isin(...) is
        # NULL, and ~NULL filters the row out — an untagged row would
        # silently vanish from quarantine
        remaining = (
            df.filter(
                F.col("table_name").isNull()
                | ~F.col("table_name").isin(healable)
            )
            if healable
            else df
        )
        self._dispatch_dl.replace(remaining)
        return {
            "reprocessed": n_reprocessed,
            "remaining": n_remaining,
            "tables": healable,
        }

    def _apply(self, batch_df, epoch_id: int) -> None:
        from pyspark import StorageLevel

        from movex_cdc_spark.sources.events import parse_payload_events

        batch = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # bounded probe: distinct tags ≤ configured tables + strays
            # (the collect also builds the cache the dispatch slices)
            present = {
                r["table_name"] for r in batch.select("table_name").distinct().collect()
            }
            # a NULL tag is reachable from the tagged Kafka source (a
            # malformed wire record parses all-null): it can't be in
            # sorted() (None < str raises) and isin([None]) is NULL —
            # matching nothing — so it gets its own predicate branch.
            has_null_tag = None in present
            strays = sorted(present - set(self.config.tables) - {None})
            stray_pred = (
                F.col("table_name").isin(strays) if strays else F.lit(False)
            )
            if has_null_tag:
                stray_pred = stray_pred | F.col("table_name").isNull()
            n_strays = 0
            if strays or has_null_tag:
                if self.dead_letter is not None:
                    if self._dispatch_dl is None:
                        self._dispatch_dl = DeadLetterTable(
                            self.spark, self.dead_letter.path + "_dispatch", fs=self._fs
                        )
                    n_strays = self._dispatch_dl.append(
                        batch.filter(stray_pred).withColumn(
                            "error_msg",
                            F.when(
                                F.col("table_name").isNull(),
                                F.lit("missing table tag"),
                            ).otherwise(F.lit("unconfigured table")),
                        ),
                        stream_id=f"{self.stream_id}-dispatch",
                        epoch_id=epoch_id,
                    )
                else:
                    # no quarantine dir: the rows are still DROPPED, and
                    # the epoch lineage must say so — a silent
                    # n_strays=0 would hide the data loss
                    n_strays = batch.filter(stray_pred).count()
            def _dispatch_one(name: str, cfg) -> dict[str, Any]:
                sub = parse_payload_events(
                    batch.filter(F.col("table_name") == name)
                )
                # per-table stream id: the shared dead-letter log and
                # metrics table fence on (stream_id, epoch_id), so N
                # tables appending under ONE id would let the first
                # table's append fence out every other table's poison
                # in the same epoch (the append runs even when poison is
                # empty, by design — see _apply_prepared)
                tbl_stream_id = f"{self.stream_id}:{name}"
                if cfg.key_handling == "N":
                    return apply_batch_unkeyed(
                        self.sinks[name],
                        sub,
                        epoch_id=epoch_id,
                        stream_id=tbl_stream_id,
                        table_cfg=cfg,
                        dead_letter=self.dead_letter,
                    )
                return apply_batch(
                    self.sinks[name],
                    sub,
                    epoch_id=epoch_id,
                    stream_id=tbl_stream_id,
                    salted=self.salted,
                    dead_letter=self.dead_letter,
                    metrics=self.metrics,
                    table_cfg=cfg,
                )

            todo = [(n, c) for n, c in self.config.tables.items() if n in present]
            workers = self.dispatch_parallelism or min(len(todo), 8) or 1
            per_table: dict[str, dict[str, Any]] = {}
            if workers > 1 and len(todo) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=workers) as pool:
                    futures = {n: pool.submit(_dispatch_one, n, c) for n, c in todo}
                # deterministic config order in the lineage record; the
                # first failure propagates and fails the epoch (replay
                # re-runs every table; applied ones fence to no-ops)
                for n, _c in todo:
                    per_table[n] = futures[n].result()
            else:
                for n, c in todo:
                    per_table[n] = _dispatch_one(n, c)
            self.epochs.append(
                {"epoch_id": epoch_id, "tables": per_table, "n_strays": n_strays}
            )
        finally:
            batch.unpersist()

    def start(self, available_now: bool = True, processing_time: str | None = None):
        from movex_cdc_spark.sources.events import MULTIPLEX_EVENTS_SCHEMA

        stream = self.source_df
        if stream is None:
            stream = read_events_stream(
                self.spark,
                self.events_dir,
                self.max_files_per_trigger,
                schema=MULTIPLEX_EVENTS_SCHEMA,
            )
        w = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"cdc-{self.stream_id}")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        elif processing_time:
            w = w.trigger(processingTime=processing_time)
        return w.start()

    def run_available_now(self, timeout_s: int = 600) -> list[dict[str, Any]]:
        q = self.start(available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        if self.metrics is not None:
            self.metrics.flush()
        if q.exception():
            raise q.exception()
        return list(self.epochs)
