"""The apply pipeline: change batch → lake-table MERGE.

This is the Spark shape of the reference's hot path
(transfer_thread.rb:53-99):

    events → condition filter → no-op suppression → poison split →
    [schema evolve] → LWW dedup (salted if skewed) → MERGE →
    dead-letter append → lineage record

One micro-batch = one call; Structured Streaming drives it via
``foreachBatch`` (streaming/pipeline.py), batch replay drives it
directly.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movex_cdc_spark.functions.hashing import sha256_builtin, content_sha256
from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.filters import (
    bad_op_predicate,
    condition_filter,
    default_exclude_condition,
    per_op_condition_filter,
    poison_predicate,
    split_poison,
    suppress_noop_updates,
)
from movex_cdc_spark.operators.lww import lww_dedup, lww_dedup_maxby, lww_dedup_salted

REPO_FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

KEY_COLS = ["repo", "path"]


def _filter_validate_project(
    events: DataFrame,
    condition_sql: str | None,
    table_cfg: "object | None",
) -> tuple[DataFrame, DataFrame]:
    """Shared capture-side chain: condition filter → no-op suppression →
    poison split → (config projection + expressions). Validation and
    no-op checks see the ORIGINAL row, as the reference trigger does;
    projection shapes only the captured payload."""
    if table_cfg is not None:
        df = per_op_condition_filter(events, table_cfg.conditions)
    else:
        df = condition_filter(events, condition_sql or default_exclude_condition())
    df = suppress_noop_updates(df)
    # NOTE: deliberately NOT persisted HERE. The poison chain re-scans
    # the batch; for micro-batches the streaming pipeline persists the
    # parsed batch around this whole chain (MEMORY_AND_DISK, +15%
    # measured), while full-backlog batch replays are cheaper re-scanned
    # (measured: MEMORY_ONLY caching of 16M rows cost more in GC/memory
    # pressure than the rescan saved).
    valid, poison = split_poison(df)
    if table_cfg is not None:
        # P1/P2 projection + column_expressions (may reference ts/txid/
        # old_content, so this runs before any slim select)
        valid = table_cfg.apply_projection(valid)
    return valid, poison


def prepare_batch(
    events: DataFrame,
    condition_sql: str | None = None,
    salted: bool = False,
    use_pandas_sha: bool = False,
    lww_mode: str = "maxby",
    table_cfg: "object | None" = None,
) -> tuple[DataFrame, DataFrame]:
    """Filters + config projection + LWW + sha256.
    Returns (ready_batch, poison_rows).

    All column work is JVM-side expressions except the optional
    pandas_udf sha path; either way content hashing is vectorized.

    table_cfg (config.table_config.TableCfg): when given, the batch is
    compiled exactly like the reference compiles its capture triggers
    (db_trigger_generator_oracle.rb:98-238):
      * per-op trigger conditions (P3) replace ``condition_sql``
      * per-op column flags null un-logged payload columns (P1/P2)
      * column_expressions add computed payload columns (§2.10)
    Projection runs AFTER validation/no-op checks (those see the
    original row, as the trigger does) and BEFORE LWW, so the winning
    row per key carries the configured payload shape.

    lww_mode:
      maxby  (default) — map-side-combining aggregate; minimal shuffle,
               skew-proof (see lww_dedup_maxby)
      window — row_number window (reference-shaped, full shuffle)
      salted is honored for window mode; maxby needs no salt (its
      partial combine already bounds hot keys).
    """
    valid, poison = _filter_validate_project(events, condition_sql, table_cfg)
    # shuffle hygiene: only key/seq/op/payload cross the wire — the
    # old-image and bookkeeping columns were only needed by the filters
    keep = [c for c in valid.columns if c not in ("old_content", "ts", "txid", "is_noop")]
    slim = valid.select(*keep)
    if lww_mode == "maxby":
        dedup = lww_dedup_maxby(slim, KEY_COLS)
    elif salted:
        dedup = lww_dedup_salted(slim, KEY_COLS)
    else:
        dedup = lww_dedup(slim, KEY_COLS)
    sha = content_sha256(F.col("content")) if use_pandas_sha else sha256_builtin("content")
    ready = dedup.withColumn("content_sha", F.when(F.col("content").isNotNull(), sha))
    return ready, poison


POISON_FLAG = "__poison"


def flag_dispositions(
    events: DataFrame, condition_sql: str | None = None
) -> DataFrame:
    """Single-projection disposition pass for the streaming cache:
    condition filter + no-op suppression applied, poison rows FLAGGED
    (not split), ``old_content`` dropped — it is only consumed by the
    no-op check, and at ~the payload's size it is the single biggest
    column in the micro-batch cache. The caller persists the result and
    slices valid/poison off the cache with cheap filters, so the JSON
    parse and the cache write each happen exactly once per micro-batch
    (previously the full batch was cached old-image and all, and the
    poison split re-scanned it).

    Only valid for the config-less path: table-config projection and
    envelope assembly may reference ``old_content``, so the pipeline
    falls back to caching the full parsed batch when either is present.
    """
    df = condition_filter(events, condition_sql or default_exclude_condition())
    df = suppress_noop_updates(df)
    return df.withColumn(POISON_FLAG, poison_predicate()).drop("old_content")


def split_flagged(flagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, poison) slices of a ``flag_dispositions`` frame —
    mirror of ``split_poison`` over the persisted cache."""
    valid = flagged.filter(~F.col(POISON_FLAG)).drop(POISON_FLAG)
    poison = (
        flagged.filter(F.col(POISON_FLAG))
        .drop(POISON_FLAG)
        .withColumn(
            "error_msg",
            # same diagnosis rule as split_poison: the dead-letter
            # record must name the actual defect on both paths
            F.when(
                bad_op_predicate(), F.lit("unknown operation")
            ).otherwise(F.lit("null content on insert/update")),
        )
    )
    return valid, poison


def apply_batch_flagged(
    table: LakeTable,
    flagged: DataFrame,
    epoch_id: int | None = None,
    stream_id: str = "default",
    dead_letter: "DeadLetterTable | None" = None,
    metrics: "object | None" = None,
    lww_mode: str = "maxby",
) -> dict[str, Any]:
    """apply_batch over a pre-flagged (cached) micro-batch — the
    streaming fast path; filters already ran in flag_dispositions.

    ONE probe job over the cached batch carries everything the driver
    needs before the merge write: the touched-bucket set + null-key
    presence (valid rows), the A1 counters, and the poison count. The
    dead-letter append then runs ONLY when there is poison to
    quarantine — previously every epoch paid a poison-filter scan plus
    an EMPTY segment write and a metadata commit (r8 phase timing:
    part of the ~2 s dl_append_s per 1M-event epoch). Skipping the
    empty append is safe: the dead-letter fence is consulted through
    monotone epoch ids, and an epoch that appended nothing leaves
    nothing to fence or replay. Sinks without bucket pruning
    (MergeOnReadTable) keep the generic flow — for them the probe job
    would be pure extra work."""
    t0 = time.monotonic()
    valid, poison = split_flagged(flagged)
    if "old_content" not in poison.columns:
        # flag_dispositions dropped the old image from the cache (its
        # only consumer was the no-op check). Quarantined rows keep the
        # EVENT_COLS shape with old_content explicitly NULL so the
        # dead-letter schema stays union-stable across paths and
        # RetryWorker's re-validation chain resolves every column — the
        # old image was simply not retained for quarantine (documented
        # fidelity trade of the slim cache).
        poison = poison.withColumn("old_content", F.lit(None).cast("string"))
    keep = [c for c in valid.columns if c not in ("old_content", "ts", "txid", "is_noop")]
    slim = valid.select(*keep)
    dedup = lww_dedup_maxby(slim, KEY_COLS) if lww_mode == "maxby" else lww_dedup(slim, KEY_COLS)
    ready = dedup.withColumn(
        "content_sha",
        F.when(F.col("content").isNotNull(), sha256_builtin("content")),
    )
    if not getattr(table, "supports_prune_source", False):
        return _apply_prepared(
            table, ready, poison, epoch_id, stream_id, dead_letter, metrics,
            evolve=True, obs_t0=t0,
        )
    from movex_cdc_spark.lake.table import bucket_expr

    m = table.meta()
    if epoch_id is not None:
        last = m["epochs"].get(stream_id)
        if last is not None and epoch_id <= last:
            # Replayed epoch: the merge is fenced. Only the dead-letter
            # append may still be pending (crash between its commit and
            # the table commit) — its OWN fence resolves that without
            # any probe job here (append checks its metadata before
            # touching the batch).
            if dead_letter is not None:
                dead_letter.append(poison, stream_id=stream_id, epoch_id=epoch_id)
            return {"skipped": True, "stream_id": stream_id, "epoch_id": epoch_id}

    batch_payload = T.StructType(
        [f for f in ready.schema.fields
         if f.name not in ("seq", "op", "old_content", "ts", "txid", "is_noop")]
    )
    table.evolve_schema(batch_payload)

    key_cols = m["key_cols"]
    null_key_pred = None
    for k in key_cols:
        p = F.col(k).isNull()
        null_key_pred = p if null_key_pred is None else (null_key_pred | p)
    ok = ~F.col(POISON_FLAG)
    obs = Observation(f"apply_{stream_id}_{epoch_id}_{time.monotonic_ns()}")
    _t = time.monotonic()
    # counters are valid-only (same valid_events_pre_dedup scope as
    # before — the observation used to ride the valid slice); poison
    # rows flow through the observe node and are counted separately,
    # then filtered before the bucket distinct
    probe_rows = (
        flagged.select(POISON_FLAG, "seq", "op", *key_cols)
        .observe(
            obs,
            F.sum(ok.cast("long")).alias("events"),
            F.max(F.when(ok, F.col("seq"))).alias("max_seq"),
            F.sum(F.when(ok & (F.col("op") == "I"), 1).otherwise(0)).alias("n_insert"),
            F.sum(F.when(ok & (F.col("op") == "U"), 1).otherwise(0)).alias("n_update"),
            F.sum(F.when(ok & (F.col("op") == "D"), 1).otherwise(0)).alias("n_delete"),
            F.sum(F.col(POISON_FLAG).cast("long")).alias("n_poison_seen"),
        )
        .filter(ok)
        .select(
            bucket_expr(key_cols, m["n_buckets"]).alias("__b"),
            null_key_pred.alias("__nk"),
        )
        .distinct()
        .collect()
    )
    probe_wall = round(time.monotonic() - _t, 4)
    got = obs.get
    touched = sorted({r["__b"] for r in probe_rows})
    has_null_keys = any(r["__nk"] for r in probe_rows)

    n_poison = 0
    dl_wall = 0.0
    dl_t0 = time.monotonic()
    dl_future = None
    pool = None
    if dead_letter is not None and int(got.get("n_poison_seen") or 0) > 0:
        # The append reads the already-built cache and writes a small
        # segment — independent Spark jobs from the merge's join+write,
        # so run it CONCURRENTLY from a driver thread (guide §2.6) and
        # join it at merge's pre_commit barrier: the poison commit
        # still durably precedes the table commit (same crash ordering
        # as the serial form — a crash between the two replays only
        # the fenced append), but its wall overlaps the snapshot write
        # instead of adding to the epoch.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        dl_future = pool.submit(
            dead_letter.append, poison, stream_id=stream_id, epoch_id=epoch_id
        )

    try:
        if not touched:
            lineage: dict[str, Any] = {"skipped": True, "reason": "empty batch"}
            if dl_future is not None:
                n_poison = dl_future.result()
        else:
            lineage = table.merge(
                ready,
                seq_col="seq",
                op_col="op",
                stream_id=stream_id,
                epoch_id=epoch_id,
                probe=(touched, has_null_keys),
                pre_commit=dl_future.result if dl_future is not None else None,
            )
            if dl_future is not None:
                n_poison = dl_future.result()  # already done (pre_commit barrier)
        if dl_future is not None:
            dl_wall = round(time.monotonic() - dl_t0, 4)
    finally:
        if pool is not None:
            pool.shutdown(wait=True)
    lineage["merge_latency_s"] = round(time.monotonic() - t0, 4)
    lineage["n_poison"] = n_poison
    timings = lineage.setdefault("timings", {})
    timings["probe_s"] = probe_wall  # the external probe, not merge's
    if dead_letter is not None:
        timings["dl_append_s"] = dl_wall  # overlapped with the write
    if lineage.get("skipped"):
        return lineage
    lineage["counter_scope"] = "valid_events_pre_dedup"
    if metrics is not None:
        metrics.append(
            {
                "stream_id": stream_id,
                "epoch_id": epoch_id,
                "table_version": lineage.get("version"),
                "events": got.get("events"),
                "n_insert": got.get("n_insert"),
                "n_update": got.get("n_update"),
                "n_delete": got.get("n_delete"),
                "n_poison": n_poison,
                "max_seq": got.get("max_seq"),
                "buckets_touched": len(lineage.get("buckets_touched", [])),
                "merge_latency_s": lineage["merge_latency_s"],
                "counter_scope": "valid_events_pre_dedup",
            }
        )
        lineage["metrics"] = got
    return lineage


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    epoch_id: int | None = None,
    stream_id: str = "default",
    condition_sql: str | None = None,
    salted: bool = False,
    dead_letter: "DeadLetterTable | None" = None,
    metrics: "object | None" = None,
    evolve: bool = True,
    use_pandas_sha: bool = False,
    lww_mode: str = "maxby",
    table_cfg: "object | None" = None,
) -> dict[str, Any]:
    """Apply one micro-batch of change events with exactly-once fencing.

    ``table_cfg`` compiles capture config (conditions / projection /
    expressions) into the batch plan — see prepare_batch. A config that
    adds expression columns triggers schema evolution on the lake table
    before the merge (ALTER-before-MERGE)."""
    t0 = time.monotonic()
    ready, poison = prepare_batch(
        events, condition_sql=condition_sql, salted=salted,
        use_pandas_sha=use_pandas_sha, lww_mode=lww_mode, table_cfg=table_cfg,
    )
    return _apply_prepared(
        table, ready, poison, epoch_id, stream_id, dead_letter, metrics, evolve, obs_t0=t0
    )


def _apply_prepared(table, ready, poison, epoch_id, stream_id, dead_letter, metrics,
                    evolve, obs_t0, prune_source=None):
    t0 = obs_t0
    if evolve:
        batch_payload = T.StructType(
            [f for f in ready.schema.fields if f.name not in ("seq", "op", "old_content", "ts", "txid", "is_noop")]
        )
        table.evolve_schema(batch_payload)

    # single-pass metrics riding a job the batch already runs — no
    # extra scan (reference A1 statistics counters,
    # statistic_counter.rb:14-48; the partial->final combine is Spark's
    # own partial aggregation)
    obs = Observation(f"apply_{stream_id}_{epoch_id}_{time.monotonic_ns()}")
    obs_aggs = [
        F.count(F.lit(1)).alias("events"),
        F.max("seq").alias("max_seq"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_update"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_delete"),
    ]
    # A sink that ignores prune_source (MergeOnReadTable) never runs the
    # probe — attaching the observation there would block obs.get
    # forever. Only use the probe when the sink actually consumes it.
    use_probe = prune_source is not None and getattr(
        table, "supports_prune_source", False
    )
    if use_probe:
        # Probe path: the observation rides the bucket-probe COLLECT,
        # counting valid captured events pre-LWW (exactly what the
        # reference's per-event transfer counters count). It must NOT
        # ride `ready` here: with the probe, `ready`'s only action is
        # the COW snapshot write (AQE multi-branch join + partitionBy)
        # inside the streaming micro-batch, and that specific write
        # does not deliver observed metrics — obs.get deadlocked the
        # stream (reproduced twice). Simple append writes DO deliver
        # them in foreachBatch (the MoR row count and the envelope-sink
        # reject count have ridden their append writes since round 2),
        # so the failure is the AQE snapshot-write shape, not writes in
        # general — but the probe collect is the safe, always-runs
        # carrier here.
        prune_source = prune_source.observe(obs, *obs_aggs)
        counter_scope = "valid_events_pre_dedup"
    else:
        prune_source = None  # an ignored probe must carry no work
        ready = ready.observe(obs, *obs_aggs)
        counter_scope = "deduped_keys"

    n_poison = 0
    dl_wall = 0.0
    if dead_letter is not None:
        # Append poison rows BEFORE the merge commit: a crash between the
        # two can only replay the append, never lose it — and the dead
        # letter log's OWN (stream_id, epoch_id) fence makes the replay a
        # metadata no-op, so quarantine rows are exactly-once, like the
        # reference's final-errors path (transfer_thread.rb:468-491).
        # Runs even when the merge will be empty — a batch can be ALL
        # poison.
        _t = time.monotonic()
        n_poison = dead_letter.append(poison, stream_id=stream_id, epoch_id=epoch_id)
        dl_wall = round(time.monotonic() - _t, 4)

    lineage = table.merge(
        ready,
        seq_col="seq",
        op_col="op",
        stream_id=stream_id,
        epoch_id=epoch_id,
        prune_source=prune_source,
    )
    lineage["merge_latency_s"] = round(time.monotonic() - t0, 4)
    lineage["n_poison"] = n_poison
    if dead_letter is not None:
        # the dead-letter append is the batch's FIRST action, so its
        # wall includes materializing the micro-batch cache — recorded
        # next to merge's per-phase timings for epoch-cost adjudication.
        # NOTE: this and commit_s ride the RETURNED lineage record (the
        # driver's epochs list / logs); the lineage row serialized into
        # the table metadata is frozen before the commit finishes, so
        # it carries only the pre-commit phases (probe/write/listing).
        lineage.setdefault("timings", {})["dl_append_s"] = dl_wall
    if lineage.get("skipped"):
        return lineage
    # Counter semantics differ by attach point and are recorded, never
    # mixed silently: the probe path counts valid captured EVENTS
    # pre-LWW (reference statistic_counter semantics); the generic and
    # MoR paths count post-LWW deduped KEYS (the rows actually merged).
    lineage["counter_scope"] = counter_scope
    if metrics is not None:
        got = obs.get
        metrics.append(
            {
                "stream_id": stream_id,
                "epoch_id": epoch_id,
                "table_version": lineage.get("version"),
                "events": got.get("events"),
                "n_insert": got.get("n_insert"),
                "n_update": got.get("n_update"),
                "n_delete": got.get("n_delete"),
                "n_poison": n_poison,
                "max_seq": got.get("max_seq"),
                "buckets_touched": len(lineage.get("buckets_touched", [])),
                "merge_latency_s": lineage["merge_latency_s"],
                "counter_scope": counter_scope,
            }
        )
        lineage["metrics"] = got
    return lineage


def apply_batch_unkeyed(
    log,
    events: DataFrame,
    epoch_id: int | None = None,
    stream_id: str = "default",
    condition_sql: str | None = None,
    table_cfg: "object | None" = None,
    dead_letter: "DeadLetterTable | None" = None,
) -> dict[str, Any]:
    """S5 unkeyed path (key_handling='N'): validated, projected events
    are APPENDED in arrival order — no LWW collapse, no merge — exactly
    the reference's keyless produce with relaxed ordering
    (transfer_thread.rb:331-347). ``log`` is a lake.append_log.
    UnkeyedEventLog; the epoch fence lives in its atomic commit."""
    t0 = time.monotonic()
    valid, poison = _filter_validate_project(events, condition_sql, table_cfg)
    keep = [c for c in valid.columns if c not in ("old_content", "is_noop")]
    valid = valid.select(*keep)
    if table_cfg is not None:
        # msg_key column materialized for the envelope/sink contract;
        # NULL for mode 'N' (consumers must not assume per-key order)
        valid = valid.withColumn("msg_key", table_cfg.key_column())
    n_poison = 0
    if dead_letter is not None:
        n_poison = dead_letter.append(poison, stream_id=stream_id, epoch_id=epoch_id)
    lineage = log.append(valid, stream_id=stream_id, epoch_id=epoch_id)
    lineage["n_poison"] = n_poison
    lineage["merge_latency_s"] = round(time.monotonic() - t0, 4)
    return lineage


def envelope_timestamp(
    ts, legacy_ts_format: str | None = None, tz_offset: str = "+00:00"
):
    """The reference's three envelope timestamp formats, selected per
    config exactly like MovexCdc::Application.config.legacy_ts_format
    (transfer_thread.rb:520-536):

      * ``None`` (default) — ISO 8601, 6-digit fraction with DOT
        delimiter, configured DB timezone WITH colon:
        ``2020-02-27T12:50:42.123456+00:00``
      * ``'TYPE_1'`` — COMMA fraction delimiter, timezone WITHOUT
        colon: ``2020-02-27T12:50:42,123456+0000``
      * ``'TYPE_2'`` — COMMA fraction delimiter, timezone WITH colon:
        ``2020-02-27T12:50:42,123456+00:00``

    ``tz_offset`` is the db_default_timezone analog. It is not just a
    label: the wall time is CONVERTED into that zone before the offset
    is appended (``from_utc_timestamp``), so the rendered instant is
    the event's actual instant — appending a raw "-05:00" to a UTC
    wall time would shift every consumer-parsed timestamp by 5 hours.
    Events' ``ts`` is UTC (the engine session zone, session.py)."""
    if tz_offset != "+00:00":
        ts = F.from_utc_timestamp(ts, tz_offset)
    base = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    micros = F.date_format(ts, "SSSSSS")
    if legacy_ts_format is None:
        return F.concat(base, F.lit("."), micros, F.lit(tz_offset))
    if legacy_ts_format == "TYPE_1":
        return F.concat(base, F.lit(","), micros, F.lit(tz_offset.replace(":", "")))
    if legacy_ts_format == "TYPE_2":
        return F.concat(base, F.lit(","), micros, F.lit(tz_offset))
    raise ValueError(f"Unknown legacy timestamp format {legacy_ts_format!r}")


def with_envelope(df: DataFrame, schema_name: str = "public",
                  table_name: str = "repo_files",
                  cloudevents: bool = False,
                  legacy_ts_format: str | None = None,
                  tz_offset: str = "+00:00") -> DataFrame:
    """Message envelope assembly (SURVEY P7/P8; reference
    transfer_thread.rb:493-536,659-679): id/schema/table/operation-long/
    ISO timestamp/transaction id, optionally CloudEvents ce_* headers.
    ``legacy_ts_format`` selects the reference's legacy timestamp
    variants (see envelope_timestamp)."""
    out = df.select(
        F.col("seq").alias("id"),
        F.lit(schema_name).alias("schema_name"),
        F.lit(table_name).alias("table_name"),
        F.when(F.col("op") == "I", "INSERT")
        .when(F.col("op") == "U", "UPDATE")
        .when(F.col("op") == "D", "DELETE")
        .otherwise("INIT")
        .alias("operation"),
        envelope_timestamp(F.col("ts"), legacy_ts_format, tz_offset).alias("timestamp"),
        F.col("txid").alias("transaction_id"),
        F.to_json(F.struct("repo", "path", "commit", "lang", "content")).alias("new_payload"),
        F.to_json(F.struct(F.col("old_content").alias("content"))).alias("old_payload"),
        F.to_json(F.struct("repo", "path")).alias("msg_key"),
        *df.columns,
    )
    if cloudevents:
        out = (
            out.withColumn("ce_id", F.concat_ws("-", F.lit(table_name), F.col("seq")))
            .withColumn("ce_source", F.lit(f"spark://movex-cdc/{schema_name}/{table_name}"))
            .withColumn("ce_specversion", F.lit("1.0"))
            .withColumn("ce_type", F.concat(F.lit("cdc."), F.lower(F.col("operation"))))
            .withColumn("ce_time", F.col("timestamp"))
        )
    return out


class DeadLetterTable:
    """Append-only quarantine for poison rows (reference S11:
    Event_Log_Final_Errors, transfer_thread.rb:468-491) with
    retry bookkeeping (S7/ST5: retry_count, exponential backoff).

    Backed by an epoch-fenced UnkeyedEventLog: the append commits
    atomically per (stream_id, epoch_id), so a replayed Structured
    Streaming epoch is a metadata no-op — quarantine rows are written
    exactly once even though the append runs BEFORE the merge commit
    (the crash window between the two stays loss-free AND
    duplicate-free)."""

    def __init__(self, spark, path: str, fs=None):
        from movex_cdc_spark.lake.append_log import UnkeyedEventLog
        from movex_cdc_spark.lake.fs import DEFAULT_FS

        self.spark = spark
        self.path = path
        fs = fs or DEFAULT_FS
        try:
            self.log = UnkeyedEventLog.load(spark, path, fs=fs)
        except FileNotFoundError:
            # only a MISSING log may be created; a dir that holds data
            # but no _meta is a legacy/foreign store — creating an empty
            # log over it would silently orphan its rows. Any other load
            # error (corrupt metadata) propagates as-is.
            if fs.isdir(path) and any(
                f.endswith(".parquet") for f in fs.listdir(path)
            ):
                raise ValueError(
                    f"{path} holds parquet files but no log metadata — "
                    "not re-initializing over existing quarantine data"
                )
            self.log = UnkeyedEventLog.create(spark, path, fs=fs)

    def append(self, poison: DataFrame, stream_id: str, epoch_id: int | None) -> int:
        out = (
            poison.withColumn("retry_count", F.lit(0))
            .withColumn("last_error_time", F.current_timestamp())
            .withColumn("stream_id", F.lit(stream_id))
            .withColumn("epoch_id", F.lit(epoch_id).cast("long"))
        )
        obs = Observation(f"dl_{stream_id}_{epoch_id}_{time.monotonic_ns()}")
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        lineage = self.log.append(out, stream_id=stream_id, epoch_id=epoch_id)
        if lineage.get("skipped"):
            return 0  # fenced replay: rows already quarantined
        return int(obs.get.get("n", 0))

    def replace(self, df: DataFrame) -> None:
        """Atomic rewrite for the retry pass (healed rows out,
        still-poison rows back with retry_count+1)."""
        self.log.replace(df)

    def read(self) -> DataFrame:
        df = self.log.read()
        if not df.columns:
            return None  # nothing dead-lettered yet
        return df

    def retry_eligible(self, start_delay_s: int = 20) -> DataFrame:
        """Rows whose exponential backoff has elapsed (reference S7:
        retry_count=0 OR last_error_time + start_delay*3^(retry-1) < now,
        transfer_thread.rb:358-371)."""
        df = self.read()
        if df is None:
            return None
        backoff = F.expr(
            f"last_error_time + make_interval(0,0,0,0,0,0, {start_delay_s} * pow(3, retry_count - 1))"
        )
        return df.filter((F.col("retry_count") == 0) | (backoff < F.current_timestamp()))
