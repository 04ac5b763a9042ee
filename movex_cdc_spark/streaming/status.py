"""Consolidated engine health/status surface — the analog of the
reference's operational endpoints (``/health_check/status``,
health_check_controller.rb — 337 lines of thread/connection/queue
introspection — and the worker-control routes, config/routes.rb:22-25).

Everything here is a READ over state the engine already persists:
MetricsTable lineage, the lake table's committed version, the
single-writer heartbeat file, the dead-letter/quarantine logs, and the
event source directory. No new bookkeeping, no extra write path — a
status probe must never be able to break the pipeline it watches.

PAGE-ON-THIS FIELDS (the deployment alert list; everything else is
context for the responder):

  ==========================  ===========================================
  field                       alert when
  ==========================  ===========================================
  heartbeat.fresh             false while a pipeline SHOULD be running —
                              the instance died or never started
  streams[*].last_epoch_age_s > trigger interval × slack — the stream is
                              stalled (stuck batch, dead source)
  queue.lag_events            growing across probes — ingest is outrunning
                              apply; add capacity or raise the trigger cap
  dead_letter.rows            growing — a poison source upstream
                              (reference: final Event_Log_Final_Errors)
  dead_letter.quarantine_*    growing — envelope/dispatch contract
                              violations (schema drift, stray tables)
  streams[*].events_per_sec   sustained drop vs baseline — perf
                              regression or key skew
  ==========================  ===========================================

Scale shape: the metrics read is O(epochs-retained) over a tiny parquet
dir; the heartbeat is one metadata read; dead-letter counts are
metadata-listing-sized logs; the queue-lag count is a parquet scan with
``seq > max_applied`` pushed into row-group stats, so a fully-drained
backlog prunes to zero row groups — cost ∝ actual lag, not history.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stream_summaries(spark: SparkSession, metrics_dir: str) -> list[dict[str, Any]]:
    """Per-stream rollup of the MetricsTable lineage: totals plus the
    LAST epoch's vitals (max_by on epoch_id — one aggregate, O(streams)
    result)."""
    from movex_cdc_spark.streaming.lineage import MetricsTable

    df = MetricsTable(spark, metrics_dir).read()
    if df is None:
        return []
    rows = (
        df.groupBy("stream_id")
        .agg(
            F.count(F.lit(1)).alias("epochs"),
            F.sum("events").alias("events_total"),
            F.sum("n_insert").alias("n_insert"),
            F.sum("n_update").alias("n_update"),
            F.sum("n_delete").alias("n_delete"),
            F.sum("n_poison").alias("n_poison"),
            F.max("max_seq").alias("max_seq"),
            F.max("epoch_id").alias("last_epoch_id"),
            F.max("table_version").alias("table_version"),
            F.max_by("end_ts", "epoch_id").alias("last_end_ts"),
            F.max_by("merge_latency_s", "epoch_id").alias("last_latency_s"),
            F.max_by("events", "epoch_id").alias("last_events"),
            F.max_by("counter_scope", "epoch_id").alias("counter_scope"),
        )
        .collect()
    )
    out = []
    now = time.time()
    for r in rows:
        d = r.asDict()
        last_ts = d.pop("last_end_ts")
        lat = d.pop("last_latency_s")
        last_events = d.pop("last_events")
        d["last_epoch_age_s"] = (
            round(now - last_ts.timestamp(), 1) if last_ts is not None else None
        )
        d["events_per_sec"] = (
            round(last_events / lat, 1) if lat and last_events is not None else None
        )
        out.append(d)
    return sorted(out, key=lambda d: d["stream_id"])


def _log_rows(spark: SparkSession, path: str, fs) -> int | None:
    """Row count of an UnkeyedEventLog-backed store (dead letter /
    quarantine); None when the log does not exist. The count scans only
    the committed listing — these logs are poison-sized, not data-sized."""
    from movex_cdc_spark.lake.append_log import UnkeyedEventLog

    try:
        return UnkeyedEventLog.load(spark, path, fs=fs).read().count()
    except FileNotFoundError:
        return None


def engine_status(
    spark: SparkSession,
    *,
    metrics_dir: str | None = None,
    table_dir: str | None = None,
    checkpoint_home: str | None = None,
    dead_letter_dir: str | None = None,
    events_dir: str | None = None,
    heartbeat_stale_s: int = 120,
    control_file: str | None = None,
    fs=None,
) -> dict[str, Any]:
    """One consolidated status document (the /health_check/status
    analog). Every section degrades to ``None``/absent when its input
    is not configured — a minimal deployment still gets a useful probe.
    See the module docstring for the page-on-this field list."""
    from movex_cdc_spark.lake.fs import DEFAULT_FS

    fs = fs or DEFAULT_FS
    status: dict[str, Any] = {"probe_ts": time.time()}

    streams = _stream_summaries(spark, metrics_dir) if metrics_dir else []
    status["streams"] = streams
    max_applied = max(
        (s["max_seq"] for s in streams if s["max_seq"] is not None), default=None
    )

    if table_dir is not None:
        from movex_cdc_spark.lake.table import LakeTable

        try:
            t = LakeTable.load(spark, table_dir, fs=fs)
            status["table"] = {
                "version": t.current_version(),
                "exists": True,
            }
        except FileNotFoundError:
            status["table"] = {"version": None, "exists": False}

    if checkpoint_home is not None:
        hb_path = checkpoint_home.rstrip("/") + "/_heartbeat.json"
        try:
            hb = json.loads(fs.read_text(hb_path))
            age = time.time() - hb.get("ts", 0)
            status["heartbeat"] = {
                "instance": hb.get("instance"),
                "age_s": round(age, 1),
                "fresh": age < heartbeat_stale_s,
            }
        except (FileNotFoundError, json.JSONDecodeError):
            status["heartbeat"] = {"instance": None, "age_s": None, "fresh": False}

    if dead_letter_dir is not None:
        status["dead_letter"] = {
            "rows": _log_rows(spark, dead_letter_dir, fs),
            # the pipelines' sibling quarantines (envelope-shaped and
            # dispatch-stray rows keep their own dirs — see
            # streaming/pipeline.py)
            "quarantine_envelope_rows": _log_rows(
                spark, dead_letter_dir + "_envelope", fs
            ),
            "quarantine_dispatch_rows": _log_rows(
                spark, dead_letter_dir + "_dispatch", fs
            ),
        }

    if control_file is not None:
        # the GET half of /server_control: the current control doc
        # (desired state), next to the observed state above
        from movex_cdc_spark.streaming.control import ServerControl

        status["control"] = ServerControl(control_file, fs=fs).read()

    if events_dir is not None:
        try:
            ev = spark.read.parquet(events_dir)
            if max_applied is None:
                lag = ev.count()
            else:
                # seq > max_applied prunes on parquet row-group stats:
                # a drained backlog costs ~nothing to probe
                lag = ev.filter(F.col("seq") > F.lit(max_applied)).count()
            status["queue"] = {"lag_events": lag, "max_applied_seq": max_applied}
        except Exception:
            status["queue"] = {"lag_events": None, "max_applied_seq": max_applied}

    return status


# deterministic per-stream projection of the status document — the
# registered-query/page-integration shape (timing fields live only in
# the dict: walls and ages are real but not oracle-checkable)
STATUS_FRAME_COLS = [
    "stream_id",
    "epochs",
    "events_total",
    "n_insert",
    "n_update",
    "n_delete",
    "n_poison",
    "max_seq",
    "last_epoch_id",
    "table_version",
    "dead_letter_rows",
    "queue_lag_events",
    "heartbeat_fresh",
]


def status_frame(spark: SparkSession, status: dict[str, Any]) -> DataFrame:
    """Flatten the status document to one row per stream with the
    DETERMINISTIC fields (STATUS_FRAME_COLS) — what the oracle gate and
    a metrics scraper consume; the full dict keeps the timing fields."""
    dl = status.get("dead_letter", {})
    rows = [
        (
            s["stream_id"],
            s["epochs"],
            s["events_total"],
            s["n_insert"],
            s["n_update"],
            s["n_delete"],
            s["n_poison"],
            s["max_seq"],
            s["last_epoch_id"],
            s["table_version"],
            dl.get("rows"),
            status.get("queue", {}).get("lag_events"),
            status.get("heartbeat", {}).get("fresh"),
        )
        for s in status.get("streams", [])
    ]
    return spark.createDataFrame(
        rows,
        "stream_id string, epochs long, events_total long, n_insert long, "
        "n_update long, n_delete long, n_poison long, max_seq long, "
        "last_epoch_id long, table_version long, dead_letter_rows long, "
        "queue_lag_events long, heartbeat_fresh boolean",
    )
