"""Event-time streaming: watermarked windowed aggregation and a custom
stateful operator (applyInPandasWithState).

The CDC core deliberately needs no event-time watermark — LWW by seq is
order-insensitive and cross-batch ordering is the merge fence (SURVEY
ST3/ST4). These operators cover the OTHER half of a training-data
pipeline: analytics over the event stream itself, where event-time
windows and per-key session state are the point.

  * streaming_hourly_stats — the A3 statistics rollup as a TRUE
    streaming aggregation: watermark bounds state and admits late rows
    up to the slack; append mode emits each window once, when the
    watermark passes it. State per partial window lives in the state
    store, sized by (windows in flight × groups), independent of stream
    length — the property that matters at 10^10 events.
  * gap_sessionize_stateful — gap-based sessionization as
    applyInPandasWithState: per-key state is (session ordinal, last
    timestamp, running aggregates), carried across micro-batches via
    the checkpointed state store; a session is emitted exactly once,
    when its closing gap is observed. Arrow-batched — the Python hook
    sees pandas frames per key group, never row-at-a-time.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 3600

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("events_in_session", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


def streaming_hourly_stats(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: T.StructType,
    watermark: str = "2 hours",
    window: str = "1 hour",
):
    """Watermarked tumbling-window stats over the event stream, append
    mode: each (window, event_type) row is written exactly once, after
    the watermark passes the window end. Late rows inside the watermark
    slack still count; later ones are dropped by design (the documented
    late-data contract)."""
    ev = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("value").alias("sum_value"),
            F.max("event_id").alias("max_seq"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "events", "sum_value", "max_seq")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionizer. State carries the OPEN session across
    micro-batches; closed sessions are emitted exactly once."""
    (user_id,) = key
    if state.exists:
        session_id, last_ts, n, first_seq, last_seq = state.get
    else:
        session_id, last_ts, n, first_seq, last_seq = 0, None, 0, None, None
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        # normalize whatever Arrow delivered (datetime64[ns]/[us] or
        # int64 ns) to float epoch-seconds, vectorized — pandas 2 keeps
        # microsecond resolution, where astype(int64) yields MICROS
        ts_seconds = (
            pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") / 1e9
        )
        for ts_s, seq in zip(ts_seconds, pdf["event_id"]):
            if last_ts is not None and ts_s - last_ts > SESSION_GAP_S:
                out.append((user_id, session_id, n, first_seq, last_seq))
                session_id, n, first_seq = session_id + 1, 0, None
            if first_seq is None:
                first_seq = int(seq)
            n += 1
            last_seq = int(seq)
            last_ts = ts_s
    state.update((session_id, last_ts, n, first_seq, last_seq))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "events_in_session",
                          "first_seq", "last_seq"]
        )


def gap_sessionize_stateful(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: T.StructType,
):
    """Custom stateful streaming operator: per-key session state via
    applyInPandasWithState, checkpointed across micro-batches. Events
    must arrive per key in event-time order across batches (guaranteed
    here by the file stream's offset order over time-ordered files —
    the same relaxed contract the reference's per-key worker affinity
    provides)."""
    ev = spark.readStream.schema(schema).parquet(events_dir)
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
