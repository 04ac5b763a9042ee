"""Event-log sources.

The reference's staging queue is a time-partitioned Oracle table
scanned oldest-partition-first with an adaptive ID window
(transfer_thread.rb:180-222,229-328). The Spark-native equivalent is a
file-based Structured Streaming source over the event-log directory:
offsets + ``maxFilesPerTrigger`` replace the manual partition walk and
window sizing, and the checkpoint replaces the consumed-rows DELETE
(S10 — the source is never mutated).

On a real deployment this would be ``spark.readStream.format("iceberg")``
over the change-log table (or Kafka); the schema contract is identical.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("old_content", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("txid", T.LongType()),
    ]
)

EVENT_COLS = [f.name for f in EVENTS_SCHEMA.fields]


def write_event_files(
    events_pdf: pd.DataFrame, out_dir: str, n_files: int, prefix: str = "events"
) -> list[str]:
    """Land a pandas event frame as N parquet files in arrival order —
    each file is one micro-batch-worth of the queue."""
    os.makedirs(out_dir, exist_ok=True)
    pdf = events_pdf[[c for c in EVENT_COLS if c in events_pdf.columns]]
    n = len(pdf)
    step = max(1, n // n_files)
    paths = []
    for i in range(n_files):
        lo = i * step
        hi = (i + 1) * step if i < n_files - 1 else n
        if lo >= n:
            break
        p = os.path.join(out_dir, f"{prefix}-{i:05d}.parquet")
        tbl = pa.Table.from_pandas(pdf.iloc[lo:hi], preserve_index=False)
        # Spark reads timestamp as INT64 micros; pandas defaults to nanos
        pq.write_table(tbl, p, coerce_timestamps="us", allow_truncated_timestamps=True)
        paths.append(p)
    return paths


def read_events_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(EVENTS_SCHEMA).parquet(path)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the event-log directory. maxFilesPerTrigger is
    the backpressure knob (reference ST7: max_sorted_id_distances /
    MAX_TRANSACTION_SIZE adaptive window — built-in here)."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return r.parquet(path)
