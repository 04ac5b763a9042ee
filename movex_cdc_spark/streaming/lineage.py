"""Per-batch lineage / metrics table (reference A1/A3/W4: the
Statistics table written by StatisticCounterConcentrator,
statistic_counter_concentrator.rb:16-87, and the worker high-water
marks, transfer_thread.rb:39-44).

One row per (stream_id, epoch_id): event counts per op, max applied
seq, buckets touched, merge latency. Append-only parquet; the rollup
job compresses old rows to hourly/daily grain exactly like the
reference's CompressStatistics (compress_statistics.rb:26-59).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("epoch_id", T.LongType()),
        T.StructField("table_version", T.LongType()),
        T.StructField("events", T.LongType()),
        T.StructField("n_insert", T.LongType()),
        T.StructField("n_update", T.LongType()),
        T.StructField("n_delete", T.LongType()),
        T.StructField("n_poison", T.LongType()),
        T.StructField("max_seq", T.LongType()),
        T.StructField("buckets_touched", T.IntegerType()),
        T.StructField("merge_latency_s", T.DoubleType()),
        T.StructField("end_ts", T.TimestampType()),
    ]
)


class MetricsTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, record: dict[str, Any]) -> None:
        row = {f.name: record.get(f.name) for f in METRICS_SCHEMA.fields}
        df = self.spark.createDataFrame([row], METRICS_SCHEMA)
        df = df.withColumn("end_ts", F.coalesce(F.col("end_ts"), F.current_timestamp()))
        df.coalesce(1).write.mode("append").parquet(self.path)

    def read(self) -> DataFrame | None:
        try:
            return self.spark.read.schema(METRICS_SCHEMA).parquet(self.path)
        except Exception:
            return None

    def rollup(self, grain: str = "1 hour") -> DataFrame | None:
        """Tumbling-window compression of per-epoch rows (reference A3:
        GROUP BY table_id, operation, TRUNC(ts) ... replace with SUM,
        compress_statistics.rb:26-59) — here a single shuffle, no
        20000-rows-per-pass loop needed."""
        df = self.read()
        if df is None:
            return None
        return (
            df.groupBy(F.window("end_ts", grain).alias("w"), "stream_id")
            .agg(
                F.sum("events").alias("events"),
                F.sum("n_insert").alias("n_insert"),
                F.sum("n_update").alias("n_update"),
                F.sum("n_delete").alias("n_delete"),
                F.sum("n_poison").alias("n_poison"),
                F.max("max_seq").alias("max_seq"),
                F.sum("merge_latency_s").alias("merge_latency_s"),
            )
            .select(F.col("w.start").alias("window_start"), "stream_id", "events",
                    "n_insert", "n_update", "n_delete", "n_poison", "max_seq",
                    "merge_latency_s")
        )
