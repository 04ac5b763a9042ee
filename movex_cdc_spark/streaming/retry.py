"""Dead-letter retry re-admission (SURVEY S7/S11/ST5).

Reference flow: failed events stay queued with Retry_Count++ and an
exponential backoff gate (start_delay * 3^(retry-1)); after
error_max_retries they move to Event_Log_Final_Errors
(transfer_thread.rb:358-371,468-491; config application.rb:251-252).

Spark flow: poison rows land in the dead-letter table at retry_count=0.
Each `readmit` pass takes the backoff-eligible rows, re-validates them,
applies the now-valid ones through the normal merge path, and rewrites
the dead-letter table with retry_count+1 on the still-poison ones —
rows beyond max_retries are moved to the final-errors table.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import DeadLetterTable, apply_batch
from movex_cdc_spark.sources.events import EVENT_COLS


class RetryWorker:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        dead_letter: DeadLetterTable,
        final_errors_dir: str,
        max_retries: int = 5,
        start_delay_s: int = 20,
    ):
        self.spark = spark
        self.table = table
        self.dl = dead_letter
        self.final_errors_dir = final_errors_dir
        self.max_retries = max_retries
        self.start_delay_s = start_delay_s

    def readmit(self, epoch_id: int | None = None, stream_id: str = "retry") -> dict[str, Any]:
        df = self.dl.read()
        if df is None:
            return {"eligible": 0}
        # Pin ONE wall-clock instant for the whole pass. readmit runs up
        # to four Spark actions (counts agg, heal merge, exhausted write,
        # dl.replace rewrite); F.current_timestamp() is re-evaluated per
        # action, so a row whose backoff expired between actions would be
        # counted eligible+healed yet dropped from the rewrite — silent
        # row loss. F.lit(now) classifies identically in every action.
        now = self.spark.sql("select current_timestamp() AS ts").first()["ts"]
        backoff = F.expr(
            f"last_error_time + make_interval(0,0,0,0,0,0,"
            f" {self.start_delay_s} * pow(3, retry_count - 1))"
        )
        eligible_pred = (F.col("retry_count") == 0) | (backoff < F.lit(now))
        eligible = df.filter(eligible_pred)
        waiting = df.filter(~eligible_pred)

        # re-validate: a row is healed iff it now passes the same check
        # that quarantined it (content present for I/U)
        healed_pred = F.col("content").isNotNull() | (F.col("op") == "D")
        healed = eligible.filter(healed_pred).select(
            *[c for c in EVENT_COLS if c in df.columns]
        )
        still_bad = eligible.filter(~healed_pred)

        # ONE aggregate over the (small) dead-letter store for all three
        # decision counts — counted BEFORE the swap below invalidates
        # this read's lineage
        counts = eligible.agg(
            F.sum(F.when(healed_pred, 1).otherwise(0)).alias("healed"),
            F.sum(F.when(~healed_pred, 1).otherwise(0)).alias("still"),
            F.sum(
                F.when(~healed_pred & (F.col("retry_count") + 1 > self.max_retries), 1)
                .otherwise(0)
            ).alias("final"),
        ).first()
        n_healed = int(counts["healed"] or 0)
        n_still = int(counts["still"] or 0)
        n_final = int(counts["final"] or 0)
        if n_healed:
            apply_batch(self.table, healed, epoch_id=epoch_id, stream_id=stream_id)

        # post-increment comparison: a row gets max_retries retry passes before
        # finalizing, matching the reference (transfer_thread.rb:476 retries
        # while retry_count < error_max_retries).
        exhausted = still_bad.filter(F.col("retry_count") + 1 > self.max_retries)
        retrying = (
            still_bad.filter(F.col("retry_count") + 1 <= self.max_retries)
            .withColumn("retry_count", F.col("retry_count") + 1)
            .withColumn("last_error_time", F.lit(now))
        )
        if n_final:
            (
                exhausted.withColumn("error_time", F.lit(now))
                .write.mode("append")
                .parquet(self.final_errors_dir)
            )

        # rewrite the dead-letter table = waiting ∪ retrying, through
        # the log's atomic listing swap (write-new-then-commit: a crash
        # never loses rows, in-flight readers keep their old listing)
        self.dl.replace(waiting.unionByName(retrying))
        return {
            "eligible": n_healed + n_still,
            "healed": n_healed,
            "final_errors": n_final,
        }

    def final_errors(self):
        try:
            return self.spark.read.parquet(self.final_errors_dir)
        except Exception:
            return None
