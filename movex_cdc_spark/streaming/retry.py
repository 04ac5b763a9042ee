"""Dead-letter retry re-admission (SURVEY S7/S11/ST5).

Reference flow: failed events stay queued with Retry_Count++ and an
exponential backoff gate (start_delay * 3^(retry-1)); after
error_max_retries they move to Event_Log_Final_Errors
(transfer_thread.rb:358-371,468-491; config application.rb:251-252).
Operators can later push final errors BACK into processing once the
root cause is fixed (POST /server_control/reprocess_final_errors,
server_control_controller.rb:103-170) — each row re-enters the queue
with a fresh retry budget.

Spark flow: poison rows land in the dead-letter table at retry_count=0.
Each `readmit` pass takes the backoff-eligible rows, re-validates them,
applies the now-valid ones through the normal merge path, and rewrites
the dead-letter table with retry_count+1 on the still-poison ones —
rows beyond max_retries are moved to the final-errors store.

The final-errors store is an epoch-fenced UnkeyedEventLog, NOT a plain
``mode("append")`` parquet dir: readmit appends exhausted rows fenced
on the dead-letter log's version, so a pass that crashes between the
final-errors append and the dead-letter rewrite re-runs without
duplicating rows in the final store (the rerun reads the same
dead-letter version -> the same fence token -> the append no-ops).

``reprocess_final_errors`` is the operator-initiated requeue. Deviation
from the reference, documented: the reference re-INSERTs into the
Event_Logs queue table inside a DB transaction; this engine's inbound
queue is a plain directory with no commit protocol, so requeue goes
through the dead-letter store (same retry machinery, retry_count reset
to 0 = immediately eligible) — the fenced append + listing swap give
the INSERT-and-DELETE transactionality the reference gets from Oracle.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import DeadLetterTable, apply_batch
from movex_cdc_spark.sources.events import EVENT_COLS


class FinalErrorsTable:
    """Epoch-fenced store for retry-exhausted rows (reference:
    Event_Log_Final_Errors, db/migrate/*create_event_log_final_errors*).
    Thin wrapper over UnkeyedEventLog: fenced append (idempotent across
    a crashed readmit pass re-run), atomic listing swap for the
    reprocess rewrite, metadata-listing read."""

    def __init__(self, spark: SparkSession, path: str, fs=None):
        from movex_cdc_spark.lake.append_log import UnkeyedEventLog
        from movex_cdc_spark.lake.fs import DEFAULT_FS

        self.spark = spark
        self.path = path
        fs = fs or DEFAULT_FS
        try:
            self.log = UnkeyedEventLog.load(spark, path, fs=fs)
        except FileNotFoundError:
            if fs.isdir(path) and any(
                f.endswith(".parquet") for f in fs.listdir(path)
            ):
                raise ValueError(
                    f"{path} holds parquet files but no log metadata — "
                    "not re-initializing over existing final-error data"
                )
            self.log = UnkeyedEventLog.create(spark, path, fs=fs)

    def append(self, df: DataFrame, fence_token: int) -> bool:
        """Append exhausted rows, fenced on the CALLER's monotone token
        (readmit uses the dead-letter log version at pass start).
        Returns False when the token was already committed — the
        crashed-pass re-run case."""
        lineage = self.log.append(df, stream_id="final", epoch_id=fence_token)
        return not lineage.get("skipped")

    def replace(self, df: DataFrame) -> None:
        self.log.replace(df)

    def read(self) -> DataFrame | None:
        df = self.log.read()
        if not df.columns:
            return None
        return df


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
        self.final = FinalErrorsTable(spark, final_errors_dir, fs=self.dl.log.fs)
        self.max_retries = max_retries
        self.start_delay_s = start_delay_s

    def readmit(self, epoch_id: int | None = None, stream_id: str = "retry") -> dict[str, Any]:
        df = self.dl.read()
        if df is None:
            return {"eligible": 0}
        # the fence token for this pass's final-errors append: the
        # dead-letter log version BEFORE the rewrite. Monotone across
        # passes (the rewrite bumps it); stable across a crashed pass's
        # re-run (the rewrite never happened), so the re-run's append
        # fences to a no-op instead of duplicating final rows.
        dl_version = int(self.dl.log.meta()["version"])
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

        # re-validate: a row is healed iff it now passes THE quarantine
        # rule that sent it here (operators/filters.poison_predicate —
        # content present for I/U AND a known op). The previous check
        # (`content IS NOT NULL OR op = 'D'`) had two defects this
        # single-source form fixes: (a) on a NULL-op row it evaluated
        # NULL, so the row fell out of BOTH the healed and still-bad
        # sides and was silently DELETED from the dead letter at the
        # rewrite below (3VL row loss); (b) a content-present row with
        # a junk/NULL op counted as "healed" and was re-applied, only
        # to be re-poisoned downstream. poison_predicate is total
        # (never NULL) by construction, so every eligible row lands in
        # exactly one of healed/still_bad.
        from movex_cdc_spark.operators.filters import poison_predicate

        healed_pred = ~poison_predicate()
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
            self.final.append(
                exhausted.withColumn("error_time", F.lit(now)),
                fence_token=dl_version,
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

    def final_errors(self) -> DataFrame | None:
        return self.final.read()

    def reprocess_final_errors(self, where: str | None = None) -> dict[str, Any]:
        """Operator-initiated requeue of final errors (reference:
        POST /server_control/reprocess_final_errors,
        server_control_controller.rb:103-170 — re-INSERT into Event_Logs
        with a fresh retry budget, DELETE from final errors, per
        schema/table scope).

        ``where`` is an optional SQL predicate selecting which final
        rows to requeue (the reference's schema/table scope generalized
        — e.g. ``"op = 'I'"`` or ``"error_time < timestamp'...'"``);
        default all.

        Selected rows return to the dead-letter store with
        retry_count=0 (immediately eligible for the next readmit pass,
        which re-validates them under the CURRENT config) and are
        removed from the final store. Exactly-once across a crash
        between the two commits: the dead-letter append fences on the
        final log's version, so a re-run of the same call re-reads the
        same version, the append no-ops, and only the removal re-runs.
        """
        df = self.final.read()
        if df is None:
            return {"reprocessed": 0, "remaining": 0}
        token = int(self.final.log.meta()["version"])
        # coalesce: a predicate that evaluates NULL on a row (e.g.
        # ``op = 'I'`` over a NULL op) would otherwise drop the row
        # from BOTH the selected AND the remaining side — silently
        # deleting it from the final store at the replace below. An
        # undecidable scope predicate means NOT selected, never lost.
        pred = F.coalesce(F.expr(where), F.lit(False)) if where else F.lit(True)
        selected = df.filter(pred)
        remaining = df.filter(~pred)

        # strip the bookkeeping DeadLetterTable.append re-derives; keep
        # event columns + the original quarantine reason
        keep = [c for c in EVENT_COLS if c in df.columns]
        if "error_msg" in df.columns:
            keep.append("error_msg")
        requeue = selected.select(*keep)

        n = self.dl.append(
            requeue,
            stream_id=f"reprocess:{self.final_errors_dir}",
            epoch_id=token,
        )
        # count BEFORE the swap invalidates this read's lineage (the
        # count-before-swap rule readmit follows)
        n_remaining = remaining.count()
        # fenced no-op (n == 0 with selected rows present) means a
        # crashed earlier call already requeued — fall through to the
        # removal either way
        self.final.replace(remaining)
        return {
            "reprocessed": int(n),
            "remaining": int(n_remaining),
        }
