"""Merge-on-read wrapper over the copy-on-write lake table.

The COW merge rewrites every touched bucket per epoch — correct and
read-optimal, but tiny frequent epochs over many buckets amplify
writes: a 1,000-row epoch touching 500 buckets rewrites 500 buckets of
a 10^10-row table. This is the classic COW/MoR trade (Iceberg
merge-on-read / Hudi MOR): buffer small change batches in an
append-only DELTA log (O(batch) write, zero rewrite), resolve state at
read time with one extra LWW over base ∪ delta, and COMPACT the delta
into the base through the normal bucket-pruned merge once it exceeds a
threshold — paying the rewrite once per many epochs instead of every
epoch.

Exactly-once survives intact:
  * delta appends are fenced per (stream_id, epoch_id) in the delta
    log's atomic metadata commit (same pointer-swap protocol as the
    base table);
  * compaction is fenced in the BASE table under a reserved stream id
    whose epoch is the delta log's version, so a crash between
    base-merge and delta-truncate replays into a no-op merge followed
    by the truncate.

Read-time semantics are identical to COW by construction: the winner
per key across (base rows at their applied seq, delta change rows at
their seq) is the same LWW the eager merge computes — associativity of
max-by-seq again, the same property the salted two-phase LWW leans on.
Reference anchor: the queue IS the reference's delta (Event_Logs rows
awaiting transfer, transfer_thread.rb:53-99); compaction is its drain.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movex_cdc_spark.lake.append_log import UnkeyedEventLog
from movex_cdc_spark.lake.table import DELETED_COL, SEQ_COL, LakeTable

COMPACT_STREAM = "__compact"


class MergeOnReadTable:
    """LakeTable-compatible facade: ``merge`` appends to the delta and
    auto-compacts past ``compact_rows``; ``read`` resolves base ∪ delta."""

    def __init__(
        self,
        base: LakeTable,
        delta_path: str,
        compact_rows: int = 1_000_000,
        expire_keep_last: int = 8,
    ):
        self.base = base
        self.spark = base.spark
        # the delta log lives next to the base table: same fs seam
        try:
            self.delta = UnkeyedEventLog.load(self.spark, delta_path, fs=base.fs)
        except FileNotFoundError:
            # only a MISSING delta may be created; corrupt metadata must
            # propagate rather than silently shadowing buffered changes
            self.delta = UnkeyedEventLog.create(self.spark, delta_path, fs=base.fs)
        self.compact_rows = compact_rows
        # reader-retention window for drained delta segments, in delta
        # METADATA VERSIONS (each epoch advances two: append + counter);
        # widen for deployments with slow concurrent readers
        self.expire_keep_last = expire_keep_last

    # -------------------------------------------------------- helpers
    def _delta_rows(self) -> int:
        return int(self.delta.meta().get("rows", 0))

    def evolve_schema(self, batch_payload_schema) -> Any:
        return self.base.evolve_schema(batch_payload_schema)

    def payload_schema(self):
        return self.base.payload_schema()

    def current_version(self) -> int:
        return self.base.current_version()

    # ---------------------------------------------------------- merge
    def merge(
        self,
        batch: DataFrame,
        seq_col: str = "seq",
        op_col: str = "op",
        stream_id: str = "default",
        epoch_id: int | None = None,
        lineage_extra: dict[str, Any] | None = None,
        prune_source: DataFrame | None = None,
    ) -> dict[str, Any]:
        """Append the (already LWW-deduped) change batch to the delta
        log — O(batch), no bucket rewrite. Fenced like LakeTable.merge.
        ``prune_source`` is accepted for LakeTable interface parity and
        ignored: a delta append touches no buckets, so there is nothing
        to prune."""
        import time as _time

        from pyspark.sql import Observation

        pay = [f.name for f in self.base.payload_schema().fields]
        batch_names = set(batch.columns)
        norm = batch.select(
            *[
                (F.col(c) if c in batch_names else F.lit(None)).alias(c)
                for c in pay
            ],
            F.col(seq_col).cast("long").alias("__d_seq"),
            F.col(op_col).alias("__d_op"),
        )
        obs = Observation(f"mor_{stream_id}_{epoch_id}_{_time.monotonic_ns()}")
        norm = norm.observe(obs, F.count(F.lit(1)).alias("n"))
        lineage = self.delta.append(norm, stream_id=stream_id, epoch_id=epoch_id)
        if lineage.get("skipped"):
            return lineage
        # row count rides a follow-up metadata version (atomic pointer
        # swap like every commit; the count came free off the write job)
        m = self.delta.meta()
        m["rows"] = int(m.get("rows", 0)) + int(obs.get.get("n", 0))
        self._rewrite_meta(m)
        lineage["delta_rows"] = m["rows"]
        lineage["mode"] = "delta-append"
        if m["rows"] >= self.compact_rows:
            lineage["compaction"] = self.compact()
        return lineage

    def _rewrite_meta(self, m: dict[str, Any]) -> None:
        m2 = dict(m)
        m2["version"] = m["version"] + 1
        self.delta._write_version(m2)

    # ----------------------------------------------------------- read
    def read(self, include_deleted: bool = False) -> DataFrame:
        """Base ∪ delta resolved by LWW — the read-time merge."""
        m = self.base.meta()
        key_cols = m["key_cols"]
        pay = [f.name for f in self.base.payload_schema().fields]
        base = self.base.read_raw().select(
            *pay, F.col(SEQ_COL).alias("__seq"),
            F.when(F.col(DELETED_COL), "D").otherwise("B").alias("__op"),
        )
        dmeta = self.delta.meta()
        if dmeta["files"]:
            d = self.delta.read()
            dcols = set(d.columns)
            # schema-evolution tolerant: delta segments appended before a
            # column add are read with null for the new column
            delta = d.select(
                *[(F.col(c) if c in dcols else F.lit(None)).alias(c) for c in pay],
                F.col("__d_seq").alias("__seq"),
                F.col("__d_op").alias("__op"),
            )
            both = base.unionByName(delta)
        else:
            both = base
        # one LWW (max_by partial combine) — same shuffle class as the
        # eager merge's join, paid at read instead of write
        payload = [c for c in both.columns if c not in key_cols and c != "__seq"]
        winner = (
            both.groupBy(*key_cols)
            .agg(
                F.max_by(F.struct(*payload), F.col("__seq")).alias("__w"),
                F.max("__seq").alias(SEQ_COL),
            )
            .select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload], SEQ_COL)
        )
        out = winner.withColumn(DELETED_COL, F.col("__op") == "D").drop("__op")
        if not include_deleted:
            out = out.filter(~F.col(DELETED_COL)).drop(DELETED_COL)
        return out

    # -------------------------------------------------------- compact
    def compact(self) -> dict[str, Any]:
        """Fold the delta into the base via the normal bucket-pruned COW
        merge, then truncate the delta (keeping its epoch fences).
        Fenced in the base under COMPACT_STREAM at the delta version, so
        a replay after a crash mid-compaction is a no-op merge."""
        dmeta = self.delta.meta()
        if not dmeta["files"]:
            return {"skipped": True, "reason": "empty delta"}
        dv = dmeta["version"]
        key_cols = self.base.meta()["key_cols"]
        delta = self.delta.read()
        # LWW within the delta first (multiple epochs may carry the same key)
        payload = [c for c in delta.columns if c not in key_cols and c != "__d_seq"]
        squashed = (
            delta.groupBy(*key_cols)
            .agg(
                F.max_by(F.struct(*payload), F.col("__d_seq")).alias("__w"),
                F.max("__d_seq").alias("__d_seq"),
            )
            .select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload], "__d_seq")
        )
        lin = self.base.merge(
            squashed,
            seq_col="__d_seq",
            op_col="__d_op",
            stream_id=COMPACT_STREAM,
            epoch_id=dv,
        )
        # truncate: drop the file list, KEEP the per-stream epoch fences.
        # The drained segment dirs are RETIRED by the log's own listing
        # swap (still on disk for any reader that planned against the
        # old listing; the rows-counter reset rides the same atomic
        # commit) and reaped past the configured retention window —
        # without the retired record they would leak on disk forever.
        m = self.delta.meta()
        self.delta._swap_listing(m, [], m.get("schema"), extra={"rows": 0})
        lin["segments_expired"] = self.delta.expire_segments(
            keep_last=self.expire_keep_last
        )
        lin["mode"] = "compaction"
        return lin
