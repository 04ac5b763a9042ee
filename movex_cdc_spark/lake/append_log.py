"""Append-only, epoch-fenced event log — the sink for unkeyed tables.

Reference S5: events whose table has ``kafka_key_handling = 'N'`` are
produced WITHOUT a message key (transfer_thread.rb:331-347) — they are
still delivered exactly like keyed events, but with relaxed (round-
robin partition) ordering and no per-key compaction. The Spark analog:
no LWW collapse, no MERGE — each valid event is appended once.

Scale shape: an append is one parquet write of the batch, zero shuffle,
zero rewrite of existing data — O(batch), never O(table). Exactly-once
comes from the same metadata-pointer protocol as LakeTable: the file
list and the per-stream epoch fence are committed in one atomic
``os.replace`` of the ``_current`` pointer, so a replayed foreachBatch
epoch is a metadata no-op and its orphaned data files are never listed.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class UnkeyedEventLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "_meta")

    @classmethod
    def create(cls, spark: SparkSession, path: str) -> "UnkeyedEventLog":
        log = cls(spark, path)
        os.makedirs(log.meta_dir, exist_ok=False)
        log._write_version({"version": 0, "files": [], "epochs": {}, "schema": None})
        return log

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "UnkeyedEventLog":
        log = cls(spark, path)
        log.meta()  # raises if missing
        return log

    # ------------------------------------------------------- metadata
    def meta(self) -> dict[str, Any]:
        with open(os.path.join(self.meta_dir, "_current")) as f:
            v = int(f.read().strip())
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def _write_version(self, meta: dict[str, Any]) -> None:
        v = meta["version"]
        with open(os.path.join(self.meta_dir, f"v{v}.json"), "x") as f:
            json.dump(meta, f)
        tmp = os.path.join(self.meta_dir, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.meta_dir, "_current"))

    # --------------------------------------------------------- append
    def append(
        self, batch: DataFrame, stream_id: str = "default", epoch_id: int | None = None
    ) -> dict[str, Any]:
        """Append a batch; fenced per (stream_id, epoch_id) like
        LakeTable.merge. Returns the lineage record."""
        m = self.meta()
        if epoch_id is not None:
            last = m["epochs"].get(stream_id)
            if last is not None and epoch_id <= last:
                return {"skipped": True, "stream_id": stream_id, "epoch_id": epoch_id}
        new_version = m["version"] + 1
        seg_rel = f"seg-{new_version}"
        seg_dir = os.path.join(self.path, seg_rel)
        batch.write.parquet(seg_dir, mode="errorifexists")
        files = [
            os.path.join(seg_rel, f)
            for f in sorted(os.listdir(seg_dir))
            if f.endswith(".parquet")
        ]
        m2 = dict(m)
        m2["version"] = new_version
        m2["files"] = list(m["files"]) + files
        m2["epochs"] = dict(m["epochs"])
        if epoch_id is not None:
            m2["epochs"][stream_id] = epoch_id
        m2["schema"] = batch.schema.jsonValue()
        self._write_version(m2)
        return {
            "version": new_version,
            "stream_id": stream_id,
            "epoch_id": epoch_id,
            "files_added": len(files),
        }

    # -------------------------------------------------------- compact
    def compact_segments(self, target_files: int = 4) -> dict[str, Any]:
        """Small-files housekeeping (the sink-side ST8): a long-running
        stream appends one segment per epoch; rewrite them into
        ``target_files`` files and swap the listing in one atomic
        commit. Epoch fences are preserved; readers only ever see the
        old or the new listing. Safe to run while appends are fenced
        (single-writer per stream, like the merge path)."""
        m = self.meta()
        if len(m["files"]) <= target_files:
            return {"skipped": True, "files": len(m["files"])}
        new_version = m["version"] + 1
        seg_rel = f"seg-{new_version}"
        seg_dir = os.path.join(self.path, seg_rel)
        self.read().coalesce(target_files).write.parquet(seg_dir, mode="errorifexists")
        files = [
            os.path.join(seg_rel, f)
            for f in sorted(os.listdir(seg_dir))
            if f.endswith(".parquet")
        ]
        old_files = m["files"]
        m2 = dict(m)
        m2["version"] = new_version
        m2["files"] = files
        self._write_version(m2)
        # old segments are unreferenced now; remove them physically
        import shutil as _shutil

        old_dirs = {os.path.dirname(f) for f in old_files}
        for d in old_dirs:
            _shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return {"version": new_version, "files_before": len(old_files),
                "files_after": len(files)}

    # ----------------------------------------------------------- read
    def read(self) -> DataFrame:
        m = self.meta()
        files = [os.path.join(self.path, f) for f in m["files"]]
        if not files:
            schema = (
                T.StructType.fromJson(m["schema"]) if m.get("schema") else T.StructType([])
            )
            return self.spark.createDataFrame([], schema)
        # read with the latest committed schema so earlier segments
        # written before a column add come back with nulls
        schema = T.StructType.fromJson(m["schema"])
        return self.spark.read.schema(schema).parquet(*files)
