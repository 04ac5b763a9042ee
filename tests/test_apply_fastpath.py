"""Focused tests for the r8 streaming fast-path restructure:

  * ONE probe job carries bucket set + counters + poison count;
  * the dead-letter append is SKIPPED when the epoch has no poison
    (no empty segment write, no metadata commit), and still lands
    exactly-once when poison exists;
  * LakeTable.merge(probe=...) (caller-supplied probe) produces the
    identical final state as the prune_source and generic paths, and
    the written-outside-touched guard still fails loudly on a lying
    probe.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from movex_cdc_spark.lake.table import LakeTable, bucket_expr
from movex_cdc_spark.operators.apply import (
    KEY_COLS,
    REPO_FILES_SCHEMA,
    DeadLetterTable,
    apply_batch_flagged,
    flag_dispositions,
)


def _events(spark, rows):
    cols = ["seq", "repo", "path", "commit", "lang", "content", "old_content", "op", "ts", "txid"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def _mk(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), REPO_FILES_SCHEMA, KEY_COLS, n_buckets=8
    )


TS = "2024-01-01"


def test_clean_epoch_skips_dead_letter_write(spark, tmp_path):
    t = _mk(spark, tmp_path, "lake")
    dl = DeadLetterTable(spark, str(tmp_path / "dl"))
    v0 = t.current_version()
    dl_v0 = int(dl.log.meta()["version"])
    clean = flag_dispositions(
        _events(spark, [(1, "r1", "p1", "c1", "py", "x", None, "I", TS, 1),
                        (2, "r2", "p2", "c2", "py", "y", None, "I", TS, 1)])
    )
    lin = apply_batch_flagged(t, clean, epoch_id=0, stream_id="s", dead_letter=dl)
    assert not lin.get("skipped")
    assert lin["n_poison"] == 0
    # no poison -> the dead-letter log must not have committed anything
    assert int(dl.log.meta()["version"]) == dl_v0
    assert t.current_version() > v0
    assert t.read().count() == 2


def test_poison_epoch_quarantines_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path, "lake")
    dl = DeadLetterTable(spark, str(tmp_path / "dl"))
    mixed = flag_dispositions(
        _events(spark, [(1, "r1", "p1", "c1", "py", "x", None, "I", TS, 1),
                        (2, "r2", "p2", "c2", "py", None, None, "I", TS, 1),  # poison
                        (3, "r3", "p3", "c3", "py", "z", None, "QQ", TS, 1)])  # poison
    )
    lin = apply_batch_flagged(t, mixed, epoch_id=0, stream_id="s", dead_letter=dl)
    assert lin["n_poison"] == 2
    assert dl.read().count() == 2
    assert t.read().count() == 1
    # replayed epoch: table fenced, dead letter fenced -> both no-ops
    lin2 = apply_batch_flagged(t, mixed, epoch_id=0, stream_id="s", dead_letter=dl)
    assert lin2.get("skipped")
    assert dl.read().count() == 2
    assert t.read().count() == 1


def test_probe_path_matches_generic_merge(spark, tmp_path):
    """Same batch through merge(probe=...), merge(prune_source=...) and
    the generic persist path must land the identical state."""
    import pandas as _pd

    batch_pdf = _pd.DataFrame(
        [("r1", "p1", "c9", "py", "new", 10, "U"),
         ("r9", "p9", "c1", "py", "ins", 11, "I")],
        columns=["repo", "path", "commit", "lang", "content", "seq", "op"],
    )
    base_pdf = _pd.DataFrame(
        [("r1", "p1", "c1", "py", "old", None),
         ("r2", "p2", "c2", "py", "keep", None)],
        columns=["repo", "path", "commit", "lang", "content", "content_sha"],
    )
    states = {}
    for mode in ("probe", "prune", "generic"):
        t = _mk(spark, tmp_path, f"lake-{mode}")
        t.overwrite(spark.createDataFrame(base_pdf))
        batch = spark.createDataFrame(batch_pdf).withColumn(
            "content_sha", F.sha2("content", 256)
        )
        if mode == "probe":
            m = t.meta()
            rows = (
                batch.select(
                    bucket_expr(KEY_COLS, m["n_buckets"]).alias("b"),
                    (F.col("repo").isNull() | F.col("path").isNull()).alias("nk"),
                ).distinct().collect()
            )
            t.merge(batch, epoch_id=0,
                    probe=(sorted({r["b"] for r in rows}),
                           any(r["nk"] for r in rows)))
        elif mode == "prune":
            t.merge(batch, epoch_id=0, prune_source=batch.select(*KEY_COLS))
        else:
            t.merge(batch, epoch_id=0)
        states[mode] = {
            (r["repo"], r["path"]): (r["commit"], r["content"], r["last_seq"])
            for r in t.read().collect()
        }
    assert states["probe"] == states["prune"] == states["generic"]
    assert ("r9", "p9") in states["probe"] and states["probe"][("r1", "p1")][0] == "c9"


def test_lying_probe_fails_loud(spark, tmp_path):
    t = _mk(spark, tmp_path, "lake")
    batch = spark.createDataFrame(
        pd.DataFrame([("r1", "p1", "c1", "py", "x", 1, "I")],
                     columns=["repo", "path", "commit", "lang", "content", "seq", "op"])
    ).withColumn("content_sha", F.sha2("content", 256))
    real_bucket = batch.select(
        bucket_expr(KEY_COLS, 8).alias("b")
    ).first()["b"]
    wrong = [(real_bucket + 1) % 8]
    with pytest.raises(RuntimeError, match="outside the probed"):
        t.merge(batch, epoch_id=0, probe=(wrong, False))
