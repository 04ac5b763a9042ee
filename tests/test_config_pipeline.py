"""Config-driven capture on the streaming hot path (P1/P2/P3/§2.10),
mid-stream config change with schema evolution, and the unkeyed
key_handling='N' append path (S5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from movex_cdc_spark.config.table_config import (
    ColumnCfg,
    EngineConfig,
    ExpressionCfg,
    TableCfg,
    repo_files_config,
)
from movex_cdc_spark.datagen import (
    EXCLUDE_MARKER,
    GenParams,
    generate_events,
)
from movex_cdc_spark.lake.append_log import UnkeyedEventLog
from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import (
    KEY_COLS,
    REPO_FILES_SCHEMA,
    apply_batch_unkeyed,
)
from movex_cdc_spark.sources.events import write_event_files
from movex_cdc_spark.streaming.pipeline import CdcStreamPipeline


def _valid_events(ev):
    """Pandas mirror of the config-driven filter chain: the repo_files
    config conditions exclude the marker on I/U only (a DELETE carrying
    it is still captured — there is no D condition)."""
    marked = ev["content"].fillna("").str.contains(EXCLUDE_MARKER, regex=False)
    keep = ~(marked & ev["op"].isin(["I", "U"]))
    keep &= ~(ev["content"].isna() & ev["op"].isin(["I", "U"]))
    keep &= ~ev["is_noop"]
    return ev[keep]


def _evolved_config():
    cfg = repo_files_config()
    t = cfg.tables["repo_files"]
    # flip a column flag (lang no longer captured on UPDATE) and add a
    # computed payload column — the §2.10 column_expressions analog
    t.columns = [
        ColumnCfg("repo"),
        ColumnCfg("path"),
        ColumnCfg("commit"),
        ColumnCfg("lang", log_update=False),
        ColumnCfg("content", log_delete=False),
    ]
    t.expressions = [
        ExpressionCfg(alias="content_len", sql="length(content)", operations=("I", "U"))
    ]
    return cfg


def test_config_capture_midstream_change(spark, tmp_path):
    p = GenParams(n_events=3000, seed=11)
    ev = generate_events(p)
    cut = ev["seq"].median()
    first, second = ev[ev["seq"] <= cut], ev[ev["seq"] > cut]
    t = LakeTable.create(spark, str(tmp_path / "lake"), REPO_FILES_SCHEMA, KEY_COLS, n_buckets=8)

    def pipe(config):
        return CdcStreamPipeline(
            spark,
            t,
            events_dir=str(tmp_path / "events"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            config=config,
            table_name="repo_files",
            max_files_per_trigger=2,
        )

    write_event_files(first, str(tmp_path / "events"), n_files=3)
    pipe(repo_files_config()).run_available_now()
    assert "content_len" not in [f.name for f in t.payload_schema().fields]

    # config changes mid-stream: new column flags + expression column.
    # The next batches evolve the table schema (ALTER-before-MERGE).
    write_event_files(second, str(tmp_path / "events"), n_files=3, prefix="late")
    pipe(_evolved_config()).run_available_now()
    assert "content_len" in [f.name for f in t.payload_schema().fields]

    # expected winner per key from the pandas filter-chain mirror
    valid = _valid_events(ev)
    winners = valid.sort_values("seq").groupby(["repo", "path"], as_index=False).last()
    winners = winners[winners["op"] != "D"]
    got = {
        (r["repo"], r["path"]): r
        for r in t.read().select("repo", "path", "lang", "content", "content_len", "last_seq").collect()
    }
    assert len(got) == len(winners)
    for w in winners.itertuples(index=False):
        row = got[(w.repo, w.path)]
        assert row["last_seq"] == w.seq
        if w.seq <= cut:  # applied under the old config
            assert row["content_len"] is None
            assert row["lang"] == w.lang
        else:  # applied under the evolved config
            assert row["content_len"] == len(w.content)
            if w.op == "U":
                assert row["lang"] is None  # not logged for UPDATE anymore
            else:
                assert row["lang"] == w.lang


def test_per_op_condition_drops_only_matching_op(spark, tmp_path):
    p = GenParams(n_events=2000, seed=13, p_filtered=0.0, p_poison=0.0)
    ev = generate_events(p)
    cfg = repo_files_config()
    t_cfg = cfg.tables["repo_files"]
    # captures only python-file DELETEs; I/U unconditioned
    t_cfg.conditions = {"D": "lang = 'py'"}
    t = LakeTable.create(spark, str(tmp_path / "lake"), REPO_FILES_SCHEMA, KEY_COLS, n_buckets=4)
    write_event_files(ev, str(tmp_path / "events"), n_files=2)
    CdcStreamPipeline(
        spark,
        t,
        events_dir=str(tmp_path / "events"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        config=cfg,
    ).run_available_now()

    valid = ev[~ev["is_noop"]]
    valid = valid[(valid["op"] != "D") | (valid["lang"] == "py")]
    winners = valid.sort_values("seq").groupby(["repo", "path"], as_index=False).last()
    winners = winners[winners["op"] != "D"]
    assert t.read().count() == len(winners)


def test_unkeyed_append_path(spark, tmp_path):
    p = GenParams(n_events=2500, seed=17)
    ev = generate_events(p)
    cfg = repo_files_config()
    cfg.tables["repo_files"].key_handling = "N"
    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    write_event_files(ev, str(tmp_path / "events"), n_files=3)
    pipe = CdcStreamPipeline(
        spark,
        None,  # no merge table needed on the unkeyed path
        events_dir=str(tmp_path / "events"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dead_letter_dir=str(tmp_path / "dl"),
        config=cfg,
        unkeyed_log=log,
        max_files_per_trigger=2,
    )
    epochs = pipe.run_available_now()
    assert all(not e.get("skipped") for e in epochs)

    expected = _valid_events(ev)
    out = log.read()
    # every valid event appended exactly once, NO LWW collapse
    assert out.count() == len(expected)
    assert set(r["seq"] for r in out.select("seq").collect()) == set(expected["seq"])
    # mode 'N' produces NULL message keys (relaxed ordering contract)
    assert out.filter(F.col("msg_key").isNotNull()).count() == 0
    # poison rows went to the dead letter, not the log
    from movex_cdc_spark.operators.apply import DeadLetterTable

    n_poison = int((ev["content"].isna() & ev["op"].isin(["I", "U"])).sum())
    assert DeadLetterTable(spark, str(tmp_path / "dl")).read().count() == n_poison

    # resume from the same checkpoint: nothing new, nothing duplicated
    pipe2 = CdcStreamPipeline(
        spark,
        None,
        events_dir=str(tmp_path / "events"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        config=cfg,
        unkeyed_log=log,
    )
    pipe2.run_available_now()
    assert log.read().count() == len(expected)


def test_unkeyed_epoch_fence(spark, tmp_path):
    ev = generate_events(GenParams(n_events=500, seed=19, p_poison=0.0, p_filtered=0.0))
    df = spark.createDataFrame(ev.drop(columns=["is_noop"]))
    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    cfg = repo_files_config().tables["repo_files"]
    cfg.key_handling = "N"
    r1 = apply_batch_unkeyed(log, df, epoch_id=1, table_cfg=cfg)
    n1 = log.read().count()
    assert not r1.get("skipped") and n1 > 0
    # replay of the same epoch is fenced — append is exactly-once
    r2 = apply_batch_unkeyed(log, df, epoch_id=1, table_cfg=cfg)
    assert r2.get("skipped")
    assert log.read().count() == n1


def test_mixed_keyed_and_unkeyed_streams(spark, tmp_path):
    """Two tables fed from the same event dir: one keyed (merge), one
    unkeyed (append) — the reference runs keyed and keyless tables side
    by side in one worker pool (transfer_thread.rb:331-347)."""
    p = GenParams(n_events=1500, seed=23)
    ev = generate_events(p)
    write_event_files(ev, str(tmp_path / "events"), n_files=2)

    t = LakeTable.create(spark, str(tmp_path / "lake"), REPO_FILES_SCHEMA, KEY_COLS, n_buckets=4)
    CdcStreamPipeline(
        spark, t,
        events_dir=str(tmp_path / "events"),
        checkpoint_dir=str(tmp_path / "ckpt_k"),
        config=repo_files_config(),
    ).run_available_now()

    ucfg = repo_files_config()
    ucfg.tables["repo_files"].key_handling = "N"
    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    CdcStreamPipeline(
        spark, None,
        events_dir=str(tmp_path / "events"),
        checkpoint_dir=str(tmp_path / "ckpt_u"),
        config=ucfg,
        unkeyed_log=log,
    ).run_available_now()

    valid = _valid_events(ev)
    winners = valid.sort_values("seq").groupby(["repo", "path"], as_index=False).last()
    assert t.read().count() == len(winners[winners["op"] != "D"])
    assert log.read().count() == len(valid)


def test_unkeyed_log_segment_compaction(spark, tmp_path):
    """Small-files housekeeping on the append log: many per-epoch
    segments rewritten into few files, same rows, fences preserved."""
    ev = generate_events(GenParams(n_events=600, seed=47, p_poison=0.0, p_filtered=0.0))
    df = spark.createDataFrame(ev.drop(columns=["is_noop"]))
    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    cfg = repo_files_config().tables["repo_files"]
    cfg.key_handling = "N"
    for i in range(8):
        apply_batch_unkeyed(log, df.filter(F.pmod(F.col("seq"), F.lit(8)) == i),
                            epoch_id=i, table_cfg=cfg)
    n_before = log.read().count()
    assert len(log.meta()["files"]) >= 8
    r = log.compact_segments(target_files=2)
    assert r["files_after"] <= 2
    assert log.read().count() == n_before
    # fences survive compaction: replaying an old epoch is still a no-op
    rep = apply_batch_unkeyed(log, df.filter(F.pmod(F.col("seq"), F.lit(8)) == 3),
                              epoch_id=3, table_cfg=cfg)
    assert rep.get("skipped")
    assert log.read().count() == n_before


def test_unkeyed_log_compaction_retains_then_expires(spark, tmp_path):
    """Compaction swaps the listing but RETAINS old segment dirs for
    in-flight readers; expire_segments reaps them after the retention
    window (LakeTable.expire_snapshots analog)."""
    import os

    df = spark.range(100).selectExpr("id", "cast(id as string) AS v")
    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    for i in range(6):
        log.append(df.filter(F.pmod(F.col("id"), F.lit(6)) == i), epoch_id=i)
    old_dirs = {f.split(os.sep)[0] for f in log.meta()["files"]}
    # a reader that planned BEFORE the compaction (captures the old listing)
    stale_reader = log.read()
    log.compact_segments(target_files=1)
    for d in old_dirs:  # still on disk
        assert os.path.isdir(tmp_path / "ulog" / d), d
    assert stale_reader.count() == 100  # old plan still executes
    assert log.read().count() == 100
    # within retention: nothing reaped
    assert log.expire_segments(keep_last=5) == 0
    assert log.expire_segments(keep_last=0) == len(old_dirs)
    for d in old_dirs:
        assert not os.path.isdir(tmp_path / "ulog" / d), d
    assert log.read().count() == 100


def test_unkeyed_log_schema_union_and_widen(spark, tmp_path):
    """append() UNIONS schemas add-only with primitive widening — a
    narrowing config swap must not drop columns from older segments,
    and an incompatible type change must raise."""
    import pytest

    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    log.append(spark.range(3).selectExpr("cast(id as int) AS a", "id AS k"), epoch_id=0)
    # column add + widen a: int -> long
    log.append(spark.range(3).selectExpr("id AS a", "id AS k", "'x' AS b"), epoch_id=1)
    # NARROWING swap: b disappears, a back to int — older segments keep b
    log.append(spark.range(3).selectExpr("cast(id as int) AS a", "id AS k"), epoch_id=2)
    got = log.read()
    assert [f.name for f in got.schema.fields] == ["a", "k", "b"]
    assert dict((f.name, f.dataType.typeName()) for f in got.schema.fields)["a"] == "long"
    assert got.count() == 9
    assert got.filter("b IS NOT NULL").count() == 3
    with pytest.raises(ValueError, match="incompatible"):
        log.append(spark.range(3).selectExpr("cast(id as string) AS a", "id AS k"),
                   epoch_id=3)


def test_dead_letter_append_is_epoch_fenced(spark, tmp_path):
    """A replayed foreachBatch epoch must not duplicate quarantine rows
    (the dead-letter append runs BEFORE the merge commit, so replays of
    the same epoch are the NORMAL crash-recovery path)."""
    from movex_cdc_spark.operators.apply import DeadLetterTable

    dl = DeadLetterTable(spark, str(tmp_path / "dl"))
    poison = spark.range(5).selectExpr(
        "id AS seq", "'r' AS repo", "'p' AS path",
        "cast(null as string) AS content", "'U' AS op", "'no content' AS error_msg",
    )
    assert dl.append(poison, stream_id="s", epoch_id=7) == 5
    # crash replay of epoch 7: metadata no-op, zero new rows
    assert dl.append(poison, stream_id="s", epoch_id=7) == 0
    assert dl.read().count() == 5
    assert dl.append(poison, stream_id="s", epoch_id=8) == 5
    assert dl.read().count() == 10


def test_unkeyed_log_crash_between_write_and_commit_recovers(spark, tmp_path):
    """The ADVICE-medium crash window: data files written, metadata
    commit never happened. The orphan segment dir must never be listed,
    and the REPLAYED epoch must succeed (uuid segment names make the
    rewrite collision-free) with exactly-once content."""
    import os

    log = UnkeyedEventLog.create(spark, str(tmp_path / "ulog"))
    df = spark.range(10).selectExpr("id", "cast(id as string) AS v")
    # simulate the crashed attempt: a segment dir for the NEXT version
    # exists on disk but was never committed
    orphan = str(tmp_path / "ulog" / "seg-1-deadbeef")
    df.write.parquet(orphan)
    # replay of the same epoch: must not collide with the orphan
    r = log.append(df, stream_id="s", epoch_id=0)
    assert not r.get("skipped") and r["version"] == 1
    assert log.read().count() == 10  # orphan rows are NOT double-counted
    assert os.path.isdir(orphan)  # orphan simply stays unlisted
    listed_dirs = {f.split(os.sep)[0] for f in log.meta()["files"]}
    assert "seg-1-deadbeef" not in listed_dirs


def test_expire_segments_reaps_fenced_orphans(spark, tmp_path):
    """Regression: a fenced-out concurrent appender (its epoch won by a
    rival) leaves its uuid-named segment dir on disk, never listed —
    under concurrent dispatch that's normal operation, and the dirs
    leaked forever. expire_segments must reap them, but only TWO-PHASE
    (observe, then reap after keep_last more versions): a dir unlisted
    once may be an in-flight append that hasn't committed yet."""
    import os

    log = UnkeyedEventLog.create(spark, str(tmp_path / "log"))
    df = spark.range(5).selectExpr("id as a")
    log.append(df, stream_id="s", epoch_id=0)
    # the fenced-out loser: segment written, metadata commit never won
    orphan_files = log._write_segment(df, log.meta()["version"] + 1)
    orphan_dir = os.path.join(str(tmp_path / "log"),
                              orphan_files[0].split(os.sep, 1)[0])
    assert os.path.isdir(orphan_dir)
    # phase 1: observed, NOT reaped (could be an in-flight append)
    assert log.expire_segments(keep_last=1) == 0
    assert os.path.isdir(orphan_dir)
    # the log advances past the retention horizon
    log.append(df, stream_id="s", epoch_id=1)
    log.append(df, stream_id="s", epoch_id=2)
    # ADVICE r6 (medium): version distance alone is NOT writer
    # liveness — concurrent dispatch can advance the version past
    # keep_last while a large segment is still being written. With the
    # default wall-clock horizon the (young) orphan must SURVIVE even
    # though it cleared the two-phase version window.
    assert log.expire_segments(keep_last=1) == 0
    assert os.path.isdir(orphan_dir)
    # phase 2: unlisted across the version window AND older than the
    # age horizon -> reaped
    assert log.expire_segments(keep_last=1, orphan_min_age_s=0.0) == 1
    assert not os.path.isdir(orphan_dir)
    # committed data untouched
    assert log.read().count() == 15
