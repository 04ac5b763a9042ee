"""Streaming shell: checkpointed foreachBatch apply, resume, and the
crash-window replay (reference ST2/ST11 exactly-once semantics)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from movex_cdc_spark.datagen import (
    GenParams,
    generate_base_snapshot,
    generate_events,
    replay_oracle,
)
from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import KEY_COLS, REPO_FILES_SCHEMA
from movex_cdc_spark.sources.events import write_event_files
from movex_cdc_spark.streaming.pipeline import CdcStreamPipeline
from movex_cdc_spark.streaming.lineage import MetricsTable


@pytest.fixture()
def env(spark, tmp_path):
    p = GenParams(n_events=3000)
    ev = generate_events(p)
    base = generate_base_snapshot(p)
    t = LakeTable.create(spark, str(tmp_path / "lake"), REPO_FILES_SCHEMA, KEY_COLS, n_buckets=8)
    bs = spark.createDataFrame(base.drop(columns=["last_seq", "deleted"])).withColumn(
        "content_sha", F.sha2("content", 256)
    )
    t.overwrite(bs)
    return p, ev, base, t, tmp_path


def _pipeline(spark, t, tmp_path, **kw):
    return CdcStreamPipeline(
        spark,
        t,
        events_dir=str(tmp_path / "events"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dead_letter_dir=str(tmp_path / "dl"),
        metrics_dir=str(tmp_path / "metrics"),
        max_files_per_trigger=2,
        **kw,
    )


def _assert_final(spark, t, base, ev):
    final = t.read().select("repo", "path", "content_sha").toPandas()
    oracle = replay_oracle(base, ev)[["repo", "path", "content_sha"]]
    m = final.merge(oracle, on=["repo", "path"], how="outer", indicator=True, suffixes=("_e", "_o"))
    assert (m["_merge"] == "both").all()
    assert (m["content_sha_e"] == m["content_sha_o"]).all()


def test_stream_drain_and_resume(spark, env):
    p, ev, base, t, tmp_path = env
    half = len(ev) // 2
    write_event_files(ev.iloc[:half], str(tmp_path / "events"), n_files=4)

    pipe = _pipeline(spark, t, tmp_path)
    epochs = pipe.run_available_now()
    assert len(epochs) >= 2  # maxFilesPerTrigger=2 over 4 files
    _assert_final(spark, t, base, ev.iloc[:half])

    # new files land; resume from the same checkpoint processes ONLY them
    write_event_files(ev.iloc[half:], str(tmp_path / "events"), n_files=2, prefix="late")
    pipe2 = _pipeline(spark, t, tmp_path)
    pipe2.run_available_now()
    _assert_final(spark, t, base, ev)

    # metrics/lineage rows recorded with max applied seq per epoch
    mt = MetricsTable(spark, str(tmp_path / "metrics")).read()
    rows = mt.orderBy("epoch_id").collect()
    assert sum(r["events"] for r in rows) > 0
    assert max(r["max_seq"] for r in rows) == ev["seq"].max()
    assert all(r["buckets_touched"] <= 8 for r in rows)
    # persisted rows are self-describing about what `events` counts
    # (ADVICE r4): the streaming fast path rides the probe, pre-LWW
    assert all(r["counter_scope"] == "valid_events_pre_dedup" for r in rows)


def test_crash_window_replay_is_idempotent(spark, env):
    """Delete the checkpoint's last commit marker after a successful
    run — Spark then RE-EXECUTES that epoch on restart (the reference's
    crash between Kafka commit and queue delete). The epoch fence must
    turn the replay into a no-op: same final state, no extra version."""
    p, ev, base, t, tmp_path = env
    write_event_files(ev, str(tmp_path / "events"), n_files=4)
    pipe = _pipeline(spark, t, tmp_path)
    pipe.run_available_now()
    _assert_final(spark, t, base, ev)
    v = t.current_version()

    commits = sorted(
        f for f in os.listdir(str(tmp_path / "ckpt" / "commits")) if not f.startswith(".")
    )
    os.remove(str(tmp_path / "ckpt" / "commits" / commits[-1]))
    crc = tmp_path / "ckpt" / "commits" / f".{commits[-1]}.crc"
    if crc.exists():  # hadoop checksum shadow file goes with it
        os.remove(str(crc))

    pipe2 = _pipeline(spark, t, tmp_path)
    epochs = pipe2.run_available_now()
    assert any(e.get("skipped") for e in epochs), "replayed epoch was not fenced"
    assert t.current_version() == v
    _assert_final(spark, t, base, ev)


def test_rollup(spark, env):
    p, ev, base, t, tmp_path = env
    write_event_files(ev, str(tmp_path / "events"), n_files=3)
    pipe = _pipeline(spark, t, tmp_path)
    pipe.run_available_now()
    mt = MetricsTable(spark, str(tmp_path / "metrics"))
    per_epoch = mt.read().agg(F.sum("events")).collect()[0][0]
    rolled = mt.rollup("1 hour").agg(F.sum("events")).collect()[0][0]
    assert per_epoch == rolled
