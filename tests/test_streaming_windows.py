"""Event-time streaming surface: watermarked windowed aggregation and
the applyInPandasWithState gap-sessionizer (state across micro-batches)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movex_cdc_spark.streaming.windows import (
    SESSION_GAP_S,
    gap_sessionize_stateful,
    streaming_hourly_stats,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _stage_time_ordered(tmp_path, n_files=3, sf="0.001"):
    """Events, globally time-sorted, split into consecutive
    time-ordered files (the file stream then delivers per-key rows in
    event-time order across triggers)."""
    ev = pd.read_parquet(f"/root/testdata/sf{sf}/events.parquet").sort_values("ts")
    d = str(tmp_path / "events")
    os.makedirs(d, exist_ok=True)
    step = (len(ev) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = ev.iloc[i * step:(i + 1) * step]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            os.path.join(d, f"ev-{i:03d}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    return ev, d


def test_streaming_hourly_stats_watermark(spark, tmp_path):
    ev, d = _stage_time_ordered(tmp_path)
    q = streaming_hourly_stats(
        spark, d, str(tmp_path / "ckpt"), str(tmp_path / "out"),
        EVENTS_SCHEMA, watermark="2 hours", window="1 hour",
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(got) > 0

    # every emitted row must equal the batch aggregation for its window
    # (value is summed as DECIMAL(18,2) in the engine -> mirror with 2dp)
    ev2 = ev.copy()
    ev2["value"] = ev2["value"].round(2)
    ev2["window_start"] = ev2["ts"].dt.floor("h")
    batch = (
        ev2.groupby(["window_start", "event_type"])
        .agg(events=("event_id", "size"), sum_value=("value", "sum"),
             max_seq=("event_id", "max"))
        .reset_index()
    )
    m = got.merge(batch, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    assert len(m) == len(got)
    assert (m["events_s"] == m["events_b"]).all()
    assert (m["max_seq_s"] == m["max_seq_b"]).all()
    assert (m["sum_value_s"] - m["sum_value_b"]).abs().max() < 1e-6

    # append mode: only windows the watermark closed are emitted — no
    # window end may exceed the final watermark's upper bound
    final_wm = ev["ts"].max() - pd.Timedelta("2 hours")
    assert (got["window_start"] + pd.Timedelta("1 hour") <= final_wm + pd.Timedelta("1 hour")).all()
    # windows closed well before the penultimate trigger are all present
    early_cut = ev["ts"].quantile(0.6) - pd.Timedelta("3 hours")
    expected_early = batch[batch["window_start"] + pd.Timedelta("1 hour") < early_cut]
    missing = expected_early.merge(got, on=["window_start", "event_type"], how="left",
                                   indicator=True)
    assert (missing["_merge"] == "both").all()


def test_gap_sessionize_stateful_across_batches(spark, tmp_path):
    # sf0.01: 150 users whose events straddle many >1h gaps, so sessions
    # close inside the stream (sf0.001 has one open session per user)
    ev, d = _stage_time_ordered(tmp_path, sf="0.01")
    q = gap_sessionize_stateful(
        spark, d, str(tmp_path / "ckpt"), str(tmp_path / "out"), EVENTS_SCHEMA
    )
    q.awaitTermination(300)
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )

    # pandas mirror: (ts, event_id)-ordered gap sessionization over
    # integer microseconds (the engine's exact total order + precision);
    # the engine emits a session only when its closing gap is SEEN, so
    # each user's final (still-open) session is not in the output
    rows = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("datetime64[ns]").astype("int64") // 1000
        new = (ts.diff() > SESSION_GAP_S * 1_000_000).cumsum()
        for sid, s in g.groupby(new.values):
            rows.append((uid, int(sid), len(s), int(s["event_id"].iloc[0]),
                         int(s["event_id"].iloc[-1])))
    mirror = pd.DataFrame(
        rows, columns=["user_id", "session_id", "events_in_session",
                       "first_seq", "last_seq"],
    )
    closed = mirror[
        mirror.groupby("user_id")["session_id"].transform("max") != mirror["session_id"]
    ].reset_index(drop=True)
    assert len(got) == len(closed) > 0
    merged = got.merge(closed, on=["user_id", "session_id"], suffixes=("_s", "_m"))
    assert len(merged) == len(got)
    for c in ("events_in_session", "first_seq", "last_seq"):
        assert (merged[f"{c}_s"] == merged[f"{c}_m"]).all()

    # multi-batch statefulness actually exercised: at least one emitted
    # session must SPAN a file boundary (state carried across triggers)
    file_maxes = []
    for i in range(3):
        f = pd.read_parquet(os.path.join(d, f"ev-{i:03d}.parquet"))
        file_maxes.append(f["ts"].max())
    spans = 0
    per_file = pd.read_parquet(d)  # noqa: F841 (sanity: dir readable)
    for _, r in got.iterrows():
        t_first = ev.loc[ev["event_id"] == r["first_seq"], "ts"].iloc[0]
        t_last = ev.loc[ev["event_id"] == r["last_seq"], "ts"].iloc[0]
        if any(t_first <= fm < t_last for fm in file_maxes[:-1]):
            spans += 1
    assert spans > 0


def _write_events(pdf, path):
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), path,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )


def test_gap_sessionize_ties_and_multichunk(spark, tmp_path):
    # one user, 50 sessions x 60 events; every 3 consecutive events share
    # a timestamp (ties) and event ids are scrambled vs time, with the
    # FILE rows ordered by id (not time) and Arrow forced to deliver the
    # group as many small chunks: only a global (ts, event_id) sort over
    # the concatenated chunks sessionizes this correctly.
    n_sessions, per = 50, 60
    n = n_sessions * per
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for s in range(n_sessions):
        for j in range(per):
            i = s * per + j
            rows.append((
                (i * 7) % n,  # gcd(7, 3000) = 1 -> unique scrambled ids
                base + pd.Timedelta(hours=2 * s, seconds=10 * (j // 3)),
                1, "tick", float(i), "{}",
            ))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).sort_values("event_id").reset_index(drop=True)
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_events(ev, os.path.join(d, "ev-000.parquet"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    try:
        q = gap_sessionize_stateful(
            spark, d, str(tmp_path / "ckpt"), str(tmp_path / "out"), EVENTS_SCHEMA
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .toPandas().sort_values("session_id").reset_index(drop=True)
    )
    assert len(got) == n_sessions - 1  # last session stays open
    assert (got["events_in_session"] == per).all()
    # tie-break contract: first_seq = MIN id inside the session's first
    # tied-timestamp triplet, last_seq = MAX id inside its last triplet
    for s in range(n_sessions - 1):
        first_ids = [((s * per + j) * 7) % n for j in range(3)]
        last_ids = [((s * per + j) * 7) % n for j in (per - 3, per - 2, per - 1)]
        row = got[got["session_id"] == s].iloc[0]
        assert row["first_seq"] == min(first_ids)
        assert row["last_seq"] == max(last_ids)


def test_gap_sessionize_rejects_out_of_order_batches(spark, tmp_path):
    # file with LATER events gets the older mtime -> the file stream
    # delivers it first, so batch 2 violates the cross-batch ordering
    # contract and the hook must fail LOUD, not mis-sessionize.
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet").sort_values("ts")
    d = str(tmp_path / "events")
    os.makedirs(d)
    half = len(ev) // 2
    _write_events(ev.iloc[half:], os.path.join(d, "ev-000-late.parquet"))
    _write_events(ev.iloc[:half], os.path.join(d, "ev-001-early.parquet"))
    now = os.stat(os.path.join(d, "ev-001-early.parquet")).st_mtime
    os.utime(os.path.join(d, "ev-000-late.parquet"), (now - 100, now - 100))

    import pytest

    q = gap_sessionize_stateful(
        spark, d, str(tmp_path / "ckpt"), str(tmp_path / "out"), EVENTS_SCHEMA,
        max_files_per_trigger=1,
    )
    with pytest.raises(Exception, match="out-of-order batch"):
        q.awaitTermination(300)


def test_gap_sessionize_idle_timeout_flushes_state(spark, tmp_path):
    """Event-time state timeout: a key idle past the timeout has its
    open session FLUSHED and its state dropped when the watermark
    passes — state tracks active keys (the 100-TB guard). Active keys
    keep their open session un-emitted, and gap-closed sessions emit
    exactly as without the timeout."""
    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = []
    # user 1: 5 events, then idle forever (file 1 only)
    for j in range(5):
        rows.append((100 + j, base + pd.Timedelta(minutes=j), 1, "tick", 0.0, "{}"))
    # user 2: 3 events in file 1 ...
    for j in range(3):
        rows.append((200 + j, base + pd.Timedelta(minutes=j), 2, "tick", 0.0, "{}"))
    f1 = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    # ... and 4 events 10h later in file 2 (closes session 0 by gap,
    # advances the watermark far past user 1's last event + timeout)
    rows2 = [
        (210 + j, base + pd.Timedelta(hours=10, minutes=j), 2, "tick", 0.0, "{}")
        for j in range(4)
    ]
    f2 = pd.DataFrame(rows2, columns=f1.columns)
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_events(f1, os.path.join(d, "ev-000.parquet"))
    _write_events(f2, os.path.join(d, "ev-001.parquet"))
    now = os.stat(os.path.join(d, "ev-001.parquet")).st_mtime
    os.utime(os.path.join(d, "ev-000.parquet"), (now - 100, now - 100))

    q = gap_sessionize_stateful(
        spark, d, str(tmp_path / "ckpt"), str(tmp_path / "out"), EVENTS_SCHEMA,
        max_files_per_trigger=1, idle_timeout_s=2 * 3600,
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)

    # user 1: open session flushed by TIMEOUT (no closing gap ever seen)
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 1
    assert u1.iloc[0][["session_id", "events_in_session", "first_seq", "last_seq"]].tolist() == [0, 5, 100, 104]
    # user 2: session 0 closed by the gap; session 1 still open and
    # ACTIVE at stream end -> not emitted
    u2 = got[got["user_id"] == 2]
    assert len(u2) == 1
    assert u2.iloc[0][["session_id", "events_in_session", "first_seq", "last_seq"]].tolist() == [0, 3, 200, 202]


def test_state_schema_guard_fails_fast_with_remedy(spark, tmp_path):
    """Resuming a sessionizer checkpoint created under a DIFFERENT state
    schema (or a pre-guard checkpoint with unstamped state) must fail at
    START with the documented fresh-checkpoint remedy, not Spark's
    opaque state-compat error mid-stream (VERDICT r04 item 5)."""
    import json

    import pytest

    ev, d = _stage_time_ordered(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    q = gap_sessionize_stateful(
        spark, d, ckpt, str(tmp_path / "out"), EVENTS_SCHEMA
    )
    q.awaitTermination(300)

    # same-schema resume: guard is silent (stamp matches)
    q2 = gap_sessionize_stateful(
        spark, d, ckpt, str(tmp_path / "out"), EVENTS_SCHEMA
    )
    q2.awaitTermination(300)

    # old-schema checkpoint: rewrite the stamp as the r3-era schema
    stamp = os.path.join(ckpt, "_movex_state_schema.json")
    old = json.load(open(stamp))
    old["fields"] = [
        {"name": "last_ts", "type": "double", "nullable": True, "metadata": {}}
        if f["name"] == "last_ts_us" else f
        for f in old["fields"]
    ]
    json.dump(old, open(stamp, "w"))
    with pytest.raises(RuntimeError, match="FRESH checkpoint dir"):
        gap_sessionize_stateful(
            spark, d, ckpt, str(tmp_path / "out2"), EVENTS_SCHEMA
        )

    # pre-guard checkpoint: state exists but no stamp at all
    os.remove(stamp)
    with pytest.raises(RuntimeError, match="pre-guard"):
        gap_sessionize_stateful(
            spark, d, ckpt, str(tmp_path / "out3"), EVENTS_SCHEMA
        )


def test_sessionize_backfill_routes_and_matches_stateful(spark, tmp_path):
    """Routed bounded backfill: the SQL window path must produce the
    IDENTICAL closed-session set as the stateful operator on the same
    input, and the router must pick SQL below the events/key threshold
    and stateful above it (VERDICT r04 item 8)."""
    from movex_cdc_spark.streaming.windows import sessionize_backfill

    ev, d = _stage_time_ordered(tmp_path, sf="0.01")

    # force both paths over the same input
    r_sql = sessionize_backfill(
        spark, d, str(tmp_path / "ck1"), str(tmp_path / "out_sql"), EVENTS_SCHEMA,
        events_per_key_threshold=float("inf"),
    )
    assert r_sql["path"] == "sql"
    r_st = sessionize_backfill(
        spark, d, str(tmp_path / "ck2"), str(tmp_path / "out_st"), EVENTS_SCHEMA,
        events_per_key_threshold=0.0,
    )
    assert r_st["path"] == "stateful"

    a = (
        spark.read.parquet(str(tmp_path / "out_sql")).toPandas()
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    b = (
        spark.read.parquet(str(tmp_path / "out_st")).toPandas()
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)


def test_sessionize_backfill_identity_under_scrambled_ids(spark, tmp_path):
    """The SQL twin must match the stateful operator when event ids are
    NOT time-monotone within a session (ids are global, time is
    per-user): first/last_seq follow (ts, event_id) order, not
    min/max(event_id). Same adversarial shape as the ties/multichunk
    test — id wrap mid-session breaks a min/max implementation."""
    from movex_cdc_spark.streaming.windows import sessionize_backfill

    n_sessions, per = 10, 30
    n = n_sessions * per
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for s in range(n_sessions):
        for j in range(per):
            i = s * per + j
            rows.append((
                (i * 7) % n,  # gcd(7, 300) = 1 -> unique scrambled ids
                base + pd.Timedelta(hours=2 * s, seconds=10 * (j // 3)),
                1, "tick", float(i), "{}",
            ))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).sort_values("event_id").reset_index(drop=True)
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_events(ev, os.path.join(d, "ev-000.parquet"))

    r_sql = sessionize_backfill(
        spark, d, str(tmp_path / "ck1"), str(tmp_path / "out_sql"), EVENTS_SCHEMA,
        events_per_key_threshold=float("inf"),
    )
    r_st = sessionize_backfill(
        spark, d, str(tmp_path / "ck2"), str(tmp_path / "out_st"), EVENTS_SCHEMA,
        events_per_key_threshold=0.0,
    )
    assert (r_sql["path"], r_st["path"]) == ("sql", "stateful")
    a = (
        spark.read.parquet(str(tmp_path / "out_sql")).toPandas()
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    b = (
        spark.read.parquet(str(tmp_path / "out_st")).toPandas()
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    assert len(a) == len(b) == n_sessions - 1
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)


def test_sessionize_backfill_route_flip_clears_stale_sql_output(spark, tmp_path):
    """ADVICE r5: the SQL route overwrites out_dir; the stateful route
    appends through the streaming sink's _spark_metadata log. Re-running
    a backfill after input growth flips the route sql->stateful must
    clear the prior SQL files — otherwise NON-Spark readers (a plain
    file listing / pandas / the DuckDB oracle) see duplicate session
    rows. A resuming stateful out_dir (has _spark_metadata) must NOT be
    cleared."""
    import glob

    from movex_cdc_spark.streaming.windows import sessionize_backfill

    ev, d = _stage_time_ordered(tmp_path, sf="0.001")
    out = str(tmp_path / "out")

    r1 = sessionize_backfill(
        spark, d, str(tmp_path / "ck1"), out, EVENTS_SCHEMA,
        events_per_key_threshold=float("inf"),
    )
    assert r1["path"] == "sql"
    n_sessions = spark.read.parquet(out).count()
    assert n_sessions > 0

    r2 = sessionize_backfill(
        spark, d, str(tmp_path / "ck2"), out, EVENTS_SCHEMA,
        events_per_key_threshold=0.0,
    )
    assert r2["path"] == "stateful"
    # raw file-level read (what a non-Spark consumer sees): exactly the
    # stateful result once, no SQL leftovers alongside
    raw = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(out, "*.parquet"))],
        ignore_index=True,
    )
    assert len(raw) == n_sessions
    assert not raw.duplicated(["user_id", "session_id"]).any()

    # a THIRD run (still stateful) resumes against its own sink output:
    # out_dir has _spark_metadata now, must survive the pre-clear and
    # the checkpoint makes the rerun a no-op, not a duplication
    r3 = sessionize_backfill(
        spark, d, str(tmp_path / "ck2"), out, EVENTS_SCHEMA,
        events_per_key_threshold=0.0,
    )
    assert r3["path"] == "stateful"
    raw3 = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(out, "*.parquet"))],
        ignore_index=True,
    )
    assert len(raw3) == n_sessions


def test_rocksdb_state_store_is_engine_default(spark, tmp_path):
    """VERDICT r5 item 3: the stateful family must run on the RocksDB
    state store by default (state scales with local disk, not executor
    heap). The session carries the provider conf; a run's checkpoint
    shows the RocksDB layout (zip'd version uploads, not the in-heap
    provider's .delta files)."""
    import glob

    from movex_cdc_spark.session import (
        DEFAULT_STATE_STORE,
        STATE_STORE_PROVIDERS,
    )
    from movex_cdc_spark.streaming.windows import gap_sessionize_stateful

    assert DEFAULT_STATE_STORE == "rocksdb"
    assert set(STATE_STORE_PROVIDERS) == {"rocksdb", "hdfs"}
    assert spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    ).endswith("RocksDBStateStoreProvider")

    ev, d = _stage_time_ordered(tmp_path, n_files=1, sf="0.001")
    ck = str(tmp_path / "ck")
    q = gap_sessionize_stateful(spark, d, ck, str(tmp_path / "out"), EVENTS_SCHEMA)
    q.awaitTermination(120)
    # RocksDB layout under changelog checkpointing: per-version
    # .changelog uploads (+ periodic .zip snapshots); the in-heap
    # provider writes .delta files instead
    rocks = glob.glob(os.path.join(ck, "state", "0", "*", "*.changelog")) + glob.glob(
        os.path.join(ck, "state", "0", "*", "*.zip")
    )
    deltas = glob.glob(os.path.join(ck, "state", "0", "*", "*.delta"))
    assert rocks and not deltas


def test_sessionize_backfill_route_flip_back_with_stale_checkpoint(spark, tmp_path):
    """Regression: r1 stateful commits checkpoint ck and writes out
    (with _spark_metadata); r2 SQL route overwrites out (wiping
    _spark_metadata); r3 stateful with the SAME ck used to clear only
    out_dir — the fully-committed checkpoint then resumed over the
    empty dir and emitted NOTHING, losing the whole backfill. The
    pre-clear must wipe the stale checkpoint too, so r3 recomputes the
    full result."""
    import glob

    from movex_cdc_spark.streaming.windows import sessionize_backfill

    ev, d = _stage_time_ordered(tmp_path, sf="0.001")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    r1 = sessionize_backfill(spark, d, ck, out, EVENTS_SCHEMA,
                             events_per_key_threshold=0.0)
    assert r1["path"] == "stateful"
    n = spark.read.parquet(out).count()
    assert n > 0

    r2 = sessionize_backfill(spark, d, ck, out, EVENTS_SCHEMA,
                             events_per_key_threshold=float("inf"))
    assert r2["path"] == "sql"

    r3 = sessionize_backfill(spark, d, ck, out, EVENTS_SCHEMA,
                             events_per_key_threshold=0.0)
    assert r3["path"] == "stateful"
    raw3 = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(out, "*.parquet"))],
        ignore_index=True,
    )
    assert len(raw3) == n
    assert not raw3.duplicated(["user_id", "session_id"]).any()


def test_sessionize_backfill_fresh_checkpoint_recomputes(spark, tmp_path):
    """Regression: rerunning a stateful backfill over the SAME out_dir
    with a FRESH checkpoint used to emit nothing — the new query
    renumbers batches from 0 and FileStreamSink dedups on batch id
    against the out_dir's existing _spark_metadata, silently skipping
    every batch. A resume is only the matched (sink metadata,
    checkpoint) PAIR; a fresh checkpoint must trigger a full
    recompute that covers input added since the first run."""
    import glob

    from movex_cdc_spark.streaming.windows import sessionize_backfill

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet").sort_values("ts")
    d = str(tmp_path / "events")
    os.makedirs(d, exist_ok=True)
    half = len(ev) // 2
    pq.write_table(pa.Table.from_pandas(ev.iloc[:half], preserve_index=False),
                   os.path.join(d, "ev-000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path / "out")
    r1 = sessionize_backfill(spark, d, str(tmp_path / "ck_a"), out,
                             EVENTS_SCHEMA, events_per_key_threshold=0.0)
    assert r1["path"] == "stateful"
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # the input GROWS, and the rerun arrives with a fresh checkpoint
    pq.write_table(pa.Table.from_pandas(ev.iloc[half:], preserve_index=False),
                   os.path.join(d, "ev-001.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    r2 = sessionize_backfill(spark, d, str(tmp_path / "ck_b"), out,
                             EVENTS_SCHEMA, events_per_key_threshold=0.0)
    assert r2["path"] == "stateful"

    # reference: one clean full-input run in fresh dirs
    sessionize_backfill(spark, d, str(tmp_path / "ck_ref"),
                        str(tmp_path / "out_ref"), EVENTS_SCHEMA,
                        events_per_key_threshold=0.0)
    n2 = spark.read.parquet(out).count()
    n_ref = spark.read.parquet(str(tmp_path / "out_ref")).count()
    assert n2 == n_ref
    assert n2 > n1  # the grown input's sessions actually landed
    # raw file-level view agrees (no duplicate leftovers either)
    raw = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(out, "*.parquet"))],
        ignore_index=True,
    )
    assert len(raw) == n_ref
