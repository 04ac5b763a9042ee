"""End-to-end exactly-once under ADVERSARIAL redelivery (VERDICT r6
item 1) — the engine's analog of the reference's blackbox proof
(test_blackbox/run_blackbox_test.sh + kafka_mock.rb:49-63 KafkaMock
redelivery semantics):

  producer (KafkaEnvelopeWriter wire bytes)
    → hostile hop (duplicates AT and ACROSS epoch boundaries,
      whole-epoch replays, wholesale reordering)
    → consumer (parse_envelope_wire + watermark id-dedup guard)
    → final state hash-identical to the unmolested direct path.
"""

import os
import shutil
import time

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movex_cdc_spark.datagen import (
    GenParams,
    generate_base_snapshot,
    generate_events,
    replay_oracle,
)
from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import KEY_COLS, REPO_FILES_SCHEMA
from movex_cdc_spark.sources.events import (
    PAYLOAD_EVENTS_SCHEMA,
    read_events_stream,
    stage_payload_events,
    to_payload_events,
    write_event_files,
)
from movex_cdc_spark.sources.kafka import (
    adversarial_deliveries,
    hostile_kafka_hop,
    parse_envelope_wire,
)
from movex_cdc_spark.streaming.pipeline import CdcStreamPipeline
from movex_cdc_spark.streaming.sink import KafkaEnvelopeWriter

WIRE_SCHEMA = T.StructType(
    [T.StructField("key", T.BinaryType()), T.StructField("value", T.BinaryType())]
)


def _change_events(spark, n=3000, seed=31):
    """Change-event frame with CONTROLLED event times: one event per
    minute so epoch tails and watermark slack are exact."""
    ev = generate_events(GenParams(n_events=n, seed=seed)).drop(columns=["is_noop"])
    return spark.createDataFrame(ev).withColumn(
        "ts", F.timestamp_micros((F.col("seq") * 60_000_000).cast("long"))
    )


def _stage_deliveries(tmp_path, deliveries):
    topic = str(tmp_path / "topic")
    os.makedirs(topic, exist_ok=True)
    now = time.time()
    for i, d in enumerate(deliveries):
        stage = str(tmp_path / f"stage_{i}")
        d.coalesce(1).write.parquet(stage)
        part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
        dst = os.path.join(topic, f"d-{i:03d}.parquet")
        os.replace(os.path.join(stage, part), dst)
        os.utime(dst, (now - 600 + i * 100, now - 600 + i * 100))
        shutil.rmtree(stage, ignore_errors=True)
    return topic


def _consume(spark, tmp_path, topic, name):
    """The consumer pipeline under test: streaming read of the staged
    topic, envelope parse, watermarked id-dedup guard."""
    env = parse_envelope_wire(
        spark.readStream.schema(WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    ).withColumn(
        "__ts",
        F.to_timestamp(F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"),
    )
    out_dir = str(tmp_path / f"out_{name}")
    q = (
        env.withWatermark("__ts", "2 hours")
        .dropDuplicatesWithinWatermark(["id"])
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    return spark.read.parquet(out_dir)


def _final_state(envelopes):
    w = Window.partitionBy("msg_key").orderBy(F.col("id").desc())
    return (
        envelopes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("operation") != "DELETE"))
        .select("msg_key", F.col("id").alias("last_seq"), "new_payload")
        .orderBy("msg_key")
    )


def _wire_epochs(spark, ev, writer, n_epochs=3):
    """Seq-contiguous epochs (ts is seq-derived, so also time-ordered),
    each the producer's exact wire bytes + event time for the adversary."""
    mx = ev.agg(F.max("seq")).first()[0]
    cut = mx // n_epochs + 1
    epochs = []
    for i in range(n_epochs):
        sl = ev.filter(
            (F.col("seq") >= i * cut) & (F.col("seq") < (i + 1) * cut)
        )
        wire, _ = writer.kafka_frames(sl)
        epochs.append(
            wire.withColumn(
                "__ts",
                F.to_timestamp(
                    F.get_json_object(F.col("value").cast("string"), "$.timestamp"),
                    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                ),
            )
        )
    return epochs


def test_redelivery_eos_final_state_identical_to_direct(spark, tmp_path):
    """The headline chain: duplicates in-epoch, cross-epoch tail
    replays (boundary record always re-crossed), wholesale reorder —
    the consumer's final state must be IDENTICAL to the direct path's,
    and the adversary must provably have injected something."""
    ev = _change_events(spark)
    writer = KafkaEnvelopeWriter(spark, "test://", "envelopes")
    epochs = _wire_epochs(spark, ev, writer)

    direct = [e.select("key", "value") for e in epochs]
    hostile = adversarial_deliveries(epochs, dup_mod=5, replay_tail_s=3600)

    n_direct = sum(d.count() for d in direct)
    n_hostile = sum(d.count() for d in hostile)
    assert n_hostile > n_direct  # the adversary really injected

    t_direct = _stage_deliveries(tmp_path / "direct", direct)
    t_hostile = _stage_deliveries(tmp_path / "hostile", hostile)
    out_direct = _consume(spark, tmp_path, t_direct, "direct")
    out_hostile = _consume(spark, tmp_path, t_hostile, "hostile")

    # the guard collapsed every duplicate: exact envelope-set identity
    assert out_hostile.count() == out_direct.count() == n_direct
    a = _final_state(out_direct).toPandas()
    b = _final_state(out_hostile).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_whole_epoch_replay_and_boundary_duplicates(spark, tmp_path):
    """The Spark-task-retry / offset-rewind shape: delivery i+1 opens
    with epoch i's ENTIRE wire frame again (so every boundary record is
    duplicated exactly at the epoch boundary), then epoch i+1. The
    consumer must emit each envelope exactly once."""
    ev = _change_events(spark, n=1200, seed=33)
    writer = KafkaEnvelopeWriter(spark, "test://", "envelopes")
    epochs = _wire_epochs(spark, ev, writer)
    wires = [e.select("key", "value") for e in epochs]
    deliveries = [wires[0]]
    for prev, cur in zip(wires, wires[1:]):
        deliveries.append(prev.unionAll(cur))  # full replay + fresh epoch
    topic = _stage_deliveries(tmp_path, deliveries)
    out = _consume(spark, tmp_path, topic, "replay")
    n_unique = sum(w.count() for w in wires)
    assert out.count() == n_unique
    assert out.select("id").distinct().count() == n_unique


def test_hostile_inbound_hop_pipeline_converges(spark, tmp_path):
    """The INBOUND queue under the same license: the event stream rides
    hostile_kafka_hop (every 3rd record redelivered) into the real
    CdcStreamPipeline; the merged table must equal the direct drain and
    the pure-pandas replay oracle — duplicates collapse in LWW, replays
    fence at the sink."""
    p = GenParams(n_events=2500, seed=35)
    ev = generate_events(p)
    base = generate_base_snapshot(p)
    write_event_files(ev, str(tmp_path / "cols"), n_files=3)
    stage_payload_events(spark, str(tmp_path / "cols"), str(tmp_path / "events"))

    finals = {}
    for mode in ("direct", "hostile"):
        t = LakeTable.create(
            spark, str(tmp_path / f"lake_{mode}"), REPO_FILES_SCHEMA, KEY_COLS,
            n_buckets=8,
        )
        t.overwrite(
            spark.createDataFrame(
                base.drop(columns=["last_seq", "deleted"])
            ).withColumn("content_sha", F.sha2("content", 256))
        )
        raw = read_events_stream(
            spark, str(tmp_path / "events"), 1, schema=PAYLOAD_EVENTS_SCHEMA
        )
        src = hostile_kafka_hop(raw, dup_mod=3, scramble=False) if mode == "hostile" else None
        pipe = CdcStreamPipeline(
            spark, t, str(tmp_path / "events"), str(tmp_path / f"ckpt_{mode}"),
            dead_letter_dir=str(tmp_path / f"dl_{mode}"),
            max_files_per_trigger=1, payload_format=True, source_df=src,
        )
        pipe.run_available_now()
        finals[mode] = (
            t.read().select("repo", "path", "content_sha")
            .orderBy("repo", "path").toPandas()
        )
    pd.testing.assert_frame_equal(finals["direct"], finals["hostile"])
    oracle = replay_oracle(base, ev)[["repo", "path", "content_sha"]]
    m = finals["hostile"].merge(
        oracle, on=["repo", "path"], how="outer", indicator=True,
        suffixes=("_e", "_o"),
    )
    assert (m["_merge"] == "both").all()
    assert (m["content_sha_e"] == m["content_sha_o"]).all()
