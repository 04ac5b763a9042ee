"""Cluster entry point for the CDC pipeline (the north rule's
``spark-submit --py-files`` launch path).

    # package the engine once
    (cd /path/to/repo && zip -qr /tmp/movex_cdc_spark.zip movex_cdc_spark)

    spark-submit --master yarn --deploy-mode client \\
        --py-files /tmp/movex_cdc_spark.zip \\
        run_pipeline.py \\
        --events-dir  /mnt/shared/events_json \\
        --table-dir   /mnt/shared/lake/repo_files \\
        --checkpoint-dir /mnt/shared/ckpt/repo_files \\
        --dead-letter-dir /mnt/shared/dl/repo_files \\
        --metrics-dir /mnt/shared/metrics/repo_files \\
        --config      conf/capture.json \\
        --payload-format --salted --buckets 4096

Storage contract: the lake/log METADATA layer commits through the
filesystem seam (lake/fs.py). The default ``--fs local`` uses POSIX
atomic rename — ``--table-dir`` and friends on a cluster-shared mount
(NFS/Lustre/FUSE) or local disk. ``--fs hadoop`` routes metadata
commits through the Hadoop FileSystem API (spark._jvm): hdfs://,
abfs://, or any scheme with atomic rename + exclusive create; S3
additionally needs the conditional-PUT/catalog-pointer variant of
``replace_text`` documented in lake/fs.py. The parquet DATA files
always go through Spark's writers and are store-agnostic either way.

Locally (tests/bench) the same script runs on ``local[N]`` — the
session factory sets a local master only when not launched through
spark-submit. The default mode drains the backlog exactly-once and
exits; ``--trigger '30 seconds'`` runs a continuous micro-batch stream
until signalled, re-beating the single-writer heartbeat between
triggers.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--events-dir", required=True, help="change-event source directory")
    p.add_argument("--table-dir", required=True, help="lake table root (created if missing)")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--dead-letter-dir", default=None)
    p.add_argument("--metrics-dir", default=None)
    p.add_argument("--config", default=None, help="EngineConfig JSON path (capture config)")
    p.add_argument("--table-name", default=None, help="table entry in the config to apply")
    p.add_argument("--buckets", type=int, default=256, help="hash buckets for a NEW table")
    p.add_argument("--salted", action="store_true", help="two-phase LWW for hot keys")
    p.add_argument("--payload-format", action="store_true",
                   help="source rows are Event_Logs-shaped (msg_key + JSON payload)")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--mor", action="store_true",
                   help="merge-on-read delta path (tiny frequent epochs)")
    p.add_argument("--compact-rows", type=int, default=1_000_000)
    p.add_argument("--trigger", default=None,
                   help="processing-time interval for a continuous run, e.g. '30 seconds'")
    p.add_argument("--timeout-s", type=int, default=3600,
                   help="available-now drain timeout")
    p.add_argument("--fs", choices=["local", "hadoop"], default="local",
                   help="metadata-IO seam impl: POSIX (shared mount) or "
                        "Hadoop FileSystem (hdfs://, abfs://, ...)")
    p.add_argument("--envelope-sink", choices=["none", "lake", "kafka"], default="none",
                   help="outbound consumer stream: 'lake' appends envelopes to an "
                        "epoch-fenced append log (the test double); 'kafka' produces "
                        "them through the public format('kafka') sink — at-least-once, "
                        "pair with consumer-side watermark dedup (streaming/sink.py)")
    p.add_argument("--envelope-dir", default=None,
                   help="append-log dir for --envelope-sink lake")
    p.add_argument("--kafka-bootstrap", default=None,
                   help="bootstrap.servers for --envelope-sink kafka")
    p.add_argument("--kafka-topic", default=None,
                   help="topic for --envelope-sink kafka")
    p.add_argument("--status", action="store_true",
                   help="print the consolidated health/status JSON "
                        "(streaming/status.py — the /health_check/status "
                        "analog) and exit without touching the pipeline")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from movex_cdc_spark.config.table_config import EngineConfig
    from movex_cdc_spark.lake.mor import MergeOnReadTable
    from movex_cdc_spark.lake.table import LakeTable
    from movex_cdc_spark.operators.apply import KEY_COLS, REPO_FILES_SCHEMA
    from movex_cdc_spark.session import get_spark
    from movex_cdc_spark.streaming.housekeeping import Heartbeat
    from movex_cdc_spark.streaming.pipeline import CdcStreamPipeline

    spark = get_spark(app_name="movex-cdc-pipeline")
    fs = None
    if args.fs == "hadoop":
        from movex_cdc_spark.lake.fs import HadoopFS

        fs = HadoopFS(spark)

    if args.status:
        # read-only probe over what the pipeline already persists —
        # safe to run WHILE a pipeline instance is live (it neither
        # beats the heartbeat nor commits anything)
        import json as _json

        from movex_cdc_spark.streaming.status import engine_status

        st = engine_status(
            spark,
            metrics_dir=args.metrics_dir,
            table_dir=args.table_dir,
            checkpoint_home=args.checkpoint_dir.rstrip("/") + "_home",
            dead_letter_dir=args.dead_letter_dir,
            events_dir=args.events_dir,
            fs=fs,
        )
        print(_json.dumps(st, default=str, indent=2))
        return 0

    try:
        table = LakeTable.load(spark, args.table_dir, fs=fs)
    except FileNotFoundError:
        table = LakeTable.create(
            spark, args.table_dir, REPO_FILES_SCHEMA, KEY_COLS,
            n_buckets=args.buckets, fs=fs,
        )
    sink = (
        MergeOnReadTable(table, args.table_dir + "_delta", compact_rows=args.compact_rows)
        if args.mor
        else table
    )  # MoR inherits the base table's fs for its delta log
    config = EngineConfig.load(args.config) if args.config else None

    # single-writer guard on the checkpoint home (reference
    # heartbeat.rb) — through the SAME fs seam as the stores, so a
    # scheme-qualified checkpoint home fences across nodes, not against
    # a per-node local junk path
    hb = Heartbeat(args.checkpoint_dir.rstrip("/") + "_home", fs=fs)
    hb.beat()

    envelope_sink = None
    if args.envelope_sink == "lake":
        from movex_cdc_spark.streaming.sink import EnvelopeSink

        if not args.envelope_dir:
            raise SystemExit("--envelope-sink lake requires --envelope-dir")
        envelope_sink = EnvelopeSink(spark, args.envelope_dir, fs=fs)
    elif args.envelope_sink == "kafka":
        from movex_cdc_spark.streaming.sink import KafkaEnvelopeWriter

        if not (args.kafka_bootstrap and args.kafka_topic):
            raise SystemExit(
                "--envelope-sink kafka requires --kafka-bootstrap and --kafka-topic"
            )
        envelope_sink = KafkaEnvelopeWriter(
            spark, args.kafka_bootstrap, args.kafka_topic
        )

    pipe = CdcStreamPipeline(
        spark,
        sink,
        events_dir=args.events_dir,
        checkpoint_dir=args.checkpoint_dir,
        dead_letter_dir=args.dead_letter_dir,
        metrics_dir=args.metrics_dir,
        salted=args.salted,
        max_files_per_trigger=args.max_files_per_trigger,
        payload_format=args.payload_format,
        config=config,
        table_name=args.table_name,
        envelope_sink=envelope_sink,
        fs=fs,
    )
    if args.trigger:
        q = pipe.start(available_now=False, processing_time=args.trigger)
        # keep the single-writer claim alive for the whole run — a
        # one-shot beat would expire after stale_s and let a second
        # instance start mid-stream (the reference heartbeats on a timer)
        while not q.awaitTermination(30):
            hb.beat()
    else:
        epochs = pipe.run_available_now(timeout_s=args.timeout_s)
        applied = [e for e in epochs if not e.get("skipped")]
        print(
            f"drained {len(epochs)} epochs ({len(applied)} applied, "
            f"{len(epochs) - len(applied)} fenced replays); "
            f"table version {table.current_version()}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
