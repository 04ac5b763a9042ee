"""Benchmark harness.

Default mode (what the driver runs per round):
    python bench.py
  - runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
    /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
  - runs the CDC apply pipeline (datagen -> staged event files ->
    checkpointed streaming apply -> lake-table merge) and reports
    sustained events/sec
  - prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec}, "sf": ..., "cdc_events_per_sec": ...}

Scaling mode (north-rule evidence; no real cluster in the sandbox):
    python bench.py --scaling
  - runs the SAME CDC apply job at local[8] and local[32] on identical
    input and reports throughput at both + efficiency
    (eff = (thr_32 / thr_8) / 4; target >= 0.8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cdc_lww_latest_state",
    "cdc_apply_final_state",
    "cdc_salted_lww_two_phase",
    "cdc_stats_rollup_hourly",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_quality_score",
]

# CDC apply sizing: 4M events in 4 epochs x 8 files each. Files are
# ~250k rows so every epoch's scan parallelizes (a single big file is
# one split = one task — the local analog of an under-partitioned
# 100 TB table).
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "4000000"))
CDC_EPOCHS = 4
FILES_PER_EPOCH = 8


def _force(df) -> None:
    """Materialize fully (noop sink — no collect, no disk)."""
    df.write.format("noop").mode("overwrite").save()


def make_spark(cpus: int):
    from movex_cdc_spark.session import get_spark

    s = get_spark(app_name=f"bench-{cpus}", cpus=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_queries(spark) -> dict[str, float]:
    from movex_cdc_spark.plans.entry_queries import REGISTRY

    # warmup: JIT/codegen/arrow init on a trivial job
    _force(REGISTRY["cdc_minmax_health"][0](spark, SF_DIR))
    out = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        t0 = time.monotonic()
        _force(fn(spark, SF_DIR))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _stage_cdc_input(workdir: str, n_events: int) -> tuple[str, "object"]:
    """Deterministic event files + base snapshot, staged once and
    reused across scaling runs (identical input per the north rule)."""
    from movex_cdc_spark.datagen import GenParams, generate_base_snapshot, generate_events
    from movex_cdc_spark.sources.events import write_event_files

    p = GenParams(
        n_events=n_events,
        n_repos=max(200, n_events // 2000),
        paths_per_repo=100,
        hot_repo_share=0.1,  # mild skew so the salted path matters
        seed=42,
    )
    stage = os.path.join(workdir, f"stage-{n_events}")
    if not os.path.isdir(stage):  # atomic: build in tmp dir, then rename
        tmp = stage + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ev = generate_events(p)
        write_event_files(ev, os.path.join(tmp, "events"), n_files=CDC_EPOCHS * FILES_PER_EPOCH)
        base = generate_base_snapshot(p)
        base.to_parquet(os.path.join(tmp, "base.parquet"), index=False)
        os.rename(tmp, stage)
    return stage, p


def run_cdc_apply(spark, workdir: str, tag: str, n_events: int) -> dict:
    """The engine's own job: bootstrap -> streaming apply -> merge."""
    from pyspark.sql import functions as F

    from movex_cdc_spark.lake.table import LakeTable
    from movex_cdc_spark.operators.apply import KEY_COLS, REPO_FILES_SCHEMA
    from movex_cdc_spark.streaming.pipeline import CdcStreamPipeline

    stage, _ = _stage_cdc_input(workdir, n_events)
    ev_dir = os.path.join(stage, "events")
    run_dir = os.path.join(workdir, f"run-{tag}")
    shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir)

    table = LakeTable.create(
        spark, os.path.join(run_dir, "lake"), REPO_FILES_SCHEMA, KEY_COLS,
        n_buckets=max(32, spark.sparkContext.defaultParallelism),
    )
    base = spark.read.parquet(os.path.join(stage, "base.parquet")).drop("last_seq", "deleted")
    table.overwrite(base.withColumn("content_sha", F.sha2("content", 256)))

    pipe = CdcStreamPipeline(
        spark,
        table,
        events_dir=ev_dir,
        checkpoint_dir=os.path.join(run_dir, "ckpt"),
        dead_letter_dir=os.path.join(run_dir, "dl"),
        metrics_dir=os.path.join(run_dir, "metrics"),
        salted=True,
        max_files_per_trigger=FILES_PER_EPOCH,
    )
    t0 = time.monotonic()
    epochs = pipe.run_available_now(timeout_s=3600)
    wall = time.monotonic() - t0
    rows = table.read().count()
    shutil.rmtree(run_dir, ignore_errors=True)
    return {
        "wall_s": round(wall, 2),
        "events_per_sec": round(n_events / wall, 1),
        "epochs": len(epochs),
        "final_rows": rows,
    }


def main() -> None:
    scaling = "--scaling" in sys.argv
    workdir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/movex_bench")
    os.makedirs(workdir, exist_ok=True)

    if scaling:
        result = {"n_events": CDC_EVENTS, "runs": {}}
        for cpus in (8, 32):
            spark = make_spark(cpus)
            # warmup epoch on a separate tiny table
            run_cdc_apply(spark, workdir, f"warm{cpus}", CDC_EVENTS // 20)
            result["runs"][f"local[{cpus}]"] = run_cdc_apply(spark, workdir, f"c{cpus}", CDC_EVENTS)
            spark.stop()
        thr8 = result["runs"]["local[8]"]["events_per_sec"]
        thr32 = result["runs"]["local[32]"]["events_per_sec"]
        result["scaling_efficiency_8_to_32"] = round((thr32 / thr8) / 4.0, 3)
        print(json.dumps(result))
        return

    spark = make_spark(CPUS)
    queries = run_queries(spark)
    cdc = run_cdc_apply(spark, workdir, f"bench{CPUS}", CDC_EVENTS)
    spark.stop()
    total = round(sum(queries.values()) + cdc["wall_s"], 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_plus_cdc_apply_wall",
                "value": total,
                "unit": "sec",
                "queries": {**queries, "cdc_apply": cdc["wall_s"]},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc_events_per_sec": cdc["events_per_sec"],
                "cdc_events": CDC_EVENTS,
                "cdc_epochs": cdc["epochs"],
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
