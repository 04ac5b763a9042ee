"""Physical-plan regression guards: the structural properties that
decide 100-TB behavior must not silently degrade (pushdown reaching the
scan, broadcast joins on dimensions, map-side partial LWW combine, no
unplanned cartesian joins, no self-join double-evaluation in dedup)."""

import contextlib
import io

import pytest

from movex_cdc_spark.plans.entry_queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark):
    p = _plan(spark, "q6_selective_filter_agg")
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:300]
    # projection pruned: the scan must not read all 16 lineitem columns
    sch = p.split("ReadSchema: struct<")[1].split(">")[0]
    assert sch.count(":") <= 4


def test_q5_broadcasts_dimensions(spark):
    p = _plan(spark, "q5_revenue_by_nation")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # all dims are broadcast-sized


def test_lww_partial_combine_before_shuffle(spark):
    # the window formulation must plan a PARTIAL WindowGroupLimit before
    # the exchange (Spark 4 pushes the rn=1 top-k map-side)...
    p = _plan(spark, "cdc_apply_final_state")
    assert "WindowGroupLimit" in p and "Partial" in p

    # ...and the engine's hot-path maxby must plan as a two-phase
    # aggregate: partial max_by in the scan stage, final after the shuffle
    from pyspark.sql import functions as F

    from movex_cdc_spark.operators.lww import lww_dedup_maxby

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").alias("repo"), F.lit("s").alias("path"),
        F.col("event_id").alias("seq"), F.col("event_type").alias("content"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lww_dedup_maxby(ev, ["repo", "path"]).explain("formatted")
    p2 = buf.getvalue()
    assert "partial_max_by" in p2


def test_dedup_pair_generation_has_no_self_join(spark):
    for name in ("dedup_minhash_lsh", "dedup_simhash64_banded"):
        p = _plan(spark, name)
        assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p


def test_no_unplanned_cartesian_anywhere(spark):
    allowed = {"ann_cosine_topk", "ann_lsh_bucketed", "ann_random_projection_lsh",
               "cdc_retry_backoff_eligible"}
    # scan-only / expression queries are cheap to verify wholesale; the
    # engine-in-the-loop queries execute merges eagerly, so check the
    # pure-plan subset
    fast = [
        "cdc_lww_latest_state", "cdc_noop_suppression", "cdc_keyed_slice",
        "q1_pricing_summary", "q3_top_revenue_orders", "window_topk_per_group",
        "dedup_exact_sha", "dedup_ngram_jaccard", "text_analysis_battery",
        "cdc_sessionization", "distinct_count_per_group",
    ]
    for name in fast:
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name
        if name not in allowed:
            assert "BroadcastNestedLoopJoin" not in p, name
