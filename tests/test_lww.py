"""LWW dedup: plain == salted == pandas groundtruth (SURVEY W3/A7).

The salted two-phase combine is only correct because LWW-by-seq is
associative/commutative — property-tested here (SURVEY §7.3 #4)."""

import pandas as pd
import pytest

from movex_cdc_spark.datagen import GenParams, generate_events
from movex_cdc_spark.operators.lww import lww_dedup, lww_dedup_maxby, lww_dedup_salted


@pytest.fixture(scope="module")
def events(spark):
    p = GenParams(n_events=4000, hot_repo_share=0.6)  # heavy skew on repo_0
    pdf = generate_events(p).drop(columns=["is_noop"])
    return spark.createDataFrame(pdf), pdf


def _ground_truth(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values("seq")
        .groupby(["repo", "path"], as_index=False)
        .last()[["repo", "path", "seq"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_lww_plain(spark, events):
    sdf, pdf = events
    got = (
        lww_dedup(sdf, ["repo", "path"])
        .select("repo", "path", "seq")
        .orderBy("repo", "path")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), _ground_truth(pdf))


@pytest.mark.parametrize("salt", [2, 16, 64])
def test_lww_salted_equals_plain(spark, events, salt):
    sdf, pdf = events
    got = (
        lww_dedup_salted(sdf, ["repo", "path"], salt_buckets=salt)
        .select("repo", "path", "seq")
        .orderBy("repo", "path")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), _ground_truth(pdf))


def test_lww_maxby_equals_window(spark, events):
    """The hot-path max_by formulation (map-side partial combine) must
    agree with the window formulation row-for-row — including payload
    columns, not just the winning seq."""
    sdf, pdf = events
    got = (
        lww_dedup_maxby(sdf, ["repo", "path"])
        .select("repo", "path", "seq")
        .orderBy("repo", "path")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), _ground_truth(pdf))
    # payload agreement on a sample
    w = lww_dedup(sdf, ["repo", "path"]).select("repo", "path", "commit", "content").orderBy("repo", "path")
    m = lww_dedup_maxby(sdf, ["repo", "path"]).select("repo", "path", "commit", "content").orderBy("repo", "path")
    pd.testing.assert_frame_equal(w.toPandas(), m.toPandas())


def test_lww_unique_keys(spark, events):
    sdf, _ = events
    out = lww_dedup(sdf, ["repo", "path"])
    assert out.groupBy("repo", "path").count().filter("count > 1").count() == 0
