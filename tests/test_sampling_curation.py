"""Corpus-curation operators: stratified hash sampling, token-budget
shard packing, per-source caps, streaming watermark-bounded dedup."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from movex_cdc_spark.operators.sampling import (
    cap_per_group,
    pack_token_shards,
    stratified_hash_sample,
)

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_stratified_sample_deterministic_and_monotone(spark):
    docs = _docs(spark)
    half = stratified_hash_sample(docs, "lang", {"en": 0.5})
    again = stratified_hash_sample(docs, "lang", {"en": 0.5})
    assert sorted(r["doc_id"] for r in half.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )
    # raising the rate strictly grows the kept set (hash thresholding)
    more = stratified_hash_sample(docs, "lang", {"en": 0.8})
    kept_half = {r["doc_id"] for r in half.select("doc_id").collect()}
    kept_more = {r["doc_id"] for r in more.select("doc_id").collect()}
    assert kept_half <= kept_more
    # non-en strata untouched at default rate 1.0
    n_docs = docs.filter("lang <> 'en'").count()
    assert half.filter("lang <> 'en'").count() == n_docs
    # en roughly halved (hash uniformity, loose band)
    n_en = docs.filter("lang = 'en'").count()
    got = half.filter("lang = 'en'").count()
    assert 0.25 * n_en <= got <= 0.75 * n_en


def test_pack_token_shards_budget_and_wholeness(spark):
    budget = 500
    packed = pack_token_shards(_docs(spark), budget=budget, n_buckets=4).toPandas()
    # every document is assigned exactly once
    assert packed["doc_id"].is_unique
    g = packed.groupby(["bucket", "shard_id"])["tokens"].sum()
    max_doc = packed["tokens"].max()
    # start-of-doc convention: a shard exceeds the budget by at most one
    # document's tokens, and only the LAST shard of a bucket may be tiny
    assert (g <= budget + max_doc).all()
    for b, grp in packed.groupby("bucket"):
        full = grp.groupby("shard_id")["tokens"].sum()
        assert (full.iloc[:-1] >= budget - max_doc).all()
    # shard ids are dense from 0 per bucket
    for b, grp in packed.groupby("bucket"):
        sids = sorted(grp["shard_id"].unique())
        assert sids == list(range(len(sids)))


def test_cap_per_group(spark):
    capped = cap_per_group(_docs(spark), ["lang", "source"], "n_chars", "doc_id", k=2)
    pdf = capped.toPandas()
    sizes = pdf.groupby(["lang", "source"]).size()
    assert (sizes <= 2).all()
    # kept rows are the longest per group (deterministic tiebreak)
    docs = _docs(spark).toPandas()
    for (lang, src), grp in docs.groupby(["lang", "source"]):
        want = grp.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(2)
        got = pdf[(pdf["lang"] == lang) & (pdf["source"] == src)]
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_streaming_watermark_dedup(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from movex_cdc_spark.streaming.windows import dedup_stream_within_watermark

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    base = pd.Timestamp("2024-03-01")
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 2],  # in-trigger duplicate of 2
            "ts": [base, base + pd.Timedelta(minutes=10),
                   base + pd.Timedelta(minutes=20), base + pd.Timedelta(minutes=10)],
            "user_id": [1, 1, 2, 1],
            "event_type": "t", "value": 0.0, "props": "{}",
        }
    )
    # trigger 2 redelivers event 3 (within the 2h slack) + new event 4
    f2 = pd.DataFrame(
        {
            "event_id": [3, 4],
            "ts": [base + pd.Timedelta(minutes=20), base + pd.Timedelta(hours=1)],
            "user_id": [2, 2], "event_type": "t", "value": 0.0, "props": "{}",
        }
    )
    d = str(tmp_path / "events")
    os.makedirs(d)
    for i, f in enumerate([f1, f2]):
        p = os.path.join(d, f"ev-{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(f, preserve_index=False), p,
                       coerce_timestamps="us")
        os.utime(p, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    q = dedup_stream_within_watermark(
        spark, d, str(tmp_path / "ckpt"), str(tmp_path / "out"), schema,
        within="2 hours", max_files_per_trigger=1,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("watermark dedup stream did not finish within 300s")
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert sorted(got["event_id"]) == [1, 2, 3, 4]
