"""Driver-contract smoke: entry() runs, every query compiles and
returns rows at sf0.001, and a representative subset hash-matches the
DuckDB oracle exactly as tools/check_entry.py (the full gate) does."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tools.check_entry import TABLES, value_hash

SF_SMALL = "/root/testdata/sf0.001"

SUBSET = [
    "cdc_lww_latest_state",
    "cdc_apply_final_state",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_analysis_battery",
]


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_all_queries_run_sf0001(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0, name


def test_oracle_names_subset_of_queries():
    qs = set(entry_mod.queries())
    assert set(entry_mod.oracle_sql()).issubset(qs)


@pytest.mark.parametrize("name", SUBSET)
def test_subset_matches_duckdb(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    spdf = entry_mod.queries()[name](spark, SF_SMALL).toPandas()
    opdf = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(spdf) == len(opdf)
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert value_hash(spdf) == value_hash(opdf)
