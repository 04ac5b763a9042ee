"""Filter operators (reference P3/P4/S11 semantics)."""

import pandas as pd

from movex_cdc_spark.datagen import EXCLUDE_MARKER
from movex_cdc_spark.operators.filters import (
    condition_filter,
    default_exclude_condition,
    split_poison,
    suppress_noop_updates,
)

COLS = ["seq", "repo", "path", "content", "old_content", "op"]


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=COLS))


def test_condition_filter(spark):
    df = _df(
        spark,
        [
            (1, "r", "a", "keep me", None, "I"),
            (2, "r", "b", f"drop {EXCLUDE_MARKER} me", None, "I"),
            (3, "r", "c", None, None, "D"),  # null content passes
        ],
    )
    got = condition_filter(df, default_exclude_condition()).select("seq").toPandas()
    assert sorted(got["seq"]) == [1, 3]


def test_noop_suppression_null_safe(spark):
    df = _df(
        spark,
        [
            (1, "r", "a", "same", "same", "U"),      # noop -> drop
            (2, "r", "b", "new", "old", "U"),        # real change -> keep
            (3, "r", "c", None, None, "U"),          # null==null noop -> drop
            (4, "r", "d", "x", None, "U"),           # null old -> keep
            (5, "r", "e", "same", "same", "I"),      # not an update -> keep
        ],
    )
    got = suppress_noop_updates(df).select("seq").toPandas()
    assert sorted(got["seq"]) == [2, 4, 5]


def test_split_poison(spark):
    df = _df(
        spark,
        [
            (1, "r", "a", None, None, "I"),   # poison
            (2, "r", "b", None, None, "U"),   # poison
            (3, "r", "c", None, None, "D"),   # deletes need no content
            (4, "r", "d", "ok", None, "I"),
        ],
    )
    valid, poison = split_poison(df)
    assert sorted(r["seq"] for r in valid.collect()) == [3, 4]
    assert sorted(r["seq"] for r in poison.collect()) == [1, 2]
    assert "error_msg" in poison.columns
