"""Schema-evolution breadth (VERDICT r6 item 7; SURVEY §1.3, §7.3 hard
part 3; reference config swap regenerating triggers mid-stream,
import_export_config.rb:22-81): type WIDEN and column REMOVAL
mid-stream with OLD-shape in-flight events interleaved after the swap,
plus the refusal paths — a narrowing swap must never downgrade the
committed schema, and an incompatible type change must raise instead
of corrupting."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movex_cdc_spark.lake.table import LakeTable

KEYS = ["repo", "path"]


def _schema(rev_type):
    return T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("rev", rev_type),
        ]
    )


def _batch(spark, rows, rev_type="int", with_etype=False):
    cols = ["repo", "path", "content", "rev", "seq", "op"] + (
        ["etype"] if with_etype else []
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    return df.withColumn("rev", F.col("rev").cast(rev_type))


def test_widen_then_old_shape_in_flight(spark, tmp_path):
    """rev INT → LONG mid-stream; OLD-shape (int) events still in
    flight after the widen must apply, reading back widened."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(T.IntegerType()), KEYS, n_buckets=4)
    t.merge(_batch(spark, [("r", "a", "v1", 1, 1, "I")]), epoch_id=0)

    t.evolve_schema(_schema(T.LongType()))
    big = 2**40
    t.merge(
        _batch(spark, [("r", "b", "v2", big, 2, "I")], rev_type="long"), epoch_id=1
    )
    # the OLD capture shape is still in flight (a lagging producer):
    # int revs keep applying after the widen, cast up at merge
    t.merge(_batch(spark, [("r", "a", "v3", 7, 3, "U")]), epoch_id=2)

    got = {r["path"]: r for r in t.read().collect()}
    assert dict((f.name, f.dataType.typeName()) for f in t.read().schema.fields)["rev"] == "long"
    assert got["a"]["rev"] == 7 and got["a"]["content"] == "v3"
    assert got["b"]["rev"] == big


def test_column_removal_mid_stream_with_interleaved_shapes(spark, tmp_path):
    """A config swap REMOVES a captured column: new-shape batches stop
    carrying it. The table keeps the column (add-only committed schema);
    an updated key's removed column reads NULL (the captured image is
    authoritative — the trigger no longer records it), untouched keys
    keep their old value, and OLD-shape in-flight events that still
    carry the column interleave freely after the swap."""
    schema = T.StructType(
        _schema(T.IntegerType()).fields + [T.StructField("etype", T.StringType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, KEYS, n_buckets=4)
    t.merge(
        _batch(
            spark,
            [("r", "a", "v1", 1, 1, "I", "click"), ("r", "b", "v1", 1, 2, "I", "view")],
            with_etype=True,
        ),
        epoch_id=0,
    )
    # epoch 1: NEW shape (etype removed from capture) updates key a
    t.merge(_batch(spark, [("r", "a", "v2", 2, 3, "U")]), epoch_id=1)
    got = {r["path"]: r for r in t.read().collect()}
    assert got["a"]["etype"] is None  # re-captured image has no etype
    assert got["b"]["etype"] == "view"  # untouched key keeps its value
    # epoch 2: OLD-shape in-flight event (still carries etype) for b
    t.merge(
        _batch(spark, [("r", "b", "v3", 3, 4, "U", "purchase")], with_etype=True),
        epoch_id=2,
    )
    got = {r["path"]: r for r in t.read().collect()}
    assert got["b"]["etype"] == "purchase"
    # the committed schema never dropped the column
    assert "etype" in [f.name for f in t.read().schema.fields]


def test_narrowing_swap_never_downgrades_schema(spark, tmp_path):
    """rev LONG → INT config swap: narrow batches APPLY (cast up at
    merge) but the committed schema stays LONG — a narrowing swap can
    never truncate already-stored wide values."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(T.LongType()), KEYS, n_buckets=4)
    big = 2**40
    t.merge(_batch(spark, [("r", "a", "v1", big, 1, "I")], rev_type="long"), epoch_id=0)
    # evolve with the NARROW shape: benign no-op, not a downgrade
    out = t.evolve_schema(_schema(T.IntegerType()))
    assert dict((f.name, f.dataType.typeName()) for f in out.fields)["rev"] == "long"
    t.merge(_batch(spark, [("r", "b", "v2", 5, 2, "I")]), epoch_id=1)
    got = {r["path"]: r for r in t.read().collect()}
    assert got["a"]["rev"] == big and got["b"]["rev"] == 5
    assert dict(
        (f.name, f.dataType.typeName()) for f in t.read().schema.fields
    )["rev"] == "long"


def test_incompatible_type_change_refuses(spark, tmp_path):
    """string→long (and any non-widenable pair) must raise — silently
    coercing would corrupt older segments (the reference refuses the
    trigger regeneration instead of guessing)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(T.IntegerType()), KEYS, n_buckets=4)
    t.merge(_batch(spark, [("r", "a", "v1", 1, 1, "I")]), epoch_id=0)
    with pytest.raises(ValueError, match="incompatible"):
        t.evolve_schema(_schema(T.StringType()))
    # and through the apply path (ALTER-before-MERGE calls evolve)
    from movex_cdc_spark.operators.apply import apply_batch

    bad = _batch(spark, [("r", "a", "9", 1, 2, "U")]).withColumn(
        "rev", F.col("rev").cast("string")
    )
    with pytest.raises(ValueError, match="incompatible"):
        apply_batch(t, bad, epoch_id=1)
    # the refusal left the table untouched and usable
    assert t.read().count() == 1
    t.merge(_batch(spark, [("r", "c", "v2", 3, 5, "I")]), epoch_id=2)
    assert t.read().count() == 2


def test_pipeline_config_swap_removes_column_mid_stream(spark, tmp_path):
    """The full config-driven path: a live config swap between
    micro-batches removes a column from CAPTURE (its trigger no longer
    serializes it — modeled as all-ops-off column flags, the reference's
    un-ticking a column in the config import, import_export_config.rb:
    22-81), with both shapes interleaved across the swap (S12 + P1)."""
    from movex_cdc_spark.config.table_config import ColumnCfg, TableCfg
    from movex_cdc_spark.operators.apply import KEY_COLS, REPO_FILES_SCHEMA, apply_batch

    def _cfg(capture_lang: bool) -> TableCfg:
        on = dict(log_insert=True, log_update=True, log_delete=True)
        off = dict(log_insert=False, log_update=False, log_delete=False)
        return TableCfg(
            name="repo_files",
            key_cols=list(KEY_COLS),
            columns=[
                ColumnCfg("commit", **on),
                ColumnCfg("lang", **(on if capture_lang else off)),
                ColumnCfg("content", **on),
            ],
        )

    t = LakeTable.create(
        spark, str(tmp_path / "t"), REPO_FILES_SCHEMA, KEY_COLS, n_buckets=4
    )
    rows = [
        ("r", "a", "c1", "py", "v1", None, 1, "I"),
        ("r", "b", "c1", "go", "v1", None, 2, "I"),
    ]
    cols = ["repo", "path", "commit", "lang", "content", "old_content", "seq", "op"]
    b0 = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    apply_batch(t, b0, epoch_id=0, table_cfg=_cfg(capture_lang=True))
    # swap: lang removed from capture; update key a under the new config
    b1 = spark.createDataFrame(
        pd.DataFrame([("r", "a", "c2", "py", "v2", "v1", 3, "U")], columns=cols)
    )
    apply_batch(t, b1, epoch_id=1, table_cfg=_cfg(capture_lang=False))
    got = {r["path"]: r for r in t.read().collect()}
    assert got["a"]["lang"] is None and got["a"]["content"] == "v2"
    assert got["b"]["lang"] == "go"  # untouched key keeps its value
    # old-shape in-flight event after the swap: full capture again
    b2 = spark.createDataFrame(
        pd.DataFrame([("r", "b", "c3", "rs", "v3", "v1", 4, "U")], columns=cols)
    )
    apply_batch(t, b2, epoch_id=2, table_cfg=_cfg(capture_lang=True))
    got = {r["path"]: r for r in t.read().collect()}
    assert got["b"]["lang"] == "rs" and got["b"]["content"] == "v3"
