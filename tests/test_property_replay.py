"""Property-based invariants of the CDC core (hypothesis).

The reference's test strategy synthesizes randomized event fixtures and
asserts replay equivalence (test_helper.rb's seeded generators +
kafka_mock assertions); the Spark analog: for ARBITRARY I/U/D
interleavings the engine's replay-to-final-state must equal the plain
fold of the stream, regardless of how the stream is cut into epochs,
and replays must be no-ops. Streams are tiny (the property is about
interleavings, not volume — volume is bench.py's job)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from movex_cdc_spark.lake.table import LakeTable
from movex_cdc_spark.operators.apply import KEY_COLS, REPO_FILES_SCHEMA, apply_batch

COLS = ["seq", "repo", "path", "commit", "lang", "content", "old_content", "op"]

# an event: (key index, op, payload index) — seq is the stream position
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=60,
)


def _to_rows(events):
    return [
        (seq, "r", f"p{k}", f"c{seq}", "py",
         None if op == "D" else f"v{payload}", None, op)
        for seq, (k, op, payload) in enumerate(events)
    ]


def _fold_oracle(rows):
    """The plain LWW fold: last op per key wins; deleted keys absent."""
    state = {}
    for seq, repo, path, commit, lang, content, _old, op in rows:
        if op == "D":
            state.pop((repo, path), None)
        else:
            state[(repo, path)] = (seq, content)
    return state


@pytest.fixture(scope="module")
def _tables(spark, tmp_path_factory):
    """One lake-table dir per example, counter-named (hypothesis reuses
    the fixture across examples)."""
    root = tmp_path_factory.mktemp("prop_lake")
    counter = {"i": 0}

    def make():
        counter["i"] += 1
        return LakeTable.create(
            spark, str(root / f"t{counter['i']}"), REPO_FILES_SCHEMA, KEY_COLS,
            n_buckets=2,
        )

    return make


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy, n_epochs=st.integers(min_value=1, max_value=4))
def test_replay_equals_fold_for_any_interleaving(spark, _tables, events, n_epochs):
    rows = _to_rows(events)
    table = _tables()
    step = (len(rows) + n_epochs - 1) // n_epochs
    for e in range(n_epochs):
        chunk = rows[e * step:(e + 1) * step]
        if not chunk:
            continue
        batch = spark.createDataFrame(pd.DataFrame(chunk, columns=COLS))
        apply_batch(table, batch, epoch_id=e, condition_sql="1=1")

    got = {
        (r["repo"], r["path"]): (r["last_seq"], r["content"])
        for r in table.read().select("repo", "path", "last_seq", "content").collect()
    }
    assert got == _fold_oracle(rows)

    # fencing property: replaying EVERY epoch again changes nothing
    for e in range(n_epochs):
        chunk = rows[e * step:(e + 1) * step]
        if not chunk:
            continue
        batch = spark.createDataFrame(pd.DataFrame(chunk, columns=COLS))
        lin = apply_batch(table, batch, epoch_id=e, condition_sql="1=1")
        assert lin.get("skipped")
    got2 = {
        (r["repo"], r["path"]): (r["last_seq"], r["content"])
        for r in table.read().select("repo", "path", "last_seq", "content").collect()
    }
    assert got2 == got


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy)
def test_epoch_cut_is_irrelevant(spark, _tables, events):
    """Cutting the same stream into 1 epoch vs 3 epochs yields the
    identical final state — associativity of the seq-fenced merge."""
    rows = _to_rows(events)

    def run(n_epochs):
        table = _tables()
        step = (len(rows) + n_epochs - 1) // n_epochs
        for e in range(n_epochs):
            chunk = rows[e * step:(e + 1) * step]
            if chunk:
                apply_batch(
                    table,
                    spark.createDataFrame(pd.DataFrame(chunk, columns=COLS)),
                    epoch_id=e,
                    condition_sql="1=1",
                )
        return {
            (r["repo"], r["path"]): (r["last_seq"], r["content"], r["content_sha"])
            for r in table.read().select(
                "repo", "path", "last_seq", "content", "content_sha"
            ).collect()
        }

    assert run(1) == run(3)
