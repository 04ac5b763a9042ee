"""Datagen invariants — the deterministic event-script fixture
(analog of reference test/test_helper.rb:169-252)."""

import pandas as pd

from movex_cdc_spark.datagen import (
    EXCLUDE_MARKER,
    GenParams,
    generate_base_snapshot,
    generate_events,
    replay_oracle,
)


def test_deterministic():
    p = GenParams(n_events=3000)
    pd.testing.assert_frame_equal(generate_events(p), generate_events(p))
    pd.testing.assert_frame_equal(generate_base_snapshot(p), generate_base_snapshot(p))


def test_event_mix():
    p = GenParams(n_events=5000)
    ev = generate_events(p)
    assert set(ev["op"].unique()) == {"I", "U", "D"}
    assert ev["seq"].is_unique
    # bounded disorder: every event within max_disorder of its slot
    assert (ev["seq"].values - (ev.index.values + 1) <= p.max_disorder).all()
    assert ev["is_noop"].sum() > 0
    assert ev["content"].isna().sum() > 0
    assert ev["content"].fillna("").str.contains(EXCLUDE_MARKER, regex=False).sum() > 0
    # no-op updates really are no-ops: old == new (except rows that the
    # generator also marked filtered/poison — those are dropped earlier
    # in the pipeline regardless)
    noops = ev[ev["is_noop"] & ev["content"].notna()
               & ~ev["content"].fillna("").str.contains(EXCLUDE_MARKER, regex=False)]
    assert len(noops) > 0
    assert (noops["old_content"] == noops["content"]).all()


def test_hot_repo_skew():
    p = GenParams(n_events=5000, hot_repo_share=0.5)
    ev = generate_events(p)
    share = (ev["repo"] == "repo_0").mean()
    assert 0.4 < share < 0.6


def test_replay_oracle_semantics():
    p = GenParams(n_events=4000)
    ev = generate_events(p)
    base = generate_base_snapshot(p)
    final = replay_oracle(base, ev)
    # no deleted keys present
    last = ev.sort_values("seq").groupby(["repo", "path"]).last()
    # filtered/poison/noop events must never be the applied version
    assert not final["content"].fillna("").str.contains(EXCLUDE_MARKER, regex=False).any()
    assert final["content"].notna().all()
    assert final.set_index(["repo", "path"]).index.is_unique
    # untouched base keys survive verbatim
    touched = set(map(tuple, ev[["repo", "path"]].drop_duplicates().values))
    untouched = base[~base.apply(lambda r: (r["repo"], r["path"]) in touched, axis=1)]
    idx = final.set_index(["repo", "path"])
    for _, r in untouched.head(20).iterrows():
        assert idx.loc[(r["repo"], r["path"]), "content"] == r["content"]
