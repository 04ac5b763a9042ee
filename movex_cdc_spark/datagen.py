"""Deterministic synthetic change-event generator.

Mirrors the reference's deterministic event-script fixture
(reference: test/test_helper.rb:169-252 — a known I/U/D mix with a
no-op update that must NOT be logged, a filtered insert that must NOT
be logged, oversized payloads, and poison rows), but over the north
rule's input shape: an Iceberg-style table of source-code repositories
``repo_files(repo, path, commit, lang, content)`` with change events
keyed by ``(repo, path)`` and ordered by a per-key monotone sequence
(the analog of Event_Logs.ID per Msg_Key,
reference: app/models/kafka_mock.rb:49-63).

Everything is seeded numpy — identical output for identical params —
and scales from 1e3 to 1e7+ events by a single knob so the 10^10-event
logical stream can be exercised at small physical scale.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

LANGS = np.array(["py", "rb", "go", "rs", "java", "sql", "js", "c"])
OPS = ("I", "U", "D")

# content marker mirroring the reference's 'EXCLUDE FILTER' trigger
# condition fixture (test/test_helper.rb:589-600): events carrying it
# must be dropped by the condition filter, never applied.
EXCLUDE_MARKER = "EXCLUDE FILTER"


@dataclass
class GenParams:
    n_repos: int = 50
    paths_per_repo: int = 40
    n_events: int = 20_000
    seed: int = 42
    # zipf-ish skew: probability mass of the hottest repo. 0 = uniform.
    hot_repo_share: float = 0.0
    p_update: float = 0.55
    p_delete: float = 0.10
    p_noop_update: float = 0.03  # update where content is unchanged
    p_filtered: float = 0.02  # rows carrying EXCLUDE_MARKER
    p_poison: float = 0.01  # rows with null content on I/U (invalid)
    # events arrive at most this many positions out of seq order
    max_disorder: int = 50
    content_words: int = 12


_N_PHRASES = 4096


def _phrase_vocab(words_per_phrase: int) -> np.ndarray:
    """Small deterministic vocabulary of multi-word phrases, built once
    per phrase length — content assembly is then O(1) string concats
    per row instead of O(words), which is what lets the generator stage
    10^7-row benchmark inputs in seconds."""
    rng = np.random.default_rng(7919 + words_per_phrase)
    toks = rng.integers(0, 9973, size=(_N_PHRASES, words_per_phrase))
    return np.array([" ".join(f"tok{t}" for t in row) for row in toks])


_VOCAB_CACHE: dict[int, np.ndarray] = {}


def _content(repo_idx: np.ndarray, path_idx: np.ndarray, seq: np.ndarray,
             words: int) -> np.ndarray:
    """Deterministic pseudo-source-code content per (repo, path, seq)."""
    wpp = max(words // 2, 1)
    if wpp not in _VOCAB_CACHE:
        _VOCAB_CACHE[wpp] = _phrase_vocab(wpp)
    vocab = _VOCAB_CACHE[wpp]
    base = (repo_idx.astype(np.uint64) * np.uint64(1_000_003)
            + path_idx.astype(np.uint64) * np.uint64(10_007)
            + seq.astype(np.uint64))
    with np.errstate(over="ignore"):
        h1 = (base * np.uint64(6364136223846793005)) >> np.uint64(16)
        h2 = (base * np.uint64(3935559000370003845) + np.uint64(2691343689449507681)) >> np.uint64(16)
    p1 = vocab[(h1 % np.uint64(_N_PHRASES)).astype(np.int64)]
    p2 = vocab[(h2 % np.uint64(_N_PHRASES)).astype(np.int64)]
    prefix = np.char.add(np.char.add("def fn_", seq.astype(str)), "(): # ")
    return np.char.add(prefix, np.char.add(p1, np.char.add(" ", p2)))


def generate_events(p: GenParams) -> pd.DataFrame:
    """Event log: (seq, repo, path, commit, lang, content, op, ts, txid).

    ``seq`` is globally monotone at creation time (like Event_Logs.ID);
    rows are then shuffled within a bounded window to simulate
    out-of-order arrival — per-key ordering must be restored by the
    engine, not assumed from file order.
    """
    rng = np.random.default_rng(p.seed)
    n = p.n_events
    seq = np.arange(1, n + 1, dtype=np.int64)

    if p.hot_repo_share > 0:
        hot = rng.random(n) < p.hot_repo_share
        repo_idx = np.where(hot, 0, rng.integers(1, p.n_repos, n))
    else:
        repo_idx = rng.integers(0, p.n_repos, n)
    path_idx = rng.integers(0, p.paths_per_repo, n).astype(np.int64)

    r = rng.random(n)
    op = np.where(r < p.p_delete, "D", np.where(r < p.p_delete + p.p_update, "U", "I"))

    content = _content(repo_idx, path_idx, seq, p.content_words)
    # Updates carry the old image too (triggers serialize old+new,
    # reference: transfer_thread.rb:493-518). A no-op update is one
    # where old == new — the engine must suppress it before apply
    # (reference: db_trigger_generator_oracle.rb:802-823).
    noop = (rng.random(n) < p.p_noop_update) & (op == "U")
    old_content = np.where(op == "U", _content(repo_idx, path_idx, seq - 1, p.content_words), None)
    old_content = np.where(noop, content, old_content)

    filtered = rng.random(n) < p.p_filtered
    content = np.where(filtered, np.char.add(content, " " + EXCLUDE_MARKER), content)

    poison = (rng.random(n) < p.p_poison) & (op != "D") & ~filtered
    content_obj = content.astype(object)
    content_obj[poison] = None

    df = pd.DataFrame(
        {
            "seq": seq,
            "repo": np.char.add("repo_", repo_idx.astype(str)),
            "path": np.char.add(
                np.char.add("src/mod", (path_idx // 10).astype(str)),
                np.char.add("/file", np.char.add(path_idx.astype(str), ".txt")),
            ),
            "commit": np.char.mod(
                "%012x",
                ((seq.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(16))
                & np.uint64(0xFFFFFFFFFFFF),
            ),
            "lang": LANGS[repo_idx % len(LANGS)],
            "content": content_obj,
            "old_content": pd.array(old_content, dtype=object),
            "op": op,
            "ts": pd.Timestamp("2026-01-01", tz="UTC") + pd.to_timedelta(seq, unit="s"),
            "txid": (seq // 100).astype(np.int64),
            "is_noop": noop,  # ground-truth flags for tests only
        }
    )

    # bounded-disorder shuffle: element i moves at most max_disorder slots
    if p.max_disorder > 0:
        jitter = rng.integers(0, p.max_disorder, n)
        order = np.argsort(seq + jitter, kind="stable")
        df = df.iloc[order].reset_index(drop=True)
    return df


def generate_event_chunks(p: GenParams, chunk_size: int = 2_000_000):
    """Chunked variant for large benchmark inputs: yields frames whose
    seq ranges tile [1, n_events] — identical schema/semantics, bounded
    memory (the monolithic path goes superlinear past ~10M rows from
    object-array churn). Deterministic: chunk i uses seed + 7000 + i."""
    done = 0
    cid = 0
    while done < p.n_events:
        size = min(chunk_size, p.n_events - done)
        sub = GenParams(**{**p.__dict__, "n_events": size, "seed": p.seed + 7000 + cid})
        df = generate_events(sub)
        df["seq"] = df["seq"] + done
        df["txid"] = (df["seq"] // 100).astype("int64")
        yield df
        done += size
        cid += 1


def generate_base_snapshot(p: GenParams) -> pd.DataFrame:
    """Initial repo_files content — the 'existing rows' an initial
    snapshot load (reference: db_trigger_generator_oracle.rb:499-569)
    would bootstrap from. Keys deliberately overlap with the event
    stream so updates/deletes hit pre-existing rows."""
    rng = np.random.default_rng(p.seed + 1)
    n = p.n_repos * p.paths_per_repo // 2
    repo_idx = rng.integers(0, p.n_repos, n)
    path_idx = rng.integers(0, p.paths_per_repo, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "repo": np.char.add("repo_", repo_idx.astype(str)),
            "path": np.char.add(
                np.char.add("src/mod", (path_idx // 10).astype(str)),
                np.char.add("/file", np.char.add(path_idx.astype(str), ".txt")),
            ),
            "commit": "snapshot0",
            "lang": LANGS[repo_idx % len(LANGS)],
            "content": _content(repo_idx, path_idx, np.zeros(n, np.int64), p.content_words),
            "last_seq": np.int64(0),
            "deleted": False,
        }
    )
    return df.drop_duplicates(["repo", "path"]).reset_index(drop=True)


def replay_oracle(base: pd.DataFrame, events: pd.DataFrame) -> pd.DataFrame:
    """Trivially-correct pandas replay: the final repo_files state.

    Semantics (= ordered per-key replay of the reference):
      * events with EXCLUDE_MARKER in content are filtered out (P3)
      * no-op updates (op='U' and old_content == content) are
        suppressed (P4) — dropped before apply, exactly as the
        reference trigger never fires for them
      * poison rows (null content on I/U) are quarantined, not applied
      * per (repo, path), the surviving event with the highest seq wins
      * if that event is a delete, the row is absent
      * keys never touched by events keep their base-snapshot row
    Returns columns (repo, path, commit, lang, content, content_sha) —
    the sha256 column is the row-by-row verification invariant.
    """
    ev = events.copy()
    ev = ev[~ev["content"].fillna("").str.contains(EXCLUDE_MARKER, regex=False)]
    ev = ev[~(ev["content"].isna() & ev["op"].isin(["I", "U"]))]
    is_noop = (ev["op"] == "U") & ev["old_content"].notna() & (ev["old_content"] == ev["content"])
    ev = ev[~is_noop]
    ev = ev.sort_values("seq").groupby(["repo", "path"], as_index=False).last()

    merged = base.merge(
        ev[["repo", "path", "commit", "lang", "content", "op", "seq"]],
        on=["repo", "path"],
        how="outer",
        suffixes=("_base", "_ev"),
    )
    has_ev = merged["op"].notna()
    out = pd.DataFrame(
        {
            "repo": merged["repo"],
            "path": merged["path"],
            "commit": np.where(has_ev, merged.get("commit_ev"), merged.get("commit_base")),
            "lang": np.where(has_ev, merged.get("lang_ev"), merged.get("lang_base")),
            "content": np.where(has_ev, merged.get("content_ev"), merged.get("content_base")),
            "deleted": (merged["op"] == "D").fillna(False),
        }
    )
    out = out[~out["deleted"]].drop(columns=["deleted"])
    out["content_sha"] = out["content"].map(
        lambda c: hashlib.sha256(str(c).encode()).hexdigest()
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
