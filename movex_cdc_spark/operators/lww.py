"""Last-writer-wins dedup per key by sequence (SURVEY W3/A7).

The reference guarantees per-key ordered delivery by routing each key
hash to exactly one worker and sorting each batch by Event_Logs.ID
(transfer_thread.rb:226-242,217; asserted by kafka_mock.rb:49-63).
Inside one micro-batch the equivalent, order-insensitive formulation is
last-writer-wins by seq: LWW(max-seq) is associative and commutative,
so it can be computed per-partition and combined — which is exactly
what makes the salted two-phase variant below safe for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(df: DataFrame, key_cols: list[str], seq_col: str = "seq") -> DataFrame:
    """Keep, per key, only the row with the highest seq.

    One hash-shuffle on the key columns; within each shuffle partition
    a running window — no sort spill beyond the partition. Ties broken
    deterministically (higher seq wins; seq is unique in a well-formed
    log, mirroring Event_Logs.ID from a sequence).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lww_dedup_maxby(df: DataFrame, key_cols: list[str], seq_col: str = "seq") -> DataFrame:
    """LWW via ``max_by`` aggregation — the hot-path variant.

    Unlike the window formulation (full batch through one shuffle,
    hot key -> one task), ``max_by(struct(payload), seq)`` is a
    declarative aggregate with a MAP-SIDE PARTIAL COMBINE: each input
    task reduces to at most one row per key before anything shuffles.
    Shuffle volume drops from O(|batch|) to O(|keys| x tasks), and a
    hot key is combined locally in every task first — the two-phase
    local-combine/global-merge of SURVEY A7 expressed so Catalyst
    plans it (no manual salting needed). Equivalence with the window
    form is property-tested in tests/test_lww.py."""
    payload = [c for c in df.columns if c not in key_cols and c != seq_col]
    return (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("__w"),
            F.max(seq_col).alias(seq_col),
        )
        .select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload], seq_col)
    )


def lww_dedup_salted(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase LWW for skewed keys (north rule's hot-repo handling).

    A hot key (one repo receiving a large share of all events) would
    put its entire event volume into a single task under plain
    ``Window.partitionBy(key)`` — the same bottleneck as the
    reference's one-worker-per-key-hash affinity under a hot key.

    Phase 1 (local combine): partition by (key, salt) where salt is
    derived from the seq — uniform, deterministic — and keep the max
    seq per salt slice. This cuts a hot key's rows by ~|rows|/salt.
    Phase 2 (global merge): plain LWW over the ≤ salt_buckets
    survivors per key. Correct because LWW-by-seq is associative and
    commutative (max is); property-tested in tests/test_lww.py.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(F.col(seq_col).desc())
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__salt")
    )
    return lww_dedup(local, key_cols, seq_col)
