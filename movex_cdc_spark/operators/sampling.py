"""Training-corpus curation operators: deterministic sampling, token-
budget shard packing, per-source caps.

These are the selection/layout steps of a large-scale training-data
pipeline (SURVEY §2.11 — beyond-reference operators): after cleaning
and dedup, a corpus is rebalanced (stratified sampling), capped per
origin (a hot domain must not dominate), and packed into shards whose
token mass fits a training context/batch budget.

Scale notes (the 100-TB contract):

  * Sampling is a pure per-row predicate on a sha256 of the row id —
    no shuffle, no RNG state, reproducible across reruns and engines;
    changing the rate re-selects a superset/subset (hash thresholding),
    which is what lets a pipeline dial a mixture without re-shuffling.
  * Shard packing partitions by a deterministic bucket and packs
    INSIDE each bucket with one window — buckets are independent, so
    the only shuffle is the bucket hash partition and no global sort
    ever happens. One bucket ≈ one executor-sized unit of work.
  * Per-source caps are a bounded row_number window per (group) —
    the canonical hot-domain guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32


def hash_uniform_u32(col) -> "F.Column":
    """Deterministic uniform u32 from a column: first 8 hex chars of
    sha256 of the value's string form. Matches DuckDB
    ``('0x' || substr(sha256(CAST(x AS VARCHAR)), 1, 8))::UBIGINT`` so
    oracles reproduce the exact selection."""
    return F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10).cast("long")


def stratified_hash_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash_u32(id) < rate(group) * 2^32 — stratified
    downsampling with per-stratum rates (e.g. rebalance an en-heavy
    corpus). Deterministic: the same row is kept under every run and
    every engine; raising a rate strictly grows the kept set."""
    u = hash_uniform_u32(F.col(id_col))
    rate = F.lit(float(default_rate))
    for g, r in rates.items():
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    # floor() the threshold EXPLICITLY: Spark's cast(double as long)
    # truncates while DuckDB's ::UBIGINT rounds (0.8*2^32 -> ...836 vs
    # ...837), so without a shared floor the keep-set differs on any
    # row whose hash lands exactly on the boundary — a latent one-in-
    # 2^32-per-row oracle mismatch. Both engines floor the same double.
    return df.filter(u < F.floor(rate * F.lit(float(HASH_SPACE))).cast("long"))


def token_count(text_col) -> "F.Column":
    """Whitespace token count (the battery's cheap tokenizer)."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def pack_token_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
) -> DataFrame:
    """Assign each document to a training shard so that each shard's
    token mass stays near ``budget``: greedy sequential packing by a
    running token sum, independently per deterministic bucket
    (``id % n_buckets``). A document starts a new shard when the
    running sum before it has consumed whole budgets — i.e.
    shard = floor((cumsum_tokens - tokens) / budget), the
    start-of-document convention, so a document always lands wholly in
    one shard. Shards are keyed (bucket, shard_id).

    At scale: buckets are the parallelism unit (one window per bucket
    partition, no global sort); n_buckets scales with the cluster while
    per-bucket packing stays sequential-deterministic."""
    tok = token_count(F.col(text_col))
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), bucket.alias("bucket"), tok.alias("tokens"))
        .withColumn("cum_tokens", F.sum("tokens").over(w).cast("long"))
        .withColumn(
            "shard_id",
            F.floor((F.col("cum_tokens") - F.col("tokens")) / F.lit(budget)).cast("long"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per group, preferring the largest
    ``order_col`` (ties broken by ascending id — a total order, so the
    kept set is deterministic). The hot-domain cap of a crawl pipeline."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 40,
    overlap_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap —
    the context-window prep step: a doc longer than the training
    context becomes ``ceil`` overlapping windows, short docs pass as
    one chunk. Returns ``(id, chunk_id, n_chunk_tokens, chunk_text)``.

    Shape: chunk boundaries are computed per row from the token array
    (codegen), then exploded — a narrow operation, zero shuffle; the
    output inherits the input partitioning, so chunking composes with
    a downstream ``pack_token_shards`` without an extra exchange.
    Overlap duplicates at most ``overlap/stride`` of the corpus —
    bounded, declared, and identical on every engine (integer math
    only, no floats in the boundary rule)."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    # transform(array(split(..)), w -> ...) is the SQL "let" idiom: the
    # token array is bound to the lambda variable and tokenized exactly
    # ONCE per document. A plain column would be inlined by project
    # collapsing and re-split inside the per-chunk lambda — O(chunks ×
    # doc_len) re-tokenization per row instead of O(doc_len).
    chunks = (
        f"transform(array(split({text_col}, ' ')), w ->"
        f" transform(sequence(0, case when size(w) <= {chunk_tokens} then 0"
        f"   else (size(w) - {chunk_tokens} + {stride - 1}) div {stride} end),"
        f"  i -> slice(w, i * {stride} + 1, {chunk_tokens})))[0]"
    )
    return df.select(
        id_col, F.posexplode(F.expr(chunks)).alias("chunk_id", "toks")
    ).select(
        id_col,
        "chunk_id",
        F.size("toks").alias("n_chunk_tokens"),
        F.array_join("toks", " ").alias("chunk_text"),
    )
