"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-conscious:

  * exact        — sha256 hash-groupBy: one shuffle on a 64-hex key.
  * n-gram Jaccard — shingle explode + shingle-equi-join to find
    candidate pairs, then set-overlap Jaccard; the join key (shingle)
    is the blocking factor, so no O(n²) cross join ever materializes.
  * MinHash+LSH  — per-doc signature of k min-hashes, banded; only
    docs sharing a band bucket become candidate pairs. The signature
    is computed with array expressions (transform/array_min), entirely
    JVM-side; at 10^10 docs the band-bucket join is the only shuffle.
  * SimHash      — 16-bit sign-aggregated fingerprint from token
    hashes; near-dups collide on the fingerprint (grouping, not
    pairwise compare).

All hash primitives are sha256-based so the DuckDB oracle can
reproduce them bit-for-bit; a production deployment would swap
xxhash64 for speed (same structure, one line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEXT_COL = "text"
ID_COL = "doc_id"


def with_shingles(df: DataFrame, n: int = 3, text_col: str = TEXT_COL) -> DataFrame:
    """Distinct word n-gram shingles per doc, as an array column.
    Pure array expressions — no UDF, stays in whole-stage codegen."""
    # NB: sequence(1, 0) in Spark DESCENDS ([1,0]) rather than being
    # empty — short docs must short-circuit to an empty array.
    return df.withColumn("words", F.split(F.col(text_col), " ")).withColumn(
        "shingles",
        F.expr(
            f"case when size(words) < {n} then cast(array() as array<string>)"
            f" else array_distinct(transform(sequence(1, size(words) - {n - 1}),"
            f" i -> concat_ws(' ', slice(words, i, {n})))) end"
        ),
    )


def exact_dup_groups(df: DataFrame, text_col: str = TEXT_COL, id_col: str = ID_COL) -> DataFrame:
    """Exact duplicate groups by content sha256 (keeper = min id)."""
    return (
        df.withColumn("content_sha", F.sha2(F.col(text_col), 256))
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.5, id_col: str = ID_COL
) -> DataFrame:
    """Candidate pairs by shared n-gram shingles with Jaccard >= t.

    shuffle profile: explode -> join on shingle (blocking) -> pair agg.
    Docs sharing zero shingles never meet, so cost scales with true
    overlap, not with |docs|²."""
    sh = with_shingles(df, n).select(id_col, "shingles")
    sizes = sh.select(id_col, F.size("shingles").alias("n_sh"))
    ex = sh.select(id_col, F.explode("shingles").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(df: DataFrame, k: int = 8, n: int = 3, id_col: str = ID_COL) -> DataFrame:
    """k-permutation MinHash over n-gram shingles: signature[i] =
    min over shingles of sha256(i || '|' || shingle). min over the
    64-hex string is a valid uniform min-hash (sha256 is the permuter).
    Array-expression only — evaluated inside codegen, no shuffle."""
    sh = with_shingles(df, n)
    return sh.withColumn(
        "sig",
        F.expr(
            f"transform(sequence(0, {k - 1}),"
            f" i -> array_min(transform(shingles, s -> sha2(concat(cast(i as string), '|', s), 256))))"
        ),
    ).select(id_col, "sig")


def minhash_lsh_pairs(
    df: DataFrame, k: int = 8, rows_per_band: int = 2, n: int = 3, id_col: str = ID_COL
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band bucket.
    bands = k / rows_per_band; band value = concat of its rows.
    The band-bucket equi-join is the only shuffle (the LSH 'bucket-join'
    the task list names)."""
    n_bands = k // rows_per_band
    sig = minhash_signature(df, k, n, id_col)
    bands = sig.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" b -> struct(b as band_idx,"
                f" concat_ws('', slice(sig, b * {rows_per_band} + 1, {rows_per_band})) as band_val))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str = TEXT_COL, id_col: str = ID_COL) -> DataFrame:
    """16-bit SimHash: bit i is the sign of sum over distinct tokens of
    +/-1 according to the high bit of hex digit i of sha256(token).
    Near-duplicate texts (mostly-shared token sets) collide."""
    toks = df.withColumn("toks", F.array_distinct(F.split(F.col(text_col), " ")))
    return toks.withColumn(
        "simhash",
        F.expr(
            "concat_ws('', transform(sequence(1, 16), i -> "
            "  case when aggregate(toks, 0, (acc, t) -> acc + "
            "    (case when substring(sha2(t, 256), i, 1) in ('8','9','a','b','c','d','e','f')"
            "          then 1 else -1 end)) >= 0 then '1' else '0' end))"
        ),
    ).select(id_col, "simhash")
