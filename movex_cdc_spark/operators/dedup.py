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
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = ID_COL,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Candidate pairs by shared n-gram shingles with Jaccard >= t.

    shuffle profile: explode -> shingle-DF filter -> join on shingle
    (blocking) -> pair agg. Docs sharing zero shingles never meet, so
    cost scales with true overlap, not with |docs|².

    max_shingle_df is the 100-TB guard: a shingle appearing in d docs
    produces O(d²) candidate pairs in its block, so ONE boilerplate
    shingle (a license header, a template line) at d=10^6 would emit
    10^12 pairs. Shingles with document frequency > max_shingle_df are
    dropped from the similarity universe BEFORE the self-join — one
    extra narrow groupBy(shingle).count() — bounding any block at
    max_shingle_df² pairs. Jaccard is then exact over the capped
    universe: doc sizes count only surviving shingles, so dropped
    shingles leave both numerator and denominator. (df=1 shingles are
    additionally skipped in the join — they cannot form a pair — but
    still count toward sizes.)"""
    sh = with_shingles(df, n).select(id_col, "shingles")
    ex = sh.select(id_col, F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        ok = dfreq.filter(F.col("df") <= max_shingle_df)
        ex = ex.join(ok, "shingle")
        sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
        joinable = ex.filter(F.col("df") >= 2).drop("df")
        ex = ex.drop("df")
    else:
        sizes = sh.select(id_col, F.size("shingles").alias("n_sh"))
        joinable = ex
    a, b = joinable.alias("a"), joinable.alias("b")
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


def simhash64(df: DataFrame, text_col: str = TEXT_COL, id_col: str = ID_COL) -> DataFrame:
    """64-bit SimHash: bit i (1..64) is the sign of the sum over distinct
    tokens of ±1 according to the high bit of hex digit i of
    sha256(token). One sha256 per token (materialized once), then 64
    sign-aggregations over the cached hex strings — all codegen array
    expressions, no shuffle. 64 bits is the production width: at 10^10
    docs a 16-bit fingerprint has ~150k docs per value (useless), while
    64-bit collisions are genuine near-dups."""
    toks = df.withColumn("toks", F.array_distinct(F.split(F.col(text_col), " ")))
    shas = toks.withColumn("shas", F.expr("transform(toks, t -> sha2(t, 256))"))
    return shas.withColumn(
        "simhash",
        F.expr(
            "concat_ws('', transform(sequence(1, 64), i -> "
            "  case when aggregate(shas, 0, (acc, h) -> acc + "
            "    (case when substring(h, i, 1) in ('8','9','a','b','c','d','e','f')"
            "          then 1 else -1 end)) >= 0 then '1' else '0' end))"
        ),
    ).select(id_col, "simhash")


def simhash64_banded_pairs(
    df: DataFrame,
    n_bands: int = 4,
    id_col: str = ID_COL,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs by banded 64-bit SimHash: split the
    fingerprint into n_bands contiguous bit-bands; a pair is a candidate
    iff it collides in >= 1 band (i.e. Hamming distance 0 within that
    band — the Hamming-ball banding trick: d bit flips can break at most
    d bands, so any pair with Hamming distance < n_bands is guaranteed
    to collide somewhere). Returns (id_a, id_b, n_bands_equal) — the
    collision count is a similarity strength score.

    Shuffle profile: the band-bucket equi-join is the only shuffle —
    bucketed, never all-pairs. For larger corpora raise bits-per-band
    (fewer bands) and/or set max_bucket_size: buckets holding more docs
    than the cap are boilerplate clusters (identical fingerprint bands
    across unrelated docs) and are dropped before the self-join, exactly
    like the shingle-DF cap in ngram_jaccard_pairs."""
    assert 64 % n_bands == 0
    width = 64 // n_bands
    sh = simhash64(df, id_col=id_col)
    bands = sh.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" b -> struct(b as band_idx,"
                f" substring(simhash, b * {width} + 1, {width}) as band_val))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    if max_bucket_size is not None:
        sizes = bands.groupBy("band_idx", "band_val").agg(F.count(F.lit(1)).alias("bn"))
        bands = bands.join(
            sizes.filter(F.col("bn") <= max_bucket_size), ["band_idx", "band_val"]
        ).drop("bn")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_equal"))
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
