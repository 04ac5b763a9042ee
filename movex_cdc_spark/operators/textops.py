"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting. All built-in expressions (codegen);
the per-row Python path is deliberately avoided per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for",
    "with", "at", "by", "from", "as", "it", "that", "this", "be", "or",
]

ID_COL = "doc_id"
TEXT_COL = "text"


def text_analysis(df: DataFrame, threshold: float = 0.08) -> DataFrame:
    """ALL per-document text metrics in one projection over one scan —
    language ID (stopword-ratio heuristic), quality heuristics
    (length / punctuation density / digit density / mean token length
    + composite score), token counts (whitespace + BPE-ish regex
    proxy), and the order-insensitive bag-of-tokens fingerprint.

    One `split` feeds every metric; Catalyst keeps the whole thing in
    a single whole-stage-codegen projection, so a 100-TB corpus pays
    ONE scan for the full battery instead of four. The narrower
    operators below are thin column slices of this frame."""
    sw = ",".join(f"'{w}'" for w in STOPWORDS)
    toks = df.withColumn("toks", F.split(F.col(TEXT_COL), " "))
    m = toks.select(
        ID_COL,
        F.round(
            F.expr(f"size(filter(toks, t -> lower(t) in ({sw})))")
            / F.greatest(F.size("toks"), F.lit(1)),
            6,
        ).alias("sw_ratio"),
        F.length(TEXT_COL).alias("n_chars"),
        F.size("toks").alias("n_tokens"),
        # regexp_count of a single-char class == the chars-removed
        # length diff the previous regexp_replace shape computed, but
        # WITHOUT materializing a stripped copy of every document
        # (two full-string rewrites per doc dropped — r8)
        F.round(
            F.regexp_count(F.col(TEXT_COL), F.lit("[.!?,;:]"))
            / F.greatest(F.length(TEXT_COL), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.regexp_count(F.col(TEXT_COL), F.lit("[0-9]"))
            / F.greatest(F.length(TEXT_COL), F.lit(1)),
            6,
        ).alias("digit_ratio"),
        # sum of token lengths == n_chars - (n_tokens - 1): split on
        # ' ' consumes exactly one separator char per boundary (empty
        # tokens included), so the per-doc aggregate fold is pure
        # integer arithmetic — identical values, no HOF walk (r8)
        F.round(
            (F.length(TEXT_COL) - F.size("toks") + F.lit(1))
            / F.greatest(F.size("toks"), F.lit(1)),
            6,
        ).alias("mean_tok_len"),
        F.size(F.expr(f"regexp_extract_all({TEXT_COL}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).alias(
            "bpe_ish_tokens"
        ),
        F.sha2(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.col("toks")))), 256
        ).alias("fingerprint"),
    )
    return m.select(
        "*",
        F.when(F.col("sw_ratio") >= threshold, "en").otherwise("other").alias("pred_lang"),
        F.round(
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
            + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.25
            + (1 - F.least(F.col("digit_ratio") * 5, F.lit(1.0))) * 0.25,
            6,
        ).alias("quality"),
    )


def language_id(df: DataFrame, threshold: float = 0.08) -> DataFrame:
    """n-gram/stopword heuristic language ID: English stopword ratio
    over whitespace tokens; >= threshold -> 'en', else 'other'."""
    return text_analysis(df, threshold).select(ID_COL, "sw_ratio", "pred_lang")


def quality_score(df: DataFrame) -> DataFrame:
    """Quality heuristics: length, token stats, punctuation density,
    digit density, mean token length; composite score in [0,1]."""
    return text_analysis(df).select(
        ID_COL, "n_chars", "n_tokens", "punct_ratio", "digit_ratio",
        "mean_tok_len", "quality",
    )


def token_counts(df: DataFrame) -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword proxy: runs of letters,
    runs of digits, and single punctuation marks each count as one."""
    return text_analysis(df).select(
        ID_COL,
        F.col("n_tokens").alias("ws_tokens"),
        "bpe_ish_tokens",
        "n_chars",
    )


def fingerprint(df: DataFrame) -> DataFrame:
    """Order-insensitive document fingerprint: sha256 of the sorted
    distinct token bag — robust to token reordering, the cheap analog
    of a rolling-hash winnowing fingerprint."""
    return text_analysis(df).select(ID_COL, "fingerprint")


def tfidf_top_terms(df: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document — the vocabulary/feature stage
    of a text pipeline, as three narrow aggregations (no UDFs):

      tf  — one shuffle on (doc, term)
      df  — one shuffle on term (then broadcast back: the term
             dictionary is tiny relative to the corpus)
      N   — global doc count as a broadcast 1-row aggregate (the lazy
             scalar pattern, no driver round-trip)

    tfidf = tf * (ln((1+N)/(1+df)) + 1), smooth-idf. Ranking uses the
    ROUNDED score (6 dp) with the term as tie-break so the order is
    engine-independent (double ulps never decide a rank)."""
    from pyspark.sql import Window

    toks = df.select(ID_COL, F.explode(F.split(F.col(TEXT_COL), " ")).alias("term"))
    tf = toks.groupBy(ID_COL, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(ID_COL).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df"))) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy(ID_COL).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(ID_COL, "term", "tf", "df", "tfidf", "rk")
    )


def repetition_stats(
    df: DataFrame,
    keep_top_tok: float = 0.12,
    keep_dup_2gram: float = 0.10,
    keep_dup_3gram: float = 0.08,
) -> DataFrame:
    """Repetition quality signals (the Gopher-rules family, public
    methodology): per doc the top-token mass fraction and the
    duplicate 2-/3-gram occurrence fractions, plus a keep flag at the
    configured thresholds — ALL THREE signals gate (a doc whose
    repetition is concentrated in repeated 3-grams with diverse bigram
    contexts must not slip through on the 2-gram rule alone). Repeated
    boilerplate and degenerate keyword-stuffed pages score high on all
    three; the battery's ratio/length features miss them.

    Shape: the n-gram dup fractions are per-row array expressions
    (codegen, zero shuffle — 1 - distinct/total over the doc's own
    grams); the top-token fraction needs per-(doc, token) counts, a
    two-level aggregation whose first shuffle is (doc_id, tok) — both
    levels map-side combine, and cardinality is bounded by corpus
    token count, not vocabulary². The doc_id equi-join of the two
    sides reuses the agg's hash partitioning."""
    toks = df.select(ID_COL, F.explode(F.split(F.col(TEXT_COL), " ")).alias("tok"))
    tok_stats = (
        toks.groupBy(ID_COL, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(ID_COL)
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tokens"))
    )

    def _dup_frac(n_expr, d_expr):
        return F.round(
            F.when(n_expr <= 0, F.lit(0.0)).otherwise(F.lit(1.0) - d_expr / n_expr), 6
        )

    def _distinct_g(n: int) -> F.Column:
        from movex_cdc_spark.functions.ngrams import distinct_word_ngrams

        # size(empty array) = 0, so the canonical short-doc guard
        # yields the same 0 this column previously special-cased
        return F.expr(f"size({distinct_word_ngrams('w', n)})")

    grams = df.withColumn("w", F.split(F.col(TEXT_COL), " ")).select(
        ID_COL,
        _dup_frac(F.size("w") - 1, _distinct_g(2)).alias("dup_2gram_frac"),
        _dup_frac(F.size("w") - 2, _distinct_g(3)).alias("dup_3gram_frac"),
    )
    return tok_stats.join(grams, ID_COL).select(
        ID_COL,
        "n_tokens",
        F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_tok_frac"),
        "dup_2gram_frac",
        "dup_3gram_frac",
        (
            (F.round(F.col("top_c") / F.col("n_tokens"), 6) <= keep_top_tok)
            & (F.col("dup_2gram_frac") <= keep_dup_2gram)
            & (F.col("dup_3gram_frac") <= keep_dup_3gram)
        ).cast("int").alias("keep"),
    )


def interdoc_boilerplate(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    max_frac: float = 0.5,
    id_col: str = ID_COL,
    text_col: str = TEXT_COL,
) -> DataFrame:
    """INTER-document boilerplate detection (public CCNet/Dolma-style
    corpus-level repetition): per doc, the fraction of its DISTINCT
    word n-grams that occur in >= ``min_df`` documents corpus-wide.
    Template pages, boilerplate footers, and near-copies of common
    content score high; ``repetition_stats`` (the INTRA-document
    Gopher rules) cannot see them — a page that is one clean copy of a
    10,000×-duplicated template has zero internal repetition.

    Scale shape (the 100-TB plan): grams are hashed to a 16-hex key
    BEFORE the shuffle (sha2 prefix — deterministic, oracle-matchable),
    so the two gram-keyed exchanges move 16-byte keys, not n-word
    strings. Stages: explode distinct grams -> groupBy(gram) df count
    (map-side combine; output bounded by distinct-gram count) ->
    gram-keyed equi-join back (AQE reuses the agg's partitioning) ->
    groupBy(doc) fraction. Every term is O(total grams); nothing is
    pairwise. Short docs (< n tokens) have zero grams and keep=1 by
    definition (explode_outer keeps them in the frame)."""
    from movex_cdc_spark.functions.ngrams import distinct_word_ngrams

    grams = (
        df.withColumn("w", F.split(F.col(text_col), " "))
        .select(
            id_col,
            F.explode_outer(F.expr(distinct_word_ngrams("w", n))).alias("gram"),
        )
        .select(
            id_col,
            F.when(
                F.col("gram").isNotNull(), F.substring(F.sha2("gram", 256), 1, 16)
            ).alias("g"),
        )
    )
    dfreq = (
        grams.filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    frac = F.when(
        F.col("n_grams") == 0, F.lit(0.0)
    ).otherwise(F.round(F.col("n_common") / F.col("n_grams"), 6))
    return (
        grams.join(dfreq, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("g").alias("n_grams"),
            F.count("df").alias("n_common"),
        )
        .select(
            id_col,
            "n_grams",
            "n_common",
            frac.alias("boiler_frac"),
            (frac <= max_frac).cast("int").alias("keep"),
        )
    )
