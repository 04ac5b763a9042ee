"""Benchmark decontamination — flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (the GPT-3 appendix-C /
PaLM-style "13-gram collision" rule, public methodology): a document
is contaminated if any of its word n-grams collides with an n-gram of
a benchmark item; the overlap fraction grades severity.

Spark shape (the 100-TB story): the benchmark side is SMALL relative
to the corpus (eval sets are thousands of items, the corpus is
billions), so its distinct n-gram set is BROADCAST — the corpus scan
never shuffles for the probe. Per doc, distinct n-grams are generated
in whole-stage codegen (same array-expression pattern as
operators/dedup.with_shingles), exploded, and hash-probed against the
broadcast set in ONE pass; the only shuffle is the groupBy(doc_id),
whose map-side combine collapses each doc's exploded grams to a
single partial row before the exchange — O(docs) shuffle volume, one
corpus scan, zero joins on the corpus axis.

Not in the reference (curation mandate); closest reference analog is
the per-event condition filter (db_trigger_generator_oracle.rb
trigger conditions) — a declarative keep/drop rule over a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ID_COL = "doc_id"
TEXT_COL = "text"


from movex_cdc_spark.functions.ngrams import distinct_word_ngrams as _distinct_ngrams


def with_ngrams(df: DataFrame, n: int, text_col: str = TEXT_COL) -> DataFrame:
    """Adds ``grams`` (distinct word n-grams) and ``n_grams`` (count).
    Pure array expressions — stays in whole-stage codegen."""
    return (
        df.withColumn("_words", F.split(F.col(text_col), " "))
        .withColumn("grams", F.expr(_distinct_ngrams("_words", n)))
        .withColumn("n_grams", F.size("grams"))
        .drop("_words")
    )


def benchmark_ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = ID_COL,
    text_col: str = TEXT_COL,
    bench_text_col: str = TEXT_COL,
) -> DataFrame:
    """Per-document benchmark overlap: ``(id, n_grams, n_hit,
    hit_frac, contaminated)`` for every doc with at least one n-gram.

    ``contaminated`` (int 0/1) fires at ``min_hits`` colliding
    distinct n-grams — the published rule is any collision
    (min_hits=1); raise it to tolerate boilerplate n-grams, or filter
    on ``hit_frac`` downstream for a severity cut instead.

    The benchmark's distinct n-gram set must fit in an executor
    (broadcast) — true for real eval suites by orders of magnitude.
    """
    bench_grams = (
        with_ngrams(benchmark, n, bench_text_col)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE corpus pass: explode the per-doc distinct grams, probe the
    # broadcast set with a LEFT join (no row multiplication — the
    # bench side is distinct), and re-derive n_grams as count(1) in
    # the same aggregate (grams are array_distinct, so the counts are
    # identical). The groupBy's map-side combine collapses each doc's
    # exploded rows before the exchange, so the shuffle is O(docs),
    # while the scan + gram generation — the dominant cost at corpus
    # scale — runs ONCE (previously this subtree was evaluated twice:
    # once for the hit counts, once for the final left join).
    n_hit = F.count("_hit")
    return (
        with_ngrams(docs, n, text_col)
        .select(id_col, F.explode("grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            n_hit.alias("n_hit"),
            F.round(n_hit / F.count(F.lit(1)), 6).alias("hit_frac"),
            (n_hit >= min_hits).cast("int").alias("contaminated"),
        )
    )
