"""Canonical word-n-gram SQL expression, shared by every operator
that shingles text (dedup LSH families, benchmark decontamination,
repetition quality rules). ONE definition so a tokenizer or boundary
change lands everywhere at once — three hand-synced copies of this
expression previously risked silently diverging on the
``sequence(1, 0)``-descends guard.
"""

from __future__ import annotations


def distinct_word_ngrams(col_words: str, n: int) -> str:
    """SQL expr string: distinct word n-grams of an array<string>
    column, as ``array<string>``. Pure array expressions — stays in
    whole-stage codegen.

    NB: ``sequence(1, 0)`` in Spark DESCENDS (``[1, 0]``) rather than
    being empty, so docs shorter than ``n`` tokens must short-circuit
    to an empty array explicitly."""
    return (
        f"case when size({col_words}) < {n} then cast(array() as array<string>)"
        f" else array_distinct(transform(sequence(1, size({col_words}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({col_words}, i, {n})))) end"
    )
