"""Heuristic text statistics as Spark SQL column expressions.

Gopher/C4-style per-document quality signals, kept entirely JVM-side
(whole-stage codegen; no Python in the hot path).  Analog of the
reference's per-channel stats consumption (SURVEY §2.5 G10,
``wibeth_tests.py:241-242``) — here recomputed natively per document.

Canonical token definition (shared with textproc.py reference impl):
whitespace runs split the text; lines split on ``\\n``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dqmtools_spark.functions.textproc import LANG_MARKERS

# union of all language marker words — used for the stop-word fraction
ALL_MARKERS = sorted(set().union(*LANG_MARKERS.values()))


def words(text: Column) -> Column:
    """Whitespace tokens (empty text -> empty array, not [''])."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def lines(text: Column) -> Column:
    return F.split(text, r"\n")


def word_count(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def mean_word_len(text: Column) -> Column:
    w = words(text)
    total_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.when(F.size(w) == 0, F.lit(None).cast("double")).otherwise(
        total_len.cast("double") / F.size(w)
    )


def symbol_ratio(text: Column) -> Column:
    """Fraction of characters that are not letters/digits/whitespace."""
    total = F.length(text)
    syms = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(syms.cast("double") / total)


def stopword_fraction(text: Column) -> Column:
    """Fraction of tokens that are (any-language) marker stop-words."""
    w = words(F.lower(text))
    markers = F.array(*[F.lit(m) for m in ALL_MARKERS])
    hits = F.size(F.filter(w, lambda x: F.array_contains(markers, x)))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(w)
    )


def repeated_line_fraction(text: Column) -> Column:
    """1 - distinct/total over non-empty lines (boilerplate detector)."""
    ls = F.filter(lines(text), lambda x: F.length(F.trim(x)) > 0)
    return F.when(F.size(ls) == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(ls)).cast("double") / F.size(ls)
    )


def alpha_word_fraction(text: Column) -> Column:
    """Fraction of tokens containing at least one letter."""
    w = words(text)
    alpha = F.size(F.filter(w, lambda x: x.rlike(r"\p{L}")))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        alpha.cast("double") / F.size(w)
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: word pieces + standalone punctuation."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]")).cast("long")


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (rolling-hash analog)."""
    return F.xxhash64(text)


def all_stats(text: Column) -> dict[str, Column]:
    """The full stat bundle the rule layer consumes."""
    return {
        "word_count": word_count(text),
        "mean_word_len": mean_word_len(text),
        "symbol_ratio": symbol_ratio(text),
        "stopword_fraction": stopword_fraction(text),
        "repeated_line_fraction": repeated_line_fraction(text),
        "alpha_word_fraction": alpha_word_fraction(text),
    }
