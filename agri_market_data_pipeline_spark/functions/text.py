"""Text column expressions shared by the dedup / text-analysis operators.

Tokenization is a plain split on single spaces — matching the synthetic
`documents.text` format and keeping Spark and the SQL oracles trivially
aligned. Shingling and hashing use md5, the one hash both engines share
bit-for-bit, so even MinHash signatures are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    return F.split(_c(col), " ")


def shingles3(tok_col: Column | str) -> Column:
    """Word 3-gram shingles from a token array (empty if < 3 tokens).

    Built as zip(t[0:n-2], t[1:n-1], t[2:n]) → concat: the lambda touches
    only its own zipped element, so Catalyst evaluates the token array
    once. (The index-based form — transform(sequence(1, n-2),
    i -> concat(element_at(t, i), …)) — re-evaluates the outer array
    expression per index and ran ~5× slower; and sequence(1, n-2) with
    n < 3 generates a *descending* sequence rather than an empty one.)
    greatest(n-2, 0) keeps the slice length non-negative: short docs
    yield empty slices, hence zero shingles, no conditional needed."""
    t = _c(tok_col)
    n = F.greatest(F.size(t) - 2, F.lit(0))
    z = F.arrays_zip(
        F.slice(t, 1, n).alias("a"), F.slice(t, 2, n).alias("b"), F.slice(t, 3, n).alias("c")
    )
    return F.transform(z, lambda s: F.concat_ws(" ", s.a, s.b, s.c))


SQL_SHINGLES3 = """
CASE WHEN len({toks}) >= 3
     THEN list_transform(generate_series(1, len({toks}) - 2),
                         i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
     ELSE [] END
"""


# Tiny per-language stopword lexicons for the rule-based language-ID
# heuristic (the classic cheap lang-id: score languages by closed-class
# word hits; real corpora use char n-gram profiles — same plumbing).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to", "in"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
}

# Sentiment lexicon (EDBT'16-style lexicon scoring; integer weights keep
# the aggregate exact across engines).
SENTIMENT_LEXICON: dict[str, int] = {"fast": 1, "merge": 1, "slow": -1, "small": -1}
