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
    """Word 3-gram shingles from a token array (empty if < 3 tokens —
    guarded because sequence(1, n) with n < 1 would generate a
    *descending* sequence in Spark)."""
    t = _c(tok_col)
    n = F.size(t)
    make = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1), F.element_at(t, i + 2)
        ),
    )
    return F.when(n >= 3, make).otherwise(F.array().cast("array<string>"))


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
