"""Text analysis: token counting, quality scoring, language ID, fingerprints.

Every function has two synchronized forms:

* ``<name>(col)``   — a PySpark ``Column`` expression (JVM-side, codegen);
* ``<NAME>_SQL``    — the equivalent DuckDB SQL snippet (``{c}`` is the
  column), used verbatim by the correctness oracle.

The regex vocabulary is restricted to the RE2 ∩ Java-regex common subset
(character classes, alternation, ``\\b``) so both dialects agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization + fingerprint (rolling-hash analogue, SURVEY driver brief)
# ---------------------------------------------------------------------------

def normalize_text(c: Column) -> Column:
    """lower + trim + collapse internal whitespace."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


NORMALIZE_SQL = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"


def fingerprint(c: Column) -> Column:
    """Deterministic 128-bit document fingerprint over normalized text.

    md5 rather than a custom rolling hash so the oracle can reproduce it;
    the cost is one JVM hash per row either way.
    """
    return F.md5(normalize_text(c))


FINGERPRINT_SQL = f"md5({NORMALIZE_SQL})"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_count(c: Column) -> Column:
    """Whitespace token count.

    Emitted as BIGINT: per-doc counts fit an int, but every consumer
    (budget packing prefix sums, corpus-level token totals) aggregates
    them — and DuckDB's ``len()`` oracle twin is int64, which the
    type-sensitive compare must match."""
    return F.size(F.split(F.trim(c), r"\s+")).cast("long")


TOKEN_COUNT_SQL = "len(string_split_regex(trim({c}), '\\s+'))"


#: BPE-ish segmentation: runs of alphanumerics OR single non-space symbols.
_BPE_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(c: Column) -> Column:
    """Sub-word-ish token count (alnum runs + punctuation symbols).
    BIGINT for the same reasons as :func:`token_count`."""
    return F.regexp_count(c, F.lit(_BPE_PATTERN)).cast("long")


BPE_TOKEN_COUNT_SQL = (
    "len(regexp_extract_all({c}, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))"
)


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword / word-shape signals)
# ---------------------------------------------------------------------------

_STOPWORDS = "the|and|of|to|a|in|is|it|that|for"
_PUNCT_CLASS = r"[.!?,;:]"


def stopword_count(c: Column) -> Column:
    return F.regexp_count(F.lower(c), F.lit(rf"\b({_STOPWORDS})\b"))


STOPWORD_COUNT_SQL = (
    "len(regexp_extract_all(lower({c}), '\\b(" + _STOPWORDS + ")\\b'))"
)


def punct_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(_PUNCT_CLASS))


PUNCT_COUNT_SQL = "len(regexp_extract_all({c}, '[.!?,;:]'))"


def quality_score(c: Column) -> Column:
    """Heuristic [0,1] quality: length signal + stopword presence −
    punctuation excess.  Deterministic, identical math in the SQL twin.
    """
    n_chars = F.length(c).cast("double")
    toks = token_count(c).cast("double")
    stop_ratio = stopword_count(c).cast("double") / F.greatest(toks, F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / F.greatest(n_chars, F.lit(1.0))
    length_signal = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_signal
        + F.lit(0.4) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return F.round(score, 6)


# Association mirrors the Column form EXACTLY — (ratio) * k, never
# (count * k) / denom: float mul/div aren't associative, and a value on a
# 1e-6 rounding boundary would otherwise flip the last rounded digit
# between engines.
QUALITY_SCORE_SQL = (
    "round("
    "0.4 * least(length({c}) / 500.0, 1.0) "
    "+ 0.4 * least((" + STOPWORD_COUNT_SQL + " / greatest(" + TOKEN_COUNT_SQL + ", 1.0)) * 5.0, 1.0) "
    "+ 0.2 * (1.0 - least((" + PUNCT_COUNT_SQL + " / greatest(length({c}), 1.0)) * 10.0, 1.0))"
    ", 6)"
)


# ---------------------------------------------------------------------------
# language ID (stopword-profile heuristic + CJK detection)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "fr": ["le", "la", "les", "et", "des", "une", "que", "pour", "dans", "est"],
    "es": ["el", "los", "las", "una", "que", "por", "para", "con", "del", "esta"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "bei", "auf", "ein"],
}

#: priority for tie-breaking, highest first
_LANG_PRIORITY = ["en", "fr", "es", "de", "zh"]

_CJK_CLASS = r"[\x{4e00}-\x{9fff}]"
_CJK_SQL = "len(regexp_extract_all({c}, '[\\x{{4e00}}-\\x{{9fff}}]'))"


def _lang_pattern(lang: str) -> str:
    return r"\b(" + "|".join(_LANG_STOPWORDS[lang]) + r")\b"


def lang_scores(c: Column) -> dict[str, Column]:
    lower = F.lower(c)
    scores = {
        lang: F.regexp_count(lower, F.lit(_lang_pattern(lang)))
        for lang in _LANG_STOPWORDS
    }
    scores["zh"] = F.regexp_count(c, F.lit(_CJK_CLASS))
    return scores


def lang_id(c: Column) -> Column:
    """Argmax of the language scores; ties resolved in fixed priority
    en > fr > es > de > zh; all-zero → 'und'."""
    s = lang_scores(c)
    best = F.greatest(*s.values())
    expr = F.lit("und")
    for lang in reversed(_LANG_PRIORITY):
        expr = F.when(s[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def lang_id_sql() -> str:
    """DuckDB twin of :func:`lang_id` — same word lists, argmax, tie order."""
    scores = {
        lang: "len(regexp_extract_all(lower({c}), '\\b("
        + "|".join(_LANG_STOPWORDS[lang])
        + ")\\b'))"
        for lang in _LANG_STOPWORDS
    }
    scores["zh"] = _CJK_SQL
    best = "greatest(" + ", ".join(scores.values()) + ")"
    expr = "'und'"
    for lang in reversed(_LANG_PRIORITY):
        expr = f"CASE WHEN {scores[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return f"CASE WHEN {best} = 0 THEN 'und' ELSE ({expr}) END"
