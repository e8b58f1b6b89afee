"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, zero shuffles until the caller
aggregates) with engine-portable semantics for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from semadb_spark.functions.analyzer import ENGLISH_STOPWORDS, tokenize

# Marker function words per language for the n-gram/stopword-hit heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "that", "for", "with"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que"),
    "fr": ("le", "la", "les", "est", "une", "dans", "que", "pour"),
}


def token_count(c: Column | str) -> Column:
    """Whitespace/punctuation token count (stopwords kept)."""
    return F.size(tokenize(c, remove_stopwords=False))


def detect_language(c: Column | str) -> Column:
    """Stopword-hit language heuristic -> 'de'/'en'/'es'/'fr' or 'und'.

    Score per language = distinct marker words present; highest wins, ties
    broken by language code ascending; zero hits -> 'und'.
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = F.array_distinct(tokenize(c, remove_stopwords=False))
    langs = sorted(LANG_MARKERS)
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]]))
        )
        for lang in langs
    }
    # chained argmax: first language (ascending) whose score >= all later ones
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = langs[langs.index(lang) + 1 :]
        cond = F.lit(True)
        for other in later:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    all_zero = F.lit(True)
    for lang in langs:
        all_zero = all_zero & (scores[lang] == 0)
    return F.when(all_zero, F.lit("und")).otherwise(expr)


def quality_features(c: Column | str) -> dict[str, Column]:
    """Quality signals: lengths, mean token length, stopword ratio, digit and
    punctuation character ratios."""
    c = F.col(c) if isinstance(c, str) else c
    toks = tokenize(c, remove_stopwords=False)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alnum_chars = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    digit_chars = F.length(F.regexp_replace(c, "[^0-9]", ""))
    stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    safe_tok = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(1.0))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.when(n_tok > 0, alnum_chars.cast("double") / safe_tok).otherwise(F.lit(0.0)),
        "stopword_ratio": n_stop.cast("double") / safe_tok,
        "digit_ratio": digit_chars.cast("double") / safe_chars,
        "punct_ratio": (n_chars - alnum_chars - F.length(F.regexp_replace(c, "[^ ]", ""))).cast("double") / safe_chars,
    }


def quality_score(c: Column | str) -> Column:
    """Scalar quality score in [0,1]: rewards mid-length docs with healthy
    stopword ratios and low digit noise (heuristic in the C4/Gopher-rule
    spirit, simplified to stay engine-portable)."""
    f = quality_features(c)
    len_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_ok = F.when((f["stopword_ratio"] >= 0.05) & (f["stopword_ratio"] <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    digit_ok = F.lit(1.0) - F.least(f["digit_ratio"] * 2, F.lit(1.0))
    return (len_ok + stop_ok + digit_ok) / 3


def fingerprint(c: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (classic key-collision / clustering fingerprint)."""
    toks = F.array_sort(F.array_distinct(tokenize(c, remove_stopwords=False)))
    return F.md5(F.concat_ws(" ", toks))
