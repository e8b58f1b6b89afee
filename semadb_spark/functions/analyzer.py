"""Standard text analyser.

The reference allows exactly one analyser, bleve's "standard"
(models/index.go:315-324; pluggable interface shard/index/text/text.go:62-66):
unicode word tokenizer → lowercase → English stopword removal.

We pin an equivalent, engine-portable spec so the DuckDB oracle can reproduce
it token-for-token:

- lowercase the input;
- CJK ideographs/kana/hangul are exploded into single-character tokens
  (bleve's unicode tokenizer implements UAX#29, under which each Han
  character is its own word segment);
- remaining tokens are maximal runs of unicode letters/digits
  (``[\\p{L}\\p{N}]+``) — accented words stay whole;
- drop empty tokens and the classic Lucene English stopword set (the set
  bleve's ``stop_en`` filter uses).

Approximation vs full UAX#29 (documented): mid-token punctuation that
UAX#29 keeps inside a word ("don't", "3.14") splits here. On pure-ASCII
text this analyser is bit-identical to runs of ``[a-z0-9]+``, which is what
the round-1/2 gates pinned.

The three implementations below (Spark Column, DuckDB SQL, driver-side
Python) must stay token-for-token identical; tests/test_pipeline_ops.py
pins golden tokens across all three.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# Classic Lucene / bleve English stop set (33 words).
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
)

# Maximal runs of unicode letters/digits form a token.
TOKEN_SPLIT_REGEX = r"[^\p{L}\p{N}]+"

# Single-character CJK segmentation (UAX#29 word-breaks between ideographs).
# Java (Spark) spells scripts \p{IsHan}; RE2 (DuckDB) spells them \p{Han}.
_CJK_SCRIPTS = ("Han", "Hiragana", "Katakana", "Hangul")
CJK_EXPLODE_REGEX_JAVA = "([" + "".join(f"\\p{{Is{s}}}" for s in _CJK_SCRIPTS) + "])"
CJK_EXPLODE_REGEX_RE2 = "([" + "".join(f"\\p{{{s}}}" for s in _CJK_SCRIPTS) + "])"

# Python-side equivalent: codepoint ranges of the four scripts' common blocks
# (enough for BMP text; supplementary-plane ideographs are out of fixture
# scope and documented as such).
_CJK_RANGES = (
    (0x2E80, 0x2EFF),    # CJK Radicals Supplement (Han)
    (0x3005, 0x3005),    # ideographic iteration mark (Han)
    (0x3007, 0x3007),    # ideographic zero (Han)
    (0x3040, 0x309F),    # Hiragana
    (0x30A0, 0x30FF),    # Katakana
    (0x31F0, 0x31FF),    # Katakana Phonetic Extensions
    (0x3400, 0x4DBF),    # CJK Ext A
    (0x4E00, 0x9FFF),    # CJK Unified Ideographs
    (0xF900, 0xFAFF),    # CJK Compatibility Ideographs
    (0x1100, 0x11FF),    # Hangul Jamo
    (0x3130, 0x318F),    # Hangul Compatibility Jamo
    (0xAC00, 0xD7AF),    # Hangul Syllables
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _prep(c: Column) -> Column:
    """lowercase + final-sigma fold + space-explode CJK chars.

    The ς→σ fold matches unicode full case folding: Java/Python lowercase
    applies the contextual Greek final-sigma rule, DuckDB's utf8proc does
    not — folding both to σ keeps the three implementations identical."""
    return F.regexp_replace(
        F.translate(F.lower(c), "ς", "σ"), CJK_EXPLODE_REGEX_JAVA, " $1 "
    )


def tokenize(c: Column | str, remove_stopwords: bool = True) -> Column:
    """STRING column -> ARRAY<STRING> of analysed tokens (keeps duplicates —
    term frequency matters for TF-IDF)."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(_prep(c), TOKEN_SPLIT_REGEX)
    toks = F.filter(toks, lambda t: t != "")
    if remove_stopwords:
        stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return toks


def tokenize_py(text: str, remove_stopwords: bool = True) -> list[str]:
    """Pure-Python replica of :func:`tokenize` (driver-side query analysis,
    token-parity tests). Letters/digits = unicode categories L*/N*."""
    out: list[str] = []
    cur: list[str] = []

    def flush() -> None:
        if cur:
            tok = "".join(cur)
            if not (remove_stopwords and tok in ENGLISH_STOPWORDS):
                out.append(tok)
            cur.clear()

    for ch in text.lower().replace("ς", "σ"):
        if _is_cjk(ch):
            flush()
            if not (remove_stopwords and ch in ENGLISH_STOPWORDS):
                out.append(ch)
        elif unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        else:
            flush()
    flush()
    return out


def analyze_query(text: str) -> list[str]:
    """Driver-side analysis of a query string → unique terms (the reference
    dedupes query terms into a set, text.go:314-318). Order = first occurrence
    so scoring is deterministic."""
    seen: dict[str, None] = {}
    for t in tokenize_py(text):
        seen.setdefault(t, None)
    return list(seen)


def duckdb_tokenize_sql(col_sql: str, remove_stopwords: bool = True) -> str:
    """DuckDB SQL expression producing the identical token list — used to
    build oracle queries that must match Spark token-for-token."""
    prepped = (
        f"regexp_replace(replace(lower({col_sql}), 'ς', 'σ'),"
        f" '{CJK_EXPLODE_REGEX_RE2}', ' \\1 ', 'g')"
    )
    base = (
        f"list_filter(string_split_regex({prepped}, '{TOKEN_SPLIT_REGEX}'),"
        " t -> t <> '')"
    )
    if remove_stopwords:
        stop = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)
        base = f"list_filter({base}, t -> NOT list_contains([{stop}], t))"
    return base
