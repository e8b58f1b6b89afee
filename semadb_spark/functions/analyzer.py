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
  (``[\\p{L}\\p{N}]+``) — accented words stay whole — EXTENDED with the
  UAX#29 mid-token rules (WB6/WB7, WB11/WB12): an apostrophe/period/colon
  followed by a letter continues a word ("don't", "o'clock", "e.g"), and a
  period/comma/apostrophe followed by a digit continues a number ("3.14",
  "1,000", "127.0.0.1") — matching bleve's unicode tokenizer on
  contractions and decimals;
- drop empty tokens and the classic Lucene English stopword set (the set
  bleve's ``stop_en`` filter uses).

Approximation vs full UAX#29 (documented): the join check classes only the
character AFTER the mid punctuation (RE2 — the DuckDB oracle engine — has
no lookbehind, so the character before it is only required to be part of a
token). Consequence: "3:a" or "a,1" stay whole here where UAX#29 breaks
them (mixed-class neighbors); rare mid characters (U+00B7, U+0387, U+066C,
fullwidth forms) are not in the mid set. Both divergences are
cross-implementation consistent.

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

# UAX#29 mid-token characters (subset; see module docstring). A mid char
# continues the current token when the NEXT character is of the right class:
# MidLetter/MidNumLet before a letter, MidNum/MidNumLet before a digit.
LETTER_MIDS = "'’.:"  # WB6/WB7: ALetter (MidLetter|MidNumLet) ALetter
DIGIT_MIDS = ".,'’"  # WB11/WB12: Numeric (MidNum|MidNumLet) Numeric

# Token = letter/digit run, optionally extended by mid-joined runs. One
# extraction regex (no lookaround — RE2-compatible for the DuckDB oracle);
# shared verbatim by the Spark (Java regex) and DuckDB (RE2) tiers.
TOKEN_EXTRACT_REGEX = (
    r"[\p{L}\p{N}]+"
    r"(?:['’.:]\p{L}[\p{L}\p{N}]*"
    r"|[.,'’]\p{N}[\p{L}\p{N}]*)*"
)

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
    toks = F.regexp_extract_all(_prep(c), F.lit(TOKEN_EXTRACT_REGEX), F.lit(0))
    toks = F.filter(toks, lambda t: t != "")
    if remove_stopwords:
        stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return toks


def tokenize_py(text: str, remove_stopwords: bool = True) -> list[str]:
    """Pure-Python replica of :func:`tokenize` (driver-side query analysis,
    token-parity tests). Letters/digits = unicode categories L*/N*; the
    mid-join lookahead mirrors TOKEN_EXTRACT_REGEX exactly."""
    out: list[str] = []
    cur: list[str] = []

    def flush() -> None:
        if cur:
            tok = "".join(cur)
            if not (remove_stopwords and tok in ENGLISH_STOPWORDS):
                out.append(tok)
            cur.clear()

    def cat(ch: str) -> str:
        return unicodedata.category(ch)[0]

    s = text.lower().replace("ς", "σ")
    for i, ch in enumerate(s):
        if _is_cjk(ch):
            flush()
            if not (remove_stopwords and ch in ENGLISH_STOPWORDS):
                out.append(ch)
        elif cat(ch) in ("L", "N"):
            cur.append(ch)
        elif cur and i + 1 < len(s) and not _is_cjk(s[i + 1]) and (
            (ch in LETTER_MIDS and cat(s[i + 1]) == "L")
            or (ch in DIGIT_MIDS and cat(s[i + 1]) == "N")
        ):
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
    pattern = TOKEN_EXTRACT_REGEX.replace("'", "''")
    base = f"regexp_extract_all({prepped}, '{pattern}')"
    if remove_stopwords:
        stop = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)
        base = f"list_filter({base}, t -> NOT list_contains([{stop}], t))"
    return base
