"""Standard text analyser.

The reference allows exactly one analyser, bleve's "standard"
(models/index.go:315-324; pluggable interface shard/index/text/text.go:62-66):
unicode word tokenizer → lowercase → English stopword removal.

We pin an equivalent, engine-portable spec so the DuckDB oracle can reproduce
it token-for-token:
- lowercase the input;
- tokens are maximal runs of ``[a-z0-9]`` (ASCII word tokenizer — the
  driver-generated corpora are ASCII; documented limitation vs full unicode);
- drop empty tokens and the classic Lucene English stopword set (the set
  bleve's ``stop_en`` filter uses).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Classic Lucene / bleve English stop set (33 words).
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
)

TOKEN_SPLIT_REGEX = "[^a-z0-9]+"


def tokenize(c: Column | str, remove_stopwords: bool = True) -> Column:
    """STRING column -> ARRAY<STRING> of analysed tokens (keeps duplicates —
    term frequency matters for TF-IDF)."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(c), TOKEN_SPLIT_REGEX)
    toks = F.filter(toks, lambda t: t != "")
    if remove_stopwords:
        stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return toks


def analyze_query(text: str) -> list[str]:
    """Driver-side analysis of a query string → unique terms (the reference
    dedupes query terms into a set, text.go:314-318). Order = first occurrence
    so scoring is deterministic."""
    import re

    toks = [t for t in re.split(TOKEN_SPLIT_REGEX, text.lower()) if t]
    seen: dict[str, None] = {}
    for t in toks:
        if t not in ENGLISH_STOPWORDS:
            seen.setdefault(t, None)
    return list(seen)


def duckdb_tokenize_sql(col_sql: str, remove_stopwords: bool = True) -> str:
    """DuckDB SQL expression producing the identical token list — used to
    build oracle queries that must match Spark token-for-token."""
    base = f"list_filter(string_split_regex(lower({col_sql}), '{TOKEN_SPLIT_REGEX}'), t -> t <> '')"
    if remove_stopwords:
        stop = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)
        base = f"list_filter({base}, t -> NOT list_contains([{stop}], t))"
    return base
