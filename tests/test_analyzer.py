"""Token-parity tests for the standard analyser.

The three implementations (Spark Column, DuckDB SQL, driver-side Python)
must agree token-for-token — oracle gates hash token-derived values, so a
single divergent token is a driver failure. Golden tokens pin bleve
standard-analyser semantics (reference models/index.go:315-324): unicode
word segmentation, per-character CJK, lowercase, English stopwords out.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from semadb_spark.functions.analyzer import (
    analyze_query,
    duckdb_tokenize_sql,
    tokenize,
    tokenize_py,
)

# (input, golden tokens with stopwords removed)
GOLDEN = [
    ("The quick brown-fox, 42 jumps!", ["quick", "brown", "fox", "42", "jumps"]),
    (
        "Café crème naïve Ürün DONNÉES",
        ["café", "crème", "naïve", "ürün", "données"],
    ),
    ("数据查询系统 spark", ["数", "据", "查", "询", "系", "统", "spark"]),
    ("ひらがな カタカナ", ["ひ", "ら", "が", "な", "カ", "タ", "カ", "ナ"]),
    ("한국어 분석", ["한", "국", "어", "분", "석"]),
    ("mixed 中文and english漢字run", ["mixed", "中", "文", "english", "漢", "字", "run"]),
    ("", []),
    ("   ...   ", []),
    # Greek final sigma: Java/Python lowercase Σ→ς contextually, utf8proc
    # does not; the analyser folds both to σ (unicode full case folding).
    ("ΚΌΣΜΟΣ Русский ТЕКСТ", ["κόσμοσ", "русский", "текст"]),
    ("Straße ß", ["straße", "ß"]),
    # UAX#29 WB6/WB7 + WB11/WB12 mid-token joins (bleve standard keeps
    # contractions and decimals whole; models/index.go:315-324).
    ("don't 3.14 foo_bar", ["don't", "3.14", "foo", "bar"]),
    ("o'clock isn’t e.g. 1,000 127.0.0.1", ["o'clock", "isn’t", "e.g", "1,000", "127.0.0.1"]),
    # ':' is MidLetter (letters only): joins a:b, breaks 3:14.
    ("a:b 3:14", ["a:b", "3", "14"]),
    # mids at token edges never join (need a token char on the left and the
    # right class immediately after).
    ("rock 'n' roll don't.", ["rock", "n", "roll", "don't"]),
    # ',' is MidNum (digits only): a,b splits.
    ("a,b 1,2", ["b", "1,2"]),  # "a" is a stopword
    ("the and of to", []),  # all stopwords
]


def test_python_tokenizer_golden():
    for text, want in GOLDEN:
        assert tokenize_py(text) == want, text


def test_spark_tokenizer_matches_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(GOLDEN)], "i int, text string"
    )
    got = {r.i: (r.t or []) for r in df.select("i", tokenize("text").alias("t")).collect()}
    for i, (text, want) in enumerate(GOLDEN):
        assert got[i] == want, text


def test_duckdb_tokenizer_matches_python():
    con = duckdb.connect()
    placeholders = ", ".join(f"({i}, ?)" for i in range(len(GOLDEN)))
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM (VALUES {placeholders}) v(i, text)",
        [t for t, _ in GOLDEN],
    )
    got = {
        i: (toks or [])
        for i, toks in con.execute(
            f"SELECT i, {duckdb_tokenize_sql('text')} FROM t"
        ).fetchall()
    }
    for i, (text, want) in enumerate(GOLDEN):
        assert got[i] == want, text


def test_tokenize_keeps_duplicates_stopwords_kept_variant():
    assert tokenize_py("data the data", remove_stopwords=False) == [
        "data", "the", "data",
    ]
    assert tokenize_py("data the data") == ["data", "data"]


def test_analyze_query_dedupes_preserving_first_occurrence():
    assert analyze_query("Query 数据 query 数据 DATA") == ["query", "数", "据", "data"]


def test_ascii_behavior_unchanged_vs_round2_spec():
    """On pure-ASCII text the unicode analyser must be bit-identical to the
    round-1/2 [a-z0-9]+ spec — every existing text oracle depends on it."""
    import re

    samples = [
        "window the sort small data stream hash column value line customer",
        "UPPER lower 123 mix3d  punct,.;!?  tail",
        "a an and are as at be but by for",
    ]
    for s in samples:
        legacy = [
            t
            for t in re.split("[^a-z0-9]+", s.lower())
            if t and t not in __import__("semadb_spark.functions.analyzer", fromlist=["ENGLISH_STOPWORDS"]).ENGLISH_STOPWORDS
        ]
        assert tokenize_py(s) == legacy, s
