"""curate_corpus end-to-end: each stage drops exactly the docs its rule
names, survivors carry cleaned text, stats ledger every stage."""

from pyspark.sql import functions as F

from semadb_spark.pipeline import curate_corpus

GOOD = ("The quick brown fox jumps over the lazy dog and keeps running "
        "through the field with steady energy. ") * 4  # >40 words, clean


def _corpus(spark):
    moji = "é".encode("utf-8").decode("latin-1")
    rows = [
        ("a", GOOD + "\nBuy now.\nAnd that is the whole story of the day."),
        ("b", GOOD),                        # duplicate body of c after cleaning
        ("c", GOOD),
        ("d", "caf" + moji + " damaged " + GOOD),       # mojibake -> encoding drop
        ("e", "no terminal punctuation at all"),        # line_clean drops all lines
        ("f", "Tiny words only here."),                 # survives lines, fails gopher
        ("g", None),
    ]
    return spark.createDataFrame(rows, "_id string, text string")


def test_curate_corpus_stages(spark):
    cur, stats = curate_corpus(_corpus(spark), gopher_min_words=40)
    ids = sorted(r["_id"] for r in cur.select("_id").collect())
    assert stats["input"] == 6            # null text pre-dropped
    assert stats["encoding"] == 5         # d gone
    assert stats["line_clean"] == 4       # e gone (zero surviving lines)
    assert stats["gopher"] == 3           # f gone
    assert stats["exact_dedup"] == 2      # b/c collapse -> keep "b"; a survives
    assert ids == ["a", "b"]
    # line cleaning rewrote a's text: the blocklist-free short line stays,
    # "Buy now." (2 words < 3) is gone
    a_text = cur.filter(F.col("_id") == "a").collect()[0]["text"]
    assert "Buy now." not in a_text and "whole story" in a_text


def test_curate_corpus_drop_ids_hook(spark):
    drops = spark.createDataFrame([("a",)], "id string")
    cur, stats = curate_corpus(_corpus(spark), drop_ids=drops)
    assert sorted(r["_id"] for r in cur.collect()) == ["b"]
    assert stats["drop_ids"] == 1


def test_curate_corpus_no_stats_mode(spark):
    cur, stats = curate_corpus(_corpus(spark), collect_stats=False)
    assert stats == {} and cur.count() == 2


def test_curation_stages_fuse_into_one_scan(spark):
    """The per-document stages (encoding, line-clean, gopher) must stay
    shuffle-free: the recipe's only exchanges belong to the dedup
    groupBy + semi-join. At 100 TB every extra exchange is a full-corpus
    network pass."""
    cur, _ = curate_corpus(_corpus(spark), collect_stats=False)
    plan = cur._jdf.queryExecution().executedPlan().toString()
    # dedup: one aggregate exchange (+AQE may show one for the semi join)
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "CartesianProduct" not in plan


def test_curation_without_dedup_stage_has_no_shuffle(spark):
    from semadb_spark.operators.textstats import (
        encoding_signals, gopher_quality_flags, line_filter,
    )
    from pyspark.sql import functions as F

    df = _corpus(spark)
    enc = encoding_signals("text")
    lf = line_filter("text")
    g = gopher_quality_flags("text")
    pure = (
        df.filter(~enc["encoding_suspect"])
        .withColumn("text", lf["cleaned"])
        .filter(g["keep"])
    )
    plan = pure._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure Column pipeline, zero shuffles


def test_curate_corpus_dsir_select_stage(spark):
    import pytest

    # survivors of the cleaning stages are a and b (see stages test);
    # target the fox-story distribution and ask for the single best doc
    target = spark.createDataFrame([("t0", GOOD)], "_id string, text string")
    cur, stats = curate_corpus(
        _corpus(spark), select_target=target, select_k=1,
        dsir_buckets=128,
    )
    assert stats["dsir_select"] == 1
    row = cur.collect()[0]
    assert row["_id"] in ("a", "b") and row["text"]  # full row, cleaned text
    # deterministic redraw: same seed -> same pick
    cur2, _ = curate_corpus(
        _corpus(spark), select_target=target, select_k=1,
        dsir_buckets=128,
    )
    assert cur2.collect()[0]["_id"] == row["_id"]
    with pytest.raises(ValueError, match="together"):
        curate_corpus(_corpus(spark), select_k=5)
