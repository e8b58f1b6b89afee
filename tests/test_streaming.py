"""Structured Streaming tests: file-source micro-batches with AvailableNow,
incremental text-index parity with the batch builder, dedup-on-arrival,
watermarked rollup parity with the batch aggregation."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from semadb_spark.operators.text_search import build_text_index
from semadb_spark.streaming import ingest as si


@pytest.fixture
def docs_stream_dir(spark, sf_dir, tmp_path):
    """Split the documents table into 3 parquet drops (3 micro-batches)."""
    src = str(tmp_path / "drops")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "_id", F.col("doc_id").cast("string")
    )
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    return src, docs.schema


def test_incremental_text_index_matches_batch(spark, sf_dir, docs_stream_dir, tmp_path):
    src, schema = docs_stream_dir
    stream = si.read_point_stream(spark, src, schema, max_files_per_trigger=1)
    assert stream.isStreaming
    doc_terms = si.incremental_text_index(stream, "text", "_id")
    index_dir = str(tmp_path / "index")
    q = si.write_text_index_stream(doc_terms, index_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert q.lastProgress is not None

    got = spark.read.parquet(index_dir)
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "_id", F.col("doc_id").cast("string")
    )
    # df is an index-time denormalization only the batch build can freeze
    # (a stream's corpus-wide count keeps moving); the query path computes
    # it from matched postings when absent.
    want = build_text_index(batch_docs, "text", "_id").select("id", "term", "tf", "doc_len")
    # identical (id, term, tf, doc_len) sets
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_streaming_exact_dedup_first_seen_wins(spark, tmp_path):
    src = str(tmp_path / "dups")
    spark.createDataFrame(
        [("a", "hello"), ("b", "world")], "id string, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("c", "hello"), ("d", "fresh")], "id string, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = si.read_point_stream(
        spark, src, "id string, text string", max_files_per_trigger=1
    )
    deduped = si.streaming_exact_dedup(stream, ["text"], "id")
    q = si.run_stream_to_completion(
        deduped, str(tmp_path / "ck2"), memory_table="dedup_out"
    )
    rows = spark.sql("select * from dedup_out").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["fresh", "hello", "world"]  # duplicate 'hello' dropped


def test_streaming_event_rollup_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events")
    # events.ts layout varies by driver round: TIMESTAMP(NANOS) (read as
    # BIGINT nanos under nanosAsLong) or plain micros timestamp; normalize
    # to a micros-timestamp copy for the stream either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(events.dtypes)["ts"] == "bigint":
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    for i in range(2):
        events.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = si.read_point_stream(spark, src, events.schema, max_files_per_trigger=1)
    rolled = si.streaming_event_rollup(stream)
    q = si.run_stream_to_completion(
        rolled, str(tmp_path / "ck3"), memory_table="rollup_out", output_mode="append"
    )
    # round the float sum: streaming partial-agg order differs from batch by
    # last-ulp float associativity
    got = spark.sql(
        "select window_start, event_type, n_events, round(sum_value, 4) as sum_value"
        " from rollup_out"
    )
    want = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    # append mode only emits windows the final watermark (max_ts - 2h) has
    # passed: every emitted window must match the batch rollup exactly, and
    # anything withheld must lie inside the final watermark horizon.
    import datetime

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3)  # watermark 2h + window 1h
    missing = want.exceptAll(got)
    assert all(r.window_start >= horizon for r in missing.collect())
    assert got.exceptAll(want).count() == 0
    assert got.count() > 0


def test_streaming_corpus_stats_stateful(spark, tmp_path):
    """applyInPandasWithState keeps cumulative per-source counters across
    micro-batches (state survives batch boundaries; final row per group is
    the whole-corpus total)."""
    src = str(tmp_path / "stat_drops")
    spark.createDataFrame(
        [("a", "s1", "one two three"), ("b", "s1", "four five"), ("c", "s2", "alpha")],
        "id string, source string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("d", "s1", "six"), ("e", "s2", "beta gamma delta epsilon")],
        "id string, source string, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = si.read_point_stream(
        spark, src, "id string, source string, text string", max_files_per_trigger=1
    )
    stats = si.streaming_corpus_stats(stream, "text", "source")
    q = si.run_stream_to_completion(
        stats, str(tmp_path / "ckpt_stats"), memory_table="corpus_stats",
        output_mode="update",
    )
    assert q.lastProgress is not None
    rows = spark.sql(
        "SELECT grp, max(n_docs) AS n_docs, max(total_tokens) AS total_tokens "
        "FROM corpus_stats GROUP BY grp"
    ).collect()
    got = {r.grp: (r.n_docs, r.total_tokens) for r in rows}
    assert got == {"s1": (3, 6), "s2": (2, 5)}


def test_streaming_assign_centroids_matches_batch(spark, tmp_path):
    # streaming IVF maintenance assigns arriving vectors to the same frozen
    # centroids as the batch path — byte-identical assignments
    import numpy as np

    from semadb_spark.functions.kmeans import assign_centroids, kmeans_np

    rng = np.random.RandomState(6)
    X = rng.normal(size=(120, 8))
    cents = kmeans_np(X[:60], 4, seed=1)
    src = str(tmp_path / "vec_stream")
    rows = [(str(i), [float(x) for x in X[i]]) for i in range(120)]
    spark.createDataFrame(rows[:60], "_id string, v array<float>").coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows[60:], "_id string, v array<float>").coalesce(1).write.mode("append").parquet(src)

    stream = si.read_point_stream(spark, src, "_id string, v array<float>", max_files_per_trigger=1)
    assigned = si.streaming_assign_centroids(stream, "v", cents)
    out_dir = str(tmp_path / "ivf_rows")

    q = (
        assigned.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    batch = assign_centroids(
        spark.createDataFrame(rows, "_id string, v array<float>").select("_id", F.col("v")),
        "v",
        cents,
    ).select("_id", F.col("centroid_id"))
    g = {r["_id"]: r["centroid_id"] for r in got.collect()}
    b = {r["_id"]: r["centroid_id"] for r in batch.collect()}
    assert g == b and len(g) == 120
