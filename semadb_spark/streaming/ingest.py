"""Structured Streaming: incremental ingest + index maintenance.

The reference has **no stream processing** — its "real-time" is
transactional read-your-writes (README.md:32; SURVEY.md §2.8). What it does
do incrementally is *index maintenance on write*: every insert/update fans
out per-property changes to index updaters inside the write transaction
(shard/index/dispatch.go:33-110, text upserts text.go:151-258). These
operators are the Spark-native equivalent: a stream of point batches keeps
the derived tables (posting lists, doc stats, dedup state) current, with
Structured Streaming supplying the exactly-once bookkeeping (checkpoints)
the reference gets from bbolt transactions.

All sources/sinks are ordinary ``readStream``/``writeStream`` so the same
code runs against file drops, Kafka, or Delta at cluster scale; tests drive
them with ``Trigger.AvailableNow`` over parquet directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from semadb_spark.functions.analyzer import tokenize


def read_point_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source point stream: each dropped parquet file is a micro-batch
    of points (the streaming analogue of the reference's insert batches,
    1-10k points each, httpapi/v2/handlers.go:228-252)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def incremental_text_index(
    stream_df: DataFrame, text_col: str, id_col: str = "_id"
) -> DataFrame:
    """Streaming doc_terms maintenance: same (id, term, tf, doc_len) shape
    as operators/text_search.build_text_index, computed per micro-batch.

    Append-only: each batch contributes its own docs' postings (the
    reference's per-doc term-freq upsert, text.go:151-258). The groupBy is
    per-(id, term) *within* new docs only, so state never grows with corpus
    size — no watermark needed. Unlike the batch build, no ``df`` column is
    denormalized (a stream's corpus-wide document frequency keeps moving);
    text_search computes it from the matched postings when absent."""
    toks = (
        stream_df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), tokenize(text_col).alias("tokens"))
        .withColumn("doc_len", F.size("tokens"))
        .filter(F.col("doc_len") > 0)
    )
    return (
        toks.select("id", "doc_len", F.explode("tokens").alias("term"))
        .groupBy("id", "term", "doc_len")
        .agg(F.count("*").alias("tf"))
        .select("id", "term", "tf", "doc_len")
    )


def write_text_index_stream(
    doc_terms_stream: DataFrame, index_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Append the streaming doc_terms to the persisted index table.

    ``update`` output of a streaming agg can't append; but grouping keys
    include the doc id and docs arrive exactly once, so per-batch finalized
    groups ARE append-safe — expressed via foreachBatch."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(index_dir)

    return (
        doc_terms_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def streaming_exact_dedup(
    stream_df: DataFrame, content_cols: list[str], id_col: str = "_id"
) -> DataFrame:
    """Dedup-on-arrival: first-seen row per content hash survives across the
    whole stream (dropDuplicates keeps state per hash — bounded by distinct
    content, the same state a dedup table would hold)."""
    h = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]
        )
    )
    return stream_df.withColumn("content_hash", h).dropDuplicates(["content_hash"])


def streaming_event_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregation over an event stream: the canonical
    late-data-tolerant rollup (count + value sum per event_type per window).
    Late events beyond the watermark are dropped; within it, windows update
    in place.

    The event-time column is cast to TIMESTAMP first: watermarks are only
    legal on TIMESTAMP, and parquet sources frequently deliver
    TIMESTAMP_NTZ (or epoch numerics), which Spark rejects with
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_completion(
    df: DataFrame,
    checkpoint_dir: str,
    output_dir: str | None = None,
    output_mode: str = "append",
    memory_table: str | None = None,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Drive a streaming frame with Trigger.AvailableNow until it drains:
    processes everything currently in the source then stops — the batch-like
    test/backfill mode. Returns the finished query."""
    writer = df.writeStream.outputMode(output_mode).option(
        "checkpointLocation", checkpoint_dir
    )
    if memory_table is not None:
        q = writer.format("memory").queryName(memory_table).trigger(availableNow=True).start()
    else:
        q = writer.format("parquet").option("path", output_dir).trigger(
            availableNow=True
        ).start()
    q.awaitTermination(timeout_s)
    return q


def streaming_corpus_stats(
    stream_df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-group
    corpus statistics — document count, token total, running mean doc length
    — updated on every micro-batch. The streaming analogue of the text
    index's persisted counters (_numDocuments + doc stats,
    shard/index/text/text.go:16-20,260-285), kept as typed per-key state
    instead of a table rewrite.

    Output (update mode): one row per group per batch with cumulative
    values. State is O(distinct groups) — bounded however long the stream
    runs.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from semadb_spark.functions.analyzer import tokenize

    tokenized = stream_df.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("grp"), F.size(tokenize(text_col)).alias("n_tok")
    )

    def update(key, pdfs, state: GroupState):
        n_docs, n_tokens = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_docs += len(pdf)
            n_tokens += int(pdf["n_tok"].sum())
        state.update((n_docs, n_tokens))
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "n_docs": [n_docs],
                "total_tokens": [n_tokens],
                "mean_doc_len": [n_tokens / n_docs if n_docs else 0.0],
            }
        )

    return tokenized.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType="grp string, n_docs long, total_tokens long, mean_doc_len double",
        stateStructType="n_docs long, n_tokens long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_assign_centroids(
    stream_df: DataFrame, vec_col: str, centroids, id_col: str = "_id"
) -> DataFrame:
    """Streaming IVF index maintenance (W4 for the vector index): assign
    arriving vectors to FROZEN coarse centroids — the same per-point index
    upsert the reference's dispatch pipeline performs on insert
    (shard/index/dispatch.go:33-110), with the fit already done batch-side
    (functions/kmeans.py). Append the output to the index table partitioned
    by centroid_id and the serving probe prunes new data immediately; no
    state, no watermark — pure per-row enrichment, so the stream scales
    with arrival rate only."""
    from semadb_spark.functions.kmeans import assign_centroids

    return assign_centroids(
        stream_df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).cast("string").alias(id_col), F.col(vec_col).alias("v")
        ),
        "v",
        centroids,
    )
