"""Training-batch sequence packing and deterministic mixture sampling.

Two pre-training data-prep operators that sit downstream of dedup/quality
filtering in an LLM pipeline:

- :func:`pack_sequences` — GPT-style "concatenate then chunk": documents are
  laid end-to-end in a deterministic global order and the resulting token
  stream is cut into fixed-length training sequences. The output maps each
  document to the sequence window(s) it lands in.

- :func:`mixture_sample` — downsample each source to hit target mixture
  weights (e.g. 30% web / 30% code / 40% books) with a deterministic
  hash-threshold keep rule, so the same corpus always yields the same
  sample on any cluster layout.

Both are pure DataFrame compositions (no Python in the row path) and both
have exact ANSI-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semadb_spark.functions.analyzer import tokenize


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str = "_id",
    max_tokens: int = 2048,
    order_col: str | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-length training sequences.

    Documents are concatenated in ascending ``order_col`` (default: the id
    column, which must be unique for a deterministic stream) and the token
    stream is chunked every ``max_tokens``. Returns one row per
    (document, sequence) overlap:

    - ``seq_id``        — training sequence index (0-based)
    - ``doc_tok_start`` — first token of this doc inside this sequence
      (offset within the document)
    - ``seq_offset``    — position of that token within the sequence
    - ``n_toks``        — tokens this document contributes to this sequence

    Scale shape: a global prefix sum is required, but a single global
    window would serialize the corpus through one task. Instead:

    1. bucket by contiguous ``order_col`` ranges — for integer order keys
       the bucket is pure arithmetic over the key's (min, max) (one
       column-pruned agg job that never evaluates the tokenizer); other
       key types fall back to sampled range repartitioning (whose sampling
       pass re-evaluates the token-count subtree — the integer path saves
       a whole tokenize pass over the corpus);
    2. per-partition running sums via a window PARTITIONED by bucket
       (parallel across buckets);
    3. per-bucket totals (one row per bucket) are cumulated and broadcast
       back as base offsets.

    The bucket count scales with the corpus — ``max(shuffle partitions,
    ceil(rows / 65536))`` — so per-bucket window size is CONSTANT as the
    corpus grows (a fixed bucket count made the per-bucket sort+window
    grow linearly with the corpus: measured superlinear at 10M, BENCH_r06
    pack_linearity 1.71). At 100 TB (~100B docs) that is ~1.5M buckets:
    the totals frame cumulated on the driver-side window stays ~1.5M tiny
    rows and the broadcast offsets a few tens of MB — both bounded.

    Docs spanning a chunk boundary emit one row per spanned sequence via
    ``sequence()`` + ``explode`` (a doc spans at most
    ``n/max_tokens + 1`` sequences, so output is linear in corpus tokens).

    Integer-key bucket balance assumes roughly-uniform key density (true
    for dense row ids); heavily skewed sparse keys still compute correctly
    (any non-decreasing ord→bucket map is correct) but may unbalance
    buckets — pass a dense ``order_col`` for those corpora.
    """
    order_col = order_col or id_col
    # n_tokens_col: budget in PRE-COMPUTED token counts (e.g.
    # ``n_bpe_tokens`` from bpe_encode — pack in real model tokens);
    # default is the whitespace tokenizer. Either way the count is one
    # long per doc before the prefix-sum machinery.
    if n_tokens_col is not None:
        n_tok = F.col(n_tokens_col).cast("long")
        base = df.filter(F.col(n_tokens_col).isNotNull())
    else:
        n_tok = F.size(tokenize(text_col, remove_stopwords=False))
        base = df.filter(F.col(text_col).isNotNull())
    counts = (
        base
        .select(
            F.col(id_col).alias("_pid"),
            F.col(order_col).alias("_ord"),
            n_tok.alias("n"),
        )
        .filter(F.col("n") > 0)
    )

    from pyspark.sql.window import Window

    min_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    rows_per_bucket = 65_536
    int_ord = dict(counts.dtypes)["_ord"] in ("tinyint", "smallint", "int", "bigint")
    if int_ord:
        # bounds over the same ``base`` frame the counts use (the
        # n_tokens_col path must not re-filter on text_col: rows with null
        # text but non-null counts would fall outside [lo,hi] and an
        # all-null-text corpus would early-return empty, ADVICE r12). A
        # slightly-wide key span is still a valid (non-decreasing) bucket
        # map, and this agg prunes to the order column alone — no
        # tokenizer evaluation (n_tok is only referenced by ``counts``).
        # The count rides the same single agg job (it sizes the grid).
        bounds = (
            base
            .agg(
                F.min(F.col(order_col)).alias("lo"),
                F.max(F.col(order_col)).alias("hi"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .first()
        )
        if bounds["lo"] is None:
            return counts.select(
                F.col("_pid").alias(id_col),
                F.lit(0).cast("long").alias("seq_id"),
                F.lit(0).cast("long").alias("doc_tok_start"),
                F.lit(0).cast("long").alias("seq_offset"),
                F.lit(0).cast("long").alias("n_toks"),
            ).limit(0)
        lo, span = int(bounds["lo"]), int(bounds["hi"]) - int(bounds["lo"]) + 1
        nparts = max(min_parts, -(-int(bounds["cnt"]) // rows_per_bucket))
        if span > 2**63 - 1:
            # the subtraction (ord - lo) itself would overflow int64; such a
            # full-range key span only arises for adversarial sparse keys —
            # fall back to sampled range repartitioning
            int_ord = False
    if int_ord:
        # divide-before-multiply: (ord - lo) * nparts overflows int64 when the
        # key span times the partition count exceeds 2^63 (sparse 64-bit keys
        # such as snowflake/hash ids). Computing the per-bucket width on the
        # driver keeps the row-side arithmetic within the key's own range and
        # preserves the non-decreasing ord→bucket map.
        per_bucket = -(-span // nparts)  # ceil(span / nparts), ≥ 1
        bucket = F.least(
            F.floor((F.col("_ord") - F.lit(lo)).cast("long") / F.lit(per_bucket)),
            F.lit(nparts - 1),
        ).cast("int")
        parts = counts.withColumn("_part", bucket).repartition(nparts, "_part")
    else:
        nparts = max(min_parts, -(-base.count() // rows_per_bucket))
        parts = counts.repartitionByRange(nparts, F.col("_ord")).withColumn(
            "_part", F.spark_partition_id()
        )
    w = Window.partitionBy("_part").orderBy("_ord")
    local = parts.withColumn("_local_end", F.sum("n").over(w))

    # one row per partition; cumulating this tiny frame through a window is
    # fine — it never exceeds the partition count. Aggregate from ``parts``,
    # not from ``local``: max(running sum) == sum(n) per partition, but the
    # ``local`` form re-evaluates the whole window subtree a second time for
    # this branch (the bucket exchange is reused, the sort+window is not) —
    # the partial agg shares the exchange and skips that recompute
    # (guide §2.4: two operations keyed the same way share one exchange).
    totals = parts.groupBy("_part").agg(F.sum("n").alias("_tot"))
    w_tot = Window.orderBy("_part").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_tot), F.lit(0))
    ).select("_part", "_base")

    placed = local.join(F.broadcast(offsets), "_part").select(
        "_pid",
        "n",
        (F.col("_base") + F.col("_local_end") - F.col("n")).alias("_start"),
    )

    L = F.lit(max_tokens).cast("long")
    first_seq = F.floor(F.col("_start") / L)
    last_seq = F.floor((F.col("_start") + F.col("n") - 1) / L)
    spans = placed.select(
        "_pid",
        "n",
        "_start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_begin = F.col("seq_id") * L
    cut_start = F.greatest(F.col("_start"), seq_begin)
    cut_end = F.least(F.col("_start") + F.col("n"), seq_begin + L)
    return spans.select(
        F.col("_pid").alias(id_col),
        "seq_id",
        (cut_start - F.col("_start")).alias("doc_tok_start"),
        (cut_start - seq_begin).alias("seq_offset"),
        (cut_end - cut_start).alias("n_toks"),
    )


def _hash_unit(c: Column) -> Column:
    """Deterministic engine-portable uniform draw: the first 8 hex chars of
    md5(key), compared lexicographically (lowercase hex sorts numerically)."""
    return F.substring(F.md5(c.cast("string")), 1, 8)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str = "_id",
) -> DataFrame:
    """Deterministically downsample sources to target mixture ``weights``.

    Finds the largest total sample T such that every source can supply its
    share (T = min over sources of count_i / weight_i), then keeps each row
    iff the md5 of its key falls under the source's keep-rate threshold —
    the classic reproducible hash-mod sample: membership depends only on
    the key, never on partitioning or row order. Sources missing from
    ``weights`` are dropped.

    Everything is DataFrame-native: the per-source count aggregate is a
    handful of rows, joined back by broadcast; no collect, no RNG.
    """
    total = sum(weights.values())
    w_rows = [(s, w / total) for s, w in weights.items()]
    spark = df.sparkSession
    # Arrow-path local frame: see semadb_spark.session.local_df.
    from semadb_spark.session import local_df

    wdf = local_df(spark, w_rows, f"{source_col} string, _w double")

    counts = (
        df.join(F.broadcast(wdf), source_col)
        .groupBy(source_col, "_w")
        .agg(F.count("*").alias("_c"))
    )
    # T = min(c_i / w_i); keep_i = T * w_i / c_i in (0, 1]
    t_df = counts.agg(F.min(F.col("_c") / F.col("_w")).alias("_T"))
    rates = counts.crossJoin(F.broadcast(t_df)).select(
        source_col,
        F.least(F.col("_T") * F.col("_w") / F.col("_c"), F.lit(1.0)).alias(
            "_keep"
        ),
    )
    # threshold in the md5's first-8-hex space: keep iff hex8 < floor(keep * 16^8).
    # keep == 1.0 (the binding source) needs a sentinel above every hex char:
    # its 9-digit threshold would otherwise be *truncated* by lpad
    thresh = F.when(F.col("_keep") >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("_keep") * F.lit(float(16**8))))), 8, "0"
        )
    )
    return (
        df.join(F.broadcast(rates.withColumn("_thresh", thresh)), source_col)
        .filter(_hash_unit(F.col(key_col)) < F.col("_thresh"))
        .drop("_keep", "_thresh")
    )
