"""Data selection via hashed n-gram importance resampling (DSIR).

Implements the DSIR recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", NeurIPS): represent every document as a
bag of hashed n-gram features, fit bucketed unigram/bigram distributions on
a small TARGET corpus (the distribution you want more of) and on the RAW
corpus being filtered, weight each raw document by its importance ratio
under the two distributions, then resample without replacement
proportionally to the weights (Gumbel top-k).

Spark-first shape, reusing the LM machinery from
:mod:`semadb_spark.operators.textstats`:

- :func:`dsir_fit` — ONE normalize-and-explode pass per corpus (all gram
  sizes come out of a single materialized token array, so the corpus is
  scanned once, not once per n), one ``groupBy(bucket)`` each, joined onto
  a dense bucket spine. Output is EXACTLY ``buckets`` rows — bounded by
  construction, broadcastable at any corpus size. Hashing collapses the
  unbounded gram space to a fixed table, which is the entire reason DSIR
  scales where a raw word-gram model does not (cf. the
  ``max_broadcast_rows`` guard ``ngram_lm_fit`` needs).
- :func:`dsir_score` — one explode + broadcast join + ``groupBy(id)``:
  ``logw = Σ_grams log p_target(bucket) − log p_raw(bucket)``, the log
  importance weight of the document (feature-count dot-product in the
  paper). Single shuffle on the doc id.
- :func:`dsir_sample` — deterministic Gumbel top-k: adding i.i.d. Gumbel
  noise to the log-weights and taking the arg-top-k is exactly sampling
  WITHOUT replacement proportionally to the weights (Vieira 2014). The
  uniform driving each Gumbel comes from the portable md5 hash of the doc
  id + seed, so the draw is reproducible across engines and sessions; the
  plan is one ``TakeOrderedAndProject`` — no global sort materialization.

All hashing is the engine-portable md5-prefix hash
(:mod:`semadb_spark.functions.hashing`), so the DuckDB correctness oracle
reproduces fit, score, and the sampled set bit-for-bit.

The reference has no data-selection surface (its corpus tooling stops at
point ingest, ``shard/points.go``); this fills the training-data-pipeline
gap the same way the dedup/cleaning families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semadb_spark.functions.hashing import md5_hash64
from semadb_spark.operators.textstats import (
    _char_grams_attr,
    _word_grams_attr,
)

__all__ = ["dsir_fit", "dsir_score", "dsir_sample"]


def _hashed_gram_rows(df, text_col: str, *, ns, buckets: int, seed,
                      unit: str, id_col: str | None = None):
    """(``__sid``?, bucket) rows: one row per gram occurrence of every size
    in ``ns``, hashed into ``buckets``. The normalized token array is
    materialized ONCE per document (``__norm``) and every gram size slices
    it — one corpus scan total (the no-CSE-in-lambda discipline of
    ``textstats._gram_rows``, extended to multi-size extraction)."""
    if unit == "word":
        norm = F.filter(
            F.split(F.lower(F.col(text_col)), "\\s+"), lambda w: w != ""
        )
        gram_arrays = [_word_grams_attr("__norm", k) for k in ns]
    elif unit == "char":
        norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
        gram_arrays = [_char_grams_attr("__norm", k) for k in ns]
    else:
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    grams = gram_arrays[0] if len(gram_arrays) == 1 else F.concat(*gram_arrays)
    extra = [F.col(id_col).alias("__sid")] if id_col is not None else []
    bucket = F.pmod(md5_hash64("gram", seed), F.lit(buckets)).alias("bucket")
    return (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("__norm", norm)
        .select(*extra, F.explode(grams).alias("gram"))
        .select(*(["__sid"] if id_col is not None else []), bucket)
    )


def _validate(n: int, buckets: int):
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")


def dsir_fit(target_df: DataFrame, raw_df: DataFrame, text_col: str, *,
             n: int = 2, buckets: int = 10_000, unit: str = "word",
             alpha: float = 1.0, seed=0) -> DataFrame:
    """Fit the hashed-n-gram importance-ratio table: one row per bucket in
    ``[0, buckets)`` with ``log_ratio = log p_target(b) − log p_raw(b)``
    under add-``alpha`` smoothing over the full bucket space (so buckets
    unseen in either corpus get a finite, well-defined ratio).

    Features are all gram sizes ``1..n`` (the paper's unigram+bigram bag is
    ``n=2``, the default). Scale shape: one scan + one ``groupBy(bucket)``
    per corpus (≤ ``buckets`` groups — map-side combine collapses the
    explode before the exchange), a dense ``spark.range`` spine join, and a
    1-row broadcast of the two corpus totals. Output is ``buckets`` rows —
    broadcast it at score time no matter how big the corpora were.
    """
    _validate(n, buckets)
    ns = list(range(1, n + 1))
    spark = target_df.sparkSession
    spine = spark.range(buckets).select(F.col("id").alias("bucket"))
    counts = []
    for name, frame in (("c_t", target_df), ("c_r", raw_df)):
        rows = _hashed_gram_rows(frame, text_col, ns=ns, buckets=buckets,
                                 seed=seed, unit=unit)
        counts.append(
            rows.groupBy("bucket").agg(F.count(F.lit(1)).alias(name))
        )
    tbl = (
        spine.join(counts[0], "bucket", "left")
        .join(counts[1], "bucket", "left")
        .fillna(0, subset=["c_t", "c_r"])
    )
    totals = tbl.agg(
        F.sum("c_t").alias("tot_t"), F.sum("c_r").alias("tot_r")
    )
    a = float(alpha)
    b = float(buckets)
    return (
        tbl.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("c_t") + a) / (F.col("tot_t") + a * b))
                - F.log((F.col("c_r") + a) / (F.col("tot_r") + a * b))
            ).alias("log_ratio"),
        )
    )


def dsir_score(df: DataFrame, text_col: str, table: DataFrame, *,
               id_col: str = "_id", n: int = 2, buckets: int = 10_000,
               unit: str = "word", seed=0) -> DataFrame:
    """Per-document log importance weight against a fitted table:
    ``(id, n_grams, logw, logw_per_gram)`` where ``logw`` is the sum of
    ``log_ratio`` over the document's hashed gram occurrences (the paper's
    importance weight) and ``logw_per_gram`` the length-normalized variant
    (long documents otherwise dominate on gram count alone).

    ``n``/``buckets``/``unit``/``seed`` must match the fit call. One
    explode + broadcast hash join (the table is ``buckets`` rows by
    construction — always broadcast) + one ``groupBy`` on the doc id.
    Documents with no grams (empty/NULL text) produce no row, same
    contract as ``ngram_lm_score``.
    """
    _validate(n, buckets)
    ns = list(range(1, n + 1))
    rows = _hashed_gram_rows(
        df, text_col, ns=ns, buckets=buckets, seed=seed, unit=unit,
        id_col=id_col,
    )
    return (
        rows.join(F.broadcast(table), "bucket")
        .groupBy("__sid")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_ratio").alias("logw"),
        )
        .select(
            F.col("__sid").alias(id_col),
            "n_grams",
            "logw",
            (F.col("logw") / F.col("n_grams")).alias("logw_per_gram"),
        )
    )


def dsir_sample(scored: DataFrame, k: int, *, weight_col: str = "logw",
                id_col: str = "_id", seed=0) -> DataFrame:
    """Sample ``k`` documents without replacement, proportionally to
    ``exp(weight_col)`` — the Gumbel top-k trick: ``key = w + G_i`` with
    ``G_i = −ln(−ln(u_i))`` i.i.d. Gumbel(0,1), arg-top-k of ``key`` is an
    exact weighted sample without replacement (Vieira 2014; the paper's
    resampling step). ``u_i`` derives from the portable md5 hash of the doc
    id and ``seed``, so the draw is deterministic and engine-reproducible
    — rerunning with a new seed redraws.

    Plan shape: per-row expressions + ``orderBy().limit(k)`` — Catalyst
    compiles it to ``TakeOrderedAndProject`` (per-partition top-k then a
    k-row merge on the driver side of the exchange), never a full sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # 60-bit hash -> uniform in (0, 1): (h + 0.5) / 2^60 never hits 0 or 1,
    # so both ln() calls below are finite.
    u = (md5_hash64(F.col(id_col).cast("string"), seed) + F.lit(0.5)) / F.lit(
        float(1 << 60)
    )
    gumbel = -F.log(-F.log(u))
    return (
        scored.withColumn("__key", F.col(weight_col) + gumbel)
        .orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .drop("__key")
    )
