"""Dataset profiling operators: per-column summary statistics and
equi-width histograms — the ANALYZE/inspection surface a pipeline runs
before committing 100 TB to a training mix.

Scale shape: ``profile`` is ONE full-scan aggregate job (every column's
statistics as expressions of a single ``agg``, partial-aggregated
map-side) followed by a driver-side pivot of exactly one row into
#columns rows — the collect is O(columns), never O(rows). ``histogram``
is one scan + one groupBy on the bucket index (cardinality = #bins).
Exact distinct counts are a deliberate choice over HyperLogLog: they are
oracle-checkable and the shuffle they add is one hash-partial per column
— switch to ``approx_count_distinct`` per column via ``approx=True``
when profiling petabyte tables where ±2% is acceptable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

PROFILE_SCHEMA = (
    "column string, dtype string, n_rows bigint, n_null bigint, "
    "n_distinct bigint, min_str string, max_str string, "
    "mean double, stddev double"
)


def profile(df, columns: list[str] | None = None, *, approx: bool = False):
    """One row of summary statistics per column: null count, distinct
    count, min/max (string-rendered for cross-type uniformity), and
    mean/stddev for numeric columns (NULL otherwise).

    Complex-typed columns (arrays, structs, maps, binary) report only
    row/null counts — their orderings are engine-specific, so min/max
    and distinct stay NULL rather than pretend portability.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    aggs = [F.count(F.lit(1)).alias("__n")]
    simple: dict[str, bool] = {}
    for c in cols:
        dt = fields[c]
        is_simple = isinstance(
            dt, (T.StringType, T.BooleanType, T.DateType, T.TimestampType)
        ) or isinstance(dt, _NUMERIC_TYPES)
        simple[c] = is_simple
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        if is_simple:
            nd = (
                F.approx_count_distinct(c) if approx else F.countDistinct(c)
            )
            aggs.append(nd.alias(f"{c}__nd"))
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
        if isinstance(dt, _NUMERIC_TYPES):
            aggs.append(F.avg(c).alias(f"{c}__mean"))
            aggs.append(F.stddev(c).alias(f"{c}__std"))
    # Fully lazy (r14): the one-row agg is unpivoted to one row per column
    # INSIDE the plan (struct array + explode) instead of collect()ing and
    # rebuilding a local frame — one action instead of two per evaluation,
    # and no driver round-trip of the stats row (guide §5: the driver does
    # no data work; §1.5: fewer jobs per query). Values are identical: the
    # same aggregate columns feed the same output slots.
    row_agg = df.agg(*aggs)
    null_s = F.lit(None).cast("string")
    structs = []
    for c in cols:
        dt = fields[c]
        numeric = isinstance(dt, _NUMERIC_TYPES)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt.simpleString()).alias("dtype"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.coalesce(F.col(f"{c}__nulls"), F.lit(0)).cast("bigint").alias("n_null"),
                (F.col(f"{c}__nd").cast("bigint") if simple[c]
                 else F.lit(None).cast("bigint")).alias("n_distinct"),
                (F.col(f"{c}__min") if simple[c] else null_s).alias("min_str"),
                (F.col(f"{c}__max") if simple[c] else null_s).alias("max_str"),
                (F.col(f"{c}__mean").cast("double") if numeric
                 else F.lit(None).cast("double")).alias("mean"),
                (F.col(f"{c}__std").cast("double") if numeric
                 else F.lit(None).cast("double")).alias("stddev"),
            )
        )
    return row_agg.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def histogram(df, col: str, bins: int = 10, *,
              lo: float | None = None, hi: float | None = None):
    """Equi-width histogram over a numeric column: ``bins`` buckets on
    [lo, hi] (min/max by default, computed in the same job), returning
    (bucket, lo, hi, n) with empty buckets present at n=0.

    Bucket index = floor((x - lo) / width), top edge clamped into the
    last bucket — exact double arithmetic, so the same buckets fall out
    of any engine. One scan + one groupBy on the bucket index; the
    bucket spine is a broadcast-joined ``spark.range(bins)``.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    x = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.agg(
            F.min(x).alias("lo"), F.max(x).alias("hi")
        ).collect()[0]
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"histogram({col}): no non-null values to derive a range "
                "from; pass lo/hi explicitly"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not (hi > lo):
        hi = lo + 1.0  # degenerate range: single bucket spans [lo, lo+1)
    width = (hi - lo) / bins
    bucket = F.least(
        F.floor((x - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(bins - 1),
    )
    counts = (
        df.where(x.isNotNull() & (x >= lo) & (x <= hi))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("bucket"))
    return (
        spine.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


def quantiles(df, col: str, probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)):
    """Exact continuous-interpolation quantiles of a numeric column, one
    row per probability: (prob, value). Uses Spark's exact ``percentile``
    aggregate (rank = p·(n-1), linear interpolation — the quantile_cont
    definition), so results are engine-portable; swap in
    ``approx_percentile`` yourself at sizes where an exact global sort
    of the column is unaffordable."""
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"prob {p} outside [0, 1]")
    arr = ", ".join(repr(float(p)) for p in probs)
    if "`" in col:
        raise ValueError(f"invalid column name {col!r}")
    agg = df.agg(
        F.expr(f"percentile(`{col}`, array({arr}))").alias("q")
    )
    return agg.select(
        F.posexplode("q").alias("pos", "value")
    ).select(
        F.element_at(
            F.array(*[F.lit(float(p)) for p in probs]), F.col("pos") + 1
        ).alias("prob"),
        "value",
    )


def sample_per_group(df, key_col: str, k: int, id_col: str, *,
                     salt: str = ""):
    """Deterministic stratified sample: exactly min(k, group size) rows
    per key, chosen by md5-hash order of (id, salt) — reproducible on
    any cluster layout and re-runnable with a different ``salt`` for a
    fresh draw. One shuffle on the key; the per-group sort is bounded
    by the group's own rows (eval-set construction, per-domain caps à
    la RefinedWeb's per-host limits)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col).cast("string"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
