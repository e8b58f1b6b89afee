"""Temporal analytics operators: event sessionization and as-of
(point-in-time) joins — the event-stream half of a training-data
pipeline (user behavior corpora, feature backfills against slowly
changing dimensions).

Scale shape: both operators are ONE shuffle on the entity key and
nothing else. Sessionization is gaps-and-islands over a per-key window
(per-key data is small relative to the corpus; a pathological hot key
skews one reducer, which AQE splits). The as-of join avoids the naive
range-join blowup entirely: it is a union + per-key ordered window with
``last(ignorenulls)``, so each key's timeline is swept once — O(n log n)
in the key's own rows, never O(left × right).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

MICROS = 1_000_000


def _micros(c):
    # exact microsecond epoch; the cast lifts TIMESTAMP_NTZ (parquet
    # isAdjustedToUTC=false) into TIMESTAMP under the UTC-pinned session,
    # which is value-preserving
    return F.unix_micros(c.cast("timestamp"))


def sessionize(df, user_col: str, ts_col: str, *, gap_seconds: float = 1800.0,
               order_cols: list[str] | None = None):
    """Assign gaps-and-islands session indexes per entity: a new session
    starts when the gap to the previous event exceeds ``gap_seconds``.
    Adds ``session_idx`` (0-based per entity) and ``session_id``
    (``<user>#<idx>``). Comparison is on exact microseconds —
    truncating to whole seconds flips boundaries on sub-second data.

    ``order_cols`` breaks timestamp ties deterministically (e.g. an
    event id); ties never create a boundary either way (gap 0), but the
    tiebreaker pins row order for downstream windowed reads.
    """
    taken = {"session_idx", "session_id"} & set(df.columns)
    if taken:
        raise ValueError(f"sessionize output columns {sorted(taken)} already exist")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = _micros(F.col(ts_col))
    gap_us = int(round(gap_seconds * MICROS))
    brk = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    idx = (
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    ).cast("long")
    return df.withColumn("session_idx", idx).withColumn(
        "session_id",
        F.concat(F.col(user_col).cast("string"), F.lit("#"),
                 F.col("session_idx").cast("string")),
    )


def session_stats(df, user_col: str, ts_col: str, *,
                  gap_seconds: float = 1800.0,
                  order_cols: list[str] | None = None):
    """Session-level rollup on top of :func:`sessionize`: start/end,
    event count, duration in seconds. One additional groupBy on
    (entity, session) — same key family as the sessionize shuffle, so
    Catalyst reuses the partitioning."""
    s = sessionize(df, user_col, ts_col, gap_seconds=gap_seconds,
                   order_cols=order_cols)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        ((_micros(F.max(ts_col)) - _micros(F.min(ts_col)))
         / float(MICROS)).alias("duration_sec"),
    )


def asof_join(left, right, ts_col: str, by: list[str] | str, *,
              value_cols: list[str] | None = None,
              tolerance_seconds: float | None = None,
              direction: str = "backward",
              suffix: str = "_asof"):
    """As-of (point-in-time) join: attach to each left row the right row
    nearest in time within the same ``by`` key(s) — ``direction``
    selects the pandas ``merge_asof`` family: ``backward`` (default,
    most recent right.ts <= left.ts), ``forward`` (earliest right.ts >=
    left.ts), or ``nearest`` (closer of the two; exact tie -> backward).
    NULLs when no candidate exists or the match violates
    ``tolerance_seconds``. Right columns arrive as ``<col><suffix>``
    plus ``<ts_col><suffix>`` (the matched timestamp).

    Semantics are DuckDB/pandas ``merge_asof`` backward-inclusive: a
    right row at exactly left's timestamp matches. Right rows are packed
    into one struct before the window sweep, so a NULL in a right value
    column never falls through to an older row.

    Implementation: union both sides, one per-key window ordered by
    (ts, side) with right-before-left at ties, ``last(struct,
    ignorenulls=True)`` — one shuffle on the key, no range join, no
    broadcast of the full right side.
    """
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by + [ts_col]]
    reserved = {"__side", "__rv", "__m"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    out_names = {f"{ts_col}{suffix}"} | {f"{c}{suffix}" for c in value_cols}
    shadowed = out_names & set(left.columns)
    if shadowed:
        raise ValueError(
            f"asof_join output columns {sorted(shadowed)} already exist on "
            "the left side; pass a different suffix"
        )
    packed = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    # a right row with NULL ts has no position on the timeline: DuckDB /
    # pandas ASOF semantics exclude it, and here it would sort ahead of
    # every real row and "match" early left rows — drop it at the source
    r = right.where(F.col(ts_col).isNotNull()).select(
        *by, F.col(ts_col), F.lit(0).alias("__side"), packed.alias("__rv")
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__rv", F.lit(None).cast(r.schema["__rv"].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    def sweep(asc: bool):
        # both sweeps share the partitioning, so a second direction adds
        # a per-partition re-sort but NO second shuffle
        order = [
            F.col(ts_col).asc() if asc else F.col(ts_col).desc(),
            F.col("__side").asc(),  # right before left at equal ts
        ]
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("__rv", ignorenulls=True).over(w)

    tol_us = (
        None if tolerance_seconds is None
        else int(round(tolerance_seconds * MICROS))
    )

    def within_tol(m, backward_leg: bool):
        if tol_us is None:
            return m
        delta = _micros(F.col(ts_col)) - _micros(m["__ts"])
        if not backward_leg:
            delta = -delta
        return F.when(delta <= tol_us, m)

    if direction == "backward":
        out = u.withColumn("__m", sweep(asc=True))
        out = out.withColumn("__m", within_tol(F.col("__m"), True))
    elif direction == "forward":
        out = u.withColumn("__m", sweep(asc=False))
        out = out.withColumn("__m", within_tol(F.col("__m"), False))
    elif direction == "nearest":
        out = (
            u.withColumn("__mb", sweep(asc=True))
            .withColumn("__mf", sweep(asc=False))
        )
        mb = within_tol(F.col("__mb"), True)
        mf = within_tol(F.col("__mf"), False)
        db = _micros(F.col(ts_col)) - _micros(mb["__ts"])
        df_ = _micros(mf["__ts"]) - _micros(F.col(ts_col))
        # pandas merge_asof nearest: tie -> backward
        pick = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(db <= df_, mb)
            .otherwise(mf)
        )
        out = out.withColumn("__m", pick).drop("__mb", "__mf")
    else:
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    out = out.where(F.col("__side") == 1)
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__m")["__ts"].alias(f"{ts_col}{suffix}"))
    sel.extend(F.col("__m")[c].alias(f"{c}{suffix}") for c in value_cols)
    return out.select(*sel)


def rolling_agg(df, ts_col: str, value_col: str, by, *,
                window_seconds: float, include_current: bool = True):
    """Trailing time-window aggregates per entity: for each row, count/
    sum/avg/min/max of ``value_col`` over [ts - window, ts] within the
    same key — the moving-average / rate-limiter shape over event
    streams. RANGE frame on exact microseconds, so rows with equal
    timestamps aggregate together regardless of tie order.

    One shuffle on the key; the frame scan is Spark's native windowed
    aggregation (no self-join — the naive `events x events` range join
    this replaces is O(n²) per key).
    """
    by = [by] if isinstance(by, str) else list(by)
    win_us = int(round(window_seconds * MICROS))
    if win_us < 0:
        raise ValueError(f"window_seconds must be >= 0, got {window_seconds}")
    taken = {"roll_n", "roll_sum", "roll_avg", "roll_min", "roll_max"} & set(df.columns)
    if taken:
        raise ValueError(f"rolling_agg output columns {sorted(taken)} already exist")
    w = (
        Window.partitionBy(*by)
        .orderBy(_micros(F.col(ts_col)))
        .rangeBetween(-win_us, 0 if include_current else -1)
    )
    v = F.col(value_col)
    return (
        df.withColumn("roll_n", F.count(v).over(w))
        .withColumn("roll_sum", F.sum(v).over(w))
        .withColumn("roll_avg", F.avg(v).over(w))
        .withColumn("roll_min", F.min(v).over(w))
        .withColumn("roll_max", F.max(v).over(w))
    )
