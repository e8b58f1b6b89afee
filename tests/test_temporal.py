"""Sessionization and as-of join semantics: boundary inclusivity,
sub-second gaps, ties, tolerance, and null-safe right rows."""

import datetime as dt

from pyspark.sql import functions as F

from semadb_spark.operators.temporal import asof_join, session_stats, sessionize

T0 = dt.datetime(2025, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [(1, "u1", _t(0)), (2, "u1", _t(600)), (3, "u1", _t(1200.5)),
         (4, "u2", _t(0))],
        "event_id long, user string, ts timestamp",
    )
    s = {r["event_id"]: r for r in sessionize(
        ev, "user", "ts", gap_seconds=600, order_cols=["event_id"]).collect()}
    assert s[1]["session_idx"] == 0
    assert s[2]["session_idx"] == 0      # gap == 600 exactly: same session
    assert s[3]["session_idx"] == 1      # 600.5s: microsecond precision splits
    assert s[4]["session_idx"] == 0 and s[4]["session_id"] == "u2#0"


def test_sessionize_ties_never_split(spark):
    ev = spark.createDataFrame(
        [(1, "u", _t(0)), (2, "u", _t(0)), (3, "u", _t(0))],
        "event_id long, user string, ts timestamp",
    )
    out = sessionize(ev, "user", "ts", gap_seconds=1,
                     order_cols=["event_id"]).collect()
    assert all(r["session_idx"] == 0 for r in out)


def test_session_stats_rollup(spark):
    ev = spark.createDataFrame(
        [(1, "u", _t(0)), (2, "u", _t(100)), (3, "u", _t(5000)),
         (4, "u", _t(5003.25))],
        "event_id long, user string, ts timestamp",
    )
    rows = {r["session_idx"]: r for r in session_stats(
        ev, "user", "ts", gap_seconds=600).collect()}
    assert rows[0]["n_events"] == 2 and rows[0]["duration_sec"] == 100.0
    assert rows[1]["n_events"] == 2 and abs(rows[1]["duration_sec"] - 3.25) < 1e-9


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(0)), (2, "k", _t(10)), (3, "k", _t(20)), (4, "x", _t(5))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _t(0), 1.0), ("k", _t(15), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: r for r in asof_join(left, right, "ts", "k").collect()}
    assert out[1]["v_asof"] == 1.0      # equal timestamp matches (inclusive)
    assert out[2]["v_asof"] == 1.0
    assert out[3]["v_asof"] == 2.0
    assert out[4]["v_asof"] is None     # key with no right rows
    assert out[3]["ts_asof"] == _t(15)


def test_asof_join_tolerance_and_null_values(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(100)), (2, "k", _t(400))],
        "id long, k string, ts timestamp",
    )
    # right row at t=90 carries a NULL value: it must still win over the
    # older non-null row at t=0 (struct packing, not per-column last)
    right = spark.createDataFrame(
        [("k", _t(0), 7.0), ("k", _t(90), None)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: r for r in asof_join(left, right, "ts", "k").collect()}
    assert out[1]["ts_asof"] == _t(90) and out[1]["v_asof"] is None
    tol = {r["id"]: r for r in asof_join(
        left, right, "ts", "k", tolerance_seconds=60).collect()}
    assert tol[1]["ts_asof"] == _t(90)   # 10s stale: inside tolerance
    assert tol[2]["ts_asof"] is None     # 310s stale: nulled out


def test_asof_join_one_shuffle_no_range_join(spark):
    left = spark.createDataFrame([(1, "k", _t(0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("k", _t(0), 1.0)], "k string, ts timestamp, v double")
    plan = asof_join(left, right, "ts", "k")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # one per union leg


def test_rolling_agg_trailing_window(spark):
    ev = spark.createDataFrame(
        [(1, "u", _t(0), 10.0), (2, "u", _t(50), 20.0), (3, "u", _t(120), 30.0),
         (4, "u", _t(121), None), (5, "v", _t(60), 5.0)],
        "id long, user string, ts timestamp, v double",
    )
    from semadb_spark.operators.temporal import rolling_agg

    out = {r["id"]: r for r in rolling_agg(
        ev, "ts", "v", "user", window_seconds=100).collect()}
    assert out[1]["roll_n"] == 1 and out[1]["roll_sum"] == 10.0
    assert out[2]["roll_n"] == 2 and out[2]["roll_avg"] == 15.0
    assert out[3]["roll_n"] == 2 and out[3]["roll_sum"] == 50.0  # t=0 aged out
    # NULL value rows don't count but still get a frame
    assert out[4]["roll_n"] == 2 and out[4]["roll_max"] == 30.0
    assert out[5]["roll_n"] == 1 and out[5]["roll_min"] == 5.0


def test_rolling_agg_equal_ts_aggregate_together(spark):
    ev = spark.createDataFrame(
        [(1, "u", _t(10), 1.0), (2, "u", _t(10), 2.0)],
        "id long, user string, ts timestamp, v double",
    )
    from semadb_spark.operators.temporal import rolling_agg

    out = rolling_agg(ev, "ts", "v", "user", window_seconds=5).collect()
    assert all(r["roll_n"] == 2 and r["roll_sum"] == 3.0 for r in out)


def test_asof_join_null_ts_right_rows_excluded(spark):
    left = spark.createDataFrame([(1, "k", _t(100))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", None, 99.0), ("k", _t(50), 1.0)],
        "k string, ts timestamp, v double",
    )
    (row,) = asof_join(left, right, "ts", "k").collect()
    assert row["v_asof"] == 1.0  # null-ts right row never matches


def test_asof_join_rejects_column_collisions(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, "k", _t(0), 9.9)],
                                 "id long, k string, ts timestamp, v_asof double")
    right = spark.createDataFrame([("k", _t(0), 1.0)], "k string, ts timestamp, v double")
    with _pytest.raises(ValueError, match="already exist"):
        asof_join(left, right, "ts", "k")
    bad = left.withColumnRenamed("v_asof", "__rv")
    with _pytest.raises(ValueError, match="reserves"):
        asof_join(bad, right, "ts", "k")


def test_sessionize_and_rolling_reject_shadowed_outputs(spark):
    import pytest as _pytest

    from semadb_spark.operators.temporal import rolling_agg

    ev = spark.createDataFrame([(1, "u", _t(0), 1.0, 0)],
                               "id long, u string, ts timestamp, v double, session_idx int")
    with _pytest.raises(ValueError, match="already exist"):
        sessionize(ev, "u", "ts")
    ev2 = spark.createDataFrame([(1, "u", _t(0), 1.0, 0)],
                                "id long, u string, ts timestamp, v double, roll_n int")
    with _pytest.raises(ValueError, match="already exist"):
        rolling_agg(ev2, "ts", "v", "u", window_seconds=1)


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(0)), (2, "k", _t(10)), (3, "k", _t(100))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _t(10), 1.0), ("k", _t(50), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: r for r in asof_join(
        left, right, "ts", "k", direction="forward").collect()}
    assert out[1]["v_asof"] == 1.0       # earliest right at/after t=0
    assert out[2]["v_asof"] == 1.0       # equal ts matches (inclusive)
    assert out[3]["v_asof"] is None      # nothing after t=100
    tol = {r["id"]: r for r in asof_join(
        left, right, "ts", "k", direction="forward",
        tolerance_seconds=5).collect()}
    assert tol[1]["v_asof"] is None      # 10s ahead > 5s tolerance
    assert tol[2]["v_asof"] == 1.0


def test_asof_join_nearest_direction(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(30)), (2, "k", _t(45)), (3, "k", _t(5))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _t(10), 1.0), ("k", _t(50), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: r for r in asof_join(
        left, right, "ts", "k", direction="nearest").collect()}
    assert out[1]["v_asof"] == 1.0       # exact tie (20 vs 20) -> backward
    assert out[2]["v_asof"] == 2.0       # 5 ahead beats 35 back
    assert out[3]["v_asof"] == 1.0       # only forward exists (5 back none)
    # tolerance prunes each leg independently before the choice
    tol = {r["id"]: r for r in asof_join(
        left, right, "ts", "k", direction="nearest",
        tolerance_seconds=6).collect()}
    assert tol[1]["v_asof"] is None and tol[2]["v_asof"] == 2.0
    assert tol[3]["v_asof"] == 1.0


def test_asof_join_bad_direction(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, "k", _t(0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("k", _t(0), 1.0)], "k string, ts timestamp, v double")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "ts", "k", direction="sideways").collect()
