"""Temporal join operators (fermor_spark.temporal): as-of semantics
(latest-at-or-before, ties, tolerance, unmatched nulls) and range-join
bin-bucketing correctness + the no-theta-join plan contract."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from fermor_spark.temporal import asof_join, range_join

TS = "2024-01-01 {}"


def _events(spark, rows, schema="k string, ts timestamp, val long"):
    return spark.createDataFrame(
        [(k, TS.format(t), v) for k, t, v in rows], "k string, ts string, val long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_asof_basic_latest_at_or_before(spark):
    left = _events(spark, [("a", "10:00:00", 1), ("a", "10:30:00", 2), ("b", "10:00:00", 3)])
    right = _events(spark, [("a", "09:59:00", 10), ("a", "10:10:00", 20), ("b", "11:00:00", 30)])
    out = {(r["k"], r["val"]): r["val_right"]
           for r in asof_join(left, right, on="ts", by="k").collect()}
    assert out[("a", 1)] == 10      # 09:59 is the latest <= 10:00
    assert out[("a", 2)] == 20      # 10:10 supersedes 09:59
    assert out[("b", 3)] is None    # b's only right row is in the future


def test_asof_simultaneous_right_row_matches(spark):
    left = _events(spark, [("a", "10:00:00", 1)])
    right = _events(spark, [("a", "10:00:00", 42)])
    r = asof_join(left, right, on="ts", by="k").collect()[0]
    assert r["val_right"] == 42


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _events(spark, [("a", "10:00:00", 1)])
    right = _events(spark, [("a", "09:00:00", 10)])
    ok = asof_join(left, right, on="ts", by="k", tolerance_seconds=7200).collect()[0]
    stale = asof_join(left, right, on="ts", by="k", tolerance_seconds=600).collect()[0]
    assert ok["val_right"] == 10
    assert stale["val_right"] is None and stale["ts_right"] is None


def test_range_join_boundaries_inclusive(spark):
    left = _events(spark, [("a", "10:00:00", 1)])
    right = _events(spark, [
        ("a", "09:50:00", 10),   # exactly -before
        ("a", "10:10:00", 20),   # exactly +after
        ("a", "09:49:59", 30),   # just outside
        ("a", "10:10:01", 40),   # just outside
        ("b", "10:00:00", 50),   # wrong key
    ])
    got = sorted(r["val_right"] for r in range_join(
        left, right, on="ts", by="k",
        before_seconds=600, after_seconds=600).collect())
    assert got == [10, 20]


def test_range_join_no_duplicate_candidates(spark):
    # a right row adjacent to a bin boundary must appear exactly once
    left = _events(spark, [("a", "10:00:00", 1)])
    right = _events(spark, [("a", "10:09:59", 20)])
    rows = range_join(left, right, on="ts", by="k",
                      before_seconds=600, after_seconds=600).collect()
    assert len(rows) == 1


def test_temporal_plans_have_no_theta_join(spark):
    left = _events(spark, [("a", "10:00:00", 1)])
    right = _events(spark, [("a", "09:59:00", 10)])
    for df in (
        asof_join(left, right, on="ts", by="k"),
        range_join(left, right, on="ts", by="k",
                   before_seconds=600, after_seconds=600),
    ):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_funnel_ordered_cascade(spark):
    """Funnel semantics on a hand-built history: order within horizon is
    required (click BEFORE the first view does not count), the cascade
    anchors on the FIRST step-1 event, and the horizon bounds later
    steps."""
    import datetime as dt

    from fermor_spark.temporal import funnel

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full ordered funnel
        (1, t0, 1, "view"), (2, t0 + h, 1, "click"),
        (3, t0 + 2 * h, 1, "purchase"),
        # user 2: click precedes the first view -> stops at view
        (4, t0, 2, "click"), (5, t0 + h, 2, "view"),
        # user 3: purchase outside the 7-day horizon of the first view
        (6, t0, 3, "view"), (7, t0 + h, 3, "click"),
        (8, t0 + dt.timedelta(days=8), 3, "purchase"),
        # user 4: never views
        (9, t0, 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.step_name: r.n_users
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohorts_matrix(spark):
    """Cohort semantics: users cohort by first-event week; later-week
    activity lands at the right offset; cohort_size counts the cohort,
    n_users the active subset."""
    import datetime as dt

    from fermor_spark.temporal import retention_cohorts

    w0 = dt.datetime(2024, 1, 1)          # a Monday
    w1, w2 = w0 + dt.timedelta(days=7), w0 + dt.timedelta(days=14)
    rows = [
        (1, w0, 1, "view"), (2, w1 + dt.timedelta(hours=5), 1, "view"),
        (3, w0 + dt.timedelta(days=2), 2, "view"), (4, w2, 2, "view"),
        (5, w1, 3, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(str(r.cohort_start), r.period_offset): (r.n_users, r.cohort_size)
           for r in retention_cohorts(ev).collect()}
    assert got == {
        ("2024-01-01", 0): (2, 2),     # users 1,2 in week-0 cohort
        ("2024-01-01", 1): (1, 2),     # only user 1 back in week 1
        ("2024-01-01", 2): (1, 2),     # only user 2 back in week 2
        ("2024-01-08", 0): (1, 1),     # user 3's own cohort
    }


def test_funnel_null_anchor_counts_nowhere(spark):
    """Pinned r13 behavior: a user whose only step-1 events have a null
    timestamp has no anchor and is counted at NO step (a null anchor
    cannot order a cascade)."""
    import datetime as dt

    from fermor_spark.temporal import funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, None, 1, "view"),                     # null anchor: nowhere
        (2, t0, 2, "view"),
        (3, t0 + dt.timedelta(hours=1), 2, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.step_name: r.n_users
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 1, "click": 1, "purchase": 0}
