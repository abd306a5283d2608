"""Time-relational operators (asof_join, sessionize) vs pandas
ground truth, plus plan-shape pins (one shuffle, no Python UDFs).

pandas.merge_asof is the de-facto reference semantics for as-of joins
(same inclusive/backward defaults as DuckDB ASOF JOIN), so a
differential test against it on randomized data certifies the
union+running-last formulation end to end, including direction and
tolerance handling.
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from htmlparser_spark.operators.relational import asof_join, sessionize

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, seed=7, n_left=400, n_right=150, n_keys=13):
    # deterministic pseudo-random without RNG state: integer hashing
    def h(i, salt):
        x = (i * 2654435761 + salt * 40503) & 0xFFFFFFFF
        return x
    left = pd.DataFrame({
        "k": [h(i, 1) % n_keys for i in range(n_left)],
        "ts": [T0 + dt.timedelta(seconds=h(i, 2) % 86400)
               for i in range(n_left)],
        "lv": [i for i in range(n_left)],
    })
    right = pd.DataFrame({
        "k": [h(i, 3) % n_keys for i in range(n_right)],
        "ts": [T0 + dt.timedelta(seconds=h(i, 4) % 86400)
               for i in range(n_right)],
        "rv": [float(i) * 1.5 for i in range(n_right)],
    })
    # make ties interesting: collapse right to unique (k, ts) keeping
    # max rv, mirroring the documented tie-break contract
    right = right.groupby(["k", "ts"], as_index=False)["rv"].max()
    return left, right


def _spark_asof(spark, left, right, **kw):
    lf = spark.createDataFrame(left)
    rf = spark.createDataFrame(right)
    out = asof_join(lf, rf, on="ts", by=["k"], **kw)
    return (out.select("k", "ts", "lv", "rv_r")
            .toPandas()
            .sort_values(["k", "ts", "lv"])
            .reset_index(drop=True))


def _pandas_asof(left, right, direction="backward", tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    out = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(
            columns={"rv": "rv_r"}),
        on="ts", by="k", direction=direction, **kw)
    return (out[["k", "ts", "lv", "rv_r"]]
            .sort_values(["k", "ts", "lv"])
            .reset_index(drop=True))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    left, right = _mk(spark)
    got = _spark_asof(spark, left, right, direction=direction)
    want = _pandas_asof(left, right, direction=direction)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_tolerance_matches_pandas(spark):
    left, right = _mk(spark)
    got = _spark_asof(spark, left, right, tolerance_seconds=3600)
    want = _pandas_asof(left, right, tolerance=3600)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_null_payload_not_torn(spark):
    """A NULL in one right payload column must NOT be back-filled from
    an older right row: all right columns of an output row come from
    the SAME matched right row (pandas/DuckDB ASOF semantics). Repro
    from the round-3 advice: right (t=10,a=5,b=9), (t=20,a=NULL,b=7);
    left @t=30 must see (a_r=NULL, b_r=7, ts_r=t20) — NOT a_r=5."""
    lf = spark.createDataFrame(
        [(30, dt.datetime(2024, 1, 1, 0, 0, 30))], "k long, ts timestamp")
    rf = spark.createDataFrame(
        [(30, dt.datetime(2024, 1, 1, 0, 0, 10), 5.0, 9.0),
         (30, dt.datetime(2024, 1, 1, 0, 0, 20), None, 7.0)],
        "k long, ts timestamp, a double, b double")
    row = asof_join(lf, rf, on="ts", by=["k"]).collect()[0]
    assert row.a_r is None
    assert row.b_r == 7.0
    assert row.ts_r == dt.datetime(2024, 1, 1, 0, 0, 20)


def test_asof_null_payload_matches_pandas(spark):
    """Randomized differential with NULLs planted in one right payload
    column — merge_asof fills every column from the single matched
    row, so any independent-fill tearing shows up as a mismatch."""
    left, right = _mk(spark)
    right = right.copy()
    right["rv2"] = right["rv"] * 2.0
    right.loc[right.index % 3 == 0, "rv"] = None
    lf = spark.createDataFrame(left)
    rf = spark.createDataFrame(right)
    got = (asof_join(lf, rf, on="ts", by=["k"])
           .select("k", "ts", "lv", "rv_r", "rv2_r").toPandas()
           .sort_values(["k", "ts", "lv"]).reset_index(drop=True))
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(
            columns={"rv": "rv_r", "rv2": "rv2_r"}),
        on="ts", by="k", direction="backward")
    want = (want[["k", "ts", "lv", "rv_r", "rv2_r"]]
            .sort_values(["k", "ts", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_single_shuffle_no_python(spark):
    from htmlparser_spark.plans import explain_string

    left, right = _mk(spark)
    lf = spark.createDataFrame(left)
    rf = spark.createDataFrame(right)
    plan = explain_string(asof_join(lf, rf, on="ts", by=["k"]))
    # formatted mode prints each node once in the tree ("Exchange (5)")
    # and once in the detail section ("(5) Exchange ..."); count tree rows
    assert plan.count("Exchange (") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Window" in plan


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 10, T0),
        (2, 10, T0 + dt.timedelta(seconds=1800)),   # == gap: same session
        (3, 10, T0 + dt.timedelta(seconds=3601)),   # > gap from prev: new
        (4, 11, T0),                                 # other key restarts
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_idx
           for r in sessionize(df, gap_seconds=1800).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_timestamp_ntz(spark):
    # the events table ships TIMESTAMP_NTZ; the gap arithmetic must
    # not rely on a direct NTZ -> BIGINT cast (illegal in Spark 4)
    df = spark.createDataFrame(
        [(1, 5, T0), (2, 5, T0 + dt.timedelta(seconds=9999))],
        "event_id long, user_id long, ts timestamp_ntz")
    got = {r.event_id: r.session_idx for r in sessionize(df).collect()}
    assert got == {1: 1, 2: 2}


def test_global_rank_equals_window_rank(spark):
    from htmlparser_spark.operators.relational import global_rank
    from pyspark.sql import Window
    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 101).alias("a"), F.col("id").alias("b"))
    exp = {(r.a, r.b): r.rk for r in
           df.withColumn("rk", F.row_number().over(
               Window.orderBy("a", "b"))).collect()}
    for parts in (3, 16):
        got = {(r.a, r.b): r.rank for r in
               global_rank(df.repartition(7), ["a", "b"],
                           num_partitions=parts).collect()}
        assert got == exp
    # no single-partition global window in the plan
    out = global_rank(df, ["a", "b"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln:
            assert "_pid" in ln
    assert "RangePartitioning" in plan or "rangepartitioning" in plan


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def _mk_range(seed=11, n_pts=300, n_iv=60, n_keys=7):
    def h(i, salt):
        return (i * 2654435761 + (salt + seed) * 40503) & 0xFFFFFFFF
    points = pd.DataFrame({
        "k": [h(i, 1) % n_keys for i in range(n_pts)],
        "t": [h(i, 2) % 100000 for i in range(n_pts)],
        "pid": list(range(n_pts)),
    })
    rows = []
    for i in range(n_iv):
        lo = h(i, 3) % 100000
        # mix of narrow, empty, and giant spans (giant -> wide arm)
        span = [h(i, 4) % 500, 0, h(i, 5) % 90000][i % 3]
        rows.append({"k": h(i, 6) % n_keys, "iid": i,
                     "lo": lo, "hi": lo + span})
    return points, pd.DataFrame(rows)


@pytest.mark.parametrize("use_by", [True, False])
def test_range_join_matches_reference(spark, use_by):
    """Randomized differential vs the all-pairs python reference:
    half-open semantics, empty intervals dropped, and the
    narrow/wide split (giant spans route to the broadcast arm via
    max_buckets_per_interval) is value-invisible."""
    from htmlparser_spark.operators.relational import range_join
    points, intervals = _mk_range()
    if not use_by:
        intervals = intervals.rename(columns={"k": "ik"})
    pf = spark.createDataFrame(points)
    vf = spark.createDataFrame(intervals)
    got = range_join(pf, vf, point_col="t", lo_col="lo", hi_col="hi",
                     by=["k"] if use_by else [], bucket=1000,
                     max_buckets_per_interval=8)
    rows = sorted((int(r["pid"]), int(r["iid"]))
                  for r in got.select("pid", "iid").collect())
    ref = []
    for _, p in points.iterrows():
        for _, iv in intervals.iterrows():
            if use_by and p["k"] != iv["k"]:
                continue
            if iv["lo"] <= p["t"] < iv["hi"]:
                ref.append((int(p["pid"]), int(iv["iid"])))
    assert rows == sorted(ref)


def test_range_join_rejects_ambiguous_columns(spark):
    from htmlparser_spark.operators.relational import range_join
    points, intervals = _mk_range()
    pf = spark.createDataFrame(points)
    vf = spark.createDataFrame(intervals)
    with pytest.raises(ValueError, match="both"):
        range_join(pf, vf, point_col="t", lo_col="lo", hi_col="hi",
                   by=[], bucket=1000)


def test_range_join_narrow_arm_is_equi_join(spark):
    """Plan pin: the narrow arm must be an equi-join on
    (by, bucket) — no CartesianProduct / BroadcastNestedLoop for
    narrow intervals when by-keys are present and every span fits
    the cap."""
    from htmlparser_spark.operators.relational import range_join
    from htmlparser_spark.plans.inspect import explain_string
    points, intervals = _mk_range()
    intervals = intervals[intervals["hi"] - intervals["lo"] < 5000]
    pf = spark.createDataFrame(points)
    vf = spark.createDataFrame(intervals)
    out = range_join(pf, vf, point_col="t", lo_col="lo", hi_col="hi",
                     by=["k"], bucket=1000,
                     max_buckets_per_interval=100)
    plan = explain_string(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
