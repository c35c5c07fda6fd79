"""As-of / range join extension tests (hand-built ground truth + DuckDB
ASOF JOIN cross-check in the oracle gate)."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("a", 10.0, "L1"), ("a", 20.0, "L2"), ("a", 5.0, "L0"), ("b", 15.0, "L3")],
        "k string, t double, lv string",
    )
    right = spark.createDataFrame(
        [("a", 8.0, "R1"), ("a", 10.0, "R2"), ("a", 19.0, "R3"), ("b", 99.0, "R4")],
        "k string, t double, rv string",
    )
    return left, right


def test_asof_backward_with_tie(spark, sides):
    left, right = sides
    out = {r["lv"]: r["rv_right"] for r in asof_join(left, right, "t", by=["k"]).collect()}
    assert out == {
        "L0": None,   # nothing at or before t=5
        "L1": "R2",   # exact tie t=10 is visible (<= rule)
        "L2": "R3",
        "L3": None,   # b's only right row is later
    }


def test_asof_tolerance(spark, sides):
    left, right = sides
    out = {
        r["lv"]: r["rv_right"]
        for r in asof_join(left, right, "t", by=["k"], tolerance_seconds=1.5).collect()
    }
    # L2 (t=20) matches R3 (t=19) within 1.5; L1 exact tie distance 0
    assert out == {"L0": None, "L1": "R2", "L2": "R3", "L3": None}
    out2 = {
        r["lv"]: r["rv_right"]
        for r in asof_join(left, right, "t", by=["k"], tolerance_seconds=0.5).collect()
    }
    assert out2["L2"] is None  # 19 -> 20 is now too stale


def test_asof_one_shuffle(spark, sides):
    from docarray_spark.plans import shuffle_count

    left, right = sides
    out = asof_join(left, right, "t", by=["k"])
    assert shuffle_count(out) <= 1


def test_range_join_bucketized_equals_naive(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "pid int, x double"
    )
    intervals = spark.createDataFrame(
        [(j, j * 3.0, j * 3.0 + 2.5) for j in range(16)], "iid int, lo double, hi double"
    )
    naive = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi").collect()
    }
    bucketed = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi", bucket_width=4.0).collect()
    }
    assert naive == bucketed and len(naive) > 0


def test_asof_tolerance_mixed_time_dtypes(spark):
    """ADVICE r2 #2: tolerance dispatch must use the UNIONED frame's dtype.
    Left numeric (long seconds→cast) vs right double time columns coerce on
    union; the staleness test must still be exact."""
    from docarray_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100.0), (2, 500.0)], "k long, ts double"
    ).select("k", F.col("ts").cast("long").alias("ts"))
    right = spark.createDataFrame(
        [(1, 90.5, "a"), (2, 100.5, "b")], "k long, ts double, v string"
    )
    out = {r.k: r for r in asof_join(
        left, right, time_col="ts", by=["k"], right_cols=["v"],
        tolerance_seconds=50.0,
    ).collect()}
    assert out[1].v_right == "a"       # 9.5s stale, within tolerance
    assert out[2].v_right is None      # 399.5s stale → nulled
