"""Sessionization: gap-based session boundaries, rollup values, and the
single-exchange plan (window + rollup share the user_id partitioning)."""

import datetime as dt

from pyspark.sql import functions as F

from docarray_spark.operators import session_summary, sessionize
from docarray_spark.plans import shuffle_count


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events inside one 10-min-gap session, then a 2-hour
        # jump starting session 2
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=5), 2.0),
        (1, t0 + dt.timedelta(minutes=9), 3.0),
        (1, t0 + dt.timedelta(hours=2), 4.0),
        # user 2: single event
        (2, t0 + dt.timedelta(minutes=1), 10.0),
        # user 1 gap EXACTLY the threshold: still the same session (> not >=)
        (1, t0 + dt.timedelta(hours=2, minutes=10), 5.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_session_boundaries(spark):
    out = sessionize(_events(spark), gap_seconds=600)
    got = {
        (r["user_id"], r["ts"].minute + 60 * r["ts"].hour): r["session_idx"]
        for r in out.collect()
    }
    assert got[(1, 12 * 60)] == 1
    assert got[(1, 12 * 60 + 5)] == 1
    assert got[(1, 12 * 60 + 9)] == 1
    assert got[(1, 14 * 60)] == 2
    assert got[(1, 14 * 60 + 10)] == 2  # exactly-at-gap stays in session
    assert got[(2, 12 * 60 + 1)] == 1


def test_session_summary_rollup(spark):
    out = session_summary(_events(spark), gap_seconds=600, value_col="value")
    rows = {(r["user_id"], r["session_idx"]): r.asDict() for r in out.collect()}
    s1 = rows[(1, 1)]
    assert s1["n_events"] == 3 and s1["sum_value"] == 6.0
    assert s1["duration_us"] == 9 * 60 * 1_000_000
    s2 = rows[(1, 2)]
    assert s2["n_events"] == 2 and s2["sum_value"] == 9.0
    assert rows[(2, 1)]["n_events"] == 1


def test_single_exchange(spark, sf_dir):
    from docarray_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    out = session_summary(ev, gap_seconds=900, value_col="value")
    assert shuffle_count(out) == 1
