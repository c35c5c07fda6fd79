"""Gap-based sessionization of event logs: assign each event to a per-user
session whenever the idle gap to the previous event exceeds a threshold,
plus a per-session rollup. The batch twin of Structured Streaming's
``session_window`` (streaming/ops.py covers the stream side).

Scale design: ONE hash exchange on the user key. Session flags are a
`lag` + running-sum window over that partitioning, and the rollup groups on
``(user, session_idx)`` — a superset of the window's partitioning key, so
Catalyst reuses the exchange (no second shuffle). Per-user data is bounded
by per-user activity, not corpus size; a pathological power-user key is the
usual skew story (AQE or pre-filtering).

Timestamps compare as integer epoch-microseconds (`unix_micros`) — exact,
engine-portable, and immune to ns/us parquet representation drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Events + a 1-based ``session_idx`` column per user (new session when
    the gap from the previous event exceeds ``gap_seconds``)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.unix_micros(F.lag(ts_col).over(w))
    flag = F.when(
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_idx", F.sum(flag).over(w).cast("long"))


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: ``(user, session_idx, start_us, end_us,
    duration_us, n_events[, sum_value])``."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    aggs = [
        F.min(F.unix_micros(F.col(ts_col))).alias("start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    out = s.groupBy(user_col, "session_idx").agg(*aggs)
    return out.withColumn("duration_us", F.col("end_us") - F.col("start_us")).select(
        user_col, "session_idx", "start_us", "end_us", "duration_us", "n_events",
        *(["sum_value"] if value_col else []),
    )
