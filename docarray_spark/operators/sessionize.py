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

Timestamps compare as integer epoch-microseconds — exact, engine-portable,
immune to ns/us parquet representation drift, and NTZ-safe (parquet
timestamps load as TIMESTAMP_NTZ in Spark 4; see functions/timeutil.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docarray_spark.functions.timeutil import epoch_us_col

_US = "_ts_us"


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Events + a 1-based ``session_idx`` column per user (new session when
    the gap from the previous event exceeds ``gap_seconds``)."""
    us_df = df.withColumn(_US, epoch_us_col(df, ts_col))
    w = Window.partitionBy(user_col).orderBy(_US)
    us = F.col(_US)
    prev_us = F.lag(_US).over(w)
    flag = F.when(
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return us_df.withColumn("session_idx", F.sum(flag).over(w).cast("long")).drop(_US)


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
    us = epoch_us_col(df, ts_col)
    aggs = [
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    out = s.groupBy(user_col, "session_idx").agg(*aggs)
    return out.withColumn("duration_us", F.col("end_us") - F.col("start_us")).select(
        user_col, "session_idx", "start_us", "end_us", "duration_us", "n_events",
        *(["sum_value"] if value_col else []),
    )
