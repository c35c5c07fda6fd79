"""As-of / range join — engine extensions (SURVEY.md §2.3 lists these as
absent from the reference and declared as extensions, not parity).

``asof_join`` matches each left row to the latest right row at-or-before
its timestamp within the same key group (the time-series point-in-time
join). Implementation is the scalable union-window form:

1. tag both sides and union them (cheap narrow ops),
2. one hash shuffle on the key, sort within partition by (time, tag),
3. ``last(right_cols, ignorenulls) over (partition by key, order by time)``
   carries the most recent right values forward onto each left row.

One shuffle total, no join explosion, no per-key driver work — the same
plan shape at 100 TB. A tolerance turns it into a bounded-staleness join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docarray_spark.functions.timeutil import epoch_us_expr


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.time <= left.time`` (per ``by`` group). Right columns arrive
    suffixed; unmatched (or out-of-tolerance) rows get NULLs — ASOF LEFT
    JOIN semantics."""
    by = by or []
    right_cols = right_cols or [
        c for c in right.columns if c != time_col and c not in by
    ]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *by, time_col, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same timestamp (tag 0 < 1),
    # so an exact-tie right row is visible to the left row — ASOF <= rule
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in right_cols
    ]
    rtime = F.last(
        F.when(F.col("_side") == 0, F.col(time_col)), ignorenulls=True
    ).over(w)

    out = unioned.select(
        *[c for c in lt.columns if c != "_side"],
        *carried,
        rtime.alias("_rtime"),
        F.col("_side").alias("_s"),
    ).filter(F.col("_s") == 1)

    if tolerance_seconds is not None:
        # NTZ-safe: numeric casts reject TIMESTAMP_NTZ (timeutil module doc).
        # Dtypes come from the UNIONED frame, not the left side (ADVICE r2
        # #2): unionByName coerces both time columns to a common type, so
        # left.dtypes would dispatch the wrong epoch branch when the sides'
        # time types differ (timestamp vs ntz vs numeric).
        odt = dict(out.dtypes)
        stale = (
            epoch_us_expr(F.col(time_col), odt[time_col])
            - epoch_us_expr(F.col("_rtime"), odt["_rtime"])
        ) > tolerance_seconds * 1_000_000
        out = out.select(
            *[c for c in lt.columns if c != "_side"],
            *[
                F.when(stale | F.col("_rtime").isNull(), F.lit(None))
                .otherwise(F.col(f"{c}{suffix}"))
                .alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    else:
        out = out.drop("_rtime", "_s")
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    containing them. With ``bucket_width``, both sides are bucketized so
    the join is an EQUI-join on (key…, bucket) plus the range residual —
    the standard trick that avoids O(N·M) nested-loop range joins (right
    intervals must be shorter than ``bucket_width``; wider intervals need
    interval splitting first)."""
    by = by or []
    cond = (F.col(left_point) >= F.col(right_start)) & (
        F.col(left_point) < F.col(right_end)
    )
    if bucket_width is None:
        joined = left.join(right, by) if by else left.crossJoin(right)
        return joined.filter(cond)
    # NTZ-safe: bucket on epoch-us (numeric cols scale identically, so the
    # ratio floor(us / (width*1e6)) == floor(value / width) either way)
    bw_us = bucket_width * 1_000_000
    l_us = epoch_us_expr(F.col(left_point), dict(left.dtypes).get(left_point, ""))
    rs_us = epoch_us_expr(F.col(right_start), dict(right.dtypes).get(right_start, ""))
    re_us = epoch_us_expr(F.col(right_end), dict(right.dtypes).get(right_end, ""))
    lb = left.withColumn("_bucket", F.floor(l_us / bw_us))
    # an interval shorter than bucket_width overlaps at most 2 buckets
    rb = right.withColumn(
        "_bucket", F.explode(F.sequence(F.floor(rs_us / bw_us), F.floor(re_us / bw_us)))
    )
    return lb.join(rb, [*by, "_bucket"]).filter(cond).drop("_bucket")
