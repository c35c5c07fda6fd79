"""Timezone-robust epoch conversion for timestamp columns.

Parquet timestamps written with ``isAdjustedToUTC=false`` load as
``TIMESTAMP_NTZ`` in Spark 4 (``spark.sql.parquet.inferTimestampNTZ.enabled``
defaults true), and ``unix_micros`` / numeric casts reject NTZ inputs.
Time-based operators (sessionize, asof) therefore route through
``epoch_us_col``, which dispatches on the column's declared dtype:

- ``timestamp``      → ``unix_micros`` (exact, JVM-side);
- ``timestamp_ntz``  → ``timestampdiff(MICROSECOND, epoch, col)`` against a
  TIMESTAMP_NTZ epoch literal — exact integer microseconds, *independent of
  the session timezone* (an NTZ wall-clock is treated as UTC, matching
  DuckDB's ``epoch_us`` on naive parquet timestamps, so oracle comparisons
  hold on any driver);
- ``date``           → days × 86 400 000 000;
- numeric            → seconds × 1 000 000 (so callers can pass epoch-second
  doubles through the same code path).

Everything stays a Catalyst ``Column`` expression — whole-stage codegen,
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400 * 1_000_000


def epoch_us_expr(col: Column, dtype: str) -> Column:
    """Epoch microseconds (bigint) for a Column whose Spark dtype string is
    ``dtype``. Use :func:`epoch_us_col` when you have the DataFrame."""
    if dtype == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
        )
    if dtype == "timestamp":
        return F.unix_micros(col)
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long") * F.lit(
            _US_PER_DAY
        )
    # numeric epoch-seconds passthrough
    return (col.cast("double") * 1_000_000).cast("long")


def epoch_us_col(df: DataFrame, col_name: str) -> Column:
    """Epoch microseconds for ``df[col_name]``, NTZ-safe (see module doc)."""
    return epoch_us_expr(F.col(col_name), dict(df.dtypes).get(col_name, ""))


def time_dtype(df: DataFrame, col_name: str) -> str:
    return dict(df.dtypes).get(col_name, "")


def with_utc_timestamp(df: DataFrame, col_name: str) -> DataFrame:
    """Coerce ``col_name`` to TIMESTAMP if it is TIMESTAMP_NTZ, treating the
    naive wall-clock as UTC regardless of session timezone — via
    ``timestamp_micros(epoch_us)``, an exact integer round-trip. Needed
    before ``withWatermark`` (Spark rejects event time on NTZ,
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). No-op for other types."""
    if dict(df.dtypes).get(col_name) != "timestamp_ntz":
        return df
    return df.withColumn(
        col_name, F.timestamp_micros(epoch_us_expr(F.col(col_name), "timestamp_ntz"))
    )
