"""NTZ-safe epoch conversion (functions/timeutil.py): round-2 testdata
loads parquet timestamps as TIMESTAMP_NTZ, which unix_micros / numeric
casts / withWatermark reject — these pin the conversion semantics."""

from pyspark.sql import functions as F

from docarray_spark.functions.timeutil import (
    epoch_us_col,
    epoch_us_expr,
    with_utc_timestamp,
)


def test_epoch_us_ntz_matches_ts(spark):
    df = spark.sql(
        "SELECT TIMESTAMP '2024-01-01 00:09:58.778549' AS ts, "
        "TIMESTAMP_NTZ '2024-01-01 00:09:58.778549' AS ntz"
    )
    r = df.select(
        epoch_us_col(df, "ts").alias("a"), epoch_us_col(df, "ntz").alias("b")
    ).first()
    assert r.a == r.b == 1704067798778549  # exact micros, UTC interpretation


def test_epoch_us_date_and_numeric(spark):
    df = spark.sql("SELECT DATE '1970-01-02' AS d, CAST(1.5 AS DOUBLE) AS secs")
    r = df.select(
        epoch_us_col(df, "d").alias("d_us"), epoch_us_col(df, "secs").alias("s_us")
    ).first()
    assert r.d_us == 86_400_000_000
    assert r.s_us == 1_500_000


def test_with_utc_timestamp_enables_watermark(spark):
    df = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 12:00:00' AS ts, 1 AS v")
    out = with_utc_timestamp(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp"
    # exact instant preserved (NTZ wall clock treated as UTC)
    assert out.select(F.unix_micros("ts")).first()[0] == 1704110400000000
    # no-op on non-NTZ input
    assert with_utc_timestamp(out, "ts") is out


def test_epoch_us_expr_inside_lag_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:30")], "u int, s string"
    ).select("u", F.col("s").cast("timestamp_ntz").alias("ts"))
    us = epoch_us_expr(F.col("ts"), "timestamp_ntz")
    w = Window.partitionBy("u").orderBy("ts")
    gaps = (
        df.withColumn("_us", us)
        .withColumn("gap", F.col("_us") - F.lag("_us").over(w))
        .collect()
    )
    assert sorted(r.gap for r in gaps if r.gap is not None) == [30_000_000]
