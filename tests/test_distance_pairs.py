"""Pins for the r12 Arrow pair-distance kernels: pair_distance_udf must be
BIT-IDENTICAL to the Column fold forms (same dimension-order float64
accumulation), including NULL / unequal-length zip_with semantics — the
kernels replaced the interpreted HOF folds at the LSH/IVF re-rank and
embedding-dup verify join sites on that exact contract."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.functions.distance import (
    cosine_distance_col,
    euclidean_distance_col,
    pair_distance_udf,
    sqeuclidean_distance_col,
)

FOLDS = {
    "cosine": cosine_distance_col,
    "sqeuclidean": sqeuclidean_distance_col,
    "euclidean": euclidean_distance_col,
}


def _pairs(spark, n=400, d=48):
    return spark.range(n).select(
        F.expr(
            f"transform(sequence(0, {d - 1}), j -> cast(sin(id * {d} + j) as double))"
        ).alias("a"),
        F.expr(
            f"transform(sequence(0, {d - 1}), j -> cast(cos(id * {d} + j) * 1e-3 as double))"
        ).alias("b"),
    )


@pytest.mark.parametrize("metric", sorted(FOLDS))
def test_pair_udf_bit_identical_to_fold(spark, metric):
    df = _pairs(spark)
    cmp = df.select(
        FOLDS[metric]("a", "b").alias("f"),
        pair_distance_udf(metric)(F.col("a"), F.col("b")).alias("u"),
    )
    # raw double equality — any accumulation-order drift would show here
    assert cmp.filter("f <> u OR (f IS NULL) <> (u IS NULL)").count() == 0


def test_pair_udf_float32_input_promotion(spark):
    # float32 arrays promote to double exactly on both paths
    df = spark.range(200).select(
        F.expr("transform(sequence(0, 31), j -> cast(sin(id + j) as float))").alias("a0"),
        F.expr("transform(sequence(0, 31), j -> cast(cos(id + j) as float))").alias("b0"),
    ).select(
        F.expr("transform(a0, x -> cast(x as double))").alias("a"),
        F.expr("transform(b0, x -> cast(x as double))").alias("b"),
    )
    cmp = df.select(
        cosine_distance_col("a", "b").alias("f"),
        pair_distance_udf("cosine")(F.col("a"), F.col("b")).alias("u"),
    )
    assert cmp.filter("f <> u").count() == 0


def test_pair_udf_null_and_length_mismatch(spark):
    df = spark.sql(
        "SELECT array(1.0d, 2.0d) a, array(1.0d) b "
        "UNION ALL SELECT NULL, array(1.0d) "
        "UNION ALL SELECT array(3.0d, 4.0d), NULL "
        "UNION ALL SELECT array(1.0d, 2.0d), array(3.0d, 4.0d)"
    )
    rows = df.select(
        cosine_distance_col("a", "b").alias("f"),
        pair_distance_udf("cosine")(F.col("a"), F.col("b")).alias("u"),
    ).collect()
    for r in rows:
        assert (r.f is None) == (r.u is None)
        if r.f is not None:
            assert r.f == r.u


def test_pair_udf_unknown_metric_raises():
    with pytest.raises(ValueError, match="no Arrow pair kernel"):
        pair_distance_udf("manhattan")


def test_pair_udf_null_element_yields_null_not_crash(spark):
    # ADVICE r12 #2: a NULL element inside one vector must produce a NULL
    # distance (the zip_with fold's semantics), not a failed Arrow task
    df = spark.sql(
        "SELECT array(1.0d, CAST(NULL AS DOUBLE)) a, array(1.0d, 2.0d) b "
        "UNION ALL SELECT array(1.0d, 2.0d), array(1.0d, 2.0d)"
    )
    rows = df.select(
        pair_distance_udf("cosine")(F.col("a"), F.col("b")).alias("u")
    ).collect()
    vals = sorted((r.u is None for r in rows))
    assert vals == [False, True]


def test_pair_udf_zero_norm_ranks_last_with_nulls_last(spark):
    # ADVICE r12 #1: a zero-norm vector's cosine is NULL through the kernel;
    # ranking sites order with asc_nulls_last so it can never become top-1
    from pyspark.sql import Window

    df = spark.sql(
        "SELECT 1 AS query_id, 10 AS match_id, array(0.0d, 0.0d) a, array(1.0d, 2.0d) b "
        "UNION ALL SELECT 1, 11, array(1.0d, 2.0d), array(1.0d, 2.0d) "
        "UNION ALL SELECT 1, 12, array(2.0d, 1.0d), array(1.0d, 2.0d)"
    )
    scored = df.select(
        "query_id", "match_id",
        pair_distance_udf("cosine")(F.col("a"), F.col("b")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc_nulls_last(), F.col("match_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter("rank = 1").collect()
    assert top[0].match_id == 11  # the degenerate zero-norm row is NOT top-1
