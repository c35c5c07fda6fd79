"""Salted aggregation/join equivalence tests."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.skew import salted_agg, salted_join, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    hot = spark.range(900).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_with_salt_range_and_determinism(skewed):
    s1 = with_salt(skewed, 8).select("_salt").distinct().collect()
    assert {r["_salt"] for r in s1} <= set(range(8))
    a = sorted(map(tuple, with_salt(skewed, 8).collect()))
    b = sorted(map(tuple, with_salt(skewed, 8).collect()))
    assert a == b


def test_salted_agg_equals_plain(skewed):
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed, ["k"],
            {"n": ("v", "count"), "s": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_associative(skewed):
    with pytest.raises(ValueError, match="two-phase"):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")})


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c5", "C5")], "k string, label string"
    )
    plain = sorted(map(tuple, skewed.join(dim, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(skewed, dim, ["k"], n_salts=4).collect()))
    assert plain == salted
    left = sorted(map(tuple, skewed.join(dim, ["k"], "left").collect()))
    salted_left = sorted(
        map(tuple, salted_join(skewed, dim, ["k"], n_salts=4, how="left").collect())
    )
    assert left == salted_left


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from docarray_spark.operators import salted_join

    l = spark.createDataFrame([Row(k=1, a="x")])
    r = spark.createDataFrame([Row(k=1, b="y"), Row(k=2, b="z")])
    with _pytest.raises(ValueError):
        salted_join(l, r, ["k"], how="full")
    with _pytest.raises(ValueError):
        salted_join(l, r, ["k"], how="right")
