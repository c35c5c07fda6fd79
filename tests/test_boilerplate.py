"""Boilerplate removal: unit splitting, doc-frequency thresholding, order
preservation, pure-boilerplate docs, and the 2-exchange broadcast plan."""

from pyspark.sql import functions as F

from docarray_spark.operators import lines_col, remove_frequent_units, token_blocks_col
from docarray_spark.plans import broadcast_join_count, shuffle_count


def test_token_blocks(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    got = df.select(token_blocks_col("text", 2).alias("u")).head()["u"]
    assert got == ["a b", "c d", "e"]


def test_lines_col(spark):
    df = spark.createDataFrame([("  x\n\n y y \nz",)], "text string")
    assert df.select(lines_col("text").alias("u")).head()["u"] == ["x", "y y", "z"]


def _docs(spark):
    rows = [
        # "cookie banner" line appears in 3 docs (and twice inside doc 0 —
        # within-doc repeats count once toward doc-frequency)
        (0, "cookie banner\nreal content zero\ncookie banner"),
        (1, "cookie banner\nreal content one"),
        (2, "real content two\ncookie banner"),
        (3, "unique content three\nmore unique text"),
        (4, "cookie banner"),  # pure boilerplate -> empty clean_text
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_remove_frequent_lines(spark):
    df = _docs(spark).withColumn("units", lines_col("text"))
    out = remove_frequent_units(df, id_col="id", units="units", min_df=3, joiner="\n")
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[0]["clean_text"] == "real content zero"
    assert got[0]["units_total"] == 3 and got[0]["units_removed"] == 2
    assert got[1]["clean_text"] == "real content one"
    assert got[2]["clean_text"] == "real content two"
    # below threshold: doc 3 untouched, order preserved
    assert got[3]["clean_text"] == "unique content three\nmore unique text"
    assert got[3]["units_removed"] == 0
    # pure boilerplate doc still present, emptied
    assert got[4]["clean_text"] == "" and got[4]["units_removed"] == 1


def test_two_exchanges_and_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "units", token_blocks_col("text", 8)
    )
    out = remove_frequent_units(docs, id_col="doc_id", units="units", min_df=2)
    assert shuffle_count(out) == 2
    assert broadcast_join_count(out) >= 1


def test_dedup_units_first_null_and_empty_units_survive(spark):
    """ADVICE r2 #4: docs with NULL or empty units arrays must not vanish —
    they yield one row with units_total 0 and empty clean_text."""
    from docarray_spark.operators import dedup_units_first

    df = spark.createDataFrame(
        [(1, ["aa", "bb"]), (2, []), (3, None), (4, ["aa"])],
        "id long, units array<string>",
    )
    out = {r.id: r for r in dedup_units_first(df, "id", "units").collect()}
    assert set(out) == {1, 2, 3, 4}
    for empty_id in (2, 3):
        r = out[empty_id]
        assert r.clean_text == "" and r.units_total == 0 and r.units_removed == 0
    assert out[1].clean_text == "aa bb"
    assert out[4].clean_text == "" and out[4].units_removed == 1


def test_remove_frequent_units_shuffle_join_path(spark):
    """broadcast_freq=False (corpus-scale frequent sets) produces the
    same result through a shuffle join."""
    from docarray_spark.operators.boilerplate import lines_col, remove_frequent_units

    df = spark.createDataFrame(
        [(1, "keep one\nboiler\nkeep two"), (2, "boiler\nunique"),
         (3, "boiler\nother")],
        "id long, text string",
    ).withColumn("units", lines_col("text"))
    a = {r.id: r.clean_text for r in remove_frequent_units(df, min_df=3).collect()}
    b = {r.id: r.clean_text for r in remove_frequent_units(
        df, min_df=3, broadcast_freq=False).collect()}
    assert a == b and "boiler" not in a[1]
