"""Dataset attribute summary — ``da.summary()`` re-expressed as a DataFrame.

The reference prints a rich table of per-attribute (data type, #unique
values, has-empty) stats by iterating every document on the driver
(``/root/reference/docarray/array/mixins/plot.py:22-105``, attribute table
at 84-104). Here the same facts come from ONE distributed aggregate over the
corpus — a single job whose result is #columns rows, so it scales to 100 TB
where the reference's per-doc Python loop cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ATOMIC = (
    T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.BooleanType, T.DateType, T.TimestampType,
    T.DecimalType,
)


def dataset_summary(
    df: DataFrame,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-attribute summary: (attribute, dtype, row_count, non_null,
    null_count, n_unique, has_empty), one output row per column, ordered by
    attribute name.

    One full-scan aggregate computes every stat map-side-combined;
    ``n_unique`` defaults to ``approx_count_distinct`` (HyperLogLog — the
    only sane choice at 100 TB; ``rsd`` tunes the sketch) and flips to exact
    ``count(DISTINCT)`` with ``exact_distinct=True`` for oracle-gated runs.
    Complex-typed columns (arrays/structs/maps/binary) report null
    ``n_unique`` — distinct-hashing of nested values is engine-specific.
    ``has_empty`` mirrors the reference's has-empty-value column: any null
    (or '' for strings)."""
    aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.count(c).alias(f"{f.name}__nn"))
        if isinstance(f.dataType, _ATOMIC):
            d = (
                F.count_distinct(c)
                if exact_distinct
                else F.approx_count_distinct(c, rsd=rsd)
            )
            aggs.append(d.alias(f"{f.name}__nu"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"{f.name}__nu"))
        empty = c.isNull()
        if isinstance(f.dataType, T.StringType):
            empty = empty | (c == "")
        aggs.append(F.max(empty.cast("int")).alias(f"{f.name}__he"))
    stats = df.agg(F.count(F.lit(1)).alias("__rows"), *aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("attribute"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("__rows").alias("row_count"),
                F.col(f"{f.name}__nn").alias("non_null"),
                (F.col("__rows") - F.col(f"{f.name}__nn")).alias("null_count"),
                F.col(f"{f.name}__nu").alias("n_unique"),
                (F.coalesce(F.col(f"{f.name}__he"), F.lit(0)) == 1).alias("has_empty"),
            )
            for f in df.schema.fields
        ]
    )
    return (
        stats.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("attribute")
    )
