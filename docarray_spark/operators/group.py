"""Grouping / sampling / batching — ``array/mixins/group.py`` and
``sample.py`` re-expressed on DataFrames.

Order semantics: the reference's DocumentArray is ordered; every operator
here preserves or defines order through an explicit ``offset`` column
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docarray_spark.queryset.compiler import resolve_field


def split_by_tag(df: DataFrame, tag: str, group_col: str = "group_key") -> DataFrame:
    """``split_by_tag`` (``group.py:17-39``): annotate every row with its
    (possibly dunder-nested) tag value as a group key. Downstream per-group
    processing stays distributed (groupBy / applyInPandas on the key)."""
    col, _ = resolve_field(df, tag)
    return df.withColumn(group_col, col)


def group_counts(df: DataFrame, tag: str) -> DataFrame:
    """Per-group sizes + first-seen order (order preservation within the
    group model of ``group.py:22-27``)."""
    col, _ = resolve_field(df, tag)
    order = F.min("offset") if "offset" in df.columns else F.lit(None)
    return (
        df.groupBy(col.alias("group_key"))
        .agg(F.count(F.lit(1)).alias("n"), order.alias("first_offset"))
    )


def sample(df: DataFrame, k: int, seed: int | None = None) -> DataFrame:
    """Uniform sample without replacement, exact k (``sample.py:11-29``)."""
    return df.orderBy(F.rand(seed)).limit(k)


def shuffle(df: DataFrame, seed: int | None = None) -> DataFrame:
    """Random permutation (``sample.py:31-39``). A full sort by rand() —
    at scale prefer ``repartition`` randomness unless a total order is
    required."""
    return df.orderBy(F.rand(seed))


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic, engine-portable sample (extension): keep rows whose
    md5(id) falls below the fraction threshold. Unlike rand(), reproducible
    across engines/runs/partitionings — the property that matters for a
    100 TB pipeline you re-run incrementally."""
    threshold = format(int(fraction * 16**8), "08x")
    return df.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < F.lit(threshold)
    )


def with_batch_id(df: DataFrame, batch_size: int, offset_col: str = "offset") -> DataFrame:
    """``batch(batch_size)`` (``group.py:41-95``) as a column: batch_id =
    floor(offset / b). ceil(N/b) batches, last one partial."""
    return df.withColumn("batch_id", F.floor(F.col(offset_col) / batch_size).cast("long"))


def map_batch(
    df: DataFrame,
    fn: Callable,
    output_schema,
    batch_size: int = 1024,
) -> DataFrame:
    """``map_batch`` / ``apply_batch`` (``array/mixins/parallel.py:117-217``):
    per-minibatch pandas function, Arrow-batched — ``mapInPandas`` is the
    exact analogue; batch size is enforced via the Arrow batch config."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def _runner(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_runner, output_schema)


def apply_grouped(
    df: DataFrame,
    keys: list[str],
    fn: Callable,
    output_schema,
) -> DataFrame:
    """Per-group pandas function (the UDAF/grouped-map surface SURVEY §2.11
    notes the reference lacks): ``groupBy(keys).applyInPandas`` — each group
    arrives as one pandas frame on one executor. One hash shuffle on the
    keys; group size must fit an executor (use salting for hot keys,
    ``operators/skew.py``)."""
    return df.groupBy(*keys).applyInPandas(fn, output_schema)


def add_offset(df: DataFrame, order_by=None) -> DataFrame:
    """(Re)build the order index — ``offset2ids`` analogue
    (``storage/base/helper.py``). With ``order_by``: a deterministic total
    order; without: current partition order (cheap, zipWithIndex-style)."""
    if order_by is not None:
        w = Window.orderBy(*order_by if isinstance(order_by, (list, tuple)) else [order_by])
        return df.withColumn("offset", F.row_number().over(w) - 1)
    rdd = df.rdd.zipWithIndex()
    spark = df.sparkSession
    schema = df.schema.add("offset", "long")
    return spark.createDataFrame(rdd.map(lambda t: (*t[0], t[1])), schema)
