"""Parquet/CSV/ndjson sources.

Replaces the reference's generator-based ingestion
(``/root/reference/docarray/document/generators.py``) with Spark's native
readers — columnar, splittable, predicate-pushdown-capable.

``read_parquet`` additionally handles TIMESTAMP(NANOS) parquet columns,
which Spark rejects by default: it flips
``spark.sql.legacy.parquet.nanosAsLong`` and rebuilds a micro-precision
timestamp column (integer-division truncation, matching DuckDB/pyarrow
semantics) so downstream operators see a plain ``timestamp`` type.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nano_ts_columns(path: str) -> list[str]:
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-provided tables from a scale-factor dir."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def read_csv_documents(
    spark: SparkSession,
    path: str,
    field_resolver: dict[str, str] | None = None,
    known_fields: set[str] | None = None,
) -> DataFrame:
    """``DocumentArray.from_csv`` analogue (``document/generators.py:127-176``):
    header-driven CSV where resolved columns map onto document fields and
    unknown columns overflow into a ``tags`` map (the reference's "catch"
    handler, ``docarray/base.py:40-66``)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    if field_resolver:
        df = df.withColumnsRenamed(field_resolver)
    if known_fields is not None:
        extra = [c for c in df.columns if c not in known_fields]
        if extra:
            kv = []
            for c in extra:
                kv += [F.lit(c), F.col(c).cast("string")]
            df = df.withColumn("tags", F.map_from_arrays(
                F.array(*[F.lit(c) for c in extra]),
                F.array(*[F.col(c).cast("string") for c in extra]),
            )).drop(*extra)
    return df


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """``from_ndjson`` analogue (``document/generators.py:237-309``)."""
    return spark.read.json(path)


def read_files(spark: SparkSession, glob: str, recursive: bool = True) -> DataFrame:
    """``from_files`` analogue (``document/generators.py:56-124``): glob →
    rows of (path→uri, content→blob, length, modificationTime)."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(glob)
        .select(
            F.col("path").alias("uri"),
            F.col("content").alias("blob"),
            F.col("length"),
            F.col("modificationTime").alias("modification_time"),
        )
    )
