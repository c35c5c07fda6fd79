"""Local-execution helpers shared across operators (round-12 optimization).

Two cross-cutting costs measured at bench scale (stage-level attribution,
OPTIMIZATION_r12.md):

1. ``spark.createDataFrame(rows, schema)`` from collected Row lists builds a
   PICKLED python RDD with ``defaultParallelism`` partitions — every
   downstream reference (and every broadcast build over it) runs one Python
   worker round-trip PER PARTITION just to deserialize a handful of rows.
   A 120-row local list cost 45 CPU-seconds per materialization on a
   32-core local master; the Arrow path costs ~0.02 s and is read entirely
   JVM-side. :func:`local_table` rebuilds small collected lists through
   Arrow (guide §4.1 — cross the Python boundary in Arrow, not pickle).

2. A single small parquet file scans as ONE input split, so CPU-heavy
   map-side work (tokenize + hash expressions, Arrow UDFs) runs
   single-threaded no matter how many cores the master has.
   :func:`ensure_parallelism` spreads the raw input when (and only when)
   the source has fewer partitions than the session's parallelism — at
   real scale inputs already have thousands of splits and this no-ops
   (guide §2.5 input skew / §2.6 idle capacity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread CPU-heavy per-row work across the cluster when the source has
    fewer partitions than cores (e.g. one small parquet file). At real scale
    the input already has thousands of partitions and this no-ops.

    Call this on the RAW input, BEFORE the expensive projection: Spark puts
    the repartition exchange ABOVE existing projections, so
    ``ensure_parallelism(df.select(expensive))`` would still evaluate the
    expensive expression in the source's (possibly single) partitions."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def eager_cache(df: DataFrame) -> DataFrame:
    """Materialize an already-``persist()``-ed DataFrame NOW (one
    ``count()`` job) and return it.

    Why (r12 opt pass 2, guide §2.4/§5): a lazily-persisted subtree whose
    first consumers are the TWO map stages of a self-join is built
    CONCURRENTLY — the DAG scheduler submits both shuffle-map parents at
    once, and racing tasks each compute the still-uncached partition
    instead of one computing and one reading. Measured on a synthetic
    32-partition pandas-UDF subtree feeding a bucket self-join: 204 s of
    task time / 14.6 s wall lazy vs 31 s / 3.7 s with the cache
    materialized first — the race costs a multiple of the subtree, not a
    constant. One count() serializes the build before the join fans out;
    the extra job reads only the cache it just wrote. Callers that pass
    ``persist=False`` skip this along with the persist."""
    df.count()
    return df


def local_table(spark: SparkSession, rows, schema) -> DataFrame:
    """Rebuild a SMALL collected row list as an Arrow-backed local DataFrame.

    ``createDataFrame(rows, schema)`` parallelizes PICKLED rows across
    ``defaultParallelism`` partitions; scanning that relation spins one
    Python worker per partition per reference — measured ~45 CPU-seconds
    for a 120-row table on local[32] vs ~0.02 s through Arrow. The Arrow
    route (pyarrow.Table with the schema's exact Arrow types) is read
    JVM-side with zero Python workers and one partition per record batch.

    Values are preserved exactly: the pyarrow schema is derived from the
    Spark schema (no pandas NaN-for-NULL coercion), and any conversion
    failure falls back to the plain pickled path so behavior never
    regresses for exotic types."""
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        arrow_schema = to_arrow_schema(schema)
        dicts = [
            r.asDict(recursive=True) if isinstance(r, Row)
            else dict(zip(schema.fieldNames(), r))
            for r in rows
        ]
        tbl = pa.Table.from_pylist(dicts, schema=arrow_schema)
        # coalesce(1): createDataFrame slices the table into
        # defaultParallelism partitions — 32 near-empty tasks scheduled per
        # downstream reference for a ≤k-row table; one task reads them all
        return spark.createDataFrame(tbl, schema=schema).coalesce(1)
    except Exception:
        return spark.createDataFrame(list(rows), schema)
