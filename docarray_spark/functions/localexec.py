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

import math
import os

from pyspark.sql import DataFrame, Row, SparkSession

# split-estimate memo: (files, target) → decision. Only consulted on the
# stat path (fewer input files than cores), so keys stay tiny; entries that
# call ensure_parallelism on the same scan several times per query
# construction pay the file stat once per process.
_SPLIT_DECISION_CACHE: dict = {}


def _file_size(spark: SparkSession, uri: str) -> int | None:
    local = uri
    if local.startswith("file:"):
        local = local[5:]
        while local.startswith("//"):
            local = local[1:]
    try:
        return os.path.getsize(local)
    except OSError:
        pass
    try:  # non-local filesystems: one Hadoop FS call per file (≤ cores files)
        jvm = spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return int(fs.getFileStatus(path).getLen())
    except Exception:
        return None


def _scan_info(df: DataFrame, target: int) -> tuple[int, int] | None:
    """(estimated scan splits, total input bytes) for a file-backed
    DataFrame, via Spark's own split-packing formula (maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalWeightedBytes /
    parallelism))).

    This replaces the old ``df.rdd.getNumPartitions()`` probe, which forced
    a full plan→RDD conversion on the driver per call and pinned the
    pre-AQE partitioning (VERDICT r12 #8) — on a 100 TB table with a complex
    upstream plan that conversion is a non-trivial driver-side analysis pass
    per query construction. Files are only stat'ed when there are fewer
    files than ``target`` (never at real scale, where thousands of files
    short-circuit the answer), and results are memoized per process.

    Returns None when the answer is unknowable cheaply (no file-backed
    leaves, e.g. a local relation) — those sources are already created with
    ``defaultParallelism`` slices, so callers treat None as 'no-op'."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= target:
        # enough splits regardless of size; bytes unknown without stat'ing,
        # report 'large' so proportional callers also no-op
        return (len(files), 1 << 62)
    key = tuple(files)
    hit = _SPLIT_DECISION_CACHE.get(key)
    if hit is not None:
        return hit
    spark = df.sparkSession
    try:
        sqlconf = spark._jsparkSession.sessionState().conf()
        max_split = int(sqlconf.filesMaxPartitionBytes())
        open_cost = int(sqlconf.filesOpenCostInBytes())
    except Exception:
        max_split, open_cost = 128 * 1024 * 1024, 4 * 1024 * 1024
    sizes = [_file_size(spark, f) for f in files]
    if any(s is None for s in sizes):
        return None
    total = sum(sizes)
    weighted = total + open_cost * len(files)
    bytes_per_core = weighted / max(1, spark.sparkContext.defaultParallelism)
    split = min(max_split, max(open_cost, bytes_per_core))
    est = max(1, math.ceil(weighted / split))
    info = (est, total)
    _SPLIT_DECISION_CACHE[key] = info
    return info


def ensure_parallelism(
    df: DataFrame,
    min_parts: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Spread CPU-heavy per-row work across the cluster when the source has
    fewer input splits than cores (e.g. one small parquet file). At real
    scale the input already has thousands of splits and this no-ops —
    without touching ``df.rdd`` (see :func:`_scan_info`).

    ``bytes_per_task`` makes the repartition width SCALE-ADAPTIVE instead
    of all-or-nothing: the requested width becomes
    ``clamp(ceil(input_bytes / bytes_per_task), 1, cores)``, so a tiny
    input stays in one partition (no exchange, no per-partition Python
    round-trips) while a single-big-file input still fans out. Pick it
    from the operator's CPU density: sites whose per-byte work is extreme
    (md5 per k-gram winnowing, the gopher repetition signals) leave it
    unset — full fan-out even for small files, the measured r12 wins —
    while tokenize+aggregate sites use ~1 MB/task (r13 matched A/B:
    one 25 MB file → 2.1× faster WITH the fan-out; one 0.6 MB file →
    ~0.15 s slower with it; the proportional width keeps both wins).

    Call this on the RAW input, BEFORE the expensive projection: Spark puts
    the repartition exchange ABOVE existing projections, so
    ``ensure_parallelism(df.select(expensive))`` would still evaluate the
    expensive expression in the source's (possibly single) partitions."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    info = _scan_info(df, target)
    if info is None:
        return df
    est, total = info
    desired = target
    if bytes_per_task:
        desired = min(target, max(1, math.ceil(total / bytes_per_task)))
    if est < desired and desired > 1:
        return df.repartition(desired)
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
