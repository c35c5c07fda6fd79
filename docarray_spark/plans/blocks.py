"""Cached-block lifecycle helpers.

``DataFrame.localCheckpoint(eager=True)`` is the repo's standard way to
materialize an intermediate whose plan would otherwise read the path it is
about to overwrite (``sources/writers.merge_parquet_store``) or re-execute
per consumer. Its cost: the checkpoint's storage is a PERSISTED RDD that
``spark.catalog.clearCache()`` does NOT drop (the catalog tracks DataFrame
cache entries, not raw RDD persistence), so the blocks live until the
Python DataFrame is garbage-collected — in a long-lived serving session
that is an unbounded leak (r6 verdict, What's wrong #1/#2).

:func:`released_after` closes the loop: snapshot the JVM's persistent-RDD
registry, run the block, then explicitly unpersist every RDD the block
registered. Safe whenever nothing re-reads the checkpointed data after the
block exits (unpersisting a local checkpoint makes later recomputation
impossible by design — lineage was truncated)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently registered persistent in the JVM —
    includes ``localCheckpoint`` storage that the catalog cache API can't
    see. Driver-side metadata call, no job."""
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


@contextmanager
def released_after(spark: SparkSession):
    """Unpersist (non-blocking) every RDD the wrapped block registered —
    the explicit-release protocol for operator-internal eager checkpoints:
    materialize, consume fully INSIDE the block, release on exit. Leaves
    RDDs persisted before entry untouched, so nested same-thread operator
    caches survive.

    SINGLE-THREADED-DRIVER ASSUMPTION (ADVICE r7 #4): the diff is against
    the SESSION-GLOBAL persistent-RDD registry, so an RDD persisted by a
    CONCURRENT thread of the same SparkSession during the block window
    (a serving thread's bm25 term-slice cache, another operator's eager
    localCheckpoint) is unpersisted on exit too — and for a concurrent
    local checkpoint, whose lineage is truncated, that makes its data
    unrecoverable mid-use. The store's single-WRITER contract does not
    cover read-side queries: callers running concurrent driver threads
    against one session must serialize them around refresh/merge calls
    (or use separate sessions)."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for i in jmap.keySet().toArray():
            if int(i) not in before:
                jrdd = jmap.get(i)
                if jrdd is not None:
                    jrdd.unpersist(False)
