"""Structured Streaming extension tests: ingest → QL filter → watermark
dedup / windowed agg → stream-static kNN (SURVEY.md §2.12)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docarray_spark.streaming import (
    read_stream,
    run_to_memory_sink,
    stream_static_match,
    streaming_dedup,
    streaming_find,
    windowed_counts,
)


@pytest.fixture(scope="module")
def landing(spark, sf_dir):
    """A landing dir seeded with the events table split into parquet files."""
    d = tempfile.mkdtemp(prefix="stream_landing_")
    from docarray_spark.sources import read_table

    read_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _schema(spark, landing):
    return spark.read.parquet(landing).schema


def test_streaming_ql_filter(spark, landing):
    sdf = read_stream(spark, landing, _schema(spark, landing))
    out = streaming_find(sdf, {"event_type": "click", "value": {"$gt": 10.0}})
    assert out.isStreaming
    run_to_memory_sink(out, "t_filter")
    got = spark.table("t_filter")
    expect = spark.read.parquet(landing).filter("event_type = 'click' AND value > 10.0")
    assert got.count() == expect.count() > 0


def test_streaming_dedup_bounded_state(spark, landing):
    sdf = read_stream(spark, landing, _schema(spark, landing))
    out = streaming_dedup(sdf, ["user_id", "event_type"], ts_col="ts")
    run_to_memory_sink(out, "t_dedup")
    got = spark.table("t_dedup")
    distinct = (
        spark.read.parquet(landing).select("user_id", "event_type").distinct().count()
    )
    assert got.count() == distinct
    assert got.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0


def test_windowed_counts(spark, landing):
    sdf = read_stream(spark, landing, _schema(spark, landing))
    # complete mode: every window's state is emitted at the end, and no
    # input row is dropped, so the result equals the batch aggregation
    out = windowed_counts(sdf, "ts", ["event_type"], window_duration="1 hour")
    run_to_memory_sink(out, "t_window", output_mode="complete")
    got = spark.table("t_window")
    assert got.count() > 0
    batch = (
        spark.read.parquet(landing)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.agg(F.sum("n")).collect()[0][0] == batch.agg(F.sum("n")).collect()[0][0]


def test_stream_static_match(spark, sf_dir, tmp_path):
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    qdir = str(tmp_path / "queries")
    corpus.filter("id < 3").write.parquet(qdir)
    stream_q = read_stream(spark, qdir, spark.read.parquet(qdir).schema)
    spark.sql("DROP TABLE IF EXISTS t_knn")
    # DROP doesn't always clear a stale managed-table location from a
    # previous test session
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/t_knn", ignore_errors=True)
    q = stream_static_match(
        stream_q, corpus, sink_table="t_knn", k=5, metric="cosine",
        query_id_col="id", corpus_id_col="id", exclude_self=True, eps=0.0,
    )
    q.awaitTermination(120)
    got = spark.table("t_knn")
    assert got.count() == 15  # 3 queries x k=5
    from docarray_spark.operators.match import match

    batch = match(
        corpus, corpus.filter("id < 3"), k=5, metric="cosine",
        corpus_id_col="id", exclude_self=True, eps=0.0,
    )
    a = {(r["query_id"], r["match_id"], r["rank"]) for r in got.collect()}
    b = {(r["query_id"], r["match_id"], r["rank"]) for r in batch.collect()}
    assert a == b


def test_stateful_running_agg(spark, landing):
    from docarray_spark.streaming import stateful_running_agg

    sdf = read_stream(spark, landing, _schema(spark, landing))
    out = stateful_running_agg(sdf, ["event_type"], "value", ts_col="ts")
    run_to_memory_sink(out, "t_state", output_mode="update")
    got = spark.table("t_state")
    # last emitted row per key must equal the batch aggregate
    batch = {
        r["event_type"]: r
        for r in spark.read.parquet(landing)
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("peak"),
        )
        .collect()
    }
    latest = {
        r["event_type"]: r
        for r in got.orderBy("n").collect()  # biggest n per key wins
    }
    assert set(latest) == set(batch)
    for k, r in latest.items():
        assert r["n"] == batch[k]["n"]
        assert r["total"] == pytest.approx(batch[k]["total"], rel=1e-9)
        assert r["peak"] == batch[k]["peak"]
