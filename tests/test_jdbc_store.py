"""JDBC document store (Derby embedded — the reference's SQLite role):
bulk roundtrip, predicate pushdown into the remote query, point CRUD."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.queryset import find
from docarray_spark.sources import (
    delete_by_id_jdbc,
    derby_url,
    load_jdbc,
    save_jdbc,
    update_field_by_id_jdbc,
)


@pytest.fixture(scope="module")
def db(spark, sf_dir, tmp_path_factory):
    url = derby_url(str(tmp_path_factory.mktemp("derby") / "docstore"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    save_jdbc(docs, url, "documents", mode="overwrite")
    return url, docs


def test_jdbc_bulk_roundtrip(spark, db):
    url, docs = db
    back = load_jdbc(spark, url, "documents")
    assert back.count() == docs.count()
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_jdbc_filter_pushdown(spark, sf_dir, db):
    """The QL filter must land in the remote WHERE clause — the
    reference's backend-side pushdown (storage/annlite/find.py:46-63
    analogue), free via the JDBC data source."""
    url, _ = db
    q = find(load_jdbc(spark, url, "documents"),
             {"lang": "en", "n_chars": {"$gte": 100}})
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "LANG" in plan.upper() and "N_CHARS" in plan.upper()
    # value check against the parquet source
    src = find(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        {"lang": "en", "n_chars": {"$gte": 100}},
    )
    assert q.count() == src.count() > 0


def test_jdbc_partitioned_read(spark, db):
    url, docs = db
    n = docs.count()
    par = load_jdbc(
        spark, url, "documents", partition_column="doc_id",
        num_partitions=4, lower_bound=0, upper_bound=n,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == n


def test_jdbc_point_crud(spark, db):
    url, _ = db
    assert update_field_by_id_jdbc(
        spark, url, "documents", "doc_id", 7, "lang", "xx"
    ) == 1
    got = load_jdbc(spark, url, "documents").filter("doc_id = 7").first()
    assert got.lang == "xx"
    assert delete_by_id_jdbc(spark, url, "documents", "doc_id", 7) == 1
    assert load_jdbc(spark, url, "documents").filter("doc_id = 7").count() == 0


def test_jdbc_point_crud_parameterized(spark, db):
    """ADVICE r3: ids/values with quotes are DATA — prepared-statement
    binding, not string interpolation. Also: bool/None values bind typed."""
    url, _ = db
    # a string VALUE containing an apostrophe and SQL-looking text
    assert update_field_by_id_jdbc(
        spark, url, "documents", "doc_id", 11, "lang",
        "x'; DELETE FROM documents; --",
    ) == 1
    got = load_jdbc(spark, url, "documents").filter("doc_id = 11").first()
    assert got.lang == "x'; DELETE FROM documents; --"
    assert load_jdbc(spark, url, "documents").count() > 1  # nothing else deleted
    # NULL value binds as NULL, not the string 'None'
    assert update_field_by_id_jdbc(
        spark, url, "documents", "doc_id", 11, "lang", None
    ) == 1
    assert load_jdbc(spark, url, "documents").filter("doc_id = 11").first().lang is None
    # identifier injection is rejected, not executed
    with pytest.raises(Exception):
        delete_by_id_jdbc(spark, url, 'documents" WHERE 1=1 --', "doc_id", 1)


def test_jdbc_string_id_with_quote(spark, tmp_path):
    """A doc id containing an apostrophe round-trips through point CRUD."""
    url = derby_url(str(tmp_path / "qdb"))
    df = spark.createDataFrame(
        [("o'brien", 1), ("plain", 2)], "id string, v int"
    )
    save_jdbc(df, url, "t", mode="overwrite")
    assert update_field_by_id_jdbc(spark, url, "t", "id", "o'brien", "v", 9) == 1
    assert load_jdbc(spark, url, "t").filter(F.col("id") == "o'brien").first().v == 9
    assert delete_by_id_jdbc(spark, url, "t", "id", "o'brien") == 1
    assert load_jdbc(spark, url, "t").count() == 1


def test_stream_upsert_jdbc_merge_semantics(spark, tmp_path):
    """Streaming upsert (foreachBatch MERGE pattern): two landing files
    processed as separate micro-batches; the second batch's rows replace
    the first's for overlapping ids and append for new ones."""
    import json
    import time

    from docarray_spark.sources.jdbc_store import load_jdbc
    from docarray_spark.streaming.ops import stream_upsert_jdbc

    url = derby_url(str(tmp_path / "updb"))
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.json").write_text(
        "\n".join(json.dumps({"id": i, "v": f"old{i}", "seq": 1}) for i in range(5))
    )
    time.sleep(1.1)  # distinct mod times -> deterministic batch order
    (landing / "b.json").write_text(
        "\n".join(json.dumps({"id": i, "v": f"new{i}", "seq": 2}) for i in range(3, 8))
    )
    sdf = (
        spark.readStream.schema("id long, v string, seq int")
        .option("maxFilesPerTrigger", 1)   # one file per micro-batch
        .json(str(landing))
    )
    q = stream_upsert_jdbc(
        sdf, url, "updocs", id_col="id",
        checkpoint=str(tmp_path / "ckpt"), order_col="seq",
    )
    q.awaitTermination()
    rows = {r.id: r.v for r in load_jdbc(spark, url, "updocs").collect()}
    assert rows == {
        0: "old0", 1: "old1", 2: "old2",          # batch-1 only
        3: "new3", 4: "new4",                     # overlap: batch 2 wins
        5: "new5", 6: "new6", 7: "new7",          # batch-2 only
    }


def test_stream_upsert_delete_failure_reraises(spark, tmp_path, monkeypatch):
    """A DELETE failure against an EXISTING table must fail the batch —
    never swallow-and-append (round-5 verdict #2: swallowing a transient
    chunk-0 failure would duplicate every id in the batch). The
    table-missing case is detected by catalog probe, not by exception."""
    import json

    from docarray_spark.sources import jdbc_store
    from docarray_spark.streaming.ops import stream_upsert_jdbc

    url = derby_url(str(tmp_path / "faildb"))
    base = spark.createDataFrame(
        [(i, f"old{i}") for i in range(5)], "id long, v string"
    )
    save_jdbc(base, url, "updocs", mode="overwrite")
    assert jdbc_store.jdbc_table_exists(spark, url, "updocs")
    assert not jdbc_store.jdbc_table_exists(spark, url, "no_such_table")

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.json").write_text(
        "\n".join(json.dumps({"id": i, "v": f"new{i}"}) for i in range(3))
    )

    def boom(*a, **k):
        raise RuntimeError("simulated transient DELETE failure")

    monkeypatch.setattr(jdbc_store, "jdbc_execute", boom)
    sdf = spark.readStream.schema("id long, v string").json(str(landing))
    q = stream_upsert_jdbc(
        sdf, url, "updocs", id_col="id", checkpoint=str(tmp_path / "ckpt")
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="simulated transient"):
        q.awaitTermination()

    # the batch failed atomically: no appends landed, so no duplicate ids
    # and the pre-existing rows are untouched
    rows = sorted((r.id, r.v) for r in load_jdbc(spark, url, "updocs").collect())
    assert rows == [(i, f"old{i}") for i in range(5)]
