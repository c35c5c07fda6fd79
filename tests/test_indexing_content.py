"""Advanced indexing / CRUD and content-function tests (reference:
tests/unit/array/test_advance_indexing.py, tests/unit/document/test_convert).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docarray_spark.functions.content import (
    any_hash_col,
    blob_to_tensor_udf,
    content_type_col,
    feature_hash,
    tensor_to_blob_udf,
    to_datauri_col,
)
from docarray_spark.operators.indexing import (
    delete_where,
    dunder_col,
    get_by_ids,
    get_by_offsets,
    pop_attrs,
    select_attrs,
    set_attrs_where,
    slice_by_offset,
    update_by_id,
    with_row_offset,
)

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("offset", F.col("doc_id"))
    )


def test_slice_semantics(spark, docs):
    n = docs.count()
    assert slice_by_offset(docs, 3, 10).count() == 7
    got = sorted(
        r.offset for r in slice_by_offset(docs, 3, 20, step=4).select("offset").collect()
    )
    assert got == list(range(3, 20, 4))
    assert slice_by_offset(docs, None, 5).count() == 5
    assert slice_by_offset(docs, n - 2, None).count() == 2


def test_get_by_offsets_and_ids(spark, docs):
    assert get_by_offsets(docs, [0, 2, 5]).count() == 3
    assert get_by_ids(docs, [1, 3], id_col="doc_id").count() == 2
    big = list(range(1500))  # exercises the semi-join path
    assert get_by_ids(docs, big, id_col="doc_id").count() == min(1500, docs.count())


def test_dunder_path_resolution(spark):
    df = spark.createDataFrame(
        [(1, {"cosine": {"value": 0.5}}, {"x": "7"})],
        "id int, scores map<string, map<string,double>>, tags map<string,string>",
    )
    out = select_attrs(df, ["scores__cosine__value", "tags__x"], keep=["id"])
    row = out.collect()[0]
    assert row["scores__cosine__value"] == 0.5
    assert row["tags__x"] == "7"
    # direct column wins over dunder split
    df2 = df.withColumn("tags__x", F.lit("direct"))
    assert df2.select(dunder_col(df2, "tags__x")).collect()[0][0] == "direct"


def test_set_pop_delete(spark, docs):
    out = set_attrs_where(docs, F.col("doc_id") == 0, text=F.lit("NEW"))
    assert out.filter("doc_id = 0").collect()[0]["text"] == "NEW"
    assert (
        out.filter("doc_id = 1").collect()[0]["text"]
        == docs.filter("doc_id = 1").collect()[0]["text"]
    )
    popped = pop_attrs(docs, ["lang"])
    assert popped.filter(F.col("lang").isNotNull()).count() == 0
    assert popped.schema["lang"].dataType.typeName() == "string"
    kept = delete_where(docs, F.col("doc_id") < 10)
    assert kept.count() == docs.count() - 10


def test_update_by_id_priority(spark):
    base = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "id int, t string, n int")
    upd = spark.createDataFrame([(2, "B2")], "id int, t string")
    out = {r["id"]: r for r in update_by_id(base, upd).collect()}
    assert out[2]["t"] == "B2" and out[2]["n"] == 20
    assert out[1]["t"] == "a"


def test_with_row_offset(spark, docs):
    shuffled = docs.orderBy(F.rand(7)).drop("offset")
    re = with_row_offset(shuffled, ["doc_id"])
    rows = re.select("doc_id", "offset").orderBy("offset").collect()
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)
    assert rows[0]["offset"] == 0


def test_blob_tensor_roundtrip(spark):
    vecs = [np.arange(4, dtype=np.float32), np.array([1.5, -2.5], dtype=np.float32)]
    df = spark.createDataFrame([(v.tobytes(),) for v in vecs], "blob binary")
    dec = df.select(blob_to_tensor_udf("float32")("blob").alias("tensor"))
    got = [np.array(r["tensor"], dtype=np.float32) for r in dec.collect()]
    for g, v in zip(sorted(got, key=len), sorted(vecs, key=len)):
        np.testing.assert_array_equal(g, v)
    rt = dec.select(tensor_to_blob_udf("float32")("tensor").alias("blob"))
    back = {r["blob"] for r in rt.collect()}
    assert back == {v.tobytes() for v in vecs}


def test_datauri_and_content_type(spark):
    df = spark.createDataFrame([("hi", None, None)], "text string, blob binary, tensor array<float>")
    uri = df.select(to_datauri_col(F.col("text").cast("binary"), F.lit("text/plain")).alias("u"))
    assert uri.collect()[0]["u"] == "data:text/plain;base64,aGk="
    ct = df.select(content_type_col(F.col("text"), F.col("blob"), F.col("tensor")).alias("c"))
    assert ct.collect()[0]["c"] == "text"


def test_feature_hash_deterministic(spark):
    df = spark.createDataFrame([(1, "a b a"), (2, "")], "id int, text string")
    out = feature_hash(df, id_col="id", n_dims=8, out_col="v")
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert sum(rows[1]) == 3.0  # 3 tokens total
    assert len(rows[1]) == 8
    assert rows[2] is None or sum(rows[2] or []) == 0


def test_any_hash(spark):
    df = spark.createDataFrame([("42",), ("-7",), ("foo",)], "v string")
    got = [r[0] for r in df.select(any_hash_col("v")).collect()]
    assert got[0] == 42 and got[1] == -7
    assert isinstance(got[2], int) and got[2] != 0


def test_get_by_bool_mask(spark, docs):
    from docarray_spark.operators import get_by_bool_mask

    mask = [i % 3 == 0 for i in range(100)]
    out = get_by_bool_mask(docs, mask)
    assert sorted(r.offset for r in out.collect()) == [i for i in range(100) if i % 3 == 0]


def test_get_by_positions_order_and_duplicates(spark, docs):
    """numpy fancy-indexing semantics: requested order, duplicates kept."""
    from docarray_spark.operators import get_by_positions

    out = get_by_positions(docs, [5, 0, 5, 42])
    assert [r.offset for r in out.collect()] == [5, 0, 5, 42]
