"""Unified getitem selector dispatch (reference getitem.py:48-107 routing;
semantics model: reference tests/unit/array/test_advance_indexing.py) —
every selector form must be equivalent to the direct operator call."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import getitem, traverse
from docarray_spark.operators.indexing import (
    get_by_bool_mask,
    get_by_ids,
    get_by_positions,
    select_attrs,
    slice_by_offset,
)
from docarray_spark.operators.traverse import flatten

N = 20


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:02d}", i, f"text {i}", float(i) / 10) for i in range(N)]
    return spark.createDataFrame(
        rows, "id string, offset long, text string, weight double"
    )


def _ids(df):
    return [r.id for r in df.orderBy("offset").collect()]


def test_int_offset(spark, docs):
    assert _ids(getitem(docs, 3)) == ["d03"]
    assert _ids(getitem(docs, np.int64(3))) == ["d03"]
    assert _ids(getitem(docs, -1)) == [f"d{N-1:02d}"]  # python list semantics


def test_str_id(spark, docs):
    assert _ids(getitem(docs, "d05")) == ["d05"]


def test_slice_matches_operator(spark, docs):
    for sl in (slice(2, 7), slice(None, 5), slice(3, None), slice(0, 10, 2),
               slice(-5, None), slice(None, -15)):
        got = _ids(getitem(docs, sl))
        start, stop = sl.start, sl.stop
        n = N
        start = None if start is None else (start + n if start < 0 else start)
        stop = None if stop is None else (stop + n if stop < 0 else stop)
        want = _ids(slice_by_offset(docs, start, stop, sl.step or 1))
        assert got == want, sl


def test_ellipsis_flattens(spark, docs):
    assert sorted(_ids(getitem(docs, ...))) == sorted(_ids(flatten(docs)))


def test_id_list(spark, docs):
    want = _ids(get_by_ids(docs, ["d01", "d04"]))
    assert _ids(getitem(docs, ["d01", "d04"])) == want


def test_offset_list_order_and_duplicates(spark, docs):
    # numpy fancy-indexing semantics: requested order, duplicates kept
    got = [r.id for r in getitem(docs, [5, 0, 5]).collect()]
    want = [r.id for r in get_by_positions(docs, [5, 0, 5]).collect()]
    assert got == want == ["d05", "d00", "d05"]
    got_np = [r.id for r in getitem(docs, np.array([5, 0, 5])).collect()]
    assert got_np == got


def test_bool_mask(spark, docs):
    mask = [i % 3 == 0 for i in range(N)]
    got = _ids(getitem(docs, mask))
    assert got == _ids(get_by_bool_mask(docs, mask))
    assert got == [f"d{i:02d}" for i in range(0, N, 3)]
    got_np = _ids(getitem(docs, np.array(mask)))
    assert got_np == got


def test_attr_tuples(spark, docs):
    # (slice, attr) and (slice, [attrs...])
    one = getitem(docs, (slice(0, 3), "text"))
    assert one.columns == ["text"]
    assert one.count() == 3
    two = getitem(docs, (slice(0, 3), ["text", "weight"]))
    assert two.columns == ["text", "weight"]
    want = select_attrs(slice_by_offset(docs, 0, 3), ["text", "weight"])
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, want.collect()))
    # (id-list, attr) and (int, attr)
    assert getitem(docs, (["d01", "d02"], "text")).count() == 2
    assert getitem(docs, (0, "text")).first().text == "text 0"


def test_two_str_ambiguity_rule(spark, docs):
    # second string IS an id in the frame → two-doc multi-get
    assert sorted(_ids(getitem(docs, ("d01", "d02")))) == ["d01", "d02"]
    # second string is NOT an id → attribute of the first doc
    got = getitem(docs, ("d01", "text"))
    assert got.columns == ["text"] and got.first().text == "text 1"


def test_traversal_selector(spark):
    rows = [("r0", "", 0, 0, "root"), ("r0.c0", "r0", 1, 1, "c0"),
            ("r0.c1", "r0", 1, 2, "c1")]
    nodes = spark.createDataFrame(
        rows, "id string, parent_id string, granularity int, offset long, text string"
    )
    got = sorted(r.id for r in getitem(nodes, "@c").collect())
    want = sorted(r.id for r in traverse(nodes, "c").collect())
    assert got == want == ["r0.c0", "r0.c1"]


def test_offset_derived_when_missing(spark, docs):
    # drop the order column: getitem re-derives it from id order
    noff = docs.drop("offset")
    assert [r.id for r in getitem(noff, 3).collect()] == ["d03"]
    assert sorted(r.id for r in getitem(noff, slice(0, 2)).collect()) == ["d00", "d01"]


def test_empty_and_errors(spark, docs):
    assert getitem(docs, []).count() == 0
    with pytest.raises(IndexError):
        getitem(docs, True)
    with pytest.raises(IndexError):
        getitem(docs, {1, 2})
    with pytest.raises(IndexError):
        getitem(docs, np.ones((2, 2)))
    with pytest.raises(IndexError):
        getitem(docs, slice(None, None, -1))


# ------------------------------------------------------- setitem (write twin)

def _rows(df):
    return {r.id: (r.text, r.weight) for r in df.collect()}


def test_setitem_uniform_forms(spark, docs):
    from docarray_spark.operators import setitem

    # by offset
    out = _rows(setitem(docs, 3, {"text": "X"}))
    assert out["d03"] == ("X", 0.3) and out["d04"] == ("text 4", 0.4)
    # by id
    out = _rows(setitem(docs, "d05", {"text": "Y", "weight": 9.0}))
    assert out["d05"] == ("Y", 9.0)
    # by slice
    out = _rows(setitem(docs, slice(0, 2), {"text": "Z"}))
    assert out["d00"][0] == out["d01"][0] == "Z" and out["d02"][0] == "text 2"
    # by bool mask
    mask = [i == 7 for i in range(N)]
    out = _rows(setitem(docs, mask, {"weight": 5.0}))
    assert out["d07"][1] == 5.0 and out["d06"][1] == 0.6
    # by id list / Ellipsis
    out = _rows(setitem(docs, ["d01", "d02"], {"text": "W"}))
    assert out["d01"][0] == out["d02"][0] == "W" and out["d03"][0] == "text 3"
    out = _rows(setitem(docs, ..., {"weight": 0.0}))
    assert all(v[1] == 0.0 for v in out.values())


def test_setitem_positional_document_lists(spark, docs):
    from docarray_spark.operators import setitem

    out = _rows(setitem(docs, [0, 2], [{"text": "a"}, {"text": "b"}]))
    assert out["d00"][0] == "a" and out["d02"][0] == "b" and out["d01"][0] == "text 1"
    # slice pairing; missing fields keep originals (partial-doc merge)
    out = _rows(setitem(docs, slice(1, 3), [{"weight": 1.5}, {"weight": 2.5}]))
    assert out["d01"] == ("text 1", 1.5) and out["d02"] == ("text 2", 2.5)
    # id-list pairing
    out = _rows(setitem(docs, ["d09", "d03"], [{"text": "n9"}, {"text": "n3"}]))
    assert out["d09"][0] == "n9" and out["d03"][0] == "n3"
    with pytest.raises(IndexError, match="selects 2 rows"):
        setitem(docs, [0, 2], [{"text": "only-one"}])


def test_setitem_attr_tuples(spark, docs):
    from docarray_spark.operators import setitem

    out = _rows(setitem(docs, (4, "text"), "set4"))
    assert out["d04"][0] == "set4"
    out = _rows(setitem(docs, ("d06", "weight"), 7.0))
    assert out["d06"][1] == 7.0
    out = _rows(setitem(docs, ([1, 2], "text"), ["p1", "p2"]))
    assert out["d01"][0] == "p1" and out["d02"][0] == "p2"
    out = _rows(setitem(docs, ("d08", ["text", "weight"]), ["v", 3.5]))
    assert out["d08"] == ("v", 3.5)
    with pytest.raises(IndexError, match="value list"):
        setitem(docs, ("d08", ["text", "weight"]), ["only-one"])


def test_setitem_traversal_path(spark):
    from docarray_spark.operators import setitem

    rows = [("r0", "", 0, 0, "root"), ("r0.c0", "r0", 1, 1, "c0"),
            ("r0.c1", "r0", 1, 2, "c1")]
    nodes = spark.createDataFrame(
        rows, "id string, parent_id string, granularity int, offset long, text string"
    )
    out = {r.id: r.text for r in setitem(nodes, "@c", {"text": "T"}).collect()}
    assert out == {"r0": "root", "r0.c0": "T", "r0.c1": "T"}
    out = {r.id: r.text for r in setitem(nodes, ("@c", "text"), "U").collect()}
    assert out == {"r0": "root", "r0.c0": "U", "r0.c1": "U"}
    with pytest.raises(IndexError, match="field dict"):
        setitem(nodes, "@c", [1, 2])
