"""Filter-QL truth-table tests, modeled on the reference's
tests/unit/array/mixins/test_filter.py fixture style."""

import pytest
from pyspark.sql import Row

from docarray_spark import compile_filter, find


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(id="r1", text="hello", weight=1.0, tags_x=0.3, tags_name="hello",
            embedding=[1.0, 2.0], tags={"k": "v"}),
        Row(id="r2", text="world", weight=2.0, tags_x=0.6, tags_name="world",
            embedding=[1.0, 2.0, 3.0], tags={}),
        Row(id="r3", text="", weight=3.0, tags_x=None, tags_name="foo",
            embedding=None, tags=None),
        Row(id="r4", text=None, weight=4.0, tags_x=0.9, tags_name=None,
            embedding=[], tags={"a": "1", "b": "2"}),
        Row(id="r5", text="hello world", weight=5.0, tags_x=0.1, tags_name="hello",
            embedding=[0.0], tags={"k": "x"}),
    ]
    return spark.createDataFrame(rows)


def ids(df, cond, **kw):
    return sorted(r.id for r in find(df, cond, **kw).select("id").collect())


def test_comparisons(docs):
    assert ids(docs, {"weight": {"$gt": 3}}) == ["r4", "r5"]
    assert ids(docs, {"weight": {"$gte": 3, "$lt": 5}}) == ["r3", "r4"]
    assert ids(docs, {"weight": {"$eq": 1.0}}) == ["r1"]
    assert ids(docs, {"weight": {"$neq": 1.0}}) == ["r2", "r3", "r4", "r5"]
    # bare value is $eq
    assert ids(docs, {"text": "hello"}) == ["r1"]


def test_null_excluded_from_comparison(docs):
    # tags_x NULL rows never satisfy a positive comparison
    assert ids(docs, {"tags_x": {"$lte": 0.6}}) == ["r1", "r2", "r5"]


def test_in_nin(docs):
    assert ids(docs, {"tags_name": {"$in": ["hello", "foo"]}}) == ["r1", "r3", "r5"]
    # $nin includes rows where the field is missing (reference two-valued NOT)
    assert ids(docs, {"tags_name": {"$nin": ["hello", "foo"]}}) == ["r2", "r4"]


def test_regex_size_exists(docs):
    assert ids(docs, {"text": {"$regex": "^h"}}) == ["r1", "r5"]
    assert ids(docs, {"embedding": {"$size": 3}}) == ["r2"]
    # empty string / empty array / NULL count as not-exists
    assert ids(docs, {"text": {"$exists": True}}) == ["r1", "r2", "r5"]
    assert ids(docs, {"text": {"$exists": False}}) == ["r3", "r4"]
    assert ids(docs, {"embedding": {"$exists": True}}) == ["r1", "r2", "r5"]
    assert ids(docs, {"tags": {"$exists": True}}) == ["r1", "r4", "r5"]


def test_logic_combinators(docs):
    assert ids(docs, {"$or": [{"weight": {"$lt": 2}}, {"tags_name": "foo"}]}) == ["r1", "r3"]
    assert ids(docs, {"$and": [{"weight": {"$gte": 2}}, {"text": {"$regex": "o"}}]}) == ["r2", "r5"]
    # $not over a missing field is True (reference interpreter semantics)
    assert ids(docs, {"$not": {"tags_x": {"$gt": 0.5}}}) == ["r1", "r3", "r5"]
    # implicit AND across fields
    assert ids(docs, {"tags_name": "hello", "weight": {"$gt": 2}}) == ["r5"]


def test_placeholder_field_vs_field(docs):
    assert ids(docs, {"text": {"$eq": "{tags__name}"}}) == ["r1", "r2"]


def test_dunder_paths(docs):
    # tags__name resolves to typed column tags_name
    assert ids(docs, {"tags__name": "foo"}) == ["r3"]
    # map access
    assert ids(docs, {"tags__k": "v"}) == ["r1"]


def test_django_style_leaves(docs):
    assert ids(docs, {"text__icontains": "HELLO"}) == ["r1", "r5"]
    assert ids(docs, {"text__startswith": "hello"}) == ["r1", "r5"]
    assert ids(docs, {"text__endswith": "world"}) == ["r2", "r5"]


def test_limit(docs):
    assert len(find(docs, {"weight": {"$gt": 0}}, limit=2).collect()) == 2


def test_compile_returns_column(docs):
    col = compile_filter(docs, {"weight": {"$gt": 3}})
    assert docs.filter(col).count() == 2


def test_errors(docs):
    with pytest.raises(ValueError):
        compile_filter(docs, {})
    with pytest.raises(ValueError):
        compile_filter(docs, {"weight": {"$bogus": 1}})
    with pytest.raises(ValueError):
        compile_filter(docs, {"nope__deep": 1})


def test_tags_json_dynamic_column(spark):
    """FIXTURES.md dynamic-tags: tags__k resolves into a tags_json string
    column via get_json_object, with numeric coercion on compare."""
    from docarray_spark.queryset import find

    df = spark.createDataFrame(
        [
            (1, '{"x": 0.7, "name": "hello"}'),
            (2, '{"x": 0.1}'),
            (3, '{"name": "world"}'),
            (4, None),
        ],
        "id int, tags_json string",
    )
    assert {r["id"] for r in find(df, {"tags__x": {"$gte": 0.5}}).collect()} == {1}
    assert {r["id"] for r in find(df, {"tags__name": "hello"}).collect()} == {1}
    assert {r["id"] for r in find(df, {"$not": {"tags__x": {"$gte": 0.5}}}).collect()} == {2, 3, 4}


def test_reference_filter_truth_table(spark):
    """The reference's 5-doc filter fixture and assertions, ported verbatim
    (tests/unit/array/mixins/test_filter.py:6-90): text/tags set as there,
    tags as a string map exercising numeric coercion."""
    from docarray_spark.queryset import find

    rows = [
        (0, "hello", None, {"name": "hello"}),
        (1, "world", None, {"name": "hello"}),
        (2, None, None, {"x": "0.3", "y": "0.6"}),
        (3, None, None, {"x": "0.8"}),
        (4, None, None, {}),
    ]
    df = spark.createDataFrame(
        rows, "idx int, text string, tensor array<float>, tags map<string,string>"
    )

    def ids(q):
        return sorted(r["idx"] for r in find(df, q).collect())

    assert ids({}) == [0, 1, 2, 3, 4]                      # empty filter
    assert ids({"text": {"$eq": "hello"}}) == [0]
    assert ids({"tags__x": {"$gte": 0.5}}) == [3]
    assert ids({"tags__name": {"$regex": "^h"}}) == [0, 1]
    assert ids({"text": {"$regex": "^h"}}) == [0]
    assert ids({"tags": {"$size": 2}}) == [2]
    assert ids({"text": {"$exists": True}}) == [0, 1]
    assert ids({"tensor": {"$exists": True}}) == []
    # dict-form combinators (test_filter.py:57-79)
    assert ids({"$or": {"tags__x": {"$gte": 0.1}, "tags__y": {"$gte": 0.5}}}) == [2, 3]
    assert ids({"tags__x": {"$gte": 0.1, "$lte": 0.5}}) == [2]
    assert ids({"$and": {"tags__x": {"$gte": 0.1}, "tags__y": {"$gte": 0.5}}}) == [2]
    assert ids({"$not": {"tags__x": {"$gte": 0.5}}}) == [0, 1, 2, 4]
    assert ids({"$not": {"tags__x": {"$gte": 0.1}, "tags__y": {"$gte": 0.5}}}) == [0, 1, 3, 4]
    assert ids({"text": {"$eq": "{tags__name}"}}) == [0]   # placeholder
