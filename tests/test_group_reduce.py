"""split_by_tag / sample / batch / reduce merge semantics
(reference test_group.py, test_sample.py, test_reduce.py analogues)."""

import math

import pytest
from pyspark.sql import Row, functions as F

from docarray_spark.operators import (
    add_offset,
    concat,
    contains_ids,
    delete_by_ids,
    group_counts,
    hash_sample,
    map_batch,
    reduce_docs,
    sample,
    shuffle,
    split_by_tag,
    with_batch_id,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(id=f"d{i}", offset=i, group=f"g{i % 4}", weight=float(i), tags={"k": f"g{i % 3}"})
        for i in range(100)
    ]
    return spark.createDataFrame(rows)


def test_split_by_tag_and_counts(spark, docs):
    out = split_by_tag(docs, "group")
    assert out.filter(F.col("group_key") == "g1").count() == 25
    counts = {r.group_key: r.n for r in group_counts(docs, "group").collect()}
    assert counts == {f"g{i}": 25 for i in range(4)}
    # dunder nested tag (group.py:32-33)
    nested = {r.group_key: r.n for r in group_counts(docs, "tags__k").collect()}
    assert nested == {"g0": 34, "g1": 33, "g2": 33}


def test_sample_shuffle(spark, docs):
    s1 = sample(docs, 10, seed=7).collect()
    s2 = sample(docs, 10, seed=7).collect()
    assert len(s1) == 10
    assert [r.id for r in s1] == [r.id for r in s2]  # seed reproducibility
    sh = shuffle(docs, seed=3).collect()
    assert sorted(r.id for r in sh) == sorted(f"d{i}" for i in range(100))  # permutation


def test_hash_sample_deterministic(spark, docs):
    a = sorted(r.id for r in hash_sample(docs, "id", 0.3).collect())
    b = sorted(r.id for r in hash_sample(docs, "id", 0.3).collect())
    assert a == b
    assert 10 < len(a) < 60  # ~30 of 100


def test_batch(spark, docs):
    out = with_batch_id(docs, 32)
    sizes = {r.batch_id: r.n for r in out.groupBy("batch_id").agg(F.count("*").alias("n")).collect()}
    assert sizes == {0: 32, 1: 32, 2: 32, 3: 4}  # ceil(100/32)=4, last partial


def test_map_batch(spark, docs):
    def double_weight(pdf):
        pdf = pdf[["id", "weight"]].copy()
        pdf["weight"] = pdf["weight"] * 2
        return pdf

    out = map_batch(docs, double_weight, "id string, weight double", batch_size=16)
    got = {r.id: r.weight for r in out.collect()}
    assert got["d7"] == 14.0 and len(got) == 100


def test_reduce_merge_by_id(spark):
    left = spark.createDataFrame(
        [("a", "t1", None), ("b", None, 2.0)], "id string, text string, weight double"
    )
    right = spark.createDataFrame(
        [("b", "t2", 9.0), ("c", "t3", 3.0)], "id string, text string, weight double"
    )
    got = {r.id: (r.text, r.weight) for r in reduce_docs(left, right).collect()}
    # left priority on shared ids; right fills unset fields
    assert got == {"a": ("t1", None), "b": ("t2", 2.0), "c": ("t3", 3.0)}


def test_reduce_disjoint_columns(spark):
    left = spark.createDataFrame([("a", "t1")], "id string, text string")
    right = spark.createDataFrame([("a", 5.0), ("b", 6.0)], "id string, weight double")
    got = {r.id: (r.text, r.weight) for r in reduce_docs(left, right).collect()}
    assert got == {"a": ("t1", 5.0), "b": (None, 6.0)}


def test_concat_delete_contains(spark, docs):
    assert concat(docs, docs).count() == 200
    assert delete_by_ids(docs, ["d0", "d1"]).count() == 98
    sub = spark.createDataFrame([("d5",), ("d6",), ("nope",)], "id string")
    assert delete_by_ids(docs, sub).count() == 98
    assert contains_ids(docs, ["d5", "nope"]).count() == 1
    assert contains_ids(docs, sub).count() == 2


def test_add_offset(spark, docs):
    df = docs.drop("offset")
    out = add_offset(df, order_by=F.col("id"))
    rows = out.orderBy("offset").collect()
    assert rows[0].offset == 0 and rows[0].id == "d0"
    assert out.count() == 100
    out2 = add_offset(df)
    assert sorted(r.offset for r in out2.collect()) == list(range(100))


def test_apply_grouped(spark, sf_dir):
    import pandas as pd

    from docarray_spark.operators import apply_grouped

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [[pdf["source"].iloc[0], len(pdf), int(pdf["n_chars"].sum())]],
            columns=["source", "n", "chars"],
        )

    got = {
        r["source"]: r
        for r in apply_grouped(
            docs, ["source"], summarize, "source string, n long, chars long"
        ).collect()
    }
    want = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"] and got[k]["chars"] == want[k]["chars"]


def test_map_docs_per_doc(spark, docs):
    """Per-doc map(func)/apply parity (reference parallel.py:56-115): the
    row-wise wrapper over the same Arrow-batched mechanism."""
    from docarray_spark.operators import map_docs

    out = map_docs(
        docs.select("id", "weight"),
        lambda row: {"id": row["id"], "w2": row["weight"] * 2.0},
        "id string, w2 double",
        batch_size=16,
    )
    got = {r.id: r.w2 for r in out.collect()}
    assert got == {f"d{i}": 2.0 * i for i in range(100)}


def test_distributed_row_number_matches_global_window(spark, docs):
    """Two-phase rank == global-window row_number on a unique sort key."""
    from pyspark.sql import Window

    from docarray_spark.operators import distributed_row_number

    got = distributed_row_number(
        docs, [F.col("weight").desc(), F.col("id").asc()], out_col="rn",
        num_partitions=7,
    )
    w = Window.orderBy(F.col("weight").desc(), F.col("id").asc())
    want = docs.withColumn("rn", F.row_number().over(w))
    assert {(r.id, r.rn) for r in got.select("id", "rn").collect()} == {
        (r.id, r.rn) for r in want.select("id", "rn").collect()
    }


def test_map_batch_does_not_mutate_session_conf(spark, docs):
    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    from docarray_spark.operators import map_batch

    sizes = map_batch(
        docs.select("id"),
        lambda pdf: pdf.assign(n=len(pdf))[["id", "n"]],
        "id string, n long",
        batch_size=8,
    ).collect()
    assert max(r.n for r in sizes) <= 8
    assert spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == before


def test_reduce_all_recursive_semantics(spark):
    """Recursive reduce (reference reduce.py:47-91) on two 2-level trees:
    chunk-level left-priority merge, right-only subtrees appended whole."""
    from pyspark.sql import Row

    from docarray_spark.operators import reduce_all

    left = spark.createDataFrame([
        Row(id="a", parent_id="", granularity=0, text="A", w=1.0),
        Row(id="a.0", parent_id="a", granularity=1, text="Ac", w=None),
    ])
    right = spark.createDataFrame([
        Row(id="a", parent_id="", granularity=0, text="XX", w=9.0),
        Row(id="a.0", parent_id="a", granularity=1, text="Yc", w=5.0),
        Row(id="a.1", parent_id="a", granularity=1, text="Zc", w=6.0),
        Row(id="b", parent_id="", granularity=0, text="B", w=7.0),
        Row(id="b.0", parent_id="b", granularity=1, text="Bc", w=8.0),
    ])
    nodes, _ = reduce_all(left, right)
    got = {r.id: (r.text, r.w) for r in nodes.collect()}
    assert got == {
        "a": ("A", 1.0),      # both: left priority
        "a.0": ("Ac", 5.0),   # chunk-level merge: left text, right fills null w
        "a.1": ("Zc", 6.0),   # right-only chunk appended
        "b": ("B", 7.0),      # right-only tree appended whole
        "b.0": ("Bc", 8.0),
    }


def test_reduce_matches_left_priority(spark):
    from pyspark.sql import Row

    from docarray_spark.operators import reduce_matches

    l = spark.createDataFrame([Row(query_id="q", match_id="m1", rank=1, score=0.1)])
    r = spark.createDataFrame([
        Row(query_id="q", match_id="m1", rank=9, score=0.9),
        Row(query_id="q", match_id="m2", rank=2, score=0.2),
    ])
    got = {(x.query_id, x.match_id): (x.rank, x.score) for x in reduce_matches(l, r).collect()}
    assert got == {("q", "m1"): (1, 0.1), ("q", "m2"): (2, 0.2)}
    assert reduce_matches(None, r).count() == 2
    assert reduce_matches(l, None).count() == 1


def test_intersect_and_except_ids(spark):
    from docarray_spark.operators import except_ids, intersect_ids

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    right = spark.createDataFrame([(2, "x"), (3, "y"), (4, "z")], "id long, v string")
    inter = intersect_ids(left, right)
    assert sorted((r.id, r.v) for r in inter.collect()) == [(2, "b"), (3, "c")]
    diff = except_ids(left, right)
    assert [(r.id, r.v) for r in diff.collect()] == [(1, "a")]
