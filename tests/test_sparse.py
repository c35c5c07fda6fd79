"""Sparse-vector kernel and kNN tests (reference sparse support:
math/ndarray.py:90-177, sparse distances math/distance/numpy.py:40-81)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docarray_spark.functions.sparse import (
    sparse_cosine_distance_col,
    sparse_dot_col,
    sparse_match,
    sparse_to_dense_col,
    to_sparse_col,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_sparse_roundtrip(spark, emb):
    dim = len(emb.select("embedding").first()[0])
    df = emb.limit(20).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("d"),
    )
    sp = df.withColumn("s", to_sparse_col("d", threshold=0.5))
    back = sp.withColumn("dd", sparse_to_dense_col("s", dim))
    for r in back.collect():
        orig = np.array(r["d"])
        got = np.array(r["dd"])
        expect = np.where(np.abs(orig) > 0.5, orig, 0.0)
        np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_sparse_dot_and_cosine_vs_numpy(spark, emb):
    df = emb.limit(10).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("d")
    )
    sp = df.withColumn("s", to_sparse_col("d", threshold=0.5))
    a = sp.alias("a")
    b = sp.alias("b")
    pairs = a.crossJoin(b).filter(F.col("a.vec_id") < F.col("b.vec_id"))
    got = pairs.select(
        F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
        sparse_dot_col(F.col("a.s"), F.col("b.s")).alias("dot"),
        sparse_cosine_distance_col(F.col("a.s"), F.col("b.s")).alias("cos"),
    ).collect()
    dense = {r["vec_id"]: np.array(r["d"]) for r in df.collect()}
    spv = {k: np.where(np.abs(v) > 0.5, v, 0.0) for k, v in dense.items()}
    for r in got:
        x, y = spv[r["ia"]], spv[r["ib"]]
        np.testing.assert_allclose(r["dot"], x @ y, rtol=1e-9)
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx == 0 or ny == 0:
            assert r["cos"] is None  # try_divide null, not an ANSI error
        else:
            np.testing.assert_allclose(r["cos"], 1 - (x @ y) / (nx * ny), rtol=1e-9)


def test_sparse_match_vs_dense_bruteforce(spark, emb):
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("d"),
    ).withColumn("sparse", to_sparse_col("d", threshold=0.5))
    queries = df.filter("id < 4")
    got = sparse_match(df, queries, k=5, sparse_col="sparse").collect()
    # brute-force ground truth on the thresholded dense vectors
    dense = {r["id"]: np.where(np.abs(np.array(r["d"])) > 0.5, np.array(r["d"]), 0.0)
             for r in df.collect()}
    for qid in range(4):
        qv = dense[qid]
        dists = {
            cid: 1 - (qv @ cv) / (np.linalg.norm(qv) * np.linalg.norm(cv))
            for cid, cv in dense.items()
            if qv @ cv != 0.0
        }
        expect = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:5]
        rows = sorted((r for r in got if r["query_id"] == qid), key=lambda r: r["rank"])
        assert [r["match_id"] for r in rows] == [c for c, _ in expect]
        np.testing.assert_allclose(
            [r["score"] for r in rows], [d for _, d in expect], rtol=1e-9
        )
