"""Metric values vs the reference kernels' hand-computed results
(math/evaluation.py semantics)."""

import math

import numpy as np
import pytest

from docarray_spark.operators import evaluate, relevance_arrays
from docarray_spark.operators.evaluation import METRICS


# reference implementations (numpy, copied semantics from SURVEY §2.4)
def ref_precision(rel, k=None):
    r = np.array(rel)[:k] != 0
    return float(np.mean(r))


def ref_ap(rel):
    r = np.array(rel) != 0
    out = [ref_precision(r, i + 1) for i in range(r.size) if r[i]]
    return float(np.mean(out)) if out else 0.0


def ref_rr(rel):
    nz = np.array(rel).nonzero()[0]
    return 1.0 / (nz[0] + 1) if nz.size else 0.0


def ref_rprec(rel):
    r = np.array(rel) != 0
    z = r.nonzero()[0]
    return float(np.mean(r[: z[-1] + 1])) if z.size else 0.0


def ref_dcg(rel, k=None, method=0):
    r = np.asarray(rel, dtype=float)[:k]
    if not r.size:
        return 0.0
    if method == 0:
        return r[0] + np.sum(r[1:] / np.log2(np.arange(2, r.size + 1)))
    return np.sum(r / np.log2(np.arange(2, r.size + 2)))


def ref_ndcg(rel, k=None, method=0):
    dmax = ref_dcg(sorted(rel, reverse=True), k, method)
    return ref_dcg(rel, k, method) / dmax if dmax else 0.0


REL = {
    "q1": [1, 0, 1, 0, 0],
    "q2": [0, 0, 0, 0, 1],
    "q3": [0, 0, 0, 0, 0],
    "q4": [1, 1, 1, 1, 1],
}


@pytest.fixture(scope="module")
def frames(spark):
    m_rows, gt_rows = [], []
    for q, rels in REL.items():
        for i, r in enumerate(rels):
            mid = f"{q}_m{i}"
            m_rows.append((q, mid, i + 1))
            if r:
                gt_rows.append((q, mid))
        gt_rows.append((q, f"{q}_unretrieved"))  # relevant but not retrieved
    matches = spark.createDataFrame(m_rows, "query_id string, match_id string, rank int")
    gt = spark.createDataFrame(gt_rows, "query_id string, match_id string")
    return matches, gt


def per_query(spark, frames, metric, **kw):
    m, gt = frames
    df = evaluate(m, gt, metric, per_query=True, **kw).toPandas()
    return dict(zip(df.query_id, df.value))


def test_relevance_arrays(spark, frames):
    m, gt = frames
    got = {r.query_id: r.rel for r in relevance_arrays(m, gt).collect()}
    assert got == REL


def test_precision_hit_recall_f1(spark, frames):
    got = per_query(spark, frames, "precision_at_k", k=3)
    for q in REL:
        assert got[q] == pytest.approx(ref_precision(REL[q], 3))
    got = per_query(spark, frames, "hit_at_k", k=3)
    assert got == {"q1": 1.0, "q2": 0.0, "q3": 0.0, "q4": 1.0}
    got = per_query(spark, frames, "recall_at_k", k=5, max_rel=6)
    for q in REL:
        assert got[q] == pytest.approx(sum(REL[q]) / 6)
    got = per_query(spark, frames, "f1_score_at_k", k=5, max_rel=6)
    for q in REL:
        p, r = ref_precision(REL[q], 5), sum(REL[q]) / 6
        assert got[q] == pytest.approx(2 * p * r / (p + r) if p + r else 0.0)


def test_ap_rr_rprec(spark, frames):
    for metric, ref in [
        ("average_precision", ref_ap),
        ("reciprocal_rank", ref_rr),
        ("r_precision", ref_rprec),
    ]:
        got = per_query(spark, frames, metric)
        for q in REL:
            assert got[q] == pytest.approx(ref(REL[q])), (metric, q)


@pytest.mark.parametrize("method", [0, 1])
def test_dcg_ndcg(spark, frames, method):
    got = per_query(spark, frames, "dcg_at_k", k=5, method=method)
    for q in REL:
        assert got[q] == pytest.approx(ref_dcg(REL[q], 5, method)), q
    got = per_query(spark, frames, "ndcg_at_k", k=5, method=method)
    for q in REL:
        assert got[q] == pytest.approx(ref_ndcg(REL[q], 5, method)), q


def test_mean_aggregation(spark, frames):
    m, gt = frames
    val = evaluate(m, gt, "reciprocal_rank").collect()[0].value
    assert val == pytest.approx(np.mean([ref_rr(r) for r in REL.values()]))


def test_all_metrics_registered():
    assert set(METRICS) == {
        "r_precision", "precision_at_k", "hit_at_k", "average_precision",
        "reciprocal_rank", "recall_at_k", "f1_score_at_k", "dcg_at_k", "ndcg_at_k",
    }


def test_evaluate_per_query_max_rel_default(spark):
    """max_rel=None derives the per-query groundtruth size (reference
    evaluation.py:55-57): two queries with gt sizes 2 and 4 get different
    recall denominators."""
    from pyspark.sql import Row

    from docarray_spark.operators import evaluate

    matches = spark.createDataFrame(
        [Row(query_id="q1", match_id=m, rank=i + 1) for i, m in enumerate(["a", "b", "x"])]
        + [Row(query_id="q2", match_id=m, rank=i + 1) for i, m in enumerate(["c", "y", "z"])]
    )
    gt = spark.createDataFrame(
        [Row(query_id="q1", match_id=m) for m in ["a", "b"]]
        + [Row(query_id="q2", match_id=m) for m in ["c", "d", "e", "f"]]
    )
    got = {
        r.query_id: r.value
        for r in evaluate(matches, gt, "recall_at_k", k=3, per_query=True).collect()
    }
    assert got["q1"] == 2 / 2
    assert got["q2"] == 1 / 4


def test_perfect_and_zero_match_invariants(spark):
    """Reference parity (test_eval_class.py:33-98): groundtruth identical to
    the matches → every metric is exactly 1.0; disjoint groundtruth →
    0.0 (DCG excepted: unbounded above, zero on no relevance)."""
    m = spark.createDataFrame(
        [("q", f"m{i}", i + 1) for i in range(5)],
        "query_id string, match_id string, rank int",
    )
    gt_same = m.select("query_id", "match_id")
    gt_none = spark.createDataFrame(
        [("q", f"x{i}") for i in range(5)], "query_id string, match_id string"
    )
    import pyspark.sql.functions as F

    for gt, want in [(gt_same, 1.0), (gt_none, 0.0)]:
        rel = relevance_arrays(m, gt)
        c = F.col("rel")
        row = rel.select(
            METRICS["precision_at_k"](c, k=5).alias("p"),
            METRICS["recall_at_k"](c, k=5, max_rel=5).alias("r"),
            METRICS["f1_score_at_k"](c, k=5, max_rel=5).alias("f1"),
            METRICS["hit_at_k"](c, k=5).alias("hit"),
            METRICS["average_precision"](c).alias("ap"),
            METRICS["reciprocal_rank"](c).alias("rr"),
            METRICS["r_precision"](c).alias("rp"),
            METRICS["ndcg_at_k"](c, k=5, method=0).alias("ndcg"),
        ).first()
        for name in ["p", "r", "f1", "hit", "ap", "rr", "rp", "ndcg"]:
            assert row[name] == pytest.approx(want), (name, want)
