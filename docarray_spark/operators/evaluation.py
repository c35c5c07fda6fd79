"""Ranking-metric library — ``DocumentArray.evaluate``
(``/root/reference/docarray/array/mixins/evaluation.py:15-86``) and the
metric kernels (``docarray/math/evaluation.py:14-168``) re-expressed as pure
Catalyst Column expressions over a matches table.

Everything is built from higher-order array functions (``aggregate`` /
``transform`` / ``filter`` / ``slice``) on a per-query relevance array, so
metric evaluation is JVM-side with one shuffle (the groupBy on query_id) —
no Python in the loop regardless of corpus size.

Input model: a matches DataFrame ``(query_id, match_id, rank)`` (the output
of :func:`docarray_spark.operators.match.match`) and a groundtruth DataFrame
``(query_id, match_id)``; binary relevance at rank *i* = the i-th match is
present in the query's groundtruth set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def relevance_arrays(
    matches: DataFrame,
    groundtruth: DataFrame,
    query_id: str = "query_id",
    match_id: str = "match_id",
    rank: str = "rank",
) -> DataFrame:
    """→ (query_id, rel: array<int>) with rel in rank order."""
    gt = groundtruth.select(
        F.col(query_id).alias("_gq"), F.col(match_id).alias("_gm")
    ).distinct()
    joined = matches.join(
        gt,
        (matches[query_id] == gt["_gq"]) & (matches[match_id] == gt["_gm"]),
        "left",
    ).select(
        matches[query_id].alias("query_id"),
        matches[rank].alias("rank"),
        F.when(gt["_gm"].isNotNull(), 1).otherwise(0).alias("rel"),
    )
    return joined.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "rel"))), lambda s: s["rel"]
        ).alias("rel")
    )


# --------------------------------------------------------- metric builders
# Each takes the rel array Column (+ k / max_rel) and returns a Double Column.
# Positions are 1-based; `slice(rel, 1, k)` mirrors numpy's rel[:k].


def _headk(rel: Column, k: int | None) -> Column:
    return rel if k is None else F.slice(rel, 1, k)


def _sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def _mean(arr: Column) -> Column:
    return F.when(F.size(arr) > 0, _sum(arr) / F.size(arr)).otherwise(F.lit(0.0))


def precision_at_k(rel: Column, k: int | None = None, **_) -> Column:
    """mean(rel[:k]) — evaluation.py:31-43 (divides by len(rel[:k]), not k)."""
    return _mean(_headk(rel, k))


def hit_at_k(rel: Column, k: int | None = None, **_) -> Column:
    return (_sum(_headk(rel, k)) > 0).cast("double")


def recall_at_k(rel: Column, max_rel: int | Column, k: int | None = None, **_) -> Column:
    mr = max_rel if isinstance(max_rel, Column) else F.lit(float(max_rel))
    return F.when(
        mr > 0, _sum(_headk(rel, k)) / mr.cast("double")
    ).otherwise(F.lit(0.0))


def f1_score_at_k(rel: Column, max_rel: int | Column, k: int | None = None, **_) -> Column:
    p = precision_at_k(rel, k)
    r = recall_at_k(rel, max_rel, k)
    return F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))


def reciprocal_rank(rel: Column, **_) -> Column:
    """1 / rank of first relevant item (evaluation.py:69-77)."""
    pos = F.array_position(F.transform(rel, lambda x: (x != 0).cast("int")), 1)
    return F.when(pos > 0, F.lit(1.0) / pos).otherwise(F.lit(0.0))


def r_precision(rel: Column, **_) -> Column:
    """mean(rel[:z+1]) where z = last relevant position (evaluation.py:15-28)."""
    flags = F.transform(rel, lambda x: (x != 0).cast("int"))
    last = F.size(rel) - F.array_position(F.reverse(flags), 1) + 1
    return F.when(
        F.array_position(flags, 1) > 0, _mean(F.slice(rel, 1, last.cast("int")))
    ).otherwise(F.lit(0.0))


def average_precision(rel: Column, **_) -> Column:
    """mean of precision@i over relevant positions i (evaluation.py:55-66).
    O(k²) per query in expression form — fine for top-k-sized arrays."""
    positions = F.filter(
        F.sequence(F.lit(1), F.size(rel)), lambda i: F.element_at(rel, i) != 0
    )
    precs = F.transform(positions, lambda i: _sum(F.slice(rel, 1, i)) / i.cast("double"))
    return _mean(precs)


def dcg_at_k(rel: Column, k: int | None = None, method: int = 0, **_) -> Column:
    """evaluation.py:117-141; method 0 weights [1, 1, 1/log2(3), ...],
    method 1 weights [1/log2(2), 1/log2(3), ...] = [1, 0.6309, 0.5, ...]."""
    r = _headk(rel, k)
    idx = F.sequence(F.lit(1), F.size(r))
    if method == 0:
        weighted = F.zip_with(
            r,
            idx,
            lambda x, i: F.when(i == 1, x.cast("double")).otherwise(
                x.cast("double") / F.log2(i.cast("double"))
            ),
        )
    elif method == 1:
        weighted = F.zip_with(
            r, idx, lambda x, i: x.cast("double") / F.log2(i.cast("double") + 1)
        )
    else:
        raise ValueError("method must be 0 or 1")
    return F.coalesce(_sum(weighted), F.lit(0.0))


def ndcg_at_k(rel: Column, k: int | None = None, method: int = 0, **_) -> Column:
    ideal = F.reverse(F.array_sort(rel))
    dcg_max = dcg_at_k(ideal, k, method)
    return F.when(dcg_max != 0, dcg_at_k(rel, k, method) / dcg_max).otherwise(F.lit(0.0))


METRICS = {
    "r_precision": r_precision,
    "precision_at_k": precision_at_k,
    "hit_at_k": hit_at_k,
    "average_precision": average_precision,
    "reciprocal_rank": reciprocal_rank,
    "recall_at_k": recall_at_k,
    "f1_score_at_k": f1_score_at_k,
    "dcg_at_k": dcg_at_k,
    "ndcg_at_k": ndcg_at_k,
}


def evaluate(
    matches: DataFrame,
    groundtruth: DataFrame,
    metric: str,
    k: int | None = None,
    max_rel: int | None = None,
    method: int = 0,
    per_query: bool = False,
) -> DataFrame:
    """``da.evaluate(groundtruth, metric)`` — per-query metric then corpus
    mean (``array/mixins/evaluation.py:15-86``).

    ``max_rel=None`` derives it PER QUERY as that query's groundtruth-set
    size — the reference's default (``evaluation.py:55-57``; ADVICE r1: a
    single global max_rel mis-scores queries with differently-sized
    groundtruth sets). Pass an int to force a global bound."""
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; choose from {sorted(METRICS)}")
    rel = relevance_arrays(matches, groundtruth)
    mr = max_rel
    if max_rel is None and metric in ("recall_at_k", "f1_score_at_k"):
        gtc = (
            groundtruth.select(
                F.col("query_id").alias("_gq"), F.col("match_id").alias("_gm")
            )
            .distinct()
            .groupBy("_gq")
            .agg(F.count(F.lit(1)).alias("_max_rel"))
        )
        rel = rel.join(
            F.broadcast(gtc), rel["query_id"] == F.col("_gq"), "left"
        ).drop("_gq")
        mr = F.coalesce(F.col("_max_rel"), F.lit(0)).cast("double")
    expr = METRICS[metric](F.col("rel"), k=k, max_rel=mr, method=method)
    per = rel.select("query_id", expr.alias("value"))
    if per_query:
        return per
    return per.agg(F.avg("value").alias("value"))
