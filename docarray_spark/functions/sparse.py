"""Sparse-vector support.

The reference accepts scipy/torch/tf sparse embeddings everywhere dense ones
are allowed (``/root/reference/docarray/math/ndarray.py:90-177`` framework
dispatch; sparse distance kernels at ``math/distance/numpy.py:40-81``).
SURVEY.md §1.2 maps them to a ``struct<indices array<int>, values
array<float>>`` column (CSR row); kernels here are pure Catalyst
higher-order functions — JVM-side, no scipy on executors.

Scale notes: sparse dot via a map-lookup over the SHORTER side is O(nnz);
for corpus-scale kNN the relational form (explode + equi-join on index +
sum of products) lets Spark hash-partition by index — that variant is what
``sparse_match`` uses, so the shuffle carries (row, index, value) triples,
never dense vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SPARSE_TYPE = "struct<indices: array<int>, values: array<double>>"


def to_sparse_col(dense: Column | str, threshold: float = 0.0) -> Column:
    """Dense ``array`` → sparse struct keeping ``|x| > threshold`` entries
    (0-based indices)."""
    d = F.col(dense) if isinstance(dense, str) else dense
    pairs = F.filter(
        F.zip_with(
            F.sequence(F.lit(0), F.size(d) - 1),
            d,
            lambda i, x: F.struct(i.alias("i"), x.cast("double").alias("v")),
        ),
        lambda s: F.abs(s["v"]) > threshold,
    )
    return F.struct(
        F.transform(pairs, lambda s: s["i"]).alias("indices"),
        F.transform(pairs, lambda s: s["v"]).alias("values"),
    )


def sparse_to_dense_col(sparse: Column | str, dim: int) -> Column:
    """Sparse struct → dense ``array<double>`` of length ``dim``."""
    s = F.col(sparse) if isinstance(sparse, str) else sparse
    m = F.map_from_arrays(s["indices"], s["values"])
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(m, i), F.lit(0.0)),
    )


def sparse_dot_col(a: Column | str, b: Column | str) -> Column:
    """Sparse·sparse dot product: map-lookup over one side (O(nnz_a))."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mb = F.map_from_arrays(b["indices"], b["values"])
    return F.aggregate(
        F.zip_with(
            a["indices"], a["values"],
            lambda i, v: v * F.coalesce(F.element_at(mb, i), F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sparse_norm_col(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a["values"], F.lit(0.0), lambda acc, v: acc + v * v)
    )


def sparse_cosine_distance_col(a: Column | str, b: Column | str) -> Column:
    """NULL (not an error) when either norm is zero — ANSI-safe."""
    return 1 - F.try_divide(sparse_dot_col(a, b), sparse_norm_col(a) * sparse_norm_col(b))


def sparse_match(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id_col: str = "id",
    query_id_col: str = "id",
    sparse_col: str = "sparse",
    round_scores: int | None = None,
) -> DataFrame:
    """Top-k cosine kNN over sparse vectors, fully relational (the
    inverted-index join): explode both sides to (id, index, value), equi-join
    on index, sum products per (query, corpus) pair — only pairs sharing at
    least one nonzero dimension are ever materialized, the sparse-data
    analogue of the brute-force kernel. Norms fold per row beforehand.

    → (query_id, match_id, rank, score, metric_name='cosine'). Rows whose
    dot product is 0 (no shared dimension) are absent — for normalized
    sparse data that is the desired 'no match' semantics."""
    c = corpus.select(
        F.col(corpus_id_col).alias("match_id"),
        F.col(sparse_col).alias("_cs"),
        sparse_norm_col(sparse_col).alias("_cn"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(sparse_col).alias("_qs"),
        sparse_norm_col(sparse_col).alias("_qn"),
    )
    c_post = c.select(
        "match_id", "_cn",
        F.explode(F.arrays_zip(F.col("_cs")["indices"], F.col("_cs")["values"])).alias("e"),
    ).select("match_id", "_cn", F.col("e.indices").alias("ix"), F.col("e.values").alias("cv"))
    q_post = q.select(
        "query_id", "_qn",
        F.explode(F.arrays_zip(F.col("_qs")["indices"], F.col("_qs")["values"])).alias("e"),
    ).select("query_id", "_qn", F.col("e.indices").alias("ix"), F.col("e.values").alias("qv"))
    dots = (
        q_post.join(c_post, "ix")
        .groupBy("query_id", "match_id", "_qn", "_cn")
        .agg(F.sum(F.col("qv") * F.col("cv")).alias("_dot"))
        # clamp at 0: self-match fp noise can land at -2e-16, which would
        # round to IEEE -0.0 and break bitwise oracle comparison
        .withColumn(
            "score",
            F.greatest(
                F.lit(0.0), 1 - F.try_divide(F.col("_dot"), F.col("_qn") * F.col("_cn"))
            ),
        )
    )
    # rank on the ROUNDED score when rounding is requested (r5 PQ / r9
    # BM25 lesson): the dot is a shuffle-summed aggregate, so two pairs
    # tied at round_scores decimals differ only in sum-order ulps and a
    # raw rank key would pick per-run winners
    from docarray_spark.functions.distance import rounded_rank_key

    w = Window.partitionBy("query_id").orderBy(
        rounded_rank_key("score", round_scores).asc(), F.col("match_id").asc()
    )
    out = dots.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    score = F.round("score", round_scores) if round_scores is not None else F.col("score")
    return out.select(
        "query_id", "match_id", "rank", score.alias("score"),
        F.lit("cosine").alias("metric_name"),
    )
