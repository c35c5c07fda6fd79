"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver hash-compares
against at sf0.01. Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from docarray_spark.operators import match
from docarray_spark.queryset import find
from docarray_spark.sources import read_table as _t


# ---------------------------------------------------------------- filter QL

def q_ql_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo-QL comparison ops + implicit AND (queryset/parser.py:34-98)."""
    docs = _t(spark, sf_dir, "documents")
    return find(docs, {"lang": "en", "n_chars": {"$gte": 100, "$lt": 400}})


def q_ql_filter_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$or / $not / $in combinators (queryset/lookup.py:135-224)."""
    ev = _t(spark, sf_dir, "events")
    return find(
        ev,
        {
            "$or": [{"event_type": "click"}, {"value": {"$gt": 50.0}}],
            "$not": {"user_id": {"$in": [1, 2, 3]}},
        },
    )


def q_ql_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$regex + $in + $exists (queryset/lookup.py:104-124)."""
    docs = _t(spark, sf_dir, "documents")
    return find(
        docs,
        {
            "text": {"$regex": "^(key|scan|table)", "$exists": True},
            "source": {"$in": ["src0", "src1", "src2"]},
        },
    )


def q_ql_filter_size_placeholder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$size on an array column + placeholder field-vs-field compare
    (queryset/lookup.py:59-64,106-107)."""
    emb = _t(spark, sf_dir, "embeddings")
    return find(emb, {"embedding": {"$size": 64}, "vec_id": {"$gt": "{label}"}}).drop(
        "embedding"
    )


# ------------------------------------------------------------ vector search

def _emb_corpus_queries(spark, sf_dir, n_queries):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("id"), "embedding"
    )
    return emb, queries


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k cosine match with exclude_self
    (array/mixins/match.py:12-93, storage/memory/find.py:92-181)."""
    emb, queries = _emb_corpus_queries(spark, sf_dir, 10)
    return match(
        emb, queries, k=10, metric="cosine", corpus_id_col="vec_id",
        exclude_self=True, eps=0.0, round_scores=6,
    )


def q_knn_sqeuclidean_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: Mongo-QL pre-filter pushed below the kNN
    (storage/annlite/find.py:16-44 semantics)."""
    emb, queries = _emb_corpus_queries(spark, sf_dir, 10)
    return match(
        emb, queries, k=5, metric="sqeuclidean", corpus_id_col="vec_id",
        filter={"label": {"$in": [0, 1]}}, round_scores=6,
    )


def q_knn_euclidean_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN with min-max score normalization over the full distance row
    (math/helper.py:6-37, storage/memory/find.py:109-113)."""
    emb, queries = _emb_corpus_queries(spark, sf_dir, 5)
    return match(
        emb, queries, k=10, metric="euclidean", corpus_id_col="vec_id",
        normalization=(0, 1), round_scores=6,
    )


def q_knn_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-inner-product search (engine extension; score = -dot)."""
    emb, queries = _emb_corpus_queries(spark, sf_dir, 10)
    return match(
        emb, queries, k=10, metric="inner_product", corpus_id_col="vec_id",
        round_scores=6,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact top-k cosine similarity join (the reference's
    signature ``match`` operator) on sf0.001."""
    return q_knn_cosine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ql_filter_range": q_ql_filter_range,
        "ql_filter_logic": q_ql_filter_logic,
        "ql_filter_regex": q_ql_filter_regex,
        "ql_filter_size_placeholder": q_ql_filter_size_placeholder,
        "knn_cosine": q_knn_cosine,
        "knn_sqeuclidean_filtered": q_knn_sqeuclidean_filtered,
        "knn_euclidean_normalized": q_knn_euclidean_normalized,
        "knn_inner_product": q_knn_inner_product,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ql_filter_range": """
            SELECT * FROM documents
            WHERE lang = 'en' AND n_chars >= 100 AND n_chars < 400
        """,
        "ql_filter_logic": """
            SELECT * FROM events
            WHERE (event_type = 'click' OR value > 50.0)
              AND NOT COALESCE(user_id IN (1, 2, 3), FALSE)
        """,
        "ql_filter_regex": """
            SELECT * FROM documents
            WHERE regexp_matches(text, '^(key|scan|table)')
              AND text IS NOT NULL AND text <> ''
              AND source IN ('src0', 'src1', 'src2')
        """,
        "ql_filter_size_placeholder": """
            SELECT vec_id, label FROM embeddings
            WHERE len(embedding) = 64 AND vec_id > label
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            d AS (
              SELECT q.qid AS query_id, e.vec_id AS match_id,
                     1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS dist
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.qid
            ),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, match_id) AS rnk FROM d)
            SELECT query_id, match_id, rnk::INT AS rank, round(dist, 6) AS score,
                   'cosine' AS metric_name
            FROM r WHERE rnk <= 10
        """,
        "knn_sqeuclidean_filtered": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            d AS (
              SELECT q.qid AS query_id, e.vec_id AS match_id,
                     list_distance(e.embedding::DOUBLE[], q.qe::DOUBLE[]) ^ 2 AS dist
              FROM embeddings e CROSS JOIN q
              WHERE e.label IN (0, 1)
            ),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, match_id) AS rnk FROM d)
            SELECT query_id, match_id, rnk::INT AS rank, round(dist, 6) AS score,
                   'sqeuclidean' AS metric_name
            FROM r WHERE rnk <= 5
        """,
        "knn_euclidean_normalized": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
            d AS (
              SELECT q.qid AS query_id, e.vec_id AS match_id,
                     list_distance(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS dist
              FROM embeddings e CROSS JOIN q
            ),
            s AS (
              SELECT *,
                     min(dist) OVER (PARTITION BY query_id) AS gmin,
                     max(dist) OVER (PARTITION BY query_id) AS gmax,
                     row_number() OVER (PARTITION BY query_id ORDER BY dist, match_id) AS rnk
              FROM d
            )
            SELECT query_id, match_id, rnk::INT AS rank,
                   round(greatest(0.0, least(1.0, (dist - gmin) / (gmax - gmin + 1e-7))), 6) AS score,
                   'euclidean' AS metric_name
            FROM s WHERE rnk <= 10
        """,
        "knn_inner_product": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            d AS (
              SELECT q.qid AS query_id, e.vec_id AS match_id,
                     -list_inner_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS dist
              FROM embeddings e CROSS JOIN q
            ),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, match_id) AS rnk FROM d)
            SELECT query_id, match_id, rnk::INT AS rank, round(dist, 6) AS score,
                   'inner_product' AS metric_name
            FROM r WHERE rnk <= 10
        """,
    }
