"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver hash-compares
against at sf0.01. Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Mongo-QL filter compiled to a Catalyst predicate."""
    return q_ql_filter_range(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ql_filter_range": q_ql_filter_range,
        "ql_filter_logic": q_ql_filter_logic,
        "ql_filter_regex": q_ql_filter_regex,
        "ql_filter_size_placeholder": q_ql_filter_size_placeholder,
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
    }
