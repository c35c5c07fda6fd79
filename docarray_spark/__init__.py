"""docarray_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jina-ai/docarray (reference: /root/reference,
docarray 0.13.34).

Design stance (SURVEY.md §7): one core DataFrame schema plus a library of
composable operator functions. Queries are declared with the DataFrame/SQL
API so Catalyst performs pushdown/pruning/join-selection; Python only runs
inside Arrow-vectorized pandas UDFs on the numeric hot paths (distance
kernels), never row-at-a-time.
"""

__version__ = "0.1.0"

from docarray_spark.session import get_spark
from docarray_spark.schema import DOCUMENT_SCHEMA, empty_documents
from docarray_spark.queryset.compiler import compile_filter, find


def release_cached_intermediates(spark) -> None:
    """Drop every cached block this engine's operators registered.

    Several operators persist shared subtrees at PLAN-BUILD time (minhash
    band/bucket tables, simhash fingerprints, BM25 tf tables, CC edges) —
    they must stay cached until the CALLER materializes the returned lazy
    DataFrame, so the operators themselves cannot unpersist (ADVICE r3).
    Long-lived sessions should call this between pipeline stages; it is
    the engine-blessed alias for ``spark.catalog.clearCache()`` (which is
    exactly what it does — cached blocks are session-scoped, so no other
    tenant is affected in a per-session deployment)."""
    spark.catalog.clearCache()


__all__ = [
    "get_spark",
    "DOCUMENT_SCHEMA",
    "empty_documents",
    "compile_filter",
    "find",
    "release_cached_intermediates",
]
