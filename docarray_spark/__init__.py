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

__all__ = [
    "get_spark",
    "DOCUMENT_SCHEMA",
    "empty_documents",
    "compile_filter",
    "find",
]
