"""Unified ``find`` — the reference's query-type dispatch
(``array/mixins/find.py:22-156``): one entry point that routes on what the
query IS, exactly as ``DocumentArray.find`` does:

* ``dict``            → Mongo-QL filter (``queryset.find``)
* ``str`` / list[str] → BM25 full-text search (``text.text_search``)
* vector(s) (ndarray, list of floats, list of vectors)
                      → kNN (``match.find_by_vectors``, incl. the
                        ``backend=`` ANN dispatch)

Every branch returns a DataFrame; all keyword arguments flow to the chosen
operator unchanged, so this adds dispatch, not a new surface.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import DataFrame


def find(corpus: DataFrame, query: Any, **kwargs) -> DataFrame:
    """Route ``query`` by type to the filter / text-search / vector-search
    operator (the reference's ``find`` overloads, one function)."""
    if isinstance(query, dict):
        from docarray_spark.queryset import find as ql_find

        return ql_find(corpus, query, limit=kwargs.pop("limit", None))
    if isinstance(query, str):
        # index_path= routes to the bm25_refresh-maintained store index
        # (text-search-behind-CRUD): the corpus DataFrame is NOT read —
        # results come from the stored index, which reflects the store as
        # of its last refresh (audit with index_store.index_status if the
        # corpus may have moved past it). The term lookup is a pruned
        # postings scan — the serving path for a store-backed corpus.
        # Without it, text_search scores the corpus DataFrame directly
        # (the reference's ad-hoc find(str) shape).
        index_path = kwargs.pop("index_path", None)
        if index_path is not None:
            if "text_col" in kwargs:
                # ADVICE r6: this kwarg is meaningful only on the
                # corpus-scoring path; silently forwarding it raised an
                # opaque TypeError inside bm25_match_stored
                raise TypeError(
                    "find(str, index_path=...) serves from the prebuilt "
                    "index, whose text column was fixed at bm25_refresh "
                    "time — text_col applies only to the corpus-scoring "
                    "path (omit index_path)"
                )
            from docarray_spark.operators.index_store import bm25_match_stored

            return bm25_match_stored(
                corpus.sparkSession, index_path, query, **kwargs
            )
        from docarray_spark.operators.text import text_search

        return text_search(corpus, query, **kwargs)
    if isinstance(query, (list, tuple)) and query and isinstance(query[0], str):
        # list of text queries → union of per-query results, tagged
        from pyspark.sql import functions as F

        index_path = kwargs.pop("index_path", None)
        if index_path is not None:
            if "text_col" in kwargs:
                # same misuse as the single-string path (ADVICE r6) must
                # get the same explanatory error, not an opaque
                # unexpected-keyword TypeError from bm25_match_stored
                raise TypeError(
                    "find(list[str], index_path=...) serves from the "
                    "prebuilt index, whose text column was fixed at "
                    "bm25_refresh time — text_col applies only to the "
                    "corpus-scoring path (omit index_path)"
                )
            # stored-index path: ONE batched job for the whole list (one
            # postings slice for the union of terms — 16.2x over the
            # per-query loop at 20 queries, NOTES r8), tagged with the
            # query string like the corpus path
            from docarray_spark.operators.index_store import bm25_match_stored

            spark = corpus.sparkSession
            out = bm25_match_stored(spark, index_path, list(query), **kwargs)
            from docarray_spark.functions.localexec import local_table

            qmap = local_table(
                spark, [(i, q) for i, q in enumerate(query)], "query_id int, query string"
            )
            return out.join(F.broadcast(qmap), "query_id").drop("query_id")
        # corpus path: ONE batched job for the whole list (one corpus
        # tokenize for N queries — text_search_multi; pinned ≡ N single
        # text_search calls in test_fusion), tagged like the stored path.
        # Duplicates compute once but keep PER-OCCURRENCE rows — the old
        # per-query loop and the index_path branch both emit one result
        # set per list position, and the two serving modes of the same
        # call must agree on cardinality.
        from docarray_spark.operators.text import text_search_multi

        uniq = list(dict.fromkeys(query))
        pos = {q: i for i, q in enumerate(uniq)}
        out = text_search_multi(corpus, dict(enumerate(uniq)), **kwargs)
        from docarray_spark.functions.localexec import local_table

        occ = local_table(
            corpus.sparkSession, [(pos[q], q) for q in query], "query_id long, query string"
        )
        return out.join(F.broadcast(occ), "query_id").drop("query_id")
    if isinstance(query, np.ndarray) or (
        isinstance(query, (list, tuple))
        and query
        and isinstance(query[0], (int, float, list, tuple, np.ndarray))
    ):
        from docarray_spark.operators.match import find_by_vectors

        return find_by_vectors(corpus, query, **kwargs)
    raise TypeError(
        f"find() supports dict (QL filter), str / list[str] (text search), "
        f"or vectors; got {type(query).__name__}"
    )
