from docarray_spark.operators.match import match, find_by_vectors
from docarray_spark.operators.reduce import reduce_docs, concat, delete_by_ids, contains_ids
from docarray_spark.operators.group import (
    split_by_tag,
    group_counts,
    sample,
    shuffle,
    hash_sample,
    with_batch_id,
    map_batch,
    add_offset,
)
from docarray_spark.operators.evaluation import evaluate, relevance_arrays, METRICS
from docarray_spark.operators.traverse import traverse, flatten

__all__ = [
    "match",
    "find_by_vectors",
    "reduce_docs",
    "concat",
    "delete_by_ids",
    "contains_ids",
    "split_by_tag",
    "group_counts",
    "sample",
    "shuffle",
    "hash_sample",
    "with_batch_id",
    "map_batch",
    "add_offset",
    "evaluate",
    "relevance_arrays",
    "METRICS",
    "traverse",
    "flatten",
]
