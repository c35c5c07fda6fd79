from docarray_spark.functions.distance import (
    DISTANCE_KERNELS,
    cosine_distance_col,
    dot_col,
    euclidean_distance_col,
    l2_norm_col,
    sqeuclidean_distance_col,
)
from docarray_spark.functions.wire import docs_from_bytes, docs_to_bytes
from docarray_spark.functions.content import (
    any_hash_col,
    blob_to_tensor_udf,
    content_type_col,
    feature_hash,
    tensor_to_blob_udf,
    text_to_datauri_col,
    to_datauri_col,
    token_bucket_col,
)

__all__ = [
    "DISTANCE_KERNELS",
    "cosine_distance_col",
    "dot_col",
    "euclidean_distance_col",
    "l2_norm_col",
    "sqeuclidean_distance_col",
    "docs_from_bytes",
    "docs_to_bytes",
    "any_hash_col",
    "blob_to_tensor_udf",
    "content_type_col",
    "feature_hash",
    "tensor_to_blob_udf",
    "text_to_datauri_col",
    "to_datauri_col",
    "token_bucket_col",
]
