from docarray_spark.functions.distance import (
    DISTANCE_KERNELS,
    cosine_distance_col,
    dot_col,
    euclidean_distance_col,
    l2_norm_col,
    sqeuclidean_distance_col,
)

__all__ = [
    "DISTANCE_KERNELS",
    "cosine_distance_col",
    "dot_col",
    "euclidean_distance_col",
    "l2_norm_col",
    "sqeuclidean_distance_col",
]
