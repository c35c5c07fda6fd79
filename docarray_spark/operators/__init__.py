from docarray_spark.operators.match import match, find_by_vectors

__all__ = ["match", "find_by_vectors"]
