from docarray_spark.queryset.compiler import compile_filter, find, resolve_field

__all__ = ["compile_filter", "find", "resolve_field"]
