from docarray_spark.sources.readers import read_parquet, read_table

__all__ = ["read_parquet", "read_table"]
