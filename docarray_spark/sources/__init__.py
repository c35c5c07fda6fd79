from docarray_spark.sources.readers import (
    read_csv_documents,
    read_files,
    read_ndjson,
    read_parquet,
    read_table,
)
from docarray_spark.sources.writers import (
    flatten_tags,
    from_lines,
    from_ndarray,
    save_csv,
    save_json,
    save_parquet,
)

__all__ = [
    "read_csv_documents",
    "read_files",
    "read_ndjson",
    "read_parquet",
    "read_table",
    "flatten_tags",
    "from_lines",
    "from_ndarray",
    "save_csv",
    "save_json",
    "save_parquet",
]
