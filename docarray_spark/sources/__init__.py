from docarray_spark.sources.readers import (
    read_csv_documents,
    fetch_uris,
    read_files,
    read_ndjson,
    read_parquet,
    read_table,
)
from docarray_spark.sources.readers import from_huggingface_datasets
from docarray_spark.sources.registry import (
    delete_artifact,
    list_artifacts,
    pull,
    push,
)
from docarray_spark.sources.writers import (
    doc_to_json_col,
    flatten_tags,
    from_lines,
    from_ndarray,
    from_pandas,
    save_csv,
    save_json,
    save_parquet,
    to_pandas,
)

__all__ = [
    "read_csv_documents",
    "fetch_uris",
    "read_files",
    "read_ndjson",
    "read_parquet",
    "read_table",
    "from_huggingface_datasets",
    "delete_artifact",
    "list_artifacts",
    "pull",
    "push",
    "doc_to_json_col",
    "flatten_tags",
    "from_lines",
    "from_ndarray",
    "from_pandas",
    "save_csv",
    "save_json",
    "save_parquet",
    "to_pandas",
]
