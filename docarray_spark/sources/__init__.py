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
    init_parquet_store,
    merge_parquet_store,
    save_parquet,
    to_pandas,
)
from docarray_spark.sources.jdbc_store import (
    delete_by_id_jdbc,
    derby_url,
    jdbc_execute,
    load_jdbc,
    save_jdbc,
    update_field_by_id_jdbc,
)


__all__ = [
    "save_jdbc",
    "load_jdbc",
    "jdbc_execute",
    "derby_url",
    "delete_by_id_jdbc",
    "update_field_by_id_jdbc",
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
    "init_parquet_store",
    "merge_parquet_store",
    "save_parquet",
    "to_pandas",
]
