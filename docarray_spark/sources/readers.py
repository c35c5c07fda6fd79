"""Parquet/CSV/ndjson sources.

Replaces the reference's generator-based ingestion
(``/root/reference/docarray/document/generators.py``) with Spark's native
readers — columnar, splittable, predicate-pushdown-capable.

``read_parquet`` additionally handles TIMESTAMP(NANOS) parquet columns,
which Spark rejects by default: it flips
``spark.sql.legacy.parquet.nanosAsLong`` and rebuilds a micro-precision
timestamp column (integer-division truncation, matching DuckDB/pyarrow
semantics) so downstream operators see a plain ``timestamp`` type.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# Pinned extension → mimetype table for datauri generation (ADVICE r5:
# mimetypes.types_map merges host files like /etc/mime.types, so uris would
# differ across machines). IANA-registered types for the media/document
# extensions the reference's uri mixins handle (document/mixins/image.py,
# audio.py, video.py, text.py); anything else → application/octet-stream.
_EXT_MIME = {
    "aac": "audio/aac", "avi": "video/x-msvideo", "bin": "application/octet-stream",
    "bmp": "image/bmp", "bz2": "application/x-bzip2", "css": "text/css",
    "csv": "text/csv", "flac": "audio/flac", "gif": "image/gif",
    "gz": "application/gzip", "htm": "text/html", "html": "text/html",
    "ico": "image/vnd.microsoft.icon", "jpeg": "image/jpeg", "jpg": "image/jpeg",
    "js": "text/javascript", "json": "application/json", "md": "text/markdown",
    "mid": "audio/midi", "mkv": "video/x-matroska", "mov": "video/quicktime",
    "mp3": "audio/mpeg", "mp4": "video/mp4", "mpeg": "video/mpeg",
    "npy": "application/octet-stream", "oga": "audio/ogg", "ogg": "audio/ogg",
    "ogv": "video/ogg", "opus": "audio/opus", "pdf": "application/pdf",
    "png": "image/png", "svg": "image/svg+xml", "tar": "application/x-tar",
    "tif": "image/tiff", "tiff": "image/tiff", "ts": "video/mp2t",
    "txt": "text/plain", "wav": "audio/wav", "weba": "audio/webm",
    "webm": "video/webm", "webp": "image/webp", "xml": "application/xml",
    "zip": "application/zip",
}


def _nano_ts_columns(path: str) -> list[str]:
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-provided tables from a scale-factor dir."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def read_csv_documents(
    spark: SparkSession,
    path: str,
    field_resolver: dict[str, str] | None = None,
    known_fields: set[str] | None = None,
) -> DataFrame:
    """``DocumentArray.from_csv`` analogue (``document/generators.py:127-176``):
    header-driven CSV where resolved columns map onto document fields and
    unknown columns overflow into a ``tags`` map (the reference's "catch"
    handler, ``docarray/base.py:40-66``)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    if field_resolver:
        df = df.withColumnsRenamed(field_resolver)
    if known_fields is not None:
        extra = [c for c in df.columns if c not in known_fields]
        if extra:
            kv = []
            for c in extra:
                kv += [F.lit(c), F.col(c).cast("string")]
            df = df.withColumn("tags", F.map_from_arrays(
                F.array(*[F.lit(c) for c in extra]),
                F.array(*[F.col(c).cast("string") for c in extra]),
            )).drop(*extra)
    return df


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """``from_ndjson`` analogue (``document/generators.py:237-309``)."""
    return spark.read.json(path)


def fetch_uris(
    df: DataFrame,
    uri_col: str = "uri",
    out_col: str = "blob",
    as_text: bool = False,
    encoding: str = "utf-8",
    timeout: float = 10.0,
    allow_schemes: tuple[str, ...] = ("file", "data"),
) -> DataFrame:
    """``load_uri_to_blob`` / ``load_uri_to_text`` with REMOTE fetch
    (reference ``document/mixins/blob.py:12-41`` accepts http(s)/data/file
    URIs; round-1 gap #5 — only file globs were supported).

    Executor-side fetch inside ``mapInPandas``: each Arrow batch resolves
    its URIs with urllib on the worker, so the driver never touches
    content and fetches run with full cluster parallelism. Network egress
    from executors is an EXPLICIT opt-in — pass
    ``allow_schemes=("file", "data", "http", "https")`` to enable remote
    schemes; anything outside the allowlist yields an error row, not a
    fetch. Failures land in ``<out_col>_error`` (null on success) instead
    of failing the job — at 100 TB some URLs are always dead.

    → input columns + ``out_col`` (binary, or string when ``as_text``) +
    ``<out_col>_error`` (string)."""
    import pandas as pd
    from pyspark.sql import types as T

    # build a fresh StructType — StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.StringType() if as_text else T.BinaryType()),
            T.StructField(f"{out_col}_error", T.StringType()),
        ]
    )
    schemes = tuple(s.lower() for s in allow_schemes)

    def _fetch_one(uri):
        from urllib.parse import urlparse
        from urllib.request import urlopen

        if uri is None:
            return None, "null uri"
        scheme = (urlparse(str(uri)).scheme or "file").lower()
        if scheme not in schemes:
            return None, f"scheme {scheme!r} not in allow_schemes"
        try:
            if scheme == "data":
                head, _, payload = str(uri).partition(",")
                import base64

                raw = (
                    base64.b64decode(payload)
                    if head.endswith(";base64")
                    else payload.encode(encoding)
                )
            elif scheme == "file":
                path = str(uri)[7:] if str(uri).startswith("file://") else str(uri)
                with open(path, "rb") as f:
                    raw = f.read()
            else:
                with urlopen(str(uri), timeout=timeout) as r:
                    raw = r.read()
            return (raw.decode(encoding) if as_text else raw), None
        except Exception as e:  # noqa: BLE001 — error-row semantics
            return None, f"{type(e).__name__}: {e}"

    def _runner(batches):
        for pdf in batches:
            fetched = [_fetch_one(u) for u in pdf[uri_col]]
            out = pdf.copy()
            out[out_col] = pd.Series([f[0] for f in fetched], index=pdf.index, dtype=object)
            out[f"{out_col}_error"] = pd.Series(
                [f[1] for f in fetched], index=pdf.index, dtype=object
            )
            yield out

    return df.mapInPandas(_runner, schema)


def read_files(
    spark: SparkSession,
    glob: str | list[str],
    recursive: bool = True,
    size: int | None = None,
    sampling_rate: float | None = None,
    read_mode: str | None = "rb",
    to_dataturi: bool = False,
    exclude_regex: str | None = None,
) -> DataFrame:
    """``from_files`` analogue (``document/generators.py:56-124``), full
    option surface:

    - ``glob``: one pattern or a list (shell wildcards, ``**`` when
      ``recursive``).
    - ``read_mode``: ``'rb'`` → blob column, ``'r'`` → UTF-8 text column,
      ``None`` → paths only — and the binaryFile source PRUNES the content
      read when the column isn't selected, so paths-only listing never
      pulls bytes (the reference's lazy-uri mode, for free).
    - ``exclude_regex``: anchored like the reference's ``re.match``;
      tested against the path with its URI scheme stripped (Spark paths
      are URIs, the reference's are local).
    - ``sampling_rate``: DETERMINISTIC md5-of-path Bernoulli (the
      reference uses ``random.random()`` — not replayable across runs;
      a lazily re-executed plan must sample stably).
    - ``size``: max files (limit after sampling, like the generator).
    - ``to_dataturi``: uri becomes a base64 data URI of the content with
      the mimetype guessed from the file extension — the reference's
      ``mimetypes.guess_type`` via the ``mime_type`` property
      (``convert_uri_to_datauri``, ``document/mixins/convert.py:38-51``;
      ``document/data.py:57``), ``application/octet-stream`` when the
      extension is unknown.  NOTE: building the data URI necessarily
      reads the content even under ``read_mode=None`` (the reference's
      generator does the same — ``convert_uri_to_datauri`` pulls the blob,
      ``generators.py:111-114``), so the paths-only content pruning above
      applies only when ``to_dataturi`` is False.
    """
    if read_mode not in ("r", "rb", None):
        raise ValueError(f'read_mode should be "r", "rb" or None, got {read_mode}')
    if exclude_regex is not None:
        import re as _re

        try:
            _re.compile(exclude_regex)
        except _re.error:
            raise ValueError(f"`{exclude_regex}` is not a valid regex.")
    patterns = [glob] if isinstance(glob, str) else list(glob)
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(patterns)
    )
    local = F.regexp_replace(F.col("path"), "^[A-Za-z][A-Za-z0-9+.-]*:/*", "/")
    if exclude_regex is not None:
        df = df.filter(~local.rlike(f"^(?:{exclude_regex})"))
    if sampling_rate is not None:
        from docarray_spark.functions.hashing import hash_unit_col

        df = df.filter(hash_unit_col(F.col("path")) < F.lit(float(sampling_rate)))
    cols = [
        F.col("path").alias("uri"),
        F.col("length"),
        F.col("modificationTime").alias("modification_time"),
    ]
    if read_mode == "rb":
        cols.insert(1, F.col("content").alias("blob"))
    elif read_mode == "r":
        cols.insert(1, F.decode(F.col("content"), "UTF-8").alias("text"))
    if to_dataturi:
        # extension → mimetype as a literal map, matched JVM-side. The
        # table is PINNED (ADVICE r5): mimetypes.types_map merges
        # /etc/mime.types and varies across hosts, which would make the
        # same file produce different uris on different machines.
        # try_element_at, not element_at: under spark.sql.ansi.enabled a
        # missing map key makes element_at THROW instead of returning NULL,
        # so unknown extensions would kill the scan instead of falling back
        # to octet-stream.
        ext_pairs: list[Column] = []
        for ext, mt in sorted(_EXT_MIME.items()):
            ext_pairs += [F.lit(ext), F.lit(mt)]
        mime = F.coalesce(
            F.try_element_at(
                F.create_map(*ext_pairs),
                F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)),
            ),
            F.lit("application/octet-stream"),
        )
        cols[0] = F.concat(
            F.lit("data:"), mime, F.lit(";base64,"), F.base64(F.col("content"))
        ).alias("uri")
    out = df.select(*cols)
    if size is not None:
        out = out.limit(size)
    return out


def from_huggingface_datasets(
    spark: SparkSession,
    dataset_path: str,
    field_resolver: dict[str, str] | None = None,
    size: int | None = None,
    sampling_rate: float | None = None,
    filter_fields: bool = False,
    split: str | None = None,
) -> DataFrame:
    """``from_huggingface_datasets`` analogue
    (``document/generators.py:179-235``, ``io/from_gen.py:134-171``) for a
    dataset saved locally with ``datasets.save_to_disk`` (Arrow IPC files +
    ``state.json``) or exported as parquet. The reference's hub download is
    network plumbing out of scope here (SURVEY §7); the on-disk layouts ARE
    the public interchange format and this reads them Spark-native:

    - a ``DatasetDict`` directory (``dataset_dict.json``) without ``split``
      raises the reference's own "Please provide a split" error listing the
      available splits (``generators.py:214-221``);
    - ``filter_fields=True`` keeps only ``field_resolver`` keys, mirroring
      ``data.set_format(columns=...)`` (``generators.py:224-231``);
    - ``size`` / ``sampling_rate`` subsample like ``_subsample``
      (``generators.py:_subsample``), with a seeded Bernoulli sample instead
      of ``random.random()`` so plans replay deterministically.

    Each ``.arrow`` shard is read with ``pyarrow.ipc`` inside
    ``mapInPandas`` — one task per shard, no driver materialization — so a
    many-shard dataset loads with full cluster parallelism."""
    import glob as _glob
    import json as _json
    import os as _os

    import pyarrow as pa

    if _os.path.isfile(_os.path.join(dataset_path, "dataset_dict.json")):
        with open(_os.path.join(dataset_path, "dataset_dict.json")) as f:
            splits = _json.load(f).get("splits", [])
        if split is None:
            raise ValueError(
                "Please provide a split for dataset using \"split\" argument. "
                f"The following splits are available for this dataset: {splits}"
            )
        dataset_path = _os.path.join(dataset_path, split)

    state_path = _os.path.join(dataset_path, "state.json")
    if _os.path.isfile(state_path):
        with open(state_path) as f:
            files = [
                _os.path.join(dataset_path, d["filename"])
                for d in _json.load(f).get("_data_files", [])
            ]
    else:
        files = sorted(_glob.glob(_os.path.join(dataset_path, "*.arrow")))
    if not files:
        pq_files = sorted(_glob.glob(_os.path.join(dataset_path, "*.parquet")))
        if pq_files:
            df = spark.read.parquet(*pq_files)
        else:
            raise FileNotFoundError(
                f"no HF dataset (state.json/*.arrow/*.parquet) under {dataset_path!r}"
            )
    else:
        from pyspark.sql.pandas.types import from_arrow_schema

        def _open(path):
            try:
                return pa.ipc.open_stream(path)
            except pa.ArrowInvalid:
                return pa.ipc.open_file(path)

        with _open(files[0]) as r0:
            arrow_schema = r0.schema
        spark_schema = from_arrow_schema(arrow_schema)

        def _read_shards(batches):
            for pdf in batches:
                for path in pdf["path"]:
                    reader = _open(path)
                    table = (
                        reader.read_all()
                        if hasattr(reader, "read_all")
                        else pa.Table.from_batches(list(reader))
                    )
                    yield table.to_pandas()

        paths = spark.createDataFrame([(p,) for p in files], "path string").repartition(
            len(files)
        )
        df = paths.mapInPandas(_read_shards, spark_schema)

    if filter_fields:
        if not field_resolver:
            raise ValueError(
                'Filter fields option requires "field_resolver" to be provided.'
            )
        df = df.select(*field_resolver.keys())
    if field_resolver:
        df = df.withColumnsRenamed(field_resolver)
    if sampling_rate is not None:
        df = df.sample(fraction=sampling_rate, seed=42)
    if size is not None:
        df = df.limit(size)
    return df
