"""Per-document content/scalar functions (SURVEY.md §2.8).

Re-expresses the reference's content-conversion mixins —
``/root/reference/docarray/document/mixins/convert.py:15-51`` (blob⇄tensor,
datauri), ``document/mixins/featurehash.py:14-87`` (hashing-trick
embedding) — as Column expressions where the semantics allow (JVM-side,
codegen, SQL-oracle-able) and Arrow-batched pandas UDFs for the binary
codec, which SQL cannot express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from docarray_spark.operators.text import tokens_col


# -------------------------------------------------------- blob ⇄ tensor codec

_NP_DTYPES = {"float32": np.float32, "float64": np.float64, "int32": np.int32, "int64": np.int64}


def blob_to_tensor_udf(dtype: str = "float32"):
    """``convert_blob_to_tensor`` (``convert.py:15-25``): raw bytes →
    ``array<float>`` via ``np.frombuffer`` per Arrow batch."""
    np_dtype = _NP_DTYPES[dtype]

    @pandas_udf("array<float>")
    def _decode(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: None
            if b is None
            else np.frombuffer(b, dtype=np_dtype).astype(np.float32)
        )

    return _decode


def tensor_to_blob_udf(dtype: str = "float32"):
    """``convert_tensor_to_blob`` (``convert.py:28-36``): inverse codec."""
    np_dtype = _NP_DTYPES[dtype]

    @pandas_udf("binary")
    def _encode(tensors: pd.Series) -> pd.Series:
        return tensors.map(
            lambda t: None if t is None else np.asarray(t, dtype=np_dtype).tobytes()
        )

    return _encode


# ----------------------------------------------------------------- data URIs

def to_datauri_col(blob: Column | str, mime_type: Column | str) -> Column:
    """``convert_uri_to_datauri`` / ``convert_blob_to_datauri``
    (``convert.py:38-51``, ``document/mixins/sugar.py``): RFC-2397 data URI
    from binary content. Pure concat/base64 — JVM-side."""
    b = F.col(blob) if isinstance(blob, str) else blob
    m = F.col(mime_type) if isinstance(mime_type, str) else mime_type
    # Spark's base64() wraps at 76 chars (MIME); strip newlines for a URI
    return F.concat(
        F.lit("data:"), m, F.lit(";base64,"),
        F.regexp_replace(F.base64(b), "[\\r\\n]", ""),
    )


def text_to_datauri_col(text: Column | str, mime: str = "text/plain") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return to_datauri_col(t.cast("binary"), F.lit(mime))


# --------------------------------------------------------- feature hashing

def token_bucket_col(token: Column, n_dims: int) -> Column:
    """Deterministic, engine-portable token→bucket: first 8 hex chars of
    md5 as an int, mod n_dims (the reference uses python ``hash()`` —
    process-dependent; md5 keeps oracles exact, ``featurehash.py:66-87``)."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % n_dims


def feature_hash(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    n_dims: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """``embed_feature_hashing`` (``featurehash.py:14-60``): hashing-trick
    text embedding. tokens → md5 bucket → per-(doc, bucket) count →
    dense ``array<double>`` of length ``n_dims``.

    Physical shape: explode + two-level groupBy — both aggregations combine
    map-side; the shuffle carries (doc, bucket, count) rows, never token
    strings. The dense vector materializes from a map lookup per slot
    (no pivot, no UDF)."""
    toks = df.select(F.col(id_col).alias("_id"), F.explode(tokens_col(text_col)).alias("t"))
    toks = toks.filter(F.col("t") != "")
    counts = (
        toks.select("_id", token_bucket_col(F.col("t"), n_dims).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    buckets = counts.groupBy("_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(n_dims - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)),
    )
    agg = buckets.select(F.col("_id").alias(id_col), vec.alias(out_col))
    return df.join(agg, id_col, "left")


# ----------------------------------------------------- misc scalar parity ops

def any_hash_col(value: Column | str) -> Column:
    """``_any_hash`` (``featurehash.py:66-87``): int-like strings hash to
    their integer value, everything else to an md5-derived int."""
    v = F.col(value) if isinstance(value, str) else value
    s = v.cast("string")
    return F.when(
        s.rlike("^-?[0-9]+$"), s.cast("long")
    ).otherwise(F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))


def content_type_col(text: Column, blob: Column, tensor: Column) -> Column:
    """The ``content`` oneof discriminator (proto L67-76, ``data.py:65-90``):
    which of text/blob/tensor is set, '' if none."""
    return (
        F.when(text.isNotNull() & (text != ""), F.lit("text"))
        .when(blob.isNotNull(), F.lit("blob"))
        .when(tensor.isNotNull() & (F.size(tensor) > 0), F.lit("tensor"))
        .otherwise(F.lit(""))
    )
