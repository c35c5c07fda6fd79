"""Per-document wire codec: ``Document.to_bytes`` / ``from_bytes``.

The reference serializes one document to bytes with
``protocol='pickle'`` (``pickle.dumps(doc)``) or ``'protobuf'``, optionally
compressed with ``lz4|gzip|bz2|lzma|zlib``
(``/root/reference/docarray/document/mixins/porting.py:85-130``,
``helper.py:compress_bytes``). Array-level ``save_binary`` streams those
per-doc frames into one length-prefixed file (``io/binary.py:40-170``) —
replaced here by parquet per SURVEY §4.2; what survives is the PER-DOC wire
format, which users need for queues, caches, and cross-process handoff.

Spark-native shape: an Arrow-batched ``pandas_udf`` maps each row to/from a
``binary`` column — embarrassingly parallel, no shuffle, stays columnar
before and after the codec boundary. ``protocol='pickle'`` frames are
byte-compatible with ``pickle.loads`` anywhere; ``'json'`` frames are the
reference's ``jsonschema`` dict form (``porting.py:66-83``) encoded UTF-8.
Protobuf needs the reference's generated classes — out of scope (NOTES #1).

Compression uses stdlib codecs (gzip/bz2/lzma/zlib; lz4 is not in the
container and raises, mirroring the reference's optional-import behavior).
"""

from __future__ import annotations

import bz2 as _bz2
import gzip as _gzip
import lzma as _lzma
import zlib as _zlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COMPRESSORS = {
    "gzip": (_gzip.compress, _gzip.decompress),
    "bz2": (_bz2.compress, _bz2.decompress),
    "lzma": (_lzma.compress, _lzma.decompress),
    "zlib": (_zlib.compress, _zlib.decompress),
}


def _codec(compress: str | None):
    if compress is None:
        return (lambda b: b), (lambda b: b)
    if compress == "lz4":
        raise ValueError("lz4 is not available in this environment (stdlib codecs: gzip/bz2/lzma/zlib)")
    if compress not in _COMPRESSORS:
        raise ValueError(f"unknown compress {compress!r}; expected one of {sorted(_COMPRESSORS)}")
    return _COMPRESSORS[compress]


def docs_to_bytes(
    df: DataFrame,
    protocol: str = "pickle",
    compress: str | None = None,
    out_col: str = "serialized",
    doc_cols: list[str] | None = None,
) -> DataFrame:
    """``to_bytes`` per document (``porting.py:85-108``): adds ``out_col``
    (binary) holding each row's serialized frame. ``doc_cols`` restricts
    which fields enter the frame (default: all)."""
    cols = doc_cols or df.columns
    comp, _ = _codec(compress)

    if protocol == "pickle":
        import pickle

        def _ser(d: dict) -> bytes:
            return comp(pickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL))

    elif protocol == "json":
        import json

        def _default(o):
            import numpy as np

            if isinstance(o, (bytes, bytearray)):
                import base64

                return base64.b64encode(bytes(o)).decode("ascii")
            if isinstance(o, np.ndarray):
                return o.tolist()
            if isinstance(o, np.generic):
                return o.item()
            raise TypeError(f"not JSON-serializable: {type(o)}")

        def _ser(d: dict) -> bytes:
            return comp(json.dumps(d, sort_keys=True, default=_default).encode("utf-8"))

    else:
        raise ValueError(f"protocol={protocol!r} is not supported (pickle|json; protobuf: NOTES #1)")

    @F.pandas_udf(T.BinaryType())
    def _serialize(s: pd.DataFrame) -> pd.Series:
        # struct input arrives as a pandas DataFrame, one column per field
        return pd.Series([_ser(rec) for rec in s.to_dict("records")])

    return df.withColumn(out_col, _serialize(F.struct(*[F.col(c) for c in cols])))


def docs_from_bytes(
    df: DataFrame,
    schema: T.StructType | str,
    protocol: str = "pickle",
    compress: str | None = None,
    in_col: str = "serialized",
) -> DataFrame:
    """``from_bytes`` per document (``porting.py:110-130``): decode the
    binary frames in ``in_col`` back into typed columns. ``schema`` declares
    the document fields (Spark cannot infer a schema from opaque bytes
    without a driver-side peek, which a 100 TB table forbids)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    _, decomp = _codec(compress)

    if protocol == "pickle":
        import pickle

        def _de(b: bytes) -> dict:
            return pickle.loads(decomp(bytes(b)))

    elif protocol == "json":
        import json

        def _de(b: bytes) -> dict:
            return json.loads(decomp(bytes(b)).decode("utf-8"))

    else:
        raise ValueError(f"protocol={protocol!r} is not supported (pickle|json)")

    names = [f.name for f in schema.fields]

    def _runner(batches):
        for pdf in batches:
            rows = [_de(b) for b in pdf[in_col]]
            out = pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names}, columns=names
            )
            yield out

    return df.select(in_col).mapInPandas(_runner, schema)
