"""The core Document row type.

Mirrors the reference's fixed 20-field Document schema
(``/root/reference/docarray/document/data.py:38-63``, wire schema
``docarray/proto/docarray.proto:63-126``) re-expressed as a Spark
``StructType`` per SURVEY.md §1.2:

* ``chunks``/``matches`` recursion is relationally encoded — every node is a
  row in one ``documents`` table with ``parent_id``/``granularity``
  (``docarray/array/chunk.py:30-45``), matches live in a separate
  ``(query_id, match_id, rank, score)`` table (SURVEY.md §1.4).
* ``tags`` is a dynamic overflow map; typed tag columns (the annlite
  ``columns`` precedent, ``storage/annlite/backend.py:30``) are first-class —
  any extra column named ``tags_<k>`` is treated as a typed tag.
* ``content`` oneof(blob, tensor, text) keeps three physical columns plus a
  ``content_type`` discriminator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NAMED_SCORE = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("op_name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("ref_id", T.StringType()),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("parent_id", T.StringType()),
        T.StructField("granularity", T.IntegerType()),
        T.StructField("adjacency", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("tensor", T.ArrayType(T.FloatType())),
        T.StructField("mime_type", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("uri", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("location", T.ArrayType(T.DoubleType())),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("modality", T.StringType()),
        T.StructField("evaluations", T.MapType(T.StringType(), NAMED_SCORE)),
        T.StructField("scores", T.MapType(T.StringType(), NAMED_SCORE)),
    ]
)

MATCHES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("match_id", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("score", T.DoubleType()),
        T.StructField("metric_name", T.StringType()),
    ]
)


# --------------------------------------------------- multimodal dataclasses

# Modality → physical column type, mirroring the attribute-type registry at
# ``docarray/dataclasses/types.py:35-41,113-124`` (PRIMITIVE /
# ITERABLE_PRIMITIVE / DOCUMENT …). Media modalities are opaque binary +
# metadata per SURVEY.md §1.1; decoded tensors live in ArrayType columns.
MODALITY_TYPES: dict[str, T.DataType] = {
    "text": T.StringType(),
    "image": T.BinaryType(),
    "audio": T.BinaryType(),
    "video": T.BinaryType(),
    "mesh": T.BinaryType(),
    "blob": T.BinaryType(),
    "tabular": T.MapType(T.StringType(), T.StringType()),
    "json": T.StringType(),
    "embedding": T.ArrayType(T.FloatType()),
    "float": T.DoubleType(),
    "int": T.LongType(),
    "str": T.StringType(),
    "bool": T.BooleanType(),
}


def multimodal_schema(fields: dict[str, str], id_field: bool = True) -> T.StructType:
    """Compile a user-declared multimodal dataclass — ``{field: modality}``,
    modality from ``MODALITY_TYPES``, ``list[<modality>]`` for repeated
    fields (``dataclasses/types.py:216-223`` allows one nesting level) —
    into a flat ``StructType``, the engine analogue of the reference's
    Document-tree compile (``document/mixins/multimodal.py:21-98``). The
    modality map itself is the ``multi_modal_schema`` metadata; store it
    alongside the table (e.g. parquet key-value metadata) for decompile."""
    out = [T.StructField("id", T.StringType(), False)] if id_field else []
    for name, modality in fields.items():
        repeated = modality.startswith("list[") and modality.endswith("]")
        inner = modality[5:-1] if repeated else modality
        if inner not in MODALITY_TYPES:
            raise ValueError(
                f"unknown modality {inner!r} for field {name!r} "
                f"(known: {sorted(MODALITY_TYPES)})"
            )
        dt: T.DataType = MODALITY_TYPES[inner]
        if repeated:
            dt = T.ArrayType(dt)
        out.append(T.StructField(name, dt))
    return T.StructType(out)


def empty_documents(spark: SparkSession, n: int) -> DataFrame:
    """n default documents — ``DocumentArray.empty`` analogue
    (``docarray/array/mixins/empty.py``). Distributed via ``spark.range``."""
    return (
        spark.range(n)
        .select(
            F.lower(F.hex(F.unhex(F.md5(F.col("id").cast("string"))))).alias("id"),
            F.col("id").alias("offset"),
            F.lit("").alias("parent_id"),
            F.lit(0).alias("granularity"),
            F.lit(0).alias("adjacency"),
            F.lit(None).cast("binary").alias("blob"),
            F.lit(None).cast("array<float>").alias("tensor"),
            F.lit(None).cast("string").alias("mime_type"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("content_type"),
            F.lit(None).cast("double").alias("weight"),
            F.lit(None).cast("string").alias("uri"),
            F.lit(None).cast("map<string,string>").alias("tags"),
            F.lit(None).cast("array<double>").alias("location"),
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(None).cast("string").alias("modality"),
        )
    )
