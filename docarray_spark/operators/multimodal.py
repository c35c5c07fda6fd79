"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Re-expresses the reference's media mixins —
``/root/reference/docarray/document/mixins/image.py:19-316`` (load / resize /
normalize / channel axis / sliding windows), ``audio.py:13-70``,
``video.py:12-70`` — for a DataFrame where media lives in a ``binary``
column and decoded tensors in flat ``array<float>`` columns with explicit
shape metadata (``height``/``width``/``channels`` or ``n_frames``/…).

Codec boundary: the container has no image/audio libs, so **decoding is
stubbed**: ``decode_fn=None`` uses a clearly-marked deterministic fake
(shape + pixels derived from the bytes, stable across runs/engines) so the
Spark-side plumbing — schema, Arrow batch shape, partitioning — is real and
testable; pass a real ``decode_fn`` (e.g. PIL) in production, and
``decode_fn='raise'`` to get the honest ``NotImplementedError``.

Everything AFTER decode (resize, normalize, channel axis, sliding windows,
frame sampling, audio stats) is real numpy over Arrow batches — no stubs.

Scale notes: per-row media work is embarrassingly parallel; ``mapInPandas``
keeps it batched (Arrow transfer, one numpy call per batch) and inherits the
input partitioning — no shuffle anywhere in this module except the
``posexplode`` in sliding-window chunking, which is a narrow op.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ decode stubs

def fake_decode_image(blob: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE image decoder (container has no PIL): shape and
    pixels derive only from the bytes. (h, w) in 4..11 from the md5 of the
    blob; pixels tile the blob. Replace with a real decoder in production."""
    d = hashlib.md5(blob).digest()
    h, w = 4 + d[0] % 8, 4 + d[1] % 8
    flat = np.frombuffer(blob, dtype=np.uint8)
    need = h * w * 3
    reps = int(np.ceil(need / max(len(flat), 1)))
    px = np.tile(flat, reps)[:need] if len(flat) else np.zeros(need, dtype=np.uint8)
    return px.reshape(h, w, 3).astype(np.float32)


def fake_decode_audio(blob: bytes, sr: int = 16000) -> np.ndarray:
    """DETERMINISTIC FAKE audio decoder: int16 PCM interpretation of the raw
    bytes, normalized to [-1, 1]. Real plumbing, fake codec."""
    n = (len(blob) // 2) * 2
    if n == 0:
        return np.zeros(1, dtype=np.float32)
    return np.frombuffer(blob[:n], dtype="<i2").astype(np.float32) / 32768.0


def _resolve_decode(decode_fn, fake, lib_hint: str = "an image/audio library"):
    if decode_fn == "raise":
        def _raise(*_a):
            raise NotImplementedError(
                f"real media decoding needs {lib_hint}; "
                "pass decode_fn=<callable> or use the "
                "deterministic fake (decode_fn=None)"
            )
        return _raise
    return decode_fn or fake


# ----------------------------------------------------------- image operators

IMAGE_DECODED_FIELDS = "height int, width int, channels int, pixels array<float>"


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    decode_fn: Callable[[bytes], np.ndarray] | str | None = None,
) -> DataFrame:
    """``load_uri_to_image_tensor`` (``image.py:19-63``) over a binary
    column: adds (height, width, channels, pixels-flat-row-major). Arrow
    batches in, one decoded row out per media row; partition-preserving."""
    fn = _resolve_decode(decode_fn, fake_decode_image)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", " + IMAGE_DECODED_FIELDS

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fn(b) if b is not None else None for b in pdf[blob_col]]
            pdf = pdf.copy()
            pdf["height"] = [None if t is None else t.shape[0] for t in decoded]
            pdf["width"] = [None if t is None else t.shape[1] for t in decoded]
            pdf["channels"] = [None if t is None else t.shape[2] for t in decoded]
            pdf["pixels"] = [None if t is None else t.ravel() for t in decoded]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def resize_images(
    df: DataFrame, target_h: int, target_w: int,
    pixels_col: str = "pixels", h_col: str = "height", w_col: str = "width",
    c_col: str = "channels",
) -> DataFrame:
    """``set_image_tensor_shape`` (``image.py:106-130``): nearest-neighbour
    resize — REAL numpy (index-gather), no codec needed."""
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px, h, w, c in zip(pdf[pixels_col], pdf[h_col], pdf[w_col], pdf[c_col]):
                if px is None:
                    out.append(None)
                    continue
                t = np.asarray(px, dtype=np.float32).reshape(int(h), int(w), int(c))
                ri = (np.arange(target_h) * h / target_h).astype(int)
                ci = (np.arange(target_w) * w / target_w).astype(int)
                out.append(t[ri][:, ci].ravel())
            pdf = pdf.copy()
            pdf[pixels_col] = out
            pdf[h_col] = [None if p is None else target_h for p in out]
            pdf[w_col] = [None if p is None else target_w for p in out]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(_resize, schema=schema)


def normalize_images(
    df: DataFrame,
    mean: tuple[float, ...] = (0.485, 0.456, 0.406),
    std: tuple[float, ...] = (0.229, 0.224, 0.225),
    pixels_col: str = "pixels",
    c_col: str = "channels",
) -> DataFrame:
    """``set_image_tensor_normalization`` (``image.py:132-171``): scale to
    [0,1] then channel-wise (x-mean)/std. Real numpy, vectorized per batch."""
    mean_a, std_a = np.asarray(mean, np.float32), np.asarray(std, np.float32)

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px, c in zip(pdf[pixels_col], pdf[c_col]):
                if px is None:
                    out.append(None)
                    continue
                t = np.asarray(px, np.float32).reshape(-1, int(c)) / 255.0
                out.append(((t - mean_a[: int(c)]) / std_a[: int(c)]).ravel())
            pdf = pdf.copy()
            pdf[pixels_col] = out
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(_norm, schema=schema)


def image_sliding_windows(
    df: DataFrame,
    window: int,
    stride: int,
    id_col: str = "id",
    pixels_col: str = "pixels",
    h_col: str = "height",
    w_col: str = "width",
    c_col: str = "channels",
) -> DataFrame:
    """``convert_image_tensor_to_sliding_windows`` with ``as_chunks=True``
    (``image.py:232-316``): tile each image into (window × window) patches →
    one chunk row per patch with ``parent_id``/``granularity``/``offset``
    (the ChunkArray encoding, ``array/chunk.py:30-45``). Patch extraction is
    a numpy stride trick per batch; the explode is narrow (no shuffle)."""
    out_schema = (
        f"id string, parent_id string, granularity int, offset long, "
        f"height int, width int, channels int, pixels array<float>"
    )

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, px, h, w, c in zip(
                pdf[id_col], pdf[pixels_col], pdf[h_col], pdf[w_col], pdf[c_col]
            ):
                if px is None:
                    continue
                h, w, c = int(h), int(w), int(c)
                t = np.asarray(px, np.float32).reshape(h, w, c)
                k = 0
                for i in range(0, h - window + 1, stride):
                    for j in range(0, w - window + 1, stride):
                        rows.append(
                            (
                                f"{rid}.{k}", str(rid), 1, k, window, window, c,
                                t[i : i + window, j : j + window].ravel(),
                            )
                        )
                        k += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "parent_id", "granularity", "offset",
                    "height", "width", "channels", "pixels",
                ],
            )

    return df.mapInPandas(_windows, schema=out_schema)


# ----------------------------------------------------------- audio operators

def decode_audio(
    df: DataFrame,
    blob_col: str = "blob",
    decode_fn: Callable[[bytes], np.ndarray] | str | None = None,
) -> DataFrame:
    """``load_uri_to_audio_tensor`` (``audio.py:34-56``) + summary features:
    adds (n_samples, rms, amax) — stats are real numpy over the decoded
    waveform; the codec is the deterministic fake unless provided."""
    fn = _resolve_decode(decode_fn, fake_decode_audio)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", n_samples long, rms double, amax double"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            ns, rms, amax = [], [], []
            for b in pdf[blob_col]:
                if b is None:
                    ns.append(None), rms.append(None), amax.append(None)
                    continue
                wav = fn(b)
                ns.append(len(wav))
                rms.append(float(np.sqrt(np.mean(wav**2))))
                amax.append(float(np.abs(wav).max()))
            pdf["n_samples"], pdf["rms"], pdf["amax"] = ns, rms, amax
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


# ----------------------------------------------------------- video operators

def sample_frames(
    df: DataFrame,
    every_k: int,
    id_col: str = "id",
    frames_col: str = "frames",
    h_col: str = "height",
    w_col: str = "width",
    c_col: str = "channels",
) -> DataFrame:
    """``load_uri_to_video_tensor`` keyframe sampling (``video.py:12-70``):
    given an already-decoded flat (n_frames*h*w*c) float array, emit every
    k-th frame as a chunk row. Frame slicing is real; video *decoding*
    (ffmpeg) is out of container scope — feed ``frames`` from a real decoder
    in production."""
    out_schema = (
        "id string, parent_id string, granularity int, offset long, "
        "height int, width int, channels int, pixels array<float>"
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, fr, h, w, c in zip(
                pdf[id_col], pdf[frames_col], pdf[h_col], pdf[w_col], pdf[c_col]
            ):
                if fr is None:
                    continue
                h, w, c = int(h), int(w), int(c)
                t = np.asarray(fr, np.float32).reshape(-1, h, w, c)
                for k, fi in enumerate(range(0, t.shape[0], every_k)):
                    rows.append((f"{rid}.{k}", str(rid), 1, k, h, w, c, t[fi].ravel()))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "parent_id", "granularity", "offset",
                    "height", "width", "channels", "pixels",
                ],
            )

    return df.mapInPandas(_sample, schema=out_schema)


# --------------------------------------------------------- mesh / point cloud

def fake_decode_point_cloud(
    blob: bytes, samples: int, start: int = 0
) -> np.ndarray:
    """DETERMINISTIC FAKE mesh surface sampler (container has no
    trimesh): point coordinates TILE the blob's bytes — the same idiom
    as :func:`fake_decode_image` — as float32 integer values 0..255
    (integer-exact in float32, so an ANSI-SQL oracle replays the values
    bit-for-bit; a /255 scaling would diverge in the last float32 ulp).
    ``start`` rotates the tiling (the scene fake gives each geometry a
    distinct rotation). Replace with a real
    ``trimesh.load(...).sample(samples)``-backed callable in
    production."""
    flat = np.frombuffer(blob, dtype=np.uint8)
    need = samples * 3
    if len(flat) == 0:
        return np.zeros((samples, 3), dtype=np.float32)
    idx = (start + np.arange(need)) % len(flat)
    return flat[idx].astype(np.float32).reshape(samples, 3)


def fake_decode_point_cloud_chunks(blob: bytes, samples: int) -> list:
    """DETERMINISTIC FAKE scene decomposition: 1–3 'geometries' (count
    from the blob's md5 first byte, the :func:`fake_decode_image` shape
    idiom), geometry ``g`` sampled via :func:`fake_decode_point_cloud`
    with the tiling rotated by ``g`` — stable across
    runs/partitionings and SQL-replayable."""
    n_geo = 1 + hashlib.md5(blob).digest()[0] % 3
    return [
        fake_decode_point_cloud(blob, samples, start=g)
        for g in range(n_geo)
    ]


POINT_CLOUD_DECODED_FIELDS = "n_points int, points array<float>"


def decode_point_clouds(
    df: DataFrame,
    samples: int,
    blob_col: str = "blob",
    decode_fn: Callable[[bytes, int], np.ndarray] | str | None = None,
) -> DataFrame:
    """``load_uri_to_point_cloud_tensor(samples)`` (``mesh.py:12-42``,
    ``as_chunks=False``) over a binary column: the reference coerces the
    file into ONE combined mesh (``force='mesh'``) and samples
    ``samples`` surface points into ``.tensor`` — here each row gains
    ``(n_points, points)`` with points flat row-major ``(samples·3,)``.
    ``decode_fn(blob, samples) → (samples, 3)`` is the injectable codec
    seam (trimesh in production; deterministic fake in-container;
    ``'raise'`` for the honest NotImplementedError). Arrow batches in,
    partition-preserving, zero shuffle."""
    fn = _resolve_decode(
        decode_fn, fake_decode_point_cloud, lib_hint="a mesh library (trimesh)"
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema += ", " + POINT_CLOUD_DECODED_FIELDS

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pts = [
                None if b is None else np.asarray(fn(b, samples), np.float32)
                for b in pdf[blob_col]
            ]
            pdf = pdf.copy()
            pdf["n_points"] = [None if t is None else t.shape[0] for t in pts]
            pdf["points"] = [None if t is None else t.ravel() for t in pts]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def point_cloud_chunks(
    df: DataFrame,
    samples: int,
    id_col: str = "id",
    blob_col: str = "blob",
    decode_fn: Callable[[bytes, int], list] | str | None = None,
) -> DataFrame:
    """``load_uri_to_point_cloud_tensor(samples, as_chunks=True)``
    (``mesh.py:33-37``): the reference coerces the file into a SCENE and
    appends one chunk Document per geometry, each sampled to ``samples``
    points. Here: one output row per geometry, in the engine's chunk-row
    encoding (``id=parent.k``, ``parent_id``, ``granularity=1``,
    ``offset=k`` — same shape :func:`sample_frames` and the sliding
    windows emit). ``decode_fn(blob, samples) → [(samples, 3), ...]``
    (one array per geometry). Zero shuffle; fan-out is bounded by the
    scene's geometry count."""
    fn = _resolve_decode(
        decode_fn, fake_decode_point_cloud_chunks,
        lib_hint="a mesh library (trimesh)",
    )
    out_schema = (
        "id string, parent_id string, granularity int, offset long, "
        "n_points int, points array<float>"
    )

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                for k, geo in enumerate(fn(b, samples)):
                    t = np.asarray(geo, np.float32)
                    rows.append(
                        (f"{rid}.{k}", str(rid), 1, k, t.shape[0], t.ravel())
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "parent_id", "granularity", "offset",
                    "n_points", "points",
                ],
            )

    return df.mapInPandas(_chunks, schema=out_schema)


def normalize_point_clouds(
    df: DataFrame, points_col: str = "points"
) -> DataFrame:
    """Canonicalize decoded point clouds — translate to the centroid and
    scale into the unit sphere (the standard PointNet-style prep). REAL
    numpy over Arrow batches, no codec needed; partition-preserving."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px in pdf[points_col]:
                if px is None:
                    out.append(None)
                    continue
                t = np.asarray(px, np.float32).reshape(-1, 3)
                t = t - t.mean(axis=0, keepdims=True)
                r = float(np.linalg.norm(t, axis=1).max())
                out.append((t / r if r > 0.0 else t).ravel())
            pdf = pdf.copy()
            pdf[points_col] = out
            yield pdf

    return df.mapInPandas(_norm, schema=out_schema)


# ------------------------------------------------- multimodal dataclass model

def multimodal_schema(fields: list[tuple[str, bool]]) -> dict:
    """Compile an ordered multimodal field declaration into the position map
    the traversal attribute selectors consume (``traverse(nodes,
    '.[banner, paragraphs]', mm_schema=...)``).

    Mirrors the reference's dataclass compiler: a ``@dataclass`` with
    Image/Text/... fields becomes a Document whose chunk at position *i*
    holds field *i*, with the layout stored as ``multi_modal_schema``
    metadata (``dataclasses/types.py:142-229``,
    ``document/mixins/multimodal.py:21-98``). ``fields`` is
    ``[(name, iterable)]`` in declaration order — ``iterable=True`` is the
    reference's ITERABLE_DOCUMENT attribute type (``types.py:35-41``): the
    position chunk is a container whose own chunks are the list elements.
    """
    return {
        name: {"position": i, "iterable": bool(it)}
        for i, (name, it) in enumerate(fields)
    }


def to_multimodal_nodes(
    df,
    fields: list[tuple[str, bool]],
    id_col: str = "id",
    text_cols: dict[str, str] | None = None,
) -> tuple["DataFrame", dict]:
    """Document-tree compiler for multimodal rows: one input row with one
    column per modality field → the adjacency-list nodes table the
    traversal/indexing operators run on, plus the position map.

    Scalar fields (``iterable=False``) read from column ``name`` (string
    content); iterable fields read from column ``name`` as
    ``array<string>``, producing a position-chunk container plus one
    grand-chunk per element. → ``(nodes(id, parent_id, granularity,
    offset, text), mm_schema)``; non-text modalities store their payload
    reference in ``text`` (uri/datauri) per the reference's content-field
    overloading.
    """
    text_cols = text_cols or {}
    sid = F.col(id_col).cast("string")
    parts = [
        df.select(
            sid.alias("id"), F.lit("").alias("parent_id"),
            F.lit(0).alias("granularity"), F.lit(0).cast("long").alias("offset"),
            F.lit(None).cast("string").alias("text"),
        )
    ]
    for pos, (name, iterable) in enumerate(fields):
        col = text_cols.get(name, name)
        chunk_id = F.concat(sid, F.lit(f".{pos}"))
        parts.append(
            df.select(
                chunk_id.alias("id"), sid.alias("parent_id"),
                F.lit(1).alias("granularity"),
                F.lit(pos).cast("long").alias("offset"),
                (F.lit(None).cast("string") if iterable else F.col(col).cast("string")).alias("text"),
            )
        )
        if iterable:
            ex = df.select(sid.alias("_rid"), F.posexplode(col).alias("_i", "_v"))
            parts.append(
                ex.select(
                    F.concat("_rid", F.lit(f".{pos}."), F.col("_i")).alias("id"),
                    F.concat("_rid", F.lit(f".{pos}")).alias("parent_id"),
                    F.lit(2).alias("granularity"),
                    F.col("_i").cast("long").alias("offset"),
                    F.col("_v").cast("string").alias("text"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, multimodal_schema(fields)
