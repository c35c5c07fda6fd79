"""Multimodal plumbing tests: schema, Arrow batch shape, chunk encoding
(reference: document/mixins/image.py, audio.py, video.py). Decode is the
deterministic fake; every post-decode op is real numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.multimodal import (
    decode_audio,
    decode_images,
    fake_decode_image,
    image_sliding_windows,
    normalize_images,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(str(i), bytes(range(10 + i * 7))) for i in range(6)] + [("null", None)]
    return spark.createDataFrame(rows, "id string, blob binary")


def test_decode_images_schema_and_determinism(spark, media):
    out = decode_images(media)
    assert [f.name for f in out.schema.fields] == [
        "id", "blob", "height", "width", "channels", "pixels"
    ]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["null"]["pixels"] is None
    r0 = rows["0"]
    expect = fake_decode_image(bytes(range(10)))
    assert (r0["height"], r0["width"], r0["channels"]) == expect.shape
    np.testing.assert_allclose(np.array(r0["pixels"]), expect.ravel())
    # stable across runs
    again = {r["id"]: r for r in decode_images(media).collect()}
    assert again["3"]["pixels"] == rows["3"]["pixels"]


def test_decode_raise_mode(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        decode_images(media.filter("blob is not null"), decode_fn="raise").collect()


def test_resize_and_normalize(spark, media):
    dec = decode_images(media.filter("blob is not null"))
    res = resize_images(dec, 5, 4)
    for r in res.collect():
        assert (r["height"], r["width"]) == (5, 4)
        assert len(r["pixels"]) == 5 * 4 * r["channels"]
    norm = normalize_images(res)
    px = np.array(norm.filter("id = '0'").collect()[0]["pixels"])
    raw = np.array(res.filter("id = '0'").collect()[0]["pixels"]).reshape(-1, 3) / 255.0
    np.testing.assert_allclose(
        px.reshape(-1, 3),
        (raw - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5,
    )


def test_sliding_windows_chunk_encoding(spark):
    # one 6x6x1 image with pixel value = row*6+col
    t = np.arange(36, dtype=np.float32)
    df = spark.createDataFrame(
        [("img", 6, 6, 1, t.tolist())],
        "id string, height int, width int, channels int, pixels array<float>",
    )
    chunks = image_sliding_windows(df, window=3, stride=3)
    rows = sorted(chunks.collect(), key=lambda r: r["offset"])
    assert len(rows) == 4
    assert all(r["parent_id"] == "img" and r["granularity"] == 1 for r in rows)
    assert rows[0]["id"] == "img.0" and rows[3]["offset"] == 3
    np.testing.assert_allclose(
        np.array(rows[0]["pixels"]), t.reshape(6, 6)[:3, :3].ravel()
    )
    np.testing.assert_allclose(
        np.array(rows[3]["pixels"]), t.reshape(6, 6)[3:, 3:].ravel()
    )


def test_decode_audio_stats(spark):
    wav = (np.sin(np.linspace(0, 8 * np.pi, 256)) * 20000).astype("<i2")
    df = spark.createDataFrame([("a", wav.tobytes())], "id string, blob binary")
    out = decode_audio(df).collect()[0]
    assert out["n_samples"] == 256
    ref = wav.astype(np.float32) / 32768.0
    assert out["rms"] == pytest.approx(float(np.sqrt(np.mean(ref**2))), rel=1e-6)
    assert out["amax"] == pytest.approx(float(np.abs(ref).max()), rel=1e-6)


def test_decode_audio_signed_and_short_edges(spark):
    """int16 decode is SIGNED little-endian (a high byte >= 0x80 makes a
    negative sample whose |value| drives amax) and sub-sample blobs decode
    to zeros(1) — the exact semantics the mm_image_chunks audio oracle
    replays in SQL (ADVICE r4)."""
    neg = b"\x00\x80"  # int16 -32768 -> sample -1.0, amax 1.0
    rows = [("neg", neg), ("short", b"x"), ("empty", b"")]
    df = spark.createDataFrame(rows, "id string, blob binary")
    out = {r["id"]: r for r in decode_audio(df).collect()}
    assert out["neg"]["n_samples"] == 1
    assert out["neg"]["amax"] == pytest.approx(1.0)
    for k in ("short", "empty"):
        assert out[k]["n_samples"] == 1 and out[k]["amax"] == 0.0


def test_sample_frames(spark):
    frames = np.stack([np.full((2, 2, 1), i, np.float32) for i in range(10)])
    df = spark.createDataFrame(
        [("v", 2, 2, 1, frames.ravel().tolist())],
        "id string, height int, width int, channels int, frames array<float>",
    )
    out = sorted(sample_frames(df, every_k=4).collect(), key=lambda r: r["offset"])
    assert [r["offset"] for r in out] == [0, 1, 2]
    assert [r["pixels"][0] for r in out] == [0.0, 4.0, 8.0]
    assert all(r["parent_id"] == "v" for r in out)


def test_multimodal_schema_compile(spark):
    from docarray_spark.schema import multimodal_schema

    schema = multimodal_schema(
        {"banner": "image", "caption": "text", "frames": "list[image]",
         "score": "float", "emb": "embedding"}
    )
    names = [f.name for f in schema.fields]
    assert names == ["id", "banner", "caption", "frames", "score", "emb"]
    assert schema["banner"].dataType.typeName() == "binary"
    assert schema["frames"].dataType.simpleString() == "array<binary>"
    assert schema["emb"].dataType.simpleString() == "array<float>"
    # a frame built against the compiled schema round-trips
    df = spark.createDataFrame(
        [("a", b"\x01", "hi", [b"\x02", b"\x03"], 0.5, [1.0, 2.0])], schema
    )
    row = df.collect()[0]
    assert row["frames"] == [b"\x02", b"\x03"]
    with pytest.raises(ValueError, match="unknown modality"):
        multimodal_schema({"x": "hologram"})


def test_multimodal_dataclass_tree_and_attribute_access(spark):
    """Dataclass-style multimodal rows compile to the adjacency tree and
    the attribute selectors resolve fields by position (reference
    dataclasses/types.py:142-229 semantics)."""
    from docarray_spark.operators.multimodal import to_multimodal_nodes
    from docarray_spark.operators import traverse

    df = spark.createDataFrame(
        [(1, "Title A", ["p1", "p2"]), (2, "Title B", ["q1"])],
        "id long, banner string, paragraphs array<string>",
    )
    nodes, mm = to_multimodal_nodes(
        df, [("banner", False), ("paragraphs", True)]
    )
    assert mm == {
        "banner": {"position": 0, "iterable": False},
        "paragraphs": {"position": 1, "iterable": True},
    }
    # tree shape: 2 roots + 2x2 position chunks + 3 paragraph elements
    assert nodes.count() == 2 + 4 + 3
    banners = traverse(nodes, ".[banner]", mm_schema=mm)
    assert sorted(r.text for r in banners.collect()) == ["Title A", "Title B"]
    paras = traverse(nodes, ".[paragraphs]", mm_schema=mm)
    assert sorted(r.text for r in paras.collect()) == ["p1", "p2", "q1"]
    both = traverse(nodes, ".[banner, paragraphs]", mm_schema=mm)
    assert both.count() == 5


# ----------------------------------------------------- mesh / point cloud

def test_decode_point_clouds_schema_and_determinism(spark, media):
    """VERDICT r10 #7: the mesh converter family
    (load_uri_to_point_cloud_tensor, mesh.py:12-42) behind the same
    injectable decode seam as image/audio — deterministic fake sampler,
    real Spark plumbing."""
    from docarray_spark.operators.multimodal import (
        decode_point_clouds,
        fake_decode_point_cloud,
    )

    out = decode_point_clouds(media, samples=32)
    assert [f.name for f in out.schema.fields] == [
        "id", "blob", "n_points", "points"
    ]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["null"]["points"] is None
    r0 = rows["0"]
    assert r0["n_points"] == 32
    assert len(r0["points"]) == 32 * 3
    expect = fake_decode_point_cloud(bytes(range(10)), 32)
    np.testing.assert_allclose(np.array(r0["points"]), expect.ravel())
    # stable across runs and partitionings
    again = {
        r["id"]: r
        for r in decode_point_clouds(media.repartition(5), samples=32).collect()
    }
    assert again["3"]["points"] == rows["3"]["points"]


def test_point_cloud_chunks_encoding(spark, media):
    """as_chunks=True (mesh.py:33-37): one chunk row per scene geometry
    in the engine's chunk-row encoding (same shape sample_frames emits),
    each sampled to `samples` points."""
    from docarray_spark.operators.multimodal import (
        fake_decode_point_cloud_chunks,
        point_cloud_chunks,
    )

    out = point_cloud_chunks(media, samples=16).toPandas()
    assert list(out.columns) == [
        "id", "parent_id", "granularity", "offset", "n_points", "points"
    ]
    # null blob contributes no chunks; every other row 1-3 geometries
    assert "null" not in set(out.parent_id)
    per_parent = out.groupby("parent_id").size()
    assert per_parent.between(1, 3).all()
    blob0 = bytes(range(10))
    want = fake_decode_point_cloud_chunks(blob0, 16)
    got = out[out.parent_id == "0"].sort_values("offset")
    assert len(got) == len(want)
    assert got.id.tolist() == [f"0.{k}" for k in range(len(want))]
    assert (got.granularity == 1).all()
    assert (got.n_points == 16).all()
    np.testing.assert_allclose(
        np.array(got.iloc[0]["points"]), want[0].ravel()
    )


def test_normalize_point_clouds_real_numpy(spark, media):
    """Post-decode canonicalization is REAL (centroid at 0, max radius
    1) — the PointNet-style prep a training pipeline runs after decode."""
    from docarray_spark.operators.multimodal import (
        decode_point_clouds,
        normalize_point_clouds,
    )

    out = normalize_point_clouds(decode_point_clouds(media, samples=64))
    for r in out.collect():
        if r["points"] is None:
            continue
        t = np.asarray(r["points"], np.float32).reshape(-1, 3)
        np.testing.assert_allclose(t.mean(axis=0), 0.0, atol=1e-5)
        assert abs(np.linalg.norm(t, axis=1).max() - 1.0) < 1e-5


def test_point_cloud_raise_mode_and_injected_decoder(spark, media):
    from docarray_spark.operators.multimodal import (
        decode_point_clouds,
        point_cloud_chunks,
    )

    nn = media.filter("blob is not null")
    with pytest.raises(Exception, match="NotImplementedError|trimesh"):
        decode_point_clouds(nn, samples=8, decode_fn="raise").collect()
    with pytest.raises(Exception, match="NotImplementedError|trimesh"):
        point_cloud_chunks(nn, samples=8, decode_fn="raise").collect()

    # the seam takes a real decoder: constant plane z=len(blob)
    def plane(blob, samples):
        t = np.zeros((samples, 3), np.float32)
        t[:, 2] = len(blob)
        return t

    got = decode_point_clouds(nn, samples=4, decode_fn=plane).collect()
    for r in got:
        t = np.asarray(r["points"], np.float32).reshape(-1, 3)
        assert (t[:, 2] == len(r["blob"])).all()
