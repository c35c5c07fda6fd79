"""Named-artifact registry: ``push`` / ``pull`` re-expressed for Spark.

The reference transmits a serialized ``DocumentArray`` to a cloud artifact
store under a user-chosen name and retrieves it later
(``/root/reference/docarray/array/mixins/io/pushpull.py:52-215``): push with
the same name overwrites, pull streams the bytes back and optionally caches
locally. The cloud endpoint itself is out of scope here (SURVEY §7); what
this module keeps is the *semantics* — a name → dataset clipboard with
overwrite-on-push — re-expressed storage-first: the artifact payload is
parquet written by the cluster (columnar, splittable, predicate-pushdown on
pull) instead of a single length-prefixed binary blob streamed through one
socket, so both push and pull run with full executor parallelism and a
100 TB artifact is just a bigger directory.

The registry root is any Hadoop-compatible path (local dir, HDFS, object
store); a ``manifest.json`` per artifact records schema + row count so
``list_artifacts`` works without opening parquet footers. Manifest and
directory operations dispatch on the root's scheme (ADVICE r2 #1): plain
local paths use direct os IO; scheme'd roots (``hdfs://``, ``s3a://``, …)
route through the Hadoop FileSystem API of the active SparkSession's JVM,
so push/pull/list/delete all honor the advertised path types.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def _is_remote(path: str) -> bool:
    # any scheme'd URI (file:// included) goes through Hadoop FS — plain
    # paths use direct os IO and need no SparkSession
    return "://" in path


def _hadoop_fs(path_str: str, spark: SparkSession | None):
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"registry root {path_str!r} needs the Hadoop FileSystem API — "
            "start a SparkSession first (or pass spark=)"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _exists(path: str, spark: SparkSession | None = None) -> bool:
    if not _is_remote(path):
        return os.path.exists(path)
    fs, jpath, _ = _hadoop_fs(path, spark)
    return fs.exists(jpath)


def _write_text(path: str, text: str, spark: SparkSession | None = None) -> None:
    if not _is_remote(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    spark = spark or SparkSession.getActiveSession()
    fs, jpath, jvm = _hadoop_fs(path, spark)
    # ADVICE r3/r4: a direct create() is not atomic — a concurrent
    # pull/list can read a truncated manifest. On rename-atomic
    # filesystems (HDFS, local) write a UNIQUE temp file (fixed '.tmp'
    # collides under concurrent writers) and rename over the target with
    # FileContext + Options.Rename.OVERWRITE — the overwrite rename is a
    # single atomic op, with no delete-then-rename window where the
    # manifest doesn't exist. On object stores rename is a copy, so
    # direct create stays (their PUT is already atomic anyway).
    scheme = (jpath.toUri().getScheme() or "").lower()
    rename_is_copy = scheme in ("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss")
    if rename_is_copy:
        out = fs.create(jpath, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return
    import uuid

    target = jvm.org.apache.hadoop.fs.Path(f"{path}.{uuid.uuid4().hex}.tmp")
    out = fs.create(target, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        Rename = jvm.org.apache.hadoop.fs.Options.Rename
        opts = spark.sparkContext._gateway.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jpath.toUri(), fs.getConf()
        )
        fc.rename(target, jpath, opts)
    except Exception:
        # filesystems without a FileContext AbstractFileSystem binding:
        # fall back to delete+rename (non-overwriting rename semantics) —
        # still unique-temp'd, but with the brief no-file window
        fs.delete(jpath, False)
        if not fs.rename(target, jpath):
            raise IOError(f"atomic rename failed for {path!r}")


def _read_text(path: str, spark: SparkSession | None = None) -> str:
    if not _is_remote(path):
        with open(path) as f:
            return f.read()
    fs, jpath, jvm = _hadoop_fs(path, spark)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _list_subdirs(root: str, spark: SparkSession | None = None) -> list[str]:
    if not _is_remote(root):
        if not os.path.isdir(root):
            return []
        return sorted(os.listdir(root))
    fs, jpath, _ = _hadoop_fs(root, spark)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(jpath) if st.isDirectory()
    )


def _list_filenames(root: str, spark: SparkSession | None = None) -> list[str]:
    """Plain FILES directly under ``root`` (``_list_subdirs`` lists
    directories on remote filesystems) — the shard-export manifest
    listing, bounded by the snapshot-retention policy."""
    if not _is_remote(root):
        if not os.path.isdir(root):
            return []
        return sorted(
            n for n in os.listdir(root)
            if os.path.isfile(os.path.join(root, n))
        )
    fs, jpath, _ = _hadoop_fs(root, spark)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(jpath) if st.isFile()
    )


def _delete_file(path: str, spark: SparkSession | None = None) -> bool:
    """Delete ONE file (non-recursive) on local or any Hadoop-compatible
    filesystem; True when something was removed."""
    if not _is_remote(path):
        if os.path.isfile(path):
            os.remove(path)
            return True
        return False
    fs, jpath, _ = _hadoop_fs(path, spark)
    if fs.exists(jpath):
        return fs.delete(jpath, False)
    return False


def _delete_dir(path: str, spark: SparkSession | None = None) -> bool:
    if not _is_remote(path):
        if os.path.isdir(path):
            shutil.rmtree(path)
            return True
        return False
    fs, jpath, _ = _hadoop_fs(path, spark)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))

_DEFAULT_REGISTRY = os.path.join(os.path.expanduser("~"), ".docarray_spark", "registry")


def _registry_root(registry: str | None) -> str:
    return registry or os.environ.get("DOCARRAY_SPARK_REGISTRY", _DEFAULT_REGISTRY)


def _join(root: str, *parts: str) -> str:
    if _is_remote(root):
        return "/".join([root.rstrip("/")] + list(parts))
    return os.path.join(root, *parts)


def _artifact_dir(name: str, registry: str | None) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"artifact name must be a plain identifier, got {name!r}")
    return _join(_registry_root(registry), name)


def push(df: DataFrame, name: str, registry: str | None = None) -> dict:
    """Store ``df`` under ``name``, overwriting any existing artifact with
    the same name (the reference's "public clipboard" overwrite rule,
    ``pushpull.py:54-58``). Returns the manifest dict, mirroring the
    reference returning the upload response data."""
    art = _artifact_dir(name, registry)
    data_dir = _join(art, "data")
    df.write.mode("overwrite").parquet(data_dir)
    n = df.sparkSession.read.parquet(data_dir).count()
    manifest = {
        "name": name,
        "num_docs": n,
        "schema": json.loads(df.schema.json()),
        "pushed_at": time.time(),
        "format": "parquet",
    }
    _write_text(_join(art, "manifest.json"), json.dumps(manifest), df.sparkSession)
    return manifest


def pull(spark: SparkSession, name: str, registry: str | None = None) -> DataFrame:
    """Retrieve the artifact pushed under ``name`` (``pushpull.py:136-215``).
    Returns a lazy DataFrame over the stored parquet — nothing is
    downloaded driver-side; scans happen where the query runs."""
    art = _artifact_dir(name, registry)
    if not _exists(_join(art, "manifest.json"), spark):
        raise FileNotFoundError(f"no artifact named {name!r} in registry {_registry_root(registry)!r}")
    return spark.read.parquet(_join(art, "data"))


def list_artifacts(
    registry: str | None = None, spark: SparkSession | None = None
) -> list[dict]:
    """Manifests of every pushed artifact, newest first. ``spark`` is only
    needed for scheme'd (non-local) registry roots."""
    root = _registry_root(registry)
    out = []
    for name in _list_subdirs(root, spark):
        mf = _join(root, name, "manifest.json")
        if _exists(mf, spark):
            out.append(json.loads(_read_text(mf, spark)))
    return sorted(out, key=lambda m: m.get("pushed_at", 0), reverse=True)


def delete_artifact(
    name: str, registry: str | None = None, spark: SparkSession | None = None
) -> bool:
    """Remove a pushed artifact; True if it existed. ``spark`` is only
    needed for scheme'd (non-local) registry roots."""
    art = _artifact_dir(name, registry)
    return _delete_dir(art, spark)
