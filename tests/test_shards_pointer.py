"""Round-11 shard-export hardening (VERDICT/ADVICE r10).

Object-store-safe full-rewrite swap: a versioned export directory behind
an atomically-flipped one-line ``_CURRENT`` pointer file (the same
sidecar discipline the index stores use) instead of a directory
rename-pair — on S3A/GCS a directory rename is a non-atomic O(data)
copy+delete with an hours-long half-renamed window at 100 TB, while a
one-object pointer PUT is atomic everywhere. Plus: crash recovery for
the rename-mode swap, layout knobs persisted in a ``_shard_layout.json``
sidecar (a forgetful merge can no longer collapse a multi-file export),
and an integer full-rewrite threshold (float multiply flips the route at
exact fractional thresholds).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from docarray_spark.sources import (
    merge_shards,
    resolve_shards_path,
    save_shards,
    shard_col,
)


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


N = 8


class TestPointerMode:
    @pytest.fixture()
    def store(self, docs, tmp_path):
        path = str(tmp_path / "ptr")
        m = save_shards(
            docs, path, n_shards=N, id_col="doc_id",
            order_within=["doc_id"], swap_mode="pointer",
        )
        return path, m.toPandas()

    def test_save_layout_and_resolve(self, spark, docs, store):
        path, m = store
        # pointer + sidecar at the root, data in a hidden version dir
        assert open(os.path.join(path, "_CURRENT")).read() == "_v_0000000001"
        data_root = resolve_shards_path(path, spark)
        assert data_root == os.path.join(path, "_v_0000000001")
        assert not any(
            d.startswith("shard=") for d in os.listdir(path)
        )  # nothing visible at the root — readers MUST resolve
        back = spark.read.parquet(data_root).drop("shard")
        a = docs.toPandas().sort_values("doc_id", ignore_index=True)
        b = back.toPandas()[a.columns.tolist()].sort_values(
            "doc_id", ignore_index=True
        )
        assert a.equals(b)
        sidecar = json.load(open(os.path.join(path, "_shard_layout.json")))
        assert sidecar["swap_mode"] == "pointer"
        assert sidecar["n_shards"] == N
        assert sidecar["manifest_version"] == 2

    def test_manifest_matches_rename_mode(self, spark, docs, store, tmp_path):
        """content_sum/rows are swap-layout independent: the pointer-mode
        manifest equals the rename-mode manifest of the same corpus."""
        path, m_ptr = store
        other = str(tmp_path / "ren")
        m_ren = save_shards(
            docs, other, n_shards=N, id_col="doc_id",
            order_within=["doc_id"], swap_mode="rename",
        ).toPandas()
        cols = ["shard", "rows", "id_min", "id_max", "content_sum"]
        assert m_ptr[cols].reset_index(drop=True).equals(
            m_ren[cols].reset_index(drop=True)
        )

    def test_full_rewrite_flips_version(self, spark, docs, store):
        path, _ = store
        batch = docs.withColumn("text", F.upper("text"))  # touches all
        m = merge_shards(batch, path, id_col="doc_id").toPandas()
        assert len(m) == N
        assert open(os.path.join(path, "_CURRENT")).read() == "_v_0000000002"
        assert not os.path.isdir(os.path.join(path, "_v_0000000001"))  # GC'd
        back = spark.read.parquet(resolve_shards_path(path, spark))
        assert back.count() == docs.count()
        assert back.filter(F.col("text") != F.upper("text")).count() == 0

    def test_cow_merge_stays_in_version(self, spark, docs, store):
        path, _ = store
        data_root = resolve_shards_path(path, spark)
        batch = docs.filter(F.col("doc_id") < 5).withColumn(
            "text", F.lit("UPDATED")
        )
        m = merge_shards(batch, path, id_col="doc_id").toPandas()
        assert 0 < len(m) < N  # touched shards only — COW route
        # no version bump: rewritten in place inside the current version
        assert resolve_shards_path(path, spark) == data_root
        back = spark.read.parquet(data_root)
        assert back.count() == docs.count()
        assert back.filter(F.col("text") == "UPDATED").count() == 5

    def test_crash_between_write_and_flip_serves_old(
        self, spark, docs, store, monkeypatch
    ):
        """THE pointer-mode guarantee: a death after the new version dir
        is fully written but before the pointer flip leaves readers on
        the old, complete version — and the next rewrite GCs the stale
        partial and succeeds."""
        import docarray_spark.sources.registry as registry

        path, _ = store
        orig = registry._write_text

        def dying(p, text, spark=None):
            if p.endswith("_CURRENT"):
                raise RuntimeError("injected crash before pointer flip")
            return orig(p, text, spark)

        monkeypatch.setattr(registry, "_write_text", dying)
        batch = docs.withColumn("text", F.upper("text"))
        with pytest.raises(RuntimeError, match="injected crash"):
            merge_shards(batch, path, id_col="doc_id")
        # old version still served, old data intact
        assert resolve_shards_path(path, spark).endswith("_v_0000000001")
        back = spark.read.parquet(resolve_shards_path(path, spark))
        assert back.count() == docs.count()
        assert back.filter(F.col("text") == F.upper("text")).count() == 0
        # stale never-published version dir survives the crash ...
        assert os.path.isdir(os.path.join(path, "_v_0000000002"))
        monkeypatch.setattr(registry, "_write_text", orig)
        # ... and the re-run merge GCs it, publishes, and reads flip over
        m = merge_shards(batch, path, id_col="doc_id").toPandas()
        assert len(m) == N
        assert resolve_shards_path(path, spark).endswith("_v_0000000002")
        back = spark.read.parquet(resolve_shards_path(path, spark))
        assert back.filter(F.col("text") != F.upper("text")).count() == 0


class TestRenameCrashRecovery:
    def test_restores_parked_old_export(self, spark, docs, tmp_path):
        """ADVICE r10: a hard death between rename(path -> .__old__) and
        rename(tmp -> path) leaves the live export ABSENT. merge_shards
        must detect and restore the parked old export before proceeding
        (the conservative mirror of the stale-leftover delete)."""
        path = str(tmp_path / "crashy")
        save_shards(docs, path, n_shards=4, id_col="doc_id")
        # simulate the crash window: live dir parked, finished rewrite
        # left behind as the temp sibling
        os.rename(path, path + ".__old__")
        os.makedirs(path + ".__rewrite__")
        batch = docs.withColumn("text", F.upper("text"))
        m = merge_shards(batch, path, id_col="doc_id").toPandas()
        assert len(m) == 4
        assert not os.path.isdir(path + ".__old__")
        assert not os.path.isdir(path + ".__rewrite__")
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        assert back.filter(F.col("text") != F.upper("text")).count() == 0


class TestLayoutSidecar:
    def test_merge_defaults_to_stored_layout(self, spark, docs, tmp_path):
        """ADVICE r10: merge without re-passed knobs must NOT collapse a
        files_per_shard=2 export to single-file layout — the sidecar
        supplies the stored values."""
        path = str(tmp_path / "multi")
        save_shards(
            docs, path, n_shards=4, id_col="doc_id", files_per_shard=2
        )
        batch = docs.withColumn("text", F.upper("text"))
        # no layout knobs, not even n_shards — everything from sidecar;
        # full rewrite (touches all shards) would have collapsed pre-r11
        m = merge_shards(batch, path).toPandas()
        assert len(m) == 4
        # same file scatter a fresh files_per_shard=2 export of the same
        # ids produces (sub-split is id-deterministic) — NOT collapsed
        ref = str(tmp_path / "ref")
        m_ref = save_shards(
            batch, ref, n_shards=4, id_col="doc_id", files_per_shard=2
        ).toPandas()
        assert m["files"].tolist() == m_ref["files"].tolist()
        assert (m["files"] > 1).any()
        assert spark.read.parquet(path).count() == docs.count()

    def test_explicit_mismatch_raises(self, spark, docs, tmp_path):
        path = str(tmp_path / "strict")
        save_shards(
            docs, path, n_shards=4, id_col="doc_id", files_per_shard=2
        )
        batch = docs.limit(3)
        with pytest.raises(ValueError, match="files_per_shard"):
            merge_shards(batch, path, files_per_shard=1)
        with pytest.raises(ValueError, match="n_shards"):
            merge_shards(batch, path, n_shards=8)
        with pytest.raises(ValueError, match="hash_method"):
            merge_shards(batch, path, hash_method="xxhash64")

    def test_legacy_export_without_sidecar(self, spark, docs, tmp_path):
        """Exports written before the sidecar existed: explicit knobs
        keep working; omitting n_shards is an error (nothing to load)."""
        path = str(tmp_path / "legacy")
        save_shards(docs, path, n_shards=4, id_col="doc_id")
        os.remove(os.path.join(path, "_shard_layout.json"))
        with pytest.raises(ValueError, match="n_shards is required"):
            merge_shards(docs.limit(3), path, id_col="doc_id")
        m = merge_shards(
            docs.limit(3).withColumn("text", F.lit("X")),
            path, n_shards=4, id_col="doc_id",
        ).toPandas()
        assert len(m) >= 1
        assert spark.read.parquet(path).filter(
            F.col("text") == "X"
        ).count() == 3

    def test_rename_full_rewrite_preserves_sidecar(
        self, spark, docs, tmp_path
    ):
        """The rename swap replaces the whole root dir — the sidecar must
        travel inside the swapped-in tree, not vanish."""
        path = str(tmp_path / "keep")
        save_shards(
            docs, path, n_shards=4, id_col="doc_id", files_per_shard=2
        )
        merge_shards(docs.withColumn("text", F.upper("text")), path)
        sidecar = json.load(open(os.path.join(path, "_shard_layout.json")))
        assert sidecar["files_per_shard"] == 2
        assert sidecar["n_shards"] == 4


class TestIntegerThreshold:
    def test_exact_fraction_fires_full_rewrite(self, spark, docs, tmp_path):
        """ADVICE r10: full_rewrite_at=7/25 with exactly 7 affected
        shards — float multiply gives 7.000000000000001, so the old
        ``len(affected) >= f * n`` compare silently took the COW route;
        the integer threshold fires the rewrite (manifest covers ALL
        shards, not just the touched 7)."""
        n = 25
        f = 7 / 25
        assert 7 < f * n  # the FP hazard this test pins
        path = str(tmp_path / "thr")
        save_shards(docs, path, n_shards=n, id_col="doc_id")
        assigned = docs.withColumn("s", shard_col("doc_id", n))
        batch = assigned.filter(F.col("s") < 7).drop("s").withColumn(
            "text", F.lit("REWRITE")
        )
        touched = {
            r.s for r in assigned.filter(F.col("s") < 7)
            .select("s").distinct().collect()
        }
        assert len(touched) == 7  # exactly at the fractional threshold
        m = merge_shards(batch, path, full_rewrite_at=f).toPandas()
        assert set(m.shard) == set(range(n))  # full-rewrite route taken


class TestStreamLayoutPassthrough:
    def test_stream_preserves_stored_layout(self, spark, docs, tmp_path):
        """stream_merge_shards with NO layout knobs against an existing
        multi-file export keeps the stored layout (sidecar-driven)."""
        from docarray_spark.streaming import read_stream, stream_merge_shards

        path = str(tmp_path / "sms")
        save_shards(
            docs, path, n_shards=4, id_col="doc_id", files_per_shard=2
        )
        src = str(tmp_path / "src")
        docs.withColumn("text", F.upper("text")).write.parquet(src)
        sdf = read_stream(spark, src, schema=docs.schema)
        q = stream_merge_shards(
            sdf, path,
            checkpoint=str(tmp_path / "ckpt"),
            full_rewrite_at=0.0,  # force the rewrite route
        )
        q.awaitTermination(120)
        # same file scatter a fresh files_per_shard=2 export produces —
        # the stored layout survived the knob-less streaming merge
        ref = str(tmp_path / "ref")
        m_ref = save_shards(
            docs.withColumn("text", F.upper("text")), ref,
            n_shards=4, id_col="doc_id", files_per_shard=2,
        ).toPandas()
        from docarray_spark.sources.writers import _shard_sizes

        sizes = _shard_sizes(path, spark)
        assert [sizes[s][0] for s in sorted(sizes)] == m_ref["files"].tolist()
        assert any(v[0] > 1 for v in sizes.values())
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        assert back.filter(F.col("text") != F.upper("text")).count() == 0


class TestReadShards:
    def test_resolves_and_prunes_both_modes(self, spark, docs, tmp_path):
        """read_shards: one reader call for either swap mode, with the
        shard filter landing in PartitionFilters (a dataloader rank
        scans only its own shard=N dirs)."""
        from docarray_spark.plans.audit import partition_filters
        from docarray_spark.sources import read_shards

        for mode in ("rename", "pointer"):
            path = str(tmp_path / mode)
            save_shards(
                docs, path, n_shards=4, id_col="doc_id", swap_mode=mode
            )
            back = read_shards(spark, path)
            assert back.count() == docs.count()
            pruned = read_shards(spark, path, shards=[1, 2])
            want = docs.select(
                shard_col("doc_id", 4).alias("s")
            ).filter(F.col("s").isin([1, 2])).count()
            assert pruned.count() == want
            pf = partition_filters(pruned)
            assert pf, f"{mode}: shard filter not pushed to the scan"


class TestVersionRetention:
    def test_keep_versions_holds_previous_snapshot(
        self, spark, docs, tmp_path
    ):
        """Snapshot retention (r11 self-review): keep_versions=2 holds
        the superseded version through one rewrite cycle so an
        epoch-long reader that resolved the pointer pre-rewrite keeps
        its files; the next rewrite GCs it."""
        path = str(tmp_path / "kv")
        save_shards(
            docs, path, n_shards=4, id_col="doc_id",
            swap_mode="pointer", keep_versions=2,
        )
        v = lambda n: os.path.join(path, f"_v_{n:010d}")  # noqa: E731
        merge_shards(
            docs.withColumn("text", F.upper("text")), path
        )  # full rewrite -> v2; v1 retained under keep_versions=2
        assert os.path.isdir(v(1)) and os.path.isdir(v(2))
        assert resolve_shards_path(path, spark).endswith("_v_0000000002")
        merge_shards(
            docs.withColumn("text", F.lower("text")), path
        )  # -> v3; v2 retained, v1 GC'd
        assert not os.path.isdir(v(1))
        assert os.path.isdir(v(2)) and os.path.isdir(v(3))
        assert resolve_shards_path(path, spark).endswith("_v_0000000003")
        # the retained snapshot is COMPLETE (an in-flight reader's view)
        old = spark.read.parquet(v(2))
        assert old.count() == docs.count()
        json_path = os.path.join(path, "_shard_layout.json")
        assert json.load(open(json_path))["keep_versions"] == 2

    def test_append_pointer_onto_legacy_layout_raises(
        self, spark, docs, tmp_path
    ):
        """r11 self-review: append+pointer onto a rename-layout export
        would publish a version holding ONLY the appended rows and GC
        the legacy shard dirs — silent data loss. Must raise. Since r12
        save_shards append validates against the sidecar exactly like
        merge_shards (ADVICE r11 #2), so the contradiction check fires
        first; the root-dir migration guard still backstops sidecar-less
        legacy exports."""
        path = str(tmp_path / "legacyappend")
        save_shards(docs, path, n_shards=4, id_col="doc_id")  # rename
        with pytest.raises(ValueError, match="contradicts the export"):
            save_shards(
                docs, path, n_shards=4, id_col="doc_id",
                mode="append", swap_mode="pointer",
            )
        # pre-sidecar legacy export: the root shard-dir guard backstops
        os.remove(os.path.join(path, "_shard_layout.json"))
        for swap in ("pointer", "manifest"):
            with pytest.raises(ValueError, match="cannot migrate"):
                save_shards(
                    docs, path, n_shards=4, id_col="doc_id",
                    mode="append", swap_mode=swap,
                )
        # the export is untouched
        assert spark.read.parquet(path).count() == docs.count()

    def test_keep_versions_override_without_raise(
        self, spark, docs, tmp_path
    ):
        """keep_versions is GC policy, not a layout contract: a merge
        may override it for one call without tripping the sidecar
        contradiction check or mutating the stored default."""
        path = str(tmp_path / "kvov")
        save_shards(
            docs, path, n_shards=4, id_col="doc_id",
            swap_mode="pointer", keep_versions=1,
        )
        merge_shards(
            docs.withColumn("text", F.upper("text")), path, keep_versions=2
        )
        v = lambda n: os.path.join(path, f"_v_{n:010d}")  # noqa: E731
        assert os.path.isdir(v(1)) and os.path.isdir(v(2))  # retained
        sidecar = json.load(open(os.path.join(path, "_shard_layout.json")))
        assert sidecar["keep_versions"] == 1  # stored default unchanged
