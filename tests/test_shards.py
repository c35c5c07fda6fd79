"""save_shards: deterministic training-shard export with manifest.

The sink counterpart of the dataloader/sampling family — one file per
shard by contract, md5 assignment replayable in ANSI SQL (gated in the
sampling_suite entry's shard parts)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from docarray_spark.sources import merge_shards, save_shards, shard_col


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


N = 8


@pytest.fixture(scope="module")
def written(docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "docs")
    manifest = save_shards(
        docs, path, n_shards=N, id_col="doc_id", order_within=["doc_id"]
    )
    return path, manifest.toPandas()


class TestSaveShards:
    def test_roundtrip_exact(self, spark, docs, written):
        path, _ = written
        back = spark.read.parquet(path).drop("shard")
        a = docs.toPandas().sort_values("doc_id", ignore_index=True)
        b = back.toPandas()[a.columns.tolist()].sort_values(
            "doc_id", ignore_index=True
        )
        assert a.equals(b)

    def test_one_file_per_shard(self, written):
        path, m = written
        dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
        assert len(dirs) == len(m)  # every written shard has a manifest row
        for d in dirs:
            files = [
                f for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, d
        assert (m["files"] == 1).all()
        assert (m["bytes"] > 0).all()

    def test_manifest_aggregates(self, spark, docs, written):
        path, m = written
        assert m["rows"].sum() == docs.count()
        # id ranges and content sum recompute from the written store
        back = spark.read.parquet(path)
        # fingerprint column order is CANONICAL (sorted), so manifests from
        # save/merge/stream calls with different caller column orders agree
        fp = F.conv(
            F.substring(
                F.md5(
                    F.to_json(
                        F.struct("doc_id", "lang", "n_chars", "source", "text")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        chk = (
            back.groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("doc_id").alias("id_min"),
                F.max("doc_id").alias("id_max"),
                F.sum(fp).alias("content_sum"),
            )
            .orderBy("shard")
            .toPandas()
        )
        got = m[["shard", "rows", "id_min", "id_max", "content_sum"]].reset_index(
            drop=True
        )
        assert got.astype("int64").equals(chk.astype("int64"))

    def test_order_within_shard(self, spark, written):
        path, _ = written
        import pyarrow.parquet as pq

        d = os.path.join(path, "shard=0")
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        ids = pq.read_table(os.path.join(d, f), columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
        assert ids == sorted(ids)

    def test_assignment_deterministic_and_sql_portable(self, spark, docs):
        a = docs.select(
            "doc_id", shard_col("doc_id", N).alias("shard")
        ).toPandas()
        b = (
            docs.repartition(17)
            .select("doc_id", shard_col("doc_id", N).alias("shard"))
            .toPandas()
        )
        am = dict(zip(a.doc_id, a.shard))
        bm = dict(zip(b.doc_id, b.shard))
        assert am == bm  # partitioning-invariant
        con = duckdb.connect()
        con.register("t", a[["doc_id"]])
        sql = con.execute(
            "SELECT doc_id, CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8)) "
            f"AS BIGINT) % {N} AS shard FROM t"
        ).df()
        assert dict(zip(sql.doc_id, sql.shard)) == am

    def test_xxhash_variant_deterministic(self, docs):
        a = docs.select(
            "doc_id", shard_col("doc_id", N, "xxhash64").alias("shard")
        ).toPandas()
        b = docs.repartition(5).select(
            "doc_id", shard_col("doc_id", N, "xxhash64").alias("shard")
        ).toPandas()
        assert dict(zip(a.doc_id, a.shard)) == dict(zip(b.doc_id, b.shard))
        assert a.shard.between(0, N - 1).all()

    def test_bad_args(self, docs, tmp_path):
        with pytest.raises(ValueError, match="n_shards"):
            shard_col("doc_id", 0)
        with pytest.raises(ValueError, match="hash_method"):
            shard_col("doc_id", 4, "crc32")

    def test_consumer_prunes_to_one_shard(self, spark, written):
        """The dataloader contract at scale: a consumer reading its shard
        scans ONE directory — the shard predicate lands in the scan's
        PartitionFilters, not a post-scan filter over all shards."""
        from docarray_spark.plans.audit import partition_filters

        path, _ = written
        one = spark.read.parquet(path).filter(F.col("shard") == 3)
        pf = " ".join(partition_filters(one))
        assert "shard" in pf
        assert one.count() > 0

    def test_rewrite_idempotent(self, docs, tmp_path):
        path = str(tmp_path / "re")
        m1 = save_shards(docs, path, n_shards=4, id_col="doc_id").toPandas()
        m2 = save_shards(docs, path, n_shards=4, id_col="doc_id").toPandas()
        assert m1[["shard", "rows", "content_sum"]].equals(
            m2[["shard", "rows", "content_sum"]]
        )


class TestMultiFileShards:
    """files_per_shard / max_rows_per_file: the 100 TB export escape hatch
    (r9 review) — n_shards is consumer-fixed, so shard size must decouple
    from one task's write. A shard becomes the shard=N/ DIRECTORY the
    consumer already globs; manifests are layout-independent."""

    def test_multi_file_export_roundtrip_and_manifest(
        self, spark, docs, tmp_path
    ):
        single = str(tmp_path / "single")
        multi = str(tmp_path / "multi")
        m1 = save_shards(docs, single, n_shards=4, id_col="doc_id").toPandas()
        m3 = save_shards(
            docs, multi, n_shards=4, id_col="doc_id", files_per_shard=3
        ).toPandas()
        # >1 file per shard actually written, in parallel tasks
        assert (m3["files"] > 1).any()
        assert m3["files"].sum() > len(m3)
        # manifest is layout-independent: same rows, ids, content sums
        cols = ["shard", "rows", "id_min", "id_max", "content_sum"]
        assert m3[cols].equals(m1[cols])
        # exact roundtrip and shard assignment unchanged
        back = spark.read.parquet(multi)
        a = docs.toPandas().sort_values("doc_id", ignore_index=True)
        b = back.drop("shard").toPandas()[a.columns.tolist()].sort_values(
            "doc_id", ignore_index=True
        )
        assert a.equals(b)
        one = back.filter(F.col("shard") == 2)
        want = docs.select(
            "doc_id", shard_col("doc_id", 4).alias("s")
        ).filter(F.col("s") == 2)
        assert one.count() == want.count()

    def test_sub_split_deterministic(self, docs):
        from docarray_spark.sources.writers import _sub_split_col

        a = docs.select("doc_id", _sub_split_col("doc_id", 3).alias("sub"))
        b = docs.repartition(11).select(
            "doc_id", _sub_split_col("doc_id", 3).alias("sub")
        )
        am = {r.doc_id: r.sub for r in a.collect()}
        bm = {r.doc_id: r.sub for r in b.collect()}
        assert am == bm
        assert set(am.values()) == {0, 1, 2}

    def test_max_rows_per_file_bounds_files(self, spark, docs, tmp_path):
        import pyarrow.parquet as pq

        path = str(tmp_path / "capped")
        m = save_shards(
            docs, path, n_shards=2, id_col="doc_id", max_rows_per_file=100
        ).toPandas()
        assert (m["files"] > 1).all()  # ~500 rows/shard at sf0.001
        for d in os.listdir(path):
            if not d.startswith("shard="):
                continue
            for f in os.listdir(os.path.join(path, d)):
                if f.endswith(".parquet"):
                    n = pq.read_metadata(os.path.join(path, d, f)).num_rows
                    assert n <= 100, (d, f, n)

    def test_consumer_pruning_survives_multi_file(self, spark, docs, tmp_path):
        from docarray_spark.plans.audit import partition_filters

        path = str(tmp_path / "pruned")
        save_shards(docs, path, n_shards=4, id_col="doc_id",
                    files_per_shard=3)
        one = spark.read.parquet(path).filter(F.col("shard") == 1)
        assert "shard" in " ".join(partition_filters(one))
        assert one.count() > 0

    def test_merge_preserves_multi_file_layout(self, spark, docs, tmp_path):
        path = str(tmp_path / "mlayout")
        save_shards(docs, path, n_shards=4, id_col="doc_id",
                    files_per_shard=3)
        batch = docs.filter(F.col("doc_id") < 3).withColumn(
            "text", F.lit("UPDATED")
        )
        m = merge_shards(
            batch, path, n_shards=4, id_col="doc_id", files_per_shard=3
        ).toPandas()
        assert (m["files"] > 1).any()
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        assert back.filter(F.col("text") == "UPDATED").count() == 3

    def test_bad_layout_args(self, docs, tmp_path):
        with pytest.raises(ValueError, match="files_per_shard"):
            save_shards(docs, str(tmp_path / "x"), n_shards=2,
                        id_col="doc_id", files_per_shard=0)
        with pytest.raises(ValueError, match="max_rows_per_file"):
            save_shards(docs, str(tmp_path / "y"), n_shards=2,
                        id_col="doc_id", max_rows_per_file=0)


def _file_states(path):
    """(name, size, mtime_ns) per shard parquet file."""
    out = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("shard="):
            continue
        for f in os.listdir(os.path.join(path, d)):
            if f.endswith(".parquet"):
                st = os.stat(os.path.join(path, d, f))
                out.setdefault(d, []).append((f, st.st_size, st.st_mtime_ns))
    return out


class TestMergeShards:
    N = 8

    @pytest.fixture()
    def store(self, docs, tmp_path):
        path = str(tmp_path / "ms")
        save_shards(docs, path, n_shards=self.N, id_col="doc_id",
                    order_within=["doc_id"])
        return path

    def test_upsert_touches_only_affected_shards(self, spark, docs, store):
        before = _file_states(store)
        batch = docs.filter(F.col("doc_id") < 5).withColumn(
            "text", F.lit("UPDATED")
        )
        touched = {
            r.shard
            for r in batch.select(
                shard_col("doc_id", self.N).alias("shard")
            ).distinct().collect()
        }
        m = merge_shards(batch, store, n_shards=self.N, id_col="doc_id",
                         order_within=["doc_id"]).toPandas()
        assert set(m.shard) == touched  # manifest covers touched shards only
        after = _file_states(store)
        for d, files in before.items():
            s = int(d.split("=")[1])
            if s not in touched:
                assert after[d] == files, f"untouched {d} was rewritten"
            else:
                assert len(after[d]) == 1  # one-file contract preserved
        back = spark.read.parquet(store)
        assert back.count() == docs.count()  # pure upsert, no dup ids
        assert (
            back.filter(F.col("doc_id") < 5)
            .filter(F.col("text") == "UPDATED").count() == 5
        )

    def test_insert_new_ids_and_delete(self, spark, docs, store):
        n0 = docs.count()
        new = docs.limit(3).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        dels = docs.filter(F.col("doc_id").isin([7, 11])).select("doc_id")
        merge_shards(new, store, n_shards=self.N, id_col="doc_id",
                     delete_ids=dels)
        back = spark.read.parquet(store)
        assert back.count() == n0 + 3 - 2
        assert back.filter(F.col("doc_id") >= 1_000_000).count() == 3
        assert back.filter(F.col("doc_id").isin([7, 11])).count() == 0

    def test_merge_with_reordered_columns_keeps_content_sum(
        self, spark, docs, store
    ):
        """The fingerprint column order is canonical (sorted), so a merge
        batch carrying the same columns in a DIFFERENT order than the
        original save_shards refreshes content_sums comparable with a
        from-the-store recompute — the integrity-refresh join depends on
        it (r9 review)."""
        from docarray_spark.sources.writers import _shard_manifest

        batch = docs.filter(F.col("doc_id") < 5).select(
            "text", "lang", "source", "n_chars", "doc_id"  # reordered
        )
        m = merge_shards(
            batch, store, n_shards=self.N, id_col="doc_id"
        ).toPandas()
        chk = _shard_manifest(
            spark, store, ["doc_id", "text", "lang", "source", "n_chars"],
            "doc_id",
        ).toPandas()
        chk = chk[chk.shard.isin(m.shard)].reset_index(drop=True)
        cols = ["shard", "rows", "content_sum"]
        assert m[cols].reset_index(drop=True).equals(chk[cols])

    def test_merge_equals_full_rewrite(self, spark, docs, store, tmp_path):
        """The incremental path must converge to what a from-scratch
        save_shards of the merged corpus produces (same rows per shard,
        same content sums)."""
        batch = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
            "text", F.upper("text")
        )
        merge_shards(batch, store, n_shards=self.N, id_col="doc_id")
        merged_corpus = docs.join(
            batch.select("doc_id"), "doc_id", "left_anti"
        ).unionByName(batch)
        full = str(tmp_path / "full")
        m_full = save_shards(
            merged_corpus, full, n_shards=self.N, id_col="doc_id"
        ).toPandas()
        from docarray_spark.sources.writers import _shard_manifest

        m_inc = _shard_manifest(
            spark, store, ["doc_id", "text", "lang", "source", "n_chars"],
            "doc_id",
        ).toPandas()
        cols = ["shard", "rows", "content_sum"]
        assert m_inc[cols].reset_index(drop=True).equals(
            m_full[cols].reset_index(drop=True)
        )

    def test_streaming_merge_equals_batch_export(self, spark, docs, tmp_path):
        """Crawl-to-dataloader loop: a docs stream drained through
        stream_merge_shards (micro-batched foreachBatch merges) converges
        to exactly what one batch save_shards of the same corpus writes —
        same shards, same per-shard rows and content sums."""
        from docarray_spark.sources.writers import _shard_manifest
        from docarray_spark.streaming import read_stream, stream_merge_shards

        landing = str(tmp_path / "landing")
        # 4 files -> maxFilesPerTrigger=1 gives 4 micro-batches (first
        # initializes, three merge)
        docs.repartition(4).write.parquet(landing)
        sdf = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        out = str(tmp_path / "stream_shards")
        q = stream_merge_shards(
            sdf, out, n_shards=4, id_col="doc_id",
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        q.stop()
        batch = str(tmp_path / "batch_shards")
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
        m_batch = save_shards(
            docs, batch, n_shards=4, id_col="doc_id"
        ).toPandas()
        m_stream = _shard_manifest(spark, out, cols, "doc_id").toPandas()
        keys = ["shard", "rows", "content_sum"]
        assert m_stream[keys].reset_index(drop=True).equals(
            m_batch[keys].reset_index(drop=True)
        )
        # one file per shard survived the incremental path
        assert (m_stream["files"] == 1).all()

    def test_full_rewrite_fallback_fires_and_matches_cow(
        self, spark, docs, tmp_path, monkeypatch
    ):
        """When a batch touches >= full_rewrite_at * n_shards shards the
        merge must route to the save_shards rewrite path — NO
        localCheckpoint of the whole export (the r9 memory cliff) — and
        produce exactly what the copy-on-write path produces."""
        # patch the CONCRETE class (pyspark 4: pyspark.sql.classic
        # .dataframe.DataFrame overrides the abstract base's method)
        cls = type(docs)
        calls = []
        orig = cls.localCheckpoint

        def counting(self, *a, **kw):
            calls.append(1)
            return orig(self, *a, **kw)

        monkeypatch.setattr(cls, "localCheckpoint", counting)

        a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
        for p in (a_path, b_path):
            save_shards(docs, p, n_shards=4, id_col="doc_id",
                        order_within=["doc_id"])
        batch = docs.withColumn("text", F.upper("text"))  # touches all 4

        m_fall = merge_shards(  # default full_rewrite_at=1.0 -> fallback
            batch, a_path, n_shards=4, id_col="doc_id",
            order_within=["doc_id"],
        ).toPandas()
        assert calls == [], "fallback path must not checkpoint"
        m_cow = merge_shards(  # threshold 2.0 can never fire -> COW path
            batch, b_path, n_shards=4, id_col="doc_id",
            order_within=["doc_id"], full_rewrite_at=2.0,
        ).toPandas()
        assert calls, "COW path still checkpoints"
        cols = ["shard", "rows", "id_min", "id_max", "content_sum"]
        assert m_fall[cols].reset_index(drop=True).equals(
            m_cow[cols].reset_index(drop=True)
        )
        pa = spark.read.parquet(a_path).toPandas().sort_values(
            "doc_id", ignore_index=True
        )
        pb = spark.read.parquet(b_path).toPandas().sort_values(
            "doc_id", ignore_index=True
        )
        assert pa[sorted(pa.columns)].equals(pb[sorted(pb.columns)])
        assert not os.path.isdir(a_path + ".__rewrite__")  # temp swapped in

    def test_full_rewrite_threshold_fraction(self, spark, docs, store):
        """full_rewrite_at below 1.0: a partial-coverage batch crosses the
        threshold, every shard is rewritten, and the manifest covers ALL
        shards (files/bytes changed everywhere, not just where rows did)."""
        before = _file_states(store)
        batch = docs.filter(F.col("doc_id") < 10).withColumn(
            "text", F.lit("REWRITE")
        )  # md5 lands ids 0..9 in 6 of the 8 shards — partial coverage
        touched = {
            r.shard
            for r in batch.select(
                shard_col("doc_id", self.N).alias("shard")
            ).distinct().collect()
        }
        assert 0 < len(touched) < self.N  # genuinely partial coverage
        m = merge_shards(
            batch, store, n_shards=self.N, id_col="doc_id",
            full_rewrite_at=len(touched) / self.N,
        ).toPandas()
        assert set(m.shard) == set(range(self.N))  # manifest covers all
        after = _file_states(store)
        for d in before:  # every shard dir rewritten (new file names)
            assert after[d] != before[d], d
        back = spark.read.parquet(store)
        assert back.count() == docs.count()
        assert back.filter(F.col("text") == "REWRITE").count() == 10

    def test_full_rewrite_trailing_slash_and_no_data_loss(
        self, spark, docs, store
    ):
        """r10 review: os.rename to a nonexistent trailing-slash newpath
        fails with ENOENT — and a delete-then-rename swap would have
        already destroyed the live export by then. The swap moves the old
        store ASIDE first and restores it on failure; a trailing-slash
        path must complete cleanly."""
        batch = docs.withColumn("text", F.upper("text"))  # all shards
        m = merge_shards(
            batch, store + "/", n_shards=self.N, id_col="doc_id"
        ).toPandas()
        assert len(m) == self.N
        back = spark.read.parquet(store)
        assert back.count() == docs.count()
        assert not os.path.isdir(store + ".__old__")
        assert not os.path.isdir(store + ".__rewrite__")

    def test_full_rewrite_emptied_shard_tombstone(self, spark, docs, store):
        ids2 = (
            spark.read.parquet(store)
            .filter(F.col("shard") == 2)
            .select("doc_id")
        )
        m = merge_shards(
            docs.limit(0), store, n_shards=self.N, id_col="doc_id",
            delete_ids=ids2, full_rewrite_at=0.0,
        ).toPandas()
        assert not os.path.isdir(os.path.join(store, "shard=2"))
        row = m[m.shard == 2].iloc[0]
        assert row["rows"] == 0 and row["files"] == 0

    def test_emptied_shard_dir_dropped(self, spark, docs, store):
        # delete every id of shard 2 -> its directory must disappear
        ids2 = (
            spark.read.parquet(store)
            .filter(F.col("shard") == 2)
            .select("doc_id")
        )
        merge_shards(
            docs.limit(0),  # empty upsert batch, delete-only merge
            store, n_shards=self.N, id_col="doc_id", delete_ids=ids2,
        )
        assert not os.path.isdir(os.path.join(store, "shard=2"))
        assert spark.read.parquet(store).filter(
            F.col("shard") == 2
        ).count() == 0
