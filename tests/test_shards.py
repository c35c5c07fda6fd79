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
        fp = F.conv(
            F.substring(
                F.md5(
                    F.to_json(
                        F.struct("doc_id", "text", "lang", "source", "n_chars")
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
