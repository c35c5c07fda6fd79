"""End-to-end training-data pipeline composition: the operators chained the
way a real corpus build chains them — filter → quality → dedup → canonical
selection → mixing/sampling → embedding → ANN → packing. Each stage's
output feeds the next as a plain DataFrame; nothing is collected until the
final assertions."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import (
    bigram_lm_score,
    dedup_clusters,
    embed,
    gopher_quality,
    pack_summary,
    simhash_dup_pairs,
    stratified_hash_sample,
    temperature_mix_weights,
    with_split,
)
from docarray_spark.operators.embed import md5_text_encoder
from docarray_spark.operators.match import match
from docarray_spark.queryset import find


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_full_corpus_build_pipeline(spark, docs):
    n0 = docs.count()

    # 1. language/metadata filter (Mongo-QL → Catalyst)
    stage1 = find(docs, {"lang": {"$in": ["en", "de", "es", "fr"]},
                         "n_chars": {"$gte": 20}})
    n1 = stage1.count()
    assert 0 < n1 <= n0

    # 2. quality signals: gopher verdict + corpus-LM score ride along
    quality = gopher_quality(stage1, id_col="doc_id", text_col="text").select(
        "doc_id", "keep"
    )
    lm = bigram_lm_score(stage1, id_col="doc_id")
    stage2 = (
        stage1.join(quality, "doc_id")
        .join(lm.select("doc_id", "lm_score"), "doc_id")
    )
    assert stage2.count() == n1  # signals never drop rows

    # 3. near-dup dedup: simhash pairs → connected components → canonicals
    pairs = simhash_dup_pairs(stage2, id_col="doc_id", text_col="text",
                              bits=32, max_hamming=3, num_bands=4)
    clustered = dedup_clusters(stage2, pairs, id_col="doc_id",
                               src="id_a", dst="id_b")
    canon = clustered.filter(F.col("is_canonical"))
    n3 = canon.count()
    assert 0 < n3 <= n1
    # every cluster contributes exactly one canonical
    assert canon.select("component").distinct().count() == n3
    stage3 = stage2.join(canon.select("doc_id"), "doc_id")

    # 4. mixture: temperature weights drive per-source sampling fractions
    w = {
        r[0]: max(0.05, min(1.0, r.weight * 3))
        for r in temperature_mix_weights(stage3, "source", alpha=0.7).collect()
    }
    stage4 = stratified_hash_sample(stage3, "source", w, id_col="doc_id")
    assert 0 < stage4.count() <= n3

    # 5. split labels + embeddings + exact kNN over the train split
    labeled = with_split(stage4, {"train": 0.9, "val": 0.1}, id_col="doc_id")
    train = labeled.filter("split = 'train'")
    emb = embed(train.select("doc_id", "text"), input_col="text", dim=8,
                model_loader=lambda: md5_text_encoder(8), out_type="double")
    queries = emb.limit(5)
    nn = match(emb, queries, k=3, metric="cosine", corpus_id_col="doc_id",
               query_id_col="doc_id", exclude_self=False, eps=0.0)
    per_q = {r[0]: r[1] for r in nn.groupBy("query_id").count().collect()}
    assert all(v == 3 for v in per_q.values())
    # self-match at distance ~0 proves embeddings flowed through intact
    selfs = nn.filter("query_id = match_id AND rank = 1")
    assert selfs.count() == len(per_q)

    # 6. pack the train split into 128-token bins per source
    packed = pack_summary(
        train.select(
            "doc_id", "source",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        ),
        capacity=128, token_col="n_tokens", group_col="source",
        order_col="doc_id",
    )
    rows = packed.collect()
    assert rows and all(r.n_docs >= 1 for r in rows)
    # non-final bins of each group start exactly at capacity boundaries
    tokens_per_group = {}
    for r in rows:
        tokens_per_group.setdefault(r.source, 0)
    total_tokens = train.agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    assert sum(r.tokens_started for r in rows) == total_tokens


def test_retrieval_pipeline_embed_to_pq_store(spark, docs, tmp_path):
    """Retrieval-side pipeline (r5): embed the corpus → train PQ codebooks
    → IVF-assign + encode → persist the codes PARTITIONED BY CELL (the
    billion-scale store layout) → probe cells with partition pruning →
    ADC top-k. Exercises the handoff seams: embed's output feeds pq_train
    verbatim, pq_encode keeps the cell column, and the probed read is
    verified to scan only the probed partitions."""
    import numpy as np

    from docarray_spark.operators.ann import ivf_index
    from docarray_spark.operators.pq import pq_encode, pq_match, pq_train

    emb = embed(
        docs.limit(400).select("doc_id", "text"), input_col="text", dim=16,
        model_loader=lambda: md5_text_encoder(16), out_type="double",
    ).select(F.col("doc_id").alias("id"), F.col("embedding"))

    books = pq_train(emb, m=4, ksub=32, sample=400, n_iter=4)
    cent, assigned = ivf_index(emb, n_cells=8, corpus_id_col="id")
    store_path = str(tmp_path / "pq_store")
    pq_encode(assigned, books, id_col="id", emb_col="v", keep_cols=["cell"]) \
        .write.partitionBy("cell").parquet(store_path)
    store = spark.read.parquet(store_path)

    qrow = emb.first()
    q = np.asarray(qrow.embedding, dtype=np.float64)
    cents = sorted(cent.collect(), key=lambda r: r.cell)
    cm = np.asarray([r.centroid for r in cents])
    probe = [int(c) for c in np.argsort(((cm - q) ** 2).sum(1), kind="stable")[:3]]
    sub = store.filter(F.col("cell").isin(probe))
    # the probed read is partition-PRUNED, not filtered post-scan
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]

    queries = spark.createDataFrame(
        [(int(qrow.id), [float(x) for x in q])], "id long, embedding array<double>"
    )
    got = pq_match(sub, queries, books, k=5, metric="sqeuclidean").collect()
    assert len(got) == 5
    # the query's own document is retrievable from its probed cell at
    # near-zero ADC distance (its code reconstructs itself)
    top = min(got, key=lambda r: r["rank"])
    assert top["match_id"] == qrow.id


def test_export_pipeline_quality_to_shards(spark, docs, tmp_path):
    """Export-side pipeline (r9): quality gate → near-dup dedup →
    token-budget packing summary → deterministic shard export with
    manifest — the full corpus-build handoff from raw documents to the
    dataloader contract (one file per shard, SQL-replayable assignment,
    content-sum integrity)."""
    import os

    from docarray_spark.operators import gopher_quality, simhash_dup_pairs
    from docarray_spark.sources import save_shards, shard_col

    # 1. quality gate (signals never drop rows; the filter does)
    gated = docs.join(
        gopher_quality(docs, id_col="doc_id", text_col="text").select(
            "doc_id", "keep"
        ),
        "doc_id",
    ).filter("keep").drop("keep")
    n1 = gated.count()
    assert 0 < n1 <= docs.count()

    # 2. near-dup dedup: keep the smallest id of each simhash dup pair set
    pairs = simhash_dup_pairs(gated, id_col="doc_id", text_col="text",
                              bits=32, max_hamming=2, num_bands=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = gated.join(losers, "doc_id", "left_anti")
    n2 = deduped.count()
    assert 0 < n2 <= n1

    # 3. token counts ride along into the export (the packing signal)
    ready = deduped.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )

    # 4. shard export: one file per shard, manifest accounts for every row
    path = str(tmp_path / "export")
    manifest = save_shards(
        ready, path, n_shards=4, id_col="doc_id", order_within=["doc_id"]
    ).toPandas()
    assert manifest["rows"].sum() == n2
    assert (manifest["files"] == 1).all()
    # the dataloader contract: reading one shard = one directory, and the
    # assignment is replayable without Spark (md5 % n)
    back = spark.read.parquet(path)
    assert back.count() == n2
    chk = ready.select(
        "doc_id", shard_col("doc_id", 4).alias("shard")
    ).groupBy("shard").count().orderBy("shard").toPandas()
    got = manifest.sort_values("shard", ignore_index=True)
    assert got["rows"].tolist() == chk["count"].tolist()
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={int(s)}" for s in sorted(got["shard"])]
