"""Physical-plan regression tests: the properties that make the operators
scale are pinned here — a Catalyst-usage regression fails CI, not a 100 TB
run. (SURVEY.md §4; the plan shapes the operators were designed for.)"""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.indexing import update_by_id
from docarray_spark.operators.match import match
from docarray_spark.operators.text import text_search
from docarray_spark.plans import (
    audit,
    explain_str,
    has_cartesian,
    has_take_ordered,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
from docarray_spark.queryset import find


@pytest.fixture(scope="module", autouse=True)
def _fresh_cache(spark):
    """Plan assertions measure the designed plan; a cache entry left by an
    earlier test (operators that persist intermediates, e.g. minhash's
    shingle table) would splice an InMemoryRelation — and its internal
    exchanges — into the explain output. Start cold."""
    spark.catalog.clearCache()
    yield


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )


def test_ql_filter_pushes_to_scan(docs):
    q = find(docs, {"lang": "en", "n_chars": {"$gte": 100, "$lt": 400}})
    pf = pushed_filters(q)
    assert any("lang" in f for f in pf), pf
    assert any("n_chars" in f for f in pf), pf


def test_projection_prunes_scan(docs):
    q = find(docs, {"lang": "en"}).select("doc_id", "lang")
    schemas = read_schemas(q)
    assert schemas and all("text" not in s for s in schemas), schemas


def test_match_no_cartesian_one_shuffle(emb):
    queries = emb.filter("id < 4")
    res = match(emb, queries, k=5, corpus_id_col="id", eps=0.0)
    assert not has_cartesian(res)
    # one hash shuffle on query_id for the rank window; AQE may stage it
    assert shuffle_count(res) <= 2, explain_str(res)


def test_match_prefilter_pushes_below_knn(emb, spark, sf_dir):
    full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = full.filter("vec_id < 4").select(F.col("vec_id").alias("id"), "embedding")
    res = match(
        full, queries, k=5, corpus_id_col="vec_id",
        filter={"label": {"$in": [0, 1]}}, eps=0.0,
    )
    pf = pushed_filters(res)
    assert any("label" in f for f in pf), pf


def test_bm25_topk_is_take_ordered(docs):
    # plan pins live on the lazy subtree — the public text_search collects
    # its ≤k rows so the tf cache can be released (serving-loop hygiene)
    from docarray_spark.operators.text import _text_search_topk

    q, tf = _text_search_topk(docs, "key value scan", id_col="doc_id", k=10)
    try:
        assert has_take_ordered(q), explain_str(q)
    finally:
        tf.unpersist(False)


def test_update_by_id_broadcasts(spark, docs):
    updates = docs.limit(5).select(F.col("doc_id").alias("id"), F.lit("U").alias("text"))
    base = docs.select(F.col("doc_id").alias("id"), "text")
    out = update_by_id(base, updates)
    assert audit(out)["broadcast_joins"] >= 1


def test_minhash_no_cartesian(spark, docs):
    from docarray_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        docs.select(F.col("doc_id").alias("id"), "text"),
        num_bands=4, num_rows=2, persist=False,
    )
    assert not has_cartesian(pairs)


def test_vocabulary_no_full_data_single_partition_window(docs):
    """Token-id assignment is the two-phase distributed rank: the only
    SinglePartition exchange allowed is the ~P-row per-partition-count
    cumulative sum — never one carrying the token rows themselves
    (round-1 verdict flaw #3)."""
    from docarray_spark.operators import vocabulary
    from docarray_spark.plans import exchange_blocks

    v = vocabulary(docs, min_count=2)
    for args, inputs in exchange_blocks(v):
        if "SinglePartition" in args:
            assert "token" not in inputs, (args, inputs)


def test_ivf_assignment_zero_shuffle(emb):
    """IVF cell assignment is an in-projection argmin over the literal
    centroid array — NO Exchange between the corpus scan and the assigned
    cells (round-1 verdict flaw #1: crossJoin + Window shuffled N×n_cells
    rows with vectors attached)."""
    from docarray_spark.operators.ann import ivf_index

    cent, assigned = ivf_index(emb, 4, corpus_id_col="id")
    assert shuffle_count(assigned) == 0, explain_str(assigned)


def _vector_free_sig_exchanges(df, vec_cols):
    """No shuffle Exchange partitioned on the LSH bucket key may carry a
    dense-vector column (they'd be replicated num_tables×)."""
    from docarray_spark.plans import exchange_blocks

    for args, inputs in exchange_blocks(df):
        if "sig" in args:
            for v in vec_cols:
                assert v not in inputs, (args, inputs)


def test_lsh_match_bucket_join_ships_ids_only(emb):
    from docarray_spark.operators.ann import lsh_match

    queries = emb.filter("id < 4")
    res = lsh_match(emb, queries, k=5, num_planes=4, num_tables=4, dim=64)
    _vector_free_sig_exchanges(res, ["_cv", "_qv"])
    assert not has_cartesian(res)


def test_embedding_dup_bucket_join_ships_ids_only(emb):
    from docarray_spark.operators.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(emb, method="lsh", num_planes=8, num_tables=4, dim=64)
    _vector_free_sig_exchanges(pairs, ["_v", "va", "vb"])
    assert not has_cartesian(pairs)


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path_factory):
    """save_parquet(bucket_by=...) pre-shuffles on the join key: a
    subsequent self-join on that key must run with NO Exchange on either
    side -- the co-located-join contract that matters at 100 TB."""
    import uuid

    from docarray_spark.sources import save_parquet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    suffix = uuid.uuid4().hex[:8]
    base = str(tmp_path_factory.mktemp("bucketed"))
    ta, tb = f"bucket_a_{suffix}", f"bucket_b_{suffix}"
    save_parquet(docs, f"{base}/a", bucket_by=(4, ["doc_id"]), table_name=ta)
    save_parquet(docs.select("doc_id", "n_chars"), f"{base}/b",
                 bucket_by=(4, ["doc_id"]), table_name=tb)
    try:
        joined = spark.table(ta).join(spark.table(tb), "doc_id")
        assert shuffle_count(joined) == 0, explain_str(joined)
        assert joined.count() == docs.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_knn_graph_single_scan(emb):
    """The k-NN graph reads its input ONCE (block-nested shuffle join), not
    once per block like a driver loop would (round-1 verdict flaw #4)."""
    from docarray_spark.operators import knn_graph
    from docarray_spark.plans import scan_count

    g = knn_graph(emb, k=5, n_blocks=4)
    assert scan_count(g) == 1, explain_str(g)
    assert not has_cartesian(g)


def test_released_after_releases_only_new_blocks(spark):
    """plans.blocks.released_after: blocks registered INSIDE the context
    (persist or localCheckpoint) are unpersisted on exit; blocks persisted
    before entry survive — the operator-internal checkpoint protocol."""
    from docarray_spark.plans.blocks import persistent_rdd_ids, released_after

    keep = spark.range(100).persist()
    keep.count()
    before = persistent_rdd_ids(spark)
    assert before  # the outer persist is registered
    with released_after(spark):
        inner = spark.range(50).localCheckpoint(eager=True)
        assert inner.count() == 50
        assert persistent_rdd_ids(spark) - before  # checkpoint storage live
    assert persistent_rdd_ids(spark) == before  # inner released, outer kept
    assert keep.count() == 100  # outer cache still usable
    keep.unpersist()


def test_bm25_stored_batched_topk_uses_window_group_limit(spark, tmp_path_factory):
    """VERDICT r8 #1a: the batched stored-bm25 per-query top-k must
    compile to Spark 4's WindowGroupLimit partial/final pushdown — the
    exchange then ships ≤ k rows per (query, partition), never a query's
    full scored set to one task. Pinned on the pre-collect subtree."""
    from docarray_spark.operators import bm25_refresh
    from docarray_spark.operators.index_store import _bm25_stored_topk
    from docarray_spark.plans import has_window_group_limit
    from docarray_spark.sources.writers import init_parquet_store

    tmp = tmp_path_factory.mktemp("wgl")
    docs = spark.createDataFrame(
        [(i, f"token{i % 7} common filler w{i}") for i in range(60)],
        "id long, text string",
    )
    store, idx = str(tmp / "store"), str(tmp / "idx")
    init_parquet_store(docs, store, n_buckets=4)
    bm25_refresh(spark, store, idx)
    out, posts = _bm25_stored_topk(
        spark, idx, ["token3 common", "token5 filler"],
        "id", 5, 1.2, 0.75, None, False,
    )
    try:
        assert has_window_group_limit(out)
        # the query-side tables stay broadcast (driver-bounded: qmap rows =
        # sum of per-query term counts, dfreq rows = distinct slice terms —
        # both scale with the QUERY batch, never the corpus), so the only
        # shuffles are the score groupBy and the per-query window
        from docarray_spark.plans import broadcast_join_count

        assert broadcast_join_count(out) >= 2
        # and the full public path still answers from that plan
        assert out.count() > 0
    finally:
        posts.unpersist(False)


def test_ivfpq_grouped_refresh_scan_partition_prunes_on_pmod(
    spark, tmp_path_factory
):
    """VERDICT r8 #1b: the grouped ivfpq refresh filters the store scan
    with pmod(_bucket, G) IN groups — an EXPRESSION on the partition
    column. Pin that the expression lands in the scan's PartitionFilters
    (partition pruning), so a grouped refresh reads only the touched
    groups' directories, never the whole store."""
    import numpy as np

    from docarray_spark.operators.index_store import _pruned_store_scan
    from docarray_spark.plans import partition_filters
    from docarray_spark.sources.writers import init_parquet_store

    tmp = tmp_path_factory.mktemp("pmod")
    store = str(tmp / "store")
    rows = [
        (i, [float(x) for x in np.random.RandomState(i).randn(8)])
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    init_parquet_store(df, store, n_buckets=8)

    scan, G, groups = _pruned_store_scan(spark, store, buckets=[1, 9, 3], group_buckets=4)
    assert G == 4 and groups == [1, 3]
    pf = partition_filters(scan)
    assert pf, "grouped store scan lost partition pruning"
    assert any("pmod" in f and "_bucket" in f for f in pf), pf
    # the filter selects exactly the two groups' buckets
    got = sorted({r._bucket for r in scan.select("_bucket").distinct().collect()})
    assert got == [b for b in range(8) if b % 4 in (1, 3)]

    # ungrouped form still prunes with a plain IN on the partition column
    scan2, G2, groups2 = _pruned_store_scan(spark, store, buckets=[2, 5], group_buckets=None)
    assert G2 is None and groups2 == [2, 5]
    pf2 = partition_filters(scan2)
    assert pf2 and any("_bucket" in f for f in pf2), pf2


def test_staged_shingle_explode_keeps_staging(spark):
    """The explode-inlining trap (r9): a plain explode over a staged
    expensive array gets an InferFiltersFromGenerate size filter, and
    predicate pushdown inlines the WHOLE staged expression into it —
    including the token split re-evaluated per lambda element (O(W²)).
    The shipped shape (explode_outer + post-generate null filter) must
    keep the optimized plan free of any inlined shingle expression in a
    Filter; this pins that a Spark upgrade re-introducing the inference
    for outer generates (or a refactor back to plain explode) fails CI."""
    from docarray_spark.operators.dedup import with_word_shingles

    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j k"), (1, "")], "id long, text string"
    )
    df = (
        with_word_shingles(docs, "text", 8, out_col="_ga")
        .select("id", F.explode_outer("_ga").alias("_g"))
        .filter(F.col("_g").isNotNull())
        .select("id", F.md5("_g").alias("_gh"))
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # no Filter anywhere re-evaluating the gram construction
    assert "size(array_distinct" not in plan, plan
    # the staging projection survived (tokens materialized once per row)
    assert "_toks" in plan, plan
    # and the md5 runs on the generated attribute, not inside a lambda
    assert "md5(cast(_g#" in plan, plan
