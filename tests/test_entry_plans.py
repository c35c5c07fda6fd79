"""Plan-property pins for EVERY entry query (VERDICT r1, next-round #10):
per-entry shuffle and scan budgets plus a no-cartesian rule, so refactors
can't silently regress the physical plans the operators were designed for.

Budgets are UPPER BOUNDS captured from the current plans at sf0.001; a
failure means a refactor added a shuffle/scan or introduced a cartesian —
update the table only with a conscious plan-shape decision.

Deliberate cartesians (scalar replicates, VERDICT r1 'acceptable'):
``text_search_bm25`` crossJoins a broadcast 1-row corpus-stats aggregate;
``ann_ivf_cosine`` BNL-joins the broadcast 16-row centroid set for probes.
"""

import pytest

import __spark_entry__ as entry_mod
from docarray_spark.plans import explain_str, has_cartesian, scan_count, shuffle_count

# name: (max_shuffles, max_scans, cartesian_allowed)
BUDGETS = {
    # --- round-3 first block (previously outside the r2 oracle window)
    # ivf part (1 shuffle / 3 scans) + r5 pq_adc part: one window-merge
    # exchange + the encoded-corpus scan; codebook collect is eager.
    # r12 +1: the Arrow pair-distance kernel (replacing the interpreted
    # HOF fold — ~10 CPU-s at sf0.1) sits between the probe window and
    # the rank window, so the rank exchange no longer reuses the probe
    # partitioning — an ids+score-only exchange, vectors never ride it
    "ann_ivf_cosine": (3, 4, True),
    "ann_lsh_cosine": (2, 4, False),
    # sizes agg + output sort; assignment itself is a zero-shuffle map
    "kmeans_clusters": (2, 2, False),
    # cumsum window exchange (reused by the rollup) + output sort
    "pack_sequences": (2, 1, False),
    # hash/stratified/weighted/split/shard parts are map-only scan-fused
    # md5 expressions; cap contributes the single group-key exchange
    "sampling_suite": (1, 6, False),
    # units part: unit window exchange + output agg; spans part (r5):
    # window-hash count exchange, island windows by doc, span join +
    # token rebuild — the linear cost of exact-substring semantics
    "dedup_paragraphs": (6, 4, False),
    # fingerprint probe + band-bucket probe + per-id hit count; history
    # reduces to fixed-width keys before any join
    "dedup_incremental": (3, 6, False),
    # tf agg + vocab-rank exchanges (over the VOCAB, not the corpus) +
    # broadcast joins; cartesian = broadcast 1-row N replicate (BM25 stance)
    "tfidf_vectors": (11, 4, True),
    # vocabulary two-phase rank (7) + the one bigram-count agg.
    # r12 +2: vocabulary()'s ensure_parallelism repartition per reference
    "vocab_ngrams": (10, 3, False),
    # per-dim combinable agg + array re-collect; exchange ships partials
    "embed_pool": (2, 1, False),
    # asof union-window exchange + range window agg + bucketized equi-join
    "temporal_joins": (3, 4, False),
    "skew_salted_agg": (2, 1, False),         # the two phases, by design
    # three map-only codec round-trips + the pb_ndarray vector part (r4)
    "roundtrip_codecs": (0, 4, False),
    # exact-gate + bucket-gate LSH paths (5 shuffles / 8 scans each)
    "dedup_embedding": (10, 16, False),
    "embed_batch": (0, 1, False),             # mapInPandas, scan-fused
    # image + audio + video chains (r4) + mesh chunk chain (r11) — four
    # map-only mapInPandas branches, one scan each, zero shuffles
    "mm_image_chunks": (0, 4, False),
    "stream_counts_dedup": (0, 0, False),   # memory-sink table reads
    "stream_neardup_keys": (0, 0, False),   # memory-sink table read
    "stream_session_windows": (0, 0, False),  # memory-sink table read
    "stream_interval_join": (0, 0, False),    # memory-sink table read
    # lm count tables + scoring joins + shuffle-rank two-phase + pctl agg;
    # cartesian = broadcast 1-row normalizers (vocab size, mix total Z) —
    # the BM25 stance; the only single-partition window runs over ~32
    # partition-count rows (distributed_row_number offsets)
    "corpus_stats": (20, 17, True),
    # --- round-2-green block
    "ql_filter_docs": (0, 2, False),
    "ql_filter_logic": (0, 1, False),
    # size/placeholder scan + 11 map-only Document-schema truth-table
    # parts, each a predicate fused into its documents scan (r4)
    "ql_filter_size_placeholder": (0, 12, False),
    # four bounded-query exact kNN parts, one window merge each
    "knn_suite": (4, 4, False),
    "knn_graph": (2, 1, False),
    "sparse_knn_cosine": (2, 2, False),
    "group_batch_counts": (2, 2, False),
    "reduce_suite": (4, 16, False),
    "cube_rollup": (1, 1, False),
    "set_ops": (0, 4, False),
    "traverse_suite": (12, 49, False),
    # slice/set/pop/delete fuse into the scan; MERGE joins broadcast updates
    "slice_crud": (0, 2, False),
    # feature-hash two-level agg + text_to_tensor vocab rank; datauri fused.
    # r12 +2: vocabulary()'s ensure_parallelism repartition, once per
    # vocab-subtree reference (no-op at real scale)
    "content_codecs": (12, 7, False),
    "eval_metrics": (4, 3, False),
    # stats/lang-id/token counts CHAIN into one map-only projection
    "text_profile": (0, 1, False),
    # r12 +1: ensure_parallelism repartition before the Arrow pass (the
    # whole chain ran in ONE task off the single-split scan; no-op at scale)
    "quality_gopher": (1, 1, False),
    # block doc-frequency agg + doc rebuild; frequent set joins broadcast.
    # r12 +2: ensure_parallelism spreads the single-split scan before the
    # block-building projection (one repartition per subtree reference;
    # no-ops at real scale where the input carries many splits)
    "boilerplate_removal": (4, 2, False),
    # one exchange on user_id, reused by both the lag window and the rollup
    "sessionize": (1, 1, False),
    "pii_scrub": (0, 1, False),
    # eval-gram distinct (tiny side) + per-doc hit count + output orderBy;
    # the corpus gram explosion itself never shuffles (broadcast probe)
    "decontaminate": (3, 2, False),
    # r12 +1: ensure_parallelism repartition before the winnow UDF (same
    # single-task-scan fix as quality_gopher)
    "fingerprint_winnow": (1, 1, False),
    "doc_summary": (2, 1, False),
    # r9 four-part hybrid suite: single bm25 (5/3) + ONE shared batched
    # multi-query pass (text_search_multi collects its fetch_k=40 list —
    # a LocalTableScan here — and is sliced for the multi part and both
    # fusions) + ONE kNN pass; fusion windows/aggs run on queries×fetch_k
    # rows, never corpus-sized; cartesian = the broadcast 1-row
    # corpus-stats replicate per BM25 pass
    # +2 shuffles r9b: the mmr part's per-query applyInPandas over the
    # broadcast candidate-embedding join, plus the expected-count window
    # on the tiny candidate side (the on_missing guard) — both run on
    # queries×fetch_k rows, never corpus-sized.
    # r10 TIGHTENED 12,7 → 10,2: the single-query BM25 and kNN lists are
    # now collected and rebuilt locally (cache-hygiene fix), so the
    # returned plan holds exactly ONE file scan — embeddings, for the mmr
    # part's candidate join (local rank lists are Scan ExistingRDD, which
    # scan_count rightly ignores)
    "text_search_bm25": (10, 2, True),
    "nested_set": (3, 15, False),
    "dedup_exact": (1, 1, False),
    # minhash LSH path + the exact inverted-index ground-truth path
    "dedup_text_pairs": (4, 4, False),
    # fingerprint table part (1 shuffle-free scan... the repartition) +
    # banded pairs part (bucket join + dedup)
    "dedup_simhash": (4, 3, False),
    # CC iterations run eagerly on checkpointed integer edges; the final plan
    # is labels∪roots (distinct) + corpus left join + order
    "dedup_components": (4, 3, False),
    # q1 agg + q3 join/agg/topk + q5 five-way join/agg; nation/region
    # broadcast; date filters pushed to the scans
    "relational_suite": (4, 12, False),
}


def test_every_entry_has_a_budget():
    assert set(BUDGETS) == set(entry_mod.queries()), (
        "new entry without a plan budget (or stale budget row)"
    )


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    """Plan budgets measure the DESIGNED plan. If an earlier test already
    executed an entry whose operator persists an intermediate (e.g. the
    minhash shingle table or the simhash fingerprint base), the
    CacheManager substitutes the cached plan into this suite's builds and
    the formatted explain then also prints the exchanges INSIDE the
    InMemoryRelation subtree — inflating shuffle_count with shuffles that
    never re-execute. Per-test (not per-module): entries like
    dedup_components execute eagerly at BUILD time and register fresh
    persists mid-suite."""
    spark.catalog.clearCache()
    yield


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_entry_plan_budget(spark, sf_dir, name):
    max_shuffles, max_scans, cartesian_ok = BUDGETS[name]
    df = entry_mod.queries()[name](spark, sf_dir)
    s = shuffle_count(df)
    assert s <= max_shuffles, f"{name}: {s} shuffles > budget {max_shuffles}\n{explain_str(df)}"
    c = scan_count(df)
    assert c <= max_scans, f"{name}: {c} scans > budget {max_scans}\n{explain_str(df)}"
    if not cartesian_ok:
        assert not has_cartesian(df), f"{name}: unexpected cartesian\n{explain_str(df)}"
