"""Hybrid retrieval: batched multi-query BM25 and rank/score fusion.

The reference exposes find(str) (elastic/find.py:74-114) and find(ndarray)
(memory/find.py:92-181) as separate modalities; fusion composes their
top-k lists. RRF per Cormack et al. 2009."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import (
    hybrid_search,
    match,
    minmax_fuse,
    rrf_fuse,
    text_search,
    text_search_multi,
)
from docarray_spark.plans.audit import (
    broadcast_join_count,
    has_window_group_limit,
    scan_count,
)

def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERIES = {
    0: "key value scan table",
    1: "merge join window group",
    2: "vector stream batch data",
}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text")


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, match_id long, score double, rank int"
    )


class TestTextSearchMulti:
    def test_equals_n_single_searches(self, spark, docs):
        multi = text_search_multi(
            docs, QUERIES, id_col="doc_id", k=15, round_to=6
        ).toPandas()
        for qid, q in QUERIES.items():
            single = text_search(
                docs, q, id_col="doc_id", k=15, round_to=6
            ).toPandas()
            part = (
                multi[multi.query_id == qid]
                .sort_values("rank", ignore_index=True)
                .drop(columns="query_id")
            )
            single = single.sort_values("rank", ignore_index=True)
            assert part.doc_id.tolist() == single.doc_id.tolist(), qid
            assert part.score.tolist() == single.score.tolist(), qid
            assert part["rank"].tolist() == single["rank"].tolist(), qid

    def test_plan_one_scan_window_group_limit(self, docs):
        # the public operator collects (its plan is a LocalTableScan);
        # the plan pins live on the lazy subtree, bm25_match_stored-style
        from docarray_spark.operators.text import _text_search_multi_topk

        out, tf = _text_search_multi_topk(docs, QUERIES, id_col="doc_id", k=15)
        try:
            # per-query top-k is a rank-filter window -> WindowGroupLimit
            # (per-partition partial top-k below the exchange), and the
            # corpus is tokenized/scanned once for the whole batch
            assert has_window_group_limit(out)
            # pre-materialization the persisted (doc, term) tf subtree
            # still shows its source scans; never one scan PER QUERY
            assert scan_count(out) <= 3
            # qterms / dfreq hash-broadcast; the 1-row stats crossJoin
            # rides a broadcast nested loop (benign at any scale) — no
            # corpus-sized shuffle beyond the (doc, term) aggregate
            assert broadcast_join_count(out) >= 2
        finally:
            tf.unpersist(False)

    def test_tf_cache_released(self, spark, docs):
        """Serving-loop hygiene: the public operator must leave ZERO new
        entries in the cache manager (the internal tf persist is released
        before returning — bm25_match_stored precedent)."""
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getRDDStorageInfo()
        text_search_multi(docs, QUERIES, id_col="doc_id", k=5).count()
        after = jsc.getRDDStorageInfo()
        assert len(after) == len(before)
        # same contract for the single-query path (r10: last BM25 form
        # that left one pinned entry per call)
        text_search(docs, QUERIES[0], id_col="doc_id", k=5).count()
        assert len(jsc.getRDDStorageInfo()) == len(before)

    def test_empty_queries_raise(self, docs):
        with pytest.raises(ValueError, match="query terms"):
            text_search_multi(docs, {0: "  "}, id_col="doc_id")


class TestFindListDispatch:
    def test_corpus_list_routes_to_batched_path(self, spark, docs):
        """find(list[str]) without index_path: one batched corpus job,
        tagged with the query string — values ≡ per-query text_search.
        Duplicate strings compute once but keep PER-OCCURRENCE rows (the
        old per-query loop's and the index_path branch's cardinality)."""
        from docarray_spark.operators.find import find as ufind

        qs = [QUERIES[0], QUERIES[1], QUERIES[0]]  # duplicate on purpose
        got = (
            ufind(docs, qs, id_col="doc_id", k=5, round_to=6)
            .toPandas()
            .sort_values(["query", "rank"], ignore_index=True)
        )
        assert set(got["query"]) == {QUERIES[0], QUERIES[1]}
        assert len(got) == 15  # 3 occurrences x k=5, duplicate kept
        for q, mult in ((QUERIES[0], 2), (QUERIES[1], 1)):
            exp = (
                text_search(docs, q, id_col="doc_id", k=5, round_to=6)
                .toPandas()
                .sort_values("rank", ignore_index=True)
            )
            part = (
                got[got["query"] == q]
                .drop_duplicates()
                .reset_index(drop=True)
            )
            assert len(got[got["query"] == q]) == mult * len(exp)
            assert part.doc_id.tolist() == exp.doc_id.tolist()
            assert part.score.tolist() == exp.score.tolist()


class TestRrfFuse:
    def test_hand_computed(self, spark):
        # doc 10 is rank 1 in both lists; doc 11 only in list a; doc 12
        # only in list b (rank 2)
        a = _ranked(spark, [(0, 10, 5.0, 1), (0, 11, 4.0, 2)])
        b = _ranked(spark, [(0, 10, 0.1, 1), (0, 12, 0.2, 2)])
        out = rrf_fuse([a, b], k0=60, k=10).toPandas().set_index("match_id")
        assert out.loc[10, "score"] == pytest.approx(2 / 61)
        assert out.loc[11, "score"] == pytest.approx(1 / 62)
        assert out.loc[12, "score"] == pytest.approx(1 / 62)
        assert out.loc[10, "rank"] == 1
        # tie between 11 and 12 broken by id
        assert out.loc[11, "rank"] == 2
        assert out.loc[12, "rank"] == 3

    def test_weights(self, spark):
        a = _ranked(spark, [(0, 10, 5.0, 1)])
        b = _ranked(spark, [(0, 11, 0.1, 1)])
        out = (
            rrf_fuse([a, b], k0=0, k=2, weights=[2.0, 1.0])
            .toPandas()
            .set_index("match_id")
        )
        assert out.loc[10, "score"] == pytest.approx(2.0)
        assert out.loc[11, "score"] == pytest.approx(1.0)

    def test_weights_arity(self, spark):
        a = _ranked(spark, [(0, 10, 5.0, 1)])
        with pytest.raises(ValueError, match="weights"):
            rrf_fuse([a], weights=[1.0, 2.0])

    def test_per_query_partitioning(self, spark):
        a = _ranked(spark, [(0, 10, 5.0, 1), (1, 20, 5.0, 1)])
        b = _ranked(spark, [(0, 10, 0.1, 1), (1, 21, 0.1, 1)])
        out = rrf_fuse([a, b], k=1).toPandas()
        top = {r.query_id: r.match_id for r in out.itertuples()}
        assert top == {0: 10, 1: 20}  # 20 beats 21 by id tie-break


class TestMinmaxFuse:
    def test_hand_computed_with_flip(self, spark):
        # text scores higher-better: 10 -> 1.0 norm, 11 -> 0.0 norm
        a = _ranked(spark, [(0, 10, 8.0, 1), (0, 11, 4.0, 2)])
        # distances lower-better: 10 -> dist 0.0 -> best
        b = _ranked(spark, [(0, 10, 0.0, 1), (0, 11, 1.0, 2)])
        out = (
            minmax_fuse(
                [a, b], weights=[0.5, 0.5], higher_is_better=[True, False], k=5
            )
            .toPandas()
            .set_index("match_id")
        )
        # norm uses (s-min)/(max-min+eps): max lands just under 1.0
        assert out.loc[10, "score"] == pytest.approx(1.0, abs=1e-6)
        assert out.loc[11, "score"] == pytest.approx(0.0, abs=1e-6)
        assert out.loc[10, "rank"] == 1

    def test_missing_doc_contributes_zero(self, spark):
        a = _ranked(spark, [(0, 10, 8.0, 1), (0, 11, 4.0, 2)])
        b = _ranked(spark, [(0, 12, 0.0, 1), (0, 13, 1.0, 2)])
        out = (
            minmax_fuse(
                [a, b], weights=[0.5, 0.5], higher_is_better=[True, False], k=5
            )
            .toPandas()
            .set_index("match_id")
        )
        assert out.loc[10, "score"] == pytest.approx(0.5, abs=1e-6)
        assert out.loc[12, "score"] == pytest.approx(0.5, abs=1e-6)
        assert out.loc[11, "score"] == pytest.approx(0.0, abs=1e-6)

    def test_flags_arity(self, spark):
        a = _ranked(spark, [(0, 10, 5.0, 1)])
        with pytest.raises(ValueError, match="higher_is_better"):
            minmax_fuse([a], weights=[1.0], higher_is_better=[True, False])


class TestHybridSearch:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )

    @pytest.fixture(scope="class")
    def qvecs(self, spark, sf_dir):
        return (
            load(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )

    def test_rrf_end_to_end(self, docs, emb, qvecs):
        out = hybrid_search(
            docs, emb, QUERIES, qvecs, id_col="doc_id", k=10, method="rrf"
        ).toPandas()
        assert set(out.query_id) == {0, 1, 2}
        for qid in QUERIES:
            part = out[out.query_id == qid]
            assert len(part) == 10
            assert sorted(part["rank"]) == list(range(1, 11))
        # the query's own vector is in the corpus: strong vector rank-1
        # signal should keep the self doc in every fused top-10
        assert all(
            qid in set(out[out.query_id == qid].match_id) for qid in QUERIES
        )

    def test_rrf_matches_manual_fusion(self, docs, emb, qvecs):
        fetch_k = 40
        text_ranks = text_search_multi(
            docs, QUERIES, id_col="doc_id", k=fetch_k, round_to=6
        ).withColumnRenamed("doc_id", "match_id")
        vec_ranks = match(
            emb, qvecs, k=fetch_k, metric="cosine", corpus_id_col="doc_id",
            query_id_col="query_id", round_scores=6,
        ).select("query_id", "match_id", "score", "rank")
        manual = (
            rrf_fuse([text_ranks, vec_ranks], k=10, round_to=9)
            .toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        auto = (
            hybrid_search(
                docs, emb, QUERIES, qvecs, id_col="doc_id", k=10, method="rrf"
            )
            .toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        assert manual.match_id.tolist() == auto.match_id.tolist()
        assert manual.score.tolist() == auto.score.tolist()

    def test_wsum_end_to_end(self, docs, emb, qvecs):
        out = hybrid_search(
            docs, emb, QUERIES, qvecs, id_col="doc_id", k=10, method="wsum",
            alpha=0.4,
        ).toPandas()
        for qid in QUERIES:
            part = out[out.query_id == qid]
            assert len(part) == 10
            assert part.score.between(0.0, 1.0 + 1e-9).all()

    def test_mmr_lambda_chains_diversify(self, spark, docs, emb, qvecs):
        """mmr_lambda runs the full retrieve → fuse → diversify pipeline:
        ≡ the manual composition (fuse at fetch_k depth, min-max the fused
        score, mmr_rerank to k); λ=1 reproduces the fused order."""
        from pyspark.sql import Window

        from docarray_spark.operators import mmr_rerank

        got = hybrid_search(
            docs, emb, QUERIES, qvecs, id_col="doc_id", k=5, fetch_k=20,
            method="rrf", mmr_lambda=0.5,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)

        fused = hybrid_search(
            docs, emb, QUERIES, qvecs, id_col="doc_id", k=20, fetch_k=20,
            method="rrf",
        )
        grp = Window.partitionBy("query_id")
        rel = F.round(
            (F.col("score") - F.min("score").over(grp))
            / (F.max("score").over(grp) - F.min("score").over(grp)
               + F.lit(1e-7)),
            6,
        )
        cand = fused.select("query_id", "match_id", rel.alias("rel"))
        want = mmr_rerank(
            cand, emb.select("doc_id", "embedding"), k=5, lam=0.5,
            emb_id_col="doc_id", round_to=6,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        assert got.match_id.tolist() == want.match_id.tolist()
        assert got.score.tolist() == want.score.tolist()

        # λ=1: pure relevance — the fused top-5 order survives
        pure = hybrid_search(
            docs, emb, QUERIES, qvecs, id_col="doc_id", k=5, fetch_k=20,
            method="rrf", mmr_lambda=1.0,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        base = fused.filter(F.col("rank") <= 5).toPandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        assert pure.match_id.tolist() == base.match_id.tolist()

    def test_mmr_on_missing_forwarded(self, spark, docs, emb, qvecs):
        """r10 review: a text-ranked doc with no embedding row used to
        raise mmr_rerank's error suggesting on_missing='drop' — a kwarg
        hybrid_search didn't accept. The forward makes the remedy real."""
        partial = emb.filter(F.col("doc_id") % 7 != 0)  # holes in coverage
        with pytest.raises(Exception, match="missing from the embedding"):
            hybrid_search(
                docs, partial, QUERIES, qvecs, id_col="doc_id", k=5,
                fetch_k=20, mmr_lambda=0.5,
            ).collect()
        out = hybrid_search(
            docs, partial, QUERIES, qvecs, id_col="doc_id", k=5,
            fetch_k=20, mmr_lambda=0.5, mmr_on_missing="drop",
        ).toPandas()
        assert len(out) > 0
        assert (out.match_id % 7 != 0).all()  # holes explicitly excluded

    def test_unknown_method(self, docs, emb, qvecs):
        with pytest.raises(ValueError, match="fusion method"):
            hybrid_search(
                docs, emb, QUERIES, qvecs, id_col="doc_id", method="borda"
            )


class TestMmrRerank:
    def _fixture(self, spark):
        cand = spark.createDataFrame(
            [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.5)],
            "query_id long, match_id long, rel double",
        )
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
            "id long, embedding array<double>",
        )
        return cand, emb

    def test_hand_computed_diversity_beats_redundancy(self, spark):
        """docs 1,2 identical direction (sim 1), doc 3 orthogonal: MMR at
        λ=.5 picks 1 (best rel), then 3 (0.25 beats 2's −0.1), then 2."""
        from docarray_spark.operators import mmr_rerank

        cand, emb = self._fixture(spark)
        out = (
            mmr_rerank(cand, emb, k=3, lam=0.5, rel_col="rel")
            .toPandas().sort_values("rank", ignore_index=True)
        )
        assert out.match_id.tolist() == [1, 3, 2]
        assert out.score.tolist() == pytest.approx([0.45, 0.25, -0.1])
        assert out["rank"].tolist() == [1, 2, 3]

    def test_lam_one_is_pure_relevance(self, spark):
        from docarray_spark.operators import mmr_rerank

        cand, emb = self._fixture(spark)
        out = (
            mmr_rerank(cand, emb, k=3, lam=1.0, rel_col="rel")
            .toPandas().sort_values("rank", ignore_index=True)
        )
        assert out.match_id.tolist() == [1, 2, 3]  # rel order, no diversity

    def test_k_exceeds_candidates_and_tie_break(self, spark):
        from docarray_spark.operators import mmr_rerank

        cand = spark.createDataFrame(
            [(0, 7, 0.5), (0, 4, 0.5)], "query_id long, match_id long, rel double"
        )
        emb = spark.createDataFrame(
            [(7, [1.0, 0.0]), (4, [0.0, 1.0])], "id long, embedding array<double>"
        )
        out = (
            mmr_rerank(cand, emb, k=10, lam=1.0, rel_col="rel")
            .toPandas().sort_values("rank", ignore_index=True)
        )
        assert len(out) == 2  # stops at the candidate count
        assert out.match_id.tolist() == [4, 7]  # equal rel -> smaller id first

    def test_bad_lam(self, spark):
        from docarray_spark.operators import mmr_rerank

        cand, emb = self._fixture(spark)
        with pytest.raises(ValueError, match="lam"):
            mmr_rerank(cand, emb, lam=1.5, rel_col="rel")

    def test_negative_similarity_rewards_antiparallel(self, spark):
        """The diversity term is the TRUE max similarity to the selected
        set — negative for anti-parallel candidates, which makes them MORE
        attractive (review r10): doc 2 (rel 0, embedding opposite to pick
        1) scores 0.5·0 − 0.5·(−1) = +0.5 and beats doc 3's 0.25. A floor
        at 0 would pick 3 second."""
        from docarray_spark.operators import mmr_rerank

        cand = spark.createDataFrame(
            [(0, 1, 0.9), (0, 2, 0.0), (0, 3, 0.5)],
            "query_id long, match_id long, rel double",
        )
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 1.0])],
            "id long, embedding array<double>",
        )
        out = (
            mmr_rerank(cand, emb, k=3, lam=0.5, rel_col="rel")
            .toPandas().sort_values("rank", ignore_index=True)
        )
        assert out.match_id.tolist() == [1, 2, 3]
        assert out.score.tolist() == pytest.approx([0.45, 0.5, 0.25])

    def test_negative_similarity_matches_sql_oracle(self, spark):
        """Engine ≡ the entry's unrolled-argmax SQL oracle on inputs with
        NEGATIVE pairwise similarities — the oracle takes the true
        (possibly negative) max over the selected set and coalesces only
        the empty-set case, and the engine must replay that bit-for-bit."""
        import duckdb
        from docarray_spark.operators import mmr_rerank

        cand = spark.createDataFrame(
            [
                (0, 1, 0.9), (0, 2, 0.0), (0, 3, 0.5), (0, 4, 0.4),
                (1, 1, 0.1), (1, 2, 0.8), (1, 4, 0.7),
            ],
            "query_id long, match_id long, rel double",
        )
        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.0]), (2, [-1.0, 0.0]),
                (3, [0.0, 1.0]), (4, [0.6, -0.8]),
            ],
            "id long, embedding array<double>",
        )
        got = (
            mmr_rerank(cand, emb, k=3, lam=0.5, rel_col="rel")
            .toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        con = duckdb.connect()
        con.register("cand", cand.toPandas())
        con.register("emb", emb.toPandas())
        pick = """
          SELECT query_id, match_id, mmr FROM (
            SELECT query_id, match_id, mmr,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY mmr DESC, match_id ASC) AS rn
            FROM (
              SELECT m.query_id, m.match_id,
                     0.5 * round(m.rel, 6) - 0.5 * coalesce((
                       SELECT max(x.s) FROM msim x
                       JOIN {sel} s ON x.query_id = s.query_id
                                      AND x.db = s.match_id
                       WHERE x.query_id = m.query_id
                         AND x.da = m.match_id), 0.0) AS mmr
              FROM cand m
              WHERE NOT EXISTS (SELECT 1 FROM {sel} s
                                WHERE s.query_id = m.query_id
                                  AND s.match_id = m.match_id)
            )
          ) WHERE rn = 1
        """
        oracle = con.execute(
            """
            WITH msim AS (
              SELECT a.query_id, a.match_id AS da, b.match_id AS db,
                     round(list_cosine_similarity(ea.embedding, eb.embedding),
                           6) AS s
              FROM cand a JOIN cand b
                ON a.query_id = b.query_id AND a.match_id <> b.match_id
              JOIN emb ea ON ea.id = a.match_id
              JOIN emb eb ON eb.id = b.match_id
            ),
            p1 AS (
              SELECT query_id, match_id, mmr FROM (
                SELECT query_id, match_id, 0.5 * round(rel, 6) AS mmr,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY 0.5 * round(rel, 6) DESC, match_id ASC)
                         AS rn
                FROM cand
              ) WHERE rn = 1
            ),
            sel1 AS (SELECT query_id, match_id FROM p1),
            p2 AS ({p2}),
            sel2 AS (SELECT query_id, match_id FROM sel1
                       UNION ALL SELECT query_id, match_id FROM p2),
            p3 AS ({p3})
            SELECT query_id, match_id, round(mmr, 6) AS score, 1 AS rank
            FROM p1
            UNION ALL
            SELECT query_id, match_id, round(mmr, 6), 2 FROM p2
            UNION ALL
            SELECT query_id, match_id, round(mmr, 6), 3 FROM p3
            ORDER BY query_id, rank
            """.format(p2=pick.format(sel="sel1"), p3=pick.format(sel="sel2"))
        ).df()
        assert got.match_id.tolist() == oracle.match_id.tolist()
        assert got.score.tolist() == pytest.approx(oracle.score.tolist())

    def test_all_candidates_missing_raises(self, spark):
        """A query whose EVERY candidate id lacks an embedding row must
        raise under on_missing='error', not silently vanish from the
        output (review r10 — the inner join alone would drop the whole
        group before the per-group count check could fire)."""
        from docarray_spark.operators import mmr_rerank

        cand = spark.createDataFrame(
            [(0, 1, 0.9), (0, 3, 0.5), (7, 101, 0.9), (7, 102, 0.4)],
            "query_id long, match_id long, rel double",
        )
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (3, [0.0, 1.0])],
            "id long, embedding array<double>",
        )
        with pytest.raises(Exception, match="missing from the embedding"):
            mmr_rerank(cand, emb, k=2, lam=0.5, rel_col="rel").collect()
        # drop mode: the whole query is explicitly excluded, query 0 intact
        out = mmr_rerank(
            cand, emb, k=2, lam=0.5, rel_col="rel", on_missing="drop"
        ).toPandas()
        assert sorted(out.query_id.unique()) == [0]
        assert len(out) == 2

    def test_missing_embedding_raises_or_drops(self, spark):
        """A candidate id absent from the embedding corpus must not
        silently vanish from the reranked list (review r9): default
        raises with the per-query count mismatch; on_missing='drop'
        makes the exclusion explicit."""
        from docarray_spark.operators import mmr_rerank

        cand, emb = self._fixture(spark)
        emb2 = emb.filter(F.col("id") != 3)  # drop doc 3's embedding
        with pytest.raises(Exception, match="missing from the embedding"):
            mmr_rerank(cand, emb2, k=3, lam=0.5, rel_col="rel").collect()
        out = mmr_rerank(
            cand, emb2, k=3, lam=0.5, rel_col="rel", on_missing="drop"
        ).toPandas()
        assert sorted(out.match_id) == [1, 2]  # 3 explicitly dropped
        with pytest.raises(ValueError, match="on_missing"):
            mmr_rerank(cand, emb, rel_col="rel", on_missing="zero")


class TestHybridStored:
    """hybrid_search_stored: both modality top-k's served from MAINTAINED
    indexes (bm25_refresh text index + stored HNSW graphs) — the
    serving-path twin of the corpus-scanning hybrid."""

    @pytest.fixture(scope="class")
    def stores(self, spark, docs, sf_dir, tmp_path_factory):
        import numpy as np

        from docarray_spark.operators import bm25_refresh
        from docarray_spark.operators.hnsw import hnsw_build_store
        from docarray_spark.sources.writers import init_parquet_store

        root = tmp_path_factory.mktemp("hybrid_stores")
        text_store = str(root / "text_store")
        init_parquet_store(
            docs.select(F.col("doc_id").alias("id"), "text"),
            text_store, n_buckets=8,
        )
        text_idx = str(root / "bm25_idx")
        bm25_refresh(spark, text_store, text_idx)
        emb = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), "embedding"
        )
        vec_idx = str(root / "hnsw_store")
        hnsw_build_store(
            emb, vec_idx, metric="cosine", corpus_id_col="id",
            M=16, ef_construction=200,
        )
        qv = np.asarray(
            [r.embedding for r in emb.filter(F.col("id") < 3)
             .orderBy("id").collect()],
            dtype=np.float64,
        )
        return text_idx, vec_idx, qv

    def test_matches_manual_stored_fusion(self, spark, stores):
        """Plumbing: the composed call equals fusing the two stored
        serving calls by hand."""
        from docarray_spark.operators import bm25_match_stored, find_by_vectors
        from docarray_spark.operators.fusion import hybrid_search_stored

        text_idx, vec_idx, qv = stores
        texts = [QUERIES[0], QUERIES[1], QUERIES[2]]
        got = hybrid_search_stored(
            spark, text_idx, texts, qv, vector_index_path=vec_idx,
            vector_backend="hnsw", k=10, ef=200,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        tr = bm25_match_stored(
            spark, text_idx, texts, k=40, round_to=6
        ).select("query_id", F.col("id").alias("match_id"), "score", "rank")
        vr = find_by_vectors(
            spark.createDataFrame([], "id bigint, embedding array<float>"),
            qv, k=40, backend="hnsw", index_path=vec_idx, ef=200,
            round_scores=6,
        ).select("query_id", "match_id", "score", "rank")
        want = (
            rrf_fuse([tr, vr], k=10, round_to=9)
            .toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        assert got.match_id.tolist() == want.match_id.tolist()
        assert got.score.tolist() == want.score.tolist()

    def test_agrees_with_exact_hybrid(self, spark, docs, stores, sf_dir):
        """Served fusion recalls what the exact corpus-path hybrid finds
        (hnsw at ef=200 over 500 vectors is effectively exact; BM25 from
        the store is pinned identical to the corpus path elsewhere)."""
        from docarray_spark.operators.fusion import hybrid_search_stored

        text_idx, vec_idx, qv = stores
        emb = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        qvecs = (
            load(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        exact = hybrid_search(
            docs, emb, QUERIES, qvecs, id_col="doc_id", k=10, method="rrf"
        ).toPandas()
        stored = hybrid_search_stored(
            spark, text_idx, [QUERIES[0], QUERIES[1], QUERIES[2]], qv,
            vector_index_path=vec_idx, vector_backend="hnsw", k=10, ef=200,
        ).toPandas()
        for qid in QUERIES:
            a = set(exact[exact.query_id == qid].match_id)
            b = set(stored[stored.query_id == qid].match_id)
            assert len(a & b) >= 8, (qid, a, b)  # ≥0.8 overlap @10

    def test_corpusless_scan_backend_raises(self, spark, stores):
        """exact/lsh/ivf have no stored form: without a corpus the vector
        list would be empty and fusion silently text-only — must raise."""
        from docarray_spark.operators.fusion import hybrid_search_stored

        text_idx, vec_idx, qv = stores
        with pytest.raises(ValueError, match="needs a corpus"):
            hybrid_search_stored(
                spark, text_idx, [QUERIES[0]], qv[:1],
                vector_backend="exact", k=5,
            )
        with pytest.raises(ValueError, match="no stored serving form"):
            hybrid_search_stored(
                spark, text_idx, [QUERIES[0]], qv[:1],
                vector_index_path=vec_idx, vector_backend="lsh", k=5,
            )
        with pytest.raises(ValueError, match="query_vectors"):
            hybrid_search_stored(
                spark, text_idx, [QUERIES[0], QUERIES[1]], qv[:1],
                vector_index_path=vec_idx, k=5,
            )
        with pytest.raises(TypeError, match="list of strings"):
            hybrid_search_stored(
                spark, text_idx, QUERIES[0], qv[:1],
                vector_index_path=vec_idx, k=5,
            )

    def test_string_id_stores_end_to_end(
        self, spark, docs, sf_dir, tmp_path_factory
    ):
        """String-id lifecycle through store init → index refresh → pure
        stored serve → fusion: the 0-row corpus placeholder derives its id
        type from the text index's postings schema instead of hardcoding
        bigint (r9 review) — a string-id store must serve without a
        type-clash anywhere in the path."""
        import numpy as np

        from docarray_spark.operators import bm25_refresh
        from docarray_spark.operators.fusion import hybrid_search_stored
        from docarray_spark.operators.hnsw import hnsw_build_store
        from docarray_spark.sources.writers import init_parquet_store

        root = tmp_path_factory.mktemp("hybrid_sid")
        sid = F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
        text_store = str(root / "text_store")
        init_parquet_store(
            docs.select(sid.alias("id"), "text"), text_store, n_buckets=8
        )
        text_idx = str(root / "bm25_idx")
        bm25_refresh(spark, text_store, text_idx)
        emb = load(spark, sf_dir, "embeddings").select(
            F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("id"),
            "embedding",
        )
        vec_idx = str(root / "hnsw_store")
        hnsw_build_store(
            emb, vec_idx, metric="cosine", corpus_id_col="id",
            M=16, ef_construction=200,
        )
        qv = np.asarray(
            [r.embedding for r in load(spark, sf_dir, "embeddings")
             .filter(F.col("vec_id") < 2).orderBy("vec_id").collect()],
            dtype=np.float64,
        )
        out = hybrid_search_stored(
            spark, text_idx, [QUERIES[0], QUERIES[1]], qv,
            vector_index_path=vec_idx, vector_backend="hnsw", k=10, ef=200,
        ).toPandas()
        assert len(out) == 20
        assert out.match_id.str.startswith("doc-").all()
        assert sorted(out.query_id.unique()) == [0, 1]

    def test_fusion_from_stored_text_list_bit_exact_sf001(self, spark):
        """VERDICT r9 #5: fusion over a STORED text rank list is
        SQL-replayable as-is — bm25_match_stored's scoring is pinned
        ≡ the corpus path elsewhere, so swapping it into the fusion must
        reproduce the corpus-path fused output BIT-EXACTLY (same vector
        list on both sides), for both rrf and wsum, at sf0.01 (the
        driver's correctness scale)."""
        import os

        import numpy as np

        from docarray_spark.operators import bm25_refresh, bm25_match_stored
        from docarray_spark.sources.writers import init_parquet_store

        sf01 = "/root/testdata/sf0.01"
        if not os.path.exists(f"{sf01}/documents.parquet"):
            pytest.skip("sf0.01 testdata not present")
        docs01 = load(spark, sf01, "documents").select("doc_id", "text")
        emb01 = load(spark, sf01, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        qvecs = (
            load(spark, sf01, "embeddings")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        import tempfile

        with tempfile.TemporaryDirectory() as root:
            store = f"{root}/text_store"
            init_parquet_store(
                docs01.select(F.col("doc_id").alias("id"), "text"),
                store, n_buckets=8,
            )
            idx = f"{root}/bm25_idx"
            bm25_refresh(spark, store, idx)
            texts = [QUERIES[0], QUERIES[1], QUERIES[2]]
            stored_tr = bm25_match_stored(
                spark, idx, texts, k=40, round_to=6
            ).select("query_id", F.col("id").alias("match_id"), "score", "rank")
            corpus_tr = text_search_multi(
                docs01, QUERIES, id_col="doc_id", k=40, round_to=6
            ).withColumnRenamed("doc_id", "match_id")
            vec = match(
                emb01, qvecs, k=40, metric="cosine", corpus_id_col="doc_id",
                query_id_col="query_id", round_scores=6, eps=0.0,
            ).select("query_id", "match_id", "score", "rank")
            vec = spark.createDataFrame(vec.collect(), vec.schema)

            for fuse in (
                lambda t: rrf_fuse([t, vec], k=10, round_to=9),
                lambda t: minmax_fuse(
                    [t, vec], weights=[0.25, 0.75],
                    higher_is_better=[True, False], k=10, round_to=6,
                ),
            ):
                a = fuse(stored_tr).toPandas().sort_values(
                    ["query_id", "rank"], ignore_index=True
                )
                b = fuse(corpus_tr).toPandas().sort_values(
                    ["query_id", "rank"], ignore_index=True
                )
                assert a.match_id.tolist() == b.match_id.tolist()
                assert a.score.tolist() == b.score.tolist()  # bit-exact

    def test_wsum_method(self, spark, stores):
        from docarray_spark.operators.fusion import hybrid_search_stored

        text_idx, vec_idx, qv = stores
        out = hybrid_search_stored(
            spark, text_idx, [QUERIES[0]], qv[:1],
            vector_index_path=vec_idx, vector_backend="hnsw", k=5,
            method="wsum", alpha=0.5, ef=200,
        ).toPandas()
        assert len(out) == 5
        assert out.score.between(0.0, 1.0 + 1e-9).all()

    def test_mmr_chained_equals_manual_composition(
        self, spark, stores, sf_dir
    ):
        """VERDICT r10 #2: the stored serving form chains retrieve → fuse
        → diversify in one call — pinned ≡ composing the un-chained
        stored call with _diversify_fused by hand, on the REAL stored
        backends (bm25 index + hnsw graphs)."""
        from docarray_spark.operators.fusion import (
            _diversify_fused,
            hybrid_search_stored,
        )

        text_idx, vec_idx, qv = stores
        emb = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), "embedding"
        )
        texts = [QUERIES[0], QUERIES[1], QUERIES[2]]
        chained = hybrid_search_stored(
            spark, text_idx, texts, qv, vector_index_path=vec_idx,
            vector_backend="hnsw", k=10, ef=200,
            mmr_lambda=0.5, mmr_corpus=emb, mmr_on_missing="drop",
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        fused = hybrid_search_stored(
            spark, text_idx, texts, qv, vector_index_path=vec_idx,
            vector_backend="hnsw", k=40, fetch_k=40, ef=200,
        )
        manual = _diversify_fused(
            fused, emb, 0.5, 10, id_col="id", emb_col="embedding",
            round_to=6, on_missing="drop",
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        assert chained.match_id.tolist() == manual.match_id.tolist()
        assert chained.score.tolist() == manual.score.tolist()
        assert (chained.groupby("query_id").size() == 10).all()

    def test_mmr_chained_equals_corpus_path_sf001(self, spark):
        """...AND ≡ the corpus-path chained output on the same corpus —
        the r9 stored-fusion bit-exact pin extended one stage through the
        diversifier: stored text index + exact vector scoring gives both
        paths one candidate universe, so hybrid_search(mmr_lambda=) and
        hybrid_search_stored(mmr_lambda=) must agree bit-for-bit."""
        import os

        from docarray_spark.operators import bm25_refresh
        from docarray_spark.operators.fusion import hybrid_search_stored
        from docarray_spark.sources.writers import init_parquet_store

        sf01 = "/root/testdata/sf0.01"
        if not os.path.exists(f"{sf01}/documents.parquet"):
            pytest.skip("sf0.01 testdata not present")
        docs01 = load(spark, sf01, "documents").select("doc_id", "text")
        emb01 = load(spark, sf01, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        qvecs = (
            load(spark, sf01, "embeddings")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        import numpy as np

        qv = np.asarray(
            [r.embedding for r in qvecs.orderBy("query_id").collect()],
            dtype=np.float64,
        )
        corpus_path = hybrid_search(
            docs01, emb01, QUERIES, qvecs, id_col="doc_id", k=10,
            method="rrf", mmr_lambda=0.5,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        import tempfile

        with tempfile.TemporaryDirectory() as root:
            store = f"{root}/text_store"
            init_parquet_store(
                docs01.select(F.col("doc_id").alias("id"), "text"),
                store, n_buckets=8,
            )
            idx = f"{root}/bm25_idx"
            bm25_refresh(spark, store, idx)
            stored = hybrid_search_stored(
                spark, idx, [QUERIES[0], QUERIES[1], QUERIES[2]], qv,
                vector_backend="exact",
                corpus=emb01.withColumnRenamed("doc_id", "id"),
                id_col="id", k=10, method="rrf",
                mmr_lambda=0.5, mmr_emb_col="embedding", eps=0.0,
            ).toPandas().sort_values(
                ["query_id", "rank"], ignore_index=True
            )
        assert corpus_path.match_id.tolist() == stored.match_id.tolist()
        assert corpus_path.score.tolist() == stored.score.tolist()

    def test_embeddings_knob_unifies_rerank_and_mmr(
        self, spark, stores, sf_dir, tmp_path_factory
    ):
        """VERDICT r11 #4: ONE ``embeddings=`` knob feeds both stages
        that need raw vectors — the quantized backend's exact rerank
        (``rerank_corpus``) and the MMR diversifier (``mmr_corpus``) —
        pinned identical to r11's two-knob wiring on a real sq8 store,
        with explicit per-stage overrides still winning."""
        from docarray_spark.operators import sq_refresh
        from docarray_spark.operators.fusion import hybrid_search_stored
        from docarray_spark.operators.pq import sq_train
        from docarray_spark.sources.writers import init_parquet_store

        text_idx, _, qv = stores
        emb = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), "embedding"
        )
        root = tmp_path_factory.mktemp("emb_knob")
        vstore = str(root / "vec_store")
        init_parquet_store(emb, vstore, n_buckets=8)
        enc = str(root / "sq_codes")
        sq_refresh(spark, vstore, enc, sq_train(emb))
        texts = [QUERIES[0], QUERIES[1], QUERIES[2]]
        common = dict(
            vector_index_path=enc, vector_backend="sq8", k=10,
            metric="sqeuclidean", mmr_lambda=0.5, mmr_on_missing="drop",
        )
        one_knob = hybrid_search_stored(
            spark, text_idx, texts, qv, embeddings=emb, **common
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        two_knob = hybrid_search_stored(
            spark, text_idx, texts, qv, mmr_corpus=emb, rerank_corpus=emb,
            **common,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        assert one_knob.match_id.tolist() == two_knob.match_id.tolist()
        assert one_knob.score.tolist() == two_knob.score.tolist()
        # explicit rerank_corpus= still overrides the unified knob: a
        # deliberately EMPTY override must change the vector side (no
        # exact rerank), so the knob is not silently double-wired
        empty = spark.createDataFrame([], emb.schema)
        overridden = hybrid_search_stored(
            spark, text_idx, texts, qv, embeddings=emb,
            rerank_corpus=empty, **common,
        ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
        assert (
            overridden.match_id.tolist() != one_knob.match_id.tolist()
            or overridden.score.tolist() != one_knob.score.tolist()
        )

    def test_mmr_needs_embeddings(self, spark, stores):
        from docarray_spark.operators.fusion import hybrid_search_stored

        text_idx, vec_idx, qv = stores
        with pytest.raises(ValueError, match="mmr_corpus"):
            hybrid_search_stored(
                spark, text_idx, [QUERIES[0]], qv[:1],
                vector_index_path=vec_idx, vector_backend="hnsw",
                k=5, ef=200, mmr_lambda=0.5,
            )
