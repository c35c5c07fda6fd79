"""Approximate nearest-neighbour search (engine extension; SURVEY.md §4.2).

The reference delegates ANN to external HNSW stores (annlite/qdrant/
weaviate/elastic, ``/root/reference/docarray/array/storage/annlite/find.py:
16-44``); a 1000-executor Spark cluster can't host a single HNSW graph, so
the scale paths here are LSH bucketing and IVF partitioning — both turn the
kNN into *bucket equi-joins + per-query top-k*, the shape Spark executes
well at 100 TB:

* ``lsh_match``: random-hyperplane signatures, ``num_tables`` independent
  tables; candidates = signature-bucket equi-join (hash shuffle on short
  keys), exact distance only on candidates, per-query top-k window.
  Recall/cost dial: more tables/fewer planes → higher recall/more
  candidates.
* ``ivf_match``: deterministic coarse quantizer — centroids are a hash-
  sampled subset of the corpus; every vector is assigned to its nearest
  centroid (one broadcast of the small centroid set); queries probe the
  ``n_probe`` nearest cells. All joins are equi-joins on ``cell``.

Exact brute force (``operators/match.py``) stays the baseline; these trade
recall for candidate-set size. Recall is measured in tests against the
exact operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docarray_spark.functions.distance import (
    cosine_distance_col,
    sqeuclidean_distance_col,
)
from docarray_spark.functions.lsh import signatures_udf

_PAIR_DIST = {
    "cosine": cosine_distance_col,
    "sqeuclidean": sqeuclidean_distance_col,
    "euclidean": lambda a, b: F.sqrt(sqeuclidean_distance_col(a, b)),
}


def lsh_match(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    corpus_id_col: str = "id",
    query_id_col: str = "id",
    emb_col: str = "embedding",
    num_planes: int = 10,
    num_tables: int = 8,
    seed: int = 42,
    round_scores: int | None = None,
    dim: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidate join + exact re-rank.
    → (query_id, match_id, rank, score, metric_name); rank has no gaps but
    a query may return < k rows if its buckets are sparse.

    Hyperplanes are md5-derived ±1 signs (``functions/lsh.py``) — fully
    deterministic and SQL-reproducible, so the whole operator (bucketing
    included) is oracle-gated.

    Scale shape: the bucket equi-join carries ONLY (id, table, sig) —
    dense vectors never enter that shuffle (they'd be replicated
    num_tables×); candidates are deduped to id pairs first, then the two
    vector columns are re-joined once for the exact re-rank (same pattern
    as ``minhash_dedup_pairs``'s shingle re-join).

    Pass ``dim`` when known (it usually is) — otherwise one extra Spark
    job probes the first row for it.

    ``max_bucket``: drop corpus signature buckets larger than this before
    the candidate join — a degenerate hot bucket (constant embeddings,
    mass duplicates) makes the join quadratic in its size and carries no
    discrimination. Off by default (gated entries stay exact)."""
    if dim is None:
        dim = len(corpus.select(emb_col).first()[0])
    sig = signatures_udf(dim, num_tables, num_planes, seed)
    emb_d = F.expr(f"transform({emb_col}, x -> cast(x as double))")

    c = corpus.select(F.col(corpus_id_col).alias("match_id"), emb_d.alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), emb_d.alias("_qv"))

    # ids-only bucket tables: the projection consumes the vector and emits
    # nothing but (id, table, sig)
    c_b = c.select("match_id", F.posexplode(sig("_cv")).alias("table", "sig"))
    q_b = q.select("query_id", F.posexplode(sig("_qv")).alias("table", "sig"))
    if max_bucket is not None:
        # broadcast only the HOT keys (anti-join): the OK set is
        # corpus-bucket-sized — broadcasting it collects every distinct
        # signature to the driver (r4 scale run: >1 GB at 4M rows)
        hot = (
            c_b.groupBy("table", "sig")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("table", "sig")
        )
        c_b = c_b.join(F.broadcast(hot), ["table", "sig"], "left_anti")

    cand = (
        q_b.join(c_b, ["table", "sig"])
        .select("query_id", "match_id")
        .dropDuplicates(["query_id", "match_id"])
    )
    dist = _PAIR_DIST[metric](F.col("_qv"), F.col("_cv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "match_id")
        .select("query_id", "match_id", dist.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").asc(), F.col("match_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    score = F.round("score", round_scores) if round_scores is not None else F.col("score")
    return out.select(
        "query_id", "match_id", "rank", score.alias("score"),
        F.lit(metric).alias("metric_name"),
    )


def ivf_index(
    corpus: DataFrame,
    n_cells: int,
    corpus_id_col: str = "id",
    emb_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantizer: centroids = the ``n_cells``
    corpus vectors with the smallest md5(id) (a uniform hash-sample —
    engine-portable, no iterative kmeans); assignment = per-row argmin
    sqeuclidean against the centroid set folded INTO the projection as a
    literal array, so cell assignment is a ZERO-SHUFFLE map over the
    corpus (round-1 verdict flaw #1: the earlier crossJoin +
    Window.partitionBy(id) formulation hash-exchanged N×n_cells rows with
    vectors attached).

    The small centroid job runs eagerly here (n_cells rows to the driver —
    same bounded-collect stance as ``match``'s query batch). Assignment
    goes through :func:`cluster.assign_cells`, which dispatches on k·d:
    codegen literal fold for small centroid sets (SQL-oracle-able),
    broadcast-matrix pandas_udf argmin beyond ``LITERAL_ARGMIN_MAX_KD``
    (VERDICT r2 #2 — the literal fold at thousands of cells × hundreds of
    dims would overflow janino's method budget). Both are zero-shuffle.

    → (centroids(cell, centroid), assigned(cell, id, embedding));
    ``assigned`` is typically written out partitioned/bucketed BY cell so
    probes prune files."""
    from docarray_spark.operators.cluster import assign_cells

    emb_d = F.expr(f"transform({emb_col}, x -> cast(x as double))")
    base = corpus.select(F.col(corpus_id_col).alias("id"), emb_d.alias("v"))
    if centroids is None:
        cent_rows = (
            base.withColumn("_h", F.md5(F.col("id").cast("string")))
            .orderBy("_h")
            .limit(n_cells)
            .drop("_h")
            .orderBy("id")  # n_cells rows: cell numbering sorts on the driver
            .collect()
        )
        cents = [(i, [float(x) for x in r.v]) for i, r in enumerate(cent_rows)]
    else:
        # caller-trained quantizer — typically cluster.kmeans centroids
        # (classic IVF): clustered cells concentrate true neighbours, so
        # the same n_probe fraction yields far higher recall on structured
        # corpora than the hash-sampled default (which stays the
        # SQL-oracle-able choice for the gated entries)
        cents = sorted((int(c), [float(x) for x in v]) for c, v in centroids)
    spark = corpus.sparkSession
    cent = spark.createDataFrame(cents, "cell int, centroid array<double>")
    assigned = assign_cells(base, cents)
    return cent, assigned


def ivf_match(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    metric: str = "cosine",
    corpus_id_col: str = "id",
    query_id_col: str = "id",
    emb_col: str = "embedding",
    round_scores: int | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign corpus to cells, probe the ``n_probe``
    closest cells per query, exact distance inside probed cells only.
    Default quantizer is the deterministic hash-sample (SQL-oracle-able);
    pass ``centroids`` (e.g. from ``cluster.kmeans``) for classic
    kmeans-IVF — higher recall per probed fraction on clustered data."""
    cent, assigned = ivf_index(corpus, n_cells, corpus_id_col, emb_col, centroids)
    emb_d = F.expr(f"transform({emb_col}, x -> cast(x as double))")
    q = queries.select(F.col(query_id_col).alias("query_id"), emb_d.alias("qv"))

    qc = q.crossJoin(F.broadcast(cent))
    dcell = sqeuclidean_distance_col(F.col("qv"), F.col("centroid"))
    wq = Window.partitionBy("query_id").orderBy(dcell.asc(), F.col("cell").asc())
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    cand = probes.join(assigned, "cell")
    dist = _PAIR_DIST[metric](F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").asc(), F.col("match_id").asc())
    out = (
        cand.select("query_id", F.col("id").alias("match_id"), dist.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    score = F.round("score", round_scores) if round_scores is not None else F.col("score")
    return out.select(
        "query_id", "match_id", "rank", score.alias("score"),
        F.lit(metric).alias("metric_name"),
    )
