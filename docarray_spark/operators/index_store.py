"""Bucket-aligned ANN index maintenance — index-behind-CRUD.

The reference's store-backed arrays keep an ANN index that tracks document
CRUD (``/root/reference/docarray/array/storage/annlite/backend.py:27-30``:
every ``__setitem__``/``__delitem__`` lands in both the column store and
the HNSW index). At 100 TB that contract cannot mean "rebuild the index on
every write" — real serving systems re-index only the shards a write
touched. This module gives the engine that lifecycle by ALIGNING index
segments with the parquet MERGE store's hash buckets
(``sources/writers.py:init_parquet_store``: ``_bucket = pmod(xxhash64(id),
n_buckets)``):

- one index segment per ``_bucket`` (an HNSW graph blob, or the bucket's
  PQ codes), written ``partitionBy("_bucket")`` next to the store;
- ``merge_parquet_store`` reports exactly which buckets an upsert/delete
  touched (its ``summary["buckets"]``);
- ``refresh`` re-reads ONLY those buckets (partition-pruned scan) and
  rebuilds ONLY their segments (delete-then-append of those directories),
  so a segment of a bucket the merge emptied simply stays deleted.
  Untouched segments are never read, rebuilt, or rewritten — their files
  stay byte-identical. ``index_status`` audits store-vs-index freshness
  per bucket from FS metadata alone.

Cost model: a batch of ``b`` upserts into an ``n_buckets`` store touches
``≤ b`` buckets, so refresh cost is ``O(b · bucket_size)`` independent of
corpus size — the property that makes index-behind-CRUD viable at scale.
The search side is unchanged: ``hnsw_match_stored`` reads the bucketed
segment store as-is (one task per segment row, k×segments merge), and the
encoded table :func:`pq_refresh` maintains is exactly what
``pq_match``/``sq_match`` scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docarray_spark.operators.hnsw import _METRICS
from docarray_spark.sources.registry import _exists as _dir_exists
from docarray_spark.sources.writers import _delete_dir


def _store_df(
    spark: SparkSession, store_path: str, buckets: list[int] | None
) -> DataFrame:
    df = spark.read.parquet(store_path)
    if "_bucket" not in df.columns:
        raise ValueError(
            f"{store_path!r} is not a bucketed store (init_parquet_store "
            "writes the _bucket partition column)"
        )
    if buckets is not None:
        # partition-pruned: only the affected buckets' directories are read
        df = df.filter(F.col("_bucket").isin([int(b) for b in buckets]))
    return df


def _overwrite_segments(
    spark: SparkSession,
    segments: DataFrame,
    index_path: str,
    buckets: list[int] | None,
) -> int:
    """Full build → static overwrite. Refresh → DELETE the affected
    buckets' segment directories, then APPEND the rebuilt segments: the
    write recreates exactly the buckets that still produce one, so a
    bucket the merge emptied simply stays deleted (dynamic partition
    overwrite cannot delete a partition, and its emptied-bucket
    computation forced a localCheckpoint + a second execution of the
    whole segment build — measured at 2× the refresh cost for the
    postings-sized bm25 segments). Not atomic across the delete/append
    pair, but idempotent: a retried refresh deletes and re-appends the
    same buckets — consistent with the store's own single-writer
    copy-on-write contract. Returns the number of emptied segments
    (affected buckets whose directory no longer exists after the write,
    an FS metadata check, not a job)."""
    if buckets is None:
        segments.write.mode("overwrite").partitionBy("_bucket").parquet(index_path)
        return 0
    affected = sorted({int(b) for b in buckets})
    for b in affected:
        _delete_dir(f"{index_path}/_bucket={b}", spark)
    segments.write.mode("append").partitionBy("_bucket").parquet(index_path)
    return sum(1 for b in affected if not _dir_exists(f"{index_path}/_bucket={b}", spark))


def hnsw_refresh(
    spark: SparkSession,
    store_path: str,
    index_path: str,
    buckets: list[int] | None = None,
    metric: str = "cosine",
    id_col: str = "id",
    emb_col: str = "embedding",
    M: int = 16,
    ef_construction: int = 100,
) -> dict:
    """Build (``buckets=None``) or incrementally refresh (``buckets=
    summary["buckets"]`` from :func:`merge_parquet_store`) the bucket-
    aligned HNSW segment store for a bucketed document store.

    One graph per ``_bucket``, one parquet row per graph, directory layout
    ``index_path/_bucket=N/``. Graph construction is the deterministic
    pure-numpy index (``functions/hnsw.py``) — a rebuilt segment is
    byte-reproducible, so task retries converge. Query with
    ``operators.hnsw.hnsw_match_stored(spark, index_path, ...)`` — the
    searcher is segment-count-agnostic. → summary dict."""
    if metric not in _METRICS:
        raise ValueError(f"hnsw_refresh supports {_METRICS}, got {metric!r}")
    df = _store_df(spark, store_path, buckets)
    id_type = df.schema[id_col].dataType.simpleString()
    mm, efc, met, idc, embc = M, ef_construction, metric, id_col, emb_col

    def _build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        import pickle

        from docarray_spark.functions.hnsw import HNSWIndex

        pdf = pdf[pdf[embc].notna()]
        if not len(pdf):
            return pd.DataFrame(
                {"_bucket": [], "metric": [], "id_type": [], "n": [], "blob": []}
            )
        keys = list(pdf[idc].to_numpy())
        mat = np.asarray([np.asarray(e, dtype=np.float64) for e in pdf[embc]])
        if met == "cosine":
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms == 0.0, 1.0, norms)
        index = HNSWIndex(dim=mat.shape[1], M=mm, ef_construction=efc)
        index.add_batch(keys, mat)
        index._data = index._data[: index.n]  # drop growth slack pre-pickle
        index._sq = index._sq[: index.n]
        return pd.DataFrame(
            {
                "_bucket": [int(pdf["_bucket"].iloc[0])],
                "metric": [met],
                "id_type": [id_type],
                "n": [index.n],
                "blob": [pickle.dumps(index, protocol=5)],
            }
        )

    segments = (
        df.select("_bucket", id_col, emb_col)
        .groupBy("_bucket")
        .applyInPandas(
            _build_one,
            "_bucket int, metric string, id_type string, n long, blob binary",
        )
    )
    emptied = _overwrite_segments(spark, segments, index_path, buckets)
    return {
        "rebuilt_buckets": "all" if buckets is None else len(set(buckets)),
        "segments_emptied": emptied,
    }


def pq_refresh(
    spark: SparkSession,
    store_path: str,
    encoded_path: str,
    codebooks: list[list[list[float]]],
    buckets: list[int] | None = None,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> dict:
    """Build or incrementally refresh the bucket-aligned PQ-encoded table
    (``operators/pq.pq_encode`` codes, partitioned by the store's
    ``_bucket``). Encoding is map-only per row, so a refresh is a pruned
    scan of the affected buckets plus a rewrite of exactly their
    segment directories — nothing else is read or written. The codebooks are the
    TRAINED quantizer and must stay fixed across refreshes (retraining
    invalidates every segment; that is a full rebuild). Query the result
    with ``pq_match(spark.read.parquet(encoded_path), ...)``."""
    from docarray_spark.operators.pq import pq_encode

    df = _store_df(spark, store_path, buckets)
    encoded = pq_encode(
        df, codebooks, id_col=id_col, emb_col=emb_col, keep_cols=["_bucket"]
    )
    emptied = _overwrite_segments(spark, encoded, encoded_path, buckets)
    return {
        "rebuilt_buckets": "all" if buckets is None else len(set(buckets)),
        "segments_emptied": emptied,
    }


def dedup_refresh(
    spark: SparkSession,
    store_path: str,
    dedup_path: str,
    buckets: list[int] | None = None,
    id_col: str = "id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_bands: int = 8,
) -> dict:
    """Build (``buckets=None``) or incrementally refresh the bucket-
    aligned DEDUP HISTORY for a bucketed document store — dedup-behind-
    CRUD, the third index family beside :func:`hnsw_refresh` /
    :func:`pq_refresh`. Each store row reduces to its
    ``operators.dedup.history_table`` keys (text fingerprint + MinHash
    band minima), written ``partitionBy("_bucket")`` next to the store;
    an upsert refreshes only ``summary["buckets"]`` — a pruned scan plus
    a rewrite of exactly those directories, O(batch), never O(corpus).

    Probe incoming batches with :func:`dedup_against_store`; its
    ``shingle_n``/``num_bands`` MUST match the values used here (the
    probe validates band count from the stored arrays). The per-row map
    is deterministic, so a rebuilt segment is byte-reproducible across
    task retries like the other two index families. → summary dict."""
    from docarray_spark.operators.dedup import history_table

    df = _store_df(spark, store_path, buckets)
    hist = history_table(
        df, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, num_bands=num_bands, keep_cols=["_bucket"],
    )
    emptied = _overwrite_segments(spark, hist, dedup_path, buckets)
    return {
        "rebuilt_buckets": "all" if buckets is None else len(set(buckets)),
        "segments_emptied": emptied,
    }


def dedup_against_store(
    spark: SparkSession,
    new_df: DataFrame,
    dedup_path: str,
    id_col: str = "id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_bands: int = 8,
    min_band_hits: int = 1,
) -> DataFrame:
    """Flag rows of ``new_df`` that exactly or nearly duplicate the
    corpus behind a :func:`dedup_refresh`-maintained history — the
    "dedup this crawl against everything already ingested" probe served
    from the PREBUILT store: history text is never re-read or re-hashed
    (the scan reads only the fixed-width ``_fp``/``_mh`` columns), so
    probe cost is O(new batch) + a column-pruned history scan. Output
    contract = ``operators.dedup.dedup_against``:
    ``(id_col, is_exact_dup, n_band_hits, is_near_dup)``."""
    from docarray_spark.operators.dedup import dedup_against_history

    hist = spark.read.parquet(dedup_path).select("_fp", "_mh")
    first = hist.select(F.size("_mh").alias("_nb")).first()
    if first is not None and first._nb != num_bands:
        raise ValueError(
            f"history at {dedup_path!r} stores {first._nb} bands, probe "
            f"asked for {num_bands} — shingle_n/num_bands must match the "
            "dedup_refresh that built it"
        )
    return dedup_against_history(
        new_df, hist,
        id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, num_bands=num_bands, min_band_hits=min_band_hits,
    )


def bm25_refresh(
    spark: SparkSession,
    store_path: str,
    index_path: str,
    buckets: list[int] | None = None,
    id_col: str = "id",
    text_col: str = "text",
) -> dict:
    """Build or incrementally refresh the bucket-aligned BM25 inverted
    index for a bucketed document store — text-search-behind-CRUD, the
    fourth index family beside :func:`hnsw_refresh` / :func:`pq_refresh` /
    :func:`dedup_refresh` (the reference's text-capable stores keep their
    search index in lockstep with document CRUD the same way).

    Unlike ``operators.text.bm25_index``, nothing CORPUS-GLOBAL is stored:

    - ``index_path/postings``: ``(_bucket, token, id, dl, tf)`` — per-doc
      term frequencies WITHOUT the pre-joined ``df`` column (df is global,
      so storing it would invalidate every segment on every write);
    - ``index_path/stats``: one row per bucket ``(_bucket, n_docs,
      sum_dl)``.

    Both are functions of their own bucket's documents ONLY, so an upsert
    refreshes just ``summary["buckets"]``'s directories and the refresh is
    O(batch). :func:`bm25_match_stored` reconstitutes the global quantities
    at query time: ``n_docs``/``avgdl`` by summing the ≤n_buckets stats
    rows, and per-term ``df`` by counting the term-filtered postings — a
    token's df only ever needs that token's own postings, which the query
    scan already read. Postings are sorted by (token, id) within each
    segment: deterministic bytes for retry-reproducibility AND tight
    parquet row-group token min/max so the query's term filter prunes
    row groups inside surviving segments.

    SIZING: postings amplify the store ~tokens-per-doc× in ROWS, so the
    per-segment file must stay ≥ tens of MB or per-file open/list
    overhead dominates every query — measured at 1M docs / 30M postings:
    64 buckets → 2.7 s warm query, 1024 buckets → 36 s (13×
    small-file pathology; build 16 s vs 128 s for the same reason). The
    store's own law still binds from the other side (n_buckets ≫ typical
    batch for refresh locality); at this probe's corpus size the two
    conflict, at 100 TB they don't — e.g. 64k buckets × ~1M docs each
    gives multi-GB postings segments AND batch-local refreshes. Pick
    n_buckets from corpus size ÷ target segment size, never from batch
    size alone."""
    from docarray_spark.operators.text import tokens_col

    df = _store_df(spark, store_path, buckets)
    base = (
        df.select("_bucket", F.col(id_col), tokens_col(text_col).alias("_toks"))
        .withColumn("_dl", F.size("_toks"))
    )
    tf = (
        base.select("_bucket", id_col, "_dl", F.explode("_toks").alias("token"))
        .groupBy("_bucket", "token", id_col, "_dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    postings = tf.select(
        "_bucket", "token", F.col(id_col), F.col("_dl").alias("dl"), "tf"
    ).sortWithinPartitions("token", id_col)
    emptied = _overwrite_segments(spark, postings, f"{index_path}/postings", buckets)
    stats = base.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("_dl").alias("sum_dl")
    )
    _overwrite_segments(spark, stats, f"{index_path}/stats", buckets)
    return {
        "rebuilt_buckets": "all" if buckets is None else len(set(buckets)),
        "segments_emptied": emptied,
    }


def bm25_match_stored(
    spark: SparkSession,
    index_path: str,
    query: str,
    id_col: str = "id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = None,
) -> DataFrame:
    """BM25 top-k over a :func:`bm25_refresh`-maintained index. Scoring
    (and output schema ``(id, score, rank)``) identical to
    ``operators.text.bm25_query`` / ``text_search`` — pinned by test —
    but served entirely from the store: the postings scan is filtered to
    the query's terms (parquet row-group pruning via the per-segment
    token sort), per-term ``df`` is an agg over exactly those rows, and
    global ``n_docs``/``avgdl`` come from the ≤n_buckets stats rows.
    Nothing here scales with corpus size except the pruned term lookup."""
    qterms = sorted({t for t in query.lower().split() if t})
    posts = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("token").isin(qterms))
        .select("token", id_col, "dl", "tf")
        # both the per-term df aggregation and the scoring read this tiny
        # slice (≈ df(term)·|terms| rows): materialize it so the postings
        # parquet is scanned ONCE per query, not once per consumer (the 1M
        # probe measured the double scan at 2× query latency)
        .localCheckpoint(eager=True)
    )
    stats = (
        spark.read.parquet(f"{index_path}/stats")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
        )
    )
    dfreq = posts.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    hit = posts.join(F.broadcast(dfreq), "token").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = hit.withColumn("_s", s).groupBy(id_col).agg(F.sum("_s").alias("score"))
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    out = top.withColumn("rank", F.row_number().over(w))
    score = F.round("score", round_to) if round_to is not None else F.col("score")
    return out.select(id_col, score.alias("score"), "rank")


def _bucket_mtimes(path: str, spark: SparkSession) -> dict[int, float]:
    """Newest file mtime (epoch seconds) under each ``_bucket=N``
    directory — driver-side FS metadata only, no Spark job. Works on any
    Hadoop-compatible filesystem; plain local paths short-circuit to os."""
    out: dict[int, float] = {}
    if "://" not in path:
        import os

        if not os.path.isdir(path):
            return out
        for d in os.listdir(path):
            if not d.startswith("_bucket="):
                continue
            full = os.path.join(path, d)
            files = [os.path.join(full, f) for f in os.listdir(full)]
            if files:
                out[int(d.split("=", 1)[1])] = max(os.path.getmtime(f) for f in files)
        return out
    from docarray_spark.sources.registry import _hadoop_fs

    fs, jpath, jvm = _hadoop_fs(path, spark)
    if not fs.exists(jpath):
        return out
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not name.startswith("_bucket="):
            continue
        kids = fs.listStatus(st.getPath())
        if kids:
            out[int(name.split("=", 1)[1])] = max(
                k.getModificationTime() for k in kids
            ) / 1000.0
    return out


def index_status(
    spark: SparkSession, store_path: str, index_path: str
) -> DataFrame:
    """Per-bucket freshness audit of a segment index against its store —
    the operational "is this index safe to serve?" check for any of the
    four maintained families (pass the ``hnsw``/``pq``/``dedup`` index
    path, or ``<bm25>/postings``). Driver-side FS metadata only (bucket
    directory mtimes; at the recommended 64k-1M buckets this is one
    directory listing, no job):

    - ``fresh``    — segment exists and is at least as new as the bucket;
    - ``stale``    — the store bucket was written AFTER its segment
      (a merge ran without the matching refresh);
    - ``missing``  — store bucket has no segment at all;
    - ``orphaned`` — segment exists for a bucket the store no longer has
      (bucket emptied by deletes, refresh never ran).

    → ``(bucket, store_mtime, index_mtime, status)``, one row per bucket
    present on either side, ordered by bucket. ``stale | missing |
    orphaned`` buckets are exactly the ``buckets=`` list to pass to the
    family's refresh to repair the index."""
    store_m = _bucket_mtimes(store_path, spark)
    index_m = _bucket_mtimes(index_path, spark)
    rows = []
    for b in sorted(set(store_m) | set(index_m)):
        sm, im = store_m.get(b), index_m.get(b)
        if sm is None:
            status = "orphaned"
        elif im is None:
            status = "missing"
        elif im >= sm:
            status = "fresh"
        else:
            status = "stale"
        rows.append((b, sm, im, status))
    return spark.createDataFrame(
        rows, "bucket int, store_mtime double, index_mtime double, status string"
    )
