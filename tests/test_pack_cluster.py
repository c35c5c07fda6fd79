"""Round-2 pipeline extensions: sequence packing, stratified sampling,
first-occurrence unit dedup, k-means, n-gram counts. Oracle-gated ends live
in __spark_entry__; these pin the operator semantics on hand-built cases."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import (
    dedup_units_first,
    first_fit_pack,
    kmeans,
    kmeans_summary,
    ngram_counts,
    pack_sequences,
    stratified_hash_sample,
)


# ------------------------------------------------------------------ packing

def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, n_tokens long")


def test_pack_sequences_concat_chunk(spark):
    # tokens: 100, 100, 100 → bins at capacity 250: starts 0,100,200 → bins 0,0,0
    # doc 3 starts at 300 → bin 1; doc 2 spans the 250 boundary
    df = _docs(spark, [(1, "a", 100), (2, "a", 100), (3, "a", 100), (4, "a", 50)])
    out = pack_sequences(df, 250, group_col="grp", order_col="id").orderBy("id")
    rows = out.collect()
    assert [r.bin_id for r in rows] == [0, 0, 0, 1]
    assert [r.bin_offset for r in rows] == [0, 100, 200, 50]
    assert [r.spans_boundary for r in rows] == [False, False, True, False]


def test_pack_sequences_groups_independent(spark):
    df = _docs(spark, [(1, "a", 200), (2, "b", 200), (3, "a", 200), (4, "b", 200)])
    out = pack_sequences(df, 250, group_col="grp", order_col="id")
    by_id = {r.id: r for r in out.collect()}
    # each group restarts at bin 0
    assert by_id[1].bin_id == 0 and by_id[2].bin_id == 0
    assert by_id[3].bin_id == 0 and by_id[4].bin_id == 0
    assert by_id[3].bin_offset == 200 and by_id[3].spans_boundary


def test_first_fit_pack_respects_capacity(spark):
    rows = [(i, "g", 30 + (i * 37) % 170) for i in range(60)]
    df = _docs(spark, rows).withColumn("_pack_group", F.lit(0))
    out = first_fit_pack(df, 256, group_col="_pack_group").collect()
    assert len(out) == 60  # no row loss
    fills = {}
    for r in out:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
    assert all(v <= 256 for v in fills.values())
    # FFD should not be wildly worse than the lower bound
    lower = -(-sum(t for _, _, t in rows) // 256)
    assert len(fills) <= lower + 3


def test_first_fit_pack_oversized_doc_own_bin(spark):
    df = _docs(spark, [(1, "g", 500), (2, "g", 10)]).withColumn(
        "_pack_group", F.lit(0)
    )
    out = {r.id: r for r in first_fit_pack(df, 256, group_col="_pack_group").collect()}
    assert out[1].bin_id != out[2].bin_id


# ----------------------------------------------------------------- sampling

def test_stratified_hash_sample_fractions_and_determinism(spark):
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = stratified_hash_sample(df, "s", {"true": 0.5, "false": 0.1}, id_col="id")
    counts = {r.s: r.c for r in out.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert abs(counts["true"] / 2000 - 0.5) < 0.07
    assert abs(counts["false"] / 2000 - 0.1) < 0.05
    again = stratified_hash_sample(df, "s", {"true": 0.5, "false": 0.1}, id_col="id")
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())


def test_stratified_default_fraction_zero_drops_unlisted(spark):
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("s")
    )
    out = stratified_hash_sample(df, "s", {"s0": 1.0}, id_col="id")
    assert set(r.s for r in out.collect()) == {"s0"}
    assert out.count() == 25  # fraction 1.0 keeps every row of the stratum


# --------------------------------------------------------------- unit dedup

def test_dedup_units_first_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, ["aa", "bb"]), (2, ["bb", "cc"]), (3, ["cc", "aa", "dd"])],
        "id long, units array<string>",
    )
    out = {r.id: r for r in dedup_units_first(df, "id", "units").collect()}
    assert out[1].clean_text == "aa bb" and out[1].units_removed == 0
    assert out[2].clean_text == "cc" and out[2].units_removed == 1
    assert out[3].clean_text == "dd" and out[3].units_removed == 2
    # within-doc repeat: only the first survives
    df2 = spark.createDataFrame([(1, ["x", "x", "y"])], "id long, units array<string>")
    r = dedup_units_first(df2, "id", "units").first()
    assert r.clean_text == "x y" and r.units_removed == 1


def test_dedup_units_first_keeps_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, ["zz"]), (2, ["zz"])], "id long, units array<string>"
    )
    out = {r.id: r for r in dedup_units_first(df, "id", "units").collect()}
    assert out[2].clean_text == "" and out[2].units_total == 1


# ------------------------------------------------------------------ k-means

@pytest.fixture(scope="module")
def blob_df(spark):
    # two well-separated blobs in 4-d
    rows = [(i, [10.0 + (i % 5) * 0.01, 10.0, 0.0, 0.0]) for i in range(40)]
    rows += [(100 + i, [-10.0, -10.0 - (i % 5) * 0.01, 0.0, 0.0]) for i in range(40)]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_kmeans_separates_blobs(blob_df):
    cent, assigned = kmeans(blob_df, k=2, n_iter=3, id_col="id")
    labels = {r.id: r.cell for r in assigned.collect()}
    blob_a = {labels[i] for i in range(40)}
    blob_b = {labels[100 + i] for i in range(40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    cents = {r.cell: r.centroid for r in cent.collect()}
    a_cell = blob_a.pop()
    assert cents[a_cell][0] == pytest.approx(10.02, abs=0.05)


def test_kmeans_deterministic(blob_df):
    s1 = kmeans_summary(blob_df, k=2, n_iter=2, id_col="id").collect()
    s2 = kmeans_summary(blob_df, k=2, n_iter=2, id_col="id").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]


# ------------------------------------------------------------------- ngrams

def test_ngram_counts_hand_case(spark):
    df = spark.createDataFrame(
        [("a b a b",), ("b a b c",), ("x",)], "text string"
    )
    out = {r.gram: r.n_occurrences for r in ngram_counts(df, "text", n=2).collect()}
    # 'a b' x3 ('a b a b' has 2, 'b a b c' has 1), 'b a' x2, 'b c' x1;
    # the single-word doc contributes no bigrams
    assert out == {"a b": 3, "b a": 2, "b c": 1}


def test_ngram_counts_top_ordering(spark):
    df = spark.createDataFrame([("a b a b c b",)], "text string")
    rows = ngram_counts(df, "text", n=2, top=2).collect()
    assert (rows[0].gram, rows[0].n_occurrences) == ("a b", 2)
    assert rows[1].n_occurrences == 1  # tie broken by gram asc
    assert rows[1].gram == "b a"


# ------------------------------------------------------------------- tfidf

def test_tfidf_vectors_hand_case(spark):
    import math

    from docarray_spark.operators import tfidf_vectors

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "d")], "id long, text string"
    )
    out = {(r.id, r.token): r for r in tfidf_vectors(df).collect()}
    # df: a→2 docs, b/c/d→1; N=3; idf = ln((N+1)/(df+1)) + 1
    idf_a = math.log(4 / 3) + 1
    idf_1 = math.log(4 / 2) + 1
    assert out[(1, "a")].weight == pytest.approx(2 * idf_a, abs=1e-6)
    assert out[(1, "b")].weight == pytest.approx(idf_1, abs=1e-6)
    assert out[(2, "c")].weight == pytest.approx(idf_1, abs=1e-6)
    # token ids: 'a' has highest total count (3) → id 2; b/c/d tie on
    # total=1, broken by token asc → b=3, c=4, d=5
    assert out[(1, "a")].token_id == 2
    assert out[(1, "b")].token_id == 3
    assert out[(2, "c")].token_id == 4
    assert out[(3, "d")].token_id == 5


# ------------------------------------------------------- cap / train split

def test_cap_per_group(spark):
    from docarray_spark.operators import cap_per_group

    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("g")
    )
    out = cap_per_group(df, "g", 10, id_col="id")
    counts = {r.g: r.c for r in out.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}
    # deterministic survivor set
    again = cap_per_group(df, "g", 10, id_col="id")
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())
    # groups smaller than k pass through whole
    small = cap_per_group(df.filter(F.col("id") < 6), "g", 10, id_col="id")
    assert small.count() == 6


def test_with_split_partitions_rows(spark):
    import pytest as _pt

    from docarray_spark.operators import with_split

    df = spark.range(5000)
    out = with_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="id")
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 5000  # exactly one label per row
    assert abs(counts["train"] / 5000 - 0.8) < 0.05
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    assert abs(counts["test"] / 5000 - 0.1) < 0.03
    with _pt.raises(ValueError, match="sum to 1"):
        with_split(df, {"a": 0.5, "b": 0.4})
    # label assignment independent of hash_sample's hash (salted)
    out2 = with_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="id", salt="other")
    diff = out.select("id", "split").subtract(out2.select("id", "split")).count()
    assert diff > 0


# -------------------------------------------------------- incremental dedup

def test_dedup_against_flags(spark):
    from docarray_spark.operators.dedup import dedup_against

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
         (11, "alpha beta gamma delta epsilon eta"),    # near dup of 1
         (12, "completely different words entirely here now")],
        "id long, text string",
    )
    out = {r.id: r for r in dedup_against(new, seen, min_band_hits=2).collect()}
    assert out[10].is_exact_dup and out[10].is_near_dup
    assert not out[11].is_exact_dup
    assert out[11].n_band_hits >= 2 and out[11].is_near_dup
    assert not out[12].is_exact_dup and out[12].n_band_hits == 0
    assert not out[12].is_near_dup
    assert len(out) == 3  # one row per new doc, no loss


def test_dedup_against_whitespace_normalized_exact(spark):
    from docarray_spark.operators.dedup import dedup_against

    seen = spark.createDataFrame([(1, "a  b   c")], "id long, text string")
    new = spark.createDataFrame([(2, " a b  c ")], "id long, text string")
    assert dedup_against(new, seen).first().is_exact_dup


def test_dedup_against_broadcast_gate_plans_agree(spark):
    """ADVICE r6: the new-batch broadcast is gated on batch size. The
    shuffle fallback (broadcast_new=False / auto over threshold) must
    return row-identical flags to the broadcast-probe plan — same
    operator, two physical strategies."""
    from docarray_spark.operators.dedup import dedup_against_history, history_table

    seen = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon token{i}") for i in range(40)],
        "id long, text string",
    )
    hist = history_table(seen).select("_fp", "_mh")
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon token7"),   # exact dup of 7
         (101, "alpha beta gamma delta epsilon omega"),    # near dup
         (102, "unrelated words entirely different here")],
        "id long, text string",
    )
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    bcast = dedup_against_history(new, hist, broadcast_new=True).collect()
    shuf = dedup_against_history(new, hist, broadcast_new=False).collect()
    auto = dedup_against_history(new, hist, broadcast_threshold=0).collect()
    assert key(bcast) == key(shuf) == key(auto)
    out = {r[0]: r for r in bcast}
    assert out[100].is_exact_dup and not out[102].is_near_dup


# ---------------------------------------------------------------- pooling

def test_pool_embeddings_modes(spark):
    from docarray_spark.operators import pool_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (1, [3.0, 20.0]), (2, [5.0, 5.0])],
        "g int, embedding array<float>",
    )
    mean = {r.g: r for r in pool_embeddings(df, "g", round_to=6).collect()}
    assert list(mean[1].pooled) == [2.0, 15.0] and mean[1].n_members == 2
    assert list(mean[2].pooled) == [5.0, 5.0]
    mx = {r.g: list(r.pooled) for r in pool_embeddings(df, "g", how="max").collect()}
    assert mx[1] == [3.0, 20.0]
    import pytest as _pt
    with _pt.raises(ValueError, match="how"):
        pool_embeddings(df, "g", how="median")


# --------------------------------------------------------------- dataloader

def test_dataloader_batches(spark):
    from docarray_spark.operators import dataloader

    df = spark.range(103).select(F.col("id"), (F.col("id") * 2).alias("v"))
    batches = list(dataloader(df.repartition(4), batch_size=25))
    assert [len(b) for b in batches[:-1]] == [25, 25, 25, 25]
    assert sum(len(b) for b in batches) == 103
    seen = sorted(x for b in batches for x in b["id"])
    assert seen == list(range(103))
    assert all((b["v"] == b["id"] * 2).all() for b in batches)


def test_weighted_hash_sample_proportions(spark):
    from docarray_spark.operators import weighted_hash_sample

    df = spark.range(6000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 0.9).otherwise(0.1).alias("w"),
    )
    out = weighted_hash_sample(df, "w", id_col="id")
    counts = {bool(r.k): r.c for r in out.groupBy((F.col("id") % 2 == 0).alias("k"))
              .agg(F.count("*").alias("c")).collect()}
    assert abs(counts[True] / 3000 - 0.9) < 0.05
    assert abs(counts[False] / 3000 - 0.1) < 0.04
    # weight 0 drops, weight 1 keeps everything
    zero = weighted_hash_sample(df.withColumn("w", F.lit(0.0)), "w", id_col="id")
    one = weighted_hash_sample(df.withColumn("w", F.lit(1.0)), "w", id_col="id")
    assert zero.count() == 0 and one.count() == 6000


def test_diversity_sample_spreads_across_blobs(spark, blob_df):
    from docarray_spark.operators import diversity_sample

    grouped = blob_df.withColumn("g", F.lit("all"))
    picks = diversity_sample(grouped, "g", k=2, id_col="id").collect()
    assert len(picks) == 2
    ids = sorted(r.id for r in picks)
    # one exemplar from each well-separated blob (ids <100 vs >=100)
    assert ids[0] < 100 <= ids[1]
    # deterministic across runs
    again = sorted(r.id for r in diversity_sample(grouped, "g", k=2, id_col="id").collect())
    assert ids == again


def test_diversity_sample_caps_at_group_size(spark):
    from docarray_spark.operators import diversity_sample

    df = spark.createDataFrame(
        [(1, "a", [0.0, 0.0]), (2, "a", [1.0, 0.0])],
        "id long, g string, embedding array<float>",
    )
    out = diversity_sample(df, "g", k=5, id_col="id").collect()
    assert sorted(r.id for r in out) == [1, 2]
    assert sorted(r.pick_order for r in out) == [0, 1]


def test_diversity_sample_no_repicks_on_duplicate_vectors(spark):
    from docarray_spark.operators import diversity_sample

    df = spark.createDataFrame(
        [(i, "g", [1.0, 1.0]) for i in range(4)],
        "id long, g string, embedding array<float>",
    )
    out = diversity_sample(df, "g", k=3, id_col="id").collect()
    assert len({r.id for r in out}) == 3  # distinct rows despite 0 distances


# ------------------------------------------- centroid assignment dispatch

def test_assign_cells_paths_agree(spark):
    """Literal-fold and broadcast-matrix argmin produce identical
    assignments (same strict-<-smallest-cell tie-break)."""
    from docarray_spark.operators.cluster import (
        _assign_cells_broadcast,
        _assign_cells_literal,
    )

    base = spark.range(100).select(
        F.col("id"),
        F.expr("transform(sequence(0, 7), j -> cast(sin(id * 3 + j) as double))").alias("v"),
    )
    cents = [
        (i, [float(__import__("math").sin(i * 11 + j)) for j in range(8)])
        for i in range(6)
    ]
    lit = {r.id: r.cell for r in _assign_cells_literal(base, cents).collect()}
    bro = {r.id: r.cell for r in _assign_cells_broadcast(base, cents).collect()}
    assert lit == bro


def test_assign_cells_broadcast_at_large_kd_zero_shuffle(spark):
    """VERDICT r2 #2: at k=512, d=128 (k*d = 65536 >> literal budget) the
    dispatch takes the broadcast pandas_udf path — the plan compiles (no
    janino megabyte expression tree), stays a ZERO-SHUFFLE map, and runs."""
    import math

    from docarray_spark.operators.cluster import assign_cells
    from docarray_spark.plans import explain_str, shuffle_count

    base = spark.range(50).select(
        F.col("id"),
        F.expr("transform(sequence(0, 127), j -> cast(sin(id + j) as double))").alias("v"),
    )
    cents = [
        (i, [math.sin(i * 7 + j) for j in range(128)]) for i in range(512)
    ]
    out = assign_cells(base, cents)
    assert shuffle_count(out) == 0
    assert "ArrowEvalPython" in explain_str(out)  # took the pandas_udf path
    rows = out.collect()
    assert len(rows) == 50 and all(0 <= r.cell < 512 for r in rows)


def test_assign_cells_ties_pick_smallest_cell(spark):
    """Duplicate centroids: both paths must keep the smallest cell id."""
    from docarray_spark.operators.cluster import (
        _assign_cells_broadcast,
        _assign_cells_literal,
    )

    base = spark.createDataFrame([(1, [1.0, 1.0])], "id long, v array<double>")
    cents = [(0, [5.0, 5.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])]
    assert _assign_cells_literal(base, cents).first().cell == 1
    assert _assign_cells_broadcast(base, cents).first().cell == 1


def test_assign_cells_exact_equals_literal(spark):
    """r12: the oracle-range dispatch swapped the interpreted literal fold
    for the dimension-order numpy path — assignments must be IDENTICAL
    (same accumulation order, strict-< first-min tie-break), including the
    fold's NULL-embedding → cell -1 edge."""
    from docarray_spark.operators.cluster import (
        _assign_cells_exact,
        _assign_cells_literal,
        assign_cells,
    )
    from docarray_spark.plans import explain_str

    base = spark.range(300).select(
        F.col("id"),
        F.expr(
            "CASE WHEN id = 7 THEN NULL ELSE "
            "transform(sequence(0, 15), j -> cast(sin(id * 17 + j) as double)) END"
        ).alias("v"),
    )
    cents = [
        (i, [float(__import__("math").sin(i * 13 + j)) for j in range(16)])
        for i in range(5)
    ]
    lit = {r.id: r.cell for r in _assign_cells_literal(base, cents).collect()}
    ex = {r.id: r.cell for r in _assign_cells_exact(base, cents).collect()}
    assert lit == ex
    assert lit[7] == -1  # NULL embedding keeps the fold's initial accumulator
    # duplicate-centroid tie keeps the smallest cell id on the exact path too
    one = spark.createDataFrame([(1, [1.0, 1.0])], "id long, v array<double>")
    tie = [(0, [5.0, 5.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])]
    assert _assign_cells_exact(one, tie).first().cell == 1
    # dispatch: oracle-range k*d routes to the numpy path (ArrowEvalPython)
    assert "ArrowEvalPython" in explain_str(assign_cells(base, cents))


def test_pack_sequences_requires_group_col(spark):
    """VERDICT r2 #3: a global pack is an Exchange SinglePartition — refuse
    it unless the caller opts in explicitly."""
    df = _docs(spark, [(1, "a", 100), (2, "a", 100)])
    with pytest.raises(ValueError, match="group_col"):
        pack_sequences(df, 250, order_col="id")
    # explicit escape hatch still works
    out = pack_sequences(df, 150, order_col="id", global_order=True)
    assert [r.bin_id for r in out.orderBy("id").collect()] == [0, 0]


def test_pack_entry_plan_has_no_single_partition_exchange(spark, sf_dir):
    """The oracle-gated pack entry keys on a shard column; its plan must
    never funnel through Exchange SinglePartition."""
    import __spark_entry__ as entry_mod
    from docarray_spark.plans import explain_str

    df = entry_mod.queries()["pack_sequences"](spark, sf_dir)
    assert "SinglePartition" not in explain_str(df)


def test_kmeans_source_scans_do_not_scale_with_iterations(spark):
    """VERDICT r3 #1: the Lloyd's driver loop must iterate over a PERSISTED
    base, not re-scan the source per iteration. An accumulator under the
    cache boundary counts source materializations: exactly 2 regardless of
    n_iter (one to build the cache, one for the returned lazy assignment
    after the cache is dropped — the no-leak trade)."""
    import pandas as pd

    n = 64

    def _scans_for(n_iter: int) -> int:
        acc = spark.sparkContext.accumulator(0)

        def _tap(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        src = (
            spark.range(n)
            .select(
                F.col("id"),
                F.expr(
                    "transform(sequence(0, 3), j -> cast(sin(id + j) as float))"
                ).alias("embedding"),
            )
            .mapInPandas(_tap, "id long, embedding array<float>")
        )
        _, assigned = kmeans(src, k=2, n_iter=n_iter, id_col="id")
        assigned.count()  # materialize the returned assignment
        return acc.value // n

    assert _scans_for(1) == _scans_for(3) == 2


def test_kmeans_leaves_no_cached_blocks(spark):
    """ADVICE r3: operators must not leak persisted blocks into a
    long-lived session — kmeans unpersists its iteration base.

    Snapshot-diff, not emptiness (r6 verdict #1): ``clearCache()`` drops
    only catalog-tracked entries, so ``localCheckpoint`` storage from
    UNRELATED earlier tests survives it and made the empty-registry
    assertion a suite-order flake. kmeans is only accountable for blocks
    IT adds."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)], "id long, embedding array<float>"
    )
    _, assigned = kmeans(df, k=2, n_iter=2, id_col="id")
    assigned.count()
    added = {info.id() for info in jsc.getRDDStorageInfo()} - before
    assert added == set()


def test_split_into_chunks_covers_tokens_exactly(spark):
    from docarray_spark.operators import split_into_chunks

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
         (2, "a b c"),                                 # shorter than chunk
         (3, ""), (4, None)],                          # no chunks
        "id long, text string",
    )
    # no overlap: 4-token windows → 4,4,2
    out = split_into_chunks(df, chunk_tokens=4).orderBy("parent_id", "chunk_idx").collect()
    by_parent = {}
    for r in out:
        by_parent.setdefault(r.parent_id, []).append(r)
    assert [r.n_tokens for r in by_parent[1]] == [4, 4, 2]
    assert [r.start_token for r in by_parent[1]] == [0, 4, 8]
    assert by_parent[1][2].chunk_text == "t8 t9"
    assert by_parent[1][0].chunk_id == "1#0"
    # reconstruction: concatenating no-overlap chunks = tokenized doc
    assert " ".join(r.chunk_text for r in by_parent[1]) == " ".join(
        f"t{i}" for i in range(10))
    assert [r.n_tokens for r in by_parent[2]] == [3]
    assert 3 not in by_parent and 4 not in by_parent


def test_split_into_chunks_overlap_and_min_tokens(spark):
    from docarray_spark.operators import split_into_chunks

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(9)))], "id long, text string"
    )
    # chunk 4, overlap 2 → starts 0,2,4,6; last covers t6..t8 (3 tokens)
    out = split_into_chunks(df, chunk_tokens=4, overlap=2).orderBy("chunk_idx").collect()
    assert [r.start_token for r in out] == [0, 2, 4, 6]
    assert [r.n_tokens for r in out] == [4, 4, 4, 3]
    # every token index appears in at least one chunk
    seen = set()
    for r in out:
        seen.update(range(r.start_token, r.start_token + r.n_tokens))
    assert seen == set(range(9))
    # min_tokens drops the short tail
    out2 = split_into_chunks(df, chunk_tokens=4, overlap=2, min_tokens=4).collect()
    assert [r.n_tokens for r in sorted(out2, key=lambda r: r.chunk_idx)] == [4, 4, 4]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        split_into_chunks(df, chunk_tokens=4, overlap=4)


def test_tfidf_persist_false_leaves_no_cache(spark):
    """Serving-loop escape hatch (r10): tfidf_vectors' output is
    corpus-sized so its internal tf persist can't be collect-and-released
    like the BM25 family's; persist=False trades one extra corpus
    aggregation for a cache-clean session, values identical."""
    from docarray_spark.operators import tfidf_vectors

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "d")], "id long, text string"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    a = {(r.id, r.token): r.weight for r in
         tfidf_vectors(df, persist=False).collect()}
    assert len(jsc.getRDDStorageInfo()) == before
    b = {(r.id, r.token): r.weight for r in tfidf_vectors(df).collect()}
    assert a == b


def test_assign_cells_exact_ragged_dim_degrades_to_minus_one(spark):
    # ADVICE r12 #3: an embedding whose length differs from the centroid
    # dimension must degrade to cell -1 (the literal fold's zip_with null
    # padding), not raise inside the Arrow task
    from pyspark.sql import functions as F

    from docarray_spark.operators.cluster import _assign_cells_exact

    base = spark.sql(
        "SELECT 0 AS id, array(1.0d, 2.0d) AS v "
        "UNION ALL SELECT 1, array(1.0d) "              # too short
        "UNION ALL SELECT 2, array(1.0d, 2.0d, 3.0d) "  # too long
        "UNION ALL SELECT 3, CAST(NULL AS ARRAY<DOUBLE>)"
    ).select("id", "v")
    cents = [(0, [0.0, 0.0]), (1, [5.0, 5.0])]
    got = {r.id: r.cell for r in _assign_cells_exact(base, cents).collect()}
    assert got == {0: 0, 1: -1, 2: -1, 3: -1}
