"""xxhash64 production-hash paths (VERDICT r3 #5): the md5 default is the
oracle-portable gate; xxhash64 swaps in Spark's JVM intrinsic on the hot
hashing paths with the same uniformity/determinism contract."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.dedup import (
    minhash_dedup_pairs,
    simhash_dup_pairs,
    simhash_table,
)
from docarray_spark.operators.group import (
    hash_sample,
    stratified_hash_sample,
    weighted_hash_sample,
)


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow"
    )
    rows = [(1, base), (2, base.replace("lazy", "sleepy"))]
    rows += [
        (10 + i, f"document number {i} talks about topic {i * 7} entirely "
                 f"differently with unique words w{i}a w{i}b w{i}c w{i}d")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "id long, text string")


@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_minhash_finds_planted_pair_both_hashes(spark, neardup_corpus, method):
    pairs = minhash_dedup_pairs(
        neardup_corpus, num_bands=16, threshold=0.5, hash_method=method
    ).collect()
    assert (1, 2) in {(r.id_a, r.id_b) for r in pairs}
    # verification keeps only genuinely similar pairs under either hash
    assert all(r.jaccard >= 0.5 for r in pairs)


@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_simhash_near_dup_both_hashes(spark, method):
    # long docs, one changed word: a small hamming perturbation under any
    # token hash (short docs flip many bits per word — hash-dependent)
    words = [f"word{i}x" for i in range(120)]
    base = " ".join(words)
    var = " ".join(w if i != 60 else "changed" for i, w in enumerate(words))
    rows = [(1, base), (2, var)] + [
        (10 + i, " ".join(f"u{i}t{j}" for j in range(60))) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = simhash_dup_pairs(
        df, bits=48, max_hamming=5, num_bands=6, hash_method=method
    ).collect()
    assert (1, 2) in {(r.id_a, r.id_b) for r in pairs}


def test_simhash_xxhash_deterministic_and_distinct(spark, neardup_corpus):
    a = {r.id: r.simhash for r in simhash_table(
        neardup_corpus, bits=48, hash_method="xxhash64").collect()}
    b = {r.id: r.simhash for r in simhash_table(
        neardup_corpus, bits=48, hash_method="xxhash64").collect()}
    assert a == b
    # unrelated docs get distinct fingerprints (hash actually varies)
    assert len({v for k, v in a.items() if k >= 10}) > 30


def test_hash_sample_xxhash_rate_determinism_nesting(spark):
    df = spark.range(4000).select(F.col("id"))
    s25 = hash_sample(df, "id", 0.25, hash_method="xxhash64")
    n = s25.count()
    assert 0.18 * 4000 < n < 0.32 * 4000
    assert s25.count() == n  # deterministic
    ids25 = {r.id for r in s25.collect()}
    ids50 = {r.id for r in hash_sample(df, "id", 0.5, hash_method="xxhash64").collect()}
    assert ids25 <= ids50  # thresholds nest
    assert hash_sample(df, "id", 1.0, hash_method="xxhash64").count() == 4000


def test_stratified_xxhash_fractions(spark):
    df = spark.range(3000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("src")
    )
    out = stratified_hash_sample(
        df, "src", {"0": 0.5, "1": 0.1}, id_col="id", hash_method="xxhash64"
    )
    by = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert 0.38 * 1000 < by["0"] < 0.62 * 1000
    assert 0.04 * 1000 < by["1"] < 0.18 * 1000
    assert "2" not in by  # default fraction 0


def test_weighted_sample_xxhash(spark):
    df = spark.range(4000).select(
        F.col("id"), F.when(F.col("id") % 2 == 0, 0.9).otherwise(0.1).alias("w")
    )
    out = weighted_hash_sample(df, "w", id_col="id", hash_method="xxhash64")
    hi = out.filter(F.col("id") % 2 == 0).count()
    lo = out.filter(F.col("id") % 2 == 1).count()
    assert 0.8 * 2000 < hi < 1.0 * 2000
    assert 0.03 * 2000 < lo < 0.2 * 2000


def test_xxhash_plan_has_no_md5(spark):
    """The xxhash64 path really does swap the hash: no md5 in the plan."""
    df = spark.range(100).select(F.col("id"))
    plan = hash_sample(df, "id", 0.5, hash_method="xxhash64")._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan and "md5" not in plan


def test_unknown_hash_method_raises(spark, neardup_corpus):
    with pytest.raises(ValueError, match="hash_method"):
        minhash_dedup_pairs(neardup_corpus, hash_method="sha1").collect()


@pytest.mark.parametrize("method", ["md5", "xxhash64"])
@pytest.mark.parametrize("bits", [8, 16, 20, 48, 60])
def test_hash_bits_sql_honors_documented_range(spark, method, bits):
    """Both methods return values in exactly [0, 2^bits) (ADVICE r4: the
    md5 path used to emit the full hex-prefix range, e.g. 32-bit values
    for bits=16), and the md5 mask preserves the low bits the simhash
    caller consumes."""
    from docarray_spark.functions.hashing import hash_bits_sql

    frag = hash_bits_sql("cast(id as string)", bits, method)
    rows = spark.range(500).selectExpr(f"{frag} as h").collect()
    vals = [r.h for r in rows]
    assert all(0 <= v < (1 << bits) for v in vals)
    # genuinely spreads over the range (not clipped to a corner)
    assert len(set(vals)) > min(400, (1 << bits) * 0.7)
    if method == "md5":
        hx = max(8, (bits + 3) // 4)  # the prefix width the helper uses
        raw = (f"cast(conv(substring(md5(cast(id as string)), 1, {hx}), "
               "16, 10) as bigint)")
        low = spark.range(500).selectExpr(
            f"pmod({raw}, {1 << bits}) as h").collect()
        assert [r.h for r in low] == vals


def test_duplicate_spans_xxhash_path(spark):
    """Span dedup under the production hash: same spans as md5 (both are
    collision-free at test scale; the contract is uniform+deterministic)."""
    from docarray_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "intro words then the quick brown fox jumps over the lazy dog yes"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    md5_spans = sorted(tuple(r) for r in duplicate_spans(df, window=8).collect())
    xx_spans = sorted(
        tuple(r) for r in duplicate_spans(df, window=8, hash_method="xxhash64").collect()
    )
    assert md5_spans == xx_spans == [(2, 3, 12)]
