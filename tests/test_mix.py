"""Corpus-statistics / mixture operators (operators/mix.py): bigram LM
scoring, temperature mixing weights, deterministic global shuffle, exact
percentiles. Oracle-gated end lives in __spark_entry__ (corpus_stats);
these pin semantics on hand-built cases."""

import math

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import (
    bigram_lm_score,
    global_shuffle_rank,
    percentile_stats,
    temperature_mix_weights,
)


def test_bigram_lm_score_hand_case(spark):
    # corpus: "a b", "a b", "a c" → V=3 (a,b,c)
    # c(a)=3, c(a b)=2, c(a c)=1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "id long, text string",
    )
    out = {r.id: r for r in bigram_lm_score(df).collect()}
    v = 4  # vocab: a, b, c, solo
    assert out[1].n_bigrams == 1
    assert out[1].lm_score == pytest.approx(
        round(math.log((2 + 1) / (3 + v)), 6), abs=1e-9
    )
    assert out[3].lm_score == pytest.approx(
        round(math.log((1 + 1) / (3 + v)), 6), abs=1e-9
    )
    # single-token doc: present, zero bigrams, NULL score
    assert out[4].n_bigrams == 0 and out[4].lm_score is None
    # repetitive junk scores higher than unseen-transition text by design:
    # freq bigram (a b) beats rare (a c)
    assert out[1].lm_score > out[3].lm_score


def test_temperature_mix_weights_alpha(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)], "id long, s string"
    )
    w1 = {r.s: r.weight for r in temperature_mix_weights(df, "s", alpha=1.0).collect()}
    assert w1["big"] == pytest.approx(0.9, abs=1e-6)
    # temperature < 1 up-weights the low-resource source
    w7 = {r.s: r.weight for r in temperature_mix_weights(df, "s", alpha=0.7).collect()}
    assert w7["small"] > 0.1
    assert sum(w7.values()) == pytest.approx(1.0, abs=1e-5)


def test_global_shuffle_rank_is_permutation_and_deterministic(spark):
    df = spark.range(500).withColumnRenamed("id", "doc")
    r1 = {r.doc: r.rank for r in global_shuffle_rank(df, id_col="doc").collect()}
    r2 = {r.doc: r.rank for r in global_shuffle_rank(df, id_col="doc").collect()}
    assert r1 == r2
    assert sorted(r1.values()) == list(range(1, 501))
    # a different seed produces a different permutation
    r3 = {r.doc: r.rank for r in global_shuffle_rank(df, id_col="doc", seed="s2").collect()}
    assert r3 != r1


def test_global_shuffle_rank_no_global_window(spark):
    from docarray_spark.plans import explain_str

    df = global_shuffle_rank(spark.range(100).withColumnRenamed("id", "doc"), id_col="doc")
    # the only single-partition exchange allowed is the tiny per-partition
    # offsets table (bounded by parallelism), which hides behind a
    # broadcast join — the data path itself must range-partition
    assert "rangepartitioning" in explain_str(df).lower()


def test_percentile_stats_hand_case(spark):
    df = spark.createDataFrame(
        [("g", v) for v in [1, 2, 4, 7, 11, 13, 20]], "s string, x long"
    )
    out = {r.q: r.value for r in percentile_stats(df, "s", "x", [0.25, 0.5, 0.75, 0.9]).collect()}
    assert out[0.25] == 3.0 and out[0.5] == 7.0 and out[0.75] == 12.0
    assert out[0.9] == pytest.approx(15.8, abs=1e-9)


def test_bigram_lm_hashed_keys_match_token_keys(spark):
    """key_mode='hashed' (xxhash64 int join keys) produces the same
    scores as the token-string path on a collision-free vocab."""
    from docarray_spark.operators.mix import bigram_lm_score

    rows = [(i, " ".join(f"w{(i * 3 + j) % 40}" for j in range(12))) for i in range(60)]
    rows.append((100, "a"))  # <2 tokens → n_bigrams 0, NULL score
    df = spark.createDataFrame(rows, "id long, text string")
    tok = {r.id: (r.n_bigrams, r.lm_score) for r in bigram_lm_score(df).collect()}
    hsh = {r.id: (r.n_bigrams, r.lm_score)
           for r in bigram_lm_score(df, key_mode="hashed").collect()}
    assert tok == hsh
    assert tok[100] == (0, None)
    import pytest as _p
    with _p.raises(ValueError, match="key_mode"):
        bigram_lm_score(df, key_mode="xx")
