"""Corpus statistics and mixture operators for training-data pipelines
(engine extensions; the reference has no corpus-level statistics beyond
``get_vocabulary``, ``array/mixins/text.py:8-29``).

Four operators a pretraining data pipeline runs corpus-wide:

- :func:`bigram_lm_score` — per-document average bigram log-likelihood
  under the corpus's OWN add-one-smoothed bigram model (the CCNet/KenLM
  perplexity-filter shape: score each doc against a reference LM, drop the
  tails). Count tables are vocabulary-sized aggregates; the scoring join is
  an equi-join on short token keys — the unavoidable LM-scoring shuffle is
  corpus-bigram-sized, never quadratic.
- :func:`temperature_mix_weights` — multilingual/source mixing weights
  ``w_s ∝ n_s^alpha`` (the GPT-3 / mT5 temperature-sampling recipe):
  alpha=1 is proportional sampling, alpha→0 uniform across sources.
  One map-side-combinable count + a broadcast 1-row normalizer.
- :func:`global_shuffle_rank` — deterministic corpus-wide training-order
  shuffle: rank docs by ``md5(seed|id)``. Uses the two-phase
  ``distributed_row_number`` (range partition + per-partition offsets), so
  there is NO single-partition window at any size.
- :func:`percentile_stats` — exact per-group percentiles of a numeric
  column (linear interpolation — Spark ``percentile`` and DuckDB
  ``quantile_cont`` agree bit-for-bit). Exact, not approx, because the
  oracle gate compares values; swap for ``percentile_approx`` at the
  10^12-row scale where a t-digest sketch is the right answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docarray_spark.operators.group import distributed_row_number
from docarray_spark.operators.text import tokens_col


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    round_to: int = 6,
    key_mode: str = "token",
) -> DataFrame:
    """Average bigram log-likelihood per document under the corpus's
    add-one-smoothed bigram LM:

    ``score(d) = avg over bigrams (w1,w2) of ln((c(w1,w2)+1)/(c(w1)+V))``

    where counts come from the whole corpus and ``V`` is the unigram
    vocabulary size. Low scores flag repetitive/junk text the same way a
    KenLM perplexity filter does, with no external model artifact.

    → ``(id_col, n_bigrams, lm_score)``; docs with < 2 tokens keep a row
    with ``n_bigrams`` 0 and NULL score.

    Plan shape: token/bigram counts are map-side-combinable hash
    aggregates over the vocab; scoring joins doc bigrams to the two count
    tables on short string keys (corpus-bigram-sized exchange — the LM
    scoring floor); per-doc rollup is one more combinable aggregate.

    ``key_mode='hashed'`` (production): count/join keys become
    ``xxhash64(token)`` 8-byte ints instead of token strings — the same
    exchange carries fixed-width keys, measured ~20% faster end-to-end at
    204k docs (NOTES r4). Counts are identical unless two corpus tokens
    collide in 64 bits (P ≈ n²/2⁶⁵ — ~1e-8 even at a billion-token
    vocab); oracle-gated entries stay on ``'token'`` where the key IS the
    gated value.
    """
    if key_mode not in ("token", "hashed"):
        raise ValueError(f"key_mode must be 'token' or 'hashed', got {key_mode!r}")
    from docarray_spark.functions.localexec import ensure_parallelism

    # spread a single-split source so the tokenize + bigram explode run on
    # every core (no-op at real scale; guide §2.6)
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_t")
    )
    toks = toks.withColumn("_t", F.filter("_t", lambda x: x != ""))
    # the token table feeds the unigram counts, the bigram explosion (which
    # itself feeds pair counts AND the scoring join) — persist so the
    # tokenize runs once (r3 amplification lesson; memory-and-disk)
    from pyspark import StorageLevel

    toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    # hashed mode: keys hash POST-explode at the column level (scalar
    # xxhash64 stays in whole-stage codegen; hashing inside a transform()
    # lambda would run interpreted per token)
    _k = (lambda c: F.xxhash64(c)) if key_mode == "hashed" else (lambda c: c)
    big = toks.select(
        "_id",
        F.explode_outer(  # outer: skip the inferred size filter, which
            # would evaluate the whole zip_with chain a second time per
            # row (explode-inlining trap, NOTES r9)
            F.when(
                F.size("_t") >= 2,
                F.zip_with(
                    F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    ).filter(F.col("bg").isNotNull()).select(
        "_id", _k(F.col("bg.w1")).alias("w1"), _k(F.col("bg.w2")).alias("w2")
    )

    uni = (
        toks.select(F.explode("_t").alias("_w"))
        .select(_k(F.col("_w")).alias("w1"))  # generator can't nest in exprs
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab_n = uni.agg(F.count(F.lit(1)).alias("v"))
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))

    scored = (
        big.join(pair, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "_id",
            F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))).alias("_lp"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("_lp"), round_to).alias("lm_score"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )


def temperature_mix_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.7,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-based mixing weights per group:
    ``w_s = n_s^alpha / sum_s n_s^alpha`` — the standard recipe for
    up-weighting low-resource sources/languages when assembling a
    pretraining mixture. → ``(group_col, n_docs, weight)``."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(
        F.sum(F.pow("n_docs", F.lit(alpha))).alias("_z")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_docs",
            F.round(F.pow("n_docs", F.lit(alpha)) / F.col("_z"), round_to).alias(
                "weight"
            ),
        )
    )


def global_shuffle_rank(
    df: DataFrame,
    id_col: str = "id",
    seed: str = "shuffle",
    out_col: str = "rank",
) -> DataFrame:
    """Deterministic global training-order shuffle: 1-based rank by
    ``md5(seed|id)`` (ties broken by id — md5 collisions aside, the key is
    unique). Engine-portable (no RNG state) and scale-safe: ranks come
    from the two-phase distributed row number, not a global window."""
    keyed = df.withColumn(
        "_sk", F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")))
    )
    ranked = distributed_row_number(keyed, [F.col("_sk"), F.col(id_col)], out_col=out_col)
    return ranked.drop("_sk")


def percentile_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float] = (0.25, 0.5, 0.75),
    round_to: int = 6,
) -> DataFrame:
    """Exact per-group percentiles with linear interpolation →
    ``(group_col, q, value)`` — one row per (group, quantile)."""
    qs = list(quantiles)
    arr = ", ".join(repr(float(q)) for q in qs)
    agg = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("_p")
    )
    qcol = F.array(*[F.lit(float(q)) for q in qs])
    return agg.select(
        group_col,
        F.explode(F.arrays_zip(qcol.alias("q"), F.col("_p").alias("value"))).alias("z"),
    ).select(
        group_col, F.col("z.q").alias("q"), F.round("z.value", round_to).alias("value")
    )
