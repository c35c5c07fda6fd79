"""Training-data decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set (GPT-3 appendix C / Gopher
"test-set overlap" style filtering).

Scale design (100 TB corpus, benchmark sets of at most a few hundred
thousand docs):

* The eval set's distinct n-gram fingerprints are tiny (≤ a few hundred MB
  of 32-char md5 keys) → **broadcast** to every executor. The corpus side
  is then a map-side semi-join: no shuffle of corpus text, no shuffle of
  corpus n-grams. The only exchange in the whole plan is the final
  per-doc-id partial-count aggregation, whose input is already collapsed
  by map-side combine to ≈ one row per contaminated doc per partition.
* N-grams are md5-hashed before joining so the broadcast table and the
  per-row probe keys are fixed-width, not raw 13-gram strings.
* All expressions are Catalyst array algebra (split / transform / slice) —
  no Python in the hot path, and every step has an exact DuckDB equivalent
  so the verdict is oracle-checkable bit-for-bit.

The reference engine has no decontamination operator; this is part of the
"beyond the reference" LLM-pipeline set (SURVEY.md §2 extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docarray_spark.operators.dedup import with_word_shingles


def _exploded_gram_hashes(df: DataFrame, text: str, n: int, *keep) -> DataFrame:
    """``(*keep, _gh)`` — one row per distinct word n-gram of the text
    (whole text as one gram when shorter than n words — a short eval doc
    still decontaminates). Shingles come from the staged single-pass form
    (``with_word_shingles``, 3× the zip_with chain at n=8) and the md5
    runs AFTER the explode — whole-stage codegen, one hash per output
    row, never inside an interpreted HOF lambda. ``explode_outer`` +
    post-generate null filter, NOT plain explode: the optimizer's
    InferFiltersFromGenerate would add a size(...)>0 filter below a plain
    explode and predicate pushdown inlines the whole staged shingle
    expression into it — the O(W²) re-split-per-element rebuild the
    staging avoids (r9: 1.93 s → 0.71 s for the sf0.1 corpus grams)."""
    return (
        with_word_shingles(df, text, n, out_col="_ga")
        .select(*keep, F.explode_outer("_ga").alias("_g"))
        .filter(F.col("_g").isNotNull())
        .select(*keep, F.md5("_g").alias("_gh"))
    )


def decontaminate_report(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    ngram_n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination report: ``(id_col, eval_ngram_hits,
    contaminated)`` for every corpus document with ≥1 eval n-gram hit.

    ``eval_ngram_hits`` counts DISTINCT eval n-grams found in the doc, so a
    doc repeating one leaked gram many times scores 1, while a verbatim
    eval-doc inclusion scores ≈ its gram count — callers can threshold on
    severity, not raw repetition.
    """
    etc = eval_text_col or text_col
    eval_grams = _exploded_gram_hashes(eval_set, etc, ngram_n).distinct()
    # word_shingles_col is per-doc distinct already — no corpus-wide
    # .distinct() (that would be a full shuffle of every gram; the per-doc
    # distinctness is all the count below needs).
    corpus_grams = _exploded_gram_hashes(
        corpus, text_col, ngram_n, F.col(id_col)
    )
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "_gh", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("eval_ngram_hits"))
    )
    return hits.withColumn(
        "contaminated", (F.col("eval_ngram_hits") >= F.lit(min_hits))
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    ngram_n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated documents from the corpus (anti-join against the
    report's flagged ids). The flagged-id set is usually small enough to
    broadcast; Spark's AQE converts the anti-join automatically when it is."""
    flagged = (
        decontaminate_report(
            corpus,
            eval_set,
            id_col=id_col,
            text_col=text_col,
            eval_text_col=eval_text_col,
            ngram_n=ngram_n,
            min_hits=min_hits,
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")
