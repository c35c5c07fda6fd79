"""Decontamination: eval-set n-gram overlap flagging + corpus scrub.

Semantics checks on a hand-built corpus (verbatim inclusion, partial
overlap, clean doc, short-doc whole-text gram) plus the plan property that
makes it scale: the eval gram table joins as a BROADCAST (corpus side never
shuffles its text or grams)."""

from pyspark.sql import functions as F

from docarray_spark.operators import decontaminate, decontaminate_report
from docarray_spark.plans import broadcast_join_count, explain_str


def _corpus(spark):
    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        # verbatim eval doc inclusion -> many distinct gram hits
        (0, "intro words " + eval_text + " outro words"),
        # partial overlap: one 5-gram window shared
        (1, "quick brown fox jumps over a sleeping cat instead"),
        # clean
        (2, "completely unrelated text about spark physical plans"),
        # shorter than n -> whole text is one gram, no match
        (3, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _eval_set(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "id long, text string",
    )


def test_report_hits_and_threshold(spark):
    rep = decontaminate_report(
        _corpus(spark), _eval_set(spark), id_col="id", text_col="text",
        ngram_n=5, min_hits=2,
    )
    got = {r["id"]: (r["eval_ngram_hits"], r["contaminated"]) for r in rep.collect()}
    # doc 0 contains the whole eval doc: all 6 distinct 5-grams hit
    assert got[0] == (6, True)
    # doc 1 shares exactly one 5-gram ("quick brown fox jumps over")
    assert got[1] == (1, False)
    # docs 2 and 3 have no hits at all -> absent from the report
    assert 2 not in got and 3 not in got


def test_decontaminate_drops_flagged(spark):
    clean = decontaminate(
        _corpus(spark), _eval_set(spark), id_col="id", text_col="text",
        ngram_n=5, min_hits=2,
    )
    assert sorted(r["id"] for r in clean.collect()) == [1, 2, 3]


def test_eval_grams_broadcast_no_corpus_gram_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = decontaminate_report(
        docs, docs.filter(F.col("doc_id") % 10 == 7),
        id_col="doc_id", text_col="text", ngram_n=8, min_hits=3,
    )
    plan = explain_str(rep)
    assert broadcast_join_count(rep) >= 1, plan
    # the only hash exchange is the per-doc-id count agg — its input is the
    # post-join hit rows, never the corpus gram explosion itself
    assert "SortMergeJoin" not in plan, plan
