"""connected_components / dedup_clusters (operators/components.py) and
gopher_quality (operators/text.py)."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import (
    connected_components,
    dedup_clusters,
    gopher_quality,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r.node: r.component for r in rows}


def test_cc_single_edge(spark):
    assert _cc(spark, [(2, 7)]) == {2: 2, 7: 2}


def test_cc_chain_converges_beyond_diameter(spark):
    # a 40-node path: naive label propagation would need 40 rounds;
    # star contraction must finish within the 25-round guard
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_cc_two_components_and_duplicate_edges(spark):
    edges = [(1, 2), (2, 1), (2, 3), (10, 11), (11, 10)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_self_loops_ignored(spark):
    assert _cc(spark, [(5, 5), (5, 6)]) == {5: 5, 6: 5}


def test_dedup_clusters_labels_whole_corpus(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {r.id: (r.component, r.is_canonical) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        0: (0, True), 1: (1, True), 2: (2, True),
        3: (0, False), 4: (4, True), 5: (0, False),
    }
    # the dedup policy: exactly one survivor per cluster
    assert sum(1 for c, canon in rows.values() if canon) == 4


def test_gopher_quality_signals(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to a hill " * 5
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "word " * 80),             # top bigram 'word word' dominates
            (3, "# # # " + "the be to of and that have " * 10),  # symbols
            (4, ""),                        # empty
            (5, "- a\n- b\n- c\nplain"),    # bullet lines
        ],
        "id long, text string",
    )
    out = {r.id: r.asDict() for r in gopher_quality(df).collect()}
    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 70
    assert out[2]["top_bigram_frac"] == 1.0 and out[2]["keep"] is False
    assert out[3]["symbol_word_ratio"] > 0.04 and out[3]["stopword_hits"] >= 2
    assert out[4]["n_words"] == 0 and out[4]["keep"] is False
    assert out[5]["bullet_line_frac"] == 0.75


def test_gopher_dup_lines(spark):
    df = spark.createDataFrame(
        [(1, "same line\nsame line\nsame line\nother")], "id long, text string"
    )
    row = gopher_quality(df).collect()[0]
    assert row.dup_line_frac == 0.5


def test_union_find_path_equals_distributed(spark):
    """Both CC paths — driver union-find (within budget) and the
    distributed star contraction (budget 0) — produce the identical
    min-id labeling."""
    from docarray_spark.operators.components import connected_components

    # chain 1-2-3-4, triangle 10-11-12, pair (20,21), self-contained 30
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (10, 11), (11, 12), (12, 10), (20, 21),
         (30, 30)],
        "src long, dst long",
    )
    uf = {(r.node, r.component)
          for r in connected_components(edges).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(edges, driver_edge_budget=0).collect()}
    assert uf == dist
    comp = dict(uf)
    assert comp[4] == 1 and comp[12] == 10 and comp[21] == 20
    assert 30 not in comp  # self-loop filtered; isolated nodes absent
