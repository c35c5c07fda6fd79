"""Traversal-path DSL over the adjacency model — FIXTURES.md §3 shape:
roots with 3 chunks each, each chunk with 2 sub-chunks, matches per root."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import traverse, flatten


N_ROOTS = 20


@pytest.fixture(scope="module")
def nodes(spark):
    rows = []
    off = 0
    for i in range(N_ROOTS):
        rid = f"root{i:02d}"
        rows.append((rid, "", 0, off, f"root text {i}")); off += 1
        for j in range(3):
            cid = f"{rid}.c{j}"
            rows.append((cid, rid, 1, off, f"chunk {i}.{j}")); off += 1
            for l in range(2):
                rows.append((f"{cid}.c{l}", cid, 2, off, f"grand {i}.{j}.{l}")); off += 1
    return spark.createDataFrame(
        rows, "id string, parent_id string, granularity int, offset long, text string"
    )


@pytest.fixture(scope="module")
def matches(spark):
    rows = []
    for i in range(N_ROOTS):
        for r in range(5):
            rows.append((f"root{i:02d}", f"root{(i + r + 1) % N_ROOTS:02d}", r + 1, 0.1 * r))
    return spark.createDataFrame(rows, "query_id string, match_id string, rank int, score double")


def test_roots_and_chunks(spark, nodes):
    assert traverse(nodes, "r").count() == N_ROOTS
    assert traverse(nodes, "c").count() == N_ROOTS * 3
    assert traverse(nodes, "cc").count() == N_ROOTS * 6
    # all chunks are granularity 1
    assert traverse(nodes, "c").filter(F.col("granularity") != 1).count() == 0


def test_slices(spark, nodes):
    assert traverse(nodes, "r[0:10]").count() == 10
    assert traverse(nodes, "r[1:5]").count() == 4
    # first chunk per parent
    c0 = traverse(nodes, "c[:1]")
    assert c0.count() == N_ROOTS
    assert all(r.id.endswith(".c0") for r in c0.collect())
    # last chunk per parent (negative index)
    clast = traverse(nodes, "c[-1]")
    assert clast.count() == N_ROOTS
    assert all(r.id.endswith(".c2") for r in clast.collect())
    # composition with slice on first step
    assert traverse(nodes, "r[0:10]c").count() == 30
    assert traverse(nodes, "r[0:10]cc[:1]").count() == 30


def test_multi_path_union(spark, nodes):
    assert traverse(nodes, "r,c").count() == N_ROOTS * 4
    assert traverse(nodes, "c,cc").count() == N_ROOTS * 9


def test_matches_traversal(spark, nodes, matches):
    m = traverse(nodes, "m", matches=matches)
    assert m.count() == N_ROOTS * 5
    m2 = traverse(nodes, "m[:2]", matches=matches)
    assert m2.count() == N_ROOTS * 2
    # matched docs are root nodes
    assert m.filter(F.col("granularity") != 0).count() == 0
    # cm: matches of chunks — none registered
    assert traverse(nodes, "cm", matches=matches).count() == 0


def test_flatten(spark, nodes):
    assert flatten(nodes).count() == N_ROOTS * 10


def test_bad_path(spark, nodes):
    with pytest.raises(ValueError):
        traverse(nodes, "x")
    with pytest.raises(ValueError):
        traverse(nodes, "m")  # no matches table


def test_attribute_selector_document_and_iterable(spark, nodes):
    """.[a] / .[a,b] multimodal attribute steps (reference traverse.py:16-52
    grammar + multimodal.py:117-136 get_multi_modal_attribute): DOCUMENT
    attr -> the position-th chunk; ITERABLE attr -> that chunk's chunks."""
    from docarray_spark.operators import traverse

    mm = {
        "banner": {"position": 0, "iterable": False},
        "paragraphs": {"position": 1, "iterable": True},
    }
    banner = traverse(nodes, ".[banner]", mm_schema=mm)
    assert {r.id for r in banner.collect()} == {
        f"root{i:02d}.c0" for i in range(N_ROOTS)
    }
    both = traverse(nodes, ".[banner, paragraphs]", mm_schema=mm)
    want = {f"root{i:02d}.c0" for i in range(N_ROOTS)} | {
        f"root{i:02d}.c1.c{l}" for i in range(N_ROOTS) for l in range(2)
    }
    assert {r.id for r in both.collect()} == want


def test_attribute_selector_slice_and_multipath_split(spark, nodes):
    from docarray_spark.operators import traverse

    mm = {"paragraphs": {"position": 1, "iterable": True}}
    first = traverse(nodes, ".[paragraphs][:1]", mm_schema=mm)
    assert {r.id for r in first.collect()} == {
        f"root{i:02d}.c1.c0" for i in range(N_ROOTS)
    }
    # comma inside the selector must not split the multi-path
    multi = traverse(nodes, ".[paragraphs],r", mm_schema=mm)
    assert multi.count() == N_ROOTS * 2 + N_ROOTS


def test_attribute_selector_requires_schema(spark, nodes):
    import pytest as _pytest

    from docarray_spark.operators import traverse

    with _pytest.raises(ValueError):
        traverse(nodes, ".[banner]").collect()
