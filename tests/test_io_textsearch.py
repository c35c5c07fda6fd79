"""IO round-trips (reference tests/unit/array/mixins/test_io.py), BM25 text
search, nested set-along-path, and embed plumbing."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from docarray_spark.operators.embed import embed, fake_text_encoder
from docarray_spark.operators.text import text_search
from docarray_spark.operators.traverse import set_along_path
from docarray_spark.sources.writers import (
    flatten_tags,
    from_lines,
    from_ndarray,
    save_csv,
    save_json,
    save_parquet,
)


def test_bm25_hand_computed(spark):
    docs = [
        (1, "spark engine fast"),
        (2, "spark spark spark"),
        (3, "slow snail"),
        (4, "the fast engine of spark"),
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    got = {r["id"]: r for r in text_search(df, "spark fast", id_col="id", k=4).collect()}
    # hand-computed BM25 (k1=1.2, b=0.75, N=4, dl=3,3,2,5 -> avgdl=3.25)
    def bm25(tf, dl, dfreq, n=4, k1=1.2, b=0.75, avgdl=3.25):
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = bm25(1, 3, 3) + bm25(1, 3, 2)
    assert got[1]["score"] == pytest.approx(exp1, rel=1e-9)
    exp2 = bm25(3, 3, 3)
    assert got[2]["score"] == pytest.approx(exp2, rel=1e-9)
    assert 3 not in got  # no query term
    ranks = sorted((r["rank"], r["id"]) for r in got.values())
    scores = sorted(((r["score"], -r["id"]) for r in got.values()), reverse=True)
    assert [i for _, i in ranks] == [-i for _, i in scores]


def test_bm25_k_limit(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = text_search(docs, "key scan table", id_col="doc_id", k=5).collect()
    assert len(got) == 5
    assert [r["rank"] for r in sorted(got, key=lambda r: -r["score"])] == [1, 2, 3, 4, 5]


def test_flatten_tags_and_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"a": "1", "b": "x"}, [1.0, 2.0]), (2, {"a": "2"}, None)],
        "id int, tags map<string,string>, vec array<double>",
    )
    flat = flatten_tags(df, "tags")
    assert set(flat.columns) == {"id", "vec", "tag__a", "tag__b"}
    assert flat.filter("id = 2").collect()[0]["tag__b"] is None

    p = str(tmp_path / "csv_out")
    save_csv(df, p, flatten_tags_col="tags")
    back = spark.read.csv(p, header=True, inferSchema=True)
    assert back.count() == 2
    assert set(back.columns) == {"id", "vec", "tag__a", "tag__b"}
    assert back.filter("id = 1").collect()[0]["vec"] == "[1.0,2.0]"


def test_json_and_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", [0.5, 1.5]), (2, "b", [2.5, 3.5])],
        "id long, text string, embedding array<double>",
    )
    jp = str(tmp_path / "json_out")
    save_json(df, jp)
    back = spark.read.json(jp)
    assert back.count() == 2

    pp = str(tmp_path / "parquet_out")
    save_parquet(df, pp, partition_by=["text"])
    back = spark.read.parquet(pp)
    assert {r["id"] for r in back.collect()} == {1, 2}
    rows = {r["id"]: r["embedding"] for r in back.collect()}
    assert rows[1] == [0.5, 1.5]


def test_from_ndarray_and_lines(spark):
    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    df = from_ndarray(spark, mat, id_offset=10)
    rows = {r["id"]: r["embedding"] for r in df.collect()}
    assert set(rows) == {10, 11, 12, 13}
    np.testing.assert_allclose(rows[11], [3.0, 4.0, 5.0])

    lines = from_lines(spark, ["alpha", "beta"])
    assert [r["text"] for r in lines.orderBy("id").collect()] == ["alpha", "beta"]


def test_set_along_path(spark):
    nodes = spark.createDataFrame(
        [
            ("r1", "", 0, 0, "root one"),
            ("r1.0", "r1", 1, 0, "chunk a"),
            ("r1.1", "r1", 1, 1, "chunk b"),
            ("r1.0.0", "r1.0", 2, 0, "grand"),
        ],
        "id string, parent_id string, granularity int, offset long, text string",
    )
    out = set_along_path(nodes, "c[:1]", text=F.lit("SET"))
    rows = {r["id"]: r["text"] for r in out.collect()}
    assert rows["r1.0"] == "SET"
    assert rows["r1.1"] == "chunk b"
    assert rows["r1"] == "root one"
    assert rows["r1.0.0"] == "grand"
    assert out.count() == nodes.count()


def test_embed_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = embed(docs, input_col="text", dim=16, batch_size=7)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["embedding"]) == 16 for r in rows)
    # deterministic + unit-norm
    enc = fake_text_encoder(16)
    one = rows[0]
    np.testing.assert_allclose(
        np.array(one["embedding"]), enc([one["text"]])[0], rtol=1e-6
    )
    assert np.linalg.norm(one["embedding"]) == pytest.approx(1.0, rel=1e-3)


def test_fetch_uris_file_data_and_http(spark, tmp_path):
    """Remote-URI content fetch (reference blob.py:12-41): file://, data:,
    and http:// (against a local server) with error rows for failures and
    scheme-allowlist enforcement."""
    import base64
    import http.server
    import threading

    from docarray_spark.sources import fetch_uris

    f = tmp_path / "doc.txt"
    f.write_text("hello file")
    data_uri = "data:text/plain;base64," + base64.b64encode(b"hello data").decode()

    srv = http.server.HTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: http.server.SimpleHTTPRequestHandler(*a, directory=str(tmp_path), **kw),
    )
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame(
            [
                ("a", f"file://{f}"),
                ("b", data_uri),
                ("c", f"http://127.0.0.1:{port}/doc.txt"),
                ("d", f"http://127.0.0.1:{port}/missing.txt"),
                ("e", "ftp://nope/x"),
            ],
            "id string, uri string",
        )
        out = fetch_uris(
            df, as_text=True, out_col="text",
            allow_schemes=("file", "data", "http"),
        )
        got = {r.id: (r.text, r.text_error) for r in out.collect()}
        assert got["a"] == ("hello file", None)
        assert got["b"] == ("hello data", None)
        assert got["c"] == ("hello file", None)
        assert got["d"][0] is None and "404" in got["d"][1]
        assert got["e"][0] is None and "allow_schemes" in got["e"][1]
        # default allowlist blocks http entirely
        blocked = fetch_uris(df.filter("id = 'c'"), as_text=True, out_col="text")
        assert "allow_schemes" in blocked.collect()[0].text_error
    finally:
        srv.shutdown()


def test_save_orc_roundtrip_with_partition_pruning(spark, sf_dir, tmp_path):
    """ORC store path: same pruning machinery as parquet (orc-core ships
    in Spark's jars)."""
    from docarray_spark.sources import save_parquet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = str(tmp_path / "orc_store")
    save_parquet(docs, d, partition_by=["lang"], fmt="orc")
    back = spark.read.orc(d)
    assert back.count() == docs.count()
    en = back.filter("lang = 'en'")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan


def test_bm25_index_query_matches_text_search(spark, sf_dir):
    """The amortized index path scores identically to the per-call path
    (same idf/tf/normalization; same tie-break)."""
    from docarray_spark.operators import bm25_index, bm25_query, text_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    q = "key scan table"
    direct = [(r.doc_id, round(r.score, 9), r.rank) for r in text_search(
        docs, q, id_col="doc_id", k=15).collect()]
    postings, stats = bm25_index(docs, id_col="doc_id")
    via_index = [(r.doc_id, round(r.score, 9), r.rank) for r in bm25_query(
        postings, stats, q, id_col="doc_id", k=15).collect()]
    assert direct == via_index


def test_bm25_index_persists_and_prunes(spark, sf_dir, tmp_path):
    """Written partitioned by token prefix, a query scans only its terms'
    partitions (PartitionFilters prune the rest)."""
    from pyspark.sql import functions as F

    from docarray_spark.operators import bm25_index, bm25_query

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    postings, stats = bm25_index(docs, id_col="doc_id")
    p = str(tmp_path / "idx")
    (postings.withColumn("pfx", F.substring("token", 1, 1))
        .write.partitionBy("pfx").mode("overwrite").parquet(p))
    stats_rows = stats.collect()
    stats_df = spark.createDataFrame(stats_rows, stats.schema)
    idx = spark.read.parquet(p)
    hits = bm25_query(idx, stats_df, "key scan", id_col="doc_id", k=5)
    assert hits.count() == 5
    # pruned result set identical to the unpruned postings path
    plain = bm25_query(postings, stats_df, "key scan", id_col="doc_id", k=5)
    assert [tuple(r) for r in hits.collect()] == [tuple(r) for r in plain.collect()]
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: []" not in plan  # pruning actually engaged
    assert "pfx" in plan.split("PartitionFilters")[1][:120]
