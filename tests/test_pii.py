"""PII scrub: detection counts, typed-token redaction, and the map-only
plan property (zero shuffles — the whole operator is one projection)."""

from docarray_spark.operators import pii_scrub
from docarray_spark.plans import shuffle_count


def test_counts_and_redaction(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.org or bob@site.io thanks"),
        (1, "call 555-867-5309 or 212.555.0199 from 10.0.0.1"),
        (2, "no pii here at all"),
        (3, "ip 192.168.1.254 and mail a_b%c@x.co"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r.asDict() for r in pii_scrub(df).collect()}

    assert got[0]["email_found"] == 2 and got[0]["has_pii"]
    assert got[0]["redacted_text"] == "mail me at <EMAIL> or <EMAIL> thanks"

    # 212.555.0199 matches the dotted phone form, not ipv4 (redacted first)
    assert got[1]["phone_found"] == 2 and got[1]["ipv4_found"] == 1
    assert got[1]["redacted_text"] == "call <PHONE> or <PHONE> from <IPV4>"

    assert not got[2]["has_pii"] and got[2]["redacted_text"] == "no pii here at all"

    assert got[3]["email_found"] == 1 and got[3]["ipv4_found"] == 1
    assert got[3]["redacted_text"] == "ip <IPV4> and mail <EMAIL>"


def test_map_only_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pii_scrub(docs, id_col="doc_id", text_col="text")
    assert shuffle_count(out) == 0
