"""URL/domain curation operators (operators/urls.py)."""

import pytest
from pyspark.sql import functions as F

from docarray_spark.operators import (
    domain_col,
    filter_url_blocklist,
    host_col,
    per_domain_counts,
    registered_domain_col,
)


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "https://www.Example.COM/a/b?q=1"),
        (2, "http://sub.example.com:8080/x"),
        (3, "https://user:pw@spam.bad.net/y"),
        (4, "https://docs.python.org/3/"),
        (5, "not a url"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "id long, uri string")


def test_host_and_domain_normalization(spark, urls):
    got = {r.id: (r.h, r.d, r.rd) for r in urls.select(
        "id", host_col("uri").alias("h"), domain_col("uri").alias("d"),
        registered_domain_col("uri").alias("rd"),
    ).collect()}
    assert got[1] == ("www.example.com", "example.com", "example.com")
    assert got[2] == ("sub.example.com", "sub.example.com", "example.com")
    assert got[3] == ("spam.bad.net", "spam.bad.net", "bad.net")
    assert got[4] == ("docs.python.org", "docs.python.org", "python.org")
    assert got[5] == ("", "", "")
    assert got[6][0] is None or got[6][0] == ""  # null uri


def test_filter_url_blocklist_list_and_frame(spark, urls):
    kept = filter_url_blocklist(urls, ["example.com"]).select("id")
    assert sorted(r.id for r in kept.collect()) == [3, 4, 5, 6]
    # exact-only keeps the subdomain
    kept2 = filter_url_blocklist(urls, ["example.com"], match_subdomains=False)
    assert sorted(r.id for r in kept2.select("id").collect()) == [2, 3, 4, 5, 6]
    # DataFrame blocklist → broadcast anti-join, same result
    bdf = spark.createDataFrame([("EXAMPLE.com",)], "domain string")
    kept3 = filter_url_blocklist(urls, bdf)
    assert sorted(r.id for r in kept3.select("id").collect()) == [3, 4, 5, 6]
    from docarray_spark.plans import explain_str, shuffle_count

    # the only exchange is the blocklist side's dedup (blocklist-sized);
    # the corpus flows through a broadcast anti-join unshuffled
    assert shuffle_count(kept3) <= 1
    assert "Broadcast" in explain_str(kept3)


def test_per_domain_counts(spark, urls):
    got = [(r.domain, r.n_docs) for r in per_domain_counts(urls, top=2).collect()]
    # example.com x1, sub.example.com x1, ... all ties broken alphabetically;
    # with top=2 the count-desc/name-asc head is deterministic
    assert len(got) == 2
    assert got[0][1] >= got[1][1]
