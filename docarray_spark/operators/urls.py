"""URL/domain operators for web-corpus curation (engine extension).

Web-scale pretraining pipelines (C4, RefinedWeb) filter and rebalance by
URL before any text-level pass: drop blocklisted domains, cap documents per
registered domain, and report the domain distribution. The reference stores
a ``uri`` per document (``document/data.py:53``) but has no URL analytics —
these operators give the ``uri`` column the same first-class treatment the
text column gets.

Everything here is a map-only Column expression (host extraction, domain
normalization) or a broadcast semi/anti-join (blocklists are small by
construction) — nothing shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def host_col(url: Column | str) -> Column:
    """Lower-cased host of a URL (empty string when no scheme://host);
    credentials and port stripped."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^.*@", "")   # user:pass@
    return F.regexp_replace(host, r":\d+$", "")  # :port


def domain_col(url: Column | str, strip_www: bool = True) -> Column:
    """Normalized domain: host with a leading ``www.`` removed."""
    h = host_col(url)
    return F.regexp_replace(h, r"^www\.", "") if strip_www else h


def registered_domain_col(url: Column | str, labels: int = 2) -> Column:
    """Last ``labels`` dot-labels of the domain — a pragmatic
    registered-domain approximation (a full public-suffix list is a
    broadcast lookup table away; two labels is what C4's per-domain
    accounting used in practice)."""
    d = domain_col(url)
    parts = F.split(d, r"\.")
    n = F.size(parts)
    return F.when(d == "", d).otherwise(
        F.array_join(F.slice(parts, F.greatest(n - labels + 1, F.lit(1)), labels), ".")
    )


def filter_url_blocklist(
    df: DataFrame,
    blocked: list[str] | DataFrame,
    url_col: str = "uri",
    match_subdomains: bool = True,
) -> DataFrame:
    """Drop documents whose URL's domain is blocklisted (C4's badwords/
    spam-domain step). ``blocked`` is a small domain list (inlined
    predicate) or a 1-column DataFrame (broadcast anti-join) —
    either way the corpus side never shuffles. ``match_subdomains``
    also drops ``a.b.example.com`` for blocked ``example.com``."""
    d = domain_col(url_col)
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        b = blocked.select(F.lower(F.col(bcol)).alias("_blocked")).distinct()
        if match_subdomains:
            cond = (F.col("_d") == F.col("_blocked")) | F.col("_d").endswith(
                F.concat(F.lit("."), F.col("_blocked"))
            )
        else:
            cond = F.col("_d") == F.col("_blocked")
        return (
            df.withColumn("_d", d)
            .join(F.broadcast(b), cond, "left_anti")
            .drop("_d")
        )
    blocked = [x.lower() for x in blocked]
    keep = ~d.isin(blocked)
    if match_subdomains:
        for dom in blocked:
            keep = keep & ~d.endswith("." + dom)
    # null uri → null domain → null predicate; an un-parseable URL cannot
    # be blocklisted, so nulls KEEP (matching the anti-join path)
    return df.filter(F.coalesce(keep, F.lit(True)))


def per_domain_counts(
    df: DataFrame, url_col: str = "uri", top: int | None = None
) -> DataFrame:
    """Domain distribution report → (domain, n_docs), count-descending —
    the input to per-domain caps (``cap_per_group``) and mixing weights
    (``temperature_mix_weights``). One map-side-combinable aggregation."""
    out = (
        df.select(domain_col(url_col).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("domain").asc())
    )
    return out.limit(top) if top else out
