"""C4-style boilerplate removal: drop text units (lines, sentences, or
token blocks) that recur across many documents — navigation chrome, cookie
banners, license headers — while preserving each document's remaining unit
order (Raffel et al. 2020 §2.2 "three-sentence spans seen more than once";
CCNet's per-shard line dedup is the same shape).

Scale design (100 TB):

* Unit doc-frequencies are ONE hash aggregation over md5(unit) keys
  (map-side partial combine; the shuffle carries (hash, count), never text).
* The frequent-unit set (df ≥ min_df) is tiny by construction — boilerplate
  is boilerplate BECAUSE few distinct strings repeat everywhere — so it
  joins back as a BROADCAST; tagging each document's units is map-side.
* Document reassembly is one groupBy(id) — collect_list of (pos, unit,
  flag) structs, array_sort, filter, concat. Total: 2 hash exchanges,
  independent of unit fan-out. A bloom-filter of the frequent set pushed
  into the scan is the next rung if the broadcast ever grows too large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_blocks_col(text: Column | str, block: int = 8) -> Column:
    """Non-overlapping ``block``-token spans of the text, in order — the
    unit splitter for corpora without line structure (the C4 paper uses
    three-SENTENCE spans; token blocks are the tokenizer-only analogue)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    n_blocks = F.ceil(F.size(toks) / F.lit(block)).cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n_blocks, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, (i - F.lit(1)) * block + 1, block)),
    )


def lines_col(text: Column | str) -> Column:
    """Non-empty trimmed lines of the text, in order."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(t, r"\n"), lambda l: F.trim(l)), lambda l: l != ""
    )


def remove_frequent_units(
    df: DataFrame,
    id_col: str = "id",
    units: Column | str = "units",
    min_df: int = 3,
    joiner: str = " ",
    broadcast_freq: bool = True,
) -> DataFrame:
    """→ ``(id_col, clean_text, units_total, units_removed)``: every unit
    appearing in ≥ ``min_df`` DISTINCT documents is dropped from every
    document; survivors re-join in original order (empty string when a doc
    was pure boilerplate)."""
    u = F.col(units) if isinstance(units, str) else units
    # outer generates + post-generate null filters: the caller's `units`
    # is usually an expensive block-building expression, and the inferred
    # size filter below a plain (pos)explode would push down and evaluate
    # it a second time per row (explode-inlining trap, NOTES r9)
    exploded = (
        df.select(F.col(id_col), F.posexplode_outer(u).alias("_pos", "_unit"))
        .filter(F.col("_unit").isNotNull())
        .withColumn("_uh", F.md5("_unit"))
    )

    # doc-frequency per unit hash; array_distinct BEFORE the explode makes a
    # unit repeated WITHIN one doc count once without any (id, hash)
    # pre-shuffle — the count shuffle ships only (hash, partial_count)
    freq = (
        df.select(F.explode_outer(F.array_distinct(u)).alias("_unit"))
        .filter(F.col("_unit").isNotNull())
        .groupBy(F.md5("_unit").alias("_uh"))
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_uh")
    )
    # the frequent set is SMALL on real corpora (only units repeated in
    # >= min_df distinct docs), but not bounded by construction — pass
    # broadcast_freq=False on crawls where near-duplicate boilerplate is
    # itself corpus-scale and the set would not fit an executor
    bad = freq.withColumn("_bad", F.lit(1))
    tagged = exploded.join(
        F.broadcast(bad) if broadcast_freq else bad, "_uh", "left"
    )
    parts = F.array_sort(
        F.collect_list(F.struct("_pos", "_unit", "_bad"))
    )
    kept = F.filter(parts, lambda s: s["_bad"].isNull())
    return tagged.groupBy(id_col).agg(
        F.concat_ws(joiner, F.transform(kept, lambda s: s["_unit"])).alias(
            "clean_text"
        ),
        F.count(F.lit(1)).cast("long").alias("units_total"),
        F.sum(F.coalesce(F.col("_bad"), F.lit(0))).cast("long").alias(
            "units_removed"
        ),
    )


def dedup_units_first(
    df: DataFrame,
    id_col: str = "id",
    units: Column | str = "units",
    joiner: str = " ",
) -> DataFrame:
    """Corpus-wide unit-level dedup keeping the FIRST occurrence
    (RefinedWeb-style exact substring dedup) — the complement of
    :func:`remove_frequent_units`, which drops *every* copy of a frequent
    unit; here exactly one copy survives, in the document with the smallest
    ``(id, position)`` that contains it. Later repeats (across documents or
    within one) are removed.

    Plan: posexplode → ``row_number`` over a hash exchange keyed on
    ``md5(unit)`` → one per-document aggregate rebuilds the text (2 shuffles
    total, no join-back — totals ride along in the aggregate). Both
    exchanges carry the unit strings (the rebuild needs them), so shuffle
    volume ≈ corpus text size — the floor for any exact dedup that
    reconstructs documents; hashing only the partition KEY just keeps the
    key fixed-width. Per-unit window state is that unit's occurrence list,
    bounded by the duplication factor, not corpus size.

    → ``(id_col, clean_text, units_total, units_removed)``, one row per
    input document — docs whose every unit is a repeat yield empty text,
    and docs with NULL/empty ``units`` survive with ``units_total`` 0 and
    empty text (ADVICE r2 #4: posexplode would drop them entirely; the
    outer explode keeps a null-unit row per such doc, salted across window
    partitions by doc id so empty docs never pile onto one task).
    """
    u = F.col(units) if isinstance(units, str) else units
    exploded = df.select(
        F.col(id_col), F.posexplode_outer(u).alias("_pos", "_unit")
    )
    # null-unit rows get a per-doc key in a namespace no md5 hex can
    # collide with, so they never interleave with a real unit's window
    pkey = F.when(F.col("_unit").isNotNull(), F.md5("_unit")).otherwise(
        F.concat(F.lit("_empty_"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(pkey).orderBy(F.col(id_col), F.col("_pos"))
    tagged = exploded.withColumn("_rn", F.row_number().over(w))
    real = F.col("_unit").isNotNull()
    parts = F.array_sort(
        F.collect_list(F.when((F.col("_rn") == 1) & real, F.struct("_pos", "_unit")))
    )
    return tagged.groupBy(id_col).agg(
        F.concat_ws(joiner, F.transform(parts, lambda s: s["_unit"])).alias(
            "clean_text"
        ),
        F.count("_unit").cast("long").alias("units_total"),
        F.sum(((F.col("_rn") > 1) & real).cast("long")).alias("units_removed"),
    )
