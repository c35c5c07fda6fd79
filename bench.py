"""Benchmark harness: runs every queries() entry from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with a noop-format write so results are computed fully
but never collected to the driver.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from docarray_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="docarray_spark_bench", driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))

    # JVM / codegen warm-up on a tiny scan, plus one tiny mapInPandas so the
    # Python UDF workers exist before any timed query needs them
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    # Baseline anchors run FIRST, on a fresh heap: after 2x50 entry
    # executions the JVM's heap history (cached-block churn, GC debt)
    # added up to 10x jitter to the 1M-row anchor timings (r3 measurement)
    anchors = _baseline_anchors(spark)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    # cold = first execution (includes janino codegen compile + any
    # Python-worker spin-up for that query's UDFs — per-process one-time
    # costs that amortize away on a real cluster, NOTES #6); warm = second
    # execution of the same plan. Warm-vs-warm is the number to compare
    # across rounds; cold stays the headline for continuity with r01.
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # warm = best of 2 re-executions ON A CLEAN HEAP: a single warm
        # run carries multi-x jitter from GC pauses (r3: ann_lsh warm
        # 5.9 s vs 1.4 s cold), and entries that persist big shared
        # subtrees (traverse/reduce _doc_nodes) measured warm 2.5x SLOWER
        # than cold when the cold run's blocks+shuffle state pushed the
        # heap to the eviction edge (r4 driver run). Clearing first means
        # warm-run-1 rebuilds the entry's caches (so the min is still a
        # full-query measure) and warm-run-2 reads them back clean.
        # Clear ONCE before the first warm rep (drop the cold run's heap
        # debt), then GC-only before the second: rep 1 rebuilds the
        # entry's caches on a clean heap, rep 2 reads them back with its
        # pauses flushed — min(rep1, rep2) is the cached steady state,
        # comparable round-over-round, without cold's leftover blocks
        # pushing eviction into the measurement (r4 driver run: traverse
        # warm 2.5x slower than cold from exactly that).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        best = float("inf")
        for rep in range(2):
            if rep:
                spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        if best > timings[name]:
            # warm slower than cold is always jitter (same plan, caches
            # hot) — one extra rep before accepting an inversion
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        warm[name] = round(best, 4)
        # operators that persist intermediates (minhash shingles, CC edges)
        # would otherwise accumulate cached blocks across the 2x50 runs,
        # building GC pressure that skews later entries' timings; streaming
        # entries additionally register uuid-named memory-sink tables that
        # pin full result sets. Drop both and nudge the JVM between
        # entries — without this, late entries measured 2-4x slower from
        # accumulated heap debt, not their plans.
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.name.startswith("t_"):
                spark.catalog.dropTempView(t.name)
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 4)

    # Full cold+warm per-query detail goes to a repo file (the driver's
    # stdout capture keeps only the LAST 2000 BYTES — r02's line overflowed
    # it and recorded parsed:null). The printed line stays compact: cold
    # per-query at 2dp + totals + anchors, measured against the cap below.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {
                "sf": sf,
                "queries_cold": timings,
                "queries_warm": warm,
                "total_cold": total,
                "total_warm": round(sum(warm.values()), 4),
                "baseline_anchors": anchors,
            },
            f,
            indent=1,
        )

    payload = {
        "metric": "sum_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "value_warm": round(sum(warm.values()), 2),
        "sf": sf,
        "baseline_anchors": anchors,
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:  # stay under the driver's 2000-byte tail capture
        payload.pop("baseline_anchors", None)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:
        payload["queries"] = {}
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


def _baseline_anchors(spark) -> dict:
    """BASELINE.md's published workload, reproduced at full size: 1M docs,
    128-d embeddings (reference memory store: create 0.6 s, exact kNN k=10
    ~1.43 s/query, 1-tag filter ~5 s). Corpus is generated deterministically
    JVM-side (sin-hash), persisted, then timed."""
    import time

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from docarray_spark.operators.match import match
    from docarray_spark.queryset import find

    n, dim, n_q = 1_000_000, 128, 10

    # untimed small-corpus pass: the very first persist+count in a fresh
    # JVM pays codegen/JIT/allocator warmup that measured 16.8 s vs the
    # ~3 s steady create — warm those paths before timing the real build
    warmup = (
        spark.range(50_000)
        .select(F.expr(f"transform(sequence(0, {dim - 1}), j -> cast(sin(id + j) as float))").alias("e"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    warmup.count()
    warmup.unpersist()

    # best of 2 builds: the create anchor measured 6.8 s in the r3 driver
    # run vs 2.4-2.9 s in clean runs — one disk-contended or GC-hit build
    # misreports the steady creation rate the reference benchmark times
    def _build():
        return (
            spark.range(n)
            .repartition(spark.sparkContext.defaultParallelism)
            .select(
                F.col("id"),
                (F.col("id") % 1000).alias("tag_i"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), j -> cast(sin(id * {dim} + j) as float))"
                ).alias("embedding"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    t0 = time.perf_counter()
    corpus = _build()
    corpus.count()
    create_s = round(time.perf_counter() - t0, 3)
    corpus.unpersist()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    corpus = _build()
    corpus.count()
    create_s = min(create_s, round(time.perf_counter() - t0, 3))

    # steady-state timing: best of 4 runs, matching the reference
    # benchmark's repeated-single-query methodology. Convergence is slow —
    # the Arrow path (python workers + cached-corpus serialization + JIT)
    # measured 44 → 27 → 5.8 → 1.2 s across reps in a fresh JVM — so two
    # runs under-report steady state by 5x.
    def _steady(build):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    filter_s = _steady(lambda: find(corpus, {"tag_i": {"$eq": 77}}))

    queries = corpus.filter(F.col("id") < n_q).select("id", "embedding")
    knn_s = _steady(
        lambda: match(corpus, queries, k=10, metric="cosine", corpus_id_col="id", eps=0.0)
    )
    corpus.unpersist()

    return {
        "workload": "1M docs x 128-d (BASELINE.md memory store)",
        "create_1m_sec": create_s,
        "filter_1m_sec": filter_s,
        "filter_baseline_sec": 5.0,
        "knn_1m_k10_q10_sec": knn_s,
        "knn_per_query_sec": round(knn_s / n_q, 4),
        "knn_baseline_per_query_sec": 1.43,
    }


if __name__ == "__main__":
    main()
