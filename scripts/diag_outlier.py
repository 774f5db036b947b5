"""Instrumented reproduction harness for the bench outlier window
(VERDICT r7 ask #2; docs/BENCH_NOTES.md rounds 6-7).

Symptom on record: twice in long single-JVM bench sessions, EVERY pass of
one scale-probe key (both times ``llm_dedup_ngram`` at the 10x dir) ran
~5-13x slow with bit-identical candidate-pair counters, and a fresh
session read true. The timing outlier therefore lives in JVM/session
state, not in the data or the plan. This script runs many cold passes of
that exact key in ONE session and records, per pass:

- wall time (the symptom),
- driver-JVM GC time/count deltas (GC-pressure hypothesis) via the
  GarbageCollectorMXBeans,
- completed-stage ``executorRunTime``/``executorCpuTime`` deltas from the
  Spark UI REST API (scheduling-vs-execution split: a slow wall with flat
  executorRunTime is driver/scheduler stall; slow runTime with flat
  cpuTime is GC/IO stall inside tasks; both up together is a real
  execution slowdown, e.g. codegen cache eviction),
- Derby lock-file census under the repo (metastore-lock hypothesis),
- the ngram candidate-pair count (must stay bit-identical).

Run it several times; a session whose max/median wall ratio breaches the
flag threshold is a reproduction with the split recorded. Output: one
JSON line per pass + a session summary line (append to
docs/BENCH_NOTES.md evidence).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive3_replication_spark.llm.dedup import clear_caches, llm_dedup_ngram
from hive3_replication_spark.session import get_spark
from scripts.gen_scale_probe import generate

PASSES = int(os.environ.get("DIAG_PASSES", "12"))
FLAG_RATIO = 3.0


def _gc_totals(spark) -> tuple[int, int]:
    """(total GC millis, total GC count) across all driver-JVM collectors
    — in local mode the driver JVM is the executor, so this is all GC."""
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    ms = sum(b.getCollectionTime() for b in beans)
    n = sum(b.getCollectionCount() for b in beans)
    return int(ms), int(n)


def _jit_state(spark) -> dict:
    """JIT/code-cache census: session-1 data showed slow passes burn ~25x
    executor CPU on identical work — the interpreter-fallback / deopt
    signature — so track HotSpot total compilation time and the fill level
    of each CodeHeap segment (a full 'profiled nmethods' heap disables
    tiered compilation until flushing recovers it)."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    out = {"jit_total_ms": int(mf.getCompilationMXBean().getTotalCompilationTime())}
    for pool in mf.getMemoryPoolMXBeans():
        name = pool.getName()
        if "CodeHeap" in name or "Metaspace" in name:
            usage = pool.getUsage()
            key = (
                name.replace("CodeHeap '", "").replace("'", "")
                .replace(" ", "_").lower()
            )
            out[f"{key}_used_mb"] = round(usage.getUsed() / 1e6, 1)
            out[f"{key}_max_mb"] = round(max(usage.getMax(), 0) / 1e6, 1)
    return out


def _stage_totals(spark, app_id: str) -> tuple[int, int, int]:
    """(sum executorRunTime ms, sum executorCpuTime ms, n stages) over all
    COMPLETE stages so far, from the UI REST API."""
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = json.load(resp)
    run = sum(s.get("executorRunTime", 0) for s in stages)
    cpu = sum(s.get("executorCpuTime", 0) for s in stages) // 1_000_000
    return run, cpu, len(stages)


def _host_state() -> dict:
    """Host-level split for the session-3 finding (8x executorCpuTime,
    flat GC/JIT/code-heap): thread CPU-time inflates either because the
    JVM executes MORE instructions (interpreter fallback — internal) or
    because each cycle-second buys fewer cycles (frequency throttling /
    co-tenant memory-bandwidth contention — external). /proc/loadavg far
    above our own ~33 threads during a slow pass indicts a co-tenant;
    a collapsed mean /proc/cpuinfo MHz indicts frequency throttling;
    both flat while CPU-time is elevated leaves the JVM-internal path.

    On this host /proc/cpuinfo reports a generic virtualized model
    ("Intel Xeon Processor @ 2.10GHz"), so the sharpest external signal
    is hypervisor STEAL time (/proc/stat cpu line, field 8): with
    tick-based guest accounting, cycles stolen by a hypervisor co-tenant
    are charged to whatever guest task was nominally running — inflating
    JVM thread CPU-time on identical work while GC, JIT and instruction
    count stay flat, which is precisely the session-1/3 signature."""
    out: dict = {}
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        if first and first[0] == "cpu" and len(first) > 8:
            out["steal_ticks"] = int(first[8])
            out["busy_ticks"] = sum(int(v) for v in first[1:4])
            out["idle_ticks"] = int(first[4])
    except OSError:  # pragma: no cover - non-Linux
        pass
    try:
        with open("/proc/loadavg") as fh:
            out["loadavg_1m"] = float(fh.read().split()[0])
    except OSError:  # pragma: no cover - non-Linux
        pass
    try:
        mhz = []
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.lower().startswith("cpu mhz"):
                    mhz.append(float(line.split(":")[1]))
        if mhz:
            out["cpu_mhz_mean"] = round(sum(mhz) / len(mhz))
            out["cpu_mhz_min"] = round(min(mhz))
    except OSError:  # pragma: no cover - non-Linux
        pass
    return out


def _derby_census(root: str) -> dict:
    locks = glob.glob(os.path.join(root, "**", "*.lck"), recursive=True)
    log = os.path.join(root, "derby.log")
    return {
        "lck_files": len(locks),
        "derby_log_bytes": os.path.getsize(log) if os.path.exists(log) else 0,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probe_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", os.path.join(repo_root, ".scaleprobe", "sf1")
    )
    spark = get_spark(
        app_name="h3r-diag-outlier",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(sf_dir, probe_dir, factor=10)
    with urllib.request.urlopen(
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications", timeout=10
    ) as resp:
        app_id = json.load(resp)[0]["id"]

    # the counter that was bit-identical across both recorded incidents
    clear_caches()
    n_pairs = llm_dedup_ngram(spark, probe_dir).count()

    walls: list[float] = []
    records: list[dict] = []
    for p in range(PASSES):
        clear_caches()
        gc_ms0, gc_n0 = _gc_totals(spark)
        run0, cpu0, st0 = _stage_totals(spark, app_id)
        host_before = _host_state()
        t0 = time.perf_counter()
        llm_dedup_ngram(spark, probe_dir).count()
        wall = time.perf_counter() - t0
        host_after = _host_state()
        gc_ms1, gc_n1 = _gc_totals(spark)
        run1, cpu1, st1 = _stage_totals(spark, app_id)
        rec = {
            "pass": p,
            "wall_sec": round(wall, 3),
            "gc_delta_ms": gc_ms1 - gc_ms0,
            "gc_delta_count": gc_n1 - gc_n0,
            "stage_run_ms": run1 - run0,
            "stage_cpu_ms": cpu1 - cpu0,
            "n_stages": st1 - st0,
            "derby": _derby_census(repo_root),
            "host_before": host_before,
            "host_after": host_after,
            "jit": _jit_state(spark),
        }
        walls.append(wall)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    med = sorted(walls)[len(walls) // 2]
    summary = {
        "metric": "diag_outlier_session",
        "key": "llm_dedup_ngram@x10",
        "passes": PASSES,
        "n_pairs": n_pairs,
        "median_wall_sec": round(med, 3),
        "max_wall_sec": round(max(walls), 3),
        "max_over_median": round(max(walls) / med, 2),
        "reproduced": max(walls) / med > FLAG_RATIO,
        "total_gc_ms": sum(r["gc_delta_ms"] for r in records),
        "total_stage_run_ms": sum(r["stage_run_ms"] for r in records),
        "total_stage_cpu_ms": sum(r["stage_cpu_ms"] for r in records),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
