"""Diagnose the progressive per-pass slowdown (r14): run N full passes
over every registered query and print, per pass, the total seconds plus
JVM code-cache / metaspace / class-count / JIT-time telemetry.

The r13/r14 bench artifacts show pass totals like [142, 171, 384] — a
uniform ~2x decay by pass 3 with a heavy tail.  Hypothesis: the janino
codegen cache (100 entries by default) cannot hold the 156-plan
surface, so every pass compiles & loads fresh generated classes; the
JVM code cache / metaspace fills and the JIT de-optimizes or stops.

    python tools/diag_jvm_decay.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from nr_rfc_dischargeobs_spark.plans.extensions import (  # noqa: E402
    release_plan_caches,
)
from nr_rfc_dischargeobs_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        "diag-jvm-decay",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def telemetry() -> dict:
        out = {}
        for pool in mf.getMemoryPoolMXBeans():
            n = pool.getName()
            if "CodeHeap" in n or "Metaspace" in n:
                u = pool.getUsage()
                out[n] = round(u.getUsed() / 2**20, 1)
        cl = mf.getClassLoadingMXBean()
        out["classes_loaded"] = cl.getLoadedClassCount()
        out["classes_total"] = cl.getTotalLoadedClassCount()
        comp = mf.getCompilationMXBean()
        out["jit_ms_total"] = comp.getTotalCompilationTime()
        gc_ms = gc_n = 0
        for gc in mf.getGarbageCollectorMXBeans():
            gc_ms += gc.getCollectionTime()
            gc_n += gc.getCollectionCount()
        out["gc_ms_total"] = gc_ms
        out["gc_count"] = gc_n
        heap = mf.getMemoryMXBean().getHeapMemoryUsage()
        out["heap_used_mb"] = round(heap.getUsed() / 2**20)
        return out

    queries = entrymod._raw_queries()
    names = list(queries)
    print(
        f"codegen.cache.maxEntries="
        f"{spark.conf.get('spark.sql.codegen.cache.maxEntries')}"
        f"  passes={passes}  sf={sf_dir}"
    )
    print("pass -1 (cold):", telemetry())
    for p in range(passes):
        t0 = time.time()
        jit0 = telemetry()["jit_ms_total"]
        for name in names:
            try:
                queries[name](spark, sf_dir).count()
            except Exception as ex:  # noqa: BLE001
                print(f"{name} FAILED: {ex}", file=sys.stderr)
            finally:
                release_plan_caches()
        tele = telemetry()
        tele["jit_ms_this_pass"] = tele["jit_ms_total"] - jit0
        print(f"pass {p}: total={time.time() - t0:7.2f}s  {tele}")


if __name__ == "__main__":
    main()
