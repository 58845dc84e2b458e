"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT JSON line: {"metric", "value", "unit", "sf", "n_queries", "failed"}.

The per-query timing map (~3.5 KB for 87 queries) lives in
``BENCH_DETAIL.json`` next to this script, NOT on stdout: the driver
captures a bounded tail of stdout, and round 1's full map overflowed it —
BENCH_r01.json recorded ``parsed: null`` for a successful run.  The stdout
line stays well under 200 chars no matter how many queries register.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from nr_rfc_dischargeobs_spark.plans.extensions import (  # noqa: E402
    release_plan_caches,
)
from nr_rfc_dischargeobs_spark.session import get_spark  # noqa: E402

# Headline subset: one per operator family; bench runs each to completion
# (count() forces full execution without driver-side result transfer).
HEADLINE = None  # None = all queries()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # -Xlog:disable: JVM unified logging (GC warnings etc.) writes to
    # STDOUT and would corrupt the one-JSON-line contract.
    spark = get_spark(
        "bench",
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Bench the raw operator plans: the canonical ORDER BY that queries()
    # wraps around every entry exists solely so the external value-hash
    # compare sees one row order — it is not part of any operator's
    # semantics, and its extra range-partitioning stage (sample + sort per
    # query) would add a flat ~0.3 s/query of compare-harness overhead to
    # a throughput measurement (measured +27 s over 87 queries at sf0.1).
    queries = (
        entrymod._raw_queries()
        if hasattr(entrymod, "_raw_queries")
        else entrymod.queries()
    )
    names = HEADLINE or list(queries)

    # Warm the JVM + parquet footer caches once so per-query numbers measure
    # the plan, not first-touch JIT.
    try:
        queries[names[0]](spark, sf_dir).count()
    except Exception:
        pass

    # Best of two passes per query: single-shot numbers on a shared local
    # JVM carry ±20% scheduler/GC noise; the min is the plan's cost.
    # A failing query must never kill the run — the one-JSON-line contract
    # survives, the failure lands on stderr and as a null timing.
    # Plan-owned caches (PQ codes, SemDeDup assignment) are released after
    # EVERY timed execution: without the release, each invocation pins a
    # fresh CacheManager entry, later queries (and the whole second pass)
    # run under accreting storage-memory pressure, and — because the
    # CacheManager substitutes cached fragments into semantically equal
    # plans — pass 2 of the PQ queries would silently time a cache read
    # instead of the plan.  (See BENCH_NOTES.md for the measured effect.)
    timings: dict[str, float] = {}
    failed: list[str] = []
    for _ in range(2):
        for name in names:
            if name in failed:
                continue
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).count()
                elapsed = round(time.time() - t0, 3)
            except Exception as ex:  # noqa: BLE001 — report, don't die
                print(f"bench: {name} FAILED: {ex}", file=sys.stderr)
                failed.append(name)
                timings.pop(name, None)
                continue
            finally:
                # ALSO on failure: plan construction may already have
                # pinned caches (the PQ/IVF-PQ persists happen at build
                # time) — a failed query must not leak them into every
                # subsequent timing.  The clock is stopped before this
                # runs, so the release cost stays out of the numbers.
                release_plan_caches()
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    # the lifecycle promise, checked: a full bench run ends cache-clean
    try:
        cache_empty = bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )
    except Exception:  # noqa: BLE001 — introspection only, never fatal
        cache_empty = None

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # n_queries disambiguates partial runs: "value" sums only the
        # queries that ran, so a record with failures is NOT comparable to a
        # full-sweep total unless n_queries says how many it covered.
        "n_queries": len(timings),
        "queries": timings,
        "failed": failed,
        "cache_empty_at_end": cache_empty,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail, indent=2) + "\n")

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "failed": len(failed),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
