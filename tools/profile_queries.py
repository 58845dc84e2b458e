"""Phase profiler: where does each registered query's wall time go?

For each named query (or all), after a full warm-up pass, measures:

- ``build_s``   — calling the plan function (Python + any plan-build jobs)
- ``exec_s``    — the timed action (``count()``, matching bench.py)
- ``noop_s``    — a second action through the noop sink (guide §1.4,
  computes every column; NaN if it fails)
- ``jobs_build`` / ``jobs_exec`` — Spark jobs submitted in each phase
  (from the status tracker's job-id high-water mark)

Prints one line per query and a JSON map at the end.

    python tools/profile_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    import __spark_entry__ as entrymod
    from nr_rfc_dischargeobs_spark.plans.extensions import release_plan_caches
    from nr_rfc_dischargeobs_spark.session import get_spark

    spark = get_spark(
        "profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def job_count() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    queries = entrymod._raw_queries()
    names = only or list(queries)

    # warm-up (codegen/JIT/footer caches), matching bench.py
    for name in names:
        try:
            queries[name](spark, sf_dir).count()
        except Exception:
            pass
        finally:
            release_plan_caches()

    out = {}
    for name in names:
        j0 = job_count()
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        t1 = time.time()
        j1 = job_count()
        df.count()
        t2 = time.time()
        j2 = job_count()
        try:
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            noop_s = round(t3 - t2, 3)
        except Exception:
            noop_s = None
        release_plan_caches()
        rec = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "noop_s": noop_s,
            "jobs_build": j1 - j0,
            "jobs_exec": j2 - j1,
        }
        out[name] = rec
        print(
            f"{name:42s} build={rec['build_s']:6.3f}s ({rec['jobs_build']:2d} jobs)"
            f"  exec={rec['exec_s']:6.3f}s ({rec['jobs_exec']:2d} jobs)"
            f"  noop={noop_s}"
        )
    Path("/tmp/profile_queries.json").write_text(json.dumps(out, indent=1))
    print("wrote /tmp/profile_queries.json")


if __name__ == "__main__":
    main()
