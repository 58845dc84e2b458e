"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]`` but every config here is chosen to also be
the right default on a 1000-executor cluster reading 100 TB:

- AQE on (runtime shuffle coalescing, skew-join splitting) — replaces the
  reference's hand-rolled partition logic (SURVEY.md §4).
- shuffle partitions sized for the local harness; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant.
- Arrow enabled for the few pandas-interop edges (grouped-map recurrence,
  Excel export adapters) so batches move columnar, never row-at-a-time.
- Session timezone pinned to UTC: the engine stores event-time as naive-UTC
  and converts to local (America/Vancouver) only at export edges, which keeps
  parquet/DuckDB/Spark agreeing bit-for-bit on timestamp values.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "nr-rfc-dischargeobs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Adaptive execution: coalesce small shuffle partitions, split skewed
        # ones, demote sort-merge to broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalesce to the 64M advisory size instead of defending initial
        # parallelism: post-shuffle partition count tracks DATA VOLUME at
        # every scale (tiny stages collapse to a few tasks locally; a
        # 100 TB shuffle still yields ~byte-sized partitions), and skew
        # splitting above still applies.  Measured 13% off the bench total.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        # r14 (guide §1.2 step 3): the janino-compile cache is keyed on
        # generated source and holds 100 entries by default — a workload
        # of 150+ distinct plans (this engine's query surface, or any
        # resident multi-query driver) evicts everything between
        # repetitions and recompiles every codegen unit on every
        # re-execution.  Size it to the plan surface; entries are
        # weak-referenced class+bytecode pairs, a few MB total.  Static
        # conf, so it must be set at session build.  Scale-independent:
        # the cache lives on the driver/executor JVMs and its right size
        # tracks the number of distinct plans, not cores or data volume.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4000"),
        )
        # Arrow for the pandas edges (grouped-map recurrence, export adapters).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics across Spark/DuckDB/parquet.
        .config("spark.sql.session.timeZone", "UTC")
        # Partition discovery + pruning on the hive-layout observation store.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Some upstream writers emit TIMESTAMP(NANOS) parquet (e.g. pandas
        # ns-precision); Spark has no nanos type, so read them as long and
        # convert at the scan edge (plans/__init__.py::load truncates to
        # micros, matching DuckDB's own nanos→micros truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # local[] runs driver AND all 32 executor threads in ONE JVM —
        # Spark's 1g default heap starves 32 concurrent tasks (GC-locker
        # stalls, then OOM).  Size it like the executor fleet it stands for.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        # local[] has no dedicated driver; keep result transfers bounded.
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
