"""Plan-shape regression guards: the scale properties the engine promises
(pushdown, pruning, broadcasts, no stray Python) asserted on the optimized/
executed plans, so a refactor that silently loses one fails CI, not the
fleet."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nr_rfc_dischargeobs_spark.plans import events, tpch
from nr_rfc_dischargeobs_spark.sources import ObservationStore

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q6_pushes_predicates_and_prunes_columns(spark):
    plan = _formatted(tpch.forecast_revenue(spark, SF))
    assert "GreaterThanOrEqual(l_shipdate" in plan  # pushed to the scan
    assert "LessThan(l_shipdate" in plan
    # projection pruned to the 4 referenced columns
    assert "l_comment" not in plan
    assert plan.count("Scan parquet") <= 2


def test_semi_join_broadcasts_the_dimension(spark):
    plan = _formatted(events.semi_join_stations(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_store_range_read_prunes_partitions(spark, tmp_path):
    obs = spark.createDataFrame(
        [
            ("S1", dt.datetime(2024, m, 1, 12), "Q", 1.0, "raw", "wsc")
            for m in (1, 2, 3)
        ],
        ["station_id", "obs_time", "datatype", "value", "qc_level", "source"],
    )
    store = ObservationStore(spark, str(tmp_path / "prune"))
    store.write(obs)
    pruned = store.read_range("2024-02-01", "2024-02-20")
    plan = _formatted(pruned)
    assert "PartitionFilters" in plan and "year_month" in plan
    assert pruned.count() == 1  # only February survives


def test_no_python_eval_outside_the_recurrence(spark):
    """Every plan except A2 and the multimodal decode stub must stay fully
    JVM-side — no Arrow/Batch Python eval nodes."""
    import __spark_entry__ as e

    allowed = {"a2_rising_falling_recurrence", "ext_mm_decode_features"}
    offenders = []
    for name, fn in e.queries().items():
        if name in allowed:
            continue
        plan = _formatted(fn(spark, SF))
        if any(
            marker in plan
            for marker in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        ):
            offenders.append(name)
    assert offenders == []
