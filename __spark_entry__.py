"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` maps
operator names (SURVEY.md §2) to ``(spark, sf_dir) -> DataFrame`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL per query for the driver's
row-count + schema + value-hash comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nr_rfc_dischargeobs_spark.plans import tpch


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing summary (scan→filter→group→multi-agg)."""
    return tpch.pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "tpch_q1_pricing_summary": tpch.pricing_summary,
        "tpch_q3_shipping_priority": tpch.shipping_priority,
        "tpch_q5_local_supplier_volume": tpch.local_supplier_volume,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each ``queries()`` entry."""
    return {
        "tpch_q1_pricing_summary": tpch.PRICING_SUMMARY_SQL,
        "tpch_q3_shipping_priority": tpch.SHIPPING_PRIORITY_SQL,
        "tpch_q5_local_supplier_volume": tpch.LOCAL_SUPPLIER_VOLUME_SQL,
    }
