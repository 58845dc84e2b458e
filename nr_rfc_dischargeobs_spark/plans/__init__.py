"""Named query plans over the driver testdata.

Each plan is a function ``(spark, sf_dir) -> DataFrame`` registered in
``__spark_entry__.py::queries()`` with a matching DuckDB oracle in
``oracle_sql()``.  Plans are grouped by the SURVEY.md §2 operator family they
exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver-generated table (SURVEY.md §2.1 S6).

    Plain ``spark.read.parquet`` so Catalyst's column pruning and filter
    pushdown reach the scan — callers filter/select on the returned frame and
    the parquet reader only materializes what the plan needs.
    """
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
