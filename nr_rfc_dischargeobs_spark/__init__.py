"""nr_rfc_dischargeobs_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of bcgov/nr-rfc-dischargeobs.

The reference (/root/reference, read-only snapshot) is a single-process pandas
ETL pipeline for river discharge/stage observations.  This package re-founds
its operator semantics on Spark DataFrame/SQL + Catalyst so every operator is
declarative, partition-aware, and scales to a multi-executor cluster:

- ``schemas``     explicit StructTypes for every source + the canonical long
                  observation table (SURVEY.md §1.4)
- ``operators``   conform / upsert / rollup / recurrence / align / pivot
                  (SURVEY.md §2.2-2.6)
- ``functions``   scalar function library + the formula-DSL compiler
                  (SURVEY.md §2.7)
- ``sources``     source conformers (WSC / provincial / USGS / SWOB) and the
                  hive-partitioned parquet store (SURVEY.md §2.1)
- ``plans``       named queries over the driver testdata (the ``queries()``
                  surface in ``__spark_entry__.py``)
- ``extensions``  LLM-data-pipeline operators: dedup, similarity search,
                  multimodal columns, text analysis (SURVEY.md §2.10)
- ``streaming``   Structured Streaming variants of the ingest tier
                  (SURVEY.md §2.9)
"""

__version__ = "0.3.0"
