"""Tests for the PySpark Python data source wrapping WSC DataMart CSVs
(sources/datamart_source.py): per-file partitioning, positional column
contract, dirty-line tolerance, and composition with conform_wsc."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nr_rfc_dischargeobs_spark.sources.datamart_source import (
    WscDataMartDataSource,
)
from nr_rfc_dischargeobs_spark.sources.wsc import conform_wsc

HEADER = (
    " ID,Date,Water Level / Niveau d'eau (m),Grade,Symbol,QA/QC,"
    "Discharge / Débit (m³/s),Grade,Symbol,QA/QC\n"
)


def _write(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(HEADER)
        fh.writelines(rows)


def _read(spark, paths: str):
    spark.dataSource.register(WscDataMartDataSource)
    return spark.read.format("wsc_datamart").option("paths", paths).load()


def test_reads_positional_columns_across_files(spark, tmp_path):
    _write(
        tmp_path / "bc.csv",
        [
            "08MF005,2024-06-01T10:00:00-07:00,1.5,,,,100.0,,,\n",
            "08MF005,2024-06-01T10:05:00-07:00,,,,,101.0,,,\n",  # null stage
        ],
    )
    _write(
        tmp_path / "yukon.csv",
        ["09AB001,2024-06-01T10:00:00-07:00,2.5,,,,200.0,,,\n"],
    )
    df = _read(spark, f"{tmp_path}/*.csv")
    assert df.columns == ["ID", "Date", "water_level_m", "discharge_cms"]
    rows = {
        (r["ID"], r["Date"]): (r["water_level_m"], r["discharge_cms"])
        for r in df.collect()
    }
    assert rows[("08MF005", "2024-06-01T10:00:00-07:00")] == (1.5, 100.0)
    assert rows[("08MF005", "2024-06-01T10:05:00-07:00")] == (None, 101.0)
    assert rows[("09AB001", "2024-06-01T10:00:00-07:00")] == (2.5, 200.0)


def test_one_partition_per_file(spark, tmp_path):
    for i in range(3):
        _write(
            tmp_path / f"f{i}.csv",
            [f"08MF00{i},2024-06-01T10:00:00-07:00,1.0,,,,10.0,,,\n"],
        )
    df = _read(spark, f"{tmp_path}/*.csv")
    assert df.rdd.getNumPartitions() == 3


def test_short_and_dirty_lines_are_dropped_not_fatal(spark, tmp_path):
    _write(
        tmp_path / "dirty.csv",
        [
            "08MF005,2024-06-01T10:00:00-07:00,1.5,,,,100.0,,,\n",
            "short,row\n",
            "08MF005,2024-06-01T10:05:00-07:00,not_a_number,,,,n/a,,,\n",
        ],
    )
    df = _read(spark, str(tmp_path / "dirty.csv"))
    rows = df.collect()
    assert len(rows) == 2  # short line dropped
    dirty = [r for r in rows if r["Date"].endswith("10:05:00-07:00")][0]
    assert dirty["water_level_m"] is None  # unparseable → null, like P6
    assert dirty["discharge_cms"] is None


def test_composes_with_conform_wsc(spark, tmp_path):
    _write(
        tmp_path / "bc.csv",
        ["08MF005,2024-06-01T10:06:10-07:00,1.6,,,,101.0,,,\n"],
    )
    obs = conform_wsc(_read(spark, str(tmp_path / "bc.csv")))
    got = {
        (r["datatype"]): (r["obs_time"], r["value"])
        for r in obs.filter(F.col("station_id") == "08MF005").collect()
    }
    # 10:06:10 rounds to the 10:05 slot, offset renders as PDT wall clock
    assert got["Q"] == (dt.datetime(2024, 6, 1, 10, 5), 101.0)
    assert got["H"] == (dt.datetime(2024, 6, 1, 10, 5), 1.6)
