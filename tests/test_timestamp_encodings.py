"""Timestamp-encoding robustness: the scan edge must absorb every parquet
timestamp flavor a legitimate writer produces.

The round-2 driver testdata regeneration silently switched ``events.ts``
from TIMESTAMP(NANOS) to naive ``timestamp[us]`` (``isAdjustedToUTC=false``
→ Spark TIMESTAMP_NTZ) and broke 14 plans at analysis time — the suite only
caught it through the shared testdata, after the fact.  This fixture writes
the SAME event rows in all three encodings and sweeps the ts-heavy plans
over each, asserting bit-identical results: the next encoding shift fails
here first, in-repo.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from nr_rfc_dischargeobs_spark.plans import TABLES

SF = "/root/testdata/sf0.001"

# Every plan family that does epoch arithmetic on events.ts (the queries the
# NTZ regression actually broke), one representative each.
TS_SENSITIVE = [
    "a4_dedup_5min_grid",
    "a1_hourly_rollup_last_override",
    "an_sessionize_gap30m",
    "an_asof_join_view_purchase",
    "ts_moving_avg_1h",
    "ts_completeness_daily",
]

ENCODINGS = ["ltz", "ntz", "nanos"]


def _write_events(tbl: pa.Table, out: str, flavor: str) -> None:
    i = tbl.schema.get_field_index("ts")
    ts = tbl.column("ts")
    if flavor == "ltz":
        tbl = tbl.set_column(
            i, "ts", pc.cast(ts, pa.timestamp("us", tz="UTC"))
        )
        pq.write_table(tbl, out)
    elif flavor == "ntz":
        tbl = tbl.set_column(i, "ts", pc.cast(ts, pa.timestamp("us")))
        pq.write_table(tbl, out)
    elif flavor == "nanos":
        tbl = tbl.set_column(i, "ts", pc.cast(ts, pa.timestamp("ns")))
        # parquet 2.6 keeps TIMESTAMP(NANOS) instead of coercing to micros
        pq.write_table(tbl, out, version="2.6", coerce_timestamps=None)
    else:  # pragma: no cover
        raise AssertionError(flavor)


@pytest.fixture(scope="module")
def encoding_dirs(tmp_path_factory):
    """Three sibling sf-dirs differing ONLY in events.ts physical encoding;
    the other nine tables are symlinked to the real smoke testdata."""
    events = pq.read_table(f"{SF}/events.parquet")
    root = tmp_path_factory.mktemp("ts_encodings")
    dirs = {}
    for flavor in ENCODINGS:
        d = root / flavor
        d.mkdir()
        for t in TABLES:
            if t != "events":
                (d / f"{t}.parquet").symlink_to(f"{SF}/{t}.parquet")
        _write_events(events, str(d / "events.parquet"), flavor)
        dirs[flavor] = str(d)
    return dirs


def test_fixture_encodings_are_distinct(encoding_dirs):
    """Guard the guard: the three files really carry different physical
    types (a writer upgrade silently coercing them would blind this test)."""
    ltz = pq.read_schema(f"{encoding_dirs['ltz']}/events.parquet").field("ts")
    ntz = pq.read_schema(f"{encoding_dirs['ntz']}/events.parquet").field("ts")
    nanos = pq.read_schema(
        f"{encoding_dirs['nanos']}/events.parquet"
    ).field("ts")
    assert ltz.type == pa.timestamp("us", tz="UTC")
    assert ntz.type == pa.timestamp("us")
    assert nanos.type == pa.timestamp("ns")


@pytest.mark.parametrize("query", TS_SENSITIVE)
def test_ts_plans_identical_across_encodings(spark, encoding_dirs, query):
    fn = entrymod.queries()[query]
    results = {}
    for flavor, d in encoding_dirs.items():
        df = fn(spark, d)
        results[flavor] = sorted(
            df.collect(), key=lambda r: tuple(str(v) for v in r)
        )
    assert results["ltz"], f"{query}: empty result voids the comparison"
    assert results["ltz"] == results["ntz"], query
    assert results["ltz"] == results["nanos"], query


def test_load_normalizes_ts_to_session_timestamp(spark, encoding_dirs):
    """Whatever the physical encoding, load() hands plans a TIMESTAMP (LTZ)
    column — the single type the epoch helpers (functions/timeutil.py)
    contract on."""
    from pyspark.sql.types import TimestampType

    from nr_rfc_dischargeobs_spark.plans import load

    for flavor, d in encoding_dirs.items():
        dt = load(spark, d, "events").schema["ts"].dataType
        assert isinstance(dt, TimestampType), (flavor, dt)
