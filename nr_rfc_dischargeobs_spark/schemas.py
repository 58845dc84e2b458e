"""Explicit StructType schemas for every source (FIXTURES.md F1-F7).

The reference infers schemas from CSV headers and addresses columns
positionally (``discharge_obs_pd.py:88-90,152-153``) — fragile under header
drift.  The engine pins every source schema here; conformers select by NAME
from these declared shapes, and the canonical long observation table (F7) is
the single schema the rest of the engine sees.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# F1 — WSC DataMart hourly hydrometric CSV (discharge_obs_pd.py:130-155).
# Date arrives as a string with a UTC offset; kept as string so the
# conformer controls tz handling explicitly.
WSC_SCHEMA = StructType(
    [
        StructField("ID", StringType()),
        StructField("Date", StringType()),
        StructField("water_level_m", DoubleType()),
        StructField("level_grade", StringType()),
        StructField("level_symbol", StringType()),
        StructField("level_qaqc", StringType()),
        StructField("discharge_cms", DoubleType()),
        StructField("discharge_grade", StringType()),
        StructField("discharge_symbol", StringType()),
        StructField("discharge_qaqc", StringType()),
    ]
)

# F2 — BC provincial Discharge.csv / Stage.csv (discharge_obs_pd.py:86-111).
# Header names carry leading spaces in the wild; the conformer trims.
PROVINCIAL_SCHEMA = StructType(
    [
        StructField("location_id", StringType()),
        StructField("meta1", StringType()),
        StructField("meta2", StringType()),
        StructField("meta3", StringType()),
        StructField("meta4", StringType()),
        StructField("datetime_utc", StringType()),
        StructField("meta5", StringType()),
        StructField("value", DoubleType()),
    ]
)

# F3 — USGS NWIS instantaneous values (discharge_obs_pd.py:46-72):
# long frame keyed by (site, UTC datetime) with parameter-code columns.
USGS_SCHEMA = StructType(
    [
        StructField("site_no", StringType()),
        StructField("datetime", TimestampType()),  # tz-aware UTC on the wire
        StructField("discharge_cfs", DoubleType()),  # param 00060
        StructField("stage_ft", DoubleType()),  # param 00065
    ]
)

# F4 — ECCC SWOB-ML observation rows after XML extraction
# (ECCC_hourly.py:19-27,79-113): values arrive as dirty strings.
SWOB_SCHEMA = StructType(
    [
        StructField("station", StringType()),
        StructField("obs_hour", TimestampType()),
        StructField("air_temp", StringType()),
        StructField("avg_air_temp_pst1hr", StringType()),
        StructField("pcpn_amt_pst1hr", StringType()),
        StructField("f_read", BooleanType()),
    ]
)

# F5 — station dimension tables
PROVINCIAL_STATIONS_SCHEMA = StructType(
    [StructField("ID", StringType()), StructField("ID2", StringType())]
)
USGS_STATIONS_SCHEMA = StructType(
    [
        StructField("bc_rfc_id", StringType()),
        StructField("name", StringType()),
    ]
)

# F7 — the canonical long observation table, the engine's spine
# (SURVEY.md §1.4): station-as-row means new stations are new rows, not
# schema evolution; wide form exists only at export edges.
OBSERVATION_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), nullable=False),
        StructField("obs_time", TimestampType(), nullable=False),
        StructField("datatype", StringType(), nullable=False),  # 'Q' | 'H'
        StructField("value", DoubleType()),
        StructField("qc_level", StringType()),  # 'raw' | 'qc'
        StructField("source", StringType()),  # 'wsc'|'prov'|'usgs'|'estimate'
    ]
)

OBSERVATION_COLUMNS = [f.name for f in OBSERVATION_SCHEMA.fields]
