"""ECCC SWOB-ML weather conformer (reference: ``ECCC_hourly.py``).

The reference fetches one XML file per (station, hour) and extracts named
``value`` attributes (``ECCC_hourly.py:19-27``).  Engine version:

- ``parse_swob_xml``: XML payload strings → F4 rows via ``xpath_string``
  (native, no Python parsing);
- ``conform_swob``: F4 rows → weather long table with the reference's
  numeric-validity scrub (``:9-16,124`` — try-cast, not a Python UDF), the
  fixed −8 h shift (``:36,63``), the ``C`` station prefix strip (``:134-135``),
  and the ``f_read`` memoization filter (``:94,112-113``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SWOB_VARS = ("air_temp", "avg_air_temp_pst1hr", "pcpn_amt_pst1hr")


def xml_attr(xml: Column, name: str) -> Column:
    """Extract <element name='{name}' value='...'/> from a SWOB payload."""
    return F.xpath_string(
        xml, F.lit(f"string(//element[@name='{name}']/@value)")
    )


def parse_swob_xml(
    payloads: DataFrame,
    xml_col: str = "xml",
    station_col: str = "station",
    hour_col: str = "obs_hour",
) -> DataFrame:
    """(station, obs_hour, xml) → F4 rows (values still dirty strings)."""
    return payloads.select(
        F.col(station_col).alias("station"),
        F.col(hour_col).alias("obs_hour"),
        *[xml_attr(F.col(xml_col), v).alias(v) for v in SWOB_VARS],
        F.lit(True).alias("f_read"),
    )


def conform_swob(
    raw: DataFrame,
    utc_offset_hours: int = -8,
    strip_prefix: str = "C",
) -> DataFrame:
    """F4 → long weather table (station_id, obs_time, variable, value).

    Non-numeric payloads (e.g. ``MSNG``) become null — the engine-side
    equivalent of the reference's blank-out (``ECCC_hourly.py:124``).
    Rows not yet fetched (``f_read`` false) are excluded, mirroring the
    memoization skip.
    """
    unread = raw.filter(F.col("f_read"))
    long_ = unread.unpivot(
        ["station", "obs_hour"], list(SWOB_VARS), "variable", "raw_value"
    )
    return long_.select(
        F.when(
            F.col("station").startswith(strip_prefix),
            F.expr(f"substr(station, {len(strip_prefix) + 1})"),
        )
        .otherwise(F.col("station"))
        .alias("station_id"),
        (
            F.col("obs_hour") + F.expr(f"INTERVAL {utc_offset_hours} HOURS")
        ).alias("obs_time"),
        F.col("variable"),
        F.col("raw_value").try_cast("double").alias("value"),
        F.lit("eccc").alias("source"),
    )
