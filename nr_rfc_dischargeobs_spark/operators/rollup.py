"""Rollup operators: hourly/daily tumbling aggregations with the reference's
hydrology-specific override rules.

Reference semantics (citations into /root/reference):
- A1 hourly mean + final-hour-uses-last-observation:
  ``dischargeobs_write_xl.py:337-349``.
- A3 daily mean + last-valid-day-uses-last-hourly-value:
  ``dischargeobs_write_xl.py:379-387``.
- A8 per-station last-valid timestamp: ``dischargeobs_write_xl.py:384``.

All are single-shuffle groupBy plans with map-side partial aggregation;
``last`` semantics are made deterministic with ``max_by`` over an explicit
(ts, tiebreak) ordering because Spark's ``last()`` is order-undefined after a
shuffle (SURVEY.md §4 pitfalls).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordered_last(value: str, ts: str, tiebreak: str | None) -> Column:
    """Deterministic 'last observation in group': value at max (ts, tiebreak)."""
    order = (
        F.struct(F.col(ts), F.col(tiebreak)) if tiebreak else F.col(ts)
    )
    return F.max_by(F.col(value), F.when(F.col(value).isNotNull(), order))


def hourly_rollup(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str | None = None,
    decimals: int | None = None,
) -> DataFrame:
    """Tumbling 1-hour aggregation: mean, deterministic last-valid, count.

    Columns: (key, hour, avg_value, last_value, n_obs).  One shuffle on
    (key, hour); partial aggregation reduces ~12 five-minute samples per
    group map-side, so the shuffle payload is |stations|×|hours| rows no
    matter how dense the input.
    """
    avg_col = F.avg(value)
    if decimals is not None:
        avg_col = F.round(avg_col, decimals)
    return df.groupBy(
        F.col(key), F.date_trunc("hour", F.col(ts)).alias("hour")
    ).agg(
        avg_col.alias("avg_value"),
        _ordered_last(value, ts, tiebreak).alias("last_value"),
        F.count(F.when(F.col(value).isNotNull(), 1)).alias("n_obs"),
    )


def hourly_rollup_with_final_override(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str | None = None,
    decimals: int | None = None,
) -> DataFrame:
    """A1 in full: hourly mean, except each key's *final* non-null hour
    reports the last observation instead of the (partial-hour) mean
    (``dischargeobs_write_xl.py:346-349``).

    Plan shape: the hourly rollup (one shuffle), then a per-key max-hour
    aggregation (tiny: one row per key) broadcast-joined back — the big
    side is never reshuffled.
    """
    hourly = hourly_rollup(df, key, ts, value, tiebreak, decimals)
    last_hour = hourly.filter(F.col("avg_value").isNotNull()).groupBy(key).agg(
        F.max("hour").alias("__last_hour")
    )
    out_value = F.when(
        F.col("hour") == F.col("__last_hour"), F.col("last_value")
    ).otherwise(F.col("avg_value"))
    if decimals is not None:
        out_value = F.round(out_value, decimals)
    return (
        hourly.join(F.broadcast(last_hour), key, "left")
        .withColumn("value", out_value)
        .select(key, "hour", "value", "n_obs")
    )


def daily_rollup_with_last_day_override(
    hourly: DataFrame,
    key: str,
    hour: str = "hour",
    value: str = "value",
    decimals: int | None = None,
) -> DataFrame:
    """A3: daily mean of hourly values, except each key's last valid day
    reports the last hourly value instead of the partial-day mean
    (``dischargeobs_write_xl.py:379-387``).
    """
    daily = hourly.groupBy(
        F.col(key), F.date_trunc("day", F.col(hour)).alias("day")
    ).agg(
        F.avg(value).alias("__mean"),
        F.max_by(
            F.col(value), F.when(F.col(value).isNotNull(), F.col(hour))
        ).alias("__last"),
    )
    last_day = daily.filter(F.col("__mean").isNotNull()).groupBy(key).agg(
        F.max("day").alias("__last_day")
    )
    out_value = F.when(
        F.col("day") == F.col("__last_day"), F.col("__last")
    ).otherwise(F.col("__mean"))
    if decimals is not None:
        out_value = F.round(out_value, decimals)
    return (
        daily.join(F.broadcast(last_day), key, "left")
        .withColumn("value", out_value)
        .select(key, "day", "value")
    )


def last_valid_ts(df: DataFrame, key: str, ts: str, value: str) -> DataFrame:
    """A8: per-key timestamp of the last non-null value
    (``dischargeobs_write_xl.py:384``) — `max(ts) filter (value not null)`."""
    return df.groupBy(key).agg(
        F.max(F.when(F.col(value).isNotNull(), F.col(ts))).alias("last_valid_ts")
    )
