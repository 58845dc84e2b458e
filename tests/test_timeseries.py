"""Unit tests for the time-series statistics plans (plans/timeseries.py):
hand-computed cases on synthetic events tables, plus plan-shape guards for
the single-exchange promises the module's docstrings make."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from nr_rfc_dischargeobs_spark.plans import timeseries

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_dir(tmp_path, rows):
    """Write a minimal events.parquet (event_id, ts, user_id, event_type,
    value) shaped like the driver testdata."""
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    out = tmp_path / "tsdata"
    out.mkdir()
    df.to_parquet(out / "events.parquet", index=False)
    return str(out)


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_interpolate_fills_gap_linearly(spark, tmp_path):
    # observations at hour 0 (1.00) and hour 3 (4.00); hours 1-2 are gaps
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "click", 1.00),
            (2, T0 + dt.timedelta(hours=3), 7, "click", 4.00),
        ],
    )
    rows = {
        r["hr"]: (r["value"], r["is_observed"])
        for r in timeseries.interpolate_hourly(spark, sf).collect()
    }
    assert rows[T0] == (1.00, 1)
    assert rows[T0 + dt.timedelta(hours=1)] == (2.00, 0)
    assert rows[T0 + dt.timedelta(hours=2)] == (3.00, 0)
    assert rows[T0 + dt.timedelta(hours=3)] == (4.00, 1)


def test_interpolate_averages_within_hour_before_filling(spark, tmp_path):
    # two samples in hour 0 average to 2.00 on the grid before interpolation
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "click", 1.00),
            (2, T0 + dt.timedelta(minutes=30), 7, "click", 3.00),
            (3, T0 + dt.timedelta(hours=2), 7, "click", 6.00),
        ],
    )
    rows = {
        r["hr"]: r["value"]
        for r in timeseries.interpolate_hourly(spark, sf).collect()
    }
    assert rows[T0] == 2.00
    assert rows[T0 + dt.timedelta(hours=1)] == 4.00


def test_trapezoid_volume_hand_case(spark, tmp_path):
    # v=1.00@t0, v=3.00@t0+10s: volume = (1+3)/2 * 10 = 20 value-seconds
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "click", 1.00),
            (2, T0 + dt.timedelta(seconds=10), 7, "click", 3.00),
        ],
    )
    [row] = timeseries.trapezoid_volume(spark, sf).collect()
    assert row["n_events"] == 2
    assert row["volume"] == pytest.approx(20.0)


def test_zscore_flags_only_the_outlier(spark, tmp_path):
    # nine 10.00s and one 100.00: mean=19, stddev_samp≈28.5 → only the
    # 100 exceeds mean + 2σ
    rows = [(i, T0 + dt.timedelta(minutes=i), 7, "click", 10.00) for i in range(9)]
    rows.append((9, T0 + dt.timedelta(minutes=9), 7, "click", 100.00))
    sf = _events_dir(tmp_path, rows)
    [out] = timeseries.zscore_anomaly(spark, sf).collect()
    assert out["n_events"] == 10
    assert out["mean_value"] == pytest.approx(19.0)
    assert out["n_anomalies"] == 1


def test_moving_avg_trailing_window_is_time_based(spark, tmp_path):
    # events at t0, t0+30min, t0+90min: the third's 1h window excludes t0
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "click", 2.00),
            (2, T0 + dt.timedelta(minutes=30), 7, "click", 4.00),
            (3, T0 + dt.timedelta(minutes=90), 7, "click", 6.00),
        ],
    )
    got = {
        r["event_id"]: r["moving_avg_1h"]
        for r in timeseries.moving_avg_1h(spark, sf).collect()
    }
    assert got[1] == pytest.approx(2.0)
    assert got[2] == pytest.approx(3.0)
    assert got[3] == pytest.approx(5.0)  # (4+6)/2, t0 out of range


def test_single_exchange_shapes(spark):
    """moving-avg and trapezoid shuffle once; zscore's groupBy reuses the
    window's hash partitioning (exactly one hashpartitioning(user_id))."""
    sf = "/root/testdata/sf0.001"
    for fn in (
        timeseries.moving_avg_1h,
        timeseries.trapezoid_volume,
        timeseries.zscore_anomaly,
    ):
        plan = _formatted(fn(spark, sf))
        assert plan.count("hashpartitioning(user_id") == 1, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__


def test_deseasonalized_residuals_zero_for_flat_profile(spark, sf_dir):
    """Residuals sum to ~0 within every (dow, hour) cell by construction."""
    from nr_rfc_dischargeobs_spark.plans import timeseries as ts

    import pyspark.sql.functions as F

    df = ts.deseasonalized_residuals(spark, sf_dir)
    cells = (
        df.groupBy("isodow", "hr")
        .agg(F.sum("residual").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert cells
    for c in cells:
        assert abs(c.s) < 1e-6 * c.n  # mean residual ~ 0 per cell


def test_cusum_drift_detects_level_shift(spark):
    """A step change ramps the CUSUM statistic; the last point of any
    series returns to ~0 (sum of deviations from the mean is zero)."""
    import datetime as dt

    from nr_rfc_dischargeobs_spark.plans import timeseries as ts
    from nr_rfc_dischargeobs_spark.plans import TABLES  # noqa: F401

    import pyspark.sql.functions as F
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 1,
         "view", 10.0 if i < 50 else 20.0, "{}")
        for i in range(100)
    ]
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        out = sorted(
            ts.cusum_drift(spark, d).collect(), key=lambda r: r.ts_us
        )
    # mean = 15: first half drifts -5 per step (min at the shift), then
    # +5 per step back to exactly 0 at the end
    assert out[49].cusum == -250.0  # 50 * (10-15)
    assert abs(out[-1].cusum) < 1e-9
    mid = min(r.cusum for r in out)
    assert mid == -250.0
