"""Hand-case tests for plans/analytics.py — the tie/boundary rules the
oracle comparison verifies but does not explain: the as-of join's
view-before-purchase-at-equal-timestamp rule, sessionize's strict >30 min
gap, top-k's full tie-break, and the binned range join's [t-1h, t) bounds."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from nr_rfc_dischargeobs_spark.plans import analytics

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_dir(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    out = tmp_path / "andata"
    out.mkdir()
    df.to_parquet(out / "events.parquet", index=False)
    return str(out)


def test_asof_equal_timestamp_view_wins(spark, tmp_path):
    # view and purchase at the SAME microsecond: the view orders first, so
    # the purchase sees it; an earlier view is superseded
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "view", 10.00),
            (2, T0 + dt.timedelta(minutes=5), 7, "view", 20.00),
            (3, T0 + dt.timedelta(minutes=5), 7, "purchase", 99.00),
            (4, T0 + dt.timedelta(minutes=9), 7, "purchase", 50.00),
        ],
    )
    got = {
        r["event_id"]: r["last_view_value"]
        for r in analytics.asof_join(spark, sf).collect()
    }
    assert got[3] == 20.00  # same-instant view visible
    assert got[4] == 20.00  # carried forward


def test_asof_purchase_with_no_prior_view_gets_null(spark, tmp_path):
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "purchase", 10.00),
            (2, T0 + dt.timedelta(minutes=1), 7, "view", 5.00),
        ],
    )
    [row] = analytics.asof_join(spark, sf).collect()
    assert row["event_id"] == 1 and row["last_view_value"] is None


def test_sessionize_30min_gap_is_strictly_exclusive(spark, tmp_path):
    # gap of EXACTLY 30 min continues the session; 30 min + 1 µs splits
    sf = _events_dir(
        tmp_path,
        [
            (1, T0, 7, "click", 1.0),
            (2, T0 + dt.timedelta(minutes=30), 7, "click", 1.0),
            (3, T0 + dt.timedelta(minutes=60, microseconds=1), 7, "click", 1.0),
        ],
    )
    rows = sorted(
        (r["session_no"], r["n_events"])
        for r in analytics.sessionize(spark, sf).collect()
    )
    assert rows == [(1, 2), (2, 1)]


def test_topk_breaks_value_ties_by_ts_then_event_id(spark, tmp_path):
    sf = _events_dir(
        tmp_path,
        [
            (9, T0 + dt.timedelta(minutes=1), 7, "click", 5.00),
            (2, T0, 7, "click", 5.00),
            (3, T0, 7, "click", 5.00),
            (4, T0, 7, "click", 4.00),
        ],
    )
    got = {
        r["rnk"]: r["event_id"]
        for r in analytics.topk_per_group(spark, sf).collect()
    }
    # equal values rank by earlier ts first, then smaller event_id
    assert got == {1: 2, 2: 3, 3: 9}


def test_range_join_window_is_left_closed_right_open(spark, tmp_path):
    p_ts = T0 + dt.timedelta(hours=2)
    sf = _events_dir(
        tmp_path,
        [
            (1, p_ts - dt.timedelta(hours=1), 7, "click", 1.0),  # in (>= t-1h)
            (2, p_ts - dt.timedelta(minutes=30), 7, "click", 1.0),  # in
            (3, p_ts, 7, "click", 1.0),  # out (< t strict)
            (4, p_ts - dt.timedelta(hours=1, microseconds=1), 7, "click", 1.0),  # out
            (5, p_ts, 7, "purchase", 9.0),
        ],
    )
    [row] = analytics.range_join_binned(spark, sf).collect()
    assert row["n_clicks_prev_hour"] == 2
