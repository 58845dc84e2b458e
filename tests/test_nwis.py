"""NWIS IV client tests — canned WaterML-JSON payloads via fake openers,
no network (same posture as test_fetch.py)."""

from __future__ import annotations

import io
import json
from datetime import datetime

import pytest

from nr_rfc_dischargeobs_spark.sources import nwis
from nr_rfc_dischargeobs_spark.sources.usgs import conform_usgs


def _series(site, param, values, nodata=-999999.0):
    return {
        "sourceInfo": {"siteCode": [{"value": site}]},
        "variable": {
            "variableCode": [{"value": param}],
            "noDataValue": nodata,
        },
        "values": [{"value": values}],
    }


PAYLOAD = {
    "value": {
        "timeSeries": [
            _series(
                "12401500",
                nwis.PARAM_DISCHARGE_CFS,
                [
                    {"value": "353.147", "dateTime": "2024-01-10T08:00:00.000-08:00"},
                    {"value": "-999999", "dateTime": "2024-01-10T08:15:00.000-08:00"},
                ],
            ),
            _series(
                "12401500",
                nwis.PARAM_STAGE_FT,
                [{"value": "3.28084", "dateTime": "2024-01-10T08:00:00.000-08:00"}],
            ),
            _series(
                "12404500",
                nwis.PARAM_DISCHARGE_CFS,
                [{"value": "70.6294", "dateTime": "2024-01-10T16:00:00.000Z"}],
            ),
        ]
    }
}


def test_rfc_to_site_replacement():
    assert nwis.rfc_to_site(["12U015", "12U045"]) == ["1200015", "1200045"]


def test_default_window_is_2day_midnight_pushdown():
    start, end = nwis.default_window(datetime(2024, 7, 15, 13, 45, 59))
    assert (start, end) == ("2024-07-13", "2024-07-15")


def test_iv_url_carries_pushdown_in_query():
    url = nwis.iv_url(["1200015", "1200045"], "2024-07-13", "2024-07-15")
    assert url.startswith(nwis.IV_BASE + "?")
    assert "sites=1200015%2C1200045" in url
    assert "startDT=2024-07-13" in url and "endDT=2024-07-15" in url
    assert "parameterCd=00060%2C00065" in url


def test_fetch_iv_retries_then_succeeds():
    calls = {"n": 0, "url": None}

    def flaky(url):
        calls["n"] += 1
        calls["url"] = url
        if calls["n"] < 3:
            raise OSError("transient")
        return io.BytesIO(json.dumps(PAYLOAD).encode())

    out = nwis.fetch_iv(
        ["1200015"],
        "2024-07-13",
        "2024-07-15",
        backoff_seconds=0,
        opener=flaky,
    )
    assert calls["n"] == 3
    assert "startDT=2024-07-13" in calls["url"]
    assert out == PAYLOAD


def test_fetch_iv_required_posture_raises():
    import urllib.error

    def dead(url):
        raise OSError("down")

    with pytest.raises(urllib.error.URLError, match="after 2 attempts"):
        nwis.fetch_iv(
            ["1200015"], "2024-07-13", "2024-07-15",
            retries=2, backoff_seconds=0, opener=dead,
        )


def test_iv_records_pivots_params_wide_and_nulls_nodata():
    rows = {(r["site_no"], r["datetime"]): r for r in nwis.iv_records(PAYLOAD)}
    both = rows[("12401500", "2024-01-10T08:00:00.000-08:00")]
    assert both["discharge_cfs"] == pytest.approx(353.147)
    assert both["stage_ft"] == pytest.approx(3.28084)
    # noDataValue sentinel → NULL, never a number
    assert rows[("12401500", "2024-01-10T08:15:00.000-08:00")][
        "discharge_cfs"
    ] is None
    assert rows[("12404500", "2024-01-10T16:00:00.000Z")][
        "stage_ft"
    ] is None


def test_iv_records_non_numeric_placeholder_becomes_null():
    """NWIS IV feeds carry qualifier strings ('Ice', 'Eqp', '***') in the
    value slot during freeze-ups/outages; one must become a NULL
    observation — like the noDataValue sentinel — not a ValueError that
    kills the whole required-posture USGS leg."""
    payload = {
        "value": {
            "timeSeries": [
                _series(
                    "12401500",
                    nwis.PARAM_DISCHARGE_CFS,
                    [
                        {"value": "Ice", "dateTime": "2024-01-10T08:00:00.000-08:00"},
                        {"value": "354.0", "dateTime": "2024-01-10T08:15:00.000-08:00"},
                    ],
                )
            ]
        }
    }
    rows = {r["datetime"]: r for r in nwis.iv_records(payload)}
    assert rows["2024-01-10T08:00:00.000-08:00"]["discharge_cfs"] is None
    assert rows["2024-01-10T08:15:00.000-08:00"]["discharge_cfs"] == pytest.approx(354.0)


def test_iv_dataframe_feeds_conformer_end_to_end(spark):
    """EP1 USGS leg end-to-end: payload → frame → conform_usgs → canonical
    long rows with converted units on US/Pacific wall-clock time."""
    df = nwis.iv_dataframe(spark, PAYLOAD)
    assert df.columns == ["site_no", "datetime", "discharge_cfs", "stage_ft"]
    out = conform_usgs(df).collect()
    by_key = {(r.station_id, str(r.obs_time), r.datatype): r.value for r in out}
    # 353.147 cfs → 10.0 m³/s, at 08:00 Pacific (the -08:00 stamp's wall clock)
    assert by_key[("12401500", "2024-01-10 08:00:00", "Q")] == pytest.approx(10.0)
    # 3.28084 ft → 1.0 m
    assert by_key[("12401500", "2024-01-10 08:00:00", "H")] == pytest.approx(1.0)
    # the Z-stamped instant lands at its Pacific wall clock (16:00Z → 08:00 PST)
    assert by_key[("12404500", "2024-01-10 08:00:00", "Q")] == pytest.approx(2.0)
    # nodata row carries a NULL Q observation
    assert by_key[("12401500", "2024-01-10 08:15:00", "Q")] is None


def test_pipeline_usgs_leg_with_injected_opener(spark):
    """pipelines.usgs_instantaneous_frame is the full EP1 USGS leg with the
    transport injected — URL carries the pushdown, output is canonical."""
    import io as _io

    from nr_rfc_dischargeobs_spark import pipelines

    seen = {}

    def fake(url):
        seen["url"] = url
        return _io.BytesIO(json.dumps(PAYLOAD).encode())

    out = pipelines.usgs_instantaneous_frame(
        spark,
        ["12U015"],
        start_date="2024-01-09",
        end_date="2024-01-11",
        opener=fake,
    )
    assert "sites=1200015" in seen["url"]
    assert "startDT=2024-01-09" in seen["url"]
    assert out.columns == [
        "station_id", "obs_time", "datatype", "value", "qc_level", "source"
    ]
    rows = out.collect()
    assert all(r.source == "usgs" for r in rows)
    assert len(rows) > 0
