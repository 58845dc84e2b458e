"""Landing-zone fetch tests — file:// URLs and fake openers, no network."""

from __future__ import annotations

from datetime import datetime

import pytest

from nr_rfc_dischargeobs_spark.sources import fetch


def test_datamart_urls_expand_strftime_base():
    urls = fetch.datamart_urls(
        ["hydrometric/csv/BC/hourly/BC_hourly_hydrometric.csv"],
        "https://example.test/%Y%m%d/WXO-DD/",
        now=datetime(2024, 7, 15),
    )
    assert urls == [
        "https://example.test/20240715/WXO-DD/"
        "hydrometric/csv/BC/hourly/BC_hourly_hydrometric.csv"
    ]


def test_fetch_streams_file_urls_to_landing(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "Discharge.csv").write_text("id,value\nA,1\n")
    out = fetch.fetch_to_landing(
        [(src / "Discharge.csv").as_uri()], str(tmp_path / "landing")
    )
    assert out[0].ok
    assert (tmp_path / "landing" / "Discharge.csv").read_text().startswith("id,")
    assert not list((tmp_path / "landing").glob("*.part"))  # no torn files


def test_fetch_retries_then_succeeds(tmp_path):
    import io

    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return io.BytesIO(b"data")

    out = fetch.fetch_to_landing(
        ["https://x/f.csv"],
        str(tmp_path),
        retries=3,
        backoff_seconds=0,
        opener=flaky,
    )
    assert out[0].ok and calls["n"] == 3
    assert (tmp_path / "f.csv").read_bytes() == b"data"


def test_optional_fetch_skips_missing_wsc_style(tmp_path):
    def gone(url):
        raise OSError("404-ish")

    out = fetch.fetch_to_landing(
        ["https://x/YT_10AA001.csv"],
        str(tmp_path),
        required=False,
        retries=2,
        backoff_seconds=0,
        opener=gone,
    )
    assert not out[0].ok and out[0].path is None and "404" in out[0].error
    assert list(tmp_path.iterdir()) == []  # nothing landed, nothing torn


def test_required_fetch_raises_provincial_style(tmp_path):
    def gone(url):
        raise OSError("down")

    with pytest.raises(Exception, match="required fetch failed"):
        fetch.fetch_to_landing(
            ["https://x/Stage.csv"],
            str(tmp_path),
            required=True,
            retries=2,
            backoff_seconds=0,
            opener=gone,
        )
