"""Landing-zone fetch glue for the HTTP ingest tier (reference S1-S3).

The engine reads landed files (``sources/wsc.py`` / ``provincial.py`` /
``datamart_source.py``); this module is the thin driver-side utility that
lands them, completing EP1 end-to-end.  Reference behavior being
reproduced (citations into /root/reference):

- ``download_WSC_data`` (``discharge_obs_pd.py:29-43``): date-templated
  DataMart base URL (strftime pattern, ``constants.py:2``) joined to a
  fixed file list; streamed chunked download; a non-200 response is
  SKIPPED, not fatal (the commented-out ``raise_for_status``).
- ``download_provincial_data`` (``discharge_obs_pd.py:74-84``): fixed URL
  list, streamed download, failures ARE fatal (``raise_for_status``).
- Local filename = last URL path segment (``fname.split("/")[-1]``).

Deliberately NOT distributed: fetching six small CSVs is driver-side work
(SURVEY.md §1.4); at fleet scale the landing zone is object storage fed by
a notification stream, and the engine's file-source streaming tier
(``streaming/ingest.py``) picks up from there.  The transport is stdlib
``urllib`` with an injectable ``opener`` so tests exercise retry/skip
logic against ``file://`` URLs — no network, no extra dependency.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path


@dataclass(frozen=True)
class FetchResult:
    url: str
    path: str | None  # None when skipped/failed
    ok: bool
    error: str | None = None


def datamart_urls(
    files: list[str],
    base_template: str,
    now: datetime | None = None,
) -> list[str]:
    """Date-templated DataMart URL list (``discharge_obs_pd.py:33-35``):
    the base is a strftime pattern (e.g. ``https://host/%Y%m%d/WXO-DD/``)
    expanded at call time and joined to each relative file path."""
    base = (now or datetime.now()).strftime(base_template)
    if not base.endswith("/"):
        base += "/"
    return [base + f.lstrip("/") for f in files]


def _default_opener(url: str):
    return urllib.request.urlopen(url, timeout=60)


def fetch_to_landing(
    urls: list[str],
    dest_dir: str,
    required: bool = False,
    retries: int = 3,
    backoff_seconds: float = 1.0,
    chunk_size: int = 8192,
    opener=None,
) -> list[FetchResult]:
    """Stream each URL to ``dest_dir/<last path segment>``.

    ``required=False`` is the WSC posture — an unavailable file is recorded
    and skipped (DataMart files appear on their own schedule);
    ``required=True`` is the provincial posture — after ``retries``
    attempts the error propagates.  Transient failures retry with linear
    backoff either way.  Writes go to a ``.part`` file renamed on success,
    so a torn download never looks landed to the pollers downstream.
    """
    opener = opener or _default_opener
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    results: list[FetchResult] = []
    for url in urls:
        name = url.rstrip("/").rsplit("/", 1)[-1]
        target = dest / name
        part = dest / (name + ".part")
        err: str | None = None
        ok = False
        for attempt in range(1, retries + 1):
            try:
                with opener(url) as r, open(part, "wb") as f:
                    while True:
                        chunk = r.read(chunk_size)
                        if not chunk:
                            break
                        f.write(chunk)
                part.rename(target)
                ok = True
                break
            except Exception as ex:  # noqa: BLE001 — recorded or re-raised below
                err = f"{type(ex).__name__}: {ex}"
                part.unlink(missing_ok=True)
                if attempt < retries:
                    time.sleep(backoff_seconds * attempt)
        if not ok and required:
            raise urllib.error.URLError(
                f"required fetch failed after {retries} attempts: {url} ({err})"
            )
        results.append(
            FetchResult(url, str(target) if ok else None, ok, None if ok else err)
        )
    return results
