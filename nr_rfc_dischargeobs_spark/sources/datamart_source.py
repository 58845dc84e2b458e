"""WSC DataMart as a PySpark Python data source (S1's scale path).

The reference ingests DataMart by looping over six hardcoded URLs with
``requests`` and writing local files (``discharge_obs_pd.py:29-43``,
``constants.py:2-9``).  That driver-side loop caps ingest at one machine and
one thread per file.  This module is the engine-native replacement: a
PySpark 4 **Python data source** (`pyspark.sql.datasource`) where

- each source file (local path or http(s) URL) becomes one
  ``InputPartition`` — executors fetch and parse in parallel, and adding
  feeds scales the scan instead of the driver loop;
- the reader emits Arrow ``RecordBatch``es, so rows cross the
  Python→JVM boundary columnar, not row-at-a-time;
- positional column selection (0 = ID, 1 = Date, 2 = stage, 6 = discharge —
  the reference's `discharge_obs_pd.py:152-153` contract) happens at parse
  time, so the emitted schema is already the F1 shape
  ``sources/wsc.conform_wsc`` consumes unchanged.

Usage::

    spark.dataSource.register(WscDataMartDataSource)
    raw = (spark.read.format("wsc_datamart")
                .option("paths", "/landing/*.csv").load())
    obs = conform_wsc(raw)

Network fetch uses stdlib ``urllib`` (no extra deps) and is exercised only
when a path is an URL; local files cover tests.
"""

from __future__ import annotations

import csv
import glob
import io
from collections.abc import Iterator, Sequence

import pyarrow as pa
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ARROW_SCHEMA = pa.schema(
    [
        ("ID", pa.string()),
        ("Date", pa.string()),
        ("water_level_m", pa.float64()),
        ("discharge_cms", pa.float64()),
    ]
)

# positional contract from discharge_obs_pd.py:152-153
COL_ID, COL_DATE, COL_H, COL_Q = 0, 1, 2, 6
BATCH_ROWS = 65536


def _expand(paths_opt: str) -> list[str]:
    out: list[str] = []
    for token in paths_opt.split(","):
        token = token.strip()
        if not token:
            continue
        if token.startswith(("http://", "https://")):
            out.append(token)
        else:
            out.extend(sorted(glob.glob(token)) or [token])
    return out


def _open_lines(path: str) -> Iterator[str]:
    if path.startswith(("http://", "https://")):
        from urllib.request import urlopen  # stdlib; executor-side

        with urlopen(path) as resp:  # noqa: S310 — source URL is operator config
            yield from io.TextIOWrapper(resp, encoding="utf-8")
    else:
        with open(path, encoding="utf-8") as fh:
            yield from fh


def _to_float(s: str) -> float | None:
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WscDataMartReader(DataSourceReader):
    def __init__(self, options: dict):
        paths_opt = options.get("paths")
        if not paths_opt:
            raise ValueError("wsc_datamart requires the 'paths' option")
        self._paths = _expand(paths_opt)

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition) -> Iterator[pa.RecordBatch]:
        ids: list[str] = []
        dates: list[str] = []
        levels: list[float | None] = []
        flows: list[float | None] = []
        reader = csv.reader(_open_lines(partition.path))
        header_skipped = False
        for row in reader:
            if not header_skipped:
                header_skipped = True
                continue
            if len(row) <= COL_Q:
                continue  # short/dirty line — reference's read_csv drops too
            ids.append(row[COL_ID].strip())
            dates.append(row[COL_DATE].strip())
            levels.append(_to_float(row[COL_H]))
            flows.append(_to_float(row[COL_Q]))
            if len(ids) >= BATCH_ROWS:
                yield _batch(ids, dates, levels, flows)
                ids, dates, levels, flows = [], [], [], []
        if ids:
            yield _batch(ids, dates, levels, flows)


def _batch(ids, dates, levels, flows) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(dates, pa.string()),
            pa.array(levels, pa.float64()),
            pa.array(flows, pa.float64()),
        ],
        schema=ARROW_SCHEMA,
    )


class WscDataMartDataSource(DataSource):
    """``spark.read.format("wsc_datamart")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "wsc_datamart"

    def schema(self) -> str:
        return (
            "ID string, Date string, water_level_m double, "
            "discharge_cms double"
        )

    def reader(self, schema) -> WscDataMartReader:
        return WscDataMartReader(self.options)
