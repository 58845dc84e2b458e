"""The engine's single timestamp-type contract.

Every plan that does epoch arithmetic on a timestamp column goes through
these helpers instead of calling ``unix_micros`` / ``cast('double')``
directly.  Why: parquet writers legitimately encode the same instants three
ways — TIMESTAMP (LTZ), TIMESTAMP_NTZ (``isAdjustedToUTC=false``, what
tz-naive pandas data produces — the reference's own data is naive,
``discharge_obs_pd.py:66-67``), and legacy TIMESTAMP(NANOS)-as-long — and
``unix_micros`` / numeric casts reject NTZ outright at analysis time.  The
round-2 testdata re-encode broke 14 plans exactly this way; centralizing the
normalizing cast here means an encoding shift is absorbed in one place.

The normalizing ``cast(ts as timestamp)`` is:
- a no-op Catalyst eliminates when the input is already TIMESTAMP (plan
  shapes unchanged — these helpers stay inside whole-stage codegen);
- value-identical for NTZ under this engine's pinned-UTC sessions
  (``plans/__init__.py::load`` / ``session.py``): naive wall-clock == UTC
  instant, and DuckDB's ``epoch_us`` oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_instant(c: Column) -> Column:
    """Normalize any timestamp flavor to session-TZ TIMESTAMP (LTZ)."""
    return c.cast("timestamp")


def ts_us(c: Column) -> Column:
    """Exact integer microseconds since the epoch (BIGINT)."""
    return F.unix_micros(as_instant(c))


def ts_seconds(c: Column) -> Column:
    """Fractional epoch seconds as DOUBLE — microsecond-exact (epoch
    micros stay under 2^53, so the double representation is lossless)."""
    return as_instant(c).cast("double")


def ts_us_sql(expr: str) -> str:
    """SQL-string twin of :func:`ts_us` for ``F.expr`` call sites that
    need integer ``div`` semantics (no Column-level integer division)."""
    return f"unix_micros(cast({expr} as timestamp))"
