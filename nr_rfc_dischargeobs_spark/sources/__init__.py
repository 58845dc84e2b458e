"""Source tier: conformers that turn each upstream feed (WSC, provincial,
USGS, SWOB — FIXTURES.md F1-F4) into the canonical long observation table
(F7), plus the hive-partitioned parquet store (S9/S10/J3).

Each conformer is a pure DataFrame transformation with an explicit input
schema (``schemas.py``); the driver-side HTTP/API download that produces the
landing files is out of engine scope (SURVEY.md §2.1 S1-S4: a thin fetch
script or a custom PySpark DataSource at scale).
"""

from .provincial import conform_provincial
from .store import ObservationStore
from .swob import conform_swob
from .usgs import conform_usgs
from .wsc import conform_wsc

__all__ = [
    "ObservationStore",
    "conform_provincial",
    "conform_swob",
    "conform_usgs",
    "conform_wsc",
]
