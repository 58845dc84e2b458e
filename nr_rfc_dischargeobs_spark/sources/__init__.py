"""Source tier: conformers that turn each upstream feed (WSC, provincial,
USGS, SWOB — FIXTURES.md F1-F4) into the canonical long observation table
(F7), plus the hive-partitioned parquet store (S9/S10/J3).

Each conformer is a pure DataFrame transformation with an explicit input
schema (``schemas.py``).  The fetch tier has two shapes: a thin driver-side
script writing a landing zone (the reference's model), or the engine-native
``wsc_datamart`` Python data source (``datamart_source.py``) where executors
fetch/parse source files in parallel (SURVEY.md §2.1 S1).
"""

from . import nwis
from .datamart_source import WscDataMartDataSource
from .provincial import conform_provincial
from .store import ObservationStore
from .swob import conform_swob
from .usgs import conform_usgs
from .wsc import conform_wsc

__all__ = [
    "ObservationStore",
    "WscDataMartDataSource",
    "conform_provincial",
    "conform_swob",
    "conform_usgs",
    "conform_wsc",
    "nwis",
]
