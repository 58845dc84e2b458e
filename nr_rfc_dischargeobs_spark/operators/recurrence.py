"""A2 — the rising/falling hourly rule, the engine's one genuine recurrence.

Reference (``dischargeobs_write_xl.py:108-129``): the hourly stage value is
the hourly MAX while the river is rising, and the LAST-in-hour observation
while it is falling.  Implemented there as a sequential loop:

    hrly_val = hrly_max            # ALIAS, not a copy (:123)
    for i in 1..n:
        if hrly_max[i] <= hrly_val[i-1]:   # reads the REWRITTEN prior value
            hrly_val[i] = hrly_last[i]

Because ``hrly_val`` aliases ``hrly_max``, the comparison at step i sees the
already-overwritten value at i-1 — a true recurrence (output depends on prior
output), not expressible as a window function.  We reproduce it exactly,
alias semantics included, as a grouped-map Pandas UDF: partition by station,
order by hour inside the group.  Each group is one station's hours (a year ≈
8.8k rows — trivially in-memory), and groups run in parallel across
executors, so the operator scales with station count, not history length.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


RESULT_SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("hour", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def rising_falling(
    hourly: DataFrame,
    key: str = "station_id",
    hour: str = "hour",
    hrly_max: str = "hrly_max",
    hrly_last: str = "hrly_last",
) -> DataFrame:
    """Apply the rising/falling rule per station.

    Input: one row per (key, hour) with the hour's max and last observation
    (produce with ``groupBy(key, date_trunc('hour', ts)).agg(max, max_by)``).
    Output: (station_id, hour, value).

    Executed as hash-repartition on station + ONE ``mapInPandas`` call per
    partition with a pandas groupby inside, not ``applyInPandas`` per
    station: station groups are tiny (a year ≈ 8.8k hourly rows) and
    per-group Arrow dispatch dominates — batching ~N/shuffle-partitions
    stations per Python call amortizes it ~50× while keeping the identical
    per-station recurrence.  A partition holds (total hourly rows /
    ``spark.sql.shuffle.partitions``) rows — size that knob for the fleet,
    as with any shuffle.
    """
    prepared = hourly.select(
        F.col(key).cast("string").alias("station_id"),
        F.col(hour).alias("hour"),
        F.col(hrly_max).cast("double").alias("hrly_max"),
        F.col(hrly_last).cast("double").alias("hrly_last"),
    )

    def run_partition(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if not len(pdf):
            return
        # one sorted pass with station-boundary resets instead of a pandas
        # groupby: building ~|stations| per-group frames costs more than
        # the recurrence itself
        pdf = pdf.sort_values(["station_id", "hour"], ignore_index=True)
        station = pdf["station_id"].to_numpy()
        vals = pdf["hrly_max"].to_numpy(copy=True)
        maxs = pdf["hrly_max"].to_numpy()
        last = pdf["hrly_last"].to_numpy()
        for i in range(1, len(vals)):
            if station[i] == station[i - 1] and maxs[i] <= vals[i - 1]:
                vals[i] = last[i]
        yield pd.DataFrame(
            {"station_id": station, "hour": pdf["hour"], "value": vals}
        )

    return prepared.repartition("station_id").mapInPandas(
        run_partition, schema=RESULT_SCHEMA
    )


def rising_falling_python(
    maxs: list[float | None], lasts: list[float | None]
) -> list[float | None]:
    """Straight-Python port of the reference loop (test oracle only)."""
    vals = list(maxs)
    for i in range(1, len(vals)):
        a, b = vals[i], vals[i - 1]
        if a is not None and b is not None and a <= b:
            vals[i] = lasts[i]
    return vals
