"""Excel / per-station CSV export edge adapters (reference S7/S11-S13).

Excel is a driver-side edge: model-input workbooks are a few thousand rows
(``dischargeobs_write_xl.py:75-77,212-250``), so the pattern is
Spark-computes → ``toPandas`` → writer.  Everything distributed (scaffold,
decorations, NaN→blank) happens in Spark *before* the edge; the pandas hop
moves only the final small frame.

The xlsx/xls writers themselves are gated on their libraries (openpyxl /
xlwt are not in this container): ``write_sheet`` falls back to CSV with a
clear marker so pipelines stay runnable end-to-end.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_frame(wide: DataFrame, order_by: list[str]) -> "pandas.DataFrame":  # noqa: F821
    """Deterministically ordered driver-side frame for a workbook sheet,
    with the reference's NaN→blank convention
    (``dischargeobs_write_xl.py:229-232``) applied to float columns."""
    pdf = wide.orderBy(*order_by).toPandas()
    return pdf.fillna("")


def write_sheet(
    wide: DataFrame,
    path: str,
    sheet_name: str,
    order_by: list[str],
) -> str:
    """S12/S13: write one sheet, replacing it if the workbook exists.
    Returns the path actually written (CSV fallback when no xlsx lib)."""
    pdf = export_frame(wide, order_by)
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(path, sheet_name=sheet_name, index=False)
        return path
    except ImportError:
        fallback = str(Path(path).with_suffix(f".{sheet_name}.csv"))
        pdf.to_csv(fallback, index=False)
        return fallback


def write_per_station_csv(
    obs: DataFrame, out_dir: str, station_col: str = "station_id"
) -> None:
    """S11 per-station CSV sink — ``partitionBy(station)`` so each station
    lands in its own directory, written in parallel (the reference loops
    stations serially, ``discharge_obs_pd.py:343-357``)."""
    (
        obs.repartition(F.col(station_col))
        .write.partitionBy(station_col)
        .mode("overwrite")
        .csv(out_dir, header=True)
    )
