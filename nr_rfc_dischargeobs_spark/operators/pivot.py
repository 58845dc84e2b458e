"""Long ↔ wide conversion — the reference's single most common operator
(SURVEY.md §1.1).

- A5 pivot long→wide: ``discharge_obs_pd.py:110,152-153``.
- A6 unstack (MultiIndex→wide): ``discharge_obs_pd.py:63-65``,
  ``ECCC_hourly.py:120-121``.
- melt wide→long: the inverse, used when re-importing wide Excel sheets
  (``discharge_obs_pd.py:114-127``).

The engine keeps **long** as the canonical layout (new stations are new
rows, not schema evolution — SURVEY.md §1.3) and widens only at export
edges.  ``pivot`` with an explicit value list avoids the extra distinct-scan
Spark otherwise runs to discover pivot columns — always pass ``values`` in
production plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: str | Sequence[str],
    key: str,
    value: str,
    values: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Long → wide: one row per ``index``, one column per ``key`` value.

    ``agg='first'`` reproduces pandas ``pivot`` (which *errors* on duplicate
    keys — dedup first, as the reference does: A4 before A5).  Pass
    ``values`` explicitly to skip the discovery scan and pin column order.
    """
    index_cols = [index] if isinstance(index, str) else list(index)
    gb = df.groupBy(*index_cols)
    piv = gb.pivot(key, list(values)) if values is not None else gb.pivot(key)
    agg_col = {
        "first": F.first(F.col(value), ignorenulls=True),
        "sum": F.sum(value),
        "avg": F.avg(value),
        "max": F.max(value),
        "last": F.last(F.col(value), ignorenulls=True),
    }[agg]
    return piv.agg(agg_col)


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long via the native ``unpivot`` (Spark 3.4+) — a generated
    expression, not a UDF, so it stays in codegen and never shuffles."""
    return df.unpivot(
        list(id_vars), list(value_vars), var_name, value_name
    )
