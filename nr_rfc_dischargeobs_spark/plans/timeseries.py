"""Time-series statistics plans: the observation-analytics layer.

The reference stops at mean/last rollups (`dischargeobs_write_xl.py:337-389`);
an engine serving the same hydrometric data also needs the standard
station-series statistics downstream forecasters compute by hand today:
trailing moving averages, gap interpolation, volume integration (discharge
integrated over time IS volume), anomaly screening, completeness audits,
distribution histograms, and seasonality profiles.  Each plan:

- touches the events table once, shuffles once on the series key
  (``user_id``, the station analog) — per-key state is bounded by that key's
  history, so the shape survives a 100 TB scale-up;
- follows the integer-exact discipline (``functions/exact.py``): measurements
  aggregate as scaled BIGINTs (or DECIMAL(38,0)/HUGEINT where products
  overflow 2^63), divide once at the end — results are bit-identical across
  engines and AQE re-plans;
- time arithmetic stays in integer microseconds.

Notably the anomaly screen does *exact integer* 2-sigma classification:
``|v - mean| > 2*stddev_samp`` is equivalent to
``(n-1)*(n*v - s)^2 > 4*n*(n*ss - s^2)`` over integer sums — no
floating-point variance, so the flag can never flip on summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact
from ..functions.timeutil import ts_us
from . import load

# ONE source for the scaled-int SQL expression (functions/exact):
# a hand-maintained copy per plan file is exactly the drift the
# *_sql helpers exist to prevent
V100_SQL = exact.scaled_sql("value")
HOUR_US = 3_600 * 1_000_000
DEC = "decimal(38,0)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts"),
        ts_us(F.col("ts")).alias("ts_us"),
        exact.scaled(F.col("value")).alias("v100"),
    )


def moving_avg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour moving average per series — RANGE-framed window.

    A RANGE frame on integer microseconds (not ROWS) so the window is a true
    time interval regardless of sampling density.  One exchange on user_id;
    Spark evaluates sum and count in a single Window operator.
    """
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-HOUR_US, 0)
    )
    ma = F.sum("v100").over(w).cast("double") / 100 / F.count("v100").over(w)
    return ev.select(
        "event_id", "user_id", "ts_us", ma.alias("moving_avg_1h")
    )


MOVING_AVG_1H_SQL = f"""
SELECT event_id, user_id, ts_us,
       CAST(SUM(v100) OVER w AS DOUBLE) / 100 / COUNT(v100) OVER w
         AS moving_avg_1h
FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, {V100_SQL} AS v100
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW)
"""


def interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation on an hourly spine, per series.

    The hydrology classic: rollup to an hourly grid, then fill missing hours
    by time-weighted linear interpolation between the bracketing
    observations (the reference only forward-fills, W1 — interpolation is
    the upgrade its TODO comments ask about).  Plan shape: one aggregation
    to the hourly grid, a per-series ``sequence()`` spine (no crossJoin —
    each series generates only its own span), one left join, and two
    unbounded windows (prev/next carried observation) over the same sort —
    a single exchange on user_id.

    The interpolation arithmetic ``pv + (nv-pv) * (t-pt)/(nt-pt)`` runs on
    exact integers cast to double in the SAME operation order in both
    engines, so even the interpolated doubles compare bit-identical.
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        exact.rescale_ratio(F.sum("v100"), F.count("v100"), 1).alias("hv100")
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")
            ).alias("hr"),
        )
    )
    j = spine.join(hourly, ["user_id", "hr"], "left").withColumn(
        "hr_us", ts_us(F.col("hr"))
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("hr_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("hr_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_us = F.when(F.col("hv100").isNotNull(), F.col("hr_us"))
    pv = F.last("hv100", ignorenulls=True).over(wprev)
    pt = F.last(obs_us, ignorenulls=True).over(wprev)
    nv = F.first("hv100", ignorenulls=True).over(wnext)
    nt = F.first(obs_us, ignorenulls=True).over(wnext)
    interp = (
        pv.cast("double")
        + (nv - pv).cast("double")
        * ((F.col("hr_us") - pt).cast("double") / (nt - pt).cast("double"))
    ) / 100
    return j.select(
        "user_id",
        "hr",
        F.when(
            F.col("hv100").isNotNull(), F.col("hv100").cast("double") / 100
        )
        .otherwise(interp)
        .alias("value"),
        F.col("hv100").isNotNull().cast("int").alias("is_observed"),
    )


INTERPOLATE_HOURLY_SQL = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         CAST(ROUND(CAST(SUM({V100_SQL}) * 1 AS DOUBLE)
                    / COUNT({V100_SQL}), 0) AS BIGINT) AS hv100
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT user_id,
         UNNEST(generate_series(MIN(hr), MAX(hr), INTERVAL 1 HOUR)) AS hr
  FROM hourly GROUP BY user_id
), j AS (
  SELECT s.user_id, s.hr, epoch_us(s.hr) AS hr_us, h.hv100
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
), carried AS (
  SELECT *,
    LAST_VALUE(hv100 IGNORE NULLS) OVER wp AS pv,
    LAST_VALUE(CASE WHEN hv100 IS NOT NULL THEN hr_us END IGNORE NULLS)
      OVER wp AS pt,
    FIRST_VALUE(hv100 IGNORE NULLS) OVER wn AS nv,
    FIRST_VALUE(CASE WHEN hv100 IS NOT NULL THEN hr_us END IGNORE NULLS)
      OVER wn AS nt
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY hr_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY hr_us
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hr,
       CASE WHEN hv100 IS NOT NULL THEN CAST(hv100 AS DOUBLE) / 100
            ELSE (CAST(pv AS DOUBLE)
                  + CAST(nv - pv AS DOUBLE)
                    * (CAST(hr_us - pt AS DOUBLE)
                       / CAST(nt - pt AS DOUBLE))) / 100
       END AS value,
       CASE WHEN hv100 IS NOT NULL THEN 1 ELSE 0 END AS is_observed
FROM carried
"""


def trapezoid_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discharge→volume integration: trapezoidal rule per series.

    ``sum((v_i + v_{i-1}) * (t_i - t_{i-1})) / 2`` with scaled-integer
    values and integer-microsecond timestamps — every segment product is
    exact (DECIMAL(38,0) in Spark, HUGEINT in DuckDB; segment products
    reach ~1e16, past 2^53, so plain doubles would drift).  One window
    (lag) + one aggregation, both on user_id: a single exchange.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = (F.col("v100") + F.lag("v100").over(w)).cast(DEC) * (
        F.col("ts_us") - F.lag("ts_us").over(w)
    ).cast(DEC)
    return (
        ev.withColumn("seg", seg)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("seg").cast("double") / 200000000).alias("volume"),
        )
    )


TRAPEZOID_VOLUME_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, {V100_SQL} AS v100
  FROM events
), seg AS (
  SELECT user_id,
         CAST(v100 + LAG(v100) OVER w AS HUGEINT)
           * CAST(ts_us - LAG(ts_us) OVER w AS HUGEINT) AS s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(s) AS DOUBLE) / 200000000 AS volume
FROM seg GROUP BY user_id
"""


def zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series 2-sigma anomaly screen — exact integer classification.

    ``|v - mean| > 2 * stddev_samp`` rewritten over integer sums:
    ``(n-1)*(n*v - s)^2 > 4*n*(n*ss - s^2)`` — no floating-point mean or
    variance anywhere, so the anomaly flag is deterministic under any
    partitioning.  Plan: whole-partition window computes (n, s, ss) in one
    pass, then the groupBy reuses the same hash partitioning (no second
    exchange).
    """
    ev = _events(spark, sf_dir)
    wall = Window.partitionBy("user_id")
    n = F.count(F.lit(1)).over(wall)
    # widen BEFORE summing/multiplying — the cusum_drift discipline: a
    # BIGINT Σv100 overflows 2^63 near 1e10 rows/series (ANSI aborts the
    # job; non-ANSI silently flips flags) while the DuckDB oracle's
    # HUGEINT sum sails on — exactly the engine divergence DEC removes
    v = F.col("v100").cast(DEC)
    s = F.sum(v).over(wall)
    ss = F.sum(v * v).over(wall)
    dev = n.cast(DEC) * v - s
    lhs = (n - 1).cast(DEC) * (dev * dev)
    rhs = (F.lit(4) * n).cast(DEC) * (n.cast(DEC) * ss - s * s)
    return (
        ev.withColumn("is_anom", lhs > rhs)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact.avg_scaled("v100").alias("mean_value"),
            F.sum(
                F.when(F.col("is_anom"), 1).otherwise(0)
            ).alias("n_anomalies"),
        )
    )


ZSCORE_ANOMALY_SQL = f"""
WITH base AS (
  SELECT user_id, {V100_SQL} AS v100 FROM events
), stats AS (
  SELECT user_id, v100,
         COUNT(*) OVER w AS n,
         SUM(v100) OVER w AS s,
         SUM(v100 * v100) OVER w AS ss
  FROM base
  WINDOW w AS (PARTITION BY user_id)
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(v100) AS DOUBLE) / 100 / COUNT(v100) AS mean_value,
       CAST(SUM(CASE WHEN CAST(n - 1 AS HUGEINT)
                          * (CAST(n * v100 - s AS HUGEINT)
                             * CAST(n * v100 - s AS HUGEINT))
                     > CAST(4 * n AS HUGEINT)
                       * (CAST(n AS HUGEINT) * CAST(ss AS HUGEINT)
                          - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM stats GROUP BY user_id
"""


def completeness_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness audit: per (series, day), observed hours out of 24.

    The QC report the reference's abandoned ``qc_instantaneous_data`` stub
    (`discharge_obs_pd.py:228-235`) never became.  Pure groupBy — partial
    aggregation map-side, one exchange.
    """
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.countDistinct(F.hour(F.col("ts"))).alias("hours_present"),
        (
            F.countDistinct(F.hour(F.col("ts"))).cast("double") / 24
        ).alias("completeness"),
    )


COMPLETENESS_DAILY_SQL = """
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n_obs,
       COUNT(DISTINCT date_part('hour', ts)) AS hours_present,
       CAST(COUNT(DISTINCT date_part('hour', ts)) AS DOUBLE) / 24
         AS completeness
FROM events GROUP BY 1, 2
"""


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram (25 buckets of 20.00, last open-ended).

    Bucketing by integer division of the scaled value — exact bucket
    membership, no float boundary ambiguity.  A 25-row result from one
    map-side-combined aggregation: the distribution profile a 100 TB table
    yields for the cost of a scan.
    """
    ev = _events(spark, sf_dir)
    bucket = F.least(F.expr("v100 div 2000"), F.lit(24))
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.min("v100").cast("double") / 100).alias("lo"),
        (F.max("v100").cast("double") / 100).alias("hi"),
    )


VALUE_HISTOGRAM_SQL = f"""
SELECT LEAST({V100_SQL} // 2000, 24) AS bucket, COUNT(*) AS n,
       CAST(MIN({V100_SQL}) AS DOUBLE) / 100 AS lo,
       CAST(MAX({V100_SQL}) AS DOUBLE) / 100 AS hi
FROM events GROUP BY 1
"""


def dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: mean value by (ISO weekday × hour-of-day).

    The 7×24 fingerprint used to spot diurnal/weekly cycles.  Group keys are
    derived columns, so this is still one map-side-combined aggregation with
    a 168-row result.
    """
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        (F.weekday(F.col("ts")) + 1).alias("isodow"),
        F.hour(F.col("ts")).alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact.avg_scaled("v100").alias("avg_value"),
    )


DOW_HOUR_PROFILE_SQL = f"""
SELECT isodow(ts) AS isodow, date_part('hour', ts) AS hr, COUNT(*) AS n,
       {exact.avg_scaled_sql(V100_SQL)} AS avg_value
FROM events GROUP BY 1, 2
"""


def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value percentiles — exact interpolated quantiles on
    the scaled-integer grid.

    Exact ``percentile`` (sort-based) is the audit query; the fleet-scale
    twin is ``percentile_approx`` (t-digest sketch, mergeable across
    partitions) with this as its verification.  Quantile inputs are the
    v100 integers, so the only doubles are the two interpolation endpoints
    — identical in every engine.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", exact.scaled(F.col("value")).alias("v100")
    )
    x = F.col("v100").cast("double")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            (F.percentile(x, F.lit(q)) / 100).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.5, 0.9, 0.99)
        ],
    )


PERCENTILE_SUMMARY_SQL = f"""
SELECT event_type, COUNT(*) AS n,
       quantile_cont(CAST({V100_SQL} AS DOUBLE), 0.25) / 100 AS p25,
       quantile_cont(CAST({V100_SQL} AS DOUBLE), 0.5) / 100 AS p50,
       quantile_cont(CAST({V100_SQL} AS DOUBLE), 0.9) / 100 AS p90,
       quantile_cont(CAST({V100_SQL} AS DOUBLE), 0.99) / 100 AS p99
FROM events GROUP BY event_type
"""


def spike_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QC spike screen: flag observations that jump >2× AND >+5.00 over the
    previous observation of the same series.

    The range/rate-of-change check the reference's abandoned QC stub
    (`discharge_obs_pd.py:228-235`) implies but never implements — the
    standard first-pass hydrometric QC rule (sensor glitches read as
    sudden spikes; real freshets rise fast but not 2× in one sample).
    Pure integer comparisons on the scaled values: no float thresholds, no
    boundary ambiguity.  One lag window = one exchange on the series key.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pv = F.lag("v100").over(w)
    return (
        ev.withColumn("pv100", pv)
        .filter(
            F.col("pv100").isNotNull()
            & (F.col("v100") > 2 * F.col("pv100"))
            & (F.col("v100") - F.col("pv100") > 500)
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            (F.col("v100").cast("double") / 100).alias("value"),
            (F.col("pv100").cast("double") / 100).alias("prev_value"),
        )
    )


SPIKE_FLAGS_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, {V100_SQL} AS v100
  FROM events
), lagged AS (
  SELECT *, LAG(v100) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) AS pv100
  FROM base
)
SELECT event_id, user_id, ts_us,
       CAST(v100 AS DOUBLE) / 100 AS value,
       CAST(pv100 AS DOUBLE) / 100 AS prev_value
FROM lagged
WHERE pv100 IS NOT NULL AND v100 > 2 * pv100 AND v100 - pv100 > 500
"""


def deseasonalized_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly: each event against its (weekday ×
    hour-of-day) profile mean — the de-trended residual every operational
    anomaly monitor starts from (the raw-value z-score flags rush-hour as
    anomalous; this one doesn't).

    The 168-row profile aggregates map-side and broadcasts back onto the
    event scan, so the plan is one combine-friendly aggregation plus a
    broadcast join — no event-table shuffle.  Expected values divide exact
    integer sums in the same order as the oracle; residual = value −
    expected over identical doubles.
    """
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        (F.weekday(F.col("ts")) + 1).alias("isodow"),
        F.hour(F.col("ts")).alias("hr"),
        "v100",
    )
    profile = ev.groupBy("isodow", "hr").agg(
        exact.avg_scaled("v100").alias("expected")
    )
    return ev.join(F.broadcast(profile), ["isodow", "hr"]).select(
        "event_id",
        "user_id",
        "isodow",
        "hr",
        (F.col("v100").cast("double") / 100).alias("value"),
        "expected",
        (
            F.col("v100").cast("double") / 100 - F.col("expected")
        ).alias("residual"),
    )


DESEASONALIZED_RESIDUALS_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, isodow(ts) AS isodow,
         date_part('hour', ts) AS hr, {V100_SQL} AS v100
  FROM events
), profile AS (
  SELECT isodow, hr, {exact.avg_scaled_sql("v100")} AS expected
  FROM ev GROUP BY 1, 2
)
SELECT event_id, user_id, isodow, hr,
       CAST(v100 AS DOUBLE) / 100 AS value,
       expected,
       CAST(v100 AS DOUBLE) / 100 - expected AS residual
FROM ev JOIN profile USING (isodow, hr)
"""


def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift tracking per series: the running sum of deviations from
    the series mean — the classic level-shift detector (a flat series
    hovers near 0; a step change ramps the statistic linearly).

    Exact to the last bit: the deviation is kept as the INTEGER
    ``n·v100 − Σv100`` (scaled by n to avoid a fractional mean), its
    running sum stays integer, and ONE division at the end rescales.  Both
    window frames partition on user_id, so Spark plans a single exchange
    + sort for the whole query.  The accumulator follows the module's
    DECIMAL(38,0)/HUGEINT discipline (like trapezoid volume): ``n·v100``
    would pass 2^63 around 10⁸ events/series at this value scale, where
    non-ANSI Spark wraps SILENTLY while DuckDB raises — the widened type
    removes that divergence outright.
    """
    ev = _events(spark, sf_dir)
    wseries = Window.partitionBy("user_id")
    worder = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(wseries)
    total = F.sum("v100").over(wseries)
    dev_scaled = F.col("v100").cast(DEC) * n - total
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        (
            F.sum(dev_scaled).over(worder).cast("double") / 100 / n
        ).alias("cusum"),
    )


CUSUM_DRIFT_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, {V100_SQL} AS v100
  FROM events
), st AS (
  SELECT event_id, user_id, ts_us,
         CAST(v100 AS HUGEINT) * COUNT(*) OVER w
           - SUM(v100) OVER w AS dev_scaled,
         COUNT(*) OVER w AS n
  FROM ev
  WINDOW w AS (PARTITION BY user_id)
)
SELECT event_id, user_id, ts_us,
       CAST(SUM(dev_scaled) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100 / n AS cusum
FROM st
"""
