"""Time-series / analytics plans beyond the reference's own surface.

The reference aligns series by rounding timestamps to a grid and equi-joining
(SURVEY.md §2.3 note), but a general engine for observation data also needs
the shapes the reference *avoids* by that trick: as-of alignment, range
(interval) joins, gap-based sessionization, ranked top-k per key, and
subtotal rollups.  Each is expressed so the heavy table is touched once and
the plan survives a 100 TB scale-up:

- window functions partition by ``user_id`` (station analog) — state per key
  is bounded by that key's history, never the global table;
- the as-of join is the union+ordered-window formulation (one shuffle on the
  partition key, no per-row subquery, no broadcast of the big side);
- the range join is binned: candidate pairs come from an equi-join on
  (key, hour bucket), so the join never degenerates to a cross product.

Values follow the integer-exact discipline (``functions/exact.py``); time
arithmetic stays in integer microseconds (``unix_micros`` / ``epoch_us``) so
durations and gap comparisons are exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact
from ..functions.timeutil import ts_us, ts_us_sql
from . import load

# ONE source for the scaled-int SQL expression (functions/exact):
# a hand-maintained copy per plan file is exactly the drift the
# *_sql helpers exist to prevent
V100_SQL = exact.scaled_sql("value")


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per station by value — ranked window (row_number).

    Fully tie-broken ordering (value desc, ts, event_id) makes the pick
    deterministic.  One shuffle on user_id; with ~constant rows per key the
    per-partition sort is bounded, and at 100 TB a pre-aggregated
    ``filter(rank <= k)`` pushes no data around beyond that single exchange.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", exact.scaled(F.col("value")).alias("v100")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("v100").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "user_id",
            "rnk",
            "event_id",
            (F.col("v100").cast("double") / 100).alias("value"),
        )
    )


TOPK_PER_GROUP_SQL = f"""
SELECT user_id, rnk, event_id, CAST(v100 AS DOUBLE) / 100 AS value
FROM (
  SELECT user_id, event_id, {V100_SQL} AS v100,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY {V100_SQL} DESC, ts ASC, event_id ASC)
           AS rnk
  FROM events
) t
WHERE rnk <= 3
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-minute silence starts a new session.

    The classic lag→flag→cumulative-sum formulation — two windows over the
    same (user_id, ts) ordering, so Spark plans ONE exchange + one sort and
    evaluates both frames in a single Window operator.  Durations are exact
    integer microseconds.  This is the batch twin of a streaming session
    window (``session_window`` in Structured Streaming).
    """
    gap_us = 30 * 60 * 1_000_000
    ev = load(spark, sf_dir, "events").select(
        "user_id", ts_us(F.col("ts")).alias("ts_us"), "event_id"
    )
    order = [F.col("ts_us").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_session = (
        F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(gap_us)
    ).cast("int")
    return (
        ev.withColumn("new_s", F.coalesce(new_session, F.lit(1)))
        .withColumn("session_no", F.sum("new_s").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1
              WHEN LAG(epoch_us(ts)) OVER w IS NULL THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), numbered AS (
  SELECT user_id, ts_us,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) - MIN(ts_us) AS duration_us
FROM numbered
GROUP BY user_id, session_no
"""


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the latest at-or-before view's value.

    Union-and-window formulation instead of a per-row subquery: tag both
    event streams, sort each station's rows by (ts, kind, event_id) with
    views ordering before a same-microsecond purchase, carry the last
    non-null view value forward, keep the purchases.  One shuffle on
    user_id regardless of table size — the standard scalable as-of plan
    (Spark has no native ASOF; DuckDB's ASOF JOIN is the oracle's sugar,
    spelled out below with the identical tie rule).
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        ts_us(F.col("ts")).alias("ts_us"),
        "event_type",
        F.when(
            F.col("event_type") == "view", exact.scaled(F.col("value"))
        ).alias("view_v100"),
        exact.scaled(F.col("value")).alias("v100"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts_us").asc(),
            F.when(F.col("event_type") == "view", 0).otherwise(1).asc(),
            F.col("event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_view_value",
            (F.last("view_v100", ignorenulls=True).over(w).cast("double") / 100),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts_us",
            (F.col("v100").cast("double") / 100).alias("purchase_value"),
            "last_view_value",
        )
    )


ASOF_JOIN_SQL = f"""
WITH u AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
         CASE WHEN event_type = 'view' THEN {V100_SQL} END AS view_v100,
         {V100_SQL} AS v100
  FROM events
  WHERE event_type IN ('view', 'purchase')
), carried AS (
  SELECT *,
         CAST(LAST_VALUE(view_v100 IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts_us,
                    CASE WHEN event_type = 'view' THEN 0 ELSE 1 END,
                    event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS DOUBLE) / 100 AS last_view_value
  FROM u
)
SELECT event_id, user_id, ts_us,
       CAST(v100 AS DOUBLE) / 100 AS purchase_value,
       last_view_value
FROM carried
WHERE event_type = 'purchase'
"""


def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join, binned: clicks in the hour before each purchase.

    A naive ``t1.ts BETWEEN t2.ts - 1h AND t2.ts`` join is a cross product
    per key; the scale-safe plan bins clicks to hour buckets and explodes
    each purchase to its two candidate buckets, turning the range join into
    an equi-join on (user_id, bucket) + a residual filter — candidate pairs
    are bounded by per-bucket density, not by table size.  The left join +
    conditional count keeps zero-click purchases.
    """
    hour_us = 3_600 * 1_000_000
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        ts_us(F.col("ts")).alias("c_ts_us"),
        # integer `div`, not float division: exact bucket membership, and
        # the two probe buckets below are then distinct BY CONSTRUCTION
        F.expr(f"{ts_us_sql('ts')} div {hour_us}").alias("bucket"),
    )
    p_bucket = F.expr(f"p_ts_us div {hour_us}")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", ts_us(F.col("ts")).alias("p_ts_us")
        )
        .withColumn(
            "bucket", F.explode(F.array(p_bucket - 1, p_bucket))
        )
    )
    hit = (F.col("c_ts_us") >= F.col("p_ts_us") - hour_us) & (
        F.col("c_ts_us") < F.col("p_ts_us")
    )
    return (
        purchases.join(
            clicks,
            (purchases.user_id == clicks.c_user)
            & (purchases.bucket == clicks.bucket),
            "left",
        )
        .groupBy("event_id", "user_id", "p_ts_us")
        .agg(F.count(F.when(hit, 1)).alias("n_clicks_prev_hour"))
    )


RANGE_JOIN_BINNED_SQL = """
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_ts_us,
       (SELECT COUNT(*) FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
          AND epoch_us(c.ts) < epoch_us(p.ts)) AS n_clicks_prev_hour
FROM events p
WHERE p.event_type = 'purchase'
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase per user, one summary row.

    Step timestamps are nested conditional minima over the SAME user
    partition — three whole-partition windows but one exchange and one
    sort; the per-user frame then reduces to global step counts.  No
    self-joins: at 100 TB the events table is touched once.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_us(F.col("ts")).alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w)
    stepped = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1")),
            F.col("ts_us"),
        )
    ).over(w)
    stepped = stepped.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("t2")),
            F.col("ts_us"),
        )
    ).over(w)
    stepped = stepped.withColumn("t3", t3)
    per_user = stepped.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


FUNNEL_CONVERSION_SQL = """
WITH stepped AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER w AS t1,
         epoch_us(ts) AS ts_us, event_type
  FROM events
  WINDOW w AS (PARTITION BY user_id)
), s2 AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
           OVER (PARTITION BY user_id) AS t2
  FROM stepped
), s3 AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2
), per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t1) AS n_viewed,
       COUNT(t2) AS n_clicked_after_view,
       COUNT(t3) AS n_purchased_after_click
FROM per_user
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week, counted
    in each later week they return (offset in weeks from the cohort week).

    Two aggregations on the user key (first-week, then distinct activity
    weeks) and one broadcastable join of per-user cohorts back onto the
    per-user-week activity — cohort tables are O(users), never O(events).
    Week arithmetic is integer: epoch_us div one-week-in-µs, so cohort and
    offset are engine-exact.
    """
    week_us = 7 * 24 * 3_600 * 1_000_000
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr(f"{ts_us_sql('ts')} div {week_us}").alias("week")
    )
    weeks = ev.distinct()
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort", (F.col("week") - F.col("cohort")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


RETENTION_COHORTS_SQL = """
WITH weeks AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
), cohorts AS (
  SELECT user_id, MIN(week) AS cohort FROM weeks GROUP BY user_id
)
SELECT c.cohort, w.week - c.cohort AS week_offset,
       COUNT(DISTINCT w.user_id) AS n_active
FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY 1, 2
"""


def rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over documents: (lang, source), (lang), ().

    Subtotal rows come from Spark's native ``rollup`` — one shuffle computes
    all three grouping sets via partial-aggregate expansion, the same way
    a 100 TB facet dashboard would want it (no three separate scans).
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


ROLLUP_SUBTOTALS_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP (lang, source)
"""
