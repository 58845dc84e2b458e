"""Relational core plans (scan / filter / join / aggregate) on the TPC-H-ish
driver tables.

These exercise the engine's relational spine — the same scan→filter→join→agg
shapes the hydrology pipeline uses (SURVEY.md §3), expressed declaratively so
Catalyst handles pushdown, pruning, join selection, and AQE handles runtime
re-planning.

Money/quantity aggregates follow the integer-exact discipline
(``functions/exact.py``): scale 2-decimal doubles to BIGINT, sum exactly,
divide once — results are bit-identical across engines, shuffle layouts, and
AQE re-plans, with no output rounding needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exact
from . import load


def _scaled_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
        exact.scaled(F.col("l_quantity")).alias("q100"),
        exact.scaled(F.col("l_extendedprice")).alias("p100"),
        exact.scaled(F.col("l_discount")).alias("d100"),
        exact.scaled(F.col("l_tax")).alias("t100"),
    )


def _rev():
    """Revenue in scaled-integer space: p100 * (100 - d100), exact BIGINT.
    (A function because Columns can't be built before the session exists.)"""
    return F.col("p100") * (F.lit(100) - F.col("d100"))


_REV_SQL = (
    "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Scan → filter → groupBy → multi-agg.  The shipdate predicate and column
    projection push down to the parquet scan; the shuffle key has ~6 distinct
    values so map-side partial aggregation does nearly all the reduction —
    at 100 TB this plan moves a few KB per task through the shuffle.
    """
    charge = _rev() * (F.lit(100) + F.col("t100"))
    n = F.count(F.lit(1))
    return (
        _scaled_lineitem(spark, sf_dir)
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact.sum_scaled("q100").alias("sum_qty"),
            exact.sum_scaled("p100").alias("sum_base_price"),
            exact.sum_scaled(_rev(), 10000).alias("sum_disc_price"),
            exact.sum_scaled(charge, 1000000).alias("sum_charge"),
            (exact.sum_scaled("q100") / n).alias("avg_qty"),
            (exact.sum_scaled("p100") / n).alias("avg_price"),
            (exact.sum_scaled("d100") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
  CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000 AS sum_disc_price,
  CAST(SUM({_REV_SQL} * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT))) AS DOUBLE) / 1000000 AS sum_charge,
  CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_price,
  CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + group + top-N revenue.

    customer is tiny relative to orders/lineitem → broadcast hint keeps that
    join shuffle-free; orders⋈lineitem shuffles on orderkey once and the
    groupBy on (l_orderkey, ...) reuses that partitioning.
    """
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    lineitem = _scaled_lineitem(spark, sf_dir).filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact.sum_scaled(_rev(), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate, the canonical pushdown
    probe.  All three predicates and the two-column projection reach the
    parquet reader (``PushedFilters`` in the explain), so at 100 TB the scan
    skips row groups by min/max stats and moves only two columns; the single
    global sum is a map-side partial + one-row final merge.
    """
    li = _scaled_lineitem(spark, sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("d100") >= 5)
            & (F.col("d100") <= 7)
            & (F.col("q100") < 2400)
        )
        .agg(
            exact.sum_scaled(
                F.col("p100") * F.col("d100"), 10000
            ).alias("revenue")
        )
    )


FORECAST_REVENUE_SQL = """
SELECT
  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 10000
    AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) < 2400
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 5-way star join (region→nation→customer/supplier) +
    revenue by nation.  Dimensions broadcast; only orders⋈lineitem is a real
    shuffle, so the plan is one big-table pass at any scale.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    lineitem = _scaled_lineitem(spark, sf_dir)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(exact.sum_scaled(_rev(), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT
  n_name,
  CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promotion revenue share for one ship month.

    lineitem filters to one month at the scan (pushed), part broadcasts,
    and the conditional-vs-total revenue ratio is two exact integer sums
    and a single double division — a one-pass, one-broadcast plan.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    ).select(
        "l_partkey",
        (
            exact.scaled(F.col("l_extendedprice"))
            * (F.lit(100) - exact.scaled(F.col("l_discount")))
        ).alias("rev"),
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")))
    return joined.agg(
        (100.0 * promo.cast("double") / F.sum("rev")).alias("promo_revenue")
    )


PROMO_REVENUE_SQL = f"""
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} END) AS DOUBLE)
        / SUM({_REV_SQL}) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate < TIMESTAMP '1995-10-01'
"""


def large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: customers with orders above a quantity threshold.

    The HAVING subquery is a self-contained aggregation of lineitem whose
    qualifying keys semi-join back — Spark plans it as one lineitem pass
    for the aggregate plus a shuffle-reusing join; customer broadcasts.
    Ordering is fully tie-broken for deterministic top-100.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", exact.scaled(F.col("l_quantity")).alias("q100")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("q100").alias("sum_q100"))
        .filter(F.col("sum_q100") > 180 * 100)
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("sum_q100").cast("double") / 100).alias("sum_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


LARGE_VOLUME_CUSTOMER_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS sum_q100
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) > 18000
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_q100 AS DOUBLE) / 100 AS sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""
