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


# --- wider relational spine ------------------------------------------------
# The driver tables are a simplified TPC-H (no partsupp, no commit/receipt
# dates, no shipmode/container/phone columns), so the classic queries that
# need those columns are re-cut to the available schema while keeping the
# PLAN SHAPE the query exists to exercise: existential semi-join (Q4),
# nation-pair theta filter (Q7), conditional market share (Q8), outer-join
# distribution (Q13), scalar-subquery max (Q15), disjunctive pushdown (Q19),
# exists + not-exists (Q21), anti-join with scalar threshold (Q22).


def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: order-priority count with EXISTS semi-join.

    The EXISTS subquery is a LEFT SEMI join on ``l_orderkey`` — Spark never
    materializes the duplicate-heavy right side, and at 100 TB the semi-join
    shuffles only the orderkey column of the flagged rows.  The final count
    groups on a 5-value key, so it's all map-side partial aggregation.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    flagged = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral trade volume between two nations by year.

    Both nation dims and both sides' key tables (supplier, customer)
    broadcast; lineitem⋈orders is the only shuffle.  The nation-pair
    disjunction is applied after the broadcasts — at scale the filter runs
    inside the same codegen stage as the joins, no extra pass.
    """
    li = _scaled_lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(exact.sum_scaled(_rev(), 10000).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


VOLUME_SHIPPING_SQL = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  EXTRACT(year FROM l_shipdate) AS l_year,
  CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one nation's share of a region's STANDARD-part market.

    Six-way join where everything except lineitem⋈orders broadcasts; the
    share is a conditional sum over the same exact-integer revenue, so the
    ratio is engine-reproducible.  Plan shape at 100 TB: one fact-table
    pass, five broadcast hash joins, two-row-per-year final aggregate.
    """
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            exact.scaled(F.col("l_extendedprice"))
            * (F.lit(100) - exact.scaled(F.col("l_discount")))
        ).alias("rev"),
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cnation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    snation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation_rev = F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("rev")))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cnation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (nation_rev.cast("double") / F.sum("rev")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = f"""
SELECT
  EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN {_REV_SQL} END) AS DOUBLE)
    / SUM({_REV_SQL}) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD'
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by returned-item revenue.

    lineitem filters on returnflag at the scan (pushed to parquet), joins
    orders on the shuffled key, then customer and nation broadcast.  The
    groupBy key includes the customer attributes so no second join is needed
    to decorate the winners; top-20 is a TakeOrdered, no global sort.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _scaled_lineitem(spark, sf_dir).filter(F.col("l_returnflag") == "R")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact.sum_scaled(_rev(), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


RETURNED_ITEM_REPORT_SQL = f"""
SELECT
  c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def line_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: high/low-priority line counts per line status.

    (The driver schema has no ``l_shipmode``; ``l_linestatus`` stands in as
    the grouping key — the shape under test is join + dual conditional
    count.)  Both counts come from one pass over the joined rows; the
    3-value group key keeps the shuffle a few bytes per task.
    """
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


LINE_PRIORITY_COUNTS_SQL = """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
       AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
       AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of order counts per customer.

    Left outer join keeps order-less customers (their count is 0), then a
    second aggregation histograms the counts.  Both shuffles are on
    high-cardinality keys that AQE coalesces; the histogram output is tiny.
    """
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) with the maximum quarterly revenue.

    The scalar subquery MAX is computed on the SCALED-INTEGER revenue and
    joined back by integer equality — exact, so Spark and the oracle agree
    on which supplier(s) tie for the max even when the double rendering
    would be within an ulp.  The one-row max broadcasts.
    """
    li = _scaled_lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("rev100"))
    max_rev = rev.agg(F.max("rev100").alias("max_rev100"))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), F.col("rev100") == F.col("max_rev100"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev100").cast("double") / 10000).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS rev100
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev100 AS DOUBLE) / 10000 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev100 = (SELECT MAX(rev100) FROM rev)
ORDER BY s_suppkey
"""


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under OR'd (brand, size, quantity) groups.

    The disjunction spans both tables, so Catalyst pushes the per-table
    residuals (brand/size to part, quantity bounds to lineitem) and
    evaluates the cross-table OR inside the broadcast-join stage — one
    lineitem pass regardless of how many predicate groups there are.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        exact.scaled(F.col("l_quantity")).alias("q100"),
        (
            exact.scaled(F.col("l_extendedprice"))
            * (F.lit(100) - exact.scaled(F.col("l_discount")))
        ).alias("rev"),
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    grp = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("q100").between(100, 1100)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("q100").between(1000, 2000)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("q100").between(2000, 3000)
        )
    )
    return joined.filter(grp).agg(
        exact.sum_scaled(F.col("rev"), 10000).alias("revenue")
    )


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) BETWEEN 100 AND 1100)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) BETWEEN 1000 AND 2000)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
       AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) BETWEEN 2000 AND 3000)
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: sole-blame suppliers on multi-supplier orders.

    (Re-cut to the driver schema: ``l_returnflag = 'R'`` stands in for the
    late-delivery predicate.)  EXISTS → LEFT SEMI, NOT EXISTS → LEFT ANTI,
    both equi-joined on ``l_orderkey`` with the ``suppkey <>`` residual
    evaluated inside the join — the shape Spark plans as two shuffle joins
    on the same key, so the exchange is reused between them.
    """
    f_orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        "l_returnflag",
    )
    has_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    sole_blame = has_other.join(
        l2.filter(F.col("l_returnflag") == "R"),
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_anti",
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_blame.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


WAITING_SUPPLIERS_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no urgent order.

    (Every customer in the driver data has ≥1 order, so the NOT EXISTS side
    is restricted to 1-URGENT orders to keep the anti-join discriminating.)
    The scalar average is the exact-integer mean (sum/100/count — identical
    op order in the oracle, so the threshold double is bit-equal and no
    boundary customer flips sides); it broadcasts as a one-row cross join.
    NOT EXISTS is a LEFT ANTI join against the filtered orders key column.
    """
    customer = load(spark, sf_dir, "customer")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .select(exact.scaled(F.col("c_acctbal")).alias("b100"))
        .agg(exact.avg_scaled("b100").alias("avg_bal"))
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact.sum_scaled(
                exact.scaled(F.col("c_acctbal"))
            ).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


IDLE_RICH_CUSTOMERS_SQL = f"""
SELECT
  c_mktsegment,
  COUNT(*) AS numcust,
  {exact.sum_scaled_sql(exact.scaled_sql('c_acctbal'))} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {exact.avg_scaled_sql(exact.scaled_sql('c_acctbal'))}
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: min-cost supplier per part (correlated-MIN subquery).

    The driver schema has no partsupp, so lineitem is the part↔supplier
    bridge: a (part, supplier) "offer" is the MIN scaled extendedprice over
    their lineitems.  Winners are the offers equal to the per-part minimum
    among EUROPE suppliers — the classic correlated scalar-min, planned as
    agg + self-join instead of a per-row subquery: one shuffle on
    (partkey, suppkey), then a partkey-partial reagg that reuses that
    partitioning, then a broadcast join of the tiny min table back.
    Dimension joins (region→nation→supplier, filtered part) all broadcast.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    supplier = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", exact.scaled(F.col("l_extendedprice")).alias("p100")
    )
    offers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("p100").alias("offer100"))
    )
    min_offer = offers.groupBy("p_partkey").agg(F.min("offer100").alias("min100"))
    return (
        offers.join(
            F.broadcast(min_offer.withColumnRenamed("p_partkey", "mp_partkey")),
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("offer100") == F.col("min100")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("offer100").cast("double") / 100).alias("offer"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


MIN_COST_SUPPLIER_SQL = f"""
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         MIN({exact.scaled_sql('l_extendedprice')}) AS offer100
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(offer100 AS DOUBLE) / 100 AS offer
FROM offers o
WHERE offer100 = (SELECT MIN(offer100) FROM offers i
                  WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation × order year.

    Cost is re-cut to ``p_retailprice * l_quantity`` (no partsupp supplycost
    in the driver schema); profit = disc revenue − cost, both exact scaled
    BIGINT at the same 10^4 factor so their difference sums exactly.  part
    (name-filtered), supplier, nation broadcast; the only real shuffle is
    lineitem⋈orders on orderkey, then a tiny (nation, year) final agg.
    """
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", exact.scaled(F.col("p_retailprice")).alias("rp100"))
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        exact.scaled(F.col("l_quantity")).alias("q100"),
        exact.scaled(F.col("l_extendedprice")).alias("p100"),
        exact.scaled(F.col("l_discount")).alias("d100"),
    )
    amount = _rev() - F.col("rp100") * F.col("q100")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(exact.sum_scaled(amount, 10000).alias("sum_profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


PRODUCT_TYPE_PROFIT_SQL = f"""
SELECT
  n_name,
  CAST(YEAR(o_orderdate) AS INT) AS o_year,
  CAST(SUM({_REV_SQL}
           - {exact.scaled_sql('p_retailprice')}
             * {exact.scaled_sql('l_quantity')}) AS DOUBLE) / 10000
    AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts holding an outsized share of one nation's
    shipped value (group-agg HAVING against a global scalar subquery).

    Value is re-cut to summed scaled extendedprice over NATION_7 suppliers'
    lineitems (no partsupp).  The global total is a one-row agg broadcast
    via crossJoin; the HAVING comparison stays in exact integer space
    (value*1000 > total) so no engine disagrees on boundary parts.  One
    shuffle on partkey; at 100 TB the nation filter (broadcast semi-join)
    cuts the scan's row volume ~25× before it.
    """
    supplier = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            exact.scaled(F.col("l_extendedprice")).alias("p100"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    by_part = li.groupBy("l_partkey").agg(F.sum("p100").alias("value100"))
    total = li.agg(F.sum("p100").alias("total100"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("value100") * 1000 > F.col("total100"))
        .select(
            "l_partkey", (F.col("value100").cast("double") / 100).alias("value")
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


IMPORTANT_STOCK_SQL = f"""
WITH nli AS (
  SELECT l_partkey, {exact.scaled_sql('l_extendedprice')} AS p100
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_7')
)
SELECT l_partkey, CAST(SUM(p100) AS DOUBLE) / 100 AS value
FROM nli
GROUP BY l_partkey
HAVING SUM(p100) * 1000 > (SELECT SUM(p100) FROM nli)
ORDER BY value DESC, l_partkey
"""


def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct supplier count per (brand, type, size),
    excluding disqualified suppliers (NOT IN anti-join).

    lineitem is the part↔supplier bridge; negative-balance suppliers play
    the "customer complaints" exclusion role.  part and the exclusion list
    broadcast; countDistinct(suppkey) shuffles once on the 3-part group key.
    """
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (~F.col("p_type").like("MEDIUM%"))
            & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


PARTS_SUPPLIER_RELATIONSHIP_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from small-quantity orders of one brand
    (correlated AVG subquery).

    The ``l_quantity < 0.2 * avg(l_quantity per part)`` predicate is kept in
    exact integers: ``5 * n * q100 < sum_q100`` — algebraically identical,
    division-free, so no boundary row flips between engines.  Planned as
    per-part agg + broadcast join-back (the filtered part set is small)
    rather than a per-row subquery; two passes over only the brand's rows.
    """
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            exact.scaled(F.col("l_quantity")).alias("q100"),
            exact.scaled(F.col("l_extendedprice")).alias("p100"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("q100").alias("sum_q100"), F.count(F.lit(1)).alias("n")
    )
    return (
        li.join(
            F.broadcast(per_part.withColumnRenamed("l_partkey", "pk")),
            F.col("l_partkey") == F.col("pk"),
        )
        .filter(F.lit(5) * F.col("n") * F.col("q100") < F.col("sum_q100"))
        .agg((F.sum("p100").cast("double") / 100 / 7.0).alias("avg_yearly"))
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
WITH bli AS (
  SELECT l_partkey, {exact.scaled_sql('l_quantity')} AS q100,
         {exact.scaled_sql('l_extendedprice')} AS p100
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_brand = 'Brand#23' AND p_type = 'SMALL')
), per_part AS (
  SELECT l_partkey AS pk, SUM(q100) AS sum_q100, COUNT(*) AS n
  FROM bli GROUP BY 1
)
SELECT CAST(SUM(p100) AS DOUBLE) / 100 / 7.0 AS avg_yearly
FROM bli JOIN per_part ON l_partkey = pk
WHERE 5 * n * q100 < sum_q100
"""


def excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers who shipped more than half of some red
    part's 1996 volume (nested-IN membership chain).

    Q20's availqty-vs-half-of-shipped test is re-cut to lineitem-only:
    qualify (part, supplier) pairs where 2 × pair volume > part's total 1996
    volume, then semi-join suppliers of NATION_3 against the qualifying
    supplier keys.  All set membership becomes semi-joins; the per-pair and
    per-part aggs share one shuffle pass over the year's red-part rows.
    """
    red_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li96 = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "l_partkey", "l_suppkey", exact.scaled(F.col("l_quantity")).alias("q100")
        )
        .join(
            F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
    )
    pair_qty = li96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("q100").alias("pair_q100")
    )
    part_qty = li96.groupBy("l_partkey").agg(F.sum("q100").alias("part_q100"))
    qualifying = (
        pair_qty.join(
            part_qty.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk")
        )
        .filter(F.lit(2) * F.col("pair_q100") > F.col("part_q100"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


EXCESS_SHIPPERS_SQL = f"""
WITH li96 AS (
  SELECT l_partkey, l_suppkey, {exact.scaled_sql('l_quantity')} AS q100
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
), pair_qty AS (
  SELECT l_partkey, l_suppkey, SUM(q100) AS pair_q100
  FROM li96 GROUP BY 1, 2
), part_qty AS (
  SELECT l_partkey AS pk, SUM(q100) AS part_q100
  FROM li96 GROUP BY 1
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM pair_qty
                    JOIN part_qty ON l_partkey = pk
                    WHERE 2 * pair_q100 > part_q100)
ORDER BY s_name
"""
