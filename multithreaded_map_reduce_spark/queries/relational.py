"""Relational surface over the TPC-H-ish fixtures — SURVEY.md §2c.

The reference has NO joins, filters, aggregates-beyond-reduce, sorts, or
set operations (SURVEY.md §2c); this module supplies that whole surface
as declarative DataFrame plans so Catalyst provides pushdown, pruning,
join selection, and partial aggregation.

Scale discipline applied throughout:
- dimension tables get explicit ``F.broadcast`` hints (their cardinality
  is bounded — SURVEY.md catalog notes), so fact-table joins never
  shuffle the big side;
- aggregates are expressed so Spark's partial (map-side) aggregation
  applies — no ``collect_list``-then-reduce anti-patterns;
- every float output goes through the portable ``pround`` (sums of
  doubles to 2 decimals, ratios/avgs to 6) — reproducible across
  partition counts AND hash-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import (
    SQL_CHARGE,
    SQL_REVENUE,
    charge,
    davg,
    dsum,
    money,
    revenue,
    sql_davg,
    sql_dsum,
    sql_money,
)
from ..functions.rounding import pround, pround_dec, sql_pround, sql_pround_dec
from ..sources.catalog import load_table


# --------------------------------------------------------------- aggregates
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates.

    At 100 TB this is the partial-aggregation showcase: 6 groups total,
    so the shuffle carries ~6 rows per input partition regardless of
    input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            # money sums snap in EXACT decimal domain (round 9: the
            # regenerated fixture put sum_disc_price on a real x.xx5
            # tie — the r7 pround_dec class; dsum's double cast before
            # the snap was the leak)
            pround_dec(F.sum(money("l_extendedprice")), 2).alias(
                "sum_base_price"
            ),
            pround_dec(F.sum(revenue()), 2).alias("sum_disc_price"),
            pround_dec(F.sum(charge()), 2).alias("sum_charge"),
            pround(F.avg("l_quantity"), 6).alias("avg_qty"),
            pround(davg(money("l_extendedprice")), 6).alias("avg_price"),
            pround(davg(money("l_discount")), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + HAVING per order priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            pround(davg(money("o_totalprice")), 6).alias("avg_price"),
        )
        .filter(F.col("n_orders") > 10)
    )


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        pround(dsum(money("o_totalprice")), 2).alias("sum_total"),
    )


def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (CASE-WHEN inside agg)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        pround(
            dsum(F.when(F.col("o_orderstatus") == "F", money("o_totalprice")).otherwise(F.lit(0.0).cast("decimal(18,2)"))),
            2,
        ).alias("finished_total"),
    )


def percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) per return flag; min/max bounds."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        pround(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        pround(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        pround(F.min("l_quantity"), 2).alias("min_qty"),
        pround(F.max("l_quantity"), 2).alias("max_qty"),
    )


# -------------------------------------------------------------------- joins
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim⋈fact⋈fact with selective filters + top-10.

    customer is broadcast (bounded dim); orders⋈lineitem shuffles on
    the join key with filters pushed below the join on both sides.
    """
    cutoff = F.lit("1997-01-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(pround(dsum(revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, revenue per nation for one region,
    customer and supplier in the same nation. All dims broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(pround(dsum(revenue()), 2).alias("revenue"))
    )


def join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero matching orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_urgent"),
            pround(dsum(F.coalesce(money("o_totalprice"), F.lit(0.0).cast("decimal(18,2)"))), 2).alias("urgent_total"),
        )
    )


def join_semi_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): parts that ship after 2001-01-01."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_brand"
    )


def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no URGENT order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-customer 1995 vs 1996 spend — preserves
    customers active in only one of the two years (null on the other
    side), completing the join-type matrix. Both inputs are
    pre-aggregated (partial agg before the join ⇒ the outer join
    shuffles ~1 row per customer, not raw orders)."""
    o = load_table(spark, sf_dir, "orders")

    def year_spend(year: int, alias: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(pround(dsum(money("o_totalprice")), 2).alias(alias))
        )

    return year_spend(1995, "total_1995").join(
        year_spend(1996, "total_1996"), ["custkey"], "full"
    )


def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 customers by lifetime order value (global top-k: partial
    agg → shuffle ~1 row per customer → TakeOrdered, no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(pround(dsum(money("o_totalprice")), 2).alias("total_spend"), F.count("*").alias("n_orders"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


# ----------------------------------------------------------------- set ops
def _cust_in_year(spark, sf_dir, year: int):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select(F.col("o_custkey").alias("custkey"))


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1995 and 1996 (INTERSECT = distinct)."""
    return _cust_in_year(spark, sf_dir, 1995).intersect(_cust_in_year(spark, sf_dir, 1996))


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in 1995 but never in 1996 (EXCEPT DISTINCT)."""
    return _cust_in_year(spark, sf_dir, 1995).subtract(_cust_in_year(spark, sf_dir, 1996))


def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of 1995 and 1996 customer sets."""
    return _cust_in_year(spark, sf_dir, 1995).union(_cust_in_year(spark, sf_dir, 1996)).distinct()


# ---------------------------------------------------------- scalar functions
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar library over orders — all JVM
    built-ins, zero UDFs (SURVEY.md §2c 'scalar function library')."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_upper"),
        F.length("o_orderpriority").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month_start"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        pround(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        pround(F.log("o_totalprice"), 6).alias("price_ln"),
        pround(F.abs(F.col("o_totalprice") - F.lit(1000.0)), 2).alias("price_dev"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string function library over part names (regexp
    extraction, padding, replace, repeat, reverse, trim, position)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.repeat(F.col("p_type"), 2).alias("type_doubled"),
        F.reverse(F.col("p_name")).alias("name_reversed"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.instr(F.col("p_name"), " ").alias("space_pos"),
        F.left(F.col("p_name"), F.lit(3)).alias("prefix3"),
    )


def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval function library (quarter, ISO week, day-of-week,
    month boundaries, month arithmetic, age in days)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months(d, 3).alias("plus_3_months"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce, nullif, null-safe equality,
    least/greatest null behavior, conditional defaults."""
    o = load_table(spark, sf_dir, "orders")
    # make some NULLs deterministically: price for 'P' status treated unknown
    price_or_null = F.when(F.col("o_orderstatus") != "P", F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        pround(F.coalesce(price_or_null, F.lit(-1.0)), 2).alias("price_defaulted"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nullable"),
        price_or_null.eqNullSafe(F.col("o_totalprice")).cast("int").alias("nullsafe_eq"),
        (price_or_null.isNull()).cast("int").alias("is_unknown"),
        pround(F.greatest(price_or_null, F.lit(100000.0)), 2).alias("floor_100k"),
    )


def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT linestatus → columns (quantity sums per return flag)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(pround(F.sum("l_quantity"), 2))
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "agg_distinct": agg_distinct,
    "rollup_pricing": rollup_pricing,
    "cube_orders": cube_orders,
    "conditional_agg": conditional_agg,
    "percentiles_by_flag": percentiles_by_flag,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "join_left_counts": join_left_counts,
    "join_full_outer": join_full_outer,
    "join_semi_parts": join_semi_parts,
    "join_anti_customers": join_anti_customers,
    "topk_customers": topk_customers,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "setop_union": setop_union,
    "scalar_functions": scalar_functions,
    "scalar_strings": scalar_strings,
    "scalar_dates": scalar_dates,
    "null_semantics": null_semantics,
    "pivot_linestatus": pivot_linestatus,
}

ORACLES = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_pround('sum(l_quantity)', 2)} AS sum_qty,
               {sql_pround_dec(f"sum({sql_money('l_extendedprice')})", 2)} AS sum_base_price,
               {sql_pround_dec(f"sum({SQL_REVENUE})", 2)} AS sum_disc_price,
               {sql_pround_dec(f"sum({SQL_CHARGE})", 2)} AS sum_charge,
               {sql_pround('avg(l_quantity)', 6)} AS avg_qty,
               {sql_pround(sql_davg(sql_money('l_extendedprice')), 6)} AS avg_price,
               {sql_pround(sql_davg(sql_money('l_discount')), 6)} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_distinct": f"""
        SELECT o_orderpriority,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               count(*) AS n_orders,
               {sql_pround(sql_davg(sql_money('o_totalprice')), 6)} AS avg_price
        FROM orders
        GROUP BY o_orderpriority
        HAVING count(*) > 10
    """,
    "rollup_pricing": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_pround('sum(l_quantity)', 2)} AS sum_qty,
               count(*) AS cnt
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_orders": f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS cnt,
               {sql_pround(sql_dsum(sql_money('o_totalprice')), 2)} AS sum_total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "conditional_agg": f"""
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
               {sql_pround(sql_dsum("CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0.0 AS DECIMAL(18,2)) END"), 2)}
                   AS finished_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    "percentiles_by_flag": f"""
        SELECT l_returnflag,
               {sql_pround('quantile_cont(l_quantity, 0.5)', 6)} AS median_qty,
               {sql_pround('quantile_cont(l_extendedprice, 0.9)', 6)} AS p90_price,
               {sql_pround('min(l_quantity)', 2)} AS min_qty,
               {sql_pround('max(l_quantity)', 2)} AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, {sql_pround(sql_dsum(SQL_REVENUE), 2)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier": f"""
        SELECT n_name, {sql_pround(sql_dsum(SQL_REVENUE), 2)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "join_left_counts": f"""
        SELECT c_custkey,
               count(o_orderkey) AS n_urgent,
               {sql_pround(sql_dsum("coalesce(CAST(o_totalprice AS DECIMAL(18,2)), CAST(0.0 AS DECIMAL(18,2)))"), 2)} AS urgent_total
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_full_outer": f"""
        SELECT COALESCE(a.custkey, b.custkey) AS custkey,
               a.total_1995, b.total_1996
        FROM (
            SELECT o_custkey AS custkey,
                   {sql_pround(sql_dsum("CAST(o_totalprice AS DECIMAL(18,2))"), 2)} AS total_1995
            FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey
        ) a
        FULL JOIN (
            SELECT o_custkey AS custkey,
                   {sql_pround(sql_dsum("CAST(o_totalprice AS DECIMAL(18,2))"), 2)} AS total_1996
            FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
        ) b ON a.custkey = b.custkey
    """,
    "join_semi_parts": """
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01'
        )
    """,
    "join_anti_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
    """,
    "topk_customers": f"""
        SELECT c_custkey, c_name, total_spend, n_orders
        FROM (
            SELECT o_custkey, {sql_pround(sql_dsum(sql_money('o_totalprice')), 2)} AS total_spend,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_spend DESC, c_custkey ASC
        LIMIT 10
    """,
    "setop_intersect": """
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "setop_except": """
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "setop_union": """
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "scalar_functions": f"""
        SELECT o_orderkey,
               upper(o_orderstatus) AS status_upper,
               CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
               substring(o_orderpriority, 1, 1) AS prio_code,
               o_orderstatus || '#' || o_orderpriority AS status_prio,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(day(o_orderdate) AS INTEGER) AS order_day,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               {sql_pround('sqrt(o_totalprice)', 6)} AS price_sqrt,
               {sql_pround('ln(o_totalprice)', 6)} AS price_ln,
               {sql_pround('abs(o_totalprice - 1000.0)', 2)} AS price_dev,
               o_orderkey % 7 AS key_mod7
        FROM orders
    """,
    "scalar_strings": r"""
        SELECT p_partkey,
               regexp_extract(p_name, '(\w+)$', 1) AS last_word,
               lpad(p_brand, 12, '*') AS brand_padded,
               replace(p_name, ' ', '_') AS snake_name,
               repeat(p_type, 2) AS type_doubled,
               reverse(p_name) AS name_reversed,
               trim('  ' || p_name || '  ') AS trimmed,
               CAST(CASE WHEN position(' ' IN p_name) IS NULL THEN 0
                         ELSE position(' ' IN p_name) END AS INTEGER) AS space_pos,
               left(p_name, 3) AS prefix3
        FROM part
    """,
    "scalar_dates": """
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
                   AS days_to_2002,
               strftime(o_orderdate, '%Y-%m') AS year_month
        FROM orders
    """,
    "null_semantics": f"""
        SELECT o_orderkey,
               {sql_pround("coalesce(CASE WHEN o_orderstatus != 'P' THEN o_totalprice END, -1.0)", 2)}
                   AS price_defaulted,
               nullif(o_orderstatus, 'P') AS status_nullable,
               CAST((CASE WHEN o_orderstatus != 'P' THEN o_totalprice END
                     IS NOT DISTINCT FROM o_totalprice) AS INT) AS nullsafe_eq,
               CAST((CASE WHEN o_orderstatus != 'P' THEN o_totalprice END IS NULL) AS INT)
                   AS is_unknown,
               {sql_pround("greatest(CASE WHEN o_orderstatus != 'P' THEN o_totalprice END, 100000.0)", 2)}
                   AS floor_100k
        FROM orders
    """,
    "pivot_linestatus": f"""
        SELECT l_returnflag,
               {sql_pround("sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)", 2)} AS "O",
               {sql_pround("sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)", 2)} AS "F"
        FROM lineitem
        GROUP BY l_returnflag
    """,
}


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): order
    priorities are NULLed for '4-NOT SPECIFIED', then each order is
    joined to its priority-group size — NULL must match NULL, which a
    plain equi-join silently drops. Completes the join-predicate
    matrix (equi, semi, anti, full, as-of, range, salted, null-safe)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("nullif(o_orderpriority, '4-NOT SPECIFIED')").alias("prio"),
    )
    counts = o.groupBy(F.col("prio").alias("cprio")).agg(
        F.count("*").alias("n_same_prio")
    )
    return (
        o.join(F.broadcast(counts), o.prio.eqNullSafe(counts.cprio))
        .select("o_orderkey", "prio", "n_same_prio")
    )


QUERIES["join_null_safe"] = join_null_safe

ORACLES["join_null_safe"] = """
    WITH o AS (
        SELECT o_orderkey, nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio
        FROM orders
    ), counts AS (
        SELECT prio AS cprio, count(*) AS n_same_prio FROM o GROUP BY 1
    )
    SELECT o_orderkey, prio, n_same_prio
    FROM o JOIN counts ON o.prio IS NOT DISTINCT FROM counts.cprio
"""


# ------------------------------------------------ relational division
# Round 12: the textbook operator the join family was missing —
# relational DIVISION ("which customers bought from suppliers in ALL
# regions") is the universal-quantifier query that trips naive SQL
# (NOT EXISTS (... NOT EXISTS ...)); the scalable form is the
# count-distinct-vs-universe comparison: per customer, the distinct
# supplier regions touched by their lineitems, compared to the region
# universe count. Output is the full coverage distribution
# (n_regions_covered → customer count) rather than only the divisor
# set, so the relation is non-degenerate at every SF and the
# "qualifies" bucket is simply the top row. Scale: one fact-table
# join shuffled on suppkey, one (customer, region)-distinct
# aggregate, one 5-row reduce; the universe count is a broadcast
# scalar.


def relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    universe = n.select("n_regionkey").distinct().agg(
        F.count(F.lit(1)).alias("n_regions_total")
    )
    cr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("o_custkey").alias("c"), F.col("n_regionkey").alias("r"))
        .distinct()
    )
    per = cr.groupBy("c").agg(F.count(F.lit(1)).alias("n_regions_covered"))
    return (
        per.groupBy("n_regions_covered")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .crossJoin(F.broadcast(universe))
        .select(
            "n_regions_covered",
            "n_customers",
            (F.col("n_regions_covered") == F.col("n_regions_total"))
            .cast("int")
            .alias("covers_all"),
        )
        .orderBy("n_regions_covered")
    )


QUERIES["relational_division"] = relational_division

ORACLES["relational_division"] = """
    WITH universe AS (
        SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT)
            AS n_regions_total
        FROM nation
    ), cr AS (
        SELECT DISTINCT o_custkey AS c, n_regionkey AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
    ), per AS (
        SELECT c, CAST(count(*) AS BIGINT) AS n_regions_covered
        FROM cr GROUP BY 1
    )
    SELECT n_regions_covered,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(n_regions_covered = n_regions_total AS INTEGER)
               AS covers_all
    FROM per CROSS JOIN universe
    GROUP BY 1, n_regions_total
    ORDER BY 1
"""


# ------------------------------------------------ multiset set ops
# Round 12: the BAG-semantics twins the set-op family was missing —
# setop_except/intersect run DISTINCT semantics; EXCEPT ALL and
# INTERSECT ALL preserve multiplicity (ANSI bag semantics: a value
# occurring m times left and n times right survives max(m−n, 0) /
# min(m, n) times), which is what reconciliation actually needs ("we
# shipped 4, they invoiced 3 — one missing" — DISTINCT hides it).
# Exercises Spark's dedicated ExceptAll/IntersectAll physical
# operators (multisets: R-flag vs N-flag ship months); the surviving
# multiset is then aggregated to (month, multiplicity) for a
# deterministic relation, and the oracle replays the same bag
# algebra with DuckDB's EXCEPT ALL / INTERSECT ALL. The multiplicity
# identities (m_except = max(m−n, 0), m_intersect = min(m, n)) are
# third-referenced in the tests. Scale: both operators hash on the
# value — one shuffle each, no windows.


def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 OPT (guide §2.3 — aggregate before you shuffle): Spark plans
    # exceptAll/intersectAll by REPLICATING rows — union with ±1 tags,
    # aggregate, then Generate(ReplicateRows) materializes
    # max(m−n,0)/min(m,n) physical COPIES of every surviving value,
    # which the old groupBy then merely re-counted (measured 5.4 s warm
    # at sf0.1 for two lineitem scans + two full-row shuffles + the
    # explode). The bag identities ARE the multiplicities: one scan,
    # one ~80-group aggregate on the month key, and the two op rows
    # unfold from a 2-element struct array — identical relation (the
    # identities m_except = max(m−n, 0), m_intersect = min(m, n) are
    # third-referenced in tests/test_new_ops_r18.py; the dedicated
    # ExceptAll/IntersectAll physical operators stay covered by
    # tests/test_plans_r13.py on a fixture relation).
    li = load_table(spark, sf_dir, "lineitem")
    counts = (
        li.filter(F.col("l_returnflag").isin("R", "N"))
        .groupBy(
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
            .cast("long")
            .alias("m")
        )
        .agg(
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("cr"),
            F.sum((F.col("l_returnflag") == "N").cast("long")).alias("cn"),
        )
    )
    unfolded = counts.select(
        "m",
        F.explode(
            F.array(
                F.struct(
                    F.lit("except_all").alias("op"),
                    F.greatest(
                        F.col("cr") - F.col("cn"), F.lit(0).cast("long")
                    ).alias("multiplicity"),
                ),
                F.struct(
                    F.lit("intersect_all").alias("op"),
                    F.least(F.col("cr"), F.col("cn")).alias("multiplicity"),
                ),
            )
        ).alias("e"),
    )
    return (
        unfolded.select("e.op", "m", "e.multiplicity")
        .filter(F.col("multiplicity") > 0)
        .orderBy("op", "m")
    )


QUERIES["setop_all_variants"] = setop_all_variants

ORACLES["setop_all_variants"] = """
    WITH a AS (
        SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
                    AS BIGINT) AS m
        FROM lineitem WHERE l_returnflag = 'R'
    ), b AS (
        SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
                    AS BIGINT) AS m
        FROM lineitem WHERE l_returnflag = 'N'
    ), ex AS (
        SELECT m FROM a EXCEPT ALL SELECT m FROM b
    ), ix AS (
        SELECT m FROM a INTERSECT ALL SELECT m FROM b
    )
    SELECT 'except_all' AS op, m,
           CAST(count(*) AS BIGINT) AS multiplicity
    FROM ex GROUP BY 2
    UNION ALL
    SELECT 'intersect_all' AS op, m,
           CAST(count(*) AS BIGINT) AS multiplicity
    FROM ix GROUP BY 2
    ORDER BY op, m
"""
