"""Additional canonical TPC-H query shapes adapted to the fixture
schema — widening the relational inventory with the classic plan
patterns not yet covered: top-k over a 3-way join with a returned-items
filter (Q10), conditional bucketing after a join (Q12), promo revenue
share as a ratio of conditional sums (Q14), distinct-supplier counting
with an excluded set (Q16), HAVING-gated semi-join top-k (Q18), and
disjunctive multi-predicate pushdown (Q19).

All money math uses the DECIMAL discipline; every query has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import SQL_REVENUE, dsum, money, revenue, sql_dsum, sql_money
from ..functions.rounding import pround, sql_pround
from ..sources.catalog import load_table


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, top 20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(pround(dsum(revenue()), 2).alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per linestatus, high- vs low-priority order counts for
    lineitems shipped in 1997 (conditional bucketing after the join)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_priority"),
            F.count(F.when(~high, 1)).alias("low_priority"),
        )
    )


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: % of 1997 revenue from PROMO-type parts (ratio of
    conditional decimal sums, surfaced as one double)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", revenue()).otherwise(
        F.lit(0.0).cast("decimal(18,2)")
    )
    return j.agg(
        pround(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(revenue()).cast("double"),
            6,
        ).alias("promo_share_pct"),
        F.count("*").alias("n_lines"),
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type) over mid-size
    parts, excluding suppliers in deficit (NOT IN subquery)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 10) & (F.col("p_size") <= 30)
    )
    s_bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    li = load_table(spark, sf_dir, "lineitem")
    good = li.join(s_bad, li.l_suppkey == s_bad.s_suppkey, "left_anti")
    return (
        good.join(F.broadcast(p), good.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300, with their
    customer, top 20 by quantity."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(pround(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brand/size/quantity
    predicates — exercises OR pushdown and join-condition hoisting."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 25) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 35))
    )
    return j.filter(cond).agg(
        pround(dsum(revenue()), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


QUERIES = {
    "q10_returned_revenue": q10_returned_revenue,
    "q12_priority_by_status": q12_priority_by_status,
    "q14_promo_share": q14_promo_share,
    "q16_supplier_counts": q16_supplier_counts,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
}

ORACLES = {
    "q10_returned_revenue": f"""
        SELECT c_custkey, c_name, c_mktsegment,
               {sql_pround(sql_dsum(SQL_REVENUE), 2)} AS lost_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_mktsegment
        ORDER BY lost_revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q12_priority_by_status": """
        SELECT l_linestatus,
               count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
                   AS high_priority,
               count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
                   AS low_priority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    "q14_promo_share": f"""
        SELECT {sql_pround(
            f"100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} "
            f"ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE)"
            f" / CAST(sum({SQL_REVENUE}) AS DOUBLE)", 6)} AS promo_share_pct,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
    "q16_supplier_counts": """
        SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_size BETWEEN 10 AND 30
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
    """,
    "q18_large_orders": f"""
        SELECT c_custkey, c_name, o_orderkey, total_qty
        FROM (
            SELECT l_orderkey, {sql_pround('sum(l_quantity)', 2)} AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING {sql_pround('sum(l_quantity)', 2)} > 300
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC
        LIMIT 20
    """,
    "q19_disjunctive": f"""
        SELECT {sql_pround(sql_dsum(SQL_REVENUE), 2)} AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity <= 20)
           OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size <= 35)
    """,
}
