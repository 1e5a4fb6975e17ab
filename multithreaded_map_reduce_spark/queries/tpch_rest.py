"""The remaining canonical TPC-H plan shapes, adapted to the trimmed
fixture schema (no partsupp table, no commit/receipt dates — stand-ins
documented per query). With queries/relational.py, sql_surface.py and
tpch_more.py this completes the classic shape inventory: correlated
min (Q2), EXISTS gating (Q4), nation-pair volume (Q7), market share
(Q8), profit rollup (Q9), outer-join histogram (Q13), max-equality
view (Q15), correlated-avg filter (Q17), last-shipper exists/anti
chain (Q21), and scalar-subquery + anti-join (Q22).

Money math uses the exact DECIMAL discipline (functions/money.py);
every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.money import SQL_REVENUE, dsum, money, revenue, sql_money
from ..functions.rounding import pround, pround_dec, sql_pround, sql_pround_dec
from ..sources.catalog import load_table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (correlated min over a 4-way join): for each size-25
    part, the EUROPE supplier with the lowest average unit price
    actually charged (partsupp.ps_supplycost is absent — observed
    lineitem unit price stands in)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    per_supp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name")
        .agg(
            (dsum(revenue()) / F.sum("l_quantity")).alias("unit_price")
        )
    )
    w = W.partitionBy("p_partkey").orderBy(F.asc("unit_price"), F.asc("s_suppkey"))
    return (
        per_supp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            pround(F.col("unit_price"), 4).alias("unit_price"),
        )
    )


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order counts per priority for 1997 orders where EXISTS
    a lineitem shipped more than 60 days after the order date (the
    fixture has no commit/receipt dates — ship-lag stands in)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between EUROPE nation pairs (supplier
    nation ≠ customer nation) per year, 1996–1997."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    sn = F.broadcast(eu).alias("sn")
    cn = F.broadcast(eu).alias("cn")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .filter(F.col("sn.n_name") != F.col("cn.n_name"))
        .groupBy(
            F.col("sn.n_name").alias("supp_nation"),
            F.col("cn.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        # exact decimal snap (round 9: the regenerated fixture put one
        # volume cell on a real x.xx5 tie — the q1/pround_dec class)
        .agg(pround_dec(F.sum(revenue()), 2).alias("volume"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: per order-year share of PROMO-part revenue delivered to
    ASIA customers that was supplied from ASIA itself (conditional sum /
    total sum)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    asia_cust = c.join(F.broadcast(asia), c.c_nationkey == asia.n_nationkey, "left_semi")
    asia_supp_keys = s.join(
        F.broadcast(asia), s.s_nationkey == asia.n_nationkey, "left_semi"
    ).select("s_suppkey")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(asia_supp_keys.withColumn("_asia_supp", F.lit(1))),
            li.l_suppkey == F.col("s_suppkey"),
            "left",
        )
    )
    rev = revenue()
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            pround(
                dsum(F.when(F.col("_asia_supp") == 1, rev).otherwise(F.lit(0).cast("decimal(18,2)")))
                / dsum(rev),
                6,
            ).alias("mkt_share")
        )
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit rollup by supplier nation × year over 'red'
    parts. No partsupp.ps_supplycost in the fixture, so cost is the
    documented stand-in 10% of p_retailprice per unit."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    cost = (
        money("p_retailprice")
        * F.lit(0.1).cast("decimal(18,2)")
        * money("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(pround_dec(F.sum(revenue() - cost), 2).alias("sum_profit"))
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: histogram of per-customer order counts (left outer
    join so zero-order customers land in bucket 0), excluding
    '4-NOT SPECIFIED' priority orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: suppliers whose 1997-H1 revenue equals the maximum
    (the revenue 'view' joined to its own max — exact DECIMAL sums make
    the equality portable)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue()).alias("_total"))
    top = rev.join(
        F.broadcast(rev.agg(F.max("_total").alias("_mx"))),
        F.col("_total") == F.col("_mx"),
    )
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            pround(F.col("_total").cast("double"), 2).alias("total_revenue"),
        )
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: average yearly revenue lost to small-quantity orders —
    lineitems of Brand#11 parts with quantity under half the part's
    average quantity (correlated average via a per-part window)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = W.partitionBy("p_partkey")
    flagged = joined.withColumn(
        "_avg_qty", F.sum("l_quantity").over(w) / F.count("*").over(w)
    )
    return flagged.filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty")).agg(
        pround(dsum(money("l_extendedprice")) / F.lit(7.0), 2).alias("avg_yearly")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (exists + anti chain): suppliers who shipped the LAST
    line of a multi-supplier 'F' order — i.e. everyone else was already
    done waiting on them (no commit/receipt dates in the fixture; the
    max-shipdate line stands in for the overdue one). Top 10 by count."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    lo = li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
    per_ord = lo.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("_max_ship"),
        F.countDistinct("l_suppkey").alias("_n_supp"),
    )
    last_shippers = (
        lo.join(per_ord, "l_orderkey")
        .filter(
            (F.col("l_shipdate") == F.col("_max_ship")) & (F.col("_n_supp") >= 2)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        last_shippers.join(F.broadcast(s), last_shippers.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def q22_prospective_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per market segment, count + balance of customers whose
    balance beats the global positive-balance average and who placed no
    orders since 2000 (scalar subquery + anti-join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (dsum(money("c_acctbal")) / F.count("*")).alias("_avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            pround(dsum(money("c_acctbal")), 2).alias("totacctbal"),
        )
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (group-agg filtered by a scalar subquery of the total):
    per-part "stock value" = exact revenue supplied from NATION_9
    (partsupp.ps_supplycost × ps_availqty is absent — supplied revenue
    stands in); keep parts holding more than 1/1000 of the total.

    The threshold compare stays in DECIMAL on BOTH engines
    (``val * 1000 > total`` — integer scaling, no double rounding at
    the filter boundary). The scalar total is one broadcast row; the
    nation-filtered supplier side broadcasts into the fact scan, so the
    only shuffle is the partkey aggregation — Q11's natural floor."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 9)
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(revenue()).alias("val"))
    )
    total = val.agg(F.sum("val").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("val") * F.lit(1000) > F.col("total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            pround_dec(F.col("val"), 2).alias("stock_value"),
        )
    )


def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (nested semi-join chain): EUROPE suppliers that shipped
    more than 300 units of 'small *' parts in 1997 (partsupp.availqty is
    absent — shipped quantity stands in).

    Plan: part name filter broadcasts as a LEFT SEMI into the fact scan
    (no fact-side row widening), one suppkey aggregation, then
    broadcast dims for names — the same no-extra-shuffle shape the real
    Q20 wants. ``l_quantity`` is integer-valued, so the double sum is
    exact and surfaced as BIGINT."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small %"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    qty = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    eu_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
    return (
        qty.join(F.broadcast(s), qty.l_suppkey == s.s_suppkey)
        .join(F.broadcast(eu_n), s.s_nationkey == eu_n.n_nationkey)
        .select("s_name", "n_name", "total_qty")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_priority_exists": q4_priority_exists,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_prospective_customers": q22_prospective_customers,
    "q11_important_parts": q11_important_parts,
    "q20_promotable_suppliers": q20_promotable_suppliers,
}

ORACLES = {
    "q11_important_parts": f"""
        WITH v AS (
            SELECT l_partkey AS partkey, sum({SQL_REVENUE}) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = 9
            GROUP BY 1
        )
        SELECT partkey, {sql_pround_dec('val', 2)} AS stock_value
        FROM v WHERE val * 1000 > (SELECT sum(val) FROM v)
    """,
    "q20_promotable_suppliers": """
        SELECT s_name, n_name, total_qty
        FROM (
            SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small %'
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
        )
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        WHERE total_qty > 300
    """,
    "q2_min_cost_supplier": f"""
        WITH per_supp AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
                   CAST(sum({SQL_REVENUE}) AS DOUBLE) / sum(l_quantity) AS unit_price
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_size = 25
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
            GROUP BY 1, 2, 3, 4, 5
        )
        SELECT p_partkey, p_name, s_name, n_name,
               {sql_pround('unit_price', 4)} AS unit_price
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY p_partkey ORDER BY unit_price ASC, s_suppkey ASC
            ) AS rn
            FROM per_supp
        ) WHERE rn = 1
    """,
    "q4_priority_exists": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL '60 days'
          )
        GROUP BY o_orderpriority
    """,
    "q7_volume_shipping": f"""
        WITH eu AS (
            SELECT n_nationkey, n_name FROM nation
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        )
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {sql_pround_dec(f'sum({SQL_REVENUE})', 2)} AS volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN eu sn ON s_nationkey = sn.n_nationkey
        JOIN eu cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name != cn.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": f"""
        WITH asia AS (
            SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        )
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {sql_pround(
                   f"CAST(sum(CASE WHEN s_nationkey IN (SELECT n_nationkey FROM asia) "
                   f"THEN {SQL_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)"
                   f" / CAST(sum({SQL_REVENUE}) AS DOUBLE)", 6)} AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE c_nationkey IN (SELECT n_nationkey FROM asia)
        GROUP BY 1
    """,
    "q9_profit_by_nation_year": f"""
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INTEGER) AS o_year,
               {sql_pround_dec(
                   f"sum({SQL_REVENUE} - {sql_money('p_retailprice')}"
                   f" * CAST(0.1 AS DECIMAL(18,2)) * {sql_money('l_quantity')})",
                   2)} AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    "q13_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority != '4-NOT SPECIFIED'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, sum({SQL_REVENUE}) AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-07-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               {sql_pround('CAST(total AS DOUBLE)', 2)} AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total = (SELECT max(total) FROM rev)
    """,
    "q17_small_qty_revenue": f"""
        WITH joined AS (
            SELECT l_quantity, l_extendedprice, p_partkey,
                   CAST(sum(l_quantity) OVER (PARTITION BY p_partkey) AS DOUBLE)
                       / count(*) OVER (PARTITION BY p_partkey) AS avg_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#11'
        )
        SELECT {sql_pround(
            f"CAST(sum({sql_money('l_extendedprice')}) AS DOUBLE) / 7.0", 2)}
               AS avg_yearly
        FROM joined
        WHERE l_quantity < 0.5 * avg_qty
    """,
    "q21_waiting_suppliers": """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey, l_shipdate
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        ), per_ord AS (
            SELECT l_orderkey,
                   max(l_shipdate) AS max_ship,
                   count(DISTINCT l_suppkey) AS n_supp
            FROM lo GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM (
            SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
            FROM lo JOIN per_ord ON lo.l_orderkey = per_ord.l_orderkey
            WHERE lo.l_shipdate = max_ship AND n_supp >= 2
        )
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 10
    """,
    "q22_prospective_customers": f"""
        SELECT c_mktsegment,
               count(*) AS numcust,
               {sql_pround(f"CAST(sum({sql_money('c_acctbal')}) AS DOUBLE)", 2)}
                   AS totacctbal
        FROM customer
        WHERE c_acctbal > (
                SELECT CAST(sum({sql_money('c_acctbal')}) AS DOUBLE) / count(*)
                FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01'
              )
        GROUP BY c_mktsegment
    """,
}
