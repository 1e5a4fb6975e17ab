"""Window functions — ranking, frames, lag/lead, windowed aggregates
(SURVEY.md §2c 'window functions: absent in reference').

Determinism rule: every window ORDER BY ends in a unique key so frame
contents — and therefore running double-sums — are bit-identical across
engines and partition counts. Floats go through the portable ``pround``.

Scale note: a window over ``partitionBy(k)`` shuffles once on k and
sorts within partitions; skewed k (one giant partition) is the hazard.
These queries partition on naturally-bounded keys (suppkey, custkey,
brand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.time import epoch_micros
from ..functions.money import SQL_REVENUE, money, revenue, sql_money
from ..functions.rounding import pround, sql_pround
from ..sources.catalog import load_table


def window_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand; row_number/rank/dense_rank."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            pround(F.col("p_retailprice"), 2).alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier over ship order (cumulative frame)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        pround(F.sum(revenue()).over(w).cast("double"), 2).alias("running_revenue"),
    )


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: previous/next totals + day gaps."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        pround(F.lag("o_totalprice").over(w), 2).alias("prev_total"),
        pround(F.lead("o_totalprice").over(w), 2).alias("next_total"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))).alias(
            "days_since_prev"
        ),
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 5-row frame: moving average of order totals per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        pround(
            F.sum(money("o_totalprice")).over(w).cast("double") / F.count("*").over(w), 6
        ).alias("moving_avg_5"),
        F.count("*").over(w).alias("frame_rows"),
    )


def brand_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced above their brand average (windowed agg as a
    decorrelated subquery — Catalyst computes one window, no self-join)."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand")
    return (
        p.select(
            "p_partkey",
            "p_brand",
            pround(F.col("p_retailprice"), 2).alias("price"),
            pround(
                F.sum(money("p_retailprice")).over(w).cast("double") / F.count("*").over(w), 6
            ).alias("brand_avg"),
        )
        .filter(F.col("price") > F.col("brand_avg"))
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per event, count + exact value sum
    of the same user's events in the trailing hour (the window-function
    twin of the bucketed range join)."""
    from ..functions.rounding import from_iunits, iunits

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        pround(from_iunits(F.sum(iunits(F.col("value"))).over(w)), 2).alias(
            "value_last_hour"
        ),
    )


def unpivot_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): wide per-flag aggregates → long (metric, val)."""
    from ..functions.money import dsum, money

    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        pround(F.sum("l_quantity"), 2).alias("qty"),
        pround(dsum(money("l_extendedprice")), 2).alias("price"),
    )
    return agg.selectExpr(
        "l_returnflag", "stack(2, 'qty', qty, 'price', price) AS (metric, val)"
    )


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile, percent_rank, cume_dist,
    first/last/nth value over per-brand price ordering."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return p.select(
        "p_brand",
        "p_partkey",
        F.ntile(4).over(w).alias("quartile"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
        pround(F.cume_dist().over(w), 6).alias("cume"),
        F.first("p_partkey").over(wf).alias("cheapest_part"),
        F.last("p_partkey").over(wf).alias("priciest_part"),
        F.nth_value("p_partkey", 2).over(wf).alias("second_cheapest"),
    )


QUERIES = {
    "window_topk_parts": window_topk_parts,
    "window_range_frame": window_range_frame,
    "unpivot_pricing": unpivot_pricing,
    "window_distribution": window_distribution,
    "window_running_total": window_running_total,
    "window_lag_lead": window_lag_lead,
    "window_moving_avg": window_moving_avg,
    "brand_above_avg": brand_above_avg,
}

ORACLES = {
    "window_distribution": f"""
        SELECT p_brand, p_partkey,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               {sql_pround('percent_rank() OVER w', 6)} AS pct_rank,
               {sql_pround('cume_dist() OVER w', 6)} AS cume,
               first_value(p_partkey) OVER wf AS cheapest_part,
               last_value(p_partkey) OVER wf AS priciest_part,
               nth_value(p_partkey, 2) OVER wf AS second_cheapest
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC),
               wf AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
    "window_range_frame": f"""
        SELECT event_id, user_id,
               count(*) OVER w AS n_last_hour,
               {sql_pround("CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 1000000.0", 2)} AS value_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "unpivot_pricing": f"""
        WITH agg AS (
            SELECT l_returnflag,
                   {sql_pround('sum(l_quantity)', 2)} AS qty,
                   {sql_pround(f"CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty' AS metric, qty AS val FROM agg
        UNION ALL
        SELECT l_returnflag, 'price' AS metric, price AS val FROM agg
    """,
    "window_topk_parts": f"""
        SELECT p_brand, p_partkey, price, rn, rnk, drnk FROM (
            SELECT p_brand, p_partkey,
                   {sql_pround('p_retailprice', 2)} AS price,
                   CAST(row_number() OVER w AS INTEGER) AS rn,
                   CAST(rank() OVER w AS INTEGER) AS rnk,
                   CAST(dense_rank() OVER w AS INTEGER) AS drnk
            FROM part
            WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
        ) WHERE rn <= 3
    """,
    "window_running_total": f"""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               {sql_pround(f'''CAST(sum({SQL_REVENUE}) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)''', 2)} AS running_revenue
        FROM lineitem
    """,
    "window_lag_lead": f"""
        SELECT o_custkey, o_orderkey,
               {sql_pround('lag(o_totalprice) OVER w', 2)} AS prev_total,
               {sql_pround('lead(o_totalprice) OVER w', 2)} AS next_total,
               CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                              CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window_moving_avg": f"""
        SELECT o_custkey, o_orderkey,
               {sql_pround(f"CAST(sum({sql_money('o_totalprice')}) OVER w AS DOUBLE) / (count(*) OVER w)", 6)} AS moving_avg_5,
               count(*) OVER w AS frame_rows
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    "brand_above_avg": f"""
        SELECT p_partkey, p_brand, price, brand_avg FROM (
            SELECT p_partkey, p_brand,
                   {sql_pround('p_retailprice', 2)} AS price,
                   {sql_pround(f"CAST(sum({sql_money('p_retailprice')}) OVER (PARTITION BY p_brand) AS DOUBLE) / (count(*) OVER (PARTITION BY p_brand))", 6)} AS brand_avg
            FROM part
        ) WHERE price > brand_avg
    """,
}


def window_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame MEDIAN: per return flag, the exact median of daily
    revenue cents over a trailing 7-row frame — the windowed quantile
    shape (anomaly baselines, rolling robust centers). The frame is
    ROWS-based over one row per (flag, day), so the frame holds ≤ 7
    integer values and the interpolated median of an even count is a
    half-integer — exact in IEEE on both engines (the dyadic-percentile
    discipline of quality_winsorize, p = 1/2).

    Scale: the window partitions by flag over PRE-AGGREGATED daily
    rows — the sort is |days| per group, not |lineitem|; the daily
    rollup underneath is the only data-sized shuffle."""
    from ..functions.rounding import iunits, pround

    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy("l_returnflag", F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum(iunits(F.col("l_extendedprice"), 2)).alias("rev_cents"))
    )
    w = W.partitionBy("l_returnflag").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "l_returnflag",
        "day",
        "rev_cents",
        pround(F.expr(
            "percentile(rev_cents, 0.5d)"
        ).over(w), 1).alias("median_7d_cents"),
    )


QUERIES["window_median_sliding"] = window_median_sliding

from ..functions.rounding import sql_iunits as _sql_iu2  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pr2  # noqa: E402

ORACLES["window_median_sliding"] = f"""
    WITH daily AS (
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
               CAST(sum({_sql_iu2('l_extendedprice', 2)}) AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, day, rev_cents,
           {_sql_pr2('quantile_cont(rev_cents, 0.5) OVER (PARTITION BY l_returnflag ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)', 1)}
               AS median_7d_cents
    FROM daily
"""
