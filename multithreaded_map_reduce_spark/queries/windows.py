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
from ..functions.rounding import (
    pround,
    pround_dec,
    ratio_units,
    sql_pround,
    sql_pround_dec,
    sql_ratio_units,
)
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
    """Running revenue per supplier over ship order (cumulative frame).

    Rounded with ``pround_dec`` IN DECIMAL: the running sum of scale-4
    revenue hits true x.xx50 ties, which the double ``pround`` snaps
    from within an ulp of the boundary (round-7 jitter audit flagged
    exactly this)."""
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
        pround_dec(F.sum(revenue()).over(w), 2).alias("running_revenue"),
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
    # avg = cents-sum / count computed as a pure-BIGINT rational in
    # 1e-6 units (round(1e4·cents/n)), displayed via ONE exact-rounded
    # division — the double sum/count chain ties at micro boundaries
    # (same fragility class the jitter audit flagged on brand_above_avg)
    staged = o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(money("o_totalprice")).over(w) * F.lit(100))
        .cast("long")
        .alias("_sum_cents"),
        F.count("*").over(w).alias("frame_rows"),
    )
    return staged.select(
        "o_custkey",
        "o_orderkey",
        (
            ratio_units("_sum_cents", "frame_rows", 10_000).cast("double")
            / F.lit(1e6)
        ).alias("moving_avg_5"),
        "frame_rows",
    )


def brand_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced above their brand average (windowed agg as a
    decorrelated subquery — Catalyst computes one window, no self-join)."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand")
    # integer rails end-to-end: cents-sum/count as a BIGINT micro-unit
    # rational, the above-average filter compared in micros, and one
    # exact-rounded division for display (jitter-audit fix, see
    # window_moving_avg)
    staged = p.select(
        "p_partkey",
        "p_brand",
        (money("p_retailprice") * F.lit(100)).cast("long").alias("_cents"),
        (F.sum(money("p_retailprice")).over(w) * F.lit(100))
        .cast("long")
        .alias("_sum_cents"),
        F.count("*").over(w).alias("_n"),
    ).select(
        "p_partkey",
        "p_brand",
        "_cents",
        ratio_units("_sum_cents", "_n", 10_000).alias("_avg_micros"),
    )
    return staged.filter(
        F.col("_cents") * F.lit(10_000) > F.col("_avg_micros")
    ).select(
        "p_partkey",
        "p_brand",
        (F.col("_cents").cast("double") / F.lit(100.0)).alias("price"),
        (F.col("_avg_micros").cast("double") / F.lit(1e6)).alias("brand_avg"),
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
               {sql_pround_dec(f'''sum({SQL_REVENUE}) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''', 2)} AS running_revenue
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
               CAST({sql_ratio_units('sum_cents', 'frame_rows', 10_000)} AS DOUBLE)
                   / 1000000.0 AS moving_avg_5,
               frame_rows
        FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(sum({sql_money('o_totalprice')}) OVER w * 100 AS BIGINT)
                       AS sum_cents,
                   count(*) OVER w AS frame_rows
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        )
    """,
    "brand_above_avg": f"""
        SELECT p_partkey, p_brand,
               CAST(cents AS DOUBLE) / 100.0 AS price,
               CAST(avg_micros AS DOUBLE) / 1000000.0 AS brand_avg
        FROM (
            SELECT p_partkey, p_brand, cents,
                   {sql_ratio_units('sum_cents', 'n', 10_000)} AS avg_micros
            FROM (
                SELECT p_partkey, p_brand,
                       CAST({sql_money('p_retailprice')} * 100 AS BIGINT) AS cents,
                       CAST(sum({sql_money('p_retailprice')})
                            OVER (PARTITION BY p_brand) * 100 AS BIGINT) AS sum_cents,
                       count(*) OVER (PARTITION BY p_brand) AS n
                FROM part
            )
        ) WHERE cents * 10000 > avg_micros
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


# ------------------------------------------------- gaps and islands
# Round 12: the canonical gaps-and-islands pattern (Itzik Ben-Gan's
# classic) — the SQL-surface idiom behind streak detection, coverage
# gap audits, and contiguous-segment compaction: per customer, the
# runs of CONSECUTIVE active months collapse under the
# row_number-difference trick (month_idx − rn is constant within a
# run), then one aggregate per island. Grain discipline: the window
# partitions by customer (never global); months are exact integers
# (year·12 + month — no date arithmetic ambiguity); output is the
# island-length distribution plus streak extremes, stable at any SF.


def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        F.col("o_custkey").alias("c"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("m"),
    ).distinct()
    w = W.partitionBy("c").orderBy("m")
    anchored = months.withColumn(
        "anchor", F.col("m") - F.row_number().over(w)
    )
    islands = anchored.groupBy("c", "anchor").agg(
        F.count(F.lit(1)).alias("island_len")
    )
    return (
        islands.groupBy("island_len")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.countDistinct("c").alias("n_customers"),
        )
        .orderBy("island_len")
    )


QUERIES["window_gap_islands"] = window_gap_islands

ORACLES["window_gap_islands"] = """
    WITH months AS (
        SELECT DISTINCT o_custkey AS c,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS m
        FROM orders
    ), anchored AS (
        SELECT c, m,
               m - row_number() OVER (PARTITION BY c ORDER BY m) AS anchor
        FROM months
    ), islands AS (
        SELECT c, anchor, CAST(count(*) AS BIGINT) AS island_len
        FROM anchored GROUP BY 1, 2
    )
    SELECT island_len,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(count(DISTINCT c) AS BIGINT) AS n_customers
    FROM islands
    GROUP BY 1
    ORDER BY 1
"""
