"""Time-series tier: fixed-step resampling with linear gap interpolation
(operators/timeseries.py) over the ``events`` fixture.

The oracle replays the identical pipeline — integer micro-unit bucket
sums, generate_series grid, IGNORE NULLS neighbor windows, and the same
floor-of-double interpolation formula — so the differential gate checks
the interpolation math itself, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import (
    pround,
    ratio_units,
    sql_iunits,
    sql_pround,
    sql_ratio_units,
)
from ..functions.time import epoch_micros
from ..operators.timeseries import resample_gapfill
from ..sources.catalog import load_table

STEP_US = 3600 * 1_000_000  # 1-hour buckets

#: (applicationId, sf_dir) -> lazily localCheckpoint-ed day-grain series.
_DAILY_COUNTS_CACHE: dict[str, DataFrame] = {}


def _build_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCACHED day-grain event-count series — plan contracts
    inspect this (the cached artifact's lineage truncates to an
    ExistingRDD scan once materialized, by design)."""

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def _daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once shared day-grain series (r13 OPT, the
    _supplier_cograph pattern): THIRTEEN time-series diagnostics
    (Ljung-Box, runs, Hurst, variance ratio, AR(1), periodogram,
    Mann-Kendall + seasonal, SES grid, spectral entropy, turning
    points, Cox-Stuart, KPSS, cumulative periodogram) all start from
    the identical (day, count) relation — each previously re-ran the
    events scan + groupBy per call (and several re-ran it per
    CONSUMER inside one call). One lazy localCheckpoint per (session,
    fixture dir); the relation is day-grain (~365 rows at any SF), so
    the artifact is tiny while the saved scans are corpus-sized.
    Keyed by applicationId (ADVICE r12) so a restarted session
    rebuilds."""
    from ..session import artifact_cached

    return artifact_cached(
        _DAILY_COUNTS_CACHE,
        spark,
        sf_dir,
        lambda: _build_daily_event_counts(spark, sf_dir).localCheckpoint(
            eager=False
        ),
    )


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user activity series, holes linearly interpolated."""
    ev = load_table(spark, sf_dir, "events")
    out = resample_gapfill(ev, "user_id", "ts", "value", STEP_US)
    # micros → cents as a BIGINT rational (round(iu/1e4)), ONE final
    # exact-rounded division — the double iu/1e6 chain ties at cent
    # boundaries (round-7 jitter audit flagged it; the r6 driver row
    # was green only because no fixture value sat on a tie)
    return out.select(
        F.col("key").alias("user_id"),
        "bucket_start",
        "n",
        (ratio_units("value_iu", "10000", 1).cast("double") / F.lit(100.0)).alias(
            "value"
        ),
        "interpolated",
    )


def timeseries_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags over per-user hourly activity.

    All math is exact integer arithmetic — the z² > 9 test is evaluated
    as (x·m − s1)² > 9·(m·s2 − s1²) with x in milli-units (scale 1e3
    keeps every intermediate < 2^63; ANSI mode would error, not wrap,
    if that bound ever broke), so the anomaly *decision* itself is
    differentially checked bit-for-bit, no sqrt/float anywhere.

    Scale: one shuffle on user_id; the window frame is bounded (ROWS 24
    PRECEDING..1 PRECEDING) so Spark evaluates it incrementally within
    sorted partitions — no per-row rescan, no skew risk beyond a single
    user's bucket count (bounded by the time span, not data volume).
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    from ..functions.rounding import iunits

    b = (
        ev.select(
            "user_id",
            F.floor(epoch_micros("ts") / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b"),
            iunits(F.col("value"), 3).alias("v"),
        )
        .groupBy("user_id", "b")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("x"))
    )
    h = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(-24, -1)
    )
    w = b.select(
        "user_id",
        "b",
        "n",
        "x",
        F.count("x").over(h).alias("m"),
        F.sum("x").over(h).alias("s1"),
        F.sum(F.col("x") * F.col("x")).over(h).alias("s2"),
    ).filter(F.col("m") >= 8)
    dev = F.col("x") * F.col("m") - F.col("s1")
    var_n = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    return w.select(
        "user_id",
        F.timestamp_add(
            "MICROSECOND", F.col("b") * F.lit(STEP_US), F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("bucket_start"),
        "n",
        F.col("x").alias("x_milli"),
        F.col("m").alias("hist_n"),
        (dev * dev > F.lit(9) * var_n).alias("is_anomaly"),
    )


QUERIES = {
    "timeseries_gapfill": timeseries_gapfill,
    "timeseries_anomaly": timeseries_anomaly,
}

ORACLES = {
    "timeseries_anomaly": f"""
        WITH b AS (
            SELECT user_id,
                   CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events
            GROUP BY 1, 2
        ), w AS (
            SELECT user_id, b, n, x,
                   count(x) OVER h AS m,
                   CAST(sum(x) OVER h AS BIGINT) AS s1,
                   CAST(sum(x * x) OVER h AS BIGINT) AS s2
            FROM b
            WINDOW h AS (PARTITION BY user_id ORDER BY b
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id,
               make_timestamp(b * {STEP_US}) AS bucket_start,
               n,
               x AS x_milli,
               m AS hist_n,
               (x * m - s1) * (x * m - s1) > 9 * (m * s2 - s1 * s1)
                   AS is_anomaly
        FROM w
        WHERE m >= 8
    """,
    "timeseries_gapfill": f"""
        WITH b AS (
            SELECT user_id,
                   CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
                   count(*) AS n,
                   sum({sql_iunits('value')}) AS sum_iu
            FROM events
            GROUP BY 1, 2
        ), span AS (
            SELECT user_id, min(b) AS b0, max(b) AS b1 FROM b GROUP BY 1
        ), grid AS (
            SELECT user_id, unnest(generate_series(b0, b1)) AS b FROM span
        ), j AS (
            SELECT g.user_id, g.b, b.n, b.sum_iu
            FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.b = b.b
        ), w AS (
            SELECT user_id, b, n, sum_iu,
                   last_value(sum_iu IGNORE NULLS) OVER back AS prev_iu,
                   last_value(CASE WHEN sum_iu IS NOT NULL THEN b END IGNORE NULLS)
                       OVER back AS prev_b,
                   first_value(sum_iu IGNORE NULLS) OVER fwd AS next_iu,
                   first_value(CASE WHEN sum_iu IS NOT NULL THEN b END IGNORE NULLS)
                       OVER fwd AS next_b
            FROM j
            WINDOW back AS (PARTITION BY user_id ORDER BY b
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   fwd AS (PARTITION BY user_id ORDER BY b
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id,
               make_timestamp(b * {STEP_US}) AS bucket_start,
               COALESCE(n, 0) AS n,
               CAST({sql_ratio_units(
                   "COALESCE(sum_iu, prev_iu + CAST(floor("
                   "((next_iu - prev_iu) * (b - prev_b))"
                   " / CAST(next_b - prev_b AS DOUBLE)) AS BIGINT))",
                   "10000",
                   1,
               )} AS DOUBLE) / 100.0 AS value,
               sum_iu IS NULL AS interpolated
        FROM w
    """,
}


def timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup: one pass over events
    produces hour/day/month continuous aggregates via ROLLUP on the
    derived time hierarchy (Catalyst expands to grouping sets — one
    shuffle, map-side partials; at 100 TB this is the one-scan
    alternative to three separate rollup jobs). Exact integer value
    sums; grain disambiguated by GROUPING bits."""
    from pyspark.sql import functions as F

    from ..functions.rounding import iunits
    from ..sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", F.col("ts")).cast("timestamp_ntz").alias("m"),
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("d"),
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
        iunits(F.col("value"), 6).alias("v"),
    )
    return (
        ev.rollup("m", "d", "h")
        .agg(
            F.grouping("m").cast("int").alias("g_m"),
            F.grouping("d").cast("int").alias("g_d"),
            F.grouping("h").cast("int").alias("g_h"),
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_iu"),
        )
        .select("m", "d", "h", "g_m", "g_d", "g_h", "n", "sum_iu")
    )


QUERIES["timeseries_rollup"] = timeseries_rollup

ORACLES["timeseries_rollup"] = f"""
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           date_trunc('hour', ts) AS h,
           CAST(grouping(date_trunc('month', ts)) AS INTEGER) AS g_m,
           CAST(grouping(date_trunc('day', ts)) AS INTEGER) AS g_d,
           CAST(grouping(date_trunc('hour', ts)) AS INTEGER) AS g_h,
           count(*) AS n,
           CAST(sum({sql_iunits('value')}) AS BIGINT) AS sum_iu
    FROM events
    GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts),
                     date_trunc('hour', ts))
"""


# --- exponentially-weighted moving average -----------------------------------

EWMA_TAPS = 16  # trailing observed buckets entering the average
EWMA_DEN = 1 << EWMA_TAPS  # 65536: power-of-two weight denominator


def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA (alpha = 1/2) of per-user hourly value, computed
    with power-of-two integer weights so the smoothing itself is exact:

        S_t = Σ_{j=0..15} x_{t-j} · 2^(15-j)   (x in milli-units)
        ewma_t = S_t / (65536 · 1000)

    S is a BIGINT both engines agree on bit-for-bit (max |S| ≈ 5e12,
    far under 2^63 and under 2^53 so even the final rendering is safe);
    the only float op is ONE shared-literal IEEE division at the end.
    History shorter than 16 taps reads as zeros (the standard
    zero-initialized filter), so early rows are biased low identically
    in both engines.

    Scale: identical shape to timeseries_anomaly — one shuffle on
    user_id, then a bounded sorted-window pass; the 16 lag() calls
    share one window frame, so Spark evaluates them in a single
    incremental sweep."""
    from pyspark.sql import Window

    from ..functions.rounding import iunits

    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "user_id",
            F.floor(epoch_micros("ts") / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b"),
            iunits(F.col("value"), 3).alias("v"),
        )
        .groupBy("user_id", "b")
        .agg(F.sum("v").alias("x"))
    )
    w = Window.partitionBy("user_id").orderBy("b")
    s = None
    for j in range(EWMA_TAPS):
        term = F.coalesce(F.lag("x", j).over(w), F.lit(0)) * F.lit(
            1 << (EWMA_TAPS - 1 - j)
        )
        s = term if s is None else s + term
    return b.select(
        "user_id",
        "b",
        "x",
        s.alias("ewma_num"),
    ).select(
        "user_id",
        "b",
        "x",
        "ewma_num",
        (F.col("ewma_num").cast("double") / F.lit(float(EWMA_DEN * 1000))).alias(
            "ewma"
        ),
    )


QUERIES["timeseries_ewma"] = timeseries_ewma


def _ewma_oracle() -> str:
    from ..functions.rounding import sql_iunits

    terms = " + ".join(
        f"COALESCE(lag(x, {j}) OVER w, 0) * {1 << (EWMA_TAPS - 1 - j)}"
        for j in range(EWMA_TAPS)
    )
    return f"""
        WITH b AS (
            SELECT user_id,
                   CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
                   CAST(sum({sql_iunits('value', 3)}) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, b, x,
               CAST(({terms}) AS BIGINT) AS ewma_num,
               CAST(({terms}) AS DOUBLE) / {float(EWMA_DEN * 1000)} AS ewma
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY b)
    """


ORACLES["timeseries_ewma"] = _ewma_oracle()


OVERLAP_DAYS = 30


def interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join WITHOUT a range predicate in the join:
    for every URGENT order, count the other urgent orders by the same
    clerk whose 30-day activity window overlaps its own (|Δorderdate| ≤
    30 days) — the "concurrent open intervals" shape behind SLA /
    workload-concurrency analytics.

    The naive plan is a theta-join (clerk equality + date inequality),
    which Spark executes as a per-clerk nested loop. Instead each
    order's date maps to a 30-day epoch bucket; the RIGHT side explodes
    to its bucket ±1, the LEFT joins on exact (clerk, bucket) EQUALITY
    (the fixture's orders table carries no o_clerk, so the clerk is
    derived deterministically as o_custkey % 10 — identically on both
    sides)
    — hash-shuffle join, no broadcast-nested-loop — then the precise
    |Δ| ≤ 30 predicate filters residuals. An interval can overlap
    another only if their buckets differ by ≤ 1, and the exploded
    triple {b-1, b, b+1} contains each candidate bucket exactly once,
    so no pair dedup is needed. LEFT join keeps zero-concurrency
    orders.

    100 TB: shuffle is keyed on (clerk, bucket) — cardinality grows
    with data, skew bounded by per-clerk×month volume; cost is
    candidates-within-±1-bucket, not clerk² pairs. The bucket width is
    the knob: it should match the overlap horizon so residual
    filtering stays ~3 buckets per row.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_custkey") % 10).alias("clerk"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("d"),
        )
        .withColumn("bucket", F.floor(F.col("d") / OVERLAP_DAYS))
    )
    right = o.select(
        F.col("k").alias("bk"),
        F.col("clerk"),
        F.col("d").alias("bd"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("bucket"),
    )
    joined = o.join(
        right,
        ["clerk", "bucket"],
        "left",
    ).withColumn(
        "hit",
        F.when(
            (F.col("bk").isNotNull())
            & (F.col("bk") != F.col("k"))
            & (F.abs(F.col("bd") - F.col("d")) <= OVERLAP_DAYS),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return joined.groupBy(F.col("k").alias("o_orderkey")).agg(
        F.sum("hit").alias("n_concurrent")
    )


QUERIES["interval_overlap_orders"] = interval_overlap_orders

ORACLES["interval_overlap_orders"] = f"""
    WITH u AS (
        SELECT o_orderkey AS k, o_custkey % 10 AS clerk, o_orderdate AS d
        FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT a.k AS o_orderkey,
           CAST(count(b.k) AS BIGINT) AS n_concurrent
    FROM u a LEFT JOIN u b
      ON a.clerk = b.clerk AND b.k != a.k
     AND abs(datediff('day', a.d, b.d)) <= {OVERLAP_DAYS}
    GROUP BY a.k
"""


# --------------------------------------------------- seasonal profile
# Weekly seasonality decomposition of the event stream: the (day-of-
# week × hour) activity profile plus each cell's deviation from its
# hour-of-day mean — the load-shape / anomaly-baseline every ops
# dashboard starts from. Calendar math is PORTABLE integer arithmetic
# on epoch microseconds (dow = (days + 4) % 7 — 1970-01-01 was a
# Thursday; hour = micros div 3.6e9 mod 24): engine date_part/dayofweek
# conventions (Sunday = 0 vs 1) never enter. Event values sum as exact
# integer micro-units (the double-sum order hazard the house rules
# ban). One scan, one 168-cell aggregate, one 24-cell re-aggregate
# joined back broadcast-small.


def timeseries_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(F.col("ts"))
    cells = (
        ev.select(
            F.pmod((us / F.lit(86_400_000_000)).cast("long") + F.lit(4), F.lit(7)).alias(
                "dow"
            ),
            F.pmod((us / F.lit(3_600_000_000)).cast("long"), F.lit(24)).alias("hour"),
            iunits(F.col("value"), 6).alias("v_units"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("v_units").alias("sum_units"))
    )
    hourly = cells.groupBy("hour").agg(
        F.sum("n_events").alias("h_events"), F.count(F.lit(1)).alias("h_cells")
    )
    return (
        cells.join(hourly, "hour")
        .select(
            "dow",
            "hour",
            "n_events",
            pround(F.col("sum_units").cast("double") / F.lit(1e6), 6).alias(
                "sum_value"
            ),
            pround(
                F.col("n_events").cast("double")
                / (F.col("h_events").cast("double") / F.col("h_cells").cast("double")),
                6,
            ).alias("load_vs_hour_mean"),
        )
    )


QUERIES["timeseries_seasonal_profile"] = timeseries_seasonal_profile

from ..functions.rounding import sql_iunits as _sql_iu2  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pr3  # noqa: E402

ORACLES["timeseries_seasonal_profile"] = f"""
    WITH cells AS (
        SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
               (epoch_us(ts) // 3600000000) % 24 AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum({_sql_iu2('value', 6)}) AS BIGINT) AS sum_units
        FROM events GROUP BY 1, 2
    ), hourly AS (
        SELECT hour, CAST(sum(n_events) AS BIGINT) AS h_events,
               CAST(count(*) AS BIGINT) AS h_cells
        FROM cells GROUP BY 1
    )
    SELECT dow, hour, n_events,
           {_sql_pr3('CAST(sum_units AS DOUBLE) / 1000000.0', 6)} AS sum_value,
           {_sql_pr3(
               'CAST(n_events AS DOUBLE)'
               ' / (CAST(h_events AS DOUBLE) / CAST(h_cells AS DOUBLE))', 6
           )} AS load_vs_hour_mean
    FROM cells JOIN hourly USING (hour)
"""


# ------------------------------------------------------- CUSUM drift
# Change detection on the daily event rate: the cumulative sum of
# deviations from the overall daily mean — the classic CUSUM chart a
# pipeline-health monitor runs to catch level shifts that per-day
# alerts miss. Exactness trick: instead of the fractional mean
# total/n_days, every deviation is SCALED by n_days —
# cusum_scaled(d) = Σ_{k ≤ d} (n_k·n_days − total) — so the whole
# statistic is pure BIGINT arithmetic, order-free and engine-exact.
# The cumulative window runs over one row per DAY (a broadcast-tiny
# relation at any corpus size); the corpus-sized work is one grouped
# count.


def timeseries_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    tot = daily.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        daily.crossJoin(tot)
        .select(
            "day",
            "n_events",
            (F.col("n_events") * F.col("n_days") - F.col("total")).alias("_dev"),
        )
        .withColumn("cusum_scaled", F.sum("_dev").over(w))
        .select("day", "n_events", "cusum_scaled")
    )


QUERIES["timeseries_cusum"] = timeseries_cusum

ORACLES["timeseries_cusum"] = """
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_events) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily
    )
    SELECT day, n_events,
           CAST(sum(n_events * n_days - total) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cusum_scaled
    FROM daily CROSS JOIN tot
"""


# ------------------------------------------------ Holt linear forecast
# Double exponential smoothing (Holt's linear trend, alpha = beta =
# 1/2), the trend-aware sibling of timeseries_ewma. The coupled
# level/trend recursion is a LINEAR filter, so the zero-initialized,
# HOLT_TAPS-truncated filter is a fixed weighted sum of the trailing
# inputs; with alpha = beta = 1/2 every weight is an exact dyadic
# rational with denominator 2^(2·TAPS). Both engines therefore compute
# the one-step-ahead forecast numerator Σ x_{t-j}·w_j as a BIGINT —
# bit-exact — and the only float op is one shared-literal IEEE
# division. The truncated filter IS the contract (same definition both
# sides), exactly the timeseries_ewma discipline.
#
# Scale: one shuffle on user_id, one bounded sorted-window pass; the
# HOLT_TAPS lag() terms share a single window frame.

HOLT_TAPS = 12


def _holt_int_weights() -> tuple[list[int], int]:
    """Integer forecast-filter weights and their common power-of-two
    denominator, derived exactly (Fraction arithmetic) from the Holt
    recursion l_t = a·x_t + (1-a)(l+b), b_t = g·(l_t-l) + (1-g)·b with
    a = g = 1/2, zero init, unrolled HOLT_TAPS steps."""
    from fractions import Fraction

    a = g = Fraction(1, 2)
    lw: list[Fraction] = []
    bw: list[Fraction] = []
    for _ in range(HOLT_TAPS):
        lp = [Fraction(0)] + lw
        bp = [Fraction(0)] + bw
        new_l = [a] + [(1 - a) * (lp[j] + bp[j]) for j in range(1, len(lp))]
        new_b = [g * (new_l[j] - lp[j]) + (1 - g) * bp[j] for j in range(len(new_l))]
        lw, bw = new_l, new_b
    fw = [lw[j] + bw[j] for j in range(len(lw))]
    den = 1
    for f in fw:
        den = max(den, f.denominator)
    assert den & (den - 1) == 0  # dyadic by construction
    return [int(f * den) for f in fw], den


def timeseries_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import iunits

    weights, den = _holt_int_weights()
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "user_id",
            F.floor(epoch_micros("ts") / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b"),
            iunits(F.col("value"), 3).alias("v"),
        )
        .groupBy("user_id", "b")
        .agg(F.sum("v").alias("x"))
    )
    w = Window.partitionBy("user_id").orderBy("b")
    s = None
    for j, wj in enumerate(weights):
        term = F.coalesce(F.lag("x", j).over(w), F.lit(0)) * F.lit(wj)
        s = term if s is None else s + term
    return b.select(
        "user_id",
        "b",
        "x",
        s.cast("long").alias("holt_num"),
        (s.cast("double") / F.lit(float(den * 1000))).alias("forecast"),
    )


QUERIES["timeseries_holt"] = timeseries_holt


def _holt_oracle() -> str:
    from ..functions.rounding import sql_iunits

    weights, den = _holt_int_weights()
    terms = " + ".join(
        f"COALESCE(lag(x, {j}) OVER w, 0) * ({wj})" for j, wj in enumerate(weights)
    )
    return f"""
        WITH b AS (
            SELECT user_id,
                   CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
                   CAST(sum({sql_iunits('value', 3)}) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, b, x,
               CAST(({terms}) AS BIGINT) AS holt_num,
               CAST(({terms}) AS DOUBLE) / {float(den * 1000)} AS forecast
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY b)
    """


ORACLES["timeseries_holt"] = _holt_oracle()


# ------------------------------------------------------- autocorrelation (ACF)
# Lag-k autocorrelation of the global hourly activity series — THE
# diagnostic for periodicity/burstiness before modeling a metric
# (choose seasonal window, detect synthetic/replayed traffic). Pearson
# r of the lag-k pairs (v_t, v_{t+k}) with the stats_covar exact-moment
# discipline: hourly sums in integer CENTI-units, all five moments in
# DECIMAL(38,0) (order-free), closed form with one double conversion
# per exact factor, portable rounding. Scale: one bucket aggregation
# (map-side combined), one broadcast of the 6-row lag relation, one
# equi-join on (b + lag) — series length is bounded by the time span,
# not data volume. Centi-unit rail: hourly sums stay < 2^63 in the
# moment products up to ~1e8x this fixture; at larger magnitudes drop
# to whole units (the dial documented on timeseries_anomaly).

ACF_LAGS = 6


def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    ev = load_table(spark, sf_dir, "events")
    ser = (
        ev.select(
            F.floor(epoch_micros(F.col("ts")) / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b"),
            iunits(F.col("value"), 2).alias("vc"),
        )
        .groupBy("b")
        .agg(F.sum("vc").alias("v"))
    )
    lags = spark.range(1, ACF_LAGS + 1).select(F.col("id").alias("lag"))
    x = ser.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("b") + F.col("lag")).alias("bj"), F.col("v").alias("xv")
    )
    y = ser.select(F.col("b").alias("bj"), F.col("v").alias("yv"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = (
        x.join(y, "bj")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(d(F.col("xv"))).alias("sx"),
            F.sum(d(F.col("yv"))).alias("sy"),
            F.sum(d(F.col("xv")) * d(F.col("yv"))).alias("sxy"),
            F.sum(d(F.col("xv")) * d(F.col("xv"))).alias("sxx"),
            F.sum(d(F.col("yv")) * d(F.col("yv"))).alias("syy"),
        )
    )
    n = d(F.col("n_pairs"))
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "lag",
        "n_pairs",
        pround(num / F.sqrt(varx * vary), 6).alias("acf"),
    )


QUERIES["timeseries_acf"] = timeseries_acf

ORACLES["timeseries_acf"] = f"""
    WITH ser AS (
        SELECT CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
               CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1
    ), pairs AS (
        SELECT l.lag, x.v AS xv, y.v AS yv
        FROM ser x
        JOIN (SELECT unnest(range(1, {ACF_LAGS + 1})) AS lag) l ON TRUE
        JOIN ser y ON x.b + l.lag = y.b
    ), m AS (
        SELECT lag, count(*) AS n_pairs,
               sum(xv) AS sx, sum(yv) AS sy,
               sum(xv * yv) AS sxy, sum(xv * xv) AS sxx, sum(yv * yv) AS syy
        FROM pairs GROUP BY 1
    )
    SELECT lag, CAST(n_pairs AS BIGINT) AS n_pairs,
           {sql_pround(
               'CAST(n_pairs * sxy - sx * sy AS DOUBLE)'
               ' / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)'
               ' * CAST(n_pairs * syy - sy * sy AS DOUBLE))',
               6,
           )} AS acf
    FROM m
"""


# ------------------------------------------------ robust MAD anomaly
# Median/MAD outlier flagging per day (round 8) — the ROBUST
# complement to timeseries_anomaly's rolling z-score (one fat-finger
# order shifts a mean and its sigma; it barely moves a median). The
# whole statistic is EXACT INTEGERS via the doubled-median trick:
# percentile(2v, 0.5) interpolates (a+b)/2 on the DOUBLED values, so
# even-count medians land on integers (a+b), never .5 — med2 = 2·med
# and mad4 = 4·MAD are integer-valued doubles < 2^53, cast exactly in
# both engines, and the flag |v−med| > 3·MAD becomes the pure-integer
# compare 2·|2v − med2| > 3·mad4 (d = 2·dev and mad4 = 4·MAD, so
# 2d > 3·mad4 ⟺ 4·dev > 12·MAD ⟺ dev > 3·MAD). Scale: percentile is a per-group
# (per-day) aggregate — at extreme per-day volumes swap in the
# two-pass histogram refinement (exact_median_twopass) for the same
# exact result without per-group value buffers.


def timeseries_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    per = ev.select(
        (epoch_micros(F.col("ts")) / F.lit(DAY_US)).cast("long").alias("day"),
        iunits(F.col("value"), 2).alias("v"),
    )
    med = per.groupBy("day").agg(
        F.expr("CAST(percentile(2 * v, 0.5) AS BIGINT)").alias("med2")
    )
    dev = per.join(med, "day").select(
        "day", "v", "med2", F.abs(2 * F.col("v") - F.col("med2")).alias("d")
    )
    mad = dev.groupBy("day").agg(
        F.expr("CAST(percentile(2 * d, 0.5) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(mad, "day")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("med2").alias("med2_cents"),
            F.min("mad4").alias("mad4_cents"),
            F.sum(
                F.when(2 * F.col("d") > 3 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_anomalous"),
        )
    )


QUERIES["timeseries_mad_anomaly"] = timeseries_mad_anomaly

ORACLES["timeseries_mad_anomaly"] = """
    WITH per AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v
        FROM events
    ), med AS (
        SELECT day, CAST(median(2 * v) AS BIGINT) AS med2 FROM per GROUP BY 1
    ), dev AS (
        SELECT per.day, v, med2, abs(2 * v - med2) AS d
        FROM per JOIN med ON per.day = med.day
    ), mad AS (
        SELECT day, CAST(median(2 * d) AS BIGINT) AS mad4 FROM dev GROUP BY 1
    )
    SELECT dev.day,
           count(*) AS n_events,
           CAST(min(med2) AS BIGINT) AS med2_cents,
           CAST(min(mad4) AS BIGINT) AS mad4_cents,
           CAST(sum(CASE WHEN 2 * d > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalous
    FROM dev JOIN mad ON dev.day = mad.day
    GROUP BY 1
"""


# --------------------------------------------------- Holt backtest (MASE)
# Rolling-origin backtest of the Holt forecaster: at every observed
# bucket t (past the HOLT_TAPS warm-up, so the truncated filter is
# fully populated) the 1-step-ahead prediction made at t−1 is scored
# against the realized x_t, and per user the mean-absolute-error ratio
# to the naive last-value forecaster is reported — MASE (Hyndman &
# Koehler 2006), the scale-free "is the model beating persistence"
# number every forecasting deployment tracks. Exactness: holt_num is
# already an integer in (milli-units × den) with den a power of two,
# so e_model = |den·x_t − holt_num_{t−1}| and e_naive = den·|x_t −
# x_{t−1}| are exact BIGINTs and MASE is the house half-up rational;
# no doubles exist anywhere. A constant series (Σe_naive = 0) yields
# NULL MASE — the div-by-zero contract, identical on both engines.
# Series semantics: lags step over OBSERVED buckets (the as-observed
# contract of timeseries_holt itself); gap-sensitive deployments run
# resample_gapfill first.
#
# Scale: the same one user-keyed shuffle + single sorted-window pass
# as timeseries_holt (the lag terms share one frame), then a per-user
# aggregate — nothing beyond the forecaster's own profile.


def timeseries_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import iunits, ratio_units_dec

    weights, den = _holt_int_weights()
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "user_id",
            F.floor(epoch_micros("ts") / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b"),
            iunits(F.col("value"), 3).alias("v"),
        )
        .groupBy("user_id", "b")
        .agg(F.sum("v").alias("x"))
    )
    w = Window.partitionBy("user_id").orderBy("b")
    s = None
    for j, wj in enumerate(weights):
        term = F.coalesce(F.lag("x", j).over(w), F.lit(0)) * F.lit(wj)
        s = term if s is None else s + term
    hn = b.select(
        "user_id", "b", "x", s.cast("long").alias("holt_num")
    )
    staged = hn.select(
        "user_id",
        "x",
        F.row_number().over(w).alias("rn"),
        F.lag("holt_num", 1).over(w).alias("fprev"),
        F.lag("x", 1).over(w).alias("xprev"),
    ).filter(F.col("rn") > F.lit(HOLT_TAPS))
    return (
        staged.select(
            "user_id",
            F.abs(F.lit(den) * F.col("x") - F.col("fprev")).alias("em"),
            (F.lit(den) * F.abs(F.col("x") - F.col("xprev"))).alias("en"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_evals"),
            F.sum("em").alias("err_model_units"),
            F.sum("en").alias("err_naive_units"),
        )
        .withColumn(
            # den-scaled error sums reach ~den·Σ|x|·TAPS ≈ 1e13 at
            # sf0.1 — the 2e6·num rational must run on the wide rail.
            # A constant series has Σe_naive = 0: ANSI mode raises on
            # the division, so the NULL contract needs an explicit
            # short-circuiting CASE (the oracle's CASE twin).
            "mase_micros",
            F.when(
                F.col("err_naive_units") == 0, F.lit(None).cast("long")
            ).otherwise(
                ratio_units_dec("err_model_units", "err_naive_units")
            ),
        )
    )


QUERIES["timeseries_backtest_mase"] = timeseries_backtest_mase


def _mase_oracle() -> str:
    from ..functions.rounding import sql_iunits, sql_ratio_units_dec

    weights, den = _holt_int_weights()
    terms = " + ".join(
        f"COALESCE(lag(x, {j}) OVER w, 0) * ({wj})" for j, wj in enumerate(weights)
    )
    return f"""
        WITH b AS (
            SELECT user_id,
                   CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
                   CAST(sum({sql_iunits('value', 3)}) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ), hn AS (
            SELECT user_id, b, x, CAST(({terms}) AS BIGINT) AS holt_num
            FROM b
            WINDOW w AS (PARTITION BY user_id ORDER BY b)
        ), staged AS (
            SELECT user_id, x,
                   row_number() OVER w2 AS rn,
                   lag(holt_num, 1) OVER w2 AS fprev,
                   lag(x, 1) OVER w2 AS xprev
            FROM hn
            WINDOW w2 AS (PARTITION BY user_id ORDER BY b)
        ), ev AS (
            SELECT user_id,
                   abs({den} * x - fprev) AS em,
                   {den} * abs(x - xprev) AS en
            FROM staged WHERE rn > {HOLT_TAPS}
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_evals,
               CAST(sum(em) AS BIGINT) AS err_model_units,
               CAST(sum(en) AS BIGINT) AS err_naive_units,
               {sql_ratio_units_dec('sum(em)', 'sum(en)')} AS mase_micros
        FROM ev GROUP BY 1
    """


ORACLES["timeseries_backtest_mase"] = _mase_oracle()


# ------------------------------------------- deseasonalized anomalies
# The seasonal complement of timeseries_mad_anomaly: remove the
# day-of-week profile FIRST, then flag residual outliers with the
# robust median/MAD rule — a Monday sales spike is normal, the same
# spike on a Sunday is not; raw-value MAD can't tell them apart.
# Exactness chain: per-dow mean value is snapped HALF-UP TO MICROS
# (ratio_units — the defined seasonal profile contract), residuals
# r = 10⁴·cents − mean_micros are exact integers, and the global
# median/MAD run on the doubled-value rail (med2 = percentile(2r, .5)
# is integer-valued for integer r; flag is the pure compare
# 2·|2r − med2| > 3·mad4 — timeseries_mad_anomaly's discipline on the
# residual axis). Output per dow: profile + anomaly count after
# deseasonalization.
#
# Scale: one event scan → |dow|=7-row profile (broadcast back), one
# residual re-scan, two tiny global percentile aggregates. Exact
# medians over the full corpus are the stated fixture-scale contract;
# the extreme-scale path is the two-pass histogram refinement
# documented at timeseries_mad_anomaly.


def timeseries_deseasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    per = ev.select(
        (
            ((epoch_micros(F.col("ts")) / F.lit(DAY_US)).cast("long") + 4) % 7
        ).alias("dow"),
        iunits(F.col("value"), 2).alias("v"),
    )
    prof = (
        per.groupBy("dow")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .select(
            "dow",
            "c",
            ratio_units("s", "c", 10_000).alias("mean_micros"),
        )
        .localCheckpoint()
    )
    res = per.join(F.broadcast(prof), "dow").select(
        "dow",
        (F.col("v") * F.lit(10_000) - F.col("mean_micros")).alias("r"),
    )
    med = res.agg(
        F.expr("CAST(percentile(2 * r, 0.5) AS BIGINT)").alias("med2")
    )
    dev = res.crossJoin(F.broadcast(med)).select(
        "dow", "r", "med2", F.abs(2 * F.col("r") - F.col("med2")).alias("d")
    )
    mad = dev.agg(
        F.expr("CAST(percentile(2 * d, 0.5) AS BIGINT)").alias("mad4")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(2 * F.col("d") > 3 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_anomalous"),
        )
        .join(prof.select("dow", "mean_micros"), "dow")
        .select("dow", "n_events", "mean_micros", "n_anomalous")
    )


QUERIES["timeseries_deseasonal_anomaly"] = timeseries_deseasonal_anomaly

ORACLES["timeseries_deseasonal_anomaly"] = """
    WITH per AS (
        SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v
        FROM events
    ), prof AS (
        SELECT dow,
               (CASE WHEN CAST(count(*) AS BIGINT) = 0 THEN NULL ELSE
                (2 * 10000 * CAST(sum(v) AS BIGINT) + CAST(count(*) AS BIGINT))
                // (2 * CAST(count(*) AS BIGINT)) END) AS mean_micros
        FROM per GROUP BY 1
    ), res AS (
        SELECT per.dow, per.v * 10000 - prof.mean_micros AS r
        FROM per JOIN prof ON per.dow = prof.dow
    ), med AS (
        SELECT CAST(median(2 * r) AS BIGINT) AS med2 FROM res
    ), dev AS (
        SELECT dow, abs(2 * r - med2) AS d FROM res, med
    ), mad AS (
        SELECT CAST(median(2 * d) AS BIGINT) AS mad4 FROM dev
    )
    SELECT dow,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(prof.mean_micros) AS BIGINT) AS mean_micros,
           CAST(sum(CASE WHEN 2 * d > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalous
    FROM dev JOIN prof USING (dow), mad
    GROUP BY 1
"""


# ------------------------------------------------ Theil–Sen robust trend
# Round 10: the median-of-pairwise-slopes trend estimator — the robust
# alternative to the OLS slope (ols_by_flag): up to ~29% of the series
# can be arbitrarily corrupted (outage days, backfill spikes) without
# moving the estimate, which is why monitoring pipelines prefer it for
# "is this metric drifting" questions over noisy daily counts.
#
# Exactness rail: slopes are snapped FIRST — slope_micros =
# (1_000_000 · Δy) div Δx in pure BIGINT (both engines' integer
# division truncates toward zero, so the snap is portable on the
# signed domain) — and the median is then the exact lower median of an
# integer list (the discrete-median idiom). Zero doubles anywhere.
#
# Scale: the pair stage is C(n,2) per series where n = #days — bounded
# by the calendar (≤ 435 pairs for a 30-day window), NOT by event
# volume; the per-day aggregation underneath is the only
# corpus-proportional stage. The per-series collect_list holds ≤
# C(n,2) integers. For multi-year series, Theil–Sen degrades to the
# repeated-median or a slope histogram — noted, out of fixture scope.

def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a = daily.select(
        "event_type", F.col("d").alias("di"), F.col("y").alias("yi")
    )
    b = daily.select(
        "event_type", F.col("d").alias("dj"), F.col("y").alias("yj")
    )
    pairs = a.join(b, "event_type").filter(F.col("dj") > F.col("di"))
    slopes = pairs.select(
        "event_type",
        F.expr(
            "(1000000 * (yj - yi)) div (dj - di)"
        ).alias("slope_micros"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.element_at(
                F.sort_array(F.collect_list("slope_micros")),
                ((F.count(F.lit(1)) + 1) / 2).cast("int"),
            ).alias("sen_slope_micros"),
        )
        .select("event_type", "n_pairs", "sen_slope_micros")
    )


QUERIES["timeseries_theil_sen"] = timeseries_theil_sen

ORACLES["timeseries_theil_sen"] = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type,
               (1000000 * (b.y - a.y)) // (b.d - a.d) AS slope_micros
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           list_sort(list(slope_micros))[CAST((count(*) + 1) // 2
                                              AS INTEGER)]
               AS sen_slope_micros
    FROM pairs GROUP BY event_type
"""


# --------------------------------------------- seasonal strength (STL F_s)
# Round 10: the one-number answer to "is the day-of-week profile worth
# modeling" — Hyndman's seasonal-strength statistic F_s = max(0,
# 1 − Var(residual)/Var(raw)) on the deseasonalized rail
# (timeseries_deseasonal_anomaly's exact contract: dow means snapped
# half-up to micros, residuals r = 10⁴·cents − mean_micros exact
# integers). F_s ≈ 0 → seasonality explains nothing (drop the profile
# from the anomaly model); F_s → 1 → the profile carries the signal.
#
# Exactness: both variances share n, so F_s = 1 − num_r/num_x with
# num = n·Σz² − (Σz)² — a ratio of two exact integers; the wide
# moments run on the DECIMAL(38,0)/HUGEINT rail (Σx² passes int64 at
# sf0.1 already) and the two reported micro-ratios are half-up wide
# rationals. Zero doubles.
#
# Scale: one event scan for the 7-row profile (broadcast back), one
# residual re-scan with a single global aggregate.

def timeseries_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units_dec

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    per = ev.select(
        (
            ((epoch_micros(F.col("ts")) / F.lit(DAY_US)).cast("long") + 4) % 7
        ).alias("dow"),
        iunits(F.col("value"), 2).alias("v"),
    )
    prof = (
        per.groupBy("dow")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .select("dow", ratio_units("s", "c", 10_000).alias("mean_micros"))
    )
    dec = "decimal(38,0)"
    both = per.join(F.broadcast(prof), "dow").select(
        (F.col("v") * F.lit(10_000)).alias("x"),
        (F.col("v") * F.lit(10_000) - F.col("mean_micros")).alias("r"),
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum((F.col("x").cast(dec) * F.col("x").cast(dec))).alias("sxx"),
        F.sum(F.col("r").cast(dec)).alias("sr"),
        F.sum((F.col("r").cast(dec) * F.col("r").cast(dec))).alias("srr"),
    )
    num_x = F.col("n_events").cast(dec) * F.col("sxx") - F.col("sx") * F.col("sx")
    num_r = F.col("n_events").cast(dec) * F.col("srr") - F.col("sr") * F.col("sr")
    return agg.select(
        "n_events",
        num_x.alias("_nx"),
        num_r.alias("_nr"),
    ).select(
        "n_events",
        ratio_units_dec("_nr", "_nx").alias("resid_var_share_micros"),
        F.greatest(
            F.lit(1_000_000) - ratio_units_dec("_nr", "_nx"), F.lit(0)
        ).cast("long").alias("seasonal_strength_micros"),
    )


QUERIES["timeseries_seasonal_strength"] = timeseries_seasonal_strength

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud,
)

ORACLES["timeseries_seasonal_strength"] = f"""
    WITH per AS (
        SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
               {sql_iunits('value', 2)} AS v
        FROM events
    ), prof AS (
        SELECT dow, {sql_ratio_units('sum(v)', 'count(*)', 10_000)}
                   AS mean_micros
        FROM per GROUP BY dow
    ), xr AS (
        SELECT per.v * 10000 AS x,
               per.v * 10000 - prof.mean_micros AS r
        FROM per JOIN prof ON per.dow = prof.dow
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(r AS HUGEINT)) AS sr,
               sum(CAST(r AS HUGEINT) * r) AS srr
        FROM xr
    )
    SELECT n_events,
           {_sql_rud('n_events * srr - sr * sr', 'n_events * sxx - sx * sx')}
               AS resid_var_share_micros,
           CAST(greatest(1000000 -
               {_sql_rud('n_events * srr - sr * sr',
                         'n_events * sxx - sx * sx')}, 0) AS BIGINT)
               AS seasonal_strength_micros
    FROM agg
"""


# --------------------------------------------- Single-changepoint scan
# Binary-segmentation step 1 on the daily event count: the split day τ
# that MINIMIZES total within-segment squared error — equivalently
# maximizes gain(τ) = S_L²/n_L + S_R²/n_R (the constant Σx² drops out)
# — the level-shift LOCATOR that complements timeseries_cusum's level-
# shift DETECTOR. A pipeline health monitor runs it when CUSUM alarms
# to date the regime change; recursing on the two halves is classic
# binary segmentation (Scott & Knott 1974).
#
# Exactness: daily counts are BIGINTs; prefix sums over the day-grain
# relation give (n_L, S_L) per candidate τ; each S²/n quotient rounds
# half-up to MILLI-units via the wide rational divide (DECIMAL —
# S_L² overflows int64 well inside real event volumes), and the argmax
# runs on those exact integers with the earliest-day tiebreak. Zero
# doubles end-to-end.
#
# Scale: the corpus-sized work is ONE grouped count; the candidate
# scan is |days| rows (broadcast-tiny at any volume) with two window
# prefix sums and a TakeOrdered(1).

def timeseries_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_micros, ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = daily.select(
        "day",
        F.row_number().over(W.orderBy("day")).alias("n_l"),
        F.sum("n_events").over(w).alias("s_l"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("n_events").alias("s_tot")
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("n_l") < F.col("n_days"))
        .select(
            "day",
            "n_l",
            "s_l",
            "n_days",
            "s_tot",
            (
                # widen BEFORE the square (ADVICE r10): s_l² in BIGINT
                # wraps past ~3.04e9 cumulative events while the
                # HUGEINT oracle keeps going — DECIMAL-first on both
                # sides, as quality_kruskal_wallis' (2R_g)² term does
                ratio_units_dec(
                    "CAST(s_l AS DECIMAL(38,0)) * s_l", "n_l", 1000
                )
                + ratio_units_dec(
                    "CAST(s_tot - s_l AS DECIMAL(38,0)) * (s_tot - s_l)",
                    "n_days - n_l",
                    1000,
                )
            ).alias("fit_milli"),
        )
        .withColumn(
            "gain_milli",
            F.col("fit_milli")
            - ratio_units_dec(
                "CAST(s_tot AS DECIMAL(38,0)) * s_tot", "n_days", 1000
            ),
        )
    )
    best = cand.orderBy(F.desc("gain_milli"), F.asc("day")).limit(1)
    return best.select(
        F.col("day").alias("tau_day"),
        "n_days",
        F.col("n_l").alias("n_left"),
        (F.col("n_days") - F.col("n_l")).alias("n_right"),
        ratio_micros("s_l", "n_l").alias("mean_left_micros"),
        ratio_micros("s_tot - s_l", "n_days - n_l").alias(
            "mean_right_micros"
        ),
        "gain_milli",
    )


QUERIES["timeseries_changepoint"] = timeseries_changepoint

from ..functions.rounding import sql_ratio_micros as _sql_rm_ts  # noqa: E402
from ..functions.rounding import sql_ratio_units_dec as _sql_rud_ts  # noqa: E402

ORACLES["timeseries_changepoint"] = f"""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ), pre AS (
        SELECT day,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS n_l,
               CAST(sum(n_events) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS s_l
        FROM daily
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(n_events) AS BIGINT) AS s_tot
        FROM daily
    ), cand AS (
        SELECT day, n_l, s_l, n_days, s_tot,
               CAST({_sql_rud_ts('CAST(s_l AS HUGEINT) * s_l', 'n_l', 1000)}
                    + {_sql_rud_ts('CAST(s_tot - s_l AS HUGEINT) * (s_tot - s_l)',
                                   'n_days - n_l', 1000)}
                    - {_sql_rud_ts('CAST(s_tot AS HUGEINT) * s_tot', 'n_days', 1000)}
                    AS BIGINT) AS gain_milli
        FROM pre CROSS JOIN tot
        WHERE n_l < n_days
    )
    SELECT day AS tau_day, n_days, n_l AS n_left,
           CAST(n_days - n_l AS BIGINT) AS n_right,
           {_sql_rm_ts('s_l', 'n_l')} AS mean_left_micros,
           {_sql_rm_ts('s_tot - s_l', 'n_days - n_l')} AS mean_right_micros,
           gain_milli
    FROM cand
    ORDER BY gain_milli DESC, day ASC
    LIMIT 1
"""


# ------------------------------------------ Holt–Winters (additive)
# Triple exponential smoothing — the seasonal completion of the
# ewma → holt ladder: level + trend + ADDITIVE m=24-hour seasonal
# component over the gapfilled global hourly count series. Same
# exactness device as timeseries_holt: with α = β = γ = 1/2 and zero
# init the HW_TAPS-truncated recursion is a LINEAR filter whose
# weights are exact dyadic rationals (derived by Fraction unrolling at
# import), so the one-step-ahead forecast numerator Σ x_{t−j}·w_j is
# pure integer arithmetic — here accumulated in DECIMAL(38,0)/HUGEINT
# because the 2^~36 weight scale times production hourly volumes
# exceeds int64. The truncated filter IS the contract.
#
# Scale: one corpus scan → hourly counts; the spine/lag window runs on
# the CALENDAR-bounded global series (≤ |span hours| rows at any data
# volume — the cusum/daily discipline).

HW_TAPS = 36
HW_SEASON = 24


def _hw_int_weights(taps: int = HW_TAPS, m: int = HW_SEASON) -> tuple[list[int], int]:
    """Integer forecast-filter weights (and their power-of-two common
    denominator) for x̂_{T+1} = l_T + b_T + s_{T+1−m} under the additive
    HW recursion with α = β = γ = 1/2, zero init, taps-step unroll.
    weights[j] multiplies lag(x, j) (j = 0 is the newest bucket)."""
    from fractions import Fraction

    half = Fraction(1, 2)
    zero = [Fraction(0)] * taps
    lprev, bprev = zero[:], zero[:]
    s_hist: list[list[Fraction]] = []
    for t in range(1, taps + 1):
        xt = [Fraction(1) if i == t - 1 else Fraction(0) for i in range(taps)]
        s_tm = s_hist[t - m - 1] if t - m >= 1 else zero
        lt = [
            half * (xt[i] - s_tm[i]) + half * (lprev[i] + bprev[i])
            for i in range(taps)
        ]
        bt = [half * (lt[i] - lprev[i]) + half * bprev[i] for i in range(taps)]
        st = [half * (xt[i] - lt[i]) + half * s_tm[i] for i in range(taps)]
        s_hist.append(st)
        lprev, bprev = lt, bt
    s_fore = s_hist[taps - m] if taps + 1 - m >= 1 else zero
    fw = [lprev[i] + bprev[i] + s_fore[i] for i in range(taps)]
    den = 1
    for f in fw:
        den = max(den, f.denominator)
    assert den & (den - 1) == 0  # dyadic by construction
    # weights[j] pairs with lag j: newest observation is x_taps
    return [int(fw[taps - 1 - j] * den) for j in range(taps)], den


def timeseries_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    weights, den = _hw_int_weights()
    ev = load_table(spark, sf_dir, "events")
    cnt = (
        ev.select(
            F.floor(epoch_micros("ts") / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = cnt.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    grid = span.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b")
    )
    x = grid.join(cnt, "b", "left").select(
        "b", F.coalesce("n", F.lit(0)).alias("x")
    )
    w = Window.orderBy("b").rowsBetween(-(len(weights) - 1), 0)
    dec = "decimal(38,0)"
    # ONE trailing-frame collect + one array fold instead of 36
    # separate lag() expressions — the wide-lag form codegen'd a
    # ~36-term DECIMAL product chain whose plan build dominated
    # runtime (~6 s fixed at any SF); this form is a single window
    # pass + an interpreted HOF over ≤36 elements per calendar row.
    # Weights exceed int64 (den = 2^72) — decimal literals.
    warr = "array({})".format(
        ", ".join(f"CAST('{wj}' AS {dec})" for wj in weights)
    )
    trail = F.reverse(F.collect_list("x").over(w))  # [lag0, lag1, …]
    s = F.aggregate(
        F.zip_with(
            trail,
            F.expr(warr),
            lambda x, wc: F.coalesce(x.cast(dec), F.lit(0).cast(dec)) * wc,
        ),
        F.lit(0).cast(dec),
        lambda acc, t: acc + F.coalesce(t, F.lit(0).cast(dec)),
    )
    # the 72+-bit numerator→double conversion is NOT correctly
    # rounded in every engine (observed 1-ulp diffs vs HUGEINT→DOUBLE),
    # so the forecast goes through the standard pround(6) snap — the
    # bm25 discipline, jitter-audited like every pround user
    return x.select(
        "b",
        "x",
        pround(s.cast("double") / F.lit(float(den)), 6).alias("forecast"),
    )


QUERIES["timeseries_holt_winters"] = timeseries_holt_winters


def _hw_oracle() -> str:
    weights, den = _hw_int_weights()
    terms = " + ".join(
        f"COALESCE(lag(x, {j}) OVER w, 0)::HUGEINT * ({wj})"
        for j, wj in enumerate(weights)
    )
    return f"""
        WITH cnt AS (
            SELECT CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT)
                       AS b,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ), span AS (
            SELECT min(b) AS b0, max(b) AS b1 FROM cnt
        ), grid AS (
            SELECT unnest(generate_series(b0, b1)) AS b FROM span
        ), x AS (
            SELECT grid.b, CAST(coalesce(cnt.n, 0) AS BIGINT) AS x
            FROM grid LEFT JOIN cnt ON grid.b = cnt.b
        )
        SELECT b, x,
               {sql_pround(f"CAST(({terms}) AS DOUBLE) / {float(den)}", 6)}
                   AS forecast
        FROM x
        WINDOW w AS (ORDER BY b)
    """


ORACLES["timeseries_holt_winters"] = _hw_oracle()


# ------------------------------------------- Kendall τ KPI co-movement
# Do two daily KPIs move together? Kendall's τ-b between the daily
# event COUNT and the daily value SUM — the rank-concordance answer
# that is robust to any monotone rescaling of either KPI (the
# dashboards question "is volume driving value"). Same calendar-
# bounded pair rail as timeseries_theil_sen: C(|days|, 2) pairs of
# DAYS, never of rows, so the quadratic stage is bounded by the time
# span at any data volume.
#
# Exactness: counts and micro-unit sums are BIGINTs; concordant/
# discordant/tie classification is pure sign algebra on integer
# differences; τ-b = (C − D)/√((n0 − t_x)(n0 − t_y)) spends one
# correctly-rounded sqrt under the pround snap (the MDE discipline).

def timeseries_kendall_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
            iunits(F.col("value"), 6).alias("v"),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"), F.sum("v").alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
    )
    cls = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(
            ((F.col("dx") > 0) & (F.col("dy") > 0)
             | (F.col("dx") < 0) & (F.col("dy") < 0)).cast("long")
        ).alias("conc"),
        F.sum(
            ((F.col("dx") > 0) & (F.col("dy") < 0)
             | (F.col("dx") < 0) & (F.col("dy") > 0)).cast("long")
        ).alias("disc"),
        F.sum((F.col("dx") == 0).cast("long")).alias("tx"),
        F.sum((F.col("dy") == 0).cast("long")).alias("ty"),
    )
    tau = (
        (F.col("conc") - F.col("disc")).cast("double")
        / F.sqrt(
            (F.col("n0") - F.col("tx")).cast("double")
            * (F.col("n0") - F.col("ty")).cast("double")
        )
    )
    return cls.select(
        "n0",
        "conc",
        "disc",
        "tx",
        "ty",
        pround(tau, 6).alias("tau_b"),
    )


QUERIES["timeseries_kendall_comovement"] = timeseries_kendall_comovement

ORACLES["timeseries_kendall_comovement"] = f"""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum({sql_iunits('value', 6)}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), pairs AS (
        SELECT b.x - a.x AS dx, b.y - a.y AS dy
        FROM daily a JOIN daily b ON a.day < b.day
    ), cls AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN (dx > 0 AND dy > 0)
                               OR (dx < 0 AND dy < 0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(sum(CASE WHEN (dx > 0 AND dy < 0)
                               OR (dx < 0 AND dy > 0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc,
               CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
               CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
        FROM pairs
    )
    SELECT n0, conc, disc, tx, ty,
           {sql_pround(
               "CAST(conc - disc AS DOUBLE)"
               " / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))",
               6)} AS tau_b
    FROM cls
"""


# --------------------------------------- hierarchical reconciliation
# Hyndman's coherent-forecast problem: per-region daily forecasts and
# the total-level forecast disagree unless reconciled. This op runs
# the naive drift forecast at BOTH levels of the region hierarchy
# (bottom = supplier nation region, top = all), then reconciles
# TOP-DOWN by historical proportions — the additive-coherence
# guarantee Σ_regions f̂_r = f̂_total that a capacity-planning consumer
# requires. Forecast = last + mean daily increment (drift), exact
# micro-rationals; proportions are historical order-count shares.
#
# Scale: one fact scan → (region, day) counts (calendar × 5 rows);
# every step after is constant-size. The reconciliation algebra is
# the same at a million-leaf hierarchy — proportions become a keyed
# relation instead of 5 rows.

def timeseries_hier_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units, ratio_units_dec

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("c_custkey").alias("ck"), "r_name")
    )
    daily = (
        o.join(dim, o.o_custkey == dim.ck)
        .groupBy(
            "r_name",
            F.unix_date(F.col("o_orderdate").cast("date")).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    per_r = daily.groupBy("r_name").agg(
        F.sum("x").alias("tot"),
        F.count(F.lit(1)).alias("n_days"),
        F.max_by("x", "day").alias("last_x"),
        F.max("day").alias("last_day"),
        F.min("day").alias("first_day"),
        F.min_by("x", "day").alias("first_x"),
    )
    # drift forecast per region: last + (last − first)/span, with the
    # drift a SIGNED rational — the OFFSET-shifted half-up divide is
    # the negative-domain-safe form (floor == truncate once shifted
    # positive, so Spark div and DuckDB // agree; the iunits_grid
    # reduction trick)
    # OFF must just dominate |last_x − first_x| (per-day counts), so
    # the shifted numerator stays positive AND inside int64:
    # 2e6·(OFF·span) at OFF=1e7, span≈2400 ⇒ ~5e16
    OFF = 10**7
    drift = per_r.select(
        "r_name",
        "tot",
        "last_x",
        (
            F.expr(
                f"(2 * 1000000 * (CAST(last_x - first_x AS BIGINT)"
                f" + {OFF} * CAST(last_day - first_day AS BIGINT))"
                f" + CAST(last_day - first_day AS BIGINT))"
                f" div (2 * CAST(last_day - first_day AS BIGINT))"
            )
            - F.lit(1_000_000 * OFF)
        ).alias("drift_micros"),
    )
    fc = drift.select(
        "r_name",
        "tot",
        (F.col("last_x") * 1_000_000 + F.col("drift_micros")).alias(
            "fc_bottom_micros"
        ),
    )
    tots = fc.agg(
        F.sum("tot").alias("g_tot"),
        F.sum("fc_bottom_micros").alias("fc_bu_total_micros"),
    )
    return (
        fc.crossJoin(F.broadcast(tots))
        .select(
            "r_name",
            "tot",
            "fc_bottom_micros",
            ratio_units_dec("tot", "g_tot", 1_000_000).alias(
                "share_micros"
            ),
            # top-down: the bottom-up TOTAL redistributed by share —
            # coherent by construction (shares sum to 1e6 ± rounding)
            ratio_units_dec(
                "CAST(tot AS decimal(38,0)) * fc_bu_total_micros",
                "g_tot",
                1,
            ).alias("fc_topdown_micros"),
        )
    )


QUERIES["timeseries_hier_reconcile"] = timeseries_hier_reconcile

ORACLES["timeseries_hier_reconcile"] = f"""
    WITH dim AS (
        SELECT c_custkey AS ck, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    ), daily AS (
        SELECT r_name,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM orders JOIN dim ON o_custkey = ck
        GROUP BY 1, 2
    ), per_r AS (
        SELECT r_name,
               CAST(sum(x) AS BIGINT) AS tot,
               CAST(max(day) AS BIGINT) AS last_day,
               CAST(min(day) AS BIGINT) AS first_day,
               CAST(max_by(x, day) AS BIGINT) AS last_x,
               CAST(min_by(x, day) AS BIGINT) AS first_x
        FROM daily GROUP BY r_name
    ), drift AS (
        SELECT r_name, tot, last_x,
               CAST((2 * 1000000 * (CAST(last_x - first_x AS BIGINT)
                     + {10**7} * (last_day - first_day))
                     + (last_day - first_day))
                    // (2 * (last_day - first_day))
                    - {1_000_000 * 10**7} AS BIGINT) AS drift_micros
        FROM per_r
    ), fc AS (
        SELECT r_name, tot,
               CAST(last_x * 1000000 + drift_micros AS BIGINT)
                   AS fc_bottom_micros
        FROM drift
    ), tots AS (
        SELECT CAST(sum(tot) AS BIGINT) AS g_tot,
               CAST(sum(fc_bottom_micros) AS BIGINT) AS fc_bu_total_micros
        FROM fc
    )
    SELECT r_name, tot, fc_bottom_micros,
           {_sql_rud_ts('tot', 'g_tot', 1_000_000)} AS share_micros,
           {_sql_rud_ts('CAST(tot AS HUGEINT) * fc_bu_total_micros',
                        'g_tot', 1)} AS fc_topdown_micros
    FROM fc CROSS JOIN tots
"""


# ------------------------------------- binary segmentation, depth 2
# The recursion step timeseries_changepoint promised: after locating
# the best split τ of the daily series, re-run the same exact-integer
# argmax INSIDE each half — the top-3 changepoints a monitor reports
# as "the regime history", all from ONE prefix-sum relation (no
# rescan; segment-relative counts/sums are differences of global
# prefixes against the broadcast root-split row).

def timeseries_changepoint2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = daily.select(
        "day",
        F.row_number().over(W.orderBy("day")).alias("i"),
        F.sum("n").over(w).alias("s"),
    ).localCheckpoint()  # one day-grain relation feeds all three argmaxes
    tot = pre.agg(F.max("i").alias("d"), F.max("s").alias("s_tot"))

    def best(cand, n_expr, s_expr, len_expr, tot_expr, label):
        # widen BEFORE the square (ADVICE r10) — same rail as
        # timeseries_changepoint
        scored = cand.select(
            "day",
            (
                ratio_units_dec(
                    f"CAST(({s_expr}) AS DECIMAL(38,0)) * ({s_expr})",
                    n_expr,
                    1000,
                )
                + ratio_units_dec(
                    f"CAST(({tot_expr}) - ({s_expr}) AS DECIMAL(38,0))"
                    f" * (({tot_expr}) - ({s_expr}))",
                    f"({len_expr}) - ({n_expr})",
                    1000,
                )
                - ratio_units_dec(
                    f"CAST(({tot_expr}) AS DECIMAL(38,0)) * ({tot_expr})",
                    len_expr,
                    1000,
                )
            ).alias("gain_milli"),
        )
        top = scored.orderBy(F.desc("gain_milli"), F.asc("day")).limit(1)
        return top.select(
            F.lit(label).alias("segment"), "day", "gain_milli"
        )

    root_c = pre.crossJoin(F.broadcast(tot)).filter(F.col("i") < F.col("d"))
    root = best(root_c, "i", "s", "d", "s_tot", "root").localCheckpoint()
    # root split position/prefix as a broadcast 1-row relation
    rsplit = (
        pre.join(root.select(F.col("day").alias("rday")),
                 F.col("day") == F.col("rday"))
        .select(F.col("i").alias("i1"), F.col("s").alias("s1"))
    )
    both = pre.crossJoin(F.broadcast(rsplit)).crossJoin(F.broadcast(tot))
    left_c = both.filter(F.col("i") < F.col("i1"))
    right_c = both.filter(
        (F.col("i") > F.col("i1")) & (F.col("i") < F.col("d"))
    )
    left = best(left_c, "i", "s", "i1", "s1", "left")
    right = best(
        right_c, "i - i1", "s - s1", "d - i1", "s_tot - s1", "right"
    )
    return root.unionByName(left).unionByName(right)


QUERIES["timeseries_changepoint2"] = timeseries_changepoint2

ORACLES["timeseries_changepoint2"] = f"""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), pre AS (
        SELECT day,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        FROM daily
    ), tot AS (
        SELECT CAST(max(i) AS BIGINT) AS d, CAST(max(s) AS BIGINT) AS s_tot
        FROM pre
    ), root AS (
        SELECT 'root' AS segment, day,
               CAST({_sql_rud_ts('CAST(s AS HUGEINT) * s', 'i', 1000)}
                    + {_sql_rud_ts('CAST(s_tot - s AS HUGEINT) * (s_tot - s)', 'd - i', 1000)}
                    - {_sql_rud_ts('CAST(s_tot AS HUGEINT) * s_tot', 'd', 1000)}
                    AS BIGINT) AS gain_milli
        FROM pre CROSS JOIN tot WHERE i < d
        ORDER BY gain_milli DESC, day ASC LIMIT 1
    ), rsplit AS (
        SELECT pre.i AS i1, pre.s AS s1
        FROM pre JOIN root ON pre.day = root.day
    ), lft AS (
        SELECT 'left' AS segment, day,
               CAST({_sql_rud_ts('CAST(s AS HUGEINT) * s', 'i', 1000)}
                    + {_sql_rud_ts('CAST(s1 - s AS HUGEINT) * (s1 - s)', 'i1 - i', 1000)}
                    - {_sql_rud_ts('CAST(s1 AS HUGEINT) * s1', 'i1', 1000)}
                    AS BIGINT) AS gain_milli
        FROM pre CROSS JOIN rsplit CROSS JOIN tot WHERE i < i1
        ORDER BY gain_milli DESC, day ASC LIMIT 1
    ), rgt AS (
        SELECT 'right' AS segment, day,
               CAST({_sql_rud_ts('CAST(s - s1 AS HUGEINT) * (s - s1)', 'i - i1', 1000)}
                    + {_sql_rud_ts(
                        'CAST(s_tot - s AS HUGEINT) * (s_tot - s)',
                        'd - i', 1000)}
                    - {_sql_rud_ts(
                        'CAST(s_tot - s1 AS HUGEINT) * (s_tot - s1)', 'd - i1', 1000)}
                    AS BIGINT) AS gain_milli
        FROM pre CROSS JOIN rsplit CROSS JOIN tot
        WHERE i > i1 AND i < d
        ORDER BY gain_milli DESC, day ASC LIMIT 1
    )
    SELECT * FROM root
    UNION ALL SELECT * FROM lft
    UNION ALL SELECT * FROM rgt
"""


# ----------------------------------------------- cross-correlation
XCF_LAGS = 6


def timeseries_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged CROSS-correlation between the hourly event COUNT and the
    hourly value SUM — timeseries_acf's two-series sibling and the
    lead/lag diagnostic ("does volume lead value, and by how many
    hours") a metrics pipeline runs before causal claims. Lags −XCF…
    +XCF via one broadcast lag spine over the single hourly relation;
    Pearson r per lag with the stats_covar exact-moment discipline
    (DECIMAL(38,0) moments, one double conversion per exact factor,
    portable rounding)."""
    from ..functions.rounding import iunits

    ev = load_table(spark, sf_dir, "events")
    ser = (
        ev.select(
            F.floor(epoch_micros(F.col("ts")) / F.lit(float(STEP_US)))
            .cast("long")
            .alias("b"),
            iunits(F.col("value"), 2).alias("vc"),
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("x"), F.sum("vc").alias("y"))
        .localCheckpoint()
    )
    lags = spark.range(-XCF_LAGS, XCF_LAGS + 1).select(
        F.col("id").alias("lag")
    )
    a = ser.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("b") + F.col("lag")).alias("bj"), F.col("x").alias("xv")
    )
    bb = ser.select(F.col("b").alias("bj"), F.col("y").alias("yv"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = (
        a.join(bb, "bj")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(d(F.col("xv"))).alias("sx"),
            F.sum(d(F.col("yv"))).alias("sy"),
            F.sum(d(F.col("xv")) * d(F.col("yv"))).alias("sxy"),
            F.sum(d(F.col("xv")) * d(F.col("xv"))).alias("sxx"),
            F.sum(d(F.col("yv")) * d(F.col("yv"))).alias("syy"),
        )
    )
    n = d(F.col("n_pairs"))
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "lag",
        "n_pairs",
        F.when(
            (vx <= 0) | (vy <= 0), F.lit(None).cast("double")
        ).otherwise(pround(num / F.sqrt(vx * vy), 6)).alias("xcorr"),
    )


QUERIES["timeseries_xcorr"] = timeseries_xcorr

ORACLES["timeseries_xcorr"] = f"""
    WITH ser AS (
        SELECT CAST(floor(epoch_us(ts) / {float(STEP_US)}) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum({sql_iunits('value', 2)}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), lags AS (
        SELECT unnest(range(-{XCF_LAGS}, {XCF_LAGS + 1})) AS lag
    ), agg AS (
        SELECT lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               sum(CAST(a.x AS HUGEINT)) AS sx,
               sum(CAST(b.y AS HUGEINT)) AS sy,
               sum(CAST(a.x AS HUGEINT) * b.y) AS sxy,
               sum(CAST(a.x AS HUGEINT) * a.x) AS sxx,
               sum(CAST(b.y AS HUGEINT) * b.y) AS syy
        FROM ser a CROSS JOIN lags JOIN ser b ON a.b + lag = b.b
        GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN CAST(n_pairs AS HUGEINT) * sxx - sx * sx <= 0
                  OR CAST(n_pairs AS HUGEINT) * syy - sy * sy <= 0
                THEN NULL
                ELSE {sql_pround(
                    "CAST(n_pairs * sxy - sx * sy AS DOUBLE)"
                    " / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)"
                    " * CAST(n_pairs * syy - sy * sy AS DOUBLE))", 6)}
           END AS xcorr
    FROM agg
"""


# ---------------------------------------------- Ljung–Box portmanteau
# Round 11: the "is there ANY autocorrelation left" test that turns
# timeseries_acf's per-lag readout into one decision scalar — the
# residual-whiteness check a forecasting pipeline (Holt/Holt-Winters/
# backtest_mase) runs before trusting its error bars:
#   Q = n(n+2)·Σ_{k=1..L} r̂_k²/(n−k),  r̂_k = c'_k/c'_0,
# on the DAILY EVENT COUNT series. Exactness: with u_t = n·x_t − S
# (exact integers; the n² factors cancel in the ratio), each term
# snaps |r̂_k| = |c'_k|/c'_0 to NANO-units first (half-up; sign-free
# since only r̂² enters; abs keeps the divide in ratio_units_dec's
# non-negative domain), then squares the ≤1e9 integer — so c'_0
# enters only LINEARLY and never gets squared (ADVICE r11: the
# squared form halved the documented overflow ceiling, and on breach
# Spark DECIMAL silently NULLs while DuckDB HUGEINT errors —
# divergent failure modes). Each term is then the exact rational
# n(n+2)·r̂²_nano/((n−k)·10^18), half-up micro-snapped (the per-term
# snap contract MI and Cramér's V use); Q is their exact sum, within
# one micro per term of the unsnapped statistic. Integer ceiling now:
# 2e9·|c'_k| ≤ 10^38 → c'_0 ≤ 5e28, i.e. days³·daily² with a decade
# of days allows ~1e9 events/day (the originally intended ceiling);
# the n(n+2)·r̂²_nano product tops out at ~1.3e25·2e6 ≪ 10^38. Lags
# follow the calendar-join convention of timeseries_acf (missing
# days skip pairs). The 5% decision compares against χ²(L) in exact
# micros.
#
# Scale: one corpus scan → |days| rows; lags are broadcast joins on
# the calendar-bounded relation; no windows at all.

LB_LAGS = 7
LB_CHI2_5PCT_MICROS = 14_067_140  # χ²(7, 0.95) = 14.067140...


def timeseries_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    tot = ser.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day", "n", (d(F.col("n")) * F.col("x") - F.col("s")).alias("u")
    )
    c0 = u.agg(
        F.max("n").alias("n"),
        F.sum(F.col("u") * F.col("u")).alias("c0"),
    )
    lags = spark.range(1, LB_LAGS + 1).select(F.col("id").alias("lag"))
    x = u.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("day") + F.col("lag")).alias("dj"), F.col("u").alias("ux")
    )
    y = u.select(F.col("day").alias("dj"), F.col("u").alias("uy"))
    ck = (
        x.join(y, "dj")
        .groupBy("lag")
        .agg(F.sum(F.col("ux") * F.col("uy")).alias("ck"))
    )
    rk = (
        ck.crossJoin(F.broadcast(c0))
        .filter(F.col("n") > F.col("lag"))
        .select(
            "lag",
            "n",
            # |r_k| in nano-units: c0 enters only linearly here
            ratio_units_dec(
                "abs(CAST(ck AS DECIMAL(38,0)))",
                "CAST(c0 AS DECIMAL(38,0))",
                1_000_000_000,
            ).alias("rk_nano"),
        )
    )
    terms = rk.select(
        ratio_units_dec(
            "CAST(n AS DECIMAL(38,0)) * (n + 2)"
            " * (CAST(rk_nano AS DECIMAL(38,0)) * rk_nano)",
            "(n - lag) * CAST(1000000000000000000 AS DECIMAL(38,0))",
            1_000_000,
        ).alias("term_micros")
    )
    q = terms.agg(F.sum("term_micros").alias("q_micros")).crossJoin(
        F.broadcast(c0.select("n"))
    )
    return q.select(
        F.col("n").alias("n_days"),
        F.lit(LB_LAGS).cast("int").alias("n_lags"),
        F.col("q_micros").cast("long").alias("q_micros"),
        (F.col("q_micros") > F.lit(LB_CHI2_5PCT_MICROS))
        .cast("int")
        .alias("reject_whiteness_5pct"),
    )


QUERIES["timeseries_ljung_box"] = timeseries_ljung_box

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_lb  # noqa: E402

ORACLES["timeseries_ljung_box"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
        FROM ser
    ), u AS (
        SELECT day, n, CAST(n AS HUGEINT) * x - s AS u FROM ser, tot
    ), c0 AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(sum(u * u) AS HUGEINT) AS c0
        FROM u
    ), ck AS (
        SELECT l.lag, CAST(sum(x.u * y.u) AS HUGEINT) AS ck
        FROM u x
        JOIN (SELECT unnest(range(1, {LB_LAGS + 1})) AS lag) l ON TRUE
        JOIN u y ON x.day + l.lag = y.day
        GROUP BY 1
    ), rk AS (
        SELECT lag, n,
               {_sql_rud_lb('abs(CAST(ck AS HUGEINT))',
                            'CAST(c0 AS HUGEINT)',
                            1_000_000_000)} AS rk_nano
        FROM ck CROSS JOIN c0
        WHERE n > lag
    ), terms AS (
        SELECT {_sql_rud_lb(
            'CAST(n AS HUGEINT) * (n + 2)'
            ' * (CAST(rk_nano AS HUGEINT) * rk_nano)',
            '(n - lag) * CAST(1000000000000000000 AS HUGEINT)',
            1_000_000)} AS term_micros
        FROM rk
    )
    SELECT (SELECT n FROM c0) AS n_days,
           CAST({LB_LAGS} AS INTEGER) AS n_lags,
           CAST(sum(term_micros) AS BIGINT) AS q_micros,
           CAST(sum(term_micros) > {LB_CHI2_5PCT_MICROS} AS INTEGER)
               AS reject_whiteness_5pct
    FROM terms
"""


# ------------------------------------------- Wald–Wolfowitz runs test
# Round 11: the randomness check orthogonal to Ljung–Box — LB sees
# linear autocorrelation, the runs test sees ANY level-dependence in
# the above/below-median SIGN sequence of daily event counts (trend,
# regime stickiness, alternation). Classical form: drop days equal to
# the median, count runs R of consecutive same signs; under H₀,
#   μ_R = 1 + 2n₁n₂/n,  σ²_R = 2n₁n₂(2n₁n₂ − n)/(n²(n − 1)).
# Exactness: the median is the exact LOWER median of daily counts
# (discrete-median idiom both engines share); R, n₁, n₂ are integers;
# μ is a half-up micros rational; z = (R − μ)/σ spends one double
# sqrt under pround. The sign-walk lag runs on the CALENDAR-bounded
# day relation (the whitelisted window class).


def timeseries_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    med = ser.agg(
        F.element_at(
            F.sort_array(F.collect_list("x")),
            ((F.count(F.lit(1)) + 1) / 2).cast("int"),
        ).alias("med")
    )
    signed = (
        ser.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select("day", (F.col("x") > F.col("med")).cast("int").alias("sgn"))
    )
    w = W.orderBy("day")
    runs = signed.select(
        "sgn",
        (
            F.when(
                F.lag("sgn").over(w).isNull()
                | (F.lag("sgn").over(w) != F.col("sgn")),
                1,
            ).otherwise(0)
        ).alias("is_start"),
    )
    agg = runs.agg(
        F.sum("sgn").alias("n1"),
        F.sum(F.lit(1) - F.col("sgn")).alias("n2"),
        F.sum("is_start").alias("runs"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n = F.col("n1") + F.col("n2")
    two_n1n2 = F.lit(2).cast("decimal(38,0)") * d(F.col("n1")) * d(F.col("n2"))
    var = (
        (two_n1n2 * (two_n1n2 - d(n))).cast("double")
        / (d(n) * d(n) * (d(n) - 1)).cast("double")
    )
    return agg.select(
        "n1",
        "n2",
        "runs",
        (
            F.lit(1_000_000)
            + ratio_units_dec(
                "2 * CAST(n1 AS DECIMAL(38,0)) * n2", "n1 + n2", 1_000_000
            )
        ).alias("mu_micros"),
        F.when((n <= 1) | (F.col("n1") == 0) | (F.col("n2") == 0), F.lit(None).cast("double"))
        .otherwise(
            pround(
                (
                    F.col("runs").cast("double")
                    - (
                        F.lit(1.0)
                        + two_n1n2.cast("double") / n.cast("double")
                    )
                )
                / F.sqrt(var),
                6,
            )
        )
        .alias("z"),
    )


QUERIES["timeseries_runs_test"] = timeseries_runs_test

ORACLES["timeseries_runs_test"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), med AS (
        SELECT CAST(quantile_disc(x, 0.5) AS BIGINT) AS med FROM ser
    ), signed AS (
        SELECT day, CAST(x > med AS INTEGER) AS sgn
        FROM ser, med WHERE x != med
    ), runs AS (
        SELECT sgn,
               CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                    OR lag(sgn) OVER (ORDER BY day) != sgn
               THEN 1 ELSE 0 END AS is_start
        FROM signed
    ), agg AS (
        SELECT CAST(sum(sgn) AS BIGINT) AS n1,
               CAST(sum(1 - sgn) AS BIGINT) AS n2,
               CAST(sum(is_start) AS BIGINT) AS runs
        FROM runs
    )
    SELECT n1, n2, runs,
           CAST(1000000 + {_sql_rud_lb('2 * CAST(n1 AS HUGEINT) * n2',
                                       'n1 + n2', 1_000_000)} AS BIGINT)
               AS mu_micros,
           CASE WHEN n1 + n2 <= 1 OR n1 = 0 OR n2 = 0 THEN NULL
                ELSE {sql_pround(
                    '(CAST(runs AS DOUBLE) - (1.0'
                    ' + CAST(2 * CAST(n1 AS HUGEINT) * n2 AS DOUBLE)'
                    ' / CAST(n1 + n2 AS DOUBLE)))'
                    ' / sqrt(CAST(2 * CAST(n1 AS HUGEINT) * n2'
                    '      * (2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2))'
                    '      AS DOUBLE)'
                    ' / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)'
                    '    * CAST(n1 + n2 - 1 AS DOUBLE)))', 6)}
           END AS z
    FROM agg
"""


# --------------------------------------------- Hurst exponent (R/S)
# Round 11: long-range-dependence diagnostic on daily event counts —
# the memory/persistence readout none of the existing battery gives
# (ACF sees fixed lags, Ljung–Box aggregates them; H says whether
# shocks persist (H>0.5), mean-revert (H<0.5), or random-walk (0.5)).
# Classical rescaled-range: for block sizes m ∈ {4,8,16}, partition
# the day-indexed series into FULL blocks, per block compute the
# range of mean-centered partial sums R and the population std S,
# take log(R/S), average per m, and fit log(R/S) ~ H·log m.
#
# Exactness rail: everything up to the logs is INTEGER —
# m·Z_j = m·cumsum_j − (j+1)·S_m, R·m = max − min of those,
# (S·m)² = m·Σx² − S_m², and log(R/S) = ½·[ln((Rm)²) − ln((Sm)²)]
# with both ln arguments exact integers (the ln-snap contract,
# nano-units). Degenerate blocks (zero range or zero variance) are
# excluded by contract. The per-m means and the 3-point OLS run in
# doubles built from exact integers with identical formulas both
# engines (the text_heaps_fit pattern), pround(6).
#
# Scale: the day spine is calendar-bounded (whitelisted window
# class); blocks for all three m values come from ONE pass over it.

HURST_BLOCKS = (4, 8, 16)


def timeseries_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    idx = ser.select(
        (F.row_number().over(W.orderBy("day")) - 1).alias("i"), "x"
    )
    ms = spark.range(0).sparkSession.createDataFrame(
        [(m,) for m in HURST_BLOCKS], "m long"
    )
    b = idx.crossJoin(F.broadcast(ms)).select(
        "m", F.expr("i div m").alias("blk"), (F.col("i") % F.col("m")).alias("j"), "x"
    )
    wb = (
        W.partitionBy("m", "blk")
        .orderBy("j")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    dec = "decimal(38,0)"
    per_row = b.select(
        "m",
        "blk",
        "j",
        "x",
        F.sum("x").over(wb).alias("cum"),
        F.count(F.lit(1)).over(W.partitionBy("m", "blk")).alias("cnt"),
        F.sum("x").over(W.partitionBy("m", "blk")).alias("sm"),
        F.sum((F.col("x").cast(dec) * F.col("x")).cast(dec))
        .over(W.partitionBy("m", "blk"))
        .alias("sxx"),
    ).filter(F.col("cnt") == F.col("m"))
    z = per_row.select(
        "m",
        "blk",
        "sm",
        "sxx",
        (
            F.col("m").cast(dec) * F.col("cum")
            - (F.col("j") + 1).cast(dec) * F.col("sm")
        ).alias("mz"),
    )
    blocks = z.groupBy("m", "blk").agg(
        (F.max("mz") - F.min("mz")).alias("rm"),
        (
            F.first("m").cast(dec) * F.first("sxx")
            - F.first("sm").cast(dec) * F.first("sm")
        ).alias("sm2"),
    ).filter((F.col("rm") > 0) & (F.col("sm2") > 0))
    # keep y = ln((R/S)²) = 2·ln(R/S): no halving of a signed integer
    # (truncating div vs floor div diverge on negative odds — the
    # exactness-rail trap) — the factor 2 moves into the final slope
    ln9 = lambda c: iunits(F.log(c.cast("double")), 9)  # noqa: E731
    per_block = blocks.select(
        "m",
        (ln9(F.col("rm") * F.col("rm")) - ln9(F.col("sm2"))).alias(
            "lnrs2_nanos"
        ),
    )
    per_m = per_block.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("lnrs2_nanos").alias("sum_lnrs2_nanos"),
    )
    pts = per_m.select(
        "m",
        "n_blocks",
        "sum_lnrs2_nanos",
        ln9(F.col("m")).alias("x_nanos"),
        (
            F.col("sum_lnrs2_nanos").cast("double")
            / F.col("n_blocks").cast("double")
        ).alias("y_nanos"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x_nanos").cast("double")).alias("sx"),
        F.sum("y_nanos").alias("sy"),
        F.sum(F.col("x_nanos").cast("double") * F.col("y_nanos")).alias("sxy"),
        F.sum(
            F.col("x_nanos").cast("double") * F.col("x_nanos").cast("double")
        ).alias("sxx"),
    ).select(
        pround(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / F.lit(2.0),  # y was 2·ln(R/S)
            6,
        ).alias("hurst_h")
    )
    return (
        pts.select(
            "m",
            "n_blocks",
            "sum_lnrs2_nanos",
        )
        .crossJoin(F.broadcast(fit))
    )


QUERIES["timeseries_hurst_rs"] = timeseries_hurst_rs

from ..functions.rounding import sql_iunits as _sql_iu_hr  # noqa: E402

_HR_LN9 = lambda e: _sql_iu_hr(f"ln(CAST(({e}) AS DOUBLE))", 9)  # noqa: E731

ORACLES["timeseries_hurst_rs"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), idx AS (
        SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i, x
        FROM ser
    ), b AS (
        SELECT m, i // m AS blk, i % m AS j, x
        FROM idx, (SELECT unnest([{', '.join(str(m) for m in HURST_BLOCKS)}])
                   AS m) ms
    ), per_row AS (
        SELECT m, blk, j, x,
               CAST(sum(x) OVER (PARTITION BY m, blk ORDER BY j
                    ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum,
               CAST(count(*) OVER (PARTITION BY m, blk) AS BIGINT) AS cnt,
               CAST(sum(x) OVER (PARTITION BY m, blk) AS HUGEINT) AS sm,
               CAST(sum(CAST(x AS HUGEINT) * x) OVER (PARTITION BY m, blk)
                    AS HUGEINT) AS sxx
        FROM b
    ), z AS (
        SELECT m, blk, sm, sxx,
               CAST(m AS HUGEINT) * cum - (j + 1) * sm AS mz
        FROM per_row WHERE cnt = m
    ), blocks AS (
        SELECT m, blk,
               CAST(max(mz) - min(mz) AS HUGEINT) AS rm,
               CAST(first(m) * first(sxx) - first(sm) * first(sm)
                    AS HUGEINT) AS sm2
        FROM z GROUP BY m, blk
        HAVING CAST(max(mz) - min(mz) AS HUGEINT) > 0
           AND CAST(first(m) * first(sxx) - first(sm) * first(sm)
                    AS HUGEINT) > 0
    ), per_block AS (
        SELECT m,
               CAST({_HR_LN9('rm * rm')} - {_HR_LN9('sm2')}
                    AS BIGINT) AS lnrs2_nanos
        FROM blocks
    ), per_m AS (
        SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(lnrs2_nanos) AS BIGINT) AS sum_lnrs2_nanos
        FROM per_block GROUP BY m
    ), pts AS (
        SELECT m, n_blocks, sum_lnrs2_nanos,
               CAST({_HR_LN9('m')} AS DOUBLE) AS xn,
               CAST(sum_lnrs2_nanos AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                   AS yn
        FROM per_m
    ), fit AS (
        SELECT {sql_pround(
            '(count(*) * sum(xn * yn) - sum(xn) * sum(yn))'
            ' / (count(*) * sum(xn * xn) - sum(xn) * sum(xn)) / 2.0', 6)}
            AS hurst_h
        FROM pts
    )
    SELECT m, n_blocks, sum_lnrs2_nanos, hurst_h
    FROM pts CROSS JOIN fit
"""


# ------------------------------------------- Lo–MacKinlay variance ratio
# Round 12: the random-walk diagnostic next to the runs test and
# Ljung–Box — VR(q) = Var(q-period increments)/(q·Var(1-period
# increments)) on the daily event-count series: ≈1 under independent
# increments, >1 for trending (positively autocorrelated) series,
# <1 for mean-reverting ones (Lo & MacKinlay 1988). Exactness: both
# increment families come from CALENDAR self-joins (day+1 / day+q —
# the timeseries_xcorr convention: missing days skip pairs, no
# window), variances from the integer moment identity n·Σd² − (Σd)²
# on the DECIMAL(38,0)/HUGEINT rail, and the ratio is one half-up
# micros rational of exact integers. Ceiling: (n_q·Σd_q² − (Σd_q)²)
# · n₁(n₁−1) · 2e6 must fit 10^38 — true to ~1e9 events/day over a
# decade (the Ljung–Box class). Scale: one scan → day grain, two
# broadcast-able self-joins on the calendar axis, 1-row output.

VR_Q = 5


def timeseries_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact (already a
    # materialized LogicalRDD, so multi-consumer reuse is free)
    ser = _daily_event_counts(spark, sf_dir)

    def diffs(lag: int) -> DataFrame:
        a, b = ser.alias("a"), ser.alias("b")
        return a.join(
            b, F.col("a.day") + F.lit(lag) == F.col("b.day")
        ).select((F.col("b.x") - F.col("a.x")).alias("d"))

    def moments(df: DataFrame, pre: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(f"n{pre}"),
            F.sum("d").alias(f"s{pre}"),
            F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias(
                f"q{pre}"
            ),
        )

    m = moments(diffs(1), "1").crossJoin(moments(diffs(VR_Q), "q"))
    var1 = "(CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * s1)"
    varq = "(CAST(nq AS DECIMAL(38,0)) * qq - CAST(sq AS DECIMAL(38,0)) * sq)"
    return m.select(
        F.col("n1").cast("long").alias("n_1diffs"),
        F.col("nq").cast("long").alias("n_qdiffs"),
        F.when(
            (F.col("n1") < 2) | (F.col("nq") < 2) | (F.expr(var1) == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units_dec(
                f"{varq} * (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1))",
                f"{VR_Q} * {var1}"
                " * (CAST(nq AS DECIMAL(38,0)) * (nq - 1))",
            )
        )
        .alias("vr_micros"),
    )


QUERIES["timeseries_variance_ratio"] = timeseries_variance_ratio

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_vr  # noqa: E402

_VR_VAR1 = "(CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)"
_VR_VARQ = "(CAST(nq AS HUGEINT) * qq - CAST(sq AS HUGEINT) * sq)"

ORACLES["timeseries_variance_ratio"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), d1 AS (
        SELECT b.x - a.x AS d FROM ser a JOIN ser b ON a.day + 1 = b.day
    ), dq AS (
        SELECT b.x - a.x AS d FROM ser a JOIN ser b ON a.day + {VR_Q} = b.day
    ), m AS (
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n1,
            (SELECT CAST(coalesce(sum(d), 0) AS BIGINT) FROM d1) AS s1,
            (SELECT CAST(coalesce(sum(CAST(d AS HUGEINT) * d), 0) AS HUGEINT)
             FROM d1) AS q1,
            (SELECT CAST(count(*) AS BIGINT) FROM dq) AS nq,
            (SELECT CAST(coalesce(sum(d), 0) AS BIGINT) FROM dq) AS sq,
            (SELECT CAST(coalesce(sum(CAST(d AS HUGEINT) * d), 0) AS HUGEINT)
             FROM dq) AS qq
    )
    SELECT n1 AS n_1diffs, nq AS n_qdiffs,
           CASE WHEN n1 < 2 OR nq < 2 OR {_VR_VAR1} = 0 THEN NULL
                ELSE {_sql_rud_vr(
                    f'{_VR_VARQ} * (CAST(n1 AS HUGEINT) * (n1 - 1))',
                    f'{VR_Q} * {_VR_VAR1}'
                    ' * (CAST(nq AS HUGEINT) * (nq - 1))')}
           END AS vr_micros
    FROM m
"""


# --------------------------------------------------- AR(1) half-life
# Round 12: the mean-reversion SPEED readout next to the whiteness
# (Ljung-Box), randomness (runs), memory (Hurst) and random-walk
# (variance-ratio) panels: fit AR(1) by Yule-Walker on daily event
# counts — φ̂ = c₁/c₀ on the demeaned series — and report the
# half-life H = ln2 / (−ln φ̂) days, the number a capacity planner
# actually uses ("how long until a load shock decays by half").
# Same integer rail as Ljung-Box: u_i = n·x_i − S (exact scaled
# deviations), c₀ = Σu², c₁ = Σu_iu_{i+1} on a day-adjacency
# equi-join — no window, gap days simply drop pairs. φ̂ is a signed
# DECIMAL micros rational; for 0 < φ̂ < 1 the half-life divides the
# nano-snapped ln 2 by ln c₀ − ln c₁ (each ln takes an exact positive
# integer, nano-snapped — c₀ enters linearly, the ADVICE r11
# discipline), one half-up micros rational; φ̂ ≤ 0 (oscillating /
# white) and φ̂ ≥ 1 (non-stationary — includes the snapped-ratio
# degenerate L₀ = L₁) report NULL, not ∞. Scale: calendar-grain
# (≤ n_days rows) after one events scan.

LN2_NANOS = 693_147_181  # floor(ln(2)·1e9 + 0.5)


def timeseries_ar1_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import (
        iunits,
        ratio_units,
        ratio_units_dec_signed,
    )

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    tot = ser.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day", "n", (d(F.col("n")) * F.col("x") - F.col("s")).alias("u")
    )
    nxt = u.select((F.col("day") - 1).alias("day"), F.col("u").alias("u1"))
    m = (
        u.join(nxt, "day", "left")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("u") * F.col("u")).alias("c0"),
            F.sum(F.col("u") * F.col("u1")).alias("c1"),
            F.sum(F.when(F.col("u1").isNotNull(), 1).otherwise(0)).alias(
                "n_pairs"
            ),
        )
    )
    phi_ok = (F.col("c0") > 0) & (F.col("c1") > 0) & (F.col("c1") < F.col("c0"))
    base = m.select(
        "n",
        "n_pairs",
        "c0",
        "c1",
        F.when(
            F.col("c0") > 0, iunits(F.log(F.col("c0").cast("double")), 9)
        ).alias("l0"),
        F.when(
            F.col("c1") > 0, iunits(F.log(F.col("c1").cast("double")), 9)
        ).alias("l1"),
    )
    return base.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.when(F.col("c0") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec_signed("CAST(c1 AS DECIMAL(38,0))", "c0", off=16)
        )
        .alias("phi_micros"),
        F.when(~phi_ok | (F.col("l0") <= F.col("l1")), F.lit(None).cast("long"))
        .otherwise(ratio_units(str(LN2_NANOS), "l0 - l1"))
        .alias("halflife_days_micros"),
    )


QUERIES["timeseries_ar1_halflife"] = timeseries_ar1_halflife


from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_ar1,
    sql_ratio_units as _sql_ru_ar1,
    sql_ratio_units_dec_signed as _sql_ruds_ar1,
)

ORACLES["timeseries_ar1_halflife"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
        FROM ser
    ), u AS (
        SELECT day, n, CAST(n AS HUGEINT) * x - s AS u
        FROM ser CROSS JOIN tot
    ), m AS (
        SELECT max(a.n) AS n,
               CAST(sum(a.u * a.u) AS HUGEINT) AS c0,
               CAST(sum(a.u * b.u) AS HUGEINT) AS c1,
               CAST(sum(CASE WHEN b.u IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pairs
        FROM u a LEFT JOIN u b ON b.day = a.day + 1
    ), base AS (
        SELECT n, n_pairs, c0, c1,
               CASE WHEN c0 > 0
                    THEN {_sql_iu_ar1('ln(CAST(c0 AS DOUBLE))', 9)} END AS l0,
               CASE WHEN c1 > 0
                    THEN {_sql_iu_ar1('ln(CAST(c1 AS DOUBLE))', 9)} END AS l1
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_days, n_pairs,
           CASE WHEN c0 = 0 THEN NULL
                ELSE {_sql_ruds_ar1('c1', 'c0', off=16)}
           END AS phi_micros,
           CASE WHEN c0 <= 0 OR c1 <= 0 OR c1 >= c0 OR l0 <= l1 THEN NULL
                ELSE {_sql_ru_ar1(str(LN2_NANOS), 'l0 - l1')}
           END AS halflife_days_micros
    FROM base
"""


# ------------------------------------------------ seasonal periodogram
# Round 12: an EXACT-integer Fourier periodogram at the calendar's
# candidate seasonal frequencies — seasonal_strength answers "how
# much variance is weekly", this answers WHICH of the candidate
# periods {7, 14, 30} carries the energy (the dial a rollup/forecast
# pipeline needs before choosing its season length). The trick that
# keeps it on the integer rail: at period p the DFT only ever
# evaluates cos/sin at the p phases 2πk/p, so both bases enter as
# FIXED micro-snapped integer tables (module literals shared with the
# oracle text — no runtime trig in either engine); with the u-rail's
# exact scaled deviations u_t = d·x_t − T, the Fourier sums
# A_p = Σ u_t·c_p[t mod p], B_p = Σ u_t·s_p[t mod p] are exact
# BIGINTs, power A²+B² rides DECIMAL, and each period's energy share
# is a micros rational. Phase uses the absolute epoch-day mod p —
# power is phase-invariant, so no min-day pass. Dominant period =
# max power, period-asc tie-break, decided on exact integers.

PG_PERIODS = [7, 14, 30]


def _pg_tables() -> dict[int, tuple[list[int], list[int]]]:
    import math as _m

    out = {}
    for p in PG_PERIODS:
        cs = [
            _m.floor(_m.cos(2 * _m.pi * k / p) * 1e6 + 0.5) for k in range(p)
        ]
        sn = [
            _m.floor(_m.sin(2 * _m.pi * k / p) * 1e6 + 0.5) for k in range(p)
        ]
        out[p] = (cs, sn)
    return out


PG_TABLES = _pg_tables()


def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    tot = ser.agg(F.count(F.lit(1)).alias("d"), F.sum("x").alias("t"))
    dec = "decimal(38,0)"
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("d").cast(dec) * F.col("x") - F.col("t")).alias("u"),
    )
    aggs = []
    for p in PG_PERIODS:
        cs, sn = PG_TABLES[p]
        carr = f"array({', '.join(f'CAST({c} AS BIGINT)' for c in cs)})"
        sarr = f"array({', '.join(f'CAST({s} AS BIGINT)' for s in sn)})"
        aggs.append(
            F.sum(
                F.col("u") * F.expr(f"element_at({carr}, CAST(pmod(day, {p}) AS INT) + 1)")
            ).alias(f"a_{p}")
        )
        aggs.append(
            F.sum(
                F.col("u") * F.expr(f"element_at({sarr}, CAST(pmod(day, {p}) AS INT) + 1)")
            ).alias(f"b_{p}")
        )
    m = u.agg(*aggs)
    rows = m.selectExpr(
        "stack("
        + str(len(PG_PERIODS))
        + ", "
        + ", ".join(f"{p}, a_{p}, b_{p}" for p in PG_PERIODS)
        + ") AS (period, a, b)"
    ).select(
        "period",
        F.col("a").cast("long").alias("a_units"),
        F.col("b").cast("long").alias("b_units"),
        (
            F.col("a").cast(dec) * F.col("a")
            + F.col("b").cast(dec) * F.col("b")
        ).alias("power"),
    )
    tp = rows.agg(F.sum("power").alias("ptot"))
    scored = rows.crossJoin(F.broadcast(tp))
    from pyspark.sql import Window as W

    rw = W.orderBy(F.desc("power"), F.asc("period"))
    return (
        scored.withColumn("rn", F.row_number().over(rw))
        .select(
            F.col("period").cast("int").alias("period"),
            "a_units",
            "b_units",
            F.when(F.col("ptot") == 0, F.lit(None).cast("long"))
            .otherwise(ratio_units_dec("power", "ptot"))
            .alias("power_share_micros"),
            (F.col("rn") == 1).cast("int").alias("is_dominant"),
        )
        .orderBy("period")
    )


QUERIES["timeseries_periodogram"] = timeseries_periodogram

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_pg  # noqa: E402


def _pg_sql() -> str:
    pieces = []
    for p in PG_PERIODS:
        cs, sn = PG_TABLES[p]
        clist = "[" + ", ".join(str(c) for c in cs) + "]"
        slist = "[" + ", ".join(str(s) for s in sn) + "]"
        pieces.append(
            f"""SELECT {p} AS period,
               CAST(sum(u * ({clist}::BIGINT[])
                    [CAST(day % {p} AS INTEGER) + 1]) AS BIGINT) AS a,
               CAST(sum(u * ({slist}::BIGINT[])
                    [CAST(day % {p} AS INTEGER) + 1]) AS BIGINT) AS b
            FROM u"""
        )
    body = " UNION ALL ".join(pieces)
    return f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(x) AS BIGINT) AS t
        FROM ser
    ), u AS (
        SELECT day, CAST(d AS HUGEINT) * x - t AS u
        FROM ser CROSS JOIN tot
    ), rows_ AS (
        SELECT period, a, b,
               CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b AS power
        FROM ({body})
    ), tp AS (
        SELECT CAST(sum(power) AS HUGEINT) AS ptot FROM rows_
    ), ranked AS (
        SELECT period, a, b, power, ptot,
               row_number() OVER (ORDER BY power DESC, period ASC) AS rn
        FROM rows_ CROSS JOIN tp
    )
    SELECT CAST(period AS INTEGER) AS period,
           a AS a_units, b AS b_units,
           CASE WHEN ptot = 0 THEN NULL
                ELSE {_sql_rud_pg('power', 'ptot')}
           END AS power_share_micros,
           CAST(rn = 1 AS INTEGER) AS is_dominant
    FROM ranked
    ORDER BY period
"""


ORACLES["timeseries_periodogram"] = _pg_sql()


# --------------------------------------------- Mann–Kendall trend test
# Round 12: the nonparametric SIGNIFICANCE companion to Theil–Sen —
# theil_sen reports the robust slope, Mann–Kendall (1945/1975) says
# whether a monotone trend exists at all, from nothing but pairwise
# sign comparisons: S = Σ_{i<j} sign(x_j − x_i) over the daily
# series, with the tie-corrected variance
# 18·Var(S) = n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5) and the
# continuity-corrected z² = 18·(|S|−1)²/(18·Var) — every quantity an
# exact integer, the 5% decision the cross-multiplied
# 10⁶·18·(|S|−1)² > 3841459·(18·Var) inequality. No doubles, no
# ranks, no windows: one day-grain self-join (≤ n_days² pairs — the
# calendar axis is bounded) + one value-grain tie tally.

MK_CHI2_5PCT_MICROS = 3_841_459


def timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact (already a
    # materialized LogicalRDD, so multi-consumer reuse is free)
    ser = _daily_event_counts(spark, sf_dir)
    a, b = ser.alias("a"), ser.alias("b")
    s_rel = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(
                F.signum((F.col("b.x") - F.col("a.x")).cast("double")).cast(
                    "long"
                )
            ).alias("s")
        )
    )
    ties = (
        ser.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("t").alias("n"),
            F.sum(
                F.expr(
                    "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)"
                )
            ).alias("tie_term"),
        )
    )
    dec = "decimal(38,0)"
    m = s_rel.crossJoin(F.broadcast(ties))
    var18 = (
        f"(CAST(n AS {dec}) * (n - 1) * (2 * n + 5) - tie_term)"
    )
    num = f"(18 * CAST((abs(s) - 1) AS {dec}) * (abs(s) - 1))"
    degenerate = (F.col("n") < 2) | (F.expr(var18) <= 0) | (F.col("s") == 0)
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.expr(var18).cast("long").alias("var_s_x18"),
        F.when(F.col("s") == 0, F.lit(0))
        .otherwise(F.expr("CAST(sign(s) AS INT)"))
        .alias("trend_sign"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec(num, var18))
        .alias("z2_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr(f"1000000 * {num}")
                > F.expr(f"{MK_CHI2_5PCT_MICROS} * {var18}")
            ).cast("int")
        )
        .alias("significant_5pct"),
    )


QUERIES["timeseries_mann_kendall"] = timeseries_mann_kendall

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_mk,
)

_MK_VAR18 = "(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tie_term)"
_MK_NUM = "(18 * CAST((abs(s) - 1) AS HUGEINT) * (abs(s) - 1))"

ORACLES["timeseries_mann_kendall"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), s_rel AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM ser a JOIN ser b ON a.day < b.day
    ), ties AS (
        SELECT CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                    AS HUGEINT) AS tie_term
        FROM (SELECT x, CAST(count(*) AS BIGINT) AS t
              FROM ser GROUP BY 1)
    )
    SELECT n AS n_days,
           s AS s_stat,
           CAST({_MK_VAR18} AS BIGINT) AS var_s_x18,
           CASE WHEN s = 0 THEN 0
                ELSE CAST(sign(s) AS INTEGER) END AS trend_sign,
           CASE WHEN n < 2 OR {_MK_VAR18} <= 0 OR s = 0 THEN NULL
                ELSE {_sql_rud_mk(_MK_NUM, _MK_VAR18)}
           END AS z2_micros,
           CASE WHEN n < 2 OR {_MK_VAR18} <= 0 OR s = 0 THEN NULL
                ELSE CAST(1000000 * {_MK_NUM}
                          > {MK_CHI2_5PCT_MICROS} * {_MK_VAR18}
                          AS INTEGER)
           END AS significant_5pct
    FROM s_rel CROSS JOIN ties
"""


# ------------------------------------------ SES grid model selection
# Round 12: the MODEL-SELECTION layer the smoothing family was
# missing — ewma/holt/holt_winters run at fixed α; a forecasting
# pipeline picks α by backtest SSE (the "optimize smoothing
# parameters" loop every ETS library runs). Deterministic grid:
# α ∈ {0.2, 0.5, 0.8}, each as a TRUNCATED (8-tap), RENORMALIZED
# linear filter whose weights are micro-snapped integer literals
# shared with the oracle (the periodogram discipline) — renormalizing
# Σw = 1 removes the truncation-mass bias that would otherwise rig
# the comparison toward large α. One-step-ahead forecast
# x̂_t = Σ_j W_α[j]·x_{t−1−j} over days with ALL 8 lags present
# (exact micro-unit integers); SSE_α = Σ(10⁶·x_t − x̂_t)² rides
# DECIMAL and is reported div 10¹² (counts² scale); the winner is
# the exact integer argmin with α-asc tie-break. Scale:
# calendar-grain lag equi-joins (8-row broadcast), never a window.

SES_ALPHAS = [0.2, 0.5, 0.8]
SES_TAPS = 8


def _ses_weights() -> dict[int, list[int]]:
    import math as _m

    out = {}
    for a in SES_ALPHAS:
        raw = [a * (1 - a) ** j for j in range(SES_TAPS)]
        tot = sum(raw)
        out[int(a * 1_000_000)] = [
            _m.floor(w / tot * 1e6 + 0.5) for w in raw
        ]
    return out


SES_WEIGHTS = _ses_weights()


def timeseries_ses_gridsearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact (already a
    # materialized LogicalRDD, so multi-consumer reuse is free)
    ser = _daily_event_counts(spark, sf_dir)
    offs = spark.range(1, SES_TAPS + 1).select(
        F.col("id").cast("int").alias("j")
    )
    contrib = ser.crossJoin(F.broadcast(offs)).select(
        (F.col("day") + F.col("j")).alias("t"), "j", F.col("x").alias("xl")
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n_lags")]
    for am, ws in SES_WEIGHTS.items():
        arr = f"array({', '.join(f'CAST({w} AS BIGINT)' for w in ws)})"
        aggs.append(
            F.sum(
                F.col("xl") * F.expr(f"element_at({arr}, j)")
            ).alias(f"f_{am}")
        )
    fc = contrib.groupBy("t").agg(*aggs).filter(
        F.col("n_lags") == SES_TAPS
    )
    joined = fc.join(ser.select(F.col("day").alias("t"), "x"), "t")
    sses = []
    for am in SES_WEIGHTS:
        r = f"(CAST(x AS {dec}) * 1000000 - f_{am})"
        sses.append(
            F.sum(F.expr(f"{r} * {r}")).alias(f"sse_{am}")
        )
    m = joined.agg(F.count(F.lit(1)).alias("n_scored"), *sses)
    rows = m.selectExpr(
        "n_scored",
        "stack("
        + str(len(SES_WEIGHTS))
        + ", "
        + ", ".join(f"{am}, sse_{am}" for am in SES_WEIGHTS)
        + ") AS (alpha_micros, sse)"
    )
    rw = W.orderBy(F.asc("sse"), F.asc("alpha_micros"))
    return (
        rows.withColumn("rn", F.row_number().over(rw))
        .select(
            F.col("alpha_micros").cast("long").alias("alpha_micros"),
            F.col("n_scored").cast("long").alias("n_scored"),
            F.expr("sse div 1000000000000").cast("long").alias("sse_units"),
            (F.col("rn") == 1).cast("int").alias("is_best"),
        )
        .orderBy("alpha_micros")
    )


QUERIES["timeseries_ses_gridsearch"] = timeseries_ses_gridsearch


def _ses_sql() -> str:
    alpha_rows = []
    for am, ws in SES_WEIGHTS.items():
        wlist = "[" + ", ".join(str(w) for w in ws) + "]"
        alpha_rows.append(
            f"""SELECT {am} AS alpha_micros,
               CAST(sum(r * r) AS HUGEINT) AS sse,
               CAST(count(*) AS BIGINT) AS n_scored
            FROM (
                SELECT CAST(x AS HUGEINT) * 1000000
                       - CAST(f AS HUGEINT) AS r
                FROM (
                    SELECT t,
                           CAST(sum(xl * ({wlist}::BIGINT[])[j])
                                AS BIGINT) AS f,
                           CAST(count(*) AS BIGINT) AS n_lags
                    FROM contrib GROUP BY t
                ) fc
                JOIN ser ON ser.day = fc.t
                WHERE n_lags = {SES_TAPS}
            )"""
        )
    body = " UNION ALL ".join(alpha_rows)
    return f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), contrib AS (
        SELECT day + CAST(o.range AS INTEGER) AS t,
               CAST(o.range AS INTEGER) AS j,
               x AS xl
        FROM ser, range(1, {SES_TAPS + 1}) o
    ), grid AS ({body}),
    ranked AS (
        SELECT alpha_micros, n_scored, sse,
               row_number() OVER (
                   ORDER BY sse ASC, alpha_micros ASC
               ) AS rn
        FROM grid
    )
    SELECT CAST(alpha_micros AS BIGINT) AS alpha_micros,
           n_scored,
           CAST(sse // 1000000000000 AS BIGINT) AS sse_units,
           CAST(rn = 1 AS INTEGER) AS is_best
    FROM ranked
    ORDER BY alpha_micros
"""


ORACLES["timeseries_ses_gridsearch"] = _ses_sql()


# -------------------------------------------- spectral entropy / flatness
# Round 13: the periodogram's single-number summary — Shannon entropy
# of the seasonal energy distribution over candidate periods 2..30
# (the "is there ANY calendar structure" dial: white noise spreads
# energy flat, entropy -> ln(29); one strong season concentrates it,
# entropy -> 0). Same exact-integer rail as timeseries_periodogram:
# micro-snapped module-literal trig tables (no runtime trig), exact
# BIGINT Fourier sums over the u-deviation rail, DECIMAL powers, and
# per-period energy SHARES as exact micros rationals. The entropy is
# then computed over the SNAPPED shares (identical integers in both
# engines): H_nanos = -Σ s_p · lnunits(s_p/1e6) div 1e6 — the
# text_entropy_by_lang c·ln(c) discipline, products and sum exact
# BIGINT, one ln-snap per period. Flatness = H / ln(|P|) as a micros
# rational against a PYTHON-precomputed ln(29) nano literal.
# Scale: day-grain series (bounded by span), one aggregate pass with
# 2·29 conditional sums, one 29-row reduce.

SE_PERIODS = list(range(2, 31))


def _se_tables() -> dict[int, tuple[list[int], list[int]]]:
    import math as _m

    out = {}
    for p in SE_PERIODS:
        cs = [
            _m.floor(_m.cos(2 * _m.pi * k / p) * 1e6 + 0.5) for k in range(p)
        ]
        sn = [
            _m.floor(_m.sin(2 * _m.pi * k / p) * 1e6 + 0.5) for k in range(p)
        ]
        out[p] = (cs, sn)
    return out


SE_TABLES = _se_tables()
# floor(ln(29)*1e9 + 0.5): ln(29) = 3.367295829986474...
SE_LN_NP_NANOS = 3367295830


def timeseries_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units, ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    tot = ser.agg(F.count(F.lit(1)).alias("d"), F.sum("x").alias("t"))
    dec = "decimal(38,0)"
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("d").cast(dec) * F.col("x") - F.col("t")).alias("u"),
    )
    aggs = []
    for p in SE_PERIODS:
        cs, sn = SE_TABLES[p]
        carr = f"array({', '.join(f'CAST({c} AS BIGINT)' for c in cs)})"
        sarr = f"array({', '.join(f'CAST({s} AS BIGINT)' for s in sn)})"
        aggs.append(
            F.sum(
                F.col("u")
                * F.expr(f"element_at({carr}, CAST(pmod(day, {p}) AS INT) + 1)")
            ).alias(f"a_{p}")
        )
        aggs.append(
            F.sum(
                F.col("u")
                * F.expr(f"element_at({sarr}, CAST(pmod(day, {p}) AS INT) + 1)")
            ).alias(f"b_{p}")
        )
    m = u.agg(*aggs)
    rows = m.selectExpr(
        "stack("
        + str(len(SE_PERIODS))
        + ", "
        + ", ".join(f"{p}, a_{p}, b_{p}" for p in SE_PERIODS)
        + ") AS (period, a, b)"
    ).select(
        "period",
        (
            F.col("a").cast(dec) * F.col("a")
            + F.col("b").cast(dec) * F.col("b")
        ).alias("power"),
    )
    tp = rows.agg(
        F.sum("power").alias("ptot"), F.count(F.lit(1)).alias("np")
    )
    shares = rows.crossJoin(F.broadcast(tp)).select(
        "period",
        "power",
        F.when(F.col("ptot") <= 0, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec("power", "ptot"))
        .alias("s"),
    )
    from pyspark.sql import Window as W

    rw = W.orderBy(F.desc("power"), F.asc("period"))
    ranked = shares.withColumn("rn", F.row_number().over(rw))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.max(F.when(F.col("rn") == 1, F.col("period"))).alias(
            "dominant_period"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("s"))).alias(
            "dominant_share_micros"
        ),
        F.sum(
            F.when(
                F.col("s") > 0,
                F.col("s")
                * iunits(
                    F.log(F.col("s").cast("double") / F.lit(1000000.0)), 9
                ),
            ).otherwise(F.lit(0))
        ).alias("_slns"),
        F.max(F.col("s").isNull().cast("int")).alias("_degen"),
    )
    ent = F.expr("(- _slns) div 1000000")
    return agg.select(
        F.col("n_periods").cast("long").alias("n_periods"),
        F.when(F.col("_degen") == 1, F.lit(None).cast("int"))
        .otherwise(F.col("dominant_period").cast("int"))
        .alias("dominant_period"),
        F.col("dominant_share_micros").cast("long").alias(
            "dominant_share_micros"
        ),
        F.when(F.col("_degen") == 1, F.lit(None).cast("long"))
        .otherwise(ent.cast("long"))
        .alias("spectral_entropy_nanos"),
        F.when(F.col("_degen") == 1, F.lit(None).cast("long"))
        .otherwise(
            ratio_units(f"(- _slns) div 1000000", str(SE_LN_NP_NANOS))
        )
        .alias("flatness_micros"),
    )


QUERIES["timeseries_spectral_entropy"] = timeseries_spectral_entropy

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_se,
    sql_ratio_units as _sql_ru_se,
    sql_ratio_units_dec as _sql_rud_se,
)


def _se_sql() -> str:
    pieces = []
    for p in SE_PERIODS:
        cs, sn = SE_TABLES[p]
        clist = "[" + ", ".join(str(c) for c in cs) + "]"
        slist = "[" + ", ".join(str(s) for s in sn) + "]"
        pieces.append(
            f"""SELECT {p} AS period,
               CAST(sum(u * ({clist}::BIGINT[])
                    [CAST(day % {p} AS INTEGER) + 1]) AS BIGINT) AS a,
               CAST(sum(u * ({slist}::BIGINT[])
                    [CAST(day % {p} AS INTEGER) + 1]) AS BIGINT) AS b
            FROM u"""
        )
    body = " UNION ALL ".join(pieces)
    lns = _sql_iu_se("ln(CAST(s AS DOUBLE) / 1000000.0)", 9)
    return f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(x) AS BIGINT) AS t
        FROM ser
    ), u AS (
        SELECT day, CAST(d AS HUGEINT) * x - t AS u
        FROM ser CROSS JOIN tot
    ), rows_ AS (
        SELECT period,
               CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b AS power
        FROM ({body})
    ), tp AS (
        SELECT CAST(sum(power) AS HUGEINT) AS ptot,
               CAST(count(*) AS BIGINT) AS np
        FROM rows_
    ), shares AS (
        SELECT period, power,
               CASE WHEN ptot <= 0 THEN NULL
                    ELSE {_sql_rud_se('power', 'ptot')} END AS s
        FROM rows_ CROSS JOIN tp
    ), ranked AS (
        SELECT period, power, s,
               row_number() OVER (ORDER BY power DESC, period ASC) AS rn
        FROM shares
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_periods,
               max(CASE WHEN rn = 1 THEN period END) AS dominant_period,
               max(CASE WHEN rn = 1 THEN s END) AS dominant_share_micros,
               CAST(sum(CASE WHEN s > 0 THEN s * {lns} ELSE 0 END)
                    AS BIGINT) AS _slns,
               max(CAST(s IS NULL AS INTEGER)) AS _degen
        FROM ranked
    )
    SELECT n_periods,
           CASE WHEN _degen = 1 THEN NULL
                ELSE CAST(dominant_period AS INTEGER) END AS dominant_period,
           CAST(dominant_share_micros AS BIGINT) AS dominant_share_micros,
           CASE WHEN _degen = 1 THEN NULL
                ELSE CAST((- _slns) // 1000000 AS BIGINT)
           END AS spectral_entropy_nanos,
           CASE WHEN _degen = 1 THEN NULL
                ELSE {_sql_ru_se('(- _slns) // 1000000', str(SE_LN_NP_NANOS))}
           END AS flatness_micros
    FROM agg
"""


ORACLES["timeseries_spectral_entropy"] = _se_sql()


# --------------------------------------------- turning-point randomness
# Round 13: the classical turning-point test (Kendall 1973) on the
# daily event-count series — the cheapest "is this series just noise"
# check: an i.i.d. sequence has E[T] = 2(n-2)/3 interior local extrema;
# a trending or oversmoothed series has too few, an oscillating one
# too many. Complements runs_test (signs vs median) by reading
# LOCAL shape. Ties (x equal to a neighbor) count as no turning point
# — deterministic, and both engines decide on the same exact BIGINTs.
# Exactness: T, n are integers; z² = (3T - 2(n-2))² · 10 / (16n - 29)
# clears the /3 and /90 denominators symbolically, so the statistic is
# one exact micros rational; the 5% decision compares integers against
# the chi-square(1) micros literal (the Mann-Kendall discipline).
# Scale: day-grain (bounded by span); one ordered window pass.

TP_CHI2_5PCT_MICROS = 3_841_459  # chi-square(1) 95th pct, micros


def timeseries_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    w = W.orderBy("day")
    marked = ser.select(
        "x",
        F.lag("x", 1).over(w).alias("xp"),
        F.lead("x", 1).over(w).alias("xn"),
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("xp").isNotNull()
                & F.col("xn").isNotNull()
                & (
                    ((F.col("x") > F.col("xp")) & (F.col("x") > F.col("xn")))
                    | ((F.col("x") < F.col("xp")) & (F.col("x") < F.col("xn")))
                )
            ).cast("long")
        ).alias("t"),
    )
    dec = "decimal(38,0)"
    num = f"(10 * CAST((3 * t - 2 * (n - 2)) AS {dec}) * (3 * t - 2 * (n - 2)))"
    den = "(16 * n - 29)"
    degenerate = F.col("n") < 3
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("t").cast("long").alias("n_turning"),
        (2 * (F.col("n") - 2)).cast("long").alias("expected_x3"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec(num, den))
        .alias("z2_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr(f"1000000 * {num}")
                > F.expr(f"CAST({TP_CHI2_5PCT_MICROS} AS decimal(38,0)) * {den}")
            ).cast("int")
        )
        .alias("significant_5pct"),
    )


QUERIES["timeseries_turning_points"] = timeseries_turning_points

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_tp,
)

_TP_NUM = "(10 * CAST((3 * t - 2 * (n - 2)) AS HUGEINT) * (3 * t - 2 * (n - 2)))"
_TP_DEN = "(16 * n - 29)"

ORACLES["timeseries_turning_points"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), marked AS (
        SELECT x,
               lag(x, 1) OVER (ORDER BY day) AS xp,
               lead(x, 1) OVER (ORDER BY day) AS xn
        FROM ser
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
                              AND ((x > xp AND x > xn)
                                   OR (x < xp AND x < xn))
                         THEN 1 ELSE 0 END) AS BIGINT) AS t
        FROM marked
    )
    SELECT n AS n_days,
           t AS n_turning,
           CAST(2 * (n - 2) AS BIGINT) AS expected_x3,
           CASE WHEN n < 3 THEN NULL
                ELSE {_sql_rud_tp(_TP_NUM, _TP_DEN)}
           END AS z2_micros,
           CASE WHEN n < 3 THEN NULL
                ELSE CAST(1000000 * {_TP_NUM}
                          > CAST({TP_CHI2_5PCT_MICROS} AS HUGEINT) * {_TP_DEN}
                          AS INTEGER)
           END AS significant_5pct
    FROM agg
"""


# --------------------------------------------------- Cox-Stuart trend
# Round 13: the Cox-Stuart sign test (1955) — the third, assumption-
# lightest member of the trend family (theil_sen: robust slope;
# mann_kendall: all-pairs monotone rank trend; cox_stuart: just
# FIRST-HALF vs SECOND-HALF paired signs, n/2 comparisons instead of
# n²/2, the one you run when even the O(n²) day-grain pair join is
# too much). Pair the i-th observation with the (i + ceil(n/2))-th by
# day RANK (the middle observation drops out when n is odd), count
# strictly-positive and strictly-negative differences (ties drop),
# and test S⁺ against Binomial(n', 1/2): continuity-corrected
# z² = (max(|2S⁺ - n'| - 1, 0))² / n' — an exact micros rational on
# integer counts, decided against the chi-square(1) literal.
# Scale: day-grain rank + one self-join on rank offset — O(n) rows.


def timeseries_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    w = W.orderBy("day")
    ranked = ser.select(
        "x", F.row_number().over(w).alias("rn")
    ).localCheckpoint(eager=False)
    tot = ranked.agg(F.count(F.lit(1)).alias("n"))
    a = ranked.alias("a")
    b = ranked.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(tot))
        .join(
            b,
            F.col("b.rn")
            == F.col("a.rn") + F.expr("CAST((n + 1) div 2 AS INT)"),
        )
        .agg(
            F.sum((F.col("b.x") > F.col("a.x")).cast("long")).alias("s_plus"),
            F.sum((F.col("b.x") < F.col("a.x")).cast("long")).alias(
                "s_minus"
            ),
        )
    )
    m = pairs.crossJoin(F.broadcast(tot))
    nprime = "(s_plus + s_minus)"
    dev = f"greatest(abs(2 * s_plus - {nprime}) - 1, 0)"
    degenerate = F.expr(nprime) <= 0
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s_plus").cast("long").alias("s_plus"),
        F.col("s_minus").cast("long").alias("s_minus"),
        F.when(
            F.col("s_plus") > F.col("s_minus"), F.lit(1)
        )
        .when(F.col("s_plus") < F.col("s_minus"), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("trend_sign"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(ratio_units(f"{dev} * {dev}", nprime))
        .alias("z2_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr(f"1000000 * {dev} * {dev}")
                > F.expr(f"{TP_CHI2_5PCT_MICROS} * {nprime}")
            ).cast("int")
        )
        .alias("significant_5pct"),
    )


QUERIES["timeseries_cox_stuart"] = timeseries_cox_stuart

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units as _sql_ru_cs,
)

_CS_NP = "(s_plus + s_minus)"
_CS_DEV = f"greatest(abs(2 * s_plus - {_CS_NP}) - 1, 0)"

ORACLES["timeseries_cox_stuart"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), ranked AS (
        SELECT x, row_number() OVER (ORDER BY day) AS rn
        FROM ser
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM ranked
    ), pairs AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_plus,
               CAST(sum(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_minus
        FROM ranked a CROSS JOIN tot
        JOIN ranked b ON b.rn = a.rn + CAST((n + 1) // 2 AS BIGINT)
    )
    SELECT n AS n_days,
           s_plus, s_minus,
           CASE WHEN s_plus > s_minus THEN 1
                WHEN s_plus < s_minus THEN -1 ELSE 0 END AS trend_sign,
           CASE WHEN {_CS_NP} <= 0 THEN NULL
                ELSE {_sql_ru_cs(f'{_CS_DEV} * {_CS_DEV}', _CS_NP)}
           END AS z2_micros,
           CASE WHEN {_CS_NP} <= 0 THEN NULL
                ELSE CAST(1000000 * {_CS_DEV} * {_CS_DEV}
                          > {TP_CHI2_5PCT_MICROS} * {_CS_NP} AS INTEGER)
           END AS significant_5pct
    FROM pairs CROSS JOIN tot
"""


# ----------------------------------------------------- KPSS (level)
# Round 13: the stationarity test read from the OTHER side — runs /
# turning-point / Mann-Kendall test for structure against a null of
# randomness; KPSS (Kwiatkowski-Phillips-Schmidt-Shin 1992) tests
# level-stationarity as the NULL, which is the orientation a forecast
# pipeline wants before trusting a fixed-mean model (SES grid, Holt).
# Short-run variance flavor (lag-0 denominator, the textbook LM
# statistic; the HAC-bandwidth long-run variant changes only the
# denominator): with deviations e_t = x_t − x̄ and partial sums
# S_t = Σ_{s≤t} e_s,  η = Σ S_t² / (n² Σ e_t²/n).  On the exact
# u-rail (u_t = n·x_t − T = n·e_t, partial sums U_t = n·S_t) the whole
# statistic collapses to the single integer rational
# η = Σ U_t² / (n · Σ u_t²) — no doubles anywhere; the 5% decision
# compares micros against the published 0.463 critical value.
# Scale: day-grain; one cumulative window + one reduce.

KPSS_CRIT_5PCT_MICROS = 463_000


def timeseries_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    tot = ser.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("t"))
    dec = "decimal(38,0)"
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("n").cast(dec) * F.col("x") - F.col("t")).alias("u"),
    )
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    parts = u.select(
        "n",
        "u",
        F.sum("u").over(w_cum).alias("cu"),
    )
    agg = parts.groupBy("n").agg(
        F.sum((F.col("cu").cast(dec) * F.col("cu")).cast(dec)).alias("su2"),
        F.sum((F.col("u").cast(dec) * F.col("u")).cast(dec)).alias("uu"),
    )
    degenerate = (F.col("n") < 2) | (F.col("uu") <= 0)
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec("su2", f"CAST(n AS {dec}) * uu")
        )
        .alias("eta_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr("1000000 * su2")
                <= F.expr(
                    f"CAST({KPSS_CRIT_5PCT_MICROS} AS decimal(38,0)) * n * uu"
                )
            ).cast("int")
        )
        .alias("level_stationary_5pct"),
    )


QUERIES["timeseries_kpss"] = timeseries_kpss

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_kpss,
)

ORACLES["timeseries_kpss"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t
        FROM ser
    ), u AS (
        SELECT day, n, CAST(n AS HUGEINT) * x - t AS u
        FROM ser CROSS JOIN tot
    ), parts AS (
        SELECT n, u,
               CAST(sum(u) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS HUGEINT) AS cu
        FROM u
    ), agg AS (
        SELECT n,
               CAST(sum(CAST(cu AS HUGEINT) * cu) AS HUGEINT) AS su2,
               CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS uu
        FROM parts GROUP BY 1
    )
    SELECT n AS n_days,
           CASE WHEN n < 2 OR uu <= 0 THEN NULL
                ELSE {_sql_rud_kpss('su2', 'CAST(n AS HUGEINT) * uu')}
           END AS eta_micros,
           CASE WHEN n < 2 OR uu <= 0 THEN NULL
                ELSE CAST(1000000 * su2
                          <= CAST({KPSS_CRIT_5PCT_MICROS} AS HUGEINT) * n * uu
                          AS INTEGER)
           END AS level_stationary_5pct
    FROM agg
"""


# ------------------------------------- cumulative periodogram (Bartlett)
# Round 13: Bartlett's Kolmogorov-style white-noise test applied to
# the candidate-period energy profile — spectral_entropy summarizes
# HOW SPREAD the energy is; this one makes the accept/reject call: a
# white series accumulates energy LINEARLY across the ordered
# components, so D = max_j |C_j/P − j/m| (C_j = cumulative power over
# the period axis, P total, m components) exceeding ~1.358/√m rejects
# whiteness at 5%. Shares the exact rail end-to-end: powers are
# DECIMAL integers from the module-literal trig tables, the deviation
# clears denominators as |m·C_j − j·P| (exact DECIMAL), D is one
# micros rational against m·P, and the decision compares against a
# PYTHON-precomputed critical literal. (Classical Bartlett orders the
# full Fourier frequencies; this is the same statistic on the 2..30
# candidate-period profile — stated, not hidden.)
# Scale: rides the SE aggregate — one pass + a 29-row window.

CPG_CRIT_5PCT_MICROS = 252_174  # floor(1.358/sqrt(29)*1e6+0.5)


def timeseries_cum_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    # r13 OPT: the day-grain count series is the identical relation in
    # a dozen registry queries -- ride the shared artifact
    ser = _daily_event_counts(spark, sf_dir)
    tot = ser.agg(F.count(F.lit(1)).alias("d"), F.sum("x").alias("t"))
    dec = "decimal(38,0)"
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("d").cast(dec) * F.col("x") - F.col("t")).alias("u"),
    )
    aggs = []
    for p in SE_PERIODS:
        cs, sn = SE_TABLES[p]
        carr = f"array({', '.join(f'CAST({c} AS BIGINT)' for c in cs)})"
        sarr = f"array({', '.join(f'CAST({s} AS BIGINT)' for s in sn)})"
        aggs.append(
            F.sum(
                F.col("u")
                * F.expr(f"element_at({carr}, CAST(pmod(day, {p}) AS INT) + 1)")
            ).alias(f"a_{p}")
        )
        aggs.append(
            F.sum(
                F.col("u")
                * F.expr(f"element_at({sarr}, CAST(pmod(day, {p}) AS INT) + 1)")
            ).alias(f"b_{p}")
        )
    m = u.agg(*aggs)
    rows = m.selectExpr(
        "stack("
        + str(len(SE_PERIODS))
        + ", "
        + ", ".join(f"{p}, a_{p}, b_{p}" for p in SE_PERIODS)
        + ") AS (period, a, b)"
    ).select(
        "period",
        (
            F.col("a").cast(dec) * F.col("a")
            + F.col("b").cast(dec) * F.col("b")
        ).alias("power"),
    # r13 OPT: two consumers (total power + the cumulative walk) re-ran
    # the phase-table aggregate (the codegen-heavy stage) — materialize
    # the |periods|-row relation once
    ).localCheckpoint(eager=False)
    np_ = len(SE_PERIODS)
    w_cum = W.orderBy("period").rowsBetween(W.unboundedPreceding, 0)
    w_j = W.orderBy("period")
    tp = rows.agg(F.sum("power").alias("ptot"))
    dev = (
        rows.withColumn("cp", F.sum("power").over(w_cum))
        .withColumn("j", F.row_number().over(w_j))
        .crossJoin(F.broadcast(tp))
        .select(
            F.expr(
                f"abs(CAST({np_} AS decimal(38,0)) * cp - CAST(j AS decimal(38,0)) * ptot)"
            ).alias("dj"),
            "ptot",
        )
    )
    agg = dev.groupBy("ptot").agg(F.max("dj").alias("dmax"))
    degenerate = F.col("ptot") <= 0
    return agg.select(
        F.lit(np_).cast("int").alias("n_periods"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec("dmax", f"CAST({np_} AS decimal(38,0)) * ptot")
        )
        .alias("d_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr("1000000 * dmax")
                <= F.expr(
                    f"CAST({CPG_CRIT_5PCT_MICROS} AS decimal(38,0)) * {np_} * ptot"
                )
            ).cast("int")
        )
        .alias("white_noise_5pct"),
    )


QUERIES["timeseries_cum_periodogram"] = timeseries_cum_periodogram

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_cpg,
)


def _cpg_sql() -> str:
    np_ = len(SE_PERIODS)
    pieces = []
    for p in SE_PERIODS:
        cs, sn = SE_TABLES[p]
        clist = "[" + ", ".join(str(c) for c in cs) + "]"
        slist = "[" + ", ".join(str(s) for s in sn) + "]"
        pieces.append(
            f"""SELECT {p} AS period,
               CAST(sum(u * ({clist}::BIGINT[])
                    [CAST(day % {p} AS INTEGER) + 1]) AS BIGINT) AS a,
               CAST(sum(u * ({slist}::BIGINT[])
                    [CAST(day % {p} AS INTEGER) + 1]) AS BIGINT) AS b
            FROM u"""
        )
    body = " UNION ALL ".join(pieces)
    return f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(x) AS BIGINT) AS t
        FROM ser
    ), u AS (
        SELECT day, CAST(d AS HUGEINT) * x - t AS u
        FROM ser CROSS JOIN tot
    ), rows_ AS (
        SELECT period,
               CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b AS power
        FROM ({body})
    ), tp AS (
        SELECT CAST(sum(power) AS HUGEINT) AS ptot FROM rows_
    ), dev AS (
        SELECT abs(CAST({np_} AS HUGEINT)
                   * sum(power) OVER (ORDER BY period
                                      ROWS UNBOUNDED PRECEDING)
                   - CAST(row_number() OVER (ORDER BY period) AS HUGEINT)
                     * ptot) AS dj,
               ptot
        FROM rows_ CROSS JOIN tp
    ), agg AS (
        SELECT ptot, CAST(max(dj) AS HUGEINT) AS dmax
        FROM dev GROUP BY 1
    )
    SELECT CAST({np_} AS INTEGER) AS n_periods,
           CASE WHEN ptot <= 0 THEN NULL
                ELSE {_sql_rud_cpg('dmax', f'CAST({np_} AS HUGEINT) * ptot')}
           END AS d_micros,
           CASE WHEN ptot <= 0 THEN NULL
                ELSE CAST(1000000 * dmax
                          <= CAST({CPG_CRIT_5PCT_MICROS} AS HUGEINT)
                             * {np_} * ptot AS INTEGER)
           END AS white_noise_5pct
    FROM agg
"""


ORACLES["timeseries_cum_periodogram"] = _cpg_sql()


# ------------------------------------------ seasonal Mann-Kendall
# Round 13: Hirsch-Slack (1984) — the seasonal variant of
# timeseries_mann_kendall: a strong weekly cycle can drown a real
# monotone drift in the plain MK (Monday-vs-Sunday pairs carry cycle,
# not trend), so the seasonal test compares days only WITHIN the same
# day-of-week subseries and sums: S = Σ_s S_s, Var = Σ_s Var_s (the
# per-season tie-corrected MK variance), continuity-corrected
# z² = 18(|S|−1)²/(18·Var) decided on exact integers against the
# chi-square(1) literal — the identical rails as the parent query,
# just partitioned by season. Scale: day-grain; the pair join is
# within-season only (7 × (n/7)²/2 pairs, ~n²/14 — below the parent's
# n²/2 — and still span-bounded).


def timeseries_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    # r13 OPT: ride the shared day-grain artifact
    ser = _daily_event_counts(spark, sf_dir).select(
        "day", "x", F.expr("pmod(day, 7)").alias("dow")
    )
    a, b = ser.alias("a"), ser.alias("b")
    s_rel = (
        a.join(
            b,
            (F.col("a.dow") == F.col("b.dow"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .agg(
            F.sum(
                F.signum((F.col("b.x") - F.col("a.x")).cast("double")).cast(
                    "long"
                )
            ).alias("s")
        )
    )
    ties = (
        ser.groupBy("dow", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("dow")
        .agg(
            F.sum("t").alias("n"),
            F.sum(
                F.expr("CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)")
            ).alias("tie_term"),
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum(
                F.expr(
                    "CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5)"
                    " - tie_term"
                )
            ).alias("var18"),
        )
    )
    dec = "decimal(38,0)"
    m = s_rel.crossJoin(F.broadcast(ties))
    num = f"(18 * CAST((abs(s) - 1) AS {dec}) * (abs(s) - 1))"
    degenerate = (F.col("n") < 2) | (F.col("var18") <= 0) | (F.col("s") == 0)
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.col("var18").cast("long").alias("var_s_x18"),
        F.when(F.col("s") == 0, F.lit(0))
        .otherwise(F.expr("CAST(sign(s) AS INT)"))
        .alias("trend_sign"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec(num, "var18"))
        .alias("z2_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr(f"1000000 * {num}")
                > F.expr(f"{MK_CHI2_5PCT_MICROS} * var18")
            ).cast("int")
        )
        .alias("significant_5pct"),
    )


QUERIES["timeseries_seasonal_mann_kendall"] = timeseries_seasonal_mann_kendall

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_smk,
)

_SMK_NUM = "(18 * CAST((abs(s) - 1) AS HUGEINT) * (abs(s) - 1))"

ORACLES["timeseries_seasonal_mann_kendall"] = f"""
    WITH ser AS (
        SELECT day, x, day % 7 AS dow
        FROM (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        )
    ), s_rel AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM ser a JOIN ser b ON a.dow = b.dow AND a.day < b.day
    ), per_season AS (
        SELECT dow, CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                    AS HUGEINT) AS tie_term
        FROM (SELECT dow, x, CAST(count(*) AS BIGINT) AS t
              FROM ser GROUP BY 1, 2)
        GROUP BY 1
    ), ties AS (
        SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
                        - tie_term) AS HUGEINT) AS var18
        FROM per_season
    )
    SELECT n AS n_days,
           s AS s_stat,
           CAST(var18 AS BIGINT) AS var_s_x18,
           CASE WHEN s = 0 THEN 0
                ELSE CAST(sign(s) AS INTEGER) END AS trend_sign,
           CASE WHEN n < 2 OR var18 <= 0 OR s = 0 THEN NULL
                ELSE {_sql_rud_smk(_SMK_NUM, 'var18')}
           END AS z2_micros,
           CASE WHEN n < 2 OR var18 <= 0 OR s = 0 THEN NULL
                ELSE CAST(1000000 * {_SMK_NUM}
                          > {MK_CHI2_5PCT_MICROS} * var18 AS INTEGER)
           END AS significant_5pct
    FROM s_rel CROSS JOIN ties
"""
