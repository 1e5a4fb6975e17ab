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

from ..functions.rounding import from_iunits, pround, sql_iunits, sql_pround
from ..operators.timeseries import resample_gapfill
from ..sources.catalog import load_table

STEP_US = 3600 * 1_000_000  # 1-hour buckets


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user activity series, holes linearly interpolated."""
    ev = load_table(spark, sf_dir, "events")
    out = resample_gapfill(ev, "user_id", "ts", "value", STEP_US)
    return out.select(
        F.col("key").alias("user_id"),
        "bucket_start",
        "n",
        pround(from_iunits(F.col("value_iu")), 2).alias("value"),
        "interpolated",
    )


QUERIES = {"timeseries_gapfill": timeseries_gapfill}

ORACLES = {
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
               {sql_pround(
                   "CAST(COALESCE(sum_iu, prev_iu + CAST(floor("
                   "((next_iu - prev_iu) * (b - prev_b))"
                   " / CAST(next_b - prev_b AS DOUBLE)) AS BIGINT)) AS DOUBLE)"
                   " / 1000000.0",
                   2,
               )} AS value,
               sum_iu IS NULL AS interpolated
        FROM w
    """,
}
