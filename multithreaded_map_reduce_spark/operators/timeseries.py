"""Time-series resampling and gap-filling — regular-grid operators the
reference cannot express (its model is one shuffle between two UDFs;
SURVEY.md §2c lists event-time processing as absent) and Spark lacks as
built-ins.

``resample_gapfill`` turns an irregular event stream into a fixed-step
per-key grid:

1. bucket events into ``step_micros``-wide buckets (integer floor of
   micros-since-epoch — timezone-free, see functions/time.py) and
   aggregate exactly in integer micro-units;
2. per key, explode ``sequence(min_bucket … max_bucket)`` into the full
   grid — the span endpoints are real observations, so every gap is
   interior;
3. left-join the aggregates onto the grid and linearly interpolate the
   holes from the nearest real buckets on each side, via two running
   ``last/first(ignorenulls)`` windows.

Exactness: sums are BIGINT micro-units; the interpolation dividend
``(next−prev)·(gap position)`` stays < 2⁵² in magnitude for any sane
step (micro-unit sums ~1e9 × grid spans ~1e3), so computing the ratio
in double and flooring is bit-identical across engines — the same
trick the DuckDB oracle replays verbatim.

Scale (100 TB): everything keys on the series id — the bucket
aggregation, the grid join, and both windows share one hash
partitioning, so AQE reuses a single exchange. The grid explode is
O(span/step) rows per key; a runaway key (tiny step × huge span) is
capped by ``max_grid`` with a hard error rather than a silent OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import iunits
from ..functions.time import epoch_micros

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step_micros: int,
    max_grid: int = 1_000_000,
) -> DataFrame:
    """Per-key fixed-step resample with linear interpolation of gaps.

    Returns ``(key, bucket_start TIMESTAMP_NTZ, n BIGINT,
    value_iu BIGINT, interpolated BOOLEAN)`` where ``value_iu`` is the
    exact micro-unit sum for observed buckets and the floor-interpolated
    value for gap buckets. ``n`` is 0 for interpolated rows.
    """
    b = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(epoch_micros(F.col(time_col)) / F.lit(step_micros))
            .cast("long")
            .alias("b"),
            iunits(F.col(value_col)).alias("iu"),
        )
        .groupBy("key", "b")
        .agg(F.count("*").alias("n"), F.sum("iu").alias("sum_iu"))
    )
    span = b.groupBy("key").agg(
        F.min("b").alias("b0"),
        F.max("b").alias("b1"),
    )
    # fail fast on a degenerate step/span combination instead of
    # exploding an unbounded grid; raise_error lives inside a filter
    # predicate so Catalyst cannot prune it as an unused column (same
    # pattern as operators/dedup._block_size_rail)
    span = span.filter(
        F.when(
            F.col("b1") - F.col("b0") > F.lit(max_grid),
            F.raise_error(
                F.concat(
                    F.lit("resample_gapfill: key '"),
                    F.col("key").cast("string"),
                    F.lit(f"' spans more than {max_grid} buckets"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    grid = span.select("key", F.explode(F.sequence("b0", "b1")).alias("b"))
    j = grid.join(b, ["key", "b"], "left")

    # Both neighbor lookups are RUNNING frames (unboundedPreceding →
    # currentRow), incremental O(n): the forward neighbor runs over
    # DESCENDING bucket order. The tempting
    # first(...) over (currentRow, unboundedFollowing) is O(n²) per
    # partition in Spark (UnboundedFollowingWindowFunctionFrame rescans
    # to the partition end for every row) — measured 13 s vs 0.7 s on
    # the 1M-row sf0.1 grid.
    back = W.partitionBy("key").orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    fwd = (
        W.partitionBy("key")
        .orderBy(F.desc("b"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    real_b = F.when(F.col("sum_iu").isNotNull(), F.col("b"))
    w = (
        j.withColumn("prev_iu", F.last("sum_iu", ignorenulls=True).over(back))
        .withColumn("prev_b", F.last(real_b, ignorenulls=True).over(back))
        .withColumn("next_iu", F.last("sum_iu", ignorenulls=True).over(fwd))
        .withColumn("next_b", F.last(real_b, ignorenulls=True).over(fwd))
    )
    interp = F.col("prev_iu") + F.floor(
        ((F.col("next_iu") - F.col("prev_iu")) * (F.col("b") - F.col("prev_b")))
        / (F.col("next_b") - F.col("prev_b"))
    ).cast("long")
    return w.select(
        "key",
        F.expr(f"timestampadd(MICROSECOND, b * {step_micros}, {_EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("sum_iu"), interp).alias("value_iu"),
        F.col("sum_iu").isNull().alias("interpolated"),
    )
