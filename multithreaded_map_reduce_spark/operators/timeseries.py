"""Time-series resampling and gap-filling — regular-grid operators the
reference cannot express (its model is one shuffle between two UDFs;
SURVEY.md §2c lists event-time processing as absent) and Spark lacks as
built-ins.

``resample_gapfill`` turns an irregular event stream into a fixed-step
per-key grid:

1. bucket events into ``step_micros``-wide buckets (integer floor of
   micros-since-epoch — timezone-free, see functions/time.py) and
   aggregate exactly in integer micro-units;
2. pair each real bucket with its successor (one ``lead`` window over
   the REAL buckets — the small relation), and explode the buckets
   strictly between each consecutive pair as interpolated rows; the
   span endpoints are real observations, so every gap is interior.

This generates the gap rows WITH their interpolation bounds attached,
so no window ever runs over the full dense grid. (Two earlier shapes
measured at sf0.1, 1M grid rows: last/first windows over the exploded
grid with an unboundedFollowing frame — 13 s, Spark's
UnboundedFollowingWindowFunctionFrame is O(n²) per partition; the same
with a descending running frame — 1.7 s; this form — windows touch
only the ~100k real buckets.)

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
    wlead = W.partitionBy("key").orderBy("b")
    paired = b.withColumn("nxt_b", F.lead("b").over(wlead)).withColumn(
        "nxt_iu", F.lead("sum_iu").over(wlead)
    )
    # fail fast on a degenerate step/gap combination instead of
    # exploding an unbounded sequence; raise_error lives inside a
    # filter predicate so Catalyst cannot prune it as an unused column
    # (same pattern as operators/dedup._block_size_rail)
    gaps = paired.filter(
        F.when(
            F.col("nxt_b") - F.col("b") - 1 > F.lit(max_grid),
            F.raise_error(
                F.concat(
                    F.lit("resample_gapfill: key '"),
                    F.col("key").cast("string"),
                    F.lit(f"' spans more than {max_grid} buckets"),
                )
            ).cast("boolean"),
        ).otherwise(F.col("nxt_b") > F.col("b") + 1)
    )
    interp = F.col("sum_iu") + F.floor(
        ((F.col("nxt_iu") - F.col("sum_iu")) * (F.col("gb") - F.col("b")))
        / (F.col("nxt_b") - F.col("b"))
    ).cast("long")
    filled = gaps.select(
        "key",
        F.explode(F.sequence(F.col("b") + 1, F.col("nxt_b") - 1)).alias("gb"),
        "b",
        "sum_iu",
        "nxt_b",
        "nxt_iu",
    ).select(
        "key",
        F.col("gb").alias("b"),
        F.lit(0).cast("long").alias("n"),
        interp.alias("value_iu"),
        F.lit(True).alias("interpolated"),
    )
    real = b.select(
        "key",
        "b",
        "n",
        F.col("sum_iu").alias("value_iu"),
        F.lit(False).alias("interpolated"),
    )
    return real.unionByName(filled).select(
        "key",
        F.expr(f"timestampadd(MICROSECOND, b * {step_micros}, {_EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        "n",
        "value_iu",
        "interpolated",
    )
