"""Bucketed range (interval) join — the scalable formulation of
``l.ts BETWEEN r.ts - W AND r.ts`` style predicates.

A naive range join is an equi-join on the key followed by an O(n·m)
per-key filter — fine per key, catastrophic for hot keys. Bucketizing
time into width-W buckets turns containment into an equi-join on
(key, bucket): each left probe expands to the ≤ ⌈W/bucket⌉+1 buckets
its window can touch, the right side lands in exactly one bucket, and
the exact predicate filters within the bucket-matched pairs. Shuffle is
O(rows · windows_per_row) — independent of key skew in the time
dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.time import epoch_micros


def count_in_window(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    window_micros: int,
) -> DataFrame:
    """For each left row: count right rows with
    ``left_time - window < right_time <= left_time`` and equal key.

    Left keeps all rows (zero counts included). Bucket width = window,
    so a probe spans at most 2 buckets.
    """
    bw = window_micros
    # Floor division, not cast-to-long (which truncates toward zero):
    # truncation collapses both probe buckets to 0 for 0 <= _lt < bw
    # (double-counting every match) and mis-buckets negative timestamps.
    l = left.select(
        "*",
        epoch_micros(F.col(left_time)).alias("_lt"),
    ).withColumn("_bucket", F.explode(F.array_distinct(F.array(
        F.floor(F.col("_lt") / F.lit(bw)).cast("long"),
        F.floor((F.col("_lt") - F.lit(bw)) / F.lit(bw)).cast("long"),
    ))))
    r = right.select(
        F.col(by).alias("_rk"),
        epoch_micros(F.col(right_time)).alias("_rt"),
    ).withColumn("_bucket", F.floor(F.col("_rt") / F.lit(bw)).cast("long"))
    joined = l.join(
        r,
        (F.col(by) == F.col("_rk"))
        & (l["_bucket"] == r["_bucket"])
        & (F.col("_rt") > F.col("_lt") - F.lit(bw))
        & (F.col("_rt") <= F.col("_lt")),
        "left",
    )
    out_keys = [c for c in left.columns]
    return (
        joined.groupBy(*[F.col(c) for c in out_keys])
        .agg(F.count("_rt").alias("n_in_window"))
    )
