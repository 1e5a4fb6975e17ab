"""Pandas UDF/UDAF oracle parity + stream-stream join vs batch."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare


@pytest.mark.parametrize("name", ["pandas_udf_scalar", "pandas_udaf_mean"])
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream time-range join == the batch range
    join's pair count (each (purchase, click-in-window) pair once)."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.sources.catalog import load_table
    from multithreaded_map_reduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
        stream_stream_click_purchase_join,
    )

    stream = stream_events(spark, SF_SMOKE)
    run_stream_to_memory(
        stream_stream_click_purchase_join(stream), "ssj_out", output_mode="append"
    )
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT event_id, user_id, purchase_ts, click_ts FROM ssj_out"
            ).collect(),
        )
    )

    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    want = sorted(
        map(
            tuple,
            p.join(
                c,
                (F.col("c_user") == F.col("user_id"))
                & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
                & (F.col("click_ts") <= F.col("purchase_ts")),
            )
            .select("event_id", "user_id", "purchase_ts", "click_ts")
            .collect(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_stream_stream_left_outer_watermark_eviction(spark, tmp_path):
    """LEFT OUTER stream-stream join: a purchase with no click in its
    window is emitted null-padded only after the watermark passes its
    join window. Two micro-batches (maxFilesPerTrigger=1): batch 2's
    far-future sentinel advances the watermark, which evicts batch 1's
    unmatched purchase from the state store and emits it."""
    import datetime as dt
    import os

    from multithreaded_map_reduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_stream_click_purchase_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    rows1 = [
        (1, base, 10, "click", 0.0, ""),  # click 10 min before purchase 2
        (2, base + dt.timedelta(minutes=10), 10, "purchase", 1.0, ""),
        (3, base + dt.timedelta(minutes=20), 20, "purchase", 1.0, ""),  # no click
    ]
    # sentinels for unrelated users, far enough ahead that the 2h
    # watermark passes purchase 3's 1h join window — one per side,
    # because the global watermark is the MIN across both join inputs
    # (each side's watermark advances only on its own filtered rows).
    # The sentinel purchase itself stays in state (the watermark never
    # passes IT), so it is not emitted.
    rows2 = [
        (99, base + dt.timedelta(hours=12), 999, "click", 0.0, ""),
        (100, base + dt.timedelta(hours=12), 998, "purchase", 0.0, ""),
    ]

    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate([rows1, rows2], start=1):
        staging = tmp_path / f"staging{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        dest = src / f"batch{i}.parquet"
        part.rename(dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_to_memory(
        stream_stream_click_purchase_join(stream, how="leftOuter"),
        "ssj_left_out",
        output_mode="append",
    )
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM ssj_left_out").collect())
    )
    assert got == [
        (2, 10, base + dt.timedelta(minutes=10), base),
        (3, 20, base + dt.timedelta(minutes=20), None),
    ]
