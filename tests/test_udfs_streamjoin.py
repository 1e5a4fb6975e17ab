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
