"""As-of operator cross-check + Structured Streaming vs batch oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _clicks_purchases(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"), "value"
    )
    return purchases, clicks


def test_asof_native_vs_pandas(spark):
    """The codegen'd union-window as-of join == pd.merge_asof."""
    from multithreaded_map_reduce_spark.operators.asof import asof_join, asof_join_pandas

    purchases, clicks = _clicks_purchases(spark)
    a = asof_join(purchases, clicks.withColumnRenamed("c_user", "user_id"),
                  by="user_id", left_time="ts", right_time="click_ts",
                  value_cols=["value"])
    b = asof_join_pandas(purchases, clicks.withColumnRenamed("c_user", "user_id"),
                         by="user_id", left_time="ts", right_time="click_ts",
                         value_cols=["value"])
    ra = sorted(map(tuple, a.select("event_id", "value", "_matched_time").collect()))
    rb = sorted(map(tuple, b.select("event_id", "value", "_matched_time").collect()))
    assert ra == rb
    assert len(ra) == purchases.count()


def test_asof_tolerance(spark):
    """Matches older than tolerance are nulled, never dropped."""
    from multithreaded_map_reduce_spark.operators.asof import asof_join

    purchases, clicks = _clicks_purchases(spark)
    strict = asof_join(
        purchases,
        clicks.withColumnRenamed("c_user", "user_id"),
        by="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["value"],
        tolerance_micros=3600 * 1_000_000,
    )
    rows = strict.collect()
    assert len(rows) == purchases.count()
    loose_matches = sum(r["_matched_time"] is not None for r in rows)
    assert 0 < loose_matches < len(rows)


def test_streaming_tumbling_matches_batch(spark):
    """File-source stream through watermarked windows == batch query."""
    from multithreaded_map_reduce_spark.queries.events import events_tumbling
    from multithreaded_map_reduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
        streaming_tumbling_counts,
    )

    stream = stream_events(spark, SF_SMOKE)
    assert stream.isStreaming
    run_stream_to_memory(streaming_tumbling_counts(stream), "tumbling_out")
    got = sorted(map(tuple, spark.sql("SELECT * FROM tumbling_out").collect()))
    want = sorted(map(tuple, events_tumbling(spark, SF_SMOKE).collect()))
    assert got == want


def test_streaming_sessions_match_batch(spark):
    from multithreaded_map_reduce_spark.queries.events import events_session
    from multithreaded_map_reduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
        streaming_session_counts,
    )

    stream = stream_events(spark, SF_SMOKE)
    run_stream_to_memory(streaming_session_counts(stream), "session_out")
    got = sorted(
        map(tuple, spark.sql("SELECT user_id, session_start, session_end, n_events FROM session_out").collect())
    )
    want = sorted(
        map(
            tuple,
            events_session(spark, SF_SMOKE)
            .select("user_id", "session_start", "session_end", "n_events")
            .collect(),
        )
    )
    assert got == want


def test_streaming_dedup_probe_gate(spark):
    """Streaming day-2 probe == batch day-2 probe (corpus slice): the
    per-row signature expressions + stream-static index joins must
    reproduce the batch probe exactly (shared oracle)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert (
        compare(
            spark,
            ALL_QUERIES["streaming_dedup_probe"],
            ALL_ORACLES["streaming_dedup_probe"],
            SF_SMOKE,
        )
        >= 0
    )


def test_streaming_dsir_score_gate(spark):
    """Streaming DSIR scoring == batch replay (train day 1, score day
    2): the persisted LM artifact + stream-static join must reproduce
    the batch integers exactly."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert (
        compare(
            spark,
            ALL_QUERIES["streaming_dsir_score"],
            ALL_ORACLES["streaming_dsir_score"],
            SF_SMOKE,
        )
        > 0
    )
