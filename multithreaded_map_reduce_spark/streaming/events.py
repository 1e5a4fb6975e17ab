"""Structured Streaming surface over the events fixture.

The reference is strictly batch (SURVEY.md §2c); this module provides
the streaming layer a production pipeline needs: file-source streams,
watermarked event-time windows, and session windows — the same shapes
as the batch queries in ``queries/events.py``, so batch results serve
as the streaming oracle in tests.

Scale notes:
- watermarks bound state: an unwatermarked event-time agg grows without
  limit on an unbounded stream;
- ``session_window`` + watermark is the stateful-op showcase (state =
  one open session per user, closed when the watermark passes);
- tests drive these with the file source + ``processAllAvailable()``
  into a memory sink — in production the source/sink swap for
  Kafka/Delta without touching the transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import from_iunits, iunits, pround

# schema of the raw parquet (ts is TIMESTAMP(NANOS) → read as long)
RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (nanos → micros ts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def streaming_tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked 1-hour tumbling windows per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            pround(from_iunits(F.sum(iunits(F.col("value")))), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Watermarked session windows per user (stateful aggregation)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_distinct_keys(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked streaming deduplication: one row per (user_id,
    event_type) via ``dropDuplicatesWithinWatermark`` — the
    bounded-state dedup a production ingest pipeline runs (state for a
    key is evicted once the watermark passes its event time + delay,
    so the store never grows beyond the watermark horizon; plain
    ``dropDuplicates`` on a stream keeps every key forever).

    Only the keys are projected out, so the result is deterministic
    (which physical row "survives" within a micro-batch is not).
    """
    dedup = (
        events.withWatermark("ts", watermark)
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    return dedup.select("user_id", "event_type")


def stream_stream_click_purchase_join(
    events: DataFrame, how: str = "inner"
) -> DataFrame:
    """Stream-stream inner join with a watermarked time-range condition:
    purchases joined to the same user's clicks in the preceding hour —
    the streaming twin of the batch bucketed range join.

    Both sides carry watermarks so Spark can bound the join state: a
    buffered click is dropped once the purchase-side watermark passes
    click_ts + 1h.

    ``how="leftOuter"`` keeps purchases with no preceding click —
    Spark emits the null-padded row only once the watermark passes the
    purchase's join window (so a late click can no longer match), the
    state-eviction semantics ``tests`` exercise with a two-batch file
    source.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
    )
    return purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        how,
    ).select("event_id", "user_id", "purchase_ts", "click_ts")


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion into an in-memory table;
    returns the stopped query. Caller reads ``spark.sql(SELECT * FROM
    name)``."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
