"""Streaming queries promoted into the driver correctness gate.

Each entry drives a REAL Structured Streaming query (file source →
watermarked transformation → memory sink, `processAllAvailable`) and
returns the sink contents as a batch DataFrame — so watermark, session
and stateful logic earn differential CORRECTNESS rows against batch SQL
oracles, not just pytest assertions. The reference is strictly batch
(SURVEY.md §2c); this is the rebuild's streaming tier under the same
gate as everything else.

With the whole fixture in one micro-batch the watermark drops nothing,
so the batch-twin oracles are EXACT (same shapes as queries/events.py).
The stateful entry sums in integer micro-units (streaming/stateful.py)
so its output is order-independent and hashable.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import (
    from_iunits,
    pround,
    sql_from_iunits,
    sql_iunits,
    sql_pround,
)
from ..sources.catalog import load_table
from ..streaming.events import (
    stream_static_segment_revenue,
    run_stream_to_memory,
    stream_events,
    stream_stream_click_purchase_join,
    streaming_distinct_keys,
    streaming_session_counts,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)
from ..streaming.stateful import running_user_totals


def _sink(prefix: str) -> str:
    # memory-sink table names must be unique per run within a session
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def _ntz(df: DataFrame) -> DataFrame:
    """Cast LTZ timestamp columns back to NTZ (naive, UTC wall-clock).

    The streaming source runs on LTZ because watermarks demand it
    (streaming/events.py); everything oracle-facing in this engine is
    naive TIMESTAMP_NTZ — the exact values DuckDB reads."""
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    for cname, dtype in df.dtypes:
        if dtype == "timestamp":
            df = df.withColumn(cname, F.col(cname).cast("timestamp_ntz"))
    return df


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _sink("st_tumbling")
    run_stream_to_memory(
        streaming_tumbling_counts(stream_events(spark, sf_dir)), name
    )
    return _ntz(spark.table(name))


def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _sink("st_sliding")
    run_stream_to_memory(
        streaming_sliding_counts(stream_events(spark, sf_dir)), name
    )
    return _ntz(spark.table(name))


def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _sink("st_session")
    run_stream_to_memory(
        streaming_session_counts(stream_events(spark, sf_dir)), name
    )
    return _ntz(spark.table(name))


def streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _sink("st_join")
    run_stream_to_memory(
        stream_stream_click_purchase_join(stream_events(spark, sf_dir)),
        name,
        output_mode="append",  # stream-stream joins only support append
    )
    return _ntz(spark.table(name))


def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment under the gate: event stream
    joined to the batch customer table, aggregated per segment."""
    name = _sink("st_static")
    run_stream_to_memory(
        stream_static_segment_revenue(
            stream_events(spark, sf_dir), load_table(spark, sf_dir, "customer")
        ),
        name,
    )
    return _ntz(spark.table(name))


def streaming_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _sink("st_stateful")
    run_stream_to_memory(
        running_user_totals(stream_events(spark, sf_dir)),
        name,
        output_mode="update",
    )
    # update mode appends one row per (user, batch); keep each user's
    # final state (n_events grows monotonically per batch)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        _ntz(spark.table(name))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "n_events",
            pround(from_iunits(F.col("total_micros")), 2).alias("total_value"),
        )
    )


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state stream dedup: with the fixture in one micro-batch
    nothing is evicted mid-stream, so the output is EXACTLY the
    distinct key set — the differential contract below."""
    name = _sink("st_dedup")
    run_stream_to_memory(
        streaming_distinct_keys(stream_events(spark, sf_dir)),
        name,
        output_mode="append",
    )
    return _ntz(spark.table(name))


QUERIES = {
    "streaming_tumbling": streaming_tumbling,
    "streaming_dedup": streaming_dedup,
    "streaming_sliding": streaming_sliding,
    "streaming_session": streaming_session,
    "streaming_join": streaming_join,
    "streaming_stateful": streaming_stateful,
    "streaming_static_join": streaming_static_join,
}

ORACLES = {
    "streaming_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    "streaming_static_join": f"""
        SELECT c_mktsegment, event_type, count(*) AS n,
               {sql_pround(sql_from_iunits(f"sum({sql_iunits('value')})"), 2)}
                   AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
    """,
    # identical to the batch events_tumbling contract
    "streaming_tumbling": f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
               event_type,
               count(*) AS n,
               {sql_pround(sql_from_iunits(f"sum({sql_iunits('value')})"), 2)} AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    # identical to the batch events_sliding contract
    "streaming_sliding": """
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS win_start,
               time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
                   + INTERVAL '1 hour' AS win_end,
               event_type,
               count(*) AS n
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
        GROUP BY 1, 2, 3
    """,
    # gaps-and-islands twin of session_window (end = last event + gap)
    "streaming_session": """
        WITH ordered AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '10 minutes'
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), islands AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM ordered
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '10 minutes' AS session_end,
               count(*) AS n_events
        FROM islands
        GROUP BY user_id, session_id
    """,
    "streaming_join": """
        SELECT p.event_id, p.user_id,
               p.ts AS purchase_ts, c.ts AS click_ts
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts > p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
    """,
    "streaming_stateful": f"""
        SELECT user_id,
               count(*) AS n_events,
               {sql_pround(sql_from_iunits(f"sum({sql_iunits('value')})"), 2)} AS total_value
        FROM events
        GROUP BY user_id
    """,
}



def streaming_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming anomaly detection (streaming/stateful.py
    bucket_anomaly_flags) — same exact-integer z²>9 contract as the
    batch ``timeseries_anomaly``, and the SAME DuckDB oracle."""
    from ..functions.rounding import iunits
    from ..functions.time import epoch_micros
    from ..queries.timeseries import STEP_US
    from ..streaming.stateful import bucket_anomaly_flags

    name = _sink("st_anomaly")
    ev = stream_events(spark, sf_dir).select(
        "user_id",
        F.floor(epoch_micros("ts") / F.lit(float(STEP_US))).cast("long").alias("b"),
        iunits(F.col("value"), 3).alias("v"),
    )
    run_stream_to_memory(bucket_anomaly_flags(ev), name, output_mode="update")
    # update mode emits each user's full rescored history per batch;
    # one fixture batch -> one emission, dedup is a no-op kept for the
    # multi-batch case (latest hist_n per (user, bucket) wins)
    w = W.partitionBy("user_id", "b").orderBy(F.desc("hist_n"))
    sunk = (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return sunk.select(
        "user_id",
        F.timestamp_add(
            "MICROSECOND",
            F.col("b") * F.lit(STEP_US),
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("bucket_start"),
        "n",
        "x_milli",
        "hist_n",
        "is_anomaly",
    )


QUERIES["streaming_anomaly"] = streaming_anomaly

from .timeseries import ORACLES as _TS_ORACLES  # noqa: E402

ORACLES["streaming_anomaly"] = _TS_ORACLES["timeseries_anomaly"]


def streaming_foreachbatch_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental-ETL sink under the gate: each micro-batch
    APPENDS mergeable per-user partials (count + exact micro-unit sum)
    to a per-call parquet target — idempotence comes from writing into a
    batch-id subdirectory (re-delivery overwrites the same path), the
    exactly-once pattern foreachBatch exists for. The final read merges
    partials (sum of sums), which must hash-equal the one-shot batch
    aggregation oracle — the same merge == recompute contract as
    ``incremental_revenue``, here across REAL micro-batch boundaries.

    Scale: the target accumulates O(users) rows per batch; a production
    sink would MERGE into a keyed table (operators/merge.upsert) — the
    partial-append shape keeps the gate run hermetic while exercising
    the identical mergeable-state math."""
    from ..functions.rounding import from_iunits, iunits, pround

    from .connectors import _fixture_path

    path = _fixture_path("fb_totals")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(iunits(F.col("value"), 6)).alias("sum_iu"),
            )
            .write.mode("overwrite")
            .parquet(f"{path}/batch={batch_id}")
        )

    from ..streaming.events import pinned_stream_state

    with pinned_stream_state(spark):
        q = (
            stream_events(spark, sf_dir)
            .select("user_id", "value")
            .writeStream.foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    partials = spark.read.parquet(path)
    return partials.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        pround(from_iunits(F.sum("sum_iu")), 2).alias("total_value"),
    )


QUERIES["streaming_foreachbatch_totals"] = streaming_foreachbatch_totals
ORACLES["streaming_foreachbatch_totals"] = ORACLES["streaming_stateful"]


def streaming_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CEP under the gate: the applyInPandasWithState
    sessionized pattern matcher (streaming/stateful.py) drives a real
    file-source stream and must produce EXACTLY the batch
    events_pattern_match answer — the two share one oracle, so
    batch/streaming parity for sequence matching is differentially
    proven, not assumed."""
    from ..streaming.stateful import sessionized_pattern_counts
    from .events import SEQ_PATTERN, SESSION_GAP_US

    ev = stream_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
    )
    name = _sink("st_cep")
    run_stream_to_memory(
        sessionized_pattern_counts(ev, SESSION_GAP_US, SEQ_PATTERN),
        name,
        output_mode="update",
    )
    w = W.partitionBy("user_id").orderBy(F.desc("n_seen"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_matching")
    )


QUERIES["streaming_pattern_match"] = streaming_pattern_match

from .events import ORACLES as _EV_ORACLES  # noqa: E402

ORACLES["streaming_pattern_match"] = _EV_ORACLES["events_pattern_match"]


def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed approximate distinct users, registers maintained by a
    REAL streaming query (state-store max-merge per micro-batch —
    streaming/events.streaming_hll_registers), estimator computed at
    read time over the sink, exact count joined from the batch table
    for the report. Batch/streaming parity of the sketch itself is
    under the gate: the oracle rebuilds the registers from scratch in
    SQL and must land on the identical estimate."""
    from ..operators.sketches import _HLL_K, _HLL_NUMER, HLL_M
    from ..streaming.events import streaming_hll_registers, stream_events, run_stream_to_memory

    name = _sink("st_hll")
    run_stream_to_memory(
        streaming_hll_registers(stream_events(spark, sf_dir)), name
    )
    regs = _ntz(spark.table(name))
    m = HLL_M
    pg = regs.groupBy("win_start").agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_K} - _mj)")).alias(
            "_s_present"
        ),
    )
    s = F.col("_s_present") + (F.lit(m) - F.col("_present")) * F.lit(1 << _HLL_K)
    est = F.lit(float(_HLL_NUMER)) / s.cast("double")
    ev = load_table(spark, sf_dir, "events")
    exact = (
        ev.select(F.date_trunc("hour", F.col("ts")).alias("win_start"), "user_id")
        .groupBy("win_start")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return pg.join(exact, "win_start").select(
        "win_start",
        (F.lit(m) - F.col("_present")).cast("long").alias("zero_registers"),
        pround(est, 4).alias("hll_estimate"),
        "exact_distinct",
    )


QUERIES["streaming_hll_users"] = streaming_hll_users

from ..operators.sketches import sql_hll_distinct as _sql_hll_distinct  # noqa: E402

ORACLES["streaming_hll_users"] = _sql_hll_distinct(
    "(SELECT date_trunc('hour', ts) AS win_start, user_id FROM events)",
    "win_start",
    "user_id",
)


def streaming_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint RECOVERY under the gate — the streaming durability
    surface the other entries don't reach: data arrives in two phases,
    and the query is STOPPED between them and restarted from its
    checkpoint. The file-source offsets in the checkpoint must make the
    second run process exactly the phase-2 files — a broken resume
    either reprocesses phase 1 (totals double → hash fail) or drops it
    (totals short → hash fail). The merged totals must equal the
    one-shot batch aggregation over ALL events (shared
    ``streaming_stateful`` oracle), proving exactly-once across a
    restart, not just within one run."""
    import os
    import shutil

    from ..functions.rounding import from_iunits, iunits, pround
    from .connectors import _fixture_path

    src = _fixture_path("ckpt_src")
    ckpt = _fixture_path("ckpt_chk")
    target = _fixture_path("ckpt_tgt")
    os.makedirs(src, exist_ok=True)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")

    def _land(df: DataFrame, name: str) -> None:
        """Materialize df as ONE flat parquet file inside src (the
        file-source watches src; each landing is one new file)."""
        tmp = f"{src}/_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(f"{tmp}/{part}", f"{src}/{name}.parquet")
        shutil.rmtree(tmp)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(iunits(F.col("value"), 6)).alias("sum_iu"),
            )
            .write.mode("overwrite")
            .parquet(f"{target}/batch={batch_id}")
        )

    schema = ev.schema

    def _run_once() -> None:
        from ..streaming.events import pinned_stream_state

        with pinned_stream_state(spark):
            q = (
                spark.readStream.schema(schema)
                .format("parquet")
                .load(src)
                .writeStream.option("checkpointLocation", ckpt)
                .foreachBatch(sink)
                .start()
            )
            q.processAllAvailable()
            q.stop()

    _land(ev.filter(F.col("user_id") % 2 == 0), "phase1")
    _run_once()  # phase 1 only
    _land(ev.filter(F.col("user_id") % 2 != 0), "phase2")
    _run_once()  # restart from checkpoint: must process ONLY phase 2

    partials = spark.read.parquet(target)
    return partials.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        pround(from_iunits(F.sum("sum_iu")), 2).alias("total_value"),
    )


QUERIES["streaming_checkpoint_resume"] = streaming_checkpoint_resume
ORACLES["streaming_checkpoint_resume"] = ORACLES["streaming_stateful"]


def streaming_latedata_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK SEMANTICS exercised for real. Every other streaming
    entry ingests the whole fixture in one micro-batch, so its
    watermark provably drops nothing (module docstring). Here the
    RECENT half of the events lands first — the first batch advances
    the event-time watermark to max(ts) − 30 min and the no-data batch
    finalizes every closed window — and then the OLD half arrives,
    entirely below the watermark, and must be DROPPED by the windowed
    aggregation's state eviction. The oracle computes exactly the
    closed windows over phase-1 rows (window_end ≤ max(phase1 ts) −
    30 min; boundary equality is impossible — window ends are round
    hours, the watermark carries raw microseconds). A stream that
    fails to drop late data inflates counts; one that drops too
    eagerly loses closed windows — either hash-fails.

    The phase split (midpoint hour of the data's time range) is
    DERIVED from the data identically on both sides — no fixture-
    coupled literals, so driver regenerations don't break it."""
    import os
    import shutil

    from ..functions.rounding import iunits
    from ..functions.time import epoch_micros
    from .connectors import _fixture_path

    src = _fixture_path("late_src")
    os.makedirs(src, exist_ok=True)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    HOUR_US = 3_600_000_000
    bounds = ev.agg(
        F.min(epoch_micros("ts")).alias("lo"), F.max(epoch_micros("ts")).alias("hi")
    ).first()
    mid_us = ((bounds["lo"] + bounds["hi"]) // 2 // HOUR_US) * HOUR_US

    def _land(df: DataFrame, name: str) -> None:
        tmp = f"{src}/_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(f"{tmp}/{part}", f"{src}/{name}.parquet")
        shutil.rmtree(tmp)

    _land(ev.filter(epoch_micros("ts") >= mid_us), "recent")

    name = _sink("st_late")
    stream = (
        spark.readStream.schema(ev.schema).format("parquet").load(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ→LTZ for watermark
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(iunits(F.col("value"), 6)).alias("total_micros"),
        )
        .select(F.col("window.start").alias("win_start"), "n_events", "total_micros")
    )
    from ..streaming.events import pinned_stream_state

    with pinned_stream_state(spark):
        q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
        q.processAllAvailable()  # phase 1 + no-data batch: closed windows emit
        _land(ev.filter(epoch_micros("ts") < mid_us), "late")
        q.processAllAvailable()  # phase 2: all below watermark -> dropped
        q.stop()
    return _ntz(spark.table(name))


QUERIES["streaming_latedata_drop"] = streaming_latedata_drop

from ..functions.rounding import sql_iunits as _sql_iu  # noqa: E402

ORACLES["streaming_latedata_drop"] = f"""
    WITH b AS (
        SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events
    ), m AS (
        SELECT ((lo + hi) // 2 // 3600000000) * 3600000000 AS mid_us FROM b
    ), p1 AS (
        SELECT ts, value FROM events, m WHERE epoch_us(ts) >= mid_us
    ), wm AS (
        SELECT max(epoch_us(ts)) - 1800000000 AS wm_us FROM p1
    )
    SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS win_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({_sql_iu('value', 6)}) AS BIGINT) AS total_micros
    FROM p1, wm
    WHERE (epoch_us(ts) // 3600000000) * 3600000000 + 3600000000 <= wm_us
    GROUP BY 1
"""


def streaming_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING day-2 ingest against the PERSISTED day-1 LSH index —
    the streaming closure of the dedup-artifact story: the same parquet
    artifacts ``dedup_incremental_day2`` probes in batch are here the
    STATIC side of a stream-static join, and the new-batch side arrives
    as a file-source stream. At 100 TB this is "near-dup flagging at
    ingest latency": corpus text is never read, corpus shingles never
    re-hashed, and the stream side needs NO streaming aggregation at
    all — signature/banding are per-ROW array expressions
    (functions/hashing.py), so the only stateful operator is the
    candidate-pair dropDuplicates (state bounded by matched pairs, and
    in production by a watermark on ingest time; the fixture arrives in
    one micro-batch, the same honesty note as ``streaming_dedup``).

    Differential contract: exactly the ``match_in = 'corpus'`` slice of
    the day-2 oracle — streaming and batch probes must agree row-for-row
    on (new_id, match_id, canonical_id, jaccard)."""
    from ..functions.hashing import (
        band_hashes,
        minhash_signature,
        shingle_hashes_from_token_hashes,
        token_hash,
    )
    from ..functions.text import tokenize
    from ..operators.dedup import DEFAULT_MAX_BUCKET, jaccard_of
    from ..streaming.events import stream_documents
    from .dedup import _minhash_index_path

    path = _minhash_index_path(spark, sf_dir)
    # The build stores each bucket's population as _bn, so the static
    # side of the stream-static join is a pushed filter + projection —
    # no per-batch aggregation over the index.
    c_band = spark.read.parquet(f"{path}/buckets")
    # cap with the BUILD's constant, not a literal — a build-default
    # change must move this probe with it (ADVICE r6)
    c_capped = c_band.filter(F.col("_bn") <= DEFAULT_MAX_BUCKET).select(
        F.col("id").alias("match_id"), "bh"
    )
    c_hashed = spark.read.parquet(f"{path}/hashes").select(
        F.col("id").alias("match_id"), F.col("hashes").alias("h_m")
    )
    canon = spark.read.parquet(f"{path}/canonical").select(
        F.col("id").alias("match_id"), F.col("root").alias("_root")
    )

    stream = stream_documents(spark, sf_dir).filter(
        (F.col("doc_id") % 10 == 0) & (F.length("text") > 0)
    )
    # token_hash (md5 family), NOT hash_array (poly family) — the dedup
    # pipeline and its oracles hash tokens with token_hash
    toks = tokenize(F.col("text"))
    enriched = (
        stream.withColumn("_th", F.transform(toks, lambda t: token_hash(t)))
        .filter(F.size("_th") > 0)
        .withColumn("_hashes", shingle_hashes_from_token_hashes(F.col("_th"), 2))
    )
    probe = (
        enriched.withColumn(
            "bh", F.explode(band_hashes(minhash_signature(F.col("_hashes")), 8, 4))
        )
        .select(F.col("doc_id").alias("new_id"), "_hashes", "bh")
        .join(c_capped, "bh")
        .dropDuplicates(["new_id", "match_id"])
        .join(c_hashed, "match_id")
        .withColumn("jaccard", pround(jaccard_of(F.col("_hashes"), F.col("h_m")), 6))
        .filter(F.col("jaccard") >= 0.5)
        .join(canon, "match_id", "left")
        .select(
            "new_id",
            "match_id",
            F.coalesce(F.col("_root"), F.col("match_id")).alias("canonical_id"),
            "jaccard",
        )
    )
    name = _sink("st_probe")
    run_stream_to_memory(probe, name, output_mode="append")
    return spark.table(name)


QUERIES["streaming_dedup_probe"] = streaming_dedup_probe


def _streaming_probe_oracle() -> str:
    from .dedup import ORACLES as _DEDUP_ORACLES

    return f"""
    WITH day2 AS ({_DEDUP_ORACLES['dedup_incremental_day2']})
    SELECT new_id, match_id, canonical_id, jaccard
    FROM day2 WHERE match_in = 'corpus'
    """


ORACLES["streaming_dedup_probe"] = _streaming_probe_oracle()


def streaming_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING day-2 DSIR scoring against the PERSISTED bucket-LM
    artifact (queries/curation._dsir_lm_path) — the importance-weight
    twin of ``streaming_dedup_probe``: train once on day 1, score every
    arriving doc at ingest. The stream explodes tokens to hashed
    buckets, stream-static-joins the 64-row log-ratio parquet, and
    aggregates the exact integer weight per doc — a streaming groupBy
    in COMPLETE output mode (state = one row per doc in the window;
    production bounds it with an ingest-time watermark; the fixture
    arrives in one micro-batch — the standing honesty note).

    Differential contract: identical integers to a batch replay that
    trains on day-1 text and scores day-2 text."""
    from ..functions.hashing import token_hash
    from ..functions.text import tokenize
    from ..streaming.events import stream_documents
    from .curation import DSIR_BUCKETS, _dsir_lm_path

    path = _dsir_lm_path(spark, sf_dir)
    ratio = spark.read.parquet(path)
    stream = stream_documents(spark, sf_dir).filter(
        (F.col("doc_id") % 10 == 0) & (F.length("text") > 0)
    )
    b = token_hash(F.col("tok")) % F.lit(DSIR_BUCKETS)
    terms = stream.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).select("doc_id", b.alias("b"))
    scored = (
        terms.join(ratio, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lr_units").alias("logw_units"),
        )
    )
    name = _sink("st_dsir")
    run_stream_to_memory(scored, name, output_mode="complete")
    return spark.table(name)


QUERIES["streaming_dsir_score"] = streaming_dsir_score


def _streaming_dsir_oracle() -> str:
    from .curation import DSIR_BUCKETS, DSIR_TARGET_SRC
    from ..functions.hashing import sql_token_hash, sql_tokens
    from ..functions.rounding import sql_iunits

    b = f"({sql_token_hash('tok')} % {DSIR_BUCKETS})"
    return f"""
    WITH terms AS (
        SELECT doc_id, source, {b} AS b FROM (
            SELECT doc_id, source, unnest({sql_tokens('text')}) AS tok
            FROM documents
        )
    ), day1 AS (
        SELECT * FROM terms WHERE doc_id % 10 != 0
    ), spine AS (
        SELECT unnest(range(0, {DSIR_BUCKETS})) AS b
    ), pc AS (
        SELECT b, count(*) AS c FROM day1
        WHERE source = '{DSIR_TARGET_SRC}' GROUP BY b
    ), pn AS (
        SELECT count(*) AS n FROM day1 WHERE source = '{DSIR_TARGET_SRC}'
    ), qc AS (
        SELECT b, count(*) AS c FROM day1
        WHERE source != '{DSIR_TARGET_SRC}' GROUP BY b
    ), qn AS (
        SELECT count(*) AS n FROM day1 WHERE source != '{DSIR_TARGET_SRC}'
    ), lm AS (
        SELECT spine.b,
               {sql_iunits(
                   f"ln(CAST(coalesce(pc.c, 0) + 1 AS DOUBLE)"
                   f" / CAST(pn.n + {DSIR_BUCKETS} AS DOUBLE))"
                   f" - ln(CAST(coalesce(qc.c, 0) + 1 AS DOUBLE)"
                   f" / CAST(qn.n + {DSIR_BUCKETS} AS DOUBLE))", 9)} AS lr_units
        FROM spine LEFT JOIN pc USING (b) LEFT JOIN qc USING (b), pn, qn
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(lr_units) AS BIGINT) AS logw_units
    FROM terms JOIN lm USING (b)
    WHERE doc_id % 10 = 0
    GROUP BY doc_id
    """


ORACLES["streaming_dsir_score"] = _streaming_dsir_oracle()


def streaming_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING day-2 quality scoring against the PERSISTED logistic
    model (queries/textstats.logreg_model_path) — the distilled-filter
    completion of the train-once/score-at-ingest family: the classifier
    is trained once on the day-1 corpus (moments + weights stored as
    ONE parquet row), and every arriving day-2 doc is scored by pure
    per-row expressions plus a 1-row stream-static equi-join. No
    aggregation, no state store — append mode, so the scorer runs at
    ingest latency and its state is O(1) regardless of stream length.

    Differential contract: per-doc integer score units and the keep
    decision equal a batch replay that trains on day-1 text and scores
    day-2 text (the model parquet round-trip is semantically
    invisible — exactly the property being verified)."""
    from ..functions.rounding import from_iunits, iunits
    from ..streaming.events import run_stream_to_memory, stream_documents
    from .textstats import _LR_NX, _lr_features, _lr_p, _lr_z, logreg_model_path

    path = logreg_model_path(spark, sf_dir)
    model = spark.read.parquet(path).withColumn("_k", F.lit(0))
    stream = stream_documents(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    feat = _lr_features(stream, extra=("doc_id",)).withColumn("_k", F.lit(0))
    zcols = [
        from_iunits(
            iunits((F.col(f"x{j}") - F.col(f"mu{j}")) / F.col(f"sd{j}"), 9), 9
        ).alias(f"z{j}")
        for j in range(1, _LR_NX + 1)
    ]
    zrow = feat.join(model, "_k").select(
        "doc_id", "keep", *[F.col(f"w{j}") for j in range(_LR_NX + 1)], *zcols
    )
    p = _lr_p(_lr_z())
    out = zrow.select(
        "doc_id",
        "keep",
        iunits(p, 9).alias("score_units"),
        (p >= F.lit(0.5)).cast("int").alias("pred_keep"),
    )
    name = _sink("st_lr")
    run_stream_to_memory(out, name, output_mode="append")
    return spark.table(name)


QUERIES["streaming_quality_score"] = streaming_quality_score


def _streaming_logreg_oracle() -> str:
    from .textstats import _sql_logreg

    return _sql_logreg(
        train_where="doc_id % 10 != 0",
        mode="per_doc",
        score_where="doc_id % 10 = 0",
    )


ORACLES["streaming_quality_score"] = _streaming_logreg_oracle()


# ------------------------------------------- streaming drift monitor
DRIFT_BUCKETS = 64


def _drift_baseline_path(spark: SparkSession, sf_dir: str) -> str:
    """Day-1 hashed-unigram bucket counts persisted once (the JS drift
    baseline). Same staleness contract as the other per-process
    artifacts: keyed by immutable fixture dir."""
    from ..functions.hashing import token_hash
    from ..functions.text import tokenize
    from .connectors import _fixture_path

    from ..session import path_cached

    def build() -> str:
        path = _fixture_path("drift_base")
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        b = token_hash(F.col("tok")) % F.lit(DRIFT_BUCKETS)
        counts = (
            docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
            .select(b.alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        spine = spark.range(DRIFT_BUCKETS).select(F.col("id").alias("b"))
        spine.join(counts, "b", "left").select(
            "b", F.coalesce("cb", F.lit(0)).cast("long").alias("cb")
        ).write.mode("overwrite").parquet(path)
        return path

    return path_cached(_DRIFT_BASE_PATHS, sf_dir, build)


_DRIFT_BASE_PATHS: dict[str, str] = {}


def streaming_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING distribution-drift monitor: arriving day-2 docs hash
    tokens into DRIFT_BUCKETS buckets (bounded state — the streaming
    aggregation holds exactly 64 rows no matter how long the stream
    runs), and the sink contents are scored against the PERSISTED
    day-1 baseline as an add-one-smoothed Jensen-Shannon divergence —
    the ingest-time "did today's data change?" alarm. Train-once /
    monitor-forever, the dsir/dedup-probe discipline applied to drift.

    Differential contract: one (n_stream_tokens, js_divergence) row
    equal to a batch replay of day-1 baseline vs day-2 stream."""
    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits
    from ..functions.text import tokenize
    from ..streaming.events import run_stream_to_memory, stream_documents

    path = _drift_baseline_path(spark, sf_dir)
    base = spark.read.parquet(path)
    stream = stream_documents(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    b = token_hash(F.col("tok")) % F.lit(DRIFT_BUCKETS)
    counts = (
        stream.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .select(b.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    name = _sink("st_drift")
    run_stream_to_memory(counts, name, output_mode="complete")

    spine = spark.range(DRIFT_BUCKETS).select(F.col("id").alias("b"))
    joined = (
        spine.join(spark.table(name), "b", "left")
        .join(base, "b", "left")
        .select(
            F.coalesce("cs", F.lit(0)).cast("long").alias("cs"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    tot = joined.agg(
        F.sum("cs").alias("ns"), F.sum("cb").alias("nb")
    )
    r = joined.crossJoin(F.broadcast(tot))
    p = (F.col("cs") + F.lit(1)).cast("double") / (
        F.col("ns") + F.lit(DRIFT_BUCKETS)
    ).cast("double")
    q = (F.col("cb") + F.lit(1)).cast("double") / (
        F.col("nb") + F.lit(DRIFT_BUCKETS)
    ).cast("double")
    m = (p + q) / F.lit(2.0)
    agg = r.agg(
        F.first("ns").alias("n_stream_tokens"),
        F.sum(iunits(p * F.log(p / m), 9)).alias("a_units"),
        F.sum(iunits(q * F.log(q / m), 9)).alias("b_units"),
    )
    js = F.lit(0.5) * (
        (F.col("a_units") + F.col("b_units")).cast("double") / F.lit(1e9)
    )
    return agg.select("n_stream_tokens", pround(js, 6).alias("js_divergence"))


QUERIES["streaming_drift_monitor"] = streaming_drift_monitor


def _streaming_drift_oracle() -> str:
    from ..functions.hashing import sql_token_hash, sql_tokens
    from ..functions.rounding import sql_iunits as _siu, sql_pround as _spr

    b = f"({sql_token_hash('tok')} % {DRIFT_BUCKETS})"
    p = f"(CAST(cs + 1 AS DOUBLE) / CAST(ns + {DRIFT_BUCKETS} AS DOUBLE))"
    q = f"(CAST(cb + 1 AS DOUBLE) / CAST(nb + {DRIFT_BUCKETS} AS DOUBLE))"
    m = f"(({p} + {q}) / 2.0)"
    return f"""
    WITH terms AS (
        SELECT doc_id, {b} AS b FROM (
            SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
        )
    ), spine AS (
        SELECT unnest(range(0, {DRIFT_BUCKETS})) AS b
    ), s_cnt AS (
        SELECT b, count(*) AS c FROM terms WHERE doc_id % 10 = 0 GROUP BY b
    ), b_cnt AS (
        SELECT b, count(*) AS c FROM terms WHERE doc_id % 10 != 0 GROUP BY b
    ), joined AS (
        SELECT CAST(coalesce(s.c, 0) AS BIGINT) AS cs,
               CAST(coalesce(bc.c, 0) AS BIGINT) AS cb
        FROM spine LEFT JOIN s_cnt s USING (b) LEFT JOIN b_cnt bc USING (b)
    ), tot AS (
        SELECT CAST(sum(cs) AS BIGINT) AS ns, CAST(sum(cb) AS BIGINT) AS nb
        FROM joined
    ), agg AS (
        SELECT first(ns) AS n_stream_tokens,
               CAST(sum({_siu(f"{p} * ln({p} / {m})", 9)}) AS BIGINT) AS a_units,
               CAST(sum({_siu(f"{q} * ln({q} / {m})", 9)}) AS BIGINT) AS b_units
        FROM joined, tot
    )
    SELECT n_stream_tokens,
           {_spr('0.5 * (CAST(a_units + b_units AS DOUBLE) / 1e9)', 6)}
               AS js_divergence
    FROM agg
"""


ORACLES["streaming_drift_monitor"] = _streaming_drift_oracle()


def streaming_winnowing_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup flagging by winnowing fingerprints against a
    PERSISTED day-1 index — the winnowing twin of
    ``streaming_dedup_probe``: corpus fingerprints are parquet (built
    once, ``_winnow_index_path``), the day-2 batch arrives as a
    file-source stream, fingerprint selection is a per-ROW array
    expression (streaming-safe, no state), and the only stateful
    operator is the (new_id, match_id) count aggregation — COMPLETE
    output mode over the probe window, bounded by matched pairs (the
    standing fixture honesty note: one micro-batch; production bounds
    state with an ingest-time watermark).

    Guarantee carried over from winnowing: a stream doc sharing a
    substring of >= K+W-1 chars with an indexed doc ALWAYS collides on
    at least one fingerprint — ingest-latency plagiarism/near-dup
    flagging with a provable floor, which the LSH probe cannot give."""
    from .textstats import (
        WINNOW_K,
        WINNOW_MAX_BUCKET,
        WINNOW_MIN_SHARED,
        WINNOW_W,
        _winnow_index_path,
        winnow_fps_col,
    )
    from ..streaming.events import stream_documents

    path = _winnow_index_path(spark, sf_dir)
    idx = spark.read.parquet(path)
    capped = idx.filter(F.col("_nb") <= WINNOW_MAX_BUCKET).select(
        "fp", "match_id"
    )
    stream = stream_documents(spark, sf_dir).filter(
        (F.col("doc_id") % 10 == 0)
        & (F.length("text") >= WINNOW_K + WINNOW_W - 1)
    )
    ex = stream.select(
        F.col("doc_id").alias("new_id"),
        F.explode(winnow_fps_col(F.col("text"))).alias("fp"),
    )
    matched = (
        ex.join(capped, "fp")
        .groupBy("new_id", "match_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= WINNOW_MIN_SHARED)
    )
    name = _sink("st_winnow")
    run_stream_to_memory(matched, name, output_mode="complete")
    return spark.table(name)


QUERIES["streaming_winnowing_probe"] = streaming_winnowing_probe


def _streaming_winnow_oracle() -> str:
    from .textstats import (
        WINNOW_MAX_BUCKET,
        WINNOW_MIN_SHARED,
        _sql_winnow_cte,
    )

    return f"""
    WITH corpus AS MATERIALIZED ({_sql_winnow_cte("doc_id % 10 != 0")}),
    strm AS MATERIALIZED ({_sql_winnow_cte("doc_id % 10 = 0")}),
    cex AS MATERIALIZED (
        SELECT doc_id AS match_id, unnest(fps) AS fp FROM corpus
    ),
    keep_fp AS (
        SELECT fp FROM cex GROUP BY fp HAVING count(*) <= {WINNOW_MAX_BUCKET}
    ),
    sex AS (SELECT doc_id AS new_id, unnest(fps) AS fp FROM strm)
    SELECT new_id, match_id, count(*) AS shared
    FROM sex
    JOIN cex USING (fp)
    JOIN keep_fp USING (fp)
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


ORACLES["streaming_winnowing_probe"] = _streaming_winnow_oracle()


def streaming_novelty_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING first-occurrence novelty at ingest (round 8): the
    day-2 doc stream is scored against the PERSISTED day-1 distinct
    word-bigram index — the streaming twin of ``text_ngram_novelty``
    and the fourth member of the day-2 stream-static family
    (dedup/DSIR/winnowing/novelty). Per-row array expressions compute
    each arriving doc's distinct bigram hashes (streaming-safe, no
    state); the gram index joins stream-static LEFT OUTER (static
    right side — supported and stateless); the only stateful operator
    is the per-doc count aggregation, bounded by the probe batch.

    A high-novelty arriving doc carries n-grams the training corpus
    has never seen — the ingest-time "is this worth keeping" signal;
    near-zero novelty flags mirrors/recrawls cheaper than any pair
    computation."""
    from ..functions.hashing import (
        shingle_hashes_from_token_hashes,
        token_hash,
    )
    from ..functions.rounding import ratio_micros
    from ..functions.text import tokenize
    from ..streaming.events import stream_documents
    from .textstats import _novelty_index_path

    path = _novelty_index_path(spark, sf_dir)
    idx = spark.read.parquet(path).select("g", F.lit(1).alias("_seen"))
    toks = tokenize(F.col("text"))
    stream = (
        stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") % 10 == 0)
        .filter(F.size(toks) > 0)
    )
    grams = shingle_hashes_from_token_hashes(
        F.transform(toks, lambda t: token_hash(t)), 2
    )
    ex = stream.select(
        F.col("doc_id").alias("new_id"), F.explode(grams).alias("g")
    )
    scored = (
        ex.join(idx, "g", "left_outer")
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_seen").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_novel"),
        )
        .select(
            "new_id",
            "n_grams",
            "n_novel",
            ratio_micros("n_novel", "n_grams").alias("novelty_micros"),
        )
    )
    name = _sink("st_novelty")
    run_stream_to_memory(scored, name, output_mode="complete")
    return spark.table(name)


QUERIES["streaming_novelty_probe"] = streaming_novelty_probe


def _streaming_novelty_oracle() -> str:
    from ..functions.hashing import (
        sql_shingle_hashes_from_token_hashes,
        sql_token_hash_array,
        sql_tokens,
    )
    from ..functions.rounding import sql_ratio_micros

    th = sql_token_hash_array(sql_tokens("text"))
    grams = sql_shingle_hashes_from_token_hashes("th", 2)
    return f"""
    WITH d1 AS MATERIALIZED (
        SELECT DISTINCT unnest(grams) AS g FROM (
            SELECT {grams} AS grams FROM (
                SELECT {th} AS th FROM documents
                WHERE doc_id % 10 != 0 AND length(text) > 0
                  AND len({sql_tokens('text')}) > 0
            )
        )
    ), sex AS (
        SELECT new_id, unnest(grams) AS g FROM (
            SELECT doc_id AS new_id, {grams} AS grams FROM (
                SELECT doc_id, {th} AS th FROM documents
                WHERE doc_id % 10 = 0 AND length(text) > 0
                  AND len({sql_tokens('text')}) > 0
            )
        )
    )
    SELECT new_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN d1.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           {sql_ratio_micros(
               "sum(CASE WHEN d1.g IS NULL THEN 1 ELSE 0 END)", "count(*)"
           )} AS novelty_micros
    FROM sex LEFT JOIN d1 ON sex.g = d1.g
    GROUP BY 1
"""


ORACLES["streaming_novelty_probe"] = _streaming_novelty_oracle()


def streaming_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING similarity search at ingest (round 8): arriving
    vectors (vec_id % 10 == 0, the day-2 slice) are scored against the
    PERSISTED day-1 IVF index — the fifth member of the day-2
    stream-static family (dedup/DSIR/winnowing/novelty/ANN) and the
    streaming twin of sim_topk_ivf.

    Streaming-legal plan: cell ROUTING is a per-row expression over
    the collected centroid constants (≤ ANNP_CELLS rows — the 1-row
    broadcast-weights discipline from the logreg scorer; windows are
    illegal on streams, literals are free), postings join is
    stream-static on cid, and the ONE stateful operator is the per-
    query top-k aggregation (collect_list bounded by the probed cells'
    postings). The sink table is batch — the final sort/slice/explode
    into ranked rows runs batch-side on it."""
    from ..functions.vectors import as_double, cosine, norm_sq
    from ..streaming.events import stream_embeddings
    from .similarity import ANNP_K, ANNP_NPROBE, ann_index_paths

    cent_path, idx_path = ann_index_paths(spark, sf_dir)
    cents = spark.read.parquet(cent_path).orderBy("cid").collect()  # <= ANNP_CELLS rows
    postings = spark.read.parquet(idx_path)
    qv = as_double("embedding")
    # zero-norm queries excluded on both sides (same NaN-vs-NULL
    # ordering hazard as the index build — see ann_index_paths).
    stream = (
        stream_embeddings(spark, sf_dir)
        .filter(F.col("vec_id") % 10 == 0)
        .filter(norm_sq(qv) > 0)
    )
    cell_structs = [
        F.struct(
            (-cosine(qv, F.array(*[F.lit(float(x)) for x in r["centroid"]]))).alias(
                "nc"
            ),
            F.lit(r["cid"]).cast("long").alias("cid"),
        )
        for r in cents
    ]
    routed = stream.select(
        F.col("vec_id").alias("query_id"),
        qv.alias("qv"),
        F.explode(
            F.slice(F.sort_array(F.array(*cell_structs)), 1, ANNP_NPROBE)
        ).alias("cell"),
    ).select("query_id", "qv", F.col("cell.cid").alias("cid"))
    scored = routed.join(postings, "cid").select(
        "query_id",
        F.struct(
            (-cosine(F.col("qv"), F.col("cv"))).alias("nc"),
            F.col("neighbor_id").alias("neighbor_id"),
        ).alias("s"),
    )
    agg = scored.groupBy("query_id").agg(
        F.slice(F.sort_array(F.collect_list("s")), 1, ANNP_K).alias("topk")
    )
    name = _sink("st_ann")
    run_stream_to_memory(agg, name, output_mode="complete")
    return (
        spark.table(name)
        .select("query_id", F.posexplode("topk").alias("pos0", "s"))
        .select(
            "query_id",
            F.col("s.neighbor_id").alias("neighbor_id"),
            pround(-F.col("s.nc"), 6).alias("cos_sim"),
            (F.col("pos0") + 1).cast("int").alias("rank"),
        )
    )


QUERIES["streaming_ann_probe"] = streaming_ann_probe


def _streaming_ann_oracle() -> str:
    from ..functions.vectors import sql_as_double, sql_cosine, sql_norm_sq
    from .similarity import ANNP_CELLS, ANNP_K, ANNP_NPROBE

    return f"""
    WITH corpus AS MATERIALIZED (
        SELECT vec_id, cv FROM (
            SELECT vec_id, {sql_as_double('embedding')} AS cv
            FROM embeddings WHERE vec_id % 10 != 0
        ) WHERE {sql_norm_sq('cv')} > 0
    ), cents AS MATERIALIZED (
        SELECT vec_id AS cid, cv AS centroid
        FROM corpus ORDER BY vec_id LIMIT {ANNP_CELLS}
    ), cells AS MATERIALIZED (
        SELECT cid, vec_id AS neighbor_id, cv FROM (
            SELECT corpus.vec_id, corpus.cv, cents.cid,
                   row_number() OVER (
                       PARTITION BY corpus.vec_id
                       ORDER BY {sql_cosine('corpus.cv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM corpus, cents
        ) WHERE rn = 1
    ), q AS (
        SELECT query_id, qv FROM (
            SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id % 10 = 0
        ) WHERE {sql_norm_sq('qv')} > 0
    ), probes AS (
        SELECT query_id, qv, cid FROM (
            SELECT q.query_id, q.qv, cents.cid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {sql_cosine('q.qv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM q, cents
        ) WHERE rn <= {ANNP_NPROBE}
    ), scored AS (
        SELECT p.query_id, c.neighbor_id,
               {sql_cosine('p.qv', 'c.cv')} AS cos
        FROM probes p JOIN cells c ON p.cid = c.cid
    )
    SELECT query_id, neighbor_id,
           {sql_pround('cos', 6)} AS cos_sim,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    ) WHERE rank <= {ANNP_K}
"""


ORACLES["streaming_ann_probe"] = _streaming_ann_oracle()


def streaming_srm_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sample-ratio-mismatch monitor (round 8): the SRM
    guardrail running at ingest — arm assignment is the same keyed
    hash as the batch check (stateless per row), the one stateful op
    is the global distinct-user arm-count aggregation (dropDuplicates
    on user_id bounds state at |users|; production adds an ingest-time
    watermark exactly like the other probes), and the chi-square snaps
    on the wide-rational rail batch-side after the sink."""
    from ..functions.hashing import token_hash
    from ..functions.rounding import ratio_units_dec
    from ..streaming.events import stream_events
    from .quality import SRM_CRIT_MICROS

    ev = stream_events(spark, sf_dir)
    arm = (
        token_hash(F.concat(F.lit("srm"), F.col("user_id").cast("string")))
        % 2
    )
    counts = (
        ev.select("user_id", arm.alias("arm"))
        .dropDuplicates(["user_id"])
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        )
    )
    name = _sink("st_srm")
    run_stream_to_memory(counts, name, output_mode="complete")
    chi2 = ratio_units_dec(
        "CAST(n0 - n1 AS DECIMAL(38,0)) * CAST(n0 - n1 AS DECIMAL(38,0))",
        "CAST(n0 + n1 AS DECIMAL(38,0))",
        1_000_000,
    )
    return (
        spark.table(name)
        .select("n0", "n1", chi2.alias("chi2_micros"))
        .withColumn(
            "srm_flag",
            (F.col("chi2_micros") > SRM_CRIT_MICROS).cast("int"),
        )
    )


QUERIES["streaming_srm_monitor"] = streaming_srm_monitor

from .quality import ORACLES as _Q_ORACLES  # noqa: E402

ORACLES["streaming_srm_monitor"] = _Q_ORACLES["quality_srm_check"]


# ----------------------------------------------- day-2 semantic dedup probe
# Persisted day-1 SemDeDup artifact for the STREAMING admission scorer:
# centroids = first SEMD_CELLS day-1 vectors by id, kept set = day-1
# survivors of the greedy-by-id within-cell rule (dedup_semantic's
# contract applied to the day-1 slice) — both parquet, built once per
# fixture dir (the ann_index_paths staleness discipline). Zero-norm
# vectors excluded on both engines before any cosine ordering.

_SEMD_INDEX_PATHS: dict[str, tuple[str, str]] = {}


def semdedup_index_paths(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    from ..session import path_cached

    def build() -> tuple[str, str]:
        from pyspark.sql import Window as W

        from ..functions.rounding import iunits
        from ..functions.vectors import as_double, cosine, norm_sq
        from .connectors import _fixture_path
        from .dedup import SEMD_CELLS, SEMD_TAU_MICROS

        cent_path = _fixture_path("semdedup_centroids")
        kept_path = _fixture_path("semdedup_kept")
        day1 = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 10 != 0)
            .select("vec_id", as_double("embedding").alias("cv"))
            .filter(norm_sq(F.col("cv")) > 0)
        )
        cents = (
            day1.orderBy("vec_id")
            .limit(SEMD_CELLS)
            .select(F.col("vec_id").alias("cid"), F.col("cv").alias("centroid"))
        )
        cents.write.mode("overwrite").parquet(cent_path)
        rn = F.row_number().over(
            W.partitionBy("vec_id").orderBy(
                F.desc(cosine(F.col("cv"), F.col("centroid"))), F.asc("cid")
            )
        )
        cell = (
            day1.crossJoin(F.broadcast(cents))
            .withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .select("cid", "vec_id", "cv")
        )
        a, b = cell.alias("a"), cell.alias("b")
        dropped = (
            a.join(
                b,
                (F.col("a.cid") == F.col("b.cid"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(
                iunits(cosine(F.col("a.cv"), F.col("b.cv")), 6)
                >= F.lit(SEMD_TAU_MICROS)
            )
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
        )
        (
            cell.join(dropped, "vec_id", "left_anti")
            .select("cid", F.col("vec_id").alias("kept_id"), "cv")
            .write.mode("overwrite")
            .parquet(kept_path)
        )
        return (cent_path, kept_path)

    return path_cached(_SEMD_INDEX_PATHS, sf_dir, build)


def streaming_semdedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING semantic-dedup admission (round 9): arriving day-2
    vectors are routed to their IVF cell and scored against the
    PERSISTED day-1 SemDeDup survivors — "is this embedding a
    paraphrase-level duplicate of anything we already kept" decided at
    ingest latency, the sixth member of the day-2 stream-static family
    (dedup/DSIR/winnowing/novelty/ANN/semantic).

    Streaming-legal plan: cell routing is a per-row expression over the
    collected centroid constants (≤ SEMD_CELLS rows — windows are
    illegal on streams, literals are free), the kept-set join is
    stream-static on cid, and the ONE stateful operator is the bounded
    per-vector aggregation (each arriving vector scans only its own
    cell's survivors). Every cell keeps ≥ 1 survivor (the min-id
    vector is never dropped), so the inner postings join can never
    lose an arriving vector."""
    from ..functions.rounding import iunits
    from ..functions.vectors import as_double, cosine, norm_sq
    from ..streaming.events import stream_embeddings
    from .dedup import SEMD_TAU_MICROS

    cent_path, kept_path = semdedup_index_paths(spark, sf_dir)
    cents = spark.read.parquet(cent_path).orderBy("cid").collect()
    kept = spark.read.parquet(kept_path)
    qv = as_double("embedding")
    stream = (
        stream_embeddings(spark, sf_dir)
        .filter(F.col("vec_id") % 10 == 0)
        .filter(norm_sq(qv) > 0)
    )
    cell_structs = [
        F.struct(
            (-cosine(qv, F.array(*[F.lit(float(x)) for x in r["centroid"]]))).alias(
                "nc"
            ),
            F.lit(r["cid"]).cast("long").alias("cid"),
        )
        for r in cents
    ]
    routed = stream.select(
        F.col("vec_id").alias("new_id"),
        qv.alias("qv"),
        F.sort_array(F.array(*cell_structs))[0]["cid"].alias("cid"),
    )
    scored = routed.join(kept, "cid").select(
        "new_id",
        "cid",
        (
            iunits(cosine(F.col("qv"), F.col("cv")), 6)
            >= F.lit(SEMD_TAU_MICROS)
        )
        .cast("long")
        .alias("hit"),
    )
    agg = scored.groupBy("new_id", "cid").agg(
        F.count(F.lit(1)).alias("n_scanned"),
        F.sum("hit").alias("n_matches"),
    )
    name = _sink("st_semdedup")
    run_stream_to_memory(agg, name, output_mode="complete")
    return spark.table(name).select(
        "new_id",
        "cid",
        "n_scanned",
        "n_matches",
        (F.col("n_matches") > 0).cast("int").alias("drop_flag"),
    )


QUERIES["streaming_semdedup_probe"] = streaming_semdedup_probe


def _streaming_semdedup_oracle() -> str:
    from ..functions.vectors import sql_as_double, sql_cosine
    from .dedup import SEMD_CELLS, SEMD_TAU_MICROS

    nsq = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(cv, x -> x * x)), (x, y) -> x + y)"
    )
    nsq_q = nsq.replace("cv", "qv")
    snap = "CAST(floor({c} * 1000000.0 + 0.5) AS BIGINT)"
    return f"""
    WITH day1 AS MATERIALIZED (
        SELECT vec_id, cv FROM (
            SELECT vec_id, {sql_as_double('embedding')} AS cv
            FROM embeddings WHERE vec_id % 10 != 0
        ) WHERE {nsq} > 0
    ), cents AS MATERIALIZED (
        SELECT vec_id AS cid, cv AS centroid
        FROM day1 ORDER BY vec_id LIMIT {SEMD_CELLS}
    ), cell AS MATERIALIZED (
        SELECT cid, vec_id, cv FROM (
            SELECT day1.vec_id, day1.cv, cents.cid,
                   row_number() OVER (
                       PARTITION BY day1.vec_id
                       ORDER BY {sql_cosine('day1.cv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM day1, cents
        ) WHERE rn = 1
    ), dropped AS MATERIALIZED (
        SELECT DISTINCT b.vec_id
        FROM cell a JOIN cell b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE {snap.format(c=sql_cosine('a.cv', 'b.cv'))}
              >= {SEMD_TAU_MICROS}
    ), kept AS MATERIALIZED (
        SELECT cid, vec_id AS kept_id, cv FROM cell
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    ), q AS (
        SELECT new_id, qv FROM (
            SELECT vec_id AS new_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id % 10 = 0
        ) WHERE {nsq_q} > 0
    ), routed AS (
        SELECT new_id, qv, cid FROM (
            SELECT q.new_id, q.qv, cents.cid,
                   row_number() OVER (
                       PARTITION BY q.new_id
                       ORDER BY {sql_cosine('q.qv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM q, cents
        ) WHERE rn = 1
    )
    SELECT new_id, cid,
           CAST(count(*) AS BIGINT) AS n_scanned,
           CAST(sum(CASE WHEN {snap.format(c=sql_cosine('r.qv', 'k.cv'))}
                    >= {SEMD_TAU_MICROS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matches,
           CAST(CASE WHEN sum(CASE WHEN
                    {snap.format(c=sql_cosine('r.qv', 'k.cv'))}
                    >= {SEMD_TAU_MICROS} THEN 1 ELSE 0 END) > 0
                THEN 1 ELSE 0 END AS INTEGER) AS drop_flag
    FROM routed r JOIN kept k USING (cid)
    GROUP BY 1, 2
"""


ORACLES["streaming_semdedup_probe"] = _streaming_semdedup_oracle()


def streaming_freshness_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING freshness/volume DQ monitor (round 9): dq_freshness
    running at ingest. The ONE stateful operator is the (type, day)
    count/max aggregation — state bounded at |types|×|days| rows
    forever (the drift monitor's 64-bucket discipline); staleness and
    the trailing-mean volume ratio snap batch-side on the sink table.
    Event-time here is the batch catalog's NTZ values (epoch micros of
    the stored naive timestamp), so the oracle is shared verbatim with
    dq_freshness."""
    from ..functions.rounding import ratio_micros
    from ..streaming.events import stream_events

    DAY_US = 86_400_000_000
    ev = stream_events(spark, sf_dir).select(
        "event_type",
        F.unix_micros(F.to_utc_timestamp("ts", "UTC")).alias("tus"),
    )
    td = ev.groupBy(
        "event_type",
        (F.col("tus") / F.lit(DAY_US)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"), F.max("tus").alias("last_tus"))
    name = _sink("st_fresh")
    run_stream_to_memory(td, name, output_mode="complete")
    tdb = spark.table(name)
    g = tdb.agg(F.max("day").alias("gday"), F.max("last_tus").alias("gmax_tus"))
    per = (
        tdb.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.max("last_tus").alias("last_tus"),
            F.max(F.col("gmax_tus")).alias("gmax_tus"),
            F.sum(
                F.when(F.col("day") == F.col("gday"), F.col("n")).otherwise(0)
            ).alias("n_latest_day"),
            F.sum(
                F.when(F.col("day") < F.col("gday"), F.col("n")).otherwise(0)
            ).alias("total_prior"),
            F.sum(
                F.when(F.col("day") < F.col("gday"), F.lit(1)).otherwise(0)
            ).alias("days_prior"),
        )
    )
    return per.select(
        "event_type",
        "n_events",
        F.expr("(gmax_tus - last_tus) div 60000000").alias("staleness_min"),
        "n_latest_day",
        ratio_micros("n_latest_day * days_prior", "total_prior").alias(
            "vol_ratio_micros"
        ),
    )


QUERIES["streaming_freshness_monitor"] = streaming_freshness_monitor

from .events import ORACLES as _EV_ORACLES  # noqa: E402

ORACLES["streaming_freshness_monitor"] = _EV_ORACLES["dq_freshness"]


# ------------------------------------------- STREAMING tx-log tail
# The streaming twin of connector_txlog_replay: a lakehouse reader
# that TAILS the transaction log as new commits land instead of
# refolding it from version 0 — the structured-streaming file source
# discovers log files incrementally, the ONE stateful operator is the
# per-version action aggregate (state bounded at |versions| rows
# forever), and the cumulative live-file/live-byte ledger folds
# batch-side on the sink table. Same oracle as the batch replay: the
# tail must converge to the identical snapshot ledger.

#: fixture dir -> landed JSON txlog path (write-once per process, the
#: _LOGREG_MODEL_PATHS staleness contract: the source table is
#: immutable for the process lifetime).
_TXLOG_PATHS: dict[str, str] = {}


def _txlog_fixture(spark: SparkSession, sf_dir: str) -> str:
    """r13 OPT: the simulated transaction log is a pure function of
    the orders table, but each call re-serialized ~2·|orders| rows to
    JSON before tailing them — input setup, not the measured stream.
    Land it once per fixture dir; every call still runs the full
    stream replay against it."""
    import os

    from ..functions.rounding import iunits
    from ..session import path_cached
    from .connectors import _fixture_path

    # ADVICE r13: unlike the session-keyed caches, this path outlives
    # sessions on purpose (landed JSON survives a restart) — but only
    # while the files actually exist; re-land if scratch was cleaned.
    cached = _TXLOG_PATHS.get(sf_dir)
    if cached is not None and not os.path.exists(cached):
        del _TXLOG_PATHS[sf_dir]

    def build() -> str:
        o = load_table(spark, sf_dir, "orders")
        base = o.select(
            F.col("o_orderkey").alias("file_id"),
            (F.col("o_orderkey") % 7).alias("v_add"),
            iunits(F.col("o_totalprice"), 2).alias("size_bytes"),
            (F.col("o_orderstatus") == "F").alias("finished"),
        )
        adds = base.select(
            F.lit("add").alias("action"),
            "file_id",
            F.col("v_add").alias("version"),
            "size_bytes",
        )
        removes = base.filter("finished").select(
            F.lit("remove").alias("action"),
            "file_id",
            (F.col("v_add") + 1 + F.col("file_id") % 3).alias("version"),
            "size_bytes",
        )
        path = _fixture_path("txlog_stream")
        adds.unionByName(removes).write.mode("overwrite").json(path)
        return path

    return path_cached(_TXLOG_PATHS, sf_dir, build)


def streaming_txlog_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _txlog_fixture(spark, sf_dir)
    log = spark.readStream.schema(
        "action string, file_id long, version long, size_bytes long"
    ).json(path)
    per_v = log.groupBy("version").agg(
        F.sum(F.when(F.col("action") == "add", 1).otherwise(0)).alias(
            "n_adds"
        ),
        F.sum(F.when(F.col("action") == "remove", 1).otherwise(0)).alias(
            "n_removes"
        ),
        F.sum(
            F.when(F.col("action") == "add", F.col("size_bytes")).otherwise(
                -F.col("size_bytes")
            )
        ).alias("delta_bytes"),
    )
    name = _sink("st_txlog")
    run_stream_to_memory(per_v, name, output_mode="complete")
    snap = spark.table(name)
    w = W.orderBy("version").rowsBetween(W.unboundedPreceding, W.currentRow)
    return snap.select(
        "version",
        "n_adds",
        "n_removes",
        F.sum(F.col("n_adds") - F.col("n_removes")).over(w).alias(
            "live_files"
        ),
        F.sum("delta_bytes").over(w).alias("live_bytes"),
    )


QUERIES["streaming_txlog_tail"] = streaming_txlog_tail

from .connectors import ORACLES as _CONN_ORACLES  # noqa: E402

ORACLES["streaming_txlog_tail"] = _CONN_ORACLES["connector_txlog_replay"]


# --------------------------------------------- quantile band router
# Round 11: route arriving purchase events into EXACT value-quantile
# bands computed from the batch history — the online tier of
# stats_quantiles_exact: a serving pipeline pins band edges from
# yesterday's exact distribution (P25/P50/P90 of purchase cents, the
# value-grain c_less rail — one distinct-cents window, bounded by the
# cents domain) and every arriving event classifies by two integer
# comparisons. The thresholds join as a broadcast 1-row static
# relation (stream-static, stateless — the unbounded side never
# buffers); only the per-band aggregation keeps state. Differential
# contract: band populations and sums equal the batch replay with
# quantile_disc thresholds.

QR_PCTS = (25, 50, 90)


def streaming_quantile_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..streaming.events import run_stream_to_memory, stream_events
    from .relational import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    cents = iunits(F.col("value"), 2)
    cnt = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(cents.alias("c"))
        .agg(F.count(F.lit(1)).alias("t"))
    )
    wv = W.orderBy("c").rowsBetween(W.unboundedPreceding, 0)
    ann = cnt.select(
        "c", F.sum("t").over(wv).alias("cum")
    ).crossJoin(
        F.broadcast(cnt.agg(F.sum("t").alias("n")))
    )
    thr = ann.select(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({p} * n + 99) div 100"),
                    F.col("c"),
                )
            ).alias(f"t{p}")
            for p in QR_PCTS
        ]
    )
    stream = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    routed = (
        stream.select(iunits(F.col("value"), 2).alias("c"))
        .join(F.broadcast(thr))
        .select(
            "c",
            F.when(F.col("c") < F.col("t25"), F.lit(0))
            .when(F.col("c") < F.col("t50"), F.lit(1))
            .when(F.col("c") < F.col("t90"), F.lit(2))
            .otherwise(F.lit(3))
            .cast("int")
            .alias("band"),
        )
    )
    agg = routed.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("c").alias("sum_cents"),
    )
    name = _sink("st_qr")
    run_stream_to_memory(agg, name)
    return spark.table(name)


QUERIES["streaming_quantile_router"] = streaming_quantile_router

ORACLES["streaming_quantile_router"] = f"""
    WITH p AS (
        SELECT {sql_iunits('value', 2)} AS c
        FROM events WHERE event_type = 'purchase'
    ), thr AS (
        SELECT quantile_disc(c, 0.25) AS t25,
               quantile_disc(c, 0.50) AS t50,
               quantile_disc(c, 0.90) AS t90
        FROM p
    )
    SELECT CAST(CASE WHEN c < t25 THEN 0
                     WHEN c < t50 THEN 1
                     WHEN c < t90 THEN 2
                     ELSE 3 END AS INTEGER) AS band,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(c) AS BIGINT) AS sum_cents
    FROM p CROSS JOIN thr
    GROUP BY 1
"""


# ---------------------------------------------- streaming SPC alerts
# Round 11: events_spc_chart moved to the ONLINE tier — the process
# parameters (Σ events N, Σ purchases X over the batch history) pin
# as a broadcast 1-row static relation, and each day closing in the
# stream raises its out-of-control flag by the same EXACT
# cross-multiplied binomial inequality (xN − Xn)² > 9X(N−X)n — the
# alerting shape: bounded per-day aggregation state, no doubles in
# the decision, alerts joinable downstream. Batch-replay oracle.


def streaming_spc_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_stream_to_memory, stream_events
    from .relational import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    tot = ev.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("xx"),
    )
    from ..functions.time import epoch_micros

    stream = stream_events(spark, sf_dir)
    daily = (
        stream.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
            (F.col("event_type") == "purchase").cast("long").alias("is_p"),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_p").alias("x"))
    )
    dec = "decimal(38,0)"
    j = daily.join(F.broadcast(tot))
    dev = (
        F.col("x").cast(dec) * F.col("nn") - F.col("xx").cast(dec) * F.col("n")
    )
    out = j.select(
        "day",
        "n",
        "x",
        (
            dev * dev
            > F.lit(9).cast(dec)
            * F.col("xx")
            * (F.col("nn") - F.col("xx")).cast(dec)
            * F.col("n")
        )
        .cast("int")
        .alias("out_of_control"),
    )
    name = _sink("st_spc")
    run_stream_to_memory(out, name)
    return spark.table(name)


QUERIES["streaming_spc_alert"] = streaming_spc_alert

ORACLES["streaming_spc_alert"] = """
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(x) AS BIGINT) AS xx
        FROM daily
    )
    SELECT day, n, x,
           CAST((CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n)
                * (CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n)
                > 9 * CAST(xx AS HUGEINT) * (nn - xx) * n
                AS INTEGER) AS out_of_control
    FROM daily CROSS JOIN tot
"""


# ---------------------------------------- streaming first-digit drift
# Round 12: the VALUE-DISTRIBUTION drift gate next to
# streaming_spc_alert's rate gate — purchase amounts' first-digit
# profile is a cheap generator/unit-mix fingerprint (the
# quality_benford batch audit), and a day whose digit counts deviate
# from the batch profile beyond the exact 3σ binomial bound flags a
# pipeline change (currency mixup, price-scale bug) the rate chart
# cannot see. Per day d and digit k with batch profile (X_k of N):
# binomial var(c_k) = n_d·p(1−p), p = X_k/N, so the 3σ gate in exact
# cross-multiplied integers is
# (c_k·N − X_k·n_d)² > 9·n_d·X_k·(N−X_k)·N. Bounded state: ONE
# streaming groupBy(day) with the nine digit counts pivoted into
# columns (no stream-stream join for n_d); the per-digit unpivot +
# flag arithmetic run on the materialized result. Batch-replay
# oracle; everything integer-exact.


def streaming_digit_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..functions.time import epoch_micros
    from ..streaming.events import run_stream_to_memory, stream_events

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bdigit = F.substring(
        iunits(F.col("value"), 2).cast("string"), 1, 1
    ).cast("int")
    tot = ev.select(bdigit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("xk")
    )

    stream = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    sdigit = F.substring(
        iunits(F.col("value"), 2).cast("string"), 1, 1
    ).cast("int")
    daily = (
        stream.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
            sdigit.alias("digit"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum((F.col("digit") == d).cast("long")).alias(f"c{d}")
                for d in range(1, 10)
            ],
        )
    )
    name = _sink("st_digit")
    run_stream_to_memory(daily, name)
    mat = spark.table(name)
    unpivot = mat.select(
        "day",
        "n",
        F.expr(
            "stack(9, "
            + ", ".join(f"{d}, c{d}" for d in range(1, 10))
            + ") AS (digit, c)"
        ),
    ).select("day", "n", "digit", "c")
    nt = tot.agg(F.sum("xk").alias("nn"))
    j = unpivot.join(F.broadcast(tot), "digit", "left").join(F.broadcast(nt))
    dec = "decimal(38,0)"
    xk = F.coalesce(F.col("xk"), F.lit(0))
    dev = F.col("c").cast(dec) * F.col("nn") - xk.cast(dec) * F.col("n")
    return j.select(
        "day",
        "digit",
        F.col("c").cast("long").alias("n_obs"),
        (
            dev * dev
            > F.lit(9).cast(dec)
            * F.col("n")
            * xk.cast(dec)
            * (F.col("nn") - xk)
            * F.col("nn")
        )
        .cast("int")
        .alias("drift_flag"),
    )


QUERIES["streaming_digit_drift"] = streaming_digit_drift

ORACLES["streaming_digit_drift"] = f"""
    WITH p AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(substring(CAST({sql_iunits('value', 2)} AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit
        FROM events WHERE event_type = 'purchase'
    ), tot AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS xk FROM p GROUP BY 1
    ), nt AS (
        SELECT CAST(sum(xk) AS BIGINT) AS nn FROM tot
    ), daily AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1
    ), cells AS (
        SELECT day, digit, CAST(count(*) AS BIGINT) AS c
        FROM p GROUP BY 1, 2
    ), spine AS (
        SELECT d.day, d.n, k.digit
        FROM daily d, (SELECT unnest(range(1, 10)) AS digit) k
    )
    SELECT s.day,
           CAST(s.digit AS INTEGER) AS digit,
           CAST(coalesce(c.c, 0) AS BIGINT) AS n_obs,
           CAST(
             (CAST(coalesce(c.c, 0) AS HUGEINT) * nn
              - CAST(coalesce(t.xk, 0) AS HUGEINT) * s.n)
             * (CAST(coalesce(c.c, 0) AS HUGEINT) * nn
                - CAST(coalesce(t.xk, 0) AS HUGEINT) * s.n)
             > 9 * CAST(s.n AS HUGEINT) * coalesce(t.xk, 0)
               * (nn - coalesce(t.xk, 0)) * nn
             AS INTEGER) AS drift_flag
    FROM spine s
    LEFT JOIN cells c ON s.day = c.day AND s.digit = c.digit
    LEFT JOIN tot t ON s.digit = t.digit
    CROSS JOIN nt
"""


# ------------------------------------------------ streaming CUSUM alert
# Round 12: the SMALL-SHIFT drift gate completing the streaming control
# panel — the SPC p-chart (streaming_spc_alert) catches single
# out-of-control days, the digit gate (streaming_digit_drift) catches
# value-mix changes; Page's one-sided CUSUM (Page 1954) catches the
# sustained small shift both miss, because it ACCUMULATES deviations:
# S_t = max(0, S_{t−1} + (x_t − μ − k)). The recursion has the exact
# closed form S_t = M_t − min(0, min_{j≤t} M_j) (drawup from the
# clamped running minimum of the partial sums), so it rides two
# calendar-grain windows instead of per-row state. Exact integers:
# with D days, total T, per-day n_t, the slack-adjusted deviation is
# v_t = 20·(D·n_t − T) − T (slack k = 5% of the mean, exactly), and
# the h = 5σ alert is the cross-multiplied square
# S_t² > 10000·(D·Σn² − T²) (S_t ≥ 0, σ_u² = D·Σn² − T² the scaled
# population variance). Bounded state: ONE streaming groupBy(day)
# (calendar-grain); partial sums, running min and the alert all run
# post-sink on the ≤ n_days materialized relation. The oracle replays
# the identical windows; a plain-Python recursion replay
# (max(0, S+v) form) checks the closed form itself in the tests.


def streaming_cusum_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.time import epoch_micros
    from ..streaming.events import run_stream_to_memory, stream_events

    stream = stream_events(spark, sf_dir)
    daily = (
        stream.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = _sink("st_cusum")
    run_stream_to_memory(daily, name)
    sunk = spark.table(name)

    dec = "decimal(38,0)"
    tot = sunk.agg(
        F.count(F.lit(1)).alias("dd"),
        F.sum("n").alias("tt"),
        F.sum(F.col("n").cast(dec) * F.col("n")).alias("ss"),
    )
    v = sunk.join(F.broadcast(tot)).select(
        "day",
        "n",
        "dd",
        "tt",
        "ss",
        (
            F.lit(20).cast(dec)
            * (F.col("dd").cast(dec) * F.col("n") - F.col("tt"))
            - F.col("tt")
        ).alias("v"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    m = v.withColumn("m", F.sum("v").over(w)).withColumn(
        "runmin", F.min("m").over(w)
    )
    s = F.col("m") - F.least(F.lit(0).cast(dec), F.col("runmin"))
    return m.select(
        "day",
        "n",
        s.cast("long").alias("cusum_pos_scaled"),
        (
            s * s
            > F.lit(10_000).cast(dec)
            * (F.col("dd").cast(dec) * F.col("ss") - F.col("tt").cast(dec) * F.col("tt"))
        )
        .cast("int")
        .alias("alert"),
    )


QUERIES["streaming_cusum_alert"] = streaming_cusum_alert

ORACLES["streaming_cusum_alert"] = """
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS dd,
               CAST(sum(n) AS BIGINT) AS tt,
               CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS ss
        FROM daily
    ), v AS (
        SELECT day, n, dd, tt, ss,
               20 * (CAST(dd AS HUGEINT) * n - tt) - tt AS v
        FROM daily CROSS JOIN tot
    ), m1 AS (
        SELECT day, n, dd, tt, ss,
               sum(v) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        FROM v
    ), m AS (
        SELECT day, n, dd, tt, ss, m,
               min(m) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS runmin
        FROM m1
    )
    SELECT day, n,
           CAST(m - least(CAST(0 AS HUGEINT), runmin) AS BIGINT)
               AS cusum_pos_scaled,
           CAST((m - least(CAST(0 AS HUGEINT), runmin))
                * (m - least(CAST(0 AS HUGEINT), runmin))
                > 10000 * (CAST(dd AS HUGEINT) * ss
                           - CAST(tt AS HUGEINT) * tt)
                AS INTEGER) AS alert
    FROM m
"""
