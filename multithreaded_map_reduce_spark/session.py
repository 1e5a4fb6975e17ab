"""SparkSession factory.

Replaces the reference's config loader + master bootstrap
(``src/WordCounter.cpp:51-70``, ``include/MapReduceMaster.h:135-432``):
where the reference forks N RPC worker processes, here the Spark driver
and DAG scheduler own orchestration, retries, and shuffle.

Scale notes (100 TB design):
- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
- shuffle.partitions sized to cores locally; on a real cluster AQE
  coalesces from a high initial number, so this is a floor not a tuning
  burden.
- Arrow enabled for the Pandas-UDF slow path.
- UTC session timezone so results are portable (and match the DuckDB
  oracle used by the test harness).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "multithreaded_map_reduce_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # r13 OPT: the ContextCleaner only reclaims dead shuffle files,
        # broadcast vars and (local)checkpoint blocks when driver GC
        # collects their weak refs — with a 16g heap a long multi-query
        # session (the ~240-query bench, the 489-query gate) can go the
        # default 30 MINUTES between cleanups while thousands of dead
        # blocks squat in the unified memory pool and force live
        # aggregates to spill. 5 min bounds the squatting without
        # measurable GC cost (env-overridable like the other knobs).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "5min"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def artifact_cache_key(spark: SparkSession, sf_dir: str) -> str:
    """Cache key for session-scoped shared artifacts (checkpointed
    DataFrames, metadata counts): ``applicationId + fixture dir``.

    ``applicationId`` is minted by the SparkContext at startup and is
    unique per context for the life of the process, so a RESTARTED
    session (whose predecessor's localCheckpoint blocks died with its
    context) can never collide with a stale entry. ``id(spark)`` is
    NOT a safe substitute — CPython recycles addresses after GC, so a
    new session allocated where a dead one lived would be handed a
    relation whose blocks are gone (ADVICE r12). ``sf_dir`` alone is
    worse: deterministic staleness on any restart. Entries for dead
    sessions are retired lazily by the caller dicts (bounded: one
    artifact per (app, fixture dir); tests are the only multi-app
    processes)."""
    return f"{spark.sparkContext.applicationId}:{sf_dir}"
