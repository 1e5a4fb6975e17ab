"""Table catalog over the driver-provided parquet fixtures.

The reference's only source is a single line-oriented text file scanned
whole by every worker (``include/MapReduceMaster.h:442-478`` — an
O(mappers × filesize) read). Here sources are columnar parquet scans with
predicate pushdown, column pruning, and HDFS-style input splits for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tables materialized by the driver at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — their
# cardinality is fixed (regions=5, nations=25) or grows sub-linearly.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan — keep it lazy so
    Catalyst can push filters/projections into the scan.

    The ``events`` fixture stores ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects; read it as raw nanos
    (``nanosAsLong``, set at runtime so any caller-provided session
    works) and surface a proper microsecond timestamp column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Driver-proofing: callers may hand in a session with a non-UTC
    # timezone; events.ts is session-TZ-sensitive (TIMESTAMP_LTZ) and
    # F.window()/session_window bucket in session time. Pin UTC at
    # runtime so results match the (UTC-naive) DuckDB oracle under any
    # caller session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
