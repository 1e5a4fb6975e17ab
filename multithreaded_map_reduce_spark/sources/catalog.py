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

    Timestamp normalization: the fixture stores NAIVE microsecond
    timestamps, and every timestamp in this engine is TIMESTAMP_NTZ —
    the exact naive values DuckDB reads, with no session-timezone
    coupling (functions/time.py). Two legacy/defensive paths fold into
    that: parquet TIMESTAMP(NANOS) read as raw nanos (``nanosAsLong``),
    and LTZ columns from a caller session running with
    ``inferTimestampNTZ=false`` (cast back to naive wall-clock in the
    UTC session timezone pinned below).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Pin UTC so any LTZ→NTZ normalization below is the identity on the
    # stored naive values, under any caller-provided session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    for cname, dtype in df.dtypes:
        if dtype == "timestamp":
            df = df.withColumn(cname, F.col(cname).cast("timestamp_ntz"))
    return df


def _parse_byte_size(raw: object, default: int = 134217728) -> int:
    """Parse a Spark byte-size conf value ('134217728', '134217728b',
    '128m', '1g', '512k', '2t') to bytes.

    ADVICE r4: the previous strip-non-digits parse turned '128m' into
    128 BYTES, silently tripping the size guard and disabling fan_out
    under a common user config (the default '134217728b' only worked by
    accident of its suffix)."""
    s = str(raw).strip().lower()
    mult = 1
    suffixes = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}
    if s.endswith("b"):
        s = s[:-1]
    if s and s[-1] in suffixes:
        mult = suffixes[s[-1]]
        s = s[:-1]
    try:
        return int(s) * mult
    except ValueError:
        return default


def _has_repartition(plan) -> bool:
    """True if any NODE of the logical plan is a repartition.

    Checks node names at the head of each treeString line (after the
    tree-drawing prefix) instead of substring-matching the whole plan
    text, which a string literal like ``col = 'Repartition'`` inside a
    filter would false-positive (ADVICE r4)."""
    for line in str(plan.treeString()).splitlines():
        node = line.lstrip(" +:-")
        if node.startswith(("Repartition", "RebalancePartitions")):
            return True
    return False


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the whole input fits in a
    single scan split.

    CPU-bound per-row stages (md5 shingle hashing, simhash bit votes,
    codec parsing) inherit the scan's split count, and a small parquet
    file is ONE split — so on local[32] the whole hashing stage runs on
    a single core while 31 idle (measured: simhash fingerprints at
    sf0.1 dropped ~2× warm once fanned out). The guard is Catalyst's
    logical size estimate vs ``spark.sql.files.maxPartitionBytes``: an
    input bigger than one split already gets row-group/file splits from
    the scan, so the extra round-robin shuffle exists exactly when it
    is nearly free (sub-split input) and vanishes at 100 TB. The probe
    is driver-only logical-plan stats (~1 ms) — NOT ``df.rdd``, whose
    physical compile costs ~70 ms per call on this hot path. Unknown
    stats (non-file sources report Long.MaxValue) and plans that
    already carry a repartition stay untouched.

    Capability guard: the stats probe needs the classic py4j JVM handle
    (``df._jdf``). Under Spark Connect there is no ``_jdf`` — the probe
    is skipped and the input returns untouched, which is the safe
    default (a Connect cluster is not the single-split local[32] case
    this exists for)."""
    spark = df.sparkSession
    if not hasattr(df, "_jdf"):  # Spark Connect: no JVM handle, no probe
        return df
    try:
        target = min_parts or spark.sparkContext.defaultParallelism
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        max_split = _parse_byte_size(raw)
        plan = df._jdf.queryExecution().optimizedPlan()
        if int(str(plan.stats().sizeInBytes())) > max_split:
            return df
        if _has_repartition(plan):
            return df
    except Exception:  # stats probe is best-effort; never fail the query
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
