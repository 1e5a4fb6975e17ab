"""Connector round-trips under the gate (SURVEY.md §2c 'file formats'):
the CSV and JSON sources/sinks were previously exercised only by unit
tests — these queries write a fixture table out through the connector,
read it back with an explicit schema, and aggregate, so format fidelity
(quoting, headers, type round-trip) earns a differential CORRECTNESS
row against the parquet-derived oracle.

Sinks write to a per-call unique path under a per-PROCESS root that an
atexit hook removes (ADVICE r4: the per-call uuid dirs leaked — six
supplier copies in three formats per bench run); uniqueness within the
process keeps driver-parallel calls safe, and removal is deferred to
exit because the returned DataFrames are lazy — the fixture must
outlive the call until the caller materializes it. Reads declare the
schema explicitly — schema inference is a scan the 100 TB design never
pays.
"""

from __future__ import annotations

import atexit
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import pround, sql_pround
from ..sources.catalog import load_table

_FIXTURE_ROOT = f"/tmp/spark_graft_fix_{os.getpid()}"
atexit.register(shutil.rmtree, _FIXTURE_ROOT, ignore_errors=True)


def _fixture_path(tag: str) -> str:
    """Unique scratch dir under the per-process root (removed at exit)."""
    return f"{_FIXTURE_ROOT}/{tag}_{uuid.uuid4().hex}"


def connector_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (header) → read back → per-region name roster."""
    n = load_table(spark, sf_dir, "nation")
    path = _fixture_path("csv_rt")
    n.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).schema(n.schema).csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
    )


def connector_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JSON lines → read back → per-nation exact balance sum
    (account balances are cent-precise; the JSON text round-trip must
    preserve them bit-exactly)."""
    s = load_table(spark, sf_dir, "supplier")
    path = _fixture_path("json_rt")
    s.write.mode("overwrite").json(path)
    back = spark.read.schema(s.schema).json(path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        pround(
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_acctbal"),
    )


QUERIES = {
    "connector_csv_roundtrip": connector_csv_roundtrip,
    "connector_json_roundtrip": connector_json_roundtrip,
}

ORACLES = {
    "connector_csv_roundtrip": """
        SELECT n_regionkey, count(*) AS n_nations,
               list_aggregate(list_sort(list(n_name)), 'string_agg', ',') AS nations
        FROM nation GROUP BY n_regionkey
    """,
    "connector_json_roundtrip": f"""
        SELECT s_nationkey, count(*) AS n_suppliers,
               {sql_pround("CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)", 2)}
                   AS total_acctbal
        FROM supplier GROUP BY s_nationkey
    """,
}


def connector_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4): a registered DataSource
    whose reader declares its partitions and generates a deterministic
    relation per stripe; aggregated per user bucket with exact
    micro-unit sums. The oracle regenerates the identical rows with
    generate_series — the whole source contract (partitioning, row
    generation, schema) sits under the differential gate.
    ``sf_dir`` only scales the row count so the source does more work
    at bench scale."""
    from ..functions.rounding import sql_iunits  # noqa: F401  (oracle helper)
    from ..sources.pysource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    n_rows = 100_000 if sf_dir.rstrip("/").endswith("0.1") else 10_000
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", str(n_rows))
        .option("n_partitions", "8")
        .option("seed", "42")
        .load()
    )
    from ..functions.rounding import from_iunits, iunits

    return df.groupBy("user_bucket").agg(
        F.count("*").alias("n"),
        pround(from_iunits(F.sum(iunits(F.col("value")))), 2).alias("sum_value"),
    )


QUERIES["connector_python_datasource"] = connector_python_datasource


def _pysource_oracle() -> str:
    from ..functions.rounding import sql_from_iunits, sql_iunits
    from ..sources.pysource import sql_gen_rows

    return f"""
        WITH gen AS ({sql_gen_rows(10_000, 42)})
        SELECT user_bucket, count(*) AS n,
               {sql_pround(sql_from_iunits(f"sum({sql_iunits('value')})"), 2)} AS sum_value
        FROM gen GROUP BY user_bucket
    """


ORACLES["connector_python_datasource"] = _pysource_oracle()


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table round trip under the gate: both join sides are
    written out ``bucketBy(4, key)`` + sorted, read back as catalog
    tables, joined on the bucket key and aggregated. Proves the
    bucketed write/read path end-to-end (hash function, bucket pruning
    metadata, sorted spec survive the round trip).

    The co-location property itself — zero shuffle Exchanges in this
    join once broadcast is disabled — is pinned separately in
    ``tests/test_scale_features.py::test_bucketed_join_avoids_shuffle``
    (it needs a session-wide autoBroadcastJoinThreshold override a gate
    query must not leak). Fixed table names + overwrite keep the query
    idempotent; the driver gate runs serially. A NEW session's
    in-memory catalog does not know tables a previous session left in
    the warehouse directory, and ``saveAsTable`` refuses to claim an
    existing location — so both the catalog entry and any stale
    directory are cleared first."""
    import shutil
    from urllib.parse import urlparse

    from ..functions.money import dsum, revenue

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl, src, key in (
        ("gate_orders_b", "orders", "o_orderkey"),
        ("gate_lineitem_b", "lineitem", "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
        load_table(spark, sf_dir, src).write.mode("overwrite").bucketBy(
            4, key
        ).sortBy(key).saveAsTable(tbl)
    o = spark.table("gate_orders_b")
    li = spark.table("gate_lineitem_b")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            pround(dsum(revenue()), 2).alias("total_revenue"),
        )
    )


QUERIES["bucketed_join_revenue"] = bucketed_join_revenue

from ..functions.money import SQL_REVENUE as _SQL_REVENUE  # noqa: E402

ORACLES["bucketed_join_revenue"] = f"""
    SELECT o_orderpriority, count(*) AS n_items,
           {sql_pround(f"CAST(sum({_SQL_REVENUE}) AS DOUBLE)", 2)} AS total_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
"""


def connector_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under the gate: two parquet file generations
    with DIFFERENT schemas (v1 carries o_custkey, v2 added
    o_orderstatus instead) are read back as ONE relation via
    ``mergeSchema`` — the union'd schema with NULLs where a generation
    lacks a column. The aggregation proves both the column union and
    the null semantics: per status bucket ('?' = legacy v1 rows), row
    count, non-null custkey count, exact total. At 100 TB this is the
    everyday "the upstream job added a column last March" read path;
    mergeSchema's footer union is driver-side and O(files), and
    explicit-schema reads stay the default everywhere else."""
    o = load_table(spark, sf_dir, "orders")
    path = _fixture_path("schevo")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v1.write.mode("overwrite").parquet(f"{path}/gen=1")
    v2.write.mode("overwrite").parquet(f"{path}/gen=2")
    back = spark.read.option("mergeSchema", True).parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    return back.groupBy(
        F.coalesce(F.col("o_orderstatus"), F.lit("?")).alias("status")
    ).agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        pround(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_price"),
    )


QUERIES["connector_schema_evolution"] = connector_schema_evolution

ORACLES["connector_schema_evolution"] = f"""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus ELSE '?' END AS status,
           count(*) AS n_rows,
           count(CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END) AS n_custkey,
           {sql_pround("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)", 2)}
               AS total_price
    FROM orders
    GROUP BY 1
"""


def connector_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC → read back → per-brand count + exact retail sum.

    ORC is the third columnar container Spark ships natively (after
    parquet and the text formats above); the round trip proves schema,
    decimal-exact doubles, and strings survive the ORC writer/reader
    pair. Sum in DECIMAL(18,2) so the check is exact, mirroring the
    JSON round trip."""
    p = load_table(spark, sf_dir, "part")
    path = _fixture_path("orc_rt")
    p.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        pround(
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_retail"),
    )


QUERIES["connector_orc_roundtrip"] = connector_orc_roundtrip

ORACLES["connector_orc_roundtrip"] = f"""
    SELECT p_brand, count(*) AS n_parts,
           {sql_pround("CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)", 2)}
               AS total_retail
    FROM part GROUP BY p_brand
"""


def connector_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + PARTITION-PRUNED read: events go
    out partitioned by event_type, then the query reads ONLY the
    'purchase' directory — the layout that turns a predicate into
    skipped files instead of scanned-and-filtered rows. The pruning
    itself is asserted in tests/test_plans.py (the scan's partition
    filter must name event_type and the plan must not read the other
    four directories); THIS gate row proves the round trip preserves
    values exactly (timestamps, doubles, ids) under the partition
    layout.

    100 TB: partition-on-write is the first data-layout lever —
    coarse-grained (directory) skipping composes with zorder_layout's
    file-level min/max skipping one level down."""
    ev = load_table(spark, sf_dir, "events")
    path = _fixture_path("part_prune")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    day = F.to_date("ts")
    return back.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct("user_id").alias("n_buyers"),
        F.sum(F.expr("CAST(floor(value * 100.0d + 0.5d) AS BIGINT)")).alias(
            "value_cents"
        ),
    )


QUERIES["connector_partition_prune"] = connector_partition_prune

ORACLES["connector_partition_prune"] = """
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_purchases,
           count(DISTINCT user_id) AS n_buyers,
           CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
"""


def connector_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every streaming/
    incremental sink eventually needs: a fragmented table (64-way
    repartition write simulates thousands of micro-batch files) is
    rewritten into 4 right-sized files, and the query reads the
    COMPACTED copy. The gate proves content fidelity through the
    rewrite (counts, exact cents, key checksums per flag);
    tests/test_scale_features.py pins the file-count collapse itself.

    100 TB: compaction is a per-partition-subtree rewrite scheduled by
    file-size stats; repartition count is the target-file-size knob
    (shuffle-free coalesce() when only merging, repartition() when
    rebalancing skew)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    frag = _fixture_path("compact_frag")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    compacted = _fixture_path("compact_out")
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(floor(l_extendedprice * 100.0d + 0.5d) AS BIGINT)")).alias(
            "price_cents"
        ),
        F.sum(
            (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 1_000_003
        ).alias("key_checksum"),
    )


QUERIES["connector_compaction"] = connector_compaction

ORACLES["connector_compaction"] = """
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5)
               AS BIGINT)) AS BIGINT) AS price_cents,
           CAST(sum((l_orderkey * 7 + l_linenumber) % 1000003) AS BIGINT)
               AS key_checksum
    FROM lineitem GROUP BY 1
"""


_ERA_DIM = [(y, "early" if y <= 1996 else "late") for y in range(1992, 2005)]


def connector_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Partition Pruning: the fact table is written partitioned
    by ship YEAR, then joined to a year-era dimension filtered to
    'early' — the partition filter is only known AFTER the dim side
    evaluates, so Catalyst injects a dynamicpruning subquery into the
    fact scan and the other year directories are never read. The plan
    contract (dynamicpruningexpression present on the scan) is asserted
    in tests/test_plans.py; this gate row pins result fidelity.

    100 TB: DPP is the mechanism that makes star-schema date/dimension
    filters prune a partitioned fact without the user hand-writing the
    partition predicate — table layout (partition column = the join
    key) is what unlocks it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("ship_year"), "l_returnflag", "l_extendedprice"
    )
    path = _fixture_path("dpp_fact")
    li.write.mode("overwrite").partitionBy("ship_year").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(_ERA_DIM, "yr int, era string")
    early = dim.filter(F.col("era") == "early")
    joined = fact.join(early, fact.ship_year == early.yr)
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(floor(l_extendedprice * 100.0d + 0.5d) AS BIGINT)")).alias(
            "price_cents"
        ),
    )


QUERIES["connector_dpp_join"] = connector_dpp_join

ORACLES["connector_dpp_join"] = """
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5)
               AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem
    WHERE CAST(year(l_shipdate) AS INTEGER) <= 1996
    GROUP BY 1
"""


# ---------------------------------------------------- federated union
# One logical table served from THREE physical formats at once — the
# lakehouse migration shape (yesterday's CSV dump ∪ today's JSON feed ∪
# the parquet gold copy). supplier is split 3 ways by key mod 3, each
# shard round-trips through a different format, and the union must
# reassemble the exact original: the final per-nation balance sum (exact
# cents) equals a single-source aggregate, which is precisely what the
# oracle computes from the parquet view alone — any format's type drift
# (CSV stringly floats, JSON number re-parse) breaks the hash. Schema
# alignment is by-name (unionByName). 100 TB: each branch scans and
# filters independently (pushdown per format), union is a no-shuffle
# concat; the aggregate is the only exchange.


def connector_federated_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    base = _fixture_path("fed")
    s.filter(F.col("s_suppkey") % 3 == 0).write.mode("overwrite").parquet(
        f"{base}/p"
    )
    s.filter(F.col("s_suppkey") % 3 == 1).write.mode("overwrite").option(
        "header", True
    ).csv(f"{base}/c")
    s.filter(F.col("s_suppkey") % 3 == 2).write.mode("overwrite").json(f"{base}/j")
    u = (
        spark.read.parquet(f"{base}/p")
        .unionByName(
            spark.read.option("header", True).schema(s.schema).csv(f"{base}/c")
        )
        .unionByName(spark.read.schema(s.schema).json(f"{base}/j"))
    )
    return u.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        pround(
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_acctbal"),
    )


QUERIES["connector_federated_union"] = connector_federated_union

ORACLES["connector_federated_union"] = f"""
    SELECT s_nationkey, count(*) AS n_suppliers,
           {sql_pround('CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)', 2)}
               AS total_acctbal
    FROM supplier GROUP BY s_nationkey
"""


# ----------------------------------------------- binaryFile connector
# The blob-ingest path a multimodal corpus actually arrives through:
# one opaque file per asset, read with Spark's binaryFile source
# (path/length/content rows, partitioned by file), id recovered from
# the file name, then the SAME strict PPM decode as multimodal_decode.
# Writing the fixture files is driver-side setup (Spark has no binary
# writer — in production the files pre-exist); the measured operator is
# the distributed binaryFile scan + Arrow-batched decode. The oracle is
# multimodal_decode's arithmetic feature recomputation restricted to
# the same id range — the connector must be byte-transparent end to
# end.


def connector_binaryfile_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.multimodal import (
        documents_as_ppm_images,
        extract_image_features,
    )
    from ..sources.catalog import load_table as _lt

    docs = (
        _lt(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length("text") > 0))
    )
    base = _fixture_path("binf")
    os.makedirs(base, exist_ok=True)
    for r in documents_as_ppm_images(docs).collect():  # fixture setup only
        with open(f"{base}/{int(r['media_id']):06d}.ppm", "wb") as fh:
            fh.write(bytes(r["media"]))
    bf = spark.read.format("binaryFile").load(base)
    media = bf.select(
        F.regexp_extract(F.col("path"), r"(\d{6})\.ppm$", 1)
        .cast("long")
        .alias("media_id"),
        F.col("content").alias("media"),
    )
    return extract_image_features(media)


QUERIES["connector_binaryfile_decode"] = connector_binaryfile_decode

from .multimodal import ppm_decode_oracle  # noqa: E402

ORACLES["connector_binaryfile_decode"] = ppm_decode_oracle(
    "length(text) > 0 AND doc_id < 100"
)


# ------------------------------------------- malformed-record handling
# Real ingestion meets broken rows; the connector contract for them is
# a first-class surface: PERMISSIVE mode must parse every well-formed
# row, null out the broken ones, and capture their raw text in the
# corrupt-record column — never drop silently, never fail the job. The
# fixture is deterministic (every 7th row's numeric field is the
# literal 'oops'), so the oracle regenerates the exact good/corrupt
# partition and the exact cent-sum of the surviving values from
# generate_series. 100 TB: malformed handling is per-row scan logic —
# no shuffle, no skew; the quarantine pattern (route corrupt rows to a
# side table) is dq_quarantine_orders' job.

BADREC_N = 210  # 30 corrupt (every 7th), 180 good


def connector_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..functions.rounding import iunits

    base = _fixture_path("badcsv")
    os.makedirs(base, exist_ok=True)
    lines = ["id,amount"]
    for i in range(BADREC_N):
        amount = "oops" if i % 7 == 0 else f"{i}.{i % 100:02d}"
        lines.append(f"{i},{amount}")
    with open(f"{base}/data.csv", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("id long, amount double, _corrupt string")
        .csv(base)
    )
    good = F.col("_corrupt").isNull()
    return df.agg(
        F.sum(good.cast("long")).alias("n_good"),
        F.sum((~good).cast("long")).alias("n_corrupt"),
        F.sum(F.when(good, iunits(F.col("amount"), 2)).otherwise(F.lit(0)))
        .alias("good_amount_cents"),
    )


QUERIES["connector_csv_badrecords"] = connector_csv_badrecords

ORACLES["connector_csv_badrecords"] = f"""
    WITH rows_ AS (
        SELECT i FROM generate_series(0, {BADREC_N - 1}) AS t(i)
    )
    SELECT CAST(sum(CASE WHEN i % 7 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(sum(CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN i % 7 != 0 THEN i * 100 + (i % 100) ELSE 0 END)
                AS BIGINT) AS good_amount_cents
    FROM rows_
"""


# ------------------------------------- streaming Python data source
# Spark 4's custom STREAMING source API under the gate: the
# SimpleDataSourceStreamReader serves the deterministic synthetic
# relation in 250-row micro-batch slices (offsets = row positions),
# a real streaming query drains it to a memory sink, and the result
# must equal the batch aggregate the generate_series oracle computes —
# proving offset bookkeeping delivers each row exactly once across
# micro-batches. The aggregation runs on the SINK (complete-mode
# groupBy), exercising multi-batch state merge too.


def connector_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from ..functions.rounding import from_iunits, iunits
    from ..sources.pysource import SyntheticEventsStreamDataSource

    spark.dataSource.register(SyntheticEventsStreamDataSource)
    n_rows = 100_000 if sf_dir.rstrip("/").endswith("0.1") else 10_000
    stream = (
        spark.readStream.format("synthetic_events_stream")
        .option("n_rows", str(n_rows))
        .option("rows_per_batch", str(max(1, n_rows // 7)))  # ≥7 micro-batches
        .option("seed", "42")
        .load()
        .groupBy("user_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(iunits(F.col("value"), 2)).alias("sum_cents"),
        )
    )
    name = f"py_stream_{_uuid.uuid4().hex[:8]}"
    from ..streaming.events import pinned_stream_state

    with pinned_stream_state(spark):
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(name).select(
        "user_bucket",
        F.col("n").cast("long").alias("n"),
        pround(from_iunits(F.col("sum_cents"), 2), 2).alias("sum_value"),
    )


QUERIES["connector_python_stream"] = connector_python_stream

from ..functions.rounding import sql_from_iunits as _sql_fiu  # noqa: E402
from ..functions.rounding import sql_iunits as _sql_iu2  # noqa: E402
from ..sources.pysource import sql_gen_rows as _sql_gen  # noqa: E402


ORACLES["connector_python_stream"] = f"""
    WITH gen AS ({_sql_gen(10_000, 42)})
    SELECT user_bucket, CAST(count(*) AS BIGINT) AS n,
           {sql_pround(_sql_fiu(f"sum({_sql_iu2('value', 2)})", 2), 2)} AS sum_value
    FROM gen GROUP BY user_bucket
"""


# ------------------------------------------- transaction-log replay
# The lakehouse table-format primitive (Delta/Iceberg's core idea): a
# table IS an ordered log of add/remove file actions, and a snapshot
# is the log folded up to a version. This op builds a deterministic
# action log from orders (every order adds a "file"; finished orders
# remove it a few versions later), round-trips it through JSON-lines
# on disk (the log is a real on-disk artifact, like the binaryFile
# rail), and REPLAYS it: per version, action counts plus the
# cumulative live-file count and live bytes — the table-state ledger
# a lakehouse reader derives before planning a scan.
#
# Exactness: file sizes are exact BIGINT cents; the fold is two window
# prefix sums over the |versions|-row per-version aggregate. The JSON
# round-trip must preserve every count bit-exactly for the oracle
# (which replays the same derivations from orders directly) to match.
#
# Scale: the log write/read is one fact-table pass; the replay
# aggregates to |versions| rows before any window runs. Real Delta
# checkpoints amortize exactly this fold — the per-version relation
# here IS that checkpoint's content.

def connector_txlog_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits

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
    path = _fixture_path("txlog")
    adds.unionByName(removes).write.mode("overwrite").json(path)
    log = spark.read.schema(
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
    w = W.orderBy("version").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_v.select(
        "version",
        "n_adds",
        "n_removes",
        F.sum(F.col("n_adds") - F.col("n_removes")).over(w).alias(
            "live_files"
        ),
        F.sum("delta_bytes").over(w).alias("live_bytes"),
    )


QUERIES["connector_txlog_replay"] = connector_txlog_replay

from ..functions.rounding import sql_iunits as _sql_iu_tx  # noqa: E402

ORACLES["connector_txlog_replay"] = f"""
    WITH base AS (
        SELECT o_orderkey AS file_id,
               o_orderkey % 7 AS v_add,
               {_sql_iu_tx('o_totalprice', 2)} AS size_bytes,
               o_orderstatus = 'F' AS finished
        FROM orders
    ), log AS (
        SELECT 'add' AS action, file_id, v_add AS version, size_bytes
        FROM base
        UNION ALL
        SELECT 'remove', file_id, v_add + 1 + file_id % 3, size_bytes
        FROM base WHERE finished
    ), per_v AS (
        SELECT version,
               CAST(sum(CASE WHEN action = 'add' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_adds,
               CAST(sum(CASE WHEN action = 'remove' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removes,
               CAST(sum(CASE WHEN action = 'add' THEN size_bytes
                             ELSE -size_bytes END) AS BIGINT) AS delta_bytes
        FROM log GROUP BY version
    )
    SELECT version, n_adds, n_removes,
           CAST(sum(n_adds - n_removes) OVER (
               ORDER BY version ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS live_files,
           CAST(sum(delta_bytes) OVER (
               ORDER BY version ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS live_bytes
    FROM per_v
"""


# ------------------------------------------------ CSV quoting torture
# The connector contract nobody tests until it corrupts data: values
# containing the delimiter, the quote character, embedded newlines,
# and leading/trailing spaces must survive a CSV write→read round
# trip byte-exactly. The torture strings are built deterministically
# from orders IN-QUERY; the proof of byte-exactness is a portable
# hash checksum over the read-back values that the oracle recomputes
# from the source table without ever touching a file. Read side needs
# multiLine=true — embedded newlines silently shear rows without it
# (the exact bug class this query pins).

def connector_csv_quoting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    torture = F.concat(
        F.lit('a,"b'),
        F.lit("\n"),
        F.col("o_orderpriority"),
        F.lit(',"",  '),
        F.col("o_orderkey").cast("string"),
    )
    src = o.select(
        F.col("o_orderkey").alias("id"),
        torture.alias("v"),
        iunits(F.col("o_totalprice"), 2).alias("cents"),
    )
    path = _fixture_path("csv_quote")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("id long, v string, cents long")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
        F.sum(token_hash(F.col("v"))).alias("value_checksum"),
        F.sum(F.length("v")).alias("total_chars"),
    )


QUERIES["connector_csv_quoting"] = connector_csv_quoting

from ..functions.hashing import sql_token_hash as _sql_th_csvq  # noqa: E402
from ..functions.rounding import sql_iunits as _sql_iu_csvq  # noqa: E402

ORACLES["connector_csv_quoting"] = f"""
    WITH src AS (
        SELECT 'a,"b' || chr(10) || o_orderpriority || ',"",  '
                   || CAST(o_orderkey AS VARCHAR) AS v,
               {_sql_iu_csvq('o_totalprice', 2)} AS cents
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum({_sql_th_csvq('v')}) AS BIGINT) AS value_checksum,
           CAST(sum(length(v)) AS BIGINT) AS total_chars
    FROM src
"""


# ---------------------------------------------- fixed-width connector
# Round 11: the mainframe/export interchange format the connector
# battery was missing next to CSV/JSON/ORC/binaryFile — fixed-width
# records with NO delimiter: layout (orderkey 12 zero-pad)(status 1)
# (cents 14 zero-pad)(priority 15 space-pad), 42 chars/record. The
# writer synthesizes records from orders (so the oracle can replay
# the byte-exact layout in SQL without touching the file), MUTILATES
# every 97th record (truncation — the torture case), round-trips
# through spark.read.text, and the reader demonstrates the production
# contract: length-gate → substring-parse → quarantine count. All
# outputs exact integers/checksums. Scale: text source splits by
# line like any Spark text scan; the parse is per-row codegen.

FW_REC_LEN = 42


def connector_fixedwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    rec = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.col("o_orderstatus"),
        F.lpad(iunits(F.col("o_totalprice"), 2).cast("string"), 14, "0"),
        F.rpad(F.col("o_orderpriority"), 15, " "),
    )
    line = F.when(
        F.col("o_orderkey") % 97 == 0, F.substring(rec, 1, FW_REC_LEN - 7)
    ).otherwise(rec)
    path = _fixture_path("fixedwidth")
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    good = F.length("value") == FW_REC_LEN
    parsed = back.select(
        good.alias("ok"),
        F.when(good, F.substring("value", 1, 12).cast("long")).alias("okey"),
        F.when(good, F.substring("value", 13, 1)).alias("status"),
        F.when(good, F.substring("value", 14, 14).cast("long")).alias("cents"),
        F.when(good, F.rtrim(F.substring("value", 28, 15))).alias("prio"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((~F.col("ok")).cast("long")).alias("n_quarantined"),
        F.sum("cents").alias("sum_cents"),
        F.sum("okey").alias("key_checksum"),
        # F.concat (NOT concat_ws): NULL fields of quarantined records
        # must propagate so both engines skip them in the sum
        F.sum(
            token_hash(F.concat(F.col("status"), F.lit("|"), F.col("prio")))
        ).alias("field_checksum"),
    )


QUERIES["connector_fixedwidth"] = connector_fixedwidth

from ..functions.hashing import sql_token_hash as _sql_th_fw  # noqa: E402
from ..functions.rounding import sql_iunits as _sql_iu_fw  # noqa: E402

ORACLES["connector_fixedwidth"] = f"""
    WITH rec AS (
        SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
               || o_orderstatus
               || lpad(CAST({_sql_iu_fw('o_totalprice', 2)} AS VARCHAR),
                       14, '0')
               || rpad(o_orderpriority, 15, ' ') AS full_rec,
               o_orderkey
        FROM orders
    ), lines AS (
        SELECT CASE WHEN o_orderkey % 97 = 0
                    THEN substring(full_rec, 1, {FW_REC_LEN - 7})
                    ELSE full_rec END AS value
        FROM rec
    ), parsed AS (
        SELECT length(value) = {FW_REC_LEN} AS ok,
               CASE WHEN length(value) = {FW_REC_LEN}
                    THEN CAST(substring(value, 1, 12) AS BIGINT) END AS okey,
               CASE WHEN length(value) = {FW_REC_LEN}
                    THEN substring(value, 13, 1) END AS status,
               CASE WHEN length(value) = {FW_REC_LEN}
                    THEN CAST(substring(value, 14, 14) AS BIGINT) END AS cents,
               CASE WHEN length(value) = {FW_REC_LEN}
                    THEN rtrim(substring(value, 28, 15)) END AS prio
        FROM lines
    )
    SELECT CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
               AS n_quarantined,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(okey) AS BIGINT) AS key_checksum,
           CAST(sum({_sql_th_fw("status || '|' || prio")}) AS BIGINT)
               AS field_checksum
    FROM parsed
"""
