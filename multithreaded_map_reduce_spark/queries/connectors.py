"""Connector round-trips under the gate (SURVEY.md §2c 'file formats'):
the CSV and JSON sources/sinks were previously exercised only by unit
tests — these queries write a fixture table out through the connector,
read it back with an explicit schema, and aggregate, so format fidelity
(quoting, headers, type round-trip) earns a differential CORRECTNESS
row against the parquet-derived oracle.

Sinks write to a per-call unique /tmp path (driver-parallel safe);
reads declare the schema explicitly — schema inference is a scan the
100 TB design never pays.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import pround, sql_pround
from ..sources.catalog import load_table


def connector_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (header) → read back → per-region name roster."""
    n = load_table(spark, sf_dir, "nation")
    path = f"/tmp/csv_rt_{uuid.uuid4().hex}"
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
    path = f"/tmp/json_rt_{uuid.uuid4().hex}"
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
