"""Privacy / anonymization pass — what a training-data pipeline runs
before publishing a dataset containing user-linked records:

- deterministic pseudonymization (keyed token replaces the direct
  identifier — same input → same token, so joins and dedup still work
  on the masked table; md5 is the portable token function both engines
  share);
- k-anonymity suppression report over the quasi-identifier grouping
  (nation × market segment): groups below k must be suppressed before
  release, and the report IS the decision table.

Scale shape: pseudonymization is a stateless scan (codegen'd md5 —
zero shuffle, pushdown intact); the k-anonymity report is one
map-side-combinable aggregate over the quasi-identifier key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

K_ANON = 5
SALT = "mmr2026"  # keyed tokenization: token = md5(salt || id-field)


def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked slice (custkey < 500): the direct identifier c_name is
    replaced by a 16-hex keyed token; balance survives (analytical
    value), raw name does not. Deterministic ⇒ exactly replayable by
    the oracle — the point of keyed pseudonymization over random
    tokens is precisely that it is stable across runs and engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") < 500).select(
        "c_custkey",
        F.substring(F.md5(F.concat(F.lit(SALT), F.col("c_name"))), 1, 16).alias(
            "name_token"
        ),
        "c_nationkey",
        "c_mktsegment",
    )


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression report over the (nation, segment) quasi-identifier:
    group size and whether the group fails k=5 and must be withheld."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("group_size") < K_ANON).alias("suppress"),
        )
    )


QUERIES = {
    "privacy_pseudonymize": privacy_pseudonymize,
    "privacy_k_anonymity": privacy_k_anonymity,
}

ORACLES = {
    "privacy_pseudonymize": f"""
        SELECT c_custkey,
               substring(md5('{SALT}' || c_name), 1, 16) AS name_token,
               c_nationkey, c_mktsegment
        FROM customer WHERE c_custkey < 500
    """,
    "privacy_k_anonymity": f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS group_size,
               count(*) < {K_ANON} AS suppress
        FROM customer GROUP BY 1, 2
    """,
}
