"""Sketch queries: approximate distinct counting with exact oracles
(operators/sketches.py — KMV is deterministic in both engines, unlike
engine-internal HLL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import kmv_distinct, sql_kmv_distinct
from ..sources.catalog import load_table

K = 64


def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: KMV estimate vs exact distinct part count."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, "l_returnflag", "l_partkey", k=K)


QUERIES = {"kmv_distinct_parts": kmv_distinct_parts}

ORACLES = {
    "kmv_distinct_parts": sql_kmv_distinct("lineitem", "l_returnflag", "l_partkey", K)
}
