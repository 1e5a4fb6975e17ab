"""Skew-handling proof under the gate: a deliberately skewed join key
(5 hot keys over the whole lineitem table — each key ≈ 20% of rows, the
degenerate case AQE's skew split alone can't always save) joined to a
dim through the explicit salting operator (operators/skew.py), then
aggregated. The oracle is the plain unsalted SQL join: identical
results prove salting changes the physical distribution only, and the
bench entry tracks its wall-time round-over-round."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.catalog import load_table


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.pmod(F.col("l_orderkey"), F.lit(5)).alias("hk"), "l_quantity"
    )
    dim = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 5)
        .select(F.col("n_nationkey").alias("hk"), "n_name")
    )
    joined = salted_join(li, dim, "hk", n_salts=8)
    return joined.groupBy("n_name").agg(
        F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
        F.count("*").alias("n"),
    )


QUERIES = {"skew_salted_join": skew_salted_join}

ORACLES = {
    "skew_salted_join": """
        SELECT n_name, sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        JOIN nation ON l_orderkey % 5 = n_nationkey
        WHERE n_nationkey < 5
        GROUP BY n_name
    """,
}
