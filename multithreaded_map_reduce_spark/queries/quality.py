"""Data-quality constraint suite — the declarative validation pass
(Deequ-style) a production pipeline runs before publishing a table:
not-null, uniqueness, referential integrity, value ranges, accepted
values. One gate row per TABLE of constraints, each constraint one
result row, all counts exact.

Scale shape: the single-column constraints for one table fold into ONE
scan + one aggregate (conditional counts — same single-pass trick as
profile_lineitem); uniqueness adds a countDistinct inside the same
aggregate; referential integrity is the only join — a LEFT ANTI against
the parent key relation, which Spark executes as a broadcast anti join
when the parent is dim-sized and a shuffled one otherwise. Nothing here
collects to the driver; the report is itself a DataFrame a pipeline can
sink or alert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over orders (+ RI to customer):
    (constraint, total, violations, passed)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    # single-pass conditional aggregate for the scan-local constraints
    one = o.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("_nnull"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("_dup"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("_badstatus"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("_badprice"),
    )
    scan_rows = one.selectExpr(
        """stack(4,
            'not_null:o_custkey', _nnull,
            'unique:o_orderkey', _dup,
            'accepted_values:o_orderstatus', _badstatus,
            'range:o_totalprice>0', _badprice
        ) AS (constraint, violations)""",
        "_n AS total",
    )

    orphans = (
        o.join(
            c.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .crossJoin(F.broadcast(one.select(F.col("_n").alias("total"))))
        .select(
            F.lit("ri:orders.custkey->customer").alias("constraint"),
            "violations",
            "total",
        )
    )

    report = scan_rows.select("constraint", "violations", "total").unionByName(
        orphans
    )
    return report.select(
        "constraint",
        F.col("total").cast("long").alias("total"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


QUERIES = {"dq_orders_constraints": dq_orders_constraints}

ORACLES = {
    "dq_orders_constraints": """
        WITH base AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nnull,
                   count(*) - count(DISTINCT o_orderkey) AS ndup,
                   sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                            THEN 1 ELSE 0 END) AS nbadstatus,
                   sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nbadprice
            FROM orders
        ), ri AS (
            SELECT count(*) AS orphans FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        )
        SELECT "constraint", CAST(total AS BIGINT) AS total,
               CAST(violations AS BIGINT) AS violations,
               violations = 0 AS passed
        FROM (
            SELECT 'not_null:o_custkey' AS "constraint", n AS total, nnull AS violations FROM base
            UNION ALL
            SELECT 'unique:o_orderkey', n, ndup FROM base
            UNION ALL
            SELECT 'accepted_values:o_orderstatus', n, nbadstatus FROM base
            UNION ALL
            SELECT 'range:o_totalprice>0', n, nbadprice FROM base
            UNION ALL
            SELECT 'ri:orders.custkey->customer', base.n, ri.orphans FROM base, ri
        )
    """
}
