"""SQL-interface surface: the same engine driven through ``spark.sql``
over registered views — Catalyst produces identical plans either way
(SURVEY.md §3 'SQL / query language: absent in reference'); this module
proves the SQL entry point plus the constructs most naturally written
in SQL: GROUPING SETS, correlated EXISTS/IN, scalar subqueries.

Money math follows the same DECIMAL discipline as the DataFrame queries
(functions/money.py), written inline in the SQL dialect of each engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_pround, sql_pround_spark
from ..sources.catalog import load_table, register_views

_DEC = "DECIMAL(18,2)"


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum, the pushdown showcase."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT {sql_pround_spark(f"CAST(sum(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC})) AS DOUBLE)", 2)} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
    )


def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
        """,
    )


def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers with an order over 400000."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000.0
        )
        """,
    )


def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery): orders from BUILDING-segment customers in 1995."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE year(o_orderdate) = 1995
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """,
    )


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT o_orderkey,
               {sql_pround_spark("CAST(o_totalprice AS DOUBLE)", 2)} AS total
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) / count(*) FROM orders
        )
        """,
    )


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function library over tokenized documents (SQL dialect)."""
    return _sql(
        spark,
        sf_dir,
        r"""
        SELECT doc_id,
               size(toks) AS n_tokens,
               array_join(slice(toks, 1, 3), ',') AS first3,
               CAST(array_contains(toks, 'the') AS INT) AS has_the,
               array_join(slice(reverse(toks), 1, 2), ',') AS last2_reversed,
               size(array_distinct(toks)) AS n_distinct
        FROM (
            SELECT doc_id, filter(split(text, '\\s+'), x -> x != '') AS toks
            FROM documents
        )
        """,
    )


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "grouping_sets_pricing": grouping_sets_pricing,
    "exists_correlated": exists_correlated,
    "in_subquery": in_subquery,
    "scalar_subquery": scalar_subquery,
    "array_functions": array_functions,
}

ORACLES = {
    "q6_forecast_revenue": f"""
        SELECT {sql_pround(f"CAST(sum(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC})) AS DOUBLE)", 2)} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "grouping_sets_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
    """,
    "exists_correlated": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000.0
        )
    """,
    "in_subquery": """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE year(o_orderdate) = 1995
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    "scalar_subquery": f"""
        SELECT o_orderkey,
               {sql_pround('CAST(o_totalprice AS DOUBLE)', 2)} AS total
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) / count(*) FROM orders
        )
    """,
    "array_functions": r"""
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               array_to_string(toks[1:3], ',') AS first3,
               CAST(list_contains(toks, 'the') AS INT) AS has_the,
               array_to_string(list_reverse(toks)[1:2], ',') AS last2_reversed,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct
        FROM (
            SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
            FROM documents
        )
    """,
}


def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE in pure Spark SQL (4.x): hop-bounded reachability
    over the nation trade graph from nation 0 — the declarative twin of
    the iterative operators (connected components / PageRank run the
    same dataflow imperatively with localCheckpoint; the optimizer runs
    this one). min(hops) per reachable nation, ≤ 3 hops."""
    register_views(spark, sf_dir, ("lineitem", "orders", "supplier", "customer"))
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            WHERE s_nationkey != c_nationkey
        ), reach(id, hops) AS (
            SELECT CAST(0 AS BIGINT), 0
            UNION ALL
            SELECT e.dst, r.hops + 1
            FROM reach r JOIN edges e ON e.src = r.id
            WHERE r.hops < 3
        )
        SELECT id AS nationkey, CAST(min(hops) AS INTEGER) AS min_hops
        FROM reach GROUP BY id
        """
    )


def lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT: each nation's
    two richest customers — the plan shape (LateralJoin over a
    correlated ordered-limit subquery) that windows usually stand in
    for; here the optimizer gets the real thing."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(
        """
        SELECT n.n_nationkey, n.n_name, t.c_custkey,
               floor(t.c_acctbal * 100d + 0.5d) / 100d AS acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
        ) t
        """
    )


QUERIES["recursive_reachability"] = recursive_reachability
QUERIES["lateral_topk_customers"] = lateral_topk_customers

ORACLES["recursive_reachability"] = """
    WITH RECURSIVE edges AS (
        SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        WHERE s_nationkey != c_nationkey
    ), reach(id, hops) AS (
        SELECT CAST(0 AS BIGINT), 0
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN edges e ON e.src = r.id
        WHERE r.hops < 3
    )
    SELECT id AS nationkey, CAST(min(hops) AS INTEGER) AS min_hops
    FROM reach GROUP BY id
"""

ORACLES["lateral_topk_customers"] = """
    SELECT n.n_nationkey, n.n_name, t.c_custkey,
           floor(t.c_acctbal * 100 + 0.5) / 100 AS acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
    ) t
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: per event type, build a bucket→count
    MAP with ``map_from_entries``, then interrogate it with
    ``map_keys`` / ``element_at`` / ``size``. The map itself stays
    internal (engines hash maps differently); the differential contract
    is everything read OUT of it."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", (F.col("user_id") % 10).alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    m = per_bucket.groupBy("event_type").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("bucket", "cnt")))
        ).alias("m")
    )
    return m.select(
        "event_type",
        F.size("m").alias("n_buckets"),
        F.element_at("m", F.lit(3)).alias("bucket3_count"),
        F.array_join(
            F.transform(F.map_keys("m"), lambda k: k.cast("string")), ","
        ).alias("buckets"),
    )


QUERIES["map_functions"] = map_functions

ORACLES["map_functions"] = """
    WITH pb AS (
        SELECT event_type, user_id % 10 AS bucket, count(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS INTEGER) AS n_buckets,
           min(CASE WHEN bucket = 3 THEN cnt END) AS bucket3_count,
           list_aggregate(list_transform(list_sort(list(bucket)),
                                         b -> CAST(b AS VARCHAR)), 'string_agg', ',')
               AS buckets
    FROM pb GROUP BY event_type
"""


# --------------------------------------------------- SQL-defined UDFs
# Spark 4 SQL scalar functions (CREATE FUNCTION ... RETURNS ... RETURN
# expr) — reusable business logic DEFINED IN SQL, no Python/JVM UDF
# registration, and crucially Catalyst INLINES the body into the
# calling plan (whole-stage codegen, pushdown through the call — the
# exact opposite of the black-box UDF slow path). The body is the
# repo's exact-decimal revenue/charge discipline; the oracle inlines
# the identical expressions, so the function-resolution layer itself
# is what's under test.


def sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION gate_disc_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(18,4)
        RETURN CAST(p AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(d AS DECIMAL(18,2)))
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION gate_charge(p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DECIMAL(18,6)
        RETURN gate_disc_price(p, d) * (CAST(1.0 AS DECIMAL(18,2)) + CAST(t AS DECIMAL(18,2)))
    """)
    return spark.sql("""
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(sum(gate_disc_price(l_extendedprice, l_discount)) AS DOUBLE)
                   AS sum_revenue,
               CAST(sum(gate_charge(l_extendedprice, l_discount, l_tax)) AS DOUBLE)
                   AS sum_charge
        FROM lineitem
        GROUP BY l_returnflag
    """)


QUERIES["sql_udf_pricing"] = sql_udf_pricing

from ..functions.money import SQL_CHARGE as _SQL_CHARGE  # noqa: E402
from ..functions.money import SQL_REVENUE as _SQL_REVENUE  # noqa: E402

ORACLES["sql_udf_pricing"] = f"""
    SELECT l_returnflag, count(*) AS n_items,
           CAST(sum({_SQL_REVENUE}) AS DOUBLE) AS sum_revenue,
           CAST(sum({_SQL_CHARGE}) AS DOUBLE) AS sum_charge
    FROM lineitem GROUP BY l_returnflag
"""


def sql_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE function + correlated LATERAL call: each URGENT order's
    total splits into 3 integer-cent installments (remainder on the
    first — the banker's split), the table function producing the rows.
    Exercises CREATE FUNCTION ... RETURNS TABLE and lateral correlation
    through it; all arithmetic integer-exact."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION gate_installments(total DOUBLE, k INT)
        RETURNS TABLE(inst INT, amount_cents BIGINT)
        RETURN SELECT i AS inst,
                      CAST(CAST(round(total * 100) AS BIGINT) div k AS BIGINT)
                      + CASE WHEN i = 1
                             THEN CAST(round(total * 100) AS BIGINT) % k
                             ELSE 0 END AS amount_cents
               FROM (SELECT explode(sequence(1, k)) AS i)
    """)
    return spark.sql("""
        SELECT o.o_orderkey, t.inst, t.amount_cents
        FROM orders o, LATERAL gate_installments(o.o_totalprice, 3) t
        WHERE o.o_orderpriority = '1-URGENT'
    """)


QUERIES["sql_udtf_installments"] = sql_udtf_installments

ORACLES["sql_udtf_installments"] = """
    SELECT o_orderkey, CAST(i AS INTEGER) AS inst,
           CAST(CAST(round(o_totalprice * 100) AS BIGINT) // 3
                + CASE WHEN i = 1
                       THEN CAST(round(o_totalprice * 100) AS BIGINT) % 3
                       ELSE 0 END AS BIGINT) AS amount_cents
    FROM orders, unnest(generate_series(1, 3)) AS t(i)
    WHERE o_orderpriority = '1-URGENT'
"""


# ----------------------------------------------- try_* error-safe family
# Round 13: Spark's ANSI-mode escape hatches — try_divide / try_mod /
# try_cast return NULL where strict ANSI raises (divide-by-zero,
# overflow, malformed cast). A 100 TB ingest job runs ANSI-on for
# correctness but wraps UNTRUSTED arithmetic in try_* so one poisoned
# row degrades to NULL instead of killing a 6-hour stage — this query
# exercises all three against adversarial expressions built from the
# fixture (zero denominators every 7th row, and a cast over a mixed
# digit/letter string where only the o_orderkey%3=0 slice parses). DuckDB has no try_*, so the oracle
# spells the identical semantics with CASE guards — which is precisely
# the check that try_*'s NULL contract matches the portable SQL
# meaning. Scale: one scan, row-local expressions, fully codegen'd.


def sql_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(try_divide(o_totalprice, o_custkey % 7)) AS BIGINT)
                AS n_div_ok,
            CAST(sum(CASE WHEN try_divide(o_totalprice, o_custkey % 7)
                          IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_div_null,
            CAST(count(try_mod(o_orderkey, o_custkey % 5)) AS BIGINT)
                AS n_mod_ok,
            CAST(count(try_cast(CASE WHEN o_orderkey % 3 = 0
                                     THEN substring(o_orderpriority, 1, 1)
                                     ELSE o_orderstatus END AS BIGINT))
                 AS BIGINT) AS n_cast_ok,
            CAST(sum(coalesce(try_cast(CASE WHEN o_orderkey % 3 = 0
                                       THEN substring(o_orderpriority, 1, 1)
                                       ELSE o_orderstatus END AS BIGINT),
                              0)) AS BIGINT) AS cast_sum
        FROM orders
        """,
    )


QUERIES["sql_try_arithmetic"] = sql_try_arithmetic

ORACLES["sql_try_arithmetic"] = """
    SELECT
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(CASE WHEN o_custkey % 7 <> 0
                        THEN 1 END) AS BIGINT) AS n_div_ok,
        CAST(sum(CASE WHEN o_custkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_div_null,
        CAST(count(CASE WHEN o_custkey % 5 <> 0 THEN 1 END) AS BIGINT)
            AS n_mod_ok,
        CAST(count(CASE WHEN o_orderkey % 3 = 0 THEN 1 END) AS BIGINT)
            AS n_cast_ok,
        CAST(sum(CASE WHEN o_orderkey % 3 = 0
                      THEN CAST(substring(o_orderpriority, 1, 1) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS cast_sum
    FROM orders
"""
