"""MERGE / CDC tier under the differential gate (previously unit-tested
only): row-level upsert and SCD2 results are compared whole — every
surviving row, not a summary — against anti-join+union SQL twins.

Change relations are derived deterministically from the fixtures
(modulo classes of the key), so both engines construct byte-identical
sources. Price/balance deltas are whole units added to cent-precise
doubles — exact in IEEE, no rounding discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.merge import scd2_apply, upsert
from ..sources.catalog import load_table

_INSERT_SHIFT = 100_000_000
_SCD2_FROM = "2020-01-01 00:00:00"
_SCD2_CHANGE = "2024-01-01 00:00:00"


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: every orderkey ≡ 0 (mod 10) gets a 100-unit
    price update; every orderkey ≡ 3 (mod 17) is re-keyed and inserted.
    Output is the full merged table."""
    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    inserts = o.filter(F.col("o_orderkey") % 17 == 3).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(_INSERT_SHIFT)
    )
    return upsert(o, updates.unionByName(inserts), "o_orderkey")


def merge_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply on a customer dimension: customers ≡ 0 (mod 7) get a
    +50 balance change effective 2024-01-01 — their current version is
    closed at that instant and the new version appended as current.
    Output is the full versioned dimension."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.withColumn(
        "valid_from", F.lit(_SCD2_FROM).cast("timestamp_ntz")
    ).withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
    changes = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(50.0))
        .withColumn("valid_from", F.lit(_SCD2_CHANGE).cast("timestamp_ntz"))
    )
    return scd2_apply(dim, changes, "c_custkey", "valid_from", "valid_to")


QUERIES = {
    "merge_upsert_orders": merge_upsert_orders,
    "merge_scd2_customers": merge_scd2_customers,
}

ORACLES = {
    "merge_upsert_orders": f"""
        WITH src AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice + 100.0 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey + {_INSERT_SHIFT}, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 17 = 3
        )
        SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL
        SELECT * FROM src
    """,
    "merge_scd2_customers": f"""
        WITH changes AS (
            SELECT c_custkey, c_name, c_nationkey,
                   c_acctbal + 50.0 AS c_acctbal, c_mktsegment,
                   TIMESTAMP '{_SCD2_CHANGE}' AS valid_from
            FROM customer WHERE c_custkey % 7 = 0
        )
        SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
               c.c_mktsegment,
               TIMESTAMP '{_SCD2_FROM}' AS valid_from,
               CASE WHEN ch.c_custkey IS NOT NULL
                    THEN TIMESTAMP '{_SCD2_CHANGE}' END AS valid_to
        FROM customer c LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        FROM changes
    """,
}


# ---------------------------------------------------------------------------
# Round 5: incremental aggregate-view maintenance. The monthly revenue
# state is built from the base slice, the CDC delta arrives later, and
# the refresh MERGES partial aggregates instead of recomputing — the
# mergeable-state pattern every 100 TB incremental pipeline relies on
# (partial sums/counts are associative, so refresh cost is O(delta) +
# O(state), never O(history)). The oracle computes the full aggregation
# from scratch: hash-equality proves merge == recompute.

INC_CUTOVER = "1997-01-01"


def incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.money import money
    from ..sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    month = F.trunc(F.to_date("l_shipdate"), "month").alias("ship_month")
    cents = (money("l_extendedprice") * 100).cast("long")

    def partials(df):
        return df.groupBy(month).agg(
            F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
        )

    cut = F.lit(INC_CUTOVER).cast("date")
    state = partials(li.filter(F.to_date("l_shipdate") < cut))
    delta = partials(li.filter(F.to_date("l_shipdate") >= cut))
    return (
        state.unionByName(delta)
        .groupBy("ship_month")
        .agg(F.sum("sum_cents").alias("sum_cents"), F.sum("n").alias("n"))
    )


QUERIES["incremental_revenue"] = incremental_revenue

ORACLES["incremental_revenue"] = """
    SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE)
               AS ship_month,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS sum_cents,
           count(*) AS n
    FROM lineitem
    GROUP BY 1
"""


# --- anti-entropy table diff -------------------------------------------------

_DEL_MOD = 13  # orderkey % 13 == 1 rows are deleted in version B


def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two table versions — the repair step that
    follows a `table_checksum` mismatch (checksum says WHICH partition
    diverged; this says WHICH ROWS): version B is the orders table with
    deterministic mutations applied (price update on keys ≡ 0 mod 10,
    re-keyed inserts on keys ≡ 3 mod 17, deletes on keys ≡ 1 mod 13),
    and the diff emits only (key, added|removed|changed).

    Scale shape: both sides reduce to (key, payload-md5) BEFORE the
    full-outer join, so the shuffle carries 16 bytes of payload per
    row instead of the row; the join is key-equi (AQE-coalesced), and
    unchanged rows — the overwhelming majority in an anti-entropy run —
    are dropped before any further stage. Doubles enter the hash as
    exact cents (iunits), never via engine float rendering."""
    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    v2 = (
        o.filter(F.col("o_orderkey") % _DEL_MOD != 1)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + F.lit(100.0)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 17 == 3).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(_INSERT_SHIFT)
            )
        )
    )

    def fingerprint(df: DataFrame, out: str) -> DataFrame:
        row_str = F.concat_ws(
            "|",
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            iunits(F.col("o_totalprice"), 2).cast("string"),
            F.col("o_orderdate").cast("string"),
            F.col("o_orderpriority"),
        )
        return df.select("o_orderkey", token_hash(row_str).alias(out))

    a = fingerprint(o, "rh_a")
    b = fingerprint(v2, "rh_b")
    status = (
        F.when(F.col("rh_a").isNull(), F.lit("added"))
        .when(F.col("rh_b").isNull(), F.lit("removed"))
        .when(F.col("rh_a") != F.col("rh_b"), F.lit("changed"))
    )
    return (
        a.join(b, "o_orderkey", "full_outer")
        .select("o_orderkey", status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


QUERIES["table_diff"] = table_diff

from ..functions.hashing import sql_token_hash as _sql_th  # noqa: E402
from ..functions.rounding import sql_iunits as _sql_iu  # noqa: E402

_DIFF_ROW = (
    "concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus, "
    f"CAST({_sql_iu('o_totalprice', 2)} AS VARCHAR), "
    "CAST(o_orderdate AS VARCHAR), o_orderpriority)"
)

ORACLES["table_diff"] = f"""
    WITH v2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % {_DEL_MOD} != 1
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT}, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 17 = 3
    ), a AS (
        SELECT o_orderkey, {_sql_th(_DIFF_ROW)} AS rh_a FROM orders
    ), b AS (
        SELECT o_orderkey, {_sql_th(_DIFF_ROW)} AS rh_b FROM v2
    )
    SELECT o_orderkey,
           CASE WHEN rh_a IS NULL THEN 'added'
                WHEN rh_b IS NULL THEN 'removed'
                WHEN rh_a != rh_b THEN 'changed' END AS status
    FROM a FULL JOIN b USING (o_orderkey)
    WHERE (CASE WHEN rh_a IS NULL THEN 'added'
                WHEN rh_b IS NULL THEN 'removed'
                WHEN rh_a != rh_b THEN 'changed' END) IS NOT NULL
"""


# --- CDC apply-changes (latest-wins) -----------------------------------------

_CDC_SHIFT = 200_000_000


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES INTO semantics: a CDC batch of (op, seq) rows —
    out-of-order updates, a delete that supersedes an earlier update,
    and inserts — collapses to the latest op per key (row_number over
    seq), then applies in one pass: final-D keys anti-join out, final
    U/I rows overwrite-or-append. Output is the full resulting table.

    The batch is derived deterministically from the fixture: keys ≡ 0
    (mod 5) get updates at seq 1 AND seq 2 (+10 then +20 — only the +20
    may survive), keys ≡ 3 (mod 7) get an update at seq 1 superseded by
    a DELETE at seq 2, and re-keyed inserts arrive at seq 1.

    Scale shape: the collapse is one shuffle on the CDC key (CDC
    batches are small relative to the base table); the apply is a
    key-equi outer join against the base — the same single-shuffle
    pattern as merge_upsert_orders, no driver-side state."""
    o = load_table(spark, sf_dir, "orders")
    cols = list(o.columns)

    upd1 = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
        .withColumn("_op", F.lit("U"))
        .withColumn("_seq", F.lit(1))
    )
    upd2 = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(20.0))
        .withColumn("_op", F.lit("U"))
        .withColumn("_seq", F.lit(2))
    )
    upd_del = (
        o.filter(F.col("o_orderkey") % 7 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(5.0))
        .withColumn("_op", F.lit("U"))
        .withColumn("_seq", F.lit(1))
    )
    dels = (
        o.filter(F.col("o_orderkey") % 7 == 3)
        .withColumn("_op", F.lit("D"))
        .withColumn("_seq", F.lit(3))  # strictly after every update,
        # including the seq-2 update a key ≡ 0 (mod 35) also receives
    )
    ins = (
        o.filter(F.col("o_orderkey") % 11 == 4)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(_CDC_SHIFT))
        .withColumn("_op", F.lit("I"))
        .withColumn("_seq", F.lit(1))
    )
    cdc = upd1.unionByName(upd2).unionByName(upd_del).unionByName(dels).unionByName(ins)
    w = W.partitionBy("o_orderkey").orderBy(F.desc("_seq"), F.desc("_op"))
    latest = (
        cdc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = latest.filter(F.col("_op") != "D").select(*cols)
    touched = latest.select("o_orderkey")
    untouched = o.join(touched, "o_orderkey", "left_anti")
    return untouched.unionByName(survivors)


QUERIES["cdc_apply_changes"] = cdc_apply_changes

ORACLES["cdc_apply_changes"] = f"""
    WITH cdc AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice, o_orderdate,
               o_orderpriority, 'U' AS _op, 1 AS _seq
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 20.0, o_orderdate, o_orderpriority, 'U', 2
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 5.0, o_orderdate, o_orderpriority, 'U', 1
        FROM orders WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority, 'D', 3
        FROM orders WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey + {_CDC_SHIFT}, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority, 'I', 1
        FROM orders WHERE o_orderkey % 11 = 4
    ), latest AS (
        SELECT * FROM (
            SELECT cdc.*, row_number() OVER (
                PARTITION BY o_orderkey ORDER BY _seq DESC, _op DESC) AS _rn
            FROM cdc
        ) WHERE _rn = 1
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM latest WHERE _op != 'D'
"""


_BT_FROM = "1990-01-01 00:00:00"
_BT_CHANGE = "1998-01-01 00:00:00"


def scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal enrichment — the query SCD2 exists FOR: join each
    order to the customer version that was valid ON ITS ORDER DATE
    (valid_from ≤ o_orderdate < valid_to, open-ended current version).
    The versioned dimension is built with the same scd2_apply machinery
    as ``merge_scd2_customers`` (customers ≡ 0 mod 7 get a +50 balance
    change effective 1998-01-01 — mid order-date range, so both
    versions are exercised on both sides of the cut). Output: one row
    per (changed-customer?, post-change-date?) quadrant with exact
    balance-cents sums — each quadrant proves a distinct version pick.

    100 TB: the fact side joins the dimension on the EQUALITY key with
    the validity range as a residual predicate — a plain hash join
    (dimension broadcast when dim-sized), not a range join; versions
    per key are few by construction."""
    from ..functions.rounding import iunits

    c = load_table(spark, sf_dir, "customer")
    dim = c.withColumn(
        "valid_from", F.lit(_BT_FROM).cast("timestamp_ntz")
    ).withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
    changes = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(50.0))
        .withColumn("valid_from", F.lit(_BT_CHANGE).cast("timestamp_ntz"))
    )
    versioned = scd2_apply(dim, changes, "c_custkey", "valid_from", "valid_to")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp_ntz").alias("od")
    )
    enriched = o.join(
        F.broadcast(versioned),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("od"))
        & (F.col("valid_to").isNull() | (F.col("od") < F.col("valid_to"))),
    )
    return enriched.groupBy(
        (F.col("c_custkey") % 7 == 0).alias("changed_cust"),
        (F.col("od") >= F.lit(_BT_CHANGE).cast("timestamp_ntz")).alias("post_change"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(iunits(F.col("c_acctbal"), 2)).alias("balance_cents"),
    )


QUERIES["scd2_asof_enrich"] = scd2_asof_enrich

from ..functions.rounding import sql_iunits as _sql_iu  # noqa: E402

ORACLES["scd2_asof_enrich"] = f"""
    WITH dim AS (
        SELECT c_custkey, c_acctbal,
               TIMESTAMP '{_BT_FROM}' AS valid_from,
               CASE WHEN c_custkey % 7 = 0
                    THEN TIMESTAMP '{_BT_CHANGE}' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal + 50.0,
               TIMESTAMP '{_BT_CHANGE}', NULL
        FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT changed_cust, post_change,
           count(*) AS n_orders,
           CAST(sum(bal_cents) AS BIGINT) AS balance_cents
    FROM (
        SELECT d.c_custkey % 7 = 0 AS changed_cust,
               CAST(o.o_orderdate AS TIMESTAMP) >= TIMESTAMP '{_BT_CHANGE}'
                   AS post_change,
               {_sql_iu('d.c_acctbal', 2)} AS bal_cents
        FROM orders o JOIN dim d
          ON o.o_custkey = d.c_custkey
         AND d.valid_from <= CAST(o.o_orderdate AS TIMESTAMP)
         AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to)
    ) GROUP BY 1, 2
"""


def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (the join sibling of
    ``incremental_revenue``'s aggregate IVM): the materialized view is
    orders ⋈ customer (enriched facts). A delta batch arrives on the
    FACT side (orders ≡ 0 mod 9, price +25 — updates; orders re-keyed
    +2·10⁸ — inserts). Instead of recomputing the join, the maintained
    view is  V' = (V ∖ {updated keys}) ∪ (Δorders ⋈ customer)  — only
    the delta ever joins. The gate compares the MAINTAINED view's
    summary against the oracle's FULL RECOMPUTE of the post-change
    join: maintenance == recompute, hash-proven.

    100 TB: the anti-join removes touched keys (broadcast when the
    delta is batch-sized), and the delta join touches |Δ| rows — the
    whole point of IVM; the dimension side is broadcast either way."""
    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    view = o.join(c, o.o_custkey == c.c_custkey)  # the standing view

    updates = o.filter(F.col("o_orderkey") % 9 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(25.0)
    )
    inserts = o.filter(F.col("o_orderkey") % 13 == 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(200_000_000)
    )
    delta = updates.unionByName(inserts)

    touched = delta.select("o_orderkey").distinct()
    maintained = view.join(touched, "o_orderkey", "anti").unionByName(
        delta.join(c, delta.o_custkey == c.c_custkey)
    )
    return maintained.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(iunits(F.col("o_totalprice"), 2)).alias("price_cents"),
        F.sum(F.col("o_orderkey") % 1_000_003).alias("key_checksum"),
    )


QUERIES["ivm_join_delta"] = ivm_join_delta

ORACLES["ivm_join_delta"] = f"""
    WITH merged AS (
        -- full recompute of the post-change fact table
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 25.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        UNION ALL
        SELECT o_orderkey + 200000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 13 = 5
    )
    SELECT c.c_mktsegment,
           count(*) AS n_rows,
           CAST(sum({_sql_iu('m.o_totalprice', 2)}) AS BIGINT) AS price_cents,
           CAST(sum(m.o_orderkey % 1000003) AS BIGINT) AS key_checksum
    FROM merged m JOIN customer c ON m.o_custkey = c.c_custkey
    GROUP BY 1
"""
