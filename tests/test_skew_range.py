"""Skew-salting equivalence + bucketed range join vs oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_salted_agg_equals_plain(spark):
    from multithreaded_map_reduce_spark.operators.skew import salted_sum_count
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = salted_sum_count(li, "l_returnflag", "l_quantity", n_salts=8)
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_value"), F.count("*").alias("cnt")
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b  # quantities are integral doubles: sums exact in any order


def test_salted_join_equals_plain(spark):
    from multithreaded_map_reduce_spark.operators.skew import salted_join
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    salted = salted_join(o, c, "o_custkey", n_salts=4)
    plain = o.join(c, "o_custkey")
    a = sorted(map(tuple, salted.select("o_orderkey", "c_mktsegment").collect()))
    b = sorted(map(tuple, plain.select("o_orderkey", "c_mktsegment").collect()))
    assert a == b


def test_range_join_oracle(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    n = compare(
        spark,
        ALL_QUERIES["range_join_recent_clicks"],
        ALL_ORACLES["range_join_recent_clicks"],
        SF_SMOKE,
    )
    assert n > 0


def test_range_join_preserves_left(spark):
    """Every purchase appears exactly once, zero-count included."""
    from multithreaded_map_reduce_spark.queries.events import range_join_recent_clicks
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    out = range_join_recent_clicks(spark, SF_SMOKE)
    n_purchases = (
        load_table(spark, SF_SMOKE, "events").filter(F.col("event_type") == "purchase").count()
    )
    rows = out.collect()
    assert len(rows) == n_purchases
    assert any(r["n_in_window"] == 0 for r in rows) or all(r["n_in_window"] >= 0 for r in rows)


def test_range_join_epoch_boundary(spark):
    """Regression: timestamps inside [0, window) used to land in the same
    truncated bucket twice, double-counting every match (ADVICE r1)."""
    from multithreaded_map_reduce_spark.operators.rangejoin import count_in_window

    left = spark.createDataFrame(
        [(1, 100, "1970-01-01 00:30:00"), (2, 100, "1970-01-01 01:30:00")],
        "id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(100, "1970-01-01 00:10:00"), (100, "1970-01-01 00:50:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = count_in_window(
        left, right, by="user_id", left_time="ts", right_time="ts",
        window_micros=3600 * 1_000_000,
    )
    got = {r["id"]: r["n_in_window"] for r in out.collect()}
    # id=1 at 00:30 sees only the 00:10 click; id=2 at 01:30 sees only 00:50
    assert got == {1: 1, 2: 1}


def test_salted_collect_set_equals_plain(spark):
    from multithreaded_map_reduce_spark.operators.skew import salted_collect_set
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = {
        r[0]: sorted(r[1])
        for r in salted_collect_set(li, "l_returnflag", "l_partkey", n_salts=8).collect()
    }
    plain = {
        r[0]: sorted(r[1])
        for r in li.groupBy("l_returnflag")
        .agg(F.collect_set("l_partkey").alias("ids"))
        .collect()
    }
    assert salted == plain
