"""Upsert / SCD2 merge emulation + reverse-graph query + foreachBatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_reverse_graph_oracle(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    assert compare(
        spark, ALL_QUERIES["reverse_graph"], ALL_ORACLES["reverse_graph"], SF_SMOKE
    ) > 0


def test_upsert(spark):
    from multithreaded_map_reduce_spark.operators.merge import upsert
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    c = load_table(spark, SF_SMOKE, "customer")
    updates = (
        c.filter(F.col("c_custkey") < 5)
        .withColumn("c_acctbal", F.lit(9999.0))
        .unionByName(
            spark.createDataFrame(
                [(100001, "new customer", 1, 1.0, "BUILDING")], c.schema
            )
        )
    )
    merged = upsert(c, updates, "c_custkey")
    assert merged.count() == c.count() + 1
    got = {r["c_custkey"]: r["c_acctbal"] for r in merged.filter("c_custkey < 5").collect()}
    assert all(v == 9999.0 for v in got.values())
    assert merged.filter("c_custkey = 100001").count() == 1
    # untouched keys keep their original values
    orig = c.filter("c_custkey = 10").first()["c_acctbal"]
    assert merged.filter("c_custkey = 10").first()["c_acctbal"] == orig


def test_scd2(spark):
    from multithreaded_map_reduce_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "seg-A", "2024-01-01", None),
            (1, "seg-old", "2023-01-01", "2024-01-01"),
            (2, "seg-B", "2024-01-01", None),
        ],
        "k long, attr string, valid_from string, valid_to string",
    )
    changes = spark.createDataFrame(
        [(1, "seg-A2", "2024-06-01"), (3, "seg-C", "2024-06-01")],
        "k long, attr string, valid_from string",
    )
    out = scd2_apply(dim, changes, "k").collect()
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert rows[(1, "seg-A")] == ("2024-01-01", "2024-06-01")  # closed
    assert rows[(1, "seg-old")] == ("2023-01-01", "2024-01-01")  # untouched history
    assert rows[(1, "seg-A2")] == ("2024-06-01", None)  # new current
    assert rows[(2, "seg-B")] == ("2024-01-01", None)  # unchanged current
    assert rows[(3, "seg-C")] == ("2024-06-01", None)  # brand new key
    assert len(out) == 5


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: the exactly-once-style custom sink pattern — each
    micro-batch lands via an idempotent parquet write keyed by batch id."""
    from multithreaded_map_reduce_spark.streaming.events import stream_events

    out = str(tmp_path / "fb_out")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = (
        stream_events(spark, SF_SMOKE)
        .select("event_id", "user_id", "ts")
        .writeStream.foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert seen, "no batches delivered"
    total = spark.read.parquet(out).count()
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    assert total == load_table(spark, SF_SMOKE, "events").count()


def test_upsert_duplicate_update_keys(spark):
    """Regression: duplicate-key update rows must collapse to one winner,
    not fan the target row out into duplicates (ADVICE r1)."""
    from multithreaded_map_reduce_spark.operators.merge import upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame(
        [(1, "x"), (1, "z"), (3, "c")], "k long, v string"
    )
    out = upsert(target, updates, "k").collect()
    assert len(out) == 3
    rows = {r["k"]: r["v"] for r in out}
    assert rows == {1: "z", 2: "b", 3: "c"}  # deterministic winner: max tiebreak


def test_scd2_duplicate_change_keys(spark):
    """Two change rows for one key: only the latest valid_from applies."""
    from multithreaded_map_reduce_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "seg-A", "2024-01-01", None)],
        "k long, attr string, valid_from string, valid_to string",
    )
    changes = spark.createDataFrame(
        [(1, "seg-A2", "2024-03-01"), (1, "seg-A3", "2024-06-01")],
        "k long, attr string, valid_from string",
    )
    out = scd2_apply(dim, changes, "k").collect()
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert len(out) == 2  # one closed + one new current, no fan-out
    assert rows[(1, "seg-A")] == ("2024-01-01", "2024-06-01")
    assert rows[(1, "seg-A3")] == ("2024-06-01", None)
