"""Scale-feature proofs: partition pruning, bucketed co-located joins,
task-retry fault tolerance — the Spark-native replacements for the
reference's physical mechanisms (SURVEY.md §4)."""

from __future__ import annotations

import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partition_pruning(spark, tmp_path):
    """Writing partitioned by year and filtering on it must prune at
    planning time (PartitionFilters), not scan-and-discard."""
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    out = str(tmp_path / "orders_by_year")
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("order_year").parquet(out)

    df = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    want = o.filter(F.col("order_year") == 1996).count()
    assert df.count() == want


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-partitions data so the
    join plan needs no shuffle Exchange — the 100 TB co-location story."""
    from multithreaded_map_reduce_spark.plans.audit import explain_formatted
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load_table(spark, SF_SMOKE, "orders").write.mode("overwrite").bucketBy(
            4, "o_orderkey"
        ).sortBy("o_orderkey").saveAsTable("orders_b")
        load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ).write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable("lineitem_b")

        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = explain_formatted(joined)
        shuffle_exchanges = sum(
            1
            for line in plan.splitlines()
            if "Exchange" in line and "Broadcast" not in line and line.strip().startswith("(")
        )
        assert shuffle_exchanges == 0, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == spark.table("lineitem_b").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


FAULT_SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2, 4]")  # 4 task retries
             .appName("fault").config("spark.ui.enabled", "false").getOrCreate())
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    def flaky(it):
        from pyspark import TaskContext
        ctx = TaskContext.get()
        # first attempt of partition 0 dies — the reference's killed-worker
        # experiment (README.md:173-186), replayed via task retry
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("simulated worker failure")
        return it

    total = sc.parallelize(range(1000), 4).mapPartitions(flaky).sum()
    assert total == 499500, total
    print("RECOVERED", total)
    spark.stop()
    """
)


def test_task_retry_fault_tolerance(tmp_path):
    """Spark's task retry replaces the reference's heartbeat+refork loop
    (MapReduceMaster.h:226-310): a task that dies on first attempt is
    re-executed and the job still returns the exact result."""
    script = tmp_path / "fault.py"
    script.write_text(FAULT_SCRIPT)
    res = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=300
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "RECOVERED 499500" in res.stdout
