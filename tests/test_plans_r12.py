"""Round-12 plan contracts — pin the SHAPES the new operators were
designed around, not just their answers (the per-round discipline:
a green result with a regressed plan is a latent scale bug).

Plan-property checks need the FINAL adaptive plan: collect() first,
then executedPlan (see .claude/skills/verify — isFinalPlan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_cograph_cache_is_session_shared(spark):
    """The triangle family's projection must be built ONCE per
    (session, dir): two calls return the identical DataFrame object
    (the lazy localCheckpoint artifact), so five queries share one
    pair build."""
    from multithreaded_map_reduce_spark.queries.graphrank import (
        _supplier_cograph,
    )

    a = _supplier_cograph(spark, SF_SMOKE)
    b = _supplier_cograph(spark, SF_SMOKE)
    assert a is b
    # and a different dir gets a different artifact
    c = _supplier_cograph(spark, SF_CORRECT)
    assert c is not a


def test_centroid_classify_broadcasts_centroids(spark):
    """The n×L score relation must come from a BROADCAST of the
    L-row centroid relation — a shuffled or cartesian plan against
    the full vector relation is the 100 TB failure shape."""
    plan = _final_plan(_q("embedding_centroid_classify")(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_secondary_sort_single_shuffle(spark):
    """run_secondary_sort promises ONE shuffle (partition-by-key with
    the composite sort riding it) — count ShuffledRDDs in the lineage
    of the pre-createDataFrame RDD path via the physical plan's
    exchange count on the output."""
    from multithreaded_map_reduce_spark.operators.mapreduce import (
        run_secondary_sort,
    )

    df = spark.createDataFrame(
        [("a", 2, "v2"), ("a", 1, "v1"), ("b", 1, "w1")],
        "k string, s long, v string",
    ).repartition(3)
    out = run_secondary_sort(df, "k", ["s"], "v", num_partitions=2)
    debug = out.rdd.toDebugString().decode()
    assert debug.count("ShuffledRDD") == 1, debug


def test_periodogram_plan_has_no_runtime_trig(spark):
    """The DFT bases enter as integer literal tables — COS/SIN must
    not appear in the physical plan (the whole point of the
    phase-table discipline)."""
    plan = _final_plan(_q("timeseries_periodogram")(spark, SF_SMOKE))
    assert "COS(" not in plan.upper().replace("ELEMENT_AT", "")
    assert "SIN(" not in plan.upper().replace("ELEMENT_AT", "")


def test_circadian_plan_has_no_runtime_trig(spark):
    plan = _final_plan(_q("events_circadian_profile")(spark, SF_SMOKE))
    assert "COS(" not in plan.upper()
    assert "SIN(" not in plan.upper()


def test_gap_islands_window_is_partitioned(spark):
    """The islands window partitions by customer — an unpartitioned
    global-sort Window here would funnel every order through one
    task at scale."""
    plan = _final_plan(_q("window_gap_islands")(spark, SF_SMOKE))
    assert "Window" in plan
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        # second bracket group is the partition spec — must be
        # non-empty for every Window operator in this plan
        assert m.group(1).strip(), plan


def test_char_entropy_plan_has_no_per_index_substring(spark):
    """The quadratic sequence+substring shape was measured at 9 s
    warm and rewritten — pin that the plan builds char arrays via
    split, not per-index SUBSTRING over a sequence."""
    # the chars relation localCheckpoints, which truncates lineage —
    # neither the physical nor the optimized plan of the final frame
    # retains the generator expression, so pin the SOURCE (the same
    # mechanism the window-shape lint uses)
    import inspect

    from multithreaded_map_reduce_spark.queries import textstats

    src = inspect.getsource(textstats.text_char_entropy_rate)
    assert "split(text, '')" in src
    assert "sequence(1, length(text))" not in src
    assert "substring(text, i" not in src
