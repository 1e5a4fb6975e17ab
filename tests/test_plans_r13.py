"""Round-13 plan contracts: no-runtime-trig for the new spectral pair,
day-partitioned sweep window for peak concurrency, artifact-builder
registry integrity, and the secondary-sort NULL-ordering contract
(ADVICE r12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_spectral_entropy_plan_has_no_runtime_trig(spark):
    plan = _final_plan(_q("timeseries_spectral_entropy")(spark, SF_SMOKE))
    up = plan.upper().replace("ELEMENT_AT", "")
    assert "COS(" not in up and "SIN(" not in up


def test_cum_periodogram_plan_has_no_runtime_trig(spark):
    plan = _final_plan(_q("timeseries_cum_periodogram")(spark, SF_SMOKE))
    up = plan.upper().replace("ELEMENT_AT", "")
    assert "COS(" not in up and "SIN(" not in up


def test_peak_concurrency_sweep_window_is_partitioned(spark, monkeypatch):
    """The session-grain running sum must be the day-partitioned
    two-pass form: at least one Window partitions by day. The r13
    localCheckpoint hides the sweep subtree behind a Scan ExistingRDD
    in the final plan, so bypass checkpointing (identity) and read the
    optimized LOGICAL plan of the real query code path instead."""
    import re

    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides localCheckpoint — patch the concrete class.
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    df = _q("events_peak_concurrency")(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert specs, plan
    assert any(s.strip() for s in specs), (
        "no partitioned Window at all — the sweep lost its day "
        "partitioning\n" + plan
    )


def test_artifact_builders_registry_integrity(spark):
    """Every rider named in ARTIFACT_BUILDERS must exist in the
    registry (a renamed query would silently stop being pre-built in
    bench), and the cograph builder must be idempotent per session
    (second call returns the identical cached object)."""
    from multithreaded_map_reduce_spark.queries import (
        ALL_QUERIES,
        ARTIFACT_BUILDERS,
    )

    for art, (build, riders) in ARTIFACT_BUILDERS.items():
        assert callable(build)
        missing = [r for r in riders if r not in ALL_QUERIES]
        assert not missing, f"{art}: riders not in registry: {missing}"
    from multithreaded_map_reduce_spark.queries.graphrank import (
        _supplier_cograph,
    )

    ARTIFACT_BUILDERS["supplier_cograph"][0](spark, SF_SMOKE)
    a = _supplier_cograph(spark, SF_SMOKE)
    ARTIFACT_BUILDERS["supplier_cograph"][0](spark, SF_SMOKE)
    assert _supplier_cograph(spark, SF_SMOKE) is a


def test_secondary_sort_null_and_order_contract(spark):
    """ADVICE r12: NULL sort values must not kill the job (they order
    FIRST via the sentinel pair), and the value column must never act
    as a tiebreak — two rows with equal (key, sort) keep a stable
    sorted-by-nothing-else order decided by the composite only."""
    from multithreaded_map_reduce_spark.operators.mapreduce import (
        run_secondary_sort,
    )

    df = spark.createDataFrame(
        [
            ("a", None, "v_null"),
            ("a", 2, "v2"),
            ("a", 1, "v1"),
            ("b", 3, "w3"),
            (None, 1, "n1"),
        ],
        "k string, s int, v string",
    ).repartition(3)
    out = {
        r.key: r.ordered_values
        for r in run_secondary_sort(df, "k", ["s"], "v", 2).collect()
    }
    # NULL sort value first within its key; NULL key becomes its own group
    assert out["a"] == "v_null,v1,v2"
    assert out["b"] == "w3"
    assert out["None"] == "n1"


# ------------------------------------------------- r13 OPT contracts


def test_setop_all_variants_plan_has_no_replicate_rows(spark):
    """r13 OPT: the bag multiplicities come from ONE count aggregate —
    the ReplicateRows generation Spark plans for exceptAll/intersectAll
    (materialize max(m−n,0) copies, then re-count) must be gone, and
    only one lineitem scan may remain."""
    plan = _final_plan(_q("setop_all_variants")(spark, SF_SMOKE))
    # Spark 4.1.2 prints the expression lowercase (replicaterows) and
    # appends "== Initial Plan ==" to executedPlan().toString(); check
    # case-insensitively and count scans in the Final Plan only.
    assert "replicaterows" not in plan.lower()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("lineitem") <= 1, final


def test_exceptall_intersectall_physical_operators_still_covered(spark):
    """The dedicated ExceptAll/IntersectAll physical operators stay
    exercised (the §2c bag-semantics coverage row) even though the
    registered query now computes the identical relation by count
    arithmetic: pin the operators and the bag identities on a fixture
    relation."""
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "m long")
    b = spark.createDataFrame([(1,), (3,)], "m long")
    ex = a.exceptAll(b)
    ix = a.intersectAll(b)
    assert sorted(r.m for r in ex.collect()) == [1, 1, 2]
    assert sorted(r.m for r in ix.collect()) == [1]
    # physical operators present (Spark plans these via union+aggregate
    # + Generate(replicaterows) — assert the generation node survives;
    # 4.1.2 prints the expression lowercase, so match case-insensitively)
    ex_plan = ex._jdf.queryExecution().executedPlan().toString().lower()
    ix_plan = ix._jdf.queryExecution().executedPlan().toString().lower()
    assert "replicaterows" in ex_plan
    assert "replicaterows" in ix_plan


def test_r13_shared_artifacts_are_session_shared(spark):
    """The four r13-OPT artifacts (scored logreg corpus, kNN graph,
    dup components, trade edges, co-purchase edges) must be built ONCE
    per (session, dir): two calls return the identical DataFrame
    object (the _supplier_cograph contract)."""
    from multithreaded_map_reduce_spark.queries.dedup import _dup_components
    from multithreaded_map_reduce_spark.queries.graphrank import _trade_edges
    from multithreaded_map_reduce_spark.queries.mining import (
        _copurchase_pairs_shared,
    )
    from multithreaded_map_reduce_spark.queries.similarity import _knn_graph
    from multithreaded_map_reduce_spark.queries.textstats import _lr_scored

    for fn in (_lr_scored, _knn_graph, _dup_components, _trade_edges,
               _copurchase_pairs_shared):
        assert fn(spark, SF_SMOKE) is fn(spark, SF_SMOKE), fn.__name__


def test_covariance_audit_pair_stage_has_no_join(spark):
    """r13 OPT: the d(d−1)/2 products unfold from each row's array
    (one Generate) — the old explode→self-join-on-vec_id shape (n·64
    rows shuffled twice) must not come back."""
    from multithreaded_map_reduce_spark.plans import plan_report

    df = _q("embedding_covariance_audit")(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "ReplicateRows" not in plan
    rep = plan_report(df)
    assert not rep.cartesian
    # the embeddings scan feeds the per-dim moments and the pair
    # unfold directly; the only joins left are the broadcast attaches
    # of the tiny per-dim stats — never a data-grain shuffle join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
