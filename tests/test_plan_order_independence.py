"""Run-order plan-determinism contract (VERDICT r9 item 2).

The repo's regression triage reads ``bench.py``'s optimized-plan hash:
a time move with an UNCHANGED hash is JIT/scheduler noise, with a
changed hash a real plan change. That method is only sound if a
query's physical plan is a function of code + data — independent of
which queries ran before it in the session. Round 9 proved it wasn't:
leaked ``persist()`` caches let Spark's CacheManager substitute a live
cache into later queries' plans, and the driver's bench executed a
different ``dedup_containment`` plan than the builder's bench on
identical code (1.32× slower), purely because their run orders left
different caches alive.

This test reproduces the two run orders in one session:

1. hash every sampled query's optimized plan on a fresh registry
   ("builder order": plan-only, nothing materialized);
2. MATERIALIZE the full dedup family plus the other formerly-leaking
   queries ("driver order": the correctness gate runs everything
   before the bench);
3. re-hash the sample and require every hash unchanged.

Before the r10 fix (shared shingle artifact + localCheckpoint instead
of persist) step 3 fails exactly the way the driver saw; with the fix
nothing the materialization leaves behind can be substituted into a
later plan, because no query leaves a CacheManager entry alive.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# hash these before/after — the round-9 divergence case plus every
# query family that shares lineage with the formerly-leaked caches,
# plus a spread of untouched controls
_SAMPLE = [
    "dedup_containment",  # the driver-caught r9 divergence
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_minhash_accuracy",
    "dedup_lsh_recall",
    "dedup_banding_sweep",
    "dedup_semantic",
    "dedup_clusters",
    "dedup_incremental",
    "curation_coverage_greedy",
    "events_cohort_ltv",
    # controls: no shared lineage with the dedup rail
    "q1_pricing_summary",
    "word_count",
    "sim_topk_bruteforce",
    "text_quality",
]

# run these to completion between the two hash passes (the set whose
# r9 versions left caches alive)
_MATERIALIZE = [
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_minhash_accuracy",
    "dedup_lsh_recall",
    "dedup_banding_sweep",
    "dedup_semantic",
    "dedup_incremental",
    "events_cohort_ltv",
    "curation_coverage_greedy",
]


def test_plan_hashes_survive_run_order(spark):
    import __spark_entry__ as entry
    from bench import _plan_hash

    qs = entry.queries()
    missing = [n for n in _SAMPLE + _MATERIALIZE if n not in qs]
    assert not missing, f"sample names drifted from the registry: {missing}"

    before = {n: _plan_hash(qs[n](spark, SF_SMOKE)) for n in _SAMPLE}
    assert all(before.values()), "plan hashing failed for some query"

    for n in _MATERIALIZE:
        qs[n](spark, SF_SMOKE).count()

    after = {n: _plan_hash(qs[n](spark, SF_SMOKE)) for n in _SAMPLE}
    diverged = {
        n: (before[n], after[n]) for n in _SAMPLE if before[n] != after[n]
    }
    assert not diverged, (
        "optimized plans changed with run order (CacheManager "
        f"substitution is back): {diverged}"
    )


def test_materialized_queries_leave_no_cache(spark):
    """Runtime twin of tests/test_persist_discipline.py (VERDICT r9
    item 6, sampled): after materializing the formerly-leaking family,
    the CacheManager must hold nothing — localCheckpoint relations
    never register, and every persist in the package releases in a
    finally. (The full-registry sweep lives in tests/run_ledger.py.)"""
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    qs = entry.queries()
    for n in _MATERIALIZE:
        qs[n](spark, SF_SMOKE).count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    if not cm.isEmpty():
        pytest.fail(
            "CacheManager is not empty after the gate sample — some "
            "query persisted without releasing"
        )
