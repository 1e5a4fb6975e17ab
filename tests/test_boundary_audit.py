"""Routine rounding-boundary audit (VERDICT r6 item 3).

Runs the jitter audit from ``tests/boundary_audit.py`` over the
named-risk family — queries whose DOUBLE outputs pass through
``exp()``/``log()``/division before the portable snap, i.e. the ones a
different FMA/libm build can move by an ulp — plus the three rows that
actually went driver-red. A query is ROBUST iff its output is identical
under ``floor(x*scale + 0.5 +/- 2^-20)``, which is exactly "every
pre-round value sits >= 2^-20 from its rounding boundary".

The FULL registry sweep is the standalone script (run per-round, result
recorded in PROGRESS.jsonl); this pytest keeps the highest-risk subset
under continuous watch at sf0.001 cost.
"""

from __future__ import annotations

import pytest

from tests.boundary_audit import audit_query, uses_rounding

SF = "/root/testdata/sf0.001"

PRIORITY = [
    # exp()/log() family — VERDICT r6 item 3 names these explicitly:
    "quality_logreg",
    "quality_logreg_pr",
    "streaming_quality_score",
    "text_lm_score",
    "text_lm_bigram",
    "text_lm_interpolated",
    # the driver-red rows (now FP-free / int64-proofed; keep watched):
    "cogroup_user_activity",
    "pandas_udaf_mean",
    # round 9: cosine/BM25 doubles under micro-snaps (the fixture's
    # cosines are irrational-ish quotients — boundary landings are the
    # risk class, not the norm; keep them under the jitter watch):
    "sim_topk_maxsim",
    "dedup_semantic",
    "search_prf_expansion",
]


@pytest.mark.parametrize("name", PRIORITY)
def test_boundary_robust(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    fn = ALL_QUERIES[name]
    if not uses_rounding(spark, fn, SF):
        pytest.skip(f"{name} no longer calls pround/iunits")
    ok, n, diffs = audit_query(spark, fn, SF)
    assert ok, f"{name}: output moved under +/-2^-20 jitter: {diffs}"
    assert n > 0
