"""Round-8 hardening tests: MMR greedy edge cases (ADVICE r7), the
DECIMAL(38,0)/HUGEINT second-moment rails, and the attribution
non-negative-value domain filter."""

from __future__ import annotations

import pandas as pd

from tests.oracle import compare

SF_SMOKE = "/root/testdata/sf0.001"


def test_mmr_greedy_small_pool():
    """A query pool with fewer than MMR_K candidates must emit what
    exists — the pre-fix code del'd a None key and raised KeyError,
    failing the whole job (ADVICE r7)."""
    from multithreaded_map_reduce_spark.queries.similarity import (
        MMR_K,
        _mmr_greedy,
    )

    assert MMR_K >= 2
    cands = pd.DataFrame(
        {"neighbor_id": [7], "rel_micros": [900000]}
    )
    prs = pd.DataFrame({"id_a": [], "id_b": [], "sim_micros": []})
    out = _mmr_greedy((42,), cands, prs)
    assert list(out["neighbor_id"]) == [7]
    assert list(out["mmr_rank"]) == [1]
    assert list(out["query_id"]) == [42]


def test_mmr_greedy_null_micros():
    """NULL rel_micros (zero-norm embedding -> NULL cosine) drops the
    candidate; NULL sim_micros is treated as similarity 0 — neither
    may raise (the pre-fix int(None) was a TypeError)."""
    from multithreaded_map_reduce_spark.queries.similarity import _mmr_greedy

    cands = pd.DataFrame(
        {
            "neighbor_id": [1, 2, 3, 4],
            "rel_micros": [900000.0, None, 800000.0, 700000.0],
        }
    )
    prs = pd.DataFrame(
        {
            "id_a": [1, 1],
            "id_b": [3, 4],
            "sim_micros": [None, 500000.0],
        }
    )
    out = _mmr_greedy((1,), cands, prs)
    ids = list(out["neighbor_id"])
    assert 2 not in ids  # null relevance dropped
    assert ids[0] == 1  # relevance argmax first
    # null pair-sim(1,3) == 0 => 3 carries NO diversity penalty and
    # outranks 4 despite lower relevance minus 4's real penalty
    assert ids[1] == 3


def test_mmr_greedy_empty_pool():
    from multithreaded_map_reduce_spark.queries.similarity import _mmr_greedy

    cands = pd.DataFrame({"neighbor_id": [], "rel_micros": []})
    prs = pd.DataFrame({"id_a": [], "id_b": [], "sim_micros": []})
    out = _mmr_greedy((9,), cands, prs)
    assert len(out) == 0


def test_interarrival_decimal_rail_wide_domain(spark):
    """The DECIMAL(38,0) CV² rail must survive a span that overflows
    the old BIGINT rail: span ~ 20 years of second-gaps with CV² ~ 1
    makes 2000·(n·Σg² − span²) pass 2^63 (ADVICE r7 medium). Crafted
    frame, exact expected value computed in Python big-int."""
    from multithreaded_map_reduce_spark.queries.events import (
        REG_MIN_N,
        events_interarrival_regularity,
    )

    # alternating short/huge gaps => bursty (CV² >> 0), span ~ 19 years
    import datetime as dt

    gaps = [1 if i % 2 else 30_000_000 for i in range(REG_MIN_N)]
    t = 0
    ts = [t := t + g for g in gaps]
    ts = [0] + ts
    base = dt.datetime(1990, 1, 1)
    rows = [
        (100, i, base + dt.timedelta(seconds=s), "click", 1.0)
        for i, s in enumerate(ts)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = events_interarrival_regularity(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    n = len(gaps)
    span = sum(gaps)
    sgg = sum(g * g for g in gaps)
    num = n * sgg - span * span
    den = span * span
    expected = (2 * 1000 * num + den) // (2 * den)  # Python int = exact
    assert 2 * 1000 * num > 2**63, "fixture must actually stress the rail"
    assert r["cv2_millis"] == expected
    assert r["is_regular"] == 0


def test_attribution_negative_value_filtered(spark):
    """Purchases with value < 0 are excluded by the documented domain
    contract (ADVICE r7) — credits keep summing to the purchase total."""
    import datetime as dt

    from multithreaded_map_reduce_spark.queries.events import (
        events_attribution,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, "click", 0.0),
        (1, 2, base + dt.timedelta(hours=1), "purchase", 10.0),
        (1, 3, base + dt.timedelta(hours=2), "purchase", -5.0),  # refund
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = events_attribution(spark, d).collect()
    assert len(out) == 1
    assert out[0]["linear_micros"] == 10_000_000  # refund not credited
    assert out[0]["n_conversions"] == 1


def test_round8_fixed_oracles_gate(spark):
    """The five formerly-HUGEINT oracles, locally gated end-to-end."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in (
        "cogroup_user_activity",
        "interval_shipping",
        "curation_token_budget",
    ):
        compare(spark, qs[name], os_[name], SF_SMOKE)
