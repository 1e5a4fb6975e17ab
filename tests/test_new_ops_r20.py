"""Round-13 semantics tests, batch 2: audio zero crossings, ordinal
association (Goodman-Kruskal gamma), Bartlett variance homogeneity,
KPSS level stationarity, weighted quantiles, Fleiss' multi-rater
kappa — each replayed against a plain third reference (the Fleiss
replay re-derives kappa from P-bar/P-bar-e with exact Fractions, the
check the differential gate structurally cannot make)."""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _half_up(num: int, den: int, mult: int = 1_000_000) -> int:
    return (2 * mult * num + den) // (2 * den)


def _half_up_signed(num: int, den: int, mult: int = 1_000_000, off: int = 1000) -> int:
    # ratio_units_dec_signed: offset-shifted half-up toward +inf
    return _half_up(num + off * den, den, mult) - off * mult


# ------------------------------------------------ multimodal_audio_zcr


def test_audio_zcr_python_replay(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
        if len(r.text) > 0
    }
    rows = {r.media_id: r for r in _q("multimodal_audio_zcr")(spark, SF_SMOKE).collect()}
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        tb = text.encode("utf-8")
        need = doc_id % 500 + 100
        samples = (tb * (need // len(tb) + 1))[:need]
        hi = [1 if b >= 128 else 0 for b in samples]
        zc = sum(1 for i in range(len(hi) - 1) if hi[i] != hi[i + 1])
        got = rows[doc_id]
        assert got.n_samples == need
        assert got.n_above == sum(hi)
        assert got.n_zc == zc
        assert got.zcr_micros == _half_up(zc, need - 1)
        assert got.above_share_micros == _half_up(sum(hi), need)


# ---------------------------------------------------- quality_gk_gamma


def test_gk_gamma_python_replay(spark):
    from collections import Counter

    from multithreaded_map_reduce_spark.sources.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    cells = Counter(
        (
            int(r.o_orderpriority[0]),
            math.floor(float(r.o_totalprice) * 100 + 0.5) // 5_000_000,
        )
        for r in o
    )
    c = d = 0
    for (p1, b1), n1 in cells.items():
        for (p2, b2), n2 in cells.items():
            if p2 > p1 and b2 > b1:
                c += n1 * n2
            elif p2 > p1 and b2 < b1:
                d += n1 * n2
    row = _q("quality_gk_gamma")(spark, SF_SMOKE).collect()[0]
    assert (row.concordant, row.discordant) == (c, d)
    if c + d:
        assert row.gamma_micros == _half_up_signed(c - d, c + d)
        assert -1_000_000 <= row.gamma_micros <= 1_000_000


# ----------------------------------------------------- quality_bartlett


def test_bartlett_python_replay(spark):
    from collections import defaultdict

    from multithreaded_map_reduce_spark.sources.catalog import load_table

    by_src = defaultdict(list)
    for r in (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", "n_chars")
        .collect()
    ):
        by_src[r.source].append(int(r.n_chars))
    k = len(by_src)
    nn = sum(len(v) for v in by_src.values())
    wlnv = 0
    hsum = 0
    ssw_milli = 0
    for v in by_src.values():
        n, s, q = len(v), sum(v), sum(x * x for x in v)
        var = (n * q - s * s) / (n * (n - 1))
        wlnv += (n - 1) * math.floor(math.log(var) * 1e9 + 0.5)
        hsum += _half_up(1, n - 1, 1_000_000_000)
        ssw_milli += _half_up(n * q - s * s, n, 1000)
    sp2 = (ssw_milli / 1000.0) / (nn - k)
    chi = ((nn - k) * math.log(sp2) - wlnv / 1e9) / (
        1.0 + ((hsum / 1e9) - 1.0 / (nn - k)) / (3.0 * (k - 1))
    )
    row = _q("quality_bartlett")(spark, SF_SMOKE).collect()[0]
    assert (row.k_groups, row.n_docs) == (k, nn)
    assert row.bartlett_chi2 == math.floor(chi * 1e6 + 0.5) / 1e6
    assert row.bartlett_chi2 >= 0


# ------------------------------------------------------ timeseries_kpss


def test_kpss_python_replay(spark):
    from multithreaded_map_reduce_spark.functions.time import epoch_micros
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
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
    xs = [r["count"] for r in rows]
    n, t = len(xs), sum(xs)
    us = [n * x - t for x in xs]
    cu, su2 = 0, 0
    for u in us:
        cu += u
        su2 += cu * cu
    uu = sum(u * u for u in us)
    row = _q("timeseries_kpss")(spark, SF_SMOKE).collect()[0]
    assert row.n_days == n
    assert row.eta_micros == _half_up(su2, n * uu)
    assert row.level_stationary_5pct == int(1_000_000 * su2 <= 463_000 * n * uu)


# --------------------------------------------- stats_weighted_quantiles


def test_weighted_quantiles_python_replay(spark):
    from collections import defaultdict

    from multithreaded_map_reduce_spark.sources.catalog import load_table

    w_by_cents = defaultdict(int)
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_extendedprice", "l_quantity")
        .collect()
    ):
        cents = math.floor(float(r.l_extendedprice) * 100 + 0.5)
        w_by_cents[cents] += int(r.l_quantity)
    tw = sum(w_by_cents.values())
    cum = 0
    got = _q("stats_weighted_quantiles")(spark, SF_SMOKE).collect()[0]
    want = {}
    for cents in sorted(w_by_cents):
        cum += w_by_cents[cents]
        for name, num, den in (
            ("wp25_cents", 1, 4),
            ("wp50_cents", 1, 2),
            ("wp75_cents", 3, 4),
        ):
            if name not in want and cum * 2 * den >= tw * 2 * num:
                want[name] = cents
    assert got.total_weight == tw
    assert (got.wp25_cents, got.wp50_cents, got.wp75_cents) == (
        want["wp25_cents"],
        want["wp50_cents"],
        want["wp75_cents"],
    )
    assert got.wp25_cents <= got.wp50_cents <= got.wp75_cents
    # the weighted median must differ from a naive unweighted one in
    # general; at minimum it must be an actual attained price
    assert got.wp50_cents in w_by_cents


# ----------------------------------------------------- quality_fleiss_kappa


def test_fleiss_kappa_fraction_rederivation(spark):
    """Re-derive kappa from first principles (P-bar, P-bar-e) with
    exact Fractions — pins the cross-multiplied rational's algebra
    (a factor slip there passes the differential gate because both
    engines share the expression; this replay caught exactly that
    during development)."""
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("n_chars", "text")
        .collect()
    )
    gs = []
    for r in docs:
        g = (
            int(int(r.n_chars) >= 500)
            + int(len(r.text) - len(r.text.replace(" ", "")) >= 80)
            + int(len(r.text) - len(r.text.replace(".", "")) >= 3)
        )
        gs.append(g)
    n_docs = len(gs)
    gg = sum(gs)
    a = sum(g * g + (3 - g) * (3 - g) for g in gs)
    p_bar = Fraction(a - 3 * n_docs, 6 * n_docs)
    p_e = Fraction(gg * gg + (3 * n_docs - gg) ** 2, 9 * n_docs * n_docs)
    kappa = (p_bar - p_e) / (1 - p_e)
    row = _q("quality_fleiss_kappa")(spark, SF_SMOKE).collect()[0]
    assert (row.n_docs, row.n_good_votes, row.a_sum) == (n_docs, gg, a)
    # signed micros half-up of the exact Fraction
    snapped = _half_up_signed(kappa.numerator, kappa.denominator)
    assert row.fleiss_kappa_micros == snapped
    assert -1_000_000 <= row.fleiss_kappa_micros <= 1_000_000
    # both categories must actually occur for the test to be meaningful
    assert 0 < gg < 3 * n_docs
