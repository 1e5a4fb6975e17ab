"""Round-13 semantics tests, batch 4: capture-recapture duplicate
population audit, seasonal Mann-Kendall, Cohen's d / Hedges g —
replayed against plain third references."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _half_up(num: int, den: int, mult: int = 1_000_000) -> int:
    return (2 * mult * num + den) // (2 * den)


# ---------------------------------------------- dedup_capture_recapture


def test_capture_recapture_python_replay(spark):
    mh = {
        (r.id_a, r.id_b)
        for r in _q("dedup_minhash_lsh")(spark, SF_SMOKE).collect()
    }
    sh = {
        (r.id_a, r.id_b)
        for r in _q("dedup_simhash")(spark, SF_SMOKE).collect()
    }
    n1, n2, m = len(mh), len(sh), len(mh & sh)
    row = _q("dedup_capture_recapture")(spark, SF_SMOKE).collect()[0]
    assert (row.n_minhash_pairs, row.n_simhash_pairs, row.n_both) == (
        n1,
        n2,
        m,
    )
    chapman = _half_up((n1 + 1) * (n2 + 1), m + 1, 1) - 1
    assert row.chapman_population_est == chapman
    if m:
        lp = _half_up(n1 * n2, m, 1)
        assert row.lp_population_est == lp
        # the estimated population can never be below either capture
        assert lp >= max(n1, n2)
        assert row.minhash_coverage_micros == _half_up(m, n2)
        assert row.simhash_coverage_micros == _half_up(m, n1)


# ----------------------------------------- timeseries_seasonal_mann_kendall


def test_seasonal_mk_python_replay(spark):
    from collections import Counter, defaultdict

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
        .collect()
    )
    by_dow = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["day"]):
        by_dow[r["day"] % 7].append(r["count"])
    s = 0
    var18 = 0
    n = 0
    for xs in by_dow.values():
        n += len(xs)
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                s += (xs[j] > xs[i]) - (xs[j] < xs[i])
        ns = len(xs)
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        var18 += ns * (ns - 1) * (2 * ns + 5) - tie
    row = _q("timeseries_seasonal_mann_kendall")(spark, SF_SMOKE).collect()[0]
    assert (row.n_days, row.s_stat, row.var_s_x18) == (n, s, var18)
    if s != 0 and var18 > 0:
        num = 18 * (abs(s) - 1) ** 2
        assert row.z2_micros == _half_up(num, var18)
    # the seasonal S is bounded by the within-season pair count
    max_pairs = sum(len(x) * (len(x) - 1) // 2 for x in by_dow.values())
    assert abs(s) <= max_pairs


# ------------------------------------------------------- quality_cohens_d


def test_cohens_d_python_replay(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    groups = {0: [], 1: []}
    for r in li:
        if r.l_returnflag == "R":
            groups[0].append(
                math.floor(float(r.l_extendedprice) * 100 + 0.5)
            )
        elif r.l_returnflag == "N":
            groups[1].append(
                math.floor(float(r.l_extendedprice) * 100 + 0.5)
            )
    n0, n1 = len(groups[0]), len(groups[1])
    s0, s1 = sum(groups[0]), sum(groups[1])
    q0 = sum(x * x for x in groups[0])
    q1 = sum(x * x for x in groups[1])
    d = (s0 / n0 - s1 / n1) / math.sqrt(
        ((q0 - s0 * s0 / n0) + (q1 - s1 * s1 / n1)) / (n0 + n1 - 2)
    )
    row = _q("quality_cohens_d")(spark, SF_SMOKE).collect()[0]
    assert (row.n_returned, row.n_normal) == (n0, n1)
    assert row.cohens_d == math.floor(d * 1e6 + 0.5) / 1e6
    df = n0 + n1 - 2
    assert row.hedges_j_micros == _half_up(4 * df - 4, 4 * df - 1)
    d6 = abs(math.floor(d * 1e6 + 0.5))
    want = (
        "negligible"
        if d6 < 200_000
        else "small"
        if d6 < 500_000
        else "medium"
        if d6 < 800_000
        else "large"
    )
    assert row.magnitude == want
    # J is a shrinkage factor strictly inside (0, 1)
    assert 0 < row.hedges_j_micros < 1_000_000
