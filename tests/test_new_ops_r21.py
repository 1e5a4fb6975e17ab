"""Round-13 semantics tests, batch 3: try_* error-safe arithmetic,
peak session concurrency (day-partitioned sweep-line), and the
cumulative-periodogram white-noise test — replayed against plain
third references."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _half_up(num: int, den: int, mult: int = 1_000_000) -> int:
    return (2 * mult * num + den) // (2 * den)


# ---------------------------------------------------- sql_try_arithmetic


def test_try_arithmetic_python_replay(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus"
    ).collect()
    n = len(o)
    div_null = sum(1 for r in o if r.o_custkey % 7 == 0)
    mod_ok = sum(1 for r in o if r.o_custkey % 5 != 0)
    cast_rows = [r for r in o if r.o_orderkey % 3 == 0]
    cast_sum = sum(int(r.o_orderpriority[0]) for r in cast_rows)
    row = _q("sql_try_arithmetic")(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == n
    assert row.n_div_ok == n - div_null
    assert row.n_div_null == div_null
    assert row.n_mod_ok == mod_ok
    # statuses (O/F/P) never parse; priority digits always do
    assert row.n_cast_ok == len(cast_rows)
    assert row.cast_sum == cast_sum


# ------------------------------------------------ events_peak_concurrency


def test_peak_concurrency_python_replay(spark):
    from multithreaded_map_reduce_spark.functions.time import epoch_micros
    from multithreaded_map_reduce_spark.queries.events import KM_GAP_MIN
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", epoch_micros(F.col("ts")).alias("us"), "event_id")
        .collect()
    )
    by_user = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.us, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.us)
    gap = KM_GAP_MIN * 60_000_000
    sessions = []
    for times in by_user.values():
        start = prev = times[0]
        for t in times[1:]:
            if t - prev > gap:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    deltas = [(s, 1) for s, _ in sessions] + [(e + 1, -1) for _, e in sessions]
    deltas.sort(key=lambda x: (x[0], -x[1]))
    cur = peak = 0
    peak_at = None
    for t, d in deltas:
        cur += d
        if cur > peak:
            peak, peak_at = cur, t
    row = _q("events_peak_concurrency")(spark, SF_SMOKE).collect()[0]
    assert row.n_sessions == len(sessions)
    assert row.peak_concurrency == peak
    assert row.peak_at_us == peak_at
    assert 1 <= peak <= len(sessions)


# -------------------------------------------- timeseries_cum_periodogram


def test_cum_periodogram_python_replay(spark):
    from multithreaded_map_reduce_spark.functions.time import epoch_micros
    from multithreaded_map_reduce_spark.queries.timeseries import (
        CPG_CRIT_5PCT_MICROS,
        SE_PERIODS,
        SE_TABLES,
    )
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
    ser = {r["day"]: r["count"] for r in rows}
    d, t = len(ser), sum(ser.values())
    u = {day: d * x - t for day, x in ser.items()}
    powers = []
    for p in SE_PERIODS:
        cs, sn = SE_TABLES[p]
        a = sum(uv * cs[day % p] for day, uv in u.items())
        b = sum(uv * sn[day % p] for day, uv in u.items())
        powers.append(a * a + b * b)
    ptot = sum(powers)
    m = len(powers)
    cp = 0
    dmax = 0
    for j, pw in enumerate(powers, start=1):
        cp += pw
        dmax = max(dmax, abs(m * cp - j * ptot))
    row = _q("timeseries_cum_periodogram")(spark, SF_SMOKE).collect()[0]
    assert row.n_periods == m
    assert row.d_micros == _half_up(dmax, m * ptot)
    assert row.white_noise_5pct == int(
        1_000_000 * dmax <= CPG_CRIT_5PCT_MICROS * m * ptot
    )
    # D is a [0,1] statistic; the last cumulative point has zero
    # deviation by construction, so D comes from an interior j
    assert 0 <= row.d_micros <= 1_000_000
