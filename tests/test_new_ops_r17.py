"""Round-12 semantics tests, batch 1: the re-planned triangle family
(VERDICT r11 item 1) — support-filtered, degree-capped co-shipment
projection + degree-ordered orientation + explode-free per-corner
counts — and the graph-operator helpers behind it."""

from __future__ import annotations

import inspect
import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


# ------------------------------------------------------- graph helpers


def test_support_filter_edges_above_mean(spark):
    from multithreaded_map_reduce_spark.operators.graph import (
        support_filter_edges,
    )

    pairs = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 1), (2, 3, 10)], "a long, b long, w long"
    )
    # mean weight = 4; strictly-above keeps only w=10
    kept = support_filter_edges(pairs).collect()
    assert [(r.a, r.b, r.w) for r in kept] == [(2, 3, 10)]
    # all-equal weights: w*m > sw is never strict — empty result, no error
    flat = spark.createDataFrame([(1, 2, 5), (2, 3, 5)], "a long, b long, w long")
    assert support_filter_edges(flat).count() == 0


def test_degree_cap_union_knn(spark):
    from multithreaded_map_reduce_spark.operators.graph import degree_cap_edges

    # hub 0 with partners 1..5, weights 5..1; cap 2.
    # hub nominates (1, 2); every leaf nominates its only partner (0),
    # so union-kNN keeps ALL hub edges (either endpoint nominates).
    pairs = spark.createDataFrame(
        [(0, p, 6 - p) for p in range(1, 6)], "a long, b long, w long"
    )
    kept = sorted((r.a, r.b) for r in degree_cap_edges(pairs, 2).collect())
    assert kept == [(0, p) for p in range(1, 6)]
    # isolate the nomination side: two hubs sharing leaves — each leaf
    # has degree 2 and cap 1 keeps only its stronger nomination, but
    # hubs nominate their top-1 too.
    pairs2 = spark.createDataFrame(
        [(0, 10, 9), (0, 11, 1), (1, 10, 5), (1, 11, 7)],
        "a long, b long, w long",
    )
    kept2 = sorted((r.a, r.b) for r in degree_cap_edges(pairs2, 1).collect())
    # leaf 10 nominates hub 0 (w 9>5); leaf 11 nominates hub 1 (7>1);
    # hub 0 nominates 10 (9); hub 1 nominates 11 (7) — union:
    assert kept2 == [(0, 10), (1, 11)]
    # deterministic tie-break: equal weights nominate the SMALLER id
    ties = spark.createDataFrame(
        [(0, 2, 3), (0, 1, 3)], "a long, b long, w long"
    )
    kept3 = sorted((r.a, r.b) for r in degree_cap_edges(ties, 1).collect())
    # node 0 nominates partner 1 (tie -> smaller id); 1 and 2 each
    # nominate their only partner 0 -> union keeps both edges
    assert kept3 == [(0, 1), (0, 2)]


def test_degree_oriented_triangles_known_graphs(spark):
    from multithreaded_map_reduce_spark.operators.graph import (
        degree_oriented_triangles,
    )

    # K4: 4 triangles, every node in 3 of them, degree 3
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "a long, b long"
    )
    tris, deg = degree_oriented_triangles(k4)
    rows = tris.collect()
    assert len(rows) == 4
    from collections import Counter

    per = Counter()
    for r in rows:
        corners = {r.x1, r.x2, r.x3}
        assert len(corners) == 3  # no degenerate triangle
        per.update(corners)
    assert dict(per) == {0: 3, 1: 3, 2: 3, 3: 3}
    assert {(r.v, r.d) for r in deg.collect()} == {(v, 3) for v in range(4)}
    # star K1,5: triangle-free; orientation must point every edge
    # leaf -> hub ((degree, id) order), so the hub pays ZERO wedges
    star = spark.createDataFrame([(9, p) for p in range(5)], "a long, b long")
    tris_s, deg_s = degree_oriented_triangles(star)
    assert tris_s.count() == 0
    assert {(r.v, r.d) for r in deg_s.collect()} == {(9, 5)} | {
        (p, 1) for p in range(5)
    }


def test_degree_oriented_matches_id_oriented_on_random_graph(spark):
    """Independent cross-check (exactness-rails rule a): the NEW
    degree-ordered enumerator against the OLD id-ordered
    triangle_count on 30 random graphs — two different orientations
    must agree on the exact triangle total, and the per-corner sum
    must be 3x the total."""
    from multithreaded_map_reduce_spark.operators.graph import (
        degree_oriented_triangles,
        triangle_count,
    )

    rng = random.Random(17)
    edges = sorted(
        {
            (a, b)
            for _ in range(120)
            for a, b in [sorted(rng.sample(range(14), 2))]
        }
    )
    df = spark.createDataFrame(edges, "a long, b long")
    tris, _deg = degree_oriented_triangles(df)
    rows = tris.collect()
    expected = triangle_count(df).collect()[0]["n_triangles"]
    assert len(rows) == expected
    # plain-Python third reference: brute-force triangle count
    es = set(edges)
    n_brute = sum(
        1
        for i in range(14)
        for j in range(i + 1, 14)
        for k in range(j + 1, 14)
        if (i, j) in es and (j, k) in es and (i, k) in es
    )
    assert expected == n_brute


# ------------------------------------------- triangle-family contracts


def test_triangle_projection_plan_degree_capped(spark):
    """The shared projection's plan must show the per-node cap window
    (partitioned row_number) and the broadcast support threshold —
    and no cartesian anywhere."""
    from multithreaded_map_reduce_spark.plans.audit import (
        explain_formatted,
        plan_report,
    )
    from multithreaded_map_reduce_spark.queries.graphrank import (
        _build_supplier_cograph,
    )

    df = _build_supplier_cograph(spark, SF_SMOKE)
    text = explain_formatted(df)
    assert "__dc_rn" in text, "degree-cap window missing from plan"
    rep = plan_report(df)
    assert not rep.cartesian
    assert rep.broadcast_joins >= 1  # the 1-row support threshold


def test_clustering_coefficient_no_corner_explode(spark):
    """VERDICT r11 item 1b: per-node counts must come from per-corner
    aggregates, never an x3 corner explode of the triangle relation."""
    from multithreaded_map_reduce_spark.queries.graphrank import (
        graph_clustering_coefficient,
    )

    src = inspect.getsource(graph_clustering_coefficient)
    assert "explode" not in src
    assert src.count("groupBy") >= 4  # three corner roles + final sum


def test_orientation_is_degree_ordered_source_pin(spark):
    """VERDICT r11 item 1a: the wedge join orients by (degree, id),
    not raw id — pin the orientation predicate."""
    from multithreaded_map_reduce_spark.operators import graph

    src = inspect.getsource(graph.degree_oriented_triangles)
    assert 'F.col("da.d") < F.col("db.d")' in src
    assert 'F.col("da.d") == F.col("db.d")' in src


def test_triangle_family_consistency_smoke(spark):
    """Both queries must run on the SAME filtered projection:
    sum of per-node triangle counts == 3 x global count, and every
    degree respects the cap-induced bound (d <= n-1 always; the cap
    bounds NOMINATIONS, union-kNN degree can exceed the cap only up
    to the node count)."""
    rows = _q("graph_clustering_coefficient")(spark, SF_SMOKE).collect()
    assert rows
    total = _q("triangle_suppliers")(spark, SF_SMOKE).collect()[0][0]
    assert sum(r.n_triangles for r in rows) == 3 * total
    n = len(rows)
    for r in rows:
        assert 1 <= r.degree <= n - 1
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2
        if r.lc_micros is not None:
            assert 0 <= r.lc_micros <= 1_000_000


# ------------------------------------------------- rank-rail guards (ADVICE r11)


def test_rail_null_bucket_fails_fast(spark):
    """ADVICE r11: a NULL bucket key must raise, not silently drop the
    row from the offset equi-join."""
    import pytest
    from pyspark.sql.utils import PythonException

    from multithreaded_map_reduce_spark.operators.ranks import (
        with_global_order,
    )

    df = spark.createDataFrame([(1,), (None,)], "k long")
    out = with_global_order(df, buckets=[F.col("k")], order=[F.asc("k")],
                            row_number="rn")
    with pytest.raises(Exception, match="NULL bucket key"):
        out.collect()


def test_range_bucket_huge_and_degenerate_bounds(spark):
    """ADVICE r11: at |hi| >= 2^53 the absolute +1.0 upper-bound bump
    is absorbed; with lo == hi that made width_bucket's bounds equal
    -> NULL buckets. The relative-epsilon bound must keep buckets
    non-NULL (and the rail lossless) at any magnitude."""
    from multithreaded_map_reduce_spark.operators.ranks import (
        range_bucket,
        with_global_order,
    )

    big = 2**60
    df = spark.createDataFrame([(big,), (big,), (big,)], "k long")
    b = df.agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
    got = with_global_order(
        df.crossJoin(F.broadcast(b)),
        buckets=[range_bucket(F.col("k"), F.col("lo"), F.col("hi"), 16)],
        order=[F.asc("k")],
        row_number="rn",
    ).select("k", "rn")
    rows = sorted(r.rn for r in got.collect())
    assert rows == [1, 2, 3]  # no row dropped, exact global row numbers
    # plain column check: bucket itself is non-NULL at huge magnitude
    bk = (
        df.crossJoin(F.broadcast(b))
        .select(range_bucket(F.col("k"), F.col("lo"), F.col("hi"), 16).alias("bk"))
        .collect()
    )
    assert all(r.bk is not None for r in bk)


# --------------------------------------------- round-12 batch 1 ops


def test_edge_support_hand_graphs(spark):
    from multithreaded_map_reduce_spark.queries.graphrank import _edge_support

    # K4: every edge lies in exactly 2 triangles
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "a long, b long"
    )
    sup = {(r.a, r.b): r.support for r in _edge_support(k4).collect()}
    assert sup == {(a, b): 2 for a in range(4) for b in range(a + 1, 4)}
    # triangle + pendant: triangle edges support 1; pendant edge absent
    tp = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "a long, b long"
    )
    sup2 = {(r.a, r.b): r.support for r in _edge_support(tp).collect()}
    assert sup2 == {(0, 1): 1, (0, 2): 1, (1, 2): 1}


def test_ktruss_fixture_invariants(spark):
    """Survivor edges are a subset of the projection; the support
    column is cross-checked against an INDEPENDENT triangle count of
    the surviving subgraph (sum of per-edge supports = 3x triangles,
    each triangle counted on its three edges) via the id-oriented
    enumerator."""
    from multithreaded_map_reduce_spark.operators.graph import triangle_count
    from multithreaded_map_reduce_spark.queries.graphrank import (
        _supplier_cograph,
    )

    rows = _q("graph_ktruss")(spark, SF_SMOKE).collect()
    assert rows
    base = {(r.a, r.b) for r in _supplier_cograph(spark, SF_SMOKE).collect()}
    assert {(r.a, r.b) for r in rows} <= base
    surv = spark.createDataFrame(
        [(r.a, r.b) for r in rows], "a long, b long"
    )
    n_tri = triangle_count(surv).collect()[0]["n_triangles"]
    assert sum(r.support for r in rows) == 3 * n_tri


def test_ratio_units_dec_signed_portable_rounding(spark):
    from multithreaded_map_reduce_spark.functions.rounding import (
        ratio_units_dec_signed,
    )

    df = spark.range(1)
    got = df.select(
        ratio_units_dec_signed("-1", "3").alias("a"),      # -333333.3 -> half-up
        ratio_units_dec_signed("-1", "2").alias("b"),      # exact -500000
        ratio_units_dec_signed("-3", "2", mult=1).alias("c"),  # -1.5 tie -> -1
        ratio_units_dec_signed("1", "3").alias("d"),       # positive path
        ratio_units_dec_signed("3", "2", mult=1).alias("e"),   # 1.5 tie -> 2
    ).collect()[0]
    assert (got.a, got.b, got.c, got.d, got.e) == (
        -333333, -500000, -1, 333333, 2
    )
    # DuckDB twin agrees on the same probes
    import duckdb

    from multithreaded_map_reduce_spark.functions.rounding import (
        sql_ratio_units_dec_signed,
    )

    q = ", ".join(
        sql_ratio_units_dec_signed(n, d, mult=m)
        for n, d, m in [
            ("-1", "3", 1_000_000),
            ("-1", "2", 1_000_000),
            ("-3", "2", 1),
            ("1", "3", 1_000_000),
            ("3", "2", 1),
        ]
    )
    assert tuple(duckdb.sql(f"SELECT {q}").fetchone()) == (
        -333333, -500000, -1, 333333, 2
    )


def test_kappa_model_rule_identity(spark):
    """kappa must satisfy the defining identity (po - pe)/(1 - pe)
    within micro double-rounding, and po must be the exact half-up of
    n_agree/n — a plain-Python third reference."""
    row = _q("quality_kappa_model_rule")(spark, SF_SMOKE).collect()[0]
    n, agree = row.n_docs, row.n_agree
    assert row.po_micros == (2 * 1_000_000 * agree + n) // (2 * n)
    assert 0 <= row.pe_micros <= 1_000_000
    if row.kappa_micros is not None and row.pe_micros < 1_000_000:
        expect = (row.po_micros - row.pe_micros) / (1_000_000 - row.pe_micros)
        assert abs(row.kappa_micros - expect * 1_000_000) <= 2_000
        assert -1_000_000 <= row.kappa_micros <= 1_000_000


# --------------------------------------------- round-12 batch 2 ops


def test_bigram_lm_python_reference(spark):
    """Plain-Python third reference: recompute per-lang add-one bigram
    NLL from the engine's own token relation (shares ONLY the
    tokenizer; counts, joins, smoothing and snaps re-derived in
    Python with math.log)."""
    import math
    from collections import Counter

    from multithreaded_map_reduce_spark.functions.text import tokenize

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = docs.select(
        "lang", tokenize(F.col("text")).alias("tk")
    ).collect()
    uni, big, perlang = Counter(), Counter(), {}
    for r in rows:
        uni.update(r.tk)
        for a, b in zip(r.tk, r.tk[1:]):
            big[(a, b)] += 1
            perlang.setdefault(r.lang, Counter())[(a, b)] += 1
    v = len(uni)

    def snap9(x):
        return math.floor(x * 1e9 + 0.5)

    got = {r.lang: r for r in _q("text_bigram_lm_perplexity")(spark, SF_SMOKE).collect()}
    assert set(got) == set(perlang)
    for lang, cnt in perlang.items():
        n = sum(cnt.values())
        total = sum(
            c * (snap9(math.log(uni[w1] + v)) - snap9(math.log(big[(w1, w2)] + 1)))
            for (w1, w2), c in cnt.items()
        )
        assert got[lang].n_bigrams == n
        assert got[lang].total_nll_nanos == total
        assert got[lang].avg_nll_nanos == (2 * total + n) // (2 * n)
        assert got[lang].avg_nll_nanos > 0  # smoothing keeps p < 1


def test_image_entropy_python_reference(spark):
    """Exact snap-replica recompute from the histogram query's own
    rows, plus the unsnapped Shannon value within nano slack and the
    [0, ln 8] range bound."""
    import math
    from collections import defaultdict

    hist = defaultdict(dict)
    for r in _q("multimodal_binaryfile_histogram")(spark, SF_SMOKE).collect():
        hist[r.media_id][r.bucket] = r.n_bytes
    got = {r.media_id: r for r in _q("multimodal_image_entropy")(spark, SF_SMOKE).collect()}
    assert set(got) == set(hist)

    def snap9(x):
        return math.floor(x * 1e9 + 0.5)

    for mid, buckets in hist.items():
        n = sum(buckets.values())
        clnc = sum(c * snap9(math.log(c)) for c in buckets.values() if c > 0)
        expect = snap9(math.log(n)) - (2 * clnc + n) // (2 * n)
        assert got[mid].n_bytes_total == n
        assert got[mid].entropy_nanos == expect
        true_h = math.log(n) - sum(
            (c / n) * math.log(c) for c in buckets.values() if c > 0
        )
        assert abs(got[mid].entropy_nanos - true_h * 1e9) <= 10
        assert -5 <= got[mid].entropy_nanos <= math.log(8) * 1e9 + 5


# --------------------------------------------- round-12 batch 3 ops


def test_variance_ratio_python_reference(spark):
    """Exact-Fraction third reference: rebuild the day series, both
    increment families and the half-up micros VR in plain Python."""
    from fractions import Fraction

    from multithreaded_map_reduce_spark.functions.time import epoch_micros
    from multithreaded_map_reduce_spark.queries.timeseries import VR_Q

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ser = {
        r.day: r.x
        for r in ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    }

    def var_terms(lag):
        ds = [ser[d + lag] - ser[d] for d in ser if d + lag in ser]
        n = len(ds)
        return n, sum(ds), sum(x * x for x in ds)

    n1, s1, q1 = var_terms(1)
    nq, sq, qq = var_terms(VR_Q)
    row = _q("timeseries_variance_ratio")(spark, SF_SMOKE).collect()[0]
    assert (row.n_1diffs, row.n_qdiffs) == (n1, nq)
    var1 = n1 * q1 - s1 * s1
    varq = nq * qq - sq * sq
    if n1 >= 2 and nq >= 2 and var1 != 0:
        num = varq * n1 * (n1 - 1)
        den = VR_Q * var1 * nq * (nq - 1)
        assert row.vr_micros == (2 * 1_000_000 * num + den) // (2 * den)
        assert row.vr_micros >= 0
    else:
        assert row.vr_micros is None
    del Fraction


def test_angular_histogram_python_reference(spark):
    """Plain-Python recompute: same delta pairs, same left-to-right
    float64 dot/norm order, same snap and binning."""
    import math

    from multithreaded_map_reduce_spark.queries.similarity import (
        ANG_BINS,
        ANG_DELTAS,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    counts = [0] * ANG_BINS
    for d in ANG_DELTAS:
        for i, v in emb.items():
            w = emb.get(i + d)
            if w is None:
                continue
            dot = 0.0
            for x, y in zip(v, w):
                dot = dot + x * y
            na = 0.0
            for x in v:
                na = na + x * x
            nb = 0.0
            for y in w:
                nb = nb + y * y
            c6 = math.floor(dot / math.sqrt(na * nb) * 1e6 + 0.5)
            counts[min((c6 + 1_000_000) // 200_000, ANG_BINS - 1)] += 1
    rows = _q("embedding_angular_histogram")(spark, SF_SMOKE).collect()
    assert len(rows) == ANG_BINS
    got = {r.bin: r.n_pairs for r in rows}
    assert got == {b: counts[b] for b in range(ANG_BINS)}
    assert {r.bin: r.lo_micros for r in rows} == {
        b: -1_000_000 + 200_000 * b for b in range(ANG_BINS)
    }
    assert sum(counts) > 0


def test_linear_counting_python_reference(spark):
    """Bitmap, hash and snapped estimate replayed in plain Python;
    estimate accuracy bound vs the exact distinct."""
    import math

    from multithreaded_map_reduce_spark.functions.hashing import POLY_MOD
    from multithreaded_map_reduce_spark.queries.sketches import (
        LC_A,
        LC_B,
        LC_M,
    )

    keys = {
        r.l_partkey
        for r in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_partkey")
        .collect()
    }
    bits = {((k % POLY_MOD) * LC_A + LC_B) % POLY_MOD % LC_M for k in keys}
    row = _q("sketch_linear_counting")(spark, SF_SMOKE).collect()[0]
    assert row.m == LC_M
    assert row.n_filled == len(bits)
    assert row.n_exact == len(keys)
    z = LC_M - len(bits)
    assert z > 0  # fixture far from saturation

    def snap9(x):
        return math.floor(x * 1e9 + 0.5)

    est_nanos = LC_M * (snap9(math.log(LC_M)) - snap9(math.log(z)))
    assert row.estimate_micros == (2 * est_nanos + 1000) // 2000
    # linear counting should be tight at this load factor
    assert abs(row.estimate_micros / 1e6 - len(keys)) / len(keys) < 0.1


# --------------------------------------------- round-12 batch 4 ops


def test_hill_tail_index_python_reference(spark):
    """Plain-Python replay of the top-(k+1) order statistics, snapped
    logs and half-up alpha."""
    import math

    from multithreaded_map_reduce_spark.queries.events import HILL_K

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    per = sorted(
        ((r.user_id, r.n) for r in ev.groupBy("user_id")
         .agg(F.count(F.lit(1)).alias("n")).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    row = _q("events_hill_tail_index")(spark, SF_SMOKE).collect()[0]
    assert row.k == HILL_K
    assert row.n_users == len(per)

    def snap9(x):
        return math.floor(x * 1e9 + 0.5)

    if len(per) < HILL_K + 1:
        assert row.alpha_micros is None
        return
    top = [n for _, n in per[: HILL_K + 1]]
    assert row.xk1 == top[HILL_K]
    hill = sum(snap9(math.log(n)) for n in top[:HILL_K]) - HILL_K * snap9(
        math.log(top[HILL_K])
    )
    if hill <= 0:
        assert row.alpha_micros is None
    else:
        num = HILL_K * 1_000_000_000
        assert row.alpha_micros == (2 * 1_000_000 * num + hill) // (2 * hill)
        assert row.alpha_micros > 0


def test_wilson_interval_python_reference(spark):
    """Closed-form Wilson bounds recomputed in plain Python from the
    exact (n, k) cells; bounds ordered and inside [0, 1]."""
    import math

    from multithreaded_map_reduce_spark.queries.textstats import (
        WILSON_Z,
        WILSON_Z2,
    )

    rows = _q("quality_wilson_interval")(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n, k = r.n_docs, r.n_keep
        p = k / n
        denom = 1.0 + WILSON_Z2 / n
        center = (p + WILSON_Z2 / (2.0 * n)) / denom
        half = (
            WILSON_Z
            * math.sqrt(p * (1.0 - p) / n + WILSON_Z2 / (4.0 * n * n))
            / denom
        )
        assert abs(r.wilson_lo - (center - half)) < 2e-6
        assert abs(r.wilson_hi - (center + half)) < 2e-6
        assert 0.0 <= r.wilson_lo <= r.keep_rate <= r.wilson_hi <= 1.0


def test_audio_snr_consistency_with_segments(spark):
    """The SNR split must agree with the segments query on frame
    counts, and every gated energy side must respect the threshold
    arithmetic (mean active >= thresh > mean inactive)."""
    from multithreaded_map_reduce_spark.queries.multimodal import (
        _VAD_THRESH,
    )

    seg = {
        r.media_id: r
        for r in _q("multimodal_audio_segments")(spark, SF_SMOKE).collect()
    }
    rows = _q("multimodal_audio_snr")(spark, SF_SMOKE).collect()
    assert rows and set(seg) == {r.media_id for r in rows}
    for r in rows:
        s = seg[r.media_id]
        assert r.n_active == s.n_active
        assert r.n_active + r.n_inactive == s.n_frames
        if r.n_active:
            assert r.act_energy >= _VAD_THRESH * r.n_active
        if r.n_inactive:
            assert r.inact_energy < _VAD_THRESH * r.n_inactive
        if r.snr_micros is not None:
            # mean-active / mean-inactive > 1 by the gate
            assert r.snr_micros > 1_000_000


# --------------------------------------------- round-12 batch 5 ops


def test_streaming_digit_drift_matches_batch_replay(spark):
    """The stream result must equal a plain batch recompute (same
    exact inequality), and the flag must replay in plain Python."""
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.functions.time import epoch_micros

    p = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
            F.substring(iunits(F.col("value"), 2).cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        )
        .collect()
    )
    from collections import Counter

    tot = Counter(r.digit for r in p)
    nn = sum(tot.values())
    daily_n = Counter(r.day for r in p)
    cells = Counter((r.day, r.digit) for r in p)
    rows = _q("streaming_digit_drift")(spark, SF_SMOKE).collect()
    assert len(rows) == 9 * len(daily_n)
    for r in rows:
        c = cells.get((r.day, r.digit), 0)
        xk = tot.get(r.digit, 0)
        n = daily_n[r.day]
        assert r.n_obs == c
        dev = c * nn - xk * n
        expect = int(dev * dev > 9 * n * xk * (nn - xk) * nn)
        assert r.drift_flag == expect


def test_richclub_python_reference(spark):
    """Induced-subgraph density recomputed in plain Python from the
    shared projection; monotone sanity on the k axis."""
    from multithreaded_map_reduce_spark.queries.graphrank import (
        RICHCLUB_KS,
        _supplier_cograph,
    )

    edges = [(r.a, r.b) for r in _supplier_cograph(spark, SF_SMOKE).collect()]
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    rows = {r.k: r for r in _q("graph_richclub")(spark, SF_SMOKE).collect()}
    assert sorted(rows) == RICHCLUB_KS
    for k in RICHCLUB_KS:
        rich = {v for v, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in rich and b in rich)
        r = rows[k]
        assert r.n_k == len(rich)
        assert r.e_k == ek
        if len(rich) >= 2:
            den = len(rich) * (len(rich) - 1)
            assert r.phi_micros == (2 * 1_000_000 * 2 * ek + den) // (2 * den)
            assert 0 <= r.phi_micros <= 1_000_000
        else:
            assert r.phi_micros is None
