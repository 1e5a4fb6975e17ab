"""Round-13 semantics tests, batch 6: Jonckheere-Terpstra (Fraction
re-derivation of the tie-corrected variance — the clearing-algebra
check the differential gate cannot make), image border geometry, and
the session-gap sensitivity sweep."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _half_up(num: int, den: int, mult: int = 1_000_000) -> int:
    return (2 * mult * num + den) // (2 * den)


# ------------------------------------------------- quality_jonckheere


def test_jonckheere_fraction_rederivation(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    o = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_g = defaultdict(list)
    for r in o:
        g = int(r.o_orderpriority[0])
        b = math.floor(float(r.o_totalprice) * 100 + 0.5) // 100_000
        by_g[g].append(b)
    gs = sorted(by_g)
    # J with the standard half-tie credit, kept integral as 2J
    j2 = 0
    for i, g in enumerate(gs):
        for g2 in gs[i + 1 :]:
            for x in by_g[g]:
                for y in by_g[g2]:
                    if y > x:
                        j2 += 2
                    elif y == x:
                        j2 += 1
    nn = sum(len(v) for v in by_g.values())
    e_j = Fraction(nn * nn - sum(len(v) ** 2 for v in by_g.values()), 4)
    ties = Counter(b for v in by_g.values() for b in v)
    a = (
        nn * (nn - 1) * (2 * nn + 5)
        - sum(
            len(v) * (len(v) - 1) * (2 * len(v) + 5) for v in by_g.values()
        )
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    )
    b_term = sum(
        len(v) * (len(v) - 1) * (len(v) - 2) for v in by_g.values()
    ) * sum(t * (t - 1) * (t - 2) for t in ties.values())
    c_term = sum(len(v) * (len(v) - 1) for v in by_g.values()) * sum(
        t * (t - 1) for t in ties.values()
    )
    var = (
        Fraction(a, 72)
        + Fraction(b_term, 36 * nn * (nn - 1) * (nn - 2))
        + Fraction(c_term, 8 * nn * (nn - 1))
    )
    z2_exact = (Fraction(j2, 2) - e_j) ** 2 / var
    # the query closes in ONE double expression (the DECIMAL clearing
    # overflows at sf0.1) — replay the identical double formula AND
    # bound it against the exact Fraction (the algebra check)
    e4 = nn * nn - sum(len(v) ** 2 for v in by_g.values())
    var_d = (
        (nn * (nn - 1) * (2 * nn + 5) - float(
            sum(len(v) * (len(v) - 1) * (2 * len(v) + 5) for v in by_g.values())
        ) - float(sum(t * (t - 1) * (2 * t + 5) for t in ties.values()))) / 72.0
        + (float(sum(len(v) * (len(v) - 1) * (len(v) - 2) for v in by_g.values()))
           * float(sum(t * (t - 1) * (t - 2) for t in ties.values())))
        / (36.0 * nn * (nn - 1) * (nn - 2))
        + (float(sum(len(v) * (len(v) - 1) for v in by_g.values()))
           * float(sum(t * (t - 1) for t in ties.values())))
        / (8.0 * nn * (nn - 1))
    )
    dev_d = (2 * float(j2) - float(e4)) / 4.0
    z2_d = dev_d * dev_d / var_d
    row = _q("quality_jonckheere")(spark, SF_SMOKE).collect()[0]
    assert row.n_orders == nn
    assert row.j_x2 == j2
    assert row.expected_j_x4 == 4 * e_j
    assert row.z2_micros == math.floor(z2_d * 1e6 + 0.5)
    # double close within one micro of the exact Fraction value
    assert abs(row.z2_micros - _half_up(z2_exact.numerator,
                                        z2_exact.denominator)) <= 1
    assert row.trend_sign == (
        1 if Fraction(j2, 2) > e_j else (-1 if Fraction(j2, 2) < e_j else 0)
    )


# --------------------------------------------- multimodal_image_borders


def test_image_borders_python_replay(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
        if len(r.text) > 0
    }
    rows = {
        r.media_id: r
        for r in _q("multimodal_image_borders")(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        w, h = doc_id % 16 + 1, doc_id % 12 + 1
        tb = text.encode("utf-8")
        need = w * h * 3
        raster = (tb * (need // len(tb) + 1))[:need]
        px = [
            [tuple(raster[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]

        def prefix(seq, corner):
            n = 0
            for sl in seq:
                if all(p == corner for p in sl):
                    n += 1
                else:
                    break
            return n

        top = prefix(px, px[0][0])
        bottom = prefix(px[::-1], px[-1][0])
        cols = [[px[r][c] for r in range(h)] for c in range(w)]
        left = prefix(cols, px[0][0])
        right = prefix(cols[::-1], px[0][-1])
        got = rows[doc_id]
        assert (got.w, got.h) == (w, h)
        assert (got.top_rows, got.bottom_rows) == (top, bottom)
        assert (got.left_cols, got.right_cols) == (left, right)
        assert got.has_border == int(top + bottom + left + right > 0)


# ------------------------------------------ events_session_sensitivity


def test_session_sensitivity_monotone_and_replay(spark):
    from multithreaded_map_reduce_spark.functions.time import epoch_micros
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", epoch_micros(F.col("ts")).alias("us"), "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r.user_id, r.us, r.event_id)):
        by_user[r.user_id].append(r.us)
    rows = {
        r.gap_minutes: r
        for r in _q("events_session_sensitivity")(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == [5, 10, 30]
    prev_sessions = None
    for gap in [5, 10, 30]:
        gap_us = gap * 60_000_000
        n_sessions = 0
        bounces = 0
        for times in by_user.values():
            count = 1
            n_in = 1
            sizes = []
            for a, b in zip(times, times[1:]):
                if b - a > gap_us:
                    count += 1
                    sizes.append(n_in)
                    n_in = 1
                else:
                    n_in += 1
            sizes.append(n_in)
            n_sessions += count
            bounces += sum(1 for s in sizes if s == 1)
        got = rows[gap]
        assert got.n_sessions == n_sessions
        assert got.n_bounce == bounces
        assert got.bounce_share_micros == _half_up(bounces, n_sessions)
        assert got.events_per_session_milli == _half_up(
            len(ev), n_sessions, 1000
        )
        # widening the gap can only merge sessions
        if prev_sessions is not None:
            assert n_sessions <= prev_sessions
        prev_sessions = n_sessions
