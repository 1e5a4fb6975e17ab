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
        "cogroup_user_activity_sums",
        "interval_shipping",
        "text_gopher_repetition",
        "curation_token_budget",
    ):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_ngram_novelty_semantics(spark):
    """doc 1 introduces everything (novelty 1); doc 2 repeats doc 1
    verbatim (novelty 0); doc 3 is all-new (novelty 1); doc 4 mixes
    half old / half new bigrams."""
    import tempfile

    from multithreaded_map_reduce_spark.queries.textstats import (
        text_ngram_novelty,
    )

    rows = [
        (1, "a b c d", "en", "s", 7),
        (2, "a b c d", "en", "s", 7),
        (3, "x y z w", "en", "s", 7),
        (4, "a b q r", "en", "s", 7),  # bigrams: ab(old) bq(new) qr(new)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r for r in text_ngram_novelty(spark, d).collect()
        }
    assert out[1]["n_novel"] == 3 and out[1]["novelty_micros"] == 1_000_000
    assert out[2]["n_novel"] == 0 and out[2]["novelty_micros"] == 0
    assert out[3]["novelty_micros"] == 1_000_000
    assert out[4]["n_distinct"] == 3 and out[4]["n_novel"] == 2
    assert out[4]["novelty_micros"] == 666_667  # round(2/3 * 1e6) half-up


def test_doremi_mass_moves_to_hard_domains(spark):
    """EG with frozen losses must move mass toward above-average-loss
    domains monotonically in iterations: the argmax-loss source ends
    above uniform, the argmin below; weights stay a distribution."""
    from multithreaded_map_reduce_spark.queries.curation import (
        curation_doremi_weights,
    )

    rows = curation_doremi_weights(spark, SF_SMOKE).collect()
    k = len(rows)
    total = sum(r["weight_nanos"] for r in rows)
    assert abs(total - 1_000_000_000) <= k  # rounding slack only
    hi = max(rows, key=lambda r: r["loss_micros"])
    lo = min(rows, key=lambda r: r["loss_micros"])
    uniform = 1_000_000_000 // k
    assert hi["loss_micros"] > lo["loss_micros"]  # fixture has spread
    assert hi["weight_nanos"] > uniform > lo["weight_nanos"]


def test_lsh_recall_gate_and_bounds(spark):
    from multithreaded_map_reduce_spark.queries.dedup import (
        ORACLES,
        QUERIES,
    )

    compare(spark, QUERIES["dedup_lsh_recall"], ORACLES["dedup_lsh_recall"], SF_SMOKE)
    r = QUERIES["dedup_lsh_recall"](spark, SF_SMOKE).collect()[0]
    assert 0 <= r["n_hits"] <= r["n_true"]
    assert r["n_hits"] <= r["n_candidates"]
    if r["n_true"]:
        assert r["recall_micros"] == round(
            1_000_000 * r["n_hits"] / r["n_true"]
        )


def test_encoding_quality_semantics(spark):
    """Planted mojibake/replacement chars are found; clean docs keep."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["text_encoding_quality"],
        ORACLES["text_encoding_quality"],
        SF_SMOKE,
    )
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_encoding_quality"](spark, SF_SMOKE).collect()
    }
    assert rows[0]["n_mojibake"] == 1 and rows[0]["n_replacement"] == 1
    assert rows[7]["n_mojibake"] == 1 and rows[7]["keep"] == 0
    assert rows[11]["n_replacement"] == 1 and rows[11]["keep"] == 0
    assert rows[1]["keep"] == 1 and rows[1]["n_mojibake"] == 0


def test_streaming_novelty_probe_gate(spark):
    from multithreaded_map_reduce_spark.queries.streaming_gate import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["streaming_novelty_probe"],
        ORACLES["streaming_novelty_probe"],
        SF_SMOKE,
    )
    rows = QUERIES["streaming_novelty_probe"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["new_id"] % 10 == 0  # day-2 slice only
        assert 0 <= r["n_novel"] <= r["n_grams"]


def test_minhash_accuracy_bounds(spark):
    """Estimator error is a probability-difference in micros: bounded
    by 1e6, mean <= max, and the expected-order sanity that mean error
    stays under 3 sigma of the 32-permutation estimator (~0.27)."""
    from multithreaded_map_reduce_spark.queries.dedup import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["dedup_minhash_accuracy"],
        ORACLES["dedup_minhash_accuracy"],
        SF_SMOKE,
    )
    r = QUERIES["dedup_minhash_accuracy"](spark, SF_SMOKE).collect()[0]
    assert r["n_pairs"] > 0
    assert 0 <= r["mean_abs_err_micros"] <= r["max_abs_err_micros"] <= 1_000_000
    assert r["mean_abs_err_micros"] < 270_000


def test_streaming_ann_probe_gate_and_shape(spark):
    from multithreaded_map_reduce_spark.queries.similarity import ANNP_K
    from multithreaded_map_reduce_spark.queries.streaming_gate import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["streaming_ann_probe"],
        ORACLES["streaming_ann_probe"],
        SF_SMOKE,
    )
    rows = QUERIES["streaming_ann_probe"](spark, SF_SMOKE).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["query_id"] % 10 == 0  # day-2 slice only
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= ANNP_K
        sims = [x["cos_sim"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_textrank_keywords(spark):
    """Rank mass sums to ~SCALE over the graph, keywords are distinct,
    and the #1 keyword is a high-frequency token (TextRank on a
    near-complete co-occurrence graph correlates with degree)."""
    from multithreaded_map_reduce_spark.queries.graphrank import (
        ORACLES,
        QUERIES,
        TR_TOPK,
    )

    compare(
        spark,
        QUERIES["text_textrank_keywords"],
        ORACLES["text_textrank_keywords"],
        SF_SMOKE,
    )
    rows = QUERIES["text_textrank_keywords"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= TR_TOPK
    kws = [r["keyword"] for r in rows]
    assert len(set(kws)) == len(kws)
    units = [r["rank_units"] for r in rows]
    assert units == sorted(units, reverse=True)


def test_doremi_draw_invariants(spark):
    """Draw counts respect quotas, quotas clamp at population, and the
    drawn total is within rounding slack of the 30% budget whenever no
    source clamps."""
    from multithreaded_map_reduce_spark.queries.curation import (
        DOREMI_BUDGET_PCT,
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["curation_doremi_draw"],
        ORACLES["curation_doremi_draw"],
        SF_SMOKE,
    )
    rows = QUERIES["curation_doremi_draw"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_drawn"] == min(r["quota"], r["n_docs"])
    n_total = sum(r["n_docs"] for r in rows)
    budget = n_total * DOREMI_BUDGET_PCT // 100
    if all(r["quota"] <= r["n_docs"] for r in rows):
        drawn = sum(r["n_drawn"] for r in rows)
        assert budget - len(rows) <= drawn <= budget


def test_novelty_by_source_consistency(spark):
    """Source rollup must re-aggregate the per-doc novelty exactly."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["text_novelty_by_source"],
        ORACLES["text_novelty_by_source"],
        SF_SMOKE,
    )
    per_doc = QUERIES["text_ngram_novelty"](spark, SF_SMOKE).collect()
    by_src = QUERIES["text_novelty_by_source"](spark, SF_SMOKE).collect()
    assert sum(r["n_grams_novel"] for r in by_src) == sum(
        r["n_novel"] for r in per_doc
    )


def test_srm_check(spark):
    """Gate + invariants: a hash split is ~50/50 so the fixture must
    NOT flag; chi2 formula cross-checked in Python exact ints."""
    from multithreaded_map_reduce_spark.queries.quality import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark, QUERIES["quality_srm_check"], ORACLES["quality_srm_check"], SF_SMOKE
    )
    r = QUERIES["quality_srm_check"](spark, SF_SMOKE).collect()[0]
    n0, n1 = r["n0"], r["n1"]
    expected = (2 * 1_000_000 * (n0 - n1) ** 2 + (n0 + n1)) // (2 * (n0 + n1))
    assert r["chi2_micros"] == expected
    assert r["srm_flag"] == 0  # an honest hash split must not trip SRM


def test_audio_fingerprint_gain_invariance(spark):
    """The delta-sign fingerprint must be invariant to a constant gain
    offset on the PCM (the property that makes it a fingerprint):
    Python-model check against the operator's own numpy path."""
    import numpy as np

    from multithreaded_map_reduce_spark.queries.multimodal import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["multimodal_audio_fingerprint"],
        ORACLES["multimodal_audio_fingerprint"],
        SF_SMOKE,
    )

    def fp(arr, frame=8, bits=32):
        nf = len(arr) // frame
        e = arr[: nf * frame].reshape(nf, frame).astype("int64").sum(axis=1)
        out = 0
        for t in range(min(bits, nf - 1)):
            if e[t + 1] > e[t]:
                out |= 1 << t
        return out

    rng = np.arange(200) * 37 % 199  # deterministic pseudo-PCM
    base = (rng % 200).astype("int64")
    assert fp(base) == fp(base + 50)  # constant gain offset cancels


def test_langid_confusion_mass(spark):
    """Cell mass per true lang sums to n_true; the diagonal carries
    exact half-up recall rationals."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["text_langid_confusion"],
        ORACLES["text_langid_confusion"],
        SF_SMOKE,
    )
    rows = QUERIES["text_langid_confusion"](spark, SF_SMOKE).collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r["lang"], []).append(r)
    for lang, rs in by_true.items():
        assert sum(r["n"] for r in rs) == rs[0]["n_true"]
        diag = [r for r in rs if r["predicted_lang"] == lang]
        if diag:
            r = diag[0]
            # exact half-up rational — the eval reports the truth, it
            # does not promise the heuristic is good (on this synthetic
            # shared-vocabulary fixture recall is genuinely low for
            # non-dominant langs; that IS the measured number)
            expected = (2_000_000 * r["n"] + r["n_true"]) // (2 * r["n_true"])
            assert r["recall_micros"] == expected


def test_audio_fp_neardup_gate(spark):
    from multithreaded_map_reduce_spark.queries.multimodal import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["multimodal_audio_fp_neardup"],
        ORACLES["multimodal_audio_fp_neardup"],
        SF_SMOKE,
    )
    for r in QUERIES["multimodal_audio_fp_neardup"](spark, SF_SMOKE).collect():
        assert r["n_matches"] >= 2


def test_dau_wau_invariants(spark):
    """DAU <= WAU always; stickiness = exact half-up rational; a day's
    WAU >= max DAU over its trailing week (coverage is a superset)."""
    from multithreaded_map_reduce_spark.queries.events import (
        ORACLES,
        QUERIES,
    )

    compare(spark, QUERIES["events_dau_wau"], ORACLES["events_dau_wau"], SF_SMOKE)
    rows = QUERIES["events_dau_wau"](spark, SF_SMOKE).collect()
    assert rows
    dau_by_day = {r["day"]: r["dau"] for r in rows}
    for r in rows:
        assert r["dau"] <= r["wau"]
        expected = (2_000_000 * r["dau"] + r["wau"]) // (2 * r["wau"])
        assert r["stickiness_micros"] == expected
        week_max = max(
            (dau_by_day.get(r["day"] - k, 0) for k in range(7)), default=0
        )
        assert r["wau"] >= week_max


def test_mad_anomaly_integer_exactness(spark):
    """med2/mad4 are exactly 2x/4x the true medians (doubled-median
    interpolation trick) — cross-checked in Python on one day's data."""
    import statistics

    from multithreaded_map_reduce_spark.queries.timeseries import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["timeseries_mad_anomaly"],
        ORACLES["timeseries_mad_anomaly"],
        SF_SMOKE,
    )
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        "SELECT epoch_us(ts) // 86400000000 AS day,"
        " CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v"
        f" FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    by_day = {}
    for day, v in rows:
        by_day.setdefault(day, []).append(v)
    out = {
        r["day"]: r
        for r in QUERIES["timeseries_mad_anomaly"](spark, SF_SMOKE).collect()
    }
    day, vs = next(iter(sorted(by_day.items())))
    med = statistics.median(vs)
    mad = statistics.median([abs(v - med) for v in vs])
    assert out[day]["med2_cents"] == int(2 * med)
    assert out[day]["mad4_cents"] == int(4 * mad)
    assert out[day]["n_anomalous"] == sum(
        1 for v in vs if abs(v - med) > 3 * mad
    )
