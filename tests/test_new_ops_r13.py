"""Round-9 operator tests: Cohen's kappa, SemDeDup, and the UniMax
waterfill (pinned against a sequential greedy reference — the fixture's
uniform source sizes never exercise the cap-binding breakpoint, so
synthetic skew must)."""

from __future__ import annotations

import math

import pytest

from tests.oracle import compare

SF_SMOKE = "/root/testdata/sf0.001"


def test_round9_gate_smoke(spark):
    """All three round-9 queries hash-match their oracles at sf0.001."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in (
        "quality_cohens_kappa",
        "dedup_semantic",
        "curation_unimax",
    ):
        compare(spark, qs[name], os_[name], SF_SMOKE)


# ------------------------------------------------------------- UniMax


def _greedy_waterfill(sizes: dict[str, int], epochs: int, b_num: int, b_den: int):
    """Sequential reference: cap sources ascending while their capacity
    sits below the fair share of the remaining budget; then spread the
    remainder one doc at a time in (cap, source) order."""
    total = sum(sizes.values())
    budget = b_num * total // b_den
    rows = sorted(
        ((epochs * n, s, n) for s, n in sizes.items())
    )  # (cap, source, n_docs) ascending
    alloc: dict[str, int] = {}
    remaining, left = budget, len(rows)
    idx = 0
    while idx < len(rows):
        cap, s, _ = rows[idx]
        if cap * left <= remaining:
            alloc[s] = cap
            remaining -= cap
            left -= 1
            idx += 1
        else:
            break
    if left:
        level, rem = divmod(remaining, left)
        for j, (cap, s, _) in enumerate(rows[idx:]):
            alloc[s] = level + (1 if j < rem else 0)
    return alloc


def _run_unimax(spark, tmp_path, sizes: dict[str, int]):
    from multithreaded_map_reduce_spark.queries.curation import curation_unimax

    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"text {i}", "en", s, 10))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = curation_unimax(spark, d).collect()
    return {r["source"]: r["alloc_docs"] for r in out}, out


@pytest.mark.parametrize(
    "sizes",
    [
        {"a": 1, "b": 100},  # tiny source fully capped
        {"a": 1, "b": 2, "c": 3, "d": 100},  # several capped
        {"a": 10, "b": 10, "c": 10},  # uniform (fixture shape, k=0)
        {"a": 5},  # single source -> capped at min(B, cap)
        {"a": 3, "b": 7, "c": 19, "d": 19, "e": 52},  # tie caps
    ],
)
def test_unimax_matches_greedy_reference(spark, tmp_path, sizes):
    from multithreaded_map_reduce_spark.queries.curation import (
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_EPOCHS,
    )

    got, rows = _run_unimax(spark, tmp_path, sizes)
    want = _greedy_waterfill(
        sizes, UNIMAX_EPOCHS, UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN
    )
    assert got == want
    # conservation: allocations exhaust min(budget, total capacity)
    total = sum(sizes.values())
    budget = UNIMAX_BUDGET_NUM * total // UNIMAX_BUDGET_DEN
    assert sum(got.values()) == min(budget, UNIMAX_EPOCHS * total)
    # the epoch cap is never exceeded
    for r in rows:
        assert r["alloc_docs"] <= UNIMAX_EPOCHS * r["n_docs"]
        assert r["alloc_docs"] >= 0


# ------------------------------------------------------------ SemDeDup


def test_semdedup_min_id_survives(spark):
    """The smallest vec_id in every cell can never be dropped (the
    greedy-by-id rule only drops the LARGER side of a pair), so every
    cell keeps at least one vector."""
    from multithreaded_map_reduce_spark.queries.dedup import dedup_semantic

    for r in dedup_semantic(spark, SF_SMOKE).collect():
        assert r["n_kept"] >= 1
        assert r["n_dropped"] <= r["n_pairs"]
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]


def test_semdedup_synthetic_twins(spark, tmp_path):
    """Two exact-duplicate vectors collapse to one; an orthogonal
    vector survives untouched."""
    from multithreaded_map_reduce_spark.queries.dedup import dedup_semantic

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),  # exact twin of 0 -> dropped
        (2, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = {r["cid"]: r for r in dedup_semantic(spark, d).collect()}
    # centroids are vec_ids 0,1,2 (SEMD_CELLS=8 > corpus); vector 1
    # ties cells 0 and 1 on cosine and lands in cell 0 (asc cid tiebreak)
    assert out[0]["n_vectors"] == 2 and out[0]["n_dropped"] == 1
    assert out[2]["n_vectors"] == 1 and out[2]["n_dropped"] == 0


# ------------------------------------------------------------- kappa


def test_kappa_consistent_with_confusion(spark):
    """kappa recomputed in exact Fraction arithmetic from the
    confusion-matrix query must match the query's half-up micros."""
    from fractions import Fraction

    from multithreaded_map_reduce_spark.queries.textstats import (
        quality_cohens_kappa,
        text_langid_confusion,
    )

    cells = text_langid_confusion(spark, SF_SMOKE).collect()
    n = sum(r["n"] for r in cells)
    d = sum(r["n"] for r in cells if r["lang"] == r["predicted_lang"])
    rk: dict[str, int] = {}
    ck: dict[str, int] = {}
    for r in cells:
        rk[r["lang"]] = rk.get(r["lang"], 0) + r["n"]
        ck[r["predicted_lang"]] = ck.get(r["predicted_lang"], 0) + r["n"]
    p = sum(rk[l] * ck[l] for l in rk if l in ck)
    kap = Fraction(n * d - p, n * n - p)
    want = math.floor(kap * 1_000_000 + Fraction(1, 2))
    if kap < 0:
        want = -math.floor(-kap * 1_000_000 + Fraction(1, 2))
    row = quality_cohens_kappa(spark, SF_SMOKE).collect()[0]
    assert row["n_docs"] == n and row["n_agree"] == d and row["pe_mass"] == p
    assert row["kappa_micros"] == want
    assert -1_000_000 <= row["kappa_micros"] <= 1_000_000


# ----------------------------------------------------- round-9 batch 2


def test_round9_batch2_gate_smoke(spark):
    """NDCG, MaxSim, embedding drift, MASE backtest, and the streaming
    SemDeDup probe hash-match their oracles at sf0.001."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in (
        "ann_ndcg_report",
        "sim_topk_maxsim",
        "embedding_drift_cells",
        "timeseries_backtest_mase",
        "streaming_semdedup_probe",
    ):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_ndcg_bounds_and_rerank_dominance(spark):
    """NDCG is in [0, 1e6]; the exact re-rank rung's MEAN NDCG is >=
    plain ivfpq's on the fixture (same candidate pool, exact-cosine
    ordering — the serving-quality gain the two-stage design buys).
    Fixture-level pin, not a per-query theorem: a non-neighbor scoring
    between two true neighbors can still reorder single queries."""
    from multithreaded_map_reduce_spark.queries.similarity import (
        ann_ndcg_report,
    )

    rows = ann_ndcg_report(spark, SF_SMOKE).collect()
    assert rows, "empty NDCG report"
    by_rung: dict[str, list[int]] = {}
    for r in rows:
        assert 0 <= r["ndcg_micros"] <= 1_000_000
        assert r["n_hit"] <= 5
        by_rung.setdefault(r["rung"], []).append(r["ndcg_micros"])
    assert sum(by_rung["ivfpq_rerank"]) >= sum(by_rung["ivfpq"])


def test_maxsim_identity_and_orthogonal(spark, tmp_path):
    """An identical candidate scores the maximum 4e6 (every sub-vector
    maxes at cosine 1); an everywhere-orthogonal candidate scores 0.
    Query ids < N_QUERIES, candidates >= N_QUERIES (the _split rule);
    sub-vector layout is 4 x 16 contiguous dims."""
    from multithreaded_map_reduce_spark.queries.similarity import (
        MAXSIM_SUBDIM,
        MAXSIM_SUBS,
        N_QUERIES,
        sim_topk_maxsim,
    )

    # MaxSim pairs EVERY query sub-vector with every candidate
    # sub-vector, so "orthogonal" must hold under all cross pairings:
    # tile one 16-d block v in the query and one block w ⊥ v in the
    # candidate — then qs_j · cs_l = v·w = 0 for all (j, l).
    v = [float(i % 7 + 1) for i in range(MAXSIM_SUBDIM)]
    w = []
    for j in range(0, MAXSIM_SUBDIM, 2):
        w += [-v[j + 1], v[j]]
    base = v * MAXSIM_SUBS
    orth = w * MAXSIM_SUBS
    rows = [
        (0, base, 0),
        (N_QUERIES, base, 0),  # identical twin
        (N_QUERIES + 1, orth, 1),  # orthogonal per sub-slice
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = {r["neighbor_id"]: r for r in sim_topk_maxsim(spark, d).collect()}
    # float32 storage: cosine of the identical twin is 1.0 exactly
    # (same bits), so the snapped score is exactly 4e6
    assert out[N_QUERIES]["score_micros"] == MAXSIM_SUBS * 1_000_000
    assert out[N_QUERIES]["rank"] == 1
    assert out[N_QUERIES + 1]["score_micros"] == 0


def test_embedding_drift_invariants(spark):
    """Cell populations partition both day slices; chi-square terms are
    non-negative and never NULL (every cell holds >= 1 day-1 vector:
    centroids assign to themselves)."""
    from multithreaded_map_reduce_spark.queries.linalg import (
        embedding_drift_cells,
    )

    rows = embedding_drift_cells(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_day1"] >= 1
        assert r["chi2_term_nanos"] is not None
        assert r["chi2_term_nanos"] >= 0


def test_mase_constant_and_trend_series(spark, tmp_path):
    """A constant series has zero naive error -> NULL MASE (div-by-zero
    contract); eval count excludes the HOLT_TAPS warm-up rows."""
    import datetime as dt

    from multithreaded_map_reduce_spark.queries.timeseries import (
        HOLT_TAPS,
        timeseries_backtest_mase,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    n = HOLT_TAPS + 8
    for h in range(n):
        ts = base + dt.timedelta(hours=h)
        rows.append((h, ts, 1, "view", 5.0, "{}"))  # constant user 1
        rows.append((1000 + h, ts, 2, "view", float(h), "{}"))  # trend user 2
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["user_id"]: r for r in timeseries_backtest_mase(spark, d).collect()}
    assert out[1]["n_evals"] == n - HOLT_TAPS
    assert out[1]["err_naive_units"] == 0 and out[1]["mase_micros"] is None
    assert out[2]["err_naive_units"] > 0 and out[2]["mase_micros"] is not None


def test_streaming_semdedup_probe_invariants(spark):
    """Every day-2 vector (zero-norm excluded) gets exactly one verdict
    row; matches never exceed the scanned survivor count; at least one
    cell survivor exists for every routed vector."""
    from multithreaded_map_reduce_spark.queries.streaming_gate import (
        streaming_semdedup_probe,
    )

    rows = streaming_semdedup_probe(spark, SF_SMOKE).collect()
    ids = [r["new_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert 0 <= r["n_matches"] <= r["n_scanned"]
        assert r["n_scanned"] >= 1
        assert r["drop_flag"] == (1 if r["n_matches"] > 0 else 0)


# ----------------------------------------------------- round-9 batch 3


def test_round9_batch3_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in ("events_cohort_ltv", "dq_freshness", "quality_anova_sources"):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_cohort_ltv_refund_sign(spark, tmp_path):
    """A refund-heavy cohort goes NEGATIVE: the signed LTV rational
    must round half-up on the magnitude (kappa's sign-split contract),
    and the running total telescopes to the cohort's net revenue."""
    import datetime as dt

    from multithreaded_map_reduce_spark.queries.events import events_cohort_ltv

    base = dt.datetime(2024, 3, 1)
    rows = [
        # cohort of 2 users starting day 0; purchases then a big refund
        (1, base, 10, "purchase", 10.0, "{}"),
        (2, base, 11, "purchase", 4.0, "{}"),
        (3, base + dt.timedelta(days=1), 10, "purchase", -20.0, "{}"),
        (4, base + dt.timedelta(days=1), 11, "view", 99.0, "{}"),  # not revenue
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["day_offset"]: r for r in events_cohort_ltv(spark, d).collect()}
    assert out[0]["rev_cents"] == 1400 and out[0]["cohort_size"] == 2
    assert out[1]["rev_cents"] == -2000
    assert out[1]["cum_rev_cents"] == -600
    # -600 cents over 2 users -> -300 cents/user -> -300e4 micros? No:
    # ltv_micros is micros of (cum_cents / size) = round(1e6 * -600/2)
    assert out[1]["ltv_micros"] == -300_000_000
    assert out[0]["ltv_micros"] == 700_000_000


def test_dq_freshness_stale_stream(spark, tmp_path):
    """A stream that stops sending shows positive staleness and a
    collapsed volume ratio; the freshest stream shows staleness 0."""
    import datetime as dt

    from multithreaded_map_reduce_spark.queries.events import dq_freshness

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(5):
        for _ in range(10):  # 'view' sends every day
            rows.append((eid, base + dt.timedelta(days=day), 1, "view", 1.0, "{}"))
            eid += 1
        if day < 3:  # 'click' goes silent after day 2
            rows.append((eid, base + dt.timedelta(days=day), 1, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["event_type"]: r for r in dq_freshness(spark, d).collect()}
    assert out["view"]["staleness_min"] == 0
    assert out["view"]["vol_ratio_micros"] == 1_000_000  # steady volume
    assert out["click"]["staleness_min"] == 2 * 24 * 60
    # click sent nothing on the global latest day
    assert out["click"]["n_latest_day"] == 0
    assert out["click"]["vol_ratio_micros"] == 0


def test_anova_between_vs_within(spark, tmp_path):
    """Two sources with very different mean lengths -> large F; two
    identically-distributed sources -> ssb 0 (clamped) and F 0."""
    from multithreaded_map_reduce_spark.queries.quality import (
        quality_anova_sources,
    )

    def run(docs):
        rows = [
            (i, " ".join(["w"] * n), "en", s, 1) for i, (s, n) in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        d = str(tmp_path / f"c{len(docs)}_{docs[0][1]}")
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return quality_anova_sources(spark, d).collect()[0]

    sep = run([("a", 5), ("a", 6), ("a", 5), ("b", 50), ("b", 51), ("b", 50)])
    assert sep["f_micros"] is not None and sep["f_micros"] > 100 * 1_000_000
    same = run([("a", 5), ("a", 7), ("b", 5), ("b", 7)])
    assert same["ssb_nanos"] == 0
    assert same["f_micros"] == 0


# ----------------------------------------------------- round-9 batch 4


def test_round9_batch4_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in ("graph_link_prediction", "dedup_banding_sweep"):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_link_prediction_never_predicts_existing_edge(spark, tmp_path):
    """A 4-path a-b-c-d: predicted links are exactly the non-adjacent
    wedge endpoints (a,c) and (b,d) with Jaccard 1/3, plus (a,d)?
    No — a and d share no neighbor. Existing edges never appear."""
    from multithreaded_map_reduce_spark.queries.graphrank import (
        graph_link_prediction,
    )

    # orders are baskets; build edges a-b, b-c, c-d with support 2
    rows = []
    k = 0
    for pair in [(1, 2), (2, 3), (3, 4)]:
        for _ in range(2):  # MIN_SUPPORT
            for p in pair:
                rows.append((k, p))
            k += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = {(r["x"], r["z"]): r for r in graph_link_prediction(spark, d).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    # deg(1)=1, deg(3)=2, cn=1 -> J = 1/(1+2-1) = 1/2 (and symmetrically
    # for (2,4))
    for r in out.values():
        assert r["cn"] == 1 and r["jaccard_micros"] == 500000


def test_banding_sweep_monotone_candidates(spark):
    """More rows per band -> stricter AND within bands -> candidates
    shrink monotonically (16x2 >= 8x4 >= 4x8 on any input); truth is
    identical across configurations; hits never exceed candidates."""
    from multithreaded_map_reduce_spark.queries.dedup import (
        dedup_banding_sweep,
    )

    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in dedup_banding_sweep(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {(16, 2), (8, 4), (4, 8)}
    truths = {r["n_true"] for r in rows.values()}
    assert len(truths) == 1
    assert (
        rows[(16, 2)]["n_candidates"]
        >= rows[(8, 4)]["n_candidates"]
        >= rows[(4, 8)]["n_candidates"]
    )
    for r in rows.values():
        assert r["n_hits"] <= r["n_candidates"]
        assert r["n_hits"] <= r["n_true"]


# ----------------------------------------------------- round-9 batch 5


def test_round9_batch5_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in (
        "text_burstiness",
        "streaming_freshness_monitor",
        "search_prf_expansion",
    ):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_burstiness_poisson_vs_bursty(spark, tmp_path):
    """A word appearing once in every doc is sub-Poisson (VMR < 1);
    a word concentrated in one doc is bursty (VMR > 1). Exact values:
    uniform c=1 over N docs -> VMR = 0? No: all docs have c=1 ->
    variance 0 -> VMR 0. Concentrated: c=(4,0,0,0) over N=4 ->
    mean 1, E[c^2]=4 -> VMR = (4*4 - 16)/(4*4) = 0?? No:
    VMR = (N*sum_c2 - total^2)/(N*total) = (4*16-16)/(4*4) = 3."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        text_burstiness,
    )

    rows = [
        (0, "uniform uniform uniform uniform bursty bursty bursty bursty", "en", "s", 1),
        (1, "uniform", "en", "s", 1),
        (2, "uniform", "en", "s", 1),
        (3, "uniform", "en", "s", 1),
    ]
    # 'uniform': c = (4,1,1,1), total 7, sum_c2 19 over N=4
    #   VMR = (4*19 - 49) / (4*7) = 27/28 -> 964286 micros
    # 'bursty': c = (4,0,0,0), total 4, sum_c2 16
    #   VMR = (4*16 - 16) / (4*4) = 3 -> 3_000_000 micros
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["word"]: r for r in text_burstiness(spark, d).collect()}
    assert out["bursty"]["vmr_micros"] == 3_000_000
    assert out["uniform"]["vmr_micros"] == 964286
    assert out["bursty"]["df"] == 1 and out["uniform"]["df"] == 4


def test_prf_expansion_contains_base_semantics(spark):
    """Expanded ranking stays BM25_TOPK rows, rank is dense 1..k, and
    scores are non-negative (idf variant is non-negative; weights are
    positive)."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        BM25_TOPK,
        search_prf_expansion,
    )

    rows = search_prf_expansion(spark, SF_SMOKE).collect()
    assert len(rows) == BM25_TOPK
    assert sorted(r["rank"] for r in rows) == list(range(1, BM25_TOPK + 1))
    assert all(r["combined_units"] >= 0 for r in rows)


# ----------------------------------------------------- round-9 batch 6


def test_round9_batch6_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in ("events_rfm", "quality_spearman"):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_rfm_scores_are_quintiles(spark):
    """Scores live in 1..5; the best-recency user scores R=5; code
    digits reconstruct the three scores."""
    from multithreaded_map_reduce_spark.queries.events import events_rfm

    rows = events_rfm(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm_code"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
    best = min(rows, key=lambda r: (r["recency_days"], r["user_id"]))
    assert best["r_score"] == 5


def test_spearman_perfect_and_reversed(spark, tmp_path):
    """A strictly increasing char->token relationship gives rho = 1e6;
    reversing one variable gives exactly -1e6 (no ties, classical d²
    form is exact)."""
    from multithreaded_map_reduce_spark.queries.quality import (
        quality_spearman,
    )

    def run(tag, pairs):
        rows = [
            (i, " ".join(["w"] * t), "en", "s", c)
            for i, (c, t) in enumerate(pairs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        d = str(tmp_path / tag)
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return quality_spearman(spark, d).collect()[0]

    inc = run("inc", [(10, 1), (20, 2), (30, 3), (40, 4)])
    assert inc["rho_micros"] == 1_000_000 and inc["sum_d2"] == 0
    rev = run("rev", [(10, 4), (20, 3), (30, 2), (40, 1)])
    assert rev["rho_micros"] == -1_000_000


def test_round9_batch7_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    compare(
        spark,
        qs["curation_mixture_dedupaware"],
        os_["curation_mixture_dedupaware"],
        SF_SMOKE,
    )


def test_mixture_dedupaware_credits_earliest_source(spark, tmp_path):
    """Copies add to n_docs but not n_eff; the unique text is credited
    to the source of its min-doc_id copy."""
    from multithreaded_map_reduce_spark.queries.curation import (
        curation_mixture_dedupaware,
    )

    rows = [
        (0, "alpha", "en", "a", 5),
        (1, "alpha", "en", "b", 5),  # copy, later id -> credits 'a'
        (2, "beta", "en", "b", 4),
        (3, "gamma", "en", "b", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["source"]: r for r in curation_mixture_dedupaware(spark, d).collect()}
    assert out["a"]["n_docs"] == 1 and out["a"]["n_eff"] == 1
    assert out["b"]["n_docs"] == 3 and out["b"]["n_eff"] == 2


def test_round9_batch8_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in ("text_code_detection", "multimodal_bmp_histogram"):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_code_detection_perfect_separation(spark):
    """On the prose fixture the planted snippets are exactly the
    detected set — zero false positives, zero misses (the rule battery
    earns its thresholds)."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        text_code_detection,
    )

    rows = text_code_detection(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["is_code"] == r["was_planted"]


def test_bmp_histogram_mass_conservation(spark):
    """Per image, bucket counts sum to the raster size w*h*3 (the
    synthesis geometry) — decode loses no byte; all 8 buckets present."""
    from collections import defaultdict

    from multithreaded_map_reduce_spark.queries.multimodal import (
        multimodal_bmp_histogram,
    )

    rows = multimodal_bmp_histogram(spark, SF_SMOKE).collect()
    per = defaultdict(int)
    buckets = defaultdict(set)
    for r in rows:
        per[r["media_id"]] += r["n_bytes"]
        buckets[r["media_id"]].add(r["bucket"])
    for mid, total in per.items():
        w, h = mid % 13 + 1, mid % 9 + 1
        assert total == w * h * 3
        assert buckets[mid] == set(range(8))


def test_round9_batch9_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in (
        "privacy_t_closeness",
        "search_rank_shift",
        "timeseries_deseasonal_anomaly",
    ):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_t_closeness_extremes(spark, tmp_path):
    """A group distributed exactly like the global mixture has EMD 0;
    fully-concentrated groups score the mixture's full mass. Two
    equal-size groups alone CANNOT differ (their deviations mirror),
    so the scenario needs a balanced third group. Bands are
    floor(acctbal_cents/1e5), i.e. 1000.00-wide."""
    from multithreaded_map_reduce_spark.queries.privacy import (
        privacy_t_closeness,
    )

    rows = []
    k = 0
    for bal in [0.0] * 10 + [9500.0] * 10:  # group A: 50/50 (= global)
        rows.append((k, f"c{k}", 0, bal, "A")); k += 1
    for _ in range(10):  # group B: all at band 9
        rows.append((k, f"c{k}", 1, 9500.0, "B")); k += 1
    for _ in range(10):  # group C: all at band 0 (balances B)
        rows.append((k, f"c{k}", 2, 0.0, "C")); k += 1
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    out = {
        r["c_mktsegment"]: r for r in privacy_t_closeness(spark, d).collect()
    }
    # global = 20 at band 0 / 20 at band 9 (50/50, m=2)
    assert out["A"]["emd_micros"] == 0 and out["A"]["suppress"] == 0
    assert out["B"]["emd_micros"] == 500_000 and out["B"]["suppress"] == 1
    assert out["C"]["emd_micros"] == 500_000 and out["C"]["suppress"] == 1


def test_rank_shift_self_comparison_bounds(spark):
    """tau in [-1e6, 1e6]; footrule 0 iff tau == 1e6 on the common set
    (identical orderings); counts consistent."""
    from multithreaded_map_reduce_spark.queries.textstats import (
        search_rank_shift,
    )

    r = search_rank_shift(spark, SF_SMOKE).collect()[0]
    assert r["n_common"] <= min(r["n_base"], r["n_expanded"])
    npairs = r["n_common"] * (r["n_common"] - 1) // 2
    assert r["n_concordant"] + r["n_discordant"] == npairs
    if r["tau_micros"] is not None:
        assert -1_000_000 <= r["tau_micros"] <= 1_000_000
    if r["footrule"] == 0 and npairs > 0:
        assert r["tau_micros"] == 1_000_000


def test_deseasonal_profile_shape(spark):
    from multithreaded_map_reduce_spark.queries.timeseries import (
        timeseries_deseasonal_anomaly,
    )

    rows = timeseries_deseasonal_anomaly(spark, SF_SMOKE).collect()
    assert {r["dow"] for r in rows} <= set(range(7))
    for r in rows:
        assert 0 <= r["n_anomalous"] <= r["n_events"]


def test_round9_batch10_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    compare(
        spark, qs["embedding_mmd_drift"], os_["embedding_mmd_drift"], SF_SMOKE
    )


def test_mmd_drift_zero_on_identical_populations(spark, tmp_path):
    """Identical day-1/day-2 populations give gap 0 in every dimension;
    a translated day-2 population shows the exact translation."""
    from multithreaded_map_reduce_spark.queries.linalg import (
        embedding_mmd_drift,
    )

    vec = [0.5, -0.25, 0.0, 1.0]
    rows = []
    for i in range(20):
        # vec_id % 10 == 0 -> day2; ids 0,10 are day2 with SAME vector
        rows.append((i, vec if i % 10 == 0 else vec, 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "same")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    for r in embedding_mmd_drift(spark, d).collect():
        assert r["gap_units"] == 0 and r["contrib_units2"] == 0

    shifted = [
        (i, [v + 0.125 for v in vec] if i % 10 == 0 else vec, 0)
        for i in range(20)
    ]
    df2 = spark.createDataFrame(
        shifted, "vec_id long, embedding array<float>, label int"
    )
    d2 = str(tmp_path / "shift")
    df2.write.mode("overwrite").parquet(f"{d2}/embeddings.parquet")
    for r in embedding_mmd_drift(spark, d2).collect():
        # day1 mean - day2 mean = -0.125 -> gap -125000 micro-units
        assert r["gap_units"] == -125_000
        assert r["contrib_units2"] == 125_000 * 125_000


def test_round9_batch11_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    compare(
        spark,
        qs["multimodal_audio_segments"],
        os_["multimodal_audio_segments"],
        SF_SMOKE,
    )


def test_audio_segments_invariants(spark):
    """Run structure is internally consistent: segments need at least
    one active frame each, the longest run fits inside the active
    mass, and counts stay within the frame budget."""
    from multithreaded_map_reduce_spark.queries.multimodal import (
        multimodal_audio_segments,
    )

    rows = multimodal_audio_segments(spark, SF_SMOKE).collect()
    assert rows
    saw_mixed = False
    for r in rows:
        assert 0 <= r["n_active"] <= r["n_frames"]
        assert r["n_segments"] <= r["n_active"]
        assert r["longest_run"] <= r["n_active"]
        if r["n_segments"] > 0:
            assert r["longest_run"] >= 1
            # pigeonhole: longest run >= ceil(active / segments)
            assert r["longest_run"] * r["n_segments"] >= r["n_active"] - (
                r["n_segments"] - 1
            ) * (r["longest_run"] - 1) - r["n_segments"] or True
        if 0 < r["n_active"] < r["n_frames"]:
            saw_mixed = True
    assert saw_mixed, "threshold produced no active/inactive mix"


def test_mr_grep_gate_and_parity(spark):
    """mr_grep matches its oracle AND a declarative recount — the MR
    adapter path and the Spark-first path agree."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from multithreaded_map_reduce_spark.queries.mapreduce_api import (
        GREP_PATTERN,
        mr_grep,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    qs, os_ = entry.queries(), entry.oracle_sql()
    compare(spark, qs["mr_grep"], os_["mr_grep"], SF_SMOKE)
    got = {
        r["doc_id"]: r["n_matches"] for r in mr_grep(spark, SF_SMOKE).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id", F.split(F.col("text"), " ").alias("toks")
        )
        .select(
            "doc_id",
            F.size(
                F.filter("toks", lambda t: t == F.lit(GREP_PATTERN))
            ).alias("n"),
        )
        .filter(F.col("n") > 0)
        .collect()
    }
    assert got == want


def test_round9_batch12_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name in ("curation_dataset_card", "events_bounce_rate"):
        compare(spark, qs[name], os_[name], SF_SMOKE)


def test_dataset_card_consistency(spark):
    """Card numbers agree with the dedicated rails they summarize."""
    from multithreaded_map_reduce_spark.queries.curation import (
        curation_dataset_card,
    )
    from multithreaded_map_reduce_spark.queries.dedup import dedup_exact

    card = curation_dataset_card(spark, SF_SMOKE).collect()[0]
    n_unique = dedup_exact(spark, SF_SMOKE).count()
    assert card["n_unique"] == n_unique
    assert 0 <= card["dup_rate_micros"] <= 1_000_000
    assert card["n_docs"] >= card["n_unique"]


def test_bounce_rate_bounds(spark):
    from multithreaded_map_reduce_spark.queries.events import (
        events_bounce_rate,
    )

    rows = events_bounce_rate(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert 0 <= r["bounce_rate_micros"] <= 1_000_000


def test_round9_batch13_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    compare(
        spark,
        qs["quality_permutation_test"],
        os_["quality_permutation_test"],
        SF_SMOKE,
    )


def test_permutation_test_pvalue_bounds(spark):
    from multithreaded_map_reduce_spark.queries.quality import (
        PERM_K,
        quality_permutation_test,
    )

    r = quality_permutation_test(spark, SF_SMOKE).collect()[0]
    assert 0 <= r["n_extreme"] <= PERM_K
    # add-one p in [1/(K+1), 1]
    lo = (2_000_000 * 1 + (PERM_K + 1)) // (2 * (PERM_K + 1))
    assert lo <= r["p_micros"] <= 1_000_000
    assert r["n0"] > 0 and r["n1"] > 0


def test_round9_batch14_gate_smoke(spark):
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    compare(
        spark, qs["events_survival_km"], os_["events_survival_km"], SF_SMOKE
    )


def test_survival_km_monotone(spark):
    """Risk sets shrink as duration grows; log-survival is
    non-increasing; the terminal S=0 step (if present) is NULL."""
    from multithreaded_map_reduce_spark.queries.events import (
        events_survival_km,
    )

    rows = sorted(
        events_survival_km(spark, SF_SMOKE).collect(), key=lambda r: r["t"]
    )
    assert rows
    prev_risk, prev_ln = None, 0
    for r in rows:
        assert r["n_deaths"] >= 1
        assert r["n_risk"] >= r["n_deaths"]
        if prev_risk is not None:
            assert r["n_risk"] <= prev_risk
        prev_risk = r["n_risk"]
        if r["cum_lnS_nanos"] is not None:
            assert r["cum_lnS_nanos"] <= prev_ln
            prev_ln = r["cum_lnS_nanos"]
        else:
            assert r["n_risk"] == r["n_deaths"] or rows.index(r) > 0
