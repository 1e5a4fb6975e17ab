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
