"""CI grep (VERDICT r10 item 2): every UNPARTITIONED window
(``W.orderBy(...)`` / ``Window.orderBy(...)`` with no ``partitionBy``)
in package source must sit in a whitelisted file with a per-file site
budget and a boundedness argument.

Why: Spark plans an unpartitioned window as a SINGLE-TASK global sort
of its input. That is fine — and sanctioned — when the input relation
is bounded by something other than data volume; it is the one
scale-killer shape left after the r9 persist fix when the input is
row-grain (the r10 verdict's `quality_spearman` finding: correct at
sf0.1, one task sorting the corpus at 100 TB).

The legitimate classes (each budget entry names which apply):

- **value-grain**: the window input is a groupBy on a bounded-domain
  value (distinct lengths/cents/scores) — the `c_less` rank rail of
  quality_mannwhitney / stats_gini / quality_spearman.
- **bucket-grain stitch**: the #buckets-row offset relation of the
  distributed rank rail (operators/ranks.py) — dial-bounded.
- **calendar-grain**: day/version/week relations — bounded by the
  time axis, not row count.
- **post-limit**: a rank/row_number stamp over the survivors of a
  ``.limit(K)`` / TakeOrdered — K rows by construction.
- **k-bounded**: candidate/top-K lists whose size is a query constant
  (retrieval pools, sketch heavy-hitter candidates, neighbor lists).
- **slot-grain**: source/mixture/slot relations (≤ tens of rows).

A NEW unpartitioned window in an unlisted file, or above a file's
budget, fails here and must either move to the distributed rail
(operators/ranks.py), aggregate to value grain first, or be
whitelisted below with its argument.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "multithreaded_map_reduce_spark"

_PAT = re.compile(r"\b(?:W|Window)\.orderBy\(")

# file suffix -> (max unpartitioned-window sites, boundedness argument)
_WINDOW_BUDGET: dict[str, tuple[int, str]] = {
    "operators/ranks.py": (
        1,
        "THE bucket-grain stitch window itself — #buckets rows, "
        "dial-bounded (DEFAULT_BUCKETS)",
    ),
    "operators/kmeans.py": (
        1,
        "k-bounded: init picks over the K-row seed candidate relation",
    ),
    "operators/similarity.py": (
        2,
        "k-bounded: neighbor_id stamps over per-query top-K candidate "
        "lists (ANNP/k dial)",
    ),
    "queries/timeseries.py": (
        16,
        "calendar-grain: day-axis cumulative/row_number windows on "
        "groupBy(day) relations (incl. the runs-test sign walk and "
        "hurst's day-index stamp); the `b` window runs over the "
        "bounded seasonal-block axis; the periodogram dominant-period "
        "rank runs over |PG_PERIODS| = 3 rows / |SE_PERIODS| = 29 rows "
        "(spectral entropy + cumulative periodogram rank/cum/j stamps), "
        "the r13 turning-point lag/lead + Cox-Stuart rank + KPSS "
        "partial-sum windows are all day-axis, and the SES-grid argmin "
        "over |SES_ALPHAS| = 3 rows",
    ),
    "queries/textstats.py": (
        7,
        "post-limit/k-bounded rank stamps (bm25/ql/rake/textrank "
        "top-K pools, pair candidates) + value-grain: the AUC window "
        "(line ~2710) runs on groupBy(score_units) — distinct snapped "
        "scores, the mannwhitney rail",
    ),
    "queries/connectors.py": (
        1,
        "calendar-grain: tx-log version axis (bounded by log length)",
    ),
    "queries/quality.py": (
        9,
        "value-grain c_less rails (spearman rank maps, mannwhitney, "
        "kruskal, wilcoxon — distinct metric values; + the "
        "anderson-darling EDF cumulative, same distinct-cents axis as "
        "ks_test) + calendar-grain day windows + the post-limit "
        "mahalanobis stamp (line ~529)",
    ),
    "queries/mining.py": (
        3,
        "value-grain: the price_cents prefix window runs on distinct "
        "cents (line ~802, the verdict's sanctioned local-then-global "
        "class); two post-TakeOrdered rank stamps (pmi/lift top-K)",
    ),
    "queries/streaming_gate.py": (
        4,
        "calendar-grain: tx-log version axis tail (bounded) + "
        "value-grain: the quantile-router threshold build runs on "
        "distinct purchase cents (the c_less rail) + the CUSUM "
        "partial-sum and running-min pair over the post-sink "
        "groupBy(day) relation (≤ n_days rows)",
    ),
    "queries/graphrank.py": (
        1,
        "post-limit: link-prediction top-K stamp",
    ),
    "queries/curation.py": (
        7,
        "post-limit rank stamps (negative pool, AES-K, DSIR-K "
        "survivors) + slot-grain windows over source/mixture slot "
        "relations (≤ tens of rows)",
    ),
    "queries/events.py": (
        8,
        "calendar-grain: day-axis growth-accounting + KM survival "
        "day-grain suffix/cumulative windows; post-TakeOrdered path "
        "rank stamp; post-limit Hill top-(k+1) order-statistic stamp "
        "(k is a query constant); r13 Nelson-Aalen suffix/cumulative "
        "over the bounded session-duration grain and the peak-"
        "concurrency DAY-GRAIN offset window (the session-grain sweep "
        "itself is day-partitioned)",
    ),
    "queries/similarity.py": (
        3,
        "k-bounded: matryoshka report rung/rank stamp over the "
        "k-bounded eval relation; dim-bounded: the dim-variance rank "
        "runs over the 64-row per-dimension relation and the r13 "
        "covariance-audit rank stamp over its post-limit top-10 rows",
    ),
    "queries/sketches.py": (
        1,
        "k-bounded: Misra-Gries candidate rank (≤ MG_K rows)",
    ),
    "queries/profiling.py": (
        2,
        "post-limit: the CR-k rank stamp over the TakeOrdered top-8 "
        "supplier relation (k is a query constant — the Hill "
        "discipline); r13 weighted-quantile cumulative weights over "
        "the bounded distinct-price domain",
    ),
    "queries/retrieval.py": (
        2,
        "k-bounded: rank stamps over per-query candidate pools",
    ),
}


def _sites(text: str) -> int:
    n = 0
    for m in _PAT.finditer(text):
        # a site is unpartitioned if no partitionBy occurs on the same
        # statement line-window (heuristic: the grep line itself)
        line_start = text.rfind("\n", 0, m.start()) + 1
        line_end = text.find("\n", m.end())
        line = text[line_start : line_end if line_end != -1 else None]
        if "partitionBy" not in line:
            n += 1
    return n


def test_every_unpartitioned_window_is_whitelisted() -> None:
    offenders: list[str] = []
    total = 0
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(PKG.parent).as_posix()
        n = _sites(py.read_text())
        if n == 0:
            continue
        total += n
        suffix = "/".join(rel.split("/")[-2:])
        budget = _WINDOW_BUDGET.get(suffix)
        if budget is None:
            offenders.append(
                f"{rel}: {n} unpartitioned window site(s) in a file "
                "with no whitelist entry — use the distributed rail "
                "(operators/ranks.py), aggregate to value grain "
                "first, or whitelist with a boundedness argument"
            )
        elif n > budget[0]:
            offenders.append(
                f"{rel}: {n} unpartitioned windows > whitelisted "
                f"{budget[0]} ({budget[1]})"
            )
    assert not offenders, "\n".join(offenders)
    # the budget itself must not silently rot: if sites disappear the
    # budget should shrink with them (kept honest within slack 1)
    assert total >= sum(b for b, _ in _WINDOW_BUDGET.values()) - 8


def test_budget_files_exist() -> None:
    for suffix in _WINDOW_BUDGET:
        assert (PKG.parent / "multithreaded_map_reduce_spark" / suffix).exists(), suffix
