"""CI grep (VERDICT r9 item 1): every ``.persist(`` in package source
must be RELEASED (a paired ``unpersist`` in the same file, the
finalize-then-release pattern) or consciously whitelisted here with a
sharing/boundedness argument.

Why this is a correctness-of-method contract, not just hygiene: a
leaked persisted relation registers in Spark's CacheManager for the
rest of the session, and the CacheManager silently SUBSTITUTES a live
cache into any later query whose logical plan matches — which makes
physical plans a function of *which queries ran earlier*, not of
code+data. Round 9's driver bench caught exactly that: the builder's
bench and the driver's bench executed different plans for
``dedup_containment`` from identical code (1.32× apart) because their
run orders left different caches alive. The repo's whole plan-hash
regression triage ("plan-same = noise, plan-changed = real") is
unsound under that substitution.

The sanctioned alternatives this test pushes authors toward:

- ``localCheckpoint(eager=False)`` for a multi-consumer relation
  scoped to one query: materializes once, never enters the
  CacheManager (it becomes a LogicalRDD, which has no logical plan to
  match), and its blocks are GC-released by the ContextCleaner when
  the relation goes out of scope.
- a module-level shared artifact (``_SHINGLE_ROWS_CACHE``,
  ``_LR_WEIGHTS_CACHE``) when several queries start from the identical
  relation — the accidental cross-query cache hit becomes a designed,
  documented one.
- ``persist`` + ``unpersist`` in a try/finally when the consumer is
  driver-bounded (model training loops, fixture builds) — allowed,
  counted below.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "multithreaded_map_reduce_spark"

# file suffix -> (max allowed .persist( sites, why they are sound)
_PERSIST_BUDGET: dict[str, tuple[int, str]] = {
    "queries/textstats.py": (
        4,
        "winnowing fps ×2, _lr_trained_weights, logreg_model_path — all "
        "four are persist→consume→unpersist in a try/finally",
    ),
    "operators/dedup.py": (
        1,
        "build_minhash_index: persisted for the three artifact writes, "
        "released in the finally",
    ),
}


def _count(pattern: str, text: str) -> int:
    return len(re.findall(pattern, text))


def test_every_persist_is_released_or_whitelisted() -> None:
    offenders: list[str] = []
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(PKG.parent).as_posix()
        text = py.read_text()
        n_persist = _count(r"\.persist\(", text)
        if n_persist == 0:
            continue
        suffix = "/".join(rel.split("/")[-2:])
        budget = _PERSIST_BUDGET.get(suffix)
        if budget is None:
            offenders.append(
                f"{rel}: {n_persist} persist site(s) in a file with no "
                "whitelist entry — use localCheckpoint(eager=False) or a "
                "documented shared artifact, or whitelist with a release "
                "argument"
            )
            continue
        if n_persist > budget[0]:
            offenders.append(
                f"{rel}: {n_persist} persist sites > whitelisted {budget[0]}"
            )
        n_unpersist = _count(r"\.unpersist\(", text)
        if n_unpersist < n_persist:
            offenders.append(
                f"{rel}: {n_persist} persists but only {n_unpersist} "
                "unpersists — every persist needs a paired release"
            )
    assert not offenders, "\n".join(offenders)


def test_persisted_files_release_in_finally() -> None:
    """Releases must survive exceptions: each whitelisted file's
    unpersists all sit inside/after a ``finally:`` block (string-level
    heuristic: the file has at least as many ``finally:`` as persist
    sites minus explicitly-sequential releases)."""
    for suffix in _PERSIST_BUDGET:
        py = PKG.parent / "multithreaded_map_reduce_spark" / suffix
        text = py.read_text()
        n_persist = _count(r"\.persist\(", text)
        n_finally = _count(r"finally:", text)
        assert n_finally >= n_persist, (
            f"{suffix}: {n_persist} persists but {n_finally} finally "
            "blocks — releases must be exception-safe"
        )
