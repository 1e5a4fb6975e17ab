"""Rounding-boundary robustness audit (VERDICT r6 item 3).

Three rounds of driver-red/local-green rows proved the snap-to-N-digits
discipline (``floor(x*scale + 0.5)``) is environment-fragile exactly
when a pre-round double lands within an ulp of its rounding boundary:
a different FMA/libm build moves x by 1-2 ulps and the floor jumps.

This audit measures that fragility BEHAVIORALLY, with no side-channel
from distributed execution: it re-runs each query twice with ``pround``
/ ``iunits`` patched to ``floor(x*scale + 0.5 +/- 2^-20)`` and asserts
the two outputs are identical. ``floor`` is monotone, so up == down
implies every pre-round value sits >= 2^-20 away from its boundary —
the VERDICT criterion — and the unjittered result is sandwiched
in between (no third run needed). A query that fails here must be
converted to integer rational arithmetic (``ratio_micros``) or have its
inputs re-derived exactly.

Power note: the jitter is absolute in post-scale units; once
``x*scale`` exceeds ~2^32 the 2^-20 nudge is below 1 ulp and the audit
loses power — but at that magnitude the >=2^-20 boundary-distance
criterion is unmeetable by ANY double, so such columns are integer
territory by construction (this repo's micros columns are BIGINT sums
of per-row conversions whose per-row magnitudes stay far below 2^32 at
fixture scale).

Usage: python tests/boundary_audit.py [sf_dir] [name ...]
Prints one line per pround/iunits-using query; FRAGILE summary at end.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import multithreaded_map_reduce_spark.functions.rounding as R  # noqa: E402
from multithreaded_map_reduce_spark import queries as QMOD  # noqa: E402
from tests.oracle import canonical_rows  # noqa: E402

EPS = 2.0**-20

_ORIG_PROUND = R.pround
_ORIG_IUNITS = R.iunits
_ORIG_IUNITS_GRID = R.iunits_grid


def _locations() -> list[tuple[object, str]]:
    """Every (module, attr) in the package bound to the original
    pround/iunits — module-level ``from ..rounding import pround``
    copies plus the rounding module itself (function-local imports
    resolve there at call time)."""
    locs = []
    for name, mod in list(sys.modules.items()):
        if not name.startswith("multithreaded_map_reduce_spark"):
            continue
        for attr, orig in (
            ("pround", _ORIG_PROUND),
            ("iunits", _ORIG_IUNITS),
            ("iunits_grid", _ORIG_IUNITS_GRID),
        ):
            if getattr(mod, attr, None) is orig:
                locs.append((mod, attr))
    return locs


def _jittered(delta: float):
    def pround(col: Column, n: int = 2) -> Column:
        scale = float(10**n)
        return (
            F.floor(col * F.lit(scale) + F.lit(0.5 + delta)) / F.lit(scale)
        ).cast("double")

    def iunits(col: Column, n: int = 6) -> Column:
        scale = float(10**n)
        return F.floor(col * F.lit(scale) + F.lit(0.5 + delta)).cast("long")

    def iunits_grid(col: Column, n: int = 6, guard: int = 1) -> Column:
        # jitter the FLOAT-domain stage only; the reduction is integer
        g = 10**guard
        off = 10_000_000_000
        v7 = F.floor(
            col * F.lit(float(10 ** (n + guard))) + F.lit(0.5 + delta)
        ).cast("long")
        return (
            F.floor(
                (v7 + F.lit(g // 2) + F.lit(off * g)) / F.lit(float(g))
            ).cast("long")
            - F.lit(off)
        )

    return {"pround": pround, "iunits": iunits, "iunits_grid": iunits_grid}


class patched:
    """Context manager swapping pround/iunits at every discovered
    location (None impl = counting passthrough for usage detection)."""

    def __init__(self, impls):
        self.impls = impls
        self.locs = _locations()

    def __enter__(self):
        for mod, attr in self.locs:
            setattr(mod, attr, self.impls[attr])
        return self

    def __exit__(self, *exc):
        originals = {
            "pround": _ORIG_PROUND,
            "iunits": _ORIG_IUNITS,
            "iunits_grid": _ORIG_IUNITS_GRID,
        }
        for mod, attr in self.locs:
            setattr(mod, attr, originals[attr])
        return False


def _counting(counter: dict):
    def pround(col: Column, n: int = 2) -> Column:
        counter["n"] += 1
        return _ORIG_PROUND(col, n)

    def iunits(col: Column, n: int = 6) -> Column:
        counter["n"] += 1
        return _ORIG_IUNITS(col, n)

    def iunits_grid(col: Column, n: int = 6, guard: int = 1) -> Column:
        counter["n"] += 1
        return _ORIG_IUNITS_GRID(col, n, guard)

    return {"pround": pround, "iunits": iunits, "iunits_grid": iunits_grid}


def uses_rounding(spark, fn, sf_dir: str) -> bool:
    """Plan-build the query under counting wrappers (lazy for nearly
    every query; the few eager builders just cost one extra run)."""
    counter = {"n": 0}
    with patched(_counting(counter)):
        fn(spark, sf_dir)
    return counter["n"] > 0


def audit_query(spark, fn, sf_dir: str):
    """Returns (robust: bool, n_rows, first_diffs)."""
    outs = []
    for delta in (EPS, -EPS):
        with patched(_jittered(delta)):
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        outs.append(canonical_rows(cols, rows))
    up, dn = outs
    if len(up) != len(dn):
        return False, len(up), [("row-count", len(up), len(dn))]
    diffs = [(a, b) for a, b in zip(up, dn) if a != b][:3]
    return not diffs, len(up), diffs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from multithreaded_map_reduce_spark.session import get_spark

    spark = get_spark()
    fragile, skipped = [], 0
    for name, fn in QMOD.ALL_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if not uses_rounding(spark, fn, sf_dir):
                skipped += 1
                continue
            ok, n, diffs = audit_query(spark, fn, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            fragile.append(name)
            continue
        tag = "ROBUST" if ok else "FRAGILE"
        extra = "" if ok else f" first diffs: {diffs}"
        print(f"{tag} {name}: {n} rows ({time.time() - t0:.1f}s){extra}")
        sys.stdout.flush()
        if not ok:
            fragile.append(name)
    print(f"SKIPPED (no pround/iunits): {skipped}")
    print(f"FRAGILE: {fragile}")
    return 1 if fragile else 0


if __name__ == "__main__":
    raise SystemExit(main())
