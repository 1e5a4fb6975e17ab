"""Full-registry storage-ledger sweep (VERDICT r9 item 6): materialize
every ``queries()`` entry at sf0.001 and assert the CacheManager holds
nothing afterwards — the runtime twin of the static persist-release
grep in tests/test_persist_discipline.py. A non-empty CacheManager
after any query means a ``persist()`` leaked, which both holds
executor storage for the rest of the session and makes later queries'
physical plans run-order-dependent via cache-plan substitution.

Round 11 (VERDICT r10 item 6) extends the ledger to the STREAMING
end-state: after every query the session must hold zero active
StreamingQuery handles (a forgotten ``stop()`` keeps a microbatch
thread + state store open for the rest of the session), and the sweep
must not accrete orphaned temporary checkpoint dirs
(``/tmp/temporary-*`` — where Spark puts state stores for memory-sink
streams that never set checkpointLocation).

Usage: python tests/run_ledger.py [sf_dir]
Prints one line per leaking query (checked after EVERY query, so the
offender is named, not just detected) and a summary.
"""

from __future__ import annotations

import glob
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402


def _tmp_ckpts() -> set[str]:
    return set(glob.glob("/tmp/temporary-*"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from multithreaded_map_reduce_spark.session import get_spark

    spark = get_spark()
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    leaks: list[str] = []
    stream_leaks: list[str] = []
    errs: list[str] = []
    ckpt0 = _tmp_ckpts()
    t0 = time.time()
    qs = entry.queries()
    for i, (name, fn) in enumerate(sorted(qs.items())):
        try:
            fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            errs.append(name)
            print(f"ERR {name}: {e}")
            continue
        if not cm.isEmpty():
            leaks.append(name)
            print(f"LEAK {name}: CacheManager non-empty after this query")
            spark.catalog.clearCache()
        active = spark.streams.active
        if active:
            stream_leaks.append(name)
            print(
                f"STREAM-LEAK {name}: {len(active)} active StreamingQuery "
                "handle(s) after the query returned"
            )
            for q in active:
                q.stop()
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{len(qs)} ({time.time() - t0:.0f}s)")
            sys.stdout.flush()
    ckpt_orphans = sorted(_tmp_ckpts() - ckpt0)
    print(
        f"LEDGER: {len(qs)} queries, {len(leaks)} leaks, "
        f"{len(stream_leaks)} stream-leaks, {len(ckpt_orphans)} orphaned "
        f"temp checkpoints, {len(errs)} errors ({time.time() - t0:.0f}s)"
    )
    print(f"LEAKS: {leaks}")
    print(f"STREAM_LEAKS: {stream_leaks}")
    print(f"CKPT_ORPHANS: {ckpt_orphans}")
    print(f"ERRS: {errs}")
    return 1 if (leaks or stream_leaks or ckpt_orphans or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
