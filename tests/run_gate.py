"""Run the full differential gate (every queries() entry vs its DuckDB
oracle) outside pytest, mirroring the driver's CORRECTNESS check.

Usage: python tests/run_gate.py [sf_dir] [name ...]
Prints one line per query and a FAILS summary at the end.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from tests.oracle import compare  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from multithreaded_map_reduce_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.time()
        try:
            if sql is None:
                n = fn(spark, sf_dir).count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time() - t0:.1f}s)")
            else:
                n = compare(spark, fn, sql, sf_dir)
                print(f"PASS {name}: {n} rows ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {e}")
            traceback.print_exc(limit=3)
        sys.stdout.flush()
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
