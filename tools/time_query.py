"""Standalone per-query timer: noop-sink timing (guide §1.4) of one or
more registry queries outside the full bench loop, for optimization
work where bench.py's 236-query session is too coarse.

Usage:
    python tools/time_query.py [--sf DIR] [--cpus N] [--reps K] name...

Prints cold + warm-median seconds per query. Same session factory and
noop methodology as bench.py, so numbers are comparable to its rows
(modulo session position effects).
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="time_query", cpus=args.cpus)

    def run(name: str) -> float:
        t0 = time.time()
        df = ALL_QUERIES[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in args.names:
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        cold = run(name)
        warm = [run(name) for _ in range(args.reps)]
        print(
            f"{name}: cold {cold:.3f}s warm_med "
            f"{statistics.median(warm):.3f}s warm {['%.3f' % w for w in warm]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
