"""One-more-decade growth probe (VERDICT r10 item 4).

The per-round 100× probes compare sf0.001 → sf0.1; two points cannot
distinguish linear growth from quadratic-with-small-constant. This
script adds a THIRD decade: it amplifies the sf0.1 driver tables 10×
(union of 10 key-shifted copies, written once to /tmp) and times the
target queries at sf0.1 vs the amplified dir, warm best-of-2 on the
same session — if the r10 ratios were linear-in-input, the new step
should come in near 10× input → ≤ ~10× wall (minus fixed overhead).

Key shifts keep the amplified relations honest for each query's cost
driver: modularity gets 10× DISTINCT baskets over the same part
vocabulary (the pair stage is the cost), shot detection 10× distinct
docs through the container synth+parse chain, knn outliers 10× vectors
on BOTH sides of the salted cell self-join (the quadratic suspect).

Round 12 (VERDICT r11 item 3): the triangle family gets a
SPARSITY-CONTROLLED amplification — lineitem shifts BOTH l_orderkey
and l_suppkey, orders shifts o_orderkey (matching, so the join holds
per copy) and o_custkey, so the amplified co-shipment projection is
10 disjoint copies of the sf0.1 graph: 10× nodes, 10× edges, 10×
triangles at CONSTANT density. A ~linear wall ratio then measures the
PLAN, not the fixture's densification (the r11 defense conflated the
two — the un-shifted amplification densified the projection 11,100×).

Usage: python tests/scale_decade_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

# v2: r12 multi-column shifts (suppkey/custkey/orders) — new path so a
# stale r11 cache (single-column lineitem shift) can't poison results
AMP_DIR = "/tmp/sf0.1x10v2"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10

# table -> [(id column, shift per copy), ...] — shifts clear the source
# id ranges. l_orderkey/o_orderkey shift together so the orders join
# holds within each copy; l_suppkey/o_custkey shifts keep each copy's
# co-shipment projection DISJOINT from the others (constant density).
AMPLIFIED = {
    "lineitem": [("l_orderkey", 1_000_000), ("l_suppkey", 1_000_000)],
    "orders": [("o_orderkey", 1_000_000), ("o_custkey", 1_000_000)],
    "documents": [("doc_id", 100_000)],
    "embeddings": [("vec_id", 100_000)],
}

DEFAULT_QUERIES = [
    "graph_modularity",
    "multimodal_shot_detection",
    "embedding_knn_outliers",
    "graph_clustering_coefficient",
    "triangle_suppliers",
]


def build_amplified(spark) -> None:
    amp = Path(AMP_DIR)
    amp.mkdir(parents=True, exist_ok=True)
    for f in sorted(Path(SRC_DIR).glob("*.parquet")):
        name = f.stem
        dst = amp / f.name
        if name in AMPLIFIED:
            if dst.exists() and not dst.is_symlink():
                continue  # built by a previous run
            src = spark.read.parquet(str(f))
            parts = []
            for k in range(COPIES):
                p = src
                for idc, shift in AMPLIFIED[name]:
                    p = p.withColumn(idc, F.col(idc) + F.lit(k * shift))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.write.mode("overwrite").parquet(str(dst))
            print(f"amplified {name}: {out.count()} rows")
        elif not dst.exists():
            dst.symlink_to(f)


def time_query(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(3):  # 1 cold + 2 warm; report best (warm) rep
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES

    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="scale-decade-probe")
    build_amplified(spark)
    print(f"| op | sf0.1 | 10x | ratio |")
    print(f"|---|---|---|---|")
    for name in names:
        fn = ALL_QUERIES[name]
        base = time_query(spark, fn, SRC_DIR)
        amp = time_query(spark, fn, AMP_DIR)
        print(
            f"| {name} | {base:.2f} s | {amp:.2f} s | "
            f"{amp / base:.1f}x |"
        )
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
