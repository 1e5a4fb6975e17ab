"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion via the noop sink (full plan runs,
nothing is collected to the driver — measures engine throughput, not
result serialization).

Each query runs twice: "queries" records the COLD first run (plan build
+ execution — comparable with every earlier BENCH_r{N}), "queries_warm"
the immediate second run, where the JVM is hot and parquet footers are
cached. cold − warm ≈ driver/plan overhead, which shrinks relative to
execution as data scales; warm is the closer proxy for steady-state
cluster throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from multithreaded_map_reduce_spark.queries import ALL_QUERIES  # noqa: E402
from multithreaded_map_reduce_spark.session import get_spark  # noqa: E402

# Headline set: grown as operators land. Names must exist in ALL_QUERIES.
HEADLINE = [
    "word_count",
    "inverted_index",
    "top_words",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_running_total",
    "topk_customers",
    "events_session",
    "asof_join_clicks",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "text_tfidf_top_terms",
    "multimodal_features",
    "q14_promo_share",
    "q19_disjunctive",
    "kmv_distinct_parts",
    "multimodal_decode",
    "skew_salted_join",
]

# flag when a query slows > 1.5x vs the newest BENCH_r{N}.json, ignoring
# sub-300ms queries where scheduler noise dominates
REGRESSION_RATIO = 1.5
REGRESSION_FLOOR_SEC = 0.3


def _previous_bench() -> tuple[str, dict[str, float]] | None:
    """Newest recorded BENCH_r{N}.json → (filename, per-query seconds)."""
    here = Path(__file__).resolve().parent
    recs = sorted(here.glob("BENCH_r*.json"))
    if not recs:
        return None
    try:
        data = json.loads(recs[-1].read_text())
    except (OSError, json.JSONDecodeError):
        return None
    queries = (data.get("parsed") or data).get("queries")
    return (recs[-1].name, queries) if isinstance(queries, dict) else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers once so timings measure the engine
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        if name not in ALL_QUERIES:
            continue
        fn = ALL_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 3)

    regressions: dict[str, float] = {}
    prev = _previous_bench()
    if prev is not None:
        prev_name, prev_queries = prev
        for name, sec in timings.items():
            base = prev_queries.get(name)
            if base and sec > REGRESSION_FLOOR_SEC and sec > REGRESSION_RATIO * base:
                regressions[name] = round(sec / base, 2)
        for name, ratio in sorted(regressions.items(), key=lambda kv: -kv[1]):
            print(
                f"REGRESSION: {name} {ratio}x slower than {prev_name} "
                f"({prev_queries[name]}s -> {timings[name]}s)",
                file=sys.stderr,
            )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "sf": float(sf) if sf else sf_dir,
    }
    if prev is not None:
        out["prev"] = prev[0]
        out["regressions"] = regressions
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
