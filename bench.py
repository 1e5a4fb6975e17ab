"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion via the noop sink (full plan runs,
nothing is collected to the driver — measures engine throughput, not
result serialization).
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers once so timings measure the engine
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in ALL_QUERIES:
            continue
        fn = ALL_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
