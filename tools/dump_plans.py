"""Dump `.explain("formatted")` for named queries to plans/<round>/.

Usage:
    python tools/dump_plans.py r14 before embedding_covariance_audit ...
    python tools/dump_plans.py r14 after  embedding_covariance_audit ...

Writes plans/<round>/<query>_<tag>.txt with the FORMATTED physical plan
(pre-execution, `isFinalPlan=false`) followed by the optimized logical
plan — the pair the judge checks optimization claims against. Uses
SPARK_GRAFT_SF_DIR (default sf0.1) so the dumps match the bench's data.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    args = sys.argv[1:]
    # --full: bypass localCheckpoint truncation so the dump shows the
    # real subtree instead of Scan ExistingRDD (checkpointed relations
    # replace their lineage with a LogicalRDD at construction time).
    full = "--full" in args
    if full:
        args.remove("--full")
    rnd, tag, *names = args
    out_dir = Path(__file__).resolve().parents[1] / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.session import get_spark

    if full:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        _CDF.localCheckpoint = lambda self, eager=True: self
        tag = tag + "_full"

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    for name in names:
        df = ALL_QUERIES[name](spark, sf_dir)
        qe = df._jdf.queryExecution()
        text = (
            f"-- {name} [{tag}] sf_dir={sf_dir}\n"
            "== Physical (formatted, pre-execution) ==\n"
            + qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            + "\n== Optimized logical ==\n"
            + qe.optimizedPlan().toString()
        )
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
