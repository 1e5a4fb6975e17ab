"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the sf0.01 DuckDB differential gate. The real
implementations live in ``multithreaded_map_reduce_spark/queries/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (WordCounter lineage) on /root/testdata/sf0.001."""
    return ALL_QUERIES["top_words"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ALL_ORACLES)
