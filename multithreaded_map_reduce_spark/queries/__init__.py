"""Query registry: every implemented operator from SURVEY.md §2 shows up
here as a named (spark_query, oracle_sql) pair consumed by
``__spark_entry__.py`` and ``bench.py``.

Each query callable: ``(SparkSession, sf_dir: str) -> DataFrame``.
Each oracle: ANSI SQL DuckDB can run on the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Computed/aggregate columns are aliased the SAME
on both sides — the harness hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

ALL_QUERIES: dict[str, QueryFn] = {}
ALL_ORACLES: dict[str, str] = {}


def _register(module) -> None:
    ALL_QUERIES.update(module.QUERIES)
    ALL_ORACLES.update(getattr(module, "ORACLES", {}))


from . import (  # noqa: E402
    corpus,
    dedup,
    events,
    mapreduce_api,
    multimodal,
    relational,
    similarity,
    sketches,
    sql_surface,
    textstats,
    tpch_more,
    udfs,
    windows,
)

_register(corpus)
_register(mapreduce_api)
_register(relational)
_register(windows)
_register(events)
_register(dedup)
_register(similarity)
_register(textstats)
_register(multimodal)
_register(sql_surface)
_register(sketches)
_register(tpch_more)
_register(udfs)
