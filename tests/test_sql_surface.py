"""SQL-interface queries vs DuckDB + KV text sink round-trip."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare

SQL_QUERIES = [
    "q6_forecast_revenue",
    "grouping_sets_pricing",
    "exists_correlated",
    "in_subquery",
    "scalar_subquery",
    "array_functions",
]


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_kv_text_roundtrip(spark, tmp_path):
    """Reference-format sink (quirk Q4: 'key v1 v2 … ') round-trips."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries.corpus import inverted_index
    from multithreaded_map_reduce_spark.sources.kv_text import read_kv_text, write_kv_text

    idx = inverted_index(spark, SF_SMOKE).select(
        F.col("word").alias("key"), F.split("doc_ids", ",").alias("values")
    )
    out = str(tmp_path / "kv_out")
    write_kv_text(idx, out, num_partitions=3)

    # physical format: every line is `key v1 v2 … ` with a trailing space
    raw = spark.read.text(out).collect()
    assert raw
    assert all(r["value"].endswith(" ") for r in raw)

    back = read_kv_text(spark, out)
    a = sorted((r["key"], tuple(r["values"])) for r in idx.collect())
    b = sorted((r["key"], tuple(r["values"])) for r in back.collect())
    assert a == b


def test_kv_text_partition_sorted(spark, tmp_path):
    """Each output part file is key-sorted (reference layout)."""
    import glob

    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries.corpus import word_count
    from multithreaded_map_reduce_spark.sources.kv_text import write_kv_text

    wc = word_count(spark, SF_SMOKE).select(
        F.col("word").alias("key"), F.array(F.col("cnt").cast("string")).alias("values")
    )
    out = str(tmp_path / "wc_out")
    write_kv_text(wc, out, num_partitions=2)
    parts = sorted(glob.glob(out + "/part-*"))
    assert len(parts) == 2
    for p in parts:
        keys = [line.split()[0] for line in open(p) if line.strip()]
        assert keys == sorted(keys)
