"""Round-4 additions: Python UDTF, Count-Min heavy hitters, triangle
counting, streaming sliding windows — semantics + gate compares."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_udtf_eval_semantics():
    from multithreaded_map_reduce_spark.queries.udtf import TokenOffsets

    # the decorated class exposes the wrapped UDTF; instantiate the
    # underlying implementation for a pure-Python check
    rows = list(TokenOffsets.func().eval("ab  cd\n e"))
    assert rows == [(0, "ab", 0), (1, "cd", 2), (2, "e", 4)]
    assert list(TokenOffsets.func().eval("")) == []
    assert list(TokenOffsets.func().eval("   ")) == []


def test_udtf_gate(spark):
    from multithreaded_map_reduce_spark.queries.udtf import ORACLES, QUERIES

    compare(spark, QUERIES["udtf_token_offsets"], ORACLES["udtf_token_offsets"], SF_SMOKE)


def test_cms_never_undercounts(spark):
    """CMS estimates are exact counts plus non-negative collision noise."""
    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.operators.sketches import cms_heavy_hitters
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
    est = {r["val"]: r["cms_count"] for r in cms_heavy_hitters(toks, "word", k=10).collect()}
    exact = {
        r["word"]: r["n"]
        for r in toks.groupBy("word").agg(F.count("*").alias("n")).collect()
    }
    assert est
    for word, c in est.items():
        assert c >= exact[word]


def test_cms_gate(spark):
    from multithreaded_map_reduce_spark.queries.sketches import ORACLES, QUERIES

    compare(spark, QUERIES["cms_top_words"], ORACLES["cms_top_words"], SF_SMOKE)


def test_triangle_count_hand_graph(spark):
    from multithreaded_map_reduce_spark.operators.graph import triangle_count

    # triangle 1-2-3 plus a dangling edge and a reversed duplicate
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (2, 1)], "a long, b long"
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 1
    # two triangles sharing edge 1-2
    edges2 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (1, 4)], "a long, b long"
    )
    assert triangle_count(edges2).collect()[0]["n_triangles"] == 2


def test_triangle_gate(spark):
    from multithreaded_map_reduce_spark.queries.graphrank import ORACLES, QUERIES

    compare(spark, QUERIES["triangle_suppliers"], ORACLES["triangle_suppliers"], SF_SMOKE)


def test_streaming_sliding_gate(spark):
    from multithreaded_map_reduce_spark.queries.streaming_gate import ORACLES, QUERIES

    compare(spark, QUERIES["streaming_sliding"], ORACLES["streaming_sliding"], SF_SMOKE)


def test_stateful_v2_roundtrip_or_skip(spark):
    """transformWithState (v2) runs only where google.protobuf exists;
    when it does, it must agree with the gate-verified v1 operator.

    VERDICT r4 item 6 asked to vendor/require protobuf so this stops
    skipping — checked in round 5: the environment has no package index
    access (``pip download protobuf`` → 'no matching distribution') and
    protobuf's generated-code core is not realistically vendorable by
    hand, so the skip stands as environment-conditional; the v1 twin
    (``applyInPandasWithState``) keeps the stateful surface gated."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not available in this environment")
    from multithreaded_map_reduce_spark.queries.streaming_gate import _ntz, _sink
    from multithreaded_map_reduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
    )
    from multithreaded_map_reduce_spark.streaming.stateful import running_user_totals_v2

    name = _sink("st_v2_test")
    run_stream_to_memory(
        running_user_totals_v2(stream_events(spark, SF_SMOKE)), name, output_mode="update"
    )
    assert spark.table(name).count() > 0


def test_python_datasource_partition_invariance(spark):
    """The custom DataSource's row set must not depend on how it is
    striped across partitions — the property the reference's
    whole-file-scan striping made implicit (SURVEY.md §5)."""
    from multithreaded_map_reduce_spark.sources.pysource import (
        SyntheticEventsDataSource,
        gen_row,
    )

    spark.dataSource.register(SyntheticEventsDataSource)

    def rows(n_parts):
        df = (
            spark.read.format("synthetic_events")
            .option("n_rows", "500")
            .option("n_partitions", str(n_parts))
            .option("seed", "7")
            .load()
        )
        return sorted(map(tuple, df.collect()))

    expected = sorted(gen_row(r, 7) for r in range(500))
    assert rows(1) == expected
    assert rows(8) == expected


def test_python_datasource_gate(spark):
    from multithreaded_map_reduce_spark.queries.connectors import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["connector_python_datasource"],
        ORACLES["connector_python_datasource"],
        SF_SMOKE,
    )


def _canon_rows(df):
    from tests.oracle import canonical_rows

    return canonical_rows(df.columns, [tuple(r) for r in df.collect()])


def test_r4_ops_partition_count_invariance(spark):
    """Round-4 operators must produce the identical result set at any
    shuffle-partition count — the distributed-correctness property the
    reference's 'output union independent of N_WORKER' claim maps to
    (SURVEY.md §5)."""
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    names = [
        "timeseries_gapfill",
        "cms_top_words",
        "triangle_suppliers",
        "sim_topk_quantized",
        "dedup_pipeline_summary",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                n: _canon_rows(ALL_QUERIES[n](spark, SF_SMOKE)) for n in names
            }
        for n in names:
            assert results["3"][n] == results["13"][n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
