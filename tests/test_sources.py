"""Source/sink coverage: text lines with dense numbering, corpus
mapping, csv/json round-trips, stateful streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_read_text_lines_dense(spark, tmp_path):
    """Reference input relation: 0-based dense global line numbers
    (SURVEY.md §1), independent of partitioning."""
    from multithreaded_map_reduce_spark.sources.text import read_text_lines

    p = tmp_path / "input.txt"
    lines = [f"line number {i} content" for i in range(257)]
    p.write_text("\n".join(lines))
    df = read_text_lines(spark, str(p))
    rows = sorted((r["line_no"], r["line"]) for r in df.collect())
    assert [r[0] for r in rows] == list(range(257))
    assert rows[42][1] == "line number 42 content"


def test_corpus_lines_shape(spark):
    from multithreaded_map_reduce_spark.sources.text import corpus_lines
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    cl = corpus_lines(docs)
    assert cl.columns == ["doc_id", "line_no", "line"]
    assert cl.filter(F.col("line_no") == 0).count() == docs.count()


def test_csv_json_roundtrip(spark, tmp_path):
    """Connector coverage: parquet fixture → csv and json → read back
    with explicit schemas (never inferSchema in prod paths)."""
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    nation = load_table(spark, SF_SMOKE, "nation")
    want = sorted(map(tuple, nation.collect()))

    csv_path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(csv_path)
    back_csv = spark.read.schema(nation.schema).option("header", True).csv(csv_path)
    assert sorted(map(tuple, back_csv.collect())) == want

    json_path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(json_path)
    back_json = spark.read.schema(nation.schema).json(json_path)
    assert sorted(map(tuple, back_json.collect())) == want


def test_stateful_streaming_totals(spark):
    """applyInPandasWithState running totals == batch aggregation after
    the single file-source micro-batch."""
    from multithreaded_map_reduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
    )
    from multithreaded_map_reduce_spark.streaming.stateful import running_user_totals
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    from multithreaded_map_reduce_spark.functions.rounding import iunits

    stream = stream_events(spark, SF_SMOKE)
    run_stream_to_memory(running_user_totals(stream), "stateful_out", output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["total_micros"])
        for r in spark.sql("SELECT * FROM stateful_out").collect()
    }
    batch = load_table(spark, SF_SMOKE, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum(iunits(F.col("value"))).alias("v")
    )
    want = {r["user_id"]: (r["n"], r["v"]) for r in batch.collect()}
    assert got == want  # exact: integer micro-unit state


def test_parse_byte_size_suffixes():
    """ADVICE r4: '128m' must parse as 128 MiB, not 128 bytes (the old
    strip-non-digits parse silently disabled fan_out under unit-suffixed
    maxPartitionBytes configs)."""
    from multithreaded_map_reduce_spark.sources.catalog import _parse_byte_size

    assert _parse_byte_size("134217728") == 134217728
    assert _parse_byte_size("134217728b") == 134217728
    assert _parse_byte_size("128m") == 128 << 20
    assert _parse_byte_size("128M") == 128 << 20
    assert _parse_byte_size("1g") == 1 << 30
    assert _parse_byte_size("512k") == 512 << 10
    assert _parse_byte_size("2t") == 2 << 40
    assert _parse_byte_size("garbage") == 134217728
    assert _parse_byte_size("  64m ") == 64 << 20


def test_fan_out_repartition_node_not_string_literal(spark):
    """fan_out must detect an existing Repartition NODE (and skip), but
    a string literal containing 'Repartition' in a filter must NOT
    false-positive the node check (ADVICE r4)."""
    from multithreaded_map_reduce_spark.sources.catalog import (
        _has_repartition,
        fan_out,
    )

    small = spark.range(10)
    reparted = small.repartition(4)
    assert _has_repartition(reparted._jdf.queryExecution().optimizedPlan())
    # plan text contains the literal 'Repartition' only inside a filter
    lit = small.selectExpr("id", "'Repartition' AS tag").filter("tag = 'Repartition'")
    assert not _has_repartition(lit._jdf.queryExecution().optimizedPlan())
    # and fan_out of the already-reparted df is the identity
    assert fan_out(reparted) is reparted


def test_fan_out_without_jdf_returns_input(spark):
    """Spark Connect capability guard: a DataFrame-shaped object without
    the py4j ``_jdf`` handle passes through fan_out untouched (VERDICT
    r4 item 8)."""
    from multithreaded_map_reduce_spark.sources.catalog import fan_out

    class NoJdf:
        def __init__(self, inner):
            self.sparkSession = inner.sparkSession

    fake = NoJdf(spark.range(5))
    assert fan_out(fake) is fake
