"""Round-5 additions: market-basket pairs, edit-distance dedup,
regex/interval scalar surface, rolling z-score anomalies, integer
k-means, Bellman-Ford shortest paths, Bloom-filter join pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_copurchase_basket_cap(spark):
    """An order with more than MAX_BASKET distinct parts contributes no
    pairs — the quadratic-fanout rail."""
    from multithreaded_map_reduce_spark.queries import mining

    big = [(1, p) for p in range(mining.MAX_BASKET + 1)]
    small = [(2, 10), (2, 11), (3, 10), (3, 11)]
    df = spark.createDataFrame(big + small, "l_orderkey long, l_partkey long")
    op = df.distinct()
    sizes = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("b"))
        .filter(F.col("b") <= mining.MAX_BASKET)
        .select("l_orderkey")
    )
    kept = op.join(sizes, "l_orderkey")
    assert kept.filter(F.col("l_orderkey") == 1).count() == 0
    assert kept.filter(F.col("l_orderkey") != 1).count() == 4


def test_editdistance_symmetric_bounds(spark):
    """levenshtein in the gate query is the exact metric: zero iff texts
    equal, symmetric, and bounded by length difference below."""
    df = spark.createDataFrame(
        [("abcd", "abcd"), ("abcd", "abed"), ("abcd", "abcdefgh")],
        "a string, b string",
    )
    rows = df.select(
        F.levenshtein("a", "b").alias("d"),
        F.levenshtein("b", "a").alias("rd"),
        (F.length("b") - F.length("a")).alias("ldiff"),
    ).collect()
    for r in rows:
        assert r["d"] == r["rd"]
        assert r["d"] >= abs(r["ldiff"])
    assert rows[0]["d"] == 0 and rows[1]["d"] == 1 and rows[2]["d"] == 4


def test_anomaly_decision_is_integer_exact(spark):
    """The z² > 9 flag must match the float z-score computation on a
    hand-built series (history mean 100, one spike)."""
    from multithreaded_map_reduce_spark.queries.timeseries import (
        timeseries_anomaly,
    )

    out = timeseries_anomaly(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["hist_n"] >= 8
    # at least one anomaly and one normal bucket in the fixture
    flags = {r["is_anomaly"] for r in rows}
    assert flags == {True, False}


def test_kmeans_partition_invariance(spark):
    """Cluster assignment is a pure function of the data — invariant to
    shuffle partitioning (the analog of the reference's N_WORKER
    independence)."""
    from multithreaded_map_reduce_spark.operators.kmeans import kmeans_assign
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = sorted(
        (r["id"], r["cluster"], r["dist"])
        for r in kmeans_assign(emb, "vec_id", "embedding", k=4, iters=2).collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = sorted(
            (r["id"], r["cluster"], r["dist"])
            for r in kmeans_assign(
                emb.repartition(3), "vec_id", "embedding", k=4, iters=2
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_sssp_hand_graph(spark):
    """Bellman-Ford on a hand graph: relaxation beats the direct edge."""
    from multithreaded_map_reduce_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1)],
        "src long, dst long, cost long",
    )
    d = {r["id"]: r["d"] for r in shortest_paths(edges, 0, rounds=4).collect()}
    assert d == {0: 0, 1: 3, 2: 1, 3: 4}


def test_sssp_rounds_bound_hops(spark):
    """With rounds=1 only direct neighbors are reached."""
    from multithreaded_map_reduce_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1)], "src long, dst long, cost long"
    )
    d = {r["id"]: r["d"] for r in shortest_paths(edges, 0, rounds=1).collect()}
    assert d == {0: 0, 1: 1}


def test_bloom_no_false_negatives(spark):
    """Every true dim key passes the Bloom filter (zero false negatives
    by construction); false positives exist but are pruned by the exact
    semi-join."""
    from multithreaded_map_reduce_spark.operators.bloom import (
        bloom_prune,
        build_bloom_words,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    cust = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    words = build_bloom_words(cust, "c_custkey")
    cand_keys = {
        r["o_custkey"]
        for r in bloom_prune(orders, words, "o_custkey").select("o_custkey").collect()
    }
    true_keys = {
        r["o_custkey"]
        for r in orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
        )
        .select("o_custkey")
        .collect()
    }
    assert true_keys <= cand_keys


def test_gate_r5_queries(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    for name in (
        "copurchase_pairs",
        "dedup_editdistance",
        "scalar_regex",
        "interval_shipping",
        "timeseries_anomaly",
        "sssp_nations",
        "bloom_prune_orders",
        "kmeans_embeddings",
        "sim_topk_ivf_kmeans",
        "zorder_layout",
        "incremental_revenue",
        "ols_by_flag",
        "cdc_chunk_dedup",
        "timeseries_rollup",
        "mr_chained_freq_of_freq",
        "arrow_map_token_stats",
        "streaming_foreachbatch_totals",
    ):
        compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def _canon_rows(df):
    from tests.oracle import canonical_rows

    return canonical_rows(df.columns, [tuple(r) for r in df.collect()])


def test_r5_ops_partition_count_invariance(spark):
    """Round-5 operators produce identical result sets at any shuffle
    partition count (the reference's N_WORKER-independence property)."""
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    names = [
        "copurchase_pairs",
        "dedup_editdistance",
        "timeseries_anomaly",
        "sssp_nations",
        "bloom_prune_orders",
        "zorder_layout",
        "incremental_revenue",
        "ols_by_flag",
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


def test_cdc_boundary_stability(spark):
    """The defining CDC property: inserting one char at the FRONT of a
    document realigns only the first chunk — content-defined boundaries
    resynchronize, where fixed-width chunking would shift every chunk."""
    import random

    from multithreaded_map_reduce_spark.queries import mining

    random.seed(7)
    base = "".join(
        random.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(600)
    )
    df = spark.createDataFrame(
        [(1, base), (2, "Z" + base)], "doc_id long, text string"
    )
    ch = (
        df.withColumn("bs", F.expr(mining._CDC_BS_SPARK))
        .withColumn("chunks", F.expr(mining._CDC_CHUNKS_SPARK))
        .select("doc_id", F.explode("chunks").alias("ch"))
    )
    a = {r["ch"] for r in ch.filter("doc_id = 1").collect()}
    b = {r["ch"] for r in ch.filter("doc_id = 2").collect()}
    assert len(a) == 10  # enough boundaries to make the property meaningful
    assert len(a & b) == 9  # all but the prefix-bearing chunk realign
