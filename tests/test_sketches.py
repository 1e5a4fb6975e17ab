"""KMV sketch: oracle parity + estimation quality + multi-probe LSH."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_kmv_oracle_parity(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(
        spark, ALL_QUERIES["kmv_distinct_parts"], ALL_ORACLES["kmv_distinct_parts"], SF_SMOKE
    )


def test_kmv_estimate_quality(spark):
    """KMV with k=64 should land within ~35% of exact on this data
    (standard error ≈ 1/sqrt(k-1) ≈ 12.7%; 3σ bound)."""
    from multithreaded_map_reduce_spark.queries.sketches import kmv_distinct_parts

    for r in kmv_distinct_parts(spark, SF_SMOKE).collect():
        exact, est = r["exact_distinct"], r["kmv_estimate"]
        assert abs(est - exact) / exact < 0.4, (r["l_returnflag"], est, exact)


def test_multiprobe_recall_not_worse(spark):
    """probes=2 recall >= probes=1 recall against the exact top-k."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.operators.similarity import lsh_topk
    from multithreaded_map_reduce_spark.queries.similarity import (
        DIM,
        K,
        N_PLANES,
        N_QUERIES,
        sim_topk_bruteforce,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    c = emb.filter(F.col("vec_id") >= N_QUERIES)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }

    def recall(probes):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(
                q, c, "vec_id", "embedding", k=K, n_planes=N_PLANES, dim=DIM, probes=probes
            ).collect()
        }
        return len(got & exact)

    assert recall(2) >= recall(1)


def test_multitable_recall_not_worse(spark):
    """n_tables=3 recall >= n_tables=1 (union of independent tables)."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.operators.similarity import lsh_topk
    from multithreaded_map_reduce_spark.queries.similarity import (
        DIM,
        K,
        N_PLANES,
        N_QUERIES,
        sim_topk_bruteforce,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    c = emb.filter(F.col("vec_id") >= N_QUERIES)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }

    def recall(n_tables):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(
                q, c, "vec_id", "embedding",
                k=K, n_planes=N_PLANES, dim=DIM, n_tables=n_tables,
            ).collect()
        }
        return len(got & exact)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1


def test_kmv_negative_and_large_values(spark):
    """Regression: raw v*A overflowed int64 for v >= ~1e10 and negative
    values hashed negative, breaking the k-th-minimum ordering (ADVICE r1)."""
    from multithreaded_map_reduce_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("g", -(10**12) + i * 7_919_471_003) for i in range(200)],
        "grp string, v long",
    )
    out = kmv_distinct(df, "grp", "v", k=32).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_distinct"] == 200
    # estimate is positive, finite, and in a sane band around the truth
    assert 0 < r["kmv_estimate"] < 10_000


def test_hll_oracle_parity(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(
        spark, ALL_QUERIES["hll_distinct_parts"], ALL_ORACLES["hll_distinct_parts"], SF_SMOKE
    )


def test_hll_estimate_quality(spark):
    """HLL with m=256 registers: standard error ~1.04/sqrt(256) ≈ 6.5%
    in the raw-estimator regime (n > 2.5m). Below that the RAW estimator
    is biased high by design (we deliberately omit linear counting —
    ln() is the one libm call IEEE doesn't require correctly rounded, so
    it can't be differentially tested; see operators/sketches.py), so
    small-range groups only get a coarse monotone sanity band."""
    from multithreaded_map_reduce_spark.queries.sketches import hll_distinct_parts

    for r in hll_distinct_parts(spark, SF_SMOKE).collect():
        exact, est = r["exact_distinct"], r["hll_estimate"]
        if exact > 2.5 * 256:
            assert abs(est - exact) / exact < 0.25, (r["l_returnflag"], est, exact)
        else:
            assert 0.5 * exact < est < 2.5 * exact, (r["l_returnflag"], est, exact)


def test_hll_merge_invariance(spark):
    """The register sketch is a max-aggregate, so the estimate must be
    identical no matter how the input is partitioned (partial-agg merge
    = sketch merge)."""
    from multithreaded_map_reduce_spark.operators.sketches import hll_distinct
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_partkey")
    one = hll_distinct(li.coalesce(1), "l_returnflag", "l_partkey").collect()
    many = hll_distinct(li.repartition(13), "l_returnflag", "l_partkey").collect()
    key = lambda rows: {r["l_returnflag"]: (r["hll_estimate"], r["zero_registers"]) for r in rows}
    assert key(one) == key(many)


def test_table_checksum_order_independent(spark):
    """Checksum is a sum mod prime — shuffling partitioning/order must
    not change it, and a single-row perturbation must."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.profiling import table_checksum

    compare(spark, ALL_QUERIES["table_checksum"], ALL_ORACLES["table_checksum"], SF_SMOKE)

    base = {r["l_returnflag"]: r["checksum"] for r in table_checksum(spark, SF_SMOKE).collect()}

    # same data, different partitioning → identical checksums
    import multithreaded_map_reduce_spark.queries.profiling as prof
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    # recompute via the operator body on a reshuffled frame by monkey-free
    # route: checksum of li.repartition equals checksum of li — covered by
    # running the query twice (Spark gives no ordering guarantees anyway),
    # so instead assert sensitivity: flipping one l_linenumber changes
    # exactly that flag's checksum.
    pick = li.select("l_orderkey", "l_linenumber").head()
    flipped = li.withColumn(
        "l_linenumber",
        F.when(
            (F.col("l_orderkey") == pick[0]) & (F.col("l_linenumber") == pick[1]),
            F.lit(pick[1] + 1000),
        ).otherwise(F.col("l_linenumber")),
    )
    import multithreaded_map_reduce_spark.sources.catalog as cat

    orig_load = cat.load_table
    try:
        cat.load_table = lambda s, d, t, **kw: flipped if t == "lineitem" else orig_load(s, d, t, **kw)
        prof_load = prof.load_table
        prof.load_table = cat.load_table
        after = {r["l_returnflag"]: r["checksum"] for r in table_checksum(spark, SF_SMOKE).collect()}
    finally:
        cat.load_table = orig_load
        prof.load_table = prof_load
    assert base != after
    # exactly the flags of the perturbed rows change ((orderkey,
    # linenumber) is not unique in this fixture, so possibly several)
    touched = {
        r["l_returnflag"]
        for r in li.filter(
            (F.col("l_orderkey") == pick[0]) & (F.col("l_linenumber") == pick[1])
        ).collect()
    }
    assert {k for k in base if base[k] != after.get(k)} == touched


def test_mg_top_words_gate_and_bounds(spark):
    """MG summary matches its oracle; for every reported word the
    containment mg_lower <= true count <= mg_upper holds (the
    Misra-Gries guarantee, checked against exact counts)."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["mg_top_words"], ALL_ORACLES["mg_top_words"], SF_SMOKE
    ) > 0
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        r["word"]: r["n"]
        for r in docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in ALL_QUERIES["mg_top_words"](spark, SF_SMOKE).collect():
        assert r["mg_lower"] <= exact[r["word"]] <= r["mg_upper"], r
