"""Round-7 additions: PPJoin-style prefix-filtered jaccard join,
context-window chunking, bucketized interval-overlap self-join, and the
two-pass Pareto frontier (skyline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare

R7_NAMES = (
    "dedup_jaccard_prefix",
    "curation_chunk",
    "interval_overlap_orders",
    "pareto_frontier_parts",
)


def test_r7_ops_match_oracles(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    for name in R7_NAMES:
        compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_chunking_covers_every_token_with_fixed_overlap(spark):
    """Every token index of every doc appears in >= 1 chunk; interior
    chunks are exactly CHUNK_TOKENS long and consecutive chunk starts
    differ by exactly CHUNK_STRIDE."""
    from multithreaded_map_reduce_spark.queries import curation
    from multithreaded_map_reduce_spark.queries.curation import curation_chunk
    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    c, s = curation.CHUNK_TOKENS, curation.CHUNK_STRIDE
    n_by_doc = {
        r.doc_id: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(tokenize(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    chunks = curation_chunk(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        n = n_by_doc[doc_id]
        # chunk i covers token indices [i*s, i*s + n_tokens)
        covered_to = 0
        for i, r in enumerate(rows):
            assert r.chunk_idx == i
            start = i * s
            assert start <= covered_to  # no gap
            covered_to = max(covered_to, start + r.n_tokens)
            if i < len(rows) - 1:
                assert r.n_tokens == c  # interior chunks are full
        assert covered_to == n  # full coverage, no overshoot


def test_pareto_frontier_equals_bruteforce(spark):
    """The two-pass window skyline equals the O(n^2) dominance
    definition computed driver-side."""
    from multithreaded_map_reduce_spark.queries.mining import pareto_frontier_parts
    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    pts = {
        (r.price_cents, r.best_size)
        for r in load_table(spark, SF_SMOKE, "part")
        .select(iunits(F.col("p_retailprice"), 2).alias("price_cents"), "p_size")
        .groupBy("price_cents")
        .agg(F.max("p_size").alias("best_size"))
        .collect()
    }
    brute = {
        (p, sz)
        for (p, sz) in pts
        if not any(
            (q < p and t >= sz) or (q <= p and t > sz) for (q, t) in pts
        )
    }
    got = {
        (r.price_cents, r.best_size)
        for r in pareto_frontier_parts(spark, SF_SMOKE).collect()
    }
    assert got == brute and got


def test_interval_overlap_counts_match_bruteforce(spark):
    """The bucketized equality-join concurrency counts equal a
    driver-side brute force over the urgent subset."""
    from multithreaded_map_reduce_spark.queries import timeseries
    from multithreaded_map_reduce_spark.queries.timeseries import (
        interval_overlap_orders,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    w = timeseries.OVERLAP_DAYS
    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 10).alias("clerk"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
                "d"
            ),
        )
        .collect()
    )
    by_clerk: dict[int, list] = {}
    for r in rows:
        by_clerk.setdefault(r.clerk, []).append(r)
    want = {}
    for rs in by_clerk.values():
        for a in rs:
            want[a.o_orderkey] = sum(
                1 for b in rs if b.o_orderkey != a.o_orderkey and abs(b.d - a.d) <= w
            )
    got = {
        r.o_orderkey: r.n_concurrent
        for r in interval_overlap_orders(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_prefix_filter_is_lossless_on_adversarial_sets(spark):
    """Hand-built corpus where naive prefix choices would miss pairs:
    identical docs, and a pair landing EXACTLY on the J = 0.8 boundary,
    must survive; sub-threshold pairs must not."""
    from multithreaded_map_reduce_spark.queries.dedup import dedup_jaccard_prefix

    # doc 1/2 identical (J=1); 4/5 differ in the LAST of 10 tokens:
    # 9 bigrams each sharing 8 -> J = 8/10 = 0.8 exactly (boundary in);
    # 3 is unrelated
    rows = [
        (1, "alpha beta gamma delta", "en", "s", 1),
        (2, "alpha beta gamma delta", "en", "s", 1),
        (3, "zeta eta theta iota", "en", "s", 1),
        (4, "t1 t2 t3 t4 t5 t6 t7 t8 t9 tA", "en", "s", 1),
        (5, "t1 t2 t3 t4 t5 t6 t7 t8 t9 tB", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import multithreaded_map_reduce_spark.queries.dedup as dd
    from multithreaded_map_reduce_spark.sources import catalog

    orig = catalog.load_table
    # r10: the query starts from the module-level shared shingle
    # artifact (_SHINGLE_ROWS_CACHE) — swap the cache entry for the
    # synthetic corpus too, else a previously-cached real-corpus
    # artifact bypasses the load_table monkeypatch entirely
    saved_rows = dict(dd._SHINGLE_ROWS_CACHE)
    saved_ranked = dict(dd._RANKED_SHINGLES_CACHE)
    try:
        catalog.load_table = lambda sp, sf, name: docs  # noqa: E731
        dd.load_table = catalog.load_table
        dd._SHINGLE_ROWS_CACHE.clear()
        dd._RANKED_SHINGLES_CACHE.clear()
        out = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup_jaccard_prefix(spark, SF_SMOKE).collect()
        }
    finally:
        catalog.load_table = orig
        dd.load_table = orig
        dd._SHINGLE_ROWS_CACHE.clear()
        dd._SHINGLE_ROWS_CACHE.update(saved_rows)
        dd._RANKED_SHINGLES_CACHE.clear()
        dd._RANKED_SHINGLES_CACHE.update(saved_ranked)
    assert out[(1, 2)] == 1.0
    # docs 4,5: 9 bigrams each, 8 shared -> J = 8/(9+9-8) = 0.8 exactly
    assert abs(out[(4, 5)] - 0.8) < 1e-9
    assert (1, 3) not in out and (2, 3) not in out
    assert not any(3 in p for p in out)


R7B_NAMES = ("sparse_cosine_pairs", "linkage_customers", "quality_winsorize")


def test_r7b_ops_match_oracles(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    for name in R7B_NAMES:
        compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_sparse_cosine_identical_docs_score_one(spark):
    """Two identical docs share every posting, so their integer
    numerator equals both norms and the cosine is exactly 1.0; a doc
    with no shared sub-cap terms never pairs."""
    import multithreaded_map_reduce_spark.queries.similarity as sim

    rows = [
        (1, "red green blue", "en", "s", 1),
        (2, "red green blue", "en", "s", 1),
        (3, "cyan magenta yellow", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = sim.load_table
    try:
        sim.load_table = lambda sp, sf, name: docs  # noqa: E731
        out = {
            (r.id_a, r.id_b): r.cosine
            for r in sim.sparse_cosine_pairs(spark, SF_SMOKE).collect()
        }
    finally:
        sim.load_table = orig
    assert out == {(1, 2): 1.0}


def test_winsorize_sum_is_exact_integer_sixteenths(spark):
    """The winsorized sum must equal a driver-side recomputation using
    Fraction arithmetic — proving the dyadic-percentile exactness
    argument, not just engine agreement."""
    from fractions import Fraction

    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries.quality import quality_winsorize
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    vals: dict[str, list[int]] = {}
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("c"))
        .collect()
    ):
        vals.setdefault(r.l_returnflag, []).append(r.c)
    got = {r.l_returnflag: r for r in quality_winsorize(spark, SF_SMOKE).collect()}
    for flag, cs in vals.items():
        cs.sort()
        n = len(cs)

        def cut(p: Fraction) -> Fraction:
            h = p * (n - 1)
            lo_i = int(h)
            frac = h - lo_i
            hi_i = min(lo_i + 1, n - 1)
            return cs[lo_i] + frac * (cs[hi_i] - cs[lo_i])

        lo, hi = cut(Fraction(1, 16)), cut(Fraction(15, 16))
        total = sum(max(min(Fraction(c), hi), lo) for c in cs) * 16
        assert total.denominator == 1
        assert got[flag].winsorized_sixteenth_cents == int(total), flag


def test_gini_matches_fraction_bruteforce(spark):
    """The windowed-rank Gini equals an exact rational recomputation."""
    from fractions import Fraction

    from multithreaded_map_reduce_spark.functions.rounding import iunits
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.profiling import stats_gini
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    compare(spark, ALL_QUERIES["stats_gini"], ALL_ORACLES["stats_gini"], SF_SMOKE)
    vals: dict[str, list[int]] = {}
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("c"))
        .collect()
    ):
        vals.setdefault(r.l_returnflag, []).append(r.c)
    got = {r.l_returnflag: r.gini for r in stats_gini(spark, SF_SMOKE).collect()}
    for flag, cs in vals.items():
        cs.sort()
        n, s = len(cs), sum(cs)
        g = Fraction(2 * sum(i * x for i, x in enumerate(cs, 1)) - (n + 1) * s, n * s)
        # same portable rounding as the engines
        import math

        want = math.floor(float(g) * 1e6 + 0.5) / 1e6
        assert abs(got[flag] - want) < 1e-12, flag


def test_rolling_distinct_matches_bruteforce(spark):
    """Contribution-explode rolling distinct equals a driver-side
    brute force over (user, day) pairs, and matches its oracle."""
    import datetime as dt

    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.events import events_rolling_distinct
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    compare(
        spark,
        ALL_QUERIES["events_rolling_distinct"],
        ALL_ORACLES["events_rolling_distinct"],
        SF_SMOKE,
    )
    pairs = {
        (r.user_id, r.day)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    }
    days = {d for _, d in pairs}
    want = {
        d: len({u for (u, ud) in pairs if dt.timedelta(0) <= d - ud <= dt.timedelta(6)})
        for d in days
    }
    got = {
        r.day: r.n_active_7d for r in events_rolling_distinct(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_bpe_encode_matches_python_reference(spark):
    """The chained-replace encode equals a pure-Python BPE that applies
    merges in rank order with left-to-right non-overlapping greed."""
    from collections import Counter

    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.textstats import (
        BPE_MERGES,
        bpe_encode,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    compare(spark, ALL_QUERIES["bpe_encode"], ALL_ORACLES["bpe_encode"], SF_SMOKE)

    def encode(word: str) -> list[str]:
        units = list(word)
        for a, b in BPE_MERGES:
            out, i = [], 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == a and units[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            units = out
        return units

    vocab = Counter()
    for r in (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .collect()
    ):
        vocab[r.tok] += 1
    want_occ = {a + b: 0 for a, b in BPE_MERGES}
    want_words = {a + b: 0 for a, b in BPE_MERGES}
    for word, freq in vocab.items():
        c = Counter(encode(word))
        for u in want_occ:
            if c[u]:
                want_occ[u] += c[u] * freq
                want_words[u] += 1
    got = {r.unit: (r.occurrences, r.n_distinct_words) for r in bpe_encode(spark, SF_SMOKE).collect()}
    for u in want_occ:
        assert got[u] == (want_occ[u], want_words[u]), u


def test_hll_rollup_merge_equals_direct_sketch(spark):
    """The merged ALL row must be bit-identical to a direct global
    sketch computed from all rows (register max is associative), and
    the query must match its oracle."""
    from multithreaded_map_reduce_spark.operators.sketches import hll_distinct
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.sketches import hll_union_rollup
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    compare(
        spark, ALL_QUERIES["hll_union_rollup"], ALL_ORACLES["hll_union_rollup"], SF_SMOKE
    )
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn("one", F.lit("ALL"))
    direct = hll_distinct(li, "one", "l_partkey").collect()[0]
    merged = {
        r.grp: r for r in hll_union_rollup(spark, SF_SMOKE).collect()
    }["ALL"]
    assert merged.hll_estimate == direct.hll_estimate
    assert merged.zero_registers == direct.zero_registers


def test_scd2_asof_and_kcore_match_oracles(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    for name in ("scd2_asof_enrich", "kcore_parts"):
        compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_kcore_matches_python_peeling(spark):
    """Fixed-round distributed peeling equals an in-memory simulation
    of the same synchronized rounds."""
    from multithreaded_map_reduce_spark.queries import graphrank
    from multithreaded_map_reduce_spark.queries.graphrank import kcore_parts
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = [
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ]
    by_order: dict[int, set] = {}
    for o, p in li:
        by_order.setdefault(o, set()).add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    for _ in range(graphrank.KCORE_ROUNDS):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= graphrank.KCORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    want: dict[int, int] = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    got = {r.part: r.degree for r in kcore_parts(spark, SF_SMOKE).collect()}
    assert got == want


def test_r7c_ops_match_oracles(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    for name in (
        "window_median_sliding",
        "events_new_vs_returning",
        "ivm_join_delta",
    ):
        compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_new_vs_returning_invariants(spark):
    """new + returning == distinct actives that day; the cumulative
    column ends at the global distinct user count."""
    from multithreaded_map_reduce_spark.queries.events import events_new_vs_returning
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    total_users = ev.select("user_id").distinct().count()
    rows = sorted(
        events_new_vs_returning(spark, SF_SMOKE).collect(), key=lambda r: r.day
    )
    daily_active = {
        r.day: r.n
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.new_users + r.returning_users == daily_active[r.day]
    assert rows[-1].cumulative_distinct_users == total_users


def test_r7d_ops_match_oracles(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    for name in (
        "privacy_erasure",
        "dq_quarantine_orders",
        "connector_compaction",
        "connector_dpp_join",
    ):
        compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_compaction_collapses_file_count(spark):
    """The fragmented write produces ~64 parquet files; the compacted
    copy exactly 4 — and the row count survives."""
    import glob
    import uuid

    from multithreaded_map_reduce_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    frag = f"/tmp/test_frag_{uuid.uuid4().hex}"
    li.repartition(64).write.mode("overwrite").parquet(frag)
    out = f"/tmp/test_compact_{uuid.uuid4().hex}"
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(out)
    n_frag = len(glob.glob(f"{frag}/part-*.parquet"))
    n_out = len(glob.glob(f"{out}/part-*.parquet"))
    assert n_frag == 64 and n_out == 4, (n_frag, n_out)
    assert spark.read.parquet(out).count() == li.count()


def test_forward_asof_matches_pandas_merge_asof(spark):
    """The forward union-window formulation equals pd.merge_asof
    direction='forward' on the same relations, and the gate compare
    passes."""
    import pandas as pd

    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.events import asof_join_forward
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    compare(
        spark, ALL_QUERIES["asof_join_forward"], ALL_ORACLES["asof_join_forward"], SF_SMOKE
    )
    ev = load_table(spark, SF_SMOKE, "events")
    pdf = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tus"),
    ).toPandas()
    got = {
        r.event_id: (r.err_id, r.micros_to_error)
        for r in asof_join_forward(spark, SF_SMOKE).collect()
    }
    p = pdf[pdf.event_type == "purchase"].sort_values("tus", kind="mergesort")
    e = (
        pdf[pdf.event_type == "error"]
        .groupby(["user_id", "tus"], as_index=False)
        .agg(err_id=("event_id", "min"))
        .sort_values("tus", kind="mergesort")
    )
    m = pd.merge_asof(
        p,
        e.rename(columns={"tus": "etus"}),
        left_on="tus",
        right_on="etus",
        by="user_id",
        direction="forward",
        tolerance=3600 * 1_000_000,
    )
    for _, r in m.iterrows():
        want = (
            (None, None)
            if pd.isna(r.err_id)
            else (int(r.err_id), int(r.etus - r.tus))
        )
        assert got[int(r.event_id)] == want, r.event_id
