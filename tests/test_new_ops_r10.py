"""Round-6 session additions: two-stage IVFPQ->exact re-rank, the
full-ladder ANN recall report, deterministic training order."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_ivfpq_rerank_gate(spark):
    from multithreaded_map_reduce_spark.queries.similarity import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["sim_topk_ivfpq_rerank"],
        ORACLES["sim_topk_ivfpq_rerank"],
        SF_SMOKE,
    )


def test_rerank_recall_never_below_ivfpq(spark):
    """Theorem, not tuning: any candidate scoring above a true top-K
    neighbor under the EXACT metric is itself a true top-K neighbor, so
    exact re-ranking of the R>=K ADC candidates retrieves every true
    neighbor the candidate set contains — per-query recall of the
    rerank rung is >= the plain ivfpq rung's, always."""
    from multithreaded_map_reduce_spark.queries.similarity import QUERIES

    rep = QUERIES["ann_recall_report"](spark, SF_SMOKE)
    rows = {(r["rung"], r["query_id"]): r["n_hit"] for r in rep.collect()}
    qids = {q for (rung, q) in rows if rung == "ivfpq"}
    assert qids
    for q in qids:
        assert rows[("ivfpq_rerank", q)] >= rows[("ivfpq", q)], q


def test_recall_report_covers_full_ladder(spark):
    from multithreaded_map_reduce_spark.queries.similarity import (
        _RECALL_RUNGS,
        QUERIES,
    )

    assert set(_RECALL_RUNGS) == {"lsh", "ivf2", "pq", "ivfpq", "ivfpq_rerank"}
    rep = QUERIES["ann_recall_report"](spark, SF_SMOKE)
    got = {r["rung"] for r in rep.select("rung").distinct().collect()}
    assert got == set(_RECALL_RUNGS)


def test_training_order_gate(spark):
    from multithreaded_map_reduce_spark.queries.curation import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["curation_training_order"],
        ORACLES["curation_training_order"],
        SF_SMOKE,
    )


def test_training_order_is_epochwise_permutation(spark):
    """Every epoch orders EVERY doc exactly once; positions are dense
    0..n-1 within each (epoch, shard); the two epochs produce different
    permutations (independent salts)."""
    from multithreaded_map_reduce_spark.queries.curation import (
        TRAIN_EPOCHS,
        TRAIN_SHARDS,
        QUERIES,
    )

    df = QUERIES["curation_training_order"](spark, SF_SMOKE).cache()
    n_docs = df.select("doc_id").distinct().count()
    assert df.count() == n_docs * TRAIN_EPOCHS
    per_epoch = df.groupBy("epoch").count().collect()
    assert {r["count"] for r in per_epoch} == {n_docs}
    dense = (
        df.groupBy("epoch", "shard")
        .agg(F.count("*").alias("n"), F.max("position").alias("mx"),
             F.min("position").alias("mn"))
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    assert dense == 0
    assert df.select("shard").distinct().count() <= TRAIN_SHARDS
    # epoch salts give different orders: the (shard, position) of at
    # least one doc differs between epochs
    e0 = df.filter(F.col("epoch") == 0).select(
        "doc_id", F.struct("shard", "position").alias("p0")
    )
    e1 = df.filter(F.col("epoch") == 1).select(
        "doc_id", F.struct("shard", "position").alias("p1")
    )
    moved = e0.join(e1, "doc_id").filter(F.col("p0") != F.col("p1")).count()
    assert moved > 0
    df.unpersist()


def test_training_order_no_global_sort(spark):
    """The plan must contain no global Sort — ordering is the per-shard
    window only (Sort nodes are all global=false)."""
    import re

    from multithreaded_map_reduce_spark.queries.curation import QUERIES

    d = QUERIES["curation_training_order"](spark, SF_SMOKE)
    plan = d._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Sort \[.*?\], (true|false)", plan):
        assert m.group(1) == "false", plan


def test_quality_logreg_gate(spark):
    from multithreaded_map_reduce_spark.queries.textstats import ORACLES, QUERIES

    compare(spark, QUERIES["quality_logreg"], ORACLES["quality_logreg"], SF_SMOKE)


def test_quality_logreg_actually_learns(spark):
    """The distilled scorer must beat the keep-everything baseline on
    its teacher labels — train agreement > base rate — and separate the
    classes by score. Guards against the classifier degenerating into
    the base-rate predictor (the failure mode of unstandardized GD)."""
    from multithreaded_map_reduce_spark.queries.textstats import QUERIES

    rows = QUERIES["quality_logreg"](spark, SF_SMOKE).collect()
    n = sum(r["n_docs"] for r in rows)
    agree = sum(r["n_docs"] for r in rows if r["keep"] == r["pred_keep"])
    base = sum(r["n_docs"] for r in rows if r["keep"] == 1)
    assert agree / n > max(base, n - base) / n
    kept = [r for r in rows if r["keep"] == 1]
    dropped = [r for r in rows if r["keep"] == 0]
    avg_kept = sum(r["avg_score"] * r["n_docs"] for r in kept) / sum(
        r["n_docs"] for r in kept
    )
    avg_dropped = sum(r["avg_score"] * r["n_docs"] for r in dropped) / sum(
        r["n_docs"] for r in dropped
    )
    assert avg_kept > avg_dropped + 0.2


def test_quality_logreg_no_collect_driver_loop(spark):
    """The GD TRAIN CHAIN is one lazy plan — weight relations are
    crossJoin-broadcast, so building the LOGREG_ITERS-step chain runs
    no jobs and the unrolled iterations live in a single plan.

    (quality_logreg itself became deliberately EAGER in round 7 — it
    materializes once and unpersists its feature cache, ADVICE r6 — so
    the laziness contract is asserted on the chain the query builds,
    where the per-iteration-collect anti-pattern would actually live.)"""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries.textstats import (
        LOGREG_ITERS,
        _LR_NX,
        _lr_features,
        _lr_standardize,
        _lr_step,
        QUERIES,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    zfeat = _lr_standardize(_lr_features(load_table(spark, SF_SMOKE, "documents")))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(_LR_NX + 1)]
    )
    for _ in range(LOGREG_ITERS):
        w = _lr_step(zfeat, w)
    after = len(tracker.getJobIdsForGroup(None) or [])
    # chain construction runs NO jobs — a collect()-based trainer would
    # launch >= LOGREG_ITERS here
    assert after - before == 0, "GD chain construction ran per-iteration jobs"
    plan = w._jdf.queryExecution().optimizedPlan().toString()
    # the unrolled iterations live IN the single plan: one sigmoid per
    # training step
    assert plan.count("EXP(") + plan.count("exp(") >= LOGREG_ITERS
    # and the public query still returns the full confusion grid
    assert QUERIES["quality_logreg"](spark, SF_SMOKE).count() >= 2


def test_streaming_quality_score_gate(spark):
    from multithreaded_map_reduce_spark.queries.streaming_gate import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["streaming_quality_score"],
        ORACLES["streaming_quality_score"],
        SF_SMOKE,
    )


def test_streaming_quality_score_is_stateless_append(spark):
    """The scorer must be a stateless append stream — per-row exprs +
    a 1-row stream-static join, NO stateful operator (state O(1) at
    any stream length). The memory-sink row count equals the day-2
    batch slice exactly once (no update-mode re-emission)."""
    from multithreaded_map_reduce_spark.queries.streaming_gate import QUERIES
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    out = QUERIES["streaming_quality_score"](spark, SF_SMOKE)
    n_day2 = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .count()
    )
    assert out.count() == n_day2
    assert out.select("doc_id").distinct().count() == n_day2


def test_domain_cap_gate(spark):
    from multithreaded_map_reduce_spark.queries.curation import ORACLES, QUERIES

    compare(
        spark, QUERIES["curation_domain_cap"], ORACLES["curation_domain_cap"], SF_SMOKE
    )


def test_domain_cap_layout_independent(spark):
    """The two-stage bottom-k must give the SAME kept set regardless of
    physical partitioning (the _pid salt must never leak into the
    answer)."""
    from multithreaded_map_reduce_spark.queries.curation import QUERIES
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    base = QUERIES["curation_domain_cap"](spark, SF_SMOKE)
    got = {(r["source"], r["rk"], r["doc_id"]) for r in base.collect()}
    # force a different layout by repartitioning the source table view
    docs = load_table(spark, SF_SMOKE, "documents").repartition(7, "doc_id")
    docs.createOrReplaceTempView("_cap_relayout")
    import multithreaded_map_reduce_spark.queries.curation as cur
    from pyspark.sql import functions as FF

    h = cur.token_hash(
        FF.concat(FF.lit("cap:"), FF.col("doc_id").cast("string"))
    )
    b = docs.select("source", "doc_id", h.alias("_h")).withColumn(
        "_pid", FF.spark_partition_id()
    )
    from pyspark.sql import Window as WW

    w1 = WW.partitionBy("source", "_pid").orderBy(FF.asc("_h"), FF.asc("doc_id"))
    local = (
        b.withColumn("_rn", FF.row_number().over(w1))
        .filter(FF.col("_rn") <= cur.DOMAIN_CAP)
        .drop("_rn", "_pid")
    )
    w2 = WW.partitionBy("source").orderBy(FF.asc("_h"), FF.asc("doc_id"))
    other = (
        local.withColumn("rk", FF.row_number().over(w2).cast("int"))
        .filter(FF.col("rk") <= cur.DOMAIN_CAP)
        .select("source", "rk", "doc_id")
    )
    assert {(r["source"], r["rk"], r["doc_id"]) for r in other.collect()} == got


def test_ppr_gate(spark):
    from multithreaded_map_reduce_spark.queries.graphrank import ORACLES, QUERIES

    compare(
        spark, QUERIES["ppr_region_nations"], ORACLES["ppr_region_nations"], SF_SMOKE
    )


def test_ppr_mass_concentrates_on_restart_region(spark):
    """Personalization sanity: the seed region's nations hold MORE
    total rank than any other region (teleport + dangling mass return
    there), and total mass stays ~SCALE (floor-truncation loss only)."""
    from multithreaded_map_reduce_spark.operators.pagerank import SCALE
    from multithreaded_map_reduce_spark.queries.graphrank import (
        NUM_ITER,
        PPR_REGION,
        QUERIES,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    pr = QUERIES["ppr_region_nations"](spark, SF_SMOKE)
    nation = load_table(spark, SF_SMOKE, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_regionkey"
    )
    per_region = {
        r["n_regionkey"]: r["mass"]
        for r in pr.join(nation, "nationkey")
        .groupBy("n_regionkey")
        .agg(F.sum("rank_units").alias("mass"))
        .collect()
    }
    seed_mass = per_region[PPR_REGION]
    assert all(
        seed_mass > m for reg, m in per_region.items() if reg != PPR_REGION
    ), per_region
    total = sum(per_region.values())
    assert SCALE - total < NUM_ITER * 25 * 30  # truncation-only loss


def test_logreg_pr_gate(spark):
    from multithreaded_map_reduce_spark.queries.textstats import ORACLES, QUERIES

    compare(
        spark, QUERIES["quality_logreg_pr"], ORACLES["quality_logreg_pr"], SF_SMOKE
    )


def test_logreg_pr_monotone_tradeoff(spark):
    """Raising the threshold can only LOWER recall and shrink the kept
    set — the monotonicity that makes the curve an operator's tuning
    knob; every threshold's confusion counts must cover the corpus."""
    from multithreaded_map_reduce_spark.queries.textstats import QUERIES

    rows = sorted(
        QUERIES["quality_logreg_pr"](spark, SF_SMOKE).collect(),
        key=lambda r: r["threshold"],
    )
    n = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in rows}
    assert len(n) == 1
    kept = [r["tp"] + r["fp"] for r in rows]
    rec = [r["recall"] for r in rows]
    assert kept == sorted(kept, reverse=True)
    assert rec == sorted(rec, reverse=True)


def test_shard_budget_gate(spark):
    from multithreaded_map_reduce_spark.queries.curation import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["curation_shard_budget"],
        ORACLES["curation_shard_budget"],
        SF_SMOKE,
    )


def test_shard_budget_conserves_tokens(spark):
    """Per epoch, shard token masses sum to the corpus total and the
    balance ratios average to 1 — the conservation property that makes
    the report trustworthy."""
    from multithreaded_map_reduce_spark.queries.curation import QUERIES
    from multithreaded_map_reduce_spark.queries.textstats import QUERIES as TQ

    rows = QUERIES["curation_shard_budget"](spark, SF_SMOKE).collect()
    total_tokens = sum(
        r["n_ws_tokens"]
        for r in TQ["text_token_count"](spark, SF_SMOKE).collect()
    )
    epochs = {r["epoch"] for r in rows}
    for e in epochs:
        er = [r for r in rows if r["epoch"] == e]
        assert sum(r["sum_tokens"] for r in er) == total_tokens
        mean_ratio = sum(r["balance_ratio"] for r in er) / len(er)
        assert abs(mean_ratio - 1.0) < 0.01


def test_phash_neardup_gate(spark):
    from multithreaded_map_reduce_spark.queries.multimodal import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["multimodal_phash_neardup"],
        ORACLES["multimodal_phash_neardup"],
        SF_SMOKE,
    )


def test_phash_banding_lossless_vs_bruteforce(spark):
    """Pigeonhole guarantee: HAM_K < HAM_BANDS means banding cannot
    miss a pair within threshold — the banded result must EQUAL the
    uncapped brute-force all-pairs Hamming join on the same hashes
    (no bucket hits the cap at this SF, so the cap doesn't bite)."""
    from multithreaded_map_reduce_spark.operators.multimodal import (
        documents_as_ppm_images,
        extract_image_dhash,
    )
    from multithreaded_map_reduce_spark.queries.multimodal import (
        HAM_K,
        QUERIES,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in QUERIES["multimodal_phash_neardup"](spark, SF_SMOKE).collect()
    }
    d = extract_image_dhash(
        documents_as_ppm_images(load_table(spark, SF_SMOKE, "documents"))
    )
    rows = [(r["media_id"], r["dhash_lo"], r["dhash_hi"]) for r in d.collect()]
    brute = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[0] > b[0]:
                a, b = b, a
            h = bin(a[1] ^ b[1]).count("1") + bin(a[2] ^ b[2]).count("1")
            if h <= HAM_K:
                brute.add((a[0], b[0], h))
    assert banded == brute


def test_token_budget_gate(spark):
    from multithreaded_map_reduce_spark.queries.curation import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["curation_token_budget"],
        ORACLES["curation_token_budget"],
        SF_SMOKE,
    )


def test_token_budget_never_overshoots(spark):
    """Strict budget: every source's kept token mass stays within its
    quota, quotas sum within the global budget, and the fill is tight —
    adding the next doc in hash order would exceed quota (checked via
    kept_tokens + smallest unkept doc > quota is NOT required; tightness
    here = kept_tokens <= quota < kept_tokens + max_doc_tokens + slack
    is data-dependent, so assert the two hard invariants only)."""
    from multithreaded_map_reduce_spark.queries.curation import (
        TOKEN_BUDGET,
        QUERIES,
    )

    rows = QUERIES["curation_token_budget"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["kept_tokens"] <= r["quota"], r
    assert sum(r["quota"] for r in rows) <= TOKEN_BUDGET


def test_decontaminate_semantic_gate(spark):
    from multithreaded_map_reduce_spark.queries.curation import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["curation_decontaminate_semantic"],
        ORACLES["curation_decontaminate_semantic"],
        SF_SMOKE,
    )


def test_decontaminate_semantic_broadcasts_benchmark(spark):
    """The benchmark side must broadcast — a shuffle cartesian of the
    corpus embedding relation would be the 100 TB killer."""
    from multithreaded_map_reduce_spark.plans import plan_report
    from multithreaded_map_reduce_spark.queries.curation import QUERIES

    rep = plan_report(QUERIES["curation_decontaminate_semantic"](spark, SF_SMOKE))
    assert not rep.cartesian


def test_js_by_source_gate(spark):
    from multithreaded_map_reduce_spark.queries.textstats import ORACLES, QUERIES

    compare(
        spark, QUERIES["text_js_by_source"], ORACLES["text_js_by_source"], SF_SMOKE
    )


def test_js_by_source_bounds(spark):
    """JS divergence lives in [0, ln 2]; on this near-homogeneous
    fixture every source sits strictly inside (positive — no source IS
    the corpus — and far from disjoint)."""
    import math

    from multithreaded_map_reduce_spark.queries.textstats import QUERIES

    rows = QUERIES["text_js_by_source"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["js_divergence"] < math.log(2), r


def test_streaming_drift_gate(spark):
    from multithreaded_map_reduce_spark.queries.streaming_gate import (
        ORACLES,
        QUERIES,
    )

    compare(
        spark,
        QUERIES["streaming_drift_monitor"],
        ORACLES["streaming_drift_monitor"],
        SF_SMOKE,
    )


def test_streaming_drift_state_is_bounded(spark):
    """The streaming aggregation's state is the bucket spine — at most
    DRIFT_BUCKETS rows in the sink regardless of stream length — and
    the divergence on same-generator day-1/day-2 slices is small but
    positive."""
    import math

    from multithreaded_map_reduce_spark.queries.streaming_gate import (
        DRIFT_BUCKETS,
        QUERIES,
    )

    row = QUERIES["streaming_drift_monitor"](spark, SF_SMOKE).collect()[0]
    assert 0.0 < row["js_divergence"] < math.log(2) / 4
    assert row["n_stream_tokens"] > DRIFT_BUCKETS


def test_phash_clusters_gate(spark):
    from multithreaded_map_reduce_spark.queries.multimodal import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["multimodal_phash_clusters"],
        ORACLES["multimodal_phash_clusters"],
        SF_SMOKE,
    )


def test_phash_clusters_consistent_with_pairs(spark):
    """Every near-dup pair shares a canonical id; every canonical id is
    a member of its own cluster; singletons label themselves."""
    from multithreaded_map_reduce_spark.queries.multimodal import QUERIES

    labels = {
        r["media_id"]: r["canonical_id"]
        for r in QUERIES["multimodal_phash_clusters"](spark, SF_SMOKE).collect()
    }
    pairs = QUERIES["multimodal_phash_neardup"](spark, SF_SMOKE).collect()
    assert pairs
    for p in pairs:
        assert labels[p["id_a"]] == labels[p["id_b"]], p
    for mid, canon in labels.items():
        assert labels[canon] == canon
        assert canon <= mid


def test_cross_source_matrix_gate(spark):
    from multithreaded_map_reduce_spark.queries.dedup import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["dedup_cross_source_matrix"],
        ORACLES["dedup_cross_source_matrix"],
        SF_SMOKE,
    )


def test_cross_source_matrix_accounts_for_every_pair(spark):
    """The matrix's pair mass equals the LSH pair relation exactly, and
    every row is canonically ordered (source_lo <= source_hi)."""
    from multithreaded_map_reduce_spark.queries.dedup import QUERIES

    rows = QUERIES["dedup_cross_source_matrix"](spark, SF_SMOKE).collect()
    n_pairs = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    assert all(r["source_lo"] <= r["source_hi"] for r in rows)
