"""Sketch queries: approximate distinct counting with exact oracles
(operators/sketches.py — KMV is deterministic in both engines, unlike
engine-internal HLL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import kmv_distinct, sql_kmv_distinct
from ..sources.catalog import load_table

K = 64


def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: KMV estimate vs exact distinct part count."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, "l_returnflag", "l_partkey", k=K)


QUERIES = {"kmv_distinct_parts": kmv_distinct_parts}

ORACLES = {
    "kmv_distinct_parts": sql_kmv_distinct("lineitem", "l_returnflag", "l_partkey", K)
}


def cms_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min top-20 tokens over the documents corpus — the sketch
    answer to ``top_words`` (exact); comparing the two quantifies CMS
    overcount on this corpus."""
    from pyspark.sql import functions as F

    from ..functions.text import tokenize as _tokens
    from ..operators.sketches import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
    return cms_heavy_hitters(toks, "word").withColumnRenamed("val", "word")


QUERIES["cms_top_words"] = cms_top_words

from ..functions.hashing import sql_tokens as _sql_tokens  # noqa: E402
from ..operators.sketches import sql_cms_heavy_hitters as _sql_cms  # noqa: E402

ORACLES["cms_top_words"] = _sql_cms(
    f"SELECT unnest({_sql_tokens('text')}) AS val FROM documents",
    val_alias="word",
)


def hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: deterministic HyperLogLog estimate (256 exact
    integer registers, one shared-literal IEEE division) vs exact
    distinct part count — the register-sketch sibling of
    ``kmv_distinct_parts``; see operators/sketches.py for the
    cross-engine determinism construction."""
    from ..operators.sketches import hll_distinct

    li = load_table(spark, sf_dir, "lineitem")
    return hll_distinct(li, "l_returnflag", "l_partkey")


QUERIES["hll_distinct_parts"] = hll_distinct_parts

from ..operators.sketches import sql_hll_distinct as _sql_hll  # noqa: E402

ORACLES["hll_distinct_parts"] = _sql_hll("lineitem", "l_returnflag", "l_partkey")


# --- mergeable equi-width histogram quantile sketch --------------------------

HQ_BINS = 256
HQ_QS = (50, 90, 99)  # integer percents — thresholds stay integer-exact


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group quantiles from a mergeable equi-width
    histogram — the constant-memory alternative to exact percentile()
    at 100 TB (exact percentiles need a full sort or large t-digest
    state; a fixed 256-bin count vector merges associatively, so the
    whole sketch is one map-side-combinable groupBy).

    Everything is integer: prices in cents, bin = (c-lo)·256 div span,
    threshold = ceil(q%·n) via (n·q+99) div 100, estimate = the lower
    bound of the first bin whose cumulative count reaches the
    threshold. The estimate is deterministic and differentially
    replayed bin-for-bin; error is bounded by one bin width.

    Scale: one tiny global min/max agg broadcast to the scan; one
    shuffle on the group key carrying ≤ |groups|·256 partial rows.
    """
    from pyspark.sql import Window

    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    cents = iunits(F.col("o_totalprice"), 2)
    bounds = o.agg(
        F.min(cents).alias("lo"), F.max(cents).alias("hi")
    ).select("lo", "hi", (F.col("hi") - F.col("lo") + 1).alias("span"))
    hist = (
        o.select(F.col("o_orderpriority").alias("prio"), cents.alias("c"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "prio",
            "lo",
            "span",
            F.expr(f"(c - lo) * {HQ_BINS} div span").alias("bin"),
        )
        .groupBy("prio", "lo", "span", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("prio").orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("prio")
    ann = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    aggs = [F.max("n").alias("n")]
    for q in HQ_QS:
        est_bin = F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {q} + 99) div 100"), F.col("bin")
            )
        )
        # floor-div, not /-then-cast: Spark cast(long) truncates while
        # DuckDB CAST AS BIGINT rounds. Division by HQ_BINS (a power of
        # two, numerator < 2^53) is exact in IEEE, so floor() is the
        # true integer quotient on both engines.
        aggs.append(
            (
                F.max("lo")
                + F.floor(est_bin * F.max("span") / F.lit(HQ_BINS)).cast("long")
            ).alias(f"p{q}_cents")
        )
    out = ann.groupBy("prio").agg(*aggs)
    cols = ["prio", "n"]
    for q in HQ_QS:
        cols.append(f"p{q}_cents")
    return out.select(*cols)


QUERIES["histogram_quantiles"] = histogram_quantiles


def _hq_oracle() -> str:
    from ..functions.rounding import sql_iunits

    c = sql_iunits("o_totalprice", 2)
    est = ", ".join(
        f"max(lo) + min(CASE WHEN cum >= (n * {q} + 99) // 100 "
        f"THEN bin END) * max(span) // {HQ_BINS} AS p{q}_cents"
        for q in HQ_QS
    )
    return f"""
        WITH bounds AS (
            SELECT min({c}) AS lo, max({c}) AS hi,
                   max({c}) - min({c}) + 1 AS span
            FROM orders
        ), hist AS (
            SELECT o_orderpriority AS prio, lo, span,
                   ({c} - lo) * {HQ_BINS} // span AS bin,
                   count(*) AS cnt
            FROM orders, bounds GROUP BY 1, 2, 3, 4
        ), ann AS (
            SELECT prio, lo, span, bin, cnt,
                   sum(cnt) OVER (PARTITION BY prio ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cnt) OVER (PARTITION BY prio) AS n
            FROM hist
        )
        SELECT prio, CAST(max(n) AS BIGINT) AS n, {est}
        FROM ann GROUP BY prio
    """


ORACLES["histogram_quantiles"] = _hq_oracle()


def exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete median per group WITHOUT a global sort — the
    two-pass refinement of ``histogram_quantiles``: pass 1 builds the
    256-bin histogram and locates, per group, the bin containing rank
    k = floor((n−1)/2) + 1; pass 2 re-scans, keeps ONLY that bin's rows
    (a ~1/256 selectivity predicate), and picks the (k − cum_before)-th
    smallest inside it. Equals quantile_disc(x, 0.5) — the oracle says
    so directly.

    At 100 TB this is how you get an exact quantile: the first pass is
    a mergeable count vector, the second sorts only n/256 rows per
    group inside their partitions. No stage sorts the full table.
    Rank arithmetic is pure integer; ties are harmless (the r-th
    smallest VALUE is unique even when row order among equals isn't)."""
    from pyspark.sql import Window

    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    cents = iunits(F.col("o_totalprice"), 2)
    bounds = o.agg(
        F.min(cents).alias("lo"), F.max(cents).alias("hi")
    ).select("lo", (F.col("hi") - F.col("lo") + 1).alias("span"))
    binned = (
        o.select(F.col("o_orderpriority").alias("prio"), cents.alias("c"))
        .crossJoin(F.broadcast(bounds))
        .select("prio", "c", F.expr(f"(c - lo) * {HQ_BINS} div span").alias("bin"))
    )
    hist = binned.groupBy("prio", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("prio")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("prio")
    ann = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    target = (
        ann.withColumn("k", F.expr("(n - 1) div 2 + 1"))
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("prio")
        .agg(
            F.max("n").alias("n"),
            F.min("bin").alias("tbin"),
            F.max("k").alias("k"),
        )
        .join(
            ann.select("prio", "bin", (F.col("cum") - F.col("cnt")).alias("cb")),
            on=["prio"],
        )
        .filter(F.col("bin") == F.col("tbin"))
        .select("prio", "n", "tbin", (F.col("k") - F.col("cb")).alias("r"))
    )
    wrank = Window.partitionBy("prio").orderBy("c")
    return (
        binned.join(F.broadcast(target), "prio")
        .filter(F.col("bin") == F.col("tbin"))
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == F.col("r"))
        .select("prio", "n", F.col("c").alias("median_cents"))
    )


QUERIES["exact_median_twopass"] = exact_median_twopass


def _median2p_oracle() -> str:
    from ..functions.rounding import sql_iunits

    c = sql_iunits("o_totalprice", 2)
    return f"""
        SELECT o_orderpriority AS prio,
               count(*) AS n,
               quantile_disc({c}, 0.5) AS median_cents
        FROM orders GROUP BY 1
    """


ORACLES["exact_median_twopass"] = _median2p_oracle()


def hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA under the gate: per-return-flag HLL register
    vectors over distinct part keys are built once, then the corpus-
    level row is computed by MERGING the flag sketches (register-wise
    max) — never rescanning the data. This is the pre-aggregated-cube
    pattern that makes distinct-count dashboards cheap at 100 TB: keep
    one 256-register vector per cell, answer any rollup by max-merge.

    Register max is associative/commutative, so the merged estimate is
    definitionally equal to a direct global sketch — the oracle replays
    the same two-level computation and the differential gate pins the
    merge arithmetic (integer registers, exact power-of-two harmonic
    sum, ONE shared-literal IEEE division) across engines."""
    from ..operators.sketches import (
        HLL_A,
        HLL_B,
        HLL_M,
        _HLL_K,
        _HLL_NUMER,
    )
    from ..functions.hashing import POLY_MOD

    m = HLL_M
    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        F.col("l_returnflag").alias("grp"),
        F.pmod(
            F.pmod(F.col("l_partkey").cast("long"), F.lit(POLY_MOD)) * F.lit(HLL_A)
            + F.lit(HLL_B),
            F.lit(POLY_MOD),
        ).alias("_h"),
    )
    w = (F.col("_h") / F.lit(m)).cast("long")
    rho = F.when(w == 0, F.lit(24)).otherwise(F.lit(24) - F.length(F.bin(w)))
    flag_regs = (
        hashed.select("grp", (F.col("_h") % F.lit(m)).alias("_j"), rho.alias("_rho"))
        .groupBy("grp", "_j")
        .agg(F.max("_rho").alias("_mj"))
    )
    # the MERGE: register-wise max across flag sketches — no rescan
    all_regs = flag_regs.groupBy("_j").agg(F.max("_mj").alias("_mj")).select(
        F.lit("ALL").alias("grp"), "_j", "_mj"
    )
    levels = flag_regs.unionByName(all_regs)
    per = levels.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_K} - _mj)")).alias("_sp"),
    )
    s = F.col("_sp") + (F.lit(m) - F.col("_present")) * F.lit(1 << _HLL_K)
    from ..functions.rounding import pround

    return per.select(
        "grp",
        (F.lit(m) - F.col("_present")).cast("long").alias("zero_registers"),
        pround(F.lit(float(_HLL_NUMER)) / s.cast("double"), 4).alias("hll_estimate"),
    )


QUERIES["hll_union_rollup"] = hll_union_rollup


def _hll_rollup_oracle() -> str:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import sql_pround
    from ..operators.sketches import HLL_A, HLL_B, HLL_M, _HLL_K, _HLL_NUMER

    m = HLL_M
    est = sql_pround(
        f"{_HLL_NUMER} / CAST(_sp + ({m} - _present)"
        f" * (CAST(1 AS BIGINT) << {_HLL_K}) AS DOUBLE)",
        4,
    )
    return f"""
        WITH hashed AS (
            SELECT l_returnflag AS grp,
                   (((CAST(l_partkey AS BIGINT) % {POLY_MOD} + {POLY_MOD})
                       % {POLY_MOD}) * {HLL_A} + {HLL_B}) % {POLY_MOD} AS _h
            FROM lineitem
        ), flag_regs AS (
            SELECT grp, _h % {m} AS _j,
                   max(CASE WHEN _h // {m} = 0 THEN 24
                            ELSE 24 - length(bin(_h // {m})) END) AS _mj
            FROM hashed GROUP BY 1, 2
        ), all_regs AS (
            SELECT 'ALL' AS grp, _j, max(_mj) AS _mj FROM flag_regs GROUP BY 2
        ), levels AS (
            SELECT * FROM flag_regs UNION ALL SELECT * FROM all_regs
        ), per AS (
            SELECT grp, count(*) AS _present,
                   CAST(sum(CAST(1 AS BIGINT) << ({_HLL_K} - _mj)) AS BIGINT) AS _sp
            FROM levels GROUP BY 1
        )
        SELECT grp,
               CAST({m} - _present AS BIGINT) AS zero_registers,
               {est} AS hll_estimate
        FROM per
    """


ORACLES["hll_union_rollup"] = _hll_rollup_oracle()


# --------------------------------------------- KMV set-operation estimate
# Theta-sketch-style set algebra on two KMV sketches: estimate the
# DISTINCT-KEY OVERLAP between two relations from their k-minimum-value
# sketches alone — the cardinality question a join optimizer (or a
# "how much will this enrichment match?" data-quality check) asks
# without scanning either side twice. θ = min of the two k-th minima;
# every sketch hash ≤ θ is a uniform sample of the union at rate θ/M,
# so |{h in BOTH sketches, h ≤ θ}| / (θ/M) estimates |A ∩ B|. All
# hashes are the portable KMV family → the oracle replays the whole
# estimator bit-for-bit; the exact overlap rides along for reference.
# 100 TB: each sketch is a k-row TakeOrdered over a distinct-hash
# relation (no global sort); the set algebra itself touches 2k rows.

KJ_K = 64


def kmv_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import pround
    from ..operators.sketches import KMV_A, KMV_B

    M = POLY_MOD

    def sketch(df: DataFrame, col: str) -> DataFrame:
        h = F.pmod(
            F.pmod(F.col(col).cast("long"), F.lit(M)) * F.lit(KMV_A) + F.lit(KMV_B),
            F.lit(M),
        )
        return df.select(h.alias("h")).distinct().orderBy("h").limit(KJ_K)

    sa = sketch(load_table(spark, sf_dir, "orders"), "o_custkey")
    sb = sketch(load_table(spark, sf_dir, "customer"), "c_custkey")
    agg_a = sa.agg(F.max("h").alias("hk_a"), F.count(F.lit(1)).alias("n_a"))
    agg_b = sb.agg(F.max("h").alias("hk_b"), F.count(F.lit(1)).alias("n_b"))
    stats = agg_a.crossJoin(agg_b).withColumn(
        "theta", F.least(F.col("hk_a"), F.col("hk_b"))
    )
    n_i = (
        sa.join(sb, "h")
        .crossJoin(stats.select("theta"))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_i"))
    )

    def est(n: str, hk: str) -> F.Column:
        return F.when(F.col(n) < KJ_K, F.col(n).cast("double")).otherwise(
            F.lit(float(KJ_K - 1)) / (F.col(hk).cast("double") / F.lit(float(M)))
        )

    exact = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("k")
            ),
            "k",
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        stats.crossJoin(n_i)
        .crossJoin(exact)
        .select(
            pround(est("n_a", "hk_a"), 4).alias("est_custkeys_with_orders"),
            pround(est("n_b", "hk_b"), 4).alias("est_customers"),
            pround(
                F.col("n_i").cast("double")
                / (F.col("theta").cast("double") / F.lit(float(M))),
                4,
            ).alias("est_overlap"),
            "exact_overlap",
        )
    )


QUERIES["kmv_join_estimate"] = kmv_join_estimate


def _kj_oracle() -> str:
    from ..functions.hashing import POLY_MOD
    from ..operators.sketches import KMV_A, KMV_B

    M = POLY_MOD

    def sk(table: str, col: str) -> str:
        return f"""
        SELECT DISTINCT (((CAST({col} AS BIGINT) % {M} + {M}) % {M})
                         * {KMV_A} + {KMV_B}) % {M} AS h
        FROM {table} ORDER BY h LIMIT {KJ_K}"""

    return f"""
    WITH sa AS ({sk('orders', 'o_custkey')}),
    sb AS ({sk('customer', 'c_custkey')}),
    agg_a AS (SELECT max(h) AS hk_a, count(*) AS n_a FROM sa),
    agg_b AS (SELECT max(h) AS hk_b, count(*) AS n_b FROM sb),
    stats AS (
        SELECT hk_a, n_a, hk_b, n_b, least(hk_a, hk_b) AS theta
        FROM agg_a, agg_b
    ),
    ni AS (
        SELECT count(*) AS n_i
        FROM sa JOIN sb USING (h), stats WHERE h <= theta
    ),
    ex AS (
        SELECT count(*) AS exact_overlap FROM
        (SELECT DISTINCT o_custkey AS k FROM orders) o
        JOIN (SELECT c_custkey AS k FROM customer) c USING (k)
    )
    SELECT
        {{e_a}} AS est_custkeys_with_orders,
        {{e_b}} AS est_customers,
        floor((CAST(n_i AS DOUBLE) / (CAST(theta AS DOUBLE) / {float(M)}))
              * 10000 + 0.5) / 10000 AS est_overlap,
        exact_overlap
    FROM stats, ni, ex
    """.format(
        e_a=f"floor((CASE WHEN n_a < {KJ_K} THEN CAST(n_a AS DOUBLE) "
        f"ELSE {float(KJ_K - 1)} / (CAST(hk_a AS DOUBLE) / {float(M)}) END)"
        " * 10000 + 0.5) / 10000",
        e_b=f"floor((CASE WHEN n_b < {KJ_K} THEN CAST(n_b AS DOUBLE) "
        f"ELSE {float(KJ_K - 1)} / (CAST(hk_b AS DOUBLE) / {float(M)}) END)"
        " * 10000 + 0.5) / 10000",
    )


ORACLES["kmv_join_estimate"] = _kj_oracle()


# ------------------------------------------------ HLL set algebra
# The register-level counterpart of kmv_join_estimate over the SAME two
# key sets here are events.user_id (a PROPER subset) vs
# customer.c_custkey, so union/intersection differ meaningfully; the
# mergeable-sketch families are directly comparable on one task: HLL
# registers merge by per-register max (union is LOSSLESS for HLL,
# unlike intersection), and |A∩B| comes from inclusion–exclusion —
# the estimator's known weak spot, exposed honestly next to the exact
# overlap. Same raw-estimator discipline as hll_distinct (no ln-based
# corrections; the only float op is one shared-literal division).


def hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import pround
    from ..operators.sketches import HLL_A, HLL_B, HLL_M, _HLL_K, _HLL_NUMER

    m = HLL_M

    def hashed(df: DataFrame, col: str, side: str) -> DataFrame:
        h = F.pmod(
            F.pmod(F.col(col).cast("long"), F.lit(POLY_MOD)) * F.lit(HLL_A)
            + F.lit(HLL_B),
            F.lit(POLY_MOD),
        )
        return df.select(F.lit(side).alias("side"), h.alias("_h"))

    both = hashed(load_table(spark, sf_dir, "events"), "user_id", "a").unionByName(
        hashed(load_table(spark, sf_dir, "customer"), "c_custkey", "b")
    )
    w = (F.col("_h") / F.lit(m)).cast("long")
    rho = F.when(w == 0, F.lit(24)).otherwise(F.lit(24) - F.length(F.bin(w)))
    regs = (
        both.select("side", (F.col("_h") % F.lit(m)).alias("_j"), rho.alias("_rho"))
        .groupBy("side", "_j")
        .agg(F.max("_rho").alias("_mj"))
    )

    def est_from(regs_df: DataFrame, label: str) -> DataFrame:
        pg = regs_df.agg(
            F.count(F.lit(1)).alias("_present"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_K} - _mj)")).alias(
                "_s"
            ),
        )
        s = F.col("_s") + (F.lit(m) - F.col("_present")) * F.lit(1 << _HLL_K)
        return pg.select(
            (F.lit(float(_HLL_NUMER)) / s.cast("double")).alias(label)
        )

    ea = est_from(regs.filter(F.col("side") == "a"), "ra")
    eb = est_from(regs.filter(F.col("side") == "b"), "rb")
    eu = est_from(regs.groupBy("_j").agg(F.max("_mj").alias("_mj")), "ru")
    exact = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("k"))
        .distinct()
        .join(
            load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")),
            "k",
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(exact)
        .select(
            pround(F.col("ra"), 4).alias("hll_a"),
            pround(F.col("rb"), 4).alias("hll_b"),
            pround(F.col("ru"), 4).alias("hll_union"),
            pround(F.col("ra") + F.col("rb") - F.col("ru"), 4).alias(
                "hll_intersection"
            ),
            "exact_overlap",
        )
    )


QUERIES["hll_set_ops"] = hll_set_ops


def _hll_set_oracle() -> str:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import sql_pround
    from ..operators.sketches import HLL_A, HLL_B, HLL_M, _HLL_K, _HLL_NUMER

    m = HLL_M

    def hs(table: str, col: str, side: str) -> str:
        return (
            f"SELECT '{side}' AS side, (((CAST({col} AS BIGINT) % {POLY_MOD}"
            f" + {POLY_MOD}) % {POLY_MOD}) * {HLL_A} + {HLL_B}) % {POLY_MOD} AS _h"
            f" FROM {table}"
        )

    def est(src: str) -> str:
        return (
            f"SELECT {_HLL_NUMER} / CAST(_s + ({m} - _present)"
            f" * (CAST(1 AS BIGINT) << {_HLL_K}) AS DOUBLE) AS r FROM ("
            f"SELECT count(*) AS _present,"
            f" CAST(sum(CAST(1 AS BIGINT) << ({_HLL_K} - _mj)) AS BIGINT) AS _s"
            f" FROM ({src}))"
        )

    return f"""
    WITH both_h AS (
        {hs('events', 'user_id', 'a')} UNION ALL {hs('customer', 'c_custkey', 'b')}
    ), regs AS (
        SELECT side, _h % {m} AS _j,
               max(CASE WHEN _h // {m} = 0 THEN 24
                        ELSE 24 - length(bin(_h // {m})) END) AS _mj
        FROM both_h GROUP BY 1, 2
    ),
    ea AS ({est(f"SELECT _mj FROM regs WHERE side = 'a'")}),
    eb AS ({est(f"SELECT _mj FROM regs WHERE side = 'b'")}),
    eu AS ({est(f"SELECT max(_mj) AS _mj FROM regs GROUP BY _j")}),
    ex AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM
        (SELECT DISTINCT user_id AS k FROM events) o
        JOIN (SELECT c_custkey AS k FROM customer) c USING (k)
    )
    SELECT {sql_pround('ea.r', 4)} AS hll_a,
           {sql_pround('eb.r', 4)} AS hll_b,
           {sql_pround('eu.r', 4)} AS hll_union,
           {sql_pround('ea.r + eb.r - eu.r', 4)} AS hll_intersection,
           exact_overlap
    FROM ea, eb, eu, ex
    """


ORACLES["hll_set_ops"] = _hll_set_oracle()


# ------------------------------------------ Misra–Gries mergeable summaries
# The deterministic, MERGEABLE heavy-hitter summary next to CMS: shard
# words by hash (deterministic shards, NOT physical partitions — same
# answer at any parallelism), reduce each shard's exact counts to the
# canonical k-counter Misra–Gries form (keep the top k keys, each
# decremented by the (k+1)-th largest count t_s — a valid MG summary:
# stored ≤ true ≤ stored + Σ t_s), then MERGE summaries by summing per
# key. The final ranking carries both bounds; the containment
# mg_lower ≤ true ≤ mg_upper is property-tested against exact counts.
# Scale: per-shard counts are one map-side-combinable shuffle; each
# summary is ≤ k rows, so the merge handles any number of shards —
# the decomposition a 1000-executor top-k actually uses when the key
# domain is too large to count exactly.

MG_SHARDS = 8
MG_K = 20
MG_TOPK = 10


def mg_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.hashing import token_hash
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
    counts = (
        words.withColumn("shard", token_hash(F.col("word")) % F.lit(MG_SHARDS))
        .groupBy("shard", "word")
        .agg(F.count("*").alias("c"))
    )
    wr = W.partitionBy("shard").orderBy(F.desc("c"), F.asc("word"))
    ranked = counts.withColumn("rn", F.row_number().over(wr))
    t_s = (
        ranked.filter(F.col("rn") == MG_K + 1)
        .select("shard", F.col("c").alias("t"))
    )
    summaries = (
        ranked.filter(F.col("rn") <= MG_K)
        .join(t_s, "shard", "left")
        .select(
            "shard",
            "word",
            (F.col("c") - F.coalesce(F.col("t"), F.lit(0))).alias("mg"),
        )
        .filter(F.col("mg") > 0)
    )
    total_t = t_s.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("tt"))
    merged = summaries.groupBy("word").agg(F.sum("mg").alias("mg_lower"))
    wo = W.orderBy(F.desc("mg_lower"), F.asc("word"))
    return (
        merged.crossJoin(F.broadcast(total_t))
        .withColumn("rank", F.row_number().over(wo).cast("int"))
        .filter(F.col("rank") <= MG_TOPK)
        .select(
            "word",
            "mg_lower",
            (F.col("mg_lower") + F.col("tt")).alias("mg_upper"),
            "rank",
        )
    )


QUERIES["mg_top_words"] = mg_top_words

from ..functions.hashing import sql_token_hash as _sql_th_mg  # noqa: E402

ORACLES["mg_top_words"] = f"""
    WITH words AS (
        SELECT unnest({_sql_tokens('text')}) AS word FROM documents
    ), counts AS (
        SELECT ({_sql_th_mg('word')} % {MG_SHARDS}) AS shard, word, count(*) AS c
        FROM words GROUP BY 1, 2
    ), ranked AS (
        SELECT shard, word, c,
               row_number() OVER (
                   PARTITION BY shard ORDER BY c DESC, word ASC
               ) AS rn
        FROM counts
    ), t_s AS (
        SELECT shard, c AS t FROM ranked WHERE rn = {MG_K + 1}
    ), summaries AS (
        SELECT r.shard, r.word, r.c - coalesce(t_s.t, 0) AS mg
        FROM ranked r LEFT JOIN t_s USING (shard)
        WHERE r.rn <= {MG_K} AND r.c - coalesce(t_s.t, 0) > 0
    ), total_t AS (
        SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS tt FROM t_s
    ), merged AS (
        SELECT word, CAST(sum(mg) AS BIGINT) AS mg_lower
        FROM summaries GROUP BY word
    )
    SELECT word, mg_lower, mg_lower + tt AS mg_upper, rank
    FROM (
        SELECT word, mg_lower, tt,
               CAST(row_number() OVER (ORDER BY mg_lower DESC, word ASC)
                    AS INTEGER) AS rank
        FROM merged, total_t
    ) WHERE rank <= {MG_TOPK}
"""


# --------------------------------------------------- AMS F₂ sketch
# Alon–Matias–Szegedy second frequency moment: F₂ = Σ_k f_k² of the
# lineitem part-key stream — the SELF-JOIN SIZE statistic a cost-based
# optimizer wants before picking a join strategy, estimated in ONE
# pass with 16 counters instead of a full groupBy. Each estimator
# Z_r = Σ_rows h_r(key) with a deterministic ±1 hash satisfies
# E[Z²] = F₂; the report carries the 16-way mean estimate NEXT TO the
# exact F₂ (one extra groupBy the production path would skip) plus
# the relative error, all as exact integers: Z_r are BIGINT sums,
# squares/mean on the DECIMAL wide rail, the final gap a micro
# rational. Deterministic hash family = token_hash(seed || ':' || key).
#
# Scale: the sketch is 16 map-side-combinable sums over one scan (16
# md5s per row — the CPU dial a production deployment would trade
# down to xxhash); the exact side is the one shuffle.

AMS_SEEDS = 16


def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import ratio_micros, ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    # ONE hash per row; estimator r reads bit r of it (the classic
    # one-hash-many-bits trick — 16 md5s/row profiled 6× wall at 100×;
    # this form is a single md5 + 16 shifts)
    hashed = li.select(token_hash(F.col("k")).alias("h"))
    sign = lambda r: (  # noqa: E731
        (F.shiftright(F.col("h"), r) % 2) * 2 - 1
    )
    sk = hashed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(sign(r)).alias(f"z{r}") for r in range(AMS_SEEDS)],
    )
    dec = "decimal(38,0)"
    z2_sum = " + ".join(
        f"CAST(z{r} AS {dec}) * z{r}" for r in range(AMS_SEEDS)
    )
    est = sk.select(
        "n_rows",
        ratio_units_dec(z2_sum, str(AMS_SEEDS), 1).alias("f2_est"),
    )
    true = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(
            F.sum((F.col("f") * F.col("f")).cast(dec))
            .cast("long")
            .alias("f2_true")
        )
    )
    return est.crossJoin(F.broadcast(true)).select(
        "n_rows",
        "f2_true",
        "f2_est",
        ratio_micros(
            "abs(f2_est - f2_true)", "f2_true"
        ).alias("rel_err_micros"),
    )


QUERIES["sketch_ams_f2"] = sketch_ams_f2

from ..functions.hashing import sql_token_hash as _sql_th_ams  # noqa: E402
from ..functions.rounding import (  # noqa: E402
    sql_ratio_micros as _sql_rm_ams,
    sql_ratio_units_dec as _sql_rud_ams,
)

_AMS_Z_COLS = ",\n               ".join(
    f"CAST(sum(CASE WHEN (h // {1 << r}) % 2 = 1"
    f" THEN 1 ELSE -1 END) AS BIGINT) AS z{r}"
    for r in range(AMS_SEEDS)
)
_AMS_Z2_SUM = " + ".join(
    f"CAST(z{r} AS HUGEINT) * z{r}" for r in range(AMS_SEEDS)
)

ORACLES["sketch_ams_f2"] = f"""
    WITH s AS (
        SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
    ), hashed AS (
        SELECT {_sql_th_ams('k')} AS h FROM s
    ), sk AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               {_AMS_Z_COLS}
        FROM hashed
    ), est AS (
        SELECT n_rows,
               {_sql_rud_ams(_AMS_Z2_SUM, str(AMS_SEEDS), 1)} AS f2_est
        FROM sk
    ), tru AS (
        SELECT CAST(sum(CAST(f AS HUGEINT) * f) AS BIGINT) AS f2_true
        FROM (SELECT count(*) AS f FROM s GROUP BY k)
    )
    SELECT n_rows, f2_true, f2_est,
           {_sql_rm_ams('abs(f2_est - f2_true)', 'f2_true')}
               AS rel_err_micros
    FROM est CROSS JOIN tru
"""


# ------------------------------ exact multi-quantile, two-pass rail
# Round 11: exact_median_twopass generalized to the full quantile
# battery (P25/P50/P90/P99 per order priority) — the generalization
# the r10 verdict nominated as the scale-safe replacement for global
# rank sorts ("exact_median_twopass's histogram ranks"). Pass 1 is the
# same mergeable 256-bin count vector; the rank→bin locate runs once
# PER (group, quantile) on the bin-grain relation; pass 2 re-scans and
# sorts only the located bins' rows (~1/256 selectivity per target)
# inside (group, quantile)-partitioned windows. The target rank is
# DuckDB's quantile_disc convention computed exactly:
# k = ceil(q·n/100) = (q·n + 99) div 100 — verified to match
# quantile_disc for every (n, q) shape including the float-noise
# cells (0.9·10) where a naive double ceil would be off by one.


QX_PCTS = (25, 50, 90, 99)


def stats_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import iunits

    o = load_table(spark, sf_dir, "orders")
    cents = iunits(F.col("o_totalprice"), 2)
    bounds = o.agg(
        F.min(cents).alias("lo"), F.max(cents).alias("hi")
    ).select("lo", (F.col("hi") - F.col("lo") + 1).alias("span"))
    binned = (
        o.select(F.col("o_orderpriority").alias("prio"), cents.alias("c"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "prio", "c", F.expr(f"(c - lo) * {HQ_BINS} div span").alias("bin")
        )
    )
    hist = binned.groupBy("prio", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("prio")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("prio"))
    )
    qs = F.explode(
        F.array(*[F.lit(q) for q in QX_PCTS])
    ).alias("q_pct")
    targets = (
        ann.select("prio", "bin", "cnt", "cum", "n", qs)
        .withColumn("k", F.expr("(q_pct * n + 99) div 100"))
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("prio", "q_pct")
        .agg(
            F.max("n").alias("n"),
            F.min("bin").alias("tbin"),
            F.max("k").alias("k"),
        )
        .join(
            ann.select(
                "prio", "bin", (F.col("cum") - F.col("cnt")).alias("cb")
            ),
            on=["prio"],
        )
        .filter(F.col("bin") == F.col("tbin"))
        .select("prio", "q_pct", "n", "tbin", (F.col("k") - F.col("cb")).alias("r"))
    )
    wrank = Window.partitionBy("prio", "q_pct").orderBy("c")
    return (
        binned.join(F.broadcast(targets), "prio")
        .filter(F.col("bin") == F.col("tbin"))
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == F.col("r"))
        .select("prio", "q_pct", "n", F.col("c").alias("value_cents"))
    )


QUERIES["stats_quantiles_exact"] = stats_quantiles_exact


def _qx_oracle() -> str:
    from ..functions.rounding import sql_iunits

    c = sql_iunits("o_totalprice", 2)
    parts = [
        f"""
        SELECT o_orderpriority AS prio, CAST({q} AS INTEGER) AS q_pct,
               count(*) AS n,
               quantile_disc({c}, {q / 100}) AS value_cents
        FROM orders GROUP BY 1
        """
        for q in QX_PCTS
    ]
    return " UNION ALL ".join(parts)


ORACLES["stats_quantiles_exact"] = _qx_oracle()


# ------------------------------------------------- linear counting
# Round 12: the small-cardinality rung UNDER the KMV/HLL ladder —
# Whang et al. (1990) linear (bitmap) counting: hash every key into an
# m-bit bitmap, estimate n̂ = m·ln(m/z) from the count z of still-zero
# bits. For n ≲ m it beats HLL's error at the same memory, which is
# why production pipelines route small partitions to linear counting
# and switch to HLL past the load threshold — this query reports the
# estimate NEXT TO the exact distinct so the error is part of the
# differential contract (the dedup_minhash_accuracy pattern).
# Exactness: the bitmap position is the house affine universal hash
# (exact integers, shared constants); z is an exact integer; ln takes
# EXACT-INTEGER arguments only (m literal, z column), nano-snapped;
# the estimate m·(ln m − ln z) accumulates in exact nano integers and
# lands as one half-up micros rational. Mergeable at scale: the bitmap
# is a distinct-set of filled positions — union = distinct union, the
# same merge algebra the HLL/KMV rows demonstrate.

LC_M = 4096
LC_A = 48_271  # minstd multiplier — fixed, shared with the oracle
LC_B = 11


def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import iunits, ratio_units

    li = load_table(spark, sf_dir, "lineitem")
    h = F.pmod(
        F.pmod(F.col("l_partkey").cast("long"), F.lit(POLY_MOD)) * F.lit(LC_A)
        + F.lit(LC_B),
        F.lit(POLY_MOD),
    )
    agg = li.select(
        (h % F.lit(LC_M)).alias("bit"), F.col("l_partkey").alias("k")
    ).agg(
        F.countDistinct("bit").alias("n_filled"),
        F.countDistinct("k").alias("n_exact"),
    )
    z = (F.lit(LC_M) - F.col("n_filled")).cast("long")
    dln_nanos = iunits(F.log(F.lit(float(LC_M))), 9) - iunits(
        F.log(z.cast("double")), 9
    )
    staged = agg.select(
        "n_filled",
        "n_exact",
        F.when(z > 0, F.lit(LC_M) * dln_nanos).alias("est_nanos"),
    )
    return staged.select(
        F.lit(LC_M).cast("long").alias("m"),
        F.col("n_filled").cast("long").alias("n_filled"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.when(F.col("est_nanos").isNull(), F.lit(None).cast("long"))
        .otherwise(ratio_units("est_nanos", "1000", 1))
        .alias("estimate_micros"),
    )


QUERIES["sketch_linear_counting"] = sketch_linear_counting

from ..functions.hashing import POLY_MOD as _LC_MOD  # noqa: E402
from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_lc,
    sql_ratio_units as _sql_ru_lc,
)

ORACLES["sketch_linear_counting"] = f"""
    WITH agg AS (
        SELECT CAST(count(DISTINCT ((l_partkey % {_LC_MOD}) * {LC_A} + {LC_B})
                    % {_LC_MOD} % {LC_M}) AS BIGINT) AS n_filled,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
        FROM lineitem
    ), staged AS (
        SELECT n_filled, n_exact,
               CASE WHEN {LC_M} - n_filled > 0
                    THEN {LC_M} * ({_sql_iu_lc(f'ln({LC_M})', 9)}
                         - {_sql_iu_lc(f'ln({LC_M} - n_filled)', 9)})
               END AS est_nanos
        FROM agg
    )
    SELECT CAST({LC_M} AS BIGINT) AS m, n_filled, n_exact,
           CASE WHEN est_nanos IS NULL THEN NULL
                ELSE {_sql_ru_lc('est_nanos', '1000', 1)}
           END AS estimate_micros
    FROM staged
"""


# ------------------------------------------------- bloom FPR audit
# Round 12: the MEASUREMENT loop for the bloom-pruning family —
# bloom_prune_orders trusts a filter; this query audits one, the way
# a production pipeline validates its pruning index after each build:
# construct a k=3 bloom over the members (customers WITH orders),
# probe it with GUARANTEED non-members — the sign-mirrored key space
# −key−1 (members are non-negative custkeys, so the mirror is
# disjoint by construction; the affine hash is sign-safe via pmod on
# both engines), and report observed FPR next to the fill-based
# prediction
# p̂ = (filled/m)^k (the empirical-fill form of (1−e^{−kn/m})^k —
# exact integer rational, no exp). A probe is a false positive iff
# ALL its (distinct) bits are set — self-colliding hashes are handled
# by comparing distinct-bit counts, not row counts. Everything is
# exact integers: minstd affine hashes mod POLY_MOD mod m (the
# linear-counting discipline), bit sets via distinct, counts via
# joins; both FPR columns are micros rationals. Scale: members and
# probes shuffle once on key, bits are ≤ m rows (broadcast); the
# audit costs two scans + one bounded join.

BF_M = 8192
BF_HASHES = [(48_271, 11), (16_807, 7), (69_621, 3)]


def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import ratio_units, ratio_units_dec

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    mem = orders.select(F.col("o_custkey").alias("key")).distinct()
    mem = mem.localCheckpoint(eager=False)  # feeds bits AND the anti-join

    def hbit(a: int, b: int):
        return F.pmod(
            F.pmod(F.col("key").cast("long"), F.lit(POLY_MOD)) * F.lit(a)
            + F.lit(b),
            F.lit(POLY_MOD),
        ) % F.lit(BF_M)

    harr = F.array(*[hbit(a, b) for a, b in BF_HASHES])
    bits = (
        mem.select(F.explode(harr).alias("bit")).distinct()
        .withColumn("present", F.lit(1))
    )
    probes = cust.select((-F.col("c_custkey") - 1).alias("key"))
    pb = probes.select("key", F.explode(harr).alias("bit")).distinct()
    per = (
        pb.join(F.broadcast(bits), "bit", "left")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.coalesce("present", F.lit(0))).alias("nh"),
        )
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("nb") == F.col("nh"), 1).otherwise(0)).alias(
            "n_fp"
        ),
    ).crossJoin(
        F.broadcast(mem.agg(F.count(F.lit(1)).alias("n_members")))
    ).crossJoin(
        F.broadcast(bits.agg(F.count(F.lit(1)).alias("n_filled")))
    )
    return agg.select(
        F.lit(BF_M).cast("long").alias("m"),
        F.lit(len(BF_HASHES)).cast("int").alias("k"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_filled").cast("long").alias("n_filled"),
        F.col("n_probes").cast("long").alias("n_probes"),
        F.col("n_fp").cast("long").alias("n_fp"),
        F.when(F.col("n_probes") == 0, F.lit(None).cast("long"))
        .otherwise(ratio_units("n_fp", "n_probes"))
        .alias("fpr_observed_micros"),
        ratio_units_dec(
            "CAST(n_filled AS DECIMAL(38,0)) * n_filled * n_filled",
            f"CAST({BF_M} AS DECIMAL(38,0)) * {BF_M} * {BF_M}",
        ).alias("fpr_fill_micros"),
    )


QUERIES["sketch_bloom_fpr"] = sketch_bloom_fpr

from ..functions.hashing import POLY_MOD as _BF_MOD  # noqa: E402
from ..functions.rounding import (  # noqa: E402
    sql_ratio_units as _sql_ru_bf,
    sql_ratio_units_dec as _sql_rud_bf,
)


def _bf_sql() -> str:
    hash_exprs = ", ".join(
        f"(((key % {_BF_MOD} + {_BF_MOD}) % {_BF_MOD}) * {a} + {b})"
        f" % {_BF_MOD} % {BF_M}"
        for a, b in BF_HASHES
    )
    return f"""
    WITH mem AS (
        SELECT DISTINCT o_custkey AS key FROM orders
    ), bits AS (
        SELECT DISTINCT unnest([{hash_exprs}]) AS bit FROM mem
    ), probes AS (
        SELECT -c_custkey - 1 AS key FROM customer
    ), pb AS (
        SELECT DISTINCT key, unnest([{hash_exprs}]) AS bit
        FROM (SELECT key FROM probes) _p
    ), per AS (
        SELECT pb.key,
               CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS nh
        FROM pb LEFT JOIN bits ON pb.bit = bits.bit
        GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_probes,
               CAST(sum(CASE WHEN nb = nh THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fp
        FROM per
    ), stat AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_members,
               (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_filled
    )
    SELECT CAST({BF_M} AS BIGINT) AS m,
           CAST({len(BF_HASHES)} AS INTEGER) AS k,
           n_members, n_filled, n_probes, n_fp,
           CASE WHEN n_probes = 0 THEN NULL
                ELSE {_sql_ru_bf('n_fp', 'n_probes')}
           END AS fpr_observed_micros,
           {_sql_rud_bf(
               'CAST(n_filled AS HUGEINT) * n_filled * n_filled',
               f'CAST({BF_M} AS HUGEINT) * {BF_M} * {BF_M}')}
               AS fpr_fill_micros
    FROM agg CROSS JOIN stat
"""


ORACLES["sketch_bloom_fpr"] = _bf_sql()


# ---------------------------------------------- hash uniformity audit
# Round 12: the audit UNDER every sketch in this file — KMV, HLL,
# linear counting, CMS and the bloom FPR all assume the house affine
# hash ((k mod M)·A + B) mod M spreads keys uniformly; a biased hash
# silently corrupts every estimate while each sketch's own gate still
# passes (the estimators are deterministic either way). One-sample
# χ² goodness-of-fit of the hashed bucket occupancy against uniform
# over HU_BINS buckets, on DISTINCT keys (duplicates would test the
# workload, not the hash): χ² = (B·Σc² − n²)/n in exact integers
# (the algebraic collapse of Σ(c−n/B)²/(n/B)), plus max/min bucket
# loads. The 3σ flag uses the normal approximation of χ²(B−1) fully
# cross-multiplied: (NUM−(B−1)·n)² > 18·(B−1)·n² with NUM = B·Σc²−n²,
# and the SYMMETRIC under-dispersion flag (χ² far BELOW its df)
# catches the other failure: an affine hash over near-consecutive
# keys is lattice-REGULAR, not random-like — harmless for count
# sketches, fatal for sampling/splitting — and the fixture's
# sequential partkeys trip exactly this flag (χ² ≈ 5 on 255 df),
# which is the honest readout, not a bug.
# Scale: bucket-grain after one distinct pass; B is a dial.

HU_BINS = 256
HU_A = 48_271
HU_B = 11


def sketch_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").alias("k")).distinct()
    h = F.pmod(
        F.pmod(F.col("k").cast("long"), F.lit(POLY_MOD)) * F.lit(HU_A)
        + F.lit(HU_B),
        F.lit(POLY_MOD),
    )
    buckets = keys.select((h % F.lit(HU_BINS)).alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("c")
    )
    dec = "decimal(38,0)"
    m = buckets.agg(
        F.count(F.lit(1)).alias("n_occupied"),
        F.sum("c").alias("n"),
        F.sum((F.col("c").cast(dec) * F.col("c")).cast(dec)).alias("cc"),
        F.max("c").alias("max_load"),
        F.min("c").alias("min_load"),
    )
    num = f"(CAST({HU_BINS} AS {dec}) * cc - CAST(n AS {dec}) * n)"
    exc = f"({num} - (CAST({HU_BINS} AS {dec}) - 1) * n)"
    return m.select(
        F.lit(HU_BINS).cast("int").alias("n_bins"),
        F.col("n_occupied").cast("long").alias("n_occupied"),
        F.col("n").cast("long").alias("n_keys"),
        F.col("max_load").cast("long").alias("max_load"),
        F.col("min_load").cast("long").alias("min_load"),
        F.when(F.col("n") == 0, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec(num, "n"))
        .alias("chi2_micros"),
        F.when(F.col("n") == 0, F.lit(None).cast("int"))
        .otherwise(
            (
                (F.expr(exc) > 0)
                & (
                    F.expr(f"{exc} * {exc}")
                    > F.lit(18).cast(dec)
                    * (F.lit(HU_BINS).cast(dec) - 1)
                    * F.col("n").cast(dec)
                    * F.col("n")
                )
            ).cast("int")
        )
        .alias("biased_3sigma"),
        F.when(F.col("n") == 0, F.lit(None).cast("int"))
        .otherwise(
            (
                (F.expr(exc) < 0)
                & (
                    F.expr(f"{exc} * {exc}")
                    > F.lit(18).cast(dec)
                    * (F.lit(HU_BINS).cast(dec) - 1)
                    * F.col("n").cast(dec)
                    * F.col("n")
                )
            ).cast("int")
        )
        .alias("too_regular_3sigma"),
    )


QUERIES["sketch_hash_uniformity"] = sketch_hash_uniformity

from ..functions.hashing import POLY_MOD as _HU_MOD  # noqa: E402
from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_hu,
)

_HU_NUM = f"(CAST({HU_BINS} AS HUGEINT) * cc - CAST(n AS HUGEINT) * n)"
_HU_EXC = f"({_HU_NUM} - (CAST({HU_BINS} AS HUGEINT) - 1) * n)"

ORACLES["sketch_hash_uniformity"] = f"""
    WITH keys AS (
        SELECT DISTINCT l_partkey AS k FROM lineitem
    ), buckets AS (
        SELECT ((k % {_HU_MOD}) * {HU_A} + {HU_B}) % {_HU_MOD}
                   % {HU_BINS} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM keys GROUP BY 1
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_occupied,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS cc,
               CAST(max(c) AS BIGINT) AS max_load,
               CAST(min(c) AS BIGINT) AS min_load
        FROM buckets
    )
    SELECT CAST({HU_BINS} AS INTEGER) AS n_bins,
           n_occupied, n AS n_keys, max_load, min_load,
           CASE WHEN n = 0 THEN NULL
                ELSE {_sql_rud_hu(_HU_NUM, 'n')}
           END AS chi2_micros,
           CASE WHEN n = 0 THEN NULL
                ELSE CAST(({_HU_EXC} > 0
                      AND {_HU_EXC} * {_HU_EXC}
                          > 18 * (CAST({HU_BINS} AS HUGEINT) - 1) * n * n)
                     AS INTEGER)
           END AS biased_3sigma,
           CASE WHEN n = 0 THEN NULL
                ELSE CAST(({_HU_EXC} < 0
                      AND {_HU_EXC} * {_HU_EXC}
                          > 18 * (CAST({HU_BINS} AS HUGEINT) - 1) * n * n)
                     AS INTEGER)
           END AS too_regular_3sigma
    FROM m
"""


# ------------------------------------------------ theta-sketch intersection
# Round 13: set-OPERATION cardinality from sketches — the Theta-sketch
# estimate (Dasu et al. 2002 KMV; the Apache DataSketches theta
# algebra) of |A ∩ B| where A/B are the distinct user sets of the
# first/second half of the event span (week-over-week retained users —
# the audience-overlap question every analytics deployment answers
# from sketches because the exact distinct-intersection needs both full
# sets). Estimator: keep each side's k smallest distinct hash values
# (KMV); θ = min(θ_A, θ_B) (the k-th minimum per side); every common
# hash below θ is a uniform sample of A ∩ B at sampling rate θ/M, so
# est = round(common · M / θ). Deterministic: token_hash is the same
# md5-derived integer in both engines, so sketch membership, θ, and the
# estimate are all exact integers under the differential gate (the
# kmv_distinct discipline); the exact intersection is computed
# alongside as the accuracy audit (the lsh_recall / bloom_fpr shape).
# Sides with fewer than k distinct hashes carry their sketch whole
# (θ = M), collapsing the estimator to the exact common count.
# Scale: per-side TakeOrdered-k on distinct hashes (no global sort),
# one k-row broadcast join — the exact audit's distinct-join is the
# only data-sized cost and exists only because the gate demands truth.

THETA_K = 128
THETA_M = 2_147_483_647  # token_hash range: POLY_MOD (2^31 - 1)


def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import ratio_units_dec, ratio_units_dec_signed
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
        "user_id",
    )
    span = days.agg(
        ((F.min("day") + F.max("day") + 1) / 2).cast("long").alias("mid")
    )
    sided = days.crossJoin(F.broadcast(span)).select(
        (F.col("day") >= F.col("mid")).cast("int").alias("side"),
        token_hash(F.col("user_id").cast("string")).alias("h"),
        "user_id",
    )
    dh = sided.select("side", "h").distinct().localCheckpoint(eager=False)
    from pyspark.sql import Window as W

    w = W.partitionBy("side").orderBy("h")
    kmv = dh.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= THETA_K
    )
    thetas = kmv.groupBy("side").agg(
        F.count(F.lit(1)).alias("nk"), F.max("h").alias("hk")
    )
    # theta per side: M when the sketch is not full (estimate = exact)
    th = thetas.select(
        "side",
        F.when(F.col("nk") < THETA_K, F.lit(THETA_M))
        .otherwise(F.col("hk"))
        .alias("theta_side"),
    )
    theta = th.agg(F.min("theta_side").alias("theta"))
    a = kmv.filter(F.col("side") == 0).select(F.col("h").alias("ha"))
    b = kmv.filter(F.col("side") == 1).select(F.col("h").alias("hb"))
    common = (
        a.join(b, F.col("ha") == F.col("hb"))
        .crossJoin(F.broadcast(theta))
        .filter(F.col("ha") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact = (
        sided.filter(F.col("side") == 0)
        .select("user_id")
        .distinct()
        .intersect(
            sided.filter(F.col("side") == 1).select("user_id").distinct()
        )
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )
    dec = "decimal(38,0)"
    m = (
        common.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(exact))
    )
    est = ratio_units_dec(
        f"CAST(n_common AS {dec}) * {THETA_M}", "theta", 1
    )
    return m.select(
        F.lit(THETA_K).cast("int").alias("k"),
        F.col("theta").cast("long").alias("theta"),
        F.col("n_common").cast("long").alias("n_common"),
        est.alias("est_intersection"),
        F.col("inter_exact").cast("long").alias("inter_exact"),
        F.when(F.col("inter_exact") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec_signed(
                f"(CAST(n_common AS {dec}) * {THETA_M}"
                f" - CAST(theta AS {dec}) * inter_exact)",
                f"CAST(theta AS {dec}) * inter_exact",
            )
        )
        .alias("err_micros"),
    )


QUERIES["sketch_theta_intersection"] = sketch_theta_intersection

from ..functions.hashing import sql_token_hash as _sql_th_ti  # noqa: E402
from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_ti,
    sql_ratio_units_dec_signed as _sql_ruds_ti,
)

ORACLES["sketch_theta_intersection"] = f"""
    WITH days AS (
        SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events
    ), span AS (
        SELECT CAST((min(day) + max(day) + 1) // 2 AS BIGINT) AS mid
        FROM days
    ), sided AS (
        SELECT CAST(day >= mid AS INTEGER) AS side,
               {_sql_th_ti('CAST(user_id AS VARCHAR)')} AS h,
               user_id
        FROM days CROSS JOIN span
    ), dh AS (
        SELECT DISTINCT side, h FROM sided
    ), kmv AS (
        SELECT side, h
        FROM (
            SELECT side, h,
                   row_number() OVER (PARTITION BY side ORDER BY h) AS rn
            FROM dh
        )
        WHERE rn <= {THETA_K}
    ), thetas AS (
        SELECT side, CAST(count(*) AS BIGINT) AS nk,
               CAST(max(h) AS BIGINT) AS hk
        FROM kmv GROUP BY 1
    ), theta AS (
        SELECT CAST(min(CASE WHEN nk < {THETA_K} THEN {THETA_M}
                             ELSE hk END) AS BIGINT) AS theta
        FROM thetas
    ), common AS (
        SELECT CAST(count(*) AS BIGINT) AS n_common
        FROM kmv a JOIN kmv b
          ON a.side = 0 AND b.side = 1 AND a.h = b.h
        CROSS JOIN theta
        WHERE a.h < theta
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS inter_exact
        FROM (
            SELECT DISTINCT user_id FROM sided WHERE side = 0
            INTERSECT
            SELECT DISTINCT user_id FROM sided WHERE side = 1
        )
    )
    SELECT CAST({THETA_K} AS INTEGER) AS k,
           theta,
           n_common,
           {_sql_rud_ti(f'CAST(n_common AS HUGEINT) * {THETA_M}',
                        'theta', 1)} AS est_intersection,
           inter_exact,
           CASE WHEN inter_exact = 0 THEN NULL
                ELSE {_sql_ruds_ti(
                    f'(CAST(n_common AS HUGEINT) * {THETA_M}'
                    f' - CAST(theta AS HUGEINT) * inter_exact)',
                    'CAST(theta AS HUGEINT) * inter_exact')}
           END AS err_micros
    FROM common CROSS JOIN theta CROSS JOIN exact
"""
