"""Data-profiling and exact-statistics queries — the inspection pass a
pipeline runs before/after transformations: per-column profiles,
distribution histograms, and covariance/correlation.

Cross-engine exactness strategy (the hard part for statistics):
``covar``/``corr`` over doubles are order-dependent when summed as
floats, so both moments are accumulated as EXACT integers — quantities
as BIGINT, prices as DECIMAL cents, squares/products in DECIMAL(38,0)
(Spark) vs HUGEINT (DuckDB), all order-free — and only the final
ratio touches doubles, via single identical IEEE ops (cast, multiply,
sqrt, divide) + portable rounding. Same engineering as the money/
iunits toolkit, extended to second moments.

Scale: every query here is one scan + one aggregate (map-side partial,
codegen'd). The histogram's bin key is computed, so it partitions
uniformly; the profile is a single multi-aggregate pass, not one scan
per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import money
from ..functions.rounding import (
    from_iunits,
    iunits,
    pround,
    ratio_units,
    sql_iunits,
    sql_pround,
    sql_ratio_units,
)
from ..sources.catalog import load_table

HIST_BIN_WIDTH = 5.0  # events.value in [0, ~560] → ~113 bins

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem's numeric measures: one row per
    column with count / nulls / distinct / min / max — computed in a
    SINGLE aggregate pass over the table (then pivoted to rows
    driver-free via stack), not a scan per column."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__dist, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column, n, n_nulls, n_distinct, min_val, max_val)"
    )


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value: bin index, count, exact
    sum (integer micro-units) and rounded mean per bin. floor(x/width)
    is one IEEE division + floor — identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / F.lit(HIST_BIN_WIDTH)).cast("int")
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum(iunits(F.col("value"))).alias("sum_units"),
        )
        .select(
            "bin",
            "n",
            "sum_units",
            # mean micro-units = round(sum_units / n) as a pure-BIGINT
            # rational; ONE exact-rounded division for display (the
            # double sum/1e6/n chain ties at micro boundaries — round-7
            # jitter-audit fix)
            (ratio_units("sum_units", "n", 1).cast("double") / F.lit(1e6)).alias(
                "mean_value"
            ),
        )
    )


def stats_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance + correlation of (l_quantity, l_extendedprice).

    Moments are exact integers: x = quantity as BIGINT (integral in
    TPC-H), y = price in DECIMAL cents; Σx, Σy, Σxy, Σx², Σy² in
    DECIMAL(38,0) — order-free, deterministic at any parallelism. The
    closed forms
        covar_pop = (n·Σxy − Σx·Σy) / n²
        corr      = (n·Σxy − Σx·Σy) / √((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²))
    are evaluated with one double conversion per exact factor and
    identical IEEE multiply/sqrt/divide, then portable rounding.
    covar is in quantity·cents units (documented, exact-checkable)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = (money("l_extendedprice") * 100).cast("long")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = li.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy"),
    )
    n = d(F.col("n"))
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    nn = (n * n).cast("double")
    return agg.select(
        "n",
        F.col("sx").cast("long").alias("sum_qty"),
        F.col("sy").cast("long").alias("sum_cents"),
        pround(num / nn, 6).alias("covar_pop"),
        pround(num / F.sqrt(varx * vary), 6).alias("corr"),
    )


QUERIES = {
    "profile_lineitem": profile_lineitem,
    "value_histogram": value_histogram,
    "stats_covar": stats_covar,
}

_PROFILE_SELECTS = " UNION ALL ".join(
    f"""SELECT '{c}' AS "column", count({c}) AS n,
        CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        count(DISTINCT {c}) AS n_distinct,
        min({c}) AS min_val, max({c}) AS max_val
        FROM lineitem"""
    for c in _PROFILE_COLS
)

_COVAR_NUM = "CAST(n * sxy - sx * sy AS DOUBLE)"
_COVAR = sql_pround(f"{_COVAR_NUM} / CAST(n * n AS DOUBLE)", 6)
_CORR = sql_pround(
    f"{_COVAR_NUM} / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
    " * CAST(n * syy - sy * sy AS DOUBLE))",
    6,
)

ORACLES = {
    "profile_lineitem": _PROFILE_SELECTS,
    "value_histogram": f"""
        SELECT bin, n, sum_units,
               CAST({sql_ratio_units('sum_units', 'n', 1)} AS DOUBLE) / 1000000.0
                   AS mean_value
        FROM (
            SELECT CAST(floor(value / {HIST_BIN_WIDTH}) AS INTEGER) AS bin,
                   count(*) AS n,
                   CAST(sum({sql_iunits('value')}) AS BIGINT) AS sum_units
            FROM events GROUP BY 1
        )
    """,
    "stats_covar": f"""
        WITH m AS (
            SELECT count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
            FROM (
                SELECT CAST(l_quantity AS BIGINT) AS x,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
                FROM lineitem
            )
        )
        SELECT n,
               CAST(sx AS BIGINT) AS sum_qty,
               CAST(sy AS BIGINT) AS sum_cents,
               {_COVAR} AS covar_pop,
               {_CORR} AS corr
        FROM m
    """,
}


# ---------------------------------------------------------------------------
# Round 5: per-group closed-form OLS (y = slope·x + intercept) from the
# same exact integer moments as stats_covar — x = quantity, y = price
# cents, grouped by return flag. One shuffle (the groupBy); the five
# moment sums are map-side combinable DECIMAL(38,0) partials, so the
# regression "trains" in a single distributed pass at any scale. One
# IEEE op per exact factor, then portable rounding.


def ols_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = (money("l_extendedprice") * 100).cast("long")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = li.select(F.col("l_returnflag").alias("flag"), x.alias("x"), y.alias("y")).groupBy(
        "flag"
    ).agg(
        F.count("*").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
    )
    n = d(F.col("n"))
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return agg.select(
        "flag",
        "n",
        pround(slope, 6).alias("slope_cents_per_qty"),
        pround(intercept, 4).alias("intercept_cents"),
    )


QUERIES["ols_by_flag"] = ols_by_flag

_OLS_NUM = "CAST(n * sxy - sx * sy AS DOUBLE)"
_OLS_DEN = "CAST(n * sxx - sx * sx AS DOUBLE)"
_OLS_SLOPE = f"({_OLS_NUM} / {_OLS_DEN})"

ORACLES["ols_by_flag"] = f"""
    WITH m AS (
        SELECT l_returnflag AS flag, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS y
            FROM lineitem
        )
        GROUP BY 1
    )
    SELECT flag, n,
           {sql_pround(_OLS_SLOPE, 6)} AS slope_cents_per_qty,
           {sql_pround(f"(CAST(sy AS DOUBLE) - {_OLS_SLOPE} * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)", 4)}
               AS intercept_cents
    FROM m
"""


def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-group table fingerprint — the
    anti-entropy/validation primitive for 100 TB pipelines (verify a
    migrated/replicated table without sorting it): portable md5 row
    hash (codegen'd, whole-stage), summed order-free per return flag in
    DECIMAL(38,0) so retries/merge order can't change it, reduced mod
    the portable prime. Doubles and timestamps enter the row string as
    exact integers (cents / epoch micros), never via engine-specific
    float rendering."""
    from ..functions.hashing import POLY_MOD, token_hash
    from ..functions.time import epoch_micros

    li = load_table(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        iunits(F.col("l_extendedprice"), 2).cast("string"),
        iunits(F.col("l_discount"), 2).cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        epoch_micros(F.col("l_shipdate")).cast("string"),
    )
    return (
        li.select(F.col("l_returnflag"), token_hash(row_str).alias("_rh"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("row_count"),
            (F.sum(F.col("_rh").cast("decimal(38,0)")) % F.lit(POLY_MOD))
            .cast("long")
            .alias("checksum"),
        )
    )


QUERIES["table_checksum"] = table_checksum

from ..functions.hashing import POLY_MOD as _PM  # noqa: E402
from ..functions.hashing import sql_token_hash as _sql_th  # noqa: E402

_CHECKSUM_ROW = (
    "concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR), "
    "CAST(l_suppkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), "
    f"CAST({sql_iunits('l_extendedprice', 2)} AS VARCHAR), "
    f"CAST({sql_iunits('l_discount', 2)} AS VARCHAR), "
    "l_returnflag, l_linestatus, CAST(epoch_us(l_shipdate) AS VARCHAR))"
)

ORACLES["table_checksum"] = f"""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS row_count,
           CAST(CAST(sum({_sql_th(_CHECKSUM_ROW)}) AS HUGEINT) % {_PM} AS BIGINT)
               AS checksum
    FROM lineitem
    GROUP BY l_returnflag
"""


def stats_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of the price distribution per return flag
    — the inequality/concentration statistic a corpus-curation pass
    uses to quantify how skewed a source's contribution is. Computed
    from the sorted-rank identity
        G = (2·Σ rn·x − (n+1)·Σx) / (n·Σx)
    with rn = row_number ordered by x within the group. Ties make the
    rank assignment ambiguous but the STATISTIC invariant: a tie block
    owns the same consecutive rank set under any internal order, so
    Σ rn·x over the block x = v of size t starting after c_less
    smaller rows collapses to the CLOSED FORM
        v · (t·c_less + t(t+1)/2),
    i.e. 2·Σ rn·x = Σ_v v·(2·t·c_less + t(t+1)) — which needs only
    the per-VALUE counts and their exclusive prefix (the
    quality_mannwhitney c_less rail), never a per-row rank. Both
    moments accumulate in DECIMAL(38,0) (order-free, no overflow) and
    the final value spends the stats_covar discipline: one double
    conversion per exact factor, one IEEE division, portable rounding.

    Scale (VERDICT r10 item 1): the row-grain relation is touched by
    ONE groupBy only; the only window runs per flag over the DISTINCT
    cents values — bounded by the price domain (quantity 1..50 ×
    part-price grid), not by row count. No single-task row sort
    anywhere in the plan."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("c")
    )
    cnt = li.groupBy("l_returnflag", "c").agg(F.count(F.lit(1)).alias("t"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = cnt.withColumn(
        "c_less", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    agg = per.groupBy("l_returnflag").agg(
        F.sum("t").alias("n"),
        F.sum(d(F.col("t")) * d(F.col("c"))).alias("s"),
        # 2·Σ rn·x — the tie-block closed form, doubled to stay integer
        F.sum(
            d(F.col("c"))
            * (
                F.lit(2).cast("decimal(38,0)") * d(F.col("t")) * d(F.col("c_less"))
                + d(F.col("t")) * (d(F.col("t")) + F.lit(1))
            )
        ).alias("ws2"),
    )
    n = d(F.col("n"))
    num = (F.col("ws2") - (n + F.lit(1)) * F.col("s")).cast("double")
    den = (n * F.col("s")).cast("double")
    return agg.select(
        "l_returnflag",
        "n",
        F.col("s").cast("long").alias("sum_cents"),
        pround(num / den, 6).alias("gini"),
    )


QUERIES["stats_gini"] = stats_gini

ORACLES["stats_gini"] = f"""
    WITH c AS (
        SELECT l_returnflag, {sql_iunits('l_extendedprice', 2)} AS c FROM lineitem
    ), r AS (
        SELECT l_returnflag, c,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn
        FROM c
    ), m AS (
        SELECT l_returnflag, count(*) AS n, sum(c) AS s, sum(rn * c) AS ws
        FROM r GROUP BY 1
    )
    SELECT l_returnflag,
           n,
           CAST(s AS BIGINT) AS sum_cents,
           {sql_pround('CAST(2 * ws - (n + 1) * s AS DOUBLE)'
                       ' / CAST(n * s AS DOUBLE)', 6)} AS gini
    FROM m
"""


# ---------------------------------------------------------- join-key skew map
# The pre-join introspection a 100 TB operator runs BEFORE picking a
# strategy (plain shuffle vs AQE skew-join vs explicit salting): per
# join key of the fact table, the row count distribution summarized as
# top-K heaviest keys + concentration ratios. All integer/rational:
# share of the heaviest key and of the top-K in micro-units, plus the
# count needed to justify salting (max key rows vs even-partition
# size). One groupBy + a TakeOrdered(K) + a 1-row total broadcast —
# the profile itself never shuffles more than the key aggregation.

SKEW_TOP_K = 10


def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = (
        per_key.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(SKEW_TOP_K)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        "key",
        "n_rows",
        "total_rows",
        "n_keys",
        ratio_units("n_rows", "total_rows").alias("share_micros"),
        # rows-per-key if perfectly even — the salting decision compares
        # n_rows against a multiple of this
        F.expr("total_rows div n_keys").alias("even_rows_per_key"),
        ratio_units("n_rows", "total_rows div n_keys", 1).alias("skew_x"),
    )


QUERIES["profile_key_skew"] = profile_key_skew

ORACLES["profile_key_skew"] = f"""
    WITH per_key AS (
        SELECT l_suppkey AS key, count(*) AS n_rows
        FROM lineitem GROUP BY 1
    ), totals AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
               count(*) AS n_keys
        FROM per_key
    ), top AS (
        SELECT key, n_rows FROM per_key
        ORDER BY n_rows DESC, key ASC LIMIT {SKEW_TOP_K}
    )
    SELECT key, n_rows, total_rows, n_keys,
           {sql_ratio_units('n_rows', 'total_rows')} AS share_micros,
           total_rows // n_keys AS even_rows_per_key,
           {sql_ratio_units('n_rows', 'total_rows // n_keys', 1)} AS skew_x
    FROM top, totals
"""


# ------------------------------------------------ Theil T inequality
# Theil's T index of revenue concentration across supplier nations,
# per region — the entropy-based inequality measure that DECOMPOSES
# (unlike stats_gini's rank form): T = Σ (x_i/S)·ln(n·x_i/S) over the
# region's n member nations, 0 when every nation earns the region's
# mean, ln(n) under total concentration. The curation reading: "how
# lopsided is this source-group's contribution" with an additive
# between/within split available downstream.
#
# Exactness rail: revenue lands as exact BIGINT cents; both ln
# arguments are EXACT INTEGERS (n·x_i and S) so each ln() sees a
# bit-identical double in any engine and snaps to nano-units
# (events_behavior_entropy's ln-snap contract). The x_i-weighted sum
# of snapped logs accumulates in DECIMAL(38,0), and one wide rational
# divide by S yields T in nanos — no unsnapped float ever crosses an
# engine boundary.
#
# Scale: one fact-scan aggregate (broadcast supplier/nation dims) to
# 25 rows; everything after is constant-size. The ln-arg ceiling is
# 2^53 cents ≈ $90 T per region-nation — past that, rescale cents to
# whole currency units upstream (same contract, shifted grid).

def stats_theil_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(iunits(F.col("l_extendedprice"), 2)).alias("x"))
    )
    dim = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    per_nation = rev.join(F.broadcast(dim), rev.s_nationkey == dim.n_nationkey)
    sized = per_nation.withColumn(
        "k", F.count(F.lit(1)).over(Window.partitionBy("r_name"))
    ).withColumn(
        "s_tot", F.sum("x").over(Window.partitionBy("r_name"))
    )
    ln9 = lambda c: iunits(F.log(c.cast("double")), 9)  # noqa: E731
    dec = "decimal(38,0)"
    terms = sized.select(
        "r_name",
        "k",
        "s_tot",
        (
            F.col("x").cast(dec)
            * (ln9(F.col("k") * F.col("x")) - ln9(F.col("s_tot"))).cast(dec)
        ).alias("t_num"),
    )
    return (
        terms.groupBy("r_name")
        .agg(
            F.max("k").alias("k_nations"),
            F.max("s_tot").alias("revenue_cents"),
            F.sum("t_num").alias("t_sum"),
        )
        .select(
            "r_name",
            "k_nations",
            "revenue_cents",
            # true T ≥ 0; snapped-ln dust could dip a hair below —
            # clamp keeps the rational on the div///-agreeing domain
            ratio_units_dec(
                f"greatest(t_sum, CAST(0 AS {dec}))", "revenue_cents", 1
            ).alias("theil_nanos"),
        )
    )


QUERIES["stats_theil_by_region"] = stats_theil_by_region

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_profiling,
)

ORACLES["stats_theil_by_region"] = f"""
    WITH rev AS (
        SELECT s_nationkey,
               CAST(sum({sql_iunits('l_extendedprice', 2)}) AS BIGINT) AS x
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    ), dim AS (
        SELECT n_nationkey, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    ), sized AS (
        SELECT r_name, x,
               CAST(count(*) OVER (PARTITION BY r_name) AS BIGINT) AS k,
               CAST(sum(x) OVER (PARTITION BY r_name) AS BIGINT) AS s_tot
        FROM rev JOIN dim ON s_nationkey = n_nationkey
    ), terms AS (
        SELECT r_name, k, s_tot,
               CAST(x AS HUGEINT) * (
                   CAST(floor(ln(CAST(k * x AS DOUBLE)) * 1000000000.0
                              + 0.5) AS BIGINT)
                   - CAST(floor(ln(CAST(s_tot AS DOUBLE)) * 1000000000.0
                                + 0.5) AS BIGINT)
               ) AS t_num
        FROM sized
    )
    SELECT r_name,
           CAST(max(k) AS BIGINT) AS k_nations,
           CAST(max(s_tot) AS BIGINT) AS revenue_cents,
           {_sql_rud_profiling('greatest(sum(t_num), 0)', 'max(s_tot)', 1)}
               AS theil_nanos
    FROM terms
    GROUP BY r_name
"""


# ------------------------------------------------ Herfindahl index
def stats_herfindahl_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue concentration across supplier
    nations per region — the THIRD concentration lens next to
    stats_gini (rank form) and stats_theil_by_region (entropy form);
    HHI is the one antitrust/procurement reads (≥ 2500 basis points =
    highly concentrated). Exact rational: HHI_bps = Σ x_i²·10⁴ / S²
    on the DECIMAL wide rail, 10⁴/k at perfect equality, 10⁴ under
    monopoly. HEADLINE-exempt: it rides stats_theil_by_region's
    fact-scan aggregate (the double-counting convention)."""
    from ..functions.rounding import ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(iunits(F.col("l_extendedprice"), 2)).alias("x"))
    )
    dim = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    dec = "decimal(38,0)"
    agg = (
        rev.join(F.broadcast(dim), rev.s_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("k_nations"),
            F.sum("x").alias("revenue_cents"),
            F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sq"),
        )
    )
    return agg.select(
        "r_name",
        "k_nations",
        "revenue_cents",
        ratio_units_dec(
            "sq * 10000",
            f"CAST(revenue_cents AS {dec}) * revenue_cents",
            1,
        ).alias("hhi_bps"),
    )


QUERIES["stats_herfindahl_by_region"] = stats_herfindahl_by_region

ORACLES["stats_herfindahl_by_region"] = f"""
    WITH rev AS (
        SELECT s_nationkey,
               CAST(sum({sql_iunits('l_extendedprice', 2)}) AS BIGINT) AS x
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    ), dim AS (
        SELECT n_nationkey, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    ), agg AS (
        SELECT r_name,
               CAST(count(*) AS BIGINT) AS k_nations,
               CAST(sum(x) AS BIGINT) AS revenue_cents,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sq
        FROM rev JOIN dim ON s_nationkey = n_nationkey
        GROUP BY r_name
    )
    SELECT r_name, k_nations, revenue_cents,
           {_sql_rud_profiling(
               'sq * 10000',
               'CAST(revenue_cents AS HUGEINT) * revenue_cents', 1)}
               AS hhi_bps
    FROM agg
"""


# ------------------------------------------- Lorenz top-share (P1/P10)
# Round 11: the direct concentration readout next to stats_gini —
# Gini integrates the whole Lorenz curve into one scalar; campaign
# and capacity questions need the curve's business points: "what
# share of revenue comes from the top 1% / top 10% of customers" per
# market segment. Exact integers end-to-end: per-customer spend in
# cents, the top-k cut at k = ceil(p·n/100) (the quantile_disc rank
# convention, exact integer form), and the cut TIE BLOCK handled
# closed-form — top_cents = s_above + v_cut·(k − c_above), so the
# result is invariant to which tied customers "count" (the same
# tie-block argument as stats_gini). Share is a half-up micros
# rational on the DECIMAL/HUGEINT rail.
#
# Scale: per-customer spends are near-UNIQUE (sums of order totals),
# so a naive per-segment value window is a row-grain single-task sort
# — exactly this round's banned shape. The cumulative counts/sums run
# on the distributed prefix rail (operators/ranks.py, group=segment):
# spend values range-bucket into 1024 slices per segment, local
# windows per slice, one bucket-grain stitch per segment.


LORENZ_PCTS = (1, 10)


def stats_lorenz_topshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec
    from ..operators.ranks import range_bucket, with_global_order

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(iunits(F.col("o_totalprice"), 2)).alias("v"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("segment", "v")
    )
    cnt = spend.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("t"))
    dec = "decimal(38,0)"
    bounds = cnt.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    cum = with_global_order(
        cnt.crossJoin(F.broadcast(bounds)),
        buckets=[-range_bucket(F.col("v"), F.col("lo"), F.col("hi"))],
        order=[F.desc("v")],
        sums={
            "ct": F.col("t"),
            "cs": (F.col("t").cast(dec) * F.col("v")).cast(dec),
        },
        group=["segment"],
    ).select(
        "segment",
        "v",
        "t",
        (F.col("ct") - F.col("t")).alias("c_above"),
        (F.col("cs") - F.col("t").cast(dec) * F.col("v")).alias("s_above"),
    )
    tot = cnt.groupBy("segment").agg(
        F.sum("t").alias("n_customers"),
        F.sum((F.col("t").cast(dec) * F.col("v")).cast(dec))
        .cast("long")
        .alias("total_cents"),
    )
    pcts = F.explode(
        F.array(*[F.lit(p) for p in LORENZ_PCTS])
    ).alias("p_pct")
    blocks = (
        cum.join(F.broadcast(tot), "segment")
        .select("segment", "v", "t", "c_above", "s_above",
                "n_customers", "total_cents", pcts)
        .withColumn("k", F.expr("(p_pct * n_customers + 99) div 100"))
        .filter(
            (F.col("c_above") < F.col("k"))
            & (F.col("c_above") + F.col("t") >= F.col("k"))
        )
        .select(
            "segment",
            "p_pct",
            "n_customers",
            "total_cents",
            (
                F.col("s_above")
                + F.col("v").cast(dec) * (F.col("k") - F.col("c_above"))
            )
            .cast("long")
            .alias("top_cents"),
        )
    )
    return blocks.withColumn(
        "share_micros", ratio_units_dec("top_cents", "total_cents")
    )


QUERIES["stats_lorenz_topshare"] = stats_lorenz_topshare

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_lz  # noqa: E402

ORACLES["stats_lorenz_topshare"] = f"""
    WITH spend AS (
        SELECT c_mktsegment AS segment,
               CAST(sum({sql_iunits('o_totalprice', 2)}) AS BIGINT) AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY segment, o_custkey
    ), cnt AS (
        SELECT segment, v, CAST(count(*) AS BIGINT) AS t
        FROM spend GROUP BY segment, v
    ), cum AS (
        SELECT segment, v, t,
               CAST(coalesce(sum(t) OVER w, 0) AS BIGINT) AS c_above,
               CAST(coalesce(sum(CAST(t AS HUGEINT) * v) OVER w, 0)
                    AS HUGEINT) AS s_above
        FROM cnt
        WINDOW w AS (PARTITION BY segment ORDER BY v DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), tot AS (
        SELECT segment, CAST(sum(t) AS BIGINT) AS n_customers,
               CAST(sum(CAST(t AS HUGEINT) * v) AS BIGINT) AS total_cents
        FROM cnt GROUP BY segment
    ), blocks AS (
        SELECT segment, p_pct, n_customers, total_cents,
               CAST(s_above + CAST(v AS HUGEINT)
                    * ((p_pct * n_customers + 99) // 100 - c_above)
                    AS BIGINT) AS top_cents
        FROM cum
        JOIN tot USING (segment)
        CROSS JOIN (SELECT unnest([{', '.join(str(p) for p in LORENZ_PCTS)}])
                    AS p_pct) p
        WHERE c_above < (p_pct * n_customers + 99) // 100
          AND c_above + t >= (p_pct * n_customers + 99) // 100
    )
    SELECT segment, CAST(p_pct AS INTEGER) AS p_pct, n_customers,
           total_cents, top_cents,
           {_sql_rud_lz('top_cents', 'total_cents')} AS share_micros
    FROM blocks
"""


# ------------------------------------- exact skewness / excess kurtosis
# Round 11: the third/fourth-moment completion of stats_covar's
# second-moment rail — shape diagnostics per return flag on price
# cents: a curation/monitoring pass reads g1 (asymmetry) and g2
# (tail weight vs normal) before trusting mean±σ rules. Raw moments
# Σx..Σx⁴ accumulate as EXACT DECIMAL(38,0) integers (order-free at
# any parallelism; cents⁴ ≈ 10²⁸ × fixture rows stays far inside
# 10³⁸ — at extreme volumes rescale cents to whole units, the MI
# ln-ceiling convention); the central-moment closed forms
#   n²·m2 = n·Σx² − S²
#   n³·m3 = n²·Σx³ − 3n·S·Σx² + 2S³
#   n⁴·m4 = n³·Σx⁴ − 4n²·S·Σx³ + 6n·S²·Σx² − 3S⁴
# are exact integer combinations, and only the final
# are exact integer combinations whose n-powers CANCEL in the
# normalized shapes — g1 = (n³m3)/(n²m2)^(3/2), g2 = (n⁴m4)/(n²m2)² − 3
# exactly — so those two expressions spend one double conversion per
# exact factor under pround.


def stats_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("x")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x"))).alias("s1"),
        F.sum((d(F.col("x")) * F.col("x")).cast("decimal(38,0)")).alias("s2"),
        F.sum(
            (d(F.col("x")) * F.col("x") * F.col("x")).cast("decimal(38,0)")
        ).alias("s3"),
        F.sum(
            (
                d(F.col("x")) * F.col("x") * F.col("x") * F.col("x")
            ).cast("decimal(38,0)")
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    # population central moments scaled by powers of n (exact forms)
    m2n2 = n * s2 - s1 * s1                       # n²·m2
    m3n3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1  # n³·m3
    m4n4 = (
        n * n * n * s4
        - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    )  # n⁴·m4
    return m.select(
        "l_returnflag",
        "n",
        F.col("s1").cast("long").alias("sum_cents"),
        pround(
            m3n3 / F.sqrt(m2n2 * m2n2 * m2n2), 6
        ).alias("skewness"),
        pround(m4n4 / (m2n2 * m2n2) - F.lit(3.0), 6).alias(
            "excess_kurtosis"
        ),
    )


QUERIES["stats_skewness_kurtosis"] = stats_skewness_kurtosis

ORACLES["stats_skewness_kurtosis"] = f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
               CAST(sum(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
               CAST(sum(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4
        FROM (SELECT l_returnflag, {sql_iunits('l_extendedprice', 2)} AS x
              FROM lineitem)
        GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(s1 AS BIGINT) AS sum_cents,
           {sql_pround(
               '(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)'
               '    - 3 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '    + 2 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
               ' / sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
               '        * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
               '        * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))', 6)}
               AS skewness,
           {sql_pround(
               '(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)'
               '      * CAST(s4 AS DOUBLE)'
               '    - 4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)'
               '      * CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)'
               '    + 6 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)'
               '      * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '    - 3 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)'
               '      * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
               ' / ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
               '    * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
               '       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))) - 3.0', 6)}
               AS excess_kurtosis
    FROM m
"""


# ------------------------------------------- concentration ratios CR-k
# Round 12: the FOURTH concentration lens — Gini (rank), Theil
# (entropy), HHI (sum of squares) all summarize the whole
# distribution; the CR-k family (CR1/CR4/CR8, the industrial-
# organization standard next to HHI) reads the TOP of it: the
# revenue share of the k largest suppliers, the number a procurement
# risk review quotes ("our top 4 vendors are X% of spend"). Exact:
# supplier revenue in cents (DECIMAL money rail), the top-8 selected
# via TakeOrdered (k-bounded, the Hill discipline) with a post-limit
# rank stamp, each CR an exact micros rational of cents sums. Scale:
# one fact-scan aggregate to supplier grain, then an 8-row driver-
# side-free reduce; k is a query constant.

CR_KS = [1, 4, 8]


def stats_concentration_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(iunits(F.col("l_extendedprice"), 2)).alias("x")
    )
    rev = rev.localCheckpoint(eager=False)  # top-k AND the total
    tot = rev.agg(
        F.count(F.lit(1)).alias("n_suppliers"), F.sum("x").alias("total")
    )
    top = rev.orderBy(F.desc("x"), F.asc("l_suppkey")).limit(max(CR_KS))
    stamped = top.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("x"), F.asc("l_suppkey")))
    )
    aggs = [
        F.sum(F.when(F.col("r") <= k, F.col("x"))).alias(f"top{k}")
        for k in CR_KS
    ]
    m = stamped.agg(*aggs).crossJoin(F.broadcast(tot))
    rows = m.selectExpr(
        "n_suppliers",
        "total",
        "stack("
        + str(len(CR_KS))
        + ", "
        + ", ".join(f"{k}, top{k}" for k in CR_KS)
        + ") AS (k, top_cents)"
    )
    return rows.select(
        F.col("k").cast("int").alias("k"),
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        F.col("top_cents").cast("long").alias("top_cents"),
        F.col("total").cast("long").alias("total_cents"),
        F.when(F.col("total") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec("CAST(top_cents AS DECIMAL(38,0))", "total")
        )
        .alias("cr_micros"),
    ).orderBy("k")


QUERIES["stats_concentration_ratio"] = stats_concentration_ratio

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_cr,
    sql_ratio_units_dec as _sql_rud_cr,
)


def _cr_sql() -> str:
    stack = " UNION ALL ".join(
        f"SELECT {k} AS k, top{k} AS top_cents FROM m" for k in CR_KS
    )
    tops = ",\n               ".join(
        f"CAST(sum(CASE WHEN r <= {k} THEN x END) AS BIGINT) AS top{k}"
        for k in CR_KS
    )
    return f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum({_sql_iu_cr('l_extendedprice', 2)}) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(x) AS BIGINT) AS total
        FROM rev
    ), top AS (
        SELECT x, row_number() OVER (ORDER BY x DESC, l_suppkey ASC) AS r
        FROM (
            SELECT l_suppkey, x FROM rev
            ORDER BY x DESC, l_suppkey ASC LIMIT {max(CR_KS)}
        )
    ), m AS (
        SELECT {tops}
        FROM top
    )
    SELECT CAST(k AS INTEGER) AS k,
           n_suppliers,
           top_cents,
           total AS total_cents,
           CASE WHEN total = 0 THEN NULL
                ELSE {_sql_rud_cr('CAST(top_cents AS HUGEINT)', 'total')}
           END AS cr_micros
    FROM ({stack}) CROSS JOIN tot
    ORDER BY k
"""


ORACLES["stats_concentration_ratio"] = _cr_sql()


# ------------------------------------------------ weighted quantiles
# Round 13: the WEIGHTED median/quartiles next to stats_quantiles_exact
# (which weights every row equally) — "the price below which half the
# SHIPPED VOLUME sits" is a volume-weighted quantile, the form pricing
# and capacity analyses actually need (a thousand 1-unit orders must
# not outvote one 1000-unit order). Exact rail: prices enter as exact
# cents, weights as exact integer quantity units; one value-grain
# groupBy, one cumulative-weight window over the bounded distinct-
# price relation, and each quantile is the SMALLEST price whose
# doubled cumulative weight clears 2·q·W — the lower weighted
# quantile, a pure integer decision (no interpolation, no doubles).
# Scale: the window runs on distinct prices (bounded domain), not
# rows; the scan is one partial-agg groupBy.


def stats_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    vals = (
        li.select(
            F.expr(
                "CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)"
                " AS BIGINT)"
            ).alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("cents")
        .agg(F.sum("w").alias("w"))
    )
    tot = vals.agg(F.sum("w").alias("tw"))
    w_cum = W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    cum = vals.select(
        "cents", F.sum("w").over(w_cum).alias("cw")
    ).crossJoin(F.broadcast(tot))
    qs = []
    for name, num, den in (
        ("wp25_cents", 1, 4),
        ("wp50_cents", 1, 2),
        ("wp75_cents", 3, 4),
    ):
        qs.append(
            F.min(
                F.when(
                    F.col("cw") * (2 * den) >= F.col("tw") * (2 * num),
                    F.col("cents"),
                )
            ).alias(name)
        )
    return cum.agg(
        F.max("tw").cast("long").alias("total_weight"), *qs
    )


QUERIES["stats_weighted_quantiles"] = stats_weighted_quantiles

ORACLES["stats_weighted_quantiles"] = """
    WITH vals AS (
        SELECT CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS cents,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(w) AS BIGINT) AS tw FROM vals
    ), cum AS (
        SELECT cents,
               CAST(sum(w) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cw,
               tw
        FROM vals CROSS JOIN tot
    )
    SELECT max(tw) AS total_weight,
           min(CASE WHEN cw * 8 >= tw * 2 THEN cents END) AS wp25_cents,
           min(CASE WHEN cw * 4 >= tw * 2 THEN cents END) AS wp50_cents,
           min(CASE WHEN cw * 8 >= tw * 6 THEN cents END) AS wp75_cents
    FROM cum
"""
