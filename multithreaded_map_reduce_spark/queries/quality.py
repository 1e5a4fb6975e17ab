"""Data-quality constraint suite — the declarative validation pass
(Deequ-style) a production pipeline runs before publishing a table:
not-null, uniqueness, referential integrity, value ranges, accepted
values. One gate row per TABLE of constraints, each constraint one
result row, all counts exact.

Scale shape: the single-column constraints for one table fold into ONE
scan + one aggregate (conditional counts — same single-pass trick as
profile_lineitem); uniqueness adds a countDistinct inside the same
aggregate; referential integrity is the only join — a LEFT ANTI against
the parent key relation, which Spark executes as a broadcast anti join
when the parent is dim-sized and a shuffled one otherwise. Nothing here
collects to the driver; the report is itself a DataFrame a pipeline can
sink or alert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over orders (+ RI to customer):
    (constraint, total, violations, passed)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    # single-pass conditional aggregate for the scan-local constraints
    one = o.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("_nnull"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("_dup"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("_badstatus"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("_badprice"),
    )
    scan_rows = one.selectExpr(
        """stack(4,
            'not_null:o_custkey', _nnull,
            'unique:o_orderkey', _dup,
            'accepted_values:o_orderstatus', _badstatus,
            'range:o_totalprice>0', _badprice
        ) AS (constraint, violations)""",
        "_n AS total",
    )

    orphans = (
        o.join(
            c.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .crossJoin(F.broadcast(one.select(F.col("_n").alias("total"))))
        .select(
            F.lit("ri:orders.custkey->customer").alias("constraint"),
            "violations",
            "total",
        )
    )

    report = scan_rows.select("constraint", "violations", "total").unionByName(
        orphans
    )
    return report.select(
        "constraint",
        F.col("total").cast("long").alias("total"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


QUERIES = {"dq_orders_constraints": dq_orders_constraints}

ORACLES = {
    "dq_orders_constraints": """
        WITH base AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nnull,
                   count(*) - count(DISTINCT o_orderkey) AS ndup,
                   sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                            THEN 1 ELSE 0 END) AS nbadstatus,
                   sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nbadprice
            FROM orders
        ), ri AS (
            SELECT count(*) AS orphans FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        )
        SELECT "constraint", CAST(total AS BIGINT) AS total,
               CAST(violations AS BIGINT) AS violations,
               violations = 0 AS passed
        FROM (
            SELECT 'not_null:o_custkey' AS "constraint", n AS total, nnull AS violations FROM base
            UNION ALL
            SELECT 'unique:o_orderkey', n, ndup FROM base
            UNION ALL
            SELECT 'accepted_values:o_orderstatus', n, nbadstatus FROM base
            UNION ALL
            SELECT 'range:o_totalprice>0', n, nbadprice FROM base
            UNION ALL
            SELECT 'ri:orders.custkey->customer', base.n, ri.orphans FROM base, ri
        )
    """
}


def quality_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier report per return flag: quartiles of the
    price distribution in cents, 1.5·IQR fences, and how many rows fall
    below/above — the numeric-column screening step of a data-quality
    pass.

    Exactness: quartile interpolation indices are p·(n−1) with
    p ∈ {¼, ¾}, so on integer cents every interpolated value is a
    quarter-integer — exact in binary floating point, as are the ·1.5
    and ± fence ops. The outlier DECISION therefore compares identical
    doubles in both engines; no rounding discipline is needed anywhere.

    Scale: two passes over the fact column — a per-group percentile agg
    (small state: one group per flag) whose 3-row result broadcasts
    back onto the scan, then one conditional-count agg. No sort of the
    full data; Spark's percentile keeps a per-group digest."""
    from ..functions.rounding import iunits, pround

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("c")
    )
    stats = li.groupBy("l_returnflag").agg(
        F.expr("percentile(c, 0.25)").alias("q1"),
        F.expr("percentile(c, 0.75)").alias("q3"),
    )
    fenced = stats.select(
        "l_returnflag",
        "q1",
        "q3",
        (F.col("q1") - (F.col("q3") - F.col("q1")) * F.lit(1.5)).alias("lo"),
        (F.col("q3") + (F.col("q3") - F.col("q1")) * F.lit(1.5)).alias("hi"),
    )
    return (
        li.join(F.broadcast(fenced), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0)).alias(
                "n_low"
            ),
            F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0)).alias(
                "n_high"
            ),
            pround(F.max("q1"), 2).alias("q1_cents"),
            pround(F.max("q3"), 2).alias("q3_cents"),
        )
    )


QUERIES["quality_iqr_outliers"] = quality_iqr_outliers


from ..functions.rounding import sql_iunits as _sql_iu  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pr  # noqa: E402

ORACLES["quality_iqr_outliers"] = f"""
    WITH c AS (
        SELECT l_returnflag, {_sql_iu('l_extendedprice', 2)} AS c FROM lineitem
    ), stats AS (
        SELECT l_returnflag,
               quantile_cont(c, 0.25) AS q1,
               quantile_cont(c, 0.75) AS q3
        FROM c GROUP BY 1
    ), fenced AS (
        SELECT l_returnflag, q1, q3,
               q1 - (q3 - q1) * 1.5 AS lo,
               q3 + (q3 - q1) * 1.5 AS hi
        FROM stats
    )
    SELECT c.l_returnflag,
           count(*) AS n,
           CAST(sum(CASE WHEN c.c < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN c.c > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           {_sql_pr('max(f.q1)', 2)} AS q1_cents,
           {_sql_pr('max(f.q3)', 2)} AS q3_cents
    FROM c JOIN fenced f USING (l_returnflag)
    GROUP BY 1
"""


def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust scaling report per return flag: clip the price
    distribution at the P6.25 / P93.75 interpolated percentiles and
    report the clipped-tail counts plus the winsorized sum — the
    robust-moment step a feature pipeline runs before standardizing a
    heavy-tailed column.

    Exactness (same discipline as quality_iqr_outliers, which uses
    p ∈ {¼,¾}): the cut points are DYADIC percentiles (p = 1/16,
    15/16), so the interpolation index p·(n−1), its fractional part,
    and the interpolated value v_lo + frac·Δ are all exact binary
    doubles on integer cents — both engines compute bit-identical cut
    points. Every winsorized value is then an integer multiple of
    1/16 cent, so the SUM is exact (order-independent) and is carried
    as an integer count of sixteenth-cents.

    Scale: one per-group percentile agg (3 groups), broadcast back
    onto the scan, one conditional agg. No global sort."""
    from ..functions.rounding import iunits, pround

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", iunits(F.col("l_extendedprice"), 2).alias("c")
    )
    cuts = li.groupBy("l_returnflag").agg(
        F.expr("percentile(c, 0.0625d)").alias("lo"),
        F.expr("percentile(c, 0.9375d)").alias("hi"),
    )
    w = li.join(F.broadcast(cuts), "l_returnflag").select(
        "l_returnflag",
        "lo",
        "hi",
        "c",
        F.greatest(F.least(F.col("c").cast("double"), F.col("hi")), F.col("lo")).alias(
            "wc"
        ),
    )
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0)).alias("n_clip_low"),
        F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0)).alias("n_clip_high"),
        pround(F.max("lo"), 4).alias("lo_cents"),
        pround(F.max("hi"), 4).alias("hi_cents"),
        F.sum((F.col("wc") * 16).cast("long")).alias("winsorized_sixteenth_cents"),
    )


QUERIES["quality_winsorize"] = quality_winsorize

ORACLES["quality_winsorize"] = f"""
    WITH c AS (
        SELECT l_returnflag, {_sql_iu('l_extendedprice', 2)} AS c FROM lineitem
    ), cuts AS (
        SELECT l_returnflag,
               quantile_cont(c, 0.0625) AS lo,
               quantile_cont(c, 0.9375) AS hi
        FROM c GROUP BY 1
    ), w AS (
        SELECT c.l_returnflag, cuts.lo, cuts.hi, c.c,
               greatest(least(CAST(c.c AS DOUBLE), cuts.hi), cuts.lo) AS wc
        FROM c JOIN cuts USING (l_returnflag)
    )
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
           CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
           {_sql_pr('max(lo)', 4)} AS lo_cents,
           {_sql_pr('max(hi)', 4)} AS hi_cents,
           CAST(sum(CAST(wc * 16 AS BIGINT)) AS BIGINT)
               AS winsorized_sixteenth_cents
    FROM w GROUP BY 1
"""


def dq_quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine (the dead-letter-queue step after
    ``dq_orders_constraints``' counting pass): each order is routed to
    'clean' or to its FIRST failing constraint — synthetic failure
    classes planted deterministically (status ∉ accepted for keys ≡ 0
    mod 31, non-positive price for keys ≡ 0 mod 37, orphan custkey for
    keys ≡ 0 mod 41) so both engines build the identical dirty relation.
    Output: per disposition, row count and key checksum — the routing
    table a pipeline writes next to the clean output.

    100 TB: one scan + conditional expressions for the scan-local
    rules; the referential check joins the parent keys (broadcast when
    dim-sized). The quarantine write is a partitionBy(disposition)
    sink — same cost class as any partitioned write."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 31 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(F.col("o_orderkey") % 37 == 0, F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 41 == 0, F.lit(-7))
        .otherwise(F.col("o_custkey"))
        .alias("custkey"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    with_parent = o.join(
        F.broadcast(c.withColumn("has_parent", F.lit(1))), "custkey", "left"
    )
    disposition = (
        F.when(~F.col("status").isin("O", "F", "P"), F.lit("bad_status"))
        .when(F.col("price") <= 0, F.lit("bad_price"))
        .when(F.col("has_parent").isNull(), F.lit("orphan_custkey"))
        .otherwise(F.lit("clean"))
    )
    return with_parent.groupBy(disposition.alias("disposition")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1_000_003).alias("key_checksum"),
    )


QUERIES["dq_quarantine_orders"] = dq_quarantine_orders

ORACLES["dq_quarantine_orders"] = """
    WITH staged AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 31 = 0 THEN 'X' ELSE o_orderstatus END
                   AS status,
               CASE WHEN o_orderkey % 37 = 0 THEN -1.0 ELSE o_totalprice END
                   AS price,
               CASE WHEN o_orderkey % 41 = 0 THEN -7 ELSE o_custkey END
                   AS custkey
        FROM orders
    ), routed AS (
        SELECT o_orderkey,
               CASE WHEN status NOT IN ('O', 'F', 'P') THEN 'bad_status'
                    WHEN price <= 0 THEN 'bad_price'
                    WHEN custkey NOT IN (SELECT c_custkey FROM customer)
                        THEN 'orphan_custkey'
                    ELSE 'clean' END AS disposition
        FROM staged
    )
    SELECT disposition,
           count(*) AS n_rows,
           CAST(sum(o_orderkey % 1000003) AS BIGINT) AS key_checksum
    FROM routed GROUP BY 1
"""


# ------------------------------------------------------- Benford audit
# First-significant-digit audit of order totals against Benford's law —
# the classic fabricated-data / unit-mix detector for financial-ish
# columns. Digit extraction avoids log10 entirely (floor(log10(10^k))
# can land on k-1 in doubles): totals go to exact integer cents and the
# digit is the first character of the integer's decimal string —
# int→string is exact and identical in both engines. Expected shares
# ln(1+1/d)/ln(10) and the observed-vs-expected deviation are pround'd
# doubles. One scan, one 9-row aggregate.


def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = iunits(F.col("o_totalprice"), 2)
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("total"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    return (
        counts.crossJoin(total)
        .select(
            "digit",
            "n",
            pround(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
                "obs_share"
            ),
            pround(benford, 6).alias("benford_share"),
            pround(
                F.abs(
                    F.col("n").cast("double") / F.col("total").cast("double") - benford
                ),
                6,
            ).alias("abs_dev"),
        )
    )


QUERIES["quality_benford"] = quality_benford

ORACLES["quality_benford"] = f"""
    WITH counts AS (
        SELECT CAST(substring(CAST({_sql_iu('o_totalprice', 2)} AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice > 0
        GROUP BY 1
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
    SELECT digit, n,
           {_sql_pr('CAST(n AS DOUBLE) / CAST(total AS DOUBLE)', 6)} AS obs_share,
           {_sql_pr('ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)', 6)}
               AS benford_share,
           {_sql_pr(
               'abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)'
               ' - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))', 6
           )} AS abs_dev
    FROM counts, tot
"""


# --------------------------------------------- crosstab independence
# Pearson chi-square contingency audit: are order priority and order
# status independent? Per-cell observed vs expected (row·col/N) counts
# and the cell's chi-square contribution — the drift/association check
# a data-quality suite runs between categorical columns. Exact BIGINT
# marginals; expected/contribution are doubles with one fixed
# expression shape in both engines, pround'd. One scan + three grouped
# counts, all broadcast-tiny.


def quality_crosstab_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround

    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    row_t = obs.groupBy("priority").agg(F.sum("obs").alias("row_n"))
    col_t = obs.groupBy("status").agg(F.sum("obs").alias("col_n"))
    n = obs.agg(F.sum("obs").alias("n"))
    exp = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("n").cast("double")
    )
    dev = F.col("obs").cast("double") - exp
    return (
        obs.join(row_t, "priority")
        .join(col_t, "status")
        .crossJoin(n)
        .select(
            "priority",
            "status",
            "obs",
            pround(exp, 6).alias("expected"),
            pround(dev * dev / exp, 6).alias("chisq_contrib"),
        )
    )


QUERIES["quality_crosstab_chisq"] = quality_crosstab_chisq

ORACLES["quality_crosstab_chisq"] = f"""
    WITH obs AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS obs
        FROM orders GROUP BY 1, 2
    ), row_t AS (SELECT priority, CAST(sum(obs) AS BIGINT) AS row_n FROM obs GROUP BY 1),
    col_t AS (SELECT status, CAST(sum(obs) AS BIGINT) AS col_n FROM obs GROUP BY 1),
    tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs)
    SELECT priority, status, obs,
           {_sql_pr(
               'CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)', 6
           )} AS expected,
           {_sql_pr(
               '(CAST(obs AS DOUBLE)'
               ' - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))'
               ' * (CAST(obs AS DOUBLE)'
               ' - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))'
               ' / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))',
               6
           )} AS chisq_contrib
    FROM obs JOIN row_t USING (priority) JOIN col_t USING (status) CROSS JOIN tot
"""


# ------------------------------------------- Mahalanobis 2-D outliers
# Covariance-aware outlier detection on (quantity, price): the top-k
# rows by Mahalanobis distance — the bivariate upgrade of the IQR/
# z-score checks, catching points that are unremarkable per-column but
# off the joint distribution's axis. Derivation keeps everything exact
# until one per-row double expression: with A = nΣxx−Sx², B = nΣyy−Sy²,
# C = nΣxy−SxSy and scaled residuals dxs = n·x−Sx, dys = n·y−Sy,
#   d² = (B·dxs² − 2C·dxs·dys + A·dys²) / (A·B − C²)
# (the n's cancel), so engines compute identical doubles from identical
# integers. Top-k by (d² desc, key asc) is a TakeOrdered; the moments
# relation is one exact DECIMAL(38,0)/HUGEINT aggregate (the
# stats_covar discipline).

MAHA_TOPK = 20


def quality_mahalanobis2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.money import money
    from ..functions.rounding import pround

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("x"),
        (money("l_extendedprice") * 100).cast("long").alias("y"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy"),
    )
    n = d(F.col("n"))
    ma = m.select(
        "n",
        "sx",
        "sy",
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("va"),
        (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("vb"),
        (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("vc"),
    )
    j = base.crossJoin(F.broadcast(ma))
    dxs = (d(F.col("n")) * d(F.col("x")) - F.col("sx")).cast("double")
    dys = (d(F.col("n")) * d(F.col("y")) - F.col("sy")).cast("double")
    d2 = (
        F.col("vb") * dxs * dxs
        - F.lit(2.0) * F.col("vc") * dxs * dys
        + F.col("va") * dys * dys
    ) / (F.col("va") * F.col("vb") - F.col("vc") * F.col("vc"))
    scored = j.select(
        "l_orderkey", "l_linenumber", "x", "y", pround(d2, 6).alias("maha_sq")
    )
    top = scored.orderBy(
        F.desc("maha_sq"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(MAHA_TOPK)
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("maha_sq"), F.asc("l_orderkey"), F.asc("l_linenumber"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


QUERIES["quality_mahalanobis2d"] = quality_mahalanobis2d

ORACLES["quality_mahalanobis2d"] = f"""
    WITH base AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM lineitem
    ), m AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               CAST(CAST(count(*) AS HUGEINT) * sum(x * x)
                    - CAST(sum(x) AS HUGEINT) * sum(x) AS DOUBLE) AS va,
               CAST(CAST(count(*) AS HUGEINT) * sum(y * y)
                    - CAST(sum(y) AS HUGEINT) * sum(y) AS DOUBLE) AS vb,
               CAST(CAST(count(*) AS HUGEINT) * sum(x * y)
                    - CAST(sum(x) AS HUGEINT) * sum(y) AS DOUBLE) AS vc
        FROM base
    ), scored AS (
        SELECT l_orderkey, l_linenumber, x, y,
               {_sql_pr(
                   '(vb * dxs * dxs - 2.0 * vc * dxs * dys + va * dys * dys)'
                   ' / (va * vb - vc * vc)', 6
               )} AS maha_sq
        FROM (
            SELECT base.*, va, vb, vc,
                   CAST(CAST(n AS HUGEINT) * x - sx AS DOUBLE) AS dxs,
                   CAST(CAST(n AS HUGEINT) * y - sy AS DOUBLE) AS dys
            FROM base, m
        )
    )
    SELECT l_orderkey, l_linenumber, x, y, maha_sq,
           CAST(row_number() OVER (
               ORDER BY maha_sq DESC, l_orderkey ASC, l_linenumber ASC
           ) AS INTEGER) AS rank
    FROM (
        SELECT * FROM scored
        ORDER BY maha_sq DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT {MAHA_TOPK}
    )
"""


# ------------------------------------------------ two-sample KS test
# Kolmogorov–Smirnov D between the extended-price distributions of
# returned (R) vs delivered (N) lineitems — the standard drift /
# homogeneity check a data-quality pass runs between cohorts or
# between yesterday's and today's partition. ENTIRELY integer until
# one shared division: prices go to exact cents, the ECDF gap at value
# v is |ca·nb − cb·na| (ca = A-rows ≤ v), and D's numerator is the max
# of that integer over distinct values — bit-identical in both
# engines; ks_d = d_num / (na·nb) is the single float op, pround(6).
#
# Scale: the cumulative pass runs over DISTINCT cent values (bounded
# domain), grouped first — one shuffle + one global ordered window
# over |domain| rows, not |rows|. At 100 TB with an unbounded domain,
# the same statistic runs on a binned ECDF (histogram_quantiles'
# 256-bin sketch) with error ≤ one bin width.


def quality_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits, pround

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    per_v = (
        li.select(
            iunits(F.col("l_extendedprice"), 2).alias("v"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("a"),
            F.when(F.col("l_returnflag") == "N", 1).otherwise(0).alias("b"),
        )
        .groupBy("v")
        .agg(F.sum("a").alias("na_v"), F.sum("b").alias("nb_v"))
        # r13 OPT: two consumers (the cumulative window and the totals
        # aggregate) re-ran the value-grain groupBy -- materialize once
        .localCheckpoint(eager=False)
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("na_v").over(w).alias("ca"), F.sum("nb_v").over(w).alias("cb")
    )
    totals = per_v.agg(
        F.sum("na_v").alias("na"), F.sum("nb_v").alias("nb")
    )
    gaps = cum.crossJoin(F.broadcast(totals)).select(
        "na",
        "nb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias("gap"),
    )
    return gaps.groupBy("na", "nb").agg(F.max("gap").alias("d_num")).select(
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.col("d_num").cast("long").alias("d_num"),
        pround(
            F.col("d_num").cast("double") / (F.col("na") * F.col("nb")).cast("double"),
            6,
        ).alias("ks_d"),
    )


QUERIES["quality_ks_test"] = quality_ks_test

from ..functions.rounding import sql_iunits as _sql_iunits  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pround  # noqa: E402

ORACLES["quality_ks_test"] = f"""
    WITH per_v AS (
        SELECT {_sql_iunits('l_extendedprice', 2)} AS v,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS na_v,
               sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS nb_v
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1
    ), cum AS (
        SELECT sum(na_v) OVER w AS ca, sum(nb_v) OVER w AS cb
        FROM per_v WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), t AS (
        SELECT CAST(sum(na_v) AS BIGINT) AS na,
               CAST(sum(nb_v) AS BIGINT) AS nb
        FROM per_v
    )
    SELECT na, nb, CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
           {_sql_pround('CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)'
                        ' / (CAST(na AS DOUBLE) * nb)', 6)} AS ks_d
    FROM cum, t
    GROUP BY na, nb
"""


# ------------------------------------------- exact Pearson correlation
# corr(quantity, extended-price cents) per return flag, from five
# exact integer sums (n, Σx, Σy, Σxy, Σx², Σy²): the numerator and both
# variance terms are BIGINTs both engines agree on bit-for-bit; sqrt is
# IEEE-correctly-rounded on both, so the final double matches under
# pround(6). One scan, one tiny groupBy — the textbook map-side
# aggregate. (Built-in corr() is a streaming float algorithm whose
# summation order is engine-dependent — unusable for differential
# testing; the integer-sums form is also the mergeable shape a
# two-stage 100 TB aggregation wants.)


def quality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround

    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    x = F.col("l_quantity").cast("long")
    y = iunits(F.col("l_extendedprice"), 2)
    # Σy² in cents reaches ~6e19 by sf0.1 — past int64, where Spark's
    # sum WRAPS silently while DuckDB widens to HUGEINT. All sums and
    # combinations therefore run in DECIMAL(38,0) (exact to 38 digits,
    # identical semantics both engines); doubles appear only at the
    # final division.
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((y.cast(dec) * y.cast(dec))).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        pround(
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            6,
        ).alias("pearson_r"),
    )


QUERIES["quality_correlation"] = quality_correlation

ORACLES["quality_correlation"] = f"""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DECIMAL(38,0)) AS n,
               sum(CAST(l_quantity AS DECIMAL(38,0))) AS sx,
               sum(CAST({_sql_iunits('l_extendedprice', 2)} AS DECIMAL(38,0))) AS sy,
               sum(CAST(CAST(l_quantity AS BIGINT)
                        * ({_sql_iunits('l_extendedprice', 2)}) AS DECIMAL(38,0))) AS sxy,
               sum(CAST(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sxx,
               sum(CAST({_sql_iunits('l_extendedprice', 2)} AS DECIMAL(38,0))
                   * CAST({_sql_iunits('l_extendedprice', 2)} AS DECIMAL(38,0))) AS syy
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           {_sql_pround('CAST(n * sxy - sx * sy AS DOUBLE)'
                        ' / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))'
                        ' * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))', 6)}
               AS pearson_r
    FROM s
"""


# --------------------------------------------- deterministic bootstrap
# Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
# massive data streams" — the Google large-scale bootstrap): resampling
# n rows WITH replacement is indistinguishable from giving every row an
# independent Poisson(1) replica weight, and Poisson weights need NO
# global coordination — each row computes its own weight per replica
# from a hash, so the whole bootstrap is one explode(B) + one
# map-side-combinable aggregation. Everything is deterministic: the
# uniform is the portable doc hash over (orderkey, replica), the
# Poisson inverse-CDF thresholds are shared literal doubles, weighted
# sums are exact BIGINTs, and each replica mean is one double division
# of identical integers — so both engines produce bit-identical means
# and the identical sorted CI. B = 40 replicas; the 95% band drops the
# lowest and highest replica mean (2.5% trim each side).

BOOT_B = 40
# cumulative Poisson(1) CDF at k = 0..5 (weights capped at 6)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def quality_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD, token_hash
    from ..functions.rounding import iunits, pround

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", iunits(F.col("o_totalprice"), 2).alias("c")
    )
    rep = o.select(
        "o_orderkey", "c", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    )
    u = (
        token_hash(
            F.concat(F.col("o_orderkey").cast("string"), F.lit("_"), F.col("b").cast("string"))
        )
        + F.lit(1)
    ).cast("double") / F.lit(float(POLY_MOD))
    w = F.lit(6)
    for k in range(5, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    per_rep = (
        rep.select("b", "c", w.alias("w"))
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("c")).alias("sw"), F.sum("w").alias("n_w"))
        .select((F.col("sw").cast("double") / F.col("n_w")).alias("m"))
    )
    means = per_rep.agg(F.sort_array(F.collect_list("m")).alias("ms"))
    point = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("mean_c"),
    )
    return point.crossJoin(F.broadcast(means)).select(
        F.col("n").cast("long").alias("n"),
        pround(F.col("mean_c"), 4).alias("mean_cents"),
        pround(F.element_at("ms", 2), 4).alias("ci_lo_cents"),
        pround(F.element_at("ms", BOOT_B - 1), 4).alias("ci_hi_cents"),
    )


QUERIES["quality_bootstrap_ci"] = quality_bootstrap_ci

from ..functions.hashing import POLY_MOD as _PM  # noqa: E402
from ..functions.hashing import sql_token_hash as _sql_th  # noqa: E402


def _boot_oracle() -> str:
    w_case = "CASE "
    for k in range(6):
        w_case += f"WHEN u < {_POIS_CDF[k]!r} THEN {k} "
    w_case += "ELSE 6 END"
    h = _sql_th("CAST(o_orderkey AS VARCHAR) || '_' || CAST(b AS VARCHAR)")
    return f"""
        WITH rep AS (
            SELECT o_orderkey,
                   {_sql_iunits('o_totalprice', 2)} AS c,
                   unnest(range(0, {BOOT_B})) AS b
            FROM orders
        ), uu AS (
            SELECT b, c, CAST(({h}) + 1 AS DOUBLE) / {float(_PM)!r} AS u FROM rep
        ), wrows AS (
            SELECT b, c, {w_case} AS w FROM uu
        ), per_rep AS (
            SELECT b, CAST(sum(w * c) AS DOUBLE) / sum(w) AS m
            FROM wrows GROUP BY b
        ), ms AS (
            SELECT list_sort(list(m)) AS ms FROM per_rep
        ), pt AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum({_sql_iunits('o_totalprice', 2)}) AS DOUBLE) / count(*)
                       AS mean_c
            FROM orders
        )
        SELECT n, {_sql_pround('mean_c', 4)} AS mean_cents,
               {_sql_pround('ms[2]', 4)} AS ci_lo_cents,
               {_sql_pround(f'ms[{BOOT_B - 1}]', 4)} AS ci_hi_cents
        FROM pt, ms
    """


ORACLES["quality_bootstrap_ci"] = _boot_oracle()


# ------------------------------------------------ population stability index
# The other standard drift statistic next to KS: PSI = Σ_b (p_b − q_b)
# · ln(p_b/q_b) over B equal-width buckets — what ML-ops monitors run
# between the training distribution and today's serving slice. Same
# cohorts as quality_ks_test (returned vs delivered extended price).
# Exactness: prices to exact cents, bucket index by INTEGER division
# over the global [min, max] span, add-one smoothing over the B-bucket
# spine (empty buckets included), each bucket's term snapped to nano-
# units before the sum — one exact integer total, one final division.
# Scale: one scan → one (flag, bucket) count shuffle over ≤ 2B groups,
# a 1-row min/max broadcast, and a B-row reduce. KS needs the ordered
# distinct-value pass; PSI is the cheaper fixed-B shape that runs
# anywhere a histogram runs.

PSI_B = 10


def quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import from_iunits, iunits, pround

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    mm = base.agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    bucketed = base.crossJoin(F.broadcast(mm)).select(
        "flag",
        F.least(
            F.lit(PSI_B - 1),
            F.expr(f"CAST(((c - mn) * {PSI_B}) div (mx - mn + 1) AS INT)"),
        ).alias("b"),
    )
    counts = bucketed.groupBy("b").agg(
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).alias("cb"),
    )
    spine = spark.range(PSI_B).select(F.col("id").cast("int").alias("b"))
    filled = spine.join(counts, "b", "left").select(
        "b",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = filled.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + PSI_B).cast("double")
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + PSI_B).cast("double")
    terms = filled.crossJoin(F.broadcast(tot)).select(
        "na", "nb", iunits((p - q) * F.log(p / q), 9).alias("tu")
    )
    return terms.groupBy("na", "nb").agg(
        pround(from_iunits(F.sum("tu"), 9), 6).alias("psi")
    )


QUERIES["quality_psi"] = quality_psi

from ..functions.rounding import (  # noqa: E402
    sql_from_iunits as _sql_fiu_psi,
    sql_iunits as _sql_iu_psi,
    sql_pround as _sql_pr_psi,
)

_PSI_P = f"(CAST(ca + 1 AS DOUBLE) / CAST(na + {PSI_B} AS DOUBLE))"
_PSI_Q = f"(CAST(cb + 1 AS DOUBLE) / CAST(nb + {PSI_B} AS DOUBLE))"

ORACLES["quality_psi"] = f"""
    WITH base AS (
        SELECT l_returnflag AS flag,
               CAST(l_extendedprice * 100 AS BIGINT) AS c
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), mm AS (
        SELECT min(c) AS mn, max(c) AS mx FROM base
    ), bucketed AS (
        SELECT flag,
               least({PSI_B - 1},
                     CAST(((c - mn) * {PSI_B}) // (mx - mn + 1) AS INTEGER)) AS b
        FROM base, mm
    ), counts AS (
        SELECT b,
               sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS cb
        FROM bucketed GROUP BY b
    ), spine AS (
        SELECT CAST(unnest(range(0, {PSI_B})) AS INTEGER) AS b
    ), filled AS (
        SELECT spine.b,
               CAST(coalesce(ca, 0) AS BIGINT) AS ca,
               CAST(coalesce(cb, 0) AS BIGINT) AS cb
        FROM spine LEFT JOIN counts USING (b)
    ), tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        FROM filled
    ), terms AS (
        SELECT na, nb,
               {_sql_iu_psi(f"({_PSI_P} - {_PSI_Q}) * ln({_PSI_P} / {_PSI_Q})", 9)}
                   AS tu
        FROM filled, tot
    )
    SELECT na, nb,
           {_sql_pr_psi(_sql_fiu_psi("CAST(sum(tu) AS BIGINT)", 9), 6)} AS psi
    FROM terms GROUP BY na, nb
"""


# --------------------------------------------- sample-ratio mismatch
# The A/B guardrail that runs before any treatment-effect readout
# (round 8): users are hashed into two arms 50/50; a chi-square
# statistic over the realized arm counts far above the 95% critical
# value (3.841) means the assignment itself is broken and every
# downstream metric is invalid. chi2 = (n0 - n1)^2 / (n0 + n1) on an
# equal-split design, computed as an exact micro-unit rational with
# the square in DECIMAL(38,0)/HUGEINT (the ratio_units_dec rail:
# (n0-n1)^2 wraps int64 past ~3e9 users; arms of a 100 TB event log
# can get there). One map-side-combined aggregate over user ids.

SRM_CRIT_MICROS = 3_841_459  # chi-square(1 df) 95% critical value


def quality_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = (
        token_hash(F.concat(F.lit("srm"), F.col("user_id").cast("string")))
        % 2
    )
    counts = users.select(arm.alias("arm")).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
    )
    chi2 = ratio_units_dec(
        "CAST(n0 - n1 AS DECIMAL(38,0)) * CAST(n0 - n1 AS DECIMAL(38,0))",
        "CAST(n0 + n1 AS DECIMAL(38,0))",
        1_000_000,
    )
    return counts.select(
        "n0",
        "n1",
        chi2.alias("chi2_micros"),
    ).withColumn(
        "srm_flag",
        (F.col("chi2_micros") > SRM_CRIT_MICROS).cast("int"),
    )


QUERIES["quality_srm_check"] = quality_srm_check

from ..functions.hashing import sql_token_hash as _sql_th_srm  # noqa: E402
from ..functions.rounding import sql_ratio_units_dec as _sql_rud  # noqa: E402

ORACLES["quality_srm_check"] = f"""
    WITH arms AS (
        SELECT ({_sql_th_srm("'srm' || CAST(user_id AS VARCHAR)")}) % 2 AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ), counts AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM arms
    )
    SELECT n0, n1,
           {_sql_rud("(CAST(n0 AS HUGEINT) - n1) * (CAST(n0 AS HUGEINT) - n1)",
                     "n0 + n1", 1_000_000)} AS chi2_micros,
           CAST({_sql_rud("(CAST(n0 AS HUGEINT) - n1) * (CAST(n0 AS HUGEINT) - n1)",
                          "n0 + n1", 1_000_000)} > {SRM_CRIT_MICROS}
               AS INTEGER) AS srm_flag
    FROM counts
"""


# ---------------------------------------------- referential integrity
# FK orphan audit across the star schema (round 8): the DQ pass a
# warehouse runs after every load — per relationship, how many child
# rows reference a parent key that does not exist. Each check is ONE
# broadcast/shuffle anti-join aggregated to a count (never a row dump
# — the quarantine op is dq_quarantine_orders); the relations union
# into one fixed-size report. At 100 TB each anti-join is key-local
# and the small parent sides broadcast.


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    checks = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for name, child_t, fk, parent_t, pk in checks:
        child = load_table(spark, sf_dir, child_t)
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(pk).alias("_pk")
        )
        # r13 OPT (guide §2.3 — aggregate before you shuffle): orphan
        # ROWS are counted at FK-VALUE grain (map-side partial agg),
        # so the anti-join moves distinct keys, not the fact table
        rep = (
            child.groupBy(F.col(fk).alias("_fk"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .join(parent, F.col("_fk") == F.col("_pk"), "left_anti")
            .agg(
                F.lit(name).alias("relationship"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("n_orphans"),
            )
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["dq_referential_integrity"] = dq_referential_integrity

_RI_CHECKS_SQL = " UNION ALL ".join(
    f"""SELECT '{name}' AS relationship,
           CAST(count(*) AS BIGINT) AS n_orphans
    FROM {child} c WHERE NOT EXISTS (
        SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}
    )"""
    for name, child, fk, parent, pk in [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
)

ORACLES["dq_referential_integrity"] = _RI_CHECKS_SQL


# --------------------------------------------------- one-way ANOVA (F)
# "Do sources differ in mean document length" as a single F statistic —
# the k-group generalization completing the two-sample battery
# (ks/psi/srm/cuped/correlation). Between/within sums of squares from
# exact integer group moments (n_g, S_g = Σx, Q_g = Σx²); the only
# non-integer quantities are the per-group S_g²/n_g quotients, which
# are snapped HALF-UP TO NANO-UNITS before the sums — the
# quality_psi per-bucket-snap contract, making every downstream value
# a defined exact integer on both engines. Snapping can leave
# ssb_nanos a few nanos negative when true SSB ≈ 0, so the F
# numerator clamps at zero (documented domain guard, not a fudge: F=0
# is the correct report for "no between-group variance"). All squares
# and cross products run on the DECIMAL(38,0)/HUGEINT wide rail; the
# bounded F·1e6 quotient lands in BIGINT; ssw = 0 (every group
# constant) NULLs through the rail's den-guard.
#
# Scale: one tokenize scan (map-side count), one |sources| group
# aggregate, then constant-size arithmetic — the doremi/unimax
# bounded-vocabulary profile.


def quality_anova_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source", F.size(tokenize(F.col("text"))).cast("long").alias("x")
    )
    grp = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("x").alias("s_g"),
        F.sum(F.col("x") * F.col("x")).alias("q_g"),
    )
    terms = grp.select(
        "n_g",
        "s_g",
        "q_g",
        ratio_units_dec("s_g * s_g", "n_g", 1_000_000_000).alias("term_nanos"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).alias("k_sources"),
        F.sum("n_g").alias("n_docs"),
        F.sum("s_g").alias("t_sum"),
        F.sum("q_g").alias("q_sum"),
        F.sum("term_nanos").alias("sum_terms_nanos"),
    )
    return tot.select(
        "k_sources",
        "n_docs",
        F.greatest(
            F.col("sum_terms_nanos")
            - ratio_units_dec("t_sum * t_sum", "n_docs", 1_000_000_000),
            F.lit(0),
        ).alias("ssb_nanos"),
        (F.col("q_sum") * F.lit(1_000_000_000) - F.col("sum_terms_nanos")).alias(
            "ssw_nanos"
        ),
    ).select(
        "k_sources",
        "n_docs",
        "ssb_nanos",
        "ssw_nanos",
        F.when(
            (F.col("ssw_nanos") == 0) | (F.col("k_sources") <= 1),
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units_dec(
                "ssb_nanos * (n_docs - k_sources)",
                "ssw_nanos * (k_sources - 1)",
            )
        )
        .alias("f_micros"),
    )


QUERIES["quality_anova_sources"] = quality_anova_sources


def _anova_oracle() -> str:
    from ..functions.hashing import sql_tokens
    from ..functions.rounding import sql_ratio_units_dec

    return f"""
    WITH per_doc AS (
        SELECT source, CAST(len({sql_tokens('text')}) AS BIGINT) AS x
        FROM documents
    ), grp AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(x) AS BIGINT) AS s_g,
               CAST(sum(x * x) AS BIGINT) AS q_g
        FROM per_doc GROUP BY 1
    ), terms AS (
        SELECT n_g, s_g, q_g,
               {sql_ratio_units_dec('s_g * s_g', 'n_g', 1_000_000_000)}
                   AS term_nanos
        FROM grp
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k_sources,
               CAST(sum(n_g) AS BIGINT) AS n_docs,
               CAST(sum(s_g) AS BIGINT) AS t_sum,
               CAST(sum(q_g) AS BIGINT) AS q_sum,
               CAST(sum(term_nanos) AS BIGINT) AS sum_terms_nanos
        FROM terms
    ), ss AS (
        SELECT k_sources, n_docs,
               greatest(
                   sum_terms_nanos
                   - {sql_ratio_units_dec('t_sum * t_sum', 'n_docs',
                                          1_000_000_000)},
                   0
               ) AS ssb_nanos,
               q_sum * 1000000000 - sum_terms_nanos AS ssw_nanos
        FROM tot
    )
    SELECT k_sources, n_docs,
           CAST(ssb_nanos AS BIGINT) AS ssb_nanos,
           CAST(ssw_nanos AS BIGINT) AS ssw_nanos,
           CASE WHEN ssw_nanos = 0 OR k_sources <= 1 THEN NULL
                ELSE {sql_ratio_units_dec(
                    'ssb_nanos * (n_docs - k_sources)',
                    'ssw_nanos * (k_sources - 1)')}
           END AS f_micros
    FROM ss
"""


ORACLES["quality_anova_sources"] = _anova_oracle()


# --------------------------------------------------- Spearman rank rho
# Rank correlation between document character length and token count —
# the monotone-association complement to quality_correlation's Pearson
# r (Pearson sees only LINEAR association; a length-vs-tokens
# relationship curved by long-word dialects still ranks monotonically).
# Classical d² form on tie-AVERAGED ranks, everything integer: the
# average rank of a tie group is 2r = 2·rank() + cnt − 1 (the doubled-
# median trick — rank() is the tie group's first position, cnt its
# size), d = 2rx − 2ry is an exact integer, and
# rho = (4·n(n²−1) − 6·Σd²) / (4·n(n²−1)) is a signed half-up micros
# rational with the kappa sign-split. Σd² ≤ 4n³ wraps int64 past ~1.3e6
# rows, and n(n²−1) past ~2e6 — both run on the DECIMAL(38,0)/HUGEINT
# rail; the output Σd² column is BIGINT (fixture-bounded, the vetted
# type set), rho is bounded by construction. (With ties the d² form is
# the CLASSICAL uncorrected statistic, not Pearson-on-ranks — that
# choice is the cross-engine contract and is documented here.)
#
# Scale (VERDICT r10 item 1): the doubled tie-averaged rank of a
# value v is 2r(v) = 2·c_less(v) + t(v) + 1 — a function of the VALUE
# alone — so the rank maps are built at value grain (one groupBy per
# axis + one prefix window over the DISTINCT values, bounded by the
# n_chars / token-count domains, never by corpus size) and joined
# back BROADCAST onto the distinct (x, y) pair relation with its
# multiplicity m: Σd² = Σ_(x,y) m·(2rx − 2ry)². The row-grain
# relation is touched by one groupBy only; no global row sort exists
# anywhere in the plan (same statistic bit-for-bit — a tie block
# carries one shared midrank either way).


def quality_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        F.col("n_chars").alias("x"),
        F.size(tokenize(F.col("text"))).cast("long").alias("y"),
    )
    # the distinct-pair artifact feeds BOTH rank maps and the final
    # join — materialize once (CacheManager-free) so the tokenize scan
    # doesn't re-plan three times
    pairs = per.groupBy("x", "y").agg(F.count(F.lit(1)).alias("m")).localCheckpoint(eager=False)

    def _rank_map(col: str, out: str) -> DataFrame:
        cnt = pairs.groupBy(col).agg(F.sum("m").alias("t"))
        w = W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        # doubled midrank: 2·rank + t − 1 = 2·(c_less + 1) + t − 1
        return cnt.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("t").over(w), F.lit(0))
                + F.col("t")
                + F.lit(1)
            ).alias(out),
        )

    j = pairs.join(F.broadcast(_rank_map("x", "rx2")), "x").join(
        F.broadcast(_rank_map("y", "ry2")), "y"
    )
    d = j.select(
        "m", (F.col("rx2") - F.col("ry2")).alias("d")
    )
    agg = d.agg(
        F.sum("m").alias("n_docs"),
        F.sum(
            (
                F.col("m").cast("decimal(38,0)")
                * F.col("d").cast("decimal(38,0)")
                * F.col("d")
            ).cast("decimal(38,0)")
        ).alias("sum_d2"),
    )
    return agg.select(
        "n_docs",
        F.col("sum_d2").cast("long").alias("sum_d2"),
        F.expr(
            "CASE WHEN CAST(n_docs AS DECIMAL(38,0))"
            "          * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1) = 0"
            " THEN NULL"
            " WHEN 4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1)"
            "      - 6 * sum_d2 >= 0"
            " THEN CAST((2000000 * (4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1) - 6 * sum_d2)"
            "   + 4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1))"
            "  div (2 * 4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1)) AS BIGINT)"
            " ELSE -CAST((2000000 * (6 * sum_d2 - 4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1))"
            "   + 4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1))"
            "  div (2 * 4 * CAST(n_docs AS DECIMAL(38,0))"
            "        * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1)) AS BIGINT)"
            " END"
        ).alias("rho_micros"),
    )


QUERIES["quality_spearman"] = quality_spearman


def _spearman_oracle() -> str:
    from ..functions.hashing import sql_tokens

    den = (
        "4 * CAST(n_docs AS HUGEINT)"
        " * (CAST(n_docs AS HUGEINT) * n_docs - 1)"
    )
    num = f"{den.replace('4 * ', '')} * 4 - 6 * sum_d2"
    return f"""
    WITH per AS (
        SELECT n_chars AS x,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS y
        FROM documents
    ), ranked AS (
        SELECT (2 * rank() OVER (ORDER BY x)
                + count(*) OVER (PARTITION BY x) - 1)
             - (2 * rank() OVER (ORDER BY y)
                + count(*) OVER (PARTITION BY y) - 1) AS d
        FROM per
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sum_d2
        FROM ranked
    )
    SELECT n_docs, CAST(sum_d2 AS BIGINT) AS sum_d2,
           CASE WHEN CAST(n_docs AS HUGEINT)
                     * (CAST(n_docs AS HUGEINT) * n_docs - 1) = 0 THEN NULL
                WHEN {num} >= 0
                THEN CAST((2000000 * ({num}) + {den}) // (2 * ({den}))
                     AS BIGINT)
                ELSE -CAST((2000000 * (6 * sum_d2
                        - CAST(n_docs AS HUGEINT)
                          * (CAST(n_docs AS HUGEINT) * n_docs - 1) * 4)
                     + {den}) // (2 * ({den})) AS BIGINT)
           END AS rho_micros
    FROM agg
"""


ORACLES["quality_spearman"] = _spearman_oracle()


# --------------------------------------------- permutation test (A/B)
# Fisher-style permutation test for the arm difference in per-user
# purchase spend — the nonparametric significance check next to
# quality_srm_check (assignment integrity) and events_cuped (variance
# reduction). Permutations are DETERMINISTIC pseudo-randomizations:
# re-assignment k hashes the user with salt "perm{k}" (the portable
# hash family), the observed split uses the srm/cuped "srm" salt, so
# both engines walk the identical 64-permutation ensemble. The test
# statistic |mean₁ − mean₀| is compared WITHOUT division:
# |s₁·n₀ − s₀·n₁| / (n₀·n₁) ≥ obs cross-multiplies to
# |num_k|·den_obs ≥ |num_obs|·den_k — exact integers on the
# DECIMAL(38,0)/HUGEINT rail. p = (1 + #extreme) / (K + 1), the
# standard add-one permutation p-value, as half-up micros.
#
# Scale: ONE corpus scan to per-user spend; the (K+1)-fold hash
# re-assignment explodes the |users| relation ×65 with map-side
# partial sums into 65 groups — no repeated scans, no sort. K is a
# constant dial; the ensemble relation is 65 rows.

PERM_K = 64


def quality_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits, ratio_micros

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(iunits(F.col("value"), 2)).alias("cents"))
    )
    salts = F.array(
        F.lit("srm"), *[F.lit(f"perm{k}") for k in range(PERM_K)]
    )
    assigned = per_user.select(
        "user_id",
        "cents",
        F.explode(salts).alias("salt"),
    ).select(
        "salt",
        "cents",
        (
            token_hash(F.concat(F.col("salt"), F.col("user_id").cast("string")))
            % 2
        ).alias("arm"),
    )
    stats = assigned.groupBy("salt").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0)).alias("s1"),
    ).select(
        "salt",
        "n0",
        "n1",
        F.expr(
            "abs(CAST(s1 AS DECIMAL(38,0)) * n0"
            " - CAST(s0 AS DECIMAL(38,0)) * n1)"
        ).alias("anum"),
        F.expr("CAST(n0 AS DECIMAL(38,0)) * n1").alias("den"),
    )
    obs = stats.filter(F.col("salt") == "srm").select(
        F.col("n0").alias("obs_n0"),
        F.col("n1").alias("obs_n1"),
        F.col("anum").alias("obs_num"),
        F.col("den").alias("obs_den"),
    )
    perms = stats.filter(F.col("salt") != "srm")
    extreme = (
        perms.crossJoin(F.broadcast(obs))
        .select(
            (
                F.col("anum") * F.col("obs_den")
                >= F.col("obs_num") * F.col("den")
            )
            .cast("long")
            .alias("ex"),
            "obs_n0",
            "obs_n1",
        )
        .groupBy("obs_n0", "obs_n1")
        .agg(F.sum("ex").alias("n_extreme"), F.count(F.lit(1)).alias("k"))
    )
    return extreme.select(
        F.col("obs_n0").alias("n0"),
        F.col("obs_n1").alias("n1"),
        "n_extreme",
        ratio_micros("1 + n_extreme", "k + 1").alias("p_micros"),
    )


QUERIES["quality_permutation_test"] = quality_permutation_test


def _perm_test_oracle() -> str:
    from ..functions.hashing import sql_token_hash
    from ..functions.rounding import sql_iunits, sql_ratio_micros

    th = sql_token_hash("salt || CAST(user_id AS VARCHAR)")
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum({sql_iunits('value', 2)}) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), salts AS (
        SELECT 'srm' AS salt
        UNION ALL
        SELECT 'perm' || CAST(range AS VARCHAR) FROM range({PERM_K})
    ), assigned AS (
        SELECT salt, cents, ({th}) % 2 AS arm
        FROM per_user, salts
    ), stats AS (
        SELECT salt,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT)
                   AS s0,
               CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
                   AS s1
        FROM assigned GROUP BY 1
    ), scored AS (
        SELECT salt, n0, n1,
               abs(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
                   AS anum,
               CAST(n0 AS HUGEINT) * n1 AS den
        FROM stats
    ), obs AS (
        SELECT n0 AS obs_n0, n1 AS obs_n1, anum AS obs_num, den AS obs_den
        FROM scored WHERE salt = 'srm'
    )
    SELECT obs_n0 AS n0, obs_n1 AS n1,
           CAST(sum(CASE WHEN anum * obs_den >= obs_num * den
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           {sql_ratio_micros(
               "1 + sum(CASE WHEN anum * obs_den >= obs_num * den"
               " THEN 1 ELSE 0 END)",
               'count(*) + 1')} AS p_micros
    FROM scored, obs
    WHERE salt != 'srm'
    GROUP BY 1, 2
"""


ORACLES["quality_permutation_test"] = _perm_test_oracle()


# --------------------------------------------- Mann–Whitney U (rank-sum)
# Round 10: the nonparametric two-sample location test the quality
# battery was missing — KS compares whole distributions, ANOVA/t need
# normality; Mann–Whitney is the default "is metric X shifted between
# cohort A and B" test on skewed pipeline metrics (doc lengths here:
# en vs de). Tie handling is the real midrank method, done in EXACT
# integers: for a value v, twice its midrank is
# 2·(#values < v) + (#values = v) + 1 — an integer — so 2·R₁ and the
# statistics derived from it never touch a double. Reported: the group
# sizes, 2·U for both directions (U₁ + U₂ = n₁n₂ invariant, doubled),
# the tie-correction term Σ(t³−t), and the common-language effect size
# U₁/(n₁n₂) in micros (the probability a random en doc is longer than
# a random de doc, ties counted half — micro-snapped rational of
# integers, no doubles).
#
# Scale: ONE groupBy on the distinct metric values (two conditional
# counts), one value-ordered cumulative window over the |distinct
# values| relation — lengths collapse to ≤ a few thousand distinct
# values regardless of corpus size — and one final aggregate. The
# corpus-sized stage is a single scan.

MW_LANG_A, MW_LANG_B = "en", "de"


def quality_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents")
    v = docs.filter(F.col("lang").isin(MW_LANG_A, MW_LANG_B)).select(
        (F.col("lang") == MW_LANG_A).cast("long").alias("is_a"),
        F.length("text").cast("long").alias("x"),
    )
    cnt = v.groupBy("x").agg(
        F.sum("is_a").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).alias("n_b"),
    )
    cw = W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    per = cnt.select(
        "n_a",
        "n_b",
        (F.col("n_a") + F.col("n_b")).alias("t"),
        F.coalesce(
            F.sum(F.col("n_a") + F.col("n_b")).over(cw), F.lit(0)
        ).alias("c_less"),
    )
    agg = per.agg(
        F.sum("n_a").alias("n1"),
        F.sum("n_b").alias("n2"),
        # 2·R₁ = Σ_values n_a(v) · (2·c_less(v) + t(v) + 1)
        F.sum(
            F.col("n_a") * (2 * F.col("c_less") + F.col("t") + 1)
        ).alias("r1_x2"),
        # t³ widens FIRST (ADVICE r10 same-class as kruskal's cube)
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("long")
        .alias("tie_sum"),
    )
    return agg.select(
        "n1",
        "n2",
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_x2"),
        (
            2 * F.col("n1") * F.col("n2")
            - (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1))
        ).alias("u2_x2"),
        F.col("tie_sum"),
        ratio_micros(
            "r1_x2 - n1 * (n1 + 1)", "2 * n1 * n2"
        ).alias("cles_micros"),
    )


QUERIES["quality_mannwhitney"] = quality_mannwhitney

from ..functions.rounding import sql_ratio_micros as _sql_rm  # noqa: E402

ORACLES["quality_mannwhitney"] = f"""
    WITH v AS (
        SELECT CASE WHEN lang = '{MW_LANG_A}' THEN 1 ELSE 0 END AS is_a,
               CAST(length(text) AS BIGINT) AS x
        FROM documents WHERE lang IN ('{MW_LANG_A}', '{MW_LANG_B}')
    ), cnt AS (
        SELECT x, CAST(sum(is_a) AS BIGINT) AS n_a,
               CAST(sum(1 - is_a) AS BIGINT) AS n_b
        FROM v GROUP BY x
    ), per AS (
        SELECT n_a, n_b, n_a + n_b AS t,
               CAST(coalesce(sum(n_a + n_b) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS c_less
        FROM cnt
    ), agg AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS n1,
               CAST(sum(n_b) AS BIGINT) AS n2,
               CAST(sum(n_a * (2 * c_less + t + 1)) AS BIGINT) AS r1_x2,
               CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie_sum
        FROM per
    )
    SELECT n1, n2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
           tie_sum,
           {_sql_rm('r1_x2 - n1 * (n1 + 1)', '2 * n1 * n2')} AS cles_micros
    FROM agg
"""


# ------------------------------------- Brown–Forsythe (Levene) test
# Round 10: the variance-homogeneity companion to
# quality_anova_sources — ANOVA asks "do sources differ in MEAN
# length", Brown–Forsythe asks "do they differ in SPREAD" (the
# robust-center Levene variant: deviations from the group MEDIAN, the
# form recommended for skewed data). A pipeline runs it before
# trusting pooled-variance statistics across sources.
#
# Exactness rail: group medians are exact lower medians of integer
# lengths (sorted-array element — the discrete-median idiom both
# engines share); deviations z = |x − med| are then integers, and the
# entire F machinery reuses the ANOVA decomposition verbatim —
# DECIMAL(38,0)/HUGEINT second moments, ssb/ssw in exact nano-units,
# final W in micros via the wide-rational divide. Zero doubles.
#
# Scale: the collect_list median is per-GROUP (|source| lists of group
# size); past per-group-collect scale the median comes from a value
# histogram (value_histogram's rail, the events_rfm note) — the
# decomposition after it is one scan + one 20-row broadcast join.

def quality_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select("source", F.length("text").cast("long").alias("x"))
    med = per_doc.groupBy("source").agg(
        F.element_at(
            F.sort_array(F.collect_list("x")),
            ((F.count(F.lit(1)) + 1) / 2).cast("int"),
        ).alias("med")
    )
    z = per_doc.join(F.broadcast(med), "source").select(
        "source", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    dec = "decimal(38,0)"
    grp = z.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum((F.col("z") * F.col("z")).cast(dec)).alias("q_g"),
    )
    terms = grp.select(
        "n_g",
        "s_g",
        "q_g",
        ratio_units_dec("s_g * s_g", "n_g", 1_000_000_000).alias(
            "term_nanos"
        ),
    )
    tot = terms.agg(
        F.count(F.lit(1)).alias("k_sources"),
        F.sum("n_g").alias("n_docs"),
        F.sum("s_g").alias("t_sum"),
        F.sum("q_g").alias("q_sum"),
        F.sum("term_nanos").alias("sum_terms_nanos"),
    )
    return tot.select(
        "k_sources",
        "n_docs",
        F.greatest(
            F.col("sum_terms_nanos")
            - ratio_units_dec("t_sum * t_sum", "n_docs", 1_000_000_000),
            F.lit(0),
        ).alias("ssb_nanos"),
        (
            F.col("q_sum") * F.lit(1_000_000_000) - F.col("sum_terms_nanos")
        ).cast("long").alias("ssw_nanos"),
    ).select(
        "k_sources",
        "n_docs",
        "ssb_nanos",
        "ssw_nanos",
        F.when(
            (F.col("ssw_nanos") == 0) | (F.col("k_sources") <= 1),
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units_dec(
                "ssb_nanos * (n_docs - k_sources)",
                "ssw_nanos * (k_sources - 1)",
            )
        )
        .alias("w_micros"),
    )


QUERIES["quality_levene"] = quality_levene

from ..functions.rounding import sql_ratio_units_dec as _sql_rud  # noqa: E402

ORACLES["quality_levene"] = f"""
    WITH per_doc AS (
        SELECT source, CAST(length(text) AS BIGINT) AS x FROM documents
    ), med AS (
        SELECT source,
               list_sort(list(x))[CAST((count(*) + 1) // 2 AS INTEGER)]
                   AS med
        FROM per_doc GROUP BY source
    ), z AS (
        SELECT per_doc.source, abs(per_doc.x - med.med) AS z
        FROM per_doc JOIN med ON per_doc.source = med.source
    ), grp AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(z) AS BIGINT) AS s_g,
               CAST(sum(z * z) AS HUGEINT) AS q_g
        FROM z GROUP BY source
    ), terms AS (
        SELECT n_g, s_g, q_g,
               {_sql_rud('s_g * s_g', 'n_g', 1_000_000_000)} AS term_nanos
        FROM grp
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k_sources,
               CAST(sum(n_g) AS BIGINT) AS n_docs,
               CAST(sum(s_g) AS BIGINT) AS t_sum,
               CAST(sum(q_g) AS HUGEINT) AS q_sum,
               CAST(sum(term_nanos) AS BIGINT) AS sum_terms_nanos
        FROM terms
    )
    SELECT k_sources, n_docs, ssb_nanos, ssw_nanos,
           CASE WHEN ssw_nanos = 0 OR k_sources <= 1 THEN NULL
                ELSE {_sql_rud('ssb_nanos * (n_docs - k_sources)',
                               'ssw_nanos * (k_sources - 1)')}
           END AS w_micros
    FROM (
        SELECT k_sources, n_docs,
               CAST(greatest(sum_terms_nanos
                    - {_sql_rud('t_sum * t_sum', 'n_docs', 1_000_000_000)},
                    0) AS BIGINT) AS ssb_nanos,
               CAST(q_sum * 1000000000 - sum_terms_nanos AS BIGINT)
                   AS ssw_nanos
        FROM tot
    )
"""


# ------------------------------------------ Kruskal–Wallis rank test
# The k-group generalization of quality_mannwhitney: "does document
# length differ across ALL sources at once" on ranks — the
# distribution-free companion to quality_anova_sources (means) and
# quality_levene (spreads); a curation pass runs it before pooling
# sources whose length profiles may differ in shape, not just mean.
#
# Exactness rail (the mannwhitney c_less trick, extended per group):
# group ranks never materialize per row. For each distinct value v,
# c_less(v) = #obs < v and t(v) = #obs = v come from ONE value-grouped
# relation; the doubled mid-rank sum per group g is then
#   2·R_g = Σ_v n_gv · (2·c_less(v) + t(v) + 1)
# — pure BIGINT. H = 3/(N(N+1)) · Σ_g (2R_g)²/n_g − 3(N+1) with the
# squared term in DECIMAL(38,0) (2R_g ~ N² at worst) and each
# (2R_g)²/n_g quotient half-up-rounded to integer UNITS via the wide
# rational divide (the rounded quotient IS the contract — the oracle
# replays it). Tie correction C = 1 − Σ(t³−t)/(N³−N) applied as one
# more exact rational. Zero doubles anywhere.
#
# Scale: one corpus scan → value-grouped counts (|distinct lengths|
# rows, tiny); the per-(value, source) relation is |distinct|×k. The
# (2R_g)² DECIMAL headroom holds to N ≈ 10^9 ranks per run (beyond
# that, rank statistics move to the banded-histogram rail — the
# stats_gini note).

def quality_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    v = docs.select("source", F.length("text").cast("long").alias("x"))
    # per (value, group) counts + per-value totals in one pass each
    gv = v.groupBy("x", "source").agg(F.count(F.lit(1)).alias("n_gv"))
    per_v = gv.groupBy("x").agg(F.sum("n_gv").alias("t"))
    cw = W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    per_v = per_v.select(
        "x",
        "t",
        F.coalesce(F.sum("t").over(cw), F.lit(0)).alias("c_less"),
    )
    grp = (
        gv.join(per_v, "x")
        .groupBy("source")
        .agg(
            F.sum("n_gv").alias("n_g"),
            F.sum(
                F.col("n_gv") * (2 * F.col("c_less") + F.col("t") + 1)
            ).alias("r2_g"),
        )
    )
    dec = "decimal(38,0)"
    terms = grp.select(
        "n_g",
        # (2R_g)²/(4·n_g) in half-up integer units, DECIMAL-wide
        ratio_units_dec(
            f"CAST(r2_g AS {dec}) * CAST(r2_g AS {dec})", "4 * n_g", 1
        ).alias("term_units"),
    )
    ties = per_v.agg(
        # t³ widens FIRST (ADVICE r10: a 2^21-row tie group wraps the
        # int64 cube while the HUGEINT oracle keeps going); the output
        # stays the vetted BIGINT (fixture-bounded)
        F.sum(
            F.col("t").cast(dec) * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("long")
        .alias("tie_sum")
    )
    tot = terms.agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum("n_g").alias("n_total"),
        F.sum(F.col("term_units").cast(dec)).alias("s_units"),
    ).crossJoin(F.broadcast(ties))
    h = tot.select(
        "k_groups",
        "n_total",
        "tie_sum",
        (
            # true H ≥ 0; per-term rounding dust could dip a hair
            # below — clamp so the downstream rational stays on the
            # non-negative domain where div/// agree (both engines
            # apply the identical clamp)
            F.greatest(
                ratio_units_dec(
                    "12 * s_units", "n_total * (n_total + 1)", 1_000_000
                )
                - 3 * (F.col("n_total") + 1) * F.lit(1_000_000),
                F.lit(0),
            )
        ).alias("h_micros"),
    )
    return h.select(
        "k_groups",
        "n_total",
        "tie_sum",
        "h_micros",
        # the n³ terms widen BEFORE the cube (ADVICE r10: int64 wraps
        # silently at n_total ≥ 2^21 docs while the oracle computes in
        # HUGEINT — cross-engine divergence, not just a wrong number)
        F.when(
            F.col("tie_sum").cast(dec)
            == F.col("n_total").cast(dec)
            * F.col("n_total")
            * F.col("n_total")
            - F.col("n_total"),
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units_dec(
                "h_micros * (CAST(n_total AS DECIMAL(38,0))"
                " * n_total * n_total - n_total)",
                "CAST(n_total AS DECIMAL(38,0)) * n_total * n_total"
                " - n_total - tie_sum",
                1,
            )
        )
        .alias("h_tie_micros"),
    )


QUERIES["quality_kruskal_wallis"] = quality_kruskal_wallis

ORACLES["quality_kruskal_wallis"] = f"""
    WITH v AS (
        SELECT source, CAST(length(text) AS BIGINT) AS x FROM documents
    ), gv AS (
        SELECT x, source, CAST(count(*) AS BIGINT) AS n_gv
        FROM v GROUP BY x, source
    ), per_v AS (
        SELECT x, t,
               CAST(coalesce(sum(t) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS c_less
        FROM (SELECT x, CAST(sum(n_gv) AS BIGINT) AS t FROM gv GROUP BY x)
    ), grp AS (
        SELECT gv.source,
               CAST(sum(n_gv) AS BIGINT) AS n_g,
               CAST(sum(n_gv * (2 * c_less + t + 1)) AS BIGINT) AS r2_g
        FROM gv JOIN per_v ON gv.x = per_v.x
        GROUP BY gv.source
    ), terms AS (
        SELECT n_g,
               {_sql_rud('CAST(r2_g AS HUGEINT) * CAST(r2_g AS HUGEINT)',
                         '4 * n_g', 1)} AS term_units
        FROM grp
    ), ties AS (
        SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie_sum
        FROM per_v
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k_groups,
               CAST(sum(n_g) AS BIGINT) AS n_total,
               CAST(sum(CAST(term_units AS HUGEINT)) AS HUGEINT) AS s_units
        FROM terms
    ), h AS (
        SELECT k_groups, n_total, tie_sum,
               CAST(greatest({_sql_rud('12 * s_units',
                                       'n_total * (n_total + 1)',
                                       1_000_000)}
                    - 3 * (n_total + 1) * 1000000, 0) AS BIGINT) AS h_micros
        FROM tot CROSS JOIN ties
    )
    SELECT k_groups, n_total, tie_sum, h_micros,
           CASE WHEN tie_sum = n_total * n_total * n_total - n_total
                THEN NULL
                ELSE {_sql_rud(
                    'h_micros * (CAST(n_total AS HUGEINT) * n_total * n_total - n_total)',
                    'CAST(n_total AS HUGEINT) * n_total * n_total - n_total - tie_sum',
                    1)}
           END AS h_tie_micros
    FROM h
"""


# --------------------------------------- mSPRT always-valid A/B test
# The sequential-testing counterpart of events_cuped/events_diff_in_diff:
# the mixture SPRT (Johari, Koomen, Pekelis & Walsh 2017 — "peeking"-
# safe A/B inference) evaluated at every DAY of the experiment. With
# the mixture variance set to the pooled variance (τ² = σ², the
# standard default) the log likelihood ratio collapses to
#   ln Λ_n = ½·[ln 2 − ln(2+n)] + n²·δ²/(4σ²(2+n)),
# so DOUBLING it makes every piece exact-integer computable:
#   2·ln Λ = (ln2 − ln(2+n)) snapped to nanos (integer ln arguments)
#          + n²δ²/(2σ²(2+n)) as one wide rational.
# Reject when 2·lnΛ ≥ 2·ln(1/α) — an integer compare against a
# precomputed literal. No floor-of-negative ever crosses an engine
# boundary (the one negative quantity, term1, is a DIFFERENCE of two
# snapped non-negative integers).
#
# Scale: one fact scan → per-(day, arm) moments; the cumulative fold
# and the test statistic run on the CALENDAR-bounded day relation.

def quality_msprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits, ratio_units, ratio_units_dec
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    rows = ev.select(
        (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
        (token_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
        iunits(F.col("value"), 3).alias("v"),
    )
    daily = rows.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("dn_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("v")).otherwise(0)).alias("ds_a"),
        F.sum(
            F.when(F.col("arm") == 0, (F.col("v") * F.col("v")).cast(dec))
            .otherwise(F.lit(0).cast(dec))
        ).alias("dq_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("dn_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("v")).otherwise(0)).alias("ds_b"),
        F.sum(
            F.when(F.col("arm") == 1, (F.col("v") * F.col("v")).cast(dec))
            .otherwise(F.lit(0).cast(dec))
        ).alias("dq_b"),
    )
    cw = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.select(
        "day",
        *[
            F.sum(f"d{c}").over(cw).alias(c)
            for c in ("n_a", "s_a", "q_a", "n_b", "s_b", "q_b")
        ],
    )
    means = cum.select(
        "day",
        "n_a",
        "n_b",
        "q_a",
        "q_b",
        "s_a",
        "s_b",
        ratio_units("s_a", "n_a", 1).alias("m_a"),
        ratio_units("s_b", "n_b", 1).alias("m_b"),
        # per-arm SSW in milli² units: q·n − s² ≥ 0 exactly (Cauchy–
        # Schwarz on integers), so the rational stays non-negative
        ratio_units_dec("q_a * n_a - CAST(s_a AS decimal(38,0)) * s_a", "n_a", 1).alias("ssw_a"),
        ratio_units_dec("q_b * n_b - CAST(s_b AS decimal(38,0)) * s_b", "n_b", 1).alias("ssw_b"),
    )
    stat = means.select(
        "day",
        "n_a",
        "n_b",
        (F.col("m_a") - F.col("m_b")).alias("d_milli"),
        (F.col("n_a") + F.col("n_b")).alias("n"),
        F.when(
            F.col("n_a") + F.col("n_b") <= 2, F.lit(None).cast("long")
        )
        .otherwise(
            ratio_units_dec("ssw_a + ssw_b", "n_a + n_b - 2", 1)
        )
        .alias("v_milli2"),
    )
    ln9 = lambda c: iunits(F.log(c.cast("double")), 9)  # noqa: E731
    out = stat.select(
        "day",
        "n_a",
        "n_b",
        "d_milli",
        "v_milli2",
        F.when(
            (F.col("v_milli2").isNull()) | (F.col("v_milli2") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.lit(_LN2_NANOS)
            - ln9(F.col("n") + 2)
            + ratio_units_dec(
                "CAST(n AS decimal(38,0)) * n * d_milli * d_milli",
                "2 * v_milli2 * (n + 2)",
                1_000_000_000,
            )
        )
        .alias("lnlam_x2_nanos"),
    )
    return out.select(
        "day",
        "n_a",
        "n_b",
        "d_milli",
        "v_milli2",
        "lnlam_x2_nanos",
        (F.col("lnlam_x2_nanos") >= F.lit(_MSPRT_THRESH_X2_NANOS)).alias(
            "reject_null"
        ),
    )


import math as _math  # noqa: E402

_LN2_NANOS = int(_math.floor(_math.log(2.0) * 1e9 + 0.5))
_MSPRT_ALPHA = 0.05
_MSPRT_THRESH_X2_NANOS = int(
    _math.floor(2.0 * _math.log(1.0 / _MSPRT_ALPHA) * 1e9 + 0.5)
)

QUERIES["quality_msprt_monitor"] = quality_msprt_monitor

from ..functions.hashing import sql_token_hash as _sql_th_msprt  # noqa: E402
from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_msprt,
    sql_ratio_units as _sql_ru_msprt,
)

ORACLES["quality_msprt_monitor"] = f"""
    WITH rows_ AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               {_sql_th_msprt("CAST(user_id AS VARCHAR)")} % 2 AS arm,
               {_sql_iu_msprt('value', 3)} AS v
        FROM events
    ), daily AS (
        SELECT day,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dn_a,
               CAST(sum(CASE WHEN arm = 0 THEN v ELSE 0 END) AS BIGINT) AS ds_a,
               CAST(sum(CASE WHEN arm = 0 THEN CAST(v AS HUGEINT) * v
                             ELSE 0 END) AS HUGEINT) AS dq_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dn_b,
               CAST(sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT) AS ds_b,
               CAST(sum(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) * v
                             ELSE 0 END) AS HUGEINT) AS dq_b
        FROM rows_ GROUP BY day
    ), cum AS (
        SELECT day,
               CAST(sum(dn_a) OVER w AS BIGINT) AS n_a,
               CAST(sum(ds_a) OVER w AS BIGINT) AS s_a,
               sum(dq_a) OVER w AS q_a,
               CAST(sum(dn_b) OVER w AS BIGINT) AS n_b,
               CAST(sum(ds_b) OVER w AS BIGINT) AS s_b,
               sum(dq_b) OVER w AS q_b
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), means AS (
        SELECT day, n_a, n_b,
               {_sql_ru_msprt('s_a', 'n_a', 1)} AS m_a,
               {_sql_ru_msprt('s_b', 'n_b', 1)} AS m_b,
               {_sql_rud('q_a * n_a - CAST(s_a AS HUGEINT) * s_a', 'n_a', 1)} AS ssw_a,
               {_sql_rud('q_b * n_b - CAST(s_b AS HUGEINT) * s_b', 'n_b', 1)} AS ssw_b
        FROM cum
    ), stat AS (
        SELECT day, n_a, n_b,
               CAST(m_a - m_b AS BIGINT) AS d_milli,
               n_a + n_b AS n,
               CASE WHEN n_a + n_b <= 2 THEN NULL
                    ELSE {_sql_rud('ssw_a + ssw_b', 'n_a + n_b - 2', 1)}
               END AS v_milli2
        FROM means
    )
    SELECT day, n_a, n_b, d_milli, v_milli2,
           lnlam_x2_nanos,
           lnlam_x2_nanos >= {_MSPRT_THRESH_X2_NANOS} AS reject_null
    FROM (
        SELECT day, n_a, n_b, d_milli, v_milli2,
               CASE WHEN v_milli2 IS NULL OR v_milli2 = 0 THEN NULL
                    ELSE {_LN2_NANOS}
                         - CAST(floor(ln(CAST(n + 2 AS DOUBLE))
                                      * 1000000000.0 + 0.5) AS BIGINT)
                         + {_sql_rud(
                             'CAST(n AS HUGEINT) * n * d_milli * d_milli',
                             '2 * CAST(v_milli2 AS HUGEINT) * (n + 2)',
                             1_000_000_000)}
               END AS lnlam_x2_nanos
        FROM stat
    )
"""


# ------------------------------------------------- MDE / power planning
# The experiment-PLANNING companion of quality_msprt_monitor's
# monitoring: the minimum detectable effect at 80% power / α=0.05
# two-sided, MDE = (z_{α/2} + z_β)·√(2σ²/n̄), per day of accumulated
# data — the "how much longer must this test run" curve. z constants
# are precomputed python literals shared by both engines; σ² is the
# same pooled-variance wide rational as mSPRT; the single √ is the one
# correctly-rounded IEEE transcendental, and the final value snaps
# under pround(6) (jitter-audited).

def quality_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits, pround, ratio_units_dec
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    rows = ev.select(
        (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
        (token_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
        iunits(F.col("value"), 3).alias("v"),
    )
    daily = rows.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("dn_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("dn_b"),
        F.sum(F.col("v")).alias("ds"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("dq"),
    )
    cw = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.select(
        "day",
        *[
            F.sum(f"d{c}").over(cw).alias(c)
            for c in ("n_a", "n_b", "s", "q")
        ],
    )
    stat = cum.select(
        "day",
        "n_a",
        "n_b",
        F.when(F.col("n_a") + F.col("n_b") <= 1, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                f"(q * (n_a + n_b) - CAST(s AS {dec}) * s)",
                "(n_a + n_b) * (n_a + n_b - 1)",
                1,
            )
        )
        .alias("v_milli2"),
    )
    # harmonic per-arm n: 2/(1/n_a + 1/n_b) = 2·n_a·n_b/(n_a+n_b) —
    # the unbalanced-arms form of "n per group", exact milli-rational
    nbar = ratio_units_dec("2 * n_a * n_b", "(n_a + n_b)", 1000)
    return stat.select(
        "day",
        "n_a",
        "n_b",
        "v_milli2",
        nbar.alias("nbar_milli"),
        F.when(
            F.col("v_milli2").isNull()
            | (F.col("n_a") == 0)
            | (F.col("n_b") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            pround(
                F.lit(_Z_SUM)
                * F.sqrt(
                    F.lit(2000.0)
                    * F.col("v_milli2").cast("double")
                    / nbar.cast("double")
                )
                / F.lit(1000.0),
                6,
            )
        )
        .alias("mde"),
    )


_Z_ALPHA2 = 1.959963984540054  # Φ⁻¹(0.975)
_Z_BETA = 0.8416212335729143  # Φ⁻¹(0.80)
_Z_SUM = _Z_ALPHA2 + _Z_BETA

QUERIES["quality_mde_power"] = quality_mde_power

from ..functions.rounding import sql_pround as _sql_pr_mde  # noqa: E402

ORACLES["quality_mde_power"] = f"""
    WITH rows_ AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               {_sql_th_msprt("CAST(user_id AS VARCHAR)")} % 2 AS arm,
               {_sql_iu_msprt('value', 3)} AS v
        FROM events
    ), daily AS (
        SELECT day,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dn_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dn_b,
               CAST(sum(v) AS BIGINT) AS ds,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS dq
        FROM rows_ GROUP BY day
    ), cum AS (
        SELECT day,
               CAST(sum(dn_a) OVER w AS BIGINT) AS n_a,
               CAST(sum(dn_b) OVER w AS BIGINT) AS n_b,
               CAST(sum(ds) OVER w AS BIGINT) AS s,
               sum(dq) OVER w AS q
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), stat AS (
        SELECT day, n_a, n_b,
               CASE WHEN n_a + n_b <= 1 THEN NULL
                    ELSE {_sql_rud(
                        '(q * (n_a + n_b) - CAST(s AS HUGEINT) * s)',
                        '(n_a + n_b) * (n_a + n_b - 1)', 1)}
               END AS v_milli2,
               {_sql_rud('2 * n_a * n_b', '(n_a + n_b)', 1000)} AS nbar_milli
        FROM cum
    )
    SELECT day, n_a, n_b, v_milli2, nbar_milli,
           CASE WHEN v_milli2 IS NULL OR n_a = 0 OR n_b = 0 THEN NULL
                ELSE {_sql_pr_mde(
                    f"{_Z_SUM} * sqrt(2000.0 * CAST(v_milli2 AS DOUBLE)"
                    " / CAST(nbar_milli AS DOUBLE)) / 1000.0", 6)}
           END AS mde
    FROM stat
"""


# ------------------------------------------- Chatterjee ξ correlation
# The modern (2020) rank correlation that detects ARBITRARY functional
# dependence, not just monotone trends — ξ ≈ 0 for independence, → 1
# as y becomes a measurable function of x, and unlike Pearson/Spearman
# it finds oscillating relationships. Computed per return flag on
# (quantity, price) with the ties-correct form
#   ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)),
# r_i = #{y_j ≤ y_i}, l_i = #{y_j ≥ y_i}, sequence ordered by x with
# the deterministic (x, orderkey, linenumber) tiebreak. Every quantity
# is an exact BIGINT/DECIMAL — the one subtraction at the end is of
# two exact integers (ξ may legitimately be slightly negative).
#
# Scale (VERDICT r10 item 1): r, l and n are functions of the VALUE
# alone (r(v) = #{y ≤ v}, l(v) = n − #{y < v}), so the rank maps are
# built at value grain — one groupBy per (g, y) + a prefix window over
# DISTINCT prices per flag (bounded by the cents domain: quantity
# 1..50 × part-price grid, never by row count) — and broadcast back
# onto the rows. Σ l(n−l) needs no row grain at all (Σ_v t·l·(n−l)).
# The only genuinely sequential piece, Σ|Δr| over the x-ordered walk,
# runs on the distributed-lag rail: rows bucket by (x, hash-tiebreak
# div 2^21) — a MONOTONE quantization of the walk order — local lags
# run per bucket (≤ 3·50·1024 domain-bounded partitions), and the
# bucket-boundary pairs stitch through a first/last-per-bucket
# relation whose window is domain-bounded (operators/ranks.py is the
# same pattern generalized). Bit-identical statistic, no single-task
# row sort anywhere.

XI_TB_BUCKET_WIDTH = 2_097_152  # 2^31 / 1024 — tiebreak-hash bucket dial


def quality_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits, ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        iunits(F.col("l_extendedprice"), 2).alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    # value-grain rank maps: r = #{≤ v}; l = n − #{< v}; n per flag
    ycnt = li.groupBy("g", "y").agg(F.count(F.lit(1)).alias("t"))
    wyv = (
        W.partitionBy("g").orderBy("y").rowsBetween(W.unboundedPreceding, -1)
    )
    dec = "decimal(38,0)"
    # value-grain artifact consumed twice (the s2 aggregate and the
    # row-side broadcast) — materialize once, CacheManager-free
    ymap = ycnt.select(
        "g",
        "y",
        "t",
        F.coalesce(F.sum("t").over(wyv), F.lit(0)).alias("c_less"),
        F.sum("t").over(W.partitionBy("g")).alias("n"),
    ).select(
        "g",
        "y",
        "t",
        "n",
        (F.col("c_less") + F.col("t")).alias("r"),
        (F.col("n") - F.col("c_less")).alias("l"),
    ).localCheckpoint(eager=False)
    vg = ymap.groupBy("g").agg(
        F.max("n").alias("n"),
        F.sum((F.col("t").cast(dec) * F.col("l") * (F.col("n") - F.col("l"))).cast(dec)).alias("s2"),
    )
    # Chatterjee prescribes RANDOM x-tie-breaking (x = quantity is
    # heavily tied here; breaking ties BY y leaks y-order and measured
    # ξ ≈ 0.86 artifactually). The deterministic stand-in is a hash of
    # the full row identity — pseudo-random w.r.t. y, reproducible in
    # both engines. The fixture's (orderkey, linenumber) is NOT unique
    # (observed), so y rides the hash input and the trailing keys;
    # residual full ties carry EQUAL r, making Σ|Δr| invariant (and
    # making the first/last-in-bucket tie ambiguity below harmless).
    from ..functions.hashing import token_hash

    rows = (
        li.join(F.broadcast(ymap.select("g", "y", "r")), ["g", "y"])
        .withColumn(
            "tb",
            token_hash(
                F.concat_ws(
                    ":", F.col("l_orderkey"), F.col("l_linenumber"), F.col("y")
                )
            ),
        )
        .withColumn("tbb", F.expr(f"CAST(tb div {XI_TB_BUCKET_WIDTH} AS INT)"))
    )
    ordk = [F.col("tb"), F.col("l_orderkey"), F.col("l_linenumber"), F.col("y")]
    wloc = W.partitionBy("g", "x", "tbb").orderBy(*ordk)
    # SINGLE row-grain pass: the within-bucket lag sum AND the bucket
    # boundary endpoints come out of one window + one aggregate (the
    # r11 bench caught the two-consumer form re-scanning lineitem)
    bnd = (
        rows.select(
            "g",
            "x",
            "tbb",
            "r",
            *ordk,
            F.abs(F.col("r") - F.lag("r").over(wloc)).alias("dr"),
        )
        .groupBy("g", "x", "tbb")
        .agg(
            F.sum(F.col("dr").cast(dec)).alias("s1_local"),
            F.min_by("r", F.struct(*ordk)).alias("first_r"),
            F.max_by("r", F.struct(*ordk)).alias("last_r"),
        )
    )
    wb = W.partitionBy("g").orderBy("x", "tbb")
    stitch = bnd.select(
        "g",
        "s1_local",
        F.abs(F.col("first_r") - F.lag("last_r").over(wb))
        .cast(dec)
        .alias("dr_bnd"),
    ).groupBy("g").agg(
        (
            F.coalesce(F.sum("s1_local"), F.lit(0).cast(dec))
            + F.coalesce(F.sum("dr_bnd"), F.lit(0).cast(dec))
        ).alias("s1")
    )
    agg = vg.join(stitch, "g", "left").select(
        "g",
        "n",
        "s2",
        F.coalesce(F.col("s1"), F.lit(0).cast(dec)).alias("s1"),
    )
    return agg.select(
        F.col("g").alias("l_returnflag"),
        "n",
        F.col("s1").cast("long").alias("sum_rank_jumps"),
        F.when(F.col("s2") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.lit(1_000_000)
            - ratio_units_dec("n * s1", "2 * s2", 1_000_000)
        )
        .alias("xi_micros"),
    )


QUERIES["quality_xi_correlation"] = quality_xi_correlation

_XI_TB = _sql_th_msprt(
    "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    " || ':' || CAST(y AS VARCHAR)"
)

ORACLES["quality_xi_correlation"] = f"""
    WITH li AS (
        SELECT l_returnflag AS g,
               CAST(l_quantity AS BIGINT) AS x,
               {_sql_iu_msprt('l_extendedprice', 2)} AS y,
               l_orderkey, l_linenumber
        FROM lineitem
    ), ranked AS (
        SELECT g, x, y, l_orderkey, l_linenumber,
               CAST(rank() OVER (PARTITION BY g ORDER BY y)
                    + count(*) OVER (PARTITION BY g, y) - 1
                    AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY g)
                    - rank() OVER (PARTITION BY g ORDER BY y) + 1
                    AS BIGINT) AS l,
               CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM li
    ), seq AS (
        SELECT g, n, l,
               abs(r - lag(r) OVER (
                   PARTITION BY g
                   ORDER BY x,
                            {_XI_TB},
                            l_orderkey, l_linenumber, y)) AS dr
        FROM ranked
    ), agg AS (
        SELECT g,
               CAST(max(n) AS BIGINT) AS n,
               CAST(sum(CAST(dr AS HUGEINT)) AS HUGEINT) AS s1,
               CAST(sum(CAST(l AS HUGEINT) * (n - l)) AS HUGEINT) AS s2
        FROM seq GROUP BY g
    )
    SELECT g AS l_returnflag, n,
           CAST(s1 AS BIGINT) AS sum_rank_jumps,
           CASE WHEN s2 = 0 THEN NULL
                ELSE CAST(1000000
                     - {_sql_rud('n * s1', '2 * s2', 1_000_000)} AS BIGINT)
           END AS xi_micros
    FROM agg
"""


# ------------------------------------------- discrete mutual information
# MI(lang; source) over the document corpus — the feature-selection /
# redundancy statistic that tells a curation pass whether two metadata
# facets carry independent signal (MI ≈ 0 → stratify on both; MI high
# → one is a proxy for the other). Exact-integer rail: with
# p = n_xy/N, MI = Σ n_xy·[ln(n_xy·N) − ln(n_x·n_y)]/N — every ln
# argument an exact integer (the ln-snap contract), the weighted sum
# in DECIMAL, one wide rational divide to nanos. Integer-ln ceiling:
# n_xy·N < 2^53 holds to ~10^8-doc corpora per run; past that, rescale
# counts to kilo-units on both sides (same contract, shifted grid).
#
# Scale: one corpus scan → |lang×source| cells; marginals come from
# the cell relation, not a rescan. MI ≥ 0 mathematically; snapped-ln
# dust is clamped like stats_theil_by_region.

def quality_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_xy")
    ).localCheckpoint()
    mx = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(
        F.sum("n_xy").alias("n_docs"),
        F.count(F.lit(1)).alias("k_cells"),
        F.countDistinct("lang").alias("k_lang"),
        F.countDistinct("source").alias("k_source"),
    )
    ln9 = lambda c: iunits(F.log(c.cast("double")), 9)  # noqa: E731
    dec = "decimal(38,0)"
    terms = (
        cells.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_docs",
            "k_cells",
            "k_lang",
            "k_source",
            (
                F.col("n_xy").cast(dec)
                * (
                    ln9(F.col("n_xy") * F.col("n_docs"))
                    - ln9(F.col("n_x") * F.col("n_y"))
                ).cast(dec)
            ).alias("t"),
        )
    )
    return terms.groupBy("n_docs", "k_lang", "k_source", "k_cells").agg(
        ratio_units_dec(
            f"greatest(sum(t), CAST(0 AS {dec}))", "first(n_docs)", 1
        ).alias("mi_nanos")
    )


QUERIES["quality_mutual_information"] = quality_mutual_information

ORACLES["quality_mutual_information"] = f"""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_xy
        FROM documents GROUP BY lang, source
    ), mx AS (
        SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY lang
    ), my AS (
        SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_y
        FROM cells GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_xy) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS k_cells,
               CAST(count(DISTINCT lang) AS BIGINT) AS k_lang,
               CAST(count(DISTINCT source) AS BIGINT) AS k_source
        FROM cells
    ), terms AS (
        SELECT n_docs, k_lang, k_source, k_cells,
               CAST(n_xy AS HUGEINT) * (
                   CAST(floor(ln(CAST(n_xy * n_docs AS DOUBLE))
                              * 1000000000.0 + 0.5) AS BIGINT)
                   - CAST(floor(ln(CAST(n_x * n_y AS DOUBLE))
                                * 1000000000.0 + 0.5) AS BIGINT)
               ) AS t
        FROM cells
        JOIN mx USING (lang)
        JOIN my USING (source)
        CROSS JOIN tot
    )
    SELECT n_docs, k_lang, k_source, k_cells,
           {_sql_rud('greatest(sum(t), 0)', 'first(n_docs)', 1)} AS mi_nanos
    FROM terms
    GROUP BY n_docs, k_lang, k_source, k_cells
"""


# ------------------------------------- Wilcoxon signed-rank (paired)
# Round 11: the PAIRED-sample companion to quality_mannwhitney —
# Mann-Whitney compares two independent cohorts; Wilcoxon asks "did
# the SAME users' purchase spend shift between the first and second
# half of the observation window" (the pre/post test a pipeline runs
# after a change ships). Pairing: per purchasing user, spend in cents
# before vs after the window midpoint; zero differences drop (the
# classical Wilcoxon convention); ranks of |d| use the real midrank
# tie method in EXACT integers on the value-grain c_less rail (this
# round's rank discipline): for a distinct |d| value v,
# 2·midrank(v) = 2·c_less(v) + t(v) + 1, so 2·W⁺ = Σ_{d>0} 2·midrank
# never touches a double, and 2·W⁺ + 2·W⁻ = n(n+1) is an output-level
# invariant the oracle replays. The tie correction Σ(t³−t) widens
# before the cube (the ADVICE r10 rail) and the effect size
# W⁺/(W⁺+W⁻) is a half-up micros rational of integers.
#
# Scale: one purchase-filtered scan → per-user halves; the only
# unpartitioned window runs on DISTINCT |d| values (bounded by the
# cents domain, the mannwhitney class), everything else aggregates.


def quality_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits, ratio_micros
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(epoch_micros(F.col("ts"))).alias("gmin"),
        F.max(epoch_micros(F.col("ts"))).alias("gmax"),
    ).select(F.expr("(gmin + gmax) div 2").alias("tsplit"))
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    epoch_micros(F.col("ts")) < F.col("tsplit"),
                    iunits(F.col("value"), 2),
                ).otherwise(0)
            ).alias("spend1"),
            F.sum(
                F.when(
                    epoch_micros(F.col("ts")) >= F.col("tsplit"),
                    iunits(F.col("value"), 2),
                ).otherwise(0)
            ).alias("spend2"),
        )
    )
    d = per_user.select(
        (F.col("spend2") - F.col("spend1")).alias("d")
    ).filter(F.col("d") != 0)
    cnt = d.groupBy(F.abs(F.col("d")).alias("v")).agg(
        F.count(F.lit(1)).alias("t"),
        F.sum((F.col("d") > 0).cast("long")).alias("t_pos"),
    )
    cw = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    dec = "decimal(38,0)"
    per_v = cnt.select(
        "t",
        "t_pos",
        F.coalesce(F.sum("t").over(cw), F.lit(0)).alias("c_less"),
    )
    agg = per_v.agg(
        F.sum("t").alias("n_nonzero"),
        # 2·W⁺ = Σ_v t_pos(v) · (2·c_less(v) + t(v) + 1)
        F.sum(
            F.col("t_pos") * (2 * F.col("c_less") + F.col("t") + 1)
        ).alias("w_plus_x2"),
        F.sum(
            F.col("t").cast(dec) * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("long")
        .alias("tie_sum"),
    )
    return agg.select(
        "n_nonzero",
        "w_plus_x2",
        (
            F.col("n_nonzero") * (F.col("n_nonzero") + 1) - F.col("w_plus_x2")
        ).alias("w_minus_x2"),
        "tie_sum",
        ratio_micros(
            "w_plus_x2", "n_nonzero * (n_nonzero + 1)"
        ).alias("effect_micros"),
    )


QUERIES["quality_wilcoxon_signed_rank"] = quality_wilcoxon_signed_rank

from ..functions.rounding import sql_iunits as _sql_iu_wsr  # noqa: E402
from ..functions.rounding import sql_ratio_micros as _sql_rm_wsr  # noqa: E402

ORACLES["quality_wilcoxon_signed_rank"] = f"""
    WITH span AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS tsplit
        FROM events
    ), per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN epoch_us(ts) < tsplit
                        THEN {_sql_iu_wsr('value', 2)} ELSE 0 END)
                    AS BIGINT) AS spend1,
               CAST(sum(CASE WHEN epoch_us(ts) >= tsplit
                        THEN {_sql_iu_wsr('value', 2)} ELSE 0 END)
                    AS BIGINT) AS spend2
        FROM events, span
        WHERE event_type = 'purchase'
        GROUP BY 1
    ), d AS (
        SELECT spend2 - spend1 AS d FROM per_user WHERE spend2 != spend1
    ), cnt AS (
        SELECT abs(d) AS v, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS t_pos
        FROM d GROUP BY 1
    ), per_v AS (
        SELECT t, t_pos,
               CAST(coalesce(sum(t) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS c_less
        FROM cnt
    ), agg AS (
        SELECT CAST(sum(t) AS BIGINT) AS n_nonzero,
               CAST(sum(t_pos * (2 * c_less + t + 1)) AS BIGINT) AS w_plus_x2,
               CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie_sum
        FROM per_v
    )
    SELECT n_nonzero, w_plus_x2,
           CAST(n_nonzero * (n_nonzero + 1) - w_plus_x2 AS BIGINT)
               AS w_minus_x2,
           tie_sum,
           {_sql_rm_wsr('w_plus_x2', 'n_nonzero * (n_nonzero + 1)')}
               AS effect_micros
    FROM agg
"""


# ----------------------------------------------------- Cramér's V
# Round 11: the normalized-association companion to
# quality_mutual_information on the same lang × source contingency
# relation — MI is in nats (unbounded, hard to compare across
# tables); V = sqrt(χ²/(N·min(r−1, k−1))) lands in [0, 1], the
# feature-redundancy score a curation pass thresholds directly. Exact
# rail: χ² = N·(Σ n_xy²/(n_x·n_y) − 1); each cell's rational is a
# half-up NANO snap of exact integers (DECIMAL-widened square over
# the marginal product — the per-term snap contract MI already uses
# for its ln terms, replayed identically by the oracle), the cell sum
# S is exact, χ²·1e9 = N·(S − 1e9) clamps the rounding dust at 0, and
# V spends one double sqrt under pround.
#
# Scale: one corpus scan → |lang×source| cells; marginals from the
# cell relation; everything after is cell-grain (≤ dozens of rows).


def quality_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround, ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_xy")
    ).localCheckpoint(eager=False)
    mx = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(
        F.sum("n_xy").alias("n_docs"),
        F.countDistinct("lang").alias("k_lang"),
        F.countDistinct("source").alias("k_source"),
    )
    terms = (
        cells.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .select(
            ratio_units_dec(
                "CAST(n_xy AS DECIMAL(38,0)) * n_xy",
                "CAST(n_x AS DECIMAL(38,0)) * n_y",
                1_000_000_000,
            ).alias("cell_nanos")
        )
    )
    s = terms.agg(F.sum("cell_nanos").alias("s_nanos")).crossJoin(
        F.broadcast(tot)
    )
    out = s.select(
        "n_docs",
        "k_lang",
        "k_source",
        F.greatest(
            F.col("s_nanos") - F.lit(1_000_000_000), F.lit(0)
        ).alias("phi2_nanos"),
    )
    return out.select(
        "n_docs",
        "k_lang",
        "k_source",
        "phi2_nanos",
        F.when(
            F.least(F.col("k_lang"), F.col("k_source")) <= 1,
            F.lit(None).cast("double"),
        )
        .otherwise(
            pround(
                F.sqrt(
                    F.col("phi2_nanos").cast("double")
                    / 1e9
                    / (
                        F.least(F.col("k_lang"), F.col("k_source")) - 1
                    ).cast("double")
                ),
                6,
            )
        )
        .alias("cramers_v"),
    )


QUERIES["quality_cramers_v"] = quality_cramers_v

from ..functions.rounding import sql_pround as _sql_pr_cv  # noqa: E402
from ..functions.rounding import sql_ratio_units_dec as _sql_rud_cv  # noqa: E402

ORACLES["quality_cramers_v"] = f"""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_xy
        FROM documents GROUP BY lang, source
    ), mx AS (
        SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY lang
    ), my AS (
        SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_y
        FROM cells GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_xy) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS k_lang,
               CAST(count(DISTINCT source) AS BIGINT) AS k_source
        FROM cells
    ), terms AS (
        SELECT {_sql_rud_cv('CAST(n_xy AS HUGEINT) * n_xy',
                            'CAST(n_x AS HUGEINT) * n_y',
                            1_000_000_000)} AS cell_nanos
        FROM cells JOIN mx USING (lang) JOIN my USING (source)
    ), s AS (
        SELECT CAST(greatest(sum(cell_nanos) - 1000000000, 0) AS BIGINT)
                   AS phi2_nanos
        FROM terms
    )
    SELECT n_docs, k_lang, k_source, phi2_nanos,
           CASE WHEN least(k_lang, k_source) <= 1 THEN NULL
                ELSE {_sql_pr_cv(
                    'sqrt(CAST(phi2_nanos AS DOUBLE) / 1e9'
                    ' / CAST(least(k_lang, k_source) - 1 AS DOUBLE))', 6)}
           END AS cramers_v
    FROM s CROSS JOIN tot
"""


# ------------------------------------------- delta-method ratio CI
# Round 12: the CI every experimentation platform needs for RATIO
# metrics (revenue per event, CTR, items per order) where the naive
# per-row variance is wrong because numerator and denominator are
# correlated within user — the classic linearization (delta method /
# Fieller regime, e.g. Deng et al. KDD'18 "Applying the Delta Method
# in Metric Analytics"): with per-user (xᵢ, yᵢ) and R̂ = Σx/Σy,
# Var(R̂) ≈ n·(Sxx − 2R̂·Sxy + R̂²·Syy) / ((n−1)·Sy²) — the residuals
# dᵢ = xᵢ − R̂yᵢ are zero-mean BY CONSTRUCTION (Σd = 0), so raw
# moment sums suffice, no centering pass. Here: revenue (purchase
# cents) per event across all users. Exactness: per-user cents/counts
# are exact integers, the five moment sums ride DECIMAL(38,0)/HUGEINT,
# R̂ is an exact micros rational; only the final se/CI touch doubles —
# one fixed expression + single sqrt + pround(6) (the Wilson
# discipline). Scale: one events scan → user-grain aggregate → one
# 5-sum reduce; nothing data-grain after the first groupBy.


def quality_delta_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround, ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase", iunits(F.col("value"), 2)
            ).otherwise(F.lit(0))
        ).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((d(F.col("x")) * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((d(F.col("y")) * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((d(F.col("x")) * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    r = sx / sy
    var = (
        n * (sxx - 2 * r * sxy + r * r * syy) / ((n - 1) * sy * sy)
    )
    se = F.sqrt(var)
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("sum_cents"),
        F.col("sy").cast("long").alias("sum_events"),
        ratio_units_dec("sx", "sy").alias("ratio_micros"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(pround(se, 6))
        .alias("se_cents"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(pround(r - 1.96 * se, 6))
        .alias("ci_lo_cents"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(pround(r + 1.96 * se, 6))
        .alias("ci_hi_cents"),
    )


QUERIES["quality_delta_ratio_ci"] = quality_delta_ratio_ci

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_dr,
    sql_pround as _sql_pr_dr,
    sql_ratio_units_dec as _sql_rud_dr,
)

_DR = (
    "(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE)"
    " - 2 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    "   * CAST(sxy AS DOUBLE)"
    " + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    "   * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    "   * CAST(syy AS DOUBLE))"
    " / ((CAST(n AS DOUBLE) - 1)"
    "    * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)

ORACLES["quality_delta_ratio_ci"] = f"""
    WITH per AS (
        SELECT user_id,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                   THEN {_sql_iu_dr('CAST(value AS DOUBLE)', 2)} END), 0)
                   AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM per
    )
    SELECT n AS n_users, sx AS sum_cents, sy AS sum_events,
           {_sql_rud_dr('sx', 'sy')} AS ratio_micros,
           CASE WHEN n < 2 THEN NULL
                ELSE {_sql_pr_dr(f'sqrt({_DR})', 6)} END AS se_cents,
           CASE WHEN n < 2 THEN NULL
                ELSE {_sql_pr_dr(
                    'CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)'
                    f' - 1.96 * sqrt({_DR})', 6)} END AS ci_lo_cents,
           CASE WHEN n < 2 THEN NULL
                ELSE {_sql_pr_dr(
                    'CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)'
                    f' + 1.96 * sqrt({_DR})', 6)} END AS ci_hi_cents
    FROM m
"""


# --------------------------------------------- Anderson-Darling (2-sample)
# Round 12: the tail-weighted EDF companion to quality_ks_test — KS
# reads the single largest CDF gap (center-dominated); the two-sample
# Anderson–Darling statistic (Pettitt 1976; Scholz–Stephens 1987,
# tie-adjusted discrete form) weights gaps by 1/(F(1−F)), so
# distribution shifts hiding in the TAILS (exactly where junk-doc
# scores and price outliers live) move AD long before they move KS.
# With distinct pooled values j (mass ℓ_j, pooled cum B_j, sample-a
# cum M_j) and D_j = N·M_j − n_a·B_j (the same integer gap relation
# the KS rail computes):
#   A² = (1/(n_a·n_b)) · Σ_{B_j<N} ℓ_j · D_j² / (B_j·(N−B_j)).
# Exactness: every factor is an exact integer on the value-grain
# rail; each term snaps to nano-units via one DECIMAL(38,0) rational
# (per-term half-up — deterministic and engine-identical; with V
# distinct values the accumulated rounding is ≤ V/2 nanos, ~3e-5 on
# this fixture's A², and the DIFFERENTIAL compare is exact
# regardless), and A² is reported in micros. Overflow ceiling
# (ADVICE r12 recompute): the quantity that must fit DECIMAL(38,0)/
# HUGEINT is the rounding helper's FULL numerator 2·mult·ℓ_j·D_j²
# = 2·10⁹·ℓ_j·D_j², not D_j² alone. |D_j| ≤ n_a·n_b ≤ N²/4, so with
# modest per-value mass ℓ_j the binding term is 2·10⁹·(N²/4)² ≤ 10³⁸
# ⇒ exact to N ≈ 3·10⁷ pooled rows; the adversarial single-value
# corner (ℓ_j ~ N) lowers that to N ≈ 10⁶. Past the ceiling Spark
# DECIMAL silently NULLs while DuckDB HUGEINT raises — divergent
# failure — so at larger N drop mult to micros (buys ~√10·) and
# rescale D by a common power of 10 pre-square, or move the per-term
# rational to one identical double expression on both engines. Same
# scan shape as KS: one value-grain groupBy + one cumulative window
# + one reduce.


def quality_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits, ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    per_v = (
        li.select(
            iunits(F.col("l_extendedprice"), 2).alias("v"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("a"),
            F.when(F.col("l_returnflag") == "N", 1).otherwise(0).alias("b"),
        )
        .groupBy("v")
        .agg(F.sum("a").alias("na_v"), F.sum("b").alias("nb_v"))
        # r13 OPT: two consumers (the cumulative window and the totals
        # aggregate) re-ran the value-grain groupBy -- materialize once
        .localCheckpoint(eager=False)
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = per_v.select(
        (F.col("na_v") + F.col("nb_v")).alias("l"),
        F.sum("na_v").over(w).alias("ma"),
        (F.sum("na_v").over(w) + F.sum("nb_v").over(w)).alias("bb"),
    )
    totals = per_v.agg(F.sum("na_v").alias("na"), F.sum("nb_v").alias("nb"))
    dec = "decimal(38,0)"
    terms = (
        cum.crossJoin(F.broadcast(totals))
        .filter(F.col("bb") < F.col("na") + F.col("nb"))
        .select(
            "na",
            "nb",
            ratio_units_dec(
                f"CAST(l AS {dec})"
                f" * (CAST(na + nb AS {dec}) * ma - CAST(na AS {dec}) * bb)"
                f" * (CAST(na + nb AS {dec}) * ma - CAST(na AS {dec}) * bb)",
                f"CAST(na AS {dec}) * nb * bb * (na + nb - bb)",
                1_000_000_000,
            ).alias("t_nanos"),
        )
    )
    out = terms.groupBy("na", "nb").agg(F.sum("t_nanos").alias("a2_nanos"))
    return out.select(
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.col("a2_nanos").cast("long").alias("a2_nanos"),
        F.expr("(2 * a2_nanos + 1000) div 2000").cast("long").alias("a2_micros"),
    )


QUERIES["quality_anderson_darling"] = quality_anderson_darling

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_ad,
    sql_ratio_units_dec as _sql_rud_ad,
)

ORACLES["quality_anderson_darling"] = f"""
    WITH per_v AS (
        SELECT {_sql_iu_ad('l_extendedprice', 2)} AS v,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS na_v,
               sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS nb_v
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1
    ), cum AS (
        SELECT CAST(na_v + nb_v AS BIGINT) AS l,
               CAST(sum(na_v) OVER w AS BIGINT) AS ma,
               CAST(sum(na_v + nb_v) OVER w AS BIGINT) AS bb
        FROM per_v WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), t AS (
        SELECT CAST(sum(na_v) AS BIGINT) AS na,
               CAST(sum(nb_v) AS BIGINT) AS nb
        FROM per_v
    ), terms AS (
        SELECT na, nb,
               {_sql_rud_ad(
                   'CAST(l AS HUGEINT)'
                   ' * (CAST(na + nb AS HUGEINT) * ma'
                   '    - CAST(na AS HUGEINT) * bb)'
                   ' * (CAST(na + nb AS HUGEINT) * ma'
                   '    - CAST(na AS HUGEINT) * bb)',
                   'CAST(na AS HUGEINT) * nb * bb * (na + nb - bb)',
                   1_000_000_000)} AS t_nanos
        FROM cum, t
        WHERE bb < na + nb
    )
    SELECT na, nb,
           CAST(sum(t_nanos) AS BIGINT) AS a2_nanos,
           CAST((2 * sum(t_nanos) + 1000) // 2000 AS BIGINT) AS a2_micros
    FROM terms
    GROUP BY na, nb
"""


# ------------------------------------------------ TOST equivalence
# Round 12: the experimentation decision the significance battery
# cannot make — SRM/mann-whitney/CUPED all test "is there a
# difference"; a migration/refactor ship decision needs "are these
# PROVABLY similar", which is the two-one-sided-tests procedure
# (Schuirmann 1987): equivalence at margin δ iff BOTH
# t_lower = (d+δ)/se > z_{0.95} AND t_upper = (δ−d)/se > z_{0.95}
# (90% TOST ⟺ the 90% CI of d lies inside ±δ). Units here: per-user
# purchase cents split by the deterministic user-parity assignment
# (the SRM fixture convention), δ = 2% of the pooled mean. Exactness:
# group moment sums are DECIMAL integers; d and δ are exact signed
# micros rationals; the Welch se and both t statistics are one fixed
# double expression + single sqrt + pround(6) (Wilson discipline),
# and the equivalence DECISION compares nano-snapped t values against
# the 1.645 threshold as integers (the logreg PR/MCC threshold-snap
# precedent — a boundary flip requires |t − 1.645| < 1e-9).
# Scale: user-grain aggregate → one 6-sum reduce → 1 row.


def quality_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import (
        iunits,
        pround,
        ratio_units_dec,
        ratio_units_dec_signed,
    )

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase", iunits(F.col("value"), 2)
            ).otherwise(F.lit(0))
        ).alias("x")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = per.groupBy((F.col("user_id") % 2).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum((d(F.col("x")) * F.col("x")).cast("decimal(38,0)")).alias("q"),
    )
    m = g.groupBy().pivot("g", [0, 1]).agg(
        F.first("n").alias("n"), F.first("s").alias("s"), F.first("q").alias("q")
    )
    # pivot emits columns 0_n, 0_s, 0_q, 1_n, 1_s, 1_q
    n0, s0, q0 = F.col("`0_n`"), F.col("`0_s`"), F.col("`0_q`")
    n1, s1, q1 = F.col("`1_n`"), F.col("`1_s`"), F.col("`1_q`")
    nn0 = n0.cast("double")
    nn1 = n1.cast("double")
    ss0 = s0.cast("double")
    ss1 = s1.cast("double")
    qq0 = q0.cast("double")
    qq1 = q1.cast("double")
    v0 = (nn0 * qq0 - ss0 * ss0) / (nn0 * (nn0 - 1))
    v1 = (nn1 * qq1 - ss1 * ss1) / (nn1 * (nn1 - 1))
    welch = v0 / nn0 + v1 / nn1
    se = F.sqrt(welch)
    diff = ss0 / nn0 - ss1 / nn1
    delta = (ss0 + ss1) / (F.lit(50.0) * (nn0 + nn1))
    t_lower = (diff + delta) / se
    t_upper = (delta - diff) / se
    # Degenerate guard on the IDENTICAL double expression the oracle's
    # _TOST_BAD tests (the Welch term v0/n0 + v1/n1, same association
    # order) — guarding on v0 + v1 instead can round to a different
    # sign than the oracle's term on a zero-variance slice and flip
    # NULL vs value cross-engine (ADVICE r12).
    bad = (
        n0.isNull() | n1.isNull() | (n0 < 2) | (n1 < 2)
        | (welch <= 0)
    )
    base = m.select(
        n0.cast("long").alias("n_a"),
        n1.cast("long").alias("n_b"),
        ratio_units_dec_signed(
            "CAST(`0_s` AS DECIMAL(38,0)) * `1_n`"
            " - CAST(`1_s` AS DECIMAL(38,0)) * `0_n`",
            "CAST(`0_n` AS DECIMAL(38,0)) * `1_n`",
            off=10**6,
        ).alias("diff_cents_micros"),
        ratio_units_dec(
            "CAST(`0_s` AS DECIMAL(38,0)) + `1_s`",
            "50 * (CAST(`0_n` AS DECIMAL(38,0)) + `1_n`)",
        ).alias("delta_cents_micros"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(pround(t_lower, 6))
        .alias("t_lower"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(pround(t_upper, 6))
        .alias("t_upper"),
        F.when(bad, F.lit(None).cast("long"))
        .otherwise(iunits(t_lower, 9))
        .alias("_tl9"),
        F.when(bad, F.lit(None).cast("long"))
        .otherwise(iunits(t_upper, 9))
        .alias("_tu9"),
    )
    return base.select(
        "n_a",
        "n_b",
        "diff_cents_micros",
        "delta_cents_micros",
        "t_lower",
        "t_upper",
        F.when(
            F.col("_tl9").isNull(), F.lit(None).cast("int")
        )
        .otherwise(
            (
                (F.col("_tl9") > 1_645_000_000)
                & (F.col("_tu9") > 1_645_000_000)
            ).cast("int")
        )
        .alias("equivalent_90tost"),
    )


QUERIES["quality_tost_equivalence"] = quality_tost_equivalence

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_tost,
    sql_pround as _sql_pr_tost,
    sql_ratio_units_dec as _sql_rud_tost,
    sql_ratio_units_dec_signed as _sql_ruds_tost,
)

_TOST_V = (
    "((CAST(n0 AS DOUBLE) * CAST(q0 AS DOUBLE)"
    " - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))"
    " / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1))"
    " / CAST(n0 AS DOUBLE)"
    " + (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    " / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1))"
    " / CAST(n1 AS DOUBLE))"
)
_TOST_DIFF = (
    "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
)
_TOST_DELTA = (
    "((CAST(s0 AS DOUBLE) + CAST(s1 AS DOUBLE))"
    " / (50.0 * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))))"
)
_TOST_TL = f"(({_TOST_DIFF} + {_TOST_DELTA}) / sqrt({_TOST_V}))"
_TOST_TU = f"(({_TOST_DELTA} - {_TOST_DIFF}) / sqrt({_TOST_V}))"
_TOST_BAD = (
    "(n0 IS NULL OR n1 IS NULL OR n0 < 2 OR n1 < 2"
    f" OR {_TOST_V} <= 0)"
)

ORACLES["quality_tost_equivalence"] = f"""
    WITH per AS (
        SELECT user_id,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                   THEN {_sql_iu_tost('CAST(value AS DOUBLE)', 2)} END), 0)
                   AS BIGINT) AS x
        FROM events GROUP BY 1
    ), g AS (
        SELECT user_id % 2 AS g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
        FROM per GROUP BY 1
    ), m AS (
        SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
               max(CASE WHEN g = 0 THEN s END) AS s0,
               max(CASE WHEN g = 0 THEN q END) AS q0,
               max(CASE WHEN g = 1 THEN n END) AS n1,
               max(CASE WHEN g = 1 THEN s END) AS s1,
               max(CASE WHEN g = 1 THEN q END) AS q1
        FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_a,
           CAST(n1 AS BIGINT) AS n_b,
           {_sql_ruds_tost(
               'CAST(s0 AS HUGEINT) * n1 - CAST(s1 AS HUGEINT) * n0',
               'CAST(n0 AS HUGEINT) * n1', off=10**6)}
               AS diff_cents_micros,
           {_sql_rud_tost('CAST(s0 AS HUGEINT) + s1',
                          '50 * (CAST(n0 AS HUGEINT) + n1)')}
               AS delta_cents_micros,
           CASE WHEN {_TOST_BAD} THEN NULL
                ELSE {_sql_pr_tost(_TOST_TL, 6)} END AS t_lower,
           CASE WHEN {_TOST_BAD} THEN NULL
                ELSE {_sql_pr_tost(_TOST_TU, 6)} END AS t_upper,
           CASE WHEN {_TOST_BAD} THEN NULL
                ELSE CAST({_sql_iu_tost(_TOST_TL, 9)} > 1645000000
                          AND {_sql_iu_tost(_TOST_TU, 9)} > 1645000000
                          AS INTEGER)
           END AS equivalent_90tost
    FROM m
"""


# ------------------------------------------- lineitem cross-field dq
# Round 12: the CROSS-FIELD constraint rows the dq family was
# missing — dq_orders_constraints validates single columns; real
# ingest bugs live BETWEEN columns and BETWEEN tables (a swapped
# date pair passes every single-column range check). Three lifecycle
# invariants over lineitem ⋈ orders: ship-after-order, a 1-year
# shipping horizon, and the unit-price floor
# l_extendedprice ≥ l_quantity (unit price ≥ $1 — a quantity/price
# column swap inverts it). The fixture's synthetic dates are
# INDEPENDENT, so the date constraints report real violation mass —
# which is exactly the point of a dq report (it surfaces, never
# silently filters); the test pins the violation counts against a
# plain-Python replay rather than assuming zero. One fact scan +
# one order-date join, conditional counts (the
# dq_orders_constraints single-pass shape).


def dq_lineitem_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    one = j.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
        ).alias("_ship_before_order"),
        F.sum(
            F.when(
                F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 365),
                1,
            ).otherwise(0)
        ).alias("_ship_horizon"),
        F.sum(
            F.when(
                F.col("l_extendedprice") < F.col("l_quantity"), 1
            ).otherwise(0)
        ).alias("_unit_price_floor"),
    )
    rows = one.selectExpr(
        """stack(3,
            'order:l_shipdate>=o_orderdate', _ship_before_order,
            'horizon:l_shipdate<=o_orderdate+365d', _ship_horizon,
            'band:l_extendedprice>=l_quantity', _unit_price_floor
        ) AS (constraint, violations)""",
        "_n AS total",
    )
    return rows.select(
        "constraint",
        F.col("total").cast("long").alias("total"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).cast("int").alias("passed"),
    ).orderBy("constraint")


QUERIES["dq_lineitem_dates"] = dq_lineitem_dates

ORACLES["dq_lineitem_dates"] = """
    WITH j AS (
        SELECT l_shipdate, o_orderdate, l_extendedprice, l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), one AS (
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN l_shipdate < o_orderdate
                        THEN 1 ELSE 0 END) AS BIGINT) AS v1,
               CAST(sum(CASE WHEN l_shipdate
                                  > o_orderdate + INTERVAL 365 DAY
                        THEN 1 ELSE 0 END) AS BIGINT) AS v2,
               CAST(sum(CASE WHEN l_extendedprice < l_quantity
                        THEN 1 ELSE 0 END) AS BIGINT) AS v3
        FROM j
    )
    SELECT "constraint", total, violations,
           CAST(violations = 0 AS INTEGER) AS passed
    FROM (
        SELECT 'order:l_shipdate>=o_orderdate' AS "constraint",
               total, v1 AS violations FROM one
        UNION ALL
        SELECT 'horizon:l_shipdate<=o_orderdate+365d', total, v2 FROM one
        UNION ALL
        SELECT 'band:l_extendedprice>=l_quantity', total, v3 FROM one
    )
    ORDER BY "constraint"
"""


# ------------------------------------------- Goodman-Kruskal gamma
# Round 13: the ordinal-association member of the correlation family —
# spearman/xi read continuous ranks, cramers_v reads NOMINAL
# contingency; Goodman-Kruskal gamma (1954) is the statistic for two
# ORDERED categoricals, here order priority (its leading digit is the
# ordinal) vs order-value band ($50k steps on the exact cents rail):
# gamma = (C - D)/(C + D) over concordant/discordant pairs, ties
# dropped — the "do expensive orders run urgent" dial. The pair count
# never touches row pairs: both variables are low-cardinality, so C
# and D come from the CELL-PAIR cross join of the contingency table
# (|cells|² ≈ 10⁴ integer products — constant, corpus-size-free),
# with every count an exact BIGINT and gamma one signed micros
# rational. Scale: one grouped count over orders + a broadcast-size
# cell self-join.


def quality_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec_signed

    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.select(
            F.expr(
                "CAST(substring(o_orderpriority, 1, 1) AS INT)"
            ).alias("pri"),
            F.expr(
                "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)"
                " AS BIGINT) div 5000000"
            ).alias("band"),
        )
        .groupBy("pri", "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    a, b = cells.alias("a"), cells.alias("b")
    dec = "decimal(38,0)"
    pairs = a.crossJoin(b).agg(
        F.sum(
            F.when(
                (F.col("b.pri") > F.col("a.pri"))
                & (F.col("b.band") > F.col("a.band")),
                F.col("a.n").cast(dec) * F.col("b.n"),
            ).otherwise(F.lit(0).cast(dec))
        ).alias("c2"),
        F.sum(
            F.when(
                (F.col("b.pri") > F.col("a.pri"))
                & (F.col("b.band") < F.col("a.band")),
                F.col("a.n").cast(dec) * F.col("b.n"),
            ).otherwise(F.lit(0).cast(dec))
        ).alias("d2"),
    )
    # c2/d2 each count ordered (a,b) pairs once: concordant pairs have
    # exactly one (lower-pri, higher-pri) orientation, so no /2.
    return pairs.select(
        F.col("c2").cast("long").alias("concordant"),
        F.col("d2").cast("long").alias("discordant"),
        F.when(F.col("c2") + F.col("d2") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec_signed("c2 - d2", "c2 + d2")
        )
        .alias("gamma_micros"),
    )


QUERIES["quality_gk_gamma"] = quality_gk_gamma

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec_signed as _sql_ruds_gk,
)

ORACLES["quality_gk_gamma"] = f"""
    WITH cells AS (
        SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS pri,
               CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) // 5000000 AS band,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ), pairs AS (
        SELECT CAST(sum(CASE WHEN b.pri > a.pri AND b.band > a.band
                             THEN CAST(a.n AS HUGEINT) * b.n
                             ELSE 0 END) AS HUGEINT) AS c2,
               CAST(sum(CASE WHEN b.pri > a.pri AND b.band < a.band
                             THEN CAST(a.n AS HUGEINT) * b.n
                             ELSE 0 END) AS HUGEINT) AS d2
        FROM cells a CROSS JOIN cells b
    )
    SELECT CAST(c2 AS BIGINT) AS concordant,
           CAST(d2 AS BIGINT) AS discordant,
           CASE WHEN c2 + d2 = 0 THEN NULL
                ELSE {_sql_ruds_gk('c2 - d2', 'c2 + d2')}
           END AS gamma_micros
    FROM pairs
"""


# --------------------------------------------------- Bartlett's test
# Round 13: the parametric variance-homogeneity twin of
# quality_levene — Bartlett (1937) is the MORE powerful test when
# normality roughly holds, and the standard pre-flight before pooled-
# variance ANOVA (quality_anova_sources): χ² = [(N-k)·ln(Sp²) −
# Σ(nᵢ−1)·ln(Sᵢ²)] / C with the Bartlett correction
# C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)), over n_chars by source.
# Exactness rail: all moments are exact integers; each per-group
# ln(Sᵢ²) snaps ONCE to nanos and enters the sum weighted by the
# exact (nᵢ−1) — integer products, order-free BIGINT sum (the
# text_entropy c·ln c discipline); the harmonic Σ 1/(nᵢ−1) snaps
# per-group to an exact nano rational. The closing statistic is one
# double expression over those integers, pround(6), with the 5%
# decision made on the snapped χ² against the chi-square(k−1)
# critical literal in micros. Degenerate slices (any nᵢ < 2 or a
# zero variance, where ln is undefined) emit NULL via the same
# integer predicate on both engines.
# Scale: one grouped-moments pass + one k-row reduce.

# chi-square 95th percentile, micros, by df (k ≤ 7 sources)
_BART_CHI2_5PCT_MICROS = {
    1: 3_841_459,
    2: 5_991_465,
    3: 7_814_728,
    4: 9_487_729,
    5: 11_070_498,
    6: 12_591_587,
}


def quality_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import (
        iunits,
        pround,
        ratio_units,
        ratio_units_dec,
    )

    docs = load_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("long")).alias("s"),
        F.sum(
            (F.col("n_chars").cast(dec) * F.col("n_chars")).cast(dec)
        ).alias("q"),
    )
    # per-group sample variance as ONE double expression (identical in
    # the oracle); ln-snap to nanos, weighted by the exact (n-1)
    v_dbl = (
        "(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))"
    )
    per = g.select(
        "n",
        "s",
        "q",
        ((F.col("n").cast(dec) * F.col("q") - F.col("s").cast(dec) * F.col("s")))
        .alias("vnum"),
        F.expr(f"ln({v_dbl})").alias("_lnv"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum((F.col("n") - 1) * iunits(F.col("_lnv"), 9)).alias("wlnv"),
        F.sum(ratio_units("1", "n - 1", 1_000_000_000)).alias("hsum"),
        F.max((F.col("n") < 2).cast("int")).alias("_small"),
        F.max((F.col("vnum") <= 0).cast("int")).alias("_zerovar"),
        # pooled within-group sum of squared deviations, exact:
        # SSW·N' where each group's contribution is vnum/n ... keep the
        # exact DECIMAL pair (sum of vnum/n as one rational per group
        # is not integral; pool on the raw moments instead)
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(
            ratio_units_dec("vnum", "CAST(n AS DECIMAL(38,0))", 1_000)
        ).alias("ssw_milli"),
    )
    # Sp² = SSW/(N-k) where SSW = Σᵢ vnumᵢ/nᵢ (exact milli-snap per
    # group, order-free BIGINT sum)
    sp2 = (
        "(CAST(ssw_milli AS DOUBLE) / 1000.0)"
        " / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))"
    )
    chi = (
        f"((CAST(nn AS DOUBLE) - k) * ln({sp2})"
        " - CAST(wlnv AS DOUBLE) / 1e9)"
        " / (1.0 + ((CAST(hsum AS DOUBLE) / 1e9)"
        " - 1.0 / (CAST(nn AS DOUBLE) - k)) / (3.0 * (k - 1)))"
    )
    crit = F.expr(
        "CASE "
        + " ".join(
            f"WHEN k - 1 = {df} THEN {c}"
            for df, c in _BART_CHI2_5PCT_MICROS.items()
        )
        + " ELSE NULL END"
    )
    degenerate = (
        (F.col("k") < 2)
        | (F.col("_small") == 1)
        | (F.col("_zerovar") == 1)
        | (F.col("nn") <= F.col("k"))
    )
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_docs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(pround(F.expr(chi), 6))
        .alias("bartlett_chi2"),
        F.when(degenerate | crit.isNull(), F.lit(None).cast("int"))
        .otherwise((iunits(F.expr(chi), 6) > crit).cast("int"))
        .alias("heteroscedastic_5pct"),
    )


QUERIES["quality_bartlett"] = quality_bartlett

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_bart,
    sql_pround as _sql_pr_bart,
    sql_ratio_units as _sql_ru_bart,
)

_BART_V = (
    "(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))"
)
_BART_SP2 = (
    "(CAST(ssw_milli AS DOUBLE) / 1000.0)"
    " / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))"
)
_BART_CHI = (
    f"((CAST(nn AS DOUBLE) - k) * ln({_BART_SP2})"
    " - CAST(wlnv AS DOUBLE) / 1e9)"
    " / (1.0 + ((CAST(hsum AS DOUBLE) / 1e9)"
    " - 1.0 / (CAST(nn AS DOUBLE) - k)) / (3.0 * (k - 1)))"
)
_BART_CRIT = (
    "CASE "
    + " ".join(
        f"WHEN k - 1 = {df} THEN {c}"
        for df, c in _BART_CHI2_5PCT_MICROS.items()
    )
    + " ELSE NULL END"
)
_BART_BAD = "(k < 2 OR _small = 1 OR _zerovar = 1 OR nn <= k)"

ORACLES["quality_bartlett"] = f"""
    WITH g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s,
               CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS q
        FROM documents GROUP BY 1
    ), per AS (
        SELECT n, s, q,
               CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS vnum,
               ln({_BART_V}) AS _lnv
        FROM g
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum((n - 1) * {_sql_iu_bart('_lnv', 9)}) AS BIGINT)
                   AS wlnv,
               CAST(sum({_sql_ru_bart('1', 'n - 1', 1_000_000_000)})
                    AS BIGINT) AS hsum,
               max(CASE WHEN n < 2 THEN 1 ELSE 0 END) AS _small,
               max(CASE WHEN vnum <= 0 THEN 1 ELSE 0 END) AS _zerovar,
               CAST(sum(CASE WHEN vnum = 0 THEN 0 ELSE
                    (2 * 1000 * vnum + CAST(n AS HUGEINT))
                    // (2 * CAST(n AS HUGEINT)) END) AS BIGINT)
                   AS ssw_milli
        FROM per
    )
    SELECT k AS k_groups,
           nn AS n_docs,
           CASE WHEN {_BART_BAD} THEN NULL
                ELSE {_sql_pr_bart(_BART_CHI, 6)} END AS bartlett_chi2,
           CASE WHEN {_BART_BAD} OR ({_BART_CRIT}) IS NULL THEN NULL
                ELSE CAST({_sql_iu_bart(_BART_CHI, 6)} > ({_BART_CRIT})
                          AS INTEGER)
           END AS heteroscedastic_5pct
    FROM agg
"""


# ---------------------------------------------------- Fleiss' kappa
# Round 13: MULTI-rater chance-corrected agreement — cohens_kappa and
# gwet_ac1 read TWO raters; Fleiss (1971) is the statistic for a
# rating panel, which in a data pipeline is an ensemble of quality
# heuristics voting per document. Raters here are three deterministic
# integer rules (n_chars length floor; whitespace-token floor via
# space count; sentence floor via '.' count — each a pure string/int
# expression identical in both engines). With N subjects, n = 3
# raters, 2 categories and g_i = good votes on doc i:
#   Σ_j n_ij² = g_i² + (3−g_i)²,  P̄ = (A − 3N)/(6N),
#   p_good = G/(3N),  P̄_e = (G² + (3N−G)²)/(9N²),
#   κ = (P̄ − P̄_e)/(1 − P̄_e)
# — every quantity an exact integer; clearing the common 18N² gives κ
# as ONE signed micros rational:
#   κ = [3N(A − 3N) − 2E] / (2·(9N² − E)),  E = G² + (3N−G)²
# computed directly from the exact A, G, N sums below (the Python
# replay test independently re-derives κ from P̄/P̄e to pin the
# algebra — a factor slip here passes the differential gate because
# both engines share the expression). Scale: one document scan, three
# comparisons per row, one reduce.

_FK_R1 = "CAST(n_chars >= 500 AS INT)"
_FK_R2 = "CAST(length(text) - length(replace(text, ' ', '')) >= 80 AS INT)"
_FK_R3 = "CAST(length(text) - length(replace(text, '.', '')) >= 3 AS INT)"


def quality_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec_signed

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        (F.expr(_FK_R1) + F.expr(_FK_R2) + F.expr(_FK_R3)).alias("g")
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("g").alias("gg"),
        F.sum(
            F.col("g").cast("long") * F.col("g")
            + (3 - F.col("g").cast("long")) * (3 - F.col("g"))
        ).alias("a"),
    )
    dec = "decimal(38,0)"
    # with E = G² + (3N−G)²:  P̄ = (A−3N)/(6N), P̄e = E/(9N²)
    # κ = (P̄−P̄e)/(1−P̄e) = (3N(A−3N)·9N² − 6N·E·3N) / (6N·(9N²−E)·3N)
    #   = (3N·(A−3N)·... ) — cleared: num = 3N(A−3N) − 2E·? … computed
    # as the direct cross-multiplied rational below (exact DECIMAL):
    # κ = (P̄−P̄e)/(1−P̄e) = [3N(A−3N) − 2E] / (2·(9N² − E)) after
    # clearing the common 18N² (derivation in the header comment)
    e = f"(CAST(gg AS {dec}) * gg + CAST(3 * nn - gg AS {dec}) * (3 * nn - gg))"
    num = f"(CAST(3 AS {dec}) * nn * (a - 3 * nn) - 2 * {e})"
    den = f"(2 * (CAST(9 AS {dec}) * nn * nn - {e}))"
    return agg.select(
        F.col("nn").cast("long").alias("n_docs"),
        F.col("gg").cast("long").alias("n_good_votes"),
        F.col("a").cast("long").alias("a_sum"),
        F.when(F.expr(den) <= 0, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec_signed(num, den))
        .alias("fleiss_kappa_micros"),
    )


QUERIES["quality_fleiss_kappa"] = quality_fleiss_kappa

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec_signed as _sql_ruds_fk,
)

_FK_E = "(CAST(gg AS HUGEINT) * gg + CAST(3 * nn - gg AS HUGEINT) * (3 * nn - gg))"
_FK_NUM = f"(CAST(3 AS HUGEINT) * nn * (a - 3 * nn) - 2 * {_FK_E})"
_FK_DEN = f"(2 * (CAST(9 AS HUGEINT) * nn * nn - {_FK_E}))"

ORACLES["quality_fleiss_kappa"] = f"""
    WITH per AS (
        SELECT ({_FK_R1.replace('AS INT', 'AS INTEGER')})
             + ({_FK_R2.replace('AS INT', 'AS INTEGER')})
             + ({_FK_R3.replace('AS INT', 'AS INTEGER')}) AS g
        FROM documents
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(g) AS BIGINT) AS gg,
               CAST(sum(CAST(g AS BIGINT) * g + (3 - g) * (3 - CAST(g AS BIGINT)))
                    AS BIGINT) AS a
        FROM per
    )
    SELECT nn AS n_docs,
           gg AS n_good_votes,
           a AS a_sum,
           CASE WHEN {_FK_DEN} <= 0 THEN NULL
                ELSE {_sql_ruds_fk(_FK_NUM, _FK_DEN)}
           END AS fleiss_kappa_micros
    FROM agg
"""


# --------------------------------------------------- Cohen's d / Hedges g
# Round 13: the EFFECT SIZE the significance family was missing —
# mde_power plans one prospectively and tost tests equivalence, but
# nothing reported "how big is the difference actually" for the
# returned-vs-normal price gap: Cohen's d = (x̄₁−x̄₂)/s_pooled with
# Hedges' small-sample correction g = J·d,
# J = 1 − 3/(4·df − 1), df = n₁+n₂−2. All moments ride the exact
# cents rail; d is one double expression over exact integers + a
# single sqrt, pround(6); J is an exact micros rational so g = J·d
# is reproducible from the emitted columns. Magnitude class
# (negligible/small/medium/large at the 0.2/0.5/0.8 thresholds) is
# decided on the micros-snapped |d| — integer comparisons, no
# boundary doubles. Scale: one grouped-moments pass + one reduce.


def quality_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround, ratio_units_dec

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    dec = "decimal(38,0)"
    per = li.select(
        F.when(F.col("l_returnflag") == "R", 0).otherwise(1).alias("g"),
        F.expr(
            "CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)"
            " AS BIGINT)"
        ).alias("cents"),
    )
    g = per.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum((F.col("cents").cast(dec) * F.col("cents")).cast(dec)).alias(
            "q"
        ),
    )
    m = g.groupBy().pivot("g", [0, 1]).agg(
        F.first("n").alias("n"), F.first("s").alias("s"), F.first("q").alias("q")
    )
    n0, n1 = F.col("`0_n`"), F.col("`1_n`")
    d_expr = (
        "(CAST(`0_s` AS DOUBLE) / CAST(`0_n` AS DOUBLE)"
        " - CAST(`1_s` AS DOUBLE) / CAST(`1_n` AS DOUBLE))"
        " / sqrt(((CAST(`0_q` AS DOUBLE)"
        " - CAST(`0_s` AS DOUBLE) * CAST(`0_s` AS DOUBLE)"
        " / CAST(`0_n` AS DOUBLE))"
        " + (CAST(`1_q` AS DOUBLE)"
        " - CAST(`1_s` AS DOUBLE) * CAST(`1_s` AS DOUBLE)"
        " / CAST(`1_n` AS DOUBLE)))"
        " / (CAST(`0_n` AS DOUBLE) + CAST(`1_n` AS DOUBLE) - 2))"
    )
    degenerate = (
        n0.isNull() | n1.isNull() | (n0 + n1 < 3)
    )
    j = ratio_units_dec(
        "4 * (CAST(`0_n` AS decimal(38,0)) + `1_n` - 2) - 4",
        "4 * (CAST(`0_n` AS decimal(38,0)) + `1_n` - 2) - 1",
    )
    d_abs6 = F.abs(iunits(F.expr(d_expr), 6))
    return m.select(
        n0.cast("long").alias("n_returned"),
        n1.cast("long").alias("n_normal"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(pround(F.expr(d_expr), 6))
        .alias("cohens_d"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(j)
        .alias("hedges_j_micros"),
        F.when(degenerate, F.lit(None).cast("string"))
        .otherwise(
            F.when(d_abs6 < 200_000, F.lit("negligible"))
            .when(d_abs6 < 500_000, F.lit("small"))
            .when(d_abs6 < 800_000, F.lit("medium"))
            .otherwise(F.lit("large"))
        )
        .alias("magnitude"),
    )


QUERIES["quality_cohens_d"] = quality_cohens_d

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_cd,
    sql_pround as _sql_pr_cd,
    sql_ratio_units_dec as _sql_rud_cd,
)

_CD_D = (
    "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    " / sqrt(((CAST(q0 AS DOUBLE)"
    " - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " + (CAST(q1 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))"
    " / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2))"
)
_CD_BAD = "(n0 IS NULL OR n1 IS NULL OR n0 + n1 < 3)"

ORACLES["quality_cohens_d"] = f"""
    WITH per AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS g,
               CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS cents
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), gm AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
        FROM per GROUP BY 1
    ), m AS (
        SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
               max(CASE WHEN g = 0 THEN s END) AS s0,
               max(CASE WHEN g = 0 THEN q END) AS q0,
               max(CASE WHEN g = 1 THEN n END) AS n1,
               max(CASE WHEN g = 1 THEN s END) AS s1,
               max(CASE WHEN g = 1 THEN q END) AS q1
        FROM gm
    )
    SELECT CAST(n0 AS BIGINT) AS n_returned,
           CAST(n1 AS BIGINT) AS n_normal,
           CASE WHEN {_CD_BAD} THEN NULL
                ELSE {_sql_pr_cd(_CD_D, 6)} END AS cohens_d,
           CASE WHEN {_CD_BAD} THEN NULL
                ELSE {_sql_rud_cd(
                    '4 * (CAST(n0 AS HUGEINT) + n1 - 2) - 4',
                    '4 * (CAST(n0 AS HUGEINT) + n1 - 2) - 1')}
           END AS hedges_j_micros,
           CASE WHEN {_CD_BAD} THEN NULL
                WHEN abs({_sql_iu_cd(_CD_D, 6)}) < 200000 THEN 'negligible'
                WHEN abs({_sql_iu_cd(_CD_D, 6)}) < 500000 THEN 'small'
                WHEN abs({_sql_iu_cd(_CD_D, 6)}) < 800000 THEN 'medium'
                ELSE 'large'
           END AS magnitude
    FROM m
"""


# ------------------------------------------- Jonckheere-Terpstra test
# Round 13: the ORDERED-alternative k-group test closing the rank
# family — kruskal_wallis asks "are the k groups different at all";
# Jonckheere-Terpstra (1954) asks the sharper question a priority
# system implies: do order values rise MONOTONICALLY with priority
# class? J = Σ_{g<g'} U(g,g') over the 5 ordered priority groups with
# order value bucketed to $1000 steps (buckets make ties real, and
# the tie-corrected variance below is exact about them). Integer
# rails throughout: J2 = 2J = Σ (2·#{x<y} + #{x=y}) from the
# contingency CELL self-join (cells = (group, bucket, n) — pair work
# is |cells|², corpus-size-free); E4 = 4·E[J] = N² − Σ n_g²; and the
# Hollander-Wolfe tie-corrected variance
#   Var = A/72 + B/(36·N(N−1)(N−2)) + C/(8·N(N−1))
#   A = N(N−1)(2N+5) − Σ_g n(n−1)(2n+5) − Σ_u t(t−1)(2t+5)
#   B = [Σ_g n(n−1)(n−2)]·[Σ_u t(t−1)(t−2)],  C = [Σ_g n(n−1)]·[Σ_u t(t−1)]
# with z² = (J − E[J])²/Var. Every moment (J2, E4, A, B, C, N) is an
# exact integer; the CLOSING ratio is one identical double expression
# on both engines + a micros snap (the Bartlett discipline) — the
# fully-cleared DECIMAL rational was tried first and overflows 10³⁸
# near N ≈ 10⁵ (the sf0.1 bench run caught it: Spark ANSI raises
# where DuckDB HUGEINT would keep going — the divergent-failure
# class), so the snapped-double close is the scale-free form. The
# Fraction re-derivation test bounds the double-vs-exact gap at one
# micro. Scale: one grouped count to cells + a bounded cell
# self-join.


def quality_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    cells = (
        o.select(
            F.expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").alias(
                "g"
            ),
            F.expr(
                "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)"
                " AS BIGINT) div 100000"
            ).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    a, c2 = cells.alias("a"), cells.alias("c2")
    j2 = a.join(c2, F.col("a.g") < F.col("c2.g")).agg(
        F.sum(
            F.when(
                F.col("a.b") < F.col("c2.b"),
                2 * F.col("a.n").cast(dec) * F.col("c2.n"),
            )
            .when(
                F.col("a.b") == F.col("c2.b"),
                F.col("a.n").cast(dec) * F.col("c2.n"),
            )
            .otherwise(F.lit(0).cast(dec))
        ).alias("j2")
    )
    gsum = (
        cells.groupBy("g")
        .agg(F.sum("n").alias("n"))
        .agg(
            F.sum("n").alias("nn"),
            F.sum((F.col("n").cast(dec) * F.col("n")).cast(dec)).alias("sn2"),
            F.sum(
                F.expr(
                    f"CAST(n AS {dec}) * (n - 1) * (2 * n + 5)"
                )
            ).alias("ga"),
            F.sum(
                F.expr(f"CAST(n AS {dec}) * (n - 1) * (n - 2)")
            ).alias("gb"),
            F.sum(F.expr(f"CAST(n AS {dec}) * (n - 1)")).alias("gc"),
        )
    )
    usum = (
        cells.groupBy("b")
        .agg(F.sum("n").alias("t"))
        .agg(
            F.sum(
                F.expr(
                    f"CAST(t AS {dec}) * (t - 1) * (2 * t + 5)"
                )
            ).alias("ua"),
            F.sum(
                F.expr(f"CAST(t AS {dec}) * (t - 1) * (t - 2)")
            ).alias("ub"),
            F.sum(F.expr(f"CAST(t AS {dec}) * (t - 1)")).alias("uc"),
        )
    )
    m = j2.crossJoin(F.broadcast(gsum)).crossJoin(F.broadcast(usum))
    e4 = f"(CAST(nn AS {dec}) * nn - sn2)"
    # Closing ratio in ONE identical double expression over the exact
    # integer columns (the Bartlett discipline): the fully-cleared
    # DECIMAL rational overflows 10^38 near N ≈ 10^5 (the sf0.1 bench
    # caught exactly that — var72·2·10^6 hit 1.7e38), so Var is
    # evaluated as the textbook three-term sum in doubles; every input
    # (j2, e4, A, B, C, N) is still an exact integer, so both engines
    # see bit-identical doubles.
    var_d = (
        "((CAST(nn AS DOUBLE) * (nn - 1) * (2 * nn + 5)"
        " - CAST(ga AS DOUBLE) - CAST(ua AS DOUBLE)) / 72.0"
        " + (CAST(gb AS DOUBLE) * CAST(ub AS DOUBLE))"
        " / (36.0 * CAST(nn AS DOUBLE) * (nn - 1) * (nn - 2))"
        " + (CAST(gc AS DOUBLE) * CAST(uc AS DOUBLE))"
        " / (8.0 * CAST(nn AS DOUBLE) * (nn - 1)))"
    )
    dev_d = f"((2 * CAST(j2 AS DOUBLE) - CAST({e4} AS DOUBLE)) / 4.0)"
    z2_d = f"({dev_d} * {dev_d} / {var_d})"
    degenerate = (F.col("nn") < 3) | (F.expr(f"{var_d} <= 0"))
    from ..functions.rounding import iunits

    return m.select(
        F.col("nn").cast("long").alias("n_orders"),
        F.col("j2").cast("long").alias("j_x2"),
        F.expr(e4).cast("long").alias("expected_j_x4"),
        F.when(F.col("j2") * 2 > F.expr(e4), F.lit(1))
        .when(F.col("j2") * 2 < F.expr(e4), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("trend_sign"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(iunits(F.expr(z2_d), 6))
        .alias("z2_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise((iunits(F.expr(z2_d), 6) > 3_841_459).cast("int"))
        .alias("significant_5pct"),
    )


QUERIES["quality_jonckheere"] = quality_jonckheere

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_jt,
)

_JT_E4 = "(CAST(nn AS HUGEINT) * nn - sn2)"
_JT_VAR_D = (
    "((CAST(nn AS DOUBLE) * (nn - 1) * (2 * nn + 5)"
    " - CAST(ga AS DOUBLE) - CAST(ua AS DOUBLE)) / 72.0"
    " + (CAST(gb AS DOUBLE) * CAST(ub AS DOUBLE))"
    " / (36.0 * CAST(nn AS DOUBLE) * (nn - 1) * (nn - 2))"
    " + (CAST(gc AS DOUBLE) * CAST(uc AS DOUBLE))"
    " / (8.0 * CAST(nn AS DOUBLE) * (nn - 1)))"
)
_JT_DEV_D = f"((2 * CAST(j2 AS DOUBLE) - CAST({_JT_E4} AS DOUBLE)) / 4.0)"
_JT_Z2_D = f"({_JT_DEV_D} * {_JT_DEV_D} / {_JT_VAR_D})"

ORACLES["quality_jonckheere"] = f"""
    WITH cells AS (
        SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS g,
               CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) // 100000 AS b,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ), j AS (
        SELECT CAST(sum(CASE WHEN a.b < c2.b
                             THEN 2 * CAST(a.n AS HUGEINT) * c2.n
                             WHEN a.b = c2.b
                             THEN CAST(a.n AS HUGEINT) * c2.n
                             ELSE 0 END) AS HUGEINT) AS j2
        FROM cells a JOIN cells c2 ON a.g < c2.g
    ), gsum AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sn2,
               CAST(sum(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5))
                    AS HUGEINT) AS ga,
               CAST(sum(CAST(n AS HUGEINT) * (n - 1) * (n - 2))
                    AS HUGEINT) AS gb,
               CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS gc
        FROM (SELECT g, CAST(sum(n) AS BIGINT) AS n FROM cells GROUP BY 1)
    ), usum AS (
        SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                    AS HUGEINT) AS ua,
               CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2))
                    AS HUGEINT) AS ub,
               CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS uc
        FROM (SELECT b, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1)
    )
    SELECT nn AS n_orders,
           CAST(j2 AS BIGINT) AS j_x2,
           CAST({_JT_E4} AS BIGINT) AS expected_j_x4,
           CASE WHEN j2 * 2 > {_JT_E4} THEN 1
                WHEN j2 * 2 < {_JT_E4} THEN -1 ELSE 0 END AS trend_sign,
           CASE WHEN nn < 3 OR {_JT_VAR_D} <= 0 THEN NULL
                ELSE {_sql_iu_jt(_JT_Z2_D, 6)}
           END AS z2_micros,
           CASE WHEN nn < 3 OR {_JT_VAR_D} <= 0 THEN NULL
                ELSE CAST({_sql_iu_jt(_JT_Z2_D, 6)} > 3841459 AS INTEGER)
           END AS significant_5pct
    FROM j CROSS JOIN gsum CROSS JOIN usum
"""
