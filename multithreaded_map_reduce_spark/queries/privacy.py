"""Privacy / anonymization pass — what a training-data pipeline runs
before publishing a dataset containing user-linked records:

- deterministic pseudonymization (keyed token replaces the direct
  identifier — same input → same token, so joins and dedup still work
  on the masked table; md5 is the portable token function both engines
  share);
- k-anonymity suppression report over the quasi-identifier grouping
  (nation × market segment): groups below k must be suppressed before
  release, and the report IS the decision table.

Scale shape: pseudonymization is a stateless scan (codegen'd md5 —
zero shuffle, pushdown intact); the k-anonymity report is one
map-side-combinable aggregate over the quasi-identifier key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

K_ANON = 5
SALT = "mmr2026"  # keyed tokenization: token = md5(salt || id-field)


def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked slice (custkey < 500): the direct identifier c_name is
    replaced by a 16-hex keyed token; balance survives (analytical
    value), raw name does not. Deterministic ⇒ exactly replayable by
    the oracle — the point of keyed pseudonymization over random
    tokens is precisely that it is stable across runs and engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") < 500).select(
        "c_custkey",
        F.substring(F.md5(F.concat(F.lit(SALT), F.col("c_name"))), 1, 16).alias(
            "name_token"
        ),
        "c_nationkey",
        "c_mktsegment",
    )


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression report over the (nation, segment) quasi-identifier:
    group size and whether the group fails k=5 and must be withheld."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("group_size") < K_ANON).alias("suppress"),
        )
    )


# PII patterns — the regex subset whose semantics are IDENTICAL in
# Java regex (Spark) and RE2 (DuckDB): explicit character classes,
# bounded repetition, no backrefs/lookaround/\w-class shorthands
# (those differ on unicode word membership between the engines).
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def privacy_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction — the scrub pass a pipeline runs before
    training on scraped text. The fixture corpus carries no organic
    PII, so the query PLANTS a deterministic contact block per document
    (email + US-style phone derived from doc_id — identical expression
    in the oracle) and then redacts it; match counts and the redacted
    text are all under the differential gate, so the regexes provably
    fire the same way in both engines.

    Scale: stateless per-row scan — codegen'd regexp_replace, zero
    shuffle, pushdown/pruning untouched. Redaction-by-replacement (not
    extraction) keeps the operator single-pass over 100 TB of text."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 900 + 100).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 9000 + 1000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    staged = docs.select("doc_id", planted.alias("planted"), redacted.alias("redacted"))
    return staged.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("planted"), F.lit(f"({_EMAIL_RE})"))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("planted"), F.lit(f"({_PHONE_RE})"))
        ).alias("n_phones"),
        # explicit start index — engines disagree on negative-position
        # substring when the string is shorter than the window
        F.expr(
            "substring(redacted, greatest(length(redacted) - 59, 1), 60)"
        ).alias("redacted_tail"),
    )


QUERIES = {
    "privacy_pseudonymize": privacy_pseudonymize,
    "privacy_k_anonymity": privacy_k_anonymity,
    "privacy_redact_pii": privacy_redact_pii,
}

ORACLES = {
    "privacy_pseudonymize": f"""
        SELECT c_custkey,
               substring(md5('{SALT}' || c_name), 1, 16) AS name_token,
               c_nationkey, c_mktsegment
        FROM customer WHERE c_custkey < 500
    """,
    "privacy_k_anonymity": f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS group_size,
               count(*) < {K_ANON} AS suppress
        FROM customer GROUP BY 1, 2
    """,
    "privacy_redact_pii": f"""
        WITH staged AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 555-'
                        || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
                        || '-'
                        || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')
                       AS planted
            FROM documents
        ), red AS (
            SELECT doc_id, planted,
                   regexp_replace(
                       regexp_replace(planted, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
            FROM staged
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(planted, '({_EMAIL_RE})'))
                    AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(planted, '({_PHONE_RE})'))
                    AS INTEGER) AS n_phones,
               substring(redacted, greatest(length(redacted) - 59, 1), 60)
                   AS redacted_tail
        FROM red
    """,
}


def privacy_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten: erase a deterministic cohort of users
    (user_id ≡ 0 mod 13) from the events table and report, per
    event_type, the surviving row count, surviving distinct users, and
    an order-independent checksum of surviving event ids — the audit
    artifact an erasure job must emit. Erasure is one broadcast
    anti-join; the checksum proves no non-cohort row was touched.

    100 TB: the erasure set is usually table-sized-small → broadcast
    anti-join per fact table; partition-level rewrite applies only to
    files containing hits (zorder/partition stats prune the rest)."""
    ev = load_table(spark, sf_dir, "events")
    erase = ev.select("user_id").distinct().filter(F.col("user_id") % 13 == 0)
    kept = ev.join(F.broadcast(erase), "user_id", "anti")
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("event_id") % 1_000_003).alias("id_checksum"),
    )


QUERIES["privacy_erasure"] = privacy_erasure

ORACLES["privacy_erasure"] = """
    SELECT event_type,
           count(*) AS n_rows,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(event_id % 1000003) AS BIGINT) AS id_checksum
    FROM events WHERE user_id % 13 != 0
    GROUP BY 1
"""


# ------------------------------------------- DP-shaped noisy aggregates
# The differential-privacy release SHAPE — per-group counts + Laplace
# noise at sensitivity 1 — with the noise drawn DETERMINISTICALLY from
# the portable group-key hash (u ∈ (0,1) → inverse Laplace CDF), so the
# whole mechanism is replayable by the oracle and testable, unlike a
# production DP system's true randomness (swap the hash for a CSPRNG
# draw there; every other line is identical). Both engines evaluate the
# same double expression; outputs snap to 1e-6. One scan, one grouped
# count, zero extra shuffles.

DP_EPSILON = 1.0  # Laplace scale b = sensitivity/epsilon = 1.0


def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD, token_hash
    from ..functions.rounding import pround

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("true_n"))
    u = (token_hash(F.col("lang")) + F.lit(1)).cast("double") / F.lit(
        float(POLY_MOD + 2)
    )
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(1.0 / DP_EPSILON)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        "lang",
        pround(F.col("true_n").cast("double") + noise, 6).alias("noisy_n"),
    )


QUERIES["privacy_dp_counts"] = privacy_dp_counts

from ..functions.hashing import POLY_MOD as _PM2  # noqa: E402
from ..functions.hashing import sql_token_hash as _sql_th  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pr2  # noqa: E402

_DP_U = f"(CAST(({_sql_th('lang')}) + 1 AS DOUBLE) / {float(_PM2 + 2)})"
_DP_NOISE = (
    f"(-{1.0 / DP_EPSILON} * sign({_DP_U} - 0.5)"
    f" * ln(1.0 - 2.0 * abs({_DP_U} - 0.5)))"
)

ORACLES["privacy_dp_counts"] = f"""
    SELECT lang,
           {_sql_pr2(f'CAST(count(*) AS DOUBLE) + {_DP_NOISE}', 6)} AS noisy_n
    FROM documents GROUP BY lang
"""


# ---------------------------------------------------------- l-diversity
# k-anonymity's complement (Machanavajjhala et al. 2006): a group can be
# large (k-anonymous) yet reveal its members' sensitive attribute if
# every member SHARES it. Per (nation, segment) quasi-identifier group:
# distinct sensitive values (account-balance bands of width 1000 —
# floor of cents/1e5 — explicit floor() on both sides because DuckDB's // truncates toward zero on negatives while Spark floor()s) and
# the l ≥ 3 disclosure flag. One groupBy; count_distinct partial-aggs
# map-side. The release decision combines both: suppress if group_size
# < k OR distinct bands < l.

L_DIVERSITY = 3


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    c = load_table(spark, sf_dir, "customer")
    band = F.floor(iunits(F.col("c_acctbal"), 2) / F.lit(100_000))
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(band).alias("n_sensitive"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_sensitive").cast("long").alias("n_sensitive"),
            (
                (F.col("group_size") < K_ANON)
                | (F.col("n_sensitive") < L_DIVERSITY)
            ).cast("int").alias("suppress"),
        )
    )


QUERIES["privacy_l_diversity"] = privacy_l_diversity

from ..functions.rounding import sql_iunits as _sql_iunits  # noqa: E402

ORACLES["privacy_l_diversity"] = f"""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           count(DISTINCT floor(({_sql_iunits('c_acctbal', 2)})::DOUBLE / 100000)) AS n_sensitive,
           CAST(count(*) < {K_ANON}
                OR count(DISTINCT floor(({_sql_iunits('c_acctbal', 2)})::DOUBLE / 100000))
                   < {L_DIVERSITY} AS INTEGER) AS suppress
    FROM customer GROUP BY 1, 2
"""


# ------------------------------------------------------- t-closeness
# The third rung of the anonymity ladder (Li, Li & Venkatasubramanian
# 2007) after k-anonymity (group size) and l-diversity (sensitive
# variety): a group fails t-closeness when its sensitive-attribute
# DISTRIBUTION sits too far from the global one — the attack l-diversity
# misses is a group whose values are varied but all extreme. For an
# ordered sensitive attribute (the l_diversity balance bands) the
# distance is the Earth Mover's Distance with unit ground spacing,
# which has the exact closed form EMD = Σ_i |cumP_i − cumQ_i| / (m−1).
# Everything is integer: with group cumulative CG_i (count G) and
# global CT_i (count T), each term is |T·CG_i − G·CT_i| / (G·T), so
# EMD_micros = round(1e6 · Σ|T·CG_i − G·CT_i| / (G·T·(m−1))) — the
# products run on the DECIMAL(38,0)/HUGEINT rail (T·CG wraps int64
# past ~3e9 rows) and a single-band domain (m = 1) is distance 0 by
# convention. Suppress when EMD > T_CLOSE_MICROS or the k rung fails.
#
# Scale: one global band histogram (|bands| rows, checkpointed), one
# (group, band) aggregate, a |groups|×|bands| spine with a per-group
# cumulative window — everything after the two scans is
# group-cardinality work, the k_anonymity profile.

T_CLOSE_MICROS = 200_000  # t = 0.2


def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits, ratio_units_dec

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(iunits(F.col("c_acctbal"), 2) / F.lit(100_000)).alias("band"),
    )
    glob = (
        c.groupBy("band")
        .agg(F.count(F.lit(1)).alias("t_i"))
        .localCheckpoint()
    )
    gsum = glob.agg(
        F.sum("t_i").alias("T"), F.count(F.lit(1)).alias("m")
    )
    grp = c.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("g_i")
    )
    groups = grp.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("g_i").alias("G")
    )
    spine = groups.crossJoin(F.broadcast(glob)).join(
        grp, ["c_nationkey", "c_mktsegment", "band"], "left"
    )
    w = (
        W.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = spine.select(
        "c_nationkey",
        "c_mktsegment",
        "G",
        F.sum(F.coalesce("g_i", F.lit(0))).over(w).alias("CG"),
        F.sum("t_i").over(w).alias("CT"),
    ).crossJoin(F.broadcast(gsum))
    per = cum.select(
        "c_nationkey",
        "c_mktsegment",
        "G",
        "T",
        "m",
        F.expr(
            "abs(CAST(T AS DECIMAL(38,0)) * CG"
            " - CAST(G AS DECIMAL(38,0)) * CT)"
        ).alias("term"),
    )
    agg = per.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("G").alias("group_size"),
        F.max("T").alias("T"),
        F.max("m").alias("m"),
        F.sum("term").alias("S"),
    )
    emd = F.when(F.col("m") <= 1, F.lit(0)).otherwise(
        ratio_units_dec(
            "S",
            "CAST(group_size AS DECIMAL(38,0)) * T * (m - 1)",
        )
    )
    return agg.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("group_size").cast("long").alias("group_size"),
        emd.cast("long").alias("emd_micros"),
        (
            (F.col("group_size") < K_ANON)
            | (emd > F.lit(T_CLOSE_MICROS))
        )
        .cast("int")
        .alias("suppress"),
    )


QUERIES["privacy_t_closeness"] = privacy_t_closeness


def _t_closeness_oracle() -> str:
    from ..functions.rounding import sql_iunits, sql_ratio_units_dec

    emd = sql_ratio_units_dec(
        "S", "CAST(group_size AS HUGEINT) * T * (m - 1)"
    )
    return f"""
    WITH c AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor({sql_iunits('c_acctbal', 2)} / 100000.0) AS BIGINT)
                   AS band
        FROM customer
    ), gband AS (
        SELECT band, CAST(count(*) AS BIGINT) AS t_i FROM c GROUP BY 1
    ), gsum AS (
        SELECT CAST(sum(t_i) AS BIGINT) AS T,
               CAST(count(*) AS BIGINT) AS m
        FROM gband
    ), grp AS (
        SELECT c_nationkey, c_mktsegment, band,
               CAST(count(*) AS BIGINT) AS g_i
        FROM c GROUP BY 1, 2, 3
    ), grps AS (
        SELECT c_nationkey, c_mktsegment, CAST(sum(g_i) AS BIGINT) AS G
        FROM grp GROUP BY 1, 2
    ), cum AS (
        SELECT s.c_nationkey, s.c_mktsegment, s.G,
               sum(coalesce(g.g_i, 0)) OVER w AS CG,
               sum(s.t_i) OVER w AS CT
        FROM (SELECT grps.*, gband.* FROM grps, gband) s
        LEFT JOIN grp g
          ON s.c_nationkey = g.c_nationkey
         AND s.c_mktsegment = g.c_mktsegment
         AND s.band = g.band
        WINDOW w AS (
            PARTITION BY s.c_nationkey, s.c_mktsegment
            ORDER BY s.band ROWS UNBOUNDED PRECEDING
        )
    ), agg AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(max(G) AS BIGINT) AS group_size,
               CAST(sum(abs(CAST(T AS HUGEINT) * CG
                            - CAST(G AS HUGEINT) * CT)) AS HUGEINT) AS S,
               CAST(max(T) AS BIGINT) AS T, CAST(max(m) AS BIGINT) AS m
        FROM cum, gsum
        GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, group_size,
           CAST(CASE WHEN m <= 1 THEN 0 ELSE {emd} END AS BIGINT)
               AS emd_micros,
           CAST(CASE WHEN group_size < {K_ANON}
                      OR (CASE WHEN m <= 1 THEN 0 ELSE {emd} END)
                         > {T_CLOSE_MICROS}
                THEN 1 ELSE 0 END AS INTEGER) AS suppress
    FROM agg
"""


ORACLES["privacy_t_closeness"] = _t_closeness_oracle()


# ---------------------------------------- anonymity-class histogram
# Round 12: the DISTRIBUTION view under privacy_k_anonymity's pass/
# fail report — a release decision needs "how much of the population
# sits in classes of size 1, 2, ..." (sample uniques are the
# re-identification budget; El Emam's risk models key on exactly
# this histogram), not just which classes fail k=5. Over the same
# (nation, segment) quasi-identifier: one row per equivalence-class
# SIZE with class and row tallies, the suppressed-row mass under
# k = K_ANON, and each size's share of the population as an exact
# micros rational. Scale: one groupBy to class-grain, one to
# size-grain — the histogram axis is bounded by max class size.


def privacy_anonymity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units

    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("size")
    )
    tot = c.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        classes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("size").cast("long").alias("class_size"),
            F.col("n_classes").cast("long").alias("n_classes"),
            (F.col("size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows_in_size"),
            (F.col("size") < K_ANON).cast("int").alias("suppressed_under_k"),
            ratio_units("size * n_classes", "n_rows").alias(
                "population_share_micros"
            ),
        )
        .orderBy("class_size")
    )


QUERIES["privacy_anonymity_histogram"] = privacy_anonymity_histogram

from ..functions.rounding import sql_ratio_units as _sql_ru_ah  # noqa: E402

ORACLES["privacy_anonymity_histogram"] = f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS size
        FROM customer GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows FROM customer
    )
    SELECT size AS class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(size * count(*) AS BIGINT) AS n_rows_in_size,
           CAST(size < {K_ANON} AS INTEGER) AS suppressed_under_k,
           {_sql_ru_ah('size * count(*)', 'max(n_rows)')}
               AS population_share_micros
    FROM classes CROSS JOIN tot
    GROUP BY size
    ORDER BY size
"""


# ------------------------------------------- generalization tradeoff
# Round 13: the MISSING half of the k-anonymity story — k_anonymity
# and anonymity_histogram REPORT class sizes for one fixed
# quasi-identifier; a real release pipeline must CHOOSE how much to
# generalize (Sweeney 2002; the Datafly/Incognito lattice walk). This
# query evaluates the generalization LADDER for the numeric
# quasi-identifier c_acctbal: at each band width w the QI becomes
# (nation, segment, floor(acctbal_cents / (100·w))), and the report
# gives per-rung class counts, the minimum class size, how many rows a
# k=5 suppression policy would withhold, and the suppression rate in
# micros — the utility-vs-privacy curve a release pipeline reads to
# pick the cheapest rung that clears its k. Determinism: acctbal
# enters as exact integer CENTS (the money rail), so band membership
# is integer division — no float bucketing; floor division of the
# possibly-negative cents is written floor-style on BOTH engines
# (Spark `div` truncates toward zero, so the Spark side uses an
# explicit floor adjustment to match DuckDB's flooring `//`).
# Scale: |rungs| grouped counts over the customer dim — one scan per
# rung of a ladder of fixed depth, each a partial-agg groupBy.

GEN_BANDS_W = [1, 100, 1000, 5000]  # band width in whole dollars


def privacy_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        # exact cents (the money rail); acctbal can be negative
        F.expr(
            "CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)"
        ).alias("cents"),
    )
    out = None
    for w in GEN_BANDS_W:
        d = 100 * w
        band = F.expr(
            f"CAST(CASE WHEN cents >= 0 THEN cents div {d}"
            f" ELSE - ((- cents + {d} - 1) div {d}) END AS BIGINT)"
        )
        classes = (
            c.select("c_nationkey", "c_mktsegment", band.alias("band"))
            .groupBy("c_nationkey", "c_mktsegment", "band")
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        rep = classes.agg(
            F.lit(w).cast("int").alias("band_dollars"),
            F.count(F.lit(1)).alias("n_classes"),
            F.min("sz").alias("min_class_size"),
            F.sum("sz").alias("n_rows"),
            F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(0)).alias(
                "n_suppressed"
            ),
        ).select(
            "band_dollars",
            F.col("n_classes").cast("long").alias("n_classes"),
            F.col("min_class_size").cast("long").alias("min_class_size"),
            F.col("n_suppressed").cast("long").alias("n_suppressed"),
            ratio_units("n_suppressed", "n_rows").alias(
                "suppressed_share_micros"
            ),
            (F.col("min_class_size") >= K_ANON)
            .cast("int")
            .alias("k5_clear"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["privacy_generalization"] = privacy_generalization

from ..functions.rounding import sql_ratio_units as _sql_ru_gen  # noqa: E402


def _gen_sql() -> str:
    rungs = []
    for w in GEN_BANDS_W:
        d = 100 * w
        rungs.append(
            f"""
    SELECT CAST({w} AS INTEGER) AS band_dollars,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT)
               AS n_suppressed,
           {_sql_ru_gen(
               'sum(CASE WHEN sz < ' + str(K_ANON) + ' THEN sz ELSE 0 END)',
               'sum(sz)')} AS suppressed_share_micros,
           CAST(min(sz) >= {K_ANON} AS INTEGER) AS k5_clear
    FROM (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN cents >= 0 THEN cents // {d}
                    ELSE - ((- cents + {d} - 1) // {d}) END AS band,
               CAST(count(*) AS BIGINT) AS sz
        FROM (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5)
                        AS BIGINT) AS cents
            FROM customer
        )
        GROUP BY 1, 2, 3
    )"""
        )
    return " UNION ALL ".join(rungs)


ORACLES["privacy_generalization"] = _gen_sql()
