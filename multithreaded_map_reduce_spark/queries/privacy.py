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
