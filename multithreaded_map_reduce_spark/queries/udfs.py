"""Explicit UDF/UDAF surface (SURVEY.md §2c 'UDF/UDAF/UDTF'):

- scalar Pandas UDF (Arrow-vectorized) — the sanctioned slow path when
  built-ins can't express a function;
- grouped-aggregate Pandas UDF (a real UDAF) — per-group custom
  aggregation without collect_list;
- (the UDTF analog — 1 row → n rows — is the MapReduce adapter's
  ``map_fn``, covered by ``mr_*``; ``mapInPandas`` is covered by
  ``multimodal_features``.)

Both queries stay deterministic (and thus oracle-checkable) by doing
their float math in exact integer micro-units inside the UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import iunits
from ..sources.catalog import load_table


@F.pandas_udf(T.LongType())
def _value_micros(v: pd.Series) -> pd.Series:
    """Scalar Pandas UDF: double → exact micro-units (portable floor)."""
    import numpy as np

    return pd.Series(np.floor(v.to_numpy() * 1e6 + 0.5).astype("int64"))


@F.pandas_udf(T.DoubleType())
def _udaf_mean_micros(v: pd.Series) -> float:
    """Grouped-agg Pandas UDF (UDAF): mean over exact micro-units —
    integer summation makes the result order-independent."""
    import numpy as np

    units = np.floor(v.to_numpy() * 1e6 + 0.5).astype("int64")
    return float(units.sum()) / 1e6 / len(units) if len(units) else float("nan")


def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF over events.value."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        _value_micros(F.col("value")).alias("value_micros"),
    )


def pandas_udaf_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF: per-type exact mean of event values.

    (A grouped-agg Pandas UDF cannot share an ``agg()`` with JVM
    aggregates — the plain count comes from a second aggregation
    joined back on the group key.)"""
    ev = load_table(spark, sf_dir, "events")
    means = ev.groupBy("event_type").agg(
        iunits(_udaf_mean_micros(F.col("value"))).alias("mean_value_micros")
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    return means.join(counts, "event_type")


QUERIES = {
    "pandas_udf_scalar": pandas_udf_scalar,
    "pandas_udaf_mean": pandas_udaf_mean,
}

ORACLES = {
    "pandas_udf_scalar": """
        SELECT event_id,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_micros
        FROM events
    """,
    "pandas_udaf_mean": """
        SELECT event_type,
               CAST(floor((CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                    / 1000000.0 / count(*)) * 1000000.0 + 0.5) AS BIGINT) AS mean_value_micros,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
}


def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup().applyInPandas`` — the two-sided grouped-map surface:
    each user's click rows and purchase rows arrive as two aligned
    pandas frames in ONE call (keys present on only one side get an
    empty frame for the other). Value sums are exact integer
    micro-units, so the merge is oracle-checkable; the SQL twin is a
    FULL OUTER join of two grouped aggregates.

    The float->micro-int conversion happens in a SPARK expression
    (``floor(value*1e6+0.5)`` JVM-side) BEFORE the cogroup, so the
    pandas fn only counts rows and sums int64 — no Python float
    arithmetic whose ulp behaviour could differ across numpy/Arrow
    builds (VERDICT r5 item 1: the driver-red/local-green split was
    exactly that conversion living inside the UDF)."""
    ev = load_table(spark, sf_dir, "events")
    micros = iunits(F.col("value"))  # floor(v*1e6+0.5) — audit-visible
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", micros.alias("value_micros")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", micros.alias("value_micros")
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "click_value_micros": [_int64_sum(left["value_micros"])],
                "purchase_value_micros": [_int64_sum(right["value_micros"])],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id long, n_clicks long, n_purchases long, "
            "click_value_micros long, purchase_value_micros long",
        )
    )


def _int64_sum(s: pd.Series) -> int:
    """Sum a (possibly empty / null-carrying) micros column in PURE
    int64 — never through float64. Arrow hands a cogroup side whose
    int64 column carries nulls to pandas as float64 (NaN for null), and
    ``int(float64_series.sum())`` TRUNCATES; on an empty side some
    pandas builds return float 0.0. Forcing ``fillna(0).astype(int64)``
    first removes every environment-dependent float path. Postmortem
    (VERDICT r7): the repeat cogroup_user_activity driver-red was NOT
    this path — it was the ORACLE's sum() widening to HUGEINT, fixed
    by CAST AS BIGINT at the oracle output and linted by
    tests/test_oracle_types.py. This guard stays because the float
    truncation hazard it closes is real regardless."""
    return int(s.fillna(0).astype("int64").sum())


QUERIES["cogroup_user_activity"] = cogroup_user_activity


def cogroup_user_activity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIAGNOSTIC TWIN (VERDICT r6 item 1 — bisect, don't guess): the
    count columns of ``cogroup_user_activity`` ONLY, same cogroup
    plumbing, zero arithmetic on values. If the driver reds this row
    the divergence is in the cogroup/key path; if it greens while the
    sums twin reds, it's the value-micros path."""
    return cogroup_user_activity(spark, sf_dir).select(
        "user_id", "n_clicks", "n_purchases"
    )


def cogroup_user_activity_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIAGNOSTIC TWIN: the micro-sum columns only (see counts twin)."""
    return cogroup_user_activity(spark, sf_dir).select(
        "user_id", "click_value_micros", "purchase_value_micros"
    )


QUERIES["cogroup_user_activity_counts"] = cogroup_user_activity_counts
QUERIES["cogroup_user_activity_sums"] = cogroup_user_activity_sums

ORACLES["cogroup_user_activity"] = """
    WITH c AS (
        SELECT user_id, count(*) AS n_clicks,
               sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS click_value_micros
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
        SELECT user_id, count(*) AS n_purchases,
               sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS purchase_value_micros
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(n_purchases, 0) AS n_purchases,
           CAST(COALESCE(click_value_micros, 0) AS BIGINT) AS click_value_micros,
           CAST(COALESCE(purchase_value_micros, 0) AS BIGINT) AS purchase_value_micros
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""

ORACLES["cogroup_user_activity_counts"] = """
    WITH c AS (
        SELECT user_id, count(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
        SELECT user_id, count(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""

ORACLES["cogroup_user_activity_sums"] = """
    WITH c AS (
        SELECT user_id,
               sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS click_value_micros
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
        SELECT user_id,
               sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS purchase_value_micros
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(COALESCE(click_value_micros, 0) AS BIGINT) AS click_value_micros,
           CAST(COALESCE(purchase_value_micros, 0) AS BIGINT) AS purchase_value_micros
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""


def arrow_map_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python batch API (raw Arrow
    RecordBatches, no pandas conversion): per-doc whitespace token count
    and total token chars, computed with Arrow compute kernels only.

    Integer outputs ⇒ exact oracle. Scale: same partition-parallel
    shape as mapInPandas, minus the pandas materialization — the right
    tool when the per-batch logic is itself columnar."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            trimmed = pc.utf8_trim_whitespace(batch.column("text"))
            toks = pc.split_pattern_regex(trimmed, r"\s+")
            # an empty/all-whitespace doc trims to "" and splits to
            # [""] — count it as 0 tokens, matching the oracle's filter
            n = pc.if_else(
                pc.equal(trimmed, ""),
                pa.scalar(0, pa.int32()),
                pc.list_value_length(toks),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.cast(n, pa.int64())],
                names=["doc_id", "n_tokens"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(stats, "doc_id long, n_tokens long")


QUERIES["arrow_map_token_stats"] = arrow_map_token_stats

ORACLES["arrow_map_token_stats"] = """
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t != '')) AS n_tokens
    FROM documents
"""


# ------------------------------------------------- grouped applyInArrow
# The last Python-boundary API surface: groupBy().applyInArrow — the
# grouped-map shape with RAW Arrow tables (no pandas materialization),
# the right tool when the per-group logic wants columnar buffers (here:
# order statistics, which no algebraic aggregate composes). Emits both
# median conventions (lower/upper order statistic) so the oracle can
# match discrete semantics exactly — never the float midpoint.
# 100 TB: per-group work is a sort of that GROUP's rows only; groups
# (languages) are the shuffle key. A hot group is the skew hazard —
# the same salting rails as any grouped map apply.


def arrow_group_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")

    # NB: deliberately NO type annotations — pyspark's
    # infer_group_arrow_eval_type_from_func raises on annotations it
    # can't resolve (string hints to a local import), and applyInArrow
    # then hits an UnboundLocalError on eval_type (pyspark 4.1 bug).
    def stats(key, table):
        vals = sorted(v.as_py() for v in table.column("n_chars"))
        n = len(vals)
        return pa.table(
            {
                "lang": [key[0]],
                "n_docs": [n],
                "min_chars": [vals[0]],
                "max_chars": [vals[-1]],
                "median_lo": [vals[(n - 1) // 2]],
                "median_hi": [vals[n // 2]],
            }
        )

    return docs.groupBy("lang").applyInArrow(
        stats,
        schema=(
            "lang string, n_docs long, min_chars long, max_chars long, "
            "median_lo long, median_hi long"
        ),
    )


QUERIES["arrow_group_robust_stats"] = arrow_group_robust_stats

ORACLES["arrow_group_robust_stats"] = """
    WITH s AS (
        SELECT lang, list_sort(list(n_chars)) AS vs,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    )
    SELECT lang, n_docs,
           CAST(vs[1] AS BIGINT) AS min_chars,
           CAST(vs[CAST(n_docs AS INTEGER)] AS BIGINT) AS max_chars,
           CAST(vs[CAST((n_docs - 1) // 2 + 1 AS INTEGER)] AS BIGINT) AS median_lo,
           CAST(vs[CAST(n_docs // 2 + 1 AS INTEGER)] AS BIGINT) AS median_hi
    FROM s
"""
