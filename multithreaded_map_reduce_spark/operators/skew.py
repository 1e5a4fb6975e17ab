"""Skew-mitigation operators — salting for hot keys (100 TB toolbox).

AQE's skew-join splitting handles moderate skew automatically
(session.py enables it); salting is the explicit tool for degenerate
keys (one key = 30% of a 100 TB table):

- ``salted_sum_count``: two-stage aggregation. Stage 1 groups on
  (key, salt) spreading a hot key over ``n_salts`` reducers; stage 2
  merges the partials. Works for any algebraic aggregate (sum/count/
  min/max — here sum+count, which also yields avg).
- ``salted_join``: salts the skewed (left) side deterministically and
  replicates the compact right side ``n_salts``× so every salted row
  still finds its match. Right-side replication cost = |right|·n — use
  only when right is dim-sized.

Salts are DETERMINISTIC (hash of payload, not rand()) so retried tasks
and the differential tests see identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int, exclude: list[str]) -> F.Column:
    payload = [c for c in df.columns if c not in exclude] or df.columns
    return F.pmod(F.xxhash64(*payload), F.lit(n_salts))


def salted_sum_count(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 8
) -> DataFrame:
    """groupBy(key).agg(sum, count) via two-stage salted aggregation."""
    salted = df.withColumn("_salt", _salt(df, n_salts, [key_col]))
    partial = salted.groupBy(key_col, "_salt").agg(
        F.sum(value_col).alias("_psum"), F.count("*").alias("_pcnt")
    )
    return partial.groupBy(key_col).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("cnt")
    )


def salted_join(
    left: DataFrame, right: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Inner equi-join with a salted hot side + replicated right side."""
    l_salted = left.withColumn("_salt", _salt(left, n_salts, [key]))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return l_salted.join(r_replicated, [key, "_salt"]).drop("_salt")


def salted_collect_set(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 32
) -> DataFrame:
    """groupBy(key).collect_set(value) as an explicit two-stage
    aggregation tree → (key, ids ARRAY) with exact distinct ids.

    Salting by a pure function OF THE COLLECTED VALUE keeps the stage-1
    partials disjoint, so stage 2 is a flatten of collect_list — no
    re-dedup. When does this beat the direct collect_set? NOT at
    ordinary scale: Spark already runs partial_collect_set map-side, so
    the direct plan's reduce fan-in is one partial per map task and the
    extra shuffle here just costs ~2× (measured at sf0.1 on the corpus
    index — which is why `queries/corpus.py` uses the direct plan).
    The two-stage tree pays only in the degenerate regime where BOTH
    (a) map-task count is huge (≥10⁵: fan-in per reducer becomes the
    bottleneck) and (b) the key cardinality is far below the cluster
    parallelism, leaving most reducers idle while hot keys merge.
    """
    partial = (
        df.groupBy(key_col, F.pmod(F.col(value_col).cast("long"), F.lit(n_salts)).alias("_salt"))
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return partial.groupBy(key_col).agg(
        F.flatten(F.collect_list("_part")).alias("ids")
    )
