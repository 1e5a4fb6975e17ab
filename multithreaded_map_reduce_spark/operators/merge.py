"""Upsert / MERGE-INTO emulation on plain parquet (no Delta/Iceberg in
this environment — SURVEY.md guide: 'CDC/SCD2 → emulate with anti-join
+ union').

``upsert``: target ∪ updates where updates win on key collision —
one anti-join (target rows not being replaced) + union. At 100 TB the
anti-join shuffles on the key once; with bucketed targets it co-locates.

``scd2_apply``: slowly-changing-dimension type 2 — closes the current
version of changed keys (valid_to = change ts) and appends the new
version (valid_to = NULL). Pure DataFrame composition, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _one_row_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """Keep exactly one row per key, deterministically: highest value
    under (order_cols..., remaining columns) descending. A batch with
    duplicate keys would otherwise fan out every matching dim/target row
    through the join, silently duplicating the output."""
    tiebreak = [c for c in df.columns if c != key and c not in order_cols]
    w = W.partitionBy(key).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols + tiebreak]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Updates replace target rows on key; new keys are appended.
    Duplicate-key update rows are collapsed to one deterministic winner
    first (see ``_one_row_per_key``)."""
    updates = _one_row_per_key(updates, key, [])
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Type-2 apply: ``dim`` rows carry (key, attrs, valid_from,
    valid_to NULL for current); ``changes`` carries (key, attrs,
    valid_from). Current versions of changed keys are closed at the
    change's valid_from; changed/new rows append as current.

    Multiple change rows for one key collapse to the latest
    (max ``ts_col``, deterministic tiebreak) — without this the
    dim-to-changes left join fans every current row out per duplicate."""
    changes = _one_row_per_key(changes, key, [ts_col])
    changed_keys = changes.select(key, F.col(ts_col).alias("_new_from"))
    closed = (
        dim.join(changed_keys, key, "left")
        .withColumn(
            end_col,
            F.when(
                F.col(end_col).isNull() & F.col("_new_from").isNotNull(),
                F.col("_new_from"),
            ).otherwise(F.col(end_col)),
        )
        .drop("_new_from")
    )
    new_rows = changes.withColumn(end_col, F.lit(None).cast(dim.schema[end_col].dataType))
    return closed.unionByName(new_rows.select(closed.columns))
