"""Reference-format text KV sink/source.

The reference writes reducer output as text lines ``key v1 v2 … `` —
one trailing space after every value (``include/Utility.h:61-76``,
quirk Q4) — into per-reducer files ``output_{r}.txt`` hash-partitioned
by key, each file sorted by key (``README.md:155-156``). The semantic
result is the unordered union of rows; this module reproduces the
physical format for interop while the engine's default sink stays
parquet.

- ``write_kv_text``: DataFrame(key, values array) → text part files,
  hash-partitioned on key, sorted within partitions — the exact
  physical layout discipline of the reference (partition count plays
  the role of ``nr_reducer``).
- ``read_kv_text``: parses the format back (whitespace-tokenized:
  first token = key, rest = values — the same framing constraint as
  the reference's ``read_text``, quirk Q3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_kv_text(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    values_col: str = "values",
    num_partitions: int | None = None,
) -> None:
    """Write reference-format ``key v1 v2 … `` lines (trailing space per
    value, quirk Q4), hash-partitioned by key, key-sorted per file."""
    line = F.concat(
        F.col(key_col).cast("string"),
        F.lit(" "),
        F.concat_ws(
            "", F.transform(values_col, lambda v: F.concat(v.cast("string"), F.lit(" ")))
        ),
    )
    out = df.select(F.col(key_col), line.alias("value"))
    if num_partitions:
        out = out.repartition(num_partitions, key_col)
    out.sortWithinPartitions(key_col).select("value").write.mode("overwrite").text(path)


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-format lines → DataFrame(key string, values
    array<string>)."""
    lines = spark.read.text(path)
    toks = F.filter(F.split(F.col("value"), r"\s+"), lambda x: x != F.lit(""))
    return lines.select(
        F.element_at(toks, 1).alias("key"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("values"),
    )
