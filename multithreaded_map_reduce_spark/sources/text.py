"""Line-oriented text sources — the reference's native input relation.

The reference keys each record by its 0-based global line number
(``include/MapReduceMaster.h:463-478``: ``map_fn(to_string(record_number),
line)``). Reproduced here as a DataFrame ``(line_no BIGINT, line STRING)``.

Scale note: ``zipWithIndex`` costs one extra job to count per-partition
sizes, but keeps line numbers dense and global, matching the reference's
semantics. For workloads that only need a *stable unique* id (not dense),
``monotonically_increasing_id`` is free — both are offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINES_SCHEMA = T.StructType(
    [
        T.StructField("line_no", T.LongType(), False),
        T.StructField("line", T.StringType(), False),
    ]
)


def read_text_lines(spark: SparkSession, path: str, dense: bool = True) -> DataFrame:
    """``spark.read.text`` + global line numbers.

    dense=True  → 0-based dense global line numbers (reference semantics)
    dense=False → stable unique ids without the extra counting job
    """
    lines = spark.read.text(path)
    if dense:
        rdd = lines.rdd.map(lambda r: r[0]).zipWithIndex().map(lambda t: (t[1], t[0]))
        return spark.createDataFrame(rdd, LINES_SCHEMA)
    return lines.select(
        F.monotonically_increasing_id().alias("line_no"), F.col("value").alias("line")
    )


def corpus_lines(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Map the ``documents`` fixture onto the reference's corpus shape:
    one row per line of each document, keyed (doc_id, line_no)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
