"""Multimodal gate queries.

``multimodal_features`` runs the Arrow-batched binary pipeline
(mapInPandas) and STILL has an exact DuckDB oracle: the media blobs are
the documents' UTF-8 bytes, so byte length = ASCII length and the
additive checksum = sum of codepoints — computable in SQL. This
differentially tests the Python/Arrow path itself against the JVM-free
oracle, not just JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import documents_as_media, extract_media_features
from ..sources.catalog import load_table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(documents_as_media(docs))


QUERIES = {"multimodal_features": multimodal_features}

_CHECKSUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT))), "
    "(x, y) -> x + y) % 2147483647"
)

ORACLES = {
    "multimodal_features": f"""
        SELECT doc_id AS media_id,
               'text' AS modality,
               CAST(length(text) AS BIGINT) AS byte_len,
               CAST({_CHECKSUM} AS BIGINT) AS checksum,
               CAST(({_CHECKSUM}) % 640 + 1 AS INTEGER) AS fake_width,
               CAST(({_CHECKSUM}) % 480 + 1 AS INTEGER) AS fake_height
        FROM documents
    """,
}
