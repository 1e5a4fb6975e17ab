"""Multimodal gate queries.

``multimodal_features`` runs the Arrow-batched binary pipeline
(mapInPandas) and STILL has an exact DuckDB oracle: the media blobs are
the documents' UTF-8 bytes, and the oracle recomputes byte length and
the additive byte checksum over the actual UTF-8 encoding
(``hex(encode(text))`` → per-byte values), so non-ASCII documents hash
identically on both sides. This differentially tests the Python/Arrow
path itself against the JVM-free oracle, not just JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import documents_as_media, extract_media_features
from ..sources.catalog import load_table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(documents_as_media(docs))


QUERIES = {"multimodal_features": multimodal_features}

# Additive checksum over the UTF-8 BYTES (not codepoints): decode each
# 2-hex-digit byte of hex(encode(text)) — exact for non-ASCII text too.
_HEXDIG = "'0123456789ABCDEF'"
_BYTE_AT = (
    f"CAST((strpos({_HEXDIG}, substring(_hx, (i-1)*2+1, 1)) - 1) * 16"
    f" + (strpos({_HEXDIG}, substring(_hx, (i-1)*2+2, 1)) - 1) AS BIGINT)"
)
_CHECKSUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(range(1, CAST(octet_length(encode(text)) AS INTEGER) + 1), "
    f"i -> {_BYTE_AT})), "
    "(x, y) -> x + y) % 2147483647"
)

ORACLES = {
    "multimodal_features": f"""
        WITH hexed AS (
            SELECT doc_id, text, hex(encode(text)) AS _hx FROM documents
        )
        SELECT doc_id AS media_id,
               'text' AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST({_CHECKSUM} AS BIGINT) AS checksum,
               CAST(({_CHECKSUM}) % 640 + 1 AS INTEGER) AS fake_width,
               CAST(({_CHECKSUM}) % 480 + 1 AS INTEGER) AS fake_height
        FROM hexed
    """,
}
