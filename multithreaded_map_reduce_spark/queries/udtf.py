"""Python UDTF tier (SURVEY.md §2c 'UDF/UDAF/UDTF') — a REAL table
function, not the explode/mapInPandas stand-ins: one input row fans out
to n output rows with per-call generator state (the running character
offset), which a scalar UDF cannot express and an explode would need a
separate window to reconstruct.

This is the modern Spark form of the reference's ``map_fn`` contract —
``emitIntermediate`` inside one call emitting many rows
(``include/MapReduceMaster.h:99-102``) — surfaced through the engine's
declarative layer instead of an RDD adapter.

Determinism: pure string math (reference tokenizer quirk Q2 — any
whitespace run splits, case preserved), so the DuckDB oracle replays it
relationally with generate_series + a running length sum.

Scale: a UDTF is Python-per-row (NOT Arrow-batched) — the right tier
for moderate fan-out over already-reduced relations; token-level work
on the 100 TB fact path belongs to the codegen'd split/posexplode
pipeline (queries/corpus.py) instead. The oracle-facing query here runs
on ``documents`` (the corpus relation, bounded per-partition).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..functions.hashing import sql_tokens
from ..sources.catalog import load_table


@udtf(returnType="pos int, token string, char_off bigint")
class TokenOffsets:
    """(pos, token, cumulative char offset of prior tokens) per token."""

    def eval(self, text: str):
        import re

        if not text:
            return
        off = 0
        pos = 0
        for tok in re.split(r"\s+", text):
            if tok == "":
                continue
            yield (pos, tok, off)
            off += len(tok)
            pos += 1


def udtf_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-join the UDTF against documents (SQL surface, the way a
    user would call it)."""
    fn = f"token_offsets_{uuid.uuid4().hex[:8]}"
    view = f"__udtf_docs_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(fn, TokenOffsets)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT doc_id, t.pos, t.token, t.char_off
        FROM {view}, LATERAL {fn}(text) t
        """
    )
    spark.catalog.dropTempView(view)
    return out


QUERIES = {"udtf_token_offsets": udtf_token_offsets}

_TOKS = sql_tokens("text")

ORACLES = {
    "udtf_token_offsets": f"""
        WITH base AS (
            SELECT doc_id, {_TOKS} AS toks
            FROM documents WHERE len({_TOKS}) > 0
        ), expl AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS i
            FROM base
        )
        SELECT doc_id,
               CAST(i - 1 AS INTEGER) AS pos,
               toks[i] AS token,
               CAST(COALESCE(sum(length(toks[i])) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS char_off
        FROM expl
    """,
}
