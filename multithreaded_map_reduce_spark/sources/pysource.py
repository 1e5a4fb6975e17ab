"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) — the
modern answer to the reference's hand-rolled text scan
(``include/MapReduceMaster.h:442-478``): where the reference makes
every worker read the WHOLE file and keep a stripe (O(mappers ×
filesize)), a DataSource declares its partitions up front and each task
reads only its own — the planner-visible split contract Spark's
built-in sources follow.

``SyntheticEventsDataSource`` generates a deterministic relation from
(seed, n_rows, n_partitions) options using the engine's portable
polynomial hash family (plain modular BIGINT arithmetic — the same
family as functions/hashing.py), so a DuckDB oracle regenerates the
identical rows relationally and the custom source earns a differential
CORRECTNESS row like any other operator. The row set is partition-count
invariant by construction (striping only changes who emits a row, not
the row), which the gate implicitly re-proves every round.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..functions.hashing import POLY_MOD

GEN_A = 906_260_429  # multiplier from the engine's permutation family


def gen_row(rid: int, seed: int) -> tuple[int, int, float]:
    """The one definition both the reader and the SQL oracle replay."""
    h = (rid * GEN_A + seed) % POLY_MOD
    return (rid, h % 100, ((h >> 8) % 1000) / 100.0)


def sql_gen_rows(n_rows: int, seed: int) -> str:
    """DuckDB twin: regenerate the full relation with generate_series."""
    return f"""
        SELECT rid AS row_id,
               ((rid * {GEN_A} + {seed}) % {POLY_MOD}) % 100 AS user_bucket,
               CAST((((rid * {GEN_A} + {seed}) % {POLY_MOD}) // 256) % 1000 AS DOUBLE)
                   / 100.0 AS value
        FROM (SELECT unnest(generate_series(0, {n_rows - 1})) AS rid)
    """


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", "1000"))
        self.n_parts = int(options.get("n_partitions", "4"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        # dense row ids striped across partitions: partition p owns
        # rows p, p+P, p+2P, … — each task touches ONLY its stripe
        p = partition.value
        for rid in range(p, self.n_rows, self.n_parts):
            yield gen_row(rid, self.seed)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return "row_id bigint, user_bucket bigint, value double"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


# ---------------------------------------------- streaming Python source
# The STREAMING half of the custom-source surface (Spark 4
# SimpleDataSourceStreamReader): offsets are row counts, each
# micro-batch serves the rows in [start, end) of the SAME deterministic
# relation the batch reader generates, so a batch aggregate over the
# full range is the exact oracle for whatever the stream accumulated —
# the custom-source twin of the file-source streaming gate entries.
# ``rows_per_batch`` bounds each micro-batch; commit() is a no-op (the
# relation is immutable; nothing to clean).

try:  # pyspark >= 4 only
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", "1000"))
        self.seed = int(options.get("seed", "42"))
        self.per_batch = int(options.get("rows_per_batch", "250"))

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        lo = start["row"]
        hi = min(lo + self.per_batch, self.n_rows)
        rows = [gen_row(rid, self.seed) for rid in range(lo, hi)]
        return iter(rows), {"row": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            gen_row(rid, self.seed) for rid in range(start["row"], end["row"])
        )


class SyntheticEventsStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events_stream"

    def schema(self):
        return "row_id bigint, user_bucket bigint, value double"

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)
