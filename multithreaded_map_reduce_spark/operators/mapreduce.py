"""Generic MapReduce programming surface — the reference's client API.

Reference contract (``include/MapReduceMaster.h:75-112``): subclass
``MapReduceInterface``, implement

- ``map_fn(k1, v1)`` emitting 0..n ``(k2, v2)`` pairs (via
  ``emitIntermediate``),
- ``reduce_fn(k2, [v2, ...])`` emitting one output per key (via
  ``emit(k, vector<v>)``),

register it in a factory (``MapReduceMaster.h:27-72``), and call
``MapReduceMaster(...).process()``. The reference hardcodes one program
per process (lookup name ``"MapReduce"``, quirk Q5); here the registry
holds any number of named programs.

Spark mapping (SURVEY.md §2a rows 3–6): map = ``flatMap``, shuffle =
Spark's shuffle, group = ``groupByKey``, reduce = ``flatMap`` over
groups. Two execution paths:

- ``run``: honest per-record Python adapter (RDD). Exists for API
  parity; arbitrary Python closures can't go through Catalyst.
- ``run_with_combiner``: when the user declares the reduction
  associative+commutative (``combine_fn``), uses ``aggregateByKey`` so
  partial aggregation happens map-side — the combiner the reference
  never implemented (SURVEY.md §4): at 100 TB this is the difference
  between shuffling every emitted pair and shuffling one pre-aggregated
  value per (partition, key).

Known-shape programs (word count, inverted index) should instead use the
declarative queries in ``queries/corpus.py`` — built-ins beat any UDF.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]
ReduceFn = Callable[[Any, list], Iterable[tuple[Any, Any]]]

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("values", T.ArrayType(T.StringType()), False),
    ]
)


class MapReduce:
    """A named (map_fn, reduce_fn) program, runnable over any DataFrame."""

    def __init__(
        self,
        map_fn: MapFn,
        reduce_fn: ReduceFn,
        name: str = "MapReduce",
        num_partitions: int | None = None,
    ):
        self.map_fn = map_fn
        self.reduce_fn = reduce_fn
        self.name = name
        self.num_partitions = num_partitions

    def run(self, df: DataFrame, key_col: str, value_col: str, out_schema=OUT_SCHEMA) -> DataFrame:
        """map → shuffle → group → reduce, reference semantics.

        ``reduce_fn`` receives the full (unordered) value list per key,
        exactly like the reference's ``vector<string>`` — and with the
        same flaw: a skewed key's values must fit in one task's memory.
        Prefer ``run_with_combiner`` when the reduction allows it.
        """
        spark = df.sparkSession
        map_fn, reduce_fn = self.map_fn, self.reduce_fn
        rdd = df.select(key_col, value_col).rdd.flatMap(lambda r: map_fn(r[0], r[1]))
        grouped = rdd.groupByKey(self.num_partitions)
        out = grouped.flatMap(lambda kv: reduce_fn(kv[0], list(kv[1])))
        return spark.createDataFrame(out, out_schema)

    def run_with_combiner(
        self,
        df: DataFrame,
        key_col: str,
        value_col: str,
        zero: Any,
        combine_fn: Callable[[Any, Any], Any],
        merge_fn: Callable[[Any, Any], Any] | None = None,
        finish_fn: Callable[[Any, Any], Iterable[tuple[Any, Any]]] | None = None,
        out_schema=OUT_SCHEMA,
    ) -> DataFrame:
        """Same pipeline with map-side partial aggregation.

        ``combine_fn(acc, v2)`` folds one emitted value into the
        accumulator; ``merge_fn(acc, acc)`` merges partials (defaults to
        ``combine_fn``); ``finish_fn(key, acc)`` shapes the output rows
        (defaults to ``reduce_fn(key, acc)`` if acc is a list, else
        one ``(key, acc)`` row).
        """
        spark = df.sparkSession
        map_fn = self.map_fn
        merge = merge_fn or combine_fn
        rdd = df.select(key_col, value_col).rdd.flatMap(lambda r: map_fn(r[0], r[1]))
        agg = rdd.aggregateByKey(zero, combine_fn, merge, self.num_partitions)
        if finish_fn is None:
            out = agg.map(lambda kv: (kv[0], kv[1]))
        else:
            out = agg.flatMap(lambda kv: finish_fn(kv[0], kv[1]))
        return spark.createDataFrame(out, out_schema)


# Registry — generalizes the reference's single-slot factory
# (``MapReduceMaster.h:27-72`` + hardcoded "MapReduce" lookups, quirk Q5).
PROGRAMS: dict[str, MapReduce] = {}


def register_program(program: MapReduce) -> MapReduce:
    PROGRAMS[program.name] = program
    return program


def get_program(name: str) -> MapReduce:
    return PROGRAMS[name]


def run_secondary_sort(
    df: DataFrame,
    key_col: str,
    sort_cols: list[str],
    value_col: str,
    num_partitions: int = 8,
) -> DataFrame:
    """The canonical MapReduce SECONDARY SORT pattern (round 12) —
    values arrive at the reducer already ordered, so the reduce can
    STREAM instead of buffering-and-sorting. The reference's API
    cannot express this at all: its reducer receives an unordered
    ``vector<string>`` (``include/MapReduceMaster.h:75-112``), so any
    order-sensitive reduction must sort per key in reducer memory —
    the pattern Hadoop users solve with composite keys + grouping
    comparators, and Spark solves with
    ``repartitionAndSortWithinPartitions``: partition by the GROUPING
    key only, sort partitions by the COMPOSITE (key, sort...) tuple,
    then walk each partition grouping consecutive same-key runs.

    One shuffle total; the sort rides the shuffle's spillable
    sort-merge machinery (disk-backed — a hot key never has to fit
    its values in reducer memory during the sort, unlike the
    reference's in-core vector). Output: one row per key with the
    values joined in sorted order.

    Ordering contract: the composite sort key is (key, *sort_cols)
    ONLY — the value column is payload, never a tiebreak (ADVICE
    r12). NULLs in the key or sort columns order FIRST via a
    (non-null?, value) sentinel pair, so a NULL can never raise
    TypeError mid-shuffle; each column must still be homogeneously
    typed across rows (mixed int/str in one column is undefined under
    Python ordering and raises).
    """
    from pyspark.rdd import portable_hash

    spark = df.sparkSession
    n = num_partitions
    ns = len(sort_cols)

    def composite(r):
        # ((non-null?, key), (non-null?, s1), ...) — NULLs first.
        return tuple((v is not None, v) for v in (r[0], *r[1 : 1 + ns]))

    rdd = df.select(key_col, *sort_cols, value_col).rdd.map(
        lambda r: (composite(r), (r[0], r[-1]))
    )
    parted = rdd.repartitionAndSortWithinPartitions(
        numPartitions=n, partitionFunc=lambda k: portable_hash(k[0]) % n
    )

    _SENTINEL = object()

    def walk(it):
        cur_key = _SENTINEL
        vals: list[str] = []
        for (_sk, (k, v)) in it:
            if k != cur_key:
                if cur_key is not _SENTINEL:
                    yield (str(cur_key), ",".join(vals))
                cur_key, vals = k, []
            vals.append(str(v))
        if cur_key is not _SENTINEL:
            yield (str(cur_key), ",".join(vals))

    out = parted.mapPartitions(walk)
    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("ordered_values", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(out, schema)
