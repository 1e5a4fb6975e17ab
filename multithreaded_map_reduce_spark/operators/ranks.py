"""Distributed exact global-order rail (VERDICT r10 lead item).

Global-order statistics — ``row_number`` over a total order, running
(prefix) sums, ``ntile`` — are exact by definition, but the naive
Spark form ``W.orderBy(key)`` with no ``partitionBy`` plans as a
SINGLE-TASK global sort: correct at sf0.1, a scale-killer at 100 TB
(the whole relation funnels through one window task). The reference
engine never faces this (its two programs are per-key reduces —
the reducer loop in ``/root/reference/include/MapReduceMaster.h``,
~lines 544-556); this repo's rank-statistic family does.

The scale-safe equivalent implemented here is the classic distributed
rank / prefix-sum decomposition (the shape external-sort engines use
for percentile cuts):

1. **Bucket** every row by a MONOTONE quantization of the sort key —
   a tuple of columns whose lexicographic order is consistent with
   the global row order (the exact leading key, or a range-quantized
   version of it, optionally refined by a quantized tie-break).
   Bucket count is a DIAL (hundreds–thousands), independent of row
   count.
2. **Local pass**: one window per bucket (``partitionBy(buckets)``) —
   many small sorts that scale out with the cluster.
3. **Stitch**: per-bucket totals form a bucket-grain relation
   (#buckets rows); ONE tiny unpartitioned window over it yields each
   bucket's exclusive global offset; a broadcast join adds offsets to
   the local results.

The result is bit-identical to the single-task form (same total
order, same ranks) — only the physical shape changes. Exactness
contract: stitched sums must be overflow-safe in the column types the
caller passes (cast to DECIMAL(38,0)/BIGINT upstream). The bucket
function needs monotonicity and determinism only — NOT exactness —
so ``width_bucket`` over doubles is safe (IEEE long→double rounding
is monotone non-decreasing; equal inputs always land equal buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: Default bucket-count dial: enough spread that a 1000-executor
#: cluster keeps every slot busy, small enough that the bucket-grain
#: offset relation always broadcasts (~KBs) and its stitch window is
#: trivially single-task-safe.
DEFAULT_BUCKETS = 1024

_B = "__rk_b{i}"
_CNT = "__rk_cnt"
_OFF_CNT = "__rk_off_cnt"


def range_bucket(
    col: Column, lo: Column, hi: Column, n_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Monotone quantization of a numeric column into ``n_buckets``
    range buckets given (broadcast-joined) bounds ``lo``/``hi``.

    ``width_bucket`` is monotone non-decreasing in its operand — the
    only property the rail needs — and every argument may be a
    Column, so the bounds come from a 1-row aggregate broadcast, not
    a driver collect. Degenerate ``lo == hi`` relations land in one
    bucket (still correct: the local window covers everything).

    The upper bound is ``max(hi + 1, hi + |hi|·1e-9)``: the absolute
    +1 alone is absorbed by IEEE rounding once |hi| ≥ 2^53, which
    with ``lo == hi`` would make the width_bucket bounds equal →
    NULL buckets → rows silently dropped by the rail's equi-join
    (ADVICE r11). The relative bump survives rounding at any finite
    magnitude (1e-9 ≫ the 2^-52 relative ulp) and leaves the bound —
    and therefore every bucket assignment — unchanged for |hi| < 1e9.
    """
    hid = hi.cast("double")
    return F.width_bucket(
        col.cast("double"),
        lo.cast("double"),
        F.greatest(hid + F.lit(1.0), hid + F.abs(hid) * F.lit(1e-9)),
        F.lit(n_buckets),
    ).cast("int")


def with_global_order(
    df: DataFrame,
    buckets: list[Column],
    order: list[Column],
    sums: dict[str, Column] | None = None,
    row_number: str | None = None,
    group: list[str] | None = None,
    mins: dict[str, Column] | None = None,
) -> DataFrame:
    """Append exact global-order columns without a global sort.

    ``buckets``: columns whose lexicographic tuple order is MONOTONE
    w.r.t. the caller's total order (caller's contract — e.g. the
    exact leading sort key plus a ``range_bucket`` of the tie-break,
    or a ``range_bucket`` of the leading key alone; a quantized
    SECONDARY key is only valid under an exact, un-quantized leading
    bucket). ``order``: the full within-bucket ordering (the global
    tie-break chain — must totally order rows up to rows whose order
    columns are fully equal). ``sums``: name → column, appended as the
    INCLUSIVE global prefix sum under the total order. ``row_number``:
    name for the exact 1-based global row number.

    ``group``: optional partition columns — the total order (and every
    appended column) restarts per group; the stitch window partitions
    by the group, so it stays bucket-grain per group. ``mins``:
    name → column, appended as the INCLUSIVE prefix MIN under the
    total order (same stitch mechanics as ``sums``; NULL offsets from
    the first bucket act as +∞).

    Shapes: one hash partition per bucket for the local windows, one
    #buckets-row stitch window, one broadcast join. No data-grain
    relation is ever sorted in a single task.

    Caller contract: bucket expressions must be NON-NULL for every
    row — the offset join is a plain equi-join, so a NULL bucket
    (e.g. a NULL sort key reaching ``range_bucket``) would silently
    drop the row from the output instead of ranking it (ADVICE r11).
    Enforced fail-fast below: a NULL bucket raises at execution time.
    """
    sums = sums or {}
    mins = mins or {}
    group = group or []
    bnames = [_B.format(i=i) for i in range(len(buckets))]
    base = df
    for name, col in zip(bnames, buckets):
        base = base.withColumn(
            name,
            F.when(col.isNotNull(), col).otherwise(
                F.raise_error(
                    F.lit(
                        "with_global_order: NULL bucket key — the rail "
                        "requires non-null sort/bucket expressions "
                        "(coalesce NULLs to a sentinel upstream)"
                    )
                )
            ),
        )

    per_bucket = base.groupBy(*group, *bnames).agg(
        F.count(F.lit(1)).alias(_CNT),
        *[F.sum(c).alias(f"__rk_s_{n}") for n, c in sums.items()],
        *[F.min(c).alias(f"__rk_m_{n}") for n, c in mins.items()],
    )
    # The ONLY unpartitioned-within-group window: #buckets rows per
    # group (dial-bounded, not data-grain — the whitelisted class in
    # the window-shape lint).
    wb = (
        W.partitionBy(*group) if group else W
    ).orderBy(*bnames).rowsBetween(W.unboundedPreceding, -1)
    off = per_bucket.select(
        *group,
        *bnames,
        F.coalesce(F.sum(_CNT).over(wb), F.lit(0)).alias(_OFF_CNT),
        *[
            # 0 * sum-typed column keeps the offset's type aligned
            # with the local cumulative's (DECIMAL stays DECIMAL).
            F.coalesce(
                F.sum(f"__rk_s_{n}").over(wb),
                F.lit(0) * F.col(f"__rk_s_{n}"),
            ).alias(f"__rk_off_{n}")
            for n in sums
        ],
        # min offsets may stay NULL for the first bucket (identity of
        # min) — F.least-with-null below treats NULL as +∞
        *[F.min(f"__rk_m_{n}").over(wb).alias(f"__rk_moff_{n}") for n in mins],
    )
    out = base.join(F.broadcast(off), [*group, *bnames])
    wl = W.partitionBy(*group, *bnames).orderBy(*order)
    wcum = wl.rowsBetween(W.unboundedPreceding, 0)
    if row_number is not None:
        out = out.withColumn(
            row_number,
            (F.row_number().over(wl) + F.col(_OFF_CNT)).cast("long"),
        )
    for n, c in sums.items():
        out = out.withColumn(n, F.sum(c).over(wcum) + F.col(f"__rk_off_{n}"))
    for n, c in mins.items():
        local = F.min(c).over(wcum)
        out = out.withColumn(
            n,
            F.when(
                F.col(f"__rk_moff_{n}").isNull(), local
            ).otherwise(F.least(local, F.col(f"__rk_moff_{n}"))),
        )
    return out.drop(
        *bnames,
        _OFF_CNT,
        *[f"__rk_off_{n}" for n in sums],
        *[f"__rk_moff_{n}" for n in mins],
    )


def sql_ntile_from_rn(rn: str, n: str, k: int) -> str:
    """Arithmetic twin of SQL ``ntile(k)`` from an exact 1-based row
    number expression ``rn`` and partition row count ``n`` — pure
    integer ``div``/``%`` (no window, no sort), for use with
    ``F.expr``.

    Standard semantics (Spark == DuckDB): ``base = n div k``,
    ``rem = n % k``; buckets ``1..rem`` hold ``base+1`` rows, the
    rest ``base``. For rows past the fat buckets the index is
    ``rem + ceil((rn - rem*(base+1)) / base)``; ``base = 0`` (fewer
    rows than buckets) never reaches that branch since then
    ``rem = n`` and every row sits in the fat range.
    """
    base = f"(({n}) div {k})"
    rem = f"(({n}) % {k})"
    cut = f"({rem} * ({base} + 1))"
    fat = f"((({rn}) + {base}) div ({base} + 1))"
    thin = (
        f"({rem} + ((({rn}) - {cut} + greatest({base}, 1) - 1)"
        f" div greatest({base}, 1)))"
    )
    return (
        f"(CASE WHEN ({rn}) <= {cut} THEN {fat} ELSE {thin} END)"
    )
