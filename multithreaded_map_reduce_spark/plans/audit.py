"""Physical-plan auditing — the feedback loop that keeps this engine
honest about scale (the reference has no optimizer to audit; SURVEY.md
§4 — here Catalyst is the optimizer, and these helpers verify it did
what the 100 TB design intends).

Checks, per query:
- filters reached the parquet scan (``PushedFilters``);
- the scan reads only referenced columns (``ReadSchema`` width);
- intended joins are broadcast (no accidental shuffle of a dim);
- no ``CartesianProduct`` without an explicit opt-in.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffle_exchanges: int = 0
    cartesian: bool = False


def plan_report(df: DataFrame) -> PlanReport:
    text = explain_formatted(df)
    rep = PlanReport()
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("PushedFilters:"):
            rep.pushed_filters.append(line.removeprefix("PushedFilters:").strip())
        elif line.startswith("ReadSchema:"):
            rep.read_schemas.append(line.removeprefix("ReadSchema:").strip())
        elif "BroadcastHashJoin" in line or "BroadcastNestedLoopJoin" in line:
            rep.broadcast_joins += 1
        elif "SortMergeJoin" in line:
            rep.sortmerge_joins += 1
        elif "CartesianProduct" in line:
            rep.cartesian = True
        elif line.startswith("(") and "Exchange" in line and "Broadcast" not in line:
            rep.shuffle_exchanges += 1
    return rep


def assert_plan(
    df: DataFrame,
    require_pushed_filter: str | None = None,
    max_scan_columns: int | None = None,
    min_broadcast_joins: int = 0,
    allow_cartesian: bool = False,
) -> PlanReport:
    """Raise AssertionError when the physical plan violates the stated
    scale contract; returns the report for further checks."""
    rep = plan_report(df)
    if require_pushed_filter is not None:
        assert any(
            require_pushed_filter in f for f in rep.pushed_filters
        ), f"filter {require_pushed_filter!r} not pushed; got {rep.pushed_filters}"
    if max_scan_columns is not None:
        for rs in rep.read_schemas:
            ncols = rs.count(",") + 1 if rs.startswith("struct<") and len(rs) > 8 else 0
            assert (
                ncols <= max_scan_columns
            ), f"scan reads {ncols} columns (> {max_scan_columns}): {rs}"
    assert (
        rep.broadcast_joins >= min_broadcast_joins
    ), f"expected >= {min_broadcast_joins} broadcast joins, saw {rep.broadcast_joins}"
    if not allow_cartesian:
        assert not rep.cartesian, "unexpected CartesianProduct in plan"
    return rep
