"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2c); this is the
escape hatch for stateful logic that ``groupBy().agg()`` +  watermarks
can't express: arbitrary per-key state evolved batch-by-batch.

Scale notes: state lives in the state store keyed by group — bound it
(timeouts / explicit eviction) or an unbounded key space grows without
limit; one state row per user here is the bounded case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) maintained as explicit
    state across micro-batches; emits the updated totals each batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
