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
    state across micro-batches; emits the updated totals each batch.

    The value sum is carried as exact integer MICRO-UNITS (each value
    rounded to 1e-6 once via the portable floor(x*1e6 + 0.5) formula —
    the same ``iunits`` definition the batch queries and the DuckDB
    oracle use — then integer-summed): float accumulation order varies
    with batch/partition order, integer sums don't, so the operator is
    deterministic enough to differential-test against a SQL oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total_micros = state.get
        else:
            n, total_micros = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            total_micros += int(
                np.floor(pdf["value"].to_numpy() * 1_000_000 + 0.5)
                .astype("int64")
                .sum()
            )
        state.update((n, total_micros))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_micros": [total_micros],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_micros long",
        stateStructType="n long, total_micros long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """The same per-user running totals on the ``transformWithState``
    API (Spark 4 arbitrary-stateful v2): explicit typed ValueState
    handles instead of one opaque state tuple — the API that adds
    state TTL, multiple state variables, and timers. Semantics are
    identical to ``running_user_totals`` (exact integer micro-units).

    NOT in the gate registry: the v2 driver worker imports
    ``google.protobuf`` (StateMessage protos), which this container
    does not ship — ``tests/test_asof_streaming.py`` skips the round
    trip unless protobuf is importable. The applyInPandasWithState
    operator above is the gate-verified equivalent."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            from pyspark.sql.types import LongType, StructField, StructType

            schema = StructType(
                [StructField("n", LongType()), StructField("total_micros", LongType())]
            )
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total_micros = self._state.get()
            else:
                n, total_micros = 0, 0
            for pdf in rows:
                n += len(pdf)
                total_micros += int(
                    np.floor(pdf["value"].to_numpy() * 1_000_000 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._state.update((n, total_micros))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_micros": [total_micros]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, total_micros long",
        outputMode="Update",
        timeMode="None",
    )
