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


def bucket_anomaly_flags(buckets: DataFrame) -> DataFrame:
    """Stateful streaming twin of ``queries/timeseries.timeseries_anomaly``:
    per-user hourly activity with trailing-24-bucket z-score flags,
    state = the full (bucket, n, x) history per user, evolved
    batch-by-batch and re-scored on every update.

    Input: (user_id, b, v) rows — bucket index and milli-unit value,
    both computed JVM-side. All scoring is exact integer arithmetic
    (Python ints — no float, no overflow), identical to the batch
    query's BIGINT formula, so the memory-sink contents hash-match the
    same DuckDB oracle.

    Scale: one state row per user with O(active buckets) history —
    bound it in production by evicting buckets older than the window
    horizon (the trailing 24 are all the scorer reads; eviction is a
    two-line slice here, kept whole for oracle parity with the batch
    twin which scores the full history)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            bs, ns, xs = state.get
            hist = {b: (n, x) for b, n, x in zip(bs, ns, xs)}
        else:
            hist = {}
        for pdf in pdfs:
            grouped = pdf.groupby("b").agg(n=("v", "size"), x=("v", "sum"))
            for b, row in grouped.iterrows():
                n0, x0 = hist.get(int(b), (0, 0))
                hist[int(b)] = (n0 + int(row["n"]), x0 + int(row["x"]))
        items = sorted(hist.items())
        state.update(
            (
                [b for b, _ in items],
                [n for _, (n, _x) in items],
                [x for _, (_n, x) in items],
            )
        )
        out = {
            "user_id": [],
            "b": [],
            "n": [],
            "x_milli": [],
            "hist_n": [],
            "is_anomaly": [],
        }
        for i, (b, (n, x)) in enumerate(items):
            lo = max(0, i - 24)
            window = [xx for _, (_nn, xx) in items[lo:i]]
            m = len(window)
            if m < 8:
                continue
            s1 = sum(window)
            s2 = sum(xx * xx for xx in window)
            flag = (x * m - s1) ** 2 > 9 * (m * s2 - s1 * s1)
            out["user_id"].append(key[0])
            out["b"].append(b)
            out["n"].append(n)
            out["x_milli"].append(x)
            out["hist_n"].append(m)
            out["is_anomaly"].append(bool(flag))
        yield pd.DataFrame(out)

    return buckets.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, b long, n long, x_milli long,"
            " hist_n long, is_anomaly boolean"
        ),
        stateStructType="bs array<long>, ns array<long>, xs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionized_pattern_counts(events: DataFrame, gap_us: int, pattern: str) -> DataFrame:
    """Streaming CEP: per-user stateful sequence-pattern matching — the
    streaming twin of queries/events.events_pattern_match. State holds
    the user's full (tus, event_id, event_type) history as arrays;
    every batch re-sessionizes (30-min integer-micro gaps) and re-emits
    (n_sessions, n_matching, n_seen). Emitting from scratch per batch
    makes the operator retraction-free: late events can merge sessions,
    so counts are NOT monotone — the consumer keeps the row with max
    n_seen (total events processed, which IS monotone).

    At real scale the unbounded per-user history is the thing to bound:
    EventTimeTimeout + watermark lets closed sessions emit-and-evict so
    state holds only the open tail. With the fixture in one micro-batch
    the full-history form is exactly the batch semantics — which is
    what the shared differential oracle pins."""
    import re as _re

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            tus, eid, et = state.get
            tus, eid, et = list(tus), list(eid), list(et)
        else:
            tus, eid, et = [], [], []
        for pdf in pdfs:
            tus.extend(int(x) for x in pdf["tus"])
            eid.extend(int(x) for x in pdf["event_id"])
            et.extend(str(x) for x in pdf["event_type"])
        state.update((tus, eid, et))
        order = sorted(range(len(tus)), key=lambda i: (tus[i], eid[i]))
        n_sessions, n_matching = 0, 0
        seq: list[str] = []
        prev = None
        rx = _re.compile(pattern)
        for i in order + [None]:
            if i is None or (prev is not None and tus[i] - prev > gap_us):
                if seq:
                    n_sessions += 1
                    if rx.search(">".join(seq)):
                        n_matching += 1
                seq = []
            if i is not None:
                seq.append(et[i])
                prev = tus[i]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_matching": [n_matching],
                "n_seen": [len(tus)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, n_sessions long, n_matching long, n_seen long"
        ),
        stateStructType="tus array<long>, eid array<long>, et array<string>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
