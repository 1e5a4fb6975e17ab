"""Event-time queries vs DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare

EVENT_QUERIES = [
    "events_tumbling",
    "events_sliding",
    "events_session",
    "asof_join_clicks",
    "events_json_props",
    "user_activity",
]


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_session_window_semantics(spark):
    """Session end = last event ts + gap; no session spans a >gap hole."""
    from multithreaded_map_reduce_spark.queries.events import events_session

    rows = events_session(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1
