"""resample_gapfill semantics on a hand-computed series + the gate
compare for the registry query."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1, h, 0, 0), v) for k, h, v in rows],
        "key long, ts timestamp_ntz, value double",
    )


def test_gapfill_linear_interpolation(spark):
    from multithreaded_map_reduce_spark.operators.timeseries import resample_gapfill

    # key 1: buckets at hours 0 and 3 → hours 1,2 interpolated on the
    # line 10 → 40 (exact thirds floor to micro-units)
    ev = _mk_events(spark, [(1, 0, 10.0), (1, 3, 40.0), (2, 5, 7.5)])
    out = resample_gapfill(ev, "key", "ts", "value", 3600 * 1_000_000)
    rows = {
        (r["key"], r["bucket_start"].hour): (r["n"], r["value_iu"], r["interpolated"])
        for r in out.collect()
    }
    assert rows[(1, 0)] == (1, 10_000_000, False)
    assert rows[(1, 1)] == (0, 20_000_000, True)
    assert rows[(1, 2)] == (0, 30_000_000, True)
    assert rows[(1, 3)] == (1, 40_000_000, False)
    # single-bucket key: no gaps, nothing interpolated
    assert rows[(2, 5)] == (1, 7_500_000, False)
    assert len(rows) == 5


def test_gapfill_multiple_observations_per_bucket(spark):
    from multithreaded_map_reduce_spark.operators.timeseries import resample_gapfill

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 10), 1.25),
            (1, dt.datetime(2024, 1, 1, 0, 50), 2.75),
            (1, dt.datetime(2024, 1, 1, 1, 30), 6.0),
        ],
        "key long, ts timestamp_ntz, value double",
    )
    out = resample_gapfill(ev, "key", "ts", "value", 3600 * 1_000_000)
    rows = {r["bucket_start"].hour: (r["n"], r["value_iu"]) for r in out.collect()}
    assert rows[0] == (2, 4_000_000)  # 1.25 + 2.75 summed exactly
    assert rows[1] == (1, 6_000_000)


def test_gapfill_grid_rail_raises(spark):
    from multithreaded_map_reduce_spark.operators.timeseries import resample_gapfill

    ev = _mk_events(spark, [(1, 0, 1.0), (1, 10, 1.0)])
    railed = resample_gapfill(ev, "key", "ts", "value", 3600 * 1_000_000, max_grid=5)
    with pytest.raises(Exception, match="spans more than 5 buckets"):
        railed.collect()


def test_timeseries_gapfill_gate(spark):
    from multithreaded_map_reduce_spark.queries.timeseries import ORACLES, QUERIES

    compare(spark, QUERIES["timeseries_gapfill"], ORACLES["timeseries_gapfill"], SF_SMOKE)
