"""Mini differential harness mirroring the driver's correctness gate:
run a queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, then compare row count + schema-insensitive,
order-insensitive canonical values. Exact string equality on canonical
forms — floats must already be rounded by the query itself (that is the
rule every query in this repo follows)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Exact repr, no rounding: the driver's gate hashes exact values,
        # so any ulp-level divergence must fail HERE, not there (VERDICT
        # r2 item 3 — round(v, 9) masked two DECIMAL-vs-DOUBLE bugs).
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon(v.item())
        if isinstance(v, np.ndarray):
            return _canon(list(v))
    except ImportError:
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        # Decimal stays DISTINCT from float — a Spark DECIMAL result vs a
        # DuckDB DOUBLE oracle is a type bug the driver's hash catches, so
        # the local gate must too. Normalized fixed-point form so equal
        # values at different scales (DECIMAL(18,2) vs (18,6)) still match.
        return "DEC:" + format(v.normalize(), "f")
    return str(v)


def canonical_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark, query_fn, oracle_sql: str, sf_dir: str, limit_diff: int = 5):
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"schema mismatch: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), f"row count: spark={len(srows)} duck={len(drows)}"
    s = canonical_rows(scols, srows)
    d = canonical_rows(dcols, drows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:limit_diff]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
    return len(srows)
