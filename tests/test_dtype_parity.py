"""Registry-wide dtype parity: every query's Spark result schema must
be category-compatible with its DuckDB oracle's (VERDICT r2 item 3).

The driver's correctness gate hashes exact values, so a Spark DECIMAL
against an oracle DOUBLE hash-mismatches even when numerically equal —
that exact bug shipped in r2 (q6_forecast_revenue, scalar_subquery)
because nothing asserted dtypes. This test catches the whole hazard
class statically-ish: Spark schemas are lazy (plan-build only) and
DuckDB relation types come from binding, so most of the registry costs
milliseconds; only eagerly-executing queries (streaming sinks,
iterative fixed-points) actually run, at the smallest fixture.

Types are compared as CATEGORIES (float / decimal / int / str / bool /
date / timestamp / list-of-category): integer widths don't matter to
the gate's value canonicalization (str(v) is width-free), but
float-vs-decimal and list element categories do.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import TABLES

_SPARK_CAT = {
    "double": "float",
    "float": "float",
    "bigint": "int",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}

_DUCK_CAT = {
    "DOUBLE": "float",
    "FLOAT": "float",
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "HUGEINT": "int",
    "UBIGINT": "int",
    "UINTEGER": "int",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}


def _spark_cat(dt: str) -> str:
    dt = dt.strip()
    m = re.fullmatch(r"array<(.+)>", dt)
    if m:
        return f"list<{_spark_cat(m.group(1))}>"
    if dt.startswith("decimal"):
        return "decimal"
    return _SPARK_CAT.get(dt, dt)


def _duck_cat(dt: str) -> str:
    dt = dt.strip()
    if dt.endswith("[]"):
        return f"list<{_duck_cat(dt[:-2])}>"
    if dt.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_CAT.get(dt, dt)


def _registry():
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    return [(n, qs[n], oracles[n]) for n in qs if n in oracles]


_CASES = _registry()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name,fn,sql", _CASES, ids=[c[0] for c in _CASES])
def test_dtypes_match_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_SMOKE)
    spark_types = {c: _spark_cat(t) for c, t in sdf.dtypes}
    rel = duck.sql(sql)
    duck_types = {c: _duck_cat(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ: {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not mismatch, f"{name}: dtype category mismatch {mismatch}"
