"""Oracle OUTPUT-TYPE lint (VERDICT r7 item 2): no oracle may emit a
DuckDB type outside the vetted set — in particular HUGEINT.

Why this exists: rounds 5-7 carried five driver-red rows whose only
defect was the oracle's *output type*. DuckDB ``sum()`` over integer
inputs silently widens to HUGEINT (int128); the local gate fetches via
``fetchall()`` (HUGEINT -> Python int, invisible) while the driver's
hasher canonicalizes int128 through an Arrow/pandas path that renders
it differently — so a value-identical result hash-mismatches. The
r7 bisection twins (``cogroup_user_activity_counts`` GREEN vs
``_sums`` RED) proved the column class; a DESCRIBE scan over all
oracles found exactly the five red rows and nothing else.

This test makes the contract structural: ``DESCRIBE`` every oracle
(binding only — no execution, so the whole registry costs seconds) and
fail on any column type outside _VETTED. Any new ``sum()`` over an
integer column must be wrapped ``CAST(... AS BIGINT)`` at the point
where it reaches the output (inner CTE casts do NOT survive a further
``sum``/``//`` — that is how curation_token_budget's ``quota``
escaped while its sibling ``kept_tokens`` was cast).
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import duck_con


def _all_oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


# Types the driver's hasher is known to canonicalize identically to the
# local fetchall() path. Anything else (HUGEINT, UHUGEINT, unsigned
# ints, intervals, structs we don't emit) must be cast explicitly.
_VETTED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}
_VETTED_RE = re.compile(
    r"^(?:"
    + "|".join(re.escape(t) for t in sorted(_VETTED, key=len, reverse=True))
    + r"|DECIMAL\(\d+,\s*\d+\))$"
)


def _check_type(t: str) -> bool:
    t = t.strip()
    # lists of vetted element types are fine (the canonicalizer recurses)
    while t.endswith("[]"):
        t = t[:-2].strip()
    return bool(_VETTED_RE.match(t))


@pytest.fixture(scope="module")
def _con():
    con = duck_con(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_all_oracles()))
def test_oracle_output_types(name: str, _con) -> None:
    sql = _all_oracles()[name]
    rows = _con.sql(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if not _check_type(typ)
    ]
    assert not bad, (
        f"oracle {name!r} emits non-vetted DuckDB output types {bad}; "
        "HUGEINT (DuckDB sum() over ints) must be CAST(... AS BIGINT) "
        "at the OUTPUT position — see rounds 5-7 driver-red postmortem"
    )
