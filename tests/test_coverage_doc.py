"""Pin COVERAGE.md's registry count to the actual registry (VERDICT r7
item 5 — the hand-edited number went stale two rounds in a row). The
doc must state the count in BOTH places it appears; updating one and
not the other fails too.
"""

from __future__ import annotations

import re
from pathlib import Path


def test_coverage_doc_count_matches_registry() -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entry

    n = len(entry.queries())
    text = (Path(__file__).resolve().parents[1] / "COVERAGE.md").read_text()

    m1 = re.search(r"all (\d+) entries have exact", text)
    m2 = re.search(r"(\d+)/(\d+) oracles", text)
    assert m1 and int(m1.group(1)) == n, (
        f"COVERAGE.md header says {m1 and m1.group(1)} entries; "
        f"registry has {n} — update the doc"
    )
    assert m2 and int(m2.group(1)) == n and int(m2.group(2)) == n, (
        f"COVERAGE.md toolkit line says {m2 and m2.group(0)}; "
        f"registry has {n} — update the doc"
    )
    # oracles must stay total: every queries() entry has an exact oracle
    assert len(entry.oracle_sql()) == n

    # SCALE.md's closing-state registry counts went stale in round 8
    # (ADVICE r8 item 3): pin every "registry A → B" arrow so the
    # NEWEST one always lands on the live registry size.
    scale = (Path(__file__).resolve().parents[1] / "SCALE.md").read_text()
    arrows = re.findall(r"registry \d+ → (\d+)", scale)
    assert arrows, "SCALE.md lost its registry-count arrows"
    assert int(arrows[-1]) == n, (
        f"SCALE.md newest registry arrow says {arrows[-1]}; "
        f"registry has {n} — update the doc"
    )


def test_readme_count_matches_registry() -> None:
    """README's architecture tree states the registry size; pin it like
    COVERAGE.md/SCALE.md (ADVICE r8 discipline: hand-edited counts go
    stale)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entry

    n = len(entry.queries())
    text = (Path(__file__).resolve().parents[1] / "README.md").read_text()
    m = re.search(r"registry: (\d+) named queries", text)
    assert m and int(m.group(1)) == n, (
        f"README says {m and m.group(1)} queries; registry has {n}"
    )
