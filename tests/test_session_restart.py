"""Session-restart safety for the shared-artifact caches (ADVICE r12 /
VERDICT r12 item 1).

Every module-level cache that pins a session-bound object (a
localCheckpoint-ed DataFrame, whose blocks die with the SparkContext)
must key by ``applicationId + sf_dir`` — not by ``sf_dir`` alone
(deterministically stale after a restart) and not by ``id(spark)``
(CPython recycles addresses, so a new session can collide with a dead
one's entry).  Caches that hold only pure Python values computed FROM
the data (``_LR_WEIGHTS_CACHE`` floats, ``_LOGREG_MODEL_PATHS`` file
paths) are session-independent by construction and stay keyed by
fixture dir.

The restart scenario cannot run inside the shared session-scoped
``spark`` fixture (stopping it would poison every later test), so the
proof runs in a subprocess: build each shared artifact in session A,
stop A, open session B in the same process, and re-answer the same
queries.  Under the pre-fix keying, session B is handed a relation
whose checkpoint blocks are gone and the action throws — this test
failed against the r12 code before the keying fix.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from conftest import REPO, SF_SMOKE

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from multithreaded_map_reduce_spark.session import get_spark

SF = {sf!r}
CONF = {{"spark.sql.warehouse.dir": {wh!r}}}


def run_artifact_consumers(spark):
    # One consumer per shared-artifact cache, cheapest registry rider:
    #   _SHINGLE_ROWS_CACHE / _RANKED_SHINGLES_CACHE (queries/dedup.py)
    #   _COGRAPH_CACHE                               (queries/graphrank.py)
    #   _IVFPQ_INDEX_CACHE / _EMB_N_CACHE            (queries/similarity.py)
    from multithreaded_map_reduce_spark.queries.dedup import dedup_containment
    from multithreaded_map_reduce_spark.queries.graphrank import (
        graph_transitivity,
    )
    from multithreaded_map_reduce_spark.queries.similarity import (
        sim_topk_ivfpq,
    )

    counts = {{}}
    counts["dedup_containment"] = dedup_containment(spark, SF).count()
    counts["graph_transitivity"] = graph_transitivity(spark, SF).count()
    counts["sim_topk_ivfpq"] = sim_topk_ivfpq(spark, SF).count()
    return counts


s1 = get_spark(app_name="restart-a", cpus=4, shuffle_partitions=4,
               extra_conf=CONF)
app1 = s1.sparkContext.applicationId
c1 = run_artifact_consumers(s1)
s1.stop()

s2 = get_spark(app_name="restart-b", cpus=4, shuffle_partitions=4,
               extra_conf=CONF)
app2 = s2.sparkContext.applicationId
assert app2 != app1, "restart must mint a fresh applicationId"
c2 = run_artifact_consumers(s2)  # throws on stale checkpoint reuse
s2.stop()

assert c1 == c2, f"restarted session diverged: {{c1}} vs {{c2}}"
print("RESTART-OK", c1)
"""


def test_shared_artifacts_survive_session_restart(tmp_path):
    script = _SCRIPT.format(
        repo=str(REPO), sf=SF_SMOKE, wh=str(tmp_path / "wh")
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"restart scenario failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    assert "RESTART-OK" in proc.stdout


def test_no_cache_keyed_by_sf_dir_alone_or_id():
    """Static lint: session-bound caches must go through
    ``artifact_cache_key``; ``id(spark)`` keying is banned repo-wide."""
    pkg = Path(REPO) / "multithreaded_map_reduce_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        text = py.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            code = line.split("#", 1)[0]
            # f-string / dict-index use of id(spark) as a key is the
            # banned pattern; prose mentions in docstrings are fine.
            if "id(spark)" in code and ("{id(spark)" in code or "[id(spark)" in code):
                offenders.append(f"{py}:{i}: id(spark) key")
        # DataFrame-holding caches must index with the composite key.
        for cache in (
            "_SHINGLE_ROWS_CACHE",
            "_RANKED_SHINGLES_CACHE",
            "_COGRAPH_CACHE",
            "_IVFPQ_INDEX_CACHE",
            "_EMB_N_CACHE",
        ):
            if f"{cache}[sf_dir]" in text:
                offenders.append(f"{py}: {cache} keyed by sf_dir alone")
    assert not offenders, offenders
