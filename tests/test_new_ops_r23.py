"""Round-13 semantics tests, batch 5: dup-cluster size histogram and
the dimension covariance audit — replayed against plain third
references."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    return ALL_QUERIES[name]


def _half_up(num: int, den: int, mult: int = 1_000_000) -> int:
    return (2 * mult * num + den) // (2 * den)


# ---------------------------------------------- dedup_cluster_histogram


def test_cluster_histogram_python_replay(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    comp = _q("dedup_clusters")(spark, SF_SMOKE).collect()
    sizes = Counter()
    for r in comp:
        sizes[r.canonical_id] += 1
    hist = Counter(sizes.values())
    n_clustered = len(comp)
    if n_docs - n_clustered > 0:
        hist[1] = hist.get(1, 0) + (n_docs - n_clustered)
    rows = {
        r.cluster_size: r
        for r in _q("dedup_cluster_histogram")(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(hist)
    for sz, n_cl in hist.items():
        got = rows[sz]
        assert got.n_clusters == n_cl
        assert got.n_docs_in == sz * n_cl
        assert got.doc_share_micros == _half_up(sz * n_cl, n_docs)
        assert got.n_removable == (0 if sz == 1 else (sz - 1) * n_cl)
    # mass identity: histogram covers every document exactly once
    assert sum(r.n_docs_in for r in rows.values()) == n_docs


# -------------------------------------------- embedding_covariance_audit


def test_covariance_audit_python_replay(spark):
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = [
        [math.floor(float(v) * 1000.0 + 0.5) for v in r.embedding]
        for r in emb
    ]
    d = len(vecs[0])
    n = len(vecs)
    s = [sum(v[i] for v in vecs) for i in range(d)]
    ss = [sum(v[i] * v[i] for v in vecs) for i in range(d)]
    vnum = [n * ss[i] - s[i] * s[i] for i in range(d)]
    sxy = defaultdict(int)
    for v in vecs:
        for i in range(d):
            for j in range(i + 1, d):
                sxy[(i, j)] += v[i] * v[j]
    scored = []
    for (i, j), xy in sxy.items():
        cov = n * xy - s[i] * s[j]
        if vnum[i] > 0 and vnum[j] > 0:
            c2 = _half_up(cov * cov, vnum[i] * vnum[j])
        else:
            c2 = None
        sign = (cov > 0) - (cov < 0)
        scored.append((c2, i, j, sign))
    top = sorted(
        scored, key=lambda t: (-(t[0] if t[0] is not None else -1), t[1], t[2])
    )[:10]
    got = sorted(
        _q("embedding_covariance_audit")(spark, SF_SMOKE).collect(),
        key=lambda r: r.rank,
    )
    assert len(got) == 10
    for want, row in zip(top, got):
        c2, i, j, sign = want
        assert (row.dim_a, row.dim_b) == (i, j)
        assert row.corr2_micros == c2
        assert row.corr_sign == sign
        assert row.n_vectors == n
    # corr-squared is a [0, 1] quantity
    for row in got:
        if row.corr2_micros is not None:
            assert 0 <= row.corr2_micros <= 1_000_000
