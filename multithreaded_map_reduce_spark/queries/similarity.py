"""Similarity-search gate queries over the embeddings fixture.

Query vectors = vec_id < 5; candidates = the rest. Both the exact
brute-force top-k AND the LSH-bucketed approximate top-k have exact
DuckDB oracles (deterministic portable hyperplanes — see
operators/similarity.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_pround
from ..functions.vectors import sql_as_double, sql_cosine, sql_dot
from ..operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    sql_home_bucket,
    sql_lsh_bucket,
    sql_plane_dots,
)
from ..sources.catalog import load_table

N_QUERIES = 5
K = 5
N_PLANES = 4
DIM = 64
PROBES = 2
N_CELLS = 4
NPROBE = 2


def _split(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
    )


# Train-once shared IVFPQ index (VERDICT r9 item 3, the logreg
# _LR_WEIGHTS_CACHE pattern): sim_topk_ivfpq, sim_topk_ivfpq_rerank,
# and the recall/NDCG reports (which run BOTH rungs) each re-ran the
# identical corpus-side route→residual→codebook→encode chain — 6+
# full index builds per bench session for one deterministic artifact.
# localCheckpoint (not persist) keeps the shared relations out of the
# CacheManager, so sharing cannot leak into unrelated queries' plans;
# the dict reference deliberately pins the blocks for the process
# lifetime (bounded: codes ≈ corpus_rows × (m+2) smallints per
# fixture dir). The FAISS deployment shape: build offline, serve many.
_IVFPQ_INDEX_CACHE: dict[str, tuple] = {}


def _shared_ivfpq_index(spark: SparkSession, sf_dir: str) -> tuple:
    from ..session import artifact_cached

    def build() -> tuple:
        from ..operators.similarity import ivfpq_index

        _, c = _split(spark, sf_dir)
        cents, codebook, codes = ivfpq_index(
            c, "vec_id", "embedding", n_cells=N_CELLS, m=PQ_M, ksub=PQ_KSUB, dim=DIM
        )
        return (
            cents.localCheckpoint(eager=False),
            codebook.localCheckpoint(eager=False),
            codes.localCheckpoint(eager=False),
        )

    return artifact_cached(_IVFPQ_INDEX_CACHE, spark, sf_dir, build)


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _split(spark, sf_dir)
    return brute_force_topk(q, c, "vec_id", "embedding", k=K)


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe (2) hyperplane LSH — recall recovery with one extra
    probed bucket per query, still oracle-exact."""
    q, c = _split(spark, sf_dir)
    return lsh_topk(
        q, c, "vec_id", "embedding", k=K, n_planes=N_PLANES, dim=DIM, probes=PROBES
    )


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat with deterministic centroids, probing nprobe/n_cells of
    the data — the inverted-list ANN shape, oracle-exact.

    Recall honesty: this fixture's embeddings are near-uniform on the
    64-d sphere (within-label cosine maxes ≈ 0.47), so spatial cells
    concentrate true neighbors only weakly — measured recall@5 vs brute
    force is 15/25 at (4 cells, nprobe 2), i.e. ~60% while scanning
    ~50% of candidates (asserted in tests/test_similarity.py). On real
    clustered embeddings the same operator concentrates far better;
    multi-table LSH (sim_topk_lsh) is the fixture's stronger ANN."""
    q, c = _split(spark, sf_dir)
    return ivf_topk(
        q, c, "vec_id", "embedding", k=K, n_cells=N_CELLS, nprobe=NPROBE
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_topk_lsh": sim_topk_lsh,
    "sim_topk_ivf": sim_topk_ivf,
}

_COS = sql_pround(sql_cosine("q.qv", "c.cv"), 6)

ORACLES = {
    "sim_topk_bruteforce": f"""
        WITH q AS (
            SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), c AS (
            SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ), scored AS (
            SELECT query_id, neighbor_id, {_COS} AS cos_sim FROM c, q
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {K}
    """,
    "sim_topk_ivf": f"""
        WITH q AS (
            SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), c AS (
            SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ), cents AS (
            SELECT neighbor_id AS cid, cv AS centroid
            FROM c ORDER BY neighbor_id LIMIT {N_CELLS}
        ), cells AS (
            SELECT cid, neighbor_id, cv FROM (
                SELECT c.neighbor_id, c.cv, cents.cid,
                       row_number() OVER (
                           PARTITION BY c.neighbor_id
                           ORDER BY {sql_cosine('c.cv', 'cents.centroid')} DESC,
                                    cents.cid ASC
                       ) AS rn
                FROM c, cents
            ) WHERE rn = 1
        ), probes AS (
            SELECT query_id, qv, cid FROM (
                SELECT q.query_id, q.qv, cents.cid,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {sql_cosine('q.qv', 'cents.centroid')} DESC,
                                    cents.cid ASC
                       ) AS rn
                FROM q, cents
            ) WHERE rn <= {NPROBE}
        ), scored AS (
            SELECT query_id, neighbor_id,
                   {sql_pround(sql_cosine('probes.qv', 'cells.cv'), 6)} AS cos_sim
            FROM cells JOIN probes USING (cid)
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {K}
    """,
    "sim_topk_lsh": f"""
        WITH q0 AS (
            SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), qd AS (
            SELECT query_id, qv, {sql_plane_dots('qv', N_PLANES, DIM)} AS dots FROM q0
        ), qh AS (
            SELECT query_id, qv, dots, {sql_home_bucket('dots', N_PLANES)} AS home FROM qd
        ), q AS (
            SELECT query_id, qv, unnest([
                home,
                xor(home, CAST(1 << (list_position(
                    list_transform(dots, d -> abs(d)),
                    list_min(list_transform(dots, d -> abs(d)))) - 1) AS BIGINT))
            ]) AS bucket
            FROM qh
        ), c AS (
            SELECT vec_id AS neighbor_id, cv, {sql_lsh_bucket('cv', N_PLANES, DIM)} AS bucket
            FROM (SELECT vec_id, {sql_as_double('embedding')} AS cv
                  FROM embeddings WHERE vec_id >= {N_QUERIES})
        ), scored AS (
            SELECT query_id, neighbor_id, {_COS} AS cos_sim
            FROM c JOIN q ON c.bucket = q.bucket
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {K}
    """,
}


def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized brute force — integer-code dot products rescaled
    by per-vector scales (operators/similarity.quantized_topk)."""
    from ..operators.similarity import quantized_topk

    q, c = _split(spark, sf_dir)
    return quantized_topk(q, c, "vec_id", "embedding", k=K)


QUERIES["sim_topk_quantized"] = sim_topk_quantized

from ..functions.vectors import (  # noqa: E402
    sql_idot as _sql_idot,
    sql_int8_scale as _sql_int8_scale,
    sql_quantize_int8 as _sql_quantize_int8,
)

ORACLES["sim_topk_quantized"] = f"""
    WITH qv AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS v
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), cv AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS v
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), q AS (
        SELECT query_id, {_sql_int8_scale('v')} AS qs,
               {_sql_quantize_int8('v', _sql_int8_scale('v'))} AS qq
        FROM qv
    ), c AS (
        SELECT neighbor_id, {_sql_int8_scale('v')} AS cs,
               {_sql_quantize_int8('v', _sql_int8_scale('v'))} AS cq
        FROM cv
    ), scored AS (
        SELECT query_id, neighbor_id,
               {_sql_idot('qq', 'cq')} AS qdot,
               (CAST({_sql_idot('qq', 'cq')} AS DOUBLE) * qs) * cs AS _raw
        FROM c, q
    )
    SELECT query_id, neighbor_id, qdot, {sql_pround('_raw', 6)} AS score, rank
    FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY _raw DESC, neighbor_id ASC
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {K}
"""


# ---------------------------------------------------------------------------
# Two-level (coarse -> fine) IVF — the assignment-cost rung above flat
# IVF: n·(k_c + k_f/k_c) distance evals instead of n·k_f (operator
# docstring has the full ladder). Constants sized so the hierarchy is
# real on the fixture: 16 fine cells in 4 coarse groups, probe 2+2.

N_FINE = 16
N_COARSE = 4
NPROBE2_C = 2
NPROBE2_F = 2


def sim_topk_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf2_topk

    q, c = _split(spark, sf_dir)
    return ivf2_topk(
        q,
        c,
        "vec_id",
        "embedding",
        k=K,
        n_fine=N_FINE,
        n_coarse=N_COARSE,
        nprobe_coarse=NPROBE2_C,
        nprobe_fine=NPROBE2_F,
    )


QUERIES["sim_topk_ivf2"] = sim_topk_ivf2

ORACLES["sim_topk_ivf2"] = f"""
    WITH q AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), fine AS (
        SELECT neighbor_id AS fid, cv AS fcent
        FROM c ORDER BY neighbor_id LIMIT {N_FINE}
    ), coarse AS (
        SELECT neighbor_id AS gid, cv AS gcent
        FROM c ORDER BY neighbor_id LIMIT {N_COARSE}
    ), fine_map AS (
        SELECT gid, fid, fcent FROM (
            SELECT fine.fid, fine.fcent, coarse.gid,
                   row_number() OVER (
                       PARTITION BY fine.fid
                       ORDER BY {sql_cosine('fine.fcent', 'coarse.gcent')} DESC,
                                coarse.gid ASC
                   ) AS rn
            FROM fine, coarse
        ) WHERE rn = 1
    ), grouped AS (
        SELECT neighbor_id, cv, gid FROM (
            SELECT c.neighbor_id, c.cv, coarse.gid,
                   row_number() OVER (
                       PARTITION BY c.neighbor_id
                       ORDER BY {sql_cosine('c.cv', 'coarse.gcent')} DESC,
                                coarse.gid ASC
                   ) AS rn
            FROM c, coarse
        ) WHERE rn = 1
    ), cells AS (
        SELECT fid, neighbor_id, cv FROM (
            SELECT g.neighbor_id, g.cv, fm.fid,
                   row_number() OVER (
                       PARTITION BY g.neighbor_id
                       ORDER BY {sql_cosine('g.cv', 'fm.fcent')} DESC,
                                fm.fid ASC
                   ) AS rn
            FROM grouped g JOIN fine_map fm USING (gid)
        ) WHERE rn = 1
    ), qgroups AS (
        SELECT query_id, qv, gid FROM (
            SELECT q.query_id, q.qv, coarse.gid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {sql_cosine('q.qv', 'coarse.gcent')} DESC,
                                coarse.gid ASC
                   ) AS rn
            FROM q, coarse
        ) WHERE rn <= {NPROBE2_C}
    ), probed AS (
        SELECT query_id, qv, fid FROM (
            SELECT qg.query_id, qg.qv, fm.fid,
                   row_number() OVER (
                       PARTITION BY qg.query_id
                       ORDER BY {sql_cosine('qg.qv', 'fm.fcent')} DESC,
                                fm.fid ASC
                   ) AS rn
            FROM qgroups qg JOIN fine_map fm USING (gid)
        ) WHERE rn <= {NPROBE2_F}
    ), scored AS (
        SELECT query_id, neighbor_id,
               {sql_pround(sql_cosine('probed.qv', 'cells.cv'), 6)} AS cos_sim
        FROM cells JOIN probed USING (fid)
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {K}
"""


# ---------------------------------------------------------------------------
# k-means (round 5): iterative Lloyd's in exact integer units.
# operators/kmeans.py holds the algorithm + scale notes; the oracle below
# unrolls the identical iteration chain as CTEs (the pagerank discipline),
# so assignments, tie-breaks AND centroid arithmetic are all hash-checked.

KM_K = 8
KM_ITERS = 3


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_assign(emb, "vec_id", "embedding", k=KM_K, iters=KM_ITERS)
    return out.select(
        F.col("id").alias("vec_id"),
        F.col("cluster"),
        F.col("dist").alias("dist_sq_iu"),
    )


QUERIES["kmeans_embeddings"] = kmeans_embeddings


def _sql_kmeans(k: int | str, iters: int) -> str:
    """``k`` may be an int literal or a SQL scalar expression (e.g. a
    subquery computing cells from the corpus count — the adaptive-IVF
    variant); it is spliced only into the c0 init predicate."""
    parts = [
        f"""WITH dims AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   -- explicit DOUBLE cast: DuckDB evaluates FLOAT*DOUBLE in
                   -- float precision, which rounds differently at ~.5
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS v
            FROM embeddings
        ), c0 AS (
            SELECT CAST(vec_id AS INTEGER) AS cluster, i, v
            FROM dims WHERE vec_id < {k}
        )"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""", a{t} AS (
            SELECT d.vec_id, c.cluster,
                   CAST(sum((d.v - c.v) * (d.v - c.v)) AS BIGINT) AS dist
            FROM dims d JOIN c{t - 1} c USING (i)
            GROUP BY 1, 2
        ), s{t} AS (
            SELECT vec_id, cluster, dist FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cluster) AS rn
                FROM a{t}
            ) WHERE rn = 1
        )"""
        )
        if t < iters:
            parts.append(
                f""", c{t} AS (
            SELECT s.cluster, d.i,
                   CAST(floor(CAST(sum(d.v) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS v
            FROM s{t} s JOIN dims d USING (vec_id)
            GROUP BY 1, 2
        )"""
            )
    parts.append(
        f"""
        SELECT vec_id, cluster, dist AS dist_sq_iu FROM s{iters}"""
    )
    return "".join(parts)


ORACLES["kmeans_embeddings"] = _sql_kmeans(KM_K, KM_ITERS)


# ---------------------------------------------------------------------------
# IVF with LEARNED centroids: the k-means trainer (operators/kmeans.py)
# supplies the coarse quantizer — the production IVF path the plain
# sim_topk_ivf stubs with id-picked centroids. Routing (train + assign +
# probe) is exact integer math; only the final in-cell ranking is the
# pround'd cosine. The oracle replays train/route/rank end-to-end.

KMIVF_CELLS = 8
KMIVF_ROUNDS = 2
KMIVF_NPROBE = 2


def sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import pround
    from ..functions.vectors import as_double, cosine
    from ..operators.kmeans import (
        _sq_dist,
        assign_to_centroids,
        kmeans_centroids,
        quantized_vectors,
    )

    q, c = _split(spark, sf_dir)
    cents = kmeans_centroids(c, "vec_id", "embedding", k=KMIVF_CELLS, rounds=KMIVF_ROUNDS)
    cells = assign_to_centroids(
        quantized_vectors(c, "vec_id", "embedding"), cents
    ).select(F.col("id").alias("neighbor_id"), F.col("cluster").alias("cid"))
    qvec = quantized_vectors(q, "vec_id", "embedding")
    wq = W.partitionBy("query_id").orderBy("dist", "cid")
    probed = (
        qvec.crossJoin(F.broadcast(cents))
        .select(
            F.col("id").alias("query_id"),
            F.col("cluster").alias("cid"),
            _sq_dist("qvec", "cvec").alias("dist"),
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= KMIVF_NPROBE)
        .select("query_id", "cid")
    )
    cd = c.select(F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv"))
    qd = q.select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv"))
    scored = (
        cells.join(F.broadcast(probed), "cid")
        .join(cd, "neighbor_id")
        .join(F.broadcast(qd), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            pround(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= K)


QUERIES["sim_topk_ivf_kmeans"] = sim_topk_ivf_kmeans


def _sql_ivf_kmeans(k_cells: int = KMIVF_CELLS, rounds: int = KMIVF_ROUNDS) -> str:
    ctes = [
        f"""WITH cand AS (SELECT * FROM embeddings WHERE vec_id >= {N_QUERIES}),
        qry AS (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}),
        dims AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS v
            FROM cand
        ), qdims AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS v
            FROM qry
        ), init_ids AS (
            SELECT vec_id,
                   CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                       AS cluster
            FROM (SELECT vec_id FROM cand ORDER BY vec_id LIMIT {k_cells})
        ), c0 AS (
            SELECT ii.cluster, d.i, d.v
            FROM init_ids ii JOIN dims d USING (vec_id)
        )"""
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f""", a{t} AS (
            SELECT d.vec_id, c.cluster,
                   CAST(sum((d.v - c.v) * (d.v - c.v)) AS BIGINT) AS dist
            FROM dims d JOIN c{t - 1} c USING (i)
            GROUP BY 1, 2
        ), s{t} AS (
            SELECT vec_id, cluster FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cluster) AS rn
                FROM a{t}
            ) WHERE rn = 1
        ), c{t} AS (
            SELECT s.cluster, d.i,
                   CAST(floor(CAST(sum(d.v) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS v
            FROM s{t} s JOIN dims d USING (vec_id)
            GROUP BY 1, 2
        )"""
        )
    return (
        "".join(ctes)
        + f""", cells AS (
            SELECT vec_id AS neighbor_id, cluster AS cid FROM (
                SELECT d.vec_id, c.cluster, row_number() OVER (
                    PARTITION BY d.vec_id
                    ORDER BY sum((d.v - c.v) * (d.v - c.v)), c.cluster) AS rn
                FROM dims d JOIN c{rounds} c USING (i)
                GROUP BY d.vec_id, c.cluster
            ) WHERE rn = 1
        ), probed AS (
            SELECT vec_id AS query_id, cluster AS cid FROM (
                SELECT d.vec_id, c.cluster, row_number() OVER (
                    PARTITION BY d.vec_id
                    ORDER BY sum((d.v - c.v) * (d.v - c.v)), c.cluster) AS rn
                FROM qdims d JOIN c{rounds} c USING (i)
                GROUP BY d.vec_id, c.cluster
            ) WHERE rn <= {KMIVF_NPROBE}
        ), scored AS (
            SELECT p.query_id, ce.neighbor_id,
                   {sql_pround(sql_cosine(sql_as_double('q.embedding'), sql_as_double('c.embedding')), 6)}
                       AS cos_sim
            FROM probed p
            JOIN cells ce ON p.cid = ce.cid
            JOIN qry q ON q.vec_id = p.query_id
            JOIN cand c ON c.vec_id = ce.neighbor_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {K}"""
    )


ORACLES["sim_topk_ivf_kmeans"] = _sql_ivf_kmeans()


SPARSE_DF_CAP = 50  # drop stopword-ish terms occurring in > 50 docs
SPARSE_MIN_COSINE_NUM = 1  # threshold handled integer-exactly below


def sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector similarity join via an INVERTED INDEX — the
    term-at-a-time route to document cosine similarity that never
    materializes dense vectors or an all-pairs product: postings
    (term → (doc, tf)) self-join ON THE TERM, partial products
    ``tf_a·tf_b`` aggregate per pair, and only co-occurring pairs ever
    exist. Raw term-frequency weights keep every comparison in exact
    BIGINT arithmetic: the cosine ≥ 0.5 decision is taken on the
    integer form 4·num² ≥ ‖a‖²·‖b‖² — no float boundary — and the
    reported cosine spends exactly three IEEE ops (sqrt, mul... — see
    below) identically on both engines.

    Terms with document frequency > SPARSE_DF_CAP are dropped from the
    index on BOTH sides (the classic stopword guard): a term in half
    the corpus would contribute O(df²) join rows while carrying no
    discriminative signal. The cap is part of the operator's contract
    and the oracle replays it.

    100 TB: the only data-sized shuffles are term-keyed (postings
    build + join) and pair-keyed (partial-product agg, map-side
    combinable). Hot terms are excluded by the df cap, which bounds
    per-term join fan-out at df² ≤ 2500; AQE skew-join covers the
    stragglers below the cap.
    """
    from ..functions.rounding import pround
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.col("doc_id").alias("id"), F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    post = tf.join(dfreq.filter(F.col("df") <= SPARSE_DF_CAP), "tok")
    norms = post.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("nrm"))
    a, b = post.alias("a"), post.alias("b")
    num = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("num"))
    )
    scored = (
        num.join(norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .filter(4 * F.col("num") * F.col("num") >= F.col("na") * F.col("nb"))
    )
    return scored.select(
        "id_a",
        "id_b",
        pround(
            F.col("num").cast("double")
            / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
            6,
        ).alias("cosine"),
    )


QUERIES["sparse_cosine_pairs"] = sparse_cosine_pairs

from ..functions.hashing import sql_tokens as _sql_toks  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pr  # noqa: E402

ORACLES["sparse_cosine_pairs"] = f"""
    WITH tf AS (
        SELECT doc_id AS id, unnest({_sql_toks('text')}) AS tok
        FROM documents
    ), tfc AS (
        SELECT id, tok, count(*) AS tf FROM tf GROUP BY id, tok
    ), dfreq AS (
        SELECT tok FROM tfc GROUP BY tok HAVING count(*) <= {SPARSE_DF_CAP}
    ), post AS (
        SELECT tfc.id, tfc.tok, tfc.tf FROM tfc JOIN dfreq USING (tok)
    ), norms AS (
        SELECT id, CAST(sum(tf * tf) AS BIGINT) AS nrm FROM post GROUP BY id
    ), num AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(sum(a.tf * b.tf) AS BIGINT) AS num
        FROM post a JOIN post b ON a.tok = b.tok AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           {_sql_pr('CAST(num AS DOUBLE) / sqrt(CAST(na.nrm * nb.nrm AS DOUBLE))', 6)}
               AS cosine
    FROM num
    JOIN norms na ON num.id_a = na.id
    JOIN norms nb ON num.id_b = nb.id
    WHERE 4 * num * num >= na.nrm * nb.nrm
"""


def kmeans_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality report — the evaluation step after training:
    per cluster, member count, exact total intra-cluster squared
    distance, exact total distance-to-NEAREST-OTHER-centroid, and the
    separation ratio (higher = better separated; the centroid-based
    simplified-silhouette statistic). Distances are the same exact
    BIGINT micro-unit squares as kmeans_embeddings; the only float op
    is the final ratio division (one IEEE op on two exact factors,
    stats_covar discipline).

    Scale: one broadcast-centroid score pass over N (the N×k products
    stay JVM-side), two id-keyed aggregations, one k-row report — the
    assignment pass is shared shape with kmeans itself."""
    from ..operators.kmeans import (
        _sq_dist,
        kmeans_centroids,
        quantized_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = quantized_vectors(emb, "vec_id", "embedding")
    cent = kmeans_centroids(emb, "vec_id", "embedding", k=KM_K, rounds=KM_ITERS - 1)
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        "id", "cluster", _sq_dist("qvec", "cvec").alias("dist")
    )
    assigned = (
        scored.groupBy("id")
        .agg(F.min(F.struct("dist", "cluster")).alias("best"))
        .select(
            "id",
            F.col("best.cluster").alias("a_cluster"),
            F.col("best.dist").alias("a_dist"),
        )
    )
    nearest_other = (
        scored.join(assigned, "id")
        .filter(F.col("cluster") != F.col("a_cluster"))
        .groupBy("id")
        .agg(F.min("dist").alias("b_dist"))
    )
    from ..functions.rounding import pround

    return (
        assigned.join(nearest_other, "id")
        .groupBy(F.col("a_cluster").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a_dist").alias("sum_intra_sq_iu"),
            F.sum("b_dist").alias("sum_nearest_other_sq_iu"),
        )
        .select(
            "cluster",
            "n",
            "sum_intra_sq_iu",
            "sum_nearest_other_sq_iu",
            F.when(
                F.col("sum_intra_sq_iu") > 0,
                pround(
                    F.col("sum_nearest_other_sq_iu").cast("double")
                    / F.col("sum_intra_sq_iu").cast("double"),
                    6,
                ),
            ).alias("separation_ratio"),
        )
    )


QUERIES["kmeans_quality_report"] = kmeans_quality_report


def _kmeans_quality_oracle() -> str:
    base = _sql_kmeans(KM_K, KM_ITERS)
    tail = f"""
        SELECT vec_id, cluster, dist AS dist_sq_iu FROM s{KM_ITERS}"""
    assert base.endswith(tail)
    it = KM_ITERS
    return base[: -len(tail)] + f""", nearest_other AS (
            SELECT a.vec_id, min(a.dist) AS b_dist
            FROM a{it} a JOIN s{it} t USING (vec_id)
            WHERE a.cluster != t.cluster
            GROUP BY 1
        ), rep AS (
            SELECT s.cluster, count(*) AS n,
                   CAST(sum(s.dist) AS BIGINT) AS sum_intra_sq_iu,
                   CAST(sum(o.b_dist) AS BIGINT) AS sum_nearest_other_sq_iu
            FROM s{it} s JOIN nearest_other o USING (vec_id)
            GROUP BY 1
        )
        SELECT cluster, n, sum_intra_sq_iu, sum_nearest_other_sq_iu,
               CASE WHEN sum_intra_sq_iu > 0 THEN
                   {sql_pround('CAST(sum_nearest_other_sq_iu AS DOUBLE)'
                               ' / CAST(sum_intra_sq_iu AS DOUBLE)', 6)}
               END AS separation_ratio
        FROM rep
    """


ORACLES["kmeans_quality_report"] = _kmeans_quality_oracle()


# k-NN SELF-join: every embedding row is both query and candidate —
# the all-pairs retrieval/index-build shape (operators/similarity.py
# knn_join_ivf has the 100 TB argument: equi-join on cell id, no
# broadcast of the data relation, n_cells ∝ √n).
#
# Round 11: the √n law is now APPLIED, not just documented — the r11
# decade probe measured 6.4× wall at 10× vectors under the old FIXED
# 32-cell grid (pair work n²/cells is quadratic when cells freeze).
# n_cells = max(32, ⌈√n⌉) balances assignment (n·cells) against the
# pair stage (n²·nprobe/cells) at the classic O(n^1.5) IVF point. The
# count() is a bounded 1-row driver action (the sanctioned class); the
# oracle replays the identical cell count via a LIMIT subquery, and
# every fixture SF keeps ⌈√n⌉ ≤ 32 so gate results are unchanged.

KNN_K = 3
KNN_CELLS = 32
KNN_NPROBE = 2


def _knn_cells(n: int) -> int:
    import math

    return max(KNN_CELLS, math.isqrt(max(n, 1) - 1) + 1 if n else KNN_CELLS)


#: (session id, sf_dir) -> embeddings row count. n_cells is a
#: plan-build literal (it sizes the centroid LIMIT), so it cannot be a
#: column — but the count need not be a fresh job per call either
#: (VERDICT r11 item 6): a production deployment reads it from the
#: table's persisted stats; here the fixture parquet is immutable for
#: a session's lifetime, so one metadata-count per (session, dir) is
#: the same contract. Keyed by applicationId (not recyclable
#: ``id(spark)`` — ADVICE r12) so a restarted session re-reads.
_EMB_N_CACHE: dict[str, int] = {}


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    from ..session import artifact_cached

    return artifact_cached(
        _EMB_N_CACHE,
        spark,
        sf_dir,
        lambda: load_table(spark, sf_dir, "embeddings").count(),
    )


#: (applicationId, sf_dir) -> lazily localCheckpoint-ed kNN relation.
_KNN_GRAPH_CACHE: dict[str, DataFrame] = {}


def _build_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCACHED IVF kNN self-join — plan contracts inspect this
    (the cached artifact's lineage truncates to an ExistingRDD scan
    once materialized, by design)."""
    from ..operators.similarity import knn_join_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join_ivf(
        emb,
        "vec_id",
        "embedding",
        k=KNN_K,
        n_cells=_knn_cells(_emb_count(spark, sf_dir)),
        nprobe=KNN_NPROBE,
        dim=DIM,
    )


def _knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once shared kNN-graph artifact (r13 OPT, the
    _supplier_cograph pattern): the THREE kNN-graph audit queries —
    hubness, Two-NN intrinsic dimension, and the kNN outlier report —
    each read this same deterministic n·k relation, and each
    previously re-ran the full IVF assign+probe+pair search per call
    (~3-4 s each at sf0.1). One lazy localCheckpoint per (session,
    fixture dir) pays the search once; the audits become single
    aggregates over its output. ``knn_join_embeddings`` itself (the
    primary search query) deliberately does NOT ride the cache — its
    bench row keeps measuring the search, not a checkpoint scan.
    Keyed by applicationId (not recyclable ``id(spark)`` — ADVICE
    r12) so a restarted session rebuilds."""
    from ..session import artifact_cached

    return artifact_cached(
        _KNN_GRAPH_CACHE,
        spark,
        sf_dir,
        lambda: _build_knn_graph(spark, sf_dir).localCheckpoint(eager=False),
    )


def knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _build_knn_graph(spark, sf_dir)


QUERIES["knn_join_embeddings"] = knn_join_embeddings

ORACLES["knn_join_embeddings"] = f"""
    WITH v AS (
        SELECT vec_id AS id, {sql_as_double('embedding')} AS v FROM embeddings
    ), cents AS (
        SELECT id AS cid, v AS centroid FROM v ORDER BY id
        LIMIT (SELECT greatest({KNN_CELLS},
                               CAST(ceil(sqrt(count(*))) AS BIGINT))
               FROM v)
    ), ranked AS (
        SELECT id, v, cid,
               row_number() OVER (
                   PARTITION BY id
                   ORDER BY {sql_cosine('v.v', 'cents.centroid')} DESC, cents.cid ASC
               ) AS rn
        FROM v, cents
    ), homes AS (
        SELECT cid, id AS neighbor_id, v AS cv FROM ranked WHERE rn = 1
    ), probes AS (
        SELECT cid, id AS query_id, v AS qv FROM ranked WHERE rn <= {KNN_NPROBE}
    ), scored AS (
        SELECT query_id, neighbor_id,
               {sql_pround(sql_cosine('probes.qv', 'homes.cv'), 6)} AS cos_sim
        FROM homes JOIN probes USING (cid)
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {KNN_K}
"""


# ------------------------------------------------- ANN recall evaluation
# The evaluation loop a production ANN deployment runs continuously:
# recall@K of the approximate retriever against the exact brute force,
# per query. Composable here as ONE differentially-verified query
# precisely because both retrievers are deterministic with exact
# oracles — the metric's oracle nests the two pipeline oracles and
# recomputes the same intersection. n_retrieved < K is possible (an
# LSH probe set can under-fill) and is part of the report, not hidden.
# Scale: both inputs are per-query top-K relations (bounded rows); the
# join/agg below is O(queries × K) regardless of corpus size.


# The evaluated ladder: every approximate rung with its own exact gate
# oracle gets a continuous recall row (VERDICT r5 item 4 — previously
# only the LSH rung was reported).
_RECALL_RUNGS: list[str] = ["lsh", "ivf2", "pq", "ivfpq"]


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround as _pr

    rung_fns = {
        "lsh": sim_topk_lsh,
        "ivf2": sim_topk_ivf2,
        "pq": sim_topk_pq,
        "ivfpq": sim_topk_ivfpq,
        "ivfpq_rerank": sim_topk_ivfpq_rerank,
    }
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    base = bf.select("query_id").distinct()
    out = None
    for rung in _RECALL_RUNGS:
        ap = rung_fns[rung](spark, sf_dir).select("query_id", "neighbor_id")
        n_hit = (
            bf.intersect(ap).groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
        )
        n_ret = ap.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_retrieved"))
        rep = (
            base.join(n_ret, "query_id", "left")
            .join(n_hit, "query_id", "left")
            .select(
                F.lit(rung).alias("rung"),
                "query_id",
                F.coalesce("n_retrieved", F.lit(0)).cast("long").alias("n_retrieved"),
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                _pr(F.coalesce("n_hit", F.lit(0)).cast("double") / F.lit(K), 6).alias(
                    "recall_at_k"
                ),
            )
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["ann_recall_report"] = ann_recall_report


def _recall_oracle() -> str:
    per_rung = "\nUNION ALL\n".join(
        f"""
    SELECT '{rung}' AS rung, q.query_id,
           coalesce(nret_{rung}.n_retrieved, 0) AS n_retrieved,
           coalesce(hits_{rung}.n_hit, 0) AS n_hit,
           {sql_pround(f'coalesce(hits_{rung}.n_hit, 0)::DOUBLE / {K}', 6)}
               AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM bf) q
    LEFT JOIN nret_{rung} ON q.query_id = nret_{rung}.query_id
    LEFT JOIN hits_{rung} ON q.query_id = hits_{rung}.query_id"""
        for rung in _RECALL_RUNGS
    )
    rung_ctes = ",\n".join(
        f"""ap_{rung} AS ({ORACLES['sim_topk_' + rung]}),
    hits_{rung} AS (
        SELECT bf.query_id, count(*) AS n_hit
        FROM bf JOIN ap_{rung} ON bf.query_id = ap_{rung}.query_id
                              AND bf.neighbor_id = ap_{rung}.neighbor_id
        GROUP BY 1
    ), nret_{rung} AS (
        SELECT query_id, count(*) AS n_retrieved FROM ap_{rung} GROUP BY 1
    )"""
        for rung in _RECALL_RUNGS
    )
    return f"""
    WITH bf AS ({ORACLES['sim_topk_bruteforce']}),
    {rung_ctes}
    {per_rung}
"""


# Registered at the BOTTOM of this module (after the pq/ivfpq oracles
# it nests exist) — see the final lines.


# ------------------------------------ IVF-cell-blocked embedding dedup
# embedding_neardup blocks on the fixture's label column — a stand-in.
# This is the label-FREE production shape: the k-means coarse quantizer
# (same trained centroids as sim_topk_ivf_kmeans) partitions the space,
# every vector is assigned to its TWO nearest cells (multi-assignment:
# a near-dup pair straddling a cell boundary still shares the
# second-choice cell with high probability — the standard IVF boundary
# fix), and exact cosine verification runs within cells only. The
# candidate rule (cells + 2-assignment) IS the contract: the oracle
# replays the identical unrolled k-means chain and cell assignment, so
# recall is differentially pinned, exactly the minhash-LSH discipline.
# Scale: pair work is Σ|cell|² with n_cells ∝ √n; no all-pairs stage.

NEARDUP_IVF_MIN_COS = 0.35
NEARDUP_IVF_PROBE = 2
# n_cells ∝ √n, NOT the 8-cell analytics quantizer: pair work is
# Σ|cell|² ≈ 2·(probe·n)²/k, so k=8 at sf0.1 (5k vectors) meant ~6M
# cosine pairs (14.5 s warm); k=32 cuts it 4× (~3.5 s) and the ratio
# improves with scale as k grows with √n.
NEARDUP_IVF_CELLS = 32


def _neardup_ivf_pairs(
    spark: SparkSession, sf_dir: str, n_cells: int
) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import pround
    from ..functions.vectors import as_double, cosine
    from ..operators.kmeans import (
        _sq_dist,
        kmeans_centroids,
        quantized_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = quantized_vectors(emb, "vec_id", "embedding")
    cent = kmeans_centroids(
        emb, "vec_id", "embedding", k=n_cells, rounds=KM_ITERS - 1
    )
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        "id", "cluster", _sq_dist("qvec", "cvec").alias("dist")
    )
    w = W.partitionBy("id").orderBy("dist", "cluster")
    cells = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NEARDUP_IVF_PROBE)
        .select("id", "cluster")
    )
    pairs = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    dv = emb.select(F.col("vec_id").alias("id"), as_double(F.col("embedding")).alias("v"))
    return (
        pairs.join(dv.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(dv.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            pround(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEARDUP_IVF_MIN_COS)
    )


def embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _neardup_ivf_pairs(spark, sf_dir, NEARDUP_IVF_CELLS)


QUERIES["embedding_neardup_ivf"] = embedding_neardup_ivf


def _auto_cells(n_vectors: int) -> int:
    """Adaptive IVF cell count: max(8, isqrt(n)).

    The r5 10× scale probe measured the fixed-cell variant blowing up
    53× on 10× data — with k fixed, in-cell pair work is Σ|cell|² ≈
    (probe·n)²/k, quadratic in n. k ∝ √n balances the two stages
    (assignment crossJoin is n·k = n^1.5; in-cell pairs are n²/k =
    n^1.5), the classic single-level-IVF optimum — total work n^1.5
    instead of n². (Beyond that, a two-level coarse→fine quantizer
    makes assignment n·√k; out of scope here.)
    """
    import math

    return max(8, math.isqrt(n_vectors))


AUTO_CELLS_SQL = (
    "(SELECT GREATEST(8, CAST(floor(sqrt(count(*))) AS BIGINT)) "
    "FROM embeddings)"
)


def embedding_neardup_ivf_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair mining with the cell count chosen FROM THE DATA:
    k = max(8, isqrt(n)). The one driver-side read is the corpus
    count (metadata-only on parquet — the same one-scalar class as
    the convergence/argmax reads); everything else is the
    embedding_neardup_ivf plan with that k.

    Python's exact ``math.isqrt`` and the oracle's
    ``floor(sqrt(count))`` agree for any feasible corpus size: IEEE
    sqrt is correctly rounded, and the nearest boundary case
    (n = k²−1 rounding up to k) needs ulp(k) > 1/(2k), i.e. n ≳ 2⁵²."""
    n = load_table(spark, sf_dir, "embeddings").count()
    return _neardup_ivf_pairs(spark, sf_dir, _auto_cells(n))


QUERIES["embedding_neardup_ivf_auto"] = embedding_neardup_ivf_auto


def _neardup_ivf_oracle(cells: int | str = NEARDUP_IVF_CELLS) -> str:
    base = _sql_kmeans(cells, KM_ITERS)
    tail = f"""
        SELECT vec_id, cluster, dist AS dist_sq_iu FROM s{KM_ITERS}"""
    assert base.endswith(tail)
    it = KM_ITERS
    return base[: -len(tail)] + f""", cells AS (
            SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cluster) AS rn
                FROM a{it}
            ) WHERE rn <= {NEARDUP_IVF_PROBE}
        ), prs AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM cells a JOIN cells b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        ), dv AS (
            SELECT vec_id AS id, {sql_as_double('embedding')} AS v FROM embeddings
        )
        SELECT id_a, id_b, cos_sim FROM (
            SELECT prs.id_a, prs.id_b,
                   {sql_pround(sql_cosine('x.v', 'y.v'), 6)} AS cos_sim
            FROM prs JOIN dv x ON prs.id_a = x.id JOIN dv y ON prs.id_b = y.id
        ) WHERE cos_sim >= {NEARDUP_IVF_MIN_COS}
    """


ORACLES["embedding_neardup_ivf"] = _neardup_ivf_oracle()
ORACLES["embedding_neardup_ivf_auto"] = _neardup_ivf_oracle(AUTO_CELLS_SQL)


# ---------------------------------------------------------------------------
# Product quantization + ADC (round 5): the compression rung above the
# int8 scalar quantizer — m=4 one-byte codes per vector instead of 64
# int8 coordinates; scoring is m table lookups per pair instead of a
# dim-length dot. The oracle replays codebook -> encode -> LUT -> the
# exact nested-list ADC fold, so the approximate RANKING is under the
# exact gate (operator docstring: operators/similarity.pq_topk).

# m=16 × ksub=32 measured best on the near-uniform fixture (recall@5
# 12/25 vs 2/25 at m=4·ksub=8 — finer subspaces dominate here because
# untrained small codebooks quantize coarse subspaces to near-noise);
# still 16 one-byte codes vs 256 float32 bytes per vector.
PQ_M = 16
PQ_KSUB = 32
PQ_DSUB = DIM // PQ_M


def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_topk

    q, c = _split(spark, sf_dir)
    return pq_topk(q, c, "vec_id", "embedding", k=K, m=PQ_M, ksub=PQ_KSUB, dim=DIM)


QUERIES["sim_topk_pq"] = sim_topk_pq


def _sql_l2sq(a: str, b: str) -> str:
    """Σ (a_i - b_i)² as the same ascending left fold Spark's
    zip_with/aggregate evaluates — bit-identical doubles."""
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (x, y) -> x + y)"
    )


def _sql_pq(m: int = PQ_M, ksub: int = PQ_KSUB, dsub: int = PQ_DSUB, k: int = K) -> str:
    sub = f"cv[j * {dsub} + 1 : j * {dsub} + {dsub}]"
    qsub = f"qv[j * {dsub} + 1 : j * {dsub} + {dsub}]"
    adc = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {m} + 1), i -> lut[i][codes[i] + 1])), "
        "(x, y) -> x + y)"
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), subspaces AS (
        SELECT unnest(range(0, {m})) AS j
    ), book AS (
        SELECT CAST(row_number() OVER (ORDER BY neighbor_id) - 1 AS INTEGER) AS code, cv
        FROM (SELECT neighbor_id, cv FROM c ORDER BY neighbor_id LIMIT {ksub})
    ), codebook AS (
        SELECT j, code, {sub} AS cent FROM book, subspaces
    ), cand_subs AS (
        SELECT neighbor_id, j, {sub} AS sub FROM c, subspaces
    ), enc AS (
        SELECT neighbor_id, j, code FROM (
            SELECT cs.neighbor_id, cs.j, cb.code,
                   row_number() OVER (
                       PARTITION BY cs.neighbor_id, cs.j
                       ORDER BY {_sql_l2sq('cs.sub', 'cb.cent')} ASC, cb.code ASC
                   ) AS rn
            FROM cand_subs cs JOIN codebook cb USING (j)
        ) WHERE rn = 1
    ), codes AS (
        SELECT neighbor_id, list(code ORDER BY j) AS codes FROM enc GROUP BY neighbor_id
    ), q_subs AS (
        SELECT query_id, j, {qsub} AS sub FROM q, subspaces
    ), lut_rows AS (
        SELECT query_id, j, code, {sql_dot('qs.sub', 'cb.cent')} AS ip
        FROM q_subs qs JOIN codebook cb USING (j)
    ), lut_j AS (
        SELECT query_id, j, list(ip ORDER BY code) AS lrow
        FROM lut_rows GROUP BY query_id, j
    ), lut AS (
        SELECT query_id, list(lrow ORDER BY j) AS lut FROM lut_j GROUP BY query_id
    ), scored AS (
        SELECT query_id, neighbor_id, {sql_pround(adc, 6)} AS adc_score
        FROM codes, lut
    )
    SELECT query_id, neighbor_id, adc_score, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


ORACLES["sim_topk_pq"] = _sql_pq()


# ---------------------------------------------------------------------------
# IVF + residual PQ (round 5): the FAISS IVFPQ composition — route with
# inverted lists, score probed candidates as <q,centroid> (exact, one
# per probed cell) + residual ADC (O(m) per pair). Residual encoding is
# what makes the untrained codebook usable: residuals concentrate
# around 0. Operator docstring: operators/similarity.ivfpq_topk.


def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_topk

    q, c = _split(spark, sf_dir)
    return ivfpq_topk(
        q, c, "vec_id", "embedding",
        k=K, n_cells=N_CELLS, nprobe=NPROBE, m=PQ_M, ksub=PQ_KSUB, dim=DIM,
        index=_shared_ivfpq_index(spark, sf_dir),
    )


QUERIES["sim_topk_ivfpq"] = sim_topk_ivfpq


def _sql_ivfpq(
    n_cells: int = N_CELLS,
    nprobe: int = NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dsub: int = PQ_DSUB,
    k: int = K,
) -> str:
    sub = f"rv[j * {dsub} + 1 : j * {dsub} + {dsub}]"
    qsub = f"qv[j * {dsub} + 1 : j * {dsub} + {dsub}]"
    adc = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {m} + 1), i -> lut[i][codes[i] + 1])), "
        "(x, y) -> x + y)"
    )
    residual = (
        "list_transform(range(1, len(cv) + 1), i -> cv[i] - centroid[i])"
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), cents AS (
        SELECT neighbor_id AS cid, cv AS centroid
        FROM c ORDER BY neighbor_id LIMIT {n_cells}
    ), cells AS (
        SELECT cid, neighbor_id, {residual} AS rv FROM (
            SELECT c.neighbor_id, c.cv, cents.cid, cents.centroid,
                   row_number() OVER (
                       PARTITION BY c.neighbor_id
                       ORDER BY {sql_cosine('c.cv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM c, cents
        ) WHERE rn = 1
    ), subspaces AS (
        SELECT unnest(range(0, {m})) AS j
    ), book AS (
        SELECT CAST(row_number() OVER (ORDER BY neighbor_id) - 1 AS INTEGER) AS code, rv
        FROM (SELECT neighbor_id, rv FROM cells ORDER BY neighbor_id LIMIT {ksub})
    ), codebook AS (
        SELECT j, code, {sub} AS cent FROM book, subspaces
    ), cand_subs AS (
        SELECT cid, neighbor_id, j, {sub} AS sub FROM cells, subspaces
    ), enc AS (
        SELECT cid, neighbor_id, j, code FROM (
            SELECT cs.cid, cs.neighbor_id, cs.j, cb.code,
                   row_number() OVER (
                       PARTITION BY cs.neighbor_id, cs.j
                       ORDER BY {_sql_l2sq('cs.sub', 'cb.cent')} ASC, cb.code ASC
                   ) AS rn
            FROM cand_subs cs JOIN codebook cb USING (j)
        ) WHERE rn = 1
    ), codes AS (
        SELECT cid, neighbor_id, list(code ORDER BY j) AS codes
        FROM enc GROUP BY cid, neighbor_id
    ), probes AS (
        SELECT query_id, qv, cid, qdotcent FROM (
            SELECT q.query_id, q.qv, cents.cid,
                   {sql_dot('q.qv', 'cents.centroid')} AS qdotcent,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {sql_cosine('q.qv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM q, cents
        ) WHERE rn <= {nprobe}
    ), q_subs AS (
        SELECT query_id, j, {qsub} AS sub FROM q, subspaces
    ), lut_rows AS (
        SELECT query_id, j, code, {sql_dot('qs.sub', 'cb.cent')} AS ip
        FROM q_subs qs JOIN codebook cb USING (j)
    ), lut_j AS (
        SELECT query_id, j, list(ip ORDER BY code) AS lrow
        FROM lut_rows GROUP BY query_id, j
    ), lut AS (
        SELECT query_id, list(lrow ORDER BY j) AS lut FROM lut_j GROUP BY query_id
    ), scored AS (
        SELECT p.query_id, codes.neighbor_id,
               {sql_pround('p.qdotcent + ' + adc, 6)} AS approx_dot
        FROM codes JOIN probes p USING (cid) JOIN lut ON lut.query_id = p.query_id
    )
    SELECT query_id, neighbor_id, approx_dot, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id ASC
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


ORACLES["sim_topk_ivfpq"] = _sql_ivfpq()


# ------------------------------------- two-stage retrieval (ADC -> exact)
# The production serving shape FAISS/ScaNN deploy: the quantized index
# ranks CHEAPLY (O(m) ADC per candidate over nprobe/n_cells of the
# corpus), then only the top-R survivors per query are re-scored with
# the EXACT metric against their full vectors. Stage 2 touches R rows
# per query — R·dim floats, independent of corpus size — so the 16x
# code-bandwidth saving of PQ is kept for the bulk scan while the final
# ranking is exact over the candidate set (ADC ordering errors inside
# the top-R are repaired for free). Gate-exact end to end: stage 1 is
# the ivfpq oracle at k=R, stage 2 an exact-cosine re-rank both engines
# replay identically.

RERANK_R = 15  # 3x K approximate candidates feed the exact stage


def sim_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import pround
    from ..functions.vectors import as_double, cosine
    from ..operators.similarity import ivfpq_topk

    q, c = _split(spark, sf_dir)
    cand = ivfpq_topk(
        q, c, "vec_id", "embedding",
        k=RERANK_R, n_cells=N_CELLS, nprobe=NPROBE, m=PQ_M, ksub=PQ_KSUB, dim=DIM,
        index=_shared_ivfpq_index(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    qv = q.select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv"))
    cv = c.select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            pround(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= K)
    )


QUERIES["sim_topk_ivfpq_rerank"] = sim_topk_ivfpq_rerank

ORACLES["sim_topk_ivfpq_rerank"] = f"""
    WITH approx AS ({_sql_ivfpq(k=RERANK_R)}),
    q AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), rescored AS (
        SELECT a.query_id, a.neighbor_id,
               {sql_pround(sql_cosine('q.qv', 'c.cv'), 6)} AS cos_sim
        FROM approx a
        JOIN q ON a.query_id = q.query_id
        JOIN c ON a.neighbor_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS INTEGER) AS rank
        FROM rescored
    ) WHERE rank <= {K}
"""

# Deferred: nests the lsh/ivf2/pq/ivfpq(+rerank) oracles defined above.
_RECALL_RUNGS.append("ivfpq_rerank")
ORACLES["ann_recall_report"] = _recall_oracle()


# ------------------------------------------------------------ MMR re-ranking
# Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedy top-k
# that trades relevance against redundancy — score(i) = λ·rel(i) −
# (1−λ)·max_{s∈S} sim(i, s). The serving-side diversifier that follows
# ANN retrieval in RAG/search stacks (the result list shouldn't be k
# near-copies of the same document).
#
# Exactness rails: relevance and candidate-pair similarities are
# snapped to integer micros JVM-SIDE; the greedy itself (genuinely
# sequential — each pick depends on all previous picks, the sanctioned
# applyInPandas case) compares only int64s, with λ = 7/10 applied as
# integer 7·rel − 3·maxsim. Ties break on min neighbor_id. The oracle
# unrolls the identical k steps as CTEs.
#
# Scale: candidates are bounded at MMR_R per query before the greedy,
# so the pandas stage sees R rows + R²/2 pair sims per query group —
# O(queries · R²) total, independent of corpus size; the expensive part
# (retrieval) stays in the JVM plans above. This is the FAISS→rerank→
# diversify serving shape.

MMR_R = 10  # candidate pool per query (from exact cosine top-R)
MMR_K = 3  # diversified results per query
MMR_LAM_NUM, MMR_LAM_DEN = 7, 10  # λ = 0.7 in exact tenths


def _mmr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded per-query pool: exact-cosine top-R with candidate
    vectors attached — the JVM-side heavy stage (query side broadcast,
    TakeOrdered-per-key via window; plan-contract-tested)."""
    from ..functions.rounding import iunits
    from ..functions.vectors import as_double, cosine
    from pyspark.sql import Window as W

    q, c = _split(spark, sf_dir)
    qd = q.select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv"))
    cd = c.select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    )
    scored = cd.crossJoin(F.broadcast(qd)).select(
        "query_id",
        "neighbor_id",
        "cv",
        iunits(cosine(F.col("qv"), F.col("cv")), 6).alias("rel_micros"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("rel_micros"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= MMR_R
    )


def _mmr_greedy(key, cands, prs):
    """Per-query MMR greedy (module-level so the edge cases are unit-
    testable — ADVICE r7). NULL micros (zero-norm embedding -> NULL
    cosine) would make int(...) raise and fail the whole job: a null
    relevance drops the candidate; a null pair-sim is treated as 0 by
    simply not entering the dict (max(..., default=0)). A pool smaller
    than MMR_K emits what exists instead of del-ing a None key."""
    import pandas as pd

    rel = {
        int(r.neighbor_id): int(r.rel_micros)
        for r in cands.itertuples()
        if pd.notna(r.rel_micros)
    }
    sim: dict[tuple[int, int], int] = {}
    for r in prs.itertuples():
        if pd.isna(r.sim_micros):
            continue
        ia, ib, s = int(r.id_a), int(r.id_b), int(r.sim_micros)
        sim[(ia, ib)] = s
        sim[(ib, ia)] = s
    selected: list[int] = []
    rows = []
    remaining = dict(rel)
    for step in range(1, MMR_K + 1):
        if not remaining:  # < MMR_K candidates: emit what exists
            break
        best_id, best_score = None, None
        for i in sorted(remaining):  # sorted => min-id tie-break
            mx = max((sim.get((i, s), 0) for s in selected), default=0)
            score = MMR_LAM_NUM * remaining[i] - (
                MMR_LAM_DEN - MMR_LAM_NUM
            ) * mx
            if best_score is None or score > best_score:
                best_id, best_score = i, score
        rows.append((key[0], best_id, step, best_score))
        selected.append(best_id)
        del remaining[best_id]
    return pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "mmr_rank", "score_units"]
    )


def sim_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..functions.vectors import cosine

    cand = _mmr_candidates(spark, sf_dir)
    a = cand.select(
        "query_id", F.col("neighbor_id").alias("id_a"), F.col("cv").alias("cva")
    ).alias("ma")
    b = cand.select(
        "query_id", F.col("neighbor_id").alias("id_b"), F.col("cv").alias("cvb")
    ).alias("mb")
    pairs = (
        a.join(b, F.col("ma.query_id") == F.col("mb.query_id"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("ma.query_id").alias("query_id"),
            "id_a",
            "id_b",
            iunits(cosine(F.col("cva"), F.col("cvb")), 6).alias("sim_micros"),
        )
    )

    return (
        cand.select("query_id", "neighbor_id", "rel_micros")
        .groupBy("query_id")
        .cogroup(pairs.groupBy("query_id"))
        .applyInPandas(
            _mmr_greedy,
            "query_id long, neighbor_id long, mmr_rank int, score_units long",
        )
    )


QUERIES["sim_topk_mmr"] = sim_topk_mmr


def _sql_mmr() -> str:
    """Unrolled greedy: cand/psim CTEs + one (score, pick, remaining)
    round per MMR step, all integer micros."""
    lam, dlam = MMR_LAM_NUM, MMR_LAM_DEN - MMR_LAM_NUM
    cos_units = f"CAST(floor(({sql_cosine('q.qv', 'c.cv')}) * 1000000.0 + 0.5) AS BIGINT)"
    pair_units = (
        f"CAST(floor(({sql_cosine('x.cv', 'y.cv')}) * 1000000.0 + 0.5) AS BIGINT)"
    )
    # one (scored, pick) CTE pair per greedy step; pick{t} carries the
    # selected ids s1..st forward
    parts = []
    for t in range(1, MMR_K + 1):
        excl = (
            " AND ".join(
                f"c.neighbor_id != pk.s{j}" for j in range(1, t)
            )
            or "TRUE"
        )
        if t == 1:
            mx = "CAST(0 AS BIGINT)"
            fromrow = "cand c, (SELECT 1) pk"
        else:
            mx = "greatest(" + ", ".join(
                f"(SELECT p.sim_micros FROM psim p WHERE p.query_id = c.query_id"
                f" AND ((p.id_a = c.neighbor_id AND p.id_b = pk.s{j})"
                f" OR (p.id_b = c.neighbor_id AND p.id_a = pk.s{j})))"
                for j in range(1, t)
            ) + ")"
            fromrow = f"cand c JOIN pick{t - 1} pk USING (query_id)"
        parts.append(
            f"""sc{t} AS (
        SELECT c.query_id, c.neighbor_id,
               {lam} * c.rel_micros - {dlam} * ({mx}) AS score_units
        FROM {fromrow}
        WHERE {excl}
    ), pick{t} AS (
        SELECT {('pk.* EXCLUDE (query_id), ' if t > 1 else '')}s.query_id,
               s.neighbor_id AS s{t}, s.score_units AS u{t}
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score_units DESC, neighbor_id ASC) AS rn
            FROM sc{t}
        ) s {(f'JOIN pick{t - 1} pk USING (query_id)' if t > 1 else '')}
        WHERE s.rn = 1
    )"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT query_id, s{t} AS neighbor_id, CAST({t} AS INTEGER) AS mmr_rank,"
        f" u{t} AS score_units FROM pick{MMR_K}"
        for t in range(1, MMR_K + 1)
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), cv AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), cand AS MATERIALIZED (
        SELECT query_id, neighbor_id, rel_micros FROM (
            SELECT q.query_id, c.neighbor_id, {cos_units} AS rel_micros,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {cos_units} DESC, c.neighbor_id ASC) AS rn
            FROM cv c, q
        ) WHERE rn <= {MMR_R}
    ), psim AS MATERIALIZED (
        SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
               {pair_units} AS sim_micros
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
        JOIN cv x ON x.neighbor_id = a.neighbor_id
        JOIN cv y ON y.neighbor_id = b.neighbor_id
    ), {','.join(parts)}
    {selects}
"""


ORACLES["sim_topk_mmr"] = _sql_mmr()


# ----------------------------------------------- day-2 streaming ANN index
# Persisted day-1 IVF artifact for the STREAMING similarity scorer
# (round 8): centroids = the first ANNP_CELLS corpus vectors by vec_id
# (the sim_topk_ivf deterministic-centroid convention), assignments =
# argmax-cosine cell per corpus vector — both parquet, built once per
# fixture dir (the _LOGREG_MODEL_PATHS staleness contract). cid IS the
# centroid's vec_id (no synthetic numbering to keep in sync).

_ANN_INDEX_PATHS: dict[str, tuple[str, str]] = {}
ANNP_CELLS = 4
ANNP_NPROBE = 2
ANNP_K = 3


def ann_index_paths(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    from ..session import path_cached

    return path_cached(_ANN_INDEX_PATHS, sf_dir, lambda: _build_ann_index(spark, sf_dir))


def _build_ann_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    from pyspark.sql import Window as W

    from ..functions.vectors import as_double, cosine, norm_sq
    from .connectors import _fixture_path

    cent_path = _fixture_path("ann_centroids")
    idx_path = _fixture_path("ann_index")
    # norm² > 0 filter: a zero-norm vector makes cosine 0/0, which
    # is NaN in Spark (sorts FIRST under desc) but NULL in DuckDB
    # (sorts LAST under DESC) — such a vector would land in the
    # OPPOSITE cell per engine. Excluding degenerate vectors on
    # both sides makes the argmax ordering key total and
    # engine-identical (embedding_norm_stats is the audit that
    # counts them).
    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 != 0)
        .select("vec_id", as_double("embedding").alias("cv"))
        .filter(norm_sq(F.col("cv")) > 0)
    )
    cents = (
        corpus.orderBy("vec_id")
        .limit(ANNP_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("cv").alias("centroid"))
    )
    cents.write.mode("overwrite").parquet(cent_path)
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(
            F.desc(cosine(F.col("cv"), F.col("centroid"))), F.asc("cid")
        )
    )
    (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select("cid", F.col("vec_id").alias("neighbor_id"), "cv")
        .write.mode("overwrite")
        .parquet(idx_path)
    )
    return (cent_path, idx_path)


# ---------------------------------------------------------- NDCG report
# Position-sensitive companion to ann_recall_report: binary-relevance
# NDCG@K of every ANN rung against the exact brute-force top-K. Recall
# says WHETHER the true neighbors were returned; NDCG says whether they
# were returned EARLY — a rung that finds all K neighbors but ranks
# them bottom-of-list scores recall 1.0 and NDCG well under 1.0, which
# is exactly the serving-quality difference between an index that
# needs a re-rank stage and one that doesn't (ivfpq vs ivfpq_rerank
# makes the pair visible). Determinism rail: the discount weights
# W_i = round(1e9 / log2(i+1)) are PYTHON-precomputed integer literals
# shared verbatim by both engines — no runtime log/division exists —
# so DCG is an exact BIGINT sum and NDCG the house half-up rational
# (IDCG = ΣW is a constant: binary relevance makes the ideal ranking
# any permutation of the K true neighbors).
#
# Scale: per rung one (query_id, neighbor_id) hash join against the
# brute-force relation and one per-query sum — the report costs K rows
# per query per rung beyond the rungs themselves.

_NDCG_RUNGS: list[str] = ["lsh", "ivf2", "pq", "ivfpq", "ivfpq_rerank"]
_NDCG_W: list[int] = [
    int(math.floor(1e9 / math.log2(i + 1) + 0.5)) for i in range(1, K + 1)
]
_NDCG_IDCG: int = sum(_NDCG_W)


def ann_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    rung_fns = {
        "lsh": sim_topk_lsh,
        "ivf2": sim_topk_ivf2,
        "pq": sim_topk_pq,
        "ivfpq": sim_topk_ivfpq,
        "ivfpq_rerank": sim_topk_ivfpq_rerank,
    }
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    base = bf.select("query_id").distinct()
    warr = F.array(*[F.lit(w) for w in _NDCG_W])
    out = None
    for rung in _NDCG_RUNGS:
        ap = rung_fns[rung](spark, sf_dir).select(
            "query_id", "neighbor_id", "rank"
        )
        dcg = (
            ap.join(bf, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("n_hit"),
                F.sum(F.element_at(warr, F.col("rank"))).alias("dcg_units"),
            )
        )
        rep = base.join(dcg, "query_id", "left").select(
            F.lit(rung).alias("rung"),
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.coalesce("dcg_units", F.lit(0)).cast("long").alias("dcg_units"),
            ratio_micros(
                "coalesce(dcg_units, 0)", str(_NDCG_IDCG)
            ).alias("ndcg_micros"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["ann_ndcg_report"] = ann_ndcg_report


def _ndcg_oracle() -> str:
    from ..functions.rounding import sql_ratio_micros

    wlist = "[" + ", ".join(str(w) for w in _NDCG_W) + "]"
    rung_ctes = ",\n".join(
        f"""napp_{rung} AS ({ORACLES['sim_topk_' + rung]}),
    ndcg_{rung} AS (
        SELECT bf.query_id, count(*) AS n_hit,
               sum({wlist}[a.rank]) AS dcg_units
        FROM bf JOIN napp_{rung} a
          ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
        GROUP BY 1
    )"""
        for rung in _NDCG_RUNGS
    )
    per_rung = "\nUNION ALL\n".join(
        f"""
    SELECT '{rung}' AS rung, q.query_id,
           CAST(coalesce(n.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(n.dcg_units, 0) AS BIGINT) AS dcg_units,
           {sql_ratio_micros('coalesce(n.dcg_units, 0)', str(_NDCG_IDCG))}
               AS ndcg_micros
    FROM (SELECT DISTINCT query_id FROM bf) q
    LEFT JOIN ndcg_{rung} n ON q.query_id = n.query_id"""
        for rung in _NDCG_RUNGS
    )
    return f"""
    WITH bf AS ({ORACLES['sim_topk_bruteforce']}),
    {rung_ctes}
    {per_rung}
"""


ORACLES["ann_ndcg_report"] = _ndcg_oracle()


# ------------------------------------------------- late-interaction MaxSim
# ColBERT-style late interaction (Khattab & Zaharia 2020) re-expressed
# on the fixture's single-vector schema: each 64-d embedding is read as
# 4 contiguous 16-d sub-vectors ("token" vectors), and relevance is
# MaxSim — for every query sub-vector take its best cosine over the
# candidate's sub-vectors, then SUM the four maxima. The multi-vector
# plumbing (slice → per-sub cosine → greatest → snapped sum) is exactly
# what a real token-level late-interaction scorer runs per (query,
# candidate) pair; only the sub-vector source is simulated, which keeps
# the op under the exact differential gate. Each per-sub maximum is
# snapped to integer micros BEFORE the sum, so the score is an exact
# BIGINT and the (score desc, neighbor_id) ranking is total. A
# zero-norm SUB-vector (possible even when the whole vector passes the
# norm audit) scores 0.0 via an explicit CASE on both engines — the
# NaN-vs-NULL ordering hazard (ann_index_paths) cannot reach the sort.
#
# Scale: brute MaxSim is the crossJoin rail (broadcast queries ×
# candidate scan — linear per query, SUBS² cosines per pair); the
# serving path composes with the IVF router unchanged (route on the
# whole vector or a pooled centroid, MaxSim-score the probed cells
# only), which is how ColBERT-v2/PLAID deploy it.

MAXSIM_SUBS = 4
MAXSIM_SUBDIM = 16


def sim_topk_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import iunits
    from ..functions.vectors import as_double, cosine, norm_sq

    q, c = _split(spark, sf_dir)
    qd = q.select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv"))
    cd = c.select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    )

    def sub(col: str, j: int):
        return F.slice(F.col(col), 1 + MAXSIM_SUBDIM * j, MAXSIM_SUBDIM)

    def safe_cos(a, b):
        return F.when(
            (norm_sq(a) > F.lit(0.0)) & (norm_sq(b) > F.lit(0.0)), cosine(a, b)
        ).otherwise(F.lit(0.0))

    score = None
    for j in range(MAXSIM_SUBS):
        best = F.greatest(
            *[safe_cos(sub("qv", j), sub("cv", l)) for l in range(MAXSIM_SUBS)]
        )
        term = iunits(best, 6)
        score = term if score is None else score + term
    scored = cd.crossJoin(F.broadcast(qd)).select(
        "query_id", "neighbor_id", score.alias("score_micros")
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("score_micros"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= K)


QUERIES["sim_topk_maxsim"] = sim_topk_maxsim


def _maxsim_oracle() -> str:
    def s_sub(col: str, j: int) -> str:
        return f"list_slice({col}, {1 + MAXSIM_SUBDIM * j}, {MAXSIM_SUBDIM * (j + 1)})"

    def s_nsq(e: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform({e}, x -> x * x)), (x, y) -> x + y)"
        )

    def s_safe_cos(a: str, b: str) -> str:
        return (
            f"(CASE WHEN {s_nsq(a)} > 0 AND {s_nsq(b)} > 0"
            f" THEN {sql_cosine(a, b)} ELSE 0.0 END)"
        )

    terms = []
    for j in range(MAXSIM_SUBS):
        cands = ", ".join(
            s_safe_cos(f"qs{j}", f"cs{l}") for l in range(MAXSIM_SUBS)
        )
        terms.append(
            f"CAST(floor(greatest({cands}) * 1000000.0 + 0.5) AS BIGINT)"
        )
    score = " + ".join(f"({t})" for t in terms)
    qsubs = ", ".join(
        f"{s_sub('qv', j)} AS qs{j}" for j in range(MAXSIM_SUBS)
    )
    csubs = ", ".join(
        f"{s_sub('cv', j)} AS cs{j}" for j in range(MAXSIM_SUBS)
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), qs AS (
        SELECT query_id, {qsubs} FROM q
    ), cs AS (
        SELECT neighbor_id, {csubs} FROM c
    ), scored AS (
        SELECT query_id, neighbor_id, {score} AS score_micros
        FROM cs, qs
    )
    SELECT query_id, neighbor_id, score_micros,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY score_micros DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    ) WHERE rank <= {K}
"""

ORACLES["sim_topk_maxsim"] = _maxsim_oracle()


# -------------------------------------- persisted-IVFPQ day-2 serving
# Round 10: the batch twin of the dedup day-2 discipline
# (dedup_incremental_day2 / minhash_probe_index) on the ANN rail — the
# IVFPQ index artifacts (centroids, PQ codebook, PQ codes) are WRITTEN
# ONCE as parquet and every later query batch PROBES the files: zero
# corpus scans, zero training per batch, which is the actual FAISS
# production separation (train offline, mmap + serve). The cold bench
# rep pays the one-time build+write; warm reps measure the probe-only
# cost a serving tier would see. Bit-identical to sim_topk_ivfpq
# (doubles round-trip parquet exactly; same oracle text) — the gate
# proves the persisted artifacts ARE the in-memory index.

_IVFPQ_PARQUET_PATHS: dict[str, tuple[str, str, str]] = {}


def ivfpq_parquet_paths(spark: SparkSession, sf_dir: str) -> tuple[str, str, str]:
    from ..session import path_cached

    def build() -> tuple[str, str, str]:
        from ..operators.similarity import ivfpq_index
        from .connectors import _fixture_path

        _, c = _split(spark, sf_dir)
        cents, codebook, codes = ivfpq_index(
            c, "vec_id", "embedding", n_cells=N_CELLS, m=PQ_M, ksub=PQ_KSUB, dim=DIM
        )
        paths = (
            _fixture_path("ivfpq_cents"),
            _fixture_path("ivfpq_codebook"),
            _fixture_path("ivfpq_codes"),
        )
        cents.write.mode("overwrite").parquet(paths[0])
        codebook.write.mode("overwrite").parquet(paths[1])
        codes.write.mode("overwrite").parquet(paths[2])
        return paths

    return path_cached(_IVFPQ_PARQUET_PATHS, sf_dir, build)


def sim_topk_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_topk

    cp, bp, dp = ivfpq_parquet_paths(spark, sf_dir)
    index = (
        spark.read.parquet(cp),
        spark.read.parquet(bp),
        spark.read.parquet(dp),
    )
    q, c = _split(spark, sf_dir)
    return ivfpq_topk(
        q, c, "vec_id", "embedding",
        k=K, n_cells=N_CELLS, nprobe=NPROBE, m=PQ_M, ksub=PQ_KSUB, dim=DIM,
        index=index,
    )


QUERIES["sim_topk_ivfpq_persisted"] = sim_topk_ivfpq_persisted

ORACLES["sim_topk_ivfpq_persisted"] = _sql_ivfpq()


# ------------------------------------------- kNN-distance outlier report
# Round 10: distance-based outlier mining on the embedding corpus —
# the curation screen that drops vectors nothing else resembles
# (mislabeled scrapes, encoding failures, off-distribution content)
# before they poison nearest-neighbor training signals. Score = the
# k-th-NN cosine from the knn_join rail (lower = more isolated), with
# probe underfill surfaced (n_found < K) and never-matched vectors
# ranked MOST isolated (NULLS FIRST) instead of silently dropped — the
# report's whole point is the vectors retrieval can't reach.
#
# Scale: rides knn_join_ivf (salted cell join, norms hoisted — the
# bench's 2.8 s rail); the report adds one per-query aggregate, a
# |vectors|-row left join, and a TakeOrdered(OUTLIER_N).

OUTLIER_N = 20


def embedding_knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    knn = _knn_graph(spark, sf_dir)
    agg = knn.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_found"),
        F.min("cos_sim").alias("kth_cos_sim"),
    )
    spine = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("query_id"))
    )
    scored = spine.join(agg, "query_id", "left").select(
        F.col("query_id").alias("vec_id"),
        F.coalesce("n_found", F.lit(0)).cast("long").alias("n_found"),
        "kth_cos_sim",
    )
    w = W.orderBy(
        F.asc_nulls_first("kth_cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= OUTLIER_N)
    )


QUERIES["embedding_knn_outliers"] = embedding_knn_outliers

ORACLES["embedding_knn_outliers"] = f"""
    WITH knn AS ({ORACLES['knn_join_embeddings']}),
    agg AS (
        SELECT query_id,
               CAST(count(*) AS BIGINT) AS n_found,
               min(cos_sim) AS kth_cos_sim
        FROM knn GROUP BY query_id
    ), scored AS (
        SELECT e.vec_id,
               CAST(coalesce(agg.n_found, 0) AS BIGINT) AS n_found,
               agg.kth_cos_sim
        FROM embeddings e LEFT JOIN agg ON e.vec_id = agg.query_id
    )
    SELECT vec_id, n_found, kth_cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            ORDER BY kth_cos_sim ASC NULLS FIRST, vec_id ASC
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {OUTLIER_N}
"""


# ------------------------------------------- Matryoshka truncation
MRL_DIMS = [8, 16, 32]


def sim_matryoshka_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation eval (Kusupati 2022): recall@K of
    brute-force cosine retrieval when vectors are truncated to their
    first d dimensions, against the full-dim truth — the table that
    decides how small an MRL-trained embedding can serve at (d/D)× the
    index cost. A dimension prefix IS the MRL contract; no re-embed,
    just `slice`.

    Exactness: every rung is the exact brute-force rail (pround-6
    cosine, (score, id) tiebreak); recall counts are pure pair-set
    intersections. Scale: each rung is one broadcast-queries scan of
    the candidate set — at production scale the truncated rungs are
    the CHEAP ones (O(d) arithmetic per pair)."""
    from ..functions.rounding import pround as _pr

    q, c = _split(spark, sf_dir)
    # r13 OPT: the full-dim truth relation is referenced by EVERY rung
    # (|MRL_DIMS| intersects) plus the query spine — without a
    # materialization the full brute-force scan re-runs per rung
    full = (
        sim_topk_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    base = full.select("query_id").distinct()
    out = None
    for d in MRL_DIMS:
        qd = q.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        cd = c.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        ap = brute_force_topk(qd, cd, "vec_id", "embedding", k=K).select(
            "query_id", "neighbor_id"
        )
        n_hit = (
            full.intersect(ap)
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        rep = base.join(n_hit, "query_id", "left").select(
            F.lit(d).alias("dim"),
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            _pr(
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.lit(K), 6
            ).alias("recall_at_k"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["sim_matryoshka_report"] = sim_matryoshka_report


def _mrl_oracle() -> str:
    def rung(d: int) -> str:
        cos = sql_pround(sql_cosine("q.qv", "c.cv"), 6)
        return f"""
    SELECT {d} AS dim, b.query_id,
           coalesce(h_{d}.n_hit, 0) AS n_hit,
           {sql_pround(f'coalesce(h_{d}.n_hit, 0)::DOUBLE / {K}', 6)}
               AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM full_topk) b
    LEFT JOIN (
        SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_hit
        FROM full_topk f
        JOIN (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY {sql_pround('cos_sim_raw', 6)} DESC,
                                    neighbor_id ASC) AS rank
                FROM (
                    SELECT q.query_id, c.neighbor_id,
                           {sql_cosine("q.qv", "c.cv")} AS cos_sim_raw
                    FROM (SELECT vec_id AS query_id,
                                 {sql_as_double(f'embedding[1:{d}]')} AS qv
                          FROM embeddings WHERE vec_id < {N_QUERIES}) q,
                         (SELECT vec_id AS neighbor_id,
                                 {sql_as_double(f'embedding[1:{d}]')} AS cv
                          FROM embeddings WHERE vec_id >= {N_QUERIES}) c
                )
            ) WHERE rank <= {K}
        ) a ON f.query_id = a.query_id AND f.neighbor_id = a.neighbor_id
        GROUP BY f.query_id
    ) h_{d} ON b.query_id = h_{d}.query_id"""

    rungs = "\nUNION ALL\n".join(rung(d) for d in MRL_DIMS)
    cos_full = sql_pround(sql_cosine("q.qv", "c.cv"), 6)
    return f"""
    WITH full_topk AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
            FROM (
                SELECT q.query_id, c.neighbor_id, {cos_full} AS cos_sim
                FROM (SELECT vec_id AS query_id,
                             {sql_as_double('embedding')} AS qv
                      FROM embeddings WHERE vec_id < {N_QUERIES}) q,
                     (SELECT vec_id AS neighbor_id,
                             {sql_as_double('embedding')} AS cv
                      FROM embeddings WHERE vec_id >= {N_QUERIES}) c
            )
        ) WHERE rank <= {K}
    )
    {rungs}
"""


ORACLES["sim_matryoshka_report"] = _mrl_oracle()


# ------------------------------------------- angular concentration histogram
# Round 12: the embedding-geometry diagnostic a similarity pipeline
# runs before trusting cosine thresholds — in high dimension random
# pairs concentrate near cos ≈ 0 (the curse-of-dimensionality shell);
# a histogram of pairwise cosines says whether dedup/ANN cutoffs sit
# in the bulk or the tail, and a collapsed (anisotropic) embedding
# space shows up as mass piled in the top bins. Pairs are a
# DETERMINISTIC structured sample via id-lag equi-joins (vec_id + δ
# for fixed deltas) — O(n·|δ|) rows and plain shuffles at any scale,
# never an n² pair join, and fully replayable by the oracle (a hash
# or random sample would be neither scale-safe nor exact). Cosines
# snap to exact micro integers (iunits — the jitter-audit-patchable
# grid); bins are pure integer arithmetic on the snapped value, so
# bucket edges are engine-identical.

ANG_DELTAS = [1, 7, 97]
ANG_BINS = 10  # [-1, 1] in 0.2-wide bins


def embedding_angular_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..functions.vectors import cosine

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint(eager=False)  # one materialization, 2·|δ| join legs
    )
    pairs = None
    for d in ANG_DELTAS:
        a, b = emb.alias("a"), emb.alias("b")
        p = a.join(b, F.col("a.vec_id") + F.lit(d) == F.col("b.vec_id")).select(
            iunits(cosine(F.col("a.v"), F.col("b.v")), 6).alias("c6")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    binned = pairs.select(
        F.least(
            F.expr("(c6 + 1000000) div 200000").cast("int"),
            F.lit(ANG_BINS - 1),
        ).alias("bin")
    ).groupBy("bin").agg(F.count(F.lit(1)).alias("n_pairs"))
    spine = spark.range(ANG_BINS).select(F.col("id").cast("int").alias("bin"))
    return spine.join(binned, "bin", "left").select(
        "bin",
        (F.lit(-1_000_000) + F.col("bin") * F.lit(200_000))
        .cast("long")
        .alias("lo_micros"),
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
    )


QUERIES["embedding_angular_histogram"] = embedding_angular_histogram

from ..functions.rounding import sql_iunits as _sql_iu_ang  # noqa: E402

ORACLES["embedding_angular_histogram"] = f"""
    WITH e AS (
        SELECT vec_id, {sql_as_double('embedding')} AS v FROM embeddings
    ), deltas AS (
        SELECT unnest([{', '.join(str(d) for d in ANG_DELTAS)}]) AS d
    ), pairs AS (
        SELECT {_sql_iu_ang(sql_cosine('a.v', 'b.v'), 6)} AS c6
        FROM deltas, e a JOIN e b ON TRUE
        WHERE b.vec_id = a.vec_id + d
    ), binned AS (
        SELECT least((c6 + 1000000) // 200000, {ANG_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1
    ), spine AS (
        SELECT CAST(unnest(range(0, {ANG_BINS})) AS INTEGER) AS bin
    )
    SELECT spine.bin,
           CAST(-1000000 + spine.bin * 200000 AS BIGINT) AS lo_micros,
           CAST(coalesce(binned.n_pairs, 0) AS BIGINT) AS n_pairs
    FROM spine LEFT JOIN binned ON spine.bin = binned.bin
"""


# ----------------------------------------------------------- hubness
# Round 12: the k-occurrence skew audit of the kNN graph (Radovanović
# et al., JMLR 2010) — in high-dimensional corpora a few "hub" points
# appear in a disproportionate share of other points' neighbor lists
# while "antihubs" appear in none, and a retrieval/dedup pipeline that
# ignores this ships systematically biased neighbor evidence. N_k(x) =
# |{q : x ∈ kNN(q)}| over the SAME deterministic IVF kNN self-join the
# knn queries gate (so the audit reads the retriever actually
# deployed, not an idealized one); the readout is the N_k distribution:
# antihub/hub tallies (hub = N_k > 2k, the standard rule of thumb) and
# its exact-moment skewness — the paper's headline statistic. Exact:
# counts are integers, moment sums ride DECIMAL(38,0)/HUGEINT exactly
# as stats_skewness_kurtosis, one pround(6) at the skewness output.
# Scale: the kNN relation is n·k rows; everything after is one
# groupBy + one broadcast-joined aggregate — the audit costs one scan
# over the retriever's own output.


def embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    knn = _knn_graph(spark, sf_dir)
    cnt = knn.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("c")
    )
    per = emb.join(cnt, "vec_id", "left").select(
        F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum((d(F.col("c")) * F.col("c")).cast("decimal(38,0)")).alias("s2"),
        F.sum(
            (d(F.col("c")) * F.col("c") * F.col("c")).cast("decimal(38,0)")
        ).alias("s3"),
        F.max("c").alias("max_k_occurrence"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).alias("n_antihubs"),
        F.sum(F.when(F.col("c") > 2 * KNN_K, 1).otherwise(0)).alias("n_hubs"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    m2n2 = n * s2 - s1 * s1
    m3n3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.lit(KNN_K).cast("int").alias("k"),
        F.col("n_antihubs").cast("long").alias("n_antihubs"),
        F.col("n_hubs").cast("long").alias("n_hubs"),
        F.col("max_k_occurrence").cast("long").alias("max_k_occurrence"),
        F.when(F.col("n").cast("decimal(38,0)") * F.col("s2") == d(F.col("s1")) * F.col("s1"), F.lit(None).cast("double"))
        .otherwise(pround(m3n3 / F.sqrt(m2n2 * m2n2 * m2n2), 6))
        .alias("skewness"),
    )


QUERIES["embedding_hubness"] = embedding_hubness

ORACLES["embedding_hubness"] = f"""
    WITH knn AS ({ORACLES['knn_join_embeddings']}),
    per AS (
        SELECT CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
        FROM (SELECT vec_id FROM embeddings) allv
        LEFT JOIN (
            SELECT neighbor_id AS vec_id, count(*) AS c
            FROM knn GROUP BY 1
        ) cnt USING (vec_id)
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
               CAST(sum(CAST(c AS HUGEINT) * c * c) AS HUGEINT) AS s3,
               CAST(max(c) AS BIGINT) AS max_k_occurrence,
               CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_antihubs,
               CAST(sum(CASE WHEN c > {2 * KNN_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hubs
        FROM per
    )
    SELECT n, CAST({KNN_K} AS INTEGER) AS k, n_antihubs, n_hubs,
           max_k_occurrence,
           CASE WHEN CAST(n AS HUGEINT) * s2 = CAST(s1 AS HUGEINT) * s1
                THEN NULL
                ELSE {sql_pround(
                    '(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)'
                    '   * CAST(s3 AS DOUBLE)'
                    ' - 3 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)'
                    '   * CAST(s2 AS DOUBLE)'
                    ' + 2 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)'
                    '   * CAST(s1 AS DOUBLE))'
                    ' / sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
                    '         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
                    '        * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
                    '           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))'
                    '        * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)'
                    '           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))',
                    6)}
           END AS skewness
    FROM m
"""


# ------------------------------------------- intrinsic dimension (TwoNN)
# Round 12: the Two-NN maximum-likelihood intrinsic-dimension estimate
# (Facco, d'Errico, Rodriguez, Laio, Scientific Reports 2017) — the
# number that says whether a 64-dim embedding column actually SPANS 64
# dimensions or lives on a much lower-dimensional manifold (the
# planning input for PQ codebook sizing, RP target dims, and IVF cell
# counts). Only the two nearest neighbors per point enter:
# μ_i = r₂/r₁ and d̂ = n / Σ ln μ_i. Distances come from the SAME
# deterministic IVF kNN self-join the knn queries gate, via
# r² = 2·(1 − cos): ln μ_i = ½·(ln(1−c₂) − ln(1−c₁)) — each ln takes
# an exact 6-dp rational argument (cos_sim is pround(6)), is
# nano-snapped, and the Hill-style sum is an exact integer; d̂ is one
# half-up micros rational on DECIMAL(38,0). Queries with c₁ ≥ 1
# (exact-duplicate neighbor, r₁ = 0) or a missing second neighbor
# (under-filled probe set) are excluded and REPORTED via n_valid;
# Σ = 0 (all tied) degenerates to NULL, not ∞. Scale: one pass over
# the n·k kNN relation, one aggregate row out.


def embedding_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units_dec

    knn = _knn_graph(spark, sf_dir)
    top2 = knn.filter(F.col("rank") <= 2).groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("cos_sim"))).alias("c1"),
        F.max(F.when(F.col("rank") == 2, F.col("cos_sim"))).alias("c2"),
    )
    valid = (F.col("c1") < 1.0) & F.col("c2").isNotNull() & (F.col("c2") < 1.0)
    agg = top2.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
        F.sum(
            F.when(
                valid,
                iunits(F.log(F.lit(1.0) - F.col("c2")), 9)
                - iunits(F.log(F.lit(1.0) - F.col("c1")), 9),
            )
        ).alias("s"),
    )
    return agg.select(
        F.col("n_queries").cast("long").alias("n_queries"),
        F.col("n_valid").cast("long").alias("n_valid"),
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("sum_lnmu2_nanos"),
        F.when(
            (F.col("n_valid") == 0) | (F.coalesce(F.col("s"), F.lit(0)) <= 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            # DECIMAL-first product: a BIGINT 2e9·n_valid pre-product
            # would wrap silently in Spark at n_valid > 4.6e9 while
            # DuckDB raises — the ADVICE r11 divergent-failure class
            ratio_units_dec(
                "CAST(2000000000 AS DECIMAL(38,0)) * n_valid", "s"
            )
        )
        .alias("d_micros"),
    )


QUERIES["embedding_intrinsic_dim"] = embedding_intrinsic_dim

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_twonn,
    sql_ratio_units_dec as _sql_rud_twonn,
)

ORACLES["embedding_intrinsic_dim"] = f"""
    WITH knn AS ({ORACLES['knn_join_embeddings']}),
    top2 AS (
        SELECT query_id,
               max(CASE WHEN rank = 1 THEN cos_sim END) AS c1,
               max(CASE WHEN rank = 2 THEN cos_sim END) AS c2
        FROM knn WHERE rank <= 2 GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(CASE WHEN c1 < 1.0 AND c2 IS NOT NULL AND c2 < 1.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(coalesce(sum(CASE WHEN c1 < 1.0 AND c2 IS NOT NULL
                                       AND c2 < 1.0
                             THEN {_sql_iu_twonn('ln(1.0 - c2)', 9)}
                                - {_sql_iu_twonn('ln(1.0 - c1)', 9)}
                             END), 0) AS BIGINT) AS s
        FROM top2
    )
    SELECT n_queries, n_valid, s AS sum_lnmu2_nanos,
           CASE WHEN n_valid = 0 OR s <= 0 THEN NULL
                ELSE {_sql_rud_twonn(
                    'CAST(2000000000 AS HUGEINT) * n_valid', 's')}
           END AS d_micros
    FROM agg
"""


# ------------------------------------- nearest-centroid classification
# Round 12: the SUPERVISED eval the embeddings fixture's label column
# was missing — kmeans reads unsupervised structure, label-spread
# reads semi-supervised propagation; the nearest-centroid (Rocchio)
# classifier is the standard "are these embeddings linearly usable"
# probe a pipeline runs before spending on a trained head. Mean
# inner-product form: assign v to argmax_l ⟨v, μ_l⟩ (the MIPS
# classifier — appropriate for near-unit-norm embeddings; document,
# don't hide, that vectors score against centroids that include
# themselves — the plain resubstitution eval). Exactness: vectors
# quantize to MILLI-units (the label_spread discipline — micro-unit
# dots would overflow), centroid SUMS are exact BIGINT dim-sums,
# ⟨v, S_l⟩ is an exact BIGINT, and the argmax over labels compares
# the exact rational ⟨v,S_l⟩/n_l via a DECIMAL(38,0) fixed-point
# quotient (×10¹²) with label-ascending tie-break — deterministic in
# both engines. Output: the (true_label, pred_label) confusion
# relation. Scale: one posexplode pass for the centroid sums
# (n·d rows, label-grain out), one broadcast of L centroid arrays,
# and an n×L score relation — never n².


def embedding_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.expr(
            "transform(embedding,"
            " v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0d + 0.5d) AS BIGINT))"
        ).alias("q"),
    ).localCheckpoint(eager=False)
    pe = qv.select(
        "true_label", F.posexplode("q").alias("pos", "x")
    )
    cent = (
        pe.groupBy("true_label", "pos")
        .agg(F.sum("x").alias("s"))
        .groupBy("true_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda t: t.s,
            ).alias("cq")
        )
        .join(
            qv.groupBy("true_label").agg(F.count(F.lit(1)).alias("nl")),
            "true_label",
        )
        .select(
            F.col("true_label").alias("cand_label"),
            "cq",
            "nl",
        )
    )
    dot = (
        "aggregate(zip_with(q, cq, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (s, t) -> s + t)"
    )
    scores = qv.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "true_label",
        "cand_label",
        # offset shift: |dot/nl| <= 64e6 mathematically, so +1e8
        # makes the rational positive BEFORE the fixed-point quotient
        # — Spark div truncates toward zero while DuckDB // floors,
        # and they only agree on non-negatives (the signed-ratio
        # discipline); the shift is order-preserving
        F.expr(
            f"((CAST(({dot}) AS DECIMAL(38,0))"
            " + CAST(100000000 AS DECIMAL(38,0)) * nl)"
            " * CAST(1000000000000 AS DECIMAL(38,0)))"
            " div CAST(nl AS DECIMAL(38,0))"
        ).alias("key"),
    )
    rw = W.partitionBy("vec_id").orderBy(
        F.desc("key"), F.asc("cand_label")
    )
    pred = scores.withColumn("rn", F.row_number().over(rw)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("true_label", F.col("cand_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("true_label", "pred_label")
    )


QUERIES["embedding_centroid_classify"] = embedding_centroid_classify

ORACLES["embedding_centroid_classify"] = f"""
    WITH qv AS (
        SELECT vec_id, label AS true_label,
               list_transform({sql_as_double('embedding')},
                   v -> CAST(floor(v * 1000.0 + 0.5) AS BIGINT)) AS q
        FROM embeddings
    ), dims AS (
        SELECT vec_id, true_label,
               CAST(r.range AS INTEGER) AS pos,
               q[CAST(r.range AS INTEGER) + 1] AS x
        FROM qv, range({DIM}) r
    ), cent AS (
        SELECT true_label AS cand_label, pos,
               CAST(sum(x) AS BIGINT) AS s
        FROM dims GROUP BY 1, 2
    ), nl AS (
        SELECT true_label AS cand_label,
               CAST(count(*) AS BIGINT) AS nl
        FROM qv GROUP BY 1
    ), scores AS (
        SELECT d.vec_id, d.true_label, c.cand_label,
               ((CAST(sum(d.x * c.s) AS HUGEINT)
                 + CAST(100000000 AS HUGEINT) * max(nl.nl))
                * CAST(1000000000000 AS HUGEINT))
               // CAST(max(nl.nl) AS HUGEINT) AS key
        FROM dims d
        JOIN cent c ON d.pos = c.pos
        JOIN nl ON nl.cand_label = c.cand_label
        GROUP BY 1, 2, 3
    ), pred AS (
        SELECT vec_id, true_label, cand_label,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY key DESC, cand_label ASC
               ) AS rn
        FROM scores
    )
    SELECT true_label, cand_label AS pred_label,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM pred WHERE rn = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


# ---------------------------------------------- per-dimension variance
# Round 12: the PCA-lite dimension screen — before spending on PQ
# codebooks or Matryoshka truncation, a pipeline asks WHICH of the 64
# dimensions carry variance at all (dead dims waste code budget;
# near-constant dims should be pruned before IVF routing). Per
# dimension: exact MILLI-unit moment sums (the label_spread overflow
# discipline), population variance as one DECIMAL micros rational
# (n·Σx² − (Σx)²)/n², a rank by exact variance (dim-asc tie-break)
# and each dim's share of total variance. Scale: one posexplode pass
# to (dim)-grain — 64 rows out regardless of corpus size; the rank
# window runs over those 64 rows (dim-bounded).


def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0d + 0.5d)"
                " AS BIGINT))"
            )
        ).alias("dim", "x")
    )
    dec = "decimal(38,0)"
    per = q.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum((F.col("x").cast(dec) * F.col("x")).cast(dec)).alias("ss"),
    )
    var_num = f"(CAST(n AS {dec}) * ss - CAST(s AS {dec}) * s)"
    scored = per.select(
        "dim",
        "n",
        F.expr(var_num).alias("vnum"),
        F.expr(f"CAST(n AS {dec}) * n").alias("vden"),
    )
    tot = scored.agg(F.sum(F.expr("vnum div vden")).alias("vtot"))
    rw = W.orderBy(F.desc("vnum"), F.asc("dim"))
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("n").cast("long").alias("n_vectors"),
            ratio_units_dec("vnum", "vden").alias("variance_micros"),
            F.col("rank").cast("int").alias("variance_rank"),
            F.when(F.col("vtot") == 0, F.lit(None).cast("long"))
            .otherwise(ratio_units_dec("vnum div vden", "vtot"))
            .alias("variance_share_micros"),
        )
        .orderBy("dim")
    )


QUERIES["embedding_dim_variance"] = embedding_dim_variance

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_dv,
)

ORACLES["embedding_dim_variance"] = f"""
    WITH q AS (
        SELECT CAST(i AS INTEGER) - 1 AS dim,
               CAST(floor(v * 1000.0 + 0.5) AS BIGINT) AS x
        FROM (
            SELECT unnest({sql_as_double('embedding')}) AS v,
                   generate_subscripts({sql_as_double('embedding')}, 1) AS i
            FROM embeddings
        )
    ), per AS (
        SELECT dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
        FROM q GROUP BY 1
    ), scored AS (
        SELECT dim, n,
               CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS vnum,
               CAST(n AS HUGEINT) * n AS vden
        FROM per
    ), tot AS (
        SELECT CAST(sum(vnum // vden) AS HUGEINT) AS vtot FROM scored
    ), ranked AS (
        SELECT dim, n, vnum, vden,
               row_number() OVER (ORDER BY vnum DESC, dim ASC) AS rank
        FROM scored
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           n AS n_vectors,
           {_sql_rud_dv('vnum', 'vden')} AS variance_micros,
           CAST(rank AS INTEGER) AS variance_rank,
           CASE WHEN vtot = 0 THEN NULL
                ELSE {_sql_rud_dv('vnum // vden', 'vtot')}
           END AS variance_share_micros
    FROM ranked CROSS JOIN tot
    ORDER BY dim
"""


# -------------------------------------------------- MRR / MAP rank quality
# Round 13: the two remaining classical rank-quality metrics next to
# recall (ann_recall_report) and NDCG (ann_ndcg_report) — MRR reads
# "how early is the FIRST true neighbor" (the navigational metric),
# MAP the mean of precision-at-each-hit (the rank-sensitive recall).
# Same report shape as the siblings: every ANN rung judged per query
# against the exact brute-force top-K truth.
#
# Exactness rail: with K = 5 every AP denominator divides LCM(1..5)·K
# = 300, so AP = (1/K)·Σ_hits (hits≤r)/r becomes the exact BIGINT sum
# Σ c_i·(60/r_i) over 300 — a pure integer rational, no doubles; RR is
# round(1e6/first_rank). Both engines rank hits with the identical
# row_number over (query, rank asc), so c_i (number of true hits at or
# before the i-th hit's rank) is the window's row_number itself.
# Scale: per rung one (query_id, neighbor_id) hash join against bf +
# one K-row-per-query window — the report costs K rows per query per
# rung beyond the rungs themselves (which ride the shared IVFPQ
# artifact).

_RQ_RUNGS: list[str] = ["lsh", "ivf2", "pq", "ivfpq", "ivfpq_rerank"]
_RQ_LCM: int = 60  # lcm(1..K) for K = 5
_RQ_APDEN: int = _RQ_LCM * K  # 300


def ann_mrr_map_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_micros

    rung_fns = {
        "lsh": sim_topk_lsh,
        "ivf2": sim_topk_ivf2,
        "pq": sim_topk_pq,
        "ivfpq": sim_topk_ivfpq,
        "ivfpq_rerank": sim_topk_ivfpq_rerank,
    }
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    base = bf.select("query_id").distinct()
    out = None
    for rung in _RQ_RUNGS:
        ap = rung_fns[rung](spark, sf_dir).select(
            "query_id", "neighbor_id", "rank"
        )
        hits = ap.join(bf, ["query_id", "neighbor_id"])
        hw = W.partitionBy("query_id").orderBy("rank")
        scored = hits.withColumn("c", F.row_number().over(hw)).groupBy(
            "query_id"
        ).agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.min("rank").alias("first_hit_rank"),
            F.sum(F.col("c") * F.expr(f"{_RQ_LCM} div rank"))
            .alias("ap_units"),
        )
        rep = base.join(scored, "query_id", "left").select(
            F.lit(rung).alias("rung"),
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.coalesce("first_hit_rank", F.lit(0))
            .cast("int")
            .alias("first_hit_rank"),
            F.when(F.col("first_hit_rank").isNull(), F.lit(0))
            .otherwise(ratio_micros("1", "first_hit_rank"))
            .cast("long")
            .alias("rr_micros"),
            ratio_micros("coalesce(ap_units, 0)", str(_RQ_APDEN))
            .cast("long")
            .alias("ap_micros"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["ann_mrr_map_report"] = ann_mrr_map_report

from ..functions.rounding import sql_ratio_micros as _sql_rm_rq  # noqa: E402


def _mrr_map_oracle() -> str:
    rung_ctes = ",\n".join(
        f"""rqa_{rung} AS ({ORACLES['sim_topk_' + rung]}),
    rqs_{rung} AS (
        SELECT query_id,
               CAST(count(*) AS BIGINT) AS n_hit,
               CAST(min(rank) AS INTEGER) AS first_hit_rank,
               CAST(sum(c * ({_RQ_LCM} // rank)) AS BIGINT) AS ap_units
        FROM (
            SELECT a.query_id, a.rank,
                   row_number() OVER (
                       PARTITION BY a.query_id ORDER BY a.rank
                   ) AS c
            FROM rqa_{rung} a
            JOIN bf ON bf.query_id = a.query_id
                   AND bf.neighbor_id = a.neighbor_id
        )
        GROUP BY 1
    )"""
        for rung in _RQ_RUNGS
    )
    per_rung = "\nUNION ALL\n".join(
        f"""
    SELECT '{rung}' AS rung, q.query_id,
           CAST(coalesce(s.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(s.first_hit_rank, 0) AS INTEGER) AS first_hit_rank,
           CAST(CASE WHEN s.first_hit_rank IS NULL THEN 0
                ELSE {_sql_rm_rq('1', 's.first_hit_rank')} END
                AS BIGINT) AS rr_micros,
           CAST({_sql_rm_rq('coalesce(s.ap_units, 0)', str(_RQ_APDEN))}
                AS BIGINT) AS ap_micros
    FROM (SELECT DISTINCT query_id FROM bf) q
    LEFT JOIN rqs_{rung} s ON q.query_id = s.query_id"""
        for rung in _RQ_RUNGS
    )
    return f"""
    WITH bf AS ({ORACLES['sim_topk_bruteforce']}),
    {rung_ctes}
    {per_rung}
"""


ORACLES["ann_mrr_map_report"] = _mrr_map_oracle()


# ------------------------------------------- dimension covariance audit
# Round 13: the PAIRWISE companion to embedding_dim_variance — dead
# dims waste code budget, but REDUNDANT dims (pairs moving together)
# waste it twice and break PQ's subspace-independence assumption, so
# the pre-quantization audit asks: which dimension PAIRS are most
# correlated? Exact rail end-to-end: milli-snapped values, per-pair
# covariance numerator n·Σxy − Σx·Σy as signed DECIMAL, and the
# squared correlation corr² = covnum²/(vnum_a·vnum_b) as one micros
# rational (squares avoid the sqrt — the crest²/audio discipline),
# sign emitted alongside. Output: the top-10 most correlated pairs
# (exact-integer ordering, (corr², dims) tie-break).
# Scale: one mapInArrow pass accumulates an exact integer Gram matrix
# plus column moments per partition (O(n·d²) multiply-adds inside
# NumPy, O(d²) rows emitted per partition), so bytes shuffled are
# d²·n_partitions regardless of corpus size. Top-k is TakeOrdered; the
# rank stamp runs over the 10 surviving rows.

COV_TOPK = 10


def _cov_gram_partials(batches):
    """mapInArrow worker (guide §4.2, VERDICT r13 item 4): per-partition
    EXACT integer moment partials of the snapped embedding matrix.

    Replaces the r13 per-row upper-triangle Generate unfold (2016
    structs per row — the most expensive bench row at 4.5 s warm): one
    ``X.T @ X`` per Arrow batch in native NumPy int64, accumulated into
    an arbitrary-precision object matrix across batches, emitted once
    per partition as (da, db, v) rows:

    - ``da = -2``: v = number of rows having dimension db (the
      posexplode count);
    - ``da = -1``: v = sum of x over rows at dimension db;
    - ``da >= 0, da <= db``: v = sum of x_da·x_db (diagonal = sum x²).

    Exactness: per-chunk products are bounded so int64 cannot wrap
    (chunk rows by 2^62 / max|x|²), cross-batch accumulation is Python
    big-int, and the partials leave as DECIMAL(38,0) — Spark's final
    sum over decimals is exact and order-free, so the downstream
    correlation arithmetic is bit-identical to the unfold it replaces.
    Variable-width rows are grouped by width (a width-w row contributes
    to exactly the dims/pairs under w), matching posexplode semantics
    for degenerate arrays (ADVICE r13 item 1 is moot here: width < 2
    simply contributes no pairs)."""
    from decimal import Decimal

    import numpy as np
    import pyarrow as pa

    width_rows: dict[int, int] = {}
    colsum = np.zeros(0, dtype=object)
    gram = np.zeros((0, 0), dtype=object)

    def grow(w: int) -> None:
        nonlocal colsum, gram
        if w <= colsum.shape[0]:
            return
        cs = np.zeros(w, dtype=object)
        g = np.zeros((w, w), dtype=object)
        old = colsum.shape[0]
        if old:
            cs[:old] += colsum
            g[:old, :old] += gram
        colsum, gram = cs, g

    for batch in batches:
        arr = batch.column(0)
        offsets = arr.offsets.to_numpy()
        values = arr.values.to_numpy()
        widths = np.diff(offsets)
        if arr.null_count:
            # a NULL array posexplodes to zero rows — treat as width 0
            valid = np.asarray(arr.is_valid())
            widths = np.where(valid, widths, 0)
        for w in np.unique(widths):
            w = int(w)
            idx = np.nonzero(widths == w)[0]
            width_rows[w] = width_rows.get(w, 0) + len(idx)
            if w == 0:
                continue
            grow(w)
            if len(idx) == len(widths):
                X = values[offsets[0]: offsets[-1]].reshape(-1, w)
            else:
                X = np.stack([values[offsets[k]: offsets[k] + w] for k in idx])
            max_abs = int(np.abs(X).max()) if X.size else 0
            chunk = max(1, int(2**62 // max(1, max_abs * max_abs * w)))
            for lo in range(0, X.shape[0], chunk):
                part = X[lo: lo + chunk]
                colsum[:w] += part.sum(axis=0, dtype=np.int64).astype(object)
                gram[:w, :w] += (part.T @ part).astype(object)

    W = colsum.shape[0]
    ns = [0] * W
    for w, c in width_rows.items():
        for i in range(min(w, W)):
            ns[i] += c
    das, dbs, vs = [], [], []
    for i in range(W):
        if not ns[i]:
            continue
        das += [-2, -1]
        dbs += [i, i]
        vs += [ns[i], int(colsum[i])]
        for j in range(i, W):
            if ns[j]:
                das.append(i)
                dbs.append(j)
                vs.append(int(gram[i, j]))
    if das:
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(das, pa.int32()),
                pa.array(dbs, pa.int32()),
                pa.array([Decimal(v) for v in vs], pa.decimal128(38, 0)),
            ],
            names=["da", "db", "v"],
        )


def embedding_covariance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units_dec

    emb = load_table(spark, sf_dir, "embeddings")
    snapped = F.expr(
        "transform(embedding,"
        " v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0d + 0.5d)"
        " AS BIGINT))"
    )
    dec = "decimal(38,0)"
    # r14 OPT (guide §4.2): snap in the JVM, ship ONLY the 64-long
    # array across the Arrow boundary (explicit select — opaque
    # functions defeat column pruning otherwise, guide §4.1), and
    # accumulate the exact Gram/moment partials per partition in
    # native NumPy. All three relations (count, column sums, product
    # sums) come out of the ONE scan; the only shuffle is the ~2145-
    # group final sum of per-partition partials.
    g = (
        emb.select(snapped.alias("xs"))
        .mapInArrow(_cov_gram_partials, "da int, db int, v decimal(38,0)")
        .groupBy("da", "db")
        .agg(F.sum("v").alias("v"))
        # feeds the per-dim moments (3 slices) AND the pair relation —
        # materialize once
        .localCheckpoint(eager=False)
    )
    per = (
        g.filter("da = -2")
        .select(F.col("db").alias("dim"), F.col("v").cast("long").alias("n"))
        .join(
            g.filter("da = -1").select(
                F.col("db").alias("dim"), F.col("v").cast("long").alias("s")
            ),
            "dim",
        )
        .join(
            g.filter("da >= 0 AND da = db").select(
                F.col("da").alias("dim"), F.col("v").alias("ss")
            ),
            "dim",
        )
        # the d-row moment relation feeds BOTH broadcast sides of the
        # correlation attach — materialize once (r13 OPT, kept)
        .localCheckpoint(eager=False)
    )
    pair = g.filter("da >= 0 AND da < db").select(
        "da", "db", F.col("v").alias("sxy")
    )
    pa = per.select(
        F.col("dim").alias("da"),
        F.col("n").alias("n"),
        F.col("s").alias("sa"),
        F.expr(f"CAST(n AS {dec}) * ss - CAST(s AS {dec}) * s").alias("va"),
    )
    pb = per.select(
        F.col("dim").alias("db"),
        F.col("s").alias("sb"),
        F.expr(f"CAST(n AS {dec}) * ss - CAST(s AS {dec}) * s").alias("vb"),
    )
    scored = (
        pair.join(F.broadcast(pa), "da")
        .join(F.broadcast(pb), "db")
        .select(
            "da",
            "db",
            "n",
            F.expr(
                f"CAST(n AS {dec}) * sxy - CAST(sa AS {dec}) * sb"
            ).alias("covnum"),
            "va",
            "vb",
        )
    )
    ranked = (
        scored.select(
            "da",
            "db",
            "n",
            F.expr("CAST(sign(covnum) AS INT)").alias("corr_sign"),
            F.when(
                (F.col("va") <= 0) | (F.col("vb") <= 0),
                F.lit(None).cast("long"),
            )
            .otherwise(
                ratio_units_dec(
                    f"CAST(covnum AS {dec}) * covnum",
                    f"CAST(va AS {dec}) * vb",
                )
            )
            .alias("corr2_micros"),
        )
        .orderBy(F.desc("corr2_micros"), F.asc("da"), F.asc("db"))
        .limit(COV_TOPK)
    )
    rw = W.orderBy(F.desc("corr2_micros"), F.asc("da"), F.asc("db"))
    return ranked.withColumn("rank", F.row_number().over(rw)).select(
        F.col("rank").cast("int").alias("rank"),
        F.col("da").cast("int").alias("dim_a"),
        F.col("db").cast("int").alias("dim_b"),
        F.col("n").cast("long").alias("n_vectors"),
        "corr_sign",
        "corr2_micros",
    )


QUERIES["embedding_covariance_audit"] = embedding_covariance_audit

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_cov,
)

ORACLES["embedding_covariance_audit"] = f"""
    WITH vals AS (
        SELECT vec_id, CAST(i AS INTEGER) - 1 AS dim,
               CAST(floor(v * 1000.0 + 0.5) AS BIGINT) AS x
        FROM (
            SELECT vec_id, unnest({sql_as_double('embedding')}) AS v,
                   generate_subscripts({sql_as_double('embedding')}, 1) AS i
            FROM embeddings
        )
    ), per AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
        FROM vals GROUP BY 1
    ), pair AS (
        SELECT a.dim AS da, b.dim AS db,
               CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy
        FROM vals a JOIN vals b
          ON a.vec_id = b.vec_id AND a.dim < b.dim
        GROUP BY 1, 2
    ), scored AS (
        SELECT p.da, p.db, pa.n,
               CAST(pa.n AS HUGEINT) * p.sxy
                   - CAST(pa.s AS HUGEINT) * pb.s AS covnum,
               CAST(pa.n AS HUGEINT) * pa.ss
                   - CAST(pa.s AS HUGEINT) * pa.s AS va,
               CAST(pb.n AS HUGEINT) * pb.ss
                   - CAST(pb.s AS HUGEINT) * pb.s AS vb
        FROM pair p
        JOIN per pa ON p.da = pa.dim
        JOIN per pb ON p.db = pb.dim
    ), ranked AS (
        SELECT da, db, n,
               CAST(sign(covnum) AS INTEGER) AS corr_sign,
               CASE WHEN va <= 0 OR vb <= 0 THEN NULL
                    ELSE {_sql_rud_cov(
                        'CAST(covnum AS HUGEINT) * covnum',
                        'CAST(va AS HUGEINT) * vb')}
               END AS corr2_micros
        FROM scored
        ORDER BY corr2_micros DESC, da ASC, db ASC
        LIMIT {COV_TOPK}
    )
    SELECT CAST(row_number() OVER (
               ORDER BY corr2_micros DESC, da ASC, db ASC
           ) AS INTEGER) AS rank,
           CAST(da AS INTEGER) AS dim_a,
           CAST(db AS INTEGER) AS dim_b,
           n AS n_vectors,
           corr_sign,
           corr2_micros
    FROM ranked
"""
