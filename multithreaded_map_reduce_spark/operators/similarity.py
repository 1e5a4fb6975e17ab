"""Similarity search over embedding columns (§2d tier).

- ``brute_force_topk``: exact baseline. Queries are broadcast (the
  small side by construction), candidates stream through one scan —
  O(N·Q·dim) codegen'd work, no shuffle of the candidate set; top-k via
  a per-query window. This is the correctness reference at any scale
  where Q is small.
- ``lsh_topk``: the scale path. Sign-of-hyperplane LSH buckets both
  sides; search only same-bucket candidates. Planes are generated from
  the portable integer-hash formula — NOT runtime randomness — so (a)
  results are reproducible run-to-run, and (b) the DuckDB oracle can
  replay the exact algorithm, making even the *approximate* operator
  differentially testable. At 100 TB: bucket count scales with data
  (16 here for a 500-vector fixture), multi-probe (flipping the
  lowest-|margin| bits) recovers recall without rescanning.

Both return (query_id, neighbor_id, cos_sim, rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import POLY_MOD
from ..functions.rounding import pround, sql_pround
from ..functions.vectors import (
    as_double,
    cosine,
    dot,
    norm_sq,
    sql_as_double,
    sql_cosine,
)

# Deterministic pseudo-random hyperplanes: component d of plane j is
# ((A*(j*dim+d) + B) % POLY_MOD) / POLY_MOD - 0.5  ∈ [-0.5, 0.5)
PLANE_A = 1_103_515_245
PLANE_B = 12_345


def plane_dot(vec: Column, j: int, dim: int) -> Column:
    """Dot product of a double-array vector with deterministic plane j."""
    def term(d: Column) -> Column:
        idx = (F.lit(j * dim) + d).cast("long")
        comp = ((F.lit(PLANE_A).cast("long") * idx + F.lit(PLANE_B)) % F.lit(POLY_MOD)) / F.lit(
            float(POLY_MOD)
        ) - F.lit(0.5)
        return F.element_at(vec, (d + F.lit(1)).cast("int")) * comp

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        F.lit(0.0),
        lambda acc, d: acc + term(d),
    )


def lsh_bucket(vec: Column, n_planes: int, dim: int, plane_offset: int = 0) -> Column:
    """Bucket id = sign bits of ``n_planes`` hyperplane dots.
    ``plane_offset`` selects an independent plane set from the same
    deterministic family (table t → offset t*n_planes)."""
    bits = [
        F.when(plane_dot(vec, plane_offset + j, dim) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _shifted_bucket(vec: Column, t: int, n_planes: int, dim: int) -> Column:
    return lsh_bucket(vec, n_planes, dim, plane_offset=t * n_planes)


def _shifted_probe_buckets(
    vec: Column, t: int, n_planes: int, dim: int, probes: int
) -> Column:
    return query_probe_buckets(vec, n_planes, dim, probes, plane_offset=t * n_planes)


def sql_plane_dot(vec: str, j: int, dim: int) -> str:
    comp = (
        f"(CAST(({PLANE_A} * ({j * dim} + d) + {PLANE_B}) % {POLY_MOD} AS DOUBLE)"
        f" / {float(POLY_MOD)} - 0.5)"
    )
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(0, {dim}), d -> {vec}[d + 1] * {comp})), "
        "(x, y) -> x + y)"
    )


def sql_lsh_bucket(vec: str, n_planes: int, dim: int) -> str:
    terms = [
        f"CASE WHEN {sql_plane_dot(vec, j, dim)} >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(n_planes)
    ]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def sql_plane_dots(vec: str, n_planes: int, dim: int) -> str:
    """DuckDB: list of all plane dot products for a vector expr."""
    return "[" + ", ".join(sql_plane_dot(vec, j, dim) for j in range(n_planes)) + "]"


def sql_home_bucket(dots: str, n_planes: int) -> str:
    """DuckDB: home bucket from a dots-list expr."""
    terms = " + ".join(
        f"CASE WHEN {dots}[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(n_planes)
    )
    return f"CAST({terms} AS BIGINT)"


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of candidates for each (broadcast) query."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        pround(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def query_probe_buckets(
    vec: Column, n_planes: int, dim: int, probes: int, plane_offset: int = 0
) -> Column:
    """Multi-probe bucket list for a query vector: the home bucket plus
    (probes-1) buckets reached by flipping the sign bit with the
    smallest |margin| — the classic recall-recovery trick that re-gains
    neighbors near a hyperplane without rescanning candidates."""
    dots = F.array(*[plane_dot(vec, plane_offset + j, dim) for j in range(n_planes)])
    bits = [
        F.when(F.element_at(dots, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    home = bits[0]
    for b in bits[1:]:
        home = home + b
    home = home.cast("long")
    if probes <= 1:
        return F.array(home)
    margins = F.transform(dots, lambda d: F.abs(d))
    minpos = F.array_position(margins, F.array_min(margins))  # 1-based
    # shiftleft() needs a literal bit count; 2^(minpos-1) is exact here
    flip_bit = F.pow(F.lit(2.0), (minpos - F.lit(1)).cast("double")).cast("long")
    flipped = home.bitwiseXOR(flip_bit)
    return F.array(home, flipped)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-Flat approximate top-k: candidates are partitioned into
    ``n_cells`` inverted lists by nearest centroid; each query probes
    only its ``nprobe`` nearest cells and ranks exactly within them.

    Centroids here are the vectors of the ``n_cells`` smallest candidate
    ids — DETERMINISTIC, so the DuckDB oracle replays the exact
    structure (production would train them with k-means||; the operator
    shape — broadcast centroids, one assignment pass, bounded per-cell
    search — is identical). At 100 TB: centroid table is O(cells·dim)
    and broadcast; assignment is one codegen'd pass over candidates;
    the probe join touches nprobe/n_cells of the data instead of all of
    it — the classic recall/throughput dial."""
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    cents = (
        c.orderBy("neighbor_id")
        .limit(n_cells)
        .select(F.col("neighbor_id").alias("cid"), F.col("cv").alias("centroid"))
    )
    wa = W.partitionBy("neighbor_id").orderBy(F.desc("a_sim"), F.asc("cid"))
    cells = (
        c.crossJoin(F.broadcast(cents))
        .select(
            "neighbor_id", "cv", "cid", cosine(F.col("cv"), F.col("centroid")).alias("a_sim")
        )
        .withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select("cid", "neighbor_id", "cv")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("q_sim"), F.asc("cid"))
    probed = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qv", "cid", cosine(F.col("qv"), F.col("centroid")).alias("q_sim")
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    scored = cells.join(F.broadcast(probed), "cid").select(
        "query_id",
        "neighbor_id",
        pround(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    probes: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: same-bucket candidates only (multi-probe on
    the query side when probes > 1; ``n_tables`` independent hash
    tables when > 1 — the classic recall lever: a true neighbor is
    missed only if it separates from the query in EVERY table), then
    exact rank within the deduplicated matches."""
    q0 = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    c0 = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )

    def _tag(t: int):
        # unary closure (HOF lambda arity is inferred from the signature)
        return lambda b: F.concat_ws("#", F.lit(str(t)), b.cast("string"))

    # table t uses plane indices offset by t*n_planes in the same
    # deterministic family — independent planes, no extra constants
    q = q0.withColumn(
        "tbk",
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.transform(
                            _shifted_probe_buckets(F.col("qv"), t, n_planes, dim, probes),
                            _tag(t),
                        )
                        for t in range(n_tables)
                    ]
                )
            )
        ),
    )
    c = c0.withColumn(
        "tbk",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(str(t)),
                        _shifted_bucket(F.col("cv"), t, n_planes, dim).cast("string"),
                    )
                    for t in range(n_tables)
                ]
            )
        ),
    )
    # Score BEFORE deduplicating: a pair matched in several tables would
    # otherwise drag both full vectors (2·dim·8 bytes) through the
    # distinct's shuffle — recomputing one deterministic cosine per
    # duplicate is far cheaper than shuffling vectors at scale. The
    # distinct therefore operates on (ids, cos_sim) only.
    scored = (
        c.join(F.broadcast(q), "tbk")
        .select(
            "query_id",
            "neighbor_id",
            pround(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantized_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k by int8-quantized dot product — the memory-bandwidth
    configuration of brute-force retrieval (4× smaller vectors, integer
    SIMD on a real column store).

    Per vector: symmetric int8 quantization (functions/vectors.py);
    per pair: EXACT BIGINT dot product of the codes, rescaled by the
    two per-vector scales only for the final score. Because the codes
    and dot are integers and the rescale is one fixed-association
    double product, the ranking — not just the row set — is
    differentially checkable against the oracle. Ties break on
    neighbor id."""
    from ..functions.vectors import as_double, idot, int8_scale, quantize_int8

    def prep(df: DataFrame, out_id: str, s_name: str, q_name: str) -> DataFrame:
        v = as_double(vec_col)
        s = int8_scale(v)
        return df.select(
            F.col(id_col).alias(out_id),
            s.alias(s_name),
            quantize_int8(v, s).alias(q_name),
        )

    q = prep(queries, "query_id", "qs", "qq")
    c = prep(candidates, "neighbor_id", "cs", "cq")
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            "qs",
            "cs",
            idot(F.col("qq"), F.col("cq")).alias("qdot"),
        )
        .withColumn("_raw", F.col("qdot").cast("double") * F.col("qs") * F.col("cs"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qdot", pround(F.col("_raw"), 6).alias("score"), "rank")
    )


def knn_join_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
    dim: int | None = None,
    salt: int = 8,
) -> DataFrame:
    """k-NN SELF-join: every vector gets its top-k neighbors among all
    OTHER vectors, searched IVF-style — the all-pairs shape an
    embedding-dedup or retrieval-index build needs, where ``ivf_topk``'s
    broadcast-the-queries trick is unavailable because every row is a
    query.

    Each vector is assigned ONE home cell (nearest of ``n_cells``
    deterministic centroids — vectors of the smallest ids, so the
    DuckDB oracle replays the exact structure) and probes its
    ``nprobe`` nearest cells; candidate pairs are (prober, home
    resident) matched on cell id. A (q, c) pair can arise from at most
    one probe cell (c has exactly one home), so no post-join dedup is
    needed. Exact cosine + per-query top-k window finish the job.

    100 TB: the centroid table stays O(cells·dim) and broadcast; the
    probe↔home match is an equi-join on cell id (hash-partitioned both
    sides, no broadcast of the full relation anywhere), so per-cell
    work is (n·nprobe/cells)·(n/cells) — grow ``n_cells`` ∝ √n to hold
    per-cell cost constant. Skewed cells (dense regions) are AQE
    skew-join territory, same as any key-skewed join.

    Pass ``dim`` (fixed embedding width) to precompute norms once per
    VECTOR, off the pair hot path: the per-pair cosine drops from three
    array folds (dot + both norms) to one dot. (An unrolled 64-term
    ``element_at`` sum was measured 4× SLOWER than the HOF fold on
    Spark 4 — the giant expression falls out of efficient codegen — so
    the fold stays.) Bit-equal either way: the pair stage divides by
    sqrt(nsq_a*nsq_b), exactly ``cosine``'s expression.

    ``salt``: the candidate join has only ``n_cells`` distinct keys, so
    without salting at most ``n_cells`` tasks compute all pairs — and
    AQE's skew-join can't help because the skew is in join OUTPUT
    fanout, not input partition size. Homes take hash(id)%salt, probes
    replicate ×salt: parallelism becomes n_cells×salt at the cost of
    duplicating the (tiny) probe rows."""
    v = df.select(F.col(id_col).alias("id"), as_double(vec_col).alias("v"))
    if dim is not None:
        # norm SQUARED, not sqrt'd: the pair stage divides by
        # sqrt(nsq_a * nsq_b), the exact expression ``cosine`` uses —
        # sqrt(a)*sqrt(b) would differ in the last ulp.
        v = v.withColumn("nsq", norm_sq(F.col("v")))
    cents = (
        v.orderBy("id")
        .limit(n_cells)
        .select(F.col("id").alias("cid"), F.col("v").alias("centroid"))
    )
    carry = ["id", "v"] + (["nsq"] if dim is not None else [])
    sims = v.crossJoin(F.broadcast(cents)).select(
        *carry, "cid", cosine(F.col("v"), F.col("centroid")).alias("a_sim")
    )
    wr = W.partitionBy("id").orderBy(F.desc("a_sim"), F.asc("cid"))
    ranked = sims.withColumn("_rn", F.row_number().over(wr))
    homes = ranked.filter(F.col("_rn") == 1).select(
        "cid",
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        *([F.col("nsq").alias("c_nsq")] if dim is not None else []),
    )
    probes = ranked.filter(F.col("_rn") <= nprobe).select(
        "cid",
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        *([F.col("nsq").alias("q_nsq")] if dim is not None else []),
    )
    if dim is not None:
        pair_cos = dot(F.col("qv"), F.col("cv")) / F.sqrt(
            F.col("q_nsq") * F.col("c_nsq")
        )
    else:
        pair_cos = cosine(F.col("qv"), F.col("cv"))
    if salt > 1:
        homes = homes.withColumn("_salt", F.pmod(F.hash("neighbor_id"), F.lit(salt)))
        probes = probes.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        join_keys = ["cid", "_salt"]
    else:
        join_keys = ["cid"]
    scored = (
        homes.join(probes, join_keys)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            pround(pair_cos, 6).alias("cos_sim"),
        )
    )
    wk = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rank", F.row_number().over(wk).cast("int")
    ).filter(F.col("rank") <= k)


def ivf2_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_fine: int = 16,
    n_coarse: int = 4,
    nprobe_coarse: int = 2,
    nprobe_fine: int = 2,
) -> DataFrame:
    """Two-level (coarse -> fine) IVF top-k — the rung above ``ivf_topk``
    on the assignment-cost ladder.

    Flat IVF assigns every candidate by scanning ALL ``n_fine``
    centroids: n·k_f distance evals. Here candidates first pick the
    nearest of ``n_coarse`` coarse centroids (n·k_c), then the nearest
    FINE centroid among only that coarse group's fine cells
    (n·k_f/k_c on average): total n·(k_c + k_f/k_c), minimized at
    k_c = sqrt(k_f) — n·2·sqrt(k_f) instead of n·k_f. With the
    adaptive k_f = sqrt(n) rule (embedding_neardup_ivf_auto) that is
    assignment n^1.25 instead of n^1.5 — the reason real ANN systems
    (FAISS IVF_HNSW / SPANN) quantize hierarchically.

    Hierarchical greedy assignment is NOT globally-nearest-fine — a
    candidate near a coarse boundary may land in a different fine cell
    than flat IVF would give it. That is the standard two-level
    trade-off; the candidate rule (coarse argmax -> in-group fine
    argmax) IS the contract, replayed exactly by the DuckDB oracle.

    Centroids are the vectors of the smallest candidate ids (the
    deterministic ``ivf_topk`` convention — production trains them,
    the operator SHAPE is identical): fine = first ``n_fine``, coarse
    = first ``n_coarse``; every fine centroid is itself assigned to
    its nearest coarse centroid to build the group map.

    Queries mirror the hierarchy: probe ``nprobe_coarse`` nearest
    coarse groups, then the ``nprobe_fine`` nearest fine cells among
    those groups' cells, then rank exactly within the probed inverted
    lists. All centroid relations are O(cells·dim) broadcasts; no
    stage touches more than nprobe_fine/n_fine of the data after
    assignment."""
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    fine = (
        c.orderBy("neighbor_id")
        .limit(n_fine)
        .select(F.col("neighbor_id").alias("fid"), F.col("cv").alias("fcent"))
    )
    coarse = (
        c.orderBy("neighbor_id")
        .limit(n_coarse)
        .select(F.col("neighbor_id").alias("gid"), F.col("cv").alias("gcent"))
    )
    # fine centroid -> its coarse group (k_f x k_c, driver-free, broadcast)
    wf = W.partitionBy("fid").orderBy(F.desc("f_sim"), F.asc("gid"))
    fine_map = (
        fine.crossJoin(F.broadcast(coarse))
        .select(
            "fid", "fcent", "gid", cosine(F.col("fcent"), F.col("gcent")).alias("f_sim")
        )
        .withColumn("_rn", F.row_number().over(wf))
        .filter(F.col("_rn") == 1)
        .select("gid", "fid", "fcent")
    )
    # candidate -> nearest coarse group (n x k_c)
    wg = W.partitionBy("neighbor_id").orderBy(F.desc("g_sim"), F.asc("gid"))
    grouped = (
        c.crossJoin(F.broadcast(coarse))
        .select(
            "neighbor_id", "cv", "gid", cosine(F.col("cv"), F.col("gcent")).alias("g_sim")
        )
        .withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") == 1)
        .select("neighbor_id", "cv", "gid")
    )
    # candidate -> nearest fine cell WITHIN its coarse group (n x k_f/k_c)
    wc = W.partitionBy("neighbor_id").orderBy(F.desc("c_sim"), F.asc("fid"))
    cells = (
        grouped.join(F.broadcast(fine_map), "gid")
        .select(
            "neighbor_id", "cv", "fid", cosine(F.col("cv"), F.col("fcent")).alias("c_sim")
        )
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") == 1)
        .select("fid", "neighbor_id", "cv")
    )
    # query -> nprobe_coarse groups -> nprobe_fine cells among them
    wq = W.partitionBy("query_id").orderBy(F.desc("g_sim"), F.asc("gid"))
    qgroups = (
        q.crossJoin(F.broadcast(coarse))
        .select(
            "query_id", "qv", "gid", cosine(F.col("qv"), F.col("gcent")).alias("g_sim")
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe_coarse)
        .select("query_id", "qv", "gid")
    )
    wp = W.partitionBy("query_id").orderBy(F.desc("p_sim"), F.asc("fid"))
    probed = (
        qgroups.join(F.broadcast(fine_map), "gid")
        .select(
            "query_id", "qv", "fid", cosine(F.col("qv"), F.col("fcent")).alias("p_sim")
        )
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe_fine)
        .select("query_id", "qv", "fid")
    )
    scored = cells.join(F.broadcast(probed), "fid").select(
        "query_id",
        "neighbor_id",
        pround(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation
    (ADC) — the compression rung ABOVE int8 scalar quantization
    (``quantized_topk``): int8 shrinks each coordinate to a byte
    (dim bytes/vector); PQ shrinks each dim/m-dim SUBSPACE to one code
    (m bytes/vector, 64x here vs float32's 256 bytes at dim=64). This
    is the memory-bandwidth shape of FAISS IVFPQ / ScaNN: at 100 TB the
    candidate side streams as n×m TINY codes while full vectors never
    leave storage after encoding.

    Pipeline (all built-ins, zero UDFs):
    - codebook: per subspace j, ``ksub`` centroids = the j-th
      sub-vectors of the ``ksub`` smallest-id candidates (the
      deterministic convention shared with ``ivf_topk`` — production
      trains codebooks; the operator SHAPE and cost model are
      identical). O(m·ksub) rows, broadcast.
    - encode: candidate sub-vector -> argmin L2 centroid (ties: code
      asc), n·ksub·dim flops ONCE, then each candidate is just
      ``codes: array<int>`` of length m.
    - query LUT: per query an m×ksub table of <q_sub_j, centroid>
      inner products — O(ksub·dim) per query, built once, broadcast.
    - ADC scoring: score(q, c) = Σ_j lut[j][codes_j] — O(m) table
      lookups per pair instead of O(dim) multiplies. The per-pair hot
      path reads 4 ints + 4 doubles here vs 128 doubles brute-force.

    The fold over j is ascending on both engines (zip_with preserves
    order; the oracle replays the identical nested-list lookup), so the
    approximate scores are bit-identical and the RANKING is under the
    exact differential gate, same discipline as every other ANN op.
    Recall honesty (cf. ``ivf_topk``): ADC score is an approximation of
    the true dot product; on this near-uniform fixture the recall floor
    is asserted in tests, not claimed."""
    dsub = dim // m
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )

    def subspaces(vec: str):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col(vec), j * dsub + 1, dsub).alias("sub"),
                    )
                    for j in range(m)
                ]
            )
        )

    wb = W.orderBy("neighbor_id")
    book = (
        c.orderBy("neighbor_id")
        .limit(ksub)
        .withColumn("code", (F.row_number().over(wb) - 1).cast("int"))
    )
    codebook = book.select("code", subspaces("cv").alias("e")).select(
        F.col("e.j").alias("j"), "code", F.col("e.sub").alias("cent")
    )

    l2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("cent"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # argmin as min(struct(l2, code)): struct comparison is
    # lexicographic, so this IS "ORDER BY l2 ASC, code ASC LIMIT 1" —
    # but as a map-side-combinable aggregation instead of pushing
    # n·m·ksub rows through a per-(id, j) window (measured on the r5
    # bench as the PQ hot spot)
    enc = (
        c.select("neighbor_id", subspaces("cv").alias("e"))
        .select("neighbor_id", F.col("e.j").alias("j"), F.col("e.sub").alias("sub"))
        .join(F.broadcast(codebook), "j")
        .withColumn("l2", l2)
        .groupBy("neighbor_id", "j")
        .agg(F.min(F.struct("l2", "code"))["code"].alias("code"))
    )
    codes = enc.groupBy("neighbor_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))), lambda s: s["code"]
        ).alias("codes")
    )

    lut_rows = (
        q.select("query_id", subspaces("qv").alias("e"))
        .select("query_id", F.col("e.j").alias("j"), F.col("e.sub").alias("sub"))
        .join(F.broadcast(codebook), "j")
        .select("query_id", "j", "code", dot(F.col("sub"), F.col("cent")).alias("ip"))
    )
    lut = (
        lut_rows.groupBy("query_id", "j")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "ip"))), lambda s: s["ip"]
            ).alias("row")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "row"))), lambda s: s["row"]
            ).alias("lut")
        )
    )

    adc = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"), lambda code, row: F.get(row, code)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = codes.crossJoin(F.broadcast(lut)).select(
        "query_id", "neighbor_id", pround(adc, 6).alias("adc_score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def ivfpq_index(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 4,
    m: int = 16,
    ksub: int = 32,
    dim: int = 64,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Corpus-side IVFPQ index build — (cents, codebook, codes), the
    query-independent 80% of ``ivfpq_topk``'s cost: cell routing,
    residual computation, codebook derivation, and PQ encoding. Split
    out (VERDICT r9 item 3) so the four queries that search the same
    corpus (sim_topk_ivfpq, sim_topk_ivfpq_rerank, and the recall/NDCG
    reports that run both) can train ONCE per fixture and share the
    materialized artifacts — the FAISS deployment shape, where the
    index is built offline and only the probe/LUT/ADC stages run per
    query batch. Deterministic throughout, so sharing is value-exact."""
    dsub = dim // m
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    cents = (
        c.orderBy("neighbor_id")
        .limit(n_cells)
        .select(F.col("neighbor_id").alias("cid"), F.col("cv").alias("centroid"))
    )
    wa = W.partitionBy("neighbor_id").orderBy(F.desc("a_sim"), F.asc("cid"))
    cells = (
        c.crossJoin(F.broadcast(cents))
        .select(
            "neighbor_id",
            "cv",
            "cid",
            "centroid",
            cosine(F.col("cv"), F.col("centroid")).alias("a_sim"),
        )
        .withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select(
            "cid",
            "neighbor_id",
            F.zip_with("cv", "centroid", lambda x, y: x - y).alias("rv"),
        )
    )

    def subspaces(vec: str):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col(vec), j * dsub + 1, dsub).alias("sub"),
                    )
                    for j in range(m)
                ]
            )
        )

    wb = W.orderBy("neighbor_id")
    book = (
        cells.orderBy("neighbor_id")
        .limit(ksub)
        .withColumn("code", (F.row_number().over(wb) - 1).cast("int"))
    )
    codebook = book.select("code", subspaces("rv").alias("e")).select(
        F.col("e.j").alias("j"), "code", F.col("e.sub").alias("cent")
    )
    l2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("cent"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # same min(struct) argmin as pq_topk — aggregation, not a window
    enc = (
        cells.select("cid", "neighbor_id", subspaces("rv").alias("e"))
        .select("cid", "neighbor_id", F.col("e.j").alias("j"), F.col("e.sub").alias("sub"))
        .join(F.broadcast(codebook), "j")
        .withColumn("l2", l2)
        .groupBy("cid", "neighbor_id", "j")
        .agg(F.min(F.struct("l2", "code"))["code"].alias("code"))
    )
    codes = enc.groupBy("cid", "neighbor_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))), lambda s: s["code"]
        ).alias("codes")
    )
    return cents, codebook, codes


def ivfpq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 4,
    nprobe: int = 2,
    m: int = 16,
    ksub: int = 32,
    dim: int = 64,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF + residual PQ — the actual FAISS IVFPQ composition of the
    two dials this family exposes separately: ``ivf_topk`` prunes WHICH
    candidates get scored (probe nprobe/n_cells inverted lists),
    ``pq_topk`` shrinks what each scoring COSTS (m one-byte codes,
    O(m) ADC per pair). Here candidates are routed to cells, the PQ
    codebook quantizes the RESIDUAL v − centroid (residuals concentrate
    around 0, so an untrained codebook wastes less of its dynamic range
    — the reason IVFPQ encodes residuals), and the query-side score is

        <q, v> ≈ <q, centroid(cell)>  +  Σ_j lut[j][code_j]

    with the first term exact (one O(dim) dot per (query, probed cell)
    — nprobe·n_cells tiny) and the second the O(m) residual ADC. For
    inner-product search the LUT <q_sub, codebook_cent> is
    cell-independent, so each query builds ONE m×ksub table regardless
    of nprobe. At 100 TB the scoring stage streams n·(m+4) bytes of
    codes+cell-ids instead of n·dim floats AND only nprobe/n_cells of
    them — both dials at once. Every stage (routing, residual,
    codebook, encode, LUT, fold) is order-pinned and replayed by the
    DuckDB oracle; ranking is under the exact gate.

    ``index``: optional prebuilt (cents, codebook, codes) from
    ``ivfpq_index`` — pass it to amortize the corpus-side build across
    query batches (the queries layer shares one checkpointed index per
    fixture dir)."""
    dsub = dim // m
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    cents, codebook, codes = (
        index
        if index is not None
        else ivfpq_index(candidates, id_col, vec_col, n_cells, m, ksub, dim)
    )

    def subspaces(vec: str):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col(vec), j * dsub + 1, dsub).alias("sub"),
                    )
                    for j in range(m)
                ]
            )
        )

    wq = W.partitionBy("query_id").orderBy(F.desc("q_sim"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "cid",
            cosine(F.col("qv"), F.col("centroid")).alias("q_sim"),
            dot(F.col("qv"), F.col("centroid")).alias("qdotcent"),
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cid", "qdotcent")
    )
    lut_rows = (
        q.select("query_id", subspaces("qv").alias("e"))
        .select("query_id", F.col("e.j").alias("j"), F.col("e.sub").alias("sub"))
        .join(F.broadcast(codebook), "j")
        .select("query_id", "j", "code", dot(F.col("sub"), F.col("cent")).alias("ip"))
    )
    lut = (
        lut_rows.groupBy("query_id", "j")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "ip"))), lambda s: s["ip"]
            ).alias("row")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "row"))), lambda s: s["row"]
            ).alias("lut")
        )
    )
    adc = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"), lambda code, row: F.get(row, code)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.join(F.broadcast(probes), "cid")
        .join(F.broadcast(lut), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            pround(F.col("qdotcent") + adc, 6).alias("approx_dot"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_dot"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)
