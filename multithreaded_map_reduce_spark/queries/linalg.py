"""Iterative linear algebra tier: distributed power iteration over the
embeddings table (operators/powerit.py) — the top principal direction
of the corpus computed as repeated y = Xᵀ(X·v) passes, never forming
the Gram matrix. Differential discipline is the pagerank/kmeans one:
fixed rounds, exact fixed-point integers, and an oracle that unrolls
the identical chain as MATERIALIZED CTEs, so even this gets an exact
hash-matched gate row rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.powerit import power_iteration, sql_power_iteration
from ..sources.catalog import load_table

DIM = 64
ROUNDS = 3


def power_iteration_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration(emb, "vec_id", "embedding", dim=DIM, rounds=ROUNDS)


QUERIES = {"power_iteration_embeddings": power_iteration_embeddings}

ORACLES = {
    "power_iteration_embeddings": sql_power_iteration(
        "embeddings", "vec_id", "embedding", dim=DIM, rounds=ROUNDS
    )
}


# --- per-dimension feature standardization -----------------------------------


def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding matrix —
    the feature-scaling pass before distance-based ML (k-means, ANN
    with L2) so no dimension dominates.

    Exactness discipline (same as stats_covar): each float enters as an
    exact integer micro-unit (float→double cast is lossless, the floor
    formula is engine-portable), per-dim moments are exact BIGINT sums
    (|v|≲1e7 micro-units, v²≲1e14, ×500 rows ≲1e17 < 2^63), and the
    z-score is computed as (n·v − s1) / sqrt(n·s2 − s1²) — integer
    numerator, sqrt and one division both IEEE-correctly-rounded —
    then pround(6).

    Scale: posexplode produces N·64 narrow rows; the moment aggregate
    is map-side combinable per dim (64 groups — broadcast back); the
    standardize pass is a stateless re-scan joined against the 64-row
    stats relation. Two scans, one tiny broadcast, no big shuffle."""
    from pyspark.sql import functions as F

    from ..functions.rounding import iunits_grid, pround
    from ..sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # iunits_grid, not iunits (round 9): the fixture's 1e-7-granular
    # float32 values tie at the micro half-grid — the jitter audit
    # flagged the plain snap as boundary-fragile on the current data
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        "dim",
        iunits_grid(F.col("val").cast("double"), 6).alias("v"),
    )
    stats = cells.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    # z = round(1e6·dev/√var)/1e6 decided in EXACT integer arithmetic
    # (round 9): the former pround(dev/√var, 6) snap is an FMA-fusable
    # mul+add over an irrational quotient — the jitter audit flagged a
    # real near-tie on the current fixture. Here the double sqrt only
    # SEEDS r ≈ floor(2·|dev|·1e6/√var); the ±1 adjust and the final
    # half-up decision (2m−1)²·var ≤ 4D² < (2m+1)²·var are pure
    # DECIMAL(38,0) compares, so the snap cannot sit on a float
    # boundary. One final /1e6 of an exact integer is a single
    # correctly-rounded IEEE op. Domain: r²·var < 10^38 (|z| ≲ 10⁴ at
    # a billion rows — far beyond any standardized feature).
    j = cells.join(F.broadcast(stats), "dim")
    dev = F.col("n") * F.col("v") - F.col("s1")
    staged = j.select(
        "vec_id",
        "dim",
        dev.alias("dev"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1"
        ).alias("var"),
    ).select(
        "vec_id",
        "dim",
        "dev",
        "var",
        F.expr(
            "4 * (CAST(abs(dev) AS DECIMAL(38,0)) * 1000000)"
            " * (CAST(abs(dev) AS DECIMAL(38,0)) * 1000000)"
        ).alias("fourd2"),
    )
    r0 = F.expr(
        "CAST(floor(sqrt(CAST(fourd2 AS DOUBLE) / CAST(var AS DOUBLE)))"
        " AS BIGINT)"
    )
    return (
        staged.withColumn("r0", r0)
        .withColumn(
            "r1",
            F.expr(
                "r0 + (CASE WHEN CAST(r0 + 1 AS DECIMAL(38,0)) * (r0 + 1)"
                " * var <= fourd2 THEN 1 ELSE 0 END)"
            ),
        )
        .withColumn(
            "r",
            F.expr(
                "r1 - (CASE WHEN CAST(r1 AS DECIMAL(38,0)) * r1 * var"
                " > fourd2 THEN 1 ELSE 0 END)"
            ),
        )
        .select(
            "vec_id",
            "dim",
            F.expr(
                "CASE WHEN var <= 0 THEN NULL ELSE"
                " CAST(CAST(sign(dev) AS BIGINT) * ((r + 1) div 2) AS DOUBLE)"
                " / 1000000.0 END"
            ).alias("z"),
        )
    )


QUERIES["embedding_standardize"] = embedding_standardize

from ..functions.rounding import sql_pround as _sql_pr  # noqa: E402

ORACLES["embedding_standardize"] = f"""
    WITH cells AS (
        SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
               {{GRID}}
                   AS v
        FROM (
            SELECT vec_id,
                   unnest(range(1, len(embedding) + 1)) AS i,
                   unnest(embedding) AS val
            FROM embeddings
        )
    ), stats AS (
        SELECT dim, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2
        FROM cells GROUP BY 1
    )
    , staged AS (
        SELECT vec_id, dim,
               CAST(n AS BIGINT) * v - s1 AS dev,
               CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS var,
               4 * (CAST(abs(CAST(n AS BIGINT) * v - s1) AS HUGEINT)
                    * 1000000)
                 * (CAST(abs(CAST(n AS BIGINT) * v - s1) AS HUGEINT)
                    * 1000000) AS fourd2
        FROM cells JOIN stats USING (dim)
    ), seeded AS (
        SELECT vec_id, dim, dev, var, fourd2,
               CAST(floor(sqrt(CAST(fourd2 AS DOUBLE) / CAST(var AS DOUBLE)))
                    AS BIGINT) AS r0
        FROM staged
    ), adj1 AS (
        SELECT *, r0 + (CASE WHEN CAST(r0 + 1 AS HUGEINT) * (r0 + 1) * var
                             <= fourd2 THEN 1 ELSE 0 END) AS r1
        FROM seeded
    ), adj AS (
        SELECT *, r1 - (CASE WHEN CAST(r1 AS HUGEINT) * r1 * var > fourd2
                             THEN 1 ELSE 0 END) AS r
        FROM adj1
    )
    SELECT vec_id, dim,
           CASE WHEN var <= 0 THEN NULL ELSE
                CAST(CAST(sign(dev) AS BIGINT) * ((r + 1) // 2) AS DOUBLE)
                / 1000000.0 END AS z
    FROM adj
""".replace(
    "{GRID}",
    __import__(
        "multithreaded_map_reduce_spark.functions.rounding",
        fromlist=["sql_iunits_grid"],
    ).sql_iunits_grid("CAST(val AS DOUBLE)", 6),
)


RP_DIMS = 4  # projected dimensionality
RP_A = 1_103_515_245
RP_B = 12_345
RP_MOD = 2_147_483_647


def embedding_project_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson–
    Lindenstrauss): each embedding is projected onto RP_DIMS
    deterministic pseudo-random integer planes — the feature-
    engineering step that turns 64-dim vectors into a handful of
    coordinates cheap enough to index, bucket, or ship to a dashboard.
    Plane component (j, d) is ((A·(j·dim+d) + B) mod M) − M/2, vectors
    are exact micro-unit integers, so every projected coordinate is an
    exact BIGINT dot product (|coord| ≤ 1e6·M·dim ≈ 6.4e16 < 2^63) —
    no float anywhere, which is what makes a JL projection
    differentially testable at all.

    100 TB: one scan, zero shuffle — the projection is a per-row fold
    against constants; downstream consumers bucket/sort the projected
    coordinates instead of the raw vectors."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")]
    for j in range(RP_DIMS):
        cols.append(
            F.expr(
                f"""aggregate(
                    zip_with(embedding,
                             sequence(0, size(embedding) - 1),
                             (v, d) -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0d + 0.5d) AS BIGINT)
                                       * ((({RP_A} * CAST({j} * size(embedding) + d AS BIGINT)
                                            + {RP_B}) % {RP_MOD}) - {RP_MOD // 2})),
                    CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
            ).alias(f"proj_{j}")
        )
    return emb.select(*cols)


QUERIES["embedding_project_rp"] = embedding_project_rp


def _rp_oracle() -> str:
    sel = ["vec_id"]
    for j in range(RP_DIMS):
        sel.append(
            f"""CAST(list_sum(list_transform(
                    list_zip(embedding, range(0, len(embedding))),
                    p -> CAST(floor(CAST(p[1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                         * ((({RP_A} * CAST({j} * len(embedding) + p[2] AS BIGINT)
                              + {RP_B}) % {RP_MOD}) - {RP_MOD // 2})))
                AS BIGINT) AS proj_{j}"""
        )
    return "SELECT " + ", ".join(sel) + " FROM embeddings"


ORACLES["embedding_project_rp"] = _rp_oracle()


LS_SEED_MOD = 5  # vec_id % 5 == 0 are the labeled seeds
LS_ROUNDS = 2


def label_spread_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised LABEL PROPAGATION over the embedding similarity
    graph: 20% of vectors (vec_id ≡ 0 mod 5) keep their label as seeds;
    everyone else takes the majority label of their similar neighbors,
    iterated LS_ROUNDS times (seeds never change). Edges are exact and
    deterministic: candidate pairs share the 4-bit sign bucket of the
    integer random projection (embedding_project_rp's planes — the
    bucketing reuse is the point), and qualify when the exact BIGINT
    dot product of micro-unit vectors is positive with
    4·dot² ≥ ‖a‖²·‖b‖² (cosine ≥ 1/2, no float boundary). Majority
    votes tie-break toward the smallest label (min-struct on
    (−votes, label)). Output: the (true_label, assigned_label)
    confusion table with a held-out-accuracy reading per cell.

    100 TB: bucketed candidate generation (never all-pairs), two
    label-keyed joins per round; the vote aggregation is mergeable.
    This is the classic distributed semi-supervised baseline — and the
    whole chain (projection → buckets → exact edges → R vote rounds)
    is replayed by the oracle as unrolled CTEs."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    # MILLI-unit quantization (not micro): the exact cosine >= 1/2 test
    # squares the dot product, and micro-unit squares overflow BIGINT
    # (dot <= 6.4e13, dot^2 ~ 4e27 >> 2^63); at 1e3 units every factor
    # fits with room (4*dot^2 <= 1.6e16)
    qv = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.expr(
            "transform(embedding,"
            " v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0d + 0.5d) AS BIGINT))"
        ).alias("q"),
    )
    dot = "aggregate(zip_with(a.q, b.q, (x, y) -> x * y), CAST(0 AS BIGINT), (s, t) -> s + t)"
    nrm = lambda side: (  # noqa: E731
        f"aggregate(zip_with({side}.q, {side}.q, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (s, t) -> s + t)"
    )
    bucket_expr = " + ".join(
        f"CASE WHEN aggregate(zip_with(q, sequence(0, size(q) - 1),"
        f" (v, d) -> v * ((({RP_A} * CAST({j} * size(q) + d AS BIGINT) + {RP_B})"
        f" % {RP_MOD}) - {RP_MOD // 2})), CAST(0 AS BIGINT), (s, t) -> s + t) >= 0"
        f" THEN {1 << j} ELSE 0 END"
        for j in range(RP_DIMS)
    )
    nodes = qv.withColumn("bucket", F.expr(bucket_expr))
    a, b = nodes.alias("a"), nodes.alias("b")
    pair_cond = (
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
        & (F.expr(dot) > 0)
        & (F.expr(f"4 * ({dot}) * ({dot}) >= ({nrm('a')}) * ({nrm('b')})"))
    )
    edges = (
        a.join(b, pair_cond)
        .select(F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("v"))
        .localCheckpoint(eager=False)
    )
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    seeds = nodes.filter(F.col("vec_id") % LS_SEED_MOD == 0).select(
        F.col("vec_id"), F.col("true_label").alias("lbl")
    )
    labels = seeds
    for _ in range(LS_ROUNDS):
        votes = (
            und.join(labels.withColumnRenamed("vec_id", "v"), "v")
            .groupBy(F.col("u").alias("vec_id"), "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        win = (
            votes.groupBy("vec_id")
            .agg(F.min(F.struct((-F.col("n")).alias("neg"), F.col("lbl"))).alias("w"))
            .select("vec_id", F.col("w.lbl").alias("lbl"))
        )
        # seeds are clamped; non-seeds take this round's majority
        labels = seeds.unionByName(
            win.join(seeds.select("vec_id"), "vec_id", "anti")
        ).localCheckpoint(eager=False)
    assigned = nodes.join(labels, "vec_id", "left").select(
        "vec_id",
        "true_label",
        F.col("lbl").alias("assigned_label"),
        (F.col("vec_id") % LS_SEED_MOD == 0).alias("is_seed"),
    )
    return assigned.groupBy("true_label", "assigned_label", "is_seed").agg(
        F.count(F.lit(1)).alias("n")
    )


QUERIES["label_spread_embeddings"] = label_spread_embeddings


def _ls_oracle() -> str:
    bucket = " + ".join(
        f"""CASE WHEN list_sum(list_transform(
                list_zip(q, range(0, len(q))),
                p -> p[1] * ((({RP_A} * CAST({j} * len(q) + p[2] AS BIGINT)
                     + {RP_B}) % {RP_MOD}) - {RP_MOD // 2}))) >= 0
            THEN {1 << j} ELSE 0 END"""
        for j in range(RP_DIMS)
    )
    rounds = []
    prev = "seeds"
    for r in range(1, LS_ROUNDS + 1):
        rounds.append(f""", votes{r} AS (
            SELECT e.u AS vec_id, l.lbl, count(*) AS n
            FROM und e JOIN {prev} l ON e.v = l.vec_id
            GROUP BY 1, 2
        ), win{r} AS (
            SELECT vec_id, lbl FROM (
                SELECT vec_id, lbl, row_number() OVER (
                    PARTITION BY vec_id ORDER BY n DESC, lbl ASC) AS rn
                FROM votes{r}
            ) WHERE rn = 1
        ), labels{r} AS (
            SELECT vec_id, lbl FROM seeds
            UNION ALL
            SELECT vec_id, lbl FROM win{r}
            WHERE vec_id NOT IN (SELECT vec_id FROM seeds)
        )""")
        prev = f"labels{r}"
    return f"""
        WITH nodes AS MATERIALIZED (
            SELECT vec_id, label AS true_label,
                   list_transform(embedding,
                       v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0 + 0.5)
                            AS BIGINT)) AS q
            FROM embeddings
        ), bucketed AS MATERIALIZED (
            SELECT vec_id, true_label, q, ({bucket}) AS bucket FROM nodes
        ), edges AS MATERIALIZED (
            SELECT a.vec_id AS u, b.vec_id AS v
            FROM bucketed a JOIN bucketed b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) > 0
              AND 4 * list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2]))
                    * list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2]))
                  >= list_sum(list_transform(list_zip(a.q, a.q), p -> p[1] * p[2]))
                   * list_sum(list_transform(list_zip(b.q, b.q), p -> p[1] * p[2]))
        ), und AS MATERIALIZED (
            SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
        ), seeds AS MATERIALIZED (
            SELECT vec_id, true_label AS lbl FROM bucketed
            WHERE vec_id % {LS_SEED_MOD} = 0
        ){''.join(rounds)}
        SELECT n.true_label,
               l.lbl AS assigned_label,
               n.vec_id % {LS_SEED_MOD} = 0 AS is_seed,
               count(*) AS n
        FROM bucketed n LEFT JOIN {prev} l USING (vec_id)
        GROUP BY 1, 2, 3
    """


ORACLES["label_spread_embeddings"] = _ls_oracle()


# --- top-2 PCA via deflated power iteration -----------------------------------
# pc 1 is power_iteration_embeddings verbatim; pc 2 adds per-round
# multiply-through Gram–Schmidt deflation (ŷ = y·denom − proj·v1 — no
# division before the renormalization rail). Operator docstring:
# operators/powerit.power_iteration2.


def embedding_pca2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.powerit import power_iteration2

    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration2(emb, "vec_id", "embedding", dim=DIM, rounds=ROUNDS)


QUERIES["embedding_pca2"] = embedding_pca2

from ..operators.powerit import sql_power_iteration2 as _sql_pi2  # noqa: E402

ORACLES["embedding_pca2"] = _sql_pi2(
    "embeddings", "vec_id", "embedding", dim=DIM, rounds=ROUNDS
)


# ------------------------------------------------- embedding norm audit
# Zero/degenerate-norm audit (round 8): the hazard class ADVICE r7
# flagged in the MMR greedy (a zero-norm embedding yields NULL cosine
# and can crash or silently skew any consumer) becomes a first-class
# per-label report: norm² distribution in exact micro-units plus the
# zero-norm count. One scan, fold-ordered dot products, no sqrt — the
# audit stays all-integer after the snap.


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.rounding import iunits, ratio_units
    from ..functions.vectors import as_double, norm_sq

    emb = load_table(spark, sf_dir, "embeddings")
    ns = iunits(norm_sq(as_double("embedding")), 6)
    per = emb.select("label", ns.alias("ns_micros"))
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("ns_micros").alias("min_normsq_micros"),
            F.max("ns_micros").alias("max_normsq_micros"),
            F.sum("ns_micros").alias("_sum"),
            F.sum(
                F.when(F.col("ns_micros") == 0, 1).otherwise(0)
            ).alias("n_zero_norm"),
        )
        .select(
            "label",
            "n_vecs",
            "min_normsq_micros",
            "max_normsq_micros",
            ratio_units("_sum", "n_vecs", 1).alias("mean_normsq_micros"),
            "n_zero_norm",
        )
    )


QUERIES["embedding_norm_stats"] = embedding_norm_stats


def _sql_norm_stats() -> str:
    from ..functions.rounding import sql_iunits, sql_ratio_units
    from ..functions.vectors import sql_as_double, sql_norm_sq

    ns = sql_iunits(sql_norm_sq(sql_as_double("embedding")), 6)
    return f"""
    WITH per AS (
        SELECT label, {ns} AS ns_micros FROM embeddings
    )
    SELECT label,
           count(*) AS n_vecs,
           CAST(min(ns_micros) AS BIGINT) AS min_normsq_micros,
           CAST(max(ns_micros) AS BIGINT) AS max_normsq_micros,
           {sql_ratio_units('sum(ns_micros)', 'count(*)', 1)}
               AS mean_normsq_micros,
           CAST(sum(CASE WHEN ns_micros = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_norm
    FROM per GROUP BY 1
"""


ORACLES["embedding_norm_stats"] = _sql_norm_stats()


# ---------------------------------------------- embedding-space drift
# Covariate-shift monitor in REPRESENTATION space: the day-1 corpus
# (vec_id % 10 != 0) defines deterministic IVF cells (first
# EDRIFT_CELLS day-1 vectors by id are centroids — the sim_topk_ivf /
# dedup_semantic convention); both days' vectors are argmax-assigned,
# and the day-2 cell histogram is scored against day-1 proportions
# with exact per-cell chi-square terms. This is the embedding-space
# complement of streaming_drift_monitor's token-hash JS divergence —
# token drift catches vocabulary change, cell drift catches the
# upstream encoder or content distribution moving even when the
# vocabulary doesn't. Zero-norm vectors are excluded on both engines
# before any cosine ordering (the ann_index_paths hazard class).
#
# Exactness: with o = day-2 count, n1 = day-1 count, T1/T2 the day
# totals, the term (o − e)²/e under e = T2·n1/T1 equals
# (o·T1 − n1·T2)² / (T1·T2·n1) — all integers; the square runs on the
# DECIMAL(38,0)/HUGEINT wide rail (it wraps int64 past ~3e9-vector
# days) and only the bounded nano-scaled quotient lands in BIGINT.
# Cells with n1 = 0 cannot exist (centroids are day-1 members and
# every day-1 vector assigns somewhere), so the denominator is never
# zero by construction.
#
# Scale: one corpus scan per day slice against a broadcast
# EDRIFT_CELLS-row centroid relation, one cell-keyed count — the
# report is |cells| rows. Production sizes cells at √n like the IVF
# rail; the chi-square tail runs on the constant |cells| relation.

EDRIFT_CELLS = 8


def embedding_drift_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..functions.rounding import ratio_units_dec
    from ..functions.vectors import as_double, cosine, norm_sq

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            as_double("embedding").alias("cv"),
            (F.col("vec_id") % 10 == 0).cast("int").alias("is_day2"),
        )
        .filter(norm_sq(F.col("cv")) > 0)
    )
    cents = (
        emb.filter(F.col("is_day2") == 0)
        .orderBy("vec_id")
        .limit(EDRIFT_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("cv").alias("centroid"))
    )
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(
            F.desc(cosine(F.col("cv"), F.col("centroid"))), F.asc("cid")
        )
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select("cid", "is_day2")
    )
    # |cells| rows, two consumers (totals + final select) — checkpoint
    # so the corpus-wide assignment crossJoin runs once
    counts = (
        assigned.groupBy("cid")
        .agg(
            F.sum(1 - F.col("is_day2")).alias("n_day1"),
            F.sum("is_day2").alias("n_day2"),
        )
        .localCheckpoint()
    )
    tot = counts.agg(
        F.sum("n_day1").alias("T1"), F.sum("n_day2").alias("T2")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "cid",
        "n_day1",
        "n_day2",
        ratio_units_dec(
            "(n_day2 * T1 - n_day1 * T2) * (n_day2 * T1 - n_day1 * T2)",
            "T1 * T2 * n_day1",
            1_000_000_000,
        ).alias("chi2_term_nanos"),
    )


QUERIES["embedding_drift_cells"] = embedding_drift_cells


def _edrift_oracle() -> str:
    from ..functions.rounding import sql_ratio_units_dec
    from ..functions.vectors import sql_as_double, sql_cosine

    nsq = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(cv, x -> x * x)), (x, y) -> x + y)"
    )
    return f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, cv,
               CAST(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END AS INTEGER)
                   AS is_day2
        FROM (
            SELECT vec_id, {sql_as_double('embedding')} AS cv FROM embeddings
        ) WHERE {nsq} > 0
    ), cents AS MATERIALIZED (
        SELECT vec_id AS cid, cv AS centroid
        FROM emb WHERE is_day2 = 0 ORDER BY vec_id LIMIT {EDRIFT_CELLS}
    ), assigned AS (
        SELECT cid, is_day2 FROM (
            SELECT emb.is_day2, cents.cid,
                   row_number() OVER (
                       PARTITION BY emb.vec_id
                       ORDER BY {sql_cosine('emb.cv', 'cents.centroid')} DESC,
                                cents.cid ASC
                   ) AS rn
            FROM emb, cents
        ) WHERE rn = 1
    ), counts AS (
        SELECT cid,
               CAST(sum(1 - is_day2) AS BIGINT) AS n_day1,
               CAST(sum(is_day2) AS BIGINT) AS n_day2
        FROM assigned GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_day1) AS BIGINT) AS T1,
               CAST(sum(n_day2) AS BIGINT) AS T2
        FROM counts
    )
    SELECT cid, n_day1, n_day2,
           {sql_ratio_units_dec(
               '(n_day2 * T1 - n_day1 * T2) * (n_day2 * T1 - n_day1 * T2)',
               'T1 * T2 * n_day1',
               1_000_000_000,
           )} AS chi2_term_nanos
    FROM counts, tot
"""


ORACLES["embedding_drift_cells"] = _edrift_oracle()


# ------------------------------------------------ mean-embedding drift
# Linear-kernel MMD between the day-1 and day-2 embedding populations:
# with a linear kernel, MMD² collapses to ‖μ₁ − μ₂‖² exactly, so the
# classic two-sample representation-drift test becomes pure integer
# arithmetic — per dimension d = (s1·n2 − s2·n1)/(n1·n2) over exact
# micro-unit sums, reported as the signed snapped mean gap and its
# squared contribution (products on the DECIMAL(38,0)/HUGEINT rail:
# s·n reaches ~2.5e13 at sf0.1 and its square ~6e26). The global
# ‖μ₁−μ₂‖² is the column sum. This is the per-DIMENSION lens on the
# same hazard embedding_drift_cells covers per-CELL: cells catch
# reassignment (direction changes), the mean gap catches uniform
# translation/scaling cells can miss — production monitors run both.
# Zero-norm vectors are legitimate population members here (means,
# not cosine ordering), so nothing is excluded.
#
# Scale: one posexplode scan with conditional map-side sums into
# 64 groups — no join, no quadratic term, the embedding_standardize
# profile.


def embedding_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.rounding import iunits_grid, ratio_units_dec

    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 10 == 0).cast("int").alias("is_day2"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    # iunits_grid, not iunits: the fixture's float32 embeddings are
    # 1e-7-granular decimals that TIE at the micro half-grid (vec 281
    # dim 16 = -0.0170775) — the round-7 real-tie class, caught here by
    # the jitter audit; the guard-digit snap is boundary-free
    cells = emb.select(
        "dim",
        "is_day2",
        iunits_grid(F.col("val").cast("double"), 6).alias("v"),
    )
    stats = cells.groupBy("dim").agg(
        F.sum(F.when(F.col("is_day2") == 0, F.col("v")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("is_day2") == 1, F.col("v")).otherwise(0)).alias("s2"),
        F.sum(1 - F.col("is_day2")).alias("n1"),
        F.sum("is_day2").alias("n2"),
    )
    num = "CAST(s1 AS DECIMAL(38,0)) * n2 - CAST(s2 AS DECIMAL(38,0)) * n1"
    den = "CAST(n1 AS DECIMAL(38,0)) * n2"
    return stats.select(
        "dim",
        "n1",
        "n2",
        F.expr(
            f"CASE WHEN {den} = 0 THEN NULL"
            f" WHEN {num} >= 0"
            f" THEN CAST((2 * ({num}) + ({den})) div (2 * ({den})) AS BIGINT)"
            f" ELSE -CAST((2 * (-({num})) + ({den})) div (2 * ({den})) AS BIGINT)"
            " END"
        ).alias("gap_units"),
        ratio_units_dec(f"({num}) * ({num})", f"({den}) * ({den})", 1).alias(
            "contrib_units2"
        ),
    )


QUERIES["embedding_mmd_drift"] = embedding_mmd_drift


def _mmd_oracle() -> str:
    from ..functions.rounding import sql_ratio_units_dec

    num = "CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1"
    den = "CAST(n1 AS HUGEINT) * n2"
    return f"""
    WITH cells AS (
        SELECT CAST(i - 1 AS INTEGER) AS dim,
               CAST(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END AS INTEGER)
                   AS is_day2,
               {{GRID}} AS v
        FROM (
            SELECT vec_id,
                   unnest(range(1, len(embedding) + 1)) AS i,
                   unnest(embedding) AS val
            FROM embeddings
        )
    ), stats AS (
        SELECT dim,
               CAST(sum(CASE WHEN is_day2 = 0 THEN v ELSE 0 END) AS BIGINT)
                   AS s1,
               CAST(sum(CASE WHEN is_day2 = 1 THEN v ELSE 0 END) AS BIGINT)
                   AS s2,
               CAST(sum(1 - is_day2) AS BIGINT) AS n1,
               CAST(sum(is_day2) AS BIGINT) AS n2
        FROM cells GROUP BY 1
    )
    SELECT dim, n1, n2,
           CASE WHEN {den} = 0 THEN NULL
                WHEN {num} >= 0
                THEN CAST((2 * ({num}) + ({den})) // (2 * ({den})) AS BIGINT)
                ELSE -CAST((2 * (-({num})) + ({den})) // (2 * ({den}))
                     AS BIGINT)
           END AS gap_units,
           {sql_ratio_units_dec(f'({num}) * ({num})', f'({den}) * ({den})', 1)}
               AS contrib_units2
    FROM stats
"""


from ..functions.rounding import sql_iunits_grid as _sql_ig  # noqa: E402

ORACLES["embedding_mmd_drift"] = _mmd_oracle().replace(
    "{GRID}", _sql_ig("CAST(val AS DOUBLE)", 6)
)


# --------------------------------------- int8 scalar quantization eval
# Round 11: the serving-tier compression audit the ANN ladder was
# missing — per-DIMENSION int8 scalar quantization (the standard
# "SQ8" storage mode of production vector stores: 4× smaller than
# f32, decoded by one multiply-add): code = round(255·(v−lo)/(hi−lo))
# with per-dim corpus [lo, hi]. Reported per dimension: the exact
# range, the code mass, and the reconstruction-error profile —
# exactly what decides whether SQ8 is safe for a given embedding
# column before re-indexing 100 TB of vectors.
#
# Exactness rail: FLOAT columns cast to DOUBLE before ANY arithmetic
# (the float×double-literal trap in DuckDB evaluates at FLOAT
# precision otherwise); lo/hi are arithmetic-free min/max (exact);
# the code and the per-element absolute reconstruction error are
# iunits-SNAPPED (half-up integer grids, the jitter-audit contract),
# after which every aggregate is integer. Constant dimensions
# (hi = lo) define code 0 / error 0.
#
# Scale: one posexplode scan → (dim, value) keyed aggregate in two
# passes (bounds, then codes against broadcast bounds) — dim-grain
# relations (64 rows) everywhere after the scans.


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.rounding import iunits, ratio_units

    emb = load_table(spark, sf_dir, "embeddings")
    dv = emb.select(
        F.posexplode("embedding").alias("dim", "vf")
    ).select("dim", F.col("vf").cast("double").alias("v"))
    bounds = dv.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    coded = dv.join(F.broadcast(bounds), "dim").select(
        "dim",
        "lo",
        "hi",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            iunits(
                (F.col("v") - F.col("lo"))
                * F.lit(255.0)
                / (F.col("hi") - F.col("lo")),
                0,
            )
        )
        .alias("code"),
        F.col("v"),
    )
    err = coded.select(
        "dim",
        "code",
        iunits(
            F.abs(
                F.col("v")
                - (
                    F.col("lo")
                    + F.col("code").cast("double")
                    * (F.col("hi") - F.col("lo"))
                    / F.lit(255.0)
                )
            ),
            9,
        ).alias("err_nanos"),
    )
    agg = err.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("code").alias("sum_codes"),
        F.sum("err_nanos").alias("sum_err_nanos"),
        F.max("err_nanos").alias("max_err_nanos"),
    )
    return agg.join(F.broadcast(bounds), "dim").select(
        "dim",
        "n",
        F.col("lo").alias("lo_val"),
        F.col("hi").alias("hi_val"),
        "sum_codes",
        ratio_units("sum_err_nanos", "n", 1).alias("mean_err_nanos"),
        "max_err_nanos",
    )


QUERIES["embedding_quantize_int8"] = embedding_quantize_int8

from ..functions.rounding import sql_iunits as _sql_iu_q8  # noqa: E402
from ..functions.rounding import sql_ratio_units as _sql_ru_q8  # noqa: E402

ORACLES["embedding_quantize_int8"] = f"""
    WITH dv AS (
        SELECT i - 1 AS dim, CAST(val AS DOUBLE) AS v
        FROM (
            SELECT unnest(range(1, len(embedding) + 1)) AS i,
                   unnest(embedding) AS val
            FROM embeddings
        )
    ), bounds AS (
        SELECT dim, min(v) AS lo, max(v) AS hi FROM dv GROUP BY dim
    ), coded AS (
        SELECT dv.dim, lo, hi,
               CASE WHEN hi = lo THEN 0
                    ELSE {_sql_iu_q8('(v - lo) * 255.0 / (hi - lo)', 0)}
               END AS code,
               v
        FROM dv JOIN bounds ON dv.dim = bounds.dim
    ), err AS (
        SELECT dim, code,
               {_sql_iu_q8(
                   'abs(v - (lo + CAST(code AS DOUBLE) * (hi - lo) / 255.0))',
                   9)} AS err_nanos
        FROM coded
    ), agg AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(code) AS BIGINT) AS sum_codes,
               CAST(sum(err_nanos) AS BIGINT) AS sum_err_nanos,
               CAST(max(err_nanos) AS BIGINT) AS max_err_nanos
        FROM err GROUP BY dim
    )
    SELECT agg.dim AS dim, n,
           lo AS lo_val, hi AS hi_val,
           sum_codes,
           {_sql_ru_q8('sum_err_nanos', 'n', 1)} AS mean_err_nanos,
           max_err_nanos
    FROM agg JOIN bounds ON agg.dim = bounds.dim
"""
