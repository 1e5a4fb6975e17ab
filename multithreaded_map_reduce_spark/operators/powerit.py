"""Distributed power iteration — dominant eigenvector of the Gram
matrix G = XᵀX of an embedding table, i.e. the top principal direction
of the corpus (the heart of PCA / spectral methods), computed without
ever materializing G.

Why this shape at 100 TB: G is dim×dim but forming it costs a
O(N·dim²) shuffle; power iteration instead repeats y = Xᵀ(X·v) — two
linear passes over X per round with only a dim-sized vector crossing
stages. X·v is a per-row dot product against a BROADCAST v (no
shuffle at all); Xᵀ·d is one map-side-combinable aggregation keyed on
the dimension index (dim groups). Per round: one O(N·dim) shuffle,
O(N·dim) compute, a 1-row max aggregate broadcast back. That is the
canonical scale shape for iterative linear algebra on a tall-skinny
matrix.

Exactness discipline (pagerank/kmeans house rules — fixed rounds, exact
integer state, oracle unrolls the identical chain):

- vectors quantized to BIGINT micro-units; v₀ = all-ones at VSCALE;
- d_i = Σ_k qx_ik·v_k is exact BIGINT (≤ 2^46 for |x|≤1, dim 64);
- y_k = Σ_i qx_ik·d_i accumulates in DECIMAL(38,0) (Spark) / HUGEINT
  (DuckDB) — the qx·d product is cast to decimal BEFORE multiplying
  (it can exceed int64);
- renormalization divides by m = max_k |y_k| using *nonnegative*
  integer division only — sign(y)·((|y|·VSCALE) div m) — so Spark's
  `div` and DuckDB's `//` can never disagree on negative truncation;
- lineage is truncated per round (localCheckpoint), nothing but the
  64-element v array rides between rounds, and no value ever crosses
  to the driver.

Convergence note: the iterate has a deterministic sign (all-ones
start), and with a fixed round count the whole loop is a static DAG —
the same reproducibility contract as operators/pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import iunits_grid

VSCALE = 1_000_000  # fixed-point scale of the iterate v


def power_iteration(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    rounds: int = 3,
) -> DataFrame:
    """(dim_idx, component): the dominant eigenvector of XᵀX after
    ``rounds`` exact fixed-point iterations, scaled so max |component|
    = VSCALE."""
    spark = emb.sparkSession
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: iunits_grid(x, 6)).alias("qvec"),
    )
    v_df = spark.range(1).select(
        F.array(*[F.lit(VSCALE).cast("long") for _ in range(dim)]).alias("varr")
    )
    for _ in range(rounds):
        rows = vecs.crossJoin(F.broadcast(v_df))
        d = rows.select(
            "id",
            "qvec",
            F.aggregate(
                F.zip_with("qvec", "varr", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        y = (
            d.select(F.posexplode("qvec").alias("i", "qx"), "d")
            .groupBy("i")
            .agg(
                F.sum(F.col("qx").cast("decimal(38,0)") * F.col("d")).alias("y")
            )
        )
        m = y.agg(F.max(F.abs(F.col("y"))).alias("m"))
        vnew = (
            y.crossJoin(F.broadcast(m))
            .select(
                "i",
                (
                    F.signum(F.col("y").cast("double")).cast("long")
                    * F.expr(f"CAST((abs(y) * {VSCALE}) div m AS BIGINT)")
                ).alias("v"),
            )
        )
        v_df = (
            vnew.groupBy()
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "v"))),
                    lambda s: s.getField("v"),
                ).alias("varr")
            )
            .localCheckpoint(eager=False)
        )
    return v_df.select(F.posexplode("varr").alias("dim_idx", "component"))


def sql_power_iteration(
    table: str, id_col: str, vec_col: str, dim: int, rounds: int = 3
) -> str:
    """DuckDB twin: the identical iteration unrolled as MATERIALIZED
    CTEs (pagerank oracle style)."""
    ctes = [
        f"""q AS MATERIALIZED (
            SELECT {id_col} AS id, generate_subscripts({vec_col}, 1) - 1 AS i,
                   (CAST(floor(((CAST(floor(CAST(unnest({vec_col}) AS DOUBLE)
                              * 10000000.0 + 0.5) AS BIGINT))
                              + 5 + 100000000000) / 10.0) AS BIGINT)
                              - 10000000000) AS qx
            FROM {table}
        ),
        v0 AS (SELECT CAST(range AS INTEGER) AS i, CAST({VSCALE} AS HUGEINT) AS v
               FROM range({dim}))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS MATERIALIZED (
            SELECT q.id, CAST(sum(q.qx * v.v) AS BIGINT) AS d
            FROM q JOIN v{p} v USING (i) GROUP BY q.id
        ),
        y{r} AS MATERIALIZED (
            SELECT q.i, sum(CAST(q.qx AS HUGEINT) * d.d) AS y
            FROM q JOIN d{r} d USING (id) GROUP BY q.i
        ),
        m{r} AS (SELECT max(abs(y)) AS m FROM y{r}),
        v{r} AS MATERIALIZED (
            SELECT i,
                   CAST(CASE WHEN y < 0 THEN -((abs(y) * {VSCALE}) // m)
                             ELSE (y * {VSCALE}) // m END AS HUGEINT) AS v
            FROM y{r} CROSS JOIN m{r}
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT i AS dim_idx, CAST(v AS BIGINT) AS component FROM v{rounds}"""
    )


def power_iteration2(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    rounds: int = 3,
) -> DataFrame:
    """(pc, dim_idx, component): the TOP-2 principal directions of XᵀX
    — pc 1 is exactly ``power_iteration``'s output; pc 2 runs the same
    fixed-point loop with per-round Gram–Schmidt deflation against
    pc 1.

    The deflation stays INTEGER-EXACT by multiplying through instead of
    dividing: with proj = Σ y_k·v1_k and denom = Σ v1_k² (both exact),
    the orthogonalized iterate is ŷ = y·denom − proj·v1 — the same
    direction as y − (proj/denom)·v1 but with no division anywhere
    before the max-renormalization (which already uses the nonnegative
    `div` rail). Magnitude audit at dim 64, |x| ≤ 1, N ≤ 1e5:
    y ≤ N·dim·1e18 ≈ 6e24, denom ≤ dim·1e12 = 6.4e13, so y·denom and
    proj·v1 stay < 4e38… just over DECIMAL(38,0) at N = 1e5 — hence
    both products are computed on y RESCALED by div 1000 first (three
    decimal digits of the 10^12-scaled iterate are far below the
    renormalization quantum; both engines apply the identical rescale,
    so exactness of the CONTRACT is preserved even though the rescale
    itself rounds). Per round this is one O(N·dim) shuffle plus three
    broadcast scalars — same scale shape as pc 1.

    Convergence honesty: with an all-ones start w₀ has a v1 component;
    deflation removes it every round, so the iterate converges to the
    second eigendirection; orthogonality of the ROUNDED integer outputs
    is asserted (loosely) in tests, not claimed exactly."""
    spark = emb.sparkSession
    v1 = power_iteration(emb, id_col, vec_col, dim=dim, rounds=rounds)
    v1_arr = (
        v1.groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim_idx", "component"))),
                lambda s: s.getField("component"),
            ).alias("v1arr")
        )
        .localCheckpoint(eager=False)
    )
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: iunits_grid(x, 6)).alias("qvec"),
    )
    w_df = spark.range(1).select(
        F.array(*[F.lit(VSCALE).cast("long") for _ in range(dim)]).alias("warr")
    )
    for _ in range(rounds):
        rows = vecs.crossJoin(F.broadcast(w_df))
        d = rows.select(
            "id",
            "qvec",
            F.aggregate(
                F.zip_with("qvec", "warr", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        y = (
            d.select(F.posexplode("qvec").alias("i", "qx"), "d")
            .groupBy("i")
            .agg(
                # nonnegative-div rail for the rescale too: Spark div
                # truncates toward zero, DuckDB // floors — they agree
                # only on nonnegative operands
                F.expr(
                    "CAST(CASE WHEN sum(CAST(qx AS DECIMAL(38,0)) * d) < 0"
                    " THEN -((-sum(CAST(qx AS DECIMAL(38,0)) * d)) div 1000)"
                    " ELSE sum(CAST(qx AS DECIMAL(38,0)) * d) div 1000 END"
                    " AS DECIMAL(38,0))"
                ).alias("y")
            )
        )
        # deflate: ŷ = y·denom − proj·v1  (all exact integers)
        yv = y.crossJoin(F.broadcast(v1_arr)).select(
            "i", "y", F.get(F.col("v1arr"), F.col("i")).alias("v1k")
        )
        scal = yv.agg(
            F.sum(F.col("y") * F.col("v1k")).alias("proj"),
            F.sum(F.col("v1k").cast("decimal(38,0)") * F.col("v1k")).alias("denom"),
        )
        yhat = yv.crossJoin(F.broadcast(scal)).select(
            "i",
            (F.col("y") * F.col("denom") - F.col("proj") * F.col("v1k")).alias("yh"),
        )
        m = yhat.agg(F.max(F.abs(F.col("yh"))).alias("m"))
        wnew = yhat.crossJoin(F.broadcast(m)).select(
            "i",
            (
                F.signum(F.col("yh").cast("double")).cast("long")
                * F.expr(f"CAST((abs(yh) * {VSCALE}) div m AS BIGINT)")
            ).alias("v"),
        )
        w_df = (
            wnew.groupBy()
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "v"))),
                    lambda s: s.getField("v"),
                ).alias("warr")
            )
            .localCheckpoint(eager=False)
        )
    pc2 = w_df.select(F.posexplode("warr").alias("dim_idx", "component"))
    return v1.select(
        F.lit(1).alias("pc"), "dim_idx", "component"
    ).unionByName(pc2.select(F.lit(2).alias("pc"), "dim_idx", "component"))


def sql_power_iteration2(
    table: str, id_col: str, vec_col: str, dim: int, rounds: int = 3
) -> str:
    """DuckDB twin of ``power_iteration2`` — pc 1 CTE chain reused
    verbatim, pc 2 unrolled with the identical multiply-through
    deflation (HUGEINT everywhere; the div-1000 rescale matches)."""
    base = sql_power_iteration(table, id_col, vec_col, dim, rounds)
    # strip the trailing SELECT; keep the WITH body
    body = base.split("SELECT i AS dim_idx")[0].rstrip().rstrip("\n")
    assert body.endswith(")"), body[-50:]
    ctes = [body[len("WITH "):] if body.startswith("WITH ") else body]
    ctes.append(
        f"""v1arr AS (SELECT i, v AS v1k FROM v{rounds}),
        den AS (SELECT sum(v1k * v1k) AS denom FROM v1arr),
        w0 AS (SELECT CAST(range AS INTEGER) AS i, CAST({VSCALE} AS HUGEINT) AS v
               FROM range({dim}))"""
    )
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""dw{r} AS MATERIALIZED (
            SELECT q.id, CAST(sum(q.qx * w.v) AS BIGINT) AS d
            FROM q JOIN w{p} w USING (i) GROUP BY q.id
        ),
        yw{r} AS MATERIALIZED (
            SELECT q.i,
                   CASE WHEN sum(CAST(q.qx AS HUGEINT) * d.d) < 0
                        THEN -((-sum(CAST(q.qx AS HUGEINT) * d.d)) // 1000)
                        ELSE sum(CAST(q.qx AS HUGEINT) * d.d) // 1000 END AS y
            FROM q JOIN dw{r} d USING (id) GROUP BY q.i
        ),
        pr{r} AS (
            SELECT sum(y.y * a.v1k) AS proj
            FROM yw{r} y JOIN v1arr a USING (i)
        ),
        yh{r} AS MATERIALIZED (
            SELECT y.i, y.y * den.denom - pr{r}.proj * a.v1k AS yh
            FROM yw{r} y JOIN v1arr a USING (i), den, pr{r}
        ),
        mw{r} AS (SELECT max(abs(yh)) AS m FROM yh{r}),
        w{r} AS MATERIALIZED (
            SELECT i,
                   CAST(CASE WHEN yh < 0 THEN -((abs(yh) * {VSCALE}) // m)
                             ELSE (yh * {VSCALE}) // m END AS HUGEINT) AS v
            FROM yh{r} CROSS JOIN mw{r}
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT 1 AS pc, i AS dim_idx, CAST(v AS BIGINT) AS component FROM v{rounds}
        UNION ALL
        SELECT 2 AS pc, i AS dim_idx, CAST(v AS BIGINT) AS component FROM w{rounds}"""
    )
