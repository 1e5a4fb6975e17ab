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

from ..functions.rounding import iunits

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
        F.transform(vec_col, lambda x: iunits(x, 6)).alias("qvec"),
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
            .localCheckpoint()
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
                   CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * 1000000.0
                              + 0.5) AS BIGINT) AS qx
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
