"""Weighted PageRank in exact fixed-point integer arithmetic — the
canonical iterative MapReduce algorithm (the reference engine's README
cites PageRank as the motivating MapReduce workload class; its own apps
stop at WordCounter/InvertedIndex, cf. /root/reference/README.md), here
as a Spark iterative dataflow.

Why fixed-point: float PageRank sums contributions in nondeterministic
order, so no exact differential oracle is possible. With ranks held as
BIGINT units of 1/SCALE and every step using truncating integer
division, each iteration is order-free and bit-identical in any engine
— DuckDB replays the exact iteration chain as unrolled CTEs
(queries/graphrank.py) and the driver hash-compares the result.

Per-iteration dataflow (all keyed on node id):
  contrib  = edges ⋈ ranks ⋈ out_weight   → (rank·w) div ow   per edge
  in_sum   = groupBy(dst) Σ contrib       (one shuffle)
  dangling = Σ rank over nodes with no out-edge, div N — computed as a
             1-row aggregate crossJoin-broadcast back (NO driver-side
             collect in the loop)
  rank'    = base + damping·(in_sum + dangling) div 100

Scale: each iteration shuffles O(edges) contribution rows + O(nodes)
rank rows; lineage is truncated per round with localCheckpoint (an
iterative plan would otherwise grow exponentially — see
operators/graph.py). num_iter is fixed (no convergence collect), so the
whole loop is a static 10-stage DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # rank units: 1/SCALE of total probability mass
DAMPING_NUM = 85  # damping factor 0.85 as an exact rational 85/100
DAMPING_DEN = 100


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    num_iter: int = 10,
    n_nodes: int | None = None,
) -> DataFrame:
    """(id, rank_units): weighted PageRank after ``num_iter`` rounds.

    ``rank_units`` are BIGINTs in 1/SCALE units; ranks sum to ≈ SCALE
    (truncation loses < num_iter·N units). ``n_nodes`` may be passed
    when the caller knows |nodes| statically (keeps the operator free
    of driver-side counts); otherwise one count() runs up front.
    """
    n = n_nodes if n_nodes is not None else nodes.count()
    if n == 0:
        # operator-level totality (ADVICE r10, shared with hits):
        # empty node relation → empty ranks, not ZeroDivisionError
        return nodes.select(
            F.col(id_col).alias("id"),
            F.lit(None).cast("long").alias("rank_units"),
        )
    base = (SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * n)

    nodes = nodes.select(F.col(id_col).alias("id")).localCheckpoint(eager=False)
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=False)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint(eager=False)

    ranks = nodes.withColumn("rank", F.lit(SCALE // n).cast("long"))
    for _ in range(num_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(out_w, "src")
            .select(F.col("dst").alias("id"), F.expr("rank * w div ow").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("cin"))
        )
        dangling = (
            ranks.join(out_w, ranks.id == out_w.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("dsum"))
            .select(F.expr(f"dsum div {n}").alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                F.expr(
                    f"{base} + {DAMPING_NUM} * (coalesce(cin, 0) + dm) "
                    f"div {DAMPING_DEN}"
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.col("rank").alias("rank_units"))


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    restart: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    num_iter: int = 10,
    n_restart: int | None = None,
) -> DataFrame:
    """(id, rank_units): PageRank personalized to a RESTART set — the
    teleport term and all dangling mass return uniformly to ``restart``
    members instead of the whole graph, so rank measures proximity
    *from the seed set's perspective* (the related-items /
    topic-sensitive shape, Haveliwala 2002). Same exact-integer
    discipline as ``pagerank``: 1/SCALE units, floor division, fixed
    iteration count; ranks of nodes unreachable from the seed set are
    exactly 0.

    Scale: identical plan shape per round as ``pagerank`` (one edge
    join + groupBy, one broadcast scalar) plus a broadcast membership
    flag — the restart set is small by definition.

    ``n_restart``: pass the restart-set size if known to keep plan
    build fully lazy; when omitted the DEDUPLICATED restart set is
    counted — an EAGER action at plan-build time (ADVICE r6: counting
    the raw input would let duplicate ids inflate ``s``, deflating the
    teleport base + dangling redistribution and leaking rank mass,
    since membership below is ``distinct()``-based)."""
    nodes = nodes.select(F.col(id_col).alias("id")).localCheckpoint(eager=False)
    rset = restart.select(F.col(id_col).alias("id")).distinct()
    s = n_restart if n_restart is not None else rset.count()
    base = (SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * s)
    flagged = nodes.join(
        F.broadcast(rset.withColumn("_is_r", F.lit(1))), "id", "left"
    ).select("id", F.coalesce("_is_r", F.lit(0)).alias("is_r")).localCheckpoint(eager=False)
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=False)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint(eager=False)

    ranks = flagged.select(
        "id", (F.col("is_r") * F.lit(SCALE // s)).cast("long").alias("rank")
    )
    for _ in range(num_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(out_w, "src")
            .select(F.col("dst").alias("id"), F.expr("rank * w div ow").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("cin"))
        )
        dangling = (
            ranks.join(out_w, ranks.id == out_w.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("dsum"))
            .select(F.expr(f"dsum div {s}").alias("dm"))
        )
        ranks = (
            flagged.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                F.expr(
                    f"is_r * {base} + {DAMPING_NUM} * (coalesce(cin, 0)"
                    f" + is_r * dm) div {DAMPING_DEN}"
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", F.col("rank").alias("rank_units"))


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    num_iter: int = 4,
) -> DataFrame:
    """(id, auth_units, hub_units): weighted HITS (Kleinberg 1999)
    after ``num_iter`` mutual-reinforcement rounds, sum-normalized so
    each vector holds SCALE total mass.

    Same exact-integer discipline as :func:`pagerank`, with one twist:
    the raw update a(v) = Σ_{u→v} h(u)·w accumulates in DECIMAL(38,0)
    (h ≤ SCALE and edge weights are unbounded fact-table counts — the
    int64 product headroom pagerank gets from its div-by-outweight
    does not exist here), and normalization back to BIGINT units is
    the half-up wide rational ``(2·SCALE·a + Σa) div (2·Σa)`` — the
    ratio_units_dec formula inlined, identical in the oracle's
    unrolled CTEs. L1 (sum) normalization replaces the classic L2: it
    keeps every step rational (no sqrt), and the fixed point direction
    is the same principal eigenvector.

    Scale: per round, one O(edges) join+groupBy per direction plus a
    1-row broadcast total; lineage truncated per round with
    localCheckpoint."""
    nodes = nodes.select(F.col(id_col).alias("id")).localCheckpoint(eager=False)
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=False)
    n = nodes.count()
    dec = "decimal(38,0)"

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        tot = raw.agg(F.sum(F.col(col)).alias("tot"))
        return (
            nodes.join(raw, "id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "id",
                F.expr(
                    f"(CAST(2 * {SCALE} AS {dec})"
                    f" * CAST(coalesce({col}, 0) AS {dec}) + tot)"
                    f" div (2 * tot)"
                ).alias(col),
            )
        )

    if n == 0:
        # operator-level totality (ADVICE r10): an empty node relation
        # must degrade to an empty result, not ZeroDivisionError
        return nodes.select(
            "id",
            F.lit(None).cast("long").alias("auth_units"),
            F.lit(None).cast("long").alias("hub_units"),
        )
    hubs = nodes.withColumn("h", F.lit(SCALE // n).cast("long"))
    # num_iter=0 degrades to the uniform fixed-point seed on both axes
    # instead of AttributeError on a never-assigned auths
    auths = nodes.withColumn("a", F.lit(SCALE // n).cast("long"))
    for _ in range(num_iter):
        a_raw = (
            edges.join(hubs, edges.src == hubs.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum((F.col("h") * F.col("w")).cast(dec)).alias("a"))
        )
        auths = _normalize(a_raw, "a").localCheckpoint(eager=False)
        h_raw = (
            edges.join(auths, edges.dst == auths.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum((F.col("a") * F.col("w")).cast(dec)).alias("h"))
        )
        hubs = _normalize(h_raw, "h").localCheckpoint(eager=False)
    return (
        auths.join(hubs, "id")
        .select(
            "id",
            F.col("a").alias("auth_units"),
            F.col("h").alias("hub_units"),
        )
    )
