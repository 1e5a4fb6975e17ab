"""Iterative-algorithm tier: weighted PageRank over the nation-level
trade graph (supplier nation → customer nation, edge weight = shipped
lineitems), run for a fixed 10 damped iterations in exact fixed-point
integer arithmetic (operators/pagerank.py).

The oracle UNROLLS the identical iteration chain as DuckDB CTEs — ten
(dangling, contribution, rank) stages generated from the same
constants — so even an iterative algorithm gets an exact differential
check instead of the weaker rows-only gate. This is the workload class
the reference's MapReduce design targets beyond its two bundled apps
(cf. /root/reference/README.md); a Spark rebuild should demonstrate it
as a first-class dataflow.

Scale: the edge build is the heavy part (join + aggregate over the fact
table — one shuffle keyed on the join key, then one on the 625-edge
graph); each PageRank round then shuffles O(edges) rows. Node count is
static (25 nations) but nothing in the operator assumes it: the same
code runs a billion-node graph, where localCheckpoint-per-round and the
broadcast dangling scalar are what keep the loop viable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pagerank import DAMPING_DEN, DAMPING_NUM, SCALE, hits, pagerank
from ..sources.catalog import load_table

N_NATIONS = 25
NUM_ITER = 10


def _build_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCACHED nation trade-graph fold — plan contracts inspect
    this (the cached artifact's lineage truncates to an ExistingRDD
    scan once materialized, by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )


#: (applicationId, sf_dir) -> lazily localCheckpoint-ed trade graph.
_TRADE_EDGES_CACHE: dict[str, DataFrame] = {}


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once shared trade-graph artifact (r13 OPT, the
    _supplier_cograph pattern): FIVE iterative-ranking queries
    (pagerank, PPR, SSSP, closeness, HITS) fold the identical
    lineitem⋈orders⋈supplier⋈customer relation down to the ≤625-row
    nation graph, and each previously re-ran the full fact-table fold
    per call (~1-1.5 s at sf0.1) before its cheap 25-node iteration.
    Keyed by applicationId (ADVICE r12) so a restarted session
    rebuilds."""
    from ..session import artifact_cached

    return artifact_cached(
        _TRADE_EDGES_CACHE,
        spark,
        sf_dir,
        lambda: _build_trade_edges(spark, sf_dir).localCheckpoint(eager=False),
    )


def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    pr = pagerank(
        nodes,
        _trade_edges(spark, sf_dir),
        num_iter=NUM_ITER,
        n_nodes=N_NATIONS,
    )
    return pr.join(F.broadcast(nation), pr.id == nation.n_nationkey).select(
        F.col("id").alias("nationkey"), "n_name", "rank_units"
    )


QUERIES = {"pagerank_nations": pagerank_nations}


def _pagerank_sql(num_iter: int = NUM_ITER, n: int = N_NATIONS) -> str:
    """Unrolled-CTE twin of the fixed-point iteration (same constants)."""
    base = (SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * n)
    ctes = [
        f"""nodes AS (SELECT n_nationkey AS id FROM nation),
        edges AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        outw AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
        r0 AS MATERIALIZED (SELECT id, CAST({SCALE // n} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(1, num_iter + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
            SELECT COALESCE(sum(rank), 0) // {n} AS dm FROM r{p}
            WHERE id NOT IN (SELECT src FROM outw)
        ),
        c{i} AS MATERIALIZED (
            SELECT e.dst AS id, sum((r.rank * e.w) // o.ow) AS cin
            FROM edges e
            JOIN r{p} r ON e.src = r.id
            JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ),
        r{i} AS MATERIALIZED (
            SELECT nodes.id,
                   {base} + ({DAMPING_NUM} * (COALESCE(c.cin, 0) + d.dm))
                       // {DAMPING_DEN} AS rank
            FROM nodes LEFT JOIN c{i} c ON nodes.id = c.id CROSS JOIN d{i} d
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT r.id AS nationkey, n.n_name, CAST(r.rank AS BIGINT) AS rank_units
        FROM r{num_iter} r JOIN nation n ON r.id = n.n_nationkey"""
    )


ORACLES = {"pagerank_nations": _pagerank_sql()}


#: Per-node degree cap of the supplier co-shipment projection: every
#: supplier keeps its 50 strongest partners (union-kNN). A query
#: constant, not data-derived — the triangle wedge space is then
#: O(n·cap²) no matter how dense the raw projection gets.
TRI_DEGREE_CAP = 50

#: (session id, sf_dir) -> lazily localCheckpoint-ed shared projection.
_COGRAPH_CACHE: dict[str, DataFrame] = {}


def _supplier_cograph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-filtered, degree-capped supplier co-shipment graph —
    the SHARED projection behind triangle_suppliers and
    graph_clustering_coefficient (their 3·total invariant needs one
    edge set).

    Build: dedup the bipartite (supplier, customer) relation BEFORE
    the per-customer pair expansion (a customer with k suppliers
    contributes C(k,2) pairs from k rows, not its raw lineitem count),
    weight each pair by shared-customer count, keep above-mean-support
    edges (w·|E| > Σw, the LPA sparsifier), then cap every node at its
    TRI_DEGREE_CAP strongest partners. The raw projection of a market-
    basket-shaped fact table is near-COMPLETE (at sf0.1 all C(1000,2)
    supplier pairs co-occur), so unfiltered triangle work is Θ(n³)
    under ANY join strategy — sparsify first, enumerate after
    (VERDICT r11 item 1c).

    Build-once shared artifact (the _IVFPQ_INDEX_CACHE /
    _LR_WEIGHTS_CACHE pattern): FIVE registry queries ride this
    projection (triangles, lc, k-truss, rich-club, transitivity) and
    its pair build — 12.5M raw co-occurrence pairs into the weighted
    groupBy at sf0.1 — is the measured ~4 s floor for each of them.
    One lazy localCheckpoint per (session, fixture dir) pays the build
    once; localCheckpoint (not persist) keeps it out of the
    CacheManager so sharing cannot leak into unrelated queries' plans.
    Keyed by applicationId (not recyclable ``id(spark)`` — ADVICE r12)
    so a restarted session rebuilds (checkpointed blocks die with
    their SparkContext)."""
    from ..session import artifact_cached

    return artifact_cached(
        _COGRAPH_CACHE,
        spark,
        sf_dir,
        lambda: _build_supplier_cograph(spark, sf_dir).localCheckpoint(
            eager=False
        ),
    )


def _build_supplier_cograph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCACHED projection build — plan contracts inspect this
    (the cached artifact's lineage truncates to an ExistingRDD scan
    once materialized, by design)."""
    from ..operators.graph import degree_cap_edges, support_filter_edges

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    x, y = sc.alias("x"), sc.alias("y")
    pairs = (
        x.join(y, (F.col("x.c") == F.col("y.c")) & (F.col("x.s") < F.col("y.s")))
        .groupBy(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return degree_cap_edges(support_filter_edges(pairs), TRI_DEGREE_CAP)


def _cograph_sql_ctes() -> str:
    """DuckDB CTE chain mirroring _supplier_cograph + the degree-
    oriented triangle enumeration (operators/graph.py
    degree_oriented_triangles) — shared by both triangle-family
    oracles. Defines: e (edges), deg (v, d), tri (x1, x2, x3)."""
    return f"""sc AS (
        SELECT DISTINCT l_suppkey AS s, o_custkey AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    pairs AS MATERIALIZED (
        SELECT x.s AS a, y.s AS b, CAST(count(*) AS BIGINT) AS w
        FROM sc x JOIN sc y ON x.c = y.c AND x.s < y.s
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(w) AS BIGINT) AS sw
        FROM pairs
    ),
    supp AS MATERIALIZED (
        SELECT a, b, w FROM pairs CROSS JOIN tot WHERE w * m > sw
    ),
    und AS (
        SELECT a AS v, b AS p, w FROM supp
        UNION ALL
        SELECT b AS v, a AS p, w FROM supp
    ),
    nom AS (
        SELECT v, p FROM (
            SELECT v, p,
                   row_number() OVER (
                       PARTITION BY v ORDER BY w DESC, p ASC) AS rn
            FROM und
        ) WHERE rn <= {TRI_DEGREE_CAP}
    ),
    e AS MATERIALIZED (
        SELECT DISTINCT least(v, p) AS a, greatest(v, p) AS b FROM nom
    ),
    deg AS MATERIALIZED (
        SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
        ) GROUP BY v
    ),
    oe AS MATERIALIZED (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                    THEN e.a ELSE e.b END AS u,
               CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                    THEN e.b ELSE e.a END AS x
        FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
    ),
    tri AS MATERIALIZED (
        SELECT e1.u AS x1, e1.x AS x2, e2.x AS x3
        FROM oe e1
        JOIN oe e2 ON e1.x = e2.u
        JOIN oe e3 ON e3.u = e1.u AND e3.x = e2.x
    )"""


def triangle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the support-filtered, degree-capped
    supplier co-shipment graph (_supplier_cograph).

    Triangles are enumerated once each through the degree-ordered
    orientation (operators/graph.py degree_oriented_triangles) — the
    wedge join orients by (degree, id), so hub nodes never pay
    O(d_max²) wedges (VERDICT r11 item 1a)."""
    from ..operators.graph import degree_oriented_triangles

    tris, _ = degree_oriented_triangles(_supplier_cograph(spark, sf_dir))
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


QUERIES["triangle_suppliers"] = triangle_suppliers

ORACLES["triangle_suppliers"] = (
    "WITH "
    + _cograph_sql_ctes()
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri
"""
)


# ---------------------------------------------------------------------------
# Round 5: single-source shortest paths over the same trade graph.

SSSP_SOURCE = 0
SSSP_ROUNDS = 6
SSSP_NUM = 1_000_000  # edge cost = SSSP_NUM div w (heavier trade = cheaper)


def sssp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bellman-Ford (fixed 6 rounds) from nation 0; edge cost is the
    integer-divided reciprocal of trade volume, so all path costs are
    exact BIGINTs. Positive-only integer division: Spark ``div`` and
    DuckDB ``//`` agree (both truncate = floor for positives)."""
    from ..operators.graph import shortest_paths

    nation = load_table(spark, sf_dir, "nation")
    edges = _trade_edges(spark, sf_dir).select(
        "src", "dst", F.expr(f"{SSSP_NUM} div w").cast("long").alias("cost")
    )
    d = shortest_paths(edges, SSSP_SOURCE, SSSP_ROUNDS)
    return d.join(F.broadcast(nation), d.id == nation.n_nationkey).select(
        F.col("id").alias("nationkey"), "n_name", F.col("d").alias("path_cost")
    )


QUERIES["sssp_nations"] = sssp_nations


def _sssp_sql(source: int = SSSP_SOURCE, rounds: int = SSSP_ROUNDS) -> str:
    ctes = [
        f"""edges AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst,
                   {SSSP_NUM} // count(*) AS cost
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY s_nationkey, c_nationkey
        ),
        d0 AS (SELECT CAST({source} AS BIGINT) AS id, CAST(0 AS BIGINT) AS d)"""
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"""d{t} AS MATERIALIZED (
            SELECT id, CAST(min(d) AS BIGINT) AS d FROM (
                SELECT id, d FROM d{p}
                UNION ALL
                SELECT e.dst AS id, dd.d + e.cost AS d
                FROM edges e JOIN d{p} dd ON e.src = dd.id
            ) u GROUP BY id
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT d.id AS nationkey, n.n_name, d.d AS path_cost
        FROM d{rounds} d JOIN nation n ON d.id = n.n_nationkey"""
    )


ORACLES["sssp_nations"] = _sssp_sql()


KCORE_K = 80
KCORE_ROUNDS = 4


def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (fixed-round contract, the sssp/pagerank
    discipline): KCORE_ROUNDS synchronized peel rounds over the part
    co-purchase graph — each round computes degrees, keeps nodes with
    degree ≥ k, and retains only edges whose BOTH endpoints survive.
    Output: every node still carrying an edge after the final round,
    with its residual degree. The oracle unrolls the identical rounds
    as CTEs, so the round-by-round cascade — not just the fixed point —
    is differentially pinned (at sf0.01 the cascade is 1903 → 1878 →
    1865 → 1858 survivors; genuinely iterative, not a one-shot filter).

    100 TB: each round is one degree aggregation + two semi-joins, all
    keyed on node id — the standard distributed peeling round. Rounds
    needed grows slowly (degeneracy ordering depth); production runs
    iterate to fixpoint with the connected_components convergence-raise
    rail, while the FIXED round count here is what makes an exact
    unrolled oracle possible."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    x, y = li.alias("x"), li.alias("y")
    # eager localCheckpoint per round: edges is consumed three times a
    # round (two degree projections + the filter base), so without
    # materialization the shared subtree re-evaluates exponentially
    # across rounds (measured 27 s -> ~3 s at sf0.01)
    edges = (
        x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(KCORE_ROUNDS):
        und = edges.select("a").unionAll(edges.select(F.col("b").alias("a")))
        keep = (
            und.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select("a")
        )
        edges = (
            edges.join(keep, "a", "semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    und = edges.select("a").unionAll(edges.select(F.col("b").alias("a")))
    return und.groupBy(F.col("a").alias("part")).agg(
        F.count(F.lit(1)).alias("degree")
    )


QUERIES["kcore_parts"] = kcore_parts


def _kcore_oracle() -> str:
    ctes = [
        """pp AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        ), e0 AS MATERIALIZED (SELECT a, b FROM pp)"""
    ]
    for r in range(KCORE_ROUNDS):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
            SELECT n FROM (
                SELECT a AS n FROM e{r} UNION ALL SELECT b FROM e{r}
            ) GROUP BY n HAVING count(*) >= {KCORE_K}
        ), e{r + 1} AS MATERIALIZED (
            SELECT a, b FROM e{r}
            WHERE a IN (SELECT n FROM k{r}) AND b IN (SELECT n FROM k{r})
        )"""
        )
    last = f"e{KCORE_ROUNDS}"
    return f"""
        WITH {', '.join(ctes)}
        SELECT n AS part, count(*) AS degree FROM (
            SELECT a AS n FROM {last} UNION ALL SELECT b FROM {last}
        ) GROUP BY n
    """


ORACLES["kcore_parts"] = _kcore_oracle()


# --------------------------------------------- Markov chain stationary
# The event-type transition matrix (events_transitions) iterated to its
# stationary distribution — "where does a user session end up spending
# its time" — under the pagerank fixed-point discipline: probability
# mass as BIGINT units of 1/MK_SCALE, truncating integer division per
# transition, dangling states (types never observed as a source)
# redistribute uniformly, a FIXED iteration count, and an oracle that
# unrolls the identical rounds as CTEs. Scale: each round shuffles
# O(|types|²) transition rows — the state space is the EVENT-TYPE
# alphabet, not users, so this is broadcast-tiny at any corpus size;
# the one corpus-sized stage is the lead() window building the counts.

MK_SCALE = 10**12
MK_ITERS = 4
MK_STATES = 5  # the events fixture's event_type alphabet (asserted)


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    states = ev.select(F.col("event_type").alias("t")).distinct().localCheckpoint()
    n_states = states.count()
    if n_states != MK_STATES:
        raise AssertionError(
            f"event_type alphabet changed: {n_states} != {MK_STATES} — "
            "update MK_STATES (oracle constant) to match"
        )
    outs = trans.groupBy("from_type").agg(F.sum("n").alias("ow"))
    pi = states.withColumn(
        "units", F.lit(MK_SCALE // MK_STATES).cast("long")
    ).localCheckpoint()
    for _ in range(MK_ITERS):
        contrib = (
            trans.join(pi, trans.from_type == pi.t)
            .join(outs, "from_type")
            .select(
                F.col("to_type").alias("t"),
                F.expr("(units * n) div ow").alias("c"),
            )
            .groupBy("t")
            .agg(F.sum("c").alias("cin"))
        )
        dang = (
            pi.join(outs, pi.t == outs.from_type, "left_anti")
            .agg(F.coalesce(F.sum("units"), F.lit(0)).alias("dmass"))
            .select((F.col("dmass") / F.lit(MK_STATES)).cast("long").alias("dm"))
        )
        pi = (
            states.join(contrib, "t", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "t",
                (F.coalesce(F.col("cin"), F.lit(0)) + F.col("dm")).alias("units"),
            )
            .localCheckpoint()
        )
    return pi.select(F.col("t").alias("event_type"), F.col("units").alias("prob_units"))


QUERIES["events_markov_stationary"] = events_markov_stationary


def _markov_sql(num_iter: int = MK_ITERS, n: int = MK_STATES) -> str:
    ctes = [
        f"""trans AS MATERIALIZED (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ) WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    states AS (SELECT DISTINCT event_type AS t FROM events),
    outs AS MATERIALIZED (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS ow FROM trans GROUP BY 1
    ),
    p0 AS (SELECT t, CAST({MK_SCALE // n} AS BIGINT) AS units FROM states)"""
    ]
    for i in range(1, num_iter + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
            SELECT COALESCE(sum(units), 0) // {n} AS dm FROM p{p}
            WHERE t NOT IN (SELECT from_type FROM outs)
        ),
        c{i} AS MATERIALIZED (
            SELECT tr.to_type AS t, sum((p.units * tr.n) // o.ow) AS cin
            FROM trans tr
            JOIN p{p} p ON tr.from_type = p.t
            JOIN outs o ON tr.from_type = o.from_type
            GROUP BY 1
        ),
        p{i} AS MATERIALIZED (
            SELECT s.t, COALESCE(c.cin, 0) + d.dm AS units
            FROM states s LEFT JOIN c{i} c ON s.t = c.t CROSS JOIN d{i} d
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT t AS event_type, CAST(units AS BIGINT) AS prob_units
        FROM p{num_iter}"""
    )


ORACLES["events_markov_stationary"] = _markov_sql()


# --- harmonic closeness centrality --------------------------------------------
# Harmonic centrality H(v) = Σ_{u != v} 1/d(v, u) — the closeness
# variant that stays defined on disconnected graphs. Distances come
# from ONE multi-source Bellman-Ford (frontier keyed (src, node) — all
# sources in rounds shuffles, not |V| runs); the reciprocal goes to
# exact integer units as 1e9 div d, so the whole statistic is BIGINT
# and bit-replayable. Same trade-volume edge costs as sssp_nations.

CLOSENESS_ROUNDS = 6


def closeness_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import multi_source_shortest_paths

    nation = load_table(spark, sf_dir, "nation")
    edges = _trade_edges(spark, sf_dir).select(
        "src", "dst", F.expr(f"{SSSP_NUM} div w").cast("long").alias("cost")
    )
    d = multi_source_shortest_paths(edges, CLOSENESS_ROUNDS)
    h = (
        d.filter(F.col("d") > 0)
        .groupBy("src")
        .agg(
            F.count("*").alias("n_reached"),
            F.sum(F.expr("CAST(1000000000 div d AS BIGINT)")).alias("harmonic_units"),
        )
    )
    return h.join(F.broadcast(nation), h.src == nation.n_nationkey).select(
        F.col("src").alias("nationkey"), "n_name", "n_reached", "harmonic_units"
    )


QUERIES["closeness_nations"] = closeness_nations


def _closeness_sql(rounds: int = CLOSENESS_ROUNDS) -> str:
    ctes = [
        f"""edges AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst,
                   {SSSP_NUM} // count(*) AS cost
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY s_nationkey, c_nationkey
        ),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        d0 AS (SELECT id AS src, id, CAST(0 AS BIGINT) AS d FROM nodes)"""
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"""d{t} AS MATERIALIZED (
            SELECT src, id, CAST(min(d) AS BIGINT) AS d FROM (
                SELECT src, id, d FROM d{p}
                UNION ALL
                SELECT dd.src, e.dst AS id, dd.d + e.cost AS d
                FROM edges e JOIN d{p} dd ON e.src = dd.id
            ) u GROUP BY src, id
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT h.src AS nationkey, n.n_name, h.n_reached, h.harmonic_units
        FROM (
            SELECT src, count(*) AS n_reached,
                   CAST(sum(1000000000 // d) AS BIGINT) AS harmonic_units
            FROM d{rounds} WHERE d > 0 GROUP BY src
        ) h JOIN nation n ON h.src = n.n_nationkey"""
    )


ORACLES["closeness_nations"] = _closeness_sql()


# --------------------------------------------- personalized PageRank
# Teleport restricted to region 0's five nations: rank = trade
# proximity FROM that region's perspective (topic-sensitive PageRank,
# Haveliwala 2002). Same trade graph, same integer fixed-point rails,
# unrolled-CTE oracle with the restart membership folded into the
# teleport and dangling terms.

PPR_REGION = 0
N_RESTART = 5  # nations per region in the TPC-H generator


def ppr_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import personalized_pagerank

    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    restart = nation.filter(F.col("n_regionkey") == PPR_REGION).select(
        F.col("n_nationkey").alias("id")
    )
    pr = personalized_pagerank(
        nodes,
        _trade_edges(spark, sf_dir),
        restart,
        num_iter=NUM_ITER,
        n_restart=N_RESTART,
    )
    return pr.join(F.broadcast(nation), pr.id == nation.n_nationkey).select(
        F.col("id").alias("nationkey"), "n_name", "rank_units"
    )


QUERIES["ppr_region_nations"] = ppr_region_nations


def _ppr_sql(num_iter: int = NUM_ITER, s: int = N_RESTART) -> str:
    base = (SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * s)
    ctes = [
        f"""nodes AS (
            SELECT n_nationkey AS id,
                   CAST(n_regionkey = {PPR_REGION} AS BIGINT) AS is_r
            FROM nation
        ),
        edges AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        outw AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
        r0 AS MATERIALIZED (
            SELECT id, CAST(is_r * {SCALE // s} AS BIGINT) AS rank FROM nodes
        )"""
    ]
    for i in range(1, num_iter + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
            SELECT COALESCE(sum(rank), 0) // {s} AS dm FROM r{p}
            WHERE id NOT IN (SELECT src FROM outw)
        ),
        c{i} AS MATERIALIZED (
            SELECT e.dst AS id, sum((r.rank * e.w) // o.ow) AS cin
            FROM edges e
            JOIN r{p} r ON e.src = r.id
            JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ),
        r{i} AS MATERIALIZED (
            SELECT nodes.id,
                   nodes.is_r * {base}
                   + ({DAMPING_NUM} * (COALESCE(c.cin, 0) + nodes.is_r * d.dm))
                       // {DAMPING_DEN} AS rank
            FROM nodes LEFT JOIN c{i} c ON nodes.id = c.id CROSS JOIN d{i} d
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT r.id AS nationkey, n.n_name, CAST(r.rank AS BIGINT) AS rank_units
        FROM r{num_iter} r JOIN nation n ON r.id = n.n_nationkey"""
    )


ORACLES["ppr_region_nations"] = _ppr_sql()


# ------------------------------------------------------------- TextRank
# Keyword extraction as PageRank over the corpus word co-occurrence
# graph (Mihalcea & Tarau 2004, "TextRank: Bringing Order into Text")
# — the composition showcase: the exact-fixed-point pagerank operator
# runs unchanged on a graph built from text instead of trade flows.
# Nodes = the top-TR_VOCAB corpus tokens by frequency (deterministic
# count-desc/token-asc cap — bounds the graph at a CONSTANT regardless
# of corpus size, the scale contract); edges = adjacent-token
# co-occurrence counts, symmetrized, self-loops dropped. 10 damped
# iterations in 1/SCALE integer units; output = top TR_TOPK keywords.
#
# The oracle cannot bake |nodes| into literals the way pagerank_nations
# does (the vocabulary cap may not bind on small fixtures), so every
# unrolled round cross-joins a 1-row params CTE carrying n — the same
# integer arithmetic, n resolved at bind time.

TR_VOCAB = 200
TR_TOPK = 20
TR_ITERS = 10


def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    # r13 OPT: three consumers referenced the tokenize scan (the vocab
    # count inside pagerank(), the node checkpoint, and the pair
    # build), so the corpus was tokenized THREE times per call.
    # Materialize the tokenized relation and the 200-row vocab once —
    # localCheckpoint(eager=False), CacheManager-free.
    toks = (
        docs.select(tokenize(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
        .localCheckpoint(eager=False)
    )
    words = toks.select(F.explode("t").alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(TR_VOCAB)
        .select("w")
        .localCheckpoint(eager=False)
    )
    # adjacent pairs via the zip-at-explode idiom (no window, no HOF)
    pairs = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, F.size("t") - 1),
                    F.slice(F.col("t"), 2, F.size("t") - 1),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .join(F.broadcast(vocab.withColumnRenamed("w", "a")), "a")
        .join(F.broadcast(vocab.withColumnRenamed("w", "b")), "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).groupBy("a", "b").agg(F.sum("w").alias("w"))
    pr = pagerank(
        vocab.select(F.col("w").alias("id")),
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w"),
        num_iter=TR_ITERS,
    )
    return (
        pr.orderBy(F.desc("rank_units"), F.asc("id"))
        .limit(TR_TOPK)
        .select(F.col("id").alias("keyword"), "rank_units")
    )


QUERIES["text_textrank_keywords"] = text_textrank_keywords


def _sql_textrank() -> str:
    from ..functions.hashing import sql_tokens

    ctes = [
        f"""toks AS MATERIALIZED (
            SELECT {sql_tokens('text')} AS t FROM documents
            WHERE len({sql_tokens('text')}) > 0
        ),
        vocab AS MATERIALIZED (
            SELECT w FROM (
                SELECT unnest(t) AS w FROM toks
            ) GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT {TR_VOCAB}
        ),
        rawpairs AS (
            SELECT p['a'] AS a, p['b'] AS b FROM (
                SELECT unnest(list_transform(range(1, len(t)),
                    i -> {{'a': t[i], 'b': t[i + 1]}})) AS p
                FROM toks
            ) WHERE p['a'] != p['b']
        ),
        dpairs AS (
            SELECT a, b, count(*) AS w FROM rawpairs
            WHERE a IN (SELECT w FROM vocab) AND b IN (SELECT w FROM vocab)
            GROUP BY 1, 2
        ),
        edges AS MATERIALIZED (
            SELECT a AS src, b AS dst, CAST(sum(w) AS BIGINT) AS w FROM (
                SELECT a, b, w FROM dpairs
                UNION ALL SELECT b AS a, a AS b, w FROM dpairs
            ) GROUP BY 1, 2
        ),
        params AS MATERIALIZED (
            SELECT count(*) AS n,
                   CAST({SCALE} AS BIGINT) // count(*) AS r_init,
                   CAST({SCALE * (DAMPING_DEN - DAMPING_NUM)} AS BIGINT)
                       // ({DAMPING_DEN} * count(*)) AS base
            FROM vocab
        ),
        outw AS MATERIALIZED (
            SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src
        ),
        r0 AS MATERIALIZED (
            SELECT w AS id, (SELECT r_init FROM params) AS rank FROM vocab
        )"""
    ]
    for i in range(1, TR_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
            SELECT COALESCE(sum(rank), 0) // (SELECT n FROM params) AS dm
            FROM r{p} WHERE id NOT IN (SELECT src FROM outw)
        ),
        c{i} AS MATERIALIZED (
            SELECT e.dst AS id, sum((r.rank * e.w) // o.ow) AS cin
            FROM edges e
            JOIN r{p} r ON e.src = r.id
            JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ),
        r{i} AS MATERIALIZED (
            SELECT v.w AS id,
                   pp.base + ({DAMPING_NUM} * (COALESCE(c.cin, 0) + d.dm))
                       // {DAMPING_DEN} AS rank
            FROM vocab v
            LEFT JOIN c{i} c ON v.w = c.id
            CROSS JOIN d{i} d CROSS JOIN params pp
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT id AS keyword, CAST(rank AS BIGINT) AS rank_units
        FROM r{TR_ITERS}
        ORDER BY rank DESC, id ASC LIMIT {TR_TOPK}"""
    )


ORACLES["text_textrank_keywords"] = _sql_textrank()


# ------------------------------------------------------- link prediction
# Common-neighbor / Jaccard link prediction (Liben-Nowell & Kleinberg
# 2003) on the co-purchase part graph: for every NON-adjacent pair
# reachable through at least one shared neighbor, score = |N(x)∩N(z)| /
# |N(x)∪N(z)| — the classic "parts bought together with the same third
# parts will co-occur next" recommender signal, and the graph-ML
# baseline every embedding link predictor is measured against. Edge
# set reuses copurchase_pairs' exact rail (distinct basket pairs,
# MAX_BASKET cap, MIN_SUPPORT ≥ 2), so the graph contract is already
# driver-verified. Scores are exact BIGINT rationals; ranking breaks
# ties (score desc, x, z) — total.
#
# Scale: candidate generation is the wedge join (Σ_y deg(y)² pairs) —
# the same profile as triangle counting; the basket cap upstream is
# the hub-buster (a part in B baskets has deg ≤ B·MAX_BASKET), and
# production graphs add a degree cap before wedging (documented, same
# discipline as the LSH hot-bucket cap). The anti-join against the
# edge set and the TakeOrdered top-K avoid any global sort.

LINKPRED_TOPK = 50


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_micros
    from .mining import _copurchase_pairs_shared

    # r13 OPT: the support-filtered edge set is the IDENTICAL
    # copurchase_pairs build (distinct → basket cap → self-join →
    # support filter) — ride the shared artifact instead of re-running
    # the basket pair join per call. It is SMALL (~3.5k rows at sf0.1:
    # support starves as the catalog grows) but referenced by FIVE
    # consumers here (adj×2, deg, wedges×2, anti-join), which is why
    # the artifact (a materialized LogicalRDD) matters — without it
    # each consumer re-executes the full pair join (the 36-scan plan
    # the round-9 audit caught).
    e = _copurchase_pairs_shared(spark, sf_dir).select(
        F.col("part_a").alias("a"), F.col("part_b").alias("b")
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    l, r = adj.alias("l"), adj.alias("r")
    wedges = (
        l.join(
            r,
            (F.col("l.v") == F.col("r.u")) & (F.col("l.u") < F.col("r.v")),
        )
        .groupBy(F.col("l.u").alias("x"), F.col("r.v").alias("z"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = wedges.join(
        e, (wedges["x"] == e["a"]) & (wedges["z"] == e["b"]), "left_anti"
    )
    dx = deg.select(F.col("u").alias("x"), F.col("deg").alias("deg_x"))
    dz = deg.select(F.col("u").alias("z"), F.col("deg").alias("deg_z"))
    scored = (
        cand.join(dx, "x")
        .join(dz, "z")
        .select(
            "x",
            "z",
            "cn",
            "deg_x",
            "deg_z",
            ratio_micros("cn", "deg_x + deg_z - cn").alias("jaccard_micros"),
        )
    )
    return (
        scored.orderBy(F.desc("jaccard_micros"), F.asc("x"), F.asc("z"))
        .limit(LINKPRED_TOPK)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                W.orderBy(F.desc("jaccard_micros"), F.asc("x"), F.asc("z"))
            )
            .cast("int"),
        )
    )


QUERIES["graph_link_prediction"] = graph_link_prediction


def _linkpred_oracle() -> str:
    from ..functions.rounding import sql_ratio_micros
    from .mining import MAX_BASKET, MIN_SUPPORT

    return f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), small AS (
        SELECT l_orderkey FROM op GROUP BY 1 HAVING count(*) <= {MAX_BASKET}
    ), opc AS (
        SELECT op.* FROM op JOIN small USING (l_orderkey)
    ), e AS (
        SELECT pa.l_partkey AS a, pb.l_partkey AS b
        FROM opc pa JOIN opc pb
          ON pa.l_orderkey = pb.l_orderkey
         AND pa.l_partkey < pb.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
    ), adj AS (
        SELECT a AS u, b AS v FROM e
        UNION ALL SELECT b AS u, a AS v FROM e
    ), deg AS (
        SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1
    ), wedges AS (
        SELECT l.u AS x, r.v AS z, CAST(count(*) AS BIGINT) AS cn
        FROM adj l JOIN adj r ON l.v = r.u AND l.u < r.v
        GROUP BY 1, 2
    ), cand AS (
        SELECT w.* FROM wedges w
        LEFT JOIN e ON w.x = e.a AND w.z = e.b
        WHERE e.a IS NULL
    ), scored AS (
        SELECT x, z, cn, dx.deg AS deg_x, dz.deg AS deg_z,
               {sql_ratio_micros('cn', 'dx.deg + dz.deg - cn')}
                   AS jaccard_micros
        FROM cand
        JOIN deg dx ON cand.x = dx.u
        JOIN deg dz ON cand.z = dz.u
    )
    SELECT x, z, cn, deg_x, deg_z, jaccard_micros,
           CAST(row_number() OVER (
               ORDER BY jaccard_micros DESC, x ASC, z ASC
           ) AS INTEGER) AS rank
    FROM scored
    ORDER BY jaccard_micros DESC, x ASC, z ASC
    LIMIT {LINKPRED_TOPK}
"""


ORACLES["graph_link_prediction"] = _linkpred_oracle()


# --------------------------------------------- degree assortativity
# Round 10: Newman's degree-assortativity coefficient over the
# part–supplier procurement graph (distinct (l_partkey, l_suppkey)
# edges) — the one-number answer to "do high-degree vertices attach to
# high-degree vertices", the structural summary used to pick
# partitioning and sampling strategies before running heavier graph
# algorithms (hub-and-spoke vs mesh changes both). Computed as the
# Pearson correlation of (deg(part), deg(supplier)) across edges.
#
# Exactness rail: degrees are exact distinct counts; all six moments
# accumulate in DECIMAL(38,0)/HUGEINT (quality_correlation's rail —
# Σd² over edges passes int64 at scale); the ONLY doubles are the
# final sqrt·sqrt·divide chain under pround(…, 6), the vetted Pearson
# finalization.
#
# Scale: one distinct on the fact-table edge pair (a shuffle keyed on
# the pair), two degree aggregations (each one exchange over the edge
# relation), two id-keyed joins to attach degrees, one global
# aggregate. Nothing quadratic; the joins broadcast when a side is
# dim-sized and shuffle otherwise — AQE's call.

def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    dp = edges.groupBy("p").agg(F.count(F.lit(1)).alias("dx"))
    ds = edges.groupBy("s").agg(F.count(F.lit(1)).alias("dy"))
    dec = "decimal(38,0)"
    e = edges.join(dp, "p").join(ds, "s")
    agg = e.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("dx").cast(dec)).alias("sx"),
        F.sum(F.col("dy").cast(dec)).alias("sy"),
        F.sum((F.col("dx") * F.col("dy")).cast(dec)).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast(dec)).alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast(dec)).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        F.col("n").cast("long").alias("n_edges"),
        pround(
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            6,
        ).alias("assortativity"),
    )


QUERIES["graph_degree_assortativity"] = graph_degree_assortativity

ORACLES["graph_degree_assortativity"] = """
    WITH edges AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ), dp AS (
        SELECT p, CAST(count(*) AS BIGINT) AS dx FROM edges GROUP BY p
    ), ds AS (
        SELECT s, CAST(count(*) AS BIGINT) AS dy FROM edges GROUP BY s
    ), e AS (
        SELECT dx, dy
        FROM edges JOIN dp ON edges.p = dp.p JOIN ds ON edges.s = ds.s
    ), agg AS (
        SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
               sum(CAST(dx AS DECIMAL(38,0))) AS sx,
               sum(CAST(dy AS DECIMAL(38,0))) AS sy,
               sum(CAST(dx * dy AS DECIMAL(38,0))) AS sxy,
               sum(CAST(dx * dx AS DECIMAL(38,0))) AS sxx,
               sum(CAST(dy * dy AS DECIMAL(38,0))) AS syy
        FROM e
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS assortativity
    FROM agg
"""


# ------------------------------------------------------ brand modularity
# Round 10: Newman–Girvan modularity Q of the BRAND partition over the
# co-purchase graph (the link-prediction edge rail: support-filtered
# part pairs in small baskets) — "do customers buy within brand"
# quantified against the degree-preserving null model. This is the
# community-quality score every Louvain/label-propagation run
# optimizes; computing it for a GIVEN business partition is both the
# baseline those algorithms must beat and a direct merchandising
# readout. Q = [4m·Σ_c e_c − Σ_c d_c²] / (4m²), all terms exact
# integers: m = |edges|, e_c = within-brand edges, d_c = Σ degrees of
# brand-c nodes. The one signed quotient is a half-up rational on the
# DECIMAL/HUGEINT wide rail with an explicit sign split (the kappa/LTV
# convention — integer div truncates toward zero, so the formula is
# applied to |num| and the sign re-attached).
#
# Scale: reuses the checkpointed support-filtered edge set (bounded by
# support starvation, the link-prediction note); brands attach via two
# broadcast-joins against the part dim; everything after is one
# |brands|-row aggregate.

def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .mining import _copurchase_pairs_shared

    # r13 OPT: the identical copurchase_pairs build — ride the shared
    # artifact (three consumers here: brand join ×2 via adj + m count)
    e = _copurchase_pairs_shared(spark, sf_dir).select(
        F.col("part_a").alias("a"), F.col("part_b").alias("b")
    )
    brand = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand")
    )
    eb = (
        e.join(
            F.broadcast(brand.select(F.col("p_partkey").alias("a"),
                                     F.col("p_brand").alias("brand_a"))),
            "a",
        ).join(
            F.broadcast(brand.select(F.col("p_partkey").alias("b"),
                                     F.col("p_brand").alias("brand_b"))),
            "b",
        )
    )
    # d_c via the symmetrized endpoint relation: each edge contributes
    # one degree to each endpoint's brand
    ends = eb.select(F.col("brand_a").alias("c")).unionByName(
        eb.select(F.col("brand_b").alias("c"))
    )
    d = ends.groupBy("c").agg(F.count(F.lit(1)).alias("d_c"))
    internal = (
        eb.filter(F.col("brand_a") == F.col("brand_b"))
        .groupBy(F.col("brand_a").alias("c"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    per = d.join(internal, "c", "left").select(
        "c", "d_c", F.coalesce("e_c", F.lit(0)).alias("e_c")
    )
    m = eb.agg(F.count(F.lit(1)).alias("m"))
    dec = "decimal(38,0)"
    agg = per.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("e_c").alias("sum_internal"),
        F.sum((F.col("d_c") * F.col("d_c")).cast(dec)).alias("sum_d2"),
    ).crossJoin(F.broadcast(m))
    num = (
        F.lit(4).cast(dec) * F.col("m").cast(dec) * F.col("sum_internal").cast(dec)
        - F.col("sum_d2")
    )
    den = F.lit(4).cast(dec) * F.col("m").cast(dec) * F.col("m").cast(dec)
    q_abs = F.expr(
        "(2 * 1000000 * abs_num + q_den) div (2 * q_den)"
    )
    return (
        agg.select(
            F.col("m").cast("long").alias("n_edges"),
            "n_communities",
            F.col("sum_internal").cast("long").alias("internal_edges"),
            F.abs(num).alias("abs_num"),
            F.signum(num.cast("double")).cast("long").alias("sgn"),
            den.alias("q_den"),
        )
        .select(
            "n_edges",
            "n_communities",
            "internal_edges",
            (F.col("sgn") * q_abs).cast("long").alias("q_micros"),
        )
    )


QUERIES["graph_modularity"] = graph_modularity


def _modularity_oracle() -> str:
    from .mining import MAX_BASKET, MIN_SUPPORT

    return f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), small AS (
        SELECT l_orderkey FROM op GROUP BY 1 HAVING count(*) <= {MAX_BASKET}
    ), opc AS (
        SELECT op.* FROM op JOIN small USING (l_orderkey)
    ), e AS (
        SELECT pa.l_partkey AS a, pb.l_partkey AS b
        FROM opc pa JOIN opc pb
          ON pa.l_orderkey = pb.l_orderkey
         AND pa.l_partkey < pb.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
    ), eb AS (
        SELECT ba.p_brand AS brand_a, bb.p_brand AS brand_b
        FROM e
        JOIN part ba ON e.a = ba.p_partkey
        JOIN part bb ON e.b = bb.p_partkey
    ), ends AS (
        SELECT brand_a AS c FROM eb UNION ALL SELECT brand_b AS c FROM eb
    ), d AS (
        SELECT c, CAST(count(*) AS BIGINT) AS d_c FROM ends GROUP BY 1
    ), internal AS (
        SELECT brand_a AS c, CAST(count(*) AS BIGINT) AS e_c
        FROM eb WHERE brand_a = brand_b GROUP BY 1
    ), per AS (
        SELECT d.c, d.d_c, coalesce(internal.e_c, 0) AS e_c
        FROM d LEFT JOIN internal ON d.c = internal.c
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS m FROM eb
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_communities,
               CAST(sum(e_c) AS BIGINT) AS sum_internal,
               CAST(sum(CAST(d_c AS HUGEINT) * d_c) AS HUGEINT) AS sum_d2
        FROM per
    )
    SELECT m.m AS n_edges,
           agg.n_communities,
           agg.sum_internal AS internal_edges,
           CAST(CASE WHEN num >= 0
                     THEN (2 * 1000000 * num + q_den) // (2 * q_den)
                     ELSE -((2 * 1000000 * (-num) + q_den) // (2 * q_den))
                END AS BIGINT) AS q_micros
    FROM agg, m,
         LATERAL (SELECT 4 * CAST(m.m AS HUGEINT) * agg.sum_internal
                         - agg.sum_d2 AS num,
                         4 * CAST(m.m AS HUGEINT) * m.m AS q_den) t
"""


ORACLES["graph_modularity"] = _modularity_oracle()


# ---------------------------------------------------------- HITS
HITS_ITER = 4


def graph_hits_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted HITS hubs & authorities on the nation trade graph —
    the mutual-reinforcement companion of pagerank_nations: a nation
    is a strong HUB when it supplies nations that are strong
    AUTHORITIES (heavy buyers from strong suppliers), the classic
    bipartite-flavor ranking PageRank's single score conflates
    (Kleinberg 1999, the reference's MapReduce workload class).

    Exact fixed-point integer iteration (operators/pagerank.py:hits);
    the oracle unrolls the identical 4-round chain as CTEs with
    HUGEINT accumulation and the same half-up normalization rational.
    """
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    ha = hits(
        nodes, _trade_edges(spark, sf_dir), num_iter=HITS_ITER
    )
    return ha.join(F.broadcast(nation), ha.id == nation.n_nationkey).select(
        F.col("id").alias("nationkey"), "n_name", "auth_units", "hub_units"
    )


QUERIES["graph_hits_nations"] = graph_hits_nations


def _hits_sql(num_iter: int = HITS_ITER, n: int = N_NATIONS) -> str:
    """Unrolled-CTE twin of the HITS fixed-point loop (same constants,
    HUGEINT accumulation, identical half-up normalization)."""

    def norm(raw: str, col: str) -> str:
        return f"""(
            SELECT nodes.id,
                   CAST((2 * {SCALE}::HUGEINT
                         * coalesce({raw}.{col}, 0) + t.tot)
                        // (2 * t.tot) AS BIGINT) AS {col}
            FROM nodes
            LEFT JOIN {raw} ON nodes.id = {raw}.id
            CROSS JOIN (SELECT sum({col}) AS tot FROM {raw}) t
        )"""

    ctes = [
        f"""nodes AS (SELECT n_nationkey AS id FROM nation),
        edges AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        h0 AS MATERIALIZED (
            SELECT id, CAST({SCALE // n} AS BIGINT) AS h FROM nodes)"""
    ]
    for i in range(1, num_iter + 1):
        p = i - 1
        ctes.append(
            f"""ar{i} AS MATERIALIZED (
            SELECT e.dst AS id, sum(CAST(r.h AS HUGEINT) * e.w) AS a
            FROM edges e JOIN h{p} r ON e.src = r.id GROUP BY e.dst
        ),
        a{i} AS MATERIALIZED {norm(f'ar{i}', 'a')},
        hr{i} AS MATERIALIZED (
            SELECT e.src AS id, sum(CAST(r.a AS HUGEINT) * e.w) AS h
            FROM edges e JOIN a{i} r ON e.dst = r.id GROUP BY e.src
        ),
        h{i} AS MATERIALIZED {norm(f'hr{i}', 'h')}"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT a.id AS nationkey, n.n_name,
               a.a AS auth_units, h.h AS hub_units
        FROM a{num_iter} a
        JOIN h{num_iter} h ON a.id = h.id
        JOIN nation n ON a.id = n.n_nationkey"""
    )


ORACLES["graph_hits_nations"] = _hits_sql()


# --------------------------------------------- label propagation (LPA)
LPA_ROUNDS = 4


def graph_labelprop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan 2007) on the
    undirected trade graph — the linear-time community DETECTOR next
    to graph_modularity's community SCORER (score a given partition)
    and dedup_clusters' connected components (communities ignore
    density; LPA follows it). Deterministic variant: fixed rounds,
    every node updates simultaneously to the label with the highest
    incident edge weight, ties broken on the SMALLEST label — no
    randomness, so the oracle unrolls the identical chain as CTEs.

    Scale: per round one O(edges) join + groupBy + per-node argmax
    window (partitioned by node — never global); lineage truncated per
    round with localCheckpoint. Self-loops are excluded so a node's
    own label never votes for itself (the standard formulation).
    """
    from pyspark.sql import Window as W

    nation = load_table(spark, sf_dir, "nation")
    e = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    und0 = (
        e.select("src", "dst", "w")
        .unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        # one fact scan: the undirected relation feeds BOTH the mean
        # threshold and the filtered edge set
        .localCheckpoint()
    )
    # sparsify to ABOVE-AVERAGE edges before propagating — production
    # LPA on a near-complete weighted graph always thresholds first
    # (propagation on a dense graph collapses to one label in O(1)
    # rounds); w·|E| > Σw is the integer-exact above-mean test
    tot = und0.agg(
        F.count(F.lit(1)).alias("m"), F.sum("w").alias("sw")
    )
    und = (
        und0.crossJoin(F.broadcast(tot))
        .filter(F.col("w") * F.col("m") > F.col("sw"))
        .select("src", "dst", "w")
        .localCheckpoint()
    )
    nodes = nation.select(F.col("n_nationkey").alias("id")).localCheckpoint()
    labels = nodes.select("id", F.col("id").alias("label"))
    rw = W.partitionBy("src").orderBy(F.desc("wsum"), F.asc("label"))
    for _ in range(LPA_ROUNDS):
        support = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src", "label")
            .agg(F.sum("w").alias("wsum"))
        )
        winner = (
            support.withColumn("rn", F.row_number().over(rw))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("id"), F.col("label").alias("new"))
        )
        labels = (
            labels.join(winner, "id", "left")
            .select("id", F.coalesce("new", "label").alias("label"))
            .localCheckpoint()
        )
    sized = labels.withColumn(
        "community_size",
        F.count(F.lit(1)).over(W.partitionBy("label")),
    )
    return sized.join(
        F.broadcast(nation), sized.id == nation.n_nationkey
    ).select(
        F.col("id").alias("nationkey"),
        "n_name",
        F.col("label").alias("community"),
        "community_size",
    )


QUERIES["graph_labelprop_communities"] = graph_labelprop_communities


def _lpa_sql(rounds: int = LPA_ROUNDS) -> str:
    ctes = [
        """nodes AS (SELECT n_nationkey AS id FROM nation),
        e AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            WHERE s_nationkey <> c_nationkey
            GROUP BY 1, 2
        ),
        und0 AS MATERIALIZED (
            SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
                SELECT src, dst, w FROM e
                UNION ALL
                SELECT dst AS src, src AS dst, w FROM e
            ) GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(w) AS BIGINT) AS sw
            FROM und0
        ),
        und AS MATERIALIZED (
            SELECT src, dst, w FROM und0 CROSS JOIN tot
            WHERE w * m > sw
        ),
        l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""s{i} AS MATERIALIZED (
            SELECT und.src, l.label, sum(und.w) AS wsum
            FROM und JOIN l{p} l ON und.dst = l.id
            GROUP BY 1, 2
        ),
        w{i} AS MATERIALIZED (
            SELECT src AS id, label AS new FROM (
                SELECT src, label,
                       row_number() OVER (
                           PARTITION BY src
                           ORDER BY wsum DESC, label ASC) AS rn
                FROM s{i}
            ) WHERE rn = 1
        ),
        l{i} AS MATERIALIZED (
            SELECT nodes.id, coalesce(w.new, l.label) AS label
            FROM nodes
            JOIN l{p} l ON nodes.id = l.id
            LEFT JOIN w{i} w ON nodes.id = w.id
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT l.id AS nationkey, n.n_name,
               CAST(l.label AS BIGINT) AS community,
               CAST(count(*) OVER (PARTITION BY l.label) AS BIGINT)
                   AS community_size
        FROM l{rounds} l JOIN nation n ON l.id = n.n_nationkey"""
    )


ORACLES["graph_labelprop_communities"] = _lpa_sql()


# ------------------------------------- local clustering coefficient
# Round 11 (re-planned round 12, VERDICT r11 item 1): the node-level
# cohesion readout on the supplier co-shipment graph —
# triangle_suppliers counts the global total; curation/link-prediction
# passes want WHERE the graph is clique-like:
# lc(v) = 2·T(v)/(d(v)·(d(v)−1)) over the support-filtered,
# degree-capped projection (_supplier_cograph — the raw projection is
# near-complete, so sparsify BEFORE any triangle work). Triangles
# enumerate once each through the (degree, id)-oriented wedge-close
# join (operators/graph.py degree_oriented_triangles); per-node counts
# come from three per-corner-role groupBys on the localCheckpoint-ed
# triangle relation — no ×3 corner explode (r11 item 1b). Exact
# integers throughout; lc is a half-up micros rational; degrees are
# the FILTERED graph's (the same graph the triangles live in).


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec
    from ..operators.graph import degree_oriented_triangles

    tris, deg = degree_oriented_triangles(_supplier_cograph(spark, sf_dir))
    # one materialization feeds all three corner-role aggregates
    # (exactness-rails rule f: multi-consumer relations checkpoint once)
    tris = tris.localCheckpoint(eager=False)
    per_node = (
        tris.groupBy(F.col("x1").alias("v")).agg(F.count(F.lit(1)).alias("t"))
        .unionByName(
            tris.groupBy(F.col("x2").alias("v")).agg(F.count(F.lit(1)).alias("t"))
        )
        .unionByName(
            tris.groupBy(F.col("x3").alias("v")).agg(F.count(F.lit(1)).alias("t"))
        )
        .groupBy("v")
        .agg(F.sum("t").alias("t"))
    )
    out = deg.join(per_node, "v", "left").select(
        F.col("v").alias("supplier"),
        F.col("d").alias("degree"),
        F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
        F.when(F.col("d") < 2, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec("2 * coalesce(t, 0)", "CAST(d AS DECIMAL(38,0)) * (d - 1)")
        )
        .alias("lc_micros"),
    )
    return out


QUERIES["graph_clustering_coefficient"] = graph_clustering_coefficient

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_cc  # noqa: E402

ORACLES["graph_clustering_coefficient"] = (
    "WITH "
    + _cograph_sql_ctes()
    + f""",
    per_node AS (
        SELECT v, CAST(sum(t) AS BIGINT) AS t FROM (
            SELECT x1 AS v, count(*) AS t FROM tri GROUP BY 1
            UNION ALL SELECT x2 AS v, count(*) AS t FROM tri GROUP BY 1
            UNION ALL SELECT x3 AS v, count(*) AS t FROM tri GROUP BY 1
        ) GROUP BY v
    )
    SELECT deg.v AS supplier, deg.d AS degree,
           CAST(coalesce(per_node.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.d < 2 THEN NULL
                ELSE {_sql_rud_cc('2 * coalesce(per_node.t, 0)',
                                  'CAST(deg.d AS HUGEINT) * (deg.d - 1)')}
           END AS lc_micros
    FROM deg LEFT JOIN per_node ON deg.v = per_node.v
"""
)


# ----------------------------------------------------------- k-truss
# Round 12: the cohesion LADDER above the clustering coefficient —
# lc(v) reads how clique-like a NODE's neighborhood is; the k-truss
# extracts the SUBGRAPH where every edge participates in ≥ k−2
# triangles (Cohen 2008), the standard community-core primitive a
# pipeline runs before treating co-occurrence edges as trustworthy.
# Deterministic bounded-round discipline (the pagerank/LPA house
# style): KTRUSS_ROUNDS fixed support-peel rounds over the shared
# support-filtered, degree-capped projection (_supplier_cograph),
# then one support REPORT pass on the survivors — at fixpoint this
# equals the exact k-truss, and the oracle unrolls the identical
# chain as CTEs so even the non-converged prefix is differentially
# exact. Per-edge supports come from the degree-oriented triangle
# enumerator with per-corner-pair groupBys (no explode — the same
# r12 discipline as graph_clustering_coefficient); each round
# re-orients by the CURRENT (peeled) degrees, exactly as the oracle
# does. Scale: rounds × O(m^1.5) wedge joins on an n·cap-bounded edge
# relation, lineage truncated per round with localCheckpoint.

KTRUSS_K = 4
KTRUSS_ROUNDS = 2


def _edge_support(edges: DataFrame) -> DataFrame:
    """(a, b, support): triangles through each canonical edge, via the
    degree-oriented enumerator + three corner-PAIR groupBys."""
    from ..operators.graph import degree_oriented_triangles

    tris, _ = degree_oriented_triangles(edges, assume_canonical=True)
    tris = tris.localCheckpoint(eager=False)

    def role(u: str, v: str) -> DataFrame:
        return tris.groupBy(
            F.least(F.col(u), F.col(v)).alias("a"),
            F.greatest(F.col(u), F.col(v)).alias("b"),
        ).agg(F.count(F.lit(1)).alias("t"))

    return (
        role("x1", "x2")
        .unionByName(role("x1", "x3"))
        .unionByName(role("x2", "x3"))
        .groupBy("a", "b")
        .agg(F.sum("t").alias("support"))
    )


def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _supplier_cograph(spark, sf_dir).localCheckpoint(eager=False)
    for _ in range(KTRUSS_ROUNDS):
        sup = _edge_support(e)
        e = (
            e.join(sup, ["a", "b"], "left")
            .filter(F.coalesce("support", F.lit(0)) >= KTRUSS_K - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    sup = _edge_support(e)
    return e.join(sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


QUERIES["graph_ktruss"] = graph_ktruss


def _ktruss_sql(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    parts = [
        "WITH " + _cograph_sql_ctes(),
        "e0 AS (SELECT a, b FROM e)",
    ]
    orient = (
        "CASE WHEN da.d < db.d OR (da.d = db.d AND s.a < s.b)"
        " THEN s.{lo} ELSE s.{hi} END"
    )
    for i in range(rounds + 1):
        parts.append(
            f"""deg{i} AS MATERIALIZED (
            SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i}
            ) GROUP BY v
        ),
        oe{i} AS MATERIALIZED (
            SELECT {orient.format(lo='a', hi='b')} AS u,
                   {orient.format(lo='b', hi='a')} AS x
            FROM e{i} s
            JOIN deg{i} da ON s.a = da.v JOIN deg{i} db ON s.b = db.v
        ),
        tri{i} AS MATERIALIZED (
            SELECT e1.u AS x1, e1.x AS x2, e2.x AS x3
            FROM oe{i} e1
            JOIN oe{i} e2 ON e1.x = e2.u
            JOIN oe{i} e3 ON e3.u = e1.u AND e3.x = e2.x
        ),
        sup{i} AS MATERIALIZED (
            SELECT a, b, CAST(sum(t) AS BIGINT) AS support FROM (
                SELECT least(x1, x2) AS a, greatest(x1, x2) AS b,
                       count(*) AS t FROM tri{i} GROUP BY 1, 2
                UNION ALL
                SELECT least(x1, x3), greatest(x1, x3), count(*)
                FROM tri{i} GROUP BY 1, 2
                UNION ALL
                SELECT least(x2, x3), greatest(x2, x3), count(*)
                FROM tri{i} GROUP BY 1, 2
            ) GROUP BY a, b
        )"""
        )
        if i < rounds:
            parts.append(
                f"""e{i + 1} AS MATERIALIZED (
                SELECT e{i}.a, e{i}.b FROM e{i}
                LEFT JOIN sup{i} s ON e{i}.a = s.a AND e{i}.b = s.b
                WHERE coalesce(s.support, 0) >= {k - 2}
            )"""
            )
    return (
        ",\n".join(parts)
        + f"""
        SELECT t.a, t.b, CAST(coalesce(s.support, 0) AS BIGINT) AS support
        FROM e{rounds} t
        LEFT JOIN sup{rounds} s ON t.a = s.a AND t.b = s.b
    """
    )


ORACLES["graph_ktruss"] = _ktruss_sql()


# -------------------------------------------------- rich-club coefficient
# Round 12: the hub-interconnection readout completing the cohesion
# family (lc(v): node-local; k-truss: edge support; rich-club: do the
# HIGH-DEGREE nodes preferentially wire to each other?) — Zhou &
# Mondragón 2004: φ(k) = 2·E_k / (n_k·(n_k−1)) over the subgraph
# induced by nodes of degree > k. On a co-shipment projection a high
# φ at large k means the top suppliers form a near-clique (broadcast/
# skew planning signal). Same shared support-filtered, degree-capped
# projection as the other triangle-family queries; for each k the
# induced-subgraph edge count is one semi-join pair, so the whole
# curve is |K| broadcast-able passes over the n·cap-bounded edge
# relation. Exact integers; φ in half-up micros.

RICHCLUB_KS = [5, 10, 20, 40]


def graph_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    e = _supplier_cograph(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    out = None
    for k in RICHCLUB_KS:
        rich = deg.filter(F.col("d") > k).select("v")
        nk = rich.agg(F.count(F.lit(1)).alias("n_k"))
        ek = (
            e.join(rich.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(rich.withColumnRenamed("v", "b"), "b", "left_semi")
            .agg(F.count(F.lit(1)).alias("e_k"))
        )
        row = nk.crossJoin(ek).select(
            F.lit(k).cast("int").alias("k"),
            F.col("n_k").cast("long").alias("n_k"),
            F.col("e_k").cast("long").alias("e_k"),
            F.when(F.col("n_k") < 2, F.lit(None).cast("long"))
            .otherwise(
                ratio_units_dec(
                    "2 * e_k", "CAST(n_k AS DECIMAL(38,0)) * (n_k - 1)"
                )
            )
            .alias("phi_micros"),
        )
        out = row if out is None else out.unionByName(row)
    return out


QUERIES["graph_richclub"] = graph_richclub

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_rc  # noqa: E402


def _richclub_sql() -> str:
    rows = []
    for k in RICHCLUB_KS:
        rows.append(
            f"""SELECT CAST({k} AS INTEGER) AS k,
               (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE d > {k})
                   AS n_k,
               (SELECT CAST(count(*) AS BIGINT) FROM e
                WHERE a IN (SELECT v FROM deg WHERE d > {k})
                  AND b IN (SELECT v FROM deg WHERE d > {k})) AS e_k"""
        )
    return (
        "WITH "
        + _cograph_sql_ctes()
        + f""",
        curve AS ({' UNION ALL '.join(rows)})
        SELECT k, n_k, e_k,
               CASE WHEN n_k < 2 THEN NULL
                    ELSE {_sql_rud_rc('2 * e_k',
                                      'CAST(n_k AS HUGEINT) * (n_k - 1)')}
               END AS phi_micros
        FROM curve
    """
    )


ORACLES["graph_richclub"] = _richclub_sql()


# ------------------------------------------------ global transitivity
# Round 12: the one-number closure of the cohesion family — local
# clustering (per node), k-truss (per edge), rich-club (per degree
# tier) all read SLICES of triangle structure; the global transitivity
# ratio C = 3·Δ / W (Newman 2003; W = Σ_v C(d_v, 2) wedges) is the
# whole-graph summary a pipeline dashboards next to them, and it is
# NOT the mean of lc(v) (the two diverge on skewed degree sequences —
# hubs dominate W but not the lc average). Rides the SHARED
# support-filtered, degree-capped projection and the degree-oriented
# enumerator, so the 3·Δ ≤ W invariant holds against
# triangle_suppliers by construction. Exact integers end-to-end
# (wedge sums in DECIMAL(38,0)/HUGEINT — Σd(d−1)/2 is quadratic in
# degree); C is a half-up micros rational, NULL on a wedge-free graph.


def graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec
    from ..operators.graph import degree_oriented_triangles

    tris, deg = degree_oriented_triangles(_supplier_cograph(spark, sf_dir))
    # ONE aggregation job over the tagged union — two separate 1-row
    # aggregates crossJoined re-materialized the (lazily
    # checkpointed) enumeration once per side, tripling warm time
    parts = tris.select(
        F.lit(1).alias("is_tri"), F.lit(None).cast("long").alias("d")
    ).unionByName(
        deg.select(F.lit(0).alias("is_tri"), F.col("d").cast("long"))
    )
    w = parts.agg(
        F.sum("is_tri").alias("n_triangles"),
        F.sum(F.when(F.col("is_tri") == 0, 1).otherwise(0)).alias("n_nodes"),
        F.expr("sum(coalesce(d, 0)) div 2").cast("long").alias("n_edges"),
        F.sum(
            F.expr(
                "(CAST(coalesce(d, 0) AS DECIMAL(38,0))"
                " * (coalesce(d, 0) - 1)) div 2"
            )
        ).alias("n_wedges"),
    )
    return w.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_edges",
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.col("n_wedges").cast("long").alias("n_wedges"),
        F.when(F.col("n_wedges") == 0, F.lit(None).cast("long"))
        .otherwise(ratio_units_dec("3 * n_triangles", "n_wedges"))
        .alias("transitivity_micros"),
    )


QUERIES["graph_transitivity"] = graph_transitivity

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_tr  # noqa: E402

ORACLES["graph_transitivity"] = (
    "WITH "
    + _cograph_sql_ctes()
    + f""",
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri),
    wd AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d) // 2 AS BIGINT) AS n_edges,
               CAST(sum(CAST(d AS HUGEINT) * (d - 1) // 2) AS HUGEINT)
                   AS n_wedges
        FROM deg
    )
    SELECT n_nodes, n_edges, n_triangles,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CASE WHEN n_wedges = 0 THEN NULL
                ELSE {_sql_rud_tr('3 * n_triangles', 'n_wedges')}
           END AS transitivity_micros
    FROM wd CROSS JOIN t
"""
)
