"""Mining tier (round 5): market-basket co-occurrence, edit-distance
near-dedup, regex scalar surface, and interval/date-latency rollups.

Scale notes (the 100 TB contract, see SCALE.md):

- ``copurchase_pairs`` is the canonical self-join-on-basket shape. The
  quadratic risk is per-basket fan-out (k items -> k^2/2 pairs), NOT
  the table size, so the rail is a *basket-size cap* applied before the
  pair join — identical on both engines. The join itself is key-equi on
  the basket id, so both sides shuffle-partition on ``l_orderkey`` and
  AQE handles residual skew; no cross join exists anywhere in the plan.
- ``dedup_editdistance`` demonstrates the verify stage of a dedup
  pipeline where the metric (Levenshtein) is O(len^2) per pair: pairs
  are generated only inside deterministic blocks (lang x length-bucket)
  with a row_number cap per block, so worst-case work per block is
  bounded by cap^2 regardless of corpus size. At 100 TB you'd narrow
  candidates with MinHash first (operators/dedup.py) and keep this as
  the exact-verify kernel; the blocking contract is replayed verbatim
  in the oracle so recall is part of the differential check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import token_hash
from ..functions.rounding import pround, ratio_micros, sql_pround, sql_ratio_micros
from ..sources.catalog import load_table

MAX_BASKET = 20  # rail: max distinct parts per order entering the pair join
MIN_SUPPORT = 2  # pairs must co-occur in at least this many orders
LEN_BUCKET = 50  # edit-distance blocking: n_chars bucket width
MAX_BLOCK = 100  # rail: max docs per (lang, bucket) block
MAX_DIST = 8  # emit pairs with levenshtein <= this


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (basket = order).

    distinct(order, part) -> basket-size rail -> self-join on order ->
    pair counts -> support filter. Both shuffles key on ``l_orderkey``
    so AQE reuses the exchange for the two join inputs.
    """
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    small = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket"))
        .filter(F.col("basket") <= MAX_BASKET)
        .select("l_orderkey")
    )
    opc = op.join(small, "l_orderkey")
    a, b = opc.alias("a"), opc.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= MIN_SUPPORT)
    )


#: (applicationId, sf_dir) -> lazily localCheckpoint-ed pair relation.
_COPURCHASE_CACHE: dict[str, DataFrame] = {}


def _copurchase_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once shared co-purchase edge artifact (r13 OPT, the
    _supplier_cograph pattern): the association-rule, link-prediction
    and modularity queries each re-ran the identical distinct→basket-
    cap→self-join→support-filter pair build per call (the dominant
    cost of each). ``copurchase_pairs`` itself (the primary pair
    query) deliberately does NOT ride the cache — its bench row keeps
    measuring the build. Keyed by applicationId (ADVICE r12) so a
    restarted session rebuilds."""
    from ..session import artifact_cached

    return artifact_cached(
        _COPURCHASE_CACHE,
        spark,
        sf_dir,
        lambda: copurchase_pairs(spark, sf_dir).localCheckpoint(eager=False),
    )


def dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance near-dup pairs inside deterministic blocks.

    Blocking is OVERLAPPING: each doc lands in bucket floor(n/W) and
    floor((n + W/2)/W), so two docs whose lengths differ by < W/2 always
    share at least one block — no boundary-straddling misses (a pair
    found in both shared blocks dedupes via DISTINCT). Each (lang,
    bucket) block is capped to the MAX_BLOCK smallest doc_ids
    (row_number — deterministic, replayable). The fixture's planted
    near-dups sit at distance ~4, far under MAX_DIST=8.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("n_chars") / F.lit(LEN_BUCKET)).cast("int"),
                    F.floor(
                        (F.col("n_chars") + F.lit(LEN_BUCKET // 2))
                        / F.lit(LEN_BUCKET)
                    ).cast("int"),
                )
            )
        ).alias("lb"),
    )
    w = Window.partitionBy("lang", "lb").orderBy("doc_id")
    capped = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_BLOCK)
        .drop("rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    # BOUNDED levenshtein (Spark 3.5+ threshold arg): banded DP costs
    # O(len·k) instead of O(len²) and returns -1 past the bound — a
    # ~20× cut at MAX_DIST=8 on ~300-char docs. The checkpoint barrier
    # stops filter pushdown from re-inlining the comparison into a
    # second evaluation (the linkage_customers lesson). Together:
    # sf0.1 went from >5 min (timeout) to seconds.
    scored = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.text"), F.col("b.text"), MAX_DIST).alias("dist"),
        )
        .localCheckpoint(eager=False)
    )
    return (
        scored.filter((F.col("dist") >= 0) & (F.col("dist") <= MAX_DIST)).distinct()
    )


def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract-all token lists, distinct counts,
    null-safe first element, masked replace. Patterns are kept to the
    Java-regex/RE2 common subset so both engines agree byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr("regexp_extract_all(text, '[a-z]+', 0)")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_alpha"),
        F.size(F.array_distinct(toks)).alias("n_alpha_distinct"),
        F.get(toks, 0).alias("first_tok"),
        F.regexp_replace(F.substring("text", 1, 40), "[0-9]", "#").alias(
            "masked_prefix"
        ),
        F.length(F.regexp_replace("text", "[aeiouAEIOU]", "")).alias("len_novowels"),
    )


def interval_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship latency per order month: date truncation,
    date + interval due date, datediff aggregation with exact integer
    day sums. The average is emitted as ``avg_days_micros`` — a BIGINT
    computed with pure integer rational arithmetic (``ratio_micros``),
    not a rounded double: the driver's r6 gate proved
    ``pround(sum/count, 6)`` can land within an ulp of its rounding
    boundary on a different FMA/libm build (VERDICT r6 item 2), so no
    DOUBLE column remains in this query."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    first_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min(F.to_date("l_shipdate")).alias("sd"))
    )
    j = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        F.trunc("od", "month").alias("order_month"),
        F.datediff(F.col("sd"), F.col("od")).alias("days"),
        (F.col("sd") > F.date_add(F.col("od"), 90)).cast("int").alias("late"),
    )
    return j.groupBy("order_month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("days").alias("sum_days"),
        F.sum("late").alias("n_late_90d"),
    ).withColumn("avg_days_micros", ratio_micros("sum_days", "n_orders"))


QUERIES = {
    "copurchase_pairs": copurchase_pairs,
    "dedup_editdistance": dedup_editdistance,
    "scalar_regex": scalar_regex,
    "interval_shipping": interval_shipping,
}

ORACLES = {
    "copurchase_pairs": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        small AS (
            SELECT l_orderkey FROM op GROUP BY 1
            HAVING count(*) <= {MAX_BASKET}
        ),
        opc AS (SELECT op.* FROM op JOIN small USING (l_orderkey))
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
        FROM opc a
        JOIN opc b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SUPPORT}
    """,
    "dedup_editdistance": f"""
        WITH d AS (
            SELECT doc_id, lang, text, unnest(list_distinct([
                       CAST(floor(n_chars / {LEN_BUCKET}) AS INTEGER),
                       CAST(floor((n_chars + {LEN_BUCKET // 2}) / {LEN_BUCKET})
                            AS INTEGER)
                   ])) AS lb
            FROM documents
        ), capped AS (
            SELECT * FROM (
                SELECT d.*, row_number() OVER (
                    PARTITION BY lang, lb ORDER BY doc_id) AS rn
                FROM d
            ) WHERE rn <= {MAX_BLOCK}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
        FROM capped a
        JOIN capped b
          ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        WHERE levenshtein(a.text, b.text) <= {MAX_DIST}
    """,
    "scalar_regex": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER)
                   AS n_alpha,
               CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+')))
                   AS INTEGER) AS n_alpha_distinct,
               regexp_extract_all(text, '[a-z]+')[1] AS first_tok,
               regexp_replace(substr(text, 1, 40), '[0-9]', '#', 'g')
                   AS masked_prefix,
               CAST(length(regexp_replace(text, '[aeiouAEIOU]', '', 'g'))
                   AS INTEGER) AS len_novowels
        FROM documents
    """,
    "interval_shipping": f"""
        WITH fs AS (
            SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS sd
            FROM lineitem GROUP BY 1
        ), j AS (
            SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                       AS order_month,
                   datediff('day', CAST(o_orderdate AS DATE), sd) AS days,
                   CASE WHEN sd > CAST(o_orderdate AS DATE) + 90
                        THEN 1 ELSE 0 END AS late
            FROM orders JOIN fs ON o_orderkey = l_orderkey
        )
        SELECT order_month,
               count(*) AS n_orders,
               CAST(sum(days) AS BIGINT) AS sum_days,
               CAST(sum(late) AS BIGINT) AS n_late_90d,
               {sql_ratio_micros('sum(days)', 'count(*)')} AS avg_days_micros
        FROM j
        GROUP BY 1
    """,
}


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (operators/bloom.py). The output row
# carries the candidate count — so the oracle checks the Bloom bitset
# (probes, masks, false-positive set) bit-for-bit, not just the final
# exact semi-join.

def bloom_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.money import money
    from ..operators.bloom import bloom_prune, build_bloom_words

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    words = build_bloom_words(cust, "c_custkey")
    cand = bloom_prune(orders, words, "o_custkey")
    true_m = cand.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    agg_true = true_m.agg(
        F.count(F.lit(1)).alias("n_true"),
        (F.sum(money("o_totalprice")) * 100).cast("long").alias("true_cents"),
    )
    return n_cand.crossJoin(agg_true).select(
        "n_bloom_pass",
        "n_true",
        (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
        "true_cents",
    )


QUERIES["bloom_prune_orders"] = bloom_prune_orders


def _bloom_oracle() -> str:
    from ..operators.bloom import sql_bloom_pass, sql_bloom_words

    words = sql_bloom_words(
        "SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_mktsegment = 'BUILDING'"
    )
    return f"""
        WITH {words},
        cand AS (
            SELECT * FROM orders WHERE {sql_bloom_pass('o_custkey')}
        ),
        tm AS (
            SELECT count(*) AS n_true,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS true_cents
            FROM cand WHERE o_custkey IN (SELECT k FROM dim_keys)
        )
        SELECT (SELECT count(*) FROM cand) AS n_bloom_pass,
               n_true,
               (SELECT count(*) FROM cand) - n_true AS n_false_pos,
               true_cents
        FROM tm
    """


ORACLES["bloom_prune_orders"] = _bloom_oracle()


# ---------------------------------------------------------------------------
# Z-order data layout (round 5): multi-dimensional clustering for scan
# pruning. zval interleaves the bits of two bucketed dimensions; rows
# land in equal-width z-ranges ("files"), and the per-file min/max
# bounding boxes — the stats a lakehouse uses for data skipping — are
# the gate output. On the fixture every box tiles to an exact 64x64
# quadrant: BOTH dimensions stay bounded per file, which is the whole
# point of z-ordering over a single-column sort.
#
# Scale: zval is a map-side 16-term bit expression (codegen'd, no
# shuffle); the bucket id is a value-range split (floor(z / width)), so
# the layout needs NO global sort — one groupBy yields the stats, and a
# production rewrite is `repartitionByRange(z).sortWithinPartitions(z)`
# + write.

Z_BITS = 8
Z_FILES = 16
Z_WIDTH = (1 << (2 * Z_BITS)) // Z_FILES  # equal-width z-ranges


def _z_expr() -> str:
    return " + ".join(
        f"shiftleft(shiftright(bx, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright(by, {i}) & 1, {2 * i + 1})"
        for i in range(Z_BITS)
    )


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        (F.col("l_partkey") % 256).cast("long").alias("bx"),
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date"))
            % 256
        )
        .cast("long")
        .alias("by"),
    )
    z = b.withColumn("zval", F.expr(_z_expr()))
    return (
        z.groupBy(F.floor(F.col("zval") / F.lit(Z_WIDTH)).cast("long").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("bx").alias("min_part_bucket"),
            F.max("bx").alias("max_part_bucket"),
            F.min("by").alias("min_day_bucket"),
            F.max("by").alias("max_day_bucket"),
        )
    )


QUERIES["zorder_layout"] = zorder_layout

_Z_DUCK = " + ".join(
    f"(((bx >> {i}) & 1) << {2 * i}) + (((by >> {i}) & 1) << {2 * i + 1})"
    for i in range(Z_BITS)
)

ORACLES["zorder_layout"] = f"""
    WITH b AS (
        SELECT CAST(l_partkey % 256 AS BIGINT) AS bx,
               CAST(datediff('day', DATE '1992-01-01',
                    CAST(l_shipdate AS DATE)) % 256 AS BIGINT) AS by
        FROM lineitem
    ), z AS (SELECT *, {_Z_DUCK} AS zval FROM b)
    SELECT CAST(floor(zval / {Z_WIDTH}.0) AS BIGINT) AS file_id,
           count(*) AS n_rows,
           min(bx) AS min_part_bucket, max(bx) AS max_part_bucket,
           min(by) AS min_day_bucket, max(by) AS max_day_bucket
    FROM z GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup: the rolling-hash chunker used to
# dedupe shared passages across documents (boilerplate, quotes, near-dup
# bodies). Boundaries are positions whose 8-gram polynomial hash ≡ 0
# (mod 64) — a pure function of CONTENT, so an insertion early in a doc
# shifts at most one chunk, unlike fixed-width chunking where everything
# downstream re-aligns. Chunk hashes aggregate into an occurrence table;
# chunks seen ≥2 times are the shared-content candidates.
#
# Scale: everything up to the final groupBy is per-row HOF work inside
# one scan (no explode of per-position rows into the shuffle — gram
# hashing happens inside array lambdas); the only shuffle carries one
# row per CHUNK (~len/64 per doc). The oracle replays every formula.

CDC_GRAM = 8
CDC_MASK = 64  # boundary when gram_hash % CDC_MASK == 0; avg chunk ~64 chars

_CDC_POLY_SPARK = (
    "aggregate(split({s}, ''), 0L,"
    " (acc, ch) -> (acc * 31 + ascii(ch)) % 2147483647)"
)

_CDC_BS_SPARK = f"""
    array_sort(array_distinct(concat(
        array(CAST(1 AS BIGINT)),
        filter(
            CASE WHEN length(text) < {CDC_GRAM}
                 THEN CAST(array() AS ARRAY<BIGINT>)
                 ELSE sequence(CAST(1 AS BIGINT),
                               CAST(length(text) - {CDC_GRAM - 1} AS BIGINT))
            END,
            p -> ({_CDC_POLY_SPARK.format(s=f'substr(text, p, {CDC_GRAM})')})
                 % {CDC_MASK} = 0),
        array(CAST(length(text) + 1 AS BIGINT))
    )))
"""

_CDC_CHUNKS_SPARK = """
    transform(sequence(1, size(bs) - 1),
              j -> substr(text, element_at(bs, j),
                          CAST(element_at(bs, j + 1) - element_at(bs, j) AS INT)))
"""


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # checkpoint after the boundary scan: ``bs`` is referenced three
    # times by the chunk slicer (size + two element_at), and projection
    # collapse would re-inline the O(len·gram) interpreted rolling-hash
    # filter into each — measured 78.5 s → 9.2 s at sf0.1
    with_bs = (
        docs.select("doc_id", "text")
        .withColumn("bs", F.expr(_CDC_BS_SPARK))
        .localCheckpoint(eager=False)
    )
    chunks = with_bs.withColumn("chunks", F.expr(_CDC_CHUNKS_SPARK)).select(
        "doc_id", F.explode("chunks").alias("ch")
    )
    return (
        chunks.select(
            "doc_id", F.expr(_CDC_POLY_SPARK.format(s="ch")).alias("chunk_hash")
        )
        .groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= 2)
    )


QUERIES["cdc_chunk_dedup"] = cdc_chunk_dedup


def _cdc_oracle() -> str:
    from ..functions.hashing import sql_poly_hash

    gram_hash = sql_poly_hash(f"text[p:p+{CDC_GRAM - 1}]")
    return f"""
        WITH b AS (
            SELECT doc_id, text,
                   list_sort(list_distinct(
                       [CAST(1 AS BIGINT)]
                       || list_filter(
                              CASE WHEN length(text) < {CDC_GRAM} THEN []
                                   ELSE range(1, length(text) - {CDC_GRAM - 2})
                              END,
                              p -> ({gram_hash}) % {CDC_MASK} = 0)
                       || [CAST(length(text) + 1 AS BIGINT)]
                   )) AS bs
            FROM documents
        ), c AS (
            SELECT doc_id,
                   list_transform(range(1, len(bs)),
                                  j -> text[bs[j]:bs[j+1] - 1]) AS chunks
            FROM b
        )
        SELECT {sql_poly_hash('ch')} AS chunk_hash,
               count(*) AS n_occ,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (SELECT doc_id, unnest(chunks) AS ch FROM c)
        GROUP BY 1 HAVING count(*) >= 2
    """


ORACLES["cdc_chunk_dedup"] = _cdc_oracle()


# --- cross-document duplicated substring spans -------------------------------
#
# Approximates suffix-array substring dedup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): a true
# suffix array marks EVERY position of every repeated substring >= K;
# at Spark scale that is an O(corpus) sort with heavy constant factors,
# so this operator samples the position grid instead — hash a K-char
# gram every STRIDE chars, keep grams seen >= 2 times corpus-wide
# (within-doc repeats count too, exactly as a suffix array would), and
# merge each doc's flagged [start, start+K-1] intervals into maximal
# spans with a gaps-and-islands window. A repeated substring of length
# >= K + STRIDE - 1 is guaranteed to cover at least one grid gram, so
# recall is a pure function of the two constants.
#
# Scale: the gram relation is O(total_chars / STRIDE) narrow rows; the
# duplicate-gram filter is one hash aggregation on gh and the flagging
# join re-uses that same gh partitioning (AQE ReusedExchange). The
# island merge is a per-doc window — one doc_id-keyed shuffle whose
# partitions are bounded by doc length / STRIDE. No step is quadratic:
# unlike pair-expansion dedup there is no self-join anywhere.

SPAN_K = 30  # gram length (chars) — min detectable duplicated span
SPAN_STRIDE = 7  # grid step; spans >= SPAN_K + SPAN_STRIDE - 1 always hit


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring accounting: how many maximal
    duplicated spans, how many chars they cover, and the covered
    fraction — the signal pipelines use to cut boilerplate before
    training."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    g = (
        docs.filter(F.length("text") >= SPAN_K)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length("text") - F.lit(SPAN_K - 1),
                    F.lit(SPAN_STRIDE),
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            "start",
            token_hash(F.expr(f"substring(text, start, {SPAN_K})")).alias("gh"),
        )
        # r14 OPT: two consumers (the duplicate-gram aggregate and the
        # flagging join). AQE only reuses the gh exchange when the join
        # stays sort-merge; once the small dup side broadcasts, the
        # text-scan+substring+hash pipeline ran TWICE per call —
        # materialize the narrow gram relation once.
        .localCheckpoint(eager=False)
    )
    dup = g.groupBy("gh").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 2
    )
    iv = g.join(dup.select("gh"), "gh").select(
        "doc_id", "start", (F.col("start") + F.lit(SPAN_K - 1)).alias("end")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = (
        iv.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("start") > F.col("prev_end") + 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("start").alias("s"), F.max("end").alias("e")
    )
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"),
    )
    return (
        docs.select("doc_id", "n_chars")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            pround(
                F.coalesce("dup_chars", F.lit(0)).cast("double")
                / F.col("n_chars"),
                6,
            ).alias("dup_ratio"),
        )
    )


QUERIES["dedup_substring_spans"] = dedup_substring_spans


def _substring_spans_oracle() -> str:
    from ..functions.hashing import sql_token_hash

    gh = sql_token_hash(f"substring(text, CAST(start AS INTEGER), {SPAN_K})")
    return f"""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {SPAN_K - 2}, {SPAN_STRIDE}))
                       AS start
            FROM documents WHERE length(text) >= {SPAN_K}
        ), g AS (
            SELECT doc_id, CAST(start AS BIGINT) AS start, {gh} AS gh FROM pos
        ), dup AS (
            SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2
        ), iv AS (
            SELECT doc_id, start, start + {SPAN_K - 1} AS e
            FROM g JOIN dup USING (gh)
        ), m AS (
            SELECT doc_id, start, e,
                   max(e) OVER (PARTITION BY doc_id ORDER BY start
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_end
            FROM iv
        ), isl AS (
            SELECT doc_id, start, e,
                   sum(CASE WHEN prev_end IS NULL OR start > prev_end + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY start
                             ROWS UNBOUNDED PRECEDING) AS island
            FROM m
        ), spans AS (
            SELECT doc_id, island, min(start) AS s, max(e) AS e
            FROM isl GROUP BY 1, 2
        ), agg AS (
            SELECT doc_id, count(*) AS n_dup_spans,
                   CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
            FROM spans GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(n_dup_spans, 0) AS n_dup_spans,
               COALESCE(dup_chars, 0) AS dup_chars,
               {sql_pround('CAST(COALESCE(dup_chars, 0) AS DOUBLE) / d.n_chars', 6)}
                   AS dup_ratio
        FROM documents d LEFT JOIN agg USING (doc_id)
    """


ORACLES["dedup_substring_spans"] = _substring_spans_oracle()


# --- XML scalar surface ------------------------------------------------------


def scalar_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML parsing (Spark 4 from_xml + xpath): a planted XML
    envelope per document is parsed back into typed columns. The
    envelope is built from fixture columns with the identical
    expression in the oracle, which re-extracts the fields with RE2 —
    so schema inference, type coercion (chars → BIGINT), and xpath
    string extraction are all differentially checked."""
    docs = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<doc><lang>"),
        F.col("lang"),
        F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars><src>"),
        F.col("source"),
        F.lit("</src></doc>"),
    )
    staged = docs.select("doc_id", xml.alias("xml"))
    parsed = staged.select(
        "doc_id",
        F.from_xml("xml", "lang STRING, chars BIGINT, src STRING").alias("p"),
        F.xpath_string("xml", F.lit("/doc/src")).alias("xml_src"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.lang").alias("xml_lang"),
        F.col("p.chars").alias("xml_chars"),
        "xml_src",
    )


QUERIES["scalar_xml"] = scalar_xml

ORACLES["scalar_xml"] = """
    WITH staged AS (
        SELECT doc_id,
               '<doc><lang>' || lang || '</lang><chars>' ||
               CAST(n_chars AS VARCHAR) || '</chars><src>' || source ||
               '</src></doc>' AS xml
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS xml_lang,
           CAST(regexp_extract(xml, '<chars>([0-9]+)</chars>', 1) AS BIGINT)
               AS xml_chars,
           regexp_extract(xml, '<src>([^<]*)</src>', 1) AS xml_src
    FROM staged
"""


# --- collation surface -------------------------------------------------------


def collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collated strings: a
    mixed-case column (planted deterministically — even doc_ids
    uppercase their source tag) is grouped under UTF8_LCASE, so 'SRC1'
    and 'src1' land in one group. The emitted key is lower(min(raw)) —
    a collation-independent representative — because a collated grouping
    key's surface form is whichever member the engine saw first, which
    is exactly the nondeterminism the output must not expose. The
    oracle replays the semantics with lower() grouping.

    Scale: a groupBy like any other — collation affects the comparator,
    not the shuffle shape; counts stay map-side combinable."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.when(
        F.col("doc_id") % 2 == 0, F.upper(F.col("source"))
    ).otherwise(F.col("source"))
    return (
        docs.select(mixed.alias("mixed"), "n_chars")
        .groupBy(F.collate(F.col("mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.lower(F.min("mixed")).alias("source_tag"),
        )
        .select("source_tag", "n_docs", "total_chars")
    )


QUERIES["collation_group"] = collation_group

ORACLES["collation_group"] = """
    WITH staged AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
                   AS mixed,
               n_chars
        FROM documents
    )
    SELECT lower(min(mixed)) AS source_tag,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM staged GROUP BY lower(mixed)
"""


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the parts no other part
    dominates under (price ↓, size ↑) — minimize retail price, maximize
    size. The multi-objective selection shape behind quality-vs-length
    corpus curation tradeoffs.

    Distributed plan (no O(n²) dominance join): (1) pre-aggregate to
    one row per distinct price with its max size (any non-max row at a
    price is dominated by definition); (2) LOCAL frontier pass — the
    running-max window partitioned by spark_partition_id after a range
    repartition on price removes every point dominated within its own
    partition (valid because dominated-in-a-subset ⇒ dominated-in-the-
    union); (3) GLOBAL pass — same window over the ≤ survivors. The
    final single-partition window only ever sees local-frontier
    survivors, which for monotone data distributions is ~√n, not n.

    The oracle is the declarative NOT-EXISTS dominance definition —
    agreement proves the two-pass window rewrite computes the true
    skyline. Prices compare in exact integer cents (iunits).
    """
    from ..functions.rounding import iunits

    p = load_table(spark, sf_dir, "part")
    best = (
        p.select(iunits(F.col("p_retailprice"), 2).alias("price_cents"), "p_size")
        .groupBy("price_cents")
        .agg(F.max("p_size").alias("best_size"))
    )
    ranged = best.repartitionByRange(8, "price_cents").withColumn(
        "pid", F.spark_partition_id()
    )
    wlocal = (
        Window.partitionBy("pid")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "runmax", F.max("best_size").over(wlocal)
    ).filter((F.col("runmax").isNull()) | (F.col("best_size") > F.col("runmax")))
    wglobal = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    return (
        local.select("price_cents", "best_size")
        .withColumn("runmax", F.max("best_size").over(wglobal))
        .filter((F.col("runmax").isNull()) | (F.col("best_size") > F.col("runmax")))
        .select("price_cents", "best_size")
    )


QUERIES["pareto_frontier_parts"] = pareto_frontier_parts

from ..functions.rounding import sql_iunits as _sql_iunits  # noqa: E402

ORACLES["pareto_frontier_parts"] = f"""
    WITH d AS (
        SELECT {_sql_iunits('p_retailprice', 2)} AS price_cents,
               max(p_size) AS best_size
        FROM part GROUP BY 1
    )
    SELECT price_cents, best_size FROM d a
    WHERE NOT EXISTS (
        SELECT 1 FROM d b
        WHERE b.price_cents < a.price_cents AND b.best_size >= a.best_size
    )
"""


LINK_THRESHOLD = 60  # minimum integer agreement score to emit a pair


def linkage_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) with Fellegi–Sunter-style
    additive agreement weights: candidate pairs come from BLOCKING on
    c_nationkey (never an all-pairs product), then each field
    comparison contributes an integer weight — name edit distance
    (levenshtein ≤ 2 → +40, ≤ 4 → +20), market-segment equality
    (+25), account balance within 100.00 in exact cents (+35) — and
    pairs scoring ≥ LINK_THRESHOLD are emitted as links. Every
    comparison and the score itself are exact integers, so the DuckDB
    oracle matches bit-for-bit (cross-engine levenshtein parity is
    already load-bearing for ``dedup_editdistance``).

    100 TB: blocking keys are the scale rail — the per-block pair
    count is quadratic in block size, so real deployments block on
    several independent keys (nation × name-prefix × balance-band) and
    union candidates; the nation block here keeps the fixture's blocks
    at ~n/25. The comparison stage is embarrassingly parallel.
    """
    from ..functions.rounding import iunits

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("blk"),
        iunits(F.col("c_acctbal"), 2).alias("bal_cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
    )
    # materialize the pair FEATURE table before scoring: projection
    # collapse + filter pushdown otherwise re-inline the O(len²)
    # levenshtein into every reference (CaseWhen branches defeat
    # subexpression elimination), evaluating it ~4× per pair — measured
    # 61.5 s → 17.3 s at sf0.1 with the checkpoint barrier. Real
    # linkage systems persist this comparison-vector table anyway (it
    # feeds weight training, not just one threshold).
    feat = pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.levenshtein(F.col("a.name"), F.col("b.name")).alias("lev"),
        (F.col("a.seg") == F.col("b.seg")).alias("seg_eq"),
        (F.abs(F.col("a.bal_cents") - F.col("b.bal_cents")) <= 10000).alias("bal_ok"),
    ).localCheckpoint(eager=False)
    score = (
        F.when(F.col("lev") <= 2, F.lit(40))
        .when(F.col("lev") <= 4, F.lit(20))
        .otherwise(F.lit(0))
        + F.when(F.col("seg_eq"), F.lit(25)).otherwise(F.lit(0))
        + F.when(F.col("bal_ok"), F.lit(35)).otherwise(F.lit(0))
    )
    return (
        feat.select("id_a", "id_b", score.cast("int").alias("score"))
        .filter(F.col("score") >= LINK_THRESHOLD)
    )


QUERIES["linkage_customers"] = linkage_customers

ORACLES["linkage_customers"] = f"""
    WITH c AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS blk,
               {_sql_iunits('c_acctbal', 2)} AS bal_cents,
               c_mktsegment AS seg
        FROM customer
    )
    SELECT id_a, id_b, score FROM (
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(
                   (CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 40
                         WHEN levenshtein(a.name, b.name) <= 4 THEN 20
                         ELSE 0 END)
                 + (CASE WHEN a.seg = b.seg THEN 25 ELSE 0 END)
                 + (CASE WHEN abs(a.bal_cents - b.bal_cents) <= 10000
                         THEN 35 ELSE 0 END)
               AS INTEGER) AS score
        FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
    ) WHERE score >= {LINK_THRESHOLD}
"""


# ----------------------------------------------------- PMI collocations
# Corpus-level collocation mining: adjacent-token pairs ranked by
# pointwise mutual information, PMI = ln(p(ab) / (p(a)·p(b))) — the
# association statistic behind phrase detection (word2vec's phrase
# pass, n-gram feature induction). Distinct from text_lm_bigram (which
# scores DOCUMENTS under a conditional bigram LM): this ranks the PAIRS
# themselves, corpus-wide.
#
# Exactness: counts are exact BIGINTs; the single ln() call runs on the
# bit-identical double ratio in both engines and is snapped to integer
# 1e-6 units (iunits — text_lm_score discipline). Scale: one explode →
# two grouped counts (pair, unigram) + two 1-row totals; the unigram
# join is key-equi on the token (vocabulary ≪ corpus; AQE broadcasts
# when small — the tfidf precedent), and top-k is a WindowGroupLimit,
# not a global sort.

PMI_MIN_PAIR = 5  # pairs seen fewer times carry no stable signal
PMI_TOPK = 20


def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    ts = tokenize(F.col("text"))
    arr = docs.select(ts.alias("ts"), F.size(ts).alias("k")).filter(F.col("k") > 0)
    z = F.arrays_zip(
        F.col("ts").alias("a"),
        F.slice("ts", 2, F.greatest(F.col("k") - 1, F.lit(0))).alias("b"),
    )
    pairs = (
        arr.select(F.posexplode(z).alias("pos", "z"))
        .filter(F.col("z.b").isNotNull())
        .select(F.col("z.a").alias("a"), F.col("z.b").alias("b"))
    )
    c_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = (
        arr.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    n_pairs = c_ab.select(F.sum("c_ab").alias("n_pairs"))
    n_uni = uni.select(F.sum("c_tok").alias("n_uni"))
    scored = (
        c_ab.filter(F.col("c_ab") >= PMI_MIN_PAIR)
        .join(uni.withColumnRenamed("tok", "a").withColumnRenamed("c_tok", "c_a"), "a")
        .join(uni.withColumnRenamed("tok", "b").withColumnRenamed("c_tok", "c_b"), "b")
        .crossJoin(n_pairs)
        .crossJoin(n_uni)
        .select(
            "a",
            "b",
            "c_ab",
            iunits(
                F.log(
                    (
                        F.col("c_ab").cast("double")
                        * F.col("n_uni").cast("double")
                        * F.col("n_uni").cast("double")
                    )
                    / (
                        F.col("n_pairs").cast("double")
                        * F.col("c_a").cast("double")
                        * F.col("c_b").cast("double")
                    )
                ),
                6,
            ).alias("pmi_units"),
        )
    )
    w = Window.orderBy(F.desc("pmi_units"), F.asc("a"), F.asc("b"))
    top = scored.orderBy(F.desc("pmi_units"), F.asc("a"), F.asc("b")).limit(PMI_TOPK)
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


QUERIES["text_collocations_pmi"] = text_collocations_pmi

from ..functions.hashing import sql_tokens as _sql_tokens  # noqa: E402
from ..functions.rounding import sql_iunits as _sql_iunits2  # noqa: E402

ORACLES["text_collocations_pmi"] = f"""
    WITH arr AS (
        SELECT {_sql_tokens('text')} AS ts FROM documents
        WHERE len({_sql_tokens('text')}) > 0
    ), pairs AS (
        SELECT ts[i] AS a, ts[i + 1] AS b
        FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM arr)
    ), c_ab AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY 1, 2
    ), uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c_tok
        FROM (SELECT unnest(ts) AS tok FROM arr) GROUP BY 1
    ), tot AS (
        SELECT (SELECT CAST(sum(c_ab) AS BIGINT) FROM c_ab) AS n_pairs,
               (SELECT CAST(sum(c_tok) AS BIGINT) FROM uni) AS n_uni
    ), scored AS (
        SELECT c_ab.a, c_ab.b, c_ab.c_ab,
               {_sql_iunits2(
                   "ln((CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)"
                   " * CAST(n_uni AS DOUBLE))"
                   " / (CAST(n_pairs AS DOUBLE) * CAST(ua.c_tok AS DOUBLE)"
                   " * CAST(ub.c_tok AS DOUBLE)))", 6
               )} AS pmi_units
        FROM c_ab
        JOIN uni ua ON c_ab.a = ua.tok
        JOIN uni ub ON c_ab.b = ub.tok
        CROSS JOIN tot
        WHERE c_ab >= {PMI_MIN_PAIR}
    )
    SELECT a, b, c_ab, pmi_units,
           CAST(row_number() OVER (ORDER BY pmi_units DESC, a ASC, b ASC)
                AS INTEGER) AS rank
    FROM (SELECT * FROM scored ORDER BY pmi_units DESC, a ASC, b ASC LIMIT {PMI_TOPK})
"""


# ------------------------------------------------------- golden record
# The missing last stage of entity resolution: linkage_customers emits
# scored PAIRS; the golden-record op closes them into clusters
# (connected components — the dedup_clusters machinery) and collapses
# each cluster to ONE record under deterministic survivorship rules:
# golden id = min member id, balance = richest member (max exact
# cents), name/segment = lexicographic min, members = ascending CSV.
# Real MDM survivorship ("most recent source wins") is the same
# grouped-aggregate shape with a different ordering column. The oracle
# replays pairs → recursive closure → the identical aggregates.
# 100 TB: pairs/closure are the linkage + label-propagation rails
# already argued; the collapse is one groupBy over linked members only.


def linkage_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..operators.graph import connected_components

    pairs = linkage_customers(spark, sf_dir)
    cc = connected_components(pairs.select("id_a", "id_b"))
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        iunits(F.col("c_acctbal"), 2).alias("bal_cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    members = c.join(cc, "id")
    return (
        members.groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("id").alias("golden_id"),
            F.max("bal_cents").alias("bal_cents"),
            F.min("name").alias("name"),
            F.min("seg").alias("seg"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("member_ids"),
        )
        .select(
            F.col("root").alias("cluster_id"),
            "golden_id",
            "n_members",
            "bal_cents",
            "name",
            "seg",
            "member_ids",
        )
    )


QUERIES["linkage_golden_record"] = linkage_golden_record

ORACLES["linkage_golden_record"] = f"""
    WITH RECURSIVE c AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS blk,
               {_sql_iunits('c_acctbal', 2)} AS bal_cents,
               c_mktsegment AS seg
        FROM customer
    ), links AS (
        SELECT id_a, id_b FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   (CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 40
                         WHEN levenshtein(a.name, b.name) <= 4 THEN 20
                         ELSE 0 END)
                 + (CASE WHEN a.seg = b.seg THEN 25 ELSE 0 END)
                 + (CASE WHEN abs(a.bal_cents - b.bal_cents) <= 10000
                         THEN 35 ELSE 0 END) AS score
            FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        ) WHERE score >= {LINK_THRESHOLD}
    ), nodes AS (
        SELECT id_a AS id FROM links UNION SELECT id_b FROM links
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM links
        UNION SELECT id_b, id_a FROM links
    ), reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), roots AS (
        SELECT a AS id, min(b) AS root FROM reach GROUP BY a
    ), members AS (
        SELECT roots.root, c.id, c.name, c.bal_cents, c.seg
        FROM c JOIN roots ON c.id = roots.id
    )
    SELECT root AS cluster_id,
           min(id) AS golden_id,
           count(*) AS n_members,
           max(bal_cents) AS bal_cents,
           min(name) AS name,
           min(seg) AS seg,
           array_to_string(list_transform(list_sort(list(id)),
                                          x -> CAST(x AS VARCHAR)), ',')
               AS member_ids
    FROM members GROUP BY root
"""


# ---------------------------------------------------- association rules
# The rule-mining stage over the copurchase pair counts: every frequent
# pair (a,b) yields the directed rules a→b and b→a with support,
# confidence = supp(ab)/supp(a), and lift = supp(ab)·N / (supp(a)·
# supp(b)); top RULES_TOPK by lift (TakeOrdered, deterministic
# tiebreak). Item supports and N are computed over the SAME capped
# baskets the pair counts use, so the probabilities are consistent.
# All ratios are pround'd doubles over exact BIGINT counts. 100 TB:
# adds two broadcast-sized relations (item supports, 1-row N) on top of
# the copurchase rails — the pair join stays the only quadratic risk,
# already capped per basket.

RULES_TOPK = 20


def copurchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    small = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket"))
        .filter(F.col("basket") <= MAX_BASKET)
        .select("l_orderkey")
    )
    opc = op.join(small, "l_orderkey")
    # r13 OPT: ride the shared pair artifact (identical build)
    pairs = _copurchase_pairs_shared(spark, sf_dir)
    both = pairs.unionByName(
        pairs.select(
            F.col("part_b").alias("part_a"),
            F.col("part_a").alias("part_b"),
            "n_orders",
        )
    )
    item = opc.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp"))
    n_baskets = small.agg(F.count(F.lit(1)).alias("n_baskets"))
    scored = (
        both.join(item.withColumnRenamed("l_partkey", "part_a"), "part_a")
        .withColumnRenamed("supp", "supp_a")
        .join(item.withColumnRenamed("l_partkey", "part_b"), "part_b")
        .withColumnRenamed("supp", "supp_b")
        .crossJoin(n_baskets)
        .select(
            F.col("part_a").alias("antecedent"),
            F.col("part_b").alias("consequent"),
            F.col("n_orders").alias("support"),
            pround(
                F.col("n_orders").cast("double") / F.col("supp_a").cast("double"), 6
            ).alias("confidence"),
            pround(
                (F.col("n_orders").cast("double") * F.col("n_baskets").cast("double"))
                / (F.col("supp_a").cast("double") * F.col("supp_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    top = scored.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    ).limit(RULES_TOPK)
    w = Window.orderBy(F.desc("lift"), F.asc("antecedent"), F.asc("consequent"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


QUERIES["copurchase_rules"] = copurchase_rules

ORACLES["copurchase_rules"] = f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    small AS (
        SELECT l_orderkey FROM op GROUP BY 1 HAVING count(*) <= {MAX_BASKET}
    ),
    opc AS (SELECT op.* FROM op JOIN small USING (l_orderkey)),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM opc a JOIN opc b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
    ),
    dirs AS (
        SELECT part_a, part_b, n_orders FROM pairs
        UNION ALL
        SELECT part_b, part_a, n_orders FROM pairs
    ),
    item AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS supp FROM opc GROUP BY 1
    ),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM small),
    scored AS (
        SELECT dirs.part_a AS antecedent, dirs.part_b AS consequent,
               n_orders AS support,
               {sql_pround('CAST(n_orders AS DOUBLE) / CAST(ia.supp AS DOUBLE)', 6)}
                   AS confidence,
               {sql_pround(
                   '(CAST(n_orders AS DOUBLE) * CAST(n_baskets AS DOUBLE))'
                   ' / (CAST(ia.supp AS DOUBLE) * CAST(ib.supp AS DOUBLE))', 6
               )} AS lift
        FROM dirs
        JOIN item ia ON dirs.part_a = ia.l_partkey
        JOIN item ib ON dirs.part_b = ib.l_partkey
        CROSS JOIN nb
    )
    SELECT antecedent, consequent, support, confidence, lift,
           CAST(row_number() OVER (
               ORDER BY lift DESC, antecedent ASC, consequent ASC
           ) AS INTEGER) AS rank
    FROM (
        SELECT * FROM scored
        ORDER BY lift DESC, antecedent ASC, consequent ASC LIMIT {RULES_TOPK}
    )
"""
