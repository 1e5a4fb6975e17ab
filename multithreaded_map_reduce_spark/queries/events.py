"""Event-time processing over the ``events`` fixture — batch versions of
the streaming surface (SURVEY.md §2c 'streaming: absent in reference';
the Structured Streaming wrappers in ``streaming/`` reuse these shapes).

Techniques:
- tumbling / sliding windows via ``F.window`` (epoch-aligned in both
  engines, so the oracle's ``time_bucket`` agrees exactly);
- session windows via ``F.session_window`` with a gaps-and-islands SQL
  oracle (identical semantics: session end = last event + gap);
- as-of join expressed as a union-window plan — no per-key loops, one
  shuffle on user_id, scales to any event volume;
- JSON prop extraction with ``get_json_object`` (JVM-side).

The ``value`` column is an arbitrary double, so sums go through exact
integer micro-units (``iunits``) — order-independent at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.time import epoch_micros
from ..functions.rounding import (
    from_iunits,
    iunits,
    pround,
    sql_from_iunits,
    sql_iunits,
    sql_pround,
    sql_ratio_micros,
    sql_ratio_units,
)
from ..sources.catalog import load_table


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type: count + exact value sum."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n"),
            pround(from_iunits(F.sum(iunits(F.col("value")))), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding by 15 minutes (each event lands in 4)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(win, "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap session windows per user (batch ``session_window``).

    Scale note: state per user is one open session — in streaming this
    is the watermark-bounded stateful op; in batch Catalyst turns it
    into a sort-based aggregation over user_id."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "10 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "n_types",
        )
    )


def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it (order: ts, then event_id for ties).

    Union-window formulation: one shuffle on user_id, a sort, and a
    running ``last(ignorenulls)`` — the classic way to do as-of joins
    declaratively without a range-join explosion. The generic operator
    lives in ``operators/asof.py``; this is its query-surface instance.
    """
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        both.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_click_ts",
            (epoch_micros("ts") - epoch_micros("last_click_ts")).alias("micros_since_click"),
        )
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction + aggregation (props = {"k": int})."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        pround(F.sum(k).cast("double") / F.count("*"), 6).alias("avg_k"),
        F.count("*").alias("n"),
    )


def user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile: spans, distinct types, exact totals."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        pround(from_iunits(F.sum(iunits(F.col("value")))), 2).alias("total_value"),
    )


def range_join_recent_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join: clicks within the hour before each
    purchase, per user (operators/rangejoin.py — equi-join on
    (user, time-bucket), never an O(n·m) per-key filter)."""
    from ..operators.rangejoin import count_in_window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return count_in_window(
        purchases, clicks, by="user_id", left_time="ts", right_time="ts",
        window_micros=3600 * 1_000_000,
    )


_SLIDE_OFFSETS = "[0, 1, 2, 3]"

FUNNEL_WINDOW_US = 3600 * 1_000_000  # each step must follow within 1h


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step conversion funnel (view → click → purchase), each
    step strictly after the previous and within 1 hour of it; per user,
    the earliest qualifying timestamp of each stage (NULL = dropped
    off). All time math in integer microseconds (portable, exact).

    Scale: three per-user min-aggregations chained by joins — every
    stage keys on user_id, so AQE reuses one partitioning; no windows,
    no per-event state. The classic sessionized-funnel alternative
    (sort per user, scan) is what the streaming stateful operator
    covers; this is the batch set-algebra form."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros("ts").alias("tus")
    )

    def stage(prev: DataFrame, prev_col: str, etype: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev.select("user_id", prev_col), "user_id")
            .filter(
                (F.col("tus") > F.col(prev_col))
                & (F.col("tus") <= F.col(prev_col) + F.lit(FUNNEL_WINDOW_US))
            )
            .groupBy("user_id")
            .agg(F.min("tus").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("view_us"))
    )
    c = stage(v, "view_us", "click", "click_us")
    p = stage(c, "click_us", "purchase", "purchase_us")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "view_us", "click_us", "purchase_us")
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for each
    (cohort_date, day_offset) the count of cohort members active that
    day — the table behind every retention curve. Date math only
    (UTC-pinned by load_table), so it is engine-exact. Two aggregations
    keyed on user_id then (cohort, offset); the per-user cohort
    relation joins back partial-agg'd (one row per user)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    days = ev.distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        days.join(cohort, "user_id")
        .select("cohort_date", F.datediff("d", "cohort_date").alias("day_offset"), "user_id")
        .groupBy("cohort_date", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream transition matrix: per user, consecutive event-type
    pairs (ordered by ts then event_id for tie determinism), counted
    corpus-wide — the Markov-chain view of user behavior. One
    user-partitioned lead() window + one aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )


QUERIES = {
    "events_tumbling": events_tumbling,
    "events_sliding": events_sliding,
    "events_session": events_session,
    "asof_join_clicks": asof_join_clicks,
    "events_json_props": events_json_props,
    "user_activity": user_activity,
    "range_join_recent_clicks": range_join_recent_clicks,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "events_transitions": events_transitions,
}

ORACLES = {
    "events_tumbling": f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
               event_type,
               count(*) AS n,
               {sql_pround(sql_from_iunits(f"sum({sql_iunits('value')})"), 2)} AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "events_sliding": f"""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS win_start,
               time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
                   + INTERVAL '1 hour' AS win_end,
               event_type,
               count(*) AS n
        FROM events, (SELECT unnest({_SLIDE_OFFSETS}) AS k)
        GROUP BY 1, 2, 3
    """,
    "events_session": """
        WITH ordered AS (
            SELECT user_id, ts, event_id,
                   event_type,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '10 minutes'
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), islands AS (
            -- event_id tie-break must match the new_session window's
            -- ordering, or same-ts events land in sessions nondeterministically
            SELECT user_id, ts, event_type,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM ordered
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '10 minutes' AS session_end,
               count(*) AS n_events,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM islands
        GROUP BY user_id, session_id
    """,
    "asof_join_clicks": """
        WITH both_types AS (
            SELECT event_id, user_id, ts, event_type,
                   CASE WHEN event_type = 'click' THEN ts END AS click_ts
            FROM events WHERE event_type IN ('click', 'purchase')
        ), filled AS (
            SELECT *,
                   last_value(click_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
            FROM both_types
        )
        SELECT event_id, user_id, ts, last_click_ts,
               epoch_us(ts) - epoch_us(last_click_ts) AS micros_since_click
        FROM filled WHERE event_type = 'purchase'
    """,
    "events_json_props": f"""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               {sql_pround("CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / count(*)", 6)} AS avg_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    "range_join_recent_clicks": """
        SELECT p.event_id, p.user_id, p.ts, count(c.ts) AS n_in_window
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND epoch_us(c.ts) > epoch_us(p.ts) - 3600000000
         AND epoch_us(c.ts) <= epoch_us(p.ts)
        GROUP BY p.event_id, p.user_id, p.ts
    """,
    "user_activity": f"""
        SELECT user_id,
               count(*) AS n_events,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               {sql_pround(sql_from_iunits(f"sum({sql_iunits('value')})"), 2)} AS total_value
        FROM events
        GROUP BY user_id
    """,
    "events_funnel": f"""
        WITH e AS (
            SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
        ), v AS (
            SELECT user_id, min(tus) AS view_us
            FROM e WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.tus) AS click_us
            FROM e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click'
              AND e.tus > v.view_us AND e.tus <= v.view_us + {FUNNEL_WINDOW_US}
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.tus) AS purchase_us
            FROM e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND e.tus > c.click_us AND e.tus <= c.click_us + {FUNNEL_WINDOW_US}
            GROUP BY e.user_id
        )
        SELECT v.user_id, v.view_us, c.click_us, p.purchase_us
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
    """,
    "events_retention": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), cohort AS (
            SELECT user_id, min(d) AS cohort_date FROM days GROUP BY user_id
        )
        SELECT c.cohort_date,
               CAST(date_diff('day', c.cohort_date, days.d) AS INTEGER) AS day_offset,
               count(*) AS n_users
        FROM days JOIN cohort c ON days.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "events_transitions": """
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    """,
}


def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4 type system): props parsed
    once into a VARIANT, fields typed out with ``try_variant_get`` —
    the shredded-JSON pattern a lakehouse ingest uses instead of
    per-field ``get_json_object`` string re-parsing. Missing fields
    surface as NULL (try_ semantics), exercised by asking for a key the
    fixture never writes."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    per_event = ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_field"),
    )
    return per_event


QUERIES["events_variant_props"] = events_variant_props

ORACLES["events_variant_props"] = """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
"""


def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT active users per day — the classic
    rolling-DAU/WAU metric, and the window aggregate Spark can NOT do
    directly (COUNT(DISTINCT) over a RANGE frame is unsupported, and a
    ``collect_set`` range window would haul every event into one
    partition per user anyway).

    The scalable rewrite is CONTRIBUTION EXPLODE: each distinct
    (user, day) pair contributes to the ≤ 7 window-end days it is
    visible in; after the 7× fan-out the metric is a plain
    countDistinct per day — shuffle keyed on day, map-side
    combinable after the distinct. This is how rolling-distinct is
    computed at warehouse scale: fan-out bounded by the window length,
    never a per-user timeline sort.

    100 TB: two hash aggregations ((user, day) distinct, then per-day
    distinct) plus one broadcast-ish join against the observed-day
    list. Window length is the fan-out bound — a 30-day window costs
    30×, independent of data skew."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).distinct()
    days = ud.select(F.col("d").alias("wd")).distinct()
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("wd")
    )
    return (
        contrib.join(days, "wd")
        .groupBy("wd")
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("wd")).alias("day"),
            "n_active_7d",
        )
    )


QUERIES["events_rolling_distinct"] = events_rolling_distinct

ORACLES["events_rolling_distinct"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    )
    SELECT d.day AS day, count(DISTINCT u.user_id) AS n_active_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
SEQ_PATTERN = "(^|>)view>.*purchase(>|$)"  # view then (eventually) purchase


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern matching over sessionized event streams — the
    MATCH_RECOGNIZE / CEP shape: sessionize each user's events on a
    30-minute inactivity gap, collapse every session to its ORDERED
    event-type string, and match a regex pattern ('a view eventually
    followed by a purchase in the same session') against it. Output:
    per user, sessions total and sessions matching.

    Determinism: session boundaries come from integer-micro gaps; the
    per-session sequence orders by (ts_micros, event_id) — a total
    order, so the joined type string is unique. The regex runs on the
    RE2/Java-common subset.

    100 TB: one user-keyed shuffle for the lag/cumsum sessionization
    (the same shape every sessionizer pays), then per-session
    aggregation; the pattern match is scan-local on strings whose
    length is bounded by session size. This is the batch twin of
    flatMapGroupsWithState CEP."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        epoch_micros("ts").alias("tus"),
    )
    from pyspark.sql import Window as W

    wseq = W.partitionBy("user_id").orderBy("tus", "event_id")
    sess = ev.withColumn(
        "new_sess",
        F.when(
            F.col("tus") - F.lag("tus").over(wseq) > SESSION_GAP_US, 1
        ).otherwise(0),
    ).withColumn(
        "sess_id", F.sum("new_sess").over(wseq.rowsBetween(W.unboundedPreceding, 0))
    )
    seqs = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tus", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("seq")
        )
    )
    return seqs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("seq").rlike(SEQ_PATTERN), 1).otherwise(0)
        ).alias("n_matching"),
    )


QUERIES["events_pattern_match"] = events_pattern_match

ORACLES["events_pattern_match"] = f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
    ), lagged AS (
        SELECT *, CASE WHEN tus - lag(tus) OVER w > {SESSION_GAP_US}
                       THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ), sess AS (
        SELECT *, sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY tus, event_id
            ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM lagged
    ), seqs AS (
        SELECT user_id, sess_id,
               string_agg(event_type, '>' ORDER BY tus, event_id) AS seq
        FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN regexp_matches(seq, '{SEQ_PATTERN}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
    FROM seqs GROUP BY user_id
"""


def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning decomposition per day: a user is NEW on their
    first-seen day and RETURNING on later active days; the running sum
    of new users is the cumulative distinct-user count — computed
    without any distinct-over-window, just a first-seen min() and one
    cumulative frame over the per-day rollup.

    100 TB: first-seen is a user-keyed min aggregation (map-side
    combinable); the cumulative window runs over |days| pre-aggregated
    rows. This is the exact pattern for 'cumulative uniques' at scale —
    never a running COUNT(DISTINCT)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    ud = ev.distinct()
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    tagged = ud.join(first_seen, "user_id").select(
        "day", (F.col("day") == F.col("first_day")).alias("is_new")
    )
    daily = tagged.groupBy("day").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("returning_users"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        "returning_users",
        F.sum("new_users").over(w).alias("cumulative_distinct_users"),
    )


QUERIES["events_new_vs_returning"] = events_new_vs_returning

ORACLES["events_new_vs_returning"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), fs AS (
        SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1
    ), daily AS (
        SELECT day,
               CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
                   AS new_users,
               CAST(sum(CASE WHEN day != first_day THEN 1 ELSE 0 END) AS BIGINT)
                   AS returning_users
        FROM ud JOIN fs USING (user_id) GROUP BY day
    )
    SELECT day, new_users, returning_users,
           CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cumulative_distinct_users
    FROM daily
"""


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — time-to-next-failure analytics: each
    purchase matched to the user's EARLIEST error at-or-after it,
    within a 1-hour tolerance (null beyond). Exercises the generic
    operator's forward direction (operators/asof.py ``direction=
    'forward'``: mirrored frame, first(ignorenulls), tie toward the
    right row at equal timestamps).

    Same scale shape as backward: one user-keyed shuffle + sort, no
    range-join explosion."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedupe to one error per (user, instant): equal-timestamp right
    # rows have no defined order inside the as-of window, so collapse
    # ties deterministically (min event_id) before joining
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").alias("err_ts"))
        .agg(F.min("event_id").alias("err_id"))
    )
    out = asof_join(
        purchases,
        errors,
        by="user_id",
        left_time="ts",
        right_time="err_ts",
        value_cols=["err_id"],
        tolerance_micros=3600 * 1_000_000,
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "err_id",
        (epoch_micros(F.col("_matched_time")) - epoch_micros("ts")).alias(
            "micros_to_error"
        ),
    )


QUERIES["asof_join_forward"] = asof_join_forward

ORACLES["asof_join_forward"] = """
    WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        WHERE event_type = 'purchase'
    ), e AS (
        SELECT user_id, epoch_us(ts) AS etus, event_id AS err_id FROM events
        WHERE event_type = 'error'
    ), ed AS (
        SELECT user_id, etus, min(err_id) AS err_id FROM e GROUP BY 1, 2
    ), matched AS (
        SELECT p.event_id, p.user_id, ed.err_id,
               ed.etus - p.tus AS micros_to_error,
               row_number() OVER (
                   PARTITION BY p.event_id ORDER BY ed.etus NULLS LAST) AS rn
        FROM p LEFT JOIN ed
          ON p.user_id = ed.user_id
         AND ed.etus >= p.tus AND ed.etus - p.tus <= 3600000000
    )
    SELECT event_id, user_id, err_id, micros_to_error FROM matched WHERE rn = 1
"""


def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the LONGEST run of consecutive
    active days (and how many distinct islands of activity they have).
    The classic rewrite — day_number − dense_rank over distinct active
    days is constant within an island — turns streak detection into one
    window plus one aggregation; no self-join, no recursion.

    100 TB: one user-keyed shuffle for the window over DISTINCT
    (user, day) rows (bounded by days-per-user, not events), then a
    per-user aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    islands = ud.withColumn(
        "island", F.col("d") - F.dense_rank().over(w)
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return per_island.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len").alias("active_days"),
    )


QUERIES["events_streaks"] = events_streaks

ORACLES["events_streaks"] = """
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ), islands AS (
        SELECT user_id, d,
               d - dense_rank() OVER (PARTITION BY user_id ORDER BY d) AS island
        FROM ud
    ), per_island AS (
        SELECT user_id, island, count(*) AS len
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           max(len) AS longest_streak,
           count(*) AS n_islands,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM per_island GROUP BY user_id
"""


# ------------------------------------------------------- CUPED A/B read
# Variance-reduced experiment readout (Deng et al. 2013): users hash
# into arms A/B; the PRE-period covariate (each user's first-half value
# sum) absorbs between-user variance from the post-period metric via
# theta = cov(X, Y)/var(X), and the adjusted arm means are
# mean(Y) − theta·(mean(X) − mean(X_all)). The estimator is the
# analytics query every experimentation platform runs at scale: two
# integer per-user aggregations (one shuffle on user_id), a tiny
# per-arm moment aggregate, and driver-free scalar algebra. All
# moments are exact DECIMAL(38,0) sums of micro-unit integers (the
# quality_correlation overflow discipline); theta and the adjusted
# means are shared-literal double algebra, pround(4).
#
# Determinism: arm = portable user hash mod 2; the period split is the
# data's midpoint hour, derived identically on both sides (the
# streaming_latedata_drop rule — no fixture-coupled literals).


def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import iunits, pround
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    HOUR_US = 3_600_000_000
    b = ev.agg(
        F.min(epoch_micros("ts")).alias("lo"), F.max(epoch_micros("ts")).alias("hi")
    )
    per_user = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.when(
                epoch_micros("ts")
                < F.expr(f"((lo + hi) div 2 div {HOUR_US}) * {HOUR_US}"),
                iunits(F.col("value"), 6),
            )
            .otherwise(F.lit(0))
            .alias("x"),
            F.when(
                epoch_micros("ts")
                >= F.expr(f"((lo + hi) div 2 div {HOUR_US}) * {HOUR_US}"),
                iunits(F.col("value"), 6),
            )
            .otherwise(F.lit(0))
            .alias("y"),
        )
        .groupBy("user_id")
        .agg(F.sum("x").alias("x"), F.sum("y").alias("y"))
        .select(
            "user_id",
            "x",
            "y",
            (token_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
        )
    )
    dec = "decimal(38,0)"
    mom = per_user.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x").cast(dec))).alias("sxx"),
        F.sum((F.col("x").cast(dec) * F.col("y").cast(dec))).alias("sxy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast(dec).alias("na"),
        F.sum(F.col("x").cast(dec)).alias("ax"),
        F.sum(F.col("y").cast(dec)).alias("ay"),
    )
    # round 9: the adjusted mean was a multi-op double chain
    # (theta regression + two divisions) under pround — the full-sweep
    # jitter audit caught a real 1e-4 tie on the regenerated fixture.
    # Now the ENTIRE estimator is one signed rational of exact DECIMAL
    # moments: with D = n·sxx − sx², N = n·sxy − sx·sy,
    # cuped = [ay·D·n − N·(ax·n − na·sx)] / (na·n·D · 1e6), snapped
    # half-up to 4 dp in integer arithmetic; raw_mean likewise. The
    # only doubles are the final /1e4 displays of exact BIGINTs.
    # D = 0 (constant covariate) yields NULL — the defined contract.
    def _signed_ratio4(num: str, den: str) -> "F.Column":
        return F.expr(
            f"CASE WHEN ({den}) = 0 THEN NULL"
            f" WHEN ({num}) >= 0"
            f" THEN CAST((2 * ({num}) + ({den})) div (2 * ({den})) AS BIGINT)"
            f" ELSE -CAST((2 * (-({num})) + ({den})) div (2 * ({den}))"
            " AS BIGINT) END"
        )

    Dt = "(n * sxx - sx * sx)"
    Nt = "(n * sxy - sx * sy)"
    num_c = f"(ay * {Dt} * n - {Nt} * (ax * n - na * sx))"
    den_c = f"(na * n * {Dt} * 100)"
    return (
        arms.crossJoin(F.broadcast(mom))
        .select(
            F.col("arm").cast("long").alias("arm"),
            F.col("na").cast("long").alias("n_users"),
            (
                _signed_ratio4("ay", "na * 100").cast("double") / F.lit(1e4)
            ).alias("raw_mean"),
            (
                _signed_ratio4(num_c, den_c).cast("double") / F.lit(1e4)
            ).alias("cuped_mean"),
        )
    )


QUERIES["events_cuped"] = events_cuped

from ..functions.hashing import sql_token_hash as _sql_th_cuped  # noqa: E402
from ..functions.rounding import sql_iunits as _sql_iu_cuped  # noqa: E402
from ..functions.rounding import sql_pround as _sql_pr_cuped  # noqa: E402

ORACLES["events_cuped"] = f"""
    WITH b AS (
        -- pure // chain: mixing / and // here parsed with surprising
        -- precedence in DuckDB and silently skipped the hour snap
        SELECT ((epoch_us(min(ts)) + epoch_us(max(ts))) // 2 // 3600000000)
                   * 3600000000 AS mid_us
        FROM events
    ), per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN epoch_us(ts) < mid_us
                             THEN {_sql_iu_cuped('value', 6)} ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN epoch_us(ts) >= mid_us
                             THEN {_sql_iu_cuped('value', 6)} ELSE 0 END) AS BIGINT) AS y,
               ({_sql_th_cuped('CAST(user_id AS VARCHAR)')}) % 2 AS arm
        FROM events, b GROUP BY user_id, mid_us
    ), mom AS (
        SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
               sum(CAST(x AS DECIMAL(38,0))) AS sx,
               sum(CAST(y AS DECIMAL(38,0))) AS sy,
               sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
               sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
        FROM per_user
    ), arms AS (
        SELECT arm, CAST(count(*) AS DECIMAL(38,0)) AS na,
               sum(CAST(x AS DECIMAL(38,0))) AS ax,
               sum(CAST(y AS DECIMAL(38,0))) AS ay
        FROM per_user GROUP BY arm
    )
    , h AS (
        SELECT CAST(arm AS BIGINT) AS arm,
               CAST(na AS HUGEINT) AS na, CAST(ax AS HUGEINT) AS ax,
               CAST(ay AS HUGEINT) AS ay, CAST(n AS HUGEINT) AS n,
               CAST(sx AS HUGEINT) AS sx, CAST(sy AS HUGEINT) AS sy,
               CAST(sxx AS HUGEINT) AS sxx, CAST(sxy AS HUGEINT) AS sxy
        FROM arms, mom
    )
    SELECT arm,
           CAST(na AS BIGINT) AS n_users,
           CAST(CASE WHEN ay >= 0
                THEN CAST((2 * ay + na * 100) // (2 * na * 100) AS BIGINT)
                ELSE -CAST((2 * (-ay) + na * 100) // (2 * na * 100)
                     AS BIGINT) END AS DOUBLE) / 1e4 AS raw_mean,
           CAST(CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
                WHEN (ay * (n * sxx - sx * sx) * n
                      - (n * sxy - sx * sy) * (ax * n - na * sx)) >= 0
                THEN CAST((2 * (ay * (n * sxx - sx * sx) * n
                        - (n * sxy - sx * sy) * (ax * n - na * sx))
                      + na * n * (n * sxx - sx * sx) * 100)
                     // (2 * na * n * (n * sxx - sx * sx) * 100) AS BIGINT)
                ELSE -CAST((2 * (-(ay * (n * sxx - sx * sx) * n
                        - (n * sxy - sx * sy) * (ax * n - na * sx)))
                      + na * n * (n * sxx - sx * sx) * 100)
                     // (2 * na * n * (n * sxx - sx * sx) * 100) AS BIGINT)
           END AS DOUBLE) / 1e4 AS cuped_mean
    FROM h
"""


# ------------------------------------------------------ conversion attribution
# Multi-touch attribution: every purchase's value is credited to the
# user's clicks inside the preceding ATTR_WINDOW — LINEAR (equal
# integer split, remainder to the earliest clicks) and LAST-TOUCH
# (whole value to the most recent click) in one pass. The standard
# marketing-analytics op and the integer-split discipline matters: a
# double v/n split would drift cross-engine; ``div``/``mod`` with a
# deterministic remainder rule is bit-exact and sums back to the
# purchase total by construction.
#
# Domain contract (ADVICE r7, enforced structurally): purchase value
# >= 0. The remainder-to-earliest rule presumes a non-negative
# remainder (r_early <= negative remainder never fires, breaking the
# credits-sum-to-total invariant), and Spark div/% vs DuckDB //,%
# differ in sign convention on negatives — so refunds/chargebacks are
# FILTERED OUT in both engines, not silently mis-credited. A refund-
# aware variant would credit sign-symmetrically (remainder to earliest
# by |value|) — out of scope for this op.
#
# Scale: one user-keyed equi-join (the natural partitioning key) with
# the time window as a pushed residual filter — per-user fan-in is
# bounded by activity, not corpus size; both window ranks ride the
# join's own (purchase) partitioning. At extreme per-user skew, the
# bucketed range join (operators/rangejoin.py) is the drop-in
# replacement for the same predicate.

ATTR_WINDOW_US = 72 * 3600 * 1_000_000  # 72-hour lookback


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        epoch_micros(F.col("ts")).alias("c_us"),
    )
    purch = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("value") >= 0)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            epoch_micros(F.col("ts")).alias("p_us"),
            iunits(F.col("value")).alias("v_micros"),
        )
    )
    pairs = purch.join(clicks, "user_id").filter(
        (F.col("c_us") < F.col("p_us"))
        & (F.col("c_us") >= F.col("p_us") - F.lit(ATTR_WINDOW_US))
    )
    wp = W.partitionBy("purchase_id")
    early = F.row_number().over(
        wp.orderBy(F.asc("c_us"), F.asc("click_id"))
    )
    late = F.row_number().over(
        wp.orderBy(F.desc("c_us"), F.desc("click_id"))
    )
    ranked = pairs.select(
        "purchase_id",
        "click_id",
        "user_id",
        "v_micros",
        early.alias("r_early"),
        late.alias("r_late"),
        F.count(F.lit(1)).over(wp).alias("n_touch"),
    )
    share = F.expr("v_micros div n_touch") + F.when(
        F.col("r_early") <= F.expr("v_micros % n_touch"), F.lit(1)
    ).otherwise(F.lit(0))
    credited = ranked.select(
        "click_id",
        "user_id",
        share.alias("linear_micros"),
        F.when(F.col("r_late") == 1, F.col("v_micros"))
        .otherwise(F.lit(0))
        .alias("last_micros"),
        F.when(F.col("r_late") == 1, F.lit(1)).otherwise(F.lit(0)).alias("is_last"),
    )
    return credited.groupBy("click_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("linear_micros").alias("linear_micros"),
        F.sum("last_micros").alias("last_touch_micros"),
        F.sum("is_last").alias("n_last_touch"),
    )


QUERIES["events_attribution"] = events_attribution

ORACLES["events_attribution"] = f"""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us,
               CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                   AS v_micros
        FROM events WHERE event_type = 'purchase' AND value >= 0
    ), pairs AS (
        SELECT p.purchase_id, c.click_id, p.user_id, p.v_micros,
               row_number() OVER (PARTITION BY p.purchase_id
                   ORDER BY c.c_us ASC, c.click_id ASC) AS r_early,
               row_number() OVER (PARTITION BY p.purchase_id
                   ORDER BY c.c_us DESC, c.click_id DESC) AS r_late,
               count(*) OVER (PARTITION BY p.purchase_id) AS n_touch
        FROM purch p JOIN clicks c
          ON p.user_id = c.user_id
         AND c.c_us < p.p_us
         AND c.c_us >= p.p_us - {ATTR_WINDOW_US}
    ), credited AS (
        SELECT click_id, user_id,
               v_micros // n_touch
                   + CASE WHEN r_early <= v_micros % n_touch THEN 1 ELSE 0 END
                   AS linear_micros,
               CASE WHEN r_late = 1 THEN v_micros ELSE 0 END AS last_micros,
               CASE WHEN r_late = 1 THEN 1 ELSE 0 END AS is_last
        FROM pairs
    )
    SELECT click_id, user_id,
           count(*) AS n_conversions,
           CAST(sum(linear_micros) AS BIGINT) AS linear_micros,
           CAST(sum(last_micros) AS BIGINT) AS last_touch_micros,
           CAST(sum(is_last) AS BIGINT) AS n_last_touch
    FROM credited GROUP BY 1, 2
"""


# -------------------------------------------------- inter-arrival regularity
# Bot/automation detection for training-data hygiene: human activity
# has bursty inter-arrival gaps (CV² ≈ 1 for Poisson, > 1 for bursty);
# scripted traffic is metronomic (CV² ≪ 1). Per user with >= REG_MIN_N
# events: gaps at SECOND resolution (integer epoch subtraction), CV²
# as an exact milli-unit rational with the second-moment arithmetic in
# DECIMAL(38,0)/HUGEINT (ADVICE r7 medium: the earlier BIGINT rail
# ignored the 2·1000 multiplier inside the rational AND that CV² ≫ 1
# for bursty users — 2000·CV²·span² passes 2^63 at span ≈ 2 years with
# CV² ≈ 1, where Spark non-ANSI wraps silently while DuckDB raises;
# the 38-digit rail holds far beyond any physical span). The final
# CV²·1000 quotient is ≤ 1000·n_gaps, comfortably BIGINT. One
# user-keyed window + one aggregation.

REG_MIN_N = 20
REG_CV2_MAX_MILLIS = 100  # CV² < 0.1 → metronomic


def events_interarrival_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    secs = (epoch_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "event_id", "ts", secs.alias("s"))
        .withColumn("g", F.lead("s").over(w) - F.col("s"))
        .filter(F.col("g").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.sum("g").alias("span_s"),
        F.sum(F.col("g") * F.col("g")).alias("_sgg"),
        F.count(F.lit(1)).alias("_ng"),
    )
    # second moment in DECIMAL(38,0): _ng·_sgg and span² individually
    # overflow int64 at multi-year spans (ADVICE r7) — widen BEFORE the
    # products, not after
    cv2 = ratio_units_dec(
        "CAST(_ng AS DECIMAL(38,0)) * CAST(_sgg AS DECIMAL(38,0))"
        " - CAST(span_s AS DECIMAL(38,0)) * CAST(span_s AS DECIMAL(38,0))",
        "CAST(span_s AS DECIMAL(38,0)) * CAST(span_s AS DECIMAL(38,0))",
        1000,
    )
    return (
        agg.filter((F.col("n_events") >= REG_MIN_N) & (F.col("span_s") > 0))
        .select(
            "user_id",
            "n_events",
            "span_s",
            cv2.alias("cv2_millis"),
        )
        .withColumn(
            "is_regular",
            (F.col("cv2_millis") < REG_CV2_MAX_MILLIS).cast("int"),
        )
    )


QUERIES["events_interarrival_regularity"] = events_interarrival_regularity

ORACLES["events_interarrival_regularity"] = f"""
    WITH g AS (
        SELECT user_id,
               lead(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   - epoch_us(ts) // 1000000 AS g
        FROM events
    ), agg AS (
        SELECT user_id,
               count(g) + 1 AS n_events,
               CAST(sum(g) AS BIGINT) AS span_s,
               CAST(sum(g * g) AS BIGINT) AS sgg,
               count(g) AS ng
        FROM g WHERE g IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n_events, span_s,
           {{cv2}} AS cv2_millis,
           CAST({{cv2}} < {REG_CV2_MAX_MILLIS} AS INTEGER) AS is_regular
    FROM agg
    WHERE n_events >= {REG_MIN_N} AND span_s > 0
""".replace(
    # HUGEINT moments — the int128 twin of the Spark DECIMAL(38,0)
    # rail (ADVICE r7 medium); only the bounded final quotient is cast
    # back to the vetted BIGINT output type
    "{cv2}",
    "CAST(((2 * 1000 * (CAST(ng AS HUGEINT) * sgg"
    " - CAST(span_s AS HUGEINT) * span_s)"
    " + CAST(span_s AS HUGEINT) * span_s)"
    " // (2 * CAST(span_s AS HUGEINT) * span_s)) AS BIGINT)",
)


# ---------------------------------------------------- behavioral entropy
# Per-user Shannon entropy of the (event_type -> next event_type)
# transition distribution — the behavioral-fingerprint companion to
# events_interarrival_regularity: scripted agents cycle a fixed
# transition loop (entropy near 0), humans wander (entropy toward
# ln(T²)). Exact-integer discipline of text_entropy_by_lang:
# H = ln N − Σ c·ln c / N with per-count logs snapped to nano-units
# (c is a small integer, so ln(c) is the same double everywhere and
# the snap is the only rounding). One lead window on the user timeline
# + two aggregations.

ENTROPY_MIN_N = 20


def events_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("user_id", "event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = tr.groupBy("user_id").agg(
        F.sum("c").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_patterns"),
        F.sum(F.col("c") * iunits(F.log(F.col("c").cast("double")), 9)).alias(
            "_clnc"
        ),
    )
    h = F.log(F.col("n_transitions").cast("double")) - (
        F.col("_clnc").cast("double") / F.lit(1e9)
    ) / F.col("n_transitions").cast("double")
    return per_user.filter(F.col("n_transitions") >= ENTROPY_MIN_N).select(
        "user_id",
        "n_transitions",
        "n_patterns",
        pround(h, 6).alias("entropy_nats"),
    )


QUERIES["events_behavior_entropy"] = events_behavior_entropy

ORACLES["events_behavior_entropy"] = f"""
    WITH tr AS (
        SELECT user_id, event_type, next_type, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        WHERE next_type IS NOT NULL
        GROUP BY 1, 2, 3
    ), per_user AS (
        SELECT user_id,
               CAST(sum(c) AS BIGINT) AS n_transitions,
               CAST(count(*) AS BIGINT) AS n_patterns,
               CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS clnc
        FROM tr GROUP BY 1
    )
    SELECT user_id, n_transitions, n_patterns,
           {{pr}} AS entropy_nats
    FROM per_user
    WHERE n_transitions >= {ENTROPY_MIN_N}
""".replace(
    "{pr}",
    "(floor((ln(CAST(n_transitions AS DOUBLE))"
    " - (CAST(clnc AS DOUBLE) / 1000000000.0)"
    " / CAST(n_transitions AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)",
)


# ----------------------------------------------------- DAU/WAU stickiness
# The canonical engagement ratio (round 8): per day, distinct active
# users that day over distinct users in the trailing 7 days. Sliding
# distinct does NOT decompose into daily sums, so WAU is computed
# exactly by COVERAGE EXPANSION: each (user, active_day) pair covers
# the 7 report days [day, day+6]; distinct (user, covered_day) then
# counts per covered day — a bounded 7× row amplification instead of
# any re-scan-per-day window, the shape that holds at 100 TB (compare
# events_rolling_distinct, which pins the same trick for value keys).
# All-integer day buckets; the ratio is the exact BIGINT rational.

DAY_US = 86_400_000_000


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        (epoch_micros(F.col("ts")) / F.lit(DAY_US))
        .cast("long")
        .alias("day"),
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covered = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(6))
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(covered, "day")
        .select(
            "day",
            "dau",
            "wau",
            ratio_micros("dau", "wau").alias("stickiness_micros"),
        )
    )


QUERIES["events_dau_wau"] = events_dau_wau

ORACLES["events_dau_wau"] = f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {DAY_US} AS day
        FROM events
    ), dau AS (
        SELECT day, count(*) AS dau FROM ud GROUP BY 1
    ), covered AS (
        SELECT day, count(*) AS wau FROM (
            SELECT DISTINCT user_id, day + k AS day
            FROM ud, (SELECT unnest(range(0, 7)) AS k)
        ) GROUP BY 1
    )
    SELECT dau.day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(covered.wau AS BIGINT) AS wau,
           {{r}} AS stickiness_micros
    FROM dau JOIN covered ON dau.day = covered.day
""".replace(
    "{r}",
    "(CASE WHEN CAST(covered.wau AS BIGINT) = 0 THEN NULL ELSE"
    " (2000000 * CAST(dau.dau AS BIGINT) + CAST(covered.wau AS BIGINT))"
    " // (2 * CAST(covered.wau AS BIGINT)) END)",
)


# ----------------------------------------------------------- cohort LTV
# The revenue dimension of events_retention: per (cohort_date,
# day_offset), the purchase revenue cohort members generated that day
# and its running total — the cohort lifetime-value curve behind every
# payback-period decision. Revenue is exact integer cents; the running
# total is a per-cohort window over the |cohorts|×|offsets| relation,
# which is calendar-bounded (≤ 31×31 here) regardless of event volume.
# The per-member LTV ratio splits sign explicitly (refunds can drive a
# day — or a whole cohort — negative, and the half-up rational trick
# is half-up only on the non-negative domain; div/`//` truncate toward
# zero, the kappa precedent).
#
# Scale: one user-keyed aggregation for cohorts (one row per user),
# one (cohort, offset)-keyed aggregation of the pre-joined events, the
# constant-size window. Every cohort join is on user_id — AQE reuses
# the cohort relation's partitioning for both consumers.


def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.when(
            F.col("event_type") == "purchase", iunits(F.col("value"), 2)
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    # |users| rows, two consumers (sizes + the daily join) — local
    # checkpoint so the event scan backing it runs once; checkpoint
    # rather than persist so the relation never enters the
    # CacheManager (run-order plan determinism) and its blocks are
    # GC-released after the query (VERDICT r9 item 1)
    cohort = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("cohort_date"))
        .localCheckpoint(eager=False)
    )
    sizes = cohort.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    daily = (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff("d", "cohort_date").cast("int").alias("day_offset"),
        )
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        W.partitionBy("cohort_date")
        .orderBy("day_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = daily.select(
        "cohort_date",
        "day_offset",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_rev_cents"),
    )
    return cum.join(sizes, "cohort_date").select(
        "cohort_date",
        "day_offset",
        "rev_cents",
        "cum_rev_cents",
        "cohort_size",
        F.expr(
            "CASE WHEN cum_rev_cents >= 0"
            " THEN (2000000 * cum_rev_cents + cohort_size)"
            "      div (2 * cohort_size)"
            " ELSE -((2000000 * (-cum_rev_cents) + cohort_size)"
            "        div (2 * cohort_size)) END"
        ).alias("ltv_micros"),
    )


QUERIES["events_cohort_ltv"] = events_cohort_ltv

ORACLES["events_cohort_ltv"] = f"""
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CASE WHEN event_type = 'purchase'
                    THEN {sql_iunits('value', 2)} ELSE 0 END AS cents
        FROM events
    ), cohort AS (
        SELECT user_id, min(d) AS cohort_date FROM ev GROUP BY 1
    ), sizes AS (
        SELECT cohort_date, CAST(count(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY 1
    ), daily AS (
        SELECT c.cohort_date,
               CAST(date_diff('day', c.cohort_date, ev.d) AS INTEGER)
                   AS day_offset,
               CAST(sum(ev.cents) AS BIGINT) AS rev_cents
        FROM ev JOIN cohort c ON ev.user_id = c.user_id
        GROUP BY 1, 2
    ), cum AS (
        SELECT cohort_date, day_offset, rev_cents,
               CAST(sum(rev_cents) OVER (
                   PARTITION BY cohort_date ORDER BY day_offset
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_rev_cents
        FROM daily
    )
    SELECT cum.cohort_date, day_offset, rev_cents, cum_rev_cents,
           cohort_size,
           CASE WHEN cum_rev_cents >= 0
                THEN (2000000 * cum_rev_cents + cohort_size)
                     // (2 * cohort_size)
                ELSE -((2000000 * (-cum_rev_cents) + cohort_size)
                       // (2 * cohort_size)) END AS ltv_micros
    FROM cum JOIN sizes ON cum.cohort_date = sizes.cohort_date
"""


# --------------------------------------------------- freshness/volume DQ
# The fourth standard data-quality monitor next to dq_orders_constraints
# (values), dq_referential_integrity (links), dq_quarantine_orders
# (row dumps): per event stream, WHEN did data last arrive and did the
# latest day's VOLUME collapse. Staleness is an exact integer-minute
# lag behind the freshest stream (the pipeline-stuck alarm); the volume
# check scores the global-latest-day count against the stream's own
# trailing daily mean as the exact rational n_latest·days_prior /
# total_prior (a silent-upstream-drop shows up as vol_ratio ≪ 1e6
# with zero staleness — the failure freshness alone misses).
#
# Scale: one (type, day) pre-aggregation (map-side partials collapse
# the event volume), then everything runs on the |types|×|days|
# relation — calendar-bounded. The 1-row global-max relation is a
# broadcast crossJoin, never a re-scan.


def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        epoch_micros(F.col("ts")).alias("tus"),
    )
    # |types|×|days| rows, two consumers (global max + report) —
    # checkpoint so the event scan runs once
    td = (
        ev.groupBy(
            "event_type",
            (F.col("tus") / F.lit(DAY_US)).cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.max("tus").alias("last_tus"))
        .localCheckpoint()
    )
    g = td.agg(
        F.max("day").alias("gday"), F.max("last_tus").alias("gmax_tus")
    )
    per = (
        td.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.max("last_tus").alias("last_tus"),
            F.max(F.col("gmax_tus")).alias("gmax_tus"),
            F.sum(F.when(F.col("day") == F.col("gday"), F.col("n")).otherwise(0)).alias(
                "n_latest_day"
            ),
            F.sum(F.when(F.col("day") < F.col("gday"), F.col("n")).otherwise(0)).alias(
                "total_prior"
            ),
            F.sum(
                F.when(F.col("day") < F.col("gday"), F.lit(1)).otherwise(0)
            ).alias("days_prior"),
        )
    )
    return per.select(
        "event_type",
        "n_events",
        F.expr("(gmax_tus - last_tus) div 60000000").alias("staleness_min"),
        "n_latest_day",
        ratio_micros("n_latest_day * days_prior", "total_prior").alias(
            "vol_ratio_micros"
        ),
    )


QUERIES["dq_freshness"] = dq_freshness

ORACLES["dq_freshness"] = """
    WITH td AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(epoch_us(ts)) AS BIGINT) AS last_tus
        FROM events GROUP BY 1, 2
    ), g AS (
        SELECT max(day) AS gday, max(last_tus) AS gmax_tus FROM td
    ), per AS (
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(max(last_tus) AS BIGINT) AS last_tus,
               CAST(max(gmax_tus) AS BIGINT) AS gmax_tus,
               CAST(sum(CASE WHEN day = gday THEN n ELSE 0 END) AS BIGINT)
                   AS n_latest_day,
               CAST(sum(CASE WHEN day < gday THEN n ELSE 0 END) AS BIGINT)
                   AS total_prior,
               CAST(sum(CASE WHEN day < gday THEN 1 ELSE 0 END) AS BIGINT)
                   AS days_prior
        FROM td, g GROUP BY 1
    )
    SELECT event_type, n_events,
           (gmax_tus - last_tus) // 60000000 AS staleness_min,
           n_latest_day,
           (CASE WHEN total_prior = 0 THEN NULL ELSE
            (2000000 * (n_latest_day * days_prior) + total_prior)
            // (2 * total_prior) END) AS vol_ratio_micros
    FROM per
"""


# -------------------------------------------------------------- RFM
# Recency/Frequency/Monetary segmentation (the classic CRM cube): per
# purchasing user, days since last purchase, purchase count, and net
# spend in exact cents, each cut into quintiles by ntile(5) over a
# TOTAL order ((metric, user_id) — ntile's bucket boundaries are pure
# row arithmetic, so a total order makes the assignment engine-exact;
# recency orders ASCENDING on staleness so R=5 is "purchased
# yesterday", the marketing convention). Output is the per-user
# segment row — the relation every campaign query joins against.
#
# Scale (VERDICT r10 item 1; fused r12 per VERDICT r11 item 5): one
# purchase-filtered scan → one user aggregate; the three quintile
# assignments come from EXACT global row numbers on the
# distributed-rank rail (operators/ranks.py) — and all three metrics
# ride ONE rail pass: the user-grain relation unions 3 tagged copies
# (each with its metric as an ascending sort key: recency, −frequency,
# −monetary), and the rail's ``group=`` support restarts the total
# order per tag. Buckets are per-tag CASE expressions honoring the
# rail's refinement contract — recency/frequency use their EXACT
# (small-domain) value refined by a user-id range bucket (huge tie
# groups spread across partitions); monetary uses a range quantization
# of the cents axis alone (a quantized SECONDARY bucket is only valid
# under an exact leading bucket). The ntile index is pure integer
# arithmetic from (row_number, n) — ``sql_ntile_from_rn`` replicates
# the SQL ntile bucket-size rule exactly. The fusion cuts the
# data-grain exchanges from 6 (3 passes × bucket-agg + local window)
# to 3 (one bucket-agg, one local window, one pivot groupBy); no
# unpartitioned data-grain window anywhere — stitch windows stay
# bucket-grain per tag.


def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import (
        range_bucket,
        sql_ntile_from_rn,
        with_global_order,
    )

    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max(epoch_micros(F.col("ts"))).alias("gmax"))
    per = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            epoch_micros(F.col("ts")).alias("tus"),
            iunits(F.col("value"), 2).alias("cents"),
        )
        .crossJoin(F.broadcast(g))
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST((min(gmax) - max(tus)) div 86400000000 AS BIGINT)"
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
    )
    # materialize the user-grain aggregate ONCE (localCheckpoint —
    # CacheManager-free): the tagged union references it 3x and the
    # rail references the union for both its main relation and its
    # bucket aggregate — without this the events scan+groupBy would
    # re-plan ~6x (the r11 bench caught exactly that as a 6x warm
    # regression)
    per = per.localCheckpoint(eager=False)
    bounds = per.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min("monetary_cents").alias("lo_m"),
        F.max("monetary_cents").alias("hi_m"),
        F.count(F.lit(1)).alias("n_users"),
    )
    carry = ["user_id", "recency_days", "frequency", "monetary_cents"]
    tagged = (
        per.select(*carry, F.lit("r").alias("tag"),
                   F.col("recency_days").alias("skey"))
        .unionByName(
            per.select(*carry, F.lit("f").alias("tag"),
                       (-F.col("frequency")).alias("skey"))
        )
        .unionByName(
            per.select(*carry, F.lit("m").alias("tag"),
                       (-F.col("monetary_cents")).alias("skey"))
        )
    )
    base = tagged.crossJoin(F.broadcast(bounds))
    u_b = range_bucket(F.col("user_id"), F.col("lo_u"), F.col("hi_u"), 64)
    m_b = -range_bucket(
        F.col("monetary_cents"), F.col("lo_m"), F.col("hi_m"), 1024
    )
    b0 = F.when(F.col("tag") == "m", m_b.cast("long")).otherwise(F.col("skey"))
    b1 = F.when(F.col("tag") == "m", F.lit(0)).otherwise(u_b)
    ranked = with_global_order(
        base,
        buckets=[b0, b1],
        order=[F.asc("skey"), F.asc("user_id")],
        row_number="rn",
        group=["tag"],
    )
    rns = ranked.groupBy("user_id").agg(
        F.first("recency_days").alias("recency_days"),
        F.first("frequency").alias("frequency"),
        F.first("monetary_cents").alias("monetary_cents"),
        F.max(F.when(F.col("tag") == "r", F.col("rn"))).alias("rn_r"),
        F.max(F.when(F.col("tag") == "f", F.col("rn"))).alias("rn_f"),
        F.max(F.when(F.col("tag") == "m", F.col("rn"))).alias("rn_m"),
    ).crossJoin(F.broadcast(bounds.select("n_users")))
    nt = lambda rn: F.expr(sql_ntile_from_rn(rn, "n_users", 5))  # noqa: E731
    return rns.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        (F.lit(6) - nt("rn_r")).cast("int").alias("r_score"),
        (F.lit(6) - nt("rn_f")).cast("int").alias("f_score"),
        (F.lit(6) - nt("rn_m")).cast("int").alias("m_score"),
    ).withColumn(
        "rfm_code",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int"),
    )


QUERIES["events_rfm"] = events_rfm

ORACLES["events_rfm"] = f"""
    WITH g AS (
        SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS gmax FROM events
    ), per AS (
        SELECT user_id,
               CAST((min(gmax) - max(epoch_us(ts))) // 86400000000 AS BIGINT)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum({sql_iunits('value', 2)}) AS BIGINT) AS monetary_cents
        FROM events, g
        WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT user_id, recency_days, frequency, monetary_cents,
           CAST(6 - ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC)
                AS INTEGER) AS r_score,
           CAST(6 - ntile(5) OVER (ORDER BY frequency DESC, user_id ASC)
                AS INTEGER) AS f_score,
           CAST(6 - ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC)
                AS INTEGER) AS m_score,
           CAST((6 - ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC)) * 100
              + (6 - ntile(5) OVER (ORDER BY frequency DESC, user_id ASC)) * 10
              + (6 - ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC))
                AS INTEGER) AS rfm_code
    FROM per
"""


# ------------------------------------------------------- bounce rate
# Single-event sessions over total sessions per day — the classic web
# engagement KPI, computed on the SAME session contract as
# events_session (10-minute-gap session windows per user). Gaps-and-
# islands on the oracle side matches session_window semantics exactly
# (session end = last event + gap), so the KPI is hash-pinned to the
# session operator it summarizes. One user-keyed shuffle + one
# day-keyed aggregate; sessions are attributed to their START day.


def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "10 minutes")
    sess = ev.groupBy(sw, "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    per_day = sess.select(
        F.to_date(F.col("session_window.start")).alias("day"),
        (F.col("n_events") == 1).cast("long").alias("bounce"),
    )
    return per_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("bounce").alias("n_bounces"),
    ).withColumn("bounce_rate_micros", ratio_micros("n_bounces", "n_sessions"))


QUERIES["events_bounce_rate"] = events_bounce_rate

ORACLES["events_bounce_rate"] = """
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > INTERVAL '10 minutes'
                    OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
               THEN 1 ELSE 0 END AS is_start
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               sum(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM ordered
    ), sess AS (
        SELECT user_id, sid,
               CAST(min(ts) AS DATE) AS day,
               count(*) AS n_events
        FROM numbered GROUP BY 1, 2
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           (CASE WHEN count(*) = 0 THEN NULL ELSE
            (2000000 * CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) + CAST(count(*) AS BIGINT))
            // (2 * CAST(count(*) AS BIGINT)) END) AS bounce_rate_micros
    FROM sess GROUP BY 1
"""


# ------------------------------------------- Kaplan–Meier (sessions)
# Survival analysis over SESSION DURATION — the estimator behind
# "how long do sessions last" with CENSORING done right: a session
# whose last event sits within the 10-minute gap of the global stream
# end may still be open, so it is censored at its observed duration
# rather than counted as ended (naive duration histograms conflate
# the two; user-level churn is degenerate on this fixture — every
# user is active in the final days — so duration survival is the
# non-trivial subject). Sessions are the events_session contract
# (10-minute gaps); duration is integer minutes. Per duration t with
# endings: risk set n_t = sessions with duration ≥ t, deaths d_t,
# and ln S(t) = Σ_{s ≤ t} ln((n_s − d_s)/n_s) carried as EXACT
# integer nano-units (the behavior-entropy ln-snap contract; the
# cumulative sum is pure BIGINT — no exp() ever runs, the hashed
# column IS the log-survival).
#
# Scale: one user-keyed session aggregation, one duration-keyed
# aggregate, suffix/cumulative windows over the |durations| relation
# (bounded by the session cap, not data volume).

KM_GAP_MIN = 10


def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max(epoch_micros(F.col("ts"))).alias("gmax_us"))
    sw = F.session_window("ts", f"{KM_GAP_MIN} minutes")
    sess = ev.groupBy(sw, "user_id").agg(
        F.max(epoch_micros(F.col("ts"))).alias("last_us"),
        F.min(epoch_micros(F.col("ts"))).alias("first_us"),
    )
    marked = sess.crossJoin(F.broadcast(g)).select(
        F.expr("(last_us - first_us) div 60000000").alias("t"),
        (
            F.col("last_us")
            < F.col("gmax_us") - F.lit(KM_GAP_MIN * 60_000_000)
        )
        .cast("long")
        .alias("death"),
    )
    days = marked.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_exit"),
        F.sum("death").alias("n_deaths"),
    )
    w_suffix = W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, 0)
    w_cum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    risk = days.select(
        "t",
        "n_deaths",
        (F.col("n_exit") - F.col("n_deaths")).alias("n_censored"),
        F.sum("n_exit").over(w_suffix).alias("n_risk"),
    )
    # the terminal step where EVERY remaining session ends drives
    # S(t) to exactly zero — ln is undefined there, so the cumulative
    # log-survival is NULL from that step on (the honest convention;
    # S = 0 is recoverable from n_risk == n_deaths itself)
    term = F.when(
        (F.col("n_deaths") > 0) & (F.col("n_risk") > F.col("n_deaths")),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_deaths")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    hit_zero = F.max(
        (F.col("n_risk") == F.col("n_deaths")).cast("int")
    ).over(w_cum)
    return risk.select(
        "t",
        "n_risk",
        "n_deaths",
        "n_censored",
        F.when(hit_zero == 1, F.lit(None).cast("long"))
        .otherwise(F.sum(term).over(w_cum))
        .alias("cum_lnS_nanos"),
    ).filter(F.col("n_deaths") > 0)


QUERIES["events_survival_km"] = events_survival_km

ORACLES["events_survival_km"] = f"""
    WITH g AS (
        SELECT max(epoch_us(ts)) AS gmax_us FROM events
    ), ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > INTERVAL '{KM_GAP_MIN} minutes'
                    OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
               THEN 1 ELSE 0 END AS is_start
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               sum(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM ordered
    ), sess AS (
        SELECT user_id, sid,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM numbered GROUP BY 1, 2
    ), marked AS (
        SELECT (last_us - first_us) // 60000000 AS t,
               CASE WHEN last_us < gmax_us - {KM_GAP_MIN * 60_000_000}
                    THEN 1 ELSE 0 END AS death
        FROM sess, g
    ), days AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n_exit,
               CAST(sum(death) AS BIGINT) AS n_deaths
        FROM marked GROUP BY 1
    ), risk AS (
        SELECT t, n_deaths, n_exit - n_deaths AS n_censored,
               CAST(sum(n_exit) OVER (
                   ORDER BY t DESC ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS n_risk
        FROM days
    ), terms AS (
        SELECT t, n_risk, n_deaths, n_censored,
               CASE WHEN n_deaths > 0 AND n_risk > n_deaths THEN
                    CAST(floor(ln(CAST(n_risk - n_deaths AS DOUBLE)
                                  / CAST(n_risk AS DOUBLE)) * 1000000000.0
                               + 0.5) AS BIGINT)
               ELSE 0 END AS term,
               CASE WHEN n_risk = n_deaths THEN 1 ELSE 0 END AS z
        FROM risk
    )
    SELECT t, n_risk, n_deaths, CAST(n_censored AS BIGINT) AS n_censored,
           CASE WHEN max(z) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                THEN NULL
                ELSE CAST(sum(term) OVER (
                    ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
           END AS cum_lnS_nanos
    FROM terms
    QUALIFY n_deaths > 0
"""


# --------------------------------------------------- top onboarding paths
# Round 10: sequential-pattern mining's serving query — the exact count
# of each user's FIRST-3-EVENT path (the onboarding flow), ranked by
# frequency with its share of path-complete users. This is the "what
# do new users actually do" Sankey feed, and the exact-count baseline a
# PrefixSpan-style miner would be validated against. Only users with
# ≥ 3 events qualify (partial paths are a different population —
# events_bounce_rate covers them).
#
# Determinism: per-user ordering is (ts, event_id) — event_id is unique
# so the sort key is total; ranking ties break on path ascending.
# Scale: one per-user row_number window (early-filtered to rn ≤ 3 rows
# per user), one |users|-row path aggregation, and a ≤ |event_types|³
# path-count relation; the total is a 1-row broadcast. Nothing is
# corpus-quadratic and no stage exceeds |users| rows.

TOP_PATHS_K = 10


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )
    paths = (
        first3.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.array_sort(F.collect_list(F.struct("rn", "event_type"))).alias(
                "arr"
            ),
        )
        .filter(F.col("k") == 3)
        .select(
            F.concat_ws(
                ">", F.transform("arr", lambda s: s["event_type"])
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    tot = counts.agg(F.sum("n_users").alias("n_total"))
    rk = W.orderBy(F.desc("n_users"), F.asc("path"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n_users",
            ratio_micros("n_users", "n_total").alias("share_micros"),
            F.row_number().over(rk).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_PATHS_K)
    )


QUERIES["events_top_paths"] = events_top_paths

ORACLES["events_top_paths"] = f"""
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ), p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY user_id HAVING count(*) = 3
    ), c AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_users) AS BIGINT) AS n_total FROM c
    )
    SELECT path, n_users, share_micros, rank FROM (
        SELECT c.path, c.n_users,
               {sql_ratio_micros('c.n_users', 'tot.n_total')} AS share_micros,
               CAST(row_number() OVER (
                   ORDER BY c.n_users DESC, c.path ASC
               ) AS INTEGER) AS rank
        FROM c, tot
    ) WHERE rank <= {TOP_PATHS_K}
"""


# ----------------------------------------------- funnel dwell times
# Round 10: events_funnel answers WHO converts; this answers HOW FAST
# — the dwell-time distribution of each funnel transition (view→click,
# click→purchase) among converters: n, exact lower-median, p90 (the
# ceil(0.9·n)-th order statistic), and the half-up mean, all in
# integer microseconds. The latency KPI growth teams read next to the
# conversion rate, and the input to any "where does the funnel stall"
# decision.
#
# Exactness: dwells are BIGINT epoch-microsecond differences of the
# funnel relation's stage minima; median/p90 are exact order
# statistics (the discrete sorted-list idiom); the mean is
# ratio_units. Zero doubles.
#
# Scale: rides the funnel relation (per-user rows); the per-transition
# collect_list is bounded by converter count — past per-group-collect
# scale the order statistics come from a value histogram
# (value_histogram's rail, the events_rfm note).

def events_funnel_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units

    f = events_funnel(spark, sf_dir)
    dw = f.select(
        F.lit("view_to_click").alias("transition"),
        (F.col("click_us") - F.col("view_us")).alias("dwell_us"),
    ).filter(F.col("dwell_us").isNotNull()).unionByName(
        f.select(
            F.lit("click_to_purchase").alias("transition"),
            (F.col("purchase_us") - F.col("click_us")).alias("dwell_us"),
        ).filter(F.col("dwell_us").isNotNull())
    )
    g = dw.groupBy("transition").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.sum("dwell_us").alias("_sum"),
        F.sort_array(F.collect_list("dwell_us")).alias("_arr"),
    )
    return g.select(
        "transition",
        "n_converted",
        F.element_at(
            F.col("_arr"), ((F.col("n_converted") + 1) / 2).cast("int")
        ).alias("median_us"),
        # pure-integer ceil(9n/10) = (9n + 9) div 10 on the positive
        # domain — no doubles anywhere in the order-statistic indices
        F.element_at(
            F.col("_arr"),
            F.expr("(9 * n_converted + 9) div 10").cast("int"),
        ).alias("p90_us"),
        ratio_units("_sum", "n_converted", 1).alias("mean_us"),
    )


QUERIES["events_funnel_dwell"] = events_funnel_dwell

ORACLES["events_funnel_dwell"] = f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
    ), v AS (
        SELECT user_id, min(tus) AS view_us
        FROM e WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.tus) AS click_us
        FROM e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.tus > v.view_us AND e.tus <= v.view_us + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.tus) AS purchase_us
        FROM e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.tus > c.click_us AND e.tus <= c.click_us + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    ), dw AS (
        SELECT 'view_to_click' AS transition,
               c.click_us - v.view_us AS dwell_us
        FROM v JOIN c ON v.user_id = c.user_id
        UNION ALL
        SELECT 'click_to_purchase' AS transition,
               p.purchase_us - c.click_us AS dwell_us
        FROM c JOIN p ON c.user_id = p.user_id
    )
    SELECT transition,
           CAST(count(*) AS BIGINT) AS n_converted,
           list_sort(list(dwell_us))[CAST((count(*) + 1) // 2 AS INTEGER)]
               AS median_us,
           list_sort(list(dwell_us))[CAST((9 * count(*) + 9) // 10
                                          AS INTEGER)] AS p90_us,
           {sql_ratio_units('sum(dwell_us)', 'count(*)', 1)} AS mean_us
    FROM dw GROUP BY transition
"""


# -------------------------------------------------- growth accounting
# Round 10: the weekly growth-accounting decomposition (the
# new/retained/resurrected/churned ledger every growth team maintains,
# one step past events_new_vs_returning's new/returning split):
# active(w) = new(w) + retained(w) + resurrected(w), churned(w) =
# users active in w−1 but not w, and the quick ratio
# (new+resurrected)/churned — micro-snapped exact rational. Weeks are
# the pure-integer epoch_days div 7 bucket (identical truncating
# semantics both engines on the positive domain; no ISO-week
# divergence risk).
#
# Scale: one distinct to (user, week), one lag/lead window per user
# over their WEEK rows (≤ |weeks| per user), one |weeks|-row rollup.
# Never a running COUNT(DISTINCT).

def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_micros

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "datediff(to_date(ts), DATE '1970-01-01') div 7"
        ).cast("long").alias("w"),
    )
    uw = ev.distinct()
    lw = W.partitionBy("user_id").orderBy("w")
    flags = uw.select(
        "user_id",
        "w",
        F.lag("w").over(lw).alias("prev_w"),
        F.lead("w").over(lw).alias("next_w"),
    )
    maxw = uw.agg(F.max("w").alias("max_w"))
    flows = (
        flags.select(
            F.col("w").alias("week"),
            F.when(F.col("prev_w").isNull(), 1).otherwise(0).alias("is_new"),
            F.when(F.col("prev_w") == F.col("w") - 1, 1)
            .otherwise(0)
            .alias("is_retained"),
            F.when(
                F.col("prev_w").isNotNull() & (F.col("prev_w") < F.col("w") - 1),
                1,
            )
            .otherwise(0)
            .alias("is_resurrected"),
        )
        .groupBy("week")
        .agg(
            F.sum("is_new").alias("new_users"),
            F.sum("is_retained").alias("retained_users"),
            F.sum("is_resurrected").alias("resurrected_users"),
        )
    )
    churn = (
        flags.crossJoin(F.broadcast(maxw))
        .filter(
            (F.col("next_w").isNull() | (F.col("next_w") > F.col("w") + 1))
            & (F.col("w") + 1 <= F.col("max_w"))
        )
        .groupBy((F.col("w") + 1).alias("week"))
        .agg(F.count(F.lit(1)).alias("churned_users"))
    )
    return (
        flows.join(churn, "week", "left")
        .select(
            "week",
            "new_users",
            "retained_users",
            "resurrected_users",
            F.coalesce("churned_users", F.lit(0)).alias("churned_users"),
            F.when(
                F.coalesce("churned_users", F.lit(0)) == 0,
                F.lit(None).cast("long"),
            )
            .otherwise(
                ratio_micros(
                    "new_users + resurrected_users",
                    "coalesce(churned_users, 0)",
                )
            )
            .alias("quick_ratio_micros"),
        )
    )


QUERIES["events_growth_accounting"] = events_growth_accounting

ORACLES["events_growth_accounting"] = f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                   AS w
        FROM events
    ), flags AS (
        SELECT user_id, w,
               lag(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
               lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
        FROM uw
    ), maxw AS (SELECT max(w) AS max_w FROM uw),
    flows AS (
        SELECT w AS week,
               CAST(sum(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_users,
               CAST(sum(CASE WHEN prev_w = w - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS retained_users,
               CAST(sum(CASE WHEN prev_w IS NOT NULL AND prev_w < w - 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users
        FROM flags GROUP BY w
    ), churn AS (
        SELECT w + 1 AS week, CAST(count(*) AS BIGINT) AS churned_users
        FROM flags, maxw
        WHERE (next_w IS NULL OR next_w > w + 1) AND w + 1 <= max_w
        GROUP BY w + 1
    )
    SELECT f.week,
           f.new_users,
           f.retained_users,
           f.resurrected_users,
           CAST(coalesce(c.churned_users, 0) AS BIGINT) AS churned_users,
           CASE WHEN coalesce(c.churned_users, 0) = 0 THEN NULL
                ELSE {sql_ratio_micros('f.new_users + f.resurrected_users',
                                       'c.churned_users')}
           END AS quick_ratio_micros
    FROM flows f LEFT JOIN churn c ON f.week = c.week
"""


# --------------------------------------------- Difference-in-differences
# The quasi-experimental companion of events_cuped: when assignment
# isn't randomized, the causal effect is estimated as (treated post −
# treated pre) − (control post − control pre) — parallel-trends
# differencing that cancels both the group gap and the common time
# shock (Card & Krueger 1994). Same deterministic rails as CUPED: arm
# = token_hash(user_id) % 2, period split at the hour-snapped midpoint
# of the observed window.
#
# Exactness: per-cell sums are BIGINT micro-units; the four cell means
# are half-up rationals; DiD is a difference of those exact integers.
# One corpus scan, a 4-row aggregate, zero doubles.
#
# Scale: single groupBy(arm, period) over the fact table (map-side
# combinable) + a broadcast 1-row window-bounds relation.

def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import token_hash
    from ..functions.rounding import ratio_units

    ev = load_table(spark, sf_dir, "events")
    HOUR_US = 3_600_000_000
    b = ev.agg(
        F.min(epoch_micros("ts")).alias("lo"),
        F.max(epoch_micros("ts")).alias("hi"),
    )
    cells = (
        ev.crossJoin(F.broadcast(b))
        .select(
            (token_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
            (
                epoch_micros("ts")
                >= F.expr(f"((lo + hi) div 2 div {HOUR_US}) * {HOUR_US}")
            )
            .cast("int")
            .alias("post"),
            iunits(F.col("value"), 6).alias("v"),
        )
        .groupBy("arm", "post")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(
            "arm", "post", "n", ratio_units("s", "n", 1).alias("mean_micros")
        )
    )
    wide = cells.agg(
        F.sum(F.when((F.col("arm") == 0) & (F.col("post") == 0), F.col("n"))).alias("n_c_pre"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("post") == 1), F.col("n"))).alias("n_c_post"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("post") == 0), F.col("n"))).alias("n_t_pre"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("post") == 1), F.col("n"))).alias("n_t_post"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("post") == 0), F.col("mean_micros"))).alias("m_c_pre"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("post") == 1), F.col("mean_micros"))).alias("m_c_post"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("post") == 0), F.col("mean_micros"))).alias("m_t_pre"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("post") == 1), F.col("mean_micros"))).alias("m_t_post"),
    )
    return wide.select(
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        "m_c_pre",
        "m_c_post",
        "m_t_pre",
        "m_t_post",
        (
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre"))
        ).alias("did_micros"),
    )


QUERIES["events_diff_in_diff"] = events_diff_in_diff

from ..functions.rounding import sql_ratio_units as _sql_ru_did  # noqa: E402

ORACLES["events_diff_in_diff"] = f"""
    WITH b AS (
        SELECT ((epoch_us(min(ts)) + epoch_us(max(ts))) // 2 // 3600000000)
                   * 3600000000 AS mid_us
        FROM events
    ), cells AS (
        SELECT {_sql_th_cuped("CAST(user_id AS VARCHAR)")} % 2 AS arm,
               CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END AS post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_sql_iu_cuped('value', 6)}) AS BIGINT) AS s
        FROM events CROSS JOIN b
        GROUP BY 1, 2
    ), means AS (
        SELECT arm, post, n, {_sql_ru_did('s', 'n', 1)} AS mean_micros
        FROM cells
    )
    SELECT
        max(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n_c_pre,
        max(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n_c_post,
        max(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n_t_pre,
        max(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n_t_post,
        max(CASE WHEN arm = 0 AND post = 0 THEN mean_micros END) AS m_c_pre,
        max(CASE WHEN arm = 0 AND post = 1 THEN mean_micros END) AS m_c_post,
        max(CASE WHEN arm = 1 AND post = 0 THEN mean_micros END) AS m_t_pre,
        max(CASE WHEN arm = 1 AND post = 1 THEN mean_micros END) AS m_t_post,
        CAST((max(CASE WHEN arm = 1 AND post = 1 THEN mean_micros END)
              - max(CASE WHEN arm = 1 AND post = 0 THEN mean_micros END))
             - (max(CASE WHEN arm = 0 AND post = 1 THEN mean_micros END)
                - max(CASE WHEN arm = 0 AND post = 0 THEN mean_micros END))
             AS BIGINT) AS did_micros
    FROM means
"""


# --------------------------------------------------- SPC p-chart
# Round 11: statistical process control over the daily purchase RATE —
# the ops-monitoring primitive between dq_freshness (volume) and
# timeseries_mad_anomaly (level): is each day's conversion p_i = x_i/n_i
# inside the binomial 3σ band around the process rate p̄ = ΣX/ΣN?
# The out-of-control decision is EXACT (no double ever decides):
#   |p_i − p̄| > 3·√(p̄(1−p̄)/n_i)
# cross-multiplies to (x_i·N − X·n_i)² > 9·X·(N−X)·n_i — pure
# integers on the DECIMAL(38,0)/HUGEINT rail (the squares widen
# first). The displayed rate/center/limits are micros rationals and
# prounded doubles; only the flag is load-bearing.
#
# Scale: one scan → |days| rows; the 1-row process total broadcasts.


def events_spc_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround, ratio_micros

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
            (F.col("event_type") == "purchase").cast("long").alias("is_p"),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_p").alias("x"))
    )
    tot = daily.agg(F.sum("n").alias("nn"), F.sum("x").alias("xx"))
    dec = "decimal(38,0)"
    j = daily.crossJoin(F.broadcast(tot))
    dev = (F.col("x").cast(dec) * F.col("nn") - F.col("xx").cast(dec) * F.col("n"))
    lhs = dev * dev
    rhs = (
        F.lit(9).cast(dec)
        * F.col("xx")
        * (F.col("nn") - F.col("xx")).cast(dec)
        * F.col("n")
    )
    return j.select(
        "day",
        "n",
        "x",
        ratio_micros("x", "n").alias("rate_micros"),
        ratio_micros("xx", "nn").alias("center_micros"),
        (lhs > rhs).cast("int").alias("out_of_control"),
        F.when(lhs <= rhs, F.lit(0))
        .otherwise(F.when(dev > 0, F.lit(1)).otherwise(F.lit(-1)))
        .cast("int")
        .alias("side"),
        pround(
            F.sqrt(
                (F.col("xx").cast("double") / F.col("nn").cast("double"))
                * (1 - F.col("xx").cast("double") / F.col("nn").cast("double"))
                / F.col("n").cast("double")
            ) * F.lit(3.0),
            6,
        ).alias("band_3sigma"),
    )


QUERIES["events_spc_chart"] = events_spc_chart

ORACLES["events_spc_chart"] = f"""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(x) AS BIGINT) AS xx
        FROM daily
    )
    SELECT day, n, x,
           {sql_ratio_micros('x', 'n')} AS rate_micros,
           {sql_ratio_micros('xx', 'nn')} AS center_micros,
           CAST((CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n)
                * (CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n)
                > 9 * CAST(xx AS HUGEINT) * (nn - xx) * n
                AS INTEGER) AS out_of_control,
           CAST(CASE WHEN (CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n)
                          * (CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n)
                          <= 9 * CAST(xx AS HUGEINT) * (nn - xx) * n THEN 0
                     WHEN CAST(x AS HUGEINT) * nn - CAST(xx AS HUGEINT) * n > 0
                     THEN 1 ELSE -1 END AS INTEGER) AS side,
           {sql_pround(
               '3.0 * sqrt((CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))'
               ' * (1 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))'
               ' / CAST(n AS DOUBLE))', 6)} AS band_3sigma
    FROM daily CROSS JOIN tot
"""


# ------------------------------------------------- Hill tail index
# Round 12: the heavy-tail exponent of per-user activity — power users
# dominate event volume, and the Hill (1975) estimator
# α̂ = k / Σ_{i≤k} (ln x₍ᵢ₎ − ln x₍ₖ₊₁₎) over the top-k order
# statistics says HOW heavy the tail is: α ≈ 1 is Zipf-like
# concentration (shuffle-skew danger — the number that motivates the
# salting rails), larger α a tamer tail. Exactness: x are exact
# per-user counts; only the top k+1 order statistics are touched
# (TakeOrdered + a post-limit row_number — the k-bounded whitelist
# class); each ln takes an exact-integer argument, nano-snapped, so
# the Hill sum is an exact integer and α̂ one half-up micros rational.
# NULL when the fixture has < k+1 users or the top-k ties flat
# (Hill sum 0 — infinite-α degenerate case, reported as NULL not ∞).

HILL_K = 50


def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    per = per.localCheckpoint(eager=False)  # top-k AND the user count
    top = per.orderBy(F.desc("n"), F.asc("user_id")).limit(HILL_K + 1)
    stamped = top.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("n"), F.asc("user_id")))
    )
    agg = stamped.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.sum(
            F.when(F.col("r") <= HILL_K, iunits(F.log("n"), 9))
        ).alias("slog"),
        F.max(F.when(F.col("r") == HILL_K + 1, F.col("n"))).alias("xk1"),
        F.max(
            F.when(F.col("r") == HILL_K + 1, iunits(F.log("n"), 9))
        ).alias("lxk1"),
    ).crossJoin(F.broadcast(per.agg(F.count(F.lit(1)).alias("n_users"))))
    hill = F.col("slog") - F.lit(HILL_K) * F.col("lxk1")
    return agg.select(
        F.lit(HILL_K).cast("int").alias("k"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("xk1").cast("long").alias("xk1"),
        F.when(
            (F.col("n_top") < HILL_K + 1) | (hill <= 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units(f"{HILL_K} * CAST(1000000000 AS BIGINT)",
                        "slog - " + f"{HILL_K} * lxk1")
        )
        .alias("alpha_micros"),
    )


QUERIES["events_hill_tail_index"] = events_hill_tail_index

from ..functions.rounding import sql_ratio_units as _sql_ru_hill  # noqa: E402

ORACLES["events_hill_tail_index"] = f"""
    WITH per AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), top AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, user_id ASC) AS r
        FROM (
            SELECT user_id, n FROM per
            ORDER BY n DESC, user_id ASC LIMIT {HILL_K + 1}
        )
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_top,
               CAST(sum(CASE WHEN r <= {HILL_K}
                        THEN {sql_iunits('ln(n)', 9)} END) AS BIGINT) AS slog,
               max(CASE WHEN r = {HILL_K + 1} THEN n END) AS xk1,
               CAST(max(CASE WHEN r = {HILL_K + 1}
                        THEN {sql_iunits('ln(n)', 9)} END) AS BIGINT) AS lxk1
        FROM top
    )
    SELECT CAST({HILL_K} AS INTEGER) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM per) AS n_users,
           CAST(xk1 AS BIGINT) AS xk1,
           CASE WHEN n_top < {HILL_K + 1}
                  OR slog - {HILL_K} * lxk1 <= 0 THEN NULL
                ELSE {_sql_ru_hill(f'{HILL_K} * CAST(1000000000 AS BIGINT)',
                                   f'slog - {HILL_K} * lxk1')}
           END AS alpha_micros
    FROM agg
"""


# ------------------------------------------- retention decay fit
# Round 12: the one-number summary ON TOP of the events_retention
# table — product analytics fits an exponential decay r_k ≈ r₀·e^(−λk)
# to the pooled retention curve and plans around its HALF-LIFE (how
# many days until half the retained mass is gone). Pooled curve with
# right-censoring handled by construction: only cohorts observed for
# the full RET_DECAY_K days enter (cohort_date ≤ max_date − K), so
# every offset k ∈ 1..K has the same denominator population. Fit:
# OLS of y_k = ln r_k on k — with r_k = num_k/den (exact integer
# counts), y_k = snap9(ln num_k) − snap9(ln den) (two-stage snap, the
# ar1/Heaps discipline; both logs take exact integers), slope
# λ̂ = −(m·Σky − Σk·Σy)/(m·Σk² − (Σk)²) in nano-units/day on exact
# integer sums over ≤ K points, and half-life ln2/λ̂ one DECIMAL
# micros rational. Offsets with zero retained users cannot enter the
# log — they are dropped and REPORTED via n_terms (m < 2 or a
# non-positive slope → NULL half-life, not ∞). Scale: rides the same
# two user-grain aggregations as events_retention; the fit itself is
# K-bounded arithmetic.

RET_DECAY_K = 14


def events_retention_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units_dec_signed

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    days = ev.distinct().localCheckpoint(eager=False)
    maxd = days.agg(F.max("d").alias("maxd"))
    cohort = days.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    eligible = (
        cohort.crossJoin(F.broadcast(maxd))
        .filter(
            F.datediff(F.col("maxd"), F.col("cohort_date")) >= RET_DECAY_K
        )
        .select("user_id", "cohort_date")
        .localCheckpoint(eager=False)
    )
    den = eligible.agg(F.count(F.lit(1)).alias("den"))
    # retained users at offset k: days is (user, day)-distinct, so a
    # row count at k IS the distinct-user count active on cohort day k
    ret = (
        days.join(eligible, "user_id")
        .select(F.datediff("d", "cohort_date").alias("k"))
        .filter((F.col("k") >= 1) & (F.col("k") <= RET_DECAY_K))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("num"))
    )
    y = ret.crossJoin(F.broadcast(den)).select(
        "k",
        "num",
        "den",
        (
            iunits(F.log(F.col("num").cast("double")), 9)
            - iunits(F.log(F.col("den").cast("double")), 9)
        ).alias("y"),
    )
    s = y.filter(F.col("num") > 0).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).alias("skk"),
        F.sum("y").alias("sy"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("y")).alias("sky"),
        F.max("den").alias("n_eligible"),
    )
    lam_num = "(CAST(m AS DECIMAL(38,0)) * sky - CAST(sk AS DECIMAL(38,0)) * sy)"
    lam_den = "(CAST(m AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk)"
    base = s.select(
        F.lit(RET_DECAY_K).cast("int").alias("k_max"),
        F.col("m").cast("long").alias("n_terms"),
        F.col("n_eligible").cast("long").alias("n_eligible"),
        F.when(F.col("m") < 2, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec_signed(f"-{lam_num}", lam_den, mult=1, off=10**10)
        )
        .alias("lambda_nanos_per_day"),
    )
    return base.select(
        "k_max",
        "n_terms",
        "n_eligible",
        "lambda_nanos_per_day",
        F.when(
            F.col("lambda_nanos_per_day").isNull()
            | (F.col("lambda_nanos_per_day") <= 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.expr(
                "(2 * 1000000 * CAST(693147181 AS DECIMAL(38,0))"
                " + lambda_nanos_per_day)"
                " div (2 * CAST(lambda_nanos_per_day AS DECIMAL(38,0)))"
            ).cast("long")
        )
        .alias("halflife_days_micros"),
    )


QUERIES["events_retention_decay"] = events_retention_decay

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_rd,
)

ORACLES["events_retention_decay"] = f"""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), maxd AS (
        SELECT max(d) AS maxd FROM days
    ), cohort AS (
        SELECT user_id, min(d) AS cohort_date FROM days GROUP BY 1
    ), eligible AS (
        SELECT user_id, cohort_date
        FROM cohort CROSS JOIN maxd
        WHERE date_diff('day', cohort_date, maxd) >= {RET_DECAY_K}
    ), den AS (
        SELECT CAST(count(*) AS BIGINT) AS den FROM eligible
    ), ret AS (
        SELECT date_diff('day', cohort_date, d) AS k,
               CAST(count(*) AS BIGINT) AS num
        FROM days JOIN eligible USING (user_id)
        WHERE date_diff('day', cohort_date, d) BETWEEN 1 AND {RET_DECAY_K}
        GROUP BY 1
    ), y AS (
        SELECT k, num, den,
               {_sql_iu_rd('ln(CAST(num AS DOUBLE))', 9)}
               - {_sql_iu_rd('ln(CAST(den AS DOUBLE))', 9)} AS y
        FROM ret CROSS JOIN den
        WHERE num > 0
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(k) AS BIGINT) AS sk,
               CAST(sum(CAST(k AS HUGEINT) * k) AS HUGEINT) AS skk,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(k AS HUGEINT) * y) AS HUGEINT) AS sky,
               CAST(max(den) AS BIGINT) AS n_eligible
        FROM y
    ), base AS (
        SELECT CAST({RET_DECAY_K} AS INTEGER) AS k_max,
               m AS n_terms, n_eligible,
               CASE WHEN m < 2 THEN NULL ELSE
                   CAST((2 * 1 * (-(CAST(m AS HUGEINT) * sky
                                    - CAST(sk AS HUGEINT) * sy)
                         + CAST(10000000000 AS HUGEINT)
                           * (CAST(m AS HUGEINT) * skk
                              - CAST(sk AS HUGEINT) * sk))
                        + (CAST(m AS HUGEINT) * skk
                           - CAST(sk AS HUGEINT) * sk))
                       // (2 * (CAST(m AS HUGEINT) * skk
                                - CAST(sk AS HUGEINT) * sk))
                       - 10000000000 AS BIGINT)
               END AS lambda_nanos_per_day
        FROM s
    )
    SELECT k_max, n_terms, n_eligible, lambda_nanos_per_day,
           CASE WHEN lambda_nanos_per_day IS NULL
                  OR lambda_nanos_per_day <= 0 THEN NULL
                ELSE CAST((2 * 1000000 * CAST(693147181 AS HUGEINT)
                           + lambda_nanos_per_day)
                          // (2 * CAST(lambda_nanos_per_day AS HUGEINT))
                          AS BIGINT)
           END AS halflife_days_micros
    FROM base
"""


# --------------------------------------------- Poisson dispersion index
# Round 12: the overdispersion check that decides WHICH control chart
# is valid — the SPC p-chart and CUSUM gates assume near-Poisson
# daily counts; real event streams are usually overdispersed (bursty
# users, campaigns), and applying Poisson limits to an overdispersed
# series fires false alarms daily. Fisher's index of dispersion on
# daily counts: I = s²/x̄, with the χ² form (d−1)·I = (d·Σx² − T²)/T
# on exact integer moment sums. The 3σ overdispersion flag uses the
# normal approximation of χ²(d−1) in exact cross-multiplied integers:
# flag ⟺ NUM − (d−1)·T > 0 ∧ (NUM − (d−1)·T)² > 18·(d−1)·T², where
# NUM = d·Σx² − T² (both sides DECIMAL/HUGEINT — no doubles anywhere).
# Calendar-grain after one events scan.


def events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    ser = (
        ev.select(
            (epoch_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    dec = "decimal(38,0)"
    m = ser.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("x").alias("t"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
    )
    num = f"(CAST(d AS {dec}) * sxx - CAST(t AS {dec}) * t)"
    excess = f"({num} - (CAST(d AS {dec}) - 1) * t)"
    return m.select(
        F.col("d").cast("long").alias("n_days"),
        F.col("t").cast("long").alias("total"),
        F.when(
            (F.col("d") < 2) | (F.col("t") == 0), F.lit(None).cast("long")
        )
        .otherwise(
            ratio_units_dec(num, f"(CAST(d AS {dec}) - 1) * t")
        )
        .alias("dispersion_micros"),
        F.when(
            (F.col("d") < 2) | (F.col("t") == 0), F.lit(None).cast("long")
        )
        .otherwise(ratio_units_dec(num, "t"))
        .alias("chi2_micros"),
        F.when(
            (F.col("d") < 2) | (F.col("t") == 0), F.lit(None).cast("int")
        )
        .otherwise(
            (
                (F.expr(excess) > 0)
                & (
                    F.expr(f"{excess} * {excess}")
                    > F.lit(18).cast(dec)
                    * (F.col("d").cast(dec) - 1)
                    * F.col("t").cast(dec)
                    * F.col("t")
                )
            ).cast("int")
        )
        .alias("overdispersed_3sigma"),
    )


QUERIES["events_poisson_dispersion"] = events_poisson_dispersion

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_pd,
)

_PD_NUM = "(CAST(d AS HUGEINT) * sxx - CAST(t AS HUGEINT) * t)"
_PD_EXC = f"({_PD_NUM} - (CAST(d AS HUGEINT) - 1) * t)"

ORACLES["events_poisson_dispersion"] = f"""
    WITH ser AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS d,
               CAST(sum(x) AS BIGINT) AS t,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM ser
    )
    SELECT d AS n_days, t AS total,
           CASE WHEN d < 2 OR t = 0 THEN NULL
                ELSE {_sql_rud_pd(_PD_NUM,
                                  '(CAST(d AS HUGEINT) - 1) * t')}
           END AS dispersion_micros,
           CASE WHEN d < 2 OR t = 0 THEN NULL
                ELSE {_sql_rud_pd(_PD_NUM, 't')}
           END AS chi2_micros,
           CASE WHEN d < 2 OR t = 0 THEN NULL
                ELSE CAST(({_PD_EXC} > 0
                      AND {_PD_EXC} * {_PD_EXC}
                          > 18 * (CAST(d AS HUGEINT) - 1) * t * t)
                     AS INTEGER)
           END AS overdispersed_3sigma
    FROM m
"""


# --------------------------------------------- transition entropy rate
# Round 12: the one-number predictability readout over the clickstream
# transition matrix (events_transitions = the counts; this = how
# DETERMINISTIC the chain is): empirical conditional entropy
# H(next | current) = −Σ_ij (n_ij/N)·ln(n_ij/n_i·), the entropy-rate
# estimate of the behavior Markov chain. H ≈ 0 means scripted/bot
# traffic (every state determines the next); H near ln(k) means
# uniform wandering — both ends are ingest-QA signals. Exact:
# transition counts are integers off the per-user lead pass; each
# term is n_ij·(snap9(ln n_i·) − snap9(ln n_ij)) — logs of exact
# positive integers, nano-snapped, summed exactly; the average is
# one integer rational (nanos), and the normalized share divides by
# snap9(ln k) (k = observed state count, > 1 guarded). Scale: the
# transition relation is k²-bounded after one data-grain window pass
# events_transitions already pays.


def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units, ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    row_tot = tr.groupBy("event_type").agg(F.sum("n").alias("ni"))
    terms = tr.join(row_tot, "event_type").select(
        "n",
        (
            F.col("n")
            * (
                iunits(F.log(F.col("ni").cast("double")), 9)
                - iunits(F.log(F.col("n").cast("double")), 9)
            )
        ).alias("t_nanos"),
    )
    k = tr.select("event_type").distinct().count()
    agg = terms.agg(
        F.sum("n").alias("n_transitions"),
        F.sum("t_nanos").alias("h_sum"),
    )
    lnk = None
    if k > 1:
        import math as _m

        lnk = _m.floor(_m.log(k) * 1e9 + 0.5)
    return agg.select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.lit(k).cast("int").alias("n_states"),
        ratio_units("h_sum", "n_transitions", 1).alias("h_cond_nanos"),
        (
            ratio_units_dec(
                "CAST(h_sum AS DECIMAL(38,0))",
                f"CAST(n_transitions AS DECIMAL(38,0)) * {lnk}",
            )
            if lnk
            else F.lit(None).cast("long")
        ).alias("normalized_micros"),
    )


QUERIES["events_transition_entropy"] = events_transition_entropy

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_te,
    sql_ratio_units as _sql_ru_te,
    sql_ratio_units_dec as _sql_rud_te,
)


def _te_sql() -> str:
    # n_states and ln(k) enter as exact integers computed inside the
    # query on both sides; the Spark side pins k via a bounded count()
    # (k is a plan literal for the ln table), the oracle re-derives it
    return f"""
    WITH tr AS (
        SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ) WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), row_tot AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS ni FROM tr GROUP BY 1
    ), terms AS (
        SELECT tr.n,
               tr.n * ({_sql_iu_te('ln(ni)', 9)}
                       - {_sql_iu_te('ln(tr.n)', 9)}) AS t_nanos
        FROM tr JOIN row_tot USING (event_type)
    ), k AS (
        SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM tr
    ), agg AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_transitions,
               CAST(sum(t_nanos) AS BIGINT) AS h_sum
        FROM terms
    )
    SELECT n_transitions,
           CAST(k AS INTEGER) AS n_states,
           {_sql_ru_te('h_sum', 'n_transitions', 1)} AS h_cond_nanos,
           CASE WHEN k <= 1 THEN NULL
                ELSE {_sql_rud_te('CAST(h_sum AS HUGEINT)',
                                  'CAST(n_transitions AS HUGEINT)'
                                  f" * {_sql_iu_te('ln(k)', 9)}")}
           END AS normalized_micros
    FROM agg CROSS JOIN k
"""


ORACLES["events_transition_entropy"] = _te_sql()


# --------------------------------------------- circadian profile
# Round 12: CIRCULAR statistics over the hour-of-day axis — the
# linear battery (mean/variance/quantiles) is wrong for a cyclic
# variable (23:00 and 01:00 are 2 h apart, not 22), and an ingest
# monitor that alarms on "mean event hour" gets burned at midnight.
# The circular resultant R̄ = |Σ e^{iθ_h}|/N (Mardia) is the correct
# concentration number: ≈0 for uniform around the clock, →1 for a
# single rush hour. Exact rail: the 24 phase angles 2πh/24 enter as
# micro-snapped integer cos/sin literal tables (the periodogram
# discipline — no runtime trig); C = Σ n_h·c_h and S = Σ n_h·s_h are
# exact BIGINTs; R̄² = (C²+S²)/(N·10⁶)² is one DECIMAL micros
# rational (squared form — sqrt-free). Peak hour is the exact argmax
# with hour-asc tie-break. Calendar-grain: 24 cells after one scan.

import math as _math_cc

CC_COS = [
    _math_cc.floor(_math_cc.cos(2 * _math_cc.pi * h / 24) * 1e6 + 0.5)
    for h in range(24)
]
CC_SIN = [
    _math_cc.floor(_math_cc.sin(2 * _math_cc.pi * h / 24) * 1e6 + 0.5)
    for h in range(24)
]


def events_circadian_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units, ratio_units_dec
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.select(
            ((epoch_micros(F.col("ts")) / F.lit(3_600_000_000)) % 24)
            .cast("int")
            .alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    carr = f"array({', '.join(f'CAST({c} AS BIGINT)' for c in CC_COS)})"
    sarr = f"array({', '.join(f'CAST({s} AS BIGINT)' for s in CC_SIN)})"
    m = hours.agg(
        F.sum("n").alias("n_events"),
        F.sum(F.col("n") * F.expr(f"element_at({carr}, h + 1)")).alias("c"),
        F.sum(F.col("n") * F.expr(f"element_at({sarr}, h + 1)")).alias("s"),
        F.max(F.struct(F.col("n"), (-F.col("h")).alias("nh"))).alias("pk"),
    )
    dec = "decimal(38,0)"
    return m.select(
        F.col("n_events").cast("long").alias("n_events"),
        (-F.col("pk.nh")).cast("int").alias("peak_hour"),
        F.col("pk.n").cast("long").alias("peak_count"),
        ratio_units("pk.n", "n_events").alias("peak_share_micros"),
        F.when(F.col("n_events") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                f"CAST(c AS {dec}) * c + CAST(s AS {dec}) * s",
                f"CAST(n_events AS {dec}) * n_events * 1000000000000",
            )
        )
        .alias("resultant2_micros"),
    )


QUERIES["events_circadian_profile"] = events_circadian_profile

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units as _sql_ru_cc,
    sql_ratio_units_dec as _sql_rud_cc,
)


def _cc_sql() -> str:
    clist = "[" + ", ".join(str(c) for c in CC_COS) + "]"
    slist = "[" + ", ".join(str(s) for s in CC_SIN) + "]"
    return f"""
    WITH hours AS (
        SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS INTEGER) AS h,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), m AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_events,
               CAST(sum(n * ({clist}::BIGINT[])[h + 1]) AS BIGINT) AS c,
               CAST(sum(n * ({slist}::BIGINT[])[h + 1]) AS BIGINT) AS s,
               max(struct_pack(n := n, nh := -h)) AS pk
        FROM hours
    )
    SELECT n_events,
           CAST(-pk.nh AS INTEGER) AS peak_hour,
           CAST(pk.n AS BIGINT) AS peak_count,
           {_sql_ru_cc('pk.n', 'n_events')} AS peak_share_micros,
           CASE WHEN n_events = 0 THEN NULL
                ELSE {_sql_rud_cc(
                    'CAST(c AS HUGEINT) * c + CAST(s AS HUGEINT) * s',
                    'CAST(n_events AS HUGEINT) * n_events'
                    ' * 1000000000000')}
           END AS resultant2_micros
    FROM m
"""


ORACLES["events_circadian_profile"] = _cc_sql()


# ------------------------------------- Nelson–Aalen cumulative hazard
# Round 13: the OTHER classical survival estimator next to
# events_survival_km — Nelson (1972) / Aalen (1978) estimate the
# cumulative hazard H(t) = Σ_{s ≤ t} d_s / n_s directly instead of
# the product-limit survival, and its variance Σ d_s(n_s − d_s)/n_s³;
# H is what hazard-regression (Cox) pipelines consume, and unlike
# KM's ln-product it is a SUM OF EXACT RATIONALS — each step's hazard
# snaps once to integer micros (house half-up rational, no ln, no
# doubles anywhere) and the cumulative is a pure BIGINT window sum,
# strictly tighter determinism than the KM ln-snap next door. Same
# session-duration subject and censoring contract as KM (10-minute
# gap sessions; a session ending within one gap of stream end is
# censored), so the two estimators are directly comparable rows.
# Scale: identical to KM — session agg, duration agg, two windows on
# the bounded |durations| relation.


def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.rounding import ratio_units, ratio_units_dec

    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max(epoch_micros(F.col("ts"))).alias("gmax_us"))
    sw = F.session_window("ts", f"{KM_GAP_MIN} minutes")
    sess = ev.groupBy(sw, "user_id").agg(
        F.max(epoch_micros(F.col("ts"))).alias("last_us"),
        F.min(epoch_micros(F.col("ts"))).alias("first_us"),
    )
    marked = sess.crossJoin(F.broadcast(g)).select(
        F.expr("(last_us - first_us) div 60000000").alias("t"),
        (
            F.col("last_us")
            < F.col("gmax_us") - F.lit(KM_GAP_MIN * 60_000_000)
        )
        .cast("long")
        .alias("death"),
    )
    days = marked.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_exit"),
        F.sum("death").alias("n_deaths"),
    )
    w_suffix = W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, 0)
    w_cum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    risk = days.select(
        "t",
        "n_deaths",
        F.sum("n_exit").over(w_suffix).alias("n_risk"),
    )
    dec = "decimal(38,0)"
    hz = ratio_units("n_deaths", "n_risk")
    var_term = ratio_units_dec(
        f"CAST(n_deaths AS {dec}) * (n_risk - n_deaths)",
        f"CAST(n_risk AS {dec}) * n_risk * n_risk",
        1_000_000_000,
    )
    terms = risk.select(
        "t",
        "n_risk",
        "n_deaths",
        hz.alias("hazard_micros"),
        var_term.alias("_v"),
    )
    return (
        terms.select(
            "t",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("n_deaths").cast("long").alias("n_deaths"),
            F.col("hazard_micros").cast("long").alias("hazard_micros"),
            F.sum("hazard_micros").over(w_cum).cast("long").alias(
                "cum_hazard_micros"
            ),
            F.sum("_v").over(w_cum).cast("long").alias("cum_var_nanos"),
        )
        .filter(F.col("n_deaths") > 0)
    )


QUERIES["events_nelson_aalen"] = events_nelson_aalen

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units as _sql_ru_na,
    sql_ratio_units_dec as _sql_rud_na,
)

ORACLES["events_nelson_aalen"] = f"""
    WITH g AS (
        SELECT max(epoch_us(ts)) AS gmax_us FROM events
    ), ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > INTERVAL '{KM_GAP_MIN} minutes'
                    OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
               THEN 1 ELSE 0 END AS is_start
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               sum(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM ordered
    ), sess AS (
        SELECT user_id, sid,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM numbered GROUP BY 1, 2
    ), marked AS (
        SELECT (last_us - first_us) // 60000000 AS t,
               CASE WHEN last_us < gmax_us - {KM_GAP_MIN * 60_000_000}
                    THEN 1 ELSE 0 END AS death
        FROM sess, g
    ), days AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n_exit,
               CAST(sum(death) AS BIGINT) AS n_deaths
        FROM marked GROUP BY 1
    ), risk AS (
        SELECT t, n_deaths,
               CAST(sum(n_exit) OVER (
                   ORDER BY t DESC ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS n_risk
        FROM days
    ), terms AS (
        SELECT t, n_risk, n_deaths,
               {_sql_ru_na('n_deaths', 'n_risk')} AS hazard_micros,
               {_sql_rud_na(
                   'CAST(n_deaths AS HUGEINT) * (n_risk - n_deaths)',
                   'CAST(n_risk AS HUGEINT) * n_risk * n_risk',
                   1_000_000_000)} AS _v
        FROM risk
    )
    SELECT t, n_risk, n_deaths, hazard_micros,
           CAST(sum(hazard_micros) OVER (
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_hazard_micros,
           CAST(sum(_v) OVER (
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_var_nanos
    FROM terms
    QUALIFY n_deaths > 0
"""


# ------------------------------------------- peak session concurrency
# Round 13: the capacity-planning number — the maximum number of
# SIMULTANEOUSLY open sessions and when it happened (what "provision
# for peak" actually means; dau/retention read daily grain and miss
# it). Classic sweep-line on the session intervals of the 10-minute
# gap contract: +1 at session start, −1 just after session end,
# running sum, max. The running sum is NOT one global window at scale
# — the sweep is day-partitioned two-pass (the de-facto distributed
# prefix-sum): per-day cumulative over the day's deltas (bounded
# partition), plus a day-grain offset window over per-day totals
# (bounded by span); concurrency = day offset + intra-day cumulative.
# Arrivals order before departures at the same microsecond (delta
# DESC tie-break) so a back-to-back handoff counts both sessions —
# deterministic on both engines. Peak tie-break: earliest time.
# Scale: session-grain deltas, windows bounded by day and span.


def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", f"{KM_GAP_MIN} minutes")
    sess = ev.groupBy(sw, "user_id").agg(
        F.min(epoch_micros(F.col("ts"))).alias("first_us"),
        F.max(epoch_micros(F.col("ts"))).alias("last_us"),
    # r13 OPT: three consumers (the two delta selects and the session
    # count) re-ran the session_window aggregation — materialize once
    ).localCheckpoint(eager=False)
    deltas = sess.select(
        F.col("first_us").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        sess.select((F.col("last_us") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    deltas = deltas.select(
        "t", "d", F.expr("t div 86400000000").alias("day")
    )
    w_intra = (
        W.partitionBy("day")
        .orderBy("t", F.desc("d"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    intra = deltas.select(
        "day", "t", "d", F.sum("d").over(w_intra).alias("cum_intra")
    )
    day_tot = deltas.groupBy("day").agg(F.sum("d").alias("day_sum"))
    w_days = W.orderBy("day").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = day_tot.select(
        "day", F.coalesce(F.sum("day_sum").over(w_days), F.lit(0)).alias("off")
    )
    conc = intra.join(offsets, "day").select(
        "t", (F.col("off") + F.col("cum_intra")).alias("c")
    # r13 OPT: two consumers (the max and the argmin-at-peak join)
    ).localCheckpoint(eager=False)
    n_sess = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    peak = conc.agg(F.max("c").alias("peak_concurrency"))
    at = (
        conc.join(
            F.broadcast(peak),
            conc["c"] == peak["peak_concurrency"],
        )
        .agg(F.min("t").alias("peak_at_us"))
    )
    return (
        n_sess.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(at))
        .select(
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.col("peak_concurrency").cast("long").alias("peak_concurrency"),
            F.col("peak_at_us").cast("long").alias("peak_at_us"),
        )
    )


QUERIES["events_peak_concurrency"] = events_peak_concurrency

ORACLES["events_peak_concurrency"] = f"""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > INTERVAL '{KM_GAP_MIN} minutes'
                    OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
               THEN 1 ELSE 0 END AS is_start
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               sum(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM ordered
    ), sess AS (
        SELECT user_id, sid,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM numbered GROUP BY 1, 2
    ), deltas AS (
        SELECT first_us AS t, 1 AS d, first_us // 86400000000 AS day
        FROM sess
        UNION ALL
        SELECT last_us + 1 AS t, -1 AS d,
               (last_us + 1) // 86400000000 AS day
        FROM sess
    ), intra AS (
        SELECT day, t, d,
               CAST(sum(d) OVER (
                   PARTITION BY day ORDER BY t, d DESC
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_intra
        FROM deltas
    ), day_tot AS (
        SELECT day, CAST(sum(d) AS BIGINT) AS day_sum
        FROM deltas GROUP BY 1
    ), offsets AS (
        SELECT day,
               CAST(coalesce(sum(day_sum) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING
               ), 0) AS BIGINT) AS off
        FROM day_tot
    ), conc AS (
        SELECT i.t, o.off + i.cum_intra AS c
        FROM intra i JOIN offsets o ON i.day = o.day
    ), peak AS (
        SELECT CAST(max(c) AS BIGINT) AS peak_concurrency FROM conc
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
           peak.peak_concurrency,
           (SELECT CAST(min(t) AS BIGINT) FROM conc, peak
            WHERE c = peak_concurrency) AS peak_at_us
    FROM peak
"""


# --------------------------------------- session-gap sensitivity sweep
# Round 13: every sessionized metric in this registry inherits the
# 10-minute gap constant — this query measures how much that CHOICE
# matters (the parameter-sensitivity audit a pipeline runs before
# trusting session counts): the same sessionization at 5/10/30-minute
# gaps, reporting session count, single-event (bounce) sessions and
# share, and mean events per session — if the 5-vs-30 rows differ
# wildly, downstream session metrics are definition-driven, not
# behavior-driven. One session_window aggregation per rung (the gap
# is a structural parameter, not a filter — three bounded passes,
# not one pass re-used); all outputs exact integers + micros
# rationals. Scale: user×gap-keyed session aggregation, counts only.

GAP_SWEEP_MIN = [5, 10, 30]


def events_session_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units

    ev = load_table(spark, sf_dir, "events")
    out = None
    for gap in GAP_SWEEP_MIN:
        sess = ev.groupBy(
            F.session_window("ts", f"{gap} minutes"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n_events"))
        rep = sess.agg(
            F.lit(gap).cast("int").alias("gap_minutes"),
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                (F.col("n_events") == 1).cast("long")
            ).alias("n_bounce"),
            F.sum("n_events").alias("n_events_total"),
        ).select(
            "gap_minutes",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.col("n_bounce").cast("long").alias("n_bounce"),
            ratio_units("n_bounce", "n_sessions").alias(
                "bounce_share_micros"
            ),
            ratio_units("n_events_total", "n_sessions", 1_000).alias(
                "events_per_session_milli"
            ),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


QUERIES["events_session_sensitivity"] = events_session_sensitivity

from ..functions.rounding import sql_ratio_units as _sql_ru_ss  # noqa: E402


def _session_sweep_sql() -> str:
    rungs = []
    for gap in GAP_SWEEP_MIN:
        rungs.append(
            f"""
    SELECT CAST({gap} AS INTEGER) AS gap_minutes,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           {_sql_ru_ss(
               'sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)',
               'count(*)')} AS bounce_share_micros,
           {_sql_ru_ss('sum(n_events)', 'count(*)', 1_000)}
               AS events_per_session_milli
    FROM (
        SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
        FROM (
            SELECT user_id,
                   sum(is_start) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) > INTERVAL '{gap} minutes'
                            OR lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) IS NULL
                       THEN 1 ELSE 0 END AS is_start
                FROM events
            )
        )
        GROUP BY 1, 2
    )"""
        )
    return " UNION ALL ".join(rungs)


ORACLES["events_session_sensitivity"] = _session_sweep_sql()
