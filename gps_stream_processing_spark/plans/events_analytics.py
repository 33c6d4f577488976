"""Event-analytics query patterns over the ``events`` table: funnel,
cohort retention, last-touch attribution, SCD2 validity intervals.

The reference has no event analytics (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — engine surface (`ext`), the
workloads a production events engine is actually asked to run. The
attribution query is the business-query form of the reference's one
distinctive semantic: forward-filling the latest prior record across an
ordered stream (``$CurrentUTC``, class.nmea.parser.php:226).

Scale notes: every query here shuffles at most twice, always keyed by
``user_id`` (the natural high-cardinality partition key — no global
windows anywhere); timestamps and counts compare exactly across
engines, so no rounding discipline is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gps_stream_processing_spark.plans.registry import register, table


@register(
    "q_missing_buckets",
    # Spark sequence() and DuckDB generate_series are both
    # endpoint-inclusive over DATE + 1-day step; counts are
    # all-integer. Users restricted (% 20) so the expected-bucket
    # explode stays proportional at every SF.
    oracle="""
    WITH span AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
      FROM events WHERE user_id % 20 = 0 GROUP BY user_id
    ), expected AS (
      SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ), observed AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events WHERE user_id % 20 = 0
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_expected,
           CAST(SUM(CASE WHEN o.day IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_active,
           CAST(SUM(CASE WHEN o.day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing
    FROM expected e LEFT JOIN observed o
      ON e.user_id = o.user_id AND e.day = o.day
    GROUP BY e.user_id
    """,
    doc="Missing-bucket detection (SURVEY §2.7 ext): per user, the "
    "expected day series between first and last activity (sequence + "
    "explode) anti-checked against observed days — the sensor-"
    "downtime / data-gap audit every telemetry pipeline runs (a day "
    "with zero rows is invisible to every GROUP BY; you must "
    "MANUFACTURE the expected axis to see the hole). Explode cost is "
    "span-proportional, join is equi on (user, day) — linear, and at "
    "100 TB the expected side is generated, never stored.",
)
def q_missing_buckets(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events").filter(F.col("user_id") % 20 == 0)
    day = F.to_date(F.date_trunc("day", "ts"))
    span = e.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    expected = span.select(
        "user_id",
        F.explode(
            F.expr("sequence(d0, d1, interval 1 day)")
        ).alias("day"),
    )
    observed = e.select("user_id", day.alias("day")).distinct().withColumn(
        "hit", F.lit(1)
    )
    return (
        expected.join(observed, ["user_id", "day"], "left")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_expected"),
            F.sum(F.col("hit").isNotNull().cast("bigint")).alias("n_active"),
            F.sum(F.col("hit").isNull().cast("bigint")).alias("n_missing"),
        )
    )


@register(
    "q_transition_matrix",
    # Transition probability = n_ab / n_from: integer counts, one
    # rounded division. (ts, event_id) tie-break keeps each user's
    # sequence a total order.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ), totals AS (
      SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n,
           ROUND(CAST(p.n AS DOUBLE) / t.n_from, 6) AS p_transition
    FROM pairs p JOIN totals t USING (from_type)
    """,
    doc="Event TRANSITION MATRIX (SURVEY §2.7b ext): per-user "
    "next-event via lead(), then (from, to) counts normalized into "
    "first-order Markov transition probabilities — the user-flow / "
    "Sankey primitive behind every journey diagram, and the input to "
    "next-action models. One shuffle on the user key + one sort for "
    "the lead, then type-pair aggregation over a handful of states — "
    "the window is the only data-sized stage and it's the q_lag_delta "
    "shape. All-integer counts; one rounded division.",
)
def q_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias(
            "p_transition"
        ),
    )


@register(
    "q_cumulative_users",
    # A user counts from their FIRST day: first-seen per user, then a
    # cumulative sum over the day series — the one-pass spelling of
    # "cumulative COUNT(DISTINCT)" (which no engine can window
    # directly without quadratic state).
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY d0
    )
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cumulative
    FROM daily
    """,
    doc="Cumulative distinct users by day (SURVEY §2.7b ext): the "
    "growth curve — computed as first-seen-date per user + a running "
    "sum over DAYS, the linear-state spelling of a cumulative "
    "COUNT(DISTINCT) (windowing a distinct count directly would hold "
    "every prior key per frame). One user-keyed MIN aggregate + a "
    "window over the day series (aggregate-sized). All-integer.",
)
def q_cumulative_users(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date(F.date_trunc("day", "ts"))).alias("d0")
    )
    daily = firsts.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day", "n_new", F.sum("n_new").over(w).alias("n_cumulative")
    )


@register(
    "q_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
      SELECT e.user_id, MIN(e.ts) AS t_view
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t_signup
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view_after,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after
    """,
    doc="Ordered conversion funnel (signup -> later view -> later "
    "purchase): each stage is a per-user MIN-timestamp aggregate "
    "semi-joined against the previous stage — three user_id-keyed "
    "shuffles, no window, no self-cross. Timestamps are exact, so the "
    "funnel counts are deterministic.",
)
def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(F.broadcast(v.agg(F.count("*").alias("n_view_after"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_purchase_after"))))
    )


@register(
    "q_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-seen week, "
    "activity counted per (cohort, week-offset) cell — the standard "
    "growth-analytics rollup. Two user_id-keyed aggregates; the "
    "distinct-count shuffle key is (cohort, offset, user), all exact "
    "integer/date arithmetic.",
)
def q_retention(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "q_attribution",
    oracle="""
    SELECT user_id, ts AS purchase_ts, last_click_id, ROUND(value, 2) AS value
    FROM (
      SELECT user_id, ts, event_type, value,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_id
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    WHERE event_type = 'purchase'
    """,
    doc="Last-touch attribution: each purchase is credited to the "
    "user's most recent STRICTLY PRIOR click — the reference's "
    "$CurrentUTC forward-fill semantic (class.nmea.parser.php:226) as "
    "a business query. One window per user_id partition (never "
    "global), (ts, event_id) ordering for tie stability; the frame "
    "ends at 1 PRECEDING so a click never attributes a simultaneous "
    "purchase.",
)
def q_attribution(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        e.select(
            "user_id",
            "ts",
            "event_type",
            "value",
            F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_id",
            F.round("value", 2).alias("value"),
        )
    )


@register(
    "q_scd2_intervals",
    oracle="""
    SELECT user_id, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           ROUND(value, 2) AS value,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM events WHERE event_type = 'signup'
    """,
    doc="SCD type-2 validity intervals: each new version (here: a "
    "user's signup events) closes the previous one — valid_from = "
    "event ts, valid_to = LEAD(ts) (NULL = current). The standard "
    "dimension-history pattern, one lead window per user_id "
    "partition; pairs with q_merge_upsert (the type-1 path).",
)
def q_scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events").filter(F.col("event_type") == "signup")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.round("value", 2).alias("value"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "q_join_pit",
    oracle="""
    WITH dim0 AS (
      SELECT user_id, ts, ROUND(arg_min(value, event_id), 2) AS dim_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ),
    dim AS (
      SELECT user_id, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             dim_value
      FROM dim0
    ),
    f AS (
      SELECT event_id, user_id, ts, ROUND(value, 2) AS fact_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts, f.fact_value,
           d.dim_value, d.valid_from AS version_from
    FROM f JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
    doc="Point-in-time (PIT) join — the feature-store training join "
    "(SURVEY §2.3 ext, the q_scd2_intervals consumer): each fact row "
    "joined to the dimension VERSION valid at its event time "
    "(valid_from <= ts < valid_to), never to later knowledge — the "
    "leakage-free way to assemble training examples against a "
    "changing dimension. Engine rewrite: because SCD2 intervals TILE "
    "(valid_to = next valid_from), the interval predicate is exactly "
    "an as-of join (latest version with valid_from <= ts, ties at the "
    "boundary going to the newer version on both engines) — one "
    "union + ordered-window shuffle (operators/asof.py), no range-join "
    "explosion. The oracle keeps the declarative interval join; "
    "parity proves the rewrite.",
)
def q_join_pit(spark: SparkSession, sf: str) -> DataFrame:
    from gps_stream_processing_spark.operators.asof import asof_join

    e = table(spark, sf, "events")
    dim0 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.round(F.min_by("value", "event_id"), 2).alias("dim_value"))
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("fact_value")
    )
    return asof_join(
        facts, dim0, by=["user_id"], ts_col="ts", how="inner", right_prefix="pit_"
    ).select(
        "event_id",
        "user_id",
        "ts",
        "fact_value",
        F.col("pit_dim_value").alias("dim_value"),
        F.col("pit_ts").alias("version_from"),
    )


@register(
    "q_event_pattern",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ), lv AS (
      SELECT *,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER w AS last_view_ts
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), qc AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN event_type = 'click'
                   AND last_view_ts >= ts - INTERVAL 1 HOUR THEN ts END AS qts
      FROM lv WHERE event_type IN ('click', 'purchase')
    ), lq AS (
      SELECT *, max(qts) OVER w AS last_qclick_ts
      FROM qc
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           min(ts) AS first_match_ts
    FROM lq
    WHERE event_type = 'purchase'
      AND last_qclick_ts >= ts - INTERVAL 24 HOUR
    GROUP BY user_id
    """,
    doc="Ordered event-sequence pattern matching (the MATCH_RECOGNIZE / "
    "CEP use case, SURVEY §2.7b beside q_funnel): count per user the "
    "purchases preceded by a click within 24h where that click was "
    "itself preceded by a view within 1h — nearest-preceding semantics "
    "via two running-max window passes, NOT a 3-way self-join: the "
    "naive view x click x purchase join is O(n^3) per user worst-case, "
    "while this is two user-keyed sort-window scans, O(n log n) total "
    "and linear state. q_funnel answers 'did the user ever convert' "
    "(stage MIN-timestamps); this counts pattern INSTANCES under "
    "per-step time bounds. At 100 TB both passes ride the same "
    "user_id partitioning — one shuffle, reused.",
)
def q_event_pattern(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    e = table(spark, sf, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    lv = e.withColumn(
        "last_view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    qc = lv.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "qts",
        F.when(
            (F.col("event_type") == "click")
            & (F.col("last_view_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
            F.col("ts"),
        ),
    )
    lq = qc.withColumn("last_qclick_ts", F.max("qts").over(w))
    return (
        lq.filter(
            (F.col("event_type") == "purchase")
            & (
                F.col("last_qclick_ts")
                >= F.col("ts") - F.expr("INTERVAL 24 HOURS")
            )
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.min("ts").alias("first_match_ts"),
        )
    )
