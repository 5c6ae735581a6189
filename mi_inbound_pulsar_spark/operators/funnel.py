"""Product-analytics operators over the event stream: ordered funnel
conversion, weekly cohort retention, and PSI distribution-drift
monitoring.

These are the OLAP queries the reference's downstream consumers run on
the delivered event stream (every record carries event time + key —
``PulsarUtils.java:121-130``): sequential-pattern aggregation (funnel),
time-bucketed self-join (cohorts), and two-window distribution
comparison (drift). All are declarative single-plan DataFrame forms —
no iteration, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.adaptive import fanout_partitions
from mi_inbound_pulsar_spark.plans.iterate import eager_checkpoint, retain
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

#: reference/current boundary for the drift monitor.
DRIFT_CUTOFF = "2024-01-20"


@query(
    "q_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_after,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_after,
           round((SELECT count(*) FROM s2) * 1.0
                 / nullif((SELECT count(*) FROM s1), 0), 6) AS signup_to_click,
           round((SELECT count(*) FROM s3) * 1.0
                 / nullif((SELECT count(*) FROM s2), 0), 6) AS click_to_purchase
    """,
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first click strictly after it → first
    purchase strictly after that, with stage conversion rates. The
    ORDER requirement (each stage after the previous stage's first
    completion) is what separates a funnel from three filters.

    Scale: three per-user min-aggregates chained by semi-join-shaped
    inner joins — every stage shuffles (user_id, one timestamp) only,
    and each stage's input shrinks to the survivors of the previous
    one. No window sort, no event materialization per user.
    """
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_users = e.agg(F.count_distinct("user_id").alias("n_users"))
    c1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_click_after"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_purchase_after"))
    return (
        n_users.crossJoin(c1)
        .crossJoin(c2)
        .crossJoin(c3)
        .select(
            "n_users",
            "n_signup",
            "n_click_after",
            "n_purchase_after",
            F.round(F.col("n_click_after") / F.nullif(F.col("n_signup"), F.lit(0)), 6).alias(
                "signup_to_click"
            ),
            F.round(
                F.col("n_purchase_after") / F.nullif(F.col("n_click_after"), F.lit(0)), 6
            ).alias("click_to_purchase"),
        )
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH fw AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    aw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events
    ),
    j AS (
      SELECT fw.cohort, date_diff('day', fw.cohort, aw.w) // 7 AS wk, aw.user_id
      FROM fw JOIN aw USING (user_id)
    ),
    sizes AS (SELECT cohort, count(*) AS cohort_size FROM fw GROUP BY cohort)
    SELECT j.cohort, CAST(j.wk AS BIGINT) AS wk,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
           round(count(DISTINCT j.user_id) * 1.0 / s.cohort_size, 6) AS retention
    FROM j JOIN sizes s ON j.cohort = s.cohort
    GROUP BY j.cohort, j.wk, s.cohort_size
    ORDER BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, then
    the share of each cohort active k weeks later — the standard
    retention triangle.

    Scale: both sides reduce to (user_id, week) before the join, so
    the join input is bounded by users × active-weeks, not raw events;
    the week-0 diagonal (retention = 1.0) doubles as a built-in sanity
    invariant (asserted in pytest).
    """
    e = load_table(spark, sf_dir, "events")
    fw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    aw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w")
    ).distinct()
    j = fw.join(aw, "user_id").select(
        "cohort",
        F.floor(F.datediff(F.col("w"), F.col("cohort")) / 7).cast("long").alias("wk"),
        "user_id",
    )
    sizes = fw.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        j.join(sizes, "cohort")
        .groupBy("cohort", "wk", "cohort_size")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            "cohort",
            "wk",
            "cohort_size",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort", "wk")
    )


@query(
    "q_psi_drift",
    oracle=f"""
    WITH ref AS (SELECT value FROM events WHERE ts < TIMESTAMP '{DRIFT_CUTOFF}'),
    cur AS (SELECT value FROM events WHERE ts >= TIMESTAMP '{DRIFT_CUTOFF}'),
    edges AS (
      SELECT quantile_cont(value, 0.1) AS e1, quantile_cont(value, 0.2) AS e2,
             quantile_cont(value, 0.3) AS e3, quantile_cont(value, 0.4) AS e4,
             quantile_cont(value, 0.5) AS e5, quantile_cont(value, 0.6) AS e6,
             quantile_cont(value, 0.7) AS e7, quantile_cont(value, 0.8) AS e8,
             quantile_cont(value, 0.9) AS e9
      FROM ref
    ),
    rb AS (
      SELECT CAST(value > e1 AS INT) + CAST(value > e2 AS INT) + CAST(value > e3 AS INT)
           + CAST(value > e4 AS INT) + CAST(value > e5 AS INT) + CAST(value > e6 AS INT)
           + CAST(value > e7 AS INT) + CAST(value > e8 AS INT) + CAST(value > e9 AS INT)
             AS bucket
      FROM ref, edges
    ),
    cb AS (
      SELECT CAST(value > e1 AS INT) + CAST(value > e2 AS INT) + CAST(value > e3 AS INT)
           + CAST(value > e4 AS INT) + CAST(value > e5 AS INT) + CAST(value > e6 AS INT)
           + CAST(value > e7 AS INT) + CAST(value > e8 AS INT) + CAST(value > e9 AS INT)
             AS bucket
      FROM cur, edges
    ),
    p AS (SELECT bucket, count(*) AS n_ref FROM rb GROUP BY bucket),
    q AS (SELECT bucket, count(*) AS n_cur FROM cb GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM ref) AS t_ref, (SELECT count(*) FROM cur) AS t_cur)
    SELECT CAST(p.bucket AS BIGINT) AS bucket,
           CAST(p.n_ref AS BIGINT) AS n_ref,
           CAST(coalesce(q.n_cur, 0) AS BIGINT) AS n_cur,
           round((p.n_ref * 1.0 / t_ref - coalesce(q.n_cur, 0) * 1.0 / t_cur)
                 * ln((p.n_ref * 1.0 / t_ref) / nullif(coalesce(q.n_cur, 0) * 1.0 / t_cur, 0)),
                 6) AS psi_term
    FROM p LEFT JOIN q ON p.bucket = q.bucket CROSS JOIN tot
    ORDER BY bucket
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: decile-bucket the
    *reference* window's value distribution, then compare the current
    window's occupancy per bucket via (p−q)·ln(p/q) terms — the data-
    quality tripwire that tells a training pipeline its feature
    distribution moved before any model does.

    Scale: bucket edges are ONE 9-quantile aggregate over the
    reference window broadcast back (swap in approx_percentile at
    100 TB, same plan); bucket assignment is 9 codegen'd comparisons
    per row; the rest is two tiny group-counts. The decile design
    guarantees every reference bucket is non-empty.
    """
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit(DRIFT_CUTOFF).cast("timestamp")
    ref = e.filter(F.col("ts") < cutoff).select("value")
    cur = e.filter(F.col("ts") >= cutoff).select("value")
    edges = ref.agg(
        *[F.percentile("value", F.lit(q / 10)).alias(f"e{q}") for q in range(1, 10)]
    )

    def bucketed(df: DataFrame) -> DataFrame:
        b = None
        for q in range(1, 10):
            t = (F.col("value") > F.col(f"e{q}")).cast("int")
            b = t if b is None else b + t
        return df.join(F.broadcast(edges)).select(b.alias("bucket"))

    p = bucketed(ref).groupBy("bucket").agg(F.count(F.lit(1)).alias("n_ref"))
    q_ = bucketed(cur).groupBy("bucket").agg(F.count(F.lit(1)).alias("n_cur"))
    tot = ref.agg(F.count(F.lit(1)).alias("t_ref")).crossJoin(
        cur.agg(F.count(F.lit(1)).alias("t_cur"))
    )
    pr = F.col("n_ref") / F.col("t_ref")
    qr = F.coalesce(F.col("n_cur"), F.lit(0)) / F.col("t_cur")
    return (
        p.join(q_, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
            F.round((pr - qr) * F.log(pr / F.nullif(qr, F.lit(0))), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


@query(
    "q_table_profile",
    oracle="""
    SELECT 'event_id' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           round(min(event_id) * 1.0, 6) AS min_num,
           round(max(event_id) * 1.0, 6) AS max_num,
           NULL AS min_str, NULL AS max_str
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(user_id) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT),
           round(min(user_id) * 1.0, 6), round(max(user_id) * 1.0, 6),
           NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(value) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT),
           round(min(value), 6), round(max(value), 6),
           NULL, NULL
    FROM events
    UNION ALL
    SELECT 'ts_epoch_us', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(ts) AS BIGINT),
           CAST(count(DISTINCT ts) AS BIGINT),
           round(min(epoch_us(ts)) * 1.0, 6), round(max(epoch_us(ts)) * 1.0, 6),
           NULL, NULL
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(event_type) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT),
           NULL, NULL, min(event_type), max(event_type)
    FROM events
    UNION ALL
    SELECT 'props', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(props) AS BIGINT),
           CAST(count(DISTINCT props) AS BIGINT),
           NULL, NULL, min(props), max(props)
    FROM events
    ORDER BY column_name
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile: row/null/distinct counts plus typed
    min/max for every column of the events table — the data-quality
    snapshot a pipeline records per ingest partition (dbt-style
    completeness/uniqueness checks read straight off it).

    Scale: all six column profiles are independent aggregates of the
    SAME scan — Catalyst collapses the union of 1-row aggregates into
    one shuffle-free pass per branch over a shared (cached) scan; the
    exact n_distinct is the only per-column shuffle, and it swaps to
    approx_count_distinct at 100 TB without changing the output
    schema. Timestamps profile as epoch micros (engine-portable
    rendering), strings as lexicographic min/max.
    """
    e = load_table(spark, sf_dir, "events")

    def prof(name: str, col, numeric: bool):
        agg = [
            F.lit(name).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.count_distinct(col).alias("n_distinct"),
        ]
        if numeric:
            agg += [
                F.round(F.min(col).cast("double"), 6).alias("min_num"),
                F.round(F.max(col).cast("double"), 6).alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
        else:
            agg += [
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.min(col).alias("min_str"),
                F.max(col).alias("max_str"),
            ]
        return e.agg(*agg)

    parts = [
        prof("event_id", F.col("event_id"), True),
        prof("user_id", F.col("user_id"), True),
        prof("value", F.col("value"), True),
        prof("ts_epoch_us", F.unix_micros("ts"), True),
        prof("event_type", F.col("event_type"), False),
        prof("props", F.col("props"), False),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column_name")


@query(
    "q_funnel_windowed",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 72 HOUR
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL 72 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_72h,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_72h,
           round((SELECT count(*) FROM s3) * 1.0
                 / nullif((SELECT count(*) FROM s1), 0), 6) AS full_funnel_rate
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline-constrained funnel: each stage must complete within 72
    hours of the previous stage's first completion — the form product
    metrics actually use (an unbounded funnel converges to trivial
    100% on long-lived users; the deadline is what makes the rate
    meaningful). Same chained min-aggregate plan as
    ``q_funnel_stages`` with the window predicate pushed into each
    stage's filter, so the deadline *reduces* stage input sizes.
    """
    e = load_table(spark, sf_dir, "events")
    window = F.expr("INTERVAL 72 HOURS")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + window)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + window)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_click_72h"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_purchase_72h"))
    return c1.crossJoin(c2).crossJoin(c3).select(
        "n_signup",
        "n_click_72h",
        "n_purchase_72h",
        F.round(F.col("n_purchase_72h") / F.nullif(F.col("n_signup"), F.lit(0)), 6).alias(
            "full_funnel_rate"
        ),
    )


@query(
    "q_rfm_segmentation",
    oracle="""
    WITH p AS (
      SELECT user_id,
             date_diff('day', CAST(max(ts) AS DATE),
                       (SELECT CAST(max(ts) AS DATE) FROM events)) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS monetary_micro
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, frequency, monetary_micro,
           CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_micro DESC, user_id) AS BIGINT) AS m_score
    FROM p ORDER BY user_id
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user recency / frequency /
    monetary value of purchases, each quintile-scored with ``ntile`` —
    the classic marketing segmentation (score 1 = best by convention
    here: most recent, most frequent, highest spend).

    Scale: one purchase-filtered aggregate, then three EXACT ntile
    scorings computed WITHOUT a global window — each metric goes
    through the two-phase distributed rank in ``plans/ranking.py``
    (range shuffle on (metric, user_id) → broadcast prefix offsets →
    partition-local row_number) and the tile comes from the closed-
    form ntile formula. No `WindowExec: No Partition Defined` stage
    anywhere, so the plan holds at 10⁹ users; results stay hash-
    identical to the oracle's ranked ntile. Monetary is exact integer
    micros; every ordering carries the user_id tiebreak so ranks are
    total.
    """
    e = load_table(spark, sf_dir, "events")
    from ..plans.ranking import attach_global_order_stats, ntile_from_rn

    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(micro).alias("monetary_micro"),
        )
    )
    global_max = e.agg(F.max(F.col("ts").cast("date")).alias("gmax"))
    p = (
        p.crossJoin(F.broadcast(global_max))
        .select(
            "user_id",
            F.datediff(F.col("gmax"), F.col("last_day")).cast("long").alias("recency_days"),
            "frequency",
            "monetary_micro",
        )
        .transform(eager_checkpoint)
    )
    scores = []
    for name, order in (
        ("r_score", [F.asc("recency_days"), F.asc("user_id")]),
        ("f_score", [F.desc("frequency"), F.asc("user_id")]),
        ("m_score", [F.desc("monetary_micro"), F.asc("user_id")]),
    ):
        ranked, total = attach_global_order_stats(p, order, rn_col="__rn")
        scores.append(
            ranked.select(
                "user_id", ntile_from_rn(F.col("__rn"), total, 5).alias(name)
            )
        )
    out = p
    for s in scores:
        out = out.join(s, "user_id")
    return out.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        "r_score",
        "f_score",
        "m_score",
    ).orderBy("user_id")


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pairs AS (
      SELECT prev, event_type AS next, count(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, next
    ),
    totals AS (SELECT prev, sum(n) AS t FROM pairs GROUP BY prev)
    SELECT p.prev, p.next, CAST(p.n AS BIGINT) AS n,
           round(p.n * 1.0 / t.t, 6) AS prob
    FROM pairs p JOIN totals t USING (prev)
    ORDER BY prev, next
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | previous event type). The temporal
    twin of ``q_bigram_pmi`` — adjacency here is each user's timeline,
    not token order — and the input to next-event prediction,
    anomaly scoring, and funnel-shape discovery.

    Scale: one lag window on the (user_id) partitioning, then a hash
    aggregate on the (prev, next) pair — the transition matrix is
    event-type² rows regardless of corpus size, and the per-prev
    normalizer is a broadcast-sized join.
    """
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("event_type", F.lag("event_type").over(w).alias("prev"))
    pairs = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(totals), "prev")
        .select("prev", "next", "n", F.round(F.col("n") / F.col("t"), 6).alias("prob"))
        .orderBy("prev", "next")
    )


@query(
    "q_event_streaks",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_type
      FROM events
    ),
    islands AS (
      SELECT user_id, event_type, rn_all - rn_type AS island, count(*) AS streak
      FROM seq GROUP BY user_id, event_type, rn_all - rn_type
    ),
    best AS (
      SELECT user_id, CAST(max(streak) AS BIGINT) AS longest_streak
      FROM islands GROUP BY user_id
    )
    SELECT b.user_id, b.longest_streak,
           min(i.event_type) AS streak_type
    FROM best b JOIN islands i
      ON b.user_id = i.user_id AND i.streak = b.longest_streak
    GROUP BY b.user_id, b.longest_streak
    ORDER BY b.user_id
    """,
)
def q_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive
    same-type events (ties broken to the lexicographically first
    type). The value-change twin of time-gap sessionization — the
    ``rn_all − rn_type`` island trick turns consecutive-run detection
    into a plain GROUP BY, no iteration.

    Scale: both row_numbers share the (user_id) partitioning — one
    Exchange; islands and the max are hash aggregates on keys bounded
    by runs, not events.
    """
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(wa) - F.row_number().over(wt)).alias("island"),
    )
    islands = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("streak")
    )
    best = islands.groupBy("user_id").agg(F.max("streak").alias("longest_streak"))
    return (
        best.join(
            islands,
            (best.user_id == islands.user_id) & (best.longest_streak == islands.streak),
        )
        .groupBy(best.user_id, "longest_streak")
        .agg(F.min("event_type").alias("streak_type"))
        .orderBy("user_id")
    )


@query(
    "q_pareto_contribution",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(revenue_cents) AS t FROM rev),
    ranked AS (
      SELECT l_partkey, revenue_cents,
             sum(revenue_cents) OVER (
               ORDER BY revenue_cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_cents,
             row_number() OVER (ORDER BY revenue_cents DESC, l_partkey) AS rnk
      FROM rev
    )
    SELECT l_partkey, revenue_cents, CAST(rnk AS BIGINT) AS rnk,
           round(cum_cents * 1.0 / t, 6) AS cum_share,
           cum_cents * 1.0 / t <= 0.8 AS in_head
    FROM ranked, tot
    WHERE rnk <= 20
    ORDER BY rnk
    """,
)
def q_pareto_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / contribution analysis: parts ranked by revenue with
    cumulative revenue share and the 80%-head flag — the concentration
    diagnostic behind 'which 20% of SKUs drive 80% of revenue'.

    Scale: revenue is an exact integer-cents hash aggregate; the
    running sum + rank run as a two-phase distributed cumulative sum
    (``plans/ranking.py``: range shuffle on (revenue desc, key) →
    per-partition partial counts/sums → broadcast prefix offsets →
    partition-local window) — no single-task global sort, exact
    results, deterministic under the total ordering; only the top-20
    presentation rows surface.
    """
    li = load_table(spark, sf_dir, "lineitem")
    from ..plans.ranking import attach_global_order_stats

    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("revenue_cents"))
    tot = rev.agg(F.sum("revenue_cents").alias("t"))
    ranked, _ = attach_global_order_stats(
        rev,
        [F.desc("revenue_cents"), F.asc("l_partkey")],
        rn_col="rnk",
        cum_sums={"cum_cents": "revenue_cents"},
    )
    return (
        ranked.filter(F.col("rnk") <= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "revenue_cents",
            "rnk",
            F.round(F.col("cum_cents") / F.col("t"), 6).alias("cum_share"),
            (F.col("cum_cents") / F.col("t") <= 0.8).alias("in_head"),
        )
        .orderBy("rnk")
    )


@query(
    "q_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    freq AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p1, p2, CAST(n_both AS BIGINT) AS n_both,
           round(n_both * 1.0 / n_orders, 6) AS support,
           round((n_both * 1.0 / n_orders)
                 / ((f1.c * 1.0 / n_orders) * (f2.c * 1.0 / n_orders)), 6) AS lift
    FROM pairs JOIN freq f1 ON p1 = f1.l_partkey
               JOIN freq f2 ON p2 = f2.l_partkey
               CROSS JOIN n
    ORDER BY n_both DESC, p1, p2
    LIMIT 20
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: co-purchased part pairs with support
    and lift (observed co-occurrence over independence) — the
    association-rule primitive behind recommendations.

    Scale: the self-join is keyed on the order (a basket), so pair
    fan-out is Σ items-per-basket² — bounded by basket size, never
    all-pairs over the catalog; item frequencies broadcast back. A
    hot mega-basket is the skew hazard → cap basket size upstream
    (same DF-cap rationale as the shingle index).
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    f1 = freq.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    f2 = freq.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    sup = F.col("n_both") / F.col("n_orders")
    return (
        pairs.join(F.broadcast(f1), "p1")
        .join(F.broadcast(f2), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "n_both",
            F.round(sup, 6).alias("support"),
            F.round(
                sup / ((F.col("c1") / F.col("n_orders")) * (F.col("c2") / F.col("n_orders"))), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "p1", "p2")
        .limit(20)
    )


@query(
    "q_conversion_latency",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    lat AS (
      SELECT s1.user_id, (epoch_us(t3) - epoch_us(t1)) // 1000000 AS secs
      FROM s1 JOIN s3 ON s1.user_id = s3.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(secs) AS BIGINT) AS min_secs,
           round(quantile_cont(secs, 0.5), 4) AS p50_secs,
           round(quantile_cont(secs, 0.9), 4) AS p90_secs,
           CAST(max(secs) AS BIGINT) AS max_secs
    FROM lat
    """,
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from first signup to the
    first purchase after it, summarized as min/median/p90/max — the
    latency companion to the funnel's conversion *rate* (how many
    convert vs how long it takes).

    Scale: two chained min-aggregates (funnel plan), one integer-
    seconds subtraction, one percentile aggregate over converters
    only. Integer seconds via epoch-µs floor-division keeps the
    latency column engine-exact; the interpolated percentiles ride
    the Spark ``percentile`` ≙ DuckDB ``quantile_cont`` parity pair.
    """
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s3 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = s1.join(s3, "user_id").select(
        ((F.unix_micros("t3") - F.unix_micros("t1")) / 1000000).cast("long").alias("secs")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("secs").alias("min_secs"),
        F.round(F.percentile("secs", F.lit(0.5)), 4).alias("p50_secs"),
        F.round(F.percentile("secs", F.lit(0.9)), 4).alias("p90_secs"),
        F.max("secs").alias("max_secs"),
    )


@query(
    "q_twap",
    oracle="""
    WITH seq AS (
      SELECT event_type, CAST(round(value * 1000000, 0) AS BIGINT) AS vmicro,
             (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dt_secs
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_secs) AS BIGINT) AS total_secs,
           round(sum(vmicro * dt_secs) * 1.0 / sum(dt_secs) / 1000000, 6) AS twap
    FROM seq WHERE dt_secs IS NOT NULL AND dt_secs > 0
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP): each observation is weighted
    by how long it was the user's 'current' value (until their next
    event) — the estimator that is robust to irregular sampling, where
    a plain mean over-weights bursts. Standard in pricing/metering;
    here per event type.

    Scale: one lead window on the (user_id) partitioning, then a hash
    aggregate. The weighted sums are integer (micro-value × whole
    seconds), so cross-engine summation order cannot move the result;
    the single final division is the only float op.
    """
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vmicro = F.round(F.col("value") * 1000000, 0).cast("long")
    dt = ((F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1000000).cast("long")
    seq = e.select("event_type", vmicro.alias("vmicro"), dt.alias("dt_secs"))
    return (
        seq.filter(F.col("dt_secs").isNotNull() & (F.col("dt_secs") > 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt_secs").alias("total_secs"),
            F.round(
                F.sum(F.col("vmicro") * F.col("dt_secs")) / F.sum("dt_secs") / 1000000, 6
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


@query(
    "q_period_over_period",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT day, n,
           lag(n, 1) OVER w AS prev_day,
           lag(n, 7) OVER w AS prev_week,
           round((n - lag(n, 1) OVER w) * 1.0 / lag(n, 1) OVER w, 6) AS dod_growth,
           round((n - lag(n, 7) OVER w) * 1.0 / lag(n, 7) OVER w, 6) AS wow_growth
    FROM daily
    WINDOW w AS (ORDER BY day)
    ORDER BY day
    """,
)
def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: daily volumes with day-over-day and
    week-over-week deltas — the BI reporting staple (lag at two
    horizons over the same daily rollup; NULL growth on the warm-up
    rows where no prior period exists).

    Scale: the window runs over the *daily rollup* (365 rows/year),
    not events — the aggregate shrinks first, the analytics read the
    shrunk series. Growth is a single division of exact integer
    counts.
    """
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    daily = bounded_window_input(daily, label="q_period_over_period day rollup")
    w = Window.orderBy("day")
    prev1, prev7 = F.lag("n", 1).over(w), F.lag("n", 7).over(w)
    return daily.select(
        "day",
        "n",
        prev1.alias("prev_day"),
        prev7.alias("prev_week"),
        F.round((F.col("n") - prev1) / prev1, 6).alias("dod_growth"),
        F.round((F.col("n") - prev7) / prev7, 6).alias("wow_growth"),
    ).orderBy("day")


SURVIVAL_WINDOW_DAYS = 14


@query(
    "q_survival_curve",
    oracle=f"""
    WITH horizon AS (SELECT max(epoch_us(ts)) AS h FROM events),
    signup AS (
      SELECT user_id, min(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id, s.s_us, min(epoch_us(e.ts)) AS p_us
      FROM signup s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND epoch_us(e.ts) > s.s_us
      GROUP BY s.user_id, s.s_us
    ),
    obs AS (
      SELECT user_id,
             CASE WHEN p_us IS NOT NULL
                  THEN CAST((p_us - s_us) // 86400000000 AS BIGINT)
                  ELSE CAST((h - s_us) // 86400000000 AS BIGINT) END AS e_day,
             p_us IS NOT NULL AS is_event
      FROM conv, horizon
    ),
    spine AS (SELECT unnest(range(0, {SURVIVAL_WINDOW_DAYS})) AS day),
    km AS (
      SELECT spine.day,
             CAST(count(*) FILTER (o.e_day >= spine.day) AS BIGINT) AS n_at_risk,
             CAST(count(*) FILTER (o.is_event AND o.e_day = spine.day) AS BIGINT)
               AS n_events
      FROM spine CROSS JOIN obs o
      GROUP BY spine.day
    )
    SELECT day, n_at_risk, n_events,
           -- guarded KM product: a total-death day (term = 0) zeroes the
           -- curve from there on; ln only ever sees positive terms
           round(CASE WHEN min(1.0 - n_events * 1.0 / n_at_risk) OVER w = 0
                      THEN 0.0
                      ELSE exp(sum(CASE WHEN n_events < n_at_risk
                                        THEN ln(1.0 - n_events * 1.0 / n_at_risk)
                                        END) OVER w) END, 6) AS survival
    FROM km
    WHERE n_at_risk > 0
    WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ORDER BY day
    """,
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup -> first purchase with
    right-censoring: users who never purchase are censored at the
    corpus horizon instead of being dropped (dropping them — the naive
    conversion-rate query — biases time-to-convert DOWN; q_conversion_
    latency reports the uncensored view, this is the estimator that
    handles incomplete observation windows correctly). ``S(d)`` is the
    product over days ``t <= d`` of ``(1 - events_t / at_risk_t)``.

    Engine plan: per-user first-signup/first-purchase rollup (one
    groupBy), a scalar horizon, a ``SURVIVAL_WINDOW_DAYS``-day (14) spine
    crossed with the per-user observation rollup for the at-risk
    counts, then the KM product as exp(running sum of log terms) over
    the day series — the bounded-window class (|spine| rows). The
    cumulative-log form runs the identical IEEE sequence in DuckDB's
    window, so the oracle is hash-exact.

    Scale: everything after the first groupBy operates on |users|
    rows, and the spine expansion is x``SURVIVAL_WINDOW_DAYS`` of THAT
    (never raw events). For very large user bases replace the
    spine-cross with a reverse cumulative sum over the per-day
    observation counts — same result, |days| + |users| rows.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    horizon = e.agg(F.max(us).alias("h"))
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("s_us"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("p_us")
    )
    conv = (
        signup.join(
            purchases,
            (signup.user_id == purchases.user_id) & (F.col("p_us") > F.col("s_us")),
            "left",
        )
        .groupBy(signup.user_id, "s_us")
        .agg(F.min("p_us").alias("p_us"))
    )
    obs = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("p_us").isNotNull(),
            F.floor((F.col("p_us") - F.col("s_us")) / 86_400_000_000),
        )
        .otherwise(F.floor((F.col("h") - F.col("s_us")) / 86_400_000_000))
        .cast("long")
        .alias("e_day"),
        F.col("p_us").isNotNull().alias("is_event"),
    )
    spine = spark.range(0, SURVIVAL_WINDOW_DAYS).select(F.col("id").alias("day"))
    km = (
        F.broadcast(spine)
        .crossJoin(obs)
        .groupBy("day")
        .agg(
            F.count_if(F.col("e_day") >= F.col("day")).alias("n_at_risk"),
            F.count_if(F.col("is_event") & (F.col("e_day") == F.col("day"))).alias(
                "n_events"
            ),
        )
    )
    km = bounded_window_input(km, label="q_survival_curve day spine")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    term = F.lit(1.0) - F.col("n_events") / F.col("n_at_risk")
    # guarded KM product (matches the oracle): a total-death day zeroes
    # the curve from there on; ln only ever sees positive terms (Spark
    # ln(0) is NULL while DuckDB's is -inf, so the naive exp-sum-log
    # form would diverge exactly on that edge)
    survival = F.when(F.min(term).over(w) == 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.when(F.col("n_events") < F.col("n_at_risk"), F.log(term))).over(w))
    )
    return (
        km.filter(F.col("n_at_risk") > 0)
        .withColumn("survival", F.round(survival, 6))
        .orderBy("day")
    )


@query(
    "q_join_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT 'events.user_id' AS tbl_key, CAST(user_id AS VARCHAR) AS k, count(*) AS c
      FROM events GROUP BY user_id
      UNION ALL
      SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR), count(*)
      FROM lineitem GROUP BY l_orderkey
      UNION ALL
      SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR), count(*)
      FROM orders GROUP BY o_custkey
    )
    SELECT tbl_key,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS hottest_rows,
           round(max(c) * 1.0 * count(*) / sum(c), 6) AS skew_ratio,
           round(sum(CASE WHEN c * 20 >= (SELECT max(c2.c) FROM per_key c2
                                          WHERE c2.tbl_key = per_key.tbl_key)
                          THEN c ELSE 0 END) * 1.0 / sum(c), 6) AS hot_mass_share
    FROM per_key
    GROUP BY tbl_key
    ORDER BY tbl_key
    """,
)
def q_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-key skew diagnostic across the three hottest
    join keys in the warehouse: per key-column, the key count, row
    count, hottest key's row count, the skew ratio (hottest / mean
    rows-per-key), and the share of rows held by keys within 20x of
    the hottest ("hot mass"). This is the report that decides BEFORE a
    big join whether to salt (plans/skew.py), rely on AQE skew-join
    splitting, or broadcast — q_key_distribution profiles the message
    key stream; this profiles the relational join keys.

    Scale: one groupBy per key column (map-side partial agg) then a
    3-row rollup; the per-table max rides along as a max-of-max
    aggregate, nothing collects.
    """
    e = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def per_key(df: DataFrame, col: str, label: str) -> DataFrame:
        return df.groupBy(F.col(col).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        ).select(F.lit(label).alias("tbl_key"), "k", "c")

    pk = (
        per_key(e, "user_id", "events.user_id")
        .unionByName(per_key(li, "l_orderkey", "lineitem.l_orderkey"))
        .unionByName(per_key(o, "o_custkey", "orders.o_custkey"))
    )
    mx = pk.groupBy("tbl_key").agg(F.max("c").alias("mx"))
    return (
        pk.join(mx, "tbl_key")
        .groupBy("tbl_key")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("hottest_rows"),
            F.round(F.max("c") * F.count(F.lit(1)) / F.sum("c"), 6).alias("skew_ratio"),
            F.round(
                F.sum(F.when(F.col("c") * 20 >= F.col("mx"), F.col("c")).otherwise(0))
                / F.sum("c"),
                6,
            ).alias("hot_mass_share"),
        )
        .orderBy("tbl_key")
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution (Anderl et al. 2014)
# --------------------------------------------------------------------------
MARKOV_CHANNELS = ("click", "error", "signup", "view")
MARKOV_ITERS = 20


def _markov_journey_sql() -> str:
    """Shared oracle CTE block: journeys split at each purchase, runs
    of the same channel collapsed, transitions with START / CONV /
    DROP pseudo-states, and row-normalized probabilities."""
    return """
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey
      FROM events
    ),
    collapsed AS (
      SELECT user_id, journey, ch, ts, event_id FROM (
        SELECT user_id, journey, event_type AS ch, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id, journey
                                     ORDER BY ts, event_id) AS prev_ch
        FROM ordered WHERE event_type != 'purchase'
      ) WHERE prev_ch IS NULL OR prev_ch != ch
    ),
    conv AS (
      SELECT DISTINCT user_id, journey FROM ordered
      WHERE event_type = 'purchase'
    ),
    steps AS (
      SELECT user_id, journey, ch,
             lead(ch) OVER (PARTITION BY user_id, journey
                            ORDER BY ts, event_id) AS nxt,
             row_number() OVER (PARTITION BY user_id, journey
                                ORDER BY ts, event_id) AS rn
      FROM collapsed
    ),
    trans_raw AS (
      SELECT user_id, 'START' AS src, ch AS dst FROM steps WHERE rn = 1
      UNION ALL
      SELECT user_id, ch, nxt FROM steps WHERE nxt IS NOT NULL
      UNION ALL
      SELECT s.user_id, s.ch,
             CASE WHEN c.user_id IS NOT NULL THEN 'CONV' ELSE 'DROP' END
      FROM steps s LEFT JOIN conv c USING (user_id, journey)
      WHERE s.nxt IS NULL
      UNION ALL
      SELECT c.user_id, 'START', 'CONV'
      FROM conv c LEFT JOIN (SELECT DISTINCT user_id, journey FROM collapsed) k
        USING (user_id, journey)
      WHERE k.user_id IS NULL
    ),
    tcount AS (SELECT src, dst, count(*) AS n FROM trans_raw GROUP BY src, dst),
    ttot AS (SELECT src, sum(n) AS t FROM tcount GROUP BY src),
    -- MATERIALIZED is load-bearing: tr is referenced by every one of
    -- the 5×{MARKOV_ITERS} unrolled iteration CTEs; inlining would
    -- replicate the whole journey pipeline into each of them
    tr AS MATERIALIZED (
      SELECT c.src, c.dst, c.n * 1.0 / t.t AS prob
      FROM tcount c JOIN ttot t USING (src)
    )""".replace("{MARKOV_ITERS}", str(MARKOV_ITERS))


def _absorb_cte(tag: str, removed: str | None, iters: int) -> str:
    """Unrolled fixed-point CTE chain (the _bpe_vocab_cte trick):
    p_k(s) = P(s→CONV) + Σ P(s→s')·p_{k-1}(s') for ``iters`` rounds,
    over ``tr`` filtered for the removal scenario."""
    src = (
        f"(SELECT * FROM tr WHERE src != '{removed}' AND dst != '{removed}')"
        if removed
        else "tr"
    )
    # every level MATERIALIZED: each holds <= |states| rows, and
    # materializing keeps the 5×iters-level plan LINEAR — inlined,
    # the optimizer re-plans a join tree that deepens per level
    parts = [
        f""",
    p_{tag}_0 AS MATERIALIZED (
      SELECT DISTINCT t.src AS state, CAST(0 AS DOUBLE) AS p FROM {src} t
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
    p_{tag}_{k} AS MATERIALIZED (
      SELECT t.src AS state,
             sum(CASE WHEN t.dst = 'CONV' THEN t.prob
                      ELSE t.prob * coalesce(pp.p, 0) END) AS p
      FROM {src} t
      LEFT JOIN p_{tag}_{k - 1} pp ON t.dst = pp.state
      GROUP BY t.src
    )""")
    return "".join(parts)


def _markov_attribution_oracle() -> str:
    ctes = [f"WITH {_markov_journey_sql()}"]
    ctes.append(_absorb_cte("base", None, MARKOV_ITERS))
    for c in MARKOV_CHANNELS:
        ctes.append(_absorb_cte(c, c, MARKOV_ITERS))
    scen = "\n      UNION ALL\n".join(
        f"""      SELECT '{c}' AS channel,
        coalesce((SELECT max(p) FROM p_{c}_{MARKOV_ITERS}
                  WHERE state = 'START'), 0) AS p_removed"""
        for c in MARKOV_CHANNELS
    )
    return "".join(ctes) + f""",
    basep AS (
      SELECT p FROM p_base_{MARKOV_ITERS} WHERE state = 'START'
    ),
    scen AS (
{scen}
    ),
    eff AS (
      SELECT channel, 1.0 - p_removed / (SELECT p FROM basep) AS effect
      FROM scen
    ),
    tot AS (SELECT sum(effect) AS te FROM eff)
    SELECT e.channel,
           round((SELECT p FROM basep), 6) AS p_conversion,
           round(e.effect, 6) AS removal_effect,
           round(e.effect / t.te, 6) AS attribution_share
    FROM eff e CROSS JOIN tot t
    ORDER BY e.channel
    """


@query("q_markov_attribution", oracle=_markov_attribution_oracle())
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2014):
    model user journeys as a first-order chain over channels with
    START/CONV(ersion)/DROP absorbing pseudo-states, compute the
    START→CONV absorption probability, then re-compute it with each
    channel REMOVED (its row and column zeroed, mass unrenormalized —
    the paper's definition); a channel's attribution share is its
    relative drop in total conversion. This completes the attribution
    family: first/last touch are positional heuristics, the removal
    effect is causal-flavored and order-aware.

    Journeys split at each purchase (the purchase ends the journey it
    terminates); consecutive repeats of a channel collapse to one
    state. Both engines run the SAME fixed {MARKOV_ITERS}-iteration
    power series p_k = c + T·p_{{k-1}} — a linear solve would converge
    to a slightly different fixpoint than the truncated series and
    break the hash; with substochastic T the truncation error is
    < spectral_radius^{MARKOV_ITERS}, far below the 6dp rounding.

    Scale: journey construction is windows PARTITIONED by user; the
    corpus collapses into the (src, dst) transition table — at most
    (|channels|+1)×(|channels|+2) rows, bounded by the CHANNEL DOMAIN,
    not the corpus — which is collected (the centroid-collect class)
    and solved in numpy per scenario; 5 scenarios × a 5×5 matvec is
    driver-side microseconds. The oracle unrolls the identical
    iteration as a generated CTE chain (the BPE-loop trick).
    """
    import numpy as np

    e = load_table(spark, sf_dir, "events")
    w_j = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w_j),
            F.lit(0),
        ).alias("journey"),
    )
    w_uj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    collapsed = (
        ordered.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "journey",
            F.col("event_type").alias("ch"),
            "ts",
            "event_id",
            F.lag("event_type").over(w_uj).alias("prev_ch"),
        )
        .filter(F.col("prev_ch").isNull() | (F.col("prev_ch") != F.col("ch")))
    )
    conv = (
        ordered.filter(F.col("event_type") == "purchase")
        .select("user_id", "journey")
        .distinct()
    )
    steps = collapsed.select(
        "user_id",
        "journey",
        "ch",
        F.lead("ch").over(w_uj).alias("nxt"),
        F.row_number().over(w_uj).alias("rn"),
    )
    first = steps.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("ch").alias("dst")
    )
    mid = steps.filter(F.col("nxt").isNotNull()).select(
        F.col("ch").alias("src"), F.col("nxt").alias("dst")
    )
    last = (
        steps.filter(F.col("nxt").isNull())
        .join(conv.withColumn("cv", F.lit(True)), ["user_id", "journey"], "left")
        .select(
            F.col("ch").alias("src"),
            F.when(F.col("cv"), "CONV").otherwise("DROP").alias("dst"),
        )
    )
    empty_conv = (
        conv.join(
            collapsed.select("user_id", "journey").distinct(),
            ["user_id", "journey"],
            "left_anti",
        )
        .select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    )
    tcount = (
        first.unionByName(mid)
        .unionByName(last)
        .unionByName(empty_conv)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ttot = tcount.groupBy("src").agg(F.sum("n").alias("t"))
    # bounded collect: the transition table is (|channels|+1)×(|channels|+2)
    rows = (
        tcount.join(ttot, "src")
        .select("src", "dst", (F.col("n") / F.col("t")).alias("prob"))
        .collect()
    )
    states = ("START",) + MARKOV_CHANNELS
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    T = np.zeros((n, n))
    cv = np.zeros(n)
    for r in rows:
        if r["src"] not in idx:
            continue
        if r["dst"] == "CONV":
            cv[idx[r["src"]]] += r["prob"]
        elif r["dst"] in idx:
            T[idx[r["src"]], idx[r["dst"]]] += r["prob"]

    def absorb(removed: str | None) -> float:
        Tm, cm = T.copy(), cv.copy()
        if removed is not None:
            ri = idx[removed]
            Tm[ri, :] = 0.0
            Tm[:, ri] = 0.0
            cm[ri] = 0.0
        p = np.zeros(n)
        for _ in range(MARKOV_ITERS):
            p = cm + Tm @ p
        return float(p[idx["START"]])

    p_base = absorb(None)
    effects = {c: 1.0 - absorb(c) / p_base for c in MARKOV_CHANNELS}
    te = sum(effects.values())
    out = [
        (c, round(p_base, 6), round(effects[c], 6), round(effects[c] / te, 6))
        for c in sorted(MARKOV_CHANNELS)
    ]
    return spark.createDataFrame(
        out,
        "channel string, p_conversion double, removal_effect double, "
        "attribution_share double",
    )


# --------------------------------------------------------------------------
# Heuristic multi-touch attribution: linear / time-decay / position-based
# --------------------------------------------------------------------------
DECAY_HALFLIFE_S = 3600.0


@query(
    "q_attribution_models",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey
      FROM events
    ),
    conv AS (
      SELECT user_id, journey, min(ts) AS conv_ts
      FROM ordered WHERE event_type = 'purchase'
      GROUP BY user_id, journey
    ),
    touches AS (
      SELECT o.user_id, o.journey, o.event_type AS ch,
             epoch_us(c.conv_ts) - epoch_us(o.ts) AS us_before,
             row_number() OVER (PARTITION BY o.user_id, o.journey
                                ORDER BY o.ts, o.event_id) AS pos,
             count(*) OVER (PARTITION BY o.user_id, o.journey) AS n
      FROM ordered o JOIN conv c USING (user_id, journey)
      WHERE o.event_type != 'purchase'
    ),
    credits AS (
      SELECT ch,
             1.0 / n AS linear_c,
             pow(0.5, (us_before / 1000000.0) / {DECAY_HALFLIFE_S})
               / sum(pow(0.5, (us_before / 1000000.0) / {DECAY_HALFLIFE_S}))
                 OVER (PARTITION BY user_id, journey) AS decay_c,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN pos = 1 OR pos = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS position_c
      FROM touches
    )
    SELECT ch AS channel,
           round(sum(linear_c), 6) AS linear_credit,
           round(sum(decay_c), 6) AS time_decay_credit,
           round(sum(position_c), 6) AS position_credit
    FROM credits GROUP BY ch ORDER BY ch
    """,
)
def q_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three standard heuristic multi-touch attribution models in
    one pass over converting journeys (same journey split as
    ``q_markov_attribution``): LINEAR (equal credit per touch),
    TIME-DECAY (exp half-life {DECAY_HALFLIFE_S:.0f}s to conversion,
    normalized per journey), and POSITION-BASED (the 40/20/40
    U-shape). Together with first/last touch and the Markov removal
    effect this is the full attribution shelf an analytics engine
    ships; disagreement BETWEEN models is itself the standard sanity
    readout.

    Hash-exactness: decay weights are deterministic doubles of exact
    integer µs deltas; per-journey normalization divides within the
    partition before any cross-journey sum; final per-channel sums
    carry only reassociation noise under the 6dp rounding.

    Scale: all windows are PARTITIONED by (user, journey); the output
    aggregate is |channels| rows with map-side combine. No window ever
    sees more than one journey.
    """
    e = load_table(spark, sf_dir, "events")
    w_j = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w_j),
            F.lit(0),
        ).alias("journey"),
    )
    conv = (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "journey")
        .agg(F.min("ts").alias("conv_ts"))
    )
    w_uj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    w_ujn = Window.partitionBy("user_id", "journey")
    touches = (
        ordered.filter(F.col("event_type") != "purchase")
        .join(conv, ["user_id", "journey"])
        .select(
            "user_id",
            "journey",
            F.col("event_type").alias("ch"),
            (F.unix_micros("conv_ts") - F.unix_micros("ts")).alias("us_before"),
            F.row_number().over(w_uj).alias("pos"),
            F.count(F.lit(1)).over(w_ujn).alias("n"),
        )
    )
    decay_w = F.pow(0.5, (F.col("us_before") / 1000000.0) / DECAY_HALFLIFE_S)
    credits = touches.select(
        "ch",
        (1.0 / F.col("n")).alias("linear_c"),
        (decay_w / F.sum(decay_w).over(w_ujn)).alias("decay_c"),
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
        .alias("position_c"),
    )
    return (
        credits.groupBy(F.col("ch").alias("channel"))
        .agg(
            F.round(F.sum("linear_c"), 6).alias("linear_credit"),
            F.round(F.sum("decay_c"), 6).alias("time_decay_credit"),
            F.round(F.sum("position_c"), 6).alias("position_credit"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Exact Shapley-value attribution over the touch-set coalition lattice
# --------------------------------------------------------------------------
#: bit position per channel, alphabetical — the coalition lattice is
#: 2^|channels| = 16 masks; exact Shapley is tractable because the
#:  channel DOMAIN is small, never because the corpus is.
SHAPLEY_CHANNELS = MARKOV_CHANNELS  # ("click", "error", "signup", "view")
_SHAPLEY_N = len(SHAPLEY_CHANNELS)
#: |S|!(n-|S|-1)!/n! for n=4 by |S| — exact dyadic/ternary rationals
_SHAPLEY_W = ("0.25", "1.0/12", "1.0/12", "0.25")


def _shapley_bit_sql() -> str:
    return (
        "CASE o.event_type "
        + " ".join(
            f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(SHAPLEY_CHANNELS)
        )
        + " END"
    )


@query(
    "q_shapley_attribution",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey
      FROM events
    ),
    conv AS (
      SELECT DISTINCT user_id, journey FROM ordered
      WHERE event_type = 'purchase'
    ),
    jm AS (
      SELECT c.user_id, c.journey,
             coalesce(bit_or({_shapley_bit_sql()}), 0) AS mask
      FROM conv c LEFT JOIN ordered o
        ON o.user_id = c.user_id AND o.journey = c.journey
           AND o.event_type != 'purchase'
      GROUP BY c.user_id, c.journey
    ),
    mc AS (SELECT mask, CAST(count(*) AS BIGINT) AS conv_n FROM jm GROUP BY mask),
    coal AS (SELECT s FROM generate_series(0, {2**_SHAPLEY_N - 1}) AS t(s)),
    w AS (
      SELECT coal.s, coalesce(sum(mc.conv_n), 0) AS worth
      FROM coal LEFT JOIN mc ON (mc.mask & coal.s) = mc.mask
      GROUP BY coal.s
    ),
    ch AS (
      SELECT * FROM (VALUES {", ".join(f"({i}, '{c}')" for i, c in enumerate(SHAPLEY_CHANNELS))})
        AS v(i, channel)
    ),
    contrib AS (
      SELECT ch.channel,
             CASE ((s.s & 1) + ((s.s >> 1) & 1) + ((s.s >> 2) & 1)
                   + ((s.s >> 3) & 1))
               WHEN 0 THEN {_SHAPLEY_W[0]} WHEN 1 THEN {_SHAPLEY_W[1]}
               WHEN 2 THEN {_SHAPLEY_W[2]} ELSE {_SHAPLEY_W[3]} END
               * (wi.worth - ws.worth) AS part
      FROM ch
        JOIN coal s ON ((s.s >> ch.i) & 1) = 0
        JOIN w wi ON wi.s = (s.s | (1 << ch.i))
        JOIN w ws ON ws.s = s.s
    ),
    span AS (
      SELECT max(CASE WHEN s = {2**_SHAPLEY_N - 1} THEN worth END)
               - max(CASE WHEN s = 0 THEN worth END) AS gain
      FROM w
    )
    SELECT channel,
           round(sum(part), 6) AS shapley_credit,
           round(sum(part) / span.gain, 6) AS share
    FROM contrib, span
    GROUP BY channel, span.gain
    ORDER BY channel
    """,
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution (Shapley 1953; the attribution
    framing of Zhao et al. 2018): a converting journey's touch SET is
    a coalition; the characteristic function w(S) = conversions from
    journeys whose touch set ⊆ S (the cumulative worth — adding
    channels never loses conversions); a channel's credit is its
    exact Shapley value φ_i = Σ_(S∌i) |S|!(n−|S|−1)!/n! ·
    [w(S∪i) − w(S)]. This is the game-theoretic member of the
    attribution shelf — order-blind where Markov is order-aware,
    axiomatic (efficiency: Σφ = w(N) − w(∅)) where the heuristics
    (``q_attribution_models``) are conventions. Journeys that convert
    with NO prior touch sit at mask 0 and cancel out of every
    marginal, exactly as the axioms demand.

    Exactness is affordable because the lattice is over the CHANNEL
    DOMAIN (2^{_SHAPLEY_N} = {2**_SHAPLEY_N} coalitions), never the
    corpus: the corpus collapses to ≤{2**_SHAPLEY_N} (mask, count)
    rows via one bit_or rollup; everything downstream joins
    literal-sized frames. At 100 TB the journey split and the mask
    rollup are the only corpus-scale stages — both map-side-combined
    windows/aggregates partitioned by user. For >≈20 channels exact
    Shapley is infeasible for ANY engine; sample permutations instead.

    Hash-exactness: worths are exact integer sums; the weights are
    exact CASE rationals; φ is a 16-term deterministic double sum,
    6dp-rounded; both engines share the same journey-split window as
    ``q_attribution_models``.
    """
    e = load_table(spark, sf_dir, "events")
    w_j = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.select(
        "user_id",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w_j),
            F.lit(0),
        ).alias("journey"),
    )
    conv = (
        ordered.filter(F.col("event_type") == "purchase")
        .select("user_id", "journey")
        .distinct()
    )
    bit = F.lit(None).cast("long")
    for i, c in enumerate(SHAPLEY_CHANNELS):
        bit = F.when(F.col("event_type") == c, F.lit(1 << i).cast("long")).otherwise(
            bit
        )
    touches = ordered.filter(F.col("event_type") != "purchase").select(
        "user_id", "journey", bit.alias("b")
    )
    jm = (
        conv.join(touches, ["user_id", "journey"], "left")
        .groupBy("user_id", "journey")
        .agg(F.coalesce(F.bit_or("b"), F.lit(0)).alias("mask"))
    )
    mc = jm.groupBy("mask").agg(F.count(F.lit(1)).alias("conv_n"))
    coal = spark.range(2**_SHAPLEY_N).select(F.col("id").alias("s"))
    worth = (
        coal.join(mc, mc["mask"].bitwiseAND(coal["s"]) == mc["mask"], "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv_n"), F.lit(0)).alias("worth"))
    )
    # bit precomputed per channel: Spark's shiftleft/shiftright take a
    # literal shift amount, so carrying 2^i as a column avoids a
    # column-valued shift in the join condition
    ch = spark.createDataFrame(
        [(i, 1 << i, c) for i, c in enumerate(SHAPLEY_CHANNELS)],
        "i int, bit long, channel string",
    )
    popcount = sum(
        (F.shiftright(F.col("s"), j).bitwiseAND(F.lit(1)) for j in range(_SHAPLEY_N)),
        F.lit(0),
    )
    weight = (
        F.when(popcount == 0, 0.25)
        .when(popcount == 1, 1.0 / 12)
        .when(popcount == 2, 1.0 / 12)
        .otherwise(0.25)
    )
    excl = ch.join(coal, coal["s"].bitwiseAND(ch["bit"]) == 0).select(
        "channel", "bit", "s", weight.alias("wt")
    )
    wi = worth.select(F.col("s").alias("s_with"), F.col("worth").alias("worth_with"))
    contrib = (
        excl.withColumn("s_with", F.col("s").bitwiseOR(F.col("bit")))
        .join(wi, "s_with")
        .join(worth, "s")
        .select(
            "channel", (F.col("wt") * (F.col("worth_with") - F.col("worth"))).alias("part")
        )
    )
    span = worth.agg(
        (
            F.max(F.when(F.col("s") == 2**_SHAPLEY_N - 1, F.col("worth")))
            - F.max(F.when(F.col("s") == 0, F.col("worth")))
        ).alias("gain")
    )
    return (
        contrib.groupBy("channel")
        .agg(F.sum("part").alias("credit"))
        .crossJoin(F.broadcast(span))
        .select(
            "channel",
            F.round("credit", 6).alias("shapley_credit"),
            F.round(F.col("credit") / F.col("gain"), 6).alias("share"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard + Greenwood CI for the KM curve
# --------------------------------------------------------------------------
GREENWOOD_Z = 1.959964


@query(
    "q_nelson_aalen",
    oracle=f"""
    WITH horizon AS (SELECT max(epoch_us(ts)) AS h FROM events),
    signup AS (
      SELECT user_id, min(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id, s.s_us, min(epoch_us(e.ts)) AS p_us
      FROM signup s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND epoch_us(e.ts) > s.s_us
      GROUP BY s.user_id, s.s_us
    ),
    obs AS (
      SELECT user_id,
             CASE WHEN p_us IS NOT NULL
                  THEN CAST((p_us - s_us) // 86400000000 AS BIGINT)
                  ELSE CAST((h - s_us) // 86400000000 AS BIGINT) END AS e_day,
             p_us IS NOT NULL AS is_event
      FROM conv, horizon
    ),
    spine AS (SELECT unnest(range(0, {SURVIVAL_WINDOW_DAYS})) AS day),
    km AS (
      SELECT spine.day,
             CAST(count(*) FILTER (o.e_day >= spine.day) AS BIGINT) AS n_at_risk,
             CAST(count(*) FILTER (o.is_event AND o.e_day = spine.day) AS BIGINT)
               AS n_events
      FROM spine CROSS JOIN obs o
      GROUP BY spine.day
    ),
    curve AS (
      SELECT day, n_at_risk, n_events,
             sum(n_events * 1.0 / n_at_risk) OVER w AS cum_hazard,
             CASE WHEN min(1.0 - n_events * 1.0 / n_at_risk) OVER w = 0
                  THEN 0.0
                  ELSE exp(sum(CASE WHEN n_events < n_at_risk
                                    THEN ln(1.0 - n_events * 1.0 / n_at_risk)
                                    END) OVER w) END AS s,
             sum(CASE WHEN n_events < n_at_risk
                      THEN n_events * 1.0
                           / (n_at_risk * (n_at_risk - n_events)) END) OVER w
               AS gw
      FROM km WHERE n_at_risk > 0
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, n_at_risk, n_events,
           round(cum_hazard, 6) AS cum_hazard,
           round(s, 6) AS survival,
           round(s * sqrt(coalesce(gw, 0)), 6) AS greenwood_se,
           round(greatest(s - {GREENWOOD_Z} * s * sqrt(coalesce(gw, 0)), 0.0), 6)
             AS ci_lo,
           round(least(s + {GREENWOOD_Z} * s * sqrt(coalesce(gw, 0)), 1.0), 6)
             AS ci_hi
    FROM curve ORDER BY day
    """,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard Ĥ(d) = Σ d_t/n_t and the
    Greenwood-variance confidence band for the Kaplan-Meier curve
    (Greenwood 1926; Nelson 1972; Aalen 1978) over the same
    signup→first-purchase observation rollup as ``q_survival_curve``
    — the uncertainty layer the point-estimate curve lacks: Var(Ŝ) =
    Ŝ²·Σ d_t/(n_t(n_t−d_t)), linear 95% band clipped to [0,1] (the
    log-log transform is the production variant; the clip is the
    textbook simple band). The hazard is the additive view — it keeps
    accumulating where KM saturates, which is what hazard-ratio
    monitoring dashboards plot.

    Hash-exactness: every running sum is over exact integer at-risk/
    event counts on the bounded {SURVIVAL_WINDOW_DAYS}-day spine (the
    q_survival_curve bounded-window class); total-death days are
    excluded from the Greenwood sum on both engines (the same
    ln-guard pattern as KM itself).

    Scale: identical to q_survival_curve — per-user rollup, scalar
    horizon, |spine|-row window. Nothing here sees raw events twice.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    horizon = e.agg(F.max(us).alias("h"))
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("s_us"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("p_us")
    )
    conv = (
        signup.join(
            purchases,
            (signup.user_id == purchases.user_id) & (F.col("p_us") > F.col("s_us")),
            "left",
        )
        .groupBy(signup.user_id, "s_us")
        .agg(F.min("p_us").alias("p_us"))
    )
    obs = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("p_us").isNotNull(),
            F.floor((F.col("p_us") - F.col("s_us")) / 86_400_000_000),
        )
        .otherwise(F.floor((F.col("h") - F.col("s_us")) / 86_400_000_000))
        .cast("long")
        .alias("e_day"),
        F.col("p_us").isNotNull().alias("is_event"),
    )
    spine = spark.range(0, SURVIVAL_WINDOW_DAYS).select(F.col("id").alias("day"))
    km = (
        F.broadcast(spine)
        .crossJoin(obs)
        .groupBy("day")
        .agg(
            F.count_if(F.col("e_day") >= F.col("day")).alias("n_at_risk"),
            F.count_if(F.col("is_event") & (F.col("e_day") == F.col("day"))).alias(
                "n_events"
            ),
        )
        .filter(F.col("n_at_risk") > 0)
    )
    km = bounded_window_input(km, label="q_nelson_aalen day spine")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    term = F.lit(1.0) - F.col("n_events") / F.col("n_at_risk")
    s = F.when(F.min(term).over(w) == 0, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(F.when(F.col("n_events") < F.col("n_at_risk"), F.log(term))).over(w)
        )
    )
    gw = F.coalesce(
        F.sum(
            F.when(
                F.col("n_events") < F.col("n_at_risk"),
                F.col("n_events")
                / (F.col("n_at_risk") * (F.col("n_at_risk") - F.col("n_events"))),
            )
        ).over(w),
        F.lit(0.0),
    )
    se = s * F.sqrt(gw)
    return (
        km.select(
            "day",
            "n_at_risk",
            "n_events",
            F.round(F.sum(F.col("n_events") / F.col("n_at_risk")).over(w), 6).alias(
                "cum_hazard"
            ),
            F.round(s, 6).alias("survival"),
            F.round(se, 6).alias("greenwood_se"),
            F.round(F.greatest(s - GREENWOOD_Z * se, F.lit(0.0)), 6).alias("ci_lo"),
            F.round(F.least(s + GREENWOOD_Z * se, F.lit(1.0)), 6).alias("ci_hi"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Funnel-stage significance (two-proportion z per stage, per arm)
# --------------------------------------------------------------------------
@query(
    "q_funnel_significance",
    oracle="""
    WITH armed AS (
      SELECT *, CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)),
                         1, 1) < '8' THEN 'A' ELSE 'B' END AS arm
      FROM events
    ),
    s1 AS (
      SELECT user_id, arm, min(ts) AS t1 FROM armed
      WHERE event_type = 'signup' GROUP BY user_id, arm
    ),
    s2 AS (
      SELECT e.user_id, e.arm, min(e.ts) AS t2
      FROM armed e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id, e.arm
    ),
    s3 AS (
      SELECT e.user_id, e.arm, min(e.ts) AS t3
      FROM armed e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id, e.arm
    ),
    counts AS (
      SELECT 'signup_to_click' AS stage,
             (SELECT count(*) FROM s1 WHERE arm = 'A') AS base_a,
             (SELECT count(*) FROM s2 WHERE arm = 'A') AS conv_a,
             (SELECT count(*) FROM s1 WHERE arm = 'B') AS base_b,
             (SELECT count(*) FROM s2 WHERE arm = 'B') AS conv_b
      UNION ALL
      SELECT 'click_to_purchase',
             (SELECT count(*) FROM s2 WHERE arm = 'A'),
             (SELECT count(*) FROM s3 WHERE arm = 'A'),
             (SELECT count(*) FROM s2 WHERE arm = 'B'),
             (SELECT count(*) FROM s3 WHERE arm = 'B')
    )
    SELECT stage,
           CAST(base_a AS BIGINT) AS base_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(base_b AS BIGINT) AS base_b, CAST(conv_b AS BIGINT) AS conv_b,
           round(conv_a * 1.0 / base_a, 6) AS p_a,
           round(conv_b * 1.0 / base_b, 6) AS p_b,
           round(CASE WHEN conv_a + conv_b = 0
                        OR conv_a + conv_b = base_a + base_b THEN NULL
                      ELSE (conv_b * 1.0 / base_b - conv_a * 1.0 / base_a)
                        / sqrt((conv_a + conv_b) * 1.0 / (base_a + base_b)
                           * (1 - (conv_a + conv_b) * 1.0 / (base_a + base_b))
                           * (1.0 / base_a + 1.0 / base_b)) END, 6) AS z
    FROM counts ORDER BY stage
    """,
)
def q_funnel_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per ORDERED funnel stage between the exp7
    arms (pooled-proportion SE, the textbook form): does the B arm
    convert signup→click or click→purchase at a different rate than
    A? This is the statistical gate on top of ``q_funnel_stages``'s
    point rates — funnel dashboards without it flag noise as product
    regressions; with the Wilson interval (``q_wilson_ctr``) and the
    sequential monitors it completes the conversion-stats shelf.
    Stage ordering (each stage strictly after the previous stage's
    first completion) matches q_funnel_stages exactly.

    Hash-exactness: all counts are exact integers from the same
    chained min-aggregate funnel; p's and z are single deterministic
    double expressions, 6dp-rounded.

    Scale: the three funnel stages shuffle (user, arm, one timestamp)
    each, shrinking at every stage; the z arithmetic runs on one
    2-row count frame.
    """
    e = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    armed = e.withColumn("arm", arm)
    s1 = (
        armed.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "arm")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        armed.filter(F.col("event_type") == "click")
        .join(s1.select("user_id", "t1"), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "arm")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        armed.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "arm")
        .agg(F.min("ts").alias("t3"))
    )

    def arm_counts(df: DataFrame, prefix: str) -> DataFrame:
        return df.groupBy().agg(
            F.count_if(F.col("arm") == "A").alias(f"{prefix}_a"),
            F.count_if(F.col("arm") == "B").alias(f"{prefix}_b"),
        )

    c1, c2, c3 = arm_counts(s1, "n1"), arm_counts(s2, "n2"), arm_counts(s3, "n3")
    wide = c1.crossJoin(c2).crossJoin(c3)
    rows = []
    for stage, base_a, conv_a, base_b, conv_b in (
        ("signup_to_click", "n1_a", "n2_a", "n1_b", "n2_b"),
        ("click_to_purchase", "n2_a", "n3_a", "n2_b", "n3_b"),
    ):
        p_a = F.col(conv_a) / F.col(base_a)
        p_b = F.col(conv_b) / F.col(base_b)
        pooled = (F.col(conv_a) + F.col(conv_b)) / (F.col(base_a) + F.col(base_b))
        # degenerate stages (0% or 100% pooled conversion) have SE = 0:
        # NULL z on both engines instead of an ANSI divide-by-zero
        z = F.when(
            (F.col(conv_a) + F.col(conv_b) > 0)
            & (F.col(conv_a) + F.col(conv_b) < F.col(base_a) + F.col(base_b)),
            (p_b - p_a)
            / F.sqrt(
                pooled * (1 - pooled) * (1.0 / F.col(base_a) + 1.0 / F.col(base_b))
            ),
        )
        rows.append(
            wide.select(
                F.lit(stage).alias("stage"),
                F.col(base_a).alias("base_a"),
                F.col(conv_a).alias("conv_a"),
                F.col(base_b).alias("base_b"),
                F.col(conv_b).alias("conv_b"),
                F.round(p_a, 6).alias("p_a"),
                F.round(p_b, 6).alias("p_b"),
                F.round(z, 6).alias("z"),
            )
        )
    return rows[0].unionAll(rows[1]).orderBy("stage")


# --------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue per user by cohort age)
# --------------------------------------------------------------------------
@query(
    "q_cohort_ltv",
    oracle="""
    WITH first_signup AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS c_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohorts AS (
      SELECT user_id, c_day,
             CAST(date_trunc('week', c_day) AS DATE) AS cohort_week
      FROM first_signup
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
      FROM cohorts GROUP BY cohort_week
    ),
    rev AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.c_day, CAST(e.ts AS DATE)) // 7 AS BIGINT)
               AS age_week,
             sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS cents
      FROM events e JOIN cohorts c USING (user_id)
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= c.c_day
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_week, age_week,
             sum(cents) OVER (PARTITION BY cohort_week ORDER BY age_week
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_cents
      FROM rev
    )
    SELECT c.cohort_week, c.age_week, s.n_users,
           round(c.cum_cents / 100.0 / s.n_users, 6) AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, age_week
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per user by
    signup-week cohort and cohort AGE (weeks since each user's own
    first signup) — the companion of ``q_cohort_retention`` on the
    revenue axis, and the standard payback/LTV artifact every
    subscription analytics stack ships. Ages are user-relative (not
    calendar-relative), so late joiners in a week don't smear the
    curve; revenue before the first signup is excluded.

    Hash-exactness: per-(cohort, age) revenue is exact integer cents;
    the cumulative window partitions by cohort over the tiny
    (cohort × age) rollup; the per-user division happens once at
    output against the exact cohort size.

    Scale: per-user first-signup is one rollup; purchase revenue
    joins the (user → cohort) map and collapses to |cohorts|×|ages|
    rows BEFORE any window. No per-user window, no event
    materialization.
    """
    e = load_table(spark, sf_dir, "events")
    first_signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("c_day"))
    )
    cohorts = first_signup.select(
        "user_id", "c_day", F.date_trunc("week", "c_day").cast("date").alias("cohort_week")
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .filter(F.to_date("ts") >= F.col("c_day"))
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.to_date("ts"), F.col("c_day")) / 7)
            .cast("long")
            .alias("age_week"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.select(
            "cohort_week", "age_week", F.sum("cents").over(w).alias("cum_cents")
        )
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "n_users",
            F.round(F.col("cum_cents") / 100.0 / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "age_week")
    )


# --------------------------------------------------------------------------
# Weibull plot fit over the Kaplan-Meier curve
# --------------------------------------------------------------------------
# reuse the registered KM oracle verbatim as a CTE body so the two
# queries can never drift apart (package-internal registry access,
# resolved at import time after q_survival_curve's decorator ran)
from mi_inbound_pulsar_spark.operators import _ORACLES as _REGISTERED_ORACLES

_SURV_SQL = _REGISTERED_ORACLES["q_survival_curve"]


@query(
    "q_weibull_plot_fit",
    oracle=f"""
    WITH surv AS ({_SURV_SQL}),
    pts AS (
      SELECT ln(CAST(day AS DOUBLE)) AS x, ln(-ln(survival)) AS y
      FROM surv WHERE day >= 1 AND survival > 0 AND survival < 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pts
    ),
    fit AS (
      SELECT n,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS k,
             sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n
               AS icept,
             pow(sxy - sx * sy / n, 2)
               / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
      FROM m
    )
    SELECT n AS n_points,
           round(k, 6) AS shape_k,
           round(exp(-icept / k), 6) AS scale_lambda,
           round(r2, 6) AS r2,
           round(exp(-icept / k) * pow(ln(2.0), 1 / k), 6)
             AS median_days
    FROM fit
    """,
)
def q_weibull_plot_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull probability-plot fit (the classical graphical estimator,
    Nelson 1982 ch.3) over the signup→purchase Kaplan-Meier curve:
    S(t) = exp(−(t/λ)^k) linearizes to ln(−ln S) = k·ln t − k·ln λ, so
    one closed-form OLS on the (ln day, ln(−ln S)) points gives the
    shape k (k<1 = conversion hazard FALLS with tenure — convert-fast-
    or-never; k>1 = wear-in), the scale λ, and the parametric median
    time-to-convert λ·ln2^(1/k) — the smooth summary the stepwise KM
    curve can't extrapolate from. Consumes the 6dp-rounded KM output,
    so both engines fit IDENTICAL points (the oracle embeds the
    registered q_survival_curve SQL verbatim — they cannot drift).

    Scale: the KM rollup is the work (see q_survival_curve); the fit
    adds one aggregate over ≤{SURVIVAL_WINDOW_DAYS} points.
    """
    surv = q_survival_curve(spark, sf_dir)
    pts = surv.filter(
        (F.col("day") >= 1) & (F.col("survival") > 0) & (F.col("survival") < 1)
    ).select(
        F.log(F.col("day").cast("double")).alias("x"),
        F.log(-F.log("survival")).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nn = F.col("n")
    k = (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nn
    )
    fit = m.select(
        "n",
        k.alias("k"),
        (F.col("sy") / nn - k * F.col("sx") / nn).alias("icept"),
        (
            F.pow(F.col("sxy") - F.col("sx") * F.col("sy") / nn, F.lit(2.0))
            / (
                (F.col("sxx") - F.col("sx") * F.col("sx") / nn)
                * (F.col("syy") - F.col("sy") * F.col("sy") / nn)
            )
        ).alias("r2"),
    )
    lam = F.exp(-F.col("icept") / F.col("k"))
    return fit.select(
        F.col("n").cast("long").alias("n_points"),
        F.round("k", 6).alias("shape_k"),
        F.round(lam, 6).alias("scale_lambda"),
        F.round("r2", 6).alias("r2"),
        F.round(
            lam * F.pow(F.log(F.lit(2.0)), 1 / F.col("k")), 6
        ).alias("median_days"),
    )


# --------------------------------------------------------------------------
# Multi-feature drift report: PSI + JS per feature between corpus halves
# --------------------------------------------------------------------------
DRIFT_PSI_FLAG = 0.1  # the industry "investigate" threshold


@query(
    "q_feature_drift_report",
    oracle=f"""
    WITH long AS (
      SELECT doc_id % 2 AS split, 'lang' AS feature, lang AS value
      FROM documents
      UNION ALL
      SELECT doc_id % 2, 'source', source FROM documents
      UNION ALL
      SELECT doc_id % 2, 'len_band', CAST(n_chars // 100 AS VARCHAR)
      FROM documents
    ),
    cell AS (
      SELECT feature, value,
             CAST(count(*) FILTER (split = 0) AS BIGINT) AS c0,
             CAST(count(*) FILTER (split = 1) AS BIGINT) AS c1
      FROM long GROUP BY 1, 2
    ),
    tot AS (
      SELECT feature, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1
      FROM cell GROUP BY feature
    ),
    sm AS (
      SELECT c.feature,
             (c.c0 + 0.5) / (t.n0 + 0.5 * t.k) AS p,
             (c.c1 + 0.5) / (t.n1 + 0.5 * t.k) AS q,
             t.k
      FROM cell c JOIN tot t ON t.feature = c.feature
    )
    SELECT feature, CAST(max(k) AS BIGINT) AS n_values,
           round(sum((p - q) * ln(p / q)), 6) AS psi,
           round(sum(0.5 * p * ln(p / ((p + q) / 2))
                     + 0.5 * q * ln(q / ((p + q) / 2))), 6)
             AS js_divergence,
           sum((p - q) * ln(p / q)) >= {DRIFT_PSI_FLAG} AS drift_flag
    FROM sm GROUP BY feature ORDER BY feature
    """,
)
def q_feature_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature drift report: PSI and Jensen-Shannon divergence
    per feature (lang, source, 100-char length band) between the two
    doc_id-parity corpus halves, with the industry PSI ≥
    {DRIFT_PSI_FLAG} investigate flag — the TABLE-level monitoring
    sweep that generalizes q_psi_drift's single-metric check to every
    schema column at once, which is what a nightly curation pipeline
    actually schedules (one report row per feature, not one query per
    feature). Laplace-0.5 smoothing keeps empty cells finite in both
    engines identically.

    Scale: each feature contributes one map-side-combined rollup to
    its value domain; the union is |features| such rollups — the
    report costs one corpus pass per feature column regardless of
    corpus size, and the final aggregate runs on Σ|domains| rows.
    """
    d = load_table(spark, sf_dir, "documents")
    split = (F.col("doc_id") % 2).alias("split")
    long = (
        d.select(split, F.lit("lang").alias("feature"), F.col("lang").alias("value"))
        .unionByName(
            d.select(
                split, F.lit("source").alias("feature"),
                F.col("source").alias("value"),
            )
        )
        .unionByName(
            d.select(
                split,
                F.lit("len_band").alias("feature"),
                F.expr("CAST(n_chars DIV 100 AS STRING)").alias("value"),
            )
        )
    )
    cell = long.groupBy("feature", "value").agg(
        F.count_if(F.col("split") == 0).alias("c0"),
        F.count_if(F.col("split") == 1).alias("c1"),
    )
    tot = cell.groupBy("feature").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
    )
    sm = cell.join(F.broadcast(tot), "feature").select(
        "feature",
        ((F.col("c0") + 0.5) / (F.col("n0") + 0.5 * F.col("k"))).alias("p"),
        ((F.col("c1") + 0.5) / (F.col("n1") + 0.5 * F.col("k"))).alias("q"),
        "k",
    )
    m = (F.col("p") + F.col("q")) / 2
    psi = F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
    return (
        sm.groupBy("feature")
        .agg(
            F.max("k").cast("long").alias("n_values"),
            F.round(psi, 6).alias("psi"),
            F.round(
                F.sum(
                    0.5 * F.col("p") * F.log(F.col("p") / m)
                    + 0.5 * F.col("q") * F.log(F.col("q") / m)
                ),
                6,
            ).alias("js_divergence"),
            (psi >= DRIFT_PSI_FLAG).alias("drift_flag"),
        )
        .orderBy("feature")
    )


# --------------------------------------------------------------------------
# A-priori association rules: brand-level 3-itemsets with pair-pruned
# candidate generation
# --------------------------------------------------------------------------
RULES_MIN_SUPPORT = 0.002  # triple must appear in >= 0.2% of baskets
RULES_TOP_K = 15


@query(
    "q_association_rules",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    brand AS (SELECT p_brand, count(*) AS n_c FROM items GROUP BY 1),
    pairs AS (
      SELECT a.p_brand AS p1, b.p_brand AS p2, count(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    ),
    freq_pairs AS (
      SELECT p1, p2, n_ab FROM pairs, n
      WHERE n_ab >= {RULES_MIN_SUPPORT} * n.n_orders
    ),
    triples AS (
      SELECT fp.p1, fp.p2, c.p_brand AS p3, count(*) AS n_abc,
             max(fp.n_ab) AS n_ab
      FROM freq_pairs fp
      JOIN items a ON a.p_brand = fp.p1
      JOIN items b ON b.l_orderkey = a.l_orderkey AND b.p_brand = fp.p2
      JOIN items c ON c.l_orderkey = a.l_orderkey AND c.p_brand > fp.p2
      GROUP BY 1, 2, 3
    ),
    rules AS (
      SELECT t.p1, t.p2, t.p3,
             CAST(t.n_abc AS BIGINT) AS n_abc,
             CAST(t.n_abc AS DOUBLE) / n.n_orders AS support,
             CAST(t.n_abc AS DOUBLE) / t.n_ab AS confidence,
             CAST(t.n_abc AS DOUBLE) * n.n_orders / (t.n_ab * br.n_c)
               AS lift
      FROM triples t JOIN brand br ON br.p_brand = t.p3, n
      WHERE t.n_abc >= {RULES_MIN_SUPPORT} * n.n_orders
    )
    SELECT p1 AS antecedent_1, p2 AS antecedent_2, p3 AS consequent,
           n_abc, round(support, 6) AS support,
           round(confidence, 6) AS confidence, round(lift, 6) AS lift
    FROM rules
    ORDER BY lift DESC, p1, p2, p3 LIMIT {RULES_TOP_K}
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori association rules (Agrawal & Srikant 1994) at the
    BRAND level: rules {{b₁,b₂}} → b₃ with support, confidence and
    lift, where candidate 3-itemsets are generated ONLY by extending
    pairs that already cleared the support floor — the a-priori
    downward-closure prune that keeps candidate generation from
    enumerating the k-itemset lattice. Brand (25 values) rather than
    partkey keeps the itemset domain scale-invariant, the reason
    ``q_basket_lift``'s partkey pairs go sparse at sf0.1 while these
    rules stay populated.

    Scale: baskets collapse to per-order sorted brand arrays in ONE
    collect_set aggregate (part dim broadcast); pair counts are a
    narrow C(k,2) array-combination explode of the cached basket frame
    (fan-out bounded by per-basket brand count — the same bound the
    old basket-keyed self-join had, minus its shuffle); the triple
    extension broadcast-joins the FREQUENT-pair list to the exploded
    pairs and extends with an array filter, so its fan-out is
    |frequent pairs| × basket size, not brands³. Top-k by lift is a
    sort over the ≤C(25,3) rule table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # Basket posting lists (round 13, the copurchase_pairs pattern):
    # ONE collect_set aggregate replaces the old distinct + basket-
    # keyed self-join + three-way triple join. Each basket collapses
    # to its sorted distinct-brand array in a single exchange
    # (collect_set dedups, so the separate distinct shuffle is gone);
    # pairs and a-priori triple extensions are then *narrow* array-
    # combination explodes over the cached basket frame — no join ever
    # touches a basket-keyed shuffle again. Fan-out parallelism pinned
    # at defaultParallelism before the aggregate (the round-12 posting-
    # list rule: AQE coalesces the exchange by the basket frame's
    # bytes and cannot see the C(k,2)-per-row explode behind it).
    # Scale: the explode fan-out is Σ C(brands-per-basket, 2), bounded
    # by basket size — the same bound the old self-join had — and the
    # triple extension only fans out for baskets holding a FREQUENT
    # pair (broadcast hash join on the ≤C(25,2) frequent-pair list).
    baskets = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_brand")
        .repartition(fanout_partitions(spark), "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    brand = (
        baskets.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    # ordered brand pairs per basket: C(k,2) structs from the sorted
    # array — identical multiset to the old (a.brand < b.brand)
    # self-join because brands are distinct within a basket
    br = F.col("brands")
    k = F.size(br)
    pair_structs = F.when(
        k >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), k - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, k - 1),
                    lambda j: F.struct(
                        F.get(br, i).alias("p1"), F.get(br, j).alias("p2")
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<p1:string,p2:string>>"))
    bp = baskets.select(F.explode(pair_structs).alias("pp"), "brands").select(
        F.col("pp.p1").alias("p1"), F.col("pp.p2").alias("p2"), "brands"
    )
    pairs = bp.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("n_ab"))
    freq_pairs = pairs.crossJoin(F.broadcast(n)).filter(
        F.col("n_ab") >= RULES_MIN_SUPPORT * F.col("n_orders")
    )
    # a-priori triple extension: baskets containing a frequent pair
    # (p1, p2) extend by every basket brand p3 > p2 — the same rows as
    # the old ia⋈ib⋈ic per-basket enumeration (brands are distinct per
    # basket, so each (basket, fp, p3) contributed exactly one row)
    triples = (
        bp.join(
            F.broadcast(freq_pairs.select("p1", "p2", "n_ab")), ["p1", "p2"]
        )
        .select(
            "p1",
            "p2",
            "n_ab",
            F.explode(
                F.filter("brands", lambda x: x > F.col("p2"))
            ).alias("p3"),
        )
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("n_abc"), F.max("n_ab").alias("n_ab"))
    )
    rules = (
        triples.crossJoin(F.broadcast(n))
        .filter(F.col("n_abc") >= RULES_MIN_SUPPORT * F.col("n_orders"))
        .join(
            F.broadcast(brand.select(F.col("p_brand").alias("p3"), "n_c")),
            "p3",
        )
        .select(
            F.col("p1").alias("antecedent_1"),
            F.col("p2").alias("antecedent_2"),
            F.col("p3").alias("consequent"),
            F.col("n_abc").cast("long").alias("n_abc"),
            F.round(
                F.col("n_abc").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(F.col("n_abc").cast("double") / F.col("n_ab"), 6).alias(
                "confidence"
            ),
            (
                F.col("n_abc").cast("double")
                * F.col("n_orders")
                / (F.col("n_ab") * F.col("n_c"))
            ).alias("lift_raw"),
        )
    )
    rules = bounded_window_input(rules, label="q_association_rules rule table")
    out = (
        rules.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(
                    F.desc("lift_raw"),
                    "antecedent_1",
                    "antecedent_2",
                    "consequent",
                )
            ),
        )
        .filter(F.col("rk") <= RULES_TOP_K)
        .select(
            "antecedent_1",
            "antecedent_2",
            "consequent",
            "n_abc",
            "support",
            "confidence",
            F.round("lift_raw", 6).alias("lift"),
        )
    )
    # the basket frame feeds four plan branches (n, brand counts, the
    # pair explode, the triple explode) — leak-safe scoped persist
    return retain(out, baskets)


# --------------------------------------------------------------------------
# Aalen-Johansen cumulative incidence under competing risks
# --------------------------------------------------------------------------
@query(
    "q_cumulative_incidence",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(epoch_us(ts)) AS t0,
             min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
               AS tp,
             min(epoch_us(ts)) FILTER (WHERE event_type = 'error') AS te,
             max(epoch_us(ts)) AS t_last
      FROM events GROUP BY 1
    ),
    obs AS (
      SELECT CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                 THEN (tp - t0) // 86400000000
               WHEN te IS NOT NULL THEN (te - t0) // 86400000000
               ELSE (t_last - t0) // 86400000000 END AS time,
             CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                 THEN 'purchase'
               WHEN te IS NOT NULL THEN 'error'
               ELSE 'censored' END AS cause
      FROM per_user
    ),
    roll AS (
      SELECT time,
             count(*) FILTER (WHERE cause = 'purchase') AS d_p,
             count(*) FILTER (WHERE cause = 'error') AS d_e,
             count(*) AS leave_cnt
      FROM obs GROUP BY 1
    ),
    cum AS (
      SELECT time, d_p, d_e,
             sum(leave_cnt) OVER () 
               - coalesce(sum(leave_cnt) OVER (ORDER BY time
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM roll
    ),
    surv AS (
      SELECT time, d_p, d_e, n_risk,
             exp(coalesce(sum(ln(greatest(
                   CAST(n_risk - d_p - d_e AS DOUBLE) / n_risk, 1e-300)))
                 OVER (ORDER BY time
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)) AS s_minus
      FROM cum
    )
    SELECT CAST(time AS BIGINT) AS day,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_p AS BIGINT) AS d_purchase,
           CAST(d_e AS BIGINT) AS d_error,
           round(sum(s_minus * d_p / n_risk)
                 OVER (ORDER BY time), 6) AS cif_purchase,
           round(sum(s_minus * d_e / n_risk)
                 OVER (ORDER BY time), 6) AS cif_error
    FROM surv ORDER BY day
    """,
)
def q_cumulative_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions under COMPETING
    risks: per user, the first purchase and the first error race from
    the user's first event; CIF_k(t) = Σ_{s≤t} Ŝ(s−)·d_k(s)/n(s) with
    Ŝ the all-cause Kaplan-Meier — the estimator that 1−KM-per-cause
    gets WRONG (it over-counts by treating the competing event as
    independent censoring; the two CIFs here sum to at most 1−Ŝ by
    construction). Completes the survival shelf next to
    ``q_survival_curve`` / ``q_nelson_aalen`` / ``q_logrank_test``.

    Hash-exactness: Ŝ(s−) is exp(running sum of ln terms) — both
    engines accumulate the SAME ordered left-to-right window sum, so
    the float sequence is identical; the (n−d)/n ratio is clamped at
    1e-300 so a final time that exhausts the risk set cannot produce
    an engine-specific ln(0).

    Scale: the corpus collapses to one per-user aggregate (first/last
    event times), then to the day-domain rollup; the KM product and
    both CIFs are guarded ordered windows over that rollup.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = e.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
        F.min(F.when(F.col("event_type") == "error", us)).alias("te"),
        F.max(us).alias("t_last"),
    )
    us_day = 86_400_000_000
    is_p = F.col("tp").isNotNull() & (
        F.col("te").isNull() | (F.col("tp") <= F.col("te"))
    )
    obs = per_user.select(
        F.when(is_p, F.floor((F.col("tp") - F.col("t0")) / us_day))
        .when(
            F.col("te").isNotNull(),
            F.floor((F.col("te") - F.col("t0")) / us_day),
        )
        .otherwise(F.floor((F.col("t_last") - F.col("t0")) / us_day))
        .alias("time"),
        F.when(is_p, F.lit("purchase"))
        .when(F.col("te").isNotNull(), F.lit("error"))
        .otherwise(F.lit("censored"))
        .alias("cause"),
    )
    roll = obs.groupBy("time").agg(
        F.count_if(F.col("cause") == "purchase").alias("d_p"),
        F.count_if(F.col("cause") == "error").alias("d_e"),
        F.count(F.lit(1)).alias("leave_cnt"),
    )
    roll = bounded_window_input(roll, label="q_cif day rollup")
    wb = Window.orderBy("time").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("time").rowsBetween(Window.unboundedPreceding, 0)
    cum = roll.select(
        "time",
        "d_p",
        "d_e",
        (
            F.sum("leave_cnt").over(Window.partitionBy())
            - F.coalesce(F.sum("leave_cnt").over(wb), F.lit(0))
        ).alias("n_risk"),
    )
    log_term = F.log(
        F.greatest(
            (F.col("n_risk") - F.col("d_p") - F.col("d_e")).cast("double")
            / F.col("n_risk"),
            F.lit(1e-300),
        )
    )
    surv = cum.withColumn(
        "s_minus",
        F.exp(F.coalesce(F.sum(log_term).over(wb), F.lit(0.0))),
    )
    return surv.select(
        F.col("time").cast("long").alias("day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_p").cast("long").alias("d_purchase"),
        F.col("d_e").cast("long").alias("d_error"),
        F.round(
            F.sum(F.col("s_minus") * F.col("d_p") / F.col("n_risk")).over(wc),
            6,
        ).alias("cif_purchase"),
        F.round(
            F.sum(F.col("s_minus") * F.col("d_e") / F.col("n_risk")).over(wc),
            6,
        ).alias("cif_error"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Markov entropy rate of the per-user event-type process
# --------------------------------------------------------------------------
@query(
    "q_markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    bi AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM bi),
    h12 AS (
      SELECT -sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h
      FROM bi, tot
    ),
    m1 AS (
      SELECT cur, sum(c) AS c1 FROM bi GROUP BY cur
    ),
    h1 AS (
      SELECT -sum((CAST(c1 AS DOUBLE) / n) * ln(CAST(c1 AS DOUBLE) / n)) AS h
      FROM m1, tot
    ),
    m2 AS (
      SELECT nxt, sum(c) AS c2 FROM bi GROUP BY nxt
    ),
    h2 AS (
      SELECT -sum((CAST(c2 AS DOUBLE) / n) * ln(CAST(c2 AS DOUBLE) / n)) AS h
      FROM m2, tot
    )
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_transitions,
           round((SELECT h FROM h1), 6) AS h_marginal,
           round((SELECT h FROM h12), 6) AS h_joint,
           round((SELECT h FROM h12) - (SELECT h FROM h1), 6)
             AS entropy_rate,
           round((SELECT h FROM h1) + (SELECT h FROM h2)
                 - (SELECT h FROM h12), 6) AS mutual_information
    """,
)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type process: H(X₂|X₁) =
    H(X₁,X₂) − H(X₁) over consecutive-event bigrams — how many nats of
    surprise the NEXT action carries once you know the current one —
    plus the mutual information I(X₁;X₂) (its complement: how much the
    current action predicts). The information-theoretic summary of the
    transition matrix ``q_markov_transitions`` materializes row by
    row: I ≈ 0 says the chain is near-i.i.d. and Markov attribution
    models are fitting noise.

    Scale: bigrams are user-partitioned lead windows (never global);
    all three entropies reduce over the 5×5 type-pair domain.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    bi = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    tot = bi.agg(F.sum("c").alias("n"))
    bi_n = bi.crossJoin(F.broadcast(tot))
    p = F.col("c").cast("double") / F.col("n")
    h12 = bi_n.agg((-F.sum(p * F.log(p))).alias("h12"))
    m1 = (
        bi.groupBy("cur")
        .agg(F.sum("c").alias("c1"))
        .crossJoin(F.broadcast(tot))
    )
    p1 = F.col("c1").cast("double") / F.col("n")
    h1 = m1.agg((-F.sum(p1 * F.log(p1))).alias("h1"))
    m2 = (
        bi.groupBy("nxt")
        .agg(F.sum("c").alias("c2"))
        .crossJoin(F.broadcast(tot))
    )
    p2 = F.col("c2").cast("double") / F.col("n")
    h2 = m2.agg((-F.sum(p2 * F.log(p2))).alias("h2"))
    out = (
        tot.crossJoin(F.broadcast(h12))
        .crossJoin(F.broadcast(h1))
        .crossJoin(F.broadcast(h2))
    )
    return out.select(
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("h1"), 6).alias("h_marginal"),
        F.round(F.col("h12"), 6).alias("h_joint"),
        F.round(F.col("h12") - F.col("h1"), 6).alias("entropy_rate"),
        F.round(
            F.col("h1") + F.col("h2") - F.col("h12"), 6
        ).alias("mutual_information"),
    )
