"""Window functions (SURVEY.md §2B): ranking, analytic, frames, top-k.

Scale note common to all: a window spec with ``partitionBy`` shuffles
once on the partition key and sorts within partitions — no global sort.
Skewed partition keys (one giant customer) are the risk at 100 TB; the
top-k pattern below bounds per-group output, and AQE skew handling
splits oversized shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking functions over a per-customer window.

    The ORDER BY includes o_orderkey as a tiebreaker so row_number is
    deterministic (required for oracle hashing).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                        AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first / last over an ordered per-customer window.

    last_value uses an explicit unbounded frame — the default frame
    (RANGE UNBOUNDED PRECEDING..CURRENT ROW) would return the current
    row in both engines, which is a trap, not a test.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "q_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg_3,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighbors
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS BETWEEN frames: running total, moving average, sliding count."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
                "running_total"
            ),
            F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg_3"),
            F.count(F.lit(1)).over(w.rowsBetween(-1, 1)).alias("neighbors"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT user_id, event_id, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY value
                                  RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW), 2)
               AS sum_within_5
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY user_id, value, event_id
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN (value-based) frame: sum of values within 5.0 below.

    PySpark's ``Window.rangeBetween`` only takes integer offsets, so the
    fractional frame is expressed as a SQL window expression (same
    Catalyst plan as the Scala ``rangeBetween(lit(-5.0), ...)``).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .selectExpr(
            "user_id",
            "event_id",
            "value",
            "round(sum(value) OVER (PARTITION BY user_id ORDER BY value "
            "RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW), 2) AS sum_within_5",
        )
        .orderBy("user_id", "value", "event_id")
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           nth_value(s_suppkey, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_richest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_nationkey, pct_rank, s_suppkey
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist, nth_value
    (explicit full frame so both engines see the whole partition)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.select(
            "s_nationkey",
            "s_suppkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.nth_value("s_suppkey", 2).over(w_full).alias("second_richest"),
        )
        .orderBy("s_nationkey", "pct_rank", "s_suppkey")
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation.

    Scale: row_number + filter is the canonical distributed top-k —
    one shuffle on the group key, per-partition sort, early filter.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


@query(
    "q_window_time_range",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER w AS n_trailing_1h,
           round(sum(value) OVER w, 2) AS val_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling metrics per user — the event-time RANGE
    frame (every row sees its own look-back window, unlike tumbling
    buckets). Ordered on microsecond epoch so the frame bound is an
    exact integer in both engines; frame aggregation order is fixed by
    the frame itself, so the rounded sum is engine-stable.

    Scale: one shuffle on user_id; the frame scan is a sliding pointer
    over the sorted partition (O(n) per key), not a per-row rescan.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
            F.round(F.sum("value").over(w), 2).alias("val_trailing_1h"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_time_rollup_pyramid",
    oracle="""
    SELECT event_type,
           CASE WHEN hour_ts IS NULL THEN 'day' ELSE 'hour' END AS level,
           coalesce(hour_ts, day_ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM (
      SELECT event_type, value,
             date_trunc('day', ts)  AS day_ts,
             date_trunc('hour', ts) AS hour_ts
      FROM events
    )
    GROUP BY GROUPING SETS ((event_type, day_ts), (event_type, hour_ts))
    ORDER BY event_type, level, bucket_ts
    """,
)
def q_time_rollup_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pyramid: hourly AND daily rollups of the
    event stream in ONE pass via GROUPING SETS (an Expand node feeds
    both granularities into a single shuffle) — the hypertable
    downsampling pattern without materializing each level separately.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_pyr")
    return spark.sql(
        """
        SELECT event_type,
               CASE WHEN hour_ts IS NULL THEN 'day' ELSE 'hour' END AS level,
               coalesce(hour_ts, day_ts) AS bucket_ts,
               count(*) AS n,
               round(sum(value), 2) AS total
        FROM (
          SELECT event_type, value,
                 date_trunc('day', ts)  AS day_ts,
                 date_trunc('hour', ts) AS hour_ts
          FROM events_pyr
        )
        GROUP BY GROUPING SETS ((event_type, day_ts), (event_type, hour_ts))
        ORDER BY event_type, level, bucket_ts
        """
    )


@query(
    "q_gap_fill_locf",
    oracle="""
    WITH sparse AS (
      SELECT event_type, date_trunc('day', ts) AS day, round(sum(value), 2) AS day_total
      FROM events WHERE value > 480
      GROUP BY event_type, date_trunc('day', ts)
    ),
    bounds AS (
      SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi FROM events
    ),
    spine AS (
      SELECT t.event_type, d.day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds) d
    )
    SELECT s.event_type, s.day,
           sp.day_total IS NOT NULL AS observed,
           last_value(sp.day_total IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_total
    FROM spine s LEFT JOIN sparse sp ON s.event_type = sp.event_type AND s.day = sp.day
    ORDER BY s.event_type, s.day
    """,
)
def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward: a complete
    daily spine per event type (generated with ``sequence``, no
    recursion), sparse observations left-joined in, gaps filled by
    ``last(ignoreNulls)`` over the time order — the time-series
    interpolation operator (TimescaleDB ``locf``/``time_bucket_gapfill``
    shape) on plain window functions.

    Scale: the spine is |types| × |days| — tiny relative to the events
    it summarizes; the only heavy step is the pre-aggregated sparse
    daily rollup (partial agg), and the fill is one window per type.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    sparse = (
        e.filter(F.col("value") > 480)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("day_total"))
    )
    bounds = e.agg(
        F.min(F.date_trunc("day", "ts")).alias("lo"), F.max(F.date_trunc("day", "ts")).alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    spine = e.select("event_type").distinct().crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(sparse, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.col("day_total").isNotNull().alias("observed"),
            F.last("day_total", ignorenulls=True).over(w).alias("filled_total"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "q_anomaly_trailing",
    oracle="""
    WITH scored AS (
      SELECT event_id, user_id, value,
             avg(value)         OVER w AS mu,
             stddev_samp(value) OVER w AS sigma,
             count(*)           OVER w AS n_prior
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, round(value, 2) AS value,
           n_prior >= 30 AND value > mu + 3 * sigma AS is_anomaly
    FROM scored ORDER BY event_id
    """,
)
def q_anomaly_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flag: an event is anomalous when its
    value exceeds mean + 3σ of the previous 100 events of its type
    (warm-up guarded at 30 priors) — the rolling-baseline monitor an
    ingest pipeline runs on every metric stream.

    Window-frame aggregates are computed in frame order (not partial
    aggregation), so the float mean/σ are deterministic and the
    boolean flag is oracle-exact. One shuffle on event_type; in
    streaming the same logic runs per micro-batch against a rolling
    state table.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            (
                (F.count(F.lit(1)).over(w) >= 30)
                & (F.col("value") > F.avg("value").over(w) + 3 * F.stddev_samp("value").over(w))
            ).alias("is_anomaly"),
        )
        .orderBy("event_id")
    )


@query(
    "q_window_ignore_nulls",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id, event_id, round(v, 6) AS v,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6) AS prev_nn,
           round(first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 6) AS next_nn,
           round(coalesce(v, last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 6) AS filled
    FROM v
    ORDER BY user_id, event_id
    """,
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytic surface: previous / next non-null value
    and row-level LOCF fill over a per-user ordered stream with
    deterministic synthetic gaps (error events null their value —
    the sensor-dropout shape). ``last``/``first`` with
    ``ignorenulls=True`` over one-sided frames — the exact semantics
    SQL spells ``lag(v IGNORE NULLS)`` — all sharing a single
    (user_id) partitioning, so Catalyst plans ONE Exchange for the
    three window expressions.

    Complements ``q_gap_fill_locf`` (spine-join gap fill at
    aggregate grain): this is the row-grain function surface.
    """
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_nn = F.last(F.col("v"), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_nn = F.first(F.col("v"), ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        e.select("user_id", "event_id", "ts", v.alias("v"))
        .select(
            "user_id",
            "event_id",
            F.round("v", 6).alias("v_out"),
            F.round(prev_nn, 6).alias("prev_nn"),
            F.round(next_nn, 6).alias("next_nn"),
            F.round(F.coalesce(F.col("v"), prev_nn), 6).alias("filled"),
        )
        .withColumnRenamed("v_out", "v")
        .orderBy("user_id", "event_id")
    )


@query(
    "q_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
               AS total_micro
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, total_micro,
           round(CAST(quantile_cont(total_micro, 0.5) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
             AS rolling_median_7d,
           round(CAST(quantile_cont(total_micro, 0.9) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
             AS rolling_p90_7d
    FROM daily
    ORDER BY event_type, day
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trailing-7-row median and p90 per series — the robust
    moving-average replacement every monitoring stack wants (one
    outlier day cannot drag a median the way it drags a mean, cf. the
    3-sigma charts in ``q_anomaly_trailing``). Exact interpolated
    percentiles (Spark ``percentile`` ≙ DuckDB ``quantile_cont``)
    evaluated as **window aggregates over a ROWS frame**.

    Scale: the window runs on the per-(type, day) rollup — types×days
    rows, shrunk from raw events by the first aggregate — partitioned
    by series, so no global sort anywhere. The frame holds ≤7 values
    per evaluation; inputs are exact integer micro-units so the only
    float is the interpolation itself, identical in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(micro).alias("total_micro")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "event_type",
            "day",
            "total_micro",
            # round to 6dp (repo convention for float outputs) so the
            # hash match pins OUR rounding rule, not the engines'
            # bit-identical-lerp coincidence
            F.round(F.percentile("total_micro", F.lit(0.5)).over(w), 6).alias(
                "rolling_median_7d"
            ),
            F.round(F.percentile("total_micro", F.lit(0.9)).over(w), 6).alias(
                "rolling_p90_7d"
            ),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Autocorrelation function (ACF) per series
# --------------------------------------------------------------------------
ACF_MAX_LAG = 7


@query(
    "q_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    )
    SELECT a.event_type AS event_type, k.k AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(a.x, b.x), 6) AS acf
    FROM d a
      JOIN unnest(generate_series(1, {ACF_MAX_LAG})) AS k(k) ON true
      JOIN d b ON b.event_type = a.event_type AND b.rn = a.rn - k.k
    GROUP BY a.event_type, k.k
    ORDER BY a.event_type, lag
    """,
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1..{ACF_MAX_LAG}: Pearson
    correlation of the daily-total series with its lag-k shift — the
    seasonality/persistence detector behind every forecasting
    pipeline's lag selection (pairs with ``q_seasonal_baseline`` /
    ``q_holt_linear_trend``). Lags are in *observed* periods (row
    shift over the per-series ordering), the convention an ACF on an
    un-gap-filled series uses; both engines mirror it exactly.

    Plan: events collapse to the per-(type, day) rollup first
    (types×days rows); the lag alignment is one self-join on the
    per-series row number (both sides hash-partition by event_type —
    tiny), and ``corr`` is a single codegen'd aggregate. Integer
    micro-units keep the inputs exact; only the correlation itself is
    float, rounded to 6dp on both sides. No global window anywhere.
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(micro).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select("event_type", "x", F.row_number().over(w).alias("rn"))
    ks = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = d.alias("a").join(F.broadcast(ks), F.lit(True))
    b = d.alias("b")
    return (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.rn") == F.col("a.rn") - F.col("lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            # degenerate series (constant, or a single aligned pair):
            # Spark's corr yields NaN where DuckDB yields NULL — map
            # NaN → NULL so both engines agree on such data
            F.when(
                F.isnan(F.corr(F.col("a.x"), F.col("b.x"))), F.lit(None)
            )
            .otherwise(F.round(F.corr(F.col("a.x"), F.col("b.x")), 6))
            .alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes)
# --------------------------------------------------------------------------
@query(
    "q_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type,
             (b.y - a.y) * 1.0 / (b.rn - a.rn) AS slope
      FROM d a JOIN d b
        ON b.event_type = a.event_type AND b.rn > a.rn
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(quantile_cont(slope, 0.5) AS DOUBLE), 6)
             AS theil_sen_slope_micro
    FROM slopes GROUP BY event_type ORDER BY event_type
    """,
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per series: the median of all pairwise
    slopes of the daily totals — the outlier-proof alternative to the
    OLS fits elsewhere in the suite (``q_zipf_slope``,
    ``q_holt_linear_trend``): up to ~29% contaminated days cannot
    move it. Slopes are over observation index (like the ACF's
    lag convention), inputs exact integer micro-units, and the median
    is the same interpolated percentile both engines share (rounded
    6dp — the repo's float convention).

    Scale: series collapse to types×days rows first, the pairwise
    self-join is per-series (≤ d²/2 tiny rows — for long series
    subsample pairs or use the repeated-median variant), and the
    median is one aggregate per series. No global window.
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(micro).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select("event_type", "y", F.row_number().over(w).alias("rn"))
    a, b = d.alias("a"), d.alias("b")
    slopes = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.rn") > F.col("a.rn")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.rn") - F.col("a.rn"))).alias(
            "slope"
        ),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.percentile("slope", F.lit(0.5)), 6).alias(
                "theil_sen_slope_micro"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Burstiness (index of dispersion per series)
# --------------------------------------------------------------------------
@query(
    "q_burstiness",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(avg(n), 6) AS mean_daily,
           round(var_samp(n), 6) AS var_daily,
           round(var_samp(n) / avg(n), 6) AS fano_factor,
           var_samp(n) / avg(n) > 1.5 AS bursty
    FROM daily GROUP BY event_type ORDER BY event_type
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event series: the Fano factor (index of
    dispersion, sample-variance / mean of daily counts) with a
    Poisson-reference verdict — >1 means clumpier than random
    arrivals, the signal that picks which streams need burst-aware
    capacity or anomaly thresholds (complements the level/trend views:
    ``q_seasonal_baseline``, ``q_anomaly_trailing``, ``q_cusum_drift``).

    Scale: events collapse to types×days counts first; the dispersion
    aggregate is one codegen'd pass over that tiny rollup. var_samp
    shares its definition across engines; floats round to 6dp and the
    verdict threshold compares the unrounded value identically on
    both sides.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    fano = F.var_samp("n") / F.avg("n")
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("n_events"),
            F.round(F.avg("n"), 6).alias("mean_daily"),
            F.round(F.var_samp("n"), 6).alias("var_daily"),
            F.round(fano, 6).alias("fano_factor"),
            (fano > 1.5).alias("bursty"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Mann-Kendall trend test (nonparametric monotonic-trend detection)
# --------------------------------------------------------------------------
MK_Z_CRIT = 1.959964  # two-sided 95% normal critical value


@query(
    "q_mann_kendall",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    s AS (
      SELECT a.event_type,
             CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s_stat
      FROM d a JOIN d b
        ON b.event_type = a.event_type AND b.rn > a.rn
      GROUP BY a.event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, count(*) AS t FROM daily GROUP BY event_type, y)
      GROUP BY event_type
    ),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
    z AS (
      SELECT n.event_type, n.n, s.s_stat,
             (n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term) / 18.0 AS var_s
      FROM n JOIN s USING (event_type) JOIN ties USING (event_type)
    )
    SELECT event_type, n AS n_days, s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_stat,
           CASE WHEN s_stat > 0 AND (s_stat - 1) / sqrt(var_s) > {MK_Z_CRIT}
                  THEN 'increasing'
                WHEN s_stat < 0 AND (s_stat + 1) / sqrt(var_s) < -{MK_Z_CRIT}
                  THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM z ORDER BY event_type
    """,
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per daily series (Mann 1945,
    Kendall 1975): S = Σ_(i<j) sign(y_j − y_i) over the day-ordered
    series, tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    Σ_g t_g(t_g−1)(2t_g+5)]/18, and the continuity-corrected normal
    z — the hypothesis-test companion to ``q_theil_sen_trend``'s
    slope ESTIMATE (the two are the standard pairing: Theil-Sen says
    how steep, Mann-Kendall says whether it is significant at all,
    with no distributional assumption the parametric fits elsewhere
    in the suite need).

    Hash-exactness: S and the tie term are exact integer aggregates
    over exact integer micro-unit totals; Var(S) and z are single
    deterministic double expressions of those integers (6dp-rounded);
    the verdict thresholds compare the unrounded z identically on
    both sides.

    Scale: series collapse to types×days first (map-side combine);
    the pairwise join is per-series over the tiny daily frame (the
    ``q_theil_sen_trend`` shape — subsample pairs for multi-year
    series); ties and n are vocabulary-bounded rollups of the same
    daily frame. No global window, no driver loop.
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(micro).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select("event_type", "y", F.row_number().over(w).alias("rn"))
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.rn") > F.col("a.rn")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.signum(F.col("b.y") - F.col("a.y")).cast("long")).alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z_raw = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .withColumn("var_s", var_s)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s_stat",
            F.round("var_s", 6).alias("var_s"),
            F.round(z_raw, 6).alias("z_stat"),
            F.when(z_raw > MK_Z_CRIT, "increasing")
            .when(z_raw < -MK_Z_CRIT, "decreasing")
            .otherwise("no trend")
            .alias("trend"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Binary-segmentation changepoint (single most-likely split per series)
# --------------------------------------------------------------------------
@query(
    "q_changepoint_binary",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, day, y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS rn,
             sum(y) OVER w AS cs,
             sum(y * y) OVER w AS css,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             sum(y) OVER (PARTITION BY event_type) AS ts_,
             sum(y * y) OVER (PARTITION BY event_type) AS tss
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cand AS (
      SELECT event_type, day, rn, n,
             CASE WHEN tss - ts_ * ts_ * 1.0 / n > 0 THEN
               ((tss - ts_ * ts_ * 1.0 / n)
                 - ((css - cs * cs * 1.0 / rn)
                    + ((tss - css) - (ts_ - cs) * (ts_ - cs) * 1.0 / (n - rn))))
                 / (tss - ts_ * ts_ * 1.0 / n) END AS explained,
             cs * 1.0 / rn / 100.0 AS mean_left,
             (ts_ - cs) * 1.0 / (n - rn) / 100.0 AS mean_right
      FROM d WHERE rn >= 2 AND rn <= n - 2
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY round(explained, 6) DESC, rn) AS bk
      FROM cand
    )
    SELECT event_type, n AS n_days, rn AS split_rn, day AS split_day,
           round(explained, 6) AS explained_frac,
           round(mean_left, 6) AS mean_left,
           round(mean_right, 6) AS mean_right
    FROM best WHERE bk = 1 ORDER BY event_type
    """,
)
def q_changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single most-likely changepoint per daily series by binary
    segmentation (Scott & Knott 1974; the first split of the standard
    recursive detector): for every candidate split k the cost drop is
    SS_total − (SS_left + SS_right), maximized over k with ≥2 days on
    each side — the offline twin of the suite's ONLINE drift monitors
    (``q_cusum_drift`` flags drift as it streams; this localizes where
    a completed series broke). Recursing on the two halves with a
    penalty gives full multiple-changepoint detection; the per-split
    kernel is exactly this query.

    Hash-exactness: the REPORTED statistic is the unit-scale explained
    fraction (reduction / SS_total ∈ [0,1]) — the raw reduction at
    cent² magnitude carries ~13 significant digits where engine ulp
    differences straddle the 6dp round; the ratio cancels that scale.
    The argmax orders by the 6dp-ROUNDED fraction then split index
    (the knn tie rule), so an ulp cannot flip the winner either.

    Scale: the corpus collapses to types×days first; prefix sums are
    per-series windows over that tiny frame (never raw events); the
    argmax is one more per-series window. O(|days|) candidates per
    series, not O(|days|²) segment pairs.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("y")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("event_type")
    d = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).cast("long").alias("rn"),
        F.sum("y").over(w_run).alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(w_run).alias("css"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("y").over(w_all).alias("ts_"),
        F.sum(F.col("y") * F.col("y")).over(w_all).alias("tss"),
    )
    ss_tot = F.col("tss") - F.col("ts_") * F.col("ts_") / F.col("n")
    ss_left = F.col("css") - F.col("cs") * F.col("cs") / F.col("rn")
    rs = F.col("ts_") - F.col("cs")
    rn_right = F.col("n") - F.col("rn")
    ss_right = (F.col("tss") - F.col("css")) - rs * rs / rn_right
    cand = d.filter((F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 2)).select(
        "event_type",
        "day",
        "rn",
        "n",
        # constant series (SS_total = 0) → NULL on both engines instead
        # of an ANSI divide-by-zero
        F.when(ss_tot > 0, (ss_tot - (ss_left + ss_right)) / ss_tot).alias(
            "explained"
        ),
        (F.col("cs") / F.col("rn") / 100.0).alias("mean_left"),
        (rs / rn_right / 100.0).alias("mean_right"),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.desc(F.round("explained", 6)), "rn"
    )
    return (
        cand.withColumn("bk", F.row_number().over(w_best))
        .filter(F.col("bk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("rn").alias("split_rn"),
            F.col("day").alias("split_day"),
            F.round("explained", 6).alias("explained_frac"),
            F.round("mean_left", 6).alias("mean_left"),
            F.round("mean_right", 6).alias("mean_right"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Rolling-origin forecast backtest (one-step-ahead OLS evaluation)
# --------------------------------------------------------------------------
BACKTEST_MIN_TRAIN = 20  # first forecast origin: fit on days 1..20


@query(
    "q_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS x
      FROM daily
    ),
    run AS (
      SELECT event_type, y, x,
             sum(y) OVER w AS sy,
             sum(y * x) OVER w AS sxy
      FROM idx
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    fc AS (
      SELECT event_type, x, y,
             lag(sy) OVER v AS psy, lag(sxy) OVER v AS psxy,
             x - 1 AS t
      FROM run WINDOW v AS (PARTITION BY event_type ORDER BY x)
    ),
    err AS (
      SELECT event_type,
             (y - ((psy * 1.0 / t
                    - ((psxy - (t * (t + 1) / 2) * psy / t)
                       / (t * (t + 1) * (2 * t + 1) / 6
                          - (t * (t + 1) / 2) * (t * (t + 1) / 2) / t))
                      * ((t + 1) / 2.0))
                   + ((psxy - (t * (t + 1) / 2) * psy / t)
                      / (t * (t + 1) * (2 * t + 1) / 6
                         - (t * (t + 1) / 2) * (t * (t + 1) / 2) / t)) * x))
               / 100.0 AS e,
             y / 100.0 AS actual
      FROM fc WHERE t >= {BACKTEST_MIN_TRAIN}
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           round(avg(abs(e)), 6) AS mae,
           round(avg(e), 6) AS bias,
           round(avg(abs(e) / actual), 6) AS mape
    FROM err GROUP BY event_type ORDER BY event_type
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin one-step-ahead backtest (Tashman 2000) of the
    linear trend forecaster: for every origin t ≥
    {BACKTEST_MIN_TRAIN}, fit OLS on days 1..t and forecast day t+1;
    report MAE / bias / MAPE per series — the evaluation harness that
    tells you whether ``q_holt_linear_trend``-style trend forecasts
    are actually usable, measured the way production forecast systems
    are (expanding window, never test-set leakage). The whole
    backtest is ONE pass: because x is the day index 1..t, the x-side
    moments are closed-form (Σx = t(t+1)/2, Σx² = t(t+1)(2t+1)/6), so
    each origin's fit needs only the PREFIX sums Σy and Σxy — no
    per-origin refit, no quadratic re-aggregation.

    Hash-exactness: prefix sums are exact integer cents; each
    forecast is a deterministic double expression of those (identical
    formula text on both engines); the error aggregates carry only
    reassociation noise (~1e-11 of the 6dp grid).

    Scale: the corpus collapses to types×days; prefix sums and the
    lag are per-series windows over that frame; the report is one
    |series|-row aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("y")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_x = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = daily.select(
        "event_type",
        "y",
        F.row_number().over(w_ord).cast("long").alias("x"),
    ).select(
        "event_type",
        "y",
        "x",
        F.sum("y").over(w_x).alias("sy"),
        F.sum(F.col("y") * F.col("x")).over(w_x).alias("sxy"),
    )
    w_lag = Window.partitionBy("event_type").orderBy("x")
    fc = d.select(
        "event_type",
        "x",
        "y",
        F.lag("sy").over(w_lag).alias("psy"),
        F.lag("sxy").over(w_lag).alias("psxy"),
        (F.col("x") - 1).alias("t"),
    ).filter(F.col("t") >= BACKTEST_MIN_TRAIN)
    t = F.col("t")
    # '/' is double division in BOTH engines (DuckDB int/int → double);
    # t(t+1)/2 and t(t+1)(2t+1)/6 are exact small integers either way
    sx = t * (t + 1) / 2
    sxx = t * (t + 1) * (2 * t + 1) / 6
    slope = (F.col("psxy") - sx * F.col("psy") / t) / (sxx - sx * sx / t)
    icept = F.col("psy") / t - slope * ((t + 1) / 2.0)
    err = fc.select(
        "event_type",
        ((F.col("y") - (icept + slope * F.col("x"))) / 100.0).alias("e"),
        (F.col("y") / 100.0).alias("actual"),
    )
    return (
        err.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_forecasts"),
            F.round(F.avg(F.abs("e")), 6).alias("mae"),
            F.round(F.avg("e"), 6).alias("bias"),
            F.round(F.avg(F.abs("e") / F.col("actual")), 6).alias("mape"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Shewhart individuals control chart (x-bar ± 2.66·MR-bar limits)
# --------------------------------------------------------------------------
SPC_MR_CONST = 2.6595  # 3/d2 for n=2 moving ranges (d2 = 1.128)


@query(
    "q_control_chart",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    mr AS (
      SELECT event_type, day, y,
             abs(y - lag(y) OVER (PARTITION BY event_type ORDER BY day))
               AS moving_range
      FROM daily
    ),
    lim AS (
      SELECT event_type,
             avg(y) AS center,
             avg(moving_range) AS mrbar
      FROM mr GROUP BY event_type
    )
    SELECT m.event_type, m.day,
           round(m.y / 100.0, 6) AS y,
           round(l.center / 100.0, 6) AS center,
           round((l.center - {SPC_MR_CONST} * l.mrbar) / 100.0, 6) AS lcl,
           round((l.center + {SPC_MR_CONST} * l.mrbar) / 100.0, 6) AS ucl,
           m.y < l.center - {SPC_MR_CONST} * l.mrbar
             OR m.y > l.center + {SPC_MR_CONST} * l.mrbar AS out_of_control,
           abs(m.y - l.center) > {SPC_MR_CONST} * l.mrbar * 2 / 3
             AS warning
    FROM mr m JOIN lim l USING (event_type)
    ORDER BY m.event_type, m.day
    """,
)
def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals/moving-range control chart (Shewhart 1931;
    Montgomery's I-MR chart): center line x̄ and 3σ-equivalent limits
    x̄ ± {SPC_MR_CONST}·M̄R, where M̄R is the mean absolute
    day-over-day change — σ estimated from SHORT-TERM variation, so a
    slow drift inflates neither limit and still flags (the reason SPC
    uses moving ranges instead of the plain stddev the z-score
    monitors here use). Completes the monitoring shelf: CUSUM
    accumulates small shifts, changepoint localizes retrospectively,
    the control chart is the classic per-point alarm with known
    false-positive rate (~0.27%). Also emits the Western Electric zone
    A ``warning`` (beyond the 2σ-equivalent, ⅔ of the control limit)
    — on an in-control series the 3σ alarm correctly never fires
    (~0.27% × 30 points/series), so the warning tier is what proves
    the signal path live on this data (round-10 degeneracy audit:
    4-5 warnings fire at every scale factor, 3σ none — both correct).

    Hash-exactness: daily totals and moving ranges are exact integer
    cents; center/M̄R/limits are deterministic doubles of those; the
    out-of-control flag compares unrounded values identically on both
    engines.

    Scale: per-series lag window over the types×days rollup; limits
    are a |series|-row aggregate broadcast back. Raw events are
    touched once.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    mr = daily.select(
        "event_type",
        "day",
        "y",
        F.abs(F.col("y") - F.lag("y").over(w)).alias("moving_range"),
    )
    lim = mr.groupBy("event_type").agg(
        F.avg("y").alias("center"), F.avg("moving_range").alias("mrbar")
    )
    lcl = F.col("center") - SPC_MR_CONST * F.col("mrbar")
    ucl = F.col("center") + SPC_MR_CONST * F.col("mrbar")
    return (
        mr.join(F.broadcast(lim), "event_type")
        .select(
            "event_type",
            "day",
            F.round(F.col("y") / 100.0, 6).alias("y"),
            F.round(F.col("center") / 100.0, 6).alias("center"),
            F.round(lcl / 100.0, 6).alias("lcl"),
            F.round(ucl / 100.0, 6).alias("ucl"),
            ((F.col("y") < lcl) | (F.col("y") > ucl)).alias("out_of_control"),
            (
                F.abs(F.col("y") - F.col("center"))
                > SPC_MR_CONST * F.col("mrbar") * 2 / 3
            ).alias("warning"),
        )
        .orderBy("event_type", "day")
    )
