"""Time-series model operators (round 9): the forecasting and
diagnostic models a pipeline's metrics tier runs on its daily rollups —
intermittent-demand forecasting (Croston), state-space smoothing
(Kalman local level), motif discovery (matrix profile), lead-lag
causality screening (Granger), and heteroskedasticity screening
(Breusch-Pagan). Reference scope: the engine delegates all processing
to its injected pipeline (PulsarMessageConsumer.java:535-545) — this IS
that processing layer.

Every model here consumes the day-domain-bounded rollup from
``auditstats._daily_purchase_cents`` (or its per-type twin), never raw
events, so each query is one map-side-combined rollup shuffle plus
arithmetic on a ≤|days|-row frame regardless of corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.operators.auditstats import (
    _DAILY_SQL,
    _daily_purchase_cents,
    US_PER_DAY,
)
from mi_inbound_pulsar_spark.plans.iterate import eager_checkpoint, stats_reset_checkpoint
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Croston's method: intermittent-demand forecasting
# --------------------------------------------------------------------------
CROSTON_ALPHA = 0.2
CROSTON_CENTS_MIN = 15_000  # demand event: purchase of >= $150


@query(
    "q_croston_intermittent",
    oracle=f"""
    WITH ev AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    d0 AS (SELECT min(day) AS d0 FROM ev),
    dem AS (
      SELECT ev.day - d0.d0 + 1 AS pos,
             CAST(sum(cents) AS BIGINT) AS z
      FROM ev, d0 WHERE cents >= {CROSTON_CENTS_MIN}
      GROUP BY 1
    ),
    seq AS (
      SELECT pos, CAST(z AS DOUBLE) AS z,
             CAST(pos - coalesce(lag(pos) OVER (ORDER BY pos), 0)
                  AS DOUBLE) AS p,
             row_number() OVER (ORDER BY pos) AS i,
             count(*) OVER () AS n
      FROM dem
    ),
    ses AS (
      SELECT max(n) AS n_demand,
             sum(CASE WHEN i = 1
                      THEN pow({1 - CROSTON_ALPHA}, n - 1) * z
                      ELSE {CROSTON_ALPHA}
                           * pow({1 - CROSTON_ALPHA}, n - i) * z END)
               AS z_hat,
             sum(CASE WHEN i = 1
                      THEN pow({1 - CROSTON_ALPHA}, n - 1) * p
                      ELSE {CROSTON_ALPHA}
                           * pow({1 - CROSTON_ALPHA}, n - i) * p END)
               AS p_hat,
             avg(z) AS mean_size, avg(p) AS mean_interval
      FROM seq
    )
    SELECT CAST(n_demand AS BIGINT) AS n_demand_days,
           round(mean_size, 6) AS mean_size,
           round(mean_interval, 6) AS mean_interval,
           round(z_hat, 6) AS z_hat,
           round(p_hat, 6) AS p_hat,
           round(z_hat / p_hat, 6) AS croston_forecast,
           round((1 - {CROSTON_ALPHA} / 2) * z_hat / p_hat, 6)
             AS sba_forecast
    FROM ses
    """,
)
def q_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (Croston 1972) for intermittent demand — the
    forecaster for series that are mostly zeros (large-ticket
    purchases of >= $150): smooth the nonzero demand SIZES z_i and the
    INTER-DEMAND intervals p_i with separate SES recurrences, forecast
    demand-per-period ẑ/p̂, plus the Syntetos-Boylan approximation
    (1−α/2)·ẑ/p̂ that removes Croston's inversion bias. SES on a
    bounded series needs no fold at all: the recurrence is linear, so
    ẑ_n = Σ_i w_i·z_i with w_1=(1−α)^{{n−1}}, w_i=α(1−α)^{{n−i}} —
    one order-insensitive weighted aggregate per smoother, identical
    in both engines (the closed form the q_holt_linear docstring
    reserves for UNcoupled recurrences).

    Scale: the demand extraction is one filtered map-side-combined
    rollup; everything after lives on the ≤|days|-row demand frame.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    ev = e.select(
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    dem = (
        ev.filter(F.col("cents") >= CROSTON_CENTS_MIN)
        .crossJoin(F.broadcast(d0))
        .groupBy((F.col("day") - F.col("d0") + 1).alias("pos"))
        .agg(F.sum("cents").alias("z"))
    )
    dem = bounded_window_input(dem, label="q_croston demand days")
    wo = Window.orderBy("pos")
    seq = dem.select(
        F.col("z").cast("double").alias("z"),
        (F.col("pos") - F.coalesce(F.lag("pos").over(wo), F.lit(0)))
        .cast("double")
        .alias("p"),
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    a = CROSTON_ALPHA
    w_i = F.when(
        F.col("i") == 1, F.pow(F.lit(1 - a), F.col("n") - 1)
    ).otherwise(F.lit(a) * F.pow(F.lit(1 - a), F.col("n") - F.col("i")))
    ses = seq.agg(
        F.max("n").alias("n_demand"),
        F.sum(w_i * F.col("z")).alias("z_hat"),
        F.sum(w_i * F.col("p")).alias("p_hat"),
        F.avg("z").alias("mean_size"),
        F.avg("p").alias("mean_interval"),
    )
    return ses.select(
        F.col("n_demand").cast("long").alias("n_demand_days"),
        F.round("mean_size", 6).alias("mean_size"),
        F.round("mean_interval", 6).alias("mean_interval"),
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias(
            "croston_forecast"
        ),
        F.round(
            (1 - a / 2) * F.col("z_hat") / F.col("p_hat"), 6
        ).alias("sba_forecast"),
    )


# --------------------------------------------------------------------------
# Kalman filter, local-level model (coupled level/variance recurrence)
# --------------------------------------------------------------------------
KALMAN_Q = 500.0  # state noise variance (dollars^2 / day)
KALMAN_R = 2000.0  # observation noise variance (dollars^2)
KALMAN_P0 = 10000.0  # diffuse-ish initial state variance


@query(
    "q_kalman_local_level",
    oracle=f"""
    WITH RECURSIVE d AS ({_DAILY_SQL}),
    s AS (
      SELECT list(CAST(cents AS DOUBLE) / 100 ORDER BY day) AS vals,
             CAST(count(*) AS BIGINT) AS n_days
      FROM d
    ),
    step AS (
      SELECT 1 AS t, vals[1] AS l, CAST({KALMAN_P0} AS DOUBLE) AS pv,
             CAST(0.0 AS DOUBLE) AS gain, CAST(0.0 AS DOUBLE) AS e
      FROM s
      UNION ALL
      SELECT step.t + 1,
             step.l + (step.pv + {KALMAN_Q})
                      / (step.pv + {KALMAN_Q} + {KALMAN_R})
                      * (s.vals[step.t + 1] - step.l),
             (1 - (step.pv + {KALMAN_Q})
                  / (step.pv + {KALMAN_Q} + {KALMAN_R}))
               * (step.pv + {KALMAN_Q}),
             (step.pv + {KALMAN_Q}) / (step.pv + {KALMAN_Q} + {KALMAN_R}),
             step.e + abs(s.vals[step.t + 1] - step.l)
      FROM step, s WHERE step.t < s.n_days
    )
    SELECT s.n_days,
           round(step.l, 6) AS level,
           round(step.pv, 6) AS state_var,
           round(step.gain, 6) AS kalman_gain,
           round(step.e / (s.n_days - 1), 6) AS mae_one_step,
           round(step.l, 6) AS forecast_1d
    FROM step, s WHERE step.t = s.n_days
    """,
)
def q_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kalman filter for the local-level state-space model (Harvey
    1989 §4; Durbin & Koopman 2012 ch.2) over daily revenue in
    dollars: predict P⁻=P+q, gain K=P⁻/(P⁻+r), update l+=K(x−l),
    P=(1−K)P⁻ — the optimal linear filter whose steady-state gain the
    EWMA only approximates, and the base case for every structural
    time-series model. Level and variance are a COUPLED recurrence, so
    the oracle is a recursive CTE (the q_holt_linear recipe — NOT
    list_reduce, whose sequential struct-field rebinding diverges) and
    Spark runs the same IEEE op sequence as one ``aggregate`` HOF fold
    with a struct accumulator; q={KALMAN_Q}, r={KALMAN_R},
    P₀={KALMAN_P0}, init l₁=x₁.

    Scale: the fold runs once over the |days|-value list in one task —
    the only correct plan for a sequential recurrence; a per-key fleet
    folds inside groupBy exactly like q_ewma_smoothing.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    s = d.agg(
        F.expr(
            "array_sort(collect_list(struct(day,"
            " CAST(cents AS DOUBLE) / 100 AS v)))"
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_days"),
    ).select(F.expr("transform(seq, s -> s.v)").alias("vals"), "n_days")
    q, r, p0 = KALMAN_Q, KALMAN_R, KALMAN_P0
    fold = (
        "aggregate("
        " slice(vals, 2, size(vals) - 1),"
        f" named_struct('l', vals[0], 'pv', CAST({p0} AS DOUBLE),"
        "   'gain', CAST(0.0 AS DOUBLE), 'e', CAST(0.0 AS DOUBLE)),"
        " (acc, x) -> named_struct("
        f"   'l', acc.l + (acc.pv + {q}) / (acc.pv + {q} + {r})"
        "         * (x - acc.l),"
        f"   'pv', (1 - (acc.pv + {q}) / (acc.pv + {q} + {r}))"
        f"         * (acc.pv + {q}),"
        f"   'gain', (acc.pv + {q}) / (acc.pv + {q} + {r}),"
        "   'e', acc.e + abs(x - acc.l)))"
    )
    return s.select(
        "n_days",
        F.round(F.expr(fold + ".l"), 6).alias("level"),
        F.round(F.expr(fold + ".pv"), 6).alias("state_var"),
        F.round(F.expr(fold + ".gain"), 6).alias("kalman_gain"),
        F.round(
            F.expr(fold + ".e") / (F.col("n_days") - 1), 6
        ).alias("mae_one_step"),
        F.round(F.expr(fold + ".l"), 6).alias("forecast_1d"),
    )


# --------------------------------------------------------------------------
# Matrix profile (top-k motifs): z-normalized window distances
# --------------------------------------------------------------------------
MP_M = 7  # motif window length (days)
MP_TOPK = 5


@query(
    "q_matrix_profile_topk",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             CAST(cents AS DOUBLE) / 100 AS x
      FROM d
    ),
    e AS (
      SELECT idx.t - k AS s, k, x
      FROM idx, unnest(generate_series(0, {MP_M - 1})) g(k)
      WHERE idx.t - k >= 1
    ),
    n AS (SELECT count(*) AS n FROM idx),
    ws AS (
      SELECT s, sum(x) AS sm, sum(x * x) AS ss
      FROM e, n
      WHERE s <= n.n - {MP_M - 1}
      GROUP BY s HAVING count(*) = {MP_M}
    ),
    st AS (
      SELECT s, sm / {MP_M} AS mu,
             sqrt(ss / {MP_M} - (sm / {MP_M}) * (sm / {MP_M})) AS sd
      FROM ws
    ),
    dots AS (
      SELECT a.s AS s1, b.s AS s2, sum(a.x * b.x) AS dot
      FROM e a JOIN e b ON a.k = b.k AND b.s >= a.s + {MP_M}
      GROUP BY 1, 2
    ),
    dist AS (
      SELECT d.s1, d.s2,
             sqrt(greatest(0.0, 2 * {MP_M} * (1 -
               (d.dot - {MP_M} * p.mu * q.mu)
               / ({MP_M} * p.sd * q.sd)))) AS dist
      FROM dots d
        JOIN st p ON p.s = d.s1
        JOIN st q ON q.s = d.s2
      WHERE p.sd > 0 AND q.sd > 0
    )
    SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
           round(dist, 6) AS znorm_dist
    FROM dist
    ORDER BY round(dist, 6), s1, s2 LIMIT {MP_TOPK}
    """,
)
def q_matrix_profile_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile motif discovery (Yeh et al. 2016, ICDM): the
    top-{MP_TOPK} most similar NON-overlapping pairs of {MP_M}-day
    windows of the daily revenue series under z-normalized Euclidean
    distance dist² = 2m(1 − corr) — the shape-based "does this week
    repeat?" primitive behind motif/discord mining, computed exactly
    from window dot products and per-window moments (no FFT needed on
    a bounded series). Overlapping pairs (|i−j| < m) are excluded as
    trivial matches, flat windows (σ=0) are dropped, and the distance
    is clamped at 0 before the sqrt against negative round-off.

    Scale: the series is the day-domain rollup, so the pair join is
    O(n²m) on a ≤|days|·m frame — never raw events; at a 10-year
    horizon that is ~9M product rows, one task's work. The oracle
    mirrors the same exploded-offset join.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_matrix_profile day series")
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (F.col("cents").cast("double") / 100).alias("x"),
    )
    e = (
        idx.select(
            F.explode(F.sequence(F.lit(0), F.lit(MP_M - 1))).alias("k"),
            "t",
            "x",
        )
        .select((F.col("t") - F.col("k")).alias("s"), "k", "x")
        .filter(F.col("s") >= 1)
    )
    n = idx.agg(F.count(F.lit(1)).alias("n"))
    ws = (
        e.crossJoin(F.broadcast(n))
        .filter(F.col("s") <= F.col("n") - (MP_M - 1))
        .groupBy("s")
        .agg(
            F.sum("x").alias("sm"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") == MP_M)
    )
    mu = F.col("sm") / MP_M
    st = ws.select(
        "s",
        mu.alias("mu"),
        F.sqrt(F.col("ss") / MP_M - mu * mu).alias("sd"),
    )
    a, b = e.alias("a"), e.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("b.s") >= F.col("a.s") + MP_M),
        )
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("dot"))
    )
    p, qst = st.alias("p"), st.alias("q")
    dist = (
        dots.join(F.broadcast(p), F.col("p.s") == F.col("s1"))
        .join(F.broadcast(qst), F.col("q.s") == F.col("s2"))
        .filter((F.col("p.sd") > 0) & (F.col("q.sd") > 0))
        .select(
            "s1",
            "s2",
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    2
                    * MP_M
                    * (
                        1
                        - (F.col("dot") - MP_M * F.col("p.mu") * F.col("q.mu"))
                        / (MP_M * F.col("p.sd") * F.col("q.sd"))
                    ),
                )
            ).alias("dist"),
        )
    )
    return (
        dist.orderBy(F.round("dist", 6), "s1", "s2")
        .limit(MP_TOPK)
        .select(
            F.col("s1").cast("long").alias("s1"),
            F.col("s2").cast("long").alias("s2"),
            F.round("dist", 6).alias("znorm_dist"),
        )
    )


# --------------------------------------------------------------------------
# Granger causality (lag 1): do views lead revenue?
# --------------------------------------------------------------------------
@query(
    "q_granger_lag1",
    oracle="""
    WITH ev AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) AS cents,
             count(*) FILTER (event_type = 'view') AS views
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT a.cents AS y, b.cents AS yl, b.views AS xl
      FROM ev a JOIN ev b ON b.day = a.day - 1
    ),
    m AS (
      -- exact integer cross-moments: accumulation order cannot move
      -- a single bit, so the doubles derived below are bit-identical
      -- in both engines (a 6dp-boundary ulp flip was observed with
      -- double sums here)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(yl) AS BIGINT) AS syl,
             CAST(sum(xl) AS BIGINT) AS sxl,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(y * yl) AS BIGINT) AS syyl,
             CAST(sum(y * xl) AS BIGINT) AS syxl,
             CAST(sum(yl * yl) AS BIGINT) AS sylyl,
             CAST(sum(xl * xl) AS BIGINT) AS sxlxl,
             CAST(sum(yl * xl) AS BIGINT) AS sylxl
      FROM lagged
    ),
    c AS (
      SELECT n,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
             CAST(syyl AS DOUBLE) - CAST(sy AS DOUBLE) * syl / n AS cyyl,
             CAST(syxl AS DOUBLE) - CAST(sy AS DOUBLE) * sxl / n AS cyxl,
             CAST(sylyl AS DOUBLE) - CAST(syl AS DOUBLE) * syl / n AS cylyl,
             CAST(sxlxl AS DOUBLE) - CAST(sxl AS DOUBLE) * sxl / n AS cxlxl,
             CAST(sylxl AS DOUBLE) - CAST(syl AS DOUBLE) * sxl / n AS cylxl
      FROM m
    ),
    fit AS (
      SELECT n, cyy,
             cyy - cyyl * cyyl / cylyl AS rss_r,
             (cyyl * cxlxl - cyxl * cylxl)
               / (cylyl * cxlxl - cylxl * cylxl) AS b_u,
             (cylyl * cyxl - cylxl * cyyl)
               / (cylyl * cxlxl - cylxl * cylxl) AS c_u
      FROM c
    ),
    r AS (
      SELECT f.n, f.rss_r,
             f.cyy - f.b_u * c.cyyl - f.c_u * c.cyxl AS rss_u,
             f.b_u, f.c_u
      FROM fit f, c
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(b_u, 6) AS beta_ylag,
           round(c_u, 6) AS beta_xlag,
           round(rss_r, 6) AS rss_restricted,
           round(rss_u, 6) AS rss_unrestricted,
           round((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat
    FROM r
    """,
)
def q_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality screen at lag 1 (Granger 1969): does
    yesterday's VIEW volume improve today's revenue forecast beyond
    yesterday's revenue? Restricted model y_t = a + b·y_{t−1};
    unrestricted adds c·x_{t−1}; F = (RSS_r − RSS_u)(n−3)/RSS_u with
    the 2-regressor OLS solved in closed form from centered
    cross-moments (2×2 normal equations — no iteration, no matrix
    library). The lead-lag screen a marketing/metrics tier runs before
    trusting an attribution story.

    Scale: ONE map-side-combined daily rollup over events computes
    both series in the same pass; the lag join and all moments live on
    the |days|-row frame. Cross-moments are EXACT integer sums over
    cents/counts (double accumulation order flipped a 6dp round
    boundary here), converted to doubles only in the closed form —
    bit-identical in both engines. Σy² < 2⁶³ holds to ~$300M/day over
    a 10-year spine; past that promote the sums to DECIMAL(38,0).
    """
    e = load_table(spark, sf_dir, "events")
    ev = e.groupBy(
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("cents"),
        F.count_if(F.col("event_type") == "view").alias("views"),
    )
    a, b = ev.alias("a"), ev.alias("b")
    lagged = a.join(
        F.broadcast(b), F.col("b.day") == F.col("a.day") - 1
    ).select(
        F.col("a.cents").alias("y"),
        F.col("b.cents").alias("yl"),
        F.col("b.views").alias("xl"),
    )
    # exact integer cross-moments (cents / counts): partial-aggregation
    # order cannot move a bit, so the derived doubles are bit-identical
    # in both engines — double sums here flipped a 6dp round boundary
    m = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("yl").alias("syl"),
        F.sum("xl").alias("sxl"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * F.col("yl")).alias("syyl"),
        F.sum(F.col("y") * F.col("xl")).alias("syxl"),
        F.sum(F.col("yl") * F.col("yl")).alias("sylyl"),
        F.sum(F.col("xl") * F.col("xl")).alias("sxlxl"),
        F.sum(F.col("yl") * F.col("xl")).alias("sylxl"),
    )
    nn = F.col("n")

    def _cmom(sab: str, sa: str, sb: str):
        return F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ) / nn

    c = m.select(
        "n",
        _cmom("syy", "sy", "sy").alias("cyy"),
        _cmom("syyl", "sy", "syl").alias("cyyl"),
        _cmom("syxl", "sy", "sxl").alias("cyxl"),
        _cmom("sylyl", "syl", "syl").alias("cylyl"),
        _cmom("sxlxl", "sxl", "sxl").alias("cxlxl"),
        _cmom("sylxl", "syl", "sxl").alias("cylxl"),
    )
    det = F.col("cylyl") * F.col("cxlxl") - F.col("cylxl") * F.col("cylxl")
    b_u = (F.col("cyyl") * F.col("cxlxl") - F.col("cyxl") * F.col("cylxl")) / det
    c_u = (F.col("cylyl") * F.col("cyxl") - F.col("cylxl") * F.col("cyyl")) / det
    fit = c.select(
        "n",
        "cyy",
        "cyyl",
        "cyxl",
        (F.col("cyy") - F.col("cyyl") * F.col("cyyl") / F.col("cylyl")).alias(
            "rss_r"
        ),
        b_u.alias("b_u"),
        c_u.alias("c_u"),
    )
    rss_u = F.col("cyy") - F.col("b_u") * F.col("cyyl") - F.col("c_u") * F.col(
        "cyxl"
    )
    return fit.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round("b_u", 6).alias("beta_ylag"),
        F.round("c_u", 6).alias("beta_xlag"),
        F.round("rss_r", 6).alias("rss_restricted"),
        F.round(rss_u, 6).alias("rss_unrestricted"),
        F.round(
            (F.col("rss_r") - rss_u) * (F.col("n") - 3) / rss_u, 6
        ).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Breusch-Pagan heteroskedasticity test on the daily trend fit
# --------------------------------------------------------------------------
@query(
    "q_breusch_pagan",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    xy AS (
      SELECT CAST(day - min(day) OVER () AS DOUBLE) AS t,
             CAST(cents AS DOUBLE) / 100 AS y
      FROM d
    ),
    m AS (
      SELECT count(*) AS n, sum(t) AS st, sum(y) AS sy,
             sum(t * y) AS sty, sum(t * t) AS stt
      FROM xy
    ),
    fit AS (
      SELECT n,
             (sty - st * sy / n) / (stt - st * st / n) AS b,
             sy / n - (sty - st * sy / n) / (stt - st * st / n) * st / n
               AS a
      FROM m
    ),
    res AS (
      SELECT xy.t, pow(xy.y - fit.a - fit.b * xy.t, 2) AS e2, fit.n
      FROM xy, fit
    ),
    aux AS (
      SELECT max(n) AS n, count(*) AS cnt, sum(t) AS st, sum(e2) AS se,
             sum(t * e2) AS ste, sum(t * t) AS stt, sum(e2 * e2) AS see
      FROM res
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round((SELECT b FROM fit), 6) AS trend_slope,
           round(se / n, 6) AS mean_sq_resid,
           round(pow(ste - st * se / n, 2)
                 / ((stt - st * st / n) * (see - se * se / n)), 6)
             AS aux_r2,
           round(n * pow(ste - st * se / n, 2)
                 / ((stt - st * st / n) * (see - se * se / n)), 6)
             AS bp_stat
    FROM aux
    """,
)
def q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan / Koenker heteroskedasticity test (Breusch &
    Pagan 1979; Koenker 1981 studentized form): fit the daily revenue
    trend y = a + b·t by OLS, regress the SQUARED residuals on t, and
    report n·R² of that auxiliary regression — χ²(1) under
    homoskedasticity. The variance-stability screen that decides
    whether the q_control_chart / q_ab_power_mde machinery can assume
    one noise level across the window, or must model variance growth.

    Scale: two passes over the |days|-row rollup (coefficients, then
    residual moments), both map-side-combined; centered moments from
    raw sums keep every aggregate order-insensitive and hash-exact.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    dmin = d.agg(F.min("day").alias("dmin"))
    xy = d.crossJoin(F.broadcast(dmin)).select(
        (F.col("day") - F.col("dmin")).cast("double").alias("t"),
        (F.col("cents").cast("double") / 100).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    nn = F.col("n")
    bcoef = (F.col("sty") - F.col("st") * F.col("sy") / nn) / (
        F.col("stt") - F.col("st") * F.col("st") / nn
    )
    fit = m.select(
        "n", bcoef.alias("b"), (F.col("sy") / nn - bcoef * F.col("st") / nn).alias("a")
    )
    res = xy.crossJoin(F.broadcast(fit)).select(
        "t",
        F.pow(
            F.col("y") - F.col("a") - F.col("b") * F.col("t"), F.lit(2.0)
        ).alias("e2"),
        "n",
        "b",
    )
    aux = res.agg(
        F.max("n").alias("n"),
        F.max("b").alias("b"),
        F.sum("t").alias("st"),
        F.sum("e2").alias("se"),
        F.sum(F.col("t") * F.col("e2")).alias("ste"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("e2") * F.col("e2")).alias("see"),
    )
    nn2 = F.col("n")
    cov = F.col("ste") - F.col("st") * F.col("se") / nn2
    r2 = F.pow(cov, F.lit(2.0)) / (
        (F.col("stt") - F.col("st") * F.col("st") / nn2)
        * (F.col("see") - F.col("se") * F.col("se") / nn2)
    )
    return aux.select(
        nn2.cast("long").alias("n_days"),
        F.round("b", 6).alias("trend_slope"),
        F.round(F.col("se") / nn2, 6).alias("mean_sq_resid"),
        F.round(r2, 6).alias("aux_r2"),
        F.round(nn2 * r2, 6).alias("bp_stat"),
    )


# --------------------------------------------------------------------------
# Theta method forecast (SES + drift decomposition)
# --------------------------------------------------------------------------
THETA_ALPHA = 0.3


@query(
    "q_theta_forecast",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    xy AS (
      SELECT row_number() OVER (ORDER BY day) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(cents AS DOUBLE) / 100 AS y
      FROM d
    ),
    m AS (
      SELECT max(n) AS n, sum(i) AS si, sum(y) AS sy,
             sum(i * y) AS siy, sum(CAST(i AS DOUBLE) * i) AS sii
      FROM xy
    ),
    fit AS (
      SELECT n,
             (siy - si * sy / n) / (sii - si * si / n) AS b,
             sy / n - (siy - si * sy / n) / (sii - si * si / n) * si / n
               AS a
      FROM m
    ),
    ses AS (
      SELECT max(fit.n) AS n, max(fit.a) AS a, max(fit.b) AS b,
             sum(CASE WHEN xy.i = 1
                      THEN pow({1 - THETA_ALPHA}, xy.n - 1)
                           * (2 * xy.y - (fit.a + fit.b * xy.i))
                      ELSE {THETA_ALPHA}
                           * pow({1 - THETA_ALPHA}, xy.n - xy.i)
                           * (2 * xy.y - (fit.a + fit.b * xy.i)) END)
               AS l2
      FROM xy, fit
    )
    SELECT n AS n_days,
           round(b, 6) AS trend_slope,
           round(l2, 6) AS theta2_level,
           round(0.5 * (a + b * (n + 1)) + 0.5 * l2, 6) AS forecast_1d,
           round(0.5 * (a + b * (n + 7)) + 0.5 * l2, 6) AS forecast_7d
    FROM ses
    """,
)
def q_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner; Hyndman & Billah 2003 show it is SES with
    drift): decompose the daily revenue series into the θ=0 line (the
    OLS trend, pure long-run signal) and the θ=2 line (2y − trend,
    doubled curvature), SES-smooth the θ=2 line, and forecast the
    equal-weight combination 0.5·trend(T+h) + 0.5·SES-level. SES uses
    the same closed-form weight expansion as q_croston_intermittent
    (uncoupled recurrence ⇒ one order-insensitive weighted aggregate),
    so no fold and no recursive CTE are needed.

    Scale: OLS moments and the weighted SES aggregate are two
    map-side-combined passes over the |days|-row rollup.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_theta day series")
    w_all = Window.partitionBy()
    xy = d.select(
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        (F.col("cents").cast("double") / 100).alias("y"),
    )
    m = xy.agg(
        F.max("n").alias("n"),
        F.sum("i").alias("si"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i") * F.col("y")).alias("siy"),
        F.sum(F.col("i").cast("double") * F.col("i")).alias("sii"),
    )
    nn = F.col("n")
    b = (F.col("siy") - F.col("si") * F.col("sy") / nn) / (
        F.col("sii") - F.col("si") * F.col("si") / nn
    )
    # no "n" in fit: xy already carries it and the crossJoin below
    # would make the reference ambiguous
    fit = m.select(
        b.alias("b"), (F.col("sy") / nn - b * F.col("si") / nn).alias("a")
    )
    al = THETA_ALPHA
    theta2 = 2 * F.col("y") - (F.col("a") + F.col("b") * F.col("i"))
    w_i = F.when(
        F.col("i") == 1, F.pow(F.lit(1 - al), F.col("n") - 1)
    ).otherwise(F.lit(al) * F.pow(F.lit(1 - al), F.col("n") - F.col("i")))
    ses = xy.crossJoin(F.broadcast(fit)).agg(
        F.max("n").alias("n"),
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.sum(w_i * theta2).alias("l2"),
    )
    return ses.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("b", 6).alias("trend_slope"),
        F.round("l2", 6).alias("theta2_level"),
        F.round(
            0.5 * (F.col("a") + F.col("b") * (F.col("n") + 1))
            + 0.5 * F.col("l2"),
            6,
        ).alias("forecast_1d"),
        F.round(
            0.5 * (F.col("a") + F.col("b") * (F.col("n") + 7))
            + 0.5 * F.col("l2"),
            6,
        ).alias("forecast_7d"),
    )


# --------------------------------------------------------------------------
# Hierarchical forecast reconciliation: bottom-up vs top-down coherence
# --------------------------------------------------------------------------
HIER_ALPHA = 0.3
HIER_TOP_ALPHA = 0.5  # the top level runs its OWN model (see docstring)
HIER_SHARE_DAYS = 7


@query(
    "q_hierarchical_reconciliation",
    oracle=f"""
    WITH ev AS (
      SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT k, CAST(y AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY k ORDER BY day) AS i,
             count(*) OVER (PARTITION BY k) AS n,
             max(day) OVER () - day AS days_from_end
      FROM ev
    ),
    bottom AS (
      SELECT k,
             sum(CASE WHEN i = 1 THEN pow({1 - HIER_ALPHA}, n - 1) * y
                      ELSE {HIER_ALPHA} * pow({1 - HIER_ALPHA}, n - i) * y
                 END) AS ses,
             sum(y) FILTER (days_from_end < {HIER_SHARE_DAYS})
               AS recent
      FROM idx GROUP BY k
    ),
    tot AS (
      SELECT day, CAST(sum(y) AS DOUBLE) AS y FROM ev GROUP BY day
    ),
    tidx AS (
      SELECT y, row_number() OVER (ORDER BY day) AS i,
             count(*) OVER () AS n
      FROM tot
    ),
    top AS (
      SELECT sum(CASE WHEN i = 1 THEN pow({1 - HIER_TOP_ALPHA}, n - 1) * y
                      ELSE {HIER_TOP_ALPHA}
                           * pow({1 - HIER_TOP_ALPHA}, n - i) * y
                 END) AS ses
      FROM tidx
    ),
    shares AS (
      SELECT b.k, b.ses, b.recent,
             b.recent / sum(b.recent) OVER () AS share
      FROM bottom b
    )
    SELECT k AS series,
           round(ses, 6) AS bu_forecast,
           round(share, 6) AS td_share,
           round(share * (SELECT ses FROM top), 6) AS td_forecast,
           round(sum(ses) OVER (), 6) AS bu_total,
           round((SELECT ses FROM top), 6) AS top_forecast
    FROM shares ORDER BY k
    """,
)
def q_hierarchical_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation (Hyndman et al. 2011's
    coherence problem, in its two classical solutions): per-event-type
    daily-count SES forecasts (bottom-up — coherent by summation, but
    noisy leaves) vs one SES on the aggregate split top-down by
    {HIER_SHARE_DAYS}-day historical shares (stable, but blind to
    leaf-level trend shifts). Emitting both per series — plus the
    bu_total / top_forecast pair whose gap IS the incoherence a MinT-
    style reconciler would distribute — is the diagnostic a metrics
    tier runs before trusting ANY per-segment forecast roll-up.

    SES again via the closed-form weight expansion, here per key: the
    same aggregate folded inside groupBy (the q_ewma_smoothing fleet
    pattern, without the fold). The top level deliberately runs its
    OWN smoother (α={HIER_TOP_ALPHA} vs the leaves' {HIER_ALPHA}), as
    hierarchical practice does — with identical models everywhere SES
    linearity makes bu_total ≡ top_forecast and the coherence gap
    degenerates to 0 (observed before this split).

    Scale: everything lives on the (event_type × day) rollup —
    map-side-combined from the corpus, ≤ |types|·|days| rows.
    """
    e = load_table(spark, sf_dir, "events")
    ev = e.groupBy(
        F.col("event_type").alias("k"),
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    ev = bounded_window_input(ev, label="q_hier (type, day) rollup")
    al = HIER_ALPHA
    idx = ev.select(
        "k",
        F.col("y").cast("double").alias("y"),
        F.row_number()
        .over(Window.partitionBy("k").orderBy("day"))
        .alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("n"),
        (F.max("day").over(Window.partitionBy()) - F.col("day")).alias(
            "days_from_end"
        ),
    )
    w_i = F.when(
        F.col("i") == 1, F.pow(F.lit(1 - al), F.col("n") - 1)
    ).otherwise(F.lit(al) * F.pow(F.lit(1 - al), F.col("n") - F.col("i")))
    bottom = idx.groupBy("k").agg(
        F.sum(w_i * F.col("y")).alias("ses"),
        F.sum(
            F.when(F.col("days_from_end") < HIER_SHARE_DAYS, F.col("y"))
        ).alias("recent"),
    )
    tot = ev.groupBy("day").agg(F.sum("y").cast("double").alias("y"))
    tot = bounded_window_input(tot, label="q_hier total series")
    tidx = tot.select(
        "y",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    at = HIER_TOP_ALPHA
    w_top = F.when(
        F.col("i") == 1, F.pow(F.lit(1 - at), F.col("n") - 1)
    ).otherwise(F.lit(at) * F.pow(F.lit(1 - at), F.col("n") - F.col("i")))
    top = tidx.agg(F.sum(w_top * F.col("y")).alias("top_ses"))
    shares = bottom.crossJoin(F.broadcast(top))
    shares = bounded_window_input(shares, label="q_hier share frame")
    w_all = Window.partitionBy()
    return shares.select(
        F.col("k").alias("series"),
        F.round("ses", 6).alias("bu_forecast"),
        F.round(
            F.col("recent") / F.sum("recent").over(w_all), 6
        ).alias("td_share"),
        F.round(
            F.col("recent")
            / F.sum("recent").over(w_all)
            * F.col("top_ses"),
            6,
        ).alias("td_forecast"),
        F.round(F.sum("ses").over(w_all), 6).alias("bu_total"),
        F.round("top_ses", 6).alias("top_forecast"),
    ).orderBy("series")


# --------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis
# --------------------------------------------------------------------------
HURST_BLOCKS = (5, 10, 15, 30)


@query(
    "q_hurst_exponent",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             CAST(cents AS DOUBLE) / 100 AS x
      FROM d
    ),
    n AS (SELECT count(*) AS n FROM idx),
    blocks AS (
      {" UNION ALL ".join(
        f"SELECT {m} AS m, t // {m} AS blk, t, x FROM idx, n"
        f" WHERE t < (n.n // {m}) * {m}"
        for m in HURST_BLOCKS)}
    ),
    bstat AS (
      SELECT m, blk, avg(x) AS mu,
             sqrt(avg(x * x) - avg(x) * avg(x)) AS s
      FROM blocks GROUP BY 1, 2
    ),
    dev AS (
      SELECT b.m, b.blk,
             sum(b.x - st.mu) OVER (PARTITION BY b.m, b.blk ORDER BY b.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
      FROM blocks b JOIN bstat st ON st.m = b.m AND st.blk = b.blk
    ),
    rs AS (
      SELECT d.m, d.blk, max(d.z) - min(d.z) AS r, max(st.s) AS s
      FROM dev d JOIN bstat st ON st.m = d.m AND st.blk = d.blk
      GROUP BY 1, 2
    ),
    per_m AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             avg(r / s) AS mean_rs
      FROM rs WHERE s > 0 GROUP BY m
    ),
    fit AS (
      SELECT (sum(ln(CAST(m AS DOUBLE)) * ln(mean_rs))
              - sum(ln(CAST(m AS DOUBLE))) * sum(ln(mean_rs)) / count(*))
             / (sum(ln(CAST(m AS DOUBLE)) * ln(CAST(m AS DOUBLE)))
                - sum(ln(CAST(m AS DOUBLE))) * sum(ln(CAST(m AS DOUBLE)))
                  / count(*)) AS h
      FROM per_m
    )
    SELECT p.m, p.n_blocks, round(p.mean_rs, 6) AS mean_rs,
           round(f.h, 6) AS hurst_h
    FROM per_m p, fit f ORDER BY p.m
    """,
)
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969): per block size m ∈ {HURST_BLOCKS},
    split the daily revenue series into ⌊n/m⌋ blocks, compute R/S =
    (range of cumulative mean-deviations) / (population std) per
    block, and fit ln E[R/S] ~ H·ln m — H≈0.5 is a memoryless walk,
    H>0.5 long-range persistence (trending days cluster), H<0.5
    mean-reversion: the long-memory diagnostic the lag-limited
    q_ljung_box / q_autocorrelation pair cannot see.

    Scale: the series is the day-domain rollup; blocks are index
    arithmetic over it, the cumulative deviation is a window
    partitioned by (m, block), and the H fit is a closed-form OLS
    over ≤|{HURST_BLOCKS}| points.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_hurst day series")
    idx = d.select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        (F.col("cents").cast("double") / 100).alias("x"),
    )
    n = idx.agg(F.count(F.lit(1)).alias("n"))
    blocks = None
    for m in HURST_BLOCKS:
        b = (
            idx.crossJoin(F.broadcast(n))
            .filter(F.col("t") < (F.col("n") / m).cast("long") * m)
            .select(
                F.lit(m).alias("m"),
                F.expr(f"t DIV {m}").alias("blk"),
                "t",
                "x",
            )
        )
        blocks = b if blocks is None else blocks.unionByName(b)
    bstat = blocks.groupBy("m", "blk").agg(
        F.avg("x").alias("mu"),
        F.sqrt(
            F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
        ).alias("s"),
    )
    wz = (
        Window.partitionBy("m", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = blocks.join(F.broadcast(bstat), ["m", "blk"]).select(
        "m", "blk", F.sum(F.col("x") - F.col("mu")).over(wz).alias("z")
    )
    rs = (
        dev.groupBy("m", "blk")
        .agg((F.max("z") - F.min("z")).alias("r"))
        .join(F.broadcast(bstat), ["m", "blk"])
        .filter(F.col("s") > 0)
        .select("m", "blk", (F.col("r") / F.col("s")).alias("rs"))
    )
    per_m = rs.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_blocks"), F.avg("rs").alias("mean_rs")
    )
    lx = F.log(F.col("m").cast("double"))
    ly = F.log("mean_rs")
    fit = per_m.agg(
        (
            (F.sum(lx * ly) - F.sum(lx) * F.sum(ly) / F.count(F.lit(1)))
            / (
                F.sum(lx * lx)
                - F.sum(lx) * F.sum(lx) / F.count(F.lit(1))
            )
        ).alias("h")
    )
    return (
        per_m.crossJoin(F.broadcast(fit))
        .select(
            "m",
            F.col("n_blocks").cast("long").alias("n_blocks"),
            F.round("mean_rs", 6).alias("mean_rs"),
            F.round("h", 6).alias("hurst_h"),
        )
        .orderBy("m")
    )


# --------------------------------------------------------------------------
# Periodogram at candidate periods (exact DFT sums)
# --------------------------------------------------------------------------
PERIODOGRAM_MAX_P = 15
_TWO_PI = "6.283185307179586"


@query(
    "q_periodogram",
    oracle=f"""
    -- deterministic at any scale: the mean is exact (BIGINT cents sum,
    -- one division) and the DFT projections fold in t order on both
    -- engines — unordered float sums of ~1e9-magnitude terms flipped a
    -- 6dp digit at sf1.0 (round-11 second-decade parity audit)
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             CAST(cents AS DOUBLE) / 100 AS x
      FROM d
    ),
    mu AS (
      SELECT CAST(sum(CAST(round(x * 100, 0) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*)) AS mu,
             count(*) AS n
      FROM idx
    ),
    terms AS (
      SELECT p.p,
             -- trig basis quantized to 8dp: JVM Math.cos and DuckDB
             -- libm differ by 1 ulp for some arguments, which 1e7
             -- magnitudes amplify past the 6dp grid (sf1.0 audit)
             list_reduce(list((i.x - mu.mu) * round(cos({_TWO_PI} * i.t / p.p), 8)
                              ORDER BY i.t), (u, v) -> u + v) AS a,
             list_reduce(list((i.x - mu.mu) * round(sin({_TWO_PI} * i.t / p.p), 8)
                              ORDER BY i.t), (u, v) -> u + v) AS b,
             max(mu.n) AS n
      FROM idx i, mu, unnest(generate_series(2, {PERIODOGRAM_MAX_P})) p(p)
      GROUP BY p.p
    ),
    pw AS MATERIALIZED (
      SELECT p, 2.0 * (a * a + b * b) / n AS power FROM terms
    ),
    tot AS (SELECT sum(power) AS tp, max(round(power, 6)) AS mx FROM pw)
    SELECT CAST(p AS BIGINT) AS period,
           round(power, 6) AS power,
           round(power / t.tp, 6) AS power_share,
           -- 6dp-rounded comparison: raw float equality against a
           -- recomputed max can miss by an ulp
           round(power, 6) = t.mx AS is_dominant
    FROM pw, tot t ORDER BY period
    """,
)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram at candidate periods 2..{PERIODOGRAM_MAX_P} days
    (Schuster 1898): power I(p) = 2(a² + b²)/n with a,b the exact
    cosine/sine projections of the demeaned daily series — the
    frequency-domain seasonality detector beside the time-domain
    q_autocorrelation and the decomposition q_stl_decompose (whose
    7-day choice this query justifies or indicts). The DFT sums are
    plain order-insensitive aggregates — no FFT recursion, no
    sequential anything — so the whole spectrum is one grouped
    aggregate over (period × day) rows.

    Scale: the series is the day-domain rollup; the period fan-out
    multiplies it by |candidate periods| (~14×|days| rows), one
    map-side-combined groupBy.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_periodogram day series")
    idx = d.select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        (F.col("cents").cast("double") / 100).alias("x"),
    )
    # exact mean (BIGINT cents sum, one division) + t-ordered folds —
    # mirrors the oracle term-for-term; see oracle comment
    mu = idx.agg(
        (
            F.sum(F.round(F.col("x") * 100, 0).cast("long")).cast("double")
            / (100.0 * F.count(F.lit(1)))
        ).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    ps = spark.range(2, PERIODOGRAM_MAX_P + 1).select(
        F.col("id").alias("p")
    )
    two_pi = float(_TWO_PI)

    def fold(term):
        return F.expr(
            "aggregate(transform(array_sort(collect_list(struct(t, "
            + term
            + " AS v))), s -> s.v), 0D, (u, x) -> u + x)"
        )

    terms = (
        idx.crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(ps))
        .withColumn(
            "ca",
            (F.col("x") - F.col("mu"))
            * F.round(F.cos(F.lit(two_pi) * F.col("t") / F.col("p")), 8),
        )
        .withColumn(
            "cb",
            (F.col("x") - F.col("mu"))
            * F.round(F.sin(F.lit(two_pi) * F.col("t") / F.col("p")), 8),
        )
        .groupBy("p")
        .agg(
            fold("ca").alias("a"),
            fold("cb").alias("b"),
            F.max("n").alias("n"),
        )
    )
    pw = terms.select(
        "p",
        (
            2.0
            * (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
            / F.col("n")
        ).alias("power"),
    )
    tot = pw.agg(
        F.sum("power").alias("tp"),
        F.max(F.round("power", 6)).alias("mx"),
    )
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            F.col("p").cast("long").alias("period"),
            F.round("power", 6).alias("power"),
            F.round(F.col("power") / F.col("tp"), 6).alias("power_share"),
            (F.round("power", 6) == F.col("mx")).alias("is_dominant"),
        )
        .orderBy("period")
    )


# --------------------------------------------------------------------------
# Seasonal Mann-Kendall trend test (weekday-stratified)
# --------------------------------------------------------------------------
@query(
    "q_seasonal_mann_kendall",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    obs AS (SELECT day % 7 AS season, day, cents FROM d),
    pairs AS (
      SELECT a.season,
             CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM obs a JOIN obs b ON b.season = a.season AND b.day > a.day
      GROUP BY a.season
    ),
    per AS (
      SELECT o.season, CAST(count(*) AS BIGINT) AS n,
             coalesce(max(p.s), 0) AS s,
             count(*) * (count(*) - 1.0) * (2 * count(*) + 5) / 18
               AS var_s
      FROM obs o LEFT JOIN pairs p ON p.season = o.season
      GROUP BY o.season
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(s) AS BIGINT) AS s_total,
             sum(var_s) AS var_total
      FROM per
    )
    SELECT n_seasons, s_total, round(var_total, 6) AS var_total,
           round(CASE WHEN s_total > 0 THEN (s_total - 1) / sqrt(var_total)
                      WHEN s_total < 0 THEN (s_total + 1) / sqrt(var_total)
                      ELSE 0.0 END, 6) AS z
    FROM tot
    """,
)
def q_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984): the MK
    S statistic computed WITHIN each weekday stratum (day mod 7 — an
    engine-identical integer, no locale-dependent dayofweek) and
    summed across seasons, with the summed null variance and the
    continuity-corrected Z — the trend test that a weekly cycle
    cannot fool, where the plain q_mann_kendall mixes Mondays against
    Saturdays and reads seasonality as trend. No-tie variance form
    (exact integer cents make ties measure-zero; a tie contributes
    sign 0 and mildly overstates the variance — conservative).

    Scale: the pair join is per-season over the day-domain rollup
    (O((n/7)²·7) on a bounded frame); everything else is two tiny
    aggregates.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    obs = d.select((F.col("day") % 7).alias("season"), "day", "cents")
    a, b = obs.alias("a"), obs.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("b.season") == F.col("a.season"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .groupBy(F.col("a.season").alias("season"))
        .agg(
            F.sum(
                F.when(F.col("b.cents") > F.col("a.cents"), 1)
                .when(F.col("b.cents") < F.col("a.cents"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    per = (
        obs.groupBy("season")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(pairs, "season", "left")
        .select(
            "season",
            F.coalesce("s", F.lit(0)).alias("s"),
            (
                F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5) / 18
            ).alias("var_s"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n_seasons"),
        F.sum("s").alias("s_total"),
        F.sum("var_s").alias("var_total"),
    )
    z = (
        F.when(
            F.col("s_total") > 0,
            (F.col("s_total") - 1) / F.sqrt("var_total"),
        )
        .when(
            F.col("s_total") < 0,
            (F.col("s_total") + 1) / F.sqrt("var_total"),
        )
        .otherwise(F.lit(0.0))
    )
    return tot.select(
        F.col("n_seasons").cast("long").alias("n_seasons"),
        F.col("s_total").cast("long").alias("s_total"),
        F.round("var_total", 6).alias("var_total"),
        F.round(z, 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Bradley-Terry strengths from daily pairwise comparisons
# --------------------------------------------------------------------------
BT_ITERS = 3


@query(
    "q_bradley_terry",
    oracle=f"""
    WITH ev AS (
      SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    duel AS (
      SELECT a.k AS i, b.k AS j,
             CAST(count(*) FILTER (a.y > b.y) AS BIGINT) AS w
      FROM ev a JOIN ev b ON a.day = b.day AND a.k != b.k
      GROUP BY 1, 2
    ),
    nmat AS (
      SELECT d.i, d.j, d.w, d.w + r.w AS n
      FROM duel d JOIN duel r ON r.i = d.j AND r.j = d.i
    ),
    wins AS (SELECT i, CAST(sum(w) AS BIGINT) AS wi FROM nmat GROUP BY i),
    p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM wins),
    it1 AS (
      SELECT w.i, w.wi / sum(m.n / (pi.p + pj.p)) AS p
      FROM wins w
        JOIN nmat m ON m.i = w.i
        JOIN p0 pi ON pi.i = m.i
        JOIN p0 pj ON pj.i = m.j
      GROUP BY w.i, w.wi
    ),
    it2 AS (
      SELECT w.i, w.wi / sum(m.n / (pi.p + pj.p)) AS p
      FROM wins w
        JOIN nmat m ON m.i = w.i
        JOIN it1 pi ON pi.i = m.i
        JOIN it1 pj ON pj.i = m.j
      GROUP BY w.i, w.wi
    ),
    it3 AS (
      SELECT w.i, w.wi / sum(m.n / (pi.p + pj.p)) AS p
      FROM wins w
        JOIN nmat m ON m.i = w.i
        JOIN it2 pi ON pi.i = m.i
        JOIN it2 pj ON pj.i = m.j
      GROUP BY w.i, w.wi
    ),
    norm AS (SELECT sum(p) AS z FROM it3)
    SELECT t.i AS event_type, w.wi AS wins,
           round(t.p / n.z, 6) AS strength,
           CAST(row_number() OVER (ORDER BY round(t.p / n.z, 6) DESC, t.i)
                AS BIGINT) AS rank
    FROM it3 t, norm n JOIN wins w ON w.i = t.i
    ORDER BY rank
    """,
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry paired-comparison strengths (Bradley & Terry
    1952) fit with {BT_ITERS} unrolled Zermelo/MM iterations
    (Hunter 2004): each day is a tournament round where event type i
    "beats" j if its daily count is higher; p_i ← W_i / Σ_j
    n_ij/(p_i+p_j), normalized to a probability vector — the model
    that turns win/loss tallies into calibrated strengths with
    P(i beats j) = p_i/(p_i+p_j), the LLM-eval pairwise-preference
    aggregation (arena-style ratings) in miniature. Fixed unrolled
    iterations keep the plan static and oracle-checkable (the
    q_ipf_raking pattern); ties contribute to neither side.

    Scale: comparisons live on the (type × day) rollup self-joined by
    day; every MM step is a join over the |types|²-row duel matrix —
    bounded by the item domain, never the corpus.
    """
    e = load_table(spark, sf_dir, "events")
    ev = e.groupBy(
        F.col("event_type").alias("k"),
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a, b = ev.alias("a"), ev.alias("b")
    duel = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.k") != F.col("b.k")),
        )
        .groupBy(F.col("a.k").alias("i"), F.col("b.k").alias("j"))
        .agg(F.count_if(F.col("a.y") > F.col("b.y")).alias("w"))
    )
    rev = duel.select(
        F.col("j").alias("i"), F.col("i").alias("j"), F.col("w").alias("wr")
    )
    nmat = duel.join(rev, ["i", "j"]).select(
        "i", "j", "w", (F.col("w") + F.col("wr")).alias("n")
    )
    # checkpoint the shared matrices and each MM round: 3 nested
    # iterations of 4 joins otherwise compound the logical plan (the
    # q_kcore_peel lineage lesson); the frames are |types|-bounded
    nmat = nmat.transform(eager_checkpoint)
    wins = nmat.groupBy("i").agg(F.sum("w").alias("wi")).transform(eager_checkpoint)
    p = wins.select("i", F.lit(1.0).alias("p"))
    for _ in range(BT_ITERS):
        pi = p.withColumnsRenamed({"p": "p_i"})
        pj = p.withColumnsRenamed({"i": "j", "p": "p_j"})
        p = stats_reset_checkpoint(
            nmat.join(pi, "i")
            .join(pj, "j")
            .groupBy("i")
            .agg(
                F.sum(F.col("n") / (F.col("p_i") + F.col("p_j"))).alias(
                    "den"
                )
            )
            .join(wins, "i")
            .select("i", (F.col("wi") / F.col("den")).alias("p"))
        )
    z = p.agg(F.sum("p").alias("z"))
    strength = F.round(F.col("p") / F.col("z"), 6)
    out = (
        p.crossJoin(F.broadcast(z))
        .join(wins, "i")
        .select(
            F.col("i").alias("event_type"),
            F.col("wi").cast("long").alias("wins"),
            strength.alias("strength"),
        )
    )
    out = bounded_window_input(out, label="q_bradley_terry item table")
    return out.select(
        "event_type",
        "wins",
        "strength",
        F.row_number()
        .over(Window.orderBy(F.desc("strength"), "event_type"))
        .cast("long")
        .alias("rank"),
    ).orderBy("rank")


# --------------------------------------------------------------------------
# Randomness diagnostics on the daily purchase series: runs test,
# turning-point test, von Neumann ratio
# --------------------------------------------------------------------------
@query(
    "q_runs_test",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    med AS (SELECT median(cents) AS med FROM d),
    s AS (
      SELECT day, cents > med AS above,
             lag(cents > med) OVER (ORDER BY day) AS prev
      FROM d, med WHERE cents <> med
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE above) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE NOT above) AS BIGINT) AS n2,
             CAST(1 + count(*) FILTER (WHERE prev IS NOT NULL
                                         AND above <> prev) AS BIGINT) AS runs
      FROM s
    )
    SELECT n, n1, n2, runs,
           round(2.0 * n1 * n2 / n + 1, 6) AS mean_runs,
           round((runs - (2.0 * n1 * n2 / n + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z
    FROM agg
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily purchase series: code
    each day above/below the series median (days exactly AT the median
    dropped, the textbook treatment), count maximal same-sign runs,
    and standardize against the exact conditional mean 2n₁n₂/N + 1
    and variance — too FEW runs means positive serial dependence, too
    many means oscillation; either falsifies the i.i.d. hypothesis
    metrics dashboards quietly assume.

    Scale: corpus → one map-side-combined daily rollup; the median,
    lag and counts all live on the ≤|days|-row frame (guarded window).
    """
    d = _daily_purchase_cents(spark, sf_dir)
    med = d.agg(F.expr("median(cents)").alias("med"))
    s = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("med"))
        .select("day", (F.col("cents") > F.col("med")).alias("above"))
    )
    s = bounded_window_input(s, label="q_runs_test day spine")
    s = s.withColumn("prev", F.lag("above").over(Window.orderBy("day")))
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("above")).cast("long").alias("n1"),
        F.count_if(~F.col("above")).cast("long").alias("n2"),
        (
            1
            + F.count_if(
                F.col("prev").isNotNull() & (F.col("above") != F.col("prev"))
            )
        )
        .cast("long")
        .alias("runs"),
    )
    n, n1, n2 = (F.col(c).cast("double") for c in ("n", "n1", "n2"))
    mean = 2.0 * n1 * n2 / n + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1))
    return agg.select(
        "n",
        "n1",
        "n2",
        "runs",
        F.round(mean, 6).alias("mean_runs"),
        F.round((F.col("runs") - mean) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "q_turning_points",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    s AS (
      SELECT cents,
             lag(cents)  OVER (ORDER BY day) AS prev,
             lead(cents) OVER (ORDER BY day) AS next
      FROM d
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE (cents > prev AND cents > next)
                                      OR (cents < prev AND cents < next))
               AS BIGINT) AS turning_points
      FROM s
    )
    SELECT n, turning_points,
           round(2.0 * (n - 2) / 3, 6) AS expected_tp,
           round((turning_points - 2.0 * (n - 2) / 3)
                 / sqrt((16.0 * n - 29) / 90), 6) AS z
    FROM agg
    """,
)
def q_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test (Kendall's classic randomness check) on the
    daily purchase series: count strict local maxima/minima; an i.i.d.
    series has E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90 — markedly
    fewer turning points betray trend, markedly more betray
    negative-lag-1 oscillation. The cheap first look before the
    heavier ``q_ljung_box`` / ``q_autocorrelation`` machinery.

    Scale: daily rollup, one guarded lag/lead window, one aggregate.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_turning_points day spine")
    w = Window.orderBy("day")
    s = d.select(
        "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("next"),
    )
    is_tp = ((F.col("cents") > F.col("prev")) & (F.col("cents") > F.col("next"))) | (
        (F.col("cents") < F.col("prev")) & (F.col("cents") < F.col("next"))
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(is_tp).cast("long").alias("turning_points"),
    )
    n = F.col("n").cast("double")
    exp_tp = 2.0 * (n - 2) / 3
    return agg.select(
        "n",
        "turning_points",
        F.round(exp_tp, 6).alias("expected_tp"),
        F.round(
            (F.col("turning_points") - exp_tp)
            / F.sqrt((16.0 * n - 29) / 90),
            6,
        ).alias("z"),
    )


@query(
    "q_von_neumann_ratio",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    s AS (
      SELECT CAST(cents AS DOUBLE) / 100 AS x,
             lag(CAST(cents AS DOUBLE) / 100) OVER (ORDER BY day) AS prev
      FROM d
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(pow(x - prev, 2)) FILTER (WHERE prev IS NOT NULL) AS ssd,
             var_pop(x) * count(*) AS css
      FROM s
    )
    SELECT n,
           round(ssd / (n - 1), 6) AS mssd,
           round((ssd / (n - 1)) / (css / n) / 2, 6) AS vn_half,
           round(((ssd / (n - 1)) / (css / n) - 2)
                 / sqrt(4.0 * (n - 2) / (CAST(n AS DOUBLE) * n - 1)), 6)
             AS z
    FROM agg
    """,
)
def q_von_neumann_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Neumann ratio (1941) on daily purchase dollars: the mean
    square SUCCESSIVE difference Σ(xₜ₊₁−xₜ)²/(n−1) over the population
    variance — the oldest serial-correlation diagnostic (VN ≈ 2 for
    white noise, < 2 under positive autocorrelation; VN/2 is
    1 − lag-1 autocorrelation to first order, and the same statistic
    underlies the regression-residual Durbin-Watson). Standardized with
    the asymptotic variance 4(n−2)/(n²−1).

    Scale: daily rollup, one guarded lag window, one aggregate — the
    variance comes from var_pop's sufficient statistics, not a
    centering join.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_von_neumann day spine")
    s = (
        d.select("day", (F.col("cents").cast("double") / 100).alias("x"))
        .withColumn("prev", F.lag("x").over(Window.orderBy("day")))
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("prev").isNotNull(), F.pow(F.col("x") - F.col("prev"), 2)
            )
        ).alias("ssd"),
        (F.var_pop("x") * F.count(F.lit(1))).alias("css"),
    )
    n = F.col("n").cast("double")
    mssd = F.col("ssd") / (n - 1)
    vn = mssd / (F.col("css") / n)
    return agg.select(
        "n",
        F.round(mssd, 6).alias("mssd"),
        F.round(vn / 2, 6).alias("vn_half"),
        F.round((vn - 2) / F.sqrt(4.0 * (n - 2) / (n * n - 1)), 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Spectral entropy over the full Fourier frequency grid
# --------------------------------------------------------------------------
@query(
    "q_spectral_entropy",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             CAST(cents AS DOUBLE) / 100 AS x
      FROM d
    ),
    mu AS (SELECT avg(x) AS mu, count(*) AS n FROM idx),
    terms AS (
      SELECT k.k,
             sum((i.x - mu.mu) * cos({_TWO_PI} * i.t * k.k / mu.n)) AS a,
             sum((i.x - mu.mu) * sin({_TWO_PI} * i.t * k.k / mu.n)) AS b
      FROM idx i, mu,
           unnest(generate_series(1, (SELECT n // 2 FROM mu))) k(k)
      GROUP BY k.k
    ),
    pw AS (
      SELECT a * a + b * b AS power FROM terms
    ),
    p AS (
      SELECT power / sum(power) OVER () AS p, count(*) OVER () AS m
      FROM pw
    )
    SELECT CAST(max(m) AS BIGINT) AS n_freqs,
           round(-sum(CASE WHEN p > 0 THEN p * ln(p) END), 6) AS h_spectral,
           round(-sum(CASE WHEN p > 0 THEN p * ln(p) END) / ln(max(m)), 6)
             AS h_normalized,
           round(max(p), 6) AS max_share
    FROM p
    """,
)
def q_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the daily purchase series: Shannon entropy
    of the NORMALIZED periodogram over the full Fourier grid
    f_k = k/n, k = 1..⌊n/2⌋ — near 0 when one frequency carries all
    the power (pure seasonality), near 1 (normalized) for white noise.
    The single-scalar "how forecastable is this series?" feature
    (Goerg 2013; the `forecastability` column of every ts feature
    library), complementing ``q_periodogram``'s per-period powers.

    Scale: same shape as ``q_periodogram`` — DFT projections as plain
    grouped aggregates over the (frequency × day) fan-out of the
    day-domain rollup, ~n²/2 tiny rows, no FFT recursion.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_spectral_entropy day series")
    idx = d.select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        (F.col("cents").cast("double") / 100).alias("x"),
    )
    mu = idx.agg(F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n"))
    n_val = mu  # broadcast twice below
    ks = (
        idx.crossJoin(F.broadcast(mu))
        .select((F.col("t") + 1).alias("k"), F.col("n"))
        .filter(F.col("k") <= F.floor(F.col("n") / 2))
        .select("k")
    )
    two_pi = 6.283185307179586
    terms = (
        idx.crossJoin(F.broadcast(n_val))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                (F.col("x") - F.col("mu"))
                * F.cos(F.lit(two_pi) * F.col("t") * F.col("k") / F.col("n"))
            ).alias("a"),
            F.sum(
                (F.col("x") - F.col("mu"))
                * F.sin(F.lit(two_pi) * F.col("t") * F.col("k") / F.col("n"))
            ).alias("b"),
        )
    )
    pw = terms.select(
        (F.col("a") * F.col("a") + F.col("b") * F.col("b")).alias("power")
    )
    pw = bounded_window_input(pw, label="q_spectral_entropy freq grid")
    wt = Window.partitionBy()
    p = pw.select(
        (F.col("power") / F.sum("power").over(wt)).alias("p"),
        F.count(F.lit(1)).over(wt).alias("m"),
    )
    h = -F.sum(F.when(F.col("p") > 0, F.col("p") * F.log("p")))
    return p.agg(
        F.max("m").cast("long").alias("n_freqs"),
        F.round(h, 6).alias("h_spectral"),
        F.round(h / F.log(F.max("m").cast("double")), 6).alias(
            "h_normalized"
        ),
        F.round(F.max("p"), 6).alias("max_share"),
    )


# --------------------------------------------------------------------------
# Partial autocorrelation (Durbin-Levinson closed form, lags 1..3)
# --------------------------------------------------------------------------
@query(
    "q_pacf_durbin_levinson",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             CAST(cents AS DOUBLE) / 100 AS x
      FROM d
    ),
    mu AS (SELECT avg(x) AS mu, count(*) AS n FROM idx),
    rho AS (
      SELECT
        sum((a.x - mu) * (a.x - mu)) AS c0,
        sum(CASE WHEN a.t > 1 THEN (a.x - mu) * (l1.x - mu) END) AS c1r,
        sum(CASE WHEN a.t > 2 THEN (a.x - mu) * (l2.x - mu) END) AS c2r,
        sum(CASE WHEN a.t > 3 THEN (a.x - mu) * (l3.x - mu) END) AS c3r
      FROM idx a
      LEFT JOIN idx l1 ON l1.t = a.t - 1
      LEFT JOIN idx l2 ON l2.t = a.t - 2
      LEFT JOIN idx l3 ON l3.t = a.t - 3
      CROSS JOIN mu
    ),
    r AS (
      SELECT c1r / c0 AS r1, c2r / c0 AS r2, c3r / c0 AS r3 FROM rho
    ),
    dl AS (
      SELECT r1, r2, r3,
             r1 AS p1,
             (r2 - r1 * r1) / (1 - r1 * r1) AS p2
      FROM r
    ),
    dl2 AS (
      SELECT r1, r2, r3, p1, p2, r1 * (1 - p2) AS phi21 FROM dl
    )
    SELECT lag, round(acf, 6) AS acf, round(pacf, 6) AS pacf
    FROM (
      SELECT 1 AS lag, r1 AS acf, p1 AS pacf FROM dl2
      UNION ALL SELECT 2, r2, p2 FROM dl2
      UNION ALL SELECT 3, r3,
        (r3 - phi21 * r2 - p2 * r1) / (1 - phi21 * r1 - p2 * r2) FROM dl2
    ) ORDER BY lag
    """,
)
def q_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily purchase series at lags
    1..3 via the Durbin-Levinson recursion in CLOSED FORM: φ₁₁ = ρ₁,
    φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²), and φ₃₃ from the level-2 coefficients —
    the AR-order selector (an AR(p) series has φ_kk ≈ 0 beyond p) that
    ``q_autocorrelation`` alone cannot provide because trailing ACF
    lags inherit earlier ones. ACF here is the standard BIASED
    estimator ρ_k = Σ_{{t>k}}(x_t−x̄)(x_{{t−k}}−x̄)/Σ(x_t−x̄)² (full-series
    denominator, the statsmodels default), unlike
    ``q_autocorrelation``'s per-pair Pearson convention — both
    documented, deliberately different estimators.

    Scale: day-domain rollup; the three lag alignments are
    row-number self-joins on the ≤|days| frame; PACF itself is scalar
    arithmetic on the three ρ̂'s.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_pacf day series")
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (F.col("cents").cast("double") / 100).alias("x"),
    )
    mu = idx.agg(F.avg("x").alias("mu"))
    a = idx.crossJoin(F.broadcast(mu))
    for k in (1, 2, 3):
        lk = idx.select(
            (F.col("t") + k).alias("t"), F.col("x").alias(f"x{k}")
        )
        a = a.join(lk, "t", "left")
    xm = F.col("x") - F.col("mu")
    rho = a.agg(
        F.sum(xm * xm).alias("c0"),
        F.sum(xm * (F.col("x1") - F.col("mu"))).alias("c1r"),
        F.sum(xm * (F.col("x2") - F.col("mu"))).alias("c2r"),
        F.sum(xm * (F.col("x3") - F.col("mu"))).alias("c3r"),
    )
    r = rho.select(
        (F.col("c1r") / F.col("c0")).alias("r1"),
        (F.col("c2r") / F.col("c0")).alias("r2"),
        (F.col("c3r") / F.col("c0")).alias("r3"),
    )
    p2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    dl = r.select(
        "r1",
        "r2",
        "r3",
        F.col("r1").alias("p1"),
        p2.alias("p2"),
        (F.col("r1") * (1 - p2)).alias("phi21"),
    )
    p3 = (
        F.col("r3") - F.col("phi21") * F.col("r2") - F.col("p2") * F.col("r1")
    ) / (1 - F.col("phi21") * F.col("r1") - F.col("p2") * F.col("r2"))
    out = dl.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("lag"),
                    F.col("r1").alias("acf"),
                    F.col("p1").alias("pacf"),
                ),
                F.struct(
                    F.lit(2).alias("lag"),
                    F.col("r2").alias("acf"),
                    F.col("p2").alias("pacf"),
                ),
                F.struct(
                    F.lit(3).alias("lag"),
                    F.col("r3").alias("acf"),
                    p3.alias("pacf"),
                ),
            )
        ).alias("s")
    )
    return out.select(
        F.col("s.lag").alias("lag"),
        F.round("s.acf", 6).alias("acf"),
        F.round("s.pacf", 6).alias("pacf"),
    ).orderBy("lag")


# --------------------------------------------------------------------------
# Holt-Winters additive with classical-decomposition seasonal indices
# --------------------------------------------------------------------------
HW_ALPHA = 0.3
HW_BETA = 0.1
HW_PERIOD = 7


@query(
    "q_holt_winters_fixed_season",
    oracle=f"""
    WITH RECURSIVE d AS ({_DAILY_SQL}),
    dow AS (
      SELECT day % {HW_PERIOD} AS dow,
             avg(CAST(cents AS DOUBLE)) AS m_dow
      FROM d GROUP BY 1
    ),
    g AS (SELECT avg(CAST(cents AS DOUBLE)) AS m_all FROM d),
    adj AS (
      SELECT d.day, CAST(d.cents AS DOUBLE) - (dow.m_dow - g.m_all) AS a,
             dow.m_dow - g.m_all AS s
      FROM d JOIN dow ON d.day % {HW_PERIOD} = dow.dow, g
    ),
    s AS (
      SELECT list(a ORDER BY day) AS vals,
             CAST(count(*) AS BIGINT) AS n_days,
             max(day) AS last_day
      FROM adj
    ),
    step AS (
      SELECT 2 AS t, vals[2] AS l, vals[2] - vals[1] AS b,
             CAST(0.0 AS DOUBLE) AS e
      FROM s
      UNION ALL
      SELECT step.t + 1,
             {HW_ALPHA} * s.vals[step.t + 1]
               + {1 - HW_ALPHA} * (step.l + step.b),
             {HW_BETA} * ({HW_ALPHA} * s.vals[step.t + 1]
                 + {1 - HW_ALPHA} * (step.l + step.b) - step.l)
               + {1 - HW_BETA} * step.b,
             step.e + abs(s.vals[step.t + 1] - (step.l + step.b))
      FROM step, s WHERE step.t < s.n_days
    ),
    fc AS (
      SELECT s.n_days, step.l, step.b, step.e, s.last_day
      FROM step, s WHERE step.t = s.n_days
    )
    SELECT fc.n_days,
           round(fc.l / 100, 6) AS level_dollars,
           round(fc.b / 100, 6) AS trend_dollars,
           round(fc.e / (fc.n_days - 2) / 100, 6) AS mae_deseason,
           round((fc.l + fc.b
                  + (SELECT dow.m_dow - g.m_all FROM dow, g
                     WHERE dow.dow = (fc.last_day + 1) % {HW_PERIOD}))
                 / 100, 6) AS forecast_1d,
           round((fc.l + 7 * fc.b
                  + (SELECT dow.m_dow - g.m_all FROM dow, g
                     WHERE dow.dow = (fc.last_day + 7) % {HW_PERIOD}))
                 / 100, 6) AS forecast_7d
    FROM fc
    """,
)
def q_holt_winters_fixed_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive smoothing with the seasonal indices FROZEN
    at their classical-decomposition estimates (day-of-week mean minus
    grand mean): deseasonalize, run Holt's level/trend recurrence
    (α={HW_ALPHA}, β={HW_BETA}, the ``q_holt_linear`` fold verbatim)
    on the adjusted series, and re-seasonalize the forecasts — the
    standard practical variant when the seasonal pattern is stable and
    you want the recurrence state to stay 2 scalars instead of 2+m
    (full HW's coupled seasonal updates add m array slots to the fold
    state for marginal gain on a stable weekly cycle). Day-of-week is
    epoch_day % 7 — convention-free in both engines.

    Scale: seasonal indices are one order-insensitive groupBy over the
    day rollup; the fold runs once on |days| values in one task (the
    only correct plan for a sequential recurrence; see
    ``q_holt_linear``).
    """
    d = _daily_purchase_cents(spark, sf_dir)
    dow = d.groupBy((F.col("day") % HW_PERIOD).alias("dow")).agg(
        F.avg(F.col("cents").cast("double")).alias("m_dow")
    )
    g = d.agg(F.avg(F.col("cents").cast("double")).alias("m_all"))
    dow = dow.crossJoin(F.broadcast(g)).select(
        "dow", (F.col("m_dow") - F.col("m_all")).alias("s")
    )
    adj = d.join(
        F.broadcast(dow), d["day"] % HW_PERIOD == dow["dow"]
    ).select(
        "day", (F.col("cents").cast("double") - F.col("s")).alias("a")
    )
    s = adj.agg(
        F.expr("array_sort(collect_list(struct(day, a)))").alias("seq"),
        F.count(F.lit(1)).alias("n_days"),
        F.max("day").alias("last_day"),
    ).select(F.expr("transform(seq, x -> x.a)").alias("vals"), "n_days", "last_day")
    al, be = HW_ALPHA, HW_BETA
    fold = (
        "aggregate("
        " slice(vals, 3, size(vals) - 2),"
        " named_struct('l', vals[1], 'b', vals[1] - vals[0], 'e', 0.0D),"
        f" (acc, x) -> named_struct("
        f"   'l', {al} * x + {1 - al} * (acc.l + acc.b),"
        f"   'b', {be} * ({al} * x + {1 - al} * (acc.l + acc.b) - acc.l)"
        f"        + {1 - be} * acc.b,"
        f"   'e', acc.e + abs(x - (acc.l + acc.b))))"
    )
    out = s.select(
        "n_days",
        "last_day",
        F.expr(fold + ".l").alias("l"),
        F.expr(fold + ".b").alias("b"),
        F.expr(fold + ".e").alias("e"),
    )
    s1 = dow.select(F.col("dow").alias("d1"), F.col("s").alias("s1"))
    s7 = dow.select(F.col("dow").alias("d7"), F.col("s").alias("s7"))
    out = out.join(
        F.broadcast(s1), (F.col("last_day") + 1) % HW_PERIOD == F.col("d1")
    ).join(F.broadcast(s7), (F.col("last_day") + 7) % HW_PERIOD == F.col("d7"))
    return out.select(
        "n_days",
        F.round(F.col("l") / 100, 6).alias("level_dollars"),
        F.round(F.col("b") / 100, 6).alias("trend_dollars"),
        F.round(F.col("e") / (F.col("n_days") - 2) / 100, 6).alias(
            "mae_deseason"
        ),
        F.round((F.col("l") + F.col("b") + F.col("s1")) / 100, 6).alias(
            "forecast_1d"
        ),
        F.round((F.col("l") + 7 * F.col("b") + F.col("s7")) / 100, 6).alias(
            "forecast_7d"
        ),
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality + forecast-evaluation pair (Mincer-Zarnowitz,
# Diebold-Mariano) on the daily series
# --------------------------------------------------------------------------
@query(
    "q_jarque_bera",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    x AS (SELECT CAST(cents AS DOUBLE) / 100 AS x FROM d),
    mu AS (SELECT avg(x) AS mu FROM x),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             avg(pow(x.x - mu.mu, 2)) AS m2,
             avg(pow(x.x - mu.mu, 3)) AS m3,
             avg(pow(x.x - mu.mu, 4)) AS m4
      FROM x, mu
    )
    SELECT n AS n_days,
           round(m3 / pow(m2, 1.5), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis,
           round(n / 6.0 * (pow(m3 / pow(m2, 1.5), 2)
                 + pow(m4 / (m2 * m2) - 3, 2) / 4), 6) AS jarque_bera
    FROM c
    """,
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test (1980) on daily purchase dollars:
    JB = n/6·(S² + K²/4) from the sample skewness and excess kurtosis
    — the moment-based omnibus that every regression-residual
    diagnostic panel carries (χ²₂ under normality). Moments are
    computed DEMEANED-FIRST (one tiny mean pass, then central-moment
    aggregates): raw third/fourth moments of ~10⁸-cent daily totals
    would live at 10²⁴-10³² where double cancellation destroys the
    statistic; centered values are O(stddev) and safe at any scale.

    Scale: two aggregates over the day-domain rollup (mean, then
    central moments with the mean broadcast).
    """
    d = _daily_purchase_cents(spark, sf_dir)
    x = d.select((F.col("cents").cast("double") / 100).alias("x"))
    mu = x.agg(F.avg("x").alias("mu"))
    xc = x.crossJoin(F.broadcast(mu)).select(
        (F.col("x") - F.col("mu")).alias("e")
    )
    c = xc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.pow("e", 2)).alias("m2"),
        F.avg(F.pow("e", 3)).alias("m3"),
        F.avg(F.pow("e", 4)).alias("m4"),
    )
    skew = F.col("m3") / F.pow("m2", 1.5)
    kurt = F.col("m4") / (F.col("m2") * F.col("m2")) - 3
    return c.select(
        F.col("n").alias("n_days"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(
            F.col("n") / 6.0 * (F.pow(skew, 2) + F.pow(kurt, 2) / 4), 6
        ).alias("jarque_bera"),
    )


_LAGGED_PAIRS_SQL = f"""
      SELECT a.x AS y, l7.x AS f7, l1.x AS f1
      FROM (
        SELECT row_number() OVER (ORDER BY day) AS t,
               CAST(cents AS DOUBLE) / 100 AS x
        FROM ({_DAILY_SQL})
      ) a
      JOIN (
        SELECT row_number() OVER (ORDER BY day) AS t,
               CAST(cents AS DOUBLE) / 100 AS x
        FROM ({_DAILY_SQL})
      ) l7 ON l7.t = a.t - 7
      JOIN (
        SELECT row_number() OVER (ORDER BY day) AS t,
               CAST(cents AS DOUBLE) / 100 AS x
        FROM ({_DAILY_SQL})
      ) l1 ON l1.t = a.t - 1
"""


def _lagged_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, f7, f1): actual vs seasonal-naive (t−7) and naive (t−1)
    forecasts, for every day where both lags exist."""
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="tsstats forecast-pair day spine")
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (F.col("cents").cast("double") / 100).alias("x"),
    )
    l7 = idx.select((F.col("t") + 7).alias("t"), F.col("x").alias("f7"))
    l1 = idx.select((F.col("t") + 1).alias("t"), F.col("x").alias("f1"))
    return (
        idx.join(l7, "t")
        .join(l1, "t")
        .select(F.col("x").alias("y"), "f7", "f1")
    )


@query(
    "q_mincer_zarnowitz",
    oracle=f"""
    -- EXACT sufficient statistics in integer cents (HUGEINT sums),
    -- then one fixed closed-form double expression — no per-row float
    -- aggregate anywhere, so the regression is bit-identical across
    -- engines at any scale (the float-moment form flipped a 6dp
    -- boundary at sf1.0; round-11 second-decade parity audit).
    WITH p AS ({_LAGGED_PAIRS_SQL}),
    c AS (
      SELECT CAST(round(y * 100, 0) AS HUGEINT) AS cy,
             CAST(round(f7 * 100, 0) AS HUGEINT) AS cf
      FROM p
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(cy) AS sy, sum(cf) AS sf,
             sum(cy * cy) AS yy, sum(cf * cf) AS ff,
             sum(cy * cf) AS pp,
             sum((cy - cf) * (cy - cf)) AS ssr_c
      FROM c
    ),
    fit AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n * pp - sf * sy AS DOUBLE)
               / CAST(n * ff - sf * sf AS DOUBLE) AS b,
             CAST(sy AS DOUBLE) AS syd, CAST(sf AS DOUBLE) AS sfd,
             CAST(yy AS DOUBLE) AS yyd, CAST(ff AS DOUBLE) AS ffd,
             CAST(pp AS DOUBLE) AS ppd, CAST(ssr_c AS DOUBLE) AS ssrd
      FROM m
    ),
    ab AS (
      SELECT n, b, syd, sfd, yyd, ffd, ppd, ssrd,
             (syd - b * sfd) / n AS ac
      FROM fit
    ),
    sse AS (
      SELECT n, b, ac, ssrd,
             yyd + n * ac * ac + b * b * ffd
               - 2 * ac * syd - 2 * b * ppd + 2 * ac * b * sfd AS sse_c
      FROM ab
    )
    SELECT n AS n_days,
           round(ac / 100, 6) AS intercept,
           round(b, 6) AS slope,
           round((ssrd - sse_c) / 2 / (sse_c / (n - 2)), 6) AS f_joint
    FROM sse
    """,
)
def q_mincer_zarnowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mincer-Zarnowitz forecast-rationality regression (1969):
    actuals on the seasonal-naive forecast y_{{t-7}} — an UNBIASED,
    efficient forecast must give intercept 0 and slope 1, and the
    joint F = ((SSR_restricted − SSE)/2)/(SSE/(n−2)) tests exactly
    that (SSR_restricted = Σ(y−f)², the errors under (0,1)). Slope < 1
    reads "forecasts overshoot swings; shrink them" — the calibration
    verdict ``q_forecast_backtest``'s raw MAE cannot give.

    Scale: lag alignment is a row-number self-join on the day spine;
    the regression is closed-form from one moment aggregate plus one
    residual pass with the 2-scalar fit broadcast.
    """
    # exact sufficient statistics in integer cents (decimal(38,0)
    # sums), then one fixed closed-form double expression mirroring
    # the oracle term-for-term — no per-row float aggregate, so the
    # value is bit-identical across engines at any scale (the float
    # moments flipped a 6dp boundary at sf1.0; see oracle comment)
    p = _lagged_pairs(spark, sf_dir)
    dec = "decimal(38,0)"
    c = p.select(
        F.round(F.col("y") * 100, 0).cast(dec).alias("cy"),
        F.round(F.col("f7") * 100, 0).cast(dec).alias("cf"),
    )
    m = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cy").cast(dec).alias("sy"),
        F.sum("cf").cast(dec).alias("sf"),
        F.sum(F.col("cy") * F.col("cy")).cast(dec).alias("yy"),
        F.sum(F.col("cf") * F.col("cf")).cast(dec).alias("ff"),
        F.sum(F.col("cy") * F.col("cf")).cast(dec).alias("pp"),
        F.sum((F.col("cy") - F.col("cf")) * (F.col("cy") - F.col("cf")))
        .cast(dec)
        .alias("ssr_c"),
    )
    nd = F.col("n").cast(dec)
    fit = m.select(
        "n",
        (
            (nd * F.col("pp") - F.col("sf") * F.col("sy")).cast("double")
            / (nd * F.col("ff") - F.col("sf") * F.col("sf")).cast("double")
        ).alias("b"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sf").cast("double").alias("sfd"),
        F.col("yy").cast("double").alias("yyd"),
        F.col("ff").cast("double").alias("ffd"),
        F.col("pp").cast("double").alias("ppd"),
        F.col("ssr_c").cast("double").alias("ssrd"),
    ).withColumn("ac", (F.col("syd") - F.col("b") * F.col("sfd")) / F.col("n"))
    n, b, ac = F.col("n"), F.col("b"), F.col("ac")
    sse_c = (
        F.col("yyd")
        + n * ac * ac
        + b * b * F.col("ffd")
        - 2 * ac * F.col("syd")
        - 2 * b * F.col("ppd")
        + 2 * ac * b * F.col("sfd")
    )
    return fit.select(
        n.alias("n_days"),
        F.round(ac / 100, 6).alias("intercept"),
        F.round(b, 6).alias("slope"),
        F.round(
            (F.col("ssrd") - sse_c) / 2 / (sse_c / (n - 2)), 6
        ).alias("f_joint"),
    )


@query(
    "q_diebold_mariano",
    oracle=f"""
    WITH p AS ({_LAGGED_PAIRS_SQL}),
    d AS (
      SELECT pow(y - f7, 2) - pow(y - f1, 2) AS d,
             pow(y - f7, 2) AS l7, pow(y - f1, 2) AS l1
      FROM p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(avg(l7), 6) AS mse_seasonal_naive,
           round(avg(l1), 6) AS mse_naive,
           round(avg(d), 6) AS mean_loss_diff,
           round(avg(d) / sqrt(var_pop(d) / count(*)), 6) AS dm_stat
    FROM d
    """,
)
def q_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano equal-predictive-accuracy test (1995): squared-
    error loss differentials d_t between the seasonal-naive (t−7) and
    naive (t−1) one-step forecasts of daily revenue, DM =
    d̄/√(var(d)/n) — the test that turns "model A's MSE looks lower"
    into a statistic (negative here = seasonal-naive better). One-step
    losses carry no moving-average overlap, so the lag-0 variance is
    the textbook h=1 form (longer horizons would need the HAC sum —
    stated as the contract, not silently assumed).

    Scale: the same lag-aligned pair frame as ``q_mincer_zarnowitz``;
    the test is one aggregate over it.
    """
    p = _lagged_pairs(spark, sf_dir)
    d = p.select(
        (
            F.pow(F.col("y") - F.col("f7"), 2)
            - F.pow(F.col("y") - F.col("f1"), 2)
        ).alias("d"),
        F.pow(F.col("y") - F.col("f7"), 2).alias("l7"),
        F.pow(F.col("y") - F.col("f1"), 2).alias("l1"),
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg("l7"), 6).alias("mse_seasonal_naive"),
        F.round(F.avg("l1"), 6).alias("mse_naive"),
        F.round(F.avg("d"), 6).alias("mean_loss_diff"),
        F.round(
            F.avg("d") / F.sqrt(F.var_pop("d") / F.count(F.lit(1))), 6
        ).alias("dm_stat"),
    )


# --------------------------------------------------------------------------
# Pettitt change-point, Durbin-Watson, Kupiec POF backtest
# --------------------------------------------------------------------------
@query(
    "q_pettitt_test",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    vc AS (
      SELECT cents, count(*) AS c FROM d GROUP BY 1
    ),
    mr AS (
      SELECT cents,
             coalesce(sum(c) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1.0) / 2 AS r
      FROM vc
    ),
    seq AS (
      SELECT row_number() OVER (ORDER BY d.day) AS t,
             count(*) OVER () AS n,
             mr.r
      FROM d JOIN mr ON d.cents = mr.cents
    ),
    u AS (
      SELECT t, n,
             2 * sum(r) OVER (ORDER BY t) - t * (n + 1.0) AS u_t
      FROM seq
    ),
    k AS (
      SELECT max(abs(u_t)) AS k_stat, max(n) AS n FROM u WHERE t < n
    ),
    arg AS (
      SELECT min(t) AS t_break FROM u, k
      WHERE abs(u_t) = k.k_stat AND t < u.n
    )
    SELECT CAST(k.n AS BIGINT) AS n_days,
           CAST(arg.t_break AS BIGINT) AS break_at,
           round(k.k_stat, 6) AS k_stat,
           round(2 * exp(-6 * k.k_stat * k.k_stat
                         / (pow(CAST(k.n AS DOUBLE), 3)
                            + pow(CAST(k.n AS DOUBLE), 2))), 6)
             AS p_approx
    FROM k, arg
    """,
)
def q_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test (1979) on the daily revenue series:
    U_t = Σ_{{i≤t}}Σ_{{j>t}} sgn(x_j − x_i), maximized over t — the
    rank-based (outlier-immune) single-change-point locator, with the
    identity |U_t| = |2Σ_{{i≤t}}R_i − t(N+1)| turning the double sum
    into ONE cumulative pass over per-day midranks (the rank form
    carries the opposite SIGN orientation — a hypothesis property
    test pinned this down — and K maximizes the absolute value, so
    the statistic is identical); K = max|U_t| carries
    Pettitt's closed-form approximate p ≈ 2exp(−6K²/(N³+N²)). The
    nonparametric confirmatory cousin of ``q_changepoint_binary``'s
    variance-split search and ``q_chow_test``'s fixed-midpoint F.

    Scale: midranks from the distinct-value rollup, the U walk from a
    guarded day-spine window — no i×j pair enumeration anywhere.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    vc = d.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    vc = bounded_window_input(vc, label="q_pettitt value domain")
    wb = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    mr = vc.select(
        "cents",
        (
            F.coalesce(F.sum("c").over(wb), F.lit(0)) + (F.col("c") + 1.0) / 2
        ).alias("r"),
    )
    d = bounded_window_input(d, label="q_pettitt day spine")
    seq = (
        d.join(mr, "cents")
        .select(
            F.row_number().over(Window.orderBy("day")).alias("t"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
            "r",
        )
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    u = seq.select(
        "t",
        "n",
        (2 * F.sum("r").over(wc) - F.col("t") * (F.col("n") + 1.0)).alias(
            "u_t"
        ),
    )
    k = u.filter(F.col("t") < F.col("n")).agg(
        F.max(F.abs("u_t")).alias("k_stat"), F.max("n").alias("n")
    )
    arg = (
        u.crossJoin(F.broadcast(k.select(F.col("k_stat").alias("kk"))))
        .filter((F.abs("u_t") == F.col("kk")) & (F.col("t") < F.col("n")))
        .agg(F.min("t").alias("t_break"))
    )
    out = k.crossJoin(F.broadcast(arg))
    n = F.col("n").cast("double")
    return out.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("t_break").cast("long").alias("break_at"),
        F.round(F.col("k_stat"), 6).alias("k_stat"),
        F.round(
            2
            * F.exp(
                -6 * F.col("k_stat") * F.col("k_stat") / (F.pow(n, 3) + F.pow(n, 2))
            ),
            6,
        ).alias("p_approx"),
    )


@query(
    "q_durbin_watson",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             CAST(cents AS DOUBLE) / 100 AS y
      FROM d
    ),
    m AS (
      SELECT count(*) AS n, avg(t) AS mt, avg(y) AS my,
             sum(CAST(t AS DOUBLE) * t) AS rtt, sum(t * y) AS rty
      FROM idx
    ),
    fit AS (
      SELECT (rty - n * mt * my) / (rtt - n * mt * mt) AS b,
             my - (rty - n * mt * my) / (rtt - n * mt * mt) * mt AS a
      FROM m
    ),
    e AS (
      SELECT idx.t, idx.y - fit.a - fit.b * idx.t AS e FROM idx, fit
    ),
    lagged AS (
      SELECT e, lag(e) OVER (ORDER BY t) AS ep FROM e
    )
    SELECT CAST((SELECT n FROM m) AS BIGINT) AS n_days,
           round(sum(pow(e - ep, 2)) FILTER (WHERE ep IS NOT NULL)
                 / sum(e * e), 6) AS dw_stat,
           round(1 - (sum(pow(e - ep, 2)) FILTER (WHERE ep IS NOT NULL)
                      / sum(e * e)) / 2, 6) AS rho1_implied
    FROM lagged
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic (1950) on the residuals of the daily
    trend fit y = a + b·t: DW = Σ(e_t − e_{{t−1}})²/Σe_t² ≈ 2(1−ρ₁) —
    THE regression-residual serial-correlation gate (DW ≪ 2 means the
    trend line is systematically over/under-shooting in runs, so its
    reported standard errors are fiction). Completes the residual
    panel beside ``q_breusch_pagan`` (heteroskedasticity) and
    ``q_regression_diagnostics`` (influence); the raw-series analogue
    is ``q_von_neumann_ratio``.

    Scale: closed-form OLS from one moment aggregate (day-index x
    moments are exact), residuals via the broadcast 2-scalar fit, one
    guarded lag window.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_durbin_watson day spine")
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (F.col("cents").cast("double") / 100).alias("y"),
    )
    m = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("t").alias("mt"),
        F.avg("y").alias("my"),
        F.sum(F.col("t").cast("double") * F.col("t")).alias("rtt"),
        F.sum(F.col("t") * F.col("y")).alias("rty"),
    )
    b = (F.col("rty") - F.col("n") * F.col("mt") * F.col("my")) / (
        F.col("rtt") - F.col("n") * F.col("mt") * F.col("mt")
    )
    fit = m.select(
        F.col("n").cast("long").alias("n"),
        b.alias("b"),
        (F.col("my") - b * F.col("mt")).alias("a"),
    )
    e = idx.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        (F.col("y") - F.col("a") - F.col("b") * F.col("t")).alias("e"),
    )
    lagged = e.withColumn("ep", F.lag("e").over(Window.orderBy("t")))
    dw = F.sum(
        F.when(F.col("ep").isNotNull(), F.pow(F.col("e") - F.col("ep"), 2))
    ) / F.sum(F.col("e") * F.col("e"))
    return lagged.agg(
        F.max("n").alias("n_days"),
        F.round(dw, 6).alias("dw_stat"),
        F.round(1 - dw / 2, 6).alias("rho1_implied"),
    )


KUPIEC_VAR_LEVEL = 0.10  # daily revenue VaR at the 10% tail


@query(
    "q_kupiec_pof",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             count(*) OVER () AS n,
             CAST(cents AS DOUBLE) / 100 AS y
      FROM d
    ),
    var_est AS (
      SELECT quantile_cont(y, {KUPIEC_VAR_LEVEL}) AS var_q
      FROM idx WHERE t <= n // 2
    ),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(count(*) FILTER (WHERE y < var_q) AS BIGINT) AS x
      FROM idx, var_est WHERE t > n // 2
    )
    SELECT n_test, x AS n_exceedances,
           round((SELECT var_q FROM var_est), 6) AS var_threshold,
           round(CAST(x AS DOUBLE) / n_test, 6) AS realized_rate,
           round(-2 * ((n_test - x) * ln(1 - {KUPIEC_VAR_LEVEL})
                       + x * ln({KUPIEC_VAR_LEVEL})
                       - CASE WHEN x = n_test THEN 0
                              ELSE (n_test - x)
                                   * ln(1 - CAST(x AS DOUBLE) / n_test) END
                       - CASE WHEN x = 0 THEN 0
                              ELSE x * ln(CAST(x AS DOUBLE) / n_test) END),
                 6) AS lr_pof
    FROM test
    """,
)
def q_kupiec_pof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kupiec proportion-of-failures backtest (1995) of a revenue
    value-at-risk threshold: calibrate the {KUPIEC_VAR_LEVEL:.0%}
    lower quantile on the FIRST half of the daily series, count
    exceedances (days below it) in the held-out second half, and test
    the realized rate against the nominal with the likelihood ratio
    LR = −2[(n−x)ln(1−p) + x·ln p − (n−x)ln(1−x/n) − x·ln(x/n)]
    (χ²₁ under correct coverage) — the validation every quantile
    forecaster (``q_dp_quantile_exponential``'s release thresholds,
    ``q_conformal_interval``'s bands) owes its consumers. Train/test
    split by time, never random — coverage drifts are the point.

    Scale: day rollup, one quantile on the first half, one counting
    aggregate on the second.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_kupiec day spine")
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        (F.col("cents").cast("double") / 100).alias("y"),
    )
    var_est = idx.filter(F.col("t") <= F.floor(F.col("n") / 2)).agg(
        F.expr(f"percentile(y, {KUPIEC_VAR_LEVEL})").alias("var_q")
    )
    test = (
        idx.filter(F.col("t") > F.floor(F.col("n") / 2))
        .crossJoin(F.broadcast(var_est))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.count_if(F.col("y") < F.col("var_q")).cast("long").alias("x"),
            F.max("var_q").alias("var_q"),
        )
    )
    n, x = F.col("n_test").cast("double"), F.col("x").cast("double")
    p = KUPIEC_VAR_LEVEL
    # x·ln(x/n) → 0 as x → 0 (and symmetrically at x = n): the
    # standard limit convention keeps the LR finite when a half has
    # zero exceedances (it does at sf0.001)
    lr = -2 * (
        (n - x) * F.lit(math.log(1 - p))
        + x * F.lit(math.log(p))
        - F.when(x == n, F.lit(0.0)).otherwise((n - x) * F.log(1 - x / n))
        - F.when(x == 0, F.lit(0.0)).otherwise(x * F.log(x / n))
    )
    return test.select(
        "n_test",
        F.col("x").alias("n_exceedances"),
        F.round(F.col("var_q"), 6).alias("var_threshold"),
        F.round(x / n, 6).alias("realized_rate"),
        F.round(lr, 6).alias("lr_pof"),
    )


# --------------------------------------------------------------------------
# Extreme-value tail: GPD peaks-over-threshold + expected shortfall
# --------------------------------------------------------------------------
POT_QUANTILE = 0.90  # threshold: 90th percentile of purchase values


@query(
    "q_gpd_peaks_over_threshold",
    oracle=f"""
    WITH v AS (
      SELECT value FROM events WHERE event_type = 'purchase'
    ),
    thr AS (SELECT quantile_cont(value, {POT_QUANTILE}) AS u FROM v),
    exc AS (
      SELECT value - thr.u AS y FROM v, thr WHERE value > thr.u
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exc,
             avg(y) AS mean_y, var_samp(y) AS var_y
      FROM exc
    )
    SELECT n_exc,
           round((SELECT u FROM thr), 6) AS threshold,
           round(mean_y, 6) AS mean_excess,
           round(0.5 * (1 - mean_y * mean_y / var_y), 6) AS xi_shape,
           round(0.5 * mean_y * (mean_y * mean_y / var_y + 1), 6)
             AS beta_scale
    FROM m
    """,
)
def q_gpd_peaks_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized Pareto fit to the purchase-value tail by
    peaks-over-threshold (Pickands-Balkema-de Haan: excesses over a
    high threshold converge to GPD regardless of the body), with the
    method-of-moments closed form ξ = ½(1 − m²/s²), β = ½m(m²/s² + 1)
    on excesses above the {POT_QUANTILE:.0%} quantile. ξ > 0 reads
    heavy (Pareto-class) tail, ξ ≈ 0 exponential, ξ < 0 bounded —
    THE block-free member of the EVT shelf beside ``q_gumbel_maxima``
    (block maxima) and ``q_hill_tail_index`` (log-rank slope, valid
    only when ξ > 0; the GPD ξ here is its model-agnostic check).

    Scale: one quantile, one filtered moment aggregate over the
    exceedances — the tail set is (1−q)·n rows by construction.
    """
    v = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    thr = v.agg(F.expr(f"percentile(value, {POT_QUANTILE})").alias("u"))
    exc = v.crossJoin(F.broadcast(thr)).filter(
        F.col("value") > F.col("u")
    ).select((F.col("value") - F.col("u")).alias("y"), "u")
    m = exc.agg(
        F.count(F.lit(1)).cast("long").alias("n_exc"),
        F.max("u").alias("u"),
        F.avg("y").alias("mean_y"),
        F.var_samp("y").alias("var_y"),
    )
    ratio = F.col("mean_y") * F.col("mean_y") / F.col("var_y")
    return m.select(
        "n_exc",
        F.round(F.col("u"), 6).alias("threshold"),
        F.round(F.col("mean_y"), 6).alias("mean_excess"),
        F.round(0.5 * (1 - ratio), 6).alias("xi_shape"),
        F.round(0.5 * F.col("mean_y") * (ratio + 1), 6).alias("beta_scale"),
    )


ES_LEVEL = 0.10  # expected shortfall of the WORST 10% revenue days


@query(
    "q_expected_shortfall",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    x AS (SELECT CAST(cents AS DOUBLE) / 100 AS y FROM d),
    v AS (SELECT quantile_cont(y, {ES_LEVEL}) AS var_q FROM x),
    tail AS (SELECT y FROM x, v WHERE y <= v.var_q)
    SELECT CAST((SELECT count(*) FROM x) AS BIGINT) AS n_days,
           CAST((SELECT count(*) FROM tail) AS BIGINT) AS n_tail,
           round((SELECT var_q FROM v), 6) AS var_10pct,
           round((SELECT avg(y) FROM tail), 6) AS expected_shortfall,
           round((SELECT var_q FROM v) - (SELECT avg(y) FROM tail), 6)
             AS tail_gap
    """,
)
def q_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected shortfall (CVaR) of daily revenue at the
    {ES_LEVEL:.0%} level: the MEAN of the days at or below the VaR
    quantile — the coherent risk measure (subadditive, unlike VaR)
    that answers "how bad is a bad day ON AVERAGE once the threshold
    is breached?", which the bare quantile ``q_kupiec_pof`` backtests
    cannot: two series with identical VaR can hide arbitrarily
    different tail mass below it (the `tail_gap` column is exactly
    that hidden spread).

    Scale: day rollup, one quantile, one filtered mean.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    x = d.select((F.col("cents").cast("double") / 100).alias("y"))
    v = x.agg(F.expr(f"percentile(y, {ES_LEVEL})").alias("var_q"))
    xt = x.crossJoin(F.broadcast(v))
    tail = xt.filter(F.col("y") <= F.col("var_q"))
    a = x.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    t = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.max("var_q").alias("var_q"),
        F.avg("y").alias("es"),
    )
    out = a.crossJoin(F.broadcast(t))
    return out.select(
        "n_days",
        "n_tail",
        F.round(F.col("var_q"), 6).alias("var_10pct"),
        F.round(F.col("es"), 6).alias("expected_shortfall"),
        F.round(F.col("var_q") - F.col("es"), 6).alias("tail_gap"),
    )


# --------------------------------------------------------------------------
# Tukey median polish of the (day-of-week × event-type) revenue table
# --------------------------------------------------------------------------
@query(
    "q_median_polish",
    oracle=f"""
    WITH cell AS (
      SELECT epoch_us(ts) // 86400000000 % 7 AS dow, event_type,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS y
      FROM events GROUP BY 1, 2
    ),
    -- sweep 1: remove row medians, then column medians
    r1 AS (
      SELECT dow, event_type,
             y - median(y) OVER (PARTITION BY dow) AS resid,
             median(y) OVER (PARTITION BY dow) AS row_eff
      FROM cell
    ),
    c1 AS (
      SELECT dow, event_type, row_eff,
             resid - median(resid) OVER (PARTITION BY event_type) AS resid,
             median(resid) OVER (PARTITION BY event_type) AS col_eff
      FROM r1
    ),
    -- sweep 2
    r2 AS (
      SELECT dow, event_type, col_eff,
             row_eff + median(resid) OVER (PARTITION BY dow) AS row_eff,
             resid - median(resid) OVER (PARTITION BY dow) AS resid
      FROM c1
    ),
    c2 AS (
      SELECT dow, event_type, row_eff,
             col_eff + median(resid) OVER (PARTITION BY event_type)
               AS col_eff,
             resid - median(resid) OVER (PARTITION BY event_type) AS resid
      FROM r2
    )
    SELECT CAST(dow AS BIGINT) AS dow, event_type,
           round(row_eff, 6) AS row_effect,
           round(col_eff, 6) AS col_effect,
           round(resid, 6) AS residual
    FROM c2 ORDER BY dow, event_type
    """,
)
def q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's median polish (1977) of the day-of-week × event-type
    revenue table: alternately sweep out row and column MEDIANS (two
    full sweeps — the convergence horizon for a 7×5 grid) leaving
    additive row/column effects plus outlier-resistant residuals —
    the robust two-way decomposition where a mean-based ANOVA table
    lets one anomalous cell drag its whole row AND column effect. The
    large-residual cells are the (weekday, type) combinations that
    genuinely deviate from "this day is big × this type is big" —
    the robust companion of ``q_anova_dow``.

    Scale: the corpus collapses to the 35-cell grid first; every
    median is a window over ≤7 cells partitioned by row/column key.
    The sweep sequence is fixed (unrolled), so both engines execute
    the identical median sequence.
    """
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy(
        (F.floor(F.unix_micros("ts") / 86_400_000_000) % 7).alias("dow"),
        "event_type",
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast(
                "double"
            )
            / 100
        ).alias("y")
    )
    wr = Window.partitionBy("dow")
    wc = Window.partitionBy("event_type")
    med = lambda c, w: F.expr(f"median({c})").over(w)  # noqa: E731
    r1 = cell.select(
        "dow",
        "event_type",
        (F.col("y") - med("y", wr)).alias("resid"),
        med("y", wr).alias("row_eff"),
    )
    c1 = r1.select(
        "dow",
        "event_type",
        "row_eff",
        (F.col("resid") - med("resid", wc)).alias("resid"),
        med("resid", wc).alias("col_eff"),
    )
    r2 = c1.select(
        "dow",
        "event_type",
        "col_eff",
        (F.col("row_eff") + med("resid", wr)).alias("row_eff"),
        (F.col("resid") - med("resid", wr)).alias("resid"),
    )
    c2 = r2.select(
        "dow",
        "event_type",
        "row_eff",
        (F.col("col_eff") + med("resid", wc)).alias("col_eff"),
        (F.col("resid") - med("resid", wc)).alias("resid"),
    )
    return c2.select(
        F.col("dow").cast("long").alias("dow"),
        "event_type",
        F.round("row_eff", 6).alias("row_effect"),
        F.round("col_eff", 6).alias("col_effect"),
        F.round("resid", 6).alias("residual"),
    ).orderBy("dow", "event_type")


# --------------------------------------------------------------------------
# Forecast skill (MASE / Theil's U2), max drawdown, decomposition
# strength
# --------------------------------------------------------------------------
@query(
    "q_mase_theil_u",
    oracle=f"""
    WITH p AS ({_LAGGED_PAIRS_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(y - f7)) / avg(abs(y - f1)), 6) AS mase_vs_naive,
           round(sqrt(avg(pow(y - f7, 2)) / avg(pow(y - f1, 2))), 6)
             AS theil_u2,
           round(avg(abs(y - f7)), 6) AS mae_seasonal,
           round(avg(abs(y - f1)), 6) AS mae_naive
    FROM p
    """,
)
def q_mase_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free forecast skill of the seasonal-naive forecaster:
    MASE (Hyndman & Koehler 2006) — MAE relative to the in-sample
    naive MAE, the unit-free accuracy measure that made percentage
    errors obsolete (< 1 = beats naive) — and Theil's U2, the same
    ratio in RMSE space (squared-loss sensitivity). The skill-score
    companions of ``q_diebold_mariano``'s significance test: DM says
    whether the difference is real, MASE/U2 say how LARGE it is in
    units a stakeholder can rank forecasters by.

    Scale: the shared lag-aligned pair frame, one aggregate.
    """
    p = _lagged_pairs(spark, sf_dir)
    ae7 = F.abs(F.col("y") - F.col("f7"))
    ae1 = F.abs(F.col("y") - F.col("f1"))
    se7 = F.pow(F.col("y") - F.col("f7"), 2)
    se1 = F.pow(F.col("y") - F.col("f1"), 2)
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg(ae7) / F.avg(ae1), 6).alias("mase_vs_naive"),
        F.round(F.sqrt(F.avg(se7) / F.avg(se1)), 6).alias("theil_u2"),
        F.round(F.avg(ae7), 6).alias("mae_seasonal"),
        F.round(F.avg(ae1), 6).alias("mae_naive"),
    )


@query(
    "q_max_drawdown",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    m AS (SELECT avg(CAST(cents AS DOUBLE) / 100) AS mu FROM d),
    c AS (
      SELECT day,
             sum(CAST(cents AS DOUBLE) / 100 - m.mu)
               OVER (ORDER BY day) AS equity
      FROM d, m
    ),
    dd AS (
      SELECT day, equity,
             greatest(max(equity) OVER (ORDER BY day), 0) AS peak
      FROM c
    ),
    w AS (
      SELECT day, equity, peak, peak - equity AS drawdown FROM dd
    ),
    mx AS (SELECT max(round(drawdown, 6)) AS mdd FROM w)
    SELECT CAST((SELECT count(*) FROM w) AS BIGINT) AS n_days,
           round((SELECT max(peak) FROM w), 6) AS peak_excess,
           (SELECT mdd FROM mx) AS max_drawdown,
           CAST((SELECT min(day) FILTER (round(drawdown, 6) = mx.mdd)
                 FROM w, mx) AS BIGINT) AS trough_day,
           round((SELECT mdd FROM mx)
                 / (SELECT max(abs(equity)) FROM w), 6) AS mdd_vs_range
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative DEMEANED revenue curve
    (equity_t = Σ_{{s≤t}} (y_s − ȳ), the CUSUM / cumulative-abnormal-
    revenue path, floored-at-zero running peak): running peak minus
    current equity, maximized over time — the path-dependent risk
    statistic no distributional summary can recover (two series with
    identical daily histograms can have wildly different drawdowns;
    order matters, which is what ``q_von_neumann`` and friends
    quantify only indirectly). The raw cumulative-revenue curve is
    monotone on an all-positive daily series and its drawdown is
    identically zero — a degenerate statistic (round-10 fix); the
    demeaned path measures the worst sustained run BELOW average,
    which is the question a drawdown on a revenue stream actually
    answers. Reports the trough day (deterministic: the earliest
    argmax of the 6dp-rounded drawdown), the peak cumulative excess,
    and the drawdown relative to the curve's absolute range.

    Scale: one scalar mean broadcast back, then the equity curve and
    its running peak are two guarded cumulative windows over the day
    spine; the argmax is a broadcast-rejoined scalar.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_max_drawdown day spine")
    mu = d.agg(F.avg(F.col("cents").cast("double") / 100).alias("mu"))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.crossJoin(F.broadcast(mu)).select(
        "day",
        F.sum(F.col("cents").cast("double") / 100 - F.col("mu"))
        .over(wc)
        .alias("equity"),
    )
    dd = c.withColumn(
        "peak", F.greatest(F.max("equity").over(wc), F.lit(0.0))
    )
    w = dd.withColumn(
        "drawdown", F.round(F.col("peak") - F.col("equity"), 6)
    )
    mx = w.agg(F.max("drawdown").alias("mdd"))
    stats = w.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("peak").alias("max_peak"),
        F.max(F.abs(F.col("equity"))).alias("eq_range"),
    )
    trough = (
        w.crossJoin(F.broadcast(mx))
        .filter(F.col("drawdown") == F.col("mdd"))
        .agg(F.min("day").cast("long").alias("trough_day"))
    )
    out = stats.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(trough))
    return out.select(
        "n_days",
        F.round(F.col("max_peak"), 6).alias("peak_excess"),
        F.col("mdd").alias("max_drawdown"),
        "trough_day",
        F.round(F.col("mdd") / F.col("eq_range"), 6).alias("mdd_vs_range"),
    )


@query(
    "q_decomposition_strength",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    x AS (
      SELECT day, CAST(cents AS DOUBLE) / 100 AS y,
             row_number() OVER (ORDER BY day) AS t,
             count(*) OVER () AS n
      FROM d
    ),
    tr AS (
      SELECT day, y, t, n,
             avg(y) OVER (ORDER BY t
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             count(*) OVER (ORDER BY t
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wsz
      FROM x
    ),
    det AS (
      SELECT day, y, trend, y - trend AS detrended
      FROM tr WHERE wsz = 7
    ),
    s AS (
      SELECT day, y, trend, detrended,
             avg(detrended) OVER (PARTITION BY day % 7) AS seasonal
      FROM det
    ),
    r AS (
      SELECT y, trend, seasonal, detrended,
             detrended - seasonal AS remainder
      FROM s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(greatest(0, 1 - var_pop(remainder)
                 / var_pop(detrended)), 6) AS seasonal_strength,
           round(greatest(0, 1 - var_pop(remainder)
                 / var_pop(trend + remainder)), 6) AS trend_strength
    FROM r
    """,
)
def q_decomposition_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's decomposition-strength features (the `trend` and
    `seasonal_strength` columns of every ts-feature library): classical
    decomposition of daily revenue — centered 7-day moving-average
    trend (complete windows only), day-of-week means of the detrended
    series as the seasonal, the rest remainder — then
    F_S = max(0, 1 − Var(R)/Var(S+R)) and
    F_T = max(0, 1 − Var(R)/Var(T+R)): unit-free [0,1] scores of how
    much structure each component carries, the one-glance triage for
    which forecaster family (``q_holt_linear`` vs
    ``q_holt_winters_fixed_season``) a series deserves. Var(S+R) =
    Var(detrended) exactly, the identity the oracle uses too.

    Scale: day rollup, one centered-MA window, one dow-partitioned
    mean, two variance aggregates.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_decomp_strength day spine")
    x = d.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("y"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    wma = Window.orderBy("t").rowsBetween(-3, 3)
    tr = x.select(
        "day",
        "y",
        F.avg("y").over(wma).alias("trend"),
        F.count(F.lit(1)).over(wma).alias("wsz"),
    ).filter(F.col("wsz") == 7)
    det = tr.select(
        "day", "y", "trend", (F.col("y") - F.col("trend")).alias("detrended")
    )
    s = det.withColumn(
        "seasonal",
        F.avg("detrended").over(Window.partitionBy(F.col("day") % 7)),
    )
    r = s.select(
        "trend",
        "detrended",
        (F.col("detrended") - F.col("seasonal")).alias("remainder"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1 - F.var_pop("remainder") / F.var_pop("detrended"),
            ),
            6,
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1
                - F.var_pop("remainder")
                / F.var_pop(F.col("trend") + F.col("remainder")),
            ),
            6,
        ).alias("trend_strength"),
    )
