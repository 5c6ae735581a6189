"""Multiple-regression operators (round 9, continuation): the
cross-metric modeling tier over the daily rollup — two-regressor OLS by
normal equations (closed form, no iterative solver), partial
correlation (the confounder-adjusted association), and the Chow
structural-break F test. Reference scope: the engine delegates all
processing to its injected pipeline
(PulsarMessageConsumer.java:535-545) — this IS that processing layer.

Everything here reduces the corpus to the per-(event_type, day) rollup
once (one map-side-combined shuffle), pivots it to a ≤|days|-row daily
frame of exact integer columns, and solves in a single aggregate:
raw moments of integer cents/counts are exactly representable in
doubles at any realistic day count, so both engines produce
bit-identical sufficient statistics before the final divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

# daily pivot: y = purchase cents, x1 = clicks, x2 = views
_PIVOT_SQL = """
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS DOUBLE) AS y,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS DOUBLE)
               AS x1,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
               AS x2
      FROM events GROUP BY 1
"""


def _daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return e.groupBy(day).agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("double")
        .alias("y"),
        F.count_if(F.col("event_type") == "click").cast("double").alias("x1"),
        F.count_if(F.col("event_type") == "view").cast("double").alias("x2"),
    )


# --------------------------------------------------------------------------
# Two-regressor OLS via normal equations (Cramer's rule)
# --------------------------------------------------------------------------
@query(
    "q_ols_two_factor",
    oracle=f"""
    WITH d AS ({_PIVOT_SQL}),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             avg(x1) AS mx1, avg(x2) AS mx2, avg(y) AS my,
             sum(x1 * x1) AS rx1x1, sum(x2 * x2) AS rx2x2,
             sum(x1 * x2) AS rx1x2, sum(x1 * y) AS rx1y,
             sum(x2 * y) AS rx2y, sum(y * y) AS ryy
      FROM d
    ),
    c AS (
      SELECT n, mx1, mx2, my,
             rx1x1 - n * mx1 * mx1 AS s11, rx2x2 - n * mx2 * mx2 AS s22,
             rx1x2 - n * mx1 * mx2 AS s12, rx1y - n * mx1 * my AS s1y,
             rx2y - n * mx2 * my AS s2y, ryy - n * my * my AS syy
      FROM m
    ),
    b AS (
      SELECT n, syy,
             (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
             (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2,
             s1y, s2y, my, mx1, mx2
      FROM c
    ),
    fit AS (
      SELECT n, b1, b2, my - b1 * mx1 - b2 * mx2 AS b0,
             1 - (syy - b1 * s1y - b2 * s2y) / syy AS r2
      FROM b
    )
    SELECT n AS n_days,
           round(b0 / 100, 6) AS intercept_dollars,
           round(b1 / 100, 6) AS beta_clicks,
           round(b2 / 100, 6) AS beta_views,
           round(r2, 6) AS r2,
           round(1 - (1 - r2) * (n - 1) / (n - 3), 6) AS adj_r2,
           round(r2 / 2 / ((1 - r2) / (n - 3)), 6) AS f_stat
    FROM fit
    """,
)
def q_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS by normal equations: daily purchase dollars on
    daily click and view counts, solved in closed form with Cramer's
    rule on the centered 2×2 moment matrix — multiple regression
    without an iterative solver, the minimal "does engagement predict
    revenue after controlling for traffic?" model. Reports both slopes
    (dollars per click / per view), R², adjusted R², and the overall
    F statistic with (2, n−3) degrees of freedom.

    Scale: the corpus collapses to the day pivot in one conditional
    aggregate; the normal equations consume TEN raw moments from a
    single reduce — no per-observation residual pass (contrast
    ``q_regression_diagnostics``, which deliberately materializes one).
    """
    d = _daily_pivot(spark, sf_dir)
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x1").alias("mx1"),
        F.avg("x2").alias("mx2"),
        F.avg("y").alias("my"),
        F.sum(F.col("x1") * F.col("x1")).alias("rx1x1"),
        F.sum(F.col("x2") * F.col("x2")).alias("rx2x2"),
        F.sum(F.col("x1") * F.col("x2")).alias("rx1x2"),
        F.sum(F.col("x1") * F.col("y")).alias("rx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("rx2y"),
        F.sum(F.col("y") * F.col("y")).alias("ryy"),
    )
    n = F.col("n")
    s11 = F.col("rx1x1") - n * F.col("mx1") * F.col("mx1")
    s22 = F.col("rx2x2") - n * F.col("mx2") * F.col("mx2")
    s12 = F.col("rx1x2") - n * F.col("mx1") * F.col("mx2")
    s1y = F.col("rx1y") - n * F.col("mx1") * F.col("my")
    s2y = F.col("rx2y") - n * F.col("mx2") * F.col("my")
    syy = F.col("ryy") - n * F.col("my") * F.col("my")
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    b0 = F.col("my") - b1 * F.col("mx1") - b2 * F.col("mx2")
    r2 = 1 - (syy - b1 * s1y - b2 * s2y) / syy
    return m.select(
        n.alias("n_days"),
        F.round(b0 / 100, 6).alias("intercept_dollars"),
        F.round(b1 / 100, 6).alias("beta_clicks"),
        F.round(b2 / 100, 6).alias("beta_views"),
        F.round(r2, 6).alias("r2"),
        F.round(1 - (1 - r2) * (n - 1) / (n - 3), 6).alias("adj_r2"),
        F.round(r2 / 2 / ((1 - r2) / (n - 3)), 6).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Partial correlation r(y, x1 | x2)
# --------------------------------------------------------------------------
@query(
    "q_partial_correlation",
    oracle=f"""
    WITH d AS ({_PIVOT_SQL}),
    r AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             corr(y, x1) AS r_y1, corr(y, x2) AS r_y2, corr(x1, x2) AS r_12
      FROM d
    )
    SELECT n AS n_days,
           round(r_y1, 6) AS corr_spend_clicks,
           round(r_y2, 6) AS corr_spend_views,
           round(r_12, 6) AS corr_clicks_views,
           round((r_y1 - r_y2 * r_12)
                 / sqrt((1 - r_y2 * r_y2) * (1 - r_12 * r_12)), 6)
             AS partial_corr,
           round((r_y1 - r_y2 * r_12)
                 / sqrt((1 - r_y2 * r_y2) * (1 - r_12 * r_12))
                 * sqrt((n - 3)
                        / (1 - pow((r_y1 - r_y2 * r_12)
                           / sqrt((1 - r_y2 * r_y2) * (1 - r_12 * r_12)), 2))),
                 6) AS t_stat
    FROM r
    """,
)
def q_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation r(spend, clicks | views) on the
    daily pivot: the click-spend association with the shared traffic
    driver partialled out, via the closed form
    (r_y1 − r_y2·r_12)/√((1−r_y2²)(1−r_12²)) — the one-line answer to
    "is the raw correlation just both riding daily volume?". The t
    statistic uses n−3 degrees of freedom (one partialled variable).

    Scale: three ``corr`` aggregates over the day-domain pivot — all
    sufficient statistics, one reduce.
    """
    d = _daily_pivot(spark, sf_dir)
    r = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.corr("y", "x1").alias("r_y1"),
        F.corr("y", "x2").alias("r_y2"),
        F.corr("x1", "x2").alias("r_12"),
    )
    pc = (F.col("r_y1") - F.col("r_y2") * F.col("r_12")) / F.sqrt(
        (1 - F.col("r_y2") * F.col("r_y2"))
        * (1 - F.col("r_12") * F.col("r_12"))
    )
    n = F.col("n")
    return r.select(
        n.alias("n_days"),
        F.round("r_y1", 6).alias("corr_spend_clicks"),
        F.round("r_y2", 6).alias("corr_spend_views"),
        F.round("r_12", 6).alias("corr_clicks_views"),
        F.round(pc, 6).alias("partial_corr"),
        F.round(pc * F.sqrt((n - 3) / (1 - pc * pc)), 6).alias("t_stat"),
    )


# --------------------------------------------------------------------------
# Chow structural-break test on the daily trend fit
# --------------------------------------------------------------------------
@query(
    "q_chow_test",
    oracle=f"""
    WITH d AS ({_PIVOT_SQL}),
    idx AS (
      SELECT y, row_number() OVER (ORDER BY day) AS x,
             count(*) OVER () AS n
      FROM d
    ),
    seg AS (
      SELECT y, CAST(x AS DOUBLE) AS x,
             CASE WHEN x <= n // 2 THEN 1 ELSE 2 END AS regime
      FROM idx
    ),
    moms AS (
      SELECT regime, count(*) AS k, avg(x) AS mx, avg(y) AS my,
             sum(x * x) AS rxx, sum(x * y) AS rxy, sum(y * y) AS ryy
      FROM seg GROUP BY regime
      UNION ALL
      SELECT 0, count(*), avg(x), avg(y),
             sum(x * x), sum(x * y), sum(y * y)
      FROM seg
    ),
    ssr AS (
      SELECT regime, k,
             (ryy - k * my * my)
               - pow(rxy - k * mx * my, 2) / (rxx - k * mx * mx) AS ssr
      FROM moms
    ),
    parts AS (
      SELECT CAST(sum(CASE WHEN regime > 0 THEN k END) AS BIGINT) AS n,
             sum(CASE WHEN regime = 0 THEN ssr END) AS ssr_pooled,
             sum(CASE WHEN regime > 0 THEN ssr END) AS ssr_split
      FROM ssr
    )
    SELECT n AS n_days,
           round(ssr_pooled / 1e10, 6) AS ssr_pooled_e10,
           round(ssr_split / 1e10, 6) AS ssr_split_e10,
           round((ssr_pooled - ssr_split) / 2 / (ssr_split / (n - 4)), 6)
             AS chow_f
    FROM parts
    """,
)
def q_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test (Chow 1960) for a structural break in the daily-spend
    trend at the series midpoint: fit y = a + b·t separately to each
    half and pooled, then F = ((SSR_p − SSR₁ − SSR₂)/k) /
    ((SSR₁+SSR₂)/(n−2k)) with k = 2 parameters — "did the trend's
    level or slope CHANGE?", the confirmatory companion to
    ``q_changepoint_binary``'s exploratory split search. SSRs come
    from the closed form Syy − Sxy²/Sxx per regime, no residual pass.

    Scale: day-domain pivot, one guarded index window, one grouped
    moment aggregate over three regimes (two halves + pooled via a
    duplicate-free union of the same rollup).
    """
    d = _daily_pivot(spark, sf_dir)
    d = bounded_window_input(d, label="q_chow_test day spine")
    idx = d.select(
        "y",
        F.row_number().over(Window.orderBy("day")).alias("x"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    seg = idx.select(
        "y",
        F.col("x").cast("double").alias("x"),
        F.when(F.col("x") <= F.floor(F.col("n") / 2), 1)
        .otherwise(2)
        .alias("regime"),
    )
    pooled = seg.select("y", "x", F.lit(0).alias("regime"))
    moms = (
        seg.unionByName(pooled)
        .groupBy("regime")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.avg("x").alias("mx"),
            F.avg("y").alias("my"),
            F.sum(F.col("x") * F.col("x")).alias("rxx"),
            F.sum(F.col("x") * F.col("y")).alias("rxy"),
            F.sum(F.col("y") * F.col("y")).alias("ryy"),
        )
    )
    k = F.col("k")
    ssr = moms.select(
        "regime",
        "k",
        (
            (F.col("ryy") - k * F.col("my") * F.col("my"))
            - F.pow(F.col("rxy") - k * F.col("mx") * F.col("my"), 2)
            / (F.col("rxx") - k * F.col("mx") * F.col("mx"))
        ).alias("ssr"),
    )
    parts = ssr.agg(
        F.sum(F.when(F.col("regime") > 0, F.col("k")))
        .cast("long")
        .alias("n"),
        F.sum(F.when(F.col("regime") == 0, F.col("ssr"))).alias("ssr_pooled"),
        F.sum(F.when(F.col("regime") > 0, F.col("ssr"))).alias("ssr_split"),
    )
    n = F.col("n")
    return parts.select(
        n.alias("n_days"),
        F.round(F.col("ssr_pooled") / 1e10, 6).alias("ssr_pooled_e10"),
        F.round(F.col("ssr_split") / 1e10, 6).alias("ssr_split_e10"),
        F.round(
            (F.col("ssr_pooled") - F.col("ssr_split"))
            / 2
            / (F.col("ssr_split") / (n - 4)),
            6,
        ).alias("chow_f"),
    )


# --------------------------------------------------------------------------
# Per-type market beta (CAPM-style decomposition vs the all-type total)
# --------------------------------------------------------------------------
@query(
    "q_market_beta",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               AS y
      FROM events GROUP BY 1, 2
    ),
    market AS (
      SELECT day, sum(y) AS m FROM daily GROUP BY 1
    ),
    j AS (
      SELECT d.event_type, d.y, mk.m
      FROM daily d JOIN market mk ON d.day = mk.day
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(covar_pop(y, m) / var_pop(m), 6) AS beta,
           round((avg(y) - covar_pop(y, m) / var_pop(m) * avg(m)) / 100, 6)
             AS alpha_dollars,
           round(pow(corr(y, m), 2), 6) AS r2
    FROM j GROUP BY event_type ORDER BY event_type
    """,
)
def q_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-style decomposition of each event type's daily value
    series against the all-type daily total ("the market"): β =
    cov(y,m)/var(m) — how much a type amplifies or dampens platform-
    wide swings — with the residual intercept α (dollars/day of
    type-specific value independent of the market) and R² (share of
    the type's variance the market explains). The portfolio view of
    the per-type series that ``q_autocorrelation`` and
    ``q_market``-free regressions treat in isolation: Σ(β·share) = 1
    by construction, so betas localize which type carries systemic
    volatility.

    Scale: one (day × type) rollup, a day-keyed self-aggregate for
    the market total, and per-type covar/var sufficient statistics —
    the join key is the bounded day domain.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day"),
        "event_type",
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("double")
        .alias("y")
    )
    market = daily.groupBy("day").agg(F.sum("y").alias("m"))
    j = daily.join(market, "day")
    beta = F.covar_pop("y", "m") / F.var_pop("m")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(beta, 6).alias("beta"),
            F.round((F.avg("y") - beta * F.avg("m")) / 100, 6).alias(
                "alpha_dollars"
            ),
            F.round(F.pow(F.corr("y", "m"), 2), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Multivariate trio on the daily pivot: canonical correlation,
# Mahalanobis outlier days, Hotelling two-sample T²
# --------------------------------------------------------------------------
_PIVOT4_SQL = """
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS DOUBLE)
               AS x1,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
               AS x2,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS DOUBLE) AS y1,
             CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE)
               AS y2
      FROM events GROUP BY 1
"""


def _daily_pivot4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return e.groupBy(day).agg(
        F.count_if(F.col("event_type") == "click").cast("double").alias("x1"),
        F.count_if(F.col("event_type") == "view").cast("double").alias("x2"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("double")
        .alias("y1"),
        F.count_if(F.col("event_type") == "error").cast("double").alias("y2"),
    )


@query(
    "q_canonical_correlation",
    oracle=f"""
    WITH d AS ({_PIVOT4_SQL}),
    r AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             corr(x1, x2) AS rxx, corr(y1, y2) AS ryy,
             corr(x1, y1) AS a11, corr(x1, y2) AS a12,
             corr(x2, y1) AS a21, corr(x2, y2) AS a22
      FROM d
    ),
    m AS (
      -- M = Rxx^-1 Rxy Ryy^-1 Ryx via closed-form 2x2 inverses:
      -- Rxx^-1 = [[1,-rxx],[-rxx,1]]/(1-rxx^2), same for Ryy
      SELECT n, rxx, ryy, a11, a12, a21, a22,
             (a11 - ryy * a12) AS b11, (a12 - ryy * a11) AS b12,
             (a21 - ryy * a22) AS b21, (a22 - ryy * a21) AS b22,
             (1 - rxx * rxx) * (1 - ryy * ryy) AS denom
      FROM r
    ),
    mm AS (
      SELECT n, rxx, ryy,
             ((b11 - rxx * b21) * a11 + (b12 - rxx * b22) * a12) / denom
               AS m11,
             ((b11 - rxx * b21) * a21 + (b12 - rxx * b22) * a22) / denom
               AS m12,
             ((b21 - rxx * b11) * a11 + (b22 - rxx * b12) * a12) / denom
               AS m21,
             ((b21 - rxx * b11) * a21 + (b22 - rxx * b12) * a22) / denom
               AS m22
      FROM m
    )
    SELECT n AS n_days,
           round(sqrt(greatest(
             (m11 + m22) / 2
               + sqrt(pow((m11 - m22) / 2, 2) + m12 * m21), 0)), 6)
             AS canonical_corr_1,
           round(sqrt(greatest(
             (m11 + m22) / 2
               - sqrt(pow((m11 - m22) / 2, 2) + m12 * m21), 0)), 6)
             AS canonical_corr_2,
           round(-(n - 1 - (2 + 2 + 1) / 2.0)
                 * ln((1 - ((m11 + m22) / 2
                       + sqrt(pow((m11 - m22) / 2, 2) + m12 * m21)))
                      * (1 - ((m11 + m22) / 2
                         - sqrt(pow((m11 - m22) / 2, 2) + m12 * m21)))),
                 6) AS bartlett_chi2
    FROM mm
    """,
)
def q_canonical_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and second canonical correlations between the daily
    TRAFFIC block (clicks, views) and the daily OUTCOME block
    (purchase revenue, error count): the singular values of
    R_xx^{{-1/2}} R_xy R_yy^{{-1/2}}, computed as the eigenvalue
    closed form of the 2×2 matrix M = R_xx⁻¹R_xy R_yy⁻¹R_yx (trace ±
    √(tr²/4 − det), every inverse written out by Cramer) — "what
    combination of traffic best predicts what combination of
    outcomes", the block-level generalization of
    ``q_partial_correlation``. Bartlett's −(n−1−(p+q+1)/2)·ln Λ
    statistic tests whether ANY canonical link exists.

    Scale: seven corr sufficient statistics over the day pivot, then
    scalar 2×2 algebra — no iteration, no eigensolver.
    """
    d = _daily_pivot4(spark, sf_dir)
    r = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.corr("x1", "x2").alias("rxx"),
        F.corr("y1", "y2").alias("ryy"),
        F.corr("x1", "y1").alias("a11"),
        F.corr("x1", "y2").alias("a12"),
        F.corr("x2", "y1").alias("a21"),
        F.corr("x2", "y2").alias("a22"),
    )
    rxx, ryy = F.col("rxx"), F.col("ryy")
    a11, a12 = F.col("a11"), F.col("a12")
    a21, a22 = F.col("a21"), F.col("a22")
    b11 = a11 - ryy * a12
    b12 = a12 - ryy * a11
    b21 = a21 - ryy * a22
    b22 = a22 - ryy * a21
    denom = (1 - rxx * rxx) * (1 - ryy * ryy)
    m11 = ((b11 - rxx * b21) * a11 + (b12 - rxx * b22) * a12) / denom
    m12 = ((b11 - rxx * b21) * a21 + (b12 - rxx * b22) * a22) / denom
    m21 = ((b21 - rxx * b11) * a11 + (b22 - rxx * b12) * a12) / denom
    m22 = ((b21 - rxx * b11) * a21 + (b22 - rxx * b12) * a22) / denom
    half_tr = (m11 + m22) / 2
    disc = F.sqrt(F.pow((m11 - m22) / 2, 2) + m12 * m21)
    lam1 = half_tr + disc
    lam2 = half_tr - disc
    n = F.col("n")
    return r.select(
        n.alias("n_days"),
        F.round(F.sqrt(F.greatest(lam1, F.lit(0.0))), 6).alias(
            "canonical_corr_1"
        ),
        F.round(F.sqrt(F.greatest(lam2, F.lit(0.0))), 6).alias(
            "canonical_corr_2"
        ),
        F.round(
            -(n - 1 - (2 + 2 + 1) / 2.0) * F.log((1 - lam1) * (1 - lam2)),
            6,
        ).alias("bartlett_chi2"),
    )


MAHAL_CHI2_95_DF2 = 5.991465  # chi-square 0.95 quantile, 2 df


@query(
    "q_mahalanobis_outliers",
    oracle=f"""
    WITH d AS ({_PIVOT4_SQL}),
    m AS (
      SELECT avg(x1) AS m1, avg(y1) AS m2,
             var_pop(x1) AS s11, var_pop(y1) AS s22,
             covar_pop(x1, y1) AS s12
      FROM d
    ),
    dist AS (
      SELECT d.day,
             (pow(d.x1 - m.m1, 2) * m.s22
              - 2 * (d.x1 - m.m1) * (d.y1 - m.m2) * m.s12
              + pow(d.y1 - m.m2, 2) * m.s11)
             / (m.s11 * m.s22 - m.s12 * m.s12) AS d2
      FROM d, m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) FILTER (WHERE d2 > {MAHAL_CHI2_95_DF2}) AS BIGINT)
             AS n_outliers,
           round(max(d2), 6) AS max_d2,
           round(avg(d2), 6) AS mean_d2
    FROM dist
    """,
)
def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Mahalanobis outlier screen on daily (clicks, purchase
    revenue): D² = (x−μ)ᵀΣ⁻¹(x−μ) with the 2×2 inverse written in
    closed form — the CORRELATION-AWARE anomaly gate: a day with high
    clicks AND proportionally high revenue is normal where a
    per-column z-score (``q_robust_zscore_mad``) would flag both;
    a day with high clicks but FLAT revenue lights up here and
    nowhere else. Days beyond the χ²₂ 95% quantile
    ({MAHAL_CHI2_95_DF2}) are counted as outliers; E[D̄²] = 2 exactly
    (population moments), a free calibration check the pytest
    asserts.

    Scale: one moment aggregate (means/variances/covariance), one
    broadcast join back over the day frame.
    """
    d = _daily_pivot4(spark, sf_dir)
    m = d.agg(
        F.avg("x1").alias("m1"),
        F.avg("y1").alias("m2"),
        F.var_pop("x1").alias("s11"),
        F.var_pop("y1").alias("s22"),
        F.covar_pop("x1", "y1").alias("s12"),
    )
    j = d.crossJoin(F.broadcast(m))
    dx = F.col("x1") - F.col("m1")
    dy = F.col("y1") - F.col("m2")
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    d2 = (
        F.pow(dx, 2) * F.col("s22")
        - 2 * dx * dy * F.col("s12")
        + F.pow(dy, 2) * F.col("s11")
    ) / det
    dist = j.select(d2.alias("d2"))
    return dist.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.count_if(F.col("d2") > MAHAL_CHI2_95_DF2)
        .cast("long")
        .alias("n_outliers"),
        F.round(F.max("d2"), 6).alias("max_d2"),
        F.round(F.avg("d2"), 6).alias("mean_d2"),
    )


@query(
    "q_hotelling_t2",
    oracle=f"""
    WITH d AS ({_PIVOT4_SQL}),
    g AS (
      SELECT day % 7 IN (2, 3) AS weekend, x1, y1 FROM d
    ),
    mm AS (
      SELECT weekend, CAST(count(*) AS BIGINT) AS n,
             avg(x1) AS m1, avg(y1) AS m2,
             var_samp(x1) * (count(*) - 1) AS ss11,
             var_samp(y1) * (count(*) - 1) AS ss22,
             covar_samp(x1, y1) * (count(*) - 1) AS ss12
      FROM g GROUP BY weekend
    ),
    pool AS (
      SELECT sum(n) AS n_tot,
             max(CASE WHEN weekend THEN n END) AS n_we,
             max(CASE WHEN NOT weekend THEN n END) AS n_wd,
             max(CASE WHEN weekend THEN m1 END)
               - max(CASE WHEN NOT weekend THEN m1 END) AS d1,
             max(CASE WHEN weekend THEN m2 END)
               - max(CASE WHEN NOT weekend THEN m2 END) AS d2,
             sum(ss11) / (sum(n) - 2) AS s11,
             sum(ss22) / (sum(n) - 2) AS s22,
             sum(ss12) / (sum(n) - 2) AS s12
      FROM mm
    )
    SELECT CAST(n_wd AS BIGINT) AS n_weekday,
           CAST(n_we AS BIGINT) AS n_weekend,
           round(CAST(n_wd AS DOUBLE) * n_we / (n_wd + n_we)
                 * (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11)
                 / (s11 * s22 - s12 * s12), 6) AS t2,
           round(CAST(n_wd AS DOUBLE) * n_we / (n_wd + n_we)
                 * (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11)
                 / (s11 * s22 - s12 * s12)
                 * (n_wd + n_we - 3) / (2.0 * (n_wd + n_we - 2)), 6)
             AS f_stat
    FROM pool
    """,
)
def q_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotelling two-sample T² (1931) comparing the weekday vs weekend
    MEAN VECTOR of daily (clicks, purchase revenue): T² =
    (n₁n₂/N)·dᵀS_pooled⁻¹d with the pooled 2×2 covariance inverted in
    closed form, and the exact F conversion (N−p−1)/(p(N−2))·T² with
    p = 2 — the multivariate Welch-free generalization of running two
    t tests, correct precisely because clicks and revenue CORRELATE
    (two marginal t's double-count the shared direction). The
    multivariate member of the weekday/weekend family
    (``q_hellinger_tv_distance``, ``q_energy_distance``).

    Scale: per-group sufficient statistics (one aggregate over the
    day pivot), then scalar 2×2 algebra.
    """
    d = _daily_pivot4(spark, sf_dir)
    g = d.select(
        (F.col("day") % 7).isin(2, 3).alias("weekend"), "x1", "y1"
    )
    mm = g.groupBy("weekend").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("y1").alias("m2"),
        (F.var_samp("x1") * (F.count(F.lit(1)) - 1)).alias("ss11"),
        (F.var_samp("y1") * (F.count(F.lit(1)) - 1)).alias("ss22"),
        (F.covar_samp("x1", "y1") * (F.count(F.lit(1)) - 1)).alias("ss12"),
    )
    pool = mm.agg(
        F.sum("n").alias("n_tot"),
        F.max(F.when(F.col("weekend"), F.col("n"))).alias("n_we"),
        F.max(F.when(~F.col("weekend"), F.col("n"))).alias("n_wd"),
        (
            F.max(F.when(F.col("weekend"), F.col("m1")))
            - F.max(F.when(~F.col("weekend"), F.col("m1")))
        ).alias("d1"),
        (
            F.max(F.when(F.col("weekend"), F.col("m2")))
            - F.max(F.when(~F.col("weekend"), F.col("m2")))
        ).alias("d2"),
        (F.sum("ss11") / (F.sum("n") - 2)).alias("s11"),
        (F.sum("ss22") / (F.sum("n") - 2)).alias("s22"),
        (F.sum("ss12") / (F.sum("n") - 2)).alias("s12"),
    )
    n_wd, n_we = F.col("n_wd").cast("double"), F.col("n_we").cast("double")
    d1, d2 = F.col("d1"), F.col("d2")
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    t2 = (
        n_wd
        * n_we
        / (n_wd + n_we)
        * (
            d1 * d1 * F.col("s22")
            - 2 * d1 * d2 * F.col("s12")
            + d2 * d2 * F.col("s11")
        )
        / det
    )
    return pool.select(
        F.col("n_wd").cast("long").alias("n_weekday"),
        F.col("n_we").cast("long").alias("n_weekend"),
        F.round(t2, 6).alias("t2"),
        F.round(
            t2 * (n_wd + n_we - 3) / (2.0 * (n_wd + n_we - 2)), 6
        ).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Fisher z: are two correlations different?
# --------------------------------------------------------------------------
@query(
    "q_fisher_z_corr_diff",
    oracle=f"""
    WITH d AS ({_PIVOT4_SQL}),
    g AS (
      SELECT day % 7 IN (2, 3) AS weekend,
             CAST(count(*) AS BIGINT) AS n,
             corr(x1, y1) AS r
      FROM d GROUP BY 1
    ),
    s AS (
      SELECT max(CASE WHEN weekend THEN r END) AS r_we,
             max(CASE WHEN NOT weekend THEN r END) AS r_wd,
             max(CASE WHEN weekend THEN n END) AS n_we,
             max(CASE WHEN NOT weekend THEN n END) AS n_wd
      FROM g
    )
    SELECT CAST(n_wd AS BIGINT) AS n_weekday_days,
           CAST(n_we AS BIGINT) AS n_weekend_days,
           round(r_wd, 6) AS corr_weekday,
           round(r_we, 6) AS corr_weekend,
           round(0.5 * ln((1 + r_wd) / (1 - r_wd))
                 - 0.5 * ln((1 + r_we) / (1 - r_we)), 6) AS z_diff,
           round((0.5 * ln((1 + r_wd) / (1 - r_wd))
                  - 0.5 * ln((1 + r_we) / (1 - r_we)))
                 / sqrt(1.0 / (n_wd - 3) + 1.0 / (n_we - 3)), 6) AS z_stat
    FROM s
    """,
)
def q_fisher_z_corr_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher z test for EQUALITY OF CORRELATIONS: is the daily
    click-revenue correlation the same on weekdays and weekends?
    Each r maps through atanh (variance-stabilizing, ≈N(·, 1/(n−3)))
    and the difference is a plain z — the question "did the
    relationship CHANGE?" that comparing two ``q_partial_correlation``
    runs by eye cannot answer (two significant correlations can be
    significantly different from each other, and two insignificant
    ones need not be).

    Scale: one grouped corr aggregate over the day pivot, scalar
    atanh algebra.
    """
    d = _daily_pivot4(spark, sf_dir)
    g = d.groupBy((F.col("day") % 7).isin(2, 3).alias("weekend")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.corr("x1", "y1").alias("r"),
    )
    s = g.agg(
        F.max(F.when(F.col("weekend"), F.col("r"))).alias("r_we"),
        F.max(F.when(~F.col("weekend"), F.col("r"))).alias("r_wd"),
        F.max(F.when(F.col("weekend"), F.col("n"))).alias("n_we"),
        F.max(F.when(~F.col("weekend"), F.col("n"))).alias("n_wd"),
    )
    z = lambda r: 0.5 * F.log((1 + r) / (1 - r))  # noqa: E731
    zd = z(F.col("r_wd")) - z(F.col("r_we"))
    se = F.sqrt(
        1.0 / (F.col("n_wd") - 3) + 1.0 / (F.col("n_we") - 3)
    )
    return s.select(
        F.col("n_wd").alias("n_weekday_days"),
        F.col("n_we").alias("n_weekend_days"),
        F.round(F.col("r_wd"), 6).alias("corr_weekday"),
        F.round(F.col("r_we"), 6).alias("corr_weekend"),
        F.round(zd, 6).alias("z_diff"),
        F.round(zd / se, 6).alias("z_stat"),
    )
