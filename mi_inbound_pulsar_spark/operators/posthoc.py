"""Post-hoc multiple-comparison operators (round 9, continuation):
what an analyst runs AFTER ``q_anova_dow`` / ``q_kruskal_wallis``
reject — all-pairs studentized comparisons (Tukey-Kramer HSD), their
unequal-variance form (Games-Howell), and the trend-across-ordered-
groups test (Jonckheere-Terpstra). Reference scope: the engine
delegates all processing to its injected pipeline
(PulsarMessageConsumer.java:535-545) — this IS that processing layer.

The group domain is tiny by construction (market segments, priority
classes), so every query is one map-side-combined rollup plus
arithmetic on a ≤k²-row pair frame; nothing enumerates observation
pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

_SEG_MOMENTS_SQL = """
      SELECT c_mktsegment AS seg, count(*) AS n,
             avg(c_acctbal) AS m, var_samp(c_acctbal) AS v
      FROM customer GROUP BY 1
"""


def _segment_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("m"),
        F.var_samp("c_acctbal").alias("v"),
    )


# --------------------------------------------------------------------------
# Tukey-Kramer HSD (honest significant difference, unbalanced)
# --------------------------------------------------------------------------
@query(
    "q_tukey_hsd",
    oracle=f"""
    WITH g AS ({_SEG_MOMENTS_SQL}),
    mse AS (
      SELECT sum((n - 1) * v) / sum(n - 1) AS mse,
             CAST(sum(n) - count(*) AS BIGINT) AS df_w
      FROM g
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m)
                 / sqrt(mse.mse / 2 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat,
           mse.df_w AS df_within
    FROM g a JOIN g b ON a.seg < b.seg, mse
    ORDER BY seg_a, seg_b
    """,
)
def q_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer honest-significant-difference grid over the five
    market segments' account balances: every pair's studentized range
    statistic q = (m_a − m_b)/√(MSE/2·(1/n_a + 1/n_b)) against the
    pooled one-way-ANOVA MSE — the all-pairs follow-up that keeps the
    FAMILY-wise error rate where per-pair t tests would inflate it.
    Emits the q statistic and within-group df; the caller thresholds
    against the studentized-range quantile for (k, df).

    Scale: per-group sufficient statistics (one rollup), then a k×k
    self-join on the 5-row group frame with the MSE broadcast — pair
    enumeration is over GROUPS, never observations.
    """
    g = _segment_moments(spark, sf_dir)
    mse = g.agg(
        (
            F.sum((F.col("n") - 1) * F.col("v")) / F.sum(F.col("n") - 1)
        ).alias("mse"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("df_w"),
    )
    a = g.alias("a")
    b = g.alias("b")
    pairs = (
        a.join(b, F.col("a.seg") < F.col("b.seg"))
        .crossJoin(F.broadcast(mse))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.col("a.n").cast("long").alias("n_a"),
            F.col("b.n").cast("long").alias("n_b"),
            F.round(F.col("a.m") - F.col("b.m"), 6).alias("mean_diff"),
            F.round(
                (F.col("a.m") - F.col("b.m"))
                / F.sqrt(
                    F.col("mse") / 2 * (1.0 / F.col("a.n") + 1.0 / F.col("b.n"))
                ),
                6,
            ).alias("q_stat"),
            F.col("df_w").alias("df_within"),
        )
    )
    return pairs.orderBy("seg_a", "seg_b")


# --------------------------------------------------------------------------
# Games-Howell (unequal-variance post-hoc)
# --------------------------------------------------------------------------
@query(
    "q_games_howell",
    oracle=f"""
    WITH g AS ({_SEG_MOMENTS_SQL})
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n)
                 * sqrt(2.0), 6) AS q_stat,
           round(pow(a.v / a.n + b.v / b.n, 2)
                 / (pow(a.v / a.n, 2) / (a.n - 1)
                    + pow(b.v / b.n, 2) / (b.n - 1)), 6) AS df_welch
    FROM g a JOIN g b ON a.seg < b.seg
    ORDER BY seg_a, seg_b
    """,
)
def q_games_howell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Games-Howell post-hoc grid over the same segment pairs as
    ``q_tukey_hsd`` but WITHOUT the homogeneity-of-variance assumption
    Tukey inherits from the pooled MSE: each pair gets its own Welch
    standard error √(v_a/n_a + v_b/n_b) and Welch-Satterthwaite df —
    the pairing Levene's test (``q_levene_test``) says you need when
    it rejects. Emits BOTH conventions explicitly (round-9 advice):
    ``t_stat`` is the Welch t = diff/SE, and ``q_stat`` = t·√2 is the
    studentized-range statistic the Games-Howell procedure thresholds
    against q_{k,df} tables — matching ``q_tukey_hsd``'s q_stat
    convention so the two grids are directly comparable.

    Scale: identical to ``q_tukey_hsd`` minus the MSE reduce — one
    rollup, one group-pair self-join.
    """
    g = _segment_moments(spark, sf_dir)
    a = g.alias("a")
    b = g.alias("b")
    se2 = F.col("a.v") / F.col("a.n") + F.col("b.v") / F.col("b.n")
    pairs = (
        a.join(b, F.col("a.seg") < F.col("b.seg"))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.round(F.col("a.m") - F.col("b.m"), 6).alias("mean_diff"),
            F.round((F.col("a.m") - F.col("b.m")) / F.sqrt(se2), 6).alias(
                "t_stat"
            ),
            F.round(
                (F.col("a.m") - F.col("b.m")) / F.sqrt(se2) * F.sqrt(F.lit(2.0)),
                6,
            ).alias("q_stat"),
            F.round(
                F.pow(se2, 2)
                / (
                    F.pow(F.col("a.v") / F.col("a.n"), 2) / (F.col("a.n") - 1)
                    + F.pow(F.col("b.v") / F.col("b.n"), 2)
                    / (F.col("b.n") - 1)
                ),
                6,
            ).alias("df_welch"),
        )
    )
    return pairs.orderBy("seg_a", "seg_b")


# --------------------------------------------------------------------------
# Jonckheere-Terpstra trend test across ordered priority classes
# --------------------------------------------------------------------------
@query(
    "q_jonckheere_terpstra",
    oracle="""
    WITH raw AS (
      SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS grp,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM', '5-LOW')
    ),
    vc AS (
      SELECT v,
             count(*) FILTER (WHERE grp = 1) AS c1,
             count(*) FILTER (WHERE grp = 3) AS c2,
             count(*) FILTER (WHERE grp = 5) AS c3
      FROM raw GROUP BY 1
    ),
    cum AS (
      SELECT c1, c2, c3,
             coalesce(sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b1,
             coalesce(sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b2
      FROM vc
    ),
    s AS (
      SELECT sum(c1) AS n1, sum(c2) AS n2, sum(c3) AS n3,
             sum(c2 * (b1 + c1 / 2.0))
               + sum(c3 * (b1 + c1 / 2.0))
               + sum(c3 * (b2 + c2 / 2.0)) AS u,
             sum(CAST(c1 + c2 + c3 AS DOUBLE)
                 * (c1 + c2 + c3 - 1)) AS t2,
             sum(CAST(c1 + c2 + c3 AS DOUBLE)
                 * (c1 + c2 + c3 - 1) * (c1 + c2 + c3 - 2)) AS t3,
             sum(CAST(c1 + c2 + c3 AS DOUBLE) * (c1 + c2 + c3 - 1)
                 * (2 * (c1 + c2 + c3) + 5)) AS t25
      FROM cum
    ),
    t AS (
      SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_medium,
             CAST(n3 AS BIGINT) AS n_low, u, t2, t3, t25,
             CAST(n1 + n2 + n3 AS DOUBLE) AS nn,
             n1 * n1 + n2 * n2 + n3 * n3 AS sq,
             CAST(n1 AS DOUBLE) * (n1 - 1) + CAST(n2 AS DOUBLE) * (n2 - 1)
               + CAST(n3 AS DOUBLE) * (n3 - 1) AS g2,
             CAST(n1 AS DOUBLE) * (n1 - 1) * (n1 - 2)
               + CAST(n2 AS DOUBLE) * (n2 - 1) * (n2 - 2)
               + CAST(n3 AS DOUBLE) * (n3 - 1) * (n3 - 2) AS g3,
             CAST(n1 AS DOUBLE) * (n1 - 1) * (2 * n1 + 5)
               + CAST(n2 AS DOUBLE) * (n2 - 1) * (2 * n2 + 5)
               + CAST(n3 AS DOUBLE) * (n3 - 1) * (2 * n3 + 5) AS g25
      FROM s
    )
    SELECT n_urgent, n_medium, n_low,
           round(u, 6) AS jt_stat,
           round((nn * nn - sq) / 4.0, 6) AS jt_mean,
           round((u - (nn * nn - sq) / 4.0)
                 / sqrt((nn * (nn - 1) * (2 * nn + 5) - g25 - t25) / 72
                        + g3 * t3 / (36 * nn * (nn - 1) * (nn - 2))
                        + g2 * t2 / (8 * nn * (nn - 1))), 6) AS z
    FROM t
    """,
)
def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for a MONOTONE trend in order totals
    across the ordered priority classes URGENT < MEDIUM < LOW:
    JT = Σ_{i<j} U_ij, the sum of pairwise Mann-Whitney counts taken
    only in the hypothesized direction — strictly more powerful than
    Kruskal-Wallis when the alternative is ordered rather than "any
    difference". Ties count half in the statistic AND in the null
    variance: standardized with the null mean (N²−Σn_i²)/4 and the
    tie-corrected variance of Hollander & Wolfe (1999, eq. 6.19),
    Var = A/72 + B/(36N(N−1)(N−2)) + C/(8N(N−1)) with
    A = N(N−1)(2N+5) − Σᵢnᵢ(nᵢ−1)(2nᵢ+5) − Σⱼtⱼ(tⱼ−1)(2tⱼ+5),
    B = [Σᵢnᵢ(nᵢ−1)(nᵢ−2)]·[Σⱼtⱼ(tⱼ−1)(tⱼ−2)],
    C = [Σᵢnᵢ(nᵢ−1)]·[Σⱼtⱼ(tⱼ−1)] — the tie-group sizes tⱼ are
    exactly the rollup's per-value totals, so the correction costs no
    extra pass (round-9 advice: the no-ties variance overstated Var on
    this heavily tied cents domain, biasing z toward zero).

    Scale: the three-group pairwise counts all come from ONE cumulative
    pass over the distinct-cents rollup — U_ij = Σ_v c_j(v)·(B_i(v) +
    c_i(v)/2) needs only each group's running predecessor count, so no
    group pair is ever joined, let alone observation pairs.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "3-MEDIUM", "5-LOW")
    )
    raw = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    vc = raw.groupBy("v").agg(
        F.count_if(F.col("grp") == 1).alias("c1"),
        F.count_if(F.col("grp") == 3).alias("c2"),
        F.count_if(F.col("grp") == 5).alias("c3"),
    )
    vc = bounded_window_input(vc, label="q_jonckheere value domain")
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vc.select(
        "c1",
        "c2",
        "c3",
        F.coalesce(F.sum("c1").over(wb), F.lit(0)).alias("b1"),
        F.coalesce(F.sum("c2").over(wb), F.lit(0)).alias("b2"),
    )
    ct = (F.col("c1") + F.col("c2") + F.col("c3")).cast("double")
    s = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum("c3").alias("n3"),
        (
            F.sum(F.col("c2") * (F.col("b1") + F.col("c1") / 2.0))
            + F.sum(F.col("c3") * (F.col("b1") + F.col("c1") / 2.0))
            + F.sum(F.col("c3") * (F.col("b2") + F.col("c2") / 2.0))
        ).alias("u"),
        F.sum(ct * (ct - 1)).alias("t2"),
        F.sum(ct * (ct - 1) * (ct - 2)).alias("t3"),
        F.sum(ct * (ct - 1) * (2 * ct + 5)).alias("t25"),
    )
    n1, n2, n3 = F.col("n1"), F.col("n2"), F.col("n3")
    nn = n1 + n2 + n3
    sq = n1 * n1 + n2 * n2 + n3 * n3
    nnd = nn.cast("double")
    g2 = sum(
        x.cast("double") * (x - 1) for x in (n1, n2, n3)
    )
    g3 = sum(
        x.cast("double") * (x - 1) * (x - 2) for x in (n1, n2, n3)
    )
    g25 = sum(
        x.cast("double") * (x - 1) * (2 * x + 5) for x in (n1, n2, n3)
    )
    mean = (nn * nn - sq) / 4.0
    var = (
        (nnd * (nnd - 1) * (2 * nnd + 5) - g25 - F.col("t25")) / 72
        + g3 * F.col("t3") / (36 * nnd * (nnd - 1) * (nnd - 2))
        + g2 * F.col("t2") / (8 * nnd * (nnd - 1))
    )
    return s.select(
        n1.cast("long").alias("n_urgent"),
        n2.cast("long").alias("n_medium"),
        n3.cast("long").alias("n_low"),
        F.round(F.col("u"), 6).alias("jt_stat"),
        F.round(mean, 6).alias("jt_mean"),
        F.round((F.col("u") - mean) / F.sqrt(var), 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Friedman test + Page's trend test (rank blocks = days, treatments =
# event types)
# --------------------------------------------------------------------------
_DAY_TYPE_RANKS_SQL = """
      SELECT day, event_type,
             rank() OVER (PARTITION BY day ORDER BY cents) AS r_lo,
             count(*) OVER (PARTITION BY day, cents) AS n_tied
      FROM (
        SELECT epoch_us(ts) // 86400000000 AS day, event_type,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
      )
      QUALIFY count(*) OVER (PARTITION BY day) = 5
"""


def _day_type_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """midrank of each event type's daily cents within its day, only
    for complete blocks (all 5 types present)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    daily = daily.withColumn(
        "blk", F.count(F.lit(1)).over(Window.partitionBy("day"))
    ).filter(F.col("blk") == 5)
    return daily.select(
        "day",
        "event_type",
        F.rank().over(Window.partitionBy("day").orderBy("cents")).alias("r_lo"),
        F.count(F.lit(1))
        .over(Window.partitionBy("day", "cents"))
        .alias("n_tied"),
    )


@query(
    "q_friedman_test",
    oracle=f"""
    WITH ranks AS ({_DAY_TYPE_RANKS_SQL}),
    mid AS (
      SELECT day, event_type, r_lo + (n_tied - 1) / 2.0 AS r,
             CAST(n_tied AS DOUBLE) AS t
      FROM ranks
    ),
    per_t AS (
      SELECT event_type, sum(r) AS r_j, count(*) AS n
      FROM mid GROUP BY 1
    ),
    ties AS (
      -- Σ(t³ − t) per block, each tie GROUP counted once (the rows
      -- carry the group size, so divide the group's contribution by
      -- its size)
      SELECT sum((t * t * t - t) / t) AS tsum FROM mid WHERE t > 1
    ),
    s AS (
      SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(r_j * r_j) AS sr2
      FROM per_t
    )
    SELECT CAST(n AS BIGINT) AS n_blocks, k AS n_treatments,
           round((12.0 / (n * k * (k + 1)) * sr2 - 3.0 * n * (k + 1))
                 / (1 - coalesce((SELECT tsum FROM ties), 0)
                        / (CAST(n AS DOUBLE) * k * (k * k - 1))), 6)
             AS friedman_q
    FROM s
    """,
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (1937) with days as blocks and the five event
    types as treatments: midrank each type's daily revenue within its
    day, then Q = [12/(nk(k+1))]ΣR_j² − 3n(k+1), tie-corrected by
    1 − ΣT/(nk(k²−1)) with T = Σ(t³−t) over tie groups — the
    nonparametric repeated-measures ANOVA asking "do the types keep a
    consistent revenue ORDERING day after day?" where
    ``q_kruskal_wallis`` would wrongly pool days. Only complete blocks
    (all 5 types present) enter, the standard treatment.

    Scale: events collapse to the (day × type) rollup once; ranking is
    per-day windows (partitioned by the block key — never global);
    the reduction is over the 5-treatment domain.
    """
    mid = _day_type_ranks(spark, sf_dir).select(
        "event_type",
        (F.col("r_lo") + (F.col("n_tied") - 1) / 2.0).alias("r"),
        F.col("n_tied").cast("double").alias("t"),
    )
    per_t = mid.groupBy("event_type").agg(
        F.sum("r").alias("r_j"), F.count(F.lit(1)).alias("n")
    )
    ties = mid.filter(F.col("t") > 1).agg(
        F.sum((F.col("t") * F.col("t") * F.col("t") - F.col("t")) / F.col("t")).alias(
            "tsum"
        )
    )
    s = per_t.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("r_j") * F.col("r_j")).alias("sr2"),
    ).crossJoin(F.broadcast(ties))
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    q_raw = 12.0 / (n * k * (k + 1)) * F.col("sr2") - 3.0 * n * (k + 1)
    corr = 1 - F.coalesce(F.col("tsum"), F.lit(0.0)) / (n * k * (k * k - 1))
    return s.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.round(q_raw / corr, 6).alias("friedman_q"),
    )


@query(
    "q_page_trend_test",
    oracle=f"""
    WITH ranks AS ({_DAY_TYPE_RANKS_SQL}),
    mid AS (
      SELECT day, event_type, r_lo + (n_tied - 1) / 2.0 AS r FROM ranks
    ),
    per_t AS (
      SELECT event_type, sum(r) AS r_j, count(*) AS n,
             row_number() OVER (ORDER BY event_type) AS j
      FROM mid GROUP BY 1
    ),
    s AS (
      SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(j * r_j) AS l
      FROM per_t
    )
    SELECT CAST(n AS BIGINT) AS n_blocks, k AS n_treatments,
           round(l, 6) AS page_l,
           round(CAST(n AS DOUBLE) * k * (k + 1) * (k + 1) / 4, 6)
             AS l_mean,
           round((l - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1)
                        * (k * k - 1) / 144), 6) AS z
    FROM s
    """,
)
def q_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test (1963) on the same day-blocked type ranks as
    ``q_friedman_test``, against the ORDERED alternative that revenue
    rank increases along the alphabetical treatment order: L = Σ j·R_j
    with E[L] = nk(k+1)²/4 and Var[L] = nk²(k+1)(k²−1)/144 — the
    blocked-design counterpart of ``q_jonckheere_terpstra`` (which
    orders independent groups). A significant Friedman with an
    insignificant Page means types differ but not monotonically.

    Scale: identical shape to ``q_friedman_test`` — the extra j·R_j
    weighting is free at the 5-treatment reduction.
    """
    mid = _day_type_ranks(spark, sf_dir).select(
        "event_type",
        (F.col("r_lo") + (F.col("n_tied") - 1) / 2.0).alias("r"),
    )
    per_t = mid.groupBy("event_type").agg(
        F.sum("r").alias("r_j"), F.count(F.lit(1)).alias("n")
    )
    per_t = bounded_window_input(per_t, label="q_page treatment table")
    per_t = per_t.withColumn(
        "j", F.row_number().over(Window.orderBy("event_type"))
    )
    s = per_t.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("j") * F.col("r_j")).alias("l"),
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    mean = n * k * (k + 1) * (k + 1) / 4
    var = n * k * k * (k + 1) * (k * k - 1) / 144
    return s.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.round(F.col("l"), 6).alias("page_l"),
        F.round(mean, 6).alias("l_mean"),
        F.round((F.col("l") - mean) / F.sqrt(var), 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Quade test: range-weighted blocked ranks (Friedman's sharper cousin)
# --------------------------------------------------------------------------
@query(
    "q_quade_test",
    oracle=f"""
    WITH ranks AS ({_DAY_TYPE_RANKS_SQL}),
    mid AS (
      SELECT day, event_type, r_lo + (n_tied - 1) / 2.0 AS r FROM ranks
    ),
    rng AS (
      SELECT day, max(cents) - min(cents) AS range_c FROM (
        SELECT epoch_us(ts) // 86400000000 AS day, event_type,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
        QUALIFY count(*) OVER (PARTITION BY day) = 5
      ) GROUP BY day
    ),
    qr AS (
      SELECT day,
             rank() OVER (ORDER BY range_c) 
               + (count(*) OVER (PARTITION BY range_c) - 1) / 2.0 AS q
      FROM rng
    ),
    s_ij AS (
      SELECT mid.event_type, qr.q * (mid.r - 3.0) AS s
      FROM mid JOIN qr ON mid.day = qr.day
    ),
    per_t AS (
      SELECT event_type, sum(s) AS s_j FROM s_ij GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM qr) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM per_t) AS k,
             (SELECT sum(s * s) FROM s_ij) AS a,
             (SELECT sum(s_j * s_j) FROM per_t) AS b2
    )
    SELECT n AS n_blocks, k AS n_treatments,
           round(a, 6) AS a_total,
           round(b2 / n, 6) AS b_total,
           round((n - 1) * (b2 / n) / (a - b2 / n), 6) AS quade_f
    FROM tot
    """,
)
def q_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test (1979) on the day-blocked event-type revenue ranks:
    like ``q_friedman_test`` but each block is WEIGHTED by the midrank
    of its within-block range, so days where the types actually
    diverged count more than days where they all moved together —
    strictly more powerful than Friedman at small k. S_ij =
    Q_i·(r_ij − (k+1)/2), F = (n−1)·B/(A−B) with B = ΣS_j²/n,
    A = ΣΣS_ij², F(k−1, (n−1)(k−1)) under H₀.

    Scale: the only addition over Friedman is the per-day range rollup
    and ONE guarded window ranking the |days|-row range frame.
    """
    mid = _day_type_ranks(spark, sf_dir).select(
        "day",
        "event_type",
        (F.col("r_lo") + (F.col("n_tied") - 1) / 2.0).alias("r"),
    )
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    daily = daily.withColumn(
        "blk", F.count(F.lit(1)).over(Window.partitionBy("day"))
    ).filter(F.col("blk") == 5)
    rng = daily.groupBy("day").agg(
        (F.max("cents") - F.min("cents")).alias("range_c")
    )
    rng = bounded_window_input(rng, label="q_quade range frame")
    qr = rng.select(
        "day",
        (
            F.rank().over(Window.orderBy("range_c"))
            + (
                F.count(F.lit(1)).over(Window.partitionBy("range_c")) - 1
            )
            / 2.0
        ).alias("q"),
    )
    s_ij = mid.join(qr, "day").select(
        "event_type", (F.col("q") * (F.col("r") - 3.0)).alias("s")
    )
    per_t = s_ij.groupBy("event_type").agg(F.sum("s").alias("s_j"))
    n_df = qr.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a_df = s_ij.agg(F.sum(F.col("s") * F.col("s")).alias("a"))
    b_df = per_t.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("s_j") * F.col("s_j")).alias("b2"),
    )
    tot = n_df.crossJoin(F.broadcast(a_df)).crossJoin(F.broadcast(b_df))
    n = F.col("n")
    b = F.col("b2") / n
    return tot.select(
        n.alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.round(F.col("a"), 6).alias("a_total"),
        F.round(b, 6).alias("b_total"),
        F.round((n - 1) * b / (F.col("a") - b), 6).alias("quade_f"),
    )
