"""Rank-based two-sample tests (round 9, continuation): the
distribution-comparison tier beyond location (``q_mann_whitney``) and
max-gap (``q_ks_test``) — integrated ECDF distance (Cramér-von Mises),
tail-weighted ECDF distance (Anderson-Darling k-sample), and the
heteroskedasticity-robust stochastic-superiority test (Brunner-Munzel).
Reference scope: the engine delegates all processing to its injected
pipeline (PulsarMessageConsumer.java:535-545) — this IS that layer.

All three compare finished ('F') vs open ('O') order totals. Ranks are
NEVER assigned per row: the corpus collapses to one per-DISTINCT-VALUE
rollup (exact integer cents), every rank/ECDF quantity is a running sum
over that rollup, and the single global window is guarded by
``bounded_window_input`` (the q_zipf_slope waiver class — window input
is the value domain, not the order stream; at 100 TB you would coarsen
the cent grid to bound the domain explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

# Shared rollup: one row per distinct order-total (integer cents),
# with per-status counts. c1 = sample 1 ('F'), c2 = sample 2 ('O').
_ROLLUP_SQL = """
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS c1,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS c2,
             count(*) AS c
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY 1
"""


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    vc = (
        o.select(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
            "o_orderstatus",
        )
        .groupBy("v")
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("c1"),
            F.count_if(F.col("o_orderstatus") == "O").alias("c2"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    return bounded_window_input(vc, label="ranktests value domain")


# --------------------------------------------------------------------------
# Two-sample Cramér-von Mises
# --------------------------------------------------------------------------
@query(
    "q_cramer_von_mises",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    cum AS (
      SELECT c,
             sum(c1) OVER (ORDER BY v) AS f1,
             sum(c2) OVER (ORDER BY v) AS f2,
             sum(c1) OVER () AS n, sum(c2) OVER () AS m
      FROM vc
    ),
    s AS (
      SELECT max(n) AS n, max(m) AS m,
             sum(c * pow(CAST(f1 AS DOUBLE) / n
                         - CAST(f2 AS DOUBLE) / m, 2)) AS gap2
      FROM cum
    ),
    t AS (
      SELECT CAST(n AS BIGINT) AS n_f, CAST(m AS BIGINT) AS n_o,
             n * m / pow(n + m, 2) * gap2 AS t_stat,
             n + m AS nn, CAST(n AS DOUBLE) AS n, CAST(m AS DOUBLE) AS m
      FROM s
    )
    SELECT n_f, n_o, round(t_stat, 6) AS t_stat,
           round((t_stat - (1 + 1 / nn) / 6)
                 / sqrt((1 + 1 / nn)
                        * (4 * n * m * nn - 3 * (n * n + m * m) - 2 * n * m)
                        / (4 * n * m * nn) / 45), 6) AS t_standardized
    FROM t
    """,
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises criterion (Anderson 1962) between
    finished and open order totals: T = nm/N² · Σ_k (F₁(z_k)−F₂(z_k))²
    summed over every pooled observation z_k — the INTEGRATED squared
    ECDF gap, the whole-distribution companion to ``q_ks_test``'s
    single largest gap. Reported standardized by Anderson's exact
    finite-sample mean (1+1/N)/6 and variance, which depend only on
    (n, m) — no resampling. The ECDF-sum form is tie-safe as written
    (each distinct value contributes its multiplicity × squared gap).

    Scale: one map-side-combined rollup to the distinct-cents domain,
    one guarded running sum over it, one final aggregate.
    """
    cum = _rollup(spark, sf_dir)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = cum.select(
        "c",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.sum("c1").over(wt).alias("n"),
        F.sum("c2").over(wt).alias("m"),
    )
    s = cum.agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.sum(
            F.col("c")
            * F.pow(
                F.col("f1").cast("double") / F.col("n")
                - F.col("f2").cast("double") / F.col("m"),
                2,
            )
        ).alias("gap2"),
    )
    n, m = F.col("n").cast("double"), F.col("m").cast("double")
    nn = n + m
    t_stat = n * m / F.pow(nn, 2) * F.col("gap2")
    mean = (1 + 1 / nn) / 6
    var = (
        (1 + 1 / nn)
        * (4 * n * m * nn - 3 * (n * n + m * m) - 2 * n * m)
        / (4 * n * m * nn)
        / 45
    )
    return s.select(
        F.col("n").cast("long").alias("n_f"),
        F.col("m").cast("long").alias("n_o"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round((t_stat - mean) / F.sqrt(var), 6).alias("t_standardized"),
    )


# --------------------------------------------------------------------------
# Anderson-Darling k-sample (k = 2), ties allowed
# --------------------------------------------------------------------------
@query(
    "q_anderson_darling_2sample",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    cum AS (
      SELECT c, c1, c2,
             sum(c)  OVER (ORDER BY v) AS b,
             sum(c1) OVER (ORDER BY v) AS m1,
             sum(c2) OVER (ORDER BY v) AS m2,
             sum(c1) OVER () AS n1, sum(c2) OVER () AS n2,
             sum(c)  OVER () AS nn
      FROM vc
    )
    SELECT CAST(max(n1) AS BIGINT) AS n_f, CAST(max(n2) AS BIGINT) AS n_o,
           round(sum(CASE WHEN b < nn THEN
               CAST(c AS DOUBLE) / n1
                 * pow(nn * m1 - n1 * b, 2) / (nn * b * (nn - b))
             + CAST(c AS DOUBLE) / n2
                 * pow(nn * m2 - n2 * b, 2) / (nn * b * (nn - b))
             ELSE 0 END), 6) AS a2_stat
    FROM cum
    """,
)
def q_anderson_darling_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-sample Anderson-Darling statistic (Scholz & Stephens 1987,
    eq. 3, k=2) between finished and open order totals — the
    TAIL-WEIGHTED ECDF distance: each pooled position's squared gap is
    divided by B(N−B), so discrepancies in the distribution tails count
    far more than around the median (where Cramér-von Mises is most
    sensitive). Written over distinct values with multiplicities l_j,
    exactly Scholz-Stephens' ties form:
    A² = Σ_i 1/n_i · Σ_{{j<L}} l_j (N·M_ij − n_i·B_j)² / (N B_j (N−B_j)).
    Under H₀ its mean is k−1 = 1.

    Scale: identical shape to ``q_cramer_von_mises`` — one rollup, one
    guarded running sum, one aggregate.
    """
    cum = _rollup(spark, sf_dir)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = cum.select(
        "c",
        F.sum("c").over(w).alias("b"),
        F.sum("c1").over(w).alias("m1"),
        F.sum("c2").over(w).alias("m2"),
        F.sum("c1").over(wt).alias("n1"),
        F.sum("c2").over(wt).alias("n2"),
        F.sum("c").over(wt).alias("nn"),
    )
    c = F.col("c").cast("double")
    nn, b = F.col("nn"), F.col("b")
    inner = F.when(
        b < nn,
        c
        / F.col("n1")
        * F.pow(nn * F.col("m1") - F.col("n1") * b, 2)
        / (nn * b * (nn - b))
        + c
        / F.col("n2")
        * F.pow(nn * F.col("m2") - F.col("n2") * b, 2)
        / (nn * b * (nn - b)),
    ).otherwise(F.lit(0.0))
    return cum.agg(
        F.max("n1").cast("long").alias("n_f"),
        F.max("n2").cast("long").alias("n_o"),
        F.round(F.sum(inner), 6).alias("a2_stat"),
    )


# --------------------------------------------------------------------------
# Brunner-Munzel test (heteroskedasticity-robust rank test, ties via
# midranks)
# --------------------------------------------------------------------------
@query(
    "q_brunner_munzel",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    cum AS (
      SELECT c1, c2,
             coalesce(sum(c)  OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1.0) / 2 AS r,
             coalesce(sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c1 + 1.0) / 2 AS r1w,
             coalesce(sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c2 + 1.0) / 2 AS r2w
      FROM vc
    ),
    s AS (
      SELECT sum(c1) AS n1, sum(c2) AS n2,
             sum(c1 * r) / sum(c1) AS m1, sum(c2 * r) / sum(c2) AS m2,
             sum(c1 * pow(r - r1w, 2)) AS q1, sum(c2 * pow(r - r2w, 2)) AS q2
      FROM cum
    ),
    v AS (
      SELECT CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o,
             n1, n2, m1, m2,
             (q1 - n1 * pow(m1 - (n1 + 1.0) / 2, 2)) / (n1 - 1) AS v1,
             (q2 - n2 * pow(m2 - (n2 + 1.0) / 2, 2)) / (n2 - 1) AS v2
      FROM s
    )
    SELECT n_f, n_o,
           round((m2 - (n2 + 1.0) / 2) / n1, 6) AS p_hat,
           round(n1 * n2 * (m2 - m1)
                 / ((n1 + n2) * sqrt(n1 * v1 + n2 * v2)), 6) AS w_stat,
           round(pow(n1 * v1 + n2 * v2, 2)
                 / (pow(n1 * v1, 2) / (n1 - 1)
                    + pow(n2 * v2, 2) / (n2 - 1)), 6) AS df
    FROM v
    """,
)
def q_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel test (Brunner & Munzel 2000) for stochastic
    superiority P(X<Y) + ½P(X=Y) between finished and open order
    totals — the rank test that, unlike Mann-Whitney, stays valid when
    the two samples have DIFFERENT variances/shapes (the
    Behrens-Fisher situation). Ties handled by midranks throughout.
    Reports the p̂ estimator, the studentized W statistic, and the
    Welch-Satterthwaite degrees of freedom (lawstat's
    ``brunner.munzel.test`` parametrization).

    Scale: pooled AND within-sample midranks both come from running
    sums over the same distinct-cents rollup — the variance terms use
    Σc·(R−R_within)² with the mean correction applied in closed form
    (Σc₁(R−R₁w) = n₁(m₁−(n₁+1)/2) exactly), so one guarded window and
    one aggregate cover everything.
    """
    vc = _rollup(spark, sf_dir)
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vc.select(
        "c1",
        "c2",
        (F.coalesce(F.sum("c").over(wb), F.lit(0)) + (F.col("c") + 1.0) / 2).alias(
            "r"
        ),
        (
            F.coalesce(F.sum("c1").over(wb), F.lit(0)) + (F.col("c1") + 1.0) / 2
        ).alias("r1w"),
        (
            F.coalesce(F.sum("c2").over(wb), F.lit(0)) + (F.col("c2") + 1.0) / 2
        ).alias("r2w"),
    )
    s = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        (F.sum(F.col("c1") * F.col("r")) / F.sum("c1")).alias("m1"),
        (F.sum(F.col("c2") * F.col("r")) / F.sum("c2")).alias("m2"),
        F.sum(F.col("c1") * F.pow(F.col("r") - F.col("r1w"), 2)).alias("q1"),
        F.sum(F.col("c2") * F.pow(F.col("r") - F.col("r2w"), 2)).alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1, m2 = F.col("m1"), F.col("m2")
    v1 = (F.col("q1") - n1 * F.pow(m1 - (n1 + 1.0) / 2, 2)) / (n1 - 1)
    v2 = (F.col("q2") - n2 * F.pow(m2 - (n2 + 1.0) / 2, 2)) / (n2 - 1)
    return s.select(
        n1.cast("long").alias("n_f"),
        n2.cast("long").alias("n_o"),
        F.round((m2 - (n2 + 1.0) / 2) / n1, 6).alias("p_hat"),
        F.round(
            n1 * n2 * (m2 - m1) / ((n1 + n2) * F.sqrt(n1 * v1 + n2 * v2)), 6
        ).alias("w_stat"),
        F.round(
            F.pow(n1 * v1 + n2 * v2, 2)
            / (F.pow(n1 * v1, 2) / (n1 - 1) + F.pow(n2 * v2, 2) / (n2 - 1)),
            6,
        ).alias("df"),
    )


# --------------------------------------------------------------------------
# Rank-based SCALE tests: Ansari-Bradley and Mood — same F/O samples,
# exact tie-block score averaging in closed form
# --------------------------------------------------------------------------
# A tie block occupying pooled positions l..r gets the AVERAGE of the
# position scores over the block (the exact midrank convention).
# Ansari-Bradley score(i) = min(i, N+1-i): the block average is
# piecewise — pure-ascending below the fold m = (N+1)/2, pure-
# descending above, straddling blocks split at m. Mood score(i) =
# (i-(N+1)/2)^2: the block average comes from the Σi, Σi² prefix
# identities. Both are exact integer/half-integer arithmetic.


@query(
    "q_ansari_bradley",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    pos AS (
      SELECT c1, c2,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
               AS r_lo,
             sum(c) OVER (ORDER BY v) AS r_hi,
             sum(c) OVER () AS nn,
             (sum(c) OVER () + 1) // 2 AS m
      FROM vc
    ),
    scored AS (
      SELECT c1, c2, nn,
             CASE WHEN 2 * r_hi <= nn + 1 THEN (r_lo + r_hi) / 2.0
                  WHEN 2 * r_lo >= nn + 1 THEN nn + 1 - (r_lo + r_hi) / 2.0
                  ELSE (
                    (m * (m + 1) - r_lo * (r_lo - 1)) / 2.0
                    + (nn + 1.0) * (r_hi - m)
                    - (r_hi * (r_hi + 1) - m * (m + 1)) / 2.0
                  ) / (r_hi - r_lo + 1)
             END AS a
      FROM pos
    ),
    s AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c1 + c2) AS BIGINT) AS nn,
             sum(c1 * a) AS ab
      FROM scored
    )
    SELECT n1 AS n_f, n2 AS n_o,
           round(ab, 6) AS ab_stat,
           round(CASE WHEN nn % 2 = 0
                      THEN n1 * (nn + 2.0) / 4
                      ELSE n1 * (nn + 1.0) * (nn + 1.0) / (4.0 * nn) END,
                 6) AS ab_mean,
           round((ab - CASE WHEN nn % 2 = 0
                            THEN n1 * (nn + 2.0) / 4
                            ELSE n1 * (nn + 1.0) * (nn + 1.0)
                                 / (4.0 * nn) END)
                 / sqrt(CASE WHEN nn % 2 = 0
                        THEN CAST(n1 AS DOUBLE) * n2 * (nn + 2) * (nn - 2)
                             / (48.0 * (nn - 1))
                        ELSE CAST(n1 AS DOUBLE) * n2 * (nn + 1)
                             * (3 + nn * nn) / (48.0 * nn * nn) END), 6)
             AS z
    FROM s
    """,
)
def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley test for a SCALE difference between finished and
    open order totals: pooled positions are scored min(i, N+1−i) —
    large at the middle, small at both extremes — so a sample whose
    values crowd the tails scores LOW; the rank test for "same center,
    different spread" that ``q_mann_whitney`` (location) cannot see.
    Tie blocks get the exact average of their position scores via the
    closed-form piecewise prefix identity (not min of the midrank,
    which is wrong for blocks straddling the fold). Standardized with
    the exact even/odd-N null moments.

    Scale: one cumulative pass over the distinct-cents rollup — block
    endpoints (l, r) come from the same running sum the other rank
    tests use.
    """
    vc = _rollup(spark, sf_dir)
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wi = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    pos = vc.select(
        "c1",
        "c2",
        (F.coalesce(F.sum("c").over(wb), F.lit(0)) + 1).alias("r_lo"),
        F.sum("c").over(wi).alias("r_hi"),
        F.sum("c").over(wt).alias("nn"),
    )
    nn = F.col("nn")
    r_lo, r_hi = F.col("r_lo"), F.col("r_hi")
    m = F.floor((nn + 1) / 2)
    straddle = (
        (m * (m + 1) - r_lo * (r_lo - 1)) / 2.0
        + (nn + 1.0) * (r_hi - m)
        - (r_hi * (r_hi + 1) - m * (m + 1)) / 2.0
    ) / (r_hi - r_lo + 1)
    a = (
        F.when(2 * r_hi <= nn + 1, (r_lo + r_hi) / 2.0)
        .when(2 * r_lo >= nn + 1, nn + 1 - (r_lo + r_hi) / 2.0)
        .otherwise(straddle)
    )
    s = pos.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") + F.col("c2")).cast("long").alias("nn"),
        F.sum(F.col("c1") * a).alias("ab"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    nt = F.col("nn").cast("double")
    even = F.col("nn") % 2 == 0
    mean = F.when(even, n1 * (nt + 2.0) / 4).otherwise(
        n1 * (nt + 1.0) * (nt + 1.0) / (4.0 * nt)
    )
    var = F.when(
        even, n1 * n2 * (nt + 2) * (nt - 2) / (48.0 * (nt - 1))
    ).otherwise(n1 * n2 * (nt + 1) * (3 + nt * nt) / (48.0 * nt * nt))
    return s.select(
        F.col("n1").alias("n_f"),
        F.col("n2").alias("n_o"),
        F.round(F.col("ab"), 6).alias("ab_stat"),
        F.round(mean, 6).alias("ab_mean"),
        F.round((F.col("ab") - mean) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "q_mood_scale_test",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    pos AS (
      SELECT c1, c2,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
               AS r_lo,
             sum(c) OVER (ORDER BY v) AS r_hi,
             sum(c) OVER () AS nn
      FROM vc
    ),
    scored AS (
      -- average of (i - (N+1)/2)^2 over the tie block l..r, via the
      -- prefix identities Σi = r(r+1)/2, Σi² = r(r+1)(2r+1)/6
      SELECT c1, c2, nn,
             ((r_hi * (r_hi + 1) * (2 * r_hi + 1)
               - (r_lo - 1) * r_lo * (2 * r_lo - 1)) / 6.0
              - (nn + 1.0)
                * (r_hi * (r_hi + 1) - (r_lo - 1) * r_lo) / 2.0
              + (r_hi - r_lo + 1) * (nn + 1.0) * (nn + 1.0) / 4.0)
             / (r_hi - r_lo + 1) AS sc
      FROM pos
    ),
    s AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c1 + c2) AS BIGINT) AS nn,
             sum(c1 * sc) AS t_stat
      FROM scored
    )
    SELECT n1 AS n_f, n2 AS n_o,
           round(t_stat, 6) AS mood_t,
           round(n1 * (CAST(nn AS DOUBLE) * nn - 1) / 12.0, 6) AS t_mean,
           round((t_stat - n1 * (CAST(nn AS DOUBLE) * nn - 1) / 12.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1)
                        * (CAST(nn AS DOUBLE) * nn - 4) / 180.0), 6) AS z
    FROM s
    """,
)
def q_mood_scale_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's scale test on the same samples as ``q_ansari_bradley``:
    scores (i − (N+1)/2)² weight positions by squared distance from
    the pooled center, so it reads dispersion with a quadratic lens
    where Ansari-Bradley's triangular min(i, N+1−i) reads it linearly
    (Mood has higher asymptotic efficiency under normality, AB is
    less tail-sensitive — the classic pairing). Tie blocks average
    their exact position scores through the Σi/Σi² prefix identities.
    Null moments E[T] = n₁(N²−1)/12, Var[T] = n₁n₂(N+1)(N²−4)/180.

    Scale: identical single-pass shape to every rank test here.
    """
    vc = _rollup(spark, sf_dir)
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wi = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    pos = vc.select(
        "c1",
        "c2",
        (F.coalesce(F.sum("c").over(wb), F.lit(0)) + 1).alias("r_lo"),
        F.sum("c").over(wi).alias("r_hi"),
        F.sum("c").over(wt).alias("nn"),
    )
    nn = F.col("nn").cast("double")
    r_lo, r_hi = F.col("r_lo"), F.col("r_hi")
    cnt = r_hi - r_lo + 1
    sum_i = (r_hi * (r_hi + 1) - (r_lo - 1) * r_lo) / 2.0
    sum_i2 = (
        r_hi * (r_hi + 1) * (2 * r_hi + 1)
        - (r_lo - 1) * r_lo * (2 * r_lo - 1)
    ) / 6.0
    sc = (
        sum_i2 - (nn + 1.0) * sum_i + cnt * (nn + 1.0) * (nn + 1.0) / 4.0
    ) / cnt
    s = pos.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") + F.col("c2")).cast("long").alias("nn"),
        F.sum(F.col("c1") * sc).alias("t_stat"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    nt = F.col("nn").cast("double")
    mean = n1 * (nt * nt - 1) / 12.0
    var = n1 * n2 * (nt + 1) * (nt * nt - 4) / 180.0
    return s.select(
        F.col("n1").alias("n_f"),
        F.col("n2").alias("n_o"),
        F.round(F.col("t_stat"), 6).alias("mood_t"),
        F.round(mean, 6).alias("t_mean"),
        F.round((F.col("t_stat") - mean) / F.sqrt(var), 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Lepage combined location-scale test
# --------------------------------------------------------------------------
@query(
    "q_lepage_test",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    pos AS (
      SELECT c1, c2, c,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
               AS r_lo,
             sum(c) OVER (ORDER BY v) AS r_hi,
             sum(c) OVER () AS nn,
             (sum(c) OVER () + 1) // 2 AS m
      FROM vc
    ),
    scored AS (
      SELECT c1, c2, c, nn,
             (r_lo + r_hi) / 2.0 AS r_mid,
             CASE WHEN 2 * r_hi <= nn + 1 THEN (r_lo + r_hi) / 2.0
                  WHEN 2 * r_lo >= nn + 1 THEN nn + 1 - (r_lo + r_hi) / 2.0
                  ELSE (
                    (m * (m + 1) - r_lo * (r_lo - 1)) / 2.0
                    + (nn + 1.0) * (r_hi - m)
                    - (r_hi * (r_hi + 1) - m * (m + 1)) / 2.0
                  ) / (r_hi - r_lo + 1)
             END AS a
      FROM pos
    ),
    s AS (
      SELECT sum(c1) AS n1, sum(c2) AS n2, max(nn) AS nn,
             sum(c1 * r_mid) AS w_stat,
             sum(c1 * a) AS ab_stat,
             sum(CAST(c AS DOUBLE) * c * c - c) AS tie_term
      FROM scored
    ),
    z AS (
      SELECT CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o,
             (w_stat - n1 * (nn + 1.0) / 2)
             / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * ((nn + 1) - tie_term / (CAST(nn AS DOUBLE)
                                              * (nn - 1)))) AS z_w,
             (ab_stat - CASE WHEN nn % 2 = 0
                             THEN n1 * (nn + 2.0) / 4
                             ELSE n1 * (nn + 1.0) * (nn + 1.0)
                                  / (4.0 * nn) END)
             / sqrt(CASE WHEN nn % 2 = 0
                    THEN CAST(n1 AS DOUBLE) * n2 * (nn + 2) * (nn - 2)
                         / (48.0 * (nn - 1))
                    ELSE CAST(n1 AS DOUBLE) * n2 * (nn + 1)
                         * (3 + CAST(nn AS DOUBLE) * nn)
                         / (48.0 * nn * nn) END) AS z_ab
      FROM s
    )
    SELECT n_f, n_o,
           round(z_w, 6) AS z_location,
           round(z_ab, 6) AS z_scale,
           round(z_w * z_w + z_ab * z_ab, 6) AS lepage_l
    FROM z
    """,
)
def q_lepage_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage test (1971): the combined location-AND-scale omnibus
    L = z²_Wilcoxon + z²_Ansari-Bradley on the finished/open order
    totals — χ²₂ under H₀, catching the shift-plus-spread
    alternatives that each component test alone under-rejects (the
    rank analogue of testing mean and variance jointly). Components
    use the exact same machinery as ``q_mann_whitney`` (tie-corrected
    Wilcoxon variance) and ``q_ansari_bradley`` (exact tie-block
    score averages, exact even/odd moments); both z's are reported so
    the rejecting dimension is identifiable.

    Scale: ONE cumulative pass over the shared distinct-cents rollup
    computes both statistics — the combination is free.
    """
    vc = _rollup(spark, sf_dir)
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wi = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    pos = vc.select(
        "c1",
        "c2",
        "c",
        (F.coalesce(F.sum("c").over(wb), F.lit(0)) + 1).alias("r_lo"),
        F.sum("c").over(wi).alias("r_hi"),
        F.sum("c").over(wt).alias("nn"),
    )
    nn = F.col("nn")
    r_lo, r_hi = F.col("r_lo"), F.col("r_hi")
    m = F.floor((nn + 1) / 2)
    r_mid = (r_lo + r_hi) / 2.0
    straddle = (
        (m * (m + 1) - r_lo * (r_lo - 1)) / 2.0
        + (nn + 1.0) * (r_hi - m)
        - (r_hi * (r_hi + 1) - m * (m + 1)) / 2.0
    ) / (r_hi - r_lo + 1)
    a = (
        F.when(2 * r_hi <= nn + 1, r_mid)
        .when(2 * r_lo >= nn + 1, nn + 1 - r_mid)
        .otherwise(straddle)
    )
    s = pos.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.max("nn").alias("nn"),
        F.sum(F.col("c1") * r_mid).alias("w_stat"),
        F.sum(F.col("c1") * a).alias("ab_stat"),
        F.sum(
            F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    nt = F.col("nn").cast("double")
    z_w = (F.col("w_stat") - n1 * (nt + 1.0) / 2) / F.sqrt(
        n1 * n2 / 12.0 * ((nt + 1) - F.col("tie_term") / (nt * (nt - 1)))
    )
    even = F.col("nn") % 2 == 0
    ab_mean = F.when(even, n1 * (nt + 2.0) / 4).otherwise(
        n1 * (nt + 1.0) * (nt + 1.0) / (4.0 * nt)
    )
    ab_var = F.when(
        even, n1 * n2 * (nt + 2) * (nt - 2) / (48.0 * (nt - 1))
    ).otherwise(n1 * n2 * (nt + 1) * (3 + nt * nt) / (48.0 * nt * nt))
    z_ab = (F.col("ab_stat") - ab_mean) / F.sqrt(ab_var)
    return s.select(
        F.col("n1").cast("long").alias("n_f"),
        F.col("n2").cast("long").alias("n_o"),
        F.round(z_w, 6).alias("z_location"),
        F.round(z_ab, 6).alias("z_scale"),
        F.round(z_w * z_w + z_ab * z_ab, 6).alias("lepage_l"),
    )


# --------------------------------------------------------------------------
# Baumgartner-Weiß-Schindler test
# --------------------------------------------------------------------------
@query(
    "q_baumgartner_weiss",
    oracle=f"""
    WITH vc AS ({_ROLLUP_SQL}),
    pos AS (
      SELECT c1, c2,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1.0) / 2 AS r_mid,
             coalesce(sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum1_before,
             coalesce(sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum2_before,
             sum(c1) OVER () AS n, sum(c2) OVER () AS m
      FROM vc
    ),
    ex AS (
      SELECT r_mid, cum1_before + u.i AS i, 1 AS which, n, m
      FROM pos, unnest(range(1, CAST(c1 AS BIGINT) + 1)) AS u(i)
      WHERE c1 > 0
      UNION ALL
      SELECT r_mid, cum2_before + u.i AS i, 2 AS which, n, m
      FROM pos, unnest(range(1, CAST(c2 AS BIGINT) + 1)) AS u(i)
      WHERE c2 > 0
    ),
    b AS (
      SELECT which,
             CASE WHEN which = 1
                  THEN avg(pow(r_mid - (n + m) * 1.0 / n * i, 2)
                           / ((i / (n + 1.0)) * (1 - i / (n + 1.0))
                              * m * (n + m) * 1.0 / n))
                  ELSE avg(pow(r_mid - (n + m) * 1.0 / m * i, 2)
                           / ((i / (m + 1.0)) * (1 - i / (m + 1.0))
                              * n * (n + m) * 1.0 / m))
             END AS b_part,
             max(n) AS n, max(m) AS m
      FROM ex GROUP BY which
    )
    SELECT CAST(max(n) AS BIGINT) AS n_f, CAST(max(m) AS BIGINT) AS n_o,
           round(max(CASE WHEN which = 1 THEN b_part END), 6) AS b_x,
           round(max(CASE WHEN which = 2 THEN b_part END), 6) AS b_y,
           round((max(CASE WHEN which = 1 THEN b_part END)
                  + max(CASE WHEN which = 2 THEN b_part END)) / 2, 6)
             AS bws_b
    FROM b
    """,
)
def q_baumgartner_weiss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baumgartner-Weiß-Schindler test (1998) on the finished/open
    order totals: B = (B_X + B_Y)/2 with each B a VARIANCE-NORMALIZED
    integrated squared rank discrepancy — weighting each within-sample
    position i by 1/(ψ(1−ψ)) where ψ = i/(n+1), so the TAILS count
    fully instead of being damped the way Cramér-von Mises damps them
    — the test shown to dominate KS/CvM/Wilcoxon across shift, scale
    and shape alternatives in the authors' power study. Midranks for
    ties.

    Scale: the rollup is expanded back to one row per OBSERVATION
    (flat sequence explode — a map, not a window) because the BWS
    weight depends on the within-sample index i, not just the value
    block; everything else is one aggregate. Expansion is the sample
    size, the same cardinality every other rank test already scanned.
    """
    vc = _rollup(spark, sf_dir)
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy()
    pos = vc.select(
        "c1",
        "c2",
        (
            F.coalesce(F.sum("c").over(wb), F.lit(0)) + (F.col("c") + 1.0) / 2
        ).alias("r_mid"),
        F.coalesce(F.sum("c1").over(wb), F.lit(0)).alias("cum1_before"),
        F.coalesce(F.sum("c2").over(wb), F.lit(0)).alias("cum2_before"),
        F.sum("c1").over(wt).alias("n"),
        F.sum("c2").over(wt).alias("m"),
    )
    ex1 = (
        pos.filter(F.col("c1") > 0)
        .select(
            "r_mid",
            "n",
            "m",
            F.explode(F.sequence(F.lit(1), F.col("c1"))).alias("k"),
            F.col("cum1_before"),
        )
        .select(
            "r_mid",
            "n",
            "m",
            (F.col("cum1_before") + F.col("k")).alias("i"),
            F.lit(1).alias("which"),
        )
    )
    ex2 = (
        pos.filter(F.col("c2") > 0)
        .select(
            "r_mid",
            "n",
            "m",
            F.explode(F.sequence(F.lit(1), F.col("c2"))).alias("k"),
            F.col("cum2_before"),
        )
        .select(
            "r_mid",
            "n",
            "m",
            (F.col("cum2_before") + F.col("k")).alias("i"),
            F.lit(2).alias("which"),
        )
    )
    ex = ex1.unionByName(ex2)
    n, m = F.col("n"), F.col("m")
    i = F.col("i")
    term1 = F.pow(F.col("r_mid") - (n + m) * 1.0 / n * i, 2) / (
        (i / (n + 1.0)) * (1 - i / (n + 1.0)) * m * (n + m) * 1.0 / n
    )
    term2 = F.pow(F.col("r_mid") - (n + m) * 1.0 / m * i, 2) / (
        (i / (m + 1.0)) * (1 - i / (m + 1.0)) * n * (n + m) * 1.0 / m
    )
    b = ex.groupBy("which").agg(
        F.avg(
            F.when(F.col("which") == 1, term1).otherwise(term2)
        ).alias("b_part"),
        F.max("n").alias("n"),
        F.max("m").alias("m"),
    )
    out = b.agg(
        F.max("n").cast("long").alias("n_f"),
        F.max("m").cast("long").alias("n_o"),
        F.round(
            F.max(F.when(F.col("which") == 1, F.col("b_part"))), 6
        ).alias("b_x"),
        F.round(
            F.max(F.when(F.col("which") == 2, F.col("b_part"))), 6
        ).alias("b_y"),
        F.round(
            (
                F.max(F.when(F.col("which") == 1, F.col("b_part")))
                + F.max(F.when(F.col("which") == 2, F.col("b_part")))
            )
            / 2,
            6,
        ).alias("bws_b"),
    )
    return out


# --------------------------------------------------------------------------
# Paired tests: sign test and Wilcoxon signed-rank on per-part
# finished-vs-open price differences
# --------------------------------------------------------------------------
# pairing: for every part bought under both statuses, the difference
# of its average extended price between 'F' and 'O' baskets — a
# natural paired design (each part is its own control).
_PAIRED_DIFF_SQL = """
      -- exact-integer mean cents: per-row cents are exact (2dp prices),
      -- sums are exact BIGINTs, and the half-up rounding of the mean is
      -- pure integer arithmetic ((2s + c) // (2c)) — NO float aggregate
      -- anywhere, so the value is bit-identical on both engines at ANY
      -- scale. The previous round(avg(double)*100) flipped a .5
      -- boundary at sf1.0 when 10x more addends moved the float sum by
      -- an ulp (round-11 second-decade parity audit), which then
      -- perturbed the signed-rank tie structure.
      SELECT l.l_partkey AS part,
             (2 * sum(CASE WHEN o.o_orderstatus = 'F'
                      THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) END)
                + count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END))
               // (2 * count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END))
             - (2 * sum(CASE WHEN o.o_orderstatus = 'O'
                        THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) END)
                  + count(CASE WHEN o.o_orderstatus = 'O' THEN 1 END))
                 // (2 * count(CASE WHEN o.o_orderstatus = 'O' THEN 1 END))
               AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus IN ('F', 'O')
      GROUP BY 1
      HAVING count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) > 0
         AND count(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) > 0
"""


def _paired_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part mean-cents difference between finished and open
    orders, computed with NO float aggregate: per-row cents are exact
    (2dp prices), sums are exact BIGINTs, and the half-up mean
    rounding is integer arithmetic ``(2s + c) div (2c)`` — so the
    value is bit-identical across engines at any scale (the previous
    ``round(avg(double)*100)`` flipped a .5 boundary at sf1.0; see
    SCALE.md round 11)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    g = j.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", cents)).alias("f_sum"),
        F.count(F.when(F.col("o_orderstatus") == "F", F.lit(1))).alias("f_cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "O", cents)).alias("o_sum"),
        F.count(F.when(F.col("o_orderstatus") == "O", F.lit(1))).alias("o_cnt"),
    )
    return (
        g.filter((F.col("f_cnt") > 0) & (F.col("o_cnt") > 0))
        .select(
            "part",
            (
                F.expr("(2 * f_sum + f_cnt) div (2 * f_cnt)")
                - F.expr("(2 * o_sum + o_cnt) div (2 * o_cnt)")
            ).alias("d"),
        )
    )


@query(
    "q_sign_test",
    oracle=f"""
    WITH d AS ({_PAIRED_DIFF_SQL}),
    s AS (
      SELECT CAST(count(*) FILTER (d > 0) AS BIGINT) AS n_pos,
             CAST(count(*) FILTER (d < 0) AS BIGINT) AS n_neg,
             CAST(count(*) FILTER (d = 0) AS BIGINT) AS n_zero
      FROM d
    )
    SELECT n_pos, n_neg, n_zero,
           round((n_pos - (n_pos + n_neg) / 2.0)
                 / sqrt((n_pos + n_neg) / 4.0), 6) AS z,
           round((abs(n_pos - (n_pos + n_neg) / 2.0) - 0.5)
                 / sqrt((n_pos + n_neg) / 4.0), 6) AS z_continuity
    FROM s
    """,
)
def q_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on per-part price differences between finished
    and open orders (each part its own control): counts of positive /
    negative differences against Binomial(n, ½), normal-approximated
    with and without continuity correction, exact zeros dropped (the
    textbook convention). The assumption-free floor of the paired
    family — it reads only SIGNS, so one monster difference cannot
    move it, the property ``q_wilcoxon_signed_rank`` trades away for
    power.

    Scale: one join-groupBy to the part domain, one counting
    aggregate. Integer cents make d = 0 exact, not a float accident.
    """
    d = _paired_diffs(spark, sf_dir)
    s = d.agg(
        F.count_if(F.col("d") > 0).cast("long").alias("n_pos"),
        F.count_if(F.col("d") < 0).cast("long").alias("n_neg"),
        F.count_if(F.col("d") == 0).cast("long").alias("n_zero"),
    )
    n_pos, n_neg = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    n = n_pos + n_neg
    return s.select(
        "n_pos",
        "n_neg",
        "n_zero",
        F.round((n_pos - n / 2) / F.sqrt(n / 4), 6).alias("z"),
        F.round(
            (F.abs(n_pos - n / 2) - 0.5) / F.sqrt(n / 4), 6
        ).alias("z_continuity"),
    )


@query(
    "q_wilcoxon_signed_rank",
    oracle=f"""
    WITH d AS ({_PAIRED_DIFF_SQL}),
    nz AS (SELECT d, abs(d) AS ad FROM d WHERE d <> 0),
    vc AS (
      SELECT ad, count(*) AS c,
             count(*) FILTER (d > 0) AS c_pos
      FROM nz GROUP BY ad
    ),
    mr AS (
      SELECT ad, c, c_pos,
             coalesce(sum(c) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1.0) / 2 AS r
      FROM vc
    ),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             sum(c_pos * r) AS w_plus,
             sum(CAST(c AS DOUBLE) * c * c - c) AS tie_term
      FROM mr
    )
    SELECT n AS n_pairs,
           round(w_plus, 6) AS w_plus,
           round(n * (n + 1.0) / 4, 6) AS w_mean,
           round((w_plus - n * (n + 1.0) / 4)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24
                        - tie_term / 48), 6) AS z
    FROM s
    """,
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the same per-part paired
    differences as ``q_sign_test``: rank the |d| (midranks for ties,
    zeros dropped), sum the ranks of the positive differences, and
    standardize with E[W⁺] = n(n+1)/4 and the tie-corrected variance
    n(n+1)(2n+1)/24 − Σ(t³−t)/48 — uses magnitude ORDER information
    the sign test discards, the standard power upgrade when
    differences are roughly symmetric.

    Scale: the paired rollup collapses to the distinct-|d| domain;
    midranks are the usual single guarded cumulative pass.
    """
    d = _paired_diffs(spark, sf_dir)
    nz = d.filter(F.col("d") != 0).select(
        "d", F.abs("d").alias("ad")
    )
    vc = nz.groupBy("ad").agg(
        F.count(F.lit(1)).alias("c"),
        F.count_if(F.col("d") > 0).alias("c_pos"),
    )
    vc = bounded_window_input(vc, label="q_signed_rank |d| domain")
    wb = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    mr = vc.select(
        "c",
        "c_pos",
        (
            F.coalesce(F.sum("c").over(wb), F.lit(0)) + (F.col("c") + 1.0) / 2
        ).alias("r"),
    )
    s = mr.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c_pos") * F.col("r")).alias("w_plus"),
        F.sum(
            F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    n = F.col("n").cast("double")
    mean = n * (n + 1.0) / 4
    var = n * (n + 1.0) * (2 * n + 1) / 24 - F.col("tie_term") / 48
    return s.select(
        F.col("n").alias("n_pairs"),
        F.round(F.col("w_plus"), 6).alias("w_plus"),
        F.round(mean, 6).alias("w_mean"),
        F.round((F.col("w_plus") - mean) / F.sqrt(var), 6).alias("z"),
    )
