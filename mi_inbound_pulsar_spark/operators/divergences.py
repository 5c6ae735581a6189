"""Distribution-distance operators (round 9, continuation): the
drift-measurement tier between two empirical distributions —
bounded f-divergences (Hellinger, Bhattacharyya, total variation),
the Rényi entropy spectrum of a token distribution, and the
characteristic-function-free two-sample energy distance. Reference
scope: the engine delegates all processing to its injected pipeline
(PulsarMessageConsumer.java:535-545) — this IS that processing layer.

Complements the existing family: ``q_js_divergence`` (symmetrized KL
across sources), ``q_unigram_kl_drift`` (asymmetric KL over time),
``q_wasserstein_distance`` / ``q_psi_drift`` (transport / binned
drift). Weekday/weekend is derived as ``epoch_day % 7`` (1970-01-01
was a Thursday, so Saturday ≡ 2, Sunday ≡ 3 mod 7) — pure integer
arithmetic, immune to engine day-of-week conventions and timezones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

# weekend test on epoch days: day 0 = Thu, so Sat ≡ 2, Sun ≡ 3 (mod 7)
_WEEKEND_SQL = "(epoch_us(ts) // 86400000000) % 7 IN (2, 3)"


def _purchases_with_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.floor(F.unix_micros("ts") / 86_400_000_000)
    return e.select(
        (day % 7).isin(2, 3).alias("weekend"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )


# --------------------------------------------------------------------------
# Hellinger / Bhattacharyya / total variation over spend-band histograms
# --------------------------------------------------------------------------
@query(
    "q_hellinger_tv_distance",
    oracle=f"""
    WITH p AS (
      SELECT {_WEEKEND_SQL} AS weekend,
             length(CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR))
               AS band
      FROM events WHERE event_type = 'purchase'
    ),
    h AS (
      SELECT band,
             count(*) FILTER (WHERE NOT weekend) AS c_wd,
             count(*) FILTER (WHERE weekend) AS c_we
      FROM p GROUP BY 1
    ),
    n AS (SELECT sum(c_wd) AS n_wd, sum(c_we) AS n_we FROM h),
    terms AS (
      SELECT sqrt(CAST(c_wd AS DOUBLE) / n_wd
                  * CAST(c_we AS DOUBLE) / n_we) AS bc_term,
             abs(CAST(c_wd AS DOUBLE) / n_wd
                 - CAST(c_we AS DOUBLE) / n_we) AS tv_term
      FROM h, n
    )
    SELECT CAST((SELECT n_wd FROM n) AS BIGINT) AS n_weekday,
           CAST((SELECT n_we FROM n) AS BIGINT) AS n_weekend,
           round(sum(bc_term), 6) AS bhattacharyya_coef,
           round(-ln(sum(bc_term)), 6) AS bhattacharyya_dist,
           round(sqrt(1 - sum(bc_term)), 6) AS hellinger,
           round(sum(tv_term) / 2, 6) AS total_variation
    FROM terms
    """,
)
def q_hellinger_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded f-divergences between the weekday and weekend purchase
    size distributions, histogrammed into exact decimal magnitude
    bands (digit count of the integer cents — band edges that are
    string-exact in both engines, no float log boundaries): the
    Bhattacharyya coefficient Σ√(p·q) and distance −ln BC, the
    Hellinger distance √(1−BC) (a true metric, bounded [0,1]), and
    total variation ½Σ|p−q| (the largest possible probability gap any
    event can exhibit). The bounded companions to the unbounded
    ``q_js_divergence`` / ``q_unigram_kl_drift`` KL family.

    Scale: one filtered map-side-combined rollup to the ≤20-band
    domain; everything after is arithmetic on that rollup.
    """
    p = _purchases_with_weekend(spark, sf_dir)
    h = (
        p.select("weekend", F.length(F.col("cents").cast("string")).alias("band"))
        .groupBy("band")
        .agg(
            F.count_if(~F.col("weekend")).alias("c_wd"),
            F.count_if(F.col("weekend")).alias("c_we"),
        )
    )
    h = bounded_window_input(h, label="q_hellinger band domain")
    wt = Window.partitionBy()
    h = h.withColumn("n_wd", F.sum("c_wd").over(wt)).withColumn(
        "n_we", F.sum("c_we").over(wt)
    )
    p_wd = F.col("c_wd").cast("double") / F.col("n_wd")
    p_we = F.col("c_we").cast("double") / F.col("n_we")
    agg = h.agg(
        F.max("n_wd").cast("long").alias("n_weekday"),
        F.max("n_we").cast("long").alias("n_weekend"),
        F.sum(F.sqrt(p_wd * p_we)).alias("bc"),
        F.sum(F.abs(p_wd - p_we)).alias("tv2"),
    )
    return agg.select(
        "n_weekday",
        "n_weekend",
        F.round(F.col("bc"), 6).alias("bhattacharyya_coef"),
        F.round(-F.log(F.col("bc")), 6).alias("bhattacharyya_dist"),
        F.round(F.sqrt(1 - F.col("bc")), 6).alias("hellinger"),
        F.round(F.col("tv2") / 2, 6).alias("total_variation"),
    )


# --------------------------------------------------------------------------
# Rényi entropy spectrum of the document token distribution
# --------------------------------------------------------------------------
@query(
    "q_renyi_entropy",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1),
    p AS (
      SELECT CAST(c AS DOUBLE) / (SELECT sum(c) FROM freq) AS p FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab,
           round(ln(count(*)), 6) AS h0_hartley,
           round(CAST(-sum(p * ln(p)) AS DOUBLE), 6) AS h1_shannon,
           round(CAST(2 * ln(sum(sqrt(p))) AS DOUBLE), 6) AS h_half,
           round(CAST(-ln(sum(p * p)) AS DOUBLE), 6) AS h2_collision,
           round(CAST(-ln(max(p)) AS DOUBLE), 6) AS h_inf_min
    FROM p
    """,
)
def q_renyi_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rényi entropy spectrum H_α = ln(Σp^α)/(1−α) of the corpus
    unigram distribution at the five canonical orders: α=0 (Hartley,
    ln vocab — pure support size), α=½ (the Bhattacharyya order),
    α→1 (Shannon — ``q_token_entropy``'s scalar), α=2 (collision
    entropy, −ln Σp², what ``q_ams_f2_moment`` sketches), and α→∞
    (min-entropy, −ln max p — the guessing-attack bound privacy work
    cares about). H_α is non-increasing in α, which the pytest third
    opinion asserts as a free invariant.

    Scale: one tokenize+groupBy to the vocabulary domain; the spectrum
    is a single aggregate over it (max p folds in the same pass — no
    top-1 sort).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    freq = bounded_window_input(freq, label="q_renyi vocabulary domain")
    freq = freq.withColumn(
        "p", F.col("c").cast("double") / F.sum("c").over(Window.partitionBy())
    )
    return freq.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.round(F.log(F.count(F.lit(1)).cast("double")), 6).alias("h0_hartley"),
        F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("h1_shannon"),
        F.round(2 * F.log(F.sum(F.sqrt("p"))), 6).alias("h_half"),
        F.round(-F.log(F.sum(F.col("p") * F.col("p"))), 6).alias(
            "h2_collision"
        ),
        F.round(-F.log(F.max("p")), 6).alias("h_inf_min"),
    )


# --------------------------------------------------------------------------
# Two-sample energy distance (Székely & Rizzo) via sorted-rollup sums
# --------------------------------------------------------------------------
@query(
    "q_energy_distance",
    oracle=f"""
    WITH raw AS (
      SELECT {_WEEKEND_SQL} AS weekend,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    vc AS (
      SELECT v,
             count(*) FILTER (WHERE NOT weekend) AS c1,
             count(*) FILTER (WHERE weekend) AS c2
      FROM raw GROUP BY 1
    ),
    cum AS (
      SELECT v, c1, c2,
             sum(c1) OVER (ORDER BY v) AS f1,
             sum(c2) OVER (ORDER BY v) AS f2,
             sum(v * c1) OVER (ORDER BY v) AS s1,
             sum(v * c2) OVER (ORDER BY v) AS s2,
             sum(c1) OVER () AS n, sum(c2) OVER () AS m,
             sum(v * c1) OVER () AS t1, sum(v * c2) OVER () AS t2
      FROM vc
    ),
    sums AS (
      SELECT max(n) AS n, max(m) AS m,
             sum(CAST(c1 AS DOUBLE) * (v * (2 * f2 - m) + t2 - 2 * s2))
               / (max(n) * max(m)) AS exy,
             sum(CAST(c1 AS DOUBLE) * (v * (2 * f1 - n) + t1 - 2 * s1))
               / (CAST(max(n) AS DOUBLE) * max(n)) AS exx,
             sum(CAST(c2 AS DOUBLE) * (v * (2 * f2 - m) + t2 - 2 * s2))
               / (CAST(max(m) AS DOUBLE) * max(m)) AS eyy
      FROM cum
    )
    SELECT CAST(n AS BIGINT) AS n_weekday, CAST(m AS BIGINT) AS n_weekend,
           round(exy / 100, 6) AS e_cross_dollars,
           round((2 * exy - exx - eyy) / 100, 6) AS energy_dist_dollars,
           round(n * m / (n + m) * (2 * exy - exx - eyy) / 100, 6)
             AS e_statistic
    FROM sums
    """,
)
def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample energy distance (Székely & Rizzo 2004) between
    weekday and weekend purchase sizes: D = 2E|X−Y| − E|X−X'| −
    E|Y−Y'|, zero iff the distributions are equal — a
    whole-distribution two-sample test with no binning, no bandwidth,
    and (in 1-D) no O(n²) pair enumeration: for sorted values,
    Σⱼ|v−yⱼ| = v(2·F_y(v)−m) + T_y − 2·S_y(v) from one cumulative
    count and one cumulative sum, so all three expectations fall out
    of a single pass over the distinct-cents rollup. Also reports the
    Székely-Rizzo E-statistic nm/(n+m)·D that permutation tests
    threshold.

    Scale: same shape as ``q_cramer_von_mises`` — one rollup, one
    guarded cumulative window, one aggregate. Integer cents keep every
    cumulative exact (cents·count ≪ 2⁶³) until the final division.
    """
    raw = _purchases_with_weekend(spark, sf_dir)
    vc = raw.groupBy(F.col("cents").alias("v")).agg(
        F.count_if(~F.col("weekend")).alias("c1"),
        F.count_if(F.col("weekend")).alias("c2"),
    )
    vc = bounded_window_input(vc, label="q_energy_distance value domain")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = vc.select(
        "v",
        "c1",
        "c2",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.sum(F.col("v") * F.col("c1")).over(w).alias("s1"),
        F.sum(F.col("v") * F.col("c2")).over(w).alias("s2"),
        F.sum("c1").over(wt).alias("n"),
        F.sum("c2").over(wt).alias("m"),
        F.sum(F.col("v") * F.col("c1")).over(wt).alias("t1"),
        F.sum(F.col("v") * F.col("c2")).over(wt).alias("t2"),
    )
    v = F.col("v")
    cross_y = v * (2 * F.col("f2") - F.col("m")) + F.col("t2") - 2 * F.col("s2")
    cross_x = v * (2 * F.col("f1") - F.col("n")) + F.col("t1") - 2 * F.col("s1")
    sums = cum.agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        (
            F.sum(F.col("c1").cast("double") * cross_y)
            / (F.max("n") * F.max("m"))
        ).alias("exy"),
        (
            F.sum(F.col("c1").cast("double") * cross_x)
            / (F.max("n").cast("double") * F.max("n"))
        ).alias("exx"),
        (
            F.sum(F.col("c2").cast("double") * cross_y)
            / (F.max("m").cast("double") * F.max("m"))
        ).alias("eyy"),
    )
    d = 2 * F.col("exy") - F.col("exx") - F.col("eyy")
    n, m = F.col("n").cast("double"), F.col("m").cast("double")
    return sums.select(
        F.col("n").cast("long").alias("n_weekday"),
        F.col("m").cast("long").alias("n_weekend"),
        F.round(F.col("exy") / 100, 6).alias("e_cross_dollars"),
        F.round(d / 100, 6).alias("energy_dist_dollars"),
        F.round(n * m / (n + m) * d / 100, 6).alias("e_statistic"),
    )


# --------------------------------------------------------------------------
# Inequality indices: Atkinson and Theil over per-customer spend
# --------------------------------------------------------------------------
@query(
    "q_atkinson_theil",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS s
      FROM orders GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             avg(CAST(s AS DOUBLE)) AS mu,
             avg(sqrt(CAST(s AS DOUBLE))) AS m_half,
             exp(avg(ln(CAST(s AS DOUBLE)))) AS geo,
             avg(CAST(s AS DOUBLE) * ln(CAST(s AS DOUBLE))) AS m_xlnx
      FROM spend WHERE s > 0
    )
    SELECT n AS n_customers,
           round(mu / 100, 6) AS mean_spend_dollars,
           round(1 - m_half * m_half / mu, 6) AS atkinson_05,
           round(1 - geo / mu, 6) AS atkinson_1,
           round(m_xlnx / mu - ln(mu), 6) AS theil_t,
           round(ln(mu) - ln(geo), 6) AS theil_l
    FROM agg
    """,
)
def q_atkinson_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welfare-grounded inequality indices over per-customer total
    spend (integer cents), beside ``q_gini_spend`` / ``q_lorenz_curve``:
    Atkinson A(ε) = 1 − (E[x^{1−ε}])^{1/(1−ε)}/μ at ε = 0.5 and its
    ε→1 limit 1 − geomean/μ, plus both Theil indices — T = E[(x/μ)·
    ln(x/μ)] (top-sensitive) and L = ln μ − ln geomean (bottom-
    sensitive, the mean log deviation). Unlike Gini, Theil decomposes
    additively across subgroups, which is why drift dashboards carry
    it. All four are functions of FOUR order-insensitive moments
    (μ, E√x, E ln x, E x·ln x) — identities the oracle mirrors exactly:
    A(0.5) = 1 − (E√x)²/μ, T = E[x ln x]/μ − ln μ.

    Scale: one groupBy to the customer domain, one moment aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("s")
    )
    x = F.col("s").cast("double")
    agg = spend.filter(F.col("s") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(x).alias("mu"),
        F.avg(F.sqrt(x)).alias("m_half"),
        F.exp(F.avg(F.log(x))).alias("geo"),
        F.avg(x * F.log(x)).alias("m_xlnx"),
    )
    mu = F.col("mu")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(mu / 100, 6).alias("mean_spend_dollars"),
        F.round(1 - F.col("m_half") * F.col("m_half") / mu, 6).alias(
            "atkinson_05"
        ),
        F.round(1 - F.col("geo") / mu, 6).alias("atkinson_1"),
        F.round(F.col("m_xlnx") / mu - F.log(mu), 6).alias("theil_t"),
        F.round(F.log(mu) - F.log(F.col("geo")), 6).alias("theil_l"),
    )
