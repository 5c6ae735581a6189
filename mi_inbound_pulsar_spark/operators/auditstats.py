"""Data-quality audit statistics (round 8): the classical screening
tests a dataset curator runs before trusting a training corpus or an
experiment readout — variance homogeneity (Brown-Forsythe Levene),
median homogeneity (Mood), paired-proportion shift (McNemar),
single-outlier screening (Grubbs), robust trend (Theil-Sen),
two-group survival comparison (log-rank), whiteness (Ljung-Box),
extreme-value tail (Gumbel block maxima), dose-response trend
(Cochran-Armitage) — plus the two portable-hash sketch structures a
100 TB curation pipeline actually deploys: a Count-Min heavy-hitter
sketch and a Bloom-filter decontamination gate, both built from
md5-derived hashes that DuckDB evaluates bit-identically so the
sketches themselves are oracle-checkable (the same trick the
``hash_bucket`` split uses; reference scope: the engine delegates all
processing to its injected pipeline, PulsarMessageConsumer.java:535-545
— this IS that processing layer).

Every aggregate here is a built-in JVM aggregate over a rollup whose
row count is bounded by a domain (segments, priorities, day spine,
sketch cells), so each query is one or two map-side-combined shuffles
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.adaptive import fanout_partitions
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table
from ..plans.iterate import eager_checkpoint

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def _daily_purchase_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, cents): exact integer daily purchase revenue keyed by the
    epoch-day index — the shared day-domain-bounded series every
    time-series test here rolls up from (tz-proof: pure integer
    division of epoch micros, identical in both engines)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return e.groupBy(
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))


_DAILY_SQL = """
      SELECT epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
"""


# --------------------------------------------------------------------------
# Brown-Forsythe Levene test: variance homogeneity across segments
# --------------------------------------------------------------------------
@query(
    "q_levene_test",
    oracle="""
    -- deterministic at any scale (round-11 second-decade audit): the
    -- per-row deviations are EXACT half-cent integers (2dp balances;
    -- the interpolated median is exact in half-cents), their sums are
    -- exact HUGEINTs, and the k-row reductions fold in segment order
    WITH cents AS (
      SELECT c_mktsegment AS seg,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cb
      FROM customer
    ),
    med AS (
      SELECT seg, CAST(2 * median(cb) AS BIGINT) AS med2
      FROM cents GROUP BY 1
    ),
    z AS (
      SELECT c.seg, abs(2 * c.cb - m.med2) AS zh
      FROM cents c JOIN med m ON c.seg = m.seg
    ),
    g AS (
      SELECT seg, count(*) AS n,
             CAST(sum(zh) AS HUGEINT) AS s_h,
             sum(CAST(zh AS HUGEINT) * zh) AS ss_h
      FROM z GROUP BY seg
    ),
    gd AS (
      SELECT seg, n,
             CAST(s_h AS DOUBLE) / 200 AS sd,
             CAST(ss_h AS DOUBLE) / 40000 AS ssd
      FROM g
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
             CAST(sum(CAST(s_h AS HUGEINT)) AS DOUBLE) / 200 AS gs
      FROM g
    ),
    folds AS (
      SELECT t.nn, t.k,
             list_reduce(list(gd.ssd - gd.sd * gd.sd / gd.n ORDER BY gd.seg),
                         (u, v) -> u + v) AS ssw,
             list_reduce(list(gd.n * pow(gd.sd / gd.n - t.gs / t.nn, 2)
                              ORDER BY gd.seg), (u, v) -> u + v) AS ssb
      FROM gd, tot t GROUP BY t.nn, t.k, t.gs
    )
    SELECT nn AS n, CAST(k AS BIGINT) AS k,
           round(ssb, 6) AS ss_between,
           round(ssw, 6) AS ss_within,
           round((nn - k) * 1.0 / (k - 1) * ssb / ssw, 6) AS w_stat
    FROM folds
    """,
)
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe Levene test (Levene 1960; Brown & Forsythe 1974)
    for homogeneity of account-balance variance across market
    segments: the one-way ANOVA F statistic computed on z = |x − group
    median| — the median-centered variant, robust to the non-normality
    that wrecks Bartlett's test. The curator's question it answers:
    can segments be pooled for a single variance estimate, or must
    downstream power calculations stratify?

    Hash-exactness: group medians are exact interpolated percentiles
    (both engines average the middle pair); every sum is over doubles
    derived from them in the same order-insensitive aggregates; the
    final statistic is 6dp-rounded.

    Scale: one broadcast of the k-row median frame, one map-side-
    combined rollup to k rows, one k-row final aggregate. Medians use
    Spark's exact ``percentile`` — at 100 TB swap for
    ``percentile_approx`` and re-derive the contract, or pre-bucket
    cents (the q_quantile_* pattern).
    """
    c = load_table(spark, sf_dir, "customer")
    # exact half-cent deviations, exact integer sums, seg-ordered
    # folds — mirrors the oracle term-for-term (see oracle comment)
    cents = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cb"),
    )
    med = cents.groupBy("seg").agg(
        (2 * F.expr("percentile(cb, 0.5)")).cast("long").alias("med2")
    )
    z = cents.join(F.broadcast(med), "seg").select(
        "seg", F.abs(2 * F.col("cb") - F.col("med2")).alias("zh")
    )
    dec = "decimal(38,0)"
    g = z.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("zh").cast(dec).alias("s_h"),
        F.sum(F.col("zh").cast(dec) * F.col("zh")).cast(dec).alias("ss_h"),
    )
    gd = g.select(
        "seg",
        "n",
        (F.col("s_h").cast("double") / 200).alias("sd"),
        (F.col("ss_h").cast("double") / 40000).alias("ssd"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("s_h").cast("double") / 200).alias("gs"),
    )

    def seg_fold(term_col: str) -> F.Column:
        return F.expr(
            f"aggregate(transform(array_sort(collect_list(struct(seg, {term_col} AS v))),"
            " s -> s.v), 0D, (u, x) -> u + x)"
        )

    folds = (
        gd.crossJoin(F.broadcast(tot))
        .withColumn(
            "w_term", F.col("ssd") - F.col("sd") * F.col("sd") / F.col("n")
        )
        .withColumn(
            "b_term",
            F.col("n")
            * F.pow(
                F.col("sd") / F.col("n") - F.col("gs") / F.col("nn"),
                F.lit(2.0),
            ),
        )
        .groupBy("nn", "k")
        .agg(
            seg_fold("w_term").alias("ss_within"),
            seg_fold("b_term").alias("ssb"),
        )
    )
    return folds.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round("ssb", 6).alias("ss_between"),
        F.round("ss_within", 6).alias("ss_within"),
        F.round(
            (F.col("nn") - F.col("k"))
            / (F.col("k") - 1)
            * F.col("ssb")
            / F.col("ss_within"),
            6,
        ).alias("w_stat"),
    )


# --------------------------------------------------------------------------
# Mood's median test: k-group location shift on counts alone
# --------------------------------------------------------------------------
@query(
    "q_mood_median",
    oracle="""
    WITH gm AS (SELECT median(c_acctbal) AS med FROM customer),
    o AS (
      SELECT c_mktsegment AS seg,
             CAST(count(*) FILTER (c_acctbal > gm.med) AS BIGINT) AS n_above,
             CAST(count(*) FILTER (c_acctbal <= gm.med) AS BIGINT) AS n_le
      FROM customer, gm GROUP BY 1
    ),
    tot AS (
      SELECT sum(n_above) AS ta, sum(n_le) AS tl,
             sum(n_above + n_le) AS nn
      FROM o
    )
    SELECT o.seg, o.n_above, o.n_le,
           round((o.n_above + o.n_le) * t.ta * 1.0 / t.nn, 6) AS exp_above,
           round(pow(o.n_above - (o.n_above + o.n_le) * t.ta * 1.0 / t.nn, 2)
                   / ((o.n_above + o.n_le) * t.ta * 1.0 / t.nn)
                 + pow(o.n_le - (o.n_above + o.n_le) * t.tl * 1.0 / t.nn, 2)
                   / ((o.n_above + o.n_le) * t.tl * 1.0 / t.nn),
                 6) AS chi2_contrib
    FROM o, tot t ORDER BY o.seg
    """,
)
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test (Mood 1950): do the market segments share a
    common median balance? Each segment's counts above / at-or-below
    the GRAND median form a k×2 contingency table whose chi-square
    decomposes per segment — the per-segment ``chi2_contrib`` column
    is the decomposition, so the output names the offending segment,
    not just the verdict. The nonparametric companion to
    ``q_levene_test``: Levene screens the spreads, Mood the centers,
    both on counts/absolute deviations that survive heavy tails.

    Scale: grand median is one exact-percentile aggregate (1 row,
    broadcast); counts are one map-side-combined rollup to k rows.
    """
    c = load_table(spark, sf_dir, "customer")
    gm = c.agg(F.expr("percentile(c_acctbal, 0.5)").alias("med"))
    o = (
        c.crossJoin(F.broadcast(gm))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count_if(F.col("c_acctbal") > F.col("med")).alias("n_above"),
            F.count_if(F.col("c_acctbal") <= F.col("med")).alias("n_le"),
        )
    )
    tot = o.agg(
        F.sum("n_above").alias("ta"),
        F.sum("n_le").alias("tl"),
        F.sum(F.col("n_above") + F.col("n_le")).alias("nn"),
    )
    row_n = F.col("n_above") + F.col("n_le")
    ea = row_n * F.col("ta") / F.col("nn")
    el = row_n * F.col("tl") / F.col("nn")
    return (
        o.crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "n_above",
            "n_le",
            F.round(ea, 6).alias("exp_above"),
            F.round(
                F.pow(F.col("n_above") - ea, F.lit(2.0)) / ea
                + F.pow(F.col("n_le") - el, F.lit(2.0)) / el,
                6,
            ).alias("chi2_contrib"),
        )
        .orderBy("seg")
    )


# --------------------------------------------------------------------------
# McNemar's test: paired year-over-year activity shift
# --------------------------------------------------------------------------
@query(
    "q_mcnemar_test",
    oracle="""
    WITH flags AS (
      SELECT c.c_custkey,
             coalesce(bool_or(year(o.o_orderdate) = 1994), FALSE) AS y94,
             coalesce(bool_or(year(o.o_orderdate) = 1995), FALSE) AS y95
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST(count(*) FILTER (y94 AND y95) AS BIGINT) AS n_both,
           CAST(count(*) FILTER (y94 AND NOT y95) AS BIGINT) AS n_lost,
           CAST(count(*) FILTER (NOT y94 AND y95) AS BIGINT) AS n_gained,
           CAST(count(*) FILTER (NOT y94 AND NOT y95) AS BIGINT) AS n_neither,
           round(pow(abs((count(*) FILTER (y94 AND NOT y95))
                         - (count(*) FILTER (NOT y94 AND y95))) - 1, 2)
                 * 1.0
                 / ((count(*) FILTER (y94 AND NOT y95))
                    + (count(*) FILTER (NOT y94 AND y95))),
                 6) AS chi2_cc
    FROM flags
    """,
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test with continuity correction (McNemar 1947) on the
    paired dichotomy "customer placed an order in 1994" vs "... in
    1995": the discordant cells alone (lost vs gained customers) carry
    the evidence of a marginal shift — the concordant diagonal cancels
    — so χ² = (|b−c|−1)²/(b+c). The panel-data twin of the independent-
    samples proportion tests already in the suite (``q_ab_power_mde``
    family): same customers, two periods, dependence handled exactly.

    Scale: one orderkey-side rollup of boolean ``bool_or`` partials
    per customer (map-side combined), then a single 4-cell aggregate.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    flags = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.coalesce(
                F.bool_or(F.year("o_orderdate") == 1994), F.lit(False)
            ).alias("y94"),
            F.coalesce(
                F.bool_or(F.year("o_orderdate") == 1995), F.lit(False)
            ).alias("y95"),
        )
    )
    b = F.count_if(F.col("y94") & ~F.col("y95"))
    cc = F.count_if(~F.col("y94") & F.col("y95"))
    return flags.agg(
        F.count_if(F.col("y94") & F.col("y95")).alias("n_both"),
        b.alias("n_lost"),
        cc.alias("n_gained"),
        F.count_if(~F.col("y94") & ~F.col("y95")).alias("n_neither"),
        F.round(
            F.pow(F.abs(b - cc) - 1, F.lit(2.0)) / (b + cc), 6
        ).alias("chi2_cc"),
    )


# --------------------------------------------------------------------------
# Grubbs' single-outlier screen over the per-nation revenue rollup
# --------------------------------------------------------------------------
@query(
    "q_grubbs_outlier",
    oracle="""
    WITH nat AS (
      SELECT n.n_name AS nation,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                      AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    s AS (SELECT count(*) AS n, avg(cents) AS m, stddev_samp(cents) AS sd
          FROM nat)
    SELECT nat.nation, nat.cents, CAST(s.n AS BIGINT) AS n_groups,
           round(abs(nat.cents - s.m) / s.sd, 6) AS g_stat
    FROM nat, s
    ORDER BY abs(nat.cents - s.m) / s.sd DESC, nat.nation
    LIMIT 1
    """,
)
def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test statistic (Grubbs 1950) over the 25-nation revenue
    rollup: G = max|x − x̄|/s names the single most aberrant nation and
    how many sample standard deviations out it sits — the screening
    step before any per-nation comparison, because one corrupted
    partition inflates every downstream variance. Run on the ROLLUP,
    not raw rows: outlier screening of group aggregates is the
    actually-useful form at scale (a raw-row Grubbs over 10^11 rows is
    both meaningless and a global sort).

    Scale: the revenue rollup is the standard dimension-join pyramid
    (nation broadcast), 25 rows out; mean/sd one more 1-row aggregate;
    the argmax a 25-row TakeOrdered.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    nat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("long")
            ).alias("cents")
        )
    )
    s = nat.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("cents").alias("m"),
        F.stddev_samp("cents").alias("sd"),
    )
    g = F.abs(F.col("cents") - F.col("m")) / F.col("sd")
    return (
        nat.crossJoin(F.broadcast(s))
        .select(
            "nation",
            "cents",
            F.col("n").cast("long").alias("n_groups"),
            F.round(g, 6).alias("g_stat"),
        )
        .orderBy(F.desc(F.col("g_stat")), "nation")
        .limit(1)
    )


# --------------------------------------------------------------------------
# Theil-Sen robust slope of the daily revenue series
# --------------------------------------------------------------------------
@query(
    "q_theil_sen",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    pairs AS (
      SELECT (b.cents - a.cents) * 1.0 / (b.day - a.day) AS slope
      FROM d a JOIN d b ON b.day > a.day
    ),
    sl AS (SELECT median(slope) AS slope, count(*) AS n_pairs FROM pairs),
    ic AS (
      SELECT median(d.cents - sl.slope * d.day) AS icept, count(*) AS n_days
      FROM d, sl GROUP BY sl.slope
    )
    SELECT CAST(ic.n_days AS BIGINT) AS n_days,
           CAST(sl.n_pairs AS BIGINT) AS n_pairs,
           round(sl.slope, 6) AS slope_cents_per_day,
           round(ic.icept, 6) AS intercept_cents
    FROM sl, ic
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator (Theil 1950; Sen 1968): the median of all
    pairwise slopes of the daily revenue series, with the median-
    residual intercept — the robust trend line whose 29.3% breakdown
    point shrugs off the promo-spike days that drag an OLS fit, and
    the estimator behind the ``q_mann_kendall`` trend test's effect
    size.

    Scale: the series is the day-domain-bounded rollup (|days| rows),
    so the pair self-join is O(days²) on a broadcast-sized frame —
    NEVER raw events; at a 10-year horizon that is ~6.7M pairs, one
    task's work. Both medians are exact interpolated percentiles over
    that bounded frame.
    """
    # localCheckpoint, not persist: a persisted plan is pinned by the
    # CacheManager until an explicit unpersist, which library callers
    # never issue (ADVICE r8); checkpoint blocks are GC-cleaned with
    # the frame. One job materializes the day-domain rollup once.
    d = _daily_purchase_cents(spark, sf_dir).transform(eager_checkpoint)
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("b.day") > F.col("a.day")
    ).select(
        (
            (F.col("b.cents") - F.col("a.cents"))
            / (F.col("b.day") - F.col("a.day"))
        ).alias("slope")
    )
    sl = pairs.agg(
        F.expr("percentile(slope, 0.5)").alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    ic = (
        d.crossJoin(F.broadcast(sl))
        .groupBy("slope", "n_pairs")
        .agg(
            F.expr("percentile(cents - slope * day, 0.5)").alias("icept"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    return ic.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("slope", 6).alias("slope_cents_per_day"),
        F.round("icept", 6).alias("intercept_cents"),
    )


# --------------------------------------------------------------------------
# Log-rank test: two-cohort survival comparison on the signup funnel
# --------------------------------------------------------------------------
SURVIVAL_WINDOW_DAYS = 30


@query(
    "q_logrank_test",
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
      SELECT user_id % 2 AS grp,
             CASE WHEN p_us IS NOT NULL
                  THEN CAST((p_us - s_us) // 86400000000 AS BIGINT)
                  ELSE CAST((h - s_us) // 86400000000 AS BIGINT) END AS e_day,
             p_us IS NOT NULL AS is_event
      FROM conv, horizon
    ),
    spine AS (SELECT unnest(range(0, {SURVIVAL_WINDOW_DAYS})) AS day),
    tab AS (
      SELECT spine.day,
             count(*) FILTER (o.e_day >= spine.day) AS n_t,
             count(*) FILTER (o.e_day >= spine.day AND o.grp = 0) AS n1_t,
             count(*) FILTER (o.is_event AND o.e_day = spine.day) AS d_t,
             count(*) FILTER (o.is_event AND o.e_day = spine.day
                              AND o.grp = 0) AS d1_t
      FROM spine CROSS JOIN obs o GROUP BY spine.day
    )
    SELECT CAST(sum(d1_t) AS BIGINT) AS o1,
           round(sum(d_t * n1_t * 1.0 / n_t), 6) AS e1,
           round(sum(CASE WHEN n_t > 1
                          THEN d_t * (n1_t * 1.0 / n_t)
                               * (1 - n1_t * 1.0 / n_t)
                               * (n_t - d_t) * 1.0 / (n_t - 1) END),
                 6) AS v,
           round(pow(sum(d1_t) - sum(d_t * n1_t * 1.0 / n_t), 2)
                 / sum(CASE WHEN n_t > 1
                            THEN d_t * (n1_t * 1.0 / n_t)
                                 * (1 - n1_t * 1.0 / n_t)
                                 * (n_t - d_t) * 1.0 / (n_t - 1) END),
                 6) AS chi2
    FROM tab WHERE n_t > 0
    """,
)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank test (Mantel 1966) comparing the signup→
    first-purchase survival of two deterministic user cohorts (even vs
    odd user id — the A/B assignment stand-in): at every event day the
    observed group-0 conversions are compared with their hypergeometric
    expectation under "both cohorts share one hazard", and χ² =
    (O−E)²/V aggregates the per-day tables. THE standard two-sample
    censored-data test — ``q_nelson_aalen`` draws each curve's band,
    this decides whether the curves differ at all.

    Scale: identical shape to the KM family — per-user rollup, scalar
    horizon broadcast, {SURVIVAL_WINDOW_DAYS}-row spine cross join,
    one final aggregate. Censoring (no purchase inside the horizon) is
    handled exactly as in ``q_survival_curve``.
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
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.col("p_us").isNotNull(),
            F.floor((F.col("p_us") - F.col("s_us")) / US_PER_DAY),
        )
        .otherwise(F.floor((F.col("h") - F.col("s_us")) / US_PER_DAY))
        .cast("long")
        .alias("e_day"),
        F.col("p_us").isNotNull().alias("is_event"),
    )
    spine = spark.range(0, SURVIVAL_WINDOW_DAYS).select(F.col("id").alias("day"))
    at_risk = F.col("e_day") >= F.col("day")
    died = F.col("is_event") & (F.col("e_day") == F.col("day"))
    tab = (
        F.broadcast(spine)
        .crossJoin(obs)
        .groupBy("day")
        .agg(
            F.count_if(at_risk).alias("n_t"),
            F.count_if(at_risk & (F.col("grp") == 0)).alias("n1_t"),
            F.count_if(died).alias("d_t"),
            F.count_if(died & (F.col("grp") == 0)).alias("d1_t"),
        )
        .filter(F.col("n_t") > 0)
    )
    p1 = F.col("n1_t") / F.col("n_t")
    vterm = F.when(
        F.col("n_t") > 1,
        F.col("d_t") * p1 * (1 - p1) * (F.col("n_t") - F.col("d_t"))
        / (F.col("n_t") - 1),
    )
    return tab.agg(
        F.sum("d1_t").alias("o1"),
        F.round(F.sum(F.col("d_t") * p1), 6).alias("e1"),
        F.round(F.sum(vterm), 6).alias("v"),
        F.round(
            F.pow(F.sum("d1_t") - F.sum(F.col("d_t") * p1), F.lit(2.0))
            / F.sum(vterm),
            6,
        ).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Ljung-Box whiteness test over the daily revenue series
# --------------------------------------------------------------------------
LJUNG_BOX_LAGS = 10


@query(
    "q_ljung_box",
    oracle=f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t, cents,
             count(*) OVER () AS n, avg(cents) OVER () AS m
      FROM d
    ),
    den AS (SELECT sum(pow(cents - m, 2)) AS s0, max(n) AS n FROM idx),
    lags AS (SELECT unnest(range(1, {LJUNG_BOX_LAGS + 1})) AS lag),
    rho AS (
      SELECT l.lag,
             sum((a.cents - a.m) * (b.cents - b.m)) / max(den.s0) AS rho,
             max(den.n) AS n
      FROM lags l
        JOIN idx a ON TRUE
        JOIN idx b ON b.t = a.t + l.lag, den
      GROUP BY l.lag
    )
    SELECT lag, round(rho, 6) AS rho,
           round(n * (n + 2.0) * sum(rho * rho / (n - lag)) OVER (
             ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS q_stat
    FROM rho ORDER BY lag
    """,
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (Ljung & Box 1978) on the daily
    revenue series: Q(m) = n(n+2)·Σ_{{k≤m}} ρ̂²_k/(n−k), reported
    cumulatively per lag up to {LJUNG_BOX_LAGS} with the ρ̂_k
    themselves — the whiteness audit run on a forecast's residuals
    (``q_forecast_backtest``) or on the raw series before fitting
    anything: single autocorrelations (``q_autocorrelation``) can each
    look small while their aggregate is decisive.

    Scale: everything after the daily rollup lives on the day-domain-
    bounded frame — the consecutive index, the lagged self-joins (one
    per lag via the lag-spine cross join) and the {LJUNG_BOX_LAGS}-row
    cumulative window are all bounded; the guard enforces it.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    d = bounded_window_input(d, label="q_ljung_box day series")
    w_all = Window.partitionBy()
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        "cents",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.avg("cents").over(w_all).alias("m"),
    ).transform(eager_checkpoint)  # GC-cleaned, unlike persist (ADVICE r8)
    den = idx.agg(
        F.sum(F.pow(F.col("cents") - F.col("m"), F.lit(2.0))).alias("s0"),
        F.max("n").alias("lb_n"),
    )
    lags = spark.range(1, LJUNG_BOX_LAGS + 1).select(F.col("id").alias("lag"))
    a, b = idx.alias("a"), idx.alias("b")
    rho = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(F.broadcast(b), F.col("b.t") == F.col("a.t") + F.col("lag"))
        .crossJoin(F.broadcast(den))
        .groupBy("lag")
        .agg(
            (
                F.sum(
                    (F.col("a.cents") - F.col("a.m"))
                    * (F.col("b.cents") - F.col("b.m"))
                )
                / F.max("s0")
            ).alias("rho"),
            F.max("lb_n").alias("n"),
        )
    )
    rho = bounded_window_input(rho, label="q_ljung_box lag rollup")
    w_cum = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return rho.select(
        "lag",
        F.round("rho", 6).alias("rho"),
        F.round(
            F.col("n")
            * (F.col("n") + 2.0)
            * F.sum(
                F.col("rho") * F.col("rho") / (F.col("n") - F.col("lag"))
            ).over(w_cum),
            6,
        ).alias("q_stat"),
    ).orderBy("lag")


# --------------------------------------------------------------------------
# Gumbel block maxima: extreme-value fit of hourly revenue peaks
# --------------------------------------------------------------------------
EULER_GAMMA = 0.5772156649015329


@query(
    "q_gumbel_maxima",
    oracle=f"""
    WITH hourly AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             epoch_us(ts) // 3600000000 AS hour,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    blocks AS (SELECT day, max(cents) AS block_max FROM hourly GROUP BY day),
    fit AS (
      SELECT count(*) AS n, avg(block_max) AS m,
             stddev_samp(block_max) AS sd, max(block_max) AS hist_max
      FROM blocks
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           round(sd * sqrt(6) / pi(), 6) AS beta,
           round(m - {EULER_GAMMA} * sd * sqrt(6) / pi(), 6) AS mu,
           CAST(hist_max AS BIGINT) AS hist_max,
           round(1 - exp(-exp(-(hist_max
                                - (m - {EULER_GAMMA} * sd * sqrt(6) / pi()))
                              / (sd * sqrt(6) / pi()))),
                 6) AS p_exceed_hist_max
    FROM fit
    """,
)
def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel block-maxima fit (Gumbel 1958) by the method of moments:
    daily blocks of the HOURLY revenue series yield one block maximum
    each; β̂ = s√6/π, μ̂ = x̄ − γβ̂ (γ = Euler-Mascheroni), and the
    return-level readout is P(a future day's peak hour exceeds the
    historical maximum) = 1 − exp(−exp(−(x_max−μ̂)/β̂)). The capacity-
    planning question ("how rare is our worst observed hour?") that
    mean/variance monitoring cannot answer — extreme-value theory says
    block maxima converge to exactly this family regardless of the
    hourly distribution.

    Scale: two nested rollups (hour cells, then day blocks — both
    time-domain-bounded) and a 1-row moments aggregate. No windows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hourly = e.groupBy(
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
        F.floor(F.unix_micros("ts") / US_PER_HOUR).cast("long").alias("hour"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    blocks = hourly.groupBy("day").agg(F.max("cents").alias("block_max"))
    beta = F.col("sd") * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = F.col("m") - F.lit(EULER_GAMMA) * beta
    return (
        blocks.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("block_max").alias("m"),
            F.stddev_samp("block_max").alias("sd"),
            F.max("block_max").alias("hist_max"),
        )
        .select(
            F.col("n").cast("long").alias("n_blocks"),
            F.round(beta, 6).alias("beta"),
            F.round(mu, 6).alias("mu"),
            F.col("hist_max").cast("long").alias("hist_max"),
            F.round(
                F.lit(1.0)
                - F.exp(-F.exp(-(F.col("hist_max") - mu) / beta)),
                6,
            ).alias("p_exceed_hist_max"),
        )
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: return rate across ordered priorities
# --------------------------------------------------------------------------
@query(
    "q_cochran_armitage",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey,
             CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS score,
             bool_or(l.l_returnflag = 'R') AS returned
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT score, count(*) AS n,
             count(*) FILTER (returned) AS r
      FROM per_order GROUP BY score
    ),
    t AS (
      SELECT sum(n) AS nn, sum(r) AS rr,
             sum(n * score) AS sns, sum(n * score * score) AS snss,
             sum(r * score) AS srs
      FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n,
           round(rr * 1.0 / nn, 6) AS pooled_rate,
           round(srs - rr * 1.0 / nn * sns, 6) AS trend_num,
           round((srs - rr * 1.0 / nn * sns)
                 / sqrt(rr * 1.0 / nn * (1 - rr * 1.0 / nn)
                        * (snss - sns * sns * 1.0 / nn)),
                 6) AS z_trend
    FROM t
    """,
)
def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (Cochran 1954; Armitage 1955): is
    the probability that an order gets a returned line item MONOTONE
    in the order's priority tier (scores 1-URGENT … 5-LOW)? Z =
    Σs_i(r_i − n_i p̄) / √(p̄(1−p̄)(Σn_i s_i² − (Σn_i s_i)²/N)) — the
    dose-response test that a 5×2 chi-square (``q_cramers_v``) throws
    away the ordering for; a drifting trend here is an ops signal a
    flat omnibus test misses.

    Scale: one orderkey rollup with a boolean partial, a 5-row group
    frame, a 1-row moment aggregate — nothing else.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            o.o_orderkey,
            F.substring("o_orderpriority", 1, 1).cast("long").alias("score"),
        )
        .agg(F.bool_or(F.col("l_returnflag") == "R").alias("returned"))
    )
    g = per_order.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.count_if("returned").alias("r")
    )
    t = g.agg(
        F.sum("n").alias("nn"),
        F.sum("r").alias("rr"),
        F.sum(F.col("n") * F.col("score")).alias("sns"),
        F.sum(F.col("n") * F.col("score") * F.col("score")).alias("snss"),
        F.sum(F.col("r") * F.col("score")).alias("srs"),
    )
    p = F.col("rr") / F.col("nn")
    num = F.col("srs") - p * F.col("sns")
    var = p * (1 - p) * (
        F.col("snss") - F.col("sns") * F.col("sns") / F.col("nn")
    )
    return t.select(
        F.col("nn").cast("long").alias("n"),
        F.round(p, 6).alias("pooled_rate"),
        F.round(num, 6).alias("trend_num"),
        F.round(num / F.sqrt(var), 6).alias("z_trend"),
    )


# --------------------------------------------------------------------------
# Portable-hash sketches: Count-Min heavy hitters & Bloom decontamination
# --------------------------------------------------------------------------
CMS_DEPTH = 3
CMS_WIDTH = 32
BLOOM_BITS = 4096
BLOOM_K = 3


def _hexval_sql(md5_expr: str, n_chars: int, wide: bool = False) -> str:
    """SQL computing the integer value of the first ``n_chars`` hex
    chars of ``md5_expr`` — only ``md5``/``substring``/``instr``
    arithmetic, evaluated bit-identically by Spark SQL and DuckDB, so
    the sketch hash functions themselves are oracle-checkable.

    ``wide=True`` emits the positional multipliers as explicit
    ``CAST(... AS BIGINT)`` — required from ~8 hex chars up, where the
    high-digit multiplier (16^7) pushes the term sum past INT range
    and Spark's ANSI integer arithmetic would overflow (DuckDB accepts
    the identical CAST, so one SQL string serves both engines).
    Callers must NOT regex-rewrite the returned SQL instead
    (round-10 ADVICE: a post-hoc rewrite silently breaks if this
    helper's shape changes)."""
    terms = [
        f"(instr('0123456789abcdef', substring({md5_expr}, {i + 1}, 1)) - 1)"
        + (
            f" * CAST({16 ** (n_chars - 1 - i)} AS BIGINT)"
            if wide
            else f" * {16 ** (n_chars - 1 - i)}"
        )
        for i in range(n_chars)
    ]
    return "(" + " + ".join(terms) + ")"


def _cms_bucket_sql(value_sql: str, seed: int) -> str:
    return (
        _hexval_sql(f"md5(concat('cm{seed}:', {value_sql}))", 4)
        + f" % {CMS_WIDTH}"
    )


def _bloom_bit_sql(value_sql: str, seed: int) -> str:
    return (
        _hexval_sql(f"md5(concat('bf{seed}:', {value_sql}))", 3)
        + f" % {BLOOM_BITS}"
    )


@query(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH hashed AS (
      {" UNION ALL ".join(
        f"SELECT {j} AS j,"
        f" {_cms_bucket_sql('CAST(user_id AS VARCHAR)', j)} AS bucket"
        " FROM events"
        for j in range(1, CMS_DEPTH + 1))}
    ),
    cells AS (SELECT j, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
    top AS (
      SELECT user_id, count(*) AS true_n
      FROM events GROUP BY user_id
      ORDER BY true_n DESC, user_id LIMIT 10
    ),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT user_id, true_n, {j} AS j,"
        f" {_cms_bucket_sql('CAST(user_id AS VARCHAR)', j)} AS bucket"
        " FROM top"
        for j in range(1, CMS_DEPTH + 1))}
    )
    SELECT p.user_id, CAST(max(p.true_n) AS BIGINT) AS true_n,
           CAST(min(c.c) AS BIGINT) AS cms_estimate,
           CAST(min(c.c) - max(p.true_n) AS BIGINT) AS overestimate
    FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY p.user_id ORDER BY p.user_id
    """,
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) with
    d={CMS_DEPTH} portable md5-derived hash rows of w={CMS_WIDTH}
    buckets over the event stream's user ids, read back at the true
    top-10 users: estimate = min over rows of the user's bucket
    counter, always ≥ the true count (one-sided error — the
    ``overestimate`` column is the realized collision mass, provably
    non-negative, which the pytest asserts). THE sub-linear frequency
    structure a streaming curation tier keeps when the key domain
    (users, domains, shingles) is too big for an exact rollup: the
    whole sketch is d·w integers regardless of stream length.

    The deliberately tiny width forces visible collisions at every
    test scale, so the one-sided-error contract is exercised, not
    vacuous. Both engines evaluate the same md5-digit hash
    arithmetic, so cells AND estimates hash-match exactly.

    Scale: the sketch build is one map-side-combined groupBy to
    d·w = {CMS_DEPTH * CMS_WIDTH} cells; probing joins the 10-row
    heavy-hitter frame against the broadcast cell table. The true
    top-10 here doubles as the sketch's accuracy oracle — a real
    deployment keeps only the sketch.
    """
    e = load_table(spark, sf_dir, "events")
    probes_expr = [
        F.struct(
            F.lit(j).alias("j"),
            F.expr(_cms_bucket_sql("CAST(user_id AS STRING)", j))
            .cast("long")
            .alias("bucket"),
        )
        for j in range(1, CMS_DEPTH + 1)
    ]
    cells = (
        e.select(F.explode(F.array(*probes_expr)).alias("h"))
        .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.desc("true_n"), "user_id")
        .limit(10)
    )
    probes = top.select(
        "user_id", "true_n", F.explode(F.array(*probes_expr)).alias("h")
    ).select("user_id", "true_n", F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id")
        .agg(
            F.max("true_n").alias("true_n"),
            F.min("c").alias("cms_estimate"),
            (F.min("c") - F.max("true_n")).alias("overestimate"),
        )
        .orderBy("user_id")
    )


@query(
    "q_bloom_decontaminate",
    oracle=f"""
    WITH train AS (
      SELECT text FROM documents
      WHERE substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
    ),
    test AS (
      SELECT doc_id, text FROM documents
      WHERE substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) >= 'cd'
    ),
    bits AS (
      SELECT DISTINCT bit FROM (
        {" UNION ALL ".join(
          f"SELECT {_bloom_bit_sql('text', j)} AS bit FROM train"
          for j in range(1, BLOOM_K + 1))}
      )
    ),
    n_keys AS (SELECT count(DISTINCT md5(text)) AS nk FROM train),
    probe AS (
      SELECT t.doc_id,
             ({" + ".join(
               f"CASE WHEN {_bloom_bit_sql('t.text', j)} IN (SELECT bit FROM bits)"
               " THEN 1 ELSE 0 END"
               for j in range(1, BLOOM_K + 1))}) = {BLOOM_K} AS flagged,
             md5(t.text) IN (SELECT md5(text) FROM train) AS is_dup
      FROM test t
    )
    SELECT CAST((SELECT count(*) FROM train) AS BIGINT) AS n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(*) FILTER (flagged) AS BIGINT) AS n_flagged,
           CAST(count(*) FILTER (is_dup) AS BIGINT) AS n_true_dup,
           CAST(count(*) FILTER (flagged AND NOT is_dup) AS BIGINT)
             AS n_false_pos,
           round(count(*) FILTER (flagged AND NOT is_dup) * 1.0
                 / nullif(count(*) FILTER (NOT is_dup), 0), 6) AS fpr_observed,
           round(pow(1 - exp(-{BLOOM_K}.0 * (SELECT nk FROM n_keys)
                             / {BLOOM_BITS}), {BLOOM_K}), 6) AS fpr_theory
    FROM probe
    """,
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination gate (Bloom 1970): insert every
    TRAIN document's text under k={BLOOM_K} portable md5-derived bit
    positions in an m={BLOOM_BITS}-bit filter, probe every TEST
    document, and audit the filter against exact truth — flagged
    count, true exact-duplicate count, false positives, observed vs
    theoretical FPR (1−e^(−kn/m))^k. No false negatives by
    construction: every true train↔test duplicate IS flagged (the
    pytest invariant), which is why benchmark-decontamination
    pipelines (GPT-3 appendix; Lee et al. 2022) deploy exactly this
    shape — the filter is {BLOOM_BITS} bits broadcast everywhere,
    while the exact semi-join it pre-screens shuffles the corpus.

    Scale: the filter build collapses to ≤{BLOOM_BITS} DISTINCT bit
    rows (map-side combined); the probe is a broadcast semi-join of
    each test doc's {BLOOM_K} bits against it. The exact ``is_dup``
    check here is the audit's ground truth — at 100 TB you run it
    only on the flagged sliver (that being the filter's entire
    point), which is exactly what the false-positive accounting
    quantifies.
    """
    d = load_table(spark, sf_dir, "documents")
    from mi_inbound_pulsar_spark.operators.sampling import hash_bucket

    split = hash_bucket(F.col("doc_id"), "split-")
    train = d.filter(split < "cd").select("text")
    test = d.filter(split >= "cd").select("doc_id", "text")
    bits = (
        train.select(F.explode(F.array(*[F.expr(_bloom_bit_sql("text", j)).cast("long") for j in range(1, BLOOM_K + 1)])).alias("bit"))
        .distinct()
    )
    n_keys = train.agg(F.count_distinct(F.md5("text")).alias("nk"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    train_keys = train.select(F.md5("text").alias("k")).distinct()
    # membership of each bit via broadcast semi-join, counted per doc
    melted = test.select(
        "doc_id",
        F.md5("text").alias("k"),
        F.explode(
            F.array(
                *[F.expr(_bloom_bit_sql("text", j)).cast("long") for j in range(1, BLOOM_K + 1)]
            )
        ).alias("bit"),
    )
    hits = (
        melted.join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "k")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    flagged = (
        test.select("doc_id", F.md5("text").alias("k"))
        .join(hits.select("doc_id", "n_hit"), "doc_id", "left")
        .withColumn("flagged", F.coalesce("n_hit", F.lit(0)) == BLOOM_K)
        .join(
            F.broadcast(train_keys).withColumnRenamed("k", "tk"),
            F.col("k") == F.col("tk"),
            "left",
        )
        .withColumn("is_dup", F.col("tk").isNotNull())
    )
    return (
        flagged.agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count_if("flagged").alias("n_flagged"),
            F.count_if("is_dup").alias("n_true_dup"),
            F.count_if(F.col("flagged") & ~F.col("is_dup")).alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_train))
        .crossJoin(F.broadcast(n_keys))
        .select(
            "n_train",
            "n_test",
            "n_flagged",
            "n_true_dup",
            "n_false_pos",
            F.round(
                F.col("n_false_pos")
                / F.nullif(
                    (F.col("n_test") - F.col("n_true_dup")).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("fpr_observed"),
            F.round(
                F.pow(
                    1
                    - F.exp(
                        F.lit(-float(BLOOM_K)) * F.col("nk") / F.lit(BLOOM_BITS)
                    ),
                    F.lit(float(BLOOM_K)),
                ),
                6,
            ).alias("fpr_theory"),
        )
    )


# --------------------------------------------------------------------------
# Portable HyperLogLog: cardinality sketch with oracle-hashed registers
# --------------------------------------------------------------------------
HLL_M = 64  # registers
# canonical alpha_64 from Flajolet et al. 2007 §4 ("Practical
# considerations"); the large-m approximation 0.7213/(1+1.079/m)
# used through round 8 carries a small avoidable bias at m=64
# (ADVICE r8). Oracle parity holds by construction: both engines
# interpolate this one constant.
HLL_ALPHA = 0.709
HLL_W_BITS = 24


def _hll_rho_sql(w_sql: str) -> str:
    """rank of the first 1-bit of a {HLL_W_BITS}-bit value as a CASE
    threshold chain — integer comparisons only, no float log2 whose
    boundary ulps could differ between engines."""
    cases = " ".join(
        f"WHEN {w_sql} >= {1 << (HLL_W_BITS - r)} THEN {r}"
        for r in range(1, HLL_W_BITS + 1)
    )
    return f"(CASE {cases} ELSE {HLL_W_BITS + 1} END)"


def _hll_parts_sql(value_sql: str) -> tuple[str, str]:
    md5 = f"md5(concat('hll:', {value_sql}))"
    idx = f"({_hexval_sql(md5, 2)} % {HLL_M})"
    # rho bits from DIFFERENT hex chars than the index (independence)
    w = (
        "("
        + " + ".join(
            f"(instr('0123456789abcdef', substring({md5}, {i + 3}, 1)) - 1)"
            f" * {16 ** (5 - i)}"
            for i in range(6)
        )
        + ")"
    )
    return idx, _hll_rho_sql(w)


@query(
    "q_hyperloglog_portable",
    oracle=f"""
    WITH h AS (
      SELECT {_hll_parts_sql('CAST(user_id AS VARCHAR)')[0]} AS idx,
             {_hll_parts_sql('CAST(user_id AS VARCHAR)')[1]} AS rho
      FROM events
    ),
    spine AS (SELECT unnest(range(0, {HLL_M})) AS idx),
    regs AS (
      SELECT spine.idx, coalesce(max(h.rho), 0) AS m
      FROM spine LEFT JOIN h ON h.idx = spine.idx GROUP BY spine.idx
    ),
    agg AS (
      SELECT sum(pow(2.0, -m)) AS z,
             count(*) FILTER (m = 0) AS v
      FROM regs
    ),
    exact AS (SELECT count(DISTINCT user_id) AS nd FROM events),
    est AS (
      SELECT CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M * HLL_M} / z AS raw,
             v, nd FROM agg, exact
    )
    SELECT CAST(nd AS BIGINT) AS exact_distinct,
           CAST(v AS BIGINT) AS empty_registers,
           round(raw, 6) AS raw_estimate,
           round(CASE WHEN raw <= 2.5 * {HLL_M} AND v > 0
                      THEN {HLL_M} * ln({HLL_M} * 1.0 / v) ELSE raw END,
                 6) AS estimate,
           round(abs(CASE WHEN raw <= 2.5 * {HLL_M} AND v > 0
                          THEN {HLL_M} * ln({HLL_M} * 1.0 / v) ELSE raw END
                     - nd) / nd, 6) AS rel_error
    FROM est
    """,
)
def q_hyperloglog_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) with m={HLL_M} registers
    built from portable md5-derived hashes — register index and
    leading-zero rank come from disjoint hex digits, the rank via an
    integer CASE threshold chain (no float log2 at power-of-two
    boundaries), so the REGISTERS, the raw estimate, the linear-
    counting small-range correction, and the realized relative error
    all hash-match between engines. Completes the portable-sketch
    shelf: Bloom = membership, Count-Min = frequency, HLL =
    cardinality, AMS = moment — the four structures a streaming
    curation tier actually ships when the key domain outgrows exact
    rollups. (Spark's own HLL surface — `approx_count_distinct`,
    `hll_sketch_agg` — is covered by q_approx_distinct /
    q_hll_sketch_union; this is the algorithm itself, auditable.)

    Scale: the sketch is ONE map-side-combined groupBy to {HLL_M}
    register rows regardless of stream length; the exact distinct
    count rides along as the audit's ground truth (a deployment keeps
    only the registers, mergeable by max across partitions/streams).
    """
    e = load_table(spark, sf_dir, "events")
    idx_sql, rho_sql = _hll_parts_sql("CAST(user_id AS STRING)")
    h = e.select(
        F.expr(idx_sql).cast("long").alias("idx"),
        F.expr(rho_sql).cast("long").alias("rho"),
    )
    spine = spark.range(0, HLL_M).select(F.col("id").alias("idx"))
    # broadcast the aggregated registers (≤ HLL_M rows) as the RIGHT
    # side — a broadcast hint on the LEFT of a left join is ignored
    regs = spine.join(
        F.broadcast(h.groupBy("idx").agg(F.max("rho").alias("mx"))),
        "idx",
        "left",
    ).select("idx", F.coalesce("mx", F.lit(0)).alias("m"))
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z"),
        F.count_if(F.col("m") == 0).alias("v"),
    )
    exact = e.agg(F.count_distinct("user_id").alias("nd"))
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.col("z")
    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(raw)
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.col("nd").cast("long").alias("exact_distinct"),
            F.col("v").cast("long").alias("empty_registers"),
            F.round(raw, 6).alias("raw_estimate"),
            F.round(corrected, 6).alias("estimate"),
            F.round(F.abs(corrected - F.col("nd")) / F.col("nd"), 6).alias(
                "rel_error"
            ),
        )
    )


# --------------------------------------------------------------------------
# AMS sketch: second frequency moment from 16 signed estimators
# --------------------------------------------------------------------------
AMS_GROUPS = 4
AMS_PER_GROUP = 4


def _ams_sign_union_sql() -> str:
    selects = []
    for i in range(AMS_GROUPS * AMS_PER_GROUP):
        md5 = "md5(concat('ams" + str(i) + ":', CAST(user_id AS VARCHAR)))"
        selects.append(
            "SELECT " + str(i) + " AS est, user_id, cnt, CASE WHEN "
            + _hexval_sql(md5, 1)
            + " % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM c"
        )
    return " UNION ALL ".join(selects)


@query(
    "q_ams_f2_moment",
    oracle=f"""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
    signs AS (
      {_ams_sign_union_sql()}
    ),
    x AS (
      SELECT est, pow(sum(sgn * cnt), 2) AS x2 FROM signs GROUP BY est
    ),
    grp AS (
      SELECT est // {AMS_PER_GROUP} AS g, avg(x2) AS gm FROM x GROUP BY 1
    ),
    exact AS (SELECT sum(cnt * cnt) AS f2 FROM c)
    SELECT CAST(exact.f2 AS BIGINT) AS exact_f2,
           round(median(grp.gm), 6) AS ams_estimate,
           round(abs(median(grp.gm) - exact.f2) / exact.f2, 6) AS rel_error
    FROM grp, exact GROUP BY exact.f2
    """,
)
def q_ams_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS/Tug-of-War sketch (Alon, Matias & Szegedy 1996) for the
    second frequency moment F₂ = Σ c_u² of the per-user event counts
    — the self-join size / skew statistic that decides whether a key
    is safe to shuffle on. {AMS_GROUPS}×{AMS_PER_GROUP} independent
    ±1-signed sums (signs from portable md5 parity, so both engines
    build the identical sketch), squared, averaged within groups and
    median-of-means across them — the classic variance-then-
    confidence reduction. The realized relative error against exact
    F₂ is the readout.

    Scale: each estimator is one signed map-side-combined sum; all
    {AMS_GROUPS * AMS_PER_GROUP} ride the same shuffle of the user
    rollup. A deployment sketches the raw STREAM without the rollup
    (the sign-weighted sum is linear), which is the same plan minus
    the groupBy.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    n_est = AMS_GROUPS * AMS_PER_GROUP
    sign_exprs = [
        F.struct(
            F.lit(i).alias("est"),
            F.when(
                F.expr(
                    _hexval_sql(
                        f"md5(concat('ams{i}:', CAST(user_id AS STRING)))", 1
                    )
                )
                % 2
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
        for i in range(n_est)
    ]
    signs = c.select(
        "cnt", F.explode(F.array(*sign_exprs)).alias("s")
    ).select("cnt", F.col("s.est").alias("est"), F.col("s.sgn").alias("sgn"))
    x = signs.groupBy("est").agg(
        F.pow(F.sum(F.col("sgn") * F.col("cnt")), F.lit(2.0)).alias("x2")
    )
    grp = x.groupBy((F.col("est") / AMS_PER_GROUP).cast("long").alias("g")).agg(
        F.avg("x2").alias("gm")
    )
    exact = c.agg(F.sum(F.col("cnt") * F.col("cnt")).alias("f2"))
    return (
        grp.crossJoin(F.broadcast(exact))
        .groupBy("f2")
        .agg(F.expr("percentile(gm, 0.5)").alias("med"))
        .select(
            F.col("f2").cast("long").alias("exact_f2"),
            F.round("med", 6).alias("ams_estimate"),
            F.round(F.abs(F.col("med") - F.col("f2")) / F.col("f2"), 6).alias(
                "rel_error"
            ),
        )
    )


# --------------------------------------------------------------------------
# Fightin' Words: informative-Dirichlet log-odds between two corpora
# --------------------------------------------------------------------------
FW_PRIOR_MASS = 100.0
FW_TOP = 15


@query(
    "q_fightin_words",
    oracle=f"""
    WITH toks AS (
      SELECT lang = 'en' AS grp, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT tok,
             count(*) FILTER (grp) AS y1,
             count(*) FILTER (NOT grp) AS y2
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT sum(y1) AS n1, sum(y2) AS n2, sum(y1 + y2) AS nn FROM cnt
    ),
    scored AS (
      SELECT c.tok, c.y1, c.y2,
             ln((c.y1 + {FW_PRIOR_MASS} * (c.y1 + c.y2) / t.nn)
                / (t.n1 + {FW_PRIOR_MASS}
                   - c.y1 - {FW_PRIOR_MASS} * (c.y1 + c.y2) / t.nn))
             - ln((c.y2 + {FW_PRIOR_MASS} * (c.y1 + c.y2) / t.nn)
                  / (t.n2 + {FW_PRIOR_MASS}
                     - c.y2 - {FW_PRIOR_MASS} * (c.y1 + c.y2) / t.nn))
               AS delta,
             1.0 / (c.y1 + {FW_PRIOR_MASS} * (c.y1 + c.y2) / t.nn)
             + 1.0 / (c.y2 + {FW_PRIOR_MASS} * (c.y1 + c.y2) / t.nn) AS var
      FROM cnt c, tot t
    )
    SELECT tok, CAST(y1 AS BIGINT) AS y_en, CAST(y2 AS BIGINT) AS y_rest,
           round(delta, 6) AS delta_logodds,
           round(delta / sqrt(var), 6) AS z
    FROM scored
    ORDER BY abs(round(delta / sqrt(var), 6)) DESC, tok
    LIMIT {FW_TOP}
    """,
)
def q_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """\"Fightin' Words\" (Monroe, Colaresi & Quinn 2008): which tokens
    most distinguish the English sub-corpus from the rest, by log-odds
    difference under an informative Dirichlet prior (α_w proportional
    to the POOLED corpus frequency, total mass {FW_PRIOR_MASS}) with
    the per-term z = δ/√(1/(y₁+α) + 1/(y₂+α)). The prior is the whole
    point: raw log-odds rank rare hapaxes first, PMI saturates — the
    regularized z is the estimator corpus linguists and dataset
    auditors use to characterize a sub-corpus ("what vocabulary does
    this source/language/cluster over-use?"), the lexical companion
    of q_unigram_kl_drift's scalar.

    Scale: one token explode → vocabulary-bounded count rollup; the
    totals ride a broadcast row; top-{FW_TOP} via
    TakeOrderedAndProject on the 6dp-rounded |z| with token
    tie-break.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("lang") == "en").alias("grp"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    cnt = toks.groupBy("tok").agg(
        F.count_if("grp").alias("y1"),
        F.count_if(~F.col("grp")).alias("y2"),
    )
    tot = cnt.agg(
        F.sum("y1").alias("n1"),
        F.sum("y2").alias("n2"),
        F.sum(F.col("y1") + F.col("y2")).alias("nn"),
    )
    alpha = F.lit(FW_PRIOR_MASS) * (F.col("y1") + F.col("y2")) / F.col("nn")
    delta = F.log(
        (F.col("y1") + alpha)
        / (F.col("n1") + FW_PRIOR_MASS - F.col("y1") - alpha)
    ) - F.log(
        (F.col("y2") + alpha)
        / (F.col("n2") + FW_PRIOR_MASS - F.col("y2") - alpha)
    )
    var = 1.0 / (F.col("y1") + alpha) + 1.0 / (F.col("y2") + alpha)
    z = F.round(delta / F.sqrt(var), 6)
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.col("y1").alias("y_en"),
            F.col("y2").alias("y_rest"),
            F.round(delta, 6).alias("delta_logodds"),
            z.alias("z"),
        )
        .orderBy(F.desc(F.abs(F.col("z"))), "tok")
        .limit(FW_TOP)
    )


# --------------------------------------------------------------------------
# Deterministic permutation test on the A/B revenue split
# --------------------------------------------------------------------------
PERM_B = 200


def _perm_union_sql() -> str:
    """B pseudo-permutation arm assignments + the observed one (perm
    0), each a portable md5 parity of (perm id, user id) — the
    'randomization' is a deterministic hash family, so both engines
    enumerate the identical permutation set."""
    selects = [
        "SELECT 0 AS perm, user_id, cents, user_id % 2 AS arm FROM per_user"
    ]
    for i in range(1, PERM_B + 1):
        md5 = "md5(concat('perm" + str(i) + ":', CAST(user_id AS VARCHAR)))"
        selects.append(
            "SELECT " + str(i) + " AS perm, user_id, cents, "
            + _hexval_sql(md5, 1)
            + " % 2 AS arm FROM per_user"
        )
    return " UNION ALL ".join(selects)


@query(
    "q_permutation_test",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    assigned AS (
      {{_PERM_UNION}}
    ),
    diffs AS (
      SELECT perm,
             avg(cents) FILTER (arm = 0) - avg(cents) FILTER (arm = 1)
               AS diff
      FROM assigned GROUP BY perm
    ),
    obs AS (SELECT diff AS obs_diff FROM diffs WHERE perm = 0)
    SELECT round(obs.obs_diff, 6) AS obs_diff_cents,
           CAST({PERM_B} AS BIGINT) AS n_perms,
           CAST(count(*) FILTER (d.perm > 0
                 AND abs(round(d.diff, 6)) >= abs(round(obs.obs_diff, 6)))
               AS BIGINT) AS n_extreme,
           round((1.0 + count(*) FILTER (d.perm > 0
                   AND abs(round(d.diff, 6)) >= abs(round(obs.obs_diff, 6))))
                 / (1.0 + {PERM_B}), 6) AS p_value
    FROM diffs d, obs GROUP BY obs.obs_diff
    """.replace("{_PERM_UNION}", _perm_union_sql()),
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test (Fisher 1935) of the even-vs-odd user A/B
    revenue split, with a DETERMINISTIC permutation family: pseudo-
    permutation i reassigns each user by the parity of a hex digit of
    md5('perm i:' || user) — a fixed, portable randomization both
    engines enumerate identically, so the permutation distribution
    itself is oracle-hashed (the Monte-Carlo analogue of the
    hash_bucket split trick; {PERM_B} draws, add-one p-value per
    Davison & Hinkley). The distribution-free companion to
    q_welch_ttest: no normality assumption, exact under the null of
    exchangeability.

    Scale: the per-user rollup is computed ONCE; the {PERM_B + 1}
    assignments explode from it ({PERM_B + 1}×users rows, user-domain-
    bounded — never raw events) into one map-side-combined
    (perm, arm) rollup; everything after is {PERM_B + 1} rows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    # Two round-12 rewrites of the amplification stage, same results:
    #
    # 1. ONE parameterized draw expression over an exploded perm
    #    sequence, instead of a 201-element array of per-permutation
    #    structs whose construction parsed 200 separate F.expr SQL
    #    snippets through py4j — 3.5-5 s of DRIVER time per call
    #    (measured: plan build 4.98 s, execute 3.05 s) for a plan
    #    Catalyst then had to analyze 201 branches of. The md5 input
    #    string is unchanged ('perm{i}:{user}'), so the permutation
    #    family — and the oracle hash — is bit-identical.
    # 2. Fan-out pin: per_user is a few-hundred-KB aggregate output,
    #    so AQE coalesces its exchange to ~1 partition and the
    #    ×(PERM_B+1) explode plus the md5 draws ran near-serial.
    #    Round-robin repartition to defaultParallelism (cheap:
    #    user-domain rows) parallelizes the amplification.
    per_user = per_user.repartition(fanout_partitions(spark))
    draw = F.expr(
        "(instr('0123456789abcdef', substring(md5(concat("
        "'perm', CAST(perm AS STRING), ':', CAST(user_id AS STRING)"
        ")), 1, 1)) - 1) % 2"
    )
    assigned = per_user.select(
        "user_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_B))).alias("perm"),
    ).select(
        "cents",
        "perm",
        F.when(F.col("perm") == 0, F.col("user_id") % 2)
        .otherwise(draw)
        .cast("long")
        .alias("arm"),
    )
    diffs = assigned.groupBy("perm").agg(
        (
            F.avg(F.when(F.col("arm") == 0, F.col("cents")))
            - F.avg(F.when(F.col("arm") == 1, F.col("cents")))
        ).alias("diff")
    )
    obs = diffs.filter(F.col("perm") == 0).select(
        F.col("diff").alias("obs_diff")
    )
    extreme = F.count_if(
        (F.col("perm") > 0)
        & (F.abs(F.round("diff", 6)) >= F.abs(F.round("obs_diff", 6)))
    )
    return (
        diffs.crossJoin(F.broadcast(obs))
        .groupBy("obs_diff")
        .agg(extreme.alias("n_extreme"))
        .select(
            F.round("obs_diff", 6).alias("obs_diff_cents"),
            F.lit(PERM_B).cast("long").alias("n_perms"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            F.round((1.0 + F.col("n_extreme")) / (1.0 + PERM_B), 6).alias(
                "p_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# Overdispersion check: is per-user event count Poisson?
# --------------------------------------------------------------------------
@query(
    "q_overdispersion_check",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(cnt), 6) AS mean_events,
           round(var_samp(cnt), 6) AS var_events,
           round(var_samp(cnt) / avg(cnt), 6) AS dispersion_index,
           round(sqrt((count(*) - 1) / 2.0)
                 * (var_samp(cnt) / avg(cnt) - 1), 6) AS bohning_z
    FROM c
    """,
)
def q_overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen (Böhning 1994): the dispersion index
    D = s²/x̄ of per-user event counts and the normalized
    z = √((n−1)/2)·(D−1) that tests D=1 — the one-row diagnostic that
    decides whether per-user activity is Poisson (D≈1, rate-based
    models fine) or clumped (D≫1 — negative-binomial / mixed models
    needed, and every Poisson-assumption CI downstream is too
    narrow). Run before q_poisson_bootstrap_ci's resampling is
    trusted.

    Scale: one user rollup, one moments aggregate. Nothing else.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    d_idx = F.var_samp("cnt") / F.avg("cnt")
    return c.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("cnt"), 6).alias("mean_events"),
        F.round(F.var_samp("cnt"), 6).alias("var_events"),
        F.round(d_idx, 6).alias("dispersion_index"),
        F.round(
            F.sqrt((F.count(F.lit(1)) - 1) / F.lit(2.0)) * (d_idx - 1), 6
        ).alias("bohning_z"),
    )


# --------------------------------------------------------------------------
# Holt's linear trend: double exponential smoothing of daily revenue
# --------------------------------------------------------------------------
HOLT_ALPHA = 0.3
HOLT_BETA = 0.1


@query(
    "q_holt_linear",
    oracle=f"""
    WITH RECURSIVE d AS ({_DAILY_SQL}),
    s AS (
      SELECT list(CAST(cents AS DOUBLE) ORDER BY day) AS vals,
             CAST(count(*) AS BIGINT) AS n_days
      FROM d
    ),
    step AS (
      SELECT 2 AS t, vals[2] AS l, vals[2] - vals[1] AS b,
             CAST(0.0 AS DOUBLE) AS e
      FROM s
      UNION ALL
      SELECT step.t + 1,
             {HOLT_ALPHA} * s.vals[step.t + 1]
               + {1 - HOLT_ALPHA} * (step.l + step.b),
             {HOLT_BETA} * ({HOLT_ALPHA} * s.vals[step.t + 1]
                 + {1 - HOLT_ALPHA} * (step.l + step.b) - step.l)
               + {1 - HOLT_BETA} * step.b,
             step.e + abs(s.vals[step.t + 1] - (step.l + step.b))
      FROM step, s WHERE step.t < s.n_days
    )
    SELECT s.n_days,
           round(step.l, 6) AS level,
           round(step.b, 6) AS trend,
           round(step.e / (s.n_days - 2), 6) AS mae_one_step,
           round(step.l + step.b, 6) AS forecast_1d,
           round(step.l + 7 * step.b, 6) AS forecast_7d
    FROM step, s WHERE step.t = s.n_days
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957):
    level/trend recurrences l′ = αx + (1−α)(l+b), b′ = β(l′−l) +
    (1−β)b over the daily revenue series (α={HOLT_ALPHA},
    β={HOLT_BETA}; textbook init l₂=x₂, b₂=x₂−x₁), with the
    in-sample one-step MAE and the 1-/7-day-ahead forecasts l+h·b —
    the trend-aware forecaster between the EWMA (no trend) and the
    seasonal STL/backtest machinery. The recurrence is inherently
    sequential; Spark runs it as one ``aggregate`` HOF left fold with
    a struct accumulator, the oracle as a recursive CTE over the same
    day list — NOT ``list_reduce``, because DuckDB (v1.0.0) evaluates
    a lambda's struct fields SEQUENTIALLY, rebinding ``acc.l`` to the
    new level before the trend field reads it — the coupled
    recurrence silently diverges (found by hash mismatch; the
    recursive CTE has textbook simultaneous row semantics). Same IEEE
    op sequence either way, hash parity restored (the
    q_ewma_smoothing recipe, upgraded from scalar to struct state).

    Scale: the series is the day-domain-bounded rollup; the fold runs
    once on |days| values in one task — the only correct plan for a
    sequential recurrence. A per-key fleet of these (one series per
    source/SKU) folds inside groupBy exactly like q_ewma_smoothing.
    """
    d = _daily_purchase_cents(spark, sf_dir)
    s = d.agg(
        F.expr(
            "array_sort(collect_list(struct(day, CAST(cents AS DOUBLE) AS v)))"
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_days"),
    ).select(F.expr("transform(seq, s -> s.v)").alias("vals"), "n_days")
    a, b_ = HOLT_ALPHA, HOLT_BETA
    fold = (
        "aggregate("
        " slice(vals, 3, size(vals) - 2),"
        " named_struct('l', vals[1], 'b', vals[1] - vals[0], 'e', 0.0D),"
        f" (acc, x) -> named_struct("
        f"   'l', {a} * x + {1 - a} * (acc.l + acc.b),"
        f"   'b', {b_} * ({a} * x + {1 - a} * (acc.l + acc.b) - acc.l)"
        f"        + {1 - b_} * acc.b,"
        f"   'e', acc.e + abs(x - (acc.l + acc.b))))"
    )
    return s.select(
        "n_days",
        F.round(F.expr(fold + ".l"), 6).alias("level"),
        F.round(F.expr(fold + ".b"), 6).alias("trend"),
        F.round(
            F.expr(fold + ".e") / (F.col("n_days") - 2), 6
        ).alias("mae_one_step"),
        F.round(F.expr(fold + ".l + " + fold + ".b"), 6).alias("forecast_1d"),
        F.round(
            F.expr(fold + ".l + 7 * " + fold + ".b"), 6
        ).alias("forecast_7d"),
    )


# --------------------------------------------------------------------------
# Restricted mean survival time difference between the two cohorts
# --------------------------------------------------------------------------
@query(
    "q_rmst_difference",
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
      SELECT user_id % 2 AS grp,
             CASE WHEN p_us IS NOT NULL
                  THEN CAST((p_us - s_us) // 86400000000 AS BIGINT)
                  ELSE CAST((h - s_us) // 86400000000 AS BIGINT) END AS e_day,
             p_us IS NOT NULL AS is_event
      FROM conv, horizon
    ),
    spine AS (SELECT unnest(range(0, {SURVIVAL_WINDOW_DAYS})) AS day),
    km AS (
      SELECT g.grp, spine.day,
             count(*) FILTER (o.e_day >= spine.day) AS n_t,
             count(*) FILTER (o.is_event AND o.e_day = spine.day) AS d_t
      FROM spine
        CROSS JOIN (SELECT DISTINCT grp FROM obs) g
        LEFT JOIN obs o ON o.grp = g.grp
      GROUP BY g.grp, spine.day
    ),
    surv AS (
      SELECT grp, day,
             exp(sum(CASE WHEN d_t < n_t AND n_t > 0
                          THEN ln(1.0 - d_t * 1.0 / n_t) ELSE 0 END)
                 OVER (PARTITION BY grp ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * CASE WHEN min(CASE WHEN n_t > 0 THEN 1.0 - d_t * 1.0 / n_t END)
                          OVER (PARTITION BY grp ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) = 0
                      THEN 0 ELSE 1 END AS s
      FROM km WHERE n_t > 0
    ),
    rmst AS (
      -- step-function integral: S is constant on [day, day+1)
      SELECT grp, sum(s) + 1.0 AS rmst_days, count(*) AS n_days
      FROM surv WHERE day < {SURVIVAL_WINDOW_DAYS} - 1 GROUP BY grp
    )
    SELECT CAST({SURVIVAL_WINDOW_DAYS} AS BIGINT) AS tau_days,
           round(max(CASE WHEN grp = 0 THEN rmst_days END), 6) AS rmst_even,
           round(max(CASE WHEN grp = 1 THEN rmst_days END), 6) AS rmst_odd,
           round(max(CASE WHEN grp = 0 THEN rmst_days END)
                 - max(CASE WHEN grp = 1 THEN rmst_days END), 6)
             AS rmst_diff_days
    FROM rmst
    """,
)
def q_rmst_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time difference (Royston & Parmar
    2013): RMST(τ) = ∫₀^τ Ŝ(t)dt for each cohort (the step-function
    integral of the KM curve on the shared {SURVIVAL_WINDOW_DAYS}-day
    spine — here "mean days until first purchase, capped at τ") and
    the between-cohort difference. The effect-size companion to
    ``q_logrank_test``: log-rank answers "do the curves differ?",
    RMST answers "by how many days" — the estimand regulators now ask
    for when proportional hazards is doubtful, and the one that stays
    defined under 100% eventual conversion.

    Hash-exactness: the survival product is exp(Σln(1−d/n)) over
    exact integer spine counts (the q_nelson_aalen recipe, cohort-
    partitioned); the integral is a plain sum of the per-day step
    values (S(0)=1 contributes the leading 1.0).

    Scale: identical to the KM family — per-user rollup, scalar
    horizon, 2×{SURVIVAL_WINDOW_DAYS}-row spine windows behind the
    bounded-window guard.
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
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.col("p_us").isNotNull(),
            F.floor((F.col("p_us") - F.col("s_us")) / US_PER_DAY),
        )
        .otherwise(F.floor((F.col("h") - F.col("s_us")) / US_PER_DAY))
        .cast("long")
        .alias("e_day"),
        F.col("p_us").isNotNull().alias("is_event"),
    )
    spine = spark.range(0, SURVIVAL_WINDOW_DAYS).select(F.col("id").alias("day"))
    grps = obs.select("grp").distinct()
    km = (
        F.broadcast(spine)
        .crossJoin(F.broadcast(grps))
        .join(obs.withColumnRenamed("grp", "ogrp"), F.col("ogrp") == F.col("grp"), "left")
        .groupBy("grp", "day")
        .agg(
            F.count_if(F.col("e_day") >= F.col("day")).alias("n_t"),
            F.count_if(F.col("is_event") & (F.col("e_day") == F.col("day"))).alias(
                "d_t"
            ),
        )
        .filter(F.col("n_t") > 0)
    )
    km = bounded_window_input(km, label="q_rmst_difference spine")
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    term = F.when(
        (F.col("d_t") < F.col("n_t")) & (F.col("n_t") > 0),
        F.log(F.lit(1.0) - F.col("d_t") / F.col("n_t")),
    ).otherwise(F.lit(0.0))
    hit_zero = (
        F.min(
            F.when(F.col("n_t") > 0, F.lit(1.0) - F.col("d_t") / F.col("n_t"))
        ).over(w)
        == 0
    )
    surv = km.select(
        "grp",
        "day",
        (
            F.exp(F.sum(term).over(w))
            * F.when(hit_zero, F.lit(0.0)).otherwise(F.lit(1.0))
        ).alias("s"),
    )
    rmst = (
        surv.filter(F.col("day") < SURVIVAL_WINDOW_DAYS - 1)
        .groupBy("grp")
        .agg((F.sum("s") + 1.0).alias("rmst_days"))
    )
    even = F.max(F.when(F.col("grp") == 0, F.col("rmst_days")))
    odd = F.max(F.when(F.col("grp") == 1, F.col("rmst_days")))
    return rmst.agg(
        F.lit(SURVIVAL_WINDOW_DAYS).cast("long").alias("tau_days"),
        F.round(even, 6).alias("rmst_even"),
        F.round(odd, 6).alias("rmst_odd"),
        F.round(even - odd, 6).alias("rmst_diff_days"),
    )


# --------------------------------------------------------------------------
# Kendall's W: concordance of yearly nation-revenue rankings
# --------------------------------------------------------------------------
@query(
    "q_kendalls_w",
    oracle="""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS yr, n.n_name AS nation,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100,
                                 0) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT yr, nation,
             row_number() OVER (PARTITION BY yr
                                ORDER BY cents DESC, nation) AS rk
      FROM rev
    ),
    sums AS (
      SELECT nation, sum(rk) AS r, count(*) AS k FROM ranked GROUP BY nation
    ),
    dims AS (SELECT count(*) AS n, max(k) AS k FROM sums)
    SELECT CAST(d.n AS BIGINT) AS n_items,
           CAST(d.k AS BIGINT) AS k_judges,
           round(sum(pow(s.r - d.k * (d.n + 1) / 2.0, 2)), 6) AS s_stat,
           round(12.0 * sum(pow(s.r - d.k * (d.n + 1) / 2.0, 2))
                 / (d.k * d.k * (pow(d.n, 3) - d.n)), 6) AS w
    FROM sums s, dims d GROUP BY d.n, d.k
    """,
)
def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance (Kendall & Babington
    Smith 1939): do the order years agree on how the 25 nations rank
    by revenue? Each year is a judge ranking the nations
    (deterministic ties: revenue DESC, name); W = 12S/(K²(n³−n)) with
    S the squared deviations of per-nation rank sums from their
    expectation. W≈1 means the league table is stable year over year
    (one ranking suffices); W≈0 means yearly rankings are noise — the
    multi-judge generalization of the pairwise rank correlations
    (q_spearman_corr, q_kendall_tau) and of the two-list RBO.

    Scale: the rollup is |years|×|nations| rows; the rank window
    partitions by year over ≤n rows (guard-bounded); everything after
    is an n-row aggregate.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("yr"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("long")
            ).alias("cents")
        )
    )
    rev = bounded_window_input(rev, label="q_kendalls_w year x nation rollup")
    w_rank = Window.partitionBy("yr").orderBy(F.desc("cents"), "nation")
    sums = (
        rev.withColumn("rk", F.row_number().over(w_rank))
        .groupBy("nation")
        .agg(F.sum("rk").alias("r"), F.count(F.lit(1)).alias("k"))
    )
    dims = sums.agg(F.count(F.lit(1)).alias("nn"), F.max("k").alias("kk"))
    dev = F.pow(F.col("r") - F.col("kk") * (F.col("nn") + 1) / 2.0, F.lit(2.0))
    return (
        sums.drop("k")
        .crossJoin(F.broadcast(dims))
        .groupBy("nn", "kk")
        .agg(F.sum(dev).alias("s_stat"))
        .select(
            F.col("nn").cast("long").alias("n_items"),
            F.col("kk").cast("long").alias("k_judges"),
            F.round("s_stat", 6).alias("s_stat"),
            F.round(
                12.0
                * F.col("s_stat")
                / (
                    F.col("kk")
                    * F.col("kk")
                    * (F.pow(F.col("nn"), F.lit(3.0)) - F.col("nn"))
                ),
                6,
            ).alias("w"),
        )
    )


# --------------------------------------------------------------------------
# Chapman capture-recapture estimate of the active-user population
# --------------------------------------------------------------------------
@query(
    "q_chapman_estimator",
    oracle="""
    WITH d AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ),
    lo AS (SELECT min(day) AS d0 FROM d),
    s1 AS (SELECT DISTINCT user_id FROM d, lo WHERE day - d0 < 15),
    s2 AS (SELECT DISTINCT user_id FROM d, lo WHERE day - d0 >= 15),
    m AS (SELECT count(*) AS m FROM s1 WHERE user_id IN (SELECT user_id FROM s2)),
    c AS (
      SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT m FROM m) AS m,
             (SELECT count(DISTINCT user_id) FROM d) AS truth
    )
    SELECT CAST(n1 AS BIGINT) AS n_first_half,
           CAST(n2 AS BIGINT) AS n_second_half,
           CAST(m AS BIGINT) AS n_recaptured,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6)
             AS chapman_estimate,
           CAST(truth AS BIGINT) AS exact_population,
           round(abs((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 - truth)
                 / truth, 6) AS rel_error
    FROM c
    """,
)
def q_chapman_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimator (Chapman 1951): treat the
    month's first- and second-half active-user sets as two capture
    samples and estimate the total population N̂ = (n₁+1)(n₂+1)/(m+1)−1
    from the recapture overlap m — the bias-corrected Lincoln-Petersen
    form. The corpus-audit use: when a "population" can only be
    sampled (distinct contributors across two crawl snapshots, total
    entities behind two partial logs), the overlap of two samples
    estimates what neither sample sees. The exact distinct count
    rides along as ground truth to expose the closure-assumption
    error (users active in only one half violate equal catchability —
    the realized rel_error IS that diagnostic).

    Scale: three distinct-aggregates and a 1-row arithmetic select;
    the half-month split reuses the tz-proof epoch-day arithmetic.
    """
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
    )
    d0 = d.agg(F.min("day").alias("d0"))
    tagged = d.crossJoin(F.broadcast(d0)).select(
        "user_id", (F.col("day") - F.col("d0") < 15).alias("first_half")
    )
    per_user = tagged.groupBy("user_id").agg(
        F.bool_or("first_half").alias("in1"),
        F.bool_or(~F.col("first_half")).alias("in2"),
    )
    stats = per_user.agg(
        F.count_if("in1").alias("n1"),
        F.count_if("in2").alias("n2"),
        F.count_if(F.col("in1") & F.col("in2")).alias("m"),
        F.count(F.lit(1)).alias("truth"),
    )
    est = (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0
    return stats.select(
        F.col("n1").cast("long").alias("n_first_half"),
        F.col("n2").cast("long").alias("n_second_half"),
        F.col("m").cast("long").alias("n_recaptured"),
        F.round(est, 6).alias("chapman_estimate"),
        F.col("truth").cast("long").alias("exact_population"),
        F.round(F.abs(est - F.col("truth")) / F.col("truth"), 6).alias(
            "rel_error"
        ),
    )


# --------------------------------------------------------------------------
# Moments sketch: mergeable power sums -> skewness / kurtosis per group
# --------------------------------------------------------------------------
@query(
    "q_moments_sketch",
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
             CAST(sum(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
             CAST(sum(n_chars * n_chars * n_chars * n_chars) AS BIGINT) AS s4
      FROM documents GROUP BY ROLLUP(source)
    ),
    d AS (
      SELECT coalesce(source, '__ALL__') AS source, n, s1, s2, s3, s4,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM m
    )
    SELECT source, n, s1, s2, s3, s4,
           round(mu, 6) AS mean,
           round(r2 - mu * mu, 6) AS variance,
           round((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
                 / pow(r2 - mu * mu, 1.5), 6) AS skewness,
           round((r4 - 4 * mu * r3 + 6 * mu * mu * r2
                  - 3 * mu * mu * mu * mu)
                 / pow(r2 - mu * mu, 2.0) - 3, 6) AS kurtosis_excess
    FROM d ORDER BY source
    """,
)
def q_moments_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moments sketch (the estimator core of Gan et al. 2018, VLDB
    "Moment-based quantile sketches"): per-source EXACT integer power
    sums (n, Σx, Σx², Σx³, Σx⁴) over document length, with
    method-of-moments skewness and excess kurtosis derived from them —
    and the ``__ALL__`` row produced by ROLLUP is the sketch MERGE:
    five added integers per group combine partial sketches into the
    corpus sketch with zero information loss, the property that makes
    this the cheapest distribution-shape monitor a 100 TB curation
    tier can ship per (source, day) cell.

    Hash-exactness: the power sums are integer arithmetic (bit-equal
    in both engines); the shape statistics are the same double
    expression over them, 6dp-rounded.

    Scale: one map-side-combined rollup to |sources|+1 rows; nothing
    else. Overflow bound: Σx⁴ < 2⁶³ holds through ~10⁹ rows/group at
    x≤550 — beyond that, promote the sums to DECIMAL(38,0) (DuckDB
    already aggregates in 128-bit) or band x first.
    """
    d = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars")
    m = d.rollup("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3").cast("double") / F.col("n")
    r4 = F.col("s4").cast("double") / F.col("n")
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    return (
        m.select(
            F.coalesce("source", F.lit("__ALL__")).alias("source"),
            F.col("n").cast("long").alias("n"),
            "s1", "s2", "s3", "s4",
            F.round(mu, 6).alias("mean"),
            F.round(m2, 6).alias("variance"),
            F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
            F.round(m4 / F.pow(m2, F.lit(2.0)) - 3, 6).alias(
                "kurtosis_excess"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch: cardinality, union, intersection
# --------------------------------------------------------------------------
KMV_K = 256
KMV_HASH_HEX = 12
KMV_M = 16 ** KMV_HASH_HEX  # hash domain size
KMV_BUCKETS = 4096
KMV_BUCKET_W = KMV_M // KMV_BUCKETS

def _hexval_big_sql(md5_expr: str, n_chars: int) -> str:
    """``_hexval_sql`` with BIGINT-cast terms: beyond ~7 hex chars the
    per-digit products exceed int32 and Spark's ANSI mode overflows
    (DuckDB silently widens) — casting each digit keeps both engines
    in 64-bit arithmetic."""
    terms = [
        f"CAST(instr('0123456789abcdef', substring({md5_expr}, {i + 1}, 1))"
        f" - 1 AS BIGINT) * {16 ** (n_chars - 1 - i)}"
        for i in range(n_chars)
    ]
    return "(" + " + ".join(terms) + ")"


_KMV_U = _hexval_big_sql("md5(concat('kmv:', sh))", KMV_HASH_HEX)


@query(
    "q_kmv_distinct_sketch",
    oracle=f"""
    WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT CASE WHEN CAST(substring(source, 4) AS INT) < 10
                  THEN 'A' ELSE 'B' END AS half,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4] AS sh
      FROM t, unnest(generate_series(1, len(w) - 4)) g(i)
      WHERE len(w) >= 5
    ),
    hu AS (SELECT DISTINCT half, {_KMV_U} AS u FROM sh),
    ranked AS (
      SELECT half, u,
             row_number() OVER (PARTITION BY half ORDER BY u) AS rn,
             count(*) OVER (PARTITION BY half) AS n_half
      FROM hu
    ),
    kept AS (SELECT * FROM ranked WHERE rn <= {KMV_K}),
    hs AS (
      SELECT half, max(n_half) AS n, max(u) AS u_k FROM kept GROUP BY half
    ),
    he AS (
      SELECT half, n,
             CASE WHEN n <= {KMV_K} THEN CAST(n AS DOUBLE)
                  ELSE {KMV_K - 1} * CAST({KMV_M} AS DOUBLE) / u_k
             END AS est
      FROM hs
    ),
    uni AS (
      SELECT u, bool_or(half = 'A') AS in_a, bool_or(half = 'B') AS in_b
      FROM kept GROUP BY u
    ),
    uranked AS (
      SELECT u, in_a, in_b, row_number() OVER (ORDER BY u) AS rn FROM uni
    ),
    uk AS (SELECT * FROM uranked WHERE rn <= {KMV_K}),
    us AS (
      SELECT count(*) AS ku, max(u) AS u_ku,
             count(*) FILTER (in_a AND in_b) AS nboth
      FROM uk
    ),
    tu AS (SELECT count(DISTINCT u) AS n_union FROM hu),
    onerow AS (
      SELECT max(CASE WHEN half = 'A' THEN n END) AS n_a,
             max(CASE WHEN half = 'A' THEN est END) AS est_a,
             max(CASE WHEN half = 'B' THEN n END) AS n_b,
             max(CASE WHEN half = 'B' THEN est END) AS est_b
      FROM he
    ),
    fin AS (
      SELECT o.*, s.ku, s.nboth, t.n_union,
             CASE WHEN s.ku < {KMV_K} THEN CAST(s.ku AS DOUBLE)
                  ELSE {KMV_K - 1} * CAST({KMV_M} AS DOUBLE) / s.u_ku
             END AS est_u
      FROM onerow o, us s, tu t
    )
    SELECT CAST({KMV_K} AS BIGINT) AS k,
           CAST(n_a AS BIGINT) AS n_a, round(est_a, 6) AS est_a,
           CAST(n_b AS BIGINT) AS n_b, round(est_b, 6) AS est_b,
           CAST(n_union AS BIGINT) AS n_union,
           round(est_u, 6) AS est_union,
           round(CAST(nboth AS DOUBLE) / ku, 6) AS kmv_jaccard,
           CAST(n_a + n_b - n_union AS BIGINT) AS n_intersection,
           round(CAST(nboth AS DOUBLE) / ku * est_u, 6) AS est_intersection,
           round(abs(est_u - n_union) / n_union, 6) AS union_rel_error
    FROM fin
    """,
)
def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct-value sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007 "On synopses for distinct-value estimation"):
    keep the k={KMV_K} smallest md5-derived hash values of each
    half's 5-gram shingle set; D̂ = (k−1)·M/u_(k). The merge theorem —
    the k smallest of (KMV_A ∪ KMV_B) ARE the k smallest of A∪B, and
    any member of the merged sketch that belongs to A is necessarily
    inside KMV_A — gives union and intersection estimates from the
    SAME two fixed-size sketches (ρ = matched fraction of the merged
    sketch, |A∩B|̂ = ρ·Û), the composition HLL alone cannot do without
    inclusion-exclusion blow-up. Every hash is the portable md5-digit
    arithmetic, so sketch contents AND estimates hash-match DuckDB
    exactly; the true cardinalities ride along as the accuracy oracle
    (the q_countmin pattern — a real deployment keeps only sketches).

    Scale: the Spark plan never globally ranks the shingle domain —
    stage 1 rolls the distinct hashes into a {KMV_BUCKETS}-cell
    histogram (map-side combined), stage 2 ranks only the ≤ k + one
    bucket's worth of candidate hashes below the histogram-derived
    threshold. The per-(half,u) distinct is the one corpus-scale
    hash aggregate, shared with the exact-truth columns; a pure
    deployment replaces it with per-partition bottom-k + merge.
    """
    d = load_table(spark, sf_dir, "documents")
    half = F.when(
        F.expr("CAST(substring(source, 4) AS INT)") < 10, F.lit("A")
    ).otherwise(F.lit("B"))
    # materialize the word array BEFORE the shingle lambda: expressions
    # referenced inside a higher-order function are INLINED into it, so
    # split(text) would re-evaluate per element_at per index (~125
    # splits/row — measured 8.3 s just to explode 250k shingles)
    words = d.select(
        half.alias("half"), F.split(F.col("text"), " ").alias("w")
    )
    w = F.col("w")
    sh = F.when(
        F.size(w) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 4),
            lambda i: F.array_join(F.slice(w, i, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # hu feeds THREE consumers (histogram, candidate filter, exact
    # union count) — materialize the corpus-scale explode+md5+distinct
    # once (measured 11.0 s -> one scan at sf0.1); GC-cleaned blocks
    hu = (
        words.select("half", F.explode(sh).alias("sh"))
        .select("half", F.expr(_KMV_U).cast("long").alias("u"))
        .distinct()
        .transform(eager_checkpoint)
    )
    # stage 1: bounded histogram of the distinct hash values
    hist = hu.groupBy(
        "half", F.expr(f"u DIV {KMV_BUCKET_W}").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("half")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("half", "b", F.sum("c").over(wcum).alias("cum"))
    thr = (
        hist.groupBy("half")
        .agg(F.sum("c").alias("n_half"))
        .join(
            cum.filter(F.col("cum") >= KMV_K)
            .groupBy("half")
            .agg(F.min("b").alias("thr_b")),
            "half",
            "left",
        )
        .select(
            "half",
            "n_half",
            F.coalesce("thr_b", F.lit(KMV_BUCKETS)).alias("thr_b"),
        )
    )
    # stage 2: rank only the candidates below the threshold bucket
    cand = hu.join(F.broadcast(thr), "half").filter(
        F.expr(f"u DIV {KMV_BUCKET_W}") <= F.col("thr_b")
    )
    wr = Window.partitionBy("half").orderBy("u")
    kept = cand.select(
        "half", "u", "n_half", F.row_number().over(wr).alias("rn")
    ).filter(F.col("rn") <= KMV_K)
    he = kept.groupBy("half").agg(
        F.max("n_half").alias("n"), F.max("u").alias("u_k")
    )
    est = F.when(
        F.col("n") <= KMV_K, F.col("n").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) * KMV_M / F.col("u_k"))
    he = he.select("half", "n", est.alias("est"))
    uni = kept.groupBy("u").agg(
        F.bool_or(F.col("half") == "A").alias("in_a"),
        F.bool_or(F.col("half") == "B").alias("in_b"),
    )
    uni = bounded_window_input(uni, label="q_kmv merged sketch")
    uk = uni.select(
        "u", "in_a", "in_b", F.row_number().over(Window.orderBy("u")).alias("rn")
    ).filter(F.col("rn") <= KMV_K)
    us = uk.agg(
        F.count(F.lit(1)).alias("ku"),
        F.max("u").alias("u_ku"),
        F.count_if(F.col("in_a") & F.col("in_b")).alias("nboth"),
    )
    tu = hu.agg(F.count_distinct("u").alias("n_union"))
    onerow = he.agg(
        F.max(F.when(F.col("half") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("half") == "A", F.col("est"))).alias("est_a"),
        F.max(F.when(F.col("half") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("half") == "B", F.col("est"))).alias("est_b"),
    )
    est_u = F.when(
        F.col("ku") < KMV_K, F.col("ku").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) * KMV_M / F.col("u_ku"))
    fin = (
        onerow.crossJoin(F.broadcast(us))
        .crossJoin(F.broadcast(tu))
        .withColumn("est_u", est_u)
    )
    return fin.select(
        F.lit(KMV_K).cast("long").alias("k"),
        F.col("n_a").cast("long").alias("n_a"),
        F.round("est_a", 6).alias("est_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("est_b", 6).alias("est_b"),
        F.col("n_union").cast("long").alias("n_union"),
        F.round("est_u", 6).alias("est_union"),
        F.round(F.col("nboth").cast("double") / F.col("ku"), 6).alias(
            "kmv_jaccard"
        ),
        (F.col("n_a") + F.col("n_b") - F.col("n_union"))
        .cast("long")
        .alias("n_intersection"),
        F.round(
            F.col("nboth").cast("double") / F.col("ku") * F.col("est_u"), 6
        ).alias("est_intersection"),
        F.round(
            F.abs(F.col("est_u") - F.col("n_union")) / F.col("n_union"), 6
        ).alias("union_rel_error"),
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis rank ANOVA across market segments
# --------------------------------------------------------------------------
@query(
    "q_kruskal_wallis",
    oracle="""
    WITH vs AS (
      SELECT CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v,
             c_mktsegment AS seg, count(*) AS cg
      FROM customer GROUP BY 1, 2
    ),
    vc AS (SELECT v, CAST(sum(cg) AS BIGINT) AS c FROM vs GROUP BY v),
    ranked AS (
      SELECT v, c,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM vc
    ),
    g AS (
      SELECT vs.seg, CAST(sum(vs.cg) AS BIGINT) AS ng,
             sum(vs.cg * (r.cum_before + (r.c + 1.0) / 2)) AS rg
      FROM vs JOIN ranked r ON r.v = vs.v
      GROUP BY vs.seg
    ),
    t AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             sum(CAST(c AS DOUBLE) * c * c - c) AS tie_term
      FROM vc
    ),
    s AS (
      SELECT t.n, CAST(count(*) AS BIGINT) AS k, t.tie_term,
             12.0 / (t.n * (t.n + 1.0)) * sum(rg * rg / ng)
               - 3 * (t.n + 1.0) AS h_raw
      FROM g, t GROUP BY t.n, t.tie_term
    )
    SELECT n, k,
           round(h_raw, 6) AS h_uncorrected,
           round(1 - tie_term / (CAST(n AS DOUBLE) * n * n - n), 6)
             AS tie_correction,
           round(h_raw / (1 - tie_term / (CAST(n AS DOUBLE) * n * n - n)),
                 6) AS h_stat
    FROM s
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA (Kruskal & Wallis 1952): the k-group
    generalization of ``q_mann_whitney`` — do account balances differ
    in location across the five market segments, judged on average
    ranks with the tie-corrected H statistic (χ²(k−1) under the
    null)? The k-sample screen that q_levene_test's variance question
    complements: location vs spread.

    Scale: the q_mann_whitney distributed-rank recipe — ranks are
    never assigned per row; the corpus collapses to the per-DISTINCT-
    value (cents) rollup, the average rank of a value is cumulative
    predecessor count + (c+1)/2 from one running sum over that
    bounded value domain, and per-group rank sums come from the
    (value, segment) rollup joined to it. Integer cents make every
    aggregate exact; doubles appear only in the closed form.
    """
    c = load_table(spark, sf_dir, "customer")
    vs = c.groupBy(
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("v"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).alias("cg"))
    vc = vs.groupBy("v").agg(F.sum("cg").alias("c"))
    vc = bounded_window_input(vc, label="q_kruskal_wallis value domain")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vc.withColumn(
        "cum_before", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    g = (
        vs.join(ranked, "v")
        .groupBy("seg")
        .agg(
            F.sum("cg").alias("ng"),
            F.sum(
                F.col("cg")
                * (F.col("cum_before") + (F.col("c") + 1.0) / 2)
            ).alias("rg"),
        )
    )
    t = vc.agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    s = (
        g.crossJoin(F.broadcast(t))
        .groupBy("n", "tie_term")
        .agg(
            F.count(F.lit(1)).alias("k"),
            (
                12.0
                / (F.col("n") * (F.col("n") + 1.0))
                * F.sum(F.col("rg") * F.col("rg") / F.col("ng"))
                - 3 * (F.col("n") + 1.0)
            ).alias("h_raw"),
        )
    )
    corr = 1 - F.col("tie_term") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round("h_raw", 6).alias("h_uncorrected"),
        F.round(corr, 6).alias("tie_correction"),
        F.round(F.col("h_raw") / corr, 6).alias("h_stat"),
    )


# --------------------------------------------------------------------------
# Bartlett's test: the parametric twin of q_levene_test
# --------------------------------------------------------------------------
@query(
    "q_bartlett_test",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)
                      * CAST(round(c_acctbal * 100, 0) AS BIGINT))
                  AS BIGINT) AS ss
      FROM customer GROUP BY 1
    ),
    v AS (
      SELECT seg, n,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
               / 10000 AS s2
      FROM g
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
             sum((n - 1) * s2) AS pooled_num,
             sum((n - 1) * ln(s2)) AS sum_ln,
             sum(1.0 / (n - 1)) AS sum_inv
      FROM v
    )
    SELECT nn AS n, k,
           round(pooled_num / (nn - k), 6) AS pooled_var,
           round(((nn - k) * ln(pooled_num / (nn - k)) - sum_ln)
                 / (1 + (sum_inv - 1.0 / (nn - k)) / (3 * (k - 1))), 6)
             AS bartlett_chi2
    FROM t
    """,
)
def q_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test (Bartlett 1937) for variance homogeneity across
    market segments — the PARAMETRIC twin of ``q_levene_test``: more
    powerful under normality, famously fragile off it (which is why
    both screens ship; disagreement between them is itself the
    non-normality signal). χ²(k−1) statistic with the Bartlett
    correction factor.

    Scale: one map-side-combined rollup to k rows of exact integer
    (cents) power sums — double accumulation order can't perturb a
    bit; group variances in dollars² via the /10000 rescale; the k-row
    final aggregate does the logs.
    """
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("ss"),
    )
    s2 = (
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
        / 10000
    )
    v = g.select("seg", "n", s2.alias("s2"))
    t = v.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("pooled_num"),
        F.sum((F.col("n") - 1) * F.log(F.col("s2"))).alias("sum_ln"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sum_inv"),
    )
    pooled = F.col("pooled_num") / (F.col("nn") - F.col("k"))
    chi2 = (
        (F.col("nn") - F.col("k")) * F.log(pooled) - F.col("sum_ln")
    ) / (
        1
        + (F.col("sum_inv") - 1.0 / (F.col("nn") - F.col("k")))
        / (3 * (F.col("k") - 1))
    )
    return t.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(pooled, 6).alias("pooled_var"),
        F.round(chi2, 6).alias("bartlett_chi2"),
    )


# --------------------------------------------------------------------------
# Cochran's Q: k matched binary treatments per user block
# --------------------------------------------------------------------------
@query(
    "q_cochran_q",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    d0 AS (SELECT min(day) AS d0 FROM ev),
    u AS (
      SELECT user_id,
             CAST(max(CASE WHEN day - d0 < 10 AND cents >= 10000
                           THEN 1 ELSE 0 END) AS BIGINT) AS t1,
             CAST(max(CASE WHEN day - d0 >= 10 AND day - d0 < 20
                           AND cents >= 10000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS t2,
             CAST(max(CASE WHEN day - d0 >= 20 AND cents >= 10000
                           THEN 1 ELSE 0 END) AS BIGINT) AS t3
      FROM ev, d0 GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(t1) AS BIGINT) AS c1,
             CAST(sum(t2) AS BIGINT) AS c2,
             CAST(sum(t3) AS BIGINT) AS c3,
             CAST(sum(t1 + t2 + t3) AS BIGINT) AS sr,
             CAST(sum((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS sr2
      FROM u
    )
    SELECT n_users, c1 AS n_period1, c2 AS n_period2, c3 AS n_period3,
           round(2.0 * (3 * (CAST(c1 AS DOUBLE) * c1
                             + CAST(c2 AS DOUBLE) * c2
                             + CAST(c3 AS DOUBLE) * c3)
                        - CAST(sr AS DOUBLE) * sr)
                 / nullif(3.0 * sr - sr2, 0), 6) AS q_stat
    FROM s
    """,
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (Cochran 1950): the k-treatment extension of
    McNemar — with each purchasing user as a matched block and "made
    a big-ticket (>= $100) purchase in period i" over three 10-day
    periods as k=3 binary treatments, does the success probability
    shift across periods? Q = (k−1)(kΣC_j² − (ΣR)²)/(kΣR − ΣR_i²),
    χ²(k−1) under exchangeable blocks; the within-subject screen
    q_mcnemar_test handles at k=2. Blocks whose treatments all agree
    contribute nothing — the saturated "reached view/click/purchase"
    framing made the denominator exactly 0, so the treatments are the
    rarer big-ticket indicator and nullif guards the degenerate case
    identically in both engines.

    Scale: one per-user map-side-combined rollup to 3 bits per user,
    then a single exact-integer aggregate to one row; doubles touch
    only the closed form.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    ev = e.select(
        "user_id",
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    big = F.col("cents") >= 10000
    rel = F.col("day") - F.col("d0")
    u = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.max(F.when((rel < 10) & big, 1).otherwise(0)).alias("t1"),
            F.max(
                F.when((rel >= 10) & (rel < 20) & big, 1).otherwise(0)
            ).alias("t2"),
            F.max(F.when((rel >= 20) & big, 1).otherwise(0)).alias("t3"),
        )
    )
    r = F.col("t1") + F.col("t2") + F.col("t3")
    s = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("t1").alias("c1"),
        F.sum("t2").alias("c2"),
        F.sum("t3").alias("c3"),
        F.sum(r).alias("sr"),
        F.sum(r * r).alias("sr2"),
    )
    csq = (
        F.col("c1").cast("double") * F.col("c1")
        + F.col("c2").cast("double") * F.col("c2")
        + F.col("c3").cast("double") * F.col("c3")
    )
    q_stat = (
        2.0
        * (3 * csq - F.col("sr").cast("double") * F.col("sr"))
        / F.nullif(
            3.0 * F.col("sr") - F.col("sr2").cast("double"), F.lit(0.0)
        )
    )
    return s.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("c1").cast("long").alias("n_period1"),
        F.col("c2").cast("long").alias("n_period2"),
        F.col("c3").cast("long").alias("n_period3"),
        F.round(q_stat, 6).alias("q_stat"),
    )


# --------------------------------------------------------------------------
# Fisher's exact test on a deterministic bottom-k document sample
# --------------------------------------------------------------------------
FISHER_N = 200


@query(
    "q_fisher_exact",
    oracle=f"""
    WITH samp AS (
      SELECT lang, CAST(substring(source, 4) AS INT) < 10 AS in_a
      FROM documents
      ORDER BY md5('fx:' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {FISHER_N}
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS r1,
             CAST(count(*) FILTER (in_a) AS BIGINT) AS c1,
             CAST(count(*) FILTER (lang = 'en' AND in_a) AS BIGINT) AS a
      FROM samp
    ),
    lf AS (
      SELECT i,
             sum(CASE WHEN i = 0 THEN 0.0 ELSE ln(CAST(i AS DOUBLE)) END)
               OVER (ORDER BY i) AS lf
      FROM unnest(generate_series(0, {FISHER_N})) g(i)
    ),
    kk AS (
      SELECT m.*,
             f1.lf + f2.lf + f3.lf + f4.lf - f5.lf AS k_const
      FROM m
        JOIN lf f1 ON f1.i = m.r1
        JOIN lf f2 ON f2.i = m.n - m.r1
        JOIN lf f3 ON f3.i = m.c1
        JOIN lf f4 ON f4.i = m.n - m.c1
        JOIN lf f5 ON f5.i = m.n
    ),
    xs AS (
      SELECT kk.*, g.x
      FROM kk, unnest(generate_series(0, {FISHER_N})) g(x)
      WHERE g.x >= greatest(0, kk.r1 + kk.c1 - kk.n)
        AND g.x <= least(kk.r1, kk.c1)
    ),
    pmf AS (
      SELECT xs.x, xs.a, xs.n, xs.r1, xs.c1,
             round(exp(xs.k_const - fx.lf - f1.lf - f2.lf - f3.lf), 10)
               AS p
      FROM xs
        JOIN lf fx ON fx.i = xs.x
        JOIN lf f1 ON f1.i = xs.r1 - xs.x
        JOIN lf f2 ON f2.i = xs.c1 - xs.x
        JOIN lf f3 ON f3.i = xs.n - xs.r1 - xs.c1 + xs.x
    ),
    obs AS (SELECT p AS p_obs FROM pmf WHERE x = a)
    SELECT max(pmf.n) AS n, max(pmf.r1) AS n_en, max(pmf.c1) AS n_src_a,
           max(pmf.a) AS a_cell,
           round(sum(p) FILTER (x <= a), 6) AS p_left,
           round(sum(p) FILTER (x >= a), 6) AS p_right,
           round(sum(p) FILTER (p <= o.p_obs * (1 + 1e-7)), 6) AS p_two_sided
    FROM pmf, obs o GROUP BY o.p_obs
    """,
)
def q_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test (Fisher 1935) for lang='en' × source-half
    independence on a DETERMINISTIC bottom-{FISHER_N} md5-hash sample
    of the corpus: hypergeometric tail probabilities summed over every
    table as extreme as the observed one (two-sided by the standard
    "pmf ≤ observed" rule with the 1e-7 tolerance scipy uses). Exact
    tests are small-sample instruments, so the bounded sample IS the
    contract — on a 100 TB corpus you test a fixed-k sample or a
    single shard, never the population (where everything is
    "significant"); the bottom-k-by-hash sample is reproducible across
    engines and rounds.

    Hash-exactness: log-factorials come from ONE cumulative sum over
    the 0..{FISHER_N} integer spine (identical fold order in both
    engines), each pmf is rounded to 10dp before any reordering sum,
    and the comparison runs on those rounded values — so the inclusion
    set and the 6dp tails are engine-identical.

    Scale: the sample is a TakeOrdered top-k by hash (no shuffle of
    the corpus); everything after lives on a ≤{FISHER_N}-row frame
    plus the {FISHER_N}+1-row spine.
    """
    d = load_table(spark, sf_dir, "documents")
    samp = (
        d.select(
            "lang",
            (F.expr("CAST(substring(source, 4) AS INT)") < 10).alias("in_a"),
            F.md5(
                F.concat(F.lit("fx:"), F.col("doc_id").cast("string"))
            ).alias("h"),
            "doc_id",
        )
        .orderBy("h", "doc_id")
        .limit(FISHER_N)
    )
    m = samp.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("lang") == "en").alias("r1"),
        F.count_if("in_a").alias("c1"),
        F.count_if((F.col("lang") == "en") & F.col("in_a")).alias("a"),
    )
    spine = spark.range(0, FISHER_N + 1).select(F.col("id").alias("i"))
    spine = bounded_window_input(spine, label="q_fisher_exact lfact spine")
    lf = spine.select(
        "i",
        F.sum(
            F.when(F.col("i") == 0, 0.0).otherwise(
                F.log(F.col("i").cast("double"))
            )
        )
        .over(Window.orderBy("i"))
        .alias("lf"),
    )
    lfb = F.broadcast(lf)
    f1, f2, f3, f4, f5 = (lfb.alias(f"f{i}") for i in range(1, 6))
    kk = (
        m.join(f1, F.col("f1.i") == F.col("r1"))
        .join(f2, F.col("f2.i") == F.col("n") - F.col("r1"))
        .join(f3, F.col("f3.i") == F.col("c1"))
        .join(f4, F.col("f4.i") == F.col("n") - F.col("c1"))
        .join(f5, F.col("f5.i") == F.col("n"))
        .select(
            "n", "r1", "c1", "a",
            (
                F.col("f1.lf")
                + F.col("f2.lf")
                + F.col("f3.lf")
                + F.col("f4.lf")
                - F.col("f5.lf")
            ).alias("k_const"),
        )
    )
    xs = (
        kk.crossJoin(
            F.broadcast(
                spark.range(0, FISHER_N + 1).select(F.col("id").alias("x"))
            )
        )
        .filter(
            (F.col("x") >= F.greatest(F.lit(0), F.col("r1") + F.col("c1") - F.col("n")))
            & (F.col("x") <= F.least(F.col("r1"), F.col("c1")))
        )
    )
    fx, g1, g2, g3 = (lfb.alias(f"g{i}") for i in range(0, 4))
    pmf = (
        xs.join(fx, F.col("g0.i") == F.col("x"))
        .join(g1, F.col("g1.i") == F.col("r1") - F.col("x"))
        .join(g2, F.col("g2.i") == F.col("c1") - F.col("x"))
        .join(
            g3,
            F.col("g3.i")
            == F.col("n") - F.col("r1") - F.col("c1") + F.col("x"),
        )
        .select(
            "x", "a", "n", "r1", "c1",
            F.round(
                F.exp(
                    F.col("k_const")
                    - F.col("g0.lf")
                    - F.col("g1.lf")
                    - F.col("g2.lf")
                    - F.col("g3.lf")
                ),
                10,
            ).alias("p"),
        )
    )
    obs = pmf.filter(F.col("x") == F.col("a")).select(
        F.col("p").alias("p_obs")
    )
    return (
        pmf.crossJoin(F.broadcast(obs))
        .groupBy("p_obs")
        .agg(
            F.max("n").alias("n"),
            F.max("r1").alias("n_en"),
            F.max("c1").alias("n_src_a"),
            F.max("a").alias("a_cell"),
            F.round(
                F.sum(F.when(F.col("x") <= F.col("a"), F.col("p"))), 6
            ).alias("p_left"),
            F.round(
                F.sum(F.when(F.col("x") >= F.col("a"), F.col("p"))), 6
            ).alias("p_right"),
            F.round(
                F.sum(
                    F.when(
                        F.col("p") <= F.col("p_obs") * (1 + 1e-7), F.col("p")
                    )
                ),
                6,
            ).alias("p_two_sided"),
        )
        .select(
            "n", "n_en", "n_src_a", "a_cell",
            "p_left", "p_right", "p_two_sided",
        )
    )


# --------------------------------------------------------------------------
# Negative-binomial method-of-moments fit for overdispersed counts
# --------------------------------------------------------------------------
@query(
    "q_negbinomial_fit",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS k
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS sk,
             CAST(sum(k * k) AS BIGINT) AS skk,
             CAST(count(*) FILTER (k = 0) AS BIGINT) AS zeros
      FROM pu
    ),
    fit AS (
      SELECT n, zeros,
             CAST(sk AS DOUBLE) / n AS mean,
             (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / n) / (n - 1)
               AS var
      FROM m
    )
    SELECT n AS n_users, round(mean, 6) AS mean, round(var, 6) AS var,
           round(mean * mean / nullif(var - mean, 0), 6) AS nb_r,
           round(mean / var, 6) AS nb_p,
           round(zeros * 1.0 / n, 6) AS obs_zero_share,
           round(pow((mean * mean / nullif(var - mean, 0))
                     / (mean * mean / nullif(var - mean, 0) + mean),
                     mean * mean / nullif(var - mean, 0)), 6)
             AS nb_zero_share,
           round(exp(-mean), 6) AS poisson_zero_share
    FROM fit
    """,
)
def q_negbinomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit (Greenwood & Yule 1920;
    the gamma-Poisson mixture) of per-user purchase counts: r =
    m²/(v−m), p = m/v — the parameters q_overdispersion_check's
    verdict points at but doesn't estimate — plus the zero-share
    three-way readout: observed vs NB-predicted (r/(r+m))^r vs the
    Poisson e^(−m) that overdispersed data always undershoots. THE
    count model for user activity, purchase frequency, token
    occurrences — anything where rates vary across units.

    Hash-exactness: counts and their squares aggregate as exact
    integers; the fit is one rounded closed form; nullif guards the
    equidispersed degenerate case identically in both engines.

    Scale: one per-user map-side-combined rollup, one 1-row exact
    aggregate. The zero class requires counting users from the full
    event frame, not just purchasers — hence the unfiltered groupBy
    with a conditional count.
    """
    e = load_table(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("k")
    )
    m = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.count_if(F.col("k") == 0).alias("zeros"),
    )
    mean = F.col("sk").cast("double") / F.col("n")
    var = (
        F.col("skk").cast("double")
        - F.col("sk").cast("double") * F.col("sk") / F.col("n")
    ) / (F.col("n") - 1)
    fit = m.select(
        "n", "zeros", mean.alias("mean"), var.alias("var")
    )
    r = (
        F.col("mean")
        * F.col("mean")
        / F.nullif(F.col("var") - F.col("mean"), F.lit(0.0))
    )
    return fit.select(
        F.col("n").cast("long").alias("n_users"),
        F.round("mean", 6).alias("mean"),
        F.round("var", 6).alias("var"),
        F.round(r, 6).alias("nb_r"),
        F.round(F.col("mean") / F.col("var"), 6).alias("nb_p"),
        F.round(F.col("zeros") * 1.0 / F.col("n"), 6).alias(
            "obs_zero_share"
        ),
        F.round(
            F.pow(r / (r + F.col("mean")), r), 6
        ).alias("nb_zero_share"),
        F.round(F.exp(-F.col("mean")), 6).alias("poisson_zero_share"),
    )


# --------------------------------------------------------------------------
# Cronbach's alpha: internal consistency of the per-user activity items
# --------------------------------------------------------------------------
_CRONBACH_ITEMS = ("view", "click", "purchase", "signup", "error")


@query(
    "q_cronbach_alpha",
    oracle=f"""
    WITH pu AS (
      SELECT user_id,
             {", ".join(
               f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS i{j}"
               for j, t in enumerate(_CRONBACH_ITEMS))}
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {", ".join(
               f"CAST(sum(i{j}) AS BIGINT) AS s{j},"
               f" CAST(sum(i{j} * i{j}) AS BIGINT) AS ss{j}"
               for j in range(len(_CRONBACH_ITEMS)))},
             CAST(sum({' + '.join(f'i{j}' for j in range(len(_CRONBACH_ITEMS)))})
                  AS BIGINT) AS st,
             CAST(sum(({' + '.join(f'i{j}' for j in range(len(_CRONBACH_ITEMS)))})
                      * ({' + '.join(f'i{j}' for j in range(len(_CRONBACH_ITEMS)))}))
                  AS BIGINT) AS sst
      FROM pu
    ),
    v AS (
      SELECT n,
             {" + ".join(
               f"(CAST(ss{j} AS DOUBLE) - CAST(s{j} AS DOUBLE) * s{j} / n)"
               f" / (n - 1)"
               for j in range(len(_CRONBACH_ITEMS)))} AS sum_item_var,
             (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / n) / (n - 1)
               AS total_var
      FROM m
    )
    SELECT n AS n_users,
           CAST({len(_CRONBACH_ITEMS)} AS BIGINT) AS k,
           round(sum_item_var, 6) AS sum_item_var,
           round(total_var, 6) AS total_var,
           round({len(_CRONBACH_ITEMS)} / ({len(_CRONBACH_ITEMS)} - 1.0)
                 * (1 - sum_item_var / total_var), 6) AS cronbach_alpha
    FROM v
    """,
)
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha (Cronbach 1951): internal consistency of the
    k={len(_CRONBACH_ITEMS)} per-user activity counts treated as scale
    items — α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total), the reliability
    coefficient that says whether the event types co-vary enough to
    justify a single "activity" score (the implicit assumption behind
    q_rfm_segmentation's summed engagement features). Joins Cohen's κ
    and Kendall's W in the agreement family: κ rates two raters, W
    rates rankings, α rates a composite scale.

    Hash-exactness: all item sums and cross-moments are exact
    integers; the variances and α are one rounded closed form.

    Scale: one per-user map-side-combined rollup to k counts, one
    1-row exact aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        *[
            F.count_if(F.col("event_type") == t).alias(f"i{j}")
            for j, t in enumerate(_CRONBACH_ITEMS)
        ]
    )
    k = len(_CRONBACH_ITEMS)
    tot = sum((F.col(f"i{j}") for j in range(1, k)), F.col("i0"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(k):
        aggs.append(F.sum(f"i{j}").alias(f"s{j}"))
        aggs.append(F.sum(F.col(f"i{j}") * F.col(f"i{j}")).alias(f"ss{j}"))
    aggs.append(F.sum(tot).alias("st"))
    aggs.append(F.sum(tot * tot).alias("sst"))
    m = pu.agg(*aggs)
    nn = F.col("n")

    def _var(s: str, ss: str):
        return (
            F.col(ss).cast("double") - F.col(s).cast("double") * F.col(s) / nn
        ) / (nn - 1)

    sum_item_var = sum(
        (_var(f"s{j}", f"ss{j}") for j in range(1, k)), _var("s0", "ss0")
    )
    total_var = _var("st", "sst")
    v = m.select(
        "n",
        sum_item_var.alias("sum_item_var"),
        total_var.alias("total_var"),
    )
    return v.select(
        F.col("n").cast("long").alias("n_users"),
        F.lit(k).cast("long").alias("k"),
        F.round("sum_item_var", 6).alias("sum_item_var"),
        F.round("total_var", 6).alias("total_var"),
        F.round(
            k / (k - 1.0) * (1 - F.col("sum_item_var") / F.col("total_var")),
            6,
        ).alias("cronbach_alpha"),
    )


# --------------------------------------------------------------------------
# Count-Sketch (signed): unbiased heavy-hitter estimates via the
# median-of-rows readout
# --------------------------------------------------------------------------
CS_DEPTH = 5
CS_WIDTH = 64


def _cs_bucket_sql(value_sql: str, seed: int) -> str:
    return (
        _hexval_sql(f"md5(concat('csb{seed}:', {value_sql}))", 4)
        + f" % {CS_WIDTH}"
    )


def _cs_sign_sql(value_sql: str, seed: int) -> str:
    return (
        "(CASE WHEN "
        + _hexval_sql(f"md5(concat('css{seed}:', {value_sql}))", 1)
        + " % 2 = 0 THEN 1 ELSE -1 END)"
    )


@query(
    "q_count_sketch_audit",
    oracle=f"""
    WITH hashed AS (
      {" UNION ALL ".join(
        f"SELECT {j} AS j,"
        f" {_cs_bucket_sql('CAST(user_id AS VARCHAR)', j)} AS bucket,"
        f" {_cs_sign_sql('CAST(user_id AS VARCHAR)', j)} AS sgn"
        " FROM events"
        for j in range(1, CS_DEPTH + 1))}
    ),
    cells AS (
      SELECT j, bucket, CAST(sum(sgn) AS BIGINT) AS c
      FROM hashed GROUP BY 1, 2
    ),
    top AS (
      -- tie-break must be NUMERIC: ordering the VARCHAR uid ranks
      -- '1176' before '586' and diverges from Spark's long ordering
      -- exactly when the 10th place is tied (it is at sf0.1)
      SELECT CAST(user_id AS VARCHAR) AS uid, count(*) AS true_n
      FROM events GROUP BY 1
      ORDER BY true_n DESC, CAST(uid AS BIGINT) LIMIT 10
    ),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT uid, true_n, {j} AS j,"
        f" {_cs_bucket_sql('uid', j)} AS bucket,"
        f" {_cs_sign_sql('uid', j)} AS sgn"
        " FROM top"
        for j in range(1, CS_DEPTH + 1))}
    )
    SELECT p.uid AS user_id,
           CAST(max(p.true_n) AS BIGINT) AS true_n,
           round(median(p.sgn * cells.c), 6) AS cs_estimate,
           round(median(p.sgn * cells.c) - max(p.true_n), 6) AS error
    FROM probes p JOIN cells ON p.j = cells.j AND p.bucket = cells.bucket
    GROUP BY p.uid
    ORDER BY user_id
    """,
)
def q_count_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch (Charikar, Chen & Farach-Colton 2002): the SIGNED
    cousin of ``q_countmin_heavy_hitters`` — each of d={CS_DEPTH}
    portable md5 hash rows adds ±1 per occurrence into w={CS_WIDTH}
    buckets, and a key's estimate is the MEDIAN over rows of
    sign·cell. Collisions cancel in expectation instead of
    accumulating, so the error is two-sided and unbiased with
    magnitude ~‖f‖₂/√w (vs Count-Min's one-sided ~‖f‖₁/w) — the
    sketch of choice when a few heavy keys would otherwise poison
    every bucket they touch. Read back at the true top-10 users, the
    same audit protocol as the CMS query.

    Scale: sketch build is one map-side-combined groupBy to
    d·w = {CS_DEPTH * CS_WIDTH} signed cells; probing joins the
    10-row heavy-hitter frame against the broadcast cell table.
    """
    e = load_table(spark, sf_dir, "events")
    probes_expr = [
        F.struct(
            F.lit(j).alias("j"),
            F.expr(_cs_bucket_sql("CAST(user_id AS STRING)", j))
            .cast("long")
            .alias("bucket"),
            F.expr(_cs_sign_sql("CAST(user_id AS STRING)", j))
            .cast("long")
            .alias("sgn"),
        )
        for j in range(1, CS_DEPTH + 1)
    ]
    cells = (
        e.select(F.explode(F.array(*probes_expr)).alias("h"))
        .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.sum("h.sgn").alias("c"))
    )
    top = (
        e.groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.desc("true_n"), "user_id")
        .limit(10)
    )
    probes = top.select(
        "user_id", "true_n", F.explode(F.array(*probes_expr)).alias("h")
    ).select(
        "user_id",
        "true_n",
        F.col("h.j").alias("j"),
        F.col("h.bucket").alias("bucket"),
        F.col("h.sgn").alias("sgn"),
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id")
        .agg(
            F.max("true_n").alias("true_n"),
            F.round(F.expr("median(sgn * c)"), 6).alias("cs_estimate"),
            F.round(
                F.expr("median(sgn * c)") - F.max("true_n"), 6
            ).alias("error"),
        )
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            "true_n",
            "cs_estimate",
            "error",
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# E-value sensitivity analysis (VanderWeele & Ding 2017)
# --------------------------------------------------------------------------
EVALUE_HIGH_CENTS = 10_000  # "high-value purchase" outcome: >= $100
# ($100 keeps every 2x2 cell populated down to sf0.001; $200 empties the
# exposed-high cell there and the risk ratio degenerates to 0)


@query(
    "q_e_value_sensitivity",
    oracle=f"""
    WITH p AS (
      SELECT (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS exposed,
             CAST(round(value * 100, 0) AS BIGINT)
               >= {EVALUE_HIGH_CENTS} AS outcome
      FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT CAST(count(*) FILTER (WHERE exposed AND outcome) AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE exposed AND NOT outcome) AS BIGINT) AS b,
             CAST(count(*) FILTER (WHERE NOT exposed AND outcome) AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE NOT exposed AND NOT outcome) AS BIGINT) AS d
      FROM p
    ),
    rr AS (
      SELECT a, b, c, d,
             (CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d))
               AS rr
      FROM cells
    ),
    ev AS (
      SELECT a, b, c, d, rr,
             CASE WHEN rr >= 1 THEN rr ELSE 1 / rr END AS rr_star
      FROM rr
    )
    SELECT a AS n_exposed_hi, b AS n_exposed_lo,
           c AS n_unexposed_hi, d AS n_unexposed_lo,
           round(rr, 6) AS risk_ratio,
           round(rr_star + sqrt(rr_star * (rr_star - 1)), 6) AS e_value
    FROM ev
    """,
)
def q_e_value_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-value (VanderWeele & Ding 2017) for the weekend → high-value-
    purchase risk ratio: the MINIMUM strength of association an
    unmeasured confounder would need with BOTH exposure and outcome to
    fully explain away the observed RR — E = RR* + √(RR*(RR*−1)) on
    the ≥1 orientation. The one-number sensitivity analysis that
    belongs next to every observational estimate the causal suite
    (``q_ipw_ate``, ``q_diff_in_diff``, ``q_matching_att``) produces:
    an RR of 1.5 needs a confounder with twin RRs ≈ 2.37 to nullify,
    and no p-value can say that.

    Scale: one conditional aggregate to the 2×2 table; everything
    after is scalar arithmetic.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.floor(F.unix_micros("ts") / 86_400_000_000)
    p = e.select(
        (day % 7).isin(2, 3).alias("exposed"),
        (
            F.round(F.col("value") * 100, 0).cast("long")
            >= EVALUE_HIGH_CENTS
        ).alias("outcome"),
    )
    cells = p.agg(
        F.count_if(F.col("exposed") & F.col("outcome"))
        .cast("long")
        .alias("a"),
        F.count_if(F.col("exposed") & ~F.col("outcome"))
        .cast("long")
        .alias("b"),
        F.count_if(~F.col("exposed") & F.col("outcome"))
        .cast("long")
        .alias("c"),
        F.count_if(~F.col("exposed") & ~F.col("outcome"))
        .cast("long")
        .alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    rr = (a / (a + b)) / (c / (c + d))
    rr_star = F.when(rr >= 1, rr).otherwise(1 / rr)
    return cells.select(
        F.col("a").alias("n_exposed_hi"),
        F.col("b").alias("n_exposed_lo"),
        F.col("c").alias("n_unexposed_hi"),
        F.col("d").alias("n_unexposed_lo"),
        F.round(rr, 6).alias("risk_ratio"),
        F.round(rr_star + F.sqrt(rr_star * (rr_star - 1)), 6).alias(
            "e_value"
        ),
    )


# --------------------------------------------------------------------------
# Weighted log-rank family: log-rank / Gehan / Tarone-Ware in one table
# --------------------------------------------------------------------------
@query(
    "q_weighted_logrank",
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
      SELECT user_id % 2 AS grp,
             CASE WHEN p_us IS NOT NULL
                  THEN CAST((p_us - s_us) // 86400000000 AS BIGINT)
                  ELSE CAST((h - s_us) // 86400000000 AS BIGINT) END AS e_day,
             p_us IS NOT NULL AS is_event
      FROM conv, horizon
    ),
    spine AS (SELECT unnest(range(0, {SURVIVAL_WINDOW_DAYS})) AS day),
    tab AS (
      SELECT spine.day,
             count(*) FILTER (o.e_day >= spine.day) AS n_t,
             count(*) FILTER (o.e_day >= spine.day AND o.grp = 0) AS n1_t,
             count(*) FILTER (o.is_event AND o.e_day = spine.day) AS d_t,
             count(*) FILTER (o.is_event AND o.e_day = spine.day
                              AND o.grp = 0) AS d1_t
      FROM spine CROSS JOIN obs o GROUP BY spine.day
      HAVING count(*) FILTER (o.e_day >= spine.day) > 0
    ),
    w AS (
      SELECT weighting, day, n_t, n1_t, d_t, d1_t,
             CASE weighting WHEN 'logrank' THEN 1.0
                            WHEN 'gehan' THEN CAST(n_t AS DOUBLE)
                            ELSE sqrt(CAST(n_t AS DOUBLE)) END AS wt
      FROM tab,
           unnest(['logrank', 'gehan', 'tarone_ware']) AS u(weighting)
    )
    SELECT weighting,
           round(sum(wt * (d1_t - d_t * n1_t * 1.0 / n_t)), 6) AS o_minus_e,
           round(sum(CASE WHEN n_t > 1
                     THEN wt * wt * d_t * (n1_t * 1.0 / n_t)
                          * (1 - n1_t * 1.0 / n_t)
                          * (n_t - d_t) * 1.0 / (n_t - 1) END), 6)
             AS variance,
           round(sum(wt * (d1_t - d_t * n1_t * 1.0 / n_t))
                 / sqrt(sum(CASE WHEN n_t > 1
                        THEN wt * wt * d_t * (n1_t * 1.0 / n_t)
                             * (1 - n1_t * 1.0 / n_t)
                             * (n_t - d_t) * 1.0 / (n_t - 1) END)), 6) AS z
    FROM w GROUP BY weighting ORDER BY weighting
    """,
)
def q_weighted_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted log-rank family (Fleming & Harrington) on the
    signup→purchase survival split of ``q_logrank_test``: the same
    per-day (O − E) increments under three weightings — w = 1
    (log-rank, equal weight, optimal under proportional hazards),
    w = n_t (Gehan-Wilcoxon, front-loads EARLY differences where the
    risk set is large), w = √n_t (Tarone-Ware, the compromise).
    Divergence between the three z's is itself the diagnostic: it
    means the hazard curves CROSS, and no single test summarizes them
    honestly.

    Scale: one survival table build (identical plan to
    ``q_logrank_test``), fanned ×3 by a literal weighting spine —
    the added cost over the single test is three extra columns on a
    {SURVIVAL_WINDOW_DAYS}-row frame.
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
            (signup.user_id == purchases.user_id)
            & (F.col("p_us") > F.col("s_us")),
            "left",
        )
        .groupBy(signup.user_id, "s_us")
        .agg(F.min("p_us").alias("p_us"))
    )
    obs = conv.crossJoin(F.broadcast(horizon)).select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.col("p_us").isNotNull(),
            F.floor((F.col("p_us") - F.col("s_us")) / US_PER_DAY),
        )
        .otherwise(F.floor((F.col("h") - F.col("s_us")) / US_PER_DAY))
        .cast("long")
        .alias("e_day"),
        F.col("p_us").isNotNull().alias("is_event"),
    )
    spine = spark.range(0, SURVIVAL_WINDOW_DAYS).select(
        F.col("id").alias("day")
    )
    at_risk = F.col("e_day") >= F.col("day")
    died = F.col("is_event") & (F.col("e_day") == F.col("day"))
    tab = (
        F.broadcast(spine)
        .crossJoin(obs)
        .groupBy("day")
        .agg(
            F.count_if(at_risk).alias("n_t"),
            F.count_if(at_risk & (F.col("grp") == 0)).alias("n1_t"),
            F.count_if(died).alias("d_t"),
            F.count_if(died & (F.col("grp") == 0)).alias("d1_t"),
        )
        .filter(F.col("n_t") > 0)
    )
    w = tab.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [("logrank",), ("gehan",), ("tarone_ware",)], ["weighting"]
            )
        )
    ).withColumn(
        "wt",
        F.when(F.col("weighting") == "logrank", F.lit(1.0))
        .when(F.col("weighting") == "gehan", F.col("n_t").cast("double"))
        .otherwise(F.sqrt(F.col("n_t").cast("double"))),
    )
    p1 = F.col("n1_t") / F.col("n_t")
    o_e = F.col("wt") * (F.col("d1_t") - F.col("d_t") * p1)
    vterm = F.when(
        F.col("n_t") > 1,
        F.col("wt")
        * F.col("wt")
        * F.col("d_t")
        * p1
        * (1 - p1)
        * (F.col("n_t") - F.col("d_t"))
        / (F.col("n_t") - 1),
    )
    return (
        w.groupBy("weighting")
        .agg(
            F.round(F.sum(o_e), 6).alias("o_minus_e"),
            F.round(F.sum(vterm), 6).alias("variance"),
            F.round(F.sum(o_e) / F.sqrt(F.sum(vterm)), 6).alias("z"),
        )
        .orderBy("weighting")
    )


# --------------------------------------------------------------------------
# TOST equivalence, exact Bayesian A/B, beta-binomial overdispersion fit
# --------------------------------------------------------------------------
TOST_MARGIN_FRAC = 0.05  # equivalence margin: ±5% of the pooled mean


@query(
    "q_tost_equivalence",
    oracle=f"""
    WITH p AS (
      SELECT (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS weekend,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT weekend, CAST(count(*) AS BIGINT) AS n,
             avg(value) AS m, var_samp(value) AS v
      FROM p GROUP BY 1
    ),
    s AS (
      SELECT max(CASE WHEN weekend THEN n END) AS n2,
             max(CASE WHEN NOT weekend THEN n END) AS n1,
             max(CASE WHEN weekend THEN m END) AS m2,
             max(CASE WHEN NOT weekend THEN m END) AS m1,
             max(CASE WHEN weekend THEN v END) AS v2,
             max(CASE WHEN NOT weekend THEN v END) AS v1,
             (sum(n * m) / sum(n)) * {TOST_MARGIN_FRAC} AS delta
      FROM g
    ),
    t AS (
      SELECT n1, n2, m2 - m1 AS d, delta,
             sqrt(v1 / n1 + v2 / n2) AS se,
             pow(v1 / n1 + v2 / n2, 2)
             / (pow(v1 / n1, 2) / (n1 - 1)
                + pow(v2 / n2, 2) / (n2 - 1)) AS df
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekday, CAST(n2 AS BIGINT) AS n_weekend,
           round(d, 6) AS mean_diff,
           round(delta, 6) AS margin,
           round((d + delta) / se, 6) AS t_lower,
           round((delta - d) / se, 6) AS t_upper,
           round(df, 6) AS df_welch,
           round(least((d + delta) / se, (delta - d) / se), 6) AS t_min
    FROM t
    """,
)
def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-one-sided-tests equivalence procedure (Schuirmann 1987) on
    weekday vs weekend purchase sizes: H₀ is that the means DIFFER by
    more than ±{TOST_MARGIN_FRAC:.0%} of the pooled mean, and
    equivalence is declared only when BOTH one-sided Welch t's reject
    — the statistically honest version of "no significant difference"
    (which merely fails to reject and proves nothing). Emits both t's,
    the Welch-Satterthwaite df and min(t₁, t₂); the caller thresholds
    against t₍₁₋α₎(df).

    Scale: one conditional aggregate to the two-group moment frame;
    everything else is scalar Welch arithmetic.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.floor(F.unix_micros("ts") / US_PER_DAY)
    g = (
        e.select((day % 7).isin(2, 3).alias("weekend"), "value")
        .groupBy("weekend")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    s = g.agg(
        F.max(F.when(F.col("weekend"), F.col("n"))).alias("n2"),
        F.max(F.when(~F.col("weekend"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("weekend"), F.col("m"))).alias("m2"),
        F.max(F.when(~F.col("weekend"), F.col("m"))).alias("m1"),
        F.max(F.when(F.col("weekend"), F.col("v"))).alias("v2"),
        F.max(F.when(~F.col("weekend"), F.col("v"))).alias("v1"),
        (
            (F.sum(F.col("n") * F.col("m")) / F.sum("n"))
            * TOST_MARGIN_FRAC
        ).alias("delta"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    d = F.col("m2") - F.col("m1")
    se = F.sqrt(F.col("v1") / n1 + F.col("v2") / n2)
    df = F.pow(F.col("v1") / n1 + F.col("v2") / n2, 2) / (
        F.pow(F.col("v1") / n1, 2) / (n1 - 1)
        + F.pow(F.col("v2") / n2, 2) / (n2 - 1)
    )
    t_lo = (d + F.col("delta")) / se
    t_hi = (F.col("delta") - d) / se
    return s.select(
        F.col("n1").alias("n_weekday"),
        F.col("n2").alias("n_weekend"),
        F.round(d, 6).alias("mean_diff"),
        F.round(F.col("delta"), 6).alias("margin"),
        F.round(t_lo, 6).alias("t_lower"),
        F.round(t_hi, 6).alias("t_upper"),
        F.round(df, 6).alias("df_welch"),
        F.round(F.least(t_lo, t_hi), 6).alias("t_min"),
    )


@query(
    "q_bayesian_ab_exact",
    oracle="""
    WITH users AS (
      SELECT user_id,
             substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
               AS arm_a,
             count(*) FILTER (WHERE event_type = 'purchase') > 0 AS conv
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) FILTER (arm_a AND conv) AS BIGINT) AS sa,
             CAST(count(*) FILTER (arm_a AND NOT conv) AS BIGINT) AS fa,
             CAST(count(*) FILTER (NOT arm_a AND conv) AS BIGINT) AS sb,
             CAST(count(*) FILTER (NOT arm_a AND NOT conv) AS BIGINT) AS fb
      FROM users
    ),
    post AS (
      SELECT sa + 1 AS aa, fa + 1 AS ba, sb + 1 AS ab, fb + 1 AS bb,
             sa, fa, sb, fb
      FROM m
    ),
    lf AS (
      SELECT i,
             sum(CASE WHEN i = 0 THEN 0.0 ELSE ln(CAST(i AS DOUBLE)) END)
               OVER (ORDER BY i) AS lf
      FROM unnest(generate_series(
        0, (SELECT CAST(aa + ba + ab + bb AS BIGINT) FROM post))) g(i)
    ),
    terms AS (
      -- P(p_B > p_A) = sum_{i=0}^{ab-1}
      --   B(aa+i, ba+bb) / ((bb+i) B(1+i, bb) B(aa, ba))
      -- with ln B(x,y) = lf(x-1)+lf(y-1)-lf(x+y-1), all integer args
      SELECT exp(
               (f1.lf + f2.lf - f3.lf)          -- ln B(aa+i, ba+bb)
               - ln(CAST(p.bb + g.i AS DOUBLE))
               - (f4.lf + f5.lf - f6.lf)        -- ln B(1+i, bb)
               - (f7.lf + f8.lf - f9.lf)        -- ln B(aa, ba)
             ) AS term
      FROM post p
        JOIN lateral (SELECT unnest(generate_series(0,
             CAST(p.ab - 1 AS BIGINT))) AS i) g ON true
        JOIN lf f1 ON f1.i = p.aa + g.i - 1
        JOIN lf f2 ON f2.i = p.ba + p.bb - 1
        JOIN lf f3 ON f3.i = p.aa + g.i + p.ba + p.bb - 1
        JOIN lf f4 ON f4.i = g.i
        JOIN lf f5 ON f5.i = p.bb - 1
        JOIN lf f6 ON f6.i = g.i + p.bb
        JOIN lf f7 ON f7.i = p.aa - 1
        JOIN lf f8 ON f8.i = p.ba - 1
        JOIN lf f9 ON f9.i = p.aa + p.ba - 1
    )
    SELECT (SELECT sa FROM post) AS conv_a,
           (SELECT sa + fa FROM post) AS n_a,
           (SELECT sb FROM post) AS conv_b,
           (SELECT sb + fb FROM post) AS n_b,
           round((SELECT CAST(aa AS DOUBLE) / (aa + ba) FROM post), 6)
             AS post_mean_a,
           round((SELECT CAST(ab AS DOUBLE) / (ab + bb) FROM post), 6)
             AS post_mean_b,
           round(sum(term), 6) AS p_b_beats_a
    FROM terms
    """,
)
def q_bayesian_ab_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Bayesian A/B readout on the exp7 user split (uniform
    Beta(1,1) priors, conversion = any purchase): P(p_B > p_A) by the
    closed-form sum Σ_{i<α_B} B(α_A+i, β_A+β_B)/((β_B+i)·B(1+i,β_B)·
    B(α_A,β_A)) — no Monte Carlo, no normal approximation, evaluated
    through the same cumulative log-factorial spine as
    ``q_fisher_exact`` (every Beta argument is an integer, so lgamma
    IS a log-factorial lookup). The decision-ready companion to the
    frequentist ``q_ab_lift``/``q_welch_ttest`` pair: a probability a
    stakeholder can act on, not a p-value. Term count = α_B
    (conversions), spine = total users — both bounded by the user
    domain; at genuinely huge counts you'd switch to the normal
    approximation this number converges to.

    Scale: per-user rollup → four integers; the sum is one aggregate
    over a conversions-sized spine with nine broadcast-joined
    log-factorial lookups.
    """
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (
            F.substring(
                F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8"
        ).alias("arm_a"),
        (F.count_if(F.col("event_type") == "purchase") > 0).alias("conv"),
    )
    m = users.agg(
        F.count_if(F.col("arm_a") & F.col("conv")).cast("long").alias("sa"),
        F.count_if(F.col("arm_a") & ~F.col("conv")).cast("long").alias("fa"),
        F.count_if(~F.col("arm_a") & F.col("conv")).cast("long").alias("sb"),
        F.count_if(~F.col("arm_a") & ~F.col("conv")).cast("long").alias("fb"),
    )
    post = m.select(
        "sa",
        "fa",
        "sb",
        "fb",
        (F.col("sa") + 1).alias("aa"),
        (F.col("fa") + 1).alias("ba"),
        (F.col("sb") + 1).alias("ab"),
        (F.col("fb") + 1).alias("bb"),
    )
    prow = post.collect()[0]
    total = int(prow["aa"] + prow["ba"] + prow["ab"] + prow["bb"])
    lf = (
        spark.range(0, total + 1)
        .select(F.col("id").alias("i"))
        .withColumn(
            "lf",
            F.sum(
                F.when(F.col("i") == 0, 0.0).otherwise(
                    F.log(F.col("i").cast("double"))
                )
            ).over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    # the spine is the user domain — bounded; fine to window over
    lf = lf.transform(eager_checkpoint)

    def lfj(alias_, expr):
        j = lf.select(
            F.col("i").alias(f"i_{alias_}"), F.col("lf").alias(alias_)
        )
        return j, expr

    spine = (
        post.crossJoin(
            spark.range(0, int(prow["ab"])).select(F.col("id").alias("i"))
        )
    )
    joins = {
        "f1": F.col("aa") + F.col("i") - 1,
        "f2": F.col("ba") + F.col("bb") - 1,
        "f3": F.col("aa") + F.col("i") + F.col("ba") + F.col("bb") - 1,
        "f4": F.col("i"),
        "f5": F.col("bb") - 1,
        "f6": F.col("i") + F.col("bb"),
        "f7": F.col("aa") - 1,
        "f8": F.col("ba") - 1,
        "f9": F.col("aa") + F.col("ba") - 1,
    }
    cur = spine
    for name, expr in joins.items():
        j, e_ = lfj(name, expr)
        cur = cur.join(F.broadcast(j), e_ == F.col(f"i_{name}")).drop(
            f"i_{name}"
        )
    term = F.exp(
        (F.col("f1") + F.col("f2") - F.col("f3"))
        - F.log((F.col("bb") + F.col("i")).cast("double"))
        - (F.col("f4") + F.col("f5") - F.col("f6"))
        - (F.col("f7") + F.col("f8") - F.col("f9"))
    )
    out = cur.agg(
        F.max("sa").alias("conv_a"),
        (F.max("sa") + F.max("fa")).alias("n_a"),
        F.max("sb").alias("conv_b"),
        (F.max("sb") + F.max("fb")).alias("n_b"),
        F.round(
            F.max(F.col("aa").cast("double") / (F.col("aa") + F.col("ba"))),
            6,
        ).alias("post_mean_a"),
        F.round(
            F.max(F.col("ab").cast("double") / (F.col("ab") + F.col("bb"))),
            6,
        ).alias("post_mean_b"),
        F.round(F.sum(term), 6).alias("p_b_beats_a"),
    )
    return out


@query(
    "q_beta_binomial_fit",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE event_type = 'purchase')
               AS BIGINT) AS k
      FROM events GROUP BY 1 HAVING count(*) >= 5
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             avg(CAST(k AS DOUBLE) / n) AS p_bar,
             var_samp(CAST(k AS DOUBLE) / n) AS s2,
             avg(CAST(n AS DOUBLE)) AS n_bar
      FROM u
    ),
    fit AS (
      SELECT n_users, p_bar, s2, n_bar,
             (p_bar * (1 - p_bar) / s2 - 1)
             / (n_bar - p_bar * (1 - p_bar) / s2)
               * (n_bar - 1) AS m_shape
      FROM m
    )
    SELECT n_users,
           round(p_bar, 6) AS mean_rate,
           round(s2, 6) AS rate_variance,
           round(greatest(m_shape, 0.1) * p_bar, 6) AS alpha_mom,
           round(greatest(m_shape, 0.1) * (1 - p_bar), 6) AS beta_mom,
           round(1 / (greatest(m_shape, 0.1) + 1), 6) AS icc_rho
    FROM fit
    """,
)
def q_beta_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial method-of-moments fit to per-user purchase rates
    (users with ≥5 events): users don't share one conversion
    probability — p varies user-to-user — and the MoM shape
    M = α+β recovered from the rate mean/variance quantifies exactly
    how much (ρ = 1/(M+1) is the over-dispersion intraclass
    correlation; ρ→0 collapses to plain binomial). The model behind
    every "empirical Bayes smooth the per-user rate" step
    (``q_eb_shrinkage`` uses this family's posterior mean) and the
    right sanity gate before treating ``q_bayesian_ab_exact``'s pooled
    Beta as the whole story.

    Scale: per-user rollup, one moment aggregate, scalar algebra
    (the M estimate is floored at 0.1 so a near-zero variance cannot
    flip the shape negative — stated convention, both engines).
    """
    e = load_table(spark, sf_dir, "events")
    u = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("event_type") == "purchase").alias("k"),
        )
        .filter(F.col("n") >= 5)
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.avg(F.col("k").cast("double") / F.col("n")).alias("p_bar"),
        F.var_samp(F.col("k").cast("double") / F.col("n")).alias("s2"),
        F.avg(F.col("n").cast("double")).alias("n_bar"),
    )
    q = F.col("p_bar") * (1 - F.col("p_bar")) / F.col("s2")
    m_shape = (q - 1) / (F.col("n_bar") - q) * (F.col("n_bar") - 1)
    m_cl = F.greatest(m_shape, F.lit(0.1))
    return m.select(
        "n_users",
        F.round(F.col("p_bar"), 6).alias("mean_rate"),
        F.round(F.col("s2"), 6).alias("rate_variance"),
        F.round(m_cl * F.col("p_bar"), 6).alias("alpha_mom"),
        F.round(m_cl * (1 - F.col("p_bar")), 6).alias("beta_mom"),
        F.round(1 / (m_cl + 1), 6).alias("icc_rho"),
    )


# --------------------------------------------------------------------------
# Exact two-sample Poisson rate test (conditional binomial)
# --------------------------------------------------------------------------
@query(
    "q_poisson_2sample_exact",
    oracle="""
    WITH days AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events
    ),
    expo AS (
      SELECT CAST(count(*) FILTER (day % 7 NOT IN (2, 3)) AS BIGINT) AS t1,
             CAST(count(*) FILTER (day % 7 IN (2, 3)) AS BIGINT) AS t2
      FROM days
    ),
    errs AS (
      SELECT CAST(count(*) FILTER ((epoch_us(ts) // 86400000000) % 7
                                   NOT IN (2, 3)) AS BIGINT) AS x1,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error'
    ),
    lf AS (
      SELECT i,
             sum(CASE WHEN i = 0 THEN 0.0 ELSE ln(CAST(i AS DOUBLE)) END)
               OVER (ORDER BY i) AS lf
      FROM unnest(generate_series(0, (SELECT n FROM errs))) g(i)
    ),
    pmf AS (
      SELECT g.x,
             round(exp(fn.lf - fx.lf - fnx.lf
                       + g.x * ln(CAST(e.t1 AS DOUBLE) / (e.t1 + e.t2))
                       + (r.n - g.x)
                         * ln(CAST(e.t2 AS DOUBLE) / (e.t1 + e.t2))),
                   10) AS p
      FROM errs r, expo e,
           unnest(generate_series(0, (SELECT n FROM errs))) g(x)
        JOIN lf fn ON fn.i = (SELECT n FROM errs)
        JOIN lf fx ON fx.i = g.x
        JOIN lf fnx ON fnx.i = (SELECT n FROM errs) - g.x
    )
    SELECT (SELECT x1 FROM errs) AS errors_weekday,
           (SELECT n - x1 FROM errs) AS errors_weekend,
           (SELECT t1 FROM expo) AS days_weekday,
           (SELECT t2 FROM expo) AS days_weekend,
           round((SELECT CAST(x1 AS DOUBLE) / t1
                  / ((n - x1 + 0.5) / t2) FROM errs, expo), 6)
             AS rate_ratio,
           round(sum(p) FILTER (x <= (SELECT x1 FROM errs)), 6) AS p_left,
           round(sum(p) FILTER (x >= (SELECT x1 FROM errs)), 6) AS p_right
    FROM pmf
    """,
)
def q_poisson_2sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Poisson rate comparison (Przyborowski & 
    Wilenski 1940, the conditional "C-test") of weekday vs weekend
    ERROR rates: conditional on the total count n, the weekday count
    is Binomial(n, t₁/(t₁+t₂)) with t = day exposures, so the test
    reduces to exact binomial tails — no normal approximation, valid
    at any count including the small ones where the z-test lies.
    Tails evaluated through the ``q_fisher_exact`` log-factorial
    spine; each pmf is rounded to 10dp before the tail sums so both
    engines add identical quantized terms (the Fisher recipe). The
    0.5 continuity guard in the rate ratio keeps a zero weekend count
    finite.

    Scale: two counting aggregates plus an n-row spine — n is the
    error count, and at truly huge n the binomial tail IS the normal
    z-test this query exists to outdo.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / US_PER_DAY)
    days = e.select(day.alias("day")).distinct()
    expo = days.agg(
        F.count_if(~(F.col("day") % 7).isin(2, 3)).cast("long").alias("t1"),
        F.count_if((F.col("day") % 7).isin(2, 3)).cast("long").alias("t2"),
    )
    errs = e.filter(F.col("event_type") == "error").agg(
        F.count_if(~(day % 7).isin(2, 3)).cast("long").alias("x1"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    er = errs.collect()[0]
    n_tot, x1 = int(er["n"]), int(er["x1"])
    lf = (
        spark.range(0, n_tot + 1)
        .select(F.col("id").alias("i"))
        .withColumn(
            "lf",
            F.sum(
                F.when(F.col("i") == 0, 0.0).otherwise(
                    F.log(F.col("i").cast("double"))
                )
            ).over(
                Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .transform(eager_checkpoint)
    )
    spine = (
        spark.range(0, n_tot + 1)
        .select(F.col("id").alias("x"))
        .crossJoin(F.broadcast(expo))
        .crossJoin(F.broadcast(errs))
    )
    fn = lf.filter(F.col("i") == n_tot).select(
        F.col("lf").alias("lfn")
    )
    cur = (
        spine.crossJoin(F.broadcast(fn))
        .join(
            F.broadcast(lf.select(F.col("i").alias("ix"), F.col("lf").alias("lfx"))),
            F.col("x") == F.col("ix"),
        )
        .drop("ix")
        .join(
            F.broadcast(
                lf.select(F.col("i").alias("inx"), F.col("lf").alias("lfnx"))
            ),
            (F.col("n") - F.col("x")) == F.col("inx"),
        )
        .drop("inx")
    )
    p0 = F.col("t1").cast("double") / (F.col("t1") + F.col("t2"))
    pmf = F.round(
        F.exp(
            F.col("lfn")
            - F.col("lfx")
            - F.col("lfnx")
            + F.col("x") * F.log(p0)
            + (F.col("n") - F.col("x")) * F.log(1 - p0)
        ),
        10,
    )
    out = cur.agg(
        F.max("x1").alias("errors_weekday"),
        (F.max("n") - F.max("x1")).alias("errors_weekend"),
        F.max("t1").alias("days_weekday"),
        F.max("t2").alias("days_weekend"),
        F.round(
            F.max(
                F.col("x1").cast("double")
                / F.col("t1")
                / ((F.col("n") - F.col("x1") + 0.5) / F.col("t2"))
            ),
            6,
        ).alias("rate_ratio"),
        F.round(F.sum(F.when(F.col("x") <= x1, pmf)), 6).alias("p_left"),
        F.round(F.sum(F.when(F.col("x") >= x1, pmf)), 6).alias("p_right"),
    )
    return out


# --------------------------------------------------------------------------
# Effect-measure shelf: propensity-strata ATT, risk difference / NNT,
# population attributable fraction
# --------------------------------------------------------------------------
PROP_STRATA = 5


@query(
    "q_propensity_stratification",
    oracle=f"""
    WITH u0 AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(*) FILTER (WHERE event_type = 'error')
               AS BIGINT) AS n_err,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS DOUBLE) / 100 AS spend
      FROM events GROUP BY user_id
    ),
    med AS (SELECT median(n_err) AS me FROM u0),
    users AS (
      SELECT user_id, n_events, n_err > me AS treated, spend
      FROM u0, med
    ),
    strat AS (
      SELECT treated, spend,
             ntile({PROP_STRATA}) OVER (ORDER BY n_events, user_id)
               AS stratum
      FROM users
    ),
    cell AS (
      SELECT stratum,
             count(*) FILTER (treated) AS n_t,
             count(*) FILTER (NOT treated) AS n_c,
             avg(spend) FILTER (treated) AS y_t,
             avg(spend) FILTER (NOT treated) AS y_c
      FROM strat GROUP BY stratum
    ),
    ok AS (SELECT * FROM cell WHERE n_t > 0 AND n_c > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
           CAST(sum(n_t) AS BIGINT) AS n_treated,
           CAST(sum(n_c) AS BIGINT) AS n_control,
           round(sum(n_t * (y_t - y_c)) / sum(n_t), 6) AS att_stratified,
           round(sum((n_t + n_c) * (y_t - y_c)) / sum(n_t + n_c), 6)
             AS ate_stratified
    FROM ok
    """,
)
def q_propensity_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subclassification on the propensity surrogate (Rosenbaum &
    Rubin 1984): treatment = "above-median
    error count" (a behavioral exposure), outcome = total spend,
    strata = activity quintiles (event count — the confounder that
    drives BOTH error volume and spending, so the raw gap is badly
    inflated and the stratified one is the honest read). Within-stratum
    treated-minus-control gaps are weighted by n_t for the ATT and by
    stratum size for the ATE; five subclasses remove ~90% of the bias
    a raw comparison carries (the classic result the paper is cited
    for). Strata that lose common support (no treated or no control)
    are dropped and COUNTED — silent support loss is how
    stratification estimates lie. The coarse-but-robust sibling of
    ``q_ipw_ate`` / ``q_matching_att``.

    Scale: per-user rollup; ntile is a guarded window over the user
    frame (quantile binning at 100 TB would swap in
    approx_percentile edges); the estimate reduces over
    {PROP_STRATA} strata.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    u0 = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("event_type") == "error").alias("n_err"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(0)
            ).cast("double")
            / 100
        ).alias("spend"),
    )
    med = u0.agg(F.expr("median(n_err)").alias("me"))
    users = u0.crossJoin(F.broadcast(med)).select(
        "user_id",
        "n_events",
        (F.col("n_err") > F.col("me")).alias("treated"),
        "spend",
    )
    users = bounded_window_input(users, label="q_propensity user frame")
    strat = users.select(
        "treated",
        "spend",
        F.ntile(PROP_STRATA)
        .over(Window.orderBy("n_events", "user_id"))
        .alias("stratum"),
    )
    cell = strat.groupBy("stratum").agg(
        F.count_if(F.col("treated")).alias("n_t"),
        F.count_if(~F.col("treated")).alias("n_c"),
        F.avg(F.when(F.col("treated"), F.col("spend"))).alias("y_t"),
        F.avg(F.when(~F.col("treated"), F.col("spend"))).alias("y_c"),
    )
    ok = cell.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    gap = F.col("y_t") - F.col("y_c")
    return ok.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata_used"),
        F.sum("n_t").cast("long").alias("n_treated"),
        F.sum("n_c").cast("long").alias("n_control"),
        F.round(F.sum(F.col("n_t") * gap) / F.sum("n_t"), 6).alias(
            "att_stratified"
        ),
        F.round(
            F.sum((F.col("n_t") + F.col("n_c")) * gap)
            / F.sum(F.col("n_t") + F.col("n_c")),
            6,
        ).alias("ate_stratified"),
    )


@query(
    "q_risk_difference_nnt",
    oracle=f"""
    WITH p AS (
      SELECT (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS exposed,
             CAST(round(value * 100, 0) AS BIGINT)
               >= {EVALUE_HIGH_CENTS} AS outcome
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT CAST(count(*) FILTER (exposed AND outcome) AS BIGINT) AS a,
             CAST(count(*) FILTER (exposed) AS BIGINT) AS n1,
             CAST(count(*) FILTER (NOT exposed AND outcome) AS BIGINT) AS c_,
             CAST(count(*) FILTER (NOT exposed) AS BIGINT) AS n0
      FROM p
    ),
    r AS (
      SELECT a, n1, c_, n0,
             CAST(a AS DOUBLE) / n1 AS p1, CAST(c_ AS DOUBLE) / n0 AS p0
      FROM c
    )
    SELECT n1 AS n_exposed, n0 AS n_unexposed,
           round(p1, 6) AS risk_exposed,
           round(p0, 6) AS risk_unexposed,
           round(p1 - p0, 6) AS risk_difference,
           round((p1 - p0)
                 - 1.959964 * sqrt(p1 * (1 - p1) / n1
                                   + p0 * (1 - p0) / n0), 6) AS rd_lo95,
           round((p1 - p0)
                 + 1.959964 * sqrt(p1 * (1 - p1) / n1
                                   + p0 * (1 - p0) / n0), 6) AS rd_hi95,
           round(1 / (p1 - p0), 6) AS nnt
    FROM r
    """,
)
def q_risk_difference_nnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk difference with Wald 95% CI and the number needed to
    treat, on the same weekend/high-value 2×2 as
    ``q_e_value_sensitivity``: the ABSOLUTE effect scale every
    relative measure (RR, OR) hides — a doubled risk can be 2-in-a-
    million, and NNT = 1/RD is the stakeholder-readable version ("how
    many exposures per extra outcome"). Completes the 2×2 shelf:
    RR + E-value (relative, sensitivity), OR (``q_mantel_haenszel``),
    RD + NNT (absolute).

    Scale: one conditional aggregate, scalar arithmetic.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.floor(F.unix_micros("ts") / US_PER_DAY)
    p = e.select(
        (day % 7).isin(2, 3).alias("exposed"),
        (
            F.round(F.col("value") * 100, 0).cast("long")
            >= EVALUE_HIGH_CENTS
        ).alias("outcome"),
    )
    c = p.agg(
        F.count_if(F.col("exposed") & F.col("outcome"))
        .cast("long")
        .alias("a"),
        F.count_if(F.col("exposed")).cast("long").alias("n1"),
        F.count_if(~F.col("exposed") & F.col("outcome"))
        .cast("long")
        .alias("c_"),
        F.count_if(~F.col("exposed")).cast("long").alias("n0"),
    )
    p1 = F.col("a").cast("double") / F.col("n1")
    p0 = F.col("c_").cast("double") / F.col("n0")
    rd = p1 - p0
    se = F.sqrt(
        p1 * (1 - p1) / F.col("n1") + p0 * (1 - p0) / F.col("n0")
    )
    zc = 1.959964
    return c.select(
        F.col("n1").alias("n_exposed"),
        F.col("n0").alias("n_unexposed"),
        F.round(p1, 6).alias("risk_exposed"),
        F.round(p0, 6).alias("risk_unexposed"),
        F.round(rd, 6).alias("risk_difference"),
        F.round(rd - zc * se, 6).alias("rd_lo95"),
        F.round(rd + zc * se, 6).alias("rd_hi95"),
        F.round(1 / rd, 6).alias("nnt"),
    )


@query(
    "q_attributable_fraction",
    oracle=f"""
    WITH p AS (
      SELECT (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS exposed,
             CAST(round(value * 100, 0) AS BIGINT)
               >= {EVALUE_HIGH_CENTS} AS outcome
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT CAST(count(*) FILTER (exposed AND outcome) AS BIGINT) AS a,
             CAST(count(*) FILTER (exposed) AS BIGINT) AS n1,
             CAST(count(*) FILTER (NOT exposed AND outcome) AS BIGINT) AS b,
             CAST(count(*) FILTER (NOT exposed) AS BIGINT) AS n0,
             CAST(count(*) FILTER (outcome) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n
      FROM p
    ),
    r AS (
      SELECT a, n1, b, n0, m, n,
             CAST(a AS DOUBLE) / n1 AS p1,
             CAST(b AS DOUBLE) / n0 AS p0,
             CAST(m AS DOUBLE) / n AS pt,
             CAST(n1 AS DOUBLE) / n AS prev
      FROM c
    )
    SELECT n1 AS n_exposed, n0 AS n_unexposed, m AS n_outcomes,
           round(prev, 6) AS exposure_prevalence,
           round((p1 - p0) / p1, 6) AS af_exposed,
           round((pt - p0) / pt, 6) AS paf,
           round(prev * (p1 / p0 - 1) / (prev * (p1 / p0 - 1) + 1), 6)
             AS paf_levin
    FROM r
    """,
)
def q_attributable_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attributable fractions for the weekend/high-value association:
    AF_e = (p1-p0)/p1 (the share of exposed cases the exposure itself
    accounts for) and the population attributable fraction
    PAF = (p_t-p0)/p_t - "if weekends purchased like weekdays, what
    share of all high-value purchases disappears?" - computed both
    directly and through Levin's prevalence x (RR-1) formula, whose
    agreement with the direct form is an internal identity check the
    pytest replay asserts exactly. The public-health-style readout
    that turns the 2x2 shelf's ratios into head counts.

    Scale: one conditional aggregate, scalar arithmetic.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.floor(F.unix_micros("ts") / US_PER_DAY)
    p = e.select(
        (day % 7).isin(2, 3).alias("exposed"),
        (
            F.round(F.col("value") * 100, 0).cast("long")
            >= EVALUE_HIGH_CENTS
        ).alias("outcome"),
    )
    c = p.agg(
        F.count_if(F.col("exposed") & F.col("outcome"))
        .cast("long")
        .alias("a"),
        F.count_if(F.col("exposed")).cast("long").alias("n1"),
        F.count_if(~F.col("exposed") & F.col("outcome"))
        .cast("long")
        .alias("b"),
        F.count_if(~F.col("exposed")).cast("long").alias("n0"),
        F.count_if(F.col("outcome")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    p1 = F.col("a").cast("double") / F.col("n1")
    p0 = F.col("b").cast("double") / F.col("n0")
    pt = F.col("m").cast("double") / F.col("n")
    prev = F.col("n1").cast("double") / F.col("n")
    rr = p1 / p0
    return c.select(
        F.col("n1").alias("n_exposed"),
        F.col("n0").alias("n_unexposed"),
        F.col("m").alias("n_outcomes"),
        F.round(prev, 6).alias("exposure_prevalence"),
        F.round((p1 - p0) / p1, 6).alias("af_exposed"),
        F.round((pt - p0) / pt, 6).alias("paf"),
        F.round(
            prev * (rr - 1) / (prev * (rr - 1) + 1), 6
        ).alias("paf_levin"),
    )
