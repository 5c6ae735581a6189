"""Inter-rater agreement statistics (round 9, continuation): the
label-quality tier a training-data pipeline runs over multiply-rated
items — chance-corrected multi-rater agreement (Fleiss' kappa),
reliability of continuous scores (intraclass correlation, one-way
model), and the missing-data-tolerant agreement coefficient
(Krippendorff's alpha). Reference scope: the engine delegates all
processing to its injected pipeline
(PulsarMessageConsumer.java:535-545) — this IS that processing layer.

The rating panel is synthesized from TPC-H: each multi-lineitem ORDER
is an item, its lineitems are the raters, and ``l_returnflag``
(R/A/N) is the categorical verdict — the same shape as N annotators
labeling one document. Every statistic collapses to per-item counts
(one corpus-scale groupBy with map-side combine) followed by a
category-domain aggregate, so nothing scales worse than the item
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table

FLEISS_RATERS = 3  # Fleiss requires a fixed panel size


# --------------------------------------------------------------------------
# Fleiss' kappa (fixed panel of 3 raters per item)
# --------------------------------------------------------------------------
@query(
    "q_fleiss_kappa",
    oracle=f"""
    WITH panel AS (
      SELECT l_orderkey AS item, l_returnflag AS cat
      FROM (
        SELECT l_orderkey, l_returnflag,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_returnflag,
                                           l_extendedprice) AS rater
        FROM lineitem
      ) WHERE rater <= {FLEISS_RATERS}
      QUALIFY count(*) OVER (PARTITION BY item) = {FLEISS_RATERS}
    ),
    cell AS (
      SELECT item, cat, count(*) AS n_ij FROM panel GROUP BY 1, 2
    ),
    per_item AS (
      SELECT item, sum(n_ij * n_ij) AS sq FROM cell GROUP BY 1
    ),
    p_obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             avg((sq - {FLEISS_RATERS})
                 / ({FLEISS_RATERS} * ({FLEISS_RATERS} - 1.0))) AS p_bar
      FROM per_item
    ),
    p_exp AS (
      SELECT sum(pow(CAST(cnt AS DOUBLE) / total, 2)) AS pe_bar
      FROM (SELECT cat, sum(n_ij) AS cnt, sum(sum(n_ij)) OVER () AS total
            FROM cell GROUP BY cat)
    )
    SELECT n_items, round(p_bar, 6) AS p_bar, round(pe_bar, 6) AS pe_bar,
           round((p_bar - pe_bar) / (1 - pe_bar), 6) AS fleiss_kappa
    FROM p_obs, p_exp
    """,
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) over a fixed 3-rater panel: the
    first three lineitems (by linenumber) of every order with at least
    three, each casting its ``l_returnflag`` as the verdict. Per-item
    agreement P_i = (Σ_j n_ij² − k)/(k(k−1)), chance agreement from
    the pooled category marginals, κ = (P̄ − P̄_e)/(1 − P̄_e) — the
    multi-rater generalization of ``q_cohen_kappa``.

    Scale: the rater panel is a per-order window (partitioned by the
    join key — never global), per-item cells are one groupBy, and the
    final reduction is over the 3-category domain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # synthetic lineitem has duplicate linenumbers within an order, so
    # the panel tie-break includes the verdict itself: rows still tied
    # after (linenumber, returnflag, extendedprice) carry the SAME
    # category, so whichever the engine picks the panel's category
    # multiset — the only thing kappa reads — is deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    panel = (
        li.select(
            F.col("l_orderkey").alias("item"),
            F.col("l_returnflag").alias("cat"),
            F.row_number().over(w).alias("rater"),
        )
        .filter(F.col("rater") <= FLEISS_RATERS)
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("item")))
        .filter(F.col("sz") == FLEISS_RATERS)
    )
    cell = panel.groupBy("item", "cat").agg(F.count(F.lit(1)).alias("n_ij"))
    k = float(FLEISS_RATERS)
    per_item = cell.groupBy("item").agg(
        F.sum(F.col("n_ij") * F.col("n_ij")).alias("sq")
    )
    p_obs = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.avg((F.col("sq") - k) / (k * (k - 1.0))).alias("p_bar"),
    )
    marg = cell.groupBy("cat").agg(F.sum("n_ij").alias("cnt"))
    marg = marg.withColumn(
        "total", F.sum("cnt").over(Window.partitionBy())
    )
    p_exp = marg.agg(
        F.sum(F.pow(F.col("cnt").cast("double") / F.col("total"), 2)).alias(
            "pe_bar"
        )
    )
    out = p_obs.crossJoin(F.broadcast(p_exp))
    return out.select(
        "n_items",
        F.round("p_bar", 6).alias("p_bar"),
        F.round("pe_bar", 6).alias("pe_bar"),
        F.round(
            (F.col("p_bar") - F.col("pe_bar")) / (1 - F.col("pe_bar")), 6
        ).alias("fleiss_kappa"),
    )


# --------------------------------------------------------------------------
# Intraclass correlation ICC(1,1), one-way random effects, unbalanced
# --------------------------------------------------------------------------
@query(
    "q_icc_oneway",
    oracle="""
    WITH g AS (
      SELECT l_orderkey,
             count(*) AS n_i,
             sum(l_extendedprice) AS s_i,
             sum(l_extendedprice * l_extendedprice) AS ss_i
      FROM lineitem GROUP BY 1 HAVING count(*) >= 2
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS a,
             CAST(sum(n_i) AS BIGINT) AS n,
             sum(s_i) AS s, sum(ss_i) AS ss,
             sum(s_i * s_i / n_i) AS sb,
             sum(CAST(n_i AS DOUBLE) * n_i) AS sq_n
      FROM g
    ),
    ms AS (
      SELECT a, n,
             (sb - s * s / n) / (a - 1) AS msb,
             (ss - sb) / (n - a) AS msw,
             (n - sq_n / n) / (a - 1.0) AS k0
      FROM tot
    )
    SELECT a AS n_groups, n AS n_obs,
           round(msb / 1e6, 6) AS ms_between_m,
           round(msw / 1e6, 6) AS ms_within_m,
           round(k0, 6) AS k0,
           round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
    FROM ms
    """,
)
def q_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation ICC(1,1) (Shrout & Fleiss 1979, one-way
    random-effects model) on lineitem extended prices grouped by order:
    how much of the price variance lives BETWEEN orders vs within one —
    the reliability coefficient for continuous scores the way
    ``q_fleiss_kappa`` is for categorical verdicts. Unbalanced groups
    use the standard k₀ = (N − Σn_i²/N)/(a−1) average group size.

    Scale: per-group (count, sum, sum-of-squares) is one
    map-side-combined groupBy; MSB/MSW come from the sufficient
    statistics in a single final aggregate — no second pass, no
    centering join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum("l_extendedprice").alias("s_i"),
            F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias(
                "ss_i"
            ),
        )
        .filter(F.col("n_i") >= 2)
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("a"),
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").alias("s"),
        F.sum("ss_i").alias("ss"),
        F.sum(F.col("s_i") * F.col("s_i") / F.col("n_i")).alias("sb"),
        F.sum(F.col("n_i").cast("double") * F.col("n_i")).alias("sq_n"),
    )
    msb = (F.col("sb") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("a") - 1
    )
    msw = (F.col("ss") - F.col("sb")) / (F.col("n") - F.col("a"))
    k0 = (F.col("n") - F.col("sq_n") / F.col("n")) / (F.col("a") - 1.0)
    return tot.select(
        F.col("a").alias("n_groups"),
        F.col("n").alias("n_obs"),
        # mean squares reported in MILLIONS: the raw ~1e8 dollar^2
        # values sit on the engines' double-accumulation noise floor
        # (~1e-4 absolute); scaled, that noise is ~1e-10 — four orders
        # below the 6dp rounding grid.
        F.round(msb / 1e6, 6).alias("ms_between_m"),
        F.round(msw / 1e6, 6).alias("ms_within_m"),
        F.round(k0, 6).alias("k0"),
        F.round((msb - msw) / (msb + (k0 - 1) * msw), 6).alias("icc1"),
    )


# --------------------------------------------------------------------------
# Krippendorff's alpha (nominal metric, variable raters per unit)
# --------------------------------------------------------------------------
@query(
    "q_krippendorff_alpha",
    oracle="""
    WITH ratings AS (
      SELECT l_orderkey AS unit, l_returnflag AS cat FROM lineitem
      QUALIFY count(*) OVER (PARTITION BY unit) >= 2
    ),
    cell AS (
      SELECT unit, cat, count(*) AS n_uc,
             sum(count(*)) OVER (PARTITION BY unit) AS m_u
      FROM ratings GROUP BY 1, 2
    ),
    -- o_diag = Σ_u Σ_c n_uc(n_uc-1)/(m_u-1): group the EXACT integer
    -- numerators by m_u (a tiny domain — lineitems per order), divide
    -- once per group, and fold the ≤|m domain| quotients in sorted
    -- order — deterministic across engines at any scale. The naive
    -- per-cell float sum diverged by 1e-6 at sf1.0 (1.5M addends,
    -- summation-order drift; round-11 second-decade parity audit).
    agree_m AS (
      SELECT m_u, CAST(sum(n_uc * (n_uc - 1)) AS BIGINT) AS num
      FROM cell GROUP BY m_u
    ),
    agree AS (
      SELECT list_reduce(
               list(CAST(num AS DOUBLE) / (m_u - 1) ORDER BY m_u),
               (a, b) -> a + b) AS o_diag
      FROM agree_m
    ),
    marg AS (
      SELECT sum(pow(CAST(cnt AS DOUBLE), 2)) AS sum_sq,
             CAST(sum(cnt) AS BIGINT) AS n
      FROM (SELECT cat, sum(n_uc) AS cnt FROM cell GROUP BY cat)
    )
    SELECT n AS n_ratings,
           round(n - o_diag, 6) AS d_obs,
           round((n * n - sum_sq) / (n - 1.0), 6) AS d_exp,
           round(1 - (n - o_diag) / ((n * n - sum_sq) / (n - 1.0)), 6)
             AS kripp_alpha
    FROM agree, marg
    """,
)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (Krippendorff 2004, nominal metric) over
    the SAME verdicts as ``q_fleiss_kappa`` but without its fixed-panel
    restriction: every order with ≥2 lineitems contributes, whatever
    its rater count — the agreement coefficient of record when
    annotator coverage is ragged. Disagreement is pairwise within
    units: D_o = n − Σ_u Σ_c n_uc(n_uc−1)/(m_u−1), expected
    disagreement from the pooled marginals D_e = (n² − Σ_c n_c²)/(n−1),
    α = 1 − D_o/D_e.

    Scale: one per-(unit, category) rollup (groupBy with a unit-
    partitioned window for m_u), then two aggregates over it; the
    marginal reduction is over the 3-category domain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ratings = li.select(
        F.col("l_orderkey").alias("unit"), F.col("l_returnflag").alias("cat")
    ).withColumn("m_u_all", F.count(F.lit(1)).over(Window.partitionBy("unit")))
    ratings = ratings.filter(F.col("m_u_all") >= 2)
    cell = ratings.groupBy("unit", "cat").agg(
        F.count(F.lit(1)).alias("n_uc")
    )
    cell = cell.withColumn(
        "m_u", F.sum("n_uc").over(Window.partitionBy("unit"))
    )
    # exact integer numerators grouped by the tiny m_u domain, one
    # division per group, sorted fold — deterministic at any scale
    # (the per-cell float sum diverged by 1e-6 at sf1.0; see oracle)
    agree = (
        cell.groupBy("m_u")
        .agg(
            F.sum(F.col("n_uc") * (F.col("n_uc") - 1))
            .cast("long")
            .alias("num")
        )
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(m_u, num)))"
                ", s -> CAST(s.num AS DOUBLE) / (s.m_u - 1)), 0D, (a, x) -> a + x)"
            ).alias("o_diag")
        )
    )
    marg = (
        cell.groupBy("cat")
        .agg(F.sum("n_uc").alias("cnt"))
        .agg(
            F.sum(F.pow(F.col("cnt").cast("double"), 2)).alias("sum_sq"),
            F.sum("cnt").cast("long").alias("n"),
        )
    )
    out = agree.crossJoin(F.broadcast(marg))
    d_obs = F.col("n") - F.col("o_diag")
    d_exp = (F.col("n") * F.col("n") - F.col("sum_sq")) / (F.col("n") - 1.0)
    return out.select(
        F.col("n").alias("n_ratings"),
        F.round(d_obs, 6).alias("d_obs"),
        F.round(d_exp, 6).alias("d_exp"),
        F.round(1 - d_obs / d_exp, 6).alias("kripp_alpha"),
    )


# --------------------------------------------------------------------------
# Gwet's AC1 (paradox-resistant chance correction, same Fleiss panel)
# --------------------------------------------------------------------------
@query(
    "q_gwet_ac1",
    oracle=f"""
    WITH panel AS (
      SELECT l_orderkey AS item, l_returnflag AS cat
      FROM (
        SELECT l_orderkey, l_returnflag,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_returnflag,
                                           l_extendedprice) AS rater
        FROM lineitem
      ) WHERE rater <= {FLEISS_RATERS}
      QUALIFY count(*) OVER (PARTITION BY item) = {FLEISS_RATERS}
    ),
    cell AS (
      SELECT item, cat, count(*) AS n_ij FROM panel GROUP BY 1, 2
    ),
    p_obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             avg((sq - {FLEISS_RATERS})
                 / ({FLEISS_RATERS} * ({FLEISS_RATERS} - 1.0))) AS p_a
      FROM (SELECT item, sum(n_ij * n_ij) AS sq FROM cell GROUP BY 1)
    ),
    pi AS (
      SELECT cat,
             sum(n_ij) / ({FLEISS_RATERS}
               * (SELECT CAST(n_items AS DOUBLE) FROM p_obs)) AS pi_c
      FROM cell GROUP BY cat
    ),
    p_exp AS (
      SELECT sum(pi_c * (1 - pi_c)) / (count(*) - 1.0) AS p_e,
             CAST(count(*) AS BIGINT) AS n_cats
      FROM pi
    )
    SELECT n_items, n_cats,
           round(p_a, 6) AS p_a, round(p_e, 6) AS p_e_ac1,
           round((p_a - p_e) / (1 - p_e), 6) AS gwet_ac1
    FROM p_obs, p_exp
    """,
)
def q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 (Gwet 2008) over the identical 3-rater panel as
    ``q_fleiss_kappa`` — the chance correction that fixes the kappa
    PARADOX: when one category dominates, Fleiss' P̄_e ≈ 1 and kappa
    collapses toward 0 despite near-perfect raw agreement; AC1's
    chance term Σπ_c(1−π_c)/(C−1) instead models only ACCIDENTAL
    agreement and stays calibrated. Publishing both (same P_a, two
    corrections) is the recommended practice for skewed label
    distributions — exactly what dominant-class training labels are.

    Scale: identical shape to ``q_fleiss_kappa`` — per-order panel
    window, per-item cells, category-domain reduction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    panel = (
        li.select(
            F.col("l_orderkey").alias("item"),
            F.col("l_returnflag").alias("cat"),
            F.row_number().over(w).alias("rater"),
        )
        .filter(F.col("rater") <= FLEISS_RATERS)
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("item")))
        .filter(F.col("sz") == FLEISS_RATERS)
    )
    cell = panel.groupBy("item", "cat").agg(F.count(F.lit(1)).alias("n_ij"))
    k = float(FLEISS_RATERS)
    p_obs = (
        cell.groupBy("item")
        .agg(F.sum(F.col("n_ij") * F.col("n_ij")).alias("sq"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.avg((F.col("sq") - k) / (k * (k - 1.0))).alias("p_a"),
        )
    )
    pi = (
        cell.groupBy("cat")
        .agg(F.sum("n_ij").alias("cnt"))
        .crossJoin(F.broadcast(p_obs.select("n_items")))
        .select(
            (
                F.col("cnt") / (k * F.col("n_items").cast("double"))
            ).alias("pi_c")
        )
    )
    p_exp = pi.agg(
        (
            F.sum(F.col("pi_c") * (1 - F.col("pi_c")))
            / (F.count(F.lit(1)) - 1.0)
        ).alias("p_e"),
        F.count(F.lit(1)).cast("long").alias("n_cats"),
    )
    out = p_obs.crossJoin(F.broadcast(p_exp))
    return out.select(
        "n_items",
        "n_cats",
        F.round("p_a", 6).alias("p_a"),
        F.round("p_e", 6).alias("p_e_ac1"),
        F.round((F.col("p_a") - F.col("p_e")) / (1 - F.col("p_e")), 6).alias(
            "gwet_ac1"
        ),
    )


# --------------------------------------------------------------------------
# Quadratic-weighted Cohen's kappa (ordinal agreement)
# --------------------------------------------------------------------------
QWK_BANDS = 5


@query(
    "q_weighted_kappa",
    oracle=f"""
    WITH pairs AS (
      SELECT item, max(CASE WHEN rater = 1 THEN band END) AS b1,
             max(CASE WHEN rater = 2 THEN band END) AS b2
      FROM (
        SELECT l_orderkey AS item,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_quantity,
                                           l_extendedprice, l_partkey)
                 AS rater,
               least(CAST(l_quantity AS BIGINT) * {QWK_BANDS} // 50 + 1,
                     {QWK_BANDS}) AS band
        FROM lineitem
      ) WHERE rater <= 2
      GROUP BY item HAVING count(*) = 2
    ),
    cell AS (
      SELECT b1, b2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cell),
    m1 AS (SELECT b1, sum(c) AS c1 FROM cell GROUP BY b1),
    m2 AS (SELECT b2, sum(c) AS c2 FROM cell GROUP BY b2),
    o AS (
      SELECT sum(c * pow(b1 - b2, 2)) / (SELECT n FROM tot) AS d_obs
      FROM cell
    ),
    e AS (
      SELECT sum(CAST(m1.c1 AS DOUBLE) * m2.c2 * pow(m1.b1 - m2.b2, 2))
             / ((SELECT n FROM tot) * (SELECT n FROM tot)) AS d_exp
      FROM m1 CROSS JOIN m2
    )
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_items,
           round((SELECT d_obs FROM o), 6) AS d_obs,
           round((SELECT d_exp FROM e), 6) AS d_exp,
           round(1 - (SELECT d_obs FROM o) / (SELECT d_exp FROM e), 6)
             AS weighted_kappa
    FROM tot
    """,
)
def q_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted Cohen's kappa (Cohen 1968) on an ORDINAL
    scale: the first two lineitems of every 2+-item order rate it
    with a quantity band (1..{QWK_BANDS}), and disagreement is
    penalized by the SQUARED band distance — off-by-one costs 1,
    off-by-four costs 16 — the agreement coefficient for graded
    labels (quality tiers, star ratings, toxicity severity) where
    plain kappa (``q_cohen_kappa``) treats near-misses as total
    misses. κ_w = 1 − D_obs/D_exp with expected disagreement from the
    marginal products.

    Scale: per-order rater panel (partitioned window), cell counts
    over the {QWK_BANDS}×{QWK_BANDS} grid, and the expectation is a
    marginal×marginal cross join on that grid — nothing leaves the
    band domain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    band = F.least(
        (F.col("l_quantity").cast("long") * QWK_BANDS / F.lit(50)).cast(
            "long"
        )
        + 1,
        F.lit(QWK_BANDS),
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey"
    )
    rated = li.select(
        F.col("l_orderkey").alias("item"),
        F.row_number().over(w).alias("rater"),
        band.alias("band"),
    ).filter(F.col("rater") <= 2)
    pairs = (
        rated.groupBy("item")
        .agg(
            F.max(F.when(F.col("rater") == 1, F.col("band"))).alias("b1"),
            F.max(F.when(F.col("rater") == 2, F.col("band"))).alias("b2"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == 2)
    )
    cell = pairs.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("c"))
    tot = cell.agg(F.sum("c").alias("n"))
    o = cell.crossJoin(F.broadcast(tot)).agg(
        (
            F.sum(F.col("c") * F.pow(F.col("b1") - F.col("b2"), 2))
            / F.max("n")
        ).alias("d_obs")
    )
    m1 = cell.groupBy("b1").agg(F.sum("c").alias("c1"))
    m2 = cell.groupBy("b2").agg(F.sum("c").alias("c2"))
    e_ = (
        m1.crossJoin(m2)
        .crossJoin(F.broadcast(tot))
        .agg(
            (
                F.sum(
                    F.col("c1").cast("double")
                    * F.col("c2")
                    * F.pow(F.col("b1") - F.col("b2"), 2)
                )
                / (F.max("n") * F.max("n"))
            ).alias("d_exp")
        )
    )
    out = tot.crossJoin(F.broadcast(o)).crossJoin(F.broadcast(e_))
    return out.select(
        F.col("n").cast("long").alias("n_items"),
        F.round(F.col("d_obs"), 6).alias("d_obs"),
        F.round(F.col("d_exp"), 6).alias("d_exp"),
        F.round(1 - F.col("d_obs") / F.col("d_exp"), 6).alias(
            "weighted_kappa"
        ),
    )
