"""Statistical & advanced aggregates (SURVEY.md §2B aggregation row):
stddev/variance, correlation/covariance, exact percentiles/median,
ordered string aggregation, count_if/bool aggregates, min_by/max_by,
GROUPING SETS, and struct/map construction.

All built-in JVM aggregates — partial aggregation applies everywhere,
so each is one shuffle of (group, sketch/accumulator), never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table
from ..plans.iterate import eager_checkpoint


@query(
    "q_agg_stats",
    oracle="""
    SELECT c_mktsegment,
           round(stddev_samp(c_acctbal), 6) AS bal_stddev,
           round(var_samp(c_acctbal), 6)    AS bal_var,
           round(min(c_acctbal), 2)         AS bal_min,
           round(max(c_acctbal), 2)         AS bal_max
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / variance per segment (Welford-style partials)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.stddev_samp("c_acctbal"), 6).alias("bal_stddev"),
            F.round(F.var_samp("c_acctbal"), 6).alias("bal_var"),
            F.round(F.min("c_acctbal"), 2).alias("bal_min"),
            F.round(F.max("c_acctbal"), 2).alias("bal_max"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(median(o_totalprice), 4)              AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≙ DuckDB
    ``quantile_cont``). Scale: exact percentile shuffles the values per
    group; for 100 TB use approx_percentile (t-digest sketch, O(1)
    memory) — same call shape, bounded error.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_string_collect",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def q_agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list → array_sort →
    array_join (deterministic regardless of partition arrival order —
    an unsorted listagg would be nondeterministic under parallelism)."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 50) AS BIGINT)      AS n_big,
           bool_and(value >= 0)                      AS all_nonneg,
           bool_or(value > 99)                       AS any_huge,
           round(avg(CASE WHEN value > 50 THEN value END), 4) AS avg_big
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or / FILTER-style conditional avg."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 50).alias("n_big"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 99).alias("any_huge"),
            F.round(F.avg(F.when(F.col("value") > 50, F.col("value"))), 4).alias("avg_big"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_min_max_by",
    oracle="""
    SELECT c_mktsegment,
           min_by(c_name, c_acctbal) AS poorest,
           max_by(c_name, c_acctbal) AS richest
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by — argmin/argmax without a window sort.

    Scale: one shuffle carrying (key, extremum-so-far) — the partial
    aggregate keeps a single candidate per group per partition, unlike
    the row_number() formulation which sorts whole groups.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.min_by("c_name", "c_acctbal").alias("poorest"),
            F.max_by("c_name", "c_acctbal").alias("richest"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-status,
    per-priority, and grand total in one pass (Expand node — one
    shuffle for all three groupings)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query(
    "q_struct_map_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)     AS k_val,
           event_type || ':' || CAST(user_id AS VARCHAR)   AS type_user,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
)
def q_struct_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction + field access: build a struct and a map
    in-flight, read fields back out (nested-type surface, §1.4 —
    the relational improvement over the reference's OM document tree)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    enriched = e.select(
        "event_id",
        F.struct(
            F.from_json("props", "k INT").getField("k").alias("k"),
            F.col("event_type").alias("et"),
        ).alias("s"),
        F.create_map(F.lit("uid"), F.col("user_id").cast("string")).alias("m"),
        "event_type",
        "user_id",
    )
    return (
        enriched.select(
            "event_id",
            F.col("s.k").alias("k_val"),
            F.concat_ws(":", "event_type", F.col("m")["uid"]).alias("type_user"),
            (F.col("s.k") * 2).alias("k_doubled"),
        )
        .orderBy("event_id")
    )


@query(
    "q_agg_approx_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(median(o_totalprice), 4) AS exact_p50,
           true AS p50_ok,
           true AS p90_ok,
           true AS p99_ok
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles — the 100 TB percentile path.

    ``approx_percentile`` aggregates a bounded-memory quantile sketch
    (merge-able across partitions: map-side partial, no value shuffle),
    unlike exact ``percentile`` which shuffles every value per group.
    Sketch outputs are engine-specific, so the query emits a *bounded*
    oracle form: the exact median plus booleans asserting each sketch
    quantile is within 5% relative error of its exact twin — all
    deterministic, hence driver-hashable. tests/test_approx.py gates
    the same tolerance.
    """
    o = load_table(spark, sf_dir, "orders")

    def ok(approx: str, exact: str):
        return F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.abs(F.col(exact))

    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("a90"),
            F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("a99"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("e50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("e90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("e99"),
        )
        .select(
            "o_orderpriority",
            F.round("e50", 4).alias("exact_p50"),
            ok("a50", "e50").alias("p50_ok"),
            ok("a90", "e90").alias("p90_ok"),
            ok("a99", "e99").alias("p99_ok"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           regr_count(l_extendedprice, l_quantity)               AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/R²/count) per
    return flag — single-pass distributive moments, map-side partial."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_histogram",
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 50), 9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY event_type, least(floor(value / 50), 9)
    ORDER BY event_type, bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group: 10 buckets of width 50 with a
    top catch-all — the distribution profile an engine computes before
    choosing skew mitigations or clipping thresholds.

    Bucket assignment is row-local arithmetic (exact: bucket
    boundaries are binary-representable), so the plan is a plain
    two-key partial aggregate — no sort, no window, one shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "q_bitwise_agg",
    oracle="""
    SELECT event_type,
           CAST(bit_and(event_id) AS BIGINT) AS ids_and,
           CAST(bit_or(event_id)  AS BIGINT) AS ids_or,
           CAST(bit_xor(event_id) AS BIGINT) AS ids_xor
    FROM events WHERE event_id < 4096
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — commutative/associative, so they
    partial-aggregate map-side and are order-independent across any
    partitioning (XOR-folding ids is also the cheap set-digest trick
    for reconciliation checks between pipelines)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 4096)
    return (
        e.groupBy("event_type")
        .agg(
            F.bit_and("event_id").alias("ids_and"),
            F.bit_or("event_id").alias("ids_or"),
            F.bit_xor("event_id").alias("ids_xor"),
        )
        .orderBy("event_type")
    )


@query(
    "q_salted_exact_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS total_micro
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_salted_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact COUNT(DISTINCT) via two-phase expansion: first
    dedupe on the *compound* key ``(event_type, user_id)`` — whose
    cardinality spreads a hot group across the whole cluster — then
    count per group. A direct ``count_distinct`` over a skewed group
    key funnels every row of the hot group through one reducer with an
    in-memory distinct set; the expanded form is two hash aggregates,
    both map-side combinable, with no per-group state larger than a
    counter. The companion metric rides the same shape: the exact
    integer sum is re-aggregated from the dedupe stage's partial sums.

    This is Catalyst's own ``Expand``-based distinct rewrite made
    explicit — stated here as the pattern to reach for when a group
    key is hot enough that even the rewrite's first shuffle skews
    (then: salt the first groupBy with ``pmod(hash(user_id), P)``,
    which composes with this plan without changing results).
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    # phase 1: shuffle on the high-cardinality compound key
    per_user = e.groupBy("event_type", "user_id").agg(F.sum(micro).alias("p_sum"))
    # phase 2: tiny per-group rollup
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("p_sum").alias("total_micro"),
        )
        .orderBy("event_type")
    )


@query(
    "q_winsorized_stats",
    oracle="""
    -- quantile_cont's position (n-1)*p is a FLOAT product inside each
    -- engine; when it is mathematically integral, one engine can land
    -- on the exact order statistic and the other interpolate (observed
    -- at sf1.0, round-11 audit). Same definition, exact integer rank
    -- arithmetic: k = ((n-1)*p_num) // p_den, weight = remainder/p_den.
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    b AS (
      SELECT event_type,
             max(CASE WHEN rn = (n - 1) // 100 + 1 THEN value END)
               * (1 - max((n - 1) % 100) / 100.0)
             + max(CASE WHEN rn = least((n - 1) // 100 + 2, n) THEN value END)
               * (max((n - 1) % 100) / 100.0) AS p01,
             max(CASE WHEN rn = ((n - 1) * 99) // 100 + 1 THEN value END)
               * (1 - max(((n - 1) * 99) % 100) / 100.0)
             + max(CASE WHEN rn = least(((n - 1) * 99) // 100 + 2, n) THEN value END)
               * (max(((n - 1) * 99) % 100) / 100.0) AS p99
      FROM ranked GROUP BY event_type
    ),
    c AS (
      SELECT e.event_type,
             CAST(round(least(greatest(e.value, b.p01), b.p99) * 1000000, 0) AS BIGINT)
               AS wmicro,
             CASE WHEN e.value < b.p01 OR e.value > b.p99 THEN 1 ELSE 0 END AS clipped
      FROM events e JOIN b USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)     AS n_events,
           CAST(sum(clipped) AS BIGINT) AS n_clipped,
           CAST(sum(wmicro) AS BIGINT)  AS total_micro,
           round(sum(wmicro) * 1.0 / count(*), 6) AS avg_micro,
           CAST(min(wmicro) AS BIGINT)  AS min_micro,
           CAST(max(wmicro) AS BIGINT)  AS max_micro
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clipped) robust statistics per group — the
    outlier-tolerant aggregation a metrics pipeline runs when raw
    means are hostage to a few extreme values.

    Two passes sharing one grouping: pass 1 computes the exact clip
    bounds (Spark ``percentile`` ≙ DuckDB ``quantile_cont``), pass 2
    re-joins them (broadcast — one row per group) and aggregates the
    clipped values. Clipped values go through the exact integer
    micro-unit form so the sums are engine-order-independent. At
    100 TB, swap pass 1 to ``approx_percentile`` (t-digest) and the
    plan shape is unchanged — bounds stay a broadcast dimension.
    """
    e = load_table(spark, sf_dir, "events")
    # exact integer rank arithmetic for the quantile positions — same
    # quantile_cont definition, no float (n-1)*p product (see oracle)
    ranked = e.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )

    def qc(num: int) -> F.Column:
        k = F.expr(f"((n - 1) * {num}) div 100")
        r = F.max(F.expr(f"((n - 1) * {num}) % 100"))  # constant per group
        lo = F.max(F.when(F.col("rn") == k + 1, F.col("value")))
        hi = F.max(
            F.when(F.col("rn") == F.least(k + 2, F.col("n")), F.col("value"))
        )
        return lo * (1 - r / 100.0) + hi * (r / 100.0)

    bounds = ranked.groupBy("event_type").agg(
        qc(1).alias("p01"), qc(99).alias("p99")
    )
    w = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    wmicro = F.round(w * 1000000, 0).cast("long")
    clipped = F.when((F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99")), 1).otherwise(0)
    return (
        e.join(F.broadcast(bounds), "event_type")
        .select("event_type", wmicro.alias("wmicro"), clipped.alias("clipped"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("clipped").alias("n_clipped"),
            F.sum("wmicro").alias("total_micro"),
            F.round(F.sum("wmicro") / F.count(F.lit(1)), 6).alias("avg_micro"),
            F.min("wmicro").alias("min_micro"),
            F.max("wmicro").alias("max_micro"),
        )
        .orderBy("event_type")
    )


@query(
    "q_hll_sketch_union",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day FROM events GROUP BY 1, 2
    ),
    days AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1)
    SELECT e.event_type,
           d.n_days,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_users,
           true AS within_5pct
    FROM events e JOIN days d USING (event_type)
    GROUP BY e.event_type, d.n_days
    ORDER BY e.event_type
    """,
)
def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches: build one Datasketches HLL sketch per
    (event_type, day) partial, then ``hll_union_agg`` the partials and
    estimate — the re-aggregatable form of distinct counting that
    ``q_approx_distinct``'s one-shot ``approx_count_distinct`` can't
    give you. This is how a 100 TB pipeline serves "distinct users,
    any date range": daily sketch partials are stored (bytes per
    group-day), and any rollup is a cheap union — no re-scan of raw
    data, the same snapshot+delta algebra as ``q_incremental_rollup``
    but for a non-additive measure.

    Estimates are implementation-specific, so the emitted form is the
    bounded oracle: exact distinct count + a boolean asserting the
    sketch-union landed within 5% (lgConfigK=12 → ~1.6% expected
    error), both deterministic and driver-hashable.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    exact = e.groupBy("event_type").agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "q_robust_zscore_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_type,
           round(m.med, 6) AS med,
           round(m.mad, 6) AS mad,
           CAST(sum(CASE WHEN m.mad > 0
                          AND abs(0.6745 * (e.value - m.med) / m.mad) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type, m.med, m.mad
    ORDER BY e.event_type
    """,
)
def q_robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection per event type (the modified
    z-score, |0.6745·(x−median)/MAD| > 3.5) — unlike the mean/stddev
    z-score, a contaminated tail cannot drag its own threshold.

    Plan: two exact-median passes (each an exact ``percentile``
    aggregate — per-group value sort, the documented exact tier; swap
    approx_percentile at 100 TB without changing shape), the per-group
    medians broadcast back onto the stream, one counting aggregate.

    MAD = 0 (a group where ≥50% of values are identical) is guarded
    explicitly in both engines: Spark's non-ANSI x/0 yields NULL while
    DuckDB's float division yields ±inf, so an unguarded comparison
    would count such rows differently — with the guard, a degenerate
    group reports 0 outliers in both.
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"))
    )
    z = F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"))
    is_outlier = (F.col("mad") > 0) & (z > 3.5)
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(F.sum(F.when(is_outlier, 1).otherwise(0)).cast("long").alias("n_outliers"))
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query(
    "q_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT nationkey, sum(cents) AS t FROM rev GROUP BY nationkey)
    SELECT r.nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum((r.cents * 1.0 / t.t) * (r.cents * 1.0 / t.t)), 6) AS hhi
    FROM rev r JOIN tot t USING (nationkey)
    GROUP BY r.nationkey
    ORDER BY r.nationkey
    """,
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each nation — 1/n for perfectly even markets, →1 as one
    supplier dominates. The market-concentration diagnostic that pairs
    with the Pareto-contribution query.

    Plan: revenue summed in exact integer cents (engine-order-free),
    shares squared only at the final (nation-sized) aggregate; the
    supplier dimension broadcasts onto lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents")
        )
    )
    tot = rev.groupBy("nationkey").agg(F.sum("cents").alias("t"))
    share = F.col("cents") / F.col("t")
    return (
        rev.join(F.broadcast(tot), "nationkey")
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
        .orderBy("nationkey")
    )


@query(
    "q_ab_lift",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    arms AS (
      SELECT arm, count(*) AS n, avg(value) AS mu, var_samp(value) AS v
      FROM assigned GROUP BY arm
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mu, 6) AS mean_a, round(b.mu, 6) AS mean_b,
           round(b.mu - a.mu, 6) AS lift,
           round((b.mu - a.mu) / sqrt(a.v / a.n + b.v / b.n), 6) AS welch_t
    FROM (SELECT * FROM arms WHERE arm = 'A') a,
         (SELECT * FROM arms WHERE arm = 'B') b
    """,
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split 50/50 into arms (the
    same salted-md5 bucketing the train/test splitter uses — stable,
    RNG-free, growth-consistent), purchase-value lift and Welch's
    t-statistic between arms. The experimentation primitive on top of
    the deterministic-assignment machinery.

    Plan: assignment is a row-local projection (no shuffle); one
    two-group aggregate; the t-stat is computed on the two-row result.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = F.when(
        F.substring(F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1)
        < "8",
        "A",
    ).otherwise("B")
    arms = (
        e.select(arm.alias("arm"), "value")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mu"),
            F.var_samp("value").alias("v"),
        )
    )
    a = arms.filter(F.col("arm") == "A").alias("a")
    b = arms.filter(F.col("arm") == "B").alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.mu"), 6).alias("mean_a"),
        F.round(F.col("b.mu"), 6).alias("mean_b"),
        F.round(F.col("b.mu") - F.col("a.mu"), 6).alias("lift"),
        F.round(
            (F.col("b.mu") - F.col("a.mu"))
            / F.sqrt(F.col("a.v") / F.col("a.n") + F.col("b.v") / F.col("b.n")),
            6,
        ).alias("welch_t"),
    )


@query(
    "q_mode_median",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    modal AS (
      SELECT user_id, event_type AS modal_type, CAST(c AS BIGINT) AS modal_count
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY c DESC, event_type
        ) AS rn FROM counts
      ) WHERE rn = 1
    ),
    med AS (
      SELECT user_id, round(median(value), 6) AS median_value,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT m.user_id, modal_type, modal_count, median_value, n_events
    FROM modal m JOIN med USING (user_id)
    ORDER BY user_id
    """,
)
def q_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type and exact median value — the two
    order-statistic aggregates a profiling pass always wants next to
    mean/stddev. Mode is computed EXPLICITLY (count + row_number with
    a lexicographic tie-break) rather than via the built-in ``mode()``,
    whose tie choice is engine-arbitrary — the explicit form is
    deterministic and hash-identical in both engines. Median uses the
    built-in interpolating ``median``: the midpoint average of two
    doubles is the same IEEE operation in both.

    Scale: both aggregates share the user_id shuffle key; the mode
    pre-aggregates to (user × event_type) cardinality before its
    window, so nothing row-sized crosses the second exchange. Exact
    median needs the per-group sort — the documented swap at 100 TB is
    approx_percentile(0.5) with identical plan shape.
    """
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("event_type"))
    modal = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("c").alias("modal_count"),
        )
    )
    med = e.groupBy("user_id").agg(
        F.round(F.median("value"), 6).alias("median_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return modal.join(med, "user_id").orderBy("user_id")


# --------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency estimation)
# --------------------------------------------------------------------------
CMS_DEPTH = 4


@query(
    "q_countmin_sketch",
    oracle=f"""
    WITH cnt AS (
      SELECT r.d AS row,
             substr(md5(concat(CAST(r.d AS VARCHAR), '_',
                               CAST(user_id AS VARCHAR))), r.d+1, 1) AS bucket,
             count(*) AS c
      FROM events, unnest(range(0, {CMS_DEPTH})) AS r(d)
      GROUP BY 1, 2
    ),
    probe AS (SELECT user_id, count(*) AS exact_count FROM events
              WHERE user_id < 100 GROUP BY user_id),
    est AS (
      SELECT p.user_id, min(c.c) AS est
      FROM probe p
      CROSS JOIN unnest(range(0, {CMS_DEPTH})) AS r(d)
      JOIN cnt c
        ON c.row = r.d
       AND c.bucket = substr(md5(concat(CAST(r.d AS VARCHAR), '_',
                                        CAST(p.user_id AS VARCHAR))), r.d+1, 1)
      GROUP BY p.user_id
    )
    SELECT e.user_id, CAST(e.est AS BIGINT) AS cms_estimate,
           CAST(p.exact_count AS BIGINT) AS exact_count
    FROM est e JOIN probe p USING (user_id)
    ORDER BY user_id
    """,
)
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over per-user event counts: 4 hash rows keyed
    by successive hex nibbles of one md5, counters = groupBy on
    (row, bucket), point estimate = min over the 4 rows' counters.
    The sketch is deterministic (hash-derived, no RNG), so the DuckDB
    twin reproduces it cell-for-cell; ``exact_count`` rides along so
    the one-sided error (estimate >= truth, never under) is visible in
    the result itself and pytest-asserted.

    The width is deliberately undersized (16 buckets/row) at test SF
    so collisions actually occur; width is the accuracy knob
    (eps = e/width), depth the confidence knob.

    Scale: THE mergeable-state pattern — the counter table is
    depth x width cells regardless of input size, built by one
    map-side-combining groupBy over an explode(depth) of the stream.
    Probes broadcast against the tiny counter table. The same cells
    merge across partitions, days, or streaming micro-batches by
    addition, which is why CMS (not exact counts) is what a 100 TB
    ingest keeps per time-bucket.
    """
    e = load_table(spark, sf_dir, "events")
    rows = e.select("user_id", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"))
    bucket = F.substring(
        F.md5(F.concat_ws("_", F.col("d"), F.col("user_id")).cast("binary")),
        F.col("d") + 1,
        1,
    )
    cnt = rows.groupBy("d", bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("c"))
    probe = (
        e.filter(F.col("user_id") < 100)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probed = probe.select(
        "user_id",
        "exact_count",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat_ws("_", F.col("d"), F.col("user_id")).cast("binary")),
            F.col("d") + 1,
            1,
        ),
    )
    return (
        probed.join(F.broadcast(cnt), ["d", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select("user_id", "cms_estimate", "exact_count")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# k-anonymity audit (privacy QA before dataset release)
# --------------------------------------------------------------------------
K_ANON_THRESHOLD = 5


@query(
    "q_k_anonymity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) >= {K_ANON_THRESHOLD} AS k_anonymous,
           round(1.0 / count(*), 6) AS reident_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the quasi-identifier pair
    (nation, market segment): every equivalence class's size, whether
    it meets k={K_ANON_THRESHOLD}, and the worst-case re-identification
    risk 1/size — the privacy gate a dataset-release pipeline runs
    before publishing (pairs with ``q_pii_redaction``/``q_pseudonymize``:
    those scrub direct identifiers, this audits the quasi-identifiers
    that remain).

    Scale: one groupBy whose key space is the quasi-identifier domain
    (tiny by definition — if it weren't, the data would be k-anonymous
    trivially); map-side partial agg collapses everything early.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") >= K_ANON_THRESHOLD).alias("k_anonymous"),
            F.round(1.0 / F.col("class_size"), 6).alias("reident_risk"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# Benford first-digit conformance (fraud / data-quality screen)
# --------------------------------------------------------------------------
@query(
    "q_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
    SELECT digit, n_obs,
           round(n_obs * 1.0 / n, 6) AS obs_freq,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_freq,
           round(pow(n_obs - n * log10(1.0 + 1.0 / digit), 2)
                 / (n * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
    FROM obs, tot
    ORDER BY digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit conformance of order totals: observed
    vs expected log10(1+1/d) frequency per leading digit plus the
    per-digit chi-square term — the classic screen for fabricated or
    truncated numeric columns in incoming data (sum the chi2 terms and
    compare against the chi-square(8) critical value downstream).

    Determinism note: the leading digit comes from
    ``substr(cast(floor(x) as bigint))``, not ``floor(log10 x)`` —
    float log10 at exact powers of ten can land a hair below the
    integer and misbin the digit; string extraction of the explicitly
    floored integer cannot (Spark's decimal→bigint cast ROUNDS, so the
    floor() is load-bearing on the Spark side too).

    Scale: 9-row groupBy with map-side combine; the scalar total rides
    a broadcast cross join.
    """
    # >= 1, not > 0: the floor/substr extraction reads the INTEGER part,
    # so (0,1) values would all misbin to digit 0 (and 1/digit would
    # divide by zero) — Benford's first-significant-digit domain for
    # sub-unit values needs a scale-up pass first
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    exp_freq = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / F.col("n"), 6).alias("obs_freq"),
            F.round(exp_freq, 6).alias("benford_freq"),
            F.round(
                F.pow(F.col("n_obs") - F.col("n") * exp_freq, 2)
                / (F.col("n") * exp_freq),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# Gini coefficient (inequality of customer spend)
# --------------------------------------------------------------------------
@query(
    "q_gini_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i
      FROM spend
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(2.0 * sum(i * cents) / (count(*) * sum(cents))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    """,
)
def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend — the inequality summary
    (0 = equal, →1 = concentrated) that pairs with ``q_supplier_hhi``
    and ``q_pareto_contribution`` in the revenue-concentration family.
    Formula: G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending-sorted x.

    Scale: the rank is the **two-phase distributed global rank**
    (`plans/ranking.py`: range-shuffle + broadcast per-partition
    offsets), never a single-partition window; spend is exact integer
    cents so Σ(i·x_i) and Σx are exact longs — the only float is the
    final division, rounded to 6dp on both sides.
    """
    from ..plans.ranking import attach_global_order_stats

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    ranked, n = attach_global_order_stats(
        spend, [F.col("cents"), F.col("o_custkey")], rn_col="i"
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("cents")) / (F.count(F.lit(1)) * F.sum("cents"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Weighted median (per-group, exact integer arithmetic)
# --------------------------------------------------------------------------
@query(
    "q_weighted_median",
    oracle="""
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
             CAST(round(l_quantity, 0) AS BIGINT) AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, price_cents, wt,
             sum(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY price_cents, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             sum(wt) OVER (PARTITION BY l_returnflag) AS total_wt
      FROM li
    )
    SELECT l_returnflag,
           CAST(min(total_wt) AS BIGINT) AS total_weight,
           CAST(min(price_cents) AS BIGINT) AS weighted_median_cents
    FROM cum
    WHERE 2 * cw >= total_wt
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative quantity reaches half the group's total —
    the weighted quantile every pricing/inventory rollup wants where a
    plain median over line items would over-weight small orders.

    Exactness: prices and weights become integer cents/units before
    any accumulation; the half-total test is ``2·cum ≥ total`` so no
    division ever happens — both engines agree bit-for-bit. Scale: the
    window partitions by group (per-group sort, no global window);
    at extreme group skew pre-aggregate equal prices first.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_cents"),
        F.round("l_quantity", 0).cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "price_cents",
        F.sum("wt").over(w_cum).alias("cw"),
        F.sum("wt").over(w_all).alias("total_wt"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("total_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("total_wt").alias("total_weight"),
            F.min("price_cents").alias("weighted_median_cents"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Equi-depth histogram (distributed-rank construction)
# --------------------------------------------------------------------------
EQUIDEPTH_BUCKETS = 10


@query(
    "q_equidepth_histogram",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderkey
      FROM orders
    ),
    t AS (
      SELECT cents,
             ntile({EQUIDEPTH_BUCKETS}) OVER (ORDER BY cents, o_orderkey)
               AS bucket
      FROM v
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM t GROUP BY bucket ORDER BY bucket
    """,
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals ({EQUIDEPTH_BUCKETS}
    buckets of equal row count, ANSI ntile semantics) — the histogram
    an optimizer's statistics collector and any skew-aware range
    partitioner actually wants (the equi-WIDTH twin is
    ``q_histogram``; equal-width buckets go empty under skew, equal-
    depth buckets track the mass).

    Scale: bucket assignment is the two-phase distributed global rank
    (`plans/ranking.py`) + the closed-form ntile — never a
    single-partition window; values are exact integer cents.
    """
    from ..plans.ranking import attach_global_order_stats, ntile_from_rn

    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked, total = attach_global_order_stats(
        o, [F.col("cents"), F.col("o_orderkey")], rn_col="rn"
    )
    return (
        ranked.select(
            "cents", ntile_from_rn(F.col("rn"), total, EQUIDEPTH_BUCKETS).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Count-Min top-k audit (sketch-accuracy governance, cf. q_lsh_recall_audit)
# --------------------------------------------------------------------------
CMS_TOPK = 10


@query(
    "q_cms_topk_audit",
    oracle=f"""
    WITH cnt AS (
      SELECT r.d AS row,
             substr(md5(concat(CAST(r.d AS VARCHAR), '_',
                               CAST(user_id AS VARCHAR))), r.d+1, 1) AS bucket,
             count(*) AS c
      FROM events, unnest(range(0, {CMS_DEPTH})) AS r(d)
      GROUP BY 1, 2
    ),
    exact AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id),
    est AS (
      SELECT e.user_id, e.exact_count, min(c.c) AS est
      FROM exact e
      CROSS JOIN unnest(range(0, {CMS_DEPTH})) AS r(d)
      JOIN cnt c
        ON c.row = r.d
       AND c.bucket = substr(md5(concat(CAST(r.d AS VARCHAR), '_',
                                        CAST(e.user_id AS VARCHAR))), r.d+1, 1)
      GROUP BY e.user_id, e.exact_count
    ),
    top_exact AS (
      SELECT user_id, exact_count, est FROM est
      ORDER BY exact_count DESC, user_id LIMIT {CMS_TOPK}
    ),
    top_est AS (
      SELECT user_id FROM est ORDER BY est DESC, user_id LIMIT {CMS_TOPK}
    )
    SELECT CAST({CMS_TOPK} AS BIGINT) AS k,
           CAST((SELECT count(*) FROM top_exact JOIN top_est USING (user_id))
             AS BIGINT) AS n_overlap,
           CAST((SELECT max(est - exact_count) FROM top_exact) AS BIGINT)
             AS max_overestimate_topk,
           CAST((SELECT min(est - exact_count) FROM top_exact) AS BIGINT)
             AS min_overestimate_topk
    """,
)
def q_cms_topk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter governance audit for the Count-Min sketch: does the
    sketch's top-{CMS_TOPK} agree with the exact top-{CMS_TOPK}, and
    how big is the (one-sided) overestimate among the true heavy
    hitters? The sketch-accuracy twin of ``q_lsh_recall_audit`` —
    both engines REALLY build the sketch and really rank by it, so a
    width/depth retune that degrades heavy-hitter fidelity fails the
    hash instead of shipping.

    Scale: the counter table is depth x width cells regardless of
    input; both rankings are TakeOrdered over the per-user table.
    """
    e = load_table(spark, sf_dir, "events")
    rows = e.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    )
    bucket = F.substring(
        F.md5(F.concat_ws("_", F.col("d"), F.col("user_id")).cast("binary")),
        F.col("d") + 1,
        1,
    )
    cnt = rows.groupBy("d", bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("c"))
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    probed = exact.select(
        "user_id",
        "exact_count",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat_ws("_", F.col("d"), F.col("user_id")).cast("binary")),
            F.col("d") + 1,
            1,
        ),
    )
    est = (
        probed.join(F.broadcast(cnt), ["d", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("est"))
    )
    top_exact = est.orderBy(F.desc("exact_count"), "user_id").limit(CMS_TOPK)
    top_est = est.orderBy(F.desc("est"), "user_id").limit(CMS_TOPK).select("user_id")
    overlap = top_exact.join(top_est, "user_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    spread = top_exact.agg(
        F.max(F.col("est") - F.col("exact_count")).alias("max_overestimate_topk"),
        F.min(F.col("est") - F.col("exact_count")).alias("min_overestimate_topk"),
    )
    return (
        est.sparkSession.range(1)
        .select(F.lit(CMS_TOPK).cast("long").alias("k"))
        .crossJoin(F.broadcast(overlap))
        .crossJoin(F.broadcast(spread))
    )


# --------------------------------------------------------------------------
# HyperLogLog error audit (third member of the sketch-governance family)
# --------------------------------------------------------------------------
@query(
    "q_hll_error_audit",
    oracle="""
    -- bounded-oracle gate (cf. q_lsh_recall_audit / q_cms_topk_audit):
    -- the HLL estimate itself is engine-specific, so the oracle pins
    -- the exact counts and asserts the relative error stays inside the
    -- configured-precision bound; Spark REALLY measures it, and a
    -- precision downgrade that breaks the bound fails the hash.
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS hll_within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_hll_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog accuracy audit per event series: Spark builds the
    lgK=12 HLL sketch, estimates distinct users, and checks the
    relative error against the theoretical ~1.04/sqrt(2^12) ≈ 1.6%
    standard error (gated at 3 sigma ≈ 5%). The estimate itself is
    engine-specific and excluded from hashing; the exact counts and
    the bound verdict are what the oracle pins — the same live-gate
    construction as the LSH recall and CMS top-k audits, completing
    the sketch-governance family (membership/frequency/cardinality).

    Scale: the sketch is the mergeable fixed-size state that replaces
    exact distinct at 100 TB; the exact side here is the audit's
    ground truth, affordable at audit time on a sample or partition.
    """
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"),
    )
    rel_err = F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users")
    return (
        agg.select(
            "event_type",
            "exact_users",
            (rel_err <= 0.05).alias("hll_within_bound"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Mann-Whitney U / Wilcoxon rank-sum (nonparametric A/B readout)
# --------------------------------------------------------------------------
@query(
    "q_mann_whitney",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    vc AS (
      SELECT value,
             count(*) FILTER (WHERE arm = 'A') AS ca,
             count(*) AS c
      FROM assigned GROUP BY value
    ),
    ranked AS (
      SELECT ca, c,
             sum(c) OVER (ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cum_before
      FROM vc
    ),
    s AS (
      SELECT sum(ca) AS n_a, sum(c) - sum(ca) AS n_b, sum(c) AS n,
             sum(ca * (coalesce(cum_before, 0) + (c + 1.0) / 2)) AS r_a,
             sum(CAST(c AS DOUBLE) * c * c - c) AS tie_term
      FROM ranked
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(r_a - n_a * (n_a + 1.0) / 2, 6) AS u_a,
           round((r_a - n_a * (n_a + 1.0) / 2 - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b / 12.0
                        * ((n + 1) - tie_term / (n * (n - 1.0)))), 6) AS z
    FROM s
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the same hash-split
    A/B arms as ``q_ab_lift`` — the nonparametric companion readout:
    no normality assumption, robust to the heavy-tailed purchase
    values Welch's t can be dragged by. Average ranks for ties and the
    tie-corrected normal approximation (the textbook form).

    Scale: ranks are never assigned per row — the corpus collapses to
    the per-DISTINCT-VALUE rollup first, and the average rank of a
    value is its cumulative predecessor count + (c+1)/2 from one
    running sum over that rollup (window input is the value domain,
    not the event stream — the q_zipf_slope waiver class). Every term
    is an integer or half-integer, so the statistic is exact in
    doubles and engine-identical before the final rounding.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    vc = (
        e.select(arm.alias("arm"), "value")
        .groupBy("value")
        .agg(
            F.count_if(F.col("arm") == "A").alias("ca"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    vc = bounded_window_input(vc, label="q_mann_whitney value domain")
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vc.withColumn("cum_before", F.sum("c").over(w))
    s = ranked.agg(
        F.sum("ca").alias("n_a"),
        (F.sum("c") - F.sum("ca")).alias("n_b"),
        F.sum("c").alias("n"),
        F.sum(
            F.col("ca") * (F.coalesce("cum_before", F.lit(0)) + (F.col("c") + 1.0) / 2)
        ).alias("r_a"),
        F.sum(F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")).alias(
            "tie_term"
        ),
    )
    u_a = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1.0) / 2
    z = (u_a - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * ((F.col("n") + 1) - F.col("tie_term") / (F.col("n") * (F.col("n") - 1.0)))
    )
    return s.select(
        "n_a",
        "n_b",
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z"),
    )


# --------------------------------------------------------------------------
# l-diversity (the sensitive-attribute companion of k-anonymity)
# --------------------------------------------------------------------------
L_DIVERSITY_THRESHOLD = 3


@query(
    "q_l_diversity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT CAST(round(c_acctbal * 100, 0) AS BIGINT) // 100000)
             AS BIGINT) AS l_distinct,
           count(DISTINCT CAST(round(c_acctbal * 100, 0) AS BIGINT) // 100000)
             >= {L_DIVERSITY_THRESHOLD} AS l_diverse
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): within every
    quasi-identifier equivalence class (same (nation, segment) pair as
    ``q_k_anonymity``), the SENSITIVE attribute (account-balance band
    in exact integer cents // 100k — a salary-band stand-in) must
    take at least l={L_DIVERSITY_THRESHOLD} distinct values
    — k-anonymity alone does not stop attribute disclosure when a
    class is homogeneous in the sensitive column.

    Scale: one groupBy over the quasi-identifier domain with a
    count_distinct on the sensitive value — at 100 TB swap in
    approx_count_distinct and gate it with the HLL error audit.
    """
    c = load_table(spark, sf_dir, "customer")
    band = (F.round(F.col("c_acctbal") * 100, 0).cast("long") / F.lit(100000)).cast(
        "long"
    )
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(band).alias("l_distinct"),
            (F.count_distinct(band) >= L_DIVERSITY_THRESHOLD).alias("l_diverse"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# Chi-square test of independence (source x lang contingency)
# --------------------------------------------------------------------------
@query(
    "q_chisq_independence",
    oracle="""
    WITH obs AS (
      SELECT source, lang, count(*) AS o FROM documents GROUP BY source, lang
    ),
    margins AS (
      SELECT o.source, o.lang, o.o,
             rs.rn, cs.cn, t.n
      FROM obs o
      JOIN (SELECT source, sum(o) AS rn FROM obs GROUP BY source) rs USING (source)
      JOIN (SELECT lang, sum(o) AS cn FROM obs GROUP BY lang) cs USING (lang)
      CROSS JOIN (SELECT sum(o) AS n FROM obs) t
    ),
    cells AS (
      SELECT CAST(rn * cn AS DOUBLE) / n AS e, o FROM margins
    ),
    dims AS (
      SELECT count(DISTINCT source) AS r, count(DISTINCT lang) AS c FROM obs
    )
    SELECT CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_cells,
           CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
           round((SELECT sum((o - e) * (o - e) / e) FROM cells), 6) AS chi2
    FROM dims
    """,
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence over the source × lang
    contingency table — the balance check a corpus-mixture owner runs
    to see whether language composition differs across sources (the
    categorical complement of ``q_psi_drift``'s numeric drift and
    ``q_unigram_kl_drift``'s token drift). Emits the statistic and
    degrees of freedom; the p-value lookup is a client-side table.

    Scale: the contingency table is |sources| × |langs| rows — the
    corpus collapses in ONE map-side-combined groupBy; margins and the
    statistic are arithmetic over that tiny table. Expected counts
    rn·cn/n are exact-integer products divided once in double.
    """
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    rs = obs.groupBy("source").agg(F.sum("o").alias("rn"))
    cs = obs.groupBy("lang").agg(F.sum("o").alias("cn"))
    t = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(rs, "source")
        .join(cs, "lang")
        .crossJoin(F.broadcast(t))
        .select(
            "o",
            ((F.col("rn") * F.col("cn")).cast("double") / F.col("n")).alias("e"),
        )
    )
    dims = obs.agg(
        F.count_distinct("source").alias("r"), F.count_distinct("lang").alias("c")
    )
    stat = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
    )
    return stat.crossJoin(F.broadcast(dims)).select(
        "n_cells",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        "chi2",
    )


# --------------------------------------------------------------------------
# Wilson lower-bound proportion ranking
# --------------------------------------------------------------------------
WILSON_Z = 1.96
WILSON_SUCCESS_MIN = 10.0  # fixed business threshold: a "big" event value


@query(
    "q_wilson_ctr",
    oracle=f"""
    WITH agg AS (
      SELECT event_type, count(*) AS n,
             count(*) FILTER (WHERE value > {WILSON_SUCCESS_MIN}) AS s
      FROM events GROUP BY event_type
    ),
    scored AS (
      SELECT event_type, n, s,
             s * 1.0 / n AS raw_rate,
             (s * 1.0 / n + {WILSON_Z} * {WILSON_Z} / (2 * n)
              - {WILSON_Z} * sqrt((s * 1.0 / n) * (1 - s * 1.0 / n) / n
                                  + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n)))
               / (1 + {WILSON_Z} * {WILSON_Z} / n) AS wilson_lo
      FROM agg
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
           round(raw_rate, 6) AS raw_rate,
           round(wilson_lo, 6) AS wilson_lower,
           CAST(row_number() OVER (ORDER BY round(wilson_lo, 6) DESC, event_type)
             AS BIGINT) AS rank_wilson,
           CAST(row_number() OVER (ORDER BY round(raw_rate, 6) DESC, event_type)
             AS BIGINT) AS rank_raw
    FROM scored ORDER BY event_type
    """,
)
def q_wilson_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score lower bound (Wilson 1927 — the "how not to sort by
    average rating" correction): per event type, the success proportion
    (value above a fixed business threshold) with its 95% lower
    confidence bound, ranked both ways — small-sample types drop under
    Wilson ranking exactly where raw-rate ranking overtrusts them. The
    standard ranking-with-uncertainty primitive for conversion/CTR
    leaderboards. Ranks order by the 6dp-ROUNDED score (ties by type)
    so cross-engine float ulps cannot flip them.

    Scale: one map-side-combined two-count aggregate per type; the
    formula and both rank windows run over the |event_types|-row
    result (the aggregate-bounded window class).
    """
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("value") > WILSON_SUCCESS_MIN).alias("s"),
    )
    z = WILSON_Z
    p = F.col("s") / F.col("n")
    n = F.col("n")
    wilson = (
        p + z * z / (2 * n) - z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    ) / (1 + z * z / n)
    scored = agg.select(
        "event_type",
        "n",
        "s",
        F.round(p, 6).alias("raw_rate"),
        F.round(wilson, 6).alias("wilson_lower"),
    )
    scored = bounded_window_input(scored, label="q_wilson_ctr event types")
    w_w = Window.orderBy(F.desc("wilson_lower"), "event_type")
    w_r = Window.orderBy(F.desc("raw_rate"), "event_type")
    return scored.select(
        "event_type",
        "n",
        "s",
        "raw_rate",
        "wilson_lower",
        F.row_number().over(w_w).cast("long").alias("rank_wilson"),
        F.row_number().over(w_r).cast("long").alias("rank_raw"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov (exact integer arithmetic)
# --------------------------------------------------------------------------
@query(
    "q_ks_test",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    vc AS (
      SELECT value,
             count(*) FILTER (WHERE arm = 'A') AS ca,
             count(*) FILTER (WHERE arm = 'B') AS cb
      FROM assigned GROUP BY value
    ),
    cum AS (
      SELECT sum(ca) OVER (ORDER BY value) AS cum_a,
             sum(cb) OVER (ORDER BY value) AS cum_b
      FROM vc
    ),
    tot AS (
      SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM vc
    ),
    d AS (
      SELECT max(abs(cum_a * tot.n_b - cum_b * tot.n_a)) AS d_scaled
      FROM cum, tot
    )
    SELECT CAST(tot.n_a AS BIGINT) AS n_a, CAST(tot.n_b AS BIGINT) AS n_b,
           round(d.d_scaled * 1.0 / (tot.n_a * tot.n_b), 6) AS ks_d,
           round(d.d_scaled * 1.0 / (tot.n_a * tot.n_b)
                 * sqrt(tot.n_a * tot.n_b * 1.0 / (tot.n_a + tot.n_b)), 6)
             AS ks_stat
    FROM d, tot
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov between the hash-split A/B arms:
    D = max |F_A(v) − F_B(v)| over the pooled support, plus the
    normalized statistic D·√(n_A·n_B/(n_A+n_B)) — the
    distribution-shape companion to ``q_mann_whitney``'s location
    test (KS also catches variance/shape shifts a rank-sum misses).

    Exactness: D is computed as max |cumA·n_B − cumB·n_A| in INTEGER
    arithmetic and divided once at the end — no float comparisons
    anywhere inside the max, so both engines agree bit-for-bit before
    the final 6dp rounds. The cumulative sums run over the
    per-distinct-value rollup (the q_zipf_slope window class), never
    per event row.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    vc = (
        e.select(arm.alias("arm"), "value")
        .groupBy("value")
        .agg(
            F.count_if(F.col("arm") == "A").alias("ca"),
            F.count_if(F.col("arm") == "B").alias("cb"),
        )
    )
    vc = bounded_window_input(vc, label="q_ks_test value domain")
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    tot = vc.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        ).alias("d_scaled")
    )
    ks_d = F.col("d_scaled") / (F.col("n_a") * F.col("n_b"))
    return d.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.round(ks_d, 6).alias("ks_d"),
        F.round(
            ks_d
            * F.sqrt(
                F.col("n_a") * F.col("n_b") / (F.col("n_a") + F.col("n_b"))
            ),
            6,
        ).alias("ks_stat"),
    )


# --------------------------------------------------------------------------
# Welch's unequal-variance t-test (the parametric A/B readout)
# --------------------------------------------------------------------------
@query(
    "q_welch_ttest",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT
        count(*) FILTER (WHERE arm = 'A') AS n_a,
        count(*) FILTER (WHERE arm = 'B') AS n_b,
        sum(cents) FILTER (WHERE arm = 'A') AS s_a,
        sum(cents) FILTER (WHERE arm = 'B') AS s_b,
        sum(cents * cents) FILTER (WHERE arm = 'A') AS ss_a,
        sum(cents * cents) FILTER (WHERE arm = 'B') AS ss_b
      FROM assigned
    ),
    v AS (
      SELECT n_a, n_b,
             s_a / (100.0 * n_a) AS mean_a,
             s_b / (100.0 * n_b) AS mean_b,
             (ss_a - CAST(s_a AS DOUBLE) * s_a / n_a) / ((n_a - 1) * 10000.0)
               AS var_a,
             (ss_b - CAST(s_b AS DOUBLE) * s_b / n_b) / ((n_b - 1) * 10000.0)
               AS var_b
      FROM m
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t,
           round(
             (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
             / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6) AS dof
    FROM v
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic with the Welch-Satterthwaite
    degrees of freedom (Welch 1947) between the same md5 hash-split A/B
    arms as ``q_ab_lift`` / ``q_mann_whitney`` — the parametric member
    of the A/B readout family (MW is its rank-based twin, KS its
    distribution-shape twin).

    Hash-exactness: means and variances are derived from EXACT integer
    moment sums (values are cents, so ``Σx`` and ``Σx²`` are integer
    aggregates with no float reassociation), then combined in one
    deterministic double expression — both engines produce the
    bit-identical statistic before the 6dp rounding. var_samp is NOT
    used precisely because its streaming update order differs per
    engine.

    Scale: the corpus collapses in ONE map-side-combined aggregate to
    six integers; everything after is scalar arithmetic.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm_a = (
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8"
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    m = e.select(arm_a.alias("is_a"), cents.alias("cents")).agg(
        F.count_if("is_a").alias("n_a"),
        F.count_if(~F.col("is_a")).alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("cents"))).alias("s_a"),
        F.sum(F.when(~F.col("is_a"), F.col("cents"))).alias("s_b"),
        F.sum(F.when(F.col("is_a"), F.col("cents") * F.col("cents"))).alias("ss_a"),
        F.sum(F.when(~F.col("is_a"), F.col("cents") * F.col("cents"))).alias("ss_b"),
    )
    mean_a = F.col("s_a") / (100.0 * F.col("n_a"))
    mean_b = F.col("s_b") / (100.0 * F.col("n_b"))
    var_a = (
        F.col("ss_a") - F.col("s_a").cast("double") * F.col("s_a") / F.col("n_a")
    ) / ((F.col("n_a") - 1) * 10000.0)
    var_b = (
        F.col("ss_b") - F.col("s_b").cast("double") * F.col("s_b") / F.col("n_b")
    ) / ((F.col("n_b") - 1) * 10000.0)
    se2_a = var_a / F.col("n_a")
    se2_b = var_b / F.col("n_b")
    return m.select(
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round((mean_a - mean_b) / F.sqrt(se2_a + se2_b), 6).alias("t"),
        F.round(
            (se2_a + se2_b) * (se2_a + se2_b)
            / (se2_a * se2_a / (F.col("n_a") - 1) + se2_b * se2_b / (F.col("n_b") - 1)),
            6,
        ).alias("dof"),
    )


# --------------------------------------------------------------------------
# Cramér's V (effect size for categorical association)
# --------------------------------------------------------------------------
@query(
    "q_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT c_nationkey AS r_key, c_mktsegment AS c_key, count(*) AS o
      FROM customer GROUP BY 1, 2
    ),
    margins AS (
      SELECT o.o, rs.rn, cs.cn, t.n
      FROM obs o
      JOIN (SELECT r_key, sum(o) AS rn FROM obs GROUP BY r_key) rs USING (r_key)
      JOIN (SELECT c_key, sum(o) AS cn FROM obs GROUP BY c_key) cs USING (c_key)
      CROSS JOIN (SELECT sum(o) AS n FROM obs) t
    ),
    stat AS (
      SELECT sum((o - CAST(rn * cn AS DOUBLE) / n)
                 * (o - CAST(rn * cn AS DOUBLE) / n)
                 / (CAST(rn * cn AS DOUBLE) / n)) AS chi2,
             max(n) AS n
      FROM margins
    ),
    dims AS (
      SELECT count(DISTINCT r_key) AS r, count(DISTINCT c_key) AS c FROM obs
    )
    SELECT CAST(stat.n AS BIGINT) AS n,
           CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
           round(stat.chi2, 6) AS chi2,
           round(sqrt(stat.chi2 / (stat.n * least(dims.r - 1, dims.c - 1))), 6)
             AS cramers_v
    FROM stat, dims
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size (Cramér 1946) over the nation × market
    segment contingency table — the chi-square statistic normalized to
    [0, 1] so association strength is comparable across tables of
    different size, the readout a mixture owner uses to decide whether
    a categorical dependency is *practically* meaningful (the p-value
    twin is ``q_chisq_independence``).

    Scale: identical shape to q_chisq_independence — the corpus
    collapses to the |nations| × |segments| contingency table in one
    map-side-combined groupBy; margins and V are arithmetic over that
    tiny table with the one-row total broadcast.
    """
    c = load_table(spark, sf_dir, "customer")
    obs = c.groupBy(
        F.col("c_nationkey").alias("r_key"), F.col("c_mktsegment").alias("c_key")
    ).agg(F.count(F.lit(1)).alias("o"))
    rs = obs.groupBy("r_key").agg(F.sum("o").alias("rn"))
    cs = obs.groupBy("c_key").agg(F.sum("o").alias("cn"))
    t = obs.agg(F.sum("o").alias("n"))
    e = (F.col("rn") * F.col("cn")).cast("double") / F.col("n")
    stat = (
        obs.join(rs, "r_key")
        .join(cs, "c_key")
        .crossJoin(F.broadcast(t))
        .agg(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
            F.max("n").alias("n"),
        )
    )
    dims = obs.agg(
        F.count_distinct("r_key").alias("r"), F.count_distinct("c_key").alias("c")
    )
    return stat.crossJoin(F.broadcast(dims)).select(
        F.col("n").cast("long").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-series goodness-of-fit tests
# --------------------------------------------------------------------------
BH_FDR_Q = 0.10


@query(
    "q_benjamini_hochberg",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CASE WHEN value < 30 THEN 'lo'
                  WHEN value < 70 THEN 'mid' ELSE 'hi' END AS bucket
      FROM events
    ),
    obs AS (SELECT event_type, bucket, count(*) AS o FROM b GROUP BY 1, 2),
    gt AS (SELECT event_type, sum(o) AS ng FROM obs GROUP BY event_type),
    bt AS (SELECT bucket, sum(o) AS nb FROM obs GROUP BY bucket),
    tot AS (SELECT sum(o) AS n FROM obs),
    chi AS (
      SELECT o.event_type,
             sum((o.o - CAST(gt.ng * bt.nb AS DOUBLE) / tot.n)
                 * (o.o - CAST(gt.ng * bt.nb AS DOUBLE) / tot.n)
                 / (CAST(gt.ng * bt.nb AS DOUBLE) / tot.n)) AS chi2
      FROM obs o JOIN gt USING (event_type) JOIN bt USING (bucket)
      CROSS JOIN tot
      GROUP BY o.event_type
    ),
    p AS (
      SELECT event_type, chi2, exp(-chi2 / 2) AS pval,
             row_number() OVER (ORDER BY exp(-chi2 / 2), event_type) AS i,
             count(*) OVER () AS m
      FROM chi
    ),
    k AS (
      SELECT coalesce(max(i) FILTER (WHERE pval <= i * {BH_FDR_Q} / m), 0)
        AS kmax FROM p
    )
    SELECT p.event_type, round(p.chi2, 6) AS chi2, round(p.pval, 6) AS pval,
           CAST(p.i AS BIGINT) AS p_rank,
           round(p.i * {BH_FDR_Q} / p.m, 6) AS bh_critical,
           p.i <= k.kmax AS rejected
    FROM p, k ORDER BY p.i
    """,
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg
    1995) at q=0.10 over one hypothesis per event series: a
    3-bucket value-distribution goodness-of-fit chi-square against the
    pooled distribution. With exactly 2 degrees of freedom the
    chi-square survival function is EXACTLY ``exp(-x/2)`` — no erf or
    incomplete-gamma approximation, so the p-values are closed-form
    and engine-identical. The step-up rule (reject all ranks up to the
    LARGEST i with p_i <= i·q/m, including any non-monotone dips
    before it) is the part naive per-test thresholding gets wrong.

    Scale: corpus → |series| × 3 contingency cells in one
    map-side-combined groupBy; the BH window runs over the m-row
    p-value table (m = |event types|), the q_zipf_slope
    aggregate-bounded waiver class.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 30, "lo")
        .when(F.col("value") < 70, "mid")
        .otherwise("hi")
    )
    obs = e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("o")
    )
    gt = obs.groupBy("event_type").agg(F.sum("o").alias("ng"))
    bt = obs.groupBy("bucket").agg(F.sum("o").alias("nb"))
    tot = obs.agg(F.sum("o").alias("n"))
    exp_c = (F.col("ng") * F.col("nb")).cast("double") / F.col("n")
    chi = (
        obs.join(gt, "event_type")
        .join(bt, "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("o") - exp_c) * (F.col("o") - exp_c) / exp_c).alias("chi2")
        )
    )
    p = chi.select("event_type", "chi2", F.exp(-F.col("chi2") / 2).alias("pval"))
    return (
        bh_stepup(p, key="event_type", fdr_q=BH_FDR_Q)
        .select(
            "event_type",
            F.round("chi2", 6).alias("chi2"),
            F.round("pval", 6).alias("pval"),
            "p_rank",
            "bh_critical",
            "rejected",
        )
        .orderBy("p_rank")
    )


def bh_stepup(p: DataFrame, key: str, fdr_q: float) -> DataFrame:
    """Benjamini-Hochberg step-up over a small hypothesis frame with a
    ``pval`` column: rank ascending (ties broken by ``key``), reject
    every rank up to the LARGEST i with p_i <= i·q/m — including
    non-monotone dips before it. Passenger columns ride through.
    The window input is the m-row hypothesis table, never raw data
    (row-bound-guarded)."""
    p = bounded_window_input(p, label="bh_stepup hypothesis table")
    w = Window.orderBy("pval", key)
    ranked = p.select(
        "*",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    crit = F.col("i") * fdr_q / F.col("m")
    k = ranked.agg(
        F.coalesce(F.max(F.when(F.col("pval") <= crit, F.col("i"))), F.lit(0)).alias(
            "kmax"
        )
    )
    return (
        ranked.crossJoin(F.broadcast(k))
        .select(
            *(c for c in p.columns),
            F.col("i").cast("long").alias("p_rank"),
            F.round(crit, 6).alias("bh_critical"),
            (F.col("i") <= F.col("kmax")).alias("rejected"),
        )
    )


# --------------------------------------------------------------------------
# Spearman rank correlation (midranks for ties)
# --------------------------------------------------------------------------
@query(
    "q_spearman_corr",
    oracle="""
    WITH j AS (
      SELECT o.o_orderpriority AS pri,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS x,
             CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    r AS (
      SELECT pri,
             rank() OVER (PARTITION BY pri ORDER BY x)
               + (count(*) OVER (PARTITION BY pri, x) - 1) / 2.0 AS rx,
             rank() OVER (PARTITION BY pri ORDER BY y)
               + (count(*) OVER (PARTITION BY pri, y) - 1) / 2.0 AS ry
      FROM j
    )
    SELECT pri, CAST(count(*) AS BIGINT) AS n,
           round(corr(rx, ry), 6) AS spearman_rho
    FROM r GROUP BY pri ORDER BY pri
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per order priority between order value
    and the customer's account balance — Pearson correlation computed
    on MIDRANKS (min-rank + (ties-1)/2, the tie-correct form), the
    monotone-association complement of ``q_agg_corr``'s linear Pearson.

    Midranks are exact half-integers (rank() plus a half-integer tie
    offset over integer-cents keys), so the only float work is the
    final corr aggregate — rounded 6dp per the repo convention (corr
    accumulates in engine-specific order; rho is O(0.01-1) so 6dp
    dwarfs the reassociation error).

    Scale: both rank windows are PARTITIONED by the group key — no
    global sort; ranks then collapse in one map-side-combined corr
    per group.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("y")
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select("pri", "x", "y")
    return spearman_rho(j, grp="pri").orderBy("pri")


def spearman_rho(df: DataFrame, grp: str) -> DataFrame:
    """Spearman rank correlation per group over a (grp, x, y) frame:
    midranks (min-rank + (ties-1)/2) from PARTITIONED windows, then
    Pearson over the midranks from EXACT half-integer moment sums with
    a guarded denominator — a zero-variance group (all-tied x or y)
    yields NULL instead of an ANSI divide-by-zero job failure (the
    engine ``corr`` aggregate throws there under ANSI mode). Returns
    (grp, n, spearman_rho)."""
    rx = (
        F.rank().over(Window.partitionBy(grp).orderBy("x"))
        + (F.count(F.lit(1)).over(Window.partitionBy(grp, "x")) - 1) / 2.0
    )
    ry = (
        F.rank().over(Window.partitionBy(grp).orderBy("y"))
        + (F.count(F.lit(1)).over(Window.partitionBy(grp, "y")) - 1) / 2.0
    )
    r = df.select(grp, rx.alias("rx"), ry.alias("ry"))
    m = r.groupBy(grp).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        grp,
        "n",
        F.when(
            (varx_n > 0) & (vary_n > 0),
            F.round(cov_n / F.sqrt(varx_n * vary_n), 6),
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# Kendall tau-b over daily series pairs (tie-corrected)
# --------------------------------------------------------------------------
@query(
    "q_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             sign((a.x - b.x) * (a.y - b.y)) AS s,
             CAST(a.x = b.x AS INT) AS tx,
             CAST(a.y = b.y AS INT) AS ty
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
    ),
    agg AS (
      SELECT event_type,
             count(*) AS n0,
             sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS conc,
             sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS disc,
             sum(tx) AS n1, sum(ty) AS n2
      FROM pairs GROUP BY event_type
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n_pairs,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           CASE WHEN CAST(n0 - n1 AS DOUBLE) * (n0 - n2) > 0
                THEN round((conc - disc)
                           / sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2)), 6)
                END AS kendall_tau_b
    FROM agg ORDER BY event_type
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b per event series between daily volume and daily
    revenue (Kendall 1945, the tie-corrected form): concordant minus
    discordant day pairs over the geometric mean of tie-adjusted pair
    counts. The rank-based alternative to ``q_spearman_corr`` that is
    also a U-statistic — its pairwise structure reuses the
    ``q_theil_sen_trend`` per-series pair-join shape exactly.

    Hash-exactness: x (a count) and y (integer cents) are exact, so
    sign/tie tests and all four tallies are integer-exact; only the
    final sqrt normalization is float, rounded 6dp.

    Scale: the corpus collapses to |series| × |days| rows first; the
    pair join is per-series over that rollup (d²/2 tiny rows — for
    long series subsample days first). No global window, no cartesian:
    the join is equi-keyed on the series with a range residual.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x"), F.sum(cents).alias("y")
    )
    return kendall_tau_b(daily, grp="event_type", order="day").orderBy(
        "event_type"
    )


def kendall_tau_b(series: DataFrame, grp: str, order: str) -> DataFrame:
    """Kendall tau-b per group over a (grp, order, x, y) frame with
    integer-exact ``x``/``y``: equi-keyed per-group pair join (range
    residual on ``order``), integer sign/tie tallies, one sqrt at the
    end. Returns (grp, n_pairs, concordant, discordant,
    kendall_tau_b)."""
    a, b = series.alias("a"), series.alias("b")
    s = F.signum(
        ((F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))).cast("double")
    )
    pairs = a.join(
        b,
        (F.col(f"b.{grp}") == F.col(f"a.{grp}"))
        & (F.col(f"b.{order}") > F.col(f"a.{order}")),
    ).select(
        F.col(f"a.{grp}").alias(grp),
        s.alias("s"),
        (F.col("a.x") == F.col("b.x")).cast("int").alias("tx"),
        (F.col("a.y") == F.col("b.y")).cast("int").alias("ty"),
    )
    agg = pairs.groupBy(grp).agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if(F.col("s") > 0).alias("conc"),
        F.count_if(F.col("s") < 0).alias("disc"),
        F.sum("tx").alias("n1"),
        F.sum("ty").alias("n2"),
    )
    denom_sq = (F.col("n0") - F.col("n1")).cast("double") * (F.col("n0") - F.col("n2"))
    return agg.select(
        grp,
        F.col("n0").alias("n_pairs"),
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        # a fully-tied x or y series zeroes the denominator: tau-b is
        # undefined there — NULL, not a divide-by-zero job failure
        F.when(
            denom_sq > 0,
            F.round((F.col("conc") - F.col("disc")) / F.sqrt(denom_sq), 6),
        ).alias("kendall_tau_b"),
    )


# --------------------------------------------------------------------------
# Delete-one-block jackknife confidence interval
# --------------------------------------------------------------------------
JACKKNIFE_BLOCKS = 10


@query(
    "q_jackknife_ci",
    oracle=f"""
    WITH blocked AS (
      SELECT CAST(concat('0x', substr(md5('jk:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {JACKKNIFE_BLOCKS} AS blk,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    per_block AS (
      SELECT blk, count(*) AS nb, sum(cents) AS sb FROM blocked GROUP BY blk
    ),
    tot AS (SELECT sum(nb) AS n, sum(sb) AS s FROM per_block),
    loo AS (
      SELECT (t.s - p.sb) / (100.0 * (t.n - p.nb)) AS m_loo
      FROM per_block p CROSS JOIN tot t
    ),
    jk AS (
      SELECT count(*) AS b, avg(m_loo) AS m_bar,
             sum((m_loo - (SELECT avg(m_loo) FROM loo))
                 * (m_loo - (SELECT avg(m_loo) FROM loo))) AS ss
      FROM loo
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(jk.b AS BIGINT) AS n_blocks,
           round(t.s / (100.0 * t.n), 6) AS mean,
           round(sqrt((jk.b - 1.0) / jk.b * jk.ss), 6) AS jk_se,
           round(t.s / (100.0 * t.n) - 1.96 * sqrt((jk.b - 1.0) / jk.b * jk.ss), 6)
             AS ci_lo,
           round(t.s / (100.0 * t.n) + 1.96 * sqrt((jk.b - 1.0) / jk.b * jk.ss), 6)
             AS ci_hi
    FROM jk CROSS JOIN tot t
    """,
)
def q_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife standard error and 95% CI for the
    mean purchase value (Quenouille 1956 / Tukey 1958; the block form
    is how distributed systems resample without a shuffle-per-replica
    — one pass yields all {JACKKNIFE_BLOCKS} leave-one-out estimates).
    Blocks are a deterministic md5 hash of the user, so the resampling
    plan is reproducible across engines and runs — no RNG.

    Hash-exactness: per-block sums are exact integer cents; each
    leave-one-out mean is one deterministic double expression over
    (total − block) integers; only the {JACKKNIFE_BLOCKS}-term
    variance sum carries reassociation noise, rounded 6dp.

    Scale: ONE map-side-combined groupBy to {JACKKNIFE_BLOCKS} block
    rows, then scalar arithmetic — contrast a bootstrap, which needs
    R passes or a poissonized reshuffle; the jackknife gets R=B
    replicates from a single aggregation.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # portable 60-bit md5-prefix bucket (the q_decontaminate_13gram /
    # portable_token_hash rule) — engine hash() functions differ
    blk = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("jk:"), F.col("user_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % JACKKNIFE_BLOCKS
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_block = (
        e.select(blk.alias("blk"), cents.alias("cents"))
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("cents").alias("sb"))
    )
    tot = per_block.agg(F.sum("nb").alias("n"), F.sum("sb").alias("s"))
    loo = per_block.crossJoin(F.broadcast(tot)).select(
        ((F.col("s") - F.col("sb")) / (100.0 * (F.col("n") - F.col("nb")))).alias(
            "m_loo"
        )
    )
    m_bar = loo.agg(F.avg("m_loo").alias("m_bar"))
    jk = (
        loo.crossJoin(F.broadcast(m_bar))
        .agg(
            F.count(F.lit(1)).alias("b"),
            F.sum(
                (F.col("m_loo") - F.col("m_bar")) * (F.col("m_loo") - F.col("m_bar"))
            ).alias("ss"),
        )
    )
    se = F.sqrt((F.col("b") - 1.0) / F.col("b") * F.col("ss"))
    mean = F.col("s") / (100.0 * F.col("n"))
    return jk.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n"),
        F.col("b").cast("long").alias("n_blocks"),
        F.round(mean, 6).alias("mean"),
        F.round(se, 6).alias("jk_se"),
        F.round(mean - 1.96 * se, 6).alias("ci_lo"),
        F.round(mean + 1.96 * se, 6).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# A/B power analysis: minimum detectable effect at fixed power
# --------------------------------------------------------------------------
MDE_Z_ALPHA = 1.959964  # two-sided 5%
MDE_Z_BETA = 0.841621   # 80% power


@query(
    "q_ab_power_mde",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT arm, count(*) AS n, sum(cents) AS s, sum(cents * cents) AS ss
      FROM assigned GROUP BY arm
    ),
    v AS (
      SELECT arm, n,
             s / (100.0 * n) AS mean,
             (ss - CAST(s AS DOUBLE) * s / n) / ((n - 1) * 10000.0) AS var
      FROM m
    )
    SELECT arm, CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
           round(var, 6) AS var,
           round(({MDE_Z_ALPHA} + {MDE_Z_BETA}) * sqrt(2 * var / n), 6)
             AS mde_abs,
           round(({MDE_Z_ALPHA} + {MDE_Z_BETA}) * sqrt(2 * var / n) / mean, 6)
             AS mde_rel,
           CAST(ceil(2 * var * ({MDE_Z_ALPHA} + {MDE_Z_BETA})
                     * ({MDE_Z_ALPHA} + {MDE_Z_BETA})
                     / (0.05 * mean * 0.05 * mean)) AS BIGINT)
             AS n_needed_5pct
    FROM v ORDER BY arm
    """,
)
def q_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis per arm (the standard two-sample normal
    approximation): the minimum detectable effect at 80% power /
    two-sided α=5% given the arm's current n and variance, absolute
    and relative, plus the sample size needed to detect a 5% relative
    lift — the pre-registration readout that accompanies the
    ``q_welch_ttest`` / ``q_ab_lift`` / ``q_mann_whitney`` family.

    Hash-exactness: the same exact-integer-moment construction as
    ``q_welch_ttest`` (values are cents), so mean/var/MDE are
    deterministic doubles on both engines before the 6dp rounding;
    ceil() on the deterministic double keeps n_needed integer-exact.

    Scale: one map-side-combined aggregate to two (arm, moments) rows.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    m = (
        e.select(arm.alias("arm"), cents.alias("cents"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("ss"),
        )
    )
    mean = F.col("s") / (100.0 * F.col("n"))
    var = (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")) / (
        (F.col("n") - 1) * 10000.0
    )
    z = MDE_Z_ALPHA + MDE_Z_BETA
    mde = z * F.sqrt(2 * var / F.col("n"))
    return (
        m.select(
            "arm",
            F.col("n").cast("long").alias("n"),
            F.round(mean, 6).alias("mean"),
            F.round(var, 6).alias("var"),
            F.round(mde, 6).alias("mde_abs"),
            F.round(mde / mean, 6).alias("mde_rel"),
            F.ceil(2 * var * z * z / (0.05 * mean * 0.05 * mean))
            .cast("long")
            .alias("n_needed_5pct"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# One-way ANOVA across day-of-week groups (seasonality strength)
# --------------------------------------------------------------------------
@query(
    "q_anova_dow",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) AS dow,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT event_type, dow, count(*) AS ng,
             sum(y) AS sg, sum(y * y) AS ssg
      FROM daily GROUP BY event_type, dow
    ),
    t AS (
      SELECT event_type, sum(ng) AS n, sum(sg) AS s, sum(ssg) AS ss,
             count(*) AS k
      FROM g GROUP BY event_type
    ),
    parts AS (
      SELECT g.event_type,
             sum(CAST(g.sg AS DOUBLE) * g.sg / g.ng)
               - max(CAST(t.s AS DOUBLE) * t.s / t.n) AS ssb,
             max(t.ss - CAST(t.s AS DOUBLE) * t.s / t.n) AS sst,
             max(t.k) AS k, max(t.n) AS n
      FROM g JOIN t USING (event_type)
      GROUP BY g.event_type
    )
    SELECT event_type,
           CAST(k AS BIGINT) AS n_groups,
           CAST(n AS BIGINT) AS n_days,
           round(ssb / (k - 1) / ((sst - ssb) / (n - k)), 6) AS f_stat,
           round(ssb / sst, 6) AS eta_squared,
           ssb / (k - 1) / ((sst - ssb) / (n - k)) > 2.1 AS seasonal
    FROM parts ORDER BY event_type
    """,
)
def q_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily event volume across day-of-week groups,
    per series — the seasonality-strength readout (F statistic and
    effect size η² = SS_between/SS_total) that justifies fitting the
    weekly profile ``q_seasonal_baseline`` uses; the decision
    threshold compares the unrounded F identically on both sides.

    Hash-exactness: group and total sums of squares come from EXACT
    integer moments (counts and their squares), combined in one
    deterministic double expression — the Welch-t construction
    extended to k groups.

    Scale: corpus → (series, dow) integer moments in one map-side-
    combined groupBy chain; everything after is scalar arithmetic on
    ≤ 7 rows per series.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.dayofweek(F.to_date("ts")).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("y"))
    g = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("y").alias("sg"),
        F.sum(F.col("y") * F.col("y")).alias("ssg"),
    )
    t = g.groupBy("event_type").agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("ssg").alias("ss"),
        F.count(F.lit(1)).alias("k"),
    )
    parts = (
        g.join(t, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.col("sg").cast("double") * F.col("sg") / F.col("ng"))
                - F.max(F.col("s").cast("double") * F.col("s") / F.col("n"))
            ).alias("ssb"),
            F.max(
                F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
            ).alias("sst"),
            F.max("k").alias("k"),
            F.max("n").alias("n"),
        )
    )
    f_stat = (
        F.col("ssb") / (F.col("k") - 1) / ((F.col("sst") - F.col("ssb")) / (F.col("n") - F.col("k")))
    )
    return parts.select(
        "event_type",
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_days"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(F.col("ssb") / F.col("sst"), 6).alias("eta_squared"),
        (f_stat > 2.1).alias("seasonal"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Pairwise correlation matrix across daily series
# --------------------------------------------------------------------------
@query(
    "q_correlation_matrix",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             a.y AS xa, b.y AS xb
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type
    ),
    m AS (
      SELECT ta, tb, count(*) AS n,
             sum(xa) AS sa, sum(xb) AS sb,
             sum(xa * xb) AS sab, sum(xa * xa) AS saa, sum(xb * xb) AS sbb
      FROM pairs GROUP BY ta, tb
    )
    SELECT ta AS series_a, tb AS series_b, CAST(n AS BIGINT) AS n_days,
           CASE WHEN (n * saa - sa * sa) > 0 AND (n * sbb - sb * sb) > 0
                THEN round((n * sab - CAST(sa AS DOUBLE) * sb)
                           / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                                  * (n * sbb - sb * sb)), 6)
                END AS pearson_r
    FROM m ORDER BY series_a, series_b
    """,
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle) across the
    daily volumes of every event series — the co-movement profile a
    capacity planner reads before treating series independently (the
    multivariate companion of ``q_agg_corr``'s single pair and
    ``q_timeseries_similarity``'s shape distance).

    Hash-exactness: the per-pair moments are EXACT integer sums over
    the day-aligned join; r is one deterministic double expression
    with a guarded zero-variance denominator (NULL for a constant
    series, the Spearman-kernel discipline).

    Scale: the corpus collapses to |series|×|days| rows; the pair join
    is day-equi-keyed, output |series|²/2 rows.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.col("a.y").alias("xa"),
        F.col("b.y").alias("xb"),
    )
    m = pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xb")).alias("sab"),
        F.sum(F.col("xa") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
    )
    var_a = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    var_b = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    cov = F.col("n") * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    return m.select(
        F.col("ta").alias("series_a"),
        F.col("tb").alias("series_b"),
        F.col("n").alias("n_days"),
        F.when(
            (var_a > 0) & (var_b > 0),
            F.round(cov / F.sqrt(var_a.cast("double") * var_b), 6),
        ).alias("pearson_r"),
    ).orderBy("series_a", "series_b")


# --------------------------------------------------------------------------
# Mutual information between event type and value bucket
# --------------------------------------------------------------------------
@query(
    "q_mutual_information",
    oracle="""
    WITH b AS (
      SELECT event_type AS x,
             CASE WHEN value < 30 THEN 'lo'
                  WHEN value < 70 THEN 'mid' ELSE 'hi' END AS y
      FROM events
    ),
    joint AS (SELECT x, y, count(*) AS c FROM b GROUP BY x, y),
    mx AS (SELECT x, sum(c) AS cx FROM joint GROUP BY x),
    my AS (SELECT y, sum(c) AS cy FROM joint GROUP BY y),
    n AS (SELECT sum(c) AS n FROM joint),
    terms AS (
      SELECT j.c * 1.0 / n.n
               * log2((CAST(j.c AS DOUBLE) * n.n) / (CAST(mx.cx AS DOUBLE) * my.cy))
               AS t,
             j.c, n.n
      FROM joint j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
    ),
    hx AS (
      SELECT -sum(cx * 1.0 / n.n * log2(cx * 1.0 / n.n)) AS h
      FROM mx CROSS JOIN n
    ),
    hy AS (
      SELECT -sum(cy * 1.0 / n.n * log2(cy * 1.0 / n.n)) AS h
      FROM my CROSS JOIN n
    )
    SELECT CAST(max(terms.n) AS BIGINT) AS n_events,
           round(sum(terms.t), 6) AS mi_bits,
           round(sum(terms.t) / sqrt((SELECT h FROM hx) * (SELECT h FROM hy)), 6)
             AS normalized_mi
    FROM terms
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between event type and value bucket,
    plus the sqrt-entropy-normalized NMI — the information-theoretic
    dependence measure that catches nonlinear/categorical association
    chi-square quantifies differently and Pearson misses entirely
    (completes the dependence shelf: chi², Cramér's V, MI).

    Hash-exactness: every probability is an exact integer ratio; the
    MI sum folds |X|·|Y| deterministic double terms, rounded 6dp.

    Scale: one map-side-combined groupBy to the joint contingency
    table; margins and entropies are arithmetic over that tiny table.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 30, "lo")
        .when(F.col("value") < 70, "mid")
        .otherwise("hi")
    )
    joint = e.groupBy(
        F.col("event_type").alias("x"), bucket.alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    mx = joint.groupBy("x").agg(F.sum("c").alias("cx"))
    my = joint.groupBy("y").agg(F.sum("c").alias("cy"))
    n = joint.agg(F.sum("c").alias("n"))
    t = (
        F.col("c")
        / F.col("n")
        * F.log2(
            (F.col("c").cast("double") * F.col("n"))
            / (F.col("cx").cast("double") * F.col("cy"))
        )
    )
    terms = (
        joint.join(mx, "x").join(my, "y").crossJoin(F.broadcast(n)).select(
            t.alias("t"), "n"
        )
    )
    hx = (
        mx.crossJoin(F.broadcast(n))
        .agg(
            (-F.sum(F.col("cx") / F.col("n") * F.log2(F.col("cx") / F.col("n")))).alias(
                "h"
            )
        )
    )
    hy = (
        my.crossJoin(F.broadcast(n))
        .agg(
            (-F.sum(F.col("cy") / F.col("n") * F.log2(F.col("cy") / F.col("n")))).alias(
                "h"
            )
        )
    )
    mi = terms.agg(F.max("n").alias("n_events"), F.sum("t").alias("mi"))
    return (
        mi.crossJoin(F.broadcast(hx.select(F.col("h").alias("hx"))))
        .crossJoin(F.broadcast(hy.select(F.col("h").alias("hy"))))
        .select(
            F.col("n_events").cast("long").alias("n_events"),
            F.round("mi", 6).alias("mi_bits"),
            F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6).alias(
                "normalized_mi"
            ),
        )
    )


# --------------------------------------------------------------------------
# Simpson's paradox audit: aggregated vs per-stratum association
# --------------------------------------------------------------------------
SIMPSON_HIGH_VALUE = 150000.0


@query(
    "q_simpson_audit",
    oracle=f"""
    WITH base AS (
      SELECT c.c_mktsegment AS stratum,
             o.o_orderpriority LIKE '1%' OR o.o_orderpriority LIKE '2%'
               AS urgent,
             o.o_totalprice > {SIMPSON_HIGH_VALUE} AS high
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    strat AS (
      SELECT stratum,
             count(*) FILTER (WHERE urgent) AS nu,
             count(*) FILTER (WHERE urgent AND high) AS hu,
             count(*) FILTER (WHERE NOT urgent) AS no,
             count(*) FILTER (WHERE NOT urgent AND high) AS ho
      FROM base GROUP BY stratum
      UNION ALL
      SELECT 'ALL',
             count(*) FILTER (WHERE urgent),
             count(*) FILTER (WHERE urgent AND high),
             count(*) FILTER (WHERE NOT urgent),
             count(*) FILTER (WHERE NOT urgent AND high)
      FROM base
    ),
    rates AS (
      SELECT stratum, nu, no,
             hu * 1.0 / nu AS p_urgent, ho * 1.0 / no AS p_other
      FROM strat WHERE nu > 0 AND no > 0
    ),
    overall AS (
      SELECT p_urgent - p_other AS d FROM rates WHERE stratum = 'ALL'
    )
    SELECT r.stratum,
           CAST(r.nu AS BIGINT) AS n_urgent, CAST(r.no AS BIGINT) AS n_other,
           round(r.p_urgent, 6) AS p_high_urgent,
           round(r.p_other, 6) AS p_high_other,
           round(r.p_urgent - r.p_other, 6) AS risk_diff,
           sign(r.p_urgent - r.p_other) != sign(o.d) AS reversed
    FROM rates r CROSS JOIN overall o
    ORDER BY r.stratum
    """,
)
def q_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit (Simpson 1951): the association between
    urgent order priority and high order value, aggregated AND within
    every market-segment stratum, with a ``reversed`` flag wherever a
    stratum's risk difference has the opposite sign of the pooled one
    — the classic aggregation trap every analytics readout should be
    screened for before a pooled number ships.

    Hash-exactness: all rates are exact integer ratios; the sign
    comparison uses the unrounded differences identically on both
    sides (measure-zero boundary only at an exact rate tie).

    Scale: one map-side-combined groupBy per grain (stratum + pooled),
    both tiny; the join is the standard broadcast fact-dim shape.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.col("o_orderpriority").like("1%")
            | F.col("o_orderpriority").like("2%")
        ).alias("urgent"),
        (F.col("o_totalprice") > SIMPSON_HIGH_VALUE).alias("high"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("stratum")
    )
    base = o.join(c, o.o_custkey == c.c_custkey).select("stratum", "urgent", "high")

    def tallies(df: DataFrame, label_col):
        return df.groupBy(label_col.alias("stratum")).agg(
            F.count_if("urgent").alias("nu"),
            F.count_if(F.col("urgent") & F.col("high")).alias("hu"),
            F.count_if(~F.col("urgent")).alias("no"),
            F.count_if(~F.col("urgent") & F.col("high")).alias("ho"),
        )

    strat = tallies(base, F.col("stratum")).unionByName(
        tallies(base, F.lit("ALL"))
    )
    rates = strat.filter((F.col("nu") > 0) & (F.col("no") > 0)).select(
        "stratum",
        "nu",
        "no",
        (F.col("hu") / F.col("nu")).alias("p_urgent"),
        (F.col("ho") / F.col("no")).alias("p_other"),
    )
    overall = rates.filter(F.col("stratum") == "ALL").select(
        (F.col("p_urgent") - F.col("p_other")).alias("d")
    )
    diff = F.col("p_urgent") - F.col("p_other")
    return (
        rates.crossJoin(F.broadcast(overall))
        .select(
            "stratum",
            F.col("nu").alias("n_urgent"),
            F.col("no").alias("n_other"),
            F.round("p_urgent", 6).alias("p_high_urgent"),
            F.round("p_other", 6).alias("p_high_other"),
            F.round(diff, 6).alias("risk_diff"),
            (F.signum(diff) != F.signum(F.col("d"))).alias("reversed"),
        )
        .orderBy("stratum")
    )


# --------------------------------------------------------------------------
# Effect sizes: Cohen's d + Cliff's delta per source vs rest-of-corpus
# --------------------------------------------------------------------------
@query(
    "q_effect_sizes",
    oracle="""
    WITH vc AS (
      SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY n_chars
    ),
    mid AS (
      SELECT v, c,
             coalesce(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1.0) / 2 AS midrank
      FROM vc
    ),
    gv AS (
      SELECT source, n_chars AS v, count(*) AS cg FROM documents GROUP BY 1, 2
    ),
    g AS (
      SELECT gv.source,
             CAST(sum(gv.cg) AS BIGINT) AS n_g,
             sum(CAST(gv.cg AS BIGINT) * gv.v) AS sum_g,
             sum(CAST(gv.cg AS BIGINT) * gv.v * gv.v) AS sumsq_g,
             sum(gv.cg * mid.midrank) AS r_g
      FROM gv JOIN mid ON gv.v = mid.v
      GROUP BY gv.source
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(n_chars AS BIGINT)) AS s,
             sum(CAST(n_chars AS BIGINT) * n_chars) AS ss
      FROM documents
    ),
    eff AS (
      SELECT source, n_g, n - n_g AS n_r,
             sum_g * 1.0 / n_g AS mean_g,
             (s - sum_g) * 1.0 / (n - n_g) AS mean_r,
             (sumsq_g - sum_g * sum_g * 1.0 / n_g) / (n_g - 1) AS var_g,
             ((ss - sumsq_g) - (s - sum_g) * (s - sum_g) * 1.0 / (n - n_g))
               / (n - n_g - 1) AS var_r,
             2.0 * (r_g - n_g * (n_g + 1.0) / 2) / (n_g * (n - n_g)) - 1.0
               AS delta
      FROM g, tot
    )
    SELECT source, n_g AS n_docs,
           round(mean_g, 6) AS mean_chars,
           round((mean_g - mean_r)
                 / sqrt(((n_g - 1) * var_g + (n_r - 1) * var_r)
                        / (n_g + n_r - 2)), 6) AS cohens_d,
           round(delta, 6) AS cliffs_delta,
           CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                WHEN abs(delta) < 0.33 THEN 'small'
                WHEN abs(delta) < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM eff ORDER BY source
    """,
)
def q_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes of document length per SOURCE against
    the rest of the corpus: Cohen's d (pooled-SD mean difference) and
    Cliff's delta (the nonparametric P(X>Y) − P(X<Y), Cliff 1993) with
    Romano et al. (2006) magnitude labels — the practical-significance
    companion to the suite's hypothesis tests (``q_welch_ttest``,
    ``q_mann_whitney``): with corpus-scale n everything is
    "significant", and the effect SIZE is what decides whether a
    source's length skew actually matters for mixture design.

    Cliff's delta is never computed pairwise: delta = 2U/(n_g·n_r) − 1
    with U from the global midrank sum (the ``q_mann_whitney``
    rank-sum identity, ties → half-credit via midranks), so each
    source needs only its rank sum against ONE shared global ranking.

    Hash-exactness: midranks are half-integers from exact counts;
    group sums/sumsqs are exact integer arithmetic (BIGINT on the
    oracle side to match Spark's long); d and delta are single
    deterministic double expressions, 6dp-rounded; magnitude
    thresholds compare the unrounded delta identically on both sides.

    Scale: the corpus collapses to the value domain (distinct
    n_chars) for ranking and to (source × value) for group sums —
    both vocabulary-bounded; the running sum windows over the value
    domain, not rows (the q_zipf_slope waiver class); everything else
    is a |sources|-row aggregate against one broadcast total row.
    """
    d = load_table(spark, sf_dir, "documents")
    vc = d.groupBy(F.col("n_chars").alias("v")).agg(F.count(F.lit(1)).alias("c"))
    vc = bounded_window_input(vc, label="q_effect_sizes value domain")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    mid = vc.select(
        "v",
        (F.coalesce(F.sum("c").over(w), F.lit(0)) + (F.col("c") + 1.0) / 2).alias(
            "midrank"
        ),
    )
    gv = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cg")
    )
    g = (
        gv.join(mid, "v")
        .groupBy("source")
        .agg(
            F.sum("cg").alias("n_g"),
            F.sum(F.col("cg") * F.col("v")).alias("sum_g"),
            F.sum(F.col("cg") * F.col("v") * F.col("v")).alias("sumsq_g"),
            F.sum(F.col("cg") * F.col("midrank")).alias("r_g"),
        )
    )
    tot = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )
    n_r = F.col("n") - F.col("n_g")
    mean_g = F.col("sum_g") / F.col("n_g")
    mean_r = (F.col("s") - F.col("sum_g")) / n_r
    var_g = (F.col("sumsq_g") - F.col("sum_g") * F.col("sum_g") / F.col("n_g")) / (
        F.col("n_g") - 1
    )
    var_r = (
        (F.col("ss") - F.col("sumsq_g")) - (F.col("s") - F.col("sum_g")) ** 2 / n_r
    ) / (n_r - 1)
    pooled_sd = F.sqrt(
        ((F.col("n_g") - 1) * var_g + (n_r - 1) * var_r) / (F.col("n_g") + n_r - 2)
    )
    delta = (
        2.0
        * (F.col("r_g") - F.col("n_g") * (F.col("n_g") + 1.0) / 2)
        / (F.col("n_g") * n_r)
        - 1.0
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_g").alias("n_docs"),
            F.round(mean_g, 6).alias("mean_chars"),
            F.round((mean_g - mean_r) / pooled_sd, 6).alias("cohens_d"),
            F.round(delta, 6).alias("cliffs_delta"),
            F.when(F.abs(delta) < 0.147, "negligible")
            .when(F.abs(delta) < 0.33, "small")
            .when(F.abs(delta) < 0.474, "medium")
            .otherwise("large")
            .alias("magnitude"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Poisson bootstrap CI (distributed resampling without a reshuffle)
# --------------------------------------------------------------------------
BOOT_B = 32  # bootstrap replicates
#: cumulative Poisson(1) CDF at k = 0..8, exact to 10dp — the inverse-CDF
#: ladder both engines share; P(X > 8 | lambda=1) ~ 1e-6, so the ladder
#: truncates at 9 identically on both sides.
_POIS1_CDF = (
    "0.3678794412",
    "0.7357588823",
    "0.9196986029",
    "0.9810118431",
    "0.9963401532",
    "0.9994058152",
    "0.9999167589",
    "0.9999897508",
    "0.9999988771",
)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {branches} ELSE 9 END"


@query(
    "q_poisson_bootstrap_ci",
    oracle=f"""
    WITH rep AS (
      SELECT event_type, b,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             (CAST('0x' || substr(md5('boot:' || CAST(b AS VARCHAR) || ':'
                    || CAST(event_id AS VARCHAR)), 1, 13) AS BIGINT) + 0.5)
               / 4503599627370496.0 AS u
      FROM events, generate_series(0, {BOOT_B - 1}) AS g(b)
    ),
    means AS (
      SELECT event_type, b,
             sum(cents * {_pois_case_sql('u')}) * 1.0
               / (100.0 * sum({_pois_case_sql('u')})) AS m
      FROM rep GROUP BY event_type, b
    ),
    point AS (
      SELECT event_type, avg(value) AS mean_value,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    )
    SELECT p.event_type, p.n,
           round(p.mean_value, 6) AS mean_value,
           round(CAST(quantile_cont(ms.m, 0.025) AS DOUBLE), 6) AS ci_lo,
           round(CAST(quantile_cont(ms.m, 0.975) AS DOUBLE), 6) AS ci_hi,
           round(stddev_samp(ms.m), 6) AS boot_se
    FROM means ms JOIN point p USING (event_type)
    GROUP BY p.event_type, p.n, p.mean_value
    ORDER BY p.event_type
    """,
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap percentile CI for the mean value per event
    type (Chamandy et al. 2012, "Estimating uncertainty for massive
    data streams" — the Google recipe): each row enters replicate b
    with weight ~ Poisson(1), so a replicate is a valid bootstrap
    resample WITHOUT any global reshuffle or resample-by-index — the
    only bootstrap that distributes: weights are a row-local function
    of (row id, replicate), replicate means are one groupBy, and no
    executor ever needs to see the whole dataset.

    The weight draw is the repo's engine-portable determinism pattern:
    u = md5-seeded 52-bit uniform → inverse Poisson(1) CDF via a
    10dp-exact literal threshold ladder (truncated at k=9, beyond the
    draw resolution). Replicate means use exact integer cents, so both
    engines compute identical rationals; the percentile is the shared
    interpolated definition (the ``q_theil_sen_trend`` convention).

    Scale: the ×{BOOT_B} replicate amplification is map-local (a
    sequence explode feeding a map-side-combined aggregate) — the
    shuffle carries only (type, b) partial sums, {BOOT_B}× the
    GROUP-BY domain, not the corpus. At 100 TB raise B and/or swap
    the statistic; the shape is unchanged.
    """
    e = load_table(spark, sf_dir, "events")
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    rep = e.select("event_type", "event_id", "value", b)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4503599627370496.0
    w = F.lit(9)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < float(_POIS1_CDF[k]), k).otherwise(w)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    means = (
        rep.select("event_type", "b", (cents * w).alias("wc"), w.alias("w"))
        .groupBy("event_type", "b")
        .agg((F.sum("wc") / (100.0 * F.sum("w"))).alias("m"))
    )
    point = e.groupBy("event_type").agg(
        F.avg("value").alias("mean_value"), F.count(F.lit(1)).alias("n")
    )
    return (
        means.groupBy("event_type")
        .agg(
            F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
            F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"),
            F.round(F.stddev_samp("m"), 6).alias("boot_se"),
        )
        .join(point, "event_type")
        .select(
            "event_type",
            "n",
            F.round("mean_value", 6).alias("mean_value"),
            "ci_lo",
            "ci_hi",
            "boot_se",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# --------------------------------------------------------------------------
CUPED_BOUNDARY = "2024-01-16"  # first 15 days = pre-period covariate


@query(
    "q_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             sum(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS x,
             sum(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM per_user
    ),
    theta AS (
      SELECT n,
             (sxy - sx * sy * 1.0 / n) / (sxx - sx * sx * 1.0 / n) AS th,
             sx * 1.0 / n AS xbar,
             (syy - sy * sy * 1.0 / n)
               - pow(sxy - sx * sy * 1.0 / n, 2) / (sxx - sx * sx * 1.0 / n)
               AS ss_adj,
             syy - sy * sy * 1.0 / n AS ss_raw
      FROM mom
    ),
    arms AS (
      SELECT p.arm,
             CAST(count(*) AS BIGINT) AS n_users,
             avg((p.y - t.th * (p.x - t.xbar)) / 100.0) AS adj_mean,
             avg(p.y / 100.0) AS raw_mean
      FROM per_user p, theta t
      GROUP BY p.arm
    )
    SELECT a.arm, a.n_users,
           round(a.raw_mean, 6) AS raw_mean,
           round(a.adj_mean, 6) AS adjusted_mean,
           round(t.th, 6) AS theta,
           round(100.0 * (1.0 - t.ss_adj / t.ss_raw), 6) AS var_reduction_pct
    FROM arms a, theta t
    ORDER BY a.arm
    """,
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    each user's post-period purchase total y is adjusted by its
    pre-period total x — ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x) —
    shrinking between-user variance by the squared pre/post
    correlation WITHOUT biasing the treatment contrast (x predates
    assignment, so E[x|A] = E[x|B]). The same 'exp7' hash arms as
    ``q_ab_lift`` / ``q_mann_whitney`` / ``q_welch_ttest``, making
    this the variance-reduction member of the experimentation shelf;
    var_reduction_pct is the effective sample-size multiplier an
    experimenter buys by logging the pre-period.

    Hash-exactness: per-user totals are exact integer cents; θ, x̄ and
    the SS terms come from one exact-integer moment row, so every
    downstream double is a deterministic expression of integers
    (6dp-rounded). Pooled θ (the paper's choice) keeps the estimator
    a single linear adjustment on both arms.

    Scale: one per-user rollup (map-side combine), one 6-term moment
    aggregate broadcast back over the per-user frame — no window, no
    second shuffle of raw events.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pre = F.to_date("ts") < CUPED_BOUNDARY
    per_user = (
        e.select("user_id", arm.alias("arm"), cents.alias("cents"), pre.alias("pre"))
        .groupBy("user_id", "arm")
        .agg(
            F.sum(F.when(F.col("pre"), F.col("cents")).otherwise(0)).alias("x"),
            F.sum(F.when(~F.col("pre"), F.col("cents")).otherwise(0)).alias("y"),
        )
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vyy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    theta = mom.select(
        (cxy / vxx).alias("th"),
        (F.col("sx") / F.col("n")).alias("xbar"),
        (vyy - cxy**2 / vxx).alias("ss_adj"),
        vyy.alias("ss_raw"),
    )
    arms = (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.avg(F.col("y") / 100.0).alias("raw_mean"),
            F.avg(
                (F.col("y") - F.col("th") * (F.col("x") - F.col("xbar"))) / 100.0
            ).alias("adj_mean"),
            F.first("th").alias("th"),
            F.first("ss_adj").alias("ss_adj"),
            F.first("ss_raw").alias("ss_raw"),
        )
    )
    return arms.select(
        "arm",
        "n_users",
        F.round("raw_mean", 6).alias("raw_mean"),
        F.round("adj_mean", 6).alias("adjusted_mean"),
        F.round("th", 6).alias("theta"),
        F.round(100.0 * (1.0 - F.col("ss_adj") / F.col("ss_raw")), 6).alias(
            "var_reduction_pct"
        ),
    ).orderBy("arm")


# --------------------------------------------------------------------------
# OLS regression diagnostics (residuals, leverage, Cook's distance)
# --------------------------------------------------------------------------
@query(
    "q_regression_diagnostics",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, day, y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS x
      FROM daily
    ),
    mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM d GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             sx * 1.0 / n AS xbar,
             (sxy - sx * sy * 1.0 / n) / (sxx - sx * sx * 1.0 / n) AS slope,
             sy * 1.0 / n - (sxy - sx * sy * 1.0 / n)
               / (sxx - sx * sx * 1.0 / n) * (sx * 1.0 / n) AS icept,
             sxx - sx * sx * 1.0 / n AS ssx,
             ((syy - sy * sy * 1.0 / n)
              - pow(sxy - sx * sy * 1.0 / n, 2)
                / (sxx - sx * sx * 1.0 / n)) / (n - 2) AS s2
      FROM mom
    )
    SELECT d.event_type, d.day, CAST(d.x AS BIGINT) AS x,
           round(d.y / 100.0, 6) AS y,
           round((d.y - (f.icept + f.slope * d.x)) / 100.0, 6) AS residual,
           round(1.0 / f.n + pow(d.x - f.xbar, 2) / f.ssx, 6) AS leverage,
           round((d.y - (f.icept + f.slope * d.x))
                 / (sqrt(f.s2) * sqrt(1 - (1.0 / f.n
                    + pow(d.x - f.xbar, 2) / f.ssx))), 6) AS std_residual,
           round(pow((d.y - (f.icept + f.slope * d.x))
                     / (sqrt(f.s2) * sqrt(1 - (1.0 / f.n
                        + pow(d.x - f.xbar, 2) / f.ssx))), 2)
                 * (1.0 / f.n + pow(d.x - f.xbar, 2) / f.ssx)
                 / (2 * (1 - (1.0 / f.n + pow(d.x - f.xbar, 2) / f.ssx))), 6)
             AS cooks_d,
           pow((d.y - (f.icept + f.slope * d.x))
               / (sqrt(f.s2) * sqrt(1 - (1.0 / f.n
                  + pow(d.x - f.xbar, 2) / f.ssx))), 2)
             * (1.0 / f.n + pow(d.x - f.xbar, 2) / f.ssx)
             / (2 * (1 - (1.0 / f.n + pow(d.x - f.xbar, 2) / f.ssx)))
             > 4.0 / f.n AS influential
    FROM d JOIN fit f USING (event_type)
    ORDER BY d.event_type, d.day
    """,
)
def q_regression_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-observation OLS diagnostics for the daily-total-on-index fit
    (the ``q_agg_regression`` / ``q_holt_linear_trend`` series):
    residual, leverage h = 1/n + (x−x̄)²/Sxx, internally studentized
    residual e/(s√(1−h)), and Cook's distance D = r²h/(p(1−h)) with
    p = 2, flagged at the standard 4/n cut — the "which day broke the
    trend fit?" readout that turns the suite's regression AGGREGATES
    into an observation-level audit (regression's answer to
    ``q_anomaly_trailing``).

    Hash-exactness: all moments are exact integer cent sums (Σy² fits a 64-bit long through ~sf1; demean-first or DECIMAL(38) sums past that); the
    slope/intercept/s² live on one |series|-row fit frame; every
    diagnostic is a deterministic double expression of those plus the
    row's own exact (x, y) — 6dp-rounded, with the influence flag
    comparing the unrounded D identically on both sides.

    Scale: the corpus collapses to types×days before anything
    per-observation happens; diagnostics are a broadcast join of the
    tiny fit frame back onto the daily frame — no second pass over raw
    events, no window wider than a series.
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(micro).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select(
        "event_type", "day", "y", F.row_number().over(w).cast("long").alias("x")
    )
    mom = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ssx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    ssy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    fit = mom.select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("xbar"),
        (cxy / ssx).alias("slope"),
        (F.col("sy") / F.col("n") - (cxy / ssx) * (F.col("sx") / F.col("n"))).alias(
            "icept"
        ),
        ssx.alias("ssx"),
        ((ssy - cxy**2 / ssx) / (F.col("n") - 2)).alias("s2"),
    )
    resid = F.col("y") - (F.col("icept") + F.col("slope") * F.col("x"))
    lev = 1.0 / F.col("n") + (F.col("x") - F.col("xbar")) ** 2 / F.col("ssx")
    std_r = resid / (F.sqrt("s2") * F.sqrt(1 - lev))
    cooks = std_r**2 * lev / (2 * (1 - lev))
    return (
        d.join(F.broadcast(fit), "event_type")
        .select(
            "event_type",
            "day",
            "x",
            F.round(F.col("y") / 100.0, 6).alias("y"),
            F.round(resid / 100.0, 6).alias("residual"),
            F.round(lev, 6).alias("leverage"),
            F.round(std_r, 6).alias("std_residual"),
            F.round(cooks, 6).alias("cooks_d"),
            (cooks > 4.0 / F.col("n")).alias("influential"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Difference-in-differences (pre/post × arm 2×2 with a z readout)
# --------------------------------------------------------------------------
@query(
    "q_diff_in_diff",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             sum(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               / 100.0 AS y_pre,
             sum(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               / 100.0 AS y_post
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             avg(y_pre) AS mean_pre, avg(y_post) AS mean_post,
             var_samp(y_post - y_pre) AS var_delta
      FROM per_user GROUP BY arm
    ),
    wide AS (
      SELECT
        max(CASE WHEN arm = 'A' THEN n_users END) AS n_a,
        max(CASE WHEN arm = 'B' THEN n_users END) AS n_b,
        max(CASE WHEN arm = 'A' THEN mean_pre END) AS pre_a,
        max(CASE WHEN arm = 'A' THEN mean_post END) AS post_a,
        max(CASE WHEN arm = 'B' THEN mean_pre END) AS pre_b,
        max(CASE WHEN arm = 'B' THEN mean_post END) AS post_b,
        max(CASE WHEN arm = 'A' THEN var_delta END) AS var_a,
        max(CASE WHEN arm = 'B' THEN var_delta END) AS var_b
      FROM arms
    )
    SELECT n_a, n_b,
           round(pre_a, 6) AS pre_a, round(post_a, 6) AS post_a,
           round(pre_b, 6) AS pre_b, round(post_b, 6) AS post_b,
           round((post_b - pre_b) - (post_a - pre_a), 6) AS did_estimate,
           round(((post_b - pre_b) - (post_a - pre_a))
                 / sqrt(var_a / n_a + var_b / n_b), 6) AS z
    FROM wide
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the 2×2 (arm × pre/post) design
    (Card & Krueger 1994 canonical form): DiD = (B_post − B_pre) −
    (A_post − A_pre) on per-user purchase totals, with the z readout
    from the per-user delta variances — the parallel-trends causal
    estimator completing the experimentation shelf next to the raw
    lift (``q_ab_lift``), the variance-reduced contrast
    (``q_cuped_adjustment``) and the nonparametric test
    (``q_mann_whitney``); same 'exp7' arms and the same
    {CUPED_BOUNDARY} period boundary as CUPED, so the three causal
    readouts are directly comparable.

    Hash-exactness: per-user period totals are exact integer cents;
    cell means, delta variances, the estimate and z are deterministic
    double expressions of those (6dp-rounded). The conditional-max
    pivot is exact (one row per arm by construction).

    Scale: one per-user rollup with map-side combine, one 2-row arm
    aggregate, one 1-row pivot. Nothing else touches raw events.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pre = F.to_date("ts") < CUPED_BOUNDARY
    per_user = (
        e.select("user_id", arm.alias("arm"), cents.alias("c"), pre.alias("pre"))
        .groupBy("user_id", "arm")
        .agg(
            (F.sum(F.when(F.col("pre"), F.col("c")).otherwise(0)) / 100.0).alias(
                "y_pre"
            ),
            (F.sum(F.when(~F.col("pre"), F.col("c")).otherwise(0)) / 100.0).alias(
                "y_post"
            ),
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("y_pre").alias("mean_pre"),
        F.avg("y_post").alias("mean_post"),
        F.var_samp(F.col("y_post") - F.col("y_pre")).alias("var_delta"),
    )

    def cell(a: str, col: str):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = arms.agg(
        cell("A", "n_users").alias("n_a"),
        cell("B", "n_users").alias("n_b"),
        cell("A", "mean_pre").alias("pre_a"),
        cell("A", "mean_post").alias("post_a"),
        cell("B", "mean_pre").alias("pre_b"),
        cell("B", "mean_post").alias("post_b"),
        cell("A", "var_delta").alias("var_a"),
        cell("B", "var_delta").alias("var_b"),
    )
    did = (F.col("post_b") - F.col("pre_b")) - (F.col("post_a") - F.col("pre_a"))
    return wide.select(
        "n_a",
        "n_b",
        F.round("pre_a", 6).alias("pre_a"),
        F.round("post_a", 6).alias("post_a"),
        F.round("pre_b", 6).alias("pre_b"),
        F.round("post_b", 6).alias("post_b"),
        F.round(did, 6).alias("did_estimate"),
        F.round(
            did / F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")),
            6,
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# Inverse-propensity-weighted ATE (stratified Hájek estimator)
# --------------------------------------------------------------------------
IPW_STRATA = 4


@query(
    "q_ipw_ate",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) FILTER (WHERE CAST(ts AS DATE)
               < DATE '{CUPED_BOUNDARY}') AS BIGINT) AS pre_n,
             CAST(count(*) FILTER (WHERE event_type = 'error'
               AND CAST(ts AS DATE) < DATE '{CUPED_BOUNDARY}') AS BIGINT)
               AS pre_err,
             sum(CASE WHEN event_type = 'purchase'
                      AND CAST(ts AS DATE) >= DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) / 100.0 AS y
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT sum(pre_n) AS tn, sum(pre_err) AS te,
             max(pre_n) AS maxn
      FROM per_user
    ),
    assigned AS (
      SELECT u.user_id, u.y,
             CASE WHEN u.pre_err * t.tn > u.pre_n * t.te THEN 1 ELSE 0 END
               AS treated,
             least(CAST(floor({IPW_STRATA}.0 * u.pre_n / (t.maxn + 1))
                     AS BIGINT), {IPW_STRATA - 1}) AS stratum
      FROM per_user u, tot t
    ),
    prop AS (
      SELECT stratum, avg(CAST(treated AS DOUBLE)) AS p
      FROM assigned GROUP BY stratum
    ),
    supported AS (
      SELECT a.*, p.p FROM assigned a JOIN prop p USING (stratum)
      WHERE p.p > 0 AND p.p < 1
    ),
    est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(count(DISTINCT stratum) AS BIGINT) AS n_strata,
             sum(treated * y / p) / sum(treated / p) AS e1,
             sum((1 - treated) * y / (1 - p)) / sum((1 - treated) / (1 - p))
               AS e0,
             avg(CASE WHEN treated = 1 THEN y END)
               - avg(CASE WHEN treated = 0 THEN y END) AS naive
      FROM supported
    )
    SELECT n_users, n_strata,
           round(e1, 6) AS mean_treated_ipw,
           round(e0, 6) AS mean_control_ipw,
           round(e1 - e0, 6) AS ipw_ate,
           round(naive, 6) AS naive_diff
    FROM est
    """,
)
def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified inverse-propensity-weighted ATE (Horvitz-Thompson
    weighting with the Hájek normalization; Rosenbaum & Rubin 1983):
    an OBSERVATIONAL treatment — the user was error-prone in the
    pre-period relative to the corpus rate (exact integer
    cross-multiply, no float ratio) — whose effect on post-period
    purchase total is estimated by weighting each user by 1/p̂ (treated)
    or 1/(1−p̂) (control), with the propensity p̂ estimated per
    pre-activity STRATUM and strata outside common support
    (p̂ ∈ {{0,1}}) excluded on both engines identically. The naive
    treated-minus-control difference is emitted alongside — the gap
    between the two IS the confounding this estimator removes; the
    causal shelf is now randomized lift → CUPED → DiD → observational
    IPW.

    Hash-exactness: treatment and strata are exact integer decisions
    (strata cut against the broadcast max, not a global ntile
    window); p̂ is a rational of counts; the weighted sums carry only
    reassociation noise under the 6dp round.

    Scale: one per-user rollup, one broadcast 3-scalar total row, one
    |strata|-row propensity aggregate joined back — no global window,
    no second pass over raw events.
    """
    e = load_table(spark, sf_dir, "events")
    pre = F.to_date("ts") < CUPED_BOUNDARY
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.count_if(pre).alias("pre_n"),
        F.count_if(pre & (F.col("event_type") == "error")).alias("pre_err"),
        (
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & ~pre, cents
                ).otherwise(0)
            )
            / 100.0
        ).alias("y"),
    )
    tot = per_user.agg(
        F.sum("pre_n").alias("tn"),
        F.sum("pre_err").alias("te"),
        F.max("pre_n").alias("maxn"),
    )
    assigned = per_user.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "y",
        F.when(
            F.col("pre_err") * F.col("tn") > F.col("pre_n") * F.col("te"), 1
        )
        .otherwise(0)
        .alias("treated"),
        F.least(
            F.floor(float(IPW_STRATA) * F.col("pre_n") / (F.col("maxn") + 1)).cast(
                "long"
            ),
            F.lit(IPW_STRATA - 1),
        ).alias("stratum"),
    )
    prop = assigned.groupBy("stratum").agg(
        F.avg(F.col("treated").cast("double")).alias("p")
    )
    supported = assigned.join(
        prop.filter((F.col("p") > 0) & (F.col("p") < 1)), "stratum"
    )
    est = supported.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_distinct("stratum").alias("n_strata"),
        (
            F.sum(F.col("treated") * F.col("y") / F.col("p"))
            / F.sum(F.col("treated") / F.col("p"))
        ).alias("e1"),
        (
            F.sum((1 - F.col("treated")) * F.col("y") / (1 - F.col("p")))
            / F.sum((1 - F.col("treated")) / (1 - F.col("p")))
        ).alias("e0"),
        (
            F.avg(F.when(F.col("treated") == 1, F.col("y")))
            - F.avg(F.when(F.col("treated") == 0, F.col("y")))
        ).alias("naive"),
    )
    return est.select(
        "n_users",
        "n_strata",
        F.round("e1", 6).alias("mean_treated_ipw"),
        F.round("e0", 6).alias("mean_control_ipw"),
        F.round(F.col("e1") - F.col("e0"), 6).alias("ipw_ate"),
        F.round("naive", 6).alias("naive_diff"),
    )


# --------------------------------------------------------------------------
# Split-conformal prediction intervals for the daily OLS forecast
# --------------------------------------------------------------------------
CONFORMAL_TRAIN_DAYS = 20
CONFORMAL_CALIB_DAYS = 5
CONFORMAL_ALPHA = 0.2  # 80% nominal coverage


@query(
    "q_conformal_interval",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, day, y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS x
      FROM daily
    ),
    fit AS (
      SELECT event_type, count(*) AS n, 
             (sum(x * y) - sum(x) * sum(y) * 1.0 / count(*))
               / (sum(x * x) - sum(x) * sum(x) * 1.0 / count(*)) AS slope,
             sum(y) * 1.0 / count(*)
               - (sum(x * y) - sum(x) * sum(y) * 1.0 / count(*))
                 / (sum(x * x) - sum(x) * sum(x) * 1.0 / count(*))
                 * (sum(x) * 1.0 / count(*)) AS icept
      FROM d WHERE x <= {CONFORMAL_TRAIN_DAYS}
      GROUP BY event_type
    ),
    calib AS (
      SELECT d.event_type,
             abs(d.y - (f.icept + f.slope * d.x)) AS r,
             row_number() OVER (PARTITION BY d.event_type
               ORDER BY abs(d.y - (f.icept + f.slope * d.x)), d.x) AS rk,
             count(*) OVER (PARTITION BY d.event_type) AS m
      FROM d JOIN fit f USING (event_type)
      WHERE d.x > {CONFORMAL_TRAIN_DAYS}
        AND d.x <= {CONFORMAL_TRAIN_DAYS + CONFORMAL_CALIB_DAYS}
    ),
    qhat AS (
      SELECT event_type, r AS q
      FROM calib
      WHERE rk = least(CAST(ceil((m + 1) * (1.0 - {CONFORMAL_ALPHA}))
                         AS BIGINT), m)
    ),
    test AS (
      SELECT d.event_type,
             count(*) AS n_test,
             sum(CASE WHEN abs(d.y - (f.icept + f.slope * d.x)) <= q.q
                      THEN 1 ELSE 0 END) AS covered
      FROM d JOIN fit f USING (event_type) JOIN qhat q USING (event_type)
      WHERE d.x > {CONFORMAL_TRAIN_DAYS + CONFORMAL_CALIB_DAYS}
      GROUP BY d.event_type
    )
    SELECT t.event_type,
           CAST(t.n_test AS BIGINT) AS n_test,
           round(q.q / 100.0, 6) AS q_hat,
           round(t.covered * 1.0 / t.n_test, 6) AS coverage
    FROM test t JOIN qhat q USING (event_type)
    ORDER BY t.event_type
    """,
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al. 2005; Lei et
    al. 2018) for the daily OLS forecast: fit on days
    1..{CONFORMAL_TRAIN_DAYS}, take the k-th smallest absolute
    residual on the next {CONFORMAL_CALIB_DAYS} calibration days with
    k = ⌈(m+1)(1−α)⌉ (α={CONFORMAL_ALPHA}), and report how often
    ŷ ± q̂ covers the remaining test days — the DISTRIBUTION-FREE
    uncertainty wrapper: unlike the Greenwood/Gaussian bands
    elsewhere in the suite, its ≥(1−α) marginal coverage holds for
    ANY residual distribution, which is why conformal wrappers are
    the current standard for production forecast monitoring.

    Hash-exactness: the fit is exact-integer-moment OLS; the
    conformal quantile is an ORDER STATISTIC (row_number by residual
    then day — no interpolation, so no float percentile semantics to
    reconcile); coverage compares |residual| ≤ q̂ on exact inputs
    identically on both engines.

    Scale: the corpus collapses to types×days; every window is
    per-series over that frame; the fit and q̂ are |series|-row
    broadcasts onto it.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("y")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    d = daily.select(
        "event_type", "y", F.row_number().over(w_ord).cast("long").alias("x")
    )
    train = d.filter(F.col("x") <= CONFORMAL_TRAIN_DAYS)
    mom = train.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    fit = mom.select(
        "event_type",
        slope.alias("slope"),
        (F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n")).alias("icept"),
    )
    resid = F.abs(F.col("y") - (F.col("icept") + F.col("slope") * F.col("x")))
    w_r = Window.partitionBy("event_type").orderBy(resid.asc(), F.col("x"))
    w_m = Window.partitionBy("event_type")
    calib = (
        d.filter(
            (F.col("x") > CONFORMAL_TRAIN_DAYS)
            & (F.col("x") <= CONFORMAL_TRAIN_DAYS + CONFORMAL_CALIB_DAYS)
        )
        .join(F.broadcast(fit), "event_type")
        .select(
            "event_type",
            resid.alias("r"),
            F.row_number().over(w_r).alias("rk"),
            F.count(F.lit(1)).over(w_m).alias("m"),
        )
    )
    qhat = calib.filter(
        F.col("rk")
        == F.least(
            F.ceil((F.col("m") + 1) * (1.0 - CONFORMAL_ALPHA)).cast("long"),
            F.col("m"),
        )
    ).select("event_type", F.col("r").alias("q"))
    test = (
        d.filter(F.col("x") > CONFORMAL_TRAIN_DAYS + CONFORMAL_CALIB_DAYS)
        .join(F.broadcast(fit), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(resid <= F.col("q"), 1).otherwise(0)).alias("covered"),
            F.first("q").alias("q"),
        )
    )
    return test.select(
        "event_type",
        "n_test",
        F.round(F.col("q") / 100.0, 6).alias("q_hat"),
        F.round(F.col("covered") / F.col("n_test"), 6).alias("coverage"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Group-sequential monitoring (O'Brien-Fleming boundary at K looks)
# --------------------------------------------------------------------------
OBF_LOOKS = 5
OBF_C = 2.0403  # classical O'Brien-Fleming constant, K=5, two-sided alpha=.05


@query(
    "q_sequential_obrien_fleming",
    oracle=f"""
    WITH looks AS (SELECT k FROM generate_series(1, {OBF_LOOKS}) AS g(k)),
    assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS d
      FROM events WHERE event_type = 'purchase'
    ),
    cum AS (
      SELECT l.k, a.arm,
             CAST(count(*) AS BIGINT) AS n,
             sum(a.cents) AS s, sum(a.cents * a.cents) AS ss
      FROM looks l JOIN assigned a ON a.d <= l.k * (30 / {OBF_LOOKS})
      GROUP BY l.k, a.arm
    ),
    wide AS (
      SELECT k,
             max(CASE WHEN arm = 'A' THEN n END) AS n_a,
             max(CASE WHEN arm = 'B' THEN n END) AS n_b,
             max(CASE WHEN arm = 'A' THEN s END) AS s_a,
             max(CASE WHEN arm = 'B' THEN s END) AS s_b,
             max(CASE WHEN arm = 'A' THEN ss END) AS ss_a,
             max(CASE WHEN arm = 'B' THEN ss END) AS ss_b
      FROM cum GROUP BY k
    ),
    z AS (
      SELECT k, n_a, n_b,
             ((s_b * 1.0 / n_b) - (s_a * 1.0 / n_a)) / 100.0
               / sqrt(((ss_a - s_a * s_a * 1.0 / n_a) / (n_a - 1) / n_a
                       + (ss_b - s_b * s_b * 1.0 / n_b) / (n_b - 1) / n_b)
                      / 10000.0) AS zk
      FROM wide
    )
    SELECT CAST(k AS BIGINT) AS look, CAST(k * (30 / {OBF_LOOKS}) AS BIGINT)
             AS day_cut,
           n_a, n_b,
           round(zk, 6) AS z,
           round({OBF_C} * sqrt({OBF_LOOKS} * 1.0 / k), 6) AS obf_bound,
           abs(zk) > {OBF_C} * sqrt({OBF_LOOKS} * 1.0 / k) AS crossed
    FROM z ORDER BY look
    """,
)
def q_sequential_obrien_fleming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring with the O'Brien-Fleming
    boundary (O'Brien & Fleming 1979; Pocock 1977 frames the
    alternative): the z statistic for the arm difference is evaluated
    at {OBF_LOOKS} interim looks (every 6 days of the 30-day window)
    against the shrinking boundary C·√(K/k) (C={OBF_C}, the classical
    two-sided α=0.05 constant) — early looks need overwhelming
    evidence, the final look needs ≈1.96σ+, and the overall type-I
    error stays controlled. This is the PEEKING-SAFE member of the
    experimentation shelf: ``q_ab_lift``'s fixed-horizon z is invalid
    the moment a dashboard refreshes daily; this is what that
    dashboard should compute instead (``q_cusum_drift`` is the same
    idea for drift rather than treatment effects).

    Hash-exactness: per-look cumulative moments are exact integer
    cents (one conditional-max pivot per look); z and the boundary
    are deterministic double expressions, 6dp-rounded; the crossing
    flag compares the unrounded z identically on both sides.

    Scale: the look spine (K rows) joins the purchase stream on a
    day-cut inequality — a broadcast-spine range join amplifying each
    event ≤K times into a map-side-combined (look, arm) aggregate;
    everything after is a K-row frame.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    assigned = e.select(
        arm.alias("arm"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) + 1).alias(
            "d"
        ),
    )
    step = 30 // OBF_LOOKS
    looks = spark.range(1, OBF_LOOKS + 1).select(F.col("id").alias("k"))
    cum = (
        F.broadcast(looks)
        .join(assigned, assigned["d"] <= F.col("k") * step)
        .groupBy("k", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("ss"),
        )
    )

    def cell(a: str, col: str):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = cum.groupBy("k").agg(
        cell("A", "n").alias("n_a"),
        cell("B", "n").alias("n_b"),
        cell("A", "s").alias("s_a"),
        cell("B", "s").alias("s_b"),
        cell("A", "ss").alias("ss_a"),
        cell("B", "ss").alias("ss_b"),
    )
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    zk = ((F.col("s_b") / F.col("n_b")) - (F.col("s_a") / F.col("n_a"))) / 100.0 / (
        F.sqrt((var_a / F.col("n_a") + var_b / F.col("n_b")) / 10000.0)
    )
    bound = OBF_C * F.sqrt(F.lit(float(OBF_LOOKS)) / F.col("k"))
    return wide.select(
        F.col("k").alias("look"),
        (F.col("k") * step).cast("long").alias("day_cut"),
        "n_a",
        "n_b",
        F.round(zk, 6).alias("z"),
        F.round(bound, 6).alias("obf_bound"),
        (F.abs(zk) > bound).alias("crossed"),
    ).orderBy("look")


# --------------------------------------------------------------------------
# Doubly-robust ATE (AIPW: augmented inverse-propensity weighting)
# --------------------------------------------------------------------------
@query(
    "q_doubly_robust_ate",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) FILTER (WHERE CAST(ts AS DATE)
               < DATE '{CUPED_BOUNDARY}') AS BIGINT) AS pre_n,
             CAST(count(*) FILTER (WHERE event_type = 'error'
               AND CAST(ts AS DATE) < DATE '{CUPED_BOUNDARY}') AS BIGINT)
               AS pre_err,
             sum(CASE WHEN event_type = 'purchase'
                      AND CAST(ts AS DATE) >= DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) / 100.0 AS y
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT sum(pre_n) AS tn, sum(pre_err) AS te, max(pre_n) AS maxn
      FROM per_user
    ),
    assigned AS (
      SELECT u.user_id, u.y,
             CASE WHEN u.pre_err * t.tn > u.pre_n * t.te THEN 1 ELSE 0 END
               AS treated,
             least(CAST(floor({IPW_STRATA}.0 * u.pre_n / (t.maxn + 1))
                     AS BIGINT), {IPW_STRATA - 1}) AS stratum
      FROM per_user u, tot t
    ),
    strat AS (
      SELECT stratum, avg(CAST(treated AS DOUBLE)) AS p,
             avg(CASE WHEN treated = 1 THEN y END) AS m1,
             avg(CASE WHEN treated = 0 THEN y END) AS m0
      FROM assigned GROUP BY stratum
    ),
    supported AS (
      SELECT a.*, s.p, s.m1, s.m0
      FROM assigned a JOIN strat s USING (stratum)
      WHERE s.p > 0 AND s.p < 1
    ),
    est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             avg(treated * (y - m1) / p + m1) AS mu1,
             avg((1 - treated) * (y - m0) / (1 - p) + m0) AS mu0,
             avg(CASE WHEN treated = 1 THEN y END)
               - avg(CASE WHEN treated = 0 THEN y END) AS naive
      FROM supported
    )
    SELECT n_users,
           round(mu1, 6) AS mean_treated_dr,
           round(mu0, 6) AS mean_control_dr,
           round(mu1 - mu0, 6) AS dr_ate,
           round(naive, 6) AS naive_diff
    FROM est
    """,
)
def q_doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust / AIPW average treatment effect (Robins, Rotnitzky
    & Zhao 1994; Bang & Robins 2005): μ̂₁ = avg(T(Y−m̂₁)/p̂ + m̂₁),
    μ̂₀ symmetric — the estimator stays CONSISTENT if EITHER the
    propensity model OR the outcome model is right, which is why it
    is the production default over plain IPW (``q_ipw_ate``, whose
    treatment/strata construction this shares verbatim: error-prone
    users by exact integer cross-multiply, activity strata against a
    broadcast max). Here both nuisance models are per-stratum
    empirical means, so the augmentation term also shows exactly how
    much the outcome model corrects the reweighting on this data.

    Hash-exactness: p̂/m̂₁/m̂₀ are per-stratum rationals of exact
    integers and exact cent sums; the influence-function average is
    one deterministic pass (6dp-rounded, reassociation-noise class);
    common-support filtering is identical on both engines.

    Scale: identical to IPW — one per-user rollup, one broadcast
    3-scalar row, one |strata|-row nuisance table joined back.
    """
    e = load_table(spark, sf_dir, "events")
    pre = F.to_date("ts") < CUPED_BOUNDARY
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.count_if(pre).alias("pre_n"),
        F.count_if(pre & (F.col("event_type") == "error")).alias("pre_err"),
        (
            F.sum(
                F.when((F.col("event_type") == "purchase") & ~pre, cents).otherwise(0)
            )
            / 100.0
        ).alias("y"),
    )
    tot = per_user.agg(
        F.sum("pre_n").alias("tn"),
        F.sum("pre_err").alias("te"),
        F.max("pre_n").alias("maxn"),
    )
    assigned = per_user.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "y",
        F.when(F.col("pre_err") * F.col("tn") > F.col("pre_n") * F.col("te"), 1)
        .otherwise(0)
        .alias("treated"),
        F.least(
            F.floor(float(IPW_STRATA) * F.col("pre_n") / (F.col("maxn") + 1)).cast(
                "long"
            ),
            F.lit(IPW_STRATA - 1),
        ).alias("stratum"),
    )
    strat = assigned.groupBy("stratum").agg(
        F.avg(F.col("treated").cast("double")).alias("p"),
        F.avg(F.when(F.col("treated") == 1, F.col("y"))).alias("m1"),
        F.avg(F.when(F.col("treated") == 0, F.col("y"))).alias("m0"),
    )
    supported = assigned.join(
        strat.filter((F.col("p") > 0) & (F.col("p") < 1)), "stratum"
    )
    est = supported.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg(
            F.col("treated") * (F.col("y") - F.col("m1")) / F.col("p") + F.col("m1")
        ).alias("mu1"),
        F.avg(
            (1 - F.col("treated")) * (F.col("y") - F.col("m0")) / (1 - F.col("p"))
            + F.col("m0")
        ).alias("mu0"),
        (
            F.avg(F.when(F.col("treated") == 1, F.col("y")))
            - F.avg(F.when(F.col("treated") == 0, F.col("y")))
        ).alias("naive"),
    )
    return est.select(
        "n_users",
        F.round("mu1", 6).alias("mean_treated_dr"),
        F.round("mu0", 6).alias("mean_control_dr"),
        F.round(F.col("mu1") - F.col("mu0"), 6).alias("dr_ate"),
        F.round("naive", 6).alias("naive_diff"),
    )


# --------------------------------------------------------------------------
# Sample-ratio mismatch guardrail (chi-square GOF on arm counts)
# --------------------------------------------------------------------------
SRM_CHI2_CRIT = 3.841459  # chi-square 1-dof, alpha = 0.05


@query(
    "q_sample_ratio_mismatch",
    oracle=f"""
    WITH arms AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    c AS (
      SELECT CAST(count(*) FILTER (arm = 'A') AS BIGINT) AS n_a,
             CAST(count(*) FILTER (arm = 'B') AS BIGINT) AS n_b
      FROM arms
    )
    SELECT n_a, n_b,
           round(n_a * 1.0 / (n_a + n_b), 6) AS frac_a,
           round(pow(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + pow(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0), 6)
             AS chi2,
           pow(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
             + pow(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
             > {SRM_CHI2_CRIT} AS srm_detected
    FROM c
    """,
)
def q_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (Fabijan et al. 2019 — "the
    most useful A/B test quality check"): chi-square goodness-of-fit
    of the observed arm USER counts against the designed 50/50 split,
    flagged at the 1-dof α=0.05 critical value {SRM_CHI2_CRIT}. An
    SRM means the randomization or logging is broken and every other
    readout on the experimentation shelf (lift, CUPED, DiD,
    sequential) is invalid — which is why this check gates them. The
    md5 'exp7' assignment audits itself here: a detected SRM on a
    hash split would indicate id-space skew in the hash prefix.

    Hash-exactness: user counts are exact integers off a distinct
    rollup; χ² is one deterministic expression; the flag compares the
    unrounded statistic identically on both engines.

    Scale: one distinct-user rollup (map-side partial distinct), one
    2-cell count — the cheapest query in the suite, as a guardrail
    should be.
    """
    e = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    c = (
        e.select("user_id")
        .distinct()
        .select(arm.alias("arm"))
        .agg(
            F.count_if(F.col("arm") == "A").alias("n_a"),
            F.count_if(F.col("arm") == "B").alias("n_b"),
        )
    )
    half = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (F.col("n_a") - half) ** 2 / half + (F.col("n_b") - half) ** 2 / half
    return c.select(
        "n_a",
        "n_b",
        F.round(F.col("n_a") / (F.col("n_a") + F.col("n_b")), 6).alias("frac_a"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > SRM_CHI2_CRIT).alias("srm_detected"),
    )


# --------------------------------------------------------------------------
# Empirical-Bayes rate shrinkage (beta-binomial, method of moments)
# --------------------------------------------------------------------------
EB_TOP_N = 20


@query(
    "q_eb_shrinkage",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS k
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT avg(k * 1.0 / n) AS m, var_samp(k * 1.0 / n) AS v
      FROM per_user
    ),
    prior AS (
      SELECT m, v,
             (m * (1 - m) / v - 1) * m AS alpha,
             (m * (1 - m) / v - 1) * (1 - m) AS beta
      FROM mom
    ),
    shrunk AS (
      SELECT u.user_id, u.n, u.k,
             u.k * 1.0 / u.n AS raw_rate,
             (u.k + p.alpha) / (u.n + p.alpha + p.beta) AS eb_rate,
             p.alpha AS alpha, p.beta AS beta
      FROM per_user u, prior p
    )
    SELECT user_id, n, k,
           round(raw_rate, 6) AS raw_rate,
           round(eb_rate, 6) AS eb_rate,
           round(alpha, 6) AS alpha,
           round(beta, 6) AS beta
    FROM shrunk
    ORDER BY round(abs(raw_rate - eb_rate), 6) DESC, user_id
    LIMIT {EB_TOP_N}
    """,
)
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-user purchase
    rates (Robbins 1956; the method-of-moments prior: α+β =
    m(1−m)/v − 1): each user's raw k/n is pulled toward the corpus
    prior in proportion to how little data they have — the estimator
    every leaderboard/CTR/quality-rate surface should show instead of
    raw rates, where a 1-for-2 user would otherwise outrank a
    490-for-1000 one. Reports the {EB_TOP_N} users the shrinkage
    moves most — exactly the small-sample cases the raw rate lies
    about. (James-Stein is this idea for Gaussian means; the
    beta-binomial version is the one rates need.)

    Hash-exactness: k/n are exact integers; the prior is one
    moment-row expression; ranking orders by the 6dp-ROUNDED
    shrinkage delta then user_id, so engine ulps cannot flip the
    cut (the knn tie rule).

    Scale: one per-user rollup, one broadcast 2-scalar moment row,
    and a TakeOrderedAndProject top-N (per-partition partial top-k,
    no global sort) — scale-safe as written.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("event_type") == "purchase").alias("k"),
    )
    rate = F.col("k") / F.col("n")
    mom = per_user.agg(
        F.avg(rate).alias("m"), F.var_samp(rate).alias("v")
    )
    strength = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    prior = mom.select(
        (strength * F.col("m")).alias("alpha"),
        (strength * (1 - F.col("m"))).alias("beta"),
    )
    shrunk = per_user.crossJoin(F.broadcast(prior)).select(
        "user_id",
        "n",
        "k",
        rate.alias("raw_rate"),
        ((F.col("k") + F.col("alpha")) / (F.col("n") + F.col("alpha") + F.col("beta"))).alias(
            "eb_rate"
        ),
        "alpha",
        "beta",
    )
    delta = F.round(F.abs(F.col("raw_rate") - F.col("eb_rate")), 6)
    # orderBy().limit() compiles to TakeOrderedAndProject — the
    # distributed top-k, no global window in the plan
    return (
        shrunk.select(
            "user_id",
            "n",
            "k",
            F.round("raw_rate", 6).alias("raw_rate"),
            F.round("eb_rate", 6).alias("eb_rate"),
            F.round("alpha", 6).alias("alpha"),
            F.round("beta", 6).alias("beta"),
            delta.alias("_delta"),
        )
        .orderBy(F.col("_delta").desc(), "user_id")
        .limit(EB_TOP_N)
        .drop("_delta")
    )


# --------------------------------------------------------------------------
# Qini / uplift-by-decile evaluation (treated-vs-control per score bin)
# --------------------------------------------------------------------------
UPLIFT_BINS = 10


@query(
    "q_qini_uplift",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 0 ELSE 1 END AS treated,
             CAST(count(*) FILTER (WHERE CAST(ts AS DATE)
               < DATE '{CUPED_BOUNDARY}') AS BIGINT) AS pre_n,
             sum(CASE WHEN event_type = 'purchase'
                      AND CAST(ts AS DATE) >= DATE '{CUPED_BOUNDARY}'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) / 100.0 AS y
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT max(pre_n) AS maxn FROM per_user),
    binned AS (
      SELECT u.treated, u.y,
             least(CAST(floor({UPLIFT_BINS}.0 * u.pre_n / (m.maxn + 1))
                     AS BIGINT), {UPLIFT_BINS - 1}) AS bin
      FROM per_user u, mx m
    ),
    cells AS (
      SELECT bin,
             CAST(count(*) FILTER (treated = 1) AS BIGINT) AS n_t,
             CAST(count(*) FILTER (treated = 0) AS BIGINT) AS n_c,
             sum(y) FILTER (treated = 1) AS y_t,
             sum(y) FILTER (treated = 0) AS y_c
      FROM binned GROUP BY bin
    )
    SELECT bin, n_t, n_c,
           round(y_t / n_t, 6) AS mean_treated,
           round(y_c / n_c, 6) AS mean_control,
           round(y_t / n_t - y_c / n_c, 6) AS uplift,
           round(sum(y_t / n_t - y_c / n_c)
                   OVER (ORDER BY bin DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cum_uplift
    FROM cells WHERE n_t > 0 AND n_c > 0
    ORDER BY bin DESC
    """,
)
def q_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile / Qini-style evaluation (Radcliffe 2007): users
    are binned by a pre-treatment targeting score (pre-period
    activity, cut against a broadcast max — no global ntile), and
    each bin reports the treated-minus-control outcome difference
    plus the cumulative uplift walking from the highest-scored bin
    down — the curve that tells a targeting model owner WHOM to
    treat, which the average effects (``q_ab_lift``,
    ``q_doubly_robust_ate``) cannot. Bins missing either arm are
    excluded identically on both engines (no within-bin contrast
    exists there).

    Hash-exactness: cells are exact integer counts and exact cent
    sums; per-bin means and the cumulative walk (a window over
    ≤{UPLIFT_BINS} aggregate rows) are deterministic doubles,
    6dp-rounded.

    Scale: one per-user rollup, one broadcast scalar, one
    {UPLIFT_BINS}-cell contingency — the q_gains_curve shape with a
    treatment dimension.
    """
    e = load_table(spark, sf_dir, "events")
    treated = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        0,
    ).otherwise(1)
    pre = F.to_date("ts") < CUPED_BOUNDARY
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.first(treated).alias("treated"),
        F.count_if(pre).alias("pre_n"),
        (
            F.sum(
                F.when((F.col("event_type") == "purchase") & ~pre, cents).otherwise(0)
            )
            / 100.0
        ).alias("y"),
    )
    mx = per_user.agg(F.max("pre_n").alias("maxn"))
    binned = per_user.crossJoin(F.broadcast(mx)).select(
        "treated",
        "y",
        F.least(
            F.floor(float(UPLIFT_BINS) * F.col("pre_n") / (F.col("maxn") + 1)).cast(
                "long"
            ),
            F.lit(UPLIFT_BINS - 1),
        ).alias("bin"),
    )
    cells = (
        binned.groupBy("bin")
        .agg(
            F.count_if(F.col("treated") == 1).alias("n_t"),
            F.count_if(F.col("treated") == 0).alias("n_c"),
            F.sum(F.when(F.col("treated") == 1, F.col("y"))).alias("y_t"),
            F.sum(F.when(F.col("treated") == 0, F.col("y"))).alias("y_c"),
        )
        .filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    )
    cells = bounded_window_input(cells, label="q_qini_uplift bins")
    uplift = F.col("y_t") / F.col("n_t") - F.col("y_c") / F.col("n_c")
    w = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    return cells.select(
        "bin",
        "n_t",
        "n_c",
        F.round(F.col("y_t") / F.col("n_t"), 6).alias("mean_treated"),
        F.round(F.col("y_c") / F.col("n_c"), 6).alias("mean_control"),
        F.round(uplift, 6).alias("uplift"),
        F.round(F.sum(uplift).over(w), 6).alias("cum_uplift"),
    ).orderBy(F.desc("bin"))


# --------------------------------------------------------------------------
# Lorenz curve (cumulative value share by population decile)
# --------------------------------------------------------------------------
LORENZ_BINS = 10


@query(
    "q_lorenz_curve",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, user_id) AS rk,
             count(*) OVER () AS n,
             sum(cents) OVER () AS tot
      FROM per_user
    ),
    binned AS (
      SELECT least(CAST(floor({LORENZ_BINS}.0 * (rk - 1) / n) AS BIGINT),
                   {LORENZ_BINS - 1}) AS decile,
             cents, n, tot
      FROM ranked
    ),
    cells AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(cents) AS BIGINT) AS cents,
             max(n) AS n, max(tot) AS tot
      FROM binned GROUP BY decile
    )
    SELECT decile, n_users,
           round(sum(n_users) OVER w * 1.0 / n, 6) AS pop_share,
           round(sum(cents) OVER w * 1.0 / tot, 6) AS value_share
    FROM cells
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    ORDER BY decile
    """,
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of purchase revenue over users (Lorenz 1905):
    users sorted poorest-first into {LORENZ_BINS} population deciles,
    each reporting the cumulative population share vs cumulative
    value share — the curve whose doubled area-to-diagonal IS the
    Gini that ``q_gini_spend`` reports as a scalar, and the
    operational view (\"the top decile holds X% of spend\") that a
    scalar can't give. The decile rank uses the distributed
    two-phase-rank-compatible (value, user_id) total order, so the
    curve is deterministic under ties.

    Hash-exactness: ranks order exact integer cents with user_id
    tie-break; shares are rationals of exact integer sums over the
    {LORENZ_BINS}-cell rollup, 6dp-rounded.

    Scale: one per-user rollup; the global USER rank is the actual
    `plans/ranking.py` two-phase distributed rank (range shuffle +
    per-partition offsets — no single-task sort); population / value
    totals are one 1-row aggregate collect; everything after is
    decile-bounded, with the final cumulative window running over the
    row-bound-guarded {LORENZ_BINS}-cell rollup.
    """
    from mi_inbound_pulsar_spark.plans.ranking import (
        attach_global_order_stats,
        bounded_window_input,
    )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    ).transform(eager_checkpoint)
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tot")
    ).collect()[0]
    n_total, cents_total = totals["n"] or 0, totals["tot"] or 0
    ranked, _ = attach_global_order_stats(
        per_user, [F.col("cents"), F.col("user_id")], rn_col="rk"
    )
    binned = ranked.select(
        F.least(
            F.floor(
                float(LORENZ_BINS) * (F.col("rk") - 1) / F.lit(n_total)
            ).cast("long"),
            F.lit(LORENZ_BINS - 1),
        ).alias("decile"),
        "cents",
    )
    cells = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").alias("cents"),
    )
    cells = bounded_window_input(cells, label="q_lorenz_curve deciles")
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return cells.select(
        "decile",
        "n_users",
        F.round(F.sum("n_users").over(w_cum) / F.lit(n_total), 6).alias("pop_share"),
        F.round(
            F.sum("cents").over(w_cum) / F.lit(cents_total), 6
        ).alias("value_share"),
    ).orderBy("decile")


# --------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) distance between the A/B arms
# --------------------------------------------------------------------------
@query(
    "q_wasserstein_distance",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    vc AS (
      SELECT cents,
             CAST(count(*) FILTER (arm = 'A') AS BIGINT) AS ca,
             CAST(count(*) FILTER (arm = 'B') AS BIGINT) AS cb
      FROM assigned GROUP BY cents
    ),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                   CAST(sum(cb) AS BIGINT) AS n_b FROM vc),
    steps AS (
      SELECT cents,
             sum(ca) OVER w * 1.0 / t.n_a AS fa,
             sum(cb) OVER w * 1.0 / t.n_b AS fb,
             lead(cents) OVER (ORDER BY cents) AS nxt
      FROM vc, tot t
      WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT t.n_a, t.n_b,
           round(sum(abs(fa - fb) * (nxt - cents)) / 100.0, 6)
             AS wasserstein_1,
           round(max(abs(fa - fb)), 6) AS ks_distance
    FROM steps, tot t
    WHERE nxt IS NOT NULL
    GROUP BY t.n_a, t.n_b
    """,
)
def q_wasserstein_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth-mover) distance between the A/B arms'
    purchase-value distributions — W₁ = ∫|F_A − F_B| dx over the
    empirical CDFs, computed exactly as the step-function integral on
    the distinct-value grid — with the KS sup-distance from the same
    pass. W₁ is the distribution-distance the shelf was missing: KS
    sees the worst POINT, PSI/JS see binned mass, W₁ integrates the
    whole discrepancy IN VALUE UNITS (dollars of mass transport),
    which is what makes it the standard drift metric for numeric
    features and the loss geometry behind optimal-transport methods.

    Hash-exactness: CDFs are rationals of exact integer counts on the
    distinct-cents grid; step widths are exact integer cents; W₁ is
    one deterministic sum, 6dp-rounded (dollars).

    Scale: the corpus collapses to the distinct-value rollup first;
    the running CDFs window over the VALUE DOMAIN (the q_mann_whitney
    waiver class), never the event stream.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    vc = (
        e.select(arm.alias("arm"), cents.alias("cents"))
        .groupBy("cents")
        .agg(
            F.count_if(F.col("arm") == "A").alias("ca"),
            F.count_if(F.col("arm") == "B").alias("cb"),
        )
    )
    tot = vc.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    vc = bounded_window_input(vc, label="q_wasserstein_distance value domain")
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    steps = vc.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        "cents",
        (F.sum("ca").over(w) / F.col("n_a")).alias("fa"),
        (F.sum("cb").over(w) / F.col("n_b")).alias("fb"),
        F.lead("cents").over(Window.orderBy("cents")).alias("nxt"),
    )
    return (
        steps.filter(F.col("nxt").isNotNull())
        .groupBy("n_a", "n_b")
        .agg(
            F.round(
                F.sum(F.abs(F.col("fa") - F.col("fb")) * (F.col("nxt") - F.col("cents")))
                / 100.0,
                6,
            ).alias("wasserstein_1"),
            F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_distance"),
        )
    )


# --------------------------------------------------------------------------
# Quantile treatment effects (distributional A/B readout)
# --------------------------------------------------------------------------
QTE_TAUS = (0.1, 0.25, 0.5, 0.75, 0.9)


@query(
    "q_quantile_treatment_effect",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) / 100.0 AS v
      FROM events WHERE event_type = 'purchase'
    ),
    q AS (
      SELECT CAST(0.1 AS DOUBLE) AS tau,
             CAST(quantile_cont(v, 0.1) FILTER (arm = 'A') AS DOUBLE) AS q_a,
             CAST(quantile_cont(v, 0.1) FILTER (arm = 'B') AS DOUBLE) AS q_b
      FROM assigned
      UNION ALL\n      SELECT CAST(0.25 AS DOUBLE) AS tau,
             CAST(quantile_cont(v, 0.25) FILTER (arm = 'A') AS DOUBLE) AS q_a,
             CAST(quantile_cont(v, 0.25) FILTER (arm = 'B') AS DOUBLE) AS q_b
      FROM assigned
      UNION ALL\n      SELECT CAST(0.5 AS DOUBLE) AS tau,
             CAST(quantile_cont(v, 0.5) FILTER (arm = 'A') AS DOUBLE) AS q_a,
             CAST(quantile_cont(v, 0.5) FILTER (arm = 'B') AS DOUBLE) AS q_b
      FROM assigned
      UNION ALL\n      SELECT CAST(0.75 AS DOUBLE) AS tau,
             CAST(quantile_cont(v, 0.75) FILTER (arm = 'A') AS DOUBLE) AS q_a,
             CAST(quantile_cont(v, 0.75) FILTER (arm = 'B') AS DOUBLE) AS q_b
      FROM assigned
      UNION ALL\n      SELECT CAST(0.9 AS DOUBLE) AS tau,
             CAST(quantile_cont(v, 0.9) FILTER (arm = 'A') AS DOUBLE) AS q_a,
             CAST(quantile_cont(v, 0.9) FILTER (arm = 'B') AS DOUBLE) AS q_b
      FROM assigned
    )
    SELECT tau, round(q_a, 6) AS q_a, round(q_b, 6) AS q_b,
           round(q_b - q_a, 6) AS qte
    FROM q ORDER BY tau
    """,
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (Doksum 1974; Koenker's quantile
    view of an experiment): q_B(τ) − q_A(τ) at τ ∈ {QTE_TAUS} — the
    DISTRIBUTIONAL readout the mean lift (``q_ab_lift``) compresses
    away: a treatment can leave the mean flat while moving the tails
    (or vice versa), and the QTE profile is what shows it, in value
    units per quantile. With W₁ (``q_wasserstein_distance``) giving
    the integrated discrepancy, this gives its per-quantile
    decomposition (for continuous F, W₁ = ∫|QTE(τ)|dτ when the
    curves don't cross).

    Hash-exactness: both engines use the SAME interpolated-percentile
    definition (the q_theil_sen convention) over exact integer-cents
    values; the tau spine is a literal array on both sides.

    Scale: per-arm quantiles are one aggregate over the purchase
    rollup (Spark computes all taus in one percentile() pass —
    map-side partial histograms; at extreme scale swap for
    approx_percentile gated by the HLL-style error audit).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    v = F.round(F.col("value") * 100, 0).cast("long") / 100.0
    taus = list(QTE_TAUS)
    per_arm = (
        e.select(arm.alias("arm"), v.alias("v"))
        .groupBy("arm")
        .agg(F.percentile("v", F.array(*[F.lit(t) for t in taus])).alias("qs"))
    )
    exploded = per_arm.select(
        "arm", F.posexplode("qs").alias("i", "q")
    ).select(
        "arm",
        F.element_at(F.array(*[F.lit(t) for t in taus]), F.col("i") + 1).alias(
            "tau"
        ),
        "q",
    )
    wide = exploded.groupBy("tau").agg(
        F.max(F.when(F.col("arm") == "A", F.col("q"))).alias("q_a"),
        F.max(F.when(F.col("arm") == "B", F.col("q"))).alias("q_b"),
    )
    return wide.select(
        "tau",
        F.round("q_a", 6).alias("q_a"),
        F.round("q_b", 6).alias("q_b"),
        F.round(F.col("q_b") - F.col("q_a"), 6).alias("qte"),
    ).orderBy("tau")


# --------------------------------------------------------------------------
# t-closeness audit (Li, Li & Venkatasubramanian 2007)
# --------------------------------------------------------------------------
T_CLOSE_THRESHOLD = 0.25


@query(
    "q_t_closeness",
    oracle=f"""
    WITH c AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) // 100000 AS band
      FROM customer
    ),
    bands AS (SELECT DISTINCT band FROM c),
    nb AS (SELECT count(*) AS n_bands FROM bands),
    gdist AS (
      SELECT band, count(*) * 1.0 / (SELECT count(*) FROM c) AS p_g
      FROM c GROUP BY band
    ),
    classes AS (
      SELECT nat, seg, count(*) AS class_size FROM c GROUP BY nat, seg
    ),
    cls AS (
      SELECT nat, seg, band, count(*) AS n FROM c GROUP BY nat, seg, band
    ),
    grid AS (
      SELECT k.nat, k.seg, k.class_size, b.band,
             COALESCE(x.n, 0) * 1.0 / k.class_size - g.p_g AS diff
      FROM classes k
        CROSS JOIN bands b
        JOIN gdist g ON g.band = b.band
        LEFT JOIN cls x ON x.nat = k.nat AND x.seg = k.seg
                        AND x.band = b.band
    ),
    cum AS (
      SELECT nat, seg, class_size,
             sum(diff) OVER (PARTITION BY nat, seg ORDER BY band
                             ROWS UNBOUNDED PRECEDING) AS cum_diff
      FROM grid
    )
    SELECT nat, seg, CAST(class_size AS BIGINT) AS class_size,
           round(sum(abs(cum_diff)) / (nb.n_bands - 1), 6) AS t_emd,
           round(sum(abs(cum_diff)) / (nb.n_bands - 1), 6)
             <= {T_CLOSE_THRESHOLD} AS t_close
    FROM cum, nb
    GROUP BY nat, seg, class_size, nb.n_bands
    ORDER BY nat, seg
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the release-privacy ladder after ``q_k_anonymity``
    and ``q_l_diversity``: for every quasi-identifier class (nation,
    segment), the Earth Mover's Distance between the class's
    distribution over the ORDERED sensitive attribute (account-balance
    band, the ``q_streaming_privacy_replay`` banding) and the global
    distribution. For ordered categories with unit ground distance the
    EMD closed form is sum(|cumulative difference|)/(bands−1), so a
    class passes when its balance mix is within t={T_CLOSE_THRESHOLD}
    of the corpus — the check that catches a class that is k-anonymous
    and l-diverse yet still leaks ("everyone in this class is broke").

    The band domain is completed per class by a (classes × bands)
    cross join of two rollups before the cumulative window, so absent
    bands contribute p=0 identically on both engines; the pass flag
    compares the 6dp-ROUNDED statistic.

    Scale: every frame is bounded by the QI domain × band domain
    (both rollups by definition tiny); raw customers collapse in the
    first aggregates and never reappear.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        (
            F.round(F.col("c_acctbal") * 100, 0).cast("long") / F.lit(100000)
        )
        .cast("long")
        .alias("band"),
    )
    bands = c.select("band").distinct()
    nb = bands.agg(F.count(F.lit(1)).alias("n_bands"))
    total = c.agg(F.count(F.lit(1)).alias("n_total"))
    glob = (
        c.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_band"))
        .crossJoin(F.broadcast(total))
        .select("band", (F.col("n_band") / F.col("n_total")).alias("p_g"))
    )
    classes = c.groupBy("nat", "seg").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    cls = c.groupBy("nat", "seg", "band").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        classes.crossJoin(F.broadcast(bands))
        .join(F.broadcast(glob), "band")
        .join(F.broadcast(cls), ["nat", "seg", "band"], "left")
        .select(
            "nat",
            "seg",
            "class_size",
            "band",
            (
                F.coalesce("n", F.lit(0)) / F.col("class_size") - F.col("p_g")
            ).alias("diff"),
        )
    )
    w = (
        Window.partitionBy("nat", "seg")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "nat", "seg", "class_size", F.sum("diff").over(w).alias("cum_diff")
    )
    t_emd = F.round(
        F.sum(F.abs("cum_diff")) / (F.first("n_bands") - 1), 6
    )
    return (
        cum.crossJoin(F.broadcast(nb))
        .groupBy("nat", "seg", "class_size")
        .agg(
            t_emd.alias("t_emd"),
            (t_emd <= T_CLOSE_THRESHOLD).alias("t_close"),
        )
        .orderBy("nat", "seg")
    )


# --------------------------------------------------------------------------
# Decision stump: best single Gini split (the CART root node)
# --------------------------------------------------------------------------


@query(
    "q_decision_stump",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(c_acctbal) AS BIGINT) AS band,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    per AS (
      SELECT band, CAST(sum(y) AS BIGINT) AS n1,
             CAST(count(*) - sum(y) AS BIGINT) AS n0
      FROM c GROUP BY band
    ),
    cum AS (
      SELECT band,
             sum(n1) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS c1,
             sum(n0) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS c0
      FROM per
    ),
    tot AS (SELECT sum(n1) AS t1, sum(n0) AS t0 FROM per),
    scored AS (
      SELECT band AS threshold,
             CAST(c1 + c0 AS BIGINT) AS n_left,
             CAST((t1 - c1) + (t0 - c0) AS BIGINT) AS n_right,
             round(
               ((c1 + c0) * (c1 + c0) - c1 * c1 - c0 * c0) * 1.0
                 / ((c1 + c0) * (t1 + t0))
               + (((t1 - c1) + (t0 - c0)) * ((t1 - c1) + (t0 - c0))
                  - (t1 - c1) * (t1 - c1) - (t0 - c0) * (t0 - c0)) * 1.0
                 / (((t1 - c1) + (t0 - c0)) * (t1 + t0)), 6) AS gini_split
      FROM cum, tot
      WHERE (t1 - c1) + (t0 - c0) > 0
    )
    SELECT threshold, n_left, n_right, gini_split
    FROM scored
    ORDER BY gini_split, threshold
    LIMIT 5
    """,
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump — the exhaustively-searched CART root node
    (Breiman et al. 1984): the account-balance threshold that best
    separates BUILDING-segment customers by weighted Gini impurity,
    evaluated at EVERY dollar band of the balance domain via one
    cumulative scan (left/right class counts from prefix sums — the
    same trick single-machine tree learners use, distributed). Top-5
    candidate splits exposed with their partition sizes; this is the
    boosted-stump / feature-screening primitive (a one-node
    GradientBoostedTree iteration is exactly this query on residuals).

    Hash-exactness: class counts, prefix sums, and every Gini
    numerator are exact integers (the weighted Gini is written as
    (nL²−c1²−c0²)/(nL·N) + (nR²−r1²−r0²)/(nR·N), all-integer until
    the two divisions); 6dp-rounded with a threshold tie-break.

    Scale: the corpus collapses to the ~11k-row dollar-band rollup in
    the first aggregate; the cumulative window runs over that VALUE
    DOMAIN, not rows — declared and runtime-enforced via
    ``bounded_window_input``; the final top-5 is a
    TakeOrderedAndProject.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.floor("c_acctbal").cast("long").alias("band"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("y"),
    )
    per = c.groupBy("band").agg(
        F.sum("y").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n0"),
    )
    per = bounded_window_input(per, label="q_decision_stump balance bands")
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "band",
        F.sum("n1").over(w).alias("c1"),
        F.sum("n0").over(w).alias("c0"),
    )
    tot = per.agg(F.sum("n1").alias("t1"), F.sum("n0").alias("t0"))
    nl = F.col("c1") + F.col("c0")
    r1 = F.col("t1") - F.col("c1")
    r0 = F.col("t0") - F.col("c0")
    nr = r1 + r0
    n = F.col("t1") + F.col("t0")
    gini = (
        (nl * nl - F.col("c1") * F.col("c1") - F.col("c0") * F.col("c0"))
        * F.lit(1.0)
        / (nl * n)
        + (nr * nr - r1 * r1 - r0 * r0) * F.lit(1.0) / (nr * n)
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(nr > 0)
        .select(
            F.col("band").alias("threshold"),
            nl.alias("n_left"),
            nr.alias("n_right"),
            F.round(gini, 6).alias("gini_split"),
        )
        .orderBy("gini_split", "threshold")
        .limit(5)
    )


# --------------------------------------------------------------------------
# Hill tail-index estimator (Hill 1975)
# --------------------------------------------------------------------------
HILL_K = 200


@query(
    "q_hill_tail_index",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders
    ),
    top AS (
      SELECT v FROM cents ORDER BY v DESC LIMIT {HILL_K + 1}
    ),
    agg AS (
      SELECT min(v) AS xref,
             CAST(count(*) FILTER (WHERE v > (SELECT min(v) FROM top))
                  AS BIGINT) AS k_eff,
             sum(ln(v * 1.0 / (SELECT min(v) FROM top))) AS sum_ln
      FROM top
    )
    SELECT k_eff,
           round(xref / 100.0, 2) AS x_ref,
           round(sum_ln / k_eff, 6) AS hill_inv,
           round(k_eff / sum_ln, 6) AS tail_index
    FROM agg
    """,
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index (Hill 1975) over order
    totals: α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) on the top-k order statistics —
    the standard "how heavy is the spend tail" number (α ≤ 2 means
    infinite variance: means are unstable, medians and trimmed stats
    are mandatory). Companion to ``q_degree_powerlaw_mle`` (discrete
    degrees) for a continuous value column.

    Value ties straddling the k-cut are harmless: selection is by
    VALUE, both engines keep the same value multiset, and rows equal
    to the reference x₍ₖ₊₁₎ contribute ln(1)=0, so k_eff counts the
    strictly-greater rows both engines agree on.

    Hash-exactness: values are exact integer cents; each ln argument
    is the identical exact ratio; the Σ runs over ≤{HILL_K} terms
    (ulp noise far under 6dp).

    Scale: the top-(k+1) is a TakeOrderedAndProject (per-partition
    heads folded on executors, merged once) — the ONLY global step;
    everything after is one aggregate over k+1 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v")
    )
    top = cents.orderBy(F.desc("v")).limit(HILL_K + 1)
    xref = top.agg(F.min("v").alias("xref"))
    agg = (
        top.crossJoin(F.broadcast(xref))
        .agg(
            F.max("xref").alias("xref"),
            F.count_if(F.col("v") > F.col("xref")).alias("k_eff"),
            F.sum(F.log(F.col("v") * F.lit(1.0) / F.col("xref"))).alias(
                "sum_ln"
            ),
        )
    )
    return agg.select(
        "k_eff",
        F.round(F.col("xref") / 100.0, 2).alias("x_ref"),
        F.round(F.col("sum_ln") / F.col("k_eff"), 6).alias("hill_inv"),
        F.round(F.col("k_eff") / F.col("sum_ln"), 6).alias("tail_index"),
    )


# --------------------------------------------------------------------------
# Isotonic calibration via the minimax closed form (PAVA's fixpoint)
# --------------------------------------------------------------------------


@query(
    "q_isotonic_calibration",
    oracle="""
    WITH bins AS (
      SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS w,
             CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ),
    pref AS (
      SELECT bin, w, y,
             sum(w) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cw,
             sum(y) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cy
      FROM bins
    ),
    iv AS (
      SELECT i.bin AS i, j.bin AS j,
             (j.cy - i.cy + i.y) * 1.0 / (j.cw - i.cw + i.w) AS mean_ij
      FROM pref i JOIN pref j ON i.bin <= j.bin
    ),
    inner_min AS (
      SELECT iv.i, t.bin AS t, min(iv.mean_ij) AS m
      FROM iv JOIN pref t ON iv.i <= t.bin AND iv.j >= t.bin
      GROUP BY iv.i, t.bin
    ),
    iso AS (
      SELECT t, max(m) AS iso_rate FROM inner_min GROUP BY t
    )
    SELECT b.bin AS discount_pct, b.w AS n,
           round(b.y * 1.0 / b.w, 6) AS raw_rate,
           round(iso.iso_rate, 6) AS iso_rate
    FROM bins b JOIN iso ON iso.t = b.bin
    ORDER BY discount_pct
    """,
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression of the return rate on the discount level —
    the calibration fit (Zadrozny & Elkan 2002; Robertson, Wright &
    Dykstra 1988) that turns a ranked score into monotone
    probabilities, computed through the **minimax closed form**
    iso(t) = max_{i≤t} min_{j≥t} mean(y over bins i..j) instead of the
    sequential pool-adjacent-violators sweep: PAVA's fixpoint is
    exactly this value, but the closed form is pure joins/aggregates —
    embarrassingly parallel where PAVA is inherently serial. (A
    pure-Python PAVA replay in ``tests/`` confirms the two agree,
    making this one of the few operators whose third opinion runs a
    genuinely DIFFERENT algorithm.)

    Hash-exactness: interval means are ratios of exact integer prefix
    sums; min/max compare those identical doubles; output 6dp-rounded.

    Scale: the corpus collapses to the DISCOUNT-DOMAIN rollup
    (11 bins) in one aggregate; the i≤t≤j triple enumeration is
    O(bins³) on broadcast rollups — bins are a VALUE DOMAIN, so this
    never grows with data; the prefix window rides
    ``bounded_window_input``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bins = li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("w"),
        F.count_if(F.col("l_returnflag") == "R").alias("y"),
    )
    bins = bounded_window_input(
        bins, label="q_isotonic_calibration discount domain"
    )
    wnd = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "bin",
        "w",
        "y",
        F.sum("w").over(wnd).alias("cw"),
        F.sum("y").over(wnd).alias("cy"),
    ).transform(eager_checkpoint)
    i = pref.select(
        F.col("bin").alias("i"),
        F.col("w").alias("iw"),
        F.col("y").alias("iy"),
        F.col("cw").alias("icw"),
        F.col("cy").alias("icy"),
    )
    j = pref.select(
        F.col("bin").alias("j"),
        F.col("cw").alias("jcw"),
        F.col("cy").alias("jcy"),
    )
    iv = (
        i.join(F.broadcast(j), F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            (
                (F.col("jcy") - F.col("icy") + F.col("iy"))
                * F.lit(1.0)
                / (F.col("jcw") - F.col("icw") + F.col("iw"))
            ).alias("mean_ij"),
        )
    )
    t = pref.select(F.col("bin").alias("t"))
    inner_min = (
        iv.join(
            F.broadcast(t),
            (F.col("i") <= F.col("t")) & (F.col("j") >= F.col("t")),
        )
        .groupBy("i", "t")
        .agg(F.min("mean_ij").alias("m"))
    )
    iso = inner_min.groupBy("t").agg(F.max("m").alias("iso_rate"))
    # project the display columns from the PERSISTED pref frame — the
    # raw `bins` plan fragment would not match the cache and re-scan
    # all of lineitem a second time
    return (
        pref.join(iso, pref.bin == iso.t)
        .select(
            F.col("bin").alias("discount_pct"),
            F.col("w").alias("n"),
            F.round(F.col("y") * F.lit(1.0) / F.col("w"), 6).alias("raw_rate"),
            F.round("iso_rate", 6).alias("iso_rate"),
        )
        .orderBy("discount_pct")
    )


# --------------------------------------------------------------------------
# Regression discontinuity at the zero-balance cutoff (Imbens & Lemieux)
# --------------------------------------------------------------------------
RDD_BANDWIDTH_CENTS = 200000  # local-linear window: ±$2,000 around 0


@query(
    "q_regression_discontinuity",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS x
      FROM customer
      WHERE abs(CAST(round(c_acctbal * 100, 0) AS BIGINT))
              <= {RDD_BANDWIDTH_CENTS}
    ),
    y AS (
      SELECT c.c_custkey, c.x, CAST(count(o.o_orderkey) AS BIGINT) AS y
      FROM c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.x
    ),
    m AS (
      SELECT x >= 0 AS treated,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM y GROUP BY 1
    ),
    fit AS (
      SELECT treated, n,
             (sy * 1.0 * sxx - sx * 1.0 * sxy)
               / (n * 1.0 * sxx - sx * 1.0 * sx) AS intercept,
             (n * 1.0 * sxy - sx * 1.0 * sy)
               / (n * 1.0 * sxx - sx * 1.0 * sx) AS slope
      FROM m
    )
    SELECT r.n AS n_right, l.n AS n_left,
           round(r.intercept, 6) AS limit_right,
           round(l.intercept, 6) AS limit_left,
           round(r.intercept - l.intercept, 6) AS rdd_effect,
           round(r.slope * 100000, 6) AS slope_right_per_k,
           round(l.slope * 100000, 6) AS slope_left_per_k
    FROM fit r, fit l
    WHERE r.treated AND NOT l.treated
    """,
)
def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity (Imbens & Lemieux 2008): local
    linear fits on each side of the zero-account-balance cutoff within
    a ±$2,000 bandwidth, outcome = the customer's order count; the
    causal estimand is the jump between the two one-sided intercepts
    AT the cutoff — the quasi-experimental design for "does crossing
    the threshold change behavior" when treatment is assigned by the
    running variable itself (here: negative-balance status). Both
    one-sided slopes are exposed (per $1,000) so a reader can see the
    local trends the limits extrapolate from.

    Hash-exactness: both OLS fits are CLOSED FORMS over five exact
    integer moments per side (n, Σx, Σy, Σxy, Σx² of cents ×
    order counts — far inside int64 at the bandwidth); the division
    is one deterministic double expression per coefficient,
    6dp-rounded.

    Scale: the bandwidth filter pushes to the customer scan; the
    outcome join is customer-keyed; everything collapses to TWO moment
    rows before any arithmetic. The textbook "RDD at 100 TB" shape —
    no sorting, no windows, no per-row model state.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
    ).filter(F.abs(F.col("x")) <= RDD_BANDWIDTH_CENTS)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    y = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "x")
        .agg(F.count("o_orderkey").alias("y"))
    )
    m = y.groupBy((F.col("x") >= 0).alias("treated")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    det = F.col("n") * F.lit(1.0) * F.col("sxx") - F.col("sx") * F.lit(
        1.0
    ) * F.col("sx")
    fit = m.select(
        "treated",
        "n",
        (
            (
                F.col("sy") * F.lit(1.0) * F.col("sxx")
                - F.col("sx") * F.lit(1.0) * F.col("sxy")
            )
            / det
        ).alias("intercept"),
        (
            (
                F.col("n") * F.lit(1.0) * F.col("sxy")
                - F.col("sx") * F.lit(1.0) * F.col("sy")
            )
            / det
        ).alias("slope"),
    )
    r = fit.filter("treated").select(
        F.col("n").alias("n_right"),
        F.col("intercept").alias("ir"),
        F.col("slope").alias("sr"),
    )
    lft = fit.filter(~F.col("treated")).select(
        F.col("n").alias("n_left"),
        F.col("intercept").alias("il"),
        F.col("slope").alias("sl"),
    )
    return r.crossJoin(F.broadcast(lft)).select(
        "n_right",
        "n_left",
        F.round("ir", 6).alias("limit_right"),
        F.round("il", 6).alias("limit_left"),
        F.round(F.col("ir") - F.col("il"), 6).alias("rdd_effect"),
        F.round(F.col("sr") * 100000, 6).alias("slope_right_per_k"),
        F.round(F.col("sl") * 100000, 6).alias("slope_left_per_k"),
    )


# --------------------------------------------------------------------------
# Interrupted time series (Bernal, Cummins & Gasparrini 2017)
# --------------------------------------------------------------------------
ITS_CUTOVER = "1998-04-01"  # intervention date: the series midpoint


@query(
    "q_interrupted_time_series",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate
    ),
    idx AS (
      SELECT d, y,
             CAST(datediff('day', DATE '{ITS_CUTOVER}', d) AS BIGINT) AS t,
             d >= DATE '{ITS_CUTOVER}' AS post
      FROM daily
    ),
    m AS (
      SELECT post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(t * y) AS BIGINT) AS sxy,
             CAST(sum(t * t) AS BIGINT) AS sxx
      FROM idx GROUP BY post
    ),
    fit AS (
      SELECT post, n,
             (sy * 1.0 * sxx - sx * 1.0 * sxy)
               / (n * 1.0 * sxx - sx * 1.0 * sx) AS level_at_cutover,
             (n * 1.0 * sxy - sx * 1.0 * sy)
               / (n * 1.0 * sxx - sx * 1.0 * sx) AS slope
      FROM m
    )
    SELECT pre.n AS n_pre, post.n AS n_post,
           round(pre.level_at_cutover, 6) AS level_pre,
           round(post.level_at_cutover, 6) AS level_post,
           round(post.level_at_cutover - pre.level_at_cutover, 6)
             AS level_change,
           round(pre.slope, 6) AS slope_pre,
           round(post.slope, 6) AS slope_post,
           round(post.slope - pre.slope, 6) AS slope_change
    FROM fit pre, fit post
    WHERE NOT pre.post AND post.post
    """,
)
def q_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series / segmented regression (Bernal, Cummins
    & Gasparrini 2017): fit the daily-order-count trend separately
    before and after the {ITS_CUTOVER} cutover, with the day index
    CENTERED at the cutover so each segment's intercept IS its level
    at the intervention — the level change and slope change are the
    two ITS estimands ("did the intervention shift the series, and
    did it bend it"). The pre-segment extrapolates forward to the
    cutover, the standard segmented-regression convention.

    Hash-exactness: day offsets and daily counts are exact integers,
    both fits are closed forms over five integer moments per segment,
    6dp-rounded.

    Scale: the corpus collapses to the date-domain rollup in one
    aggregate; the moment rollup is two rows; no windows at all (the
    day index is a date DIFFERENCE, not a rank).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    idx = daily.select(
        "y",
        F.datediff(F.col("d"), F.lit(ITS_CUTOVER)).cast("long").alias("t"),
        (F.col("d") >= F.lit(ITS_CUTOVER)).alias("post"),
    )
    m = idx.groupBy("post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sxy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
    )
    det = F.col("n") * F.lit(1.0) * F.col("sxx") - F.col("sx") * F.lit(
        1.0
    ) * F.col("sx")
    fit = m.select(
        "post",
        "n",
        (
            (
                F.col("sy") * F.lit(1.0) * F.col("sxx")
                - F.col("sx") * F.lit(1.0) * F.col("sxy")
            )
            / det
        ).alias("level_at_cutover"),
        (
            (
                F.col("n") * F.lit(1.0) * F.col("sxy")
                - F.col("sx") * F.lit(1.0) * F.col("sy")
            )
            / det
        ).alias("slope"),
    )
    pre = fit.filter(~F.col("post")).select(
        F.col("n").alias("n_pre"),
        F.col("level_at_cutover").alias("lp"),
        F.col("slope").alias("sp"),
    )
    post = fit.filter("post").select(
        F.col("n").alias("n_post"),
        F.col("level_at_cutover").alias("lq"),
        F.col("slope").alias("sq"),
    )
    return pre.crossJoin(F.broadcast(post)).select(
        "n_pre",
        "n_post",
        F.round("lp", 6).alias("level_pre"),
        F.round("lq", 6).alias("level_post"),
        F.round(F.col("lq") - F.col("lp"), 6).alias("level_change"),
        F.round("sp", 6).alias("slope_pre"),
        F.round("sq", 6).alias("slope_post"),
        F.round(F.col("sq") - F.col("sp"), 6).alias("slope_change"),
    )


# --------------------------------------------------------------------------
# Nearest-neighbor caliper matching ATT (Rosenbaum & Rubin 1983)
# --------------------------------------------------------------------------
PSM_CALIPER_CENTS = 500  # max balance distance for a valid match


@query(
    "q_matching_att",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS cust,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS x,
             c_mktsegment = 'AUTOMOBILE' AS treated
      FROM customer
    ),
    y AS (
      SELECT c.cust, c.x, c.treated,
             CAST(COALESCE(sum(CAST(round(o.o_totalprice * 100, 0)
                                    AS BIGINT)), 0) AS BIGINT) AS spend
      FROM c LEFT JOIN orders o ON o.o_custkey = c.cust
      GROUP BY c.cust, c.x, c.treated
    ),
    t AS (SELECT * FROM y WHERE treated),
    ctl AS (SELECT * FROM y WHERE NOT treated),
    cand AS (
      SELECT t.cust AS t_cust, t.spend AS t_spend,
             ctl.cust AS c_cust, ctl.spend AS c_spend,
             abs(t.x - ctl.x) AS dist
      FROM t JOIN ctl
        ON (ctl.x // {PSM_CALIPER_CENTS})
             BETWEEN (t.x // {PSM_CALIPER_CENTS}) - 1
                 AND (t.x // {PSM_CALIPER_CENTS}) + 1
      WHERE abs(t.x - ctl.x) <= {PSM_CALIPER_CENTS}
    ),
    best AS (
      SELECT t_cust, t_spend, c_spend,
             row_number() OVER (PARTITION BY t_cust
                                ORDER BY dist, c_cust) AS rn
      FROM cand
    ),
    matched AS (SELECT * FROM best WHERE rn = 1)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_treated,
           CAST(count(*) AS BIGINT) AS n_matched,
           round(avg(t_spend) / 100, 6) AS mean_treated,
           round(avg(c_spend) / 100, 6) AS mean_matched_control,
           round((avg(t_spend) - avg(c_spend)) / 100, 6) AS att
    FROM matched
    """,
)
def q_matching_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor matching with a caliper (Rosenbaum & Rubin
    1983; matching with replacement, the standard observational-ATT
    estimator): each AUTOMOBILE-segment customer is matched to the
    closest non-AUTOMOBILE customer by account balance (≤$5
    caliper), and the treatment effect on the treated is the mean
    spend gap over matched pairs — completing the causal shelf
    (IPW → doubly-robust → DiD → RDD → ITS → matching). Treated
    units with no control inside the caliper drop, the caliper's
    defining behavior (n_treated vs n_matched exposes the match
    rate).

    The nearest-neighbor search is the banding trick: candidates come
    only from the treated unit's caliper band ±1 (any control within
    the caliper is provably inside those three bands), so candidate
    generation is an EQUI-join on the band key (FLOOR division on
    both engines — Spark's DIV truncates toward zero, which would
    shift negative-balance bands) — never treated × control. The argmin is (distance, control id) — integer-exact.

    Hash-exactness: balances and spends are integer cents; means are
    ratios of exact integer sums, 6dp-rounded.

    Scale: band join bounded by caliper density; per-treated argmin is
    a window partitioned by the treated key; two scalar aggregates
    finish. At 100 TB the band key doubles as the shuffle key — the
    same co-location discipline as the as-of join.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
        (F.col("c_mktsegment") == "AUTOMOBILE").alias("treated"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("p"),
    )
    y = (
        c.join(o, c.cust == o.o_custkey, "left")
        .groupBy("cust", "x", "treated")
        .agg(F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("spend"))
        .transform(eager_checkpoint)
    )
    t = y.filter("treated").select(
        F.col("cust").alias("t_cust"),
        F.col("x").alias("tx"),
        F.col("spend").alias("t_spend"),
        F.floor(F.col("x") / PSM_CALIPER_CENTS).cast("long").alias("band"),
    )
    ctl = y.filter(~F.col("treated")).select(
        F.col("cust").alias("c_cust"),
        F.col("x").alias("cx"),
        F.col("spend").alias("c_spend"),
        F.floor(F.col("x") / PSM_CALIPER_CENTS).cast("long").alias("cband"),
    )
    probes = t.select(
        "t_cust",
        "tx",
        "t_spend",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("cband"),
    )
    cand = (
        probes.join(ctl, "cband")
        .filter(F.abs(F.col("tx") - F.col("cx")) <= PSM_CALIPER_CENTS)
        .select(
            "t_cust",
            "t_spend",
            "c_spend",
            F.abs(F.col("tx") - F.col("cx")).alias("dist"),
            "c_cust",
        )
    )
    w = Window.partitionBy("t_cust").orderBy("dist", "c_cust")
    matched = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    n_t = t.agg(F.count(F.lit(1)).alias("n_treated"))
    return (
        matched.agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.avg("t_spend") / 100, 6).alias("mean_treated"),
            F.round(F.avg("c_spend") / 100, 6).alias("mean_matched_control"),
            F.round(
                (F.avg("t_spend") - F.avg("c_spend")) / 100, 6
            ).alias("att"),
        )
        .crossJoin(F.broadcast(n_t))
        .select(
            "n_treated",
            "n_matched",
            "mean_treated",
            "mean_matched_control",
            "att",
        )
    )


# --------------------------------------------------------------------------
# Event study: per-period DiD coefficients with leads as the
# parallel-trends diagnostic
# --------------------------------------------------------------------------
ES_PERIOD_DAYS = 5
ES_BASE_PERIOD = 2  # last pre-treatment period; treatment at period 3
US_PER_DAY = 86_400_000_000


@query(
    "q_event_study",
    oracle=f"""
    WITH ev AS (
      SELECT user_id,
             CASE WHEN substring(md5('exp7:' || CAST(user_id AS VARCHAR)),
                                 1, 1) < '8' THEN 'A' ELSE 'B' END AS arm,
             epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    d0 AS (SELECT min(day) AS d0 FROM ev),
    users AS (
      SELECT arm, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM ev GROUP BY arm
    ),
    cell AS (
      SELECT ev.arm, (ev.day - d0.d0) // {ES_PERIOD_DAYS} AS period,
             CAST(sum(ev.cents) AS BIGINT) AS total_cents
      FROM ev, d0 GROUP BY 1, 2
    ),
    m AS (
      SELECT c.period,
             sum(CASE WHEN c.arm = 'A'
                      THEN CAST(c.total_cents AS DOUBLE) / u.n_users / 100
                 END) AS mean_a,
             sum(CASE WHEN c.arm = 'B'
                      THEN CAST(c.total_cents AS DOUBLE) / u.n_users / 100
                 END) AS mean_b
      FROM cell c JOIN users u ON u.arm = c.arm
      GROUP BY c.period
    ),
    base AS (
      SELECT mean_b - mean_a AS base_gap FROM m
      WHERE period = {ES_BASE_PERIOD}
    )
    SELECT CAST(m.period AS BIGINT) AS period,
           period > {ES_BASE_PERIOD} AS is_post,
           round(m.mean_a, 6) AS mean_a,
           round(m.mean_b, 6) AS mean_b,
           round(m.mean_b - m.mean_a, 6) AS gap,
           round(m.mean_b - m.mean_a - b.base_gap, 6) AS effect
    FROM m, base b ORDER BY period
    """,
)
def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study / dynamic DiD (the leads-and-lags regression of
    Jacobson, LaLonde & Sullivan 1993, in its cell-means form): per-
    {ES_PERIOD_DAYS}-day-period treated-vs-control gaps normalized to
    the last pre-period — the lead coefficients (periods <
    {ES_BASE_PERIOD}) ARE the parallel-trends diagnostic the single
    2×2 q_diff_in_diff must assume, and the lag coefficients trace
    the effect's dynamics instead of averaging them. Same 'exp7' hash
    arms as q_ab_lift / q_cuped_adjustment / q_diff_in_diff, so the
    experimentation shelf reads off one design (with a hash split the
    true effects are ~0; the leads hovering near zero is the point).

    Per-period means carry implicit zeros correctly: cell totals over
    the arm's FULL purchaser count, not over period-active users.

    Scale: one per-(arm, period) rollup with map-side combine, one
    per-arm distinct-user count, a |periods|-row join. Nothing else
    touches raw events.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("user_id").cast("string"))),
            1,
            1,
        )
        < "8",
        "A",
    ).otherwise("B")
    ev = e.select(
        "user_id",
        arm.alias("arm"),
        F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    users = ev.groupBy("arm").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    cell = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(
            "arm",
            F.expr(f"(day - d0) DIV {ES_PERIOD_DAYS}").alias("period"),
        )
        .agg(F.sum("cents").alias("total_cents"))
    )
    m = (
        cell.join(F.broadcast(users), "arm")
        .groupBy("period")
        .agg(
            F.sum(
                F.when(
                    F.col("arm") == "A",
                    F.col("total_cents").cast("double")
                    / F.col("n_users")
                    / 100,
                )
            ).alias("mean_a"),
            F.sum(
                F.when(
                    F.col("arm") == "B",
                    F.col("total_cents").cast("double")
                    / F.col("n_users")
                    / 100,
                )
            ).alias("mean_b"),
        )
    )
    base = m.filter(F.col("period") == ES_BASE_PERIOD).select(
        (F.col("mean_b") - F.col("mean_a")).alias("base_gap")
    )
    return (
        m.crossJoin(F.broadcast(base))
        .select(
            F.col("period").cast("long").alias("period"),
            (F.col("period") > ES_BASE_PERIOD).alias("is_post"),
            F.round("mean_a", 6).alias("mean_a"),
            F.round("mean_b", 6).alias("mean_b"),
            F.round(F.col("mean_b") - F.col("mean_a"), 6).alias("gap"),
            F.round(
                F.col("mean_b") - F.col("mean_a") - F.col("base_gap"), 6
            ).alias("effect"),
        )
        .orderBy("period")
    )


# --------------------------------------------------------------------------
# Cross-sectional price elasticity (log-log OLS over parts)
# --------------------------------------------------------------------------
@query(
    "q_price_elasticity",
    oracle="""
    WITH per_part AS (
      SELECT l.l_partkey AS part,
             CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS qty,
             CAST(round(max(p.p_retailprice) * 100, 0) AS BIGINT)
               AS price_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    pts AS (
      SELECT ln(CAST(price_cents AS DOUBLE) / 100) AS x,
             ln(CAST(qty AS DOUBLE)) AS y
      FROM per_part WHERE qty > 0
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pts
    )
    SELECT n AS n_parts,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
             AS elasticity,
           round(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                 * sx / n, 6) AS intercept,
           round(pow(sxy - sx * sy / n, 2)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
    FROM m
    """,
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional price elasticity of demand (the log-log
    regression of Marshall's constant-elasticity model): OLS of
    ln(total quantity sold) on ln(retail price) across parts — the
    slope IS the elasticity (−1 = unit elastic; TPC-H's uniform
    demand generator should show ≈0, which is itself the calibration
    check). Joins the q_agg_regression family as the economics
    reading of the same closed-form machinery.

    Hash-exactness: per-part quantity and price collapse to exact
    integers before the logs, so both engines fit identical points;
    the OLS moments are sums of ~|ln| magnitude doubles (no 1e10
    cancellation — the q_granger_lag1 hazard class doesn't apply).

    Scale: one join keyed by partkey (broadcastable dim at any
    realistic |part|), one map-side-combined per-part rollup, one
    closed-form aggregate. Never touches raw lineitem twice.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("q"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias(
            "price_cents"
        ),
    )
    per_part = (
        li.join(F.broadcast(p), "part")
        .groupBy("part")
        .agg(
            F.sum("q").alias("qty"),
            F.max("price_cents").alias("price_cents"),
        )
    )
    pts = per_part.filter(F.col("qty") > 0).select(
        F.log(F.col("price_cents").cast("double") / 100).alias("x"),
        F.log(F.col("qty").cast("double")).alias("y"),
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
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nn
    )
    return m.select(
        nn.cast("long").alias("n_parts"),
        F.round(slope, 6).alias("elasticity"),
        F.round(F.col("sy") / nn - slope * F.col("sx") / nn, 6).alias(
            "intercept"
        ),
        F.round(
            F.pow(F.col("sxy") - F.col("sx") * F.col("sy") / nn, F.lit(2.0))
            / (
                (F.col("sxx") - F.col("sx") * F.col("sx") / nn)
                * (F.col("syy") - F.col("sy") * F.col("sy") / nn)
            ),
            6,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# Mantel-Haenszel stratified common odds ratio + CMH test
# --------------------------------------------------------------------------
@query(
    "q_mantel_haenszel",
    oracle="""
    WITH ret AS (
      SELECT l_orderkey AS ok,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
      FROM lineitem GROUP BY 1
    ),
    obs AS (
      SELECT o.o_orderpriority AS stratum,
             substring(md5('exp7:' || CAST(o.o_custkey AS VARCHAR)), 1, 1)
               < '8' AS exposed,
             coalesce(ret.r, 0) AS ret
      FROM orders o LEFT JOIN ret ON ret.ok = o.o_orderkey
    ),
    cell AS (
      SELECT stratum,
             CAST(count(*) FILTER (exposed AND ret = 1) AS BIGINT) AS a,
             CAST(count(*) FILTER (exposed AND ret = 0) AS BIGINT) AS b,
             CAST(count(*) FILTER (NOT exposed AND ret = 1) AS BIGINT) AS c,
             CAST(count(*) FILTER (NOT exposed AND ret = 0) AS BIGINT) AS d
      FROM obs GROUP BY stratum
    ),
    terms AS (
      SELECT stratum, a, b, c, d,
             CAST(a + b + c + d AS DOUBLE) AS n
      FROM cell
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             sum(a * CAST(d AS DOUBLE) / n) AS rd,
             sum(b * CAST(c AS DOUBLE) / n) AS bc,
             CAST(sum(a) AS BIGINT) AS sa,
             sum((a + b) * CAST(a + c AS DOUBLE) / n) AS e,
             sum((a + b) * CAST(c + d AS DOUBLE) * (a + c) * (b + d)
                 / (n * n * (n - 1))) AS v,
             CAST(sum(a + b + c + d) AS BIGINT) AS n_tot,
             CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
             CAST(sum(c) AS BIGINT) AS tc, CAST(sum(d) AS BIGINT) AS td
      FROM terms
    )
    SELECT k AS n_strata, n_tot AS n_orders,
           round(rd / bc, 6) AS mh_odds_ratio,
           round((CAST(ta AS DOUBLE) * td) / (CAST(tb AS DOUBLE) * tc), 6)
             AS crude_odds_ratio,
           round(pow(abs(sa - e) - 0.5, 2) / v, 6) AS cmh_chi2
    FROM s
    """,
)
def q_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio + the continuity-corrected
    Cochran-Mantel-Haenszel χ² (Mantel & Haenszel 1959), stratified by
    order priority: does the exp7 hash arm shift the order-return rate
    AFTER controlling for priority? THE remedy for the aggregation
    reversal q_simpson_audit detects — the crude odds ratio rides
    along so the two readouts can disagree visibly when strata are
    confounded (with a hash arm they should agree ≈1, the A/A
    calibration). Uses the q_logrank_test hypergeometric moments per
    stratum.

    Scale: one per-order rollup (returned flag), one stratum×2×2
    conditional aggregate, one k-row closed form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ret = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("r")
    )
    o = load_table(spark, sf_dir, "orders")
    exposed = (
        F.substring(
            F.md5(F.concat(F.lit("exp7:"), F.col("o_custkey").cast("string"))),
            1,
            1,
        )
        < "8"
    )
    obs = o.join(ret, o.o_orderkey == ret.ok, "left").select(
        F.col("o_orderpriority").alias("stratum"),
        exposed.alias("exposed"),
        F.coalesce("r", F.lit(0)).alias("ret"),
    )
    cell = obs.groupBy("stratum").agg(
        F.count_if(F.col("exposed") & (F.col("ret") == 1)).alias("a"),
        F.count_if(F.col("exposed") & (F.col("ret") == 0)).alias("b"),
        F.count_if(~F.col("exposed") & (F.col("ret") == 1)).alias("c"),
        F.count_if(~F.col("exposed") & (F.col("ret") == 0)).alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    s = cell.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("a") * F.col("d").cast("double") / n).alias("rd"),
        F.sum(F.col("b") * F.col("c").cast("double") / n).alias("bc"),
        F.sum("a").alias("sa"),
        F.sum(
            (F.col("a") + F.col("b"))
            * (F.col("a") + F.col("c")).cast("double")
            / n
        ).alias("e"),
        F.sum(
            (F.col("a") + F.col("b"))
            * (F.col("c") + F.col("d")).cast("double")
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / (n * n * (n - 1))
        ).alias("v"),
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias(
            "n_tot"
        ),
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum("c").alias("tc"),
        F.sum("d").alias("td"),
    )
    return s.select(
        F.col("k").cast("long").alias("n_strata"),
        F.col("n_tot").cast("long").alias("n_orders"),
        F.round(F.col("rd") / F.col("bc"), 6).alias("mh_odds_ratio"),
        F.round(
            (F.col("ta").cast("double") * F.col("td"))
            / (F.col("tb").cast("double") * F.col("tc")),
            6,
        ).alias("crude_odds_ratio"),
        F.round(
            F.pow(F.abs(F.col("sa") - F.col("e")) - 0.5, F.lit(2.0))
            / F.col("v"),
            6,
        ).alias("cmh_chi2"),
    )


# --------------------------------------------------------------------------
# Benjamini-Yekutieli: FDR under arbitrary dependence
# --------------------------------------------------------------------------
@query(
    "q_benjamini_yekutieli",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CASE WHEN value < 30 THEN 'lo'
                  WHEN value < 70 THEN 'mid' ELSE 'hi' END AS bucket
      FROM events
    ),
    obs AS (SELECT event_type, bucket, count(*) AS o FROM b GROUP BY 1, 2),
    gt AS (SELECT event_type, sum(o) AS ng FROM obs GROUP BY event_type),
    bt AS (SELECT bucket, sum(o) AS nb FROM obs GROUP BY bucket),
    tot AS (SELECT sum(o) AS n FROM obs),
    chi AS (
      SELECT o.event_type,
             sum((o.o - CAST(gt.ng * bt.nb AS DOUBLE) / tot.n)
                 * (o.o - CAST(gt.ng * bt.nb AS DOUBLE) / tot.n)
                 / (CAST(gt.ng * bt.nb AS DOUBLE) / tot.n)) AS chi2
      FROM obs o JOIN gt USING (event_type) JOIN bt USING (bucket)
      CROSS JOIN tot
      GROUP BY o.event_type
    ),
    p AS (
      SELECT event_type, chi2, exp(-chi2 / 2) AS pval,
             row_number() OVER (ORDER BY exp(-chi2 / 2), event_type) AS i,
             count(*) OVER () AS m
      FROM chi
    ),
    cm AS (
      SELECT sum(1.0 / g.j) AS c_m
      FROM (SELECT unnest(generate_series(1,
            (SELECT CAST(count(*) AS BIGINT) FROM chi))) AS j) g
    ),
    kb AS (
      SELECT coalesce(max(i) FILTER (WHERE pval <= i * {BH_FDR_Q} / m), 0)
        AS k_bh FROM p
    ),
    ky AS (
      SELECT coalesce(max(i) FILTER (
        WHERE pval <= i * {BH_FDR_Q} / (m * (SELECT c_m FROM cm))), 0)
        AS k_by FROM p
    )
    SELECT p.event_type, round(p.pval, 6) AS pval,
           CAST(p.i AS BIGINT) AS rank,
           p.i <= (SELECT k_bh FROM kb) AS bh_reject,
           p.i <= (SELECT k_by FROM ky) AS by_reject,
           round((SELECT c_m FROM cm), 6) AS c_m
    FROM p ORDER BY rank
    """,
)
def q_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli FDR control (2001) on the same per-type
    chi-square battery as ``q_benjamini_hochberg``: the step-up
    threshold shrinks by the harmonic factor c(m) = Σ1/j, buying
    validity under ARBITRARY p-value dependence — the correction you
    owe when the hypotheses share data (these five do: every test
    reads the same bucket marginals). Both decisions are emitted per
    hypothesis, so the rows BH rejects and BY declines are exactly
    the dependence-fragile ones.

    Scale: identical plan to BH — contingency rollups, a 5-row
    p-value frame, one harmonic spine of length m.
    """
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.when(F.col("value") < 30, "lo")
        .when(F.col("value") < 70, "mid")
        .otherwise("hi")
        .alias("bucket"),
    )
    obs = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("o")
    )
    gt = obs.groupBy("event_type").agg(F.sum("o").alias("ng"))
    bt = obs.groupBy("bucket").agg(F.sum("o").alias("nb"))
    tot = obs.agg(F.sum("o").alias("n"))
    chi = (
        obs.join(gt, "event_type")
        .join(F.broadcast(bt), "bucket")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "exp_", F.col("ng").cast("double") * F.col("nb") / F.col("n")
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("o") - F.col("exp_"))
                * (F.col("o") - F.col("exp_"))
                / F.col("exp_")
            ).alias("chi2")
        )
    )
    chi = bounded_window_input(chi, label="q_by hypothesis frame")
    p = chi.select(
        "event_type",
        F.exp(-F.col("chi2") / 2).alias("pval"),
    ).withColumn(
        "i",
        F.row_number().over(Window.orderBy("pval", "event_type")),
    ).withColumn("m", F.count(F.lit(1)).over(Window.partitionBy()))
    m_val = p.agg(F.max("m").alias("mm"))
    cm = (
        m_val.select(
            F.explode(F.sequence(F.lit(1), F.col("mm"))).alias("j")
        )
        .agg(F.sum(1.0 / F.col("j")).alias("c_m"))
    )
    pw = p.crossJoin(F.broadcast(cm))
    kb = pw.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pval") <= F.col("i") * BH_FDR_Q / F.col("m"),
                    F.col("i"),
                )
            ),
            F.lit(0),
        ).alias("k_bh")
    )
    ky = pw.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pval")
                    <= F.col("i") * BH_FDR_Q / (F.col("m") * F.col("c_m")),
                    F.col("i"),
                )
            ),
            F.lit(0),
        ).alias("k_by")
    )
    out = (
        pw.crossJoin(F.broadcast(kb))
        .crossJoin(F.broadcast(ky))
        .select(
            "event_type",
            F.round("pval", 6).alias("pval"),
            F.col("i").cast("long").alias("rank"),
            (F.col("i") <= F.col("k_bh")).alias("bh_reject"),
            (F.col("i") <= F.col("k_by")).alias("by_reject"),
            F.round("c_m", 6).alias("c_m"),
        )
        .orderBy("rank")
    )
    return out
