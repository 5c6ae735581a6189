"""Batch relational surface (SURVEY.md §2B): scans, projection/filter,
joins (inner/outer/semi/anti/cross/theta), aggregation (incl. distinct,
rollup/cube, having), sort/limit.

Everything is Spark built-ins so Catalyst gets predicate pushdown,
column pruning, broadcast-join selection, and AQE re-planning for free.
Scale notes per query are in docstrings — they are the 100 TB design.

All double-typed aggregates are ``round(...)``-ed identically on both
the Spark and DuckDB side so the order-insensitive value hash is not
sensitive to floating-point summation order (Spark partial aggregation
vs DuckDB sequential).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Aggregation over a single big table (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2)  AS sum_base_price,
           round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0, 2)                AS sum_disc_price,
           round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))) / 1000000.0, 2) AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregation with map-side partial aggregation.

    Scale: one shuffle on a 6-value grouping key; partial aggregation
    collapses each input partition to ≤6 rows before the exchange, so
    the shuffle is O(partitions), not O(rows). Filter + 7-column
    projection push down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc100 = F.round(F.col("l_discount") * 100, 0).cast("long")
    tax100 = F.round(F.col("l_tax") * 100, 0).cast("long")
    disc_price_c = cents * (100 - disc100)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(disc_price_c) / 10000.0, 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price_c * (100 + tax100)) / 1000000.0, 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Flagship multi-join revenue query (TPC-H Q5 shape) — also `entry()`
# --------------------------------------------------------------------------
Q05_ORACLE = """
    SELECT n_name,
           round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0, 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@query("q05_regional_revenue", oracle=Q05_ORACLE)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join chain with explicit broadcast of the dimensions.

    Scale: at 100 TB only lineitem⋈orders is a real (shuffle) join;
    customer/nation/region are broadcast so the probe side never
    shuffles for them. The o_orderdate filter is applied before the
    join so the shuffled build side is minimal, and Catalyst pushes it
    into the orders parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))) / 10000.0, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Projection & predicates: IN / BETWEEN / LIKE / RLIKE / null-safe
# --------------------------------------------------------------------------
@query(
    "q_filter_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_acctbal BETWEEN 100.0 AND 9000.0
      AND c_name LIKE 'Customer%'
      AND c_nationkey IS NOT DISTINCT FROM c_nationkey
    ORDER BY c_custkey
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface: isin / between / like / null-safe equality.

    Scale: all four predicates are Catalyst-native; IN and BETWEEN
    reach the parquet scan as PushedFilters, so row groups that cannot
    match are skipped at the source.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
            & F.col("c_acctbal").between(100.0, 9000.0)
            & F.col("c_name").like("Customer%")
            & F.col("c_nationkey").eqNullSafe(F.col("c_nationkey"))
        )
        .select("c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Join variants
# --------------------------------------------------------------------------
@query(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an extra join-side predicate.

    Scale: customer⋈orders shuffles on the customer key; the
    o_orderstatus filter is pushed below the join (scan-level) because
    it only references the right side of a LEFT join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer WHERE EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)) AS n_big_spenders,
      (SELECT count(*) FROM customer WHERE NOT EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_no_orders
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) joins.

    Scale: semi/anti joins never materialize right-side columns, so the
    shuffle carries only the join key; Catalyst de-duplicates the build
    side automatically.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n_big_spenders")
    )
    anti = c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti").agg(
        F.count(F.lit(1)).alias("n_no_orders")
    )
    return semi.crossJoin(anti)


@query(
    "q_join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    ORDER BY nationkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides.

    Scale: aggregate-before-join shrinks both sides to nation
    cardinality (~25), so the full-outer join is trivial regardless of
    input size — the pattern, not the row count, is what scales.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cn.join(sn, "nk", "full_outer")
        .select(
            F.coalesce(cn.nk, sn.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (both sides tiny → broadcast nested loop)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "q_join_range_theta",
    oracle="""
    SELECT p_brand, count(*) AS n_matches,
           round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an additional range (theta) condition.

    Scale: the equi-part (l_partkey = p_partkey) drives the physical
    join (hash/SMJ), and the range predicate is evaluated as a
    post-join filter inside the same stage — never a cartesian
    explosion. Pure range joins (no equi key) should be bucketized
    first; see similarity.py for that pattern.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey)
            & F.col("l_quantity").between(F.col("p_size") - 5, F.col("p_size") + 5),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------
@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders,
           round(sum(DISTINCT round(o_totalprice, 0)), 2) AS sum_distinct_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + SUM(DISTINCT) alongside plain aggregates.

    Scale: Spark plans distinct aggregates with a two-stage Expand +
    partial-aggregate; no driver-side distinct. For very high
    cardinality prefer approx_count_distinct (see q_agg_approx in the
    bench, excluded from hashing since HLL ≠ exact).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum_distinct(F.round("o_totalprice", 0)), 2).alias("sum_distinct_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-status + leaf)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 2^2 grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    ORDER BY o_custkey
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spent"),
        )
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: ORDER BY + LIMIT.

    Scale: Spark plans this as TakeOrderedAndProject — each partition
    keeps its local top-25 and only those reach the driver; no global
    sort is ever materialized.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_above_avg
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (expressed via the SQL API).

    Scale: the scalar subquery is an independent one-row plan reused as
    a literal by the main plan — one extra stage, no per-row
    re-execution.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_above_avg
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "q_join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 400000
    WHERE c_custkey < 100
    ORDER BY c_name, o_orderkey
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (preserves the customer side; the price
    predicate stays in the join condition so unmatched customers
    survive with nulls — in the WHERE it would turn the join inner)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000), "right")
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy("c_name", "o_orderkey")
    )


@query(
    "q_sql_surface",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string entry path: register temp views, run ANSI SQL via
    ``spark.sql`` — proving SQL users get the identical engine surface
    (same Catalyst plan as the DataFrame form; both hit the same
    pushed-down parquet scan)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sql")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               -- 10000.0D, not 10000.0: Spark SQL parses a bare decimal
               -- literal as DECIMAL and the division would come out
               -- decimal(24,2) instead of the oracle's DOUBLE
               round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0D, 2) AS revenue
        FROM lineitem_sql
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q_salted_skew_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events JOIN orders ON user_id % 100 = o_orderkey % 100 AND o_orderkey < 500
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deliberately skewed join (100 coarse buckets as the key)
    executed through :func:`plans.skew.salted_join` — the result is
    identical to the plain join (the oracle), but each hot key is
    split across 8 salts so no single task owns a bucket's whole
    payload. This registers the skew path as an oracle-checked query
    rather than only a unit test."""
    from mi_inbound_pulsar_spark.plans.skew import salted_join

    e = load_table(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("user_id") % 100)
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .withColumn("bucket", (F.col("o_orderkey") % 100))
    )
    joined = salted_join(e, o, key="bucket", n_salts=8, salt_src="event_id")
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_lateral_topk",
    oracle="""
    SELECT o_orderkey, t.l_linenumber, t.l_extendedprice
    FROM orders, LATERAL (
      SELECT l_linenumber, l_extendedprice FROM lineitem
      WHERE l_orderkey = o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber
      LIMIT 2
    ) t
    WHERE o_orderkey < 200
    ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the two priciest line items of each
    order, written as the per-row subquery a SQL user reaches for.
    Catalyst de-correlates it into the same window/top-k plan as the
    row_number() form — the surface differs, the physical plan doesn't.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_lat")
    return spark.sql(
        """
        SELECT o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM orders_lat, LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem_lat
          WHERE l_orderkey = o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber
          LIMIT 2
        ) t
        WHERE o_orderkey < 200
        ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber
        """
    )


@query(
    "q_recursive_calendar",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-07-01 00:00:00'
    )
    SELECT m AS month, count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    ORDER BY m
    """,
)
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): generate the monthly calendar spine and
    left-join order counts onto it — months with zero orders survive,
    which a plain GROUP BY over orders cannot produce. The recursion
    is driver-bounded series generation; the join is the usual
    broadcast of the (tiny) spine.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-07-01 00:00:00'
        )
        SELECT m AS month, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders_rec ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        ORDER BY m
        """
    )


# --------------------------------------------------------------------------
# Skyline / Pareto-frontier (multi-objective dominance)
# --------------------------------------------------------------------------
def local_skyline_batches(batches):
    """Per-batch local skyline (minimize price, minimize size).

    A point survives iff no other point in the batch is <= on both
    coordinates and strictly < on one. Sorted sweep: ascending by
    price, a price-group's min-size rows survive exactly when that min
    undercuts the best (lowest) size seen at any strictly lower price.
    O(n log n) per batch, vectorized in pandas.
    """
    import pandas as pd  # noqa: F401 — Arrow batches arrive as pandas

    for pdf in batches:
        if len(pdf) == 0:
            continue
        grp_min = pdf.groupby("p_retailprice")["p_size"].transform("min")
        per_price = pdf.groupby("p_retailprice", sort=True)["p_size"].min()
        prev_best = per_price.cummin().shift(1)
        survives_price = prev_best.isna() | (per_price < prev_best)
        ok = pdf["p_retailprice"].map(survives_price) & (pdf["p_size"] == grp_min)
        yield pdf[ok]


@query(
    "q_skyline_dominance",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
    ORDER BY p_partkey
    """,
)
def q_skyline_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (retail price, size) —
    the multi-objective "Pareto frontier" operator (Borzsony et al.,
    ICDE'01), which no SQL engine exposes directly.

    Two-phase distributed plan, exact by dominance transitivity:

    1. *Local skylines* via Arrow-batched ``mapInPandas`` — each batch
       prunes to its own frontier (a global survivor survives in every
       subset containing it, so the union of local skylines is a
       superset of the answer). This is the phase that scales: 100 TB
       of points reduce to ~frontier-size per partition with zero
       shuffle.
    2. *Global verify* — the small candidate set is broadcast and
       anti-joined against itself with the dominance predicate. Any
       dominated point is dominated by some skyline point (follow the
       dominance chain), and all skyline points are candidates, so the
       anti-join is exact.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    cand = p.mapInPandas(local_skyline_batches, schema=p.schema)
    b = cand.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") <= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") < F.col("p_size"))
        )
    )
    return (
        cand.join(F.broadcast(b), on=dominated, how="left_anti")
        .orderBy("p_partkey")
    )
