"""Set operations (SURVEY.md §2B): union all/distinct, intersect, except.

Scale: UNION ALL is a zero-shuffle concatenation of children;
DISTINCT / INTERSECT / EXCEPT each shuffle once on the full row. For
100 TB dedup across unions prefer hash-key dedup (operators/dedup.py)
over row-wise DISTINCT when a stable key exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table


@query(
    "q_union_all",
    oracle="""
    SELECT nationkey, side FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    )
    ORDER BY side, nationkey
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by column name (no dedup, no shuffle)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s).orderBy("side", "nationkey")


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — nations having a customer or a supplier."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct().orderBy("nationkey")


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations with both roles."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "q_except",
    oracle="""
    SELECT o_orderkey AS orderkey FROM orders WHERE o_orderkey < 500
    EXCEPT
    SELECT l_orderkey FROM lineitem WHERE l_linenumber > 3
    ORDER BY orderkey
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — small orders: no 4th line item. (The earlier
    nations-without-suppliers form was vacuous at sf0.01 — suppliers
    cover all 25 nations — and a 0-row match verifies nothing.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500).select(
        F.col("o_orderkey").alias("orderkey")
    )
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") > 3).select(
        F.col("l_orderkey").alias("orderkey")
    )
    return o.subtract(big).orderBy("orderkey")


@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the sides).

    Scale: implemented by Spark as an aggregate on the key with two
    counts, so the shuffle carries keys+counts, never the duplicated
    rows themselves."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s).orderBy("nationkey")


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity = left minus right)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).orderBy("nationkey")


@query(
    "q_unpivot",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2)      AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(sum(l_discount), 2)      AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag, 'sum_qty'   AS metric, sum_qty   AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_disc'  AS metric, sum_disc  AS value FROM agg
    )
    ORDER BY l_returnflag, metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): per-flag aggregates melted into
    (key, metric, value) rows — the inverse of pivot, used to feed
    metric stores. Spark's native ``unpivot`` expands map-side
    (an Expand node, like sliding windows) — no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return (
        agg.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "sum_disc"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "metric")
    )
