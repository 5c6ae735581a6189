"""Distributed global ranking (plans/ranking.py): exact equivalence
with the single-partition window it replaces, on tie-heavy and skewed
data, plus the closed-form ntile formula across remainder cases —
and the plan-shape guarantee that no unpartitioned WindowExec
remains in the rewritten queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.plans.ranking import (
    attach_global_order_stats,
    ntile_from_rn,
)


def _reference_rows(spark, n=500):
    # heavy ties in v (only 7 distinct values), unique id tiebreak
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("v"),
        (F.col("id") * 13 % 101).alias("w"),
    )


def test_global_row_number_matches_single_partition_window(spark):
    df = _reference_rows(spark)
    ranked, total = attach_global_order_stats(
        df, [F.desc("v"), F.asc("k")], rn_col="rn", num_partitions=8
    )
    assert total == 500
    expected = df.withColumn(
        "rn_ref",
        F.row_number().over(Window.orderBy(F.desc("v"), F.asc("k"))).cast("long"),
    )
    joined = ranked.join(expected, ["k", "v", "w"])
    assert joined.count() == 500
    assert joined.filter(F.col("rn") != F.col("rn_ref")).count() == 0


def test_global_cumsum_matches_single_partition_window(spark):
    df = _reference_rows(spark)
    ranked, _ = attach_global_order_stats(
        df,
        [F.asc("v"), F.asc("k")],
        rn_col="rn",
        cum_sums={"cw": "w"},
        num_partitions=8,
    )
    w = Window.orderBy(F.asc("v"), F.asc("k")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expected = df.withColumn("cw_ref", F.sum("w").over(w))
    joined = ranked.join(expected, ["k", "v", "w"])
    assert joined.filter(F.col("cw") != F.col("cw_ref")).count() == 0


@pytest.mark.parametrize(
    "n,k",
    [(500, 5), (503, 5), (10, 10), (3, 5), (100, 7),
     (1, 5), (5, 5), (6, 5), (99, 100), (1000, 7), (13, 4)],
)
def test_ntile_formula_matches_builtin(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("x"))
    got = df.select(
        "x",
        ntile_from_rn(F.col("x") + 1, n, k).alias("tile"),
    )
    ref = df.select(
        "x", F.ntile(k).over(Window.orderBy("x")).cast("long").alias("tile_ref")
    )
    joined = got.join(ref, "x")
    assert joined.filter(F.col("tile") != F.col("tile_ref")).count() == 0


def test_rewritten_queries_have_no_unpartitioned_window(spark, sf_dir):
    """The three queries the round-3 verdict flagged must not plan a
    global (unpartitioned) WindowExec — the single-task sort that dies
    at 10⁹ rows."""
    from mi_inbound_pulsar_spark.operators.funnel import (
        q_pareto_contribution,
        q_rfm_segmentation,
    )
    from mi_inbound_pulsar_spark.operators.sampling import q_length_bucketing

    for q in (q_rfm_segmentation, q_pareto_contribution, q_length_bucketing):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window [" in line:
                # unpartitioned windows render with an empty partition
                # spec: "Window [exprs], [order]" (2 brackets, no
                # partition list between them)
                assert line.count("[") >= 3, f"global window in {q.__name__}: {line}"


def test_bounded_window_input_passes_and_enforces(spark):
    """The global-window row-bound guard: transparent (same rows, same
    columns) under the bound, loud job failure with the audit marker
    above it."""
    import pytest

    from mi_inbound_pulsar_spark.plans.ranking import (
        BOUNDED_WINDOW_MARK,
        bounded_window_input,
    )

    df = spark.range(10).withColumnRenamed("id", "v")
    ok = bounded_window_input(df, max_rows=10)
    assert ok.columns == ["v"]
    assert sorted(r["v"] for r in ok.collect()) == list(range(10))

    bad = bounded_window_input(df, max_rows=5, label="test")
    with pytest.raises(Exception) as exc:
        bad.collect()
    assert BOUNDED_WINDOW_MARK in str(exc.value)


def test_bounded_window_guard_visible_to_plan_audit(spark):
    """The marker must survive Catalyst optimization inside the window
    node's subtree — otherwise the plan audit's mechanical waiver
    silently stops working (column pruning would drop an unused
    guard)."""
    from pyspark.sql import Window

    from mi_inbound_pulsar_spark.plans.ranking import (
        BOUNDED_WINDOW_MARK,
        bounded_window_input,
    )

    df = spark.range(10).withColumnRenamed("id", "v")
    guarded = bounded_window_input(df)
    out = guarded.withColumn(
        "cum", F.sum("v").over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
    )
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert BOUNDED_WINDOW_MARK in opt
