"""Plan-quality regression tests — the 100 TB contract, asserted.

These check the *physical plan*, not the answer: broadcast joins where
a dimension is small, predicate pushdown reaching the parquet scan,
column pruning, and no accidental cartesian products. A refactor that
silently turns a broadcast join into a shuffle join or loses pushdown
passes the value tests but fails here.
"""

from __future__ import annotations

import pytest


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan_of(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q05_broadcasts_all_dimensions(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.relational import q05_regional_revenue

    plan = plan_of(q05_regional_revenue(spark, sf_dir))
    # customer, nation, region (and the filtered orders side) broadcast —
    # the lineitem probe side must never shuffle for a dimension join
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # at test SF everything broadcasts


def test_q06_pushes_all_predicates_to_scan(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.tpch import q06_forecast_revenue

    plan = formatted_plan_of(q06_forecast_revenue(spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThanOrEqual(l_discount,0.07)" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_q01_prunes_unused_columns(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.relational import q01_pricing_summary

    plan = formatted_plan_of(q01_pricing_summary(spark, sf_dir))
    # lineitem has 11 columns; the scan must read only the 7 referenced
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema
    assert "l_returnflag" in read_schema


def test_filter_predicates_reach_parquet(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.relational import q_filter_predicates

    plan = formatted_plan_of(q_filter_predicates(spark, sf_dir))
    assert "In(c_mktsegment" in plan
    assert "GreaterThanOrEqual(c_acctbal,100.0)" in plan
    assert "StringStartsWith(c_name,Customer)" in plan


def test_semi_join_is_not_inner(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.tpch import q04_order_priority

    plan = plan_of(q04_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan


def test_sort_limit_is_take_ordered(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.relational import q_sort_limit

    plan = plan_of(q_sort_limit(spark, sf_dir))
    # global ORDER BY + LIMIT must plan as TakeOrderedAndProject —
    # never a full global sort
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_scan_agg(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.tpch import q06_forecast_revenue

    df = q06_forecast_revenue(spark, sf_dir)
    df.collect()  # AQE only finalizes the plan on execution
    plan = plan_of(df)
    # '*(n)' marks a whole-stage-codegen span in the plan string; the
    # scan→filter→partial-agg pipeline must be inside one
    assert "*(1) HashAggregate" in plan or "*(1) Filter" in plan or "*(1) Project" in plan


def test_stream_static_join_broadcasts_static_side(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.eventsops import q_stream_static_join

    plan = plan_of(q_stream_static_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q08_broadcasts_every_dimension(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.tpch import q08_market_share

    plan = plan_of(q08_market_share(spark, sf_dir))
    # part, supplier, nation x2, region broadcast; only lineitem⋈orders
    # may shuffle — never a cartesian
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_q21_uses_semi_and_anti_joins(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.tpch import q21_waiting_supplier

    plan = plan_of(q21_waiting_supplier(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_corpus_filter_single_hash_shuffle(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import q_corpus_filter_pipeline

    plan = plan_of(q_corpus_filter_pipeline(spark, sf_dir))
    # the whole clean→score→filter pipeline hash-shuffles exactly once
    # (dedup window on md5); the final orderBy adds one range exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange rangepartitioning") == 1, plan


def test_asof_join_is_single_shuffle_jvm_window(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.asof import q_asof_join

    plan = plan_of(q_asof_join(spark, sf_dir))
    # union-window form: pure JVM (no Python operator in the plan),
    # ONE hash shuffle for the per-key window, one range for orderBy
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_window_and_pandas_forms_agree(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.asof import asof_join, asof_join_pandas
    from mi_inbound_pulsar_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    args = dict(key="user_id", left_ts="click_ts", right_ts="purchase_ts",
                right_cols=["purchase_id", "purchase_ts"])
    a = {tuple(r) for r in asof_join(clicks, purchases, **args).collect()}
    b = {tuple(r) for r in asof_join_pandas(clicks, purchases, **args).collect()}
    assert a == b and len(a) > 0


def test_tfidf_and_ngram_topk_are_take_ordered(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import q_ngram_frequency, q_tfidf_search

    for q in (q_ngram_frequency, q_tfidf_search):
        plan = plan_of(q(spark, sf_dir))
        # top-N must be TakeOrdered (per-partition fold), never a global sort
        assert "TakeOrderedAndProject" in plan, plan


def test_asof_join_nullable_right_cols_come_from_same_row(spark):
    """A NULL field in the matched right row must surface as NULL — not
    be back-filled from an older right row (same-row struct carry)."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.asof import asof_join, asof_join_forward

    left = spark.createDataFrame([("k", 100)], "key string, lts long")
    right = spark.createDataFrame(
        [("k", 10, "old-label", 1), ("k", 50, None, 2)],
        "key string, rts long, label string, rid int",
    )
    got = asof_join(
        left, right, key="key", left_ts="lts", right_ts="rts",
        right_cols=["rid", "label"],
    ).collect()
    assert len(got) == 1 and got[0]["rid"] == 2 and got[0]["label"] is None

    fwd_left = spark.createDataFrame([("k", 5)], "key string, lts long")
    got_f = asof_join_forward(
        fwd_left, right, key="key", left_ts="lts", right_ts="rts",
        right_cols=["rid", "label"],
    ).collect()
    # forward match is rts=10 whose label is non-null; now probe a null
    assert len(got_f) == 1 and got_f[0]["rid"] == 1 and got_f[0]["label"] == "old-label"
    fwd_left2 = spark.createDataFrame([("k", 20)], "key string, lts long")
    got_f2 = asof_join_forward(
        fwd_left2, right, key="key", left_ts="lts", right_ts="rts",
        right_cols=["rid", "label"],
    ).collect()
    assert len(got_f2) == 1 and got_f2[0]["rid"] == 2 and got_f2[0]["label"] is None


def test_scd2_uses_single_user_partitioning(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.cdc import q_scd2_dimension

    plan = plan_of(q_scd2_dimension(spark, sf_dir))
    # both windows + the change filter share ONE hashpartitioning(user_id)
    # Exchange; the only other Exchange is the presentation orderBy
    assert plan.count("hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan


def test_winsorized_bounds_join_is_broadcast(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.aggstats import q_winsorized_stats

    plan = plan_of(q_winsorized_stats(spark, sf_dir))
    # per-group clip bounds are a 1-row-per-group dimension — must
    # broadcast, never shuffle the fact side for it
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_interval_overlap_join_is_equijoin_on_bucket(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.graph import q_interval_overlap_join

    plan = plan_of(q_interval_overlap_join(spark, sf_dir))
    # the overlap predicate rides INSIDE a day-bucket equi-join —
    # never a nested-loop over the whole timeline
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_stage_joins_carry_keys_only(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_funnel_stages

    plan = formatted_plan_of(q_funnel_stages(spark, sf_dir))
    # stage inputs scan only the columns the funnel needs
    assert "props" not in plan and "event_id" not in plan


def test_shingle_explode_evaluates_gram_expression_once(spark, sf_dir):
    """Catalyst's InferFiltersFromGenerate synthesizes a filter below a
    non-outer explode that re-evaluates the generator expression with
    projection aliases inlined — for the shingle pipeline that meant
    O(len²) re-splits per document (8.3 s vs 0.5 s at sf0.1).
    ``shingles`` uses explode_outer + a null filter to sidestep the
    rule; assert the expensive gram expression appears exactly once in
    the physical plan (the single Project), never inside a Filter."""
    from mi_inbound_pulsar_spark.operators.dedup import shingles
    from mi_inbound_pulsar_spark.sources.tables import load_table

    plan = plan_of(shingles(load_table(spark, sf_dir, "documents")))
    # the gram builder is the only CASE WHEN in this plan; the inferred
    # filter would duplicate it (2 copies in Filter + 1 in Project)
    assert plan.count("CASE WHEN") == 1, plan


def test_minhash_array_signatures_match_groupby_signatures(spark, sf_dir):
    """minhash_signatures_arr (narrow, interpreted-HOF) and
    minhash_signatures (explode + codegen'd groupBy) must produce the
    identical xxhash64(seed, shingle) minima — one is a drop-in for
    the other."""
    from mi_inbound_pulsar_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_arr,
        shingle_arrays,
        shingles,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    via_groupby = minhash_signatures(shingles(d), k=8)
    via_arrays = minhash_signatures_arr(shingle_arrays(d), k=8)
    assert via_groupby.exceptAll(via_arrays).count() == 0
    assert via_arrays.exceptAll(via_groupby).count() == 0


def test_topk_queries_push_rank_limit_below_the_window(spark, sf_dir):
    """Spark 4's InferWindowGroupLimit turns `row_number() <= k` into a
    per-partition WindowGroupLimit — candidates fold BEFORE the
    exchange, the TakeOrdered-per-group contract both top-k queries
    rely on at scale."""
    from mi_inbound_pulsar_spark.operators.sampling import q_bottomk_sample
    from mi_inbound_pulsar_spark.operators.windows import q_topk_per_group

    assert "WindowGroupLimit" in plan_of(q_topk_per_group(spark, sf_dir))
    assert "WindowGroupLimit" in plan_of(q_bottomk_sample(spark, sf_dir))


def test_attribution_uses_single_user_partitioning(spark, sf_dir):
    """The RANGE-frame lookback window must be the only per-user
    exchange — a second hashpartitioning(user_id) would mean the
    sessionizer idiom regressed into separate window passes."""
    from mi_inbound_pulsar_spark.operators.eventsops import q_last_touch_attribution

    plan = plan_of(q_last_touch_attribution(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_bloom_contamination_broadcasts_position_set(spark, sf_dir):
    """The Bloom position table is bounded by the filter width (2^18),
    so the probe join must be a broadcast — shuffling the probe side
    against it would defeat the bounded-state design."""
    from mi_inbound_pulsar_spark.operators.sampling import q_bloom_contamination

    assert "BroadcastHashJoin" in plan_of(q_bloom_contamination(spark, sf_dir))


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning (the 100 TB pattern:
    a selective dim filter becomes a bloom filter applied inside the
    fact scan's stage, cutting shuffle input before the join). The
    default application-side threshold is 10 GB — it exists FOR the
    100 TB case and never fires at test scale — so this test lowers it
    to prove the machinery and the plan shape; production inherits the
    defaults."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # toggled mid-test for the result-identity check — save it too
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower()  # bloom filter injected
        # and it returns the same result as the un-filtered plan
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        )
        assert j.collect() == plain.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --------------------------------------------------------------------------
# adaptive_broadcast — the shared size gate for node-scale iterative state
# --------------------------------------------------------------------------
def test_adaptive_broadcast_gates_on_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.plans.adaptive import adaptive_broadcast

    big = spark.range(1000).withColumnRenamed("id", "k")
    small = spark.range(10).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2
    )
    # under the bound (count_hint supplied): hint applied → broadcast join
    hinted = big.join(adaptive_broadcast(small, 100, count_hint=10), "k")
    assert "BroadcastHashJoin" in plan_of(hinted)
    # over the bound: no hint — with autoBroadcastJoin disabled the join
    # must fall back to a shuffle join (prove the hint really is absent)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = big.join(adaptive_broadcast(small, 5, count_hint=10), "k")
        assert "BroadcastHashJoin" not in plan_of(gated)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # no count_hint: the frame is counted (11 ≤ 100 → hinted)
    measured = big.join(adaptive_broadcast(small, 100), "k")
    assert "BroadcastHashJoin" in plan_of(measured)
    # results identical either way
    assert sorted(r.k for r in hinted.collect()) == sorted(
        r.k for r in measured.collect()
    )


def test_table_row_bound_cached(spark, sf_dir):
    from mi_inbound_pulsar_spark.plans import adaptive

    adaptive._ROW_COUNT_CACHE.clear()
    n1 = adaptive.table_row_bound(spark, sf_dir, "customer")
    assert n1 > 0
    key = f"{sf_dir}/customer.parquet"
    assert adaptive._ROW_COUNT_CACHE[key] == n1
    # poison the cache: a second call must NOT recount
    adaptive._ROW_COUNT_CACHE[key] = n1 + 7
    assert adaptive.table_row_bound(spark, sf_dir, "customer") == n1 + 7
    adaptive._ROW_COUNT_CACHE.clear()


def test_lpa_kcore_gate_open_at_test_scale(spark, sf_dir):
    # the size gate must leave the small-scale plans unchanged: the
    # customer bound is far under the threshold, so the per-round
    # state joins keep their broadcast hint (the rounds themselves
    # localCheckpoint, so assert the gate's decision directly and
    # that both queries still run end-to-end)
    from mi_inbound_pulsar_spark.operators.graph import (
        q_kcore_peel,
        q_label_propagation,
    )
    from mi_inbound_pulsar_spark.plans.adaptive import (
        ADAPTIVE_BROADCAST_MAX_ROWS,
        table_row_bound,
    )

    assert table_row_bound(spark, sf_dir, "customer") <= ADAPTIVE_BROADCAST_MAX_ROWS
    assert q_label_propagation(spark, sf_dir).count() > 0
    assert "CartesianProduct" not in plan_of(q_kcore_peel(spark, sf_dir))


def test_lpa_kcore_gate_closed_path_is_correct(spark, sf_dir, monkeypatch):
    """Force the size gate CLOSED (as a 100 TB node count would) and
    assert the plain-hash-join fallback computes the identical result:
    the scale path is a first-class code path, not dead code that only
    a production incident would ever execute."""
    from mi_inbound_pulsar_spark.operators import graph
    from mi_inbound_pulsar_spark.plans import adaptive

    open_lpa = graph.q_label_propagation(spark, sf_dir).collect()
    open_kcore = graph.q_kcore_peel(spark, sf_dir).collect()

    # a bound far above the threshold closes the gate at every site
    monkeypatch.setattr(
        graph, "table_row_bound", lambda *a, **k: 10 * adaptive.ADAPTIVE_BROADCAST_MAX_ROWS
    )
    closed_lpa = graph.q_label_propagation(spark, sf_dir).collect()
    closed_kcore = graph.q_kcore_peel(spark, sf_dir).collect()

    assert sorted(map(tuple, closed_lpa)) == sorted(map(tuple, open_lpa))
    assert sorted(map(tuple, closed_kcore)) == sorted(map(tuple, open_kcore))
