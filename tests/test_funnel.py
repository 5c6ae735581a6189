"""Invariant tests for the product-analytics family."""

from __future__ import annotations

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.funnel import (
    q_cohort_retention,
    q_funnel_stages,
    q_psi_drift,
)
from mi_inbound_pulsar_spark.sources.tables import load_table


def test_funnel_is_monotone_and_ordered(spark, sf_dir):
    r = q_funnel_stages(spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_signup >= r.n_click_after >= r.n_purchase_after
    assert 0 <= r.click_to_purchase <= 1 and 0 <= r.signup_to_click <= 1
    # ordering matters: a user whose only purchase precedes their first
    # click must not count — check against an unordered count
    e = load_table(spark, sf_dir, "events")
    unordered = (
        e.groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "signup").alias("s"),
            F.count_if(F.col("event_type") == "click").alias("c"),
            F.count_if(F.col("event_type") == "purchase").alias("p"),
        )
        .filter((F.col("s") > 0) & (F.col("c") > 0) & (F.col("p") > 0))
        .count()
    )
    assert r.n_purchase_after <= unordered


def test_cohort_week_zero_retention_is_one(spark, sf_dir):
    rows = q_cohort_retention(spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for cohort, rs in by_cohort.items():
        wk0 = [r for r in rs if r.wk == 0]
        assert len(wk0) == 1 and wk0[0].retention == 1.0  # first week = everyone
        for r in rs:
            assert 0 < r.retention <= 1.0
            assert r.n_active <= r.cohort_size


def test_psi_buckets_partition_both_windows(spark, sf_dir):
    rows = q_psi_drift(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(10))  # decile design
    e = load_table(spark, sf_dir, "events")
    n = e.count()
    assert sum(r.n_ref for r in rows) + 0 == e.filter(F.col("ts") < "2024-01-20").count()
    assert sum(r.n_ref + r.n_cur for r in rows) == n
    # deciles of the reference window are near-uniform by construction
    ref_total = sum(r.n_ref for r in rows)
    for r in rows:
        assert abs(r.n_ref - ref_total / 10) <= ref_total * 0.02 + 2


def test_table_profile_counts_are_consistent(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_table_profile

    e = load_table(spark, sf_dir, "events")
    n = e.count()
    rows = {r.column_name: r for r in q_table_profile(spark, sf_dir).collect()}
    assert set(rows) == {"event_id", "user_id", "value", "ts_epoch_us", "event_type", "props"}
    for name, r in rows.items():
        assert r.n_rows == n
        assert 0 <= r.n_null <= n
        assert 1 <= r.n_distinct <= n - r.n_null
    assert rows["event_id"].n_distinct == n  # primary key
    assert rows["event_type"].n_distinct == 5
    assert rows["event_type"].min_str == "click" and rows["event_type"].max_str == "view"
    assert rows["value"].min_num <= rows["value"].max_num


def test_windowed_funnel_is_subset_of_unbounded(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_funnel_windowed

    unbounded = q_funnel_stages(spark, sf_dir).collect()[0]
    windowed = q_funnel_windowed(spark, sf_dir).collect()[0]
    assert windowed.n_signup == unbounded.n_signup  # stage 1 unaffected
    assert windowed.n_click_72h <= unbounded.n_click_after
    assert windowed.n_purchase_72h <= unbounded.n_purchase_after
    assert 0 <= windowed.full_funnel_rate <= 1


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_rfm_segmentation

    rows = q_rfm_segmentation(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            v = getattr(r, col)
            assert 1 <= v <= 5
            counts[v] = counts.get(v, 0) + 1
        # ntile balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n
    # best recency score goes to the most recent purchaser
    most_recent = min(rows, key=lambda r: (r.recency_days, r.user_id))
    assert most_recent.r_score == 1


def test_markov_rows_are_probability_distributions(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_markov_transitions

    rows = q_markov_transitions(spark, sf_dir).collect()
    by_prev: dict = {}
    for r in rows:
        assert 0 < r.prob <= 1
        by_prev.setdefault(r.prev, []).append(r)
    assert set(by_prev) == {"click", "error", "purchase", "signup", "view"}
    for prev, rs in by_prev.items():
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-4


def test_event_streaks_match_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_event_streaks

    e = load_table(spark, sf_dir, "events")
    seqs: dict = {}
    for r in e.select("user_id", "ts", "event_id", "event_type").collect():
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    expected = {}
    for uid, rows in seqs.items():
        rows.sort()
        best, best_types = 0, set()
        run, prev = 0, None
        for _, _, t in rows:
            run = run + 1 if t == prev else 1
            prev = t
            if run > best:
                best, best_types = run, {t}
            elif run == best:
                best_types.add(t)
        expected[uid] = (best, min(best_types))
    got = {r.user_id: (r.longest_streak, r.streak_type) for r in q_event_streaks(spark, sf_dir).collect()}
    assert got == expected


def test_pareto_cum_share_is_monotone(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_pareto_contribution

    rows = q_pareto_contribution(spark, sf_dir).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))
    revs = [r.revenue_cents for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert 0 < shares[-1] <= 1


def test_basket_lift_matches_python(spark, sf_dir):
    from itertools import combinations
    from mi_inbound_pulsar_spark.operators.funnel import q_basket_lift

    li = load_table(spark, sf_dir, "lineitem")
    baskets: dict = {}
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_orders = len(baskets)
    freq: dict = {}
    pair_n: dict = {}
    for items in baskets.values():
        for p in items:
            freq[p] = freq.get(p, 0) + 1
        for p1, p2 in combinations(sorted(items), 2):
            pair_n[(p1, p2)] = pair_n.get((p1, p2), 0) + 1
    rows = q_basket_lift(spark, sf_dir).collect()
    for r in rows:
        assert pair_n[(r.p1, r.p2)] == r.n_both
        lift = (r.n_both / n_orders) / ((freq[r.p1] / n_orders) * (freq[r.p2] / n_orders))
        assert abs(r.lift - lift) < 1e-4


def test_conversion_latency_bounds(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_conversion_latency

    r = q_conversion_latency(spark, sf_dir).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.min_secs <= r.p50_secs <= r.p90_secs <= r.max_secs
    unbounded = q_funnel_stages(spark, sf_dir).collect()[0]
    # conversion here skips the click stage, so it can't be smaller
    # than the strict 3-stage funnel count
    assert r.n_converted >= unbounded.n_purchase_after


def test_twap_is_within_value_range(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_twap

    e = load_table(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("value"), F.max("value")).first()
    rows = q_twap(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {"click", "error", "purchase", "signup", "view"}
    for r in rows:
        assert lo - 1e-6 <= r.twap <= hi + 1e-6
        assert r.n_intervals > 0 and r.total_secs > 0


def test_period_over_period_growth_identities(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_period_over_period

    rows = q_period_over_period(spark, sf_dir).collect()
    assert len(rows) >= 14
    assert rows[0].prev_day is None and rows[0].dod_growth is None
    by_day = {r.day: r for r in rows}
    for i, r in enumerate(rows):
        if i >= 1:
            assert r.prev_day == rows[i - 1].n
            assert abs(r.dod_growth - (r.n - r.prev_day) / r.prev_day) < 1e-6
        if i >= 7:
            assert r.prev_week == rows[i - 7].n
