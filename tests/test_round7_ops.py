"""Round-7 operator invariants: geometric/statistical properties the
DuckDB oracle can't express as a value hash — the coreset radius
certificate, probability-simplex closure, Gini bounds, confusion-matrix
mass conservation — checked on sf0.001."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_kcenter_trace_certificate(spark):
    """Gonzalez greedy: separation distances are non-increasing down
    the trace (each new center is the current farthest point), the
    seed is the lowest vec_id with distance 0, and centers are
    distinct."""
    from mi_inbound_pulsar_spark.operators.similarity import q_kcenter_coreset

    rows = q_kcenter_coreset(spark, SF).collect()
    assert [r.sel_order for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].sep_distance == 0.0
    seps = [r.sep_distance for r in rows[1:]]
    assert all(a >= b for a, b in zip(seps, seps[1:]))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)
    assert rows[0].vec_id == min(
        r.vec_id
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id")
        .collect()
    )


def test_naive_bayes_confusion_mass(spark):
    """Confusion-matrix counts conserve the md5 test half exactly, and
    predictions only come from classes seen in training."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.text import q_naive_bayes_confusion

    rows = q_naive_bayes_confusion(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_test = docs.filter(
        F.substring(
            F.md5(F.concat(F.lit("nb"), F.col("doc_id").cast("string"))), 1, 2
        )
        >= "80"
    ).count()
    assert sum(r.n_docs for r in rows) == n_test
    train_classes = {
        r.source
        for r in docs.filter(
            F.substring(
                F.md5(F.concat(F.lit("nb"), F.col("doc_id").cast("string"))),
                1,
                2,
            )
            < "80"
        )
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.pred_source for r in rows} <= train_classes


def test_decision_stump_bounds(spark):
    """Weighted binary Gini lies in [0, 0.5]; the rows arrive best
    first; every candidate split partitions the full customer table."""
    from mi_inbound_pulsar_spark.operators.aggstats import q_decision_stump

    rows = q_decision_stump(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    ginis = [r.gini_split for r in rows]
    assert all(0.0 <= g <= 0.5 for g in ginis)
    assert ginis == sorted(ginis)
    assert all(r.n_left + r.n_right == n_cust for r in rows)
    assert all(r.n_left > 0 and r.n_right > 0 for r in rows)


def test_doremi_simplex_and_monotonicity(spark):
    """Both weight columns close over the probability simplex, and the
    multiplicative-weights update is monotone: a domain with a larger
    excess loss never gets a smaller weight."""
    from mi_inbound_pulsar_spark.operators.sampling import q_doremi_reweight

    rows = q_doremi_reweight(spark, SF).collect()
    assert abs(sum(r.domain_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.mixture_weight for r in rows) - 1.0) < 1e-4
    assert all(r.mixture_weight > 0 for r in rows)
    by_excess = sorted(rows, key=lambda r: r.excess_loss)
    ws = [r.domain_weight for r in by_excess]
    assert all(a <= b + 1e-9 for a, b in zip(ws, ws[1:]))


def test_permutation_entropy_distribution(spark):
    """Pattern probabilities form a distribution over at most 3! = 6
    ordinal patterns and the entropy terms are non-negative."""
    from mi_inbound_pulsar_spark.operators.eventsops import (
        q_permutation_entropy,
    )

    rows = q_permutation_entropy(spark, SF).collect()
    assert len(rows) <= 6
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-4
    assert all(r.neg_p_ln_p >= 0 for r in rows)


def test_sax_symbolization(spark):
    """16 segments, alphabet {a,b,c,d}, and the day-weighted PAA mean
    is ~0 (the series was z-normalized before PAA)."""
    from mi_inbound_pulsar_spark.operators.eventsops import q_sax_symbolic

    rows = q_sax_symbolic(spark, SF).collect()
    assert len(rows) == 16
    assert {r.symbol for r in rows} <= set("abcd")
    n = sum(r.n_days for r in rows)
    assert abs(sum(r.paa * r.n_days for r in rows) / n) < 1e-3


def test_hill_tail_index_sanity(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import q_hill_tail_index

    (row,) = q_hill_tail_index(spark, SF).collect()
    assert 0 < row.k_eff <= 200
    assert row.hill_inv > 0
    assert row.tail_index > 0
    assert abs(row.hill_inv * row.tail_index - 1.0) < 1e-3


def test_trigram_support_vs_occurrences(spark):
    """A session votes once for support however often it repeats the
    pattern, so occurrences >= support > 0 for every mined trigram."""
    from mi_inbound_pulsar_spark.operators.eventsops import (
        q_event_trigram_mining,
    )

    rows = q_event_trigram_mining(spark, SF).collect()
    assert rows, "sf0.001 should still produce trigrams"
    assert all(r.occurrences >= r.support > 0 for r in rows)
    assert all(len(r.trigram.split(">")) == 3 for r in rows)


def test_self_bleu_bounds(spark):
    from mi_inbound_pulsar_spark.operators.text import q_self_bleu

    rows = q_self_bleu(spark, SF).collect()
    assert all(0.0 <= r.self_bleu2 <= 1.0 for r in rows)
    assert all(r.clipped <= r.n_bigrams for r in rows)


def test_personalized_pagerank_seeds_dominate(spark):
    """With restart mass pinned to nation-1 customers, at least one
    seed appears in the top-25 and every rank is positive."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.graph import (
        q_personalized_pagerank,
    )

    rows = q_personalized_pagerank(spark, SF).collect()
    assert all(r.ppr_ppm > 0 for r in rows)
    seeds = {
        r.c_custkey
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_nationkey") == 1)
        .select("c_custkey")
        .collect()
    }
    assert any(r.node in seeds for r in rows)


def test_t_closeness_flag_consistency(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import (
        T_CLOSE_THRESHOLD,
        q_t_closeness,
    )

    rows = q_t_closeness(spark, SF).collect()
    assert all(r.t_emd >= 0 for r in rows)
    assert all(r.t_close == (r.t_emd <= T_CLOSE_THRESHOLD) for r in rows)


def test_rdd_internal_consistency(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import (
        RDD_BANDWIDTH_CENTS,
        q_regression_discontinuity,
    )
    from pyspark.sql import functions as F

    (row,) = q_regression_discontinuity(spark, SF).collect()
    in_bw = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(
            F.abs(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
            <= RDD_BANDWIDTH_CENTS
        )
        .count()
    )
    assert row.n_left + row.n_right == in_bw
    assert abs(row.rdd_effect - (row.limit_right - row.limit_left)) < 2e-6


def test_its_internal_consistency(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import (
        q_interrupted_time_series,
    )

    (row,) = q_interrupted_time_series(spark, SF).collect()
    n_days = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderdate")
        .distinct()
        .count()
    )
    assert row.n_pre + row.n_post == n_days
    assert abs(row.level_change - (row.level_post - row.level_pre)) < 2e-6
    assert abs(row.slope_change - (row.slope_post - row.slope_pre)) < 2e-6


def test_matching_att_consistency(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import q_matching_att

    (row,) = q_matching_att(spark, SF).collect()
    assert 0 < row.n_matched <= row.n_treated
    assert (
        abs(row.att - (row.mean_treated - row.mean_matched_control)) < 2e-6
    )
