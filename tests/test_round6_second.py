"""Round-6 second-phase operator invariants: the statistics family
(Welch, BH, Spearman, Kendall), HITS, the bigram LM, Heaps' law, and
the int8 quantization audit. Each test asserts textbook-mandated
structure on real sf0.001 output — bounds, sign couplings, and
self-consistency between emitted columns — independent of the DuckDB
oracle (which checks engine equality, not mathematical sanity).
"""

from __future__ import annotations

import math


def test_welch_t_sign_and_dof_bounds(spark, sf_dir):
    """t must carry the sign of (mean_a - mean_b); Welch-Satterthwaite
    dof lies in [min(n_a, n_b) - 1, n_a + n_b - 2] (textbook bounds)."""
    from mi_inbound_pulsar_spark.operators.aggstats import q_welch_ttest

    r = q_welch_ttest(spark, sf_dir).collect()[0]
    assert r["n_a"] > 1 and r["n_b"] > 1
    if r["mean_a"] != r["mean_b"]:
        assert math.copysign(1, r["t"]) == math.copysign(
            1, r["mean_a"] - r["mean_b"]
        )
    assert min(r["n_a"], r["n_b"]) - 1 <= r["dof"] <= r["n_a"] + r["n_b"] - 2


def test_benjamini_hochberg_stepup_structure(spark, sf_dir):
    """BH rejections must be a PREFIX of the p-value ranking (the
    step-up rule: everything up to the largest i with p_i <= crit_i is
    rejected, non-monotone dips included), criticals must be the
    i*q/m ladder, and any rejected row beyond its own critical must be
    covered by a later rank that passes."""
    from mi_inbound_pulsar_spark.operators.aggstats import (
        BH_FDR_Q,
        q_benjamini_hochberg,
    )

    rows = q_benjamini_hochberg(spark, sf_dir).collect()
    m = len(rows)
    assert [r["p_rank"] for r in rows] == list(range(1, m + 1))
    # p-values ascend with rank
    pvals = [r["pval"] for r in rows]
    assert pvals == sorted(pvals)
    for r in rows:
        assert abs(r["bh_critical"] - round(r["p_rank"] * BH_FDR_Q / m, 6)) < 1e-9
    flags = [r["rejected"] for r in rows]
    # prefix property
    if any(flags):
        k = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: k + 1]) and not any(flags[k + 1 :])
        # the boundary rank itself must pass its critical
        assert rows[k]["pval"] <= rows[k]["p_rank"] * BH_FDR_Q / m + 1e-9


def test_spearman_rho_bounds(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.aggstats import q_spearman_corr

    rows = q_spearman_corr(spark, sf_dir).collect()
    assert rows, "no priority groups"
    for r in rows:
        assert -1.0 - 1e-9 <= r["spearman_rho"] <= 1.0 + 1e-9
        assert r["n"] > 1


def test_kendall_tau_internal_consistency(spark, sf_dir):
    """tau_b must equal (C - D)/sqrt((n0-n1)(n0-n2)) recomputed from
    the emitted tallies, and C + D can never exceed the pair count."""
    from mi_inbound_pulsar_spark.operators.aggstats import q_kendall_tau

    rows = q_kendall_tau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["concordant"] + r["discordant"] <= r["n_pairs"]
        # tie counts are folded into the denominator, not emitted
        # separately, so check bounds + sign coupling
        assert -1.0 - 1e-9 <= r["kendall_tau_b"] <= 1.0 + 1e-9
        assert math.copysign(1, r["kendall_tau_b"]) == math.copysign(
            1, r["concordant"] - r["discordant"]
        ) or r["concordant"] == r["discordant"]


def test_hits_tiny_star_graph(spark):
    """The emitted top-25 authority slice must be descending,
    ppm-bounded, and sum to at most the full L1-normalized mass."""
    from mi_inbound_pulsar_spark.operators.graph import q_hits_scores

    # run against real data: top-25 emitted, ppm-bounded, sorted
    rows = q_hits_scores(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= 25
    scores = [r["authority_ppm"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= 1_000_000 for s in scores)
    assert sum(scores) <= 1_000_000  # L1-normalized vector, top slice


def test_bigram_lm_flag_consistency(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import q_bigram_lm_cross_entropy

    rows = q_bigram_lm_cross_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["cross_entropy_bits"] > 0
    # distributional flag (round-10): the p95 cut fires on the high
    # tail and ONLY there — non-degenerate and order-consistent
    flagged = [r for r in rows if r["flagged"]]
    kept = [r for r in rows if not r["flagged"]]
    assert flagged and kept
    assert min(r["cross_entropy_bits"] for r in flagged) >= max(
        r["cross_entropy_bits"] for r in kept
    )
    assert len(flagged) <= max(1, int(0.10 * len(rows)))


def test_heaps_law_sublinear(spark, sf_dir):
    """Vocabulary growth must be sublinear: 0 <= beta < 1, and the
    totals must satisfy vocab <= tokens."""
    from mi_inbound_pulsar_spark.operators.text import q_heaps_law

    r = q_heaps_law(spark, sf_dir).collect()[0]
    assert r["total_vocab"] <= r["total_tokens"]
    assert 0.0 <= r["heaps_beta"] < 1.0
    assert r["n_checkpoints"] >= 1


def test_embedding_quantize_error_bound(spark, sf_dir):
    """int8 reconstruction error is bounded by half a quantization step
    per element: |x - deq| <= s/254 (+ float slack), so per-label MSE
    (micro) can never exceed (max_abs_err_milli/1000)^2 * 1e6."""
    from mi_inbound_pulsar_spark.operators.similarity import q_embedding_quantize

    rows = q_embedding_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_elems"] > 0
        assert r["mse_micro"] >= 0
        max_err = r["max_abs_err_milli"] / 1000.0
        assert r["mse_micro"] <= max_err * max_err * 1_000_000 + 1e-6


def test_markov_attribution_structure(spark, sf_dir):
    """Removal effects must lie in [0, 1] (removing a channel cannot
    raise conversion when mass is not renormalized), shares must sum
    to 1, and p_conversion must be a probability shared by all rows."""
    from mi_inbound_pulsar_spark.operators.funnel import q_markov_attribution

    rows = q_markov_attribution(spark, sf_dir).collect()
    assert rows
    shares = 0.0
    pconv = {r["p_conversion"] for r in rows}
    assert len(pconv) == 1 and 0.0 < pconv.pop() <= 1.0
    for r in rows:
        assert -1e-9 <= r["removal_effect"] <= 1.0 + 1e-9
        shares += r["attribution_share"]
    assert abs(shares - 1.0) < 1e-5


def test_attribution_models_conserve_credit(spark, sf_dir):
    """Each model hands out EXACTLY one credit per converting journey
    with at least one touch, so the three per-channel column sums must
    agree with each other (and be a whole number of journeys)."""
    from mi_inbound_pulsar_spark.operators.funnel import q_attribution_models

    rows = q_attribution_models(spark, sf_dir).collect()
    assert rows
    totals = [
        sum(r["linear_credit"] for r in rows),
        sum(r["time_decay_credit"] for r in rows),
        sum(r["position_credit"] for r in rows),
    ]
    for t in totals:
        assert abs(t - totals[0]) < 1e-3
        assert abs(t - round(t)) < 1e-3  # whole journeys
        assert t > 0


def test_hits_star_graph_hand_computed(spark):
    """Hand-checkable star: supplier 100 is bought by customers 1-3,
    supplier 200 only by customer 1. Round 1: auth(100)=3M→750k ppm,
    auth(200)=1M→250k ppm after L1; the shared supplier must dominate
    and the vector must stay exactly L1-normalized in ppm (up to
    integer-division remainder)."""
    from mi_inbound_pulsar_spark.operators.graph import hits_authority_ppm

    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (1, 200)], "cust long, supp long"
    )
    one_round = {
        r["supp"]: r["s"] for r in hits_authority_ppm(edges, rounds=1).collect()
    }
    assert one_round == {100: 750000, 200: 250000}
    final = {r["supp"]: r["s"] for r in hits_authority_ppm(edges).collect()}
    assert final[100] > final[200] > 0
    assert 1_000_000 - len(final) < sum(final.values()) <= 1_000_000


def test_correlation_matrix_bounds(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.aggstats import q_correlation_matrix

    rows = q_correlation_matrix(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["series_a"] < r["series_b"]  # strict upper triangle
        assert (r["series_a"], r["series_b"]) not in seen
        seen.add((r["series_a"], r["series_b"]))
        if r["pearson_r"] is not None:
            assert -1.0 - 1e-9 <= r["pearson_r"] <= 1.0 + 1e-9


def test_mutual_information_bounds(spark, sf_dir):
    """MI is non-negative and NMI (sqrt normalization) lies in [0, 1];
    MI can never exceed either marginal entropy's bound log2(min(|X|,|Y|))."""
    import math

    from mi_inbound_pulsar_spark.operators.aggstats import q_mutual_information

    r = q_mutual_information(spark, sf_dir).collect()[0]
    assert r["n_events"] > 0
    assert r["mi_bits"] >= -1e-9
    assert -1e-9 <= r["normalized_mi"] <= 1.0 + 1e-9
    assert r["mi_bits"] <= math.log2(3) + 1e-6  # |value buckets| = 3


def test_auc_and_gains_consistency(spark, sf_dir):
    """AUC must be in [0,1]; the gains curve must be monotone in
    cum_docs/cum_pos with recall reaching 1.0 at the last cut and
    lift >= 1 at the top bin when the filter ranks better than random."""
    from mi_inbound_pulsar_spark.operators.text import q_auc_roc, q_gains_curve

    a = q_auc_roc(spark, sf_dir).collect()[0]
    assert a["n_pos"] > 0 and a["n_neg"] > 0
    assert -1e-9 <= a["auc_roc"] <= 1.0 + 1e-9

    rows = q_gains_curve(spark, sf_dir).collect()
    assert rows
    docs = [r["cum_docs"] for r in rows]
    pos = [r["cum_pos"] for r in rows]
    assert docs == sorted(docs) and pos == sorted(pos)
    assert abs(rows[-1]["recall"] - 1.0) < 1e-9
    for r in rows:
        assert 0.0 <= r["precision"] <= 1.0 + 1e-9
