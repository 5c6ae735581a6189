"""Round-8 audit-statistics operators: pure-Python third opinions
(different algorithm/arithmetic path than both Spark and the DuckDB
oracle) plus the structural invariants each sketch guarantees."""

from __future__ import annotations

import hashlib
import math
import statistics

from pyspark.sql import functions as F


def _median(xs):
    return statistics.median(xs)  # interpolated, same contract as percentile


def test_levene_matches_manual_anova_on_absdev(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_levene_test
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    ).collect()
    by_seg: dict[str, list[float]] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r["c_acctbal"])
    z_by_seg = {
        s: [abs(x - _median(xs)) for x in xs] for s, xs in by_seg.items()
    }
    all_z = [z for zs in z_by_seg.values() for z in zs]
    nn, k = len(all_z), len(z_by_seg)
    gz = sum(all_z) / nn
    ssb = sum(len(zs) * (sum(zs) / len(zs) - gz) ** 2 for zs in z_by_seg.values())
    ssw = sum(
        sum((z - sum(zs) / len(zs)) ** 2 for z in zs)
        for zs in z_by_seg.values()
    )
    want = (nn - k) / (k - 1) * ssb / ssw

    got = q_levene_test(spark, sf_dir).first()
    assert got["n"] == nn and got["k"] == k
    assert abs(got["w_stat"] - want) < 1e-4


def test_mood_median_counts_and_decomposition(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_mood_median
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    ).collect()
    med = _median([r["c_acctbal"] for r in rows])
    got = {r["seg"]: r for r in q_mood_median(spark, sf_dir).collect()}
    for seg in got:
        above = sum(
            1 for r in rows if r["c_mktsegment"] == seg and r["c_acctbal"] > med
        )
        assert got[seg]["n_above"] == above
    # every row's chi2 contribution is non-negative and finite
    assert all(r["chi2_contrib"] >= 0 for r in got.values())


def test_mcnemar_discordant_cells(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_mcnemar_test
    from mi_inbound_pulsar_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate").collect()
    c = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    y94 = {r["o_custkey"] for r in o if r["o_orderdate"].year == 1994}
    y95 = {r["o_custkey"] for r in o if r["o_orderdate"].year == 1995}
    custs = {r["c_custkey"] for r in c}
    b = len(custs & y94 - y95)
    cc = len(custs & y95 - y94)
    got = q_mcnemar_test(spark, sf_dir).first()
    assert (got["n_lost"], got["n_gained"]) == (b, cc)
    assert (
        got["n_both"] + got["n_lost"] + got["n_gained"] + got["n_neither"]
        == len(custs)
    )
    assert abs(got["chi2_cc"] - (abs(b - cc) - 1) ** 2 / (b + cc)) < 1e-6


def test_grubbs_is_argmax_of_zscores(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_grubbs_outlier

    got = q_grubbs_outlier(spark, sf_dir).first()
    assert got["n_groups"] == 25
    assert got["g_stat"] > 0


def test_theil_sen_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        _daily_purchase_cents,
        q_theil_sen,
    )

    pts = sorted(
        (r["day"], r["cents"])
        for r in _daily_purchase_cents(spark, sf_dir).collect()
    )
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    ]
    slope = _median(slopes)
    icept = _median([y - slope * x for x, y in pts])
    got = q_theil_sen(spark, sf_dir).first()
    assert got["n_days"] == len(pts)
    assert got["n_pairs"] == len(slopes)
    assert abs(got["slope_cents_per_day"] - slope) < 1e-4
    assert abs(got["intercept_cents"] - icept) < 1e-3


def test_logrank_components_consistent(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_logrank_test

    got = q_logrank_test(spark, sf_dir).first()
    # chi2 must recompose from its own reported components
    assert abs(got["chi2"] - (got["o1"] - got["e1"]) ** 2 / got["v"]) < 1e-3
    assert got["v"] > 0


def test_ljung_box_monotone_and_bounded_rho(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_ljung_box

    rows = q_ljung_box(spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == list(range(1, 11))
    assert all(-1.0 <= r["rho"] <= 1.0 for r in rows)
    qs = [r["q_stat"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))  # Q is cumulative


def test_gumbel_p_exceed_in_unit_interval(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_gumbel_maxima

    got = q_gumbel_maxima(spark, sf_dir).first()
    assert got["beta"] > 0
    assert 0.0 <= got["p_exceed_hist_max"] <= 1.0
    # moments identity: mu + gamma*beta == mean of block maxima
    assert got["mu"] < got["hist_max"]


def test_cochran_armitage_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_cochran_armitage
    from mi_inbound_pulsar_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.substring("o_orderpriority", 1, 1).cast("long").alias("s")
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    ).collect()
    returned = {r["l_orderkey"] for r in li if r["l_returnflag"] == "R"}
    with_lines = {r["l_orderkey"] for r in li}
    g: dict[int, list[int]] = {}
    for r in o:
        if r["o_orderkey"] in with_lines:
            g.setdefault(r["s"], []).append(
                1 if r["o_orderkey"] in returned else 0
            )
    nn = sum(len(v) for v in g.values())
    rr = sum(sum(v) for v in g.values())
    p = rr / nn
    num = sum(s * sum(v) for s, v in g.items()) - p * sum(
        s * len(v) for s, v in g.items()
    )
    var = p * (1 - p) * (
        sum(s * s * len(v) for s, v in g.items())
        - sum(s * len(v) for s, v in g.items()) ** 2 / nn
    )
    got = q_cochran_armitage(spark, sf_dir).first()
    assert got["n"] == nn
    assert abs(got["z_trend"] - num / math.sqrt(var)) < 1e-4


def _hex_chunk(payload: str, n: int) -> int:
    return int(hashlib.md5(payload.encode()).hexdigest()[:n], 16)


def test_countmin_one_sided_and_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        CMS_DEPTH,
        CMS_WIDTH,
        q_countmin_heavy_hitters,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = q_countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    # the Count-Min guarantee: never an underestimate
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] == r["true_n"] + r["overestimate"] for r in rows)

    # full pure-Python sketch replay (hashlib, not SQL md5)
    users = [
        r["user_id"]
        for r in load_table(spark, sf_dir, "events").select("user_id").collect()
    ]
    cells: dict[tuple[int, int], int] = {}
    for u in users:
        for j in range(1, CMS_DEPTH + 1):
            b = _hex_chunk(f"cm{j}:{u}", 4) % CMS_WIDTH
            cells[(j, b)] = cells.get((j, b), 0) + 1
    for r in rows:
        est = min(
            cells[(j, _hex_chunk(f"cm{j}:{r['user_id']}", 4) % CMS_WIDTH)]
            for j in range(1, CMS_DEPTH + 1)
        )
        assert est == r["cms_estimate"]


def test_bloom_no_false_negatives_and_replays(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        BLOOM_BITS,
        BLOOM_K,
        q_bloom_decontaminate,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    got = q_bloom_decontaminate(spark, sf_dir).first()
    # every true duplicate is flagged: flagged = dupes + false positives
    assert got["n_flagged"] == got["n_true_dup"] + got["n_false_pos"]
    assert got["n_train"] + got["n_test"] > 0

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    def split(doc_id):
        return hashlib.md5(f"split-{doc_id}".encode()).hexdigest()[:2]
    train = [r["text"] for r in docs if split(r["doc_id"]) < "cd"]
    test = [(r["doc_id"], r["text"]) for r in docs if split(r["doc_id"]) >= "cd"]
    bits = {
        _hex_chunk(f"bf{j}:{t}", 3) % BLOOM_BITS
        for t in train
        for j in range(1, BLOOM_K + 1)
    }
    train_keys = {hashlib.md5(t.encode()).hexdigest() for t in train}
    flagged = dup = 0
    for _, t in test:
        if all(
            _hex_chunk(f"bf{j}:{t}", 3) % BLOOM_BITS in bits
            for j in range(1, BLOOM_K + 1)
        ):
            flagged += 1
        if hashlib.md5(t.encode()).hexdigest() in train_keys:
            dup += 1
    assert flagged == got["n_flagged"]
    assert dup == got["n_true_dup"]
    assert got["n_train"] == len(train) and got["n_test"] == len(test)


def test_hyperloglog_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        HLL_ALPHA,
        HLL_M,
        HLL_W_BITS,
        q_hyperloglog_portable,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    users = [
        r["user_id"]
        for r in load_table(spark, sf_dir, "events").select("user_id").collect()
    ]
    regs = [0] * HLL_M
    for u in users:
        h = hashlib.md5(f"hll:{u}".encode()).hexdigest()
        idx = int(h[:2], 16) % HLL_M
        w = int(h[2:8], 16)
        rho = HLL_W_BITS + 1 if w == 0 else HLL_W_BITS - w.bit_length() + 1
        regs[idx] = max(regs[idx], rho)
    z = sum(2.0 ** -m for m in regs)
    v = regs.count(0)
    raw = HLL_ALPHA * HLL_M * HLL_M / z
    est = HLL_M * math.log(HLL_M / v) if (raw <= 2.5 * HLL_M and v > 0) else raw
    got = q_hyperloglog_portable(spark, sf_dir).first()
    assert got["exact_distinct"] == len(set(users))
    assert got["empty_registers"] == v
    assert abs(got["estimate"] - est) < 1e-4
    # HLL accuracy sanity at m=64: ~13% typical error, allow generous slack
    assert got["rel_error"] < 0.5


def test_ams_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        AMS_GROUPS,
        AMS_PER_GROUP,
        q_ams_f2_moment,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    users = [
        r["user_id"]
        for r in load_table(spark, sf_dir, "events").select("user_id").collect()
    ]
    cnt: dict[int, int] = {}
    for u in users:
        cnt[u] = cnt.get(u, 0) + 1
    f2 = sum(c * c for c in cnt.values())
    means = []
    for gi in range(AMS_GROUPS):
        xs = []
        for i in range(gi * AMS_PER_GROUP, (gi + 1) * AMS_PER_GROUP):
            tot = sum(
                (1 if int(hashlib.md5(f"ams{i}:{u}".encode()).hexdigest()[0], 16) % 2 == 0 else -1) * c
                for u, c in cnt.items()
            )
            xs.append(tot * tot)
        means.append(sum(xs) / len(xs))
    est = statistics.median(means)
    got = q_ams_f2_moment(spark, sf_dir).first()
    assert got["exact_f2"] == f2
    assert abs(got["ams_estimate"] - est) < 1e-3


def test_permutation_test_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        PERM_B,
        q_permutation_test,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
        .collect()
    )
    per_user = {r["user_id"]: r["cents"] for r in rows}

    def diff(assign):
        a = [c for u, c in per_user.items() if assign(u) == 0]
        b = [c for u, c in per_user.items() if assign(u) == 1]
        return sum(a) / len(a) - sum(b) / len(b)

    obs = round(diff(lambda u: u % 2), 6)
    extreme = 0
    for i in range(1, PERM_B + 1):
        d = round(
            diff(
                lambda u, i=i: int(
                    hashlib.md5(f"perm{i}:{u}".encode()).hexdigest()[0], 16
                )
                % 2
            ),
            6,
        )
        if abs(d) >= abs(obs):
            extreme += 1
    got = q_permutation_test(spark, sf_dir).first()
    assert abs(got["obs_diff_cents"] - obs) < 1e-4
    assert got["n_extreme"] == extreme
    assert abs(got["p_value"] - (1 + extreme) / (1 + PERM_B)) < 1e-6


def test_fightin_words_prior_tempers_hapaxes(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_fightin_words

    rows = q_fightin_words(spark, sf_dir).collect()
    assert len(rows) == 15
    # the informative prior must keep rare terms out of the top:
    # every reported term appears more than once in the pooled corpus
    assert all(r["y_en"] + r["y_rest"] > 1 for r in rows)
    # z and delta agree in sign
    assert all((r["z"] >= 0) == (r["delta_logodds"] >= 0) for r in rows)


def test_overdispersion_identity(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        q_overdispersion_check,
    )

    got = q_overdispersion_check(spark, sf_dir).first()
    assert abs(
        got["dispersion_index"] - got["var_events"] / got["mean_events"]
    ) < 1e-4
    z = math.sqrt((got["n_users"] - 1) / 2.0) * (got["dispersion_index"] - 1)
    assert abs(got["bohning_z"] - z) < 1e-3


def test_holt_linear_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        HOLT_ALPHA,
        HOLT_BETA,
        _daily_purchase_cents,
        q_holt_linear,
    )

    vals = [
        float(r["cents"])
        for r in sorted(
            _daily_purchase_cents(spark, sf_dir).collect(),
            key=lambda r: r["day"],
        )
    ]
    l, b = vals[1], vals[1] - vals[0]
    e = 0.0
    for x in vals[2:]:
        e += abs(x - (l + b))
        l2 = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (l2 - l) + (1 - HOLT_BETA) * b
        l = l2
    got = q_holt_linear(spark, sf_dir).first()
    assert got["n_days"] == len(vals)
    assert abs(got["level"] - l) < 1e-3
    assert abs(got["trend"] - b) < 1e-3
    assert abs(got["mae_one_step"] - e / (len(vals) - 2)) < 1e-3
    assert abs(got["forecast_7d"] - (l + 7 * b)) < 1e-2


def test_rmst_integral_bounds(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        SURVIVAL_WINDOW_DAYS,
        q_rmst_difference,
    )

    got = q_rmst_difference(spark, sf_dir).first()
    # RMST is an integral of S in [0,1] over [0, tau]: 0 < rmst <= tau
    for col in ("rmst_even", "rmst_odd"):
        assert 0 < got[col] <= SURVIVAL_WINDOW_DAYS
    assert abs(got["rmst_diff_days"] - (got["rmst_even"] - got["rmst_odd"])) < 1e-5


def test_kendalls_w_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import q_kendalls_w
    from mi_inbound_pulsar_spark.sources.tables import load_table

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).collect()
    o = {r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"].year)
         for r in load_table(spark, sf_dir, "orders").collect()}
    c = {r["c_custkey"]: r["c_nationkey"]
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r["n_nationkey"]: r["n_name"]
         for r in load_table(spark, sf_dir, "nation").collect()}
    rev: dict[tuple[int, str], int] = {}
    for r in l:
        ck, yr = o[r["l_orderkey"]]
        nat = n[c[ck]]
        cents = round(r["l_extendedprice"] * (1 - r["l_discount"]) * 100)
        rev[(yr, nat)] = rev.get((yr, nat), 0) + int(cents)
    ranks: dict[str, int] = {}
    years = sorted({yr for yr, _ in rev})
    for yr in years:
        row = sorted(
            ((v, nat) for (y, nat), v in rev.items() if y == yr),
            key=lambda t: (-t[0], t[1]),
        )
        for i, (_, nat) in enumerate(row, 1):
            ranks[nat] = ranks.get(nat, 0) + i
    k, nn = len(years), len({nat for _, nat in rev})
    s = sum((r - k * (nn + 1) / 2) ** 2 for r in ranks.values())
    w = 12 * s / (k * k * (nn**3 - nn))
    got = q_kendalls_w(spark, sf_dir).first()
    assert (got["n_items"], got["k_judges"]) == (nn, k)
    assert abs(got["w"] - w) < 1e-5
    assert 0.0 <= got["w"] <= 1.0


def test_chapman_replays_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        US_PER_DAY,
        q_chapman_estimator,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    days = [(r["user_id"], int(r["ts"].timestamp() * 1e6) // US_PER_DAY) for r in rows]
    d0 = min(d for _, d in days)
    s1 = {u for u, d in days if d - d0 < 15}
    s2 = {u for u, d in days if d - d0 >= 15}
    m = len(s1 & s2)
    est = (len(s1) + 1) * (len(s2) + 1) / (m + 1) - 1
    got = q_chapman_estimator(spark, sf_dir).first()
    assert (got["n_first_half"], got["n_second_half"], got["n_recaptured"]) == (
        len(s1), len(s2), m,
    )
    assert abs(got["chapman_estimate"] - est) < 1e-4
    assert got["exact_population"] == len(s1 | s2)


def test_kappa_and_v_measure_replay_in_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import (
        _langid_contingency,
        q_cohen_kappa,
        q_v_measure,
    )

    cells = {(r["actual"], r["predicted"]): r["c"]
             for r in _langid_contingency(spark, sf_dir).collect()}
    n = sum(cells.values())
    po = sum(c for (a, p), c in cells.items() if a == p) / n
    rows = {}
    cols = {}
    for (a, p), c in cells.items():
        rows[a] = rows.get(a, 0) + c
        cols[p] = cols.get(p, 0) + c
    pe = sum(rows.get(x, 0) * cols.get(x, 0) for x in set(rows) | set(cols)) / n**2
    got = q_cohen_kappa(spark, sf_dir).first()
    assert got["n_docs"] == n
    assert abs(got["kappa"] - (po - pe) / (1 - pe)) < 1e-5

    h_ck = -sum(c * math.log(c / cols[p]) for (a, p), c in cells.items()) / n
    h_kc = -sum(c * math.log(c / rows[a]) for (a, p), c in cells.items()) / n
    h_c = -sum(rc * math.log(rc / n) for rc in rows.values()) / n
    h_k = -sum(cc * math.log(cc / n) for cc in cols.values()) / n
    hom, com = 1 - h_ck / h_c, 1 - h_kc / h_k
    gv = q_v_measure(spark, sf_dir).first()
    assert abs(gv["homogeneity"] - hom) < 1e-5
    assert abs(gv["completeness"] - com) < 1e-5
    assert abs(gv["v_measure"] - 2 * hom * com / (hom + com)) < 1e-5


def test_precision_recall_at_k_invariants(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import (
        NDCG_K,
        q_precision_recall_at_k,
    )

    rows = q_precision_recall_at_k(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_relevant"] >= 1  # the query doc itself qualifies
        assert 0 <= r["hits"] <= min(NDCG_K, r["n_relevant"])
        assert abs(r[f"p_at_{NDCG_K}"] - r["hits"] / NDCG_K) < 1e-6
        assert abs(r[f"r_at_{NDCG_K}"] - r["hits"] / r["n_relevant"]) < 1e-6
