"""Pure-Python third opinions for the round-9 operators: replays built
straight from the parquet files (pyarrow + stdlib — no Spark, no
DuckDB), so agreement is evidence about the ALGORITHM, not about two
engines sharing one author's mistake (the tests/test_third_opinions_*
tier; see FLAGSHIPS.md). Where noted, the replay deliberately takes a
DIFFERENT computational path than the production query (recurrence vs
closed form, direct z-norm vs dot-product identity).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
US_PER_DAY = 86_400_000_000


def _events(sf: str):
    t = pq.read_table(
        f"{sf}/events.parquet", columns=["ts", "user_id", "event_type", "value"]
    )
    ts = [v.value for v in t["ts"]]  # micros
    return (
        ts,
        t["user_id"].to_pylist(),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    )


def _daily_cents(sf: str) -> dict[int, int]:
    ts, _, et, val = _events(sf)
    out: dict[int, int] = defaultdict(int)
    for t, e, v in zip(ts, et, val):
        if e == "purchase":
            out[t // US_PER_DAY] += int(round(v * 100))
    return dict(out)


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


# --------------------------------------------------------------------------
# Kalman local level: straight-line Python recurrence replay
# --------------------------------------------------------------------------
def test_kalman_local_level_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        KALMAN_P0,
        KALMAN_Q,
        KALMAN_R,
        q_kalman_local_level,
    )

    got = _row(q_kalman_local_level(spark, SF))
    xs = [c / 100 for _, c in sorted(_daily_cents(SF).items())]
    l, pv, gain, err = xs[0], KALMAN_P0, 0.0, 0.0
    for x in xs[1:]:
        pm = pv + KALMAN_Q
        gain = pm / (pm + KALMAN_R)
        err += abs(x - l)
        l = l + gain * (x - l)
        pv = (1 - gain) * pm
    assert got["n_days"] == len(xs)
    assert got["level"] == round(l, 6)
    assert got["state_var"] == round(pv, 6)
    assert got["kalman_gain"] == round(gain, 6)
    assert got["mae_one_step"] == round(err / (len(xs) - 1), 6)


# --------------------------------------------------------------------------
# Croston: replay with the SES RECURRENCE (production uses closed form)
# --------------------------------------------------------------------------
def test_croston_matches_recurrence_replay(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        CROSTON_ALPHA,
        CROSTON_CENTS_MIN,
        q_croston_intermittent,
    )

    got = _row(q_croston_intermittent(spark, SF))
    ts, _, et, val = _events(SF)
    d0 = min(
        t // US_PER_DAY for t, e in zip(ts, et) if e == "purchase"
    )
    dem: dict[int, int] = defaultdict(int)
    for t, e, v in zip(ts, et, val):
        c = int(round(v * 100))
        if e == "purchase" and c >= CROSTON_CENTS_MIN:
            dem[t // US_PER_DAY - d0 + 1] += c
    pos = sorted(dem)
    assert pos, "demand series empty — cutoff too high for this SF"
    z_hat, p_hat = float(dem[pos[0]]), float(pos[0])
    prev = pos[0]
    for p in pos[1:]:
        z_hat = CROSTON_ALPHA * dem[p] + (1 - CROSTON_ALPHA) * z_hat
        p_hat = CROSTON_ALPHA * (p - prev) + (1 - CROSTON_ALPHA) * p_hat
        prev = p
    assert got["n_demand_days"] == len(pos)
    assert abs(got["z_hat"] - z_hat) < 1e-5
    assert abs(got["p_hat"] - p_hat) < 1e-5
    assert abs(got["croston_forecast"] - z_hat / p_hat) < 1e-5
    assert got["sba_forecast"] < got["croston_forecast"]


# --------------------------------------------------------------------------
# Matrix profile: direct z-normalized vectors (not the dot identity)
# --------------------------------------------------------------------------
def test_matrix_profile_matches_direct_znorm(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        MP_M,
        MP_TOPK,
        q_matrix_profile_topk,
    )

    got = [r.asDict() for r in q_matrix_profile_topk(spark, SF).collect()]
    xs = [c / 100 for _, c in sorted(_daily_cents(SF).items())]
    n = len(xs)

    def znorm(i):  # window starting at 1-based index i
        w = xs[i - 1 : i - 1 + MP_M]
        mu = sum(w) / MP_M
        sd = math.sqrt(sum(v * v for v in w) / MP_M - mu * mu)
        if sd == 0:
            return None
        return [(v - mu) / sd for v in w]

    cand = []
    for i in range(1, n - MP_M + 2):
        for j in range(i + MP_M, n - MP_M + 2):
            a, b = znorm(i), znorm(j)
            if a is None or b is None:
                continue
            dist = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
            cand.append((round(dist, 6), i, j))
    cand.sort()
    expect = cand[:MP_TOPK]
    assert len(got) == len(expect)
    for row, (dist, s1, s2) in zip(got, expect):
        assert (row["s1"], row["s2"]) == (s1, s2)
        assert abs(row["znorm_dist"] - dist) < 2e-6  # identity vs direct


# --------------------------------------------------------------------------
# Granger lag-1: numpy-free closed-form replay from exact int sums
# --------------------------------------------------------------------------
def test_granger_lag1_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_granger_lag1

    got = _row(q_granger_lag1(spark, SF))
    ts, _, et, val = _events(SF)
    cents: dict[int, int] = defaultdict(int)
    views: dict[int, int] = defaultdict(int)
    for t, e, v in zip(ts, et, val):
        day = t // US_PER_DAY
        if e == "purchase":
            cents[day] += int(round(v * 100))
        cents.setdefault(day, cents[day])
        if e == "view":
            views[day] += 1
    days = sorted(cents)
    pairs = [
        (cents[d], cents[d - 1], views.get(d - 1, 0))
        for d in days
        if d - 1 in cents
    ]
    n = len(pairs)
    sy = sum(p[0] for p in pairs)
    syl = sum(p[1] for p in pairs)
    sxl = sum(p[2] for p in pairs)
    cyy = sum(p[0] ** 2 for p in pairs) - sy * sy / n
    cyyl = sum(p[0] * p[1] for p in pairs) - sy * syl / n
    cyxl = sum(p[0] * p[2] for p in pairs) - sy * sxl / n
    cylyl = sum(p[1] ** 2 for p in pairs) - syl * syl / n
    cxlxl = sum(p[2] ** 2 for p in pairs) - sxl * sxl / n
    cylxl = sum(p[1] * p[2] for p in pairs) - syl * sxl / n
    det = cylyl * cxlxl - cylxl * cylxl
    b_u = (cyyl * cxlxl - cyxl * cylxl) / det
    c_u = (cylyl * cyxl - cylxl * cyyl) / det
    rss_r = cyy - cyyl * cyyl / cylyl
    rss_u = cyy - b_u * cyyl - c_u * cyxl
    assert got["n_pairs"] == n
    assert abs(got["beta_ylag"] - b_u) < 1e-6
    assert abs(got["beta_xlag"] - c_u) < 1e-6
    f = (rss_r - rss_u) * (n - 3) / rss_u
    assert abs(got["f_stat"] - f) < 1e-4
    assert rss_u <= rss_r + 1e-9  # adding a regressor can't hurt RSS


# --------------------------------------------------------------------------
# Breusch-Pagan: python two-pass replay + the R^2 in [0,1] invariant
# --------------------------------------------------------------------------
def test_breusch_pagan_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_breusch_pagan

    got = _row(q_breusch_pagan(spark, SF))
    daily = sorted(_daily_cents(SF).items())
    dmin = daily[0][0]
    pts = [(float(d - dmin), c / 100) for d, c in daily]
    n = len(pts)
    st = sum(t for t, _ in pts)
    sy = sum(y for _, y in pts)
    b = (sum(t * y for t, y in pts) - st * sy / n) / (
        sum(t * t for t, _ in pts) - st * st / n
    )
    a = sy / n - b * st / n
    e2 = [(t, (y - a - b * t) ** 2) for t, y in pts]
    se = sum(v for _, v in e2)
    cov = sum(t * v for t, v in e2) - st * se / n
    r2 = cov * cov / (
        (sum(t * t for t, _ in pts) - st * st / n)
        * (sum(v * v for _, v in e2) - se * se / n)
    )
    assert got["n_days"] == n
    assert abs(got["trend_slope"] - b) < 1e-6
    assert abs(got["aux_r2"] - r2) < 1e-6
    assert abs(got["bp_stat"] - n * r2) < 1e-4
    assert 0 <= got["aux_r2"] <= 1


# --------------------------------------------------------------------------
# Kruskal-Wallis: explicit average ranks over the sorted sample
# --------------------------------------------------------------------------
def test_kruskal_wallis_matches_explicit_ranks(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import q_kruskal_wallis

    got = _row(q_kruskal_wallis(spark, SF))
    t = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_acctbal", "c_mktsegment"]
    )
    vals = [
        (int(round(b * 100)), s)
        for b, s in zip(t["c_acctbal"].to_pylist(), t["c_mktsegment"].to_pylist())
    ]
    vals.sort()
    n = len(vals)
    # average ranks with ties
    ranks: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        ranks[vals[i][0]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    rg: dict[str, float] = defaultdict(float)
    ng: Counter = Counter()
    for v, s in vals:
        rg[s] += ranks[v]
        ng[s] += 1
    h = 12 / (n * (n + 1)) * sum(
        rg[s] ** 2 / ng[s] for s in rg
    ) - 3 * (n + 1)
    tie = sum(
        c**3 - c for c in Counter(v for v, _ in vals).values()
    )
    h_corr = h / (1 - tie / (n**3 - n))
    assert got["n"] == n and got["k"] == len(rg)
    assert abs(got["h_stat"] - h_corr) < 1e-5


# --------------------------------------------------------------------------
# Bartlett: python variance pooling replay
# --------------------------------------------------------------------------
def test_bartlett_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import q_bartlett_test

    got = _row(q_bartlett_test(spark, SF))
    t = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_acctbal", "c_mktsegment"]
    )
    groups: dict[str, list[int]] = defaultdict(list)
    for b, s in zip(t["c_acctbal"].to_pylist(), t["c_mktsegment"].to_pylist()):
        groups[s].append(int(round(b * 100)))
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    s2 = {}
    for s, v in groups.items():
        m = sum(v) / len(v)
        s2[s] = sum((x - m) ** 2 for x in v) / (len(v) - 1) / 10000
    pooled = sum((len(groups[s]) - 1) * s2[s] for s in groups) / (nn - k)
    num = (nn - k) * math.log(pooled) - sum(
        (len(groups[s]) - 1) * math.log(s2[s]) for s in groups
    )
    c = 1 + (
        sum(1 / (len(groups[s]) - 1) for s in groups) - 1 / (nn - k)
    ) / (3 * (k - 1))
    assert got["n"] == nn and got["k"] == k
    assert abs(got["pooled_var"] - pooled) < 1e-4
    assert abs(got["bartlett_chi2"] - num / c) < 1e-4


# --------------------------------------------------------------------------
# Cochran's Q: per-user period bits replay
# --------------------------------------------------------------------------
def test_cochran_q_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import q_cochran_q

    got = _row(q_cochran_q(spark, SF))
    ts, uid, et, val = _events(SF)
    pur = [
        (u, t // US_PER_DAY, int(round(v * 100)))
        for t, u, e, v in zip(ts, uid, et, val)
        if e == "purchase"
    ]
    d0 = min(d for _, d, _ in pur)
    bits: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for u, d, c in pur:
        if c >= 10000:
            p = 0 if d - d0 < 10 else (1 if d - d0 < 20 else 2)
            bits[u][p] = 1
        bits.setdefault(u, bits[u])
    cj = [sum(b[i] for b in bits.values()) for i in range(3)]
    sr = sum(sum(b) for b in bits.values())
    sr2 = sum(sum(b) ** 2 for b in bits.values())
    q = 2 * (3 * sum(c * c for c in cj) - sr * sr) / (3 * sr - sr2)
    assert got["n_users"] == len(bits)
    assert [got["n_period1"], got["n_period2"], got["n_period3"]] == cj
    assert abs(got["q_stat"] - q) < 1e-5


# --------------------------------------------------------------------------
# Fisher exact: math.lgamma hypergeometric replay
# --------------------------------------------------------------------------
def test_fisher_exact_matches_lgamma_replay(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        FISHER_N,
        q_fisher_exact,
    )

    got = _row(q_fisher_exact(spark, SF))
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    rows = sorted(
        zip(t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["source"].to_pylist()),
        key=lambda r: (hashlib.md5(f"fx:{r[0]}".encode()).hexdigest(), r[0]),
    )[:FISHER_N]
    n = len(rows)
    r1 = sum(1 for _, lang, _ in rows if lang == "en")
    c1 = sum(1 for _, _, src in rows if int(src[3:]) < 10)
    a = sum(
        1 for _, lang, src in rows if lang == "en" and int(src[3:]) < 10
    )

    def lf(x):
        return math.lgamma(x + 1)

    k_const = lf(r1) + lf(n - r1) + lf(c1) + lf(n - c1) - lf(n)

    def pmf(x):
        return round(
            math.exp(k_const - lf(x) - lf(r1 - x) - lf(c1 - x) - lf(n - r1 - c1 + x)),
            10,
        )

    xs = range(max(0, r1 + c1 - n), min(r1, c1) + 1)
    p_obs = pmf(a)
    p_left = sum(pmf(x) for x in xs if x <= a)
    p_right = sum(pmf(x) for x in xs if x >= a)
    p_two = sum(pmf(x) for x in xs if pmf(x) <= p_obs * (1 + 1e-7))
    assert (got["n"], got["n_en"], got["n_src_a"], got["a_cell"]) == (n, r1, c1, a)
    assert abs(got["p_left"] - p_left) < 1e-5
    assert abs(got["p_right"] - p_right) < 1e-5
    assert abs(got["p_two_sided"] - p_two) < 1e-5
    assert abs((p_left + p_right - p_obs) - 1) < 1e-6  # tails overlap at x=a


# --------------------------------------------------------------------------
# Moments sketch: mergeability is EXACT (integer sums), shape replay
# --------------------------------------------------------------------------
def test_moments_sketch_merge_is_exact(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import q_moments_sketch

    rows = {r["source"]: r.asDict() for r in q_moments_sketch(spark, SF).collect()}
    allrow = rows.pop("__ALL__")
    for c in ("n", "s1", "s2", "s3", "s4"):
        assert allrow[c] == sum(r[c] for r in rows.values()), c
    t = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    xs = t["n_chars"].to_pylist()
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum(x * x for x in xs) / n - mu * mu
    m3 = sum(x**3 for x in xs) / n - 3 * mu * sum(x * x for x in xs) / n + 2 * mu**3
    assert allrow["n"] == n
    assert abs(allrow["mean"] - mu) < 1e-6
    assert abs(allrow["skewness"] - m3 / m2**1.5) < 1e-5


# --------------------------------------------------------------------------
# KMV sketch: full deterministic Python replay (hashes included)
# --------------------------------------------------------------------------
def test_kmv_sketch_matches_python_replay(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        KMV_K,
        KMV_M,
        q_kmv_distinct_sketch,
    )

    got = _row(q_kmv_distinct_sketch(spark, SF))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"])
    sets: dict[str, set[int]] = {"A": set(), "B": set()}
    for text, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
        half = "A" if int(src[3:]) < 10 else "B"
        w = text.split(" ")
        for i in range(len(w) - 4):
            sh = " ".join(w[i : i + 5])
            u = int(hashlib.md5(f"kmv:{sh}".encode()).hexdigest()[:12], 16)
            sets[half].add(u)
    kept = {h: sorted(s)[:KMV_K] for h, s in sets.items()}

    def est(s, ks):
        return float(len(s)) if len(s) <= KMV_K else (KMV_K - 1) * KMV_M / ks[-1]

    assert got["n_a"] == len(sets["A"]) and got["n_b"] == len(sets["B"])
    assert abs(got["est_a"] - est(sets["A"], kept["A"])) < 1e-4
    assert abs(got["est_b"] - est(sets["B"], kept["B"])) < 1e-4
    uni = sorted(set(kept["A"]) | set(kept["B"]))[:KMV_K]
    e_u = float(len(uni)) if len(uni) < KMV_K else (KMV_K - 1) * KMV_M / uni[-1]
    nboth = sum(1 for u in uni if u in sets["A"] and u in sets["B"])
    assert got["n_union"] == len(sets["A"] | sets["B"])
    assert abs(got["est_union"] - e_u) < 1e-4
    assert abs(got["kmv_jaccard"] - nboth / len(uni)) < 1e-6
    # estimator sanity: within 5 standard errors (se ~ 1/sqrt(k))
    assert got["union_rel_error"] < 5 / math.sqrt(KMV_K)


# --------------------------------------------------------------------------
# Landmark harmonic: python multi-source BFS replay (sf0.01 graph)
# --------------------------------------------------------------------------
def test_landmark_harmonic_matches_python_bfs(spark):
    from mi_inbound_pulsar_spark.operators.graph import (
        COPURCHASE_MAX_DF,
        COPURCHASE_MIN_COMMON,
        HARMONIC_LANDMARKS,
        q_landmark_harmonic,
    )

    got = [r.asDict() for r in q_landmark_harmonic(spark, SF01).collect()]
    o = pq.read_table(f"{SF01}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = pq.read_table(f"{SF01}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    cust_of = dict(zip(o["o_orderkey"].to_pylist(), o["o_custkey"].to_pylist()))
    by_part: dict[int, set[int]] = defaultdict(set)
    for ok, part in zip(li["l_orderkey"].to_pylist(), li["l_partkey"].to_pylist()):
        by_part[part].add(cust_of[ok])
    common: Counter = Counter()
    for custs in by_part.values():
        if len(custs) > COPURCHASE_MAX_DF:
            continue
        cs = sorted(custs)
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                common[(cs[i], cs[j])] += 1
    adj: dict[int, set[int]] = defaultdict(set)
    for (x, y), c in common.items():
        if c >= COPURCHASE_MIN_COMMON:
            adj[x].add(y)
            adj[y].add(x)
    verts = sorted(adj)
    nn = len(verts)
    hsum: dict[int, float] = defaultdict(float)
    nreach: Counter = Counter()
    for l in verts[:HARMONIC_LANDMARKS]:
        dist = {l: 0}
        frontier = [l]
        for d in (1, 2, 3):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, d in dist.items():
            if d > 0:
                hsum[v] += 1 / d
                nreach[v] += 1
    expect = sorted(
        (
            (round((nn - 1) / HARMONIC_LANDMARKS * hsum[v], 6), v, nreach[v])
            for v in hsum
        ),
        key=lambda r: (-r[0], r[1]),
    )[:15]
    assert len(got) == len(expect)
    for row, (est, v, nr) in zip(got, expect):
        assert row["node"] == v
        assert row["n_landmarks_reached"] == nr
        assert abs(row["harmonic_est"] - est) < 1e-6


# --------------------------------------------------------------------------
# ERR: range + cascade-dominance invariants
# --------------------------------------------------------------------------
def test_err_eval_invariants(spark):
    from mi_inbound_pulsar_spark.operators.text import NDCG_K, q_err_eval

    rows = [r.asDict() for r in q_err_eval(spark, SF).collect()]
    assert rows, "benchmark produced no queries"
    # upper bound: all K slots graded max (R=3/8), cascade discount applied
    ub = sum(
        (3 / 8) * (5 / 8) ** (i - 1) / i for i in range(1, NDCG_K + 1)
    )
    for r in rows:
        assert 0 < r[f"err_at_{NDCG_K}"] <= round(ub, 6) + 1e-9
        assert 1 <= r["n_ranked"] <= NDCG_K


# --------------------------------------------------------------------------
# Theta forecast: python replay (trend OLS + SES recurrence on theta2)
# --------------------------------------------------------------------------
def test_theta_forecast_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        THETA_ALPHA,
        q_theta_forecast,
    )

    got = _row(q_theta_forecast(spark, SF))
    ys = [c / 100 for _, c in sorted(_daily_cents(SF).items())]
    n = len(ys)
    si = n * (n + 1) / 2
    sii = sum((i + 1) ** 2 for i in range(n))
    sy = sum(ys)
    siy = sum((i + 1) * y for i, y in enumerate(ys))
    b = (siy - si * sy / n) / (sii - si * si / n)
    a = sy / n - b * si / n
    th2 = [2 * y - (a + b * (i + 1)) for i, y in enumerate(ys)]
    l2 = th2[0]
    for v in th2[1:]:  # recurrence, vs the production closed form
        l2 = THETA_ALPHA * v + (1 - THETA_ALPHA) * l2
    assert got["n_days"] == n
    assert abs(got["trend_slope"] - b) < 1e-6
    assert abs(got["theta2_level"] - l2) < 1e-5
    assert abs(got["forecast_1d"] - (0.5 * (a + b * (n + 1)) + 0.5 * l2)) < 1e-5
    assert abs(got["forecast_7d"] - (0.5 * (a + b * (n + 7)) + 0.5 * l2)) < 1e-5


# --------------------------------------------------------------------------
# Hierarchical reconciliation: python replay + coherence identities
# --------------------------------------------------------------------------
def test_hierarchical_reconciliation_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        HIER_ALPHA,
        HIER_SHARE_DAYS,
        HIER_TOP_ALPHA,
        q_hierarchical_reconciliation,
    )

    rows = {
        r["series"]: r.asDict()
        for r in q_hierarchical_reconciliation(spark, SF).collect()
    }
    ts, _, et, _ = _events(SF)
    per: dict[str, Counter] = defaultdict(Counter)
    for t, e in zip(ts, et):
        per[e][t // US_PER_DAY] += 1

    def ses(vals, alpha):
        l = float(vals[0])
        for v in vals[1:]:
            l = alpha * v + (1 - alpha) * l
        return l

    dmax = max(d for c in per.values() for d in c)
    bu, recent = {}, {}
    for k, c in per.items():
        days = sorted(c)
        bu[k] = ses([c[d] for d in days], HIER_ALPHA)
        recent[k] = sum(v for d, v in c.items() if dmax - d < HIER_SHARE_DAYS)
    tot = Counter()
    for c in per.values():
        tot.update(c)
    top = ses([tot[d] for d in sorted(tot)], HIER_TOP_ALPHA)
    rsum = sum(recent.values())
    for k in per:
        assert abs(rows[k]["bu_forecast"] - bu[k]) < 1e-5, k
        assert abs(rows[k]["td_forecast"] - recent[k] / rsum * top) < 1e-5, k
        assert abs(rows[k]["top_forecast"] - top) < 1e-5
        assert abs(rows[k]["bu_total"] - sum(bu.values())) < 1e-5
    # td forecasts are coherent by construction: they sum to the top
    assert abs(sum(r["td_forecast"] for r in rows.values()) - top) < 1e-4


# --------------------------------------------------------------------------
# DP quantile: full deterministic replay incl. the Gumbel keys
# --------------------------------------------------------------------------
def test_dp_quantile_matches_python_replay(spark):
    from mi_inbound_pulsar_spark.operators.sampling import (
        DPQ_EPSILON,
        q_dp_quantile_exponential,
    )

    got = _row(q_dp_quantile_exponential(spark, SF))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    xs = Counter(t["n_chars"].to_pylist())
    n = sum(xs.values())
    vals = sorted(xs)
    cum, cum_le = 0, {}
    for v in vals:
        cum += xs[v]
        cum_le[v] = cum
    true_med = min(v for v in vals if cum_le[v] * 2 >= n)
    best = None
    for v in vals:
        u = -abs(cum_le[v] - n / 2)
        unif = (
            int(hashlib.md5(f"dpq:{v}".encode()).hexdigest()[:13], 16) + 0.5
        ) / 4503599627370496.0
        key = DPQ_EPSILON / 2 * u + (-math.log(-math.log(unif)))
        cand = (round(key, 9), -v)
        if best is None or cand > best:
            best, win = cand, v
    assert got["n"] == n
    assert got["true_median"] == true_med
    assert got["dp_median"] == win
    assert got["rank_error"] == abs(cum_le[win] - cum_le[true_med])
    # non-degeneracy (round-10): at eps=0.02 the Gumbel perturbation
    # must actually flip the argmax away from the true median - at
    # eps=1.0 rank_error was identically 0 at every scale factor and
    # the noise path was dead code
    assert got["rank_error"] > 0


# --------------------------------------------------------------------------
# Event study: python replay + the DiD-consistency identity
# --------------------------------------------------------------------------
def test_event_study_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import (
        ES_BASE_PERIOD,
        ES_PERIOD_DAYS,
        q_event_study,
    )

    rows = {r["period"]: r.asDict() for r in q_event_study(spark, SF).collect()}
    ts, uid, et, val = _events(SF)
    pur = [
        (u, t // US_PER_DAY, int(round(v * 100)))
        for t, u, e, v in zip(ts, uid, et, val)
        if e == "purchase"
    ]
    d0 = min(d for _, d, _ in pur)
    arm_of = lambda u: (
        "A" if hashlib.md5(f"exp7:{u}".encode()).hexdigest()[0] < "8" else "B"
    )
    users = {"A": set(), "B": set()}
    cell: dict[tuple[str, int], int] = defaultdict(int)
    for u, d, c in pur:
        a = arm_of(u)
        users[a].add(u)
        cell[(a, (d - d0) // ES_PERIOD_DAYS)] += c
    periods = sorted({p for _, p in cell})
    means = {
        (a, p): cell[(a, p)] / len(users[a]) / 100
        for a in ("A", "B")
        for p in periods
    }
    base = means[("B", ES_BASE_PERIOD)] - means[("A", ES_BASE_PERIOD)]
    for p in periods:
        eff = means[("B", p)] - means[("A", p)] - base
        assert abs(rows[p]["effect"] - eff) < 1e-5, p
        assert rows[p]["is_post"] == (p > ES_BASE_PERIOD)
    assert rows[ES_BASE_PERIOD]["effect"] == 0.0  # normalization anchor


# --------------------------------------------------------------------------
# Fairness audit: python replay + the rate-mixture identity
# --------------------------------------------------------------------------
def test_fairness_audit_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        QL_FAIR_THRESHOLD,
        q_fairness_audit,
        _ql_scored,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = {r["lang"]: r.asDict() for r in q_fairness_audit(spark, SF).collect()}
    # replay from the Spark-side scored frame (the scorer itself is
    # oracle-verified by q_auc_roc/q_calibration_ece); this test pins
    # the fairness ARITHMETIC on top of it
    scored = [
        r.asDict()
        for r in _ql_scored(load_table(spark, SF, "documents")).collect()
    ]
    groups: dict[str, list[dict]] = defaultdict(list)
    for r in scored:
        groups[r["lang"]].append(r)
    all_pred = sum(1 for r in scored if r["score"] >= QL_FAIR_THRESHOLD)
    all_pos = sum(r["y"] for r in scored)
    all_tp = sum(
        1 for r in scored if r["score"] >= QL_FAIR_THRESHOLD and r["y"] == 1
    )
    for lang, g in groups.items():
        n = len(g)
        n_pos = sum(r["y"] for r in g)
        n_pred = sum(1 for r in g if r["score"] >= QL_FAIR_THRESHOLD)
        n_tp = sum(
            1 for r in g if r["score"] >= QL_FAIR_THRESHOLD and r["y"] == 1
        )
        got = rows[lang]
        assert got["n"] == n and got["n_pos"] == n_pos
        assert abs(got["pred_rate"] - n_pred / n) < 1e-6
        if n_pos:
            assert abs(got["tpr"] - n_tp / n_pos) < 1e-6
            assert abs(
                got["eo_gap"] - (n_tp / n_pos - all_tp / all_pos)
            ) < 1e-6
        assert abs(
            got["dp_gap"] - (n_pred / n - all_pred / len(scored))
        ) < 1e-6
    # group rates mix back to the overall rate
    mix = sum(r["n"] * r["pred_rate"] for r in rows.values()) / sum(
        r["n"] for r in rows.values()
    )
    assert abs(mix - all_pred / len(scored)) < 1e-5


# --------------------------------------------------------------------------
# ROUGE: python clipped-count replay
# --------------------------------------------------------------------------
def test_rouge_overlap_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        ROUGE_PAIRS,
        q_rouge_overlap,
    )

    rows = {r["pair"]: r.asDict() for r in q_rouge_overlap(spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    def grams(doc_id, n):
        w = texts[doc_id].split(" ")
        return Counter(
            " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
        )

    for k in range(ROUGE_PAIRS):
        for n, tag in ((1, "rouge1"), (2, "rouge2")):
            c, r = grams(2 * k, n), grams(2 * k + 1, n)
            ov = sum(min(c[g], r[g]) for g in c.keys() & r.keys())
            p = ov / sum(c.values())
            rr = ov / sum(r.values())
            got = rows[k]
            assert abs(got[f"{tag}_p"] - p) < 1e-6, (k, n)
            assert abs(got[f"{tag}_r"] - rr) < 1e-6, (k, n)
            if p + rr:
                f = 2 * p * rr / (p + rr)
                assert abs(got[f"{tag}_f"] - f) < 1e-6, (k, n)
            else:
                assert got[f"{tag}_f"] is None


# --------------------------------------------------------------------------
# Weibull plot fit: python replay over the Spark-side KM points
# --------------------------------------------------------------------------
def test_weibull_plot_fit_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.funnel import (
        q_survival_curve,
        q_weibull_plot_fit,
    )

    got = _row(q_weibull_plot_fit(spark, SF))
    surv = [r.asDict() for r in q_survival_curve(spark, SF).collect()]
    pts = [
        (math.log(r["day"]), math.log(-math.log(r["survival"])))
        for r in surv
        if r["day"] >= 1 and 0 < r["survival"] < 1
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    k = (sum(x * y for x, y in pts) - sx * sy / n) / (
        sum(x * x for x, _ in pts) - sx * sx / n
    )
    icept = sy / n - k * sx / n
    lam = math.exp(-icept / k)
    assert got["n_points"] == n
    assert abs(got["shape_k"] - k) < 1e-5
    assert abs(got["scale_lambda"] - lam) < 1e-4
    assert abs(got["median_days"] - lam * math.log(2) ** (1 / k)) < 1e-4
    assert 0 <= got["r2"] <= 1


# --------------------------------------------------------------------------
# Good-Turing: python replay + probability-mass sanity
# --------------------------------------------------------------------------
def test_good_turing_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import GT_MAX_R, q_good_turing

    rows = {r["r"]: r.asDict() for r in q_good_turing(spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    cnt: Counter = Counter()
    for text in t["text"].to_pylist():
        w = text.split(" ")
        for i in range(len(w) - 4):
            cnt[" ".join(w[i : i + 5])] += 1
    fof = Counter(cnt.values())
    rs = sorted(fof)
    big_n = sum(r * fof[r] for r in rs)
    # Gale-Sampson Z and the log-log slope
    zs = {}
    for j, r in enumerate(rs):
        q = rs[j - 1] if j else 0
        tt = rs[j + 1] if j + 1 < len(rs) else 2 * r - q
        zs[r] = fof[r] / (0.5 * (tt - q))
    n = len(rs)
    sx = sum(math.log(r) for r in rs)
    sy = sum(math.log(zs[r]) for r in rs)
    b = (
        sum(math.log(r) * math.log(zs[r]) for r in rs) - sx * sy / n
    ) / (sum(math.log(r) ** 2 for r in rs) - sx * sx / n)
    for r in rs:
        if r > GT_MAX_R:
            continue
        got = rows[r]
        assert got["nr"] == fof[r]
        assert abs(got["z_r"] - zs[r]) < 1e-5
        assert abs(got["sgt_rstar"] - (r + 1) * ((r + 1) / r) ** b) < 1e-4
        assert abs(got["sgt_slope"] - b) < 1e-5
        assert abs(got["p_unseen"] - fof.get(1, 0) / big_n) < 1e-6
        if r + 1 in fof:
            assert abs(got["turing_rstar"] - (r + 1) * fof[r + 1] / fof[r]) < 1e-5
        else:
            assert got["turing_rstar"] is None
    assert b < 0  # Zipf-shaped vocabulary: Z falls in r


# --------------------------------------------------------------------------
# Price elasticity: python replay
# --------------------------------------------------------------------------
def test_price_elasticity_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import q_price_elasticity

    got = _row(q_price_elasticity(spark, SF))
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )
    pt = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    price = {
        k: int(round(v * 100))
        for k, v in zip(pt["p_partkey"].to_pylist(), pt["p_retailprice"].to_pylist())
    }
    qty: Counter = Counter()
    for k, q in zip(li["l_partkey"].to_pylist(), li["l_quantity"].to_pylist()):
        qty[k] += int(round(q))
    pts = [
        (math.log(price[k] / 100), math.log(v))
        for k, v in qty.items()
        if v > 0 and k in price
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    slope = (sum(x * y for x, y in pts) - sx * sy / n) / (
        sum(x * x for x, _ in pts) - sx * sx / n
    )
    assert got["n_parts"] == n
    assert abs(got["elasticity"] - slope) < 1e-5
    assert 0 <= got["r2"] <= 1


# --------------------------------------------------------------------------
# Hurst exponent: python R/S replay
# --------------------------------------------------------------------------
def test_hurst_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        HURST_BLOCKS,
        q_hurst_exponent,
    )

    rows = {r["m"]: r.asDict() for r in q_hurst_exponent(spark, SF).collect()}
    xs = [c / 100 for _, c in sorted(_daily_cents(SF).items())]
    n = len(xs)
    pts = []
    for m in HURST_BLOCKS:
        rss = []
        for b in range(n // m):
            blk = xs[b * m : (b + 1) * m]
            mu = sum(blk) / m
            s = math.sqrt(sum(v * v for v in blk) / m - mu * mu)
            if s == 0:
                continue
            z, lo, hi = 0.0, 0.0, 0.0
            for v in blk:
                z += v - mu
                lo, hi = min(lo, z), max(hi, z)
            rss.append((hi - lo) / s)
        if rss:
            mean_rs = sum(rss) / len(rss)
            pts.append((math.log(m), math.log(mean_rs)))
            assert rows[m]["n_blocks"] == len(rss)
            assert abs(rows[m]["mean_rs"] - mean_rs) < 1e-5, m
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    h = (sum(x * y for x, y in pts) - sx * sy / k) / (
        sum(x * x for x, _ in pts) - sx * sx / k
    )
    for m in rows:
        assert abs(rows[m]["hurst_h"] - h) < 1e-5


# --------------------------------------------------------------------------
# Periodogram: python DFT replay + Parseval-flavored share check
# --------------------------------------------------------------------------
def test_periodogram_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        PERIODOGRAM_MAX_P,
        q_periodogram,
    )

    rows = {r["period"]: r.asDict() for r in q_periodogram(spark, SF).collect()}
    xs = [c / 100 for _, c in sorted(_daily_cents(SF).items())]
    n = len(xs)
    mu = sum(xs) / n
    powers = {}
    for p in range(2, PERIODOGRAM_MAX_P + 1):
        a = sum((x - mu) * math.cos(2 * math.pi * t / p) for t, x in enumerate(xs))
        b = sum((x - mu) * math.sin(2 * math.pi * t / p) for t, x in enumerate(xs))
        powers[p] = 2 * (a * a + b * b) / n
    dom = max(powers, key=lambda p: (round(powers[p], 6), -p))
    for p, pw in powers.items():
        assert abs(rows[p]["power"] - pw) < 1e-3 * max(1, abs(pw))
        assert rows[p]["is_dominant"] == (round(powers[p], 6) == round(powers[dom], 6))
    assert abs(sum(r["power_share"] for r in rows.values()) - 1) < 1e-4


# --------------------------------------------------------------------------
# Negative binomial: python MoM replay + overdispersion direction
# --------------------------------------------------------------------------
def test_negbinomial_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import q_negbinomial_fit

    got = _row(q_negbinomial_fit(spark, SF))
    ts, uid, et, _ = _events(SF)
    k: Counter = Counter()
    users = set()
    for u, e in zip(uid, et):
        users.add(u)
        if e == "purchase":
            k[u] += 1
    ks = [k.get(u, 0) for u in users]
    n = len(ks)
    mean = sum(ks) / n
    var = (sum(v * v for v in ks) - sum(ks) ** 2 / n) / (n - 1)
    assert got["n_users"] == n
    assert abs(got["mean"] - mean) < 1e-6
    assert abs(got["var"] - var) < 1e-5
    if var > mean:
        r = mean * mean / (var - mean)
        assert abs(got["nb_r"] - r) < 1e-4
        assert abs(got["nb_zero_share"] - (r / (r + mean)) ** r) < 1e-5
        # overdispersion: NB predicts MORE zeros than Poisson
        assert got["nb_zero_share"] >= got["poisson_zero_share"]
    assert abs(got["obs_zero_share"] - ks.count(0) / n) < 1e-6


# --------------------------------------------------------------------------
# Cronbach's alpha: python replay
# --------------------------------------------------------------------------
def test_cronbach_alpha_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        _CRONBACH_ITEMS,
        q_cronbach_alpha,
    )

    got = _row(q_cronbach_alpha(spark, SF))
    ts, uid, et, _ = _events(SF)
    per: dict[int, Counter] = defaultdict(Counter)
    for u, e in zip(uid, et):
        per[u][e] += 1
    n = len(per)
    k = len(_CRONBACH_ITEMS)
    items = [[c.get(t, 0) for c in per.values()] for t in _CRONBACH_ITEMS]

    def var(xs):
        m = sum(xs) / n
        return (sum(x * x for x in xs) - n * m * m) / (n - 1)

    sum_iv = sum(var(xs) for xs in items)
    totals = [sum(col) for col in zip(*items)]
    tv = var(totals)
    alpha = k / (k - 1) * (1 - sum_iv / tv)
    assert got["n_users"] == n and got["k"] == k
    assert abs(got["sum_item_var"] - sum_iv) < 1e-4
    assert abs(got["total_var"] - tv) < 1e-4
    assert abs(got["cronbach_alpha"] - alpha) < 1e-5


# --------------------------------------------------------------------------
# IPF raking: python replay + margin-convergence invariants
# --------------------------------------------------------------------------
def test_ipf_raking_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.sampling import (
        IPF_ITERS,
        q_ipf_raking,
    )

    rows = {
        (r["lang"], r["half_a"]): r.asDict()
        for r in q_ipf_raking(spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source"])
    cnt: Counter = Counter()
    for lang, src in zip(t["lang"].to_pylist(), t["source"].to_pylist()):
        cnt[(lang, int(src[3:]) < 10)] += 1
    big_n = sum(cnt.values())
    langs = sorted({l for l, _ in cnt})
    w = {c: v / big_n for c, v in cnt.items()}
    for _ in range(IPF_ITERS):
        for l in langs:
            s = sum(v for (cl, _), v in w.items() if cl == l)
            for c in list(w):
                if c[0] == l:
                    w[c] *= (1 / len(langs)) / s
        for h in (True, False):
            s = sum(v for (_, ch), v in w.items() if ch == h)
            for c in list(w):
                if c[1] == h:
                    w[c] *= 0.5 / s
    for c, v in w.items():
        assert abs(rows[c]["w_raked"] - v) < 1e-5, c
        assert abs(rows[c]["upweight"] - v * big_n / cnt[c]) < 1e-4
    # column margins are exact after the final column sweep
    for h in (True, False):
        s = sum(r["w_raked"] for (_, ch), r in rows.items() if ch == h)
        assert abs(s - 0.5) < 1e-4
    # row margins nearly converged (the reported residual is small)
    assert all(r["lang_margin_err"] < 0.02 for r in rows.values())


# --------------------------------------------------------------------------
# Chi-square feature selection: python replay
# --------------------------------------------------------------------------
def test_chi2_feature_selection_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        CHI2_TOP,
        q_chi2_feature_selection,
    )

    got = [r.asDict() for r in q_chi2_feature_selection(spark, SF).collect()]
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source", "text"])
    docs = [
        (int(src[3:]) < 10, set(text.split(" ")))
        for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist())
    ]
    n = len(docs)
    n_pos = sum(1 for cls, _ in docs if cls)
    df_pos: Counter = Counter()
    df_neg: Counter = Counter()
    for cls, toks in docs:
        (df_pos if cls else df_neg).update(toks)
    cand = []
    for tok in set(df_pos) | set(df_neg):
        a, b = df_pos[tok], df_neg[tok]
        if a + b >= n:
            continue
        c, dd = n_pos - a, n - n_pos - b
        chi2 = n * (a * dd - b * c) ** 2 / ((a + b) * (c + dd) * n_pos * (n - n_pos))
        cand.append((round(chi2, 6), tok, a, b))
    cand.sort(key=lambda r: (-r[0], r[1]))
    expect = cand[:CHI2_TOP]
    assert len(got) == len(expect)
    for row, (chi2, tok, a, b) in zip(got, expect):
        assert row["tok"] == tok
        assert (row["df_pos"], row["df_neg"]) == (a, b)
        assert abs(row["chi2"] - chi2) < 1e-5


# --------------------------------------------------------------------------
# Threshold sweep: replay from the scored frame + monotonic recall
# --------------------------------------------------------------------------
def test_threshold_sweep_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        QL_SWEEP_THRESHOLDS,
        q_classifier_threshold_sweep,
        _ql_scored,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    rows = {
        r["threshold"]: r.asDict()
        for r in q_classifier_threshold_sweep(spark, SF).collect()
    }
    scored = [
        r.asDict()
        for r in _ql_scored(load_table(spark, SF, "documents")).collect()
    ]
    prev_recall = 2.0
    for t in QL_SWEEP_THRESHOLDS:
        tp = sum(1 for r in scored if r["score"] >= t and r["y"] == 1)
        fp = sum(1 for r in scored if r["score"] >= t and r["y"] == 0)
        fn = sum(1 for r in scored if r["score"] < t and r["y"] == 1)
        tn = sum(1 for r in scored if r["score"] < t and r["y"] == 0)
        got = rows[t]
        assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
        if tp + fn:
            rec = tp / (tp + fn)
            assert abs(got["recall"] - rec) < 1e-6
            assert rec <= prev_recall + 1e-12  # recall falls as thr rises
            prev_recall = rec
        if tp + fp and tn + fn and tp + fn and tn + fp:
            mcc = (tp * tn - fp * fn) / math.sqrt(
                float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
            )
            assert abs(got["mcc"] - mcc) < 1e-5


# --------------------------------------------------------------------------
# word2vec subsampling: python replay + clamp/head invariants
# --------------------------------------------------------------------------
def test_word2vec_subsample_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        W2V_SUBSAMPLE_T,
        q_word2vec_subsample,
    )

    got = [r.asDict() for r in q_word2vec_subsample(spark, SF).collect()]
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    cnt: Counter = Counter()
    for text in t["text"].to_pylist():
        cnt.update(text.split(" "))
    n = sum(cnt.values())
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert len(got) == len(expect)
    for row, (tok, c) in zip(got, expect):
        f = c / n
        p = min(1.0, math.sqrt(W2V_SUBSAMPLE_T / f) + W2V_SUBSAMPLE_T / f)
        assert row["tok"] == tok and row["c"] == c
        assert abs(row["p_keep"] - p) < 1e-6
        assert row["expected_kept"] == round(c * p)
        assert 0 < row["p_keep"] <= 1


# --------------------------------------------------------------------------
# LOF: python replay from raw embeddings (own cosine, own kNN)
# --------------------------------------------------------------------------
def test_local_outlier_factor_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.similarity import (
        CORE_K,
        q_local_outlier_factor,
    )

    got = [r.asDict() for r in q_local_outlier_factor(spark, SF).collect()]
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: emb
        for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    ids = sorted(vecs)
    knn = {}
    for a in ids:
        sims = sorted(
            ((round(cos(vecs[a], vecs[b]), 6), -b) for b in ids if b != a),
            reverse=True,
        )[:CORE_K]
        knn[a] = [(-nb, 1 - s) for s, nb in sims]  # (neighbor, dist)
    kdist = {a: knn[a][-1][1] for a in ids}
    lrd = {
        a: len(knn[a]) / sum(max(kdist[b], d) for b, d in knn[a])
        for a in ids
    }
    lof = {a: sum(lrd[b] for b, _ in knn[a]) / len(knn[a]) / lrd[a] for a in ids}
    expect = sorted(
        ((round(lof[a], 6), a) for a in ids), key=lambda r: (-r[0], r[1])
    )[:15]
    assert len(got) == len(expect)
    for row, (score, a) in zip(got, expect):
        assert row["vec_id"] == a
        assert abs(row["lof"] - score) < 2e-5
        assert abs(row["k_dist"] - kdist[a]) < 2e-6
        assert abs(row["lrd"] - lrd[a]) < 2e-4


# --------------------------------------------------------------------------
# Seasonal Mann-Kendall: python replay + plain-MK relationship
# --------------------------------------------------------------------------
def test_seasonal_mann_kendall_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        q_seasonal_mann_kendall,
    )

    got = _row(q_seasonal_mann_kendall(spark, SF))
    daily = sorted(_daily_cents(SF).items())
    seasons: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for d, c in daily:
        seasons[d % 7].append((d, c))
    s_tot, var_tot = 0, 0.0
    for obs in seasons.values():
        obs.sort()
        n = len(obs)
        for i in range(n):
            for j in range(i + 1, n):
                s_tot += (obs[j][1] > obs[i][1]) - (obs[j][1] < obs[i][1])
        var_tot += n * (n - 1) * (2 * n + 5) / 18
    z = (
        (s_tot - 1) / math.sqrt(var_tot)
        if s_tot > 0
        else ((s_tot + 1) / math.sqrt(var_tot) if s_tot < 0 else 0.0)
    )
    assert got["n_seasons"] == len(seasons)
    assert got["s_total"] == s_tot
    assert abs(got["var_total"] - var_tot) < 1e-4
    assert abs(got["z"] - z) < 1e-5


# --------------------------------------------------------------------------
# Feature drift report: python replay + PSI/JS relationship
# --------------------------------------------------------------------------
def test_feature_drift_report_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.funnel import (
        q_feature_drift_report,
    )

    rows = {
        r["feature"]: r.asDict()
        for r in q_feature_drift_report(spark, SF).collect()
    }
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )
    feats = {
        "lang": t["lang"].to_pylist(),
        "source": t["source"].to_pylist(),
        "len_band": [str(v // 100) for v in t["n_chars"].to_pylist()],
    }
    ids = t["doc_id"].to_pylist()
    for name, vals in feats.items():
        c0: Counter = Counter()
        c1: Counter = Counter()
        for i, v in zip(ids, vals):
            (c0 if i % 2 == 0 else c1)[v] += 1
        dom = set(c0) | set(c1)
        k = len(dom)
        n0, n1 = sum(c0.values()), sum(c1.values())
        psi = js = 0.0
        for v in dom:
            p = (c0[v] + 0.5) / (n0 + 0.5 * k)
            q = (c1[v] + 0.5) / (n1 + 0.5 * k)
            m = (p + q) / 2
            psi += (p - q) * math.log(p / q)
            js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        got = rows[name]
        assert got["n_values"] == k, name
        assert abs(got["psi"] - psi) < 1e-5
        assert abs(got["js_divergence"] - js) < 1e-5
        assert got["drift_flag"] == (psi >= 0.1)
        assert got["js_divergence"] >= 0


# --------------------------------------------------------------------------
# Mantel-Haenszel: python replay + A/A plausibility
# --------------------------------------------------------------------------
def test_mantel_haenszel_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import q_mantel_haenszel

    got = _row(q_mantel_haenszel(spark, SF))
    o = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    ret = defaultdict(int)
    for ok, rf in zip(li["l_orderkey"].to_pylist(), li["l_returnflag"].to_pylist()):
        if rf == "R":
            ret[ok] = 1
    cells: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for ok, ck, pr in zip(
        o["o_orderkey"].to_pylist(),
        o["o_custkey"].to_pylist(),
        o["o_orderpriority"].to_pylist(),
    ):
        exp = hashlib.md5(f"exp7:{ck}".encode()).hexdigest()[0] < "8"
        r = ret.get(ok, 0)
        idx = (0 if r else 1) if exp else (2 if r else 3)
        cells[pr][idx] += 1
    rd = bc = e = v = 0.0
    sa = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        rd += a * d / n
        bc += b * c / n
        sa += a
        e += (a + b) * (a + c) / n
        v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    assert got["n_strata"] == len(cells)
    assert abs(got["mh_odds_ratio"] - rd / bc) < 1e-5
    assert abs(got["cmh_chi2"] - (abs(sa - e) - 0.5) ** 2 / v) < 1e-4
    # A/A hash split: the common odds ratio should sit near 1
    assert 0.5 < got["mh_odds_ratio"] < 2.0


# --------------------------------------------------------------------------
# Bradley-Terry: python Zermelo replay + probability-vector invariant
# --------------------------------------------------------------------------
def test_bradley_terry_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        BT_ITERS,
        q_bradley_terry,
    )

    rows = {
        r["event_type"]: r.asDict() for r in q_bradley_terry(spark, SF).collect()
    }
    ts, _, et, _ = _events(SF)
    daily: dict[str, Counter] = defaultdict(Counter)
    for t, e in zip(ts, et):
        daily[e][t // US_PER_DAY] += 1
    types = sorted(daily)
    w: Counter = Counter()
    for i in types:
        for j in types:
            if i == j:
                continue
            w[(i, j)] = sum(
                1
                for d in set(daily[i]) & set(daily[j])
                if daily[i][d] > daily[j][d]
            )
    nmat = {(i, j): w[(i, j)] + w[(j, i)] for (i, j) in w}
    wins = {i: sum(w[(i, j)] for j in types if j != i) for i in types}
    p = {i: 1.0 for i in types}
    for _ in range(BT_ITERS):
        p = {
            i: wins[i]
            / sum(nmat[(i, j)] / (p[i] + p[j]) for j in types if j != i)
            for i in types
        }
    z = sum(p.values())
    for i in types:
        assert rows[i]["wins"] == wins[i]
        assert abs(rows[i]["strength"] - p[i] / z) < 1e-5
    assert abs(sum(r["strength"] for r in rows.values()) - 1) < 1e-4
    ranks = sorted(rows.values(), key=lambda r: r["rank"])
    assert all(
        ranks[i]["strength"] >= ranks[i + 1]["strength"] - 1e-9
        for i in range(len(ranks) - 1)
    )


# --------------------------------------------------------------------------
# Spiegelhalter Z: replay from the scored frame
# --------------------------------------------------------------------------
def test_spiegelhalter_z_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        q_spiegelhalter_z,
        _ql_scored,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    got = _row(q_spiegelhalter_z(spark, SF))
    scored = [
        r.asDict()
        for r in _ql_scored(load_table(spark, SF, "documents")).collect()
    ]
    pr = [(r["y"], 1 / (1 + math.exp(-r["score"]))) for r in scored]
    n = len(pr)
    brier = sum((y - p) ** 2 for y, p in pr) / n
    num = sum((y - p) * (1 - 2 * p) for y, p in pr)
    den = sum((1 - 2 * p) ** 2 * p * (1 - p) for y, p in pr)
    assert got["n"] == n
    assert abs(got["brier"] - brier) < 1e-6
    assert abs(got["spiegelhalter_z"] - num / math.sqrt(den)) < 1e-4
