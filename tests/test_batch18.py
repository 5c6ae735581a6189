"""Pure-Python third opinions for TOST, exact Bayesian A/B, and the
beta-binomial fit. The Bayesian replay evaluates P(p_B > p_A) by
NUMERICAL INTEGRATION of the Beta posterior product (Simpson's rule on
a fine grid) — a completely different computation than the closed-form
sum — so agreement validates the formula itself.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _events():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "user_id", "event_type", "value"]
    )
    return list(
        zip(
            (x.value for x in t["ts"]),
            t["user_id"].to_pylist(),
            t["event_type"].to_pylist(),
            t["value"].to_pylist(),
        )
    )


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_tost_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        TOST_MARGIN_FRAC,
        q_tost_equivalence,
    )

    got = _row(q_tost_equivalence(spark, SF))
    wd, we = [], []
    for ts, _, et, v in _events():
        if et == "purchase":
            (we if (ts // US_PER_DAY) % 7 in (2, 3) else wd).append(v)
    n1, n2 = len(wd), len(we)
    m1, m2 = sum(wd) / n1, sum(we) / n2
    v1 = sum((x - m1) ** 2 for x in wd) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in we) / (n2 - 1)
    delta = (sum(wd) + sum(we)) / (n1 + n2) * TOST_MARGIN_FRAC
    d = m2 - m1
    se = math.sqrt(v1 / n1 + v2 / n2)
    assert got["n_weekday"] == n1 and got["n_weekend"] == n2
    assert abs(got["mean_diff"] - d) < 1e-6
    assert abs(got["margin"] - delta) < 1e-6
    assert abs(got["t_lower"] - (d + delta) / se) < 1e-5
    assert abs(got["t_upper"] - (delta - d) / se) < 1e-5
    assert got["t_min"] == min(got["t_lower"], got["t_upper"])


def test_bayesian_ab_matches_numerical_integration(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        q_bayesian_ab_exact,
    )

    got = _row(q_bayesian_ab_exact(spark, SF))
    users = defaultdict(lambda: False)
    seen = set()
    for _, uid, et, _ in _events():
        seen.add(uid)
        if et == "purchase":
            users[uid] = True
    sa = fa = sb = fb = 0
    for uid in seen:
        arm_a = hashlib.md5(f"exp7:{uid}".encode()).hexdigest()[0] < "8"
        conv = users[uid]
        if arm_a and conv:
            sa += 1
        elif arm_a:
            fa += 1
        elif conv:
            sb += 1
        else:
            fb += 1
    aa, ba, ab, bb = sa + 1, fa + 1, sb + 1, fb + 1
    assert (got["conv_a"], got["n_a"]) == (sa, sa + fa)
    assert (got["conv_b"], got["n_b"]) == (sb, sb + fb)
    assert got["post_mean_a"] == round(aa / (aa + ba), 6)
    assert got["post_mean_b"] == round(ab / (ab + bb), 6)

    # numerically integrate P(p_B > p_A) = ∫ f_B(x) F_A(x) dx ... via
    # Simpson on [0,1] with the regularized incomplete beta from the
    # continued-fraction-free series (fine grid; both posteriors are
    # smooth and concentrated)
    def log_beta(x, y):
        return (
            math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)
        )

    lb_a = log_beta(aa, ba)
    lb_b = log_beta(ab, bb)

    def pdf_a(x):
        if x <= 0 or x >= 1:
            return 0.0
        return math.exp(
            (aa - 1) * math.log(x) + (ba - 1) * math.log(1 - x) - lb_a
        )

    def pdf_b(x):
        if x <= 0 or x >= 1:
            return 0.0
        return math.exp(
            (ab - 1) * math.log(x) + (bb - 1) * math.log(1 - x) - lb_b
        )

    n_grid = 20000
    h = 1.0 / n_grid
    # cdf of A on the grid by trapezoid, then ∫ f_B * F_A
    cdf_a = [0.0] * (n_grid + 1)
    for i in range(1, n_grid + 1):
        cdf_a[i] = cdf_a[i - 1] + h * (
            pdf_a((i - 1) * h) + pdf_a(i * h)
        ) / 2
    p = 0.0
    for i in range(1, n_grid + 1):
        p += h * (
            pdf_b((i - 1) * h) * cdf_a[i - 1] + pdf_b(i * h) * cdf_a[i]
        ) / 2
    assert abs(got["p_b_beats_a"] - p) < 2e-4


def test_beta_binomial_fit_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        q_beta_binomial_fit,
    )

    got = _row(q_beta_binomial_fit(spark, SF))
    per_user = defaultdict(lambda: [0, 0])
    for _, uid, et, _ in _events():
        per_user[uid][0] += 1
        if et == "purchase":
            per_user[uid][1] += 1
    rates = [
        (k / n, n) for n, k in per_user.values() if n >= 5
    ]
    nu = len(rates)
    p_bar = sum(r for r, _ in rates) / nu
    s2 = sum((r - p_bar) ** 2 for r, _ in rates) / (nu - 1)
    n_bar = sum(n for _, n in rates) / nu
    q = p_bar * (1 - p_bar) / s2
    m_shape = max((q - 1) / (n_bar - q) * (n_bar - 1), 0.1)
    assert got["n_users"] == nu
    assert abs(got["mean_rate"] - p_bar) < 1e-6
    assert abs(got["alpha_mom"] - m_shape * p_bar) < 1e-5
    assert abs(got["beta_mom"] - m_shape * (1 - p_bar)) < 1e-5
    assert abs(got["icc_rho"] - 1 / (m_shape + 1)) < 1e-6
