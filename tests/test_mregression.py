"""Pure-Python third opinions for the multiple-regression operators.
The OLS replay solves the 3×3 normal equations by GAUSSIAN ELIMINATION
on the uncentered moment matrix (production uses Cramer's rule on the
centered 2×2), and the Chow replay computes SSRs from per-observation
residuals (production uses the Syy − Sxy²/Sxx closed form).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _pivot():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    y = defaultdict(int)
    x1 = defaultdict(int)
    x2 = defaultdict(int)
    days = set()
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        day = ts // US_PER_DAY
        days.add(day)
        if et == "purchase":
            y[day] += int(round(v * 100))
        elif et == "click":
            x1[day] += 1
        elif et == "view":
            x2[day] += 1
    return [(float(y[d]), float(x1[d]), float(x2[d])) for d in sorted(days)]


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _solve3(a, b):
    """Gaussian elimination with partial pivoting, 3x3."""
    m = [row[:] + [bi] for row, bi in zip(a, b)]
    for col in range(3):
        piv = max(range(col, 3), key=lambda r: abs(m[r][col]))
        m[col], m[piv] = m[piv], m[col]
        for r in range(3):
            if r != col:
                f = m[r][col] / m[col][col]
                m[r] = [x - f * y for x, y in zip(m[r], m[col])]
    return [m[i][3] / m[i][i] for i in range(3)]


def test_ols_two_factor_matches_gaussian_elimination(spark):
    from mi_inbound_pulsar_spark.operators.mregression import q_ols_two_factor

    got = _row(q_ols_two_factor(spark, SF))
    rows = _pivot()
    n = len(rows)
    # uncentered normal equations X'X beta = X'y with X = [1, x1, x2]
    s = lambda f: sum(f(*r) for r in rows)  # noqa: E731
    xtx = [
        [n, s(lambda y, a, b: a), s(lambda y, a, b: b)],
        [
            s(lambda y, a, b: a),
            s(lambda y, a, b: a * a),
            s(lambda y, a, b: a * b),
        ],
        [
            s(lambda y, a, b: b),
            s(lambda y, a, b: a * b),
            s(lambda y, a, b: b * b),
        ],
    ]
    xty = [
        s(lambda y, a, b: y),
        s(lambda y, a, b: a * y),
        s(lambda y, a, b: b * y),
    ]
    b0, b1, b2 = _solve3(xtx, xty)
    my = xty[0] / n
    sse = sum((y - b0 - b1 * a - b2 * b) ** 2 for y, a, b in rows)
    syy = sum((y - my) ** 2 for y, _, _ in rows)
    r2 = 1 - sse / syy
    assert got["n_days"] == n
    assert abs(got["intercept_dollars"] - b0 / 100) < 1e-4
    assert abs(got["beta_clicks"] - b1 / 100) < 1e-6
    assert abs(got["beta_views"] - b2 / 100) < 1e-6
    assert abs(got["r2"] - r2) < 1e-6
    assert abs(got["adj_r2"] - (1 - (1 - r2) * (n - 1) / (n - 3))) < 1e-6
    assert abs(got["f_stat"] - r2 / 2 / ((1 - r2) / (n - 3))) < 1e-3


def test_partial_correlation_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.mregression import (
        q_partial_correlation,
    )

    got = _row(q_partial_correlation(spark, SF))
    rows = _pivot()
    n = len(rows)

    def corr(i, j):
        xi = [r[i] for r in rows]
        xj = [r[j] for r in rows]
        mi, mj = sum(xi) / n, sum(xj) / n
        num = sum((a - mi) * (b - mj) for a, b in zip(xi, xj))
        den = math.sqrt(
            sum((a - mi) ** 2 for a in xi) * sum((b - mj) ** 2 for b in xj)
        )
        return num / den

    r_y1, r_y2, r_12 = corr(0, 1), corr(0, 2), corr(1, 2)
    pc = (r_y1 - r_y2 * r_12) / math.sqrt(
        (1 - r_y2**2) * (1 - r_12**2)
    )
    assert got["n_days"] == n
    assert abs(got["corr_spend_clicks"] - r_y1) < 1e-6
    assert abs(got["partial_corr"] - pc) < 1e-6
    assert (
        abs(got["t_stat"] - pc * math.sqrt((n - 3) / (1 - pc * pc))) < 1e-5
    )


def test_chow_test_matches_residual_pass(spark):
    from mi_inbound_pulsar_spark.operators.mregression import q_chow_test

    got = _row(q_chow_test(spark, SF))
    ys = [y for y, _, _ in _pivot()]
    n = len(ys)

    def ssr(pairs):
        k = len(pairs)
        mx = sum(x for x, _ in pairs) / k
        my = sum(y for _, y in pairs) / k
        sxx = sum((x - mx) ** 2 for x, _ in pairs)
        sxy = sum((x - mx) * (y - my) for x, y in pairs)
        b = sxy / sxx
        a = my - b * mx
        return sum((y - a - b * x) ** 2 for x, y in pairs)

    pairs = [(float(i + 1), y) for i, y in enumerate(ys)]
    half = n // 2
    ssr_pooled = ssr(pairs)
    ssr_split = ssr(pairs[:half]) + ssr(pairs[half:])
    f = (ssr_pooled - ssr_split) / 2 / (ssr_split / (n - 4))
    assert got["n_days"] == n
    assert abs(got["ssr_pooled_e10"] - ssr_pooled / 1e10) < 1e-5
    assert abs(got["ssr_split_e10"] - ssr_split / 1e10) < 1e-5
    assert abs(got["chow_f"] - f) < 1e-4
