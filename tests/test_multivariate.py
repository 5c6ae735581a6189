"""Pure-Python third opinions for the multivariate trio. The CCA
replay solves the generalized eigenproblem NUMERICALLY (power
iteration on the 2x2 M matrix) instead of the closed form; the
Mahalanobis replay checks the population calibration E[D2] = p
exactly; Hotelling is replayed from per-group loops.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _pivot4():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    agg = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])  # x1 x2 y1 y2
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        day = ts // US_PER_DAY
        if et == "click":
            agg[day][0] += 1
        elif et == "view":
            agg[day][1] += 1
        elif et == "purchase":
            agg[day][2] += int(round(v * 100))
        elif et == "error":
            agg[day][3] += 1
    return {d: tuple(v) for d, v in agg.items()}


def _corr(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    return num / den


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_canonical_correlation_matches_power_iteration(spark):
    from mi_inbound_pulsar_spark.operators.mregression import (
        q_canonical_correlation,
    )

    got = _row(q_canonical_correlation(spark, SF))
    rows = list(_pivot4().values())
    cols = list(zip(*rows))
    rxx = _corr(cols[0], cols[1])
    ryy = _corr(cols[2], cols[3])
    a = [
        [_corr(cols[0], cols[2]), _corr(cols[0], cols[3])],
        [_corr(cols[1], cols[2]), _corr(cols[1], cols[3])],
    ]

    def inv2(r):
        d = 1 - r * r
        return [[1 / d, -r / d], [-r / d, 1 / d]]

    def matmul(p, q):
        return [
            [sum(p[i][k] * q[k][j] for k in range(2)) for j in range(2)]
            for i in range(2)
        ]

    at = [[a[j][i] for j in range(2)] for i in range(2)]
    m = matmul(matmul(matmul(inv2(rxx), a), inv2(ryy)), at)
    # power iteration for the dominant eigenvalue, then deflate by
    # trace for the second — a different algorithm than the closed form
    v = [1.0, 0.7]
    lam1 = 0.0
    for _ in range(200):
        w = [m[0][0] * v[0] + m[0][1] * v[1], m[1][0] * v[0] + m[1][1] * v[1]]
        norm = math.hypot(*w)
        v = [w[0] / norm, w[1] / norm]
        lam1 = norm
    lam2 = (m[0][0] + m[1][1]) - lam1
    n = len(rows)
    assert got["n_days"] == n
    assert abs(got["canonical_corr_1"] - math.sqrt(max(lam1, 0))) < 1e-5
    assert abs(got["canonical_corr_2"] - math.sqrt(max(lam2, 0))) < 1e-5
    assert (
        abs(
            got["bartlett_chi2"]
            - (-(n - 1 - 2.5) * math.log((1 - lam1) * (1 - lam2)))
        )
        < 1e-3
    )
    # canonical correlations dominate every single cross-correlation
    assert got["canonical_corr_1"] >= max(abs(x) for r in a for x in r) - 1e-6


def test_mahalanobis_matches_python_and_calibrates(spark):
    from mi_inbound_pulsar_spark.operators.mregression import (
        MAHAL_CHI2_95_DF2,
        q_mahalanobis_outliers,
    )

    got = _row(q_mahalanobis_outliers(spark, SF))
    rows = list(_pivot4().values())
    xs = [r[0] for r in rows]
    ys = [r[2] for r in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    s11 = sum((x - mx) ** 2 for x in xs) / n
    s22 = sum((y - my) ** 2 for y in ys) / n
    s12 = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    det = s11 * s22 - s12 * s12
    d2s = [
        ((x - mx) ** 2 * s22 - 2 * (x - mx) * (y - my) * s12 + (y - my) ** 2 * s11)
        / det
        for x, y in zip(xs, ys)
    ]
    assert got["n_days"] == n
    assert got["n_outliers"] == sum(1 for d in d2s if d > MAHAL_CHI2_95_DF2)
    assert abs(got["max_d2"] - max(d2s)) < 1e-6
    assert abs(got["mean_d2"] - sum(d2s) / n) < 1e-6
    # population-moment calibration: mean D2 = p = 2 EXACTLY
    assert abs(sum(d2s) / n - 2) < 1e-9


def test_hotelling_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.mregression import q_hotelling_t2

    got = _row(q_hotelling_t2(spark, SF))
    groups = {True: [], False: []}
    for day, r in _pivot4().items():
        groups[day % 7 in (2, 3)].append((r[0], r[2]))

    def stats(pts):
        k = len(pts)
        m1 = sum(x for x, _ in pts) / k
        m2 = sum(y for _, y in pts) / k
        ss11 = sum((x - m1) ** 2 for x, _ in pts)
        ss22 = sum((y - m2) ** 2 for _, y in pts)
        ss12 = sum((x - m1) * (y - m2) for x, y in pts)
        return k, m1, m2, ss11, ss22, ss12

    n1, a1, a2, w11, w22, w12 = stats(groups[False])
    n2, b1, b2, v11, v22, v12 = stats(groups[True])
    nn = n1 + n2
    s11, s22, s12 = (
        (w11 + v11) / (nn - 2),
        (w22 + v22) / (nn - 2),
        (w12 + v12) / (nn - 2),
    )
    d1, d2 = b1 - a1, b2 - a2
    det = s11 * s22 - s12 * s12
    t2 = n1 * n2 / nn * (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11) / det
    assert got["n_weekday"] == n1 and got["n_weekend"] == n2
    assert abs(got["t2"] - t2) < 1e-5
    assert abs(got["f_stat"] - t2 * (nn - 3) / (2 * (nn - 2))) < 1e-5
