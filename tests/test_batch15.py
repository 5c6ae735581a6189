"""Pure-Python third opinions for Pettitt, Durbin-Watson, and Kupiec.
The Pettitt replay computes U_t by the DOUBLE-SUM definition (sgn over
all i<=t<j pairs) — production uses the rank identity — so agreement
proves the identity, not just the arithmetic.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _daily_cents() -> list[int]:
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    out: dict[int, int] = defaultdict(int)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if et == "purchase":
            out[ts // US_PER_DAY] += int(round(v * 100))
    return [c for _, c in sorted(out.items())]


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def sgn(x):
    return (x > 0) - (x < 0)


def test_pettitt_matches_double_sum(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_pettitt_test

    got = _row(q_pettitt_test(spark, SF))
    xs = _daily_cents()
    n = len(xs)
    best_k, best_t = -1.0, None
    for t in range(1, n):
        u = float(
            sum(sgn(xs[j] - xs[i]) for i in range(t) for j in range(t, n))
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    assert got["n_days"] == n
    assert got["break_at"] == best_t
    assert got["k_stat"] == round(best_k, 6)
    assert got["p_approx"] == round(
        2 * math.exp(-6 * best_k * best_k / (n**3 + n**2)), 6
    )


def test_durbin_watson_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_durbin_watson

    got = _row(q_durbin_watson(spark, SF))
    ys = [c / 100 for c in _daily_cents()]
    n = len(ys)
    ts = list(range(1, n + 1))
    mt, my = sum(ts) / n, sum(ys) / n
    b = sum((t - mt) * (y - my) for t, y in zip(ts, ys)) / sum(
        (t - mt) ** 2 for t in ts
    )
    a = my - b * mt
    e = [y - a - b * t for t, y in zip(ts, ys)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(
        x * x for x in e
    )
    assert got["n_days"] == n
    assert abs(got["dw_stat"] - dw) < 1e-6
    assert abs(got["rho1_implied"] - (1 - dw / 2)) < 1e-6


def test_kupiec_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        KUPIEC_VAR_LEVEL,
        q_kupiec_pof,
    )

    got = _row(q_kupiec_pof(spark, SF))
    ys = [c / 100 for c in _daily_cents()]
    n = len(ys)
    train = sorted(ys[: n // 2])
    # linear-interpolated quantile (percentile/quantile_cont convention)
    h = (len(train) - 1) * KUPIEC_VAR_LEVEL
    lo = math.floor(h)
    var_q = train[lo] + (h - lo) * (train[min(lo + 1, len(train) - 1)] - train[lo])
    test = ys[n // 2 :]
    x = sum(1 for y in test if y < var_q)
    nt = len(test)
    p = KUPIEC_VAR_LEVEL
    lr = -2 * (
        (nt - x) * math.log(1 - p)
        + x * math.log(p)
        - ((nt - x) * math.log(1 - x / nt) if x < nt else 0.0)
        - (x * math.log(x / nt) if x > 0 else 0.0)
    )
    assert got["n_test"] == nt and got["n_exceedances"] == x
    assert abs(got["var_threshold"] - var_q) < 1e-6
    assert got["realized_rate"] == round(x / nt, 6)
    assert abs(got["lr_pof"] - lr) < 1e-5
