"""Pure-Python third opinions for the final trio: MASE/Theil U2, max
drawdown (sequential peak walk vs the window form), and the
decomposition strengths with their [0,1] bounds and the
Var(S+R) = Var(detrended) identity.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _daily():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    out = defaultdict(int)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if et == "purchase":
            out[ts // US_PER_DAY] += int(round(v * 100))
    return dict(sorted(out.items()))


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_mase_theil_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_mase_theil_u

    got = _row(q_mase_theil_u(spark, SF))
    ys = [c / 100 for c in _daily().values()]
    p = [(ys[t], ys[t - 7], ys[t - 1]) for t in range(7, len(ys))]
    mae7 = sum(abs(y - f) for y, f, _ in p) / len(p)
    mae1 = sum(abs(y - f) for y, _, f in p) / len(p)
    mse7 = sum((y - f) ** 2 for y, f, _ in p) / len(p)
    mse1 = sum((y - f) ** 2 for y, _, f in p) / len(p)
    assert got["n_days"] == len(p)
    assert abs(got["mase_vs_naive"] - mae7 / mae1) < 1e-6
    assert abs(got["theil_u2"] - math.sqrt(mse7 / mse1)) < 1e-6


def test_max_drawdown_matches_sequential_walk(spark):
    """Sequential walk over the DEMEANED cumulative path (the raw
    cumulative revenue curve is monotone on all-positive days and its
    drawdown degenerates to zero — the round-10 fix)."""
    from mi_inbound_pulsar_spark.operators.tsstats import q_max_drawdown

    got = _row(q_max_drawdown(spark, SF))
    daily = _daily()
    mu = sum(daily.values()) / 100 / len(daily)
    equity = peak = 0.0
    mdd, trough, max_peak, eq_range = 0.0, None, 0.0, 0.0
    for day, c in daily.items():
        equity += c / 100 - mu
        peak = max(peak, equity, 0.0)
        max_peak = max(max_peak, peak)
        eq_range = max(eq_range, abs(equity))
        dd = round(peak - equity, 6)
        if dd > mdd:
            mdd, trough = dd, day
    if trough is None:  # flat curve: drawdown 0 at the first day
        trough = min(daily)
    assert got["n_days"] == len(daily)
    assert abs(got["max_drawdown"] - mdd) < 1e-6
    assert got["trough_day"] == trough
    assert abs(got["peak_excess"] - max_peak) < 1e-6
    assert abs(got["mdd_vs_range"] - mdd / eq_range) < 1e-6
    assert mdd > 0  # non-degenerate on the demeaned path


def test_decomposition_strength_matches_and_bounded(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        q_decomposition_strength,
    )

    got = _row(q_decomposition_strength(spark, SF))
    daily = _daily()
    days = sorted(daily)
    ys = [daily[d] / 100 for d in days]
    n = len(ys)
    rows = []
    for i in range(3, n - 3):
        trend = sum(ys[i - 3 : i + 4]) / 7
        rows.append((days[i], ys[i], trend, ys[i] - trend))
    sea = defaultdict(list)
    for d, y, tr, det in rows:
        sea[d % 7].append(det)
    smap = {k: sum(v) / len(v) for k, v in sea.items()}
    rem = [det - smap[d % 7] for d, _, _, det in rows]
    det_all = [det for _, _, _, det in rows]
    tr_all = [tr for _, _, tr, _ in rows]

    def var(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / len(v)

    fs = max(0.0, 1 - var(rem) / var(det_all))
    ft = max(
        0.0, 1 - var(rem) / var([t + r for t, r in zip(tr_all, rem)])
    )
    assert got["n_days"] == len(rows)
    assert abs(got["seasonal_strength"] - fs) < 1e-6
    assert abs(got["trend_strength"] - ft) < 1e-6
    assert 0 <= got["seasonal_strength"] <= 1
    assert 0 <= got["trend_strength"] <= 1
