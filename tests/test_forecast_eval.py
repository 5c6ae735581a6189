"""Pure-Python third opinions for Jarque-Bera and the forecast-eval
pair (Mincer-Zarnowitz, Diebold-Mariano), replayed with explicit
loops over the daily series.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _daily_series() -> list[float]:
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
    return [c / 100 for _, c in sorted(out.items())]


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_jarque_bera_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_jarque_bera

    got = _row(q_jarque_bera(spark, SF))
    xs = _daily_series()
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    s = m3 / m2**1.5
    k = m4 / m2**2 - 3
    assert got["n_days"] == n
    assert abs(got["skewness"] - s) < 1e-6
    assert abs(got["excess_kurtosis"] - k) < 1e-6
    assert abs(got["jarque_bera"] - n / 6 * (s * s + k * k / 4)) < 1e-5


def _pairs():
    xs = _daily_series()
    return [
        (xs[t], xs[t - 7], xs[t - 1]) for t in range(7, len(xs))
    ]


def test_mincer_zarnowitz_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_mincer_zarnowitz

    got = _row(q_mincer_zarnowitz(spark, SF))
    p = _pairs()
    n = len(p)
    my = sum(y for y, _, _ in p) / n
    mf = sum(f for _, f, _ in p) / n
    sff = sum((f - mf) ** 2 for _, f, _ in p)
    sfy = sum((f - mf) * (y - my) for y, f, _ in p)
    b = sfy / sff
    a = my - b * mf
    sse = sum((y - a - b * f) ** 2 for y, f, _ in p)
    ssr_r = sum((y - f) ** 2 for y, f, _ in p)
    f_joint = (ssr_r - sse) / 2 / (sse / (n - 2))
    assert got["n_days"] == n
    assert abs(got["intercept"] - a) < 1e-4
    assert abs(got["slope"] - b) < 1e-6
    assert abs(got["f_joint"] - f_joint) < 1e-4


def test_diebold_mariano_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_diebold_mariano

    got = _row(q_diebold_mariano(spark, SF))
    p = _pairs()
    n = len(p)
    ds = [(y - f7) ** 2 - (y - f1) ** 2 for y, f7, f1 in p]
    md = sum(ds) / n
    var = sum((d - md) ** 2 for d in ds) / n
    assert got["n_days"] == n
    assert abs(got["mean_loss_diff"] - md) < 1e-5
    assert abs(got["dm_stat"] - md / math.sqrt(var / n)) < 1e-6
    # internal consistency: mean loss diff equals MSE difference
    assert (
        abs(
            (got["mse_seasonal_naive"] - got["mse_naive"])
            - got["mean_loss_diff"]
        )
        < 2e-6
    )
