"""Pure-Python third opinions for the EVT tail pair and
Benjamini-Yekutieli, including the BY-conservativity invariant
(everything BY rejects, BH must also reject) and the ES coherence
check (ES <= VaR for a lower tail).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _purchase_values():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    return [
        v
        for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist())
        if et == "purchase"
    ]


def _quantile_cont(xs, q):
    s = sorted(xs)
    h = (len(s) - 1) * q
    lo = math.floor(h)
    return s[lo] + (h - lo) * (s[min(lo + 1, len(s) - 1)] - s[lo])


def test_gpd_pot_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        POT_QUANTILE,
        q_gpd_peaks_over_threshold,
    )

    got = _row(q_gpd_peaks_over_threshold(spark, SF))
    vals = _purchase_values()
    u = _quantile_cont(vals, POT_QUANTILE)
    exc = [v - u for v in vals if v > u]
    n = len(exc)
    m = sum(exc) / n
    s2 = sum((y - m) ** 2 for y in exc) / (n - 1)
    xi = 0.5 * (1 - m * m / s2)
    beta = 0.5 * m * (m * m / s2 + 1)
    assert got["n_exc"] == n
    assert abs(got["threshold"] - u) < 1e-6
    assert abs(got["mean_excess"] - m) < 1e-6
    assert abs(got["xi_shape"] - xi) < 1e-6
    assert abs(got["beta_scale"] - beta) < 1e-6


def test_expected_shortfall_matches_and_coheres(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        ES_LEVEL,
        q_expected_shortfall,
    )

    got = _row(q_expected_shortfall(spark, SF))
    t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    daily = defaultdict(int)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if et == "purchase":
            daily[ts // US_PER_DAY] += int(round(v * 100))
    ys = [c / 100 for c in daily.values()]
    var_q = _quantile_cont(ys, ES_LEVEL)
    tail = [y for y in ys if y <= var_q]
    es = sum(tail) / len(tail)
    assert got["n_days"] == len(ys) and got["n_tail"] == len(tail)
    assert abs(got["var_10pct"] - var_q) < 1e-6
    assert abs(got["expected_shortfall"] - es) < 1e-6
    # coherence: the tail mean cannot exceed the tail threshold
    assert got["expected_shortfall"] <= got["var_10pct"] + 1e-9
    assert got["tail_gap"] >= -1e-9


def test_benjamini_yekutieli_conservative_vs_bh(spark):
    from mi_inbound_pulsar_spark.operators.aggstats import (
        q_benjamini_yekutieli,
    )

    rows = [r.asDict() for r in q_benjamini_yekutieli(spark, SF).collect()]
    m = len(rows)
    c_m = sum(1 / j for j in range(1, m + 1))
    for r in rows:
        assert abs(r["c_m"] - c_m) < 1e-6
        # BY can never reject what BH declines
        if r["by_reject"]:
            assert r["bh_reject"]
    # ranks are a permutation
    assert sorted(r["rank"] for r in rows) == list(range(1, m + 1))


def test_median_polish_matches_python_and_reconstructs(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_median_polish

    rows = {
        (r["dow"], r["event_type"]): r.asDict()
        for r in q_median_polish(spark, SF).collect()
    }
    import statistics

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    cell = defaultdict(int)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        cell[((ts // US_PER_DAY) % 7, et)] += int(round(v * 100))
    y = {k: c / 100 for k, c in cell.items()}
    dows = sorted({d for d, _ in y})
    ets = sorted({e for _, e in y})
    row_eff = {d: 0.0 for d in dows}
    col_eff = {e: 0.0 for e in ets}
    resid = dict(y)
    for _ in range(2):  # two full sweeps, same as production
        for d in dows:
            m = statistics.median(resid[(d, e)] for e in ets if (d, e) in resid)
            row_eff[d] += m
            for e in ets:
                if (d, e) in resid:
                    resid[(d, e)] -= m
        for e in ets:
            m = statistics.median(resid[(d, e)] for d in dows if (d, e) in resid)
            col_eff[e] += m
            for d in dows:
                if (d, e) in resid:
                    resid[(d, e)] -= m
    for (d, e), r in rows.items():
        assert abs(r["row_effect"] - row_eff[d]) < 1e-6
        assert abs(r["col_effect"] - col_eff[e]) < 1e-6
        assert abs(r["residual"] - resid[(d, e)]) < 1e-6
        # additive reconstruction: effects + residual return the cell
        # (up to the overall constant median polish leaves in the
        # effects — here absorbed into row effects, so exact)
        assert abs((r["row_effect"] + r["col_effect"] + r["residual"]) - y[(d, e)]) < 1e-6
