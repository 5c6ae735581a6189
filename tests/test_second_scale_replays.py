"""Second-scale third opinions: re-run the cheap pure-Python replays
at sf0.01 (10× the rows of the sf0.001 tier the per-batch tests use).
Motivation: the Count-Sketch tie-break bug was INVISIBLE below sf0.1
because no tie landed on the top-k boundary at smaller scales —
replaying the tie-sensitive rank statistics at a second scale widens
the set of tie configurations the pytest tier exercises. Only
O(n log n) replays qualify here (bisect-based ranks; no pair
enumeration).
"""

from __future__ import annotations

import bisect
import math

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _samples():
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice", "o_orderstatus"]
    )
    x, y = [], []
    for p, s in zip(t["o_totalprice"].to_pylist(), t["o_orderstatus"].to_pylist()):
        if s == "F":
            x.append(int(round(p * 100)))
        elif s == "O":
            y.append(int(round(p * 100)))
    return x, y


def test_cramer_von_mises_sf001(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import q_cramer_von_mises

    got = _row(q_cramer_von_mises(spark, SF))
    x, y = _samples()
    n, m = len(x), len(y)
    nn = n + m
    xs, ys = sorted(x), sorted(y)
    gap2 = sum(
        (
            bisect.bisect_right(xs, z) / n
            - bisect.bisect_right(ys, z) / m
        )
        ** 2
        for z in xs + ys
    )
    t_stat = n * m / nn**2 * gap2
    assert got["n_f"] == n and got["n_o"] == m
    assert got["t_stat"] == round(t_stat, 6)


def test_brunner_munzel_sf001(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import q_brunner_munzel

    got = _row(q_brunner_munzel(spark, SF))
    x, y = _samples()
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    su = sorted(x + y)
    sx, sy = sorted(x), sorted(y)

    def mid(sorted_vals, v):
        return (
            bisect.bisect_left(sorted_vals, v)
            + bisect.bisect_right(sorted_vals, v)
            + 1
        ) / 2

    r1 = [mid(su, v) for v in x]
    r2 = [mid(su, v) for v in y]
    r1w = [mid(sx, v) for v in x]
    r2w = [mid(sy, v) for v in y]
    m1, m2 = sum(r1) / n1, sum(r2) / n2
    v1 = sum(
        (a - b - m1 + (n1 + 1) / 2) ** 2 for a, b in zip(r1, r1w)
    ) / (n1 - 1)
    v2 = sum(
        (a - b - m2 + (n2 + 1) / 2) ** 2 for a, b in zip(r2, r2w)
    ) / (n2 - 1)
    w = n1 * n2 * (m2 - m1) / (nn * math.sqrt(n1 * v1 + n2 * v2))
    assert got["p_hat"] == round((m2 - (n2 + 1) / 2) / n1, 6)
    assert abs(got["w_stat"] - w) < 1e-6


def test_ansari_bradley_sf001(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import q_ansari_bradley

    got = _row(q_ansari_bradley(spark, SF))
    x, y = _samples()
    pooled = sorted(x + y)
    nn = len(pooled)
    # tie-block-averaged AB scores via one pass
    score_of = {}
    i = 0
    while i < nn:
        j = i
        while j < nn and pooled[j] == pooled[i]:
            j += 1
        score_of[pooled[i]] = sum(
            min(p + 1, nn - p) for p in range(i, j)
        ) / (j - i)
        i = j
    ab = sum(score_of[v] for v in x)
    assert got["ab_stat"] == round(ab, 6)


def test_wilcoxon_signed_rank_sf001(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import (
        q_wilcoxon_signed_rank,
    )
    from collections import defaultdict

    got = _row(q_wilcoxon_signed_rank(spark, SF))
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_extendedprice"],
    )
    status = dict(
        zip(o["o_orderkey"].to_pylist(), o["o_orderstatus"].to_pylist())
    )
    acc = defaultdict(lambda: [[], []])
    for ok, pk, ep in zip(
        li["l_orderkey"].to_pylist(),
        li["l_partkey"].to_pylist(),
        li["l_extendedprice"].to_pylist(),
    ):
        s = status.get(ok)
        if s == "F":
            acc[pk][0].append(ep)
        elif s == "O":
            acc[pk][1].append(ep)
    diffs = []
    for fs, os_ in acc.values():
        if fs and os_:
            d = int(round(sum(fs) / len(fs) * 100)) - int(
                round(sum(os_) / len(os_) * 100)
            )
            if d != 0:
                diffs.append(d)
    n = len(diffs)
    ads = sorted(abs(d) for d in diffs)

    def mid(a):
        return (
            bisect.bisect_left(ads, a) + bisect.bisect_right(ads, a) + 1
        ) / 2

    w_plus = sum(mid(abs(d)) for d in diffs if d > 0)
    assert got["n_pairs"] == n
    assert got["w_plus"] == round(w_plus, 6)


US_PER_DAY = 86_400_000_000


def _percentile(sorted_vals, p):
    """Spark `percentile` / DuckDB `quantile_cont`: linear
    interpolation at index p*(n-1) of the sorted sample."""
    n = len(sorted_vals)
    idx = p * (n - 1)
    lo = int(math.floor(idx))
    hi = min(lo + 1, n - 1)
    frac = idx - lo
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def _purchase_values():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    return [
        v
        for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist())
        if et == "purchase"
    ]


def _daily_cents():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    days = {}
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if et == "purchase":
            days[ts // US_PER_DAY] = days.get(ts // US_PER_DAY, 0) + int(
                round(v * 100)
            )
    return days


def test_gpd_peaks_over_threshold_sf001(spark):
    """The POT threshold u = P90(values) is an sf-dependent cut: which
    values satisfy `value > u` — and whether one lands EXACTLY on u —
    changes with scale (the Count-Sketch lesson class). Replay the
    whole fit at sf0.01."""
    from mi_inbound_pulsar_spark.operators.tsstats import (
        q_gpd_peaks_over_threshold,
    )

    got = _row(q_gpd_peaks_over_threshold(spark, SF))
    vals = sorted(_purchase_values())
    u = _percentile(vals, 0.90)
    exc = [v - u for v in vals if v > u]
    n = len(exc)
    mean_y = sum(exc) / n
    var_y = sum((y - mean_y) ** 2 for y in exc) / (n - 1)
    ratio = mean_y * mean_y / var_y
    assert got["n_exc"] == n
    assert abs(got["threshold"] - u) < 1e-6
    assert abs(got["mean_excess"] - mean_y) < 1e-6
    assert abs(got["xi_shape"] - 0.5 * (1 - ratio)) < 1e-6
    assert abs(got["beta_scale"] - 0.5 * mean_y * (ratio + 1)) < 1e-6


def test_expected_shortfall_sf001(spark):
    """The VaR cut `y <= var_q` is tie-sensitive when a day's revenue
    equals the interpolated quantile exactly — replay the tail mean at
    the second scale."""
    from mi_inbound_pulsar_spark.operators.tsstats import q_expected_shortfall

    got = _row(q_expected_shortfall(spark, SF))
    ys = sorted(c / 100 for c in _daily_cents().values())
    var_q = _percentile(ys, 0.10)
    tail = [y for y in ys if y <= var_q]
    es = sum(tail) / len(tail)
    assert got["n_days"] == len(ys)
    assert got["n_tail"] == len(tail)
    assert abs(got["var_10pct"] - var_q) < 1e-6
    assert abs(got["expected_shortfall"] - es) < 1e-6
    assert abs(got["tail_gap"] - (var_q - es)) < 1e-6


def test_max_drawdown_sf001(spark):
    """The trough day is the argmin-day of the 6dp-ROUNDED drawdown —
    a rank-cut tie class: two days can round to the same drawdown and
    the engine must pick the earliest. Replays the DEMEANED cumulative
    path (the raw cumulative revenue curve is monotone on all-positive
    days and its drawdown degenerates to zero — the round-10 fix), and
    asserts the statistic is non-degenerate on this data."""
    from mi_inbound_pulsar_spark.operators.tsstats import q_max_drawdown

    got = _row(q_max_drawdown(spark, SF))
    days = _daily_cents()
    ys = {d: c / 100 for d, c in days.items()}
    mu = sum(ys.values()) / len(ys)
    equity, peak, mdd = 0.0, 0.0, float("-inf")
    trough_day = None
    max_peak, eq_range = 0.0, 0.0
    for day in sorted(ys):
        equity += ys[day] - mu
        peak = max(peak, equity, 0.0)
        dd = round(peak - equity, 6)
        if dd > mdd:
            mdd, trough_day = dd, day
        max_peak = max(max_peak, peak)
        eq_range = max(eq_range, abs(equity))
    assert got["n_days"] == len(days)
    assert abs(got["peak_excess"] - max_peak) < 1e-6
    assert abs(got["max_drawdown"] - mdd) < 1e-6
    assert got["trough_day"] == trough_day
    assert abs(got["mdd_vs_range"] - mdd / eq_range) < 1e-6
    assert mdd > 0  # the statistic actually exercises its path logic


def _paired_diffs_py():
    """Per-part cents difference of avg extended price between 'F' and
    'O' baskets — the q_sign_test / q_wilcoxon paired design."""
    lt = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_extendedprice"]
    )
    ot = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    status = {
        k: s
        for k, s in zip(ot["o_orderkey"].to_pylist(), ot["o_orderstatus"].to_pylist())
        if s in ("F", "O")
    }
    sums = {}
    for ok, pk, px in zip(
        lt["l_orderkey"].to_pylist(),
        lt["l_partkey"].to_pylist(),
        lt["l_extendedprice"].to_pylist(),
    ):
        s = status.get(ok)
        if s is None:
            continue
        f, fn, o, on = sums.get(pk, (0.0, 0, 0.0, 0))
        if s == "F":
            f += px; fn += 1
        else:
            o += px; on += 1
        sums[pk] = (f, fn, o, on)
    out = []
    for pk, (f, fn, o, on) in sums.items():
        if fn and on:
            out.append(int(round(f / fn * 100)) - int(round(o / on * 100)))
    return out


def test_sign_test_sf001(spark):
    """d = 0 exact-zero drops are the tie class here: integer cents
    make zero differences REAL, and how many land at exactly zero is
    sf-dependent. Replay counts and both z forms at the second scale."""
    from mi_inbound_pulsar_spark.operators.ranktests import q_sign_test

    got = _row(q_sign_test(spark, SF))
    ds = _paired_diffs_py()
    n_pos = sum(1 for d in ds if d > 0)
    n_neg = sum(1 for d in ds if d < 0)
    n_zero = sum(1 for d in ds if d == 0)
    n = n_pos + n_neg
    assert got["n_pos"] == n_pos
    assert got["n_neg"] == n_neg
    assert got["n_zero"] == n_zero
    assert abs(got["z"] - (n_pos - n / 2) / math.sqrt(n / 4)) < 1e-6
    assert abs(
        got["z_continuity"] - (abs(n_pos - n / 2) - 0.5) / math.sqrt(n / 4)
    ) < 1e-6


def test_wilcoxon_tie_term_nonzero_sf001():
    """The Wilcoxon tie-correction term ΣT(t²−1)... is only exercised
    when |d| values actually tie — assert the sf0.01 paired domain has
    real |d| ties so the replay above (and the engine's tie term) is
    not vacuously passing on a tie-free sample."""
    from collections import Counter

    ds = [abs(d) for d in _paired_diffs_py() if d != 0]
    ties = Counter(ds)
    assert any(c > 1 for c in ties.values()), "no |d| ties at sf0.01"
