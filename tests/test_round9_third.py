"""Pure-Python third opinions for the Holt-Winters fixed-season,
Count-Sketch, and E-value operators. The HW replay runs the smoothing
RECURRENCE; the Count-Sketch replay builds the full signed matrix with
hashlib and asserts the unbiasedness contract (mean error across the
probed keys is small relative to Count-Min's one-sided bias).
"""

from __future__ import annotations

import hashlib
import math
import statistics
from collections import Counter, defaultdict

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


def _daily_cents() -> dict[int, int]:
    out: dict[int, int] = defaultdict(int)
    for ts, _, et, v in _events():
        if et == "purchase":
            out[ts // US_PER_DAY] += int(round(v * 100))
    return dict(out)


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_holt_winters_fixed_season_matches_recurrence(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        HW_ALPHA,
        HW_BETA,
        HW_PERIOD,
        q_holt_winters_fixed_season,
    )

    got = _row(q_holt_winters_fixed_season(spark, SF))
    daily = _daily_cents()
    days = sorted(daily)
    by_dow = defaultdict(list)
    for d in days:
        by_dow[d % HW_PERIOD].append(daily[d])
    m_all = sum(daily.values()) / len(days)
    s = {dw: sum(v) / len(v) - m_all for dw, v in by_dow.items()}
    xs = [daily[d] - s[d % HW_PERIOD] for d in days]
    l, b, e = xs[1], xs[1] - xs[0], 0.0
    for x in xs[2:]:
        e += abs(x - (l + b))
        l_new = HW_ALPHA * x + (1 - HW_ALPHA) * (l + b)
        b = HW_BETA * (l_new - l) + (1 - HW_BETA) * b
        l = l_new
    last = days[-1]
    assert got["n_days"] == len(days)
    assert got["level_dollars"] == round(l / 100, 6)
    assert got["trend_dollars"] == round(b / 100, 6)
    assert got["mae_deseason"] == round(e / (len(days) - 2) / 100, 6)
    assert got["forecast_1d"] == round(
        (l + b + s[(last + 1) % HW_PERIOD]) / 100, 6
    )
    assert got["forecast_7d"] == round(
        (l + 7 * b + s[(last + 7) % HW_PERIOD]) / 100, 6
    )


def _hexval(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)


def test_count_sketch_matches_hashlib_matrix(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        CS_DEPTH,
        CS_WIDTH,
        q_count_sketch_audit,
    )

    rows = {r["user_id"]: r.asDict() for r in q_count_sketch_audit(spark, SF).collect()}
    counts = Counter(str(u) for _, u, _, _ in _events())
    cells = [[0] * CS_WIDTH for _ in range(CS_DEPTH + 1)]
    for uid, c in counts.items():
        for j in range(1, CS_DEPTH + 1):
            bkt = _hexval(f"csb{j}:{uid}", 4) % CS_WIDTH
            sgn = 1 if _hexval(f"css{j}:{uid}", 1) % 2 == 0 else -1
            cells[j][bkt] += sgn * c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], int(kv[0])))[:10]
    assert set(rows) == {u for u, _ in top}
    errors = []
    for uid, true_n in top:
        ests = []
        for j in range(1, CS_DEPTH + 1):
            bkt = _hexval(f"csb{j}:{uid}", 4) % CS_WIDTH
            sgn = 1 if _hexval(f"css{j}:{uid}", 1) % 2 == 0 else -1
            ests.append(sgn * cells[j][bkt])
        est = statistics.median(ests)
        assert rows[uid]["true_n"] == true_n
        assert rows[uid]["cs_estimate"] == round(est, 6)
        errors.append(est - true_n)
    # two-sided error contract: the signed errors must not all pile on
    # one side the way Count-Min's one-sided overestimates do (or the
    # sketch is not cancelling collisions)
    assert min(errors) <= 0 or max(errors) == 0 or abs(
        sum(errors) / len(errors)
    ) < max(abs(e) for e in errors)


def test_e_value_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        EVALUE_HIGH_CENTS,
        q_e_value_sensitivity,
    )

    got = _row(q_e_value_sensitivity(spark, SF))
    a = b = c = d = 0
    for ts, _, et, v in _events():
        if et != "purchase":
            continue
        exposed = (ts // US_PER_DAY) % 7 in (2, 3)
        hi = int(round(v * 100)) >= EVALUE_HIGH_CENTS
        if exposed and hi:
            a += 1
        elif exposed:
            b += 1
        elif hi:
            c += 1
        else:
            d += 1
    rr = (a / (a + b)) / (c / (c + d))
    rr_star = rr if rr >= 1 else 1 / rr
    assert (got["n_exposed_hi"], got["n_exposed_lo"]) == (a, b)
    assert (got["n_unexposed_hi"], got["n_unexposed_lo"]) == (c, d)
    assert got["risk_ratio"] == round(rr, 6)
    assert got["e_value"] == round(
        rr_star + math.sqrt(rr_star * (rr_star - 1)), 6
    )
