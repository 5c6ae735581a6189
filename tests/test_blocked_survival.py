"""Pure-Python third opinions for the blocked rank tests and the
Aalen-Johansen CIF. The CIF replay walks users and times with explicit
loops and running products (production uses exp-of-log-cumsum windows)
and asserts the additivity contract CIF_p + CIF_e = 1 − S.
"""

from __future__ import annotations

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


def _day_type_ranks():
    daily = defaultdict(int)
    for ts, _, et, v in _events():
        daily[(ts // US_PER_DAY, et)] += int(round(v * 100))
    by_day = defaultdict(dict)
    for (day, et), cents in daily.items():
        by_day[day][et] = cents
    blocks = {d: m for d, m in by_day.items() if len(m) == 5}
    ranks = {}
    for d, m in blocks.items():
        vals = sorted(m.values())
        for et, c in m.items():
            lo = sum(1 for v in vals if v < c)
            tied = sum(1 for v in vals if v == c)
            ranks[(d, et)] = lo + (tied + 1) / 2
    return blocks, ranks


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_friedman_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.posthoc import q_friedman_test

    got = _row(q_friedman_test(spark, SF))
    blocks, ranks = _day_type_ranks()
    n = len(blocks)
    k = 5
    r_j = defaultdict(float)
    for (d, et), r in ranks.items():
        r_j[et] += r
    q = 12 / (n * k * (k + 1)) * sum(v * v for v in r_j.values()) - 3 * n * (
        k + 1
    )
    tsum = 0.0
    for d, m in blocks.items():
        cnt = defaultdict(int)
        for c in m.values():
            cnt[c] += 1
        tsum += sum(t**3 - t for t in cnt.values() if t > 1)
    corr = 1 - tsum / (n * k * (k * k - 1))
    assert got["n_blocks"] == n and got["n_treatments"] == k
    assert abs(got["friedman_q"] - q / corr) < 1e-6


def test_page_trend_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.posthoc import q_page_trend_test

    got = _row(q_page_trend_test(spark, SF))
    blocks, ranks = _day_type_ranks()
    n = len(blocks)
    k = 5
    r_j = defaultdict(float)
    for (d, et), r in ranks.items():
        r_j[et] += r
    l = sum((j + 1) * r_j[et] for j, et in enumerate(sorted(r_j)))
    mean = n * k * (k + 1) ** 2 / 4
    var = n * k * k * (k + 1) * (k * k - 1) / 144
    assert got["n_blocks"] == n
    assert got["page_l"] == round(l, 6)
    assert got["l_mean"] == round(mean, 6)
    assert abs(got["z"] - (l - mean) / math.sqrt(var)) < 1e-6


def test_cumulative_incidence_matches_loop_and_adds_up(spark):
    from mi_inbound_pulsar_spark.operators.funnel import (
        q_cumulative_incidence,
    )

    rows = [r.asDict() for r in q_cumulative_incidence(spark, SF).collect()]
    users = defaultdict(list)
    for ts, uid, et, _ in _events():
        users[uid].append((ts, et))
    obs = []
    for uid, evs in users.items():
        t0 = min(ts for ts, _ in evs)
        tp = min((ts for ts, et in evs if et == "purchase"), default=None)
        te = min((ts for ts, et in evs if et == "error"), default=None)
        tl = max(ts for ts, _ in evs)
        if tp is not None and (te is None or tp <= te):
            obs.append(((tp - t0) // US_PER_DAY, "p"))
        elif te is not None:
            obs.append(((te - t0) // US_PER_DAY, "e"))
        else:
            obs.append(((tl - t0) // US_PER_DAY, "c"))
    times = sorted({t for t, _ in obs})
    n_total = len(obs)
    s = 1.0
    cif_p = cif_e = 0.0
    left_before = 0
    expect = []
    for t in times:
        d_p = sum(1 for tt, c in obs if tt == t and c == "p")
        d_e = sum(1 for tt, c in obs if tt == t and c == "e")
        leave = sum(1 for tt, _ in obs if tt == t)
        n_risk = n_total - left_before
        cif_p += s * d_p / n_risk
        cif_e += s * d_e / n_risk
        s *= max((n_risk - d_p - d_e) / n_risk, 0.0)
        left_before += leave
        expect.append((t, n_risk, d_p, d_e, cif_p, cif_e, s))
    assert len(rows) == len(expect)
    for row, (t, n_risk, d_p, d_e, cp, ce, s_after) in zip(rows, expect):
        assert row["day"] == t and row["n_risk"] == n_risk
        assert row["d_purchase"] == d_p and row["d_error"] == d_e
        assert abs(row["cif_purchase"] - cp) < 1e-6
        assert abs(row["cif_error"] - ce) < 1e-6
        # Aalen-Johansen additivity: CIFs partition the failure mass
        assert cp + ce <= 1 - s_after + 1e-9
