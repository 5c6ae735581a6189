"""Pure-Python third opinions for the weighted log-rank family,
Lepage, and BWS. Lepage is cross-checked against the ALREADY-verified
component queries (consistency across independently-implemented
paths); BWS is replayed per-observation from scratch.
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


def test_weighted_logrank_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        SURVIVAL_WINDOW_DAYS,
        q_weighted_logrank,
    )

    got = {r["weighting"]: r.asDict() for r in q_weighted_logrank(spark, SF).collect()}
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "user_id", "event_type"]
    )
    evs = list(
        zip(
            (x.value for x in t["ts"]),
            t["user_id"].to_pylist(),
            t["event_type"].to_pylist(),
        )
    )
    horizon = max(ts for ts, _, _ in evs)
    signup = {}
    for ts, uid, et in evs:
        if et == "signup":
            signup[uid] = min(signup.get(uid, ts), ts)
    first_p = {}
    for ts, uid, et in evs:
        if et == "purchase" and uid in signup and ts > signup[uid]:
            first_p[uid] = min(first_p.get(uid, ts), ts)
    obs = []
    for uid, s in signup.items():
        if uid in first_p:
            obs.append((uid % 2, (first_p[uid] - s) // US_PER_DAY, True))
        else:
            obs.append((uid % 2, (horizon - s) // US_PER_DAY, False))
    sums = {w: [0.0, 0.0] for w in ("logrank", "gehan", "tarone_ware")}
    for day in range(SURVIVAL_WINDOW_DAYS):
        n_t = sum(1 for _, d, _ in obs if d >= day)
        if n_t == 0:
            continue
        n1 = sum(1 for g, d, _ in obs if d >= day and g == 0)
        d_t = sum(1 for _, d, e in obs if e and d == day)
        d1 = sum(1 for g, d, e in obs if e and d == day and g == 0)
        for w_name, wt in (
            ("logrank", 1.0),
            ("gehan", float(n_t)),
            ("tarone_ware", math.sqrt(n_t)),
        ):
            sums[w_name][0] += wt * (d1 - d_t * n1 / n_t)
            if n_t > 1:
                sums[w_name][1] += (
                    wt
                    * wt
                    * d_t
                    * (n1 / n_t)
                    * (1 - n1 / n_t)
                    * (n_t - d_t)
                    / (n_t - 1)
                )
    for w_name, (oe, v) in sums.items():
        assert abs(got[w_name]["o_minus_e"] - oe) < 1e-5
        assert abs(got[w_name]["variance"] - v) < 1e-5
        assert abs(got[w_name]["z"] - oe / math.sqrt(v)) < 1e-6


def test_lepage_matches_component_queries(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import (
        q_ansari_bradley,
        q_lepage_test,
    )

    lep = _row(q_lepage_test(spark, SF))
    ab = _row(q_ansari_bradley(spark, SF))
    # scale component must equal the standalone Ansari-Bradley z
    assert abs(lep["z_scale"] - ab["z"]) < 2e-6
    # and L is the sum of squares of its own components
    assert (
        abs(lep["lepage_l"] - (lep["z_location"] ** 2 + lep["z_scale"] ** 2))
        < 1e-4
    )


def test_bws_matches_per_observation_python(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import (
        q_baumgartner_weiss,
    )

    got = _row(q_baumgartner_weiss(spark, SF))
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice", "o_orderstatus"]
    )
    x, y = [], []
    for p, s in zip(t["o_totalprice"].to_pylist(), t["o_orderstatus"].to_pylist()):
        if s == "F":
            x.append(int(round(p * 100)))
        elif s == "O":
            y.append(int(round(p * 100)))
    pooled = sorted(x + y)
    import bisect

    def midrank(v):
        lo = bisect.bisect_left(pooled, v)
        hi = bisect.bisect_right(pooled, v)
        return (lo + hi + 1) / 2

    n, m = len(x), len(y)

    def b_part(sample, n_own, n_other):
        total = 0.0
        for i, v in enumerate(sorted(sample), start=1):
            r = midrank(v)
            psi = i / (n_own + 1)
            total += ((r - (n + m) / n_own * i) ** 2) / (
                psi * (1 - psi) * n_other * (n + m) / n_own
            )
        return total / n_own

    bx = b_part(x, n, m)
    by = b_part(y, m, n)
    assert got["n_f"] == n and got["n_o"] == m
    assert abs(got["b_x"] - bx) < 1e-5
    assert abs(got["b_y"] - by) < 1e-5
    assert abs(got["bws_b"] - (bx + by) / 2) < 1e-5
