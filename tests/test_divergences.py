"""Pure-Python third opinions for the divergence operators — including
an O(n·m) BRUTE-FORCE pair enumeration for the energy distance (the
production query computes it in one sorted pass; agreement proves the
cumulative-sum identity, not just the arithmetic).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _purchases():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    out = []
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if et == "purchase":
            day = ts // US_PER_DAY
            out.append((day % 7 in (2, 3), int(round(v * 100))))
    return out


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_hellinger_tv_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.divergences import (
        q_hellinger_tv_distance,
    )

    got = _row(q_hellinger_tv_distance(spark, SF))
    wd = Counter(len(str(v)) for we, v in _purchases() if not we)
    we = Counter(len(str(v)) for w, v in _purchases() if w)
    n1, n2 = sum(wd.values()), sum(we.values())
    bands = set(wd) | set(we)
    bc = sum(math.sqrt(wd[b] / n1 * we[b] / n2) for b in bands)
    tv = sum(abs(wd[b] / n1 - we[b] / n2) for b in bands) / 2
    assert got["n_weekday"] == n1 and got["n_weekend"] == n2
    assert got["bhattacharyya_coef"] == round(bc, 6)
    assert got["bhattacharyya_dist"] == round(-math.log(bc), 6)
    assert got["hellinger"] == round(math.sqrt(1 - bc), 6)
    assert got["total_variation"] == round(tv, 6)


def test_renyi_entropy_matches_python_and_is_monotone(spark):
    from mi_inbound_pulsar_spark.operators.divergences import q_renyi_entropy

    got = _row(q_renyi_entropy(spark, SF))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    freq = Counter(
        w for txt in t["text"].to_pylist() for w in txt.split(" ") if w
    )
    n = sum(freq.values())
    ps = [c / n for c in freq.values()]
    h0 = math.log(len(ps))
    h1 = -sum(p * math.log(p) for p in ps)
    hh = 2 * math.log(sum(math.sqrt(p) for p in ps))
    h2 = -math.log(sum(p * p for p in ps))
    hi = -math.log(max(ps))
    assert got["vocab"] == len(ps)
    assert got["h0_hartley"] == round(h0, 6)
    assert got["h1_shannon"] == round(h1, 6)
    assert got["h_half"] == round(hh, 6)
    assert got["h2_collision"] == round(h2, 6)
    assert got["h_inf_min"] == round(hi, 6)
    # free invariant: H_alpha non-increasing in alpha
    assert h0 >= hh >= h1 >= h2 >= hi


def test_energy_distance_matches_bruteforce_pairs(spark):
    from mi_inbound_pulsar_spark.operators.divergences import (
        q_energy_distance,
    )

    got = _row(q_energy_distance(spark, SF))
    xs = [v for we, v in _purchases() if not we]
    ys = [v for we, v in _purchases() if we]
    n, m = len(xs), len(ys)
    exy = sum(abs(x - y) for x in xs for y in ys) / (n * m)
    exx = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    eyy = sum(abs(a - b) for a in ys for b in ys) / (m * m)
    d = 2 * exy - exx - eyy
    assert got["n_weekday"] == n and got["n_weekend"] == m
    assert got["e_cross_dollars"] == round(exy / 100, 6)
    assert got["energy_dist_dollars"] == round(d / 100, 6)
    assert got["e_statistic"] == round(n * m / (n + m) * d / 100, 6)
