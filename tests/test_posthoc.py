"""Pure-Python third opinions for the post-hoc operators. The
Jonckheere replay counts pairs by BRUTE FORCE over observation pairs
(production never enumerates pairs); Tukey/Games-Howell replays
recompute group moments with per-observation loops.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _row_map(df, keys):
    return {tuple(r[k] for k in keys): r.asDict() for r in df.collect()}


def _segments():
    t = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )
    g = defaultdict(list)
    for seg, bal in zip(
        t["c_mktsegment"].to_pylist(), t["c_acctbal"].to_pylist()
    ):
        g[seg].append(bal)
    return g


def _moments(vals):
    n = len(vals)
    m = sum(vals) / n
    v = sum((x - m) ** 2 for x in vals) / (n - 1)
    return n, m, v


def test_tukey_hsd_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.posthoc import q_tukey_hsd

    got = _row_map(q_tukey_hsd(spark, SF), ("seg_a", "seg_b"))
    g = {s: _moments(v) for s, v in _segments().items()}
    mse = sum((n - 1) * v for n, _, v in g.values()) / sum(
        n - 1 for n, _, _ in g.values()
    )
    df_w = sum(n for n, _, _ in g.values()) - len(g)
    segs = sorted(g)
    assert len(got) == len(segs) * (len(segs) - 1) // 2
    for i, a in enumerate(segs):
        for b in segs[i + 1 :]:
            na, ma, _ = g[a]
            nb, mb, _ = g[b]
            row = got[(a, b)]
            q = (ma - mb) / math.sqrt(mse / 2 * (1 / na + 1 / nb))
            assert row["n_a"] == na and row["n_b"] == nb
            assert row["mean_diff"] == round(ma - mb, 6)
            assert abs(row["q_stat"] - q) < 1e-6
            assert row["df_within"] == df_w


def test_games_howell_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.posthoc import q_games_howell

    got = _row_map(q_games_howell(spark, SF), ("seg_a", "seg_b"))
    g = {s: _moments(v) for s, v in _segments().items()}
    segs = sorted(g)
    for i, a in enumerate(segs):
        for b in segs[i + 1 :]:
            na, ma, va = g[a]
            nb, mb, vb = g[b]
            row = got[(a, b)]
            se2 = va / na + vb / nb
            t = (ma - mb) / math.sqrt(se2)
            df = se2**2 / (
                (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
            )
            assert abs(row["t_stat"] - t) < 1e-6
            assert abs(row["q_stat"] - t * math.sqrt(2)) < 1e-6
            assert abs(row["df_welch"] - df) < 1e-4


def test_jonckheere_matches_bruteforce_pairs(spark):
    from mi_inbound_pulsar_spark.operators.posthoc import (
        q_jonckheere_terpstra,
    )

    rows = q_jonckheere_terpstra(spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    groups = {"1-URGENT": [], "3-MEDIUM": [], "5-LOW": []}
    for p, tp in zip(
        t["o_orderpriority"].to_pylist(), t["o_totalprice"].to_pylist()
    ):
        if p in groups:
            groups[p].append(int(round(tp * 100)))
    ordered = [groups["1-URGENT"], groups["3-MEDIUM"], groups["5-LOW"]]
    u = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            for x in ordered[i]:
                for y in ordered[j]:
                    u += 1.0 if x < y else (0.5 if x == y else 0.0)
    ns = [len(g) for g in ordered]
    nn = sum(ns)
    mean = (nn * nn - sum(n * n for n in ns)) / 4
    # Tie-corrected null variance, Hollander & Wolfe (1999) eq. 6.19,
    # built from the pooled tie-group sizes — an independent path from
    # the engine's rollup-column arithmetic.
    from collections import Counter

    ties = Counter(v for g in ordered for v in g)
    t2 = sum(t * (t - 1) for t in ties.values())
    t3 = sum(t * (t - 1) * (t - 2) for t in ties.values())
    t25 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    g2 = sum(n * (n - 1) for n in ns)
    g3 = sum(n * (n - 1) * (n - 2) for n in ns)
    g25 = sum(n * (n - 1) * (2 * n + 5) for n in ns)
    var = (
        (nn * (nn - 1) * (2 * nn + 5) - g25 - t25) / 72
        + g3 * t3 / (36 * nn * (nn - 1) * (nn - 2))
        + g2 * t2 / (8 * nn * (nn - 1))
    )
    assert got["n_urgent"] == ns[0]
    assert got["jt_stat"] == round(u, 6)
    assert got["jt_mean"] == round(mean, 6)
    assert got["z"] == round((u - mean) / math.sqrt(var), 6)
