"""Pure-Python third opinions for the scale tests and Quade. The
Ansari-Bradley and Mood replays assign PER-POSITION scores to every
pooled observation and average tie blocks directly (production uses
closed-form prefix identities), so agreement proves the identities.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


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


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _tie_averaged_scores(pooled_sorted, score_fn):
    """score each position 1..N, average within equal-value blocks."""
    n = len(pooled_sorted)
    scores = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and pooled_sorted[j] == pooled_sorted[i]:
            j += 1
        avg = sum(score_fn(p + 1, n) for p in range(i, j)) / (j - i)
        for p in range(i, j):
            scores[p] = avg
        i = j
    return scores


def test_ansari_bradley_matches_positionwise(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import q_ansari_bradley

    got = _row(q_ansari_bradley(spark, SF))
    x, y = _samples()
    pooled = sorted(x + y)
    scores = _tie_averaged_scores(pooled, lambda i, n: min(i, n + 1 - i))
    by_val = defaultdict(list)
    for v, s in zip(pooled, scores):
        by_val[v].append(s)
    ab = sum(by_val[v][0] for v in x)  # all scores equal within block
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    if nn % 2 == 0:
        mean = n1 * (nn + 2) / 4
        var = n1 * n2 * (nn + 2) * (nn - 2) / (48 * (nn - 1))
    else:
        mean = n1 * (nn + 1) ** 2 / (4 * nn)
        var = n1 * n2 * (nn + 1) * (3 + nn * nn) / (48 * nn * nn)
    assert got["n_f"] == n1 and got["n_o"] == n2
    assert got["ab_stat"] == round(ab, 6)
    assert got["ab_mean"] == round(mean, 6)
    assert got["z"] == round((ab - mean) / math.sqrt(var), 6)


def test_mood_scale_matches_positionwise(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import q_mood_scale_test

    got = _row(q_mood_scale_test(spark, SF))
    x, y = _samples()
    pooled = sorted(x + y)
    nn = len(pooled)
    scores = _tie_averaged_scores(
        pooled, lambda i, n: (i - (n + 1) / 2) ** 2
    )
    by_val = defaultdict(list)
    for v, s in zip(pooled, scores):
        by_val[v].append(s)
    t = sum(by_val[v][0] for v in x)
    n1, n2 = len(x), len(y)
    mean = n1 * (nn * nn - 1) / 12
    var = n1 * n2 * (nn + 1) * (nn * nn - 4) / 180
    assert got["n_f"] == n1 and got["n_o"] == n2
    assert abs(got["mood_t"] - t) < 1e-4
    assert got["t_mean"] == round(mean, 6)
    assert abs(got["z"] - (t - mean) / math.sqrt(var)) < 1e-6


def test_quade_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.posthoc import q_quade_test

    got = _row(q_quade_test(spark, SF))
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    daily = defaultdict(int)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        daily[(ts // US_PER_DAY, et)] += int(round(v * 100))
    by_day = defaultdict(dict)
    for (day, et), c in daily.items():
        by_day[day][et] = c
    blocks = {d: m for d, m in by_day.items() if len(m) == 5}
    n, k = len(blocks), 5

    def midranks(vals):
        out = {}
        sv = sorted(vals)
        for v in set(vals):
            lo = sum(1 for a in sv if a < v)
            tied = sum(1 for a in sv if a == v)
            out[v] = lo + (tied + 1) / 2
        return out

    ranges = {d: max(m.values()) - min(m.values()) for d, m in blocks.items()}
    qmr = midranks(list(ranges.values()))
    s_j = defaultdict(float)
    a = 0.0
    for d, m in blocks.items():
        rmr = midranks(list(m.values()))
        for et, c in m.items():
            s = qmr[ranges[d]] * (rmr[c] - (k + 1) / 2)
            s_j[et] += s
            a += s * s
    b = sum(v * v for v in s_j.values()) / n
    assert got["n_blocks"] == n and got["n_treatments"] == k
    assert abs(got["a_total"] - a) < 1e-4
    assert abs(got["b_total"] - b) < 1e-4
    assert abs(got["quade_f"] - (n - 1) * b / (a - b)) < 1e-5
