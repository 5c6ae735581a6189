"""Pure-Python third opinions for the paired tests and the exact
Poisson comparison. The Poisson replay uses scipy-free exact binomial
pmfs via math.comb fractions — integer-exact until the final float —
a different path than the log-factorial spine.
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


def _paired_diffs():
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
    acc = defaultdict(lambda: [[], []])  # part -> (F prices, O prices)
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
    diffs = {}
    for pk, (fs, os_) in acc.items():
        if fs and os_:
            diffs[pk] = int(round(sum(fs) / len(fs) * 100)) - int(
                round(sum(os_) / len(os_) * 100)
            )
    return diffs


def test_sign_test_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import q_sign_test

    got = _row(q_sign_test(spark, SF))
    diffs = list(_paired_diffs().values())
    n_pos = sum(1 for d in diffs if d > 0)
    n_neg = sum(1 for d in diffs if d < 0)
    n_zero = sum(1 for d in diffs if d == 0)
    n = n_pos + n_neg
    assert (got["n_pos"], got["n_neg"], got["n_zero"]) == (
        n_pos,
        n_neg,
        n_zero,
    )
    assert got["z"] == round((n_pos - n / 2) / math.sqrt(n / 4), 6)
    assert got["z_continuity"] == round(
        (abs(n_pos - n / 2) - 0.5) / math.sqrt(n / 4), 6
    )


def test_wilcoxon_signed_rank_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.ranktests import (
        q_wilcoxon_signed_rank,
    )

    got = _row(q_wilcoxon_signed_rank(spark, SF))
    diffs = [d for d in _paired_diffs().values() if d != 0]
    n = len(diffs)
    ads = sorted(abs(d) for d in diffs)

    def midrank(a):
        lo = sum(1 for x in ads if x < a)
        t = sum(1 for x in ads if x == a)
        return lo + (t + 1) / 2

    w_plus = sum(midrank(abs(d)) for d in diffs if d > 0)
    from collections import Counter

    ties = Counter(ads)
    tie_term = sum(t**3 - t for t in ties.values())
    mean = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - tie_term / 48
    assert got["n_pairs"] == n
    assert got["w_plus"] == round(w_plus, 6)
    assert got["w_mean"] == round(mean, 6)
    assert abs(got["z"] - (w_plus - mean) / math.sqrt(var)) < 1e-6


def test_poisson_2sample_matches_comb_exact(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        q_poisson_2sample_exact,
    )

    got = _row(q_poisson_2sample_exact(spark, SF))
    t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type"])
    days = set()
    x1 = n = 0
    for ts, et in zip((x.value for x in t["ts"]), t["event_type"].to_pylist()):
        day = ts // US_PER_DAY
        days.add(day)
        if et == "error":
            n += 1
            if day % 7 not in (2, 3):
                x1 += 1
    t1 = sum(1 for d in days if d % 7 not in (2, 3))
    t2 = len(days) - t1
    assert got["errors_weekday"] == x1
    assert got["errors_weekend"] == n - x1
    assert (got["days_weekday"], got["days_weekend"]) == (t1, t2)
    p0 = t1 / (t1 + t2)
    pmf = [
        round(math.comb(n, x) * p0**x * (1 - p0) ** (n - x), 10)
        for x in range(n + 1)
    ]
    assert abs(got["p_left"] - sum(pmf[: x1 + 1])) < 1e-5
    assert abs(got["p_right"] - sum(pmf[x1:])) < 1e-5
    assert got["rate_ratio"] == round(
        x1 / t1 / ((n - x1 + 0.5) / t2), 6
    )
