"""Pure-Python third opinions for the effect-measure shelf, including
the Levin-vs-direct PAF identity (exact when prevalence and risks come
from the same 2x2) and the stratification common-support bookkeeping.
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


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _two_by_two(high_cents):
    a = n1 = b = n0 = 0
    for ts, _, et, v in _events():
        if et != "purchase":
            continue
        exposed = (ts // US_PER_DAY) % 7 in (2, 3)
        hi = int(round(v * 100)) >= high_cents
        if exposed:
            n1 += 1
            a += hi
        else:
            n0 += 1
            b += hi
    return a, n1, b, n0


def test_propensity_stratification_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        PROP_STRATA,
        q_propensity_stratification,
    )

    got = _row(q_propensity_stratification(spark, SF))
    import statistics

    users = defaultdict(lambda: [0, 0, 0])  # n_events, n_err, cents
    for _, uid, et, v in _events():
        users[uid][0] += 1
        if et == "error":
            users[uid][1] += 1
        if et == "purchase":
            users[uid][2] += int(round(v * 100))
    med = statistics.median(v[1] for v in users.values())
    rows = sorted(
        ((n, uid, ne > med, sp / 100) for uid, (n, ne, sp) in users.items()),
        key=lambda r: (r[0], r[1]),
    )
    n_u = len(rows)
    # ntile semantics: first (n_u % k) tiles get ceil(n/k)
    base = n_u // PROP_STRATA
    extra = n_u % PROP_STRATA
    strata = []
    i = 0
    for s in range(PROP_STRATA):
        size = base + (1 if s < extra else 0)
        strata.append(rows[i : i + size])
        i += size
    att_num = att_den = ate_num = ate_den = 0.0
    used = n_t_tot = n_c_tot = 0
    for block in strata:
        t = [sp for _, _, tr, sp in block if tr]
        c = [sp for _, _, tr, sp in block if not tr]
        if not t or not c:
            continue
        used += 1
        n_t_tot += len(t)
        n_c_tot += len(c)
        gap = sum(t) / len(t) - sum(c) / len(c)
        att_num += len(t) * gap
        att_den += len(t)
        ate_num += len(block) * gap
        ate_den += len(block)
    assert got["n_strata_used"] == used
    assert got["n_treated"] == n_t_tot and got["n_control"] == n_c_tot
    assert abs(got["att_stratified"] - att_num / att_den) < 1e-6
    assert abs(got["ate_stratified"] - ate_num / ate_den) < 1e-6


def test_risk_difference_nnt_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        EVALUE_HIGH_CENTS,
        q_risk_difference_nnt,
    )

    got = _row(q_risk_difference_nnt(spark, SF))
    a, n1, b, n0 = _two_by_two(EVALUE_HIGH_CENTS)
    p1, p0 = a / n1, b / n0
    rd = p1 - p0
    se = math.sqrt(p1 * (1 - p1) / n1 + p0 * (1 - p0) / n0)
    assert got["n_exposed"] == n1 and got["n_unexposed"] == n0
    assert got["risk_difference"] == round(rd, 6)
    assert abs(got["rd_lo95"] - (rd - 1.959964 * se)) < 1e-6
    assert abs(got["rd_hi95"] - (rd + 1.959964 * se)) < 1e-6
    assert got["nnt"] == round(1 / rd, 6)


def test_attributable_fraction_identity(spark):
    from mi_inbound_pulsar_spark.operators.auditstats import (
        EVALUE_HIGH_CENTS,
        q_attributable_fraction,
    )

    got = _row(q_attributable_fraction(spark, SF))
    a, n1, b, n0 = _two_by_two(EVALUE_HIGH_CENTS)
    p1, p0 = a / n1, b / n0
    pt = (a + b) / (n1 + n0)
    prev = n1 / (n1 + n0)
    af_e = (p1 - p0) / p1
    paf = (pt - p0) / pt
    levin = prev * (p1 / p0 - 1) / (prev * (p1 / p0 - 1) + 1)
    assert got["af_exposed"] == round(af_e, 6)
    assert got["paf"] == round(paf, 6)
    assert got["paf_levin"] == round(levin, 6)
    # identity: Levin's formula equals the direct PAF EXACTLY when all
    # quantities come from one table (no rounding gap beyond floats)
    assert abs(paf - levin) < 1e-12
