"""Pure-Python third opinions for the agreement operators: replays
built straight from the parquet files with per-observation dict loops
(a different computational path from the production rollups).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
K = 3  # Fleiss panel size


def _lineitem():
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"],
    )
    return list(
        zip(
            t["l_orderkey"].to_pylist(),
            t["l_linenumber"].to_pylist(),
            t["l_returnflag"].to_pylist(),
            t["l_extendedprice"].to_pylist(),
        )
    )


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_fleiss_kappa_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.agreement import q_fleiss_kappa

    got = _row(q_fleiss_kappa(spark, SF))
    by_order = defaultdict(list)
    for ok, ln, rf, ep in _lineitem():
        by_order[ok].append((ln, rf, ep))
    items = []
    for rows in by_order.values():
        if len(rows) >= K:
            rows.sort(key=lambda r: (r[0], r[1], r[2]))
            items.append([rf for _, rf, _ in rows[:K]])
    n_items = len(items)
    p_bar = sum(
        (sum(c * c for c in Counter(cats).values()) - K) / (K * (K - 1))
        for cats in items
    ) / n_items
    marg = Counter(c for cats in items for c in cats)
    total = n_items * K
    pe_bar = sum((v / total) ** 2 for v in marg.values())
    assert got["n_items"] == n_items
    assert got["p_bar"] == round(p_bar, 6)
    assert got["pe_bar"] == round(pe_bar, 6)
    assert got["fleiss_kappa"] == round((p_bar - pe_bar) / (1 - pe_bar), 6)


def test_icc_oneway_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.agreement import q_icc_oneway

    got = _row(q_icc_oneway(spark, SF))
    by_order = defaultdict(list)
    for ok, _, _, ep in _lineitem():
        by_order[ok].append(ep)
    groups = [v for v in by_order.values() if len(v) >= 2]
    a = len(groups)
    n = sum(len(g) for g in groups)
    s = sum(sum(g) for g in groups)
    ss = sum(x * x for g in groups for x in g)
    sb = sum(sum(g) ** 2 / len(g) for g in groups)
    msb = (sb - s * s / n) / (a - 1)
    msw = (ss - sb) / (n - a)
    k0 = (n - sum(len(g) ** 2 for g in groups) / n) / (a - 1)
    assert got["n_groups"] == a and got["n_obs"] == n
    assert got["ms_between_m"] == round(msb / 1e6, 6)
    assert got["ms_within_m"] == round(msw / 1e6, 6)
    assert got["k0"] == round(k0, 6)
    assert got["icc1"] == round((msb - msw) / (msb + (k0 - 1) * msw), 6)


def test_krippendorff_alpha_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.agreement import (
        q_krippendorff_alpha,
    )

    got = _row(q_krippendorff_alpha(spark, SF))
    by_order = defaultdict(list)
    for ok, _, rf, _ in _lineitem():
        by_order[ok].append(rf)
    units = [v for v in by_order.values() if len(v) >= 2]
    n = sum(len(u) for u in units)
    o_diag = sum(
        c * (c - 1) / (len(u) - 1)
        for u in units
        for c in Counter(u).values()
    )
    marg = Counter(c for u in units for c in u)
    d_obs = n - o_diag
    d_exp = (n * n - sum(v * v for v in marg.values())) / (n - 1)
    assert got["n_ratings"] == n
    assert got["d_obs"] == round(d_obs, 6)
    assert got["d_exp"] == round(d_exp, 6)
    assert got["kripp_alpha"] == round(1 - d_obs / d_exp, 6)
