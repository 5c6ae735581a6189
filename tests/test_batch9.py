"""Pure-Python third opinions for Gwet's AC1, Atkinson/Theil, and the
a-priori association rules (replayed with dict/set loops; the rules
replay enumerates every in-basket triple directly — no candidate
pruning — so agreement also validates that the prune drops nothing
above the support floor).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_gwet_ac1_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.agreement import (
        FLEISS_RATERS as K,
        q_gwet_ac1,
    )

    got = _row(q_gwet_ac1(spark, SF))
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"],
    )
    by_order = defaultdict(list)
    for ok, ln, rf, ep in zip(
        t["l_orderkey"].to_pylist(),
        t["l_linenumber"].to_pylist(),
        t["l_returnflag"].to_pylist(),
        t["l_extendedprice"].to_pylist(),
    ):
        by_order[ok].append((ln, rf, ep))
    items = []
    for rows in by_order.values():
        if len(rows) >= K:
            rows.sort(key=lambda r: (r[0], r[1], r[2]))
            items.append([rf for _, rf, _ in rows[:K]])
    n_items = len(items)
    p_a = sum(
        (sum(c * c for c in Counter(cats).values()) - K) / (K * (K - 1))
        for cats in items
    ) / n_items
    marg = Counter(c for cats in items for c in cats)
    pis = [v / (K * n_items) for v in marg.values()]
    p_e = sum(p * (1 - p) for p in pis) / (len(pis) - 1)
    assert got["n_items"] == n_items and got["n_cats"] == len(pis)
    assert got["p_a"] == round(p_a, 6)
    assert got["p_e_ac1"] == round(p_e, 6)
    assert got["gwet_ac1"] == round((p_a - p_e) / (1 - p_e), 6)


def test_atkinson_theil_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.divergences import q_atkinson_theil

    got = _row(q_atkinson_theil(spark, SF))
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    spend = defaultdict(int)
    for ck, tp in zip(t["o_custkey"].to_pylist(), t["o_totalprice"].to_pylist()):
        spend[ck] += int(round(tp * 100))
    xs = [float(s) for s in spend.values() if s > 0]
    n = len(xs)
    mu = sum(xs) / n
    m_half = sum(math.sqrt(x) for x in xs) / n
    geo = math.exp(sum(math.log(x) for x in xs) / n)
    theil_t = sum(x / mu * math.log(x / mu) for x in xs) / n
    theil_l = sum(math.log(mu / x) for x in xs) / n
    assert got["n_customers"] == n
    assert abs(got["atkinson_05"] - (1 - m_half**2 / mu)) < 1e-6
    assert abs(got["atkinson_1"] - (1 - geo / mu)) < 1e-6
    assert abs(got["theil_t"] - theil_t) < 1e-6
    assert abs(got["theil_l"] - theil_l) < 1e-6
    # free invariants: 0 <= A(0.5) <= A(1) < 1 (aversion monotonicity)
    assert 0 <= got["atkinson_05"] <= got["atkinson_1"] < 1


def test_association_rules_matches_unpruned_enumeration(spark):
    from mi_inbound_pulsar_spark.operators.funnel import (
        RULES_MIN_SUPPORT,
        RULES_TOP_K,
        q_association_rules,
    )

    got = [r.asDict() for r in q_association_rules(spark, SF).collect()]
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    pt = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_of = dict(
        zip(pt["p_partkey"].to_pylist(), pt["p_brand"].to_pylist())
    )
    baskets = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"].to_pylist(), li["l_partkey"].to_pylist()):
        baskets[ok].add(brand_of[pk])
    n_orders = len(baskets)
    floor = RULES_MIN_SUPPORT * n_orders
    brand_n = Counter(b for bs in baskets.values() for b in bs)
    pair_n = Counter(
        p for bs in baskets.values() for p in combinations(sorted(bs), 2)
    )
    triple_n = Counter(
        tr for bs in baskets.values() for tr in combinations(sorted(bs), 3)
    )
    rules = []
    for (b1, b2, b3), n_abc in triple_n.items():
        n_ab = pair_n[(b1, b2)]
        if n_abc >= floor and n_ab >= floor:
            lift = n_abc * n_orders / (n_ab * brand_n[b3])
            rules.append(
                (-lift, b1, b2, b3, n_abc, n_abc / n_orders, n_abc / n_ab)
            )
    rules.sort()
    expect = rules[:RULES_TOP_K]
    assert len(got) == len(expect)
    for row, (neg_lift, b1, b2, b3, n_abc, sup, conf) in zip(got, expect):
        assert (row["antecedent_1"], row["antecedent_2"], row["consequent"]) == (
            b1,
            b2,
            b3,
        )
        assert row["n_abc"] == n_abc
        assert row["support"] == round(sup, 6)
        assert row["confidence"] == round(conf, 6)
        assert row["lift"] == round(-neg_lift, 6)
