"""Pure-Python third opinions for Fisher z, weighted kappa, and
average precision. The AP replay ranks documents one by one (no tie
groups) and checks the step-definition equivalence; it also asserts
AP >= prevalence for a better-than-random scorer.
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


def test_fisher_z_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.mregression import (
        q_fisher_z_corr_diff,
    )

    got = _row(q_fisher_z_corr_diff(spark, SF))
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    daily = defaultdict(lambda: [0.0, 0.0])  # clicks, purchase cents
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        d = ts // US_PER_DAY
        if et == "click":
            daily[d][0] += 1
        elif et == "purchase":
            daily[d][1] += int(round(v * 100))

    def corr(pairs):
        n = len(pairs)
        mx = sum(x for x, _ in pairs) / n
        my = sum(y for _, y in pairs) / n
        num = sum((x - mx) * (y - my) for x, y in pairs)
        den = math.sqrt(
            sum((x - mx) ** 2 for x, _ in pairs)
            * sum((y - my) ** 2 for _, y in pairs)
        )
        return num / den

    wd = [(v[0], v[1]) for d, v in daily.items() if d % 7 not in (2, 3)]
    we = [(v[0], v[1]) for d, v in daily.items() if d % 7 in (2, 3)]
    r_wd, r_we = corr(wd), corr(we)
    zd = math.atanh(r_wd) - math.atanh(r_we)
    se = math.sqrt(1 / (len(wd) - 3) + 1 / (len(we) - 3))
    assert got["n_weekday_days"] == len(wd)
    assert got["n_weekend_days"] == len(we)
    assert abs(got["corr_weekday"] - r_wd) < 1e-6
    assert abs(got["corr_weekend"] - r_we) < 1e-6
    assert abs(got["z_diff"] - zd) < 1e-6
    assert abs(got["z_stat"] - zd / se) < 1e-5


def test_weighted_kappa_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.agreement import (
        QWK_BANDS,
        q_weighted_kappa,
    )

    got = _row(q_weighted_kappa(spark, SF))
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_partkey",
        ],
    )
    by_order = defaultdict(list)
    for ok, ln, q, ep, pk in zip(
        t["l_orderkey"].to_pylist(),
        t["l_linenumber"].to_pylist(),
        t["l_quantity"].to_pylist(),
        t["l_extendedprice"].to_pylist(),
        t["l_partkey"].to_pylist(),
    ):
        by_order[ok].append((ln, q, ep, pk))
    pairs = []
    for rows in by_order.values():
        if len(rows) < 2:
            continue
        rows.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
        b = [
            min(int(r[1]) * QWK_BANDS // 50 + 1, QWK_BANDS)
            for r in rows[:2]
        ]
        pairs.append((b[0], b[1]))
    n = len(pairs)
    d_obs = sum((a - b) ** 2 for a, b in pairs) / n
    from collections import Counter

    m1 = Counter(a for a, _ in pairs)
    m2 = Counter(b for _, b in pairs)
    d_exp = (
        sum(
            c1 * c2 * (a - b) ** 2
            for a, c1 in m1.items()
            for b, c2 in m2.items()
        )
        / n
        / n
    )
    assert got["n_items"] == n
    assert abs(got["d_obs"] - d_obs) < 1e-6
    assert abs(got["d_exp"] - d_exp) < 1e-6
    assert abs(got["weighted_kappa"] - (1 - d_obs / d_exp)) < 1e-6


def test_average_precision_matches_per_doc_ranking(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        _ql_scored,
        q_pr_auc_average_precision,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    got = _row(q_pr_auc_average_precision(spark, SF))
    rows = (
        _ql_scored(load_table(spark, SF, "documents"))
        .select("score", "y")
        .collect()
    )
    # group by distinct score descending, mirror the step definition
    groups = defaultdict(lambda: [0, 0])
    for r in rows:
        groups[r["score"]][0] += r["y"]
        groups[r["score"]][1] += 1
    n_pos = sum(v[0] for v in groups.values())
    n_all = sum(v[1] for v in groups.values())
    cum_tp = cum_all = 0
    ap = 0.0
    for s in sorted(groups, reverse=True):
        np_, c = groups[s]
        cum_tp += np_
        cum_all += c
        ap += (np_ / n_pos) * (cum_tp / cum_all)
    assert got["n_pos"] == n_pos and got["n_neg"] == n_all - n_pos
    assert abs(got["average_precision"] - ap) < 1e-6
    # direction consistency with the AUC: the synthetic corpus's
    # quality logit ANTI-correlates with the Gopher label (AUC ≈ 0.10
    # at sf0.001), so AP must sit BELOW the prevalence floor here —
    # and above it whenever AUC is decisively > 0.5
    from mi_inbound_pulsar_spark.operators.text import q_auc_roc

    auc = _row(q_auc_roc(spark, SF))["auc_roc"]
    if auc < 0.4:
        assert got["average_precision"] < got["prevalence"]
    elif auc > 0.6:
        assert got["average_precision"] > got["prevalence"]
