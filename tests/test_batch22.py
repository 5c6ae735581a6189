"""Pure-Python third opinions for Markov entropy rate, Burrows'
delta, and KS model separation — dict/Counter loop replays, including
the information-theoretic invariants 0 <= I and rate <= H(marginal).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_markov_entropy_rate_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.funnel import (
        q_markov_entropy_rate,
    )

    got = _row(q_markov_entropy_rate(spark, SF))
    t = pq.read_table(
        f"{SF}/events.parquet",
        columns=["ts", "event_id", "user_id", "event_type"],
    )
    per_user = defaultdict(list)
    for ts, eid, uid, et in zip(
        (x.value for x in t["ts"]),
        t["event_id"].to_pylist(),
        t["user_id"].to_pylist(),
        t["event_type"].to_pylist(),
    ):
        per_user[uid].append((ts, eid, et))
    bi = Counter()
    for evs in per_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        for (a, b) in zip(evs, evs[1:]):
            bi[(a[2], b[2])] += 1
    n = sum(bi.values())

    def h(counter):
        return -sum(c / n * math.log(c / n) for c in counter.values())

    h12 = h(bi)
    h1 = h(Counter({k: sum(c for (a, _), c in bi.items() if a == k)
                    for k in {a for a, _ in bi}}))
    h2 = h(Counter({k: sum(c for (_, b), c in bi.items() if b == k)
                    for k in {b for _, b in bi}}))
    assert got["n_transitions"] == n
    assert abs(got["h_marginal"] - h1) < 1e-6
    assert abs(got["h_joint"] - h12) < 1e-6
    assert abs(got["entropy_rate"] - (h12 - h1)) < 1e-6
    assert abs(got["mutual_information"] - (h1 + h2 - h12)) < 1e-6
    # information-theoretic sanity: 0 <= rate <= H(X2) and I >= 0
    assert -1e-9 <= got["entropy_rate"] <= h2 + 1e-9
    assert got["mutual_information"] >= -1e-9


def test_burrows_delta_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        BURROWS_TOP_PAIRS,
        BURROWS_TOP_WORDS,
        q_burrows_delta,
    )

    got = [r.asDict() for r in q_burrows_delta(spark, SF).collect()]
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    toks = defaultdict(Counter)
    corpus = Counter()
    for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        ws = [w for w in text.split(" ") if w]
        toks[src].update(ws)
        corpus.update(ws)
    topw = [
        w
        for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BURROWS_TOP_WORDS
        ]
    ]
    srcs = sorted(toks)
    rel = {
        (s, w): toks[s][w] / sum(toks[s].values())
        for s in srcs
        for w in topw
    }
    z = {}
    for w in topw:
        vals = [rel[(s, w)] for s in srcs]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
        for s in srcs:
            z[(s, w)] = (rel[(s, w)] - mu) / sd
    deltas = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            d = sum(abs(z[(a, w)] - z[(b, w)]) for w in topw) / len(topw)
            deltas.append((-round(d, 6), a, b))
    deltas.sort()
    expect = deltas[:BURROWS_TOP_PAIRS]
    assert len(got) == len(expect)
    for row, (nd, a, b) in zip(got, expect):
        assert (row["src_a"], row["src_b"]) == (a, b)
        assert row["burrows_delta"] == -nd


def test_ks_separation_consistent_with_auc(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        q_auc_roc,
        q_ks_model_separation,
    )

    ks = _row(q_ks_model_separation(spark, SF))
    auc = _row(q_auc_roc(spark, SF))
    assert ks["n_pos"] == auc["n_pos"] and ks["n_neg"] == auc["n_neg"]
    assert 0 <= ks["ks_stat"] <= 1
    # a classifier with AUC this far from 0.5 must separate: the KS
    # statistic is bounded below by 2|AUC - 1/2| ... not in general,
    # but KS >= |2*AUC - 1| holds for all score distributions
    # (Gini = 2AUC-1 and KS >= Gini is false in general; assert the
    # universally true direction instead: KS > 0 iff AUC != 0.5)
    if abs(auc["auc_roc"] - 0.5) > 0.01:
        assert ks["ks_stat"] > 0.0
