"""Pure-Python third opinions for bpref and market beta. The bpref
replay implements the Buckley-Voorhees definition with explicit list
scans over a re-derived BM25 ranking; the beta replay checks the
portfolio identity Σ_type cov(y_t, m) = var(m) (betas weighted by
nothing must sum to 1 when regressing components on their own sum).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def test_bpref_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        MRR_N_QUERIES,
        MRR_TERMS_PER_QUERY,
        q_bpref_eval,
    )

    got = {r["qid"]: r.asDict() for r in q_bpref_eval(spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    tf = {
        did: Counter(w for w in txt.split(" ") if w)
        for did, txt in docs.items()
    }
    dl = {did: len([w for w in txt.split(" ") if w or w == ""]) for did, txt in docs.items()}
    # length as the engines compute it: split on single space, count all
    dl = {did: len(txt.split(" ")) for did, txt in docs.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    expect = {}
    for qid in range(MRR_N_QUERIES):
        if qid not in tf:
            continue
        terms = sorted(tf[qid], key=lambda w: (df[w], w))[
            :MRR_TERMS_PER_QUERY
        ]
        scored = []
        for did, c in tf.items():
            grade = sum(1 for w in terms if w in c)
            if grade == 0:
                continue
            score = sum(
                math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                * (c[w] * 2.2)
                / (c[w] + 1.2 * (0.25 + 0.75 * dl[did] / avgdl))
                for w in terms
                if w in c
            )
            scored.append((-round(score, 6), did, grade))
        scored.sort()
        r = sum(1 for _, _, g in scored if g >= MRR_TERMS_PER_QUERY)
        nn = sum(1 for _, _, g in scored if g < MRR_TERMS_PER_QUERY)
        if r == 0 or nn == 0:
            continue
        cap = min(r, nn)
        total = 0.0
        nonrel_above = 0
        for _, _, g in scored:
            if g >= MRR_TERMS_PER_QUERY:
                total += 1 - min(nonrel_above, cap) / cap
            else:
                nonrel_above += 1
        expect[qid] = (r, nn, total / r)
    assert set(got) == set(expect)
    for qid, (r, nn, bp) in expect.items():
        assert got[qid]["n_relevant"] == r
        assert got[qid]["n_nonrelevant"] == nn
        assert got[qid]["bpref"] == round(bp, 6)


def test_market_beta_matches_python_and_sums_to_market(spark):
    from mi_inbound_pulsar_spark.operators.mregression import q_market_beta

    got = {r["event_type"]: r.asDict() for r in q_market_beta(spark, SF).collect()}
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    daily = defaultdict(float)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        daily[(ts.value // US_PER_DAY if hasattr(ts, "value") else ts // US_PER_DAY, et)] += int(
            round(v * 100)
        )
    days = sorted({d for d, _ in daily})
    types = sorted({e for _, e in daily})
    m = {d: sum(daily.get((d, e), 0.0) for e in types) for d in days}
    mm = sum(m.values()) / len(days)
    var_m = sum((x - mm) ** 2 for x in m.values()) / len(days)
    betas = {}
    for et in types:
        ys = [daily.get((d, et), 0.0) for d in days]
        # NOTE the production query only includes (day, type) rows that
        # exist; replay mirrors by skipping missing days for the type
        present = [d for d in days if (d, et) in daily]
        ys = [daily[(d, et)] for d in present]
        ms = [m[d] for d in present]
        k = len(present)
        my, mmk = sum(ys) / k, sum(ms) / k
        cov = sum((y - my) * (x - mmk) for y, x in zip(ys, ms)) / k
        varm = sum((x - mmk) ** 2 for x in ms) / k
        beta = cov / varm
        alpha = my - beta * mmk
        betas[et] = beta
        assert got[et]["n_days"] == k
        assert abs(got[et]["beta"] - beta) < 1e-6
        assert abs(got[et]["alpha_dollars"] - alpha / 100) < 1e-4
    # when every type is present every day, Σ cov(y_t, m) = var(m), so
    # Σ beta = 1; with identical day sets this must hold exactly
    if all(got[et]["n_days"] == len(days) for et in types):
        assert abs(sum(betas.values()) - 1) < 1e-9
