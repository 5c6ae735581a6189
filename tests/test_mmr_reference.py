"""Brute-force third opinion for q_mmr_diversification: BM25 from the
textbook formula, the candidate pool, Jaccard similarities, and the
greedy MMR walk — all recomputed in pure Python on the real sf0.001
corpus and compared selection-by-selection. The Spark query and its
DuckDB oracle share formula text; this shares only the definitions.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def test_mmr_matches_pure_python_greedy(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        MRR_N_QUERIES,
        MRR_TERMS_PER_QUERY,
        q_mmr_diversification,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    tf = {d: Counter(w) for d, w in docs.items()}
    dl = {d: len(w) for d, w in docs.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for c in tf.values():
        df.update(c.keys())

    def bm25(qtoks, d):
        s = 0.0
        for t in qtoks:
            f = tf[d].get(t, 0)
            if f == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
        return round(s, 6)

    lam, mu = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    expected = {}
    for qid in range(MRR_N_QUERIES):
        qtoks = sorted(set(docs[qid]), key=lambda t: (df[t], t))[
            :MRR_TERMS_PER_QUERY
        ]
        scored = [
            (d, bm25(qtoks, d))
            for d in docs
            if any(t in tf[d] for t in qtoks)
        ]
        pool = sorted(scored, key=lambda x: (-x[1], x[0]))[:MMR_POOL]
        sets = {d: set(docs[d]) for d, _ in pool}

        def jac(a, b):
            inter = len(sets[a] & sets[b])
            return inter / (len(sets[a]) + len(sets[b]) - inter)

        selected = []
        for _step in range(MMR_K):
            best = None
            for d, rel in pool:
                if d in {s for s, _ in selected}:
                    continue
                pen = max((jac(d, s) for s, _ in selected), default=0.0)
                mmr = round(lam * rel - mu * pen, 6)
                key = (-mmr, d)
                if best is None or key < best[0]:
                    best = (key, d, rel, lam * rel - mu * pen)
            selected.append((best[1], best[3]))
        expected[qid] = selected

    got = defaultdict(list)
    for r in q_mmr_diversification(spark, sf_dir).collect():
        got[r["qid"]].append(r)
    assert set(got) == set(expected)
    for qid, rows in got.items():
        rows.sort(key=lambda r: r["step"])
        for r, (doc, mmr) in zip(rows, expected[qid]):
            assert r["doc_id"] == doc, (qid, r["step"], r["doc_id"], doc)
            assert abs(r["mmr"] - round(mmr, 6)) < 1e-5
