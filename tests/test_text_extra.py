"""Semantic tests for BM25, token entropy, and heavy hitters (the
oracle sweep checks DuckDB parity; these check the math itself against
independent Python recomputation on the small fixture)."""

from __future__ import annotations

import math
from collections import Counter

from mi_inbound_pulsar_spark.operators.text import (
    TFIDF_TERMS,
    q_bm25_search,
    q_heavy_hitters,
    q_token_entropy,
)
from mi_inbound_pulsar_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }


def test_bm25_matches_python_recomputation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = {t: sum(1 for w in docs.values() if t in w) for t in TFIDF_TERMS}
    k1, b = 1.2, 0.75
    rows = q_bm25_search(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        w = docs[r.doc_id]
        tfs = [w.count(t) for t in TFIDF_TERMS]
        assert [r.tf1, r.tf2, r.tf3] == tfs and r.dl == len(w)
        expected = sum(
            math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            * (tf * (k1 + 1))
            / (tf + k1 * (1 - b + b * len(w) / avgdl))
            for t, tf in zip(TFIDF_TERMS, tfs)
        )
        assert abs(r.bm25 - expected) < 1e-4
    # docs with no query term are filtered out
    scored = {r.doc_id for r in rows}
    for doc_id, w in docs.items():
        assert (doc_id in scored) == any(t in w for t in TFIDF_TERMS)


def test_token_entropy_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = q_token_entropy(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    for r in rows[:50]:
        c = Counter(docs[r.doc_id])
        ntok = sum(c.values())
        h = -sum(v / ntok * math.log(v / ntok) for v in c.values())
        assert r.n_tokens == ntok and r.n_distinct == len(c)
        assert abs(r.entropy - h) < 1e-4
        assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9


def test_heavy_hitters_threshold_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    c = Counter(t for w in docs.values() for t in w)
    total = sum(c.values())
    expected = {t: n for t, n in c.items() if n >= 0.01 * total}
    got = {r.token: r.cnt for r in q_heavy_hitters(spark, sf_dir).collect()}
    assert got == expected
    assert sum(r for r in got.values()) <= total


def test_incremental_dedup_matches_bruteforce(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.dedup import q_dedup_incremental

    docs = _docs(spark, sf_dir)

    def sh3(words):
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    base = {i: sh3(w) for i, w in docs.items() if i % 10 != 0}
    delta = {i: sh3(w) for i, w in docs.items() if i % 10 == 0}
    expected = {}
    for di, ds in delta.items():
        n, best = 0, None
        for bi, bs in base.items():
            inter = len(ds & bs)
            union = len(ds | bs)
            if union and round(inter / union, 6) >= 0.5:
                n += 1
                j = round(inter / union, 6)
                best = j if best is None else max(best, j)
        expected[di] = (n, best)
    rows = q_dedup_incremental(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(delta)
    for r in rows:
        n, best = expected[r.doc_id]
        assert r.n_matches == n and r.is_dup == (n > 0)
        if best is not None:
            assert abs(r.best_jaccard - best) < 1e-9


def test_bigram_pmi_matches_python(spark, sf_dir):
    import math
    from mi_inbound_pulsar_spark.operators.text import q_bigram_pmi

    docs = _docs(spark, sf_dir)
    uni = Counter(t for w in docs.values() for t in w)
    bi = Counter((w[i], w[i + 1]) for w in docs.values() for i in range(len(w) - 1))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    rows = q_bigram_pmi(spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r.n_pair for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert bi[(r.t1, r.t2)] == r.n_pair
        expected = math.log(
            (r.n_pair / n_bi) / ((uni[r.t1] / n_uni) * (uni[r.t2] / n_uni))
        )
        assert abs(r.pmi - expected) < 1e-4


def test_keyword_extraction_top3_per_doc(spark, sf_dir):
    import math
    from mi_inbound_pulsar_spark.operators.text import q_keyword_extraction

    docs = _docs(spark, sf_dir)
    n_docs = len(docs)
    df = Counter(t for w in docs.values() for t in set(w))
    rows = q_keyword_extraction(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        assert [r.rank for r in rs] == [1, 2, 3]
        c = Counter(docs[doc_id])
        best = sorted(
            ((tf * math.log(n_docs / df[t]), t) for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        assert [r.term for r in rs] == [t for _, t in best]


def test_phrase_search_matches_python_scan(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import q_phrase_search

    docs = _docs(spark, sf_dir)
    expected = {}
    for doc_id, w in docs.items():
        hits = [i + 1 for i in range(len(w) - 1) if w[i] == "table" and w[i + 1] == "hash"]
        if hits:
            expected[doc_id] = (len(hits), hits[0])
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in q_phrase_search(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # non-vacuous: the phrase occurs in the corpus
