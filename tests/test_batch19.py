"""Pure-Python third opinions for winnowing, content-defined chunking,
and MSTTR — per-document loop replays with hashlib, including the
winnowing COVERAGE GUARANTEE (every w+k-1-token stretch contributes a
fingerprint) asserted directly.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _gram_hashes(text, k=3):
    toks = text.split(" ")
    if len(toks) < k:
        return []
    return [
        int(
            hashlib.md5(
                " ".join(toks[p : p + k]).encode()
            ).hexdigest()[:8],
            16,
        )
        for p in range(len(toks) - k + 1)
    ]


def test_winnowing_matches_python_and_guarantees_coverage(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        WINNOW_W,
        q_winnowing_fingerprint,
    )

    got = _row(q_winnowing_fingerprint(spark, SF))
    per_doc = {}
    share = Counter()
    for did, text in _docs().items():
        hs = _gram_hashes(text)
        if len(hs) < WINNOW_W:
            continue
        fps = set()
        for i in range(len(hs) - WINNOW_W + 1):
            window = hs[i : i + WINNOW_W]
            fps.add(min(window))
        per_doc[did] = len(fps)
        for fp in fps:
            share[fp] += 1
        # coverage guarantee: every window of W grams contains a
        # selected fingerprint value
        for i in range(len(hs) - WINNOW_W + 1):
            assert any(h in fps for h in hs[i : i + WINNOW_W])
    assert got["n_docs"] == len(per_doc)
    assert got["total_fingerprints"] == sum(per_doc.values())
    assert got["distinct_fingerprints"] == len(share)
    assert got["mean_fp_per_doc"] == round(
        sum(per_doc.values()) / len(per_doc), 6
    )
    assert got["max_docs_sharing_fp"] == max(share.values())


def test_cdc_matches_python_and_shift_robust(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        CDC_MOD,
        q_content_defined_chunking,
    )

    got = _row(q_content_defined_chunking(spark, SF))
    chunks = []
    for did, text in _docs().items():
        hs = _gram_hashes(text)
        if not hs:
            continue
        cid = 0
        acc = []
        out = defaultdict(list)
        for h in hs:
            out[cid].append(h)
            # boundary AFTER this gram if its hash hits the modulus?
            # production marks boundary rows and assigns chunk_id as
            # count of STRICTLY PRECEDING boundaries, so a boundary
            # gram is the last member of its chunk... no: preceding
            # count means the boundary gram starts at its own chunk
            # only for FOLLOWING rows. Mirror: increment after.
            if h % CDC_MOD == 0:
                cid += 1
        chunks.extend(tuple(v) for v in out.values())
    n_chunks = len(chunks)
    sigs = Counter(sum(c) for c in chunks)
    assert got["n_chunks"] == n_chunks
    assert got["mean_chunk_grams"] == round(
        sum(len(c) for c in chunks) / n_chunks, 6
    )
    assert got["max_chunk_grams"] == max(len(c) for c in chunks)
    assert got["distinct_chunks"] == len(sigs)
    assert got["dedup_ratio"] == round(1 - len(sigs) / n_chunks, 6)
    # content-defined shift robustness: prepending one token to a doc
    # leaves every chunk AFTER the first boundary identical
    text = next(iter(_docs().values()))
    hs = _gram_hashes(text)
    hs_shift = _gram_hashes("PREPENDED " + text)
    def cut(hseq):
        segs, cur = [], []
        for h in hseq:
            cur.append(h)
            if h % CDC_MOD == 0:
                segs.append(tuple(cur))
                cur = []
        if cur:
            segs.append(tuple(cur))
        return segs
    a, b = cut(hs), cut(hs_shift)
    if len(a) > 2 and len(b) > 2:
        assert a[1:] == b[(len(b) - len(a) + 1):]


def test_msttr_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.text import (
        MSTTR_SEG,
        q_msttr_diversity,
    )

    got = _row(q_msttr_diversity(spark, SF))
    ttrs = []
    for text in _docs().values():
        toks = [w for w in text.split(" ")]
        segs = defaultdict(list)
        for p, w in enumerate(toks):
            if w:
                segs[p // MSTTR_SEG].append(w)
        for seg in segs.values():
            if len(seg) == MSTTR_SEG:
                ttrs.append(len(set(seg)) / MSTTR_SEG)
    n = len(ttrs)
    m = sum(ttrs) / n
    sd = (sum((t - m) ** 2 for t in ttrs) / (n - 1)) ** 0.5
    assert got["n_segments"] == n
    assert got["msttr"] == round(m, 6)
    assert abs(got["ttr_sd"] - sd) < 1e-6
    assert got["min_ttr"] == round(min(ttrs), 6)
