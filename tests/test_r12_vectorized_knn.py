"""Round-12 optimization pin: the vectorized block-kNN partial top-k
(one int64 composite key + argpartition per block pair, replacing the
per-row lexsort loop) must produce the EXACT kNN edge set — same
(rounded-sim DESC, neighbor_id ASC) ranking — as a brute-force numpy
reference over the whole corpus.
"""

from __future__ import annotations

import numpy as np


def test_knn_self_join_matches_brute_force(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.similarity import (
        MUTUAL_KNN_K,
        knn_self_join,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    m = m / n
    sims = np.round(m @ m.T, 6)

    expected = set()
    for qi in range(len(ids)):
        cand = [(float(-sims[qi, j]), int(ids[j])) for j in range(len(ids)) if j != qi]
        cand.sort()
        for _, nb in cand[:MUTUAL_KNN_K]:
            expected.add((int(ids[qi]), nb))

    got = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_self_join(e, k=MUTUAL_KNN_K).collect()
    }
    assert got == expected
