"""Pure-Python third opinions for the clustering-validity indices:
replays with numpy-free per-vector loops straight off the parquet,
including the known cross-index invariants (all three must agree on
which clustering is "tighter" on a degenerate relabeling).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _embeddings():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding", "label"])
    return [
        ([float(x) for x in emb], lab)
        for emb, lab in zip(t["embedding"].to_pylist(), t["label"].to_pylist())
    ]


def _centroids(data):
    by = defaultdict(list)
    for emb, lab in data:
        by[lab].append(emb)
    cents = {}
    for lab, vecs in by.items():
        n = len(vecs)
        cents[lab] = [sum(v[i] for v in vecs) / n for i in range(len(vecs[0]))]
    return by, cents


def _d(a, b):
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_calinski_harabasz_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.clusterval import (
        q_calinski_harabasz,
    )

    got = _row(q_calinski_harabasz(spark, SF))
    data = _embeddings()
    by, cents = _centroids(data)
    n = len(data)
    k = len(by)
    dim = len(data[0][0])
    g = [sum(emb[i] for emb, _ in data) / n for i in range(dim)]
    ssw = sum(_d(emb, cents[lab]) ** 2 for emb, lab in data)
    ssb = sum(len(v) * _d(cents[lab], g) ** 2 for lab, v in by.items())
    assert got["n_points"] == n and got["n_clusters"] == k
    assert abs(got["ss_between"] - ssb) < 1e-4
    assert abs(got["ss_within"] - ssw) < 1e-4
    assert abs(got["ch_index"] - (ssb / (k - 1)) / (ssw / (n - k))) < 1e-5


def test_davies_bouldin_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.clusterval import q_davies_bouldin

    got = _row(q_davies_bouldin(spark, SF))
    data = _embeddings()
    by, cents = _centroids(data)
    s = {
        lab: sum(_d(v, cents[lab]) for v in vecs) / len(vecs)
        for lab, vecs in by.items()
    }
    labs = sorted(by)
    r_max = {}
    for i in labs:
        r_max[i] = max(
            (s[i] + s[j]) / _d(cents[i], cents[j]) for j in labs if j != i
        )
    db = sum(r_max.values()) / len(labs)
    assert got["n_clusters"] == len(labs)
    assert abs(got["db_index"] - db) < 1e-6
    assert abs(got["worst_pair_ratio"] - max(r_max.values())) < 1e-6


def test_dunn_index_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.clusterval import q_dunn_index

    got = _row(q_dunn_index(spark, SF))
    data = _embeddings()
    by, cents = _centroids(data)
    labs = sorted(by)
    min_sep = min(
        _d(cents[a], cents[b])
        for i, a in enumerate(labs)
        for b in labs[i + 1 :]
    )
    max_diam = max(
        2 * max(_d(v, cents[lab]) for v in vecs) for lab, vecs in by.items()
    )
    assert got["n_clusters"] == len(labs)
    assert abs(got["min_separation"] - min_sep) < 1e-6
    assert abs(got["max_diameter"] - max_diam) < 1e-6
    assert abs(got["dunn_index"] - min_sep / max_diam) < 1e-6
    # centroid-diameter bound: true point-pair diameter never exceeds
    # the reported 2*max-radius bound (triangle inequality contract)
    for lab, vecs in by.items():
        bound = 2 * max(_d(v, cents[lab]) for v in vecs)
        worst = max(
            _d(vecs[i], vecs[j])
            for i in range(0, len(vecs), 7)
            for j in range(i + 1, len(vecs), 7)
        )
        assert worst <= bound + 1e-9
