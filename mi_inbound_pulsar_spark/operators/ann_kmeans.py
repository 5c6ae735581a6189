"""k-means-trained IVF: the production ANN index path.

``q_ann_ivf_topk`` (similarity.py) uses deterministic stride centroids
so a DuckDB oracle can replay the index exactly. This module adds the
real thing: spherical k-means centroids trained with a *distributed*
Lloyd's iteration, then the identical assign → probe → rerank shape.
k-means is iterative and not SQL-expressible, so the query registers
without an oracle (driver records a rows-only check); recall against
the exact brute-force top-k is gated in tests/test_ann_kmeans.py.

Scale design (the 100 TB shape):
- Training never shuffles the corpus and never collects it. Each
  Lloyd's iteration is ONE narrow pass: ``mapInPandas`` computes, per
  Arrow batch, the per-cell partial (count, sum-vector) with a numpy
  GEMM argmax; only k × n_partitions tiny partial rows come back to
  the driver, which reduces them (k × 64 floats) and re-broadcasts.
  This is the classic partial-aggregate pattern — identical cost shape
  to Spark's own map-side combine.
- On a real cluster you train on a sampled corpus (``sample_frac``)
  — sampling is a narrow op too.
- Serving reuses :func:`similarity.ivf_assign_cells` /the probe join,
  so the serving plan is byte-for-byte the oracle-checked one; only
  the centroid matrix differs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.operators.similarity import (
    N_PROBE,
    N_QUERIES,
    SCORE_SCHEMA,
    TOP_K,
    _collect_matrix,
    _unit_rows,
    ivf_assign_cells,
)
from mi_inbound_pulsar_spark.sources.tables import load_table

K_CELLS = 16
N_ITER = 8


def train_spherical_kmeans(
    corpus: DataFrame,
    k: int = K_CELLS,
    n_iter: int = N_ITER,
    sample_frac: float | None = None,
) -> np.ndarray:
    """Train unit-norm centroids with distributed Lloyd's iterations.

    Returns a (k, dim) float64 matrix of L2-normalized centroids.
    Deterministic: init is the first k distinct vectors by vec_id, and
    every iteration is an exact (order-independent up to fp summation)
    partial-sum reduce.
    """
    vecs = corpus.select("vec_id", "embedding")
    if sample_frac is not None:
        vecs = vecs.sample(fraction=sample_frac, seed=7)

    init_ids, init_mat = _collect_matrix(
        vecs.orderBy("vec_id").limit(k), "vec_id", "embedding"
    )
    _, centroids = _unit_rows(init_ids, init_mat)
    sc = corpus.sparkSession.sparkContext

    partial_schema = "cell long, cnt long, vec_sum array<double>"
    for _ in range(n_iter):
        cent_bc = sc.broadcast(centroids)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents = cent_bc.value
            acc_cnt = np.zeros(len(cents), dtype=np.int64)
            acc_sum = np.zeros_like(cents)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                norms[norms == 0.0] = 1.0
                units = mat / norms
                best = np.argmax(units @ cents.T, axis=1)
                acc_cnt += np.bincount(best, minlength=len(cents))
                np.add.at(acc_sum, best, units)
            cells = np.nonzero(acc_cnt)[0]
            if cells.size == 0:
                # empty partition: yield NOTHING. An empty frame here
                # is fatal, not merely wasteful — pandas infers the
                # empty "vec_sum" list column as dtype float64 and
                # Arrow cannot convert a float64 ndarray (even a
                # 0-row one) to list<double>. Empty input partitions
                # are routine at cluster scale (file-split alignment,
                # AQE-coalesced shuffles); found by the round-12
                # sf1.0 wide scaling run.
                return
            yield pd.DataFrame(
                {
                    "cell": cells.astype(np.int64),
                    "cnt": acc_cnt[cells],
                    "vec_sum": list(acc_sum[cells]),
                }
            )

        rows = vecs.mapInPandas(partials, schema=partial_schema).collect()
        cent_bc.destroy()
        new_cnt = np.zeros(len(centroids), dtype=np.int64)
        new_sum = np.zeros_like(centroids)
        for r in rows:
            new_cnt[r.cell] += r.cnt
            new_sum[r.cell] += np.asarray(r.vec_sum, dtype=np.float64)
        moved = new_cnt > 0
        next_c = centroids.copy()
        next_c[moved] = new_sum[moved]  # empty cells keep their old centroid
        norms = np.linalg.norm(next_c, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        centroids = next_c / norms
    return centroids


def q_ann_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat top-5 over k-means centroids (the production index).

    Same assign → probe → rerank plan as the oracle-checked
    ``q_ann_ivf_topk``; only the centroid matrix is trained instead of
    strided. Recall vs brute force is gated in tests/test_ann_kmeans.py.

    Library API, not a registered query: the raw (query, neighbor, sim)
    dump depends on trained centroids (not SQL-expressible), so its
    driver-facing evidence is the bounded ``q_ann_kmeans_recall`` twin
    below — registering the dump would only add a rows-only entry with
    no oracle signal.
    """
    e = load_table(spark, sf_dir, "embeddings")
    centroids = train_spherical_kmeans(e)
    cent_ids = np.arange(len(centroids), dtype=np.int64)

    assigned = ivf_assign_cells(e, cent_ids, centroids)

    q_ids, q_mat = _collect_matrix(
        e.filter(F.col("vec_id") < N_QUERIES), "vec_id", "embedding"
    )
    q_ids, q_units = _unit_rows(q_ids, q_mat)
    probe_sims = q_units @ centroids.T
    probe_rows = [
        (int(q_ids[qi]), int(cent_ids[ci]))
        for qi in range(len(q_ids))
        for ci in np.lexsort((cent_ids, -probe_sims[qi]))[:N_PROBE]
    ]
    probes = F.broadcast(spark.createDataFrame(probe_rows, "query_id long, cell long"))
    candidates = assigned.join(probes, "cell").select("query_id", "vec_id", "embedding")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qidx = {int(q): i for i, q in enumerate(q_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            _, c_units = _unit_rows(c_ids, c_mat)
            qs = pdf["query_id"].to_numpy(dtype=np.int64)
            qrows = q_units[[qidx[int(q)] for q in qs]]
            sims = np.einsum("ij,ij->i", qrows, c_units)
            keep = c_ids != qs
            yield pd.DataFrame(
                {"query_id": qs[keep], "neighbor_id": c_ids[keep], "sim": sims[keep]}
            )

    scored = candidates.mapInPandas(score, schema=SCORE_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


@query(
    "q_ann_kmeans_recall",
    oracle=f"""
    SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
           true AS recall_ok
    FROM embeddings WHERE vec_id < {N_QUERIES}
    """,
)
def q_ann_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-oracle form of the trained-index path: top-5 recall of
    the k-means IVF against the exact brute-force top-5, emitted as a
    driver-hashable boolean (observed 0.86-0.90; gated at ≥ 0.8).
    Training is seeded and Lloyd's is deterministic on this data, so
    the flag is stable — the same technique that made the HLL and
    t-digest sketches hash-checkable (exact twin + tolerance claim).
    """
    approx = q_ann_kmeans_topk(spark, sf_dir).select("query_id", "neighbor_id")
    e = load_table(spark, sf_dir, "embeddings")
    from mi_inbound_pulsar_spark.operators.similarity import brute_force_topk

    exact = brute_force_topk(e, e.filter(F.col("vec_id") < N_QUERIES)).select(
        "query_id", "neighbor_id"
    )
    n_hit = approx.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("hits")
    )
    totals = exact.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("query_id").alias("n_queries"),
    )
    return totals.crossJoin(n_hit).select(
        "n_queries", (F.col("hits") / F.col("n_exact") >= 0.8).alias("recall_ok")
    )
