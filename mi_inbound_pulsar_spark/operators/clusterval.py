"""Clustering-validity indices (round 9, continuation): the internal
quality gates a labeled-embedding pipeline runs after (re-)clustering —
variance-ratio (Calinski-Harabasz), scatter-vs-separation
(Davies-Bouldin), and worst-case separation (Dunn, centroid variant).
Complements ``q_simplified_silhouette`` (per-point readout) with the
three corpus-level scalars. Reference scope: the engine delegates all
processing to its injected pipeline
(PulsarMessageConsumer.java:535-545) — this IS that processing layer.

Plan shape shared by all three: per-(label, dim) centroid rollup
(posexplode + avg, k×64 rows, map-side combined), centroids
re-assembled into arrays and BROADCAST back onto the corpus, per-point
distances computed as an explicit left-to-right fold over the 64 dims
(``aggregate`` HOF in Spark, ``list_reduce`` in DuckDB — identical IEEE
op order, so the two engines agree to the last ulp before rounding),
then one aggregate per label. The corpus never shuffles except the
final k-row reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.sources.tables import load_table

EMB_DIM = 64

# shared oracle CTEs: centroids per label + per-point squared distance
_CENTS_SQL = f"""
    e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings
    ),
    dims AS (
      SELECT label, i AS dim, avg(emb[i]) AS m
      FROM e, unnest(range(1, {EMB_DIM + 1})) AS t(i)
      GROUP BY label, i
    ),
    cents AS (
      SELECT label AS c_label, list(m ORDER BY dim) AS cent,
             count(*) AS n_dims
      FROM dims GROUP BY label
    ),
    pts AS (
      SELECT e.vec_id, e.label,
             list_reduce(
               list_transform(range(1, {EMB_DIM + 1}),
                              i -> pow(e.emb[i] - c.cent[i], 2)),
               (a, b) -> a + b) AS d2
      FROM e JOIN cents c ON e.label = c.c_label
    )
"""


def _pts(spark: SparkSession, sf_dir: str):
    """(pts, cents): per-point squared distance to own centroid, and
    the k-row centroid frame with its array column."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    dims = (
        e.select(
            "label", F.posexplode("emb").alias("dim0", "v")
        )
        .groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg(F.avg("v").alias("m"))
    )
    cents = dims.groupBy(F.col("label").alias("c_label")).agg(
        F.expr("array_sort(collect_list(struct(dim, m)))").alias("sm")
    ).select(
        "c_label", F.expr("transform(sm, s -> s.m)").alias("cent")
    )
    fold = (
        f"aggregate(transform(sequence(1, {EMB_DIM}),"
        " i -> pow(element_at(emb, i) - element_at(cent, i), 2)),"
        " 0D, (a, x) -> a + x)"
    )
    pts = e.join(
        F.broadcast(cents), e["label"] == F.col("c_label")
    ).select("vec_id", "label", F.expr(fold).alias("d2"))
    return pts, cents


def _cent_dists(cents) -> DataFrame:
    """pairwise centroid distances over the k-row centroid frame."""
    a = cents.select(
        F.col("c_label").alias("la"), F.col("cent").alias("ca")
    )
    b = cents.select(
        F.col("c_label").alias("lb"), F.col("cent").alias("cb")
    )
    fold = (
        f"sqrt(aggregate(transform(sequence(1, {EMB_DIM}),"
        " i -> pow(element_at(ca, i) - element_at(cb, i), 2)),"
        " 0D, (a, x) -> a + x))"
    )
    return (
        a.join(F.broadcast(b), F.col("la") < F.col("lb"))
        .select("la", "lb", F.expr(fold).alias("m_ij"))
    )


_CDIST_SQL = f"""
    cdist AS (
      SELECT a.c_label AS la, b.c_label AS lb,
             sqrt(list_reduce(
               list_transform(range(1, {EMB_DIM + 1}),
                              i -> pow(a.cent[i] - b.cent[i], 2)),
               (x, y) -> x + y)) AS m_ij
      FROM cents a JOIN cents b ON a.c_label < b.c_label
    )
"""


# --------------------------------------------------------------------------
# Calinski-Harabasz variance-ratio criterion
# --------------------------------------------------------------------------
@query(
    "q_calinski_harabasz",
    oracle=f"""
    WITH {_CENTS_SQL},
    gc AS (
      SELECT i AS dim, avg(emb[i]) AS g
      FROM e, unnest(range(1, {EMB_DIM + 1})) AS t(i)
      GROUP BY i
    ),
    b AS (
      SELECT sum(cnt * d2g) AS ssb FROM (
        SELECT c.c_label,
               (SELECT count(*) FROM e WHERE e.label = c.c_label) AS cnt,
               list_reduce(
                 list_transform(range(1, {EMB_DIM + 1}),
                                i -> pow(c.cent[i] - gl.g[i], 2)),
                 (x, y) -> x + y) AS d2g
        FROM cents c, (SELECT list(g ORDER BY dim) AS g FROM gc) gl
      )
    ),
    w AS (
      SELECT sum(d2) AS ssw, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT label) AS BIGINT) AS k
      FROM pts
    )
    SELECT n AS n_points, k AS n_clusters,
           round(ssb, 6) AS ss_between,
           round(ssw, 6) AS ss_within,
           round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS ch_index
    FROM b, w
    """,
)
def q_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz variance-ratio criterion (1974) over the
    labeled embeddings: (SSB/(k−1))/(SSW/(n−k)) — how many times more
    between-cluster scatter there is than within, per degree of
    freedom; THE index sklearn reports as `calinski_harabasz_score`
    and the cheapest internal gate for "did this clustering find
    structure?" (higher = tighter, better-separated).

    Scale: SSW is the per-point fold distance aggregated once; SSB
    needs only the k centroids against the global mean — k·64
    arithmetic after the rollup. No point-pair, no point-centroid
    cross join.
    """
    pts, cents = _pts(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    gc = (
        e.select(F.posexplode("emb").alias("dim0", "v"))
        .groupBy((F.col("dim0") + 1).alias("dim"))
        .agg(F.avg("v").alias("g"))
        .agg(
            F.expr("array_sort(collect_list(struct(dim, g)))").alias("sg")
        )
        .select(F.expr("transform(sg, s -> s.g)").alias("g"))
    )
    counts = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy(F.col("label").alias("c_label"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fold = (
        f"aggregate(transform(sequence(1, {EMB_DIM}),"
        " i -> pow(element_at(cent, i) - element_at(g, i), 2)),"
        " 0D, (a, x) -> a + x)"
    )
    b = (
        cents.join(F.broadcast(counts), "c_label")
        .crossJoin(F.broadcast(gc))
        .select((F.col("cnt") * F.expr(fold)).alias("term"))
        .agg(F.sum("term").alias("ssb"))
    )
    w = pts.agg(
        F.sum("d2").alias("ssw"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("label").cast("long").alias("k"),
    )
    out = w.crossJoin(F.broadcast(b))
    n, k = F.col("n"), F.col("k")
    return out.select(
        n.alias("n_points"),
        k.alias("n_clusters"),
        F.round(F.col("ssb"), 6).alias("ss_between"),
        F.round(F.col("ssw"), 6).alias("ss_within"),
        F.round(
            (F.col("ssb") / (k - 1)) / (F.col("ssw") / (n - k)), 6
        ).alias("ch_index"),
    )


# --------------------------------------------------------------------------
# Davies-Bouldin index
# --------------------------------------------------------------------------
@query(
    "q_davies_bouldin",
    oracle=f"""
    WITH {_CENTS_SQL},
    {_CDIST_SQL},
    scat AS (
      SELECT label, avg(sqrt(d2)) AS s, CAST(count(*) AS BIGINT) AS n_i
      FROM pts GROUP BY label
    ),
    r AS (
      SELECT la AS label, (sa.s + sb.s) / cdist.m_ij AS r_ij
      FROM cdist JOIN scat sa ON sa.label = cdist.la
                 JOIN scat sb ON sb.label = cdist.lb
      UNION ALL
      SELECT lb, (sa.s + sb.s) / cdist.m_ij
      FROM cdist JOIN scat sa ON sa.label = cdist.la
                 JOIN scat sb ON sb.label = cdist.lb
    ),
    worst AS (SELECT label, max(r_ij) AS r_max FROM r GROUP BY label)
    SELECT CAST(count(*) AS BIGINT) AS n_clusters,
           round(avg(r_max), 6) AS db_index,
           round(max(r_max), 6) AS worst_pair_ratio
    FROM worst
    """,
)
def q_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin index (1979) over the labeled embeddings: for
    each cluster, the worst ratio (S_i + S_j)/‖c_i − c_j‖ of summed
    mean scatters to centroid separation, averaged over clusters —
    LOWER is better, and unlike Calinski-Harabasz it pinpoints WHICH
    pair is confusable (the `worst_pair_ratio` column). sklearn's
    `davies_bouldin_score`, identical definition.

    Scale: scatters are one per-label aggregate of the fold distance;
    the pairwise stage lives entirely on the k-row centroid frame
    (k² ≤ 100 rows) — the corpus is touched exactly once.
    """
    pts, cents = _pts(spark, sf_dir)
    scat = pts.groupBy("label").agg(F.avg(F.sqrt("d2")).alias("s"))
    cdist = _cent_dists(cents)
    sa = scat.select(F.col("label").alias("la"), F.col("s").alias("s_a"))
    sb = scat.select(F.col("label").alias("lb"), F.col("s").alias("s_b"))
    r_pairs = (
        cdist.join(F.broadcast(sa), "la")
        .join(F.broadcast(sb), "lb")
        .select(
            "la",
            "lb",
            ((F.col("s_a") + F.col("s_b")) / F.col("m_ij")).alias("r_ij"),
        )
    )
    r = r_pairs.select(F.col("la").alias("label"), "r_ij").unionByName(
        r_pairs.select(F.col("lb").alias("label"), "r_ij")
    )
    worst = r.groupBy("label").agg(F.max("r_ij").alias("r_max"))
    return worst.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.round(F.avg("r_max"), 6).alias("db_index"),
        F.round(F.max("r_max"), 6).alias("worst_pair_ratio"),
    )


# --------------------------------------------------------------------------
# Dunn index (centroid variant)
# --------------------------------------------------------------------------
@query(
    "q_dunn_index",
    oracle=f"""
    WITH {_CENTS_SQL},
    {_CDIST_SQL},
    radii AS (
      SELECT label, 2 * max(sqrt(d2)) AS diam
      FROM pts GROUP BY label
    )
    SELECT CAST((SELECT count(*) FROM radii) AS BIGINT) AS n_clusters,
           round((SELECT min(m_ij) FROM cdist), 6) AS min_separation,
           round((SELECT max(diam) FROM radii), 6) AS max_diameter,
           round((SELECT min(m_ij) FROM cdist)
                 / (SELECT max(diam) FROM radii), 6) AS dunn_index
    """,
)
def q_dunn_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn index, centroid variant: minimum inter-centroid separation
    over the maximum cluster diameter (bounded as 2× the largest
    point-to-own-centroid radius) — the WORST-CASE validity index
    (higher is better): one overlapping pair or one sprawling cluster
    tanks it no matter how good the average looks, which is exactly
    the property ``q_davies_bouldin``'s mean smooths away. The
    centroid bound replaces original Dunn's O(n²) point-pair
    diameter/separation with radius arithmetic — the only form that
    scales (and a 2-approximation of the true diameter by the
    triangle inequality, stated here as the contract).

    Scale: one per-label max over the fold distances + the k²
    centroid grid. Nothing quadratic in points.
    """
    pts, cents = _pts(spark, sf_dir)
    radii = pts.groupBy("label").agg(
        (2 * F.max(F.sqrt("d2"))).alias("diam")
    )
    cdist = _cent_dists(cents)
    sep = cdist.agg(F.min("m_ij").alias("min_sep"))
    diam = radii.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.max("diam").alias("max_diam"),
    )
    out = diam.crossJoin(F.broadcast(sep))
    return out.select(
        "n_clusters",
        F.round(F.col("min_sep"), 6).alias("min_separation"),
        F.round(F.col("max_diam"), 6).alias("max_diameter"),
        F.round(F.col("min_sep") / F.col("max_diam"), 6).alias(
            "dunn_index"
        ),
    )
