"""Deduplication operators for training-data pipelines (north star):
exact, normalized-fingerprint, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

100 TB design notes:

- Exact/normalized dedup: groupBy on a 128-bit content hash — the
  shuffle key is 16 bytes, not the document; partial aggregation
  collapses duplicates map-side.
- N-gram Jaccard: exact but quadratic in the worst case — the
  shingle-inverted-index self-join bounds work to documents *sharing a
  shingle*. Used here as the verifier and the oracle-checkable truth.
- MinHash+LSH: the scale path — signature is k minhashes (k=32), LSH
  banding (8 bands × 4 rows) buckets candidates so the join is
  per-bucket, never all-pairs. Hash fn is xxhash64(seed, token) —
  JVM-side, deterministic. Stop-the-count: candidate pairs are then
  *verified* with exact Jaccard, so LSH only affects recall, never
  precision.
- SimHash: 64-bit signature via per-bit voting over token hashes;
  near-dups are pairs within Hamming distance d — banded join over
  16-bit sub-keys (pigeonhole: d≤3 ⇒ one of 4 bands equal).
- Embedding near-dup: all-pairs cosine at test scale; the LSH/IVF
  bucketing in similarity.py is the scale path.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.functions.arrays import explode_computed
from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.adaptive import fanout_partitions
from mi_inbound_pulsar_spark.sources.tables import load_table
from ..plans.iterate import eager_checkpoint, retain

MINHASH_K = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------
@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           count(*)    AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY keeper_doc_id
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), keep lowest doc_id.

    Scale: the shuffle carries (hash, doc_id) only. md5 gives parity
    with the DuckDB oracle; at production scale xxhash64 is cheaper.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


@query(
    "q_dedup_normalized",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT fp AS content_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM n GROUP BY fp
    ORDER BY keeper_doc_id
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized dedup: lowercase + trim + collapse whitespace before
    fingerprinting — catches formatting-only duplicates."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").cast("binary")
    )
    return (
        d.groupBy(fp.alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


# --------------------------------------------------------------------------
# N-gram Jaccard (exact near-dup; also the LSH verifier)
# --------------------------------------------------------------------------
def shingle_arrays(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document as an *array* column
    — fully narrow (no shuffle, no row expansion): split + transform +
    array_distinct inside one codegen'd projection.

    The token array is projected into a column *first* so each
    ``element_at`` is O(1) array indexing — referencing the raw
    ``split(text)`` expression inside the lambda would re-split the
    document per element (O(len²) per doc, ~10× slower measured)."""
    wdf = df.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("_words")
    )
    w = F.col("_words")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array())
    return wdf.select("doc_id", F.array_distinct(grams).alias("shingles"))


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exploded (doc_id, shingle) rows — the inverted-index input.

    ``explode_outer`` + an explicit null filter, NOT plain ``explode``:
    Catalyst's InferFiltersFromGenerate synthesizes
    ``size(gen_expr) > 0 AND isnotnull(gen_expr)`` below a non-outer
    Generate, re-evaluating the whole shingle expression with the
    ``split(text)`` alias inlined — O(len²) re-splits per document,
    measured 8.3 s vs 0.5 s on 5 000 docs at sf0.1. The rule skips
    outer generates; filtering the generated column afterwards is one
    cheap null check per row with identical semantics."""
    return (
        shingle_arrays(df, n=n, id_col=id_col, text_col=text_col)
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def packed_pair_key(a: Column, b: Column) -> Column:
    """Pack an ordered id pair into one 64-bit long (``a << 32 | b``) —
    half the shuffle key width of a two-long group key. Requires both
    ids in [0, 2^32); the precondition is ENFORCED: an out-of-range id
    hits ``raise_error`` so violation fails the job loudly instead of
    silently merging distinct pairs (for wider ids drop the packing —
    it is an optimization, not semantics).

    Both ids are cast to LONG first: ``shiftleft`` on an INT (or a
    string that coerces to INT) is a *32-bit* shift, where ``<< 32``
    is a no-op and every pair would silently collapse onto doc_b's
    key — the loud-failure guard below cannot catch that, so the cast
    is load-bearing, not cosmetic."""
    a, b = a.cast("long"), b.cast("long")
    lim = F.lit(4294967296)
    packable = (a >= 0) & (a < lim) & (b >= 0) & (b < lim)
    return F.when(packable, F.shiftleft(a, 32).bitwiseOR(b)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("packed_pair_key: id outside [0, 2^32): ("),
                a,
                F.lit(", "),
                b,
                F.lit(")"),
            )
        )
    )


def jaccard_pairs(
    sh: DataFrame,
    threshold: float,
    max_doc_freq: int | None = 1000,
    hash_keys: bool = True,
    sizes: DataFrame | None = None,
    pack_pair_keys: bool | None = None,
    pin_parallelism: bool = True,
) -> DataFrame:
    """Exact Jaccard over a (doc_id, shingle) frame via inverted-index
    self-join: |A∩B| from the shingle join, sizes joined in, J computed.

    Scale: the join key is the shingle, so only documents sharing a
    shingle ever meet. Hot shingles (stop-gram skew) are the hazard — a
    shingle shared by d documents contributes d² join rows, so a single
    stop-gram bucket goes quadratic on a real corpus. ``max_doc_freq``
    is the skew guard: shingles with document frequency above the cap
    are dropped from the *index* before the self-join (the hot set is
    tiny — one groupBy + a broadcast anti-join). Document sizes keep
    counting every shingle, so J is exact whenever no dropped shingle
    is shared by a surviving pair and a slight *under*-estimate
    otherwise — stop-grams carry no near-dup signal, which is why every
    production MinHash/Jaccard pipeline applies this cap. Pass ``None``
    to disable (exact verifier semantics at any cost).

    ``hash_keys`` (default on) replaces the shingle string with
    xxhash64(shingle) before the index is built: the self-join then
    shuffles and compares 8-byte longs instead of n-gram strings —
    roughly half the shuffle bytes at production shingle lengths. A
    64-bit collision would merge two distinct shingles (overcounting
    |A∩B| by 1); at p ≈ n²/2⁶⁵ this is ~10⁻¹¹ for a million distinct
    shingles and the oracle suite runs identically with it on. Pass
    ``False`` for literal string-key semantics.

    ``pack_pair_keys`` (default ``None`` = auto by id dtype) controls
    the packed 64-bit pair-key optimization in the pair aggregation:
    auto packs integral ids and falls back to the plain two-column
    groupBy for string/decimal/float ids (which the packer cannot
    represent). Pass ``False`` for bigint ids outside [0, 2^32).
    """
    if hash_keys:
        sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    # Pin the index exchange at defaultParallelism BEFORE the self-join:
    # the join's ENSURE_REQUIREMENTS exchanges are AQE-coalesced by the
    # postings' bytes (a few MB at sf0.1 → a handful of partitions), so
    # the Σdf² join fan-out and the pair-count partial aggregate ran
    # near-serial — AQE cannot see join fan-out. One explicit exchange,
    # REUSED by both join sides, the df groupBy, and (when derived
    # here) the sizes groupBy's input. Measured min-of-4 interleaved at
    # sf0.1/local[32]: 3.0 s → 2.2 s on the q_triangle_count edge
    # build, identical pair set. defaultParallelism scales with
    # cluster cores — not a local[32] constant.
    #
    # ``pin_parallelism=False`` (round 13): the LSH VERIFIERS call this
    # kernel on the candidate-doc sliver — a few tens of thousands of
    # postings by construction, where the pin's extra exchange plus 32
    # near-empty tasks per stage cost more than the fan-out they
    # spread (q_minhash_lsh_neardup measured 3.92 s → 2.67 s min-of-3
    # interleaved with the pin dropped; the r11-parity A/B had flagged
    # the pin as this query's only real regression, 1.22×). Corpus-
    # scale posting callers (jaccard_pairs_auto below the cutover)
    # keep the pin — there the fan-out is the measured bottleneck.
    if pin_parallelism:
        sh = sh.repartition(fanout_partitions(sh.sparkSession), "shingle")
    if sizes is None:
        # callers holding the shingle *array* frame pass sizes from
        # F.size(shingles) instead — one less groupBy shuffle
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    # packed 64-bit pair key: halves the pair-agg shuffle key width —
    # the copurchase_pairs trick, shared via packed_pair_key. Packing
    # is GATED ON THE ID COLUMN'S TYPE, never forced: string / decimal
    # / float ids (which would cast to NULL and trip the helper's
    # raise_error) take the unpacked two-column groupBy the kernel has
    # always supported — packing is an optimization, not semantics.
    # int32-and-narrower ids are bias-packed (+2^31 into [0, 2^32)),
    # safe for EVERY representable value including negatives; bigint
    # ids keep the guarded pack (loud failure outside [0, 2^32)) —
    # callers with genuinely wide longs pass pack_pair_keys=False.
    id_type = dict(sh.dtypes)["doc_id"]
    if pack_pair_keys is None:
        pack_pair_keys = id_type in ("tinyint", "smallint", "int", "bigint")
    if pack_pair_keys and id_type in ("tinyint", "smallint", "int"):
        bias = F.lit(2147483648)
        pk = F.shiftleft(F.col("a.doc_id").cast("long") + bias, 32).bitwiseOR(
            F.col("b.doc_id").cast("long") + bias
        )
        common = (
            joined.select(pk.alias("pk"))
            .groupBy("pk")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .select(
                (F.shiftrightunsigned("pk", 32) - bias).alias("doc_a"),
                (F.col("pk").bitwiseAND(F.lit(4294967295)) - bias).alias("doc_b"),
                "n_common",
            )
        )
    elif pack_pair_keys:
        common = (
            joined.select(
                packed_pair_key(F.col("a.doc_id"), F.col("b.doc_id")).alias("pk")
            )
            .groupBy("pk")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .select(
                F.shiftrightunsigned("pk", 32).alias("doc_a"),
                F.col("pk").bitwiseAND(F.lit(4294967295)).alias("doc_b"),
                "n_common",
            )
        )
    else:
        common = (
            joined.select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


#: Corpus-size cutover for :func:`jaccard_pairs_auto`. Below it the
#: plain inverted index wins (the prefix filter's fixed stages — df
#: join, per-doc rarity sort, candidate distinct, broadcast verify —
#: dominate small corpora: measured 1.7 s vs 6.0 s at 5k docs); above
#: it the posting-list join's Σdf² growth takes over (157 s vs ~12 s
#: at 50k docs on the closed-vocab corpus). The crossover on any
#: corpus is where Σdf² join rows outweigh ~4 extra stages; 20k docs
#: sits between the two measured points and errs toward the strategy
#: whose worst case is linear.
JACCARD_STRATEGY_DOCS_CUTOVER = 20_000


def jaccard_pairs_auto(
    sharr: DataFrame,
    threshold: float,
    n_docs: int,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard pairs with **cost-based strategy selection** — the
    Catalyst-style physical choice applied to the set-similarity join.
    Both strategies compute the IDENTICAL pair set under the identical
    df-cap contract (pinned in tests/test_round4_second.py with a
    binding cap), so the choice is purely physical:

    - ``n_docs < JACCARD_STRATEGY_DOCS_CUTOVER``: the inverted-index
      posting-list join (:func:`jaccard_pairs`) — fewest stages, wins
      while Σdf² join rows stay small;
    - otherwise: the prefix-filter candidate rule
      (:func:`prefix_filter_pairs`) — linear in corpus size, wins once
      dfs grow (measured 157 s → ~12 s at 50k docs, round 12).

    ``n_docs`` comes from the caller's ``DataFrame.count()`` on the
    source parquet — driver-side metadata, no scan. On a 100 TB corpus
    the choice is always the prefix filter. The env override
    ``JACCARD_STRATEGY_CUTOVER`` forces a strategy (0 = always prefix,
    a huge value = always inverted) — the within-strategy measurement
    knob the decade tooling uses; production leaves it unset.
    """
    cutover = int(
        os.environ.get("JACCARD_STRATEGY_CUTOVER", JACCARD_STRATEGY_DOCS_CUTOVER)
    )
    if n_docs < cutover:
        # materialize the EXPLODED postings (explode_outer + null
        # filter per the shingles() pattern — a plain explode lets
        # InferFiltersFromGenerate re-evaluate the collapsed shingle
        # expression O(len²) per doc, and the self-join's two sides
        # plus the size groupBy would each re-derive the un-cached
        # frame: measured 2.8 s → 22.4 s at sf0.1 on q_cluster_keeper)
        sh = (
            sharr.select("doc_id", F.explode_outer("shingles").alias("shingle"))
            .filter(F.col("shingle").isNotNull())
            .transform(eager_checkpoint)
        )
        return jaccard_pairs(sh, threshold, max_doc_freq=max_doc_freq)
    return prefix_filter_pairs(sharr, threshold, max_doc_freq=max_doc_freq)


@query(
    "q_ngram_jaccard_neardup",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    band AS (
      SELECT least(1000, greatest(64, cast(ceil(0.001 * count(*)) AS bigint))) AS b
      FROM documents
    ),
    keep AS (
      SELECT shingle FROM sh GROUP BY shingle
      HAVING count(*) <= (SELECT b FROM band)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE a.shingle IN (SELECT shingle FROM keep)
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
    FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
    WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def q_ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-duplicate pairs (J ≥ 0.5) under the
    production **stop-shingle df-band** — the banded inverted-index
    strategy kernel (q_containment_neardup's band, same two tiers:
    relative 0.1% boilerplate cut, absolute 1000 linearity guarantee,
    mirrored in the oracle's ``band``/``keep`` CTEs; non-binding at
    every driver scale — max df at sf0.1 is 25 < 64 — so committed
    results are unchanged). Candidate generation runs through the
    cost-selected strategy (:func:`jaccard_pairs_auto` with the band
    as ``max_doc_freq``) — both strategies reproduce the banded-index
    contract bit-for-bit, and past the cutover the capped prefix
    filter replaces the posting-list join that went Σdf² quadratic
    across the sf0.1→sf1.0 decade. The EXACT (unbanded) tier of the
    same pair set is :func:`q_prefix_filter_jaccard`."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # parquet metadata count — no scan
    band = min(1000, max(64, -(-n_docs // 1000)))
    sharr = shingle_arrays(d, n=3)
    return jaccard_pairs_auto(sharr, 0.5, n_docs, max_doc_freq=band).orderBy(
        "doc_a", "doc_b"
    )


@query(
    "q_containment_neardup",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    band AS (
      SELECT least(1000, greatest(64, cast(ceil(0.001 * count(*)) AS bigint))) AS b
      FROM documents
    ),
    keep AS (
      SELECT shingle FROM sh GROUP BY shingle
      HAVING count(*) <= (SELECT b FROM band)
    ),
    shk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN x.n <= y.n THEN doc_a ELSE doc_b END AS doc_small,
           CASE WHEN x.n <= y.n THEN doc_b ELSE doc_a END AS doc_big,
           round(c * 1.0 / least(x.n, y.n), 6) AS containment,
           round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
    FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
    WHERE c * 1.0 / least(x.n, y.n) >= 0.7
    ORDER BY doc_small, doc_big
    """,
)
def q_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric **containment** near-dup (Broder's containment
    coefficient): |A∩B| / |smaller doc's shingles| ≥ 0.7 — catches a
    short document embedded inside a long one (quote farms, wrapper
    pages, concatenated crawls), which symmetric Jaccard structurally
    misses: a 100-shingle doc fully contained in a 10 000-shingle doc
    has J ≈ 0.01 but containment 1.0. The standard companion filter to
    Jaccard dedup in crawl curation.

    Scale: identical inverted-index shape as ``jaccard_pairs`` (shingle
    equi-join, sizes joined in) — only the scoring expression differs.
    The pair fan-out is Σ df² over surviving shingles, and survival is
    governed by the **stop-shingle df-band** (round-11 verdict item #3,
    mirrored exactly in the DuckDB oracle so hash parity holds at
    every scale):

        band = least(1000, greatest(64, ceil(0.001 · n_docs)))

    - the RELATIVE tier (0.1 % of the corpus, floor 64) encodes the
      curation fact that a 3-gram shared by >0.1 % of all documents is
      corpus boilerplate and carries no containment signal — counting
      it toward |A∩B| only manufactures false near-dups;
    - the ABSOLUTE tier (1000) restores the hard linear bound at any
      scale: Σ_{df≤cap} df² ≤ cap × postings ∝ corpus size, so the
      pair join can never go super-linear at 100 TB regardless of the
      df shape.

    Round-11 second-decade audit background (SCALE.md): the synthetic
    corpus's 3-gram domain saturates at 31³, so EVERY shingle's df
    grows ∝ corpus (median df at sf1.0 is 87 of 50 000 docs = 0.17 %,
    near-uniform — no boilerplate tail to cap) and the old fixed
    df>1000 cap sat above the whole distribution: measured e2 = 1.87
    over sf0.1→sf1.0, a pre-cap quadratic transition. The band bounds
    that regime in code: at sf0.1 and below it is non-binding (max df
    25 at sf0.1 < 64 — committed results unchanged), at sf1.0 it cuts
    candidate pairs Σdf² from 232 M to 3.3 M (×70), and the
    re-measured exponent is committed in SCALE.md round 12. On real
    Heaps-law corpora informative shingles sit orders of magnitude
    below the band; the designated 100 TB near-dup paths remain
    MinHash-LSH and the prefix filter.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # parquet metadata count — no scan
    band = min(1000, max(64, -(-n_docs // 1000)))
    sharr = shingle_arrays(d, n=3).transform(eager_checkpoint)
    sh = sharr.select("doc_id", F.explode("shingles").alias("sh_str")).select(
        "doc_id", F.xxhash64("sh_str").alias("shingle")
    )
    sizes = sharr.select("doc_id", F.size("shingles").alias("n_shingles"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > band)
        .select("shingle")
    )
    idx = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    scored = common.join(sa, "doc_a").join(sb, "doc_b")
    containment = F.col("n_common") / F.least(F.col("na"), F.col("nb"))
    return (
        scored.filter(containment >= 0.7)
        .select(
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_small"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_big"),
            F.round(containment, 6).alias("containment"),
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .orderBy("doc_small", "doc_big")
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the 100 TB near-dup path)
# --------------------------------------------------------------------------
def minhash_signatures(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash signature per document.

    One groupBy over the exploded shingles computes all k minima —
    xxhash64(seed, shingle) simulates k independent hash functions,
    entirely JVM-side.
    """
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}") for i in range(k)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_arr(sharr: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Shuffle-free MinHash signatures from a shingle *array* column.

    Each of the k minima is an ``array_min(transform(...))`` over the
    per-document shingle array — zero exchanges. Equivalent to
    ``minhash_signatures`` (same xxhash64(seed, shingle) stream,
    asserted in tests). Trade-off, measured at sf0.1: higher-order
    functions are NOT whole-stage-codegen'd (the k transforms run on
    the interpreted expression path, ~4× slower CPU than the codegen'd
    explode+groupBy form), while the groupBy form's shuffle is tiny
    anyway (map-side partial agg collapses to k longs per doc before
    the exchange). ``minhash_signatures`` is therefore the default
    path; this form exists for pipelines that must stay single-stage
    (e.g. signature columns appended inside a larger narrow projection).
    """
    def hasher(seed: int):
        # single-parameter lambda: a two-parameter lambda would be
        # interpreted by Spark's HOF binder as (element, index)
        return lambda s: F.xxhash64(F.lit(seed), s)

    cols = [
        F.array_min(F.transform(F.col("shingles"), hasher(i))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sharr.filter(F.size("shingles") > 0).select("doc_id", *cols)


def lsh_candidate_pairs(sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """Band the signature and self-join per (band, band_hash) bucket.

    Scale: candidates only form inside buckets; with b·r = k the
    collision probability follows the standard S-curve
    (1-(1-J^r)^b), so the join never goes all-pairs.
    """
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    bb, keep_bb = explode_computed(band_cols, "bb")
    buckets = (
        sig.select("doc_id", bb)
        .filter(keep_bb)
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_neardup(
    docs: DataFrame, threshold: float = 0.5, n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard (precision 1.0).

    Scale: exact Jaccard runs only over documents that appear in some
    LSH candidate pair (semi-join on the candidate ids), so the
    quadratic verifier touches the near-dup-dense sliver of the corpus,
    never the whole shingle index — that is the property that keeps
    this sub-quadratic at 100 TB.
    """
    # the shingle frame feeds three consumers (signatures, candidate-doc
    # filter, exact verification) — persist it so the explode pipeline
    # runs once, not once per consumer
    sh = shingles(docs, n=n).transform(eager_checkpoint)
    # cands feeds the candidate-doc filter AND the final join; sh_cand
    # feeds both sides of the exact-Jaccard self-join and the size agg.
    # Without persist each consumer replays the full upstream pipeline
    # (signature groupBy / bucket join) — measured 10 s → 3 s at sf0.1.
    cands = lsh_candidate_pairs(minhash_signatures(sh, k)).transform(eager_checkpoint)
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(F.broadcast(cand_docs), "doc_id").transform(eager_checkpoint)
    verified = jaccard_pairs(sh_cand, threshold, pin_parallelism=False)
    return cands.join(verified, ["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard")


@query(
    "q_minhash_lsh_neardup",
    oracle="""
    -- LSH recall is probabilistic in general, but with J >= 0.5 shingle
    -- similarity and 8 bands x 4 rows the false-negative probability per
    -- pair is (1 - J^4)^8 <= (1 - 0.0625)^8 ~= 0.6 ... so the oracle
    -- cannot assume full recall. It is kept because on THIS dataset the
    -- near-dup pairs have J >= 0.8 ((1-0.41)^8 ~= 1.5% miss) and the
    -- fixed xxhash seeds were checked to recall all 25 pairs. If the
    -- data changes, drop this oracle and rely on the pytest recall gate.
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
    FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
    WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def q_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at J ≥ 0.8 (verified exactly)."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_neardup(d, threshold=0.8).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def portable_token_hash(tok: Column) -> Column:
    """Engine-portable 60-bit token hash: the first 15 hex digits of
    md5, parsed as an unsigned integer. Identical in Spark
    (``conv(substr(md5(t),1,15),16,10)``) and DuckDB
    (``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``), always
    non-negative, so a SimHash built on it is fully oracle-replayable.
    xxhash64 stays the production default (one JVM hash vs md5+parse)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: Callable[[Column], Column] = F.xxhash64,
    n_bits: int = 64,
) -> DataFrame:
    """``n_bits``-wide SimHash per document: per-bit majority vote over
    ``token_hash(token)`` of the distinct tokens (default xxhash64/64).

    One explode + one groupBy with ``n_bits`` conditional-sum
    expressions — all codegen'd; signature assembly is a
    shiftleft/bitwise-or fold.
    """
    tok, keep = explode_computed(F.array_distinct(F.split(F.col(text_col), " ")), "tok")
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), tok)
        .filter(keep)
        .withColumn("h", token_hash(F.col("tok")))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(n_bits)
    ]
    voted = toks.groupBy("doc_id").agg(*votes)
    sig = voted.withColumn(
        "simhash",
        sum(
            (
                F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                    F.lit(0).cast("long")
                )
                for i in range(n_bits)
            ),
            F.lit(0).cast("long"),
        ),
    )
    return sig.select("doc_id", "simhash")


def simhash_neardup_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` via 16-bit banding.

    Pigeonhole: d ≤ 3 bit flips cannot touch all 4 of the 16-bit bands,
    so every qualifying pair collides on ≥1 band — full recall without
    an all-pairs join.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bits"),
            )
            for b in range(4)
        ]
    )
    bb, keep_bb = explode_computed(bands, "bb")
    buckets = (
        sig.select("doc_id", "simhash", bb)
        .filter(keep_bb)
        .select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


@query(
    "q_simhash_signatures",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM toks
    ),
    votes AS (
      SELECT doc_id, i,
             sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hs, unnest(generate_series(0, 59)) AS u(i)
      GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature dump, now fully value-checked: built on the
    engine-portable md5-60-bit token hash so DuckDB replays the entire
    algorithm (tokenize → per-bit majority vote → signature assembly)
    bit-for-bit. The xxhash64/64-bit production default is the same
    code path (only ``token_hash``/``n_bits`` differ) and stays gated
    by ``q_simhash_consistency`` + the Hamming-banding pytest."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_signatures(
        d, token_hash=portable_token_hash, n_bits=60
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------
@query(
    "q_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.4, exact (brute force).

    Execution: distributed block-nested-loop. The corpus is split into
    ``B`` hash blocks on ``vec_id``; every block *pair* (i ≤ j) is
    cogrouped and scored with one numpy float64 GEMM per pair. Nothing
    is ever collected to the driver: replication is B rows-out per row
    (n·B rows shuffled on a 2-int key), per-task memory is two blocks —
    not the corpus — and the quadratic compute, inherent to exact
    all-pairs, is spread evenly over B(B+1)/2 independent tasks.
    Blocks are disjoint residue classes, so a cross-block pair appears
    in exactly one group (no post-dedup); the diagonal group filters
    id_a < id_b.

    This is the oracle-checkable truth the sub-quadratic paths are
    gated against (``q_embedding_neardup_lsh`` — the 100 TB candidate
    path — and the IVF cells in similarity.py). Only the id pair is
    returned (ints hash robustly; the similarity itself is
    float-rounding-sensitive).
    """
    import numpy as np
    import pandas as pd

    B = 8  # ≈ sqrt(2·parallelism) wanted; B(B+1)/2 = 36 GEMM tasks
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    blk = e.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(B)).cast("int"))
    # two physically-distinct tiny frames: the same block_pairs object on
    # both sides would trip Spark's ambiguous-self-join analyzer
    pairs_rows = [(i, j) for i in range(B) for j in range(i, B)]
    bp_l = spark.createDataFrame(pairs_rows, "bi int, bj int")
    bp_r = spark.createDataFrame(pairs_rows, "bi int, bj int")
    left = blk.join(F.broadcast(bp_l), blk.blk == bp_l.bi).select(
        "bi", "bj", F.col("vec_id").alias("id_l"), F.col("embedding").alias("emb_l")
    )
    right = blk.join(F.broadcast(bp_r), blk.blk == bp_r.bj).select(
        "bi", "bj", F.col("vec_id").alias("id_r"), F.col("embedding").alias("emb_r")
    )

    def score(key, lpdf, rpdf):
        bi, bj = key
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame(
                {"id_a": np.array([], np.int64), "id_b": np.array([], np.int64)}
            )
        ids_l = lpdf["id_l"].to_numpy(dtype=np.int64)
        ids_r = rpdf["id_r"].to_numpy(dtype=np.int64)
        ml = np.array(list(lpdf["emb_l"]), dtype=np.float64)
        mr = np.array(list(rpdf["emb_r"]), dtype=np.float64)
        for m in (ml, mr):
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            m /= n
        mask = (ml @ mr.T) >= 0.4
        if bi == bj:
            mask &= ids_l[:, None] < ids_r[None, :]
        li, ri = np.nonzero(mask)
        a, b = ids_l[li], ids_r[ri]
        return pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)})

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(score, schema="id_a long, id_b long")
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Embedding near-dup, LSH-bucketed (the 100 TB path)
# --------------------------------------------------------------------------
RHP_BITS = 32  # random-hyperplane bits per vector
RHP_BANDS = 8  # 8 bands x 4 bits; band-key collision => candidate pair
RHP_ROWS = RHP_BITS // RHP_BANDS


def _rhp_hyperplanes(dim: int, bits: int = RHP_BITS):
    """Deterministic pseudo-random hyperplanes H[j, d] = sin(n²) with
    n = 1 + j*dim + d.

    sin of an integer lattice is deterministic and replayable in ANSI
    SQL, which is what lets the DuckDB oracle rebuild the *identical*
    index — a production build would use a seeded Gaussian matrix.
    The argument must be *quadratic* in n: sin(linear-in-d) would make
    every hyperplane a combination of sin(d)/cos(d) — a 2-D subspace —
    and recall collapses; sin(n²) equidistributes (Weyl), giving
    near-independent directions. n² < 2^53 so it is exact in float64
    in both engines."""
    import numpy as np

    n = 1.0 + np.arange(bits, dtype=np.float64)[:, None] * dim + np.arange(
        dim, dtype=np.float64
    )[None, :]
    return np.sin(n * n)


def rhp_band_keys(e: DataFrame, dim: int = 64, carry_embedding: bool = False) -> DataFrame:
    """(vec_id, band, key[, embedding]): sign-bit LSH signature, banded.

    Narrow mapInPandas pass — one numpy GEMM per Arrow batch against the
    broadcast (bits x dim) hyperplane matrix; emits RHP_BANDS small rows
    per vector. The corpus itself never shuffles here.
    ``carry_embedding=True`` replicates the vector into each band row so
    the downstream bucket shuffle carries it — at scale that is cheaper
    than joining the corpus back on vec_id to re-fetch vectors (the
    join would shuffle the whole corpus a second time)."""
    import numpy as np
    import pandas as pd

    hyp = _rhp_hyperplanes(dim)
    pow2 = 2 ** np.arange(RHP_ROWS, dtype=np.int64)

    def keys(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            bits = (mat @ hyp.T) >= 0.0  # (batch, RHP_BITS)
            out = []
            for b in range(RHP_BANDS):
                band_bits = bits[:, b * RHP_ROWS : (b + 1) * RHP_ROWS]
                key = band_bits.astype(np.int64) @ pow2
                part = {
                    "vec_id": ids,
                    "band": np.full(len(ids), b, dtype=np.int64),
                    "key": key,
                }
                if carry_embedding:
                    part["embedding"] = pdf["embedding"]
                out.append(pd.DataFrame(part))
            yield pd.concat(out, ignore_index=True)

    schema = "vec_id long, band long, key long"
    if carry_embedding:
        schema += ", embedding array<float>"
    return e.select("vec_id", "embedding").mapInPandas(keys, schema=schema)


# DuckDB replay of the full RHP-LSH pair pipeline (shared by the pair
# query's oracle and the clustering oracle's edge list)
_RHP_PAIRS_CTE = f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    bits AS (
      SELECT vec_id, j,
             CASE WHEN list_dot_product(
                    emb,
                    list_transform(range(0, 64),
                                   d -> sin((1.0 + j*64 + d) * (1.0 + j*64 + d)))
                  ) >= 0 THEN 1 ELSE 0 END AS bit
      FROM e, unnest(range(0, {RHP_BITS})) AS t(j)
    ),
    keys AS (
      SELECT vec_id, j // {RHP_ROWS} AS band,
             CAST(sum(bit * CAST(power(2, j % {RHP_ROWS}) AS BIGINT)) AS BIGINT) AS key
      FROM bits GROUP BY vec_id, j // {RHP_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM keys a JOIN keys b
        ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    ),
    lsh_pairs AS (
      SELECT id_a, id_b
      FROM cand
        JOIN e ea ON ea.vec_id = id_a
        JOIN e eb ON eb.vec_id = id_b
      WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.4
    )
"""


@query(
    "q_embedding_neardup_lsh",
    oracle=f"""
    WITH {_RHP_PAIRS_CTE}
    SELECT id_a, id_b FROM lsh_pairs ORDER BY id_a, id_b
    """,
)
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH banding — the scale
    path ``q_embedding_neardup``'s docstring promises.

    Plan shape at 100 TB: signature pass is narrow (no shuffle); ONE
    wide stage shuffles (vec_id, band, key, embedding) rows into their
    (band, key) buckets, where an applyInPandas numpy GEMM verifies
    exact cosine within the bucket — pairs are born verified, so there
    is never a materialized unverified candidate list nor a per-pair
    embedding fetch join. A cross-band ``distinct`` dedups pairs that
    collide in several bands. Hot buckets are chunk-GEMMed (1024-row
    blocks) so memory stays bounded; at production scale the matching
    guard is a bucket-size cap or more rows per band. Precision is
    exact (every emitted pair is cosine-verified); LSH only bounds
    recall, gated vs the brute-force truth in pytest.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    # the embedding rides WITH its band keys into the bucket shuffle, so
    # verification happens per-bucket as one numpy GEMM — there is no
    # materialized candidate-pair list and no per-pair embedding join.
    # (An earlier form produced DISTINCT candidate ids then joined the
    # corpus twice to fetch both embeddings; with 4-bit band keys a
    # ~1/16 random-collision rate makes that pair list quadratic-ish —
    # measured 7.2 s vs ~2 s for this form at sf0.1.)
    keyed = rhp_band_keys(e, carry_embedding=True)

    def bucket_verify(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        units = mat / n
        out_a, out_b = [], []
        # chunk the GEMM so a hot bucket stays bounded in memory
        for lo in range(0, len(ids), 1024):
            hi = min(lo + 1024, len(ids))
            sims = units[lo:hi] @ units.T
            li, ri = np.nonzero(sims >= 0.4)
            ga = ids[lo + li]
            gb = ids[ri]
            keep = ga < gb
            out_a.append(ga[keep])
            out_b.append(gb[keep])
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pd.DataFrame({"id_a": a, "id_b": b})

    return (
        keyed.groupBy("band", "key")
        .applyInPandas(
            lambda _, pdf: bucket_verify(pdf), schema="id_a long, id_b long"
        )
        .distinct()
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Near-dup clustering: connected components + keeper selection
# --------------------------------------------------------------------------
def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list (id_a, id_b)
    → (doc_id, component) where component is the smallest doc_id in the
    group.

    Each round does (1) neighbor-min propagation — every node takes the
    min of its own and its neighbors' labels — and (2) pointer jumping —
    every node then re-reads the label OF its label, halving chain
    lengths. Together they converge in O(log diameter) rounds, so long
    near-dup chains (paths, not just cliques) stay cheap.

    Three iterative-Spark disciplines, all load-bearing:
    - checkpoint each round: ``persist`` caches *data* but the
      logical plan keeps growing, and Catalyst re-analysis goes
      super-linear in round count (measured: ~3× slower per round, then
      a driver OOM on plan trees by round 6). Checkpointing truncates
      the lineage so every round plans against a flat scan.
    - ``stats_reset_checkpoint``, not bare ``localCheckpoint``: Spark
      copies the ORIGIN plan's size estimate into the checkpoint's
      LogicalRDD, and this loop's step joins the previous round's
      labels with itself 3×, so the carried estimate CUBES per round —
      Catalyst's BigInt stats arithmetic alone cost 70-95 s/round by
      round 17 at sf0.1 (130 s total vs 22 s fixed; see
      plans/iterate.py for the jstack evidence).
    - fixpoint detection via a changed-count per round (one extra small
      join), stopping as soon as labels stabilize.
    """
    from mi_inbound_pulsar_spark.plans.iterate import stats_reset_checkpoint

    edges = stats_reset_checkpoint(
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
    )
    labels = stats_reset_checkpoint(
        edges.selectExpr("src AS doc_id")
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(nbr_min, labels.doc_id == nbr_min.src, "left").select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("component"),
        )
        # pointer jump: component := component's component (path halving)
        ptr = stepped.selectExpr("doc_id AS p_id", "component AS p_comp")
        new_labels = stats_reset_checkpoint(
            stepped.join(ptr, stepped.component == F.col("p_id"), "left")
            .select(
                "doc_id",
                F.coalesce(F.col("p_comp"), F.col("component")).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


@query(
    "q_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_RHP_PAIRS_CTE},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION
      SELECT id_b, id_a FROM lsh_pairs
    ),
    reach(doc_id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.doc_id
    )
    SELECT doc_id, CAST(min(comp) AS BIGINT) AS component
    FROM reach GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the
    oracle-checked cosine≥0.4 pair list, labeled by the smallest
    member (the canonical 'keeper' a dedup pipeline retains).

    The edge list comes from the LSH-bucketed pair path (the 100 TB
    candidate generator — every step bucketed, nothing quadratic),
    not the brute-force verifier. The Spark side iterates min-label
    propagation to a fixpoint (O(diameter) shuffles); the oracle
    replays the same LSH pairs in DuckDB and takes min over a
    recursive transitive closure — tractable because near-dup
    components are tiny. Union-find equivalence is additionally gated
    in tests/test_dedup_similarity.py.
    """
    pairs = q_embedding_neardup_lsh(spark, sf_dir)
    return connected_components(pairs).orderBy("doc_id")


@query(
    "q_simhash_consistency",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE n_docs > 1) AS BIGINT) AS n_dup_text_groups,
           true AS simhash_consistent
    FROM (SELECT md5(text) AS h, count(*) AS n_docs FROM documents GROUP BY md5(text))
    """,
)
def q_simhash_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-oracle sibling of the rows-only signature dump: SimHash
    is a pure function of the text, so every group of byte-identical
    documents must share one signature. Emits the duplicate-text group
    count plus that invariant as a driver-hashable boolean (the raw
    xxhash64-based signatures themselves are engine-specific and stay
    rows-only)."""
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(d).join(d.select("doc_id", F.md5("text").alias("h")), "doc_id")
    per_text = sigs.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("simhash").alias("n_sigs"),
    )
    return per_text.agg(
        F.count_if(F.col("n_docs") > 1).alias("n_dup_text_groups"),
        F.bool_and(F.col("n_sigs") == 1).alias("simhash_consistent"),
    )


@query(
    "q_dup_source_matrix",
    oracle="""
    -- same recall argument as q_minhash_lsh_neardup: on this dataset
    -- every J>=0.8 pair is recalled, so exact-Jaccard pairs ARE the
    -- LSH output and the source matrix is reproducible in SQL
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dup AS (
      SELECT doc_a, doc_b
      FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
    )
    SELECT least(da.source, db.source)    AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT)       AS n_pairs
    FROM dup
      JOIN documents da ON dup.doc_a = da.doc_id
      JOIN documents db ON dup.doc_b = db.doc_id
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """,
)
def q_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: MinHash-LSH near-dup pairs
    rolled up by (source, source) — the governance report that shows
    which crawls/dumps overlap (the input to mixture deweighting and
    to choosing which source's copy to keep).

    Scale: the heavy lifting is the already-bucketed LSH pair pipeline;
    this adds two broadcast-able id→source joins and a tiny matrix
    aggregate on top.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup(d, threshold=0.8)
    src = d.select("doc_id", "source")
    return (
        pairs.join(src.withColumnsRenamed({"doc_id": "doc_a", "source": "src_a"}), "doc_a")
        .join(src.withColumnsRenamed({"doc_id": "doc_b", "source": "src_b"}), "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Incremental dedup: new delta vs the existing corpus
# --------------------------------------------------------------------------
def jaccard_matches_against(
    sh_delta: DataFrame,
    sh_base: DataFrame,
    threshold: float,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Asymmetric exact-Jaccard: match each *delta* document against
    the *base* corpus through the shingle inverted index — the join
    never forms base×base or delta×delta pairs, so ingesting a small
    delta against a huge corpus costs |delta-index| probes, not a
    corpus self-join. Same hot-shingle DF cap as ``jaccard_pairs``
    (applied to the base index, where the skew lives).

    Returns (delta_id, base_id, jaccard) with jaccard ≥ threshold.
    """
    size_d = sh_delta.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nd"))
    size_b = sh_base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nb"))
    if max_doc_freq is not None:
        hot = (
            sh_base.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        sh_base = sh_base.join(F.broadcast(hot), "shingle", "left_anti")
        sh_delta = sh_delta.join(F.broadcast(hot), "shingle", "left_anti")
    d, b = sh_delta.alias("d"), sh_base.alias("b")
    common = (
        d.join(b, F.col("d.shingle") == F.col("b.shingle"))
        .groupBy(F.col("d.doc_id").alias("delta_id"), F.col("b.doc_id").alias("base_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(size_d.select(F.col("doc_id").alias("delta_id"), "nd"), "delta_id")
        .join(size_b.select(F.col("doc_id").alias("base_id"), "nb"), "base_id")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("nd") + F.col("nb") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("delta_id", "base_id", "jaccard")
    )


@query(
    "q_dedup_incremental",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    m AS (
      SELECT d.doc_id AS delta_id, b.doc_id AS base_id, count(*) AS c
      FROM sh d JOIN sh b ON d.shingle = b.shingle
      WHERE d.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      GROUP BY 1, 2
    ),
    j AS (
      SELECT delta_id, round(c * 1.0 / (x.n + y.n - c), 6) AS jac
      FROM m JOIN sz x ON delta_id = x.doc_id JOIN sz y ON base_id = y.doc_id
      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5
    ),
    agg AS (
      SELECT delta_id, CAST(count(*) AS BIGINT) AS n_matches, max(jac) AS best_jaccard
      FROM j GROUP BY 1
    )
    SELECT d.doc_id, coalesce(a.n_matches, 0) AS n_matches, a.best_jaccard,
           a.n_matches IS NOT NULL AS is_dup
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.delta_id
    WHERE d.doc_id % 10 = 0
    ORDER BY d.doc_id
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: flag each document of an incoming
    *delta* batch (doc_id % 10 = 0 stands in for "today's crawl") that
    is a near-duplicate (3-gram Jaccard ≥ 0.5) of the *existing* base
    corpus. This is the steady-state shape of production dedup — the
    corpus was deduped once; every new batch only needs delta-vs-base
    matching plus (optionally) delta-vs-delta, never a full re-join.

    Scale: the base shingle index is computed once and reusable across
    batches (persist/bucket it by shingle); each ingest probes it with
    the delta's shingles only. Candidates are exact — any pair with
    J ≥ 0.5 shares at least one shingle — so unlike the LSH path there
    is no recall loss to account for.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 != 0)
    delta = d.filter(F.col("doc_id") % 10 == 0)
    # each index has 2-3 consumers (sizes, hot set, join side) — persist
    matches = jaccard_matches_against(
        shingles(delta).transform(eager_checkpoint), shingles(base).transform(eager_checkpoint), 0.5
    )
    agg = matches.groupBy("delta_id").agg(
        F.count(F.lit(1)).alias("n_matches"), F.max("jaccard").alias("best_jaccard")
    )
    return (
        delta.select("doc_id")
        .join(agg, delta.doc_id == agg.delta_id, "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            "best_jaccard",
            F.col("n_matches").isNotNull().alias("is_dup"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_cluster_keeper",
    oracle="""
    WITH RECURSIVE docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ok AS (
      SELECT doc_a, doc_b FROM pairs JOIN sz x ON doc_a = x.doc_id
        JOIN sz y ON doc_b = y.doc_id
      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ok
      UNION SELECT doc_b, doc_a FROM ok
    ),
    reach(doc_id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.doc_id
    ),
    comps AS (
      SELECT doc_id, CAST(min(comp) AS BIGINT) AS component
      FROM reach GROUP BY doc_id
    ),
    ranked AS (
      SELECT c.component, c.doc_id, d.n_chars,
             row_number() OVER (
               PARTITION BY c.component ORDER BY d.n_chars DESC, c.doc_id
             ) AS rn
      FROM comps c JOIN documents d USING (doc_id)
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keeper_doc_id,
           CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_removed
    FROM ranked
    GROUP BY component
    ORDER BY component
    """,
)
def q_cluster_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each near-duplicate cluster (exact word-3-gram Jaccard
    ≥ 0.5 graph, connected components) to its best representative — the
    longest member wins, ties to the lowest doc_id — and account for
    the characters the collapse removes. This is the *decision* step a
    dedup pipeline actually ships: near-dup detection picks the pairs,
    this picks the survivors.

    Plan: the edge set comes from :func:`jaccard_pairs_auto` (exact
    J >= 0.5, df-cap-free; cost-selected strategy — inverted index on
    small corpora, rarity-first prefix filtering past the cutover,
    where the posting-list form sat in the pre-cap Σdf² quadratic
    regime and went 3.4 s → 157 s across the sf0.1→sf1.0 decade,
    measured round 12); the component labels come
    from the iterative min-label propagation (O(diameter) shuffles,
    localCheckpoint between rounds); keeper election is one row_number
    window per component — components are tiny by construction, so the
    window partitions are too.
    """
    d = load_table(spark, sf_dir, "documents")
    edges = jaccard_pairs_auto(
        shingle_arrays(d, n=3),
        threshold=0.5,
        n_docs=d.count(),
    ).select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    comps = connected_components(edges)
    from pyspark.sql import Window

    ranked = (
        comps.join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
            ),
        )
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keeper_doc_id"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0)).alias("chars_removed"),
        )
        .orderBy("component")
    )


@query(
    "q_dedup_incremental_lsh",
    oracle="""
    -- exact J >= 0.8 oracle; like q_minhash_lsh_neardup's, valid
    -- because the 8x4 banding was checked to recall every J >= 0.8
    -- pair on this data (pytest gates recall if the data changes)
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ok AS (
      SELECT doc_a, doc_b,
             round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
      FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
        AND (doc_a % 10 = 0 OR doc_b % 10 = 0)
    ),
    delta_matches AS (
      SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS delta_id,
             jaccard
      FROM ok
      UNION ALL
      SELECT doc_b, jaccard FROM ok
      WHERE doc_a % 10 = 0 AND doc_b % 10 = 0
    )
    SELECT delta_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           max(jaccard) AS best_jaccard
    FROM delta_matches
    GROUP BY delta_id
    ORDER BY doc_id
    """,
)
def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental **MinHash-LSH** dedup — the steady-state ingest form
    of ``q_minhash_lsh_neardup``: today's delta batch (doc_id % 10 = 0)
    is banded and probed against the *persisted base band index*; only
    buckets containing at least one delta signature generate
    candidates, and exact-Jaccard verification touches only those.
    Unlike the exact incremental probe (``q_dedup_incremental``), the
    base index here is k longs + band keys per document — the compact,
    mergeable artifact a production pipeline persists between crawls —
    not the full inverted shingle index.

    Emits every flagged delta doc with its match count and best
    verified similarity (delta-vs-base and delta-vs-delta pairs both
    count; base-vs-base pairs never form because neither side probes).
    """
    d = load_table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 == 0
    sh = shingles(d, n=3).transform(eager_checkpoint)
    sig = minhash_signatures(sh, MINHASH_K)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]).alias(
                    "bucket"
                ),
            )
            for b in range(LSH_BANDS)
        ]
    )
    bb, keep_bb = explode_computed(band_cols, "bb")
    buckets = (
        sig.select("doc_id", bb)
        .filter(keep_bb)
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .withColumn("is_delta", is_delta)
        .transform(eager_checkpoint)
    )
    probe = buckets.filter("is_delta")
    cands = (
        probe.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
        .transform(eager_checkpoint)
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(F.broadcast(cand_docs), "doc_id").transform(eager_checkpoint)
    verified = cands.join(
        jaccard_pairs(sh_cand, 0.8, pin_parallelism=False), ["doc_a", "doc_b"]
    )
    delta_matches = (
        verified.filter(F.col("doc_a") % 10 == 0)
        .select(F.col("doc_a").alias("doc_id"), "jaccard")
        .unionByName(
            verified.filter(F.col("doc_b") % 10 == 0).select(
                F.col("doc_b").alias("doc_id"), "jaccard"
            )
        )
    )
    return (
        delta_matches.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"), F.max("jaccard").alias("best_jaccard"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Inter-document line/segment dedup (CCNet-style boilerplate removal)
# --------------------------------------------------------------------------
LINE_SEG_WORDS = 8
LINE_MAX_DF = 2


@query(
    "q_line_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    seg AS (
      SELECT doc_id, t.i AS seg_idx,
             array_to_string(
               words[t.i*{LINE_SEG_WORDS}+1 :
                     least(len(words), t.i*{LINE_SEG_WORDS}+{LINE_SEG_WORDS})],
               ' ') AS segment
      FROM w, unnest(range(0, (len(words)-1)//{LINE_SEG_WORDS} + 1)) AS t(i)
      WHERE len(words) > 0
    ),
    freq AS (SELECT segment, count(DISTINCT doc_id) AS df FROM seg GROUP BY segment),
    j AS (SELECT s.doc_id, s.seg_idx, s.segment, f.df
          FROM seg s JOIN freq f USING (segment))
    SELECT doc_id,
           CAST(count(*) FILTER (df <= {LINE_MAX_DF}) AS BIGINT) AS kept_segments,
           CAST(count(*) FILTER (df > {LINE_MAX_DF}) AS BIGINT) AS dropped_segments,
           string_agg(segment, ' ' ORDER BY seg_idx)
             FILTER (df <= {LINE_MAX_DF}) AS clean_text
    FROM j GROUP BY doc_id
    HAVING count(*) FILTER (df <= {LINE_MAX_DF}) > 0
    ORDER BY doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document segment-level dedup, the CCNet/RefinedWeb
    boilerplate-removal shape: split each document into fixed 8-word
    segments (the corpus has no newlines, so word windows stand in for
    lines), count each segment's document frequency across the corpus,
    drop segments that appear in more than ``LINE_MAX_DF`` distinct
    documents (shared boilerplate), and reassemble the surviving text
    in original order.

    Scale: the segment explode is narrow (one codegen'd projection);
    the only shuffles are the DF count and the frequency join back,
    both keyed on xxhash64(segment) — 8-byte longs instead of ~50-byte
    segment strings, exactly the shingle-index trick in
    :func:`jaccard_pairs` (a 64-bit collision merges two segments'
    DF counts at p ≈ n²/2⁶⁵ — the accepted trade everywhere else in
    this module). Reassembly is a per-doc sort of an in-memory
    array (collect_list + array_sort), never a global sort. Per-doc
    decisions are row-local after the join, so the pipeline is
    growth-stable: adding documents only grows the DF table.
    """
    d = load_table(spark, sf_dir, "documents")
    # materialize the split once per row: expressions referenced inside
    # a HOF lambda are inlined, so split(text) would re-run per segment
    wd = d.select("doc_id", F.split(F.col("text"), " ").alias("_w"))
    words = F.col("_w")
    w = LINE_SEG_WORDS
    segs = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / w).cast("int") - 1),
        lambda i: F.array_join(F.slice(words, i * w + 1, w), " "),
    )
    e = wd.select("doc_id", segs.alias("_segs")).select(
        "doc_id",
        F.posexplode("_segs").alias("seg_idx", "segment"),
    ).withColumn("seg_h", F.xxhash64("segment"))
    freq = e.groupBy("seg_h").agg(F.count_distinct("doc_id").alias("df"))
    kept_cond = F.col("df") <= LINE_MAX_DF
    return (
        e.join(freq, "seg_h")
        .groupBy("doc_id")
        .agg(
            F.sum(kept_cond.cast("long")).alias("kept_segments"),
            F.sum((~kept_cond).cast("long")).alias("dropped_segments"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept_cond, F.struct("seg_idx", "segment"))
                        )
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .filter(F.col("kept_segments") > 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr family)
# --------------------------------------------------------------------------
SUBSTR_SPAN_TOKENS = 20  # Lee et al. use 50 BPE tokens on web corpora;
#                          20 fits this corpus's 10-99-token documents
SUBSTR_MIN_DF = 2


def substring_dedup(
    docs: DataFrame,
    k: int = SUBSTR_SPAN_TOKENS,
    min_df: int = SUBSTR_MIN_DF,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring dedup: find every ``k``-token span that occurs in
    ``min_df``+ distinct documents and strip all its occurrences,
    reassembling the surviving tokens in order.

    This is the Spark-native equivalent of Lee et al.'s suffix-array
    ExactSubstr dedup: a suffix array answers "which length-k windows
    repeat?"; a distributed engine answers the same question with a
    rolling-window explode + corpus-frequency count — same decision
    per token position, no global suffix sort. Reference anchor: the
    reference engine has no dedup at all (`PulsarMessageConsumer.java`
    delegates processing); this is north-star LLM-pipeline surface.

    Plan: one narrow span explode (start positions 0..n-k), spans
    keyed by the engine-portable 60-bit md5 hash
    (:func:`portable_token_hash` — at 100 TB swap in the 128-bit
    ``F.md5`` digest to push collision odds below corpus size; the
    8-byte key halves shuffle width vs a 32-char hex string and is
    ~300x narrower than shuffling the span text), a DF groupBy
    (map-side partial agg), a frequency join back, and a per-doc
    covered-position fold (``collect_list(sequence)`` →
    ``array_distinct(flatten)``) — no second explode, no global sort.
    Docs shorter than ``k`` tokens produce no spans and pass through
    untouched (``sequence`` would count DOWN for n < k, so the span
    array is explicitly emptied there).
    """
    words = F.split(F.col(text_col), " ")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), words.alias("w"), F.size(words).alias("n_tokens")
    )
    starts = F.when(
        F.col("n_tokens") >= k, F.sequence(F.lit(0), F.col("n_tokens") - k)
    ).otherwise(F.array().cast("array<int>"))
    spans = toks.select("doc_id", "w", F.explode(starts).alias("i")).select(
        "doc_id",
        "i",
        portable_token_hash(F.array_join(F.slice("w", F.col("i") + 1, k), " ")).alias(
            "span_h"
        ),
    )
    dup = (
        spans.groupBy("span_h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("span_h")
    )
    hits = (
        spans.join(dup, "span_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dup_span_starts"),
            F.array_distinct(
                F.flatten(F.collect_list(F.sequence(F.col("i"), F.col("i") + (k - 1))))
            ).alias("cov"),
        )
    )
    keep_tok = F.filter(
        F.col("w"), lambda t, i: ~F.array_contains(F.col("cov"), i)
    )
    return (
        toks.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_span_starts", F.lit(0)).alias("dup_span_starts"),
            F.when(F.col("cov").isNull(), F.lit(0))
            .otherwise(F.size("cov"))
            .alias("removed_tokens"),
            F.when(F.col("cov").isNull(), F.array_join("w", " "))
            .otherwise(F.array_join(keep_tok, " "))
            .alias("clean_text"),
        )
    )


@query(
    "q_substring_dedup",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    spans AS (
      SELECT doc_id, i - 1 AS i,
             CAST(concat('0x', substr(md5(
               array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
             ), 1, 15)) AS BIGINT) AS span_h
      FROM docs,
           unnest(generate_series(1, greatest(n_tokens - {SUBSTR_SPAN_TOKENS - 1}, 0)))
             AS u(i)
    ),
    dup AS (
      SELECT span_h FROM spans
      GROUP BY span_h HAVING count(DISTINCT doc_id) >= {SUBSTR_MIN_DF}
    ),
    hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_span_starts,
             list_distinct(flatten(list(
               generate_series(i, i + {SUBSTR_SPAN_TOKENS - 1})
             ))) AS cov
      FROM spans JOIN dup USING (span_h) GROUP BY doc_id
    ),
    toks AS (
      SELECT doc_id, w[i] AS tok, i - 1 AS pos
      FROM docs, unnest(generate_series(1, n_tokens)) AS u(i)
    ),
    clean AS (
      SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
      FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
      WHERE h.cov IS NULL OR NOT list_contains(h.cov, t.pos)
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, d.n_tokens,
           coalesce(h.dup_span_starts, 0) AS dup_span_starts,
           CAST(coalesce(len(h.cov), 0) AS BIGINT) AS removed_tokens,
           coalesce(c.clean_text, '') AS clean_text
    FROM docs d
      LEFT JOIN hits h ON d.doc_id = h.doc_id
      LEFT JOIN clean c ON d.doc_id = c.doc_id
    ORDER BY d.doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup over the documents corpus: every
    20-token window shared by 2+ documents is stripped from all of
    them (see :func:`substring_dedup` for the suffix-array-equivalence
    argument and the 100 TB plan shape)."""
    d = load_table(spark, sf_dir, "documents")
    return substring_dedup(d).orderBy("doc_id")


# --------------------------------------------------------------------------
# Prefix-filtering set-similarity join (SSJoin / PPJoin candidate rule)
# --------------------------------------------------------------------------
def prefix_filter_pairs(
    sharr: DataFrame, threshold: float, max_doc_freq: int | None = None
) -> DataFrame:
    """Exact Jaccard pairs (round(J, 6) >= ``threshold``) over a
    shingle-*array* frame via **prefix filtering** (the SSJoin / PPJoin
    candidate rule; Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07) —
    the df-cap-free exact strategy, shared by the near-dup kernels that
    need the *true* pair set without :func:`jaccard_pairs`'s hot-shingle
    cap.

    The rule: order every document's shingles by one global total order
    (ascending document frequency, rarest first; ties broken by the
    shingle value so the order is total) and index only each document's
    first ``p = |A| - ceil(t*|A|) + 2`` shingles (the classic rule's +1
    covers true J >= t; one extra entry covers the pairs the
    round-then-threshold convention admits). Any pair with J(A,B) >= t
    shares at least ``ceil(t*|A|)`` shingles, and two sets whose overlap
    is >= a must collide inside their ``(size - a + 1)``-prefixes under
    ANY shared total order — so the prefix index generates a superset of
    the true pairs (no false negatives; the result is exact after
    verification).

    Scale: because the order is rarity-first, hot boilerplate shingles
    (the d² blow-up hazard of a plain inverted index) stay out of every
    prefix as long as documents carry enough distinctive shingles —
    skew resistance falls out of the algorithm instead of a df cap that
    changes semantics. Measured linear across two decades (e2 = 0.96 at
    sf0.1→sf1.0), where the uncapped inverted index went ~Σdf²
    quadratic (157 s at sf1.0 in q_dedup_report before this helper).
    The guarantee is per-document, not absolute: a boilerplate-only or
    exactly-duplicated corpus has nothing rare to index — run exact
    dedup first and keep the DF-cap variant for pathological inputs.

    Plan shape: one groupBy for document frequency, one shuffle to join
    df onto the exploded shingles, a per-doc array_sort + slice
    (narrow), the bucket self-join on the prefix shingles only, then
    per-candidate-pair exact verification with ``array_intersect`` over
    the full sorted shingle-hash arrays, shipped ONCE as a broadcast
    dimension instead of an array copy per candidate pair (measured:
    verify stage 4.3 s → 1.6 s at sf0.1). At index-breaking corpus
    sizes swap the verify joins for the bucketed co-located SMJ
    (plans/bucketing.py); the 100 TB near-dup *candidate* path remains
    MinHash-LSH/SimHash.

    ``max_doc_freq`` reproduces :func:`jaccard_pairs`' capped-index
    CONTRACT exactly, with linear candidate generation: shingles whose
    document frequency exceeds the cap are dropped from both the prefix
    index and the verification arrays, while document SIZES keep
    counting every shingle — so J = |A_c∩B_c| / (|A|+|B|−|A_c∩B_c|),
    bit-identical to the capped inverted index at every corpus scale.
    The prefix bound survives capping: J >= t still forces a capped
    overlap c >= ceil(t·|A|) (c <= |B| keeps |A∪B| >= |A|), so two
    qualifying docs must collide within the first
    ``|A_c| − ceil(t·|A|) + 2`` CAPPED shingles — clamped at 0, which
    correctly un-indexes any document whose capped set is already too
    small to ever reach the overlap floor.

    Returns (doc_a, doc_b, jaccard) with jaccard already rounded to
    6 dp — the same round-then-threshold convention as
    :func:`jaccard_pairs`, so the exact strategies agree even for pairs
    within an ulp of the threshold.
    """
    t = threshold
    # 8-byte hashed shingle keys, same trade as jaccard_pairs
    # (hash_keys): halves the DF-join and index shuffle bytes; a 64-bit
    # collision merges two shingles with p ~ n^2/2^65. The EXPLODED
    # hashed postings are what gets checkpointed — not the array frame:
    # localCheckpoint serializes nested string arrays ~6× slower than
    # the equivalent (doc_id, long) rows (4.3 s vs 0.7 s at sf0.1,
    # measured round 12), and every downstream consumer (dfreq, the
    # rarity sort, the verify arrays) reads the postings anyway.
    # explode_outer + null filter, NOT plain explode: see shingles() —
    # InferFiltersFromGenerate re-evaluates the collapsed shingle
    # expression under a non-outer Generate, O(len²) per document.
    sh = (
        sharr.select("doc_id", F.explode_outer("shingles").alias("_s"))
        .filter(F.col("_s").isNotNull())
        .select("doc_id", F.xxhash64("_s").alias("shingle"))
        .transform(eager_checkpoint)
    )
    # full sizes BEFORE any capping (shingle_arrays is distinct per
    # doc, so the posting count IS the set size) — computed from the
    # cached postings instead of an F.size projection, which would
    # re-build the whole shingle array per doc a second time under
    # projection collapse
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_full"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if max_doc_freq is not None:
        # the capped universe: same hot-set anti-join as jaccard_pairs
        hot = dfreq.filter(F.col("df") > max_doc_freq).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    ordered = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "shingle"))
            ).alias("by_rarity"),
        )
        .join(sizes, "doc_id")
        .select(
            "doc_id",
            # prefix length |capped| - ceil(t*n_full) + 2 (uncapped:
            # the two coincide): the +1 of the classic rule covers
            # true J >= t; the extra +1 covers the pairs the
            # round-then-threshold convention admits (true J in
            # [t - 5e-7, t) -> overlap >= ceil(t*n) - 1 for n <= 2e5),
            # so candidate completeness matches the filter exactly
            F.transform(
                F.slice(
                    "by_rarity",
                    1,
                    F.greatest(
                        F.lit(0),
                        F.size("by_rarity")
                        - F.ceil(F.col("n_full") * F.lit(t)).cast("int")
                        + 2,
                    ),
                ),
                lambda s: s["shingle"],
            ).alias("prefix"),
        )
    )
    idx = ordered.select("doc_id", F.explode("prefix").alias("shingle"))
    cand = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # fan-out pin (round 12): the candidate table is two longs per
        # row — AQE coalesces the distinct's exchange to ~1 partition —
        # but each row's VERIFY below is an array_intersect over full
        # shingle arrays, so CPU per byte is enormous and the verify
        # stage ran near-serial. Round-robin to defaultParallelism
        # (tiny shuffle, row-local verify unaffected). Pinning the
        # prefix-index exchange instead was A/B'd and REJECTED: the
        # extra exchange cost more than the join fan-out saved
        # (2.8 s → 3.7 s); this pin alone measured 2.8 s → 2.3 s
        # min-of-3 interleaved on the full kernel.
        .repartition(fanout_partitions(sharr.sparkSession))
    )
    # verify arrays from the checkpointed postings (one groupBy over
    # cached narrow rows): in the capped branch ``sh`` is already
    # anti-joined, so intersections see only the capped universe while
    # n_full keeps counting every shingle — jaccard_pairs' exact
    # capped contract
    full = (
        sh.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("shingle")).alias("sset"))
        .join(sizes, "doc_id")
    )
    verified = (
        cand.join(
            F.broadcast(
                full.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("sset").alias("sa"),
                    F.col("n_full").alias("na"),
                )
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                full.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("sset").alias("sb"),
                    F.col("n_full").alias("nb"),
                )
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("c"),
            "na",
            "nb",
        )
    )
    jac = F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6)
    return verified.filter(jac >= t).select("doc_a", "doc_b", jac.alias("jaccard"))


@query(
    "q_prefix_filter_jaccard",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
    FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
    WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def q_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard near-dup pairs (J >= 0.5) via **prefix filtering**
    — the third exact-Jaccard strategy in this module, alongside the
    full inverted index with a hot-shingle DF cap (:func:`jaccard_pairs`)
    and MinHash-LSH (approximate). The candidate rule, the
    skew-resistance argument, and the plan shape live on the shared
    kernel :func:`prefix_filter_pairs`. At t = 0.5 the index holds ~half
    of each document's shingles — the *rare* half, by construction.
    """
    d = load_table(spark, sf_dir, "documents")
    sharr = shingle_arrays(d, n=3)
    return prefix_filter_pairs(sharr, threshold=0.5).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# TF-IDF weighted-cosine near-dup (the weighted set-similarity join)
# --------------------------------------------------------------------------
TFIDF_COSINE_MIN_SIM = 0.3
TFIDF_MAX_DF = 40  # hot-term candidate bound (idf already downweights them)


@query(
    "q_tfidf_cosine_neardup",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    w AS (
      SELECT t.doc_id, t.tok, t.tf * ln(n.n_docs * 1.0 / d.df) AS w, d.df
      FROM tf t JOIN df d USING (tok), n
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      WHERE a.df <= {TFIDF_MAX_DF}
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(dot / (x.nrm * y.nrm), 6) AS cosine
    FROM dots JOIN nrm x ON doc_a = x.doc_id JOIN nrm y ON doc_b = y.doc_id
    WHERE round(dot / (x.nrm * y.nrm), 6) >= {TFIDF_COSINE_MIN_SIM}
    ORDER BY doc_a, doc_b
    """,
)
def q_tfidf_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weighted-cosine near-dup pairs (cosine ≥ 0.3) — the
    *weighted* set-similarity join (Bayardo et al. WWW'07 operate on
    exactly these vectors): unlike Jaccard, shared rare terms count
    for more than shared boilerplate, so templated documents with
    distinct payloads separate cleanly.

    Plan: tf groupBy (keys = doc×term occurrences), df groupBy (keyed
    by vocabulary), weights joined back, norms per doc, then the
    inverted-index self-join restricted to terms with
    df ≤ {TFIDF_MAX_DF} — the same hot-key candidate bound as
    ``jaccard_pairs``; dropping a hot term from *candidate generation*
    barely moves the cosine because ln(N/df) → 0 as df → N (norms keep
    every term, so scores stay exact up to the capped candidates).
    Float-sum order across terms differs between engines — the cosine
    is rounded to 6dp on both sides before the threshold, making the
    filter decision identical.

    Known corpus artifact (round 12, via the wide second decade): on
    the SYNTHETIC closed-vocabulary testdata the result is non-empty
    at sf0.001/sf0.01 (266/292 pairs) but 0 rows at sf0.1+ — every
    word's df grows linearly with corpus size, so no term stays under
    the rare-term bound and candidate generation correctly finds no
    discriminative evidence (both engines agree; the oracle is also
    empty). This is the containment-kernel corpus class, not an
    operator defect: a Heaps-law corpus grows its rare-term tail with
    N, keeping df ≤ {TFIDF_MAX_DF} terms (and therefore signal) at
    every scale. The absolute bound is the correct production shape —
    a relative bound would index boilerplate on exactly the corpora
    that need the protection.
    """
    d = load_table(spark, sf_dir, "documents")
    tok, keep = explode_computed(F.split(F.col("text"), " "), "tok")
    tf = (
        d.select("doc_id", tok)
        .filter(keep)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = d.count()  # scalar, driver-side by construction
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        "df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.filter(F.col("df") <= TFIDF_MAX_DF).alias("a")
    b = w.filter(F.col("df") <= TFIDF_MAX_DF).alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    cos = F.round(
        F.col("dot") / (F.col("x.nrm") * F.col("y.nrm")), 6
    )
    # tf/w ARE scanned multiple times inside this one plan, but caching
    # them measured SLOWER (interleaved A/B at sf0.1, round 11:
    # 1.0-1.25 s uncached vs 1.47-1.61 s with retain(tf, w)) — the
    # narrow recomputes of tokenize+groupBy pipeline in-stage, while
    # the columnar cache costs a write plus three decompress reads.
    # The q_copurchase shape does NOT transfer here. Measured, not
    # assumed; re-measure before "fixing" this again.
    return (
        dots.join(nrm.alias("x"), F.col("doc_a") == F.col("x.doc_id"))
        .join(nrm.alias("y"), F.col("doc_b") == F.col("y.doc_id"))
        .select("doc_a", "doc_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= TFIDF_COSINE_MIN_SIM)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# LSH governance audit: candidate recall vs the exact inverted index
# --------------------------------------------------------------------------
@query(
    "q_lsh_recall_audit",
    oracle="""
    -- the exact J>=0.8 pair set; the oracle asserts LSH recalls ALL of
    -- it (recall/precision identically 1.0), so this query is a LIVE
    -- gate: if the Spark side's banding ever misses a true pair, the
    -- counts diverge and the hash check fails — the same bounded-oracle
    -- trick as the ANN recall gates, applied to MinHash-LSH.
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT doc_a, doc_b
      FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           CAST(count(*) AS BIGINT) AS n_lsh_pairs,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(1.0 AS DOUBLE) AS recall,
           CAST(1.0 AS DOUBLE) AS precision
    FROM exact
    """,
)
def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH governance audit: recall and precision of the
    banded-LSH near-dup pipeline against the exact inverted-index
    truth at J ≥ 0.8 — the dedup-quality metric a corpus pipeline
    publishes next to its dedup rate. Computed live on BOTH engines:
    the Spark side really runs LSH and really intersects with the
    exact pair set, so a banding regression (or a future k/bands
    retune that hurts recall) fails the oracle hash instead of
    shipping silently. Precision is 1.0 by construction (candidates
    are exact-verified); recall is the live measurement.
    """
    d = load_table(spark, sf_dir, "documents")
    # truth side of an audit: exact and df-cap-free, via the
    # cost-selected strategy — a cap would silently diverge from the
    # oracle's truly-exact pair set, and the always-inverted-index
    # form goes Σdf² quadratic past the cutover (the q_dedup_report
    # lesson: 3.4 s → 157 s across sf0.1→sf1.0)
    exact = jaccard_pairs_auto(
        shingle_arrays(d, n=3),
        threshold=0.8,
        n_docs=d.count(),
    ).select("doc_a", "doc_b")
    lsh = minhash_neardup(d, threshold=0.8).select("doc_a", "doc_b")
    common = exact.join(lsh, ["doc_a", "doc_b"])
    stats = (
        exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
        .crossJoin(lsh.agg(F.count(F.lit(1)).alias("n_lsh_pairs")))
        .crossJoin(common.agg(F.count(F.lit(1)).alias("n_common")))
    )
    return stats.select(
        "n_exact_pairs",
        "n_lsh_pairs",
        "n_common",
        F.round(F.col("n_common") / F.col("n_exact_pairs"), 6).alias("recall"),
        F.round(F.col("n_common") / F.col("n_lsh_pairs"), 6).alias("precision"),
    )


# --------------------------------------------------------------------------
# N-gram novelty (incremental-curation ordering signal)
# --------------------------------------------------------------------------
@query(
    "q_ngram_novelty",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    first_owner AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE f.owner = s.doc_id) AS BIGINT) AS n_novel,
           round(count(*) FILTER (WHERE f.owner = s.doc_id) * 1.0 / count(*), 6)
             AS novelty
    FROM sh s JOIN first_owner f ON s.shingle = f.shingle
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty under the corpus's ingest order:
    the share of a document's distinct shingles whose FIRST owner
    (lowest doc_id) is the document itself — the incremental-curation
    signal for "does this document add anything we have not already
    ingested?" (near 0 ⇒ rehash of earlier content even if no single
    earlier doc matches it — the many-to-one duplication case pairwise
    Jaccard misses).

    Scale: one min-aggregate over the shingle index (16-byte-hash the
    shingle at 100 TB, as in ``jaccard_pairs``), one join back keyed
    the same way, one per-doc rollup. Nothing pairwise anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, n=3)
    first_owner = sh.groupBy("shingle").agg(F.min("doc_id").alias("owner"))
    return (
        sh.join(first_owner, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count_if(F.col("owner") == F.col("doc_id")).alias("n_novel"),
            F.round(
                F.count_if(F.col("owner") == F.col("doc_id")) / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Jaccard threshold sweep (dedup-policy calibration curve)
# --------------------------------------------------------------------------
@query(
    "q_jaccard_threshold_sweep",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT round(c * 1.0 / (x.n + y.n - c), 6) AS j
      FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
    )
    SELECT t.thr AS threshold,
           CAST(count(*) FILTER (WHERE j >= t.thr) AS BIGINT) AS n_pairs
    FROM (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS thr) t, jac
    GROUP BY t.thr ORDER BY threshold
    """,
)
def q_jaccard_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-policy calibration curve: how many near-dup pairs each
    candidate Jaccard threshold would mark, from ONE pass over the
    exact pair table — the sweep a pipeline owner reads before fixing
    the production threshold (the knee in this curve is where
    boilerplate ends and true duplication begins).

    Scale: the pair table is computed once, at the sweep's LOWEST
    threshold (pairs below it can never change a count, so the table
    is exact for every swept value) via the cost-selected strategy —
    the previous uncapped J >= 0 inverted index materialized the full
    Σdf² join output, quadratic across the sf0.1→sf1.0 decade; the
    sweep itself is a 5-row broadcast cross join and a conditional
    count — adding thresholds >= the floor costs nothing.
    """
    d = load_table(spark, sf_dir, "documents")
    thresholds = [0.5, 0.6, 0.7, 0.8, 0.9]
    jac = jaccard_pairs_auto(
        shingle_arrays(d, n=3),
        threshold=min(thresholds),
        n_docs=d.count(),
    ).select("jaccard")
    thr = d.sparkSession.createDataFrame(
        [(t,) for t in thresholds], "thr double"
    )
    return (
        jac.crossJoin(F.broadcast(thr))
        .groupBy(F.col("thr").alias("threshold"))
        .agg(F.count_if(F.col("jaccard") >= F.col("thr")).alias("n_pairs"))
        .orderBy("threshold")
    )


# --------------------------------------------------------------------------
# Corpus dedup report (pipeline funnel summary)
# --------------------------------------------------------------------------
@query(
    "q_dedup_report",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near AS (
      SELECT count(*) AS n_neardup_pairs
      FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
    ),
    spans AS (
      SELECT doc_id, i - 1 AS i,
             CAST(concat('0x', substr(md5(
               array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
             ), 1, 15)) AS BIGINT) AS span_h
      FROM docs,
           unnest(generate_series(1, greatest(n_tokens - {SUBSTR_SPAN_TOKENS - 1}, 0)))
             AS u(i)
    ),
    dupspan AS (
      SELECT span_h FROM spans
      GROUP BY span_h HAVING count(DISTINCT doc_id) >= {SUBSTR_MIN_DF}
    ),
    spandocs AS (
      SELECT count(DISTINCT doc_id) AS n_substring_dup_docs
      FROM spans JOIN dupspan USING (span_h)
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
               AS n_exact_dup_docs
      FROM docs
    )
    SELECT base.n_docs, base.total_tokens, base.n_exact_dup_docs,
           CAST(near.n_neardup_pairs AS BIGINT) AS n_neardup_pairs,
           CAST(spandocs.n_substring_dup_docs AS BIGINT) AS n_substring_dup_docs
    FROM base, near, spandocs
    """,
)
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus duplication report — the governance summary a
    dedup pipeline publishes per snapshot: corpus size, exact-dup
    load (count − distinct md5), near-dup pair count at the production
    Jaccard threshold, and how many documents carry a cross-document
    repeated 20-token span. Composes three verified kernels (exact
    hash groupBy, inverted-index Jaccard, substring spans) into the
    number-wall every curation review starts from.
    """
    d = load_table(spark, sf_dir, "documents")
    near = (
        # governance truth side: exact (uncapped) pair count, via the
        # cost-selected strategy — the always-uncapped-inverted-index
        # form went Σdf² quadratic across the sf0.1→sf1.0 decade
        # (3.4 s → 157 s, e2≈1.66 measured round 12) while prefix
        # filtering holds e2≈0.96 past the cutover on the same data.
        jaccard_pairs_auto(
            shingle_arrays(d, n=3),
            threshold=0.8,
            n_docs=d.count(),
        ).agg(F.count(F.lit(1)).alias("n_neardup_pairs"))
    )
    words = F.split(F.col("text"), " ")
    toks = d.select(
        "doc_id", words.alias("w"), F.size(words).alias("n_tokens")
    )
    k = SUBSTR_SPAN_TOKENS
    starts = F.when(
        F.col("n_tokens") >= k, F.sequence(F.lit(0), F.col("n_tokens") - k)
    ).otherwise(F.array().cast("array<int>"))
    # scoped persist (round 12): the ~250k-row span explode + portable
    # token hash feeds BOTH the df rollup and the dup-doc count join —
    # unpersisted it was recomputed from the scan for each consumer
    spans = toks.select("doc_id", "w", F.explode(starts).alias("i")).select(
        "doc_id",
        portable_token_hash(F.array_join(F.slice("w", F.col("i") + 1, k), " ")).alias(
            "span_h"
        ),
    )
    dupspan = (
        spans.groupBy("span_h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= SUBSTR_MIN_DF)
        .select("span_h")
    )
    spandocs = (
        spans.join(dupspan, "span_h")
        .agg(F.count_distinct("doc_id").alias("n_substring_dup_docs"))
    )
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words)).alias("total_tokens"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias(
            "n_exact_dup_docs"
        ),
    )
    out = base.crossJoin(F.broadcast(near)).crossJoin(F.broadcast(spandocs))
    return retain(out, spans)
