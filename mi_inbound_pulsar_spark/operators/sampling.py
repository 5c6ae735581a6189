"""Deterministic sampling / splitting / chunking for training-data
pipelines.

Every operator here keys its randomness off ``md5`` of a stable record
id instead of an RNG, which buys three properties a 100 TB corpus
pipeline needs and ``rand()``/``sample()`` cannot give:

- **Reproducible**: the same document lands in the same split/sample on
  every run, any cluster size, any partitioning — no seed plumbing.
- **Stable under growth**: adding documents never reshuffles existing
  assignments (critical for train/test contamination control).
- **Distributed-free**: assignment is a narrow per-row projection — no
  shuffle, no global coordination, trivially pushed down next to the
  scan.

The md5 hex string is identical across engines, so every operator has
an exact DuckDB oracle. Thresholds compare the first hex byte
(256 buckets) as a *string* — portable with zero integer-parsing
differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.plans.ranking import bounded_window_input
from mi_inbound_pulsar_spark.operators.text import TOKEN_REGEX
from mi_inbound_pulsar_spark.sources.tables import load_table


def hash_bucket(col, salt: str):
    """First hex byte of md5(salt || value) — 256 deterministic buckets."""
    return F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 2)


@query(
    "q_hash_split",
    oracle="""
    WITH tagged AS (
      SELECT n_chars,
             CASE WHEN substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by hashed doc_id.

    Buckets '00'..'cc' (205/256 ≈ 80.1%) → train, 'cd'..'e5'
    (25/256 ≈ 9.8%) → val, rest → test. A document's split never
    changes as the corpus grows, and membership is decided row-local —
    the split is a free projection on top of the scan, no shuffle
    until the (tiny) per-split aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "split-")
    return (
        d.select(
            "n_chars",
            F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test").alias("split"),
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


@query(
    "q_doc_chunking",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 200
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_id,
             w[i*50 + 1 : least(len(w), (i+1)*50)] AS cw
      FROM toks, unnest(range(0, (len(w) - 1) // 50 + 1)) AS t(i)
      WHERE len(w) > 0
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(cw) AS BIGINT) AS n_chunk_tokens,
           cw[1] AS first_token
    FROM chunks ORDER BY doc_id, chunk_id
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into fixed
    50-token chunks (the last one ragged) — the standard pre-packing
    step before sequence assembly for training.

    Narrow op: tokenize once into an array column, explode a chunk
    index, slice per chunk. No shuffle at all (the ORDER BY is
    presentation); at 100 TB this runs entirely map-side and the
    output is written partition-parallel.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = d.select("doc_id", F.split("text", " ").alias("w")).filter(F.size("w") > 0)
    chunked = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.size("w") - 1) / F.lit(50)).cast("int"))
        ).alias("chunk_id"),
        "w",
    )
    return (
        chunked.select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice("w", F.col("chunk_id") * 50 + 1, 50).alias("cw"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("cw").cast("long").alias("n_chunk_tokens"),
            F.element_at("cw", 1).alias("first_token"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "q_quota_sample",
    oracle="""
    SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id
    FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('quota-' || CAST(doc_id AS VARCHAR))
             ) AS rn
      FROM documents
    )
    WHERE rn <= 10
    ORDER BY lang, rn
    """,
)
def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling: a deterministic 'random' 10 docs per
    language, ordered by hashed id (md5 is unique per id, so the order
    — and therefore the sample — is total and reproducible).

    Scale: one hash-shuffle on the group key; with heavy groups use the
    per-partition partial top-k pattern (TakeOrdered-per-group, see
    similarity.py) so no group ever materializes fully.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.concat(F.lit("quota-"), F.col("doc_id").cast("string"))))
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("lang", F.col("rn").cast("long").alias("rn"), "doc_id")
        .orderBy("lang", "rn")
    )


@query(
    "q_corpus_mixture",
    oracle="""
    WITH rated AS (
      SELECT source,
             CASE CAST(substring(source, 4) AS INTEGER) % 4
               WHEN 0 THEN 'ff' WHEN 1 THEN '80' WHEN 2 THEN '40' ELSE '1a' END AS thr,
             substring(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE b <= thr) AS BIGINT) AS n_kept
    FROM rated GROUP BY source ORDER BY source
    """,
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting: downsample each source at its own rate
    (100% / 50% / 25% / 10% by source index mod 4) via hash
    thresholding — how a training mix is rebalanced across crawls
    without ever materializing an intermediate corpus.

    Row-local decision (no shuffle before the per-source aggregate),
    reproducible, and monotone: lowering a source's rate only removes
    documents, it never swaps them — so mixtures can be retuned
    without invalidating downstream dedup/packing work.
    """
    d = load_table(spark, sf_dir, "documents")
    thr = (
        F.when(F.substring("source", 4, 10).cast("int") % 4 == 0, "ff")
        .when(F.substring("source", 4, 10).cast("int") % 4 == 1, "80")
        .when(F.substring("source", 4, 10).cast("int") % 4 == 2, "40")
        .otherwise("1a")
    )
    b = hash_bucket(F.col("doc_id"), "mix-")
    return (
        d.select("source", (b <= thr).alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("keep")).alias("n_kept"),
        )
        .orderBy("source")
    )


@query(
    "q_split_contamination",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, text,
             CASE WHEN substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    sh AS (
      SELECT split, doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT split, doc_id, string_split(text, ' ') AS w FROM tagged),
           unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
      GROUP BY ALL
    ),
    train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
    test_sh AS (SELECT doc_id, shingle FROM sh WHERE split = 'test')
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(tr.shingle) AS BIGINT) AS n_contaminated,
           round(count(tr.shingle) * 1.0 / count(*), 6) AS contamination
    FROM test_sh t LEFT JOIN train_sh tr ON t.shingle = tr.shingle
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: for every TEST document, the
    fraction of its distinct word-3-gram shingles that also occur in
    some TRAIN document — the decontamination check run before any
    evaluation on held-out data. Composes the hash split with the
    dedup shingle machinery.

    Scale: the probe is a broadcast-free inverted-index LEFT JOIN on
    the shingle key (train shingles deduped first, so the join input
    is the distinct-shingle set, not the corpus); contamination of the
    test sliver against a 100 TB train set shuffles only shingle keys.
    """
    from mi_inbound_pulsar_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "split-")
    split = F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    # filter each side BEFORE shingling: the split predicate is row-local
    # arithmetic on doc_id, so it pushes into the scan and each side
    # explodes only its own sliver (no corpus-wide shingle pass, no
    # re-attach join)
    train_sh = shingles(d.filter(split == "train"), n=3).select("shingle").distinct()
    test_sh = shingles(d.filter(split == "test"), n=3)
    return (
        test_sh.join(
            train_sh.withColumn("hit", F.lit(1)), "shingle", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias("contamination"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS stream_offset
      FROM toks
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(stream_offset AS BIGINT) AS stream_offset,
           CAST(stream_offset // 512 AS BIGINT) AS pack_start,
           CAST((stream_offset + n_tokens - 1) // 512 AS BIGINT) AS pack_end
    FROM packed ORDER BY source, doc_id
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by concatenation: documents of each source are
    laid out as one token stream (ordered by doc_id) and cut into
    fixed 512-token context windows — each doc gets its stream offset
    and the first/last pack it lands in. This is the concat-and-chunk
    packing GPT-style training uses (no padding, docs may straddle
    window boundaries).

    Plan: one window cumsum per source partition (integer-exact, so the
    oracle matches bit-for-bit), everything else row-local. At 100 TB
    packing runs per source shard in parallel; the running offset is
    the only cross-row dependency and it is a single window over the
    pack ordering — no iterative state.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("stream_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "stream_offset",
        F.floor(F.col("stream_offset") / 512).alias("pack_start"),
        F.floor((F.col("stream_offset") + F.col("n_tokens") - 1) / 512).alias("pack_end"),
    ).orderBy("source", "doc_id")


@query(
    "q_training_data_pipeline",
    oracle="""
    WITH quality AS (
      SELECT doc_id, source, text, len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE len(string_split(text, ' ')) >= 20
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
             arg_min(n_tokens, doc_id) AS n_tokens
      FROM quality GROUP BY md5(text)
    ),
    train AS (
      SELECT doc_id, source, n_tokens FROM deduped
      WHERE substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS stream_offset
      FROM train
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(stream_offset AS BIGINT) AS stream_offset,
           CAST(stream_offset // 512 AS BIGINT) AS pack_start
    FROM packed ORDER BY source, doc_id
    """,
)
def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data prep as ONE declarative plan:
    quality-filter → exact dedup → train-split selection → sequence
    packing. A user of the reference connector runs this instead of
    four jobs with three intermediate materializations.

    Stage shapes (all deterministic, end-to-end oracle-checked):
    1. quality gate — narrow filter (token count ≥ 20), pushed to scan;
    2. exact dedup — groupBy on md5(text): the shuffle carries a
       16-byte hash + tiny payload, min-doc_id keeper;
    3. split — row-local md5 bucket, train side kept;
    4. packing — per-source window cumsum, integer-exact offsets.
    Catalyst fuses 1+3 into the scan stage; total cost is one dedup
    shuffle + one window shuffle regardless of corpus size.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    quality = d.select(
        "doc_id", "source", "text", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 20)
    # keeper = min doc_id; passenger columns from the KEEPER row via
    # min_by — source is NOT md5-determined (cross-source duplicate
    # texts exist, observed at sf0.1), so any_value here would be
    # nondeterministic and break batch-twin/oracle parity
    deduped = (
        quality.groupBy(F.md5("text"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("source", "doc_id").alias("source"),
            F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        )
        .drop("md5(text)")
    )
    train = deduped.filter(hash_bucket(F.col("doc_id"), "split-") < "cd")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = train.withColumn("stream_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "stream_offset",
        F.floor(F.col("stream_offset") / 512).alias("pack_start"),
    ).orderBy("source", "doc_id")


@query(
    "q_stratified_split_check",
    oracle="""
    SELECT lang,
           CASE WHEN substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                  THEN 'train'
                WHEN substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    ORDER BY lang, split
    """,
)
def q_stratified_split_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification audit of the hash split: per-(language, split)
    document counts. Because the hash is independent of every document
    attribute, the 80/10/10 proportions hold inside each stratum
    without any per-stratum logic — this query is the evidence an ML
    team checks before trusting a split (and the input to a chi-square
    test if they want one). Row-local tag + one small aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "split-")
    return (
        d.select(
            "lang",
            F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test").alias("split"),
        )
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


@query(
    "q_mixture_upsample",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source,
             CASE CAST(substring(source, 4) AS INTEGER) % 3
               WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END AS n_epochs
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
    FROM weighted, unnest(generate_series(1, n_epochs)) AS t(epoch)
    ORDER BY doc_id, epoch
    """,
)
def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upsampling half of mixture weighting: replicate each
    document n_epochs times (per-source integer weights) by exploding
    a sequence — how high-quality sources see multiple epochs in a
    training mix. Deterministic, map-side (the replication happens in
    the Expand/Generate node, no shuffle), and the epoch index rides
    along so downstream packing can interleave copies.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    n_epochs = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, 1)
        .when(F.substring("source", 4, 10).cast("int") % 3 == 1, 2)
        .otherwise(3)
    )
    return (
        d.select("doc_id", "source", n_epochs.alias("n_epochs"))
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_epochs"))).alias("epoch"),
        )
        .select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))
        .orderBy("doc_id", "epoch")
    )


@query(
    "q_length_bucketing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tokens,
             ntile(10) OVER (ORDER BY n_tokens, doc_id) AS bucket
      FROM toks
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT) AS padding_waste
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def q_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing for padded batching: documents ntile'd into 10
    equal-size buckets by token count (ties broken by doc_id for a
    total order), with the per-bucket padding waste a max-length-padded
    batch would incur — the op that decides bucket boundaries when
    sequences are batched padded instead of packed (the
    ``q_sequence_packing`` alternative).

    ntile needs a global order, but NOT a global sort: the two-phase
    distributed rank (``plans/ranking.py`` — range shuffle on
    (n_tokens, doc_id), broadcast prefix offsets, partition-local
    row_number) plus the closed-form ntile formula give the exact
    same buckets with every stage parallel. Everything after is a
    small aggregate.
    """
    from ..plans.ranking import attach_global_order_stats, ntile_from_rn

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    ranked, total = attach_global_order_stats(
        toks, [F.asc("n_tokens"), F.asc("doc_id")], rn_col="__rn"
    )
    b = ranked.withColumn("bucket", ntile_from_rn(F.col("__rn"), total, 10))
    return (
        b.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            (F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens")).alias(
                "padding_waste"
            ),
        )
        .orderBy("bucket")
    )


@query(
    "q_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)) % 64 AS bucket
      FROM tok
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM hashed GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization: every token maps to one of 64
    feature buckets via its md5 prefix, and a document becomes the
    sparse (bucket, count) vector — the fixed-dimension, vocabulary-
    free featurizer (no dictionary to build, ship, or keep in sync;
    collisions are the accepted trade). The bucket index is derived
    from the md5 *hex string* with pure string arithmetic, so the
    exact same feature space exists in any engine — the portability
    property that makes train/serve skew checkable across stacks.

    Scale: explode → narrow hash expression → one (doc, bucket) hash
    aggregate with map-side combine; output is bounded by docs × 64,
    independent of vocabulary size.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    lut = "0123456789abcdef"
    v1 = F.expr(f"instr('{lut}', substring(md5(cast(tok as binary)), 1, 1))") - 1
    v2 = F.expr(f"instr('{lut}', substring(md5(cast(tok as binary)), 2, 1))") - 1
    bucket = ((v1 * 16 + v2) % 64).cast("long")
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("doc_id", "bucket")
    )


@query(
    "q_bottomk_sample",
    oracle="""
    WITH pri AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR) || ':bk') AS priority
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, priority,
             row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn
      FROM pri
    )
    SELECT lang, doc_id, rn AS sample_rank
    FROM ranked WHERE rn <= 20
    ORDER BY lang, sample_rank
    """,
)
def q_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sampling via hash priorities: the bottom-k
    documents per language by md5(doc_id). A hash priority is a uniform
    [0,1) draw that needs no RNG state, so the sample is (a) identical
    on any cluster shape, (b) *mergeable* — the bottom-k of a union is
    the bottom-k of each part's bottom-k, which is how per-partition
    candidates fold map-side before one tiny per-group merge, and
    (c) consistent under corpus growth (a new doc only enters the
    sample by evicting the current max priority).

    Plan: TakeOrdered-per-group — per-partition bottom-k candidates,
    then a row_number over ≤ k·n_partitions rows per group. The corpus
    never globally sorts.
    """
    d = load_table(spark, sf_dir, "documents")
    pri = d.select(
        "doc_id", "lang", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":bk"))).alias("priority")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        pri.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 20)
        .select("lang", "doc_id", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@query(
    "q_pseudonymize",
    oracle="""
    SELECT sha256('u2026:' || CAST(user_id AS VARCHAR)) AS user_token,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY user_token
    """,
)
def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-hash pseudonymization of the user identifier before the
    events table leaves the trust boundary — joins and per-user
    aggregates still work on the token, but the raw id is gone. The
    standard privacy pass before exporting analytics extracts or
    training data.

    Plan: the hash is a codegen'd projection; the aggregate groups on
    the original id (so the hash is computed once per user post-agg
    would be wrong — per-row hashing keeps the pipeline order-free) and
    the shuffle key stays the 8-byte id, not the 32-byte token.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .select(
            F.sha2(F.concat(F.lit("u2026:"), F.col("user_id").cast("string")), 256).alias(
                "user_token"
            ),
            "n_events",
            "n_types",
        )
        .orderBy("user_token")
    )


@query(
    "q_bloom_contamination",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, b, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM docs, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)
    ),
    train_pos AS (
      SELECT DISTINCT CAST(('0x' || substring(md5('bf:' || shingle), p.s, 8)) AS BIGINT)
                        % 262144 AS pos
      FROM sh, (VALUES (1), (9), (17)) AS p(s)
      WHERE b < 'cd'
    ),
    test_probe AS (
      SELECT doc_id, shingle,
             CAST(('0x' || substring(md5('bf:' || shingle), p.s, 8)) AS BIGINT)
               % 262144 AS pos
      FROM sh, (VALUES (1), (9), (17)) AS p(s)
      WHERE b >= 'e6'
    ),
    probed AS (
      SELECT doc_id, shingle,
             bool_and(tp.pos IS NOT NULL) AS hit
      FROM test_probe LEFT JOIN train_pos tp USING (pos)
      GROUP BY doc_id, shingle
    )
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
           (sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0) AS flagged
    FROM probed
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination screen: test-split documents probed
    against a 2^18-position, 3-hash Bloom filter built from the
    train split's 3-gram shingles.

    This is the *bounded-state* twin of the exact shingle-join audit
    (``q_split_contamination``): the membership structure is the
    DISTINCT set of md5-derived bit positions, whose size is capped by
    the filter width M = 262 144 **no matter how large the train corpus
    grows** — so the probe side always joins against a broadcastable,
    fixed-size table, where the exact audit's train-shingle index grows
    with the corpus. No false negatives by construction (every train
    shingle sets its 3 positions); false positives are the price, which
    is why ``flagged`` here can only over-report vs the exact audit.

    The oracle replays the filter bit-for-bit (same md5 slices, same
    modulus, same position semi-join), so this is hash-exact, not a
    bounded gate. Plan: two narrow shingle passes, one distinct on
    positions (≤ M rows), one broadcast left join + two aggregates.
    """
    from mi_inbound_pulsar_spark.operators.dedup import shingles

    M = 262144
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "split-")
    tagged = d.withColumn("_b", b)
    sh_train = shingles(tagged.filter(F.col("_b") < "cd"))
    sh_test = shingles(tagged.filter(F.col("_b") >= "e6"))

    def positions(sh_df):
        h = F.md5(F.concat(F.lit("bf:"), F.col("shingle")))
        out = None
        for start in (1, 9, 17):
            pos = (F.conv(F.substring(h, start, 8), 16, 10).cast("long") % M).alias("pos")
            part = sh_df.select("doc_id", "shingle", pos)
            out = part if out is None else out.unionByName(part)
        return out

    train_pos = positions(sh_train).select("pos").distinct()
    probed = (
        positions(sh_test)
        .join(F.broadcast(train_pos.withColumn("_present", F.lit(True))), "pos", "left")
        .groupBy("doc_id", "shingle")
        .agg(F.bool_and(F.coalesce(F.col("_present"), F.lit(False))).alias("hit"))
    )
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("hit").cast("int")).cast("long").alias("n_bloom_hits"),
            (F.sum(F.col("hit").cast("int")) > 0).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_weighted_sample",
    oracle="""
    WITH hexed AS (
      SELECT doc_id, source, n_chars,
             substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 6) AS h
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, n_chars,
             list_reduce(
               [strpos('0123456789abcdef', substr(h, i, 1)) - 1 FOR i IN range(1, 7)],
               (acc, d) -> acc * 16 + d
             ) AS u_int
      FROM hexed
    ),
    scored AS (
      SELECT doc_id, source, n_chars,
             pow((u_int + 0.5) / 16777216.0, 1.0 / n_chars) AS k
      FROM keyed
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY k DESC, doc_id
      ) AS rnk FROM scored
    )
    SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, round(k, 6) AS sample_key
    FROM ranked WHERE rnk <= 10
    ORDER BY source, rnk
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each document draws key u^(1/w) from a DETERMINISTIC
    pseudo-random u (md5-derived, the repo's standard engine-portable
    randomness) with weight w = n_chars, and the top-10 keys per
    source are the sample — longer documents proportionally likelier,
    reproducible across engines and runs. This is how a quality- or
    length-weighted corpus subsample is drawn distributedly: no global
    state, no rejection loop, one per-group top-k.

    Scale: key assignment is a narrow codegen'd expression; top-10 per
    source is the bounded window pattern (partial top-k per partition
    via the rank filter). The u_int is 24 bits of md5 — plenty for
    sample selection; widen to 52 bits (13 hex digits) if populations
    per group exceed ~10^6.
    """
    d = load_table(spark, sf_dir, "documents")
    u_int = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 6),
        16,
        10,
    ).cast("long")
    k = F.pow((u_int + 0.5) / 16777216.0, 1.0 / F.col("n_chars"))
    w = Window.partitionBy("source").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        d.select("doc_id", "source", "n_chars", k.alias("k"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select(
            "source",
            "rnk",
            "doc_id",
            "n_chars",
            F.round("k", 6).alias("sample_key"),
        )
        .orderBy("source", "rnk")
    )


@query(
    "q_kfold_assignment",
    oracle="""
    WITH folds AS (
      SELECT n_chars,
             ((strpos('0123456789abcdef',
                      substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef',
                      substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 5
               AS fold
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM folds)
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           abs(count(*) - n / 5.0) / (n / 5.0) < 0.2 AS balanced
    FROM folds, tot
    GROUP BY fold, n
    ORDER BY fold
    """,
)
def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k = 5): fold
    = md5-derived byte mod k, so membership is reproducible, stable
    under corpus growth, and decided row-locally — a document is in
    exactly one fold by construction (it's a pure function of doc_id),
    which is the leakage guarantee CV needs. Reports per-fold size /
    char mass and a balance flag (within 20% of n/k).

    Scale: narrow projection + one k-row aggregate; the total-count
    side is a broadcast scalar. Same md5 idiom as q_hash_split — the
    two compose (split first, fold within train) without correlation
    because the salts differ.
    """
    d = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    folds = d.select("n_chars", fold.alias("fold"))
    tot = folds.agg(F.count(F.lit(1)).alias("n"))
    return (
        folds.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_docs",
            "total_chars",
            (F.abs(F.col("n_docs") - F.col("n") / 5.0) / (F.col("n") / 5.0) < 0.2).alias(
                "balanced"
            ),
        )
        .orderBy("fold")
    )


@query(
    "q_quantile_normalize",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile,
             count(*) OVER () AS n
      FROM documents
    )
    SELECT doc_id, n_chars, CAST(rn AS BIGINT) AS rn,
           CAST(rn - 1 AS DOUBLE) / (n - 1) AS pct,
           CAST(decile AS BIGINT) AS decile
    FROM r ORDER BY doc_id
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of a corpus feature: map each document's
    length to its exact empirical quantile (ordinal rank / N-1, total
    order tiebroken by doc_id) plus its decile — the rank-transform a
    curriculum sampler or feature-scaling pass applies before mixing.

    Scale: exact global ranks WITHOUT a single-partition sort, via
    ``plans/ranking.attach_global_order_stats`` (range shuffle →
    O(partitions) offset collect → broadcast prefix + per-partition
    windows; every stage parallel) and the closed-form
    ``ntile_from_rn``. Same machinery as ``q_length_bucketing`` /
    ``q_rfm_segmentation``; the oracle's global window is the
    single-node equivalent the distributed plan must hash-match.
    """
    from ..plans.ranking import attach_global_order_stats, ntile_from_rn

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked, total = attach_global_order_stats(
        d, [F.col("n_chars"), F.col("doc_id")], rn_col="rn"
    )
    return ranked.select(
        "doc_id",
        "n_chars",
        "rn",
        ((F.col("rn") - 1).cast("double") / (total - 1)).alias("pct"),
        ntile_from_rn(F.col("rn"), total, 10).alias("decile"),
    ).orderBy("doc_id")


@query(
    "q_temperature_mixture",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    wts AS (
      -- round to 6dp BEFORE the decimal cast so the rounding rule is
      -- pinned by us, not inherited from each engine's double->decimal
      -- cast behavior at exact half-ulp boundaries
      SELECT *, CAST(round(sqrt(n_tokens), 6) AS DECIMAL(28,6)) AS sq FROM src
    ),
    tot AS (
      SELECT sum(sq) AS sum_sq, sum(n_tokens) AS total_tokens FROM wts
    )
    SELECT source, n_docs, n_tokens,
           round(CAST(sq AS DOUBLE) / CAST(sum_sq AS DOUBLE), 6) AS weight,
           round(least(1.0,
             ((0.5 * total_tokens) * CAST(sq AS DOUBLE))
               / (CAST(sum_sq AS DOUBLE) * n_tokens)), 6) AS sample_rate,
           CAST(round(least(1.0,
             ((0.5 * total_tokens) * CAST(sq AS DOUBLE))
               / (CAST(sum_sq AS DOUBLE) * n_tokens)) * n_tokens, 0) AS BIGINT)
             AS target_tokens
    FROM wts, tot
    ORDER BY source
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weighting (alpha = 0.5), the
    multilingual/multi-source rebalancing rule from the mBERT / XLM-R
    / Gopher data recipes: a source with T_i tokens gets sampling
    weight ``w_i = T_i^alpha / sum_j T_j^alpha`` — up-weighting the
    tail sources relative to their raw share — and the per-source
    sampling *rate* needed to hit a 50%-of-corpus token budget is
    ``min(1, budget * w_i / T_i)``. Unlike :func:`q_corpus_mixture`
    (fixed hand-set rates) the rates here are *derived from corpus
    statistics*, which is how the mixture is actually tuned: one
    aggregation pass over the corpus, a driver-side scalar reduce,
    and the resulting rates feed the same hash-threshold keep rule.

    Float-determinism: sqrt(T_i) is rounded into DECIMAL(28,6) before
    the denominator sum, so the cross-source accumulation is *exact
    decimal* arithmetic in both engines (no float-summation-order
    hazard — the q_nearest_centroid lesson); the final ratios are
    computed with an identical parenthesization per row.

    Scale: one groupBy over the corpus (map-side partial agg -> ~one
    row per source), a broadcastable scalar total, row-local rate
    arithmetic. The expensive part never touches document text.
    """
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_tokens")
    )
    # explicit 6dp round before the decimal cast: pins the rounding rule
    # (Spark's cast is HALF_UP, DuckDB's may differ at an exact boundary)
    wts = src.withColumn("sq", F.round(F.sqrt("n_tokens"), 6).cast("decimal(28,6)"))
    tot = wts.agg(
        F.sum("sq").alias("sum_sq"), F.sum("n_tokens").alias("total_tokens")
    )
    sq_d = F.col("sq").cast("double")
    sum_sq_d = F.col("sum_sq").cast("double")
    rate = F.least(
        F.lit(1.0),
        ((F.lit(0.5) * F.col("total_tokens")) * sq_d) / (sum_sq_d * F.col("n_tokens")),
    )
    return (
        wts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(sq_d / sum_sq_d, 6).alias("weight"),
            F.round(rate, 6).alias("sample_rate"),
            F.round(rate * F.col("n_tokens"), 0).cast("long").alias("target_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# T5-style span corruption (text-to-text pretraining pair generation)
# --------------------------------------------------------------------------
SPAN_WINDOW = 20  # one masked span per 20-token window ...
SPAN_START = 8  # ... starting at window offset 8 ...
SPAN_LEN = 3  # ... 3 tokens long => 15% corruption, mean span 3 (T5's recipe)


@query(
    "q_span_corruption",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    toks AS (
      SELECT doc_id, w[i] AS tok, i - 1 AS pos
      FROM docs, unnest(generate_series(1, n_tokens)) AS u(i)
    ),
    marked AS (
      SELECT doc_id, tok, pos,
             pos % {SPAN_WINDOW} AS off, pos // {SPAN_WINDOW} AS win
      FROM toks
    )
    SELECT doc_id,
           CAST(count(*) FILTER (
             WHERE off BETWEEN {SPAN_START} AND {SPAN_START + SPAN_LEN - 1}
           ) AS BIGINT) AS n_masked,
           coalesce(string_agg(
             CASE WHEN off = {SPAN_START}
                    THEN '<extra_id_' || win || '>'
                  WHEN off BETWEEN {SPAN_START + 1} AND {SPAN_START + SPAN_LEN - 1}
                    THEN NULL
                  ELSE tok END, ' ' ORDER BY pos), '') AS input_text,
           coalesce(string_agg(
             CASE WHEN off = {SPAN_START}
                    THEN '<extra_id_' || win || '> ' || tok
                  WHEN off BETWEEN {SPAN_START + 1} AND {SPAN_START + SPAN_LEN - 1}
                    THEN tok
                  END, ' ' ORDER BY pos), '') AS target_text
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020): mask a 3-token
    span in every 20-token window (15% corruption, mean span 3 — the
    T5 recipe, made deterministic: window w masks offsets 8-10 and
    gets sentinel ``<extra_id_w>``), emitting the (input, target)
    text-to-text pretraining pair per document. Deterministic span
    placement is what makes the pair generation oracle-replayable;
    a production build swaps in seeded randomness per (doc_id, epoch).

    Scale: entirely row-local — one ``transform`` over the token array
    builds both sides with no explode and no shuffle; the corpus scan
    is the whole plan. Short documents (< 9 tokens) yield an untouched
    input and an empty target, exactly like T5's packing of short
    sequences.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")

    def _classify(t, i):
        off = i % SPAN_WINDOW
        win = F.floor(i / SPAN_WINDOW).cast("int")
        sentinel = F.concat(F.lit("<extra_id_"), win.cast("string"), F.lit(">"))
        return off, sentinel

    def input_item(t, i):
        off, sentinel = _classify(t, i)
        return (
            F.when(off == SPAN_START, sentinel)
            .when(off.between(SPAN_START + 1, SPAN_START + SPAN_LEN - 1), F.lit(None))
            .otherwise(t)
        )

    def target_item(t, i):
        off, sentinel = _classify(t, i)
        return F.when(
            off == SPAN_START, F.concat(sentinel, F.lit(" "), t)
        ).when(off.between(SPAN_START + 1, SPAN_START + SPAN_LEN - 1), t)

    def joined(items):
        return F.array_join(F.filter(items, lambda x: x.isNotNull()), " ")

    n_masked = F.size(
        F.filter(
            F.transform(w, lambda t, i: i),
            lambda i: (i % SPAN_WINDOW).between(SPAN_START, SPAN_START + SPAN_LEN - 1),
        )
    ).cast("long")
    return d.select(
        "doc_id",
        n_masked.alias("n_masked"),
        joined(F.transform(w, input_item)).alias("input_text"),
        joined(F.transform(w, target_item)).alias("target_text"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Neyman optimal stratified allocation
# --------------------------------------------------------------------------
NEYMAN_BUDGET = 1000  # total documents to sample across strata


@query(
    "q_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             stddev_samp(n_chars) AS sd
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_docs * sd) AS denom FROM s)
    SELECT source, n_docs, round(sd, 6) AS stddev_chars,
           round(n_docs * sd / denom, 6) AS alloc_frac,
           CAST(least(
             CAST(round({NEYMAN_BUDGET} * n_docs * sd / denom, 0) AS BIGINT),
             n_docs) AS BIGINT) AS alloc_docs
    FROM s, tot
    ORDER BY source
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified-sample allocation (Neyman 1934):
    distribute a {NEYMAN_BUDGET}-document annotation/eval budget across
    sources proportionally to N_h·S_h — high-variance strata get more
    of the budget than proportional allocation would give, minimizing
    the estimator's variance at fixed cost. The statistical planning
    step upstream of ``q_quota_sample``/``q_stratified_split_check``
    (which execute a chosen allocation); allocations are capped at the
    stratum size.

    Scale: one groupBy keyed by source (map-side partial stddev via
    the (n, Σx, Σx²) moments), a broadcastable scalar denominator,
    row-local allocation arithmetic. ``stddev_samp`` shares the same
    definition in both engines; all emitted floats round to 6dp.
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.stddev_samp("n_chars").alias("sd"),
    )
    tot = s.agg(F.sum(F.col("n_docs") * F.col("sd")).alias("denom"))
    share = F.col("n_docs") * F.col("sd") / F.col("denom")
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round("sd", 6).alias("stddev_chars"),
            F.round(share, 6).alias("alloc_frac"),
            F.least(
                F.round(NEYMAN_BUDGET * share, 0).cast("long"), F.col("n_docs")
            ).alias("alloc_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# DSIR data selection (Xie et al. 2023, arXiv:2302.03169)
# --------------------------------------------------------------------------
DSIR_BUCKETS = 1024
DSIR_TARGET_SOURCE = "src0"
DSIR_KEEP_QUANTILE = 0.8


@query(
    "q_dsir_selection",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    tok AS (
      SELECT doc_id, source,
             CAST(concat('0x', substring(md5(u.x), 1, 8)) AS BIGINT)
               % {DSIR_BUCKETS} AS b
      FROM docs, unnest(w) AS u(x)
    ),
    tgt AS (SELECT b, count(*) AS c FROM tok
            WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b),
    raw AS (SELECT b, count(*) AS c FROM tok GROUP BY b),
    nt AS (SELECT sum(c) AS n FROM tgt),
    nr AS (SELECT sum(c) AS n FROM raw),
    ratio AS (
      SELECT r.b,
             ln((coalesce(t.c, 0) + 1.0) / (nt.n + {DSIR_BUCKETS}))
               - ln((r.c + 1.0) / (nr.n + {DSIR_BUCKETS})) AS lr
      FROM raw r LEFT JOIN tgt t USING (b), nt, nr
    ),
    scores AS (
      SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             sum(ratio.lr) AS s
      FROM tok JOIN ratio USING (b) GROUP BY tok.doc_id
    ),
    thr AS (SELECT quantile_cont(s, {DSIR_KEEP_QUANTILE}) AS t FROM scores)
    SELECT doc_id, n_tokens, round(s, 6) AS dsir_logweight,
           round(s, 6) >= round(thr.t, 6) AS selected
    FROM scores, thr ORDER BY doc_id
    """,
)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023): score every raw document by how much its hashed-unigram
    distribution looks like a TARGET domain (here ``src0``) vs the raw
    corpus, keep the top quantile. The per-document log importance
    weight is Σ_w log(p_target(bucket(w)) / p_raw(bucket(w))) with
    add-1 smoothing over {DSIR_BUCKETS} feature-hash buckets — the
    paper's bag-of-hashed-ngrams estimator, the standard cheap
    domain-matching selector for pretraining corpora.

    Scale: both bucket distributions aggregate to at most
    {DSIR_BUCKETS} rows (feature hashing bounds the vocabulary by
    construction — the point of DSIR's estimator); the log-ratio
    table broadcasts; per-document scoring is one map-side-combined
    groupBy over the token stream. Only the tiny threshold aggregate
    is global. The md5-prefix bucket hash is engine-portable (the
    ``q_simhash_signatures`` recipe).
    """
    from mi_inbound_pulsar_spark.functions.arrays import explode_computed

    d = load_table(spark, sf_dir, "documents")
    tok_col, keep = explode_computed(F.split(F.col("text"), " "), "w")
    tok = (
        d.select("doc_id", "source", tok_col)
        .filter(keep)
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
                % DSIR_BUCKETS
            ).alias("b"),
        )
    )
    tgt = (
        tok.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    nt = tgt.agg(F.sum("tc").alias("nt"))
    nr = raw.agg(F.sum("rc").alias("nr"))
    ratio = (
        raw.join(tgt, "b", "left")
        .crossJoin(nt)
        .crossJoin(nr)
        .select(
            "b",
            (
                F.log((F.coalesce("tc", F.lit(0)) + 1.0) / (F.col("nt") + DSIR_BUCKETS))
                - F.log((F.col("rc") + 1.0) / (F.col("nr") + DSIR_BUCKETS))
            ).alias("lr"),
        )
    )
    scores = (
        tok.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lr").alias("s"))
    )
    thr = scores.agg(F.percentile("s", F.lit(DSIR_KEEP_QUANTILE)).alias("t"))
    return (
        scores.crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "n_tokens",
            F.round("s", 6).alias("dsir_logweight"),
            (F.round("s", 6) >= F.round("t", 6)).alias("selected"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Horvitz-Thompson estimation under the deterministic stratified sample
# --------------------------------------------------------------------------
HT_RATES = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.75}


@query(
    "q_horvitz_thompson",
    oracle=f"""
    WITH rates AS (
      SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in HT_RATES.items())})
        AS t(lang, pi)
    ),
    tagged AS (
      SELECT d.lang, d.n_chars, r.pi,
             substr(md5('ht:' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS h
      FROM documents d JOIN rates r USING (lang)
    ),
    sampled AS (
      SELECT lang, n_chars, pi FROM tagged
      WHERE CAST(concat('0x', h) AS BIGINT) < pi * 65536
    )
    SELECT t.lang,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(t.true_chars AS BIGINT) AS true_chars,
           CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           round(coalesce(s.ht_chars, 0.0), 6) AS ht_chars,
           round(coalesce(s.ht_chars, 0.0) / t.true_chars - 1, 6) AS rel_error
    FROM (
      SELECT lang, count(*) AS n_docs, sum(n_chars) AS true_chars
      FROM documents GROUP BY lang
    ) t
    LEFT JOIN (
      SELECT lang, count(*) AS n_sampled, sum(n_chars / pi) AS ht_chars
      FROM sampled GROUP BY lang
    ) s USING (lang)
    ORDER BY t.lang
    """,
)
def q_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimation (Horvitz & Thompson 1952) under the
    repo's deterministic stratified Bernoulli sample: each language
    stratum samples at a known inclusion probability π (md5-bucket
    membership — reproducible, RNG-free), and the stratum total of
    ``n_chars`` is estimated as Σ y/π over sampled rows only. Emits
    the estimate next to the true total and its relative error — the
    audit that certifies a sampling pipeline's estimator is unbiased
    *before* anyone trusts sampled metrics at 100 TB (where the true
    total is only affordable on small strata).

    Scale: membership is a row-local hash compare (16-bit bucket vs
    π·65536); both aggregates are one map-side-combined groupBy each.
    The π table is a broadcast literal; the HT sum divides exact
    integers by a fixed dyadic-friendly π, rounded 6dp identically.
    """
    d = load_table(spark, sf_dir, "documents")
    rates = d.sparkSession.createDataFrame(
        list(HT_RATES.items()), "lang string, pi double"
    )
    h16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ht:"), F.col("doc_id").cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    tagged = d.join(F.broadcast(rates), "lang").select(
        "lang", "n_chars", "pi", h16.alias("h")
    )
    sampled = tagged.filter(F.col("h") < F.col("pi") * 65536)
    truth = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("true_chars")
    )
    est = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("n_chars") / F.col("pi")).alias("ht_chars"),
    )
    return (
        truth.join(est, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "true_chars",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.round(F.coalesce("ht_chars", F.lit(0.0)), 6).alias("ht_chars"),
            F.round(
                F.coalesce("ht_chars", F.lit(0.0)) / F.col("true_chars") - 1, 6
            ).alias("rel_error"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Differentially-private noisy histogram (seeded-Laplace release)
# --------------------------------------------------------------------------
DP_EPSILON = 1.0  # per-count privacy budget; sensitivity 1 => scale b = 1/eps


@query(
    "q_dp_noisy_histogram",
    oracle=f"""
    WITH cell AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_n
      FROM events GROUP BY event_type
    ),
    noise AS (
      SELECT event_type, true_n,
             (CAST('0x' || substr(md5('dp:' || event_type), 1, 13) AS BIGINT)
              + 0.5) / 4503599627370496.0 - 0.5 AS u
      FROM cell
    )
    SELECT event_type, true_n,
           round(true_n - (1.0 / {DP_EPSILON}) * sign(u)
                 * ln(1 - 2 * abs(u)), 6) AS noisy_n,
           round(- (1.0 / {DP_EPSILON}) * sign(u) * ln(1 - 2 * abs(u)), 6)
             AS laplace_noise
    FROM noise ORDER BY event_type
    """,
)
def q_dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private histogram release (Dwork et al. 2006):
    each event-type count gets Laplace(1/ε) noise (sensitivity 1 —
    one user event moves any count by at most 1) at ε={DP_EPSILON}.
    The noise draw is the repo's standard ENGINE-PORTABLE determinism
    pattern: u = md5-derived 52-bit uniform in (−0.5, 0.5), mapped
    through the Laplace inverse CDF −b·sign(u)·ln(1−2|u|) — so the
    release is reproducible across engines and runs (the salt string
    is the release id; a true deployment would draw fresh noise per
    release and this query IS that release function). True counts are
    emitted alongside for the oracle check; a production release
    would drop them.

    Hash-exactness: the uniform is an exact dyadic rational of a
    53-bit integer (13 hex digits + the half-up offset), identical in
    Spark (``conv(substr(md5,1,13),16,10)``) and DuckDB
    (``CAST('0x'||... AS BIGINT)``); the inverse CDF is one
    deterministic double expression, 6dp-rounded.

    Scale: one vocabulary-bounded count aggregate; noise is a narrow
    row-local expression over the |event_types|-row rollup. This is
    the histogram primitive under every DP analytics release (counts,
    marginals, CDFs) — wider marginals just change the groupBy keys.
    """
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 13), 16, 10).cast(
            "long"
        )
        + 0.5
    ) / 4503599627370496.0 - 0.5
    lap = -(1.0 / DP_EPSILON) * F.signum(u) * F.log(1 - 2 * F.abs(u))
    return (
        cell.select(
            "event_type",
            "true_n",
            F.round(F.col("true_n") + lap, 6).alias("noisy_n"),
            F.round(lap, 6).alias("laplace_noise"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, one MW step)
# --------------------------------------------------------------------------
DOREMI_ETA = 0.5  # multiplicative-weights step size
DOREMI_EPS = 0.01  # uniform smoothing of the final mixture


@query(
    "q_doremi_reweight",
    oracle=f"""
    WITH per AS (
      SELECT source, strlen(text) AS nb,
             len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS nt
      FROM documents
    ),
    dom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nb) AS BIGINT) AS bsum,
             CAST(sum(nt) AS BIGINT) AS tsum
      FROM per GROUP BY source
    ),
    corpus AS (
      SELECT sum(nb) * 1.0 / sum(nt) AS proxy_c FROM per
    ),
    ex AS (
      SELECT source, n_docs, bsum * 1.0 / tsum AS proxy_d,
             greatest(round(bsum * 1.0 / tsum - proxy_c, 9), 0.0) AS excess
      FROM dom, corpus
    ),
    wr AS (
      SELECT *, exp({DOREMI_ETA} * excess) AS w_raw FROM ex
    ),
    z AS (
      SELECT sum(w_raw) AS z, count(*) AS k FROM wr
    )
    SELECT source, n_docs,
           round(proxy_d, 6) AS bytes_per_token,
           round(excess, 6) AS excess_loss,
           round(w_raw / z, 6) AS domain_weight,
           round((1 - {DOREMI_EPS}) * (w_raw / z) + {DOREMI_EPS} / k, 6)
             AS mixture_weight
    FROM wr, z
    ORDER BY source
    """,
)
def q_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi multiplicative-weights step (Xie et al. 2023,
    "Doremi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): per-source domain weights αᵈ ∝ exp(η·excess_lossᵈ),
    smoothed with a uniform ε-mixture — the domain-reweighting
    recipe production pre-training mixtures are tuned with. The
    excess-loss proxy is each domain's bytes-per-token above the
    corpus mean (clipped at 0, DoReMi's λ⁺): byte-dense domains are
    "harder" for the tokenizer-budgeted reference model, standing in
    for the per-domain excess log-loss a real proxy-model run
    produces. Swapping in measured losses is a one-column change.

    Hash-exactness: the proxies are ratios of exact integer sums; the
    excess is rounded to 9dp BEFORE exp so both engines exponentiate
    the identical double (η=0.5 is a power of two, so the product is
    exact); the softmax denominator is a sum over the domain set (≤
    dozens), keeping any summation-order ulp far under the 6dp output
    rounding.

    Scale: corpus collapses to the source-domain rollup (tiny) in one
    pass; everything after is arithmetic over ≤|domains| rows. The
    100 TB form is identical — DoReMi's state is by construction
    domain-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.octet_length("text").alias("nb"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0)
        ).alias("nt"),
    )
    dom = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").alias("bsum"),
        F.sum("nt").alias("tsum"),
    )
    corpus = per.agg(
        (F.sum("nb") * F.lit(1.0) / F.sum("nt")).alias("proxy_c")
    )
    proxy_d = F.col("bsum") * F.lit(1.0) / F.col("tsum")
    ex = dom.crossJoin(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        proxy_d.alias("proxy_d"),
        F.greatest(
            F.round(proxy_d - F.col("proxy_c"), 9), F.lit(0.0)
        ).alias("excess"),
    )
    wr = ex.select(
        "*", F.exp(F.lit(DOREMI_ETA) * F.col("excess")).alias("w_raw")
    )
    z = wr.agg(F.sum("w_raw").alias("z"), F.count(F.lit(1)).alias("k"))
    weight = F.col("w_raw") / F.col("z")
    return (
        wr.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.round("proxy_d", 6).alias("bytes_per_token"),
            F.round("excess", 6).alias("excess_loss"),
            F.round(weight, 6).alias("domain_weight"),
            F.round(
                F.lit(1 - DOREMI_EPS) * weight + F.lit(DOREMI_EPS) / F.col("k"),
                6,
            ).alias("mixture_weight"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# DP median via the exponential mechanism (deterministic Gumbel trick)
# --------------------------------------------------------------------------
# round-10 recalibration: at eps=1.0 the mechanism was effectively
# deterministic on this domain (rank_error identically 0 at every
# scale factor - the utility gaps dwarf Gumbel noise, so the noise
# path was oracle-green dead code). eps=0.02 is a strong-privacy
# regime where the perturbation genuinely flips the argmax at all
# three scale factors (measured rank_error 41 / 33 / 76 doc-ranks),
# while accuracy still visibly improves with n - the DP tradeoff the
# rank_error column exists to show.
DPQ_EPSILON = 0.02


@query(
    "q_dp_quantile_exponential",
    oracle=f"""
    WITH vc AS (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1
    ),
    cum AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum_le,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM vc
    ),
    scored AS (
      SELECT v, cum_le, n,
             -abs(cum_le - n / 2.0) AS u,
             (CAST('0x' || substr(md5('dpq:' || CAST(v AS VARCHAR)), 1, 13)
                   AS BIGINT) + 0.5) / 4503599627370496.0 AS unif
      FROM cum
    ),
    keyed AS (
      SELECT v, cum_le, n,
             {DPQ_EPSILON} / 2 * u + (-ln(-ln(unif))) AS gumbel_key
      FROM scored
    ),
    true_med AS (SELECT min(v) AS tm FROM cum WHERE cum_le * 2 >= n),
    win AS (
      SELECT v, cum_le, n FROM keyed
      ORDER BY round(gumbel_key, 9) DESC, v LIMIT 1
    )
    SELECT w.n, t.tm AS true_median, w.v AS dp_median,
           CAST(abs(w.cum_le - (SELECT cum_le FROM cum WHERE v = t.tm))
                AS BIGINT) AS rank_error,
           CAST({DPQ_EPSILON} AS DOUBLE) AS epsilon
    FROM win w, true_med t
    """,
)
def q_dp_quantile_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP median of document length via the exponential mechanism
    (McSherry & Talwar 2007) with utility u(v) = −|#{{x ≤ v}} − n/2|
    (sensitivity 1) over the candidate value domain, sampled with the
    Gumbel-max trick: argmax(εu/2 + Gumbel(0,1)) IS an exponential-
    mechanism draw, and the Gumbel comes from the repo's portable
    md5 dyadic uniform (−ln(−ln U)) so the release is reproducible
    across engines — the q_dp_noisy_histogram determinism pattern
    extended from Laplace counts to selection queries. The companion
    the DP family needed: histograms release COUNTS, the exponential
    mechanism releases a VALUE (median, mode, best split) without
    touching count magnitudes.

    Scale: candidates are the value domain (one map-side-combined
    rollup), cumulative ranks are one bounded running sum, and the
    argmax is a TakeOrdered(1) — no corpus-scale sort. The true
    median rides along as the accuracy oracle (rank_error is the
    realized utility loss a DP release would not publish).
    """
    d = load_table(spark, sf_dir, "documents")
    vc = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    vc = bounded_window_input(vc, label="q_dp_quantile value domain")
    cum = vc.select(
        "v",
        F.sum("c")
        .over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_le"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    unif = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dpq:"), F.col("v").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4503599627370496.0
    keyed = cum.select(
        "v",
        "cum_le",
        "n",
        (
            DPQ_EPSILON / 2 * (-F.abs(F.col("cum_le") - F.col("n") / 2.0))
            + (-F.log(-F.log(unif)))
        ).alias("gumbel_key"),
    )
    true_med = (
        cum.filter(F.col("cum_le") * 2 >= F.col("n"))
        .agg(F.min("v").alias("tm"))
    )
    win = (
        keyed.orderBy(F.desc(F.round("gumbel_key", 9)), "v")
        .limit(1)
        .select("v", "cum_le", "n")
    )
    tm_rank = cum.select(F.col("v").alias("tm_v"), F.col("cum_le").alias("tm_cum"))
    return (
        win.crossJoin(F.broadcast(true_med))
        .join(F.broadcast(tm_rank), F.col("tm_v") == F.col("tm"))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("tm").alias("true_median"),
            F.col("v").alias("dp_median"),
            F.abs(F.col("cum_le") - F.col("tm_cum"))
            .cast("long")
            .alias("rank_error"),
            F.lit(float(DPQ_EPSILON)).alias("epsilon"),
        )
    )


# --------------------------------------------------------------------------
# Iterative proportional fitting (raking) to target corpus margins
# --------------------------------------------------------------------------
IPF_ITERS = 2  # unrolled row-scale/col-scale sweeps


@query(
    "q_ipf_raking",
    oracle="""
    WITH cell AS (
      SELECT lang, CAST(substring(source, 4) AS INT) < 10 AS half_a,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
                  CAST(sum(n) AS BIGINT) AS big_n FROM cell),
    w0 AS (
      SELECT lang, half_a, n, CAST(n AS DOUBLE) / t.big_n AS w
      FROM cell, tl t
    ),
    r1 AS (
      SELECT lang, half_a, n,
             w * (1.0 / (SELECT n_lang FROM tl))
               / (sum(w) OVER (PARTITION BY lang)) AS w
      FROM w0
    ),
    c1 AS (
      SELECT lang, half_a, n,
             w * 0.5 / (sum(w) OVER (PARTITION BY half_a)) AS w
      FROM r1
    ),
    r2 AS (
      SELECT lang, half_a, n,
             w * (1.0 / (SELECT n_lang FROM tl))
               / (sum(w) OVER (PARTITION BY lang)) AS w
      FROM c1
    ),
    c2 AS (
      SELECT lang, half_a, n,
             w * 0.5 / (sum(w) OVER (PARTITION BY half_a)) AS w
      FROM r2
    )
    SELECT c.lang, c.half_a, c.n,
           round(CAST(c.n AS DOUBLE) / t.big_n, 6) AS w_raw,
           round(c.w, 6) AS w_raked,
           round(c.w * t.big_n / c.n, 6) AS upweight,
           round(abs(sum(c.w) OVER (PARTITION BY c.lang)
                     - 1.0 / t.n_lang), 6) AS lang_margin_err
    FROM c2 c, tl t ORDER BY c.lang, c.half_a
    """,
)
def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting / raking (Deming & Stephan
    1940): reweight the (lang × source-half) corpus cells to UNIFORM
    target margins with {IPF_ITERS} unrolled row-scale/col-scale
    sweeps — the survey-statistics workhorse that, applied to a
    training corpus, yields per-cell sampling weights hitting a target
    language mixture AND a target source mixture simultaneously
    (q_doremi_reweight optimizes a loss-driven mixture; raking hits
    exact margin constraints — the two canonical reweighting recipes).
    The ``upweight`` column is the per-document multiplier a sampler
    would apply; the residual ``lang_margin_err`` after the final
    column sweep is the classic IPF convergence readout.

    Scale: everything after the one corpus rollup lives on the
    |langs|×2 cell table; each sweep is a partitioned window over it.
    The sweeps are inherently sequential (each normalizes the other
    dimension's distortion) — unrolling a FIXED iteration count keeps
    the plan static and oracle-checkable, the q_bfs_distances
    pattern.
    """
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy(
        "lang",
        (F.expr("CAST(substring(source, 4) AS INT)") < 10).alias("half_a"),
    ).agg(F.count(F.lit(1)).alias("n"))
    cell = bounded_window_input(cell, label="q_ipf cell table")
    tl = cell.agg(
        F.count_distinct("lang").alias("n_lang"),
        F.sum("n").alias("big_n"),
    )
    w = cell.crossJoin(F.broadcast(tl)).select(
        "lang",
        "half_a",
        "n",
        "n_lang",
        "big_n",
        (F.col("n").cast("double") / F.col("big_n")).alias("w"),
    )
    wl = Window.partitionBy("lang")
    wh = Window.partitionBy("half_a")
    for _ in range(IPF_ITERS):
        w = w.withColumn(
            "w", F.col("w") * (1.0 / F.col("n_lang")) / F.sum("w").over(wl)
        )
        w = w.withColumn("w", F.col("w") * 0.5 / F.sum("w").over(wh))
    return w.select(
        "lang",
        "half_a",
        "n",
        F.round(F.col("n").cast("double") / F.col("big_n"), 6).alias("w_raw"),
        F.round("w", 6).alias("w_raked"),
        F.round(F.col("w") * F.col("big_n") / F.col("n"), 6).alias(
            "upweight"
        ),
        F.round(
            F.abs(F.sum("w").over(wl) - 1.0 / F.col("n_lang")), 6
        ).alias("lang_margin_err"),
    ).orderBy("lang", "half_a")
