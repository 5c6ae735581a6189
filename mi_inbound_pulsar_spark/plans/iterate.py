"""Checkpoint discipline for iterative DataFrame fixpoints.

``stats_reset_checkpoint`` is ``localCheckpoint(eager=True)`` plus a
rebuild of the DataFrame on the just-materialized RDD so the new
``LogicalRDD`` carries FRESH (default) statistics instead of the
origin plan's.

Why that matters — the round-10 finding (found by the tri-scale
scaling-exponent audit, fixed here): Spark's ``Dataset.localCheckpoint``
copies the ORIGIN plan's estimated statistics into the LogicalRDD it
returns. Catalyst's fallback size estimator
(``SizeInBytesOnlyStatsPlanVisitor``) computes a join's sizeInBytes as
the PRODUCT of its children's, as exact ``BigInt`` arithmetic. In an
iterative loop whose per-round plan joins the previous round's
checkpoint with itself k times, the carried-over estimate is raised to
the k-th power EVERY round — the BigInt's digit count grows k^round,
and by round ~15 the driver spends its time in
``BigInteger.multiplyToomCook3`` inside stats estimation while every
executor thread sits idle (measured on the mutual-kNN
connected-components loop at sf0.1: rounds 0-11 take 0.4 s, round 17
takes 70-95 s, 130 s total for a 97-component graph; with the reset the
same 18 rounds run flat at 0.4-0.9 s, 22 s total, identical labels).

The reset sets the checkpoint's stats to the session default (LEAF
default sizeInBytes), which disables STATIC broadcast planning against
it — AQE re-plans joins from actual runtime sizes, so broadcastability
is preserved where it matters, and explicit ``F.broadcast`` hints are
unaffected.

Use this for every checkpoint INSIDE a fixpoint loop. A one-shot
checkpoint outside a loop has no compounding and can keep the plain
``localCheckpoint(eager=True)``.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession

_warned_unreliable = False


def _needs_reliable(spark: SparkSession) -> bool:
    """True when executor-local checkpoint blocks are NOT a safe
    materialization substrate: any non-local master, or dynamic
    allocation (executors — and their localCheckpoint blocks — can be
    decommissioned mid-query, making the plan unrecoverable because
    localCheckpoint severs lineage). Round-10 ADVICE (medium): the
    blanket persist→localCheckpoint conversion is correct on local[n]
    (one JVM, blocks live exactly as long as the session) but is a
    fault-tolerance regression on a real cluster — gate it.
    ``SPARK_GRAFT_FORCE_RELIABLE_CKPT=1`` forces the reliable path for
    testing on local masters."""
    if os.environ.get("SPARK_GRAFT_FORCE_RELIABLE_CKPT") == "1":
        return True
    sc = spark.sparkContext
    if not (sc.master or "").startswith("local"):
        return True
    conf = sc.getConf().get("spark.dynamicAllocation.enabled", "false")
    return (conf or "false").lower() == "true"


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` with the session-appropriate checkpoint:

    - local master, static allocation → ``localCheckpoint(eager=True)``
      (zero-copy to executor storage; blocks are exactly as durable as
      the single JVM running the query);
    - cluster master or dynamic allocation → reliable
      ``checkpoint(eager=True)`` when a checkpoint dir is configured
      (HDFS/object-store blocks survive executor loss), else fall back
      to localCheckpoint with a one-time warning — the caller chose
      not to configure durability, and silently persisting instead
      would reintroduce the round-9 cache-leak class.

    Reliable-checkpoint cleanup: checkpoint files are only deleted by
    the ContextCleaner when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (this
    repo's ``session.get_spark`` sets it; Spark's default is false).
    Without it, a long-lived session calling the ~60 library sites
    that route through here would accumulate unbounded checkpoint
    storage — set the conf in any external session that takes the
    reliable path.

    Designed for ``.transform(eager_checkpoint)`` chaining at the ~60
    operator sites that previously called ``.localCheckpoint(eager=True)``
    directly.
    """
    global _warned_unreliable
    spark = df.sparkSession
    if _needs_reliable(spark):
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        if not _warned_unreliable:
            _warned_unreliable = True
            warnings.warn(
                "eager_checkpoint: non-local master or dynamic allocation "
                "detected but no spark.sparkContext.setCheckpointDir() is "
                "configured; falling back to localCheckpoint — an executor "
                "loss will make in-flight queries unrecoverable. Set a "
                "checkpoint dir on durable storage for production runs.",
                stacklevel=2,
            )
    return df.localCheckpoint(eager=True)


def stats_reset_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` via eager checkpoint and return a frame
    over the SAME checkpointed RDD with fresh leaf statistics (see
    module docstring for why the origin-stats carry-over is fatal in
    iterative join loops). Zero extra IO: the rebuilt frame scans the
    blocks the checkpoint just wrote. Uses :func:`eager_checkpoint`,
    so the reliable-vs-local gating applies here too (``checkpoint``
    carries origin stats exactly like ``localCheckpoint`` — both go
    through ``Dataset.checkpoint(eager, reliable)`` — so the rebuild
    is needed on either path)."""
    ck = eager_checkpoint(df)
    jdf = ck._jdf
    spark = ck.sparkSession
    new_jdf = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(new_jdf, spark)


def _unpersist_quiet(jdf) -> None:
    try:
        jdf.unpersist(False)
    except Exception:
        pass  # py4j gateway already closed at interpreter shutdown


def scoped_persist(df: DataFrame, owner: DataFrame) -> DataFrame:
    """``persist()`` with the cleanup obligation discharged by the
    OWNER frame's lifetime: the cache entry is unpersisted when the
    Python object for ``owner`` is garbage-collected.

    Use when an intermediate is scanned multiple times INSIDE one
    returned query plan. ``localCheckpoint(eager=True)`` is wrong for
    that shape: it materializes the frame as a separate up-front job,
    serializing what persist lets the main job compute once in-stream
    (measured on q_copurchase_jaccard at sf0.1: persist 1.7 s, eager
    checkpoint 3.5 s, no materialization 4.3 s). Plain ``persist`` is
    the round-9 leak class — a library function returning a lazy frame
    can never unpersist at the right time. This helper ties the cache
    entry to the returned frame instead: while the caller holds the
    result, the cache lives; when the result is collected and dropped,
    a weakref finalizer unpersists the JVM-side entry. The finalizer
    closure holds only the py4j Dataset handle, not the Python frame,
    so it cannot keep the owner alive itself.

    Usage: persist the intermediate, build the result plan over it,
    then ``return retain(out, intermediate)``.

    Ownership: the finalizer is registered ONLY when this call did the
    persisting. If the caller already persisted the frame, cleanup
    stays the caller's obligation — unpersisting here would yank a
    cache another consumer may still be using (round-10 ADVICE).

    Lifetime caveat: cleanup runs when CPython garbage-collects the
    owner — immediate under refcounting for the common
    collect-and-drop flow, but delayed indefinitely while the owner
    sits in a REPL variable or a reference cycle awaits the cycle
    collector. The entry is memory-pressure-evictable cache either
    way, so a late unpersist costs memory headroom, not correctness.
    """
    import weakref

    lvl = df._jdf.storageLevel()
    if not (lvl.useMemory() or lvl.useDisk()):
        df.persist()
        weakref.finalize(owner, _unpersist_quiet, df._jdf)
    refs = getattr(owner, "_scoped_caches", None)
    if refs is None:
        refs = []
        owner._scoped_caches = refs
    refs.append(df)
    return df


def retain(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Persist (if not already) every frame in ``cached`` and tie each
    cache entry to ``result``'s lifetime — see :func:`scoped_persist`."""
    for df in cached:
        scoped_persist(df, result)
    return result


# NOTE (round 11): a `pinned` context manager (persist frames for an
# iterative loop's duration, unpersist on exit) was prototyped here to
# replace the up-front eager checkpoints feeding the MMR greedy loop.
# Interleaved A/B at sf0.1 measured it SLOWER (4.87-5.69 s vs
# 3.94-4.43 s): a loop re-reading a deserialized checkpointed RDD beats
# a loop re-reading the columnar cache. Don't reintroduce it without a
# measurement showing otherwise.
