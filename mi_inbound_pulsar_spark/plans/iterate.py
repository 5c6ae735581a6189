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

from pyspark.sql import DataFrame


def stats_reset_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` via eager localCheckpoint and return a frame
    over the SAME checkpointed RDD with fresh leaf statistics (see
    module docstring for why the origin-stats carry-over is fatal in
    iterative join loops). Zero extra IO: the rebuilt frame scans the
    blocks the checkpoint just wrote."""
    ck = df.localCheckpoint(eager=True)
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
