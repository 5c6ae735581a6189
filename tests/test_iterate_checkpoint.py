"""stats_reset_checkpoint: the iterative-checkpoint discipline
(plans/iterate.py). Pins both halves of the round-10 finding:

1. semantics — the reset frame holds exactly the checkpointed rows;
2. the mechanism — a join-recursive loop's carried size estimate
   compounds geometrically through bare localCheckpoint (digit count
   of the BigInt grows per round) but stays bounded through the reset.

If a Spark upgrade changes how Dataset.localCheckpoint propagates
origin stats, the mechanism test fails loudly instead of the
regression silently re-landing as minutes-long driver stalls in
BigInteger arithmetic (see SCALE.md round 10).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.plans.iterate import stats_reset_checkpoint


def _size_digits(df) -> int:
    """Digit count of the optimized plan's sizeInBytes estimate."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return len(str(stats.sizeInBytes()))


def _one_round(labels):
    """A 3-way self-referential join round (the connected-components
    step shape): the carried frame appears three times."""
    nbr = labels.selectExpr("id AS nid", "v AS nv")
    j = labels.join(nbr, labels.id == F.col("nid"), "left")
    ptr = j.selectExpr("id AS pid", "v AS pv")
    return j.join(ptr, j.v == F.col("pid"), "left").select(
        labels.id.alias("id"), F.coalesce("pv", j.v).alias("v")
    )


def test_reset_preserves_rows(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    got = stats_reset_checkpoint(df)
    assert got.schema == df.schema
    assert sorted(r["id"] for r in got.collect()) == list(range(100))
    # second action reads the checkpointed blocks, same result
    assert got.count() == 100


def test_reset_bounds_stat_growth_where_bare_checkpoint_compounds(spark):
    base = spark.range(50).select(F.col("id"), F.col("id").alias("v"))

    bare = base.localCheckpoint(eager=True)
    reset = stats_reset_checkpoint(base)
    bare_digits, reset_digits = [], []
    for _ in range(4):
        bare = _one_round(bare).localCheckpoint(eager=True)
        reset = stats_reset_checkpoint(_one_round(reset))
        bare_digits.append(_size_digits(bare))
        reset_digits.append(_size_digits(reset))

    # the reset keeps the estimate at the constant session default
    assert len(set(reset_digits)) == 1, reset_digits
    # bare localCheckpoint carries origin stats; through a 3-way
    # self-join the digit count must grow round over round (this is
    # the geometric-driver-stall precondition). If Spark stops
    # carrying stats, this assert fails and the helper can be retired.
    assert bare_digits[-1] > bare_digits[0] * 2, bare_digits


def test_reset_in_loop_matches_bare_loop_results(spark):
    base = spark.range(40).select(
        F.col("id"), (39 - F.col("id")).alias("v")
    )
    a, b = base.localCheckpoint(eager=True), stats_reset_checkpoint(base)
    for _ in range(3):
        a = _one_round(a).localCheckpoint(eager=True)
        b = stats_reset_checkpoint(_one_round(b))
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_scoped_persist_releases_on_owner_gc(spark):
    import gc

    from mi_inbound_pulsar_spark.plans.iterate import retain

    # exact, not delta-based: global RDD-storage counts race with the
    # async ContextCleaner reaping OTHER tests' checkpoint blocks, so
    # ask the CacheManager about THIS plan specifically
    cm = spark._jsparkSession.sharedState().cacheManager()
    base = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    inner = base.groupBy("k").count()
    jdf = inner._jdf
    out = retain(inner.join(inner.selectExpr("k", "count AS c2"), "k"), inner)
    assert out.count() == 5  # action populates the scoped cache
    assert cm.lookupCachedData(jdf).isDefined()  # cache entry live
    del out, inner
    gc.collect()
    # finalizer unpersisted the JVM-side entry
    assert not cm.lookupCachedData(jdf).isDefined()


def test_scoped_persist_skips_ownership_of_caller_persisted_frames(spark):
    """Round-10 ADVICE: a frame the CALLER persisted must survive the
    owner's GC — scoped_persist only registers the unpersist finalizer
    for caches it created itself (double ownership would yank a cache
    another consumer still needs)."""
    import gc

    from mi_inbound_pulsar_spark.plans.iterate import retain

    cm = spark._jsparkSession.sharedState().cacheManager()
    caller_owned = spark.range(500).selectExpr("id", "id % 3 AS k").persist()
    try:
        out = retain(caller_owned.groupBy("k").count(), caller_owned)
        assert out.count() == 3
        jdf = caller_owned._jdf
        assert cm.lookupCachedData(jdf).isDefined()
        del out
        gc.collect()
        # still cached: retain did NOT take ownership
        assert cm.lookupCachedData(jdf).isDefined()
    finally:
        caller_owned.unpersist()


def test_eager_checkpoint_gating(spark, tmp_path, monkeypatch):
    """Round-10 ADVICE (medium): localCheckpoint blocks live only in
    executor storage, so on a cluster / under dynamic allocation the
    materialization must fall back to a reliable checkpoint when a
    checkpoint dir is configured. The env override exercises the
    reliable path on a local master."""
    import warnings

    from mi_inbound_pulsar_spark.plans import iterate
    from mi_inbound_pulsar_spark.plans.iterate import (
        _needs_reliable,
        eager_checkpoint,
    )

    # local master, no dynamic allocation -> local path
    assert not _needs_reliable(spark)

    df = spark.range(100).selectExpr("id", "id * 2 AS v")

    monkeypatch.setenv("SPARK_GRAFT_FORCE_RELIABLE_CKPT", "1")
    assert _needs_reliable(spark)

    # no checkpoint dir configured -> one-time warning + local fallback
    monkeypatch.setattr(iterate, "_warned_unreliable", False)
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = eager_checkpoint(df)
        assert out.count() == 100
    assert any("unrecoverable" in str(x.message) for x in w)

    # checkpoint dir configured -> reliable checkpoint (blocks on disk)
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        out2 = eager_checkpoint(df)
        assert out2.count() == 100
        # reliable-checkpoint evidence: blocks landed in the dir
        # (df.rdd wraps a javaToPython conversion, so is_checkpointed
        # on it can't see the underlying checkpoint)
        assert any((tmp_path / "ckpt").rglob("part-*")), "no checkpoint files"
        assert sorted(map(tuple, out2.collect())) == sorted(
            map(tuple, df.collect())
        )
    finally:
        # a None reset isn't exposed in pyspark; point it at a scratch
        # dir so later tests aren't affected by this one's tmp_path
        sc.setCheckpointDir(str(tmp_path / "ckpt_rest"))
