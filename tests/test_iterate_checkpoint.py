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
