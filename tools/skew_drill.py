"""Skew fire-drill: demonstrate, with committed numbers, that the
explicit salting path (plans/skew.py) rescues a hot-key shuffle join
that AQE alone cannot.

Scenario (the 100 TB case scaled to local[32]): the events table with
a celebrity hot key — HOT_FRACTION of all events collapse onto ONE
user_id — joined to a per-user dimension too large to broadcast (at
100 TB a user-profile table does not fit an executor, modeled here by
autoBroadcastJoinThreshold=-1). The events side is amplified
AMPLIFY× so the hot key's payload dominates a single task visibly.

Three timed variants of the same join + aggregate:

1. ``plain``      — shuffle hash/sort-merge join, AQE skew-join OFF:
                    the naive plan; the hot key's entire payload lands
                    on one task.
2. ``aqe_skew``   — AQE skew-join ON (the session default): runtime
                    splitting of oversized partitions, sort-merge only.
3. ``salted``     — plans/skew.py salted_join: the hot key is split
                    across N_SALTS sub-keys at plan time, dim
                    replicated N_SALTS x — works for ANY join type and
                    does not depend on runtime thresholds.

Each variant runs twice; best-of-2 is reported (JVM/page-cache warm).
Writes SKEW_DRILL.md at the repo root.

Usage: python tools/skew_drill.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mi_inbound_pulsar_spark.plans.skew import salted_join  # noqa: E402
from mi_inbound_pulsar_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
HOT_FRACTION = 0.9  # share of event rows collapsed onto the hot key
AMPLIFY = 50  # events replicated this many times
N_SALTS = 128
DIM_FANOUT = 64  # profile rows per user — join output multiplier


def build_inputs(spark):
    """Hot-key events variant (never touches /root/testdata):
    HOT_FRACTION of all (amplified) events remapped onto one user id;
    broadcasting the per-user dim is disabled to model a
    non-broadcastable 100 TB profile table."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    amp = e.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(AMPLIFY)]))
    ).withColumn("event_id", F.col("event_id") * AMPLIFY + F.col("rep"))
    # string user ids (the realistic key shape — uuids/handles): the
    # straggler's sort-merge cost is dominated by key comparisons, so
    # the drill measures what a real celebrity key costs
    hot = amp.withColumn(
        "user_id",
        F.concat(
            F.lit("user_"),
            F.lpad(
                F.when(
                    F.pmod(F.xxhash64("event_id"), F.lit(100))
                    < F.lit(int(HOT_FRACTION * 100)),
                    F.lit(7),
                )
                .otherwise(F.col("user_id"))
                .cast("string"),
                8,
                "0",
            ),
        ),
    ).drop("rep")
    # DIM_FANOUT rows per user (profile attributes): the join output
    # is DIM_FANOUT x the event count, so the hot key's post-shuffle
    # work (sort + probe + aggregate) dominates the parallel scan
    users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            F.concat(
                F.lit("user_"), F.lpad(F.col("user_id").cast("string"), 8, "0")
            ).alias("user_id")
        )
        .distinct()
        .withColumn("attr", F.explode(F.array(*[F.lit(i) for i in range(DIM_FANOUT)])))
        .withColumn("segment", F.pmod(F.xxhash64("user_id", "attr"), F.lit(10)))
        .withColumn("weight", F.pmod(F.xxhash64("user_id", "attr", F.lit(1)), F.lit(1000)))
        .drop("attr")
    )
    ev_path, dim_path = "/tmp/skew_drill_events", "/tmp/skew_drill_users"
    hot.write.mode("overwrite").parquet(ev_path)
    users.write.mode("overwrite").parquet(dim_path)
    return ev_path, dim_path


def the_query(ev, dim, salted: bool):
    """Join events to the per-user dim, then a per-segment rollup —
    the canonical enrich-then-aggregate shape."""
    j = (
        salted_join(ev, dim, "user_id", n_salts=N_SALTS, salt_src="event_id")
        if salted
        else ev.join(dim, "user_id")
    )
    # integer-exact checksum: identical across plans regardless of
    # partial-sum order, unlike a float sum
    return j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_id") % 1000) * F.col("weight")).alias("wv"),
    )


def timed(fn, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = get_spark("skew_drill")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ev_path, dim_path = build_inputs(spark)
    ev = spark.read.parquet(ev_path)
    dim = spark.read.parquet(dim_path)
    n_events = ev.count()
    n_hot = ev.filter(F.col("user_id") == "user_00000007").count()
    n_users = dim.count()

    results = {}
    expected = None
    for name, skew_flag, salted in (
        ("plain", "false", False),
        ("aqe_skew", "true", False),
        ("salted", "false", True),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        rows = None

        def run():
            nonlocal rows
            rows = sorted(
                (r["segment"], r["n"], r["wv"])
                for r in the_query(ev, dim, salted).collect()
            )

        results[name] = timed(run)
        if expected is None:
            expected = rows
        assert rows == expected, f"{name} changed the answer"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    speedup_plain = results["plain"] / results["salted"]
    speedup_aqe = results["aqe_skew"] / results["salted"]
    md = f"""# SKEW_DRILL — salted join vs hot-key straggler

Reproduce: `python tools/skew_drill.py` (sf0.1, local[32],
best-of-2 per variant, broadcast disabled to model a
non-broadcastable dimension).

Inputs: {n_events:,} events after {AMPLIFY}x amplification,
**{n_hot:,} of them ({100 * n_hot / n_events:.0f}%) on ONE hot
user_id**, joined to a {n_users:,}-row per-user dimension ({DIM_FANOUT} rows/user), then a
10-segment rollup. All three variants return identical results
(asserted).

| variant | plan | best-of-2 |
|---|---|---|
| plain | shuffle join, AQE skew-join off — hot key on one task | {results['plain']:.2f} s |
| aqe_skew | AQE skew-join on (session default) | {results['aqe_skew']:.2f} s |
| salted | `plans/skew.py` salted_join, {N_SALTS} salts | {results['salted']:.2f} s |

**Salting beats the naive plan {speedup_plain:.1f}x** and the
AQE-rescued plan {speedup_aqe:.1f}x on this shape.

Why keep explicit salting when AQE exists: AQE's skew split only
triggers for sort-merge joins past size thresholds and can only
split map outputs that are already materialized; the salt is chosen
at plan time, works for any join type (including the left-anti /
as-of shapes elsewhere in this repo), and makes the fan-out an
explicit, testable part of the plan — at 100 TB the two compose
(salt the known-hot keys, let AQE catch the residual drift).
"""
    Path("SKEW_DRILL.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
