"""Semantic tests for the CDC and graph operator families.

The oracle sweep (tools/local_verify.py) checks value parity with
DuckDB; these tests check the *invariants* the operators promise —
interval validity for SCD2, tombstone semantics for upsert, the
partial-merge algebra for incremental rollup, and brute-force graph
ground truth for triangles.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.cdc import (
    q_cdc_upsert_tombstones,
    q_incremental_rollup,
    q_scd2_dimension,
)
from mi_inbound_pulsar_spark.operators.graph import (
    binned_overlap_pairs,
    q_interval_overlap_join,
    q_triangle_count,
)
from mi_inbound_pulsar_spark.sources.tables import load_table


def test_scd2_intervals_are_contiguous_and_single_current(spark, sf_dir):
    rows = q_scd2_dimension(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, versions in by_user.items():
        # versions are 1..n in valid_from order
        assert [v.version for v in versions] == list(range(1, len(versions) + 1))
        # exactly one open interval, and it is the last one
        assert sum(v.is_current for v in versions) == 1
        assert versions[-1].is_current and versions[-1].valid_to is None
        for prev, nxt in zip(versions, versions[1:]):
            # contiguous, half-open, non-overlapping
            assert prev.valid_to == nxt.valid_from
            assert prev.valid_from < prev.valid_to
            # SCD2 collapses no-change runs: consecutive statuses differ
            assert prev.status != nxt.status


def test_cdc_tombstones_remove_keys(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    last = (
        e.groupBy("user_id")
        .agg(F.max_by("event_type", F.struct("ts", "event_id")).alias("last_type"))
        .collect()
    )
    dead = {r.user_id for r in last if r.last_type == "error"}
    live = {r.user_id for r in last if r.last_type != "error"}
    out = q_cdc_upsert_tombstones(spark, sf_dir).collect()
    got = {r.user_id for r in out}
    assert got == live
    assert not (got & dead)
    assert all(r.last_event_type != "error" for r in out)


def test_incremental_rollup_matches_direct_aggregation(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    direct = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.sum(micro).alias("total_micro"),
            F.count(F.lit(1)).alias("n_events"),
            F.min(micro).alias("min_micro"),
            F.max(micro).alias("max_micro"),
        )
        .collect()
    }
    merged = q_incremental_rollup(spark, sf_dir).collect()
    assert {r.event_type for r in merged} == set(direct)
    for r in merged:
        d = direct[r.event_type]
        assert (r.total_micro, r.n_events, r.min_micro, r.max_micro) == (
            d.total_micro,
            d.n_events,
            d.min_micro,
            d.max_micro,
        )


def test_interval_overlap_matches_naive_theta_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.min(F.unix_micros("ts")).alias("s"),
            F.max(F.unix_micros("ts")).alias("e"),
        )
        .collect()
    )
    by_day: dict = {}
    for r in ud:
        by_day.setdefault(r.day, []).append(r)
    expected = {}
    for day, ivs in by_day.items():
        n, tot = 0, 0
        for a, b in combinations(sorted(ivs, key=lambda r: r.user_id), 2):
            if a.s <= b.e and b.s <= a.e:
                n += 1
                tot += min(a.e, b.e) - max(a.s, b.s)
        if n:
            expected[day] = (n, tot)
    got = {r.day: (r.n_pairs, r.total_overlap_us) for r in q_interval_overlap_join(spark, sf_dir).collect()}
    assert got == expected


def test_interval_overlap_sweep_line_edge_cases(spark, tmp_path):
    """The sweep-line form's boundary semantics, pinned on synthetic
    days the real testdata may never produce: a touching pair (e == s)
    COUNTS as a pair with overlap 0 (the closed theta predicate keeps
    it); a day whose only intervals are disjoint emits NO row (the
    inner theta join's semantics); a single-interval day emits no row;
    nested and chained overlaps aggregate exactly."""
    base = 1_700_000_000_000_000  # epoch µs, day-aligned enough
    day_us = 86_400_000_000
    rows = []

    def ev(day, user, s, e):
        # two events bound the (user, day) interval [s, e]
        for i, t in enumerate((s, e)):
            rows.append((len(rows), base + day * day_us + t, user))

    # day 0: touching pair — a ends exactly where b starts
    ev(0, 1, 0, 1000)
    ev(0, 2, 1000, 2000)
    # day 1: two disjoint users -> NO output row
    ev(1, 1, 0, 10)
    ev(1, 2, 5000, 6000)
    # day 2: single user -> no row
    ev(2, 7, 0, 99)
    # day 3: nested + chain: a=[0,100], b=[10,20] (nested), c=[90,150]
    ev(3, 1, 0, 100)
    ev(3, 2, 10, 20)
    ev(3, 3, 90, 150)
    df = spark.createDataFrame(
        [(i, t, u, "x", 0.0, "{}") for (i, t, u) in rows],
        "event_id long, ts_us long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    (tmp_path / "d").mkdir()
    df.write.parquet(str(tmp_path / "d" / "events.parquet"))
    got = {
        str(r.day): (r.n_pairs, r.total_overlap_us)
        for r in q_interval_overlap_join(spark, str(tmp_path / "d")).collect()
    }
    days = sorted(got)
    # day 0: one touching pair, zero overlap
    assert got[days[0]] == (1, 0)
    # days 1 and 2 emit nothing; day 3: (a,b) overlap 10, (a,c) overlap
    # 10, (b,c) disjoint -> 2 pairs, 20 µs
    assert len(days) == 2
    assert got[days[1]] == (2, 20)
    """Intervals that cross bucket boundaries (even spanning many
    buckets) must pair exactly once — compared against a brute-force
    theta join over every pair."""
    ivs = [
        # (id, s_us, e_us) with bucket width 10: crossing, nested,
        # multi-bucket-spanning, exactly-touching, and disjoint cases
        (1, 0, 5),
        (2, 3, 25),    # spans buckets 0-2
        (3, 8, 12),    # crosses the 10 boundary
        (4, 24, 57),   # spans buckets 2-5
        (5, 57, 57),   # point interval touching id=4's end
        (6, 70, 99),   # spans 7-9, disjoint from the rest
        (7, 1, 99),    # spans everything
    ]
    df = spark.createDataFrame(ivs, "user_id long, s_us long, e_us long")
    got = {
        (r["a_id"], r["b_id"])
        for r in binned_overlap_pairs(df, width_us=10)
        .select(F.col("a.user_id").alias("a_id"), F.col("b.user_id").alias("b_id"))
        .collect()
    }
    expected = {
        (a[0], b[0])
        for a, b in combinations(ivs, 2)
        if a[1] <= b[2] and b[1] <= a[2]
    }
    assert got == expected
    # dedupe-by-construction: no pair appears twice
    n_rows = binned_overlap_pairs(df, width_us=10).count()
    assert n_rows == len(expected)


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.dedup import jaccard_pairs, shingles

    d = load_table(spark, sf_dir, "documents")
    edge_rows = jaccard_pairs(shingles(d, n=3), 0.5).collect()
    edges = {(r.doc_a, r.doc_b) for r in edge_rows}
    nodes = sorted({n for e in edges for n in e})
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(v * (v - 1) // 2 for v in deg.values())
    row = q_triangle_count(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert row.n_nodes == len(nodes)
    assert row.n_wedges == wedges


def test_degree_oriented_triangles_match_and_bound_skew(spark):
    """Degree orientation must (a) count triangles exactly and (b) keep
    a celebrity hub from exploding the wedge join: in a star+clique
    graph the hub's edges all point inward, so the hub generates zero
    wedges — under id orientation (hub id 0) it generates C(n, 2)."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.graph import oriented_triangle_count

    # hub 0 — 200 leaves, plus a 5-clique among nodes 1..5 (leaves too)
    star = [(0, i) for i in range(1, 201)]
    clique = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    edges = spark.createDataFrame(sorted(set(star + clique)), "src long, dst long")
    got = oriented_triangle_count(edges).collect()[0]["n_triangles"]
    # truth: every clique pair + hub forms a triangle (hub connects all):
    # C(5,3) inside the clique + 10 hub triangles (one per clique edge)
    assert got == 10 + 10

    # hub out-degree under degree orientation is 0 ⇒ the join's wedge
    # count is bounded by the clique side, not C(200, 2)
    deg = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .groupBy("n").count()
    )
    hub_deg = {r["n"]: r["count"] for r in deg.collect()}[0]
    assert hub_deg == 200  # the skew premise holds


def test_binned_overlap_random_fuzz_matches_theta_join(spark):
    """Seeded-random fuzz: 60 intervals with mixed spans (point, short,
    multi-bucket, all-covering) must produce exactly the brute-force
    overlap pair set under several bucket widths."""
    import random

    rng = random.Random(42)
    ivs = []
    for i in range(60):
        s = rng.randrange(0, 1000)
        span = rng.choice([0, rng.randrange(1, 15), rng.randrange(15, 400)])
        ivs.append((i, s, s + span))
    df = spark.createDataFrame(ivs, "user_id long, s_us long, e_us long")
    expected = {
        (a[0], b[0])
        for a, b in combinations(ivs, 2)
        if a[1] <= b[2] and b[1] <= a[2]
    }
    for width in (7, 64, 1000):
        pairs = binned_overlap_pairs(df, width_us=width)
        got = [
            (r["a_id"], r["b_id"])
            for r in pairs.select(
                F.col("a.user_id").alias("a_id"), F.col("b.user_id").alias("b_id")
            ).collect()
        ]
        assert len(got) == len(set(got)), f"duplicate pairs at width {width}"
        assert set(got) == expected, f"pair set mismatch at width {width}"
