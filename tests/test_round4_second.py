"""Round-4 second-half operators: prefix-filtering set-similarity
join (exactness + skew resistance), the Python-UDTF strided chunker
(overlap/stride invariants), and temperature mixture weighting
(budget + monotonicity properties)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.dedup import (
    jaccard_pairs,
    q_prefix_filter_jaccard,
    shingles,
)
from mi_inbound_pulsar_spark.operators.sampling import q_temperature_mixture
from mi_inbound_pulsar_spark.operators.scalar import q_udtf_strided_chunks
from mi_inbound_pulsar_spark.sources.tables import load_table


def test_prefix_filter_equals_full_inverted_index(spark, sf_dir):
    # Prefix filtering is a candidate-pruning rule, not an
    # approximation: the verified result must equal the full
    # inverted-index Jaccard join exactly (pairs AND scores).
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in q_prefix_filter_jaccard(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
        for r in jaccard_pairs(shingles(docs), threshold=0.5, max_doc_freq=None)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .collect()
    }
    assert got == truth


def test_prefix_filter_survives_hot_shingle(spark, tmp_path):
    # A boilerplate shingle shared by EVERY doc must neither blow up
    # the candidate join nor create false positives/negatives: with a
    # rarity-first prefix order, the hot shingle never enters any
    # document's prefix (all docs also have rarer unique shingles).
    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} unique{i} token{i} filler{i} pad{i}") for i in range(40)]
    rows += [(100, f"{boiler} shared shared2 shared3 shared4"),
             (101, f"{boiler} shared shared2 shared3 shared4")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    (tmp_path / "d").mkdir()
    docs.write.parquet(str(tmp_path / "d" / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_prefix_filter_jaccard(spark, str(tmp_path / "d")).collect()
    }
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(shingles(docs), threshold=0.5, max_doc_freq=None).collect()
    }
    assert got == truth
    assert (100, 101) in got


def test_udtf_chunks_stride_and_overlap(spark, sf_dir):
    out = q_udtf_strided_chunks(spark, sf_dir).collect()
    assert out
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .collect()
    }
    for doc_id, chunks in by_doc.items():
        words = docs[doc_id]
        # chunk count = number of stride starts
        assert len(chunks) == math.ceil(len(words) / 48)
        for c in chunks:
            start = c["chunk_id"] * 48
            expect = words[start : start + 64]
            assert c["n_chunk_tokens"] == len(expect)
            assert c["first_token"] == expect[0]
            assert c["last_token"] == expect[-1]
        # consecutive chunks overlap by window - stride = 16 tokens
        for a, b in zip(chunks, chunks[1:]):
            if a["n_chunk_tokens"] == 64:
                assert b["chunk_id"] * 48 < a["chunk_id"] * 48 + 64


def test_temperature_mixture_budget_and_monotonicity(spark, sf_dir):
    rows = q_temperature_mixture(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    # weights form a distribution
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    # every rate is a valid probability
    assert all(0.0 < r["sample_rate"] <= 1.0 for r in rows)
    # the realized budget never exceeds, and approaches, 50% of corpus
    # tokens (capped sources can only push it below the target)
    kept = sum(r["target_tokens"] for r in rows)
    assert kept <= total * 0.5 * 1.001
    # temperature < 1 up-weights the tail: the smallest source must get
    # a sampling rate >= the largest source's
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    assert smallest["sample_rate"] >= largest["sample_rate"]


def test_hybrid_rrf_fusion_properties(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.similarity import q_hybrid_search_rrf

    rows = q_hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        # every fused doc appears in at least one ranking, ranks are
        # within fusion depth, and the score is exactly the RRF sum
        assert r["rank_lex"] is not None or r["rank_sem"] is not None
        expect = 0.0
        if r["rank_lex"] is not None:
            assert 1 <= r["rank_lex"] <= 100
            expect += 1.0 / (60 + r["rank_lex"])
        if r["rank_sem"] is not None:
            assert 1 <= r["rank_sem"] <= 100
            expect += 1.0 / (60 + r["rank_sem"])
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9
    # output is sorted by fused score desc
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc present in BOTH rankings at rank 1 would dominate; at
    # minimum the top fused doc must beat any single-list tail score
    assert scores[0] > 1.0 / (60 + 100)


def test_hybrid_rrf_ranking_is_takeordered_not_global_sort(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.similarity import q_hybrid_search_rrf

    plan = (
        q_hybrid_search_rrf(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the fusion-depth cut must plan as TakeOrderedAndProject (per-
    # partition top-k), never a single-partition global Sort feeding
    # the rank window directly from the corpus
    assert "TakeOrderedAndProject" in plan


def test_constraint_audit_detects_injected_violations(spark, tmp_path):
    import datetime as dt

    from mi_inbound_pulsar_spark.operators.cdc import q_constraint_audit

    d = tmp_path / "dq"
    d.mkdir()
    spark.createDataFrame(
        [(1, 0), (1, 0), (2, 0)], "c_custkey long, c_nationkey long"
    ).write.parquet(str(d / "customer.parquet"))  # dup PK 1
    spark.createDataFrame(
        [(10, 1, 5.0, dt.datetime(2000, 1, 1)), (11, 99, 5.0, dt.datetime(2000, 1, 1))],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    ).write.parquet(str(d / "orders.parquet"))  # custkey 99 dangling
    spark.createDataFrame(
        [(10, 1.0), (77, -3.0)], "l_orderkey long, l_quantity double"
    ).write.parquet(str(d / "lineitem.parquet"))  # orderkey 77 dangling + qty<=0
    spark.createDataFrame(
        [(1, float("nan")), (2, 1.0)], "event_id long, value double"
    ).write.parquet(str(d / "events.parquet"))  # one NaN
    spark.createDataFrame(
        [(1, "", 0), (2, "ok text", 7)], "doc_id long, text string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))  # one empty doc

    got = {r["check_name"]: r for r in q_constraint_audit(spark, str(d)).collect()}
    expect = {
        "customer_pk_unique": 1,
        "documents_nonempty": 1,
        "events_value_not_nan": 1,
        "lineitem_fk_orders": 1,
        "lineitem_qty_positive": 1,
        "orders_fk_customer": 1,
        "orders_pk_unique": 0,
    }
    for name, n in expect.items():
        assert got[name]["n_violations"] == n, name
        assert got[name]["passed"] == (n == 0), name


def test_ivm_terms_partition_the_join(spark, sf_dir):
    # The four delta terms must partition the full join: their row
    # counts sum to the direct join's count (disjointness + coverage —
    # the algebra the maintenance rule rests on).
    from mi_inbound_pulsar_spark.operators.cdc import IVM_DATE_CUTOFF, q_ivm_join_delta

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    full = o.join(c, o.o_custkey == c.c_custkey).count()
    merged = q_ivm_join_delta(spark, sf_dir).agg(F.sum("n_orders")).collect()[0][0]
    assert merged == full
    # and the delta split is non-trivial at the shipped cutoff
    cutoff = F.lit(IVM_DATE_CUTOFF).cast("timestamp")
    assert o.filter(F.col("o_orderdate") >= cutoff).count() > 0
    assert o.filter(F.col("o_orderdate") < cutoff).count() > 0


def test_entity_resolution_clusters_are_consistent(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.graph import ER_SCOPE, q_entity_resolution

    out = q_entity_resolution(spark, sf_dir).collect()
    parts = {
        r["p_partkey"]: r["p_name"]
        for r in load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < ER_SCOPE)
        .collect()
    }
    assert out  # the TPC-H-ish generated names do collide within blocks
    for r in out:
        # the canonical id is a real member and the cluster label rule
        # (min member id) makes it the name donor
        assert r["canonical_id"] in parts
        assert r["canonical_name"] == parts[r["canonical_id"]]
        assert r["n_members"] >= 2
        assert r["price_spread_cents"] >= 0


def test_holt_linear_trend_matches_python_fold(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.eventsops import q_holt_linear_trend

    got = {r["user_id"]: r for r in q_holt_linear_trend(spark, sf_dir).collect()}
    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in events:
        series.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    for uid, evs in series.items():
        vals = [v for _, _, v in sorted(evs, key=lambda t: (t[0], t[1]))]
        lvl, trd = vals[0], 0.0
        for x in vals[1:]:
            nl = 0.3 * x + 0.7 * (lvl + trd)
            trd = 0.2 * (nl - lvl) + 0.8 * trd
            lvl = nl
        assert got[uid]["n_events"] == len(vals)
        assert abs(got[uid]["level"] - round(lvl, 6)) < 1e-9, uid
        assert abs(got[uid]["trend"] - round(trd, 6)) < 1e-9, uid


def test_survival_curve_km_properties(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import q_survival_curve

    rows = q_survival_curve(spark, sf_dir).collect()
    assert rows
    # survival is monotone non-increasing from 1 and within [0, 1]
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-9, r
        prev = r["survival"]
        assert r["n_events"] <= r["n_at_risk"]
    # at-risk counts are monotone non-increasing over days
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    # day 0 at-risk equals the signup population
    signups = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0]["n_at_risk"] == signups


def test_bfs_levels_partition_and_connect(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.graph import (
        COPURCHASE_MIN_COMMON,
        copurchase_pairs,
        part_posting_lists,
        q_bfs_distances,
    )

    hist = {r["dist"]: r for r in q_bfs_distances(spark, sf_dir).collect()}
    if not hist:
        import pytest

        pytest.skip("co-purchase graph empty at this scale factor")
    assert hist[0]["n_nodes"] == 1  # exactly the seed
    e = copurchase_pairs(
        part_posting_lists(spark, sf_dir), COPURCHASE_MIN_COMMON
    ).collect()
    adj: dict[int, set] = {}
    for r in e:
        adj.setdefault(r["cust_a"], set()).add(r["cust_b"])
        adj.setdefault(r["cust_b"], set()).add(r["cust_a"])
    seed = min(adj)
    assert hist[0]["min_node"] == seed
    # python BFS ground truth
    level, seen = {seed}, {seed}
    for d in (1, 2, 3):
        nxt = {m for n in level for m in adj[n]} - seen
        if d in hist or nxt:
            assert hist.get(d) is not None and hist[d]["n_nodes"] == len(nxt), d
        seen |= nxt
        level = nxt
    unreached = len(adj) - len(seen)
    if unreached:
        assert hist[-1]["n_nodes"] == unreached
    else:
        assert -1 not in hist


def test_capped_prefix_filter_equals_capped_inverted_index(spark, sf_dir):
    # The max_doc_freq variant must reproduce jaccard_pairs' capped
    # CONTRACT bit-for-bit — capped intersections over uncapped sizes —
    # on real data with the production cap (non-binding here) AND with
    # a deliberately tiny cap that bites, so the changed-J path is the
    # thing compared, not just the exact path.
    from mi_inbound_pulsar_spark.operators.dedup import (
        prefix_filter_pairs,
        shingle_arrays,
    )

    docs = load_table(spark, sf_dir, "documents")
    sharr = shingle_arrays(docs, n=3).filter(F.size("shingles") > 0)
    for cap in (1000, 3):
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in prefix_filter_pairs(sharr, 0.5, max_doc_freq=cap).collect()
        }
        truth = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in jaccard_pairs(shingles(docs), threshold=0.5, max_doc_freq=cap)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
            .collect()
        }
        assert got == truth, f"cap={cap}: {len(got)} vs {len(truth)} pairs"


def test_jaccard_pairs_auto_strategies_agree(spark, sf_dir):
    # The cost-based chooser is purely physical: forcing either side
    # of the cutover must give the identical pair set and scores.
    from mi_inbound_pulsar_spark.operators.dedup import (
        jaccard_pairs_auto,
        shingle_arrays,
    )

    docs = load_table(spark, sf_dir, "documents")
    sharr = shingle_arrays(docs, n=3).filter(F.size("shingles") > 0)

    def run(n_docs, cap):
        return {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs_auto(
                sharr, 0.5, n_docs=n_docs, max_doc_freq=cap
            ).collect()
        }

    for cap in (None, 3):
        inverted = run(1, cap)            # below cutover
        prefix = run(10**9, cap)          # above cutover
        assert inverted == prefix, f"cap={cap}"
        assert inverted, "degenerate: no pairs at J >= 0.5 on testdata"
