"""Invariant tests for the round-4 operator additions — properties
that must hold on ANY testdata regeneration, complementing the exact
DuckDB oracles (which pin current values)."""

from __future__ import annotations

import hashlib
import math

import pytest


def test_line_dedup_untouched_docs_roundtrip(spark, sf_dir):
    """A document with zero dropped segments must reassemble to its
    exact original text, and kept+dropped must equal ceil(words/8)."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.dedup import LINE_SEG_WORDS, q_line_dedup
    from mi_inbound_pulsar_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in q_line_dedup(spark, sf_dir).collect()}
    orig = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert out, "no documents survived line dedup"
    untouched = 0
    for doc_id, r in out.items():
        n_words = len(orig[doc_id].split(" "))
        n_segs = math.ceil(n_words / LINE_SEG_WORDS)
        assert r["kept_segments"] + r["dropped_segments"] == n_segs
        if r["dropped_segments"] == 0:
            assert r["clean_text"] == orig[doc_id]
            untouched += 1
    assert untouched > 0


def test_line_dedup_dropped_segments_are_shared(spark, sf_dir):
    """Every segment the operator drops must genuinely occur in more
    than LINE_MAX_DF distinct documents (no false drops)."""
    from collections import defaultdict

    from mi_inbound_pulsar_spark.operators.dedup import (
        LINE_MAX_DF,
        LINE_SEG_WORDS,
        q_line_dedup,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    seg_docs: dict[str, set] = defaultdict(set)
    for doc_id, text in docs.items():
        w = text.split(" ")
        for i in range(0, len(w), LINE_SEG_WORDS):
            seg_docs[" ".join(w[i : i + LINE_SEG_WORDS])].add(doc_id)
    out = {r["doc_id"]: r for r in q_line_dedup(spark, sf_dir).collect()}
    for doc_id, r in out.items():
        w = docs[doc_id].split(" ")
        kept = set(r["clean_text"].split(" ")) if r["clean_text"] else set()
        for i in range(0, len(w), LINE_SEG_WORDS):
            seg = " ".join(w[i : i + LINE_SEG_WORDS])
            if len(seg_docs[seg]) <= LINE_MAX_DF:
                # kept segment: its words must appear in the clean text
                assert set(seg.split(" ")) <= kept


def test_copurchase_jaccard_matches_bruteforce(spark, sf_dir):
    """Pair counts and Jaccard must equal a driver-side brute force
    over the capped baskets (which the operator never materializes)."""
    from collections import defaultdict
    from itertools import combinations

    from mi_inbound_pulsar_spark.operators.graph import (
        COPURCHASE_MAX_DF,
        COPURCHASE_MIN_COMMON,
        q_copurchase_jaccard,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    o = {r["o_orderkey"]: r["o_custkey"] for r in load_table(spark, sf_dir, "orders").collect()}
    baskets: dict[int, set] = defaultdict(set)
    part_df: dict[int, set] = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect():
        cust = o[r["l_orderkey"]]
        baskets[cust].add(r["l_partkey"])
        part_df[r["l_partkey"]].add(cust)
    hot = {p for p, cs in part_df.items() if len(cs) > COPURCHASE_MAX_DF}
    capped = {c: ps - hot for c, ps in baskets.items()}
    expected = {}
    for a, b in combinations(sorted(capped), 2):
        common = len(capped[a] & capped[b])
        if common >= COPURCHASE_MIN_COMMON:
            expected[(a, b)] = (
                common,
                common / (len(capped[a]) + len(capped[b]) - common),
            )
    got = {
        (r["cust_a"], r["cust_b"]): (r["common_parts"], r["jaccard"])
        for r in q_copurchase_jaccard(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (common, jacc) in expected.items():
        assert got[k][0] == common
        assert got[k][1] == pytest.approx(jacc, abs=1e-12)


def test_random_projection_matches_numpy(spark, sf_dir):
    """The sketch must equal an independent numpy recomputation with
    the same md5-derived sign matrix and integer quantization."""
    import numpy as np

    from mi_inbound_pulsar_spark.operators.similarity import (
        RP_OUT_DIMS,
        q_random_projection,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in load_table(spark, sf_dir, "embeddings").limit(50).collect()
    }
    dims = len(next(iter(vecs.values())))
    sign = np.empty((dims, RP_OUT_DIMS), dtype=np.int64)
    for i in range(dims):
        for j in range(RP_OUT_DIMS):
            h = hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0]
            sign[i, j] = 1 if h in "01234567" else -1
    got = {
        (r["vec_id"], r["out_dim"]): r["sketch"]
        for r in q_random_projection(spark, sf_dir).collect()
    }
    for vec_id, v in vecs.items():
        q = np.floor(v.astype(np.float64) * 1000).astype(np.int64)
        expect = q @ sign
        for j in range(RP_OUT_DIMS):
            assert got[(vec_id, j)] == expect[j]


def test_skyline_matches_bruteforce(spark, sf_dir):
    """Two-phase skyline must equal the O(n^2) dominance scan."""
    from mi_inbound_pulsar_spark.operators.relational import q_skyline_dominance
    from mi_inbound_pulsar_spark.sources.tables import load_table

    pts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    expected = {
        k
        for k, pr, sz in pts
        if not any(
            qpr <= pr and qsz <= sz and (qpr < pr or qsz < sz)
            for _, qpr, qsz in pts
        )
    }
    got = {r["p_partkey"] for r in q_skyline_dominance(spark, sf_dir).collect()}
    assert got == expected
    assert got, "empty skyline"


def test_local_skyline_fuzz():
    """The pandas local-skyline sweep equals brute force on random
    frames, including duplicate points and price/size ties."""
    import random

    import pandas as pd

    from mi_inbound_pulsar_spark.operators.relational import local_skyline_batches

    rng = random.Random(42)
    for _ in range(25):
        n = rng.randint(1, 60)
        pdf = pd.DataFrame(
            {
                "p_partkey": range(n),
                "p_retailprice": [float(rng.randint(0, 8)) for _ in range(n)],
                "p_size": [rng.randint(0, 8) for _ in range(n)],
            }
        )
        (out,) = list(local_skyline_batches([pdf])) or [pdf.iloc[0:0]]
        got = set(out["p_partkey"])
        pts = list(pdf.itertuples(index=False))
        expected = {
            p.p_partkey
            for p in pts
            if not any(
                q.p_retailprice <= p.p_retailprice
                and q.p_size <= p.p_size
                and (q.p_retailprice < p.p_retailprice or q.p_size < p.p_size)
                for q in pts
            )
        }
        assert got == expected


def test_kcore_matches_bruteforce_fixpoint(spark, sf_dir):
    """The bounded 4-round peel must (a) match a brute-force 4-round
    peel exactly and (b) have reached its fixpoint at this SF — no
    node in the result has degree < k, so the bounded result IS the
    true k-core here."""
    from collections import defaultdict

    from mi_inbound_pulsar_spark.operators.graph import (
        KCORE_K,
        KCORE_MIN_COMMON,
        KCORE_ROUNDS,
        capped_baskets,
        q_kcore_peel,
    )

    pairs = defaultdict(int)
    baskets = defaultdict(set)
    for r in capped_baskets(spark, sf_dir).collect():
        baskets[r["cust"]].add(r["part"])
    custs = sorted(baskets)
    adj = defaultdict(set)
    for i, a in enumerate(custs):
        for b in custs[i + 1 :]:
            if len(baskets[a] & baskets[b]) >= KCORE_MIN_COMMON:
                adj[a].add(b)
                adj[b].add(a)
    cur = {n: set(v) for n, v in adj.items()}
    for _ in range(KCORE_ROUNDS):
        drop = {n for n, v in cur.items() if len(v) < KCORE_K}
        for n in drop:
            for m in cur[n]:
                if m in cur and m not in drop:
                    cur[m].discard(n)
            del cur[n]
    expected = {n: len(v) for n, v in cur.items() if v}
    got = {
        r["node"]: r["core_degree"] for r in q_kcore_peel(spark, sf_dir).collect()
    }
    assert got == expected
    # fixpoint reached inside the bound at this SF
    assert all(d >= KCORE_K for d in got.values())


def test_countmin_never_underestimates(spark, sf_dir):
    """CMS one-sided error: estimate >= exact for every probed key,
    and equality holds when a key collides with nothing in some row."""
    from mi_inbound_pulsar_spark.operators.aggstats import q_countmin_sketch

    rows = q_countmin_sketch(spark, sf_dir).collect()
    assert rows
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)


def test_quantile_normalize_is_exact_permutation(spark, sf_dir):
    """Ranks are a permutation of 1..N, pct spans [0, 1], deciles are
    balanced to within one row — on any regenerated corpus."""
    from mi_inbound_pulsar_spark.operators.sampling import q_quantile_normalize

    rows = q_quantile_normalize(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["rn"] for r in rows) == list(range(1, n + 1))
    assert min(r["pct"] for r in rows) == 0.0
    assert max(r["pct"] for r in rows) == 1.0
    from collections import Counter

    sizes = Counter(r["decile"] for r in rows)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # rank order agrees with the (n_chars, doc_id) total order
    by_rn = sorted(rows, key=lambda r: r["rn"])
    keys = [(r["n_chars"], r["doc_id"]) for r in by_rn]
    assert keys == sorted(keys)


def test_plan_audit_clean_on_representatives(spark, sf_dir):
    """The static plan auditor flags nothing on a cross-family sample
    and still detects a deliberately bad plan (global window)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.sources.tables import load_table
    from tools.plan_audit import audit_one

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("q01_pricing_summary", "q_dedup_exact", "q_skyline_dominance"):
        res = audit_one(name, qs[name](spark, sf_dir))
        assert res["flags"] == [], (name, res)
    bad = load_table(spark, sf_dir, "nation").withColumn(
        "rn", F.row_number().over(Window.orderBy("n_nationkey"))
    )
    res = audit_one("synthetic_bad", bad)
    assert "GlobalWindow" in res["flags"]


def test_deletion_propagation_totals(spark, sf_dir):
    """Purged + retained must equal each table's row count, and the
    lineitem purge set must exactly equal lineitems of tombstoned
    customers' orders (referential cascade, brute-forced)."""
    from mi_inbound_pulsar_spark.operators.cdc import q_deletion_propagation
    from mi_inbound_pulsar_spark.sources.tables import load_table

    out = {r["tbl"]: r for r in q_deletion_propagation(spark, sf_dir).collect()}
    assert set(out) == {"customer", "orders", "lineitem"}
    counts = {
        t: load_table(spark, sf_dir, t).count()
        for t in ("customer", "orders", "lineitem")
    }
    for t, n in counts.items():
        assert out[t]["purged_rows"] + out[t]["retained_rows"] == n
    tomb = {
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer").collect()
        if r["c_custkey"] % 97 == 0
    }
    orders = load_table(spark, sf_dir, "orders").collect()
    purged_orders = {r["o_orderkey"] for r in orders if r["o_custkey"] in tomb}
    assert out["orders"]["purged_rows"] == len(purged_orders)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    assert out["lineitem"]["purged_rows"] == sum(
        1 for r in li if r["l_orderkey"] in purged_orders
    )


def test_timeseries_similarity_matches_numpy(spark, sf_dir):
    """Correlations must equal numpy's pearson on dense zero-filled
    daily vectors, and the top-20 must be the true top-20."""
    import numpy as np

    from mi_inbound_pulsar_spark.operators.eventsops import q_timeseries_similarity
    from mi_inbound_pulsar_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    rows = (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    days = sorted({r["day"] for r in rows})
    di = {d: i for i, d in enumerate(days)}
    users = sorted({r["user_id"] for r in rows})
    vec = {u: np.zeros(len(days)) for u in users}
    for r in rows:
        vec[r["user_id"]][di[r["day"]]] = r["c"]
    pu = min(users)
    a = vec[pu]
    exp = {}
    for u in users:
        if u == pu:
            continue
        b = vec[u]
        if a.std() == 0 or b.std() == 0:
            continue
        exp[u] = round(float(np.corrcoef(a, b)[0, 1]), 6)
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["user_id"], r["corr"])
        for r in q_timeseries_similarity(spark, sf_dir).collect()
    ]
    assert len(got) == min(20, len(exp))
    for (gu, gc), (eu, ec) in zip(got, top):
        assert gu == eu
        assert gc == pytest.approx(ec, abs=2e-6)
