"""Brute-force third opinions for the round-7 flagship kernels:
greedy k-center (numpy farthest-point replay), the Naive Bayes
classifier (pure-Python counts + integer ppm argmax), Katz centrality
(numpy int64 fixpoint), DoReMi reweighting (pure-Python sums), and the
decision stump (pure-Python prefix Gini). Recomputed from definitions
on the real sf0.001 data — independent of both the Spark
implementation and its DuckDB oracle."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np


def _round_half_away(x: float, digits: int = 0) -> float:
    """Spark/DuckDB ROUND semantics (half away from zero), which
    Python's banker's ``round`` does not match."""
    q = 10**digits
    return math.copysign(math.floor(abs(x) * q + 0.5), x) / q


def test_kcenter_matches_numpy_greedy(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.similarity import (
        KCENTER_K,
        q_kcenter_coreset,
    )

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, x = ids[order], x[order]

    trace = [(1, int(ids[0]), 0.0)]
    mind = np.round(np.sqrt(((x - x[0]) ** 2).sum(axis=1)), 6)
    for j in range(2, KCENTER_K + 1):
        # argmax by (mind desc, vec_id asc); ids are sorted ascending
        best = int(np.lexsort((ids, -mind))[0])
        trace.append((j, int(ids[best]), float(mind[best])))
        if j < KCENTER_K:
            d = np.round(np.sqrt(((x - x[best]) ** 2).sum(axis=1)), 6)
            mind = np.minimum(mind, d)

    got = [
        (r.sel_order, r.vec_id, r.sep_distance)
        for r in q_kcenter_coreset(spark, sf_dir).collect()
    ]
    assert got == trace


def test_naive_bayes_matches_pure_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.text import q_naive_bayes_confusion

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok_re = re.compile(r"[a-z]+")

    def is_train(doc_id):
        h = hashlib.md5(f"nb{doc_id}".encode()).hexdigest()[:2]
        return h < "80"

    train = [d for d in docs if is_train(d["doc_id"])]
    test = [d for d in docs if not is_train(d["doc_id"])]

    vocab = set()
    tc = Counter()  # (class, tok) -> occurrences
    ctok = Counter()  # class -> token total
    ndocs = Counter()  # class -> train docs
    for d in train:
        ndocs[d["source"]] += 1
        for t in tok_re.findall(d["text"].lower()):
            vocab.add(t)
            tc[(d["source"], t)] += 1
            ctok[d["source"]] += 1
    V, D = len(vocab), len(train)
    classes = sorted(ndocs)
    prior = {
        c: int(_round_half_away(math.log(ndocs[c] / D) * 1e6)) for c in classes
    }
    lp = {
        (c, t): int(
            _round_half_away(
                math.log((tc[(c, t)] + 1.0) / (ctok[c] + V)) * 1e6
            )
        )
        for c in classes
        for t in vocab
    }

    confusion = Counter()
    for d in test:
        occ = Counter(
            t for t in tok_re.findall(d["text"].lower()) if t in vocab
        )
        scores = {
            c: prior[c] + sum(n * lp[(c, t)] for t, n in occ.items())
            for c in classes
        }
        # argmax with tie-break: score desc, class asc
        best = max(scores.values())
        pred = min(c for c in classes if scores[c] == best)
        confusion[(d["source"], pred)] += 1

    got = {
        (r.true_source, r.pred_source): r.n_docs
        for r in q_naive_bayes_confusion(spark, sf_dir).collect()
    }
    assert got == dict(confusion)


def test_katz_matches_numpy_int_fixpoint(spark, sf_dir):
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.graph import q_katz_centrality

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", (F.col("l_suppkey") + 1_000_000_000).alias("supp"))
        .distinct()
        .collect()
    )
    edges = set()
    for r in cs:
        edges.add((r["o_custkey"], r["supp"]))
        edges.add((r["supp"], r["o_custkey"]))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    x = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += x[s]
        x = {n: 1_000_000 + (200_000 * inflow.get(n, 0)) // 1_000_000 for n in nodes}
    expect = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [
        (r.node, r.katz_ppm) for r in q_katz_centrality(spark, sf_dir).collect()
    ]
    assert got == expect


def test_doremi_matches_pure_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.sampling import (
        DOREMI_EPS,
        DOREMI_ETA,
        q_doremi_reweight,
    )
    from mi_inbound_pulsar_spark.operators.text import TOKEN_REGEX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok_re = re.compile(TOKEN_REGEX)
    nb = Counter()
    nt = Counter()
    nd = Counter()
    for d in docs:
        src = d["source"]
        nd[src] += 1
        nb[src] += len(d["text"].encode())
        nt[src] += len(tok_re.findall(d["text"]))
    proxy_c = sum(nb.values()) / sum(nt.values())
    srcs = sorted(nd)
    excess = {
        s: max(_round_half_away(nb[s] / nt[s] - proxy_c, 9), 0.0) for s in srcs
    }
    w_raw = {s: math.exp(DOREMI_ETA * excess[s]) for s in srcs}
    z = sum(w_raw.values())
    k = len(srcs)
    for r in q_doremi_reweight(spark, sf_dir).collect():
        s = r.source
        assert r.n_docs == nd[s]
        assert abs(r.bytes_per_token - nb[s] / nt[s]) < 1e-5
        assert abs(r.excess_loss - excess[s]) < 1e-5
        assert abs(r.domain_weight - w_raw[s] / z) < 1e-5
        assert (
            abs(
                r.mixture_weight
                - ((1 - DOREMI_EPS) * w_raw[s] / z + DOREMI_EPS / k)
            )
            < 1e-5
        )


def test_decision_stump_matches_pure_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.aggstats import q_decision_stump

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for c in cust:
        band = math.floor(float(c["c_acctbal"]))
        per[band][c["c_mktsegment"] == "BUILDING"] += 1
    bands = sorted(per)
    t0 = sum(v[0] for v in per.values())
    t1 = sum(v[1] for v in per.values())
    n = t0 + t1
    scored = []
    c0 = c1 = 0
    for b in bands:
        c0 += per[b][0]
        c1 += per[b][1]
        r0, r1 = t0 - c0, t1 - c1
        nl, nr = c0 + c1, r0 + r1
        if nr == 0:
            continue
        gini = (nl * nl - c1 * c1 - c0 * c0) / (nl * n) + (
            nr * nr - r1 * r1 - r0 * r0
        ) / (nr * n)
        scored.append((_round_half_away(gini, 6), b, nl, nr))
    scored.sort()
    expect = [
        (b, nl, nr, g) for g, b, nl, nr in scored[:5]
    ]
    got = [
        (r.threshold, r.n_left, r.n_right, r.gini_split)
        for r in q_decision_stump(spark, sf_dir).collect()
    ]
    assert got == expect


def test_isotonic_minimax_matches_pava(spark, sf_dir):
    """The engine computes isotonic calibration through the minimax
    closed form; this replay runs the ACTUAL pool-adjacent-violators
    sweep — a genuinely different algorithm — and checks the fits
    agree, plus the PAVA invariants (monotone fit, weighted mass
    preserved)."""
    from mi_inbound_pulsar_spark.operators.aggstats import (
        q_isotonic_calibration,
    )

    rows = q_isotonic_calibration(spark, sf_dir).collect()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    agg = {}
    for r in li:
        b = int(_round_half_away(float(r["l_discount"]) * 100))
        w, y = agg.get(b, (0, 0))
        agg[b] = (w + 1, y + (r["l_returnflag"] == "R"))
    blocks = [
        [b, float(agg[b][0]), float(agg[b][1])] for b in sorted(agg)
    ]  # [bin, weight, ysum]
    # PAVA: merge adjacent blocks while a violator (mean > next mean)
    stack = []
    for blk in blocks:
        stack.append(blk)
        while (
            len(stack) > 1
            and stack[-2][2] / stack[-2][1] > stack[-1][2] / stack[-1][1]
        ):
            b2 = stack.pop()
            stack[-1][1] += b2[1]
            stack[-1][2] += b2[2]
    fit = {}
    idx = 0
    bins_sorted = sorted(agg)
    for blk in stack:
        mean = blk[2] / blk[1]
        # blk[0] is the first bin of the merged block; assign mean to
        # every original bin consumed by it
        width = int(blk[1])
        consumed = 0
        while consumed < width:
            b = bins_sorted[idx]
            fit[b] = mean
            consumed += agg[b][0]
            idx += 1

    got = {r.discount_pct: r.iso_rate for r in rows}
    assert set(got) == set(fit)
    for b in fit:
        assert abs(got[b] - fit[b]) < 1e-6, (b, got[b], fit[b])
    # monotone non-decreasing
    seq = [got[b] for b in sorted(got)]
    assert all(a <= b + 1e-9 for a, b in zip(seq, seq[1:]))
    # weighted mass preserved: sum w*iso == sum y
    tot_iso = sum(agg[b][0] * fit[b] for b in fit)
    tot_y = sum(y for _, y in agg.values())
    assert abs(tot_iso - tot_y) < 1e-6


def test_assortativity_matches_pure_python(spark, sf_dir):
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.graph import (
        q_degree_assortativity,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", (F.col("l_suppkey") + 1_000_000_000).alias("s"))
        .distinct()
        .collect()
    )
    edges = []
    for r in cs:
        edges.append((r["o_custkey"], r["s"]))
        edges.append((r["s"], r["o_custkey"]))
    deg = Counter(s for s, _ in edges)
    dj = [deg[s] for s, _ in edges]
    dk = [deg[d] for _, d in edges]
    m = len(edges)
    mj, mk = sum(dj) / m, sum(dk) / m
    cov = sum(a * b for a, b in zip(dj, dk)) / m - mj * mk
    vj = sum(a * a for a in dj) / m - mj * mj
    vk = sum(b * b for b in dk) / m - mk * mk
    expect = cov / math.sqrt(vj * vk)

    (row,) = q_degree_assortativity(spark, sf_dir).collect()
    assert row.m == m
    assert abs(row.assortativity - expect) < 1e-6
    # bipartite purchase graphs are disassortative
    assert row.assortativity < 0


def test_ips_policy_eval_matches_pure_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.eventsops import (
        q_ips_policy_eval,
    )

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()

    def is_log(eid):
        return hashlib.md5(f"ips{eid}".encode()).hexdigest()[:2] < "80"

    log = [r for r in rows if is_log(r["event_id"])]
    test = [r for r in rows if not is_log(r["event_id"])]
    per_user = defaultdict(Counter)
    for r in log:
        per_user[r["user_id"]][r["event_type"]] += 1
    rec = {
        u: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for u, c in per_user.items()
    }
    n = len(test)
    n_a = Counter(r["event_type"] for r in test)
    n_match = Counter()
    match_cents = Counter()
    for r in test:
        if rec.get(r["user_id"]) == r["event_type"]:
            n_match[r["event_type"]] += 1
            match_cents[r["event_type"]] += int(
                _round_half_away(float(r["value"]) * 100)
            )
    got = {r.event_type: r for r in q_ips_policy_eval(spark, sf_dir).collect()}
    assert set(got) == set(n_a)
    for a in n_a:
        assert got[a].n_a == n_a[a]
        assert got[a].n_match == n_match[a]
        assert abs(got[a].p_log - n_a[a] / n) < 1e-6
        assert (
            abs(got[a].ips_contribution - match_cents[a] / n_a[a] / 100)
            < 1e-5
        )
