"""Brute-force third opinions for two flagship kernels: SemDeDup
(numpy cosines + union-find) and the heuristic multi-touch attribution
models (pure-Python journey walk). Recomputed from definitions on the
real sf0.001 data — independent of both the Spark implementation and
its DuckDB oracle.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np


def test_semdedup_matches_numpy_union_find(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.similarity import (
        CENTROID_STRIDE,
        SEMDEDUP_EPS,
        q_semdedup,
    )

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    units = x / np.linalg.norm(x, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, units = ids[order], units[order]
    cent_mask = ids % CENTROID_STRIDE == 0
    cent_ids = (ids[cent_mask] // CENTROID_STRIDE).astype(np.int64)
    cent_units = units[cent_mask]
    sims = np.round(units @ cent_units.T, 9)
    # nearest centroid, ties -> lowest cell (lexsort mirrors the query)
    best = np.lexsort((np.broadcast_to(cent_ids, sims.shape), -sims), axis=1)[:, 0]
    cell = cent_ids[best]

    parent = {int(v): int(v) for v in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_cell = defaultdict(list)
    for i, v in enumerate(ids):
        by_cell[cell[i]].append(i)
    for members in by_cell.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = members[ai], members[bi]
                if round(float(units[a] @ units[b]), 6) >= SEMDEDUP_EPS:
                    union(int(ids[a]), int(ids[b]))
    groups = defaultdict(set)
    for v in ids:
        groups[find(int(v))].add(int(v))
    dup_groups = {k: vs for k, vs in groups.items() if len(vs) >= 2}

    got = q_semdedup(spark, sf_dir).collect()
    got_groups = {r["grp"]: r for r in got}
    assert set(got_groups) == set(dup_groups)
    for grp, r in got_groups.items():
        assert r["n_members"] == len(dup_groups[grp])


def test_attribution_models_match_pure_python(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.funnel import (
        DECAY_HALFLIFE_S,
        q_attribution_models,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append(r)
    linear = defaultdict(float)
    decay = defaultdict(float)
    position = defaultdict(float)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        journey = []
        for r in rows:
            if r["event_type"] == "purchase":
                if journey:
                    n = len(journey)
                    conv_us = int(r["ts"].timestamp() * 1_000_000)
                    ws = [
                        0.5
                        ** (
                            (conv_us - int(t.timestamp() * 1_000_000))
                            / 1_000_000.0
                            / DECAY_HALFLIFE_S
                        )
                        for _, t in journey
                    ]
                    tot = sum(ws)
                    for i, (ch, _t) in enumerate(journey):
                        linear[ch] += 1.0 / n
                        decay[ch] += ws[i] / tot
                        if n == 1:
                            position[ch] += 1.0
                        elif n == 2:
                            position[ch] += 0.5
                        elif i == 0 or i == n - 1:
                            position[ch] += 0.4
                        else:
                            position[ch] += 0.2 / (n - 2)
                journey = []
            else:
                journey.append((r["event_type"], r["ts"]))
    # NOTE: the query uses min(purchase ts) per journey as conv time;
    # journeys here end at the first purchase encountered, identical.
    got = {r["channel"]: r for r in q_attribution_models(spark, sf_dir).collect()}
    assert set(got) == set(linear)
    for ch in linear:
        assert math.isclose(got[ch]["linear_credit"], linear[ch], abs_tol=1e-4)
        assert math.isclose(got[ch]["time_decay_credit"], decay[ch], abs_tol=1e-4)
        assert math.isclose(got[ch]["position_credit"], position[ch], abs_tol=1e-4)


def test_substring_dedup_matches_pure_python(spark, sf_dir):
    """Brute-force ExactSubstr replay: enumerate every k-token window,
    count distinct-doc frequency, mark covered positions, and compare
    the per-doc span counts and kept-token counts."""
    from mi_inbound_pulsar_spark.operators.dedup import (
        SUBSTR_MIN_DF,
        SUBSTR_SPAN_TOKENS,
        q_substring_dedup,
    )

    k = SUBSTR_SPAN_TOKENS
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    span_docs = defaultdict(set)
    for d, w in docs.items():
        for i in range(len(w) - k + 1):
            span_docs[" ".join(w[i : i + k])].add(d)
    dup_spans = {s for s, ds in span_docs.items() if len(ds) >= SUBSTR_MIN_DF}
    expected = {}
    for d, w in docs.items():
        cov = set()
        n_hits = 0
        for i in range(len(w) - k + 1):
            if " ".join(w[i : i + k]) in dup_spans:
                n_hits += 1
                cov.update(range(i, i + k))
        expected[d] = (n_hits, len(w) - len(cov))
    got = q_substring_dedup(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        n_hits, kept = expected[r["doc_id"]]
        assert r["dup_span_starts"] == n_hits, (
            r["doc_id"], r["dup_span_starts"], n_hits,
        )
        assert r["removed_tokens"] == r["n_tokens"] - kept
        got_kept = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        assert got_kept == kept, (r["doc_id"], got_kept, kept)


def test_dsir_matches_pure_python(spark, sf_dir):
    """Brute-force DSIR replay: md5 bucket hashing, add-1 smoothed
    target/raw distributions, per-doc log-weight sums, and the
    interpolated keep-quantile threshold."""
    import hashlib

    from mi_inbound_pulsar_spark.operators.sampling import (
        DSIR_BUCKETS,
        DSIR_KEEP_QUANTILE,
        DSIR_TARGET_SOURCE,
        q_dsir_selection,
    )

    docs = [
        (r["doc_id"], r["source"], r["text"].split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    bcache = {}

    def bucket(w):
        if w not in bcache:
            bcache[w] = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS
        return bcache[w]

    tc = defaultdict(int)
    rc = defaultdict(int)
    for _d, src, ws in docs:
        for w in ws:
            b = bucket(w)
            rc[b] += 1
            if src == DSIR_TARGET_SOURCE:
                tc[b] += 1
    nt, nr = sum(tc.values()), sum(rc.values())
    lr = {
        b: math.log((tc.get(b, 0) + 1.0) / (nt + DSIR_BUCKETS))
        - math.log((rc[b] + 1.0) / (nr + DSIR_BUCKETS))
        for b in rc
    }
    scores = {
        d: sum(lr[bucket(w)] for w in ws) for d, _src, ws in docs
    }
    vals = sorted(scores.values())
    pos = (len(vals) - 1) * DSIR_KEEP_QUANTILE
    lo, hi = int(pos), min(int(pos) + 1, len(vals) - 1)
    thr = vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)
    got = q_dsir_selection(spark, sf_dir).collect()
    assert len(got) == len(scores)
    for r in got:
        assert math.isclose(r["dsir_logweight"], scores[r["doc_id"]], abs_tol=1e-4)
        assert r["selected"] == (
            round(scores[r["doc_id"]], 6) >= round(thr, 6)
        ), (r["doc_id"],)


def test_markov_attribution_matches_exact_linear_solve(spark, sf_dir):
    """Independent check of the removal-effect attribution: rebuild the
    transition table in pure Python from the raw events, then solve the
    absorption probability EXACTLY ((I - T)^-1 c via numpy) instead of
    the query's fixed 20-iteration power series. Agreement within the
    documented series-truncation slack validates journey construction,
    transition counting, and the removal semantics end to end."""
    from mi_inbound_pulsar_spark.operators.funnel import (
        MARKOV_CHANNELS,
        q_markov_attribution,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append(r)
    counts = defaultdict(int)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        journey = []
        for r in rows:
            if r["event_type"] == "purchase":
                if journey:
                    counts[("START", journey[0])] += 1
                    for a, b in zip(journey, journey[1:]):
                        counts[(a, b)] += 1
                    counts[(journey[-1], "CONV")] += 1
                else:
                    counts[("START", "CONV")] += 1
                journey = []
            else:
                ch = r["event_type"]
                if not journey or journey[-1] != ch:
                    journey.append(ch)
        if journey:
            counts[("START", journey[0])] += 1
            for a, b in zip(journey, journey[1:]):
                counts[(a, b)] += 1
            counts[(journey[-1], "DROP")] += 1
    states = ("START",) + tuple(MARKOV_CHANNELS)
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)

    def absorb(removed=None):
        T = np.zeros((n, n))
        c = np.zeros(n)
        tot = defaultdict(int)
        for (a, _b), k in counts.items():
            tot[a] += k
        for (a, b), k in counts.items():
            if a == removed or b == removed:
                continue
            p = k / tot[a]
            if b == "CONV":
                c[idx[a]] += p
            elif b != "DROP":
                T[idx[a], idx[b]] += p
        return float(np.linalg.solve(np.eye(n) - T, c)[idx["START"]])

    p_base = absorb(None)
    effects = {ch: 1.0 - absorb(ch) / p_base for ch in MARKOV_CHANNELS}
    te = sum(effects.values())
    got = {r["channel"]: r for r in q_markov_attribution(spark, sf_dir).collect()}
    assert set(got) == set(effects)
    for ch in effects:
        assert math.isclose(got[ch]["p_conversion"], p_base, abs_tol=0.02)
        assert math.isclose(got[ch]["removal_effect"], effects[ch], abs_tol=0.02)
        assert math.isclose(
            got[ch]["attribution_share"], effects[ch] / te, abs_tol=0.02
        )


def _brute_jaccard_pairs(docs, threshold):
    """All doc pairs with 3-gram-shingle Jaccard >= threshold, using
    the repo's round-6dp-then-threshold convention."""
    sh = {}
    for d, w in docs.items():
        sh[d] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_minhash_lsh_neardup_is_exact_at_threshold(spark, sf_dir):
    """The LSH+verify pipeline must return EXACTLY the brute-force
    J >= 0.8 pair set (banding is recall machinery; the exact verify
    step makes the output exact)."""
    from mi_inbound_pulsar_spark.operators.dedup import q_minhash_lsh_neardup

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    expected = _brute_jaccard_pairs(docs, 0.8)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_minhash_lsh_neardup(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, j in expected.items():
        assert abs(got[k] - j) < 1e-5


def test_prefix_filter_jaccard_is_exact_at_threshold(spark, sf_dir):
    """The PPJoin candidate rule must lose nothing: its output equals
    the brute-force J >= 0.5 pair set."""
    from mi_inbound_pulsar_spark.operators.dedup import q_prefix_filter_jaccard

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    expected = _brute_jaccard_pairs(docs, 0.5)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_prefix_filter_jaccard(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, j in expected.items():
        assert abs(got[k] - j) < 1e-5
