"""Property-based tests for the round-6 kernels: the distributed BPE
merge loop against a pure-Python reference implementation, and the
SemDeDup cell-local grouping against brute-force components.

Each hypothesis example runs real Spark jobs, so example counts are
small; the generators are shaped to force the nasty cases (overlapping
merges like 'aaa', count ties, zero vectors, centroid ties)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

words_strategy = st.dictionaries(
    st.text(alphabet="ab", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=6,
)


def _ref_bpe(words: dict[str, int], iters: int):
    """Reference BPE: greedy-leftmost non-overlapping merges, argmax
    pair by (count desc, pair lexicographic asc)."""
    reprs = {w: [ch for ch in w] for w in words}
    merges = []
    for i in range(1, iters + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            t = reprs[w]
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        m = max(counts.values())
        best = min(k for k, v in counts.items() if v == m)
        for w, t in reprs.items():
            out, j = [], 0
            while j < len(t):
                if j + 1 < len(t) and (t[j], t[j + 1]) == best:
                    out.append(t[j] + t[j + 1])
                    j += 2
                else:
                    out.append(t[j])
                    j += 1
            reprs[w] = out
        merges.append((i, best[0], best[1], best[0] + best[1], m))
    return merges, reprs


@given(words=words_strategy)
@settings(max_examples=10, deadline=None)
def test_bpe_train_matches_reference(spark, words):
    from mi_inbound_pulsar_spark.operators.text import bpe_train

    text = " ".join(w for w, c in sorted(words.items()) for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges_df, vocab_df = bpe_train(docs, iters=3)
    got_merges = [
        (r.iteration, r.left_sym, r.right_sym, r.merged, r.total)
        for r in merges_df.collect()
    ]
    want_merges, want_reprs = _ref_bpe(dict(words), 3)
    assert got_merges == want_merges

    got_vocab = {
        r.word: r.repr for r in vocab_df.select("word", "repr").collect()
    }
    want_vocab = {
        w: "".join(f"<{t}>" for t in toks) for w, toks in want_reprs.items()
    }
    assert got_vocab == want_vocab


vectors_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5), st.integers(min_value=-5, max_value=5)
    ),
    min_size=2,
    max_size=10,
)


def _ref_semdedup(vecs: list[tuple[int, int]], eps: float, stride: int):
    ids = np.arange(len(vecs), dtype=np.int64)
    mat = np.array(vecs, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    units = mat / norms

    cent_ids = ids[ids % stride == 0] // stride
    cents = units[ids % stride == 0]
    # 9dp quantization BEFORE the argmax, mirroring the engine's
    # documented contract (similarity.py assign()): two centroids with
    # the same direction but different magnitudes produce ulp-level
    # cosine differences (u·u vs u·u' for bitwise-close u'), and an
    # unquantized argmax picks whichever is an ulp larger — hypothesis
    # found exactly that with centroids (-1,1) and (-3,3)
    sims = np.round(units @ cents.T, 9)
    best = np.argmax(sims, axis=1)
    cell = cent_ids[best]
    cent_sim = np.round(sims[np.arange(len(ids)), best], 6)

    groups: dict[int, list[int]] = {}
    for c in np.unique(cell):
        members = np.nonzero(cell == c)[0]
        s = np.round(units[members] @ units[members].T, 6)
        adj = s >= eps
        np.fill_diagonal(adj, False)
        # brute-force components by repeated BFS
        seen: set[int] = set()
        for st_i in range(len(members)):
            if st_i in seen or not adj[st_i].any():
                continue
            comp, stack = [], [st_i]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                comp.append(x)
                stack.extend(np.nonzero(adj[x])[0].tolist())
            mids = sorted(int(members[x]) for x in comp)
            groups[mids[0]] = mids
    out = []
    for grp, mids in sorted(groups.items()):
        keeper = min(mids, key=lambda i: (cent_sim[i], i))
        out.append(
            (grp, int(cell[mids[0]]), len(mids), keeper, len(mids) - 1)
        )
    return out


@given(vecs=vectors_strategy, eps_pct=st.integers(min_value=50, max_value=99))
@settings(max_examples=10, deadline=None)
def test_semdedup_groups_match_bruteforce(spark, vecs, eps_pct):
    from mi_inbound_pulsar_spark.operators.similarity import semdedup_groups

    eps = eps_pct / 100.0
    e = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (r.grp, r.cell, r.n_members, r.keeper_vec_id, r.n_pruned)
        for r in semdedup_groups(e, eps=eps, stride=2).collect()
    )
    # float32 storage: the reference must see the same float32-rounded
    # inputs Spark reads back from the array<float> column
    vecs32 = [tuple(np.array(v, dtype=np.float32).astype(np.float64)) for v in vecs]
    want = sorted(_ref_semdedup(vecs32, eps, stride=2))
    assert got == want


def test_semdedup_equal_direction_centroid_tie(spark):
    """Regression pin for the hypothesis-found case: centroids (-1,1)
    and (-3,3) have the same direction, so a document parallel to both
    has cosine 1 to each up to an ulp. The engine quantizes to 9dp
    before the argmax and must deterministically pick the LOWEST cell;
    an unquantized reference flips to whichever centroid is an ulp
    closer (the grp/cell cascade then disagrees everywhere)."""
    from mi_inbound_pulsar_spark.operators.similarity import semdedup_groups

    vecs = [(-1, 1), (0, 0), (0, 0), (0, 0), (-3, 3)]
    e = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (r.grp, r.cell, r.n_members, r.keeper_vec_id, r.n_pruned)
        for r in semdedup_groups(e, eps=0.5, stride=2).collect()
    )
    vecs32 = [tuple(np.array(v, dtype=np.float32).astype(np.float64)) for v in vecs]
    assert got == sorted(_ref_semdedup(vecs32, 0.5, stride=2))
    # and the tie resolves to the LOWEST cell id
    assert got == [(0, 0, 2, 0, 1)]
