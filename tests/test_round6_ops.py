"""Round-6 operator tests: the multi-iteration BPE merge loop against
a hand-computed tiny corpus, and SemDeDup's cell-local duplicate
groups / paper-rule keeper election on hand-built vectors."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# bpe_merge_loop: hand-computed merge sequence
# ---------------------------------------------------------------------------
def test_bpe_merge_loop_hand_computed(spark):
    """Corpus = {abab x2, abc x1}. By hand:
    iter1 pairs: (a,b) 2*2+1=5, (b,a) 2, (b,c) 1  -> merge ab (5)
    iter2: abab=<ab><ab>, abc=<ab><c>: (ab,ab) 2, (ab,c) 1 -> abab (2)
    iter3: only (ab,c) 1 -> abc (1)."""
    from mi_inbound_pulsar_spark.operators.text import bpe_merge_loop

    docs = spark.createDataFrame(
        [(1, "abab abc"), (2, "abab")], "doc_id long, text string"
    )
    rows = bpe_merge_loop(docs, iters=3).collect()
    got = [(r.iteration, r.left_sym, r.right_sym, r.merged, r.total) for r in rows]
    assert got == [
        (1, "a", "b", "ab", 5),
        (2, "ab", "ab", "abab", 2),
        (3, "ab", "c", "abc", 1),
    ]


def test_bpe_merge_loop_tiebreak_lexicographic(spark):
    """Equal-count pairs resolve to the lexicographically smallest
    (left, right) — 'ba' and 'ab' both appear once; 'ab' must win."""
    from mi_inbound_pulsar_spark.operators.text import bpe_merge_loop

    docs = spark.createDataFrame([(1, "ab ba")], "doc_id long, text string")
    rows = bpe_merge_loop(docs, iters=1).collect()
    assert [(r.left_sym, r.right_sym, r.total) for r in rows] == [("a", "b", 1)]


def test_bpe_merge_is_greedy_leftmost(spark):
    """'aaa' under merge (a,a) becomes <aa><a>, not <a><aa> — and the
    overlapping second occurrence is NOT merged (greedy leftmost,
    non-overlapping). After iter1 merges (a,a), iter2's top pair from
    'aaa' x3 must therefore be (aa,a), not (a,aa)."""
    from mi_inbound_pulsar_spark.operators.text import bpe_merge_loop

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa ab")], "doc_id long, text string"
    )
    rows = bpe_merge_loop(docs, iters=2).collect()
    got = [(r.iteration, r.left_sym, r.right_sym, r.merged, r.total) for r in rows]
    # iter1: (a,a) appears twice per 'aaa' (positions 1-2 and 2-3) = 6;
    # (a,b) = 1 -> merge aa. iter2: each 'aaa' is now <aa><a> -> (aa,a)
    # x3; 'ab' still <a><b> -> (a,b) x1 -> merge aaa.
    assert got == [(1, "a", "a", "aa", 6), (2, "aa", "a", "aaa", 3)]


# ---------------------------------------------------------------------------
# semdedup_groups: hand-built vectors, paper-rule keeper
# ---------------------------------------------------------------------------
def test_semdedup_groups_keeper_is_centroid_outlier(spark):
    """stride=2 makes ids 0 and 2 the centroids (cells 0, 1). id1 is a
    near-dup of id0 in cell 0; id3 of id2 in cell 1; id5 lands in cell
    1 but has no >= eps neighbor and must not appear. The keeper is the
    member with the LOWEST centroid similarity (the paper's rule), so
    the non-centroid member wins in both groups."""
    from mi_inbound_pulsar_spark.operators.similarity import semdedup_groups

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # cos(id0, id1) ~= 0.9939 >= 0.95
        (2, [0.0, 1.0]),
        (3, [0.1, 0.95]),  # cos(id2, id3) ~= 0.9944 >= 0.95
        (5, [-1.0, 0.0]),  # nearest centroid is cell 1 (sim 0 > -1); singleton
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup_groups(e, eps=0.95, stride=2).collect()
    got = [(r.grp, r.cell, r.n_members, r.keeper_vec_id, r.n_pruned) for r in out]
    assert got == [(0, 0, 2, 1, 1), (2, 1, 2, 3, 1)]


def test_semdedup_groups_never_span_cells(spark):
    """Two identical vectors assigned to different cells (each IS a
    centroid under stride=1... use stride=2: ids 0,2 centroids) must
    not form a group — SemDeDup only dedups within a cluster."""
    from mi_inbound_pulsar_spark.operators.similarity import semdedup_groups

    rows = [
        (0, [1.0, 0.0]),
        (2, [1.0, 0.0]),  # identical to id0 but itself a centroid of cell 1
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # id0 -> argmax over identical sims (1.0 to both centroids) -> cell 0
    # (lowest cell id); id2 likewise -> cell 0: both in cell 0 -> group.
    out = semdedup_groups(e, eps=0.99, stride=2).collect()
    assert [(r.grp, r.n_members) for r in out] == [(0, 2)]

    # separate them for real: orthogonal vectors, each its own cell
    rows2 = [(0, [1.0, 0.0]), (2, [0.0, 1.0]), (1, [1.0, 0.0]), (3, [0.0, 1.0])]
    e2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>")
    out2 = semdedup_groups(e2, eps=0.99, stride=2).collect()
    got2 = {(r.grp, r.cell, r.n_members, r.keeper_vec_id) for r in out2}
    # id1 dups id0 in cell 0; id3 dups id2 in cell 1; no cross-cell
    # group. Duplicates here are byte-identical, so centroid sims TIE
    # at 1.0 and the keeper tie-break elects the lowest vec_id.
    assert got2 == {(0, 0, 2, 0), (2, 1, 2, 2)}
