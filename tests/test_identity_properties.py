"""Property-based validation (hypothesis) of the closed-form
identities the late-round-9 rank/divergence operators execute in BOTH
engines. Each property reimplements the exact formula the SQL/DataFrame
code ships (the prefix/cumulative closed form) and checks it against
the definitional computation on RANDOM inputs — so the algebra is
proven in general, not just on the one corpus the oracle sweep
exercises. (The per-operator tests elsewhere prove the ENGINES execute
these formulas; these prove the formulas themselves.)
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

small_ints = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=2, max_size=60
)
two_samples = st.tuples(
    st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=40),
    st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=40),
)


def _blocks(pooled_sorted):
    """(value, l, r) pooled-position blocks of a sorted multiset."""
    out = []
    i = 0
    n = len(pooled_sorted)
    while i < n:
        j = i
        while j < n and pooled_sorted[j] == pooled_sorted[i]:
            j += 1
        out.append((pooled_sorted[i], i + 1, j))  # 1-based inclusive
        i = j
    return out


@given(two_samples)
@settings(max_examples=200, deadline=None)
def test_ansari_bradley_block_average_identity(samples):
    """closed-form tie-block average of min(i, N+1-i) — the piecewise
    fold-split formula shipped in q_ansari_bradley — equals the direct
    positionwise average for EVERY block shape, including blocks that
    straddle the fold."""
    x, y = samples
    pooled = sorted(x + y)
    nn = len(pooled)
    m = (nn + 1) // 2
    for _, r_lo, r_hi in _blocks(pooled):
        direct = sum(min(i, nn + 1 - i) for i in range(r_lo, r_hi + 1)) / (
            r_hi - r_lo + 1
        )
        if 2 * r_hi <= nn + 1:
            closed = (r_lo + r_hi) / 2
        elif 2 * r_lo >= nn + 1:
            closed = nn + 1 - (r_lo + r_hi) / 2
        else:
            closed = (
                (m * (m + 1) - r_lo * (r_lo - 1)) / 2
                + (nn + 1) * (r_hi - m)
                - (r_hi * (r_hi + 1) - m * (m + 1)) / 2
            ) / (r_hi - r_lo + 1)
        assert abs(direct - closed) < 1e-9


@given(two_samples)
@settings(max_examples=200, deadline=None)
def test_mood_block_average_identity(samples):
    """the Σi/Σi² prefix form of the tie-block average of
    (i-(N+1)/2)² equals the direct positionwise average."""
    x, y = samples
    pooled = sorted(x + y)
    nn = len(pooled)
    for _, r_lo, r_hi in _blocks(pooled):
        cnt = r_hi - r_lo + 1
        direct = sum(
            (i - (nn + 1) / 2) ** 2 for i in range(r_lo, r_hi + 1)
        ) / cnt
        sum_i = (r_hi * (r_hi + 1) - (r_lo - 1) * r_lo) / 2
        sum_i2 = (
            r_hi * (r_hi + 1) * (2 * r_hi + 1)
            - (r_lo - 1) * r_lo * (2 * r_lo - 1)
        ) / 6
        closed = (
            sum_i2 - (nn + 1) * sum_i + cnt * (nn + 1) ** 2 / 4
        ) / cnt
        assert abs(direct - closed) < 1e-9


@given(two_samples)
@settings(max_examples=100, deadline=None)
def test_energy_cross_term_cumulative_identity(samples):
    """Σⱼ|v−yⱼ| = v(2F_y(v)−m) + T_y − 2S_y(v) — the single-pass form
    of q_energy_distance — against the brute-force pair sum."""
    x, y = samples
    m = len(y)
    t_y = sum(y)
    ys = sorted(y)
    for v in set(x):
        brute = sum(abs(v - yy) for yy in y)
        cnt_le = sum(1 for yy in ys if yy <= v)
        sum_le = sum(yy for yy in ys if yy <= v)
        closed = v * (2 * cnt_le - m) + t_y - 2 * sum_le
        assert brute == closed


@given(small_ints)
@settings(max_examples=100, deadline=None)
def test_pettitt_rank_identity(xs):
    """U_t = 2·Σ_{i≤t}R_i − t(N+1) (midranks) equals the
    Σ_{i≤t}Σ_{j>t} sgn(x_j−x_i) double sum at every split point."""
    n = len(xs)
    s = sorted(xs)

    def midrank(v):
        lo = sum(1 for a in s if a < v)
        t = sum(1 for a in s if a == v)
        return lo + (t + 1) / 2

    for t in range(1, n):
        double = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(t)
            for j in range(t, n)
        )
        rank_form = 2 * sum(midrank(xs[i]) for i in range(t)) - t * (n + 1)
        # the rank form carries the OPPOSITE sign orientation
        # (Σ sgn(x_i − x_j) over the split): hypothesis found the
        # flip immediately on a tied example — |U_t| is what the
        # production query maximizes, so the statistic is unaffected,
        # but the signed identity is U_t = −(2ΣR − t(N+1))
        assert abs(double + rank_form) < 1e-9


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False),
            min_size=3,
            max_size=3,
        ).filter(lambda v: sum(a * a for a in v) > 1e-6),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_anisotropy_sum_vector_identity(vecs):
    """Σ_{i≠j} cos(u_i,u_j) = ‖Σu‖² − n on unit-normalized vectors —
    the q_embedding_anisotropy collapse — vs the pairwise sum."""
    units = []
    for v in vecs:
        nrm = math.sqrt(sum(a * a for a in v))
        units.append([a / nrm for a in v])
    n = len(units)
    brute = sum(
        sum(a * b for a, b in zip(units[i], units[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    )
    s = [sum(u[k] for u in units) for k in range(3)]
    closed = sum(a * a for a in s) - n
    assert abs(brute - closed) < 1e-7 * max(1, abs(closed))


@given(
    st.tuples(
        st.lists(st.integers(0, 20), min_size=1, max_size=25),
        st.lists(st.integers(0, 20), min_size=1, max_size=25),
        st.lists(st.integers(0, 20), min_size=1, max_size=25),
    )
)
@settings(max_examples=100, deadline=None)
def test_jonckheere_single_pass_identity(groups):
    """JT = Σ_v Σ_{i<j} c_j(v)·(B_i(v) + c_i(v)/2) — the one-pass form
    of q_jonckheere_terpstra — equals the pairwise U definition with
    half-credit ties."""
    g1, g2, g3 = groups
    ordered = [g1, g2, g3]
    brute = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            for a in ordered[i]:
                for b in ordered[j]:
                    brute += 1.0 if a < b else (0.5 if a == b else 0.0)
    vals = sorted(set(g1) | set(g2) | set(g3))
    c = {v: [g.count(v) for g in ordered] for v in vals}
    cum = [0, 0, 0]
    single = 0.0
    for v in vals:
        c1, c2, c3 = c[v]
        single += c2 * (cum[0] + c1 / 2)
        single += c3 * (cum[0] + c1 / 2)
        single += c3 * (cum[1] + c2 / 2)
        cum[0] += c1
        cum[1] += c2
        cum[2] += c3
    assert abs(brute - single) < 1e-9


@given(two_samples)
@settings(max_examples=150, deadline=None)
def test_brunner_munzel_mean_correction_identity(samples):
    """Σ c₁(R − R₁w) = n₁(m₁ − (n₁+1)/2) — the closed-form mean
    correction q_brunner_munzel applies to its variance terms —
    holds for every tie configuration."""
    x, y = samples
    su = sorted(x + y)
    sx = sorted(x)

    def mid(s, v):
        import bisect

        return (
            bisect.bisect_left(s, v) + bisect.bisect_right(s, v) + 1
        ) / 2

    n1 = len(x)
    lhs = sum(mid(su, v) - mid(sx, v) for v in x)
    m1 = sum(mid(su, v) for v in x) / n1
    rhs = n1 * (m1 - (n1 + 1) / 2)
    assert abs(lhs - rhs) < 1e-9


@given(
    st.tuples(
        st.sets(st.integers(0, 10_000), min_size=3, max_size=30),
        st.sets(st.integers(10_001, 20_000), min_size=3, max_size=30),
    )
)
@settings(max_examples=150, deadline=None)
def test_ad_ties_form_reduces_to_pettitt_continuous(samples):
    """with NO ties, the Scholz-Stephens distinct-value form shipped
    in q_anderson_darling_2sample equals Pettitt's continuous
    A² = (1/nm)Σᵢ (MᵢN − n·i)²/(i(N−i)) — the ties machinery must
    vanish exactly on tie-free data. (Disjoint integer ranges
    guarantee tie-freedom.)"""
    xs, ys = (sorted(samples[0]), sorted(samples[1]))
    import random

    pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    n1, n2 = len(xs), len(ys)
    nn = n1 + n2
    # Pettitt continuous: sum over pooled positions i = 1..N-1
    m = 0
    pett = 0.0
    for i, (v, which) in enumerate(pooled[:-1], start=1):
        if which == 0:
            m += 1
        pett += (m * nn - n1 * i) ** 2 / (i * (nn - i))
    pett /= n1 * n2
    # Scholz-Stephens eq. 3 (both samples' terms)
    ss = 0.0
    b = m1 = m2 = 0
    for v, which in pooled:
        b += 1
        if which == 0:
            m1 += 1
        else:
            m2 += 1
        if b < nn:
            ss += (
                1 / n1 * (nn * m1 - n1 * b) ** 2 / (nn * b * (nn - b))
            )
            ss += (
                1 / n2 * (nn * m2 - n2 * b) ** 2 / (nn * b * (nn - b))
            )
    assert abs(pett - ss) < 1e-9
