"""Pure-Python second-scale replays for the NINE round-11 rotation
overflow queries (round-10 verdict item #8): the driver's 50-query
window covers 50 of the 59 never-driver-checked names; these are the
other 9 (slots 51-59 of the rotation, q_tukey_hsd .. q_dunn_index).
Each gets an independent from-the-parquet replay at TWO scale factors
so nothing ships driver-unchecked AND replay-unchecked.

Replays recompute the statistic from pyarrow reads with textbook
formulas (no Spark, no SQL), then compare against the engine's 6dp-
rounded output with a 2e-6 absolute tolerance (one ulp of the rounding
grid on either side — Python's sequential float summation can land on
the opposite side of a .xxxxxx5 boundary from Spark's tree reduction).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def _close(a, b, tol=2e-6):
    assert a is not None and b is not None
    assert abs(a - b) <= tol, f"{a} vs {b}"


# -- customer segment moments (tukey / games-howell) -----------------------


def _segments(sf):
    t = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )
    groups: dict[str, list[float]] = defaultdict(list)
    for seg, bal in zip(
        t["c_mktsegment"].to_pylist(), t["c_acctbal"].to_pylist()
    ):
        groups[seg].append(bal)
    out = {}
    for seg, xs in groups.items():
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        out[seg] = (n, m, v)
    return out


@pytest.mark.parametrize("sf", SFS)
def test_tukey_hsd_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.posthoc import q_tukey_hsd

    got = _rows(q_tukey_hsd(spark, sf))
    g = _segments(sf)
    mse = sum((n - 1) * v for n, _, v in g.values()) / sum(
        n - 1 for n, _, _ in g.values()
    )
    df_w = sum(n for n, _, _ in g.values()) - len(g)
    segs = sorted(g)
    exp = {}
    for i, a in enumerate(segs):
        for b in segs[i + 1 :]:
            (na, ma, _), (nb, mb, _) = g[a], g[b]
            exp[(a, b)] = (
                na,
                nb,
                ma - mb,
                (ma - mb) / math.sqrt(mse / 2 * (1 / na + 1 / nb)),
            )
    assert len(got) == len(exp)
    for r in got:
        na, nb, diff, q = exp[(r["seg_a"], r["seg_b"])]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["df_within"] == df_w
        _close(r["mean_diff"], diff)
        _close(r["q_stat"], q)


@pytest.mark.parametrize("sf", SFS)
def test_games_howell_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.posthoc import q_games_howell

    got = _rows(q_games_howell(spark, sf))
    g = _segments(sf)
    segs = sorted(g)
    assert len(got) == len(segs) * (len(segs) - 1) // 2
    for r in got:
        (na, ma, va), (nb, mb, vb) = g[r["seg_a"]], g[r["seg_b"]]
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        dfw = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        _close(r["mean_diff"], ma - mb)
        _close(r["t_stat"], t)
        _close(r["q_stat"], t * math.sqrt(2.0))
        _close(r["df_welch"], dfw, tol=5e-6)  # df ~ O(10^3): 6dp + float


# -- Jonckheere-Terpstra ----------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_jonckheere_terpstra_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.posthoc import (
        q_jonckheere_terpstra,
    )

    got = _rows(q_jonckheere_terpstra(spark, sf))[0]
    t = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    gmap = {"1-URGENT": 0, "3-MEDIUM": 1, "5-LOW": 2}
    counts: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for pri, price in zip(
        t["o_orderpriority"].to_pylist(), t["o_totalprice"].to_pylist()
    ):
        if pri in gmap:
            counts[int(round(price * 100))][gmap[pri]] += 1
    u = 0.0
    b1 = b2 = 0
    t2 = t3 = t25 = 0.0
    n = [0, 0, 0]
    for v in sorted(counts):
        c1, c2, c3 = counts[v]
        u += c2 * (b1 + c1 / 2.0) + c3 * (b1 + c1 / 2.0) + c3 * (b2 + c2 / 2.0)
        b1 += c1
        b2 += c2
        ct = float(c1 + c2 + c3)
        t2 += ct * (ct - 1)
        t3 += ct * (ct - 1) * (ct - 2)
        t25 += ct * (ct - 1) * (2 * ct + 5)
        n[0] += c1
        n[1] += c2
        n[2] += c3
    nn = float(sum(n))
    sq = sum(x * x for x in n)
    g2 = sum(float(x) * (x - 1) for x in n)
    g3 = sum(float(x) * (x - 1) * (x - 2) for x in n)
    g25 = sum(float(x) * (x - 1) * (2 * x + 5) for x in n)
    mean = (nn * nn - sq) / 4.0
    var = (
        (nn * (nn - 1) * (2 * nn + 5) - g25 - t25) / 72
        + g3 * t3 / (36 * nn * (nn - 1) * (nn - 2))
        + g2 * t2 / (8 * nn * (nn - 1))
    )
    assert (got["n_urgent"], got["n_medium"], got["n_low"]) == tuple(n)
    _close(got["jt_stat"], u)
    _close(got["jt_mean"], mean)
    _close(got["z"], (u - mean) / math.sqrt(var))


# -- blocked day x event-type ranks (friedman / page / quade) ---------------


def _day_blocks(sf):
    """{day: {etype: cents}} restricted to complete 5-type blocks."""
    t = pq.read_table(
        f"{sf}/events.parquet", columns=["ts", "event_type", "value"]
    )
    us = t["ts"].cast("int64").to_pylist()  # epoch micros (UTC instants)
    cents: dict[tuple[int, str], int] = defaultdict(int)
    for u, et, val in zip(us, t["event_type"].to_pylist(), t["value"].to_pylist()):
        cents[(u // 86_400_000_000, et)] += int(round(val * 100))
    days: dict[int, dict[str, int]] = defaultdict(dict)
    for (d, et), c in cents.items():
        days[d][et] = c
    return {d: m for d, m in days.items() if len(m) == 5}


def _midranks(values: dict[str, int]) -> dict[str, float]:
    """midrank of each key's value, ascending, ties averaged."""
    svals = sorted(values.values())
    out = {}
    for k, v in values.items():
        lo = sum(1 for x in svals if x < v)
        t = sum(1 for x in svals if x == v)
        out[k] = (lo + 1) + (t - 1) / 2.0
    return out


@pytest.mark.parametrize("sf", SFS)
def test_friedman_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.posthoc import q_friedman_test

    got = _rows(q_friedman_test(spark, sf))[0]
    blocks = _day_blocks(sf)
    nb, k = len(blocks), 5
    r_j: dict[str, float] = defaultdict(float)
    tsum = 0.0
    for vals in blocks.values():
        for et, r in _midranks(vals).items():
            r_j[et] += r
        seen = defaultdict(int)
        for v in vals.values():
            seen[v] += 1
        tsum += sum(t**3 - t for t in seen.values() if t > 1)
    q_raw = 12.0 / (nb * k * (k + 1)) * sum(
        v * v for v in r_j.values()
    ) - 3.0 * nb * (k + 1)
    corr = 1 - tsum / (float(nb) * k * (k * k - 1))
    assert got["n_blocks"] == nb and got["n_treatments"] == k
    _close(got["friedman_q"], q_raw / corr, tol=5e-6)


@pytest.mark.parametrize("sf", SFS)
def test_page_trend_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.posthoc import q_page_trend_test

    got = _rows(q_page_trend_test(spark, sf))[0]
    blocks = _day_blocks(sf)
    nb, k = len(blocks), 5
    r_j: dict[str, float] = defaultdict(float)
    for vals in blocks.values():
        for et, r in _midranks(vals).items():
            r_j[et] += r
    ll = sum(
        (j + 1) * r_j[et] for j, et in enumerate(sorted(r_j))
    )
    mean = nb * k * (k + 1) ** 2 / 4.0
    var = nb * k * k * (k + 1) * (k * k - 1) / 144.0
    assert got["n_blocks"] == nb and got["n_treatments"] == k
    _close(got["page_l"], ll)
    _close(got["l_mean"], mean)
    _close(got["z"], (ll - mean) / math.sqrt(var))


@pytest.mark.parametrize("sf", SFS)
def test_quade_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.posthoc import q_quade_test

    got = _rows(q_quade_test(spark, sf))[0]
    blocks = _day_blocks(sf)
    nb, k = len(blocks), 5
    ranges = {d: max(v.values()) - min(v.values()) for d, v in blocks.items()}
    q_of_day = _midranks(ranges)
    s_j: dict[str, float] = defaultdict(float)
    a_tot = 0.0
    for d, vals in blocks.items():
        for et, r in _midranks(vals).items():
            s = q_of_day[d] * (r - 3.0)
            s_j[et] += s
            a_tot += s * s
    b_tot = sum(v * v for v in s_j.values()) / nb
    assert got["n_blocks"] == nb and got["n_treatments"] == k
    _close(got["a_total"], a_tot, tol=5e-6)
    _close(got["b_total"], b_tot, tol=5e-6)
    _close(got["quade_f"], (nb - 1) * b_tot / (a_tot - b_tot), tol=5e-6)


# -- clustering-validity indices over the labeled embeddings ----------------


def _emb(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
    pts: dict[int, list[list[float]]] = defaultdict(list)
    for lab, emb in zip(t["label"].to_pylist(), t["embedding"].to_pylist()):
        pts[lab].append([float(x) for x in emb])
    cents = {
        lab: [sum(v[d] for v in vs) / len(vs) for d in range(len(vs[0]))]
        for lab, vs in pts.items()
    }
    return pts, cents


def _d2(x, y):
    return sum((a - b) ** 2 for a, b in zip(x, y))


@pytest.mark.parametrize("sf", SFS)
def test_calinski_harabasz_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.clusterval import (
        q_calinski_harabasz,
    )

    got = _rows(q_calinski_harabasz(spark, sf))[0]
    pts, cents = _emb(sf)
    n = sum(len(v) for v in pts.values())
    k = len(pts)
    dim = len(next(iter(cents.values())))
    g = [
        sum(v[d] for vs in pts.values() for v in vs) / n for d in range(dim)
    ]
    ssb = sum(len(pts[lab]) * _d2(cents[lab], g) for lab in pts)
    ssw = sum(_d2(v, cents[lab]) for lab, vs in pts.items() for v in vs)
    assert got["n_points"] == n and got["n_clusters"] == k
    _close(got["ss_between"], ssb, tol=5e-5)  # O(10^3) magnitudes
    _close(got["ss_within"], ssw, tol=5e-5)
    _close(got["ch_index"], (ssb / (k - 1)) / (ssw / (n - k)), tol=5e-6)


@pytest.mark.parametrize("sf", SFS)
def test_davies_bouldin_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.clusterval import q_davies_bouldin

    got = _rows(q_davies_bouldin(spark, sf))[0]
    pts, cents = _emb(sf)
    scat = {
        lab: sum(math.sqrt(_d2(v, cents[lab])) for v in vs) / len(vs)
        for lab, vs in pts.items()
    }
    worst: dict[int, float] = defaultdict(float)
    labs = sorted(cents)
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            r = (scat[a] + scat[b]) / math.sqrt(_d2(cents[a], cents[b]))
            worst[a] = max(worst[a], r)
            worst[b] = max(worst[b], r)
    assert got["n_clusters"] == len(labs)
    _close(got["db_index"], sum(worst.values()) / len(labs), tol=5e-6)
    _close(got["worst_pair_ratio"], max(worst.values()), tol=5e-6)


@pytest.mark.parametrize("sf", SFS)
def test_dunn_index_replay(spark, sf):
    from mi_inbound_pulsar_spark.operators.clusterval import q_dunn_index

    got = _rows(q_dunn_index(spark, sf))[0]
    pts, cents = _emb(sf)
    labs = sorted(cents)
    min_sep = min(
        math.sqrt(_d2(cents[a], cents[b]))
        for i, a in enumerate(labs)
        for b in labs[i + 1 :]
    )
    max_diam = max(
        2 * max(math.sqrt(_d2(v, cents[lab])) for v in vs)
        for lab, vs in pts.items()
    )
    assert got["n_clusters"] == len(labs)
    _close(got["min_separation"], min_sep, tol=5e-6)
    _close(got["max_diameter"], max_diam, tol=5e-6)
    _close(got["dunn_index"], min_sep / max_diam, tol=5e-6)
