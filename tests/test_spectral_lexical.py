"""Pure-Python third opinions for batch 7: spectral entropy and PACF
replayed with explicit per-frequency / Durbin-Levinson RECURSION loops
(production uses grouped DFT aggregates and the closed form), and the
lexical panel from a Counter.
"""

from __future__ import annotations

import cmath
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _daily_series() -> list[float]:
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    out: dict[int, int] = defaultdict(int)
    for ts, et, v in zip(
        (x.value for x in t["ts"]),
        t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if et == "purchase":
            out[ts // US_PER_DAY] += int(round(v * 100))
    return [c / 100 for _, c in sorted(out.items())]


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_spectral_entropy_matches_complex_dft(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_spectral_entropy

    got = _row(q_spectral_entropy(spark, SF))
    xs = _daily_series()
    n = len(xs)
    mu = sum(xs) / n
    xc = [x - mu for x in xs]
    powers = []
    for k in range(1, n // 2 + 1):
        z = sum(
            x * cmath.exp(-2j * math.pi * t * k / n) for t, x in enumerate(xc)
        )
        powers.append(abs(z) ** 2)
    tot = sum(powers)
    ps = [p / tot for p in powers]
    h = -sum(p * math.log(p) for p in ps if p > 0)
    assert got["n_freqs"] == len(ps)
    assert abs(got["h_spectral"] - h) < 1e-6
    assert abs(got["h_normalized"] - h / math.log(len(ps))) < 1e-6
    assert abs(got["max_share"] - max(ps)) < 1e-6


def test_pacf_matches_durbin_levinson_recursion(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import (
        q_pacf_durbin_levinson,
    )

    rows = {r["lag"]: r.asDict() for r in q_pacf_durbin_levinson(spark, SF).collect()}
    xs = _daily_series()
    n = len(xs)
    mu = sum(xs) / n
    c0 = sum((x - mu) ** 2 for x in xs)
    rho = [1.0] + [
        sum((xs[t] - mu) * (xs[t - k] - mu) for t in range(k, n)) / c0
        for k in (1, 2, 3)
    ]
    # general Durbin-Levinson recursion (production hard-codes level 3)
    phi = {1: {1: rho[1]}}
    for k in (2, 3):
        num = rho[k] - sum(phi[k - 1][j] * rho[k - j] for j in range(1, k))
        den = 1 - sum(phi[k - 1][j] * rho[j] for j in range(1, k))
        phi[k] = {k: num / den}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - phi[k][k] * phi[k - 1][k - j]
    for k in (1, 2, 3):
        assert rows[k]["acf"] == round(rho[k], 6)
        assert abs(rows[k]["pacf"] - phi[k][k]) < 1e-6


def test_lexical_richness_matches_counter(spark):
    from mi_inbound_pulsar_spark.operators.text import q_lexical_richness

    got = _row(q_lexical_richness(spark, SF))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    freq = Counter(
        w for txt in t["text"].to_pylist() for w in txt.split(" ") if w
    )
    n = sum(freq.values())
    v = len(freq)
    counts = Counter(freq.values())
    sum_c2 = sum(c * c for c in freq.values())
    assert got["n_tokens"] == n and got["vocab"] == v
    assert got["hapax"] == counts[1] and got["dis_legomena"] == counts[2]
    assert got["yule_k"] == round(1e4 * (sum_c2 - n) / (n * n), 6)
    assert got["herdan_c"] == round(math.log(v) / math.log(n), 6)
    assert got["guiraud_r"] == round(v / math.sqrt(n), 6)
    assert got["simpson_d"] == round(
        sum(c * (c - 1) for c in freq.values()) / (n * (n - 1)), 6
    )
    assert got["sichel_s"] == round(counts[2] / v, 6)
