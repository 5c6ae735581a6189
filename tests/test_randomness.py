"""Pure-Python third opinions for the randomness diagnostics: replays
from the parquet files with explicit sequential loops over the daily
series (vs the production queries' window algebra).
"""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
US_PER_DAY = 86_400_000_000


def _daily_series() -> list[int]:
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
    return [c for _, c in sorted(out.items())]


def _row(df) -> dict:
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_runs_test_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_runs_test

    got = _row(q_runs_test(spark, SF))
    xs = _daily_series()
    med = statistics.median(xs)
    signs = [x > med for x in xs if x != med]
    n = len(signs)
    n1 = sum(signs)
    n2 = n - n1
    runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    mean = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert got["n"] == n and got["n1"] == n1 and got["n2"] == n2
    assert got["runs"] == runs
    assert got["mean_runs"] == round(mean, 6)
    assert got["z"] == round((runs - mean) / math.sqrt(var), 6)


def test_turning_points_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_turning_points

    got = _row(q_turning_points(spark, SF))
    xs = _daily_series()
    n = len(xs)
    tp = sum(
        (xs[i - 1] < xs[i] > xs[i + 1]) or (xs[i - 1] > xs[i] < xs[i + 1])
        for i in range(1, n - 1)
    )
    exp = 2 * (n - 2) / 3
    assert got["n"] == n and got["turning_points"] == tp
    assert got["expected_tp"] == round(exp, 6)
    assert got["z"] == round((tp - exp) / math.sqrt((16 * n - 29) / 90), 6)


def test_von_neumann_matches_python(spark):
    from mi_inbound_pulsar_spark.operators.tsstats import q_von_neumann_ratio

    got = _row(q_von_neumann_ratio(spark, SF))
    xs = [c / 100 for c in _daily_series()]
    n = len(xs)
    ssd = sum((a - b) ** 2 for a, b in zip(xs[1:], xs))
    mean = sum(xs) / n
    css = sum((x - mean) ** 2 for x in xs)
    mssd = ssd / (n - 1)
    vn = mssd / (css / n)
    assert got["n"] == n
    assert got["mssd"] == round(mssd, 6)
    assert got["vn_half"] == round(vn / 2, 6)
    assert got["z"] == round(
        (vn - 2) / math.sqrt(4 * (n - 2) / (n * n - 1)), 6
    )
