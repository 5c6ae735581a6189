"""Drift-robust regression gate (round-10 verdict item #2).

Pure-Python tests of ``mi_inbound_pulsar_spark.benchbase`` — the done
criteria from the verdict, verbatim:

- a deliberately "loaded session" (every measurement uniformly
  inflated) produces an EMPTY gate and a nonzero recorded drift
  factor;
- a real 1.5x single-query regression still flags, loaded session or
  not.

Plus the baseline properties: committed-round minimum (not
most-recent-wins), fluke trimming, and full-registry coverage via the
sweep ledgers.
"""

from __future__ import annotations

import json
from pathlib import Path

from mi_inbound_pulsar_spark.benchbase import (
    PROBES,
    committed_min_times,
    drift_factor,
    gate_regressions,
)

BASE = {q: 1.0 + 0.2 * i for i, q in enumerate(PROBES)}
BASE.update({"q_suspect": 2.0, "q_fine": 0.8})


def _probe_times(factor: float) -> dict[str, float]:
    return {q: round(t * factor, 3) for q, t in BASE.items() if q in PROBES}


def test_loaded_session_empty_gate_nonzero_drift():
    # everything 1.6x slower — pure session drift, no code change
    times = {q: round(t * 1.6, 3) for q, t in BASE.items()}
    drift = drift_factor(_probe_times(1.6), BASE)
    assert drift > 1.0  # nonzero recorded drift factor
    assert abs(drift - 1.6) < 0.05
    assert gate_regressions(times, BASE, drift) == []


def test_real_regression_flags_through_drift():
    # loaded session AND one genuinely 1.5x-slower query: the drift
    # normalization must not launder the real regression
    times = {q: round(t * 1.6, 3) for q, t in BASE.items()}
    times["q_suspect"] = round(BASE["q_suspect"] * 1.6 * 1.6, 3)  # extra 1.6x
    drift = drift_factor(_probe_times(1.6), BASE)
    flagged = gate_regressions(times, BASE, drift)
    assert len(flagged) == 1 and flagged[0].startswith("q_suspect:")


def test_clean_session_real_regression_flags():
    times = dict(BASE)
    times["q_suspect"] = BASE["q_suspect"] * 1.5 + 0.4  # past both floors
    drift = drift_factor(_probe_times(1.0), BASE)
    assert drift == 1.0
    flagged = gate_regressions(times, BASE, drift)
    assert [f.split(":")[0] for f in flagged] == ["q_suspect"]


def test_fast_session_does_not_loosen_gate():
    # drift clamps at 1.0: a faster-than-ever session must not divide
    # times DOWN and hide a regression
    drift = drift_factor(_probe_times(0.7), BASE)
    assert drift == 1.0


def test_subsecond_floor_absorbs_jitter():
    times = dict(BASE)
    times["q_fine"] = BASE["q_fine"] + 0.25  # +0.25 s on a 0.8 s query
    assert gate_regressions(times, BASE, 1.0) == []


def test_committed_min_times_takes_minimum_not_most_recent(tmp_path: Path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 2.0, "q_b": 3.0}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 2.5, "q_b": 2.8}}})
    )
    # a drifted final session must not ratchet the baseline upward
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"queries": {"q_a": 3.9, "q_b": 4.1}})
    )
    base = committed_min_times(tmp_path)
    assert base == {"q_a": 2.0, "q_b": 2.8}


def test_committed_min_folds_sweep_ledgers_full_registry(tmp_path: Path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 1.0}}})
    )
    (tmp_path / "VERIFY_FULL_r09_sf0.1.json").write_text(
        json.dumps(
            {
                "queries": {
                    "q_a": {"status": "pass", "sec": 0.8},
                    "q_sweep_only": {"status": "pass", "sec": 2.0},
                    "q_failed": {"status": "fail"},
                }
            }
        )
    )
    base = committed_min_times(tmp_path)
    assert base["q_a"] == 0.8  # sweep time can lower a headline min
    assert base["q_sweep_only"] == 2.0  # registry-wide coverage
    assert "q_failed" not in base


def test_fluke_trimming(tmp_path: Path):
    # q_triangle_count shape: one lucky 1.4 s among 2.7-7.0 s must not
    # anchor the baseline (min < 0.6 * median -> second-lowest wins)
    recs = {
        f"VERIFY_FULL_r{i:02d}_sf0.1.json": s
        for i, s in enumerate([3.6, 3.6, 4.2, 1.4, 4.4, 7.0, 2.7], start=4)
    }
    for fname, sec in recs.items():
        (tmp_path / fname).write_text(
            json.dumps({"queries": {"q_t": {"status": "pass", "sec": sec}}})
        )
    assert committed_min_times(tmp_path)["q_t"] == 2.7
    # a genuine optimization converges: once a SECOND fast measurement
    # lands, the second-lowest is fast too and the baseline follows
    two = tmp_path / "two"
    two.mkdir()
    for i, sec in enumerate([3.6, 3.6, 1.4, 1.5], start=1):
        (two / f"VERIFY_FULL_r{i:02d}_sf0.1.json").write_text(
            json.dumps({"queries": {"q_t": {"status": "pass", "sec": sec}}})
        )
    assert committed_min_times(two)["q_t"] == 1.5


def test_drift_factor_is_median_not_mean():
    # one probe with an anomalously low committed baseline (the
    # trimmed-min guard can still leave outliers) must not drag the
    # whole factor; median over 10 probes shrugs off one bad ratio
    base = dict(BASE)
    probes = _probe_times(1.0)
    base[PROBES[0]] = base[PROBES[0]] / 3  # ratio 3.0 for one probe
    assert drift_factor(probes, base) == 1.0


def test_drift_factor_degrades_to_one_without_probes():
    assert drift_factor({}, BASE) == 1.0
    assert drift_factor(_probe_times(1.2), {}) == 1.0


def test_sources_split_keeps_methodologies_apart(tmp_path: Path):
    # bench min-of-2 count() vs sweep single-pass toArrow measure
    # different things for wide-output queries — each gate must
    # baseline against its own ledger family
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q_wide": 0.35}}})
    )
    (tmp_path / "VERIFY_FULL_r01_sf0.1.json").write_text(
        json.dumps({"queries": {"q_wide": {"status": "pass", "sec": 5.3}}})
    )
    assert committed_min_times(tmp_path, sources="bench") == {"q_wide": 0.35}
    assert committed_min_times(tmp_path, sources="sweep") == {"q_wide": 5.3}
    assert committed_min_times(tmp_path, sources="all") == {"q_wide": 0.35}


# -- probe freshness (round-12 verdict item #5) ---------------------------


def test_probe_freeze_matches_current_sources():
    """Every probe's transitive source closure must digest to the
    committed PROBE_FREEZE.json value — a probe whose kernel changed
    this round fails here and must be rotated out (and the freeze
    regenerated via tools/gen_probe_freeze.py) in the same commit."""
    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.benchbase import probe_source_digest

    freeze = json.loads(
        (Path(__file__).resolve().parent.parent / "PROBE_FREEZE.json").read_text()
    )
    assert set(freeze) == set(PROBES)
    qs = e.queries()
    stale = {
        q: (probe_source_digest(qs[q]), freeze[q])
        for q in PROBES
        if probe_source_digest(qs[q]) != freeze[q]
    }
    assert not stale, f"probe kernels changed since freeze: {sorted(stale)}"


def test_probe_closure_is_transitive():
    """The closure must reach helper kernels through multiple hops —
    the exact blind spot that let the round-12 jaccard_pairs pin skew
    q_triangle_count's probe ratio: the triangle query's own text never
    changed, only a helper two imports deep."""
    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.benchbase import probe_source_closure

    closure = probe_source_closure(e.queries()["q_triangle_count"])
    quals = set(closure)
    assert "mi_inbound_pulsar_spark.operators.graph.q_triangle_count" in quals
    # two helper hops: q_triangle_count -> _neardup_edges ->
    # jaccard_pairs_auto -> jaccard_pairs
    assert "mi_inbound_pulsar_spark.operators.dedup.jaccard_pairs" in quals
