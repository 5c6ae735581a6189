"""Degeneracy gate (round-10 verdict item #4): the DuckDB-only
all-zero-statistic scan, promoted from an adjudication tool to a
committed pytest with a STRUCTURED waiver table.

Background: value-hash parity proves the two engines AGREE; it cannot
prove the statistic DISCRIMINATES. Round 10 found two oracle-green
operators whose decision logic was dead code on this data
(``q_max_drawdown`` — drawdown of a monotone curve is identically 0;
``q_watermark_calibration`` — a monotone arrival proxy zeroes every
disorder metric) plus six quality filters with unreachable absolute
cuts. All were redefined/recalibrated; this gate keeps the class dead:
any NEW single-row oracle whose every non-count numeric column is
exactly 0/NULL fails the suite unless it carries an adjudicated waiver
below.

DuckDB-only (no Spark session): runs all ~503 oracles at sf0.01 in
roughly a minute.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.01"

# Adjudicated waivers: query name -> why an all-zero row is the
# statistically CORRECT output on this data (round-10 adjudication,
# previously prose in tools/degeneracy_audit.py). Adding a name here
# requires the same bar: a docstring rationale on the operator and,
# where the zeroed logic is non-trivial, a pytest replay that pins the
# live path on synthetic data.
WAIVERS: dict[str, str] = {
    "q_density_clusters": (
        "cluster label and exemplar_vec_id are identifiers, not "
        "magnitudes — id 0 is a legitimate value; n_members (253 at "
        "sf0.01) shows the clustering logic is live"
    ),
    "q_benjamini_hochberg": (
        "a step-up FDR procedure on no-effect null data rejecting "
        "nothing is the correct outcome; the step-up logic is pinned "
        "by the pure-Python replay tests"
    ),
    "q_benjamini_yekutieli": (
        "same null-data rationale as q_benjamini_hochberg, with the "
        "harmonic-sum correction pinned by replay"
    ),
    "q_sequential_obrien_fleming": (
        "an O'Brien-Fleming boundary on null data never crossing is "
        "the correct outcome; boundary math pinned by replay"
    ),
    "q_lexical_richness": (
        "the synthetic corpus has a closed 31-token vocabulary, so "
        "global hapax legomena cannot exist at any scale factor; "
        "per-bucket hapax in q_hapax_ratio exercise the same logic"
    ),
}


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "degeneracy_audit", ROOT / "tools" / "degeneracy_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("degeneracy_audit", mod)
    spec.loader.exec_module(mod)
    return mod


def test_no_new_degenerate_statistics():
    tool = _load_tool()
    flagged, errors = tool.scan(SF_DIR)
    assert not errors, f"oracle errors during scan: {errors}"
    fresh = [(n, row) for n, row in flagged if n not in WAIVERS]
    assert not fresh, (
        "new all-zero single-row statistics (dead decision logic on "
        "this data?) — redefine the operator so its logic fires, or "
        f"add an adjudicated waiver with rationale: {fresh}"
    )


def test_waivers_not_stale():
    """Every waiver must name a registered oracle; a redefined/renamed
    operator should drop its waiver rather than leave it shadowing a
    future regression."""
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    stale = [n for n in WAIVERS if n not in oracles]
    assert not stale, f"waivers for unregistered oracles: {stale}"
