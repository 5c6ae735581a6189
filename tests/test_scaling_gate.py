"""CI gate over the committed tri-scale scaling artifacts: no query
with meaningful sf0.1 wall time may grow super-linearly over the
measured decade (sf0.01 → sf0.1).

This is the check that would have caught the round-10 finding four
rounds earlier: q_knn_graph_components sat at a last-decade exponent
of ~1.5 (4 s → 100-131 s) in every committed sweep from round 6
onward, invisible to the static plan audit (clean plan shape), to
bench (not in HEADLINE), and to correctness (oracle-green throughout).
The cause was Catalyst's BigInt stats arithmetic compounding through
iterative localCheckpoints — see SCALE.md round 10 and
plans/iterate.py.

No Spark session needed: the test reads the committed JSON artifacts,
so it's effectively free and runs in every pytest sweep.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import scaling_fit


def test_no_superlinear_kernel_in_committed_artifacts():
    # Per-round MINIMA across every committed tri-scale artifact set,
    # not the latest capture: sweep times only drift UP under session
    # load, so the minimum is the closest committed estimate of each
    # plan's true cost and one loaded end-of-round capture can never
    # redden the tree (round-11 verdict item #1 — the r11 sf0.1
    # artifact carried a 39.7 s one-shot spike on a 1.4 s kernel).
    # A kernel flags only if it is super-linear in its BEST committed
    # showing, i.e. by design rather than by measurement accident.
    data = scaling_fit.load_min()
    assert len(data) >= 500, "artifact set looks truncated"
    flagged = []
    for q, times in data.items():
        e = scaling_fit.exponent(times)
        if (
            e is not None
            and e > scaling_fit.FLAG_EXPONENT
            and times.get("sf0.1", 0) >= scaling_fit.MIN_SEC_TO_FLAG
        ):
            flagged.append((q, round(e, 2), times))
    assert not flagged, (
        f"super-linear kernels in committed-min artifacts "
        f"(adjudicate with an interleaved A/B, then fix or waive with "
        f"a SCALE.md rationale): {flagged}"
    )
