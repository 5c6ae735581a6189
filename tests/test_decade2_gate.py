"""CI gate over the committed SECOND-decade artifacts
(``SCALE_DECADE2_r*.json``, sf0.1 → sf1.0): no kernel with meaningful
sf1.0 wall time may grow super-linearly across the measured decade.

Same committed-min philosophy as the tri-scale gate
(tests/test_scaling_gate.py): per-kernel MINIMA across every committed
round artifact, because wall times only drift UP under session load —
a kernel flags only if super-linear in its best committed showing.
This is the gate that formalizes round-11 verdict item #5: the wide
second decade caught six kernels the tri-scale exponents (which stop
at sf0.1) could not see — the Σdf² pre-cap quadratic family at 3.4 s
→ 157-202 s and the O(n²/day) interval pair join — all fixed and
re-measured in round 12 (SCALE.md).

No Spark session needed: reads committed JSON only.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: flag threshold: e2 > 1.2 with min sf1.0 wall >= 5 s (the
#: scale_decade2 reporting convention)
E2_MAX = 1.2
MIN_BIG_SEC = 5.0

#: kernels with a committed adjudication in SCALE.md may be waived
#: here (currently none — every round-12 flag was fixed, not waived)
WAIVERS: dict[str, str] = {}


def _committed_best() -> dict[str, dict[str, float]]:
    """Per kernel: the best (lowest) WITHIN-ARTIFACT exponent across
    every committed round, plus the per-axis minima for the absolute
    threshold. The exponent is computed within one artifact because
    both of its points share one session — the ratio is drift-free by
    construction (the scale_decade2 design) — whereas mixing the min
    sf0.1 from one session with the min sf1.0 from another re-imports
    exactly the cross-session drift the tool exists to cancel (and,
    for strategy-switching kernels like q_cluster_keeper, compares two
    different physical plans' fast sessions against each other)."""
    out: dict[str, dict[str, float]] = {}
    for path in sorted(ROOT.glob("SCALE_DECADE2_r*.json")):
        for row in json.loads(path.read_text()).get("rows", []):
            small, big = row.get("sf0.1"), row.get("sf1.0")
            if not small or not big:
                continue
            e2 = math.log10(big / small)
            cur = out.setdefault(
                row["query"], {"e2": e2, "sf0.1": small, "sf1.0": big}
            )
            cur["e2"] = min(cur["e2"], e2)
            cur["sf0.1"] = min(cur["sf0.1"], small)
            cur["sf1.0"] = min(cur["sf1.0"], big)
    return out


def test_no_superlinear_kernel_in_second_decade():
    data = _committed_best()
    assert len(data) >= 17, "second-decade artifact set looks truncated"
    flagged = []
    for q, t in data.items():
        if t["sf1.0"] < MIN_BIG_SEC:
            continue
        if t["e2"] > E2_MAX and q not in WAIVERS:
            flagged.append(
                f"{q}: {t['sf0.1']}s -> {t['sf1.0']}s best e2={t['e2']:.2f}"
            )
    assert not flagged, (
        "super-linear second-decade kernels (best committed same-session"
        " exponent):\n  " + "\n  ".join(flagged)
    )
