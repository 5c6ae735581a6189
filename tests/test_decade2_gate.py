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


def _committed_min() -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}
    for path in sorted(ROOT.glob("SCALE_DECADE2_r*.json")):
        for row in json.loads(path.read_text()).get("rows", []):
            cur = out.setdefault(row["query"], {})
            for sf in ("sf0.1", "sf1.0"):
                v = row.get(sf)
                if v is not None and (sf not in cur or v < cur[sf]):
                    cur[sf] = v
    return out


def test_no_superlinear_kernel_in_second_decade():
    data = _committed_min()
    assert len(data) >= 17, "second-decade artifact set looks truncated"
    flagged = []
    for q, t in data.items():
        small, big = t.get("sf0.1"), t.get("sf1.0")
        if not small or not big or big < MIN_BIG_SEC:
            continue
        e2 = math.log10(big / small)
        if e2 > E2_MAX and q not in WAIVERS:
            flagged.append(f"{q}: {small}s -> {big}s e2={e2:.2f}")
    assert not flagged, (
        "super-linear second-decade kernels (committed minima):\n  "
        + "\n  ".join(flagged)
    )
