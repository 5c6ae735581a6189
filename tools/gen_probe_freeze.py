"""Regenerate ``PROBE_FREEZE.json``: the committed sha256 of every
bench probe's transitive repo-local source closure (see
``benchbase.probe_source_digest``). Run this ONLY when deliberately
rotating the probe set — the pytest gate (tests/test_bench_gate.py)
fails whenever a probe's closure drifts from this freeze, which is the
point: a probe whose kernel changed mid-round must be swapped out, not
silently re-frozen.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.benchbase import PROBES, probe_source_digest

    qs = e.queries()
    freeze = {q: probe_source_digest(qs[q]) for q in PROBES}
    out = Path(__file__).resolve().parent.parent / "PROBE_FREEZE.json"
    out.write_text(json.dumps(freeze, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(freeze)} probes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
