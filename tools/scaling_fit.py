"""Empirical scaling exponents from the tri-scale sweep artifacts.

The static plan audit proves the PLAN has no scale anti-pattern
(cartesian products, unguarded global windows, row-UDFs); this tool
measures what the plan actually DOES as data grows: for each query it
takes the per-query wall times the tri-scale sweep already records
(``VERIFY_FULL_r{NN}_sf{0.001,0.01,0.1}.json``) and reports the
**last-decade exponent** e = log10(t(sf0.1) / t(sf0.01)).

Why the last decade and not a 3-point log-log fit: every query carries
a fixed Spark job-scheduling overhead (~0.2-0.5 s) that dominates at
sf0.001 and flattens any fit through it. Overhead biases the measured
exponent DOWN, so a last-decade exponent **above** the flag threshold
is a genuine super-linear signal, never an overhead artifact — the
conservative direction for a warning light. Sub-second queries at
sf0.1 are excluded from flagging entirely (timer jitter in a shared
session is the same order as the measurement; see SCALE.md's round-8
adjudication note).

Usage:
    python tools/scaling_fit.py [round_number] [--all]

Prints the flagship table (markdown, ready for SCALE.md) and any
flagged query with e > FLAG_EXPONENT among queries with
t(sf0.1) >= MIN_SEC_TO_FLAG.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

SFS = ["sf0.001", "sf0.01", "sf0.1"]

#: ideal is ~1.0 (linear in rows); >1.2 over the last decade means a
#: 100x scale-up costs >100^1.2 = 250x — the warning light.
FLAG_EXPONENT = 1.2
#: below this, sf0.1 wall time is mostly scheduling overhead + jitter.
MIN_SEC_TO_FLAG = 1.5

#: the kernels whose 100 TB story SCALE.md argues in prose — the table
#: pins numbers on those arguments.
FLAGSHIPS = [
    "q_semdedup",
    "q_substring_dedup",
    "q_minhash_lsh_neardup",
    "q_prefix_filter_jaccard",
    "q_containment_neardup",
    "q_line_dedup",
    "q_dsir_selection",
    "q_doremi_reweight",
    "q_ann_ivf_topk",
    "q_knn_graph_components",
    "q_kcore_peel",
    "q_landmark_harmonic",
    "q_link_prediction_panel",
    "q_matrix_profile_topk",
    "q_bpe_merge_loop",
    "q_streaming_composed_replay",
    "q_tfidf_cosine_neardup",
]


def load(round_no: int) -> dict[str, dict[str, float]]:
    """{query: {sf_label: sec}} from the three artifacts."""
    out: dict[str, dict[str, float]] = {}
    for sf in SFS:
        p = ROOT / f"VERIFY_FULL_r{round_no:02d}_{sf}.json"
        data = json.loads(p.read_text())
        for q, rec in data["queries"].items():
            out.setdefault(q, {})[sf] = float(rec["sec"])
    return out


def load_min() -> dict[str, dict[str, float]]:
    """{query: {sf_label: min sec across EVERY committed round}}.

    The round-11 lesson (VERDICT r11 item #1): a single sweep capture
    in a loaded session carried one-shot scheduler/GC spikes (39.7 s
    for a kernel whose committed minimum is 1.4 s), and a gate that
    fits exponents on the LATEST artifact fails open on poisoned
    evidence. Sweep times only ever drift UP under load, so the
    per-round minimum is the closest committed estimate of the plan's
    true cost — the same committed-min philosophy ``benchbase.py``
    uses for the regression gate, applied to the scaling gate's own
    input. One loaded capture can never redden (or green) the tree;
    only a kernel that is slow in EVERY committed round flags.
    """
    out: dict[str, dict[str, float]] = {}
    for rn in all_rounds():
        for q, times in load(rn).items():
            slot = out.setdefault(q, {})
            for sf, sec in times.items():
                if sec > 0 and (sf not in slot or sec < slot[sf]):
                    slot[sf] = sec
    return out


def all_rounds() -> list[int]:
    """Every N with a complete VERIFY_FULL_rNN tri-scale artifact set."""
    import re

    rounds: set[int] = set()
    for p in ROOT.glob("VERIFY_FULL_r*_sf0.1.json"):
        m = re.fullmatch(r"VERIFY_FULL_r(\d+)_sf0\.1\.json", p.name)
        if m and all(
            (ROOT / f"VERIFY_FULL_r{int(m.group(1)):02d}_{sf}.json").exists()
            for sf in SFS
        ):
            rounds.add(int(m.group(1)))
    return sorted(rounds)


def exponent(times: dict[str, float]) -> float | None:
    """log10(t(0.1)/t(0.01)) — the last-decade growth exponent."""
    t1, t2 = times.get("sf0.01"), times.get("sf0.1")
    if not t1 or not t2 or t1 <= 0 or t2 <= 0:
        return None
    return math.log10(t2 / t1)


def latest_round() -> int:
    """Highest N with a complete VERIFY_FULL_rNN tri-scale artifact set."""
    rounds = all_rounds()
    if not rounds:
        raise SystemExit("no complete VERIFY_FULL_rNN tri-scale artifact set")
    return max(rounds)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    show_all = "--all" in sys.argv
    if "--min" in sys.argv:
        data = load_min()  # the gate's view: per-round minima
    else:
        round_no = int(args[0]) if args else latest_round()
        data = load(round_no)

    rows = []
    for q in FLAGSHIPS if not show_all else sorted(data):
        times = data.get(q)
        if not times:
            continue
        e = exponent(times)
        rows.append((q, times, e))

    print(f"| query | sf0.001 s | sf0.01 s | sf0.1 s | last-decade e |")
    print(f"|---|---|---|---|---|")
    for q, t, e in rows:
        print(
            f"| `{q}` | {t.get('sf0.001', float('nan')):.1f} "
            f"| {t.get('sf0.01', float('nan')):.1f} "
            f"| {t.get('sf0.1', float('nan')):.1f} "
            f"| {e if e is None else round(e, 2)} |"
        )

    flags = [
        (q, t, e)
        for q in sorted(data)
        for t in [data[q]]
        for e in [exponent(t)]
        if e is not None
        and e > FLAG_EXPONENT
        and t.get("sf0.1", 0) >= MIN_SEC_TO_FLAG
    ]
    print()
    if flags:
        print(f"FLAGGED (e > {FLAG_EXPONENT}, t(sf0.1) >= {MIN_SEC_TO_FLAG}s):")
        for q, t, e in flags:
            print(f"  {q}: e={e:.2f}  ({t['sf0.01']:.1f}s -> {t['sf0.1']:.1f}s)")
    else:
        print(
            f"No query with t(sf0.1) >= {MIN_SEC_TO_FLAG}s exceeds "
            f"e = {FLAG_EXPONENT} over the last decade."
        )
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
