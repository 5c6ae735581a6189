"""Second-decade scaling measurement (round-10 verdict item #5).

The committed tri-scale exponents stop at sf0.1; a super-linear term
that only dominates past sf0.1 is invisible to them (exactly how the
Catalyst BigInt-stats bug hid for four rounds). This tool times the
SCALE.md flagship kernels at sf0.1 AND at the 10x replica set built by
``tools/upscale_testdata.py`` (FK-consistent disjoint copies, closed
vocab permuted per replica, embedding signs flipped per replica — so
every kernel sees 10x cardinality with the original within-replica
structure), in ONE session with min-of-2 per point, and reports the
NEW decade's exponent e2 = log10(t(sf1.0)/t(sf0.1)) next to the
committed last-decade e1.

Same-session measurement makes the ratio drift-free (both points share
whatever load the session carries). Writes ``SCALE_DECADE2_r{N}.json``
and prints the SCALE.md-ready markdown table.

Usage: python tools/scale_decade2.py [round_no] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from scaling_fit import (  # noqa: E402
    FLAGSHIPS,
    exponent,
    latest_round,
    load_min,
)

SMALL = "/root/testdata/sf0.1"
BIG = str(ROOT / ".testdata_up" / "sf1")

#: --wide selection threshold: every kernel whose committed-min sf0.1
#: wall time is at least this many seconds joins the flagships in the
#: measurement set (round-11 verdict item #5 — the recall gates
#: re-cluster per scale and are exactly the kind of kernel whose
#: exponent could hide a k-means-iteration term; a 62-kernel tail of
#: >=2 s queries was invisible to the 17-flagship table).
WIDE_MIN_SEC = 2.0


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    round_no = int(args[0]) if args and args[0].isdigit() else latest_round()
    only = set(args[1:]) if args and args[0].isdigit() else set(args)
    wide = "--wide" in sys.argv

    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.session import get_spark

    spark = get_spark("scale_decade2")
    qs = e.queries()
    # e1 reference = per-round MINIMA across every committed tri-scale
    # artifact set (not one round's capture — the r11 lesson)
    committed = load_min()

    spark.read.parquet(os.path.join(SMALL, "nation.parquet")).count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    pool = list(FLAGSHIPS)
    if wide:
        extras = sorted(
            q
            for q, t in committed.items()
            if t.get("sf0.1", 0) >= WIDE_MIN_SEC and q not in pool and q in qs
        )
        pool += extras
    names = [q for q in pool if not only or q in only]
    times: dict[str, dict[str, float]] = {q: {} for q in names}
    errors: dict[str, str] = {}
    for pass_no in range(2):
        for q in names:
            if q in errors:
                continue
            for label, sf_dir in (("sf0.1", SMALL), ("sf1.0", BIG)):
                t0 = time.time()
                try:
                    n = qs[q](spark, sf_dir).count()
                except Exception as exc:  # record and keep sweeping —
                    # one broken kernel must not kill a 2-hour run
                    # (the round-12 ivfpq empty-partition crash cost a
                    # 37-measurement pass before this guard existed)
                    errors[q] = f"{label}: {exc}"[:300]
                    print(
                        f"# ERROR {q}@{label}: {exc}"[:300],
                        file=sys.stderr,
                        flush=True,
                    )
                    spark.catalog.clearCache()
                    break
                el = round(time.time() - t0, 3)
                if label not in times[q] or el < times[q][label]:
                    times[q][label] = el
                print(
                    f"# pass{pass_no} {q}@{label}: {el}s ({n} rows)",
                    file=sys.stderr,
                    flush=True,
                )
                spark.catalog.clearCache()

    rows = []
    print("| query | sf0.1 s | sf1.0 s | e2 (this run) | e1 (committed) |")
    print("|---|---|---|---|---|")
    for q in names:
        t1, t2 = times[q].get("sf0.1"), times[q].get("sf1.0")
        e2 = round(math.log10(t2 / t1), 2) if t1 and t2 else None
        e1 = exponent(committed.get(q, {}))
        e1 = None if e1 is None else round(e1, 2)
        rows.append({"query": q, "sf0.1": t1, "sf1.0": t2, "e2": e2, "e1": e1})
        print(f"| `{q}` | {t1} | {t2} | {e2} | {e1} |")

    out = ROOT / f"SCALE_DECADE2_r{round_no}.json"
    if "--merge" in sys.argv and out.exists():
        # re-measurement of a fixed kernel updates its row in the
        # existing round artifact instead of clobbering the full table
        prior = json.loads(out.read_text())
        by_q = {r["query"]: r for r in prior.get("rows", [])}
        for r in rows:
            by_q[r["query"]] = r
        prior_err = prior.get("errors", {})
        for q in names:
            prior_err.pop(q, None)
        prior_err.update(errors)
        rows = sorted(by_q.values(), key=lambda r: r["query"])
        errors = prior_err
    out.write_text(json.dumps({"rows": rows, "errors": errors}, indent=1) + "\n")
    if errors:
        print(f"ERRORS ({len(errors)}): {errors}")
    print(f"\nwrote {out}")
    flags = [r for r in rows if r["e2"] is not None and r["e2"] > 1.2 and (r["sf1.0"] or 0) >= 5]
    if flags:
        print("FLAGGED (e2 > 1.2 with t(sf1.0) >= 5s):")
        for r in flags:
            print(f"  {r['query']}: e2={r['e2']} ({r['sf0.1']}s -> {r['sf1.0']}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
