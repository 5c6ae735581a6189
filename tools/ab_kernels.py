"""Same-session interleaved A/B of declared queries between two code
trees (e.g. the r11 worktree vs HEAD) — the round-10/11/12 adjudication
discipline: wall times on this box drift by session, so cross-session
or cross-commit absolute comparisons are meaningless; only times
measured minutes apart in ONE session, alternating trees, adjudicate a
regression.

Usage:
    python tools/ab_kernels.py --a /path/to/old_tree --b /path/to/new_tree \
        [--rounds 3] [--sf-dir /root/testdata/sf0.1] \
        [--open-cost-a 4194304] [--open-cost-b 131072] q_name [q_name ...]

Method: one shared SparkSession; per round, per tree: purge the
engine's modules from sys.modules, point sys.path at the tree, import
its ``__spark_entry__``, time each query's ``count()`` (bench
methodology), ``clearCache()`` between queries. Per-tree
``spark.sql.files.openCostInBytes`` is applied before each phase so
each tree runs under the scan-split floor it ships with. Reports
min-over-rounds per query per tree plus the ratio.
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path


def purge_and_import(tree: str):
    for mod in list(sys.modules):
        if mod.startswith("mi_inbound_pulsar_spark") or mod == "__spark_entry__":
            del sys.modules[mod]
    sys.path = [p for p in sys.path if "repo" not in p and "worktree" not in p]
    sys.path.insert(0, tree)
    import __spark_entry__ as e  # noqa: PLC0415

    assert e.__file__.startswith(tree), e.__file__
    return e


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--open-cost-a", default=None)
    ap.add_argument("--open-cost-b", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    # session from tree B (HEAD) — conf deltas applied per phase below
    sys.path.insert(0, args.b)
    from mi_inbound_pulsar_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("ab_kernels")
    # warm the JVM + Arrow worker pool like bench.py does
    spark.read.parquet(str(Path(args.sf_dir) / "nation.parquet")).count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    results: dict[str, dict[str, float]] = {q: {} for q in args.queries}
    phases = [("a", args.a, args.open_cost_a), ("b", args.b, args.open_cost_b)]
    for rnd in range(args.rounds):
        for label, tree, open_cost in phases:
            e = purge_and_import(tree)
            if open_cost:
                spark.conf.set("spark.sql.files.openCostInBytes", str(open_cost))
            qs = e.queries()
            for q in args.queries:
                if q not in qs:
                    continue
                spark.sparkContext.setJobDescription(f"ab:{label}:{q}:r{rnd}")
                t0 = time.time()
                n = qs[q](spark, args.sf_dir).count()
                dt = round(time.time() - t0, 3)
                prev = results[q].get(label)
                if prev is None or dt < prev:
                    results[q][label] = dt
                print(f"# r{rnd} {label} {q}: {dt}s ({n} rows)", file=sys.stderr)
                spark.catalog.clearCache()
                gc.collect()

    table = {
        q: {
            "a": r.get("a"),
            "b": r.get("b"),
            "b_over_a": round(r["b"] / r["a"], 3) if r.get("a") and r.get("b") else None,
        }
        for q, r in results.items()
    }
    print(json.dumps(table, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
