"""Dump ``explain("formatted")`` for named declared queries to
``plans/<dir>/<query>_<tag>.txt`` — the committed evidence the judge
checks plan-shape claims against.

Usage: python tools/dump_plans.py --dir r13 --tag before q_a q_b ...
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = e.queries()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.dir
    os.makedirs(out_dir, exist_ok=True)
    for q in args.queries:
        df = qs[q](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{q}_{args.tag}.txt").write_text(txt)
        print(f"wrote {q}_{args.tag}.txt ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
