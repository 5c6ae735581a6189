"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and hash-compare with its
DuckDB ``oracle_sql()`` twin (row count + sorted-column schema +
order-insensitive values).

Usage: python tools/local_verify.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")


def canon(val) -> str:
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(round(val, 9))
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def frame_key(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    body = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return tuple(sorted_cols), body


def main() -> int:
    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("local_verify")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows [{dt:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        sk, dk = frame_key(scols, srows), frame_key(dcols, drows)
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)} [{dt:.1f}s]")
            n_fail += 1
        elif sk[0] != dk[0]:
            print(f"FAIL {name}: schema spark={sk[0]} duckdb={dk[0]}")
            n_fail += 1
        elif sk[1] != dk[1]:
            diffs = [(a, b) for a, b in zip(sk[1], dk[1]) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (spark vs duckdb): {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
