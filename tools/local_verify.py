"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and hash-compare with its
DuckDB ``oracle_sql()`` twin (row count + sorted-column schema +
order-insensitive values + **Arrow value types**).

The type check exists because the driver's value hash is
type-sensitive: DuckDB ``sum(int)``/``count_if`` yield HUGEINT
(arrow ``decimal128(38,0)``) while Spark yields int64 — identical
values, different hash. Both sides are materialized through Arrow
here so that class of mismatch fails locally too.

Usage: python tools/local_verify.py [query_name ...]
Set ``VERIFY_JSON=/path.json`` to also write a per-query result
artifact (status + row count + seconds) for committed evidence of a
full-registry sweep at the chosen scale factor.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time
from pathlib import Path

import duckdb
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
    if isinstance(val, dt.datetime) and val.tzinfo is not None:
        # Spark timestamps surface tz-aware (UTC); DuckDB naive — same instant
        val = val.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return str(val)


def canon_type(t: pa.DataType) -> str:
    """Normalize Arrow types the way the driver's pandas-based hash
    does: integer width/signedness collapses (int32 vs int64 vs uint32
    all hash-matched in round 1), timestamps lose their tz, but
    DECIMAL stays distinct from INT — decimal columns become Python
    ``Decimal`` objects in pandas and their values hash differently
    (the round-1 HUGEINT failure class)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def table_key(tbl: pa.Table) -> tuple:
    cols = list(tbl.column_names)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    types = [canon_type(tbl.schema.field(i).type) for i in order]
    pycols = [tbl.column(i).to_pylist() for i in order]
    body = sorted(tuple(canon(c[r]) for c in pycols) for r in range(tbl.num_rows))
    return tuple(sorted_cols), tuple(types), body


def sweep_min_times(sf_label: str) -> dict[str, float]:
    """Per-query minimum wall time across every committed sweep artifact
    at this scale label (``VERIFY_FULL_r*_{sf_label}.json``). Used by
    the retest-on-flag pass below; empty dict when no artifact exists
    for this sf (e.g. a dev run at a replica scale)."""
    import json

    out: dict[str, float] = {}
    root = Path(__file__).resolve().parent.parent
    for p in root.glob(f"VERIFY_FULL_r*_{sf_label}.json"):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for q, rec in (data.get("queries") or {}).items():
            if isinstance(rec, dict) and rec.get("status") != "fail":
                sec = float(rec.get("sec") or 0.0)
                if sec > 0 and (q not in out or sec < out[q]):
                    out[q] = sec
    return out


def main() -> int:
    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("local_verify")
    con = duckdb.connect()
    # the 10x replica tier's pair-heavy oracles (triangle join, shingle
    # self-joins) spill past the in-memory connection's default temp
    # cap — allow real disk spill so oracle capacity, not parity,
    # never fails a sweep
    con.execute("SET max_temp_directory_size='60GB'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # Retest-on-flag (round-11 verdict item #1a): sweep times are
    # single-pass, and one loaded session can spike a kernel 5-30x its
    # committed minimum (r11: 39.7 s captured for a 1.4 s kernel) —
    # poisoning the committed artifact the scaling gate reads. Any
    # query whose single pass exceeds its committed sweep minimum by
    # the flag threshold gets exactly ONE re-run and the minimum is
    # recorded, so one-shot scheduler/GC spikes die at the source for
    # bounded extra cost (only flagged kernels re-run).
    sf_label = os.path.basename(SF_DIR.rstrip("/"))
    committed = sweep_min_times(sf_label)

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            stbl = fn(spark, SF_DIR).toArrow()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            results[name] = {"status": "fail", "detail": f"spark error: {exc}"[:200]}
            n_fail += 1
            continue
        dt = time.time() - t0
        base = committed.get(name)
        retested = False
        if base is not None and dt > max(1.5 * base, base + 0.5):
            t0 = time.time()
            try:
                stbl = fn(spark, SF_DIR).toArrow()
                dt2 = time.time() - t0
                print(
                    f"  retest {name}: {dt:.1f}s -> {dt2:.1f}s "
                    f"(committed min {base}s)"
                )
                dt = min(dt, dt2)
                retested = True
            except Exception:
                pass  # keep the first (successful) pass's result
        results[name] = {"status": "pass", "rows": stbl.num_rows, "sec": round(dt, 1)}
        if retested:
            results[name]["retested"] = 1
        if name not in oracles:
            print(f"rows-only {name}: {stbl.num_rows} rows [{dt:.1f}s]")
            results[name]["status"] = "rows-only"
            n_rows_only += 1
            continue
        try:
            dtbl = con.sql(oracles[name]).arrow()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            results[name] = {"status": "fail", "detail": f"duckdb error: {exc}"[:200]}
            n_fail += 1
            continue
        sk, dk = table_key(stbl), table_key(dtbl)
        if stbl.num_rows != dtbl.num_rows:
            print(f"FAIL {name}: rowcount spark={stbl.num_rows} duckdb={dtbl.num_rows} [{dt:.1f}s]")
            results[name]["status"] = "fail"
            n_fail += 1
        elif sk[0] != dk[0]:
            print(f"FAIL {name}: schema spark={sk[0]} duckdb={dk[0]}")
            results[name]["status"] = "fail"
            n_fail += 1
        elif sk[1] != dk[1]:
            diffs = [
                (c, a, b) for c, a, b in zip(sk[0], sk[1], dk[1]) if a != b
            ]
            print(f"FAIL {name}: types differ (col, spark, duckdb): {diffs}")
            results[name]["status"] = "fail"
            n_fail += 1
        elif sk[2] != dk[2]:
            diffs = [(a, b) for a, b in zip(sk[2], dk[2]) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (spark vs duckdb): {diffs}")
            results[name]["status"] = "fail"
            n_fail += 1
        else:
            print(f"PASS {name}: {stbl.num_rows} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")

    # Full-registry regression gate (round-10 verdict item #7): on a
    # full sf0.1 sweep, gate every query's wall time against the
    # committed-round minimum, drift-normalized on the pinned probe
    # set exactly like bench.py. Sweep times are SINGLE-pass (and
    # materialized through toArrow), so the noise floor is looser
    # than bench's min-of-2 gate: 1.5x ratio + 0.5 s absolute floor
    # (documented in benchbase.py). This makes gate coverage = the
    # registry, not just the ~212 headline queries.
    regressions: list[str] = []
    drift = None
    if not only and SF_DIR.rstrip("/").endswith("sf0.1"):
        from mi_inbound_pulsar_spark.benchbase import (
            PROBES,
            committed_min_times,
            drift_factor,
            gate_regressions,
        )

        sweep_times = {
            n: float(r["sec"])
            for n, r in results.items()
            if r.get("status") == "pass" and r.get("sec")
        }
        # sweep-only baselines: sweep times are single-pass toArrow
        # (driver materialization included), so gating them against
        # bench's min-of-2 count() minima would flag every wide-output
        # query on methodology alone (benchbase docstring)
        baseline = committed_min_times(sources="sweep")
        probe_times = {q: sweep_times[q] for q in PROBES if q in sweep_times}
        drift = drift_factor(probe_times, baseline)
        regressions = gate_regressions(
            sweep_times, baseline, drift, ratio=1.5, floor=0.5
        )
        print(f"drift factor {drift}x; {len(regressions)} gate flags")
        for line in regressions:
            print(f"  REGRESSION {line}")

    out = os.environ.get("VERIFY_JSON")
    if out:
        import json

        with open(out, "w") as fh:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "queries": results,
                    **(
                        {"drift_factor": drift, "regressions": regressions}
                        if drift is not None
                        else {}
                    ),
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
