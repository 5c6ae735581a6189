"""Degeneracy audit: find oracle-green statistics that never exercise
their own logic on the testdata.

Motivation (round 10): two operators passed every correctness gate at
every scale factor while computing a trivial value —
``q_max_drawdown`` (drawdown of a monotone cumulative revenue curve is
identically 0) and ``q_watermark_calibration`` (the arrival proxy was
monotone with event time, so every disorder metric was exactly 0).
Both engines agreed, so the hash compare was green; the operator's
actual logic (path dependence, out-of-order handling) was dead code on
this data. Value-hash parity proves the two engines AGREE — it cannot
prove the statistic DISCRIMINATES.

This tool runs every registered DuckDB oracle at a chosen scale factor
(no Spark session — DuckDB only, ~2 min) and flags single-row results
whose every non-count numeric column is exactly 0 or NULL. Flags are
leads, not verdicts: a legitimately-zero statistic (e.g. a passing
equality test) needs a docstring rationale; a dead code path needs a
redefinition like the two above (see SCALE.md round 10).

Usage: python tools/degeneracy_audit.py [sf_dir]
Exit 0 always (leads need human adjudication); prints the flag list.

Known-benign flags on the current testdata:
- q_density_clusters: the cluster label and exemplar id are
  legitimately 0 (ids, not magnitudes); n_members is non-trivial.
- q_benjamini_hochberg / q_benjamini_yekutieli `*_reject`,
  q_sequential_obrien_fleming `crossed`: a multiple-testing or
  sequential procedure on NO-EFFECT null data rejecting nothing is
  the statistically correct outcome; the step-up/boundary logic is
  pinned by pytest replays instead.
- q_lexical_richness hapax tiers: the synthetic corpus has a CLOSED
  31-token vocabulary, so global hapax legomena cannot exist at any
  scale factor (per-bucket hapax in q_hapax_ratio do fire).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

COUNT_PREFIXES = ("n_", "num", "count")


def scan(sf_dir: str) -> tuple[list[tuple[str, dict]], list[tuple[str, str]]]:
    """DuckDB-only degeneracy scan: run every registered oracle at
    ``sf_dir`` and return (flagged, errors) where flagged holds
    single-row results whose every non-count numeric column is exactly
    0 or NULL. Importable so the pytest gate
    (tests/test_degeneracy_gate.py) and the CLI share one scanner."""
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    flagged, errors = [], []
    for name, sql in e.oracle_sql().items():
        try:
            rel = con.execute(sql)
            rows = rel.fetchall()
            cols = [d[0] for d in rel.description]
        except Exception as ex:  # noqa: BLE001 - report, don't die
            errors.append((name, str(ex)[:80]))
            continue
        if len(rows) != 1:
            continue
        row = dict(zip(cols, rows[0]))
        numeric = {
            c: v
            for c, v in row.items()
            if isinstance(v, (int, float)) and not c.startswith(COUNT_PREFIXES)
        }
        if numeric and all(
            v is None or float(v) == 0.0 for v in numeric.values()
        ):
            flagged.append((name, row))
    return flagged, errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e

    flagged, errors = scan(sf_dir)

    print(f"oracles audited: {len(e.oracle_sql())}  errors: {len(errors)}")
    for name, err in errors:
        print(f"  ERROR {name}: {err}")
    print(f"all-zero single-row statistics: {len(flagged)}")
    for name, row in flagged:
        print(f"  {name}: {row}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
