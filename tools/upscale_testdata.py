"""One-off generator for a LARGER synthetic scale factor, extending the
measured scaling decade (round-10 verdict item #5).

The driver's testdata tops out at sf0.1, so every committed scaling
exponent is a single-decade fit (sf0.01 → sf0.1) — which can hide a
super-linear term that only dominates past sf0.1 (exactly how the
Catalyst BigInt-stats bug stayed invisible for four rounds). This tool
builds an sf-K replica set (default K=10 ⇒ "sf1.0") under the REPO
tree (never writes /root/testdata) by replicating each sf0.1 table K
times with:

- **foreign-key-consistent id offsets**: replica r adds ``r * (max_id
  + 1)`` to every key column, in fact tables and their referencing
  columns alike, so joins land exactly as in the original and the
  relational/graph structure becomes K disjoint copies — cardinalities
  scale by K at every join, which is the property an exponent fit
  needs (nation/region dimension tables stay as-is; nationkeys are a
  closed 25-value domain on purpose);
- **per-replica vocabulary permutation** for ``documents.text``: the
  corpus has a closed token vocabulary, so a deterministic per-replica
  permutation of it preserves every within-replica statistic exactly
  (token frequencies, shingle structure, doc lengths) while keeping
  replicas from colliding in shingle space — without it every doc
  would be an exact near-dup of its K-1 copies and pair-generation
  would scale quadratically in K instead of linearly, poisoning the
  fit;
- **per-replica sign flips** for ``embeddings.embedding``: multiplying
  dimension d by sign(hash(r, d)) preserves all norms and all
  WITHIN-replica cosines exactly while scrambling cross-replica
  similarity, so kNN graphs get K disjoint copies of the original
  structure;
- ``events``: user_id/event_id offsets (same sessions, K× users).

Determinism: pure hash-based, no RNG state; running twice produces
byte-identical parquet.

Usage:
    python tools/upscale_testdata.py [K] [out_dir]
    # default K=10, out_dir=<repo>/.testdata_up/sf1.0

The output directory is gitignored — it is measurement input, not a
committed artifact; SCALE.md commits the exponents measured on it.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

#: key columns to offset, per table: {column: domain_table.key it draws from}
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    # user_id joins customer.c_custkey (q_stream_static_join et al.),
    # so it must offset by the CUSTOMER key domain — offsetting by its
    # own max (round-11 review) landed replica r's users on replica-0's
    # customers, breaking the disjoint-copies invariant for
    # events-customer joins
    "events": {"event_id": "event_id", "user_id": "c_custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

#: where each key domain's max lives: (table, column)
DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _sign(r: int, d: int) -> int:
    h = hashlib.md5(f"sgn:{r}:{d}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


def _vocab_perm(con: duckdb.DuckDBPyConnection, r: int) -> dict[str, str]:
    """Deterministic per-replica permutation of the closed vocabulary
    (identity for r=0): rotation by a hash-derived stride in
    [1, n-1]. ANY such stride is fixed-point-free (i + s mod n == i
    only when s ≡ 0 mod n), which is the property the replica
    construction needs — full-cycle rotations are NOT required
    (round-11 review: the previous coprimality loop neither ensured a
    full cycle nor terminated for n=2)."""
    vocab = [
        v[0]
        for v in con.sql(
            f"SELECT DISTINCT unnest(string_split(text,' ')) AS t "
            f"FROM '{SRC}/documents.parquet' ORDER BY t"
        ).fetchall()
    ]
    n = len(vocab)
    if r == 0 or n < 2:
        return {}
    stride = 1 + int(hashlib.md5(f"perm:{r}".encode()).hexdigest(), 16) % (n - 1)
    return {vocab[i]: vocab[(i + stride) % n] for i in range(n)}


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(
        sys.argv[2]
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent
        / ".testdata_up"
        / f"sf{k / 10:g}"
    )
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    maxes = {
        key: con.sql(f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        + 1
        for key, (tbl, col) in DOMAIN.items()
    }

    # dimension tables: copy through unchanged
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
            f" (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keymap in OFFSETS.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(k):
            exprs = []
            for c in cols:
                if c in keymap:
                    exprs.append(f"{c} + {r * maxes[keymap[c]]} AS {c}")
                elif t == "documents" and c == "text":
                    perm = _vocab_perm(con, r)
                    if perm:
                        arms = " ".join(
                            f"WHEN '{a}' THEN '{b}'"
                            for a, b in sorted(perm.items())
                        )
                        exprs.append(
                            "list_aggregate(list_transform(string_split(text,' '),"
                            f" x -> CASE x {arms} ELSE x END),"
                            " 'string_agg', ' ') AS text"
                        )
                    else:
                        exprs.append("text")
                elif t == "embeddings" and c == "embedding":
                    if r == 0:
                        exprs.append("embedding")
                    else:
                        dim = len(
                            con.sql(
                                f"SELECT embedding FROM '{SRC}/embeddings.parquet' LIMIT 1"
                            ).fetchone()[0]
                        )
                        signs = ",".join(
                            f"{_sign(r, d)}" for d in range(dim)
                        )
                        exprs.append(
                            f"list_transform(list_zip(embedding, [{signs}]),"
                            " z -> CAST(z[1] * z[2] AS FLOAT)) AS embedding"
                        )
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'"
            )
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
