"""Property-based tests (hypothesis) for the portable-hash kernel the
sketch shelf stands on: the generated `_hexval_sql` expression must
agree with Python's int(md5_hex[:n], 16) for ARBITRARY strings on
BOTH engines — if either engine's instr/substring/md5 semantics drift
(unicode, quotes, empty strings), every sketch oracle silently breaks.
DuckDB-side checks run without a JVM; one Spark spot-check rides the
shared session."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from mi_inbound_pulsar_spark.operators.auditstats import (
    BLOOM_BITS,
    CMS_WIDTH,
    _bloom_bit_sql,
    _cms_bucket_sql,
    _hexval_sql,
)

# printable-ish text without single quotes (SQL literal injection is
# the caller's concern; values come from columns in production)
TEXT = st.text(
    alphabet=st.characters(blacklist_characters="'", min_codepoint=32, max_codepoint=126),
    max_size=40,
)


@given(TEXT, st.integers(min_value=1, max_value=8))
@settings(max_examples=200, deadline=None)
def test_hexval_matches_python_in_duckdb(s: str, n: int):
    sql = _hexval_sql(f"md5('{s}')", n)
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    want = int(hashlib.md5(s.encode()).hexdigest()[:n], 16)
    assert got == want


@given(TEXT, st.integers(min_value=1, max_value=3))
@settings(max_examples=100, deadline=None)
def test_cms_and_bloom_buckets_in_range_and_match(s: str, seed: int):
    lit = "'" + s + "'"
    cms = duckdb.sql(f"SELECT {_cms_bucket_sql(lit, seed)}").fetchone()[0]
    blo = duckdb.sql(f"SELECT {_bloom_bit_sql(lit, seed)}").fetchone()[0]
    assert 0 <= cms < CMS_WIDTH
    assert 0 <= blo < BLOOM_BITS
    assert cms == int(hashlib.md5(f"cm{seed}:{s}".encode()).hexdigest()[:4], 16) % CMS_WIDTH
    assert blo == int(hashlib.md5(f"bf{seed}:{s}".encode()).hexdigest()[:3], 16) % BLOOM_BITS


def test_hexval_matches_in_spark(spark):
    # one cross-engine spot check per session: the same generated SQL
    # text evaluates identically in Spark
    vals = ["", "a", "Hello World", "user42@example.com", "0" * 40]
    for s in vals:
        sql = _hexval_sql(f"md5('{s}')", 6)
        got = spark.sql(f"SELECT {sql} AS v").first()["v"]
        assert got == int(hashlib.md5(s.encode()).hexdigest()[:6], 16)
