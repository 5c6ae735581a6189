"""Driver-contract smoke tests: entry(), queries()/oracle_sql() shape."""

from __future__ import annotations


def test_entry_returns_rows_with_stable_schema(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns == ["n_name", "revenue", "n_lineitems"]
    assert df.count() > 0


def test_every_oracle_has_a_query():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_run_on_sf0001(spark, sf_dir):
    # spot-run a cross-section (full set is the driver's t2 at sf0.01)
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "q01_pricing_summary",
        "q_window_rank",
        "q_union_all",
        "q_json_extract",
        "q_msg_metadata_projection",
        "q_dedup_exact",
        "q_token_count",
    ):
        assert qs[name](spark, sf_dir).count() >= 0, name
