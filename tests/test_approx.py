"""Approximate-aggregate accuracy gates (no SQL oracle possible):
approx_percentile vs the exact oracle-checked percentiles."""

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
        for q in ("p50", "p90", "p99"):
            rel = abs(approx[k][q] - exact[k][q]) / exact[k][q]
            assert rel < 0.02, (k, q, approx[k][q], exact[k][q])
