"""Round-12 verdict item #4: pin down the openCostInBytes × UDF-scan
interaction suspected on the cogroup/mapInPandas query subset. Sweeps
``spark.sql.files.openCostInBytes`` ∈ {128K, 512K, 4M} over the
Python-boundary queries (cogrouped GEMM kernels, mapInPandas banding,
train UDFs) plus the two scan-adjacent text queries the verdict named,
interleaved (config-major per round, min over rounds per cell) so the
comparison is same-session.

Usage: python tools/opencost_sweep.py [rounds]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "q_embedding_neardup",      # cogrouped GEMM block pairs
    "q_mutual_knn",             # knn_self_join cogroup
    "q_hard_negative_mining",   # knn_self_join cogroup
    "q_local_outlier_factor",   # knn_self_join cogroup
    "q_embedding_neardup_lsh",  # mapInPandas RHP banding
    "q_semdedup",               # k-means train UDF + assignment
    "q_ann_ivf_topk",           # IVF train/probe UDFs
    "q_kcenter_coreset",        # iterative numpy UDF
    "q_bpe_tokenize",           # scan-adjacent tokenize (verdict-named)
    "q_bpe_merge_loop",         # scan-adjacent loop (verdict-named)
]
COSTS = ["131072", "524288", "4194304"]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.session import get_spark

    spark = get_spark("opencost_sweep")
    sf_dir = "/root/testdata/sf0.1"
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    qs = e.queries()

    best: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for rnd in range(rounds):
        for cost in COSTS:
            spark.conf.set("spark.sql.files.openCostInBytes", cost)
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"oc:{cost}:{q}")
                t0 = time.time()
                qs[q](spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                prev = best[q].get(cost)
                if prev is None or dt < prev:
                    best[q][cost] = dt
                print(f"# r{rnd} {cost} {q}: {dt}s", file=sys.stderr)
                spark.catalog.clearCache()

    totals = {c: round(sum(best[q][c] for q in QUERIES), 3) for c in COSTS}
    print(json.dumps({"per_query": best, "totals": totals}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
