"""Sub-stage wall-time profile of the streaming replay queries (guide
§1: measure where the time actually goes before touching the epoch
protocol). Monkeypatches timers around the pipeline phases — privacy
body, curation body, the concurrent cache fills, the concurrent family
writes, each individual family write — and replays the three bench
replay queries once each.

Usage: python tools/profile_replays.py [composed|curation|privacy ...]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"

ACC: dict[str, list[float]] = defaultdict(list)


def timed(label, fn):
    def wrap(*a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        ACC[label].append(round(time.time() - t0, 3))
        return out

    return wrap


def main() -> int:
    which = sys.argv[1:] or ["composed", "curation", "privacy"]

    import __spark_entry__ as e
    from mi_inbound_pulsar_spark.session import get_spark
    from mi_inbound_pulsar_spark.streaming import curation, epochio, privacy

    spark = get_spark("profile_replays")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    privacy.StreamingPrivacyPipeline.__call__ = timed(
        "privacy_body", privacy.StreamingPrivacyPipeline.__call__
    )
    curation.StreamingCurationPipeline.__call__ = timed(
        "curation_body", curation.StreamingCurationPipeline.__call__
    )
    pw = timed("privacy_write_all", epochio.write_all)
    privacy.StreamingPrivacyPipeline._write_all = pw
    curation.StreamingCurationPipeline._write_all = timed(
        "curation_write_all", epochio.write_all
    )
    orig_fill = epochio.fill_all
    privacy.fill_all = timed("fill_all", orig_fill)
    privacy.StreamingPrivacyPipeline._write = timed(
        "one_write", privacy.StreamingPrivacyPipeline._write
    )
    curation.StreamingCurationPipeline._write = timed(
        "one_write", curation.StreamingCurationPipeline._write
    )

    qs = e.queries()
    name_map = {
        "composed": "q_streaming_composed_replay",
        "curation": "q_streaming_curation_replay",
        "privacy": "q_streaming_privacy_replay",
    }
    for w in which:
        q = name_map[w]
        ACC.clear()
        spark.sparkContext.setJobDescription(q)
        t0 = time.time()
        n = qs[q](spark, SF_DIR).count()
        total = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        print(f"\n== {q}: total {total}s ({n} rows)")
        for label, vals in ACC.items():
            print(f"  {label}: sum {round(sum(vals), 3)}s  {vals}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
