"""Python Data Source API (`pulsar_sim`): batch partition-parallel
generation and the streaming poll loop with offset-based admission."""

from __future__ import annotations

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.sources.python_datasource import register


def test_batch_source_partitioned_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("pulsar_sim")
        .option("messages", 1000)
        .option("numPartitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8  # executor-parallel generation
    assert df.count() == 1000
    assert df.select("topic").distinct().count() == 3
    # ~10% null keys by construction (i % 10 == 0)
    assert df.filter(F.col("key").isNull()).count() == 100
    # re-read is identical (pure-arithmetic generator)
    again = spark.read.format("pulsar_sim").option("messages", 1000).load()
    assert again.exceptAll(df).count() == 0


def test_stream_source_drains_backlog_in_rate_bound_batches(spark):
    register(spark)
    stream = (
        spark.readStream.format("pulsar_sim")
        .option("messages", 250)
        .option("rate", 100)
        .load()
    )
    batches: list[int] = []
    seen: list[str] = []

    def sink(df, epoch):
        rows = df.collect()
        batches.append(len(rows))
        seen.extend(r["message_id"] for r in rows)

    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    # exactly-once drain of the whole backlog
    assert sorted(map(int, seen)) == list(range(250))
    # admission control: no batch exceeds the rate
    real = [b for b in batches if b > 0]
    assert max(real) <= 100
    assert len(real) >= 3  # 250 ids at ≤100/trigger → ≥3 micro-batches
