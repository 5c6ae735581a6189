"""Source/sink tests: Key_Shared partition-ordering contract (S4),
parquet sinks (batch, partitioned, streaming), DLQ routing to a sink."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.config import DeadLetterPolicy
from mi_inbound_pulsar_spark.sources.pulsar_source import (
    key_shared_repartition,
    simulated_message_frame,
    simulated_stream,
)
from mi_inbound_pulsar_spark.sources.sinks import (
    route_to_dlq,
    write_parquet,
    write_stream_parquet,
)


def test_key_shared_one_partition_per_key(spark, sf_dir):
    # S4 — every key's messages land in exactly one partition
    m = simulated_message_frame(spark, sf_dir).filter(F.col("key").isNotNull())
    parted = key_shared_repartition(m, 8)
    spread = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("key")
        .agg(F.countDistinct("pid").alias("n_partitions"))
    )
    assert spread.filter(F.col("n_partitions") > 1).count() == 0


def test_key_shared_preserves_per_key_order(spark, sf_dir):
    # within a partition, a key's messages are in message-id order
    m = simulated_message_frame(spark, sf_dir).filter(F.col("key").isNotNull())
    parted = key_shared_repartition(m, 8)

    def check(it):
        import pandas as pd

        for pdf in it:
            bad = 0
            last: dict = {}
            for k, mid in zip(pdf["key"], pdf["message_id"]):
                mid = int(mid)
                if k in last and mid < last[k]:
                    bad += 1
                last[k] = mid
            yield pd.DataFrame({"bad": [bad]})

    bad_total = (
        parted.select("key", "message_id")
        .mapInPandas(check, schema="bad long")
        .agg(F.sum("bad"))
        .first()[0]
    )
    assert bad_total == 0


def test_parquet_sink_roundtrip_partitioned(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="sink_parquet_")
    m = simulated_message_frame(spark, sf_dir).limit(1000)
    write_parquet(m, out, mode="overwrite", partition_by=["topic"])
    # partitioned layout on disk → one dir per topic (pruning layout)
    dirs = {d for d in os.listdir(out) if d.startswith("topic=")}
    assert len(dirs) == 3
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == set(m.columns)


def test_streaming_parquet_sink_checkpointed(spark, sf_dir):
    src = tempfile.mkdtemp(prefix="sink_src_")
    out = tempfile.mkdtemp(prefix="sink_out_")
    ckpt = tempfile.mkdtemp(prefix="sink_ckpt_")
    stream = simulated_stream(spark, sf_dir, staging_dir=src, files=3)
    q = write_stream_parquet(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()
    expected = simulated_message_frame(spark, sf_dir).count()
    assert spark.read.parquet(out).count() == expected


def test_route_to_dlq_counts(spark, sf_dir):
    main_path = tempfile.mkdtemp(prefix="dlq_main_") + "/t"
    dlq_path = tempfile.mkdtemp(prefix="dlq_dead_") + "/t"
    m = simulated_message_frame(spark, sf_dir)
    n_main, n_dlq = route_to_dlq(
        m, DeadLetterPolicy(max_redeliveries=5, dlq_topic="dead-letters"), main_path, dlq_path
    )
    assert n_main + n_dlq == m.count()
    assert n_dlq == m.filter(F.col("redelivery_count") >= 5).count()
    assert n_dlq > 0  # fixture guarantees some poison rows


def test_memory_sink_queryable_while_streaming(spark, sf_dir):
    # §2B sinks: the memory sink exposes a streaming result as a
    # queryable in-memory table — the debug/verification sink
    staging = tempfile.mkdtemp(prefix="pulsar_mem_test_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=2)
    q = (
        stream.groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("mem_sink_counts")
        .start()
    )
    q.processAllAvailable()
    got = {
        r["topic"]: r["n"]
        for r in spark.sql("SELECT * FROM mem_sink_counts").collect()
    }
    q.stop()
    expected = {
        r["topic"]: r["n"]
        for r in simulated_message_frame(spark, sf_dir)
        .groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_csv_and_json_source_roundtrip(spark, sf_dir):
    # §2B scans/sources: the same frame through csv and json file
    # formats with explicit schemas (header/timestamp options exercised)
    src = (
        simulated_message_frame(spark, sf_dir)
        .select("message_id", "topic", "key", "value")
        .limit(200)
    )
    base = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    csv_dir, json_dir = os.path.join(base, "csv"), os.path.join(base, "json")
    src.write.option("header", True).csv(csv_dir)
    src.write.json(json_dir)
    schema = "message_id string, topic string, key string, value string"
    back_csv = spark.read.option("header", True).schema(schema).csv(csv_dir)
    back_json = spark.read.schema(schema).json(json_dir)
    canon = lambda rows: sorted(tuple(r) for r in rows)
    want = canon(src.collect())
    assert canon(back_csv.collect()) == want
    assert canon(back_json.collect()) == want


def test_dynamic_partition_overwrite_preserves_others(spark, sf_dir):
    # production sink contract: overwriting one partition must not
    # clobber its siblings (static overwrite mode would)
    base = tempfile.mkdtemp(prefix="dyn_overwrite_") + "/t"
    m = simulated_message_frame(spark, sf_dir).select("message_id", "topic").limit(300)
    m.write.partitionBy("topic").parquet(base)
    before = spark.read.parquet(base)
    topics = [r["topic"] for r in before.select("topic").distinct().collect()]
    assert len(topics) == 3
    target = topics[0]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # rewrite ONE topic's partition with a single marker row
        repl = spark.createDataFrame([("replacement", target)], "message_id string, topic string")
        repl.write.mode("overwrite").partitionBy("topic").parquet(base)
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    after = spark.read.parquet(base)
    assert after.filter(F.col("topic") == target).count() == 1
    # sibling partitions untouched
    for t in topics[1:]:
        assert (
            after.filter(F.col("topic") == t).count()
            == before.filter(F.col("topic") == t).count()
        )


def test_observation_metrics_piggyback_on_action(spark, sf_dir):
    # df.observe: operational metrics (row counts, sums, null rates)
    # collected DURING the job — no second scan; the streaming form
    # surfaces the same metrics per micro-batch in QueryProgress
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    m = simulated_message_frame(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("redelivery_count")).alias("total_redeliveries"),
        F.count(F.when(F.col("key").isNull(), 1)).alias("null_keys"),
    )
    total = m.count()  # one action drives both the count and the metrics
    got = obs.get
    assert got["rows"] == total
    assert got["null_keys"] > 0
    assert got["total_redeliveries"] > 0


def test_parquet_schema_evolution_merge(spark):
    # schema evolution: a v2 writer adds a column; readers must see the
    # union schema with nulls for old files (mergeSchema)
    base = tempfile.mkdtemp(prefix="schema_evo_")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(base + "/p=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/p=2")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_corrupt_json_records_are_captured_not_fatal(spark):
    # T1 production contract: malformed payloads must route to an error
    # column (PERMISSIVE + columnNameOfCorruptRecord), never kill the job
    lines = [
        '{"k": 1, "v": "ok"}',
        '{"k": broken',          # malformed
        '{"k": 3, "v": "fine"}',
    ]
    d = tempfile.mkdtemp(prefix="corrupt_json_")
    with open(d + "/data.json", "w") as f:
        f.write("\n".join(lines))
    df = (
        spark.read.schema("k int, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(d)
    ).cache()  # required: corrupt-record queries must materialize whole rows
    assert df.count() == 3
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    assert df.filter(F.col("k").isNotNull()).count() == 2


def test_orc_source_roundtrip_and_pushdown(spark, sf_dir):
    # §2B scans/sources: ORC (the third columnar file format Spark
    # ships natively) — value-identical round-trip with zstd, and the
    # scan must push filters down like the parquet path does
    src = (
        simulated_message_frame(spark, sf_dir)
        .select("message_id", "topic", "key", "value")
        .limit(200)
    )
    base = tempfile.mkdtemp(prefix="orc_roundtrip_") + "/t"
    src.write.option("compression", "zstd").orc(base)
    back = spark.read.orc(base)
    canon = lambda rows: sorted(tuple(r) for r in rows)
    assert canon(back.collect()) == canon(src.collect())

    plan = (
        back.filter(F.col("topic") == "topic-a")
        .select("message_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "topic" in plan.split("PushedFilters")[1][:120]
