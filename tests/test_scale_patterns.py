"""Scale-pattern tests: bucketed co-located joins (no Exchange) and
salted skew joins (correct + spread). These assert the physical plan
and the answer — the 100 TB contract for fact-to-fact joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.plans.bucketing import bucketed_join, write_bucketed
from mi_inbound_pulsar_spark.plans.skew import salted_join
from mi_inbound_pulsar_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketdemo")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{wh}'")
    write_bucketed(
        load_table(spark, SF_DIR, "orders"), "bucketdemo.orders_b", "o_orderkey", 8
    )
    write_bucketed(
        load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "bucketdemo.lineitem_b",
        "o_orderkey",
        8,
    )
    yield "bucketdemo.orders_b", "bucketdemo.lineitem_b"
    spark.sql("DROP DATABASE bucketdemo CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the SMJ path a fact-to-fact join takes at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket spec replaces the shuffle
        assert "Bucketed: true" in plan
        # and the answer matches the plain (shuffling) join
        expected = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    # make l_suppkey skewed: fold most keys onto one hot supplier
    skewed = li.withColumn(
        "l_suppkey", F.when(F.col("l_orderkey") % 4 != 0, F.lit(1)).otherwise(F.col("l_suppkey"))
    )
    supp = load_table(spark, SF_DIR, "supplier")
    plain = skewed.join(supp, skewed.l_suppkey == supp.s_suppkey).groupBy("s_suppkey").count()
    salted = (
        salted_join(
            skewed.withColumnRenamed("l_suppkey", "s_suppkey"),
            supp,
            "s_suppkey",
            n_salts=8,
            salt_src="l_orderkey",
        )
        .groupBy("s_suppkey")
        .count()
    )
    assert {(r.s_suppkey, r["count"]) for r in salted.collect()} == {
        (r.s_suppkey, r["count"]) for r in plain.collect()
    }


def test_salt_spreads_hot_key_across_partitions(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    hot = li.withColumn("k", F.lit(1))  # everything is one hot key
    from mi_inbound_pulsar_spark.plans.skew import SALT

    salted = hot.withColumn(
        SALT, F.pmod(F.xxhash64("l_orderkey"), F.lit(8)).cast("int")
    )
    n_salts_seen = salted.select(SALT).distinct().count()
    assert n_salts_seen == 8  # one hot key now occupies 8 shuffle keys
    # distribution is roughly even (no salt holds >40% of the rows)
    total = hot.count()
    per = salted.groupBy(SALT).count().collect()
    assert max(r["count"] for r in per) < 0.4 * total


def test_salted_join_requires_salt_src(spark):
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    supp = load_table(spark, SF_DIR, "supplier")
    with pytest.raises(ValueError):
        salted_join(li, supp, "s_suppkey", salt_src=None)


def test_ivf_index_bucket_pruning(spark, tmp_path_factory):
    # The 100 TB ANN serving path: persist the IVF assignment bucketed
    # by cell id; a probe of nprobe cells then reads ONLY those buckets
    # (SelectedBucketsCount in the scan) — partition pruning, not a filter
    import numpy as np

    from mi_inbound_pulsar_spark.operators.similarity import ivf_assign_cells
    from mi_inbound_pulsar_spark.operators.ann_kmeans import train_spherical_kmeans
    from mi_inbound_pulsar_spark.plans.bucketing import write_bucketed

    wh = tmp_path_factory.mktemp("ivfidx")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS ivfidx LOCATION '{wh}'")
    try:
        e = load_table(spark, SF_DIR, "embeddings")
        cents = train_spherical_kmeans(e, k=16, n_iter=2)
        assigned = ivf_assign_cells(e, np.arange(16, dtype=np.int64), cents)
        write_bucketed(assigned, "ivfidx.cells", "cell", n_buckets=16)

        # autoBucketedScan drops the bucketed layout when no operator
        # exploits it; force it so the bucket-pruning path is visible
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        probe = spark.table("ivfidx.cells").filter(F.col("cell").isin(1, 3, 5, 7))
        plan = plan_of(probe)
        assert "SelectedBucketsCount: 4 out of 16" in plan, plan
        # and the probe answer matches the unbucketed filter
        expected = assigned.filter(F.col("cell").isin(1, 3, 5, 7)).count()
        assert probe.count() == expected
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP DATABASE IF EXISTS ivfidx CASCADE")


def test_partition_pruned_scan_reads_only_matching_partitions(spark, tmp_path_factory):
    """Storage-layout pattern: a sink partitioned by a coarse key (here
    event date) lets an equality/IN filter prune at the FILE level —
    the scan lists only matching partition directories (PartitionFilters
    in the plan), which is what makes time-ranged queries on a 100 TB
    events table touch GBs, not the table."""
    out = str(tmp_path_factory.mktemp("parts") / "events_by_day")
    e = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.partitionBy("day").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "2024-01-03")
    plan = plan_of(one_day)
    assert "PartitionFilters: [isnotnull(day" in plan or "PartitionFilters: [(day" in plan, plan
    # correctness: pruned read equals the unpartitioned filter
    expected = e.filter(F.col("day") == "2024-01-03").count()
    assert one_day.count() == expected > 0
    # and the pruned scan reads strictly fewer files than the full scan
    n_days = back.select("day").distinct().count()
    assert n_days > 1
