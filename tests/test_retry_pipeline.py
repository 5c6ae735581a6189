"""K5/K6/K7 integration: per-record retry/redelivery/DLQ over a live
streaming query (the reference's at-least-once + nack + DLQ contract,
rebuilt on micro-batches)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.config import DeadLetterPolicy
from mi_inbound_pulsar_spark.sources.pulsar_source import simulated_message_frame, simulated_stream
from mi_inbound_pulsar_spark.streaming.delivery import RetryingPipeline


def test_flaky_records_retry_until_success_poison_goes_to_dlq(spark, sf_dir):
    staging = tempfile.mkdtemp(prefix="retry_int_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=3)
    total = simulated_message_frame(spark, sf_dir).count()

    attempts: dict[str, int] = {}
    processed: list[str] = []

    def process(rows) -> list[str]:
        failed = []
        for r in rows:
            mid = r["message_id"]
            n = attempts.get(mid, 0) + 1
            attempts[mid] = n
            mid_i = int(mid)
            if mid_i % 100 == 7 and n <= 2:
                failed.append(mid)  # flaky: succeeds on 3rd attempt
            elif mid_i % 100 == 13:
                failed.append(mid)  # poison: always fails
            else:
                processed.append(mid)
        return failed

    pipe = RetryingPipeline(process, DeadLetterPolicy(max_redeliveries=3), nack_delay_ms=0)
    q = stream.writeStream.foreachBatch(pipe).start()
    q.processAllAvailable()
    q.stop()
    # drain remaining redeliveries (stream ended; drive the pipe directly)
    for _ in range(6):
        pipe([], epoch_id=-1)

    poison = {r["message_id"] for r in simulated_message_frame(spark, sf_dir)
              .filter(F.col("message_id").cast("long") % 100 == 13).collect()}
    flaky = {r["message_id"] for r in simulated_message_frame(spark, sf_dir)
             .filter(F.col("message_id").cast("long") % 100 == 7).collect()}

    # every flaky record eventually processed (3 attempts each)
    assert flaky <= set(processed)
    assert all(attempts[m] == 3 for m in flaky)
    # every poison record hit the DLQ after exactly max_redeliveries
    dead_ids = {r["message_id"] for r in pipe.dead_letters}
    assert dead_ids == poison
    assert all(attempts[m] == 3 for m in poison)
    # nothing processed twice, nothing lost
    assert len(processed) == len(set(processed)) == total - len(poison)
    assert pipe.pending_ids() == []


def test_nack_delay_defers_redelivery():
    pipe = RetryingPipeline(
        lambda rows: [r["message_id"] for r in rows],  # everything fails
        DeadLetterPolicy(max_redeliveries=10),
        nack_delay_ms=60_000,
    )
    from mi_inbound_pulsar_spark.streaming.delivery import _DictRow

    pipe([_DictRow({"message_id": "1", "redelivery_count": 0})], 0, now=1000.0)
    assert pipe.pending_ids() == ["1"]
    # K5: before the delay elapses the record is NOT redelivered
    seen: list[str] = []

    def recording_process(rows):
        seen.extend(r["message_id"] for r in rows)
        return []  # succeed this time

    pipe.process = recording_process
    pipe([], 1, now=1030.0)
    assert seen == []
    pipe([], 2, now=1061.0)  # delay elapsed → redelivered
    assert seen == ["1"]
    assert pipe.pending_ids() == []
