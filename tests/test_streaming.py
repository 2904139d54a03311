"""Streaming tests: file-source micro-batches drained with availableNow,
compared against the batch twin of the same transformation."""

import shutil

import pytest

from cypher_for_apache_flink_spark.sources.tpch import read_events
from cypher_for_apache_flink_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    running_user_totals,
    sessionized_counts,
    windowed_event_counts,
)

TMP = "/root/repo/.tmp_test_stream"


@pytest.fixture(scope="module")
def event_dir(spark):
    """Stage the sf0.001 events as a 3-file landing zone (3 micro-batches)."""
    shutil.rmtree(TMP, ignore_errors=True)
    events = read_events(spark, "/root/testdata/sf0.001")
    events.repartition(3).write.parquet(TMP)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def bag(rows):
    from collections import Counter
    return Counter(tuple(r) for r in rows)


def test_windowed_counts_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    run_to_memory(windowed_event_counts(stream), "win_counts", "complete")
    got = spark.table("win_counts").collect()

    batch = windowed_event_counts(spark.read.parquet(event_dir))
    want = batch.collect()
    assert bag(got) == bag(want)
    assert len(got) > 0


def test_sessionized_counts_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    run_to_memory(sessionized_counts(stream, gap="45 minutes"),
                  "sess_counts", "complete")
    got = spark.table("sess_counts").collect()
    want = sessionized_counts(spark.read.parquet(event_dir),
                              gap="45 minutes").collect()
    assert bag(got) == bag(want)


def test_running_user_totals_stateful(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    run_to_memory(running_user_totals(stream), "user_totals", "update")
    # update mode re-emits per micro-batch: the LAST emit per user must equal
    # the batch aggregate
    import pyspark.sql.functions as F
    got = (spark.table("user_totals")
           .groupBy("user_id").agg(F.max("n_events").alias("n_events"))
           .collect())
    want = (spark.read.parquet(event_dir)
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
            .collect())
    assert bag(got) == bag(want)
