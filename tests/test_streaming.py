"""Structured Streaming operators vs their batch forms: windowed counts
(watermark + event-time tumbling) and stateful sessionization must agree
with the batch queries over the same events."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mix_blink_spark.streaming.structured import (
    run_to_memory,
    sessionize_stateful,
    stream_events,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("events-stream")
    events = spark.read.parquet(f"{SF}/events.parquet").filter(F.col("event_id") < 3000)
    events.coalesce(3).write.parquet(str(p / "in"))
    return str(p / "in")


def test_windowed_counts_match_batch(spark, events_dir):
    stream = windowed_event_counts(stream_events(spark, events_dir), window="5 minutes")
    run_to_memory(stream, "win_counts", "append")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("win_counts").collect()
    }

    batch = spark.read.parquet(events_dir)
    expected = {
        (r["ws"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            batch.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
            .collect()
        )
    }
    # append mode withholds windows newer than the watermark at end of
    # input; every emitted window must match the batch result exactly
    assert got, "no finalized windows emitted"
    for k, v in got.items():
        assert expected[k] == v
    # and most windows should have finalized over this time range
    assert len(got) >= len(expected) * 0.5


def test_stateful_sessionize_matches_batch(spark, events_dir):
    stream = sessionize_stateful(stream_events(spark, events_dir))
    run_to_memory(stream, "sess", "update")
    # update mode: last row per user wins
    import pandas as pd

    rows = spark.table("sess").collect()
    got = {}
    for r in rows:  # memory sink appends updates in batch order
        got[r["user_id"]] = (r["n_sessions"], r["n_events"])

    batch = spark.read.parquet(events_dir).select(
        "user_id", F.unix_timestamp("ts").alias("secs")
    )
    w = Window.partitionBy("user_id").orderBy("secs")
    prev = F.lag("secs").over(w)
    gap = F.when(prev.isNull() | ((F.col("secs") - prev) > 1800), 1).otherwise(0)
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in (
            batch.withColumn("new_s", gap)
            .groupBy("user_id")
            .agg(
                F.sum("new_s").cast("int").alias("n_sessions"),
                F.count("*").alias("n_events"),
            )
            .collect()
        )
    }
    assert got == expected
