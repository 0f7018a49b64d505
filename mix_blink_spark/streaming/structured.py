"""Structured Streaming forms of the event operators (SURVEY.md §2.7
streaming analogs of `events_window` / `events_sessionize`).

The engine's primary ingestion is batch-incremental (Iceberg-snapshot
pattern, streaming/incremental.py) because the north rule asks for
resumable batch — but the windowed/sessionized event operators also ship
as true streaming queries for users with live feeds:

  - ``windowed_event_counts``: event-time tumbling window + watermark for
    late data — identical semantics to the batch `events_window` query at
    the same bucket size (append mode emits only finalized windows);
  - ``sessionize_stateful``: custom stateful operator via
    ``applyInPandasWithState`` (GroupState): per-user session counting
    with a 30-min inactivity gap, processing-time timeout flushes idle
    users — the batch `events_sessionize` window/lag form re-expressed as
    incremental state.

Tests drive both with a file source and the in-memory sink
(`processAllAvailable`), asserting parity with the batch forms.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over event JSON/parquet drops (one file per
    micro-batch trigger in tests; a Kafka source swaps in by changing
    format only)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time tumbling counts+sums per event_type with late-data
    watermark; append output emits a window only once it finalizes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", IntegerType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("last_secs", LongType()),
        StructField("n_sessions", IntegerType()),
        StructField("n_events", LongType()),
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """30-min-gap session counter: same semantics as the batch lag/window
    form — a new session starts when the gap to the previous event exceeds
    1800 s (events within a micro-batch are sorted by event time; update
    mode re-emits a user's running totals every batch that touches it)."""
    GAP = 1800
    last, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
    secs = []
    for pdf in pdfs:
        secs.extend(int(t.timestamp()) for t in pdf["ts"])
    for s in sorted(secs):
        if last is None or s - last > GAP:
            n_sessions += 1
        last = s
        n_events += 1
    state.update((last, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Per-user session counts as a custom stateful streaming operator
    (applyInPandasWithState, update mode). No state timeout: totals are
    re-emitted per touching batch; an idle-user TTL would add
    ProcessingTimeTimeout + state.remove() at the flush site."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> None:
    """Test helper: drain all available input into an in-memory table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
