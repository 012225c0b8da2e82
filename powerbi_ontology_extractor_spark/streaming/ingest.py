"""Incremental corpus ingestion with Structured Streaming.

The reference is strictly batch (files in, files out — cli.py:108-157);
the idiomatic Spark counterpart for a continuously-growing artifact
corpus is ``readStream`` over the corpus table + ``foreachBatch``
running the SAME batch pipeline per micro-batch, with
``Trigger.AvailableNow`` for catch-up runs and checkpointing for
exactly-once sink writes.  Because ``build_triples`` is a pure function
of the corpus slice, the streaming path reuses it verbatim — no
separate streaming implementation to keep in sync.

Also included: watermarked windowed aggregation and an
``applyInPandasWithState`` gap-sessionizer over the events table, the
two standard stateful shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from powerbi_ontology_extractor_spark.sources.corpus import CORPUS_SCHEMA


def stream_corpus(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet corpus directory (fixed schema —
    streaming sources cannot infer)."""
    return spark.readStream.schema(CORPUS_SCHEMA).parquet(path)


def incremental_triples(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """corpus stream → triples parquet, one batch-pipeline run per
    micro-batch.  Returns the StreamingQuery (caller awaits)."""
    from powerbi_ontology_extractor_spark.pipeline import build_triples

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            build_triples(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data handled by the
    watermark); works on both batch and streaming inputs."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("status", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _sessionize(key, pdfs, state: GroupState):
    """Gap-based sessionizer: events within ``gap`` of each other join a
    session; a timeout closes it."""
    import pandas as pd

    gap_ms = 30 * 60 * 1000
    if state.hasTimedOut:
        start_ms, last_ms, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(last_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
                "status": ["closed"],
            }
        )
        return

    rows = pd.concat(list(pdfs))
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).sort_values()
    values = rows["value"].fillna(0.0)
    if state.exists:
        start_ms, last_ms, n, total = state.get
    else:
        start_ms, last_ms, n, total = int(ts_ms.iloc[0]), int(ts_ms.iloc[0]), 0, 0.0
    closed = []
    for t, v in zip(ts_ms, values.loc[ts_ms.index]):
        if t - last_ms > gap_ms and n > 0:
            closed.append((start_ms, last_ms, n, total))
            start_ms, n, total = int(t), 0, 0.0
        last_ms = int(t)
        n += 1
        total += float(v)
    state.update((start_ms, last_ms, n, total))
    state.setTimeoutDuration(gap_ms)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
                "status": ["closed"] * len(closed),
            }
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: applyInPandasWithState gap sessions.
    (Streaming-only — batch inputs should use a window/lag sessionizer.)
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


_EVENT_STATE_SCHEMA = StructType(
    [
        StructField("ts_ms", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _make_event_time_sessionizer(gap_ms: int):
    def sessionize(key, pdfs, state: GroupState):
        import pandas as pd

        def emit(ts_list, val_list):
            # watermark has passed last+gap: EVERY buffered event belongs
            # to a closed session — sort by event time, split at gaps
            order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
            sessions = []
            start = last = ts_list[order[0]]
            n, total = 0, 0.0
            for i in order:
                t, v = ts_list[i], val_list[i]
                if t - last > gap_ms and n > 0:
                    sessions.append((start, last, n, total))
                    start, n, total = t, 0, 0.0
                last = t
                n += 1
                total += float(v)
            sessions.append((start, last, n, total))
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": [
                        pd.Timestamp(s[0], unit="ms") for s in sessions
                    ],
                    "session_end": [
                        pd.Timestamp(s[1], unit="ms") for s in sessions
                    ],
                    "n_events": [s[2] for s in sessions],
                    "total_value": [s[3] for s in sessions],
                    "status": ["closed"] * len(sessions),
                }
            )

        if state.hasTimedOut:
            ts_list, val_list = state.get
            state.remove()
            yield emit(list(ts_list), list(val_list))
            return

        rows = pd.concat(list(pdfs))
        new_ts = (rows["ts"].astype("int64") // 1_000_000).tolist()
        new_vals = rows["value"].fillna(0.0).astype("float64").tolist()
        if state.exists:
            ts_list, val_list = state.get
            ts_list = list(ts_list) + new_ts
            val_list = list(val_list) + new_vals
        else:
            ts_list, val_list = new_ts, new_vals
        state.update((ts_list, val_list))
        # close when the WATERMARK (event time, not wall-clock) passes
        # the last buffered event + gap — replay-stable under load,
        # unlike ProcessingTimeTimeout; must be strictly beyond the
        # current watermark or Spark rejects the timestamp
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max(ts_list) + gap_ms, wm + 1))

    return sessionize


def sessionize_stream_event_time(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "24 hours",
) -> DataFrame:
    """Event-time gap sessionizer: EventTimeTimeout + watermark.

    ProcessingTimeTimeout (sessionize_stream) closes sessions by
    wall-clock, so replaying the same corpus under different load gives
    different session boundaries.  Here events buffer in state (two
    parallel arrays — bounded by the watermark horizon: events older
    than the watermark are dropped at the source, and state is evicted
    the moment the watermark passes last_event + gap) and a session
    closes only when the WATERMARK passes its last event + gap.  On
    timeout the buffered events are sorted by event time and split at
    gaps, so arrival order across micro-batches — the thing a loaded
    cluster scrambles — cannot change the emitted sessions.  The batch
    twin (sessionize_batch) is the oracle; parity is pinned under a
    shuffled-arrival replay in tests/test_streaming_manifest.py.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_event_time_sessionizer(gap_minutes * 60 * 1000),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_EVENT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch-equivalent gap sessionizer (lag + cumulative sum — the
    oracle for the streaming operator and a useful operator by itself).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lag("ts").over(w)
    new_session = (
        F.when(gap.isNull(), 1)
        .when(
            F.unix_timestamp("ts") - F.unix_timestamp(gap) > gap_minutes * 60, 1
        )
        .otherwise(0)
    )
    sessioned = events.withColumn(
        "session_id", F.sum(new_session).over(w)
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
