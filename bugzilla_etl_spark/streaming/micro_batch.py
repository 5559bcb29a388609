"""Structured-streaming front end for the engine.

The reference has no streaming engine — its "incremental" is cron +
watermark + re-run (SURVEY §2.10). This module shows the engine's
operators composing with Structured Streaming where a modern deployment
would want it:

- ``stream_event_counts``: watermarked windowed aggregation over an
  events stream (the canonical late-data-tolerant rollup);
- ``stream_index_updates``: foreachBatch micro-batch ingestion — each
  batch of new docs becomes an immutable index segment via
  ``incremental_update`` (exactly the at-least-once + idempotent-doc-id
  contract the reference's watermark loop provides, SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_event_counts(stream: DataFrame) -> DataFrame:
    """Watermarked 5-minute windowed counts per event type."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def stream_index_updates(
    spark: SparkSession, stream: DataFrame, index_dir: str
):
    """writeStream.foreachBatch -> incremental_update per micro-batch.

    Content-addressed doc ids make replayed batches no-ops, so
    at-least-once delivery composes safely with the segment model."""
    from ..index import incremental_update

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_update(spark, batch_df, index_dir)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", index_dir + "/_stream_checkpoint")
    )


SESSION_GAP_MS = 1_800_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def stream_sessionize(stream: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the Spark primitive for stateful logic
    the built-in windows can't express). The open session lives in
    per-key GroupState across micro-batches; a session CLOSES when a
    later event arrives past the gap, or when the event-time watermark
    passes the state timeout (last_event + gap). The batch analog is
    ``w_sessionize`` (operators/relational.py) — same gap semantics.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return
        ts = []
        for pdf in pdfs:
            ts.append(pdf["ts_ms"])
        ts = pd.concat(ts).sort_values().to_numpy()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed_rows = []
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:
                closed_rows.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                # out-of-order arrival across micro-batches (still inside
                # the watermark): t can be < last or even < start; session
                # bounds only ever widen, so session_end never regresses
                # and a later event can't wrongly split the session —
                # matching the batch w_sessionize fold over sorted events
                start, last, n = min(start, t), max(last, t), n + 1
        state.update((int(start), int(last), int(n)))
        state.setTimeoutTimestamp(int(last) + gap_ms)
        yield pd.DataFrame(
            closed_rows,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    withts = stream.withColumn(
        "ts_ms", F.unix_millis(F.col("ts").cast("timestamp"))
    ).withWatermark("ts", "10 minutes")
    return withts.select("ts", "user_id", "ts_ms").groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_version_upserts(
    spark: SparkSession,
    eav_stream: DataFrame,
    index_dir: str,
    aliases: dict[str, str] | None = None,
):
    """Streaming composition of the reference's WHOLE pipeline: a stream
    of change-event EAV rows -> per-micro-batch history replay
    (incremental re-emission for the batch's bugs) -> overwrite-by-id
    upsert into the version index (plans/replay_index.upsert_versions).

    Each micro-batch replays ONLY the bugs it touches (a broadcast-size
    semi-join keys the full event log down to the affected groups would
    be the cluster form; here the batch IS the affected set — the stream
    carries the full per-bug event window, the at-least-once analog of
    the reference re-scanning bugs whose delta_ts moved,
    run_incremental_update.kjb). Deterministic version doc ids make
    redelivered batches no-ops; a new event for an open bug re-emits the
    closed predecessor version, whose stale open interval the upsert
    overwrites — the exact ES-upsert contract (SURVEY §3.2).
    """
    from ..operators.replay import replay_history
    from ..plans.replay_index import upsert_versions

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = replay_history(batch_df, aliases=aliases)
        upsert_versions(spark, versions, index_dir)

    return (
        eav_stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", index_dir + "/_stream_checkpoint")
    )
