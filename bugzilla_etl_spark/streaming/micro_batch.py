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
