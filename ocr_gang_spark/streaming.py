"""Structured Streaming surface (beyond the reference — SURVEY §2.7
notes the north_rule needs only batch resumability; this module adds the
streaming analogs a production corpus pipeline wants anyway).

Both jobs read the events table as a *file stream* (one-file micro-
batches via maxFilesPerTrigger, Trigger.AvailableNow) so the tested
path is the real streaming engine with state + watermarks, not a
re-dressed batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts_stream(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str = "stream_counts"
) -> DataFrame:
    """Watermarked 1-hour tumbling-window counts per event_type,
    processed with Trigger.AvailableNow into an in-memory sink.
    Equivalent batch query: groupBy(window(ts, '1 hour'), event_type).
    """
    # the streaming file source wants a directory; events.parquet is a
    # single file, so stream the parent dir with a glob filter
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)


def windowed_event_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch equivalent the streaming result must match exactly."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
