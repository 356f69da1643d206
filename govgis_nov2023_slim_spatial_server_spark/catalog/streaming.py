"""Structured Streaming catalog entry.

Streaming was pytest-only in r1 (stream-vs-batch parity tests). This entry
puts a REAL streaming execution behind the driver's correctness gate: a
file-source stream over the events parquet, watermarked tumbling windows,
``availableNow`` trigger draining to a memory sink. availableNow processes
every available file then stops, so the run is finite and deterministic —
which is exactly why this one streaming shape CAN carry a SQL oracle (the
complete-mode result equals the batch GROUP BY over the same input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.facade import streaming_tumbling_counts
from ._registry import query

_SINK_SEQ = [0]


@query(
    "stream_tumbling_event_counts",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts computed BY THE STREAMING ENGINE
    (readStream → withWatermark → window agg → availableNow drain), then
    compared against the plain batch SQL the oracle runs. Proves the
    streaming plan computes the same answer as batch on a bounded input —
    Structured Streaming's core contract."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = src.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    agg = streaming_tumbling_counts(
        ev, duration="1 hour", watermark="2 hours", keys=["event_type"]
    )
    _SINK_SEQ[0] += 1
    name = f"__stream_tumbling_counts_{_SINK_SEQ[0]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )
