"""Structured Streaming facade over the batch window operators.

The reference is pure request/response batch (SURVEY.md §2.3 — no streaming
surface); the driver's `events` table motivates this optional facade. The
same windowing expressions as operators/windows.py run under ``readStream``
with watermarks for late data. Not oracle-checkable (DuckDB has no
streaming); validated in tests by comparing a stream-over-files run against
the batch operator on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a parquet directory (the test harness feeds
    files incrementally; in production this would be Kafka/queue-backed)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Windowed counts with a watermark bounding state for late data.

    Watermark semantics: events later than ``watermark`` behind the max
    seen ts are dropped and their windows finalized — this is what makes
    unbounded-stream state finite at scale. ``slide`` < duration turns the
    tumbling windows into overlapping sliding windows (each event lands in
    duration/slide windows).
    """
    win = (
        F.window(F.col(ts_col), duration, slide)
        if slide
        else F.window(F.col(ts_col), duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *(keys or []))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(keys or []),
            "n_events",
            "sum_value",
        )
    )


def streaming_session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows (``F.session_window``) — the streaming
    analogue of operators/windows.sessionize."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup — the streaming face of the pipeline's dedup
    surface. ``dropDuplicatesWithinWatermark`` keeps per-key state only
    until the watermark passes (bounded state, the only viable form on an
    unbounded stream); plain ``dropDuplicates`` on a stream would grow
    state forever."""
    w = events.withWatermark(ts_col, watermark)
    if within_watermark:
        return w.dropDuplicatesWithinWatermark(keys)
    return w.dropDuplicates(keys)


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    lookback: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream join: for each left event, right events of
    the same user within ``lookback`` before it.

    Both sides carry watermarks and the join has a bounded time condition —
    the two requirements that let Spark expire join state instead of
    buffering both streams forever (the stream-stream analogue of the batch
    range join in catalog/relational.join_range_events_orders).
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    return l.join(
        r,
        (F.col(f"l.{user_col}") == F.col(f"r.{user_col}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}")),
    ).select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col(f"l.{user_col}").alias("user_id"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_s: int = 60
) -> None:
    """Drive a stream to completion against a finite file source (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
