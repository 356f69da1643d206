"""Time-window aggregations over the events table (batch).

Not in the reference (pure request/response, SURVEY.md §2.3); required by
the driver's `events` fixture. Batch-first so every shape is
DuckDB-oracle-checkable; the streaming facade (streaming/facade.py) reuses
the same expressions under ``readStream``.

Scale notes: tumbling/sliding windows are pure map-side bucketing + one
hash-agg shuffle on (window, keys). Sessionization uses the classic
gap-and-islands form — lag + cumulative sum over (user, ts) — one shuffle
on user_id; at 100 TB the same plan holds as long as a single user's events
fit an executor (true for any sane user cardinality), with AQE skew-split
as the backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def floor_round(col: Column, digits: int = 4) -> Column:
    """Half-up rounding via floor arithmetic: floor(x*10^d + 0.5)/10^d.

    ROUND() resolves exact decimal halves differently per engine (Spark
    half-up on doubles vs DuckDB round-half-even in some paths); floor
    arithmetic is bit-identical on both, so oracle hashes can't diverge
    on tie values. Keep the DuckDB oracle on the same FLOOR form.
    """
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def tumbling_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Fixed windows via native ``F.window`` (epoch-aligned buckets)."""
    aggs = aggs or [
        F.count(F.lit(1)).alias("n_events"),
        floor_round(F.sum("value"), 4).alias("sum_value"),
    ]
    gb = [F.window(F.col(ts_col), duration).alias("w"), *(keys or [])]
    return (
        events.groupBy(*gb)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Overlapping windows — each event lands in duration/slide buckets."""
    aggs = aggs or [
        F.count(F.lit(1)).alias("n_events"),
        floor_round(F.sum("value"), 4).alias("sum_value"),
    ]
    gb = [F.window(F.col(ts_col), duration, slide).alias("w"), *(keys or [])]
    return (
        events.groupBy(*gb)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign session ids by inactivity gap (gap-and-islands).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``; session_id = running count of starts.
    Oracle-expressible with the same window functions in ANSI SQL.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("__new", new_sess).withColumn(
        "session_id",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new")


def session_window_agg(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-session aggregates (count, span, value sum)."""
    s = sessionize(events, gap_minutes, ts_col, user_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        floor_round(F.sum("value"), 4).alias("sum_value"),
    )
