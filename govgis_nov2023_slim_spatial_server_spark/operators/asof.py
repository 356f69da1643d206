"""As-of join — the canonical "operator Spark lacks" built from primitives.

For each left row, the most recent right row with ``r.ts <= l.ts`` per key
(time-series enrichment: price as of trade time, signup as of purchase).

Spark has no native ASOF JOIN; the naive formulation (per-left-row
correlated top-1 subquery, or an inequality join + window) shuffles the
full cross product per key. The implementation here is the union-sort
trick, which is both exact and scale-correct:

1. tag and UNION both sides (right rows carry their payload packed into
   ONE struct, left rows a NULL struct),
2. one window sorted by (key, ts, side) — right rows sort before left rows
   at equal ts so ``<=`` is inclusive,
3. ``last(payload_struct, ignorenulls=True)`` over the unbounded-preceding
   frame gives every left row the latest right payload at-or-before it,
4. filter back to left rows and unpack the struct.

The single-struct carry matters for semantics, not just cost: with one
``last(col, ignorenulls)`` per payload column (the r1 shape), a NULL field
in the latest matching right row would be skipped in favor of an older
row's value, and different output columns could come from different right
rows — diverging from pandas ``merge_asof`` / DuckDB ``ASOF JOIN``. The
struct is non-null whenever a right row exists, so NULL payload fields
inside the matched row are preserved as NULLs.

Cost: ONE shuffle of |left|+|right| rows on the key (same as any grouped
op), no join explosion, AQE skew-split applies. This is the composition-of-
existing-operators path (task guidance (a)) — no UDF, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at-or-before
    its timestamp (NULLs when no prior right row exists).

    ``tolerance_seconds`` optionally voids matches older than the window
    (pandas merge_asof semantics).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    left_extra = [c for c in left.columns if c not in (on, ts_col)]
    right_fields = {f.name: f.dataType for f in right.schema.fields}
    left_fields = {f.name: f.dataType for f in left.schema.fields}

    payload_type = StructType(
        [StructField(c, right_fields[c]) for c in right_cols]
        + [StructField("__ts", right_fields[ts_col])]
    )
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        *[F.lit(None).cast(left_fields[c]).alias(c) for c in left_extra],
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(ts_col).alias("__ts"),
        ).alias("__r"),
    )
    union = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = union.select(
        *left.columns,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    ).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col(ts_col).cast("long") - F.col("__m.__ts").cast("long")
            <= tolerance_seconds
        )
        matched = matched.withColumn(
            "__m", F.when(fresh, F.col("__m"))
        )
    return matched.select(
        *left.columns,
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("__m.__ts").alias(f"{ts_col}{suffix}"),
    )
