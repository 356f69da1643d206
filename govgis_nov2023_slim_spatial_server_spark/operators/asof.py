"""As-of join — the canonical "operator Spark lacks" built from primitives.

For each left row, the most recent right row with ``r.ts <= l.ts`` per key
(time-series enrichment: price as of trade time, signup as of purchase).

Spark has no native ASOF JOIN; the naive formulation (per-left-row
correlated top-1 subquery, or an inequality join + window) shuffles the
full cross product per key. The implementation here is the union-sort
trick, which is both exact and scale-correct:

1. tag and UNION both sides (right rows carry their payload, left rows
   NULL),
2. one window sorted by (key, ts, side) — right rows sort before left rows
   at equal ts so ``<=`` is inclusive,
3. ``last(payload, ignorenulls=True)`` over the unbounded-preceding frame
   gives every left row the latest right payload at-or-before it,
4. filter back to left rows.

Cost: ONE shuffle of |left|+|right| rows on the key (same as any grouped
op), no join explosion, AQE skew-split applies. This is the composition-of-
existing-operators path (task guidance (a)) — no UDF, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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

    l_tagged = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tagged = l_tagged.withColumn("__r_ts", F.lit(None).cast("timestamp"))

    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    # align schemas: left keeps all its columns; right fills them with NULL
    for c in left.columns:
        if c not in (on, ts_col):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    union = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = union.select(
        *left.columns,
        "__side",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in right_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
    )
    out = filled.where(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        fresh = (
            F.col(ts_col).cast("long") - F.col(f"{ts_col}{suffix}").cast("long")
            <= tolerance_seconds
        )
        for c in right_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.when(fresh, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(f"{ts_col}{suffix}", F.when(fresh, F.col(f"{ts_col}{suffix}")))
    return out
