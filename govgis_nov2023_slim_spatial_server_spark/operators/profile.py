"""Column profiling — the data-quality pass an ingest pipeline runs before
trusting a new 100 TB drop: per-column null counts, distinct counts, and
min/max, computed in ONE scan.

Shape: a single aggregate produces every statistic as columns of one row
(map-side partial aggregation; COUNT(DISTINCT) expands via Spark's standard
multi-distinct rewrite), then an explode unpivots that row to one output row
per profiled column. The unpivot touches one row, so the whole operator
costs exactly one pass over the table regardless of how many columns are
profiled — never the one-agg-per-column UNION that rescans per column.

min/max are emitted as strings so heterogeneous column types share one
schema; profile only exactly-stringifiable types (integers, strings, dates)
when cross-engine comparison matters — float formatting differs between
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: (col, n_rows, n_nonnull, n_distinct, min_v, max_v)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__nn_{c}").alias("n_nonnull"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    F.col(f"__mn_{c}").alias("min_v"),
                    F.col(f"__mx_{c}").alias("max_v"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select(per_col).select("p.*")
