"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship hybrid search (the reference's one query
shape, SURVEY.md §2.2) at sf0.001. `queries()` / `oracle_sql()` expose the
engine's operator catalog (govgis_nov2023_slim_spatial_server_spark.catalog) — one entry per
implemented operator from SURVEY.md §2, each oracle an ANSI-SQL DuckDB
equivalent with matching column names/rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return QUERIES["flagship_hybrid_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only:
    approximate/hash-kernel ops that SQL cannot express)."""
    return dict(ORACLES)
