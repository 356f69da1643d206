"""File-format connectors beyond parquet.

The reference reads exactly one format (GeoParquet, reference
backend/load_data.py:176) and writes Postgres via COPY. A general engine
needs CSV/JSON/NDJSON ingestion with explicit schemas — schema inference
is a full extra pass over the data, unaffordable at 100 TB, so every
reader here takes (or derives) a schema and inference is opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # opt-in: extra pass
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
    **options,
) -> DataFrame:
    reader = spark.read.option("multiLine", str(multiline).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (built into Spark — no extra jars): same columnar
    pushdown/pruning class as parquet, the common interchange format in
    Hive-lineage warehouses. Arrays, structs, and binary round-trip."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout → partition pruning on read: a filter
    on a partition column skips whole directories (the coarsest and
    cheapest pruning tier at 100 TB)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **options,
) -> None:
    """JDBC sink — the Spark analogue of the reference's bulk COPY into
    Postgres (reference backend/load_data.py:183-190,
    ``copy_records_to_table``).

    Every partition opens one connection and writes ``batchsize``-row
    batches (`rewriteBatchedInserts`-style throughput), so total write
    parallelism = number of partitions; cap it with ``num_partitions`` to
    respect the database's connection budget — 1000 executors hammering one
    Postgres is a DDoS, not a load. Requires the JDBC driver jar on the
    Spark classpath (``spark.jars``); config assembly is testable without a
    live database, the terminal ``save()`` is not.
    """
    jdbc_writer(df, url, table, mode=mode, batchsize=batchsize,
                num_partitions=num_partitions, **options).save()


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **options,
):
    """Configured-but-unsaved JDBC writer (the testable seam — asserting
    the plumbing reaches Spark's JDBC path needs no live database)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on the bucket key skip the
    shuffle entirely (co-located join). The write pays one shuffle once;
    every subsequent join on the key reads pre-partitioned data."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def upsert_partitioned_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> None:
    """Keep-latest upsert into a partitioned parquet store — the daily-
    incremental MERGE pattern without a table format: rows whose key already
    exists are replaced iff the update's ``order_col`` is newer; new keys
    append.

    Scale shape: only the partitions the update batch TOUCHES are read back
    and rewritten (partition pruning on the read, dynamic partition
    overwrite on the write) — a day's increment against a 100 TB store costs
    O(touched partitions), not O(store). The keep-latest winner is decided
    by a window over (key) ordered by (order_col DESC, source DESC) with
    updates preferred on ties — deterministic for idempotent re-runs.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    upd = updates.withColumn("__src", F.lit(1))
    try:
        existing = (
            spark.read.parquet(path)
            .where(F.col(partition_col).isin(touched))
            .withColumn("__src", F.lit(0))
        )
        merged = existing.unionByName(upd)
    except Exception:  # first load: store doesn't exist yet
        merged = upd
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    winners = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    # localCheckpoint: the plan reads the same path it overwrites — cut the
    # lineage so the write doesn't scan files it is replacing
    winners.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)
