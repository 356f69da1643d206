import numpy as np
import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.grouped_vector import grouped_centroids
from govgis_nov2023_slim_spatial_server_spark.schemas import load_table
from govgis_nov2023_slim_spatial_server_spark.sources.formats import write_bucketed_table


def test_grouped_centroids_match_posexplode(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    grouped = {r["label"]: (r["centroid"], r["n_vecs"]) for r in grouped_centroids(e).collect()}
    exploded = (
        e.select("label", F.posexplode("embedding"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("col").cast("double")).alias("v"))
        .collect()
    )
    expect: dict = {}
    for r in exploded:
        expect.setdefault(r["label"], {})[r["pos"]] = r["v"]
    assert set(grouped) == set(expect)
    for label, (centroid, n) in grouped.items():
        for pos, v in expect[label].items():
            assert centroid[pos] == pytest.approx(v, abs=1e-9)


def test_bucketed_table_join_avoids_shuffle(spark, sf_dir):
    """Bucketing both join sides on the key removes the Exchange under the
    join — the co-located-join contract write_bucketed_table exists for."""
    import shutil

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a fresh in-memory catalog doesn't know about files a previous
        # session left in the warehouse — clear the location too
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed_table(o, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed_table(
        c.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", ["o_custkey"], num_buckets=8
    )
    joined = (
        spark.table("b_orders")
        .join(spark.table("b_customer").hint("merge"), "o_custkey")
        .select("o_orderkey", "c_name")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # both sides pre-bucketed → no shuffle
    assert joined.count() > 0
