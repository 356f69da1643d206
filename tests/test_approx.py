"""Approximate aggregates: no hash-exact oracle possible, so assert
bounded relative error against the exact answer (the contract that
matters at 100 TB, where the approx versions are the only affordable ones).
"""

import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.schemas import load_table


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06  # 3σ of rsd


def test_approx_percentile_tolerance(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias("approx"),
    ).first()
    assert row["approx"] == pytest.approx(row["exact"], rel=0.02)
