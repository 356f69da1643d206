import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.sketches import (
    bloom_filter,
    bloom_prefilter_join,
    count_min_sketch,
)
from govgis_nov2023_slim_spatial_server_spark.schemas import load_table


def test_count_min_never_undercounts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    sketch = count_min_sketch(e, "event_type", eps=0.001)
    exact = {r["event_type"]: r["n"] for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(exact.values())
    for k, n in exact.items():
        est = sketch.estimate(k)
        assert est >= n  # never undercounts
        assert est <= n + 0.01 * total  # generous eps bound


def test_bloom_no_false_negatives(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    bf = bloom_filter(c, "c_custkey", expected_items=1600, fpp=0.01)
    keys = [r["c_custkey"] for r in c.select("c_custkey").collect()]
    assert all(bf.might_contain(k) for k in keys)  # membership guaranteed
    misses = sum(bf.might_contain(10_000_000 + i) for i in range(1000))
    assert misses < 100  # ~fpp false positives


def test_bloom_prefilter_join_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 20)
    plain = o.join(c, "c_custkey").count()
    filtered = bloom_prefilter_join(o, c, "c_custkey").count()
    assert filtered == plain  # false positives removed by the join → exact
