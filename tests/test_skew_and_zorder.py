import numpy as np
import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.functions.spatial import zorder_key
from govgis_nov2023_slim_spatial_server_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed_df(spark):
    # 90% of rows share one key
    rows = [(("hot" if i % 10 else f"k{i}"), float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "k: string, v: double")


def test_salted_agg_matches_plain(spark, skewed_df):
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in skewed_df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["v_count"], r["v_sum"])
        for r in salted_agg(skewed_df, ["k"], {"v": "count"}).join(
            salted_agg(skewed_df, ["k"], {"v": "sum"}), "k"
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1])


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k11", "K11")], "k: string, label: string"
    )
    plain = skewed_df.join(dim, "k").groupBy("k", "label").count().collect()
    salted = salted_join(skewed_df, dim, "k").groupBy("k", "label").count().collect()
    assert {tuple(r) for r in plain} == {tuple(r) for r in salted}


def test_zorder_locality(spark):
    """Neighboring points must have closer z-keys than far-apart points,
    and sorting by z-key must cluster quadrants."""
    pts = [(i, float(-160 + (i % 9) * 40), float(-80 + (i // 9) * 20)) for i in range(81)]
    df = spark.createDataFrame(pts, "id: long, lon: double, lat: double")
    rows = df.select("id", "lon", "lat", zorder_key(F.col("lon"), F.col("lat")).alias("zk")).collect()
    by_id = {r["id"]: r for r in rows}
    # same quadrant → z-keys agree on high bits more than cross-quadrant
    def hi(z, n=8):
        return z >> (32 - n)

    nw = [r["zk"] for r in rows if r["lon"] < 0 and r["lat"] > 0]
    se = [r["zk"] for r in rows if r["lon"] > 0 and r["lat"] < 0]
    assert len({hi(z, 2) for z in nw}) == 1
    assert len({hi(z, 2) for z in se}) == 1
    assert {hi(z, 2) for z in nw} != {hi(z, 2) for z in se}


def test_zorder_key_deterministic_and_bounded(spark):
    df = spark.createDataFrame([(1, -180.0, -90.0), (2, 180.0, 90.0)], "id: long, lon: double, lat: double")
    rows = {r["id"]: r["zk"] for r in df.select("id", zorder_key(F.col("lon"), F.col("lat")).alias("zk")).collect()}
    assert rows[1] == 0
    assert rows[2] == (1 << 32) - 1  # all 32 bits set
