"""Relational property tests vs DuckDB: random filter/group/top-k shapes
over the orders table — the fuzzed counterpart of the fixed catalog
oracles."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.topk import top_k
from govgis_nov2023_slim_spatial_server_spark.schemas import load_table

SF = "/root/testdata/sf0.001"
STATUSES = ["O", "F", "P"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
    return con


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders").cache()


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    statuses=st.lists(st.sampled_from(STATUSES), min_size=1, max_size=3, unique=True),
    price_min=st.floats(min_value=0, max_value=400_000, allow_nan=False),
    k=st.integers(min_value=1, max_value=20),
    desc=st.booleans(),
)
def test_filter_topk_matches_oracle(spark, ddb, orders, statuses, price_min, k, desc):
    order = [
        F.col("o_totalprice").desc() if desc else F.col("o_totalprice").asc(),
        F.col("o_orderkey").asc(),
    ]
    got = [
        (r["o_orderkey"], round(r["o_totalprice"], 2))
        for r in top_k(
            orders.where(
                F.col("o_orderstatus").isin(statuses) & (F.col("o_totalprice") >= price_min)
            ),
            order,
            k=k,
        ).select("o_orderkey", "o_totalprice").collect()
    ]
    in_list = ", ".join(f"'{s}'" for s in statuses)
    expect = [
        (r[0], round(r[1], 2))
        for r in ddb.execute(
            f"""
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderstatus IN ({in_list}) AND o_totalprice >= {price_min!r}
            ORDER BY o_totalprice {'DESC' if desc else 'ASC'}, o_orderkey
            LIMIT {k}
            """
        ).fetchall()
    ]
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    prio=st.sampled_from(PRIOS),
    year_min=st.integers(min_value=1995, max_value=2001),
)
def test_group_agg_matches_oracle(spark, ddb, orders, prio, year_min):
    got = {
        r["o_orderstatus"]: (r["n"], r["s"])
        for r in orders.where(
            (F.col("o_orderpriority") == prio) & (F.year("o_orderdate") >= year_min)
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect()
    }
    expect = {
        r[0]: (r[1], r[2])
        for r in ddb.execute(
            f"""
            SELECT o_orderstatus, COUNT(*), ROUND(SUM(o_totalprice), 2)
            FROM orders
            WHERE o_orderpriority = '{prio}' AND EXTRACT(year FROM o_orderdate) >= {year_min}
            GROUP BY o_orderstatus
            """
        ).fetchall()
    }
    assert got == expect
