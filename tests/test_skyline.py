"""operators/skyline.py mechanism tests: the anti-chain regime is real
(plain local prune passes everything on the clustered layout), the
recursion rounds actually shrink it, and the output is the exact brute
force frontier either way."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.skyline import (
    local_prune,
    recursive_skyline,
    skyline,
)


def _points(spark, n=600):
    """The skyline_recursive_parts construction: band = k%3, cost =
    (7k)%100, benefit = 1000·band + cost — each band a pure anti-chain,
    band 2 dominating bands 0-1 point-for-point."""
    return spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7) % 100).cast("long").alias("cost"),
        ((F.col("id") % 3) * 1000 + (F.col("id") * 7) % 100)
        .cast("long")
        .alias("benefit"),
        (F.col("id") % 3).alias("band"),
    )


def _brute_frontier(pdf: pd.DataFrame) -> set:
    out = set()
    rows = list(pdf.itertuples(index=False))
    for p in rows:
        dominated = any(
            q.cost <= p.cost
            and q.benefit >= p.benefit
            and (q.cost < p.cost or q.benefit > p.benefit)
            for q in rows
        )
        if not dominated:
            out.add(p.k)
    return out


def test_anti_chain_layout_defeats_plain_local_prune(spark):
    """On the band-clustered layout every partition is an anti-chain, so
    the exchange-free local prune keeps EVERY row — the documented worst
    case this operator exists to mitigate."""
    clustered = _points(spark).repartitionByRange(3, "band").drop("band")
    assert local_prune(clustered, "cost", "benefit", "k").count() == 600


def test_recursive_rounds_shrink_the_anti_chain_layout(spark):
    """One re-hash round mixes bands and must kill the dominated
    two-thirds before the global sweep."""
    clustered = _points(spark).repartitionByRange(3, "band").drop("band")
    first = local_prune(clustered, "cost", "benefit", "k").localCheckpoint()
    rehashed = local_prune(
        first.repartition(spark.sparkContext.defaultParallelism),
        "cost",
        "benefit",
        "k",
    )
    assert rehashed.count() < 600  # mixing restores cross-band kills


def test_recursive_skyline_is_exact_on_both_layouts(spark):
    pts = _points(spark)
    want = _brute_frontier(pts.toPandas())
    for df in (
        pts.repartitionByRange(3, "band").drop("band"),  # adversarial
        pts.drop("band").repartition(8),  # benign hash layout
    ):
        got = {
            r["k"]
            for r in recursive_skyline(
                df, "cost", "benefit", "k", fit_rows=50, max_rounds=3
            ).collect()
        }
        assert got == want


def test_skyline_plain_matches_recursive(spark):
    pts = _points(spark).drop("band")
    a = {r["k"] for r in skyline(pts, "cost", "benefit", "k").collect()}
    b = {
        r["k"]
        for r in recursive_skyline(pts, "cost", "benefit", "k").collect()
    }
    assert a == b
