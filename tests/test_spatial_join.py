"""Grid-blocked overlap join: exactness vs the direct inequality join,
emit-once dedup, and the equi-join plan contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.spatial_join import (
    grid_blocked_overlap_join,
)


@pytest.fixture(scope="module")
def rect_sides(spark):
    rng = np.random.RandomState(17)

    def rects(n, id_name):
        rows = []
        for i in range(n):
            xmin = float(rng.uniform(-10, 10))
            ymin = float(rng.uniform(-10, 10))
            rows.append(
                (
                    i,
                    xmin,
                    ymin,
                    xmin + float(rng.uniform(0.1, 5.0)),
                    ymin + float(rng.uniform(0.1, 5.0)),
                )
            )
        return spark.createDataFrame(
            rows, f"{id_name}: long, xmin: double, ymin: double, xmax: double, ymax: double"
        )

    return rects(80, "lid"), rects(60, "rid")


@pytest.mark.parametrize("cell", [0.7, 1.0, 3.0])
def test_grid_join_matches_direct_join(spark, rect_sides, cell):
    left, right = rect_sides
    got = {
        (r["lid"], r["rid_r"])
        for r in grid_blocked_overlap_join(left, right, cell=cell).collect()
    }
    r2 = right.select([F.col(c).alias(c + "_d") for c in right.columns])
    direct = {
        (r["lid"], r["rid_d"])
        for r in left.join(
            r2,
            (F.col("xmin") <= F.col("xmax_d"))
            & (F.col("xmin_d") <= F.col("xmax"))
            & (F.col("ymin") <= F.col("ymax_d"))
            & (F.col("ymin_d") <= F.col("ymax")),
        ).collect()
    }
    assert got == direct


def test_grid_join_emits_each_pair_once(spark, rect_sides):
    left, right = rect_sides
    out = grid_blocked_overlap_join(left, right, cell=0.5).groupBy("lid", "rid_r").count()
    assert out.agg(F.max("count")).first()[0] == 1


def test_grid_join_plan_is_equijoin(spark, rect_sides):
    left, right = rect_sides
    plan = (
        grid_blocked_overlap_join(left, right, cell=1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)
