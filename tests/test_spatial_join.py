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


# -- exact polygon×polygon refine (spatial_join_exact's geometry core) ------


def _poly(rings):
    from govgis_nov2023_slim_spatial_server_spark.functions.spatial import wkb_polygon

    return wkb_polygon(rings)


def _closed(pts):
    return pts + [pts[0]]


def test_bbox_overlaps_but_polygons_do_not():
    """The case the bbox join alone gets wrong: an L-shape and a square
    tucked into its notch — bboxes overlap, polygons are disjoint."""
    from govgis_nov2023_slim_spatial_server_spark.functions.spatial import (
        polygons_intersect_wkb,
        wkb_bounds,
    )

    l_shape = _poly(
        [_closed([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)])]
    )
    notch_square = _poly([_closed([(2, 2), (3, 2), (3, 3), (2, 3)])])
    la, lb = wkb_bounds(l_shape), wkb_bounds(notch_square)
    # bboxes DO overlap ...
    assert la[0] <= lb[2] and lb[0] <= la[2]
    assert la[1] <= lb[3] and lb[1] <= la[3]
    # ... polygons do NOT
    assert not polygons_intersect_wkb(l_shape, notch_square)
    # pull the square out of the notch so it straddles the L's arm
    crossing = _poly([_closed([(0.5, 0.5), (3, 0.5), (3, 3), (0.5, 3)])])
    assert polygons_intersect_wkb(l_shape, crossing)


def test_polygon_inside_hole_is_disjoint():
    from govgis_nov2023_slim_spatial_server_spark.functions.spatial import (
        polygons_intersect_wkb,
    )

    donut = _poly(
        [
            _closed([(0, 0), (10, 0), (10, 10), (0, 10)]),
            _closed([(3, 3), (7, 3), (7, 7), (3, 7)]),  # hole
        ]
    )
    in_hole = _poly([_closed([(4, 4), (6, 4), (6, 6), (4, 6)])])
    assert not polygons_intersect_wkb(donut, in_hole)
    # but one poking through the hole wall intersects
    poking = _poly([_closed([(4, 4), (8, 4), (8, 6), (4, 6)])])
    assert polygons_intersect_wkb(donut, poking)
    # and the hole ring itself still leaves the annulus solid
    on_ring = _poly([_closed([(1, 1), (2, 1), (2, 2), (1, 2)])])
    assert polygons_intersect_wkb(donut, on_ring)


def test_containment_and_touching_count_as_intersect():
    from govgis_nov2023_slim_spatial_server_spark.functions.spatial import (
        polygons_intersect_wkb,
    )

    big = _poly([_closed([(0, 0), (10, 0), (10, 10), (0, 10)])])
    inner = _poly([_closed([(4, 4), (5, 4), (5, 5), (4, 5)])])
    assert polygons_intersect_wkb(big, inner)  # containment, no edge cross
    assert polygons_intersect_wkb(inner, big)  # symmetric
    edge_touch = _poly([_closed([(10, 2), (12, 2), (12, 4), (10, 4)])])
    assert polygons_intersect_wkb(big, edge_touch)  # shared edge segment
    corner_touch = _poly([_closed([(10, 10), (11, 10), (11, 11), (10, 11)])])
    assert polygons_intersect_wkb(big, corner_touch)  # single shared vertex
    disjoint = _poly([_closed([(20, 20), (21, 20), (21, 21), (20, 21)])])
    assert not polygons_intersect_wkb(big, disjoint)


def test_spatial_join_exact_refine_runs_after_blocked_join(spark, sf_dir):
    from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES

    df = QUERIES["spatial_join_exact"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # coarse join must be the blocked equi-join, never a nested loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pandas refine is present (ArrowEvalPython) and there are rows
    assert "ArrowEvalPython" in plan
    assert df.count() > 0
