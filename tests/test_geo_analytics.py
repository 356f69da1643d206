"""Geometry-analytics layer (catalog/geo_analytics.py + the shoelace
area/centroid primitive in functions/spatial.py).

Three proof obligations:
1. Known-shape fixtures: square, L-shape, donut (holes), MULTIPOLYGON,
   orientation flips, degenerate inputs — closed-form answers.
2. Exact-arithmetic property: on random integer-grid polygons the float64
   shoelace must equal a Fraction reference EXACTLY (every term is a small
   dyadic rational — the contract the DuckDB oracle entries stand on).
3. Lattice margin audits: the libm-crossing entries (mercator tile-y,
   haversine radius cuts) emit only discrete outputs, valid because no
   achievable lattice value sits within 1e-6 of a decision boundary —
   proven here by enumerating the ENTIRE coordinate lattice (the stores
   derive coordinates from key MODULOS, so the lattice is finite and
   data-independent: any custkey set, including the property harness's
   random databases, lands on it).
"""

from __future__ import annotations

import math
import struct
from fractions import Fraction

import numpy as np
import pytest

from govgis_nov2023_slim_spatial_server_spark.functions.spatial import (
    parse_wkb_polygons,
    polygons_area_centroid,
    wkb_area_centroid,
    wkb_point,
    wkb_polygon,
)

# ---------------------------------------------------------------------------
# 1. Known-shape fixtures
# ---------------------------------------------------------------------------


def _polys(wkb):
    return parse_wkb_polygons(wkb)


def test_unit_square_area_centroid():
    w = wkb_polygon([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]])
    assert wkb_area_centroid(w) == (1.0, 0.5, 0.5)


def test_orientation_invariance_shell():
    ccw = wkb_polygon([[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]])
    cw = wkb_polygon([[(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0)]])
    assert wkb_area_centroid(ccw) == wkb_area_centroid(cw) == (4.0, 1.0, 1.0)


def test_l_shape_closed_form():
    # full 2x2 square minus its top-right 1x1 quadrant: A=3, cx=cy=5/6
    w = wkb_polygon(
        [[(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0)]]
    )
    area, cx, cy = wkb_area_centroid(w)
    assert area == 3.0
    # exact: numerators/denominators are exact dyadics, one IEEE division
    assert cx == 5.0 / 6.0 and cy == 5.0 / 6.0


def test_donut_hole_subtracted_any_winding():
    shell = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    hole_ccw = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]
    hole_cw = list(reversed(hole_ccw))
    for hole in (hole_ccw, hole_cw):
        area, cx, cy = wkb_area_centroid(wkb_polygon([shell, hole]))
        assert area == 12.0  # 16 − 4, regardless of hole winding
        assert (cx, cy) == (2.0, 2.0)  # symmetric: hole centered in shell


def test_multipolygon_sums_members():
    # two unit squares at x∈[0,1] and x∈[10,11]: A=2, cx=(0.5+10.5)/2
    pa = wkb_polygon([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]])
    pb = wkb_polygon([[(10.0, 0.0), (11.0, 0.0), (11.0, 1.0), (10.0, 1.0)]])
    multi = struct.pack("<BII", 1, 6, 2) + pa + pb
    assert wkb_area_centroid(multi) == (2.0, 5.5, 0.5)


def test_degenerate_inputs():
    assert wkb_area_centroid(None) == (None, None, None)
    assert wkb_area_centroid(b"\x01\x03garbage") == (None, None, None)
    assert wkb_area_centroid(wkb_point(3.0, 4.0)) == (0.0, None, None)
    # zero-area spike ring (closed, 4 points, no interior)
    spike = wkb_polygon([[(0.0, 0.0), (2.0, 2.0), (0.0, 0.0)]])
    assert wkb_area_centroid(spike) == (0.0, None, None)
    # empty polygon (zero rings)
    empty = struct.pack("<BII", 1, 3, 0)
    assert wkb_area_centroid(empty) == (0.0, None, None)


# ---------------------------------------------------------------------------
# 2. Exact Fraction reference on random integer polygons
# ---------------------------------------------------------------------------


def _ref_area_centroid(polys):
    """Fraction-exact mirror of polygons_area_centroid's algorithm."""
    a2t, sxt, syt = Fraction(0), Fraction(0), Fraction(0)
    for rings in polys:
        for i, ring in enumerate(rings):
            if len(ring) < 4 or ring[0] != ring[-1]:
                continue
            a2, sx, sy = Fraction(0), Fraction(0), Fraction(0)
            for (x, y), (x1, y1) in zip(ring[:-1], ring[1:]):
                cross = Fraction(x) * Fraction(y1) - Fraction(x1) * Fraction(y)
                a2 += cross
                sx += (Fraction(x) + Fraction(x1)) * cross
                sy += (Fraction(y) + Fraction(y1)) * cross
            if (a2 < 0) == (i == 0):
                a2, sx, sy = -a2, -sx, -sy
            a2t += a2
            sxt += sx
            syt += sy
    if a2t == 0:
        return 0.0, None, None
    return float(a2t / 2), float(sxt / (3 * a2t)), float(syt / (3 * a2t))


def _gen_ring(rng, cx, cy, r):
    k = int(rng.randint(3, 9))
    pts = set()
    tries = 0
    while len(pts) < k and tries < 200:
        pts.add(
            (int(rng.randint(cx - r, cx + r + 1)), int(rng.randint(cy - r, cy + r + 1)))
        )
        tries += 1
    pts = sorted(pts, key=lambda p: (math.atan2(p[1] - cy, p[0] - cx), p))
    return pts + [pts[0]]


def test_area_centroid_matches_exact_fraction_reference():
    rng = np.random.RandomState(20260814)
    nonzero = 0
    for _ in range(300):
        polys = []
        for _p in range(1 + (rng.rand() < 0.3)):
            rings = [_gen_ring(rng, int(rng.randint(-5, 6)), int(rng.randint(-5, 6)), 6)]
            if rng.rand() < 0.4:  # hole rect, random winding
                hx, hy = int(rng.randint(-2, 2)), int(rng.randint(-2, 2))
                hole = [(hx, hy), (hx + 1, hy), (hx + 1, hy + 1), (hx, hy + 1), (hx, hy)]
                if rng.rand() < 0.5:
                    hole = list(reversed(hole))
                rings.append(hole)
            polys.append(rings)
        np_polys = [[np.asarray(r, dtype=np.float64) for r in rings] for rings in polys]
        got = polygons_area_centroid(np_polys)
        want = _ref_area_centroid(polys)
        # integer grid ⇒ every float64 shoelace term is exact ⇒ bit-equality
        assert got == want, (polys, got, want)
        nonzero += got[0] != 0.0
    assert nonzero > 150  # the generator must mostly produce real interiors


def test_fraction_reference_on_the_catalog_lattice():
    """The oracle claim itself: L-shape and donut shoelace on the
    0.25-multiple store lattice is exact in float64 — sweep all (w, h)
    shape combinations at extreme corner origins against Fractions."""
    for i in (0, 39):
        for j in (0, 15):
            x0 = -125.0 + i * 1.5
            y0 = 24.0 + j * 1.25
            for wm in range(7):
                for hm in range(5):
                    w = 1.0 + wm * 0.25
                    h = 1.0 + hm * 0.25
                    lshape = [
                        [
                            (x0, y0),
                            (x0 + w, y0),
                            (x0 + w, y0 + h * 0.5),
                            (x0 + w * 0.5, y0 + h * 0.5),
                            (x0 + w * 0.5, y0 + h),
                            (x0, y0 + h),
                            (x0, y0),
                        ]
                    ]
                    donut = [
                        [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)],
                        [
                            (x0 + w * 0.25, y0 + h * 0.25),
                            (x0 + w * 0.25, y0 + h * 0.75),
                            (x0 + w * 0.75, y0 + h * 0.75),
                            (x0 + w * 0.75, y0 + h * 0.25),
                            (x0 + w * 0.25, y0 + h * 0.25),
                        ],
                    ]
                    for rings in (lshape, donut):
                        np_polys = [[np.asarray(r, dtype=np.float64) for r in rings]]
                        got = polygons_area_centroid(np_polys)
                        want = _ref_area_centroid([rings])
                        assert got == want
                        assert got[0] == 0.75 * w * h


# ---------------------------------------------------------------------------
# 3. Lattice margin audits (libm-crossing discrete outputs)
# ---------------------------------------------------------------------------

# the full achievable center lattice (key modulos → data-independent)
_CX = np.array(
    sorted({-125.0 + i * 1.5 + (1.0 + n * 0.25) * 0.5 for i in range(40) for n in range(7)})
)
_CY = np.array(
    sorted({24.0 + j * 1.25 + (1.0 + m * 0.25) * 0.5 for j in range(16) for m in range(5)})
)


def test_tile_y_floor_margin_over_full_lattice():
    """No lattice latitude's zoom-6 mercator tile fraction sits within
    1e-6 of an integer boundary — a cross-engine tan/ln ulp difference
    (~1e-16 relative) can therefore never flip the FLOOR."""
    lat = _CY
    merc = np.log(np.tan(lat * math.pi / 180.0) + 1.0 / np.cos(lat * math.pi / 180.0))
    f = (1.0 - merc / math.pi) / 2.0 * 64.0
    dist = np.minimum(f - np.floor(f), np.ceil(f) - f)
    assert dist.min() > 1e-6, float(dist.min())
    # and the lattice actually spans several tile rows
    assert len(set(np.floor(f).astype(int))) >= 2


def test_haversine_radius_margin_over_full_lattice():
    """No (probe, lattice-center) great-circle distance sits within
    1e-6 km of either DWithin radius cut (600 / 1500 km)."""
    probes = [(-100.0, 30.0), (-80.0, 40.0), (-120.0, 35.0)]
    cxg, cyg = np.meshgrid(_CX, _CY)
    cx, cy = cxg.ravel(), cyg.ravel()
    worst = np.inf
    within600 = 0
    for plon, plat in probes:
        s1 = np.sin((plat - cy) * math.pi / 360.0)
        s2 = np.sin((plon - cx) * math.pi / 360.0)
        a = s1 * s1 + np.cos(cy * math.pi / 180.0) * np.cos(
            plat * math.pi / 180.0
        ) * (s2 * s2)
        d = 12742.0 * np.arcsin(np.sqrt(a))
        for r in (600.0, 1500.0):
            worst = min(worst, float(np.abs(d - r).min()))
        within600 += int((d <= 600.0).sum())
    assert worst > 1e-6, worst
    assert within600 > 0  # the 600 km branch is non-vacuous on the lattice


# ---------------------------------------------------------------------------
# Quadkey encoding fixture
# ---------------------------------------------------------------------------


def test_points_in_polys_matches_scalar_raycast():
    """The vectorized refine must agree with the scalar even-odd path on
    random integer polygons (incl. holes, stars, degenerate spikes) and
    random half-integer points — the operations are the same IEEE ops,
    broadcast."""
    from govgis_nov2023_slim_spatial_server_spark.functions.spatial import (
        _polys_contain_point,
        points_in_polys,
    )

    rng = np.random.RandomState(77)
    hits = total = 0
    for _ in range(120):
        polys = []
        for _p in range(1 + (rng.rand() < 0.3)):
            rings = [_gen_ring(rng, int(rng.randint(-4, 5)), int(rng.randint(-4, 5)), 5)]
            if rng.rand() < 0.3:
                hx, hy = int(rng.randint(-2, 2)), int(rng.randint(-2, 2))
                rings.append(
                    [(hx, hy), (hx + 1, hy), (hx + 1, hy + 1), (hx, hy + 1), (hx, hy)]
                )
            if rng.rand() < 0.2:  # degenerate spike "polygon"
                p = (int(rng.randint(-4, 5)), int(rng.randint(-4, 5)))
                rings = [[p, (p[0] + 2, p[1] + 1), p]]
            polys.append([np.asarray(r, dtype=np.float64) for r in rings])
        # half-integer points (off-vertex) plus a few exact vertices
        pts = rng.randint(-12, 13, size=(40, 2)) / 2.0
        lons, lats = pts[:, 0].copy(), pts[:, 1].copy()
        got = points_in_polys(polys, lons, lats)
        want = np.array(
            [_polys_contain_point(polys, float(x), float(y)) for x, y in pts]
        )
        assert (got == want).all()
        hits += int(got.sum())
        total += len(pts)
    assert 0 < hits < total  # both outcomes exercised


def test_point_lattice_disjoint_from_polygon_edges():
    """The oracle-exactness precondition of spatial_points_in_polygons:
    every point coordinate is an ODD multiple of 1/32; every polygon edge
    coordinate (x0, x0+w·{0.25,0.5,0.75,1}, y0, y0+h·{…}) is an EVEN
    multiple of 1/32 — enumerated over the full modulo lattice."""
    from fractions import Fraction

    edge_x, edge_y = set(), set()
    for i in range(40):
        x0 = Fraction(-125) + Fraction(3, 2) * i
        for m in range(7):
            w = 1 + Fraction(1, 4) * m
            for fr in (0, Fraction(1, 4), Fraction(1, 2), Fraction(3, 4), 1):
                edge_x.add(x0 + w * fr)
    for j in range(16):
        y0 = Fraction(24) + Fraction(5, 4) * j
        for m in range(5):
            h = 1 + Fraction(1, 4) * m
            for fr in (0, Fraction(1, 4), Fraction(1, 2), Fraction(3, 4), 1):
                edge_y.add(y0 + h * fr)
    for v in edge_x | edge_y:
        t = v * 32
        assert t.denominator == 1 and t.numerator % 2 == 0, v
    for k in range(0, 4000, 8):
        px = Fraction(-12496875, 100000) + Fraction(1, 8) * (k % 480)
        py = Fraction(2403125, 100000) + Fraction(1, 8) * (k % 168)
        for v in (px, py):
            t = v * 32
            assert t.denominator == 1 and t.numerator % 2 == 1, v


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_area_centroid_plan_is_map_only(spark, sf_dir):
    """The 100 TB claim in the docstring: one scan-side ArrowEval pass,
    no Exchange anywhere."""
    from govgis_nov2023_slim_spatial_server_spark.catalog.geo_analytics import (
        spatial_area_centroid,
    )

    plan = _plan(spatial_area_centroid(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_dissolve_plan_prunes_udf_struct_and_broadcasts_nation(spark, sf_dir):
    """Catalyst must prune the area/centroid struct to .area alone (cx/cy
    never materialize) and the nation dim must broadcast."""
    from govgis_nov2023_slim_spatial_server_spark.catalog.geo_analytics import (
        spatial_dissolve_extent,
    )

    plan = _plan(spatial_dissolve_extent(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # struct pruning: the aggregate consumes an extracted .area field, and
    # no plan node projects the cx field out of the UDF result
    assert ".cx" not in plan


def test_dwithin_plan_broadcasts_probes(spark, sf_dir):
    """The probe side (3 rows) must broadcast — the store never shuffles
    before the 3-group aggregate."""
    from govgis_nov2023_slim_spatial_server_spark.catalog.geo_analytics import (
        spatial_dwithin_haversine,
    )

    plan = _plan(spatial_dwithin_haversine(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    # the only Exchange is the final probe_id aggregate (3 groups)
    assert plan.count("Exchange hashpartitioning") == 1


def test_tile_quadkey_plan_is_native_single_shuffle(spark, sf_dir):
    """Tile math and quadkey interleave stay in native projections (no
    Python eval) and the only Exchange is the map-combined tile-key agg."""
    from govgis_nov2023_slim_spatial_server_spark.catalog.geo_analytics import (
        spatial_tile_quadkey,
    )

    plan = _plan(spatial_tile_quadkey(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_points_in_polygons_plan_is_blocked_equi_join(spark, sf_dir):
    """The join must be an equi-join on the grid cell keys — never a
    BroadcastNestedLoopJoin / CartesianProduct — and the refine UDF must
    run join-side (after the cell match), not as a pre-join scan."""
    from govgis_nov2023_slim_spatial_server_spark.catalog.geo_analytics import (
        spatial_points_in_polygons,
    )

    plan = _plan(spatial_points_in_polygons(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__cx" in plan and "__rcx" in plan  # the cell equi-keys
    assert "ArrowEvalPython" in plan


def test_cdc_upsert_plan_is_single_full_outer_join(spark, sf_dir):
    from govgis_nov2023_slim_spatial_server_spark.catalog.relational import (
        cdc_upsert_snapshot,
    )

    plan = _plan(cdc_upsert_snapshot(spark, sf_dir))
    assert "FullOuter" in plan  # the MERGE shape: one key-equi full outer
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quadkey_bit_interleave(spark):
    from pyspark.sql import functions as F

    from govgis_nov2023_slim_spatial_server_spark.catalog.geo_analytics import (
        _quadkey_col,
    )

    df = spark.createDataFrame([(5, 3)], "tx long, ty long").select(
        _quadkey_col(F.col("tx"), F.col("ty")).alias("qk")
    )
    # tx=0b000101, ty=0b000011 → digits (msb first) 0,0,0,1,2,3
    assert df.collect()[0]["qk"] == "000123"


def test_points_in_polys_chunking_matches_unchunked():
    """The many-edge memory-bound path (per-ring point chunking) must give
    the identical verdicts as the scalar ray-cast — exercised with a
    5000-edge star ring so the chunk loop actually runs."""
    from govgis_nov2023_slim_spatial_server_spark.functions.spatial import (
        _polys_contain_point,
        points_in_polys,
    )

    rng = np.random.RandomState(5)
    th = np.linspace(0.0, 2.0 * math.pi, 5001)
    r = 5.0 + (np.arange(5001) % 2)
    star = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
    star[-1] = star[0]
    polys = [[star]]
    lons = rng.randint(-12, 13, size=400) / 2.0
    lats = rng.randint(-12, 13, size=400) / 2.0
    got = points_in_polys(polys, lons, lats)
    want = np.array(
        [_polys_contain_point(polys, float(x), float(y)) for x, y in zip(lons, lats)]
    )
    assert (got == want).all()
    assert 0 < int(got.sum()) < len(lons)
