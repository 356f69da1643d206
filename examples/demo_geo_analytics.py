"""End-to-end geo-analytics pipeline demo over the polygon store.

The spatial counterpart of demo_reference_workflow's search path: composes
the r8 geo-analytics layer in the order a GIS warehouse chains it —
measure, index, query, aggregate — all through the engine's real WKB stack
(encode → bbox derive → parse → shoelace / ray-cast):

  1. ST_Area + ST_Centroid over every geometry (one-parse map pass)
  2. tile-pyramid build — zoom-6 slippy tiles + quadkeys (the partition
     key a tile server shards on)
  3. ST_DWithin radius counts around probe points (haversine, broadcast)
  4. ST_Extent dissolve per nation (zoom-to-fit extents + covered area)
  5. points-in-polygons — events assigned to districts via the
     grid-blocked cell equi-join + vectorized even-odd refine
  6. the skew check: the hot-cell self-join regime the AQE skew-split
     measurement (SCALING.md run 9) protects at scale

    python examples/demo_geo_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES
from govgis_nov2023_slim_spatial_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="geo-analytics-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. measure: area + centroid per geometry
    ac = QUERIES["spatial_area_centroid"](spark, sf_dir)
    stats = ac.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("area"), 2).alias("total"),
        F.round(F.avg("area"), 4).alias("mean"),
    ).first()

    # 2. index: tile pyramid + quadkeys
    tiles = QUERIES["spatial_tile_quadkey"](spark, sf_dir)
    busiest = tiles.orderBy(F.col("n_geoms").desc(), "quadkey").first()
    n_tiles = tiles.count()

    # 3. query: radius counts around probes
    dwithin = QUERIES["spatial_dwithin_haversine"](spark, sf_dir).collect()

    # 4. aggregate: per-nation extent + covered area
    dissolve = QUERIES["spatial_dissolve_extent"](spark, sf_dir)
    widest = dissolve.withColumn(
        "span", F.col("xmax") - F.col("xmin")
    ).orderBy(F.col("span").desc(), "n_name").first()

    # 5. assign: points into district polygons
    pip = QUERIES["spatial_points_in_polygons"](spark, sf_dir)
    pip_stats = pip.agg(
        F.count(F.lit(1)).alias("districts"),
        F.sum("n_points").alias("assignments"),
    ).first()

    # 6. the skewed regime (hot-cell self-join) still returns exact counts
    hot = QUERIES["spatial_join_hot_cell"](spark, sf_dir)
    hot_pairs = hot.agg(F.sum("n_overlaps")).first()[0]

    print(f"geometries measured    : {stats['n']} (Σarea {stats['total']}, mean {stats['mean']})")
    print(f"tile pyramid (z=6)     : {n_tiles} tiles; busiest {busiest['quadkey']} holds {busiest['n_geoms']}")
    for r in dwithin:
        print(
            f"probe {r['probe_id']} DWithin       : {r['n_600']} within 600 km, "
            f"{r['n_1500']} within 1500 km"
        )
    print(
        f"widest nation extent   : {widest['n_name'].strip()} spans {widest['span']:.2f} deg, "
        f"covered area {widest['total_area']:.2f}"
    )
    print(f"points-in-polygons     : {pip_stats['assignments']} points over {pip_stats['districts']} districts")
    print(f"hot-cell overlap pairs : {hot_pairs}")
    spark.stop()


if __name__ == "__main__":
    main()
