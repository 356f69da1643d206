"""End-to-end demo of the reference workflow, Spark-native.

Replays the reference system's full lifecycle (SURVEY.md §3) against this
engine: ingest a GeoParquet-shaped dataset (dedup + bbox derivation +
Z-ordered write), load the store, serve hybrid semantic+spatial searches
through the API layer, and post-process through the MCP markdownify pass.

    python examples/demo_reference_workflow.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from govgis_nov2023_slim_spatial_server_spark.api.mcp import gis_layer_search
from govgis_nov2023_slim_spatial_server_spark.api.models import Point, SemanticSearchRequest
from govgis_nov2023_slim_spatial_server_spark.api.search import SearchService
from govgis_nov2023_slim_spatial_server_spark.fixtures.embedder import FakeEmbedder
from govgis_nov2023_slim_spatial_server_spark.fixtures.layers import make_layers_df
from govgis_nov2023_slim_spatial_server_spark.session import get_spark
from govgis_nov2023_slim_spatial_server_spark.sources.ingest import (
    ingest_layers,
    load_layers,
    write_layers,
)


def main() -> None:
    spark = get_spark(app_name="govgis-demo")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="govgis-demo-")

    # 1. a GeoParquet-shaped source file (synthetic; 5% duplicate rows)
    raw_path = f"{workdir}/source"
    raw = (
        make_layers_df(spark, n=500, seed=42)
        .drop("bbox")
        .withColumnRenamed("geom_wkb", "geometry")
    )
    raw.write.parquet(raw_path)
    print(f"source rows (with dups): {spark.read.parquet(raw_path).count()}")

    # 2. ingest: dedup → rename → project → derive bbox (reference
    #    load_data.py dataflow, distributed end-to-end)
    store_path = f"{workdir}/layers"
    ingested = ingest_layers(spark, raw_path)
    write_layers(ingested, store_path)  # Z-ordered parquet, atomic commit
    layers = load_layers(spark, store_path)
    print(f"layers store rows (deduped): {layers.count()}")

    # 3. serve searches (reference POST /search semantics)
    svc = SearchService(layers, FakeEmbedder(dim=64, seed=42))
    r = svc.search(
        SemanticSearchRequest(
            request_string="parcel zoning survey data",
            type_filter=["feature layer"],
            limit=5,
        )
    )
    print("\nsemantic search (type-filtered):")
    for layer in r.layers or []:
        print(f"  {layer.id}  {layer.type:<14} {layer.name}")

    # 4. hybrid: add a spatial point filter (with CRS normalization)
    row = layers.where("bbox is not null").select("bbox").first()
    lon = (row["bbox"]["xmin"] + row["bbox"]["xmax"]) / 2
    lat = (row["bbox"]["ymin"] + row["bbox"]["ymax"]) / 2
    r = svc.search(
        SemanticSearchRequest(
            request_string="water utility",
            input_point=Point(longitude=lon, latitude=lat),
            limit=5,
        )
    )
    print(f"\nhybrid search at ({lon:.3f}, {lat:.3f}):")
    for layer in r.layers or []:
        print(f"  {layer.id}  {layer.name}")

    # 5. MCP tool layer: markdownified response (reference mcp.py)
    r = gis_layer_search(
        svc, SemanticSearchRequest(request_string="flood boundary", limit=3)
    )
    print("\nMCP tool result (markdownified):")
    for layer in r.layers or []:
        desc = (layer.description or "")[:60]
        print(f"  {layer.id}  {desc}")

    spark.stop()
    print("\ndemo complete")


if __name__ == "__main__":
    main()
