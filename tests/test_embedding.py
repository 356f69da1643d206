import numpy as np
import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.fixtures.embedder import FakeEmbedder
from govgis_nov2023_slim_spatial_server_spark.functions.embedding import embed_column
from govgis_nov2023_slim_spatial_server_spark.functions.vector import l2_norm


def test_embed_column_matches_driver_embedder(spark):
    texts = ["alpha beta", "gamma", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id: long, text: string")
    out = embed_column(df, "text", out_col="emb")
    rows = {r["id"]: r["emb"] for r in out.collect()}
    ref = FakeEmbedder(dim=64, seed=42)
    for i, t in enumerate(texts):
        expect = np.asarray(ref.embed_query(t), dtype=np.float32)
        got = np.asarray(rows[i], dtype=np.float32)
        assert np.array_equal(got, expect)


def test_embeddings_are_unit_norm(spark):
    df = spark.createDataFrame([(1, "some document text")], "id: long, text: string")
    out = embed_column(df, "text", out_col="emb").select(l2_norm("emb").alias("n"))
    assert out.first()["n"] == pytest.approx(1.0, abs=1e-6)


def test_custom_dim_factory(spark):
    df = spark.createDataFrame([(1, "x")], "id: long, text: string")
    out = embed_column(
        df, "text", out_col="emb", embedder_factory=lambda: FakeEmbedder(dim=16, seed=7)
    )
    assert len(out.first()["emb"]) == 16
