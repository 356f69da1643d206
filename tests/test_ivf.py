import numpy as np
import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.ivf import (
    assign_clusters,
    ivf_knn,
    ivf_search,
    train_centroids,
    write_ivf,
)
from govgis_nov2023_slim_spatial_server_spark.operators.knn import knn


@pytest.fixture(scope="module")
def clustered_df(spark):
    """Vectors drawn around 4 well-separated centers → k-means must find
    the structure and IVF recall should be near-perfect."""
    rng = np.random.RandomState(17)
    centers = rng.randn(4, 16) * 5
    rows = []
    for i in range(400):
        c = i % 4
        rows.append((i, (centers[c] + rng.randn(16) * 0.3).astype("float32").tolist()))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>"), centers


def test_kmeans_finds_separated_clusters(spark, clustered_df):
    df, centers = clustered_df
    cents = train_centroids(df, n_centroids=4, seed=1)
    # each true center must be close to some learned centroid
    for c in centers:
        d = np.linalg.norm(cents - c[None, :], axis=1).min()
        assert d < 1.0


def test_assignment_groups_match(spark, clustered_df):
    df, _ = clustered_df
    cents = train_centroids(df, n_centroids=4, seed=1)
    assigned = assign_clusters(df, cents)
    # members of the same true cluster (vec_id % 4) share the assigned id
    rows = assigned.select("vec_id", "cluster").collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r["vec_id"] % 4, set()).add(r["cluster"])
    assert all(len(v) == 1 for v in by_true.values())


def test_ivf_recall_vs_exact(spark, clustered_df):
    df, centers = clustered_df
    q = (centers[2] + np.random.RandomState(3).randn(16) * 0.2).tolist()
    exact = [r["vec_id"] for r in knn(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_knn(df, q, k=10, n_centroids=4, n_probe=1, seed=1).collect()]
    assert set(approx) == set(exact)  # well-separated → probe-1 is exact


def test_ivf_partitioned_write_prunes(spark, clustered_df, tmp_path):
    df, centers = clustered_df
    cents = train_centroids(df, n_centroids=4, seed=1)
    path = str(tmp_path / "ivf")
    write_ivf(assign_clusters(df, cents), path)
    back = spark.read.parquet(path)
    q = centers[1].tolist()
    out = ivf_search(back, cents, q, k=5, n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:120]
    assert out.count() == 5
