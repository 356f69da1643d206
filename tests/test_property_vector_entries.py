"""Property tests for the embeddings-based entries: random float32
vector tables (including near-duplicate planted pairs, zero-ish
components, and tie-prone distances) written through the driver's parquet
shape; catalog entry vs its own DuckDB oracle, row-for-row.

These stress the catalog's central arithmetic claim — that Spark's
sequential HOF folds are bit-identical to DuckDB's list_dot_product /
list_distance — plus the struct/window tie-breaks in the argmin and
top-k stages, on data the fixed corpora can't produce (exact duplicate
vectors ⇒ exact distance ties broken only by vec_id).
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES

ENTRIES = [
    "pca_power_iteration",
    "matryoshka_rerank_16",
    "hard_negative_mining",
    "dedup_threshold_sweep",
    "kmeans_assign_step",
    "kmeans_two_iterations",
    # wider embeddings family: fold/tie-break parity under planted
    # duplicate vectors and tiny corpora
    "knn_topk",
    "knn_euclidean",
    "dot_product_ranking",
    "vector_stats_by_label",
    "vector_centroids_by_label",
    "embedding_quantize_int8",
    "zscore_norms_by_label",
    "explode_embedding_dims",
    "knn_lsh_oracle",
    "knn_ivf_oracle",
    "similarity_join_lsh_oracle",
    "similarity_join_topk",
    # recall audits compose the exact + LSH/IVF mechanisms; small corpora
    # force the k-boundary (n_exact < 10), planted dups force distance ties
    "ann_recall_at_10",
    "ivf_recall_at_10",
    "retrieval_ndcg_labels",
    "lsh_bucket_balance",
    "ivf_cell_balance",
    "embedding_near_dup",
    "embedding_near_dup_blocked",
    "knn_int8_rerank",
    "stratified_sample_embeddings",
    # r6 coverage expansion: embeddings-based graph/dedup/mixture entries
    "pagerank_one_iter",
    "dedup_components",
    "domain_mixture_weights",
    # r9: product quantization — planted duplicates force encode ties
    # (argmin must break to the lower code identically in both engines)
    # and tiny corpora shrink the sampled codebook's distance spread
    "pq_adc_topk",
]


@st.composite
def embeddings_table(draw):
    n = draw(st.integers(min_value=12, max_value=40))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    n_dups = draw(st.integers(min_value=0, max_value=4))
    rng = np.random.default_rng(seed)
    x = rng.normal(0.0, 0.125, size=(n, 64)).astype(np.float32)
    # plant exact duplicates: identical vectors ⇒ distance ties that only
    # the vec_id tie-break can order consistently across engines
    for i in range(min(n_dups, n // 2)):
        x[n - 1 - i] = x[i]
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    return x, labels


def _write_embeddings(x, labels, dirname: str) -> None:
    df = pd.DataFrame(
        {
            "vec_id": range(1, len(x) + 1),
            "embedding": [row.tolist() for row in x],
            "label": labels,
        }
    )
    df.to_parquet(os.path.join(dirname, "embeddings.parquet"), index=False)


def _normalize(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in (tuple(r) if not isinstance(r, tuple) else r)
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("entry", ENTRIES)
@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(data=embeddings_table())
def test_vector_entry_matches_its_oracle_on_random_embeddings(spark, entry, data):
    x, labels = data
    with tempfile.TemporaryDirectory() as d:
        _write_embeddings(x, labels, d)
        got = _normalize(
            [tuple(r) for r in QUERIES[entry](spark, d).collect()]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
        )
        want = _normalize(con.execute(ORACLES[entry]).fetchall())
        con.close()
        assert got == want
