"""Grouped vector aggregation via applyInPandas — the scale path for
per-group embedding statistics.

The posexplode formulation (catalog vector_centroids_by_label) shuffles
n_rows × dim skinny rows; this operator shuffles each row ONCE (grouped by
label) and reduces inside an Arrow batch with numpy — shuffle volume drops
by the dimension factor. This is the grouped-map custom-operator pattern
(applyInPandas) the engine uses wherever built-in aggregates can't express
array math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_centroids(
    df: DataFrame,
    group_col: str = "label",
    emb_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Per-group mean vector (optionally L2-normalized) as array<double>."""

    def _centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[emb_col].apply(lambda v: np.asarray(v, dtype=np.float64)))
        c = mat.mean(axis=0)
        if normalize:
            n = np.linalg.norm(c)
            if n > 0:
                c = c / n
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "centroid": [c.tolist()], "n_vecs": [len(pdf)]}
        )

    return df.groupBy(group_col).applyInPandas(
        _centroid, schema=f"{group_col} int, centroid array<double>, n_vecs long"
    )
