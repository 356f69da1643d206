"""Distributed Lloyd's k-means as a driver loop over bounded state.

Generalizes the pattern `catalog/ml_prep.kmeans_two_iterations` grades at
two iterations (and `kmeans_assign_step` at one E-step): per iteration the
corpus is scanned ONCE with the current centroids inlined as literals — the
assignment is a no-join, no-window `LEAST(struct(dist, cid)...)` argmin that
rides whole-stage codegen — and the M-step reduces to a k×dim aggregate
collected to the driver. Nothing but the centroid table (k×dim floats)
ever leaves the cluster, and no iteration's plan references the previous
iteration's DataFrame: state lives in the DRIVER between iterations, so
lineage does not grow with iteration count and no checkpointing is needed
(the alternative — chaining DataFrames across iterations — re-plans the
whole history each pass; that is the trap the design avoids).

Centroid coordinates are quantized to a 1/1024 grid after every M-step
(floor(mean·1024 + 0.5)/1024 — the quantize_int8 convention): it makes the
iteration deterministic across engines/partitionings (a partial-merge mean
is order-dependent in its last ulp, and the next argmin would amplify a
one-ulp difference on a near-tie into a different clustering) and mirrors
what production systems broadcast anyway.

At 100 TB: cost per iteration is one corpus scan + one k·dim-group
map-combined aggregate; the driver holds k×dim floats. Empty clusters keep
their previous centroid (the standard Lloyd fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Centroids = list[tuple[int, list[float]]]


def assign_nearest(
    df: DataFrame, centroids: Centroids, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """E-step: per-row nearest centroid (L2) as a LEAST-over-literals
    argmin — no join, no window; ties break to the lower cid via the
    struct comparison's second field. Returns (id, vec, cid, dist)."""
    from ..functions.hashes import _let
    from ..functions.vector import euclidean_distance

    if not centroids:
        raise ValueError("assign_nearest needs at least one centroid")
    candidates = [
        F.struct(
            euclidean_distance(vec_col, vec).alias("dist"),
            F.lit(cid).cast("long").alias("cid"),
        )
        for cid, vec in centroids
    ]
    # F.least requires >=2 arguments; k=1 is the trivial assignment
    best = candidates[0] if len(candidates) == 1 else F.least(*candidates)
    return df.select(
        id_col,
        vec_col,
        _let(
            best,
            lambda b: F.struct(
                b.getField("cid").alias("cid"), b.getField("dist").alias("dist")
            ),
        ).alias("__b"),
    ).select(id_col, vec_col, "__b.cid", "__b.dist")


def _quantized_means(
    assigned: DataFrame, vec_col: str, quant: int
) -> dict[int, list[float]]:
    """M-step: per-cluster per-dimension mean on the 1/quant grid; one
    map-combined aggregate, k×dim rows collected (bounded driver state)."""
    rows = (
        assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (F.floor(F.avg("x") * quant + F.lit(0.5)) / F.lit(float(quant))).alias("m")
        )
        .collect()
    )
    out: dict[int, dict[int, float]] = {}
    for r in rows:
        out.setdefault(r["cid"], {})[r["pos"]] = float(r["m"])
    return {
        cid: [dims[p] for p in sorted(dims)] for cid, dims in out.items()
    }


def lloyd_iterate(
    df: DataFrame,
    seed_centroids: Centroids,
    n_iter: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1024,
) -> Centroids:
    """Run ``n_iter`` full Lloyd iterations and return the final centroid
    table (cid-sorted). Each iteration launches an independent job over
    the base DataFrame — the plan never chains across iterations."""
    centroids = sorted(seed_centroids)
    for _ in range(n_iter):
        assigned = assign_nearest(df, centroids, vec_col=vec_col, id_col=id_col)
        means = _quantized_means(assigned, vec_col, quant)
        # empty cluster → keep its previous centroid (standard fallback)
        centroids = sorted(
            (cid, means.get(cid, vec)) for cid, vec in centroids
        )
    return centroids
