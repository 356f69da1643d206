"""Connected components over a pair/edge table — the clustering step that
turns near-duplicate PAIRS (MinHash/SimHash/embedding output) into dedup
GROUPS with one canonical survivor each. Not in the reference (its dedup is
single-table drop_duplicates); every production dedup pipeline needs it.

Algorithm: hash-min label propagation (the GraphX/Pregel standard) — each
node repeatedly adopts the minimum component id in its neighborhood until
fixpoint, so every node converges to min(reachable node id). Each iteration
is one equi-join + one groupBy (both shuffle on node id and co-partition
run-to-run); the driver-side loop carries only a convergence COUNT, never
data. Iterations needed = graph diameter — near-dup clusters are dense
(quasi-cliques), so 2-3 passes in practice; ``max_iter`` bounds adversarial
chains. At 100 TB this is exactly the large-graph CC recipe (hash-min with
checkpointed iterations); the oracle states the same fixpoint as a recursive
transitive-closure CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges`` (undirected);
    ``component`` = min node id reachable from ``id``. Deterministic."""
    sym = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = sym.select(F.col("src").alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_groups_from_pairs(
    pairs: DataFrame, id_a: str, id_b: str, max_iter: int = 20
) -> DataFrame:
    """Collapse a near-dup pair table into groups: one row per component
    with its canonical (minimum) id and member count — the shape a dedup
    writer consumes (keep canonical, drop the rest)."""
    comp = connected_components(pairs, id_a, id_b, max_iter=max_iter)
    return comp.groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("canonical_id"),
    )
