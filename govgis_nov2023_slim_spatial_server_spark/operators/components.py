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
    # Checkpoint the edge table ONCE (r15, guide §3.3 — the pagerank/BFS
    # edges lesson applied here): every hash-min iteration joins against
    # `sym`, and without the barrier each of the ~diameter iterations
    # re-derived the caller's whole pair-generation subtree (for the
    # dedup entries: the label-blocked cosine self-join — measured 8-9 s
    # per entry at sf0.1, ~3x the materialized-edge cost). The
    # checkpointed rows are two 8-byte ids per edge.
    sym = sym.localCheckpoint(eager=False)
    nodes = sym.select(F.col("src").alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)

    # Checkpointed RDDs carry no stats, so every iteration's joins plan
    # as SMJ regardless of size — restore the decision Spark's own
    # threshold would make (r15, guide §3.1): broadcast the label table
    # while its estimated bytes (16 B/row) fit autoBroadcastJoinThreshold,
    # fall back to the co-partitioned SMJ for big graphs (the 100 TB
    # recipe in the module docstring is unchanged).
    try:
        _thresh = int(
            str(
                sym.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
            ).lower().rstrip("b")
        )
    except ValueError:
        _thresh = 10 * 1024 * 1024
    _bcast = _thresh > 0 and labels.count() * 16 <= _thresh

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if _bcast else df

    for _ in range(max_iter):
        nbr_min = (
            sym.join(_hint(labels), sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # carry the per-node "label shrank" flag through the checkpoint
        # (r15): the convergence count then reads materialized rows
        # instead of re-joining the new labels against the old — one
        # fewer join job per iteration (the loop is job-overhead-bound).
        new_labels = (
            labels.join(_hint(nbr_min), labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.select("id", "comp")
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
