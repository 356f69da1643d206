"""Distributed skyline (Pareto frontier) — shared mechanism + recursion.

Extracted from `catalog.relational.pareto_frontier_parts` (r10) so the
recursive variant the docstring promised can reuse the exact same sweep.
Dominance model: minimize ``cost``, maximize ``benefit`` (both int64 —
callers convert money to exact cents first), strict dominance = ≤/≥ on
both with at least one strict; equal-(cost, benefit) duplicates are
mutually non-dominating and survive together.

Phases:

* `local_prune` — exchange-free: `sortWithinPartitions` (cost asc,
  benefit desc, key asc) + one mapInPandas pass per partition. Given the
  sort, a row is dominated iff some PREVIOUS row in its partition has
  strictly larger benefit, or equal benefit at strictly lower cost — so
  the carry state across Arrow batches is two scalars (running max
  benefit M, cost of the first row that reached M), vectorized per batch
  with a numpy exclusive running max + a group-first on benefit.
* `global_sweep` — the same dominance test as a window over ONE
  partition (the single Exchange), correct on any superset of the true
  frontier because dominance is transitive.
* `recursive_skyline` — the anti-chain mitigation: when the input layout
  makes local prune ineffective (each partition an anti-chain — e.g.
  data range-clustered on a dimension that anti-correlates with the
  other), re-HASH the survivors round-robin and prune again; mixing
  partitions restores cross-cluster dominance kills. Rounds are driver-
  bounded (`max_rounds`) and each round's survivor count is a cheap
  count on a localCheckpointed survivor set, so the loop never re-plans
  history. The floor is the true frontier size: a genuine full
  anti-chain cannot be shrunk by ANY algorithm, and then the global
  phase cost is the output's own size — the honest limit documented in
  the pareto entry.

At 100 TB: local prune is a map-only pass; each recursion round moves
only survivors (≪ input after the first effective prune); the global
sweep sees O(parallelism · frontier-per-partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def local_prune(
    df: DataFrame, cost: str, benefit: str, key: str
) -> DataFrame:
    """Per-partition skyline prune, exchange-free (local sort +
    mapInPandas carry-state sweep). Output schema == input schema."""
    srt = df.sortWithinPartitions(
        F.col(cost).asc(), F.col(benefit).desc(), F.col(key).asc()
    )

    def _sweep(batches):
        import numpy as np

        M = None  # running max benefit among previous rows
        firstC = None  # cost of the first row that reached benefit M
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = pdf[benefit].to_numpy()
            c = pdf[cost].to_numpy()
            seed = M if M is not None else np.iinfo(np.int64).min
            ms = np.maximum.accumulate(np.concatenate(([seed], s[:-1])))
            fc = pdf[cost].groupby(s).transform("first").to_numpy()
            if M is not None:
                fc = np.where(s == M, firstC, fc)
            dominated = (ms > s) | ((ms == s) & (fc < c))
            bmax = int(s.max())
            if M is None or bmax > M:
                M = bmax
                firstC = int(c[np.argmax(s == bmax)])
            out = pdf[~dominated]
            if len(out):
                yield out

    return srt.mapInPandas(_sweep, schema=srt.schema)


def global_sweep(df: DataFrame, cost: str, benefit: str, key: str) -> DataFrame:
    """Single-partition dominance sweep (the plan's one Exchange) —
    correct on any transitive-prune survivor set."""
    w = (
        Window.partitionBy("__one")
        .orderBy(F.col(cost).asc(), F.col(benefit).desc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    witness = F.max(F.struct(F.col(benefit), (-F.col(cost)).alias("np"))).over(w)
    cur = F.struct(F.col(benefit), (-F.col(cost)).alias("np"))
    return (
        df.withColumn("__one", F.lit(1))
        .withColumn("__m", witness)
        .where(F.col("__m").isNull() | ~(F.col("__m") > cur))
        .drop("__one", "__m")
    )


def skyline(df: DataFrame, cost: str, benefit: str, key: str) -> DataFrame:
    """Two-phase distributed skyline: local prune + global sweep."""
    return global_sweep(local_prune(df, cost, benefit, key), cost, benefit, key)


def recursive_skyline(
    df: DataFrame,
    cost: str,
    benefit: str,
    key: str,
    fit_rows: int = 2000,
    max_rounds: int = 3,
) -> DataFrame:
    """Skyline with the anti-chain mitigation: re-hash + re-prune until
    the survivor set fits `fit_rows` or `max_rounds` is exhausted, then
    one global sweep. Every round is correctness-preserving (dominance
    transitivity — a pruned row is dominated by a surviving row), so the
    result is the exact frontier regardless of how many rounds fire."""
    spark = df.sparkSession
    cur = local_prune(df, cost, benefit, key).localCheckpoint(eager=True)
    prev = cur.count()
    rounds = 0
    while rounds < max_rounds and prev > fit_rows:
        width = spark.sparkContext.defaultParallelism
        cur = local_prune(
            cur.repartition(width), cost, benefit, key
        ).localCheckpoint(eager=True)
        rounds += 1
        n = cur.count()
        if n >= prev * 9 // 10:
            break  # <10% reduction: at (or near) the anti-chain floor
        prev = n
    return global_sweep(cur, cost, benefit, key)
