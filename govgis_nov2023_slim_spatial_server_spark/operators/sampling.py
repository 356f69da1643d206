"""Deterministic (hash-based) sampling and dataset splitting.

``df.sample()`` draws from Spark's per-partition RNG: the sample changes
with partitioning, retries, and engine version — useless for reproducible
training corpora or cross-engine verification. The scale-correct
alternative keys every decision off a HASH OF THE ROW KEY:

- same row → same decision, on any cluster layout, forever;
- membership is a pure map-side predicate (no shuffle, pushes past scans);
- train/val/test splits are disjoint BY CONSTRUCTION and survive
  incremental re-runs (a new day's rows land in the same splits).

Hash: multiplicative ``(key · KNUTH_A) mod POLY_MOD`` into 10 000 buckets.
ANSI-safe: key ≤ 2^31 and KNUTH_A ≈ 2^31.3 keep the product < 2^63
(Spark 4 ANSI mode makes long overflow a hard error, CLAUDE.md); the same
BIGINT arithmetic runs verbatim in DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import _POLY_MOD

# Knuth's multiplicative constant (golden-ratio · 2^32), coprime to 2^54-33.
KNUTH_A = 2654435761
N_BUCKETS = 10_000


def hash_bucket(key: Column | str, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key column."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.pmod(k.cast("long") * F.lit(KNUTH_A), F.lit(_POLY_MOD)), F.lit(n_buckets)
    )


def hash_bucket_sql(key_expr: str, n_buckets: int = N_BUCKETS) -> str:
    """The identical bucket arithmetic as DuckDB SQL (oracle twin)."""
    return (
        f"(({key_expr}::BIGINT * {KNUTH_A}) % {_POLY_MOD}) % {n_buckets}"
    )


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — reproducible across
    runs, partitionings, and engines; plans as a plain scan filter."""
    cut = int(round(fraction * n_buckets))
    return df.where(hash_bucket(key, n_buckets) < F.lit(cut))


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
    split_name: str = "split",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Disjoint named splits (train/val/test) by cumulative hash-bucket
    ranges; appends ``split_name``. Weights must sum to ≤ 1; any remainder
    is dropped (sub-sampled split)."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    b = hash_bucket(key, n_buckets)
    expr = None
    edge = 0
    for name, w in weights.items():
        nxt = edge + int(round(w * n_buckets))
        cond = (b >= F.lit(edge)) & (b < F.lit(nxt))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        edge = nxt
    return df.withColumn(split_name, expr).where(F.col(split_name).isNotNull())


def hash_split_case_sql(
    key_expr: str, weights: dict[str, float], n_buckets: int = N_BUCKETS
) -> str:
    """CASE expression mirroring ``hash_split`` for DuckDB oracles."""
    b = hash_bucket_sql(key_expr, n_buckets)
    arms = []
    edge = 0
    for name, w in weights.items():
        nxt = edge + int(round(w * n_buckets))
        arms.append(f"WHEN {b} >= {edge} AND {b} < {nxt} THEN '{name}'")
        edge = nxt
    return "CASE " + " ".join(arms) + " END"


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    strata_col: str,
    fractions: dict,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (class-balanced corpus drawing):
    each stratum keeps its own fraction, decided by the SAME key hash — so
    enlarging one stratum's fraction never changes another's members, and
    the whole thing stays a map-side predicate (no shuffle, no RNG state).
    Strata absent from ``fractions`` are dropped."""
    b = hash_bucket(key, n_buckets)
    cond = F.lit(False)
    for s, frac in fractions.items():
        cut = int(round(frac * n_buckets))
        cond = cond | ((F.col(strata_col) == F.lit(s)) & (b < F.lit(cut)))
    return df.where(cond)


def stratified_sample_sql(
    key_expr: str, strata_expr: str, fractions: dict, n_buckets: int = N_BUCKETS
) -> str:
    """WHERE-clause twin of ``stratified_sample`` for DuckDB oracles."""
    b = hash_bucket_sql(key_expr, n_buckets)
    arms = " OR ".join(
        f"({strata_expr} = {s} AND {b} < {int(round(f * n_buckets))})"
        for s, f in fractions.items()
    )
    return f"({arms})"
