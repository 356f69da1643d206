"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
salting is the explicit tool for the cases AQE can't fix — skewed
AGGREGATION keys (one giant group) and broadcast-ineligible skewed joins.
Standard two-phase pattern: spray the hot key across ``n_salts`` partial
keys, aggregate, then aggregate the partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps column → 'sum'|'count'|'min'|'max' (the re-aggregable
    algebra; avg = sum/count composed by the caller). Phase 1 groups by
    (keys + random salt) — the hot key's rows land on n_salts reducers;
    phase 2 re-aggregates partials per key. Both phases keep map-side
    partial aggregation, so the extra shuffle carries only
    n_salts × |groups| rows.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1_aggs = []
    for c, how in aggs.items():
        if how == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{c}"))
        elif how == "sum":
            phase1_aggs.append(F.sum(c).alias(f"__p_{c}"))
        elif how == "min":
            phase1_aggs.append(F.min(c).alias(f"__p_{c}"))
        elif how == "max":
            phase1_aggs.append(F.max(c).alias(f"__p_{c}"))
        else:
            raise ValueError(f"non-reaggregable agg {how}; compose it from sum/count")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = []
    for c, how in aggs.items():
        merge = "sum" if how in ("count", "sum") else how
        phase2_aggs.append(getattr(F, merge)(f"__p_{c}").alias(f"{c}_{how}"))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed-key equi-join without broadcast: salt the skewed side
    randomly, EXPLODE the small side across all salts, join on
    (key, salt). The small side is replicated n_salts× — use when it is
    too big to broadcast but far smaller than the skewed side."""
    left = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [key, "__salt"]).drop("__salt")
