"""Sketch-operator catalog entries (operators/sketches.py).

Both entries are oracle-checked despite the operators being "approximate"
families, because each configuration here is exact by construction:

- the Bloom runtime-filter join removes false positives in the join itself,
  so the result equals a plain inner join (the sketch only shrinks the
  shuffle);
- the Count-Min estimate equals the exact count whenever the key never
  collides in any of the depth rows — with 5 distinct keys hashed into
  width ≥ 2719 over depth ≥ 5 (eps=0.001, delta=0.01) and a fixed blake2b
  hash family, collision-freeness is a deterministic, verified property of
  this configuration (asserted exact at sf0.01; error BOUNDS for adversarial
  loads are the pytest contract, tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import bloom_prefilter_join, count_min_sketch
from ..schemas import load_table
from ._registry import query


@query(
    "sketch_bloom_join_counts",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 250000.0
    GROUP BY o.o_orderpriority
    """,
)
def sketch_bloom_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact⋈dim join (runtime-filter pattern).

    The small side (high-value orders) builds a distributed Bloom filter
    (one blob per partition, OR-merged, broadcast); lineitem rows that
    cannot match are dropped at the scan, BEFORE the join shuffle. The join
    then removes the ~fpp false positives, so the result is exactly the
    plain inner join the oracle runs — the sketch changes the physical
    plan's shuffle volume, never the answer.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 250000.0)
        .select("o_orderkey", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    joined = bloom_prefilter_join(li, o, "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "sketch_cms_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS est_count
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sketch_cms_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates for every order priority.

    The sketch builds distributed (one partial per partition, element-wise
    add merge); the driver probes the 5 distinct keys (bounded collect).
    At this configuration the estimate is provably collision-free, so the
    oracle is the exact GROUP BY count — CMS's ≥-exact one-sided error
    contract under adversarial cardinality lives in tests/test_sketches.py.
    """
    o = load_table(spark, sf_dir, "orders")
    cms = count_min_sketch(o, "o_orderpriority", eps=0.001, delta=0.01)
    keys = [r[0] for r in o.select("o_orderpriority").distinct().collect()]
    return spark.createDataFrame(
        [(k, cms.estimate(k)) for k in sorted(keys)],
        "o_orderpriority string, est_count long",
    )
