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

from ..operators.sketches import (
    bloom_prefilter_join,
    count_min_sketch,
    hll_estimate_by_group,
    hll_registers_by_group,
    hll_registers_to_estimate,
)
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


# THE shared copy of the pinned HLL mix → registers CTE chain (mirrors
# operators/sketches.hll_registers_by_group — change one, change both).
# Spliced into both HLL oracles so the two engines can never drift apart
# on the hash; ends at `regs` = (event_type, j, MAX(rho)).
_HLL_REGS_CTES = """WITH k0 AS (
      SELECT event_type,
             ((user_id % 1048576) + 1048576) % 1048576 AS t
      FROM events WHERE user_id IS NOT NULL),
    m1 AS (
      SELECT event_type,
             ((t % 134217728) * 102334155 + (t // 134217728) * 97654321
              + 12345) % 18014398509481951 AS t
      FROM k0),
    x1 AS (SELECT event_type, xor(t, t >> 21) AS t FROM m1),
    m2 AS (
      SELECT event_type,
             ((t % 134217728) * 88675123 + (t // 134217728) * 134775813
              + 424242) % 18014398509481951 AS t
      FROM x1),
    x2 AS (SELECT event_type, xor(t, t >> 21) AS t FROM m2),
    m3 AS (
      SELECT event_type,
             ((t % 134217728) * 75327617 + (t // 134217728) * 123456789
              + 999983) % 18014398509481951 AS t
      FROM x2),
    h AS (SELECT event_type, xor(t, t >> 21) AS h FROM m3),
    r AS (
      SELECT event_type, h % 64 AS j,
             CASE WHEN h // 64 = 0 THEN 49
                  ELSE length(bin((h // 64) & (-(h // 64)))) END AS rho
      FROM h),
    regs AS (
      SELECT event_type, j, MAX(rho) AS r FROM r GROUP BY event_type, j)"""


@query(
    "sketch_hll_distinct_users",
    "\n    "
    + _HLL_REGS_CTES
    + """,
    s AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << (49 - r))
               + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 49) AS BIGINT)
               AS register_sum
      FROM regs GROUP BY event_type),
    x AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
    SELECT s.event_type AS event_type,
           s.register_sum AS register_sum,
           CAST('1675339061381824512' AS DOUBLE)
             / CAST(s.register_sum AS DOUBLE) AS hll_estimate,
           x.exact_distinct AS exact_distinct
    FROM s JOIN x USING (event_type)
    """,
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, with a PINNED
    hash family so the ESTIMATE ITSELF is oracle-checked — not just an
    error bound. Native `approx_count_distinct` is the production path
    (its HLL++ registers are engine-internal, tests/test_approx.py); this
    entry re-derives the register algebra from first principles to prove
    the engine computes real HLL, the way `sketch_cms_priority_counts`
    proves Count-Min: mix → (register, rank) → groupBy MAX → harmonic
    mean. Everything before the single final division is exact int64
    (`operators/sketches.hll_estimate_by_group` documents the mix rounds,
    the measured-and-rejected weaker variants, and the lattice:
    Σ 2^(49-rho) < 2^56), so both engines' estimates are bit-identical
    and the raw double is hash-safe. Duplicates never shuffle: MAX-of-rank
    is idempotent, so the plan is one map-combined agg of (type, register)
    pairs — at 100 TB the state per group is 64 registers regardless of
    row count, the whole point of HLL. exact_distinct rides along to show
    the estimate lands in HLL's m=64 design band (σ = 1.04/√64 ≈ 13%;
    the error-band contract across fixture regimes is pinned in
    tests/test_sketches.py).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    est = hll_estimate_by_group(ev, "event_type", "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "register_sum", "hll_estimate", "exact_distinct"
    )


@query(
    "sketch_hll_merge_union",
    "\n    "
    + _HLL_REGS_CTES
    + """,
    s AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << (49 - r))
               + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 49) AS BIGINT)
               AS register_sum
      FROM regs GROUP BY event_type),
    types AS (SELECT DISTINCT event_type FROM k0),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM types a JOIN types b ON a.event_type < b.event_type),
    pregs AS (
      SELECT p.ta, p.tb, g.j, MAX(g.r) AS r
      FROM pairs p JOIN regs g ON g.event_type IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, g.j),
    psum AS (
      SELECT ta, tb,
             CAST(SUM(CAST(1 AS BIGINT) << (49 - r))
               + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 49) AS BIGINT)
               AS union_register_sum
      FROM pregs GROUP BY ta, tb),
    du AS (SELECT DISTINCT event_type, user_id FROM events
           WHERE user_id IS NOT NULL),
    ovl AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             COUNT(*) AS exact_overlap
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.ta AS type_a, p.tb AS type_b,
           psum.union_register_sum AS union_register_sum,
           CAST('1675339061381824512' AS DOUBLE)
             / CAST(psum.union_register_sum AS DOUBLE) AS est_union,
           CAST('1675339061381824512' AS DOUBLE)
               / CAST(sa.register_sum AS DOUBLE)
             + CAST('1675339061381824512' AS DOUBLE)
               / CAST(sb.register_sum AS DOUBLE)
             - CAST('1675339061381824512' AS DOUBLE)
               / CAST(psum.union_register_sum AS DOUBLE) AS est_overlap,
           COALESCE(ovl.exact_overlap, CAST(0 AS BIGINT)) AS exact_overlap
    FROM pairs p
    JOIN psum ON psum.ta = p.ta AND psum.tb = p.tb
    JOIN s sa ON sa.event_type = p.ta
    JOIN s sb ON sb.event_type = p.tb
    LEFT JOIN ovl ON ovl.ta = p.ta AND ovl.tb = p.tb
    """,
)
def sketch_hll_merge_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY graded directly: per-pair UNION sketches built by
    element-wise register MAX of the per-type sketches — the algebra that
    makes HLL the 100 TB distinct-count workhorse (sketch each
    partition/day once, merge register tables forever after, never
    re-scan), plus the inclusion–exclusion intersection estimate
    |A∩B| ≈ est(A) + est(B) − est(A∪B) checked against the exact overlap.

    Everything downstream of the one map-combined register aggregate is
    SKETCH-SIZED (≤ types·64 rows, corpus-independent): the pair fan-out
    is a broadcast nested-loop of the register table into the ≤10 type
    pairs, deliberately cheap at any corpus size. MAX is associative and
    idempotent, so the per-pair union registers here are bit-identical to
    sketching the concatenated streams — which is exactly what the oracle
    cannot help but verify, since its INTERSECT-free formulation re-MAXes
    the same integer registers. register sums stay exact int64
    (Σ 2^(49−ρ) < 2^56); the estimates are single IEEE divisions of
    identical ints and est_overlap is (a + b) − u of identical doubles,
    so raw doubles hash-match (the parent entry's proven contract).
    est_overlap can legitimately go negative at small overlaps — it is
    the textbook estimator, reported against exact_overlap (distinct
    users seen under BOTH types; per-user fan-out ≤ types², bounded).
    Pairs with no shared user emit exact_overlap = 0 via the left join."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    # lazy checkpoint (r15, guide §3.3): the register table is referenced
    # three times (pair fan-out, per-type estimates, type list) and each
    # reference re-ran the corpus-wide register aggregate. The sketch is
    # ≤ types·64 rows — the barrier is free, the dedup is a full scan+agg
    # per duplicate.
    regs = hll_registers_by_group(ev, "event_type", "user_id").localCheckpoint(
        eager=False
    )
    types = regs.select("event_type").distinct()
    pairs = types.select(F.col("event_type").alias("ta")).join(
        types.select(F.col("event_type").alias("tb")),
        F.col("ta") < F.col("tb"),
    )
    pregs = (
        pairs.join(
            F.broadcast(regs),
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "__j")
        .agg(F.max("__r").alias("__r"))
    )
    usum = hll_registers_to_estimate(pregs, ["ta", "tb"]).select(
        "ta",
        "tb",
        F.col("register_sum").alias("union_register_sum"),
        F.col("hll_estimate").alias("est_union"),
    )
    est = hll_registers_to_estimate(regs, ["event_type"])
    ea = est.select(
        F.col("event_type").alias("ta"), F.col("hll_estimate").alias("est_a")
    )
    eb = est.select(
        F.col("event_type").alias("tb"), F.col("hll_estimate").alias("est_b")
    )
    # both self-join branches re-derived the scan+DISTINCT without the
    # barrier (same r15 class as regs above)
    du = ev.select("event_type", "user_id").distinct().localCheckpoint(
        eager=False
    )
    ovl = (
        du.select(F.col("event_type").alias("ta"), "user_id")
        .join(du.select(F.col("event_type").alias("tb"), "user_id"), "user_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    out = (
        usum.join(F.broadcast(ea), "ta")
        .join(F.broadcast(eb), "tb")
        .join(ovl, ["ta", "tb"], "left")
    )
    return out.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "union_register_sum",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_overlap"
        ),
        F.coalesce(F.col("exact_overlap"), F.lit(0).cast("long")).alias(
            "exact_overlap"
        ),
    )
