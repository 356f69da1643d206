"""Relational core queries: joins, aggregations, windows, sorts, set ops,
scalar functions (SURVEY.md §2.3 gap table — none of these exist in the
reference, whose only relational surface is one filtered top-k scan;
they're required by the driver's general-analytics grading).

Physical notes recorded per query where it matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import top_k
from ..operators.windows import (
    floor_round,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from ..schemas import load_table
from ._registry import query, rnd_nz


def _revenue_e4(price="l_extendedprice", disc="l_discount"):
    """Revenue Σ price·(1−discount) in EXACT basis-point-cents (int64).

    `ROUND(SUM(price·(1−disc)), 2)` is cross-engine-unstable: the true sum
    of 4-decimal products can land exactly on a half-cent (x.xx5), where
    Spark's shortest-repr HALF_UP and DuckDB's binary round split — and
    each engine's float sum sits one ulp to either side of the tie anyway
    (found by the random-DB property gate on q5). Per-element
    floor-to-cents × (100−disc%) is exact int64; divide once at the end.
    Headroom: cents(≤1e7)·100 ≈ 1e9/row ⇒ overflows int64 past ~9e9 rows
    per group — at that scale widen to DECIMAL(38) or sum per-shard
    (parallel_moments_merge pattern)."""
    cents = F.floor(F.col(price) * 100.0 + 0.5).cast("long")
    dpct = F.floor(F.col(disc) * 100.0 + 0.5).cast("long")
    return F.sum(cents * (F.lit(100) - dpct)).cast("double") / 10000.0


# the oracle twin of _revenue_e4 (CAST collapses DuckDB's HUGEINT SUM)
_REVENUE_E4_SQL = (
    "CAST(SUM(CAST(FLOOR({p} * 100.0 + 0.5) AS BIGINT)"
    " * (100 - CAST(FLOOR({d} * 100.0 + 0.5) AS BIGINT))) AS BIGINT) / 10000.0"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                           AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)))
                AS BIGINT) / 10000.0                                AS sum_disc_price,
           FLOOR(SUM(l_quantity) / COUNT(*) * 10000.0 + 0.5) / 10000.0
                                                                    AS avg_qty,
           FLOOR(CAST(SUM(CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 100.0 * 10000.0 + 0.5) / 10000.0      AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial (map-side) agg → 1 shuffle on 2 low-card
    keys; scales linearly, shuffle volume = O(groups), not O(rows).

    Decimal-tie discipline (the _revenue_e4 rationale): the disc-price sum
    and the averages are computed over EXACT integer units (quantities are
    integer-valued, discounts floor to whole percent) so both engines
    divide identical numbers; the rounding is the floor convention. The
    plain 2-decimal sums (qty, base price) are tie-free as-is: their true
    values have no third decimal."""
    li = _t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    disc_pct = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _revenue_e4().alias("sum_disc_price"),
            (
                F.floor(F.sum("l_quantity") / cnt * 10000.0 + F.lit(0.5)) / 10000.0
            ).alias("avg_qty"),
            (
                F.floor(
                    F.sum(disc_pct).cast("double") / cnt / 100.0 * 10000.0
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct_stats",
    """
    SELECT COUNT(*)                       AS n_rows,
           COUNT(DISTINCT c_nationkey)    AS n_nations,
           COUNT(DISTINCT c_mktsegment)   AS n_segments,
           FLOOR(CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / (100.0 * COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_bal,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0                  AS sum_bal,
           ROUND(MIN(c_acctbal), 2)       AS min_bal,
           ROUND(MAX(c_acctbal), 2)       AS max_bal
    FROM customer
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar aggregates: counts, distincts, avg/sum/min/max.

    avg/sum run in EXACT integer cents (int64 SUM, one final division,
    floor-rounded): AVG of 2-decimal money lands ON 4-decimal ties
    (sum_cents/n with n | 8 → x.xxxx5 exactly — the r9 property-gate
    find: Spark's BigDecimal HALF_UP and DuckDB's scaled-multiply ROUND
    resolved 4032.56125 to different sides), and the float SUM itself is
    partition-order-dependent, so only integer units are safe. min/max
    are raw parquet doubles — ROUND at their own precision is tie-free."""
    c = _t(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("long")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        (
            F.floor(
                F.sum(cents).cast("double")
                / (F.lit(100.0) * F.count(F.lit(1)))
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("avg_bal"),
        (F.sum(cents).cast("double") / 100.0).alias("sum_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "agg_rollup_region_nation",
    """
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals; the two dim joins auto-broadcast (25 / 5 rows)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@query(
    "agg_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over two axes (all 4 grouping combinations)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q3_top_revenue_orders",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    At scale: customer filter prunes before the shuffle join; final top-10
    is TakeOrderedAndProject, never a global sort."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(_revenue_e4().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with the selective dim filter pushed to
    the FRONT — region[ASIA] ⋈ nation is a 25-row broadcast applied to
    customer before any shuffle, so the two fact shuffles (c⋈o on custkey,
    (c⋈o)⋈li on orderkey) carry only the ~1/|regions| of customers that
    survive. Joining dims last (the naive order) would shuffle the full
    fact volume first and discard 80% of it after — the difference between
    the two orders GROWS with the fact tables, which is exactly the
    reorder that matters at 100 TB. supplier stays broadcast on the
    post-join rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nr = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c_asia = c.join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        c_asia.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(_revenue_e4().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "join_semi_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: no payload duplication, build side only emits keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_no_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT IN shape, null-safe formulation)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_outer_order_counts",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COUNT(col) semantics (unmatched rows count 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_range_events_orders",
    """
    SELECT e.event_id, COUNT(*) AS n_concurrent
    FROM events e JOIN events f
      ON e.user_id = f.user_id
     AND f.ts BETWEEN e.ts - INTERVAL '5 minutes' AND e.ts
    WHERE e.event_type = 'purchase'
    GROUP BY e.event_id
    """,
)
def join_range_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range self-join (interval containment): equi-key on user_id
    carries the shuffle; the time predicate is evaluated post-join — the
    standard Spark shape for bounded-interval joins."""
    e = _t(spark, sf_dir, "events")
    f = _t(spark, sf_dir, "events")
    ev = e.where(F.col("event_type") == "purchase").alias("e")
    fv = f.alias("f")
    return (
        ev.join(
            fv,
            (F.col("e.user_id") == F.col("f.user_id"))
            & (F.col("f.ts") >= F.col("e.ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("f.ts") <= F.col("e.ts")),
        )
        .groupBy(F.col("e.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "window_rank_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window top-N per partition."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rn",
        )
    )


@query(
    "window_running_total",
    """
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over an ordered frame (UNBOUNDED PRECEDING..CURRENT ROW)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@query(
    "window_lag_lead_events",
    """
    SELECT event_id, user_id,
           ROUND(LAG(value)  OVER w, 4) AS prev_value,
           ROUND(LEAD(value) OVER w, 4) AS next_value,
           CAST(FLOOR(epoch(ts)) AS BIGINT)
             - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation plus inter-event gap seconds per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias("gap_s"),
    )


# --------------------------------------------------------------------------
# Sorts / top-k / pagination
# --------------------------------------------------------------------------


@query(
    "topk_offset_orders",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
)
def topk_offset_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O18 generalized (LIMIT/OFFSET with deterministic ties)."""
    o = _t(spark, sf_dir, "orders")
    out = top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], k=10, skip=5)
    return out.select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))


@query(
    "filter_caseins_topk",
    """
    SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE LOWER(c_mktsegment) IN ('building', 'machinery')
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10 OFFSET 2
    """,
)
def filter_caseins_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O14+O18 on a relational table: the exact filter shape of
    `LOWER(type) = ANY($types)` (reference backend/models.py:159-164)."""
    c = _t(spark, sf_dir, "customer")
    filtered = c.where(F.lower(F.col("c_mktsegment")).isin(["building", "machinery"]))
    out = top_k(filtered, [F.col("c_acctbal").desc(), F.col("c_custkey").asc()], k=10, skip=2)
    return out.select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "set_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation (distinct semantics)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_keys",
    """
    SELECT c_custkey % 100 AS k FROM customer
    EXCEPT
    SELECT s_suppkey % 77 FROM supplier
    """,
)
def set_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) with a guaranteed-nonempty difference."""
    c = _t(spark, sf_dir, "customer").select((F.col("c_custkey") % 100).alias("k"))
    s = _t(spark, sf_dir, "supplier").select((F.col("s_suppkey") % 77).alias("k"))
    return c.subtract(s)


@query(
    "set_union_keys",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION
    SELECT s_nationkey, 'supplier' FROM supplier
    """,
)
def set_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct dedup across tagged sides."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.union(s).distinct()


# --------------------------------------------------------------------------
# Scalar functions: string / date / math / JSON
# --------------------------------------------------------------------------


@query(
    "string_funcs_part",
    """
    SELECT p_partkey,
           UPPER(p_name)                                    AS name_upper,
           LOWER(p_brand)                                   AS brand_lower,
           SUBSTR(p_type, 1, 4)                             AS type_prefix,
           regexp_extract(p_brand, '([0-9]+)', 1)           AS brand_num,
           LENGTH(p_name)                                   AS name_len,
           CONCAT(p_brand, '-', p_type)                     AS brand_type,
           REPLACE(p_name, ' ', '_')                        AS name_snake
    FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: case, substring, regexp extract/replace, length, concat."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@query(
    "date_funcs_orders",
    """
    SELECT o_orderkey,
           EXTRACT(year  FROM o_orderdate)::BIGINT AS order_year,
           EXTRACT(month FROM o_orderdate)::BIGINT AS order_month,
           EXTRACT(day   FROM o_orderdate)::BIGINT AS order_day,
           EXTRACT(quarter FROM o_orderdate)::BIGINT AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))::BIGINT AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar functions: extract, trunc, diff, last_day."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.trunc("o_orderdate", "month").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_start"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "math_funcs_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 6)        AS abs_disc,
           ROUND(SQRT(l_quantity), 6)              AS sqrt_qty,
           ROUND(LN(l_extendedprice + 1), 6)       AS ln_price,
           ROUND(POW(l_quantity, 2), 4)            AS qty_sq,
           CAST(CEIL(l_extendedprice)  AS BIGINT)  AS ceil_price,
           CAST(FLOOR(l_extendedprice) AS BIGINT)  AS floor_price,
           GREATEST(l_tax, l_discount)             AS max_rate,
           l_linenumber % 3                        AS ln_mod
    FROM lineitem
    """,
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions: abs/sqrt/ln/pow/ceil/floor/greatest/modulo."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_price"),
        F.floor("l_extendedprice").cast("long").alias("floor_price"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        (F.col("l_linenumber") % 3).alias("ln_mod"),
    )


@query(
    "json_extract_events",
    """
    SELECT event_id,
           json_extract_string(props, '$.k')::BIGINT AS k_val,
           LENGTH(props) AS props_len
    FROM events
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column with typed cast.

    `props` is valid JSON by table contract; outside it the engines
    diverge by design (Spark's get_json_object nulls malformed input,
    DuckDB's json_extract_string errors) — the dirty-data-tolerant
    surface is `try_funcs_dirty_data`, not this entry."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.length("props").cast("long").alias("props_len"),
    )


# --------------------------------------------------------------------------
# Dedup (exact, deterministic) — reference O2 generalized
# --------------------------------------------------------------------------


@query(
    "dedup_distinct_pairs",
    "SELECT DISTINCT lang, source FROM documents",
)
def dedup_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via DISTINCT projection (reference drop_duplicates parity)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("lang", "source").dropDuplicates()


@query(
    "dedup_first_event_per_key",
    """
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id,
           COUNT(*)      AS n_rows
    FROM events
    GROUP BY user_id, event_type
    """,
)
def dedup_first_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact dedup (keep min-id row per key) — the
    oracle-safe form of reference backend/load_data.py:177's first-wins."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Event-time windows (batch; SURVEY.md §7.6)
# --------------------------------------------------------------------------


@query(
    "tumbling_window_1h",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start_s,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 10000.0 + 0.5) / 10000.0 AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def tumbling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 1-hour event-time windows (epoch-aligned buckets)."""
    e = _t(spark, sf_dir, "events")
    out = tumbling_window_agg(
        e,
        "1 hour",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            floor_round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        ],
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "n_events",
        "sum_value",
        "n_users",
    )


@query(
    "sliding_window_1h_30m",
    """
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws, value FROM events
    )
    SELECT CAST(epoch(ws) AS BIGINT) AS window_start_s,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM assigned
    GROUP BY 1
    """,
)
def sliding_window_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows (each event in duration/slide buckets)."""
    e = _t(spark, sf_dir, "events")
    out = sliding_window_agg(e, "1 hour", "30 minutes")
    return out.select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "n_events",
        "sum_value",
    )


@query(
    "session_windows_30m",
    """
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             (SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
           CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS session_end_s,
           FLOOR(SUM(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization (gap-and-islands window form)."""
    e = _t(spark, sf_dir, "events")
    out = session_window_agg(e, gap_minutes=30)
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        F.col("session_start").cast("long").alias("session_start_s"),
        F.col("session_end").cast("long").alias("session_end_s"),
        "sum_value",
    )


# --------------------------------------------------------------------------
# Additional TPC-H shapes (Q4/Q6/Q12/Q14 analogues on the driver schema)
# --------------------------------------------------------------------------


@query(
    "q4_priority_with_late_items",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL '90 days')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered count per priority (semi join with a
    cross-table date predicate, then low-cardinality agg)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    * CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate scan → scalar agg; every filter
    pushes to the parquet scan (zero shuffle beyond the final reduce).
    The price×discount sum runs in exact cents×percent units (the
    _revenue_e4 decimal-tie rationale)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    dpct = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(cents * dpct).cast("double") / 10000.0).alias("revenue"))
    )


@query(
    "q12_priority_by_year",
    """
    SELECT EXTRACT(year FROM l_shipdate)::BIGINT AS ship_year,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def q12_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional-sum pivot on a derived key."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "q14_economy_revenue_share",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           ROUND(100.0 * SUM(CASE WHEN p_type = 'ECONOMY'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS economy_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    GROUP BY 1
    """,
)
def q14_economy_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share (join + two-branch sum
    ratio); part dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.trunc("l_shipdate", "month").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("economy_share_pct")
        )
    )


@query(
    "window_ntile_quartiles",
    """
    SELECT o_orderkey,
           NTILE(4) OVER w AS price_quartile,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/first_value/nth_value window navigation (deterministic ties).

    The frame for nth_value must be UNBOUNDED..UNBOUNDED so row 1 also sees
    the partition's second row."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


@query(
    "asof_join_purchase_signup",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         s AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id,
           s.event_id AS signup_id,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT)
             - CAST(FLOOR(epoch(s.ts)) AS BIGINT) AS gap_s
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
)
def asof_join_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase enriched with the user's latest signup
    at-or-before it (operators/asof.py union-sort construction — one
    shuffle, no join explosion; oracle is DuckDB's native ASOF JOIN)."""
    from ..operators.asof import as_of_join

    e = _t(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase")
    s = e.where(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    out = as_of_join(p, s, on="user_id", ts_col="ts", right_cols=["event_id"])
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("signup_id"),
        (F.col("ts").cast("long") - F.col("ts_right").cast("long")).alias("gap_s"),
    )


@query(
    "time_hierarchy_rollup",
    """
    SELECT EXTRACT(year FROM ts)::BIGINT  AS y,
           EXTRACT(month FROM ts)::BIGINT AS m,
           EXTRACT(day FROM ts)::BIGINT   AS d,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM events
    GROUP BY ROLLUP (EXTRACT(year FROM ts), EXTRACT(month FROM ts), EXTRACT(day FROM ts))
    """,
)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: day→month→year→grand-total subtotals
    in one pass (ROLLUP over the extracted time hierarchy)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("y", F.year("ts").cast("long"))
        .withColumn("m", F.month("ts").cast("long"))
        .withColumn("d", F.dayofmonth("ts").cast("long"))
        .rollup("y", "m", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            floor_round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query(
    "rolling_1h_user_stats",
    """
    SELECT event_id, user_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           COUNT(*) OVER w AS n_1h,
           ROUND(SUM(value) OVER w, 2) AS sum_1h,
           FLOOR(SUM(value) OVER w * 100.0 / (COUNT(*) OVER w) + 0.5) / 100.0 AS avg_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_1h_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour per-user rolling stats via a RANGE frame over epoch
    seconds (the time-based sibling of the ROWS running total): the frame is
    value-bounded, so peers at the same second aggregate identically in any
    engine. One shuffle on user_id; frames never cross users. The mean uses
    floor(x·100 + 0.5)/100 instead of ROUND: 2-decimal inputs make exact
    .005 halves COMMON, and ROUND-on-double resolves them differently per
    engine — floor arithmetic is bit-identical everywhere."""
    e = _t(spark, sf_dir, "events").withColumn("__es", F.col("ts").cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__es").asc())
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.col("__es").alias("es"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
        (
            F.floor(
                F.sum("value").over(w) * F.lit(100.0) / F.count(F.lit(1)).over(w)
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("avg_1h"),
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT 1::BIGINT AS step, 'view' AS step_name, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT 2::BIGINT, 'click', COUNT(*) FROM c
    UNION ALL
    SELECT 3::BIGINT, 'purchase', COUNT(*) FROM p
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked strictly
    after their first view, then purchased strictly after that click —
    per-step reached-user counts (the MATCH_RECOGNIZE-lite every event
    analytics stack needs).

    Scale shape: three conditional min-aggs chained by co-partitioned
    user_id equi-joins — the SAME shuffle key throughout, so at 100 TB one
    repartition(user_id) co-locates every stage; no window over the full
    event stream, no per-user event collection."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _step(df: DataFrame, idx: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )

    return _step(v, 1, "view").unionAll(_step(c, 2, "click")).unionAll(
        _step(p, 3, "purchase")
    )


@query(
    "skewed_agg_salted",
    """
    SELECT o_orderstatus,
           COUNT(*) AS o_totalprice_count,
           ROUND(SUM(o_totalprice), 2) AS price_sum
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.salted_agg) over the
    heavily-skewed o_orderstatus key (one status dominates): phase 1 sprays
    each hot group across 16 salted partials, phase 2 re-merges — the
    result is salt-independent by construction, so the oracle is the plain
    GROUP BY. Floating sums re-associate across salts, hence ROUND(2) on a
    2-decimal-valued column (exact at any association)."""
    from ..operators.skew import salted_agg

    o = _t(spark, sf_dir, "orders")
    out = salted_agg(
        o, ["o_orderstatus"], {"o_totalprice": "sum", "o_totalprice2": "count"}, n_salts=16
    )
    # salted_agg names outputs <col>_<how>; count uses a dummy column name
    return out.select(
        "o_orderstatus",
        F.col("o_totalprice2_count").alias("o_totalprice_count"),
        F.round("o_totalprice_sum", 2).alias("price_sum"),
    )


def _checksum_sql() -> str:
    from ..functions.text import _FP_MOD

    h = (
        f"(o_orderkey * 1000003 + o_custkey * 9176"
        f" + CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 31) % {_FP_MOD}"
    )
    return f"""
    SELECT COUNT(*) AS n_rows, bit_xor({h}) AS checksum
    FROM orders
    """


@query("table_checksum_orders", _checksum_sql())
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum for cross-cluster data validation
    (did the 100 TB copy/migration/upsert preserve every row?): XOR-fold of
    a deterministic per-row hash. XOR is commutative/associative and never
    overflows, so the result is identical under ANY partitioning or row
    order — and cheap: one map-side-combining agg, 8-byte partials. The
    per-term products are provably < 2^63 (ANSI-safe)."""
    from ..functions.text import _FP_MOD

    o = _t(spark, sf_dir, "orders")
    h = F.pmod(
        F.col("o_orderkey") * F.lit(1000003)
        + F.col("o_custkey") * F.lit(9176)
        + F.floor(F.col("o_totalprice") * 100).cast("long") * F.lit(31),
        F.lit(_FP_MOD),
    )
    return o.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__h)").alias("checksum"),
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def _profile_oracle_sql() -> str:
    arms = "\n    UNION ALL\n".join(
        f"""    SELECT '{c}' AS col, COUNT(*) AS n_rows, COUNT({c}) AS n_nonnull,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_v, CAST(MAX({c}) AS VARCHAR) AS max_v
    FROM orders"""
        for c in _PROFILE_COLS
    )
    return arms


@query("column_profile_orders", _profile_oracle_sql())
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profiling (operators/profile.profile_columns):
    null/distinct/min/max for five orders columns in ONE scan — a single
    aggregate emits every statistic, then a 1-row explode unpivots to
    row-per-column (the oracle's UNION form rescans per column; the engine
    does not). Profiled columns are integer/string so min/max stringify
    identically across engines."""
    from ..operators.profile import profile_columns

    o = _t(spark, sf_dir, "orders")
    return profile_columns(o, _PROFILE_COLS)


# --------------------------------------------------------------------------
# SQL-string surface (spark.sql over registered temp views)
# --------------------------------------------------------------------------

_SQL_SURFACE_Q = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                         * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)))
                     AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-07-01'
    GROUP BY l_returnflag, l_linestatus
"""


@query("sql_surface_pricing", _SQL_SURFACE_Q)
def sql_surface_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL-string entry point: `schemas.register_temp_views`
    exposes every driver table as a temp view and the IDENTICAL SQL text
    runs on spark.sql and on the DuckDB oracle — one string, two engines,
    same rows. Proves a reference user who writes SQL (the reference's
    only query interface is a SQL string, reference backend/models.py:186)
    can hand that string to this engine and get the same Catalyst plan
    quality as the DataFrame API (same filter pushdown + partial aggs;
    Catalyst compiles both to the same physical plan shape)."""
    from ..schemas import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE_Q)


@query(
    "window_percent_rank_prices",
    """
    SELECT o_orderkey, o_orderpriority,
           FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume_d
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions: percent_rank and cume_dist of
    each order's total within its priority class (the normalized-rank
    shape percentile-based filtering and score calibration use).

    The ORDER BY carries the unique o_orderkey tie-break, so ranks are a
    total order; percent_rank/cume_dist are then exact integer ratios that
    both engines compute identically — the floor-form rounding is a
    bit-identical formality. One shuffle on the partition key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.floor(F.percent_rank().over(w) * 1000000.0 + F.lit(0.5)) / 1000000.0).alias(
            "pct_rank"
        ),
        (F.floor(F.cume_dist().over(w) * 1000000.0 + F.lit(0.5)) / 1000000.0).alias(
            "cume_d"
        ),
    )


@query(
    "user_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    a AS (
      SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS d FROM events e)
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, a.d)::BIGINT AS day_offset,
           COUNT(*) AS n_users
    FROM a JOIN f USING (user_id)
    WHERE a.d >= f.cohort_day
    GROUP BY f.cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-purchase day, and
    for each (cohort, day-offset) the count of cohort members active that
    day — THE standard product-analytics retention query.

    Scale shape: both the cohort table and the distinct (user, day)
    activity table aggregate on user_id — one co-partitioned shuffle key
    end-to-end, then the cohort side (1 row per user) joins back without
    moving the bigger side. All outputs are dates and integer counts —
    nothing to round."""
    e = _t(spark, sf_dir, "events")
    f = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    a = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        a.join(f, "user_id")
        .where(F.col("d") >= F.col("cohort_day"))
        .groupBy("cohort_day", F.datediff("d", "cohort_day").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "approx_stats_events",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           1::BIGINT AS users_ok,
           ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
           1::BIGINT AS p50_ok
    FROM events GROUP BY event_type
    """,
)
def approx_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB forms of distinct-count and percentile — HyperLogLog++
    (approx_count_distinct) and Greenwald-Khanna (approx_percentile) —
    graded INSIDE the gate: the entry emits the exact statistics plus
    0/1 flags asserting the sketch landed within tolerance (10% relative
    for HLL at rsd=0.01 — a ~10-sigma margin; the rsd is a standard
    deviation, not a worst-case bound, so the margin is chosen wide
    enough that a tail draw on regenerated testdata is beyond-astronomical
    rather than merely unlikely; for the p50 the bound is membership in
    the [lower-middle, upper-middle] order-statistic interval — the form
    GK's rank guarantee actually takes, since the sketch returns an
    element while the exact median interpolates — union the 5% relative
    band for dense groups). The flags
    are order-independent, so the oracle states them as 1 literals
    (emitted as BIGINT, a driver-proven output type, rather than BOOLEAN);
    the tight-tolerance assertions live in pytest, not the hash gate.

    Scale shape: both sketches are constant-size mergeable partials
    (map-side combine, one k-row shuffle); this is the drop-in the exact
    entries' docstrings promise at 100 TB, here proven within bounds."""
    e = _t(spark, sf_dir, "events")
    a = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("__u_approx"),
        F.percentile("value", F.lit(0.5)).alias("__p50"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__p50_approx"),
        # order statistics adjacent to the true median: GK returns an
        # ACTUAL element, so on a small even-sized group the exact
        # (interpolated) median can sit far from ANY element — e.g. two
        # values {0.01, 0.02} interpolate to 0.015, 33% from either — and
        # a value-relative tolerance alone is simply a false claim (found
        # by the random-events property gate). The honest bound: the
        # sketch median lies within [lower-middle, upper-middle] (exact
        # for n ≤ accuracy), widened by the 5% relative band for dense
        # many-row groups where rank slack of n/accuracy crosses elements.
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("__p50_lo"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value DESC)").alias("__p50_hi"),
    )
    return a.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("__u_approx") - F.col("n_users_exact"))
            <= 0.10 * F.col("n_users_exact")
        ).cast("long").alias("users_ok"),
        F.round("__p50", 4).alias("p50_exact"),
        (
            (
                (F.col("__p50_approx") >= F.col("__p50_lo"))
                & (F.col("__p50_approx") <= F.col("__p50_hi"))
            )
            | (
                F.abs(F.col("__p50_approx") - F.col("__p50"))
                <= 0.05 * F.abs(F.col("__p50"))
            )
        ).cast("long").alias("p50_ok"),
    )


@query(
    "bucketed_join_revenue",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    * (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both sides are written
    bucketed (8 buckets, same key) and sorted within buckets, so the join
    runs WITHOUT a shuffle on either side — bucket i joins bucket i
    in-place (tests/test_r4_catalog.py asserts no Exchange feeds the
    join). This is the pre-partitioning strategy that amortizes the big
    fact-fact shuffle at 100 TB: pay the layout once at write time, then
    every keyed join and per-key agg reads co-located data.

    The result is identical to the plain join the oracle runs — bucketing
    changes the physical plan, never the answer."""
    _sweep_stale_bucketed(spark)

    def _bucketed(df: DataFrame, name: str, key: str) -> DataFrame:
        # the in-memory catalog forgets managed tables between sessions but
        # their warehouse locations persist — drop both before rewriting.
        # The name carries the pid so two processes sharing a warehouse
        # (a gate run next to a bench run) can never rmtree each other's
        # live bucket files.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        _rm_warehouse_dir(spark, name)
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)
        return spark.table(name)

    import os

    names = [f"bkt_orders_{os.getpid()}", f"bkt_lineitem_{os.getpid()}"]
    _atexit_rm_bucketed(spark, names)
    bo = _bucketed(_t(spark, sf_dir, "orders"), names[0], "o_orderkey")
    bl = _bucketed(_t(spark, sf_dir, "lineitem"), names[1], "l_orderkey")
    return (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _revenue_e4().alias("revenue"),
        )
    )


def _warehouse_root(spark: SparkSession) -> str | None:
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    return wh.path if wh.scheme in ("", "file") else None


def _rm_warehouse_dir(spark: SparkSession, table_name: str) -> None:
    import os
    import shutil

    root = _warehouse_root(spark)
    if root is not None:
        loc = os.path.join(root, table_name)
        if os.path.exists(loc):
            shutil.rmtree(loc, ignore_errors=True)


_ATEXIT_REGISTERED: set[str] = set()


def _atexit_rm_bucketed(spark: SparkSession, names: list[str]) -> None:
    """Remove this pid's bucketed warehouse dirs at interpreter exit.

    The returned DataFrame reads the bucketed files LAZILY (callers collect
    after this function returns, and plan-inspection tests never collect at
    all), so the files must outlive the call — cleanup happens at process
    exit, pure filesystem (the in-memory catalog dies with the process
    anyway). A killed process skips atexit; the dead-pid sweep at the next
    entry covers that case."""
    import atexit
    import shutil

    root = _warehouse_root(spark)
    if root is None:
        return
    for n in names:
        if n in _ATEXIT_REGISTERED:
            continue
        _ATEXIT_REGISTERED.add(n)
        import os

        atexit.register(
            lambda loc=os.path.join(root, n): shutil.rmtree(loc, ignore_errors=True)
        )


def _sweep_stale_bucketed(spark: SparkSession) -> None:
    """Remove ``bkt_*_<pid>`` warehouse directories left by DEAD processes.

    A killed gate/bench run can leak its pid-suffixed bucketed tables (the
    pid never recurs, so the by-name drop never fires again). Live pids are
    skipped, so concurrent runs sharing a warehouse stay untouched."""
    import os
    import shutil

    root = _warehouse_root(spark)
    if root is None or not os.path.isdir(root):
        return
    for d in os.listdir(root):
        if not d.startswith("bkt_"):
            continue
        pid_s = d.rsplit("_", 1)[-1]
        if not pid_s.isdigit() or int(pid_s) == os.getpid():
            continue
        try:
            os.kill(int(pid_s), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        except PermissionError:
            pass  # pid exists under another uid — leave it


@query(
    "set_ops_all_variants",
    """
    SELECT 'except_all' AS op, o_orderpriority, COUNT(*) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'intersect_all', o_orderpriority, COUNT(*) FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
    GROUP BY o_orderpriority
    """,
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the multiplicity-preserving set ops
    (bag semantics: per value, max(0, m−n) and min(m, n) copies), which the
    distinct-variant entries don't exercise. Summarized per key so the
    output is small and stable.

    Scale shape: Spark plans both as a single hash-partitioned count-
    compare per key — same cost class as a grouped count, no pairwise
    matching."""
    o = _t(spark, sf_dir, "orders")
    left = o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    right = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")

    def _summ(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit(tag).alias("op"), "o_orderpriority", "n")

    return _summ(left.exceptAll(right), "except_all").unionAll(
        _summ(left.intersectAll(right), "intersect_all")
    )


@query(
    "null_safe_join_counts",
    """
    WITH l AS (SELECT NULLIF(c_custkey % 7, 0) AS k, COUNT(*) AS nl
               FROM customer GROUP BY 1),
         r AS (SELECT NULLIF(o_custkey % 7, 0) AS k, COUNT(*) AS nr
               FROM orders GROUP BY 1)
    SELECT l.k AS k, (l.nl * r.nr)::BIGINT AS n_pairs
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT FROM):
    NULL keys match each other instead of vanishing — the semantics a
    dimension join needs when 'unknown' is a real category. Keys are made
    nullable via NULLIF so the NULL bucket actually exercises the path.

    Scale shape: null-safe equality still hash-partitions both sides on
    the key (NULL hashes like any value under `<=>`), so the plan is a
    plain equi-join. Both sides aggregate to per-key counts BEFORE the
    join (pair count = nl·nr) — joining raw rows on a 7-value key would
    materialize the full pair explosion, which is exactly the mistake
    this shape exists to avoid at 100 TB."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    left = (
        c.select(F.nullif(F.col("c_custkey") % 7, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    right = (
        o.select(F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("rk"))
        .groupBy("rk")
        .agg(F.count(F.lit(1)).alias("nr"))
    )
    return left.join(right, left.k.eqNullSafe(right.rk)).select(
        "k", (F.col("nl") * F.col("nr")).alias("n_pairs")
    )


@query(
    "resample_ffill_15m",
    """
    WITH bounds AS (
      SELECT user_id, time_bucket(INTERVAL '15 minutes', MIN(ts)) AS t0,
             time_bucket(INTERVAL '15 minutes', MAX(ts)) AS t1
      FROM events WHERE user_id < 3 GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL '15 minutes')) AS slot
      FROM bounds),
    obs AS (
      SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS slot,
             ROUND(SUM(value), 2) AS v
      FROM events WHERE user_id < 3 GROUP BY user_id, 2),
    j AS (
      SELECT g.user_id, g.slot, o.v
      FROM grid g LEFT JOIN obs o USING (user_id, slot))
    SELECT user_id, CAST(epoch(slot) AS BIGINT) AS slot_s,
           COALESCE(v, LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v_ffill
    FROM j
    """,
)
def resample_ffill_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's event stream onto a
    dense 15-minute grid and forward-fill gaps with the last observed
    value — the resample/ffill every metrics store and feature pipeline
    runs before joining series with different cadences. (Probe scope
    user_id < 3 bounds the graded output; the plan is per-user generic.)

    The grid starts at each user's first observed bucket, so no leading
    NULLs survive the fill. Scale shape: the spine is a map-side
    sequence-explode off a 1-row-per-user bounds agg; observations and
    grid co-partition on user_id; the fill is one window over each user's
    slots — never a cross-user sort. SUM→ROUND(2) of 2-decimal data is
    tie-safe (the true sum has no third decimal)."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 3)
    slot = F.window("ts", "15 minutes").start
    bounds = e.groupBy("user_id").agg(
        F.min(slot).alias("t0"), F.max(slot).alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 15 minutes)")).alias("slot"),
    )
    obs = (
        e.groupBy("user_id", slot.alias("slot"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "slot"], "left")
        .select(
            "user_id",
            F.col("slot").cast("long").alias("slot_s"),
            F.coalesce("v", F.last("v", ignorenulls=True).over(w)).alias("v_ffill"),
        )
    )


@query(
    "order_date_spine_counts",
    """
    WITH b AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
             MAX(CAST(o_orderdate AS DATE)) AS d1
      FROM orders),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL '1 day'))::DATE AS day FROM b),
    c AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT s.day, COALESCE(c.n_orders, 0)::BIGINT AS n_orders
    FROM spine s LEFT JOIN c USING (day)
    """,
)
def order_date_spine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine: daily order counts with zero-filled gaps — the
    date-dimension left join every reporting layer needs so missing days
    read as 0 instead of vanishing.

    Scale shape: the spine is a sequence-explode off a two-scalar bounds
    agg (a few thousand rows for decades of days) and BROADCASTS onto the
    counts; the fact side never reshuffles beyond its own count agg."""
    o = _t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    b = o.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    spine = b.select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    c = o.groupBy(day.alias("day")).agg(F.count(F.lit(1)).alias("n_orders"))
    return spine.join(c, "day", "left").select(
        "day", F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders")
    )


@query(
    "rank_with_ties_topk",
    """
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS price, rnk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def rank_with_ties_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group under RANK semantics: ties share a rank and are ALL
    kept (the row_number entries deliberately break ties; this one proves
    the tie-INCLUSIVE contract — the testdata's duplicate o_totalprice
    makes the distinction observable). Identical gap-rank semantics per
    engine, so no tie-break column is needed or wanted.

    Scale shape: rank ≤ k is WindowGroupLimit-pushed in Spark — each
    partition keeps only candidate rows before the window shuffle."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rnk",
        )
    )


@query(
    "data_quality_checks_orders",
    """
    SELECT 'null_custkey' AS rule,
           COUNT(*) FILTER (WHERE o_custkey IS NULL)::BIGINT AS violations
    FROM orders
    UNION ALL
    SELECT 'nonpositive_price', COUNT(*) FILTER (WHERE o_totalprice <= 0)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'duplicate_orderkey', (COUNT(*) - COUNT(DISTINCT o_orderkey))::BIGINT
    FROM orders
    UNION ALL
    SELECT 'orphan_custkey', COUNT(*)::BIGINT
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'unknown_status', COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))::BIGINT
    FROM orders
    """,
)
def data_quality_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite validation (the Great-Expectations/dbt-test shape):
    one row per data-contract rule with its violation count — completeness
    (null keys), range (non-positive totals), uniqueness (duplicate keys),
    referential integrity (orphan foreign keys), and domain membership
    (unknown status codes). The gate a pipeline runs on every snapshot
    BEFORE the data reaches dedup/training; with checksum and profiling it
    completes the ops-tooling trio.

    Scale shape: the four scan rules are conditional aggregates in ONE
    map-combined pass (stack-unpivoted to rows afterward); referential
    integrity is a left-anti count whose dim side broadcasts — two scans
    of the fact table total. Nothing shuffles more than agg state."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def _viol(col):
        # count-of-matches, not SUM(CASE): on an EMPTY table SUM is NULL
        # while the oracle's COUNT(*) FILTER is 0 — an empty snapshot has
        # zero violations, not unknown violations
        return F.count(F.when(col, 1)).cast("long")

    # four rules = ONE scan pass (a single conditional aggregate), then a
    # 1-row stack-unpivot to the per-rule layout
    onepass = o.agg(
        _viol(F.col("o_custkey").isNull()).alias("null_custkey"),
        _viol(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "duplicate_orderkey"
        ),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "unknown_status"
        ),
    ).select(
        F.expr(
            "stack(4, 'null_custkey', null_custkey,"
            " 'nonpositive_price', nonpositive_price,"
            " 'duplicate_orderkey', duplicate_orderkey,"
            " 'unknown_status', unknown_status) AS (rule, violations)"
        )
    )
    orphan = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("orphan_custkey").alias("rule"), "violations")
    )
    return onepass.unionAll(orphan)


@query(
    "revenue_share_window",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_orderpriority)
                 * 1000000.0, 4) AS share_ppm
    FROM orders
    """,
)
def revenue_share_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its priority class's total
    revenue (emitted in parts-per-million for resolution) — the
    share-of-total window every BI layer and mixture-weighting step runs.

    The whole-partition SUM aggregates in engine-specific order, so the
    two engines agree only to the last ulp — ROUND(.,4) on the ppm scale
    absorbs that (the convention's ratios→4, shifted six orders so small
    shares keep significant digits). One shuffle on the partition key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            F.col("o_totalprice") / F.sum("o_totalprice").over(w) * 1000000.0, 4
        ).alias("share_ppm"),
    )


@query(
    "try_funcs_dirty_data",
    """
    WITH t AS (
      SELECT l_returnflag,
             l_extendedprice / NULLIF(l_quantity - 25, 0) AS div_safe,
             TRY_CAST(CASE WHEN l_orderkey % 7 = 0 THEN 'N/A'
                           ELSE CAST(l_linenumber AS VARCHAR) END AS INTEGER)
               AS cast_safe
      FROM lineitem)
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN div_safe IS NULL THEN 1 END) AS n_div_null,
           CAST(SUM(CAST(FLOOR(div_safe * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_div_cents,
           COUNT(CASE WHEN cast_safe IS NULL THEN 1 END) AS n_cast_null,
           CAST(SUM(cast_safe) AS BIGINT) AS sum_cast
    FROM t GROUP BY l_returnflag
    """,
)
def try_funcs_dirty_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data safety under ANSI mode (Spark 4 default, session-wide
    here): a plain division hitting zero or a CAST hitting a malformed
    string ABORTS the whole job — at 100 TB one bad row of a trillion
    kills hours of work. try_divide / try_cast degrade to NULL instead,
    and this entry grades that NULL algebra end-to-end: per-flag counts
    of nulled divisions (quantity == 25) and nulled casts (synthetic
    'N/A' rows), plus exact sums over the survivors. Divisions are
    cents-floored PER ELEMENT before summing, so the aggregate is an
    exact integer — immune to the partition-order float drift a raw
    SUM(double) of 600k signed terms would have. The oracle spells the
    same semantics in portable SQL (NULLIF guard + TRY_CAST)."""
    li = _t(spark, sf_dir, "lineitem")
    div = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
    cast_safe = F.expr(
        "try_cast(CASE WHEN l_orderkey % 7 = 0 THEN 'N/A'"
        " ELSE CAST(l_linenumber AS STRING) END AS INT)"
    )
    t = li.select(
        "l_returnflag",
        div.alias("div_safe"),
        cast_safe.alias("cast_safe"),
    )
    return t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("div_safe").isNull(), 1)).alias("n_div_null"),
        F.sum(F.floor(F.col("div_safe") * 100.0 + 0.5).cast("long")).alias(
            "sum_div_cents"
        ),
        F.count(F.when(F.col("cast_safe").isNull(), 1)).alias("n_cast_null"),
        F.sum("cast_safe").cast("long").alias("sum_cast"),
    )


@query(
    "target_encoding_smoothed",
    """
    WITH g AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_orderpriority),
    p AS (SELECT CAST(SUM(cents) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS prior
          FROM g)
    SELECT g.o_orderpriority, CAST(g.n AS BIGINT) AS n,
           FLOOR((CAST(g.cents AS DOUBLE) + p.prior * 50.0)
                 / (CAST(g.n AS DOUBLE) + 50.0) / 100.0 * 10000.0 + 0.5) / 10000.0
             AS encoded
    FROM g CROSS JOIN p
    """,
)
def target_encoding_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (m-estimate, m=50): replace a categorical
    feature with the shrunken mean of the target — the tabular-ML feature
    transform whose naive (unsmoothed, unsplit) form leaks labels; the
    prior-blended estimate (n·mean + m·prior)/(n + m) is the standard fix.

    Per-category sums are EXACT integer cents (the per-element floor
    convention), so the only doubles are the final blended divisions,
    computed with identical parenthesization and floor-rounded. One
    map-combined aggregate plus a 1-row prior broadcast — the shape holds
    at any cardinality because state per category is three numbers."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        ).alias("cents"),
    )
    p = g.agg(
        (
            F.sum("cents").cast("double") / F.sum("n").cast("double")
        ).alias("prior")
    )
    return g.crossJoin(F.broadcast(p)).select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        (
            F.floor(
                (F.col("cents").cast("double") + F.col("prior") * 50.0)
                / (F.col("n").cast("double") + 50.0)
                / 100.0
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("encoded"),
    )


@query(
    "psi_split_drift",
    """
    WITH b AS (
      SELECT CASE WHEN (o_orderkey * 2654435761) % 97 % 2 = 0
                  THEN 'ref' ELSE 'cur' END AS split,
             LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket
      FROM orders),
    c AS (SELECT split, bucket, COUNT(*) AS n FROM b GROUP BY split, bucket),
    t AS (SELECT split, SUM(n) AS tot FROM c GROUP BY split),
    m AS (
      SELECT r.bucket,
             CAST(r.n AS DOUBLE) / rt.tot AS p_ref,
             CAST(cu.n AS DOUBLE) / ct.tot AS p_cur
      FROM c r
      JOIN c cu ON cu.bucket = r.bucket AND cu.split = 'cur'
      JOIN t rt ON rt.split = 'ref'
      JOIN t ct ON ct.split = 'cur'
      WHERE r.split = 'ref')
    SELECT bucket,
           FLOOR(p_ref * 1e6 + 0.5) / 1e6 AS p_ref,
           FLOOR(p_cur * 1e6 + 0.5) / 1e6 AS p_cur,
           ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6) + 0.0 AS psi_term
    FROM m
    """,
)
def psi_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two deterministic hash-splits of
    orders — the train/serve drift monitor every production feature
    pipeline runs (PSI ≥ 0.2 pages someone). On identical-distribution
    splits the terms hover near zero, which is itself the assertion.

    Both engines bucket with the same integer arithmetic. The split
    predicate must be engine-portable (Spark's hash() is engine-private),
    so membership is a Knuth multiplicative scramble mod 97 mod 2 —
    identical exact-integer arithmetic on both engines, decorrelated from
    key order, provably < 2^63 under ANSI mode.
    Distribution ratios are count ratios (exact division) — dyadic
    denominators make exact 7-decimal ties possible, so they take the
    floor-round form on both engines (the q5/rolling_1h convention); the
    ln-derived psi_term stays on ROUND (irrational, no representable
    tie) with the −0.0 guard (differences straddle zero)."""
    o = _t(spark, sf_dir, "orders")
    b = o.select(
        F.when((F.col("o_orderkey") * 2654435761) % 97 % 2 == 0, F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("split"),
        F.least(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long"), F.lit(9)
        ).alias("bucket"),
    )
    c = b.groupBy("split", "bucket").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("split").agg(F.sum("n").alias("tot"))
    r = (
        c.where(F.col("split") == "ref")
        .select("bucket", F.col("n").alias("n_ref"))
        .join(
            c.where(F.col("split") == "cur").select(
                "bucket", F.col("n").alias("n_cur")
            ),
            "bucket",
        )
        .crossJoin(
            F.broadcast(
                t.groupBy().pivot("split", ["ref", "cur"]).sum("tot")
            )
        )
    )
    p_ref = F.col("n_ref").cast("double") / F.col("ref")
    p_cur = F.col("n_cur").cast("double") / F.col("cur")
    return r.select(
        "bucket",
        floor_round(p_ref, 6).alias("p_ref"),
        floor_round(p_cur, 6).alias("p_cur"),
        rnd_nz((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


@query(
    "cdc_upsert_snapshot",
    """
    WITH snap AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 3 <> 0),
    batch AS (
      SELECT o_orderkey AS k, 'U' AS status,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) + 500 AS cents
      FROM orders WHERE o_orderkey % 2 = 0),
    m AS (
      SELECT COALESCE(b.k, s.k) AS k,
             COALESCE(b.cents, s.cents) AS cents,
             CASE WHEN b.k IS NOT NULL AND s.k IS NOT NULL THEN 'update'
                  WHEN b.k IS NOT NULL THEN 'insert'
                  ELSE 'carry' END AS action
      FROM snap s FULL OUTER JOIN batch b ON s.k = b.k)
    SELECT action, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM m GROUP BY action
    """,
)
def cdc_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC upsert) — the Delta/Iceberg-shape snapshot update
    every warehouse ingest job runs: an incoming change batch is merged
    into the existing snapshot by key — matched rows take the batch's
    values (update), unmatched batch rows insert, untouched snapshot rows
    carry over. Spark-first physical shape: ONE full-outer sort-merge join
    on the key (exactly what a table-format MERGE plans under the hood),
    with the action tag and value coalesce as map-side projections, then a
    3-group scorecard aggregate — the per-action row/cents totals an
    upsert job publishes for reconciliation. Snapshot and batch are
    deterministic key-modulo slices of orders (batch rows get status 'U'
    and +500 cents so updates are observable); all money is exact integer
    cents (the _revenue_e4 discipline) so the totals hash bit-identically.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    snap = o.where(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("sk"), cents.alias("s_cents")
    )
    batch = o.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("bk"), (cents + F.lit(500)).alias("b_cents")
    )
    m = snap.join(batch, snap.sk == batch.bk, "full_outer").select(
        F.coalesce("b_cents", "s_cents").alias("cents"),
        F.when(F.col("bk").isNotNull() & F.col("sk").isNotNull(), "update")
        .when(F.col("bk").isNotNull(), "insert")
        .otherwise("carry")
        .alias("action"),
    )
    return m.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("total_cents"),
    )


# --------------------------------------------------------------------------
# Skyline / Pareto frontier
# --------------------------------------------------------------------------


@query(
    "pareto_frontier_parts",
    """
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) query: the parts for which no other part
    is at-least-as-cheap AND at-least-as-large with one strict improvement
    — multi-criteria shortlisting (cheapest-per-capability products,
    best-cost/quality training mixtures, non-dominated model checkpoints).
    The naive formulation is the oracle's quadratic NOT EXISTS self-join;
    the engine computes the identical set in O(n log n) without ANY join.

    Distributed skyline, the canonical two-phase sweep:

    1. LOCAL prune — genuinely exchange-free: `sortWithinPartitions`
       (price-cents asc, size desc, partkey) is a local sort, then one
       mapInPandas pass sweeps each partition in place. Given the sort,
       a row is dominated iff some PREVIOUS row in its partition has a
       strictly larger size, or the same size at strictly lower cents —
       so the whole sweep state is two scalars carried across Arrow
       batches: the running max size M and the cents of the first row
       that reached M (rows below M are dominated via M alone; rows at
       M compare against that first-cents; equal-(cents, size)
       duplicates compare equal and survive together). Vectorized per
       batch (numpy exclusive running max + a group-first on size).
       Local skylines shrink a partition to O(log n) rows in
       expectation — and NO full-input shuffle happens (the r9 cut
       keyed a window on spark_partition_id, which planned a balanced
       but avoidable Exchange over all n rows).
    2. GLOBAL sweep — the same dominance test as a window over the
       surviving candidates in a single partition (the plan's ONE
       Exchange, moving only the union of tiny local skylines).
       Correct because dominance is transitive: any globally dominated
       row is dominated by some local survivor, and a global-frontier
       row is undominated everywhere, so phase 1 can never drop it.

    Price enters the dominance logic as exact half-up cents (int64) so
    the tie handling never touches float arithmetic; output keeps the
    raw parquet doubles (no arithmetic ⇒ hash-exact; float64 is
    bit-preserved through Arrow).

    Anti-chain scale limit: if the input layout makes every partition an
    anti-chain, local prune passes everything and the global phase sees
    the full input. The mitigation is MEASURED CODE since r10 —
    `operators.skyline.recursive_skyline` (graded by
    `skyline_recursive_parts` on a deliberately anti-chain-clustered
    corpus); this entry stays on the plain two-phase form because the
    part table's random layout never triggers the regime.
    """
    from ..operators.skyline import skyline

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
        F.floor(F.col("p_retailprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    glob = skyline(p, cost="__cents", benefit="p_size", key="p_partkey")
    return glob.select("p_partkey", "p_retailprice", "p_size")


@query(
    "skyline_recursive_parts",
    """
    WITH pts AS (
      SELECT p_partkey AS k,
             CAST((p_partkey * 7) % 500 AS BIGINT) AS cost,
             CAST((p_partkey % 3) * 1000 + (p_partkey * 7) % 500
                  AS BIGINT) AS benefit
      FROM part)
    SELECT k, cost, benefit FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.cost <= p.cost AND q.benefit >= p.benefit
        AND (q.cost < p.cost OR q.benefit > p.benefit))
    """,
)
def skyline_recursive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE distributed skyline on an adversarially CLUSTERED corpus
    — the anti-chain regime the `pareto_frontier_parts` docstring only
    documented, now graded (VERDICT r9 #4b). Derived points: band =
    partkey%3, cost = (partkey·7)%500, benefit = 1000·band + cost.
    WITHIN a band, benefit rises exactly with cost — a pure anti-chain —
    and the input is range-repartitioned ON band, so every scan
    partition is an anti-chain and the plain local prune passes
    ~everything (the documented worst case, constructed on purpose).
    Across bands, band 2 dominates bands 0-1 point-for-point (same cost,
    +1000/+2000 benefit), so the TRUE frontier is band 2 alone: only
    re-HASHING the survivors (recursive_skyline's mitigation rounds)
    mixes bands into the same partitions and lets the local sweep kill
    the dominated two-thirds before the single-partition global phase.
    The driver-bounded loop exits early when a round shrinks <10% — the
    honest anti-chain floor (band 2 itself can never shrink; no
    algorithm shrinks a true anti-chain below its own size). All
    dominance arithmetic is int64; the oracle is the quadratic
    NOT EXISTS over the same derived points."""
    from ..operators.skyline import recursive_skyline

    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        ((F.col("p_partkey") * 7) % 500).cast("long").alias("cost"),
        ((F.col("p_partkey") % 3) * 1000 + (F.col("p_partkey") * 7) % 500)
        .cast("long")
        .alias("benefit"),
        (F.col("p_partkey") % 3).alias("band"),
    )
    clustered = p.repartitionByRange(3, "band").drop("band")
    return recursive_skyline(
        clustered, cost="cost", benefit="benefit", key="k", fit_rows=2000
    )


@query(
    "snapshot_diff_keys",
    """
    WITH cur AS (
      SELECT o_orderkey AS k,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 83 <> 0),
    prev AS (
      SELECT o_orderkey AS k,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
               + CASE WHEN o_orderkey % 89 = 0 THEN 100 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 97 <> 0),
    j AS (
      SELECT COALESCE(cur.k, prev.k) AS k, cur.k AS ck, prev.k AS pk,
             cur.cents AS cc, prev.cents AS pc
      FROM cur FULL JOIN prev ON cur.k = prev.k)
    SELECT CASE WHEN pk IS NULL THEN 'added'
                WHEN ck IS NULL THEN 'removed'
                WHEN cc <> pc THEN 'changed'
                ELSE 'same' END AS diff_class,
           COUNT(*) AS n_keys,
           CAST(SUM(COALESCE(cc, pc)) AS BIGINT) AS sum_cents
    FROM j
    GROUP BY 1
    """,
)
def snapshot_diff_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot DIFF — the data-versioning reconciliation op
    (Delta/Iceberg table_changes, dbt snapshot audit, CDC backfill
    verification): classify every key across two snapshot versions as
    added / removed / changed / same with exact value sums per class.
    The 'previous' snapshot is derived deterministically from the same
    orders table (keys ≡ 0 mod 97 absent from prev = adds; keys ≡ 0
    mod 83 absent from current = removes; keys ≡ 0 mod 89 price-shifted
    in prev = changes), so the oracle replays it closed-form and every
    class is non-empty at every SF.

    Mechanism: ONE full-outer sort-merge join on the key (the
    cdc_upsert_snapshot shape — both branch scans carry pushed-down
    key-modulo filters), CASE classification, map-combined class
    aggregate. All money exact int64 cents (the _revenue_e4
    discipline). At 100 TB: snapshot diff is the canonical
    co-partitioned join — bucketed snapshot storage makes the SMJ
    shuffle-free, and the class aggregate is 4 rows."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cur = o.where(k % 83 != 0).select(
        k.alias("ck"), cents.alias("cc")
    )
    prev = o.where(k % 97 != 0).select(
        k.alias("pk"),
        (cents + F.when(k % 89 == 0, F.lit(100)).otherwise(F.lit(0))).alias(
            "pc"
        ),
    )
    j = cur.join(prev, cur["ck"] == prev["pk"], "full_outer")
    cls = (
        F.when(F.col("pk").isNull(), F.lit("added"))
        .when(F.col("ck").isNull(), F.lit("removed"))
        .when(F.col("cc") != F.col("pc"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        j.select(cls.alias("diff_class"), F.coalesce("cc", "pc").alias("v"))
        .groupBy("diff_class")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("v").alias("sum_cents"),
        )
    )


@query(
    "asof_join_nearest",
    """
    WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    s AS (SELECT event_id AS sid, user_id, ts FROM events
          WHERE event_type = 'signup'),
    c AS (
      SELECT p.pid, p.user_id, s.sid,
             ABS(CAST(FLOOR(epoch(p.ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(s.ts)) AS BIGINT)) AS adiff,
             CAST(FLOOR(epoch(p.ts)) AS BIGINT)
               - CAST(FLOOR(epoch(s.ts)) AS BIGINT) AS gap_s,
             CASE WHEN FLOOR(epoch(s.ts)) <= FLOOR(epoch(p.ts))
                  THEN 0 ELSE 1 END AS fwd,
             ROW_NUMBER() OVER (
               PARTITION BY p.pid
               ORDER BY ABS(CAST(FLOOR(epoch(p.ts)) AS BIGINT)
                            - CAST(FLOOR(epoch(s.ts)) AS BIGINT)),
                        CASE WHEN FLOOR(epoch(s.ts)) <= FLOOR(epoch(p.ts))
                             THEN 0 ELSE 1 END,
                        CASE WHEN FLOOR(epoch(s.ts)) <= FLOOR(epoch(p.ts))
                             THEN -s.sid ELSE s.sid END
             ) AS rn
      FROM p JOIN s ON p.user_id = s.user_id)
    SELECT pid AS purchase_id, user_id, sid AS nearest_signup_id,
           adiff AS abs_gap_s, gap_s
    FROM c WHERE rn = 1
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof
    direction='nearest'`` / kdb ``aj`` nearest variant): each purchase
    gets the signup closest in time in EITHER direction, ties broken
    toward the earlier (backward) signup — completing the as-of family
    (`asof_join_purchase_signup` is backward-only). The oracle's
    quadratic per-key candidate rank is exactly what the engine must
    avoid. The entry's declared granularity is SECONDS end-to-end: the
    oracle classifies direction with FLOOR(epoch(...)) on both sides,
    matching the engine's ts.cast('long') truncation (ADVICE r13 — a
    raw-ts comparison would diverge on a signup raw-after but
    second-equal to the purchase; sub-second fixture pinned in
    tests/test_asof.py).

    Mechanism: the union-sort trick run BIDIRECTIONALLY under ONE
    shuffle — tag and union both sides, sort each user's timeline once
    by (ts, kind, sid) with signups before purchases at equal ts, then
    two frames over the SAME window spec (Spark reuses the sort):
    last(signup struct, ignorenulls) over unbounded-preceding = latest
    signup at-or-before, first(...) over rows-following = earliest
    strictly-after. The per-purchase pick is then a 2-way exact-int64
    comparison: backward wins iff its gap ≤ the forward gap (tie →
    backward, matching the oracle's fwd then ±sid ordering; within a
    same-ts signup group backward takes the max sid — the sort's last —
    and forward the min — the sort's first — which the oracle's
    direction-signed sid mirrors). Purchases of users with no signup at
    all drop (inner semantics, as the oracle's JOIN). One |p|+|s|-row
    shuffle on user_id, no join explosion, fully codegen."""
    e = _t(spark, sf_dir, "events")
    es = F.col("ts").cast("long")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        es.alias("pts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("sid"),
    )
    s = e.where(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("pid"),
        "user_id",
        es.alias("pts"),
        F.lit(0).alias("kind"),
        F.col("event_id").alias("sid"),
    )
    u = p.unionByName(s).withColumn(
        "sp",
        F.when(
            F.col("kind") == 0, F.struct(F.col("pts").alias("sts"), "sid")
        ),
    )
    base = Window.partitionBy("user_id").orderBy("pts", "kind", "sid")
    bwd = F.last("sp", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("sp", ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    rows = (
        u.select("pid", "user_id", "pts", "kind", bwd.alias("b"), fwd.alias("f"))
        .where(F.col("kind") == 1)
        .where(F.col("b").isNotNull() | F.col("f").isNotNull())
    )
    bgap = F.col("pts") - F.col("b.sts")
    fgap = F.col("f.sts") - F.col("pts")
    take_b = F.col("f").isNull() | (F.col("b").isNotNull() & (bgap <= fgap))
    return rows.select(
        F.col("pid").alias("purchase_id"),
        "user_id",
        F.when(take_b, F.col("b.sid")).otherwise(F.col("f.sid")).alias(
            "nearest_signup_id"
        ),
        F.when(take_b, bgap).otherwise(fgap).alias("abs_gap_s"),
        F.when(take_b, bgap).otherwise(-fgap).alias("gap_s"),
    )
