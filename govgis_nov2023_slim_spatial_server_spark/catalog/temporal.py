"""Temporal/behavioral analytics wave (r5 continuation): EWMA smoothing,
marketing-style last-touch attribution via the union-trick (the scale
replacement for per-pair as-of joins), SCD-2 interval construction from a
change log, and Wilson-bound conversion ranking.

All four run over `events` on ONE hash-partitioning of user_id — each is a
single-shuffle plan whose windows and final aggregates reuse the same
exchange (the property that makes them linear at 100 TB: no joins, no
driver state, per-user memory bounded by the frame).

The reference has no temporal surface at all (SURVEY.md §2.3 — it is a
stateless search API, reference backend/models.py:186-191); these are part
of the general-analytics engine the task spec requires on top of parity.
"""

from __future__ import annotations

import pandas as _pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import floor_round
from ..schemas import load_table
from ._registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# EWMA smoothing (bounded exact window)
# --------------------------------------------------------------------------


@query(
    "ewma_value_by_user",
    """
    WITH t AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cl
      FROM events)
    SELECT event_id, user_id, CAST(len(cl) AS BIGINT) AS n_window,
           FLOOR(list_reduce(cl, (acc, x) -> acc * 0.75 + x)
                 / ((1.0 - pow(0.75, len(cl))) / 0.25) * 10000.0 + 0.5) / 10000.0
             AS ewma_8
    FROM t
    """,
)
def ewma_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.25) of each user's event
    value over their trailing 8 events — the smoothed engagement signal a
    feature store materializes per entity.

    EWMA is a sequential recurrence (acc = (1-α)·acc + x), which SQL
    windows can't express directly — but over a BOUNDED frame it is a
    left fold of the frame's value list: collect the 8-row frame in
    window order and fold acc*0.75 + x. Spark's `F.aggregate` with a 0.0
    init and DuckDB's `list_reduce` (init = first element) execute the
    IDENTICAL multiply-add sequence (0.0*0.75 + x₀ = x₀ exactly), so the
    doubles agree bit-for-bit before the shared round. The normalizer is
    the closed-form geometric sum (1-0.75^L)/0.25 on both sides (powers
    of 3/4 are exact binary fractions). Rounding is the floor convention:
    cent-valued inputs over small power-of-two-ish denominators CAN land
    on exact x.xxxx5 decimals, where Spark's BigDecimal HALF_UP and
    DuckDB's binary round diverge (CLAUDE.md, the rolling_1h lesson) —
    floor(x·10⁴+0.5) is bit-identical on both engines.

    Scale shape: one user_id shuffle; per-row state is the ≤8-element
    frame list — O(1) memory per row regardless of corpus size, and the
    fold stays JVM-side (interpreted HOF over 8 elements, not a UDF)."""
    e = _t(spark, sf_dir, "events")
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    alpha_c = F.lit(0.75)
    t = e.select(
        "event_id",
        "user_id",
        F.collect_list("value").over(w8).alias("cl"),
    )
    num = F.aggregate(
        F.col("cl"), F.lit(0.0), lambda acc, x: acc * alpha_c + x
    )
    den = (F.lit(1.0) - F.pow(alpha_c, F.size("cl"))) / F.lit(0.25)
    return t.select(
        "event_id",
        "user_id",
        F.size("cl").cast("long").alias("n_window"),
        floor_round(num / den, 4).alias("ewma_8"),
    )


# --------------------------------------------------------------------------
# Last-touch attribution (union trick — no as-of join)
# --------------------------------------------------------------------------


@query(
    "attribution_last_touch",
    """
    WITH t AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events)
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(last_click_ts)) AS BIGINT) <= 3600
                THEN last_click_id END AS click_id,
           CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(last_click_ts)) AS BIGINT) <= 3600
                THEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(last_click_ts)) AS BIGINT)
           END AS gap_s
    FROM t WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the same
    user's most recent click at most 1 hour earlier (NULL if none) — the
    canonical conversion-credit query.

    The naive formulation is a per-purchase as-of join against the click
    stream; at scale that join re-shuffles both event subsets and skews on
    hot users. The union trick replaces it with ONE window over the
    already-unified stream: `last(click_id, ignorenulls)` over
    (unbounded, -1 row) carries the latest prior click forward to every
    row, then a filter keeps purchases. One shuffle on user_id, zero
    joins, state = one (id, ts) pair per user — the asof-join twin
    (`asof_join_purchase_signup`, catalog/relational.py) covers the join
    formulation; this entry is its linear-scan replacement at 100 TB.

    Gap seconds use the epoch-truncation convention (Spark cast-long,
    DuckDB FLOOR(epoch)); a purchase with no prior click within the hour
    emits NULL click_id and NULL gap_s on both engines."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    t = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("last_click_id"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts"),
    )
    gap = F.col("ts").cast("long") - F.col("last_click_ts").cast("long")
    in_window = gap <= 3600
    return t.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(in_window, F.col("last_click_id")).alias("click_id"),
        F.when(in_window, gap).alias("gap_s"),
    )


# --------------------------------------------------------------------------
# SCD-2 dimension build from a change log
# --------------------------------------------------------------------------


@query(
    "scd2_intervals_user_type",
    """
    WITH o AS (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM events),
    g AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
      FROM o),
    runs AS (
      SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
             CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS valid_from_s
      FROM g GROUP BY user_id, run_id, event_type)
    SELECT user_id, run_id, event_type, valid_from_s,
           LEAD(valid_from_s) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to_s,
           CASE WHEN LEAD(valid_from_s) OVER (PARTITION BY user_id ORDER BY run_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM runs
    """,
)
def scd2_intervals_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: turn each user's event_type
    change log into validity intervals [valid_from, valid_to) with an
    is_current flag — the standard dimension-table materialization a
    warehouse derives from CDC/event streams.

    Composition on top of the gaps-and-islands runs (the same decomposition
    `event_type_change_log` grades): change-point LAG → running-SUM run
    ids → per-run MIN(ts), then one LEAD turns consecutive run starts
    into half-open intervals; the last run per user gets NULL valid_to
    and is_current=1. Every window and the aggregate partition by
    user_id — one exchange end-to-end, reused by AQE."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.when(
            F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("chg"),
    )
    wr = Window.partitionBy("user_id").orderBy("rn")
    runs = (
        marked.withColumn("run_id", F.sum("chg").over(wr).cast("long"))
        .groupBy("user_id", "run_id", "event_type")
        .agg(F.min("ts").cast("long").alias("valid_from_s"))
    )
    wl = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from_s").over(wl)
    return runs.select(
        "user_id",
        "run_id",
        "event_type",
        "valid_from_s",
        nxt.alias("valid_to_s"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


# --------------------------------------------------------------------------
# Wilson-bound conversion ranking
# --------------------------------------------------------------------------


@query(
    "wilson_ctr_bound",
    """
    WITH c AS (
      SELECT user_id,
             CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS s,
             CAST(COUNT(CASE WHEN event_type IN ('click', 'purchase') THEN 1 END) AS DOUBLE) AS n
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n_trials, CAST(s AS BIGINT) AS n_success,
           ROUND(
             ((s / n) + (1.96 * 1.96) / (2.0 * n)
              - 1.96 * sqrt((((s / n) * (1.0 - (s / n))) + (1.96 * 1.96) / (4.0 * n)) / n))
             / (1.0 + (1.96 * 1.96) / n), 4) AS wilson_lb
    FROM c WHERE n > 0
    """,
)
def wilson_ctr_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score lower bound (z=1.96) on each user's click→purchase
    conversion rate — the shrinkage ranking that makes small samples
    comparable to large ones (the same statistic quality filters use to
    rank sources by "fraction of good documents" without being fooled by
    tiny sources).

    The formula is written with IDENTICAL parenthesization on both
    engines so every intermediate double matches bit-for-bit (sqrt's
    argument is ≥ 0 by construction: p(1-p) ≥ 0 and z²/4n > 0). Single
    map-combined aggregate; constant state per user."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("double")
        .alias("s"),
        F.count(F.when(F.col("event_type").isin("click", "purchase"), 1))
        .cast("double")
        .alias("n"),
    )
    s, n = F.col("s"), F.col("n")
    z2 = F.lit(1.96) * F.lit(1.96)
    p = s / n
    lb = (
        p
        + z2 / (F.lit(2.0) * n)
        - F.lit(1.96)
        * F.sqrt(((p * (F.lit(1.0) - p)) + z2 / (F.lit(4.0) * n)) / n)
    ) / (F.lit(1.0) + z2 / n)
    return c.where(n > 0).select(
        "user_id",
        n.cast("long").alias("n_trials"),
        s.cast("long").alias("n_success"),
        F.round(lb, 4).alias("wilson_lb"),
    )


# --------------------------------------------------------------------------
# Behavior-sequence corpus building
# --------------------------------------------------------------------------


@query(
    "user_event_sequences",
    """
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral 'sentences': each user's full event-type stream in time
    order as one space-joined string — the sequence-model training corpus
    (session2vec / next-event prediction) a behavioral pipeline emits.

    Spark has no ordered string_agg; the deterministic equivalent is
    array_sort over (ts, event_id, type) structs inside one groupBy —
    struct comparison orders by field position, so the unique event_id
    breaks timestamp ties exactly like the oracle's ORDER BY. One shuffle
    on user_id; per-group memory is the user's own sequence (the same
    bound the downstream trainer needs anyway; cap with slice() when
    power users exceed the sequence length budget)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# True UDAF surface (pandas GROUPED_AGG)
# --------------------------------------------------------------------------


def _cents_total_udaf():
    """Arrow-batched GROUPED_AGG pandas UDF summing exact integer cents.

    Exactness is the whole design: floor(v·100 + 0.5) per element is the
    identical double operation on both engines, and the integer sum is
    order-independent — so a Python UDAF can be hash-compared against a
    SQL oracle at all (a float-summing UDAF could not: numpy's pairwise
    summation and DuckDB's sequential fold round differently)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents_total(v: _pd.Series) -> int:
        import numpy as np

        return int(np.floor(v.to_numpy() * 100.0 + 0.5).astype(np.int64).sum())

    @pandas_udf("long")
    def n_rows(v: _pd.Series) -> int:
        # Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg(), so the count is a pandas UDAF too
        return len(v)

    return cents_total, n_rows


@query(
    "udaf_cents_total_by_type",
    """
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def udaf_cents_total_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE surface (the UDAF row of SURVEY §2.3's UDF/
    UDAF/UDTF checklist): a pandas GROUPED_AGG UDF aggregating event value
    into exact integer cents per event type, checked value-for-value
    against the SQL oracle.

    Spark executes it as ArrowAggregatePython (plan-asserted): groups are
    shuffled RAW and aggregated in the Python worker — unlike a built-in
    SUM there is NO map-side combine, so shuffle volume is the full input
    and hot keys concentrate on single workers. That asymmetry is exactly
    why the engine's UDF policy keeps aggregation built-in on hot paths
    (pre-aggregate to cents with native SUM, or salt) and reserves pandas
    UDAFs for logic SQL can't express; this entry grades the seam."""
    e = _t(spark, sf_dir, "events")
    cents_total, n_rows = _cents_total_udaf()
    return e.groupBy("event_type").agg(
        cents_total(F.col("value")).alias("total_cents"),
        n_rows(F.col("value")).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Recursive CTE surface (Spark 4 WITH RECURSIVE)
# --------------------------------------------------------------------------


@query(
    "recursive_cte_chain_totals",
    """
    WITH r AS (
      SELECT user_id, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_walked,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM r WHERE rn <= 10 GROUP BY user_id
    """,
)
def recursive_cte_chain_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive-CTE surface (WITH RECURSIVE, UNION ALL): walk
    each user's first 10 events as a linked-list recursion, folding an
    exact integer-cents running total link by link — the sequential-walk
    shape (lineage chains, path accumulation) recursion exists for.

    The oracle is deliberately NOT a recursion: the walked fold must equal
    the direct bounded aggregate (algebraic answer vs mechanism), which is
    the strongest possible check on the recursion plumbing. Recursion depth
    is bounded at 10 (each iteration is one Spark job over the frontier —
    depth is the scale knob, rows stay linear: every event appears in at
    most one frontier). Spark supports only UNION ALL recursion (no cycle
    dedup), so the walk follows the acyclic rn+1 successor — cycle-free by
    construction. Cents are exact integers, so the fold is
    order-independent and hash-comparable. The final total is read back
    as max_by(cum, rn) — the cum at the deepest walked link — NOT
    MAX(cum), which only coincides with the final running total when
    every per-event value is non-negative (a refund-style negative cents
    would make the running sum non-monotone)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    # Materialize the windowed sequence ONCE (r15, guide §3.3): `seq`
    # referenced inside the recursive step is INLINED into every
    # iteration — ten scan+window derivations for a depth-10 walk. A
    # lazy checkpoint behind the temp view leaves the recursion plumbing
    # (UnionLoop over the frontier) untouched while each iteration joins
    # materialized (user_id, cents, rn) rows.
    seq_df = e.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    ).localCheckpoint(eager=False)
    view = f"__events_rec_{abs(hash(sf_dir)) % 10_000}"
    seq_df.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE seq AS (
          SELECT user_id, cents, rn FROM {view}
        ),
        walk AS (
          SELECT user_id, rn, cents AS cum FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.user_id, s.rn, w.cum + s.cents
          FROM walk w JOIN seq s
            ON s.user_id = w.user_id AND s.rn = w.rn + 1 AND s.rn <= 10
        )
        SELECT user_id, MAX(rn) AS n_walked,
               max_by(cum, rn) AS total_cents
        FROM walk GROUP BY user_id
        """
    )


# --------------------------------------------------------------------------
# VARIANT semi-structured surface (Spark 4 parse_json)
# --------------------------------------------------------------------------


@query(
    "variant_props_stats",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: parse the semi-structured `props` JSON
    column into the binary VARIANT type once, then extract a typed field
    with variant_get — the schema-on-read path for ragged event payloads
    (vs `json_extract_events`' per-path string get_json_object, VARIANT
    parses once and serves every later extraction from the binary form,
    the difference that matters when one payload feeds many fields).

    Map-only parse + one map-combined aggregate; the oracle reads the
    same field through DuckDB's JSON operator. Integer payloads keep the
    comparison exact."""
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


# --------------------------------------------------------------------------
# approx_top_k heavy-hitters surface
# --------------------------------------------------------------------------


@query(
    "approx_topk_event_types",
    """
    SELECT event_type AS item, COUNT(*) AS cnt
    FROM events GROUP BY event_type
    ORDER BY cnt DESC, item
    """,
)
def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in approx_top_k heavy hitters (Spark 4): sketch the event-
    type frequency table in one pass and emit every tracked item. The
    sketch is EXACT whenever true cardinality ≤ maxItemsTracked (here
    5 ≪ 10000) — the documented regime in which an approx surface can sit
    behind a value-exact oracle (the same deterministic-bound framing as
    `approx_stats_events`). Output is re-sorted deterministically
    (cnt desc, item) because the sketch's own tie order is unspecified.
    At real heavy-hitter scale the one-pass sketch replaces the full
    GROUP BY shuffle with a constant-size mergeable state."""
    e = _t(spark, sf_dir, "events")
    tk = e.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return (
        tk.select(F.explode("tk").alias("s"))
        .select(
            F.col("s.item").alias("item"), F.col("s.count").cast("long").alias("cnt")
        )
        .orderBy(F.col("cnt").desc(), "item")
    )


# --------------------------------------------------------------------------
# Behavioral Markov transitions
# --------------------------------------------------------------------------


@query(
    "markov_transition_matrix",
    """
    WITH o AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, SUM(n) AS row_total FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           FLOOR(CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS p
    FROM c JOIN t ON c.from_type = t.from_type
    """,
)
def markov_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event stream
    (P(next=b | current=a)) — the behavioral model powering next-event
    prediction features and synthetic sequence generation, and the QA
    statistic that exposes instrumentation bugs (impossible transitions).

    One LEAD over the user_id window (same single-exchange family as the
    change log), a |types|² count table, and a broadcast of row totals
    back onto it. Probabilities are exact integer ratios floor-rounded to
    6 — k/n ratios land on terminating decimals where the engines' ROUNDs
    split (the containment lesson)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = o.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (
            F.floor(
                F.col("n").cast("double")
                / F.col("row_total").cast("double")
                * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("p"),
    )


# --------------------------------------------------------------------------
# Interval union (continuous-time coverage)
# --------------------------------------------------------------------------


@query(
    "interval_union_seconds",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT) + 300 AS e
      FROM events),
    m AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM iv),
    g AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM m),
    agg AS (
      SELECT user_id, isl, MIN(s) AS st, MAX(e) AS en
      FROM g GROUP BY user_id, isl)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(en - st) AS BIGINT) AS covered_seconds,
           CAST(MAX(en - st) AS BIGINT) AS longest_island_seconds
    FROM agg GROUP BY user_id
    """,
)
def interval_union_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping time intervals per user — each event opens a
    5-minute activity interval [ts, ts+300s) and the query reports how much
    wall-clock time the MERGED intervals actually cover (plus island count
    and longest island). This is the continuous-time complement of
    activity_islands_daily (which merges at day granularity): true "time
    spent active" for engagement metrics, sessionized coverage for SLA
    audits, and the dedup step any interval-fact table needs before
    summing durations (naively summing per-event durations double-counts
    every overlap).

    The classic sweep, shuffled once: within each user's (start, event_id)
    order, an interval starts a new island iff its start exceeds the
    running max of all PREVIOUS interval ends (ROWS … 1 PRECEDING — the
    current row must not see itself); a running SUM of those island-break
    flags numbers the islands, and one groupBy collapses each island to
    max(end) − min(start). Both windows and both aggregates key on
    user_id, so the whole plan rides ONE hash exchange; per-user state is
    a single running max — linear at 100 TB and skew-bounded by the
    busiest user. Touching intervals (start == previous end) merge, which
    is the right call for half-open [s, e) intervals. Timestamps reduce
    to epoch seconds via the FLOOR(epoch)/cast-long pair the conventions
    pin as bit-identical; everything downstream is exact int64.
    """
    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 300).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = iv.withColumn("pmax", F.max("e").over(w_prev))
    g = m.withColumn(
        "isl",
        F.sum(
            F.when(F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1).otherwise(
                0
            )
        ).over(w_run),
    )
    islands = g.groupBy("user_id", "isl").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).alias("covered_seconds"),
        F.max(F.col("en") - F.col("st")).alias("longest_island_seconds"),
    )


# --------------------------------------------------------------------------
# Time-weighted average (LOCF)
# --------------------------------------------------------------------------


@query(
    "time_weighted_avg_value",
    """
    WITH o AS (
      SELECT user_id, event_id,
             CAST(FLOOR(CAST(value AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS v_e4,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_s
      FROM events),
    w AS (
      SELECT user_id, v_e4, next_s - s AS dt
      FROM o WHERE next_s IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dt) AS BIGINT) AS span_seconds,
           CASE WHEN SUM(dt) > 0 THEN
             FLOOR(CAST(SUM(v_e4 * dt) AS DOUBLE)
                   / (10000.0 * CAST(SUM(dt) AS DOUBLE)) * 10000.0 + 0.5)
               / 10000.0
           END AS twa_value
    FROM w GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's `value` signal under LOCF
    (last-observation-carried-forward) — TimescaleDB's `time_weight
    ('LOCF')` / Pinecone-style sensor rollup: a reading counts in
    proportion to how LONG it was the current reading, not how often it
    was sampled. The plain AVG is wrong whenever sampling is irregular
    (a burst of identical readings should not outweigh one long-lived
    reading); this is the canonical fix for billing meters, utilization
    rollups, and sensor aggregation.

    Each reading holds from its timestamp to the next one (LEAD over the
    user window; the final reading has no successor and contributes no
    weighted time — the [first, last] observation span convention). The
    weighted mean is computed in EXACT integer units end-to-end (the
    _revenue_e4 discipline): value → e4 int via half-up floor, weight =
    whole seconds, SUM(v_e4·dt) and SUM(dt) are exact int64s (bounded:
    |v_e4| < 10^7 at e4 scale, dt < 10^8 s, so even 10^4 events/user stay
    < 2^63), and ONE double division at the end is correctly rounded —
    bit-identical across engines, then floor-rounded to 4. Zero-span
    users (all events in the same epoch second) yield NULL on both sides.
    LEAD + final aggregate share the user_id exchange: one shuffle.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast("long").alias("v_e4"),
        F.col("ts").cast("long").alias("s"),
        F.lead(F.col("ts").cast("long")).over(w).alias("next_s"),
    ).where(F.col("next_s").isNotNull())
    seg = o.select("user_id", "v_e4", (F.col("next_s") - F.col("s")).alias("dt"))
    a = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dt").alias("span_seconds"),
        F.sum(F.col("v_e4") * F.col("dt")).alias("wsum"),
    )
    twa = F.when(
        F.col("span_seconds") > 0,
        F.floor(
            F.col("wsum").cast("double")
            / (10000.0 * F.col("span_seconds").cast("double"))
            * 10000.0
            + F.lit(0.5)
        )
        / 10000.0,
    )
    return a.select(
        "user_id", "n_segments", "span_seconds", twa.alias("twa_value")
    )
