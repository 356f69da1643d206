"""Model-evaluation / data-audit wave (r5 tail): rank-statistic ROC-AUC,
calibration deciles, rank-trimmed robust means, behavioral entropy,
association rules with lift, a chi-square independence test on the hash
A/B split, and activity gaps-and-islands.

These are the metrics a training-data pipeline computes AFTER the corpus
ships — scoring model outputs, auditing drift, mining co-occurrence — and
each is expressed as pure DataFrame algebra so Catalyst keeps the whole
plan in codegen. The reference has no eval surface (it is a stateless
search API, reference backend/models.py:186-191); these extend the
general-analytics engine the task requires beyond parity.

Decimal-tie discipline (CLAUDE.md): `events.value` is exact 2-decimal
data, so every mean/sum goes through exact int64 cents (floor to cents,
integer SUM, divide once) and every emitted rational is floor-rounded —
`ROUND()` of an exact decimal half splits across engines. Entropy is the
one libm-derived column (round 4; `rnd_nz` for the H=0 single-type case).

Scale notes per entry are in the docstrings; the common theme: replace
global-order windows with groupBy-to-distinct-values + a tiny window over
the value domain (AUC), or keep windows partitioned by a key (trimmed
means, islands) so no stage ever total-sorts the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import floor_round
from ..schemas import load_table
from ._registry import query, rnd_nz


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col: str = "value"):
    return F.floor(F.col(col) * 100.0 + 0.5).cast("long")


# --------------------------------------------------------------------------
# ROC-AUC via the Mann-Whitney rank statistic
# --------------------------------------------------------------------------


@query(
    "roc_auc_purchase_vs_view",
    """
    WITH s AS (
      SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE event_type IN ('purchase', 'view')),
    g AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS pos_cnt
      FROM s GROUP BY cents),
    r AS (
      SELECT pos_cnt, cnt,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM g),
    t AS (
      SELECT CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - pos_cnt) AS BIGINT) AS n_neg,
             CAST(SUM(pos_cnt * (2 * cum_before + cnt + 1)) AS BIGINT)
               AS sum_ranks2
      FROM r)
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             FLOOR((sum_ranks2 - n_pos * (n_pos + 1))
                   / (2.0 * n_pos * n_neg) * 10000.0 + 0.5) / 10000.0
           ELSE NULL END AS auc
    FROM t
    """,
)
def roc_auc_purchase_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of `value` as a classifier score separating purchases
    (positive) from views (negative), via the Mann-Whitney U statistic
    with midranks for ties: AUC = (ΣR⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻).

    The naive form ranks every row with a GLOBAL window — a total sort on
    one partition, the classic 100 TB killer. Instead: aggregate to one
    row per distinct score (groupBy shuffle, map-side combined), run the
    cumulative window over the tiny score domain (2-decimal scores ⇒
    bounded by the value range, not the row count), and reconstruct
    ΣR⁺ analytically: each tied group at cumulative offset c with cnt
    rows contributes pos_cnt · (2c + cnt + 1)/2 (midrank ×2 kept integer
    so the numerator is exact int64; one IEEE division at the end, then
    floor-round — bit-identical across engines).
    """
    e = _t(spark, sf_dir, "events")
    s = e.where(F.col("event_type").isin("purchase", "view")).select(
        _cents().alias("cents"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    g = s.groupBy("cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pos_cnt")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "pos_cnt",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    t = r.agg(
        F.sum("pos_cnt").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos_cnt")).alias("n_neg"),
        F.sum(
            F.col("pos_cnt") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("sum_ranks2"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            floor_round(
                (F.col("sum_ranks2") - F.col("n_pos") * (F.col("n_pos") + 1))
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                4,
            ),
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Calibration deciles
# --------------------------------------------------------------------------


@query(
    "calibration_bins_decile",
    """
    WITH s AS (
      SELECT event_id, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events),
    b AS (
      SELECT cents, pos,
             CAST(NTILE(10) OVER (ORDER BY cents, event_id) AS BIGINT)
               AS decile
      FROM s)
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(CAST(SUM(cents) AS BIGINT) / 100.0 / COUNT(*)
                 * 10000.0 + 0.5) / 10000.0 AS mean_value,
           FLOOR(CAST(SUM(pos) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS pos_rate
    FROM b GROUP BY decile ORDER BY decile
    """,
)
def calibration_bins_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram input: rows bucketed into score deciles
    (score = value), each bin reporting its mean score and observed
    positive rate — the monotone mean_value column against pos_rate is
    what a calibration plot draws.

    Determinism: NTILE needs a total order, so the ORDER BY carries the
    unique event_id tie-break — both engines then assign identical bins.
    mean_value goes through exact cents (int64 SUM, two divisions after).
    Scale: NTILE's total sort is the documented cost here; at 100 TB the
    same output comes from approx_percentile decile BOUNDARIES (a
    mergeable sketch, `approx_stats_events`) + a map-side bucket assign —
    kept exact here because the gate hashes exact bins.
    """
    e = _t(spark, sf_dir, "events")
    s = e.select(
        "event_id",
        _cents().alias("cents"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    b = s.select(
        "cents",
        "pos",
        F.ntile(10).over(Window.orderBy("cents", "event_id")).cast("long").alias("decile"),
    )
    return (
        b.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            floor_round(F.sum("cents") / 100.0 / F.count(F.lit(1)), 4).alias(
                "mean_value"
            ),
            floor_round(
                F.sum("pos") / F.count(F.lit(1)).cast("double"), 4
            ).alias("pos_rate"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Rank-trimmed robust means
# --------------------------------------------------------------------------


@query(
    "trimmed_stats_by_type",
    """
    WITH s AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           FLOOR(CAST(SUM(cents) AS BIGINT) / 100.0 / COUNT(*)
                 * 10000.0 + 0.5) / 10000.0 AS trimmed_mean
    FROM s
    WHERE rn > FLOOR(n * 0.05) AND rn <= n - FLOOR(n * 0.05)
    GROUP BY event_type ORDER BY event_type
    """,
)
def trimmed_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of value per event type — the outlier-robust center
    a data-quality monitor tracks instead of the raw mean.

    Trimming by RANK, not by value quantiles: per-engine quantile
    interpolation differs in the last ulp and a boundary row could flip
    sides; row_number over (value, event_id) selects the identical row
    set in both engines. The window is PARTITIONED by event_type — each
    key sorts independently, so the plan scales horizontally (no global
    order). Mean via exact cents.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    s = e.select(
        "event_type",
        _cents().alias("cents"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = s.where(
        (F.col("rn") > F.floor(F.col("n") * 0.05))
        & (F.col("rn") <= F.col("n") - F.floor(F.col("n") * 0.05))
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.max("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            floor_round(F.sum("cents") / 100.0 / F.count(F.lit(1)), 4).alias(
                "trimmed_mean"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Behavioral entropy
# --------------------------------------------------------------------------


@query(
    "user_behavior_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type),
    u AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             SUM(c * ln(CAST(c AS DOUBLE))) AS slc
      FROM c GROUP BY user_id)
    SELECT user_id, n_events, n_types,
           ROUND(ln(CAST(n_events AS DOUBLE)) - slc / n_events, 4) + 0.0
             AS entropy
    FROM u ORDER BY user_id
    """,
)
def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (bots: near 0; organic users: near
    ln(5)). Computed from exact integer counts as H = ln(N) − Σc·ln(c)/N,
    so the only float inputs are the two ln() calls (libm-derived →
    round 4 per convention; rnd_nz collapses the single-type −0.0 case).

    One groupBy to per-(user,type) counts (map-side combined), one to
    per-user — both shuffles on the same user_id-prefixed keys; no
    windows, no joins. Linear at any scale.
    """
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    u = c.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("slc"),
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        rnd_nz(
            F.log(F.col("n_events").cast("double"))
            - F.col("slc") / F.col("n_events"),
            4,
        ).alias("entropy"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Association rules (market-basket lift over event types)
# --------------------------------------------------------------------------


@query(
    "assoc_rules_event_pairs",
    """
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events),
    tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM b
           GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, bb.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM b a JOIN b bb
        ON a.user_id = bb.user_id AND a.event_type < bb.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_ab,
           FLOOR(n_ab / CAST(n.n_users AS DOUBLE) * 10000.0 + 0.5)
             / 10000.0 AS support,
           FLOOR(n_ab / CAST(ca.c AS DOUBLE) * 10000.0 + 0.5)
             / 10000.0 AS confidence,
           FLOOR(n_ab * CAST(n.n_users AS DOUBLE) / (ca.c * cb.c)
                 * 10000.0 + 0.5) / 10000.0 AS lift
    FROM p
    JOIN tc ca ON ca.event_type = p.type_a
    JOIN tc cb ON cb.event_type = p.type_b
    CROSS JOIN n
    ORDER BY type_a, type_b
    """,
)
def assoc_rules_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type baskets:
    support, confidence(a→b) and lift for every unordered type pair —
    the co-occurrence mining step of a behavioral feature pipeline.

    Plan shape: baskets = one distinct (user, type) aggregation; the
    pair count is a SELF-join co-partitioned on user_id (both sides the
    same shuffle output — one exchange, reused); type totals and the
    user count are scalar/5-row broadcasts. Nothing all-pairs: the join
    fans out only within a user's ≤5-type basket (k²/2 per user, k
    bounded by the type vocabulary). Every emitted ratio is a ratio of
    int64s — one IEEE division, floor-rounded, bit-identical.
    """
    e = _t(spark, sf_dir, "events")
    b = e.select("user_id", "event_type").distinct()
    n_users = e.agg(
        F.countDistinct("user_id").alias("n_users")
    )
    tc = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a, bb = b.alias("a"), b.alias("bb")
    p = (
        a.join(
            bb,
            (F.col("a.user_id") == F.col("bb.user_id"))
            & (F.col("a.event_type") < F.col("bb.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("bb.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ca = tc.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a"))
    cb = tc.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b"))
    out = (
        p.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n_users))
    )
    return out.select(
        "type_a",
        "type_b",
        "n_ab",
        floor_round(F.col("n_ab") / F.col("n_users").cast("double"), 4).alias(
            "support"
        ),
        floor_round(F.col("n_ab") / F.col("c_a").cast("double"), 4).alias(
            "confidence"
        ),
        floor_round(
            F.col("n_ab") * F.col("n_users").cast("double")
            / (F.col("c_a") * F.col("c_b")),
            4,
        ).alias("lift"),
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# Chi-square test of independence (event_type × experiment arm)
# --------------------------------------------------------------------------


@query(
    "chi2_type_by_arm",
    """
    WITH s AS (
      SELECT CASE WHEN (user_id * 2654435761) % 97 % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm, event_type
      FROM events),
    o AS (SELECT arm, event_type, CAST(COUNT(*) AS BIGINT) AS obs
          FROM s GROUP BY arm, event_type),
    ra AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS rn FROM s GROUP BY arm),
    ct AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cn
           FROM s GROUP BY event_type),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
    cells AS (
      SELECT ra.arm, ct.event_type,
             CAST(COALESCE(o.obs, 0) AS DOUBLE) AS obs_d,
             CAST(ra.rn AS DOUBLE) * ct.cn / tot.n AS exp_d
      FROM ra CROSS JOIN ct CROSS JOIN tot
      LEFT JOIN o ON o.arm = ra.arm AND o.event_type = ct.event_type)
    SELECT (SELECT n FROM tot) AS n,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ra) AS n_arms,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_types,
           (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM ra)
             * (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM ct) AS dof,
           ROUND(SUM((obs_d - exp_d) * (obs_d - exp_d) / exp_d), 4) + 0.0
             AS chi2
    FROM cells
    """,
)
def chi2_type_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and a
    deterministic experiment arm (the same Knuth-hash split as
    ab_test_two_proportions) — the k-category generalization of the
    two-proportion z-test, and the standard guardrail-metric check on an
    A/B split. Under a correct random split the statistic should sit
    near its dof (null calibration — the pytest contract asserts it).

    The cell table is the CROSS JOIN of the two marginal tables with
    observed counts LEFT-joined (zero cells contribute their full
    expectation — omitting them understates the statistic), so both
    engines sum the identical cell set. Expectations are computed
    double-side (R·C overflows int64 at ~1e10-row arms), same operand
    order both engines; the final Σ is ≤ arms·types libm-free doubles,
    round 4.

    Scale: one map-side arm projection, three map-combined aggregates
    over the same scan, and a cells join of (2 × 5) broadcast rows."""
    e = _t(spark, sf_dir, "events")
    arm = F.when(
        (F.col("user_id") * F.lit(2654435761)) % 97 % 2 == 0, F.lit("A")
    ).otherwise(F.lit("B"))
    s = e.select(arm.alias("arm"), "event_type")
    o = s.groupBy("arm", "event_type").agg(F.count(F.lit(1)).alias("obs"))
    ra = s.groupBy("arm").agg(F.count(F.lit(1)).alias("rn"))
    ct = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("cn"))
    tot = s.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        ra.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(o), ["arm", "event_type"], "left")
        .select(
            "n",
            F.coalesce(F.col("obs"), F.lit(0)).cast("double").alias("obs_d"),
            (F.col("rn").cast("double") * F.col("cn") / F.col("n")).alias(
                "exp_d"
            ),
        )
    )
    n_arms = ra.agg(F.count(F.lit(1)).alias("n_arms"))
    n_types = ct.agg(F.count(F.lit(1)).alias("n_types"))
    return (
        cells.agg(
            F.max("n").alias("n"),
            rnd_nz(
                F.sum(
                    (F.col("obs_d") - F.col("exp_d"))
                    * (F.col("obs_d") - F.col("exp_d"))
                    / F.col("exp_d")
                ),
                4,
            ).alias("chi2"),
        )
        .crossJoin(F.broadcast(n_arms))
        .crossJoin(F.broadcast(n_types))
        .select(
            "n",
            "n_arms",
            "n_types",
            ((F.col("n_arms") - 1) * (F.col("n_types") - 1)).alias("dof"),
            "chi2",
        )
    )


# --------------------------------------------------------------------------
# Gaps and islands (consecutive-activity runs)
# --------------------------------------------------------------------------


@query(
    "activity_islands_daily",
    """
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    g AS (
      SELECT user_id, d,
             CAST(d - DATE '1970-01-01' AS BIGINT)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM d)
    SELECT user_id, MIN(d) AS island_start, MAX(d) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS island_days
    FROM g GROUP BY user_id, grp
    ORDER BY user_id, island_start
    """,
)
def activity_islands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over daily user activity: maximal runs of
    consecutive active days per user — churn/streak analysis, and the
    batch shape of session building at day granularity.

    The classic trick: day_number − row_number is constant within a
    consecutive run, so one partitioned window + one groupBy finds all
    islands with no self-join (the naive gap-join is quadratic per
    user). All columns are dates/int64 — nothing to round. Window and
    aggregate both key on user_id: a single exchange, reused.
    """
    e = _t(spark, sf_dir, "events")
    d = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = d.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
            - F.row_number().over(w)
        ).alias("grp"),
    )
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("island_start"),
            F.max("d").alias("island_end"),
            F.count(F.lit(1)).alias("island_days"),
        )
        .drop("grp")
        .orderBy("user_id", "island_start")
    )


# --------------------------------------------------------------------------
# Vocabulary drift between deterministic splits (KL divergence)
# --------------------------------------------------------------------------


def _vocab_kl_oracle_sql() -> str:
    from ..operators.sampling import hash_bucket_sql

    b = hash_bucket_sql("doc_id")
    return f"""
    WITH t AS (
      SELECT CASE WHEN {b} < 8000 THEN 'train' ELSE 'val' END AS split,
             u.term
      FROM documents,
           LATERAL unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
             AS u(term)),
    c AS (SELECT split, term, CAST(COUNT(*) AS BIGINT) AS c
          FROM t GROUP BY split, term),
    tr AS (SELECT term, c FROM c WHERE split = 'train'),
    va AS (SELECT term, c FROM c WHERE split = 'val'),
    v AS (SELECT COALESCE(tr.term, va.term) AS term,
                 COALESCE(tr.c, 0) AS ct, COALESCE(va.c, 0) AS cv
          FROM tr FULL OUTER JOIN va ON tr.term = va.term),
    m AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cv) AS BIGINT) AS nv,
                 CAST(COUNT(*) AS BIGINT) AS vocab FROM v),
    d AS (
      SELECT (ct + 1.0) / (m.nt + m.vocab) AS p,
             (cv + 1.0) / (m.nv + m.vocab) AS q
      FROM v CROSS JOIN m)
    SELECT (SELECT nt FROM m) AS n_train_tokens,
           (SELECT nv FROM m) AS n_val_tokens,
           (SELECT vocab FROM m) AS vocab_size,
           ROUND(SUM(p * ln(p / q)), 4) + 0.0 AS kl_train_val,
           ROUND(SUM(q * ln(q / p)), 4) + 0.0 AS kl_val_train
    FROM d
    """


@query("vocab_kl_train_val", _vocab_kl_oracle_sql())
def vocab_kl_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-distribution drift between the deterministic 80/20
    train/val document split: add-one-smoothed unigram KL divergence in
    both directions plus the shared-vocabulary size — the text-side twin
    of psi_split_drift (which monitors numeric distributions). A healthy
    random split shows near-zero KL; a skewed ingest (one source landing
    wholly in train) shows up here before it shows up in eval loss.

    Same Knuth-hash bucket split as split_train_val_test, so the monitor
    watches exactly the splits the pipeline ships. Smoothing is over the
    UNION vocabulary (full outer join of the two count tables; absent
    terms keep their +1 mass) — both engines sum the identical term set;
    the KL terms are libm ln (→ round 4, the entropy convention).

    Scale: tokenize-explode is map-only; two stacked map-combined
    aggregates on (split, term); the scalar marginals broadcast back.
    Nothing holds state beyond the (bounded) vocabulary aggregate."""
    from ..functions.text import tokens
    from ..operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    t = d.select(
        F.when(hash_bucket("doc_id") < 8000, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    )
    c = t.groupBy("split", "term").agg(F.count(F.lit(1)).alias("c"))
    tr = c.where(F.col("split") == "train").select("term", F.col("c").alias("ct"))
    va = c.where(F.col("split") == "val").select("term", F.col("c").alias("cv"))
    v = (
        tr.join(va, "term", "full_outer")
        .select(
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cv"), F.lit(0)).alias("cv"),
        )
    )
    m = v.agg(
        F.sum("ct").alias("nt"),
        F.sum("cv").alias("nv"),
        F.count(F.lit(1)).alias("vocab"),
    )
    dd = v.crossJoin(F.broadcast(m)).select(
        "nt",
        "nv",
        "vocab",
        ((F.col("ct") + 1.0) / (F.col("nt") + F.col("vocab"))).alias("p"),
        ((F.col("cv") + 1.0) / (F.col("nv") + F.col("vocab"))).alias("q"),
    )
    return dd.agg(
        F.max("nt").alias("n_train_tokens"),
        F.max("nv").alias("n_val_tokens"),
        F.max("vocab").alias("vocab_size"),
        rnd_nz(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 4).alias(
            "kl_train_val"
        ),
        rnd_nz(F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 4).alias(
            "kl_val_train"
        ),
    )
