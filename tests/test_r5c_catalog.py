"""Semantic + plan contracts for the r5-tail eval/audit wave (ROC-AUC,
calibration, trimmed means, entropy, association rules, chi-square,
gaps-and-islands, ANN recall/NDCG audits, partition-balance monitors): invariants
the hash gate can't state — AUC bounds and midrank bookkeeping, NTILE bin
balance, trim-count arithmetic, entropy's ln(k) ceiling, the support ≤
confidence dominance, island partitioning of the activity set — plus the
plan shapes the scale story depends on (AUC's window must run over the
aggregated score domain, not the raw fact table; the basket self-join's
dimension lookups must broadcast).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES
from govgis_nov2023_slim_spatial_server_spark.schemas import load_table


def _run(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)


def _plan(spark, sf_dir, name) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


# -- roc_auc_purchase_vs_view ----------------------------------------------


def test_auc_bounds_and_counts(spark, sf_dir):
    row = _run(spark, sf_dir, "roc_auc_purchase_vs_view").collect()[0]
    e = load_table(spark, sf_dir, "events")
    n_pos = e.where(F.col("event_type") == "purchase").count()
    n_neg = e.where(F.col("event_type") == "view").count()
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert 0.0 <= row["auc"] <= 1.0


def test_auc_window_runs_over_aggregated_domain(spark, sf_dir):
    # the cumulative window must sit ABOVE a HashAggregate (per-distinct-
    # score counts), never over the raw filtered fact table — that is the
    # whole scale design (no global sort of N rows, only of the score
    # domain).
    plan = _plan(spark, sf_dir, "roc_auc_purchase_vs_view")
    assert "Window" in plan
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:], plan


# -- calibration_bins_decile -----------------------------------------------


def test_calibration_bins_partition_and_monotone(spark, sf_dir):
    rows = _run(spark, sf_dir, "calibration_bins_decile").collect()
    e = load_table(spark, sf_dir, "events")
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n"] for r in rows) == e.count()
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE balance guarantee
    means = [r["mean_value"] for r in rows]
    assert means == sorted(means)  # score-ordered bins ⇒ monotone means
    assert all(0.0 <= r["pos_rate"] <= 1.0 for r in rows)


# -- trimmed_stats_by_type -------------------------------------------------


def test_trim_counts_exact_and_mean_within_range(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("value"), F.max("value")).collect()[0]
    for r in _run(spark, sf_dir, "trimmed_stats_by_type").collect():
        cut = math.floor(r["n_total"] * 0.05)
        assert r["n_kept"] == r["n_total"] - 2 * cut
        assert lo <= r["trimmed_mean"] <= hi


def test_trimmed_mean_no_larger_spread_than_raw(spark, sf_dir):
    # trimming can only pull the mean toward the median's side of the
    # extremes; sanity: |trimmed - raw| bounded by the 5% tail mass share
    e = load_table(spark, sf_dir, "events")
    raw = {
        r["event_type"]: r["m"]
        for r in e.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    for r in _run(spark, sf_dir, "trimmed_stats_by_type").collect():
        assert abs(r["trimmed_mean"] - raw[r["event_type"]]) < raw[r["event_type"]]


# -- user_behavior_entropy -------------------------------------------------


def test_entropy_bounds_and_coverage(spark, sf_dir):
    rows = _run(spark, sf_dir, "user_behavior_entropy").collect()
    e = load_table(spark, sf_dir, "events")
    assert len(rows) == e.select("user_id").distinct().count()
    for r in rows:
        assert -1e-9 <= r["entropy"] <= math.log(r["n_types"]) + 1e-9
        if r["n_types"] == 1:
            assert r["entropy"] == 0.0


# -- assoc_rules_event_pairs -----------------------------------------------


def test_assoc_rules_dominance_and_orientation(spark, sf_dir):
    rows = _run(spark, sf_dir, "assoc_rules_event_pairs").collect()
    assert rows  # 5-type corpus ⇒ co-occurring pairs exist
    for r in rows:
        assert r["type_a"] < r["type_b"]
        # support = n_ab/N ≤ n_ab/c_a = confidence (c_a ≤ N always)
        assert r["support"] <= r["confidence"] + 1e-9
        assert 0.0 < r["support"] <= 1.0
        assert r["lift"] > 0.0


def test_assoc_rules_dimension_lookups_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "assoc_rules_event_pairs")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# -- activity_islands_daily ------------------------------------------------


def test_islands_partition_active_days(spark, sf_dir):
    rows = _run(spark, sf_dir, "activity_islands_daily").collect()
    e = load_table(spark, sf_dir, "events")
    active = e.select("user_id", F.to_date("ts").alias("d")).distinct().count()
    # islands partition the active-day set: lengths sum to exactly it
    assert sum(r["island_days"] for r in rows) == active
    for r in rows:
        assert (r["island_end"] - r["island_start"]).days == r["island_days"] - 1
    # islands of one user never touch: gap of ≥1 day between consecutive
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for islands in by_user.values():
        islands.sort(key=lambda r: r["island_start"])
        for a, b in zip(islands, islands[1:]):
            assert (b["island_start"] - a["island_end"]).days >= 2


# -- ann_recall_at_10 ------------------------------------------------------


def test_ann_recall_beats_random_bucket_baseline(spark, sf_dir):
    # 2 of 64 buckets probed ⇒ a bucket-blind scan would land ~0.03 of the
    # true top-10; sign-LSH must clear that with margin even on isotropic
    # vectors (the adversarial case for angle hashing)
    rows = QUERIES["ann_recall_at_10"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] == 10
        assert 0 <= r["n_hit"] <= 10
        assert r["recall"] >= 0.05


def test_ann_recall_exact_side_broadcasts_probes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann_recall_at_10")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ivf_recall_bounds_and_probe_coverage(spark, sf_dir):
    # 2 of 8 cells probed; on isotropic vectors cell membership is near-
    # uniform so expected coverage ~0.25 of the true top-10 — assert the
    # audit reports sane bounds and all probes
    rows = QUERIES["ivf_recall_at_10"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] == 10
        assert 0 <= r["n_hit"] <= 10
        assert abs(r["recall"] - r["n_hit"] / r["n_exact"]) < 1e-9


def test_ndcg_bounds_and_dcg_consistency(spark, sf_dir):
    import math as _m

    rows = QUERIES["retrieval_ndcg_labels"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["precision_at_k"] <= 1.0
        # DCG is bounded by the all-relevant ideal at k
        ideal10 = sum(1.0 / _m.log2(i + 1) for i in range(1, r["n_exact"] + 1))
        assert 0.0 <= r["dcg"] <= ideal10 + 1e-9
        if r["ndcg"] is not None:
            assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        if r["n_rel"] == 0:
            assert r["dcg"] == 0.0


def test_lsh_bucket_balance_invariants(spark, sf_dir):
    from govgis_nov2023_slim_spatial_server_spark.schemas import load_table

    r = QUERIES["lsh_bucket_balance"](spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "embeddings").count()
    assert r["n_vectors"] == n
    assert 1 <= r["n_buckets_used"] <= 64
    assert r["max_bucket_n"] * r["n_buckets_used"] >= n  # max ≥ mean
    assert r["skew_ratio"] >= 1.0


def test_ivf_cell_balance_invariants(spark, sf_dir):
    from govgis_nov2023_slim_spatial_server_spark.schemas import load_table

    r = QUERIES["ivf_cell_balance"](spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "embeddings").count()
    assert r["n_vectors"] == n
    assert 1 <= r["n_cells_used"] <= 8
    assert r["max_cell_n"] * r["n_cells_used"] >= n
    assert r["skew_ratio"] >= 1.0


def test_chi2_null_calibration(spark, sf_dir):
    # the arm split is independent of event_type by construction, so the
    # statistic should be unexceptional under the null: for dof=4 the
    # 99.9th percentile is ~18.5 — a value beyond that would mean the
    # hash split itself is biased
    r = QUERIES["chi2_type_by_arm"](spark, sf_dir).collect()[0]
    assert r["dof"] == (r["n_arms"] - 1) * (r["n_types"] - 1)
    assert r["chi2"] >= 0.0
    if r["dof"] == 4:
        assert r["chi2"] < 18.5


def test_vocab_kl_nonnegative_and_near_zero_on_random_split(spark, sf_dir):
    # Gibbs' inequality: KL >= 0 always; and a hash split of the same
    # corpus should sit near zero (smoothed, finite-sample) — far from
    # the O(1) values a genuinely shifted source pair would show
    r = QUERIES["vocab_kl_train_val"](spark, sf_dir).collect()[0]
    assert r["kl_train_val"] >= 0.0 and r["kl_val_train"] >= 0.0
    assert r["kl_train_val"] < 0.5 and r["kl_val_train"] < 0.5
    assert r["vocab_size"] > 0
