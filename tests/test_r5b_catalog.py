"""Semantic + plan contracts for the r5 second-wave entries (temporal
analytics and corpus-prep): properties the DuckDB hash comparison can't
state naturally — EWMA algebraic bounds, attribution window discipline,
SCD-2 interval integrity, Wilson shrinkage ordering, PCA normalization,
containment-vs-Jaccard dominance — plus the plan shapes the 100 TB story
depends on (the union-trick attribution must be join-free; containment
must be an equi-join, not a cross product).
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


# -- ewma_value_by_user ----------------------------------------------------


def test_ewma_covers_every_event_with_bounded_window(spark, sf_dir):
    out = _run(spark, sf_dir, "ewma_value_by_user")
    n_events = load_table(spark, sf_dir, "events").count()
    rows = out.collect()
    assert len(rows) == n_events
    assert all(1 <= r["n_window"] <= 8 for r in rows)


def test_ewma_first_event_equals_value(spark, sf_dir):
    # a 1-row window's EWMA is the value itself (weights collapse to 1)
    ev = load_table(spark, sf_dir, "events")
    w = {r["event_id"]: r["value"] for r in ev.collect()}
    rows = _run(spark, sf_dir, "ewma_value_by_user").where(F.col("n_window") == 1).collect()
    assert rows
    for r in rows:
        assert abs(r["ewma_8"] - w[r["event_id"]]) < 1e-4


# -- attribution_last_touch ------------------------------------------------


def test_attribution_covers_all_purchases_and_respects_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    rows = _run(spark, sf_dir, "attribution_last_touch").collect()
    assert len(rows) == n_purchases
    for r in rows:
        # credited iff a qualifying click exists; gap within (0, 3600]
        assert (r["click_id"] is None) == (r["gap_s"] is None)
        if r["gap_s"] is not None:
            assert 0 <= r["gap_s"] <= 3600


def test_attribution_is_join_free(spark, sf_dir):
    # the union trick's whole point: ONE window pass, no as-of join
    plan = _plan(spark, sf_dir, "attribution_last_touch")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# -- scd2_intervals_user_type ----------------------------------------------


def test_scd2_intervals_are_contiguous_and_single_current(spark, sf_dir):
    rows = _run(spark, sf_dir, "scd2_intervals_user_type").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for runs in by_user.values():
        runs.sort(key=lambda r: r["run_id"])
        assert sum(r["is_current"] for r in runs) == 1
        assert runs[-1]["is_current"] == 1 and runs[-1]["valid_to_s"] is None
        for prev, nxt in zip(runs, runs[1:]):
            assert prev["valid_to_s"] == nxt["valid_from_s"]  # half-open chain
            assert prev["event_type"] != nxt["event_type"]  # runs alternate


# -- wilson_ctr_bound ------------------------------------------------------


def test_wilson_bound_shrinks_toward_zero(spark, sf_dir):
    rows = _run(spark, sf_dir, "wilson_ctr_bound").collect()
    assert rows
    for r in rows:
        p = r["n_success"] / r["n_trials"]
        assert -1e-9 <= r["wilson_lb"] <= p + 1e-9  # lower bound below MLE
    # shrinkage: among equal rates, more trials ⇒ bound not smaller
    by_rate: dict[float, list] = {}
    for r in rows:
        by_rate.setdefault(round(r["n_success"] / r["n_trials"], 6), []).append(r)
    for grp in by_rate.values():
        grp.sort(key=lambda r: r["n_trials"])
        for a, b in zip(grp, grp[1:]):
            assert a["wilson_lb"] <= b["wilson_lb"] + 1e-9


# -- cooccurrence_pmi_topk -------------------------------------------------


def test_pmi_output_ordered_and_finite(spark, sf_dir):
    rows = _run(spark, sf_dir, "cooccurrence_pmi_topk").collect()
    assert rows
    cnts = [r["pair_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(r["pair_cnt"] >= 10 for r in rows)
    assert all(math.isfinite(r["pmi"]) for r in rows)


# -- phrase_merge_apply ----------------------------------------------------


def test_phrase_merge_shrinks_token_counts(spark, sf_dir):
    rows = _run(spark, sf_dir, "phrase_merge_apply").collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    pairs = {r["merged_pair"] for r in rows}
    assert len(pairs) == 1  # one global winning pair
    (pair,) = pairs
    assert "_" in pair
    assert all(r["n_tokens_after"] <= r["n_tokens_before"] for r in rows)
    # the top pair occurs somewhere — at least one document got shorter
    assert any(r["n_tokens_after"] < r["n_tokens_before"] for r in rows)


def test_phrase_merge_matches_direct_count(spark, sf_dir):
    # tokens removed == greedy non-overlapping occurrences of the pair,
    # recomputed independently in Python on the raw text
    rows = _run(spark, sf_dir, "phrase_merge_apply").collect()
    a, b = rows[0]["merged_pair"].split("_", 1)
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        toks = docs[r["doc_id"]].split()
        merged, i = 0, 0
        while i < len(toks) - 1:
            if toks[i] == a and toks[i + 1] == b:
                merged, i = merged + 1, i + 2
            else:
                i += 1
        assert r["n_tokens_before"] - r["n_tokens_after"] == merged


# -- pca_power_iteration ---------------------------------------------------


def test_pca_step_returns_unit_vector(spark, sf_dir):
    rows = _run(spark, sf_dir, "pca_power_iteration").collect()
    assert len(rows) == 64
    assert sorted(r["dim"] for r in rows) == list(range(1, 65))
    norm = math.sqrt(sum(r["v1"] ** 2 for r in rows))
    assert abs(norm - 1.0) < 1e-2  # components rounded to 4 decimals


def test_pca_step_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").collect()
    x = np.array([r["embedding"] for r in emb], dtype=np.float64)
    v0 = np.full(64, 0.125)
    s = x.T @ (x @ v0)
    v1 = s / np.linalg.norm(s)
    got = {r["dim"]: r["v1"] for r in _run(spark, sf_dir, "pca_power_iteration").collect()}
    for d in range(64):
        assert abs(got[d + 1] - v1[d]) < 1e-3


# -- ngram_containment_topk ------------------------------------------------


def test_containment_bounds_and_order(spark, sf_dir):
    rows = _run(spark, sf_dir, "ngram_containment_topk").collect()
    assert rows
    vals = [r["containment"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["containment"] <= 1.0 + 1e-9
        assert r["shared"] >= 1


def test_containment_uses_equi_join_not_cross_product(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ngram_containment_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
