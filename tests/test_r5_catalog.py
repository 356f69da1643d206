"""Semantic contracts for the r5 catalog entries: the two approximate-path
mechanism twins (LSH similarity join, IVF probe-and-rank) and the new
text/behavioral-pipeline operators (BPE pair counts, char entropy,
gaps-and-islands change log) — properties the DuckDB hash comparison can't
state as naturally (recall vs the exact operator, partition-of-the-corpus
invariants, run alternation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES


def _run(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)


def test_similarity_join_lsh_oracle_self_match(spark, sf_dir):
    rows = _run(spark, sf_dir, "similarity_join_lsh_oracle").collect()
    assert len(rows) == 15  # 5 probes × k=3
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, nbrs in by_probe.items():
        # a probe's own bucket is always probed, so it must find itself
        assert any(r["vec_id"] == pid and abs(r["dist"]) < 1e-9 for r in nbrs)


def test_similarity_join_lsh_recall_vs_exact(spark, sf_dir):
    lsh = {
        (r["probe_id"], r["vec_id"])
        for r in _run(spark, sf_dir, "similarity_join_lsh_oracle").collect()
    }
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in _run(spark, sf_dir, "similarity_join_topk").collect()
    }
    # approximate: recall against the exact join is the contract, not 100%
    assert len(lsh & exact) / len(exact) >= 0.3


def test_knn_ivf_oracle_sorted_and_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "knn_ivf_oracle").collect()
    assert len(rows) == 10
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(0.0 <= d <= 2.0 for d in dists)


def test_bpe_pair_counts_shape(spark, sf_dir):
    rows = _run(spark, sf_dir, "bpe_pair_counts").collect()
    assert len(rows) == 20
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


def test_char_entropy_covers_corpus_exactly(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = _run(spark, sf_dir, "char_entropy_quality").collect()
    assert len(rows) == d.count()
    # Σ n_chars == Σ length(text): the char explode dropped/invented nothing
    total = d.select(F.sum(F.length("text"))).first()[0]
    assert sum(r["n_chars"] for r in rows) == total
    # 0 ≤ H ≤ log2(alphabet); single-space ASCII word soup sits well under 6
    assert all(0.0 <= r["entropy"] <= 6.0 for r in rows)


def test_dedup_keep_best_doc_covers_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = _run(spark, sf_dir, "dedup_keep_best_doc").collect()
    # components partition the corpus: member counts sum to |docs|
    assert sum(r["n_members"] for r in rows) == d.count()
    # the kept doc is a member of its own component (component = min id
    # reachable, so kept_doc_id >= component) and quality is a valid score
    for r in rows:
        assert r["kept_doc_id"] >= r["component"]
        assert 0.0 <= r["kept_quality"] <= 1.0
    # one row per component
    comps = [r["component"] for r in rows]
    assert len(comps) == len(set(comps))


def test_spatial_knn_radius_filter_precedes_window(spark, sf_dir):
    """The 10-degree radius guard must be a Filter BELOW the per-probe
    Window (executed plans print top-down: Window above Filter), so the
    window's shuffle carries only in-radius rows — the plan shape that
    maps onto bbox row-group pruning at scale."""
    df = QUERIES["spatial_knn_rect_centroids"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    fi, wi = plan.find("10.0"), plan.find("Window")
    assert fi != -1 and wi != -1 and wi < fi
    # the guard keeps >= k candidates per probe: result is full 5x3
    assert df.count() == 15


def test_streaming_entry_pins_utc_on_foreign_timezone_session(spark, sf_dir):
    """The r4 ADVICE failure mode: on a session whose zone is NOT UTC, the
    NTZ→LTZ cast inside normalize_events_ts would shift every streaming
    window epoch by the zone offset (28800 s for America/Los_Angeles)
    against the UTC DuckDB oracle. _events_stream pins UTC itself, so the
    result must be identical no matter what zone the driver session had."""
    baseline = {
        (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in _run(spark, sf_dir, "stream_tumbling_event_counts").collect()
    }
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        shifted_session = {
            (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in _run(spark, sf_dir, "stream_tumbling_event_counts").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert shifted_session == baseline


def test_cumulative_distinct_users_monotone_and_totals(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = sorted(
        _run(spark, sf_dir, "cumulative_distinct_users").collect(),
        key=lambda r: r["day"],
    )
    # running sum is strictly increasing and ends at |distinct users|
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == e.select("user_id").distinct().count()
    assert sum(r["n_new_users"] for r in rows) == cums[-1]


def test_bigram_lm_cross_entropy_properties(spark, sf_dir):
    rows = _run(spark, sf_dir, "bigram_lm_cross_entropy").collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == d.count()
    for r in rows:
        # -log2 of probabilities in (0,1]: cross-entropy >= 0, and a
        # bigram LM over a finite corpus is bounded by log2(n_bigrams)
        assert r["cross_entropy"] >= 0.0
        assert r["n_bigrams"] >= 1


def test_event_type_change_log_partitions_events(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = _run(spark, sf_dir, "event_type_change_log").collect()
    # runs partition the event stream
    assert sum(r["n_events"] for r in rows) == e.count()
    # within a user, consecutive runs must change type (else they'd be one
    # run) and run ids start at 1
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for runs in by_user.values():
        runs.sort(key=lambda r: r["run_id"])
        assert runs[0]["run_id"] == 1
        assert [r["run_id"] for r in runs] == list(range(1, len(runs) + 1))
        for a, b in zip(runs, runs[1:]):
            assert a["event_type"] != b["event_type"]


def test_zscore_norms_by_label_group_properties(spark, sf_dir):
    import math

    rows = _run(spark, sf_dir, "zscore_norms_by_label").collect()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert len(rows) == e.count()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["z"])
    for zs in by_label.values():
        # standardized within group: mean ~0 (rounding-limited), |z| sane
        assert abs(sum(zs) / len(zs)) < 1e-3
        assert all(abs(z) < 10 for z in zs)


def test_pagerank_one_iter_mass_conservation(spark, sf_dir):
    rows = _run(spark, sf_dir, "pagerank_one_iter").collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pagerank"] for r in rows)
    # one damped iteration preserves total mass: sum = 0.15 + 0.85 = 1
    # (every edge-connected node both sends and receives; rounding noise)
    assert abs(total - 1.0) < 1e-4 * n
