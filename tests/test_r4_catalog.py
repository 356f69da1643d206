"""Semantic contracts for the r4 catalog entries (corpus statistics,
curriculum/dedup reporting, clustering step, robust stats, relative-standing
windows, retention cohorts) — properties the DuckDB oracle can't state as
naturally (bucket invariants, partition-of-the-corpus checks, monotonicity).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES


def _run(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)


def test_bigram_top_counts(spark, sf_dir):
    rows = _run(spark, sf_dir, "bigram_top_counts").collect()
    assert len(rows) == 20
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["bigram"].split(" ")) == 2 for r in rows)


def test_zipf_slope_is_negative(spark, sf_dir):
    r = _run(spark, sf_dir, "zipf_slope_unigrams").first()
    assert 0 < r["n_terms"] <= 100
    assert r["slope"] < 0  # frequency decreases with rank, always


def test_curriculum_buckets_partition_corpus(spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = sorted(
        _run(spark, sf_dir, "quality_curriculum_buckets").collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == n_docs
    # equal-depth cut of a sorted order: tiers don't overlap in score
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_quality"] <= hi["min_quality"] + 1e-9
    # NTILE balance: sizes differ by at most one
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_retention_summary_counts_injected_dups(spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    r = _run(spark, sf_dir, "dedup_retention_summary").first()
    # 20 docs injected once + 5 twice; base corpus is dup-free
    assert r["n_docs"] == n_docs + 25
    assert r["n_retained"] == n_docs
    assert r["n_dropped"] == 25
    assert math.isclose(r["dup_rate"], round(25 / (n_docs + 25), 6), abs_tol=1e-6)


def test_kmeans_assign_partitions_all_vectors(spark, sf_dir):
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = _run(spark, sf_dir, "kmeans_assign_step").collect()
    assert [r["cid"] for r in rows] == list(range(1, 9))
    assert sum(r["n_assigned"] for r in rows) == n_vecs
    assert all(r["avg_dist"] >= 0 for r in rows)
    # each seed vector is its own nearest centroid (distance 0 pulls the
    # mean of its cluster below the global mean only weakly — just assert
    # every cluster is non-empty)
    assert all(r["n_assigned"] >= 1 for r in rows)


def test_mad_is_robust_scale(spark, sf_dir):
    rows = _run(spark, sf_dir, "mad_totalprice_by_status").collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["median_price"] > 0
        # MAD can't exceed the largest absolute deviation, which for
        # positive data is bounded by max(median, max - median) — loose
        # sanity: strictly positive and below the median's magnitude × 10
        assert 0 < r["mad_price"] < r["median_price"] * 10


def test_percent_rank_bounds_and_cume_top(spark, sf_dir):
    df = _run(spark, sf_dir, "window_percent_rank_prices")
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert df.count() == n_orders
    bounds = df.agg(
        F.min("pct_rank"), F.max("pct_rank"), F.min("cume_d"), F.max("cume_d")
    ).first()
    assert bounds[0] == 0.0 and bounds[1] <= 1.0
    assert bounds[2] > 0.0 and bounds[3] == 1.0
    # the last row of every partition has cume_dist exactly 1
    tops = (
        df.groupBy("o_orderpriority").agg(F.max("cume_d").alias("m")).collect()
    )
    assert all(t["m"] == 1.0 for t in tops)


def test_retention_cohort_day_zero_is_full_cohort(spark, sf_dir):
    df = _run(spark, sf_dir, "user_retention_cohorts")
    rows = df.collect()
    assert all(r["day_offset"] >= 0 for r in rows)
    # offset-0 count equals cohort size: every member purchased (hence was
    # active) on the cohort day itself
    day0 = {r["cohort_day"]: r["n_users"] for r in rows if r["day_offset"] == 0}
    for r in rows:
        assert r["n_users"] <= day0[r["cohort_day"]]


def test_token_length_histogram_buckets(spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = _run(spark, sf_dir, "token_length_histogram").collect()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 2 ** r["bucket"] <= r["min_tokens"] <= r["max_tokens"]
        assert r["max_tokens"] < 2 ** (r["bucket"] + 1)


def test_approx_stats_within_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "approx_stats_events").collect()
    assert len(rows) >= 1
    # the flags ARE the assertion: HLL and GK landed inside tolerance
    assert all(r["users_ok"] == 1 and r["p50_ok"] == 1 for r in rows)


def test_bucketed_join_has_no_join_shuffle(spark, sf_dir):
    df = _run(spark, sf_dir, "bucketed_join_revenue")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the bucketed scans co-locate the join: no Exchange may repartition
    # either join key (the only Exchange allowed is the groupBy's)
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_sweeps_stale_warehouse_dirs(spark, sf_dir):
    """A bkt_* dir left by a DEAD pid is removed at entry; a LIVE pid's
    (this process, and any other running uid-visible pid) is preserved."""
    import os

    from govgis_nov2023_slim_spatial_server_spark.catalog.relational import (
        _sweep_stale_bucketed,
        _warehouse_root,
    )

    root = _warehouse_root(spark)
    assert root is not None
    os.makedirs(root, exist_ok=True)
    # a pid that cannot exist (kernel pid_max is < 2**22 + 5); simulates a
    # killed gate/bench run whose atexit hook never fired
    stale = os.path.join(root, f"bkt_orders_{2**22 + 5}")
    live = os.path.join(root, f"bkt_orders_{os.getpid()}")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(live, exist_ok=True)
    try:
        _sweep_stale_bucketed(spark)
        assert not os.path.exists(stale)  # dead pid → swept
        assert os.path.exists(live)  # own pid → untouched
    finally:
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree(live, ignore_errors=True)


def test_events_ts_both_physical_shapes_load_identically(spark, tmp_path):
    """The driver testdata has shipped events.ts as parquet TIMESTAMP(NANOS)
    and as plain µs timestamps in different generations; the loader must
    yield byte-identical µs timestamps for both (ns truncates, matching
    DuckDB's coercion)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from govgis_nov2023_slim_spatial_server_spark.schemas import load_table

    ts = [
        dt.datetime(2024, 1, 1, 0, 0, 7, 179575),
        dt.datetime(2024, 3, 1, 23, 59, 59, 999999),
    ]
    base = pa.table(
        {
            "event_id": [1, 2],
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": [1, 2],
            "event_type": ["a", "b"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    ns = base.set_column(1, "ts", base["ts"].cast(pa.timestamp("ns")))
    for shape, tbl in (("us", base), ("ns", ns)):
        (tmp_path / shape).mkdir()
        pq.write_table(tbl, str(tmp_path / shape / "events.parquet"))

    got_us = load_table(spark, str(tmp_path / "us"), "events")
    got_ns = load_table(spark, str(tmp_path / "ns"), "events")
    assert dict(got_us.dtypes)["ts"] == "timestamp"
    assert dict(got_ns.dtypes)["ts"] == "timestamp"
    a = [r["ts"] for r in got_us.orderBy("event_id").collect()]
    b = [r["ts"] for r in got_ns.orderBy("event_id").collect()]
    assert a == b == ts


def test_kmeans_plan_is_join_free(spark, sf_dir):
    """The assignment argmin is a per-row expression over centroid
    literals — any Join/Window in the plan means the scale shape regressed."""
    plan = (
        _run(spark, sf_dir, "kmeans_assign_step")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" not in plan


def test_zipf_ranks_only_a_topk_head(spark, sf_dir):
    """The vocabulary must reach the ranking window only through a
    per-partition top-k heap, never a global sort of all terms."""
    plan = (
        _run(spark, sf_dir, "zipf_slope_unigrams")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
