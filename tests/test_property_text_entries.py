"""Property tests for the documents-based corpus-prep entries: random
single-space word-soup corpora (tiny vocabularies force adjacent-pair
pileups, repeated words, self-similar docs — the adversarial cases for
greedy merge scanning, PMI marginals, and shingle containment), written
through the driver's parquet shape; the catalog entry and its own DuckDB
oracle must agree row-for-row.

The vocabulary is deliberately tiny ('a', 'b', 'ab', 'aa') so that
overlapping pair occurrences ('a b a b'), words that are prefixes of other
words, and pair strings colliding with single tokens ('a b' vs 'ab') all
occur — the exact traps for the space-doubling greedy replace and for
whitespace tokenization parity.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES

ENTRIES = [
    "phrase_merge_apply",
    "cooccurrence_pmi_topk",
    "ngram_containment_topk",
    "ngram_containment_capped",
    "graph_triangle_count",
    "char_entropy_quality",
    "udtf_trigram_counts",
    # wider documents family: tokenization/counting/scoring parity on
    # degenerate corpora (repeated words, 1-token docs, prefix collisions)
    "bpe_pair_counts",
    # r15: the encode loop — random a/b soups force overlapping-pair
    # pileups ('a b a b'), merged-token/word collisions ('ab'), and
    # cascading rank interactions; engine HOF rewrite and oracle CTE
    # chain must agree on every draw
    "bpe_encode_merges",
    # r15 wave 2: MOSS winnowing — random word soups force short docs
    # (single whole-doc windows), repeated words (gram-key ties → the
    # rightmost-tie rule), and hash-adjacent grams on both engines
    "winnowing_fingerprints",
    "bigram_top_counts",
    "token_counts",
    "doc_quality",
    "corpus_stats_documents",
    "zipf_slope_unigrams",
    "bigram_lm_cross_entropy",
    "doc_length_outliers",
    "mixture_temperature_schedule",
    "ngram_jaccard_topk",
    "pii_redaction",
    "repetition_filter",
    "lang_id_stopwords",
    "token_length_histogram",
    "stopword_ratio_en",
    "fingerprint_dup_groups",
    "chunk_documents_tokens",
    "chunk_dedup_summary",
    "pack_sequences_512",
    "oov_rate_top_vocab",
    "tfidf_top_terms",
    "vocab_kl_train_val",
    "dedup_retention_summary",
    "inverted_index_postings",
    "bm25_keyword_search",
    "incremental_dedup_merge",
    "decontaminate_benchmark",
    "char_ngram_counts",
    "multimodal_byte_stats",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_windows",
    "simhash_poly_signature",
    "minhash_neardup_oracle",
    "quality_curriculum_buckets",
    "dedup_keep_best_doc",
    "flagship_hybrid_search",
    "weighted_sample_by_quality",
    # r10: batching-efficiency + deterministic epoch shuffle — random
    # token counts vary bucket occupancy (incl. empty buckets) and the
    # LCG shard argmin must stay injective on any doc_id set
    "length_bucket_padding",
    "epoch_shuffle_shards",
    # r10: rank-level fusion — random corpora exercise the candidate-list
    # boundary (all-tied integer lexical scores) and the one-sided /
    # missing-doc full-outer arms (docs without embeddings rows)
    "rrf_fusion_topk",
    # r11: systematic PPS — tiny corpora force multi-picks (w > W/k) and
    # the pick-on-interval-boundary cases; all-int64, no rounding anywhere
    "pps_systematic_sample",
    # r11: substring chains — the tiny repeated vocab ('a b a b', words
    # that repeat within one doc) forces multi-occurrence grams, hence
    # many diagonals per pair and chains that merge/split adversarially
    "substring_dup_chains",
    # r11: prefix-filter Jaccard — near-identical tiny docs sit ON the
    # 3/5 boundary constantly (small sets make exact-threshold ties
    # common) and the df ordering ties on shingle text
    "prefix_filter_jaccard_pairs",
    # r12: trim action — tiny repeated vocab makes spans from DIFFERENT
    # earlier docs overlap constantly, the exact case where interval
    # union vs span-sum diverge; self-repetition inside one doc adds
    # multi-diagonal overlapping spans
    "substring_trim_retention",
    # r13: nucleus (top-p) vocabulary cutoff — tiny random vocabularies
    # force the boundary token onto count ties (token-text tie-break)
    # and the everything-kept / single-token regimes
    "nucleus_vocab_coverage",
]

VOCAB = ["a", "b", "ab", "aa", "the", "x"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=30),
    min_size=2,
    max_size=15,
)


def _write_docs(doc_tokens, dirname: str) -> None:
    df = pd.DataFrame(
        {
            "doc_id": range(1, len(doc_tokens) + 1),
            "text": [" ".join(toks) for toks in doc_tokens],
            "lang": ["en"] * len(doc_tokens),
            "source": ["synthetic"] * len(doc_tokens),
            "n_chars": [len(" ".join(toks)) for toks in doc_tokens],
        }
    )
    df.to_parquet(os.path.join(dirname, "documents.parquet"), index=False)
    # aligned embeddings (vec_id == doc_id): deterministic unit-ish
    # vectors seeded per doc, few labels so blocking groups collide —
    # lets the documents⋈embeddings entries (dedup_keep_best_doc) run on
    # the same random corpus
    import numpy as np

    n = len(doc_tokens)
    rng = np.random.default_rng(20240301)
    emb = rng.normal(0.0, 0.125, size=(n, 64)).astype(np.float32)
    pd.DataFrame(
        {
            "vec_id": np.arange(1, n + 1),
            "embedding": [e.tolist() for e in emb],
            "label": (np.arange(1, n + 1) % 3).astype(np.int32),
        }
    ).to_parquet(os.path.join(dirname, "embeddings.parquet"), index=False)


def _normalize(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in (tuple(r) if not isinstance(r, tuple) else r)
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("entry", ENTRIES)
@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(doc_tokens=docs_strategy)
def test_text_entry_matches_its_oracle_on_random_docs(spark, entry, doc_tokens):
    with tempfile.TemporaryDirectory() as d:
        _write_docs(doc_tokens, d)
        got = _normalize(
            [tuple(r) for r in QUERIES[entry](spark, d).collect()]
        )
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        want = _normalize(con.execute(ORACLES[entry]).fetchall())
        con.close()
        assert got == want
