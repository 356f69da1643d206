"""Benchmark decontamination — drop/flag training documents that overlap an
evaluation set (the standard n-gram–collision rule used by LLM data
pipelines; not in the reference, whose corpus is a static snapshot).

Shape at 100 TB: the benchmark side is small by construction (eval suites
are thousands of documents), so its distinct shingle set broadcasts; the
corpus side is a map-only explode into shingles followed by a broadcast
hash semi-join and one aggregation — the full corpus is never shuffled,
only the (rare) matching shingle rows are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import word_shingles


def contamination_counts(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 8,
) -> DataFrame:
    """(id, n_shared_shingles) for every corpus doc sharing ≥1 word n-gram
    with any benchmark doc. Shingles are lowercased and per-doc distinct, so
    the count is "how many distinct benchmark n-grams this doc contains"."""
    bench_sh = benchmark.select(
        F.explode(word_shingles(F.lower(F.col(text_col)), ngram)).alias("g")
    ).distinct()
    corp_sh = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(F.lower(F.col(text_col)), ngram)).alias("g"),
    )
    return (
        corp_sh.join(F.broadcast(bench_sh), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 8,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti join against the flagged
    id set — at scale the flag set is tiny, so this broadcasts too)."""
    flagged = contamination_counts(corpus, benchmark, id_col, text_col, ngram).select(id_col)
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
