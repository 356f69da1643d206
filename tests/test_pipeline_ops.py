"""Deterministic sampling / splitting / chunking operator contracts."""

import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.chunking import chunk_by_tokens
from govgis_nov2023_slim_spatial_server_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "k")


def test_sample_fraction_and_determinism(spark, keyed):
    s1 = deterministic_sample(keyed, "k", 0.1)
    n = s1.count()
    assert abs(n / 20000 - 0.1) < 0.02  # hash uniformity
    # identical member set on a different partitioning — the property
    # df.sample() does NOT have
    s2 = deterministic_sample(keyed.repartition(13), "k", 0.1)
    assert s1.count() == s2.count()
    assert s1.exceptAll(s2).count() == 0
    # nested fractions: the 5% sample is a subset of the 10% sample
    s3 = deterministic_sample(keyed, "k", 0.05)
    assert s3.exceptAll(s1).count() == 0


def test_hash_split_disjoint_and_complete(spark, keyed):
    out = hash_split(keyed, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000  # weights sum to 1 → total coverage
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    # a row appears in exactly one split
    assert out.groupBy("k").count().agg(F.max("count")).first()[0] == 1


def test_hash_split_rejects_overweight(spark, keyed):
    with pytest.raises(ValueError):
        hash_split(keyed, "k", {"a": 0.9, "b": 0.2})


def test_chunking_covers_and_overlaps(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "a b c")], "doc_id: long, text: string")
    out = chunk_by_tokens(df, "doc_id", "text", chunk_tokens=10, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 2 fits in one chunk
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert rows[(2, 0)]["n_tokens"] == 3
    # doc 1: stride 8 → chunks at 0,8,16,...; ⌈(100-10)/8⌉+1 = 13 chunks
    d1 = [r for (d, _), r in sorted(rows.items()) if d == 1]
    assert len(d1) == 13
    assert d1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    # consecutive chunks overlap by exactly 2 tokens
    assert d1[0]["chunk_text"].split()[-2:] == d1[1]["chunk_text"].split()[:2]
    # every token appears in at least one chunk (coverage)
    seen = {t for r in d1 for t in r["chunk_text"].split()}
    assert len(seen) == 100
    # last chunk is the tail, never empty
    assert d1[-1]["n_tokens"] >= 1


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_repetition_metrics_crafted(spark):
    from govgis_nov2023_slim_spatial_server_spark.functions.text import repetition_metrics

    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "x y z w"), (2, "q q q q")], ["id", "text"]
    )
    m = repetition_metrics(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            m["n_words"].alias("nw"),
            F.round(m["top_word_ratio"], 4).alias("top"),
            F.round(m["distinct_ratio"], 4).alias("dis"),
            F.round(m["dup_2gram_ratio"], 4).alias("bg"),
        ).collect()
    }
    # "a a a b": top=3/4, distinct=2/4, bigrams [a a, a a, a b] → 1 dup of 3
    assert rows[0]["nw"] == 4 and rows[0]["top"] == 0.75 and rows[0]["dis"] == 0.5
    assert rows[0]["bg"] == round(1 / 3, 4)
    assert rows[1]["top"] == 0.25 and rows[1]["dis"] == 1.0 and rows[1]["bg"] == 0.0
    # "q q q q": 3 bigrams, 1 distinct → dup ratio 2/3
    assert rows[2]["top"] == 1.0 and rows[2]["dis"] == 0.25 and rows[2]["bg"] == round(2 / 3, 4)


def test_dedup_chunks_keep_first(spark):
    from govgis_nov2023_slim_spatial_server_spark.operators.chunking import dedup_chunks

    base = " ".join(f"w{i}" for i in range(64))  # two 32-token chunks
    df = spark.createDataFrame(
        [(0, base), (1, base + " tail words here"), (2, "unique doc text")],
        ["doc_id", "text"],
    )
    chunks = chunk_by_tokens(df, "doc_id", "text", chunk_tokens=32, overlap=0)
    kept = dedup_chunks(chunks)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in kept.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # doc 0 keeps both chunks; doc 1's first two chunks duplicate doc 0's →
    # only its 3-token tail chunk survives; doc 2 untouched
    assert per_doc == {0: 2, 1: 1, 2: 1}
    # hash-key and exact-key paths agree
    exact = dedup_chunks(chunks, exact_key=True)
    assert kept.select("doc_id", "chunk_id").exceptAll(
        exact.select("doc_id", "chunk_id")
    ).count() == 0


def test_decontaminate_flags_overlap(spark):
    from govgis_nov2023_slim_spatial_server_spark.operators.decontaminate import (
        contamination_counts,
        decontaminate,
    )

    bench_text = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (0, bench_text),                                  # benchmark
            (1, "clean " + " ".join(f"c{i}" for i in range(10))),
            (2, "prefix " + bench_text + " suffix"),          # contaminated
        ],
        ["doc_id", "text"],
    )
    bench = df.where(F.col("doc_id") == 0)
    corpus = df.where(F.col("doc_id") > 0)
    counts = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in contamination_counts(corpus, bench, "doc_id", "text", ngram=8).collect()
    }
    assert 2 in counts and 1 not in counts
    assert counts[2] == 3  # 10-token benchmark has 3 distinct 8-gram shingles
    clean = decontaminate(corpus, bench, "doc_id", "text", ngram=8)
    assert [r["doc_id"] for r in clean.select("doc_id").collect()] == [1]


def test_stratified_sample_per_stratum(spark):
    from govgis_nov2023_slim_spatial_server_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    df = spark.range(0, 30000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("cls")
    )
    out = stratified_sample(df, "k", "cls", {0: 0.5, 1: 0.1})
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert 2 not in counts  # absent stratum dropped
    assert abs(counts[0] / 10000 - 0.5) < 0.03
    assert abs(counts[1] / 10000 - 0.1) < 0.03
    # same key hash ⇒ stratum members are the plain sample restricted to it
    plain = deterministic_sample(df.where(F.col("cls") == 0), "k", 0.5)
    assert out.where(F.col("cls") == 0).select("k").exceptAll(plain.select("k")).count() == 0


def test_knn_quantized_rerank_matches_exact(spark):
    """int8 candidate scan + exact rerank recovers the exact top-k on this
    corpus (quantization error ≪ neighbor gaps at candidates=3k)."""
    import numpy as np

    from govgis_nov2023_slim_spatial_server_spark.operators.knn import (
        knn,
        knn_quantized_rerank,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    probe = (rng.randn(16) / 4.0).tolist()
    exact = [r["vec_id"] for r in knn(df, probe, k=5, normalized=False).collect()]
    reranked = [r["vec_id"] for r in knn_quantized_rerank(df, probe, k=5, candidates=15).collect()]
    assert reranked == exact


def test_pack_sequences_layout(spark):
    from govgis_nov2023_slim_spatial_server_spark.operators.chunking import pack_sequences

    # one shard: docs of 300+300+100 tokens into 512-token sequences
    df = spark.createDataFrame(
        [(0, 0, 300), (1, 0, 300), (2, 0, 100)], ["doc_id", "shard", "n_tokens"]
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, "doc_id", "n_tokens", 512, "shard").collect()}
    assert (rows[0]["seq_id"], rows[0]["offset_in_seq"], rows[0]["spans_boundary"]) == (0, 0, 0)
    # doc 1 starts at 300, ends at 599 → straddles the 512 cut
    assert (rows[1]["seq_id"], rows[1]["offset_in_seq"], rows[1]["spans_boundary"]) == (0, 300, 1)
    # doc 2 starts at 600 → sequence 1, offset 88
    assert (rows[2]["seq_id"], rows[2]["offset_in_seq"], rows[2]["spans_boundary"]) == (1, 88, 0)
    # coverage: total tokens = 700 → last offset+len consistent
    assert rows[2]["offset_in_seq"] + rows[2]["n_tokens"] == 700 - 512


def test_connected_components_chain_and_islands(spark):
    from govgis_nov2023_slim_spatial_server_spark.operators.components import (
        connected_components,
        dedup_groups_from_pairs,
    )

    # component A: chain 1-2-3-4 (diameter 3 forces multiple propagation
    # rounds); component B: triangle 10-11-12; component C: pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["a", "b"],
    )
    comp = {r["id"]: r["comp"] for r in connected_components(edges, "a", "b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    groups = {
        r["comp"]: (r["n_members"], r["canonical_id"])
        for r in dedup_groups_from_pairs(edges, "a", "b").collect()
    }
    assert groups == {1: (4, 1), 10: (3, 10), 20: (2, 20)}


def test_profile_columns_single_scan(spark):
    from govgis_nov2023_slim_spatial_server_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], ["k", "s"]
    )
    got = {r["col"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert (got["k"]["n_rows"], got["k"]["n_nonnull"], got["k"]["n_distinct"]) == (4, 4, 3)
    assert (got["k"]["min_v"], got["k"]["max_v"]) == ("1", "3")
    assert (got["s"]["n_nonnull"], got["s"]["n_distinct"]) == (3, 2)
    assert (got["s"]["min_v"], got["s"]["max_v"]) == ("a", "b")
    # one scan: exactly one aggregate over the source, no union of scans
    plan = profile_columns(df, ["k", "s"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("union") == 0


def test_epoch_shuffle_guard_fires_in_plan(spark, tmp_path):
    """epoch_shuffle_shards id-bound guard (r11): the LCG rank is only
    injective for doc_id < 1000003, and the guard is an in-plan
    assert_true threaded through the rank expression — ONE job, no
    driver-side pre-scan. An out-of-range id must fail the job."""
    import pandas as pd
    import pytest
    from pyspark.errors import PySparkException

    from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES

    pd.DataFrame(
        {
            "doc_id": [1, 2, 1_000_003],
            "text": ["a b", "b", "a"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [3, 1, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    with pytest.raises(PySparkException, match="LCG modulus"):
        QUERIES["epoch_shuffle_shards"](spark, str(tmp_path)).collect()
