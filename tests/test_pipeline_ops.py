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
