"""Empty-input and degenerate-input robustness: every operator must
return an empty (or sane) result, never raise."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StringType, StructField, StructType

from govgis_nov2023_slim_spatial_server_spark.operators.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from govgis_nov2023_slim_spatial_server_spark.operators.knn import knn, similarity_join
from govgis_nov2023_slim_spatial_server_spark.operators.topk import top_k
from govgis_nov2023_slim_spatial_server_spark.operators.windows import session_window_agg, tumbling_window_agg


@pytest.fixture(scope="module")
def empty_vecs(spark):
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame([], schema)


@pytest.fixture(scope="module")
def empty_docs(spark):
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    return spark.createDataFrame([], schema)


def test_knn_empty_corpus(spark, empty_vecs):
    assert knn(empty_vecs, [1.0, 0.0], k=5).count() == 0


def test_similarity_join_empty_sides(spark, empty_vecs):
    probes = empty_vecs.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    corpus = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id: long, embedding: array<float>")
    assert similarity_join(probes, corpus, k=3).count() == 0
    probes2 = corpus.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb"))
    assert similarity_join(probes2, empty_vecs, k=3).count() == 0


def test_dedup_empty_and_degenerate_docs(spark, empty_docs):
    assert minhash_near_duplicates(empty_docs, "doc_id", "text").count() == 0
    assert simhash_near_duplicates(empty_docs, "doc_id", "text").count() == 0
    # docs with empty/whitespace/NULL text must not crash
    weird = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one two three")],
        "doc_id: long, text: string",
    )
    assert minhash_near_duplicates(weird, "doc_id", "text").count() >= 0
    assert ngram_jaccard_pairs(weird, "doc_id", "text", threshold=0.9).count() >= 0


def test_topk_k_larger_than_input(spark):
    df = spark.createDataFrame([(1,), (2,)], "id: long")
    assert top_k(df, [F.col("id").asc()], k=100).count() == 2
    assert top_k(df, [F.col("id").asc()], k=100, skip=5).count() == 0


def test_windows_empty_events(spark):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    empty = spark.createDataFrame([], schema)
    assert tumbling_window_agg(empty).count() == 0
    assert session_window_agg(empty).count() == 0


def test_udtf_sentence_split(spark):
    """Python UDTF (Spark 4 surface): 1→N row expansion in pure Python —
    for when mapInPandas' batch model doesn't fit."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, sent_idx: int, sentence: string")
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, s in enumerate(p.strip() for p in text.split(".") if p.strip()):
                yield doc_id, i, s

    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.createDataFrame(
        [(1, "First. Second. Third."), (2, None), (3, "Only one")],
        "doc_id: long, text: string",
    )
    df.createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        "SELECT s.* FROM docs_udtf, LATERAL split_sentences(doc_id, text) s"
    ).collect()
    got = {(r["doc_id"], r["sent_idx"]): r["sentence"] for r in out}
    assert got[(1, 0)] == "First" and got[(1, 2)] == "Third"
    assert (3, 0) in got and len([k for k in got if k[0] == 2]) == 0
