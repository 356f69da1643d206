"""Training-data pipeline catalog entries: reproducible sampling and
splits, token-window chunking, TF-IDF term scoring.

These are the corpus-preparation operators a 100 TB run needs BEYOND the
reference's own surface: every one is a native-expression map/agg plan
(no Python in the hot path) and every one carries an exact DuckDB oracle —
sampling here is hash-deterministic precisely so that an oracle CAN exist
(seeded RNG sampling is engine-specific and unverifiable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.chunking import chunk_by_tokens, chunk_sql
from ..operators.sampling import (
    deterministic_sample,
    hash_split,
    hash_split_case_sql,
    hash_bucket_sql,
)
from ..schemas import load_table
from ._registry import query

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "sample_deterministic_orders",
    f"""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE {hash_bucket_sql('o_orderkey')} < 500
    """,
)
def sample_deterministic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% reproducible sample of orders — identical member set in any
    engine/partitioning (hash-of-key predicate, pushes to the scan)."""
    o = _t(spark, sf_dir, "orders")
    return deterministic_sample(o, "o_orderkey", 0.05).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price")
    )


@query(
    "split_train_val_test",
    f"""
    SELECT {hash_split_case_sql('o_orderkey', _SPLITS)} AS split,
           COUNT(*) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint 80/10/10 train/val/test split by key hash; summarized per
    split. New rows joining the corpus later land in the same splits —
    the property seeded-RNG splits cannot give an incremental pipeline."""
    o = _t(spark, sf_dir, "orders")
    return hash_split(o, "o_orderkey", _SPLITS).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query("chunk_documents_tokens", chunk_sql(chunk_tokens=64, overlap=16))
def chunk_documents_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token chunks (stride 48) of every document — a pure
    map-side fan-out (split → sequence → explode → slice, no shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return chunk_by_tokens(d, "doc_id", "text", chunk_tokens=64, overlap=16)


@query(
    "tfidf_top_terms",
    """
    WITH tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM documents, LATERAL unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(term)
      GROUP BY doc_id, t.term),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS n_docs FROM tf GROUP BY term),
    n AS (SELECT COUNT(*)::DOUBLE AS total FROM documents)
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * ln(n.total / df.n_docs), 4) AS tfidf
    FROM tf JOIN df USING (term), n
    WHERE tf.doc_id < 50
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY tf.doc_id
        ORDER BY tf.tf * ln(n.total / df.n_docs) DESC, tf.term) <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (probe block doc_id < 50).

    Two hash-agg shuffles (term frequency, document frequency) + one
    broadcast of the tiny df/N sides back onto tf — the classic two-pass
    formulation; at 100 TB both aggs combine map-side."""
    d = _t(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("n_docs"))
    total = d.agg(F.count(F.lit(1)).cast("double").alias("total"))
    scored = (
        tf.where(F.col("doc_id") < 50)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(total))
        .withColumn("__s", F.col("tf") * F.log(F.col("total") / F.col("n_docs")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("__s").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 3)
        .select("doc_id", "term", F.round("__s", 4).alias("tfidf"))
    )
