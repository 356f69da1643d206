"""Token-window document chunking — the context-length shaper in a
training-data pipeline (long doc → overlapping fixed-token chunks).

Fully native (split → sequence → explode → slice): per-row fan-out with no
shuffle at all — chunking 100 TB is a map-only stage whose output streams
straight into the next operator or sink. The same windowing arithmetic is
expressible over DuckDB lists, so the operator carries an exact oracle.

Chunk layout: stride S = chunk_tokens - overlap; chunk i covers tokens
[i·S, i·S + chunk_tokens); n_chunks = 1 if n ≤ chunk_tokens else
⌈(n - chunk_tokens)/S⌉ + 1 (the final chunk may run short, never empty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into (id, chunk_id, chunk_text, n_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)).cast("long") + 1
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_id").cast("int") * stride + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__toks"), F.col("chunk_id").cast("int") * stride + 1, chunk_tokens)
            ).cast("long").alias("n_tokens"),
        )
    )


def dedup_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    text_col: str = "chunk_text",
    exact_key: bool = False,
) -> DataFrame:
    """Keep-first dedup at chunk granularity (boilerplate removal: identical
    passages repeated across documents survive exactly once, in the lowest
    (doc, chunk) position).

    The dedup key is ``xxhash64(chunk_text)`` by default — the shuffle for
    the keep-first window then carries an 8-byte key instead of the full
    passage text, which is what makes this viable over 100 TB of chunks
    (a 64-bit collision merging two genuinely different passages is ~1e-8
    at a trillion chunks — the standard trade; pass ``exact_key=True`` to
    shuffle the text itself when exactness matters more than width).
    """
    key = F.col(text_col) if exact_key else F.xxhash64(F.col(text_col))
    w = Window.partitionBy(key).orderBy(F.col(id_col).asc(), F.col(chunk_id_col).asc())
    return (
        chunks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def chunk_sql(
    chunk_tokens: int = 64, overlap: int = 16, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of ``chunk_by_tokens`` over the documents table."""
    s = chunk_tokens - overlap
    return f"""
    WITH t AS (
      SELECT {id_col}, regexp_split_to_array(trim(text), '\\s+') AS w,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n
      FROM documents),
    c AS (
      SELECT {id_col}, w, n,
             CASE WHEN n <= {chunk_tokens} THEN 1
                  ELSE CAST(FLOOR((n - {chunk_tokens} + {s} - 1) / {s}.0) AS BIGINT) + 1
             END AS n_chunks
      FROM t)
    SELECT {id_col},
           CAST(i AS BIGINT) AS chunk_id,
           array_to_string(w[CAST(i AS INT) * {s} + 1 : CAST(i AS INT) * {s} + {chunk_tokens}], ' ') AS chunk_text,
           len(w[CAST(i AS INT) * {s} + 1 : CAST(i AS INT) * {s} + {chunk_tokens}])::BIGINT AS n_tokens
    FROM c, (SELECT unnest(range(0, 1000)) AS i) ids
    WHERE i < n_chunks
    """


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_tokens: int,
    shard_col: str,
) -> DataFrame:
    """Concatenate-then-split sequence packing (the GPT-style batch shaper):
    within each shard, documents are laid head-to-tail in ``id_col`` order
    and cut into fixed ``seq_tokens`` training sequences; a document may
    straddle a cut (``spans_boundary``).

    Emits (shard, id, n_tokens, seq_id, offset_in_seq, spans_boundary) —
    enough for a writer to materialize packed sequences without another
    shuffle. The cumulative sum runs PER SHARD, so at 100 TB parallelism is
    the shard count (shards don't coordinate; sequence ids are per-shard) —
    never a single global window.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count_col).over(w).cast("long")
    start = cum - F.col(token_count_col)
    seq = F.floor(start / F.lit(float(seq_tokens))).cast("long")
    return df.select(
        F.col(shard_col),
        F.col(id_col),
        F.col(token_count_col).cast("long").alias(token_count_col),
        seq.alias("seq_id"),
        (start - seq * seq_tokens).cast("long").alias("offset_in_seq"),
        F.when(F.floor((cum - 1) / F.lit(float(seq_tokens))) > seq, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("spans_boundary"),
    )
