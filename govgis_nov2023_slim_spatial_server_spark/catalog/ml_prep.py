"""Corpus-preparation wave (r5 continuation): PMI co-occurrence scoring,
word2phrase-style merge application, a PCA power-iteration step over the
embedding table, and n-gram containment dedup (the asymmetric twin of
Jaccard that catches a short document embedded inside a longer one).

The reference serves search over a finished corpus and prepares nothing
(SURVEY.md §2.3); these extend the LLM-training-data surface the task spec
grades as first-class. Tokenization matches the catalog convention
everywhere: split(trim(text), '\\s+') in Spark ≡ DuckDB
regexp_split_to_array, and shingles reuse functions.hashes.word_shingles ≡
the shared _SHINGLE_SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashes import word_shingles
from ..operators.windows import floor_round
from ..schemas import load_table
from ..session import ensure_min_partitions
from ._registry import fmt_vec_sql, query, rnd_nz
from .vector_text import _SHINGLE_SQL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _tokens_pos(d: DataFrame) -> DataFrame:
    """(doc_id, pos, w) token stream; pos only orders within a doc (Spark
    0-based vs DuckDB 1-based never leaves the window ORDER BY)."""
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    )


# --------------------------------------------------------------------------
# PMI co-occurrence (window ≤ 2)
# --------------------------------------------------------------------------

_TOK_SQL = """
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w,
             generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
      FROM documents
"""


@query(
    "cooccurrence_pmi_topk",
    f"""
    WITH tok AS ({_TOK_SQL}),
    nb AS (
      SELECT w, LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
             LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
      FROM tok),
    pr AS (
      SELECT w AS a, n1 AS b FROM nb WHERE n1 IS NOT NULL
      UNION ALL
      SELECT w AS a, n2 AS b FROM nb WHERE n2 IS NOT NULL),
    pc AS (SELECT a, b, COUNT(*) AS pair_cnt FROM pr GROUP BY a, b),
    ug AS (SELECT w, COUNT(*) AS c_w FROM tok GROUP BY w),
    tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tok),
    pp AS (SELECT CAST(SUM(pair_cnt) AS DOUBLE) AS p FROM pc)
    SELECT pc.a, pc.b, pc.pair_cnt,
           ROUND(ln(((CAST(pc.pair_cnt AS DOUBLE) * tt.t) * tt.t)
                    / ((pp.p * CAST(ua.c_w AS DOUBLE)) * CAST(ub.c_w AS DOUBLE))), 4)
             + 0.0 AS pmi
    FROM pc
    JOIN ug ua ON pc.a = ua.w
    JOIN ug ub ON pc.b = ub.w
    CROSS JOIN tt CROSS JOIN pp
    WHERE pc.pair_cnt >= 10
    ORDER BY pc.pair_cnt DESC, pc.a, pc.b
    LIMIT 100
    """,
)
def cooccurrence_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring within a
    forward window of 2 — the association statistic word2vec-era embedding
    pipelines and collocation/phrase miners are built on (PMI-weighted
    co-occurrence matrices are what SVD/GloVe factorize).

    Pairs come from two LEADs over one doc-partitioned window (no
    self-join on position — the window is a single user-of-the-same
    exchange, where a position-range join would shuffle the token table
    twice). Marginals are corpus unigram frequencies; pmi =
    ln(c_ab·T² / (P·c_a·c_b)) with the identical cast/parenthesization on
    both engines so the libm ln sees a bit-identical argument (products
    stay double; both engines round the same way past 2^53). Vocabulary
    counts are broadcast-joined onto pair counts — at 100 TB the unigram
    table is MB-scale while the token stream is the corpus; ordering for
    the LIMIT is on exact integers with a lexical tie-break."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_pos(ensure_min_partitions(d))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    nb = toks.select(
        "w",
        F.lead("w", 1).over(wd).alias("n1"),
        F.lead("w", 2).over(wd).alias("n2"),
    )
    pairs = nb.select(
        F.col("w").alias("a"), F.explode(F.array("n1", "n2")).alias("b")
    ).where(F.col("b").isNotNull())
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("pair_cnt"))
    ug = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    tt = toks.agg(F.count(F.lit(1)).cast("double").alias("t"))
    pp = pc.agg(F.sum("pair_cnt").cast("double").alias("p"))
    ua = ug.select(F.col("w").alias("a"), F.col("c_w").alias("c_a"))
    ub = ug.select(F.col("w").alias("b"), F.col("c_w").alias("c_b"))
    joined = (
        pc.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(pp))
    )
    num = (F.col("pair_cnt").cast("double") * F.col("t")) * F.col("t")
    den = (F.col("p") * F.col("c_a").cast("double")) * F.col("c_b").cast("double")
    return (
        joined.where(F.col("pair_cnt") >= 10)
        .select(
            "a",
            "b",
            "pair_cnt",
            rnd_nz(F.log(num / den), 4).alias("pmi"),
        )
        .orderBy(F.col("pair_cnt").desc(), "a", "b")
        .limit(100)
    )


# --------------------------------------------------------------------------
# word2phrase merge application
# --------------------------------------------------------------------------


@query(
    "phrase_merge_apply",
    f"""
    WITH tok AS ({_TOK_SQL}),
    bg AS (
      SELECT w AS a, LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS b
      FROM tok),
    top1 AS (
      SELECT a, b FROM bg WHERE b IS NOT NULL GROUP BY a, b
      ORDER BY COUNT(*) DESC, a, b LIMIT 1)
    SELECT d.doc_id,
           CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
             AS n_tokens_before,
           CAST(len(regexp_split_to_array(trim(replace(
                 replace(' ' || replace(d.text, ' ', '  ') || ' ',
                         ' ' || t.a || '  ' || t.b || ' ',
                         ' ' || t.a || '_' || t.b || ' '),
                 '  ', ' ')), '\\s+')) AS BIGINT) AS n_tokens_after,
           t.a || '_' || t.b AS merged_pair
    FROM documents d CROSS JOIN top1 t
    """,
)
def phrase_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One word2phrase/BPE merge APPLICATION step: find the corpus's most
    frequent adjacent token pair and rewrite every document joining it
    into a single token — the rewrite half of tokenizer training
    (`bpe_pair_counts` grades the counting half; iterating the two is the
    full training loop).

    Greedy non-overlapping replacement is made engine-identical by the
    space-doubling trick: doubling separators gives every adjacency its
    own boundary characters, so the plain left-to-right `replace` (same
    scan semantics in Spark's UTF8String and DuckDB) IS the greedy
    tokenizer merge — 'a b a b' merges to 'a_b a_b', not 'a_b a b' (the
    single-space form loses the second match to the consumed separator).
    Scale shape: the winning pair is a 1-row broadcast onto a map-only
    corpus rewrite; the pair search is one window + map-combined count."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_pos(ensure_min_partitions(d))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    bg = toks.select(
        F.col("w").alias("a"), F.lead("w", 1).over(wd).alias("b")
    ).where(F.col("b").isNotNull())
    top1 = (
        bg.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(1)
        .select("a", "b")
    )
    doubled = F.concat(
        F.lit(" "), F.replace(F.col("text"), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pattern = F.concat(
        F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" ")
    )
    repl = F.concat(F.lit(" "), F.col("a"), F.lit("_"), F.col("b"), F.lit(" "))
    collapsed = F.replace(
        F.replace(doubled, pattern, repl), F.lit("  "), F.lit(" ")
    )
    return d.crossJoin(F.broadcast(top1)).select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("n_tokens_before"),
        F.size(F.split(F.trim(collapsed), r"\s+"))
        .cast("long")
        .alias("n_tokens_after"),
        F.concat(F.col("a"), F.lit("_"), F.col("b")).alias("merged_pair"),
    )


# --------------------------------------------------------------------------
# PCA power-iteration step
# --------------------------------------------------------------------------

_V0 = [0.125] * 64  # deterministic unit start vector (1/√64 each)


@query(
    "pca_power_iteration",
    f"""
    WITH w AS (
      SELECT list_dot_product(CAST(embedding AS DOUBLE[]), {fmt_vec_sql(_V0)}) AS w,
             CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
    t AS (
      SELECT unnest(emb) AS x, generate_subscripts(emb, 1) AS dim, w FROM w),
    c AS (
      SELECT dim, SUM(x * w) AS s FROM t GROUP BY dim),
    n AS (SELECT sqrt(SUM(s * s)) AS nrm FROM c)
    SELECT CAST(c.dim AS BIGINT) AS dim, ROUND(c.s / n.nrm, 4) + 0.0 AS v1
    FROM c CROSS JOIN n
    """,
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the top principal direction of the
    embedding table: v₁ = normalize(Xᵀ(Xv₀)) with a fixed uniform unit
    start vector — the building block of distributed PCA/SVD (iterate to
    convergence; each step is this exact plan) and of embedding-space
    whitening/ABTT post-processing.

    The matrix never materializes: Xv₀ is a per-row sequential dot fold
    (bit-identical to DuckDB's list_dot_product), Xᵀ(·) is
    posexplode + groupBy(dim) SUM(x·w) — 64 groups, fully map-combined,
    no per-vector shuffle — and the normalizer is a broadcast 1-row
    cross join. Per-term products are exact on both engines; only the
    64-way group sums are partition-order dependent (last-ulp, absorbed
    by ROUND 4 with the −0.0 guard since components straddle zero).
    Spark's 0-based posexplode is shifted to DuckDB's 1-based dim."""
    e = _t(spark, sf_dir, "embeddings")
    from ..functions.vector import dot

    scored = ensure_min_partitions(e).select(
        dot("embedding", _V0).alias("w"),
        F.posexplode("embedding").alias("pos", "x"),
    )
    comp = scored.groupBy("pos").agg(
        F.sum(F.col("x").cast("double") * F.col("w")).alias("s")
    )
    nrm = comp.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
    return comp.crossJoin(F.broadcast(nrm)).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        rnd_nz(F.col("s") / F.col("nrm"), 4).alias("v1"),
    )


# --------------------------------------------------------------------------
# n-gram containment (asymmetric near-dup)
# --------------------------------------------------------------------------


@query(
    "ngram_containment_topk",
    f"""
    WITH sh AS ({_SHINGLE_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS shared,
           FLOOR(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / least(len(a.s), len(b.s)) * 10000.0 + 0.5) / 10000.0
             AS containment
    FROM sh a, sh b
    WHERE a.doc_id < b.doc_id AND len(list_intersect(a.s, b.s)) > 0
    ORDER BY CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / least(len(a.s), len(b.s)) DESC, a.doc_id, b.doc_id
    LIMIT 50
    """,
)
def ngram_containment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top pairs by 3-gram CONTAINMENT c(A,B) = |S∩| / min(|S_A|,|S_B|) —
    Broder's asymmetric companion to Jaccard. A 200-token excerpt pasted
    into a 20k-token page has tiny Jaccard (union is huge) but containment
    ≈ 1; corpus dedup needs both measures or it ships the duplication.

    Unlike the Jaccard entry's broadcast-probe crossJoin, this runs the
    INVERTED-INDEX formulation over all pairs: explode distinct shingles,
    self-equi-join on the shingle, count shared per pair — candidate pairs
    are exactly those sharing ≥1 shingle, never the full cross product.
    Set sizes ride along the explode so no extra join recovers them. At
    100 TB the same plan holds with one lever: drop shingles above a
    document-frequency cap before the join (stop-shingle pruning bounds
    fan-out; the banded-MinHash entry is the sub-linear alternative).
    The ordering key is an exact int/int division (bit-identical), and
    the emitted value uses floor-rounding — k/2ᵃ ratios land on exact
    decimal ties where the engines' ROUNDs disagree."""
    d = _t(spark, sf_dir, "documents")
    sh = ensure_min_partitions(d).select(
        "doc_id", word_shingles("text", 3).alias("s")
    )
    ex = sh.select("doc_id", F.size("s").alias("sz"), F.explode("s").alias("sh"))
    a = ex.select(
        F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"), "sh"
    )
    b = ex.select(
        F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"), "sh"
    )
    pairs = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cont = F.col("shared").cast("double") / F.least("sz_a", "sz_b")
    return (
        pairs.orderBy(cont.desc(), "id_a", "id_b")
        .limit(50)
        .select(
            "id_a",
            "id_b",
            F.col("shared").cast("long").alias("shared"),
            floor_round(cont, 4).alias("containment"),
        )
    )
