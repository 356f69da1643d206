"""Hash-family functions for near-duplicate detection: shingling, MinHash,
SimHash. Not in the reference (its dedup is exact drop_duplicates, reference
backend/load_data.py:177); these are the scale path for the LLM-pipeline
dedup surface (BASELINE.json north_star).

MinHash is implemented entirely with native Spark expressions: shingle
arrays via ``transform``/``slice``, per-permutation min via
``array_min(transform(...))`` over the standard universal-hash family
``(a·h + b) mod p``. No Python boundary — the signature computation stays in
whole-stage codegen, which is what makes it viable over 100 TB of text.

SimHash needs per-bit vote accumulation (64 counters per doc) — that is the
one genuinely imperative kernel, implemented as an Arrow-batched pandas UDF
over blake2b-derived 64-bit token hashes (deterministic across workers,
unlike Python's builtin ``hash``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .text import tokens

_MERSENNE_P = (1 << 61) - 1


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string> (native).

    ``sequence(0, n-k)`` enumerates start offsets; ``slice`` + ``concat_ws``
    builds each shingle. Docs shorter than k words yield their full text as
    the single shingle.
    """
    toks = tokens(col)
    n = F.size(toks)
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.when(n > 0, F.array(F.lit(0))).otherwise(F.array().cast("array<int>"))
    )
    sh = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(k)))
    )
    return F.array_distinct(sh)


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct k-char shingles (native substring enumeration)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    starts = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.when(n > 0, F.array(F.lit(1))).otherwise(F.array().cast("array<int>"))
    )
    return F.array_distinct(F.transform(starts, lambda i: F.substring(c, i, k)))


def _perm_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P - 1, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE_P - 1, size=num_perm, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signature(
    shingle_col: Column, num_perm: int = 64, seed: int = 42
) -> Column:
    """array<long> MinHash signature of a shingle array — fully native.

    Base hash: Spark's murmur3 ``hash()`` lifted to non-negative long;
    permutations: ``min((a·h + b) mod p)`` per (a, b). Empty shingle sets
    yield a sentinel signature of p (never collides with real hashes).
    """
    base = F.transform(
        shingle_col, lambda s: F.pmod(F.hash(s).cast("long"), F.lit(_MERSENNE_P))
    )
    sig = []
    for a, b in _perm_params(num_perm, seed):
        permuted = F.transform(
            base,
            lambda h, a=a, b=b: F.pmod(
                F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_P)
            ),
        )
        sig.append(
            F.coalesce(F.array_min(permuted), F.lit(_MERSENNE_P).cast("long"))
        )
    return F.array(*sig)


def lsh_band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, key:long>> — one bucket key per band.

    Two docs land in the same (band, key) bucket iff their signatures agree
    on that band's rows → standard MinHash-LSH banding. ``hash`` over the
    band slice keeps the bucket key fixed-width for the shuffle.
    """
    entries = []
    for band in range(bands):
        band_slice = F.slice(sig_col, band * rows_per_band + 1, rows_per_band)
        key = F.hash(F.concat_ws(",", F.transform(band_slice, lambda x: x.cast("string")))).cast("long")
        entries.append(F.struct(F.lit(band).alias("band"), key.alias("key")))
    return F.array(*entries)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays — native set ops."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# SimHash (pandas UDF kernel)
# ---------------------------------------------------------------------------


def _token_hash64(tok: str) -> int:
    """Deterministic 64-bit token hash (blake2b digest prefix)."""
    return int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")


def simhash_str(s: str | None) -> int | None:
    """64-bit SimHash of whitespace tokens (signed long for Spark)."""
    if s is None:
        return None
    toks = s.lower().split()
    if not toks:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _token_hash64(t)
        bits = (h >> np.arange(64)) & 1
        votes += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    # two's-complement into signed 64-bit for LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_udf():
    @pandas_udf(LongType())
    def _simhash(s: pd.Series) -> pd.Series:
        return s.apply(simhash_str).astype("Int64")

    return _simhash


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64-bit SimHashes (native bit ops)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band(col: Column, band: int, bands: int = 4) -> Column:
    """Extract band-th 16-bit chunk — pigeonhole blocking key: two hashes
    within Hamming distance < bands must agree on ≥1 band."""
    width = 64 // bands
    return F.shiftrightunsigned(col, band * width).bitwiseAND(F.lit((1 << width) - 1))
