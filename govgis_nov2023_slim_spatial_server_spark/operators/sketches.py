"""Sketch operators: Count-Min (frequency), Bloom filter (membership).
HLL distinct counts are native (`approx_count_distinct`, tested in
tests/test_approx.py).

Sketches are the sub-linear-memory answer to "count/filter across 100 TB
without a full shuffle": every partition builds a fixed-size summary in one
Arrow-batched pass (mapInPandas), summaries merge associatively (Count-Min:
element-wise add; Bloom: bitwise OR), and the merged sketch is small enough
to broadcast. The Scala Dataset.stat sketches were never exposed to
PySpark, and their JVM handles can't cross into Python UDFs anyway — these
numpy implementations are picklable, so the merged sketch CAN be broadcast
back into a scan-side predicate (the runtime-filter pattern).

Error contracts (asserted in tests): Count-Min never undercounts and
overcounts by ≤ eps·N with probability ≥ 1-delta; Bloom has zero false
negatives and ~fpp false positives.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash64(value: str, seed: int) -> int:
    return int.from_bytes(
        hashlib.blake2b(
            value.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little")
        ).digest(),
        "big",
    )


class CountMinSketch:
    """Textbook CMS: depth×width counter table, one blake2b-derived row
    index per depth; estimate = min over rows."""

    def __init__(self, eps: float = 0.001, delta: float = 0.01):
        self.width = max(8, math.ceil(math.e / eps))
        self.depth = max(2, math.ceil(math.log(1.0 / delta)))
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def add_values(self, values) -> None:
        for v in values:
            s = str(v)
            for d in range(self.depth):
                self.table[d, _hash64(s, d) % self.width] += 1
            self.total += 1

    def estimate(self, value) -> int:
        s = str(value)
        return int(
            min(self.table[d, _hash64(s, d) % self.width] for d in range(self.depth))
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.table.shape == other.table.shape
        self.table += other.table
        self.total += other.total
        return self


class BloomFilter:
    """Textbook Bloom: m bits, k blake2b-derived positions per item."""

    def __init__(self, expected_items: int, fpp: float = 0.01):
        m = max(64, math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / max(expected_items, 1) * math.log(2)))
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    def _positions(self, value) -> list[int]:
        s = str(value)
        h1 = _hash64(s, 0)
        h2 = _hash64(s, 1) | 1
        return [((h1 + i * h2) % (1 << 64)) % self.m for i in range(self.k)]

    def add_values(self, values) -> None:
        for v in values:
            for p in self._positions(v):
                self.bits[p >> 6] |= np.uint64(1 << (p & 63))

    def might_contain(self, value) -> bool:
        return all(
            self.bits[p >> 6] & np.uint64(1 << (p & 63)) for p in self._positions(value)
        )

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def _build_distributed(df: DataFrame, col: str, make_sketch):
    """One mapInPandas pass → one serialized partial per partition →
    associative driver merge (driver sees n_partitions blobs, not rows)."""
    import pickle

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = make_sketch()
        any_rows = False
        for pdf in batches:
            vals = pdf[col].dropna()
            if len(vals):
                sk.add_values(vals.tolist())
                any_rows = True
        if any_rows:
            yield pd.DataFrame({"blob": [pickle.dumps(sk)]})

    partials = df.select(col).mapInPandas(gen, schema="blob binary").collect()
    merged = make_sketch()
    for row in partials:
        merged.merge(pickle.loads(bytes(row["blob"])))
    return merged


def count_min_sketch(
    df: DataFrame, col: str, eps: float = 0.001, delta: float = 0.01
) -> CountMinSketch:
    return _build_distributed(df, col, lambda: CountMinSketch(eps, delta))


def bloom_filter(
    df: DataFrame, col: str, expected_items: int, fpp: float = 0.01
) -> BloomFilter:
    return _build_distributed(df, col, lambda: BloomFilter(expected_items, fpp))


def bloom_prefilter_join(
    big: DataFrame, small: DataFrame, key: str, fpp: float = 0.01
) -> DataFrame:
    """Inner join with a Bloom pre-filter on the big side.

    The filter pass is a scan-side predicate over the broadcast sketch, so
    rows that can't match never enter the shuffle (runtime-filter / semi-
    join pushdown pattern). False positives are removed by the join itself
    → the result is exact.
    """
    n = small.count()
    bf = bloom_filter(small, key, expected_items=max(n, 1), fpp=fpp)
    bf_b = big.sparkSession.sparkContext.broadcast(bf)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def _might_contain(vals: pd.Series) -> pd.Series:
        sk = bf_b.value
        return vals.apply(lambda v: v is not None and sk.might_contain(v))

    return big.where(_might_contain(F.col(key))).join(small, key)
