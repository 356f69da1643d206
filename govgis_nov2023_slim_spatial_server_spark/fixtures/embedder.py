"""Deterministic fake embedder (FIXTURES.md §B).

The reference embeds with BGE-large-en-v1.5 on CPU, L2-normalized
(reference backend/app.py:28-33) — a 1.3 GB torch dependency that must
never enter engine core (SURVEY.md §7 hard part (c)). Tests and fixtures
use this seeded hash-based embedder instead: same contract (text →
fixed-dim unit vector, deterministic), zero dependencies.

The `Embedder` protocol is the pluggable seam: serving wires a real model
behind the same one-method interface.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import numpy as np


class Embedder(Protocol):
    dim: int

    def embed_query(self, text: str) -> list[float]: ...


class FakeEmbedder:
    """blake2b(text, seed) expanded to `dim` floats in [-1,1], normalized."""

    def __init__(self, dim: int = 64, seed: int = 42):
        self.dim = dim
        self.seed = seed

    def embed_query(self, text: str) -> list[float]:
        # need dim u64s = dim*8 bytes; each blake2b digest yields 64 bytes
        n_digests = (self.dim * 8 + 63) // 64
        raw = b"".join(
            hashlib.blake2b(
                text.encode("utf-8"),
                digest_size=64,
                salt=self.seed.to_bytes(8, "little") + i.to_bytes(8, "little"),
            ).digest()
            for i in range(n_digests)
        )
        ints = np.frombuffer(raw[: self.dim * 8], dtype="<u8").astype(np.float64)
        out = ints / float(1 << 64) * 2.0 - 1.0
        norm = float(np.linalg.norm(out))
        if norm == 0.0:
            out = np.zeros(self.dim)
            out[0] = 1.0
            return out.tolist()
        return (out / norm).tolist()

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        return [self.embed_query(t) for t in texts]
