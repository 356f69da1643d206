"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Not in the reference (text-only); part of the LLM-pipeline surface
(BASELINE.json north_star). The design for 100 TB: media lives as
``binary`` columns (or object-store URIs) with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` so each Python worker streams record batches instead of
materializing partitions.

The actual image/audio decoders are NOT available in this environment, so
``decode_image`` is an explicitly stubbed seam (NotImplementedError) while
the Spark-side plumbing — schema, batch iteration, binary handling — is
real and tested via ``extract_byte_stats`` (deterministic byte-level
"features" with an arithmetic SQL oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BYTE_STATS_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte bigint, width bigint, height bigint"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model any column as an opaque binary payload (here: utf-8 text bytes
    stand in for image/audio blobs the container can't decode)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_byte_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    width/height are a deterministic fake "decode" (arithmetic on payload
    size) standing in for real image dimensions — the plumbing (Arrow batch
    iteration, binary access, fixed output schema) is exactly what a real
    decoder UDF uses.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.apply(lambda b: len(b) if b is not None else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "first_byte": payloads.apply(
                        lambda b: int(b[0]) if b else None
                    ),
                    "width": n_bytes % 640,
                    "height": (n_bytes * 7) % 480,
                }
            )

    return df.mapInPandas(gen, schema=BYTE_STATS_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — requires an imaging library absent from this
    environment. The seam exists so production swaps in a decoder without
    touching the pipeline shape (same mapInPandas contract as
    extract_byte_stats)."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow) not "
        "installed in this environment; use extract_byte_stats for the "
        "plumbing-verified path"
    )
