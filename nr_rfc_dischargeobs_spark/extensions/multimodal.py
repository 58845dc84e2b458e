"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample stages (SURVEY.md §2.10).

Spark-side design (all real and tested):
- payloads travel as ``BinaryType`` columns next to relational metadata —
  parquet stores them page-compressed, column pruning skips them when a
  plan doesn't touch the bytes;
- decode/feature stages are Arrow-batched ``mapInPandas`` — one Python
  worker per partition, bytes move columnar, never row-at-a-time;
- frame sampling is pure arithmetic on metadata (no decode needed) —
  a generated ``sequence`` expression.

The actual codec calls (PIL/librosa/av) are STUBBED — the libraries are not
in this container.  ``decode_features`` ships a deterministic fake
(``mode="fake"``, hashes of the payload) so the plumbing — schema,
batching, partitioning — is exercised end-to-end; ``mode="real"`` raises
``NotImplementedError`` at the exact call site a codec belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def to_blob_table(
    docs: DataFrame, text: str = "text", doc_id: str = "doc_id"
) -> DataFrame:
    """Pose a text column as an opaque binary payload with metadata —
    the schema every real image/audio table shares:
    (id, blob BINARY, mime STRING, n_bytes BIGINT)."""
    blob = F.encode(F.col(text), "UTF-8")
    return docs.select(
        F.col(doc_id),
        blob.alias("blob"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(blob).alias("n_bytes"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec+encoder: FEATURE_DIM floats from
    the payload's sha256 (stable across runs/engines/partitionings)."""
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def decode_features(blobs: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``.

    ``mode="fake"``: deterministic hash features (plumbing test).
    ``mode="real"``: where PIL/librosa/av decode goes — not available in
    this container, so it raises at the exact integration point.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "codec decode requires image/audio libraries not present "
                    "in this environment; plug PIL/librosa/av here"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": [
                        _fake_features(bytes(b)) for b in pdf["blob"]
                    ],
                }
            )

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    n_frames_col: str = "n_frames",
    every: int = 10,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plan: which frame indices to decode for each clip —
    pure metadata arithmetic (``sequence(0, n-1, every)``), exploded to one
    row per (clip, frame).  The decode of those frames is the
    ``decode_features`` stage; planning never touches bytes."""
    return media.select(
        F.col(doc_id),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                F.lit(every),
            )
        ).alias("frame_idx"),
    )


def resize_dims(
    media: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    box: int = 256,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Resize planning: target dimensions fitting a ``box``×``box`` square,
    aspect preserved — pure integer arithmetic on metadata columns
    (``(short_side * box) div long_side``), exact in any engine.

    Like ``frame_sample_plan``, planning is split from pixel work: the
    per-image resample belongs in the ``decode_features`` mapInPandas stage
    (PIL's ``Image.resize`` at the ``mode="real"`` call site); the plan
    tier never touches bytes, so a 100 TB media table plans its resize
    pass from kilobytes of metadata."""
    w, h = F.col(width_col), F.col(height_col)
    landscape = w >= h
    new_w = F.when(landscape, F.lit(box)).otherwise(
        F.greatest(F.expr(f"({width_col} * {box}) div {height_col}"), F.lit(1))
    )
    new_h = F.when(~landscape, F.lit(box)).otherwise(
        F.greatest(F.expr(f"({height_col} * {box}) div {width_col}"), F.lit(1))
    )
    return media.select(
        F.col(doc_id),
        w.alias("width"),
        h.alias("height"),
        new_w.alias("target_width"),
        new_h.alias("target_height"),
    )
