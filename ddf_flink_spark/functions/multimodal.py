"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas UDFs.

Extensions beyond the reference surface (SURVEY §7.2 step 9). The
container has no image/audio libraries, so the DECODE step is stubbed —
``decode_media`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it produces a seeded fake
feature vector from the bytes (so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested).

Design for scale:
* media bytes live in ONE binary column next to a metadata struct —
  filters/pruning run on the metadata columns and never touch the bytes
  (parquet column pruning keeps the binary out of the scan entirely when
  unreferenced);
* all byte-touching work is ``mapInPandas`` (Arrow zero-copy batches),
  with ``maxRecordsPerBatch`` the knob that bounds executor memory when
  rows are megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_media",
    "extract_features",
    "frame_sample_plan",
    "resize_media",
]

# The canonical multimodal layout: metadata columns + one opaque binary.
MEDIA_SCHEMA = (
    "media_id bigint, kind string, mime string, width int, height int, "
    "duration_ms int, content binary"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic fake media column from a text column (test
    harness for the plumbing — stands in for reading real bytes from a
    binaryFile source). JVM-side only."""
    fake_bytes = F.encode(F.repeat(F.substring(F.col(text_col), 1, 16), 4), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/fake").alias("mime"),
        (F.length(text_col) % 64 + 16).cast("int").alias("width"),
        (F.length(text_col) % 48 + 16).cast("int").alias("height"),
        F.lit(0).alias("duration_ms"),
        fake_bytes.alias("content"),
    )


def decode_media(
    df: DataFrame,
    out_dim: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract each media row → ``features array<float>``.

    Real decode is NOT IMPLEMENTED in this container (no PIL/librosa/
    ffmpeg); pass ``deterministic_fake=True`` to exercise the full
    distributed path with seeded fake features (MD5-seeded from the bytes,
    so output is reproducible everywhere).

    The batch closure is deliberately self-contained (its imports and the
    fake decode live inside it) so cloudpickle ships it by value — Python
    workers never need this package importable.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "container; pass deterministic_fake=True to run the plumbing "
            "with seeded fake features"
        )

    out_schema = (
        "media_id bigint, kind string, width int, height int, features array<float>"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def fake_decode(content: bytes) -> list[float]:
            seed = int.from_bytes(_hashlib.md5(content).digest()[:4], "big")
            rng = _np.random.default_rng(seed)
            return rng.standard_normal(out_dim).astype(_np.float32).tolist()

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "features": [fake_decode(bytes(c)) for c in pdf["content"]],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)


def extract_features(df: DataFrame, out_dim: int = 16) -> DataFrame:
    """Alias for the decode+feature path (the fake-backed test plumbing)."""
    return decode_media(df, out_dim=out_dim, deterministic_fake=True)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into (media_id,
    frame_ts_ms) rows JVM-side — the expensive per-frame decode then runs
    on the exploded rows (parallelism = frames, not videos, which is the
    scale-critical property for long videos)."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    # sequence with an explicit step — no per-element HOF lambda
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stub over the canonical media layout → same columns with
    updated (width, height) and re-encoded ``content``.

    Real pixel resampling needs PIL/ffmpeg (absent here); the stand-in
    deterministically re-encodes the bytes to a size proportional to the
    target area so batch shapes and memory behavior are realistic. The
    Spark-side contract — mapInPandas over Arrow batches, binary in/out,
    metadata updated in lockstep — is the real thing.
    """
    out_schema = MEDIA_SCHEMA

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def fake_resize(content: bytes) -> bytes:
            # deterministic byte payload scaled to the target area
            n = max(1, (target_w * target_h) // 64)
            digest = _hashlib.md5(content).digest()
            return (digest * (n // len(digest) + 1))[:n]

        for pdf in batches:
            out = pdf.copy()
            out["width"] = target_w
            out["height"] = target_h
            out["content"] = [fake_resize(bytes(c)) for c in pdf["content"]]
            yield out

    return df.mapInPandas(resize_batches, schema=out_schema)
