"""Binary-file source: raw media ingestion for multimodal pipelines.

Beyond the reference's CSV-only loading (``FlinkDDFManager.scala:30-59``):
``spark.read.format("binaryFile")`` reads whole files as rows of
(path, modificationTime, length, content binary) — the ingestion point for
image/audio/video corpora. This module maps that layout onto the canonical
media schema of ``functions/multimodal.py`` so decode / resize /
frame-sample plumbing composes directly.

Scale posture: binaryFile scans parallelize per file; `pathGlobFilter`
prunes at the listing stage (never opens non-matching files), and the
binary column stays out of any scan that doesn't reference it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_binary_dir"]

_KIND_BY_EXT = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
    "bin": ("binary", "application/octet-stream"),
}


def load_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a directory of media files into the canonical media layout:
    (media_id, kind, mime, width, height, duration_ms, content, path).

    ``media_id`` is a deterministic 64-bit hash of the file path (stable
    across runs and executors); kind/mime derive from the extension;
    width/height/duration require a real decode and are left NULL for the
    decode step to fill.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind = F.lit("binary")
    mime = F.lit("application/octet-stream")
    for e, (k, m) in _KIND_BY_EXT.items():
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.col("content"),
        F.col("path"),
    )
