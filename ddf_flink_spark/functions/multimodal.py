"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas UDFs.

Extensions beyond the reference surface (SURVEY §7.2 step 9). Decode is
REAL wherever stdlib+numpy suffice: WAV (``wave``), P6 PPM, 24-bit BMP,
8-bit RGB PNG (zlib inflate + all five scanline unfilters, CRC-verified
chunks), and baseline sequential JPEG (Annex-K Huffman entropy decode,
dequantize, IDCT, YCbCr→RGB — see the JPEG section below).
``resize_media`` does real nearest-neighbor resampling over the raster
formats. MP4 gets a REAL pure-stdlib ISO BMFF container layer
(``mp4_encode_container``/``mp4_parse_container``/``decode_mp4`` — box
framing, mvhd timing, tkhd geometry, hdlr track census); only FRAME
decode (H.264/AAC) genuinely needs external codec libraries and stays
honestly out of scope. ``decode_media``'s ``deterministic_fake=True``
path produces a seeded fake feature vector from the bytes (so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested even for formats with no extractor).

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
    "attach_bmp_media",
    "attach_fake_media",
    "attach_jpeg_media",
    "attach_mp4_media",
    "attach_png_media",
    "attach_ppm_media",
    "attach_wav_media",
    "decode_bmp",
    "decode_jpeg",
    "decode_media",
    "decode_mp4",
    "decode_png",
    "decode_ppm",
    "decode_wav",
    "extract_features",
    "frame_sample_plan",
    "jpeg_decode_baseline",
    "jpeg_encode_baseline",
    "mp4_encode_container",
    "mp4_parse_container",
    "mp4_walk_boxes",
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


def attach_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL 8-bit mono PCM WAV files (stdlib ``wave`` writer —
    correct RIFF/fmt/data chunks) deterministically from an id column:
    sample[i] = (id % 251 + 37·i) mod 256, n = 64 + id % 64, 8 kHz.
    The generating arithmetic is pure integer math on the id, so a SQL
    oracle can replay the decoded stats exactly (q43's md5-discipline:
    the bytes are real, the ground truth is closed-form)."""
    out_schema = MEDIA_SCHEMA

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import pandas as _pd

        def make_wav(doc_id: int) -> bytes:
            a, n = doc_id % 251, 64 + doc_id % 64
            samples = bytes((a + 37 * i) % 256 for i in range(n))
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(1)
                w.setframerate(8000)
                w.writeframes(samples)
            return buf.getvalue()

        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "mime": "audio/wav",
                    "width": 0,
                    "height": 0,
                    "duration_ms": ((64 + ids % 64) * 1000 // 8000).astype("int32"),
                    "content": [make_wav(int(i)) for i in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        encode_batches, schema=out_schema
    )


def decode_wav(df: DataFrame) -> DataFrame:
    """REAL audio decode: parse each ``content`` blob with the stdlib
    ``wave`` reader (RIFF chunk walk — not a fake) and emit per-file
    sample statistics. Arrow-batched ``mapInPandas``; the shuffle-free
    map shape is identical at 100 TB (decode parallelism = files)."""
    out_schema = (
        "media_id bigint, sample_rate int, n_samples int, "
        "mean_sample double, rms double"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import math as _math
        import wave as _wave

        import pandas as _pd

        def parse(blob: bytes) -> tuple[int, int, float, float]:
            with _wave.open(_io.BytesIO(bytes(blob)), "rb") as w:
                sr, n = w.getframerate(), w.getnframes()
                vals = w.readframes(n)  # 8-bit PCM: unsigned bytes
            mean = sum(vals) / n
            rms = _math.sqrt(sum(v * v for v in vals) / n)
            return sr, n, mean, rms

        for pdf in batches:
            parsed = [parse(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [p[0] for p in parsed],
                    "n_samples": [p[1] for p in parsed],
                    "mean_sample": [p[2] for p in parsed],
                    "rms": [p[3] for p in parsed],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)


def attach_ppm_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL binary PPM (P6) images deterministically from an
    id: w = 4 + id % 13, h = 3 + id % 11, raw RGB byte j =
    (id + 17·j) mod 256. Proper ``P6\\n{w} {h}\\n255\\n`` header + packed
    pixel payload — any image tool reads these files."""
    out_schema = MEDIA_SCHEMA

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def make_ppm(doc_id: int) -> bytes:
            w, h = 4 + doc_id % 13, 3 + doc_id % 11
            header = f"P6\n{w} {h}\n255\n".encode()
            pixels = bytes((doc_id + 17 * j) % 256 for j in range(3 * w * h))
            return header + pixels

        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/x-portable-pixmap",
                    "width": (4 + ids % 13).astype("int32"),
                    "height": (3 + ids % 11).astype("int32"),
                    "duration_ms": 0,
                    "content": [make_ppm(int(i)) for i in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        encode_batches, schema=out_schema
    )


def decode_ppm(df: DataFrame) -> DataFrame:
    """REAL image decode: parse the P6 header from the bytes (regex over
    the binary — width/height come from the FILE, not the metadata
    columns), reshape the raw payload to (h, w, 3) with numpy, and emit
    per-channel means — the decode → per-image-stats pass of an image
    dedup/quality pipeline."""
    out_schema = (
        "media_id bigint, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re

        import numpy as _np
        import pandas as _pd

        hdr = _re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")

        def parse(blob: bytes) -> tuple[int, int, float, float, float]:
            b = bytes(blob)
            m = hdr.match(b)
            if m is None:
                raise ValueError("not a P6 PPM")
            w, h = int(m.group(1)), int(m.group(2))
            arr = _np.frombuffer(b[m.end():], dtype=_np.uint8)
            px = arr[: 3 * w * h].reshape(h, w, 3).astype(_np.float64)
            return w, h, px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean()

        for pdf in batches:
            parsed = [parse(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "mean_r": [p[2] for p in parsed],
                    "mean_g": [p[3] for p in parsed],
                    "mean_b": [p[4] for p in parsed],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)


def decode_media(
    df: DataFrame,
    out_dim: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract each media row → ``features array<float>``.

    Real paths: ``video/mp4`` rows get CONTAINER-level features via the
    pure-stdlib ISO BMFF parser (duration, track census, geometry —
    frame/pixel features genuinely need external codecs absent here and
    are honestly out of scope); the raster/audio mimes have full typed
    decoders (``decode_wav``/``decode_ppm``/``decode_bmp``/
    ``decode_png``/``decode_jpeg``) which a caller should prefer since
    they return typed stats, not a flat vector. Unrecognized mimes
    raise ValueError per row. Pass ``deterministic_fake=True`` to
    exercise the full distributed path with seeded fake features
    (MD5-seeded from the bytes, so output is reproducible everywhere).

    The fake-path closure is self-contained; the real path references
    the module-level parser, shipped to workers by
    ``registry.ensure_shipped`` (the decode_jpeg pattern).
    """
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

        def real_decode(mime: str, content: bytes) -> list[float]:
            if mime == "video/mp4":
                m = mp4_parse_container(content)
                vec = [
                    float(m["duration_ms"]),
                    float(m["n_tracks"]),
                    float(m["n_video_tracks"]),
                    float(m["n_audio_tracks"]),
                    float(m["width"]),
                    float(m["height"]),
                ]
                return (vec + [0.0] * out_dim)[:out_dim]
            raise ValueError(
                f"no generic feature extractor for mime {mime!r}: use the "
                "typed decoders (decode_wav/decode_ppm/decode_bmp/"
                "decode_png/decode_jpeg/decode_mp4) or "
                "deterministic_fake=True"
            )

        for pdf in batches:
            if deterministic_fake:
                feats = [fake_decode(bytes(c)) for c in pdf["content"]]
            else:
                feats = [
                    real_decode(m, bytes(c))
                    for m, c in zip(pdf["mime"], pdf["content"])
                ]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "features": feats,
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


def _decode_pixels(b: bytes):
    """Bytes → (h, w, 3) uint8 numpy array for the three stdlib-decodable
    raster formats (P6 PPM, uncompressed 24-bit BMP, 8-bit RGB PNG) —
    the shared decode core behind ``resize_media``. Raises ValueError on
    anything else (JPEG/animated/etc. need libraries this container
    lacks)."""
    import re as _re
    import struct as _struct
    import zlib as _zlib

    import numpy as _np

    if b[:2] == b"P6":
        m = _re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
        if m is None:
            raise ValueError("corrupt P6 header")
        w, h = int(m.group(1)), int(m.group(2))
        return _np.frombuffer(b[m.end():], _np.uint8, 3 * w * h).reshape(h, w, 3)
    if b[:2] == b"BM":
        (_m, _fs, _r1, _r2, offset) = _struct.unpack_from("<2sIHHI", b, 0)
        (_sz, w, h, _pl, bits, comp) = _struct.unpack_from("<IiiHHI", b, 14)
        if bits != 24 or comp != 0:
            raise ValueError("only uncompressed 24-bit BMP supported")
        top_down = h < 0
        h = -h if top_down else h
        stride = (3 * w + 3) // 4 * 4
        if w <= 0 or h <= 0 or offset + stride * h > len(b):
            raise ValueError("corrupt BMP dimensions")
        rows = _np.frombuffer(b, _np.uint8, stride * h, offset).reshape(h, stride)
        px = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
        return px if top_down else px[::-1]
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, raw = _png_inflate(b)
        return _png_unfilter(raw, w, h)
    raise ValueError("undecodable media bytes (supported: P6 PPM, 24-bit BMP, RGB PNG)")


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL nearest-neighbor resize over the canonical media layout →
    same columns with updated (width, height) and the resampled image
    re-encoded as P6 PPM (the library's interchange raster form).

    The decode core handles the three stdlib-decodable formats (PPM,
    24-bit BMP, RGB PNG — see :func:`_decode_pixels`); resampling is
    numpy fancy-indexing on the standard center-of-pixel grid
    (src = floor((dst + 0.5) · src_dim / dst_dim)), so identical bytes
    in produce identical bytes out on any worker. Undecodable bytes
    raise — there is no fake path anymore."""
    out_schema = MEDIA_SCHEMA

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        def real_resize(content: bytes) -> bytes:
            px = _decode_pixels(bytes(content))
            h, w = px.shape[0], px.shape[1]
            ys = _np.minimum(
                ((_np.arange(target_h) + 0.5) * h / target_h).astype(_np.int64), h - 1
            )
            xs = _np.minimum(
                ((_np.arange(target_w) + 0.5) * w / target_w).astype(_np.int64), w - 1
            )
            out = px[ys][:, xs]
            header = f"P6\n{target_w} {target_h}\n255\n".encode()
            return header + out.tobytes()

        for pdf in batches:
            out = pdf.copy()
            out["width"] = target_w
            out["height"] = target_h
            out["mime"] = "image/x-portable-pixmap"
            out["content"] = [real_resize(c) for c in pdf["content"]]
            yield out

    return df.mapInPandas(resize_batches, schema=out_schema)


# ------------------------------------------------------------------- PNG
# A real compressed-format decode with zero dependencies beyond the
# stdlib: zlib inflate + the five PNG scanline filters. The container
# has no PIL/ffmpeg, so this is the honest replacement for the former
# compressed-media stub (JPEG decodes fully below; MP4's container
# layer parses below too — only its FRAME codecs need external libs).


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_inflate(b: bytes):
    """Walk the chunk stream (verifying each CRC), check the IHDR
    constraints (8-bit, color type 2 = RGB, non-interlaced), and inflate
    the concatenated IDAT payload. Returns (w, h, raw_filtered_bytes)."""
    import struct as _struct
    import zlib as _zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, dims = 8, b"", None
    while pos + 12 <= len(b):
        (length,) = _struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = _struct.unpack_from(">I", b, pos + 8 + length)
        if _zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = _struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB PNG supported")
            dims = (w, h)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if dims is None:
        raise ValueError("PNG missing IHDR")
    return dims[0], dims[1], _zlib.decompress(idat)


def _png_unfilter(raw: bytes, w: int, h: int):
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth) →
    (h, w, 3) uint8 pixels. Up/None are vectorized; the left-dependent
    filters run a per-byte loop — fine for the verification corpus's
    small tiles, and still linear in the pixel count."""
    import numpy as _np

    bpp, stride = 3, 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    px = _np.empty((h, stride), _np.uint8)
    prev = _np.zeros(stride, _np.int64)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        pos += 1
        line = _np.frombuffer(raw, _np.uint8, stride, pos).astype(_np.int64)
        pos += stride
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + prev[i]) // 2
                else:
                    ul = prev[i - bpp] if i >= bpp else 0
                    pred = _png_paeth(int(left), int(prev[i]), int(ul))
                cur[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        px[r] = cur.astype(_np.uint8)
        prev = cur
    return px.reshape(h, w, 3)


def attach_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL compressed PNG files deterministically from an id:
    w = 4 + id % 13, h = 3 + id % 11, RGB byte j = (id + 23·j) mod 256.
    Scanline r uses filter type (id + r) mod 5, so the corpus exercises
    ALL FIVE PNG filters (the encoder applies the real filter transform;
    the decoder must invert it to recover the planted bytes — which the
    q200 oracle then verifies via channel means). Output is a
    spec-conformant PNG (signature, CRC'd IHDR/IDAT/IEND, zlib stream)
    any image tool opens."""
    out_schema = MEDIA_SCHEMA

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def make_png(doc_id: int) -> bytes:
            w, h = 4 + doc_id % 13, 3 + doc_id % 11
            bpp, stride = 3, 3 * w
            raw = bytes((doc_id + 23 * j) % 256 for j in range(stride * h))
            out = bytearray()
            prev = bytes(stride)
            for r in range(h):
                line = raw[r * stride : (r + 1) * stride]
                ft = (doc_id + r) % 5
                out.append(ft)
                for i, x in enumerate(line):
                    left = line[i - bpp] if i >= bpp else 0
                    if ft == 0:
                        pred = 0
                    elif ft == 1:
                        pred = left
                    elif ft == 2:
                        pred = prev[i]
                    elif ft == 3:
                        pred = (left + prev[i]) // 2
                    else:
                        ul = prev[i - bpp] if i >= bpp else 0
                        pred = _png_paeth(left, prev[i], ul)
                    out.append((x - pred) % 256)
                prev = line

            def chunk(typ: bytes, data: bytes) -> bytes:
                return (
                    _struct.pack(">I", len(data))
                    + typ
                    + data
                    + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
                )

            ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zlib.compress(bytes(out)))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/png",
                    "width": (4 + ids % 13).astype("int32"),
                    "height": (3 + ids % 11).astype("int32"),
                    "duration_ms": 0,
                    "content": [make_png(int(i)) for i in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        encode_batches, schema=out_schema
    )


def decode_png(df: DataFrame) -> DataFrame:
    """REAL compressed-image decode, stdlib-only: signature + chunk walk
    with CRC verification, zlib inflate of the IDAT stream, scanline
    unfilter (all five PNG filter types), then per-channel means — the
    decode → per-image-stats pass of an image dedup/quality pipeline,
    now through a genuinely compressed container format (q200 is the
    oracle-checked registry entry; q159/q43 cover the uncompressed
    raster/audio paths)."""
    out_schema = (
        "media_id bigint, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def parse(blob: bytes):
            b = bytes(blob)
            w, h, raw = _png_inflate(b)
            px = _png_unfilter(raw, w, h).astype(_np.float64)
            return w, h, px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean()

        for pdf in batches:
            parsed = [parse(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "mean_r": [p[2] for p in parsed],
                    "mean_g": [p[3] for p in parsed],
                    "mean_b": [p[4] for p in parsed],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)


def attach_bmp_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL 24-bit uncompressed BMP files deterministically
    from an id: w = 3 + id % 9, h = 2 + id % 7, logical (top-down, RGB)
    pixel value at (row r, col c, channel ch) = (id + 5r + 7c + 11ch)
    mod 256 — then serialized the way BMP actually stores it: 14-byte
    file header + 40-byte BITMAPINFOHEADER, rows BOTTOM-UP, channels
    BGR, each row padded to a 4-byte boundary. Any image viewer opens
    these. The third real container after PPM (q159) and WAV (q43) —
    and the one whose decode must actually undo layout quirks (flip,
    swizzle, strip padding) rather than just split a header."""
    import struct

    out_schema = MEDIA_SCHEMA

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def make_bmp(doc_id: int) -> bytes:
            w, h = 3 + doc_id % 9, 2 + doc_id % 7
            row_stride = (3 * w + 3) // 4 * 4
            img_size = row_stride * h
            file_size = 54 + img_size
            header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
            )
            rows = []
            for r in range(h - 1, -1, -1):  # bottom-up
                row = bytearray()
                for c in range(w):
                    # BGR on disk
                    for ch in (2, 1, 0):
                        row.append((doc_id + 5 * r + 7 * c + 11 * ch) % 256)
                row += b"\x00" * (row_stride - 3 * w)
                rows.append(bytes(row))
            return header + info + b"".join(rows)

        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/bmp",
                    "width": (3 + ids % 9).astype("int32"),
                    "height": (2 + ids % 7).astype("int32"),
                    "duration_ms": 0,
                    "content": [make_bmp(int(i)) for i in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        encode_batches, schema=out_schema
    )


def decode_bmp(df: DataFrame) -> DataFrame:
    """REAL BMP decode: parse both headers with struct (width/height/
    bit-depth/offset come from the FILE), strip per-row padding, flip
    the bottom-up rows, swizzle BGR→RGB with numpy, and emit per-channel
    means — the layout-undoing decode a real image pipeline performs.
    Rejects anything that isn't an uncompressed 24-bit BMP."""
    out_schema = (
        "media_id bigint, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def parse(blob: bytes) -> tuple[int, int, float, float, float]:
            b = bytes(blob)
            magic, _fs, _r1, _r2, offset = _struct.unpack_from("<2sIHHI", b, 0)
            if magic != b"BM":
                raise ValueError("not a BMP")
            (_sz, w, h, _planes, bits, comp) = _struct.unpack_from("<IiiHHI", b, 14)
            if bits != 24 or comp != 0:
                raise ValueError("only uncompressed 24-bit BMP supported")
            # negative height is a legal top-down BMP (rows already
            # top-first → skip the flip); after that, dimensions must be
            # positive and the pixel array must fit the blob, else
            # frombuffer dies with an opaque numpy error executor-side
            top_down = h < 0
            h = -h if top_down else h
            row_stride = (3 * w + 3) // 4 * 4
            if w <= 0 or h <= 0 or offset + row_stride * h > len(b):
                raise ValueError(
                    f"corrupt BMP dimensions: {w}x{h}, "
                    f"need {offset + row_stride * h} bytes, have {len(b)}"
                )
            raw = _np.frombuffer(b, dtype=_np.uint8, count=row_stride * h, offset=offset)
            rows = raw.reshape(h, row_stride)[:, : 3 * w]
            px = rows.reshape(h, w, 3)[:, :, ::-1].astype(_np.float64)  # BGR->RGB
            if not top_down:
                px = px[::-1]  # bottom-up rows -> logical top-first
            return w, h, px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean()

        for pdf in batches:
            parsed = [parse(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "mean_r": [p[2] for p in parsed],
                    "mean_g": [p[3] for p in parsed],
                    "mean_b": [p[4] for p in parsed],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)


# --------------------------------------------------------------- JPEG
# Baseline sequential JPEG (ITU-T T.81), stdlib+numpy only — the last
# feasible pure-stdlib PIXEL codec (MP4 frame decode genuinely needs
# external libraries; its container layer parses at the bottom of this
# module). The reference has no
# media surface at all; this is extension parity with the PNG/BMP/PPM/WAV
# family above. Spec constants (zigzag order, Annex K Huffman tables) are
# pinned by independent literals in tests/test_llm_ops.py so a matching
# encoder/decoder bug pair cannot self-certify.

# Zigzag scan order: ZIGZAG[k] = raster index of the k-th zigzag coefficient.
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K "typical" Huffman tables: (BITS counts for code lengths 1..16,
# HUFFVAL symbol list). DC tables code magnitude categories 0..11; AC
# tables code (run << 4 | size) symbols.
JPEG_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
JPEG_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
JPEG_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
JPEG_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Quantization tables: DC step 1 keeps constant tiles bit-exact (their
# only nonzero coefficient is the DC, and 8·(v−128) is an integer), while
# AC steps > 1 make dequantization a REAL multiply the round-trip tests
# exercise (a decoder that skipped dequant would fail them).
JPEG_QT_LUMA = [1] + [2] * 63
JPEG_QT_CHROMA = [1] + [3] * 63


def _jpeg_canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment
    (T.81 C.2): codes count upward within a length, shift left on
    length increase, in HUFFVAL order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_dct_matrix():
    import numpy as _np

    m = _np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / _np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * _np.cos((2 * x + 1) * u * _np.pi / 16.0)
    return m


def jpeg_encode_baseline(y, cb, cr) -> bytes:
    """Encode three same-sized uint8 planes (YCbCr 4:4:4, dimensions
    multiples of 8) as a baseline sequential JFIF/JPEG: level shift →
    8×8 DCT → quantize (tables above) → zigzag → DC-differential +
    Annex-K Huffman entropy coding with 0xFF byte stuffing."""
    import struct as _struct

    import numpy as _np

    h, w = y.shape
    assert w % 8 == 0 and h % 8 == 0, "baseline codec handles full blocks only"
    m = _jpeg_dct_matrix()

    def seg(marker: int, payload: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT stores tables in ZIGZAG order: entry k is the step for zigzag
    # position k (JPEG_QT_* are declared in that order: DC first)
    for tq, qt in ((0, JPEG_QT_LUMA), (1, JPEG_QT_CHROMA)):
        out += seg(0xFFDB, bytes([tq]) + bytes(qt))
    # SOF0: 8-bit, 3 components, all 1x1 sampling (4:4:4)
    sof = _struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xFFC0, sof)
    for tc_th, (bits, huffval) in (
        (0x00, JPEG_DC_LUMA), (0x01, JPEG_DC_CHROMA),
        (0x10, JPEG_AC_LUMA), (0x11, JPEG_AC_CHROMA),
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(huffval))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)

    dc_codes = [_jpeg_canonical_codes(*JPEG_DC_LUMA), _jpeg_canonical_codes(*JPEG_DC_CHROMA)]
    ac_codes = [_jpeg_canonical_codes(*JPEG_AC_LUMA), _jpeg_canonical_codes(*JPEG_AC_CHROMA)]
    qts = [_np.array(JPEG_QT_LUMA, dtype=_np.float64).reshape(1, 64),
           _np.array(JPEG_QT_CHROMA, dtype=_np.float64).reshape(1, 64)]

    bitbuf: list[int] = []  # (value, nbits) pairs flattened lazily

    def put(code: int, nbits: int) -> None:
        if nbits:
            bitbuf.append((code, nbits))

    def magnitude(v: int) -> tuple[int, int]:
        # category (bit size) and the EXTEND-coded bits for v
        s = int(v).bit_length() if v > 0 else int(-v).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    planes = [(y, 0), (cb, 1), (cr, 1)]
    pred = [0, 0, 0]
    zig = _np.array(JPEG_ZIGZAG)
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci, (plane, band) in enumerate(planes):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(_np.float64) - 128.0
                coef = m @ blk @ m.T
                # zigzag FIRST, then quantize by the zigzag-ordered table
                # (same ordering the DQT segment declares)
                zz = _np.round(
                    coef.reshape(64)[zig] / qts[band].reshape(64)
                ).astype(_np.int64)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, bits_v = magnitude(diff) if diff else (0, 0)
                code, ln = dc_codes[band][s]
                put(code, ln)
                put(bits_v, s)
                run = 0
                last_nz = 0
                nz = _np.nonzero(zz[1:])[0]
                last_nz = (nz[-1] + 1) if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_codes[band][0xF0]  # ZRL
                        put(code, ln)
                        run -= 16
                    s, bits_v = magnitude(v)
                    code, ln = ac_codes[band][(run << 4) | s]
                    put(code, ln)
                    put(bits_v, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[band][0x00]  # EOB
                    put(code, ln)

    # flush bits → bytes with 0xFF stuffing, pad final byte with 1s
    data = bytearray()
    acc, nacc = 0, 0
    for code, nbits in bitbuf:
        acc = (acc << nbits) | (code & ((1 << nbits) - 1))
        nacc += nbits
        while nacc >= 8:
            nacc -= 8
            byte = (acc >> nacc) & 0xFF
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)
    if nacc:
        byte = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode_baseline(blob: bytes):
    """Decode a baseline sequential JFIF/JPEG (8-bit, 3 components,
    1x1 sampling, dimensions multiples of 8): marker walk → DQT/SOF0/DHT/
    SOS parse → Huffman entropy decode (byte unstuffing, DC prediction,
    ZRL/EOB) → dequantize → de-zigzag → IDCT → level shift →
    YCbCr→RGB (JFIF, floor(x+.5) rounding). Returns (w, h, rgb ndarray)."""
    import numpy as _np

    b = bytes(blob)
    assert b[:2] == b"\xff\xd8", "not a JPEG (missing SOI)"
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    comps: list[tuple[int, int, int]] = []  # (cid, qt_id, (dc_tbl, ac_tbl) later)
    scan_comps: list[tuple[int, int, int]] = []
    data_start = None
    while pos < len(b):
        assert b[pos] == 0xFF, f"expected marker at {pos}"
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(b[pos : pos + 2], "big")
        payload = b[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                assert pq == 0, "only 8-bit quant tables supported"
                qt[tq] = list(payload[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec = payload[0]
            assert prec == 8, "baseline is 8-bit"
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            nf = payload[5]
            assert nf == 3, "expect 3 components"
            for c in range(nf):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                assert samp == 0x11, "only 4:4:4 (1x1 sampling) supported"
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise AssertionError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(payload[i + 17 : i + 17 + n])
                codes = _jpeg_canonical_codes(bits, huffval)
                # decode map: (length, code) -> symbol
                huff[(tc, th)] = {(ln_, code): sym for sym, (code, ln_) in codes.items()}
                i += 17 + n
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            assert ns == 3
            for c in range(ns):
                cid, tbls = payload[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tbls >> 4, tbls & 0xF))
            data_start = pos + ln
            break
        pos += ln
    assert data_start is not None and w % 8 == 0 and h % 8 == 0

    # entropy-coded data: up to the EOI marker, with 0xFF00 unstuffing
    end = b.rfind(b"\xff\xd9")
    stream = b[data_start:end].replace(b"\xff\x00", b"\xff")

    bitpos = 0

    def read_bit() -> int:
        nonlocal bitpos
        byte = stream[bitpos >> 3]
        bit = (byte >> (7 - (bitpos & 7))) & 1
        bitpos += 1
        return bit

    def read_bits(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | read_bit()
        return v

    def decode_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise AssertionError("invalid Huffman code")

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    m = _jpeg_dct_matrix()
    zig = _np.array(JPEG_ZIGZAG)
    planes = [_np.zeros((h, w)) for _ in range(3)]
    pred = [0, 0, 0]
    comp_qt = {cid: tq for cid, tq in comps}
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci, (cid, dc_t, ac_t) in enumerate(scan_comps):
                zz = _np.zeros(64, dtype=_np.int64)
                s = decode_symbol(huff[(0, dc_t)])
                diff = extend(read_bits(s), s) if s else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k <= 63:
                    sym = decode_symbol(huff[(1, ac_t)])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    assert k <= 63, "AC index overflow"
                    zz[k] = extend(read_bits(size), size)
                    k += 1
                steps = _np.array(qt[comp_qt[cid]], dtype=_np.float64)
                coef = _np.zeros(64)
                coef[zig] = zz * steps  # de-zigzag AND dequantize
                blk = m.T @ coef.reshape(8, 8) @ m
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk + 128.0

    yp, cbp, crp = planes
    r = _np.clip(_np.floor(yp + 1.402 * (crp - 128.0) + 0.5), 0, 255)
    g = _np.clip(
        _np.floor(yp - 0.344136 * (cbp - 128.0) - 0.714136 * (crp - 128.0) + 0.5),
        0, 255,
    )
    bl = _np.clip(_np.floor(yp + 1.772 * (cbp - 128.0) + 0.5), 0, 255)
    return w, h, _np.stack([r, g, bl], axis=-1)


def attach_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL baseline JPEGs deterministically from an id: the
    image is a grid of constant-color 8×8 tiles whose planted YCbCr
    values follow a closed-form id formula. Constant tiles have a DC
    coefficient only, and the DC quantization step is 1, so the decode
    round-trip is BIT-EXACT — which lets the q219 DuckDB oracle predict
    the decoded channel means ANALYTICALLY from the id formula, fully
    independent of this codec pair (the q200 PNG pattern, adapted to a
    lossy format by planting on its lossless sublattice)."""
    out_schema = MEDIA_SCHEMA

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def make_jpeg(doc_id: int) -> bytes:
            w = 8 * (2 + doc_id % 3)
            h = 8 * (2 + doc_id % 2)
            ty, tx = h // 8, w // 8
            y = _np.zeros((h, w), dtype=_np.uint8)
            cb = _np.zeros((h, w), dtype=_np.uint8)
            cr = _np.zeros((h, w), dtype=_np.uint8)
            for j in range(ty):
                for i in range(tx):
                    y[j * 8 : j * 8 + 8, i * 8 : i * 8 + 8] = 16 + (doc_id + 5 * i + 11 * j) % 224
                    cb[j * 8 : j * 8 + 8, i * 8 : i * 8 + 8] = 16 + (3 * doc_id + 7 * i + 13 * j) % 224
                    cr[j * 8 : j * 8 + 8, i * 8 : i * 8 + 8] = 16 + (7 * doc_id + 11 * i + 3 * j) % 224
            return jpeg_encode_baseline(y, cb, cr)

        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/jpeg",
                    "width": (8 * (2 + ids % 3)).astype("int32"),
                    "height": (8 * (2 + ids % 2)).astype("int32"),
                    "duration_ms": 0,
                    "content": [make_jpeg(int(i)) for i in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        encode_batches, schema=out_schema
    )


def decode_jpeg(df: DataFrame) -> DataFrame:
    """REAL lossy-codec decode, stdlib+numpy only: Huffman entropy decode,
    dequantize, IDCT, YCbCr→RGB — then per-channel means, the
    decode→stats pass of an image dedup/quality pipeline through a
    genuinely entropy-coded container (q219 is the oracle-checked
    registry entry; q200 covers the lossless/compressed PNG path)."""
    out_schema = (
        "media_id bigint, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def parse(blob: bytes):
            w, h, px = jpeg_decode_baseline(blob)
            return w, h, px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean()

        for pdf in batches:
            parsed = [parse(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "mean_r": [p[2] for p in parsed],
                    "mean_g": [p[3] for p in parsed],
                    "mean_b": [p[4] for p in parsed],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container layer (ISO/IEC 14496-12, public spec).
#
# The CONTAINER is fully parseable in pure stdlib: box framing
# (size+type, 64-bit largesize, size==0 runs-to-EOF), movie timing
# (``mvhd`` timescale/duration), per-track geometry (``tkhd`` 16.16
# fixed-point width/height) and handler classification (``hdlr``
# vide/soun). FRAME decode genuinely needs external codec libraries
# (H.264/AAC) absent from this container and stays out of scope — the
# parser returns REAL metadata without ever touching sample data, which
# is exactly what a 100 TB video-curation pass filters on before paying
# for any decode. Writer and parser are independent implementations of
# the spec (the q241 analytic oracle predicts the parsed values from
# the planting formula alone, so a matching encode/parse bug pair
# cannot self-certify; byte-level layout is additionally pinned against
# hand-built literals in tests/test_llm_ops.py).


def _mp4_box(typ: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def _mp4_full_box(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _mp4_box(typ, bytes([version]) + flags.to_bytes(3, "big") + body)


# identity transformation matrix (9 × 32-bit: 16.16 fixed, last 2.30)
_MP4_MATRIX = b"".join(
    v.to_bytes(4, "big") for v in (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
)


def mp4_encode_container(
    duration_ms: int,
    width: int,
    height: int,
    n_audio_tracks: int = 0,
    timescale: int = 600,
    payload: bytes = b"",
) -> bytes:
    """Spec-conformant minimal MP4: ``ftyp`` (isom/mp42) + ``moov``
    (``mvhd`` + one video ``trak`` + ``n_audio_tracks`` audio traks,
    each trak = ``tkhd`` + ``mdia(mdhd, hdlr)``) + ``mdat`` carrying
    ``payload``. Durations are stored in ``timescale`` units (the
    classic 600 Hz default)."""
    dur = duration_ms * timescale // 1000

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "big")

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "big")

    mvhd = _mp4_full_box(
        b"mvhd",
        0,
        0,
        u32(0) + u32(0) + u32(timescale) + u32(dur)  # created/modified/ts/dur
        + u32(0x00010000)  # rate 1.0
        + u16(0x0100) + u16(0)  # volume 1.0 + reserved
        + b"\x00" * 8  # reserved
        + _MP4_MATRIX
        + b"\x00" * 24  # pre_defined
        + u32(2 + n_audio_tracks),  # next_track_ID
    )
    mdhd = _mp4_full_box(
        b"mdhd",
        0,
        0,
        u32(0) + u32(0) + u32(timescale) + u32(dur)
        + u16(0x55C4)  # packed ISO-639 'und'
        + u16(0),
    )

    def trak(track_id: int, handler: bytes, w: int, h: int, volume: int) -> bytes:
        tkhd = _mp4_full_box(
            b"tkhd",
            0,
            0x7,  # enabled | in-movie | in-preview
            u32(0) + u32(0) + u32(track_id) + u32(0) + u32(dur)
            + b"\x00" * 8  # reserved
            + u16(0) + u16(0)  # layer, alternate_group
            + u16(volume) + u16(0)  # volume, reserved
            + _MP4_MATRIX
            + u32(w << 16) + u32(h << 16),  # 16.16 fixed
        )
        name = b"VideoHandler\x00" if handler == b"vide" else b"SoundHandler\x00"
        hdlr = _mp4_full_box(b"hdlr", 0, 0, u32(0) + handler + b"\x00" * 12 + name)
        return _mp4_box(b"trak", tkhd, _mp4_box(b"mdia", mdhd, hdlr))

    traks = [trak(1, b"vide", width, height, 0)]
    for i in range(n_audio_tracks):
        traks.append(trak(2 + i, b"soun", 0, 0, 0x0100))
    ftyp = _mp4_box(b"ftyp", b"isom", (0x200).to_bytes(4, "big"), b"isom", b"mp42")
    moov = _mp4_box(b"moov", mvhd, *traks)
    mdat = _mp4_box(b"mdat", payload)
    return ftyp + moov + mdat


def mp4_walk_boxes(b: bytes, lo: int = 0, hi: int | None = None):
    """Yield ``(type, body_lo, body_hi)`` for each box in ``b[lo:hi]``,
    handling 32-bit sizes, ``size==1`` 64-bit largesize, and ``size==0``
    extends-to-end. Raises ValueError on truncated/malformed framing."""
    if hi is None:
        hi = len(b)
    pos = lo
    while pos < hi:
        if pos + 8 > hi:
            raise ValueError("truncated box header")
        size = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("truncated largesize header")
            size = int.from_bytes(b[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = hi - pos
        if size < hdr or pos + size > hi:
            raise ValueError(f"malformed box {typ!r}: size {size}")
        yield typ, pos + hdr, pos + size
        pos += size


def mp4_parse_container(b: bytes) -> dict:
    """Parse the metadata layer of an ISO BMFF file: returns
    ``{major_brand, timescale, duration_ms, n_tracks, n_video_tracks,
    n_audio_tracks, width, height}`` — width/height from the first
    video track's ``tkhd`` (16.16 fixed → int), duration from ``mvhd``.
    Pure byte arithmetic; never touches ``mdat`` sample data."""
    major_brand = None
    moov = None
    for typ, blo, bhi in mp4_walk_boxes(b):
        if typ == b"ftyp" and major_brand is None:
            major_brand = b[blo : blo + 4].decode("latin-1")
        elif typ == b"moov" and moov is None:
            moov = (blo, bhi)
    if moov is None:
        raise ValueError("no moov box")
    timescale = duration_units = None
    n_tracks = n_video = n_audio = 0
    width = height = 0
    for typ, blo, bhi in mp4_walk_boxes(b, *moov):
        if typ == b"mvhd":
            ver = b[blo]
            p = blo + 4  # skip version+flags
            tlen = 8 if ver == 1 else 4
            p += 2 * tlen  # creation + modification
            timescale = int.from_bytes(b[p : p + 4], "big")
            p += 4
            duration_units = int.from_bytes(b[p : p + tlen], "big")
        elif typ == b"trak":
            n_tracks += 1
            t_w = t_h = 0
            handler = None
            for t2, lo2, hi2 in mp4_walk_boxes(b, blo, bhi):
                if t2 == b"tkhd":
                    ver = b[lo2]
                    p = lo2 + 4
                    tlen = 8 if ver == 1 else 4
                    p += 2 * tlen + 4 + 4  # created/modified/track_ID/reserved
                    p += tlen  # duration
                    p += 8 + 2 + 2 + 2 + 2 + 36  # reserved/layer/alt/vol/res/matrix
                    t_w = int.from_bytes(b[p : p + 4], "big") >> 16
                    t_h = int.from_bytes(b[p + 4 : p + 8], "big") >> 16
                elif t2 == b"mdia":
                    for t3, lo3, hi3 in mp4_walk_boxes(b, lo2, hi2):
                        if t3 == b"hdlr":
                            handler = b[lo3 + 8 : lo3 + 12]
            if handler == b"vide":
                n_video += 1
                if width == 0:
                    width, height = t_w, t_h
            elif handler == b"soun":
                n_audio += 1
    if timescale in (None, 0):
        raise ValueError("no mvhd timescale")
    return {
        "major_brand": major_brand,
        "timescale": timescale,
        "duration_ms": duration_units * 1000 // timescale,
        "n_tracks": n_tracks,
        "n_video_tracks": n_video,
        "n_audio_tracks": n_audio,
        "width": width,
        "height": height,
    }


def attach_mp4_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize spec-conformant MP4 containers per row with metadata
    planted as a closed-form function of the id (the q219 JPEG pattern):
    duration 500+125·(id mod 97) ms at timescale 600·(1+id mod 4), a
    video track of 16·(4+id mod 9) × 16·(3+id mod 7), plus (id mod 2)
    audio tracks. The planting keeps mvhd units exact in both
    directions (duration_ms multiple of 5, timescale multiple of 600 →
    ms→units→ms round-trips in integer arithmetic), so an analytic
    oracle can predict every parsed value."""
    out_schema = MEDIA_SCHEMA

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def make(doc_id: int) -> tuple[int, int, int, bytes]:
            dms = 500 + 125 * (doc_id % 97)
            w = 16 * (4 + doc_id % 9)
            h = 16 * (3 + doc_id % 7)
            blob = mp4_encode_container(
                dms,
                w,
                h,
                n_audio_tracks=doc_id % 2,
                timescale=600 * (1 + doc_id % 4),
                payload=doc_id.to_bytes(8, "big"),
            )
            return dms, w, h, blob

        for pdf in batches:
            made = [make(int(i)) for i in pdf["media_id"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "mime": "video/mp4",
                    "width": [m[1] for m in made],
                    "height": [m[2] for m in made],
                    "duration_ms": [m[0] for m in made],
                    "content": [m[3] for m in made],
                }
            )

    src = df.select(F.col(id_col).alias("media_id"))
    return src.mapInPandas(encode_batches, schema=out_schema)


def decode_mp4(df: DataFrame) -> DataFrame:
    """Container-metadata decode for MP4 rows: box walk → (brand,
    track census, duration, geometry). The 100 TB shape is the same
    zero-shuffle Arrow map as every decoder here — and because this is
    metadata-only, it is the CHEAP pre-filter a video pipeline runs
    over everything before any per-frame work is scheduled."""
    out_schema = (
        "media_id bigint, major_brand string, n_tracks int, "
        "n_video_tracks int, n_audio_tracks int, duration_ms int, "
        "width int, height int"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            parsed = [mp4_parse_container(bytes(c)) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "major_brand": [p["major_brand"] for p in parsed],
                    "n_tracks": [p["n_tracks"] for p in parsed],
                    "n_video_tracks": [p["n_video_tracks"] for p in parsed],
                    "n_audio_tracks": [p["n_audio_tracks"] for p in parsed],
                    "duration_ms": [p["duration_ms"] for p in parsed],
                    "width": [p["width"] for p in parsed],
                    "height": [p["height"] for p in parsed],
                }
            )

    return df.mapInPandas(decode_batches, schema=out_schema)
