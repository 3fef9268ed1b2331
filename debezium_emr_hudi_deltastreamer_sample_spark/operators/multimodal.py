"""Multimodal (image/audio/video) column support (BASELINE.json north star).

Model: media is an opaque `binary` column plus a typed metadata struct —
exactly how a 100 TB multimodal corpus rides in parquet. The Spark-side
plumbing (schema, batching, partition-sized Arrow transfer via mapInPandas)
is real and tested. Codec coverage is tiered:

- Formats that decode for real IN THIS CONTAINER: pure-numpy PPM (P6) and
  BMP (24-bit BI_RGB); a stdlib-only (zlib+struct) PNG codec — 8-bit
  gray/RGB/RGBA, all five scanline filters on decode; and a pure-numpy
  baseline JPEG codec (operators/jpeg.py — DCT via matrix algebra,
  standard Annex K tables, 4:4:4/4:2:0, restart markers). No imaging
  library needed; exercised end-to-end by strict decode tests, a
  hand-crafted-bytes analytic test, and the mm_decode_codec oracle.
- REMAINING compressed variants (progressive JPEG, webp, palette-PNG, ...)
  go through a real imaging library when one is importable (PIL probe —
  none ships here, so that branch is live code but cold) and otherwise
  raise NotImplementedError.
- The non-strict path produces a deterministic fake decode (dimensions
  parsed from the synthetic header) so downstream plumbing stays testable
  with zero codec dependencies at all.

At scale: mapInPandas streams Arrow batches per partition — decode
parallelism == partition count, no driver involvement, and binary columns
never shuffle unless the user joins on them (don't).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata carried alongside every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|wav|mp4|fake
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def make_fake_media(df: DataFrame, id_col: str, width_col, height_col) -> DataFrame:
    """Synthesize deterministic fake media blobs: an 8-byte header
    (width,height as big-endian int32 — hex-encoded, so network byte order)
    + payload derived from the id. Stands in for real image bytes so the
    decode plumbing has stable input."""
    header = F.concat(
        _be_int32(width_col), _be_int32(height_col), F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    )
    return df.withColumn("media", header).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.col(width_col).cast("int").alias("width") if isinstance(width_col, str) else width_col.cast("int").alias("width"),
            F.col(height_col).cast("int").alias("height") if isinstance(height_col, str) else height_col.cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _be_int32(col) -> F.Column:
    c = (F.col(col) if isinstance(col, str) else col).cast("int")
    # int → 4 bytes via bit arithmetic + char concat is clumsy in pure SQL;
    # encode as fixed-width hex instead (unhex yields BIG-endian byte order,
    # matching the '>i' unpack in decode_image_batch).
    return F.unhex(F.lpad(F.hex(c), 8, "0"))


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6). Uncompressed: header + raw RGB."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM P6 requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Tolerant header tokenizer:
    arbitrary whitespace between tokens, ``#`` comments to end-of-line
    (the format's full generality — encoders differ here)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval, then raw samples
    return np.frombuffer(b, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(
        h, w, 3
    )


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BI_RGB): BGR byte
    order, rows bottom-up, each row padded to a 4-byte boundary."""
    h, w, _ = arr.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    bgr = arr[:, :, ::-1].astype(np.uint8)
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + bytes(body)


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB. Handles the
    bottom-up (positive height) and top-down (negative height) row orders
    and 4-byte row padding; refuses compressed or non-24-bit variants."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack("<I", b[10:14])[0]
    _size, w, h, _planes, bitcount, compression = struct.unpack("<IiiHHI", b[14:34])
    if bitcount != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array → PNG: (h, w) grayscale, (h, w, 3) RGB or (h, w, 4)
    RGBA; 8-bit, non-interlaced, filter 0 per scanline, one zlib IDAT.
    Stdlib-only (zlib + struct) — a real compressed-image writer with no
    imaging-library dependency."""
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """PNG → uint8 array ((h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA).
    Full filter support (None/Sub/Up/Average/Paeth, the part encoders
    actually vary on); 8-bit non-interlaced gray/RGB/RGBA only — palette,
    16-bit and Adam7 interlace raise ValueError (→ imaging-library
    fallback). CRCs are validated so corrupt blobs fail loudly instead of
    decoding garbage."""
    import zlib

    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, hdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        payload = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = hdr
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if depth != 8 or ch is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced gray/RGB/RGBA PNG supported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up (uint8 addition wraps mod 256, as specified)
            cur = line + prev
        elif f == 1:  # Sub — sequential left-neighbor recurrence
            cur = line
            for i in range(ch, stride):
                # Explicit int arithmetic: mod-256 wrap is the PNG semantic,
                # but a uint8 scalar += raises numpy RuntimeWarning, which
                # would mask real overflows elsewhere.
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif f == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def _decode_uncompressed(b: bytes) -> np.ndarray | None:
    """Magic-sniff the formats the pure-Python codecs cover (PPM, BMP and
    — despite the function's historical name — zlib-compressed PNG and
    baseline JPEG); None = not one of them OR a variant the native codecs
    don't handle (e.g. 32-bit / RLE BMP, 16-bit PPM, palette/interlaced
    PNG, progressive JPEG) — the caller falls through to the
    imaging-library branch, which may well decode what the minimal codec
    cannot. Only the no-library case surfaces an error, and it surfaces
    there.

    The except list covers everything corrupt/TRUNCATED bytes can raise
    out of the codecs (struct.error on short headers, zlib.error on a cut
    inflate stream, IndexError/KeyError from the JPEG bit reader and
    Huffman tables, numpy's buffer-size ValueError) — one bad blob in a
    100 TB corpus must fall through, never abort the mapInPandas
    partition."""
    import struct as _struct
    import zlib as _zlib

    try:
        if b[:2] == b"P6":
            return decode_ppm(b)
        if b[:2] == b"BM":
            return decode_bmp(b)
        if b[: len(_PNG_SIG)] == _PNG_SIG:
            return decode_png(b)
        if b[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg  # noqa: PLC0415

            return decode_jpeg(b)
    except (
        ValueError,
        IndexError,
        KeyError,
        OverflowError,
        _struct.error,
        _zlib.error,
    ):
        return None
    return None


def _imaging():
    """Optional-imaging-library probe: PIL if importable, else None. Keeps
    the real-decode path live wherever Pillow is installed without making
    it a dependency of this container."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except Exception:
        return None


def decode_image_batch(pdf: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    """Per-Arrow-batch decode. ``strict=True`` decodes REAL image bytes:
    PPM/BMP/PNG via the pure-Python codecs above (in-container),
    anything else via an imaging library if importable (PIL probe), else
    NotImplementedError. Non-strict is the deterministic fake-header
    decode that keeps plumbing testable with zero codec dependencies.
    ``mean_byte`` in strict mode is the mean over RGB pixel samples."""
    if strict:
        out = []
        image_mod = None
        for media_id, blob in zip(pdf["media_id"], pdf["media"]):
            b = bytes(blob)
            arr = _decode_uncompressed(b)
            if arr is not None:
                h, w = arr.shape[:2]
                mean = float(arr.mean()) if arr.size else 0.0
            else:
                if image_mod is None:
                    image_mod = _imaging()
                if image_mod is None:
                    raise NotImplementedError(
                        "this image format requires an imaging library "
                        "not present in this container; PPM/BMP/PNG and "
                        "baseline JPEG decode natively, others need PIL"
                    )
                import io

                img = image_mod.open(io.BytesIO(b))
                px = np.asarray(img.convert("RGB"), dtype=np.float64)
                w, h = img.width, img.height
                mean = float(px.mean()) if px.size else 0.0
            out.append(
                {
                    "media_id": media_id,
                    "width": w,
                    "height": h,
                    "n_bytes": len(b),
                    "mean_byte": mean,
                }
            )
        return pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])
    out = []
    for media_id, blob in zip(pdf["media_id"], pdf["media"]):
        b = bytes(blob)
        width = struct.unpack(">i", b[0:4])[0]   # hex-encoded big-endian
        height = struct.unpack(">i", b[4:8])[0]
        payload = b[8:]
        out.append(
            {
                "media_id": media_id,
                "width": width,
                "height": height,
                "n_bytes": len(b),
                "mean_byte": float(sum(payload)) / len(payload) if payload else 0.0,
            }
        )
    return pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])


def decode_images(
    df: DataFrame, id_col: str = "media_id", strict: bool = False
) -> DataFrame:
    """Distributed decode: mapInPandas over (id, media) — Arrow batches in,
    decoded feature rows out. The projection before mapInPandas matters:
    only the blob + id cross the JVM↔Python boundary. ``strict=True``
    decodes real bytes (PPM/BMP/PNG natively; others via PIL probe)."""
    src = df.select(F.col(id_col).alias("media_id"), "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, strict=strict)

    return src.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("resized_mean", T.DoubleType()),
    ]
)


def resize_images(
    df: DataFrame, id_col: str = "media_id", out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Distributed thumbnail/normalize stage: strict-decode each blob
    (PPM/BMP/PNG native codecs) and nearest-neighbor-resize to a fixed
    ``(out_h, out_w)`` grid — the preprocessing step every vision-training
    pipeline runs before feature extraction. The index map is pure integer
    floor (``src = dst * src_dim // out_dim``), so the resampled pixels
    are engine-reproducible — which is what lets the driver oracle
    recompute the resized means from the pixel-generating formula rather
    than trusting the Python path.

    Scale: same shape as `decode_images` — only (id, blob) crosses the
    JVM↔Arrow boundary, each batch is decoded+strided in numpy with no
    interpolation math, and the output is a fixed-width feature row
    regardless of source resolution, so downstream cost is decoupled from
    image size."""
    src = df.select(F.col(id_col).alias("media_id"), "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                arr = _decode_uncompressed(bytes(blob))
                if arr is None:
                    raise ValueError(
                        f"media_id={mid}: not a decodable PPM/BMP/PNG container"
                    )
                h, w = arr.shape[:2]
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                thumb = arr[ri][:, ci]
                rows.append(
                    {
                        "media_id": int(mid),
                        "src_width": int(w),
                        "src_height": int(h),
                        "resized_mean": float(thumb.mean()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "src_width", "src_height", "resized_mean"],
            )

    return src.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (decode stubbed). Demonstrates the explode-shaped plan used
    for frame extraction at scale — rows multiply, bytes don't."""
    # ceil(duration/every): a 2500 ms clip sampled at 1000 ms has frames
    # at 0/1000/2000 — plain truncation dropped the final partial-window
    # frame (round-4 review finding; exact multiples are unchanged).
    n_frames = (
        ((F.col("media_meta.duration_ms") - 1) / every_ms).cast("int") + 1
    )
    # duration 0 or NULL has no sampleable frames: (0−1)/every casts to 0
    # → +1 would emit a phantom frame at ts 0, and NULL duration slips
    # through greatest(NULL, 0) the same way — exclude both up front.
    return df.filter(
        (F.col("media_meta.media_type") == "video")
        & (F.col("media_meta.duration_ms") > 0)
    ).select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ).alias("frame_ts_ms"),
    )


# ------------------------------------------------------------------ audio

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (PCM fmt chunk + data chunk) —
    the audio sibling of encode_ppm/encode_bmp: an uncompressed real
    container the engine can produce and parse without any audio
    library."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (int16 mono samples, sample_rate). Walks the chunk
    list (fmt may be padded / followed by LIST chunks — the format's
    generality), accepts only uncompressed 16-bit PCM mono."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


def decode_audio(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Distributed audio feature extraction: mapInPandas over
    (media_id, media) WAV bytes → per-clip sample_rate / n_samples /
    duration_ms / RMS / peak. Same execution shape as decode_images:
    Arrow batches in, one numpy pass per clip, no audio library."""

    def run(batches):
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf[id_col], pdf["media"]):
                samples, rate = decode_wav(bytes(blob))
                x = samples.astype("float64")
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": rate,
                        "n_samples": len(samples),
                        "duration_ms": len(samples) * 1000 // rate,
                        "rms": float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                        "peak": int(np.abs(samples).max()) if len(samples) else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return df.select(id_col, "media").mapInPandas(run, AUDIO_SCHEMA)
