"""Multimodal (image/audio/video) column support (BASELINE.json north star).

Model: media is an opaque `binary` column plus a typed metadata struct —
exactly how a 100 TB multimodal corpus rides in parquet. The Spark-side
plumbing (schema, batching, partition-sized Arrow transfer via mapInPandas)
is real and tested; the codec step itself is STUBBED because no image/audio
libraries ship in this container:

- ``decode_image`` with ``strict=True`` uses a real imaging library when one
  is importable (PIL probe below — none ships here, so that path is live
  code but cold in this container) and otherwise raises NotImplementedError;
  non-strict produces a deterministic fake decode (dimensions parsed from
  the synthetic header) so the downstream plumbing stays testable
  end-to-end.

At scale: mapInPandas streams Arrow batches per partition — decode
parallelism == partition count, no driver involvement, and binary columns
never shuffle unless the user joins on them (don't).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

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
    """Per-Arrow-batch decode. ``strict=True`` requires a real imaging
    library (PIL probe) and decodes actual image bytes; otherwise the
    deterministic fake-header decode keeps the plumbing testable in
    containers that ship no codec (this one)."""
    if strict:
        image_mod = _imaging()
        if image_mod is None:
            raise NotImplementedError(
                "image decoding requires an imaging library not present in "
                "this container; plumbing is exercised with the "
                "deterministic fake"
            )
        import io

        out = []
        for media_id, blob in zip(pdf["media_id"], pdf["media"]):
            img = image_mod.open(io.BytesIO(bytes(blob)))
            px = list(img.convert("L").getdata())
            out.append(
                {
                    "media_id": media_id,
                    "width": img.width,
                    "height": img.height,
                    "n_bytes": len(bytes(blob)),
                    "mean_byte": float(sum(px)) / len(px) if px else 0.0,
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


def decode_images(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Distributed decode: mapInPandas over (id, media) — Arrow batches in,
    decoded feature rows out. The projection before mapInPandas matters:
    only the blob + id cross the JVM↔Python boundary."""
    src = df.select(F.col(id_col).alias("media_id"), "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf)

    return src.mapInPandas(run, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (decode stubbed). Demonstrates the explode-shaped plan used
    for frame extraction at scale — rows multiply, bytes don't."""
    n_frames = (F.col("media_meta.duration_ms") / every_ms).cast("int")
    return df.filter(F.col("media_meta.media_type") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ).alias("frame_ts_ms"),
    )
