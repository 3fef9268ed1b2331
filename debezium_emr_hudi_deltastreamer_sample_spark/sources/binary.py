"""Binary media ingestion (SURVEY.md §2.C multimodal row): files on disk →
opaque ``binary`` columns with a typed metadata struct, via Spark's
built-in ``binaryFile`` source.

The 100 TB pattern for image/audio/video corpora: land raw bytes as a
binary column next to typed metadata, partition by a cheap key, and run
decode/feature-extract as Arrow-batched ``mapInPandas`` stages
(operators/multimodal.py) — never as driver-side file loops. The
``binaryFile`` source is splittable across executors at file granularity
and supports ``pathGlobFilter`` push-down so non-matching files are never
opened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: file extension (lowercase) → coarse media_type for the metadata struct.
_MEDIA_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_binary_media(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Directory of media files → (media_id, media, media_meta) rows.

    ``glob`` (e.g. ``*.png``) pushes down to the file listing —
    non-matching files are pruned before any read. ``max_bytes`` filters
    oversized blobs by the LENGTH METADATA column, which Spark evaluates
    from the file status without reading content.

    Output schema matches operators/multimodal.py's decode plumbing:
    media_id string, media binary,
    media_meta struct<media_type,format,width,height,duration_ms> (width/
    height/duration null until a decode stage fills them).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    # Extension from the BASENAME's final dot only: a split of the whole
    # path would hand back path fragments for extensionless files or
    # dotted directory names ('/data.v2/clip' → 'v2/clip'). No match →
    # empty string → NULL format, 'unknown' media type.
    ext = F.nullif(
        F.lower(F.regexp_extract(F.col("path"), r"\.([^./\\]+)$", 1)),
        F.lit(""),
    )
    media_type = F.coalesce(
        *[F.when(ext == e, F.lit(t)) for e, t in _MEDIA_TYPES.items()],
        F.lit("unknown"),
    )
    return df.select(
        F.col("path").alias("media_id"),
        F.col("content").alias("media"),
        F.struct(
            media_type.alias("media_type"),
            ext.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )
