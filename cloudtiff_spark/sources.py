"""External COG ingestion: read real GeoTIFF files from a directory (or any
Hadoop-compatible FS — file://, s3a://, ...) with Spark's binaryFile source
and run the same S1/S2 analyze stage as the inline-bytes path.

This is the Spark analog of the reference's file/HTTP/S3 readers
(src/io/mod.rs, io/http.rs, io/s3.rs): the ranged-read machinery lives in
the data source (S3A already does ranged reads and footer-first fetches);
the engine only sees a binary column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_cog_directory(spark: SparkSession, path: str, pattern: str = "*.tif") -> DataFrame:
    """-> (image_id = file stem, cog = raw bytes, cog_bytes, mod_time)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)\.[^./]+$", 1).alias("image_id"),
            F.col("content").alias("cog"),
            F.col("length").alias("cog_bytes"),
            F.col("modificationTime").alias("mod_time"),
        )
    )
    return df


def analyze_cog_directory(spark: SparkSession, path: str, pattern: str = "*.tif") -> DataFrame:
    """binaryFile scan -> parse_cogs: per-level metadata for every COG file
    (the whole reference `CloudTiff::open` lifecycle as one Spark stage)."""
    from .operators.cog import parse_cogs

    return parse_cogs(read_cog_directory(spark, path, pattern))


def disect(data: bytes) -> str:
    """S10 debug dump (cog/mod.rs:249-261): printable structure of a COG."""
    from .tiff import cog_info, parse_tiff

    t = parse_tiff(data)
    lines = [
        f"TIFF {'big' if t['big'] else 'classic'} endian={'LE' if t['endian'] == '<' else 'BE'}"
        f" ifds={len(t['ifds'])}"
    ]
    info = cog_info(data)
    for i, lev in enumerate(info["levels"]):
        cols = -(-lev["width"] // lev["tile_w"])
        rows = -(-lev["height"] // lev["tile_h"])
        kind = "full" if lev["overview"] is None else f"overview {lev['overview']}"
        lines.append(
            f"  level {i} ({kind})"
            f": {lev['width']}x{lev['height']} tiles {cols}x{rows}@{lev['tile_w']}"
            f" comp={lev['compression']} pred={lev.get('predictor', 1)}"
        )
    p = info["projection"]
    if p:
        lines.append(
            f"  projection epsg={p['epsg']} origin=({p['origin_x']}, {p['origin_y']})"
            f" scale={p['scale_px']}"
        )
    return "\n".join(lines)
