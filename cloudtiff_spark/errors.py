"""Typed error taxonomy — mirrors the reference's error enums.

The reference models failures as typed enums the caller can match on:
`ProjectionError` (src/projection/mod.rs:25-36: MissingGeoKey, Proj4Error,
InvalidOrigin, InvalidScale, UnsupportedModelTransformation) and rejects
unsupported photometric interpretations / compressions with dedicated
variants (src/raster/photometrics.rs:16-55, src/cog/compression.rs:222-224).
This engine raises the equivalent typed exceptions so callers (and the
quarantine classifier) can distinguish "unsupported by design" from
"corrupt input". All inherit ValueError for backward compatibility with
earlier rounds' message-typed raises.
"""

from __future__ import annotations


class CloudTiffError(ValueError):
    """Base for all typed engine errors."""


class ProjectionError(CloudTiffError):
    """Base of the projection taxonomy (projection/mod.rs:25-36)."""


class UnsupportedCrs(ProjectionError):
    """EPSG outside the supported family (4326 hub, UTM 326zz/327zz, 3857).
    The reference would pass the code to proj4rs and surface Proj4Error;
    this engine's narrowing is documented in VERDICT r2 'What's missing' #3."""

    def __init__(self, epsg: int) -> None:
        super().__init__(f"unsupported CRS {epsg}")
        self.epsg = epsg


class UnsupportedModelTransformation(ProjectionError):
    """ModelTransformation (full 4x4 affine) GeoModel — parsed then rejected,
    exactly like the reference (projection/mod.rs:114-123)."""

    def __init__(self) -> None:
        super().__init__("TransformedModelUnsupported")


class MissingGeoKey(ProjectionError):
    """Required GeoKey absent (projection/mod.rs:87-90)."""

    def __init__(self, key: int) -> None:
        super().__init__(f"missing GeoKey {key}")
        self.key = key


class CompressionNotSupported(CloudTiffError):
    """Compression outside {Uncompressed, LZW, DeflateAdobe}
    (compression.rs:212-224)."""

    def __init__(self, what: object) -> None:
        super().__init__(f"CompressionNotSupported: {what}")
        self.compression = what


class UnsupportedPixelFormat(CloudTiffError):
    """bits_per_sample / dtype / samples-per-pixel combination outside the
    supported set (raster/image.rs:26-95)."""


#: PhotometricInterpretation code -> name (photometrics.rs:16-55)
PHOTOMETRIC_NAMES = {
    0: "WhiteIsZero",
    1: "BlackIsZero",
    2: "RGB",
    3: "RGBPalette",
    4: "TransparencyMask",
    5: "CMYK",
    6: "YCbCr",
    8: "CIELab",
    9: "ICCLab",
    10: "ITULab",
    32803: "ColorFilterArray",
    32844: "PixarLogL",
    32845: "PixarLogLuv",
    32892: "SequentialColorFilter",
    34892: "LinearRaw",
    51177: "DepthMap",
    52527: "SemanticMask",
}


def photometric_name(code: int) -> str:
    return PHOTOMETRIC_NAMES.get(code, f"Unknown({code})")


class RangeFetchTimeout(CloudTiffError):
    """A ranged HTTP/S3 GET exceeded its deadline. Without a socket
    timeout a stalled endpoint would hang the executor task indefinitely;
    the reference's SDK client carries request timeouts (io/s3.rs,
    io/http.rs via reqwest defaults), so the graft does too."""

    def __init__(self, url: str, seconds: float) -> None:
        super().__init__(f"range fetch timed out after {seconds:g}s: {url}")
        self.url = url
        self.seconds = seconds


class UnsupportedPhotometric(CloudTiffError):
    """Photometric interpretation the RGB8 conversion cannot express
    (everything outside WhiteIsZero/BlackIsZero/RGB/RGBPalette) — the
    reference enumerates these (photometrics.rs:16-55) and its DynamicImage
    conversion covers the same subset (raster/image.rs:26-95)."""

    def __init__(self, code: int) -> None:
        super().__init__(f"unsupported photometric {code} ({photometric_name(code)})")
        self.code = code
        self.name = photometric_name(code)


class NotATiff(CloudTiffError):
    """The byte-order mark / magic word is not TIFF — definitive from the
    first 4-8 bytes, NEVER a truncation condition (the header-only open
    retry loops re-raise CloudTiffError immediately instead of growing
    the fetch window to the whole object)."""


class TileIndexOutOfRange(CloudTiffError):
    """Tile/strip index beyond min(len(offsets), len(byte_counts)) — the
    reference's TileIndexOutOfRange (level.rs:303-319). A DEFINITIVE
    reject (CloudTiffError, so is_truncation() excludes it): growing a
    ranged prefix can never make a bad index valid."""


class NoLevels(CloudTiffError):
    """A complete IFD chain with no tiled full-resolution level
    (cog/mod.rs:127-129) — definitive once the chain parses, so the
    retry loops must not re-fetch on it."""

    def __init__(self) -> None:
        super().__init__("NoLevels")
