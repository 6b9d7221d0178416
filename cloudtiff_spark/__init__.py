"""cloudtiff_spark — a PySpark-native spatial-join + COG tiling engine.

A from-scratch reimplementation of the query semantics of
ZhengLongBing/cloudtiff (a Rust Cloud-Optimized-GeoTIFF library, see
/root/reference) on idiomatic Spark primitives:

- tile grid / overview pyramid / affine geo-referencing as *native
  DataFrame column math* (whole-stage codegen, no Python in the hot path),
- pixel codecs (Deflate / TIFF-style LZW / PNG / a deterministic lossy
  stand-in for JPEG) as vectorized Arrow-batched pandas UDFs,
- cell-keyed spatial joins (point-in-polygon, kNN ring expansion,
  raster<->vector tile extraction, WMTS slippy tiles) as equi-joins on a
  hierarchical grid-cell key with explicit broadcast/repartition/salting,
- checkpoint/lineage for idempotent resume.

Everything here derives from public knowledge only (the TIFF 6 spec, the
slippy-map tile convention, Snyder map-projection formulas, the Apache
Spark API) plus the *behavior* of the reference repo.
"""

__version__ = "0.1.0"

TILE = 64  # fixture tile size (FIXTURES.md T3); bench variants may use 256.
