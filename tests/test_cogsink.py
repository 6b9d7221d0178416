"""Distributed COG sink (operators/cogsink.py): byte identity with the
single-pass writer across pixel formats, multi-level pyramids, odd
dimensions (non-exact halving ratios), compressions, and the ranged
streaming writer."""

import numpy as np
import pytest

from cloudtiff_spark.errors import UnsupportedPixelFormat
from cloudtiff_spark.tiff import (
    COMPRESSION_DEFLATE,
    COMPRESSION_JPEG,
    COMPRESSION_LZW,
    cog_info,
    decode_tile,
    encode_cog,
)


def _rng(seed):
    return np.random.default_rng(seed)


def _meta_df(spark, image_id, w, h, c, dtype, epsg=32633, ox=500000.0, oy=5200000.0, sp=10.0):
    return spark.createDataFrame(
        [(image_id, w, h, c, dtype, epsg, ox, oy, sp)],
        "image_id string, w int, h int, c int, dtype string, epsg int, "
        "origin_x double, origin_y double, scale_px double",
    )


def _blocked_bytes(spark, arr, image_id="img", tile=64, **kw):
    """Run the full distributed path for one array, return the COG bytes."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    meta = _meta_df(spark, image_id, w, h, c, str(arr.dtype))
    images = spark.createDataFrame(
        [(image_id, bytearray(arr.tobytes()), w, h, c, str(arr.dtype))],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=tile)
    tiles = encode_cog_blocked(blocks, meta, tile=tile, **kw)
    rows = assemble_cogs(tiles, meta, tile=tile, **kw).collect()
    assert len(rows) == 1
    return bytes(rows[0]["cog"])


CASES = [
    # (seed, shape, dtype, kwargs) — odd dims force sw/dw ratios != 2 at
    # deeper levels, the exactness-critical case for the per-tile
    # resample; seeds are literal so a failing pixel array is replayable
    # (hash() is salted per process)
    (101, (200, 300, 3), "uint8", {}),
    (102, (333, 217), "uint8", {}),
    (103, (129, 65), "uint16", {}),
    (104, (100, 101), "float32", {"predictor": 3}),
    (105, (150, 220, 3), "uint8", {"compression": COMPRESSION_LZW, "predictor": 2}),
    (106, (70, 90, 4), "uint8", {}),
    # TechNote-2 JPEG tiles: abbreviated streams compressed on the
    # cluster, shared tag-347 tables rebuilt driver-side from `quality`
    # (jpeg_tables_for) — byte identity proves the rebuilt tables equal
    # the per-tile ones
    (107, (200, 300, 3), "uint8", {"compression": COMPRESSION_JPEG}),
    (108, (150, 130), "uint8", {"compression": COMPRESSION_JPEG, "quality": 75}),
]


@pytest.mark.parametrize("seed,shape,dtype,kw", CASES)
def test_blocked_matches_single_pass(spark, seed, shape, dtype, kw):
    r = _rng(seed)
    if dtype == "float32":
        arr = r.normal(size=shape).astype(np.float32)
    else:
        arr = r.integers(0, np.iinfo(dtype).max, size=shape, dtype=dtype)
    single = encode_cog(arr, 32633, 500000.0, 5200000.0, 10.0, tile=64, **kw)
    blocked = _blocked_bytes(spark, arr, tile=64, **kw)
    assert blocked == single  # every container byte, all levels


def test_blocked_multi_image(spark):
    """Several images of different shapes through ONE call — per-image
    grids must not cross-contaminate."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    specs = [("a", 200, 150), ("b", 65, 64), ("c", 40, 30)]
    imgs, metas, singles = [], [], {}
    for iid, w, h in specs:
        arr = _rng(ord(iid)).integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        imgs.append((iid, bytearray(arr.tobytes()), w, h, 3, "uint8"))
        metas.append((iid, w, h, 3, "uint8", 32633, 0.0, 0.0, 1.0))
        singles[iid] = encode_cog(arr, 32633, 0.0, 0.0, 1.0, tile=64)
    images = spark.createDataFrame(
        imgs, "image_id string, raster binary, w int, h int, c int, dtype string"
    )
    meta = spark.createDataFrame(
        metas,
        "image_id string, w int, h int, c int, dtype string, epsg int, "
        "origin_x double, origin_y double, scale_px double",
    )
    tiles = encode_cog_blocked(blocks_from_images(images, tile=64), meta, tile=64)
    for row in assemble_cogs(tiles, meta, tile=64).collect():
        assert bytes(row["cog"]) == singles[row["image_id"]], row["image_id"]


def test_ranged_writer_streams_identical_file(spark, tmp_path):
    from cloudtiff_spark.operators.cogsink import (
        blocks_from_images,
        encode_cog_blocked,
        write_cog_ranged,
    )

    arr = _rng(7).integers(0, 255, size=(300, 280, 3), dtype=np.uint8)
    single = encode_cog(arr, 3857, 1.0, 2.0, 0.5, tile=64)
    meta = _meta_df(spark, "big", 280, 300, 3, "uint8", epsg=3857, ox=1.0, oy=2.0, sp=0.5)
    images = spark.createDataFrame(
        [("big", bytearray(arr.tobytes()), 280, 300, 3, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    tiles = encode_cog_blocked(blocks_from_images(images, tile=64), meta, tile=64)
    p = str(tmp_path / "big.tif")
    n = write_cog_ranged(tiles, meta, p, tile=64)
    data = open(p, "rb").read()
    assert n == len(data) == len(single)
    assert data == single


def test_blocked_output_decodes(spark):
    """Sanity beyond byte equality: the blocked COG decodes to the input
    pixels at level 0 and a plausible overview at level 1."""
    arr = _rng(11).integers(0, 255, size=(130, 140, 3), dtype=np.uint8)
    cog = _blocked_bytes(spark, arr, tile=64)
    info = cog_info(cog)
    assert len(info["levels"]) >= 2
    lv0 = info["levels"][0]
    cols = -(-lv0["width"] // 64)
    t0 = decode_tile(cog, info, 0, 0)
    assert np.array_equal(t0[:64, :64], arr[:64, :64])
    t_last = decode_tile(cog, info, 0, cols * (-(-lv0["height"] // 64)) - 1)
    assert np.array_equal(t_last[: 130 - 2 * 64, : 140 - 2 * 64], arr[128:, 128:])


def test_blocked_rejects_bad_format_before_cluster_work(spark):
    from cloudtiff_spark.operators.cogsink import encode_cog_blocked

    meta = _meta_df(spark, "x", 10, 10, 3, "uint16")  # 16-bit is gray-only
    blocks = spark.createDataFrame([], "image_id string, row int, col int, data binary")
    with pytest.raises(UnsupportedPixelFormat):
        encode_cog_blocked(blocks, meta)


def test_assemble_rejects_missing_tiles(spark):
    """A lost tile must fail the assembly loudly, never write a corrupt
    container."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    arr = _rng(3).integers(0, 255, size=(100, 200, 3), dtype=np.uint8)
    meta = _meta_df(spark, "m", 200, 100, 3, "uint8")
    images = spark.createDataFrame(
        [("m", bytearray(arr.tobytes()), 200, 100, 3, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    tiles = encode_cog_blocked(blocks_from_images(images, tile=64), meta, tile=64)
    broken = tiles.filter("NOT (level = 0 AND tile_idx = 1)")
    with pytest.raises(Exception, match="tiles"):
        assemble_cogs(broken, meta, tile=64).collect()


def test_assemble_rejects_duplicate_tiles(spark):
    """A duplicated tile_idx passes the per-level COUNT check but would
    concatenate both payloads and shift every later offset — it must fail
    loudly, not write a corrupt container."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    arr = _rng(5).integers(0, 255, size=(100, 200, 3), dtype=np.uint8)
    meta = _meta_df(spark, "d", 200, 100, 3, "uint8")
    images = spark.createDataFrame(
        [("d", bytearray(arr.tobytes()), 200, 100, 3, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    tiles = encode_cog_blocked(blocks_from_images(images, tile=64), meta, tile=64)
    dup = tiles.filter("level = 0 AND tile_idx = 2")
    broken = tiles.filter("NOT (level = 0 AND tile_idx = 1)").unionByName(dup)
    with pytest.raises(Exception, match="duplicate tile_idx"):
        assemble_cogs(broken, meta, tile=64).collect()


def test_render_blocks_to_cogs_end_to_end(spark, sf_small):
    """The gigapixel loop: blocked render (emit_blocks=True, block=tile)
    -> distributed COG sink. The resulting containers must decode back to
    the EXACT whole-path region_render rasters and carry the render
    grid's georeferencing (NW-corner origin, anisotropic scale)."""
    import os

    from cloudtiff_spark.operators.cogsink import render_blocks_to_cogs
    from cloudtiff_spark.operators.meta import levels_df
    from cloudtiff_spark.operators.render import region_render, region_render_blocked
    from cloudtiff_spark.operators.tiling import build_tiles
    from cloudtiff_spark.tiff import cog_info, decode_tile, parse_tiff

    images = spark.read.parquet(os.path.join(sf_small, "images.parquet"))
    meta = spark.read.parquet(os.path.join(sf_small, "images_meta.parquet"))
    queries = spark.read.parquet(os.path.join(sf_small, "queries.parquet"))
    tiles = build_tiles(images)
    lv = levels_df(meta)

    expected = {
        (r.query_id, r.image_id): (r.out_w, r.out_h, bytes(r.raster))
        for r in region_render(lv, tiles, queries).collect()
    }
    blocks = region_render_blocked(lv, tiles, queries, block=64, emit_blocks=True)
    cogs = render_blocks_to_cogs(blocks, queries, tile=64).collect()
    assert len(cogs) == len(expected) > 0

    qbounds = {
        r.query_id: (r.rxmin, r.rymin, r.rxmax, r.rymax)
        for r in queries.filter("kind = 'region'").collect()
    }
    checked_geo = 0
    for row in cogs:
        out_w, out_h, want = expected[(row.query_id, row.image_id)]
        cog = bytes(row.cog)
        info = cog_info(cog)
        lv0 = info["levels"][0]
        assert (lv0["width"], lv0["height"]) == (out_w, out_h)
        # reassemble level 0 from its tiles and compare to the whole path
        cols = -(-out_w // 64)
        rows_ = -(-out_h // 64)
        canvas = np.zeros((rows_ * 64, cols * 64, 3), np.uint8)
        for ti in range(cols * rows_):
            t = decode_tile(cog, info, 0, ti)
            rr, cc = ti // cols, ti % cols
            canvas[rr * 64 : (rr + 1) * 64, cc * 64 : (cc + 1) * 64] = t
        assert canvas[:out_h, :out_w].tobytes() == want
        # georeferencing: NW corner + anisotropic per-axis scale
        rxmin, rymin, rxmax, rymax = qbounds[row.query_id]
        ifd0 = parse_tiff(cog)["ifds"][0]
        tp = ifd0[33922]  # ModelTiepoint
        sc = ifd0[33550]  # ModelPixelScale
        assert tp[3] == rxmin and tp[4] == rymax
        assert abs(sc[0] - (rxmax - rxmin) / out_w) < 1e-12
        assert abs(sc[1] - (rymax - rymin) / out_h) < 1e-12
        checked_geo += 1
    assert checked_geo == len(cogs)


def test_jpeg_quality_rides_tile_relation(spark):
    """Review finding r6: assemble rebuilt the tag-347 tables from its own
    quality default — a mismatch with the encode-time quality pairs wrong
    DQT tables with the coefficients (decodes without error, wrong
    pixels). The encode-time quality now rides the tile relation, so the
    natural pipe (encode -> assemble with default quality) stays
    byte-identical to encode_cog at the true quality."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    arr = _rng(109).integers(0, 256, (150, 200, 3), dtype=np.uint8)
    h, w, c = arr.shape
    meta = _meta_df(spark, "img", w, h, c, "uint8")
    images = spark.createDataFrame(
        [("img", bytearray(arr.tobytes()), w, h, c, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=64)
    tiles = encode_cog_blocked(
        blocks, meta, tile=64, compression=COMPRESSION_JPEG, quality=70
    )
    # note: NO quality passed here — it must come from the tile relation
    rows = assemble_cogs(tiles, meta, tile=64, compression=COMPRESSION_JPEG).collect()
    single = encode_cog(
        arr, 32633, 500000.0, 5200000.0, 10.0, tile=64,
        compression=COMPRESSION_JPEG, quality=70,
    )
    assert bytes(rows[0]["cog"]) == single


def test_blocked_sparse_matches_single_pass(spark):
    """sparse=True on the distributed encoder: all-zero tiles become
    offset-0/count-0 holes identically to encode_cog(sparse=True) — the
    whole container, every level, byte for byte."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )
    from cloudtiff_spark.tiff import cog_info

    arr = np.zeros((300, 420, 3), dtype=np.uint8)
    r = _rng(109)
    arr[10:60, 12:70] = r.integers(1, 255, (50, 58, 3), dtype=np.uint8)
    arr[200:240, 300:350] = r.integers(1, 255, (40, 50, 3), dtype=np.uint8)
    single = encode_cog(
        arr, 32633, 500000.0, 5200000.0, 10.0, tile=64, sparse=True
    )
    meta = _meta_df(spark, "sp", 420, 300, 3, "uint8")
    images = spark.createDataFrame(
        [("sp", bytearray(arr.tobytes()), 420, 300, 3, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=64)
    tiles = encode_cog_blocked(blocks, meta, tile=64, sparse=True)
    rows = assemble_cogs(tiles, meta, tile=64).collect()
    assert bytes(rows[0]["cog"]) == single
    info = cog_info(single)
    assert any(
        n == 0 for lev in info["levels"] for n in lev["byte_counts"]
    )  # the case really wrote holes


def test_blocked_sparse_nodata_matches_single_pass(spark):
    """sparse + nodata on the distributed encoder: nodata-uniform tiles
    hole identically to encode_cog, and the GDAL_NODATA tag rides every
    IFD — whole container byte identity."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )
    from cloudtiff_spark.tiff import cog_info

    arr = np.full((300, 420), 42, dtype=np.uint8)
    r = _rng(110)
    arr[10:60, 12:70] = r.integers(0, 42, (50, 58), dtype=np.uint8)
    single = encode_cog(
        arr, 32633, 500000.0, 5200000.0, 10.0, tile=64,
        sparse=True, nodata=42,
    )
    meta = _meta_df(spark, "nd", 420, 300, 1, "uint8")
    images = spark.createDataFrame(
        [("nd", bytearray(arr.tobytes()), 420, 300, 1, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=64)
    tiles = encode_cog_blocked(blocks, meta, tile=64, sparse=True, nodata=42)
    rows = assemble_cogs(tiles, meta, tile=64, nodata=42).collect()
    assert bytes(rows[0]["cog"]) == single
    info = cog_info(single)
    assert info["levels"][0]["nodata"] == 42.0
    assert any(n == 0 for lev in info["levels"] for n in lev["byte_counts"])


@pytest.mark.parametrize(
    "seed,shape,dtype,kw",
    [
        (111, (333, 217, 3), "uint8", {}),
        (112, (129, 65), "uint16", {}),
        (113, (100, 101), "float32", {"predictor": 3}),
        (114, (200, 300, 3), "uint8", {"compression": COMPRESSION_LZW, "predictor": 2}),
    ],
)
def test_blocked_average_matches_single_pass(spark, seed, shape, dtype, kw):
    """resample='average' on the distributed encoder: the dest-tile-keyed
    box reduction is byte-identical to encode_cog's resample_average at
    ragged ratios across dtypes — whole container, all levels."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    r = _rng(seed)
    if dtype == "float32":
        arr = r.normal(size=shape).astype(np.float32)
    else:
        arr = r.integers(0, np.iinfo(dtype).max, size=shape, dtype=dtype)
    single = encode_cog(
        arr, 32633, 500000.0, 5200000.0, 10.0, tile=64,
        resample="average", **kw,
    )
    if arr.ndim == 2:
        arr3 = arr[:, :, None]
    else:
        arr3 = arr
    h, w, c = arr3.shape
    meta = _meta_df(spark, "avg", w, h, c, str(arr.dtype))
    images = spark.createDataFrame(
        [("avg", bytearray(arr3.tobytes()), w, h, c, str(arr.dtype))],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=64)
    tiles = encode_cog_blocked(blocks, meta, tile=64, resample="average", **kw)
    rows = assemble_cogs(tiles, meta, tile=64, **kw).collect()
    assert bytes(rows[0]["cog"]) == single


def test_blocked_average_nodata_sparse_matches_single_pass(spark):
    """average + nodata + sparse on the distributed encoder: the shared
    _box_average kernel excludes nodata from overview means, all-nodata
    dest tiles hole, and the whole container stays byte-identical."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )
    from cloudtiff_spark.tiff import cog_info

    r = _rng(115)
    arr = np.full((300, 420), 200, dtype=np.uint8)
    arr[20:180, 30:250] = r.integers(0, 200, (160, 220), dtype=np.uint8)
    single = encode_cog(
        arr, 32633, 500000.0, 5200000.0, 10.0, tile=64,
        resample="average", nodata=200, sparse=True,
    )
    meta = _meta_df(spark, "an", 420, 300, 1, "uint8")
    images = spark.createDataFrame(
        [("an", bytearray(arr[:, :, None].tobytes()), 420, 300, 1, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=64)
    tiles = encode_cog_blocked(
        blocks, meta, tile=64, resample="average", nodata=200, sparse=True
    )
    rows = assemble_cogs(tiles, meta, tile=64, nodata=200).collect()
    assert bytes(rows[0]["cog"]) == single
    info = cog_info(single)
    assert any(n == 0 for lev in info["levels"] for n in lev["byte_counts"])


def test_predictor_and_nodata_ride_tile_relation(spark):
    """ADVICE r6: tiles compressed with predictor=2 (or sparse holes cut
    against a nodata) but assembled with the assembler's DEFAULTS produce
    a container that parses cleanly yet decodes silently wrong pixels —
    the same hazard class the quality attribute closed. Both now ride the
    tile relation; the natural pipe (encode -> assemble with defaults)
    stays byte-identical to encode_cog at the true params."""
    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    arr = _rng(117).integers(0, 256, (150, 200, 3), dtype=np.uint8)
    arr[:70, :70] = 42  # a nodata-uniform region -> sparse hole
    h, w, c = arr.shape
    meta = _meta_df(spark, "img", w, h, c, "uint8")
    images = spark.createDataFrame(
        [("img", bytearray(arr.tobytes()), w, h, c, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    blocks = blocks_from_images(images, tile=64)
    tiles = encode_cog_blocked(
        blocks, meta, tile=64, predictor=2, sparse=True, nodata=42
    )
    # note: NO predictor/nodata passed here — they must ride the relation
    rows = assemble_cogs(tiles, meta, tile=64).collect()
    single = encode_cog(
        arr, 32633, 500000.0, 5200000.0, 10.0, tile=64,
        predictor=2, sparse=True, nodata=42,
    )
    assert bytes(rows[0]["cog"]) == single


def test_render_blocks_to_cogs_rejects_separator_ids(spark):
    """ADVICE r6: an id containing the 0x1f composite-key separator would
    mis-split the output columns and can collide two renders into one
    sink image — rejected up front."""
    import pytest as _pytest

    from cloudtiff_spark.operators.cogsink import render_blocks_to_cogs

    blocks = spark.createDataFrame(
        [
            (
                "q\x1fx", "img", 0, 0, 0, 0, 0, 64, 64, 64, 64,
                bytearray(b"\0" * (64 * 64 * 3)),
            )
        ],
        "query_id string, image_id string, level int, by int, bx int, "
        "row0 int, col0 int, block_h int, block_w int, out_w int, out_h int, "
        "raster binary",
    )
    queries = spark.createDataFrame(
        [("q\x1fx", 0.0, 0.0, 1.0, 1.0)],
        "query_id string, rxmin double, rymin double, rxmax double, rymax double",
    )
    with _pytest.raises(ValueError, match="separator"):
        render_blocks_to_cogs(blocks, queries, tile=64)


def test_assemble_never_collects_the_tile_relation(spark):
    """VERDICT r6 'what's wrong' #1 / next-round #2: assemble_cogs used to
    collect (image_id, level, tile_idx, nbytes) for EVERY tile of every
    image in the call — O(total tiles) driver memory, a driver OOM at the
    10^8-tile design point. The prefix now builds inside each image's
    fan-in task; the driver may only collect per-image aggregates (no
    tile_idx column in any collected relation)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from cloudtiff_spark.operators.cogsink import (
        assemble_cogs,
        blocks_from_images,
        encode_cog_blocked,
    )

    arr = _rng(21).integers(0, 255, size=(150, 200, 3), dtype=np.uint8)
    meta = _meta_df(spark, "nc", 200, 150, 3, "uint8")
    images = spark.createDataFrame(
        [("nc", bytearray(arr.tobytes()), 200, 150, 3, "uint8")],
        "image_id string, raster binary, w int, h int, c int, dtype string",
    )
    tiles = encode_cog_blocked(blocks_from_images(images, tile=64), meta, tile=64)

    collected_schemas = []
    orig = CDF.collect

    def spy(self, *a, **k):
        collected_schemas.append([f.name for f in self.schema.fields])
        return orig(self, *a, **k)

    CDF.collect = spy
    try:
        rows = assemble_cogs(tiles, meta, tile=64).collect()
    finally:
        CDF.collect = orig
    assert len(rows) == 1
    single = encode_cog(arr, 32633, 500000.0, 5200000.0, 10.0, tile=64)
    assert bytes(rows[0]["cog"]) == single
    # driver-side collects during assembly: per-image aggregates only
    for cols in collected_schemas[:-1]:  # the last entry is our own .collect
        assert "tile_idx" not in cols and "data" not in cols, cols
