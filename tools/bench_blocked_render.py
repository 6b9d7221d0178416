"""A/B: whole-render vs block-tiled render on ONE large (gigapixel-class)
render — the case the blocked path exists for.

The whole-render path runs a single render as ONE task (per-pixel CRS
transform + gather serialize on one core); region_render_blocked cuts the
output into block x block tasks, so the same render spreads across every
core. This script times both on one big projected-image render and prints
one JSON line; run it at two parallelism levels for the scaling evidence:

    BLOCK_CPUS=2 python tools/bench_blocked_render.py
    BLOCK_CPUS=8 python tools/bench_blocked_render.py

Env: BLOCK_CPUS (local[] size, default 8), BLOCK_MP (mp_limit, default 64
-> a 64-megapixel output), BLOCK_SIZE (block px, default 1024), BLOCK_ITERS
(best-of passes, default 2), BLOCK_TASKSET (if set, advise pinning — the
script itself does not taskset; wrap it like tools/bench_scaling.py does).
Results recorded in tools/bench_notes.md ("Blocked render scaling").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("BLOCK_CPUS", "8"))
    mp = float(os.environ.get("BLOCK_MP", "64"))
    block = int(os.environ.get("BLOCK_SIZE", "1024"))
    iters = int(os.environ.get("BLOCK_ITERS", "2"))

    import numpy as np
    from pyspark.sql import functions as F

    from cloudtiff_spark.codecs import encode_image
    from cloudtiff_spark.operators.meta import levels_df
    from cloudtiff_spark.operators.render import region_render, region_render_blocked
    from cloudtiff_spark.operators.tiling import build_tiles
    from cloudtiff_spark.projection import bounds_lat_lon
    from cloudtiff_spark.session import get_spark

    spark = get_spark("blocked-render-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # one 2048x2048 UTM image; the render upsamples it to BLOCK_MP megapixels
    # of output so the per-pixel CRS inverse dominates (the gigapixel shape)
    w = h = 2048
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ox, oy, sp = 500000.0, 5400000.0, 10.0
    xmin, ymin, xmax, ymax = bounds_lat_lon(32609, ox, oy, sp * w, sp * h)
    images = spark.createDataFrame(
        [("big", bytearray(encode_image(img, "deflate_raw")), w, h, "deflate_raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    meta = spark.createDataFrame(
        [("big", w, h, "deflate_raw", "", 0, 32609, ox, oy, sp,
          xmin, ymin, xmax, ymax, 64, 64)],
        "image_id string, w int, h int, fmt string, caption string, phash long, "
        "epsg int, origin_x double, origin_y double, scale_px double, "
        "xmin double, ymin double, xmax double, ymax double, tile_w int, tile_h int",
    )
    queries = spark.createDataFrame(
        [("q_big", "region", [0.0], [0.0], 0.0, 0.0, 0,
          xmin + (xmax - xmin) * 0.1, ymin + (ymax - ymin) * 0.1,
          xmin + (xmax - xmin) * 0.9, ymin + (ymax - ymin) * 0.9,
          mp, 0, 0, 0)],
        "query_id string, kind string, poly_x array<double>, poly_y array<double>, "
        "px double, py double, k int, rxmin double, rymin double, rxmax double, "
        "rymax double, mp_limit double, qz int, qx int, qy int",
    )
    tiles = build_tiles(images).cache()
    tiles.count()
    lv = levels_df(meta).cache()
    lv.count()

    def timed(df) -> tuple[float, int]:
        best, n = float("inf"), 0
        for _ in range(max(1, iters)):
            t0 = time.time()
            row = df.select(
                F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("raster")).alias("h")
            ).first()
            best, n = min(best, time.time() - t0), row["n"]
        return best, n

    t_whole, n_whole = timed(region_render(lv, tiles, queries))
    t_blocked, n_blocks = timed(
        region_render_blocked(lv, tiles, queries, block=block, emit_blocks=True)
    )
    print(json.dumps({
        "metric": "single_large_render",
        "mp_limit": mp,
        "cpus": cpus,
        "block": block,
        "whole_sec": round(t_whole, 3),
        "blocked_sec": round(t_blocked, 3),
        "speedup": round(t_whole / t_blocked, 2),
        "renders": n_whole,
        "blocks": n_blocks,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
