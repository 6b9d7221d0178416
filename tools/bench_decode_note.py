"""A/B attribution for the round-3 crop_render / pyramid_stats slowdown
(VERDICT r3, What's wrong #4): same Spark session, same 10% image subset,
N passes per arm — one arm decodes the REAL baseline-JFIF fixture payloads
(fixture v3), the other the FJ01 stand-in transcode of the identical
pixels (the round-1/2 payload format). Any real-JFIF decode cost shows as
the between-arm delta; host noise shows as the within-arm spread.

Writes a markdown section to tools/bench_notes.md (picked up into BENCH.md
by tools/bench_scaling.py) and prints one JSON line.

Usage: python tools/bench_decode_note.py  [env: SF_DIR, PASSES, CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "5"))
CPUS = int(os.environ.get("CPUS", "32"))


def main() -> None:
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from cloudtiff_spark.fixtures import fixture_dir_for
    from cloudtiff_spark.operators.meta import levels_df
    from cloudtiff_spark.operators.render import crop_render
    from cloudtiff_spark.operators.tiling import build_tiles
    from cloudtiff_spark.session import get_spark

    spark = get_spark("decode-note", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    fdir = fixture_dir_for(SF_DIR)
    images = (
        spark.read.parquet(os.path.join(fdir, "images.parquet"))
        .filter(F.col("image_id").endswith("0"))
        .repartition(CPUS * 2, "image_id")
    )
    meta = spark.read.parquet(os.path.join(fdir, "images_meta.parquet"))

    def transcode(batches):
        from cloudtiff_spark.codecs import decode_image, encode_fakejpeg

        for pdf in batches:
            out_bytes = []
            for b, fmt, w, h in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]):
                if fmt == "jpeg":
                    out_bytes.append(encode_fakejpeg(decode_image(bytes(b), fmt, w, h)))
                else:
                    out_bytes.append(bytes(b))
            pdf = pdf.assign(bytes=out_bytes)
            yield pdf

    standin = images.mapInPandas(transcode, schema=images.schema)

    # both variants fully materialized BEFORE timing: the arms time the
    # decode -> pyramid -> cut -> encode pipeline, not the transcode
    real = images.persist(StorageLevel.MEMORY_AND_DISK)
    fake = standin.persist(StorageLevel.MEMORY_AND_DISK)
    n_real, n_fake = real.count(), fake.count()
    assert n_real == n_fake

    lv = levels_df(meta.join(real.select("image_id"), "image_id", "left_semi"))
    lv = lv.persist(StorageLevel.MEMORY_AND_DISK)
    lv.count()

    def pyramid_pass(src):
        t = build_tiles(src)
        out = t.groupBy("fmt", "level").agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.count_distinct("image_id").alias("n_images"),
        )
        return out.select(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64(*out.columns))
        ).first()

    def crop_pass(src):
        out = crop_render(lv, build_tiles(src), (0.1, 0.2, 0.9, 0.8), mp_limit=0.01)
        out = out.select(
            "image_id", "level", "out_w", "out_h",
            F.round(F.col("mean_px") * 1e6).cast("long").alias("mean_px_micro"),
        )
        return out.select(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64(*out.columns))
        ).first()

    results: dict[str, dict[str, list[float]]] = {}
    for qname, fn in [("pyramid_stats", pyramid_pass), ("crop_render", crop_pass)]:
        results[qname] = {}
        for arm, src in [("real_jfif", real), ("fj01_standin", fake)]:
            times = []
            for _ in range(PASSES):
                t0 = time.time()
                fn(src)
                times.append(round(time.time() - t0, 3))
            results[qname][arm] = times

    summary = {}
    for qname, arms in results.items():
        summary[qname] = {
            arm: {"passes": t, "best": min(t), "spread": round(max(t) - min(t), 3)}
            for arm, t in arms.items()
        }
        summary[qname]["jfif_cost_best_delta"] = round(
            min(arms["real_jfif"]) - min(arms["fj01_standin"]), 3
        )
    line = {"note": "decode_ab", "sf": os.path.basename(SF_DIR), "cpus": CPUS, **summary}
    print(json.dumps(line))

    notes = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_notes.md")
    with open(notes, "a") as f:
        f.write("\n## crop_render / pyramid_stats decode-cost attribution (A/B)\n\n")
        f.write(
            f"Same session, {CPUS} cores, sf={os.path.basename(SF_DIR)}, "
            f"{PASSES} passes per arm, identical pixels — real baseline-JFIF "
            "payloads (fixture v3) vs the FJ01 stand-in transcode "
            "(round-1/2 payload format).\n\n"
        )
        f.write("| query | arm | passes (s) | best |\n|---|---|---|---|\n")
        for qname, arms in results.items():
            for arm, t in arms.items():
                f.write(f"| {qname} | {arm} | {t} | {min(t)} |\n")
        for qname in results:
            f.write(
                f"\n- `{qname}`: real-JFIF decode costs "
                f"**{summary[qname]['jfif_cost_best_delta']:+.3f} s** per pass "
                "(best-vs-best) over the stand-in.\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
