"""spark-submit entrypoint for the north-star pipeline (north_rule: "run
via spark-submit --py-files on a multi-executor cluster").

Usage (cluster):

    zip -r cloudtiff_spark.zip cloudtiff_spark
    spark-submit --master <cluster> --py-files cloudtiff_spark.zip job.py \
        --meta  <dir>/images_meta.parquet \
        --queries <dir>/queries.parquet \
        --output  <out_dir> --manifest <manifest_root> \
        --run-id r1 --partitions 64

The job runs the checkpointed tile-assignment + PIP-join pipeline
(cloudtiff_spark.lineage.checkpointed_pip_run): the image space is split
into deterministic slices, each slice's output commits atomically under
``<output>/part=<i>/`` with a per-partition manifest row (rows_in /
tiles_out / joined_rows counters). Re-submitting with the same --run-id
resumes idempotently: finished slices are skipped, interrupted ones are
reprocessed and overwritten. Prints one JSON summary line on success.

No master is set here — spark-submit owns deployment (local[N] in the
sandbox tests, a real cluster in production).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--meta", required=True, help="images_meta parquet path")
    ap.add_argument("--queries", required=True, help="queries parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True, help="manifest root dir")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--snapshot-id", type=int, default=1)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument(
        "--images",
        default=None,
        help="images parquet path (payload table); when given, each slice "
        "also runs the row-grain decode-failure quarantine: corrupt rows "
        "land under <output>/quarantine/part=<i> and the manifest gains a "
        "quarantined counter (SURVEY §2.3)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(f"cloudtiff-pip-{args.run_id}")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
    )
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from cloudtiff_spark.lineage import checkpointed_pip_run

    meta = spark.read.parquet(args.meta)
    queries = spark.read.parquet(args.queries)
    images = spark.read.parquet(args.images) if args.images else None
    man = checkpointed_pip_run(
        spark,
        meta,
        queries,
        args.output,
        args.manifest,
        args.run_id,
        n_partitions=args.partitions,
        snapshot_id=args.snapshot_id,
        images=images,
    )
    mpd = man.read(spark)
    from pyspark.sql import functions as F

    agg = mpd.filter(F.col("status") == "done").agg(
        F.count(F.lit(1)).alias("parts"),
        F.sum("rows_in").alias("rows_in"),
        F.sum("tiles_out").alias("tiles_out"),
        F.sum("joined_rows").alias("joined_rows"),
        F.sum("quarantined").alias("quarantined"),
    ).first()
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "partitions_done": agg["parts"],
                "rows_in": agg["rows_in"],
                "tiles_out": agg["tiles_out"],
                "joined_rows": agg["joined_rows"],
                "quarantined": agg["quarantined"],
                "output": args.output,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
