"""Checkpoint / lineage: per-partition manifest + idempotent resume.

North-rule requirement (no reference analog — cloudtiff is a single-file
library; see SURVEY.md §2.9/§7): the benchmark pipeline must checkpoint
per snapshot with per-partition lineage counters and resume idempotently.

Design (batch incrementality, Iceberg-snapshot-shaped):
- the image space is split into ``n_partitions`` deterministic slices by
  ``pmod(xxhash64(image_id), n)`` — the analog of Iceberg manifest/bucket
  partitions; at 10^12-row scale each slice is a partition-pruned scan,
- each slice is processed independently (tile assignment + PIP join),
  its output written to ``<out>/part=<i>/`` (directory rename = atomic
  commit), and a manifest row appended with counters,
- resume = set-difference: slices present in the manifest with
  status='done' are skipped; a re-run of a finished run is a no-op,
- counters (rows_in, tiles_out, joined_rows) make progress observable and
  are monotone across resumes (FIXTURES.md T5 schema).

The manifest itself is a directory of tiny one-row parquet files — append
-only, so a crash mid-write can at worst leave a missing row (that slice
is simply reprocessed; outputs are overwritten idempotently).
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("snapshot_id", pa.int64()),
        ("partition_id", pa.int32()),
        ("rows_in", pa.int64()),
        ("tiles_out", pa.int64()),
        ("joined_rows", pa.int64()),
        ("quarantined", pa.int64()),
        ("status", pa.string()),
        ("updated_at", pa.timestamp("us")),
    ]
)


class Manifest:
    def __init__(self, root: str, run_id: str):
        self.dir = os.path.join(root, run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.run_id = run_id

    def done_partitions(self) -> set[int]:
        done: set[int] = set()
        for f in os.listdir(self.dir):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(self.dir, f))
                for row in t.to_pylist():
                    if row["status"] == "done":
                        done.add(row["partition_id"])
        return done

    def append(self, snapshot_id: int, partition_id: int, rows_in: int, tiles_out: int, joined_rows: int, status: str, quarantined: int = 0) -> None:
        row = {
            "run_id": self.run_id,
            "snapshot_id": snapshot_id,
            "partition_id": partition_id,
            "rows_in": rows_in,
            "tiles_out": tiles_out,
            "joined_rows": joined_rows,
            "quarantined": quarantined,
            "status": status,
            "updated_at": int(time.time() * 1e6),
        }
        tbl = pa.Table.from_pylist([row], schema=MANIFEST_SCHEMA)
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, tmp)
        os.rename(tmp, os.path.join(self.dir, f"p{partition_id:05d}-{uuid.uuid4().hex[:8]}.parquet"))

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            "run_id string, snapshot_id bigint, partition_id int, rows_in bigint, "
            "tiles_out bigint, joined_rows bigint, quarantined bigint, "
            "status string, updated_at timestamp"
        ).parquet(self.dir)


def checkpointed_pip_run(
    spark: SparkSession,
    meta: DataFrame,
    queries: DataFrame,
    out_dir: str,
    manifest_root: str,
    run_id: str,
    n_partitions: int = 8,
    snapshot_id: int = 1,
    fail_after: int | None = None,
    images: DataFrame | None = None,
) -> Manifest:
    """Run the north-star stage slice-by-slice with checkpointing.

    fail_after=k aborts after k slices (crash-injection for resume tests).
    A restarted run with the same run_id skips finished slices and produces
    byte-identical output.

    When ``images`` (the payload table) is provided, each slice also runs
    the row-grain decode-failure quarantine (SURVEY §2.3: anti join
    ``needed ⋉̸ decoded``): corrupt rows are written to
    ``<out>/quarantine/part=<pid>`` and counted in the manifest's
    ``quarantined`` column, instead of the reference's silent drop
    (render/tiles.rs:33-56) or a task-killing exception.
    """
    from .operators.decode import quarantine
    from .operators.meta import tile_assignments
    from .operators.spatial import pip_join

    man = Manifest(manifest_root, run_id)
    done = man.done_partitions()
    part_col = F.pmod(F.xxhash64("image_id"), F.lit(n_partitions))
    processed = 0
    for pid in range(n_partitions):
        if pid in done:
            continue
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} slices")
        slice_meta = meta.filter(part_col == pid)
        rows_in = slice_meta.count()
        ta = tile_assignments(slice_meta)
        joined = pip_join(ta, queries, salt=0)
        path = os.path.join(out_dir, f"part={pid}")
        joined.write.mode("overwrite").parquet(path)
        quarantined = 0
        if images is not None:
            qpath = os.path.join(out_dir, "quarantine", f"part={pid}")
            quarantine(images.filter(part_col == pid)).write.mode("overwrite").parquet(qpath)
            quarantined = spark.read.parquet(qpath).count()
        tiles_out = ta.count()
        joined_rows = spark.read.parquet(path).count()
        man.append(snapshot_id, pid, rows_in, tiles_out, joined_rows, "done", quarantined)
        processed += 1
    return man
