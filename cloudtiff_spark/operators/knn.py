"""kNN via grid-cell ring expansion (J5 — north-rule operator).

No reference analog exists (SURVEY.md §2.3 J5); the ring search generalizes
the reference's rectangle enumeration (level.rs:204-231). Semantics:

- candidate set: one point per image = the center of its EPSG:4326 bounds,
- metric: squared euclidean distance in lon/lat degrees (documented; the
  fixture band excludes the antimeridian so no wraparound),
- result: top-k per query, ties broken by image_id ascending
  (FIXTURES.md golden_knn).

Algorithm (driver-side iteration, each round fully native + one Arrow-free
join): scan cells in growing chebyshev rings around the query cell at
Z_KNN. A query finishes when it holds >= k candidates whose k-th smallest
distance is provably closer than anything outside the scanned block: every
unscanned point is > R * (180/2^z) degrees away (the lat cell span is the
smaller of the two, see cells.py). Rings are scanned in geometrically
growing batches so the number of Spark rounds is O(log(world/cell)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cells import cell_xy_expr, pack_expr

Z_KNN = 4  # 16x16 world grid: hot fixtures resolve in 1-2 rounds


def _image_points(meta: DataFrame) -> DataFrame:
    lon = (F.col("xmin") + F.col("xmax")) / 2
    lat = (F.col("ymin") + F.col("ymax")) / 2
    cx, cy = cell_xy_expr(lon, lat, F.lit(Z_KNN))
    return meta.select(
        "image_id", lon.alias("ilon"), lat.alias("ilat"), cx.alias("icx"), cy.alias("icy")
    )


def knn(meta: DataFrame, queries: DataFrame, z: int = Z_KNN, max_rounds: int = 8) -> DataFrame:
    """Output: (query_id, rank, image_id) for 'knn' queries."""
    n = 1 << z
    lat_span = 180.0 / n  # min cell span in degrees

    pts = _image_points(meta).cache()
    q = (
        queries.filter(F.col("kind") == "knn")
        .select("query_id", "px", "py", "k")
        .withColumn("qcx", cell_xy_expr(F.col("px"), F.col("py"), F.lit(z))[0])
        .withColumn("qcy", cell_xy_expr(F.col("px"), F.col("py"), F.lit(z))[1])
    )

    active = q
    acc: DataFrame | None = None
    r_lo = 0  # rings [r_lo, r_hi] scanned this round
    r_hi = 0
    done: DataFrame | None = None
    for _ in range(max_rounds):
        # enumerate this round's ring cells (chebyshev distance in
        # [r_lo, r_hi]) — O(annulus), not O(square): rows with |dy| >= r_lo
        # span the full dx range; interior rows only the two side strips.
        # (r_lo == 0 always takes the full-range branch, so no duplicates.)
        dx_full = F.sequence(F.lit(-r_hi), F.lit(r_hi))
        dx_sides = F.concat(
            F.sequence(F.lit(-r_hi), F.lit(-r_lo)), F.sequence(F.lit(r_lo), F.lit(r_hi))
        )
        ring = (
            active.withColumn("_dy", F.explode(F.sequence(F.lit(-r_hi), F.lit(r_hi))))
            .withColumn(
                "_dx",
                F.explode(F.when(F.abs(F.col("_dy")) >= F.lit(r_lo), dx_full).otherwise(dx_sides)),
            )
            .withColumn("icx", F.col("qcx") + F.col("_dx"))
            .withColumn("icy", F.col("qcy") + F.col("_dy"))
            .filter(
                (F.col("icx") >= 0) & (F.col("icx") < n) & (F.col("icy") >= 0) & (F.col("icy") < n)
            )
            .drop("_dx", "_dy")
        )
        found = ring.join(pts, ["icx", "icy"], "inner").select(
            "query_id",
            "px",
            "py",
            "k",
            "qcx",
            "qcy",
            "image_id",
            (
                (F.col("ilon") - F.col("px")) * (F.col("ilon") - F.col("px"))
                + (F.col("ilat") - F.col("py")) * (F.col("ilat") - F.col("py"))
            ).alias("dist_sq"),
        )
        acc = found if acc is None else acc.unionByName(found)
        acc = acc.localCheckpoint(eager=False)

        # a query is settled when its k-th candidate beats the ring bound,
        # or the whole world has been scanned
        guard = (r_hi * lat_span) ** 2
        w = Window.partitionBy("query_id").orderBy(F.col("dist_sq").asc(), F.col("image_id").asc())
        ranked = acc.withColumn("rank", F.row_number().over(w))
        kth = ranked.filter(F.col("rank") == F.col("k")).select(
            "query_id", F.col("dist_sq").alias("kth_sq")
        )
        world_scanned = r_hi >= n
        status = active.join(kth, "query_id", "left").withColumn(
            "_done",
            F.lit(world_scanned) | (F.col("kth_sq").isNotNull() & (F.col("kth_sq") <= guard)),
        )
        finished = status.filter(F.col("_done")).select("query_id")
        done = finished if done is None else done.unionByName(finished)
        active = status.filter(~F.col("_done")).select("query_id", "px", "py", "k", "qcx", "qcy")
        if active.isEmpty():
            break
        r_lo = r_hi + 1
        r_hi = max(1, r_hi * 2)  # geometric ring growth
    else:
        raise RuntimeError("kNN ring expansion did not converge")

    w = Window.partitionBy("query_id").orderBy(F.col("dist_sq").asc(), F.col("image_id").asc())
    return (
        acc.dropDuplicates(["query_id", "image_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "image_id")
    )
