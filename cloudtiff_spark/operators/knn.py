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
    """Output: (query_id, rank, image_id) for 'knn' queries.

    r7 round-structure optimization (results identical — scanning a
    SUPERSET of rings never changes the exact top-k, and the per-query
    termination bound is unchanged): the first round's radius is sized
    from the measured point density so typical queries settle immediately
    (the old fixed 0,1,2,4,... schedule needed 4-6 driver rounds, each a
    full Spark job on this fixture); termination is decided DRIVER-side
    from the collected k-th-distance rows (one tiny action per round —
    #knn-queries rows of 3 scalars, query metadata not payload, same
    contract as prepare_pip_queries.polys_dict) instead of a status join
    plus a separate isEmpty action; ring growth is x4."""
    n = 1 << z
    lat_span = 180.0 / n  # min cell span in degrees

    pts = _image_points(meta).cache()
    q = (
        queries.filter(F.col("kind") == "knn")
        .select("query_id", "px", "py", "k")
        .withColumn("qcx", cell_xy_expr(F.col("px"), F.col("py"), F.lit(z))[0])
        .withColumn("qcy", cell_xy_expr(F.col("px"), F.col("py"), F.lit(z))[1])
    )

    # density-sized first radius: expect >= ~4*k candidates in the first
    # scanned block so the common query terminates in one round. count()
    # doubles as the cache materialization the old first join paid anyway.
    n_pts = pts.count()
    if n_pts == 0:
        # no candidate points: every query "scans the world" and finds
        # nothing — return the empty result without looping (and without
        # leaking the just-materialized cache)
        pts.unpersist()
        return q.select("query_id", F.lit(1).cast("int").alias("rank"), F.lit("").alias("image_id")).limit(0)
    density = n_pts / float(n * n)
    k_hint = 16.0  # fixture k's are single-digit; 4*k headroom
    r0 = 0
    while (2 * r0 + 1) ** 2 * density < 4.0 * k_hint and r0 < n:
        r0 += 1

    active_ids: set | None = None  # None = all; else the still-active set
    acc: DataFrame | None = None
    r_lo = 0  # rings [r_lo, r_hi] scanned this round
    r_hi = r0
    for _ in range(max_rounds):
        # enumerate this round's ring cells (chebyshev distance in
        # [r_lo, r_hi]) — O(annulus), not O(square): rows with |dy| >= r_lo
        # span the full dx range; interior rows only the two side strips.
        # (r_lo == 0 always takes the full-range branch, so no duplicates.)
        # isin over the active-id list is right at the query counts this
        # operator sees (the vector side is small by design — pip_join
        # broadcasts it whole); a service with 10^5+ concurrent knn
        # queries should swap this for a left_anti join against a
        # done-ids relation to keep the per-round plan size bounded
        active = q if active_ids is None else q.filter(F.col("query_id").isin(list(active_ids)))
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
            "k",
            "image_id",
            (
                (F.col("ilon") - F.col("px")) * (F.col("ilon") - F.col("px"))
                + (F.col("ilat") - F.col("py")) * (F.col("ilat") - F.col("py"))
            ).alias("dist_sq"),
        )
        acc = found if acc is None else acc.unionByName(found)
        acc = acc.localCheckpoint(eager=False)

        # a query is settled when its k-th candidate beats the ring bound,
        # or the whole world has been scanned. The k-th rows are tiny
        # (one per query that HAS k candidates) — collect them and decide
        # driver-side; the collect is also the action that materializes
        # this round's checkpoint.
        guard = (r_hi * lat_span) ** 2
        w = Window.partitionBy("query_id").orderBy(F.col("dist_sq").asc(), F.col("image_id").asc())
        ranked = acc.withColumn("rank", F.row_number().over(w))
        kth = {
            r["query_id"]: r["dist_sq"]
            for r in ranked.filter(F.col("rank") == F.col("k"))
            .select("query_id", "dist_sq")
            .collect()
        }
        if active_ids is None:
            active_ids = {r["query_id"] for r in q.select("query_id").collect()}
        world_scanned = r_hi >= n
        if world_scanned:
            active_ids = set()
        else:
            active_ids = {
                qid for qid in active_ids if not (qid in kth and kth[qid] <= guard)
            }
        if not active_ids:
            break
        r_lo = r_hi + 1
        r_hi = max(1, r_hi * 4)  # geometric ring growth
    else:
        raise RuntimeError("kNN ring expansion did not converge")

    pts.unpersist()  # acc rows are checkpoint-materialized; pts is done
    w = Window.partitionBy("query_id").orderBy(F.col("dist_sq").asc(), F.col("image_id").asc())
    return (
        acc.dropDuplicates(["query_id", "image_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "image_id")
    )
