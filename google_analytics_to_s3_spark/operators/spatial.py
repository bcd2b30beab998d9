"""Grid-bucketed planar spatial joins.

The reference engine's only geo operator is the GeoIP range lookup
(reference ``enrichment/filters/ip.py:31-64``); a training-data /
analytics pipeline at scale also needs true *spatial* joins — "which
points of interest are within radius r of each event point", "nearest
store to each session" — without ever materializing the points × POIs
cross product.

The classic distributed plan (the same one Sedona/Magellan-style
engines lower to) is a **uniform grid partition join**:

1. Pick the grid cell size = the search radius ``r``. Every point then
   falls in exactly one cell ``(floor(x/r), floor(y/r))``, and every
   candidate POI within distance ``r`` of it lies in the point's own
   cell or one of its 8 neighbors.
2. Replicate the *small* side (POIs) to its 3x3 neighborhood — a
   constant 9x blow-up of the small table, map-side (``explode``).
3. Equi-join on the cell key (hash join — broadcast when the POI side
   is small, shuffle-hash otherwise), then apply the EXACT distance
   predicate to the surviving candidates.

Candidate count is bounded by points x (local POI density x 9), never
points x POIs — the plan survives a 100x scale-up as long as the POI
density per cell stays bounded, and a ``CartesianProduct`` /
``BroadcastNestedLoopJoin`` never appears (plan-asserted in
``tests/test_spatial.py``).

Exactness contract: coordinates are integer-valued (callers quantize
however they like); ``dist2`` is the exact integer squared Euclidean
distance, so the radius predicate ``dist2 <= r*r`` has no floating
point in it and any SQL engine reproduces it bit-for-bit. Bounds:
|coord| < 1.5e9 keeps ``dist2`` inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["radius_join", "nearest_within"]


def radius_join(
    points: DataFrame,
    pois: DataFrame,
    radius: int,
    point_id: str = "pid",
    poi_id: str = "poi_id",
    px: str = "x",
    py: str = "y",
    qx: str = "x",
    qy: str = "y",
    broadcast_pois: bool = True,
) -> DataFrame:
    """All (point, POI) pairs with squared distance <= ``radius**2``.

    Returns ``(point_id, poi_id, dist2)``. ``points`` is the large
    side and is never replicated; ``pois`` is exploded to its 3x3
    neighbor cells (9 rows per POI) and — when ``broadcast_pois`` —
    broadcast, so the big side joins map-side with zero shuffle.
    With ``broadcast_pois=False`` the same plan degrades to a
    shuffle hash join on the cell key for POI tables too big to
    broadcast; either way the exact ``dist2`` filter runs on grid
    candidates only.
    """
    r = int(radius)
    if r <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    p = points.select(
        F.col(point_id).alias("_pid"),
        F.col(px).cast("bigint").alias("_px"),
        F.col(py).cast("bigint").alias("_py"),
        F.floor(F.col(px).cast("bigint") / r).alias("_cx"),
        F.floor(F.col(py).cast("bigint") / r).alias("_cy"),
    )
    neigh = F.explode(
        F.array(*[
            F.struct(
                (F.floor(F.col(qx).cast("bigint") / r) + dx).alias("cx"),
                (F.floor(F.col(qy).cast("bigint") / r) + dy).alias("cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ])
    )
    q = pois.select(
        F.col(poi_id).alias("_qid"),
        F.col(qx).cast("bigint").alias("_qx"),
        F.col(qy).cast("bigint").alias("_qy"),
        neigh.alias("_cell"),
    ).select(
        "_qid", "_qx", "_qy",
        F.col("_cell.cx").alias("_cx"),
        F.col("_cell.cy").alias("_cy"),
    )
    if broadcast_pois:
        q = F.broadcast(q)
    dist2 = (
        (F.col("_px") - F.col("_qx")) * (F.col("_px") - F.col("_qx"))
        + (F.col("_py") - F.col("_qy")) * (F.col("_py") - F.col("_qy"))
    )
    return (
        p.join(q, on=["_cx", "_cy"], how="inner")
        .withColumn("_d2", dist2)
        .filter(F.col("_d2") <= F.lit(r * r))
        .select(
            F.col("_pid").alias(point_id),
            F.col("_qid").alias(poi_id),
            F.col("_d2").alias("dist2"),
        )
    )


def nearest_within(
    points: DataFrame,
    pois: DataFrame,
    radius: int,
    point_id: str = "pid",
    poi_id: str = "poi_id",
    px: str = "x",
    py: str = "y",
    qx: str = "x",
    qy: str = "y",
    broadcast_pois: bool = True,
) -> DataFrame:
    """Radius-bounded nearest-POI per point: every point row, with its
    closest POI within ``radius`` (ties -> smallest ``poi_id``) or
    NULLs when none is in range, plus ``n_in_radius``.

    The candidate set comes from :func:`radius_join`; the per-point
    argmin is one ``min(struct(dist2, poi_id))`` aggregate (no window,
    no sort), and unmatched points are restored with a left join on
    the point id — both shuffles are on the point id, the natural key.
    The radius bound is what makes grid-nearest exact: an unbounded
    nearest would need ring expansion, which this operator
    deliberately does not promise.
    """
    cand = radius_join(
        points, pois, radius,
        point_id=point_id, poi_id=poi_id,
        px=px, py=py, qx=qx, qy=qy,
        broadcast_pois=broadcast_pois,
    )
    best = cand.groupBy(point_id).agg(
        F.min(F.struct(F.col("dist2"), F.col(poi_id))).alias("_best"),
        F.count(F.lit(1)).alias("n_in_radius"),
    ).select(
        point_id,
        F.col(f"_best.{poi_id}").alias("nearest_poi"),
        F.col("_best.dist2").alias("nearest_dist2"),
        "n_in_radius",
    )
    return (
        points.select(point_id)
        .join(best, on=point_id, how="left")
        .withColumn(
            "n_in_radius",
            F.coalesce(F.col("n_in_radius"), F.lit(0)).cast("bigint"),
        )
    )
