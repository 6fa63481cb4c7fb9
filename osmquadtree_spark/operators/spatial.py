"""New-engine spatial operators beyond the reference: XYZ raster tiles,
raster↔vector joins on cell ids, kNN via cell-neighborhood expansion.

The reference has no raster ops or kNN (SURVEY.md §2.3) — these are the
north-rule additions. They reuse the same cell algebra: the reference's
(x, y, z) tile tuple (quadtree.cpp:161-177) IS the slippy-map XYZ scheme in
the scale-90 mercator, so ``round(qt, z) ↔ from_tuple(x, y, z)`` converts
between the engine's primary cell ids and raster tile addresses for free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.udfs import round_qt_col
from ..kernels import quadtree as qtk


def make_xyz_udf(zoom: int):
    """pandas UDF: qt → struct(tile_x, tile_y) at ``zoom`` (round + tuple)."""

    @pandas_udf("tile_x bigint, tile_y bigint")
    def qt_to_xyz(qt: pd.Series) -> pd.DataFrame:
        rounded = qtk.round_qt(qt.to_numpy("int64"), zoom)
        x, y, _ = qtk.tuple_arr(rounded)
        return pd.DataFrame({"tile_x": x, "tile_y": y})

    return qt_to_xyz


def raster_vector_join(
    elements: DataFrame,
    rasters: DataFrame,
    zoom: int,
    qt_col: str = "qt",
    broadcast_rasters: bool = True,
    salt: int | None = None,
) -> DataFrame:
    """Join vector elements to raster tiles covering them.

    ``rasters`` has (tile_x, tile_y) at ``zoom`` (+payload columns). The
    element side derives its tile address as a pure JVM expression (rounding
    is bit ops; x/y interleave handled by joining on the rounded cell id
    computed from the raster side instead — one from_tuple on the small
    side beats per-row tuple extraction on the big side).

    Strategy: rasters → cell id via from_tuple (driver/small side), then
    broadcast equi-join on round(qt, zoom). For skewed tiles pass ``salt``
    to split hot cells across ``salt`` sub-keys (explicit skew handling per
    the north rule; AQE handles the residual).
    """
    @pandas_udf("bigint")
    def xyz_to_qt(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            qtk.from_tuple_arr(
                x.to_numpy("int64"), y.to_numpy("int64"), np.full(len(x), zoom, dtype=np.int64)
            )
        )

    r = rasters.withColumn("cell", xyz_to_qt("tile_x", "tile_y"))
    e = elements.withColumn("cell", round_qt_col(F.col(qt_col), zoom))
    if salt:
        # replicate each raster row salt× and scatter elements across salts
        r = r.withColumn("_salt", F.explode(F.array([F.lit(i) for i in range(salt)])))
        e = e.withColumn("_salt", (F.pmod(F.xxhash64(qt_col), F.lit(salt))).cast("int"))
        keys = ["cell", "_salt"]
    else:
        keys = ["cell"]
    rj = F.broadcast(r) if broadcast_rasters else r
    out = e.join(rj, keys)
    return out.drop("_salt") if salt else out


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "point_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Exact kNN baseline: broadcast the (small) query set, squared
    equirectangular-scaled distance entirely in JVM expressions, window
    top-k. Deterministic tie-break on (dist, point_id).

    points: (point_id, lon, lat) fixed-point; queries: (query_id, lon, lat).
    Returns (query_id, point_id, rank). Distance = squared great-circle
    chord approximation on the unit sphere — monotone in true haversine
    distance, so the top-k set matches a haversine oracle.
    """
    p = points.select(
        F.col(id_col),
        F.radians(F.col("lon") * 1e-7).alias("plon"),
        F.radians(F.col("lat") * 1e-7).alias("plat"),
    )
    q = queries.select(
        F.col(qid_col),
        F.radians(F.col("lon") * 1e-7).alias("qlon"),
        F.radians(F.col("lat") * 1e-7).alias("qlat"),
    )
    # squared chord distance: monotone transform of haversine
    joined = p.crossJoin(F.broadcast(q)).withColumn(
        "dist",
        F.pow(F.sin((F.col("plat") - F.col("qlat")) / 2), 2)
        + F.cos("plat") * F.cos("qlat") * F.pow(F.sin((F.col("plon") - F.col("qlon")) / 2), 2),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "rank")
    )


def knn_cell_expansion(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    zoom: int = 8,
    id_col: str = "point_id",
    qid_col: str = "query_id",
    max_rounds: int = 4,
) -> DataFrame:
    """Scale-path kNN: per query, probe a growing square neighborhood of
    level-``zoom`` cells around the query's cell (x wraps at the
    antimeridian), score exactly, and accept only when the k-th hit is
    *provably* closer than anything outside the searched ring (conservative
    spherical lower bound on the ring boundary — mercator distortion makes a
    bare count check unsound near the poles). Unresolved queries after
    ``max_rounds`` doublings fall back to brute force.

    The candidate join is an equi-ish join on tile addresses — prunable and
    broadcastable — versus the brute-force cross join; at 10^12 points only
    this shape is viable.
    """
    xyz = make_xyz_udf(zoom)
    qt_point = make_qt_point_udf(zoom)
    n = 1 << zoom
    p = points.withColumn("_t", xyz(F.col("qt"))).select(
        id_col,
        F.radians(F.col("lon") * 1e-7).alias("plon"),
        F.radians(F.col("lat") * 1e-7).alias("plat"),
        F.col("_t.tile_x").alias("px"),
        F.col("_t.tile_y").alias("py"),
    )

    def _lat_of_tile_row(y: int) -> float:
        """Latitude (deg) of the top edge of tile row y (scale-90 inverse
        mercator of normalized 1 - y*2^(1-zoom))."""
        my = 1.0 - y * (2.0 ** (1 - zoom))
        return qtk.latitude_un_mercator(my * 90.0)

    def _ring_bound_chord(qlon_deg, qlat_deg, qx, qy, radius) -> float:
        """Lower bound (in squared-half-chord units, the scoring metric) on
        the distance from the query to any point OUTSIDE the searched ring."""
        x0, x1 = qx - radius, qx + radius + 1
        y0, y1 = max(qy - radius, 0), min(qy + radius + 1, n)
        bounds = []
        # north/south edges: pure latitude gaps (exact lower bound)
        if qy - radius >= 0:
            bounds.append(abs(_lat_of_tile_row(y0) - qlat_deg))
        if qy + radius + 1 <= n:
            bounds.append(abs(qlat_deg - _lat_of_tile_row(y1)))
        # east/west edges (skip when the ring wraps the full planet);
        # scaled by the smallest cos(lat) in the ring's latitude range
        if 2 * radius + 1 < n:
            lat_top = _lat_of_tile_row(y0)
            lat_bot = _lat_of_tile_row(y1)
            min_cos = min(
                float(np.cos(np.radians(lat_top))), float(np.cos(np.radians(lat_bot)))
            )
            lon_w = -180.0 + x0 * (360.0 / n)
            lon_e = -180.0 + x1 * (360.0 / n)
            dw = abs(qlon_deg - lon_w)
            de = abs(lon_e - qlon_deg)
            bounds.append(min(dw, de) * min_cos)
        if not bounds:
            return float("inf")
        theta = np.radians(max(0.0, min(bounds)))
        return float(np.sin(theta / 2.0) ** 2)

    spark = points.sparkSession
    results = None
    unresolved = [(r[qid_col], r["lon"], r["lat"]) for r in queries.collect()]
    radius = 1
    for _ in range(max_rounds):
        if not unresolved:
            break
        qdf = spark.createDataFrame(unresolved, f"{qid_col} bigint, lon bigint, lat bigint")
        qq = qdf.withColumn("_t", xyz(qt_point(F.col("lon"), F.col("lat")))).select(
            qid_col,
            F.radians(F.col("lon") * 1e-7).alias("qlon"),
            F.radians(F.col("lat") * 1e-7).alias("qlat"),
            F.col("_t.tile_x").alias("qx"),
            F.col("_t.tile_y").alias("qy"),
        )
        dx = F.abs(F.col("px") - F.col("qx"))
        cand = p.join(
            F.broadcast(qq),
            (F.least(dx, F.lit(n) - dx) <= radius)  # x wraps at the antimeridian
            & (F.abs(F.col("py") - F.col("qy")) <= radius),
        )
        scored = cand.withColumn(
            "dist",
            F.pow(F.sin((F.col("plat") - F.col("qlat")) / 2), 2)
            + F.cos("plat") * F.cos("qlat") * F.pow(F.sin((F.col("plon") - F.col("qlon")) / 2), 2),
        )
        w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
        topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        stats = {
            r[0]: (r[1], r[2])
            for r in topk.groupBy(qid_col)
            .agg(F.count(F.lit(1)), F.max("dist"))
            .collect()
        }
        qmeta = {
            r[qid_col]: (r["lon"] * 1e-7, r["lat"] * 1e-7, int(r["qx"]), int(r["qy"]))
            for r in qdf.withColumn("_t", xyz(qt_point(F.col("lon"), F.col("lat"))))
            .select(qid_col, "lon", "lat", F.col("_t.tile_x").alias("qx"), F.col("_t.tile_y").alias("qy"))
            .collect()
        }
        resolved = set()
        for qid, (cnt, kth) in stats.items():
            if cnt >= k:
                qlon_deg, qlat_deg, qx, qy = qmeta[qid]
                if kth <= _ring_bound_chord(qlon_deg, qlat_deg, qx, qy, radius):
                    resolved.add(qid)
        if resolved:
            got = topk.filter(F.col(qid_col).isin(list(resolved))).select(qid_col, id_col, "rank")
            results = got if results is None else results.unionByName(got)
        unresolved = [u for u in unresolved if u[0] not in resolved]
        radius *= 2
    if unresolved:
        qdf = spark.createDataFrame(unresolved, f"{qid_col} bigint, lon bigint, lat bigint")
        fallback = knn_bruteforce(points, qdf, k, id_col, qid_col)
        results = fallback if results is None else results.unionByName(fallback)
    return results


def make_qt_point_udf(max_depth: int):
    @pandas_udf("bigint")
    def qt_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
        v = lon.to_numpy("int64")
        w = lat.to_numpy("int64")
        return pd.Series(qtk.calculate(v, w, v, w, max_depth=max_depth))

    return qt_point
