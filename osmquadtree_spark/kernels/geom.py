"""Planar geometry kernels on fixed-point int64 lon/lat.

pnpoly / segment-side semantics match the reference
(/root/reference/src/utils/geometry.cpp:30-159): the crossing test runs in
float64 (the reference promotes the int64 coords to double before the
division), segment orientation in exact int64. Vectorized over point arrays
against a driver-broadcast polygon; plus an ANSI-SQL generator for a fixed
polygon so DuckDB oracles compute the identical predicate.
"""

from __future__ import annotations

import numpy as np

Polygon = list[tuple[int, int]]  # [(lon, lat)] fixed-point int64, open ring


def point_in_poly(poly: Polygon, lons, lats) -> np.ndarray:
    """Vectorized pnpoly crossing test (geometry.cpp:30-80). ``poly`` is the
    vertex list (not closed); < 3 vertices → all False."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if len(poly) < 3:
        return np.zeros(lons.shape, dtype=bool)
    c = np.zeros(lons.shape, dtype=bool)
    j = len(poly) - 1
    for i in range(len(poly)):
        loni, lati = float(poly[i][0]), float(poly[i][1])
        lonj, latj = float(poly[j][0]), float(poly[j][1])
        cond = (lati > lats) != (latj > lats)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = (lonj - loni) * (lats - lati) / (latj - lati) + loni
        c = np.where(cond & (lons < xi), ~c, c)
        j = i
    return c


def point_in_poly_sql(poly: Polygon, lon_expr: str, lat_expr: str) -> str:
    """The same crossing test unrolled into SQL for a *fixed* polygon —
    identical float64 ops, so results match the kernel bit-for-bit."""
    if len(poly) < 3:
        return "FALSE"
    terms = []
    j = len(poly) - 1
    for i in range(len(poly)):
        loni, lati = float(poly[i][0]), float(poly[i][1])
        lonj, latj = float(poly[j][0]), float(poly[j][1])
        terms.append(
            f"(CASE WHEN (({lati!r} > ({lat_expr})) != ({latj!r} > ({lat_expr})))"
            f" AND (({lon_expr}) < ({lonj!r} - {loni!r}) * (({lat_expr}) - {lati!r})"
            f" / ({latj!r} - {lati!r}) + {loni!r}) THEN 1 ELSE 0 END)"
        )
        j = i
    return f"((({' + '.join(terms)}) % 2) = 1)"


def segment_side(p1, p2, q) -> np.ndarray:
    """Exact int64 orientation (geometry.cpp:83-89); inputs are (lon, lat)
    pairs of arrays or scalars. Python ints avoid overflow; numpy use sites
    must pre-cast to object or keep coords < 2^31 so products fit int64."""
    (x1, y1), (x2, y2), (qx, qy) = p1, p2, q
    side = (qx - x1) * (y2 - y1) - (x2 - x1) * (qy - y1)
    return np.sign(side)


def segment_intersects(p1, p2, q1, q2) -> np.ndarray:
    """geometry.cpp:92-101 — proper + improper crossing via orientation."""
    pq1 = segment_side(p1, p2, q1)
    pq2 = segment_side(p1, p2, q2)
    qp1 = segment_side(q1, q2, p1)
    qp2 = segment_side(q1, q2, p2)
    return (pq1 != pq2) & (qp1 != qp2)


def box_overlaps(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Closed-interval bbox overlap (bbox.hpp:41-44 semantics)."""
    return (
        (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
    )
