"""Multipolygon assembly — relation member ways stitched into closed rings
(/root/reference/src/geometry/multipolygons.cpp).

Reference algorithm (add_to_rings 96-127, extend_rings 129-176, merge_rings
178-186): ways arrive in member order; a way that is already closed becomes
a ring; otherwise it attaches to the FIRST open fragment whose endpoint
matches its first or last node (reversing as needed), else starts a new
fragment; then fragments merge pairwise until a fixpoint. Outer- and
inner-role members assemble separately (make_rings 193-234). The reference
buffers relations per tile subtree and streams (262-460) purely to bound
memory — in Spark the whole stage is one groupBy(rel_id).applyInPandas: the
per-relation stitching is inherently sequential (exactly the UDF-kernel
case), while relations parallelize freely.

Ring areas use the 3857 shoelace (utils.cpp:84-105); assembled outers are
reported with positive (anticlockwise) area regardless of traversal
direction.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

EARTH_WIDTH = 20037508.342789244


def _stitch(parts: list[tuple[list[int], list[tuple[int, int]]]]):
    """parts: [(refs, lonlats)] in member order → (closed rings as point
    lists, open fragment count). Direct restatement of
    add_to_rings/merge_rings; a fragment is (closed, [(refs, pts, reversed)])."""

    def first_point(frag):
        refs, _, rev = frag[0]
        return refs[-1] if rev else refs[0]

    def last_point(frag):
        refs, _, rev = frag[-1]
        return refs[0] if rev else refs[-1]

    rings: list[tuple[bool, list]] = []
    for refs, pts in parts:
        if len(refs) >= 2 and refs[0] == refs[-1]:
            rings.append((True, [(refs, pts, False)]))
            continue
        a, b = refs[0], refs[-1]
        placed = False
        for i, (closed, frag) in enumerate(rings):
            if closed:
                continue
            if a == last_point(frag):
                frag.append((refs, pts, False))
            elif b == last_point(frag):
                frag.append((refs, pts, True))
            elif a == first_point(frag):
                frag.insert(0, (refs, pts, True))
            elif b == first_point(frag):
                frag.insert(0, (refs, pts, False))
            else:
                continue
            rings[i] = (first_point(frag) == last_point(frag), frag)
            placed = True
            break
        if not placed:
            rings.append((False, [(refs, pts, False)]))

    # merge_rings to fixpoint: re-run extend over the open fragments
    changed = True
    while changed:
        changed = False
        nxt: list[tuple[bool, list]] = [r for r in rings if r[0]]
        opens = [r for r in rings if not r[0]]
        for closed, frag in opens:
            a, b = first_point(frag), last_point(frag)
            placed = False
            for i, (c2, f2) in enumerate(nxt):
                if c2:
                    continue
                if a == last_point(f2):
                    f2.extend(frag)
                elif b == last_point(f2):
                    f2.extend((r, p, not v) for r, p, v in reversed(frag))
                elif a == first_point(f2):
                    f2[0:0] = [(r, p, not v) for r, p, v in frag]
                elif b == first_point(f2):
                    f2[0:0] = list(reversed(frag))
                else:
                    continue
                nxt[i] = (first_point(f2) == last_point(f2), f2)
                placed = True
                changed = True
                break
            if not placed:
                nxt.append((closed, frag))
        rings = nxt

    closed_rings = []
    n_open = 0
    for closed, frag in rings:
        if not closed:
            n_open += 1
            continue
        pts: list[tuple[int, int]] = []
        for refs, pp, rev in frag:
            seq = list(reversed(pp)) if rev else list(pp)
            if pts:
                seq = seq[1:]  # shared joint node
            pts.extend(seq)
        closed_rings.append(pts)
    return closed_rings, n_open


def _fwd(lon: int, lat: int):
    x = (lon * 1e-7) * EARTH_WIDTH / 180.0
    y = math.log(math.tan(math.pi * (1.0 + (lat * 1e-7) / 90.0) / 4.0)) * EARTH_WIDTH / math.pi
    return x, y


def ring_area(pts: list[tuple[int, int]]) -> float:
    """Shoelace in 3857, reference accumulation order (utils.cpp:84-105)."""
    if len(pts) < 3:
        return 0.0
    area = 0.0
    last = _fwd(*pts[0])
    for p in pts[1:]:
        cur = _fwd(*p)
        area += last[0] * cur[1]
        area -= last[1] * cur[0]
        last = cur
    return -1.0 * area / 2.0


def ring_centroid(pts: list[tuple[int, int]]) -> tuple[float, float]:
    """calc_ring_centroid (utils.cpp:107-138): cross-weighted vertex fold in
    3857, same accumulation order as the reference (x and y accumulate their
    own sums; area accumulates separately and is halved before the /6)."""
    if not pts:
        return (0.0, 0.0)
    last = _fwd(*pts[0])
    if len(pts) == 1:
        return last
    nxt = _fwd(*pts[1])
    if len(pts) == 2:
        return ((last[0] + nxt[0]) / 2.0, (last[1] + nxt[1]) / 2.0)
    area = 0.0
    x = 0.0
    y = 0.0
    for j in range(1, len(pts)):
        nxt = _fwd(*pts[j])
        cross = last[0] * nxt[1] - nxt[0] * last[1]
        x += (last[0] + nxt[0]) * cross
        y += (last[1] + nxt[1]) * cross
        area += cross
        last = nxt
    area /= 2
    return (x / (area * 6), y / (area * 6))


def assemble_relation(members: list[tuple[str, list[int], list[tuple[int, int]]]]):
    """members: [(role, refs, lonlats)] in member order →
    dict(outers=[pts...], inners=[pts...], n_open=int). Outer rings are
    normalized to positive (anticlockwise) area, inners likewise (holes'
    orientation is a sink concern)."""
    outs, open_o = _stitch([(r, p) for role, r, p in members if role != "inner"])
    inns, open_i = _stitch([(r, p) for role, r, p in members if role == "inner"])

    def norm(rings):
        out = []
        for pts in rings:
            if ring_area(pts) < 0:
                pts = list(reversed(pts))
            out.append(pts)
        return out

    return {"outers": norm(outs), "inners": norm(inns), "n_open": open_o + open_i}


MP_OUT_SCHEMA = (
    "rel_id bigint, n_outers bigint, n_inners bigint, n_open bigint, "
    "outer_area_64k bigint, inner_area_64k bigint, "
    "wkb_n_rings bigint, wkb_n_points bigint, "
    "centroid_x_16 bigint, centroid_y_16 bigint"
)


def multipolygon_wkb(res: dict) -> bytes | None:
    """Assembled rings → MultiPolygon EWKB, the ComplicatedPolygon writer's
    shape (make_multi_wkb, utils.cpp:541-563): one Polygon part per outer
    ring, inner rings attached to the first outer, SRID 4326 header on the
    multi only (parts carry bare headers, as the reference's part writers
    emit without the SRID flag)."""
    from .wkb import multi_wkb, polygon_wkb

    if not res["outers"]:
        return None
    parts = []
    for i, outer in enumerate(res["outers"]):
        rings = [outer] + (res["inners"] if i == 0 else [])
        parts.append(
            polygon_wkb(
                [([p[0] for p in r], [p[1] for p in r]) for r in rings],
                transform=False,
                srid=False,
            )
        )
    return multi_wkb(6, parts, transform=False, srid=True)


def multipolygon_stats(members: DataFrame) -> DataFrame:
    """members: (rel_id, pos, role, refs array<bigint>, lons array<bigint>,
    lats array<bigint>) → per-relation assembly summary. The gated shape:
    ring counts + floor-scaled total areas, PLUS the WKB wiring — the
    assembled rings are encoded as MultiPolygon EWKB and decoded back, and
    the reported ring/point counts come from the DECODED payload, so the
    oracle match also gates the polygon/multi writers. centroid_*_16 =
    floor(first-outer-ring 3857 centroid / 16) (calc_ring_centroid).

    Shape note: relations are many and tiny, so groupBy().applyInPandas
    (one pandas frame per GROUP, ~200µs overhead each) is the wrong tool —
    members are collected into one array row per relation by a JVM
    aggregate and the kernel runs over Arrow BATCHES of relations
    (mapInPandas), which is ~5× faster at 150k relations."""
    from pyspark.sql import functions as F

    from .wkb import multi_counts

    grouped = members.groupBy("rel_id").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "role", "refs", "lons", "lats"))
        ).alias("ms")
    )

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "rel_id", "n_outers", "n_inners", "n_open",
                "outer_area_64k", "inner_area_64k",
                "wkb_n_rings", "wkb_n_points", "centroid_x_16", "centroid_y_16",
            )}
            for rel_id, ms in zip(pdf["rel_id"], pdf["ms"]):
                parts = [
                    (m["role"], list(m["refs"]), list(zip(m["lons"], m["lats"])))
                    for m in ms
                ]
                res = assemble_relation(parts)
                oa = sum(ring_area(p) for p in res["outers"])
                ia = sum(ring_area(p) for p in res["inners"])
                out["rel_id"].append(rel_id)
                out["n_outers"].append(len(res["outers"]))
                out["n_inners"].append(len(res["inners"]))
                out["n_open"].append(res["n_open"])
                out["outer_area_64k"].append(math.floor(oa / 65536.0))
                out["inner_area_64k"].append(math.floor(ia / 65536.0))
                blob = multipolygon_wkb(res)
                if blob is None:
                    out["wkb_n_rings"].append(None)
                    out["wkb_n_points"].append(None)
                else:
                    nr, npts = multi_counts(blob)
                    out["wkb_n_rings"].append(nr)
                    out["wkb_n_points"].append(npts)
                if res["outers"]:
                    cx, cy = ring_centroid(res["outers"][0])
                    out["centroid_x_16"].append(math.floor(cx / 16.0))
                    out["centroid_y_16"].append(math.floor(cy / 16.0))
                else:
                    out["centroid_x_16"].append(None)
                    out["centroid_y_16"].append(None)
            yield pd.DataFrame(out)

    return grouped.mapInPandas(gen, MP_OUT_SCHEMA)
