"""Multipolygon assembly — relation member ways stitched into closed rings
(/root/reference/src/geometry/multipolygons.cpp).

Reference algorithm (add_to_rings 96-127, extend_rings 129-176, merge_rings
178-186): ways arrive in member order; a way that is already closed becomes
a ring; otherwise it attaches to the FIRST open fragment whose endpoint
matches its first or last node (reversing as needed), else starts a new
fragment; then fragments merge pairwise until a fixpoint. Outer- and
inner-role members assemble separately (make_rings 193-234). Inner rings
attach to the FIRST outer part that contains every inner vertex
(ring_contains 237-244, build loop 539-561); orphan inners are dropped; a
part whose outer has < 4 points is invalid and skipped (check_parts
248-257). The reference buffers relations per tile subtree and streams
(262-460) purely to bound memory — in Spark the whole stage is one
collect_list + mapInPandas over relation BATCHES: the per-relation stitch
order is inherently sequential, while relations parallelize freely.

Ring areas use the 3857 shoelace (utils.cpp:84-105); assembled outers are
reported with positive (anticlockwise) area regardless of traversal
direction.

Numeric core: all per-vertex math (mercator projection, shoelace, centroid)
runs VECTORIZED over the whole Arrow batch — rings are flattened into one
coordinate array, projected in four numpy expressions, and the per-ring
folds run through ``_seq_group_sums``, which reproduces the reference's
left-to-right float64 accumulation bit-for-bit (numpy's pairwise
``sum``/``reduceat`` would drift by ~1 ulp per partial and occasionally flip
the floor-scaled gate values). Only the fragment matching (per member) and
the WKB byte concatenation (per relation) stay in Python — both are
per-entity, not per-vertex.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EARTH_WIDTH = 20037508.342789244


# -- stitching (per-member Python; the algorithm is order-sequential) ---------


def _stitch_np(parts):
    """parts: [(a, b, closed, lons, lats)] per member in order, where a/b are
    the first/last node refs and lons/lats are int64 numpy arrays →
    (closed rings as [(lons, lats)] arrays, open fragment count). Direct
    restatement of add_to_rings/merge_rings; a fragment is a list of
    (a, b, lons, lats, reversed)."""

    def first_point(frag):
        a, b, _, _, rev = frag[0]
        return b if rev else a

    def last_point(frag):
        a, b, _, _, rev = frag[-1]
        return a if rev else b

    rings: list[tuple[bool, list]] = []
    for a, b, closed, lons, lats in parts:
        if closed:
            rings.append((True, [(a, b, lons, lats, False)]))
            continue
        placed = False
        for i, (cl, frag) in enumerate(rings):
            if cl:
                continue
            if a == last_point(frag):
                frag.append((a, b, lons, lats, False))
            elif b == last_point(frag):
                frag.append((a, b, lons, lats, True))
            elif a == first_point(frag):
                frag.insert(0, (a, b, lons, lats, True))
            elif b == first_point(frag):
                frag.insert(0, (a, b, lons, lats, False))
            else:
                continue
            rings[i] = (first_point(frag) == last_point(frag), frag)
            placed = True
            break
        if not placed:
            rings.append((False, [(a, b, lons, lats, False)]))

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
                    f2.extend((sa, sb, lo, la, not v) for sa, sb, lo, la, v in reversed(frag))
                elif a == first_point(f2):
                    f2[0:0] = [(sa, sb, lo, la, not v) for sa, sb, lo, la, v in frag]
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

    closed_rings: list[tuple[np.ndarray, np.ndarray]] = []
    n_open = 0
    for closed, frag in rings:
        if not closed:
            n_open += 1
            continue
        lon_parts, lat_parts = [], []
        for _, _, lons, lats, rev in frag:
            lo = lons[::-1] if rev else lons
            la = lats[::-1] if rev else lats
            if lon_parts:
                lo, la = lo[1:], la[1:]  # shared joint node
            lon_parts.append(lo)
            lat_parts.append(la)
        closed_rings.append((np.concatenate(lon_parts), np.concatenate(lat_parts)))
    return closed_rings, n_open


def _seg(refs, lons, lats):
    refs = list(refs)
    closed = len(refs) >= 2 and refs[0] == refs[-1]
    return (
        refs[0],
        refs[-1],
        closed,
        np.asarray(lons, dtype=np.int64),
        np.asarray(lats, dtype=np.int64),
    )


def _stitch(parts: list[tuple[list[int], list[tuple[int, int]]]]):
    """Tuple-list facade over _stitch_np (unit-test / parity surface):
    parts: [(refs, [(lon, lat)])] → (rings as point-tuple lists, n_open)."""
    segs = [
        _seg(refs, [p[0] for p in pts], [p[1] for p in pts]) for refs, pts in parts
    ]
    rings, n_open = _stitch_np(segs)
    return (
        [list(zip(lo.tolist(), la.tolist())) for lo, la in rings],
        n_open,
    )


# -- scalar numeric kernels (the bit-exact parity reference; the batch path
#    below reproduces these through vectorized sequential folds) --------------


def _log_c(v: float) -> float:
    """C-library ``log`` edge semantics: glibc value for v > 0, -inf at 0,
    nan below — std::log (forward.cpp's merc) returns these instead of
    raising, so a lat <= -90 node (tan -> 0 or negative at the Mercator
    pole) flows through as -inf/nan exactly like the reference rather than
    aborting the task with Python's math-domain ValueError."""
    if v > 0.0:
        return math.log(v)
    return float("-inf") if v == 0.0 else float("nan")


def _fwd(lon: int, lat: int):
    x = (lon * 1e-7) * EARTH_WIDTH / 180.0
    y = _log_c(math.tan(math.pi * (1.0 + (lat * 1e-7) / 90.0) / 4.0)) * EARTH_WIDTH / math.pi
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
    if area == 0.0:
        # exactly-cancelling shoelace (e.g. a closed A->B->A sliver): the
        # centroid is undefined — NULL, matching Spark SQL's x/0.0 -> NULL
        # in the column twin (geometry.ring_centroid_cols) rather than a
        # ZeroDivisionError here and ±inf/NaN in the vectorized kernel
        return (None, None)
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


# -- WKB composition (ComplicatedPolygon::Wkb, complicatedpolygon.cpp:124-137)


def _assign_inners(outers, inners):
    """Reference part-building (multipolygons.cpp:539-561): each inner ring
    goes to the FIRST outer whose ring contains every inner vertex
    (ring_contains = all-vertices pnpoly, 237-244); orphans are dropped.
    ``outers``/``inners`` are [(lons, lats)] int64 arrays (or point-tuple
    lists). Returns ([inner-list per outer], n_orphans)."""
    from ..kernels.geom import point_in_poly

    out = [[] for _ in outers]
    polys = None
    n_orphan = 0
    for inner in inners:
        ilons, ilats = _ring_arrays(inner)
        if polys is None:
            polys = [
                list(zip(*(a.tolist() for a in _ring_arrays(o)))) for o in outers
            ]
        placed = False
        for i, poly in enumerate(polys):
            if point_in_poly(poly, ilons, ilats).all():
                out[i].append((ilons, ilats))
                placed = True
                break
        if not placed:
            n_orphan += 1
    return out, n_orphan


def _ring_arrays(ring):
    """Accept either a point-tuple list or an (lons, lats) array pair."""
    if isinstance(ring, tuple) and len(ring) == 2 and isinstance(ring[0], np.ndarray):
        return ring
    return (
        np.asarray([p[0] for p in ring], dtype=np.int64),
        np.asarray([p[1] for p in ring], dtype=np.int64),
    )


def multipolygon_wkb(res: dict) -> bytes | None:
    """Assembled rings → the reference writer's EWKB
    (ComplicatedPolygon::Wkb, complicatedpolygon.cpp:124-137): exactly one
    valid part → a plain SRID Polygon (type 3); several parts → a
    MultiPolygon (type 6, SRID on the multi only, bare part headers); a
    part is (outer + its CONTAINED inners) and is skipped when the outer
    OR ANY attached inner has < 4 points — check_parts (248-257) runs
    is_ring over every inner and drops the WHOLE part on the first
    failure (closedness is guaranteed here: the assembler only emits
    closed rings, multipolygons.py:117-131). No valid parts → None (the
    reference emits no geometry; its type-7 empty form is only reachable
    from a zero-part object, which the build loop never constructs)."""
    from .wkb import multi_wkb, polygon_wkb

    if not res["outers"]:
        return None
    inner_groups, _ = _assign_inners(res["outers"], res["inners"])
    parts = []
    for outer, inns in zip(res["outers"], inner_groups):
        olons, olats = _ring_arrays(outer)
        if len(olons) < 4:
            continue  # check_parts: degenerate outer → part skipped
        inns = [_ring_arrays(i) for i in inns]
        if any(len(il) < 4 for il, _ in inns):
            continue  # check_parts: ANY degenerate attached inner → part skipped
        parts.append([(olons, olats)] + inns)
    if not parts:
        return None
    if len(parts) == 1:
        return polygon_wkb(parts[0], transform=False, srid=True)
    blobs = [polygon_wkb(rings, transform=False, srid=False) for rings in parts]
    return multi_wkb(6, blobs, transform=False, srid=True)


# -- vectorized batch kernel ---------------------------------------------------


def _seq_group_sums(terms, starts, lens, big=512):
    """Per-group left-to-right float64 sums, bit-identical to a scalar
    ``acc += term`` fold (numpy's pairwise summation is NOT — it drifts by
    ulps that the floor-scaled gates can amplify). Short groups accumulate
    stepwise (one vector add per term position, across all groups at once,
    O(max_len) numpy calls); rare long groups fall back to
    ``np.add.accumulate`` (a strictly sequential C loop)."""
    acc = np.zeros(len(starts))
    if not len(starts) or not len(terms):
        return acc
    small = lens <= big
    if small.any():
        s_starts = starts[small]
        s_lens = lens[small]
        sacc = np.zeros(len(s_starts))
        for k in range(int(s_lens.max()) if len(s_lens) else 0):
            m = k < s_lens
            sacc[m] += terms[s_starts[m] + k]
        acc[small] = sacc
    for i in np.flatnonzero(~small):
        acc[i] = np.add.accumulate(terms[starts[i] : starts[i] + lens[i]])[-1]
    return acc


def _tan_glibc(a: np.ndarray) -> np.ndarray:
    """Element-wise glibc ``tan`` (math.tan), NOT np.tan: numpy's SIMD
    float64 tan loop differs from glibc by 1 ulp on ~40% of inputs, and
    the centroid/shoelace folds downstream CANCEL ~1e14 intermediates to
    ~1e10, amplifying that ulp to ~1e-5 absolute — enough to flip a
    floor-scaled driver gate (found as a 1-in-60k mismatch at sf0.1: rel
    17125's centroid_x_16). The scalar twin (math.tan) and the DuckDB
    oracle (std::tan) are BOTH glibc, so glibc is the pinned libm; the
    per-element loop costs ~0.18 s per million vertices."""
    return np.fromiter((math.tan(v) for v in a), dtype=np.float64, count=len(a))


def _log_glibc(a: np.ndarray) -> np.ndarray:
    """Element-wise glibc ``log`` — same pinning rationale as _tan_glibc,
    with C edge semantics (-inf at 0, nan below) via _log_c so a pole
    coordinate degrades like std::log instead of raising (the scalar twin
    uses the same helper, keeping the two paths bit-identical)."""
    return np.fromiter((_log_c(v) for v in a), dtype=np.float64, count=len(a))


def _project_np(lons, lats):
    """_fwd vectorized — same op sequence, with tan/log routed through
    glibc (see _tan_glibc) so results are bit-equal to the scalar kernel
    and to the DuckDB oracle's std::tan/ln."""
    x = (lons * 1e-7) * EARTH_WIDTH / 180.0
    y = (
        _log_glibc(_tan_glibc(np.pi * (1.0 + (lats * 1e-7) / 90.0) / 4.0))
        * EARTH_WIDTH
        / np.pi
    )
    return x, y


def _ring_metrics(ring_lons, ring_lats, ring_lens):
    """Flattened closed rings → (final lons, final lats, final X, final Y,
    per-ring signed area in the FINAL orientation). Rings whose first-pass
    area is negative are reversed (assemble_relation's norm), and the area
    is recomputed over the reversed sequence exactly as the scalar kernel
    re-runs ring_area on the reversed point list (float addition is not
    reversal-symmetric, so the recompute is semantic, not redundant)."""
    total = int(ring_lens.sum())
    offs = np.zeros(len(ring_lens) + 1, dtype=np.int64)
    np.cumsum(ring_lens, out=offs[1:])
    X, Y = _project_np(ring_lons, ring_lats)

    def areas(x, y):
        head = np.ones(total, dtype=bool)
        head[offs[1:] - 1] = False  # last point of each ring starts no edge
        h = np.flatnonzero(head)
        a = x[h] * y[h + 1]
        b = -(y[h] * x[h + 1])
        terms = np.empty(2 * len(h))
        terms[0::2] = a
        terms[1::2] = b
        ecounts = np.maximum(ring_lens - 1, 0)
        estarts = np.zeros(len(ecounts), dtype=np.int64)
        np.cumsum(ecounts[:-1], out=estarts[1:])
        sums = _seq_group_sums(terms, 2 * estarts, 2 * ecounts)
        return np.where(ring_lens >= 3, -1.0 * sums / 2.0, 0.0)

    area_a = areas(X, Y)
    rev = area_a < 0
    if rev.any():
        rid = np.repeat(np.arange(len(ring_lens)), ring_lens)
        pos = np.arange(total) - offs[rid]
        src = np.where(
            rev[rid], offs[rid] + ring_lens[rid] - 1 - pos, np.arange(total)
        )
        ring_lons = ring_lons[src]
        ring_lats = ring_lats[src]
        X = X[src]
        Y = Y[src]
        area = areas(X, Y)
    else:
        area = area_a
    return ring_lons, ring_lats, X, Y, area, offs


def _first_outer_centroids(X, Y, offs, ring_lens, ring_idx):
    """ring_centroid for the selected rings, over the batch-flattened FINAL
    coordinates: per-edge cross/x/y terms are elementwise (same float ops
    as the scalar kernel), the three accumulators fold sequentially."""
    n = len(ring_idx)
    cx = np.zeros(n)
    cy = np.zeros(n)
    if not n:
        return cx, cy
    total = offs[-1]
    head = np.ones(int(total), dtype=bool)
    head[offs[1:] - 1] = False
    h = np.flatnonzero(head)
    cross = X[h] * Y[h + 1] - X[h + 1] * Y[h]
    tx = (X[h] + X[h + 1]) * cross
    ty = (Y[h] + Y[h + 1]) * cross
    ecounts = np.maximum(ring_lens - 1, 0)
    estarts = np.zeros(len(ecounts), dtype=np.int64)
    np.cumsum(ecounts[:-1], out=estarts[1:])
    sel_starts = estarts[ring_idx]
    sel_lens = ecounts[ring_idx]
    sx = _seq_group_sums(tx, sel_starts, sel_lens)
    sy = _seq_group_sums(ty, sel_starts, sel_lens)
    sc = _seq_group_sums(cross, sel_starts, sel_lens)
    lens = ring_lens[ring_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        big = lens >= 3
        half = sc / 2.0
        cx = np.where(big, sx / (half * 6.0), cx)
        cy = np.where(big, sy / (half * 6.0), cy)
    # 1/2-point special cases (reference kernel): point / midpoint
    for j in np.flatnonzero(lens < 3):
        o = int(offs[ring_idx[j]])
        ln = int(lens[j])
        if ln == 1:
            cx[j], cy[j] = X[o], Y[o]
        elif ln == 2:
            cx[j] = (X[o] + X[o + 1]) / 2.0
            cy[j] = (Y[o] + Y[o + 1]) / 2.0
    return cx, cy


MP_OUT_SCHEMA = (
    "rel_id bigint, n_outers bigint, n_inners bigint, n_open bigint, "
    "outer_area_64k bigint, inner_area_64k bigint, "
    "wkb_n_rings bigint, wkb_n_points bigint, "
    "centroid_x_16 bigint, centroid_y_16 bigint"
)


def multipolygon_stats(members: DataFrame) -> DataFrame:
    """members: (rel_id, pos, role, refs array<bigint>, lons array<bigint>,
    lats array<bigint>) → per-relation assembly summary. The gated shape:
    ring counts + floor-scaled total areas, PLUS the WKB wiring — the
    assembled rings are encoded with the reference writer's shape (plain
    SRID Polygon for one part, MultiPolygon for several) and decoded back,
    and the reported ring/point counts come from the DECODED payload, so
    the oracle match also gates the polygon/multi writers. centroid_*_16 =
    floor(first-outer-ring 3857 centroid / 16) (calc_ring_centroid).

    Shape note: relations are many and tiny, so groupBy().applyInPandas
    (one pandas frame per GROUP, ~200µs overhead each) is the wrong tool —
    members are collected into one array row per relation by a JVM
    aggregate and the kernel runs over Arrow BATCHES of relations
    (mapInPandas). Within a batch the stitch is per-member Python (the
    reference algorithm is order-sequential) but ALL per-vertex math —
    projection, shoelace, centroid, WKB coordinate bytes — is vectorized
    across the batch's flattened rings with bit-exact sequential folds
    (_seq_group_sums)."""
    from pyspark.sql import functions as F

    from .wkb import geometry_counts

    grouped = members.groupBy("rel_id").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "role", "refs", "lons", "lats"))
        ).alias("ms")
    )

    def gen(batches):
        for pdf in batches:
            n_rel = len(pdf)
            rel_ids = pdf["rel_id"].to_numpy()
            # 1) stitch (per member)
            rel_outers: list[list] = []
            rel_inners: list[list] = []
            n_open_arr = np.zeros(n_rel, dtype=np.int64)
            for r, ms in enumerate(pdf["ms"]):
                outs_m, inns_m = [], []
                for m in ms:
                    seg = _seg(m["refs"], m["lons"], m["lats"])
                    (inns_m if m["role"] == "inner" else outs_m).append(seg)
                outs, open_o = _stitch_np(outs_m)
                inns, open_i = _stitch_np(inns_m)
                rel_outers.append(outs)
                rel_inners.append(inns)
                n_open_arr[r] = open_o + open_i
            # 2) flatten every ring (outers then inners, per relation)
            ring_lon_parts, ring_lat_parts, ring_lens_l = [], [], []
            n_out = np.asarray([len(o) for o in rel_outers], dtype=np.int64)
            n_inn = np.asarray([len(i) for i in rel_inners], dtype=np.int64)
            for r in range(n_rel):
                for lo, la in rel_outers[r] + rel_inners[r]:
                    ring_lon_parts.append(lo)
                    ring_lat_parts.append(la)
                    ring_lens_l.append(len(lo))
            ring_lens = np.asarray(ring_lens_l, dtype=np.int64)
            if len(ring_lens):
                flat_lons = np.concatenate(ring_lon_parts)
                flat_lats = np.concatenate(ring_lat_parts)
            else:
                flat_lons = np.zeros(0, dtype=np.int64)
                flat_lats = np.zeros(0, dtype=np.int64)
            lons_f, lats_f, X, Y, area, offs = _ring_metrics(
                flat_lons, flat_lats, ring_lens
            )
            # 3) per-relation sums over ring areas (sequential, ring order)
            rel_ring_starts = np.zeros(n_rel, dtype=np.int64)
            np.cumsum((n_out + n_inn)[:-1], out=rel_ring_starts[1:])
            oa = _seq_group_sums(area, rel_ring_starts, n_out)
            ia = _seq_group_sums(area, rel_ring_starts + n_out, n_inn)
            # 4) first-outer centroids
            has_out = n_out > 0
            fo_rings = rel_ring_starts[has_out]  # ring index of first outer
            cx, cy = _first_outer_centroids(X, Y, offs, ring_lens, fo_rings)
            # 5) WKB per relation from the FINAL (normalized) ring arrays
            wkb_rings = np.full(n_rel, -1, dtype=np.int64)
            wkb_points = np.zeros(n_rel, dtype=np.int64)
            for r in range(n_rel):
                s = rel_ring_starts[r]
                outs = [
                    (lons_f[offs[j] : offs[j + 1]], lats_f[offs[j] : offs[j + 1]])
                    for j in range(s, s + n_out[r])
                ]
                inns = [
                    (lons_f[offs[j] : offs[j + 1]], lats_f[offs[j] : offs[j + 1]])
                    for j in range(s + n_out[r], s + n_out[r] + n_inn[r])
                ]
                blob = multipolygon_wkb({"outers": outs, "inners": inns, "n_open": 0})
                if blob is not None:
                    nr, npts = geometry_counts(blob)
                    wkb_rings[r] = nr
                    wkb_points[r] = npts
            out = pd.DataFrame(
                {
                    "rel_id": rel_ids,
                    "n_outers": n_out,
                    "n_inners": n_inn,
                    "n_open": n_open_arr,
                    "outer_area_64k": np.floor(oa / 65536.0).astype(np.int64),
                    "inner_area_64k": np.floor(ia / 65536.0).astype(np.int64),
                    "wkb_n_rings": wkb_rings,
                    "wkb_n_points": wkb_points,
                    "centroid_x_16": np.zeros(n_rel, dtype=np.int64),
                    "centroid_y_16": np.zeros(n_rel, dtype=np.int64),
                }
            )
            out["centroid_x_16"] = out["centroid_x_16"].astype("object")
            out["centroid_y_16"] = out["centroid_y_16"].astype("object")
            # zero-area first outers leave cx/cy non-finite under the
            # suppressed errstate — emit NULL (the scalar twin's and Spark
            # SQL's x/0.0 behavior), never floor(NaN)-cast garbage
            fx, fy = np.floor(cx / 16.0), np.floor(cy / 16.0)
            good = np.isfinite(fx) & np.isfinite(fy)
            xv = np.where(good, fx, 0).astype(np.int64).astype(object)
            yv = np.where(good, fy, 0).astype(np.int64).astype(object)
            xv[~good] = None
            yv[~good] = None
            out.loc[has_out, "centroid_x_16"] = xv
            out.loc[has_out, "centroid_y_16"] = yv
            out.loc[~has_out, "centroid_x_16"] = None
            out.loc[~has_out, "centroid_y_16"] = None
            out["wkb_n_rings"] = out["wkb_n_rings"].astype("object")
            out["wkb_n_points"] = out["wkb_n_points"].astype("object")
            none_w = out["wkb_n_rings"] == -1
            out.loc[none_w, "wkb_n_rings"] = None
            out.loc[none_w, "wkb_n_points"] = None
            yield out

    return grouped.mapInPandas(gen, MP_OUT_SCHEMA)
