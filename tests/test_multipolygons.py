"""Ring-stitching unit tests (multipolygons.cpp add_to_rings/merge_rings
semantics): reversal, multi-fragment merges, interleaved member order,
open fragments. Full-pipeline parity runs via the multipolygon_assembly
driver-gate query (constructed ground truth)."""

from osmquadtree_spark.operators.multipolygons import (
    _stitch,
    assemble_relation,
    ring_area,
)

# a unit square (fixed-point degrees, ~1e6 ≈ 0.1°)
C = [(0, 0), (1000000, 0), (1000000, 1000000), (0, 1000000)]


def _seg(ids, pts):
    return (ids, pts)


def test_stitch_simple_ring():
    rings, n_open = _stitch([
        _seg([1, 2, 3], [C[0], C[1], C[2]]),
        _seg([3, 4], [C[2], C[3]]),
        _seg([4, 1], [C[3], C[0]]),
    ])
    assert n_open == 0 and len(rings) == 1
    assert rings[0][0] == rings[0][-1] == C[0]
    assert len(rings[0]) == 5


def test_stitch_reversed_segment():
    rings, n_open = _stitch([
        _seg([1, 2, 3], [C[0], C[1], C[2]]),
        _seg([4, 3], [C[3], C[2]]),      # presented reversed
        _seg([1, 4], [C[0], C[3]]),      # also reversed w.r.t. ring direction
    ])
    assert n_open == 0 and len(rings) == 1
    assert rings[0][0] == rings[0][-1]
    assert len(set(rings[0][:-1])) == 4  # all four corners once


def test_stitch_fragment_merge():
    """Segments arriving in an order where no early attachment is possible —
    two fragments form first, then merge_rings joins them."""
    rings, n_open = _stitch([
        _seg([1, 2], [C[0], C[1]]),
        _seg([3, 4], [C[2], C[3]]),      # disconnected from fragment 1
        _seg([2, 3], [C[1], C[2]]),      # bridges them
        _seg([4, 1], [C[3], C[0]]),      # closes
    ])
    assert n_open == 0 and len(rings) == 1
    assert len(rings[0]) == 5


def test_stitch_open_and_closed_mix():
    rings, n_open = _stitch([
        _seg([1, 2, 3, 1], [C[0], C[1], C[2], C[0]]),  # pre-closed triangle
        _seg([10, 11], [(5000000, 0), (6000000, 0)]),  # dangling
    ])
    assert len(rings) == 1 and n_open == 1


def test_assemble_roles_and_orientation():
    outer = [
        ("outer", [1, 2, 3], [C[0], C[1], C[2]]),
        ("outer", [3, 4, 1], [C[2], C[3], C[0]]),
    ]
    inner_pts = [(250000, 250000), (750000, 250000), (750000, 750000), (250000, 250000)]
    inner = [("inner", [5, 6, 7, 5], inner_pts)]
    res = assemble_relation(outer + inner)
    assert len(res["outers"]) == 1 and len(res["inners"]) == 1
    assert res["n_open"] == 0
    # normalized: positive area under the reference formula for both
    assert ring_area(res["outers"][0]) > 0
    assert ring_area(res["inners"][0]) > 0
    assert ring_area(res["outers"][0]) > ring_area(res["inners"][0])


def test_zero_area_ring_centroid_is_null():
    """A closed A->B->A sliver cancels the shoelace exactly: the centroid
    is undefined and must come back as (None, None) — matching Spark SQL's
    x/0.0 -> NULL in the column twin — not ZeroDivisionError (scalar) or a
    floor(NaN) int64 cast (vectorized batch path)."""
    from osmquadtree_spark.operators.multipolygons import ring_centroid

    sliver = [(0, 0), (1000000, 0), (0, 0)]
    assert ring_centroid(sliver) == (None, None)
    # healthy ring still returns real coordinates
    cx, cy = ring_centroid(C + [C[0]])
    assert cx is not None and cy is not None


def test_degenerate_inner_drops_whole_part():
    """check_parts (multipolygons.cpp:248-257): a part with a valid outer
    but ANY attached inner failing is_ring (< 4 points) is dropped
    ENTIRELY — not emitted with the bad inner stripped (r3 advice)."""
    import numpy as np

    from osmquadtree_spark.operators.multipolygons import multipolygon_wkb

    sq = lambda s: (  # closed square ring of size s at origin offset 1e5
        np.asarray([100000, 100000 + s, 100000 + s, 100000, 100000], np.int64),
        np.asarray([100000, 100000, 100000 + s, 100000 + s, 100000], np.int64),
    )
    outer = (
        np.asarray([0, 1000000, 1000000, 0, 0], np.int64),
        np.asarray([0, 0, 1000000, 1000000, 0], np.int64),
    )
    # A→B→A sliver: closed but only 3 points — is_ring fails
    sliver = (
        np.asarray([200000, 300000, 200000], np.int64),
        np.asarray([200000, 200000, 200000], np.int64),
    )
    ok = multipolygon_wkb({"outers": [outer], "inners": [sq(500000)]})
    assert ok is not None
    # same outer, degenerate inner attached → whole part dropped → None
    assert multipolygon_wkb({"outers": [outer], "inners": [sliver]}) is None
    # two parts: the degenerate-inner part drops, the clean one survives as
    # a plain SRID Polygon (single remaining part)
    outer2 = (
        np.asarray([5000000, 6000000, 6000000, 5000000, 5000000], np.int64),
        np.asarray([5000000, 5000000, 6000000, 6000000, 5000000], np.int64),
    )
    two = multipolygon_wkb({"outers": [outer, outer2], "inners": [sliver]})
    assert two == multipolygon_wkb({"outers": [outer2], "inners": []})


def test_vectorized_centroid_is_glibc_exact_rel17125():
    """Regression (found by a full-suite sweep at sf0.1): numpy's SIMD
    float64 ``tan`` differs from glibc by 1 ulp on ~40% of inputs, and the
    centroid fold's cancellation amplified that to ~3e-5 — flipping
    floor(cx/16) for exactly one relation in 60k (rel 17125). The
    projection now routes tan/log through glibc (_tan_glibc/_log_glibc),
    so the vectorized kernel must reproduce the scalar twin (math.tan —
    also glibc, like the DuckDB oracle's std::tan) BITWISE, here on the
    exact coordinates that exposed the flip."""
    import math

    import numpy as np

    from osmquadtree_spark.operators.multipolygons import (
        _first_outer_centroids,
        _ring_metrics,
        ring_centroid,
    )

    # rel 17125's assembled outer ring (stitched, pre-normalization order)
    lons = np.asarray(
        [-1365887125, -1362887125, -1362887125, -1365887125, -1365887125], np.int64
    )
    lats = np.asarray(
        [-308015875, -308015875, -305015875, -305015875, -308015875], np.int64
    )
    lens = np.asarray([len(lons)], np.int64)
    lons_f, lats_f, X, Y, area, offs = _ring_metrics(lons, lats, lens)
    cx, cy = _first_outer_centroids(X, Y, offs, lens, np.array([0]))
    scx, scy = ring_centroid(list(zip(lons_f.tolist(), lats_f.tolist())))
    assert cx[0] == scx and cy[0] == scy  # bitwise, not isclose
    assert math.floor(cx[0] / 16.0) == -949269
    assert math.floor(cy[0] / 16.0) == -224225


def test_projection_pole_latitude_degrades_like_std_log():
    """lat <= -90 (a representable OSM coordinate: a South Pole node) must
    flow through the Mercator projection as -inf/nan exactly like the
    reference's std::log(std::tan(...)) — NOT abort the task with Python's
    math-domain ValueError — and the scalar/vector twins must agree."""
    import numpy as np

    from osmquadtree_spark.operators.multipolygons import _fwd, _project_np

    _, y_pole = _fwd(0, -900000000)
    assert y_pole == float("-inf")
    X, Y = _project_np(
        np.array([0.0, 0.0, 1e7]),
        np.array([-900000000.0, -910000000.0, 0.0]),
    )
    assert Y[0] == float("-inf")
    assert np.isnan(Y[1])  # below the pole: tan < 0 -> log -> nan
    assert np.isfinite(Y[2])
