"""Property-based tests (hypothesis) over the pure kernels — complements
the fixed golden vectors with randomized coverage of the algebraic
invariants the engine relies on.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmquadtree_spark.kernels import quadtree as qtk
from osmquadtree_spark.operators.wkb import (
    decode_linestring,
    decode_multi,
    decode_polygon,
    linestring_wkb,
    multi_wkb,
    polygon_wkb,
)
from osmquadtree_spark.plans.qttree import assign_groups

LON = st.integers(min_value=-1_799_999_999, max_value=1_799_999_999)
LAT = st.integers(min_value=-849_999_999, max_value=849_999_999)

valid_qts = st.integers(min_value=0, max_value=17).flatmap(
    lambda lv: st.integers(min_value=0, max_value=(1 << (2 * lv)) - 1).map(
        lambda path: (path << (63 - 2 * lv)) | lv
    )
)


@given(st.lists(valid_qts, min_size=1, max_size=40), st.lists(valid_qts, max_size=15))
@settings(max_examples=200, deadline=None)
def test_assign_groups_is_deepest_ancestor(qts, groups):
    """find_tile = deepest group that is an ancestor-or-equal, else root —
    brute-force model over random valid cells and group sets."""
    gq = np.unique(np.asarray(sorted(set(groups)), dtype=np.int64))
    got = assign_groups(np.asarray(qts, dtype=np.int64), gq)
    gset = set(int(g) for g in gq)
    for q, g in zip(qts, got.tolist()):
        best = 0
        for lv in range(q & 31, -1, -1):
            anc = qtk.round_scalar(q, lv)
            if anc in gset:
                best = anc
                break
        assert g == best, (q, g, best)


@given(valid_qts, st.integers(min_value=0, max_value=17))
@settings(max_examples=200, deadline=None)
def test_round_is_monotone_projection(qt, lv):
    r = qtk.round_scalar(qt, lv)
    assert (r & 31) == min(qt & 31, lv)
    # idempotent + prefix property
    assert qtk.round_scalar(r, lv) == r
    assert qtk.round_scalar(qt, min(qt & 31, lv)) == r


@given(valid_qts, valid_qts)
@settings(max_examples=200, deadline=None)
def test_common_is_lca(a, b):
    """common(a, b) is an ancestor of both, and no deeper common ancestor
    exists (LCA in the prefix tree)."""
    c = qtk.common_scalar(a, b)
    cl = c & 31
    assert qtk.round_scalar(a, cl) == c and qtk.round_scalar(b, cl) == c
    if cl < min(a & 31, b & 31):
        assert qtk.round_scalar(a, cl + 1) != qtk.round_scalar(b, cl + 1)


@given(st.lists(st.tuples(LON, LAT), min_size=2, max_size=12))
@settings(max_examples=100, deadline=None)
def test_wkb_linestring_roundtrip(pts):
    lons = np.asarray([p[0] for p in pts], dtype=np.int64)
    lats = np.asarray([p[1] for p in pts], dtype=np.int64)
    blob = linestring_wkb(lons.astype(np.float64), lats.astype(np.float64), srid=True)
    srid, xs, ys = decode_linestring(blob)
    assert srid == 4326
    back_lon = np.round(xs * 1e7).astype(np.int64)
    back_lat = np.round(ys * 1e7).astype(np.int64)
    assert np.array_equal(back_lon, lons) and np.array_equal(back_lat, lats)


@given(st.lists(st.tuples(LON, LAT), min_size=3, max_size=8))
@settings(max_examples=100, deadline=None)
def test_wkb_polygon_and_multi_roundtrip(ring):
    ring = ring + [ring[0]]
    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    poly = polygon_wkb([(np.asarray(lons, np.float64), np.asarray(lats, np.float64))])
    srid, rings = decode_polygon(poly)
    assert srid is None and len(rings) == 1 and len(rings[0][0]) == len(ring)
    blob = multi_wkb(6, [poly], srid=True)
    srid2, t, parts = decode_multi(blob)
    assert srid2 == 4326 and t == 6 and len(parts) == 1
    assert len(parts[0][1][0][0]) == len(ring)
