"""Hexlite (aperture-7 hex index) kernel tests: vectorized vs scalar
oracle, decode round-trip, parent consistency, and grid_disk geometry.
No Spark needed — the kernel is plain numpy (it runs inside the same
mapInPandas stages as the quadtree/S2 kernels)."""

import numpy as np
import pytest

from osmquadtree_spark.kernels import hexlite as hx


def _random_points(n, seed):
    rng = np.random.default_rng(seed)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, n)
    lat = rng.integers(-900_000_000, 900_000_000, n)
    return lon, lat


@pytest.mark.parametrize("res", [0, 1, 5, 9, hx.RES_MAX])
def test_vector_matches_scalar_oracle(res):
    lon, lat = _random_points(500, 7 + res)
    vec = hx.cell_id(lon, lat, res)
    for i in range(len(lon)):
        assert int(vec[i]) == hx.cell_id_scalar(int(lon[i]), int(lat[i]), res), i


def test_decode_round_trip():
    lon, lat = _random_points(2000, 3)
    for res in (0, 4, 9, hx.RES_MAX):
        cells = hx.cell_id(lon, lat, res)
        dres, q, r = hx.cell_to_axial(cells)
        assert np.all(dres == res)
        # re-encode the decoded axial → identical ids
        assert np.array_equal(hx._pack_axial(q, r, res), cells)
        # and the decoded axial is the direct cube-round assignment
        q2, r2 = hx.axial_cell(lon, lat, res)
        assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_parent_is_up_chain():
    """Bit-surgery parent() == the up_ap7 chain on decoded coords (the
    digits ARE the chain, so truncation must agree), and matches the
    scalar oracle's coarser assignment of the SAME cell center."""
    lon, lat = _random_points(2000, 11)
    cells = hx.cell_id(lon, lat, 9)
    par = hx.parent(cells, 7)
    _, q, r = hx.cell_to_axial(cells)
    for _ in range(2):
        q, r = hx.up_ap7(q, r)
    assert np.array_equal(hx._pack_axial(q, r, 7), par)
    assert np.all(hx.cell_res(par) == 7)


def test_digit_residual_always_unit():
    """The aperture-7 residual (child − down(up(child))) must always be the
    center or one of the six unit moves — the |c|·circumradius < √3 bound;
    an out-of-table residual would decode to digit −1 and corrupt ids."""
    rng = np.random.default_rng(5)
    q = rng.integers(-10**6, 10**6, 5000)
    r = rng.integers(-10**6, 10**6, 5000)
    pq, pr = hx.up_ap7(q, r)
    cq, cr = hx.down_ap7(pq, pr)
    dd = (q - cq + 1) * 3 + (r - cr + 1)
    assert dd.min() >= 0 and dd.max() < 9
    assert np.all(hx._DIGIT_OF[dd] >= 0)


def test_point_containment_mostly_nested():
    """Hex hierarchies are not perfectly nested (true of H3 too): a point's
    res-8 cell's parent usually — not always — equals its res-7 cell.
    Pin the behavior: exact match on the vast majority, and every mismatch
    is an adjacent (distance-1) cell."""
    lon, lat = _random_points(5000, 13)
    c8 = hx.cell_id(lon, lat, 8)
    c7_direct = hx.cell_id(lon, lat, 7)
    c7_parent = hx.parent(c8, 7)
    same = c7_direct == c7_parent
    assert same.mean() > 0.7
    _, qd, rd = hx.cell_to_axial(c7_direct[~same])
    _, qp, rp = hx.cell_to_axial(c7_parent[~same])
    dq = qd - qp
    dr = rd - rp
    hexdist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
    if hexdist.size:
        assert hexdist.max() == 1


def test_grid_disk():
    lon, lat = _random_points(50, 17)
    cells = hx.cell_id(lon, lat, 6)
    disk = hx.grid_disk(cells, 1)
    assert disk.shape == (50, 7)
    for i in range(50):
        assert len(set(disk[i].tolist())) == 7
        assert int(cells[i]) in disk[i].tolist()
    # k=2 ring count
    disk2 = hx.grid_disk(cells[:5], 2)
    assert disk2.shape == (5, 19)


def test_resolution_area_scaling():
    """Aperture 7: res r+1 cells are ~1/7 the area — count distinct cells
    over a dense point cloud and check the ratio. Res 3→4 keeps the finer
    level dense (≥6 points/cell) so sampling saturation doesn't bias the
    ratio low."""
    rng = np.random.default_rng(23)
    lon = rng.integers(-200_000_000, 200_000_000, 40000)
    lat = rng.integers(-200_000_000, 200_000_000, 40000)
    n3 = len(np.unique(hx.cell_id(lon, lat, 3)))
    n4 = len(np.unique(hx.cell_id(lon, lat, 4)))
    assert 4.5 < n4 / n3 < 9.5
