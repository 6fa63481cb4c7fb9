"""S2 cell kernel property tests (published-algorithm contract): face
placement of axis points, level packing, parent containment across levels,
locality, determinism, and the H3 seam."""

import numpy as np
import pytest

from osmquadtree_spark.kernels import s2


def _fp(deg):
    return np.asarray([int(round(d * 1e7)) for d in deg], dtype=np.int64)


def test_axis_points_land_on_expected_faces():
    # (lon, lat) → unit axis: +x=(0,0), +y=(90,0), +z=(*,90), -x=(180,0),
    # -y=(-90,0), -z=(*,-90)
    lon = _fp([0, 90, 0, 180, -90, 0])
    lat = _fp([0, 0, 90, 0, 0, -90])
    cells = np.asarray(s2.cell_id(lon, lat, 30), dtype=np.uint64)
    faces = (cells >> np.uint64(61)).astype(int)
    assert faces.tolist() == [0, 1, 2, 3, 4, 5]


def test_level_packing_and_trailing_bit():
    lon = _fp([12.3456789])
    lat = _fp([45.6789012])
    for level in (0, 5, 12, 30):
        c = int(np.asarray(s2.cell_id(lon, lat, level), dtype=np.int64)[0])
        lsb = c & -c
        assert lsb == 1 << (2 * (30 - level))
        assert s2.cell_level(np.asarray([c]))[0] == level


def test_parent_containment_chain():
    rng = np.random.default_rng(5)
    lon = rng.integers(-1799000000, 1799000000, 500)
    lat = rng.integers(-890000000, 890000000, 500)
    leaf = s2.cell_id(lon, lat, 30)
    for level in (20, 10, 4, 0):
        direct = s2.cell_id(lon, lat, level)
        via_parent = s2.parent(leaf, level)
        assert np.array_equal(direct, via_parent)


def test_locality_same_cell_for_close_points():
    lon = _fp([10.0, 10.0000001])
    lat = _fp([20.0, 20.0000001])
    a, b = s2.cell_id(lon, lat, 12)
    assert a == b
    # far points at a coarse level differ
    lon2 = _fp([10.0, -120.0])
    lat2 = _fp([20.0, -40.0])
    c, d = s2.cell_id(lon2, lat2, 2)
    assert c != d


def test_all_four_children_partition_parent():
    """Every leaf-ish cell descends from exactly one of the parent's 4
    children — sample a dense local grid and check the child set."""
    base_lon, base_lat = 123000000, 456000000
    lon = np.asarray([base_lon + d for d in range(0, 4000, 40)], dtype=np.int64)
    lat = np.asarray([base_lat + d for d in range(0, 4000, 40)], dtype=np.int64)
    cells10 = s2.cell_id(lon, lat, 10)
    assert len(set(cells10.tolist())) == 1  # tight cluster, one level-10 cell
    cells14 = set(s2.cell_id(lon, lat, 14).tolist())
    assert 1 <= len(cells14) <= 4 ** 4
    for c in cells14:
        assert s2.parent(np.asarray([c]), 10)[0] == cells10[0]


def test_determinism():
    rng = np.random.default_rng(6)
    lon = rng.integers(-1800000000, 1800000000, 1000)
    lat = rng.integers(-900000000, 900000000, 1000)
    a = s2.cell_id(lon, lat, 16)
    b = s2.cell_id(lon.copy(), lat.copy(), 16)
    assert np.array_equal(a, b)


def test_h3_seam_resolves_or_raises():
    """Without the h3 package the seam falls back to the in-repo hexlite
    kernel (and must agree with it exactly); strict mode still raises."""
    try:
        import h3  # noqa: F401

        have_h3 = True
    except ImportError:
        have_h3 = False
    if not have_h3:
        from osmquadtree_spark.kernels import hexlite

        got = s2.h3_cell([123456789, -987654321], [456789123, -123456789], 9)
        want = hexlite.cell_id(
            np.asarray([123456789, -987654321]), np.asarray([456789123, -123456789]), 9
        )
        assert np.array_equal(got, want)
        with pytest.raises(NotImplementedError):
            s2.h3_cell([0], [0], allow_hexlite=False)


def test_h3_adapter_matches_real_package_when_installed():
    """Closes the hexlite seam's correctness story at zero container cost:
    when the real `h3` package is importable (not in this sandbox), the
    adapter must return ITS cell ids bit-for-bit — latlng_to_cell at the
    same resolution, fixed-point degrees scaled by 1e-7. Skipped where h3
    is absent; runnable anywhere the package exists (r3 verdict #7)."""
    h3 = pytest.importorskip("h3")
    from osmquadtree_spark.kernels.s2 import h3_cell

    lons = np.asarray([0, 1800000000 - 1, -1800000000, 1234567890, -987654321])
    lats = np.asarray([0, 900000000 - 1, -900000000, 456789012, -345678901])
    for res in (0, 5, 9, 15):
        got = h3_cell(lons, lats, res, allow_hexlite=False)
        want = np.asarray(
            [
                int(h3.latlng_to_cell(la * 1e-7, lo * 1e-7, res), 16)
                for lo, la in zip(lons, lats)
            ],
            dtype=np.uint64,
        ).astype(np.int64)
        assert (got == want).all()


def test_h3_adapter_strict_raises_without_package():
    """allow_hexlite=False must raise (never silently serve hexlite ids to
    an interop sink) when the real package is absent."""
    try:
        import h3  # noqa: F401

        pytest.skip("h3 installed here; the strict path resolves for real")
    except ImportError:
        pass
    from osmquadtree_spark.kernels.s2 import h3_cell

    with pytest.raises(NotImplementedError):
        h3_cell(np.asarray([0]), np.asarray([0]), 9, allow_hexlite=False)
