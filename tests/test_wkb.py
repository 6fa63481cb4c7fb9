"""WKB writer golden vectors — the byte layout the reference's PostGIS sink
emits (big-endian, EWKB SRID flag; utils.cpp:149-175, 541-563,
fixedint.cpp big-endian writers). The encode∘decode identity runs at table
scale through the wkb_roundtrip driver-gate query."""

import struct

from osmquadtree_spark.operators import wkb


def test_point_golden():
    # (1.0°, 2.0°) no srid, no transform: 00 | 00000001 | 3ff0.. | 4000..
    b = wkb.point_wkb(10000000, 20000000)
    assert b.hex() == "00" + "00000001" + "3ff0000000000000" + "4000000000000000"


def test_point_srid_golden():
    b = wkb.point_wkb(10000000, 20000000, transform=False, srid=True)
    # SRID flag 0x20000000 | type 1, then srid 4326 = 0x10E6
    assert b.hex().startswith("00" + "20000001" + "000010e6")
    assert len(b) == 25  # the reference's Point::Wkb srid size (point.cpp)


def test_point_3857():
    b = wkb.point_wkb(1800000000, 0, transform=True, srid=True)
    srid, x, y = wkb.decode_point(b)
    assert srid == 3857
    assert abs(x - wkb.EARTH_WIDTH) < 1e-6  # lon 180° → earth_width metres
    assert y == 0.0


def test_linestring_and_polygon_layout():
    lons = [0, 10000000]
    lats = [0, 0]
    ls = wkb.linestring_wkb(lons, lats)
    assert ls[0] == 0
    assert struct.unpack_from(">I", ls, 1)[0] == 2
    assert struct.unpack_from(">I", ls, 5)[0] == 2  # npoints
    assert len(ls) == 9 + 2 * 16

    ring = ([0, 10000000, 10000000, 0], [0, 0, 10000000, 0])
    pg = wkb.polygon_wkb([ring], srid=True)
    assert struct.unpack_from(">I", pg, 1)[0] == (3 | wkb.SRID_FLAG)
    assert struct.unpack_from(">I", pg, 5)[0] == 4326
    assert struct.unpack_from(">I", pg, 9)[0] == 1   # nrings
    assert struct.unpack_from(">I", pg, 13)[0] == 4  # npoints


def test_multi_wkb_layout():
    p1 = wkb.polygon_wkb([([0, 1, 1, 0], [0, 0, 1, 0])])
    p2 = wkb.polygon_wkb([([5, 6, 6, 5], [5, 5, 6, 5])])
    m = wkb.multi_wkb(6, [p1, p2])
    assert struct.unpack_from(">I", m, 1)[0] == 6
    assert struct.unpack_from(">I", m, 5)[0] == 2
    assert m[9:] == p1 + p2


def test_roundtrip_exact():
    for lon, lat in [(0, 0), (-1799999999, 849999999), (123456789, -987654321)]:
        srid, x, y = wkb.decode_point(wkb.point_wkb(lon, lat, srid=True))
        assert (wkb._coord_back(x), wkb._coord_back(y)) == (lon, lat)
        assert srid == 4326
