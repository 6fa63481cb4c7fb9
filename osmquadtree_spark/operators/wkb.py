"""WKB geometry writers — the reference's PostGIS sink encoding
(/root/reference/src/geometry/utils.cpp:149-175 write_point, 541-563
make_multi_wkb; per-type writers in src/geometry/elements/*.cpp).

Layout (big-endian (E)WKB, matching the reference's write_uint32/
write_double big-endian byte order, fixedint.cpp:28-39, 68-83):
``[0x00][type:uint32 BE, SRID flag 0x20000000 when srid][srid:uint32 BE]?
[payload]``. Coordinates are EPSG:3857 when ``transform`` else raw degrees
(lon*1e-7) — epsg_code(transform) picks 3857/4326 (utils.cpp:46-49).

Encoding is numpy per geometry inside Arrow batches (one `.tobytes()` of a
big-endian float64 array per ring — no per-coordinate Python).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

EARTH_WIDTH = 20037508.342789244
SRID_FLAG = 0x20000000


def _epsg(transform: bool) -> int:
    return 3857 if transform else 4326


def _xy_arrays(lons: np.ndarray, lats: np.ndarray, transform: bool):
    if transform:
        x = (lons * 1e-7) * EARTH_WIDTH / 180.0
        y = np.log(np.tan(math.pi * (1.0 + (lats * 1e-7) / 90.0) / 4.0)) * EARTH_WIDTH / math.pi
    else:
        x = lons * 1e-7
        y = lats * 1e-7
    return x, y


def _header(gtype: int, transform: bool, srid: bool) -> bytes:
    if srid:
        return b"\x00" + struct.pack(">II", gtype | SRID_FLAG, _epsg(transform))
    return b"\x00" + struct.pack(">I", gtype)


def _pts_bytes(lons, lats, transform: bool) -> bytes:
    x, y = _xy_arrays(np.asarray(lons, np.float64), np.asarray(lats, np.float64), transform)
    out = np.empty(2 * len(x), dtype=">f8")
    out[0::2] = x
    out[1::2] = y
    return out.tobytes()


def point_wkb(lon: int, lat: int, transform: bool = False, srid: bool = False) -> bytes:
    return _header(1, transform, srid) + _pts_bytes([lon], [lat], transform)


def linestring_wkb(lons, lats, transform: bool = False, srid: bool = False) -> bytes:
    return (
        _header(2, transform, srid)
        + struct.pack(">I", len(lons))
        + _pts_bytes(lons, lats, transform)
    )


def polygon_wkb(rings, transform: bool = False, srid: bool = False) -> bytes:
    """rings: [(lons, lats)] — first outer, rest inners (closed: first==last)."""
    body = struct.pack(">I", len(rings))
    for lons, lats in rings:
        body += struct.pack(">I", len(lons)) + _pts_bytes(lons, lats, transform)
    return _header(3, transform, srid) + body


def multi_wkb(gtype: int, parts: list[bytes], transform: bool = False, srid: bool = False) -> bytes:
    """make_multi_wkb (utils.cpp:541-563): type 6 = MultiPolygon,
    4 = MultiPoint, 5 = MultiLineString; parts are complete WKB blobs."""
    return _header(gtype, transform, srid) + struct.pack(">I", len(parts)) + b"".join(parts)


# -- decoding (round-trip verification; big-endian as written) ----------------


def _decode_header(data: bytes):
    """→ (geom type low byte, srid or None, payload offset)."""
    if data[0] != 0:
        raise ValueError("not big-endian oqt WKB")
    (tword,) = struct.unpack_from(">I", data, 1)
    pos = 5
    srid = None
    if tword & SRID_FLAG:
        (srid,) = struct.unpack_from(">I", data, pos)
        pos += 4
    return tword & 0xFF, srid, pos


def _decode_pts(data: bytes, pos: int, n: int):
    arr = np.frombuffer(data, dtype=">f8", count=2 * n, offset=pos)
    return arr[0::2].astype(np.float64), arr[1::2].astype(np.float64), pos + 16 * n


def decode_linestring(data: bytes):
    """→ (srid, xs, ys) numpy float64 arrays."""
    t, srid, pos = _decode_header(data)
    if t != 2:
        raise ValueError("not a linestring")
    (n,) = struct.unpack_from(">I", data, pos)
    xs, ys, _ = _decode_pts(data, pos + 4, n)
    return srid, xs, ys


def decode_polygon(data: bytes):
    """→ (srid, [(xs, ys) per ring])."""
    t, srid, pos = _decode_header(data)
    if t != 3:
        raise ValueError("not a polygon")
    (nr,) = struct.unpack_from(">I", data, pos)
    pos += 4
    rings = []
    for _ in range(nr):
        (n,) = struct.unpack_from(">I", data, pos)
        xs, ys, pos = _decode_pts(data, pos + 4, n)
        rings.append((xs, ys))
    return srid, rings


def decode_multi(data: bytes):
    """make_multi_wkb inverse: → (srid, gtype, [decoded parts]); parts are
    whole WKB blobs (utils.cpp:541-563), decoded by their own type."""
    t, srid, pos = _decode_header(data)
    if t not in (4, 5, 6):
        raise ValueError("not a multi geometry")
    (n,) = struct.unpack_from(">I", data, pos)
    pos += 4
    parts = []
    for _ in range(n):
        pt, _, ppos = _decode_header(data[pos:])
        if pt == 1:
            end = ppos + 16
            parts.append(decode_point(data[pos : pos + end]))
        elif pt == 2:
            (np_,) = struct.unpack_from(">I", data, pos + ppos)
            end = ppos + 4 + 16 * np_
            parts.append(decode_linestring(data[pos : pos + end]))
        elif pt == 3:
            (nr,) = struct.unpack_from(">I", data, pos + ppos)
            end = ppos + 4
            for _r in range(nr):
                (np_,) = struct.unpack_from(">I", data, pos + end)
                end += 4 + 16 * np_
            parts.append(decode_polygon(data[pos : pos + end]))
        else:
            raise ValueError(f"unsupported part type {pt}")
        pos += end
    return srid, t, parts


def multi_counts(data: bytes) -> tuple[int, int]:
    """(n_rings, n_points) of a MultiPolygon/Multi blob by walking headers
    only — no float materialization; the cheap form of the decode gate for
    per-relation batch kernels (full decode_multi copies every coordinate)."""
    t, _, pos = _decode_header(data)
    if t not in (4, 5, 6):
        raise ValueError("not a multi geometry")
    (n,) = struct.unpack_from(">I", data, pos)
    pos += 4
    rings = 0
    points = 0
    for _ in range(n):
        pt, _, ppos = _decode_header(data[pos:])
        if pt != 3:
            raise ValueError("multi_counts expects polygon parts")
        (nr,) = struct.unpack_from(">I", data, pos + ppos)
        end = ppos + 4
        for _r in range(nr):
            (np_,) = struct.unpack_from(">I", data, pos + end)
            end += 4 + 16 * np_
            points += np_
        rings += nr
        pos += end
    return rings, points


def geometry_counts(data: bytes) -> tuple[int, int]:
    """(n_rings, n_points) of either WKB shape the reference polygon writer
    emits (ComplicatedPolygon::Wkb, complicatedpolygon.cpp:124-137): a plain
    Polygon (type 3, the one-part case) or a MultiPolygon (type 6). Header
    walk only — no float materialization."""
    t, _, pos = _decode_header(data)
    if t == 3:
        (nr,) = struct.unpack_from(">I", data, pos)
        pos += 4
        points = 0
        for _ in range(nr):
            (np_,) = struct.unpack_from(">I", data, pos)
            pos += 4 + 16 * np_
            points += np_
        return nr, points
    return multi_counts(data)


def decode_point(data: bytes):
    """→ (srid or None, x, y)."""
    if data[0] != 0:
        raise ValueError("not big-endian oqt WKB")
    (tword,) = struct.unpack_from(">I", data, 1)
    pos = 5
    srid = None
    if tword & SRID_FLAG:
        (srid,) = struct.unpack_from(">I", data, pos)
        pos += 4
    if tword & 0xFF != 1:
        raise ValueError("not a point")
    x, y = struct.unpack_from(">dd", data, pos)
    return srid, x, y


def _coord_back(x: float) -> int:
    v = x * 10000000.0
    return int(v + 0.5) if v >= 0 else int(v - 0.5)


def make_point_wkb_udf(transform: bool = False, srid: bool = False):
    @pandas_udf("binary")
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lons = lon.to_numpy("int64")
        lats = lat.to_numpy("int64")
        x, y = _xy_arrays(lons.astype(np.float64), lats.astype(np.float64), transform)
        hdr = _header(1, transform, srid)
        # interleave then slice per row: scalar indexing of a big-endian
        # array yields a NATIVE-endian numpy scalar and would silently
        # re-swap the bytes
        buf = np.empty(2 * len(x), dtype=">f8")
        buf[0::2] = x
        buf[1::2] = y
        return pd.Series([hdr + buf[2 * i : 2 * i + 2].tobytes() for i in range(len(x))])

    return enc


def make_point_decode_udf():
    """(wkb) → struct(lon, lat) back in fixed-point int64 (4326 payloads)."""

    @pandas_udf("struct<lon:bigint,lat:bigint>")
    def dec(b: pd.Series) -> pd.DataFrame:
        lons, lats = [], []
        for blob in b:
            _, x, y = decode_point(bytes(blob))
            lons.append(_coord_back(x))
            lats.append(_coord_back(y))
        return pd.DataFrame({"lon": lons, "lat": lats})

    return dec


def make_linestring_wkb_udf(transform: bool = False, srid: bool = False, ring: bool = False):
    """(lons array<bigint>, lats array<bigint>) → WKB binary. ``ring=True``
    emits a single-ring Polygon (type 3) instead of a Linestring (type 2) —
    the SimplePolygon writer's shape (elements/simplepolygon.cpp)."""

    @pandas_udf("binary")
    def enc(lons: pd.Series, lats: pd.Series) -> pd.Series:
        out = []
        for lo, la in zip(lons, lats):
            lo = np.asarray(lo, dtype=np.float64)
            la = np.asarray(la, dtype=np.float64)
            if ring:
                out.append(polygon_wkb([(lo, la)], transform, srid))
            else:
                out.append(linestring_wkb(lo, la, transform, srid))
        return pd.Series(out)

    return enc


def make_line_decode_udf(ring: bool = False):
    """(wkb) → struct(n_pts, lons array<bigint>, lats array<bigint>) back in
    fixed-point (4326 payloads; for ``ring`` decodes the first polygon
    ring)."""

    @pandas_udf("struct<n_pts:int,lons:array<bigint>,lats:array<bigint>>")
    def dec(b: pd.Series) -> pd.DataFrame:
        ns, lons, lats = [], [], []
        for blob in b:
            if ring:
                _, rings = decode_polygon(bytes(blob))
                xs, ys = rings[0]
            else:
                _, xs, ys = decode_linestring(bytes(blob))
            ns.append(len(xs))
            lons.append([_coord_back(x) for x in xs])
            lats.append([_coord_back(y) for y in ys])
        return pd.DataFrame({"n_pts": ns, "lons": lons, "lats": lats})

    return dec


def points_roundtrip(nodes: DataFrame) -> DataFrame:
    """(node_id, lon, lat) → encode 4326 point WKB → decode → coordinates;
    the identity on fixed-point coords (float64 holds 1e9-scale ints
    exactly, and coordinate_as_integer inverts the 1e-7 scaling)."""
    from pyspark.sql import functions as F

    enc = make_point_wkb_udf(transform=False, srid=True)
    dec = make_point_decode_udf()
    out = nodes.withColumn("_w", enc("lon", "lat")).withColumn("_d", dec("_w"))
    return out.select(
        "node_id", F.col("_d.lon").alias("lon"), F.col("_d.lat").alias("lat")
    )
