"""S2 cell ids — vectorized numpy implementation of the published S2
geometry cell scheme (public algorithm: cube-face projection, quadratic
ST transform, per-face Hilbert curve; s2geometry.io/devguide/s2cell_hierarchy).

The engine's primary index is the reference's quadtree int64; S2 ids are
the secondary cell column the north rule names ("quadtree/H3/S2"). An H3
adapter seam exists in functions/udfs-style form: `h3_cell` raises unless
the (absent here) `h3` package is importable — the S2 path below is fully
self-contained.

Cell id layout (canonical): 3 face bits, 2·level Hilbert position bits,
then a trailing 1 bit followed by zeros; level 30 is the leaf. The
Hilbert traversal uses the standard 4-orientation lookup tables
(swap/invert masks).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_N = 1 << MAX_LEVEL  # ij range

SWAP, INVERT = 1, 2
# position-in-parent → child orientation delta
POS_TO_ORIENTATION = np.asarray([SWAP, 0, 0, INVERT | SWAP], dtype=np.int64)
# orientation → (i<<1|j) → hilbert position
IJ_TO_POS = np.asarray(
    [
        [0, 1, 3, 2],
        [0, 3, 1, 2],
        [2, 3, 1, 0],
        [2, 1, 3, 0],
    ],
    dtype=np.int64,
)


def _xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lam = np.deg2rad(lon_deg)
    phi = np.deg2rad(lat_deg)
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face, u, v


def _st(u):
    # quadratic projection (the s2 default); both branches evaluate, so the
    # unselected sqrt of a negative is expected — silence it
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _ij(s):
    return np.clip((s * _N).astype(np.int64), 0, _N - 1)


def cell_id(lon_fp: np.ndarray, lat_fp: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Fixed-point 1e-7° lon/lat → int64 S2 cell id at ``level``."""
    lon = np.asarray(lon_fp, dtype=np.float64) * 1e-7
    lat = np.asarray(lat_fp, dtype=np.float64) * 1e-7
    x, y, z = _xyz(lon, lat)
    face, u, v = _face_uv(x, y, z)
    i = _ij(_st(u))
    j = _ij(_st(v))

    n = face.astype(np.uint64) << np.uint64(60)
    orient = face & SWAP
    for k in range(MAX_LEVEL - 1, -1, -1):
        ib = (i >> k) & 1
        jb = (j >> k) & 1
        ij = (ib << 1) | jb
        pos = IJ_TO_POS[orient, ij]
        n |= pos.astype(np.uint64) << np.uint64(2 * k)
        orient = orient ^ POS_TO_ORIENTATION[pos]
    leaf = (n << np.uint64(1)) | np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf.astype(np.int64)
    return parent(leaf.astype(np.int64), level)


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor of a cell at a coarser level: truncate below the coarser
    trailing-one bit, then set it (canonical lsb manipulation)."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((c & ~((lsb << np.uint64(1)) - np.uint64(1))) | lsb).astype(np.int64)


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the trailing-one position."""
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & -c
    # lsb = 2^(2*(30-level)) → level = 30 - log2(lsb)/2
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) // 2)).astype(np.int64)


def h3_cell(lon_fp, lat_fp, resolution: int = 9, allow_hexlite: bool = True):
    """Hex-index adapter: resolves through the real `h3` package when
    installed; otherwise falls back to the in-repo pure-numpy aperture-7
    hexlite kernel (kernels/hexlite.py — same hierarchy algebra, planar
    projection, different cell VALUES; see its module docstring). Pass
    ``allow_hexlite=False`` to require real-H3 ids (raises when the
    package is absent, e.g. to guard an interop sink)."""
    try:
        import h3  # noqa: F401
    except ImportError as e:
        if allow_hexlite:
            from . import hexlite

            return hexlite.cell_id(lon_fp, lat_fp, resolution)
        raise NotImplementedError("h3 package not available in this container") from e
    import h3 as _h3

    return np.asarray(
        [
            int(_h3.latlng_to_cell(la * 1e-7, lo * 1e-7, resolution), 16)
            for lo, la in zip(np.asarray(lon_fp), np.asarray(lat_fp))
        ],
        dtype=np.uint64,
    ).astype(np.int64)
