"""Hexlite: a pure-numpy aperture-7 hexagonal hierarchical cell index —
the in-repo hex option of the secondary index family ("quadtree/H3/S2").

This is H3-LITE, not H3: it reproduces the algorithmically interesting
content of the published H3 scheme — axial/cube hex coordinates, cube
rounding, an aperture-7 parent/child hierarchy (each finer resolution is
1/7 the area, rotated by asin(sqrt(3/28)) ≈ 19.107°), per-resolution
3-bit digits packed H3-style into an int64 — over a PLANAR lon/lat
projection instead of H3's icosahedral gnomonic faces, and with a
constant-handed aperture rotation instead of H3's Class II/III
alternation. Cell VALUES therefore do not match the `h3` package; the
`kernels/s2.py h3_cell` seam still resolves to the real package when one
is installed. Everything here is self-contained, vectorized, and pinned
by a scalar-oracle pytest (tests/test_hexlite.py).

Math: axial coordinates (q, r) are Eisenstein integers z = q + r·λ
(λ = exp(iπ/3), so the six lattice units are ±1, ±λ, ±(λ-1) — exactly
the standard axial neighbor set (1,0),(0,1),(-1,1),(-1,0),(0,-1),(1,-1));
the aperture-7 sub-lattice embedding is multiplication by c = 2 + λ
(norm c·c̄ = 7, arg c = 19.107°):

    down(q, r) = (2q - r,  q + 3r)          # parent center in child coords
    up(Q, R)   = cube_round((3Q + R)/7, (2R - Q)/7)

A fixed point's fractional axial coords at resolution k are its res-0
coords times c^k (complex multiplication), so cell assignment at any
resolution is one complex multiply + cube round — no per-level loop over
the data.

Cell id layout (int64, H3-flavored): [0|mode=1 (4b)|res (4b)|base (12b)|
12 × 3b digits], unused digits set to 7 (the H3 convention). Base cells
are the res-0 hexagons of the ±180°×±90° domain, enumerated
deterministically; RES_MAX = 12 (≈14 m hexagons at s0 = 15°).
"""

from __future__ import annotations

import numpy as np

S0_DEG = 15.0  # res-0 hex size (circumradius scale unit, degrees)
RES_MAX = 12
MODE = 1
_SQRT3 = np.sqrt(3.0)
# aperture-7 multiplier c = 2 + λ as a complex number; λ = 1/2 + i·√3/2
_C = complex(2.5, _SQRT3 / 2.0)

# unit moves in axial coords → digit (0 = center, 1..6 = the six
# neighbors, enumerated deterministically); inverse table for decode
_DIGIT_OF = np.full(9, -1, dtype=np.int64)
_UNITS = [(0, 0), (1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)]
for _d, (_dq, _dr) in enumerate(_UNITS):
    _DIGIT_OF[(_dq + 1) * 3 + (_dr + 1)] = _d
_UNIT_Q = np.asarray([u[0] for u in _UNITS], dtype=np.int64)
_UNIT_R = np.asarray([u[1] for u in _UNITS], dtype=np.int64)


def cube_round(qf, rf):
    """Fractional axial → nearest hex center (standard cube rounding,
    vectorized; np.round = ties-to-even in both this and the scalar
    oracle)."""
    qf = np.asarray(qf, dtype=np.float64)
    rf = np.asarray(rf, dtype=np.float64)
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _axial_frac(lon_deg, lat_deg, res: int):
    """Planar lon/lat → fractional axial coords at ``res`` (one complex
    multiply by c^res from the res-0 frame)."""
    x = np.asarray(lon_deg, dtype=np.float64) / S0_DEG
    y = np.asarray(lat_deg, dtype=np.float64) / S0_DEG
    # planar → res-0 fractional axial (pointy-top basis)
    q0 = (_SQRT3 / 3.0) * x - (1.0 / 3.0) * y
    r0 = (2.0 / 3.0) * y
    # axial (q, r) as the complex number q + r·λ
    z = (q0 + r0 * 0.5) + 1j * (r0 * (_SQRT3 / 2.0))
    zk = z * (_C ** res)
    rk = zk.imag / (_SQRT3 / 2.0)
    qk = zk.real - 0.5 * rk
    return qk, rk


def down_ap7(q, r):
    """Parent center in child-resolution axial coords: multiply by c."""
    return 2 * q - r, q + 3 * r


def up_ap7(q, r):
    """Child axial → containing parent cell: divide by c, cube round."""
    return cube_round((3 * q + r) / 7.0, (2 * r - q) / 7.0)


def axial_cell(lon_fp, lat_fp, res: int):
    """Fixed-point 1e-7° lon/lat → integer axial (q, r) at ``res``."""
    lon = np.asarray(lon_fp, dtype=np.float64) * 1e-7
    lat = np.asarray(lat_fp, dtype=np.float64) * 1e-7
    return cube_round(*_axial_frac(lon, lat, res))


def _digits_up(q, r, res: int):
    """res-level axial → (base q0, r0, [digit_1..digit_res]) via the
    up-chain: digit_k = child − down(parent) at level k."""
    digits = []
    for _ in range(res):
        pq, pr = up_ap7(q, r)
        cq, cr = down_ap7(pq, pr)
        dd = (q - cq + 1) * 3 + (r - cr + 1)
        digits.append(_DIGIT_OF[dd])
        q, r = pq, pr
    digits.reverse()
    return q, r, digits


# base-cell field: res-0 axial packed as two 6-bit offsets (the ±180×±90
# domain spans |q0| ≤ 16, |r0| ≤ 8 — margin to 31)
_B_OFF = 32


def _base_id(q0, r0):
    bad = (np.abs(q0) >= _B_OFF) | (np.abs(r0) >= _B_OFF)
    if np.any(bad):
        raise ValueError("point outside the hexlite base-cell domain")
    return (q0 + _B_OFF) * 64 + (r0 + _B_OFF)


def cell_id(lon_fp, lat_fp, res: int = 9) -> np.ndarray:
    """Fixed-point 1e-7° lon/lat → int64 hexlite cell id at ``res`` —
    axial cell, then the one canonical id packing (``_pack_axial``, shared
    with grid_disk so the two can never emit divergent layouts)."""
    if not 0 <= res <= RES_MAX:
        raise ValueError(f"res must be 0..{RES_MAX}")
    q, r = axial_cell(lon_fp, lat_fp, res)
    return _pack_axial(q, r, res)


def cell_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(51)) & np.int64(15)


def cell_to_axial(cell):
    """int64 cell id → (res, q, r) — exact inverse of cell_id's packing
    (down-chain + digit adds)."""
    c = np.asarray(cell, dtype=np.int64)
    res = cell_res(c)
    if np.any(res > RES_MAX):
        raise ValueError("bad resolution field")
    base = (c >> np.int64(3 * RES_MAX)) & np.int64(0xFFF)
    q = base // 64 - _B_OFF
    r = base % 64 - _B_OFF
    rmax = int(res.max()) if c.size else 0
    for k in range(rmax):
        active = k < res
        d = (c >> np.int64(3 * (RES_MAX - 1 - k))) & np.int64(7)
        dq, dr = down_ap7(q, r)
        q = np.where(active, dq + _UNIT_Q[np.where(active, d, 0)], q)
        r = np.where(active, dr + _UNIT_R[np.where(active, d, 0)], r)
    return res, q, r


def parent(cell, res: int) -> np.ndarray:
    """Ancestor at coarser ``res``: truncate digits (set to 7), rewrite the
    res field — pure bit surgery, consistent with the up-chain by
    construction."""
    c = np.asarray(cell, dtype=np.int64)
    cur = cell_res(c)
    if np.any(cur < res):
        raise ValueError("parent res must be coarser")
    out = c & ~(np.int64(15) << np.int64(51))
    out = out | (np.int64(res) << np.int64(51))
    for k in range(res, RES_MAX):
        out = out | (np.int64(7) << np.int64(3 * (RES_MAX - 1 - k)))
    return out


def grid_disk(cell, k: int = 1) -> np.ndarray:
    """All cells within hex distance ``k`` of each input cell (same res) —
    shape (n, 3k²+3k+1). The kNN/cell-expansion primitive."""
    res, q, r = cell_to_axial(cell)
    if res.size and np.any(res != res.flat[0]):
        raise ValueError("grid_disk needs a single resolution")
    moves = [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]
    rr = int(res.flat[0]) if res.size else 0
    cols = []
    for dq, dr in moves:
        cols.append(_pack_axial(q + dq, r + dr, rr))
    return np.stack(cols, axis=1)


def _pack_axial(q, r, res: int) -> np.ndarray:
    q0, r0, digits = _digits_up(q, r, res)
    out = (
        (np.int64(MODE) << np.int64(55))
        | (np.int64(res) << np.int64(51))
        | (_base_id(q0, r0).astype(np.int64) << np.int64(3 * RES_MAX))
    )
    for k, d in enumerate(digits):
        out = out | (d.astype(np.int64) << np.int64(3 * (RES_MAX - 1 - k)))
    for k in range(res, RES_MAX):
        out = out | (np.int64(7) << np.int64(3 * (RES_MAX - 1 - k)))
    return out


# ---------------------------------------------------------------------------
# scalar oracle (pure python floats/ints, same operation sequence) — the
# pytest parity surface


def cell_id_scalar(lon_fp: int, lat_fp: int, res: int = 9) -> int:
    lon = lon_fp * 1e-7
    lat = lat_fp * 1e-7
    x = lon / S0_DEG
    y = lat / S0_DEG
    q0 = (float(_SQRT3) / 3.0) * x - (1.0 / 3.0) * y
    r0 = (2.0 / 3.0) * y
    z = complex(q0 + r0 * 0.5, r0 * (float(_SQRT3) / 2.0))
    zk = z * (_C ** res)
    rf = zk.imag / (float(_SQRT3) / 2.0)
    qf = zk.real - 0.5 * rf
    sf = -qf - rf
    # ties-to-even float rounding, matching np.round
    q = float(np.round(qf))
    r = float(np.round(rf))
    s = float(np.round(sf))
    dq, dr, ds = abs(q - qf), abs(r - rf), abs(s - sf)
    if dq > dr and dq > ds:
        q = -r - s
    elif dr > ds:
        r = -q - s
    q, r = int(q), int(r)
    digits = []
    for _ in range(res):
        pqf, prf = (3 * q + r) / 7.0, (2 * r - q) / 7.0
        psf = -pqf - prf
        pq = float(np.round(pqf))
        pr = float(np.round(prf))
        ps = float(np.round(psf))
        ddq, ddr, dds = abs(pq - pqf), abs(pr - prf), abs(ps - psf)
        if ddq > ddr and ddq > dds:
            pq = -pr - ps
        elif ddr > dds:
            pr = -pq - ps
        pq, pr = int(pq), int(pr)
        cq, cr = 2 * pq - pr, pq + 3 * pr
        digits.append(int(_DIGIT_OF[(q - cq + 1) * 3 + (r - cr + 1)]))
        q, r = pq, pr
    digits.reverse()
    assert abs(q) < _B_OFF and abs(r) < _B_OFF
    out = (MODE << 55) | (res << 51) | (((q + _B_OFF) * 64 + (r + _B_OFF)) << (3 * RES_MAX))
    for k, d in enumerate(digits):
        out |= d << (3 * (RES_MAX - 1 - k))
    for k in range(res, RES_MAX):
        out |= 7 << (3 * (RES_MAX - 1 - k))
    return out
