""".poly polygon file source (Osmosis polygon filter format).

Reference reader: /root/reference/example/oqt_main.cpp:82-121 (single ring,
no holes — "multiple rings??" is an error there) and the float coordinate
parse in readpoly_coord. This reader accepts the full Osmosis format
(multiple sections, ``!``-prefixed holes) but exposes the same
single-outer-ring accessor the reference uses; coordinates land as
fixed-point int64 1e-7° via the reference's round-half-away rule
(coordinate_as_integer, geometry.hpp:37-41).

The polygon is driver-side metadata (a few KB) broadcast into the pnpoly
kernel (operators/extract.py) — never a distributed dataset.
"""

from __future__ import annotations


def _as_int(v: float) -> int:
    # coordinate_as_integer: v*1e7 ± 0.5 round-half-away (geometry.hpp:37-41)
    x = v * 10000000.0
    return int(x + 0.5) if x >= 0 else int(x - 0.5)


def parse_poly(text: str) -> list[tuple[str, list[tuple[int, int]]]]:
    """→ [(section_name, ring)], ring = [(lon, lat) int64 fixed-point].
    Hole sections keep their '!' prefix in the name."""
    lines = text.splitlines()
    if not lines:
        raise ValueError("empty .poly")
    sections: list[tuple[str, list[tuple[int, int]]]] = []
    name: str | None = None
    ring: list[tuple[int, int]] = []
    finished = False
    for line in lines[1:]:
        s = line.strip()
        if not s:
            continue
        if s == "END":
            if name is not None:
                sections.append((name, ring))
                name, ring = None, []
            else:
                finished = True
        elif name is None:
            if finished:
                raise ValueError("content after final END")
            name = s
            ring = []
        else:
            parts = s.split()
            ring.append((_as_int(float(parts[0])), _as_int(float(parts[1]))))
    if not finished:
        raise ValueError("not finished??")  # same guard as the reference
    return sections


def outer_ring(text: str) -> list[tuple[int, int]]:
    """The reference's read_poly_file contract: exactly one outer ring."""
    outers = [r for n, r in parse_poly(text) if not n.startswith("!")]
    if len(outers) != 1:
        raise ValueError("multiple rings??")
    return outers[0]


def write_poly(name: str, rings: list[tuple[str, list[tuple[int, int]]]]) -> str:
    out = [name]
    for sec, ring in rings:
        out.append(sec)
        for lon, lat in ring:
            out.append(f"   {lon * 1e-7:.7f}   {lat * 1e-7:.7f}")
        out.append("END")
    out.append("END")
    return "\n".join(out) + "\n"
