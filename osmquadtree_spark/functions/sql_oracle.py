"""ANSI-SQL (DuckDB) oracles for the quadtree kernel.

The driver cross-checks every Spark query against DuckDB SQL, so the
non-trivial kernels need SQL re-statements. ``calculate`` is a bounded
recursion over levels → a recursive CTE; ``common`` has a closed form via
xor + bit-length. All float arithmetic uses the same IEEE-754 double ops and
the same libm (verified in tests via full-table comparison against the numpy
kernel), so results are bit-identical to the engine's pandas-UDF kernels.
"""

from __future__ import annotations

from ..kernels.quadtree import BUFFER_DEFAULT, MAX_DEPTH_CLI


def find_quad_case(bf: float) -> str:
    """The findQuad branch chain (quadtree.cpp:33-57) as a CASE expression
    over normalized coords mx/my/ux/uy. Branch order is semantic.

    All constants are forced to DOUBLE: DuckDB parses plain decimal literals
    as DECIMAL and would evaluate the comparisons in exact decimal — the
    engine kernel computes (±1 ± bf) in IEEE double, which differs in the
    last ulp."""
    b = f"CAST({bf!r} AS DOUBLE)"
    lo = f"(-1e0 - {b})"
    hi = f"(1e0 + {b})"
    return f"""CASE
      WHEN mx < {lo} OR my < {lo} OR ux > {hi} OR uy > {hi} THEN -1
      WHEN ux <= 0 AND my >= 0 THEN 0
      WHEN mx >= 0 AND my >= 0 THEN 1
      WHEN ux <= 0 AND uy <= 0 THEN 2
      WHEN mx >= 0 AND uy <= 0 THEN 3
      WHEN ux < {b} AND abs(ux) < abs(mx) AND my > -{b} AND abs(uy) >= abs(my) THEN 0
      WHEN mx > -{b} AND abs(ux) >= abs(mx) AND my > -{b} AND abs(uy) >= abs(my) THEN 1
      WHEN ux < {b} AND abs(ux) < abs(mx) AND uy < {b} AND abs(uy) < abs(my) THEN 2
      WHEN mx > -{b} AND abs(ux) >= abs(mx) AND uy < {b} AND abs(uy) < abs(my) THEN 3
      ELSE -1 END"""


def calculate_cte(
    base_sql: str,
    id_col: str = "elem_id",
    buffer: float = BUFFER_DEFAULT,
    max_depth: int = MAX_DEPTH_CLI,
) -> str:
    """Recursive-CTE restatement of quadtree::calculate.

    ``base_sql`` must yield (``id_col``, minx, miny, maxx, maxy) with int64
    fixed-point 1e-7° coords. Result relation: (``id_col``, qt).

    Mirrors makeQuadTreeFloat + makeQuadTree_ (quadtree.cpp:59-102): invalid
    box → -1; degenerate sides nudged by 1e-7°; lon/180 and scale-90
    mercator/90 normalization; per level the findQuad digit is packed at bits
    (61-2·level) and the box is recentered and doubled. ``acc`` is monotone
    nondecreasing, so the final qt per row is simply MAX(acc).

    ``id_col`` need not be unique: the recursion keys on a synthetic per-row
    id, so the result is one output row per input row (multiset semantics,
    matching the engine). All float literals are e-notation/CAST → DOUBLE
    (DuckDB would otherwise use exact DECIMAL arithmetic).
    """
    return f"""
WITH RECURSIVE qtbase AS (
  SELECT *, ROW_NUMBER() OVER () AS _rid FROM (
{base_sql}
  )
), qtprep AS (
  SELECT _rid, {id_col},
         (minx > maxx OR miny > maxy) AS invalid,
         (minx * 1e-7) / 180e0 AS mx0,
         (CASE WHEN maxx = minx THEN maxx * 1e-7 + 1e-7
               ELSE maxx * 1e-7 END) / 180e0 AS ux0,
         ln(tan(pi() * (1e0 + (miny * 1e-7) / 90e0) / 4e0)) / pi() AS my0,
         ln(tan(pi() * (1e0 + (CASE WHEN maxy = miny THEN maxy * 1e-7 + 1e-7
                                    ELSE maxy * 1e-7 END) / 90e0) / 4e0)) / pi() AS uy0
  FROM qtbase
), qtrec AS (
  SELECT _rid, {id_col}, mx0 AS mx, my0 AS my, ux0 AS ux, uy0 AS uy,
         0 AS cl,
         CASE WHEN invalid THEN -1 ELSE 0 END::BIGINT AS acc,
         NOT invalid AS act
  FROM qtprep
  UNION ALL
  SELECT _rid, {id_col},
         2e0 * (mx + dx), 2e0 * (my + dy), 2e0 * (ux + dx), 2e0 * (uy + dy),
         cl + 1,
         acc + (q::BIGINT << (61 - 2 * cl)) + 1,
         TRUE
  FROM (
    SELECT *,
           CASE WHEN q IN (0, 2) THEN 5e-1 ELSE -5e-1 END AS dx,
           CASE WHEN q IN (2, 3) THEN 5e-1 ELSE -5e-1 END AS dy
    FROM (
      SELECT *, {find_quad_case(buffer)} AS q
      FROM qtrec
      WHERE act AND cl < {max_depth}
    )
  )
  WHERE q >= 0
)
SELECT {id_col}, MAX(acc) AS qt FROM qtrec GROUP BY _rid, {id_col}
""".strip()


_M64 = "CAST('18446744073709551616' AS HUGEINT)"  # 2^64
_M32 = 4294967296
_SM_C0 = "CAST('11400714819323198485' AS HUGEINT)"  # 0x9E3779B97F4A7C15
_SM_C1 = "CAST('13787848793156543929' AS HUGEINT)"  # 0xBF58476D1CE4E5B9
_SM_C2 = "CAST('10723151780598845931' AS HUGEINT)"  # 0x94D049BB133111EB


def mulmod64_sql(a: str, b: str) -> str:
    """(a*b) mod 2^64 for HUGEINT operands in [0, 2^64): 32-bit split so no
    intermediate exceeds int128."""
    return (
        f"((({a}) % {_M32}) * (({b}) % {_M32}) "
        f"+ (((({a}) // {_M32}) * (({b}) % {_M32}) "
        f"+ (({a}) % {_M32}) * (({b}) // {_M32})) % {_M32}) * {_M32}) % {_M64}"
    )


def splitmix64_sql(x: str) -> str:
    """splitmix64 (public algorithm) restated over DuckDB HUGEINT — exact
    uint64 wraparound semantics, validated bit-for-bit against the numpy
    generator (sources/images.py:splitmix64) in tests."""
    z1 = f"((({x})::HUGEINT + {_SM_C0}) % {_M64})"
    z2 = f"xor({z1}, ({z1}) >> 30)"
    z3 = "(" + mulmod64_sql(z2, _SM_C1) + ")"
    z4 = f"xor({z3}, ({z3}) >> 27)"
    z5 = "(" + mulmod64_sql(z4, _SM_C2) + ")"
    return f"xor({z5}, ({z5}) >> 31)"


from ..kernels.strhash import SEED as POLYHASH_SEED  # single source of truth


def polyhash64_sql(s: str) -> str:
    """polyhash64 (kernels/strhash.py — polynomial codepoint fold, public
    Rabin-Karp/String.hashCode shape widened to 64 bits) restated over
    DuckDB HUGEINT: exact uint64 wraparound, validated bit-for-bit against
    the numpy kernel in tests/test_strhash.py. The list_filter drops the
    lone '' element string_split('','') produces (unicode('') is -1, which
    would perturb the empty-string hash away from the seed)."""
    return (
        f"list_reduce(list_prepend(CAST({POLYHASH_SEED} AS HUGEINT), "
        f"list_transform(list_filter(string_split({s}, ''), c -> c <> ''), "
        f"c -> CAST(unicode(c) AS HUGEINT))), "
        f"(acc, cp) -> ((acc * 31 + cp) % {_M64}))"
    )


def image_elements_sql(i_source_sql: str) -> str:
    """DuckDB twin of sources/images.py: row index → (img_idx, minx, miny,
    maxx, maxy) via the FIXTURES.md §1 georeferencing rule (phash =
    splitmix64(i); even rows point footprint, odd rows bbox scaled by the
    w/h cycles, clamped to the planet box).

    ``i_source_sql`` must yield a single column ``i`` (the row index)."""
    return f"""
SELECT i AS img_idx,
       lon AS minx, lat AS miny,
       CASE WHEN i % 2 = 1 THEN LEAST(lon + wv * 1000, 1799999999) ELSE lon END AS maxx,
       CASE WHEN i % 2 = 1 THEN LEAST(lat + hv * 1000, 849999999) ELSE lat END AS maxy
FROM (
  SELECT i,
         (u % 3600000000)::BIGINT - 1800000000 AS lon,
         ((u // 3600000000) % 1700000000)::BIGINT - 850000000 AS lat,
         (CASE i % 4 WHEN 0 THEN 16 WHEN 1 THEN 32 WHEN 2 THEN 64 ELSE 128 END)::BIGINT AS wv,
         (CASE (i // 4) % 4 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 48 ELSE 96 END)::BIGINT AS hv
  FROM (SELECT i, {splitmix64_sql('i')} AS u FROM ({i_source_sql}))
)""".strip()


def s2_cell_cte(base_sql: str, id_col: str, level: int = 16) -> str:
    """Recursive-CTE restatement of the S2 cell id kernel (kernels/s2.py):
    cube-face argmax (numpy tie order replicated), quadratic ST, 30-step
    Hilbert walk with the 4-orientation lookup tables as CASE chains, and
    the uint64→int64 two's-complement reinterpretation at the end.

    ``base_sql`` must yield (id_col, lon, lat) fixed-point 1e-7°."""
    n30 = 1 << 30
    m64 = "CAST('18446744073709551616' AS HUGEINT)"
    m63 = "CAST('9223372036854775808' AS HUGEINT)"
    # IJ_TO_POS[orient][ij] and POS_TO_ORIENTATION as CASE tables
    ij_to_pos = "CASE orient * 4 + ij " + " ".join(
        f"WHEN {o * 4 + ij} THEN {p}"
        for o, row in enumerate([[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]])
        for ij, p in enumerate(row)
    ) + " END"
    pos_orient = "CASE pos WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 0 ELSE 3 END"
    st = lambda u: (
        f"CASE WHEN ({u}) >= 0 THEN 5e-1 * sqrt(1e0 + 3e0 * ({u})) "
        f"ELSE 1e0 - 5e-1 * sqrt(1e0 - 3e0 * ({u})) END"
    )
    ij_clamp = lambda s: f"LEAST(GREATEST(CAST(trunc(({s}) * {n30}e0) AS BIGINT), 0), {n30 - 1})"
    return f"""
WITH RECURSIVE s2base AS (
  SELECT {id_col},
         cos(radians(lat * 1e-7)) * cos(radians(lon * 1e-7)) AS x,
         cos(radians(lat * 1e-7)) * sin(radians(lon * 1e-7)) AS y,
         sin(radians(lat * 1e-7)) AS z
  FROM ({base_sql})
), s2face AS (
  SELECT {id_col}, x, y, z,
         (CASE WHEN abs(x) >= abs(y) THEN (CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END)
               ELSE (CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END) END) AS f0
  FROM s2base
), s2uv AS (
  SELECT {id_col},
         CASE WHEN (CASE f0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0 THEN f0 + 3 ELSE f0 END AS face,
         CASE (CASE WHEN (CASE f0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0 THEN f0 + 3 ELSE f0 END)
           WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
           WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
         CASE (CASE WHEN (CASE f0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0 THEN f0 + 3 ELSE f0 END)
           WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
           WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM s2face
), s2ij AS (
  SELECT {id_col}, face,
         {ij_clamp(st('u'))} AS i, {ij_clamp(st('v'))} AS j
  FROM s2uv
), walk AS (
  SELECT {id_col}, face, i, j, 29 AS k,
         CAST(face AS HUGEINT) * {1 << 60} AS n,
         face % 2 AS orient
  FROM s2ij
  UNION ALL
  SELECT {id_col}, face, i, j, k - 1,
         n + CAST(pos AS HUGEINT) * (CAST(1 AS HUGEINT) << (2 * k)),
         xor(orient::BIGINT, ({pos_orient})::BIGINT)::INT
  FROM (
    SELECT *, {ij_to_pos} AS pos FROM (
      SELECT *, ((i >> k) & 1) * 2 + ((j >> k) & 1) AS ij
      FROM walk WHERE k >= 0
    )
  )
), leaf AS (
  SELECT {id_col}, n * 2 + 1 AS leaf_u FROM walk WHERE k = -1
), truncated AS (
  SELECT {id_col},
         (leaf_u // {1 << (2 * (30 - level))}) // 2 * 2 * {1 << (2 * (30 - level))}
           + {1 << (2 * (30 - level))} AS cell_u
  FROM leaf
)
SELECT {id_col},
       CAST(CASE WHEN cell_u >= {m63} THEN cell_u - {m64} ELSE cell_u END AS BIGINT) AS s2_cell
FROM truncated
""".strip()


def round_sql(expr: str, level: int) -> str:
    """quadtree::round as portable SQL (same as functions.udfs.round_qt_sql)."""
    sh = 63 - 2 * level
    return (
        f"CASE WHEN (({expr}) & 31) < {level} THEN ({expr}) "
        f"ELSE (((({expr}) >> {sh}) << {sh}) + {level}) END"
    )


def xyz_sql(qt_expr: str, zoom: int) -> tuple[str, str]:
    """quadtree::tuple (quadtree.cpp:161-177) unrolled for a fixed zoom:
    returns (x_expr, y_expr) extracting the slippy-map tile address from the
    *already rounded* cell id. Digit i's low bit feeds x, high bit feeds y,
    most significant level first."""
    xs = []
    ys = []
    for i in range(zoom):
        digit = f"((({qt_expr}) >> {61 - 2 * i}) & 3)"
        xs.append(f"(({digit} & 1) << {zoom - 1 - i})")
        ys.append(f"((({digit} >> 1) & 1) << {zoom - 1 - i})")
    return " + ".join(xs), " + ".join(ys)


def common_sql(a: str, b: str) -> str:
    """Closed-form quadtree::common (quadtree.cpp:189-213) as a SQL expression.

    d = min depth; y = xor of the two ids shifted so only the top 2d path
    bits remain; the first differing 2-bit digit (via bit length of y, exact
    through floor(log2) since y < 2^36) gives the LCA level.
    """
    d = f"LEAST(({a}) & 31, ({b}) & 31)"
    y = f"(xor(({a})::BIGINT, ({b})::BIGINT) >> (63 - 2 * ({d})))"
    bl = f"(CASE WHEN {y} = 0 THEN 0 ELSE CAST(floor(log2(({y})::DOUBLE)) AS BIGINT) + 1 END)"
    lvl = f"(CASE WHEN {y} = 0 THEN ({d}) ELSE ({d}) - 1 - (({bl} - 1) // 2) END)"
    rounded = f"(((({a}) >> (63 - 2 * {lvl})) << (63 - 2 * {lvl})) + {lvl})"
    return (
        f"(CASE WHEN ({a}) = -1 THEN ({b}) "
        f"WHEN ({b}) = -1 THEN ({a}) "
        f"WHEN ({a}) = ({b}) THEN ({a}) "
        f"ELSE {rounded} END)"
    )


# ---------------------------------------------------------------------------
# geohash (public algorithm, geohash.org): 1e-7 fixed-point lon/lat ints →
# base-32 geohash string. Shared between the Spark operator
# (operators/spatial.geohash_encode) and the DuckDB oracle: both evaluate the
# SAME step expressions (only integer division spells differently), each step
# referencing named columns so neither engine pays the 2^5 textual blowup of
# inlining the Morton spread.

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

# classic 5-step magic-mask spread of a ≤32-bit value into even bit positions
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def geohash_steps(
    lon_col: str, lat_col: str, precision: int = 8, intdiv: str = "//"
) -> list[tuple[str, str]]:
    """Ordered (column, expr) pairs computing a ``precision``-char geohash.

    ``lon_col``/``lat_col`` are 1e-7 fixed-point degree ints (the engine's
    native coordinate type, sources/geo.py). Geohash interleaves binary
    subdivisions of lon (first/even bits) and lat: we scale each axis to a
    ``bits``-bit integer, Morton-spread both, and read the interleaved code
    out 5 bits per base-32 char. precision must be even so bits split
    equally (8 → 20+20 bits, the standard ~19 m cell).
    """
    if precision % 2 or not 2 <= precision <= 12:
        raise ValueError("precision must be even, in [2, 12]")
    bits = precision * 5 // 2  # per axis
    scale = 1 << bits
    steps = [
        ("gh_xb", f"((({lon_col}) + 1800000000) * {scale}) {intdiv} 3600000000"),
        ("gh_yb", f"((({lat_col}) + 900000000) * {scale}) {intdiv} 1800000000"),
    ]
    for axis in ("gh_xb", "gh_yb"):
        cur = axis
        for j, (sh, mask) in enumerate(_SPREAD):
            nxt = f"{axis}_{j}"
            steps.append((nxt, f"(({cur} | ({cur} << {sh})) & {mask})"))
            cur = nxt
    steps.append(("gh_code", "((gh_xb_4 << 1) | gh_yb_4)"))
    chars = [
        f"substring('{GEOHASH_ALPHABET}', "
        f"CAST((gh_code >> {5 * (precision - 1 - i)}) & 31 AS INT) + 1, 1)"
        for i in range(precision)
    ]
    steps.append(("geohash", " || ".join(chars)))
    return steps


def geohash_cte(base_sql: str, keep_cols: str, precision: int = 8) -> str:
    """DuckDB CTE chain evaluating geohash_steps over ``base_sql`` (which
    must expose integer ``lon``/``lat`` columns); returns
    (keep_cols..., geohash)."""
    steps = geohash_steps("lon", "lat", precision, intdiv="//")
    sql = f"SELECT {keep_cols}, lon, lat FROM ({base_sql})"
    for name, expr in steps:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return f"SELECT {keep_cols}, geohash FROM ({sql})"
