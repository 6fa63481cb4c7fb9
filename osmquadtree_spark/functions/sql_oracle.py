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
    over normalized coords mx/my/ux/uy. Branch order is semantic."""
    return f"""CASE
      WHEN mx < (-1 - {bf}) OR my < (-1 - {bf}) OR ux > (1 + {bf}) OR uy > (1 + {bf}) THEN -1
      WHEN ux <= 0 AND my >= 0 THEN 0
      WHEN mx >= 0 AND my >= 0 THEN 1
      WHEN ux <= 0 AND uy <= 0 THEN 2
      WHEN mx >= 0 AND uy <= 0 THEN 3
      WHEN ux < {bf} AND abs(ux) < abs(mx) AND my > -{bf} AND abs(uy) >= abs(my) THEN 0
      WHEN mx > -{bf} AND abs(ux) >= abs(mx) AND my > -{bf} AND abs(uy) >= abs(my) THEN 1
      WHEN ux < {bf} AND abs(ux) < abs(mx) AND uy < {bf} AND abs(uy) < abs(my) THEN 2
      WHEN mx > -{bf} AND abs(ux) >= abs(mx) AND uy < {bf} AND abs(uy) < abs(my) THEN 3
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
    """
    return f"""
WITH RECURSIVE qtbase AS (
{base_sql}
), qtprep AS (
  SELECT {id_col},
         (minx > maxx OR miny > maxy) AS invalid,
         (minx * 0.0000001) / 180.0 AS mx0,
         (CASE WHEN maxx = minx THEN maxx * 0.0000001 + 0.0000001
               ELSE maxx * 0.0000001 END) / 180.0 AS ux0,
         ln(tan(pi() * (1.0 + (miny * 0.0000001) / 90.0) / 4.0)) / pi() AS my0,
         ln(tan(pi() * (1.0 + (CASE WHEN maxy = miny THEN maxy * 0.0000001 + 0.0000001
                                    ELSE maxy * 0.0000001 END) / 90.0) / 4.0)) / pi() AS uy0
  FROM qtbase
), qtrec AS (
  SELECT {id_col}, mx0 AS mx, my0 AS my, ux0 AS ux, uy0 AS uy,
         0 AS cl,
         CASE WHEN invalid THEN -1 ELSE 0 END::BIGINT AS acc,
         NOT invalid AS act
  FROM qtprep
  UNION ALL
  SELECT {id_col},
         2 * (mx + dx), 2 * (my + dy), 2 * (ux + dx), 2 * (uy + dy),
         cl + 1,
         acc + (q::BIGINT << (61 - 2 * cl)) + 1,
         TRUE
  FROM (
    SELECT *,
           CASE WHEN q IN (0, 2) THEN 0.5 ELSE -0.5 END AS dx,
           CASE WHEN q IN (2, 3) THEN 0.5 ELSE -0.5 END AS dy
    FROM (
      SELECT *, {find_quad_case(buffer)} AS q
      FROM qtrec
      WHERE act AND cl < {max_depth}
    )
  )
  WHERE q >= 0
)
SELECT {id_col}, MAX(acc) AS qt FROM qtrec GROUP BY {id_col}
""".strip()


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
