"""DuckDB oracle for the sortblocks group-assignment queries.

The greedy grouping (find_groups_copy) is inherently sequential and not
SQL-expressible, but everything AROUND it is — so the oracle derives the
histogram end-to-end in DuckDB (cell kernel restated in SQL via
sql_oracle.calculate_cte + round_sql, fully independent of the Spark path),
feeds it to the per-item reference restatement of the greedy
(plans/qttree.QtTree — NOTE: the Spark query uses the separate vectorized
QtTreeArr implementation, so the two paths only share the published
algorithm, whose exactness is additionally pinned by
tests/test_qttree_groups.py), and then restates ``find_tile`` (deepest
group ancestor-or-equal, root fallback — qttree.cpp:205-212) as a pure SQL
CASE over the embedded group table.

A full-value match therefore gates: the Spark cell kernel, the histogram
aggregate, the greedy's determinism given the histogram, and the broadcast
assignment kernel — replacing the previous constant-0 oracle that ASSUMED
degeneracy at the driver's scale (the root-only group table now falls out
of running the algorithm, not out of an assumption).
"""

from __future__ import annotations

import os

from . import sql_oracle as so
from ..sources.geo import elements_sql


def oracle_sf_dir() -> str:
    return (
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
        or "/root/testdata/sf0.01"  # the driver's correctness scale
    )


def _group_rows(
    sf_dir: str, target: int, minsize: int, tree_level: int, rollup: bool
) -> list[tuple[int, int, int]]:
    """Full (qt, idx, weight) group table from a DuckDB-derived histogram
    through the per-item reference greedy — the oracle side of the
    group_scalable_equiv gate."""
    import duckdb

    from ..plans.qttree import QtTree, find_groups, group_table, tree_rollup

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    qt_cte = so.calculate_cte(elements_sql(intdiv="//"), "elem_id")
    hist = con.sql(
        f"SELECT {so.round_sql('qt', tree_level)} AS cell, COUNT(*) AS cnt "
        f"FROM ({qt_cte}) GROUP BY 1"
    ).fetchall()
    con.close()
    cells = [int(r[0]) for r in hist]
    counts = [int(r[1]) for r in hist]
    tree = QtTree.from_counts(cells, counts, tree_level)  # skips negatives
    if rollup:
        tree_rollup(tree, minsize)
    groups = find_groups(tree, target, minsize)
    gqt, gidx, gw = group_table(groups)
    return [(int(q), int(i), int(w)) for q, i, w in zip(gqt, gidx, gw)]


def _group_qts(sf_dir: str, target: int, minsize: int, tree_level: int, rollup: bool):
    """Compute the group table from a DuckDB-derived histogram."""
    return [r[0] for r in _group_rows(sf_dir, target, minsize, tree_level, rollup)]


def find_tile_sql(qt_expr: str, group_qts: list[int]) -> str:
    """``find_tile`` as SQL: deepest group that is an ancestor-or-equal of
    ``qt_expr`` (levels descending), else the root group 0."""
    by_level: dict[int, list[int]] = {}
    for q in group_qts:
        by_level.setdefault(q & 31, []).append(q)
    whens = []
    for lv in sorted(by_level, reverse=True):
        if lv == 0:
            continue
        in_list = ", ".join(str(q) for q in sorted(by_level[lv]))
        whens.append(
            # qt >= 0 guard: invalid cells always land at root (a negative
            # cell's rounded id is negative and never a group, so the guard
            # is an identity that just keeps the SQL well-defined)
            f"WHEN ({qt_expr}) >= 0 AND (({qt_expr}) & 31) >= {lv} "
            f"AND {so.round_sql(qt_expr, lv)} IN ({in_list}) "
            f"THEN {so.round_sql(qt_expr, lv)}"
        )
    if not whens:
        return "0::BIGINT"
    return "(CASE " + " ".join(whens) + " ELSE 0 END)::BIGINT"


def group_assign_sql(target: int, minsize: int, tree_level: int, rollup: bool) -> str:
    """Full oracle: every element assigned to its group tile."""
    sf_dir = oracle_sf_dir()
    gqt = _group_qts(sf_dir, target, minsize, tree_level, rollup)
    qt_cte = so.calculate_cte(elements_sql(intdiv="//"), "elem_id")
    return f"""
SELECT elem_id, {find_tile_sql('qt', gqt)} AS group_qt
FROM ({qt_cte})
""".strip()


def image_tiles_sql(target: int, minsize: int, tree_level: int) -> str:
    """Full oracle for the north-star image tiling pipeline (stages 1-3):
    footprint cells re-derived in DuckDB (splitmix64 over HUGEINT), group
    table from the DuckDB histogram + rollup + greedy (per-item
    restatement), find_tile in SQL, per-tile counts + cell extrema."""
    import duckdb

    from ..plans.qttree import QtTree, find_groups, group_table, tree_rollup

    sf_dir = oracle_sf_dir()
    qt_cte = so.calculate_cte(
        so.image_elements_sql("SELECT p_partkey AS i FROM part"), "img_idx"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    hist = con.sql(
        f"SELECT {so.round_sql('qt', tree_level)} AS cell, COUNT(*) AS cnt "
        f"FROM ({qt_cte}) GROUP BY 1"
    ).fetchall()
    con.close()
    tree = QtTree.from_counts(
        [int(r[0]) for r in hist], [int(r[1]) for r in hist], tree_level
    )
    tree_rollup(tree, minsize)
    gqt, _, _ = group_table(find_groups(tree, target, minsize))
    ft = find_tile_sql("qt", [int(q) for q in gqt])
    return f"""
SELECT {ft} AS group_qt, COUNT(*)::BIGINT AS n_rows,
       MIN(qt) AS min_cell, MAX(qt) AS max_cell
FROM ({qt_cte}) GROUP BY 1
""".strip()
