"""DuckDB oracle SQL for the incremental-update operators
(operators/update.py) over a deterministic change set derived from the OSM
fixture.

Change set (pure function of the fixture; queries.py imports the same
modulus constants, so the two sides cannot drift):
* nodes with id % 47 == 0             → Modify(4), longitude negated
* nodes with id % 47 == 1, id % 3 == 0 → Delete(1)
* ways  with id % 41 == 0             → Modify(4)
* rels  with id % 13 == 0             → Modify(4)
* context nodes (Normal 0): resolvable refs of the active ways not already
  in the set, original coordinates

The moduli make the change set DIFF-scale (~10% of elements, vs the 44%
of an earlier fixture): the reference's update path processes daily .osc
diffs (update.cpp) — a change set approaching the planet's size is a full
calcqts re-run, not an update, and benchmarks the wrong operation.
Old cells come from the full-fixture calcqts at the CLI depth 17; the update
recomputes at depth 18 (update.cpp:562) — exactly the reference's pairing of
`oqt calcqts` defaults with the update path. Original tile allocations are
``tile3(old_qt)`` (all 64 depth-3 groups + root), making find_tile SQL-exact.
"""

from __future__ import annotations

from . import calcqts_oracle as cqo
from . import sql_oracle as so
from ..operators.update import UPDATE_DEPTH
from ..sources.osm_fixture import nodes_sql, way_pairs_sql

# -- change-set CTEs ----------------------------------------------------------

ACT_NODE_MOD = 47
ACT_WAY_MOD = 41
ACT_REL_MOD = 13

ACT_NODE = f"(node_id % {ACT_NODE_MOD} = 0)"
DEL_NODE = f"(node_id % {ACT_NODE_MOD} = 1 AND node_id % 3 = 0)"
ACT_WAY = f"(way_id % {ACT_WAY_MOD} = 0)"
ACT_REL = f"(rel_id % {ACT_REL_MOD} = 0)"


def _ch_nodes_sql() -> str:
    """(node_id, lon, lat, ct): the change-map nodes with updated coords."""
    return f"""
SELECT n.node_id,
       CASE WHEN {ACT_NODE} THEN -n.lon ELSE n.lon END AS lon,
       n.lat,
       CASE WHEN {ACT_NODE} THEN 4 WHEN {DEL_NODE} THEN 1 ELSE 0 END AS ct
FROM ({nodes_sql()}) n
WHERE {ACT_NODE} OR {DEL_NODE}
   OR n.node_id IN (SELECT node_id FROM ({way_pairs_sql()}) WHERE {ACT_WAY})
""".strip()


def _new_way_qts_sql() -> str:
    """Active ways' cells at depth 18 over the updated node positions."""
    base = f"""
SELECT way_id, MIN(lon) AS minx, MIN(lat) AS miny, MAX(lon) AS maxx, MAX(lat) AS maxy
FROM ({way_pairs_sql()}) p JOIN ({_ch_nodes_sql()}) n USING (node_id)
WHERE {ACT_WAY}
GROUP BY way_id"""
    return so.calculate_cte(base, "way_id", max_depth=UPDATE_DEPTH)


def _new_node_qts_sql() -> str:
    """(node_id, ct, new_qt): way-fold else point cell for active nodes."""
    point_base = f"""
SELECT node_id, lon AS minx, lat AS miny, lon AS maxx, lat AS maxy
FROM ({_ch_nodes_sql()})"""
    return f"""
SELECT n.node_id, n.ct,
       CASE WHEN w.way_qt IS NOT NULL THEN w.way_qt
            WHEN n.ct > 1 THEN pq.qt END AS new_qt
FROM ({_ch_nodes_sql()}) n
LEFT JOIN (
  SELECT node_id, {so.common_sql("MIN(qt)", "MAX(qt)")} AS way_qt
  FROM ({way_pairs_sql()}) p JOIN ({_new_way_qts_sql()}) wq USING (way_id)
  WHERE {ACT_WAY} AND qt >= 0 GROUP BY node_id
) w ON w.node_id = n.node_id
LEFT JOIN ({so.calculate_cte(point_base, "node_id", max_depth=UPDATE_DEPTH)}) pq
  ON pq.node_id = n.node_id
""".strip()


def _new_rel_qts_sql() -> str:
    """Active relations' member-LCA cells. The fixture's rel→rel edges never
    connect two ACTIVE relations (an active parent r has r % 13 = 0 and
    children r-1 / r+2; (r-1) % 13 = 0 or (r+2) % 13 = 0 would force
    1 ≡ 0 or 2 ≡ 0 (mod 13)), so the 5-pass closure is the identity here —
    closure-order parity is covered by the rel_qts query and
    tests/test_calcqts.py."""
    from ..sources.osm_fixture import rel_members_sql

    return f"""
SELECT r.rel_id,
       CASE WHEN b.q0 IS NULL THEN 0 WHEN b.q0 < 0 THEN 0 ELSE b.q0 END AS qt
FROM (SELECT DISTINCT rel_id FROM ({rel_members_sql()}) WHERE {ACT_REL}) r
LEFT JOIN (
  SELECT rel_id, {so.common_sql("MIN(qt)", "MAX(qt)")} AS q0 FROM (
    SELECT m.rel_id, nq.new_qt AS qt
    FROM ({rel_members_sql()}) m JOIN ({_new_node_qts_sql()}) nq
      ON m.m_type = 0 AND nq.node_id = m.m_ref AND nq.new_qt IS NOT NULL
    WHERE {ACT_REL.replace('rel_id', 'm.rel_id')}
    UNION ALL
    SELECT m.rel_id, wq.qt
    FROM ({rel_members_sql()}) m JOIN ({_new_way_qts_sql()}) wq
      ON m.m_type = 1 AND wq.way_id = m.m_ref
    WHERE {ACT_REL.replace('rel_id', 'm.rel_id')}
  ) WHERE qt >= 0 GROUP BY rel_id
) b ON b.rel_id = r.rel_id
""".strip()


def _resolved_sql() -> str:
    """(element_type, id, qt, changetype) after the final resolution pass
    (update.cpp:636-654): Normal+unchanged dropped, Normal+changed →
    Unchanged(3) with the new cell, >Remove → new cell, Delete → old cell."""
    return f"""
SELECT 0 AS element_type, n.node_id AS id,
       CASE WHEN n.ct = 1 THEN oq.qt ELSE n.new_qt END AS qt,
       CASE WHEN n.ct = 0 THEN 3 ELSE n.ct END AS changetype
FROM ({_new_node_qts_sql()}) n
LEFT JOIN ({cqo.node_qts_sql()}) oq ON oq.node_id = n.node_id
WHERE NOT (n.ct = 0 AND (n.new_qt IS NULL OR n.new_qt = oq.qt))
UNION ALL
SELECT 1, w.way_id, w.qt, 4
FROM ({_new_way_qts_sql()}) w
UNION ALL
SELECT 2, r.rel_id, r.qt, 4
FROM ({_new_rel_qts_sql()}) r
""".strip()


def change_qts_sql() -> str:
    return f"SELECT * FROM ({_resolved_sql()})"


def _tile3(q: str) -> str:
    """find_tile against the complete depth-3 group table + root."""
    return f"CASE WHEN (({q}) & 31) >= 3 THEN {so.round_sql(q, 3)} ELSE 0 END"


def _orig_allocs_sql() -> str:
    """Original tile allocation of every fixture element: tile3 of the
    full-fixture depth-17 calcqts cell."""
    return f"""
SELECT 0 AS element_type, node_id AS id, {_tile3('qt')} AS alloc FROM ({cqo.node_qts_sql()})
UNION ALL
SELECT 1, way_id, {_tile3('qt')} FROM ({cqo.way_qts_sql()})
UNION ALL
SELECT 2, rel_id, {_tile3('qt')} FROM ({cqo.rel_qts_sql()})
""".strip()


def change_tiles_sql() -> str:
    """find_change_tiles (update.cpp:656-700): survivors → new tile;
    tombstone copy (Remove, qt 0) in the vacated tile; deletes → original
    tile with qt 0.

    ``joined`` feeds three UNION branches and ``allocs`` embeds the whole
    full-fixture calcqts derivation (including the recursive relation
    closure) — without MATERIALIZED, DuckDB inlines the CTE into each
    branch and re-runs that derivation per reference (measured 181 s vs
    30 s at sf0.01)."""
    return f"""
WITH resolved AS MATERIALIZED ({_resolved_sql()}),
allocs AS MATERIALIZED ({_orig_allocs_sql()}),
joined AS MATERIALIZED (
  SELECT r.*, a.alloc FROM resolved r
  LEFT JOIN allocs a ON a.element_type = r.element_type AND a.id = r.id
)
SELECT {_tile3('qt')} AS tile_qt, element_type, id, qt, changetype
FROM joined WHERE changetype > 2
UNION ALL
SELECT alloc, element_type, id, 0::BIGINT, 2
FROM joined WHERE changetype > 2 AND alloc IS NOT NULL AND alloc != {_tile3('qt')}
UNION ALL
SELECT alloc, element_type, id, 0::BIGINT, changetype
FROM joined WHERE changetype IN (1, 2) AND alloc IS NOT NULL
""".strip()
