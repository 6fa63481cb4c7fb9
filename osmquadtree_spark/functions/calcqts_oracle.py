"""DuckDB oracle SQL for the calcqts operators over the OSM-shaped fixture
(sources/osm_fixture.py).

Composes the recursive-CTE ``calculate`` restatement and the closed-form
``common`` (sql_oracle.py) into the three calcqts stages
(/root/reference/src/calcqts/calcqtsinmem.cpp:120-310):

* way qt  = calculate(bbox of resolved member nodes)
* node qt = common(min, max) over containing ways' qts, else the point cell
* rel qt  = member LCA + the rel→rel closure; the reference's 5 sequential
  passes are restated as 5 Jacobi passes (chained CTEs), which agree with
  the engine's exact Gauss-Seidel order because the fixture's rel→rel DAG
  has depth ≤ 2 < 5 — both reach the same fixpoint (see osm_fixture.py).
"""

from __future__ import annotations

from ..sources.osm_fixture import nodes_sql, rel_members_sql, way_pairs_sql
from . import sql_oracle as so


def way_qts_sql() -> str:
    base = f"""
SELECT way_id, MIN(lon) AS minx, MIN(lat) AS miny, MAX(lon) AS maxx, MAX(lat) AS maxy
FROM ({way_pairs_sql()}) p JOIN ({nodes_sql()}) n USING (node_id)
GROUP BY way_id"""
    return so.calculate_cte(base, "way_id")


def node_qts_sql() -> str:
    point_base = f"""
SELECT node_id, lon AS minx, lat AS miny, lon AS maxx, lat AS maxy
FROM ({nodes_sql()})"""
    return f"""
SELECT n.node_id, COALESCE(w.way_qt, pq.qt) AS qt
FROM ({nodes_sql()}) n
LEFT JOIN (
  SELECT node_id, {so.common_sql("MIN(qt)", "MAX(qt)")} AS way_qt
  FROM ({way_pairs_sql()}) p JOIN ({way_qts_sql()}) wq USING (way_id)
  WHERE qt >= 0 GROUP BY node_id
) w ON w.node_id = n.node_id
LEFT JOIN ({so.calculate_cte(point_base, "node_id")}) pq ON pq.node_id = n.node_id
""".strip()


def _jacobi_pass(prev: str, k: int) -> str:
    """One Jacobi pass over the rel→rel edges: parent absorbs the LCA of its
    existing children's current (non-negative) values.

    Each p{{k}} is read twice (agg{{k+1}} and p{{k+1}}) — MATERIALIZED, or
    DuckDB's inlining re-evaluates the whole chain per reference,
    exponentially (2^5 evaluations of p0's member-qt derivation; measured
    17 s → sub-second for the rel_qts oracle at sf0.01)."""
    return f"""
agg{k} AS (
  SELECT e.parent AS rel_id, MIN(c.q) AS mn, MAX(c.q) AS mx
  FROM edges e JOIN {prev} c ON c.rel_id = e.child
  WHERE c.q >= 0 GROUP BY e.parent
), cq{k} AS (
  SELECT rel_id, {so.common_sql("mn", "mx")} AS cq FROM agg{k}
), p{k} AS MATERIALIZED (
  SELECT r.rel_id,
         CASE WHEN a.cq IS NULL THEN r.q
              ELSE {so.common_sql("a.cq", "r.q")} END AS q
  FROM {prev} r LEFT JOIN cq{k} a ON a.rel_id = r.rel_id
)""".strip()


def rel_qts_sql() -> str:
    passes = ",\n".join(_jacobi_pass(f"p{k - 1}", k) for k in range(1, 6))
    return f"""
WITH m AS MATERIALIZED (
{rel_members_sql()}
), rel_ids AS (
  SELECT DISTINCT rel_id FROM m
), nq AS MATERIALIZED (
{node_qts_sql()}
), wq AS MATERIALIZED (
{way_qts_sql()}
), memqt AS (
  SELECT m.rel_id, nq.qt FROM m JOIN nq ON m.m_type = 0 AND nq.node_id = m.m_ref
  UNION ALL
  SELECT m.rel_id, wq.qt FROM m JOIN wq ON m.m_type = 1 AND wq.way_id = m.m_ref
), base AS (
  SELECT rel_id, {so.common_sql("MIN(qt)", "MAX(qt)")} AS q0
  FROM memqt WHERE qt >= 0 GROUP BY rel_id
), edges AS MATERIALIZED (
  SELECT m.rel_id AS parent, m.m_ref AS child
  FROM m JOIN rel_ids c ON c.rel_id = m.m_ref
  WHERE m.m_type = 2
), p0 AS MATERIALIZED (
  -- no located members and no existing rel member → 0 (calcqtsinmem.cpp:182-184)
  SELECT r.rel_id,
         CASE WHEN b.q0 IS NULL AND e.parent IS NULL THEN 0
              ELSE COALESCE(b.q0, -1) END AS q
  FROM rel_ids r
  LEFT JOIN base b ON b.rel_id = r.rel_id
  LEFT JOIN (SELECT DISTINCT parent FROM edges) e ON e.parent = r.rel_id
),
{passes}
SELECT rel_id, CASE WHEN q < 0 THEN 0 ELSE q END AS qt FROM p5
""".strip()
