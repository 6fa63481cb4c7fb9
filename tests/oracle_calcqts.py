"""Scalar oracle for calcqts — a direct port of the reference's in-memory
pipeline (/root/reference/src/calcqts/calcqtsinmem.cpp:139-310), used to
verify the Spark operators row-for-row. Deliberately naive and sequential."""

from __future__ import annotations

from osmquadtree_spark.kernels import quadtree as qtk

EMPTY_BOX = (1800000000, 1800000000, -1800000000, -1800000000)  # bbox.hpp:33


def calc_all_scalar(nodes, ways, relations, buffer=0.05, max_depth=17):
    """nodes: [(id, lon, lat)]; ways: [(id, [refs])];
    relations: [(id, [(m_type, m_ref)])].
    Returns (node_qt, way_qt, rel_qt) dicts. Ways with no located refs get
    qt -1 (empty bbox), exactly like the reference."""
    node_pos = {nid: (lon, lat) for nid, lon, lat in nodes}
    node_qt = {nid: -1 for nid, _, _ in nodes}
    way_qt = {}
    for wid, refs in sorted(ways):
        minx, miny, maxx, maxy = EMPTY_BOX
        present = []
        for r in refs:
            if r in node_pos:
                lon, lat = node_pos[r]
                minx = min(minx, lon)
                miny = min(miny, lat)
                maxx = max(maxx, lon)
                maxy = max(maxy, lat)
                present.append(r)
        q = qtk.calculate_scalar(minx, miny, maxx, maxy, buffer, max_depth)
        way_qt[wid] = q
        for r in present:
            node_qt[r] = qtk.common_scalar(node_qt[r], q)
    for nid, lon, lat in nodes:
        if node_qt[nid] == -1:
            node_qt[nid] = qtk.calculate_scalar(lon, lat, lon, lat, buffer, max_depth)

    # relations (calculate_relation_quadtrees, calcqtsinmem.cpp:139-207)
    rels = sorted(relations)
    rel_ids = {rid for rid, _ in rels}
    rel_qt = {}
    relrels = []
    for rid, members in rels:
        q = -1
        arr = False
        for m_type, m_ref in members:
            if m_type == 0:
                q = qtk.common_scalar(q, node_qt.get(m_ref, -1))
            elif m_type == 1:
                q = qtk.common_scalar(q, way_qt.get(m_ref, -1))
            else:
                if m_ref in rel_ids:
                    relrels.append((rid, m_ref))
                    arr = True
        if q == -1 and not arr:
            q = 0
        rel_qt[rid] = q
    for _ in range(5):  # exactly 5 sequential passes
        for parent, child in relrels:
            a = rel_qt[parent]
            b = qtk.common_scalar(a, rel_qt[child])
            if a != b:
                rel_qt[parent] = b
    for rid in rel_qt:
        if rel_qt[rid] < 0:
            rel_qt[rid] = 0
    return node_qt, way_qt, rel_qt
