"""calcqts parity: Spark operators vs the scalar oracle, row-for-row, on
OSM-shaped fixtures (FIXTURES.md §3): grid + midline-straddling + hot-cluster
nodes; rings, boundary-crossing and node-sharing ways; nested relations with
3-level chains (exercising the exact 5-pass closure), empty relations and
missing members."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    Row,
    StructField,
    StructType,
)

from osmquadtree_spark.operators.calcqts import calc_all_quadtrees
from oracle_calcqts import calc_all_scalar


def make_fixture(seed=42):
    rng = np.random.default_rng(seed)
    nodes = []
    nid = 100
    # uniform grid
    for lon in range(-170, 171, 20):
        for lat in range(-80, 81, 20):
            nodes.append((nid, lon * 10**7 + int(rng.integers(-5e6, 5e6)),
                          lat * 10**7 + int(rng.integers(-5e6, 5e6))))
            nid += 1
    # midline-straddle cluster (buffer edge cases around lon=0, lat=0)
    for _ in range(300):
        nodes.append((nid, int(rng.integers(-200000, 200000)), int(rng.integers(-200000, 200000))))
        nid += 1
    # hot cluster
    for _ in range(500):
        nodes.append((nid, int(rng.integers(-1000000, 1000000)),
                      514000000 + int(rng.integers(0, 2000000))))
        nid += 1
    node_ids = [n[0] for n in nodes]

    ways = []
    wid = 5000
    for _ in range(350):
        k = int(rng.integers(2, 12))
        refs = list(rng.choice(node_ids, size=k, replace=False).tolist())
        if rng.random() < 0.2 and k >= 3:
            refs.append(refs[0])  # closed ring
        ways.append((wid, [int(r) for r in refs]))
        wid += 1
    ways.append((wid, [1, 2, 3]))  # fully-dangling way (missing nodes) → qt -1
    dangling_way = wid
    wid += 1
    ways.append((wid, [int(node_ids[0]), 999999]))  # partially missing
    wid += 1

    rels = []
    rid = 9000
    for i in range(40):
        k = int(rng.integers(1, 6))
        members = []
        for _ in range(k):
            if rng.random() < 0.5:
                members.append((0, int(rng.choice(node_ids))))
            else:
                members.append((1, int(rng.integers(5000, wid))))
        rels.append((rid, members))
        rid += 1
    # 3-level nested chains, including forward references (child id > parent)
    rels.append((rid, [(2, rid + 1), (0, int(node_ids[5]))])); rid += 1
    rels.append((rid, [(2, rid + 1)])); rid += 1
    rels.append((rid, [(0, int(node_ids[100])), (0, int(node_ids[200]))])); rid += 1
    # backward chain
    rels.append((rid, [(0, int(node_ids[50]))])); back_leaf = rid; rid += 1
    rels.append((rid, [(2, back_leaf)])); rid += 1
    # empty relation → 0; relation with only missing members → 0
    rels.append((rid, [])); rid += 1
    rels.append((rid, [(0, 31337), (1, 31338), (2, 31339)])); rid += 1
    # relation containing itself among others (self-loop edge)
    rels.append((rid, [(2, rid), (1, 5000)])); rid += 1
    return nodes, ways, rels, dangling_way


def to_spark(spark, nodes, ways, rels):
    ndf = spark.createDataFrame(nodes, "node_id bigint, lon bigint, lat bigint")
    wdf = spark.createDataFrame(
        [(w, refs) for w, refs in ways], "way_id bigint, refs array<bigint>"
    )
    member_t = StructType(
        [StructField("m_type", IntegerType()), StructField("m_ref", LongType())]
    )
    rdf = spark.createDataFrame(
        [Row(rel_id=r, members=[Row(m_type=t, m_ref=m) for t, m in ms]) for r, ms in rels],
        StructType(
            [StructField("rel_id", LongType()), StructField("members", ArrayType(member_t))]
        ),
    )
    return ndf, wdf, rdf


@pytest.mark.parametrize("depth", [17, 18])
def test_calcqts_row_for_row(spark, depth):
    nodes, ways, rels, dangling_way = make_fixture()
    onode, oway, orel = calc_all_scalar(nodes, ways, rels, 0.05, depth)

    ndf, wdf, rdf = to_spark(spark, nodes, ways, rels)
    out = calc_all_quadtrees(ndf, wdf, rdf, 0.05, depth)

    got_way = {r.way_id: r.qt for r in out["ways"].collect()}
    # engine omits fully-dangling ways (inner join); reference marks them -1
    assert dangling_way not in got_way
    assert oway[dangling_way] == -1
    for wid, q in oway.items():
        if wid != dangling_way:
            assert got_way[wid] == q, f"way {wid}"

    got_node = {r.node_id: r.qt for r in out["nodes"].collect()}
    assert got_node == onode

    got_rel = {r.rel_id: r.qt for r in out["relations"].collect()}
    assert got_rel == orel


def test_closure_is_order_exact(spark):
    """A 3-deep forward chain only partially converges per sequential pass;
    after exactly 5 passes the reference result is a specific fixpoint that a
    naive Jacobi (parallel self-join) iteration could miss — pin it."""
    nodes = [(1, 100000000, 100000000), (2, -900000000, -400000000)]
    ways = []
    rels = [
        (10, [(2, 11)]),
        (11, [(2, 12)]),
        (12, [(0, 1)]),
        (13, [(2, 10), (0, 2)]),
    ]
    onode, oway, orel = calc_all_scalar(nodes, ways, rels)
    ndf, wdf, rdf = to_spark(spark, nodes, ways, rels)
    wdf = spark.createDataFrame([], "way_id bigint, refs array<bigint>")
    out = calc_all_quadtrees(ndf, wdf, rdf)
    got_rel = {r.rel_id: r.qt for r in out["relations"].collect()}
    assert got_rel == orel
    # rel 12 carries node 1's cell; 11 and 10 inherit it through the closure
    assert got_rel[12] == onode[1]
