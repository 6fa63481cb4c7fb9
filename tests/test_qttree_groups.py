"""Tile-split grouping tests (reference: qttree.cpp, qttreegroups.cpp).

``find_groups`` is the observable tile-splitting contract: group cell ids,
group counts, and 1..n DFS numbering. Tests check conservation, numbering,
band thresholds, and that the vectorized assignment kernel agrees with the
scalar ``find_tile`` walk element-for-element.

Reference nuance encoded below: ``find_groups_copy`` only clips nodes with
weight != 0, and without ``tree_rollup`` all weight of point-like data sits
at the tree's max level — so targets far above leaf counts fall back to the
root-remainder path, and targets far below leaf counts can yield *zero*
groups (every element then lands in the root tile via find_tile). That is
the reference CLI's behavior too (rollup defaults false,
/root/reference/example/oqt_main.cpp:207,371-374).
"""

import numpy as np

from osmquadtree_spark.kernels import quadtree as qtk
from osmquadtree_spark.plans.qttree import (
    QtTree,
    assign_groups,
    find_groups,
    group_table,
    tree_rollup,
)


def _element_qts(rng, n=60000, hot_frac=0.3):
    """Synthetic element cells: uniform sprinkle + a hot cluster (skew)."""
    lon = rng.integers(-1800000000, 1800000000, n)
    lat = rng.integers(-850000000, 850000000, n)
    k = int(n * hot_frac)  # hot cluster around a city-sized box
    lon[:k] = rng.integers(-1000000, 1000000, k)
    lat[:k] = rng.integers(514000000, 516000000, k)
    return qtk.calculate(lon, lat, lon, lat, 0.05, 17)


def _tree_from_elements(qts, maxlevel=15):
    vals, counts = np.unique(qtk.round_qt(qts, maxlevel), return_counts=True)
    return QtTree.from_counts(vals, counts, maxlevel)


def test_tree_totals_and_weights():
    rng = np.random.default_rng(101)
    qts = _element_qts(rng, 20000)
    tree = _tree_from_elements(qts)
    assert tree.at(0).total == len(qts)
    # every node's total == own weight + sum of children totals
    for i, t in enumerate(tree.items):
        csum = sum(tree.at(c).total for c in t.children if c != 0)
        assert t.total == t.weight + csum, i
    # DFS via next() visits strictly increasing qt (preorder = numeric order)
    i, prev = 0, -1
    seen = 0
    while i < tree.size():
        t = tree.at(i)
        assert t.qt > prev or i == 0
        prev = t.qt
        seen += 1
        i = tree.next(i)
    assert seen == tree.size()


def test_find_tile_walks_up():
    tree = QtTree()
    b = qtk.from_string_scalar("B")
    bc = qtk.from_string_scalar("BC")
    bcd = qtk.from_string_scalar("BCD")
    tree.add(b, 5)
    tree.add(bcd, 7)
    assert tree.find_tile(bcd).qt == bcd
    # deeper query → nearest weighted ancestor
    assert tree.find_tile(qtk.from_string_scalar("BCDA")).qt == bcd
    # node exists but weight 0 (BC is an intermediate) → climb to B
    assert tree.find_tile(bc).qt == b
    # unrelated subtree → root (qt 0, weight 0 — reference stops at qt==0)
    assert tree.find_tile(qtk.from_string_scalar("D")).qt == 0


def test_rollup_absorbs_small_children():
    tree = QtTree()
    parent = qtk.from_string_scalar("B")
    small = qtk.from_string_scalar("BA")
    big = qtk.from_string_scalar("BB")
    tree.add(small, 10)
    tree.add(big, 1000)
    tree.add(parent, 1)
    tree_rollup(tree, minsize=50)
    # BA (total 10 < 50) absorbed into B's weight; BB survives
    pb = tree.at(tree.find(parent))
    assert pb.weight == 11
    assert tree.find(small) == tree.find(parent)  # BA detached
    assert tree.at(tree.find(big)).qt == big
    assert tree.at(0).total == 1011  # totals conserved


def test_no_rollup_reference_semantics():
    """Without rollup, point-data trees have weight only at max level:
    a target ≫ leaf counts collapses into the root-remainder group, and a
    target ≪ total with max-band < total yields zero groups (all elements →
    root tile). Both are the reference CLI's default behavior."""
    qts = _element_qts(np.random.default_rng(202), 60000)
    tree = _tree_from_elements(qts)
    groups = find_groups(tree, 40000, 20000)
    gqt, _, gweight = group_table(groups)
    assert gqt.tolist() == [0]
    assert gweight.tolist() == [60000]

    tree = _tree_from_elements(qts)
    groups = find_groups(tree, 1000, 500)
    gqt, _, gweight = group_table(groups)
    assert len(gqt) == 0  # 50*target < total: band cap hit before remainder
    assigned = assign_groups(qts, gqt)
    assert (assigned == 0).all()  # find_tile falls to root for every element


def test_find_groups_conservation_and_numbering():
    qts = _element_qts(np.random.default_rng(303), 60000)
    for target, minsize in ((40000, 20000), (1000, 500), (100, 50)):
        tree = _tree_from_elements(qts)
        tree_rollup(tree, minsize)
        groups = find_groups(tree, target, minsize)
        gqt, gidx, gweight = group_table(groups)
        # conservation: group weights partition all elements
        assert gweight.sum() == len(qts)
        # numbering: 1..n in DFS (= sorted qt) order
        assert gidx.tolist() == list(range(1, len(gidx) + 1))
        assert (gweight > 0).all()


def test_group_sizes_respect_band():
    qts = _element_qts(np.random.default_rng(404), 60000, hot_frac=0.5)
    tree = _tree_from_elements(qts)
    target, minsize = 1000, 500
    tree_rollup(tree, minsize)
    groups = find_groups(tree, target, minsize)
    _, _, gweight = group_table(groups)
    # the hot cluster must be split: band widening stops at max > 50*target
    assert gweight.max() <= 50 * target + 50
    # most groups should be ≥ minsize (residual sweep-up groups may be smaller)
    assert (gweight < minsize).mean() < 0.5


def test_assign_matches_scalar_find_tile():
    qts = _element_qts(np.random.default_rng(505), 30000)
    tree = _tree_from_elements(qts)
    tree_rollup(tree, 500)
    groups = find_groups(tree, 1000, 500)
    gqt, _, _ = group_table(groups)
    assigned = assign_groups(qts, gqt)
    for i in range(0, len(qts), 101):
        assert assigned[i] == groups.find_tile(int(qts[i])).qt, i
    # every element lands in a group that is its ancestor-or-equal (or root)
    anc_ok = qtk.is_ancestor(assigned, qts) | (assigned == 0)
    assert anc_ok.all()


def test_assigned_counts_match_group_weights():
    """Per-group element counts from the vectorized assignment must equal the
    group weights the greedy algorithm reported (the reference's 'same group
    counts' output contract)."""
    qts = _element_qts(np.random.default_rng(606), 60000)
    for target, minsize in ((1000, 500), (100, 50)):
        tree = _tree_from_elements(qts)
        tree_rollup(tree, minsize)
        groups = find_groups(tree, target, minsize)
        gqt, _, gweight = group_table(groups)
        assigned = assign_groups(qts, gqt)
        got_qt, got_counts = np.unique(assigned, return_counts=True)
        assert dict(zip(got_qt.tolist(), got_counts.tolist())) == dict(
            zip(gqt.tolist(), gweight.tolist())
        )


def test_determinism():
    qts = _element_qts(np.random.default_rng(7), 30000)
    outs = []
    for _ in range(2):
        tree = _tree_from_elements(qts)
        tree_rollup(tree, 500)
        outs.append(group_table(find_groups(tree, 1000, 500)))
    for a, b in zip(*outs):
        assert np.array_equal(a, b)


def test_array_tree_equivalence():
    """QtTreeArr.build / tree_rollup_arr must be structurally identical to
    the sequential reference ports (same node set, weights, totals, and
    find_groups output)."""
    from osmquadtree_spark.plans.qttree import QtTreeArr, tree_rollup_arr

    qts = _element_qts(np.random.default_rng(707), 40000)
    cells, counts = np.unique(qtk.round_qt(qts, 15), return_counts=True)

    slow = QtTree.from_counts(cells, counts, 15)
    fast = QtTreeArr.build(cells, counts, 15)
    sq = sorted((t.qt, t.weight, t.total) for t in slow.items)
    fq = sorted(zip(fast.qt.tolist(), fast.weight.tolist(), fast.total.tolist()))
    assert sq == fq

    tree_rollup(slow, 500)
    fr = tree_rollup_arr(fast, 500)
    surv = []
    i = 0
    while i < slow.size():
        t = slow.at(i)
        surv.append((t.qt, t.weight, t.total))
        i = slow.next(i)
    assert sorted(surv) == sorted(zip(fr.qt.tolist(), fr.weight.tolist(), fr.total.tolist()))

    g1 = group_table(find_groups(slow, 1000, 500))
    g2 = group_table(find_groups(fr, 1000, 500))
    for x, y in zip(g1, g2):
        assert np.array_equal(x, y)


def test_from_rolled_nodes_equivalence():
    """The survivor-tree constructor (fed by the Spark-side rollup aggregate)
    must equal tree_rollup_arr(QtTreeArr.build(...)): same nodes, weights,
    totals, and identical find_groups output — for several minsizes and for
    both clustered and uniform cell distributions."""
    from osmquadtree_spark.plans.qttree import QtTreeArr, tree_rollup_arr

    rng = np.random.default_rng(808)
    for hot in (0.0, 0.5):
        qts = _element_qts(rng, 40000, hot_frac=hot)
        cells, counts = np.unique(qtk.round_qt(qts, 15), return_counts=True)
        for minsize, target in ((500, 1000), (50, 100), (20000, 40000)):
            full = tree_rollup_arr(QtTreeArr.build(cells, counts, 15), minsize)
            # what the Spark aggregate produces: per-level ancestor totals of
            # surviving nodes (total >= minsize, root always kept)
            node_totals = {}
            for lv in range(16):
                anc = qtk.round_qt(cells, lv)
                for a, c in zip(anc.tolist(), counts.tolist()):
                    node_totals[a] = node_totals.get(a, 0) + int(c)
            # a cell shallower than lv rounds to itself — dedupe per cell/level
            node_totals = {}
            for cell, cnt in zip(cells.tolist(), counts.tolist()):
                seen = set()
                for lv in range(16):
                    a = int(qtk.round_qt(np.asarray([cell]), lv)[0])
                    if a not in seen:
                        seen.add(a)
                        node_totals[a] = node_totals.get(a, 0) + int(cnt)
            surv = {q: t for q, t in node_totals.items() if t >= minsize or q == 0}
            got = QtTreeArr.from_rolled_nodes(
                np.asarray(list(surv.keys()), dtype=np.int64),
                np.asarray(list(surv.values()), dtype=np.int64),
            )
            assert sorted(zip(got.qt.tolist(), got.weight.tolist(), got.total.tolist())) == sorted(
                zip(full.qt.tolist(), full.weight.tolist(), full.total.tolist())
            )
            g1 = group_table(find_groups(full, target, minsize))
            g2 = group_table(find_groups(got, target, minsize))
            for x, y in zip(g1, g2):
                assert np.array_equal(x, y)
