"""Driver-side quadtree count tree + tile-split grouping.

This is the reference's "data-layout optimizer": build a count tree over cell
ids (rounded to a tree level), coarsen small subtrees (``tree_rollup``), then
greedily clip subtrees of ~targetsize elements into numbered groups
(``find_groups``). The greedy traversal order, the ±50 band widening, and the
DFS group numbering are part of the observable output, so this is an exact
re-statement of the reference algorithm (semantics from
/root/reference/src/sorting/qttree.cpp:110-212 and
/root/reference/src/sorting/qttreegroups.cpp:36-264) in pure Python.

At cluster scale the inputs here are tiny: a planet-size dataset has ≲150k
distinct level-15 cells, so the tree lives on the driver and the resulting
group table is broadcast; per-row assignment is the vectorized
``assign_groups`` kernel run inside pandas UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..kernels import quadtree as qtk


@dataclass
class _Item:
    qt: int = 0
    parent: int = 0
    idx: int = 0
    weight: int = 0
    total: int = 0
    children: list[int] = field(default_factory=lambda: [0, 0, 0, 0])


class QtTree:
    """Array-backed quadtree of (qt, weight, total) items.

    Mirrors the reference QtTree contract (qttree.cpp:73-213): item 0 is the
    root (qt=0); ``add`` accumulates ``total`` along the root→qt path and
    ``weight`` at the exact node; ``next`` walks DFS in qt order; ``find``
    descends to the deepest existing node on a qt's path; ``find_tile``
    additionally climbs to the nearest ancestor with weight > 0.
    """

    def __init__(self) -> None:
        self.items: list[_Item] = [_Item()]
        self._next_idx = 1

    def __len__(self) -> int:
        return len(self.items)

    def size(self) -> int:
        return len(self.items)

    def at(self, i: int) -> _Item:
        return self.items[i]

    def find(self, qt: int, curr: int = 0) -> int:
        while True:
            t = self.items[curr]
            if t.qt == qt:
                return curr
            c = (qt >> (61 - 2 * (t.qt & 31))) & 3
            if t.children[c] == 0:
                return curr
            curr = t.children[c]

    def add(self, qt: int, val: int) -> int:
        curr = 0
        while True:
            t = self.items[curr]
            t.total += val
            if t.qt == qt:
                if t.idx == 0:
                    t.idx = self._next_idx
                    self._next_idx += 1
                t.weight += val
                return curr
            c = (qt >> (61 - 2 * (t.qt & 31))) & 3
            if t.children[c] == 0:
                qtr = qtk.round_scalar(qt, (t.qt & 31) + 1)
                self.items.append(_Item(qt=qtr, parent=curr))
                t.children[c] = len(self.items) - 1
            curr = t.children[c]

    def next(self, curr: int, c: int = 0) -> int:
        # DFS successor starting from child slot c (qttree.cpp:150-161)
        while True:
            t = self.items[curr]
            for ci in range(c, 4):
                if t.children[ci] != 0:
                    return t.children[ci]
            if t.parent == curr:
                return len(self.items)
            pc = (t.qt >> (63 - 2 * (t.qt & 31))) & 3
            curr, c = t.parent, pc + 1

    def rollup_child(self, curr: int, ci: int) -> None:
        t = self.items[curr]
        if t.children[ci] == 0:
            return
        ct = self.items[t.children[ci]]
        t.weight += ct.total
        t.children[ci] = 0

    def find_tile(self, qt: int) -> _Item:
        t = self.items[self.find(qt)]
        while t.weight == 0 and t.qt != 0:
            t = self.items[t.parent]
        return t

    # -- construction helpers --------------------------------------------

    @classmethod
    def from_counts(cls, qts, counts, maxlevel: int = 15) -> "QtTree":
        """Build the count tree from a (qt, count) histogram, rounding each
        cell to ``maxlevel`` (AddCountMapTree semantics, qttree.cpp:240-266).
        Negative cell ids are skipped, as in the reference.
        """
        tree = cls()
        qts = np.asarray(qts, dtype=np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        rounded = qtk.round_qt(qts, maxlevel)
        for q, c in zip(rounded.tolist(), counts.tolist()):
            if q >= 0:
                tree.add(q, int(c))
        return tree


def tree_rollup(tree: QtTree, minsize: int) -> None:
    """Bottom-up (depth 17→0): absorb children with total < minsize into the
    parent's weight (qttreegroups.cpp:149-172)."""
    for j in range(18):
        k = 17 - j
        i = 0
        while i < tree.size():
            t = tree.at(i)
            if (t.qt & 31) == k:
                for ci in range(4):
                    ch = t.children[ci]
                    if ch != 0 and tree.at(ch).total < minsize:
                        tree.rollup_child(i, ci)
            i = tree.next(i)


def _clip_within_copy(tree: QtTree, result: QtTree, mn: int, mx: int, absmin: int):
    """One greedy clipping sweep (qttreegroups.cpp:36-95)."""
    cc = 0
    sz = 0
    qq = 0
    i = 0
    while i < tree.size():
        t = tree.at(i)
        if t.qt < qq:
            raise ValueError("out of order")
        qq = t.qt
        t_total = t.total
        result_tile = result.at(result.find(qq))
        if result_tile.qt == t.qt:
            t_total -= result_tile.total
        if t_total >= mn:
            alls = True
            for ji in range(4):
                j = t.children[ji]
                if j > 0:
                    ct_total = tree.at(j).total
                    if result_tile.qt == t.qt and result_tile.children[ji] > 0:
                        ct_total -= result.at(result_tile.children[ji]).total
                    if ct_total > absmin:
                        alls = False
                        break
            if t.weight != 0 and (t_total == t.weight or t_total <= mx or alls):
                cc += 1
                sz += t_total
                result.add(qq, t_total)
                i = tree.next(i, 4)
            else:
                i = tree.next(i, 0)
        else:
            i = tree.next(i, 4)
    return cc, sz


def find_groups(tree: QtTree, target: int = 40000, minsize: int = 20000) -> QtTree:
    """Greedy tile grouping (find_groups_copy, qttreegroups.cpp:200-264).

    Returns a group tree whose weight>0 nodes are the groups, numbered 1..n
    in DFS (= numeric qt) order via ``idx``.
    """
    result = QtTree()
    mn = target - 50
    mx = target + 50
    while tree.at(0).total > result.at(0).total:
        while True:
            t0 = tree.at(0)
            r0 = result.at(0)
            if t0.total == r0.total:
                break
            rem = t0.total - r0.total
            if rem < mx or rem == t0.weight:
                result.add(0, rem)
                break
            cc, _ = _clip_within_copy(tree, result, mn, mx, minsize)
            if cc == 0:
                break
        mn -= 50
        mx += 50
        if mn < minsize:
            mn = minsize
        if mx > 50 * target:
            break
    # renumber groups 1..n in DFS order (qttreegroups.cpp:247-260)
    idx = 1
    i = 0
    while i < result.size():
        t = result.at(i)
        if t.weight != 0:
            t.idx = idx
            idx += 1
        i = result.next(i, 0)
    return result


def group_table(result: QtTree) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten the weight>0 groups of a group tree → (qt, idx, weight) arrays
    sorted by qt (DFS order). This is the broadcast-able assignment table."""
    rows = [(t.qt, t.idx, t.weight) for t in result.items if t.weight != 0]
    rows.sort()
    if not rows:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    qt, idx, weight = map(np.asarray, zip(*rows))
    return qt.astype(np.int64), idx.astype(np.int64), weight.astype(np.int64)


class QtTreeArr:
    """Array-backed count tree with the same structural contract as
    :class:`QtTree`, built vectorized (no per-cell Python walk). Node order
    is sorted by cell id = DFS preorder, root first. Used for planet-scale
    histograms where the per-item-object tree costs tens of seconds.

    Equivalence with the per-item reference port is asserted in
    tests/test_qttree_groups.py (same node set, totals, weights, rollup
    result, and find_groups output).
    """

    def __init__(self, qt, parent, children, weight, total):
        self.qt = qt
        self.parent = parent
        self.children = children
        self.weight = weight
        self.total = total

    @classmethod
    def build(cls, cells, counts, maxlevel: int = 15) -> "QtTreeArr":
        cells = np.asarray(cells, dtype=np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        keep = cells >= 0
        cells = qtk.round_qt(cells[keep], maxlevel)
        counts = counts[keep]
        # aggregate duplicate cells
        ucells, inv = np.unique(cells, return_inverse=True)
        ucounts = np.bincount(inv, weights=counts).astype(np.int64)
        depths = (ucells & 31).astype(np.int64)

        # node set: every prefix of every cell (round at L for depth ≥ L)
        parts = [np.zeros(1, dtype=np.int64)]  # root
        for lv in range(1, maxlevel + 1):
            sel = depths >= lv
            if not sel.any():
                break
            parts.append(np.unique(qtk.round_qt(ucells[sel], lv)))
        nodes = np.unique(np.concatenate(parts))
        n = len(nodes)

        total = np.zeros(n, dtype=np.int64)
        for lv in range(0, maxlevel + 1):
            sel = depths >= lv
            if not sel.any():
                break
            anc = qtk.round_qt(ucells[sel], lv)
            u, ainv = np.unique(anc, return_inverse=True)
            sums = np.bincount(ainv, weights=ucounts[sel]).astype(np.int64)
            total[np.searchsorted(nodes, u)] += sums

        weight = np.zeros(n, dtype=np.int64)
        weight[np.searchsorted(nodes, ucells)] = ucounts

        ndep = (nodes & 31).astype(np.int64)
        parent = np.zeros(n, dtype=np.int64)
        children = np.zeros((n, 4), dtype=np.int64)
        nonroot = np.where(ndep > 0)[0]
        if len(nonroot):
            pd = ndep[nonroot] - 1
            sh = 63 - 2 * pd
            par_qt = ((nodes[nonroot] >> sh) << sh) + pd
            ppos = np.searchsorted(nodes, par_qt)
            parent[nonroot] = ppos
            digit = (nodes[nonroot] >> (63 - 2 * ndep[nonroot])) & 3
            children[ppos, digit] = nonroot
        return cls(nodes, parent, children, weight, total)

    @classmethod
    def from_rolled_nodes(cls, qts: np.ndarray, totals: np.ndarray) -> "QtTreeArr":
        """Build a post-rollup survivor tree directly from (qt, total) rows
        of nodes with total >= minsize (ancestor-closed because a parent's
        total bounds its children's). Rolled weight = total − Σ surviving
        children totals — identical to ``tree_rollup_arr(build(...))``."""
        order = np.argsort(qts, kind="stable")
        qt = np.asarray(qts, dtype=np.int64)[order]
        total = np.asarray(totals, dtype=np.int64)[order]
        if len(qt) == 0:
            qt = np.zeros(1, dtype=np.int64)
            total = np.zeros(1, dtype=np.int64)
        elif qt[0] != 0:
            # ancestor-closure means the root (ancestor of everything) is
            # present whenever the set is non-empty; fabricating it as
            # total.sum() would double-count (every node's total already
            # includes its surviving descendants) — refuse bad input loudly
            raise ValueError(
                "survivor rows are not ancestor-closed: root (qt=0) missing"
            )
        n = len(qt)
        dep = (qt & 31).astype(np.int64)
        parent = np.zeros(n, dtype=np.int64)
        children = np.zeros((n, 4), dtype=np.int64)
        nonroot = np.where(dep > 0)[0]
        if len(nonroot):
            pd_ = dep[nonroot] - 1
            sh = 63 - 2 * pd_
            par_qt = ((qt[nonroot] >> sh) << sh) + pd_
            ppos = np.searchsorted(qt, par_qt)
            parent[nonroot] = ppos
            digit = (qt[nonroot] >> (63 - 2 * dep[nonroot])) & 3
            children[ppos, digit] = nonroot
        child_sum = np.zeros(n, dtype=np.int64)
        if len(nonroot):
            np.add.at(child_sum, parent[nonroot], total[nonroot])
        return cls(qt, parent, children, total - child_sum, total)

    def size(self) -> int:
        return len(self.qt)

    def at(self, i: int) -> _Item:
        return _Item(
            qt=int(self.qt[i]),
            parent=int(self.parent[i]),
            idx=0,
            weight=int(self.weight[i]),
            total=int(self.total[i]),
            children=[int(c) for c in self.children[i]],
        )

    def next(self, curr: int, c: int = 0) -> int:
        while True:
            row = self.children[curr]
            for ci in range(c, 4):
                if row[ci] != 0:
                    return int(row[ci])
            p = int(self.parent[curr])
            if p == curr:
                return len(self.qt)
            q = int(self.qt[curr])
            pc = (q >> (63 - 2 * (q & 31))) & 3
            curr, c = p, pc + 1


def tree_rollup_arr(tree: QtTreeArr, minsize: int) -> QtTreeArr:
    """Vectorized tree_rollup: totals are invariant under rollup and child
    total ≤ parent total, so a non-root node survives iff total ≥ minsize;
    a surviving node's weight absorbs the totals of its sub-minsize
    children. Proven equivalent to the sequential reference port in tests."""
    survive = (tree.total >= minsize) | (np.arange(tree.size()) == 0)
    absorbed = np.zeros(tree.size(), dtype=np.int64)
    child = tree.children  # (n, 4)
    for c in range(4):
        ch = child[:, c]
        mask = (ch != 0) & survive & ~survive[ch]  # parent survives, child absorbed
        absorbed[mask] += tree.total[ch[mask]]
    keep = np.where(survive)[0]
    remap = -np.ones(tree.size(), dtype=np.int64)
    remap[keep] = np.arange(len(keep))
    new_children = child[keep].copy()
    for c in range(4):
        col = new_children[:, c]
        live = (col != 0) & (remap[col] >= 0)
        new_children[:, c] = np.where(live, remap[col], 0)
    return QtTreeArr(
        tree.qt[keep],
        np.maximum(remap[tree.parent[keep]], 0),
        new_children,
        tree.weight[keep] + absorbed[keep],
        tree.total[keep],
    )


def assign_groups(qts, group_qts: np.ndarray) -> np.ndarray:
    """Vectorized ``find_tile``: map each element cell id to its group cell id.

    ``find_tile`` (qttree.cpp:205-212) resolves to the *deepest* group node
    that is an ancestor-or-equal of the element's cell (falling back to the
    root, qt=0). Implemented as ≤18 hash-set probes, one per level, deepest
    first — O(levels · N) with no python-level row loop.

    ``group_qts`` must be the qt column from :func:`group_table` (sorted).
    """
    qts = np.asarray(qts, dtype=np.int64)
    out = np.zeros(qts.shape, dtype=np.int64)  # default: root group (qt 0)
    done = np.zeros(qts.shape, dtype=bool)
    if group_qts.size == 0:
        return out
    levels = np.unique(group_qts & 31)[::-1]  # deepest first
    for lv in levels.tolist():
        cand = group_qts[(group_qts & 31) == lv]
        anc = qtk.round_qt(qts, int(lv))
        eligible = ~done & ((qts & 31) >= lv)
        hit = eligible & np.isin(anc, cand)
        out = np.where(hit, anc, out)
        done |= hit
    return out
