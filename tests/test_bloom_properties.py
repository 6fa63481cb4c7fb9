"""Pure-numpy property tests for the Bloom/DSIR batch kernels — no Spark
session, so hypothesis can run hundreds of randomized corpora: gram
extraction vs a scalar reference, probe hit counts vs a brute-force
membership check (the no-false-negative guarantee at the kernel level),
and DSIR bucket bags vs a Counter reference."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from osmquadtree_spark.kernels.strhash import polyhash64, polyhash64_one
from osmquadtree_spark.operators.bloom import _gram_strings, _positions
from osmquadtree_spark.operators.dsir import _bucket_counts

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=12)


def _scalar_grams(texts, n):
    out = []
    for i, t in enumerate(texts):
        words = t.split(" ")
        for j in range(len(words) - n + 1):
            out.append((i, " ".join(words[j : j + n])))
    return out


@settings(max_examples=150, deadline=None)
@given(CORPUS, st.integers(1, 4))
def test_gram_strings_match_scalar(texts, n):
    row, g = _gram_strings(pd.Series(texts), n)
    assert sorted(zip(row.tolist(), g.tolist())) == sorted(_scalar_grams(texts, n))


@settings(max_examples=100, deadline=None)
@given(CORPUS, CORPUS, st.integers(1, 3), st.integers(1, 5))
def test_probe_never_misses_bench_grams(bench, train, n, k):
    """Kernel-level no-false-negative: set the bits of every bench gram,
    then every train gram that IS a bench gram must test fully set."""
    m_bits = 1 << 12
    _, bg = _gram_strings(pd.Series(bench), n)
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(bg):
        pos = _positions(polyhash64(list(bg)), k, m_bits).ravel()
        np.bitwise_or.at(
            bitmap, (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)),
        )
    bench_grams = {g for _, g in _scalar_grams(bench, n)}
    row, tg = _gram_strings(pd.Series(train), n)
    if not len(tg):
        return
    pos = _positions(polyhash64(list(tg)), k, m_bits)
    byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
    bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    member = bit.all(axis=1)
    for g, hit in zip(tg, member):
        if g in bench_grams:
            assert hit, g


@settings(max_examples=150, deadline=None)
@given(CORPUS, st.integers(2, 3), st.integers(4, 64))
def test_bucket_counts_match_counter(texts, n, n_buckets):
    row, b, c = _bucket_counts(pd.Series(texts), n, n_buckets)
    got = {}
    for r, bb, cc in zip(row.tolist(), b.tolist(), c.tolist()):
        got[(r, bb)] = cc
    ref = {}
    for r, g in _scalar_grams(texts, n):
        key = (r, polyhash64_one(g) % n_buckets)
        ref[key] = ref.get(key, 0) + 1
    assert got == ref


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=20),
       st.integers(1, 6), st.sampled_from([1 << 8, 1 << 12, 1 << 16]))
def test_positions_in_range_and_deterministic(hashes, k, m_bits):
    h = np.array(hashes, dtype=np.uint64)
    p1 = _positions(h, k, m_bits)
    p2 = _positions(h.copy(), k, m_bits)
    assert p1.shape == (len(hashes), k)
    assert (p1 < m_bits).all()
    np.testing.assert_array_equal(p1, p2)
