"""Cross-engine deterministic string hash (polynomial codepoint fold).

Both the Bloom-filter decontamination gate and the DSIR importance-weight
gate need a hash of an arbitrary STRING that the DuckDB oracle can
recompute bit-for-bit. Spark's ``xxhash64`` has no DuckDB twin and
DuckDB's ``hash()`` has no Spark twin, so the shared definition is the
classic polynomial fold (public-domain construction — the Java
``String.hashCode`` / Rabin-Karp shape, widened to 64 bits):

    h(s) = fold over unicode codepoints cp_i of s:
           h_0 = SEED;  h_{i+1} = (h_i * 31 + cp_i)  mod 2^64

which DuckDB restates exactly as

    list_reduce(list_prepend(SEED, codepoints), (a, c) -> (a*31 + c) % 2^64)

over ``HUGEINT`` (see functions/sql_oracle.polyhash64_sql). Closed form
used by the vectorized kernel:

    h(s) = SEED * 31^L  +  sum_i cp_i * 31^(L-1-i)      (mod 2^64)

so a batch of strings hashes as one power-table gather + one
``np.add.reduceat`` segment sum in uint64 (wraparound is the point — the
same trick as text_analysis_vectorized's rolling fingerprint,
operators/docs.py:182).

Codepoints, not UTF-8 bytes: DuckDB's ``string_split(s, '')`` +
``unicode(c)`` walks codepoints, and Python's ``ord`` iteration matches
it for every plane (pinned in tests/test_strhash.py, including
non-ASCII). The kernel takes the bytes fast path only for pure-ASCII
batches, where bytes ARE codepoints.
"""

from __future__ import annotations

import numpy as np

SEED = 1469598103934665603  # FNV-1a 64-bit offset basis (public constant)
_B = np.uint64(31)
MASK64 = (1 << 64) - 1


def polyhash64_one(s: str) -> int:
    """Scalar reference (exact spec; the kernel must match this)."""
    h = SEED
    for ch in s:
        h = (h * 31 + ord(ch)) & MASK64
    return h


def _pow31(n: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        out = np.ones(max(n, 1), dtype=np.uint64)
        for i in range(1, len(out)):
            out[i] = out[i - 1] * _B
        return out


def polyhash64(strings) -> np.ndarray:
    """Vectorized polyhash64 over a sequence of str → uint64 ndarray.

    One concatenated codepoint array + reduceat segment sum; Python-level
    per-string work is O(1) except on batches containing non-ASCII text,
    where the affected strings decode via an ``ord`` loop (exact, slower
    — the synthetic corpus is ASCII so the fast path always runs there).
    """
    n = len(strings)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    joined = "".join(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    raw = joined.encode("utf-8")
    if len(raw) == len(joined):  # pure ASCII: bytes == codepoints
        cps = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    else:
        cps = np.fromiter(map(ord, joined), dtype=np.uint64, count=len(joined))
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pow_tab = _pow31(int(lens.max()) + 1)
    # position of each codepoint within its string, then exponent L-1-pos
    pos = np.arange(len(cps), dtype=np.int64) - np.repeat(starts, lens)
    exp = np.repeat(lens, lens) - 1 - pos
    with np.errstate(over="ignore"):
        terms = cps * pow_tab[exp]
        # reduceat needs non-empty segments; empty strings contribute 0
        sums = np.zeros(n, dtype=np.uint64)
        nz = lens > 0
        if cps.size:
            red_starts = starts[nz]
            sums[nz] = np.add.reduceat(terms, red_starts)
        return np.uint64(SEED) * pow_tab[lens] + sums
