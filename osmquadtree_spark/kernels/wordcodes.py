"""Vectorized single-space word-split → word-code extraction.

The MinHash and SimHash signature kernels both start from the same
per-word code over a doc's single-space split:

    code(w) = len(w)·97 + ord(first_char) + ord(last_char)·31   (0 for "")

— the formula the DuckDB oracles restate as
``length(w)*97 + ascii(w[1]) + ascii(w[-1])*31`` (DuckDB ``ascii`` returns
the CODEPOINT of the first character, so codepoints — not UTF-8 bytes —
are the pinned semantics).

The original extraction (``.str.split(" ")`` + ``.explode()`` + per-word
``len``/``ord`` comprehensions) allocates one Python str per word — tens
of millions of small objects per batch at scale. That allocator traffic is
what a stage-isolated scaling probe showed NOT scaling across cores
(signature stage ~0.55 efficiency 2→8 pinned cores while the join stages
scaled ≥1): every Python worker hammers the shared memory bus with small
allocations. This module extracts identical ``(row, code)`` arrays from a
fixed-width UCS4 codepoint matrix instead — one ``astype('U')`` copy, then
pure int32/int64 numpy — with the object path kept as the single fallback
definition for batches where the fixed-width matrix would blow up memory
(one megabyte-long doc in a 100k-row batch widens EVERY row to the max
length; the matrix is batch_rows × max_len × 4 bytes).

Word semantics are exactly ``text.split(" ")``: consecutive spaces yield
empty words (code 0), a leading/trailing space yields an empty first/last
word, and the empty string yields ONE empty word — all preserved, because
gram positions downstream shift if empties are dropped.
"""

from __future__ import annotations

import numpy as np

# fixed-width matrix budget per batch; above this the object path runs.
# 256 MiB ≈ a 128k-row Arrow batch of 512-char docs — comfortably above
# the documents-table shape, small enough to never double a worker's RSS.
MAX_MATRIX_BYTES = 256 * 1024 * 1024


def word_codes_obj(texts) -> tuple[np.ndarray, np.ndarray]:
    """Reference/object-path extraction (the original comprehensions).
    ``texts``: pandas Series of non-null strings (caller fillna's)."""
    split = texts.str.split(" ")
    ex = split.reset_index(drop=True).explode()
    row = ex.index.to_numpy(np.int64)
    w = ex.to_numpy(dtype=object)
    lens = np.asarray([len(x) for x in w], dtype=np.int64)
    first = np.asarray([ord(x[0]) if x else 0 for x in w], dtype=np.int64)
    last = np.asarray([ord(x[-1]) if x else 0 for x in w], dtype=np.int64)
    return row, lens * 97 + first + last * 31


def word_codes(texts) -> tuple[np.ndarray, np.ndarray]:
    """(row, code) arrays — one entry per word of each document's
    single-space split, in (document, word-position) order. ``row`` is the
    POSITIONAL document index within ``texts`` (0..n-1). Bit-identical to
    :func:`word_codes_obj` (property-pinned in tests/test_dedup.py).

    All-ASCII batches use a 1-byte 'S' matrix (byte == codepoint there, so
    the semantics are unchanged) — the signature stage is memory-bandwidth
    bound across pinned cores, and the UCS4 matrix moves 4× the bytes. A
    non-ASCII batch falls back to UCS4 (numpy's str→bytes cast is strict
    ASCII, so the fallback is exact, not heuristic). Doc lengths come from
    pandas (``texts.str.len()``), NOT ``np.char.str_len`` — the latter
    strips trailing NULs, silently shortening a text that really ends in
    U+0000 (NUL elsewhere is an ordinary code-0 char in both paths)."""
    n = len(texts)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    doclen = texts.str.len().to_numpy(np.int64)
    # Budget check BEFORE the fixed-width conversion — to_numpy(dtype=...)
    # is itself the n × max_len allocation the budget exists to prevent.
    # doclen.max() ≥ the matrix width numpy would pick (it may strip
    # trailing NULs), so the pre-check is conservative; the cheap (1-byte)
    # case is checked first and the UCS4 case re-checked at 4× below.
    Lmax = int(doclen.max())
    if Lmax == 0:
        # every text is "": one empty word (code 0) per doc
        return np.arange(n, dtype=np.int64), np.zeros(n, np.int64)
    if n * Lmax > MAX_MATRIX_BYTES:
        return word_codes_obj(texts)
    try:
        arr = texts.to_numpy(dtype="S")  # strict-ASCII encode, 1 B/char
        width = 1
    except UnicodeEncodeError:
        if n * Lmax * 4 > MAX_MATRIX_BYTES:
            return word_codes_obj(texts)
        arr = texts.to_numpy(dtype="U")  # fixed-width UCS4
        width = 4
    L = arr.dtype.itemsize // width
    if L == 0:
        return np.arange(n, dtype=np.int64), np.zeros(n, np.int64)
    u = arr.view(np.uint8 if width == 1 else np.uint32).reshape(n, L)
    valid = np.arange(L, dtype=np.int64)[None, :] < doclen[:, None]
    sp = (u == 32) & valid
    words_per_doc = sp.sum(axis=1).astype(np.int64) + 1
    total = int(words_per_doc.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), words_per_doc)
    doc_first = np.concatenate(([0], np.cumsum(words_per_doc)[:-1]))
    doc_last = doc_first + words_per_doc - 1
    # word k of a doc spans [start, end): start = 0 or (space col)+1,
    # end = next space col or doclen. Global word order == global space
    # order (both sort by (doc, col)), so the flattened space positions
    # fill the non-first starts / non-last ends directly.
    sp_col = np.flatnonzero(sp.ravel()) % L
    starts = np.empty(total, np.int64)
    starts[doc_first] = 0
    m = np.ones(total, dtype=bool)
    m[doc_first] = False
    starts[m] = sp_col + 1
    ends = np.empty(total, np.int64)
    ends[doc_last] = doclen
    m[:] = True
    m[doc_last] = False
    ends[m] = sp_col
    lens = ends - starts
    flat = u.ravel()
    nz = lens > 0
    first = np.zeros(total, np.int64)
    last = np.zeros(total, np.int64)
    base = row * L
    first[nz] = flat[(base + starts)[nz]]
    last[nz] = flat[(base + ends - 1)[nz]]
    return row, lens * 97 + first + last * 31
