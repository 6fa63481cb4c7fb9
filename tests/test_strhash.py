"""Cross-engine pin of the polyhash64 string hash (kernels/strhash.py):
the vectorized numpy kernel, the scalar Python reference, and the DuckDB
HUGEINT restatement (functions/sql_oracle.polyhash64_sql) must agree
bit-for-bit — the Bloom and DSIR gates hang their full-value EQ on it."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmquadtree_spark.functions.sql_oracle import polyhash64_sql
from osmquadtree_spark.kernels.strhash import SEED, polyhash64, polyhash64_one

CASES = [
    "",
    "a",
    "hello world",
    "tile quad tree image",
    "naïve café ☕ — ünïcode",
    "x" * 500,
    " leading and trailing ",
    "\t\nodd whitespace",
]


def _duck(s: str) -> int:
    con = duckdb.connect()
    try:
        return int(
            con.execute(f"SELECT {polyhash64_sql('?::VARCHAR')}", [s]).fetchone()[0]
        )
    finally:
        con.close()


def test_kernel_matches_scalar_cases():
    got = polyhash64(CASES)
    for s, h in zip(CASES, got):
        assert int(h) == polyhash64_one(s), s


def test_duckdb_matches_scalar_cases():
    for s in CASES:
        assert _duck(s) == polyhash64_one(s), s


def test_empty_string_hashes_to_seed():
    assert polyhash64_one("") == SEED
    assert int(polyhash64([""])[0]) == SEED
    assert _duck("") == SEED


def test_empty_batch():
    assert polyhash64([]).shape == (0,)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20))
def test_kernel_matches_scalar_property(strings):
    got = polyhash64(strings)
    assert got.dtype == np.uint64
    for s, h in zip(strings, got):
        assert int(h) == polyhash64_one(s)


@settings(max_examples=25, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
        min_size=0,
        max_size=30,
    )
)
def test_duckdb_matches_scalar_property(s):
    # surrogate-free printable range; DuckDB walks codepoints exactly as
    # Python's ord iteration does (incl. multi-byte UTF-8)
    assert _duck(s) == polyhash64_one(s)
