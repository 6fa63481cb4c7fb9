"""Session cache registry — every operator-internal ``persist()`` goes
through ``cached()`` so the handles can be released between driver sweeps.

Operators persist intermediates (LSH signatures, band tables, capped gram
tables) that are read by multiple join branches of ONE query plan; the
builder returns lazily, so the operator itself can never know when the last
action ran. Without a registry those cached blocks accumulate across a
50-query driver sweep until LRU eviction. ``release_all()`` (called from
queries.clear_session_caches and at the end of bench sweeps) unpersists
everything registered since the last release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """persist() + register for release_all()."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_all() -> None:
    global _PERSISTED
    frames, _PERSISTED = _PERSISTED, []
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
