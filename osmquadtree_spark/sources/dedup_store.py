"""Persistent MinHash signature store — the dedup twin of the qts store
(sources/qts_store.py) and of the reference's ``-index.pbf`` prune
(/root/reference/src/update/update.cpp:217-254: updates read a per-tile id
index instead of re-deriving the planet).

At 100 TB the corpus is mined ONCE: signatures and LSH band rows are
committed to parquet at ingest time, and every later batch dedups against
that store — the signature kernel (the expensive text pass) runs only over
the new batch, never over the corpus again. The store is two tables under
``.stores/minhash/<sf-name>/``:

* ``sigs``  — (doc_id, sig array<bigint>) for the stored corpus partition
* ``bands`` — (doc_id, band, bucket), the exploded LSH banding

guarded by the same staleness discipline as the qts store: a fingerprint of
the source parquet (size + mtime_ns) AND a content hash of the deriving
code (the signature/banding functions) — editing either rebuilds. Writes
land in a temp dir renamed into place, so a killed build never leaves a
half-store.

The driver-gate fixture split: documents with ``doc_id % INCR_NEW_MOD != 0``
are the stored corpus, the rest are the "today's batch" side — shared with
the DuckDB oracle's WHERE clause so the split cannot drift.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INCR_NEW_MOD = 5  # doc_id % 5 == 0 → today's batch; else → stored corpus
_STORE_VERSION = 1


def default_store_base() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".stores", "minhash",
    )


def _code_fingerprint() -> str:
    """Hash of the MODULES whose semantics the stored tables bake in —
    whole files, like qts_store._code_fingerprint, because the signature
    path reaches beyond named functions (band-key fold, hash-param
    constants, the wordcodes kernel): a selective function hash would
    silently serve a stale store after editing any of those. Rebuild cost
    is seconds; correctness wins over thrash."""
    import hashlib

    pkg = os.path.dirname(os.path.dirname(__file__))
    h = hashlib.sha256()
    for rel in ("operators/dedup.py", "kernels/wordcodes.py"):
        with open(os.path.join(pkg, rel), "rb") as f:
            h.update(f.read())
    with open(__file__, "rb") as f:
        h.update(f.read())
    return h.hexdigest()[:16]


def _fingerprint(sf_dir: str, n: int) -> dict:
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    return {
        "version": _STORE_VERSION,
        "code": _code_fingerprint(),
        "documents": [st.st_size, st.st_mtime_ns],
        "new_mod": INCR_NEW_MOD,
        "n": n,  # gram size is baked into the stored signatures
    }


def store_dir(sf_dir: str, base: str | None = None) -> str:
    return os.path.join(
        base or default_store_base(), os.path.basename(os.path.normpath(sf_dir))
    )


def ensure(
    spark: SparkSession, sf_dir: str, base: str | None = None, n: int = 3
) -> dict:
    """Build-if-stale; returns {"sigs": path, "bands": path}. Every query
    run pays only the parquet SCAN of these tables (the production cost),
    never the corpus signature kernel."""
    d = store_dir(sf_dir, base)
    meta_path = os.path.join(d, "_meta.json")
    fp = _fingerprint(sf_dir, n)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == fp:
                return {"sigs": os.path.join(d, "sigs"),
                        "bands": os.path.join(d, "bands")}
    from ..operators.dedup import band_rows, minhash_signature

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        F.col("doc_id") % INCR_NEW_MOD != 0
    )
    tmp = d + ".tmp-" + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    try:
        sigs = minhash_signature(docs, n).filter(F.size("sig") > 0)
        sigs.write.mode("overwrite").parquet(os.path.join(tmp, "sigs"))
        stored = spark.read.parquet(os.path.join(tmp, "sigs"))
        band_rows(stored).write.mode("overwrite").parquet(
            os.path.join(tmp, "bands")
        )
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(fp, f)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.replace(tmp, d)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
    return {"sigs": os.path.join(d, "sigs"), "bands": os.path.join(d, "bands")}


def read_tables(spark: SparkSession, sf_dir: str, base: str | None = None,
                n: int = 3) -> tuple[DataFrame, DataFrame]:
    paths = ensure(spark, sf_dir, base, n)
    return (
        spark.read.parquet(paths["sigs"]),
        spark.read.parquet(paths["bands"]),
    )
