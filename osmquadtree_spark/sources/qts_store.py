"""Persistent calcqts store — the ``-qts.pbf`` analog
(/root/reference/src/calcqts/calcqts.cpp writes the planet's element→cell
table once; every later run — extracts, updates, sortblocks — READS it).

In this engine the store is three parquet tables (node/way/relation qts at
CLI depth 17) under ``.stores/qts/<sf-name>/``, written ONCE per source
fixture and read by the update queries on every run. A ``_meta.json``
fingerprint of the source parquet files (size + mtime_ns) AND a content
hash of the deriving code modules guards staleness: a changed source or
a changed derivation rebuilds the store. Writes go
to a temp directory and are renamed into place, so a killed build never
leaves a half-store behind.

This makes the update path's cost profile honest: ``update_change_qts`` /
``update_change_tiles`` pay a parquet SCAN for the old cells — exactly
what production pays — not an in-query re-derivation of the whole calcqts
DAG (and not a memo that only the second benchmark sweep gets to reuse).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SOURCE_TABLES = ("lineitem", "orders", "customer")
_QT_TABLES = ("node_qts", "way_qts", "rel_qts")
_PLANET_TABLES = ("nodes", "ways", "rels")
_CHANGE_TABLES = ("ch_nodes", "ch_ways", "ch_rels")
_STORE_VERSION = 3


def default_store_base() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".stores", "qts")


def _code_fingerprint() -> str:
    """Content hash of the modules whose semantics the stored tables bake
    in (fixture synthesis, calcqts derivation, the quadtree kernel and its
    SQL expressions, and this module). Editing any of them invalidates the
    store automatically — no manual _STORE_VERSION bump to forget, which
    would silently serve old-code tables while the DuckDB oracles restate
    the new code."""
    import hashlib

    pkg = os.path.dirname(os.path.dirname(__file__))
    h = hashlib.sha256()
    for rel in (
        "sources/geo.py",  # elements_sql: the coordinates the fixture bakes in
        "sources/osm_fixture.py",
        "sources/qts_store.py",
        "sources/change_fixture.py",  # the stored .osc-analog change set
        "sources/mp_fixture.py",  # the stored multipolygon member fixture
        "functions/update_oracle.py",  # its modulus constants
        "operators/calcqts.py",
        "kernels/quadtree.py",
        "functions/udfs.py",
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            h.update(f.read())
    # way_coords bakes in ONLY collect_way_coords' semantics — hash that
    # function's source, not all of operators/geometry.py (whose unrelated
    # operators change often and would thrash the store)
    import inspect

    from ..operators.geometry import collect_way_coords

    h.update(inspect.getsource(collect_way_coords).encode())
    return h.hexdigest()[:16]


def _fingerprint(sf_dir: str) -> dict:
    fp = {"version": _STORE_VERSION, "code": _code_fingerprint()}
    for t in _SOURCE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        fp[t] = [st.st_size, st.st_mtime_ns]
    return fp


def store_dir(sf_dir: str, base: str | None = None) -> str:
    return os.path.join(base or default_store_base(), os.path.basename(os.path.normpath(sf_dir)))


def store_is_current(sf_dir: str, base: str | None = None) -> bool:
    d = store_dir(sf_dir, base)
    meta = os.path.join(d, "_meta.json")
    if not os.path.isfile(meta):
        return False
    try:
        with open(meta) as f:
            return json.load(f) == _fingerprint(sf_dir)
    except (OSError, ValueError):
        return False


def build_qts_store(spark: SparkSession, sf_dir: str, base: str | None = None) -> str:
    """Write the planet store (nodes/ways/rels — the ``planet.osm.pbf``
    analog: the reference READS its element tables from disk, it never
    re-synthesizes them per run) and derive node/way/relation qts over the
    written tables (the one-off ``oqt calcqts`` run). Returns the store
    path."""
    from ..operators.calcqts import node_quadtrees, relation_quadtrees, way_quadtrees
    from . import osm_fixture as fx

    final = store_dir(sf_dir, base)
    tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    try:
        for name, df in (
            ("nodes", fx.fixture_nodes(spark, sf_dir)),
            ("ways", fx.fixture_ways(spark, sf_dir)),
            ("rels", fx.fixture_relations(spark, sf_dir)),
        ):
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        # derive qts from the read-back scans, so the stored cells
        # correspond byte-for-byte to the stored element tables
        nodes = spark.read.parquet(os.path.join(tmp, "nodes"))
        ways = spark.read.parquet(os.path.join(tmp, "ways"))
        rels = spark.read.parquet(os.path.join(tmp, "rels"))
        # small_* hints: the store build is fixture-scale; the planet-scale
        # derivation keeps shuffle joins (operators/calcqts gates on the flags)
        wq = way_quadtrees(ways, nodes, small_nodes=True).localCheckpoint(eager=False)
        nq = node_quadtrees(nodes, ways, wq, small_way_qts=True)
        rq = relation_quadtrees(rels, nq, wq, small_member_qts=True)
        for name, df in (("node_qts", nq), ("way_qts", wq), ("rel_qts", rq)):
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        # the .osc-analog change set (sources/change_fixture.py): production
        # reads a diff-scale daily change file — the update queries read
        # these tables the same way, instead of re-synthesizing the change
        # map from the planet per run. Derived over the read-back stores so
        # old_qt matches the stored cells byte-for-byte.
        from .change_fixture import derive_change_set

        old = {
            "nodes": spark.read.parquet(os.path.join(tmp, "node_qts")),
            "ways": spark.read.parquet(os.path.join(tmp, "way_qts")),
            "relations": spark.read.parquet(os.path.join(tmp, "rel_qts")),
        }
        for name, df in derive_change_set(nodes, ways, rels, old).items():
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        # assembled way coordinate arrays — the shared upstream of every
        # coordinate consumer (way stats, minzoom, WKB, GeoJSON). The
        # planet tiles the reference's geometry stage reads are id-sorted
        # with locations resolved per tile (pbfformat reads -qts-sorted
        # tiles); materializing the assembly once per planet build and
        # paying a parquet scan per query is the same cost profile.
        from ..operators.geometry import collect_way_coords

        # posexplode: collect_way_coords orders vertices by ref POSITION.
        # The synthetic fixture's refs happen to ascend (so node_id order
        # coincides), but the stored table must carry true positions — the
        # general OSM shape repeats and reorders refs, and a node_id-sorted
        # vertex sequence would silently re-order every downstream geometry
        refs = ways.select("way_id", F.posexplode("refs").alias("pos", "node_id"))
        collect_way_coords(refs, nodes).write.mode("overwrite").parquet(
            os.path.join(tmp, "way_coords")
        )
        # multipolygon member fixture (sources/mp_fixture.py) — the ring
        # assembler's INPUT table; see that module's rationale
        from .mp_fixture import member_rows

        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        member_rows(orders, spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "mp_members"))
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(_fingerprint(sf_dir), f)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        try:
            # rename-aside swap: `final` is never a half-deleted directory
            # (fsutil.swap_dir, shared with the candidate-export path)
            from ..fsutil import swap_dir

            swap_dir(tmp, final)
        except OSError:
            # a concurrent builder swapped its store in first; both derive
            # the same deterministic tables, so accept theirs if current
            # (the fingerprint is the arbiter) instead of crashing
            if not store_is_current(sf_dir, base):
                raise
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return final


def ensure_qts_store(spark: SparkSession, sf_dir: str, base: str | None = None) -> str:
    """Build the store if absent or stale; otherwise a no-op. Returns path."""
    if store_is_current(sf_dir, base):
        return store_dir(sf_dir, base)
    return build_qts_store(spark, sf_dir, base)


def read_qts_store(spark: SparkSession, sf_dir: str, base: str | None = None) -> dict[str, DataFrame]:
    """→ {"nodes": (node_id, qt), "ways": (way_id, qt),
    "relations": (rel_id, qt)} as plain parquet scans (prunable,
    re-plannable — the production read path). Builds on first use."""
    d = ensure_qts_store(spark, sf_dir, base)
    return {
        "nodes": spark.read.parquet(os.path.join(d, "node_qts")),
        "ways": spark.read.parquet(os.path.join(d, "way_qts")),
        "relations": spark.read.parquet(os.path.join(d, "rel_qts")),
    }


def read_change_store(
    spark: SparkSession, sf_dir: str, base: str | None = None
) -> dict[str, DataFrame]:
    """→ {"ch_nodes", "ch_ways", "ch_rels"} — the materialized .osc-analog
    change tables (diff-scale parquet scans; see sources/change_fixture.py).
    Builds the store on first use."""
    d = ensure_qts_store(spark, sf_dir, base)
    return {t: spark.read.parquet(os.path.join(d, t)) for t in _CHANGE_TABLES}


def read_way_coords(spark: SparkSession, sf_dir: str, base: str | None = None) -> DataFrame:
    """→ (way_id, _lons, _lats) assembled coordinate arrays as a plain
    parquet scan (see build note above). Builds the store on first use."""
    d = ensure_qts_store(spark, sf_dir, base)
    return spark.read.parquet(os.path.join(d, "way_coords"))


def read_mp_members(spark: SparkSession, sf_dir: str, base: str | None = None) -> DataFrame:
    """→ (rel_id, pos, role, refs, lons, lats) multipolygon member rows as
    a plain parquet scan (see sources/mp_fixture.py). Builds on first use."""
    d = ensure_qts_store(spark, sf_dir, base)
    return spark.read.parquet(os.path.join(d, "mp_members"))


def read_planet_store(
    spark: SparkSession, sf_dir: str, base: str | None = None
) -> dict[str, DataFrame]:
    """→ {"nodes", "ways", "rels"} element tables as plain parquet scans
    (prunable, re-plannable — the production read path: the reference reads
    the planet file from disk every run). Builds on first use."""
    d = ensure_qts_store(spark, sf_dir, base)
    return {t: spark.read.parquet(os.path.join(d, t)) for t in _PLANET_TABLES}
