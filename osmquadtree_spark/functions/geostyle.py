"""Style/spec tables for the geometry-enrichment operators — the data-driven
config the reference ships as GeometryStyle JSON
(/root/reference/python/oqt/geometry/style.py:182-365, to/from_json 377-460).

Single source of truth: the Spark column expressions (operators/geometry.py)
and the DuckDB oracle SQL (functions/geometry_oracle.py) are both generated
from these dicts, so a table edit cannot de-synchronize engine and oracle.
"""

from __future__ import annotations

from . import style_defaults as _defaults

# z_order value tables (makegeometries.cpp:37-131, verbatim)
Z_ORDER: dict[str, dict[str, int]] = {
    "highway": {
        "motorway": 380, "trunk": 370, "primary": 360, "secondary": 350,
        "tertiary": 340, "residential": 330, "unclassified": 330, "road": 330,
        "living_street": 320, "pedestrian": 310, "raceway": 300,
        "motorway_link": 240, "trunk_link": 230, "primary_link": 220,
        "secondary_link": 210, "tertiary_link": 200, "service": 150,
        "track": 110, "path": 100, "footway": 100, "bridleway": 100,
        "cycleway": 100, "steps": 90, "platform": 90,
    },
    "construction": {
        "motorway": 33, "trunk": 33, "primary": 33, "secondary": 33,
        "tertiary": 33, "residential": 33, "unclassified": 33, "road": 33,
        "living_street": 32, "pedestrian": 31, "raceway": 30,
        "motorway_link": 24, "trunk_link": 23, "primary_link": 2,
        "secondary_link": 21, "tertiary_link": 20, "service": 15,
        "track": 11, "path": 10, "footway": 10, "bridleway": 10,
        "cycleway": 10, "steps": 9, "platform": 9,
    },
    "railway": {
        "rail": 440, "subway": 420, "narrow_gauge": 420, "light_rail": 420,
        "funicular": 420, "preserved": 420, "monorail": 420, "miniature": 420,
        "turntable": 420, "tram": 410, "disused": 400, "construction": 400,
        "platform": 90,
    },
    "aeroway": {"runway": 60, "taxiway": 50},
}

# polygon typing — the FULL default table (style.py:182-206), transcribed in
# functions/style_defaults.py and pinned verbatim by tests/test_style_pin.py:
# key → "all" | ("include", set) | ("exclude", set)
POLYGON_TAGS: dict[str, tuple[str, frozenset[str]]] = {
    k: (t, frozenset(vals)) for k, (t, vals) in _defaults.POLYGON_TAGS.items()
}

# way-tag priority for parent-tag propagation (style.py:222-233)
HIGHWAY_PRIO: dict[str, int] = {
    h: i
    for i, h in enumerate([
        "footway", "cycleway", "bridleway",
        "path", "steps", "pedestrian",
        "service", "track", "byway",
        "living_street", "residential", "road", "unclassified",
        "tertiary", "tertiary_link",
        "secondary", "secondary_link",
        "primary", "primary_link",
        "trunk", "trunk_link",
        "motorway", "motorway_link",
        "siding", "rail",
    ])
}

# (out_tag, node-qualifier keys, way key, priority map) — style.py:320-323
PARENT_TAG_SPECS: list[tuple[str, tuple[str, ...], str, dict[str, int]]] = [
    ("parent_highway", ("highway", "railway"), "highway", HIGHWAY_PRIO),
    ("parent_service", ("highway",), "service", {}),
]

# (target_key, source_filter {k: v|*}, source_key, agg type) — style.py:356-361
RELATION_TAG_SPECS: list[tuple[str, dict[str, str], str, str]] = [
    ("min_admin_level", {"type": "boundary", "boundary": "administrative"}, "admin_level", "min"),
    ("max_admin_level", {"type": "boundary", "boundary": "administrative"}, "admin_level", "max"),
    ("bus_routes", {"type": "route", "route": "bus"}, "ref", "list"),
    ("bicycle_routes", {"type": "route", "route": "bicycle"}, "ref", "list"),
]

# tag-filter sets — the full defaults (style.py default_feature_keys /
# osm_carto_drop_keys); `other_keys` defaults to None in the reference
# (= keep all non-dropped keys), so OTHER_KEYS only matters for explicit
# all_other_keys=False configs
FEATURE_KEYS = frozenset(_defaults.FEATURE_KEYS)
OTHER_KEYS = frozenset({"layer", "area", "ref", "name", "crossing", "admin_level"})
DROP_KEYS = frozenset(_defaults.DROP_KEYS)

EARTH_WIDTH = 20037508.342789244  # geometry.hpp:55

# minzoom spec — the FULL 726-row minzoomvalues.default (style_defaults.py,
# pin-tested), deduplicated keep-first per (class, key, value) like the
# reference's std::map::insert (findminzoom.cpp:57-61):
# (geom_class 0=point/1=line/2=polygon, key, value-or-*, minzoom). Exact
# value entries shadow the wildcard for the same (class, key)
# (findminzoom.cpp:76-90 check_tag order).
MINZOOM_SPEC: list[tuple[int, str, str, int]] = []
# (class, key, value) → output table name (the 5th CSV column: point / line /
# polygon / boundary / building / highway routing for the PostGIS sink)
MINZOOM_TABLE: dict[tuple[int, str, str], str] = {}
for _c, _k, _v, _z, _tbl in _defaults.MINZOOM_DEFAULT:
    if (_c, _k, _v) not in MINZOOM_TABLE:
        MINZOOM_TABLE[(_c, _k, _v)] = _tbl
        MINZOOM_SPEC.append((_c, _k, _v, _z))
MINZOOM_MINLEN = 10.0   # metres; process_geometry default is 0 (off)
MINZOOM_MINAREA = 5.0   # m²; the CLI default (process.py:87)


# -- data-driven config surface (GeometryStyle to/from_json, style.py:377-460)


def style_to_json() -> dict:
    """Serialize the active style tables — the engine's equivalent of the
    reference's GeometryStyle JSON (operators compile whatever tables the
    session loads, so a JSON edit re-targets every geometry stage)."""
    return {
        "feature_keys": sorted(FEATURE_KEYS),
        "other_keys": sorted(OTHER_KEYS),
        "drop_keys": sorted(DROP_KEYS),
        "polygon_tags": {
            k: ("all" if t == "all" else {t: sorted(vals)})
            for k, (t, vals) in sorted(POLYGON_TAGS.items())
        },
        "z_order": {k: dict(sorted(v.items())) for k, v in sorted(Z_ORDER.items())},
        "parent_tags": [
            {"out_tag": o, "node_keys": list(nk), "way_key": w, "priority": dict(sorted(p.items()))}
            for o, nk, w, p in PARENT_TAG_SPECS
        ],
        "relation_tags": [
            {"target_key": t, "source_filter": f, "source_key": s, "type": ty}
            for t, f, s, ty in RELATION_TAG_SPECS
        ],
        "minzoom": {
            "spec": [list(e) for e in MINZOOM_SPEC],
            "minlen": MINZOOM_MINLEN,
            "minarea": MINZOOM_MINAREA,
        },
    }


def style_from_json(jj: dict) -> dict:
    """Parse a style JSON back into the table shapes the operators take
    (inverse of style_to_json; validated round-trip in tests)."""
    poly = {}
    for k, v in jj["polygon_tags"].items():
        if v == "all":
            poly[k] = ("all", frozenset())
        else:
            (t, vals), = v.items()
            poly[k] = (t, frozenset(vals))
    return {
        "feature_keys": frozenset(jj["feature_keys"]),
        "other_keys": frozenset(jj["other_keys"]),
        "drop_keys": frozenset(jj["drop_keys"]),
        "polygon_tags": poly,
        "z_order": {k: dict(v) for k, v in jj["z_order"].items()},
        "parent_tags": [
            (d["out_tag"], tuple(d["node_keys"]), d["way_key"], dict(d["priority"]))
            for d in jj["parent_tags"]
        ],
        "relation_tags": [
            (d["target_key"], dict(d["source_filter"]), d["source_key"], d["type"])
            for d in jj["relation_tags"]
        ],
        "minzoom_spec": [tuple(e) for e in jj["minzoom"]["spec"]],
        "minzoom_minlen": jj["minzoom"]["minlen"],
        "minzoom_minarea": jj["minzoom"]["minarea"],
    }
