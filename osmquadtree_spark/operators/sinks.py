"""CSV/PostGIS sink tag packers
(/root/reference/src/geometry/utils.cpp:443-539):

* hstore text:  ``"key"=>"value", ...`` in tag order, escaping ``\\ " \\t
  \\r`` and DROPPING newlines (hstore_quotestring 466-483)
* json:         picojson object — keys sorted (std::map), compact
* hstore binary: int32-BE count, then per tag int32-BE len + bytes for key
  and value (pack_hstoretags_binary 520-539)

All three are JVM column expressions over the tags array (the binary form
is emitted as its hex string — same bytes, comparable across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _esc_hstore(s: Column) -> Column:
    # escape order matters: backslash first, then the characters that gain one
    s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
    s = F.replace(s, F.lit('"'), F.lit('\\"'))
    s = F.replace(s, F.lit("\t"), F.lit("\\t"))
    s = F.replace(s, F.lit("\r"), F.lit("\\r"))
    return F.replace(s, F.lit("\n"), F.lit(""))


def _esc_json(s: Column) -> Column:
    """picojson serialize_str_char (thirdparty/picojson.h:518-545), exactly:
    named escapes for \" \\\\ / \\b \\f \\n \\r \\t, \\u%04x for the other
    control chars (<0x20) and 0x7f. Anything less emits invalid JSON for
    multi-line tag values (raw newline inside a string) and diverges from
    the reference sink's bytes (picojson writes '\\/' for '/')."""
    s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
    for ch, sym in (
        ('"', '\\"'), ("/", "\\/"), ("\b", "\\b"), ("\f", "\\f"),
        ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
    ):
        s = F.replace(s, F.lit(ch), F.lit(sym))
    for cc in [c for c in range(0x20) if chr(c) not in '\b\f\n\r\t'] + [0x7F]:
        s = F.replace(s, F.lit(chr(cc)), F.lit("\\u%04x" % cc))
    return s


def hstore_tags_col(tags_col) -> Column:
    """pack_hstoretags: '"k"=>"v", ...' in tag order."""
    parts = F.transform(
        F.col(tags_col),
        lambda t: F.concat(
            F.lit('"'), _esc_hstore(t["key"]), F.lit('"=>"'), _esc_hstore(t["val"]), F.lit('"')
        ),
    )
    return F.array_join(parts, ", ")


def json_tags_col(tags_col) -> Column:
    """pack_jsontags_picojson: compact JSON object, keys sorted (picojson
    backs objects with std::map)."""
    parts = F.transform(
        F.array_sort(F.col(tags_col)),
        lambda t: F.concat(
            F.lit('"'), _esc_json(t["key"]), F.lit('":"'), _esc_json(t["val"]), F.lit('"')
        ),
    )
    return F.concat(F.lit("{"), F.array_join(parts, ","), F.lit("}"))


def _coord7(v: Column) -> Column:
    # %.7f of the fixed-point degree value — C-style formatting in both
    # engines; ties at the 7th decimal cannot occur (the double nearest to
    # n·1e-7 is never exactly half-ulp at that digit)
    return F.format_string("%.7f", v * F.lit(1e-7))


def point_feature_col(lon, lat, props_json) -> Column:
    """One GeoJSON Point feature (process.py:171-276 layout)."""
    return F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        _coord7(lon),
        F.lit(","),
        _coord7(lat),
        F.lit(']},"properties":'),
        props_json,
        F.lit("}"),
    )


def _coords_list(lons, lats) -> Column:
    """'[x,y],[x,y],...' — one %.7f pair per vertex."""
    return F.array_join(
        F.zip_with(
            lons,
            lats,
            lambda lo, la: F.concat(F.lit("["), _coord7(lo), F.lit(","), _coord7(la), F.lit("]")),
        ),
        ",",
    )


def linestring_feature_col(lons, lats, props_json) -> Column:
    """GeoJSON LineString feature from fixed-point coordinate arrays
    (process.py:171-276 splits geometries by kind; this is the line
    collection's row shape)."""
    return F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"LineString","coordinates":['),
        _coords_list(lons, lats),
        F.lit(']},"properties":'),
        props_json,
        F.lit("}"),
    )


def polygon_feature_col(lons, lats, props_json) -> Column:
    """GeoJSON Polygon feature (single closed ring — the SimplePolygon
    shape; callers pass the ring already closed first==last)."""
    return F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Polygon","coordinates":[['),
        _coords_list(lons, lats),
        F.lit(']]},"properties":'),
        props_json,
        F.lit("}"),
    )


def feature_collection(df, tile_col: str, order_col: str, feature_col: str):
    """Per-tile FeatureCollection strings: features ordered by ``order_col``
    (the tiled files' internal-id order) inside one JVM aggregate."""
    return (
        df.groupBy(tile_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(feature_col).alias("f")))
            ).alias("_fs")
        )
        .select(
            tile_col,
            F.concat(
                F.lit('{"type":"FeatureCollection","features":['),
                F.array_join(F.transform("_fs", lambda s: s["f"]), ","),
                F.lit("]}"),
            ).alias("geojson"),
        )
    )


def write_postgis_csv(
    df,
    path: str,
    id_col: str = "way_id",
    tags_col: str = "tags",
    wkb_col: str = "wkb",
    extra_cols: list[str] | None = None,
) -> None:
    """The CSV/PostGIS sink materialized (the reference pipes
    `id,tags-hstore,...,EWKB-hex` rows into `COPY ... FROM STDIN WITH CSV`,
    csvwriter.cpp / postgiswriter.cpp:556-600): one gzip-able CSV part per
    partition via the built-in writer — hstore packing and the hex EWKB are
    the already-gated column expressions, so this is a projection + write,
    no extra pass."""
    from pyspark.sql import functions as F

    cols = [
        F.col(id_col).alias("id"),
        hstore_tags_col(tags_col).alias("tags"),
        *[F.col(c) for c in (extra_cols or [])],
        F.upper(F.hex(F.col(wkb_col))).alias("way"),
    ]
    # Postgres COPY ... CSV expects doubled-quote escaping, not backslashes
    df.select(*cols).write.mode("overwrite").option("quoteAll", True).option(
        "escape", '"'
    ).csv(path)


def _hex32(n: Column) -> Column:
    return F.lpad(F.hex(n.cast("bigint")), 8, "0")


def hstore_binary_hex_col(tags_col) -> Column:
    """pack_hstoretags_binary as a hex string: int32-BE count, then per tag
    int32-BE length + utf-8 bytes for key and value."""
    per_tag = F.transform(
        F.col(tags_col),
        lambda t: F.concat(
            _hex32(F.length(F.encode(t["key"], "utf-8"))),
            F.hex(F.encode(t["key"], "utf-8")),
            _hex32(F.length(F.encode(t["val"], "utf-8"))),
            F.hex(F.encode(t["val"], "utf-8")),
        ),
    )
    return F.upper(F.concat(_hex32(F.size(F.col(tags_col))), F.array_join(per_tag, "")))


def geojson_diff(
    left, right, keys: tuple[str, ...] = ("tile", "kind"), col: str = "geojson"
):
    """Rendered-feature reconciliation — the geojson_diff harness
    (/root/reference/python/oqt/geometry/process.py:293-307): two keyed
    FeatureCollection tables → every positional feature pair that differs.

    Reference semantics, faithfully including the quirks: collections
    present on BOTH sides are zipped positionally (features are sorted by
    id at collection build, process.py:287-290) and ``zip`` TRUNCATES to
    the shorter list — trailing extras on either side are not reported; a
    key present on only one side yields ALL its features paired with NULL.
    Features compare as strings — the sink emits canonical sorted-key JSON
    (feature_collection / *_feature_col), so string equality is the
    reference's dict equality.

    Spark shape: one full-outer equi-join on the key columns + posexplode
    of the zipped feature arrays — no Python, no driver collect; at planet
    scale both sides shuffle by (tile, kind), the natural layout tiled
    stores already have. Returns (keys..., pos, left_feature,
    right_feature)."""
    feats = F.from_json(F.col(col), "struct<features:array<string>>")["features"]
    l = left.select(*keys, feats.alias("_lf"))
    r = right.select(*keys, feats.alias("_rf"))
    joined = l.join(r, list(keys), "full_outer")
    zipped = F.arrays_zip(
        F.coalesce(F.col("_lf"), F.array()).alias("a"),
        F.coalesce(F.col("_rf"), F.array()).alias("b"),
    )
    exploded = joined.select(
        *keys,
        F.col("_lf").isNull().alias("_lmiss"),
        F.col("_rf").isNull().alias("_rmiss"),
        F.least(F.size("_lf"), F.size("_rf")).alias("_minlen"),
        F.posexplode(zipped).alias("pos", "_pair"),
    )
    one_sided = F.col("_lmiss") | F.col("_rmiss")
    differs = (F.col("pos") < F.col("_minlen")) & (
        F.col("_pair")["a"] != F.col("_pair")["b"]
    )
    return exploded.filter(one_sided | differs).select(
        *keys,
        "pos",
        F.col("_pair")["a"].alias("left_feature"),
        F.col("_pair")["b"].alias("right_feature"),
    )
