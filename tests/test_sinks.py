"""Tag-packer escaping tests (hstore_quotestring semantics,
utils.cpp:466-483: backslash and quote escaped, tab/CR escaped, NEWLINES
DROPPED; json: sorted keys, compact). Plain-value parity runs through the
tag_packers driver-gate query."""

import pandas as pd

from osmquadtree_spark.operators import sinks as sk

TAGS_SCHEMA = "id bigint, tags array<struct<key:string,val:string>>"


def _df(spark, tags):
    return spark.createDataFrame(
        [(1, [{"key": k, "val": v} for k, v in tags])], TAGS_SCHEMA
    )


def test_hstore_escaping(spark):
    df = _df(spark, [
        ("name", 'say "hi"'),
        ("note", "a\\b"),
        ("tab", "x\ty"),
        ("nl", "a\nb"),
    ])
    out = df.select(sk.hstore_tags_col("tags").alias("h")).collect()[0].h
    assert '"name"=>"say \\"hi\\""' in out
    assert '"note"=>"a\\\\b"' in out
    assert '"tab"=>"x\\ty"' in out
    assert '"nl"=>"ab"' in out          # newline dropped, not escaped
    assert out.count("=>") == 4
    assert ", " in out                   # tag-order join


def test_json_sorted_compact(spark):
    df = _df(spark, [("b", "2"), ("a", "1"), ("c", 'q"x')])
    out = df.select(sk.json_tags_col("tags").alias("j")).collect()[0].j
    assert out == '{"a":"1","b":"2","c":"q\\"x"}'  # sorted keys, compact


def test_hstore_binary_layout(spark):
    df = _df(spark, [("ab", "xyz")])
    out = df.select(sk.hstore_binary_hex_col("tags").alias("b")).collect()[0].b
    # int32 count=1, len(ab)=2, 'ab', len(xyz)=3, 'xyz'
    assert out == "00000001" + "00000002" + "6162" + "00000003" + "78797A"


def test_empty_tags(spark):
    df = _df(spark, [])
    r = df.select(
        sk.hstore_tags_col("tags").alias("h"),
        sk.json_tags_col("tags").alias("j"),
        sk.hstore_binary_hex_col("tags").alias("b"),
    ).collect()[0]
    assert r.h == "" and r.j == "{}" and r.b == "00000000"


def test_write_postgis_csv(spark, tmp_path):
    """CSV/PostGIS sink: id, quoted hstore, hex EWKB — one COPY-ready part
    per partition."""
    import glob

    from osmquadtree_spark.operators.sinks import write_postgis_csv
    from osmquadtree_spark.operators.wkb import point_wkb

    rows = [
        (1, [("highway", "residential")], bytearray(point_wkb(10_0000000, 20_0000000, srid=True))),
        (2, [("name", 'say "hi"')], bytearray(point_wkb(-30_0000000, 40_0000000, srid=True))),
    ]
    df = spark.createDataFrame(
        rows, "way_id bigint, tags array<struct<key:string,val:string>>, wkb binary"
    )
    out = str(tmp_path / "csv")
    write_postgis_csv(df, out)
    lines = []
    for f in glob.glob(out + "/part-*.csv"):
        lines += open(f).read().splitlines()
    assert len(lines) == 2
    by_id = {ln.split(",")[0].strip('"'): ln for ln in lines}
    # COPY-compatible doubled-quote escaping of the hstore quotes
    assert '""highway""=>""residential""' in by_id["1"]
    # EWKB hex payload: big-endian marker + SRID-flagged point type + 4326
    assert "0020000001000010E6" in by_id["1"]


def _fc(feats):
    import json

    return (
        '{"type":"FeatureCollection","features":['
        + ",".join(json.dumps(f, sort_keys=True, separators=(",", ":")) for f in feats)
        + "]}"
    )


def _ref_geojson_diff(left, right):
    """Reference semantics restated (process.py:293-307): dict of
    key → FC; zip truncates; one-sided keys pair with None."""
    res = {}
    for k, v in left.items():
        if k not in right:
            res[k] = [(o, None) for o in v]
        else:
            d = [(a, b) for a, b in zip(v, right[k]) if a != b]
            if d:
                res[k] = d
    for k, v in right.items():
        if k not in left:
            res[k] = [(None, o) for o in v]
    return res


def test_geojson_diff_matches_reference_semantics(spark):
    """geojson_diff vs a direct restatement of the reference harness, on a
    fixture exercising: equal collections (omitted), one changed feature,
    truncated trailing extras (NOT reported — the reference's zip), and
    kinds missing on either side (all features, NULL other side)."""
    import json

    def feat(i, tag):
        return {"id": i, "type": "Feature", "properties": {"t": tag}}

    left = {
        ("t0", "point"): [feat(1, "a"), feat(2, "b")],
        ("t0", "line"): [feat(3, "x"), feat(4, "y"), feat(5, "extra")],
        ("t1", "point"): [feat(6, "only-left")],
    }
    right = {
        ("t0", "point"): [feat(1, "a"), feat(2, "B")],
        ("t0", "line"): [feat(3, "x"), feat(4, "y")],
        ("t2", "poly"): [feat(7, "only-right"), feat(8, "only-right2")],
    }

    def to_df(d):
        rows = [
            (k[0], k[1], _fc(v))
            for k, v in d.items()
        ]
        return spark.createDataFrame(rows, "tile string, kind string, geojson string")

    out = sk.geojson_diff(to_df(left), to_df(right)).collect()
    got = {}
    for r in out:
        got.setdefault((r.tile, r.kind), []).append(
            (
                r.pos,
                json.loads(r.left_feature) if r.left_feature is not None else None,
                json.loads(r.right_feature) if r.right_feature is not None else None,
            )
        )
    for k in got:
        got[k] = [(a, b) for _, a, b in sorted(got[k])]

    exp = _ref_geojson_diff(
        {k: v for k, v in left.items()}, {k: v for k, v in right.items()}
    )
    assert got == exp


def test_json_picojson_escape_table(spark):
    """picojson serialize_str_char parity (thirdparty/picojson.h:518-545):
    named escapes, '\\/' for '/', \\u%04x for other control chars and 0x7f
    — and the output must round-trip through a strict JSON parser."""
    import json

    df = _df(spark, [
        ("url", "http://x/y"),
        ("note", "line1\nline2\ttab"),
        ("ctl", "a\x01b\x7fc"),
        ("bs", 'q\\"x'),
    ])
    out = df.select(sk.json_tags_col("tags").alias("j")).collect()[0].j
    assert '"url":"http:\\/\\/x\\/y"' in out
    assert '"note":"line1\\nline2\\ttab"' in out
    assert '"ctl":"a\\u0001b\\u007fc"' in out
    assert '"bs":"q\\\\\\"x"' in out
    parsed = json.loads(out)  # strictly valid JSON
    assert parsed["note"] == "line1\nline2\ttab"
    assert parsed["ctl"] == "a\x01b\x7fc"
    assert parsed["url"] == "http://x/y"
